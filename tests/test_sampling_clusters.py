from __future__ import annotations

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.operators import dedup as dd
from basin_climbing_data_pipeline_spark.operators import sampling as sp


def test_train_test_split_stable_and_partition_invariant(spark, sf_dir):
    a = {(r.doc_id, r.split) for r in sp.train_test_split(spark, sf_dir).collect()}
    # same assignment regardless of physical partitioning
    b = {
        (r.doc_id, r.split)
        for r in sp.train_test_split(spark, sf_dir).repartition(13).collect()
    }
    assert a == b and len(a) > 0
    train = sum(1 for _, s in a if s == "train")
    # md5 buckets are uniform-ish: train share within 10pp of the 80% target
    assert abs(train / len(a) - 0.80) < 0.10


def test_mixture_summary_respects_targets(spark, sf_dir):
    rows = sp.mixture_sample_summary(spark, sf_dir).collect()
    assert {r.source for r in rows} >= {"src0", "src1"}
    for r in rows:
        assert 0 <= r.sampled_docs <= r.total_docs
        if r.target_pct == 100:
            assert r.sampled_docs == r.total_docs
        if r.target_pct == 0:
            assert r.sampled_docs == 0


def test_dedup_clusters_are_components(spark, sf_dir):
    pairs = (
        dd.minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= dd.CLUSTER_JACCARD_MIN)
        .select("doc_a", "doc_b")
        .collect()
    )
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in dd.dedup_clusters(spark, sf_dir).collect()
    }
    # union-find ground truth on the same edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(r.doc_a)] = find(r.doc_b)
    comps: dict[int, set[int]] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    expected = {
        n: (min(members), len(members))
        for members in comps.values()
        for n in members
    }
    assert got == expected
    assert len(got) > 0


def test_propagate_min_labels_chain_topology(spark):
    """Worst case for min-label propagation: a single chain 0-1-2-...-n
    (diameter = n-1, the adversarial topology the large-star/small-star
    variant exists for).  The loop must still converge within its round
    bound and label every node with the chain's minimum id."""
    n = 20
    chain = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(chain, "src long, dst long")
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = dd.propagate_min_labels(edges).collect()
    assert len(labels) == n
    assert all(r["label"] == 0 for r in labels)


def test_propagate_min_labels_two_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)], "src long, dst long"
    )
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["node"]: r["label"] for r in dd.propagate_min_labels(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_sequence_packing_invariants(spark, sf_dir):
    """Greedy-with-overflow contract: every pack except a cell's last is
    filled past the budget only by its final doc (i.e. tokens-without-the-
    last-doc < budget); packs tile each (source, shard) cell contiguously
    from 0; doc ranges never overlap inside a cell."""
    rows = sp.sequence_packing(spark, sf_dir).collect()
    assert rows
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault((r["source"], r["shard"]), []).append(r)
    budget = sp.PACK_TOKEN_BUDGET
    for (src, shard), packs in by_cell.items():
        packs.sort(key=lambda r: r["pack_id"])
        # docs are far smaller than the budget here, so every window is hit
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        for prev, cur in zip(packs, packs[1:]):
            assert prev["last_doc_id"] < cur["first_doc_id"]
        # greedy-with-overflow in cumsum terms: pack p closes only once the
        # cell's running total reaches (p+1)*budget, and it must have STARTED
        # before that boundary (otherwise its docs belong to a later pack)
        running = 0
        for p in packs:
            assert running < (p["pack_id"] + 1) * budget
            running += p["n_tokens"]
            if p is not packs[-1]:
                assert running >= (p["pack_id"] + 1) * budget
            assert p["fill_micro"] == p["n_tokens"] * 1000000 // budget


def test_sequence_packing_single_data_shuffle(spark, sf_dir):
    """The pack aggregation must reuse the window's (source, shard)
    partitioning: one data shuffle plus the presentation sort, nothing
    per-doc crossing the cluster twice."""
    from basin_climbing_data_pipeline_spark.plans.audit import audit

    st = audit(sp.sequence_packing(spark, sf_dir))
    assert st.n_shuffle_exchanges <= 2


def test_incremental_dedup_invariants(spark, sf_dir):
    """Each new doc reports at most one (best) stored match; the split is
    honored (new ids on the mod class, stored ids off it); every reported
    match clears the Jaccard threshold."""
    rows = dd.incremental_dedup(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["new_doc_id"] % dd.INCR_NEW_MOD == 0
        assert r["stored_doc_id"] % dd.INCR_NEW_MOD != 0
        assert r["new_doc_id"] not in seen
        seen.add(r["new_doc_id"])
        assert r["jaccard"] >= dd.JACCARD_THRESHOLD
        assert 1 <= r["n_band_collisions"] <= dd.MINHASH_BANDS


def test_decontamination_invariants(spark, sf_dir):
    """Training docs only (never eval ids); every row shares >= 1 eval
    shingle; the flag is exactly the threshold predicate; eval-docs-hit
    never exceeds matched shingles... (each distinct shingle can hit many
    eval docs, so the reverse bound is what must hold: hits >= 1)."""
    rows = dd.decontamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % dd.EVAL_SET_MOD != 0
        assert r["n_matched_shingles"] >= 1
        assert r["n_eval_docs_hit"] >= 1
        assert r["contaminated"] == (
            r["n_matched_shingles"] >= dd.CONTAM_MIN_SHINGLES
        )


def test_corpus_funnel_monotone(spark, sf_dir):
    """Each stage can only shrink the corpus; stages appear once, in
    order, and start from the full document count."""
    rows = sp.corpus_funnel(spark, sf_dir).collect()
    assert [r["stage"] for r in rows] == [
        "raw", "exact_dedup", "near_dup_collapse", "quality_filter",
        "decontaminated",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_dsir_selection_invariants(spark, sf_dir):
    rows = sp.dsir_selection(spark, sf_dir).collect()
    n_docs = len(rows)
    assert n_docs > 0
    # exactly min(K, n) docs selected, deterministically
    assert sum(1 for r in rows if r.selected) == min(sp.DSIR_KEEP, n_docs)
    again = {(r.doc_id, r.selected) for r in sp.dsir_selection(spark, sf_dir).collect()}
    assert {(r.doc_id, r.selected) for r in rows} == again
    # importance weights must favor the target slice: the mean per-feature
    # log weight of target-language docs exceeds the off-target mean
    def mean_lnw(pred):
        xs = [r.lnw / r.n_feats for r in rows if pred(r) and r.n_feats > 0]
        return sum(xs) / len(xs)

    assert mean_lnw(lambda r: r.lang == sp.DSIR_TARGET_LANG) > mean_lnw(
        lambda r: r.lang != sp.DSIR_TARGET_LANG
    )


def test_dsir_selection_weight_is_exact_feature_sum(spark):
    """Hand-checkable corpus: two 'english-like' docs sharing a vocabulary
    and one gibberish doc — the gibberish doc's importance weight must be
    the lowest, and every doc's n_feats = unigrams(non-empty) + bigrams."""
    import shutil

    import pandas as pd

    tmp = "/tmp/dsir_tiny"
    shutil.rmtree(tmp, ignore_errors=True)
    import os

    os.makedirs(tmp)
    src = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{tmp}/{t}.parquet")
    texts = [
        ("the quick brown fox jumps", "en"),
        ("the slow brown dog jumps", "en"),
        ("zzq qxz zzq qxz zzq", "xx"),
    ]
    pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": lang, "source": "s", "n_chars": len(t)}
            for i, (t, lang) in enumerate(texts)
        ]
    ).to_parquet(f"{tmp}/documents.parquet")
    rows = {r.doc_id: r for r in sp.dsir_selection(spark, tmp).collect()}
    assert rows[0].n_feats == 5 + 4 and rows[2].n_feats == 5 + 4
    assert rows[2].lnw < min(rows[0].lnw, rows[1].lnw)


def test_soft_dedup_weights_mass_bounds(spark, sf_dir):
    rows = sp.soft_dedup_weights(spark, sf_dir).collect()
    clustered = {
        r.doc_id: r.cluster_size for r in dd.dedup_clusters(spark, sf_dir).collect()
    }
    by_src = {r.source: r for r in rows}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    n_clustered_by_src: dict[str, int] = {}
    for d in docs:
        if d.doc_id in clustered:
            n_clustered_by_src[d.source] = n_clustered_by_src.get(d.source, 0) + 1
    for r in rows:
        # discounted mass never exceeds raw mass; equality iff no duplicates
        assert r.effective_tokens <= r.raw_tokens + 1e-9
        assert r.n_clustered_docs == n_clustered_by_src.get(r.source, 0)
        if r.n_clustered_docs == 0:
            assert r.effective_tokens == r.raw_tokens and r.mass_retained == 1.0
        else:
            assert r.mass_retained < 1.0
    assert sum(r.n_docs for r in rows) == len(docs)


def test_cross_source_dup_matrix_reconciles_with_pairs(spark, sf_dir):
    """Matrix totals must reconcile with the thresholded pair list, and
    the unordered-pair canonicalization must hold."""
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        CLUSTER_JACCARD_MIN,
        cross_source_dup_matrix,
        minhash_lsh_pairs,
    )

    rows = cross_source_dup_matrix(spark, sf_dir).collect()
    n_edges = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= CLUSTER_JACCARD_MIN)
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_edges
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert CLUSTER_JACCARD_MIN <= r["mean_jaccard"] <= 1.0


def test_incremental_dedup_equals_band_join_shape(spark, sf_dir):
    """Round-13 rewrite guard: the mixed-orientation slice of the
    materialized minhash_lsh_pairs table must reproduce the original
    new-vs-stored band-join + shingle-verification construction exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    shingles = dd._shingles_df(spark, sf_dir)
    sigs = dd._minhash_signatures_from(shingles)
    bands = dd._minhash_bands(sigs)
    is_new = F.col("doc_id") % dd.INCR_NEW_MOD == 0
    new_bands = bands.filter(is_new).select(
        F.col("doc_id").alias("new_doc_id"), "band", "sig"
    )
    stored_bands = bands.filter(~is_new).select(
        F.col("doc_id").alias("stored_doc_id"), "band", "sig"
    )
    candidates = (
        new_bands.join(stored_bands, ["band", "sig"])
        .groupBy("new_doc_id", "stored_doc_id")
        .agg(F.count("*").alias("n_band_collisions"))
    )
    sh = shingles.select("doc_id", "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("new_doc_id"), "shingle")
    sb = sh.select(F.col("doc_id").alias("stored_doc_id"), "shingle")
    overlap = (
        candidates.join(sa, "new_doc_id")
        .join(sb, ["stored_doc_id", "shingle"])
        .groupBy("new_doc_id", "stored_doc_id", "n_band_collisions")
        .agg(F.count("*").alias("common"))
    )
    za = sizes.select(F.col("doc_id").alias("new_doc_id"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(
        F.col("doc_id").alias("stored_doc_id"), F.col("n_sh").alias("n_b")
    )
    jac = F.floor(
        F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")) * 1000000.0
        + 0.5
    ) / 1000000.0
    scored = (
        overlap.join(za, "new_doc_id")
        .join(zb, "stored_doc_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= dd.JACCARD_THRESHOLD)
    )
    w = Window.partitionBy("new_doc_id").orderBy(F.desc("jaccard"), "stored_doc_id")
    ref = sorted(
        map(
            tuple,
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("new_doc_id", "stored_doc_id", "n_band_collisions", "jaccard")
            .collect(),
        )
    )
    out = sorted(map(tuple, dd.incremental_dedup(spark, sf_dir).collect()))
    assert out == ref
