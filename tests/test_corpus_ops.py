"""Invariant tests for the round-4 third-session corpus operators:
chunk-level boilerplate, redaction scrub, temperature mixture weights.

Cross-engine value parity is covered by tools/check.py oracles; these
tests pin the semantic invariants that a hash match alone wouldn't
explain to a reader (guard behavior, bounds, monotonicity).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.io import load_table
from basin_climbing_data_pipeline_spark.operators.dedup import (
    BOILERPLATE_MIN_DOCS,
    CHUNK_WORDS,
    chunk_boilerplate,
)
from basin_climbing_data_pipeline_spark.operators.sampling import (
    temperature_mixture_weights,
)
from basin_climbing_data_pipeline_spark.operators.textstats import (
    SCRUB_PATTERNS,
    SCRUB_TOKEN,
    pii_scrub,
)


def test_chunk_boilerplate_bounds(spark, sf_dir):
    rows = chunk_boilerplate(spark, sf_dir).collect()
    assert rows, "corpus should produce at least one chunked doc"
    for r in rows:
        assert 0 <= r["n_boilerplate_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["boilerplate_ratio"] <= 1.0
    # tiny-vocab synthetic corpus: some chunks MUST recur across docs,
    # otherwise the query proves nothing
    assert any(r["n_boilerplate_chunks"] > 0 for r in rows)


def test_chunk_guard_short_doc(spark):
    """A doc shorter than CHUNK_WORDS words must yield zero chunks — the
    sequence(1, 0)-descends hazard the builder guards against."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, " ".join(["w"] * (CHUNK_WORDS * 2)))], "doc_id int, text string"
    )
    chunks_expr = F.expr(
        f"CASE WHEN size(w) >= {CHUNK_WORDS} THEN "
        f"transform(sequence(1, size(w) div {CHUNK_WORDS}),"
        f" i -> concat_ws(' ', slice(w, (i-1)*{CHUNK_WORDS}+1, {CHUNK_WORDS})))"
        " ELSE array() END"
    )
    out = (
        df.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("w"))
        .select("doc_id", F.size(chunks_expr).alias("n"))
        .collect()
    )
    by_id = {r["doc_id"]: r["n"] for r in out}
    assert by_id[1] == 0
    assert by_id[2] == 2


def test_pii_scrub_matches_python_re(spark, sf_dir):
    """Spot-check 20 docs: Spark's regexp_count/replace agrees with
    Python's re module on the same patterns."""
    sample = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in pii_scrub(spark, sf_dir).filter(F.col("doc_id") < 20).collect()
    }
    for row in sample:
        text = row["text"]
        expected_counts = {
            fam: len(re.findall(pat, text)) for fam, pat in SCRUB_PATTERNS.items()
        }
        scrubbed = text
        for pat in SCRUB_PATTERNS.values():
            scrubbed = re.sub(pat, SCRUB_TOKEN, scrubbed)
        g = got[row["doc_id"]]
        for fam, n in expected_counts.items():
            assert g[f"n_{fam}"] == n, (row["doc_id"], fam)
        assert g["scrubbed_fp"] == hashlib.md5(scrubbed.encode()).hexdigest()
        assert g["n_scrubbed_total"] == sum(expected_counts.values())


def test_temperature_weights_rebalance(spark, sf_dir):
    rows = temperature_mixture_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    # fixed-point weights normalize to ~1 (each weight rounded to 1e-6)
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # sqrt temperature compresses the spread: the weight ordering matches
    # the share ordering, but max/min weight ratio shrinks
    by_share = sorted(rows, key=lambda r: r["token_share"])
    weights = [r["temp_weight"] for r in by_share]
    assert weights == sorted(weights)
    shares = [r["token_share"] for r in by_share]
    assert weights[-1] / weights[0] < shares[-1] / shares[0]
    # tail source is upsampled vs proportional, head source downsampled
    assert weights[0] > shares[0]
    assert weights[-1] < shares[-1]


def test_cross_source_leakage_consistency(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        CLUSTER_JACCARD_MIN,
        cross_source_leakage,
        minhash_lsh_pairs,
    )

    rows = cross_source_leakage(spark, sf_dir).collect()
    assert rows, "near-dup pairs above the cluster threshold must exist"
    for r in rows:
        assert r["source_1"] <= r["source_2"]
        assert r["cross_source"] == (r["source_1"] != r["source_2"])
        assert 0.0 <= r["avg_jaccard"] <= r["max_jaccard"] <= 1.0
        assert r["n_pairs"] >= 1
    total = sum(r["n_pairs"] for r in rows)
    expected = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= CLUSTER_JACCARD_MIN)
        .count()
    )
    assert total == expected


def test_hard_negative_mining_vs_topk(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.similarity import (
        HARD_NEG_K,
        N_QUERIES,
        cosine_topk,
        hard_negative_mining,
    )

    negs = hard_negative_mining(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in negs:
        assert r["neg_label"] != r["query_label"]
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == N_QUERIES
    top1 = {
        r["query_id"]: r["cosine"]
        for r in cosine_topk(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    for qid, rs in per_q.items():
        assert len(rs) == HARD_NEG_K
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        # the hardest wrong-label negative can't beat the unrestricted top-1
        assert cosines[0] <= top1[qid]


def test_subword_token_stats_invariants(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        SUBWORD_PIECE_CHARS,
        subword_token_stats,
    )

    rows = subword_token_stats(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        # every word yields >= 1 piece, and at most ceil(maxlen/k) per word
        assert r["n_subword_tokens"] >= r["n_words"]
        assert r["fertility"] >= 1.0
        # all-lowercase single-space corpus: regex word runs == whitespace
        assert r["n_regex_tokens"] == r["n_words"]


def test_subword_count_matches_python(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        SUBWORD_PIECE_CHARS,
        subword_token_stats,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in subword_token_stats(spark, sf_dir).filter(F.col("doc_id") < 10).collect()
    }
    k = SUBWORD_PIECE_CHARS
    for doc_id, text in docs.items():
        words = text.strip().split(" ")
        expected = sum((len(w) + k - 1) // k for w in words)
        assert got[doc_id]["n_subword_tokens"] == expected


def test_streaming_static_enrichment_matches_batch(spark, sf_dir):
    """The availableNow replay of the stream-static join must equal the
    batch join of the same data."""
    from basin_climbing_data_pipeline_spark.functions.money import sum_money
    from basin_climbing_data_pipeline_spark.streaming.events_stream import (
        WINDOW_US,
        streaming_static_enrichment,
    )

    got = {
        (r["window_start_us"], r["segment"]): (r["n_events"], r["total_value"])
        for r in streaming_static_enrichment(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    batch = (
        ev.join(cust, "user_id")
        .groupBy(
            (F.floor(F.unix_micros("ts") / WINDOW_US) * WINDOW_US).alias("w"),
            "segment",
        )
        .agg(F.count("*").alias("n"), sum_money(F.col("value")).alias("v"))
        .collect()
    )
    expected = {(r["w"], r["segment"]): (r["n"], r["v"]) for r in batch}
    assert got == expected


def test_source_quality_cap(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        SOURCE_CAP_DOCS,
        source_quality_cap,
    )

    rows = source_quality_cap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(r["n_docs"], SOURCE_CAP_DOCS)
        assert r["cutoff_score"] is not None


def test_training_shard_assignment(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        N_TRAIN_SHARDS,
        training_shard_assignment,
    )

    rows = training_shard_assignment(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < N_TRAIN_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are dense 1..n per shard (restartable-reader contract)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # the shuffle actually shuffles: shard-order doc ids are not sorted
    order = [r["doc_id"] for r in rows]
    assert order != sorted(order)


def test_dedup_recall_eval(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        PLANT_MOD,
        dedup_recall_eval,
    )

    row = dedup_recall_eval(spark, sf_dir).collect()[0]
    expected_planted = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % PLANT_MOD == 0)
        .count()
    )
    assert row["n_planted"] == expected_planted
    assert 0 <= row["n_found"] <= row["n_planted"]
    # a ~14% word-drop edit must be caught well above chance by 8x2 banding
    assert row["recall_micro"] >= 500_000, row


def test_sliding_window_chunks_cover_whole_doc(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        CHUNK_STRIDE_TOKENS,
        CHUNK_WINDOW_TOKENS,
        sliding_window_chunks,
    )

    wins = sliding_window_chunks(spark, sf_dir).filter(F.col("doc_id") < 30).collect()
    lens = {
        r["doc_id"]: len(r["text"].strip().split(" "))
        for r in load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).collect()
    }
    by_doc: dict[int, list] = {}
    for r in wins:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["window_idx"])
        n = lens[doc_id]
        # dense indices, stride-aligned starts, last window reaches the end
        for i, r in enumerate(rows):
            assert r["window_idx"] == i
            assert r["start_tok"] == i * CHUNK_STRIDE_TOKENS
            assert r["end_tok"] == min(r["start_tok"] + CHUNK_WINDOW_TOKENS, n)
        assert rows[-1]["end_tok"] == n
        # every window except possibly the last is full width
        for r in rows[:-1]:
            assert r["end_tok"] - r["start_tok"] == CHUNK_WINDOW_TOKENS


def test_mixture_epoch_plan_consistent(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        EPOCH_TOKEN_BUDGET,
        mixture_epoch_plan,
    )

    rows = mixture_epoch_plan(spark, sf_dir).collect()
    assert rows
    total_target = sum(r["target_tokens"] for r in rows)
    # floors lose < 1 token per source
    assert EPOCH_TOKEN_BUDGET - len(rows) <= total_target <= EPOCH_TOKEN_BUDGET
    for r in rows:
        # target ≈ epochs × corpus tokens (micro-floor identity)
        micro = r["full_epochs"] * 1_000_000 + r["frac_epoch_micro"]
        assert micro == (r["target_tokens"] * 1_000_000) // r["n_tokens"]
        assert 0 <= r["frac_epoch_micro"] < 1_000_000


def test_scrub_machinery_on_real_pii_patterns(spark):
    """The production PII pattern set, exercised on planted PII: the same
    scrub_columns machinery pii_scrub runs on the corpus."""
    import hashlib
    import re

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        PII_PATTERNS,
        SCRUB_TOKEN,
        scrub_columns,
    )

    rows = [
        (1, "contact jane.doe+x@example.co.uk or call +1 (512) 555-1234 now"),
        (2, "ssn 123-45-6789 leaked from host 10.0.255.7 yesterday"),
        (3, "no pii here, just words and numbers like 42"),
        (4, "two mails: a@b.io c.d@e-f.org and 192.168.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in scrub_columns(df, "text", PII_PATTERNS, ["doc_id"]).collect()
    }
    for doc_id, text in rows:
        expected = {
            fam: len(re.findall(pat, text)) for fam, pat in PII_PATTERNS.items()
        }
        scrubbed = text
        for pat in PII_PATTERNS.values():
            scrubbed = re.sub(pat, SCRUB_TOKEN, scrubbed)
        g = got[doc_id]
        for fam, nexp in expected.items():
            assert g[f"n_{fam}"] == nexp, (doc_id, fam, nexp)
        assert g["scrubbed_fp"] == hashlib.md5(scrubbed.encode()).hexdigest()
    # sanity: the planted rows actually fire every family at least once
    assert sum(g["n_email"] for g in got.values()) >= 3
    assert sum(g["n_phone"] for g in got.values()) >= 1
    assert sum(g["n_ssn_like"] for g in got.values()) >= 1
    assert sum(g["n_ipv4"] for g in got.values()) >= 2
    assert got[3]["n_scrubbed_total"] == 0


# ---------------------------------------------------------------------------
# round-4 fifth-session operators
# ---------------------------------------------------------------------------


def test_quality_rule_battery_counts_consistent(spark, sf_dir):
    """Per-source fail counts bound n_docs; pass count equals docs failing
    zero rules; the battery must actually discriminate on this corpus
    (some rule fires somewhere, some doc passes everywhere)."""
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        quality_rule_battery,
    )

    rows = quality_rule_battery(spark, sf_dir).collect()
    assert rows
    fail_cols = ["fail_len", "fail_word_len", "fail_top_token", "fail_ttr", "fail_stopword"]
    for r in rows:
        for c in fail_cols:
            assert 0 <= r[c] <= r["n_docs"]
        assert 0 <= r["n_pass"] <= r["n_docs"]
        # a doc that passes all rules fails none: n_pass + (docs failing >=1)
        # = n_docs, so n_pass >= n_docs - sum(fails)
        assert r["n_pass"] >= r["n_docs"] - sum(r[c] for c in fail_cols)
    assert any(any(r[c] > 0 for c in fail_cols) for r in rows), "no rule ever fired"
    assert any(r["n_pass"] > 0 for r in rows), "no doc passed the battery"


def test_unigram_logprob_matches_python(spark, sf_dir):
    """Recompute the corpus unigram LM and a few documents' micro-rounded
    mean log-probs in plain Python; Spark must agree exactly."""
    import math
    from collections import Counter

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        unigram_logprob_quality,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts: Counter[str] = Counter()
    for r in docs:
        counts.update(t for t in r["text"].strip().split(" ") if t)
    total = sum(counts.values())
    lnp = {
        t: math.floor(math.log(n / total) * 1e6 + 0.5) for t, n in counts.items()
    }
    got = {r["doc_id"]: r for r in unigram_logprob_quality(spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for r in docs[:25]:
        toks = [t for t in r["text"].strip().split(" ") if t]
        want_micro = math.floor(sum(lnp[t] for t in toks) / len(toks) + 0.5)
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert abs(g["avg_logprob"] - want_micro / 1e6) < 1e-9
        want_bucket = (
            "likely" if want_micro >= -3_000_000
            else "typical" if want_micro >= -4_500_000
            else "rare"
        )
        assert g["ppl_bucket"] == want_bucket


def test_sorted_neighborhood_finds_planted_prefix_dup(spark, sf_dir):
    """SNM must catch a near-identical shared-prefix pair (its home turf)
    and must never emit more than n * SNM_WINDOW candidates."""
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        SNM_WINDOW,
        sorted_neighborhood_pairs,
    )

    out = sorted_neighborhood_pairs(spark, sf_dir)
    rows = out.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) <= n_docs * SNM_WINDOW
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["jaccard"] >= 0.5
    # the synthetic corpus plants shared-prefix near-dups; SNM is the
    # operator that must see them
    assert rows, "expected at least one confirmed near-dup pair"


def test_sorted_neighborhood_short_docs_oracle_parity(spark, tmp_path):
    """Docs under 3 words cannot form a 3-gram and the engines' out-of-range
    indexing semantics diverge (concat_ws skips NULLs, DuckDB || propagates)
    — the guard excludes them before shingling on BOTH engines.  The corpus
    has no short docs, so this pins the guarded behavior directly."""
    import duckdb
    import pandas as pd

    from basin_climbing_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_pairs_sql,
    )

    texts = [
        "a",                        # 1 word — must be excluded
        "a b",                      # 2 words — must be excluded
        "a b c",                    # exactly 3 — one gram
        "a b c d e f g h near dup one two three",
        "a b c d e f g h near dup one two four",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["xx"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = sorted_neighborhood_pairs(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(sorted_neighborhood_pairs_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # the planted near-dup pair survives; no pair involves a short doc
    assert {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])} >= {(3, 4)}
    assert not set(got["doc_a"]) & {0, 1} and not set(got["doc_b"]) & {0, 1}


def test_sorted_neighborhood_no_global_sort(spark, sf_dir):
    """The window must run per block — a plan that funnels the corpus into
    a single partition would be a 100 TB scale-killer."""
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    plan = (
        sorted_neighborhood_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the final orderBy is a rangepartitioning sort on the (tiny) result;
    # the corpus-sized window stage must hash-partition by block
    assert "hashpartitioning(block" in plan


def test_category_basket_lift_bounds(spark, sf_dir):
    """Pair support can't exceed either singleton's; lift must be exactly
    n_ab * N / (n_a * n_b) at fixed-point precision."""
    import math

    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        BASKET_MIN_SUPPORT,
        category_basket_lift,
    )

    rows = category_basket_lift(spark, sf_dir).collect()
    assert rows, "expected co-purchased category pairs"
    for r in rows:
        assert r["cat_a"] < r["cat_b"]
        assert BASKET_MIN_SUPPORT <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        want = math.floor(r["n_ab"] * r["n_baskets"] / (r["n_a"] * r["n_b"]) * 1e6 + 0.5) / 1e6
        assert abs(r["lift"] - want) < 1e-9


def test_spend_drift_psi_properties(spark, sf_dir):
    """PSI is ~0 when a distribution is compared with itself and non-negative
    up to per-term rounding; identical split halves aren't expected, so the
    registered query just has to be finite and near-symmetric-bounded."""
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.operators.sketches import spend_drift_psi
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        build_transactions,
    )

    rows = spend_drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each nano-rounded term is >= -0.5e-9; PSI can't be meaningfully negative
        assert r["psi"] >= -1e-6, r
        assert r["psi"] < 25.0, r
        assert r["n_baseline"] > 0 and r["n_current"] > 0
        assert r["n_buckets"] > 0


def test_visit_spend_correlation_matches_numpy(spark, sf_dir):
    """The exact-moment Pearson r must agree with numpy.corrcoef over the
    same per-customer (visits, spend-cents) pairs."""
    import numpy as np

    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.functions.money import to_cents
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        visit_spend_correlation,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import build_customers
    from basin_climbing_data_pipeline_spark.operators.events import build_checkins
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        build_transactions,
    )

    cust = build_customers(spark, sf_dir).select("customer_id")
    visits = build_checkins(spark, sf_dir).groupBy("customer_id").agg(F.count("*").alias("x"))
    spend = build_transactions(spark, sf_dir).groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("y")
    )
    pairs = (
        cust.join(visits, "customer_id", "left")
        .join(spend, "customer_id", "left")
        .fillna(0)
        .collect()
    )
    x = np.array([r["x"] for r in pairs], dtype=float)
    y = np.array([r["y"] for r in pairs], dtype=float)
    want = float(np.corrcoef(x, y)[0, 1])
    (row,) = visit_spend_correlation(spark, sf_dir).collect()
    assert row["n"] == len(pairs)
    assert abs(row["pearson_r"] - want) < 1e-4


def test_blocker_recall_eval_consistency(spark, sf_dir):
    """Hits are bounded by truth and by candidates; the union blocker can
    never have lower recall than either member."""
    from basin_climbing_data_pipeline_spark.operators.dedup import blocker_recall_eval

    rows = {r["blocker"]: r for r in blocker_recall_eval(spark, sf_dir).collect()}
    assert set(rows) == {"minhash_lsh", "snm", "union"}
    for r in rows.values():
        assert 0 <= r["n_hit"] <= min(r["n_truth"], r["n_candidates"])
        assert 0.0 <= r["recall"] <= 1.0
    assert rows["union"]["recall"] >= max(
        rows["minhash_lsh"]["recall"], rows["snm"]["recall"]
    )


def test_repeated_ngram_coverage_invariants(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        repeated_ngram_coverage,
    )

    rows = repeated_ngram_coverage(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs, "every document must surface, even gram-less ones"
    for r in rows:
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        if r["n_grams"] == 0:
            assert r["dup_fraction"] is None
        else:
            assert 0.0 <= r["dup_fraction"] <= 1.0
    # tiny-vocab synthetic corpus: spans MUST recur across docs
    assert any(r["n_dup_grams"] > 0 for r in rows)


def test_gram_novelty_totals_consistent(spark, sf_dir):
    """Novel grams summed over all sources == distinct grams in the corpus
    (every gram is novel exactly once, at its first doc)."""
    from basin_climbing_data_pipeline_spark.operators.dedup import _shingles_df
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        gram_novelty_by_source,
    )

    rows = gram_novelty_by_source(spark, sf_dir).collect()
    n_novel = sum(r["n_novel_grams"] for r in rows)
    n_distinct = _shingles_df(spark, sf_dir).select("shingle").distinct().count()
    assert n_novel == n_distinct
    for r in rows:
        assert 0 <= r["n_novel_grams"] <= r["n_grams"]
        if r["novelty_ratio"] is not None:
            assert 0.0 <= r["novelty_ratio"] <= 1.0


def test_stratified_alloc_exact_budget(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        STRAT_BUDGET_DIV,
        stratified_sample_alloc,
    )

    rows = stratified_sample_alloc(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    budget = total // STRAT_BUDGET_DIV
    assert sum(r["quota"] for r in rows) == budget, "Hamilton allocation is exact"
    for r in rows:
        assert 0 <= r["quota"] <= r["n_docs"]
        assert r["n_selected"] == r["quota"], "admission always fills the quota"
        # proportionality within one seat of the exact share
        exact = budget * r["n_docs"] / total
        assert abs(r["quota"] - exact) < 1.0


def test_weighted_reservoir_biases_toward_heavy_docs(spark, sf_dir):
    """A-ES with w = n_chars must overrepresent long documents: the mean
    weight of the selected sample exceeds the corpus mean weight."""
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        RESERVOIR_K,
        weighted_reservoir_sample,
    )

    rows = weighted_reservoir_sample(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("n_chars").collect()
    k = min(RESERVOIR_K, len(docs))
    assert len(rows) == k
    assert [r["rank"] for r in rows] == list(range(1, k + 1))
    keys = [r["sel_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(r["sel_key"] <= 0.0 for r in rows), "ln(u)/w is never positive"
    if len(docs) > 2 * k:
        corpus_mean = sum(r["n_chars"] for r in docs) / len(docs)
        sample_mean = sum(r["weight"] for r in rows) / k
        assert sample_mean > corpus_mean


def test_bigram_interp_matches_python(spark, sf_dir):
    """Re-derive the interpolated bigram LM scoring in pure Python."""
    import math

    import pandas as pd

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        BIGRAM_LAMBDA,
        bigram_interp_logprob,
    )

    got = {r["doc_id"]: r for r in bigram_interp_logprob(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {
        r.doc_id: [w for w in str(r.text).strip().split(" ") if w != ""]
        for r in docs.itertuples()
    }
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for words in toks.values():
        for w in words:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(words, words[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    for doc_id, words in toks.items():
        if not words:
            assert doc_id not in got
            continue
        s = 0
        for i, w in enumerate(words):
            p_uni = uni[w] / float(n)
            if i == 0:
                p = p_uni
            else:
                prev = words[i - 1]
                p = BIGRAM_LAMBDA * (big[(prev, w)] / float(uni[prev])) + (
                    1.0 - BIGRAM_LAMBDA
                ) * p_uni
            s += math.floor(math.log(p) * 1000000.0 + 0.5)
        want = math.floor(s / len(words) + 0.5) / 1000000.0
        r = got[doc_id]
        assert r["n_tokens"] == len(words)
        assert r["avg_logprob"] == want, doc_id
        assert r["avg_logprob"] <= 0.0


def test_linear_probe_recovers_generating_rule(spark, sf_dir):
    """The OLS probe must recover the quality score's known coefficients
    (0.3 stopword / 0.4 unique / 0.3 length) to fixed-point resolution,
    and match numpy's lstsq on the same scaled integers."""
    import numpy as np
    import pandas as pd

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        _FEAT_SCALE,
        linear_probe_quality,
    )

    r = linear_probe_quality(spark, sf_dir).collect()[0]
    assert r["max_coef_deviation"] < 0.01, "coefficients recovered"
    assert r["r_squared"] > 0.999
    assert abs(r["w_stopword"] - 0.3) < 0.01
    assert abs(r["w_unique"] - 0.4) < 0.01
    assert abs(r["w_length"] - 0.3) < 0.01
    # numpy differential on the identical scaled-integer features
    import duckdb

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        QUALITY_SPAM_MAX,  # noqa: F401  (import proves the module contract)
        doc_stats_sql,
        quality_score_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(
        f"""WITH stats AS ({doc_stats_sql()})
SELECT CAST(floor(coalesce(stopword_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
       CAST(floor(coalesce(unique_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
       CAST(floor(least(n_words / 100.0, 1.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
       CAST(floor({quality_score_sql()} * {_FEAT_SCALE} + 0.5) AS BIGINT)
FROM stats"""
    ).fetchall()
    a = np.array(rows, dtype=float) / _FEAT_SCALE
    x = np.hstack([np.ones((len(a), 1)), a[:, :3]])
    y = a[:, 3]
    w, *_ = np.linalg.lstsq(x, y, rcond=None)
    assert abs(r["w_intercept"] - w[0]) < 1e-4
    assert abs(r["w_stopword"] - w[1]) < 1e-4
    assert abs(r["w_unique"] - w[2]) < 1e-4
    assert abs(r["w_length"] - w[3]) < 1e-4


def test_k_anonymity_accounting(spark, sf_dir):
    """Histogram reconciles with the table; negative balances band by
    FLOOR on both engines (the Spark-div-vs-DuckDB-// trap)."""
    import duckdb

    from basin_climbing_data_pipeline_spark.operators.quality import (
        ACCTBAL_BAND,
        K_ANON_THRESHOLD,
        k_anonymity_audit,
        k_anonymity_audit_sql,
    )

    rows = k_anonymity_audit(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_total
    for r in rows:
        assert r["n_customers"] == r["class_size"] * r["n_classes"]
        assert r["violates_k"] == (r["class_size"] < K_ANON_THRESHOLD)
    # floor-banding parity on negative balances, tiny synthetic table
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM (VALUES "
        "(1, 'a', 1, -1500.0, 's'), (2, 'b', 1, -0.01, 's'), "
        "(3, 'c', 1, 0.0, 's'), (4, 'd', 1, 999.99, 's')"
        ") t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)"
    )
    got = con.execute(k_anonymity_audit_sql()).fetchall()
    import pandas as pd

    sdf = spark.createDataFrame(
        [(1, "a", 1, -1500.0, "s"), (2, "b", 1, -0.01, "s"),
         (3, "c", 1, 0.0, "s"), (4, "d", 1, 999.99, "s")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    from pyspark.sql import functions as SF

    classes = sdf.groupBy(
        "c_nationkey", "c_mktsegment",
        SF.floor(SF.col("c_acctbal") / float(ACCTBAL_BAND)).cast("long").alias("b"),
    ).count()
    spark_hist = sorted(
        (r["count"],) for r in classes.collect()
    )
    duck_hist = sorted((r[0],) * 0 + (r[0],) for r in got for _ in range(r[1]))
    # -1500 -> band -2, -0.01 -> band -1, 0.0 and 999.99 -> band 0
    bands = {r["b"] for r in classes.collect()}
    assert bands == {-2, -1, 0}
    assert sum(c for (c,) in spark_hist) == 4
    assert sum(r[0] * r[1] for r in got) == 4
