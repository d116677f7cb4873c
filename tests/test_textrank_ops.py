"""Invariant tests for the round-4 fourth-session corpus operators:
shingle containment, vocabulary coverage, tf-idf keywords, Zipf slope.

Cross-engine value parity is covered by tools/check.py oracles; these
pin the semantic invariants a hash match alone wouldn't explain.
"""

from __future__ import annotations

import math

from basin_climbing_data_pipeline_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    containment_pairs,
    ngram_jaccard_pairs,
)
from basin_climbing_data_pipeline_spark.operators.textstats import (
    TFIDF_TOP_K,
    VOCAB_SIZES,
    tfidf_keywords,
    vocab_coverage,
    zipf_slope,
)


def test_containment_dominates_jaccard(spark, sf_dir):
    """containment = common/min(|A|,|B|) ≥ jaccard = common/|A∪B| for every
    pair, so every Jaccard-flagged pair above the containment threshold
    must also be containment-flagged — the doc-inside-doc detector is a
    strict superset on the shared candidate space."""
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(spark, sf_dir).collect()
    }
    assert cont, "synthetic corpus should produce containment pairs"
    for r in ngram_jaccard_pairs(spark, sf_dir).collect():
        key = (r["doc_a"], r["doc_b"])
        if r["jaccard"] >= CONTAINMENT_THRESHOLD:
            assert key in cont and cont[key] >= r["jaccard"] - 1e-9
    for (a, b), c in cont.items():
        assert a < b
        assert CONTAINMENT_THRESHOLD <= c <= 1.0


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = vocab_coverage(spark, sf_dir).orderBy("vocab_size").collect()
    assert [r["vocab_size"] for r in rows] == list(VOCAB_SIZES)
    prev = -1.0
    for r in rows:
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["covered_tokens"] <= r["total_tokens"]
        assert r["coverage"] >= prev, "coverage must be monotone in vocab size"
        prev = r["coverage"]
    # total is K-independent
    assert len({r["total_tokens"] for r in rows}) == 1


def test_tfidf_topk_shape(spark, sf_dir):
    rows = tfidf_keywords(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOP_K
        # ranking key is (score desc, token asc) — verify it held
        keys = [(-r["score_micro"], r["token"]) for r in rs]
        assert keys == sorted(keys)
        for r in rs:
            assert r["score_micro"] == r["tf"] * 1000000 // r["df"]


def test_zipf_slope_sane(spark, sf_dir):
    row = zipf_slope(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_tokens"] >= 2
    # frequencies are non-increasing in rank, so the fit slope must be <= 0
    assert r["zipf_slope"] <= 0.0
    assert math.isfinite(r["ln_intercept"])


def test_cms_overestimates_only(spark, sf_dir):
    """Count-Min guarantee: estimate >= true count, always."""
    from basin_climbing_data_pipeline_spark.operators.sketches import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["true_n"]
        assert r["overestimate"] == r["cms_estimate"] - r["true_n"]


def test_hll_error_bounded(spark, sf_dir):
    """HLL with m=256 + linear-counting small-range switch: measured
    relative error should sit well inside ~4 standard errors
    (1.04/sqrt(256) ≈ 6.5% per sigma)."""
    from basin_climbing_data_pipeline_spark.operators.sketches import hll_distinct_eval

    rows = hll_distinct_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] > 0
        assert r["rel_error"] <= 0.26, (r["event_type"], r["rel_error"])


def test_bloom_no_false_negatives(spark, sf_dir):
    """The Bloom pruning guarantee: a build-set member NEVER fails the
    probe — pruning can only over-read, never drop matching rows."""
    from basin_climbing_data_pipeline_spark.operators.sketches import bloom_join_prune

    r = bloom_join_prune(spark, sf_dir).collect()[0]
    assert r["false_negatives"] == 0
    assert r["n_bloom_pass"] == r["n_members"] + r["false_positives"]
    assert 0.0 <= r["measured_fpr"] <= 1.0


def test_event_funnel_monotone(spark, sf_dir):
    """Funnel counts can only shrink step to step (strict ordering +
    bounded hop), and conversions stay in [0, 1]."""
    from basin_climbing_data_pipeline_spark.operators.cohorts import event_funnel

    rows = event_funnel(spark, sf_dir).orderBy("step").collect()
    assert [r["event_type"] for r in rows] == ["view", "click", "purchase"]
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert 0.0 <= r["conversion"] <= 1.0


def test_histogram_quantiles_error_within_bucket_bound(spark, sf_dir):
    """Log-bucket width is 10^(1/16) ≈ 1.155, so the interpolated estimate
    can be off by at most ~15.5% of the true value (plus discreteness);
    measured error must respect that bound and quantiles must be
    non-decreasing in q."""
    from basin_climbing_data_pipeline_spark.operators.sketches import histogram_quantiles

    rows = histogram_quantiles(spark, sf_dir).orderBy("q").collect()
    assert len(rows) == 3
    ests = [r["hist_estimate"] for r in rows]
    assert ests == sorted(ests)
    for r in rows:
        assert r["rel_error"] <= 0.16, (r["q"], r["rel_error"])


def test_pagerank_deterministic_and_sane(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.graph import (
        PR_BASE_MICRO,
        pagerank_proximity,
    )

    a = pagerank_proximity(spark, sf_dir).collect()
    b = pagerank_proximity(spark, sf_dir).collect()
    assert a == b, "integer PageRank must be bit-deterministic across runs"
    assert a, "strong-tie graph should be non-empty at test scale"
    scores = [r["score_micro"] for r in a]
    assert scores == sorted(scores, reverse=True)
    for r in a:
        assert r["score_micro"] >= PR_BASE_MICRO
        assert r["degree"] >= 1


def test_triangle_stats_invariants(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.graph import triangle_stats

    r = triangle_stats(spark, sf_dir).collect()[0]
    # every triangle closes exactly one ordered wedge, so tri <= wedges
    assert 0 <= r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering_coeff"] <= 1.0
    assert r["n_edges"] >= r["n_triangles"] ** (1 / 3)  # sanity, not tight


def test_markov_rows_normalize(spark, sf_dir):
    """Each from_event row of the transition matrix must sum to ~1 (exact
    up to the fixed-point rounding of each cell)."""
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.cohorts import markov_transitions

    rows = markov_transitions(spark, sf_dir).collect()
    assert rows
    by_from = defaultdict(float)
    for r in rows:
        assert r["n"] >= 1
        assert 0.0 <= r["p"] <= 1.0
        by_from[r["from_event"]] += r["p"]
    for fe, total in by_from.items():
        assert abs(total - 1.0) < 5e-6, (fe, total)


def test_entropy_bounds(spark, sf_dir):
    """Shannon entropy is bounded by ln(vocab_size); KL from the corpus
    mix is non-negative (Gibbs), up to per-term micro rounding."""
    import math

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        source_token_entropy,
    )

    rows = source_token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_nats"] <= math.log(r["vocab_size"]) + 1e-4
        assert r["kl_from_corpus"] >= -1e-4
        assert r["vocab_size"] >= 1


def test_daily_anomalies_threshold(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        ANOMALY_Z_MICRO,
        daily_anomalies,
    )

    rows = daily_anomalies(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["z_micro"]) >= ANOMALY_Z_MICRO
        assert r["n"] >= 0


def test_pmi_collocations_sane(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )

    rows = pmi_collocations(spark, sf_dir).collect()
    assert rows
    keys = [(-r["pmi_micro"], r["x"], r["y"]) for r in rows]
    assert keys == sorted(keys), "deterministic (pmi desc, x, y) ordering"
    for r in rows:
        assert r["nxy"] >= PMI_MIN_COUNT


def test_common_neighbor_recs_excludes_direct_edges(spark, sf_dir):
    """Recommended pairs must be non-adjacent in the strong-tie graph and
    their Jaccard must be consistent with common/degree counts."""
    from basin_climbing_data_pipeline_spark.operators.events import (
        proximity_connections,
    )
    from basin_climbing_data_pipeline_spark.operators.graph import (
        ADJ_CAP,
        STRONG_TIE_MIN,
        common_neighbor_recs,
    )

    recs = common_neighbor_recs(spark, sf_dir).collect()
    assert recs, "expected at least one recommendation"
    # rebuild the capped adjacency the operator scores over
    strong = [
        r
        for r in proximity_connections(spark, sf_dir).collect()
        if r["strength_score"] >= STRONG_TIE_MIN
    ]
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in strong:
        adj.setdefault(r["customer_id_1"], []).append((-r["n_copresent"], r["customer_id_2"]))
        adj.setdefault(r["customer_id_2"], []).append((-r["n_copresent"], r["customer_id_1"]))
    capped = {
        (src, dst)
        for src, nbrs in adj.items()
        for _, dst in sorted(nbrs)[:ADJ_CAP]
    }
    for r in recs:
        assert r["a"] < r["b"]
        assert (r["a"], r["b"]) not in capped
        assert r["common_neighbors"] >= 1
        assert 0.0 < r["neighbor_jaccard"] <= 1.0


def test_warehouse_constraint_audit_all_pass(spark, sf_dir):
    """The synthetic warehouse is clean by construction: every constraint
    must pass, and the violation arithmetic must be internally consistent."""
    from basin_climbing_data_pipeline_spark.operators.quality import (
        warehouse_constraint_audit,
    )

    rows = {r["check_name"]: r for r in warehouse_constraint_audit(spark, sf_dir).collect()}
    assert set(rows) == {
        "transactions_id_unique",
        "transactions_amount_not_null",
        "checkins_customer_fk",
        "memberships_date_order",
        "customers_email_format",
        "checkins_entry_domain",
    }
    for r in rows.values():
        assert r["n_rows"] > 0
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["n_violations"] <= r["n_rows"]


def test_warehouse_constraint_audit_catches_violations(spark):
    """Plant a duplicate id and an orphan FK in tiny frames and prove the
    audit arithmetic counts them (the checks are not vacuous)."""
    from pyspark.sql import functions as F

    txn = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, None)], "transaction_id long, total_amount double"
    )
    stats = txn.agg(
        (F.count("*") - F.countDistinct("transaction_id")).alias("dups"),
        F.count(F.when(F.col("total_amount").isNull(), 1)).alias("nulls"),
    ).collect()[0]
    assert stats["dups"] == 1
    assert stats["nulls"] == 1


def test_strong_tie_rate_threshold(spark):
    """The rate form must equal the count form for <=30-day spans and
    demand proportionally more co-presences for longer spans."""
    import datetime as dt

    from basin_climbing_data_pipeline_spark.operators.graph import (
        STRONG_TIE_MIN,
        _strong_tie_filter,
    )

    rows = [
        # (n_copresent, first, last, should_survive)
        (3, dt.date(2024, 1, 1), dt.date(2024, 1, 25), True),   # short span, count form
        (2, dt.date(2024, 1, 1), dt.date(2024, 1, 25), False),
        (3, dt.date(2024, 1, 1), dt.date(2024, 5, 1), False),   # 121d span -> needs 15
        (15, dt.date(2024, 1, 1), dt.date(2024, 5, 1), True),
        (14, dt.date(2024, 1, 1), dt.date(2024, 5, 1), False),
    ]
    df = spark.createDataFrame(
        [(i, n, a, b) for i, (n, a, b, _) in enumerate(rows)],
        "id long, n_copresent long, first_date date, last_date date",
    )
    kept = {r["id"] for r in _strong_tie_filter(df).collect()}
    for i, (n, a, b, want) in enumerate(rows):
        assert (i in kept) == want, (i, n, a, b)
    assert STRONG_TIE_MIN == 3  # the scenario table above encodes this
