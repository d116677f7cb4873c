"""Physical-plan regression tests: the plans we designed for must stay the
plans Catalyst picks (broadcast dims, bounded shuffles, no accidental
cartesian joins)."""

from __future__ import annotations

import pytest

from basin_climbing_data_pipeline_spark.plans.audit import audit
from basin_climbing_data_pipeline_spark.registry import REGISTRY


@pytest.fixture(autouse=True)
def _raw_builder_plans(monkeypatch):
    # audit the real builder plans, not warehouse scans of materialized output
    monkeypatch.setenv("SPARK_GRAFT_NO_MATERIALIZE", "1")


def _audit(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    return audit(fn(spark, sf_dir))


def test_transactions_build_broadcasts_dims_no_shuffle(spark, sf_dir):
    st = _audit(spark, sf_dir, "transactions_build")
    assert st.n_shuffle_exchanges == 0  # both joins broadcast at this scale
    assert st.n_broadcast_hash_joins >= 2
    assert st.n_bnl_joins == 0


def test_window_queries_single_shuffle(spark, sf_dir):
    for name in ("visit_numbers", "rolling_60d_visits", "recency_buckets", "checkin_sessions"):
        st = _audit(spark, sf_dir, name)
        assert st.n_shuffle_exchanges == 1, f"{name}: {st.n_shuffle_exchanges} shuffles"


def test_price_bands_is_broadcast_nested_loop(spark, sf_dir):
    # the band join is a deliberate broadcast nested-loop over a 6-row dim
    st = _audit(spark, sf_dir, "suspicious_price_bands")
    assert st.n_bnl_joins >= 1
    assert st.n_sort_merge_joins == 0


def test_proximity_join_is_equi_blocked(spark, sf_dir):
    # the 30-min band predicate must ride on an equi join (type, date),
    # never a cartesian product
    st = _audit(spark, sf_dir, "proximity_connections")
    assert st.n_bnl_joins == 0


def test_fuzzy_join_is_equi_blocked(spark, sf_dir):
    st = _audit(spark, sf_dir, "fuzzy_email_matches")
    assert st.n_bnl_joins == 0  # sorted-neighborhood probe ranks keep it equi


def test_scans_prune_columns(spark, sf_dir):
    st = _audit(spark, sf_dir, "day_pass_counts_by_month")
    schemas = " ".join(st.read_schemas)
    assert schemas, "expected ReadSchema entries in the formatted plan"
    # columns the query never touches must be pruned from the parquet scans
    for unused in ("l_shipdate", "l_linestatus", "o_orderpriority", "p_retailprice"):
        assert unused not in schemas, f"{unused} not pruned: {schemas}"


def test_merged_transactions_window_stays_equi(spark, sf_dir):
    # the ST1 splice is union + window dedup over the transactions build:
    # broadcastable dims, no nested-loop anywhere
    st = _audit(spark, sf_dir, "merged_transactions_window")
    assert st.n_bnl_joins == 0


def test_expense_categories_pushes_filter_and_prunes(spark, sf_dir):
    st = _audit(spark, sf_dir, "expense_categories")
    assert st.n_bnl_joins == 0
    assert st.n_broadcast_hash_joins >= 1  # part side broadcasts
    schemas = " ".join(st.read_schemas)
    # the ledger slice filter must reach the lineitem scan
    assert any("l_returnflag" in f for f in st.pushed_filters), st.pushed_filters
    # columns the query never touches must be pruned
    for unused in ("l_tax", "p_retailprice", "p_name"):
        assert unused not in schemas, f"{unused} not pruned: {schemas}"


def test_fuzzy_name_join_is_equi_blocked(spark, sf_dir):
    # (last name, deletion-neighborhood variant) blocking must keep the
    # levenshtein match on an equi join — never a per-surname cross product
    st = _audit(spark, sf_dir, "pass_transfer_name_links")
    assert st.n_bnl_joins == 0


def test_ann_recall_eval_broadcasts_probe_sides(spark, sf_dir):
    # the query-signature probe and the top-k truth table are tiny and must
    # broadcast; the only nested loop allowed is the deliberate brute-force
    # ground-truth scan (10-row query side broadcast over the corpus).  The
    # truth table is cached, so that scan EXECUTES once — but formatted
    # explain re-prints the cached subtree under each InMemoryTableScan, so
    # the static count sees it once per truth consumer (2) plus the cache
    # definition itself
    st = _audit(spark, sf_dir, "ann_recall_eval")
    assert st.n_bnl_joins <= 3
    assert st.n_broadcast_hash_joins >= 2


def test_minhash_error_eval_is_equi(spark, sf_dir):
    # candidate pairs x signature table: two equi-joins, no nested loop
    st = _audit(spark, sf_dir, "minhash_error_eval")
    assert st.n_bnl_joins == 0


def test_pii_scrub_is_scan_plus_projection(spark, sf_dir):
    # pure per-row redaction: no joins at all; the only exchange is the
    # output ordering
    st = _audit(spark, sf_dir, "pii_scrub")
    assert st.n_broadcast_hash_joins == 0
    assert st.n_sort_merge_joins == 0
    assert st.n_bnl_joins == 0


def test_chunk_boilerplate_is_inverted_index(spark, sf_dir):
    # chunk doc-frequency join must stay equi (broadcast or SMJ on the
    # chunk hash), never a cartesian pair scan
    st = _audit(spark, sf_dir, "chunk_boilerplate")
    assert st.n_bnl_joins == 0


def test_hard_negatives_ride_broadcast(spark, sf_dir):
    # the label-mismatch predicate is non-equi by design — it must run as
    # a broadcast nested loop over the tiny query side, never a shuffle
    # of the corpus against itself
    st = _audit(spark, sf_dir, "hard_negative_mining")
    assert st.n_bnl_joins >= 1
    assert st.n_sort_merge_joins == 0


def test_quantized_recall_no_sort_merge(spark, sf_dir):
    # both search passes broadcast the 10-row query side; the only joins
    # beyond them are the tiny per-query k-row overlaps
    st = _audit(spark, sf_dir, "quantized_topk_recall")
    assert st.n_sort_merge_joins == 0


def test_shard_assignment_single_shuffle(spark, sf_dir):
    # one hash shuffle for the within-shard window, plus the output sort
    st = _audit(spark, sf_dir, "training_shard_assignment")
    assert st.n_shuffle_exchanges <= 2
    assert st.n_broadcast_hash_joins == 0


def test_containment_is_inverted_index(spark, sf_dir):
    # containment must ride the shingle equi-join like Jaccard — no BNLJ,
    # no cartesian pair generation
    st = _audit(spark, sf_dir, "containment_pairs")
    assert st.n_bnl_joins == 0


def test_tfidf_df_join_broadcasts(spark, sf_dir):
    # the vocab-sized df side must broadcast onto tf, not sort-merge
    st = _audit(spark, sf_dir, "tfidf_keywords")
    assert st.n_broadcast_hash_joins >= 1
    assert st.n_sort_merge_joins == 0
    assert st.n_bnl_joins == 0


def test_sketches_no_bnl_no_sortmerge(spark, sf_dir):
    # HLL / CMS / Bloom: every join is a tiny-side broadcast equi join
    for name in ("hll_distinct_eval", "cms_heavy_hitters", "bloom_join_prune"):
        st = _audit(spark, sf_dir, name)
        assert st.n_bnl_joins == 0, name
        assert st.n_sort_merge_joins == 0, name


def test_event_funnel_co_hashes_on_user(spark, sf_dir):
    # per-step min-aggs joined on user_id — equi joins only
    st = _audit(spark, sf_dir, "event_funnel")
    assert st.n_bnl_joins == 0


def test_triangle_join_is_equi(spark, sf_dir):
    # wedge generation + closure must both be equi joins — no BNLJ
    st = _audit(spark, sf_dir, "triangle_stats")
    assert st.n_sort_merge_joins + st.n_broadcast_hash_joins >= 2


def test_session_four_batch_no_bnl_no_sortmerge(spark, sf_dir):
    # the analytics batch: every join broadcasts its dim/vocab side,
    # nothing falls back to sort-merge or nested-loop at test scale
    for name in (
        "markov_transitions",
        "source_token_entropy",
        "pmi_collocations",
        "daily_anomalies",
        "event_funnel",
        "refund_metrics_long",
    ):
        st = _audit(spark, sf_dir, name)
        assert st.n_bnl_joins == 0, name
        assert st.n_sort_merge_joins == 0, name


def test_markov_single_corpus_shuffle_kind(spark, sf_dir):
    # the event stream is shuffled once for the per-user window; everything
    # after operates on the 5x5 pair matrix
    st = _audit(spark, sf_dir, "markov_transitions")
    assert st.n_shuffle_exchanges <= 4


def test_pivot_is_single_pass(spark, sf_dir):
    """pivot() with an explicit value list must compile to one conditional
    aggregation — no extra distinct job to discover pivot values, and only
    the month-key shuffle + final sort."""
    st = _audit(spark, sf_dir, "revenue_pivot_by_category")
    assert st.n_bnl_joins == 0
    assert st.n_shuffle_exchanges <= 3, st.n_shuffle_exchanges


def test_cogroup_shuffles_each_side_once(spark, sf_dir):
    """The cogroup must shuffle checkins and transactions once each on
    customer_id (plus the final presentation sort) — no join fan-out."""
    st = _audit(spark, sf_dir, "cogroup_spend_at_checkin")
    assert st.n_sort_merge_joins == 0
    assert st.n_bnl_joins == 0


def test_basket_lift_pair_join_is_equi(spark, sf_dir):
    """The pair generation must be an equi join on the basket key — the
    catalog-bounded inverted-index shape, never a cartesian scan of
    baskets."""
    st = _audit(spark, sf_dir, "category_basket_lift")
    # the only BNLJ is the deliberate 1-row totals broadcast into the
    # <=21-row pairs table (the formatted plan lists the node twice:
    # tree + operator detail, hence <= 2)
    assert st.n_bnl_joins <= 2


def test_psi_and_locf_stay_keyed(spark, sf_dir):
    for name in ("spend_drift_psi", "daily_revenue_locf"):
        st = _audit(spark, sf_dir, name)
        assert st.n_bnl_joins == 0, name


def test_attribution_single_user_window(spark, sf_dir):
    """purchase_attribution = one window shuffle on user_id + the rollup;
    no join at all."""
    st = _audit(spark, sf_dir, "purchase_attribution")
    assert st.n_sort_merge_joins == 0
    assert st.n_bnl_joins == 0


def test_merge_family_shares_one_exchange(spark, sf_dir):
    """Round-13 shape guard: the registered merge queries range-partition
    the union once, so the per-id window AND the final orderBy ride ONE
    exchange (the transactions build itself is all-broadcast)."""
    for name in ("changeset_merge", "merged_transactions_window"):
        st = _audit(spark, sf_dir, name)
        assert st.n_shuffle_exchanges == 1, f"{name}: {st.n_shuffle_exchanges}"
