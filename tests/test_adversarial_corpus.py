"""Adversarial-corpus parity: the documents-family queries must match the
DuckDB oracle on degenerate inputs the driver corpus never exercises.

Every doc in the test corpus is >= 10 ASCII words, which let two bug
classes hide: Spark 4's ANSI mode THROWS on out-of-range array indexing
(the 3-gram shingle and PMI bigram expressions crashed outright on docs
under 3 words), and byte-vs-character semantics only diverge on multi-byte
code points.  This corpus packs empty/whitespace/1-2-word docs, multi-byte
scripts, emoji, extreme repetition, a 5000-char token, and punctuation —
and requires exact Spark-vs-DuckDB row parity on a representative slice of
the text/dedup family.
"""

from __future__ import annotations

import shutil

import duckdb
import pandas as pd
import pytest

from basin_climbing_data_pipeline_spark import registry

TEXTS = [
    "",
    " ",
    "word",
    "two words",
    "a b c",
    "double  space   runs",
    " leading and trailing ",
    "tab\tand\nnewline tokens here",
    "héllo wörld ünïcode tökens düplicate düplicate",
    "日本語 テキスト の 単語 処理 確認 日本語 テキスト",
    "emoji 🎉 token 🎉 twice plus ascii words here",
    ("repeat " * 200).strip(),
    ("x" * 5000) + " short",
    ("the quick brown fox jumps over the lazy dog " * 50).strip(),
    "UPPER lower MiXeD case TOKENS tokens Tokens",
    "punct! mid,word. token's \"quoted\" (paren) semi;colon",
    "unique1 unique2 unique3 unique4 unique5 unique6 unique7 unique8 unique9 unique10",
    "1 2 3 4 5 numeric tokens 42 3.14 -7",
]

# the five that CRASHED before the ANSI index guards, plus one stats query
# per sub-family as a canary
QUERIES = [
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "decontamination",
    "pmi_collocations",
    "doc_stats",
    "sorted_neighborhood_pairs",
    "source_priority_dedup",
    "dsir_selection",        # bigram slice/zip + nested-ln gumbel on short docs
    "soft_dedup_weights",    # singleton coalesce + zero-token mass guard
    "bm25_topk",             # ln idf + length norm on empty/short/unicode docs
    "repeated_ngram_coverage",  # left-join NULL fraction on <3-word docs
    "gram_novelty_by_source",   # first-occurrence min over fuzzed doc_id order
    "stratified_sample_alloc",   # integer Hamilton seats on tiny strata
    "weighted_reservoir_sample", # ln(u)/w keys incl. zero-weight exclusion
    "bigram_interp_logprob",     # lag-chain bigrams on 1-token/empty docs
    "media_resize_features",     # empty-payload thumbnail (capstone catch)
    "linear_probe_quality",      # Cramer solve on a degenerate tiny corpus
    "lang_id_kappa",             # chance-corrected agreement incl. 'xx' labels
    "cluster_safe_split",        # cluster-hash split over degenerate dup graphs
    "quality_dup_lift",          # quality-bucket x dup-membership on extremes
    "probe_conformal_calibration",  # conformal q-hat on a degenerate tiny fit
    "eb_shrunk_source_quality",  # beta-binomial MoM on degenerate variance
    "feature_auc_screening",     # tie-heavy fixed-point ranks on empty/short docs
    "lang_id_macro_f1",          # zero-support languages -> F1 = 0, not NULL noise
    "readability_scores",        # zero-sentence/zero-word sources, multi-byte text
    "near_dup_threshold_sweep",  # empty grid rows when no pair survives a tau
    "cluster_size_distribution", # single-size spectra (slope NULL), unicode clusters
    "dedup_weight_ess",          # singleton-only sources (ESS == n exactly)
    "mixture_budget_curve",      # zero-token sources, saturation at tiny budgets
    "source_length_ks",          # single-doc sources, duplicate length vocab
    "format_marker_rates",       # regex battery on unicode/punct/empty docs
    "split_token_jsd",           # empty split halves, multi-byte tokens
    "heaps_law_fit",             # saturated/degenerate vocab growth (beta=0)
    "jackknife_source_mean",     # single-source corpora -> empty frame (LOO undefined)
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_corpus")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": ["en", "de", "ja", "xx"][i % 4],
            "source": ["web", "books", "code"][i % 3],
            "n_chars": len(t),
        }
        for i, t in enumerate(TEXTS)
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def _assert_oracle_parity(spark, fuzz_dir, name):
    fn, sql = registry.REGISTRY[name]
    got = sorted(
        tuple(str(v) for v in row)
        for row in (
            fn(spark, fuzz_dir)
            .select(*sorted(fn(spark, fuzz_dir).columns))
            .collect()
        )
    )
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    want = sorted(
        tuple(str(v) for _c, v in sorted(zip(cols, row))) for row in cur.fetchall()
    )
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle rows"


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_corpus_oracle_parity(spark, fuzz_dir, name):
    _assert_oracle_parity(spark, fuzz_dir, name)


# ---------------------------------------------------------------------------
# adversarial EVENTS corpus: timestamp ties, date boundaries, session-gap
# and 6h-window edges, half-cent values — unique event_id per the documented
# source invariant (build_checkins docstring)
# ---------------------------------------------------------------------------


def _adversarial_events_rows():
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    for i in range(5):  # five events at the IDENTICAL timestamp (tie-break)
        rows.append((1000 + i, base, 1,
                     ["view", "click", "purchase", "signup", "error"][i],
                     10.0 + i, '{"k": 1}'))
    mid = dt.datetime(2024, 1, 15, 0, 0, 0)  # exact-midnight date boundary
    rows += [(1100, mid, 2, "view", 5.0, '{"k": 2}'),
             (1101, mid - dt.timedelta(microseconds=1), 2, "click", 5.0, '{"k": 3}'),
             (1102, mid + dt.timedelta(microseconds=1), 2, "purchase", 5.0, '{"k": 4}')]
    t0 = dt.datetime(2024, 1, 20, 8, 0, 0)  # 1s-apart burst (session gaps)
    rows += [(1300 + i, t0 + dt.timedelta(seconds=i), 4, "view", 1.0, '{"k": 7}')
             for i in range(50)]
    t1 = dt.datetime(2024, 1, 22, 0, 0, 0)  # exactly-6h-apart (window edge)
    rows += [(1400 + i, t1 + dt.timedelta(hours=6 * i), 5, "click", 2.0, '{"k": 8}')
             for i in range(4)]
    rows += [(1500, dt.datetime(2024, 1, 23, 10, 0), 6, "purchase", 0.005, '{"k": 9}'),
             (1501, dt.datetime(2024, 1, 23, 11, 0), 6, "purchase", 999999.995, '{"k": 10}'),
             (1502, dt.datetime(2024, 1, 23, 12, 0), 6, "purchase", 0.0, '{"k": 11}')]
    return rows


def _write_events(dirpath, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], src.field("ts").type),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, f"{dirpath}/events.parquet")


@pytest.fixture(scope="module")
def fuzz_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_events")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem documents "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    _write_events(str(d), _adversarial_events_rows())
    return str(d)


EVENT_QUERIES = [
    "funnel_step_latency",     # hop-boundary latencies at exactly-1h gaps
    "overdispersion_check",    # burst days + single-day types (n=1 guard)
    "position_based_attribution",  # k=1/k=2 paths + window-boundary touches
    "activity_heatmap",        # peak ties broken by earliest hour
    "streaming_jsd_drift",     # type birth/death across window boundaries

    "event_funnel",            # crashed before the prev > 0 ANSI guard
    "streaming_windowed_counts",  # oracle lacked the event_id dedup
    "checkin_sessions",
    "purchase_attribution",
    "markov_transitions",
    "visit_streaks",
    "markov_holdout_accuracy",  # unseen-in-train states -> NULL prediction
    "streaming_weighted_sample",  # ln(u)/w on half-cent and zero values
    "join_key_skew_audit",        # tie-heavy key counts + rank tie-breaks
    "value_drift_psi",            # window-pair PSI on ties/zero/huge values
    "streaming_value_drift_psi",  # same via the watermarked stateful path
    "streaming_window_distinct_users",  # md5-HLL registers via stateful MAX
    "interevent_burstiness",      # zero gaps at identical-ts bursts + tie-break
    "markov_absorption_probs",    # Cramer inversion on degenerate tiny chains
    "sliding_distinct_users_hll", # register MAX-merge on boundary-tie windows
    "streaming_benford_drift",    # guarded_long vm: first digits past the clamp
    "regex_key_enrichment",       # no-match regexp_extract '' vs NULL (ANSI cast)
    "streaming_sessions_flush",   # ms-floored watermark/timeout boundary (< vs <=)
]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_oracle_parity(spark, fuzz_events_dir, name):
    _assert_oracle_parity(spark, fuzz_events_dir, name)


def random_event_rows(seed: int, n: int = 400) -> list[tuple]:
    """Seeded random events — the third randomized corpus axis (documents
    and the relational stack came first); shared by the fuzz fixture below
    and tools/capstone_corpus.py's --seed rotation.  Edge classes baked
    into the distribution:

    - tie clusters: 2-5 rows at the IDENTICAL microsecond timestamp
      (order-by-ts queries must tie-break deterministically);
    - exact midnights and 1-second session bursts and multi-hour ladders;
    - unknown/extreme user_ids alongside the stock 0-14 range;
    - novel/unicode/empty event types next to the known five;
    - values spanning half-cents, 8-decimal fractions, negatives, zeros,
      magnitudes past the micro() guard (raw-double pass-through), and —
      round 12 — NULLs (the guarded_long NULL-collapse corner pinned in
      tests/test_property_guarded_long.py, and both engines' agg/filter
      null-skip semantics);
    - props in the well-formed ``{"k": N}`` family plus spacing variants,
      k-less JSON (the regex-extract and get_json_object NULL paths), and
      — round 12 — NULL props — k stays numeric/absent because the
      engines' documented divergence trap (ANSI string→int throws where
      DuckDB NULLs) is designed-around, not exercised.

    event_ids are unique (the documented build_checkins input invariant).
    """
    import datetime as dt
    import random

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "signup", "error"]
    rare_types = ["VIEW", "view ", "naïve-type", "", "类型"]
    rows: list[tuple] = []
    eid = 10_000
    while len(rows) < n:
        shape = rng.choices(
            ("plain", "tie", "midnight", "burst", "ladder"),
            weights=(70, 10, 5, 10, 5),
        )[0]
        ts = base + dt.timedelta(
            days=rng.randint(0, 90),
            seconds=rng.randint(0, 86_399),
            microseconds=rng.randint(0, 999_999),
        )
        if shape == "midnight":
            ts = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        k = {"plain": 1, "midnight": 1, "tie": rng.randint(2, 5),
             "burst": rng.randint(5, 20), "ladder": rng.randint(3, 6)}[shape]
        for j in range(k):
            if shape == "burst":
                ts_j = ts + dt.timedelta(seconds=j)
            elif shape == "ladder":
                ts_j = ts + dt.timedelta(hours=6 * j)
            else:
                ts_j = ts  # tie/plain/midnight share the instant
            user = rng.choice(
                [rng.randint(0, 14)] * 8 + [rng.randint(15, 25), 10**9, -1]
            )
            etype = rng.choice(types * 6 + rare_types)
            value = rng.choice(
                [
                    round(rng.uniform(0, 500), 2),
                    rng.uniform(0, 1) * 10**-rng.randint(0, 8),
                    -round(rng.uniform(0, 100), 2),
                    0.0,
                    0.005,
                    999999.995,
                    5.0e12,      # past MICRO_GUARD_ABS: raw pass-through
                    8.9e15,
                    None,        # NULL value: agg/filter null-skip parity
                ]
            )
            props = rng.choice(
                ['{"k": %d}' % rng.randint(0, 2_000_000_000)] * 5
                + ['{"k":%d}' % rng.randint(0, 99), "{}", '{"x": 1}', None]
            )
            rows.append((eid, ts_j, user, etype, value, props))
            eid += 1
    rng.shuffle(rows)  # unsorted arrival order: order-insensitivity on disk
    return rows[:n]


@pytest.fixture(scope="module", params=[20260816, 11])
def fuzz_random_events_dir(tmp_path_factory, request):
    d = tmp_path_factory.mktemp(f"fuzz_random_events_{request.param}")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem documents "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    _write_events(str(d), random_event_rows(request.param))
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_random_events_oracle_parity(spark, fuzz_random_events_dir, name):
    _assert_oracle_parity(spark, fuzz_random_events_dir, name)


def test_streaming_dedup_matches_oracle_on_retransmission(spark, tmp_path):
    """At-least-once contract: a duplicate event_id carrying the IDENTICAL
    payload (a retransmission) is dropped by the stream's dropDuplicates
    and by the oracle's keep-one — n_events counts the event once."""
    import datetime as dt

    d = tmp_path
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem documents "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    ts = dt.datetime(2024, 1, 16, 12, 0)
    _write_events(str(d), [
        (1, ts, 3, "purchase", 100.0, '{"k": 5}'),
        (1, ts, 3, "purchase", 100.0, '{"k": 5}'),  # retransmission
        (2, ts, 3, "view", 1.0, '{"k": 5}'),
    ])
    fn, sql = registry.REGISTRY["streaming_windowed_counts"]
    got = {(r["event_type"], r["n_events"]) for r in fn(spark, str(d)).collect()}
    assert got == {("purchase", 1), ("view", 1)}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = {(t_, n) for _w, t_, n, _v in con.execute(sql).fetchall()}
    assert want == got


# ---------------------------------------------------------------------------
# adversarial TRANSACTIONS corpus: half-cent rounding ties, discount=1.0
# (gross 0), refunds with tax, a refunds-ONLY category-month (NULL
# refund_rate), duplicate transaction_ids with different amounts, year
# boundaries, referential violations (order without lines / line without
# order), 1e9-scale amounts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_txn_dir(tmp_path_factory):
    import datetime as dt

    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_txn")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part documents embeddings "
              "events").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    con = _dd.connect()
    pk = [r[0] for r in con.execute(
        f"SELECT p_partkey FROM read_parquet('{src}/part.parquet') LIMIT 6").fetchall()]
    ck = [r[0] for r in con.execute(
        f"SELECT c_custkey FROM read_parquet('{src}/customer.parquet') LIMIT 6").fetchall()]
    li_schema = pq.read_schema(f"{src}/lineitem.parquet")
    o_schema = pq.read_schema(f"{src}/orders.parquet")
    orders, li = [], []

    def order(okey, cust, status, date):
        orders.append((okey, cust, status, 100.0,
                       dt.datetime.combine(date, dt.time()), "3-MEDIUM"))

    def line(okey, part, ln, qty, price, disc, tax, rf):
        li.append((okey, part, 1, ln, float(qty), float(price), float(disc),
                   float(tax), rf, "O",
                   dt.datetime.combine(dt.date(2001, 6, 15), dt.time())))

    d0 = dt.date(2001, 6, 10)
    order(9001, ck[0], "O", d0)
    line(9001, pk[0], 1, 1, 100.01, 0.5, 0.0, "N")        # gross 50.005 tie
    line(9001, pk[1], 2, 1, 0.01, 0.0, 0.08, "N")
    line(9001, pk[2], 3, 1, 999999999.99, 0.0, 0.0, "N")
    order(9002, ck[1], "F", d0)
    line(9002, pk[0], 1, 2, 150.0, 1.0, 0.05, "N")        # discount 1.0
    line(9002, pk[1], 2, 1, 200.0, 0.0, 0.08, "R")        # refund w/ tax
    order(9003, ck[2], "P", dt.date(2001, 7, 2))
    line(9003, pk[3], 1, 1, 300.0, 0.0, 0.0, "N")         # dup txn id...
    line(9003, pk[3], 1, 1, 400.0, 0.0, 0.0, "N")         # ...diff amount
    order(9004, ck[3], "O", dt.date(2000, 12, 31))
    line(9004, pk[4], 1, 1, 50.0, 0.1, 0.02, "N")
    order(9005, ck[3], "O", dt.date(2001, 1, 1))
    line(9005, pk[4], 1, 1, 50.0, 0.1, 0.02, "N")
    order(9006, ck[4], "O", d0)                           # order, no lines
    line(9999, pk[5], 1, 1, 75.0, 0.0, 0.0, "N")          # line, no order
    order(9007, ck[5], "O", dt.date(1999, 3, 10))
    line(9007, pk[5], 1, 1, 500.0, 0.0, 0.04, "R")        # refunds-only month

    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in li], f.type)
                  for i, f in enumerate(li_schema)}),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in orders], f.type)
                  for i, f in enumerate(o_schema)}),
        f"{d}/orders.parquet",
    )
    return str(d)


TXN_QUERIES = [
    "refund_metrics_long",   # oracle dropped NULL cells before INCLUDE NULLS
    "refund_metrics_by_category",  # refund_rate NULL for refunds-only category
    "transactions_build",
    "dedup_transactions",
    "merged_transactions_window",
    "revenue_by_month_category",
    "daily_revenue_locf",
    "ewma_daily_revenue",    # dyadic lag-chain over a fuzzed sparse calendar
    "cusum_revenue_drift",   # negative-total baseline clamp + window identity
    "woe_iv_by_feature",     # Laplace WOE on fuzzed conversion labels
    "theilsen_revenue_trend", # pairwise-slope median on edge-value days
    "theilsen_trend_bucketed",   # range-partitioned rank == exact on edge days
    "mann_whitney_spend_utest",  # tie blocks + negative cents in the rank frame
    "bh_fdr_category_tests",     # z-degenerate categories excluded pre-rank
    "trimmed_winsorized_spend",  # k=0 tiny-n trim + boundary-tie overlap math
    "weekday_seasonality",       # one-day categories: SST=0 strength NULL
    "column_profile_audit",      # dup txn ids, extreme values in the profile
    "cuped_variance_reduction",  # overflow-guarded micro on edge-value moments
    "gini_spend_concentration",  # rank-sum identity under heavy value ties
    "spearman_visit_spend",      # double-tied ranks incl. all-zero visits
    "chisq_category_source",     # absent contingency cells contribute E
    "benford_amount_audit",      # string first digit on 1e9-scale amounts
    "holt_linear_daily_revenue", # decimal tap products on 1e11-cent days
    "refund_test_power_mde",     # refunds-only / no-refund degenerate rates
    # round-9 wave
    "daily_revenue_acf",         # n-scaled centered products on edge-cent days
    "seasonal_decomposition_daily",  # MA/seasonal NULLs on the sparse fuzz calendar
    "revenue_changepoint",       # |ncusum| argmax ties broken by earliest day
    "page_hinkley_revenue_drift",    # micro terms at edge-cent magnitudes
    "rfm_segments",              # rank-quantiles under heavy value ties
    "tukey_category_outliers",   # nearest-rank quartiles on tiny categories
    "cochran_armitage_trend",    # degenerate margins (refunds-only priorities)
    "sequential_probe_obf",      # single-date timelines collapse to one look
    "revenue_pareto_shares",     # negative-total corpora, tie-straddling cuts
    "ltv_triangle",              # negative-cent cohorts, single-month cohorts
    "jsd_source_categories",     # absent-cell Q·ln2 mass on sparse grids
    "hll_source_overlap",        # register merge on tiny/degenerate sources
    "capture_recapture_population",  # zero-overlap Chapman (+1 correction path)
    "anova_spend_by_segment",    # tiny-n groups: n==k / SSW=0 guard paths
    "kruskal_wallis_spend",      # all-tied rank frames: C<=0 tie-correction guard
    "welch_ttest_spend",         # one-sided/empty arms, zero-variance guard paths
    "grubbs_spend_outlier",      # n<=2 and constant-spend var=0 guards
    "levene_brown_forsythe",     # per-segment medians on tie-heavy tiny groups
    "permutation_test_spend",    # exact boundary |d_b| == |d_obs| counts extreme
    "jarque_bera_daily_revenue", # edge-cent z ordered-sum moments, m2=0 guard
    "durbin_watson_revenue",     # degenerate 1-day calendars (D=0), zero residuals
    "runs_test_revenue",         # all-above/all-below median: sigma^2=0 guard
    # round-10 wave
    "wilcoxon_signed_rank_spend",  # zero-diff discard + |d| tie blocks on edges
    "cvm_spend_test",            # squared-ECDF-gap decimal products at edge cents
    "segment_spend_quantiles",   # nearest-rank interval cover on tie-heavy values
]


@pytest.mark.parametrize("name", TXN_QUERIES)
def test_adversarial_transactions_oracle_parity(spark, fuzz_txn_dir, name):
    _assert_oracle_parity(spark, fuzz_txn_dir, name)


# ---------------------------------------------------------------------------
# adversarial EMBEDDINGS corpus: identical vectors (exact cosine ties),
# the antipodal vector (cosine -1), one-hot axis vectors (exact-zero
# hyperplane dot products -> LSH sign-of-zero), tiny-but-valid norms, a
# negative-heavy vector — all nonzero per the documented module invariant
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_emb_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_emb")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "documents").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    DIM = 64
    rng = np.random.RandomState(7)
    vecs, labels = [], []

    def add(v, lab):
        vecs.append(np.asarray(v, dtype=np.float32))
        labels.append(lab)

    base = rng.randn(DIM).astype(np.float32)
    base /= np.linalg.norm(base)
    for _ in range(3):
        add(base.copy(), 1)          # identical: exact top-k ties
    add(-base, 2)                    # antipodal
    for dim in range(6):
        e = np.zeros(DIM, dtype=np.float32)
        e[dim] = 1.0
        add(e, 3)                    # one-hot: zero dots vs hyperplanes
    for _ in range(4):
        v = base + rng.randn(DIM).astype(np.float32) * 1e-4
        add(v / np.linalg.norm(v), 4)  # near-identical (banding)
    add(np.full(DIM, 0.01, dtype=np.float32), 5)  # tiny-but-valid norm
    add(-np.abs(rng.randn(DIM)).astype(np.float32) / 8.0, 6)
    while len(vecs) < 40:
        v = rng.randn(DIM).astype(np.float32)
        add(v / np.linalg.norm(v), 7)
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    return str(d)


EMB_QUERIES = [
    "cosine_topk",           # exact ties broken by corpus_id on both engines
    "lsh_buckets",           # sign-of-zero dot products
    "embedding_near_dup_pairs",
    "kmeans_refine",
    "quantized_topk_recall",
    "ann_ndcg_eval",         # rank-aware: gains are python-int literals
    "mmr_diversified_topk",  # greedy chain must survive exact-tie pools
    "embedding_centroid_drift",  # floored centroid division + zero-norm guard
    "ivf_probe_recall_sweep",    # cell-assignment ties + empty-candidate spine
    "pq_codebook_eval",          # subvector argmin ties at envelope magnitudes
    "embedding_dispersion_by_label",  # centroid identity on identical/antipodal vecs
    "hybrid_rrf_retrieval",      # RRF over exact-tie cosine + degenerate lexical ranks
    "semantic_decontamination",  # exact-tie cosines, antipodal/one-hot probes
    "embedding_norm_audit",      # tiny-norm/antipodal vectors, sd=0 labels
    "retrieval_rank_agreement",  # exact-tie pools in both rankers
]


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_oracle_parity(spark, fuzz_emb_dir, name):
    _assert_oracle_parity(spark, fuzz_emb_dir, name)


# ---------------------------------------------------------------------------
# adversarial PART-NAME corpus: transfer-grammar lookalikes ("x from y
# (N remaining)" with a 1e12 N), pathological 'from' repetition, regex
# metacharacters inside keyword strings, case variants, unicode, and
# empty/whitespace names — the description-derived grammar + keyword-
# categorization surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_part_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_part")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier orders lineitem events "
              "documents embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(f"{src}/part.parquet")
    df = tbl.to_pandas()
    adv = [
        "day pass from C42 (3 remaining)",
        "membership from C7",
        "from from from",
        "punch [card] (regex) .* chars+",
        "DAY PASS uppercase variant",
        "öffnung ünïcode pass",
        "",
        "   ",
        "day membership pass punch",
        "a from b (999999999999 remaining)",
    ]
    for i, name in enumerate(adv):
        df.loc[i % len(df), "p_name"] = name
    pq.write_table(
        pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False),
        f"{d}/part.parquet",
    )
    return str(d)


PART_QUERIES = [
    "pass_transfer_name_links",  # the grammar parse itself
    "transactions_build",        # keyword categorization
    "expense_categories",        # exact-match map on adversarial keys
    "day_pass_counts_by_month",
]


@pytest.mark.parametrize("name", PART_QUERIES)
def test_adversarial_part_names_oracle_parity(spark, fuzz_part_dir, name):
    _assert_oracle_parity(spark, fuzz_part_dir, name)


# ---------------------------------------------------------------------------
# adversarial MEMBERSHIP-INTERVAL corpus: orders placed so derived
# intervals touch the point-in-period date exactly (start == P, end == P,
# end == P-1, start == P+1), overlap on one owner, and span P with END
# status — the J6/J7 interval-join boundary semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_mem_dir(tmp_path_factory):
    import datetime as dt

    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basin_climbing_data_pipeline_spark.operators.memberships import POINT_DATE

    d = tmp_path_factory.mktemp("fuzz_mem")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part lineitem events documents "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    con = _dd.connect()
    ck = [r[0] for r in con.execute(
        f"SELECT c_custkey FROM read_parquet('{src}/customer.parquet') LIMIT 8"
    ).fetchall()]
    o_schema = pq.read_schema(f"{src}/orders.parquet")
    P = dt.date.fromisoformat(POINT_DATE)
    rows = []

    def order(okey, cust, status, date, prio):
        rows.append((okey, cust, status, 120.0,
                     dt.datetime.combine(date, dt.time()), prio))

    order(8001, ck[0], "O", P, "1-URGENT")                          # start == P
    order(8002, ck[1], "O", P - dt.timedelta(days=14), "1-URGENT")  # end == P
    order(8003, ck[2], "O", P - dt.timedelta(days=15), "1-URGENT")  # end == P-1
    order(8004, ck[3], "O", P + dt.timedelta(days=1), "1-URGENT")   # start == P+1
    order(8005, ck[4], "O", P - dt.timedelta(days=5), "5-LOW")      # overlap...
    order(8006, ck[4], "O", P - dt.timedelta(days=2), "2-HIGH")     # ...same owner
    order(8007, ck[5], "F", P - dt.timedelta(days=10), "5-LOW")     # spans P, END
    order(8008, ck[6], "O", dt.date(2024, 1, 5), "3-MEDIUM")
    order(8009, ck[7], "P", dt.date(2024, 1, 20), "2-HIGH")
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in rows], f.type)
                  for i, f in enumerate(o_schema)}),
        f"{d}/orders.parquet",
    )
    return str(d)


MEM_QUERIES = [
    "active_memberships_on_date",   # the boundary-inclusive point query
    "membership_conversion_asof",   # J6 as-of
    "checkins_membership_coverage", # J7 point-in-period
    "membership_flow",
    "membership_survival_km",       # KM risk sets on fuzzed duration ties
    "survival_logrank_by_frequency",  # log-rank terms on fuzzed risk sets
    "membership_attrition_monthly",   # contribution-union on fuzzed lifecycles
    "active_memberships_new_vs_existing",  # month explode on fuzzed spans
    "nelson_aalen_hazard",          # hazard terms on fuzzed risk-set ties
    "km_greenwood_ci",              # extinction pinning + band clamps
    "rmst_membership",              # horizon clamps on fuzzed duration grids
]


@pytest.mark.parametrize("name", MEM_QUERIES)
def test_adversarial_membership_intervals_oracle_parity(spark, fuzz_mem_dir, name):
    _assert_oracle_parity(spark, fuzz_mem_dir, name)


# ---------------------------------------------------------------------------
# seeded RANDOM-UNICODE corpus: words sampled across ascii, latin-1
# supplement, greek, CJK, the emoji plane, and punctuation — the widest
# net; this layer is what exposed the lower() special-casing divergence
# (Spark's context-sensitive Final_Sigma vs DuckDB's simple map) that
# motivated fold_norm
# ---------------------------------------------------------------------------


def random_unicode_doc_rows(seed: int, n_docs: int = 40) -> list[dict]:
    """Seeded random-unicode documents — shared by the fuzz_random_dir
    parametrization below and tools/capstone_corpus.py's --seed rotation
    (one generator, so a new divergence-hunting seed exercises the SAME
    distribution both harnesses were built against)."""
    import random

    rng = random.Random(seed)

    def rand_word():
        pools = [
            lambda: chr(rng.randint(0x61, 0x7A)),
            lambda: chr(rng.randint(0x41, 0x5A)),
            lambda: chr(rng.randint(0xC0, 0x17F)),       # latin ext-A (İ etc.)
            lambda: chr(rng.randint(0x370, 0x3FF)),      # greek incl. Σ
            lambda: chr(rng.randint(0x400, 0x4FF)),      # cyrillic
            lambda: chr(rng.randint(0x4E00, 0x4FFF)),
            lambda: chr(rng.randint(0x1F300, 0x1F5FF)),
            lambda: rng.choice("0123456789.,!?'\"()[]{}*+-/\\|@#$%^&_=~`<>;:"),
            # general punctuation incl. unicode SPACES (U+2000-U+200A) — the
            # pool that exposed one-arg trim()'s engine divergence
            lambda: chr(rng.randint(0x2000, 0x206F)),
        ]
        picks = rng.choices(pools, weights=[40, 10, 10, 6, 6, 6, 4, 12, 6],
                            k=rng.randint(1, 12))
        return "".join(f() for f in picks)

    texts = [" ".join(rand_word() for _ in range(rng.randint(1, 60)))
             for _ in range(n_docs)]
    return [{"doc_id": i, "text": t, "lang": ["en", "de", "ja", "xx"][i % 4],
             "source": ["web", "books", "code"][i % 3], "n_chars": len(t)}
            for i, t in enumerate(texts)]


@pytest.fixture(scope="module", params=[20260814, 7, 99])
def fuzz_random_dir(tmp_path_factory, request):
    d = tmp_path_factory.mktemp(f"fuzz_random_{request.param}")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    pd.DataFrame(random_unicode_doc_rows(request.param)).to_parquet(
        d / "documents.parquet"
    )
    return str(d)


RANDOM_QUERIES = [
    "doc_fingerprints",  # diverged before fold_norm (Final_Sigma)
    "exact_dedup",       # same normalization, as the dedup KEY
    "doc_stats",         # diverged before ascii-space-pinned oracle trim
    "minhash_signatures",
    "pii_scrub",
    "zipf_slope",        # overflowed int64 moments before DECIMAL(38,0)
    "media_features",    # oracle summed code points, not payload bytes
    "media_resize_features",
    "source_priority_dedup",  # unknown sources -> default tier, ties on doc_id
    "dsir_selection",         # md5-bucketed multi-byte features, micro-ln model
    "soft_dedup_weights",     # cluster sizes over the unicode near-dup graph
]


@pytest.mark.parametrize("name", RANDOM_QUERIES)
def test_random_unicode_oracle_parity(spark, fuzz_random_dir, name):
    _assert_oracle_parity(spark, fuzz_random_dir, name)


def test_fold_norm_pins_special_casing(spark):
    """fold_norm must agree across engines exactly on the two known
    special-casing divergence points — word-final Σ and İ."""
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.functions.text import (
        FOLD_NORM_SQL,
        fold_norm,
    )

    cases = ["ΣΣΣ τέλοΣ", "ΑΣ", "İstanbul", "İ", "plain ASCII Text"]
    sdf = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {r["t"]: r["f"] for r in sdf.select("t", fold_norm(F.col("t")).alias("f")).collect()}
    con = duckdb.connect()
    for c in cases:
        want = con.execute(
            f"SELECT {FOLD_NORM_SQL.format(c='?')}", [c]
        ).fetchone()[0]
        assert got[c] == want, (c, got[c], want)
    # the sigma fold lands on Python's casefold for Greek
    assert got["ΣΣΣ τέλοΣ"] == "ΣΣΣ τέλοΣ".casefold()


# ---------------------------------------------------------------------------
# seeded RANDOM-RELATIONAL corpus: random orders/lineitems (prices with up
# to 8 decimal places — the money-rounding stress — random discounts/taxes/
# flags/dates, orders without lines) and randomized part names mixing
# category keywords, grammar tokens, and unicode — the whole relational
# stack under randomization
# ---------------------------------------------------------------------------


def write_random_relational(d, seed: int = 9090) -> None:
    """Seeded random orders/lineitem/part layer — shared by the fuzz_rel_dir
    fixture and tools/capstone_corpus.py's --seed rotation: prices with up
    to 8 decimal places (money-rounding stress), random discounts/taxes/
    flags/dates, orders without lines, randomized part names mixing
    category keywords, grammar tokens, and unicode.  Writes into ``d``,
    which must already hold the non-randomized tables."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    rng = random.Random(seed)
    import duckdb as _dd

    ck = [r[0] for r in _dd.connect().execute(
        f"SELECT c_custkey FROM read_parquet('{src}/customer.parquet')").fetchall()]
    p_schema = pq.read_schema(f"{src}/part.parquet")
    part = pq.read_table(f"{src}/part.parquet").to_pandas()
    words = ["day", "pass", "membership", "punch", "card", "retail", "fitness",
             "camp", "birthday", "party", "from", "remaining", "widget",
             "ünït", "ΣALE", "товар", "(x)", "a.b"]
    part["p_name"] = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 5)))
        for _ in range(len(part))
    ]
    pq.write_table(
        pa.Table.from_pandas(part, schema=p_schema, preserve_index=False),
        f"{d}/part.parquet",
    )
    pk = list(part["p_partkey"])
    o_schema = pq.read_schema(f"{src}/orders.parquet")
    li_schema = pq.read_schema(f"{src}/lineitem.parquet")
    orders, li = [], []
    base = dt.date(1995, 1, 1)
    for okey in range(1500):
        d0 = base + dt.timedelta(days=rng.randint(0, 2500))
        orders.append((okey, rng.choice(ck), rng.choice(["O", "F", "P"]),
                       round(rng.uniform(1, 1e5), rng.randint(0, 6)),
                       dt.datetime.combine(d0, dt.time()),
                       rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                   "4-NOT SPECIFIED", "5-LOW"])))
        for ln in range(rng.randint(0, 4)):
            li.append((okey, rng.choice(pk), 1, ln + 1,
                       float(rng.randint(1, 50)),
                       round(rng.uniform(0.01, 2e5), rng.randint(0, 8)),
                       round(rng.uniform(0, 0.99), rng.randint(0, 4)),
                       round(rng.uniform(0, 0.1), rng.randint(0, 4)),
                       rng.choice(["N", "A", "R"]), rng.choice(["O", "F"]),
                       dt.datetime.combine(
                           d0 + dt.timedelta(days=rng.randint(0, 90)), dt.time())))
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in orders], f.type)
                  for i, f in enumerate(o_schema)}), f"{d}/orders.parquet")
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in li], f.type)
                  for i, f in enumerate(li_schema)}), f"{d}/lineitem.parquet")


@pytest.fixture(scope="module")
def fuzz_rel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_rel")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier documents embeddings "
              "events").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    write_random_relational(d)
    return str(d)


REL_QUERIES = [
    "transactions_build",       # money rounding on 8-decimal prices
    "dedup_transactions",
    "merged_transactions_window",
    "customer_master",
    "membership_conversion_asof",
    "cogroup_spend_at_checkin",  # the Pandas cogroup vs the SQL range join
    "pass_transfer_name_links",  # grammar over randomized descriptions
    "membership_scd2",           # SCD2 islands over randomized lifecycles
    "data_questions",            # queue rules over randomized memberships
    "bootstrap_spend_ci",        # md5 replicate weights over random amounts
    # round-9 inference battery under full relational randomization
    "welch_ttest_spend",         # 8-decimal money rounding into exact moments
    "grubbs_spend_outlier",      # random heavy tails through the single-pass max
    "levene_brown_forsythe",     # randomized per-segment medians + |dev| ANOVA
    "permutation_test_spend",    # hash arms over random spends, exact boundary
    "jarque_bera_daily_revenue", # sparse random calendar ordered-sum moments
    "durbin_watson_revenue",     # random-walk residuals on the fuzzed calendar
    "runs_test_revenue",         # random sign interleavings around the median
    # round-10 wave
    "wilcoxon_signed_rank_spend",  # random 8-decimal paired sums around the split
    "cvm_spend_test",            # random spends through the exact ECDF-gap sum
    "segment_spend_quantiles",   # random per-segment vocabularies, quantile picks
]


@pytest.mark.parametrize("name", REL_QUERIES)
def test_random_relational_oracle_parity(spark, fuzz_rel_dir, name):
    _assert_oracle_parity(spark, fuzz_rel_dir, name)


# ---------------------------------------------------------------------------
# degenerate regression fits: zipf_slope's denominator k·Σx² − (Σx)² is
# exactly 0 when the ranked head holds ONE distinct token (k=1 → x=ln(1)=0)
# — ANSI Spark and DuckDB disagree on 0/0 unless both sides guard, so the
# guarded fit must report NULL slope/intercept on both engines.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def single_token_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zipf_degenerate")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        {"doc_id": i, "text": "same same same", "lang": "en", "source": "web",
         "n_chars": 14}
        for i in range(4)
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_zipf_slope_single_distinct_token_is_null_on_both_engines(
    spark, single_token_dir
):
    _assert_oracle_parity(spark, single_token_dir, "zipf_slope")
    row = registry.REGISTRY["zipf_slope"][0](spark, single_token_dir).collect()[0]
    assert row["n_tokens"] == 1
    assert row["zipf_slope"] is None and row["ln_intercept"] is None


def test_linear_probe_degenerate_fit_is_null_on_both_engines(
    spark, single_token_dir
):
    """Identical documents → zero feature variance → singular normal
    equations (det_a = 0).  Without the explicit guard Spark emits
    Inf/NaN doubles where DuckDB emits NULL; both must pin to NULL."""
    _assert_oracle_parity(spark, single_token_dir, "linear_probe_quality")
    row = registry.REGISTRY["linear_probe_quality"][0](
        spark, single_token_dir
    ).collect()[0]
    assert row["w_stopword"] is None
    assert row["r_squared"] is None
    assert row["max_coef_deviation"] is None


@pytest.fixture(scope="module")
def single_customer_txn_dir(tmp_path_factory):
    """One customer, one transaction: with Poisson(1) replicate weights,
    ~37% of bootstrap replicates draw weight 0 → sw = 0 → NULL replicate
    mean.  Exercises the NULL-ordering divergence (Spark sorts NULLs
    first ASC, DuckDB last) that the pre-rank filter pins."""
    import datetime as dt

    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("single_cust_txn")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part documents embeddings "
              "events").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    con = _dd.connect()
    pk = con.execute(
        f"SELECT p_partkey FROM read_parquet('{src}/part.parquet') LIMIT 1"
    ).fetchone()[0]
    ck = con.execute(
        f"SELECT c_custkey FROM read_parquet('{src}/customer.parquet') LIMIT 1"
    ).fetchone()[0]
    li_schema = pq.read_schema(f"{src}/lineitem.parquet")
    o_schema = pq.read_schema(f"{src}/orders.parquet")
    orders = [(9001, ck, "O", 100.0,
               dt.datetime.combine(dt.date(2001, 6, 10), dt.time()), "3-MEDIUM")]
    li = [(9001, pk, 1, 1, 1.0, 123.45, 0.0, 0.0, "N", "O",
           dt.datetime.combine(dt.date(2001, 6, 15), dt.time()))]
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in li], f.type)
                  for i, f in enumerate(li_schema)}),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table({f.name: pa.array([r[i] for r in orders], f.type)
                  for i, f in enumerate(o_schema)}),
        f"{d}/orders.parquet",
    )
    return str(d), ck


def test_bootstrap_ci_zero_mass_replicates_agree_cross_engine(
    spark, single_customer_txn_dir
):
    import hashlib

    from basin_climbing_data_pipeline_spark.operators.experiments import (
        B_REPLICATES,
        POISSON1_CDF_MICRO,
    )

    d, ck = single_customer_txn_dir
    zero_reps = [
        b
        for b in range(B_REPLICATES)
        if int(hashlib.md5(f"{ck}:{b}".encode()).hexdigest()[:8], 16) % 1_000_000
        < POISSON1_CDF_MICRO[0]
    ]
    assert zero_reps, "fixture must reach the zero-mass (sw=0) replicate edge"
    _assert_oracle_parity(spark, d, "bootstrap_spend_ci")


@pytest.fixture(scope="module")
def weight_sweep_dir(tmp_path_factory):
    """Documents whose weights (n_chars) sweep 13 decades, with ≥60 docs
    at w = 10^12 so the nano fixed point PROVABLY collides inside the
    top-K (ln(u)/1e12 · 1e9 rounds to 0) — the reservoir must fall to the
    doc_id tie-break identically in both engines."""
    import random

    d = tmp_path_factory.mktemp("weight_sweep")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rng = random.Random(20260815)
    rows = []
    doc_id = 0
    for decade in range(13):           # 10^0 .. 10^12
        for _ in range(10):
            w = 10**decade + (rng.randrange(10**decade) if decade else 0)
            rows.append({"doc_id": doc_id, "text": "w" * min(w, 40),
                         "lang": "en", "source": "web", "n_chars": w})
            doc_id += 1
    for _ in range(60):                # exact-collision block
        rows.append({"doc_id": doc_id, "text": "x", "lang": "en",
                     "source": "web", "n_chars": 10**12})
        doc_id += 1
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_weighted_reservoir_rank_order_agrees_across_12_orders(
    spark, weight_sweep_dir
):
    import hashlib
    import math

    from basin_climbing_data_pipeline_spark.operators.sampling import RESERVOIR_K

    _assert_oracle_parity(spark, weight_sweep_dir, "weighted_reservoir_sample")
    # prove the corpus actually exercises the collision regime: the top-K
    # must contain tied key_nano values (huge weights collapsing to 0)
    rows = registry.REGISTRY["weighted_reservoir_sample"][0](
        spark, weight_sweep_dir
    ).collect()
    assert len(rows) == RESERVOIR_K
    keys = [round(r["sel_key"] * 1e9) for r in rows]
    assert len(set(keys)) < len(keys), "no key collisions — corpus too tame"
    # ranks must equal the independent libm computation (key DESC, doc_id)
    def py_key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return math.floor(math.log(u) / w * 1e9 + 0.5)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{weight_sweep_dir}/documents.parquet").to_pylist()
    want = sorted(
        ((py_key(r["doc_id"], r["n_chars"]), r["doc_id"]) for r in t),
        key=lambda kv: (-kv[0], kv[1]),
    )[:RESERVOIR_K]
    got = [(round(r["sel_key"] * 1e9), r["doc_id"]) for r in rows]
    assert got == want


# ---------------------------------------------------------------------------
# adversarial CUSTOMER corpus: random sparse custkeys up to 1e12 stress every
# %-derived synthetic contact field (k%2/4/5/7/13/40 branches, lpad widths,
# parent pointers to absent keys) and the linkage blocker's rank windows
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_cust_dir(tmp_path_factory):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_cust")
    src = "/root/testdata/sf0.001"
    for t in ("region nation supplier part orders lineitem events documents "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rng = random.Random(7171)
    schema = pq.read_schema(f"{src}/customer.parquet")
    nk = [r[0] for r in duckdb.connect().execute(
        f"SELECT n_nationkey FROM read_parquet('{src}/nation.parquet')").fetchall()]
    keys = sorted({rng.randrange(0, 10**12) for _ in range(200)} | {0, 1, 7, 13, 91})
    rows = {
        "c_custkey": keys,
        "c_name": [f"Customer#{k}" for k in keys],
        "c_nationkey": [rng.choice(nk) for _ in keys],
        "c_acctbal": [round(rng.uniform(-999.99, 9999.99), 2) for _ in keys],
        "c_mktsegment": [rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY",
                                     "HOUSEHOLD", "FURNITURE"]) for _ in keys],
    }
    pq.write_table(
        pa.table({f.name: pa.array(rows[f.name], f.type) for f in schema}),
        f"{d}/customer.parquet",
    )
    return str(d)


CUST_QUERIES = [
    "customers_build",          # every %-derived branch at sparse huge keys
    "identifiers_build",
    "duplicate_emails",
    "fuzzy_email_matches",      # sorted-neighborhood at fuzzed rank layout
    "record_linkage_patterns",  # F-S weights + pattern table on fuzzed blocks
    "woe_iv_by_feature",        # per-category counts at sparse huge keys
    "linkage_em_step",          # EM responsibilities on fuzzed pattern tables
]


@pytest.mark.parametrize("name", CUST_QUERIES)
def test_adversarial_customer_oracle_parity(spark, fuzz_cust_dir, name):
    _assert_oracle_parity(spark, fuzz_cust_dir, name)


# ---------------------------------------------------------------------------
# ROUND-8 BUG-CLASS → STANDING-GENERATOR MAP (judge order r8 #6)
#
# Every cross-engine bug class found since round 5 has a generator that all
# FUTURE operators meet by default — not just a single regression pin:
#
#   class 1  ANSI throws (index/div0/overflow) .. every parity test in this
#            file runs the engine session with spark.sql.ansi.enabled=true
#            (Spark 4 default, asserted below) over degenerate corpora
#   class 2  lower() Final_Sigma/İ ............. TEXTS multi-script docs +
#            fold_norm contract tests (test_text_functions.py)
#   class 3  trim unicode-vs-ascii ............. TEXTS whitespace docs
#   class 4  UNPIVOT NULL cells ................ fuzz_txn_dir refunds-only /
#            absent-cell months (refund_metrics_long)
#   class 5  byte-vs-codepoint ................. TEXTS multi-byte scripts
#   class 8  DuckDB DECIMAL list literals ...... test_no_bare_decimal_list_
#            literals_in_oracles below lints EVERY registered oracle
#   class 9  ANSI projection-below-join-filter . the pair/rank queries in
#            TXN_QUERIES (theilsen_*, mann_whitney, gini, ks) run on the
#            tie-heavy txn corpus under ANSI — an unguarded "join-condition-
#            guaranteed" division throws DIVIDE_BY_ZERO here, it cannot pass
#   class 10 floor(double)→LONG micro clamp .... fuzz_txn_dir's 999999999.99
#            amounts push variance-class stats past the 1e12 micro guard;
#            tests/test_property_money.py pins the primitive itself at
#            ±1e18/subnormal/NaN against pure python on BOTH engines
# ---------------------------------------------------------------------------


def test_parity_sessions_run_under_ansi(spark):
    """Class-9 standing coverage depends on this: every adversarial parity
    test above executes under ANSI mode, so an expression that Catalyst
    hoists below a join filter (the projection-fusion class) throws instead
    of silently evaluating — if this default ever flips, the class loses
    its generator and needs an explicit ANSI session here."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_no_bare_decimal_list_literals_in_oracles():
    """Class-8 generator: DuckDB infers DECIMAL for bare fractional list
    literals, and list_extract then yields Decimal('0.096910') whose string
    form carries trailing zeros — a value-hash mismatch against Spark
    doubles.  Every fractional list literal in EVERY registered oracle must
    be cast: either `[...]::double[]` on the list or `::double` per
    element.  New operators meet this by default or fail here."""
    import re

    from basin_climbing_data_pipeline_spark.registry import oracle_sql

    offenders = []
    for name, sql in oracle_sql().items():
        for m in re.finditer(r"\[\s*-?\d+\.\d+[^\]\[]*\]", sql):
            literal = m.group(0)
            tail = sql[m.end() : m.end() + 16].lstrip()
            if "::double" in literal.lower():
                continue  # per-element casts
            if tail.lower().startswith("::double[]"):
                continue  # whole-list cast
            offenders.append(f"{name}: {literal[:60]}")
    assert not offenders, (
        "bare DECIMAL list literal(s) in oracle SQL — cast ::double[] "
        f"(round-8 bug class 8): {offenders}"
    )


def test_no_ulp_lossy_fractional_literals_in_oracles():
    """Class-11 generator (round-9 find, via the money property tests):
    DuckDB parses a fractional SQL literal as DECIMAL first, and once the
    scaled integer passes 2^53 the decimal→double conversion can land one
    ULP away from the Python double whose repr produced the literal
    (found live: record_linkage_patterns interpolated {1.0 - FS_M} =
    0.050000000000000044).  Nano/micro grids absorb a ULP almost always —
    until a value lands on a grid boundary, which is exactly the silent
    cross-engine divergence this repo hunts.  Rule: never interpolate a
    COMPUTED double into oracle SQL; interpolate the defining constants
    and let the oracle engine repeat the arithmetic ((1.0 - 0.95), not
    0.050000000000000044).  Any fractional literal with ≥ 17 significant
    digits fails here."""
    import re

    from basin_climbing_data_pipeline_spark.registry import oracle_sql

    offenders = []
    for name, sql in oracle_sql().items():
        for m in re.finditer(r"\d+\.\d+", sql):
            digits = m.group(0).replace(".", "").lstrip("0")
            if len(digits) >= 17:
                offenders.append(f"{name}: {m.group(0)}")
    assert not offenders, (
        "ULP-lossy fractional literal(s) in oracle SQL — interpolate the "
        f"defining constants, not computed doubles: {offenders}"
    )
