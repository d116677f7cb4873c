"""Property-based checks for the round-6-continuation operator math.

These run the ORACLE-side SQL in DuckDB over hypothesis-generated inputs
(milliseconds per example — no Spark session per case) and verify the
defining mathematical properties.  The Spark side is pinned to the same
SQL by the bitwise oracle harness, so a property proven here + a
bitwise-green registry row covers both engines.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from basin_climbing_data_pipeline_spark.operators.sampling import STRAT_BUDGET_DIV


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=25)
)
def test_hamilton_allocation_properties(counts):
    """Largest-remainder allocation: Σquota == budget exactly, each quota
    within one seat of the exact proportional share, and never negative
    or above the stratum size (when budget < total)."""
    total = sum(counts)
    budget = total // STRAT_BUDGET_DIV
    con = duckdb.connect()
    values = ", ".join(f"('s{i:02d}', {n})" for i, n in enumerate(counts))
    rows = con.execute(
        f"""
WITH counts(source, n_docs) AS (VALUES {values}),
totals AS (
  SELECT sum(n_docs) AS total, sum(n_docs) // {STRAT_BUDGET_DIV} AS budget
  FROM counts
),
based AS (
  SELECT source, n_docs, budget,
         (budget * n_docs) // total AS base,
         (budget * n_docs) % total AS rem
  FROM counts, totals
)
SELECT source, n_docs,
       CAST(base + (row_number() OVER (ORDER BY rem DESC, source)
                    <= budget - sum(base) OVER ())::int AS BIGINT) AS quota
FROM based
ORDER BY source
"""
    ).fetchall()
    assert sum(r[2] for r in rows) == budget
    for _src, n, quota in rows:
        assert 0 <= quota <= n
        exact = budget * n / total
        assert abs(quota - exact) < 1.0


@settings(max_examples=200, deadline=None)
@given(
    incs=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=60
    )
)
def test_cusum_window_identity(incs):
    """S_t = P_t - min(0, min_{j<=t} P_j) equals the clamped recursion
    S_t = max(0, S_{t-1} + inc_t) for ANY integer series."""
    con = duckdb.connect()
    values = ", ".join(f"({i}, {v})" for i, v in enumerate(incs))
    rows = con.execute(
        f"""
WITH series(t, inc) AS (VALUES {values}),
prefixed AS (
  SELECT t, sum(inc) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM series
)
SELECT t, p - min(least(p, 0)) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
FROM prefixed ORDER BY t
"""
    ).fetchall()
    s = 0
    for (t, got), inc in zip(rows, incs):
        s = max(0, s + inc)
        assert got == s, t


@settings(max_examples=200, deadline=None)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=1, max_size=40
    ),
    k=st.integers(min_value=1, max_value=10),
)
def test_aes_key_ordering_is_scale_invariant(weights, k):
    """A-ES sanity: multiplying every weight by a constant shifts every
    key by the same 1/c factor, so the SELECTION ORDER depends only on
    relative weights (the property that makes the sample weight-
    proportional rather than magnitude-dependent)."""
    import hashlib
    import math

    def keys(ws, scale):
        out = []
        for i, w in enumerate(ws):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 4294967296.0
            out.append((math.log(u) / (w * scale), i))
        return sorted(out, reverse=True)

    order_1 = [i for _key, i in keys(weights, 1)][:k]
    order_c = [i for _key, i in keys(weights, 7)][:k]
    assert order_1 == order_c


@settings(max_examples=150, deadline=None)
@given(
    weights=st.lists(
        # ≥12 orders of magnitude: w=1 against w=10^12 stresses the nano
        # fixed point (ln(u)/1e12 · 1e9 rounds to 0 — a collision regime)
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=40,
    )
)
def test_aes_fixed_point_key_matches_oracle_engine_across_weight_scales(weights):
    """The exact nano fixed-point key the engines rank on —
    floor(ln((h+0.5)/2^32)/w · 1e9 + 0.5) — computed by DuckDB (the
    oracle engine) must match an independent libm computation for every
    weight scale, and the (key DESC, doc_id) rank order derived from it
    must match row-for-row.  Collisions (huge weights collapsing to
    key = 0) are allowed — they must simply collide IDENTICALLY and fall
    to the doc_id tie-break."""
    import hashlib
    import math

    values = ", ".join(f"({i}, {w}::bigint)" for i, w in enumerate(weights))
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH docs(doc_id, w) AS (VALUES {values})
        SELECT doc_id,
               CAST(floor(
                 ln((('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint::double + 0.5)
                    / 4294967296.0) / w::double * 1000000000.0 + 0.5) AS BIGINT)
               AS key_nano
        FROM docs
        ORDER BY key_nano DESC, doc_id
        """
    ).fetchall()

    def py_key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return math.floor(math.log(u) / w * 1e9 + 0.5)

    want = sorted(
        ((py_key(i, w), i) for i, w in enumerate(weights)),
        key=lambda t: (-t[0], t[1]),
    )
    got = [(k, i) for i, k in rows]
    assert got == [(k, i) for k, i in want]


def test_kaplan_meier_matches_reference_product(spark=None):
    """KM in the log domain (nano-fixed terms) must reproduce the textbook
    product-limit estimate: build the same table in pure Python over the
    oracle engine's inputs and compare survival values and risk sets."""
    import math

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        membership_survival_km_sql,
        memberships_2024_sql,
    )

    got = con.execute(membership_survival_km_sql()).fetchall()
    raw = con.execute(
        f"WITH m AS ({memberships_2024_sql()}) "
        "SELECT (end_date - start_date) AS dur, (status = 'END') AS ev FROM m"
    ).fetchall()
    from collections import defaultdict

    d_by, c_by = defaultdict(int), defaultdict(int)
    for dur, ev in raw:
        (d_by if ev else c_by)[dur] += 1
    times = sorted(set(d_by) | set(c_by))
    n = len(raw)
    surv, out = 1.0, {}
    cum_nano = 0
    for t in times:
        d, c = d_by.get(t, 0), c_by.get(t, 0)
        if d > 0:
            if d >= n:
                out[t] = (n, d, c, 0.0)
            else:
                cum_nano += math.floor(math.log((n - d) / n) * 1e9 + 0.5)
                s = math.floor(math.exp(cum_nano / 1e9) * 1e6 + 0.5) / 1e6
                out[t] = (n, d, c, s)
        n -= d + c
    want = [(t, *out[t]) for t in sorted(out)]
    assert [tuple(r) for r in got] == want
    # survival is non-increasing
    ss = [r[4] for r in got]
    assert all(a >= b for a, b in zip(ss, ss[1:]))


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**15), max_value=10**15), min_size=1, max_size=120
    )
)
def test_bucketed_prefix_ranks_equal_sorted_ranks(vals):
    """The round-8 rank primitive (sign-aware log-bucket offsets +
    within-bucket prefix) must reproduce plain sorted-order ranks for ANY
    int64 multiset — the decomposition is only valid if the bucket
    function is monotone nondecreasing in the value, including the
    negative branch, zero, and duplicate-heavy inputs.  This underpins
    mann_whitney / trimmed_winsorized / gini / spearman / ks /
    theilsen_trend_bucketed."""
    from basin_climbing_data_pipeline_spark.operators.sketches import (
        HIST_SUBBUCKETS,
    )

    con = duckdb.connect()
    values = ", ".join(f"({v})" for v in vals)
    got = con.execute(
        f"""
WITH per_val AS (
  SELECT v, count(*) AS cnt FROM (VALUES {values}) t(v) GROUP BY v
),
bucketed AS (
  SELECT v, cnt,
         CASE WHEN v >= 0 THEN floor(log10(v + 1) * {HIST_SUBBUCKETS})
              ELSE -1 - floor(log10(-v + 1) * {HIST_SUBBUCKETS})
         END::bigint AS bkt
  FROM per_val
),
offsets AS (
  SELECT bkt, coalesce(sum(cnt) OVER (ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bkt_before
  FROM (SELECT bkt, sum(cnt) AS cnt FROM bucketed GROUP BY bkt)
),
ranked AS (
  SELECT b.v, b.cnt,
         o.bkt_before + coalesce(sum(b.cnt) OVER (PARTITION BY b.bkt ORDER BY b.v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM bucketed b JOIN offsets o USING (bkt)
)
SELECT v, cnt, before FROM ranked ORDER BY v
"""
    ).fetchall()
    ordered = sorted(vals)
    import bisect

    for v, cnt, before in got:
        lo = bisect.bisect_left(ordered, v)
        hi = bisect.bisect_right(ordered, v)
        assert before == lo, (v, before, lo)
        assert cnt == hi - lo, (v, cnt, hi - lo)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=120
    ),
    b=st.sampled_from([4, 5, 10]),
)
def test_rank_quantile_buckets_are_tie_stable_and_balanced(vals, b):
    """The round-9 rank-quantile primitive (RFM scores, OBF looks):
    bucket(v) = min(b-1, (b · |{x : x < v}|) div n).  Properties: every
    copy of the same value lands in the same bucket (tie stability — the
    reason ntile was rejected), buckets are monotone in the value, and
    no bucket is skipped below the last occupied one when values are
    distinct enough (each bucket's rank interval is non-empty)."""
    n = len(vals)
    import bisect

    sv = sorted(vals)
    bucket = {
        v: min(b - 1, (b * bisect.bisect_left(sv, v)) // n) for v in set(vals)
    }
    ordered = sorted(set(vals))
    bks = [bucket[v] for v in ordered]
    assert all(x <= y for x, y in zip(bks, bks[1:]))  # monotone
    assert all(0 <= x < b for x in bks)
    assert bucket[ordered[0]] == 0  # the minimum always opens bucket 0
    if len(ordered) == n and n >= b:
        # with ALL-distinct values the top bucket is reachable:
        # (b·(n−1)) div n = b−1 exactly when b ≤ n.  Heavy ties on the
        # maximum legitimately pull it down (hypothesis found
        # [1,2,3,4,4,4,4,4] @ b=4 → max in bucket 1) — ties share the
        # bucket their SHARED rank earns, which is the tie-stability
        # contract, not a defect.
        assert bucket[ordered[-1]] == b - 1


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=120
    )
)
def test_nearest_rank_interval_cover_equals_sorted_indexing(vals):
    """The round-9 nearest-rank pick (tukey quartiles, funnel latency
    median/p90): selecting the value whose prefix interval
    (before, before+cnt] covers rank r must equal sorted-array indexing
    sorted(vals)[r-1] for EVERY rank — the interval-cover form is what
    runs distributed; the sorted array is the spec."""
    from collections import Counter

    sv = sorted(vals)
    n = len(sv)
    per_val = sorted(Counter(vals).items())
    before = 0
    cover = {}
    for v, cnt in per_val:
        for r in range(before + 1, before + cnt + 1):
            cover[r] = v
        before += cnt
    for r in {1, (n + 1) // 2, (n + 3) // 4, (3 * n + 3) // 4, (9 * n + 9) // 10, n}:
        if 1 <= r <= n:
            assert cover[r] == sv[r - 1], (r, cover[r], sv[r - 1])


@settings(max_examples=300, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=-(10**14), max_value=10**14),  # s_a (cents sums)
        st.integers(min_value=1, max_value=10**7),           # n_a
        st.integers(min_value=-(10**14), max_value=10**14),  # s_b
        st.integers(min_value=1, max_value=10**7),           # n_b
        st.integers(min_value=-(10**14), max_value=10**14),  # s_a0
        st.integers(min_value=1, max_value=10**7),           # n_a0
        st.integers(min_value=-(10**14), max_value=10**14),  # s_b0
        st.integers(min_value=1, max_value=10**7),           # n_b0
    )
)
def test_cross_multiplied_extremeness_equals_exact_rational(t):
    """The permutation test's boundary comparison |S_a/n_a − S_b/n_b| ≥
    |S_a0/n_a0 − S_b0/n_b0| is evaluated as
    |S_a·n_b − S_b·n_a|·(n_a0·n_b0) ≥ |S_a0·n_b0 − S_b0·n_a0|·(n_a·n_b)
    in exact integer arithmetic (decimal(38,0) in Spark, HUGEINT in the
    oracle).  Prove the algebra against exact rationals over the full
    adversarial magnitude domain, and prove the 38-digit envelope is
    never exceeded (Spark decimal would otherwise overflow)."""
    from fractions import Fraction

    s_a, n_a, s_b, n_b, s_a0, n_a0, s_b0, n_b0 = t
    lhs = abs(s_a * n_b - s_b * n_a) * (n_a0 * n_b0)
    rhs = abs(s_a0 * n_b0 - s_b0 * n_a0) * (n_a * n_b)
    exact = abs(Fraction(s_a, n_a) - Fraction(s_b, n_b)) >= abs(
        Fraction(s_a0, n_a0) - Fraction(s_b0, n_b0)
    )
    assert (lhs >= rhs) == exact
    # decimal(38,0) envelope: |S|·n ≤ 1e14·1e7 = 1e21; diff ≤ 2e21;
    # times n²(≤1e14) ≤ 2e35 < 1e38 − the Spark cast never saturates.
    assert abs(lhs) < 10**38 and abs(rhs) < 10**38
