"""Property tests for the consolidated rank primitive (operators/sketches.py:
``log_bucket`` / ``bucketed_prefix_rank`` / ``log_bucket_sql``).

The round-10 consolidation collapsed 14 hand-inlined copies of the
sign-aware log-bucket expression (and 10 copies of the full prefix-rank
decomposition) into one shared primitive — the exact drift risk the
round-9 ADVICE flagged: the bucketing is monotonicity-sensitive (a
non-monotone bucket silently corrupts every rank-based statistic built on
it) and the prefix decomposition has three fencepost choices (exclusive
bucket offsets, within-bucket window bound, tie handling).  This file pins:

1. MONOTONICITY — bucket order equals value order over the full signed
   domain, at adversarial magnitudes (decade boundaries ±1, sub-bucket
   boundaries, ±1e17) in one dense deterministic Spark batch.
2. CROSS-ENGINE IDENTITY — ``log_bucket_sql`` lands every value in the
   same bucket DuckDB-side (hypothesis drives DuckDB; the Spark side is
   covered by the dense batch sharing the same pure-python reference).
3. RANK CORRECTNESS — ``bucketed_prefix_rank`` equals the brute-force
   O(n²) definition on randomized frames across every mode combination
   (partitioned × descending × inclusive × multi-measure).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from basin_climbing_data_pipeline_spark.operators.sketches import (
    HIST_SUBBUCKETS,
    log_bucket_sql,
)


def py_log_bucket(v: int) -> int:
    """Pure-python reference: the semantics both engines must implement."""
    if v >= 0:
        return math.floor(math.log10(v + 1) * HIST_SUBBUCKETS)
    return -1 - math.floor(math.log10(-v + 1) * HIST_SUBBUCKETS)


def _adversarial_values() -> list[int]:
    """Decade boundaries ±1, sub-bucket edges, and the documented-domain
    extremes (|v| ≤ 1e17 keeps log10's argument exact in double)."""
    vals = {0, 1, -1, 5, -5, 9, -9, 10, -10, 11, -11}
    for k in range(1, 18):
        for d in (-1, 0, 1):
            vals.add(10**k + d)
            vals.add(-(10**k) + d)
    # sub-bucket boundaries: v where log10(v+1)*16 crosses an integer
    for b in range(0, 18 * HIST_SUBBUCKETS, 7):
        edge = math.floor(10 ** (b / HIST_SUBBUCKETS)) - 1
        vals.update({edge - 1, edge, edge + 1, -edge, -edge - 1})
    rng = random.Random(100)
    vals.update(rng.randrange(-(10**17), 10**17) for _ in range(200))
    return sorted(v for v in vals if abs(v) <= 10**17)


def test_log_bucket_monotone_and_matches_reference(spark):
    """One dense Spark batch: bucket(v) == pure-python reference for every
    adversarial value, hence monotone (the reference is monotone by
    construction: log10 is increasing, the negative branch mirrors it
    below -1... which the sorted-pairs assertion ALSO checks directly)."""
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.operators.sketches import log_bucket

    vals = _adversarial_values()
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", log_bucket(F.col("v")).alias("b")
    )
    got = {r["v"]: r["b"] for r in df.collect()}
    for v in vals:
        assert got[v] == py_log_bucket(v), v
    buckets = [got[v] for v in vals]  # vals is sorted ascending
    assert all(a <= b for a, b in zip(buckets, buckets[1:]))


def test_log_bucket_sql_matches_reference():
    """DuckDB lands every adversarial value in the same bucket (the oracle
    side of theilsen/PSI/decile histograms depends on bucket identity)."""
    con = duckdb.connect()
    vals = _adversarial_values()
    con.execute("CREATE TABLE t AS SELECT unnest(?) ::BIGINT AS v", [vals])
    rows = con.execute(
        f"SELECT v, {log_bucket_sql('v')} AS b FROM t ORDER BY v"
    ).fetchall()
    for v, b in rows:
        assert b == py_log_bucket(v), v


def _brute_force(rows, *, descending, inclusive):
    """O(n²) reference: for each row, sum each measure over same-partition
    rows with strictly smaller/larger (or ≤/≥) value."""
    out = []
    for p, v, measures in rows:
        acc = [0] * len(measures)
        for p2, v2, m2 in rows:
            if p2 != p:
                continue
            smaller = v2 > v if descending else v2 < v
            if smaller or (inclusive and v2 == v):
                for i, m in enumerate(m2):
                    acc[i] += m
        out.append((p, v, tuple(acc)))
    return sorted(out)


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("inclusive", [False, True])
@pytest.mark.parametrize("partitioned", [False, True])
def test_bucketed_prefix_rank_matches_bruteforce(
    spark, descending, inclusive, partitioned
):
    """Randomized per-distinct-value frames (negative values, decade-edge
    magnitudes, heavy ties in cnt, two measures) across all 8 mode
    combinations — the helper must equal the O(n²) definition exactly."""
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.operators.sketches import (
        bucketed_prefix_rank,
    )

    rng = random.Random(10 * (1 + descending) + 2 * inclusive + partitioned)
    parts = ["a", "b", "c"] if partitioned else ["x"]
    seen = set()
    rows = []
    for _ in range(120):
        p = rng.choice(parts)
        v = rng.choice(
            [0, 1, -1, 9, 10, 11, -10, 99, 100, rng.randrange(-(10**12), 10**12)]
        )
        if (p, v) in seen:  # per-DISTINCT-value frame: (partition, value) unique
            continue
        seen.add((p, v))
        rows.append((p, v, (rng.randrange(1, 5), rng.randrange(0, 3))))
    df = spark.createDataFrame(
        [(p, v, c, a) for p, v, (c, a) in rows], "p string, v long, cnt long, av long"
    )
    got = bucketed_prefix_rank(
        df,
        "v",
        partition_cols=("p",) if partitioned else (),
        descending=descending,
        inclusive=inclusive,
        sums={"cnt": "before", "av": "av_before"},
    )
    got_rows = sorted(
        (r["p"], r["v"], (r["before"], r["av_before"])) for r in got.collect()
    )
    key = lambda p: p if partitioned else "x"  # noqa: E731
    ref = _brute_force(
        [(key(p), v, m) for p, v, m in rows],
        descending=descending,
        inclusive=inclusive,
    )
    assert got_rows == [(p, v, m) for p, v, m in ref]


def test_bucketed_prefix_rank_passthrough_and_defaults(spark):
    """Default sums={'cnt': 'before'}; all input columns pass through; no
    internal _bpr_* columns leak into the output schema."""
    from basin_climbing_data_pipeline_spark.operators.sketches import (
        bucketed_prefix_rank,
    )

    df = spark.createDataFrame(
        [(5, 2, "k"), (7, 1, "m"), (-3, 4, "n")], "v long, cnt long, tag string"
    )
    out = bucketed_prefix_rank(df, "v")
    assert set(out.columns) == {"v", "cnt", "tag", "before"}
    got = {r["v"]: (r["before"], r["tag"]) for r in out.collect()}
    assert got == {-3: (0, "n"), 5: (4, "k"), 7: (6, "m")}
