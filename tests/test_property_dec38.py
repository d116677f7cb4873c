"""Property tests for the shared decimal(38,0) overflow-discipline helpers
(functions/money.py: ``dec38`` / ``dec38_prod`` / ``DEC38``) — the round-10
verdict's order #2 consolidation of the ~36 inline
``dec = lambda c: c.cast("decimal(38,0)")`` copies and the per-factor
``(xd * yd).cast("decimal(38,0)")`` squared-moment idiom.

What this de-risks at 100 TB: every rank/moment statistic (correlation,
OLS, ANOVA, Welch, Mann-Whitney, Wilcoxon, CvM, …) funnels its exact-integer
arithmetic through these two expressions.  int64 products of cents wrap
silently (or THROW under ANSI) past ~9.2e18 while DuckDB promotes to
HUGEINT — the round-9 fuzzing catch — so the helpers must stay exact over
the whole int64 domain, including the extreme corners no sampled corpus
reaches.  The pin is three-way: Spark Column expression == DuckDB HUGEINT
SQL == pure-python int, at adversarial magnitudes.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.functions.money import (
    DEC38,
    dec38,
    dec38_prod,
)

I64_MAX = 2**63 - 1
I64_MIN = -(2**63)

# Adversarial int64 factors: corners, near-corners, powers of ten around the
# int64-overflow knee (1e9·1e9 = 1e18 < 2^63 < 1e10·1e9), ties, zeros, and
# seeded random draws over the full domain.
_rng = random.Random(38)
ADVERSARIAL_INTS = (
    [0, 1, -1, 2, -2, I64_MAX, I64_MIN, I64_MAX - 1, I64_MIN + 1]
    + [10**k for k in range(1, 19)]
    + [-(10**k) for k in range(1, 19)]
    + [3037000499, 3037000500, -3037000500]  # isqrt(2^63) straddle
    + [_rng.randrange(I64_MIN, I64_MAX) for _ in range(60)]
)


def test_dec38_prod_exact_python_ints(spark):
    """dec38_prod(a, b) == a*b as exact Python ints over adversarial int64
    factor pairs.  EVERY int64×int64 product fits decimal(38,0) exactly
    (|a·b| ≤ 2^126 ≈ 8.5e37 < 1e38), so the helper is total over its
    declared bigint domain — including both int64 corners, where the old
    inline LONG-multiply idiom wrapped."""
    pairs = []
    vals = ADVERSARIAL_INTS
    for i in range(0, len(vals) - 1, 2):
        pairs.append((vals[i], vals[i + 1]))
    # force the extreme corners in explicitly: |product| just under 2^126
    pairs += [(I64_MAX, I64_MIN), (I64_MIN, I64_MIN), (99999999, -99999999)]
    assert len(pairs) >= 40
    df = spark.createDataFrame(pairs, "a long, b long")
    got = (
        df.select(dec38_prod(F.col("a"), F.col("b")).alias("p"))
        .toLocalIterator()
    )
    want = [a * b for a, b in pairs]
    for (row, w) in zip(got, want):
        assert int(row.p) == w
    # DuckDB mirror: HUGEINT product of the same pairs
    con = duckdb.connect()
    for a, b in pairs[:25]:
        (dd,) = con.execute(
            f"select cast({a} as hugeint) * cast({b} as hugeint)"
        ).fetchone()
        assert int(dd) == a * b


def test_dec38_sum_of_squares_exact(spark):
    """Σ dec38_prod(y, y) over a frame of adversarial cents == the exact
    python Σy² — the squared-moment accumulator every variance-family
    operator uses; int64 would wrap at the third row here."""
    ys = [4 * 10**9 + i for i in range(20)] + [-(3 * 10**9), 0, 7]
    want = sum(y * y for y in ys)
    assert want > I64_MAX  # the accumulation genuinely leaves int64
    df = spark.createDataFrame([(y,) for y in ys], "y long")
    (got,) = df.agg(F.sum(dec38_prod(F.col("y"), F.col("y"))).alias("q")).first()
    assert int(got) == want
    con = duckdb.connect()
    vals = ",".join(f"({y})" for y in ys)
    (dd,) = con.execute(
        f"select sum(cast(y as hugeint) * cast(y as hugeint)) from (values {vals}) t(y)"
    ).fetchone()
    assert int(dd) == want


def test_dec38_cast_identity_and_mixed_products(spark):
    """dec38(c) preserves every int64 value exactly, and the mixed idiom the
    call sites use — dec38(bigint) * decimal(38,0) accumulator — stays
    exact: n·Σxy - Σx·Σy style cross terms reproduce python ints."""
    vals = [v for v in ADVERSARIAL_INTS if isinstance(v, int)][:40]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select(dec38(F.col("v")).alias("d")).toLocalIterator()
    for row, v in zip(got, vals):
        assert int(row.d) == v
    # n * q - s * s with q already decimal(38,0): the canonical variance
    # numerator shape (q near 1e20 forces the decimal path)
    n, q, s = 10**6, 10**20, 9 * 10**12
    one = spark.createDataFrame([(n, s)], "n long, s long").select(
        F.col("n"), F.col("s"), F.lit(str(q)).cast(DEC38).alias("q")
    )
    (res,) = one.select(
        (dec38(F.col("n")) * F.col("q") - dec38(F.col("s")) * dec38(F.col("s"))).alias("z")
    ).first()
    assert int(res) == n * q - s * s
