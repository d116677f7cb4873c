"""Property tests for the fixed-point quantizer family (functions/money.py).

Three overflow/type bugs in two rounds came from these primitives
(``floor(double)``→LONG clamp in CUPED, the Holt int64 tap product, a
HUGEINT oracle drift) — this file is the upstream hardening the round-8
verdict ordered: prove Spark-vs-pure-python equality over the helpers'
documented domains at adversarial magnitudes (±1e18, subnormals, NaN,
half-cent ties), pin the saturation behavior OUTSIDE the domain so a
future Spark upgrade can't change it silently, and prove the oracle-SQL
mirrors agree with the same pure-python reference in DuckDB (hypothesis,
200 examples — cheap, no Spark per example).

The division of labor mirrors tests/test_property_ops.py: hypothesis
drives the engine whose floor semantics are benign (DuckDB), while the
Spark side — whose ``floor(double)`` returns LONG, SATURATES at ±2^63 and
maps NaN→0 — gets one dense deterministic batch covering every edge class
in a single job.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from basin_climbing_data_pipeline_spark.functions.money import (
    MICRO_GUARD_ABS,
    TO_CENTS_EXACT_ABS,
    micro_sql,
    ratio_sql,
    to_cents_sql,
)

INT64_MAX = (1 << 63) - 1
INT64_MIN = -(1 << 63)


# --- pure-python references (the semantics both engines must implement) --


def py_to_cents(x: float) -> int | None:
    """floor(x*100 + 0.5) in IEEE double, exact integer result."""
    if x is None:
        return None
    return math.floor(x * 100.0 + 0.5)


def py_micro(x: float) -> float | None:
    """The guarded quantizer: floor-quantize inside the bound, pass the
    raw double through outside it and on NaN (NaN comparisons are false)."""
    if x is None:
        return None
    if math.isnan(x) or not abs(x) < MICRO_GUARD_ABS:
        return x
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def py_ratio(num: float, den: float, digits: int) -> float:
    scale = float(10**digits)
    return math.floor(num / den * scale + 0.5) / scale


def py_spark_floor_long(x: float) -> int:
    """Spark's floor(double)→LONG semantics: saturate at ±2^63, NaN→0."""
    if math.isnan(x):
        return 0
    if math.isinf(x):
        return INT64_MAX if x > 0 else INT64_MIN
    f = math.floor(x)
    return max(INT64_MIN, min(INT64_MAX, f))


# --- the deterministic Spark batch: every edge class, one job -----------

EDGE_DOLLARS = [
    0.0,
    -0.0,
    0.005,  # half-cent tie (the class Spark round() vs DuckDB round() split on)
    -0.005,
    0.014999999999999999,
    2.675,  # classic repr-vs-binary rounding trap (2.675*100 = 267.49999…)
    -2.675,
    1.005,
    123.456,
    -123.456,
    1e-300,  # deep subnormal territory once scaled
    5e-324,  # smallest subnormal
    -5e-324,
    1e12,
    -1e12,
    1e15,
    9.0e16,  # TO_CENTS_EXACT_ABS boundary (inside)
    -9.0e16,
    1e18,  # OUTSIDE the to_cents domain — saturation must be pinned
    -1e18,
    9.3e18,
    -9.3e18,
    float("inf"),
    float("-inf"),
    float("nan"),
]

EDGE_MICRO = [
    0.0,
    -0.0,
    0.0000005,  # half-micro tie
    -0.0000005,
    1.0 - 2**-53,
    5e-324,
    -1e-310,
    999999999999.999999,  # just inside the guard
    1e12,  # exactly the guard bound → passthrough
    -1e12,
    1.0000000000000002e12,
    1e17,  # the CUPED variance magnitude that started this bug class
    -1e17,
    1e18,
    -1e18,
    float("inf"),
    float("-inf"),
    float("nan"),
]


@pytest.mark.slow
def test_spark_quantizers_match_python_over_edge_battery(spark):
    """ONE Spark job over every edge class: to_cents matches pure python
    exactly inside its documented domain and saturates exactly like
    py_spark_floor_long outside it; the guarded micro() matches pure
    python EVERYWHERE (including NaN/±inf/±1e18, where the unguarded form
    would clamp to int64 or send NaN to 0)."""
    import numpy as np
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.functions.money import micro, to_cents

    rng = np.random.default_rng(20260815)
    # dense magnitude sweep: signed log-uniform 1e-320 … 1e18
    mags = 10.0 ** rng.uniform(-320, 18.3, size=4000)
    signs = rng.choice([-1.0, 1.0], size=4000)
    dense = (mags * signs).tolist()
    # cent-grid values with half-cent ties (the money hot path)
    cents_grid = ((rng.integers(-(10**7), 10**7, size=2000) * 5).astype(float) / 1000.0).tolist()
    vals = EDGE_DOLLARS + EDGE_MICRO + dense + cents_grid

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    rows = df.select(
        "x", to_cents(F.col("x")).alias("cents"), micro(F.col("x")).alias("mq")
    ).collect()
    assert len(rows) == len(vals)

    def same_float(a: float, b: float) -> bool:
        if a is None or b is None:
            return a is b
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b and math.copysign(1, a) == math.copysign(1, b)

    for r in rows:
        x = r.x
        # to_cents: exact inside the domain, pinned saturation outside
        if math.isfinite(x) and abs(x) <= TO_CENTS_EXACT_ABS:
            assert r.cents == py_to_cents(x), (x, r.cents)
        else:
            assert r.cents == py_spark_floor_long(x * 100.0 + 0.5 if math.isfinite(x) else x), (
                x,
                r.cents,
            )
        # guarded micro: equal to python everywhere (signed-zero strict)
        assert same_float(r.mq, py_micro(x)), (x, r.mq, py_micro(x))


@pytest.mark.slow
def test_spark_unguarded_micro_divergence_is_why_the_guard_exists(spark):
    """Regression pin of the BUG CLASS itself: the unguarded idiom
    floor(x*1e6+0.5)/1e6 on Spark clamps 1e17 to int64-max/1e6 and maps
    NaN to 0.0 — if a Spark upgrade ever changes this, the guard bound
    deserves a fresh look."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1e17,), (float("nan"),)], "x double")
    got = {
        r.x if not math.isnan(r.x) else "nan": r.bad
        for r in df.select(
            "x", (F.floor(F.col("x") * 1e6 + 0.5) / 1e6).alias("bad")
        ).collect()
    }
    assert got[1e17] == INT64_MAX / 1e6  # clamped, NOT 1e17
    assert got["nan"] == 0.0  # NaN silently became a number


# --- hypothesis: oracle-SQL mirrors vs pure python (fast, per-example) ---


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(
        st.floats(
            min_value=-TO_CENTS_EXACT_ABS,
            max_value=TO_CENTS_EXACT_ABS,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_duckdb_to_cents_sql_matches_python(xs):
    """to_cents_sql over the full documented domain: DuckDB must produce
    the pure-python integer for every double, including subnormals and
    half-cent ties hypothesis finds."""
    import pandas as pd

    con = duckdb.connect()
    # float64 frame transport — SQL decimal literals lose a ULP past 16
    # significant digits (see test_duckdb_micro_sql_matches_python_everywhere)
    con.register("vals", pd.DataFrame({"i": range(len(xs)), "x": pd.array(xs, dtype="float64")}))
    rows = con.execute(
        f"SELECT i, {to_cents_sql('x')} FROM vals ORDER BY i"
    ).fetchall()
    for (_i, got), want_x in zip(rows, xs):
        assert got == py_to_cents(want_x), (want_x, got)


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(
        st.floats(allow_nan=False, width=64),  # full double range incl ±inf? no: inf excluded below
        min_size=1,
        max_size=50,
    )
)
def test_duckdb_micro_sql_matches_python_everywhere(xs):
    """The guarded micro mirror must equal py_micro for EVERY finite
    double — inside the guard it quantizes, outside it passes through."""
    xs = [x for x in xs if math.isfinite(x)]
    if not xs:
        return
    import pandas as pd

    con = duckdb.connect()
    # register a float64 frame instead of SQL literals: DuckDB parses a
    # fractional literal as DECIMAL first, and a 17-digit decimal's scaled
    # integer exceeds 2^53 — the round-trip loses a ULP before the cast
    # (hypothesis found 8528619215718791.0 → …790.0).  Real oracles read
    # parquet doubles; the frame matches that transport exactly.
    con.register("vals", pd.DataFrame({"i": range(len(xs)), "x": pd.array(xs, dtype="float64")}))
    rows = con.execute(
        f"SELECT i, {micro_sql('x')} FROM vals ORDER BY i"
    ).fetchall()
    for (_i, got), want_x in zip(rows, xs):
        want = py_micro(want_x)
        assert got == want or (got == 0.0 and want == 0.0), (want_x, got, want)


@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    digits=st.sampled_from([2, 4, 6]),
)
def test_duckdb_ratio_sql_matches_python(num, den, digits):
    """ratio_sql (the deterministic fixed-point division used by every
    rate/percentage output) equals the pure-python reference for any
    int64 numerator/denominator at every scale the repo uses."""
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {ratio_sql(f'{num}::double', f'{den}::double', digits)}"
    ).fetchone()[0]
    assert got == py_ratio(float(num), float(den), digits), (num, den, digits, got)
