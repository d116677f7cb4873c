"""Property tests for the three shared primitives the round-9 verdict
ordered hardened (depth-over-breadth, order #6): the md5 split/assignment
bucket, the deterministic HLL register path, and the quantized normal
p-value grid.  Each has ONE pure-python reference here, checked against
BOTH engines at adversarial inputs — the same upstream-hardening shape as
tests/test_property_money.py (which found the ULP-literal oracle class)
and tests/test_property_rank.py (the consolidation pin).

What each section actually de-risks at 100 TB:
- ``_md5_bucket`` decides experiment arms and train/test membership; a
  cross-engine or cross-version drift silently re-assigns every customer.
- The HLL register path's whole value is MERGEABILITY (keep registers,
  not keys; union = elementwise MAX) — pinned here as a property, not a
  docstring claim.
- The erfc grid turns z-scores into p-values through a floor-quantized
  index; the boundary indices are where a one-off would flip a
  reject/accept decision in every BH-FDR row.
"""

from __future__ import annotations

import hashlib
import math
import random

import duckdb

from basin_climbing_data_pipeline_spark.operators.experiments import (
    P_GRID_MAX_IDX,
    P_GRID_STEP,
    P_TWO_SIDED_MICRO,
)
from basin_climbing_data_pipeline_spark.operators.sampling import (
    SPLIT_BUCKETS,
    _md5_bucket,
    _md5_bucket_sql,
)
from basin_climbing_data_pipeline_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_BUCKETS,
    HLL_RHO_BITS,
)

# --- pure-python references ------------------------------------------------


def py_md5_bucket(s: str, buckets: int = SPLIT_BUCKETS) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % buckets


def py_hll_bucket_rho(s: str) -> tuple[int, int]:
    h = hashlib.md5(s.encode()).hexdigest()
    bucket = int(h[:2], 16)
    tail = int(h[2:14], 16)  # 48-bit
    # Spark-side rho = RHO_BITS - length(bin(tail)) + 1, where bin(0) = "0"
    # (length 1) — NOT python's int.bit_length() (0 -> 0); the cap at 48 is
    # the documented 2^-48 bias trade for exact int64 register sums.
    bitlen = max(tail.bit_length(), 1)
    return bucket, HLL_RHO_BITS - bitlen + 1


def py_hll_estimate(s_present: int, n_present: int) -> float:
    raw = (HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS) / (
        (s_present + (HLL_BUCKETS - n_present) * 2**HLL_RHO_BITS) / float(2**HLL_RHO_BITS)
    )
    empty = HLL_BUCKETS - n_present
    if raw <= 2.5 * HLL_BUCKETS and empty > 0:
        return float(HLL_BUCKETS) * math.log(float(HLL_BUCKETS) / empty)
    return raw


def py_p_two_sided(z: float) -> float:
    idx = min(int(math.floor(abs(z) * 100.0)), P_GRID_MAX_IDX)
    return P_TWO_SIDED_MICRO[idx] / 1_000_000.0


ADVERSARIAL_KEYS = (
    [str(i) for i in range(-25, 26)]
    + ["", " ", "0", "00", "-0", "düsseldorf", "名前", "a" * 1000, "NaN", "null"]
    + [str(random.Random(7).randrange(-(10**17), 10**17)) for _ in range(100)]
)


# --- _md5_bucket ------------------------------------------------------------


def test_md5_bucket_cross_engine_and_reference(spark):
    """Spark expression == DuckDB SQL == pure-python md5, for string AND
    bigint key types (the cast-to-string is part of the contract), at
    both the split (100) and arm (2) bucket counts."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    for buckets in (2, SPLIT_BUCKETS):
        df = spark.createDataFrame([(k,) for k in ADVERSARIAL_KEYS], "k string")
        got = {
            r["k"]: r["b"]
            for r in df.select("k", _md5_bucket(F.col("k"), buckets).alias("b")).collect()
        }
        con.execute("CREATE OR REPLACE TABLE t(k VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in ADVERSARIAL_KEYS])
        duck = dict(
            con.execute(f"SELECT k, {_md5_bucket_sql('k', buckets)} FROM t").fetchall()
        )
        for k in ADVERSARIAL_KEYS:
            assert got[k] == py_md5_bucket(k, buckets) == duck[k], (k, buckets)
    # bigint keys hash via their canonical string form on both engines
    ints = [int(k) for k in ADVERSARIAL_KEYS if k.lstrip("-").isdigit() and k not in ("00",)]
    dfi = spark.createDataFrame([(i,) for i in ints], "k long")
    from pyspark.sql import functions as F  # noqa: F811

    goti = {
        r["k"]: r["b"] for r in dfi.select("k", _md5_bucket(F.col("k")).alias("b")).collect()
    }
    for i in ints:
        assert goti[i] == py_md5_bucket(str(i)), i


def test_md5_bucket_pinned_values():
    """Version-drift tripwire: exact bucket for known keys, computed from
    the md5 definition itself — if a Spark/DuckDB upgrade changes md5,
    conv, or substring semantics, the cross-engine test catches it; this
    pin catches BOTH engines moving together (a formula edit)."""
    assert py_md5_bucket("42") == int(hashlib.md5(b"42").hexdigest()[:8], 16) % 100
    assert py_md5_bucket("customer_1", 2) in (0, 1)
    # regression literal: stable forever (md5("1")[:8] = c4ca4238... -> 60)
    assert py_md5_bucket("1") == 60


# --- HLL register path -------------------------------------------------------


def test_hll_register_rows_match_reference(spark):
    """Spark (bucket, rho) == pure-python md5 reference per element —
    including the rho cap (tail = 0 is unreachable by construction, but
    small tails with many leading zeros exercise the high-rho range)."""
    from pyspark.sql import functions as F

    from basin_climbing_data_pipeline_spark.operators.sketches import (
        _hll_register_rows,
    )

    df = spark.createDataFrame([(k,) for k in ADVERSARIAL_KEYS], "k string")
    rows = _hll_register_rows(df, [F.col("k")], "k").collect()
    assert len(rows) == len(ADVERSARIAL_KEYS)
    for r in rows:
        b, rho = py_hll_bucket_rho(r["k"])
        assert (r["bucket"], r["rho"]) == (b, rho), r["k"]
        assert 1 <= r["rho"] <= HLL_RHO_BITS


def test_hll_registers_merge_is_elementwise_max(spark):
    """THE composability property the 100-TB story rests on (and that
    hll_source_overlap's inclusion-exclusion assumes): registers of a
    UNION equal the elementwise MAX of the parts' registers — so shards,
    days, and sources merge without touching raw keys."""
    from basin_climbing_data_pipeline_spark.operators.sketches import _hll_registers

    rng = random.Random(11)
    a = [str(rng.randrange(10**6)) for _ in range(400)]
    b = [str(rng.randrange(10**6)) for _ in range(400)]  # overlaps a
    df_a = spark.createDataFrame([("a", k) for k in a], "grp0 string, k string")
    df_b = spark.createDataFrame([("a", k) for k in b], "grp0 string, k string")
    df_u = df_a.union(df_b)
    regs = lambda d: {  # noqa: E731
        r["bucket"]: r["max_rho"]
        for r in _hll_registers(d, "grp0", "k").collect()
    }
    ra, rb, ru = regs(df_a), regs(df_b), regs(df_u)
    merged = {
        bkt: max(ra.get(bkt, 0), rb.get(bkt, 0)) for bkt in set(ra) | set(rb)
    }
    assert ru == merged


def test_hll_estimator_matches_reference_and_switch_boundary(spark):
    """Spark _hll_estimate_col == pure-python Flajolet estimator over a
    grid of (s_present, n_present) register summaries that straddles the
    linear-counting switch (raw ≤ 2.5m, V > 0) and the all-full case."""
    from basin_climbing_data_pipeline_spark.operators.sketches import (
        _hll_estimate_col,
    )

    cases = []
    for n_present in (1, 5, 64, 128, 255, 256):
        for mean_rho in (1, 3, 10, 30, 47):
            s = n_present * 2 ** (HLL_RHO_BITS - mean_rho)
            cases.append((s, n_present))
    df = spark.createDataFrame(cases, "s_present long, n_present long")
    got = df.select("s_present", "n_present", _hll_estimate_col().alias("e")).collect()
    for r in got:
        ref = py_hll_estimate(r["s_present"], r["n_present"])
        assert math.isclose(r["e"], ref, rel_tol=1e-12), (
            r["s_present"],
            r["n_present"],
        )


# --- quantized normal p-value grid -------------------------------------------


def test_p_grid_shape():
    """Monotone nonincreasing, correct endpoints, and every entry is the
    micro-rounding of erfc at its own grid point (recomputed here from the
    definition — guards accidental edits to step/cap/rounding)."""
    assert len(P_TWO_SIDED_MICRO) == P_GRID_MAX_IDX + 1
    assert P_TWO_SIDED_MICRO[0] == 1_000_000  # z = 0 -> p = 1
    assert P_TWO_SIDED_MICRO[-1] == 1  # z = 5 -> p = 5.7e-7 -> micro-rounds to 1
    assert all(a >= b for a, b in zip(P_TWO_SIDED_MICRO, P_TWO_SIDED_MICRO[1:]))
    for k in range(0, P_GRID_MAX_IDX + 1, 13):
        ref = math.floor(math.erfc(k * P_GRID_STEP / math.sqrt(2.0)) * 1e6 + 0.5)
        assert P_TWO_SIDED_MICRO[k] == ref


def test_p_grid_lookup_cross_engine(spark):
    """The z -> p lookup (floor-quantized index, capped) lands on the same
    grid cell in Spark, DuckDB, and the pure-python reference — driven at
    the boundary z values where a one-off flips a BH-FDR decision.  Uses
    the operators' exact expressions: Spark element_at(array, idx+1),
    DuckDB list[idx+1]."""
    from pyspark.sql import functions as F

    zs = [0.0, 0.004, 0.01, 0.0999, 0.1, 1.959, 1.96, 2.575, 4.99, 4.999, 5.0, 5.01, 7.3]
    zs += [-z for z in zs] + [round(random.Random(3).uniform(-6, 6), 4) for _ in range(60)]
    p_arr = F.array(*[F.lit(p / 1_000_000.0) for p in P_TWO_SIDED_MICRO])
    zq = F.least(F.floor(F.abs(F.col("z")) * 100.0).cast("int"), F.lit(P_GRID_MAX_IDX))
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r["z"]: r["p"] for r in df.select("z", F.element_at(p_arr, zq + 1).alias("p")).collect()}
    p_list = ", ".join(str(p / 1_000_000.0) for p in P_TWO_SIDED_MICRO)
    con = duckdb.connect()
    duck = dict(
        con.execute(
            f"SELECT z, ([{p_list}])[least(floor(abs(z) * 100.0)::int, {P_GRID_MAX_IDX}) + 1] "
            "FROM (SELECT unnest(?::DOUBLE[]) AS z)",
            [zs],
        ).fetchall()
    )
    for z in zs:
        assert got[z] == duck[z] == py_p_two_sided(z), z
