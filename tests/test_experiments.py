"""AB experiment tracking tests (reference test_ab_group_fix.py style):
skip-if-exists replay semantics and assignment/entry invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.operators import experiments as ex
from basin_climbing_data_pipeline_spark.operators.incremental import append_if_absent


def test_one_entry_per_customer(spark, sf_dir):
    entries = ex.experiment_entries(spark, sf_dir)
    total = entries.count()
    assert total > 0
    assert entries.select("customer_id").distinct().count() == total
    assert {r["experiment_id"] for r in entries.collect()} == {ex.EXPERIMENT_ID}


def test_entry_flags_are_offer_flags(spark, sf_dir):
    entries = ex.experiment_entries(spark, sf_dir)
    assert {r["entry_flag"] for r in entries.collect()} <= set(ex.ENTRY_FLAGS)


def test_group_matches_md5_assignment(spark, sf_dir):
    """The logged group must be the same md5-parity assignment the flags
    engine uses (reference get_customer_ab_group)."""
    entries = ex.experiment_entries(spark, sf_dir)
    recomputed = F.when(
        F.conv(F.substring(F.md5(F.col("customer_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    bad = entries.filter(F.col("ab_group") != recomputed).count()
    assert bad == 0


def test_replay_is_skip_if_exists(spark, sf_dir):
    """Re-running the pipeline must not duplicate entries (reference
    log_experiment_entry's exists-check)."""
    entries = ex.experiment_entries(spark, sf_dir)
    replayed = append_if_absent(entries, entries, "customer_id")
    assert replayed.count() == entries.count()
    # a genuinely new customer does get appended
    extra = entries.limit(1).withColumn(
        "customer_id", F.col("customer_id") + 10_000_000
    )
    appended = append_if_absent(entries, extra, "customer_id")
    assert appended.count() == entries.count() + 1


def test_ztest_matches_scipy_formula(spark, sf_dir):
    """Recompute the two-proportion z from the emitted counts in plain
    Python — the query's float path must agree to 1e-6."""
    import math

    from basin_climbing_data_pipeline_spark.operators.experiments import (
        experiment_conversion_ztest,
    )

    rows = experiment_conversion_ztest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["z_score"] is None:
            assert r["n_a"] == 0 or r["n_b"] == 0 or r["conv_a"] + r["conv_b"] in (
                0,
                r["n_a"] + r["n_b"],
            )
            continue
        pa, pb = r["conv_a"] / r["n_a"], r["conv_b"] / r["n_b"]
        pool = (r["conv_a"] + r["conv_b"]) / (r["n_a"] + r["n_b"])
        z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / r["n_a"] + 1 / r["n_b"]))
        assert abs(r["z_score"] - math.floor(z * 1e6 + 0.5) / 1e6) < 1e-9
