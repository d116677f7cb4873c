"""Differential test: the native set-at-a-time flags engine must agree with
the applyInPandas per-customer timeline implementation (the reference's
architecture) on the checkin-derived rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.operators import flags as fl

CHECKIN_RULES = ("ready_for_membership", "frequent_visitor", "returning_after_break")


def test_native_matches_applyinpandas(spark, sf_dir):
    native = (
        fl.build_flags(spark, sf_dir)
        .filter(F.col("flag_type").isin(*CHECKIN_RULES))
        .select("customer_id", "flag_type", "triggered_date")
    )
    pandas_path = fl.flags_via_applyinpandas(spark, sf_dir).select(
        "customer_id", "flag_type", "triggered_date"
    )
    n = {tuple(r) for r in native.collect()}
    p = {tuple(r) for r in pandas_path.collect()}
    assert n == p, (
        f"native-only: {sorted(n - p)[:5]}  pandas-only: {sorted(p - n)[:5]}"
    )


def test_ab_groups_deterministic(spark, sf_dir):
    flags = fl.build_flags(spark, sf_dir).select("customer_id", "ab_group").distinct()
    # one group per customer, both groups populated
    per_cust = flags.groupBy("customer_id").count().filter(F.col("count") > 1).count()
    assert per_cust == 0
    groups = {r["ab_group"] for r in flags.select("ab_group").distinct().collect()}
    assert groups == {"A", "B"}


def test_persistent_flags_never_expire(spark, sf_dir):
    flags = fl.build_flags(spark, sf_dir)
    stale_persistent = flags.filter(F.col("is_persistent") & ~F.col("is_active")).count()
    assert stale_persistent == 0
