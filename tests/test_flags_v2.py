"""Rule-semantics tests for the v2 flags engine (cooldown, step-2 offers,
child propagation + parent suppression, birthday timing, 2-week-pass
keyword match) — each asserts the rule's defining invariant on the
synthetic stream, complementing the cross-engine oracle check."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.operators import flags as fl


def _flags(spark, sf_dir):
    return fl.build_flags(spark, sf_dir)


def _types(df):
    return {r["flag_type"] for r in df.select("flag_type").distinct().collect()}


def test_child_flags_renamed_and_suppressed(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.customers import build_customers

    flags = _flags(spark, sf_dir)
    cust = build_customers(spark, sf_dir).select(
        "customer_id", "is_child", "parent_customer_id"
    )
    child_rows = flags.filter(F.col("flag_type").startswith("child_")).join(
        cust, "customer_id"
    )
    rows = child_rows.collect()
    assert rows, "expected at least one child_* flag on the synthetic stream"
    plain = {
        (r["customer_id"], r["flag_type"])
        for r in flags.filter(~F.col("flag_type").startswith("child_")).collect()
    }
    for r in rows:
        base = r["flag_type"][len("child_") :]
        # only child-eligible flags are renamed, only for child customers
        assert base in fl.CHILD_ELIGIBLE_FLAGS
        assert r["is_child"]
        # parent suppression: the parent must NOT hold the same base flag
        assert (r["parent_customer_id"], base) not in plain


def test_no_unrenamed_child_eligible_flags_on_children(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.customers import build_customers

    flags = _flags(spark, sf_dir)
    children = build_customers(spark, sf_dir).filter(F.col("is_child")).select(
        "customer_id"
    )
    bad = (
        flags.join(children, "customer_id")
        .filter(F.col("flag_type").isin(*fl.CHILD_ELIGIBLE_FLAGS))
        .count()
    )
    assert bad == 0


def test_offer_cooldown_suppresses_phase1_repeats(spark, sf_dir):
    phase1 = fl._raw_flags(
        spark, sf_dir, fl.FLAGS_AS_OF - dt.timedelta(days=fl.PHASE1_LAG_DAYS)
    )
    now = _flags(spark, sf_dir)
    p1_offers = {
        (r["customer_id"], r["flag_type"])
        for r in phase1.filter(F.col("flag_type").isin(*fl.OFFER_FLAG_TYPES)).collect()
    }
    now_offers = {
        (r["customer_id"], r["flag_type"].removeprefix("child_"))
        for r in now.filter(
            F.col("flag_type").isin(
                *fl.OFFER_FLAG_TYPES, *[f"child_{t}" for t in fl.OFFER_FLAG_TYPES]
            )
        ).collect()
    }
    assert not (p1_offers & now_offers)


def test_birthday_flags_match_party_dates(spark, sf_dir):
    flags = _flags(spark, sf_dir)
    parties = fl.build_parties(spark, sf_dir)
    hosts7 = {
        r["host_customer_id"]
        for r in parties.filter(
            F.col("party_date")
            == F.lit((fl.FLAGS_AS_OF + dt.timedelta(days=7)).isoformat()).cast("date")
        ).collect()
    }
    flagged = {
        r["customer_id"]
        for r in flags.filter(
            F.col("flag_type") == "birthday_party_host_one_week_out"
        ).collect()
    }
    assert flagged == hosts7
    assert flagged, "expected hosts with a party exactly 7 days out"


def test_two_week_pass_flag_only_for_two_week_owners(spark, sf_dir):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        build_memberships_2024,
    )

    flags = _flags(spark, sf_dir)
    owners = {
        r["owner_id"]
        for r in build_memberships_2024(spark, sf_dir)
        .filter(fl._is_two_week(F.col("name")))
        .collect()
    }
    flagged = {
        r["customer_id"]
        for r in flags.filter(
            F.col("flag_type").isin("2_week_pass_purchase", "child_2_week_pass_purchase")
        ).collect()
    }
    assert flagged and flagged <= owners


def test_fifty_percent_requires_phase1_eligibility(spark, sf_dir):
    phase1 = fl._raw_flags(
        spark, sf_dir, fl.FLAGS_AS_OF - dt.timedelta(days=fl.PHASE1_LAG_DAYS)
    )
    sv1 = {
        r["customer_id"]
        for r in phase1.filter(
            F.col("flag_type") == "second_visit_offer_eligible"
        ).collect()
    }
    flags = _flags(spark, sf_dir)
    fifty = {
        r["customer_id"]
        for r in flags.filter(
            F.col("flag_type").isin(
                "fifty_percent_offer_sent", "child_fifty_percent_offer_sent"
            )
        ).collect()
    }
    assert fifty <= sv1
