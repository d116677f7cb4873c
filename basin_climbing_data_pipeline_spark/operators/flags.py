"""Customer-flags rule engine + the unified event log it evaluates.

Reference architecture (customer_flags_engine.py:207-360): group the event
log per customer, build a sorted in-memory timeline, run ~17 rule objects
over it, emit flags with TTL and AB-experiment assignment.  Here the same
rules are NATIVE DataFrame programs — each rule is a windowed aggregate or
join over the event log, evaluated set-at-a-time (no per-customer Python in
the hot path).  A per-customer ``applyInPandas`` implementation of the same
rules lives in :func:`flags_via_applyinpandas` as the fidelity/differential
path (the reference's F3 UDAF surface); pytest asserts it agrees with the
native path.

Rules implemented (reference customer_flags_config.py:173-374 vocabulary):

- ready_for_membership: ≥3 checkins in the 14 days before as_of and no
  membership ever
- frequent_visitor: ≥8 checkins in the 30 days before as_of
- returning_after_break: a ≥break-day gap ending within 14 days of as_of
- new_member: membership started within 14 days before as_of
- membership_cancelled_winback: membership ended in the 30 days before
  as_of with no later membership start
- active-membership (persistent): an ACT membership interval covers as_of
- has-youth (persistent): customer has a child edge

AB assignment reproduces the reference's md5-hash bucketing
(customer_flags_config.py:96-132) as md5(customer_id) parity.  TTL
(14 days, persistent flags exempt — customer_flags_config.py:22-42) is
expressed as an is_active predicate against as_of.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config
from ..io import materialized

FLAGS_AS_OF = dt.date(2024, 1, 20)
BREAK_DAYS = 2  # compressed for the ~1-month synthetic stream (see events.py)

# ---------------------------------------------------------------------------
# unified event log (F5)
# ---------------------------------------------------------------------------

CATEGORY_EVENT_TYPE = {
    "Day Pass": "day_pass_purchase",
    "New Membership": "membership_purchase",
    "Membership Renewal": "membership_renewal",
    "Retail": "retail_purchase",
    "Programming": "programming_purchase",
    "Event Booking": "event_booking",
}


@materialized("events_unified")
def events_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified customer event log (reference build_events_table.py:27-128
    + customer_events_builder.py:641-664): checkins ∪ purchase events ∪
    membership lifecycle events, one schema, chronologically sortable."""
    from ..functions.text import map_lookup
    from .events import build_checkins
    from .memberships import build_memberships_2024
    from .transactions import build_transactions

    ck = build_checkins(spark, sf_dir).select(
        "customer_id",
        F.col("checkin_date").alias("event_date"),
        F.lit("checkin").alias("event_type"),
        F.lit("capitan").alias("event_source"),
        F.col("spend_amount").alias("amount"),
    )
    txn = build_transactions(spark, sf_dir).select(
        "customer_id",
        F.col("txn_date").alias("event_date"),
        F.when(F.col("is_refund"), "refund")
        .otherwise(
            map_lookup(F.col("revenue_category"), CATEGORY_EVENT_TYPE, "other_purchase")
        )
        .alias("event_type"),
        F.lower(F.col("data_source")).alias("event_source"),
        F.col("total_amount").alias("amount"),
    )
    m = build_memberships_2024(spark, sf_dir)
    started = m.select(
        F.col("owner_id").alias("customer_id"),
        F.col("start_date").alias("event_date"),
        F.lit("membership_started").alias("event_type"),
        F.lit("capitan").alias("event_source"),
        F.col("billing_amount").alias("amount"),
    )
    ended = m.filter(F.col("status") == "END").select(
        F.col("owner_id").alias("customer_id"),
        F.col("end_date").alias("event_date"),
        F.lit("membership_cancelled").alias("event_type"),
        F.lit("capitan").alias("event_source"),
        F.lit(0.0).alias("amount"),
    )
    return ck.unionByName(txn).unionByName(started).unionByName(ended)


def events_unified_sql() -> str:
    from ..functions.text import map_lookup_sql
    from .events import checkins_sql
    from .memberships import memberships_2024_sql
    from .transactions import transactions_sql

    et = map_lookup_sql("revenue_category", CATEGORY_EVENT_TYPE, "other_purchase")
    return f"""
WITH ck AS ({checkins_sql()}),
txn AS ({transactions_sql()}),
m AS ({memberships_2024_sql()})
SELECT customer_id, checkin_date AS event_date, 'checkin' AS event_type,
       'capitan' AS event_source, spend_amount AS amount
FROM ck
UNION ALL
SELECT customer_id, txn_date,
       CASE WHEN is_refund THEN 'refund' ELSE {et} END,
       lower(data_source), total_amount
FROM txn
UNION ALL
SELECT owner_id, start_date, 'membership_started', 'capitan', billing_amount FROM m
UNION ALL
SELECT owner_id, end_date, 'membership_cancelled', 'capitan', 0.0
FROM m WHERE status = 'END'
"""


# ---------------------------------------------------------------------------
# native rule engine
# ---------------------------------------------------------------------------


@materialized("flags")
def build_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All rules evaluated set-at-a-time; one row per (customer, flag)."""
    from .customers import build_customers
    from .events import build_checkins
    from .memberships import build_memberships_2024

    as_of = F.lit(FLAGS_AS_OF.strftime("%Y-%m-%d")).cast("date")
    ck = build_checkins(spark, sf_dir).select("customer_id", "checkin_date", "checkin_ts_us", "checkin_id")
    m = build_memberships_2024(spark, sf_dir)

    ck_asof = ck.filter(F.col("checkin_date") <= as_of)
    visit_stats = ck_asof.groupBy("customer_id").agg(
        F.count(F.when(F.col("checkin_date") > F.date_sub(as_of, 14), 1)).alias("visits_14d"),
        F.count(F.when(F.col("checkin_date") > F.date_sub(as_of, 30), 1)).alias("visits_30d"),
        F.max("checkin_date").alias("last_visit"),
    )
    mem_stats = m.groupBy(F.col("owner_id").alias("customer_id")).agg(
        F.min("start_date").alias("first_mem_start"),
        F.max("start_date").alias("last_mem_start"),
        F.max(F.when(F.col("status") == "END", F.col("end_date"))).alias("last_mem_end"),
        F.max(
            F.when(
                (F.col("status") == "ACT")
                & (F.col("start_date") <= as_of)
                & (F.col("end_date") >= as_of),
                1,
            ).otherwise(0)
        ).alias("has_active"),
    )
    base = visit_stats.join(mem_stats, "customer_id", "full")

    # returning_after_break: gap >= BREAK_DAYS ending within 14d of as_of
    from pyspark.sql import Window

    w = Window.partitionBy("customer_id").orderBy("checkin_ts_us", "checkin_id")
    gaps = (
        ck_asof.withColumn("prev", F.lag("checkin_date").over(w))
        .filter(
            (F.datediff(F.col("checkin_date"), F.col("prev")) >= BREAK_DAYS)
            & (F.col("checkin_date") > F.date_sub(as_of, 14))
        )
        .groupBy("customer_id")
        .agg(F.max("checkin_date").alias("return_date"))
    )
    base = base.join(gaps, "customer_id", "left")

    def flag(cond, name, priority, trigger_date, persistent=False):
        return base.filter(cond).select(
            "customer_id",
            F.lit(name).alias("flag_type"),
            trigger_date.alias("triggered_date"),
            F.lit(priority).alias("priority"),
            F.lit(persistent).alias("is_persistent"),
        )

    no_mem = F.col("first_mem_start").isNull()
    flags = (
        flag(
            (F.col("visits_14d") >= 3) & no_mem,
            "ready_for_membership",
            "high",
            F.col("last_visit"),
        )
        .unionByName(
            flag(F.col("visits_30d") >= 8, "frequent_visitor", "medium", F.col("last_visit"))
        )
        .unionByName(
            flag(
                F.col("return_date").isNotNull(),
                "returning_after_break",
                "medium",
                F.col("return_date"),
            )
        )
        .unionByName(
            flag(
                F.col("last_mem_start").isNotNull()
                & (F.col("last_mem_start") > F.date_sub(as_of, 14))
                & (F.col("last_mem_start") <= as_of),
                "new_member",
                "low",
                F.col("last_mem_start"),
            )
        )
        .unionByName(
            flag(
                F.col("last_mem_end").isNotNull()
                & (F.col("last_mem_end") > F.date_sub(as_of, 30))
                & (F.col("last_mem_end") <= as_of)
                & (
                    F.col("last_mem_start").isNull()
                    | (F.col("last_mem_start") <= F.col("last_mem_end"))
                ),
                "membership_cancelled_winback",
                "high",
                F.col("last_mem_end"),
            )
        )
        .unionByName(
            flag(F.col("has_active") == 1, "active-membership", "low", as_of, persistent=True)
        )
    )
    has_youth = (
        build_customers(spark, sf_dir)
        .filter(F.col("is_child"))
        .select(F.col("parent_customer_id").alias("customer_id"))
        .distinct()
        .select(
            "customer_id",
            F.lit("has-youth").alias("flag_type"),
            as_of.alias("triggered_date"),
            F.lit("low").alias("priority"),
            F.lit(True).alias("is_persistent"),
        )
    )
    flags = flags.unionByName(has_youth)

    ab = (
        F.when(
            F.conv(F.substring(F.md5(F.col("customer_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 2
            == 0,
            "A",
        ).otherwise("B")
    )
    ttl_ok = F.col("is_persistent") | (
        F.datediff(as_of, F.col("triggered_date")) <= config.FLAG_TTL_DAYS
    )
    return (
        flags.withColumn("ab_group", ab)
        .withColumn("is_active", ttl_ok)
        .orderBy("customer_id", "flag_type")
    )


def build_flags_sql() -> str:
    from .customers import customers_sql
    from .events import checkins_sql
    from .memberships import memberships_2024_sql

    as_of = f"DATE '{FLAGS_AS_OF.strftime('%Y-%m-%d')}'"
    return f"""
WITH ck0 AS ({checkins_sql()}),
cust AS ({customers_sql()}),
m AS ({memberships_2024_sql()}),
ck AS (SELECT * FROM ck0 WHERE checkin_date <= {as_of}),
visit_stats AS (
  SELECT customer_id,
         count(CASE WHEN checkin_date > {as_of} - 14 THEN 1 END) AS visits_14d,
         count(CASE WHEN checkin_date > {as_of} - 30 THEN 1 END) AS visits_30d,
         max(checkin_date) AS last_visit
  FROM ck GROUP BY customer_id
),
mem_stats AS (
  SELECT owner_id AS customer_id,
         min(start_date) AS first_mem_start,
         max(start_date) AS last_mem_start,
         max(CASE WHEN status = 'END' THEN end_date END) AS last_mem_end,
         max(CASE WHEN status = 'ACT' AND start_date <= {as_of} AND end_date >= {as_of}
                  THEN 1 ELSE 0 END) AS has_active
  FROM m GROUP BY owner_id
),
base AS (
  SELECT coalesce(v.customer_id, s.customer_id) AS customer_id,
         v.visits_14d, v.visits_30d, v.last_visit,
         s.first_mem_start, s.last_mem_start, s.last_mem_end, s.has_active
  FROM visit_stats v FULL JOIN mem_stats s ON v.customer_id = s.customer_id
),
gaps AS (
  SELECT customer_id, max(checkin_date) AS return_date
  FROM (
    SELECT customer_id, checkin_date,
           lag(checkin_date) OVER (PARTITION BY customer_id
                                   ORDER BY checkin_ts_us, checkin_id) AS prev
    FROM ck
  )
  WHERE checkin_date - prev >= {BREAK_DAYS} AND checkin_date > {as_of} - 14
  GROUP BY customer_id
),
enriched AS (
  SELECT base.*, gaps.return_date FROM base LEFT JOIN gaps USING (customer_id)
),
flags AS (
  SELECT customer_id, 'ready_for_membership' AS flag_type, last_visit AS triggered_date,
         'high' AS priority, false AS is_persistent
  FROM enriched WHERE visits_14d >= 3 AND first_mem_start IS NULL
  UNION ALL
  SELECT customer_id, 'frequent_visitor', last_visit, 'medium', false
  FROM enriched WHERE visits_30d >= 8
  UNION ALL
  SELECT customer_id, 'returning_after_break', return_date, 'medium', false
  FROM enriched WHERE return_date IS NOT NULL
  UNION ALL
  SELECT customer_id, 'new_member', last_mem_start, 'low', false
  FROM enriched WHERE last_mem_start IS NOT NULL
    AND last_mem_start > {as_of} - 14 AND last_mem_start <= {as_of}
  UNION ALL
  SELECT customer_id, 'membership_cancelled_winback', last_mem_end, 'high', false
  FROM enriched WHERE last_mem_end IS NOT NULL
    AND last_mem_end > {as_of} - 30 AND last_mem_end <= {as_of}
    AND (last_mem_start IS NULL OR last_mem_start <= last_mem_end)
  UNION ALL
  SELECT customer_id, 'active-membership', {as_of}, 'low', true
  FROM enriched WHERE has_active = 1
  UNION ALL
  SELECT DISTINCT parent_customer_id, 'has-youth', {as_of}, 'low', true
  FROM cust WHERE is_child
)
SELECT customer_id, flag_type, triggered_date, priority, is_persistent,
       CASE WHEN ('0x' || substr(md5(customer_id::varchar), 1, 8))::bigint % 2 = 0
            THEN 'A' ELSE 'B' END AS ab_group,
       (is_persistent OR ({as_of} - triggered_date) <= {config.FLAG_TTL_DAYS}) AS is_active
FROM flags
ORDER BY customer_id, flag_type
"""


def flag_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 over flags: count per flag_type × ab_group (the reference's flag
    audit value_counts, customer_flags_engine.py:352-354)."""
    flags = build_flags(spark, sf_dir)
    return (
        flags.groupBy("flag_type", "ab_group")
        .agg(F.count("*").alias("n"), F.countDistinct("customer_id").alias("n_customers"))
        .orderBy("flag_type", "ab_group")
    )


def flag_type_summary_sql() -> str:
    return f"""
WITH flags AS ({build_flags_sql()})
SELECT flag_type, ab_group, count(*) AS n, count(DISTINCT customer_id) AS n_customers
FROM flags GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# applyInPandas fidelity path (the reference's per-customer timeline loop)
# ---------------------------------------------------------------------------

FLAGS_SCHEMA = (
    "customer_id long, flag_type string, triggered_date date, priority string, "
    "is_persistent boolean"
)


def flags_via_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same visit-driven rules evaluated the reference's way: per-customer
    sorted timeline in Python (groupBy(customer).applyInPandas) — kept as the
    differential-fidelity path for rule semantics (SURVEY.md §2.10 F3) and as
    the template for genuinely sequential rules.  Covers the checkin-derived
    rules (ready_for_membership needs membership info, so the membership
    per-customer summary is joined in first)."""
    import pandas as pd

    from .events import build_checkins
    from .memberships import build_memberships_2024

    as_of = FLAGS_AS_OF

    ck = build_checkins(spark, sf_dir).select(
        "customer_id", "checkin_date", "checkin_ts_us", "checkin_id"
    )
    first_mem = (
        build_memberships_2024(spark, sf_dir)
        .groupBy(F.col("owner_id").alias("customer_id"))
        .agg(F.min("start_date").alias("first_mem_start"))
    )
    joined = ck.join(first_mem, "customer_id", "left")

    def eval_rules(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["checkin_date"] <= as_of]
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["customer_id", "flag_type", "triggered_date", "priority", "is_persistent"]
            )
        pdf = pdf.sort_values(["checkin_ts_us", "checkin_id"])
        cid = int(pdf["customer_id"].iloc[0])
        has_mem = pdf["first_mem_start"].notna().any()
        out = []
        d14 = [d for d in pdf["checkin_date"] if (as_of - d).days < 14]
        d30 = [d for d in pdf["checkin_date"] if (as_of - d).days < 30]
        last_visit = pdf["checkin_date"].max()
        if len(d14) >= 3 and not has_mem:
            out.append((cid, "ready_for_membership", last_visit, "high", False))
        if len(d30) >= 8:
            out.append((cid, "frequent_visitor", last_visit, "medium", False))
        dates = list(pdf["checkin_date"])
        return_date = None
        for prev, cur in zip(dates, dates[1:]):
            if (cur - prev).days >= BREAK_DAYS and (as_of - cur).days < 14:
                return_date = max(return_date, cur) if return_date else cur
        if return_date is not None:
            out.append((cid, "returning_after_break", return_date, "medium", False))
        return pd.DataFrame(
            out,
            columns=["customer_id", "flag_type", "triggered_date", "priority", "is_persistent"],
        )

    return joined.groupBy("customer_id").applyInPandas(eval_rules, FLAGS_SCHEMA)
