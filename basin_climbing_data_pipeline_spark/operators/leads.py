"""Customer master (wide ~45-col table) + leads timeline assembly.

- :func:`customer_master`: the reference's flagship wide table
  (build_customer_master.py:28-570 — identity + family + membership + visit
  + spend + flags in one row per person).  The reference builds it with
  iterrows + dict lookups over 10 loaded tables; here it's a star of LEFT
  joins of pre-aggregated per-customer stats (each input aggregated to the
  customer grain first, so every join is 1:1 — no fan-out, minimal shuffle).

- :func:`lead_timelines`: the reference's UDTF-like per-lead timeline
  assembly (build_leads_table.py:411-649: rows → sorted JSON array + ~25
  summary cols) re-expressed as groupBy + ordered string aggregation +
  conditional aggregates — one shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import sum_money, sum_money_sql
from ..io import load_table


MASTER_AS_OF = "2024-02-01"  # deterministic "today" for days-since metrics

# first non-member entry method → lead source (reference
# build_customer_master.py:380-425; EVE sub-categories need the
# entry_method_description free text, which the synthetic stream lacks)
LEAD_SOURCE_BY_ENTRY = {
    "ENT": "Day Pass",
    "GUE": "Guest Pass",
    "FRE": "Free Entry",
    "EVE": "Event",
}


def customer_master(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship wide table: one row per customer with identity, family,
    membership, visit, spend and flag columns — a star of LEFT joins of
    per-customer pre-aggregations (see module docstring)."""
    from ..functions.text import map_lookup
    from .customers import build_customers
    from .events import build_checkins
    from .flags import build_flags
    from .memberships import build_memberships_2024
    from .transactions import build_transactions

    cust = build_customers(spark, sf_dir)
    as_of = F.lit(MASTER_AS_OF).cast("date")

    # visit stats + first-lead-source in ONE aggregation over checkins: the
    # "first non-member check-in" pick is min(struct(ts, id, method)) — a
    # partial-aggregable expression (map-side combine), where the equivalent
    # row_number window costs a full per-customer sort of the checkin stream.
    # At 100 TB that's the difference between one combiner pass and sorting
    # the fact table per key; lexicographic struct-min == the window's
    # ORDER BY checkin_ts_us, checkin_id.
    ck = build_checkins(spark, sf_dir)
    visits = (
        ck.groupBy("customer_id")
        .agg(
            F.count("*").alias("total_visits"),
            F.min("checkin_date").alias("first_visit_date"),
            F.max("checkin_date").alias("last_visit_date"),
            F.min(
                F.when(
                    F.col("entry_method").isin(*LEAD_SOURCE_BY_ENTRY),
                    F.struct("checkin_ts_us", "checkin_id", "entry_method"),
                )
            ).alias("_lead"),
        )
        .withColumn(
            "first_lead_source",
            F.when(
                F.col("_lead").isNotNull(),
                map_lookup(F.col("_lead.entry_method"), LEAD_SOURCE_BY_ENTRY, "Event"),
            ),
        )
        .drop("_lead")
    )
    spend = (
        build_transactions(spark, sf_dir)
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("total_txns"),
            sum_money(F.col("total_amount")).alias("net_spend"),
            F.sum("day_pass_count").alias("day_passes_bought"),
        )
    )
    # membership stats + "the" membership row per owner in ONE aggregation
    # (reference build_customer_master.py:294-303 keeps the ACT row if any):
    # prefer ACT, then latest start, then highest id == max(struct(is_act,
    # start_date, membership_id, ...payload)) — again partial-aggregable
    # where the former row_number window sorted all memberships per owner
    m2024 = build_memberships_2024(spark, sf_dir)
    mem = (
        m2024.groupBy(F.col("owner_id").alias("customer_id"))
        .agg(
            F.count("*").alias("n_memberships"),
            F.min("start_date").alias("first_membership_start"),
            F.max(F.when(F.col("status") == "ACT", 1).otherwise(0)).alias("_any_act"),
            F.max(
                F.struct(
                    (F.col("status") == "ACT").alias("_act"),
                    F.col("start_date").alias("_sd"),
                    F.col("membership_id").alias("_mid"),
                    F.col("name").alias("membership_name"),
                    F.col("end_date").alias("membership_end_date"),
                )
            ).alias("_best"),
        )
        .select(
            "customer_id",
            "n_memberships",
            "first_membership_start",
            "_any_act",
            F.col("_best.membership_name").alias("membership_name"),
            F.col("_best._sd").alias("membership_start_date"),
            F.col("_best.membership_end_date").alias("membership_end_date"),
        )
    )
    # parent contact for the coalesce columns (children have no own email)
    parents = cust.select(
        F.col("customer_id").alias("p_id"),
        F.col("email_normalized").alias("parent_email"),
        F.col("phone_e164").alias("parent_phone"),
    )
    kids = (
        cust.filter(F.col("is_child"))
        .groupBy(F.col("parent_customer_id").alias("customer_id"))
        .agg(
            F.count("*").alias("n_children"),
            F.array_join(F.sort_array(F.collect_list("customer_id")), ",").alias(
                "child_customer_ids"
            ),
        )
    )
    flags = (
        build_flags(spark, sf_dir)
        .filter(F.col("is_active"))
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("n_active_flags"),
            F.array_join(F.sort_array(F.collect_set("flag_type")), ",").alias("active_flags"),
        )
    )

    from .customers import family_relationships

    fam_conf = family_relationships(spark, sf_dir).select(
        F.col("parent_customer_id").alias("fc_parent"),
        F.col("child_customer_id").alias("customer_id"),
        F.col("confidence").alias("family_link_confidence"),
    )

    joined = (
        cust.select(
            "customer_id",
            "first_name",
            "last_name",
            "email_normalized",
            "phone_e164",
            "is_child",
            "parent_customer_id",
            "nation",
            "segment",
        )
        .join(visits, "customer_id", "left")
        .join(spend, "customer_id", "left")
        .join(mem, "customer_id", "left")
        .join(kids, "customer_id", "left")
        .join(flags, "customer_id", "left")
        .join(parents, F.col("parent_customer_id") == F.col("p_id"), "left")
        .join(
            fam_conf,
            (F.col("parent_customer_id") == F.col("fc_parent"))
            & (cust.customer_id == fam_conf.customer_id),
            "left",
        )
        .drop(fam_conf.customer_id)
    )

    has_active = F.coalesce("_any_act", F.lit(0)) == 1
    ever_member = F.coalesce("n_memberships", F.lit(0)) > 0
    is_lapsed = ever_member & ~has_active
    contact_email = F.coalesce("email_normalized", "parent_email")
    lead_source = F.when(
        is_lapsed & F.col("first_lead_source").isNull(), F.lit("Lapsed Member")
    ).otherwise(F.col("first_lead_source"))

    return joined.select(
        "customer_id",
        "first_name",
        "last_name",
        F.concat_ws(" ", "first_name", "last_name").alias("primary_name"),
        "email_normalized",
        "phone_e164",
        "parent_email",
        "parent_phone",
        contact_email.alias("contact_email"),
        F.coalesce("phone_e164", "parent_phone").alias("contact_phone"),
        (
            F.col("email_normalized").isNull() & F.col("parent_email").isNotNull()
        ).alias("is_using_parent_contact"),
        "is_child",
        "parent_customer_id",
        "family_link_confidence",
        "nation",
        "segment",
        F.coalesce("total_visits", F.lit(0)).alias("total_visits"),
        "first_visit_date",
        "last_visit_date",
        F.datediff(as_of, F.col("last_visit_date")).alias("days_since_last_visit"),
        F.coalesce("total_txns", F.lit(0)).alias("total_txns"),
        F.coalesce("net_spend", F.lit(0.0)).alias("net_spend"),
        F.coalesce("day_passes_bought", F.lit(0)).alias("day_passes_bought"),
        F.coalesce("n_memberships", F.lit(0)).alias("n_memberships"),
        "first_membership_start",
        has_active.alias("has_active_membership"),
        ever_member.alias("ever_had_membership"),
        is_lapsed.alias("is_lapsed_member"),
        "membership_name",
        "membership_start_date",
        "membership_end_date",
        F.col("membership_start_date").alias("conversion_date"),
        lead_source.alias("lead_source"),
        (
            (F.col("first_lead_source").isNotNull() | is_lapsed) & ~has_active
        ).alias("is_lead"),
        F.coalesce("n_children", F.lit(0)).alias("n_children"),
        (F.coalesce("n_children", F.lit(0)) > 0).alias("has_youth"),
        "child_customer_ids",
        F.coalesce("n_active_flags", F.lit(0)).alias("n_active_flags"),
        "active_flags",
    ).orderBy("customer_id")


def customer_master_sql() -> str:
    from ..functions.text import map_lookup_sql
    from .customers import customers_sql, family_relationships_sql
    from .events import checkins_sql
    from .flags import build_flags_sql
    from .memberships import memberships_2024_sql
    from .transactions import transactions_sql

    lead_map = map_lookup_sql("entry_method", LEAD_SOURCE_BY_ENTRY, "Event")
    entry_list = ", ".join(f"'{e}'" for e in LEAD_SOURCE_BY_ENTRY)
    return f"""
WITH cust AS ({customers_sql()}),
ck AS ({checkins_sql()}),
txn AS ({transactions_sql()}),
m AS ({memberships_2024_sql()}),
fl AS ({build_flags_sql()}),
famc AS ({family_relationships_sql()}),
visits AS (
  SELECT customer_id, count(*) AS total_visits,
         min(checkin_date) AS first_visit_date, max(checkin_date) AS last_visit_date
  FROM ck GROUP BY customer_id
),
lead_src AS (
  SELECT customer_id, {lead_map} AS first_lead_source
  FROM (
    SELECT customer_id, entry_method,
           row_number() OVER (PARTITION BY customer_id
                              ORDER BY checkin_ts_us, checkin_id) AS rn
    FROM ck WHERE entry_method IN ({entry_list})
  ) WHERE rn = 1
),
spend AS (
  SELECT customer_id, count(*) AS total_txns,
         {sum_money_sql('total_amount')} AS net_spend,
         CAST(sum(day_pass_count) AS BIGINT) AS day_passes_bought
  FROM txn GROUP BY customer_id
),
mem AS (
  SELECT owner_id AS customer_id, count(*) AS n_memberships,
         min(start_date) AS first_membership_start,
         max(CASE WHEN status = 'ACT' THEN 1 ELSE 0 END) AS any_act
  FROM m GROUP BY owner_id
),
best_mem AS (
  SELECT customer_id, membership_name, membership_start_date, membership_end_date
  FROM (
    SELECT owner_id AS customer_id, name AS membership_name,
           start_date AS membership_start_date, end_date AS membership_end_date,
           row_number() OVER (PARTITION BY owner_id
                              ORDER BY (status = 'ACT') DESC, start_date DESC,
                                       membership_id DESC) AS rn
    FROM m
  ) WHERE rn = 1
),
kids AS (
  SELECT parent_customer_id AS customer_id, count(*) AS n_children,
         array_to_string(list_sort(list(customer_id)), ',') AS child_customer_ids
  FROM cust WHERE is_child GROUP BY parent_customer_id
),
flag_agg AS (
  SELECT customer_id, count(*) AS n_active_flags,
         array_to_string(list_sort(list_distinct(list(flag_type))), ',') AS active_flags
  FROM fl WHERE is_active GROUP BY customer_id
)
SELECT c.customer_id, c.first_name, c.last_name,
       concat_ws(' ', c.first_name, c.last_name) AS primary_name,
       c.email_normalized, c.phone_e164,
       p.email_normalized AS parent_email,
       p.phone_e164 AS parent_phone,
       coalesce(c.email_normalized, p.email_normalized) AS contact_email,
       coalesce(c.phone_e164, p.phone_e164) AS contact_phone,
       (c.email_normalized IS NULL AND p.email_normalized IS NOT NULL)
         AS is_using_parent_contact,
       c.is_child, c.parent_customer_id,
       fc.confidence AS family_link_confidence,
       c.nation, c.segment,
       coalesce(v.total_visits, 0) AS total_visits,
       v.first_visit_date, v.last_visit_date,
       DATE '{MASTER_AS_OF}' - v.last_visit_date AS days_since_last_visit,
       coalesce(s.total_txns, 0) AS total_txns,
       coalesce(s.net_spend, 0.0) AS net_spend,
       coalesce(s.day_passes_bought, 0) AS day_passes_bought,
       coalesce(mm.n_memberships, 0) AS n_memberships,
       mm.first_membership_start,
       coalesce(mm.any_act, 0) = 1 AS has_active_membership,
       coalesce(mm.n_memberships, 0) > 0 AS ever_had_membership,
       (coalesce(mm.n_memberships, 0) > 0 AND NOT coalesce(mm.any_act, 0) = 1)
         AS is_lapsed_member,
       b.membership_name, b.membership_start_date, b.membership_end_date,
       b.membership_start_date AS conversion_date,
       CASE WHEN (coalesce(mm.n_memberships, 0) > 0 AND NOT coalesce(mm.any_act, 0) = 1)
                 AND l.first_lead_source IS NULL
            THEN 'Lapsed Member' ELSE l.first_lead_source END AS lead_source,
       ((l.first_lead_source IS NOT NULL
         OR (coalesce(mm.n_memberships, 0) > 0 AND NOT coalesce(mm.any_act, 0) = 1))
        AND NOT coalesce(mm.any_act, 0) = 1) AS is_lead,
       coalesce(k.n_children, 0) AS n_children,
       coalesce(k.n_children, 0) > 0 AS has_youth,
       k.child_customer_ids,
       coalesce(f.n_active_flags, 0) AS n_active_flags,
       f.active_flags
FROM cust c
LEFT JOIN visits v ON v.customer_id = c.customer_id
LEFT JOIN lead_src l ON l.customer_id = c.customer_id
LEFT JOIN spend s ON s.customer_id = c.customer_id
LEFT JOIN mem mm ON mm.customer_id = c.customer_id
LEFT JOIN best_mem b ON b.customer_id = c.customer_id
LEFT JOIN kids k ON k.customer_id = c.customer_id
LEFT JOIN flag_agg f ON f.customer_id = c.customer_id
LEFT JOIN cust p ON p.customer_id = c.parent_customer_id
LEFT JOIN famc fc ON fc.parent_customer_id = c.parent_customer_id
                 AND fc.child_customer_id = c.customer_id
ORDER BY c.customer_id
"""


def rsvp_party_attendees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14: RSVP→party equi join (reference build_leads_table.py:380-387 —
    attendees enriched with ``party_date`` / host from the parties table).

    Parties = orders (party_id, host, party_date); RSVPs = lineitem rows
    (party_id, attendee).  Attendees gain the party's date and host plus the
    party's attendee count.  Scale: big-big single-key equi join on
    party_id — the same orderkey both sides are bucketed on at rest (see
    tests/test_bucketing.py), so at 100 TB this is a shuffle-free
    sort-merge join; the count is a window over the same key, reusing the
    join's partitioning (no extra shuffle).
    """
    parties = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("party_id"),
        F.col("o_custkey").alias("host_customer_id"),
        F.col("o_orderdate").alias("party_date"),
    )
    rsvps = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("party_id"),
        F.col("l_linenumber").alias("rsvp_seq"),
        F.col("l_suppkey").alias("attendee_id"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("party_id")
    return (
        rsvps.join(parties, "party_id")
        .withColumn("party_attendees", F.count("*").over(w))
        .select(
            "party_id",
            "rsvp_seq",
            "attendee_id",
            "host_customer_id",
            "party_date",
            "party_attendees",
        )
        .orderBy("party_id", "rsvp_seq")
    )


def rsvp_party_attendees_sql() -> str:
    return """
SELECT l.l_orderkey                                   AS party_id,
       l.l_linenumber                                 AS rsvp_seq,
       l.l_suppkey                                    AS attendee_id,
       o.o_custkey                                    AS host_customer_id,
       o.o_orderdate                                  AS party_date,
       count(*) OVER (PARTITION BY l.l_orderkey)      AS party_attendees
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
ORDER BY party_id, rsvp_seq
"""


def lead_timelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer event timeline string + summary stats from the unified
    event log (the reference's timeline JSON array, rendered as an ordered
    'date:type' string so both engines hash identically)."""
    from .flags import events_unified

    ev = events_unified(spark, sf_dir)
    # ONE collect_list + sort per customer; the rendered string and the
    # JSON form are projections over the same sorted array (formerly two
    # independent collect_list aggregates doubled the aggregation state
    # and sorted twice)
    return (
        ev.groupBy("customer_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "checkin", 1)).alias("n_checkins"),
            F.count(F.when(F.col("event_type").endswith("purchase"), 1)).alias("n_purchases"),
            F.count(F.when(F.col("event_type") == "refund", 1)).alias("n_refunds"),
            F.min("event_date").alias("first_event_date"),
            F.max("event_date").alias("last_event_date"),
            sum_money(F.col("amount")).alias("total_amount"),
            F.sort_array(
                F.collect_list(F.struct("event_date", "event_type"))
            ).alias("_tl"),
        )
        .select(
            "customer_id",
            "n_events",
            "n_checkins",
            "n_purchases",
            "n_refunds",
            "first_event_date",
            "last_event_date",
            "total_amount",
            F.array_join(
                F.transform(
                    F.col("_tl"),
                    lambda s: F.concat_ws(
                        ":", s["event_date"].cast("string"), s["event_type"]
                    ),
                ),
                "|",
            ).alias("timeline"),
            F.to_json(F.col("_tl")).alias("timeline_json"),
        )
        .orderBy("customer_id")
    )


def lead_timelines_sql() -> str:
    from .flags import events_unified_sql

    return f"""
WITH ev AS ({events_unified_sql()})
SELECT customer_id,
       count(*) AS n_events,
       count(CASE WHEN event_type = 'checkin' THEN 1 END) AS n_checkins,
       count(CASE WHEN event_type LIKE '%purchase' THEN 1 END) AS n_purchases,
       count(CASE WHEN event_type = 'refund' THEN 1 END) AS n_refunds,
       min(event_date) AS first_event_date,
       max(event_date) AS last_event_date,
       {sum_money_sql('amount')} AS total_amount,
       string_agg(event_date || ':' || event_type, '|'
                  ORDER BY event_date, event_type) AS timeline,
       to_json(list_sort(list(struct_pack(event_date := event_date,
                                          event_type := event_type))))::varchar
         AS timeline_json
FROM ev
GROUP BY customer_id
ORDER BY customer_id
"""


def timeline_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON round-trip consumer (reference build_leads_table.py:646 writes the
    timeline as a JSON string; downstream reads parse it back —
    customer_flags_config.py:1109 json.loads on event_details).  Parses the
    timeline_json emitted by :func:`lead_timelines` with ``from_json`` and
    derives summary fields from the PARSED array, proving the round trip."""
    tl = lead_timelines(spark, sf_dir)
    parsed = F.from_json(
        F.col("timeline_json"), "array<struct<event_date:date,event_type:string>>"
    )
    return (
        tl.select("customer_id", parsed.alias("p"))
        .select(
            "customer_id",
            F.size("p").alias("n_parsed"),
            F.col("p")[0]["event_type"].alias("first_event_type"),
            F.element_at("p", -1)["event_date"].alias("last_event_date_parsed"),
        )
        .orderBy("customer_id")
    )


def timeline_json_parse_sql() -> str:
    return f"""
WITH tl AS ({lead_timelines_sql()})
SELECT customer_id,
       json_array_length(timeline_json) AS n_parsed,
       json_extract_string(timeline_json, '$[0].event_type') AS first_event_type,
       json_extract_string(timeline_json,
         '$[' || (json_array_length(timeline_json) - 1) || '].event_date')::date
         AS last_event_date_parsed
FROM tl
ORDER BY customer_id
"""


# acquisition-channel classification (reference build_leads_table.py:480-580):
# how a customer FIRST came in as a non-member.  Checkin entry methods map via
# LEAD_SOURCE_BY_ENTRY; purchase categories map here.  Internal events
# (membership lifecycle, refunds) are never sources.
LEAD_SOURCE_BY_CATEGORY = {
    "Day Pass": "Day Pass",
    "Retail": "Shopify",
    "Programming": "Programming",
    "Event Booking": "Event",
}


def leads_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dedicated leads output (build_leads_table.py:411-649):
    one row per customer with lead-type activity, with acquisition source,
    activity/visit/spend summary, conversion + lapse tracking, and contact
    info coalesced from the parent for children.

    Spark shape: every block is a per-customer aggregate (map-side partial
    agg + one shuffle on customer_id each), joined on customer_id; the
    first-acquisition pick is a min(struct) aggregate over the filtered
    acquisition-event union.  No collect, no UDFs; at 100 TB all joins
    co-hash on customer_id.
    """
    from ..functions.text import map_lookup
    from .customers import build_customers
    from .events import build_checkins
    from .flags import events_unified
    from .memberships import build_memberships_2024
    from .transactions import build_transactions

    as_of = F.lit(MASTER_AS_OF).cast("date")
    cust = build_customers(spark, sf_dir)
    ck = build_checkins(spark, sf_dir)
    txn = build_transactions(spark, sf_dir)

    # acquisition events: checkin entry methods first (priority 0), then
    # purchase categories (priority 1); first chronological wins
    acq_ck = ck.filter(F.col("entry_method").isin(*LEAD_SOURCE_BY_ENTRY)).select(
        "customer_id",
        F.col("checkin_date").alias("acq_date"),
        F.lit(0).alias("acq_priority"),
        map_lookup(F.col("entry_method"), LEAD_SOURCE_BY_ENTRY, "Event").alias("acq_source"),
    )
    acq_txn = (
        txn.filter(
            (~F.col("is_refund"))
            & F.col("revenue_category").isin(*LEAD_SOURCE_BY_CATEGORY)
        ).select(
            "customer_id",
            F.col("txn_date").alias("acq_date"),
            F.lit(1).alias("acq_priority"),
            map_lookup(
                F.col("revenue_category"), LEAD_SOURCE_BY_CATEGORY, "Other"
            ).alias("acq_source"),
        )
    )
    # first chronological acquisition = min(struct(date, priority, source)):
    # partial-aggregable (map-side combine on both union branches) where the
    # row_number window sorted the whole acquisition-event union per customer
    lead_src = (
        acq_ck.unionByName(acq_txn)
        .groupBy("customer_id")
        .agg(F.min(F.struct("acq_date", "acq_priority", "acq_source")).alias("_a"))
        .select("customer_id", F.col("_a.acq_source").alias("lead_source"))
    )

    visits = ck.groupBy("customer_id").agg(
        F.count("*").alias("total_visits"),
        F.count(F.when(F.col("checkin_date") >= F.date_sub(as_of, 30), 1)).alias(
            "visit_count_last_30d"
        ),
    )
    ev = events_unified(spark, sf_dir)
    activity = ev.groupBy("customer_id").agg(
        F.count("*").alias("timeline_event_count"),
        F.min("event_date").alias("first_activity_date"),
        F.max("event_date").alias("last_activity_date"),
        sum_money(F.col("amount")).alias("total_spend"),
    )
    mem = (
        build_memberships_2024(spark, sf_dir)
        .groupBy(F.col("owner_id").alias("customer_id"))
        .agg(
            F.max(F.col("status") == "ACT").alias("has_active_membership"),
            F.min("start_date").alias("conversion_date"),
            F.max(F.when(F.col("status") == "END", F.col("end_date"))).alias(
                "membership_end_date"
            ),
        )
    )
    parents = cust.select(
        F.col("customer_id").alias("p_id"),
        F.col("email_normalized").alias("p_email"),
        F.col("phone_e164").alias("p_phone"),
    )
    out = (
        lead_src.join(cust, "customer_id")
        .join(parents, F.col("parent_customer_id") == F.col("p_id"), "left")
        .join(activity, "customer_id", "left")
        .join(visits, "customer_id", "left")
        .join(mem, "customer_id", "left")
    )
    converted = F.col("conversion_date").isNotNull()
    active = F.coalesce(F.col("has_active_membership"), F.lit(False))
    return out.select(
        "customer_id",
        "first_name",
        "last_name",
        F.coalesce("email_normalized", "p_email").alias("email"),
        F.coalesce("phone_e164", "p_phone").alias("phone"),
        "is_child",
        "parent_customer_id",
        "lead_source",
        "first_activity_date",
        "last_activity_date",
        F.datediff(as_of, F.col("last_activity_date")).alias("days_since_last_activity"),
        F.coalesce("total_visits", F.lit(0)).alias("total_visits"),
        F.coalesce("visit_count_last_30d", F.lit(0)).alias("visit_count_last_30d"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        active.alias("has_active_membership"),
        converted.alias("converted_to_member"),
        "conversion_date",
        (converted & ~active).alias("is_lapsed_member"),
        "membership_end_date",
        F.coalesce("timeline_event_count", F.lit(0)).alias("timeline_event_count"),
    ).orderBy("customer_id")


def leads_table_sql() -> str:
    from ..functions.text import map_lookup_sql
    from .customers import customers_sql
    from .events import checkins_sql
    from .flags import events_unified_sql
    from .memberships import memberships_2024_sql
    from .transactions import transactions_sql

    as_of = f"DATE '{MASTER_AS_OF}'"
    entry_map = map_lookup_sql("entry_method", LEAD_SOURCE_BY_ENTRY, "Event")
    entry_list = ", ".join(f"'{e}'" for e in LEAD_SOURCE_BY_ENTRY)
    cat_map = map_lookup_sql("revenue_category", LEAD_SOURCE_BY_CATEGORY, "Other")
    cat_list = ", ".join(f"'{c}'" for c in LEAD_SOURCE_BY_CATEGORY)
    return f"""
WITH cust AS ({customers_sql()}),
ck AS ({checkins_sql()}),
txn AS ({transactions_sql()}),
m AS ({memberships_2024_sql()}),
ev AS ({events_unified_sql()}),
acq AS (
  SELECT customer_id, checkin_date AS acq_date, 0 AS acq_priority,
         {entry_map} AS acq_source
  FROM ck WHERE entry_method IN ({entry_list})
  UNION ALL
  SELECT customer_id, txn_date, 1, {cat_map}
  FROM txn WHERE NOT is_refund AND revenue_category IN ({cat_list})
),
lead_src AS (
  SELECT customer_id, acq_source AS lead_source FROM (
    SELECT customer_id, acq_source,
           row_number() OVER (PARTITION BY customer_id
                              ORDER BY acq_date, acq_priority, acq_source) AS rn
    FROM acq
  ) WHERE rn = 1
),
visits AS (
  SELECT customer_id, count(*) AS total_visits,
         count(CASE WHEN checkin_date >= {as_of} - 30 THEN 1 END)
           AS visit_count_last_30d
  FROM ck GROUP BY customer_id
),
activity AS (
  SELECT customer_id, count(*) AS timeline_event_count,
         min(event_date) AS first_activity_date,
         max(event_date) AS last_activity_date,
         {sum_money_sql('amount')} AS total_spend
  FROM ev GROUP BY customer_id
),
mem AS (
  SELECT owner_id AS customer_id,
         bool_or(status = 'ACT') AS has_active_membership,
         min(start_date) AS conversion_date,
         max(CASE WHEN status = 'END' THEN end_date END) AS membership_end_date
  FROM m GROUP BY owner_id
)
SELECT ls.customer_id, first_name, last_name,
       coalesce(email_normalized, p.p_email) AS email,
       coalesce(phone_e164, p.p_phone) AS phone,
       is_child, parent_customer_id, lead_source,
       first_activity_date, last_activity_date,
       CAST({as_of} - last_activity_date AS INT) AS days_since_last_activity,
       coalesce(total_visits, 0) AS total_visits,
       coalesce(visit_count_last_30d, 0) AS visit_count_last_30d,
       coalesce(total_spend, 0.0) AS total_spend,
       coalesce(has_active_membership, false) AS has_active_membership,
       conversion_date IS NOT NULL AS converted_to_member,
       conversion_date,
       (conversion_date IS NOT NULL AND NOT coalesce(has_active_membership, false))
         AS is_lapsed_member,
       membership_end_date,
       coalesce(timeline_event_count, 0) AS timeline_event_count
FROM lead_src ls
JOIN cust c ON ls.customer_id = c.customer_id
LEFT JOIN (SELECT customer_id AS p_id, email_normalized AS p_email,
                  phone_e164 AS p_phone FROM cust) p
       ON c.parent_customer_id = p.p_id
LEFT JOIN activity a ON ls.customer_id = a.customer_id
LEFT JOIN visits v ON ls.customer_id = v.customer_id
LEFT JOIN mem mm ON ls.customer_id = mm.customer_id
ORDER BY ls.customer_id
"""
