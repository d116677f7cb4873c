"""Checkin/event-stream domain: window functions, sessionization, proximity.

Realizes the reference's checkin analytics (FIXTURES.md F2: the driver's
``events`` table is the checkin stream — user_id → customer_id, ts →
checkin_datetime, event_type → entry_method bucket) and re-expresses the
reference's per-customer iterrows loops as window functions:

- visit_number (reference build_conversion_rate_analysis.py:203-207)
- rolling 60-day visit counts (:209-218)
- recency buckets via lag (build_day_pass_engagement_table.py:149-296)
- trailing multi-horizon counts (:114-121)
- proximity pair joins (build_customer_interactions.py:123-177 — 30-min
  same-day co-checkins) with the connections-style strength rollup
  (build_customer_connections.py:17-114)
- gap-based sessions / returning-after-break (customer_flags_config.py:284-295)

Determinism: every window orders by (ts, event_id) — event_id is unique, so
ranks are stable under any partitioning (SURVEY.md §4.3).

Scale notes: all windows partition by customer — one shuffle on user_id that
AQE can coalesce; the proximity self-join is blocked on (event_type, date)
exactly like the reference's group-then-probe (SURVEY.md §4.1), keeping the
band predicate inside small equi-join buckets; at 100 TB add date-bucket
salting for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config
from ..functions.money import dec38, money, money_sql, sum_money, sum_money_sql
from ..functions.text import map_lookup, map_lookup_sql
from ..io import load_table, materialized

SESSION_GAP_SECONDS = 1800
DAY_US = 86_400_000_000

# ---------------------------------------------------------------------------
# builder (F2)
# ---------------------------------------------------------------------------


@materialized("checkins")
def build_checkins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkin stream from events.  Timestamps exposed as epoch-micros BIGINT
    (cross-engine safe) plus a date column.

    INPUT INVARIANT — unique event_id: the events table's id is its primary
    key (true of the reference's source systems and the driver corpus), so
    this batch path performs no dedup and checkin_id stays unique for every
    downstream grain (a duplicated id would double rows here but collapse
    in GROUP-BY-keyed consumers, silently skewing per-checkin outputs).
    At-least-once FEEDS are the streaming path's concern — the windowed
    stream dedups retransmissions by event_id (events_stream.py); an
    at-least-once batch source must do the same upstream of this builder
    (the keep-first pattern of dedup_transactions)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("checkin_id"),
        F.col("user_id").alias("customer_id"),
        F.unix_micros(F.col("ts")).alias("checkin_ts_us"),
        F.to_date("ts").alias("checkin_date"),
        map_lookup(F.col("event_type"), config.ENTRY_METHOD_BY_EVENT_TYPE, "UNK").alias(
            "entry_method"
        ),
        F.col("event_type"),
        F.get_json_object("props", "$.k").cast("int").alias("engagement_k"),
        money(F.col("value")).alias("spend_amount"),
    )


def checkins_sql() -> str:
    em = map_lookup_sql("event_type", config.ENTRY_METHOD_BY_EVENT_TYPE, "UNK")
    return f"""
SELECT
  event_id                                   AS checkin_id,
  user_id                                    AS customer_id,
  epoch_us(ts::TIMESTAMP)                    AS checkin_ts_us,
  ts::date                                   AS checkin_date,
  {em}                                       AS entry_method,
  event_type,
  json_extract_string(props, '$.k')::int     AS engagement_k,
  {money_sql('value')}                       AS spend_amount
FROM events
"""


# ---------------------------------------------------------------------------
# window analytics
# ---------------------------------------------------------------------------


def visit_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: all-time visit sequence number per customer."""
    ck = build_checkins(spark, sf_dir)
    w = Window.partitionBy("customer_id").orderBy("checkin_ts_us", "checkin_id")
    return ck.select(
        "customer_id",
        "checkin_id",
        "checkin_date",
        "entry_method",
        F.row_number().over(w).alias("visit_number"),
    )


def visit_numbers_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()})
SELECT customer_id, checkin_id, checkin_date, entry_method,
       row_number() OVER (PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id) AS visit_number
FROM ck
"""


def rolling_60d_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: visits in the trailing 60 days (inclusive) per customer at each
    checkin (reference visit_num_60d)."""
    ck = build_checkins(spark, sf_dir)
    w = (
        Window.partitionBy("customer_id")
        .orderBy("checkin_ts_us")
        .rangeBetween(-60 * DAY_US, 0)
    )
    return ck.select(
        "customer_id",
        "checkin_id",
        "checkin_date",
        F.count("*").over(w).alias("visits_60d"),
    )


def rolling_60d_visits_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()})
SELECT customer_id, checkin_id, checkin_date,
       count(*) OVER (
         PARTITION BY customer_id ORDER BY checkin_ts_us
         RANGE BETWEEN {60 * DAY_US} PRECEDING AND CURRENT ROW
       ) AS visits_60d
FROM ck
"""


def recency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: days since previous checkin → New / 0-2mo / 2-6mo / 6+mo buckets
    (reference recency classification, build_day_pass_engagement_table.py:149-296)."""
    ck = build_checkins(spark, sf_dir)
    w = Window.partitionBy("customer_id").orderBy("checkin_ts_us", "checkin_id")
    prev = F.lag("checkin_ts_us").over(w)
    days = F.expr(f"(checkin_ts_us - prev_ts_us) div {DAY_US}")
    return (
        ck.withColumn("prev_ts_us", prev)
        .withColumn("days_since_prev", days)
        .select(
            "customer_id",
            "checkin_id",
            "checkin_date",
            "days_since_prev",
            F.when(F.col("days_since_prev").isNull(), "New")
            .when(F.col("days_since_prev") < 60, "0-2mo")
            .when(F.col("days_since_prev") < 180, "2-6mo")
            .otherwise("6+mo")
            .alias("recency_bucket"),
        )
    )


def recency_buckets_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()}),
lagged AS (
  SELECT customer_id, checkin_id, checkin_date,
         (checkin_ts_us - lag(checkin_ts_us) OVER (
            PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id)) // {DAY_US}
         AS days_since_prev
  FROM ck
)
SELECT customer_id, checkin_id, checkin_date, days_since_prev,
       CASE WHEN days_since_prev IS NULL THEN 'New'
            WHEN days_since_prev < 60 THEN '0-2mo'
            WHEN days_since_prev < 180 THEN '2-6mo'
            ELSE '6+mo' END AS recency_bucket
FROM lagged
"""


def trailing_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: per-customer visits in the trailing 2/6/12 months as of a fixed
    as_of date (reference build_day_pass_engagement_table.py:114-121), plus
    first/last checkin dates (W5)."""
    from ..functions.datetime_utils import AS_OF_DEFAULT, as_of_lit

    ck = build_checkins(spark, sf_dir)
    as_of_us = F.unix_micros(as_of_lit(AS_OF_DEFAULT))
    return ck.groupBy("customer_id").agg(
        F.count("*").alias("visits_total"),
        F.count(F.when(F.col("checkin_ts_us") >= as_of_us - 60 * DAY_US, 1)).alias("visits_2mo"),
        F.count(F.when(F.col("checkin_ts_us") >= as_of_us - 180 * DAY_US, 1)).alias("visits_6mo"),
        F.count(F.when(F.col("checkin_ts_us") >= as_of_us - 365 * DAY_US, 1)).alias("visits_12mo"),
        F.min("checkin_date").alias("first_checkin_date"),
        F.max("checkin_date").alias("last_checkin_date"),
        sum_money(F.col("spend_amount")).alias("total_spend"),
    )


def trailing_window_counts_sql() -> str:
    from ..functions.datetime_utils import AS_OF_DEFAULT, as_of_sql

    as_of = f"epoch_us({as_of_sql(AS_OF_DEFAULT)})"
    return f"""
WITH ck AS ({checkins_sql()})
SELECT customer_id,
       count(*) AS visits_total,
       count(CASE WHEN checkin_ts_us >= {as_of} - {60 * DAY_US} THEN 1 END) AS visits_2mo,
       count(CASE WHEN checkin_ts_us >= {as_of} - {180 * DAY_US} THEN 1 END) AS visits_6mo,
       count(CASE WHEN checkin_ts_us >= {as_of} - {365 * DAY_US} THEN 1 END) AS visits_12mo,
       min(checkin_date) AS first_checkin_date,
       max(checkin_date) AS last_checkin_date,
       {sum_money_sql('spend_amount')} AS total_spend
FROM ck
GROUP BY customer_id
"""


def entry_method_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: value_counts of entry methods, descending (deterministic
    tie-break on the label)."""
    ck = build_checkins(spark, sf_dir)
    return (
        ck.groupBy("entry_method")
        .agg(F.count("*").alias("n"), F.countDistinct("customer_id").alias("n_customers"))
        .orderBy(F.desc("n"), "entry_method")
    )


def entry_method_counts_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()})
SELECT entry_method, count(*) AS n, count(DISTINCT customer_id) AS n_customers
FROM ck GROUP BY entry_method ORDER BY n DESC, entry_method
"""


def daily_checkin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4 on the stream: daily checkins + distinct customers + spend."""
    ck = build_checkins(spark, sf_dir)
    return (
        ck.groupBy("checkin_date")
        .agg(
            F.count("*").alias("checkins"),
            F.countDistinct("customer_id").alias("active_customers"),
            sum_money(F.col("spend_amount")).alias("spend"),
        )
        .orderBy("checkin_date")
    )


def daily_checkin_stats_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()})
SELECT checkin_date, count(*) AS checkins,
       count(DISTINCT customer_id) AS active_customers,
       {sum_money_sql('spend_amount')} AS spend
FROM ck GROUP BY checkin_date ORDER BY checkin_date
"""


# ---------------------------------------------------------------------------
# proximity pairs (J8) + connections rollup (A10)
# ---------------------------------------------------------------------------


@materialized("proximity")
def proximity_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-day, same-entry-type co-checkins within 30 minutes → pair edges
    with strength buckets.  The self-join is blocked on (event_type, date)
    before the band predicate — the reference's group-then-probe
    (build_family_relationships.py:403-416) as explicit equi-join keys.

    Materialized: the pair table is the edge list of the co-presence
    graph — pagerank_proximity and triangle_stats scan it, so one build
    serves three queries per session (the reference likewise stores its
    connections table; config.py catalog)."""
    window_us = config.INTERACTION_PROXIMITY_SECONDS * 1_000_000
    ck = build_checkins(spark, sf_dir).select(
        "customer_id",
        "checkin_id",
        "checkin_date",
        "checkin_ts_us",
        "event_type",
        F.floor(F.col("checkin_ts_us") / window_us).alias("tbucket"),
    )
    # candidate generation joins on (event_type, time bucket): any pair
    # within the window sits in the same or an adjacent window-sized bucket,
    # so probing {t-1, t, t+1} makes the join fully equi — candidates scale
    # with bucket occupancy, not day occupancy (the day-block variant is
    # quadratic in events-per-day, which melts at 100 TB).  The band + date
    # predicates below remain the semantic definition.
    a = ck.alias("a")
    b = ck.withColumn(
        "probe", F.explode(F.array(F.col("tbucket") - 1, F.col("tbucket"), F.col("tbucket") + 1))
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.tbucket") == F.col("b.probe"))
        & (F.col("a.checkin_date") == F.col("b.checkin_date"))
        & (F.col("a.customer_id") < F.col("b.customer_id"))
        & (
            F.abs(F.col("a.checkin_ts_us") - F.col("b.checkin_ts_us"))
            <= window_us
        ),
    )
    agg = pairs.groupBy(
        F.col("a.customer_id").alias("customer_id_1"),
        F.col("b.customer_id").alias("customer_id_2"),
    ).agg(
        F.count("*").alias("n_copresent"),
        F.min(F.col("a.checkin_date")).alias("first_date"),
        F.max(F.col("a.checkin_date")).alias("last_date"),
        F.sort_array(F.collect_set(F.col("a.event_type"))).alias("_types"),
    )
    return agg.select(
        "customer_id_1",
        "customer_id_2",
        "n_copresent",
        "first_date",
        "last_date",
        F.array_join("_types", ",").alias("interaction_types"),
        F.when(F.col("n_copresent") >= 10, 5)
        .when(F.col("n_copresent") >= 5, 4)
        .when(F.col("n_copresent") >= 3, 3)
        .when(F.col("n_copresent") >= 2, 2)
        .otherwise(1)
        .alias("strength_score"),
    )


def proximity_connections_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()}),
pairs AS (
  SELECT a.customer_id AS customer_id_1, b.customer_id AS customer_id_2,
         a.checkin_date, a.event_type
  FROM ck a JOIN ck b
    ON a.event_type = b.event_type
   AND a.checkin_date = b.checkin_date
   AND a.customer_id < b.customer_id
   AND abs(a.checkin_ts_us - b.checkin_ts_us) <= {config.INTERACTION_PROXIMITY_SECONDS * 1_000_000}
)
SELECT customer_id_1, customer_id_2,
       count(*) AS n_copresent,
       min(checkin_date) AS first_date,
       max(checkin_date) AS last_date,
       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS interaction_types,
       CASE WHEN count(*) >= 10 THEN 5
            WHEN count(*) >= 5 THEN 4
            WHEN count(*) >= 3 THEN 3
            WHEN count(*) >= 2 THEN 2
            ELSE 1 END AS strength_score
FROM pairs
GROUP BY customer_id_1, customer_id_2
"""


# ---------------------------------------------------------------------------
# sessions (ST6)
# ---------------------------------------------------------------------------


def checkin_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event exceeds 30 minutes.  lag → boundary flag → cumulative sum
    (the standard batch re-expression of session windows)."""
    ck = build_checkins(spark, sf_dir)
    w = Window.partitionBy("customer_id").orderBy("checkin_ts_us", "checkin_id")
    gap = F.col("checkin_ts_us") - F.lag("checkin_ts_us").over(w)
    with_flag = ck.withColumn(
        "is_new_session",
        (gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000)).cast("int"),
    )
    wsum = (
        Window.partitionBy("customer_id")
        .orderBy("checkin_ts_us", "checkin_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = with_flag.withColumn("session_seq", F.sum("is_new_session").over(wsum))
    return (
        sessions.groupBy("customer_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("checkin_ts_us").alias("session_start_us"),
            F.max("checkin_ts_us").alias("session_end_us"),
            sum_money(F.col("spend_amount")).alias("session_spend"),
        )
        .withColumn(
            "duration_min",
            F.expr("(session_end_us - session_start_us) div 60000000"),
        )
    )


def checkin_sessions_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()}),
flagged AS (
  SELECT *, CASE WHEN lag(checkin_ts_us) OVER w IS NULL
                   OR checkin_ts_us - lag(checkin_ts_us) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
                 THEN 1 ELSE 0 END AS is_new_session
  FROM ck
  WINDOW w AS (PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id)
),
sessioned AS (
  SELECT *, CAST(sum(is_new_session) OVER (
      PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT customer_id, session_seq, count(*) AS n_events,
       min(checkin_ts_us) AS session_start_us,
       max(checkin_ts_us) AS session_end_us,
       {sum_money_sql('spend_amount')} AS session_spend,
       (max(checkin_ts_us) - min(checkin_ts_us)) // 60000000 AS duration_min
FROM sessioned
GROUP BY customer_id, session_seq
"""


def returning_after_break(
    spark: SparkSession, sf_dir: str, break_days: int = 2
) -> DataFrame:
    """Customers who returned after a break (reference returning_after_2_months
    flag, customer_flags_config.py:284-295, a 60-day break).  The synthetic
    stream spans ~1 month, so the registered query uses a 2-day break; the
    semantics (lag + gap filter) are identical at any threshold."""
    ck = build_checkins(spark, sf_dir)
    w = Window.partitionBy("customer_id").orderBy("checkin_ts_us", "checkin_id")
    gap_days = F.expr(f"(checkin_ts_us - prev_us) div {DAY_US}")
    gaps = ck.withColumn("prev_us", F.lag("checkin_ts_us").over(w)).withColumn(
        "gap_days", gap_days
    )
    return (
        gaps.filter(F.col("gap_days") >= break_days)
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("n_breaks"),
            F.max("gap_days").alias("max_gap_days"),
            F.max("checkin_date").alias("latest_return_date"),
        )
    )


def returning_after_break_sql(break_days: int = 2) -> str:
    return f"""
WITH ck AS ({checkins_sql()}),
gaps AS (
  SELECT customer_id, checkin_date,
         (checkin_ts_us - lag(checkin_ts_us) OVER (
            PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id)) // {DAY_US} AS gap_days
  FROM ck
)
SELECT customer_id, count(*) AS n_breaks, max(gap_days) AS max_gap_days,
       max(checkin_date) AS latest_return_date
FROM gaps
WHERE gap_days >= {break_days}
GROUP BY customer_id
"""


# ---------------------------------------------------------------------------
# native session windows (F.session_window batch aggregation)
# ---------------------------------------------------------------------------


def native_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with Spark's built-in ``session_window`` aggregation —
    the declarative form of :func:`checkin_sessions`' lag → flag → cumsum
    pipeline, and the one that carries over verbatim to Structured
    Streaming (a streaming groupBy(session_window) keeps per-key open
    sessions as state and closes them on watermark advance).

    Boundary semantics differ from the lag formulation by one equality:
    ``session_window`` merges two events iff their gap is STRICTLY less
    than the gap duration (the window is [ts, ts+gap)), while the lag
    pipeline starts a new session on gap > threshold; the oracle pins the
    native semantics (``diff >= gap`` → new session).

    Scale shape: one shuffle on customer_id; the session merge runs
    inside the per-key sort Spark already does for the aggregation — no
    window-function pass, no self-join."""
    ck = build_checkins(spark, sf_dir)
    sw = F.session_window(
        F.timestamp_micros(F.col("checkin_ts_us")), f"{SESSION_GAP_SECONDS} seconds"
    )
    return (
        ck.groupBy("customer_id", sw.alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("checkin_ts_us").alias("session_start_us"),
            F.max("checkin_ts_us").alias("session_end_us"),
            sum_money(F.col("spend_amount")).alias("session_spend"),
        )
        .select(
            "customer_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "session_spend",
        )
        .orderBy("customer_id", "session_start_us")
    )


def native_session_windows_sql() -> str:
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    return f"""
WITH ck AS ({checkins_sql()}),
flagged AS (
  SELECT *, CASE WHEN lag(checkin_ts_us) OVER w IS NULL
                   OR checkin_ts_us - lag(checkin_ts_us) OVER w >= {gap_us}
                 THEN 1 ELSE 0 END AS is_new_session
  FROM ck
  WINDOW w AS (PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id)
),
sessioned AS (
  SELECT *, sum(is_new_session) OVER (
      PARTITION BY customer_id ORDER BY checkin_ts_us, checkin_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT customer_id,
       min(checkin_ts_us) AS session_start_us,
       max(checkin_ts_us) AS session_end_us,
       count(*) AS n_events,
       {sum_money_sql('spend_amount')} AS session_spend
FROM sessioned
GROUP BY customer_id, session_seq
ORDER BY customer_id, session_start_us
"""


# ---------------------------------------------------------------------------
# first/last-touch purchase attribution
# ---------------------------------------------------------------------------

ATTRIBUTION_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback

# total order for the attribution frame: two events can share a microsecond,
# and first/last_value over a tied ORDER BY is physical-order-nondeterministic;
# ts_us * 8 + type_code is a collision-free composite that both engines sort
# identically (max ts_us ~1.7e15, * 8 stays far under 2^63)
_EVENT_TYPE_CODE = "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 5 END"


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the raw event stream: for every purchase,
    the FIRST-touch and LAST-touch non-purchase event types within the
    7-day lookback window, rolled up to a (first_touch, last_touch) →
    purchases matrix.  First/last-touch are the two canonical attribution
    models; the pair matrix shows how much they disagree — the number a
    marketing team actually argues about.  Reference analog: the lead
    funnel's source attribution (build_leads_table.py:30-669 assigns each
    lead ONE source; this generalizes to per-purchase path endpoints).

    Scale shape: one window per user over a RANGE frame (the same shape as
    rolling_60d_visits) — a single shuffle on user_id; the rollup rides on
    a ≤ 5×5 key space.  ``first/last(…, ignorenulls=True)`` over the
    range frame skips interleaved purchases without a second pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    key = (F.col("ts_us") * 8 + F.expr(_EVENT_TYPE_CODE)).alias("ord_key")
    ev = ev.select("user_id", "event_type", key)
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ord_key")
        .rangeBetween(-ATTRIBUTION_WINDOW_US * 8, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = ev.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(wr).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(wr).alias("last_touch"),
    ).filter(F.col("event_type") == "purchase")
    return (
        attributed.groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("first_touch", "last_touch")
    )


def purchase_attribution_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(ts) * 8 + {_EVENT_TYPE_CODE} AS ord_key
  FROM events
),
attributed AS (
  SELECT event_type,
         first_value(CASE WHEN event_type != 'purchase' THEN event_type END
                     IGNORE NULLS) OVER w AS first_touch,
         last_value(CASE WHEN event_type != 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS last_touch
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ord_key
               RANGE BETWEEN {ATTRIBUTION_WINDOW_US * 8} PRECEDING AND 1 PRECEDING)
)
SELECT coalesce(first_touch, 'none') AS first_touch,
       coalesce(last_touch, 'none') AS last_touch,
       count(*) AS n_purchases
FROM attributed
WHERE event_type = 'purchase'
GROUP BY 1, 2
ORDER BY first_touch, last_touch
"""


# ---------------------------------------------------------------------------
# visit streaks (gaps-and-islands)
# ---------------------------------------------------------------------------


def visit_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE visit days per customer — the
    gaps-and-islands idiom: distinct visit dates, a per-customer
    ``row_number`` ordered by date, and the invariant that consecutive
    days share a constant ``date − row_number`` anchor; grouping on the
    anchor yields the islands in one pass, no self-join, no iteration.
    The engagement stat behind "7-day streak" badges, and the remaining
    classic of the sessionization family (checkin_sessions = time-gap
    sessions, native_session_windows = built-in session windows, this =
    calendar-consecutive runs).

    Scale shape: one distinct on (customer, date), one per-customer
    window, two keyed groupBys — every stage rides the customer key."""
    ck = build_checkins(spark, sf_dir)
    days = ck.select("customer_id", F.col("checkin_date").alias("d")).distinct()
    w = Window.partitionBy("customer_id").orderBy("d")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = anchored.groupBy("customer_id", "anchor").agg(
        F.count("*").alias("len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    wbest = Window.partitionBy("customer_id").orderBy(
        F.desc("len"), "streak_start"
    )
    return (
        islands.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "customer_id",
            F.col("len").alias("longest_streak_days"),
            "streak_start",
            "streak_end",
        )
        .orderBy("customer_id")
    )


def visit_streaks_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()}),
days AS (SELECT DISTINCT customer_id, checkin_date AS d FROM ck),
anchored AS (
  SELECT customer_id, d,
         d - CAST(row_number() OVER (PARTITION BY customer_id ORDER BY d) AS INTEGER)
           AS anchor
  FROM days
),
islands AS (
  SELECT customer_id, anchor, count(*) AS len,
         min(d) AS streak_start, max(d) AS streak_end
  FROM anchored GROUP BY customer_id, anchor
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY customer_id
                               ORDER BY len DESC, streak_start) AS rn
  FROM islands
)
SELECT customer_id, len AS longest_streak_days, streak_start, streak_end
FROM best WHERE rn = 1
ORDER BY customer_id
"""


def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness of per-user inter-event times, per event
    type: B = (σ − μ)/(σ + μ) over the gap distribution — B → −1 is a
    metronome (scheduled scraper), B ≈ 0 Poisson (organic), B → 1 heavy
    bursts (bot storms, retransmission floods).  A training-data pipeline
    runs this per source/type to flag machine-generated interaction
    streams before they poison behavioral mixtures; the reference's
    closest surface is its visit-recency segmentation
    (dashboard/dashboard.py:800-829), which buckets the SAME gap variable
    one moment at a time.

    Exactness: gaps are exact int64 microseconds from one lag window
    (ties pinned by event_id); Σgap and Σgap² accumulate in decimal(38)
    (1e9 events × (30d)² stays inside), so μ and σ come from exact
    integer moments and the engines agree bit-for-bit after the single
    micro-rounded projection.  σ + μ = 0 (a type whose every gap is 0)
    pins B to NULL on both engines.

    Scale shape: ONE shuffle — the (user_id, event_type) lag window —
    then a groupBy onto |event types| rows of exact moments.  Nothing
    after the window touches event volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    gaps = ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w)).where(
        F.col("gap_us").isNotNull()
    )
    mom = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum(dec38(F.col("gap_us"))).alias("s"),
        F.sum(dec38(F.col("gap_us")) * dec38(F.col("gap_us"))).alias("s2"),
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    n = dec38(F.col("n_gaps"))
    # population variance from exact moments: (n·Σx² − (Σx)²) / n²
    var_num = n * F.col("s2") - F.col("s") * F.col("s")
    mean_us = F.col("s").cast("double") / F.col("n_gaps").cast("double")
    sd_us = F.sqrt(
        var_num.cast("double")
        / (F.col("n_gaps").cast("double") * F.col("n_gaps").cast("double"))
    )
    b = F.when(
        (sd_us + mean_us) != 0.0, (sd_us - mean_us) / (sd_us + mean_us)
    )
    return mom.select(
        "event_type",
        "n_gaps",
        micro(mean_us / 1000000.0).alias("mean_gap_sec"),
        micro(sd_us / 1000000.0).alias("sd_gap_sec"),
        micro(b).alias("burstiness"),
    ).orderBy("event_type")


def interevent_burstiness_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts::TIMESTAMP) AS ts_us
  FROM events
),
gaps AS (
  SELECT event_type,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts_us, event_id) AS gap_us
  FROM ev
),
mom AS (
  SELECT event_type, count(*) AS n_gaps,
         sum(gap_us::hugeint) AS s,
         sum(gap_us::hugeint * gap_us::hugeint) AS s2
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY event_type
),
stats AS (
  SELECT event_type, n_gaps,
         s::double / n_gaps::double AS mean_us,
         sqrt((n_gaps::hugeint * s2 - s * s)::double
              / (n_gaps::double * n_gaps::double)) AS sd_us
  FROM mom
)
SELECT event_type, n_gaps,
       floor(mean_us / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_sec,
       floor(sd_us / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS sd_gap_sec,
       floor(CASE WHEN (sd_us + mean_us) != 0.0
                  THEN (sd_us - mean_us) / (sd_us + mean_us)
             END * 1000000.0 + 0.5) / 1000000.0 AS burstiness
FROM stats
ORDER BY event_type
"""


FITNESS_ENTRY_METHOD = "EVE"  # event-entry checkins = class attendance


def fitness_class_attendance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly fitness-class attendance — the reference's 'Fitness Class
    Attendance' bars (dashboard/dashboard.py:1674-1716: keyword-filtered
    fitness events, reservations summed per period).  The engine analog
    counts event-entry checkins (entry_method EVE — the Capitan event
    entry code) per month: one filter + one bounded groupBy."""
    ck = build_checkins(spark, sf_dir)
    return (
        ck.filter(F.col("entry_method") == FITNESS_ENTRY_METHOD)
        .groupBy(F.trunc("checkin_date", "month").alias("month"))
        .agg(
            F.count("*").alias("attendance"),
            F.countDistinct("customer_id").alias("unique_attendees"),
        )
        .orderBy("month")
    )


def fitness_class_attendance_sql() -> str:
    return f"""
WITH ck AS ({checkins_sql()})
SELECT date_trunc('month', checkin_date)::date AS month,
       count(*) AS attendance,
       count(DISTINCT customer_id) AS unique_attendees
FROM ck WHERE entry_method = '{FITNESS_ENTRY_METHOD}'
GROUP BY 1
ORDER BY month
"""


def overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion audit per event type: variance/mean of the
    zero-filled daily count series plus the χ² dispersion statistic
    (n−1)·s²/x̄ — the "is this Poisson" pre-flight that decides whether
    daily_anomalies' mean/σ bands are even the right model (D ≫ 1 ⇒
    bursty/overdispersed ⇒ robust or negative-binomial monitoring).

    Exactness: moments are exact integer sums over the per-type dense
    calendar (n·s² = n·Σc² − (Σc)² in DECIMAL per-factor products);
    ratios are single double expressions, micro-rounded; a zero-mean
    type pins D and χ² to NULL.

    Scale shape: one (type, day) collapse, then type-local dense
    calendars — frames are days × types."""
    from ..functions.money import micro, ratio
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count("*").alias("c"))
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = bounds.select(
        "event_type", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    dense = calendar.join(daily, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    m = dense.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(dec38(F.col("c")) * dec38(F.col("c"))).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    # sample variance: (n·Σc² − (Σc)²) / (n(n−1)) — numerator exact
    var_num = (
        dec38(F.col("n")) * F.col("s2") - dec38(F.col("s1")) * dec38(F.col("s1"))
    ).cast("double")
    s2 = var_num / (nd * (nd - 1.0))
    d_index = s2 / mean
    chi2 = (nd - 1.0) * d_index
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        ratio(F.col("s1").cast("double"), nd, 4).alias("mean_daily"),
        F.when(F.col("n") > 1, micro(s2)).alias("var_daily"),
        F.when((F.col("n") > 1) & (F.col("s1") > 0), micro(d_index)).alias(
            "dispersion_index"
        ),
        F.when((F.col("n") > 1) & (F.col("s1") > 0), micro(chi2)).alias("chi2_stat"),
        F.when(
            (F.col("n") > 1) & (F.col("s1") > 0), d_index > 2.0
        ).alias("is_overdispersed"),
    ).orderBy("event_type")


def overdispersion_check_sql() -> str:
    from ..functions.money import micro_sql, ratio_sql

    mean = "(s1::double / n::double)"
    s2 = "((n::hugeint * s2 - s1::hugeint * s1::hugeint)::double / (n::double * (n::double - 1.0)))"
    d = f"({s2} / {mean})"
    return f"""
WITH daily AS (
  SELECT event_type, ts::DATE AS d, count(*) AS c FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
),
calendar AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS d
  FROM bounds
),
dense AS (
  SELECT c.event_type, c.d, coalesce(x.c, 0) AS c
  FROM calendar c LEFT JOIN daily x USING (event_type, d)
),
m AS (
  SELECT event_type, count(*) AS n, sum(c) AS s1,
         sum(c::hugeint * c::hugeint) AS s2
  FROM dense GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       {ratio_sql('s1::double', 'n::double', 4)} AS mean_daily,
       CASE WHEN n > 1 THEN {micro_sql(s2)} END AS var_daily,
       CASE WHEN n > 1 AND s1 > 0 THEN {micro_sql(d)} END AS dispersion_index,
       CASE WHEN n > 1 AND s1 > 0
            THEN {micro_sql(f'(n::double - 1.0) * {d}')} END AS chi2_stat,
       CASE WHEN n > 1 AND s1 > 0 THEN {d} > 2.0 END AS is_overdispersed
FROM m
ORDER BY event_type
"""


PBA_LOOKBACK_US = 7 * 24 * 3_600_000_000  # 7-day attribution window
PBA_FIRST_MICRO = 400_000   # U-shaped 40 / 20 / 40 credit split
PBA_LAST_MICRO = 400_000


def position_based_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every purchase
    distributes 1.0 of credit over its non-purchase touches in the 7-day
    lookback — 40% first touch, 40% last touch, 20% spread over the
    middles (1 touch → 100%, 2 → 50/50) — the fractional-credit model
    beside :func:`purchase_attribution`'s first/last endpoints; the
    per-channel totals are what a budget reallocation actually uses.

    Determinism: credit is assigned in exact MICRO integers (middles get
    floor(200000/(k−2)) each — the ≤ k·1e-6 rounding remainder is
    documented, never redistributed float-wise); per-channel sums are
    integer sums.

    Scale shape: purchases join touches per user within the bounded
    lookback (the proximity-join discipline — equi on user_id, range on
    time); ranking is per-purchase over its ≤ window touches; the rollup
    lands on the ≤ event-type key space."""
    from ..functions.money import ratio
    from ..io import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts_us").alias("t_ts"),
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("touch_id"),
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - PBA_LOOKBACK_US)
    )
    w = Window.partitionBy("purchase_id").orderBy("t_ts", "touch_id")
    wk = Window.partitionBy("purchase_id")
    ranked = pairs.select(
        "purchase_id",
        "channel",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(wk).alias("k"),
    )
    mid_each = F.expr(f"(1000000 - {PBA_FIRST_MICRO} - {PBA_LAST_MICRO}) div (k - 2)")
    credit = (
        F.when(F.col("k") == 1, F.lit(1_000_000))
        .when((F.col("k") == 2) & (F.col("pos") == 1), F.lit(500_000))
        .when((F.col("k") == 2) & (F.col("pos") == 2), F.lit(500_000))
        .when(F.col("pos") == 1, F.lit(PBA_FIRST_MICRO))
        .when(F.col("pos") == F.col("k"), F.lit(PBA_LAST_MICRO))
        .otherwise(mid_each)
    )
    out = ranked.groupBy("channel").agg(
        F.sum(credit.cast("long")).alias("credit_micro"),
        F.countDistinct("purchase_id").alias("n_purchases_touched"),
        F.count("*").alias("n_touches"),
    )
    tot = out.agg(F.sum("credit_micro").alias("t"))
    return (
        out.join(F.broadcast(tot))
        .select(
            "channel",
            (F.col("credit_micro") / 1000000.0).alias("credit"),
            "n_purchases_touched",
            "n_touches",
            F.when(
                F.col("t") > 0,
                ratio(F.col("credit_micro").cast("double"), F.col("t").cast("double"), 6),
            ).alias("credit_share"),
        )
        .orderBy("channel")
    )


def position_based_attribution_sql() -> str:
    from ..functions.money import ratio_sql

    mid = 1_000_000 - PBA_FIRST_MICRO - PBA_LAST_MICRO
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_type, event_id
  FROM events
),
purchases AS (
  SELECT user_id, ts_us AS p_ts, event_id AS purchase_id
  FROM ev WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts_us AS t_ts, event_type AS channel, event_id AS touch_id
  FROM ev WHERE event_type != 'purchase'
),
ranked AS (
  SELECT p.purchase_id, t.channel,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.t_ts, t.touch_id) AS pos,
         count(*) OVER (PARTITION BY p.purchase_id) AS k
  FROM purchases p JOIN touches t ON p.user_id = t.user_id
  WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - {PBA_LOOKBACK_US}
),
credited AS (
  SELECT channel, purchase_id,
         CASE WHEN k = 1 THEN 1000000
              WHEN k = 2 THEN 500000
              WHEN pos = 1 THEN {PBA_FIRST_MICRO}
              WHEN pos = k THEN {PBA_LAST_MICRO}
              ELSE {mid} // (k - 2) END AS credit
  FROM ranked
),
out_ AS (
  SELECT channel, sum(credit) AS credit_micro,
         count(DISTINCT purchase_id) AS n_purchases_touched,
         count(*) AS n_touches
  FROM credited GROUP BY channel
),
tot AS (SELECT sum(credit_micro) AS t FROM out_)
SELECT channel, credit_micro / 1000000.0 AS credit,
       CAST(n_purchases_touched AS BIGINT) AS n_purchases_touched,
       CAST(n_touches AS BIGINT) AS n_touches,
       CASE WHEN t > 0
            THEN {ratio_sql('credit_micro::double', 't::double', 6)} END
         AS credit_share
FROM out_, tot
ORDER BY channel
"""


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix over the event stream:
    counts, share of all events, and the within-day peak flag — the gym
    staffing heatmap every reference dashboard family circles around
    (dashboard.py's daily/hourly charts are 1-D slices of this), and the
    canonical cube a BI layer pivots.

    Determinism: dow/hour come from the UTC-pinned event timestamps
    (session TZ discipline); shares are exact count ratios; the per-day
    peak is a max-count comparison with hour tie-break.

    Scale shape: one groupBy onto the fixed 7×24 grid — map-side combine
    does everything; the output is 168 rows at any corpus size."""
    from pyspark.sql import Window

    from ..functions.money import ratio
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    )
    grid = ev.groupBy("dow", "hour").agg(F.count("*").alias("n"))
    tot = Window.partitionBy()
    wd = Window.partitionBy("dow")
    staged = grid.select(
        "*",
        F.sum("n").over(tot).alias("n_total"),
        F.max("n").over(wd).alias("day_max"),
    )
    enriched = staged.select(
        "*",
        F.min(F.when(F.col("n") == F.col("day_max"), F.col("hour"))).over(wd).alias(
            "peak_hour"
        ),
    )
    return enriched.select(
        "dow",
        "hour",
        "n",
        ratio(F.col("n").cast("double"), F.col("n_total").cast("double"), 6).alias(
            "share"
        ),
        (F.col("hour") == F.col("peak_hour")).alias("is_day_peak"),
    ).orderBy("dow", "hour")


def activity_heatmap_sql() -> str:
    from ..functions.money import ratio_sql

    return f"""
WITH grid AS (
  SELECT dayofweek(ts)::int + 1 AS dow, hour(ts)::int AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
staged AS (
  SELECT *,
         sum(n) OVER () AS n_total,
         max(n) OVER (PARTITION BY dow) AS day_max
  FROM grid
),
enriched AS (
  SELECT *,
         min(CASE WHEN n = day_max THEN hour END)
           OVER (PARTITION BY dow) AS peak_hour
  FROM staged
)
SELECT dow, hour, CAST(n AS BIGINT) AS n,
       {ratio_sql('n::double', 'n_total::double', 6)} AS share,
       hour = peak_hour AS is_day_peak
FROM enriched
ORDER BY dow, hour
"""
