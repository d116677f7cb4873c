"""Membership domain: interval tables, as-of / point-in-interval joins,
daily-active timelines, revenue projection.

Realizes FIXTURES.md F3 on ``orders`` (membership = interval starting at
o_orderdate; duration/frequency from o_orderpriority; size from the owner's
c_mktsegment), mirroring the reference's membership feature derivation
(reference fetch_capitan_membership_data.py:111-264).

Two interval spaces:

- :func:`build_memberships` — faithful F3 in order-date space (1992-98),
  used for active-count point queries, daily-active timelines (reference
  dashboard.py:1014-1031) and the forward revenue projection (reference
  fetch_capitan_membership_data.py:401-428).
- :func:`build_memberships_2024` — the same orders deterministically mapped
  into the event stream's 2024 window (start = 2024-01-01 + orderkey%25,
  short durations), so the as-of conversion join (reference
  pipeline_handler.py:529-556) and checkin-during-membership interval join
  (reference build_conversion_rate_analysis.py:156-201) exercise real
  overlaps against the checkin stream.

Scale notes: as-of is expressed as equi-join on customer + inequality filter
+ min_by aggregation — no window over a global sort; interval joins block on
the customer equi-key first so the range predicate never becomes a cross
join; the daily-active explode bounds the sequence to the queried window
(sequence+explode of bounded intervals ≈ O(days_in_window × memberships),
partition-parallel, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config
from ..functions.money import dec38, money, money_sql, sum_money, sum_money_sql
from ..functions.text import map_lookup, map_lookup_sql
from ..io import load_table, materialized

# priority -> (interval days, frequency) in faithful space (config) and the
# compressed 2024 mapping used against the ~1-month event stream
DURATION_2024 = {
    "1-URGENT": 3,
    "2-HIGH": 7,
    "3-MEDIUM": 14,
    "4-NOT SPECIFIED": 21,
    "5-LOW": 28,
}
BILL_STEP_DAYS = {  # bill-date cadence per frequency (day-based: exact parity)
    "bi_weekly": 14,
    "monthly": 30,
    "prepaid_3mo": 90,
    "prepaid_6mo": 180,
    "annual": 365,
}


def _freq_col() -> F.Column:
    return map_lookup(
        F.col("o_orderpriority"),
        {k: v for k, (_d, v) in config.MEMBERSHIP_BY_PRIORITY.items()},
        "unknown",
    )


def _freq_sql() -> str:
    return map_lookup_sql(
        "o_orderpriority",
        {k: v for k, (_d, v) in config.MEMBERSHIP_BY_PRIORITY.items()},
        "unknown",
    )


def _duration_days_col(mapping: dict[str, int]) -> F.Column:
    expr = None
    for k, d in mapping.items():
        cond = F.col("o_orderpriority") == k
        expr = F.when(cond, d) if expr is None else expr.when(cond, d)
    return expr.otherwise(30)


def _duration_days_sql(mapping: dict[str, int]) -> str:
    branches = " ".join(f"WHEN '{k}' THEN {d}" for k, d in mapping.items())
    return f"CASE o_orderpriority {branches} ELSE 30 END"


def build_memberships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful F3: one interval row per order in order-date space."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dur = _duration_days_col({k: d for k, (d, _v) in config.MEMBERSHIP_BY_PRIORITY.items()})
    freq = _freq_col()
    size = map_lookup(F.col("c_mktsegment"), config.SIZE_BY_MKTSEGMENT, config.SIZE_DEFAULT)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            F.col("o_orderkey").alias("membership_id"),
            F.col("o_custkey").alias("owner_id"),
            F.concat_ws(" ", freq, size, F.lit("membership")).alias("name"),
            F.to_date("o_orderdate").alias("start_date"),
            F.date_add(F.to_date("o_orderdate"), dur).alias("end_date"),
            F.when(F.col("o_orderstatus") == "O", "ACT").otherwise("END").alias("status"),
            freq.alias("frequency"),
            size.alias("size"),
            money(F.col("o_totalprice") / 12.0).alias("billing_amount"),
            (size == "family").alias("is_family"),
            (size == "corporate").alias("is_corporate"),
        )
    )


def memberships_sql() -> str:
    dur = _duration_days_sql({k: d for k, (d, _v) in config.MEMBERSHIP_BY_PRIORITY.items()})
    freq = _freq_sql()
    size = map_lookup_sql("c_mktsegment", config.SIZE_BY_MKTSEGMENT, config.SIZE_DEFAULT)
    return f"""
SELECT
  o_orderkey                                      AS membership_id,
  o_custkey                                       AS owner_id,
  concat_ws(' ', {freq}, {size}, 'membership')    AS name,
  o_orderdate::date                               AS start_date,
  o_orderdate::date + ({dur})                     AS end_date,
  CASE WHEN o_orderstatus = 'O' THEN 'ACT' ELSE 'END' END AS status,
  {freq}                                          AS frequency,
  {size}                                          AS size,
  {money_sql('o_totalprice / 12.0')}              AS billing_amount,
  ({size}) = 'family'                             AS is_family,
  ({size}) = 'corporate'                          AS is_corporate
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@materialized("memberships_2024")
def build_memberships_2024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders mapped deterministically into the 2024 event window."""
    orders = load_table(spark, sf_dir, "orders")
    dur = _duration_days_col(DURATION_2024)
    freq = _freq_col()
    start = F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("o_orderkey") % 25).cast("int"))
    # membership display name; bi_weekly memberships are the "2-Week Pass"
    # product the flags engine keyword-matches (reference
    # customer_flags_config.py:660-668: name contains '2-week'/'2 week')
    name = F.when(freq == "bi_weekly", F.lit("2-Week Pass")).otherwise(
        F.concat_ws(" ", freq, F.lit("membership"))
    )
    return orders.select(
        F.col("o_orderkey").alias("membership_id"),
        F.col("o_custkey").alias("owner_id"),
        name.alias("name"),
        start.alias("start_date"),
        F.date_add(start, dur).alias("end_date"),
        F.when(F.col("o_orderstatus") == "O", "ACT").otherwise("END").alias("status"),
        freq.alias("frequency"),
        money(F.col("o_totalprice") / 10.0).alias("billing_amount"),
    )


def memberships_2024_sql() -> str:
    dur = _duration_days_sql(DURATION_2024)
    freq = _freq_sql()
    return f"""
SELECT
  o_orderkey                                          AS membership_id,
  o_custkey                                           AS owner_id,
  CASE WHEN ({freq}) = 'bi_weekly' THEN '2-Week Pass'
       ELSE concat_ws(' ', {freq}, 'membership') END  AS name,
  DATE '2024-01-01' + (o_orderkey % 25)::int          AS start_date,
  DATE '2024-01-01' + (o_orderkey % 25)::int + ({dur}) AS end_date,
  CASE WHEN o_orderstatus = 'O' THEN 'ACT' ELSE 'END' END AS status,
  {freq}                                              AS frequency,
  {money_sql('o_totalprice / 10.0')}                  AS billing_amount
FROM orders
"""


# ---------------------------------------------------------------------------
# point-in-interval analytics
# ---------------------------------------------------------------------------

POINT_DATE = "1996-06-01"


def active_memberships_on_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval count by (frequency, size) at a fixed date
    (reference active-count point query, fetch_capitan_membership_data.py:299-344)."""
    m = build_memberships(spark, sf_dir)
    d = F.to_date(F.lit(POINT_DATE))
    return (
        m.filter((F.col("start_date") <= d) & (F.col("end_date") >= d) & (F.col("status") == "ACT"))
        .groupBy("frequency", "size")
        .agg(
            F.count("*").alias("active_count"),
            sum_money(F.col("billing_amount")).alias("active_billing"),
        )
        .orderBy("frequency", "size")
    )


def active_memberships_on_date_sql() -> str:
    return f"""
WITH m AS ({memberships_sql()})
SELECT frequency, size, count(*) AS active_count,
       {sum_money_sql('billing_amount')} AS active_billing
FROM m
WHERE start_date <= DATE '{POINT_DATE}' AND end_date >= DATE '{POINT_DATE}' AND status = 'ACT'
GROUP BY frequency, size
ORDER BY frequency, size
"""


TIMELINE_LO, TIMELINE_HI = "1996-01-01", "1996-03-31"


def daily_active_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: for each day in a bounded window, memberships active that day by
    frequency (reference daily active stacked timeline, dashboard.py:1014-1031)
    via interval-clip + sequence + explode — the distributed replacement for
    the reference's per-day Python loop."""
    m = build_memberships(spark, sf_dir)
    lo = F.to_date(F.lit(TIMELINE_LO))
    hi = F.to_date(F.lit(TIMELINE_HI))
    clipped = m.filter((F.col("start_date") <= hi) & (F.col("end_date") >= lo)).select(
        "frequency",
        F.greatest(F.col("start_date"), lo).alias("clip_lo"),
        F.least(F.col("end_date"), hi).alias("clip_hi"),
    )
    return (
        clipped.select(
            "frequency",
            F.explode(F.sequence("clip_lo", "clip_hi")).alias("day"),
        )
        .groupBy("day", "frequency")
        .agg(F.count("*").alias("active_memberships"))
        .orderBy("day", "frequency")
    )


def daily_active_timeline_sql() -> str:
    return f"""
WITH m AS ({memberships_sql()}),
clipped AS (
  SELECT frequency,
         greatest(start_date, DATE '{TIMELINE_LO}') AS clip_lo,
         least(end_date, DATE '{TIMELINE_HI}') AS clip_hi
  FROM m
  WHERE start_date <= DATE '{TIMELINE_HI}' AND end_date >= DATE '{TIMELINE_LO}'
),
days AS (
  SELECT frequency, unnest(generate_series(clip_lo, clip_hi, INTERVAL 1 DAY))::date AS day
  FROM clipped
)
SELECT day, frequency, count(*) AS active_memberships
FROM days GROUP BY day, frequency ORDER BY day, frequency
"""


def revenue_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward revenue by month: explode each membership's upcoming bill
    dates (day-based cadence per frequency) and sum billing by bill month
    (reference membership_revenue_projection,
    fetch_capitan_membership_data.py:401-428)."""
    m = build_memberships(spark, sf_dir).filter(F.col("status") == "ACT")
    step = None
    for k, d in BILL_STEP_DAYS.items():
        cond = F.col("frequency") == k
        step = F.when(cond, d) if step is None else step.when(cond, d)
    step = step.otherwise(30)
    return (
        m.withColumn("step_days", step)
        .withColumn(
            "bill_date",
            F.explode(
                F.expr("sequence(start_date, end_date, make_interval(0, 0, 0, step_days, 0, 0, 0))")
            ),
        )
        .groupBy(F.trunc("bill_date", "month").alias("bill_month"))
        .agg(
            sum_money(F.col("billing_amount")).alias("projected_revenue"),
            F.count("*").alias("n_bills"),
        )
        .orderBy("bill_month")
    )


def revenue_projection_sql() -> str:
    branches = " ".join(f"WHEN '{k}' THEN {d}" for k, d in BILL_STEP_DAYS.items())
    return f"""
WITH m AS ({memberships_sql()}),
stepped AS (
  SELECT *, CASE frequency {branches} ELSE 30 END AS step_days
  FROM m WHERE status = 'ACT'
),
bills AS (
  SELECT billing_amount,
         unnest(generate_series(start_date::timestamp, end_date::timestamp,
                                to_days(step_days)))::date AS bill_date
  FROM stepped
)
SELECT date_trunc('month', bill_date)::date AS bill_month,
       {sum_money_sql('billing_amount')} AS projected_revenue,
       count(*) AS n_bills
FROM bills GROUP BY 1 ORDER BY 1
"""


def revenue_actual_plus_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The historical + projection union chart (reference dashboard
    dashboard.py:878-962): realized monthly net revenue unioned with the
    forward bill-date projection, labeled by kind."""
    from .transactions import build_transactions

    actual = (
        build_transactions(spark, sf_dir)
        .groupBy(F.trunc("txn_date", "month").alias("month"))
        .agg(sum_money(F.col("total_amount")).alias("amount"))
        .withColumn("kind", F.lit("actual"))
    )
    projected = revenue_projection(spark, sf_dir).select(
        F.col("bill_month").alias("month"),
        F.col("projected_revenue").alias("amount"),
        F.lit("projected").alias("kind"),
    )
    return actual.unionByName(projected).orderBy("month", "kind")


def revenue_actual_plus_projected_sql() -> str:
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
actual AS (
  SELECT date_trunc('month', txn_date)::date AS month,
         {sum_money_sql('total_amount')} AS amount,
         'actual' AS kind
  FROM txn GROUP BY 1
),
projected AS (
  SELECT bill_month AS month, projected_revenue AS amount, 'projected' AS kind
  FROM ({revenue_projection_sql()})
)
SELECT * FROM actual UNION ALL SELECT * FROM projected
ORDER BY month, kind
"""


# ---------------------------------------------------------------------------
# temporal joins against the checkin stream (2024 space)
# ---------------------------------------------------------------------------


def membership_conversion_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 as-of join: for each customer, the FIRST membership starting
    strictly after their FIRST checkin (reference day-pass→membership
    conversion, pipeline_handler.py:529-556).  Expressed as equi-join on
    customer + inequality + min_by — shuffle on the join key only, no global
    sort, broadcast-friendly when one side is small."""
    from .events import build_checkins

    first_visit = (
        build_checkins(spark, sf_dir)
        .groupBy("customer_id")
        .agg(F.min("checkin_date").alias("first_visit_date"))
    )
    m = build_memberships_2024(spark, sf_dir)
    joined = first_visit.join(
        m,
        (first_visit.customer_id == m.owner_id)
        & (m.start_date > first_visit.first_visit_date),
        "left",
    )
    return (
        joined.groupBy("customer_id", "first_visit_date")
        .agg(
            F.min_by(
                F.struct("start_date", "membership_id"), F.struct("start_date", "membership_id")
            ).alias("_first"),
        )
        .select(
            "customer_id",
            "first_visit_date",
            F.col("_first.membership_id").alias("converted_membership_id"),
            F.col("_first.start_date").alias("membership_start_date"),
            F.datediff(F.col("_first.start_date"), F.col("first_visit_date")).alias(
                "days_to_convert"
            ),
        )
        .orderBy("customer_id")
    )


def membership_conversion_asof_sql() -> str:
    from .events import checkins_sql

    return f"""
WITH ck AS ({checkins_sql()}),
first_visit AS (
  SELECT customer_id, min(checkin_date) AS first_visit_date
  FROM ck GROUP BY customer_id
),
m AS ({memberships_2024_sql()}),
ranked AS (
  SELECT f.customer_id, f.first_visit_date, m.membership_id, m.start_date,
         row_number() OVER (PARTITION BY f.customer_id
                            ORDER BY m.start_date, m.membership_id) AS rn
  FROM first_visit f
  JOIN m ON m.owner_id = f.customer_id AND m.start_date > f.first_visit_date
)
SELECT f.customer_id, f.first_visit_date,
       r.membership_id AS converted_membership_id,
       r.start_date AS membership_start_date,
       r.start_date - f.first_visit_date AS days_to_convert
FROM first_visit f
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (customer_id)
ORDER BY customer_id
"""


def checkins_membership_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 point-in-interval join: per checkin, how many ACT memberships of
    that customer cover the checkin date (reference was-member-at-checkin,
    build_conversion_rate_analysis.py:156-201), rolled up by entry_method ×
    covered flag."""
    from .events import build_checkins

    ck = build_checkins(spark, sf_dir).select(
        "checkin_id", "customer_id", "checkin_date", "entry_method"
    )
    m = build_memberships_2024(spark, sf_dir).filter(F.col("status") == "ACT")
    covered = ck.join(
        m,
        (ck.customer_id == m.owner_id)
        & (ck.checkin_date >= m.start_date)
        & (ck.checkin_date <= m.end_date),
        "left",
    ).groupBy("checkin_id", "customer_id", "checkin_date", "entry_method").agg(
        F.count(m.membership_id).alias("n_active_memberships")
    )
    return (
        covered.groupBy("entry_method", (F.col("n_active_memberships") > 0).alias("is_covered"))
        .agg(
            F.count("*").alias("n_checkins"),
            F.countDistinct("customer_id").alias("n_customers"),
        )
        .orderBy("entry_method", "is_covered")
    )


def checkins_membership_coverage_sql() -> str:
    from .events import checkins_sql

    return f"""
WITH ck AS ({checkins_sql()}),
m AS ({memberships_2024_sql()}),
covered AS (
  SELECT ck.checkin_id, ck.customer_id, ck.checkin_date, ck.entry_method,
         count(m.membership_id) AS n_active_memberships
  FROM ck
  LEFT JOIN (SELECT * FROM m WHERE status = 'ACT') m
    ON m.owner_id = ck.customer_id
   AND ck.checkin_date BETWEEN m.start_date AND m.end_date
  GROUP BY 1, 2, 3, 4
)
SELECT entry_method, n_active_memberships > 0 AS is_covered,
       count(*) AS n_checkins, count(DISTINCT customer_id) AS n_customers
FROM covered
GROUP BY 1, 2 ORDER BY 1, 2
"""


def visits_before_first_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: checkins strictly before the customer's first membership start,
    bucketed 0..4, 5+ (reference build_membership_conversion_metrics.py:65-111)."""
    from .events import build_checkins

    ck = build_checkins(spark, sf_dir).select("customer_id", "checkin_date")
    first_m = (
        build_memberships_2024(spark, sf_dir)
        .groupBy("owner_id")
        .agg(F.min("start_date").alias("first_membership_start"))
    )
    counts = (
        first_m.join(ck, first_m.owner_id == ck.customer_id, "left")
        .groupBy("owner_id", "first_membership_start")
        .agg(
            F.count(
                F.when(F.col("checkin_date") < F.col("first_membership_start"), 1)
            ).alias("visits_before")
        )
    )
    bucket = (
        F.when(F.col("visits_before") >= 5, "5+")
        .otherwise(F.col("visits_before").cast("string"))
        .alias("visits_bucket")
    )
    return (
        counts.select(bucket)
        .groupBy("visits_bucket")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("visits_bucket")
    )


def visits_before_first_membership_sql() -> str:
    from .events import checkins_sql

    return f"""
WITH ck AS ({checkins_sql()}),
m AS ({memberships_2024_sql()}),
first_m AS (
  SELECT owner_id, min(start_date) AS first_membership_start
  FROM m GROUP BY owner_id
),
counts AS (
  SELECT f.owner_id,
         count(CASE WHEN ck.checkin_date < f.first_membership_start THEN 1 END) AS visits_before
  FROM first_m f
  LEFT JOIN ck ON ck.customer_id = f.owner_id
  GROUP BY f.owner_id
)
SELECT CASE WHEN visits_before >= 5 THEN '5+' ELSE visits_before::varchar END AS visits_bucket,
       count(*) AS n_customers
FROM counts GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# SCD2 compression: snapshot series -> effective-dated dimension
# ---------------------------------------------------------------------------

# The observation grid: the reference's store keeps first-of-month immutable
# snapshots of state-like tables (pipeline_handler.py:343-354); an
# effective-dated (SCD Type-2) dimension is those snapshots COMPRESSED to
# one row per unbroken run of identical state.  The grid below brackets the
# 2024 membership window (starts Jan 1-25, durations 7-30 d) so all three
# lifecycle states occur.
SCD2_SNAPSHOT_DATES: tuple[str, ...] = (
    "2024-01-07",
    "2024-01-31",
    "2024-02-29",
    "2024-03-31",
)


def scd2_compress(
    observed: DataFrame, key_col: str, state_col: str, date_col: str
) -> DataFrame:
    """Generic SCD2 run-compression over (key, observation_date, state)
    rows: one output row per unbroken run of identical state per key —
    ``(key, state, effective_from, effective_to)`` with run bounds =
    min/max observation date.  Classic gaps-and-islands (the difference
    of two row_numbers is constant within a run), so a state that RECURS
    (active → frozen → active) yields two separate rows, which a naive
    groupBy(key, state) would wrongly merge — pinned by a unit test.

    Scale shape: island ids come from a change-flag running sum so BOTH
    window passes share one partition key and sort order — a single
    shuffle on key, one sort, then a same-keyed aggregation (the
    two-row_number textbook variant would shuffle a second time on
    (key, state)).  Embarrassingly parallel over keys."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(date_col)
    prev = F.lag(state_col).over(w)
    changed = (prev.isNull() | (prev != F.col(state_col))).cast("int")
    runs = observed.select(
        key_col,
        state_col,
        date_col,
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_island"),
    )
    return runs.groupBy(key_col, state_col, "_island").agg(
        F.min(date_col).alias("effective_from"),
        F.max(date_col).alias("effective_to"),
    ).drop("_island")


def membership_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The memberships dimension as SCD2 history: observe every membership's
    lifecycle state (pending / active / expired) on the snapshot grid,
    compress runs with :func:`scd2_compress`, and flag the row current as
    of the final snapshot — turning the reference's pile of monthly
    snapshot CSVs into the effective-dated dimension a warehouse queries
    with BETWEEN instead of by opening N files.

    Scale shape: the observation fan-out is a 4-element literal array
    explode (rows × |grid|, map-side); everything after is per-membership
    windows.  A 100-TB store runs the same plan with the grid read from
    the snapshot listing instead of a constant."""
    m = build_memberships_2024(spark, sf_dir)
    grid = F.array(*[F.to_date(F.lit(d)) for d in SCD2_SNAPSHOT_DATES])
    observed = m.select(
        "membership_id",
        "start_date",
        "end_date",
        F.explode(grid).alias("snap_date"),
    ).select(
        "membership_id",
        "snap_date",
        F.when(F.col("snap_date") < F.col("start_date"), "pending")
        .when(F.col("snap_date") > F.col("end_date"), "expired")
        .otherwise("active")
        .alias("state"),
    )
    hist = scd2_compress(observed, "membership_id", "state", "snap_date")
    last = SCD2_SNAPSHOT_DATES[-1]
    return hist.select(
        "membership_id",
        "state",
        "effective_from",
        "effective_to",
        (F.col("effective_to") == F.to_date(F.lit(last))).alias("is_current"),
    ).orderBy("membership_id", "effective_from")


def membership_scd2_sql() -> str:
    dates = ", ".join(f"DATE '{d}'" for d in SCD2_SNAPSHOT_DATES)
    return f"""
WITH m AS ({memberships_2024_sql()}),
observed AS (
  SELECT membership_id, g.snap_date,
         CASE WHEN g.snap_date < start_date THEN 'pending'
              WHEN g.snap_date > end_date THEN 'expired'
              ELSE 'active' END AS state
  FROM m CROSS JOIN (SELECT unnest([{dates}]) AS snap_date) g
),
flags AS (
  SELECT membership_id, state, snap_date,
         CASE WHEN lag(state) OVER w IS NULL
                OR lag(state) OVER w != state THEN 1 ELSE 0 END AS changed
  FROM observed
  WINDOW w AS (PARTITION BY membership_id ORDER BY snap_date)
),
runs AS (
  SELECT membership_id, state, snap_date,
         sum(changed) OVER (
           PARTITION BY membership_id ORDER BY snap_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM flags
),
hist AS (
  SELECT membership_id, state,
         min(snap_date) AS effective_from,
         max(snap_date) AS effective_to
  FROM runs GROUP BY membership_id, state, island
)
SELECT membership_id, state, effective_from, effective_to,
       effective_to = DATE '{SCD2_SNAPSHOT_DATES[-1]}' AS is_current
FROM hist
ORDER BY membership_id, effective_from
"""


def scd2_apply_snapshot(
    history: DataFrame,
    snapshot: DataFrame,
    key_col: str,
    state_col: str,
    snap_date,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold ONE new snapshot into an existing
    compressed history — the operation a nightly pipeline actually runs.
    Rebuilding with :func:`scd2_compress` over every stored snapshot is
    O(total history) per night; this touches each key's CURRENT row plus
    the new observation, so nightly cost tracks the dimension size, not
    its age — the property that keeps SCD2 viable on a 100-TB store.

    Contract (verified by a fold-equals-batch property test): folding
    snapshots in date order through this function produces exactly
    ``scd2_compress`` over the union of observations.  Per key:

    * same state as the current row → extend ``effective_to`` to
      ``snap_date``;
    * different state (or a brand-new key) → the old current row is kept
      closed as-is and a new ``[snap_date, snap_date]`` row opens.

    ``snap_date`` must be later than every date already in ``history`` —
    snapshots arrive in order (the store's snapshot listing is the
    schedule); replaying an old snapshot would rewrite closed rows, which
    is a restore operation, not maintenance.

    Scale shape: one equi-join of the snapshot to the history's current
    rows (both keyed on ``key_col``), a column-level merge, and a union
    with the untouched closed rows — no window over the full history."""
    snap_lit = F.to_date(F.lit(snap_date)) if isinstance(snap_date, str) else F.lit(snap_date)
    # current row per key = the one with the latest effective_to (histories
    # produced by scd2_compress / this function keep exactly one)
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.desc("effective_to"))
    ranked = history.withColumn("_rn", F.row_number().over(w))
    closed = ranked.filter(F.col("_rn") > 1).drop("_rn")
    current = ranked.filter(F.col("_rn") == 1).drop("_rn")

    obs = snapshot.select(
        key_col, F.col(state_col).alias("_new_state"), snap_lit.alias("_snap_date")
    )
    joined = current.join(obs, key_col, "full")
    same = F.col(state_col) == F.col("_new_state")
    # current row, possibly extended (absent keys pass through unchanged;
    # keys whose state changed keep their closed current row as-is)
    kept_current = joined.filter(F.col(state_col).isNotNull()).select(
        key_col,
        state_col,
        "effective_from",
        F.when(same, F.col("_snap_date")).otherwise(F.col("effective_to")).alias(
            "effective_to"
        ),
    )
    # newly-opened rows: state changed, or key never seen before
    opened = joined.filter(
        F.col("_new_state").isNotNull()
        & (F.col(state_col).isNull() | ~same)
    ).select(
        key_col,
        F.col("_new_state").alias(state_col),
        F.col("_snap_date").alias("effective_from"),
        F.col("_snap_date").alias("effective_to"),
    )
    return closed.select(key_col, state_col, "effective_from", "effective_to").unionByName(
        kept_current
    ).unionByName(opened)


def membership_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for membership tenure with RIGHT
    CENSORING: ended memberships (status END) are churn events at their
    duration; still-active ones (ACT) are censored at their scheduled
    end — the estimator churn analytics is built on, and the reference's
    membership-lifecycle dashboards approximate with naive retention
    ratios (which are biased exactly because they ignore censoring).

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over event times, computed in the log
    domain with per-step nano fixed-point (each ln((n−d)/n) term is
    floored to int64 BEFORE the cumulative sum, so the product is
    summation-order immune); the d = n extinction step pins S to exactly
    0 from there on in both engines rather than feeding ln(0).

    Scale shape: one groupBy onto distinct durations (bounded by the
    tenure-day vocabulary, not membership volume), then window math over
    that tiny ordered frame — the risk set nᵢ is total minus a
    cumulative sum, never a per-row rescan."""
    from pyspark.sql import Window

    m = build_memberships_2024(spark, sf_dir)
    rows = m.select(
        F.datediff(F.col("end_date"), F.col("start_date")).alias("duration_days"),
        (F.col("status") == "END").cast("long").alias("ev"),
    )
    per = rows.groupBy("duration_days").agg(
        F.sum("ev").alias("n_events"),
        F.sum(1 - F.col("ev")).alias("n_censored"),
    )
    w = Window.orderBy("duration_days")
    prev = Window.orderBy("duration_days").rowsBetween(Window.unboundedPreceding, -1)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(Window.partitionBy())
    n_risk = total - F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(prev), F.lit(0)
    )
    stepped = per.select(
        "duration_days",
        "n_events",
        "n_censored",
        n_risk.alias("n_risk"),
    )
    extinct = F.col("n_events") >= F.col("n_risk")
    term_nano = F.when(extinct, F.lit(0)).otherwise(
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1000000000.0
            + 0.5
        ).cast("long")
    )
    cum = stepped.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(term_nano).over(w).alias("cum_nano"),
        F.max(extinct.cast("int")).over(w).alias("hit_zero"),
    )
    survival = F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
        F.floor(F.exp(F.col("cum_nano") / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0
    )
    return (
        cum.filter(F.col("n_events") > 0)
        .select("duration_days", "n_risk", "n_events", "n_censored", survival.alias("survival"))
        .orderBy("duration_days")
    )


def membership_survival_km_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
rows_ AS (
  SELECT (end_date - start_date) AS duration_days,
         (status = 'END')::bigint AS ev
  FROM m
),
per AS (
  SELECT duration_days, sum(ev) AS n_events, sum(1 - ev) AS n_censored
  FROM rows_ GROUP BY duration_days
),
stepped AS (
  SELECT duration_days, n_events, n_censored,
         sum(n_events + n_censored) OVER ()
           - coalesce(sum(n_events + n_censored)
                      OVER (ORDER BY duration_days
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM per
),
cum AS (
  SELECT duration_days, n_risk, n_events, n_censored,
         sum(CASE WHEN n_events >= n_risk THEN 0
                  ELSE CAST(floor(ln((n_risk - n_events)::double / n_risk::double)
                                  * 1000000000.0 + 0.5) AS BIGINT) END)
           OVER (ORDER BY duration_days) AS cum_nano,
         max((n_events >= n_risk)::int) OVER (ORDER BY duration_days) AS hit_zero
  FROM stepped
)
SELECT duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE floor(exp(cum_nano / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0
       END AS survival
FROM cum
WHERE n_events > 0
ORDER BY duration_days
"""


LOGRANK_GROUP = "monthly"  # group 1 of the two-sample log-rank comparison


def survival_logrank_by_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test: does the ``monthly`` cohort churn on a
    different survival curve than everyone else?  The hypothesis test
    that belongs next to :func:`membership_survival_km` — eyeballing two
    KM curves (what the reference's retention dashboards amount to) has
    no error control; the log-rank statistic does.

    Per event time t: O₁ₜ = observed group-1 events, E₁ₜ = dₜ·n₁ₜ/nₜ,
    Vₜ = dₜ·(n₁ₜ/nₜ)(1−n₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1); Z = Σ(O−E)/√ΣV.
    Every per-time term is a rational of exact integer risk/event counts,
    nano-floored BEFORE the sum (order-immune), one sqrt at the end;
    ΣV = 0 (no comparable event times) pins Z to NULL on both engines.

    Scale shape: one groupBy onto (duration, group) counts — bounded by
    the tenure vocabulary — then cumulative-sum risk sets and the
    statistic over that tiny frame."""
    from pyspark.sql import Window

    m = build_memberships_2024(spark, sf_dir)
    rows = m.select(
        F.datediff(F.col("end_date"), F.col("start_date")).alias("dur"),
        (F.col("status") == "END").cast("long").alias("ev"),
        (F.col("frequency") == LOGRANK_GROUP).cast("long").alias("g1"),
    )
    per = rows.groupBy("dur").agg(
        F.sum("ev").alias("d"),
        F.sum(F.col("ev") * F.col("g1")).alias("d1"),
        F.count("*").alias("leave"),
        F.sum("g1").alias("leave1"),
    )
    prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    n_t = F.sum("leave").over(wall) - F.coalesce(F.sum("leave").over(prev), F.lit(0))
    n1_t = F.sum("leave1").over(wall) - F.coalesce(F.sum("leave1").over(prev), F.lit(0))
    stepped = per.select("dur", "d", "d1", n_t.alias("n"), n1_t.alias("n1"))
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    dd = F.col("d").cast("double")
    e1 = dd * n1d / nd
    v = F.when(
        F.col("n") > 1,
        dd * (n1d / nd) * (1.0 - n1d / nd) * (nd - dd) / (nd - 1.0),
    ).otherwise(F.lit(0.0))
    nano = lambda c: F.floor(c * 1000000000.0 + 0.5).cast("long")  # noqa: E731
    terms = stepped.filter(F.col("d") > 0).select(
        F.col("d1").alias("o1"),
        nano(e1).alias("e1_nano"),
        nano(v).alias("v_nano"),
        "n1",
        (F.col("n") - F.col("n1")).alias("n_rest"),
    )
    agg = terms.agg(
        F.max("n1").alias("n_group1_at_risk"),
        F.max("n_rest").alias("n_rest_at_risk"),
        F.sum("o1").alias("observed1"),
        (F.sum("e1_nano") / 1000000000.0).alias("expected1"),
        F.sum("v_nano").alias("v_sum_nano"),
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    z = (F.col("observed1").cast("double") - F.col("expected1")) / F.sqrt(
        F.col("v_sum_nano").cast("double") / 1000000000.0
    )
    return agg.select(
        "n_group1_at_risk",
        "n_rest_at_risk",
        "observed1",
        micro(F.col("expected1")).alias("expected1"),
        micro(F.when(F.col("v_sum_nano") > 0, z)).alias("logrank_z"),
    )


def survival_logrank_by_frequency_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
rows_ AS (
  SELECT (end_date - start_date) AS dur,
         (status = 'END')::bigint AS ev,
         (frequency = '{LOGRANK_GROUP}')::bigint AS g1
  FROM m
),
per AS (
  SELECT dur, sum(ev) AS d, sum(ev * g1) AS d1,
         count(*) AS leave_, sum(g1) AS leave1
  FROM rows_ GROUP BY dur
),
stepped AS (
  SELECT dur, d, d1,
         sum(leave_) OVER ()
           - coalesce(sum(leave_) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
         sum(leave1) OVER ()
           - coalesce(sum(leave1) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
  FROM per
),
terms AS (
  SELECT d1 AS o1, n1, (n - n1) AS n_rest,
         CAST(floor(d::double * n1::double / n::double
                    * 1000000000.0 + 0.5) AS BIGINT) AS e1_nano,
         CAST(floor(CASE WHEN n > 1
                         THEN d::double * (n1::double / n::double)
                              * (1.0 - n1::double / n::double)
                              * (n::double - d::double) / (n::double - 1.0)
                         ELSE 0.0 END * 1000000000.0 + 0.5) AS BIGINT) AS v_nano
  FROM stepped WHERE d > 0
)
SELECT max(n1)::bigint AS n_group1_at_risk,
       max(n_rest)::bigint AS n_rest_at_risk,
       CAST(sum(o1) AS BIGINT) AS observed1,
       floor(sum(e1_nano) / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0
         AS expected1,
       floor(CASE WHEN sum(v_nano) > 0
                  THEN (sum(o1)::double - sum(e1_nano) / 1000000000.0)
                       / sqrt(sum(v_nano)::double / 1000000000.0)
             END * 1000000.0 + 0.5) / 1000000.0 AS logrank_z
FROM terms
"""


def membership_attrition_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs ended memberships per month with the net — the reference's
    attrition chart (dashboard/dashboard.py:1201-1266: two groupbys on
    period-truncated start/end dates, outer-merged and zero-filled),
    re-expressed as ONE aggregation via the contribution-union trick:
    each membership emits a (+1 new) row at its start month and a
    (+1 ended) row at its end month, and the outer-merge/fillna semantics
    fall out of the single groupBy for free.

    Scale shape: one union of two projections of the same scan, one
    groupBy onto the month spine — bounded by calendar months."""
    m = build_memberships_2024(spark, sf_dir)
    zero = F.lit(0).cast("long")
    contrib = m.select(
        F.date_trunc("month", F.col("start_date")).cast("date").alias("month"),
        F.lit(1).cast("long").alias("new_count"),
        zero.alias("ended_count"),
    ).unionByName(
        m.select(
            F.date_trunc("month", F.col("end_date")).cast("date").alias("month"),
            zero.alias("new_count"),
            F.lit(1).cast("long").alias("ended_count"),
        )
    )
    return (
        contrib.groupBy("month")
        .agg(
            F.sum("new_count").alias("new_count"),
            F.sum("ended_count").alias("ended_count"),
        )
        .select(
            "month",
            "new_count",
            "ended_count",
            (F.col("new_count") - F.col("ended_count")).alias("net"),
        )
        .orderBy("month")
    )


def membership_attrition_monthly_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
contrib AS (
  SELECT date_trunc('month', start_date)::date AS month,
         1::bigint AS new_count, 0::bigint AS ended_count
  FROM m
  UNION ALL
  SELECT date_trunc('month', end_date)::date, 0::bigint, 1::bigint FROM m
)
SELECT month,
       CAST(sum(new_count) AS BIGINT) AS new_count,
       CAST(sum(ended_count) AS BIGINT) AS ended_count,
       CAST(sum(new_count) - sum(ended_count) AS BIGINT) AS net
FROM contrib
GROUP BY month
ORDER BY month
"""


def active_memberships_new_vs_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly active memberships split NEW (started that month) vs
    EXISTING — the reference's new-vs-existing stacked chart
    (dashboard/dashboard.py:1280-1392, a per-period Python loop over the
    memberships frame), as an interval month-explode: each membership
    emits one row per calendar month its [start, end] span touches
    (sequence + explode over month-truncated bounds — months per
    membership are bounded by tenure, so the explode is volume × tenure
    months, never a spine join), tagged new exactly in its start month.

    Scale shape: one projection + explode, one groupBy onto the month
    spine."""
    m = build_memberships_2024(spark, sf_dir)
    months = F.explode(
        F.sequence(
            F.date_trunc("month", F.col("start_date")).cast("date"),
            F.date_trunc("month", F.col("end_date")).cast("date"),
            F.expr("interval 1 month"),
        )
    )
    tagged = m.select(
        months.alias("month"),
        F.date_trunc("month", F.col("start_date")).cast("date").alias("start_month"),
    )
    return (
        tagged.groupBy("month")
        .agg(
            F.sum((F.col("month") == F.col("start_month")).cast("long")).alias(
                "new_active"
            ),
            F.sum((F.col("month") != F.col("start_month")).cast("long")).alias(
                "existing_active"
            ),
        )
        .select(
            "month",
            "new_active",
            "existing_active",
            (F.col("new_active") + F.col("existing_active")).alias("total_active"),
        )
        .orderBy("month")
    )


def active_memberships_new_vs_existing_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
tagged AS (
  SELECT unnest(generate_series(date_trunc('month', start_date),
                                date_trunc('month', end_date),
                                INTERVAL 1 MONTH))::date AS month,
         date_trunc('month', start_date)::date AS start_month
  FROM m
)
SELECT month,
       CAST(sum((month = start_month)::bigint) AS BIGINT) AS new_active,
       CAST(sum((month != start_month)::bigint) AS BIGINT) AS existing_active,
       CAST(count(*) AS BIGINT) AS total_active
FROM tagged
GROUP BY month
ORDER BY month
"""


# ---------------------------------------------------------------------------
# youth-teams daily active by team type (reference dashboard.py:1402-1537)
# ---------------------------------------------------------------------------

# Ordered first-match-wins keyword map over the membership display name —
# the reference categorizes youth teams by name substrings ('recreation'/
# 'rec team', 'development'/'dev team', 'competitive'/'comp team',
# dashboard.py:1420-1427); the engine's synthetic name vocabulary maps its
# three tenure tiers onto the same three team types.
YOUTH_TEAM_KEYWORDS: tuple[tuple[str, str], ...] = (
    ("2-week", "Recreation"),
    ("monthly", "Development"),
    ("annual", "Competitive"),
)


def youth_teams_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active youth-team memberships by team type — the reference's
    stacked Youth Teams timeline (dashboard/dashboard.py:1402-1537: a
    per-day Python loop over name-categorized ACT memberships), composed
    from two driver-green operators: the ordered keyword categorization
    (§2.8) over the membership name and the W7 interval day-explode of
    ``daily_active_timeline``.  Non-team names and non-ACT rows drop out
    exactly as the reference's ``continue`` branches do.

    Scale shape: one projection + bounded day-explode (tenure days per
    membership), one groupBy onto the day × 3-team spine."""
    m = build_memberships_2024(spark, sf_dir).filter(F.col("status") == "ACT")
    name_lower = F.lower(F.col("name"))
    team = None
    for kw, t in YOUTH_TEAM_KEYWORDS:
        cond = name_lower.contains(kw)
        team = F.when(cond, t) if team is None else team.when(cond, t)
    tagged = m.select(team.alias("team_type"), "start_date", "end_date").filter(
        F.col("team_type").isNotNull()
    )
    return (
        tagged.select(
            "team_type",
            F.explode(F.sequence("start_date", "end_date")).alias("day"),
        )
        .groupBy("day", "team_type")
        .agg(F.count("*").alias("active_members"))
        .orderBy("day", "team_type")
    )


def youth_teams_daily_active_sql() -> str:
    cases = " ".join(
        f"WHEN lower(name) LIKE '%{kw}%' THEN '{t}'"
        for kw, t in YOUTH_TEAM_KEYWORDS
    )
    return f"""
WITH m AS ({memberships_2024_sql()}),
tagged AS (
  SELECT CASE {cases} END AS team_type, start_date, end_date
  FROM m WHERE status = 'ACT'
),
days AS (
  SELECT team_type,
         unnest(generate_series(start_date, end_date, INTERVAL 1 DAY))::date AS day
  FROM tagged WHERE team_type IS NOT NULL
)
SELECT day, team_type, count(*) AS active_members
FROM days
GROUP BY day, team_type
ORDER BY day, team_type
"""


# ---------------------------------------------------------------------------
# intro-offer conversion (reference 90-for-90, dashboard.py:2019-2199)
# ---------------------------------------------------------------------------

INTRO_FREQUENCY = "bi_weekly"  # the "2-Week Pass" intro product


def _intro_conversion_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each intro-pass membership row tagged Converted/Not Converted:
    converted = the same owner has a NON-intro membership starting
    strictly after this row's start (the reference's per-row pandas scan,
    dashboard.py:2053-2067, as one aggregate + broadcastable join)."""
    m = build_memberships_2024(spark, sf_dir)
    intro = m.filter(F.col("frequency") == INTRO_FREQUENCY).select(
        "owner_id", "start_date"
    )
    last_reg = (
        m.filter(F.col("frequency") != INTRO_FREQUENCY)
        .groupBy("owner_id")
        .agg(F.max("start_date").alias("last_reg_start"))
    )
    return intro.join(last_reg, "owner_id", "left").select(
        "owner_id",
        "start_date",
        F.when(
            F.col("last_reg_start") > F.col("start_date"), "Converted"
        )
        .otherwise("Not Converted")
        .alias("conversion_status"),
    )


_INTRO_TAGGED_SQL_BODY = """
intro AS (
  SELECT owner_id, start_date FROM m WHERE frequency = '{intro}'
),
last_reg AS (
  SELECT owner_id, max(start_date) AS last_reg_start
  FROM m WHERE frequency != '{intro}' GROUP BY owner_id
),
tagged AS (
  SELECT i.owner_id, i.start_date,
         CASE WHEN r.last_reg_start > i.start_date THEN 'Converted'
              ELSE 'Not Converted' END AS conversion_status
  FROM intro i LEFT JOIN last_reg r USING (owner_id)
)"""


def intro_offer_conversion_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intro-pass purchase volume by start week, split by conversion
    status — the reference's '90 for 90 Purchase Volume by Week' stacked
    chart (dashboard/dashboard.py:2019-2106) over the engine's 2-Week
    Pass intro product.  Conversion per ROW (a pass bought again after a
    regular membership still counts its own status), matching the
    reference's apply-per-row semantics.

    Scale shape: one membership-keyed aggregate (the regular-membership
    max-start), one join, one groupBy onto the week × 2-status spine."""
    tagged = _intro_conversion_tagged(spark, sf_dir)
    return (
        tagged.select(
            F.date_trunc("week", F.col("start_date")).cast("date").alias("week"),
            "conversion_status",
        )
        .groupBy("week", "conversion_status")
        .agg(F.count("*").alias("n_memberships"))
        .orderBy("week", "conversion_status")
    )


def intro_offer_conversion_timeline_sql() -> str:
    body = _INTRO_TAGGED_SQL_BODY.format(intro=INTRO_FREQUENCY)
    return f"""
WITH m AS ({memberships_2024_sql()}),{body}
SELECT date_trunc('week', start_date)::date AS week, conversion_status,
       count(*) AS n_memberships
FROM tagged
GROUP BY week, conversion_status
ORDER BY week, conversion_status
"""


def intro_offer_conversion_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-owner conversion summary for the intro pass — the
    reference's '90 for 90 Conversion Summary' (dashboard/dashboard.py:
    2108-2199: per-person earliest intro start, converted if a regular
    membership starts after it).  One row per status plus the conversion
    rate (fixed-point, shared ratio discipline) repeated on both rows the
    way the reference titles the chart with it.

    Scale shape: two owner-keyed aggregates and a 2-row rollup."""
    from pyspark.sql import Window

    from ..functions.money import ratio

    m = build_memberships_2024(spark, sf_dir)
    first_intro = (
        m.filter(F.col("frequency") == INTRO_FREQUENCY)
        .groupBy("owner_id")
        .agg(F.min("start_date").alias("first_intro_start"))
    )
    last_reg = (
        m.filter(F.col("frequency") != INTRO_FREQUENCY)
        .groupBy("owner_id")
        .agg(F.max("start_date").alias("last_reg_start"))
    )
    per_owner = first_intro.join(last_reg, "owner_id", "left").select(
        F.when(
            F.col("last_reg_start") > F.col("first_intro_start"), "Converted"
        )
        .otherwise("Not Converted")
        .alias("status")
    )
    counts = per_owner.groupBy("status").agg(F.count("*").alias("n_owners"))
    total = Window.partitionBy()
    return counts.select(
        "status",
        "n_owners",
        ratio(
            F.sum(F.when(F.col("status") == "Converted", F.col("n_owners")).otherwise(0))
            .over(total)
            .cast("double")
            * 100.0,
            F.sum("n_owners").over(total).cast("double"),
            2,
        ).alias("conversion_rate_pct"),
    ).orderBy("status")


def intro_offer_conversion_summary_sql() -> str:
    from ..functions.money import ratio_sql

    return f"""
WITH m AS ({memberships_2024_sql()}),
first_intro AS (
  SELECT owner_id, min(start_date) AS first_intro_start
  FROM m WHERE frequency = '{INTRO_FREQUENCY}' GROUP BY owner_id
),
last_reg AS (
  SELECT owner_id, max(start_date) AS last_reg_start
  FROM m WHERE frequency != '{INTRO_FREQUENCY}' GROUP BY owner_id
),
per_owner AS (
  SELECT CASE WHEN r.last_reg_start > f.first_intro_start THEN 'Converted'
              ELSE 'Not Converted' END AS status
  FROM first_intro f LEFT JOIN last_reg r USING (owner_id)
),
counts AS (
  SELECT status, count(*) AS n_owners FROM per_owner GROUP BY status
)
SELECT status, n_owners,
       {ratio_sql("sum(CASE WHEN status = 'Converted' THEN n_owners ELSE 0 END) OVER ()::double * 100.0", 'sum(n_owners) OVER ()::double', 2)} AS conversion_rate_pct
FROM counts
ORDER BY status
"""


def churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard + Nelson-Aalen cumulative hazard over
    membership tenure: per observed tenure day t, the at-risk count,
    ended-that-day count, hazard h(t) = d_t/n_t, and the running
    Nelson-Aalen H(t) = Σ h — the instantaneous-risk view that
    complements :func:`membership_survival_km`'s product-limit curve
    (KM answers "what fraction survives to t"; the hazard answers
    "WHEN is churn risk concentrated", the number a retention team
    can act on).  Right-censoring as in KM: ACT rows leave the risk
    set at their censored tenure without contributing an event.

    Exactness: risk sets come from one cumulative count over the
    tenure-vocabulary frame (bounded by the duration config — ≤ ~30
    distinct values at any corpus size); h is the shared fixed-point
    ratio; H accumulates nano-floored int64 terms (order-immune).

    Scale shape: one groupBy onto the tenure vocabulary, two windows
    over that bounded frame."""
    from pyspark.sql import Window

    from ..functions.money import ratio

    m = build_memberships_2024(spark, sf_dir).select(
        F.datediff(F.col("end_date"), F.col("start_date")).alias("t"),
        (F.col("status") == "END").cast("long").alias("ev"),
    )
    per_t = m.groupBy("t").agg(
        F.count("*").alias("leaving"), F.sum("ev").alias("d")
    )
    w = Window.orderBy("t")
    before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    total = Window.partitionBy()
    risk = per_t.select(
        "t",
        "d",
        (
            F.sum("leaving").over(total)
            - F.coalesce(F.sum("leaving").over(before), F.lit(0))
        ).alias("n_risk"),
    )
    h_nano = F.floor(
        F.col("d").cast("double") / F.col("n_risk").cast("double") * 1000000000.0
        + 0.5
    ).cast("long")
    return (
        risk.withColumn("h_nano", h_nano)
        .select(
            F.col("t").alias("tenure_days"),
            "n_risk",
            F.col("d").alias("n_churned"),
            ratio(F.col("d").cast("double"), F.col("n_risk").cast("double"), 6).alias(
                "hazard"
            ),
            (
                F.sum("h_nano").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / 1000000000.0
            ).alias("cum_hazard"),
        )
        .orderBy("tenure_days")
    )


def churn_hazard_by_tenure_sql() -> str:
    from ..functions.money import ratio_sql

    return f"""
WITH m AS ({memberships_2024_sql()}),
durs AS (
  SELECT (end_date - start_date) AS t, (status = 'END')::bigint AS ev FROM m
),
per_t AS (
  SELECT t, count(*) AS leaving, sum(ev) AS d FROM durs GROUP BY t
),
risk AS (
  SELECT t, d,
         sum(leaving) OVER () -
         coalesce(sum(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM per_t
),
terms AS (
  SELECT t, d, n_risk,
         floor(d::double / n_risk::double * 1000000000.0 + 0.5)::bigint AS h_nano
  FROM risk
)
SELECT t AS tenure_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_churned,
       {ratio_sql('d::double', 'n_risk::double', 6)} AS hazard,
       sum(h_nano) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1000000000.0
         AS cum_hazard
FROM terms
ORDER BY tenure_days
"""


# ---------------------------------------------------------------------------
# round-9 survival extensions: Nelson-Aalen cumulative hazard (+ the
# Fleming-Harrington survival it implies) and the Greenwood confidence
# band the bare KM curve lacks.  Same scale shape as membership_survival_km:
# one groupBy onto the tenure-day vocabulary, window math on that frame.
# ---------------------------------------------------------------------------


def _km_risk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (duration, n_events, n_censored, n_risk) frame of the
    survival family — the per-duration collapse of memberships_2024 with
    the risk set as total-minus-prefix (never a per-row rescan)."""
    from pyspark.sql import Window

    m = build_memberships_2024(spark, sf_dir)
    rows = m.select(
        F.datediff(F.col("end_date"), F.col("start_date")).alias("duration_days"),
        (F.col("status") == "END").cast("long").alias("ev"),
    )
    per = rows.groupBy("duration_days").agg(
        F.sum("ev").alias("n_events"),
        F.sum(1 - F.col("ev")).alias("n_censored"),
    )
    prev = Window.orderBy("duration_days").rowsBetween(Window.unboundedPreceding, -1)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(Window.partitionBy())
    n_risk = total - F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(prev), F.lit(0)
    )
    return per.select("duration_days", "n_events", "n_censored", n_risk.alias("n_risk"))


_KM_RISK_SQL = """
rows_ AS (
  SELECT (end_date - start_date) AS duration_days,
         (status = 'END')::bigint AS ev
  FROM m
),
per AS (
  SELECT duration_days, sum(ev) AS n_events, sum(1 - ev) AS n_censored
  FROM rows_ GROUP BY duration_days
),
stepped AS (
  SELECT duration_days, n_events, n_censored,
         sum(n_events + n_censored) OVER ()
           - coalesce(sum(n_events + n_censored)
                      OVER (ORDER BY duration_days
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS n_risk
  FROM per
)
"""


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with its
    standard error (Σ dᵢ/nᵢ² Poisson form) and the Fleming-Harrington
    survival exp(−H) it implies — the additive-domain counterpart of
    :func:`membership_survival_km` (hazard INCREMENTS are what a churn
    model regresses on; the KM product can't be read per-step).

    Exactness: each dᵢ/nᵢ term is nano-quantized to int64 BEFORE the
    cumulative sum (the KM log-domain discipline, applied to the hazard
    domain where it is exact by definition — no logs involved);
    the variance terms likewise.  exp(−H) is one double op from the
    exact nano integer, micro-rounded.

    Scale shape: identical to the KM — tenure-vocabulary frame only."""
    from pyspark.sql import Window

    stepped = _km_risk_frame(spark, sf_dir)
    w = Window.orderBy("duration_days")
    h_nano = F.floor(
        F.col("n_events").cast("double") / F.col("n_risk").cast("double")
        * 1000000000.0
        + 0.5
    ).cast("long")
    v_nano = F.floor(
        F.col("n_events").cast("double")
        / (F.col("n_risk").cast("double") * F.col("n_risk").cast("double"))
        * 1000000000.0
        + 0.5
    ).cast("long")
    cum = stepped.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(h_nano).over(w).alias("h_nano"),
        F.sum(v_nano).over(w).alias("v_nano"),
    )
    micro6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return (
        cum.filter(F.col("n_events") > 0)
        .select(
            "duration_days",
            "n_risk",
            "n_events",
            "n_censored",
            (F.col("h_nano") / 1.0e9).alias("cum_hazard"),
            micro6(F.sqrt(F.col("v_nano").cast("double") / 1.0e9)).alias("hazard_se"),
            micro6(F.exp(-F.col("h_nano").cast("double") / 1.0e9)).alias(
                "survival_fleming_harrington"
            ),
        )
        .orderBy("duration_days")
    )


def nelson_aalen_hazard_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
{_KM_RISK_SQL},
cum AS (
  SELECT duration_days, n_risk, n_events, n_censored,
         sum(CAST(floor(n_events::double / n_risk::double * 1000000000.0 + 0.5)
                  AS BIGINT))
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h_nano,
         sum(CAST(floor(n_events::double / (n_risk::double * n_risk::double)
                        * 1000000000.0 + 0.5) AS BIGINT))
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_nano
  FROM stepped
)
SELECT duration_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       h_nano / 1.0e9 AS cum_hazard,
       floor(sqrt(v_nano::double / 1.0e9) * 1000000.0 + 0.5) / 1000000.0
         AS hazard_se,
       floor(exp(-h_nano::double / 1.0e9) * 1000000.0 + 0.5) / 1000000.0
         AS survival_fleming_harrington
FROM cum
WHERE n_events > 0
ORDER BY duration_days
"""


KM_CI_Z = 1.96  # normal 95% band


def km_greenwood_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve with the Greenwood 95% confidence band:
    Var(S) = S²·Σ dᵢ/(nᵢ(nᵢ−dᵢ)), CI = S ± 1.96·se clamped to [0,1] —
    what :func:`membership_survival_km` should be read with (a tail
    estimated from a 3-member risk set and one from 300 print the same
    point value; only the band tells them apart).

    Exactness: the KM product reuses the log-domain nano discipline; the
    Greenwood sum is per-term nano-quantized BEFORE its cumulative sum;
    the extinction step (d = n) pins S = 0 and the band to NULL (the
    Greenwood term divides by n−d) in both engines.

    Scale shape: tenure-vocabulary frame only, same as the KM."""
    from pyspark.sql import Window

    stepped = _km_risk_frame(spark, sf_dir)
    w = Window.orderBy("duration_days")
    extinct = F.col("n_events") >= F.col("n_risk")
    term_nano = F.when(extinct, F.lit(0)).otherwise(
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1000000000.0
            + 0.5
        ).cast("long")
    )
    g_nano = F.when(extinct, F.lit(0)).otherwise(
        F.floor(
            F.col("n_events").cast("double")
            / (
                F.col("n_risk").cast("double")
                * (F.col("n_risk") - F.col("n_events")).cast("double")
            )
            * 1000000000.0
            + 0.5
        ).cast("long")
    )
    cum = stepped.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(term_nano).over(w).alias("cum_nano"),
        F.sum(g_nano).over(w).alias("g_nano"),
        F.max(extinct.cast("int")).over(w).alias("hit_zero"),
    )
    micro6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    s = F.exp(F.col("cum_nano") / 1000000000.0)
    se = s * F.sqrt(F.col("g_nano").cast("double") / 1.0e9)
    return (
        cum.filter(F.col("n_events") > 0)
        .select(
            "duration_days",
            "n_risk",
            "n_events",
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(micro6(s))
            .alias("survival"),
            F.when(F.col("hit_zero") == 0, micro6(se)).alias("survival_se"),
            F.when(F.col("hit_zero") == 0, micro6(F.greatest(s - KM_CI_Z * se, F.lit(0.0))))
            .otherwise(F.lit(0.0))
            .alias("ci_lo"),
            F.when(F.col("hit_zero") == 0, micro6(F.least(s + KM_CI_Z * se, F.lit(1.0))))
            .otherwise(F.lit(0.0))
            .alias("ci_hi"),
        )
        .orderBy("duration_days")
    )


def km_greenwood_ci_sql() -> str:
    return f"""
WITH m AS ({memberships_2024_sql()}),
{_KM_RISK_SQL},
cum AS (
  SELECT duration_days, n_risk, n_events, n_censored,
         sum(CASE WHEN n_events >= n_risk THEN 0
                  ELSE CAST(floor(ln((n_risk - n_events)::double / n_risk::double)
                                  * 1000000000.0 + 0.5) AS BIGINT) END)
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_nano,
         sum(CASE WHEN n_events >= n_risk THEN 0
                  ELSE CAST(floor(n_events::double
                                  / (n_risk::double * (n_risk - n_events)::double)
                                  * 1000000000.0 + 0.5) AS BIGINT) END)
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_nano,
         max((n_events >= n_risk)::int)
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
  FROM stepped
)
SELECT duration_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE floor(exp(cum_nano / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0
       END AS survival,
       CASE WHEN hit_zero = 0
            THEN floor(exp(cum_nano / 1000000000.0)
                       * sqrt(g_nano::double / 1.0e9) * 1000000.0 + 0.5) / 1000000.0
       END AS survival_se,
       CASE WHEN hit_zero = 0
            THEN floor(greatest(exp(cum_nano / 1000000000.0)
                                - {KM_CI_Z!r} * exp(cum_nano / 1000000000.0)
                                  * sqrt(g_nano::double / 1.0e9), 0.0)
                       * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS ci_lo,
       CASE WHEN hit_zero = 0
            THEN floor(least(exp(cum_nano / 1000000000.0)
                             + {KM_CI_Z!r} * exp(cum_nano / 1000000000.0)
                               * sqrt(g_nano::double / 1.0e9), 1.0)
                       * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS ci_hi
FROM cum
WHERE n_events > 0
ORDER BY duration_days
"""


RMST_HORIZON_DAYS = 365  # restriction time for the mean survival


def rmst_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time: the area under the KM curve up to
    RMST_HORIZON_DAYS — "expected retained days in the first year", the
    single number the KM curve's shape integrates to, reported beside the
    NAIVE mean duration (average of observed durations, which censoring
    biases low — the gap between the two columns IS the censoring bias).

    Exactness: the KM survival at each event time is the micro-rounded
    log-domain product (the membership_survival_km discipline); RMST sums
    survival-micro × interval-days products as exact integers, one
    division at the edge.  The tail past the last event carries the last
    survival value to the horizon.

    Scale shape: tenure-vocabulary frame only."""
    from pyspark.sql import Window

    stepped = _km_risk_frame(spark, sf_dir)
    w = Window.orderBy("duration_days")
    extinct = F.col("n_events") >= F.col("n_risk")
    term_nano = F.when(extinct, F.lit(0)).otherwise(
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1000000000.0
            + 0.5
        ).cast("long")
    )
    cum = (
        stepped.filter(F.col("n_events") > 0)
        .select(
            "duration_days",
            "n_events",
            F.sum(term_nano).over(w).alias("cum_nano"),
            F.max(extinct.cast("int")).over(w).alias("hit_zero"),
        )
    )
    s_micro = F.when(F.col("hit_zero") == 1, F.lit(0).cast("long")).otherwise(
        F.floor(F.exp(F.col("cum_nano") / 1000000000.0) * 1000000.0 + 0.5).cast("long")
    )
    # interval [t_i, min(t_{i+1}, H)) carries S(t_i); [0, t_1) carries 1
    stepsd = cum.select(
        "duration_days",
        s_micro.alias("s_micro"),
        F.coalesce(
            F.lead("duration_days").over(w), F.lit(RMST_HORIZON_DAYS)
        ).alias("next_t"),
        F.row_number().over(w).alias("rn"),
    )
    seg = F.greatest(
        F.least(F.col("next_t"), F.lit(RMST_HORIZON_DAYS))
        - F.least(F.col("duration_days"), F.lit(RMST_HORIZON_DAYS)),
        F.lit(0),
    )
    head = F.when(
        F.col("rn") == 1,
        dec38(F.lit(1000000)) * dec38(F.least(F.col("duration_days"), F.lit(RMST_HORIZON_DAYS))),
    ).otherwise(dec38(F.lit(0)))
    area = stepsd.agg(
        (
            F.sum(dec38(F.col("s_micro")) * dec38(seg) + head) / 1.0e6
        ).alias("rmst_days"),
        F.count("*").alias("n_event_times"),
    )
    m = build_memberships_2024(spark, sf_dir)
    # exact int sum / count, not avg(): engine-internal avg accumulation
    # order is not part of either engine's contract
    naive = m.agg(
        F.count("*").alias("n_memberships"),
        (
            F.sum(F.datediff(F.col("end_date"), F.col("start_date"))).cast("double")
            / F.count("*").cast("double")
        ).alias("naive"),
    )
    from ..functions.money import micro

    return area.join(F.broadcast(naive)).select(
        F.lit(RMST_HORIZON_DAYS).alias("horizon_days"),
        "n_memberships",
        "n_event_times",
        micro(F.col("rmst_days").cast("double")).alias("rmst_days"),
        micro(F.col("naive")).alias("naive_mean_duration_days"),
    )


def rmst_membership_sql() -> str:
    from ..functions.money import micro_sql

    h = RMST_HORIZON_DAYS
    return f"""
WITH m AS ({memberships_2024_sql()}),
{_KM_RISK_SQL},
cum AS (
  SELECT duration_days, n_events,
         sum(CASE WHEN n_events >= n_risk THEN 0
                  ELSE CAST(floor(ln((n_risk - n_events)::double / n_risk::double)
                                  * 1000000000.0 + 0.5) AS BIGINT) END)
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_nano,
         max((n_events >= n_risk)::int)
           OVER (ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
  FROM stepped
  WHERE n_events > 0
),
stepsd AS (
  SELECT duration_days,
         CASE WHEN hit_zero = 1 THEN 0
              ELSE CAST(floor(exp(cum_nano / 1000000000.0) * 1000000.0 + 0.5)
                        AS BIGINT) END AS s_micro,
         coalesce(lead(duration_days) OVER (ORDER BY duration_days), {h}) AS next_t,
         row_number() OVER (ORDER BY duration_days) AS rn
  FROM cum
),
area AS (
  SELECT sum(s_micro::hugeint
             * greatest(least(next_t, {h}) - least(duration_days, {h}), 0)::hugeint
             + CASE WHEN rn = 1
                    THEN 1000000::hugeint * least(duration_days, {h})::hugeint
                    ELSE 0 END) / 1.0e6 AS rmst_days,
         count(*) AS n_event_times
  FROM stepsd
),
naive AS (
  SELECT count(*) AS n_memberships,
         sum(end_date - start_date)::double / count(*)::double AS naive
  FROM m
)
SELECT {h} AS horizon_days, CAST(n_memberships AS BIGINT) AS n_memberships,
       CAST(n_event_times AS BIGINT) AS n_event_times,
       {micro_sql('rmst_days::double')} AS rmst_days,
       {micro_sql('naive')} AS naive_mean_duration_days
FROM area, naive
"""
