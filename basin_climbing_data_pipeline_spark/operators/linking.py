"""Record-linking operators: refund↔original matching, regex-key joins,
membership flow, at-risk report.

- :func:`link_refunds`: J11 — match each refund row to candidate originals
  by (same customer, same item description, original within 30 days before
  the refund); unique candidate → direct link, multiple → per-group mode
  category (reference link_refunds_to_categories.py:77-141 — the reference
  keys on (abs(amount), 7-day window); this corpus has continuous synthetic
  amounts, so the blocking key is the item description instead, same
  unique-vs-mode resolution).
- :func:`regex_key_enrichment`: J15 — extract a numeric key from a free-text
  column by regex and broadcast-join it to a dimension (the reference's
  ``membership #(\\d+)`` description joins,
  customer_events_builder.py:159-174).
- :func:`membership_flow`: J2 — new vs ended memberships per week via full
  outer join + zero-fill (reference dashboard.py:1218-1228).
- :func:`at_risk_report`: W8/F2 — report with custom category sort order and
  a formatted deep-link column (reference identify_at_risk_members.py:239-254).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, tracked_persist

REFUND_WINDOW_DAYS = 30


def link_refunds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: link each refund to its original purchase by (customer, item,
    30-day window) — unique candidate links directly, ambiguous ones take
    the per-group mode category."""
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    refunds = txn.filter(F.col("is_refund")).select(
        F.col("transaction_id").alias("refund_id"),
        F.col("customer_id"),
        (-F.col("total_amount")).alias("refund_amount"),
        F.col("txn_date").alias("refund_date"),
        F.col("description").alias("refund_description"),
    )
    originals = txn.filter(~F.col("is_refund")).select(
        F.col("transaction_id").alias("original_id"),
        F.col("customer_id"),
        F.col("txn_date").alias("orig_date"),
        F.col("description").alias("orig_description"),
        F.col("revenue_category").alias("orig_category"),
    )
    cands = refunds.join(
        originals,
        (refunds.customer_id == originals.customer_id)
        & (F.col("orig_description") == F.col("refund_description"))
        & (F.datediff(F.col("refund_date"), F.col("orig_date")).between(0, REFUND_WINDOW_DAYS)),
    ).drop(originals.customer_id)
    # deterministic "first" under duplicate original_ids: lexicographic min of
    # the composite key (transaction ids are strings; '#' occurs in neither)
    link_key = F.concat_ws("#", "original_id", "orig_category")
    # the candidate join is fed by the expensive transactions builder on both
    # sides and consumed by two aggregations; without a cache each
    # aggregation re-evaluates the whole join subtree (4 builder evaluations
    # total).  cands is tiny (refunds x in-window candidates), so caching
    # it halves the builder evaluations (measured 4.7s -> ~2s at sf0.1);
    # tracked, so the registry releases it before the next query
    cands = tracked_persist(cands)
    per_refund = cands.groupBy("refund_id", "customer_id", "refund_amount", "refund_date").agg(
        F.count("*").alias("n_candidates"),
        F.min(link_key).alias("_first_key"),
    )
    # mode category among candidates (deterministic tie-break) for ambiguous links
    cat_counts = cands.groupBy("refund_id", "orig_category").agg(F.count("*").alias("n"))
    wmode = Window.partitionBy("refund_id").orderBy(F.desc("n"), "orig_category")
    mode_cat = (
        cat_counts.withColumn("rn", F.row_number().over(wmode))
        .filter(F.col("rn") == 1)
        .select("refund_id", F.col("orig_category").alias("mode_category"))
    )
    return (
        per_refund.join(mode_cat, "refund_id")
        .select(
            "refund_id",
            "customer_id",
            "refund_amount",
            "refund_date",
            "n_candidates",
            F.when(
                F.col("n_candidates") == 1, F.substring_index("_first_key", "#", 1)
            ).alias("linked_original_id"),
            F.when(F.col("n_candidates") == 1, F.substring_index("_first_key", "#", -1))
            .otherwise(F.col("mode_category"))
            .alias("linked_category"),
        )
        .orderBy("refund_id")
    )


def link_refunds_sql() -> str:
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
refunds AS (
  SELECT transaction_id AS refund_id, customer_id,
         -total_amount AS refund_amount, txn_date AS refund_date,
         description AS refund_description
  FROM txn WHERE is_refund
),
originals AS (
  SELECT transaction_id AS original_id, customer_id,
         txn_date AS orig_date, description AS orig_description,
         revenue_category AS orig_category
  FROM txn WHERE NOT is_refund
),
cands AS (
  SELECT r.refund_id, r.customer_id, r.refund_amount, r.refund_date, o.original_id, o.orig_category
  FROM refunds r JOIN originals o
    ON o.customer_id = r.customer_id
   AND o.orig_description = r.refund_description
   AND r.refund_date - o.orig_date BETWEEN 0 AND {REFUND_WINDOW_DAYS}
),
per_refund AS (
  SELECT refund_id, customer_id, refund_amount, refund_date,
         count(*) AS n_candidates,
         min(original_id || '#' || orig_category) AS first_key
  FROM cands GROUP BY 1, 2, 3, 4
),
mode_cat AS (
  SELECT refund_id, orig_category AS mode_category
  FROM (
    SELECT refund_id, orig_category,
           row_number() OVER (PARTITION BY refund_id
                              ORDER BY count(*) DESC, orig_category) AS rn
    FROM cands GROUP BY refund_id, orig_category
  ) WHERE rn = 1
)
SELECT p.refund_id, p.customer_id, p.refund_amount, p.refund_date, p.n_candidates,
       CASE WHEN p.n_candidates = 1 THEN split_part(p.first_key, '#', 1) END
         AS linked_original_id,
       CASE WHEN p.n_candidates = 1 THEN split_part(p.first_key, '#', 2)
            ELSE m.mode_category END AS linked_category
FROM per_refund p JOIN mode_cat m USING (refund_id)
ORDER BY p.refund_id
"""


def regex_key_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the numeric key from the raw props text by REGEX (not JSON
    parsing — the reference extracts ``membership #(\\d+)`` from free text)
    and broadcast-join the part dimension on it."""
    ev = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    keyed = ev.select(
        F.col("event_id"),
        F.col("event_type"),
        # no-match regexp_extract is '' on BOTH engines, and both ANSI
        # Spark and DuckDB refuse CAST('' AS BIGINT) — nullif first on both
        # sides, the grammar.py pattern (caught by the seeded random-events
        # corpus: props without "k: N"; round-11 ADVICE corrected this
        # comment's earlier claim that DuckDB returns NULL)
        F.nullif(
            F.regexp_extract(F.col("props"), r"\"k\": (\d+)", 1), F.lit("")
        ).cast("long").alias("k"),
    ).filter(F.col("k").isNotNull())
    return (
        keyed.join(F.broadcast(part), keyed.k == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .orderBy("p_type")
    )


def regex_key_enrichment_sql() -> str:
    return """
WITH keyed AS (
  SELECT event_id, event_type,
         CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS BIGINT) AS k
  FROM events
)
SELECT p_type, count(*) AS n_events, count(DISTINCT event_type) AS n_event_types
FROM keyed JOIN part ON k = p_partkey
WHERE k IS NOT NULL
GROUP BY p_type
ORDER BY p_type
"""


def membership_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: per week, memberships started vs ended — full outer join of the
    two weekly aggregates with zero-fill."""
    from .memberships import build_memberships_2024

    m = build_memberships_2024(spark, sf_dir)
    started = m.groupBy(
        F.to_date(F.date_trunc("week", "start_date")).alias("week")
    ).agg(F.count("*").alias("n_started"))
    ended = (
        m.filter(F.col("status") == "END")
        .groupBy(F.to_date(F.date_trunc("week", "end_date")).alias("week"))
        .agg(F.count("*").alias("n_ended"))
    )
    return (
        started.join(ended, "week", "full")
        .select(
            "week",
            F.coalesce("n_started", F.lit(0)).alias("n_started"),
            F.coalesce("n_ended", F.lit(0)).alias("n_ended"),
        )
        .withColumn("net_change", F.col("n_started") - F.col("n_ended"))
        .orderBy("week")
    )


def membership_flow_sql() -> str:
    from .memberships import memberships_2024_sql

    return f"""
WITH m AS ({memberships_2024_sql()}),
started AS (
  SELECT date_trunc('week', start_date)::date AS week, count(*) AS n_started
  FROM m GROUP BY 1
),
ended AS (
  SELECT date_trunc('week', end_date)::date AS week, count(*) AS n_ended
  FROM m WHERE status = 'END' GROUP BY 1
)
SELECT coalesce(s.week, e.week) AS week,
       coalesce(s.n_started, 0) AS n_started,
       coalesce(e.n_ended, 0) AS n_ended,
       coalesce(s.n_started, 0) - coalesce(e.n_ended, 0) AS net_change
FROM started s FULL JOIN ended e ON s.week = e.week
ORDER BY week
"""


AT_RISK_CATEGORY_ORDER = {"cancelled_recently": 1, "expiring_soon": 2, "inactive": 3}


def at_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8/F2: the at-risk member report — bucket members into risk
    categories, order by the business-defined category order then most
    recent visit, and attach a formatted deep-link column."""
    import datetime as dt

    from .events import build_checkins
    from .memberships import build_memberships_2024

    as_of = F.lit(dt.date(2024, 1, 20).strftime("%Y-%m-%d")).cast("date")
    m = build_memberships_2024(spark, sf_dir)
    last_visit = (
        build_checkins(spark, sf_dir)
        .filter(F.col("checkin_date") <= as_of)
        .groupBy("customer_id")
        .agg(F.max("checkin_date").alias("last_visit"))
    )
    per_owner = m.groupBy(F.col("owner_id").alias("customer_id")).agg(
        F.max(F.when(F.col("status") == "ACT", F.col("end_date"))).alias("act_end"),
        F.max(F.when(F.col("status") == "END", F.col("end_date"))).alias("ended_end"),
    )
    cat = (
        F.when(
            F.col("ended_end").isNotNull()
            & (F.col("ended_end") >= F.date_sub(as_of, 7))
            & (F.col("ended_end") <= as_of),
            "cancelled_recently",
        )
        .when(
            F.col("act_end").isNotNull()
            & (F.col("act_end") >= as_of)
            & (F.col("act_end") <= F.date_add(as_of, 7)),
            "expiring_soon",
        )
        .when(
            F.col("last_visit").isNull() | (F.col("last_visit") < F.date_sub(as_of, 7)),
            "inactive",
        )
    )
    order_key = (
        F.when(F.col("risk_category") == "cancelled_recently", 1)
        .when(F.col("risk_category") == "expiring_soon", 2)
        .otherwise(3)
    )
    return (
        per_owner.join(last_visit, "customer_id", "left")
        .withColumn("risk_category", cat)
        .filter(F.col("risk_category").isNotNull())
        .withColumn("sort_key", order_key)
        .withColumn(
            "capitan_link",
            F.format_string("https://app.capitan.example/customers/%d", F.col("customer_id")),
        )
        .select("customer_id", "risk_category", "sort_key", "last_visit", "capitan_link")
        .orderBy("sort_key", F.desc_nulls_last("last_visit"), "customer_id")
    )


def at_risk_report_sql() -> str:
    from .events import checkins_sql
    from .memberships import memberships_2024_sql

    as_of = "DATE '2024-01-20'"
    return f"""
WITH ck AS ({checkins_sql()}),
m AS ({memberships_2024_sql()}),
last_visit AS (
  SELECT customer_id, max(checkin_date) AS last_visit
  FROM ck WHERE checkin_date <= {as_of} GROUP BY customer_id
),
per_owner AS (
  SELECT owner_id AS customer_id,
         max(CASE WHEN status = 'ACT' THEN end_date END) AS act_end,
         max(CASE WHEN status = 'END' THEN end_date END) AS ended_end
  FROM m GROUP BY owner_id
),
cats AS (
  SELECT p.customer_id, lv.last_visit,
         CASE WHEN p.ended_end IS NOT NULL AND p.ended_end >= {as_of} - 7
                   AND p.ended_end <= {as_of}
              THEN 'cancelled_recently'
              WHEN p.act_end IS NOT NULL AND p.act_end >= {as_of}
                   AND p.act_end <= {as_of} + 7
              THEN 'expiring_soon'
              WHEN lv.last_visit IS NULL OR lv.last_visit < {as_of} - 7
              THEN 'inactive' END AS risk_category
  FROM per_owner p LEFT JOIN last_visit lv USING (customer_id)
)
SELECT customer_id, risk_category,
       CASE risk_category WHEN 'cancelled_recently' THEN 1
                          WHEN 'expiring_soon' THEN 2 ELSE 3 END AS sort_key,
       last_visit,
       printf('https://app.capitan.example/customers/%d', customer_id) AS capitan_link
FROM cats
WHERE risk_category IS NOT NULL
ORDER BY sort_key, last_visit DESC NULLS LAST, customer_id
"""


# ---------------------------------------------------------------------------
# cogrouped as-of alignment (applyInPandas over a cogroup)
# ---------------------------------------------------------------------------

COGROUP_SPEND_SCHEMA = (
    "checkin_id long, customer_id long, checkin_date date, "
    "n_txns_to_date long, spend_to_date double"
)

# cogroup key granularity: the pandas function is invoked once PER KEY, so
# cogrouping on raw customer_id costs ~1 ms of Python per customer (measured
# ~15 s over 15 k customers at sf0.1) regardless of data volume.  Cogrouping
# on a hash BUCKET of customers keeps the per-call Arrow batches large and
# does the per-customer work vectorized inside the batch — the call count is
# N_COGROUP_BUCKETS, not n_customers, at any scale.  Size ~ a few × cores.
N_COGROUP_BUCKETS = 64


def _align_spend(left, right):
    """Bucket-level pandas cogroup worker: all checkins and transactions of
    one customer BUCKET arrive together; a grouped backward as-of merge
    (``pd.merge_asof(by=customer_id)``) aligns every checkin with the
    latest transaction on or before it, fully vectorized across the
    bucket's customers.  The right side carries per-customer running
    (count, cents-cumsum) so the matched row IS the answer.

    Dates cross the Arrow boundary as epoch-DAY ints (``checkin_day`` /
    ``txn_day``): object-dtype ``datetime.date`` sorting would put Python
    back on the per-row path the bucketing just removed."""
    import numpy as np
    import pandas as pd

    cols = ["checkin_id", "customer_id", "checkin_date",
            "n_txns_to_date", "spend_to_date"]
    if len(left) == 0:
        return left.iloc[0:0].reindex(columns=cols)
    out = left.sort_values("checkin_day", kind="stable").reset_index(drop=True)
    if len(right) == 0:
        out["n_txns_to_date"] = np.int64(0)
        out["spend_to_date"] = 0.0
        return out[cols]
    r = right.sort_values(["customer_id", "txn_day"], kind="stable").reset_index(drop=True)
    # exact integer cents, same discipline as functions/money.py
    r["_cents"] = np.floor(r["total_amount"].to_numpy() * 100.0 + 0.5).astype("int64")
    g = r.groupby("customer_id", sort=False)
    r["_cum"] = g["_cents"].cumsum()
    r["_cnt"] = g.cumcount() + 1
    # merge_asof needs both frames globally sorted on the `on` key
    r = r.sort_values("txn_day", kind="stable")
    merged = pd.merge_asof(
        out,
        r[["customer_id", "txn_day", "_cum", "_cnt"]],
        left_on="checkin_day",
        right_on="txn_day",
        by="customer_id",
        direction="backward",
    )
    out["n_txns_to_date"] = merged["_cnt"].fillna(0).astype("int64")
    out["spend_to_date"] = merged["_cum"].fillna(0).astype("int64") / 100.0
    return out[cols]


def cogroup_spend_at_checkin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-to-date at every gym check-in, computed with the cogrouped
    ``applyInPandas`` surface: checkins and transactions are each grouped
    by a customer hash bucket and the two groups meet in one Arrow-batched
    pandas function — the Spark-native shape for aligning two large
    per-key sequences (the reference walks per-customer event lists the
    same way, build_customer_master.py:173-243, single-process).

    Why cogroup instead of a join here: the declarative equivalent is a
    per-customer range join (txn_date <= checkin_date) whose intermediate
    fans out to |checkins| × |txns| rows inside every customer before the
    groupBy collapses it; the cogroup path shuffles each side ONCE on the
    bucket key and does a vectorized grouped as-of merge per batch with no
    intermediate blow-up.  The bucket key (md5-derived, N_COGROUP_BUCKETS
    values) rather than raw customer_id is what keeps the Python call
    count constant at scale — see the note above ``_align_spend``.  Money
    stays exact integer cents inside the worker (functions/money.py
    discipline), so the output hash-matches the join-based oracle."""
    from .events import build_checkins
    from .transactions import build_transactions

    epoch = F.lit("1970-01-01").cast("date")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("customer_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(N_COGROUP_BUCKETS),
    ).alias("bucket")
    checkins = build_checkins(spark, sf_dir).select(
        "checkin_id",
        "customer_id",
        "checkin_date",
        F.datediff(F.col("checkin_date"), epoch).alias("checkin_day"),
        bucket,
    )
    txns = build_transactions(spark, sf_dir).select(
        "customer_id",
        F.datediff(F.col("txn_date"), epoch).alias("txn_day"),
        "total_amount",
        bucket,
    )
    return (
        checkins.groupby("bucket")
        .cogroup(txns.groupby("bucket"))
        .applyInPandas(_align_spend, COGROUP_SPEND_SCHEMA)
        .orderBy("checkin_id")
    )


def cogroup_spend_at_checkin_sql() -> str:
    from ..functions.money import to_cents_sql

    from .events import checkins_sql
    from .transactions import transactions_sql

    return f"""
WITH c AS ({checkins_sql()}),
t AS ({transactions_sql()})
SELECT c.checkin_id,
       c.customer_id,
       c.checkin_date,
       count(t.txn_date) AS n_txns_to_date,
       coalesce(sum({to_cents_sql('t.total_amount')}), 0) / 100.0 AS spend_to_date
FROM c
LEFT JOIN t
  ON t.customer_id = c.customer_id AND t.txn_date <= c.checkin_date
GROUP BY c.checkin_id, c.customer_id, c.checkin_date
ORDER BY c.checkin_id
"""
