"""Skew-aware aggregation: explicit two-phase salted groupBy.

At 100 TB a hot customer key (one member with millions of checkins) makes a
single reducer the straggler.  AQE's skew-join splitting handles joins; for
aggregations the classic fix is salting: shard each key across
``SALT_BUCKETS`` partial groups, aggregate partials, then aggregate the
partials per key.  Results are identical to the direct groupBy (sums of
BIGINT cents are associative and exact), which is exactly what the DuckDB
oracle checks.

This is a demonstration operator: at local scale the direct plan is fine
(Spark's hash aggregation already does map-side partial combine); the value
is the pattern plus the oracle proof that salting preserves semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import sum_money_sql, to_cents
from ..io import load_table

SALT_BUCKETS = 16


def salted_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event spend via salted two-phase aggregation."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.select(
        "user_id",
        to_cents(F.col("value")).alias("cents"),
        (F.col("event_id") % SALT_BUCKETS).alias("salt"),
    )
    partial = salted.groupBy("user_id", "salt").agg(
        F.sum("cents").alias("p_cents"), F.count("*").alias("p_n")
    )
    return (
        partial.groupBy("user_id")
        .agg(
            (F.sum("p_cents") / 100.0).alias("total_spend"),
            F.sum("p_n").alias("n_events"),
        )
        .orderBy("user_id")
    )


def salted_user_spend_sql() -> str:
    # the oracle is the UNSALTED aggregation — proving the two-phase plan
    # computes the same answer
    return f"""
SELECT user_id,
       {sum_money_sql('value')} AS total_spend,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""
