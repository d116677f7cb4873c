"""AB experiment tracking (reference experiment_tracking.py:15-127).

The reference logs one ``customer_experiment_entries`` row the first time a
customer receives an AB-test flag (log_experiment_entry: skip-if-exists per
(customer, experiment), group from the md5 assignment, entry_flag = the
triggering flag).  Here the same table derives set-at-a-time from the flags
engine: the offer-flag family is the experiment's entry surface; the earliest
triggering flag per customer wins (deterministic tie-break on flag_type).

The skip-if-exists append semantics (re-running the pipeline must not
duplicate entries) are the generic ``append_if_absent`` incremental operator
(operators/incremental.py, ST4) — pytest exercises the replay in
tests/test_experiments.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .flags import OFFER_FLAG_TYPES, build_flags, build_flags_sql

EXPERIMENT_ID = "day_pass_conversion_2024_01"

ENTRY_FLAGS = tuple(OFFER_FLAG_TYPES) + tuple(f"child_{t}" for t in OFFER_FLAG_TYPES)


def experiment_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (customer, experiment): group assignment + entry flag."""
    flags = build_flags(spark, sf_dir).filter(F.col("flag_type").isin(*ENTRY_FLAGS))
    w = Window.partitionBy("customer_id").orderBy("triggered_date", "flag_type")
    return (
        flags.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "customer_id",
            F.lit(EXPERIMENT_ID).alias("experiment_id"),
            F.col("ab_group").alias("ab_group"),
            F.col("flag_type").alias("entry_flag"),
            F.col("triggered_date").alias("entry_date"),
        )
        .orderBy("customer_id")
    )


def experiment_entries_sql() -> str:
    entry_list = ", ".join(f"'{t}'" for t in ENTRY_FLAGS)
    return f"""
WITH fl AS ({build_flags_sql()}),
ranked AS (
  SELECT customer_id, ab_group, flag_type, triggered_date,
         row_number() OVER (PARTITION BY customer_id
                            ORDER BY triggered_date, flag_type) AS rn
  FROM fl WHERE flag_type IN ({entry_list})
)
SELECT customer_id, '{EXPERIMENT_ID}' AS experiment_id, ab_group,
       flag_type AS entry_flag, triggered_date AS entry_date
FROM ranked WHERE rn = 1
ORDER BY customer_id
"""
