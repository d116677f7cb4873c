"""SparkSession factory.

Local test profile runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) in one JVM;
the config defaults are chosen to be cluster-safe at much larger scale:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast demotion)
- shuffle partitions sized for the local profile but overridable — at cluster
  scale you'd set this ~2-3x total cores or rely on AQE coalescing
- session timezone pinned to UTC: the reference parses every timestamp with
  ``utc=True`` then strips the tz (reference shared/data_loader.py:23-28);
  pinning the session TZ gives the same naive-UTC semantics engine-wide.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "basin-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    return configure(
        SparkSession.builder.master(f"local[{cpus}]").appName(app_name),
        shuffle_partitions=sp,
    ).getOrCreate()


# AQE partition-coalescing floor.  The default 1m floor coalesces a
# few-MB shuffle down to a handful of partitions — correct for
# byte-bound stages, but it throttles CPU-bound stages whose cost is
# rows/groups in PYTHON, not bytes (measured round 12:
# flags_via_applyinpandas 13.3 s -> 3.1 s at sf0.1 once the
# applyInPandas stage kept its parallelism).  64k keeps tiny shuffles
# coalesced while letting parallelismFirst reach defaultParallelism for
# the MB-scale ones; at cluster scale post-shuffle partitions are far
# above either floor, so the setting only ever binds on small inputs.
DEFAULT_AQE_MIN_PARTITION_SIZE = "64KB"


def _aqe_min_partition_size() -> str:
    return os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", DEFAULT_AQE_MIN_PARTITION_SIZE
    )


def configure(builder: SparkSession.Builder, shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS):
    """Apply engine defaults to any builder (also used on driver-provided sessions)."""
    return (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            _aqe_min_partition_size(),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )


def tune_session(spark: SparkSession) -> SparkSession:
    """Best-effort runtime tuning for an externally-created session (the
    driver hands us one); only touches settings that are runtime-mutable."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        (
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            _aqe_min_partition_size(),
        ),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this context; fine
    return spark
