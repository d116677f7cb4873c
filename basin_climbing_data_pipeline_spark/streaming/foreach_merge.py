"""Streaming incremental upsert: ``foreachBatch`` driving the ST1
window-splice merge (reference pipeline_handler.py:429-479 daily re-fetch,
run as a stream instead of a cron batch).

Each micro-batch is one "re-fetched window": ``replace_window_merge`` keeps
stored rows older than the batch's window start, splices the fresh rows in,
and dedups by id (fresh wins) — so overlapping windows replayed across
batches never duplicate.  The merged table is written to a new version
directory per batch and the latest version is the table (the
write-new-then-swap discipline; at scale this is Delta MERGE or dynamic
partition overwrite — same plan shape, transactional commit instead of a
version pointer).

Differential contract (tests/test_foreachbatch_merge.py): streaming the
events table as overlapping window files through this sink equals the batch
dedup of the same data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import replace_window_merge
from .events_stream import EVENTS_NANOS_SCHEMA, _stream_partitions


def merge_stream(
    spark: SparkSession, source_dir: str, target_dir: str, sink_name: str
) -> DataFrame:
    """Stream event files from ``source_dir`` (one micro-batch per file via
    maxFilesPerTrigger) and maintain a merged table under ``target_dir``.
    Returns the final merged table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_NANOS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    stream = raw.select(
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.to_date(F.expr("timestamp_micros(ts div 1000)")).alias("event_date"),
        "user_id",
        "event_type",
        "value",
    )
    versions: list[str] = []

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not versions:
            existing = spark.createDataFrame([], batch_df.schema)
        else:
            existing = spark.read.parquet(versions[-1])
        window_start = batch_df.agg(F.min("event_date")).collect()[0][0]
        if window_start is None:  # empty batch
            return
        merged = replace_window_merge(
            existing,
            batch_df,
            "event_date",
            window_start.strftime("%Y-%m-%d"),
            "event_id",
            ["ts_us", "event_id"],
        )
        out = os.path.join(target_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        versions.append(out)

    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(target_dir, "_chk"))
            .queryName(sink_name)
            .start()
        )
        q.awaitTermination(timeout=300)
    if not versions:
        return spark.createDataFrame([], stream.schema)
    return spark.read.parquet(versions[-1])
