"""Incremental-batch builders: window replace-merge, dedup-on-append,
snapshotting.

The reference's daily pipeline refetches a trailing window and splices it
into the stored table (ST1: keep stored rows older than the window, concat
fresh rows, dedup by id keep-first — pipeline_handler.py:429-479), keeps
monthly immutable snapshots (pipeline_handler.py:343-354), and skips rows
that already exist on append (ST4, experiment_tracking.py:86-94).

Engine equivalents, all pure DataFrame transforms (unit-tested; they're
pipeline mechanics, not queries, so they carry no oracle entries):

- :func:`replace_window_merge` — the ST1 splice with an explicit
  deterministic keep-first ordering (SURVEY.md §4.3).
- :func:`append_if_absent` — ST4 via left-anti join.
- :func:`write_snapshot` — date-partitioned snapshot write
  (``partitionBy(snapshot_date)`` replaces the reference's date-suffixed
  object keys).

At scale the merge writes only the affected date partitions
(partition-overwrite), which these builders express by keying everything on
the date column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def replace_window_merge(
    existing: DataFrame,
    fresh: DataFrame,
    date_col: str,
    window_start,
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Keep existing rows with date < window_start, union the fresh window,
    dedup by id keeping the first row under an explicit ordering (fresh rows
    win ties by sorting on is_fresh desc first)."""
    kept = existing.filter(F.col(date_col) < F.lit(window_start)).withColumn(
        "_is_fresh", F.lit(0)
    )
    incoming = fresh.filter(F.col(date_col) >= F.lit(window_start)).withColumn(
        "_is_fresh", F.lit(1)
    )
    unioned = kept.unionByName(incoming)
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_is_fresh"), *[F.col(c) for c in order_cols]
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_fresh")
    )


def replace_bounded_window_merge(
    existing: DataFrame,
    fresh: DataFrame,
    date_col: str,
    window_start,
    window_end,
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Order-insensitive variant of :func:`replace_window_merge` for streamed
    re-fetch windows that may arrive in ANY order (Spark's file source gives
    no ordering guarantee): keep existing rows strictly OUTSIDE
    ``[window_start, window_end]`` — on *both* sides, so a window processed
    before a later one never deletes that later window's rows — splice the
    fresh rows inside the window, dedup by id with fresh-wins.

    ``replace_window_merge`` (one-sided) remains correct for the cron-batch
    path where windows are refetched in ascending order and the newest window
    is authoritative for everything after its start."""
    kept = existing.filter(
        (F.col(date_col) < F.lit(window_start)) | (F.col(date_col) > F.lit(window_end))
    ).withColumn("_is_fresh", F.lit(0))
    incoming = fresh.filter(
        (F.col(date_col) >= F.lit(window_start)) & (F.col(date_col) <= F.lit(window_end))
    ).withColumn("_is_fresh", F.lit(1))
    unioned = kept.unionByName(incoming)
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_is_fresh"), *[F.col(c) for c in order_cols]
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_fresh")
    )


def append_if_absent(existing: DataFrame, incoming: DataFrame, id_col: str) -> DataFrame:
    """ST4: append only rows whose id is not already present."""
    new_rows = incoming.join(existing.select(id_col), id_col, "left_anti")
    return existing.unionByName(new_rows)


def snapshot_column(date_value: str) -> Column:
    return F.lit(date_value).cast("date").alias("snapshot_date")


def write_snapshot(df: DataFrame, path: str, snapshot_date: str) -> None:
    """Monthly immutable snapshot as a date partition."""
    df.withColumn("snapshot_date", snapshot_column(snapshot_date)).write.mode(
        "append"
    ).partitionBy("snapshot_date").parquet(path)
