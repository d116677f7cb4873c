"""Paginated / cursor API scans (S4/S5) as bronze-layer ingestion.

The reference walks offset-paginated APIs in a serial driver loop —
page_size=100 (larger 502s), expected total from page 1's ``count``,
fail-on-partial unless told otherwise (reference
fetch_capitan_membership_data.py:31-109) — and provider SDK cursors the
same way (fetch_stripe_data.py:97-160 auto-paging, pipeline_handler.py:
180-243 Square cursor).  Engine mapping per SURVEY §2.1: ingestion jobs
that land bronze parquet, not query operators — no oracle entries; the
mechanics are pytest-covered with local fake providers
(tests/test_paginated_sources.py).

Scale design:

- **Offset pagination parallelizes.**  Page 1 is fetched driver-side to
  learn the expected count; the remaining page indices distribute over
  executors (``parallelize(pages).flatMap(fetch)``), so wall time is
  pages/executors × latency instead of pages × latency.  RDD use is
  deliberate — per-partition imperative IO is the one place the DataFrame
  API can't express the work.
- **Cursor chains cannot parallelize** (each token comes from the previous
  response): the walk stays serial on the driver, but rows land in chunked
  parquet appends so driver memory holds one chunk, never the table.
- Both land to a bronze dir first and return a SCAN of it: downstream
  reads are deterministic and re-runnable even though the provider is not,
  and validation counts don't re-hit the API.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class PartialFetchError(Exception):
    """Raised when fewer rows than the provider-reported total arrived and
    ``fail_on_partial`` is set (reference :103-109)."""


# fetch_page(page_number_1_based, page_size) ->
#   {"results": [dict, ...], "count": int | absent, "next": bool | absent}
PageFetcher = Callable[[int, int], dict]
# fetch_cursor(cursor | None) -> (rows, next_cursor | None)
CursorFetcher = Callable[[object], tuple[list[dict], object]]


def paginated_scan(
    spark: SparkSession,
    fetch_page: PageFetcher,
    schema: str,
    bronze_dir: str,
    page_size: int = 100,
    fail_on_partial: bool = True,
    max_parallelism: int = 32,
    max_pages: int = 100_000,
) -> DataFrame:
    """S4: offset-paginated scan → bronze parquet → DataFrame.

    Page-1 errors always raise (nothing fetched, reference :58-59).  With
    ``fail_on_partial`` (default, reference default) a failing later page
    fails the whole job; otherwise failed pages contribute nothing, the
    partial table lands, and the count mismatch is reported on stderr
    (the reference's WARNING path, :103-109).

    The fetched rows never collect to the driver: the remaining pages are
    an RDD written to bronze executor-side (driver holds page 1 only), and
    the validation count runs against the written table.  ``max_pages``
    backstops a provider that ignores the page parameter (the same
    runaway-feed guard as ``cursor_scan``)."""
    first = fetch_page(1, page_size)
    rows = list(first.get("results", []))
    expected = first.get("count")

    if expected is not None:
        n_pages = max(1, math.ceil(expected / page_size))
    elif first.get("next"):
        n_pages = None  # unknown total: serial walk below
    else:
        n_pages = 1

    first_df = spark.createDataFrame(rows, schema)
    if n_pages == 1:
        first_df.write.mode("overwrite").parquet(bronze_dir)
    elif n_pages is None:
        # provider reports no total: sequential walk until empty/no-next,
        # same as the reference loop, bounded by max_pages
        extra: list[dict] = []
        for page in range(2, max_pages + 2):
            data = fetch_page(page, page_size)
            got = data.get("results", [])
            extra.extend(got)
            if not got or not data.get("next", bool(got)):
                break
        else:
            raise RuntimeError(f"pagination exceeded {max_pages} pages")
        first_df.unionByName(spark.createDataFrame(extra, schema)).write.mode(
            "overwrite"
        ).parquet(bronze_dir)
    else:
        if n_pages > max_pages:
            raise RuntimeError(
                f"provider reports {n_pages} pages, exceeding max_pages={max_pages}"
            )
        sc = spark.sparkContext

        def fetch_one(page: int) -> list[dict]:
            try:
                return fetch_page(page, page_size).get("results", [])
            except Exception:
                if fail_on_partial:
                    raise  # task error -> job error -> fail-on-partial
                return []

        pages = list(range(2, n_pages + 1))
        slices = max(1, min(len(pages), max_parallelism))
        rest = spark.createDataFrame(
            sc.parallelize(pages, slices).flatMap(fetch_one), schema
        )
        first_df.unionByName(rest).write.mode("overwrite").parquet(bronze_dir)

    df = spark.read.parquet(bronze_dir)
    if expected is not None:
        got_n = df.count()
        if got_n != expected:
            msg = f"expected {expected} records, got {got_n} in {bronze_dir}"
            if fail_on_partial and got_n < expected:
                raise PartialFetchError(msg)
            import sys

            print(f"WARNING: {msg}", file=sys.stderr)
    return df


def cursor_scan(
    spark: SparkSession,
    fetch_cursor: CursorFetcher,
    schema: str,
    bronze_dir: str,
    chunk_rows: int = 10_000,
    max_batches: int = 100_000,
) -> DataFrame:
    """S5: cursor-chained scan → chunked bronze parquet → DataFrame.

    The driver walks the cursor (serial by protocol) and flushes every
    ``chunk_rows`` rows as a parquet append, so memory is bounded by one
    chunk regardless of table size.  ``max_batches`` is a runaway-cursor
    backstop (a provider that keeps returning the same token)."""
    buf: list[dict] = []
    cursor: object = None
    wrote_any = False

    def flush(mode: str) -> str:
        nonlocal wrote_any
        spark.createDataFrame(buf, schema).write.mode(mode).parquet(bronze_dir)
        wrote_any = True
        buf.clear()
        return "append"

    mode = "overwrite"
    for _ in range(max_batches):
        batch, cursor = fetch_cursor(cursor)
        buf.extend(batch)
        if len(buf) >= chunk_rows:
            mode = flush(mode)
        if cursor is None:
            break
    else:
        raise RuntimeError(f"cursor chain exceeded {max_batches} batches")
    if buf or not wrote_any:
        flush(mode)
    return spark.read.parquet(bronze_dir)
