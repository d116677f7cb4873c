"""External sync sink (S8): push derived rows to a SaaS endpoint.

The reference syncs flags/profiles row-by-row from the driver process with
per-request retry, Retry-After handling, and a fixed inter-request pace
(reference data_pipeline/sync_to_klaviyo.py:82-119 request/retry loop,
:278-398 profile sync with 0.02 s pacing; sync_flags_to_shopify.py same
shape).  The Spark-native expression is ``df.foreachPartition``: each
executor pushes its partition in batches through a transport it constructs
locally (connections don't serialize), so N executors push concurrently and
the driver never sees a row.  Out of correctness scope per SURVEY §2.1 —
no oracle entry — but the batching/retry mechanics are pytest-covered with
a local capture transport (tests/test_sync_sink.py).

At 100 TB scale the knobs that matter:
- ``batch_size`` bounds request payloads (the reference's page_size=100
  discipline, fetch_capitan_membership_data.py:43);
- ``pace_s`` is the per-executor rate limit — cluster-wide throughput is
  ``executors / pace_s``, so size it to the provider's global budget;
- retries are per-batch with exponential backoff and an explicit
  honor-the-server ``RateLimited.retry_after`` path;
- failed batches after ``max_retries`` are COUNTED, not re-raised, matching
  the reference's log-and-continue loop (sync_to_klaviyo.py:341-345) — the
  job finishes and the report says how much didn't land.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row


class TransientPushError(Exception):
    """Retryable transport failure (5xx / connection reset analog)."""


class RateLimited(TransientPushError):
    """429 analog; carries the server-requested wait
    (reference sync_to_klaviyo.py:98-102 Retry-After handling)."""

    def __init__(self, retry_after_s: float = 0.0):
        super().__init__(f"rate limited; retry after {retry_after_s}s")
        self.retry_after_s = retry_after_s


# a transport takes one batch of plain dicts and delivers it (POST analog);
# factories build the transport INSIDE the partition (executor-side)
Transport = Callable[[list[dict]], None]
TransportFactory = Callable[[], Transport]


@dataclass
class SyncReport:
    rows_pushed: int
    batches_pushed: int
    retries: int
    failed_batches: int
    failed_rows: int


def _push_iter(
    rows: Iterator[Row],
    transport_factory: TransportFactory,
    batch_size: int,
    max_retries: int,
    backoff_s: float,
    pace_s: float,
    counters: dict,
    sleep: Callable[[float], None],
) -> None:
    transport = transport_factory()
    batch: list[dict] = []

    def flush() -> None:
        if not batch:
            return
        for attempt in range(max_retries + 1):
            try:
                transport(list(batch))
                counters["rows"].add(len(batch))
                counters["batches"].add(1)
                break
            except RateLimited as e:
                # server-directed wait does not consume a retry budget slot
                # beyond the attempt itself (reference waits then re-tries)
                counters["retries"].add(1)
                if attempt == max_retries:
                    counters["failed_batches"].add(1)
                    counters["failed_rows"].add(len(batch))
                    break
                sleep(max(e.retry_after_s, 0.0))
            except TransientPushError:
                counters["retries"].add(1)
                if attempt == max_retries:
                    counters["failed_batches"].add(1)
                    counters["failed_rows"].add(len(batch))
                    break
                sleep(backoff_s * (2**attempt))
        batch.clear()
        if pace_s:
            sleep(pace_s)

    for row in rows:
        batch.append(row.asDict(recursive=True))
        if len(batch) >= batch_size:
            flush()
    flush()


def sync_to_external(
    df: DataFrame,
    transport_factory: TransportFactory,
    batch_size: int = 100,
    max_retries: int = 3,
    backoff_s: float = 0.0,
    pace_s: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
) -> SyncReport:
    """Push every row of ``df`` through the transport, partition-parallel.

    Returns a :class:`SyncReport` aggregated via Spark accumulators (the
    engine-side analog of the reference's ``sync_results`` dict,
    sync_to_klaviyo.py:52-61)."""
    sc = df.sparkSession.sparkContext
    counters = {
        "rows": sc.accumulator(0),
        "batches": sc.accumulator(0),
        "retries": sc.accumulator(0),
        "failed_batches": sc.accumulator(0),
        "failed_rows": sc.accumulator(0),
    }

    def run(it: Iterable[Row]) -> None:
        _push_iter(
            iter(it),
            transport_factory,
            batch_size,
            max_retries,
            backoff_s,
            pace_s,
            counters,
            sleep,
        )

    df.foreachPartition(run)
    return SyncReport(
        rows_pushed=counters["rows"].value,
        batches_pushed=counters["batches"].value,
        retries=counters["retries"].value,
        failed_batches=counters["failed_batches"].value,
        failed_rows=counters["failed_rows"].value,
    )
