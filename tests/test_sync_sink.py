"""S8 external sync sink: foreachPartition batching, retry, give-up.

The transports are local doubles writing to a shared temp dir (foreachPartition
runs in Python worker processes, so in-memory capture would be lost); batch
payloads land as JSON lines keyed by a fresh file per call.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest

from basin_climbing_data_pipeline_spark.sources.sync_sink import (
    RateLimited,
    TransientPushError,
    sync_to_external,
)


def _capture_factory(out_dir: str):
    def factory():
        def transport(batch: list[dict]) -> None:
            path = os.path.join(out_dir, f"batch_{uuid.uuid4().hex}.json")
            with open(path, "w") as f:
                json.dump(batch, f)

        return transport

    return factory


def _flaky_factory(out_dir: str, fail_dir: str, exc_cls):
    """Fails the FIRST delivery attempt of every batch (marker file keyed by
    the batch's first id), succeeds on retry."""

    def factory():
        def transport(batch: list[dict]) -> None:
            marker = os.path.join(fail_dir, f"seen_{batch[0]['id']}")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("1")
                raise exc_cls()
            path = os.path.join(out_dir, f"batch_{uuid.uuid4().hex}.json")
            with open(path, "w") as f:
                json.dump(batch, f)

        return transport

    return factory


def _always_fail_factory():
    def factory():
        def transport(batch: list[dict]) -> None:
            raise TransientPushError("down")

        return transport

    return factory


def _delivered(out_dir: str) -> list[list[dict]]:
    out = []
    for p in glob.glob(os.path.join(out_dir, "batch_*.json")):
        with open(p) as f:
            out.append(json.load(f))
    return out


def _rows(spark, n: int, parts: int):
    return spark.range(n).selectExpr("id", "concat('cust_', id) AS email").repartition(parts)


def test_all_rows_delivered_in_batches(spark, tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(out)
    report = sync_to_external(
        _rows(spark, 10, 2), _capture_factory(out), batch_size=3
    )
    batches = _delivered(out)
    ids = sorted(r["id"] for b in batches for r in b)
    assert ids == list(range(10))
    assert all(len(b) <= 3 for b in batches)
    assert report.rows_pushed == 10
    assert report.batches_pushed == len(batches)
    assert report.retries == 0
    assert report.failed_rows == 0


@pytest.mark.parametrize("exc_cls", [TransientPushError, lambda: RateLimited(0.0)])
def test_retry_then_success(spark, tmp_path, exc_cls):
    out, fails = str(tmp_path / "out"), str(tmp_path / "fails")
    os.makedirs(out)
    os.makedirs(fails)
    report = sync_to_external(
        _rows(spark, 8, 2),
        _flaky_factory(out, fails, exc_cls),
        batch_size=4,
        max_retries=2,
        backoff_s=0.0,
    )
    ids = sorted(r["id"] for b in _delivered(out) for r in b)
    assert ids == list(range(8))  # delivered exactly once each
    assert report.rows_pushed == 8
    assert report.retries >= 1
    assert report.failed_batches == 0


def test_gives_up_after_max_retries_without_raising(spark):
    report = sync_to_external(
        _rows(spark, 6, 2),
        _always_fail_factory(),
        batch_size=2,
        max_retries=1,
        backoff_s=0.0,
    )
    assert report.rows_pushed == 0
    assert report.failed_rows == 6
    # 1 initial + 1 retry per batch
    assert report.retries == report.failed_batches * 2
