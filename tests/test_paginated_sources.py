"""S4/S5 ingestion scans: parallel offset pagination, serial cursor chain.

Fake providers are closures over in-test datasets; page fetchers must be
picklable because non-first pages run executor-side.
"""

from __future__ import annotations

import pytest

from basin_climbing_data_pipeline_spark.sources.paginated import (
    PartialFetchError,
    cursor_scan,
    paginated_scan,
)

SCHEMA = "id long, name string"


def _dataset(n: int) -> list[dict]:
    return [{"id": i, "name": f"row{i}"} for i in range(n)]


def _page_server(data: list[dict], lie_count: int | None = None, fail_pages: set | None = None):
    fail_pages = fail_pages or set()

    def fetch(page: int, page_size: int) -> dict:
        if page in fail_pages:
            raise ConnectionError(f"boom on page {page}")
        lo = (page - 1) * page_size
        results = data[lo : lo + page_size]
        return {
            "results": results,
            "count": lie_count if lie_count is not None else len(data),
            "next": lo + page_size < len(data),
        }

    return fetch


def test_paginated_scan_fetches_all_pages(spark, tmp_path):
    data = _dataset(350)
    df = paginated_scan(
        spark, _page_server(data), SCHEMA, str(tmp_path / "bronze"), page_size=100
    )
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(350))


def test_paginated_scan_single_page(spark, tmp_path):
    df = paginated_scan(
        spark, _page_server(_dataset(7)), SCHEMA, str(tmp_path / "bronze"), page_size=100
    )
    assert df.count() == 7


def test_paginated_scan_fail_on_partial_raises(spark, tmp_path):
    data = _dataset(350)
    with pytest.raises(Exception):  # task failure surfaces as a Spark job error
        paginated_scan(
            spark,
            _page_server(data, fail_pages={3}),
            SCHEMA,
            str(tmp_path / "bronze"),
            page_size=100,
        )


def test_paginated_scan_partial_tolerated(spark, tmp_path):
    data = _dataset(350)
    df = paginated_scan(
        spark,
        _page_server(data, fail_pages={3}),
        SCHEMA,
        str(tmp_path / "bronze"),
        page_size=100,
        fail_on_partial=False,
    )
    got = sorted(r["id"] for r in df.collect())
    assert len(got) == 250  # page 3 (ids 200-299) missing, rest intact
    assert set(range(200, 300)).isdisjoint(got)


def test_paginated_scan_short_count_raises(spark, tmp_path):
    # provider reports more rows than it serves -> incomplete fetch
    data = _dataset(150)
    with pytest.raises(PartialFetchError):
        paginated_scan(
            spark,
            _page_server(data, lie_count=200),
            SCHEMA,
            str(tmp_path / "bronze"),
            page_size=100,
        )


def test_paginated_scan_unknown_total_serial_walk(spark, tmp_path):
    data = _dataset(230)
    base = _page_server(data)

    def no_count(page: int, page_size: int) -> dict:
        d = base(page, page_size)
        d.pop("count")
        return d

    df = paginated_scan(spark, no_count, SCHEMA, str(tmp_path / "bronze"), page_size=100)
    assert sorted(r["id"] for r in df.collect()) == list(range(230))


def test_cursor_scan_walks_chain_and_chunks(spark, tmp_path):
    data = _dataset(2_500)

    def fetch(cursor):
        at = cursor or 0
        batch = data[at : at + 400]
        nxt = at + 400 if at + 400 < len(data) else None
        return batch, nxt

    df = cursor_scan(
        spark, fetch, SCHEMA, str(tmp_path / "bronze"), chunk_rows=1_000
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(2_500))


def test_cursor_scan_empty_chain(spark, tmp_path):
    df = cursor_scan(spark, lambda c: ([], None), SCHEMA, str(tmp_path / "bronze"))
    assert df.count() == 0


def test_cursor_scan_runaway_backstop(spark, tmp_path):
    with pytest.raises(RuntimeError):
        cursor_scan(
            spark,
            lambda c: ([{"id": 1, "name": "x"}], "same-token"),
            SCHEMA,
            str(tmp_path / "bronze"),
            chunk_rows=10,
            max_batches=25,
        )
