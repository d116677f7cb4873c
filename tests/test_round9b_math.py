"""Independent math validation for the round-9 continuation operators.

Same contract as tests/test_round9_math.py: the bitwise harness proves
Spark == DuckDB; these tests recompute each statistic from raw inputs in
pure Python (exact ints where the operators use DECIMAL/HUGEINT, float
only where the operators drop to double, in the SAME operand order) and
compare against the oracle engine at sf0.001.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _micro(x: float) -> float:
    if abs(x) >= 1.0e12 or math.isnan(x):
        return x
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _seg_cents(con) -> list[tuple[str, int]]:
    """(segment, per-customer net spend cents) — the k-group test base."""
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    return con.execute(
        f"""WITH txn AS ({transactions_sql()}), cust AS ({customers_sql()}),
        per_cust AS (SELECT customer_id,
                            sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
                              AS cents
                     FROM txn GROUP BY 1)
        SELECT c.segment, p.cents FROM per_cust p JOIN cust c USING (customer_id)"""
    ).fetchall()


def test_anova_spend_by_segment_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        anova_spend_by_segment_sql,
    )

    got = con.execute(anova_spend_by_segment_sql()).fetchall()
    rows = _seg_cents(con)
    groups: dict[str, list[int]] = {}
    for seg, y in rows:
        groups.setdefault(seg, []).append(y)
    n = len(rows)
    k = len(groups)
    s = sum(y for _s, y in rows)          # exact int
    q = sum(y * y for _s, y in rows)      # exact int
    cum_term = 0.0
    for seg in sorted(groups):            # ordered accumulation, like the window
        ys = groups[seg]
        sg = sum(ys)
        cum_term += float(sg * sg) / float(len(ys))
    ssb = cum_term - float(s * s) / float(n)
    sst = float(q) - float(s * s) / float(n)
    ssw = sst - ssb
    f_stat = (ssb / float(k - 1)) / (ssw / float(n - k))
    eta = ssb / sst
    assert got == [
        (n, k, _micro(ssb), _micro(ssw), _micro(f_stat), _micro(eta))
    ]
    # alive: the segments genuinely differ in sample size/spend on this corpus
    assert got[0][4] is not None and got[0][5] > 0.0


def test_kruskal_wallis_spend_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        kruskal_wallis_spend_sql,
    )

    got = con.execute(kruskal_wallis_spend_sql()).fetchall()
    rows = _seg_cents(con)
    n = len(rows)
    # exact 2x average ranks per distinct value
    from collections import Counter

    cnt = Counter(y for _s, y in rows)
    vals = sorted(cnt)
    before, rank2 = {}, {}
    run = 0
    for v in vals:
        before[v] = run
        rank2[v] = 2 * run + cnt[v] + 1   # 2 x average rank, exact int
        run += cnt[v]
    groups: dict[str, list[int]] = {}
    for seg, y in rows:
        groups.setdefault(seg, []).append(y)
    k = len(groups)
    cum_term = 0.0
    for seg in sorted(groups):
        ys = groups[seg]
        r2 = sum(rank2[y] for y in ys)    # exact int
        cum_term += float(r2 * r2) / (4.0 * float(len(ys)))
    h = 12.0 / (float(n) * (float(n) + 1.0)) * cum_term - 3.0 * (float(n) + 1.0)
    ties = sum(c * c * c - c for c in cnt.values())
    c_tie = 1.0 - float(ties) / float(n * n * n - n)
    eps = (h - float(k) + 1.0) / (float(n) - float(k))
    assert got == [(n, k, _micro(h), _micro(h / c_tie), _micro(eps))]
    # alive: H is a real positive statistic on this corpus
    assert got[0][2] > 0.0
