"""Independent math validation for the round-10 additions.

Same contract as tests/test_round9*_math.py: the bitwise harness proves
Spark == DuckDB; these tests recompute each statistic from raw inputs in
pure Python (exact ints where the operators use DECIMAL/HUGEINT, float
only where the operators drop to double, in the SAME operand order) and
compare against the oracle engine at sf0.001.  The three round-10
operators are each a consumer of a distinct bucketed_prefix_rank mode, so
these recomputations also differentially validate the consolidated
primitive end-to-end (plain / inclusive-dual / partitioned rank-pick).
"""

from __future__ import annotations

import hashlib
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
    """The shared guarded quantizer's semantics (functions/money.py)."""
    if math.isnan(x) or not abs(x) < 1.0e12:
        return x
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _md5_bucket(key: str, buckets: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % buckets


def _per_cust_cents(con) -> list[tuple[str, int]]:
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    return con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS cents
        FROM txn GROUP BY 1"""
    ).fetchall()


def _avg_rank2(values: list[int]) -> dict[int, int]:
    """value -> 2x average rank (ascending, ties averaged) — exact int."""
    from collections import Counter

    cnt = Counter(values)
    out, before = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * before + cnt[v] + 1
        before += cnt[v]
    return out


def test_wilcoxon_signed_rank_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        wilcoxon_signed_rank_spend_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.sketches import PSI_SPLIT_DATE
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    rows = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CASE WHEN txn_date < DATE '{PSI_SPLIT_DATE}'
                        THEN CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END),
               sum(CASE WHEN txn_date >= DATE '{PSI_SPLIT_DATE}'
                        THEN CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END)
        FROM txn GROUP BY 1"""
    ).fetchall()
    ds = [s2 - s1 for _c, s1, s2 in rows if s2 != s1]
    n = len(ds)
    r2 = _avg_rank2([abs(d) for d in ds])
    w2_plus = sum(r2[abs(d)] for d in ds if d > 0)  # 2·W+
    from collections import Counter

    cnt = Counter(abs(d) for d in ds)
    ties = sum(t**3 - t for t in cnt.values())
    num = float(2 * w2_plus - n * (n + 1))
    var2 = float(n * (n + 1) * (2 * n + 1)) / 6.0 - float(ties) / 12.0
    want_z = _micro(num / (2.0 * math.sqrt(var2))) if n > 0 else None
    got = con.execute(wilcoxon_signed_rank_spend_sql()).fetchall()[0]
    assert got[0] == n
    assert got[1] == sum(1 for d in ds if d > 0)
    assert got[2] == w2_plus / 2.0
    assert got[3] == want_z


def test_cvm_spend_test_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        cvm_spend_test_sql,
    )

    per = _per_cust_cents(con)
    arms = [(cents, _md5_bucket(cid, 2) == 0) for cid, cents in per]
    n = len(arms)
    n_a = sum(1 for _v, a in arms if a)
    n_b = n - n_a
    from collections import Counter

    cnt = Counter(v for v, _a in arms)
    cnt_a = Counter(v for v, a in arms if a)
    s = cum = cum_a = 0
    for v in sorted(cnt):
        cum += cnt[v]
        cum_a += cnt_a.get(v, 0)
        diff = n_b * cum_a - n_a * (cum - cum_a)
        s += cnt[v] * diff * diff
    want = _micro(float(s) / float(n_a * n_b) / float(n * n))
    got = con.execute(cvm_spend_test_sql()).fetchall()[0]
    assert got[:3] == (n, n_a, n_b)
    assert got[3] == want


def test_segment_spend_quantiles_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        segment_spend_quantiles_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    rows = con.execute(
        f"""WITH txn AS ({transactions_sql()}), cust AS ({customers_sql()}),
        per_cust AS (
          SELECT customer_id,
                 sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS cents
          FROM txn GROUP BY 1)
        SELECT c.segment, p.cents FROM per_cust p JOIN cust c USING (customer_id)"""
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, cents in rows:
        by_seg.setdefault(seg, []).append(cents)
    want = {}
    for seg, vals in by_seg.items():
        vals.sort()
        nn = len(vals)
        pick = lambda r: vals[r - 1] / 100.0  # noqa: E731
        want[seg] = (
            nn,
            pick(math.ceil(nn / 4)),
            pick(math.ceil(nn / 2)),
            pick(math.ceil(3 * nn / 4)),
            pick(math.ceil(9 * nn / 10)),
        )
    got = con.execute(segment_spend_quantiles_sql()).fetchall()
    assert len(got) == len(want)
    for seg, n_customers, p25, p50, p75, p90 in got:
        assert (n_customers, p25, p50, p75, p90) == want[seg], seg
