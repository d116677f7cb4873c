"""Independent math validation for the round-7 statistical operators.

Engine parity (Spark == DuckDB) is proven by the oracle harness and the
capstone suite; these tests attack the remaining failure mode — BOTH
engines agreeing on the wrong math — by recomputing each statistic from
raw inputs in pure Python/numpy and comparing against the oracle engine's
output at sf0.001 (milliseconds per case, no Spark session).
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
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_logrank_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        LOGRANK_GROUP,
        memberships_2024_sql,
        survival_logrank_by_frequency_sql,
    )

    got = con.execute(survival_logrank_by_frequency_sql()).fetchone()
    raw = con.execute(
        f"WITH m AS ({memberships_2024_sql()}) "
        f"SELECT (end_date - start_date) AS dur, (status = 'END') AS ev, "
        f"(frequency = '{LOGRANK_GROUP}') AS g1 FROM m"
    ).fetchall()
    times = sorted({d for d, _e, _g in raw})
    alive = list(raw)
    o1 = 0
    e1_nano = 0
    v_nano = 0
    for t in times:
        n = len(alive)
        n1 = sum(1 for d, _e, g in alive if g)
        d_t = sum(1 for d, e, _g in alive if d == t and e)
        d1_t = sum(1 for d, e, g in alive if d == t and e and g)
        if d_t > 0:
            o1 += d1_t
            e1_nano += math.floor(d_t * n1 / n * 1e9 + 0.5)
            if n > 1:
                v_nano += math.floor(
                    d_t * (n1 / n) * (1 - n1 / n) * (n - d_t) / (n - 1) * 1e9 + 0.5
                )
        alive = [(d, e, g) for d, e, g in alive if d != t]
    want_z = math.floor(
        (o1 - e1_nano / 1e9) / math.sqrt(v_nano / 1e9) * 1e6 + 0.5
    ) / 1e6
    assert got[2] == o1
    assert got[3] == math.floor(e1_nano / 1e9 * 1e6 + 0.5) / 1e6
    assert got[4] == want_z


def test_woe_iv_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        WOE_LABEL_CATEGORY,
        woe_iv_by_feature_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = {
        (r[0], r[1]): r for r in con.execute(woe_iv_by_feature_sql()).fetchall()
    }
    labeled = con.execute(
        f"""WITH cust AS ({customers_sql()}), txn AS ({transactions_sql()}),
        conv AS (SELECT DISTINCT customer_id FROM txn
                 WHERE revenue_category = '{WOE_LABEL_CATEGORY}')
        SELECT c.segment, c.nation,
               (v.customer_id IS NOT NULL)::int AS pos
        FROM cust c LEFT JOIN conv v USING (customer_id)"""
    ).fetchall()
    for fi, feat in ((0, "segment"), (1, "nation")):
        cats: dict[str, list[int]] = {}
        for row in labeled:
            cats.setdefault(row[fi], []).append(row[2])
        pos_tot = sum(sum(v) for v in cats.values())
        neg_tot = sum(len(v) - sum(v) for v in cats.values())
        k = len(cats)
        iv_nano = 0
        woes = {}
        for c_, v in cats.items():
            p = (sum(v) + 1) / (pos_tot + k)
            q = (len(v) - sum(v) + 1) / (neg_tot + k)
            woes[c_] = math.floor(math.log(p / q) * 1e9 + 0.5) / 1e9
            iv_nano += math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
        for c_, w in woes.items():
            r = got[(feat, c_)]
            assert r[4] == w, (feat, c_)
            assert r[5] == iv_nano / 1e9, (feat, c_)


def test_burstiness_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.events import (
        interevent_burstiness_sql,
    )

    got = {r[0]: r for r in con.execute(interevent_burstiness_sql()).fetchall()}
    rows = con.execute(
        "SELECT user_id, event_type, epoch_us(ts::TIMESTAMP), event_id FROM events "
        "ORDER BY user_id, event_type, 3, event_id"
    ).fetchall()
    gaps: dict[str, list[int]] = {}
    prev = None
    for u, et, ts, eid in rows:
        if prev is not None and prev[0] == u and prev[1] == et:
            gaps.setdefault(et, []).append(ts - prev[2])
        prev = (u, et, ts)
    for et, g in gaps.items():
        n = len(g)
        s, s2 = sum(g), sum(x * x for x in g)
        mean = s / n
        sd = math.sqrt((n * s2 - s * s) / (n * n))
        b = (sd - mean) / (sd + mean) if (sd + mean) != 0 else None
        r = got[et]
        assert r[1] == n
        assert r[2] == math.floor(mean / 1e6 * 1e6 + 0.5) / 1e6
        assert r[3] == math.floor(sd / 1e6 * 1e6 + 0.5) / 1e6
        if b is not None:
            assert r[4] == math.floor(b * 1e6 + 0.5) / 1e6


def test_markov_absorption_matches_numpy_solve(con):
    import numpy as np

    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        MARKOV_ABSORB,
        MARKOV_TRANSIENT,
        markov_absorption_probs_sql,
    )

    got = {r[0]: r for r in con.execute(markov_absorption_probs_sql()).fetchall()}
    pairs = con.execute(
        f"""WITH ev AS (SELECT user_id, event_type,
                        epoch_us(ts::TIMESTAMP) AS ts_us, event_id FROM events)
        SELECT event_type AS s,
               coalesce(lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id), '__end__') AS t
        FROM ev"""
    ).fetchall()
    states = list(MARKOV_TRANSIENT)
    idx = {s: i for i, s in enumerate(states)}
    q = np.zeros((4, 4))
    r = np.zeros(4)
    n = np.zeros(4)
    for s, t in pairs:
        if s == MARKOV_ABSORB or s not in idx:
            continue
        n[idx[s]] += 1
        if t in idx:
            q[idx[s], idx[t]] += 1
        elif t == MARKOV_ABSORB:
            r[idx[s]] += 1
    for i in range(4):
        if n[i] > 0:
            q[i] /= n[i]
            r[i] /= n[i]
    a = np.eye(4) - q
    b = np.linalg.solve(a, r)
    t_steps = np.linalg.solve(a, np.ones(4))
    for i, s in enumerate(states):
        row = got[s]
        assert row[1] == int(n[i])
        # numpy solves by LU, the engines by Cramer — agree to ~1e-9,
        # far inside the micro grid
        assert abs(row[2] - b[i]) <= 2e-6, s
        assert abs(row[3] - t_steps[i]) <= 2e-6, s


def test_cuped_variance_is_nonnegative_and_reduces_pooled(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        cuped_variance_reduction_sql,
    )

    rows = con.execute(cuped_variance_reduction_sql()).fetchall()
    assert rows, "experiment entries must exist"
    for r in rows:
        # var(Y - theta X) is a variance: never negative (up to rounding)
        if r[5] is not None:
            assert r[5] >= -1e-6, r
        if r[4] is not None and r[5] is not None:
            assert r[4] >= 0.0


def test_conformal_coverage_meets_target(con):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        CONFORMAL_ALPHA_PCT,
        probe_conformal_calibration_sql,
    )

    row = con.execute(probe_conformal_calibration_sql()).fetchone()
    n_calib, n_test, target, q_hat, coverage = row
    assert n_calib > 0 and n_test > 0
    assert q_hat is None or q_hat >= 0.0
    if coverage is not None:
        # split-conformal guarantee is ≥ target in expectation; the bucket
        # upper edge makes the reported coverage conservative, and the
        # finite-sample slack at this n is well inside 5 points
        assert coverage >= (CONFORMAL_ALPHA_PCT - 5) / 100.0


def test_eb_shrinkage_moves_small_sources_toward_mean():
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        eb_shrunk_source_quality_sql,
    )

    # sf0.01: 20 sources with real rate spread — sf0.001's single-digit
    # source set hits the degenerate-prior guard by design
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    rows = c.execute(eb_shrunk_source_quality_sql()).fetchall()
    shrunk = [r for r in rows if r[6] is not None]
    assert shrunk, "sf0.01 must yield a proper prior"
    m = sum(r[3] for r in shrunk) / len(shrunk)
    for r in shrunk:
        raw, post = r[3], r[6]
        # shrinkage must move every rate TOWARD the prior mean, never past it
        lo, hi = min(raw, m), max(raw, m)
        assert lo - 1e-6 <= post <= hi + 1e-6, r
