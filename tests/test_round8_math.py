"""Independent math validation for the pre-round-7 statistical operators.

Backward extension of tests/test_round7_math.py (the round-7 judge order):
engine parity (Spark == DuckDB) is proven by the oracle harness, so the
remaining failure mode is BOTH engines agreeing on the wrong math — the
exact bug class the EB-shrinkage gate incident demonstrated.  Each test
recomputes the statistic from raw inputs in pure Python/numpy and compares
against the oracle engine's output at sf0.001 (milliseconds per case, no
Spark session).
"""

from __future__ import annotations

import datetime as dt
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
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _ratio(num: float, den: float, digits: int) -> float:
    scale = float(10**digits)
    return math.floor(num / den * scale + 0.5) / scale


def _micro(x: float) -> float:
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _micro_safe(x: float) -> float:
    """Mirror of the overflow-guarded micro (experiments._micro_safe_sql)."""
    return _micro(x) if abs(x) < 1e12 else x


def test_visit_spend_correlation_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        visit_spend_correlation_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.events import checkins_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(visit_spend_correlation_sql()).fetchone()
    raw = con.execute(
        f"""WITH cust AS ({customers_sql()}), ck AS ({checkins_sql()}),
        txn AS ({transactions_sql()}),
        visits AS (SELECT customer_id, count(*) AS x FROM ck GROUP BY 1),
        spend AS (SELECT customer_id,
                         sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS y
                  FROM txn GROUP BY 1)
        SELECT coalesce(v.x, 0)::bigint, coalesce(s.y, 0)::bigint
        FROM cust c LEFT JOIN visits v USING (customer_id)
        LEFT JOIN spend s USING (customer_id)"""
    ).fetchall()
    n = len(raw)
    sx = sum(x for x, _ in raw)
    sy = sum(y for _, y in raw)
    sxy = sum(x * y for x, y in raw)  # exact int — mirrors the DECIMAL(38) sums
    sxx = sum(x * x for x, _ in raw)
    syy = sum(y * y for _, y in raw)
    fn = float(n)
    cov = sxy / fn - (sx / fn) * (sy / fn)
    vx = sxx / fn - (sx / fn) * (sx / fn)
    vy = syy / fn - (sy / fn) * (sy / fn)
    r = cov / math.sqrt(vx * vy)
    assert got[0] == n and got[1] == sx and got[2] == sy
    assert got[3] == _micro(r)
    # sanity on the statistic itself: a correlation, not a degenerate echo
    assert -1.0 <= got[3] <= 1.0 and abs(got[3]) > 0


def test_ztest_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        ZTEST_CONVERSION_DAYS,
        experiment_conversion_ztest_sql,
        experiment_entries_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        memberships_2024_sql,
    )

    got = {r[0]: r for r in con.execute(experiment_conversion_ztest_sql()).fetchall()}
    entries = con.execute(
        f"SELECT experiment_id, ab_group, customer_id, entry_date "
        f"FROM ({experiment_entries_sql()})"
    ).fetchall()
    first_m = dict(
        con.execute(
            f"SELECT owner_id, min(start_date) FROM ({memberships_2024_sql()}) "
            f"GROUP BY owner_id"
        ).fetchall()
    )
    stats: dict[str, dict[str, list[int]]] = {}
    for exp, grp, cid, entry_date in entries:
        ms = first_m.get(cid)
        conv = int(
            ms is not None
            and entry_date <= ms <= entry_date + dt.timedelta(days=ZTEST_CONVERSION_DAYS)
        )
        stats.setdefault(exp, {"A": [], "B": []})[grp].append(conv)
    assert set(stats) == set(got)
    for exp, g in stats.items():
        n_a, n_b = len(g["A"]), len(g["B"])
        c_a, c_b = sum(g["A"]), sum(g["B"])
        row = got[exp]
        assert (row[1], row[2], row[3], row[4]) == (n_a, c_a, n_b, c_b)
        assert row[5] == (_ratio(c_a, n_a, 4) if n_a else None)
        assert row[6] == (_ratio(c_b, n_b, 4) if n_b else None)
        if n_a and n_b and 0 < c_a + c_b < n_a + n_b:
            pool = (c_a + c_b) / (n_a + n_b)
            z = (c_a / n_a - c_b / n_b) / math.sqrt(
                pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
            )
            assert row[7] == _micro(z)
        else:
            assert row[7] is None


def test_bootstrap_ci_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        B_REPLICATES,
        CI_HI_RANK,
        CI_LO_RANK,
        POISSON1_CDF_MICRO,
        bootstrap_spend_ci_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(bootstrap_spend_ci_sql()).fetchone()
    spend = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
        FROM txn GROUP BY customer_id"""
    ).fetchall()

    def weight(cid: str, b: int) -> int:
        u = int(hashlib.md5(f"{cid}:{b}".encode()).hexdigest()[:8], 16) % 1_000_000
        for k, t in enumerate(POISSON1_CDF_MICRO):
            if u < t:
                return k
        return 6

    means = []
    for b in range(B_REPLICATES):
        sw_cents = sw = 0
        for cid, cents in spend:
            w = weight(cid, b)
            sw_cents += w * cents
            sw += w
        if sw > 0:
            means.append((_ratio(sw_cents, sw, 2), b))
    means.sort()
    n = len(spend)
    point = _ratio(sum(c for _, c in spend), n, 2)
    assert got[0] == n and got[1] == B_REPLICATES and got[2] == point
    assert got[3] == means[CI_LO_RANK - 1][0]
    assert got[4] == means[CI_HI_RANK - 1][0]
    # the CI must bracket a real spread, not collapse to a point
    assert got[3] < got[4]


def test_linear_probe_matches_numpy_ols(con):
    numpy = pytest.importorskip("numpy")
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        _FEAT_SCALE,
        doc_stats_sql,
        linear_probe_quality_sql,
        quality_score_sql,
    )

    got = con.execute(linear_probe_quality_sql()).fetchone()
    feats = con.execute(
        f"""WITH stats AS ({doc_stats_sql()})
        SELECT CAST(floor(coalesce(stopword_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
               CAST(floor(coalesce(unique_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
               CAST(floor(least(n_words / 100.0, 1.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
               CAST(floor({quality_score_sql()} * {_FEAT_SCALE} + 0.5) AS BIGINT)
        FROM stats"""
    ).fetchall()
    x = numpy.array(
        [[1.0, s1 / _FEAT_SCALE, s2 / _FEAT_SCALE, s3 / _FEAT_SCALE]
         for s1, s2, s3, _t in feats]
    )
    y = numpy.array([t / _FEAT_SCALE for *_s, t in feats])
    w = numpy.linalg.solve(x.T @ x, x.T @ y)  # independent solver vs Cramer
    assert got[0] == len(feats)
    for i, name in enumerate(("w_intercept", "w_stopword", "w_unique", "w_length")):
        assert abs(got[1 + i] - w[i]) < 2e-6, name
    resid = y - x @ w
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert abs(got[5] - r2) < 2e-6
    dev = max(abs(w[1] - 0.3), abs(w[2] - 0.4), abs(w[3] - 0.3))
    assert abs(got[6] - dev) < 2e-6
    # the probe must actually recover the generating rule on this corpus
    assert got[5] > 0.5 and got[6] < 0.2


def test_cuped_matches_pure_python(con):
    """Full recomputation of the (round-8 recut) CUPED readout: md5 A/B
    arms over the transacting population, calendar-split covariate/metric,
    pooled theta, algebraic adjusted variance."""
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        CUPED_SPLIT_DATE,
        cuped_variance_reduction_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = {r[0]: r for r in con.execute(cuped_variance_reduction_sql()).fetchall()}
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CASE WHEN txn_date < DATE '{CUPED_SPLIT_DATE}'
                        THEN CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END),
               sum(CASE WHEN txn_date >= DATE '{CUPED_SPLIT_DATE}'
                        THEN CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END)
        FROM txn GROUP BY customer_id"""
    ).fetchall()
    groups: dict[str, list[tuple[int, int]]] = {"A": [], "B": []}
    for cid, x, y in raw:
        b = int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2
        groups["A" if b == 0 else "B"].append((x, y))
    pn = len(raw)
    psx = sum(x for _, xs in groups.items() for x, _ in xs)
    psy = sum(y for _, xs in groups.items() for _, y in xs)
    psxy = sum(x * y for _, xs in groups.items() for x, y in xs)
    psxx = sum(x * x for _, xs in groups.items() for x, _ in xs)
    th_den = pn * psxx - psx * psx
    # mirror the engines' cast-to-double-then-divide (an exact-int python
    # division would round differently past 2^53)
    theta = float(pn * psxy - psx * psy) / float(th_den) if th_den else None
    for g, xs in groups.items():
        n = len(xs)
        sx, sy = sum(x for x, _ in xs), sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx, syy = sum(x * x for x, _ in xs), sum(y * y for _, y in xs)
        nd = float(n)
        var_y = float(n * syy - sy * sy) / (nd * nd)
        cov = float(n * sxy - sx * sy) / (nd * nd)
        var_x = float(n * sxx - sx * sx) / (nd * nd)
        var_adj = var_y - 2.0 * theta * cov + theta * theta * var_x
        row = got[g]
        assert row[1] == n
        assert row[2] == _micro_safe(float(sy) / nd / 100.0)
        assert row[3] == _micro_safe(theta)
        assert row[4] == _micro_safe(var_y / 10000.0)
        assert row[5] == _micro_safe(var_adj / 10000.0)
        assert row[6] == _micro_safe((var_y - var_adj) / var_y * 100.0)
        # the recut readout must be non-degenerate on the driver corpus
        assert row[4] > 0 and row[6] is not None


def _log_bucket(v: int, subbuckets: int) -> int:
    if v >= 0:
        return math.floor(math.log10(v + 1) * subbuckets)
    return -1 - math.floor(math.log10(-v + 1) * subbuckets)


def _psi_from_counts(n_p: dict[int, int], n_q: dict[int, int]) -> tuple[int, int, int, float]:
    buckets = sorted(set(n_p) | set(n_q))
    np_tot = sum(n_p.values())
    nq_tot = sum(n_q.values())
    k = len(buckets)
    term_nano = 0
    for b in buckets:
        p = (n_p.get(b, 0) + 1) / (np_tot + k)
        q = (n_q.get(b, 0) + 1) / (nq_tot + k)
        term_nano += math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
    return np_tot, nq_tot, k, term_nano / 1e9


def test_spend_drift_psi_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.sketches import (
        HIST_SUBBUCKETS,
        PSI_SPLIT_DATE,
        spend_drift_psi_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = {r[0]: r for r in con.execute(spend_drift_psi_sql()).fetchall()}
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category,
               CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT),
               (txn_date < DATE '{PSI_SPLIT_DATE}')
        FROM txn"""
    ).fetchall()
    per_cat: dict[str, tuple[dict[int, int], dict[int, int]]] = {}
    for cat, cents, is_base in raw:
        p, q = per_cat.setdefault(cat, ({}, {}))
        side = p if is_base else q
        b = _log_bucket(cents, HIST_SUBBUCKETS)
        side[b] = side.get(b, 0) + 1
    assert set(per_cat) == set(got)
    for cat, (p, q) in per_cat.items():
        # the union bucket set comes from the per-(cat,bucket) groupBy:
        # every bucket seen on EITHER side exists in the counts table
        np_tot, nq_tot, k, psi = _psi_from_counts(p, q)
        row = got[cat]
        assert (row[1], row[2], row[3]) == (np_tot, nq_tot, k), cat
        assert row[4] == pytest.approx(psi, abs=1e-12), cat
        assert row[4] >= 0  # PSI is nonnegative by construction


def test_value_drift_psi_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.sketches import (
        DRIFT_WINDOW_US,
        HIST_SUBBUCKETS,
        value_drift_psi_sql,
    )

    got = {(r[0], r[1]): r for r in con.execute(value_drift_psi_sql()).fetchall()}
    raw = con.execute(
        "SELECT event_type, epoch_us(ts::TIMESTAMP), "
        "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) FROM events"
    ).fetchall()
    counts: dict[tuple[str, int], dict[int, int]] = {}
    for et, us, vm in raw:
        w = (us // DRIFT_WINDOW_US) * DRIFT_WINDOW_US
        h = counts.setdefault((et, w), {})
        b = _log_bucket(vm, HIST_SUBBUCKETS)
        h[b] = h.get(b, 0) + 1
    expect = {}
    for (et, w), curr in counts.items():
        prev = counts.get((et, w - DRIFT_WINDOW_US))
        if prev:
            np_tot, nq_tot, k, psi = _psi_from_counts(prev, curr)
            expect[(et, w)] = (np_tot, nq_tot, k, psi)
    assert set(expect) == set(got)
    for key, (np_tot, nq_tot, k, psi) in expect.items():
        row = got[key]
        assert (row[2], row[3], row[4]) == (np_tot, nq_tot, k), key
        assert row[5] == pytest.approx(psi, abs=1e-12), key


def _monthly_cents(con) -> dict[tuple[str, dt.date], int]:
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    return {
        (cat, m): cents
        for cat, m, cents in con.execute(
            f"""WITH txn AS ({transactions_sql()})
            SELECT revenue_category, date_trunc('month', txn_date)::date,
                   sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
            FROM txn GROUP BY 1, 2"""
        ).fetchall()
    }


def test_seasonal_naive_mape_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        seasonal_naive_forecast_eval_sql,
    )

    got = {r[0]: r for r in con.execute(seasonal_naive_forecast_eval_sql()).fetchall()}
    monthly = _monthly_cents(con)
    apes: dict[str, list[int]] = {}
    for (cat, m), cents in monthly.items():
        pred = monthly.get((cat, dt.date(m.year - 1, m.month, 1)))
        if pred is not None and cents != 0:
            apes.setdefault(cat, []).append(
                math.floor(abs(cents - pred) / abs(cents) * 1e6 + 0.5)
            )
    assert set(apes) == set(got)
    for cat, xs in apes.items():
        row = got[cat]
        assert row[1] == len(xs)
        assert row[2] == math.floor(sum(xs) / len(xs) + 0.5) / 1e6
        assert row[3] == max(xs) / 1e6


def _daily_dense(con) -> dict[str, list[tuple[dt.date, int]]]:
    """Zero-filled per-category daily cents from first to last active day."""
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    daily: dict[str, dict[dt.date, int]] = {}
    for cat, day, cents in con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, txn_date,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
        FROM txn GROUP BY 1, 2"""
    ).fetchall():
        daily.setdefault(cat, {})[day] = cents
    dense = {}
    for cat, days in daily.items():
        d, d1 = min(days), max(days)
        seq = []
        while d <= d1:
            seq.append((d, days.get(d, 0)))
            d += dt.timedelta(days=1)
        dense[cat] = seq
    return dense


def test_ewma_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        EWMA_WINDOW,
        ewma_daily_revenue_sql,
    )

    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(ewma_daily_revenue_sql()).fetchall()
    }
    dense = _daily_dense(con)
    n_rows = 0
    for cat, seq in dense.items():
        for i, (day, cents) in enumerate(seq):
            num = den = 0.0
            for k in range(min(EWMA_WINDOW, i + 1)):
                num += seq[i - k][1] * 0.5**k
                den += 0.5**k
            want = math.floor(num / den + 0.5) / 100.0
            level, ewma = got[(cat, day)]
            assert level == cents / 100.0, (cat, day)
            assert ewma == want, (cat, day)
            n_rows += 1
    assert n_rows == len(got)


def test_cusum_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        CUSUM_SLACK_PCT,
        CUSUM_THRESH_PCT,
        cusum_revenue_drift_sql,
    )

    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(cusum_revenue_drift_sql()).fetchall()
    }
    dense = _daily_dense(con)
    n_rows = n_alarms = 0
    for cat, seq in dense.items():
        total = sum(c for _, c in seq)
        n_days = len(seq)
        mean = max(total, 0) // n_days
        k = mean * CUSUM_SLACK_PCT // 100
        h = mean * CUSUM_THRESH_PCT // 100
        s = 0  # the recursion itself — independent of the prefix-min identity
        for day, cents in seq:
            s = max(0, s + (cents - mean - k))
            cusum, alarm = got[(cat, day)]
            assert cusum == s, (cat, day)
            assert alarm == (s > h), (cat, day)
            n_rows += 1
            n_alarms += alarm
    assert n_rows == len(got)


def test_mann_whitney_matches_pure_python(con):
    """Full recomputation of U and the tie-corrected z from a plain
    sorted-list ranking — independent of the engines' bucketed-prefix
    rank decomposition."""
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        mann_whitney_spend_utest_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(mann_whitney_spend_utest_sql()).fetchone()
    spend = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
        FROM txn GROUP BY customer_id"""
    ).fetchall()
    rows = [
        (cents, int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2 == 0)
        for cid, cents in spend
    ]
    rows.sort()
    n = len(rows)
    n_a = sum(1 for _, a in rows if a)
    n_b = n - n_a
    # average ranks with ties, in 2x integer units
    r2_a = 0
    ties = 0
    i = 0
    while i < n:
        j = i
        while j < n and rows[j][0] == rows[i][0]:
            j += 1
        t = j - i
        ties += t * t * t - t
        avg2 = (i + 1) + j  # 2 * average rank of the tied block
        r2_a += avg2 * sum(1 for k in range(i, j) if rows[k][1])
        i = j
    u2 = r2_a - n_a * (n_a + 1)
    assert got[0] == n and got[1] == n_a and got[2] == n_b
    assert got[3] == u2 / 2.0
    var_u = n_a * n_b / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u2 - n_a * n_b) / (2.0 * math.sqrt(var_u))
    assert got[4] == pytest.approx(z, abs=2e-6)
    assert got[5] == _ratio(u2 - n_a * n_b, n_a * n_b, 4)
    # md5 is a null assignment: spend must not differ hugely between arms
    assert abs(got[4]) < 5.0


def test_bh_fdr_matches_pure_python(con):
    """Recompute the per-category z, the quantized p, and the BH step-up
    from scratch (python erfc for the grid, brute-force step-up)."""
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        BH_ALPHA_PCT,
        P_GRID_MAX_IDX,
        P_TWO_SIDED_MICRO,
        bh_fdr_category_tests_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    # the embedded grid IS erfc — independent recomputation of the literals
    for k in (0, 100, 196, 500):
        assert P_TWO_SIDED_MICRO[k] == int(
            math.floor(math.erfc(k * 0.01 / math.sqrt(2.0)) * 1e6 + 0.5)
        )

    got = con.execute(bh_fdr_category_tests_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, customer_id::varchar, is_refund FROM txn"""
    ).fetchall()
    cats: dict[str, list[int]] = {}
    for cat, cid, ref in raw:
        a = int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2 == 0
        cats.setdefault(cat, []).append((a, int(ref)))
    hyps = []
    for cat, xs in cats.items():
        n_a = sum(1 for a, _ in xs if a)
        n_b = len(xs) - n_a
        ref_a = sum(r for a, r in xs if a)
        ref_b = sum(r for a, r in xs if not a)
        if n_a and n_b and 0 < ref_a + ref_b < n_a + n_b:
            pool = (ref_a + ref_b) / (n_a + n_b)
            z = (ref_a / n_a - ref_b / n_b) / math.sqrt(
                pool * (1 - pool) * (1 / n_a + 1 / n_b)
            )
            zq = min(int(math.floor(abs(_micro(z)) * 100.0)), P_GRID_MAX_IDX)
            hyps.append((P_TWO_SIDED_MICRO[zq] / 1e6, cat, _micro(z)))
    hyps.sort()
    m = len(hyps)
    assert m == len(got)
    # brute-force step-up: find the largest i with p_i <= i/m * alpha
    cutoff = 0
    for i, (p, _c, _z) in enumerate(hyps, 1):
        if p <= _micro(i / m * BH_ALPHA_PCT / 100.0):
            cutoff = i
    for i, (row, (p, cat, z)) in enumerate(zip(got, hyps), 1):
        assert row[0] == cat and row[5] == z and row[6] == p and row[7] == i
        assert row[9] == (i <= cutoff), (cat, i, cutoff)


def test_trimmed_winsorized_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        TRIM_PCT,
        trimmed_winsorized_spend_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(trimmed_winsorized_spend_sql()).fetchone()
    spend = sorted(
        r[0]
        for r in con.execute(
            f"""WITH txn AS ({transactions_sql()})
            SELECT sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
            FROM txn GROUP BY customer_id"""
        ).fetchall()
    )
    n = len(spend)
    k = n * TRIM_PCT // 100
    trimmed = spend[k : n - k]
    wins = [spend[k]] * k + trimmed + [spend[n - k - 1]] * k
    assert got[0] == n and got[1] == k
    assert got[2] == _ratio(sum(spend), n, 2)
    assert got[3] == _ratio(sum(trimmed), len(trimmed), 2)
    assert got[4] == _ratio(sum(wins), n, 2)
    assert got[5] == spend[k] and got[6] == spend[n - k - 1]
    # robustness direction: trimming a right-skewed spend lowers the mean
    assert got[3] <= got[2]


def test_weekday_seasonality_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        weekday_seasonality_sql,
    )

    got = {(r[0], r[1]): r for r in con.execute(weekday_seasonality_sql()).fetchall()}
    dense = _daily_dense(con)
    n_rows = 0
    for cat, seq in dense.items():
        by_dow: dict[int, list[int]] = {}
        for day, cents in seq:
            dow = (day.weekday() + 1) % 7 + 1  # python Mon=0 -> Spark Sun=1
            by_dow.setdefault(dow, []).append(cents)
        t1 = sum(c for _, c in seq)
        n = len(seq)
        sse_w = sum(
            sum(c * c for c in xs) - sum(xs) ** 2 / len(xs) for xs in by_dow.values()
        )
        sst = sum(c * c for _, c in seq) - t1 * t1 / n
        for dow, xs in by_dow.items():
            row = got[(cat, dow)]
            assert row[2] == len(xs)
            assert row[3] == _ratio(sum(xs), len(xs), 2)
            if t1 > 0:
                assert row[4] == pytest.approx(
                    (sum(xs) / len(xs)) / (t1 / n), abs=2e-6
                )
            if sst > 0:
                assert row[5] == pytest.approx(1.0 - sse_w / sst, abs=2e-6)
            n_rows += 1
    assert n_rows == len(got)


def test_churn_hazard_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        churn_hazard_by_tenure_sql,
        memberships_2024_sql,
    )

    got = con.execute(churn_hazard_by_tenure_sql()).fetchall()
    raw = con.execute(
        f"SELECT (end_date - start_date), (status = 'END') "
        f"FROM ({memberships_2024_sql()})"
    ).fetchall()
    alive = list(raw)
    cum_nano = 0
    for row in got:
        t, n_risk, d, h, ch = row
        assert n_risk == len(alive)
        want_d = sum(1 for dur, ev in alive if dur == t and ev)
        assert d == want_d
        assert h == _ratio(d, n_risk, 6)
        cum_nano += math.floor(d / n_risk * 1e9 + 0.5)
        assert ch == cum_nano / 1e9
        alive = [(dur, ev) for dur, ev in alive if dur != t]
    assert not alive  # every membership left the risk set at its tenure


def test_gini_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        gini_spend_concentration_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(gini_spend_concentration_sql()).fetchone()
    spend = sorted(
        r[0]
        for r in con.execute(
            f"""WITH txn AS ({transactions_sql()})
            SELECT sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
            FROM txn GROUP BY customer_id"""
        ).fetchall()
    )
    n = len(spend)
    sx = sum(spend)
    # textbook definition with sorted values; ties at average rank leave
    # Σ rank·x unchanged vs sorted-order ranks (equal values, summed ranks)
    rx = sum((i + 1) * x for i, x in enumerate(spend))
    gini = (2.0 * rx - (n + 1.0) * sx) / (n * float(sx))
    assert got[0] == n
    assert got[1] == sx / 100.0
    assert got[2] == pytest.approx(gini, abs=2e-6)
    assert 0.0 < got[2] < 1.0


def test_spearman_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        spearman_visit_spend_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.events import checkins_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(spearman_visit_spend_sql()).fetchone()
    raw = con.execute(
        f"""WITH cust AS ({customers_sql()}), ck AS ({checkins_sql()}),
        txn AS ({transactions_sql()}),
        visits AS (SELECT customer_id, count(*) AS v FROM ck GROUP BY 1),
        spend AS (SELECT customer_id,
                         sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS s
                  FROM txn GROUP BY 1)
        SELECT coalesce(vv.v, 0)::bigint, coalesce(ss.s, 0)::bigint
        FROM cust c LEFT JOIN visits vv USING (customer_id)
        LEFT JOIN spend ss USING (customer_id)"""
    ).fetchall()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    rv = avg_ranks([v for v, _ in raw])
    rs = avg_ranks([s for _, s in raw])
    n = len(raw)
    ma = sum(rv) / n
    mb = sum(rs) / n
    cov = sum(a * b for a, b in zip(rv, rs)) / n - ma * mb
    va = sum(a * a for a in rv) / n - ma * ma
    vb = sum(b * b for b in rs) / n - mb * mb
    rho = cov / math.sqrt(va * vb)
    assert got[0] == n
    assert got[1] == pytest.approx(rho, abs=2e-6)
    assert -1.0 <= got[1] <= 1.0


def test_chisq_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.quality import (
        chisq_category_source_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(chisq_category_source_sql()).fetchone()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, data_source, count(*) FROM txn GROUP BY 1, 2"""
    ).fetchall()
    cats = sorted({r[0] for r in raw})
    srcs = sorted({r[1] for r in raw})
    o = {(c, s): 0 for c in cats for s in srcs}
    for c, s, cnt in raw:
        o[(c, s)] = cnt
    n = sum(o.values())
    chi2 = 0.0
    for c in cats:
        for s in srcs:
            row_tot = sum(o[(c, x)] for x in srcs)
            col_tot = sum(o[(y, s)] for y in cats)
            e = row_tot * col_tot / n
            chi2 += (o[(c, s)] - e) ** 2 / e
    v = math.sqrt(chi2 / (n * min(len(cats) - 1, len(srcs) - 1)))
    assert got[0] == n
    assert got[1] == len(cats) and got[2] == len(srcs)
    assert got[3] == pytest.approx(chi2, abs=1e-6 * max(1.0, chi2))
    assert got[4] == (len(cats) - 1) * (len(srcs) - 1)
    assert got[5] == pytest.approx(v, abs=2e-6)


def test_benford_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.quality import (
        BENFORD_MICRO,
        benford_amount_audit_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    # the embedded shares ARE log10(1+1/d), independently recomputed
    for d in range(1, 10):
        assert BENFORD_MICRO[d - 1] == int(
            math.floor(math.log10(1 + 1 / d) * 1e6 + 0.5)
        )
    got = {r[0]: r for r in con.execute(benford_amount_audit_sql()).fetchall()}
    cents = [
        r[0]
        for r in con.execute(
            f"""WITH txn AS ({transactions_sql()})
            SELECT abs(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
            FROM txn"""
        ).fetchall()
        if r[0] > 0
    ]
    counts = {d: 0 for d in range(1, 10)}
    for v in cents:
        counts[int(str(v)[0])] += 1
    total = sum(counts.values())
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        row = got[d]
        assert row[1] == counts[d]
        assert row[2] == _ratio(counts[d], total, 6)
        assert row[3] == BENFORD_MICRO[d - 1] / 1e6
        assert row[4] == pytest.approx(row[2] - row[3], abs=1e-12)


def test_ks_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        KS_CRIT_MICRO,
        ks_spend_test_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(ks_spend_test_sql()).fetchone()
    spend = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id::varchar,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
        FROM txn GROUP BY customer_id"""
    ).fetchall()
    a = sorted(
        c for cid, c in spend
        if int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2 == 0
    )
    b = sorted(
        c for cid, c in spend
        if int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2 == 1
    )
    import bisect

    values = sorted(set(a) | set(b))
    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in values
    )
    n = len(a) + len(b)
    assert got[0] == n and got[1] == len(a) and got[2] == len(b)
    assert got[3] == pytest.approx(d, abs=2e-6)
    scale = math.sqrt(n / (len(a) * len(b)))
    assert got[4] == (d > KS_CRIT_MICRO["0.05"] / 1e6 * scale)
    assert got[5] == (d > KS_CRIT_MICRO["0.01"] / 1e6 * scale)


def test_mutual_info_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.quality import (
        mutual_info_category_source_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(mutual_info_category_source_sql()).fetchone()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, data_source, count(*) FROM txn GROUP BY 1, 2"""
    ).fetchall()
    n = sum(r[2] for r in raw)
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for c, s, cnt in raw:
        rows[c] = rows.get(c, 0) + cnt
        cols[s] = cols.get(s, 0) + cnt
    mi = sum(
        (cnt / n) * math.log(cnt * n / (rows[c] * cols[s])) for c, s, cnt in raw
    )
    hc = -sum((v / n) * math.log(v / n) for v in rows.values())
    hs = -sum((v / n) * math.log(v / n) for v in cols.values())
    assert got[0] == n
    assert got[1] == pytest.approx(mi, abs=1e-6)
    assert got[2] == pytest.approx(hc, abs=1e-6)
    assert got[3] == pytest.approx(hs, abs=1e-6)
    assert got[4] == pytest.approx(mi / min(hc, hs), abs=2e-6)
    assert got[1] >= 0  # MI is nonnegative up to the nano grid


def test_top_component_matches_numpy(con):
    """The engines' quantized power iterate must (a) reproduce a pure-
    python mirror of the same fixed-point arithmetic exactly, and (b)
    sit at-or-below numpy's true top eigenvalue share with the gap
    bounded by the reported residual."""
    numpy = pytest.importorskip("numpy")
    from basin_climbing_data_pipeline_spark.operators.similarity import (
        DIM,
        MICRO,
        NANO,
        POWER_ITERATIONS,
        embedding_top_component_sql,
    )

    got = con.execute(embedding_top_component_sql()).fetchone()
    vecs = [
        r[0]
        for r in con.execute("SELECT embedding FROM embeddings").fetchall()
    ]
    units = []
    for v in vecs:
        nrm = math.sqrt(sum(x * x for x in v))
        if nrm > 0:
            units.append([math.floor(x / nrm * MICRO + 0.5) for x in v])
    assert got[0] == len(units)
    m_raw = [[0] * DIM for _ in range(DIM)]
    for u in units:
        for i in range(DIM):
            ui = u[i]
            for j in range(DIM):
                m_raw[i][j] += ui * u[j]
    trace = sum(m_raw[i][i] for i in range(DIM))
    m = [
        [math.floor(m_raw[i][j] / trace * 1.0e12 + 0.5) for j in range(DIM)]
        for i in range(DIM)
    ]
    v = [NANO] * DIM
    for _ in range(POWER_ITERATIONS):
        w = [sum(m[i][j] * v[j] for j in range(DIM)) for i in range(DIM)]
        mx = max(abs(x) for x in w)
        v = [math.floor(x / mx * NANO + 0.5) for x in w]
    mvs = [
        math.floor(sum(m[i][j] * v[j] for j in range(DIM)) / 1.0e9 + 0.5)
        for i in range(DIM)
    ]
    vmv = sum(a * b for a, b in zip(mvs, v))
    vv = sum(x * x for x in v)
    mvmv = sum(x * x for x in mvs)
    lam = vmv / vv
    share = lam / 1.0e3
    resid = math.sqrt(max(mvmv - lam * lam * vv, 0.0)) / (lam * math.sqrt(vv))
    assert got[2] == _micro(share)
    assert got[3] == _micro(resid)
    # vs the true spectrum: the Rayleigh quotient of ANY vector lower-
    # bounds the top eigenvalue, the 3-round iterate must already beat
    # the isotropic average (top >= mean always), and the remaining gap
    # shrinks with the reported residual (2x envelope for the
    # non-orthogonal tail on a slowly-separating spectrum)
    a = numpy.array(m_raw, dtype=float) / trace
    top = float(numpy.linalg.eigvalsh(a)[-1])
    assert share <= top + 1e-9
    assert share >= 1.0 / DIM - 1e-9
    assert top - share <= 2.0 * resid * top + 1e-6


def test_feature_auc_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        _FEAT_SCALE,
        QUALITY_SPAM_MAX,
        doc_stats_sql,
        feature_auc_screening_sql,
        quality_score_sql,
    )

    got = {r[0]: r for r in con.execute(feature_auc_screening_sql()).fetchall()}
    raw = con.execute(
        f"""WITH stats AS ({doc_stats_sql()})
        SELECT coalesce(stopword_ratio, 0.0), coalesce(unique_ratio, 0.0),
               least(n_words / 100.0, 1.0),
               ({quality_score_sql()} >= {QUALITY_SPAM_MAX})
        FROM stats"""
    ).fetchall()
    feats = {
        "stopword_ratio": [(math.floor(r[0] * _FEAT_SCALE + 0.5), r[3]) for r in raw],
        "unique_ratio": [(math.floor(r[1] * _FEAT_SCALE + 0.5), r[3]) for r in raw],
        "length_saturation": [
            (math.floor(r[2] * _FEAT_SCALE + 0.5), r[3]) for r in raw
        ],
    }
    assert set(got) == set(feats)
    for name, xs in feats.items():
        xs.sort()
        n = len(xs)
        n_pos = sum(1 for _s, p in xs if p)
        # average-tie 2x rank sum for the positive class
        r2 = 0
        i = 0
        while i < n:
            j = i
            while j < n and xs[j][0] == xs[i][0]:
                j += 1
            r2 += ((i + 1) + j) * sum(1 for k in range(i, j) if xs[k][1])
            i = j
        auc = (r2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * (n - n_pos))
        row = got[name]
        assert row[1] == n and row[2] == n_pos
        assert row[3] == _micro(auc)
        assert 0.0 <= row[3] <= 1.0
    # the features CONSTRUCT the label, so at least one must carry strong
    # signal; direction varies per feature (that is the screening point)
    assert any(abs(got[k][3] - 0.5) > 0.1 for k in got)


def test_robust_anomalies_match_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        ROBUST_Z_FLAG_MICRO,
        ROBUST_Z_SCALE_MICRO,
        robust_daily_anomalies_sql,
    )

    got = {(r[0], r[1]): r for r in con.execute(robust_daily_anomalies_sql()).fetchall()}
    daily: dict[str, dict] = {}
    for et, d, n in con.execute(
        "SELECT event_type, ts::DATE, count(*) FROM events GROUP BY 1, 2"
    ).fetchall():
        daily.setdefault(et, {})[d] = n
    n_rows = 0
    for et, days in daily.items():
        ordered = sorted(days.items(), key=lambda kv: (kv[1], kv[0]))
        med = ordered[(len(ordered) + 1) // 2 - 1][1]
        devs = sorted(
            ((abs(n - med), d) for d, n in days.items())
        )
        mad = devs[(len(devs) + 1) // 2 - 1][0]
        for d, n in days.items():
            row = got[(et, d)]
            assert row[3] == med and row[4] == mad
            if mad > 0:
                mz = math.floor(
                    (n - med) / mad * (ROBUST_Z_SCALE_MICRO / 1e6) * 1e6 + 0.5
                )
                assert row[5] == mz
                assert row[6] == (abs(mz) >= ROBUST_Z_FLAG_MICRO)
            else:
                assert row[5] is None and row[6] is None
            n_rows += 1
    assert n_rows == len(got)


def test_holt_filter_matches_reference_recursion(con):
    """The embedded impulse-response literals must reproduce the actual
    Holt recursion: recompute level/trend per (category, day) by running
    the textbook recursion in pure python over the zero-filled series
    (truncation-matched: the recursion is restarted from zero state K
    days back, which IS the K-tap filter's definition), and compare the
    nano-floored results exactly."""
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_K,
        HOLT_WB_NANO,
        HOLT_WL_NANO,
        holt_linear_daily_revenue_sql,
    )

    # literals ARE the recursion's impulse response
    l = b = 0.0
    x = 1.0
    for k in range(HOLT_K):
        lp, bp = l, b
        l = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (lp + bp)
        b = HOLT_BETA * (l - lp) + (1 - HOLT_BETA) * bp
        assert HOLT_WL_NANO[k] == math.floor(l * 1e9 + 0.5)
        assert HOLT_WB_NANO[k] == math.floor(b * 1e9 + 0.5)
        x = 0.0

    got = {
        (r[0], r[1]): r for r in con.execute(holt_linear_daily_revenue_sql()).fetchall()
    }
    dense = _daily_dense(con)
    n_rows = 0
    for cat, seq in dense.items():
        cents = [c for _, c in seq]
        for i, (day, c) in enumerate(seq):
            lvl = sum(
                HOLT_WL_NANO[k] * cents[i - k]
                for k in range(min(HOLT_K, i + 1))
            )
            trd = sum(
                HOLT_WB_NANO[k] * cents[i - k]
                for k in range(min(HOLT_K, i + 1))
            )
            level_c = math.floor(lvl / 1e9 + 0.5)
            trend_c = math.floor(trd / 1e9 + 0.5)
            row = got[(cat, day)]
            assert row[2] == c / 100.0
            assert row[3] == level_c / 100.0, (cat, day)
            assert row[4] == trend_c / 100.0, (cat, day)
            n_rows += 1
    assert n_rows == len(got)


def test_power_mde_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        Z_ALPHA2_MICRO,
        Z_POWER_MICRO,
        refund_test_power_mde_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    # the z literals are the actual normal quantiles (recomputed via
    # bisection on erf — no scipy in this container)
    def norm_q(p):
        lo, hi = 0.0, 8.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if (1 + math.erf(mid / math.sqrt(2))) / 2 < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    assert Z_ALPHA2_MICRO == round(norm_q(0.975) * 1e6)
    assert Z_POWER_MICRO == round(norm_q(0.80) * 1e6)

    got = {r[0]: r for r in con.execute(refund_test_power_mde_sql()).fetchall()}
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, customer_id::varchar, is_refund FROM txn"""
    ).fetchall()
    cats: dict[str, list] = {}
    for cat, cid, ref in raw:
        a = int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 2 == 0
        cats.setdefault(cat, []).append((a, int(ref)))
    zsum = (Z_ALPHA2_MICRO + Z_POWER_MICRO) / 1e6
    for cat, xs in cats.items():
        n_a = sum(1 for a, _ in xs if a)
        n_b = len(xs) - n_a
        n_ref = sum(r for _, r in xs)
        row = got[cat]
        assert (row[1], row[2]) == (n_a, n_b)
        assert row[3] == _ratio(n_ref, n_a + n_b, 6)
        if n_a and n_b and 0 < n_ref < n_a + n_b:
            p = n_ref / (n_a + n_b)
            mde = zsum * math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
            assert row[4] == _micro(mde)
            assert row[5] == _micro(mde / p)
            assert 0 < row[4] < 1
