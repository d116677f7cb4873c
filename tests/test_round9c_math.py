"""Independent math validation for the round-9 inference-battery round-out.

Same contract as tests/test_round9_math.py and test_round9b_math.py: the
bitwise harness proves Spark == DuckDB; these tests recompute each
statistic from raw inputs in pure Python (exact ints where the operators
use DECIMAL/HUGEINT, float only where the operators drop to double, in the
SAME operand order) and compare against the oracle engine at sf0.001.
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
    if abs(x) >= 1.0e12 or math.isnan(x):
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


def _daily_cents(con) -> list[int]:
    """Zero-filled global daily revenue cents in day order."""
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        _global_daily_cents_sql,
        transactions_sql,
    )

    rows = con.execute(
        f"WITH txn AS ({transactions_sql()}), {_global_daily_cents_sql()} "
        "SELECT day, cents FROM dense ORDER BY day"
    ).fetchall()
    return [c for _d, c in rows]


def test_welch_ttest_spend_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        welch_ttest_spend_sql,
    )

    got = con.execute(welch_ttest_spend_sql()).fetchall()
    a = [c for k, c in _per_cust_cents(con) if _md5_bucket(k, 2) == 0]
    b = [c for k, c in _per_cust_cents(con) if _md5_bucket(k, 2) != 0]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa, qb = sum(y * y for y in a), sum(y * y for y in b)
    var_a = float(na * qa - sa * sa) / (float(na) * float(na - 1))
    var_b = float(nb * qb - sb * sb) / (float(nb) * float(nb - 1))
    mean_a, mean_b = float(sa) / float(na), float(sb) / float(nb)
    se2_a, se2_b = var_a / float(na), var_b / float(nb)
    t = (mean_a - mean_b) / math.sqrt(se2_a + se2_b)
    df = (se2_a + se2_b) ** 2 / (
        se2_a * se2_a / float(na - 1) + se2_b * se2_b / float(nb - 1)
    )
    sp2 = (float(na - 1) * var_a + float(nb - 1) * var_b) / float(na + nb - 2)
    d = (mean_a - mean_b) / math.sqrt(sp2)
    assert got == [
        (
            na,
            nb,
            _micro(mean_a / 100.0),
            _micro(mean_b / 100.0),
            _micro(t),
            _micro(df),
            _micro(d),
        )
    ]
    # alive: both arms populated, df between min(n)-1 and n-2
    assert na > 1 and nb > 1
    assert min(na, nb) - 1 <= got[0][5] <= na + nb - 2


def test_grubbs_spend_outlier_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        grubbs_spend_outlier_sql,
    )

    got = con.execute(grubbs_spend_outlier_sql()).fetchall()
    ys = [c for _k, c in _per_cust_cents(con)]
    n, s, q = len(ys), sum(ys), sum(y * y for y in ys)
    var = float(n * q - s * s) / (float(n) * float(n - 1))
    sd = math.sqrt(var)
    g_hi = float(n * max(ys) - s) / (float(n) * sd)
    g_lo = float(s - n * min(ys)) / (float(n) * sd)
    side = "high" if g_hi >= g_lo else "low"
    assert got == [
        (
            n,
            _micro(float(s) / float(n) / 100.0),
            _micro(sd / 100.0),
            _micro(g_hi),
            _micro(g_lo),
            _micro(max(g_hi, g_lo)),
            side,
        )
    ]
    # alive: a heavy-tailed spend corpus has a real high-side whale
    assert got[0][5] > 1.0


def test_levene_brown_forsythe_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.customers import customers_sql
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        levene_brown_forsythe_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(levene_brown_forsythe_sql()).fetchall()
    rows = con.execute(
        f"""WITH txn AS ({transactions_sql()}), cust AS ({customers_sql()}),
        per_cust AS (SELECT customer_id,
                            sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
                              AS cents
                     FROM txn GROUP BY 1)
        SELECT c.segment, p.cents FROM per_cust p JOIN cust c USING (customer_id)"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for seg, y in rows:
        groups.setdefault(seg, []).append(y)
    # per-segment LOWER median: nearest-rank (n+1) div 2
    zs: list[tuple[str, int]] = []
    for seg, ys in groups.items():
        med = sorted(ys)[(len(ys) + 1) // 2 - 1]
        zs.extend((seg, abs(y - med)) for y in ys)
    n, k = len(zs), len(groups)
    s = sum(z for _g, z in zs)
    q = sum(z * z for _g, z in zs)
    zg: dict[str, list[int]] = {}
    for seg, z in zs:
        zg.setdefault(seg, []).append(z)
    cum_term = 0.0
    for seg in sorted(zg):
        sg = sum(zg[seg])
        cum_term += float(sg * sg) / float(len(zg[seg]))
    ssb = cum_term - float(s * s) / float(n)
    sst = float(q) - float(s * s) / float(n)
    ssw = sst - ssb
    w_stat = (ssb / float(k - 1)) / (ssw / float(n - k))
    assert got == [(n, k, _micro(w_stat), _micro(ssb / sst))]
    # alive: the BF statistic is computable and finite on this corpus
    assert got[0][2] is not None and got[0][2] >= 0.0


def test_permutation_test_spend_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        PERM_B,
        permutation_test_spend_sql,
    )

    got = con.execute(permutation_test_spend_sql()).fetchall()
    rows = _per_cust_cents(con)
    obs_a = [(k, c) for k, c in rows if _md5_bucket(k, 2) == 0]
    na0 = len(obs_a)
    sa0 = sum(c for _k, c in obs_a)
    nb0 = len(rows) - na0
    sb0 = sum(c for _k, c in rows) - sa0
    n_ge = n_valid = 0
    for b in range(1, PERM_B + 1):
        na = sa = 0
        for k, c in rows:
            if _md5_bucket(f"{k}|perm{b}", 2) == 0:
                na += 1
                sa += c
        nb, sb = len(rows) - na, sum(c for _k, c in rows) - sa
        if na == 0 or nb == 0:
            continue  # degenerate perm: out of numerator AND denominator
        n_valid += 1
        # exact cross-multiplied extremeness (no float boundary)
        lhs = abs(sa * nb - sb * na) * (na0 * nb0)
        rhs = abs(sa0 * nb0 - sb0 * na0) * (na * nb)
        if lhs >= rhs:
            n_ge += 1
    d_obs = float(sa0) / float(na0) - float(sb0) / float(nb0)
    p = (1.0 + float(n_ge)) / (1.0 + float(n_valid))
    assert got == [
        (na0, nb0, _micro(d_obs / 100.0), PERM_B, n_valid, n_ge, _micro(p))
    ]
    # alive: p is a genuine interior probability with add-one smoothing,
    # and the md5 arms keep every perm two-sided on this corpus
    assert 0.0 < got[0][6] <= 1.0
    assert n_valid == PERM_B


def test_jarque_bera_daily_revenue_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        jarque_bera_daily_revenue_sql,
    )

    got = con.execute(jarque_bera_daily_revenue_sql()).fetchall()
    ys = _daily_cents(con)
    n, s = len(ys), sum(ys)
    s2 = s3 = s4 = 0.0
    for y in ys:  # ordered accumulation in day order, like the window
        d = float(n * y - s) / float(n)
        s2 += d * d
        s3 += d * d * d
        s4 += d * d * d * d
    m2, m3, m4 = s2 / float(n), s3 / float(n), s4 / float(n)
    skew = m3 / math.sqrt(m2 * m2 * m2)
    exk = m4 / (m2 * m2) - 3.0
    jb = float(n) / 6.0 * (skew * skew + exk * exk / 4.0)
    assert got == [(n, _micro(skew), _micro(exk), _micro(jb))]
    # alive: real revenue series, JB strictly positive
    assert got[0][3] > 0.0


def test_durbin_watson_revenue_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        durbin_watson_revenue_sql,
    )

    got = con.execute(durbin_watson_revenue_sql()).fetchall()
    ys = _daily_cents(con)
    n = len(ys)
    xs = list(range(n))
    sy, sx = sum(ys), sum(xs)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    nslope = n * sxy - sx * sy
    dslope = n * sxx - sx * sx
    es = [
        float(dslope * (n * y - sy) - nslope * (n * x - sx))
        for x, y in zip(xs, ys)
    ]
    den = num = 0.0
    prev = None
    for e in es:  # ordered accumulation in day order
        den += e * e
        num += 0.0 if prev is None else (e - prev) * (e - prev)
        prev = e
    dw = num / den
    slope = float(nslope) / float(dslope)
    assert got == [
        (n, _micro(slope / 100.0), _micro(dw), _micro(1.0 - dw / 2.0))
    ]
    # alive: DW lives strictly inside (0, 4) on a real series
    assert 0.0 < got[0][2] < 4.0


def test_runs_test_revenue_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        runs_test_revenue_sql,
    )

    got = con.execute(runs_test_revenue_sql()).fetchall()
    ys = _daily_cents(con)
    m = len(ys)
    med = sorted(ys)[(m + 1) // 2 - 1]  # lower median, nearest-rank
    sgns = [1 if y > med else 0 for y in ys if y != med]
    n1 = sum(sgns)
    n2 = len(sgns) - n1
    r = sum(
        1 for i, s in enumerate(sgns) if i == 0 or sgns[i - 1] != s
    )
    mm = n1 + n2
    mu = float(2 * n1 * n2) / float(mm) + 1.0
    var = float((2 * n1 * n2) * (2 * n1 * n2 - mm)) / float(mm * mm * (mm - 1))
    z = (float(r) - mu) / math.sqrt(var)
    assert got == [(n1, n2, r, _micro(mu), _micro(z))]
    # alive: both sign classes populated, at least two runs
    assert n1 > 0 and n2 > 0 and r >= 2


def test_jackknife_source_mean_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        jackknife_source_mean_sql,
    )

    got = con.execute(jackknife_source_mean_sql()).fetchall()
    rows = con.execute(
        "SELECT source, count(*) AS n_g, sum(n_chars) AS s_g "
        "FROM documents GROUP BY source ORDER BY source"
    ).fetchall()
    n = sum(ng for _s, ng, _sg in rows)
    s = sum(sg for _s, _ng, sg in rows)
    gtot = len(rows)
    theta_hat = float(s) / float(n)
    base = [
        (src, ng, float(s - sg) / float(n - ng))
        for src, ng, sg in rows
        if n > ng
    ]
    g_eff = len(base)
    cum = 0.0
    for _src, _ng, tl in base:  # ordered by source
        cum += tl
    theta_bar = cum / float(g_eff)
    ss = 0.0
    for _src, _ng, tl in base:
        ss += (tl - theta_bar) * (tl - theta_bar)
    jk_se = math.sqrt((float(g_eff) - 1.0) / float(g_eff) * ss)
    expect = [
        (
            src,
            ng,
            _micro(theta_hat),
            _micro(tl),
            _micro(float(gtot) * theta_hat - (float(gtot) - 1.0) * tl),
            _micro(jk_se) if g_eff > 1 else None,
        )
        for src, ng, tl in base
    ]
    assert got == expect
    # alive: 20 sources, a real spread of leave-one-out means
    assert g_eff >= 2 and jk_se > 0.0
