"""Independent math validation for the round-9 statistical operators.

Same contract as tests/test_round7_math.py / test_round8_math.py: the
bitwise oracle harness proves Spark == DuckDB, so the remaining failure
mode is both engines agreeing on the wrong math.  Every round-9 statistic
is recomputed here from raw inputs in pure Python (exact ints where the
operators use DECIMAL/HUGEINT, the same micro/nano grids) and compared
against the oracle engine's output at sf0.001.
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
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _ratio(num: float, den: float, digits: int) -> float:
    scale = float(10**digits)
    return math.floor(num / den * scale + 0.5) / scale


def _daily_cents(con) -> list[tuple]:
    """Zero-filled global daily cents — the round-9 time-series base."""
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    return con.execute(
        f"""WITH txn AS ({transactions_sql()}),
        daily AS (SELECT txn_date AS day,
                         sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS cents
                  FROM txn GROUP BY 1),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        calendar AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
                     FROM bounds)
        SELECT c.day, coalesce(d.cents, 0)::bigint
        FROM calendar c LEFT JOIN daily d USING (day) ORDER BY c.day"""
    ).fetchall()


def test_daily_revenue_acf_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        ACF_MAX_LAG,
        daily_revenue_acf_sql,
    )

    got = con.execute(daily_revenue_acf_sql()).fetchall()
    ys = [c for _d, c in _daily_cents(con)]
    n, s = len(ys), sum(ys)
    z = [n * y - s for y in ys]  # exact ints
    den = sum(v * v for v in z)
    q_sum = 0.0
    want = []
    for k in range(1, ACF_MAX_LAG + 1):
        num = sum(z[t] * z[t - k] for t in range(k, n))
        r = _micro(num / den)
        q_sum += r * r / (float(n) - float(k))
        q = _micro(float(n) * (float(n) + 2.0) * q_sum)
        want.append((n, k, r, q))
    assert [tuple(r) for r in got] == want
    # the statistic is alive: at least one lag shows non-zero correlation
    assert any(abs(r[2]) > 0 for r in got)


def test_seasonal_decomposition_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        SEAS_MA,
        seasonal_decomposition_daily_sql,
    )

    got = con.execute(seasonal_decomposition_daily_sql()).fetchall()
    rows = _daily_cents(con)
    ys = [c for _d, c in rows]
    days = [d for d, _c in rows]
    h = SEAS_MA // 2
    n = len(ys)
    s7 = [
        sum(ys[t - h : t + h + 1]) if h <= t < n - h else None for t in range(n)
    ]
    # DuckDB dayofweek: 0=Sunday..6, +1 in the oracle
    sd: dict[int, int] = {}
    nd: dict[int, int] = {}
    for t in range(n):
        if s7[t] is None:
            continue
        dow = (days[t].weekday() + 1) % 7 + 1  # python Mon=0 → Sun-first 1..7
        sd[dow] = sd.get(dow, 0) + SEAS_MA * ys[t] - s7[t]
        nd[dow] = nd.get(dow, 0) + 1
    want = []
    for t in range(n):
        dow = (days[t].weekday() + 1) % 7 + 1
        trend_c = s7[t] / float(SEAS_MA) if s7[t] is not None else None
        seas_c = sd[dow] / (float(SEAS_MA) * nd[dow]) if dow in sd else None
        resid = (
            _micro((ys[t] - trend_c - seas_c) / 100.0)
            if trend_c is not None and seas_c is not None
            else None
        )
        want.append(
            (
                days[t],
                ys[t] / 100.0,
                _micro(trend_c / 100.0) if trend_c is not None else None,
                _micro(seas_c / 100.0) if seas_c is not None else None,
                resid,
            )
        )
    assert [tuple(r) for r in got] == want


def test_revenue_changepoint_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        revenue_changepoint_sql,
    )

    got = con.execute(revenue_changepoint_sql()).fetchone()
    rows = _daily_cents(con)
    ys = [c for _d, c in rows]
    n, s = len(ys), sum(ys)
    best = None
    p = 0
    for t in range(1, n):  # t = days_before, split after day t
        p += ys[t - 1]
        nc = n * p - t * s
        key = (abs(nc), )
        if best is None or abs(nc) > best[0]:
            best = (abs(nc), t, p, nc, rows[t - 1][0])
    _absnc, t, p, nc, day = best
    assert got[0] == n
    assert got[1] == day
    assert got[2] == t
    assert got[3] == _ratio(p, t * 100.0, 2)
    assert got[4] == _ratio(s - p, (n - t) * 100.0, 2)
    assert got[5] == _ratio(nc, n * 100.0, 2)


def test_page_hinkley_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        PH_DELTA_CENTS,
        PH_LAMBDA_DOLLARS,
        page_hinkley_revenue_drift_sql,
    )

    got = con.execute(page_hinkley_revenue_drift_sql()).fetchall()
    rows = _daily_cents(con)
    p = 0
    m = 0
    m_min = 0
    want = []
    for t, (day, c) in enumerate(rows, start=1):
        p += c
        term = c - p / t - float(PH_DELTA_CENTS)
        m += math.floor(term * 1e6 + 0.5)
        m_min = min(m_min, m) if t > 1 else m
        ph = (m - m_min) / 1.0e8
        want.append((day, c / 100.0, _micro(ph), ph > PH_LAMBDA_DOLLARS))
    assert [tuple(r) for r in got] == want


def _durations(con) -> list[tuple]:
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        memberships_2024_sql,
    )

    return con.execute(
        f"SELECT (end_date - start_date) AS dur, (status = 'END') AS ev "
        f"FROM ({memberships_2024_sql()})"
    ).fetchall()


def _risk_frame(con):
    from collections import defaultdict

    raw = _durations(con)
    d_by, c_by = defaultdict(int), defaultdict(int)
    for dur, ev in raw:
        (d_by if ev else c_by)[dur] += 1
    times = sorted(set(d_by) | set(c_by))
    n = len(raw)
    out = []
    for t in times:
        d, c = d_by.get(t, 0), c_by.get(t, 0)
        out.append((t, n, d, c))
        n -= d + c
    return out


def test_nelson_aalen_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        nelson_aalen_hazard_sql,
    )

    got = con.execute(nelson_aalen_hazard_sql()).fetchall()
    h_nano = v_nano = 0
    want = []
    for t, n, d, c in _risk_frame(con):
        h_nano += math.floor(d / n * 1e9 + 0.5)
        v_nano += math.floor(d / (n * n) * 1e9 + 0.5)
        if d > 0:
            want.append(
                (
                    t,
                    n,
                    d,
                    c,
                    h_nano / 1e9,
                    _micro(math.sqrt(v_nano / 1e9)),
                    _micro(math.exp(-h_nano / 1e9)),
                )
            )
    assert [tuple(r) for r in got] == want
    # cumulative hazard is nondecreasing and F-H survival ≤ 1
    hs = [r[4] for r in got]
    assert all(a <= b for a, b in zip(hs, hs[1:]))


def test_km_greenwood_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        KM_CI_Z,
        km_greenwood_ci_sql,
    )

    got = con.execute(km_greenwood_ci_sql()).fetchall()
    cum = g = 0
    hit = False
    want = []
    for t, n, d, c in _risk_frame(con):
        if d >= n:
            hit = True
        if not hit:
            cum += math.floor(math.log((n - d) / n) * 1e9 + 0.5)
            g += math.floor(d / (n * (n - d)) * 1e9 + 0.5)
        if d > 0:
            s = math.exp(cum / 1e9)
            se = s * math.sqrt(g / 1e9)
            if hit:
                want.append((t, n, d, 0.0, None, 0.0, 0.0))
            else:
                want.append(
                    (
                        t,
                        n,
                        d,
                        _micro(s),
                        _micro(se),
                        _micro(max(s - KM_CI_Z * se, 0.0)),
                        _micro(min(s + KM_CI_Z * se, 1.0)),
                    )
                )
    assert [tuple(r) for r in got] == want
    for row in got:
        if row[4] is not None:
            assert row[5] <= row[3] <= row[6]


def test_rfm_segments_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        RFM_BUCKETS,
        rfm_segments_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(rfm_segments_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id,
               (SELECT max(txn_date) FROM txn) - max(txn_date) AS recency,
               count(*) AS freq,
               sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) AS cents
        FROM txn GROUP BY customer_id"""
    ).fetchall()
    n = len(raw)

    def before_map(vals):
        sv = sorted(vals)
        import bisect

        return {v: bisect.bisect_left(sv, v) for v in set(vals)}

    rb = before_map([r[1] for r in raw])
    fb = before_map([r[2] for r in raw])
    mb = before_map([r[3] for r in raw])
    cells = defaultdict(lambda: [0, 0])
    b = RFM_BUCKETS
    for _cid, rec, fr, cents in raw:
        r_score = b - min(b - 1, (b * rb[rec]) // n)
        f_score = min(b - 1, (b * fb[fr]) // n) + 1
        m_score = min(b - 1, (b * mb[cents]) // n) + 1
        cell = cells[(r_score, f_score, m_score)]
        cell[0] += 1
        cell[1] += cents
    want = sorted(
        (
            r,
            f,
            m,
            cnt,
            cents / 100.0,
            _ratio(cents, cnt * 100.0, 2),
        )
        for (r, f, m), (cnt, cents) in cells.items()
    )
    assert sorted(tuple(r) for r in got) == want


def test_jsd_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.quality import (
        jsd_source_categories_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(jsd_source_categories_sql()).fetchall()
    obs = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category, data_source, count(*) FROM txn GROUP BY 1, 2"""
    ).fetchall()
    cats = sorted({r[0] for r in obs})
    srcs = sorted({r[1] for r in obs})
    o = {(c, s): 0 for c in cats for s in srcs}
    for c, s, k in obs:
        o[(c, s)] = k
    n = sum(o.values())
    cat_tot = {c: sum(o[(c, s)] for s in srcs) for c in cats}
    src_tot = {s: sum(o[(c, s)] for c in cats) for s in srcs}
    want = []
    for s in srcs:
        sp = sq = 0
        for c in cats:
            p = o[(c, s)] / src_tot[s]
            q = cat_tot[c] / n
            m = (p + q) / 2.0
            if o[(c, s)] > 0:
                sp += math.floor(p * math.log(p / m) * 1e9 + 0.5)
            sq += math.floor(q * math.log(q / m) * 1e9 + 0.5)
        nats = (sp + sq) / 2.0e9
        want.append((s, src_tot[s], _micro(nats), _micro(nats / math.log(2.0))))
    assert [tuple(r) for r in got] == want
    for row in got:
        assert 0.0 <= row[2] <= math.log(2.0) + 1e-9  # JSD is bounded by ln 2


def test_lang_id_macro_f1_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        lang_id_macro_f1_sql,
        language_id_confusion_sql,
    )

    got = con.execute(lang_id_macro_f1_sql()).fetchall()
    conf = con.execute(language_id_confusion_sql()).fetchall()
    langs = sorted({r[0] for r in conf} | {r[1] for r in conf})
    tp = {g: 0 for g in langs}
    lab = {g: 0 for g in langs}
    det = {g: 0 for g in langs}
    for a, b, k in conf:
        lab[a] += k
        det[b] += k
        if a == b:
            tp[a] = k
    f1m = {}
    for g in langs:
        den = 2 * tp[g] + (det[g] - tp[g]) + (lab[g] - tp[g])
        f1m[g] = math.floor(2.0 * tp[g] / den * 1e6 + 0.5) if den > 0 else 0
    macro = math.floor(sum(f1m.values()) / len(langs) + 0.5)
    for row in got:
        g = row[0]
        fp, fn = det[g] - tp[g], lab[g] - tp[g]
        assert (row[1], row[2], row[3]) == (tp[g], fp, fn)
        assert row[4] == (_ratio(tp[g], tp[g] + fp, 6) if tp[g] + fp > 0 else None)
        assert row[5] == (_ratio(tp[g], tp[g] + fn, 6) if tp[g] + fn > 0 else None)
        assert row[6] == f1m[g] / 1e6
        assert row[7] == macro


def test_linkage_em_step_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.customers import (
        FS_FIELDS,
        FS_M,
        FS_PRIOR,
        customers_sql,
        linkage_em_step_sql,
        record_linkage_patterns_sql,
    )

    got = {r[0]: r for r in con.execute(linkage_em_step_sql()).fetchall()}
    pat = con.execute(
        f"SELECT pattern, n_pairs FROM ({record_linkage_patterns_sql()})"
    ).fetchall()
    u0 = {}
    for f in FS_FIELDS:
        n2, nt = con.execute(
            f"""WITH cust AS ({customers_sql()}),
            vc AS (SELECT {f} AS v, count(*) AS n FROM cust
                   WHERE {f} IS NOT NULL GROUP BY 1)
            SELECT sum(n * n), sum(n) FROM vc"""
        ).fetchone()
        u = n2 / (nt * nt)
        u0[f] = u if 0 < u < 1 else 0.5
    # E-step
    scored = []
    for pattern, n_pairs in pat:
        pm, pu = FS_PRIOR, 1.0 - FS_PRIOR
        for i, f in enumerate(FS_FIELDS):
            ch = pattern[i]
            pm *= FS_M if ch == "a" else (1.0 - FS_M) if ch == "d" else 1.0
            pu *= u0[f] if ch == "a" else (1.0 - u0[f]) if ch == "d" else 1.0
        r = math.floor(pm / (pm + pu) * 1e9 + 0.5)
        scored.append((pattern, n_pairs, r))
    n_total = sum(n for _p, n, _r in scored)
    rn = sum(r * n for _p, n, r in scored)
    pi1 = _micro(rn / (n_total * 1e9))
    for i, f in enumerate(FS_FIELDS):
        ma = sum(r * n for p, n, r in scored if p[i] == "a")
        mk = sum(r * n for p, n, r in scored if p[i] != "n")
        ua = sum((10**9 - r) * n for p, n, r in scored if p[i] == "a")
        uk = sum((10**9 - r) * n for p, n, r in scored if p[i] != "n")
        row = got[f]
        assert row[1] == FS_M
        assert row[2] == (_micro(ma / mk) if mk > 0 else None)
        assert row[3] == (_micro(ua / uk) if uk > 0 else None)
        assert row[4] == pi1
        assert row[5] == n_total


def test_tukey_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        tukey_category_outliers_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(tukey_category_outliers_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT revenue_category,
               CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT) FROM txn"""
    ).fetchall()
    from collections import defaultdict

    by = defaultdict(list)
    for cat, cents in raw:
        by[cat].append(cents)
    want = []
    for cat in sorted(by):
        v = sorted(by[cat])
        n = len(v)
        q1 = v[(n + 3) // 4 - 1]
        q3 = v[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        lo = sum(1 for x in v if 2 * x < 2 * q1 - 3 * iqr)
        hi = sum(1 for x in v if 2 * x > 2 * q3 + 3 * iqr)
        want.append(
            (
                cat,
                n,
                q1 / 100.0,
                q3 / 100.0,
                iqr / 100.0,
                (2 * q1 - 3 * iqr) / 200.0,
                (2 * q3 + 3 * iqr) / 200.0,
                lo,
                hi,
            )
        )
    assert [tuple(r) for r in got] == want


def test_cochran_armitage_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        cochran_armitage_trend_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(cochran_armitage_trend_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT o.o_orderpriority, substr(o.o_orderpriority, 1, 1)::bigint,
               count(*), sum(t.is_refund::bigint)
        FROM txn t JOIN orders o
          ON split_part(t.transaction_id, '_', 1)::bigint = o.o_orderkey
        GROUP BY 1, 2 ORDER BY 1"""
    ).fetchall()
    n = sum(r[2] for r in raw)
    rr = sum(r[3] for r in raw)
    swn = sum(r[1] * r[2] for r in raw)
    sw2n = sum(r[1] * r[1] * r[2] for r in raw)
    swr = sum(r[1] * r[3] for r in raw)
    p = rr / n
    var = p * (1.0 - p) * (sw2n - swn * swn / n)
    z = _micro((swr - swn * p) / math.sqrt(var)) if 0 < rr < n and var > 0 else None
    for row, r in zip(got, raw):
        assert (row[0], row[1], row[2], row[3]) == r
        assert row[4] == _ratio(r[3], r[2], 6)
        assert row[5] == z


def test_funnel_latency_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        FUNNEL_HOP_US,
        funnel_step_latency_sql,
    )

    got = con.execute(funnel_step_latency_sql()).fetchall()
    ev = con.execute(
        "SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) FROM events"
    ).fetchall()
    by = defaultdict(lambda: defaultdict(list))
    for u, t, us in ev:
        by[u][t].append(us)
    lats = defaultdict(list)
    for u, evs in by.items():
        if "view" not in evs:
            continue
        t1 = min(evs["view"])
        clicks = [x for x in evs.get("click", []) if t1 < x <= t1 + FUNNEL_HOP_US]
        if not clicks:
            continue
        t2 = min(clicks)
        lats["view_to_click"].append((t2 - t1) // 1_000_000)
        purch = [x for x in evs.get("purchase", []) if t2 < x <= t2 + FUNNEL_HOP_US]
        if purch:
            t3 = min(purch)
            lats["click_to_purchase"].append((t3 - t2) // 1_000_000)
    want = []
    for hop in sorted(lats):
        v = sorted(lats[hop])
        n, s = len(v), sum(v)
        med = v[(n + 1) // 2 - 1]
        p90 = v[(9 * n + 9) // 10 - 1]
        want.append((hop, n, _ratio(s, n, 2), med, p90))
    assert [tuple(r) for r in got] == want


def test_ltv_triangle_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.cohorts import ltv_triangle_sql
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(ltv_triangle_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id, date_trunc('month', txn_date)::date,
               CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)
        FROM txn"""
    ).fetchall()
    first = {}
    for cid, m, _c in raw:
        if cid not in first or m < first[cid]:
            first[cid] = m
    size = defaultdict(int)
    for cid in first:
        size[first[cid]] += 1
    cells = defaultdict(lambda: [0, set()])
    for cid, m, c in raw:
        cm = first[cid]
        age = (m.year - cm.year) * 12 + (m.month - cm.month)
        cell = cells[(cm, age)]
        cell[0] += c
        cell[1].add(cid)
    want = []
    for cm in sorted({k[0] for k in cells}):
        cum = 0
        for age in sorted(a for c, a in cells if c == cm):
            cents, actives = cells[(cm, age)]
            cum += cents
            want.append(
                (
                    cm,
                    age,
                    size[cm],
                    len(actives),
                    cents / 100.0,
                    cum / 100.0,
                    _ratio(cum, size[cm] * 100.0, 2),
                )
            )
    assert [tuple(r) for r in got] == want


def test_hll_source_overlap_matches_pure_python(con):
    import hashlib

    from basin_climbing_data_pipeline_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_BUCKETS,
        HLL_RHO_BITS,
        hll_source_overlap_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(hll_source_overlap_sql()).fetchall()
    raw = con.execute(
        f"WITH txn AS ({transactions_sql()}) "
        f"SELECT DISTINCT data_source, customer_id FROM txn"
    ).fetchall()
    regs: dict[str, dict[int, int]] = {}
    for src, cid in raw:
        h = hashlib.md5(str(cid).encode()).hexdigest()
        bucket = int(h[:2], 16)
        tail = int(h[2:14], 16)
        rho = HLL_RHO_BITS - max(tail.bit_length(), 1) + 1
        r = regs.setdefault(src, {})
        r[bucket] = max(r.get(bucket, 0), rho)

    def est(r: dict[int, int]) -> float:
        s = sum(2 ** (HLL_RHO_BITS - v) for v in r.values())
        npres = len(r)
        unit = float(2**HLL_RHO_BITS)
        raw_e = (
            HLL_ALPHA
            * HLL_BUCKETS
            * HLL_BUCKETS
            / ((s + (HLL_BUCKETS - npres) * 2**HLL_RHO_BITS) / unit)
        )
        empty = HLL_BUCKETS - npres
        if raw_e <= 2.5 * HLL_BUCKETS and empty > 0:
            return float(HLL_BUCKETS) * math.log(float(HLL_BUCKETS) / empty)
        return raw_e

    srcs = sorted(regs)
    want = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            merged = dict(regs[a])
            for k, v in regs[b].items():
                merged[k] = max(merged.get(k, 0), v)
            ea, eb, eu = est(regs[a]), est(regs[b]), est(merged)
            inter = max(ea + eb - eu, 0.0)
            want.append(
                (
                    a,
                    b,
                    _micro(ea),
                    _micro(eb),
                    _micro(eu),
                    _micro(inter),
                    _micro(inter / eu) if eu > 0 else None,
                    _micro(inter / min(ea, eb)) if min(ea, eb) > 0 else None,
                )
            )
    assert [tuple(r) for r in got] == want
    # sketch sanity: the union estimate dominates both sides
    for row in got:
        assert row[4] >= max(row[2], row[3]) - 1e-6


def test_semantic_decontamination_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.similarity import (
        COSINE_SCALE,
        N_QUERIES,
        SEMDECON_TAU,
        semantic_decontamination_sql,
    )

    got = con.execute(semantic_decontamination_sql()).fetchall()
    emb = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in emb}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    want = []
    for q in sorted(v for v in vecs if v < N_QUERIES):
        qs = vecs[q]
        nq = math.sqrt(dot(qs, qs))
        best = None
        cnt = 0
        for cid in sorted(v for v in vecs if v >= N_QUERIES):
            cs = vecs[cid]
            cos = math.floor(
                dot(qs, cs) / (nq * math.sqrt(dot(cs, cs))) * COSINE_SCALE + 0.5
            ) / COSINE_SCALE
            if cos >= SEMDECON_TAU:
                cnt += 1
            if best is None or cos > best[1] or (cos == best[1] and cid < best[0]):
                best = (cid, cos)
        want.append((q, cnt, best[0], best[1], best[1] >= SEMDECON_TAU))
    assert [tuple(r) for r in got] == want


def test_rmst_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        RMST_HORIZON_DAYS,
        rmst_membership_sql,
    )

    got = con.execute(rmst_membership_sql()).fetchone()
    raw = _durations(con)
    frame = _risk_frame(con)
    cum = 0
    hit = False
    steps = []  # (t, s_micro)
    for t, n, d, _c in frame:
        if d == 0:
            continue
        if d >= n:
            hit = True
        if not hit:
            cum += math.floor(math.log((n - d) / n) * 1e9 + 0.5)
        steps.append((t, 0 if hit else math.floor(math.exp(cum / 1e9) * 1e6 + 0.5)))
    h = RMST_HORIZON_DAYS
    area = 1_000_000 * min(steps[0][0], h)
    for i, (t, s) in enumerate(steps):
        nxt = steps[i + 1][0] if i + 1 < len(steps) else h
        area += s * max(min(nxt, h) - min(t, h), 0)
    rmst = _micro(area / 1e6)
    naive = _micro(sum(d for d, _e in raw) / len(raw))
    assert got[0] == h
    assert got[1] == len(raw)
    assert got[2] == len(steps)
    assert got[3] == rmst
    assert got[4] == naive
    # censoring bias: naive mean must not exceed the restricted mean by
    # construction on this corpus shape (both are day counts >= 0)
    assert got[3] > 0


def test_overdispersion_matches_pure_python(con):
    from collections import defaultdict
    import datetime as dt

    from basin_climbing_data_pipeline_spark.operators.events import (
        overdispersion_check_sql,
    )

    got = con.execute(overdispersion_check_sql()).fetchall()
    raw = con.execute(
        "SELECT event_type, ts::DATE, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    days = defaultdict(dict)
    for t, d, c in raw:
        days[t][d] = c
    want = []
    for t in sorted(days):
        d0, d1 = min(days[t]), max(days[t])
        n = (d1 - d0).days + 1
        cs = [days[t].get(d0 + dt.timedelta(days=i), 0) for i in range(n)]
        s1, s2 = sum(cs), sum(c * c for c in cs)
        mean = s1 / n
        var = (n * s2 - s1 * s1) / (n * (n - 1.0))
        di = var / mean
        want.append(
            (
                t,
                n,
                _ratio(s1, n, 4),
                _micro(var),
                _micro(di),
                _micro((n - 1.0) * di),
                di > 2.0,
            )
        )
    assert [tuple(r) for r in got] == want


def test_position_based_attribution_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.events import (
        PBA_FIRST_MICRO,
        PBA_LAST_MICRO,
        PBA_LOOKBACK_US,
        position_based_attribution_sql,
    )

    got = con.execute(position_based_attribution_sql()).fetchall()
    ev = con.execute(
        "SELECT user_id, epoch_us(ts::TIMESTAMP), event_type, event_id FROM events"
    ).fetchall()
    by_user = defaultdict(list)
    for u, us, t, eid in ev:
        by_user[u].append((us, t, eid))
    credit = defaultdict(int)
    purchases_touched = defaultdict(set)
    touches = defaultdict(int)
    mid = 1_000_000 - PBA_FIRST_MICRO - PBA_LAST_MICRO
    for u, evs in by_user.items():
        for us, t, pid in evs:
            if t != "purchase":
                continue
            tl = sorted(
                (tus, ch, tid)
                for tus, ch, tid in evs
                if ch != "purchase" and us - PBA_LOOKBACK_US <= tus < us
            )
            k = len(tl)
            for pos, (_tus, ch, _tid) in enumerate(tl, start=1):
                if k == 1:
                    c = 1_000_000
                elif k == 2:
                    c = 500_000
                elif pos == 1:
                    c = PBA_FIRST_MICRO
                elif pos == k:
                    c = PBA_LAST_MICRO
                else:
                    c = mid // (k - 2)
                credit[ch] += c
                purchases_touched[ch].add(pid)
                touches[ch] += 1
    total = sum(credit.values())
    want = [
        (
            ch,
            credit[ch] / 1e6,
            len(purchases_touched[ch]),
            touches[ch],
            _ratio(credit[ch], total, 6) if total > 0 else None,
        )
        for ch in sorted(credit)
    ]
    assert [tuple(r) for r in got] == want


def test_capture_recapture_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.quality import (
        capture_recapture_population_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(capture_recapture_population_sql()).fetchall()
    raw = con.execute(
        f"WITH txn AS ({transactions_sql()}) "
        f"SELECT DISTINCT data_source, customer_id FROM txn"
    ).fetchall()
    sets = defaultdict(set)
    for s, c in raw:
        sets[s].add(c)
    n_true = len({c for _s, c in raw})
    srcs = sorted(sets)
    want = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            na, nb = len(sets[a]), len(sets[b])
            m = len(sets[a] & sets[b])
            nhat = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
            se = math.sqrt(
                (na + 1.0) * (nb + 1.0) * (na - m) * (nb - m)
                / ((m + 1.0) ** 2 * (m + 2.0))
            )
            want.append(
                (
                    a,
                    b,
                    na,
                    nb,
                    m,
                    _micro(nhat),
                    _micro(se),
                    n_true,
                    _micro((nhat - n_true) / n_true),
                )
            )
    assert [tuple(r) for r in got] == want


def test_readability_matches_pure_python(con):
    import re
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        readability_scores_sql,
    )

    got = con.execute(readability_scores_sql()).fetchall()
    raw = con.execute("SELECT source, text FROM documents").fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, text in raw:
        a = agg[src]
        a[0] += 1
        a[1] += len(text.strip(" ").split(" "))
        runs = len(re.findall(r"[.!?]+", text))
        a[2] += 1 if runs == 0 and text.strip(" ") else runs
        a[3] += len(re.findall(r"[aeiouyAEIOUY]+", text))
    want = []
    for src in sorted(agg):
        nd, w, s, y = agg[src]
        want.append(
            (
                src,
                nd,
                w,
                s,
                y,
                _ratio(w, s, 4) if s > 0 else None,
                _ratio(y, w, 4) if w > 0 else None,
                _micro(206.835 - 1.015 * (w / s) - 84.6 * (y / w))
                if s > 0 and w > 0
                else None,
            )
        )
    assert [tuple(r) for r in got] == want


def test_near_dup_threshold_sweep_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        NEAR_DUP_TAUS,
        minhash_lsh_pairs_sql,
        near_dup_threshold_sweep_sql,
    )

    got = con.execute(near_dup_threshold_sweep_sql()).fetchall()
    pairs = con.execute(
        f"SELECT doc_a, doc_b, jaccard FROM ({minhash_lsh_pairs_sql()})"
    ).fetchall()
    want = []
    for t in NEAR_DUP_TAUS:
        keep = [(a, b) for a, b, j in pairs if j >= t]
        docs = {d for p in keep for d in p}
        want.append((t, len(keep), len(docs)))
    assert [tuple(r) for r in got] == want
    # monotone: higher threshold can only shrink the surviving set
    ns = [r[1] for r in got]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_source_length_ks_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        source_length_ks_sql,
    )

    got = con.execute(source_length_ks_sql()).fetchall()
    raw = con.execute("SELECT source, n_chars FROM documents").fetchall()
    by = defaultdict(list)
    for s, n in raw:
        by[s].append(n)
    all_lens = sorted({n for _s, n in raw})
    want = []
    for s in sorted(by):
        mine = sorted(by[s])
        rest = sorted(n for src, ns in by.items() if src != s for n in ns)
        import bisect

        n_s, n_r = len(mine), len(rest)
        dmax = max(
            abs(bisect.bisect_right(mine, v) * n_r - bisect.bisect_right(rest, v) * n_s)
            for v in all_lens
        )
        want.append((s, n_s, n_r, _micro(dmax / (n_s * n_r))))
    assert [tuple(r) for r in got] == want


def test_format_marker_rates_matches_pure_python(con):
    import re
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        FORMAT_MARKERS,
        format_marker_rates_sql,
    )

    got = con.execute(format_marker_rates_sql()).fetchall()
    raw = con.execute("SELECT source, text FROM documents").fetchall()
    agg = defaultdict(lambda: [0] + [0] * len(FORMAT_MARKERS))
    for s, text in raw:
        a = agg[s]
        a[0] += 1
        for i, (_n, pat) in enumerate(FORMAT_MARKERS):
            if re.search(pat, text):
                a[i + 1] += 1
    want = []
    for s in sorted(agg):
        a = agg[s]
        want.append(
            tuple([s, a[0]] + [_ratio(a[i + 1], a[0], 6) for i in range(len(FORMAT_MARKERS))])
        )
    assert [tuple(r) for r in got] == want


def test_split_token_jsd_matches_pure_python(con):
    import hashlib
    from collections import Counter

    from basin_climbing_data_pipeline_spark.operators.sampling import TRAIN_PCT
    from basin_climbing_data_pipeline_spark.operators.textstats import (
        split_token_jsd_sql,
    )

    got = con.execute(split_token_jsd_sql()).fetchone()
    raw = con.execute("SELECT doc_id, text FROM documents").fetchall()
    ca, cb = Counter(), Counter()
    for did, text in raw:
        bucket = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 100
        c = ca if bucket < TRAIN_PCT else cb
        for tok in text.strip(" ").split(" "):
            if tok:
                c[tok] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    sp = sq = 0
    for tok in vocab:
        a, b = ca.get(tok, 0), cb.get(tok, 0)
        p, q = a / na, b / nb
        m = (p + q) / 2.0
        if a > 0:
            sp += math.floor(p * math.log(p / m) * 1e9 + 0.5)
        if b > 0:
            sq += math.floor(q * math.log(q / m) * 1e9 + 0.5)
    jsd = (sp + sq) / 2.0e9
    assert got[0] == na and got[1] == nb and got[2] == len(vocab)
    assert got[3] == _micro(jsd)
    assert got[4] == _micro(jsd / math.log(2.0))
    assert 0.0 <= got[3] <= math.log(2.0) + 1e-9


def test_embedding_norm_audit_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.similarity import (
        embedding_norm_audit_sql,
    )

    got = con.execute(embedding_norm_audit_sql()).fetchall()
    raw = con.execute("SELECT label, embedding FROM embeddings").fetchall()
    by = defaultdict(list)
    for lb, vec in raw:
        s = 0.0
        for x in vec:
            s += float(x) * float(x)
        by[lb].append(math.floor(math.sqrt(s) * 1e9 + 0.5))
    want = []
    for lb in sorted(by):
        nm = by[lb]
        n, s1, s2 = len(nm), sum(nm), sum(v * v for v in nm)
        mean = s1 / n
        sd = math.sqrt((n * s2 - s1 * s1) / (n * n))
        outs = sum(1 for v in nm if abs(v - mean) > 3.0 * sd)
        nano9 = lambda x: math.floor(x * 1e9 + 0.5) / 1e9  # noqa: E731
        want.append(
            (
                lb,
                n,
                nano9(mean / 1e9),
                nano9(sd / 1e9),
                min(nm) / 1e9,
                max(nm) / 1e9,
                outs,
            )
        )
    assert [tuple(r) for r in got] == want


def test_retrieval_rank_agreement_consistency(con):
    """Full python re-ranking would duplicate the RRF stages; instead pin
    the CONSISTENCY contract: n_shared ≤ min(n_dense, n_lex), the overlap
    Jaccard matches its own counts exactly, and every query row exists."""
    from basin_climbing_data_pipeline_spark.operators.retrieval import (
        retrieval_rank_agreement_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.similarity import N_QUERIES

    got = con.execute(retrieval_rank_agreement_sql()).fetchall()
    assert len(got) == N_QUERIES
    for q, nd, nl, ns, oj, _md in got:
        assert ns <= min(nd, nl)
        union = nd + nl - ns
        if union > 0:
            assert oj == _ratio(ns, union, 6)


def test_cluster_size_distribution_matches_pure_python(con):
    from collections import Counter

    from basin_climbing_data_pipeline_spark.operators.dedup import (
        cluster_size_distribution_sql,
        dedup_clusters_sql,
    )

    got = con.execute(cluster_size_distribution_sql()).fetchall()
    clusters = con.execute(
        f"SELECT DISTINCT cluster_id, cluster_size FROM ({dedup_clusters_sql()})"
    ).fetchall()
    spec = Counter(sz for _cid, sz in clusters)
    sizes = sorted(spec)
    docs_total = sum(sz * c for sz, c in spec.items())
    k = len(sizes)
    lns = {sz: math.floor(math.log(sz) * 1e9 + 0.5) for sz in sizes}
    lnc = {sz: math.floor(math.log(spec[sz]) * 1e9 + 0.5) for sz in sizes}
    sx, sy = sum(lns.values()), sum(lnc.values())
    sxx = sum(v * v for v in lns.values())
    sxy = sum(lns[sz] * lnc[sz] for sz in sizes)
    den = sxx - sx * sx / k
    slope = _micro((sxy - sx * sy / k) / den) if k > 1 and den != 0 else None
    want = []
    for sz in sizes:
        docs_ge = sum(s * c for s, c in spec.items() if s >= sz)
        want.append(
            (
                sz,
                spec[sz],
                sz * spec[sz],
                _ratio(docs_ge, docs_total, 6),
                slope,
            )
        )
    assert [tuple(r) for r in got] == want


def test_mixture_budget_curve_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        MIX_BUDGET_PCTS,
        mixture_budget_curve_sql,
        temperature_mixture_weights_sql,
    )

    got = con.execute(mixture_budget_curve_sql()).fetchall()
    w = con.execute(
        f"SELECT source, n_tokens, temp_weight FROM ({temperature_mixture_weights_sql()})"
    ).fetchall()
    t = sum(r[1] for r in w)
    want = []
    for pct in MIX_BUDGET_PCTS:
        for src, nt, tw in sorted(w):
            alloc = (t * pct) // 100 * math.floor(tw * 1e6 + 0.5) // 1_000_000
            granted = min(alloc, nt)
            want.append(
                (pct, src, nt, alloc, granted, alloc > nt, _ratio(granted, nt, 6))
            )
    assert [tuple(r) for r in got] == want
    # cap-binding monotone: once a source saturates it stays saturated
    from collections import defaultdict

    by_src = defaultdict(list)
    for pct, src, _nt, _a, _g, binds, _u in got:
        by_src[src].append(binds)
    for flags in by_src.values():
        assert flags == sorted(flags)  # False... then True...


def test_sequential_probe_obf_matches_pure_python(con):
    import hashlib
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.experiments import (
        OBF_C,
        OBF_LOOKS,
        sequential_probe_obf_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(sequential_probe_obf_sql()).fetchall()
    raw = con.execute(
        f"WITH txn AS ({transactions_sql()}) "
        f"SELECT txn_date, customer_id, is_refund::int FROM txn ORDER BY txn_date"
    ).fetchall()
    per_date = defaultdict(int)
    for d, _c, _r in raw:
        per_date[d] += 1
    dates = sorted(per_date)
    n = len(raw)
    before = 0
    look_of = {}
    for d in dates:
        look_of[d] = min(OBF_LOOKS - 1, (OBF_LOOKS * before) // n) + 1
        before += per_date[d]
    cum = {k: [0, 0, 0, 0] for k in range(1, OBF_LOOKS + 1)}
    for d, cid, r in raw:
        h = int(hashlib.md5(str(cid).encode()).hexdigest()[:8], 16) % 2 == 0
        cell = cum[look_of[d]]
        if h:
            cell[0] += 1
            cell[1] += r
        else:
            cell[2] += 1
            cell[3] += r
    na = ca = nb = cb = 0
    want = []
    for k in range(1, OBF_LOOKS + 1):
        na += cum[k][0]
        ca += cum[k][1]
        nb += cum[k][2]
        cb += cum[k][3]
        pool = (ca + cb) / (na + nb)
        z = (ca / na - cb / nb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
        bound = OBF_C * math.sqrt(OBF_LOOKS / k)
        want.append(
            (k, na, ca, nb, cb, _micro(z), _micro(bound), abs(z) > bound)
        )
    assert [tuple(r) for r in got] == want


def test_dedup_weight_ess_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.dedup import dedup_clusters_sql
    from basin_climbing_data_pipeline_spark.operators.sampling import (
        dedup_weight_ess_sql,
    )

    got = con.execute(dedup_weight_ess_sql()).fetchall()
    docs = con.execute("SELECT doc_id, source FROM documents").fetchall()
    csize = dict(
        con.execute(
            f"SELECT doc_id, cluster_size FROM ({dedup_clusters_sql()})"
        ).fetchall()
    )
    by = defaultdict(list)
    for did, src in docs:
        by[src].append(math.floor(1e6 / csize.get(did, 1) + 0.5))
    want = []
    for src in sorted(by):
        ws = by[src]
        sw, sww = sum(ws), sum(w * w for w in ws)
        ess = sw * sw / sww
        want.append((src, len(ws), _micro(ess), _ratio(ess, len(ws), 6)))
    assert [tuple(r) for r in got] == want
    # ESS never exceeds n and equals n exactly when all weights are equal
    for _s, n, ess, ratio_ in got:
        assert ess <= n + 1e-6


def test_heaps_law_fit_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.operators.textstats import (
        HEAPS_CUTS,
        heaps_law_fit_sql,
    )

    got = con.execute(heaps_law_fit_sql()).fetchall()
    raw = con.execute(
        "SELECT source, doc_id, text FROM documents ORDER BY source, doc_id"
    ).fetchall()
    by = defaultdict(list)
    for src, did, text in raw:
        by[src].append([t for t in text.strip(" ").split(" ") if t])
    want = []
    for src in sorted(by):
        docs = by[src]
        n_docs = len(docs)
        pts = []
        for cut in HEAPS_CUTS:
            k = (cut * n_docs + 99) // 100
            n_i = sum(len(d) for d in docs[:k])
            v_i = len({t for d in docs[:k] for t in d})
            if n_i > 0 and v_i > 0:
                pts.append(
                    (
                        math.floor(math.log(n_i) * 1e9 + 0.5),
                        math.floor(math.log(v_i) * 1e9 + 0.5),
                        n_i,
                        v_i,
                        cut,
                    )
                )
        kk = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        den = sxx - sx * sx / kk
        beta = (sxy - sx * sy / kk) / den if kk > 1 and den != 0 else None
        lnk = (sy - beta * sx) / kk / 1e9 if beta is not None else None
        full = [p for p in pts if p[4] == 100][0]
        want.append(
            (
                src,
                full[2],
                full[3],
                _micro(beta) if beta is not None else None,
                _micro(math.exp(lnk)) if lnk is not None else None,
            )
        )
    assert [tuple(r) for r in got] == want
    # Heaps exponent lives in [0, 1] — β = 0 exactly means the vocabulary
    # saturated before the first cut (legitimate on tiny sources)
    for row in got:
        if row[3] is not None:
            assert 0.0 <= row[3] <= 1.0 + 1e-6


def test_revenue_pareto_shares_matches_pure_python(con):
    from basin_climbing_data_pipeline_spark.operators.cohorts import (
        PARETO_TOPS,
        revenue_pareto_shares_sql,
    )
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        transactions_sql,
    )

    got = con.execute(revenue_pareto_shares_sql()).fetchall()
    raw = con.execute(
        f"""WITH txn AS ({transactions_sql()})
        SELECT customer_id, sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT))
        FROM txn GROUP BY 1"""
    ).fetchall()
    cents = sorted((c for _cid, c in raw), reverse=True)
    n, total = len(cents), sum(cents)
    want = []
    for p in PARETO_TOPS:
        top_n = (p * n + 99) // 100
        tier = cents[:top_n]
        want.append(
            (
                p,
                len(tier),
                sum(tier) / 100.0,
                _ratio(sum(tier), total, 6) if total != 0 else None,
            )
        )
    assert [tuple(r) for r in got] == want
    # concentration is monotone in the tier width
    shares = [r[3] for r in got]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))


def test_activity_heatmap_matches_pure_python(con):
    from collections import Counter, defaultdict

    from basin_climbing_data_pipeline_spark.operators.events import (
        activity_heatmap_sql,
    )

    got = con.execute(activity_heatmap_sql()).fetchall()
    raw = con.execute(
        "SELECT dayofweek(ts)::int + 1, hour(ts)::int FROM events"
    ).fetchall()
    grid = Counter(raw)
    total = sum(grid.values())
    day_max = defaultdict(int)
    for (d, _h), c in grid.items():
        day_max[d] = max(day_max[d], c)
    peak = {}
    for d in day_max:
        peak[d] = min(h for (dd, h), c in grid.items() if dd == d and c == day_max[d])
    want = sorted(
        (d, h, c, _ratio(c, total, 6), h == peak[d]) for (d, h), c in grid.items()
    )
    assert sorted(tuple(r) for r in got) == want


def test_streaming_jsd_drift_matches_pure_python(con):
    from collections import defaultdict

    from basin_climbing_data_pipeline_spark.streaming.events_stream import (
        WINDOW_US,
        streaming_jsd_drift_sql,
    )

    got = con.execute(streaming_jsd_drift_sql()).fetchall()
    raw = con.execute(
        f"SELECT (epoch_us(ts::TIMESTAMP) // {WINDOW_US}) * {WINDOW_US}, event_type "
        "FROM events"
    ).fetchall()
    counts = defaultdict(int)
    for w, t in raw:
        counts[(w, t)] += 1
    windows = sorted({w for w, _t in counts})
    types = sorted({t for _w, t in counts})
    want = []
    for i, w in enumerate(windows):
        if i == 0:
            continue
        prev = windows[i - 1]
        tot = sum(counts.get((w, t), 0) for t in types)
        ptot = sum(counts.get((prev, t), 0) for t in types)
        if tot == 0 or ptot == 0:
            continue
        sp = sq = 0
        for t in types:
            a, b = counts.get((w, t), 0), counts.get((prev, t), 0)
            p, q = a / tot, b / ptot
            m = (p + q) / 2.0
            if a > 0:
                sp += math.floor(p * math.log(p / m) * 1e9 + 0.5)
            if b > 0:
                sq += math.floor(q * math.log(q / m) * 1e9 + 0.5)
        want.append((w, tot, ptot, _micro((sp + sq) / 2.0e9)))
    assert [tuple(r) for r in got] == want
    for row in got:
        assert 0.0 <= row[3] <= math.log(2.0) + 1e-9
