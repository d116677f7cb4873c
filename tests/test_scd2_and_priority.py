"""Unit contracts for the round-6 additions: SCD2 run-compression and
source-priority duplicate resolution."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.operators import dedup as dd
from basin_climbing_data_pipeline_spark.operators import memberships as mem


def test_scd2_compress_splits_recurring_states(spark):
    """A state that RECURS must yield two separate effective ranges —
    the failure mode a naive groupBy(key, state) silently merges."""
    d = lambda s: dt.date.fromisoformat(s)  # noqa: E731
    rows = [
        # key 1: active -> frozen -> active  (A-B-A)
        (1, d("2024-01-01"), "active"),
        (1, d("2024-02-01"), "frozen"),
        (1, d("2024-03-01"), "active"),
        (1, d("2024-04-01"), "active"),
        # key 2: single unbroken run
        (2, d("2024-01-01"), "active"),
        (2, d("2024-02-01"), "active"),
    ]
    observed = spark.createDataFrame(rows, "k long, snap date, state string")
    got = sorted(
        (r["k"], r["state"], r["effective_from"].isoformat(), r["effective_to"].isoformat())
        for r in mem.scd2_compress(observed, "k", "state", "snap").collect()
    )
    assert got == [
        (1, "active", "2024-01-01", "2024-01-01"),
        (1, "active", "2024-03-01", "2024-04-01"),
        (1, "frozen", "2024-02-01", "2024-02-01"),
        (2, "active", "2024-01-01", "2024-02-01"),
    ]


def test_membership_scd2_invariants(spark, sf_dir):
    """Per membership: ranges tile the snapshot grid without overlap,
    states follow the pending->active->expired lifecycle order, and
    exactly one row is current."""
    rows = mem.membership_scd2(spark, sf_dir).collect()
    assert rows
    by_m: dict[int, list] = {}
    for r in rows:
        by_m.setdefault(r["membership_id"], []).append(r)
    grid = [dt.date.fromisoformat(d) for d in mem.SCD2_SNAPSHOT_DATES]
    order = {"pending": 0, "active": 1, "expired": 2}
    for m_id, hist in by_m.items():
        hist.sort(key=lambda r: r["effective_from"])
        covered = []
        for r in hist:
            covered += [d for d in grid if r["effective_from"] <= d <= r["effective_to"]]
        assert covered == grid, f"membership {m_id} ranges do not tile the grid"
        states = [r["state"] for r in hist]
        assert states == sorted(states, key=order.__getitem__), states
        assert sum(r["is_current"] for r in hist) == 1


def test_source_priority_dedup_policy(spark, sf_dir):
    """Every cluster keeps exactly one doc; the keeper carries the
    cluster's minimum tier (ties broken by lowest doc_id); dropped rows
    all point at the keeper."""
    rows = dd.source_priority_dedup(spark, sf_dir).collect()
    assert rows
    by_c: dict[int, list] = {}
    for r in rows:
        by_c.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_c.items():
        kept = [r for r in members if r["kept"]]
        assert len(kept) == 1, f"cluster {cid} kept {len(kept)} docs"
        best = min((r["tier"], r["doc_id"]) for r in members)
        assert (kept[0]["tier"], kept[0]["doc_id"]) == best
        assert all(r["keep_doc_id"] == kept[0]["doc_id"] for r in members)


def test_source_priority_matches_cluster_membership(spark, sf_dir):
    """The resolution runs over exactly the dedup_clusters doc set —
    same edges, same threshold — so the two views never disagree on
    which docs are clustered."""
    pri = {r["doc_id"]: r["cluster_id"] for r in dd.source_priority_dedup(spark, sf_dir).collect()}
    clu = {r["doc_id"]: r["cluster_id"] for r in dd.dedup_clusters(spark, sf_dir).collect()}
    assert pri == clu


def test_unknown_source_falls_to_worst_tier(spark):
    got = (
        spark.createDataFrame([("src3",), ("never_seen",)], "source string")
        .select(dd._tier_col(F.col("source")).alias("t"))
        .collect()
    )
    assert [r["t"] for r in got] == [0, dd.SOURCE_TIER_DEFAULT]


def test_scd2_compress_matches_runlength_reference_property(spark):
    """Property: scd2_compress equals a pure-Python run-length encoding of
    each key's date-ordered state sequence, for arbitrary (short) state
    sequences across keys — recurrences, single-date runs, one-key and
    multi-key frames."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = dt.date(2024, 1, 1)

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        seqs=st.lists(  # one inner list of states per key, dates = index
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=6),
            min_size=1,
            max_size=3,
        )
    )
    def run(seqs):
        rows = [
            (k, base + dt.timedelta(days=i), s)
            for k, states in enumerate(seqs)
            for i, s in enumerate(states)
        ]
        expected = set()
        for k, states in enumerate(seqs):
            start = 0
            for i in range(1, len(states) + 1):
                if i == len(states) or states[i] != states[start]:
                    expected.add(
                        (
                            k,
                            states[start],
                            base + dt.timedelta(days=start),
                            base + dt.timedelta(days=i - 1),
                        )
                    )
                    start = i
        observed = spark.createDataFrame(rows, "k long, snap date, state string")
        got = {
            (r["k"], r["state"], r["effective_from"], r["effective_to"])
            for r in mem.scd2_compress(observed, "k", "state", "snap").collect()
        }
        assert got == expected, seqs

    run()


def test_star_contraction_matches_union_find_property(spark):
    """Property: alternating-star connected components equal a union-find
    reference on arbitrary small edge lists (self-loops, duplicate edges,
    non-contiguous ids)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=20,
        )
    )
    def run(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        expected = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

        pdf = spark.createDataFrame(edges, "src long, dst long")
        sym = pdf.union(pdf.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        got = {
            r["node"]: r["label"]
            for r in dd.propagate_min_labels(sym).collect()
        }
        assert got == expected, edges

    run()


def test_data_questions_queue_contract(spark, sf_dir):
    """Review-queue invariants: every rule family emits at most one row
    per customer, priorities are from the fixed vocabulary, and each rule
    only fires on rows satisfying its own predicate (spot-checked via the
    customer dimension)."""
    from basin_climbing_data_pipeline_spark.operators.customers import (
        build_customers,
        data_questions,
    )

    rows = data_questions(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        key = (r["customer_id"], r["question_type"])
        assert key not in seen, f"duplicate queue row {key}"
        seen.add(key)
        assert r["priority"] in {"high", "medium"}
        assert r["n_visits"] >= 0
    cust = {r["customer_id"]: r for r in build_customers(spark, sf_dir).collect()}
    for r in rows:
        c = cust[r["customer_id"]]
        if r["question_type"] == "email_typo":
            assert c["email"] is not None
            assert c["email"].rsplit("@", 1)[1] != c["email_domain"]
        if r["question_type"] in ("unreachable_guardian", "ambiguous_family"):
            assert c["is_child"]
            assert r["n_visits"] > 0


def test_scd2_apply_snapshot_fold_equals_batch_compress(spark):
    """Property: folding snapshots one date at a time through
    scd2_apply_snapshot (the O(dimension)-per-night incremental path)
    equals scd2_compress over the union of all observations (the
    O(history) rebuild) — including keys that skip snapshot dates and
    reappear, with the same or a different state."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = dt.date(2024, 1, 1)
    schema = "k long, state string, effective_from date, effective_to date"

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        seqs=st.lists(  # per key: state per day, None = absent that day
            st.lists(
                st.one_of(st.none(), st.sampled_from(["a", "b"])),
                min_size=1,
                max_size=5,
            ),
            min_size=1,
            max_size=3,
        )
    )
    def run(seqs):
        n_days = max(len(s) for s in seqs)
        obs_rows = [
            (k, base + dt.timedelta(days=i), s)
            for k, states in enumerate(seqs)
            for i, s in enumerate(states)
            if s is not None
        ]
        if not obs_rows:
            return
        observed = spark.createDataFrame(obs_rows, "k long, snap date, state string")
        batch = {
            (r["k"], r["state"], r["effective_from"], r["effective_to"])
            for r in mem.scd2_compress(observed, "k", "state", "snap").collect()
        }
        hist = spark.createDataFrame([], schema)
        for i in range(n_days):
            d = base + dt.timedelta(days=i)
            snap_rows = [
                (k, states[i])
                for k, states in enumerate(seqs)
                if i < len(states) and states[i] is not None
            ]
            if not snap_rows:
                continue
            snap = spark.createDataFrame(snap_rows, "k long, state string")
            hist = mem.scd2_apply_snapshot(hist, snap, "k", "state", d).localCheckpoint()
        fold = {
            (r["k"], r["state"], r["effective_from"], r["effective_to"])
            for r in hist.collect()
        }
        assert fold == batch, seqs

    run()


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """Poisson-bootstrap sanity: lo <= point mean <= hi, bounds are
    distinct replicate means, and the estimate is deterministic across
    invocations (md5 weights, no RNG)."""
    from basin_climbing_data_pipeline_spark.operators.experiments import (
        bootstrap_spend_ci,
    )

    r1 = bootstrap_spend_ci(spark, sf_dir).collect()[0]
    assert r1["ci_lo_cents"] <= r1["mean_cents"] <= r1["ci_hi_cents"]
    assert r1["ci_lo_cents"] < r1["ci_hi_cents"]
    assert r1["b_replicates"] == 40 and r1["n_customers"] > 0
    r2 = bootstrap_spend_ci(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
