"""Benchmark runner — the driver's per-round feedback loop.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced with a noop-format write so every column is computed
(a bare .count() would let Catalyst prune the expensive projections).

``--reps N`` (or $SPARK_GRAFT_BENCH_REPS, DEFAULT 3) repeats the timed
query phase N times and reports each query's MINIMUM wall — the
noise-resistant profile the round-9 verdict ordered promoted into the
tool: this box's envelope spans ±30%+ at identical code (three identical
closing runs measured 357.8/495.3/414.3 s in round 9), so a single-run
sweep is weak evidence for any per-query movement; the min profile is
what round-over-round comparison should read.  Warm-up and the warehouse
load run once; per-rep totals land in BENCH_FULL.json as ``rep_totals``
and the compact line carries the ``reps`` actually RUN.  A wall budget
($SPARK_GRAFT_BENCH_BUDGET_S, default 2300) stops further reps when the
projected finish would overshoot — the first rep always completes, so a
slow day degrades to fewer reps instead of a driver timeout.  The default
was 1500 through round 10, which degraded the driver's own record to 2
reps (a rep costs ~550 s at 280 queries / sf0.1 on this box, so rep 3
projected past 1500); 2300 fits 3 typical reps plus the round-10-measured
worst single-rep wall (758 s) once, while staying far under the ~2.5 h
inter-round driver window (round-10's ~1260 s driver bench run drew no
timeout).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from basin_climbing_data_pipeline_spark.io import load_table  # noqa: E402
from basin_climbing_data_pipeline_spark.registry import REGISTRY  # noqa: E402
from basin_climbing_data_pipeline_spark.session import get_spark  # noqa: E402


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    # parse --reps FIRST: a malformed flag must fail fast, not after the
    # multi-minute warm-up/load phases
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    if "--reps" in sys.argv:
        i = sys.argv.index("--reps")
        if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
            print("usage: bench.py [--reps N]  (N a positive integer)", file=sys.stderr)
            return 2
        reps = int(sys.argv[i + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the queries
    for t in ("lineitem", "orders", "events"):
        load_table(spark, sf_dir, t).count()

    # compile each query's generated code once at the smallest SF BEFORE the
    # timed phases: the whole-stage-codegen class cache is keyed by generated
    # source, which is identical across scale factors, so the measured sf
    # runs (including the warehouse load below, whose builders compile the
    # same classes) pay execution cost, not JIT cost.  The warm cost is
    # driver-side Catalyst analysis/compile, which parallelizes across
    # threads (unlike the executor-bound load phase below, which measured
    # WORSE threaded) — 8 threads cut the warm wall ~4 min -> under a
    # minute at 94 queries.  Streaming queries mutate shuffle.partitions
    # via a set/restore context manager; concurrent interleaving can leave
    # the restore wrong, so the session value is pinned back afterwards.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        from concurrent.futures import ThreadPoolExecutor

        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")

        def warm_one(item):
            _name, (fn, _sql) = item
            try:
                run_query(fn(spark, warm_dir))
            except Exception:
                pass  # surfaced in the measured run below

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(warm_one, REGISTRY.items()))
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # load phase (not timed as queries, TPC-H style): build the per-process
    # warehouse tables downstream queries scan — the reference likewise
    # materializes its derived tables nightly and dashboards only read them.
    # Two dependency stages, threaded within each: with the coalesce (no
    # extra shuffle) warehouse write, each materialization job uses few
    # cores, so concurrency now wins (9.1s staged-threaded vs 19.6s serial
    # at sf0.1; the old repartition write measured the opposite).  Stage 2
    # holds the builders that read stage-1 tables, so a thread never
    # triggers a dependency build inside another builder's lock.
    t_load = time.time()
    from basin_climbing_data_pipeline_spark.operators.events import (
        build_checkins,
        proximity_connections,
    )
    from basin_climbing_data_pipeline_spark.operators.customers import (
        build_customers,
        family_relationships,
    )
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        _cluster_labels,
        _pruned_shingles,
        minhash_lsh_pairs,
    )
    from basin_climbing_data_pipeline_spark.operators.flags import build_flags, events_unified
    from basin_climbing_data_pipeline_spark.operators.memberships import build_memberships_2024
    from basin_climbing_data_pipeline_spark.operators.transactions import build_transactions

    from concurrent.futures import ThreadPoolExecutor

    load_per_table: dict[str, float] = {}

    def load_one(b) -> None:
        t_b = time.time()
        b(spark, sf_dir).count()
        load_per_table[b.__name__] = round(time.time() - t_b, 3)

    # Declared build dependencies: builder -> builders whose materialized
    # table it reads (conservative supersets are fine).  Stages are DERIVED
    # topologically from this map rather than hand-maintained: the per-key
    # materialize locks serialize an in-thread dependency build, but a
    # MUTUAL dependency would deadlock the pool — deriving stages turns
    # that future edit into a loud cycle error instead of a hang.
    builder_deps = {
        build_transactions: (),
        build_checkins: (),
        build_customers: (),
        build_memberships_2024: (),
        events_unified: (build_transactions, build_checkins, build_memberships_2024),
        _pruned_shingles: (),
        build_flags: (build_checkins, build_customers, build_memberships_2024,
                      events_unified),
        family_relationships: (build_customers, build_checkins),
        minhash_lsh_pairs: (_pruned_shingles,),
        _cluster_labels: (minhash_lsh_pairs,),
        proximity_connections: (build_checkins,),
    }
    # Cycle check up front (Kahn's peel over the declared map): with every
    # builder in ONE pool, the per-key materialize locks serialize each
    # dependency edge correctly, but a MUTUAL dependency would deadlock
    # two threads on each other's lock — refuse loudly instead of hanging.
    pending, placed = dict(builder_deps), set()
    while pending:
        ready = tuple(b for b, ds in pending.items() if all(d in placed for d in ds))
        if not ready:
            raise RuntimeError(
                "dependency cycle among warehouse builders: "
                + ", ".join(b.__name__ for b in pending)
            )
        placed.update(ready)
        for b in ready:
            del pending[b]
    # One pool, maximum overlap: a builder whose dependency is mid-build
    # just blocks on that key's lock while unrelated builders proceed —
    # wall time is the longest dependency CHAIN, not the stage sum.
    builders = tuple(builder_deps)
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        list(pool.map(load_one, builders))
    load_sec = round(time.time() - t_load, 3)

    # Rep budget: further reps run only while the projected finish stays
    # under the wall budget (first rep always runs).  This lets the default
    # be a 3-rep min profile — the noise-resistant artifact the round-9
    # verdict ordered — without risking a driver-side timeout on a slow
    # day: a rep costs its predecessor's wall, so stop when elapsed +
    # last_rep would overshoot.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2300"))
    t_reps = time.time()
    timings: dict[str, float | None] = {}
    rep_totals: list[float] = []
    # per-query wall per rep, so a single-record reader can adjudicate a
    # mover as noise (wide spread on identical code) without needing a
    # second bench run — round-11 verdict order #4.  Failed reps are null.
    per_rep_walls: dict[str, list[float | None]] = {}
    for _rep in range(max(1, reps)):
        if rep_totals and (time.time() - t_reps) + rep_totals[-1] > budget_s:
            print(
                f"bench: stopping after {len(rep_totals)} rep(s) — projected "
                f"finish exceeds SPARK_GRAFT_BENCH_BUDGET_S={budget_s:.0f}s",
                file=sys.stderr,
            )
            break
        rep_total = 0.0
        for name, (fn, _sql) in REGISTRY.items():
            t0 = time.time()
            try:
                run_query(fn(spark, sf_dir))
                dt = time.time() - t0
            except Exception as e:  # a failing query should show up, not hide
                print(f"bench error in {name}: {e}", file=sys.stderr)
                dt = float("nan")
            rep_total += dt if dt == dt else 0.0
            per_rep_walls.setdefault(name, []).append(
                round(dt, 3) if dt == dt else None
            )
            # min over successful reps; a query is failed only if it never
            # succeeded (NaN != NaN keeps a lone failure from poisoning min)
            prev = timings.get(name)
            if dt == dt and (prev is None or dt < prev):
                timings[name] = round(dt, 3)
            elif prev is None:
                timings[name] = None
        rep_totals.append(round(rep_total, 3))
    total = sum(v for v in timings.values() if v is not None)

    reps_run = len(rep_totals)
    payload = {
        "metric": "total_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # read rule (BENCH_NOTES.md): `queries` is the min profile; judge a
        # mover against its own `queries_reps` spread FIRST — a wall inside
        # [min, max] of any same-HEAD record is box noise, not a regression
        "queries_reps": per_rep_walls,
        "reps": reps_run,
        "rep_totals": rep_totals,
        "warehouse_load_sec": load_sec,
        "warehouse_load_per_table": load_per_table,
        "sf": sf,
    }
    # The full per-query record lands on disk, where it survives the round
    # intact (this is what round-over-round diffs read).  Overridable so
    # the exit-code meta-test can run main() without clobbering the
    # committed artifact.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
    )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    line = compact_line(timings, total, load_sec, sf, reps=reps_run)
    print(json.dumps(line, allow_nan=False))
    # a red bench must be a red exit code — a `bench.py | tee`-style gate
    # without pipefail once landed a failing run as green (round-7 lesson)
    return 1 if line["n_failed"] else 0


def compact_line(
    timings: dict[str, float | None],
    total: float,
    load_sec: float,
    sf: float,
    budget: int = 1900,
    reps: int = 1,
) -> dict:
    """The single stdout record: the driver keeps only a ~2 KB tail of
    stdout and parses the last line as JSON; the full per-query map is
    several KB, so printing it yields a truncated fragment and a null
    `parsed`.  Build instead ONE compact line that always fits: headline =
    the slowest queries (the ones round-over-round comparison cares
    about), plus the totals and a pointer at the on-disk full record.  The
    number of shown queries adapts to the byte budget — no static cap —
    and `queries_shown` participates in the byte check (3-digit
    placeholder) so the printed line can never exceed the checked budget
    at any registry size."""
    failed = sorted(k for k, v in timings.items() if v is None)
    slowest = sorted(
        ((k, v) for k, v in timings.items() if v is not None),
        key=lambda kv: (-kv[1], kv[0]),
    )
    line = {
        "metric": "total_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {},
        "n_queries": len(timings),
        "n_failed": len(failed),
        # reps > 1 => `value` is the MIN-PROFILE sum (per-query minima), a
        # composite no single run achieved — comparable only against other
        # min profiles at the same reps, NOT against reps=1 history
        "reps": reps,
        "warehouse_load_sec": load_sec,
        "full_record": "BENCH_FULL.json",
        "sf": sf,
        "queries_shown": 999,
    }
    for k, v in slowest:
        line["queries"][k] = v
        if len(json.dumps(line)) > budget:
            del line["queries"][k]
            break
    line["queries_shown"] = len(line["queries"])
    if len(json.dumps(line)) > budget:
        raise AssertionError("compact bench line exceeds its byte budget")
    return line


if __name__ == "__main__":
    sys.exit(main())
