"""Per-query isolated wall timing + formatted-plan capture (round-12 opt).

Usage:
    python tools/qtime.py [--reps N] [--explain-dir DIR] [--suffix TAG] q1 q2 ...
    python tools/qtime.py --top N          # time the N slowest from BENCH_FULL.json

Builds the warehouse first (same builders bench.py preloads), then per query
runs the noop-sink write REPS times (default 3) and reports each wall plus the
min.  With --explain-dir, also writes ``<dir>/<query>_<suffix>.txt`` with the
``.explain("formatted")`` output (captured once, before the timed runs).

Timing methodology matches bench.py: ``fn(spark, sf_dir)`` build + noop write
inside the timed region, one shared session at ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basin_climbing_data_pipeline_spark.registry import REGISTRY  # noqa: E402
from basin_climbing_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    explain_dir = None
    suffix = "plan"
    names: list[str] = []
    top_n = 0
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain-dir":
            explain_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--top":
            top_n = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1
    if top_n:
        full = json.load(open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_FULL.json")))
        ranked = sorted(((v, k) for k, v in full["queries"].items() if v), reverse=True)
        names = [k for _v, k in ranked[:top_n]] + names
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    # same warehouse preload as bench.py so timings exclude builder one-offs
    from bench import run_query  # noqa: E402
    from basin_climbing_data_pipeline_spark.operators.events import (
        build_checkins, proximity_connections)
    from basin_climbing_data_pipeline_spark.operators.customers import (
        build_customers, family_relationships)
    from basin_climbing_data_pipeline_spark.operators.dedup import (
        _pruned_shingles, minhash_lsh_pairs)
    from basin_climbing_data_pipeline_spark.operators.flags import (
        build_flags, events_unified)
    from basin_climbing_data_pipeline_spark.operators.memberships import (
        build_memberships_2024)
    from basin_climbing_data_pipeline_spark.operators.transactions import (
        build_transactions)
    for b in (build_transactions, build_checkins, build_customers,
              build_memberships_2024, events_unified, _pruned_shingles,
              build_flags, family_relationships, minhash_lsh_pairs,
              proximity_connections):
        b(spark, sf_dir).count()

    results: dict[str, list[float]] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            # force analysis+optimization+physical planning without execution
            df._jdf.queryExecution().executedPlan()
            t_plan = time.time() - t0 - t_build
            run_query(df)
            walls.append(round(time.time() - t0, 3))
            if r == 0:
                print(f"  [{name}] build={t_build:.3f}s plan={t_plan:.3f}s "
                      f"exec={walls[0]-t_build-t_plan:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        results[name] = walls
        print(f"{name}: min={min(walls):.3f}  reps={walls}", flush=True)
    print(json.dumps({k: min(v) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
