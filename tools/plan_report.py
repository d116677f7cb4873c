"""Per-query physical-plan report: shuffles, join strategies, scan pushdown.

Usage: python tools/plan_report.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # report the real builder plans, not warehouse scans of materialized output
    os.environ.setdefault("SPARK_GRAFT_NO_MATERIALIZE", "1")
    only = set(sys.argv[1:])
    from basin_climbing_data_pipeline_spark.plans.audit import audit
    from basin_climbing_data_pipeline_spark.registry import REGISTRY
    from basin_climbing_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # AQE off for the AUDIT ONLY: the adaptive pre-execution plan hides
    # WholeStageCodegen markers (isFinalPlan=false), which made the codegen
    # column read 0 in rounds <= 5.  Static operator/exchange/join counts
    # are identical either way; production sessions keep AQE on.  The
    # registry wrapper re-enables AQE via tune_session, so the audit calls
    # the unwrapped builder and applies the UTC pin itself.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name, (fn, _sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            st = audit(getattr(fn, "__wrapped__", fn)(spark, sf_dir))
        except Exception as e:
            print(f"{name}: plan error {e}")
            continue
        print(
            f"{name}: shuffles={st.n_shuffle_exchanges} bcast={st.n_broadcast_exchanges} "
            f"BHJ={st.n_broadcast_hash_joins} SMJ={st.n_sort_merge_joins} "
            f"BNLJ={st.n_bnl_joins} scans={len(st.scans)} codegen={st.wholestage_ids}"
        )


if __name__ == "__main__":
    main()
