"""Physical-plan audit helpers.

The reference has no optimizer to audit (SURVEY.md §4.1); the engine's
physical strategy is Catalyst's, and this module makes it inspectable: how
many shuffles a query plans, which joins broadcast, whether scans prune
columns and push filters.  Used by tests (plan regressions fail loudly) and
by ``tools/plan_report.py`` for the per-round perf review.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@dataclass
class PlanStats:
    n_exchanges: int
    n_broadcast_exchanges: int
    n_shuffle_exchanges: int
    n_broadcast_hash_joins: int
    n_sort_merge_joins: int
    n_bnl_joins: int
    scans: list[str]
    pushed_filters: list[str]
    read_schemas: list[str]
    # WholeStageCodegen span count from the formatted plan.  Under AQE the
    # pre-execution plan (isFinalPlan=false) carries NO codegen markers —
    # neither does the CODEGEN explain, which refuses to descend into
    # AdaptiveSparkPlan — so this reads 0 unless the plan was built with
    # spark.sql.adaptive.enabled=false; tools/plan_report.py does exactly
    # that for its audit pass (rounds <= 5 printed the misleading 0).
    wholestage_ids: int


def audit(df: DataFrame) -> PlanStats:
    plan = formatted_plan(df)
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return PlanStats(
        n_exchanges=plan.count("Exchange"),
        n_broadcast_exchanges=plan.count("BroadcastExchange"),
        n_shuffle_exchanges=len(re.findall(r"\(\d+\) Exchange", plan)),
        n_broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        n_sort_merge_joins=plan.count("SortMergeJoin"),
        n_bnl_joins=plan.count("BroadcastNestedLoopJoin"),
        scans=scans,
        pushed_filters=[p for p in pushed if p.strip()],
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", plan),
        wholestage_ids=len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
    )
