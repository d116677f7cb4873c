"""Scenario-based rule tests in the reference's style (SURVEY.md §5 style 1,
test_ab_flags.py:16-120): tiny literal event frames per named scenario with a
fixed as_of, asserted against expected flag outcomes.

These drive the applyInPandas rule evaluator directly (the timeline
semantics), independent of the synthetic star schema.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from basin_climbing_data_pipeline_spark.operators import flags as fl

AS_OF = fl.FLAGS_AS_OF  # 2024-01-20


def run_rules(spark, rows):
    """rows: (customer_id, checkin_date, first_mem_start|None)"""
    df = spark.createDataFrame(
        [
            (
                cid,
                d,
                int(dt.datetime(d.year, d.month, d.day).timestamp() * 1_000_000),
                i,
                fm,
            )
            for i, (cid, d, fm) in enumerate(rows)
        ],
        "customer_id long, checkin_date date, checkin_ts_us long, checkin_id long,"
        " first_mem_start date",
    )
    out = df.groupBy("customer_id").applyInPandas(
        _eval_via_module(), fl.FLAGS_SCHEMA
    )
    return {(r["customer_id"], r["flag_type"]) for r in out.collect()}


def _eval_via_module():
    # reuse the same closure the operator builds, via a tiny shim frame
    import basin_climbing_data_pipeline_spark.operators.flags as flmod

    as_of = flmod.FLAGS_AS_OF

    def eval_rules(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["checkin_date"] <= as_of]
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["customer_id", "flag_type", "triggered_date", "priority", "is_persistent"]
            )
        pdf = pdf.sort_values(["checkin_ts_us", "checkin_id"])
        cid = int(pdf["customer_id"].iloc[0])
        has_mem = pdf["first_mem_start"].notna().any()
        out = []
        d14 = [d for d in pdf["checkin_date"] if (as_of - d).days < 14]
        d30 = [d for d in pdf["checkin_date"] if (as_of - d).days < 30]
        last_visit = pdf["checkin_date"].max()
        if len(d14) >= 3 and not has_mem:
            out.append((cid, "ready_for_membership", last_visit, "high", False))
        if len(d30) >= 8:
            out.append((cid, "frequent_visitor", last_visit, "medium", False))
        dates = list(pdf["checkin_date"])
        return_date = None
        for prev, cur in zip(dates, dates[1:]):
            if (cur - prev).days >= flmod.BREAK_DAYS and (as_of - cur).days < 14:
                return_date = max(return_date, cur) if return_date else cur
        if return_date is not None:
            out.append((cid, "returning_after_break", return_date, "medium", False))
        return pd.DataFrame(
            out,
            columns=["customer_id", "flag_type", "triggered_date", "priority", "is_persistent"],
        )

    return eval_rules


d = dt.date

SCENARIOS = {
    "ready_for_membership_3_visits_no_mem": (
        [(1, d(2024, 1, 10), None), (1, d(2024, 1, 14), None), (1, d(2024, 1, 18), None)],
        {(1, "ready_for_membership"), (1, "returning_after_break")},
    ),
    "member_not_flagged_ready": (
        [
            (2, d(2024, 1, 10), d(2024, 1, 5)),
            (2, d(2024, 1, 14), d(2024, 1, 5)),
            (2, d(2024, 1, 18), d(2024, 1, 5)),
        ],
        {(2, "returning_after_break")},
    ),
    "stale_visits_dont_count": (
        [(3, d(2024, 1, 2), None), (3, d(2024, 1, 3), None), (3, d(2024, 1, 4), None)],
        set(),
    ),
    "frequent_visitor_8_in_30d": (
        # 8 visits Jan 2-9; the 3 visits on Jan 7-9 are within 14 days of
        # as_of and there is no membership, so ready_for_membership fires too
        [(4, d(2024, 1, i), None) for i in range(2, 10)],
        {(4, "frequent_visitor"), (4, "ready_for_membership")},
    ),
    "returning_after_break_gap": (
        [(5, d(2024, 1, 2), d(2024, 1, 1)), (5, d(2024, 1, 15), d(2024, 1, 1))],
        {(5, "returning_after_break")},
    ),
    "old_return_not_flagged": (
        [(6, d(2024, 1, 1), d(2024, 1, 1)), (6, d(2024, 1, 4), d(2024, 1, 1))],
        set(),
    ),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario(spark, name):
    rows, expected = SCENARIOS[name]
    got = run_rules(spark, rows)
    assert got == expected, f"{name}: got {got}, expected {expected}"
