"""Reference-style scenario tests for the pass-transfer grammar parser
(reference parse_pass_transfers.py:79-102 cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.functions.grammar import parse_pass_transfer

CASES = [
    (
        "5 Climb Punch Pass from Nancy Davis (3 remaining)",
        ("5 Climb Punch Pass", "Nancy Davis", 3, True),
    ),
    (
        "Guest Pass from John Smith",
        ("Guest Pass", "John Smith", None, False),
    ),
    (
        "Adult Day Pass",
        (None, None, None, False),
    ),
    (
        "10 Punch Pass from Mary-Jane O'Neil (10 remaining)",
        ("10 Punch Pass", "Mary-Jane O'Neil", 10, True),
    ),
]


def test_pass_transfer_grammar(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "description string")
    out = df.select(parse_pass_transfer(F.col("description")).alias("p")).select(
        "p.pass_type", "p.purchaser_name", "p.remaining_count", "p.is_punch_pass"
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [c[1] for c in CASES]
