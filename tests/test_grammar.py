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


def test_delete1_keys_complete_for_lev1(spark):
    """Property: any two strings within levenshtein distance 1 share at
    least one deletion-neighborhood key — the losslessness guarantee the
    fuzzy-name blocking join rests on (SymSpell/FastSS).  Driven through
    the actual Spark expression, with hypothesis generating the second
    string by a random edit of the first."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from basin_climbing_data_pipeline_spark.operators.customers import _delete1_keys

    alphabet = "abcdefgh"
    collected: list[tuple[str, str]] = []

    @settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.text(alphabet, min_size=1, max_size=8),
        st.integers(0, 2),  # 0=substitute, 1=insert, 2=delete
        st.integers(0, 8),
        st.sampled_from(alphabet),
    )
    def gen(s, op, pos, ch):
        if op == 0:
            p = pos % len(s)
            t = s[:p] + ch + s[p + 1 :]
        elif op == 1:
            p = pos % (len(s) + 1)
            t = s[:p] + ch + s[p:]
        else:
            p = pos % len(s)
            t = s[:p] + s[p + 1 :]
        if t:
            collected.append((s, t))

    gen()
    assert collected
    from pyspark.sql import functions as F

    df = spark.createDataFrame(collected, "a string, b string")
    shared = df.select(
        "a",
        "b",
        F.size(
            F.array_intersect(
                _delete1_keys(F.col("a")), _delete1_keys(F.col("b"))
            )
        ).alias("n_shared"),
    )
    bad = shared.filter(F.col("n_shared") == 0).collect()
    assert not bad, f"lev<=1 pairs with no shared deletion key: {bad[:5]}"
