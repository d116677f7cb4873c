"""Driver-contract regression guards on the registry itself.

The driver verifies the FIRST 50 registry entries per round and
canonicalizes results with pandas (sort columns by name, hash values) —
two contracts that broke silently in the past: an import-order drift would
scramble the verification window, and a complex-typed output column
(``kmeans_refine``'s former ``array<bigint>`` centroids) crashes the
canonicalizer's ``sort_values``.  These tests pin both.
"""

from __future__ import annotations

import pytest

from basin_climbing_data_pipeline_spark import registry


def test_window_order_is_the_declared_rotation():
    """The first 50 entries must be exactly _ROUND11_WINDOW, in order —
    the round's verification plan IS the registration order."""
    names = list(registry.REGISTRY)
    assert names[:50] == registry._ROUND11_WINDOW


def test_rotation_arithmetic_cannot_compound_debt():
    """Judge order (round-8 verdict #4): additions staged for the next
    round plus owed re-verifies must fit the 50-slot window, and the
    current window must cover every entry never driver-verified.  Today
    the 3 round-10 additions (the only never-verified entries) lead
    _ROUND11_WINDOW, followed by the 11 rank-consolidation owed
    re-verifies and the 36 dec38-consolidation fill re-verifies; a green
    CORRECTNESS_r11 reaches 280/280 driver-verified-ever.  Additions per
    round are further capped at 20 (round-9 verdict #6: depth over
    breadth)."""
    assert len(registry._ROUND11_WINDOW) == 50
    assert (
        len(registry._ROUND11_FRONT) + len(registry._ROUND11_OWED) <= registry._WINDOW_SLOTS
    )
    assert len(registry._ROUND11_FRONT) <= 20
    # every staged round-11 name must exist and not already be in-window
    for n in registry._ROUND11_FRONT + registry._ROUND11_OWED:
        assert n in registry.REGISTRY
    assert not set(registry._ROUND11_OWED) & set(registry._ROUND10_WINDOW)
    # the consolidation fill must never displace a front/owed slot
    assert registry._ROUND11_WINDOW[:3] == registry._ROUND11_FRONT
    assert not set(registry._ROUND11_FILL) & set(
        registry._ROUND11_FRONT + registry._ROUND11_OWED
    )


def test_every_query_has_an_oracle_or_documented_rows_only():
    """Each entry carries oracle SQL unless it is one of the documented
    rows-only checks (genuinely non-SQL-expressible semantics)."""
    rows_only_allowed: set[str] = set()  # flags_via_applyinpandas gained a
    # value-hash oracle in round 6; nothing is rows-only today
    missing = [
        name
        for name, (_fn, sql) in registry.REGISTRY.items()
        if sql is None and name not in rows_only_allowed
    ]
    assert not missing, missing


@pytest.mark.slow
def test_no_complex_output_types(spark, sf_dir):
    """No registered query may emit array/map/struct output columns: the
    driver canonicalizer sorts result columns with pandas, which cannot
    factorize list cells (the exact failure that made kmeans_refine the
    one red driver row in round 4).  Schema-only — builds every plan at
    sf0.001 without executing it."""
    from pyspark.sql import types as T

    bad = []
    for name, (fn, _sql) in registry.REGISTRY.items():
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, bad


def test_session_timezone_fail_loud_and_self_heal(spark, sf_dir, monkeypatch):
    """Two halves of the timezone defense: the raw events-timestamp path
    REFUSES to run under a non-UTC session (an NTZ->LTZ cast there would
    silently shift instants), and the registry wrapper SELF-HEALS — the
    driver may invoke queries() on a session it configured itself, so a
    wrapped query under a mis-tuned session must retune and produce the
    baseline rows."""
    monkeypatch.setenv("SPARK_GRAFT_NO_MATERIALIZE", "1")
    from basin_climbing_data_pipeline_spark.io import load_table

    fn = registry.REGISTRY["entry_method_counts"][0]
    baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # fail-loud: the raw nanos-normalization path rejects the session
        with pytest.raises(ValueError, match="timeZone"):
            load_table(spark, sf_dir, "events")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # self-heal: the wrapped registry query retunes and matches
        healed = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert healed == baseline
