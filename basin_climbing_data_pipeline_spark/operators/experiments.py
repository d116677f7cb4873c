"""AB experiment tracking (reference experiment_tracking.py:15-127).

The reference logs one ``customer_experiment_entries`` row the first time a
customer receives an AB-test flag (log_experiment_entry: skip-if-exists per
(customer, experiment), group from the md5 assignment, entry_flag = the
triggering flag).  Here the same table derives set-at-a-time from the flags
engine: the offer-flag family is the experiment's entry surface; the earliest
triggering flag per customer wins (deterministic tie-break on flag_type).

The skip-if-exists append semantics (re-running the pipeline must not
duplicate entries) are the generic ``append_if_absent`` incremental operator
(operators/incremental.py, ST4) — pytest exercises the replay in
tests/test_experiments.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import dec38, dec38_prod
from .flags import OFFER_FLAG_TYPES, build_flags, build_flags_sql

EXPERIMENT_ID = "day_pass_conversion_2024_01"

ENTRY_FLAGS = tuple(OFFER_FLAG_TYPES) + tuple(f"child_{t}" for t in OFFER_FLAG_TYPES)


def experiment_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (customer, experiment): group assignment + entry flag."""
    flags = build_flags(spark, sf_dir).filter(F.col("flag_type").isin(*ENTRY_FLAGS))
    w = Window.partitionBy("customer_id").orderBy("triggered_date", "flag_type")
    return (
        flags.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "customer_id",
            F.lit(EXPERIMENT_ID).alias("experiment_id"),
            F.col("ab_group").alias("ab_group"),
            F.col("flag_type").alias("entry_flag"),
            F.col("triggered_date").alias("entry_date"),
        )
        .orderBy("customer_id")
    )


def experiment_entries_sql() -> str:
    entry_list = ", ".join(f"'{t}'" for t in ENTRY_FLAGS)
    return f"""
WITH fl AS ({build_flags_sql()}),
ranked AS (
  SELECT customer_id, ab_group, flag_type, triggered_date,
         row_number() OVER (PARTITION BY customer_id
                            ORDER BY triggered_date, flag_type) AS rn
  FROM fl WHERE flag_type IN ({entry_list})
)
SELECT customer_id, '{EXPERIMENT_ID}' AS experiment_id, ab_group,
       flag_type AS entry_flag, triggered_date AS entry_date
FROM ranked WHERE rn = 1
ORDER BY customer_id
"""


# ---------------------------------------------------------------------------
# A/B conversion z-test
# ---------------------------------------------------------------------------

ZTEST_CONVERSION_DAYS = 30  # membership start within N days of entry = converted


def experiment_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over the A/B experiment: per experiment, the
    A and B conversion rates (membership started within
    ``ZTEST_CONVERSION_DAYS`` of entry) and the pooled z-score — the
    readout the reference's AB experiment log exists to feed
    (experiment_tracking.py:15-127; the reference never computes the
    statistic, it eyeballs counts).  |z| > 1.96 is the usual "ship it"
    line; the query reports the number, not the verdict.

    Determinism: counts are exact integers; the z formula runs in
    floating point with a fixed operand order mirrored by the oracle
    (IEEE division/sqrt are correctly rounded — same precedent as
    daily_anomalies' z-scores), then micro-rounds once.

    Scale shape: one as-of-style left join (entry → first membership
    within the window, both sides keyed on customer), one conditional
    aggregation to 1 row per experiment."""
    from .memberships import build_memberships_2024

    entries = experiment_entries(spark, sf_dir)
    first_m = (
        build_memberships_2024(spark, sf_dir)
        .groupBy("owner_id")
        .agg(F.min("start_date").alias("m_start"))
    )
    joined = entries.join(
        first_m, entries["customer_id"] == first_m["owner_id"], "left"
    ).select(
        "experiment_id",
        "ab_group",
        (
            F.col("m_start").isNotNull()
            & (F.col("m_start") >= F.col("entry_date"))
            & (F.col("m_start") <= F.date_add(F.col("entry_date"), ZTEST_CONVERSION_DAYS))
        )
        .cast("long")
        .alias("converted"),
    )
    agg = joined.groupBy("experiment_id").agg(
        F.sum((F.col("ab_group") == "A").cast("long")).alias("n_a"),
        F.sum(F.when(F.col("ab_group") == "A", F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum((F.col("ab_group") == "B").cast("long")).alias("n_b"),
        F.sum(F.when(F.col("ab_group") == "B", F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa = F.col("conv_a") / na
    pb = F.col("conv_b") / nb
    pool = (F.col("conv_a") + F.col("conv_b")) / (na + nb)
    z = (pa - pb) / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    from ..functions.money import ratio

    # guards: a tiny corpus can leave a group empty (rate undefined) or the
    # pooled rate degenerate at 0/1 (sqrt(0) -> div-by-zero under ANSI mode);
    # the statistic is NULL there, never an error
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    z_ok = both & (F.col("conv_a") + F.col("conv_b") > 0) & (
        F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")
    )
    return agg.select(
        "experiment_id",
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(F.col("n_a") > 0, ratio(F.col("conv_a").cast("double"), na, 4)).alias("rate_a"),
        F.when(F.col("n_b") > 0, ratio(F.col("conv_b").cast("double"), nb, 4)).alias("rate_b"),
        F.when(z_ok, F.floor(z * 1000000.0 + 0.5) / 1000000.0).alias("z_score"),
    ).orderBy("experiment_id")


def experiment_conversion_ztest_sql() -> str:
    from ..functions.money import ratio_sql

    from .memberships import memberships_2024_sql

    d = ZTEST_CONVERSION_DAYS
    return f"""
WITH entries AS ({experiment_entries_sql()}),
m AS ({memberships_2024_sql()}),
first_m AS (
  SELECT owner_id, min(start_date) AS m_start FROM m GROUP BY owner_id
),
joined AS (
  SELECT e.experiment_id, e.ab_group,
         (f.m_start IS NOT NULL AND f.m_start >= e.entry_date
          AND f.m_start <= e.entry_date + {d})::bigint AS converted
  FROM entries e LEFT JOIN first_m f ON e.customer_id = f.owner_id
),
agg AS (
  SELECT experiment_id,
         CAST(sum((ab_group = 'A')::bigint) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN ab_group = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum((ab_group = 'B')::bigint) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN ab_group = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM joined GROUP BY experiment_id
)
SELECT experiment_id, n_a, conv_a, n_b, conv_b,
       CASE WHEN n_a > 0 THEN {ratio_sql('conv_a::double', 'n_a::double', 4)} END AS rate_a,
       CASE WHEN n_b > 0 THEN {ratio_sql('conv_b::double', 'n_b::double', 4)} END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                 AND conv_a + conv_b < n_a + n_b
            THEN floor((conv_a / n_a::double - conv_b / n_b::double)
                 / sqrt(((conv_a + conv_b) / (n_a::double + n_b::double))
                        * (1.0 - (conv_a + conv_b) / (n_a::double + n_b::double))
                        * (1.0 / n_a::double + 1.0 / n_b::double))
                 * 1000000.0 + 0.5) / 1000000.0 END AS z_score
FROM agg
ORDER BY experiment_id
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap: confidence intervals in ONE pass, no resample shuffle
# ---------------------------------------------------------------------------

# A classical bootstrap resamples N rows B times — unrunnable at 100 TB.
# The Poisson bootstrap replaces each replicate's resample with an
# independent Poisson(1) WEIGHT per (row, replicate): one map-side fan-out
# of B weighted copies, B partial-aggregating sums, no data shuffle beyond
# a B-key aggregate.  Weights come from the engine's md5-uniform
# discipline, so both engines draw the SAME replicate weights and the CI
# is bit-reproducible.  The Poisson(1) inverse-CDF thresholds are
# precomputed in Python (micro units) — exp() never runs in either engine.
import math as _math

B_REPLICATES = 40
# cumulative P(X <= k) for X ~ Poisson(1), k = 0..5; weights cap at 6
POISSON1_CDF_MICRO: tuple[int, ...] = tuple(
    int(_math.floor(sum(_math.exp(-1.0) / _math.factorial(j) for j in range(k + 1)) * 1_000_000 + 0.5))
    for k in range(6)
)
CI_LO_RANK = 1   # 2.5th percentile of 40 sorted replicate means
CI_HI_RANK = 39  # 97.5th percentile


def _poisson1_weight(u_micro: F.Column) -> F.Column:
    w = F.when(u_micro < POISSON1_CDF_MICRO[0], 0)
    for k in range(1, 6):
        w = w.when(u_micro < POISSON1_CDF_MICRO[k], k)
    return w.otherwise(6)


def _poisson1_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(POISSON1_CDF_MICRO)
    )
    return f"CASE {branches} ELSE 6 END"


def bootstrap_spend_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean per-customer net spend, via the Poisson
    bootstrap — the estimator a 100-TB pipeline can actually afford: the
    per-customer rollup is scanned ONCE, fanned out map-side into
    ``B_REPLICATES`` weighted copies (md5-deterministic Poisson(1)
    weights), and each replicate mean is a pair of exact integer sums
    over a B-key aggregate.  The CI is the 2.5th/97.5th percentile of the
    sorted replicate means (deterministic rank picks, ties broken by
    replicate id).

    Output: one row — population size, point mean, B, and the CI bounds,
    all fixed-point cents.  Exactness: weighted sums are exact int64
    (weight ≤ 6 × cents; DECIMAL(38) is the 1e12-customer upgrade), the
    single division per replicate is the shared fixed-point ratio."""
    from ..functions.money import ratio, to_cents
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    spend = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    reps = spend.select(
        "customer_id",
        "cents",
        F.explode(F.array(*[F.lit(b) for b in range(B_REPLICATES)])).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("customer_id"), F.col("b"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    weighted = reps.withColumn("w", _poisson1_weight(u))
    per_rep = weighted.groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).alias("sw_cents"),
        F.sum("w").alias("sw"),
    )
    rep_means = per_rep.select(
        "b",
        F.when(F.col("sw") > 0, ratio(F.col("sw_cents"), F.col("sw"), 2)).alias(
            "rep_mean_cents"
        ),
    )
    # Drop zero-mass replicates (rep_mean_cents NULL) BEFORE ranking: they
    # carry no information, and Spark sorts NULLs first in ASC while DuckDB
    # sorts them last — pinning the filter keeps the rank picks identical
    # cross-engine on corpora where sw = 0 is reachable.
    w_rank = Window.orderBy("rep_mean_cents", "b")
    ranked = rep_means.where(F.col("rep_mean_cents").isNotNull()).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rk") == CI_LO_RANK, F.col("rep_mean_cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rk") == CI_HI_RANK, F.col("rep_mean_cents"))).alias(
            "ci_hi_cents"
        ),
    )
    point = spend.agg(
        F.count("*").alias("n_customers"),
        ratio(F.sum("cents"), F.count("*"), 2).alias("mean_cents"),
    )
    # two 1-row aggregates — the bounded driver-side crossJoin pattern
    return point.crossJoin(ci).select(
        "n_customers",
        F.lit(B_REPLICATES).alias("b_replicates"),
        "mean_cents",
        "ci_lo_cents",
        "ci_hi_cents",
    )


def bootstrap_spend_ci_sql() -> str:
    from ..functions.money import ratio_sql, to_cents_sql
    from .transactions import transactions_sql

    u = (
        "('0x' || substr(md5(customer_id::varchar || ':' || b::varchar), 1, 8))::bigint"
        " % 1000000"
    )
    return f"""
WITH txn AS ({transactions_sql()}),
spend AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
reps AS (
  SELECT customer_id, cents, r.b
  FROM spend CROSS JOIN (SELECT unnest(range({B_REPLICATES})) AS b) r
),
weighted AS (
  SELECT b, cents, {_poisson1_weight_sql(u)} AS w FROM reps
),
per_rep AS (
  SELECT b, sum(w * cents) AS sw_cents, sum(w) AS sw
  FROM weighted GROUP BY b
),
rep_means AS (
  SELECT b, CASE WHEN sw > 0 THEN {ratio_sql('sw_cents', 'sw', 2)} END AS rep_mean_cents
  FROM per_rep
),
ranked AS (
  -- zero-mass replicates dropped before ranking (mirrors the Spark side;
  -- Spark and DuckDB disagree on NULL sort position)
  SELECT rep_mean_cents,
         row_number() OVER (ORDER BY rep_mean_cents, b) AS rk
  FROM rep_means
  WHERE rep_mean_cents IS NOT NULL
),
ci AS (
  SELECT max(CASE WHEN rk = {CI_LO_RANK} THEN rep_mean_cents END) AS ci_lo_cents,
         max(CASE WHEN rk = {CI_HI_RANK} THEN rep_mean_cents END) AS ci_hi_cents
  FROM ranked
),
point AS (
  SELECT count(*) AS n_customers,
         {ratio_sql('sum(cents)', 'count(*)', 2)} AS mean_cents
  FROM spend
)
SELECT n_customers, {B_REPLICATES} AS b_replicates, mean_cents,
       ci_lo_cents, ci_hi_cents
FROM point CROSS JOIN ci
"""


# ---------------------------------------------------------------------------
# Weight-of-Evidence / Information-Value feature screening
# ---------------------------------------------------------------------------

WOE_LABEL_CATEGORY = "New Membership"   # converted = bought a membership


def woe_iv_by_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value per categorical
    feature — the standard feature-screening table (credit-scoring
    lineage) a pipeline computes before trusting a categorical column in
    a model mixture: WOE_c = ln((pos_c/pos)/(neg_c/neg)) per category,
    IV = Σ (pos_c/pos − neg_c/neg)·WOE_c per feature (rule of thumb:
    <0.02 useless, >0.3 strong).  Label: the customer converted (has a
    WOE_LABEL_CATEGORY transaction); features: segment and nation,
    long-formatted so ONE aggregation covers any feature list.

    Laplace (+1) smoothing keeps empty cells finite, mirroring
    spend_drift_psi's share discipline; each WOE and IV term is
    nano-rounded from exact integer counts, so the per-feature IV sum is
    summation-order immune.

    Scale shape: one semi-join-shaped label rollup on customer_id, one
    groupBy onto (feature, category, label) — bounded by the category
    vocabulary — then window math over that tiny frame."""
    from pyspark.sql import Window

    from .customers import build_customers
    from .transactions import build_transactions

    cust = build_customers(spark, sf_dir).select("customer_id", "segment", "nation")
    txn = build_transactions(spark, sf_dir)
    converted = (
        txn.where(F.col("revenue_category") == WOE_LABEL_CATEGORY)
        .select("customer_id")
        .distinct()
        .withColumn("pos", F.lit(1))
    )
    labeled = cust.join(converted, "customer_id", "left").select(
        "segment", "nation", F.coalesce(F.col("pos"), F.lit(0)).alias("pos")
    )
    longf = labeled.select(
        F.expr("stack(2, 'segment', segment, 'nation', nation) as (feature, category)"),
        "pos",
    )
    counts = longf.groupBy("feature", "category").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(1 - F.col("pos")).alias("n_neg"),
    )
    wf = Window.partitionBy("feature")
    enriched = counts.select(
        "feature",
        "category",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(wf).alias("pos_tot"),
        F.sum("n_neg").over(wf).alias("neg_tot"),
        F.count("*").over(wf).alias("n_cats"),
    )
    p = (F.col("n_pos") + 1).cast("double") / (F.col("pos_tot") + F.col("n_cats"))
    q = (F.col("n_neg") + 1).cast("double") / (F.col("neg_tot") + F.col("n_cats"))
    woe_nano = F.floor(F.log(p / q) * 1000000000.0 + 0.5).cast("long")
    iv_nano = F.floor((p - q) * F.log(p / q) * 1000000000.0 + 0.5).cast("long")
    scored = enriched.select(
        "feature", "category", "n_pos", "n_neg",
        woe_nano.alias("woe_nano"), iv_nano.alias("iv_nano"),
    )
    wiv = Window.partitionBy("feature")
    return scored.select(
        "feature",
        "category",
        "n_pos",
        "n_neg",
        (F.col("woe_nano") / 1000000000.0).alias("woe"),
        (F.sum("iv_nano").over(wiv) / 1000000000.0).alias("feature_iv"),
    ).orderBy("feature", "category")


def woe_iv_by_feature_sql() -> str:
    from .customers import customers_sql
    from .transactions import transactions_sql

    return f"""
WITH cust AS ({customers_sql()}),
txn AS ({transactions_sql()}),
converted AS (
  SELECT DISTINCT customer_id FROM txn
  WHERE revenue_category = '{WOE_LABEL_CATEGORY}'
),
labeled AS (
  SELECT c.segment, c.nation,
         CASE WHEN v.customer_id IS NULL THEN 0 ELSE 1 END AS pos
  FROM cust c LEFT JOIN converted v USING (customer_id)
),
longf AS (
  SELECT 'segment' AS feature, segment AS category, pos FROM labeled
  UNION ALL
  SELECT 'nation', nation, pos FROM labeled
),
counts AS (
  SELECT feature, category, sum(pos) AS n_pos, sum(1 - pos) AS n_neg
  FROM longf GROUP BY 1, 2
),
enriched AS (
  SELECT feature, category, n_pos, n_neg,
         sum(n_pos) OVER (PARTITION BY feature) AS pos_tot,
         sum(n_neg) OVER (PARTITION BY feature) AS neg_tot,
         count(*) OVER (PARTITION BY feature) AS n_cats
  FROM counts
),
scored AS (
  SELECT feature, category, n_pos, n_neg,
         CAST(floor(ln(((n_pos + 1)::double / (pos_tot + n_cats))
                       / ((n_neg + 1)::double / (neg_tot + n_cats)))
                    * 1000000000.0 + 0.5) AS BIGINT) AS woe_nano,
         CAST(floor(((n_pos + 1)::double / (pos_tot + n_cats)
                     - (n_neg + 1)::double / (neg_tot + n_cats))
                    * ln(((n_pos + 1)::double / (pos_tot + n_cats))
                         / ((n_neg + 1)::double / (neg_tot + n_cats)))
                    * 1000000000.0 + 0.5) AS BIGINT) AS iv_nano
  FROM enriched
)
SELECT feature, category,
       CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       woe_nano / 1000000000.0 AS woe,
       sum(iv_nano) OVER (PARTITION BY feature) / 1000000000.0 AS feature_iv
FROM scored
ORDER BY feature, category
"""


# ---------------------------------------------------------------------------
# CUPED variance reduction for the A/B readout
# ---------------------------------------------------------------------------

# Calendar split inside the transaction range: spend before the split is the
# pre-experiment covariate X, spend on/after it is the experiment metric Y.
# The flag-entry experiment's 2024 entry dates sit entirely AFTER the last
# transaction (2001) on the driver corpus, so an entry-anchored post window
# is structurally empty there — every moment degenerates to zero and the
# readout hash-matches NULL-for-NULL (the EB-gate failure class, caught by
# the round-8 degenerate-output audit).  The calendar split exercises the
# identical estimator on real variance.
CUPED_SPLIT_DATE = "1998-07-01"


def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout over the transacting population:
    each customer's pre-split spend is the control covariate, the A/B
    arms come from the repo's deterministic md5 assignment
    (:func:`sampling._md5_bucket` — the same discipline the flags engine
    uses), θ = cov(X,Y)/var(X) pooled across groups, and the output is
    per group the raw vs adjusted metric variance and the variance-
    reduction percentage — the standard trick that makes the same
    experiment decide in a fraction of the traffic.  The reference's
    experiment log stops at counts; this is the readout a modern
    experimentation stack actually ships.

    Exactness: EVERYTHING derives from the exact integer moment set
    {n, ΣX, ΣY, ΣXY, ΣX², ΣY²} per group (decimal(38) sums of cents
    products).  var(Y_adj) is expanded ALGEBRAICALLY as
    var(Y) − 2θ·cov(X,Y) + θ²·var(X) — never a per-row adjusted-value
    sum, whose float accumulation order would differ across partitions.
    Degenerate var(X) = 0 pins θ and the adjusted columns to NULL on
    both engines.

    Scale shape: one customer-keyed conditional rollup (pre/post spend),
    then ONE moment aggregation per group; the θ combine runs over the
    2-row group frame."""
    from pyspark.sql import Window

    from ..functions.money import to_cents
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir).select(
        "customer_id", "txn_date", to_cents(F.col("total_amount")).alias("cents")
    )
    split = F.lit(CUPED_SPLIT_DATE).cast("date")
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(F.when(F.col("txn_date") < split, F.col("cents")).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("txn_date") >= split, F.col("cents")).otherwise(0)).alias("y"),
    ).select(
        F.when(_md5_bucket(F.col("customer_id"), 2) == 0, "A")
        .otherwise("B")
        .alias("ab_group"),
        "x",
        "y",
    )
    mom = per_cust.groupBy("ab_group").agg(
        F.count("*").alias("n"),
        F.sum(dec38(F.col("x"))).alias("sx"),
        F.sum(dec38(F.col("y"))).alias("sy"),
        F.sum(dec38(F.col("x")) * dec38(F.col("y"))).alias("sxy"),
        F.sum(dec38(F.col("x")) * dec38(F.col("x"))).alias("sxx"),
        F.sum(dec38(F.col("y")) * dec38(F.col("y"))).alias("syy"),
    )
    wall = Window.partitionBy()
    pooled = mom.select(
        "*",
        F.sum("n").over(wall).alias("pn"),
        F.sum("sx").over(wall).alias("psx"),
        F.sum("sy").over(wall).alias("psy"),
        F.sum("sxy").over(wall).alias("psxy"),
        F.sum("sxx").over(wall).alias("psxx"),
    )
    # pooled θ = (nΣXY − ΣXΣY) / (nΣX² − (ΣX)²), exact decimal numerators
    th_num = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    th_den = F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    theta = F.when(th_den != 0, th_num.cast("double") / th_den.cast("double"))
    nd = F.col("n").cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double") / (
        nd * nd
    )
    cov_xy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        nd * nd
    )
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / (
        nd * nd
    )
    var_adj = var_y - 2.0 * theta * cov_xy + theta * theta * var_x
    # Overflow-guarded micro rounding (adversarial edge-value amounts push
    # var to ~1e17 dollars², past int64 when scaled by 1e6) — now the
    # shared primitive in functions/money.py, property-tested at extremes.
    from ..functions.money import micro
    return pooled.select(
        "ab_group",
        "n",
        micro(F.col("sy").cast("double") / nd / 100.0).alias("mean_post_spend"),
        micro(theta).alias("theta"),
        micro(var_y / 10000.0).alias("var_raw"),
        micro(var_adj / 10000.0).alias("var_cuped"),
        micro(
            F.when(var_y > 0, (var_y - var_adj) / var_y * 100.0)
        ).alias("var_reduction_pct"),
    ).orderBy("ab_group")


def _micro_safe_sql(expr: str) -> str:
    """Oracle mirror of the overflow-guarded micro rounding above (now
    delegating to the shared primitive in functions/money.py)."""
    from ..functions.money import micro_sql

    return micro_sql(expr)


def cuped_variance_reduction_sql() -> str:
    from ..functions.money import to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    _cuped_bucket_sql = _md5_bucket_sql("customer_id", 2)
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT CASE WHEN {_cuped_bucket_sql} = 0 THEN 'A' ELSE 'B' END AS ab_group,
         sum(CASE WHEN txn_date < DATE '{CUPED_SPLIT_DATE}'
                  THEN {to_cents_sql('total_amount')} ELSE 0 END) AS x,
         sum(CASE WHEN txn_date >= DATE '{CUPED_SPLIT_DATE}'
                  THEN {to_cents_sql('total_amount')} ELSE 0 END) AS y
  FROM txn
  GROUP BY customer_id
),
mom AS (
  SELECT ab_group, count(*) AS n,
         sum(x::hugeint) AS sx, sum(y::hugeint) AS sy,
         sum(x::hugeint * y::hugeint) AS sxy,
         sum(x::hugeint * x::hugeint) AS sxx,
         sum(y::hugeint * y::hugeint) AS syy
  FROM per_cust GROUP BY ab_group
),
pooled AS (
  SELECT *,
         sum(n) OVER () AS pn, sum(sx) OVER () AS psx, sum(sy) OVER () AS psy,
         sum(sxy) OVER () AS psxy, sum(sxx) OVER () AS psxx
  FROM mom
),
calc AS (
  SELECT ab_group, n,
         sy::double / n::double / 100.0 AS mean_post,
         CASE WHEN (pn * psxx - psx * psx) != 0
              THEN (pn * psxy - psx * psy)::double
                   / (pn * psxx - psx * psx)::double END AS theta,
         (n * syy - sy * sy)::double / (n::double * n::double) AS var_y,
         (n * sxy - sx * sy)::double / (n::double * n::double) AS cov_xy,
         (n * sxx - sx * sx)::double / (n::double * n::double) AS var_x
  FROM pooled
)
SELECT ab_group, n,
       {_micro_safe_sql('mean_post')} AS mean_post_spend,
       {_micro_safe_sql('theta')} AS theta,
       {_micro_safe_sql('var_y / 10000.0')} AS var_raw,
       {_micro_safe_sql('(var_y - 2.0 * theta * cov_xy + theta * theta * var_x) / 10000.0')} AS var_cuped,
       {_micro_safe_sql('''CASE WHEN var_y > 0
                  THEN (var_y - (var_y - 2.0 * theta * cov_xy
                                 + theta * theta * var_x)) / var_y * 100.0
             END''')} AS var_reduction_pct
FROM calc
ORDER BY ab_group
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U — the rank-based A/B companion to the z-test and CUPED
# ---------------------------------------------------------------------------


def mann_whitney_spend_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U over per-customer net spend between the md5 A/B
    arms (the same experiment frame as :func:`cuped_variance_reduction`):
    the distribution-free test a spend metric actually needs — cents are
    heavy-tailed, so the t/z on means is dominated by whales while U asks
    "does one arm stochastically spend more".  Reports the exact U (in
    2× integer units — average tie ranks are half-integers), the
    tie-corrected normal z, and the rank-biserial effect size.

    Distributed ranking discipline: NO global row sort.  Values collapse
    to a per-distinct-value count frame; each value's global rank offset
    decomposes as bucket offset (cumulative over the ~320-row monotone
    log-bucket table) + within-bucket offset (window PARTITIONED by
    bucket) — the ``theilsen_trend_bucketed`` trick generalized from one
    rank pick to full prefix sums.  2R_A = Σ_v nA_v·(2·before_v + cnt_v
    + 1) is then a plain map-side sum; everything stays exact int64
    until the single z division.

    Tie correction: σ²_U = nA·nB/12 · ((n+1) − Σ(t³−t)/(n(n−1)));
    degenerate cases (an empty arm, all values tied) pin z to NULL on
    both engines."""
    from ..functions.money import ratio, to_cents
    from .sampling import _md5_bucket
    from .sketches import bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    arms = per_cust.select(
        F.col("cents"),
        (_md5_bucket(F.col("customer_id"), 2) == 0).cast("long").alias("is_a"),
    )
    per_val = arms.groupBy("cents").agg(
        F.count("*").alias("cnt"), F.sum("is_a").alias("n_a_v")
    )
    ranked = bucketed_prefix_rank(per_val, "cents")
    # Cast EACH FACTOR to decimal BEFORE multiplying: computing
    # n_a_v*(2*before+cnt+1) or cnt^3 in LONG first wraps silently once a
    # tie block exceeds ~2.1M rows (cnt^3 > 2^63), while the DuckDB oracle
    # promotes to HUGEINT — the exact cross-engine divergence class the
    # round-8 ADVICE flagged (same fix shape as ks_spend_test's cross
    # product and holt_linear_daily_revenue's per-tap products).
    dcnt = dec38(F.col("cnt"))
    m = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum("n_a_v").alias("n_a"),
        F.sum(
            dec38(F.col("n_a_v"))
            * (2 * dec38(F.col("before")) + dcnt + 1)
        ).alias("r2_a"),
        F.sum(dcnt * dcnt * dcnt - dcnt).alias("ties"),
    )
    n, na = F.col("n"), F.col("n_a")
    nb = n - na
    # Same overflow discipline downstream: na*(na+1), na*nb, n*(n-1) and
    # especially n*(n²−1) — which wraps LONG at just n ≈ 2.1M rows — go
    # through decimal before the double cast (exact product, one rounding,
    # matching the oracle's HUGEINT→double path).
    dn, dna, dnb = dec38(n), dec38(na), dec38(nb)
    u2 = F.col("r2_a").cast("double") - (dna * (dna + 1)).cast("double")
    mu2 = (dna * dnb).cast("double")  # 2·μ_U
    var_u = (
        (dna * dnb).cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("ties").cast("double") / (dn * (dn - 1)).cast("double")
        )
    )
    z = (u2 - mu2) / (2.0 * F.sqrt(var_u))
    ok = (
        (na > 0)
        & (nb > 0)
        & (F.col("ties").cast("double") < (dn * (dn * dn - 1)).cast("double"))
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return m.select(
        n.alias("n"),
        na.alias("n_a"),
        nb.alias("n_b"),
        (u2 / 2.0).alias("u_a"),
        F.when(ok, micro(z)).alias("z_score"),
        F.when(
            (na > 0) & (nb > 0), ratio(u2 - mu2, mu2, 4)
        ).alias("rank_biserial"),
    )


def mann_whitney_spend_utest_sql() -> str:
    from ..functions.money import ratio_sql, to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
arms AS (
  SELECT cents, ({_md5_bucket_sql('customer_id', 2)} = 0)::bigint AS is_a
  FROM per_cust
),
per_val AS (
  SELECT cents, count(*) AS cnt, sum(is_a) AS n_a_v
  FROM arms GROUP BY cents
),
ranked AS (
  SELECT cents, cnt, n_a_v,
         coalesce(sum(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_val
),
m AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(n_a_v) AS BIGINT) AS n_a,
         sum((n_a_v * (2 * before + cnt + 1))::hugeint) AS r2_a,
         sum((cnt * cnt * cnt - cnt)::hugeint) AS ties
  FROM ranked
)
SELECT n, n_a, (n - n_a) AS n_b,
       (r2_a::double - (n_a * (n_a + 1))::double) / 2.0 AS u_a,
       CASE WHEN n_a > 0 AND n - n_a > 0
                 AND ties::double < (n::hugeint * (n::hugeint * n - 1))::double
            THEN floor((r2_a::double - (n_a * (n_a + 1))::double
                        - (n_a * (n - n_a))::double)
                 / (2.0 * sqrt((n_a * (n - n_a))::double / 12.0
                    * ((n + 1)::double
                       - ties::double / (n::hugeint * (n - 1))::double)))
                 * 1000000.0 + 0.5) / 1000000.0 END AS z_score,
       CASE WHEN n_a > 0 AND n - n_a > 0
            THEN {ratio_sql("r2_a::double - (n_a * (n_a + 1))::double - (n_a * (n - n_a))::double", "(n_a * (n - n_a))::double", 4)}
       END AS rank_biserial
FROM m
"""


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over the per-category test family
# ---------------------------------------------------------------------------

# Two-sided normal p-values on a quantized |z| grid (step 0.01, cap 5.00).
# Both engines read the SAME literals (generated once here), so the
# quantization is part of the operator's contract, not an approximation
# one engine makes and the other doesn't: p = erfc(|z|/sqrt(2)), micro-
# rounded.  No engine evaluates erf — neither Spark SQL nor DuckDB has it.
P_GRID_STEP = 0.01
P_GRID_MAX_IDX = 500
P_TWO_SIDED_MICRO: tuple[int, ...] = tuple(
    int(_math.floor(_math.erfc((k * P_GRID_STEP) / _math.sqrt(2.0)) * 1_000_000 + 0.5))
    for k in range(P_GRID_MAX_IDX + 1)
)
BH_ALPHA_PCT = 10  # target FDR


def bh_fdr_category_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-category refund-rate
    test family: each revenue category is one hypothesis (two-proportion
    z-test of refund share between the md5 A/B arms — under the null
    assignment is independent of refunds, so this doubles as an A/A
    sanity family), p-values come from the shared quantized normal grid,
    and BH's step-up rule marks which hypotheses survive at FDR
    ``BH_ALPHA_PCT``% — the multiple-testing discipline a dashboard of
    seven simultaneous "is this category different" tests needs before
    anyone acts on one red cell.

    Step-up without a second pass: hypothesis i (p ascending) is
    rejected iff ANY j >= i has p_j <= j/m·α — i.e. iff the RUNNING MAX
    from the top of (p_j <= threshold_j) seen at or after i is true; one
    window over the m-row frame.

    Scale shape: everything after the one conditional aggregation to
    (category × 4 counts) runs on the ~7-row hypothesis frame."""
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    arms = txn.select(
        "revenue_category",
        (_md5_bucket(F.col("customer_id"), 2) == 0).alias("arm_a"),
        F.col("is_refund").cast("long").alias("ref"),
    )
    agg = arms.groupBy("revenue_category").agg(
        F.sum(F.col("arm_a").cast("long")).alias("n_a"),
        F.sum(F.when(F.col("arm_a"), F.col("ref")).otherwise(0)).alias("ref_a"),
        F.sum((~F.col("arm_a")).cast("long")).alias("n_b"),
        F.sum(F.when(~F.col("arm_a"), F.col("ref")).otherwise(0)).alias("ref_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pool = (F.col("ref_a") + F.col("ref_b")) / (na + nb)
    z = (F.col("ref_a") / na - F.col("ref_b") / nb) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
    )
    z_ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("ref_a") + F.col("ref_b") > 0)
        & (F.col("ref_a") + F.col("ref_b") < F.col("n_a") + F.col("n_b"))
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    p_arr = F.array(*[F.lit(p / 1_000_000.0) for p in P_TWO_SIDED_MICRO])
    zq = F.least(
        F.floor(F.abs(F.col("z_score")) * 100.0).cast("int"),
        F.lit(P_GRID_MAX_IDX),
    )
    scored = agg.select(
        "revenue_category",
        "n_a",
        "ref_a",
        "n_b",
        "ref_b",
        F.when(z_ok, micro(z)).alias("z_score"),
    ).withColumn(
        "p_value",
        F.when(F.col("z_score").isNotNull(), F.element_at(p_arr, zq + 1)),
    )
    # NULL-z hypotheses are untestable — excluded from the family BEFORE
    # ranking (Spark and DuckDB disagree on NULL sort position)
    tested = scored.filter(F.col("p_value").isNotNull())
    wr = Window.orderBy("p_value", "revenue_category")
    m_tot = Window.partitionBy()
    ranked = tested.select(
        "*",
        F.row_number().over(wr).alias("p_rank"),
        F.count("*").over(m_tot).alias("m"),
    )
    thresh = (
        F.col("p_rank").cast("double")
        / F.col("m").cast("double")
        * (BH_ALPHA_PCT / 100.0)
    )
    stepped = ranked.withColumn("bh_threshold", micro(thresh)).withColumn(
        "passes", F.col("p_value") <= F.col("bh_threshold")
    )
    # running ANY from the largest p down = step-up
    wdown = (
        Window.orderBy(F.col("p_rank").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        stepped.withColumn(
            "rejected", F.max(F.col("passes").cast("long")).over(wdown) == 1
        )
        .select(
            "revenue_category",
            "n_a",
            "ref_a",
            "n_b",
            "ref_b",
            "z_score",
            "p_value",
            "p_rank",
            "bh_threshold",
            "rejected",
        )
        .orderBy("p_rank")
    )


def bh_fdr_category_tests_sql() -> str:
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    p_list = ", ".join(str(p / 1_000_000.0) for p in P_TWO_SIDED_MICRO)
    return f"""
WITH txn AS ({transactions_sql()}),
arms AS (
  SELECT revenue_category,
         ({_md5_bucket_sql('customer_id', 2)} = 0) AS arm_a,
         is_refund::bigint AS ref
  FROM txn
),
agg AS (
  SELECT revenue_category,
         CAST(sum(arm_a::bigint) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm_a THEN ref ELSE 0 END) AS BIGINT) AS ref_a,
         CAST(sum((NOT arm_a)::bigint) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN NOT arm_a THEN ref ELSE 0 END) AS BIGINT) AS ref_b
  FROM arms GROUP BY revenue_category
),
scored AS (
  SELECT revenue_category, n_a, ref_a, n_b, ref_b,
         CASE WHEN n_a > 0 AND n_b > 0 AND ref_a + ref_b > 0
                   AND ref_a + ref_b < n_a + n_b
              THEN floor((ref_a / n_a::double - ref_b / n_b::double)
                   / sqrt(((ref_a + ref_b) / (n_a::double + n_b::double))
                          * (1.0 - (ref_a + ref_b) / (n_a::double + n_b::double))
                          * (1.0 / n_a::double + 1.0 / n_b::double))
                   * 1000000.0 + 0.5) / 1000000.0 END AS z_score
  FROM agg
),
withp AS (
  SELECT *,
         CASE WHEN z_score IS NOT NULL
              THEN list_extract([{p_list}]::double[],
                     least(floor(abs(z_score) * 100.0)::int, {P_GRID_MAX_IDX}) + 1)
         END AS p_value
  FROM scored
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value, revenue_category) AS p_rank,
         count(*) OVER () AS m
  FROM withp WHERE p_value IS NOT NULL
),
stepped AS (
  SELECT *,
         floor(p_rank::double / m::double * {BH_ALPHA_PCT / 100.0}
               * 1000000.0 + 0.5) / 1000000.0 AS bh_threshold
  FROM ranked
)
SELECT revenue_category, n_a, ref_a, n_b, ref_b, z_score, p_value, p_rank,
       bh_threshold,
       max((p_value <= bh_threshold)::bigint)
         OVER (ORDER BY p_rank DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS rejected
FROM stepped
ORDER BY p_rank
"""


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov over the spend arms
# ---------------------------------------------------------------------------

# Kolmogorov critical values c(alpha): reject when
# D > c(alpha) * sqrt((nA+nB)/(nA*nB)).  Shared micro literals.
KS_CRIT_MICRO = {"0.05": 1_358_100, "0.01": 1_627_600}  # c = 1.3581, 1.6276


def ks_spend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over per-customer spend between the
    md5 A/B arms: D = max_v |F_A(v) − F_B(v)| — the whole-distribution
    companion to :func:`mann_whitney_spend_utest` (U detects location
    shift; KS catches ANY distributional difference, the check a
    randomization/SRM audit wants).  The decision columns compare D to
    the Kolmogorov critical values at 5%/1% (sqrt is correctly rounded,
    so the thresholds are bit-identical cross-engine — no engine ever
    evaluates the Kolmogorov series).

    Exact D with no global sort: per-distinct-value cumulative arm
    counts ride the bucketed-prefix rank discipline; at each value,
    |F_A − F_B| = |cumA·nB − cumB·nA| / (nA·nB) is compared as the exact
    INTEGER cross product — the max then divides once.

    Scale shape: one customer rollup, one shuffle onto distinct values,
    bounded-bucket windows, one scalar max."""
    from ..functions.money import to_cents
    from .sampling import _md5_bucket
    from .sketches import bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    arms = per_cust.select(
        "cents",
        (_md5_bucket(F.col("customer_id"), 2) == 0).cast("long").alias("is_a"),
    )
    per_val = arms.groupBy("cents").agg(
        F.count("*").alias("cnt"), F.sum("is_a").alias("a_v")
    )
    # inclusive (≤) cumulatives for BOTH measures in one primitive pass
    cum = bucketed_prefix_rank(
        per_val, "cents", inclusive=True, sums={"cnt": "cum", "a_v": "cum_a"}
    ).select("cum", "cum_a")
    tot = arms.agg(
        F.count("*").alias("n"), F.sum("is_a").alias("n_a")
    )
    j = cum.join(F.broadcast(tot))
    cum_b = F.col("cum") - F.col("cum_a")
    nb = F.col("n") - F.col("n_a")
    cross = F.abs(
        dec38(F.col("cum_a")) * dec38(nb) - dec38(cum_b) * dec38(F.col("n_a"))
    )
    m = j.agg(
        F.max("n").alias("n"),
        F.max("n_a").alias("n_a"),
        F.max(cross).alias("max_cross"),
    )
    n, na = F.col("n"), F.col("n_a")
    nbb = n - na
    d = F.col("max_cross").cast("double") / (na * nbb).cast("double")
    scale = F.sqrt((n).cast("double") / (na * nbb).cast("double"))
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    ok = (na > 0) & (nbb > 0)
    return m.select(
        n.alias("n"),
        na.alias("n_a"),
        nbb.alias("n_b"),
        F.when(ok, micro(d)).alias("ks_d"),
        F.when(
            ok, d > KS_CRIT_MICRO["0.05"] / 1_000_000.0 * scale
        ).alias("reject_05"),
        F.when(
            ok, d > KS_CRIT_MICRO["0.01"] / 1_000_000.0 * scale
        ).alias("reject_01"),
    )


def ks_spend_test_sql() -> str:
    from ..functions.money import to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    c05 = KS_CRIT_MICRO["0.05"] / 1_000_000.0
    c01 = KS_CRIT_MICRO["0.01"] / 1_000_000.0
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
arms AS (
  SELECT cents, ({_md5_bucket_sql('customer_id', 2)} = 0)::bigint AS is_a
  FROM per_cust
),
per_val AS (
  SELECT cents, count(*) AS cnt, sum(is_a) AS a_v FROM arms GROUP BY cents
),
cum AS (
  SELECT sum(cnt) OVER w AS cum, sum(a_v) OVER w AS cum_a
  FROM per_val
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT count(*) AS n, CAST(sum(is_a) AS BIGINT) AS n_a FROM arms
),
m AS (
  SELECT max(n) AS n, max(n_a) AS n_a,
         max(abs(cum_a::hugeint * (n - n_a)::hugeint
                 - (cum - cum_a)::hugeint * n_a::hugeint)) AS max_cross
  FROM cum CROSS JOIN tot
)
SELECT n, n_a, (n - n_a) AS n_b,
       CASE WHEN n_a > 0 AND n - n_a > 0
            THEN floor(max_cross::double / (n_a * (n - n_a))::double
                       * 1000000.0 + 0.5) / 1000000.0 END AS ks_d,
       CASE WHEN n_a > 0 AND n - n_a > 0
            THEN max_cross::double / (n_a * (n - n_a))::double
                 > {c05!r} * sqrt(n::double / (n_a * (n - n_a))::double)
       END AS reject_05,
       CASE WHEN n_a > 0 AND n - n_a > 0
            THEN max_cross::double / (n_a * (n - n_a))::double
                 > {c01!r} * sqrt(n::double / (n_a * (n - n_a))::double)
       END AS reject_01
FROM m
"""


# ---------------------------------------------------------------------------
# power / minimum-detectable-effect table for the category test family
# ---------------------------------------------------------------------------

# standard-normal quantiles as shared micro literals (z_{0.975}, z_{0.80})
Z_ALPHA2_MICRO = 1_959_964
Z_POWER_MICRO = 841_621


def refund_test_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-design table for the per-category refund-rate family
    (:func:`bh_fdr_category_tests`'s hypotheses): at each category's
    CURRENT sample sizes and pooled refund rate, the minimum detectable
    absolute and relative effect at 80% power / 5% two-sided alpha —
    MDE = (z_{0.975}+z_{0.80})·√(p̂(1−p̂)(1/n_A+1/n_B)).  This is the
    question a team asks BEFORE reading the test ("could this category
    even show the shift we care about?"), and the number that explains a
    non-rejection: an MDE above the plausible effect size means the test
    was underpowered, not the effect absent.

    Determinism: counts are exact; the z quantiles are shared micro
    literals (no engine has the inverse normal CDF); the single sqrt is
    correctly rounded IEEE.  Degenerate pooled rates (0 or 1) pin the
    MDE to NULL on both engines.

    Scale shape: one conditional aggregation onto the bounded category
    frame; everything after is scalar arithmetic per category row."""
    from ..functions.money import ratio
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    arms = txn.select(
        "revenue_category",
        (_md5_bucket(F.col("customer_id"), 2) == 0).alias("arm_a"),
        F.col("is_refund").cast("long").alias("ref"),
    )
    agg = arms.groupBy("revenue_category").agg(
        F.sum(F.col("arm_a").cast("long")).alias("n_a"),
        F.sum((~F.col("arm_a")).cast("long")).alias("n_b"),
        F.sum("ref").alias("n_ref"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    p = F.col("n_ref").cast("double") / (na + nb)
    zsum = (Z_ALPHA2_MICRO + Z_POWER_MICRO) / 1_000_000.0
    mde = zsum * F.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("n_ref") > 0)
        & (F.col("n_ref") < F.col("n_a") + F.col("n_b"))
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "revenue_category",
        "n_a",
        "n_b",
        ratio(F.col("n_ref").cast("double"), na + nb, 6).alias("pooled_rate"),
        F.when(ok, micro(mde)).alias("mde_abs"),
        F.when(ok, micro(mde / p)).alias("mde_rel"),
    ).orderBy("revenue_category")


def refund_test_power_mde_sql() -> str:
    from ..functions.money import ratio_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    zsum = (Z_ALPHA2_MICRO + Z_POWER_MICRO) / 1_000_000.0
    return f"""
WITH txn AS ({transactions_sql()}),
arms AS (
  SELECT revenue_category,
         ({_md5_bucket_sql('customer_id', 2)} = 0) AS arm_a,
         is_refund::bigint AS ref
  FROM txn
),
agg AS (
  SELECT revenue_category,
         CAST(sum(arm_a::bigint) AS BIGINT) AS n_a,
         CAST(sum((NOT arm_a)::bigint) AS BIGINT) AS n_b,
         CAST(sum(ref) AS BIGINT) AS n_ref
  FROM arms GROUP BY revenue_category
)
SELECT revenue_category, n_a, n_b,
       {ratio_sql('n_ref::double', '(n_a + n_b)::double', 6)} AS pooled_rate,
       CASE WHEN n_a > 0 AND n_b > 0 AND n_ref > 0 AND n_ref < n_a + n_b
            THEN floor({zsum!r} * sqrt((n_ref::double / (n_a + n_b)::double)
                       * (1.0 - n_ref::double / (n_a + n_b)::double)
                       * (1.0 / n_a::double + 1.0 / n_b::double))
                 * 1000000.0 + 0.5) / 1000000.0 END AS mde_abs,
       CASE WHEN n_a > 0 AND n_b > 0 AND n_ref > 0 AND n_ref < n_a + n_b
            THEN floor({zsum!r} * sqrt((n_ref::double / (n_a + n_b)::double)
                       * (1.0 - n_ref::double / (n_a + n_b)::double)
                       * (1.0 / n_a::double + 1.0 / n_b::double))
                 / (n_ref::double / (n_a + n_b)::double)
                 * 1000000.0 + 0.5) / 1000000.0 END AS mde_rel
FROM agg
ORDER BY revenue_category
"""


def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does refund probability rise or fall
    MONOTONICALLY across the ordered o_orderpriority levels (1-URGENT …
    5-LOW)?  The ordered-categories sibling of
    :func:`quality.chisq_category_source` — χ² spends its power on any
    deviation; the CA statistic targets the one-degree-of-freedom linear
    trend an ops team actually acts on ("lower priority → more refunds").

    T = Σ wᵢ(rᵢ − nᵢR/N), Var(T) = (R/N)(1−R/N)(Σw²nᵢ − (Σwnᵢ)²/N),
    z = T/√Var, with scores w = the priority's leading digit.

    Determinism: every aggregate is an exact integer (scores ≤ 5, all
    products per-factor decimal); z is ONE double expression over those
    integers, micro-rounded; degenerate margins (no refunds, all refunds,
    or a single priority level ⇒ Var = 0) pin z to NULL on both engines.

    Scale shape: one groupBy onto the ≤ 5-row priority table; the test
    statistic is a 1-row fold of that frame."""
    from ..functions.money import ratio
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_orderpriority")
    )
    # recover the priority from the txn id's order half joined back to
    # orders (transaction_id = orderkey_linenum)
    withp = (
        txn.select(
            F.split(F.col("transaction_id"), "_").getItem(0).cast("long").alias("ok"),
            F.col("is_refund").cast("long").alias("ref"),
        )
        .join(orders.select(F.col("o_orderkey").alias("ok"), "o_orderpriority"), "ok")
        .select(
            F.substring(F.col("o_orderpriority"), 1, 1).cast("long").alias("w"),
            "ref",
            F.col("o_orderpriority").alias("priority"),
        )
    )
    per = withp.groupBy("priority", "w").agg(
        F.count("*").alias("n_i"), F.sum("ref").alias("r_i")
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    enriched = per.select(
        "*",
        F.sum("n_i").over(tot).alias("n"),
        F.sum("r_i").over(tot).alias("r"),
        F.sum(dec38(F.col("w")) * dec38(F.col("n_i"))).over(tot).alias("swn"),
        F.sum(dec38(F.col("w")) * dec38(F.col("w")) * dec38(F.col("n_i"))).over(tot).alias("sw2n"),
        F.sum(dec38(F.col("w")) * dec38(F.col("r_i"))).over(tot).alias("swr"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    p = rd / nd
    t = F.col("swr").cast("double") - F.col("swn").cast("double") * p
    var = p * (1.0 - p) * (
        F.col("sw2n").cast("double")
        - F.col("swn").cast("double") * F.col("swn").cast("double") / nd
    )
    z = t / F.sqrt(var)
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return enriched.select(
        "priority",
        F.col("w").alias("score"),
        "n_i",
        "r_i",
        ratio(F.col("r_i").cast("double"), F.col("n_i").cast("double"), 6).alias(
            "refund_rate"
        ),
        F.when((F.col("r") > 0) & (F.col("r") < F.col("n")) & (var > 0), micro(z)).alias(
            "trend_z"
        ),
    ).orderBy("priority")


def cochran_armitage_trend_sql() -> str:
    from ..functions.money import ratio_sql
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
withp AS (
  SELECT substr(o.o_orderpriority, 1, 1)::bigint AS w,
         t.is_refund::bigint AS ref,
         o.o_orderpriority AS priority
  FROM txn t
  JOIN orders o ON split_part(t.transaction_id, '_', 1)::bigint = o.o_orderkey
),
per AS (
  SELECT priority, w, count(*) AS n_i, sum(ref) AS r_i
  FROM withp GROUP BY 1, 2
),
enriched AS (
  SELECT *,
         sum(n_i) OVER () AS n,
         sum(r_i) OVER () AS r,
         sum(w::hugeint * n_i::hugeint) OVER () AS swn,
         sum(w::hugeint * w::hugeint * n_i::hugeint) OVER () AS sw2n,
         sum(w::hugeint * r_i::hugeint) OVER () AS swr
  FROM per
)
SELECT priority, CAST(w AS BIGINT) AS score, CAST(n_i AS BIGINT) AS n_i,
       CAST(r_i AS BIGINT) AS r_i,
       {ratio_sql('r_i::double', 'n_i::double', 6)} AS refund_rate,
       CASE WHEN r > 0 AND r < n
             AND (r::double / n::double) * (1.0 - r::double / n::double)
                 * (sw2n::double - swn::double * swn::double / n::double) > 0
            THEN floor((swr::double - swn::double * (r::double / n::double))
                       / sqrt((r::double / n::double) * (1.0 - r::double / n::double)
                              * (sw2n::double - swn::double * swn::double / n::double))
                       * 1000000.0 + 0.5) / 1000000.0 END AS trend_z
FROM enriched
ORDER BY priority
"""


OBF_LOOKS = 4
OBF_C = 2.024  # O'Brien-Fleming constant for K=4 at overall two-sided α=0.05


def sequential_probe_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring of the refund-rate A/B test: the
    transaction timeline split into OBF_LOOKS interim looks by txn_date
    order, the cumulative two-proportion z (arm = the md5 customer
    bucket every refund-rate test in this family uses; outcome =
    is_refund) at each look, and the O'Brien-Fleming boundary C·√(K/k)
    it must cross — the peeking-safe sibling of
    :func:`refund_test_power_mde` (reading a fixed-horizon z weekly IS
    the alpha-inflation mistake; OBF boundaries are the standard fix,
    strict early and converging to ~the fixed bound at the final look).

    Determinism: looks are rank-quantiles of txn_date (count strictly
    earlier — date ties share a look in both engines); cumulative counts
    are exact integer window sums over the K-row frame; z and the
    boundary are single double expressions, micro-rounded; degenerate
    cumulative margins pin z to NULL.

    Scale shape: one groupBy onto the txn_date vocabulary for the look
    assignment, one onto (look, arm); cumulative windows run on K rows."""
    from pyspark.sql import Window

    from ..functions.money import micro
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir).select(
        "txn_date",
        (_md5_bucket(F.col("customer_id"), 2) == 0).alias("is_a"),
        F.col("is_refund").cast("long").alias("ref"),
    )
    per_date = txn.groupBy("txn_date").agg(F.count("*").alias("cnt"))
    looks = per_date.select(
        "txn_date",
        (
            F.least(
                F.lit(OBF_LOOKS - 1),
                F.expr(
                    f"({OBF_LOOKS} * coalesce(sum(cnt) over (order by txn_date "
                    f"rows between unbounded preceding and 1 preceding), 0)) "
                    f"div sum(cnt) over ()"
                ),
            )
            + 1
        ).alias("look"),
    )
    with_look = txn.join(looks, "txn_date")
    per_look = with_look.groupBy("look").agg(
        F.sum(F.col("is_a").cast("long")).alias("na"),
        F.sum(F.when(F.col("is_a"), F.col("ref")).otherwise(0)).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("nb"),
        F.sum(F.when(~F.col("is_a"), F.col("ref")).otherwise(0)).alias("cb"),
    )
    wcum = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_look.select(
        "look",
        F.sum("na").over(wcum).alias("n_a"),
        F.sum("ca").over(wcum).alias("conv_a"),
        F.sum("nb").over(wcum).alias("n_b"),
        F.sum("cb").over(wcum).alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (na + nb)
    z = (F.col("conv_a") / na - F.col("conv_b") / nb) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
    )
    boundary = F.lit(OBF_C) * F.sqrt(
        F.lit(float(OBF_LOOKS)) / F.col("look").cast("double")
    )
    z_ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    return cum.select(
        "look",
        "n_a",
        F.col("conv_a").alias("ref_a"),
        "n_b",
        F.col("conv_b").alias("ref_b"),
        F.when(z_ok, micro(z)).alias("z_cum"),
        micro(boundary).alias("obf_boundary"),
        F.when(z_ok, F.abs(z) > boundary).alias("crossed"),
    ).orderBy("look")


def sequential_probe_obf_sql() -> str:
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    k = OBF_LOOKS
    z = (
        "(conv_a / n_a::double - conv_b / n_b::double)"
        " / sqrt(((conv_a + conv_b) / (n_a::double + n_b::double))"
        " * (1.0 - (conv_a + conv_b) / (n_a::double + n_b::double))"
        " * (1.0 / n_a::double + 1.0 / n_b::double))"
    )
    zok = "n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b"
    return f"""
WITH txn0 AS ({transactions_sql()}),
txn AS (
  SELECT txn_date, ({_md5_bucket_sql('customer_id', 2)} = 0) AS is_a,
         is_refund::bigint AS ref
  FROM txn0
),
per_date AS (
  SELECT txn_date, count(*) AS cnt FROM txn GROUP BY 1
),
looks AS (
  SELECT txn_date,
         least({k - 1},
               ({k} * coalesce(sum(cnt) OVER (ORDER BY txn_date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               // (sum(cnt) OVER ())) + 1 AS look
  FROM per_date
),
per_look AS (
  SELECT l.look,
         sum(t.is_a::bigint) AS na,
         sum(CASE WHEN t.is_a THEN t.ref ELSE 0 END) AS ca,
         sum((NOT t.is_a)::bigint) AS nb,
         sum(CASE WHEN NOT t.is_a THEN t.ref ELSE 0 END) AS cb
  FROM txn t JOIN looks l USING (txn_date)
  GROUP BY 1
),
cum AS (
  SELECT look,
         sum(na) OVER w AS n_a, sum(ca) OVER w AS conv_a,
         sum(nb) OVER w AS n_b, sum(cb) OVER w AS conv_b
  FROM per_look
  WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(look AS BIGINT) AS look,
       CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS ref_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS ref_b,
       CASE WHEN {zok}
            THEN floor(({z}) * 1000000.0 + 0.5) / 1000000.0 END AS z_cum,
       floor({OBF_C} * sqrt({float(k)!r} / look::double) * 1000000.0 + 0.5)
         / 1000000.0 AS obf_boundary,
       CASE WHEN {zok}
            THEN abs({z}) > {OBF_C} * sqrt({float(k)!r} / look::double)
       END AS crossed
FROM cum
ORDER BY look
"""


# ---------------------------------------------------------------------------
# one-way ANOVA + Kruskal-Wallis across customer market segments
# ---------------------------------------------------------------------------


def anova_spend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of per-customer net spend (cents) across the five
    customer market segments: F statistic and the eta-squared effect size
    — the "does segment explain spend" screening the parametric side of
    the family answers (its rank-based sibling is
    :func:`kruskal_wallis_spend`; the two-group member is the md5-arm
    z/U pair).  No p-value: the F tail needs the incomplete beta, which
    neither engine evaluates — eta² is the effect size that answers the
    question.

    Exactness: per-group moments accumulate EXACTLY — n_g as int64, spend
    sums S_g as int64 cents, squared moments Σy² and S_g² as
    decimal(38,0) (the visit_spend_correlation discipline) — so every
    per-group quantity is order-insensitive under any partitioning.  The
    only float work is one division per group term plus the final
    formula; the cross-group Σ S_g²/n_g runs as an ORDERED window
    cumulative sum over the bounded (≤5-row) segment frame, so both
    engines add the same doubles in the same sequence.  F and eta² are
    guarded-micro rounded.

    Scale shape: one groupBy per customer (map-side combined), one
    broadcast join onto the customer dimension for the segment, one
    groupBy onto the ≤5-row segment frame — the window runs over 5 rows.
    """
    from ..functions.money import micro, to_cents
    from .customers import build_customers
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("y")
    )
    seg = build_customers(spark, sf_dir).select("customer_id", "segment")
    vals = per_cust.join(F.broadcast(seg), "customer_id").select("segment", "y")
    g = vals.groupBy("segment").agg(
        F.count("*").alias("n_g"),
        F.sum("y").alias("s_g"),
        F.sum(dec38_prod(F.col("y"), F.col("y"))).alias("q_g"),
    )
    # per-group rational term S_g²/n_g: exact decimal square, ONE double div
    term = (dec38(F.col("s_g")) * dec38(F.col("s_g"))).cast("double") / F.col(
        "n_g"
    ).cast("double")
    w = Window.orderBy("segment").rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.partitionBy()
    cum = g.select(
        F.sum("n_g").over(wk).alias("n"),
        F.sum("s_g").over(wk).alias("s"),
        F.sum(dec38(F.col("q_g"))).over(wk).alias("q"),
        F.count("*").over(wk).alias("k"),
        F.sum(term).over(w).alias("cum_term"),
        F.row_number().over(Window.orderBy("segment")).alias("rn"),
    ).filter(F.col("rn") == F.col("k"))
    n, k = F.col("n").cast("double"), F.col("k")
    grand = dec38(F.col("s")) * dec38(F.col("s"))
    ssb = F.col("cum_term") - grand.cast("double") / n
    sst = F.col("q").cast("double") - grand.cast("double") / n
    ssw = sst - ssb
    dfb = (k - 1).cast("double")
    dfw = (F.col("n") - k).cast("double")
    ok = (k > 1) & (F.col("n") > k) & (ssw > 0.0)
    f_stat = (ssb / dfb) / (ssw / dfw)
    return cum.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        micro(ssb).alias("ss_between"),
        micro(ssw).alias("ss_within"),
        F.when(ok, micro(f_stat)).alias("f_stat"),
        F.when(sst > 0.0, micro(ssb / sst)).alias("eta_sq"),
    )


def anova_spend_by_segment_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .customers import customers_sql
    from .transactions import transactions_sql

    ssb = "(cum_term - (s::hugeint * s::hugeint)::double / n::double)"
    sst = "(q::double - (s::hugeint * s::hugeint)::double / n::double)"
    ssw = f"({sst} - {ssb})"
    f_stat = f"(({ssb} / (k - 1)::double) / ({ssw} / (n - k)::double))"
    return f"""
WITH txn AS ({transactions_sql()}),
cust AS ({customers_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS y
  FROM txn GROUP BY customer_id
),
vals AS (
  SELECT c.segment, p.y
  FROM per_cust p JOIN cust c USING (customer_id)
),
g AS (
  SELECT segment, count(*) AS n_g,
         CAST(sum(y) AS BIGINT) AS s_g,
         sum(y::hugeint * y::hugeint) AS q_g
  FROM vals GROUP BY segment
),
cum AS (
  SELECT sum(n_g) OVER () AS n,
         sum(s_g) OVER () AS s,
         sum(q_g) OVER () AS q,
         count(*) OVER () AS k,
         sum((s_g::hugeint * s_g::hugeint)::double / n_g::double)
           OVER (ORDER BY segment ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_term,
         row_number() OVER (ORDER BY segment) AS rn
  FROM g
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
       {micro_sql(ssb)} AS ss_between,
       {micro_sql(ssw)} AS ss_within,
       CASE WHEN k > 1 AND n > k AND {ssw} > 0.0
            THEN {micro_sql(f_stat)} END AS f_stat,
       CASE WHEN {sst} > 0.0 THEN {micro_sql(f'({ssb} / {sst})')} END AS eta_sq
FROM cum WHERE rn = k
"""


def kruskal_wallis_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H over per-customer net spend across the five
    market segments — the rank-based (distribution-free) sibling of
    :func:`anova_spend_by_segment`, and the k-group generalization of
    :func:`mann_whitney_spend_utest`: heavy-tailed spend makes the F on
    means whale-dominated, H asks whether ANY segment stochastically
    outspends.  Reports raw H, the tie-corrected H, and Kelley's ε²
    effect size (H − k + 1)/(n − k).

    Distributed ranking discipline: NO global row sort — values collapse
    to a per-distinct-value frame; rank offsets decompose as monotone
    log-bucket offsets + within-bucket prefix windows (the
    mann_whitney machinery verbatim).  2·R_g = Σ_v n_gv·(2·before_v +
    cnt_v + 1) stays exact in decimal; R_g²/n_g terms are one double
    division each, combined by an ORDERED window sum over the ≤5-row
    segment frame (the anova discipline), tie term Σ(t³−t) exact decimal.

    Scale shape: one per-customer collapse, one (value, segment) groupBy,
    the bounded bucket-offset build, one per-segment rollup — no stage
    carries more than the distinct-value frame."""
    from ..functions.money import micro, to_cents
    from .customers import build_customers
    from .sketches import bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    seg = build_customers(spark, sf_dir).select("customer_id", "segment")
    vals = per_cust.join(F.broadcast(seg), "customer_id").select("segment", "cents")
    per_vg = vals.groupBy("cents", "segment").agg(F.count("*").alias("n_gv"))
    per_val = per_vg.groupBy("cents").agg(F.sum("n_gv").alias("cnt"))
    ranked = bucketed_prefix_rank(per_val, "cents")
    dcnt = dec38(F.col("cnt"))
    joined = per_vg.join(ranked, "cents")
    per_g = joined.groupBy("segment").agg(
        F.sum("n_gv").alias("n_g"),
        F.sum(
            dec38(F.col("n_gv")) * (2 * dec38(F.col("before")) + dcnt + 1)
        ).alias("r2_g"),
    )
    ties_df = ranked.agg(
        F.sum(dcnt * dcnt * dcnt - dcnt).alias("ties"),
    )
    term = (dec38(F.col("r2_g")) * dec38(F.col("r2_g"))).cast("double") / (
        4.0 * F.col("n_g").cast("double")
    )
    w = Window.orderBy("segment").rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.partitionBy()
    cum = (
        per_g.select(
            F.sum("n_g").over(wk).alias("n"),
            F.count("*").over(wk).alias("k"),
            F.sum(term).over(w).alias("cum_term"),
            F.row_number().over(Window.orderBy("segment")).alias("rn"),
        )
        .filter(F.col("rn") == F.col("k"))
        .crossJoin(F.broadcast(ties_df))
    )
    n = F.col("n").cast("double")
    dn = dec38(F.col("n"))
    h = 12.0 / (n * (n + 1.0)) * F.col("cum_term") - 3.0 * (n + 1.0)
    c_tie = 1.0 - F.col("ties").cast("double") / (dn * dn * dn - dn).cast("double")
    k = F.col("k")
    ok = (k > 1) & (F.col("n") > k)
    return cum.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        F.when(ok, micro(h)).alias("h_stat"),
        F.when(ok & (c_tie > 0.0), micro(h / c_tie)).alias("h_tie_corr"),
        F.when(
            ok,
            micro((h - k.cast("double") + 1.0) / (n - k.cast("double"))),
        ).alias("epsilon_sq"),
    )


def kruskal_wallis_spend_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .customers import customers_sql
    from .transactions import transactions_sql

    h = "(12.0 / (n::double * (n::double + 1.0)) * cum_term - 3.0 * (n::double + 1.0))"
    c_tie = (
        "(1.0 - ties::double"
        " / (n::hugeint * n::hugeint * n::hugeint - n::hugeint)::double)"
    )
    eps = f"(({h} - k::double + 1.0) / (n::double - k::double))"
    return f"""
WITH txn AS ({transactions_sql()}),
cust AS ({customers_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
vals AS (
  SELECT c.segment, p.cents
  FROM per_cust p JOIN cust c USING (customer_id)
),
per_vg AS (
  SELECT cents, segment, count(*) AS n_gv FROM vals GROUP BY 1, 2
),
per_val AS (SELECT cents, sum(n_gv) AS cnt FROM per_vg GROUP BY cents),
ranked AS (
  SELECT cents, cnt,
         coalesce(sum(cnt) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_val
),
per_g AS (
  SELECT v.segment, sum(v.n_gv) AS n_g,
         sum(v.n_gv::hugeint * (2 * r.before::hugeint + r.cnt + 1)) AS r2_g
  FROM per_vg v JOIN ranked r USING (cents)
  GROUP BY v.segment
),
ties_t AS (
  SELECT sum(cnt::hugeint * cnt::hugeint * cnt::hugeint - cnt::hugeint) AS ties
  FROM ranked
),
cum AS (
  SELECT sum(n_g) OVER () AS n,
         count(*) OVER () AS k,
         sum((r2_g::hugeint * r2_g::hugeint)::double / (4.0 * n_g::double))
           OVER (ORDER BY segment ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_term,
         row_number() OVER (ORDER BY segment) AS rn
  FROM per_g
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
       CASE WHEN k > 1 AND n > k THEN {micro_sql(h)} END AS h_stat,
       CASE WHEN k > 1 AND n > k AND {c_tie} > 0.0
            THEN {micro_sql(f'({h} / {c_tie})')} END AS h_tie_corr,
       CASE WHEN k > 1 AND n > k THEN {micro_sql(eps)} END AS epsilon_sq
FROM cum, ties_t WHERE rn = k
"""


# ---------------------------------------------------------------------------
# Welch's t-test + Grubbs extreme-outlier screen on per-customer spend
# ---------------------------------------------------------------------------


def welch_ttest_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of per-customer net spend between
    the md5 A/B arms — the parametric member of the two-group family
    (:func:`mann_whitney_spend_utest` is its rank-based sibling on the
    SAME frame, so the pair answers "means differ" vs "distributions
    differ" on identical arms).  Reports t, the Welch–Satterthwaite
    degrees of freedom, and Cohen's d on the pooled sd.  No p-value: the
    t tail needs the incomplete beta, which neither engine evaluates —
    d is the effect size that answers the question.

    Exactness: per-arm moments accumulate EXACTLY (n as int64, spend sum
    S as int64 cents, Σy² as decimal(38,0) with per-factor casts), so the
    variance numerators n·Q − S² are exact decimals; each arm contributes
    ONE double division (the visit_spend_correlation discipline) and the
    t/df/d formulas are fixed scalar arithmetic on those doubles —
    identical fp op sequence in both engines, guarded-micro rounded.

    Scale shape: one per-customer groupBy (map-side combined), one 2-row
    arm rollup; everything after runs on a single row."""
    from ..functions.money import micro, to_cents
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("y")
    )
    arms = per_cust.select(
        "y", (_md5_bucket(F.col("customer_id"), 2) == 0).alias("is_a")
    )
    g = arms.groupBy("is_a").agg(
        F.count("*").alias("n_g"),
        F.sum("y").alias("s_g"),
        F.sum(dec38_prod(F.col("y"), F.col("y"))).alias("q_g"),
    )
    # pivot the 2-row arm frame into one row of exact scalars
    pick = lambda c, a: F.min(F.when(F.col("is_a") == a, F.col(c)))  # noqa: E731
    m = g.agg(
        pick("n_g", True).alias("n_a"),
        pick("s_g", True).alias("s_a"),
        pick("q_g", True).alias("q_a"),
        pick("n_g", False).alias("n_b"),
        pick("s_g", False).alias("s_b"),
        pick("q_g", False).alias("q_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    # exact decimal variance numerators: n·Q − S² (per-factor casts)
    vnum = lambda n, s, q: dec38(F.col(n)) * dec38(F.col(q)) - dec38(F.col(s)) * dec38(  # noqa: E731
        F.col(s)
    )
    var_a = vnum("n_a", "s_a", "q_a").cast("double") / (
        na.cast("double") * (na - 1).cast("double")
    )
    var_b = vnum("n_b", "s_b", "q_b").cast("double") / (
        nb.cast("double") * (nb - 1).cast("double")
    )
    mean_a = F.col("s_a").cast("double") / na.cast("double")
    mean_b = F.col("s_b").cast("double") / nb.cast("double")
    se2_a = var_a / na.cast("double")
    se2_b = var_b / nb.cast("double")
    t = (mean_a - mean_b) / F.sqrt(se2_a + se2_b)
    df_w = (se2_a + se2_b) * (se2_a + se2_b) / (
        se2_a * se2_a / (na - 1).cast("double")
        + se2_b * se2_b / (nb - 1).cast("double")
    )
    sp2 = (
        (na - 1).cast("double") * var_a + (nb - 1).cast("double") * var_b
    ) / (na + nb - 2).cast("double")
    d = (mean_a - mean_b) / F.sqrt(sp2)
    ok = (
        na.isNotNull()
        & nb.isNotNull()
        & (na > 1)
        & (nb > 1)
        & (var_a + var_b > 0.0)
    )
    return m.select(
        F.coalesce(na, F.lit(0)).alias("n_a"),
        F.coalesce(nb, F.lit(0)).alias("n_b"),
        F.when(na > 0, micro(mean_a / 100.0)).alias("mean_a"),
        F.when(nb > 0, micro(mean_b / 100.0)).alias("mean_b"),
        F.when(ok & (se2_a + se2_b > 0.0), micro(t)).alias("t_stat"),
        F.when(ok & (se2_a + se2_b > 0.0), micro(df_w)).alias("welch_df"),
        F.when(ok & (sp2 > 0.0), micro(d)).alias("cohens_d"),
    )


def welch_ttest_spend_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    var_a = "((n_a::hugeint * q_a - s_a::hugeint * s_a::hugeint)::double / (n_a::double * (n_a - 1)::double))"
    var_b = "((n_b::hugeint * q_b - s_b::hugeint * s_b::hugeint)::double / (n_b::double * (n_b - 1)::double))"
    mean_a = "(s_a::double / n_a::double)"
    mean_b = "(s_b::double / n_b::double)"
    se2_a = f"({var_a} / n_a::double)"
    se2_b = f"({var_b} / n_b::double)"
    t = f"(({mean_a} - {mean_b}) / sqrt({se2_a} + {se2_b}))"
    df_w = (
        f"(({se2_a} + {se2_b}) * ({se2_a} + {se2_b}) / "
        f"({se2_a} * {se2_a} / (n_a - 1)::double + {se2_b} * {se2_b} / (n_b - 1)::double))"
    )
    sp2 = f"(((n_a - 1)::double * {var_a} + (n_b - 1)::double * {var_b}) / (n_a + n_b - 2)::double)"
    d = f"(({mean_a} - {mean_b}) / sqrt({sp2}))"
    ok = f"(n_a IS NOT NULL AND n_b IS NOT NULL AND n_a > 1 AND n_b > 1 AND {var_a} + {var_b} > 0.0)"
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS y
  FROM txn GROUP BY customer_id
),
arms AS (
  SELECT y, {_md5_bucket_sql('customer_id', 2)} = 0 AS is_a FROM per_cust
),
g AS (
  SELECT is_a, count(*) AS n_g, CAST(sum(y) AS BIGINT) AS s_g,
         sum(y::hugeint * y::hugeint) AS q_g
  FROM arms GROUP BY is_a
),
m AS (
  SELECT min(CASE WHEN is_a THEN n_g END) AS n_a,
         min(CASE WHEN is_a THEN s_g END) AS s_a,
         min(CASE WHEN is_a THEN q_g END) AS q_a,
         min(CASE WHEN NOT is_a THEN n_g END) AS n_b,
         min(CASE WHEN NOT is_a THEN s_g END) AS s_b,
         min(CASE WHEN NOT is_a THEN q_g END) AS q_b
  FROM g
)
SELECT coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       CASE WHEN n_a > 0 THEN {micro_sql(f'({mean_a} / 100.0)')} END AS mean_a,
       CASE WHEN n_b > 0 THEN {micro_sql(f'({mean_b} / 100.0)')} END AS mean_b,
       CASE WHEN {ok} AND {se2_a} + {se2_b} > 0.0 THEN {micro_sql(t)} END AS t_stat,
       CASE WHEN {ok} AND {se2_a} + {se2_b} > 0.0 THEN {micro_sql(df_w)} END AS welch_df,
       CASE WHEN {ok} AND {sp2} > 0.0 THEN {micro_sql(d)} END AS cohens_d
FROM m
"""


def grubbs_spend_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs extreme-studentized-deviate screen on per-customer net
    spend: G = max|y − ȳ|/s from a SINGLE moment pass — max|dev| is
    max(y_max − ȳ, ȳ − y_min), so min/max/Σ/Σ² suffice and no second
    data pass ever runs.  The single-most-extreme-customer complement of
    :func:`cohorts.tukey_category_outliers`'s bulk fence counts (Tukey
    counts the tail, Grubbs asks whether the ONE whale is statistically
    surprising).  No p-value (t tail); G in σ units answers the question.

    Exactness: n/S int64, Σy² decimal with per-factor casts; the extreme
    deviations n·y_max − S and S − n·y_min are exact decimals (the
    daily_revenue_acf z discipline applied to the scalar extremes), so
    G = maxdev / (n·s) divides two doubles derived from exact integers —
    identical op order both engines, guarded-micro rounded.

    Scale shape: one per-customer groupBy, one 1-row moment rollup."""
    from ..functions.money import micro, to_cents
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("y")
    )
    m = per_cust.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s"),
        F.sum(dec38_prod(F.col("y"), F.col("y"))).alias("q"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    n = F.col("n")
    nd = n.cast("double")
    var = (dec38(n) * dec38(F.col("q")) - dec38(F.col("s")) * dec38(F.col("s"))).cast(
        "double"
    ) / (nd * (n - 1).cast("double"))
    sd = F.sqrt(var)
    dev_hi = (dec38(n) * dec38(F.col("y_max")) - dec38(F.col("s"))).cast("double")
    dev_lo = (dec38(F.col("s")) - dec38(n) * dec38(F.col("y_min"))).cast("double")
    g_hi = dev_hi / (nd * sd)
    g_lo = dev_lo / (nd * sd)
    ok = (n > 2) & (var > 0.0)
    return m.select(
        n.alias("n"),
        micro(F.col("s").cast("double") / nd / 100.0).alias("mean_spend"),
        F.when(n > 1, micro(sd / 100.0)).alias("sd_spend"),
        F.when(ok, micro(g_hi)).alias("g_high"),
        F.when(ok, micro(g_lo)).alias("g_low"),
        F.when(ok, micro(F.greatest(g_hi, g_lo))).alias("g_stat"),
        F.when(
            ok, F.when(g_hi >= g_lo, F.lit("high")).otherwise(F.lit("low"))
        ).alias("extreme_side"),
    )


def grubbs_spend_outlier_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .transactions import transactions_sql

    var = (
        "((n::hugeint * q - s::hugeint * s::hugeint)::double"
        " / (n::double * (n - 1)::double))"
    )
    sd = f"sqrt({var})"
    dev_hi = "((n::hugeint * y_max::hugeint - s::hugeint)::double)"
    dev_lo = "((s::hugeint - n::hugeint * y_min::hugeint)::double)"
    g_hi = f"({dev_hi} / (n::double * {sd}))"
    g_lo = f"({dev_lo} / (n::double * {sd}))"
    ok = f"(n > 2 AND {var} > 0.0)"
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS y
  FROM txn GROUP BY customer_id
),
m AS (
  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
         sum(y::hugeint * y::hugeint) AS q,
         min(y) AS y_min, max(y) AS y_max
  FROM per_cust
)
SELECT CAST(n AS BIGINT) AS n,
       {micro_sql('(s::double / n::double / 100.0)')} AS mean_spend,
       CASE WHEN n > 1 THEN {micro_sql(f'({sd} / 100.0)')} END AS sd_spend,
       CASE WHEN {ok} THEN {micro_sql(g_hi)} END AS g_high,
       CASE WHEN {ok} THEN {micro_sql(g_lo)} END AS g_low,
       CASE WHEN {ok} THEN {micro_sql(f'greatest({g_hi}, {g_lo})')} END AS g_stat,
       CASE WHEN {ok} THEN
         CASE WHEN {g_hi} >= {g_lo} THEN 'high' ELSE 'low' END END AS extreme_side
FROM m
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe variance homogeneity + deterministic permutation test
# ---------------------------------------------------------------------------


def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test of spend-variance
    homogeneity across the five market segments — the precondition check
    for :func:`anova_spend_by_segment` (classic ANOVA assumes equal group
    variances; this asks whether that assumption even holds, and the
    median centering keeps it honest on heavy-tailed cents where the
    mean-centered Levene is whale-dominated).  W is an ordinary one-way
    ANOVA F computed on z = |y − med_g|.

    Distributed discipline: per-segment LOWER medians come from the
    sign-aware log-bucket prefix primitive PARTITIONED by segment (the
    tukey_category_outliers shape — no per-segment global value sort);
    z stays an exact int64 (|cents − med| of two int64s); the ANOVA on z
    reuses the exact-moment + ordered ≤5-row window discipline verbatim
    (Σ z per group as decimal, Σ z² as per-factor-cast decimal, ONE
    double division per group term).

    Scale shape: one per-customer collapse, one (segment, value) groupBy,
    the bounded per-segment bucket-offset build, one ≤5-row rollup."""
    from ..functions.money import micro, to_cents
    from ..io import tracked_persist
    from .customers import build_customers
    from .sketches import bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    seg = build_customers(spark, sf_dir).select("customer_id", "segment")
    # tracked cache: the rank build AND the |dev| pass both consume the
    # per-customer collapse — without it the corpus-sized groupBy runs twice
    vals = tracked_persist(
        per_cust.join(F.broadcast(seg), "customer_id").select("segment", "cents")
    )
    per_val = vals.groupBy("segment", "cents").agg(F.count("*").alias("cnt"))
    wseg = Window.partitionBy("segment")
    ranked = bucketed_prefix_rank(
        per_val, "cents", partition_cols=("segment",)
    ).withColumn("n_seg", F.sum("cnt").over(wseg))
    med_rank = F.expr("(n_seg + 1) div 2")
    covers = (F.col("before") < med_rank) & (med_rank <= F.col("before") + F.col("cnt"))
    medians = ranked.groupBy("segment").agg(
        F.min(F.when(covers, F.col("cents"))).alias("med")
    )
    # |dev| over the per-customer vals frame (one row per customer, matching
    # the oracle's zf CTE) — exact int64
    z = vals.join(F.broadcast(medians), "segment").select(
        "segment", F.abs(F.col("cents") - F.col("med")).alias("z")
    )
    g = z.groupBy("segment").agg(
        F.count("*").alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(dec38_prod(F.col("z"), F.col("z"))).alias("q_g"),
    )
    term = (dec38(F.col("s_g")) * dec38(F.col("s_g"))).cast("double") / F.col(
        "n_g"
    ).cast("double")
    w = Window.orderBy("segment").rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.partitionBy()
    cum = g.select(
        F.sum("n_g").over(wk).alias("n"),
        F.sum("s_g").over(wk).alias("s"),
        F.sum(dec38(F.col("q_g"))).over(wk).alias("q"),
        F.count("*").over(wk).alias("k"),
        F.sum(term).over(w).alias("cum_term"),
        F.row_number().over(Window.orderBy("segment")).alias("rn"),
    ).filter(F.col("rn") == F.col("k"))
    n, k = F.col("n").cast("double"), F.col("k")
    grand = dec38(F.col("s")) * dec38(F.col("s"))
    ssb = F.col("cum_term") - grand.cast("double") / n
    sst = F.col("q").cast("double") - grand.cast("double") / n
    ssw = sst - ssb
    ok = (k > 1) & (F.col("n") > k) & (ssw > 0.0)
    w_stat = (ssb / (k - 1).cast("double")) / (ssw / (F.col("n") - k).cast("double"))
    return cum.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        F.when(ok, micro(w_stat)).alias("bf_stat"),
        F.when(sst > 0.0, micro(ssb / sst)).alias("eta_sq_absdev"),
    )


def levene_brown_forsythe_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .customers import customers_sql
    from .transactions import transactions_sql

    ssb = "(cum_term - (s::hugeint * s::hugeint)::double / n::double)"
    sst = "(q::double - (s::hugeint * s::hugeint)::double / n::double)"
    ssw = f"({sst} - {ssb})"
    w_stat = f"(({ssb} / (k - 1)::double) / ({ssw} / (n - k)::double))"
    return f"""
WITH txn AS ({transactions_sql()}),
cust AS ({customers_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
vals AS (
  SELECT c.segment, p.cents
  FROM per_cust p JOIN cust c USING (customer_id)
),
per_val AS (
  SELECT segment, cents, count(*) AS cnt FROM vals GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents, cnt,
         coalesce(sum(cnt) OVER (PARTITION BY segment ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         sum(cnt) OVER (PARTITION BY segment) AS n_seg
  FROM per_val
),
medians AS (
  SELECT segment,
         min(CASE WHEN before < (n_seg + 1) // 2
                  AND (n_seg + 1) // 2 <= before + cnt THEN cents END) AS med
  FROM ranked GROUP BY segment
),
zf AS (
  SELECT v.segment, abs(v.cents - m.med) AS z
  FROM vals v JOIN medians m USING (segment)
),
g AS (
  SELECT segment, count(*) AS n_g, CAST(sum(z) AS BIGINT) AS s_g,
         sum(z::hugeint * z::hugeint) AS q_g
  FROM zf GROUP BY segment
),
cum AS (
  SELECT sum(n_g) OVER () AS n,
         sum(s_g) OVER () AS s,
         sum(q_g) OVER () AS q,
         count(*) OVER () AS k,
         sum((s_g::hugeint * s_g::hugeint)::double / n_g::double)
           OVER (ORDER BY segment ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_term,
         row_number() OVER (ORDER BY segment) AS rn
  FROM g
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
       CASE WHEN k > 1 AND n > k AND {ssw} > 0.0
            THEN {micro_sql(w_stat)} END AS bf_stat,
       CASE WHEN {sst} > 0.0 THEN {micro_sql(f'({ssb} / {sst})')} END AS eta_sq_absdev
FROM cum WHERE rn = k
"""


# permutation count for the label-shuffle test: enough for p-resolution
# 1/201 ≈ 0.005 at a cost of B·n_cust exploded rows (one map-side groupBy)
PERM_B = 200


def permutation_test_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic permutation test of the A/B spend-mean difference:
    B = 200 pseudo-permutations reassign each customer's arm by
    md5(customer_id ∥ perm-index) and the p-value is the share of
    permuted |mean diffs| at least as extreme as the observed one
    ((1 + #extreme)/(1 + #valid), the add-one permutation estimator over
    the pseudo-permutations that kept both arms populated — a degenerate
    perm carries no diff and drops from numerator AND denominator).  The
    resampling-based member of the two-group family — no normality or
    rank assumptions at all — and a template for deterministic Monte
    Carlo on a cluster: NO rand(), the "randomness" is a content hash,
    so any executor count, partitioning or retry reproduces it bitwise.

    Exactness: the extremeness comparison |d_b| ≥ |d_obs| NEVER touches
    floats — with d = S_a/n_a − S_b/n_b it cross-multiplies to
    |S_a·n_b − S_b·n_a|·(n_a°·n_b°) vs |S_a°·n_b° − S_b°·n_a°|·(n_a·n_b)
    in exact decimal (per-factor casts), so a permuted diff exactly AT
    the observed value counts as extreme in both engines with no
    boundary fp ambiguity.

    Scale shape: one per-customer collapse; the explode is B rows per
    customer collapsed by ONE map-side-combined groupBy(perm) to B rows;
    everything after runs on the B-row frame."""
    from ..functions.money import micro, to_cents
    from ..io import tracked_persist
    from .sampling import _md5_bucket
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    # tracked cache: the observed-arm aggregate AND the 200-way explode
    # both consume the per-customer collapse
    per_cust = tracked_persist(
        txn.groupBy("customer_id").agg(
            F.sum(to_cents(F.col("total_amount"))).alias("y")
        )
    )
    obs = per_cust.select(
        "y", (_md5_bucket(F.col("customer_id"), 2) == 0).cast("long").alias("is_a")
    ).agg(
        F.sum("is_a").alias("n_a0"),
        F.sum(F.when(F.col("is_a") == 1, F.col("y")).otherwise(0)).alias("s_a0"),
        (F.count("*") - F.sum("is_a")).alias("n_b0"),
        F.sum(F.when(F.col("is_a") == 0, F.col("y")).otherwise(0)).alias("s_b0"),
    )
    perms = per_cust.select(
        "customer_id", "y", F.explode(F.expr(f"sequence(1, {PERM_B})")).alias("perm")
    ).select(
        "perm",
        "y",
        (
            _md5_bucket(
                F.concat(F.col("customer_id").cast("string"), F.lit("|perm"), F.col("perm")),
                2,
            )
            == 0
        )
        .cast("long")
        .alias("is_a"),
    )
    per_b = perms.groupBy("perm").agg(
        F.sum("is_a").alias("n_a"),
        F.sum(F.when(F.col("is_a") == 1, F.col("y")).otherwise(0)).alias("s_a"),
        (F.count("*") - F.sum("is_a")).alias("n_b"),
        F.sum(F.when(F.col("is_a") == 0, F.col("y")).otherwise(0)).alias("s_b"),
    )
    j = per_b.crossJoin(F.broadcast(obs))
    # exact cross-multiplied extremeness: both sides decimal(38,0) products
    lhs = F.abs(
        dec38(F.col("s_a")) * dec38(F.col("n_b")) - dec38(F.col("s_b")) * dec38(F.col("n_a"))
    ) * (dec38(F.col("n_a0")) * dec38(F.col("n_b0")))
    rhs = F.abs(
        dec38(F.col("s_a0")) * dec38(F.col("n_b0")) - dec38(F.col("s_b0")) * dec38(F.col("n_a0"))
    ) * (dec38(F.col("n_a")) * dec38(F.col("n_b")))
    # a pseudo-permutation that empties an arm carries no diff — it must
    # drop from BOTH the numerator and the denominator (counting it only
    # in the denominator would bias p toward significance on tiny
    # corpora, where P(empty arm) = 2·2^-n is non-negligible)
    valid = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    agg = j.agg(
        F.count("*").alias("n_perms"),
        F.sum(valid.cast("long")).alias("n_valid"),
        F.sum(F.when(valid & (lhs >= rhs), 1).otherwise(0)).alias("n_ge"),
        F.min("n_a0").alias("n_a0"),
        F.min("s_a0").alias("s_a0"),
        F.min("n_b0").alias("n_b0"),
        F.min("s_b0").alias("s_b0"),
    )
    d_obs = F.col("s_a0").cast("double") / F.col("n_a0").cast("double") - F.col(
        "s_b0"
    ).cast("double") / F.col("n_b0").cast("double")
    ok = (F.col("n_a0") > 0) & (F.col("n_b0") > 0)
    return agg.select(
        F.col("n_a0").alias("n_a"),
        F.col("n_b0").alias("n_b"),
        F.when(ok, micro(d_obs / 100.0)).alias("mean_diff"),
        F.col("n_perms").cast("long").alias("n_perms"),
        F.col("n_valid").cast("long").alias("n_valid"),
        F.col("n_ge").cast("long").alias("n_extreme"),
        F.when(
            ok,
            micro(
                (1.0 + F.col("n_ge").cast("double"))
                / (1.0 + F.col("n_valid").cast("double"))
            ),
        ).alias("p_value"),
    )


def permutation_test_spend_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    arm0 = _md5_bucket_sql("customer_id", 2)
    armb = _md5_bucket_sql("customer_id::varchar || '|perm' || perm::varchar", 2)
    d_obs = "(s_a0::double / n_a0::double - s_b0::double / n_b0::double)"
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS y
  FROM txn GROUP BY customer_id
),
obs AS (
  SELECT sum(is_a) AS n_a0,
         sum(CASE WHEN is_a = 1 THEN y ELSE 0 END) AS s_a0,
         count(*) - sum(is_a) AS n_b0,
         sum(CASE WHEN is_a = 0 THEN y ELSE 0 END) AS s_b0
  FROM (SELECT y, CASE WHEN {arm0} = 0 THEN 1 ELSE 0 END AS is_a FROM per_cust)
),
perms AS (
  SELECT p.perm, c.y,
         CASE WHEN {armb} = 0 THEN 1 ELSE 0 END AS is_a
  FROM per_cust c, (SELECT unnest(generate_series(1, {PERM_B})) AS perm) p
),
per_b AS (
  SELECT perm, sum(is_a) AS n_a,
         sum(CASE WHEN is_a = 1 THEN y ELSE 0 END) AS s_a,
         count(*) - sum(is_a) AS n_b,
         sum(CASE WHEN is_a = 0 THEN y ELSE 0 END) AS s_b
  FROM perms GROUP BY perm
),
agg AS (
  SELECT count(*) AS n_perms,
         sum(CASE WHEN n_a > 0 AND n_b > 0 THEN 1 ELSE 0 END) AS n_valid,
         sum(CASE WHEN n_a > 0 AND n_b > 0
                  AND abs(s_a::hugeint * n_b::hugeint - s_b::hugeint * n_a::hugeint)
                      * (n_a0::hugeint * n_b0::hugeint)
                  >= abs(s_a0::hugeint * n_b0::hugeint - s_b0::hugeint * n_a0::hugeint)
                      * (n_a::hugeint * n_b::hugeint)
                  THEN 1 ELSE 0 END) AS n_ge,
         min(n_a0) AS n_a0, min(s_a0) AS s_a0,
         min(n_b0) AS n_b0, min(s_b0) AS s_b0
  FROM per_b, obs
)
SELECT CAST(n_a0 AS BIGINT) AS n_a, CAST(n_b0 AS BIGINT) AS n_b,
       CASE WHEN n_a0 > 0 AND n_b0 > 0
            THEN {micro_sql(f'({d_obs} / 100.0)')} END AS mean_diff,
       CAST(n_perms AS BIGINT) AS n_perms,
       CAST(n_valid AS BIGINT) AS n_valid,
       CAST(n_ge AS BIGINT) AS n_extreme,
       CASE WHEN n_a0 > 0 AND n_b0 > 0 THEN
         {micro_sql('((1.0 + n_ge::double) / (1.0 + n_valid::double))')}
       END AS p_value
FROM agg
"""


def wilcoxon_signed_rank_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test over per-customer PAIRED spend: each
    customer's net cents before vs after the fixed epoch midpoint
    (``sketches.PSI_SPLIT_DATE`` — the same split spend_drift_psi
    monitors), asking "did the SAME customers shift their spending
    between eras" — the paired sibling of :func:`mann_whitney_spend_utest`
    (which compares two different groups).  The reference's era-over-era
    revenue comparisons (dashboard month-over-month deltas) are mean-based
    and whale-dominated; the signed-rank form is the distribution-free
    version a cents metric needs.

    Semantics: a customer with transactions in only one era pairs against
    a 0-cent other half; zero differences drop (standard zero-discard);
    tied |d| blocks take average ranks in 2× integer units.  2·W+ =
    Σ_v npos_v·(2·before_v + cnt_v + 1) stays exact decimal via the shared
    :func:`sketches.bucketed_prefix_rank` (plain mode — no global sort);
    the tie-corrected normal approximation uses var(2W+) =
    n(n+1)(2n+1)/6 − Σ(t³−t)/12, which is ≥ n(n+1)²/4 > 0 for n ≥ 1, so
    the only degenerate case is n = 0 (every customer's halves tie) —
    z pins NULL on both engines.

    Scale shape: one per-customer conditional-sum collapse, one shuffle
    onto distinct |d| values, the bounded-bucket rank build, one scalar
    aggregate."""
    from ..functions.money import micro, to_cents
    from .sketches import PSI_SPLIT_DATE, bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    cents = to_cents(F.col("total_amount"))
    split = F.lit(PSI_SPLIT_DATE).cast("date")
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(F.when(F.col("txn_date") < split, cents).otherwise(F.lit(0))).alias("s1"),
        F.sum(F.when(F.col("txn_date") >= split, cents).otherwise(F.lit(0))).alias(
            "s2"
        ),
    )
    pairs = (
        per_cust.select((F.col("s2") - F.col("s1")).alias("d"))
        .filter(F.col("d") != 0)
        .select(F.abs(F.col("d")).alias("absd"), (F.col("d") > 0).cast("long").alias("pos"))
    )
    per_val = pairs.groupBy("absd").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("n_pos_v")
    )
    ranked = bucketed_prefix_rank(per_val, "absd")
    dcnt = dec38(F.col("cnt"))
    m = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum("n_pos_v").alias("n_pos"),
        F.sum(
            dec38(F.col("n_pos_v")) * (2 * dec38(F.col("before")) + dcnt + 1)
        ).alias("w2_plus"),
        F.sum(dcnt * dcnt * dcnt - dcnt).alias("ties"),
    )
    n = F.col("n")
    dn = dec38(n)
    # z = (W+ − n(n+1)/4)/σ, in 2× units: (2·w2 − n(n+1)) / (2·sqrt(var2)),
    # var2 = var(2W+); every product decimal-exact before the double cast
    num = (2 * dec38(F.col("w2_plus")) - dn * (dn + 1)).cast("double")
    var2 = (dn * (dn + 1) * (2 * dn + 1)).cast("double") / 6.0 - F.col("ties").cast(
        "double"
    ) / 12.0
    z = num / (2.0 * F.sqrt(var2))
    return m.select(
        F.coalesce(n, F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_positive"),
        (F.col("w2_plus").cast("double") / 2.0).alias("w_plus"),
        F.when(n > 0, micro(z)).alias("z_score"),
    )


def wilcoxon_signed_rank_spend_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .sketches import PSI_SPLIT_DATE
    from .transactions import transactions_sql

    zx = ("((2 * w2_plus - (n::hugeint * (n + 1)))::double "
          "/ (2.0 * sqrt((n::hugeint * (n + 1) * (2 * n + 1))::double / 6.0 "
          "- ties::double / 12.0)))")
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id,
         sum(CASE WHEN txn_date < DATE '{PSI_SPLIT_DATE}'
                  THEN {to_cents_sql('total_amount')} ELSE 0 END) AS s1,
         sum(CASE WHEN txn_date >= DATE '{PSI_SPLIT_DATE}'
                  THEN {to_cents_sql('total_amount')} ELSE 0 END) AS s2
  FROM txn GROUP BY customer_id
),
pairs AS (
  SELECT abs(s2 - s1) AS absd, (s2 > s1)::bigint AS pos
  FROM per_cust WHERE s2 <> s1
),
per_val AS (
  SELECT absd, count(*) AS cnt, sum(pos) AS n_pos_v
  FROM pairs GROUP BY absd
),
ranked AS (
  SELECT absd, cnt, n_pos_v,
         coalesce(sum(cnt) OVER (ORDER BY absd
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_val
),
m AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(n_pos_v) AS BIGINT) AS n_pos,
         sum((n_pos_v * (2 * before + cnt + 1))::hugeint) AS w2_plus,
         sum((cnt * cnt * cnt - cnt)::hugeint) AS ties
  FROM ranked
)
SELECT coalesce(n, 0) AS n_pairs,
       coalesce(n_pos, 0) AS n_positive,
       w2_plus::double / 2.0 AS w_plus,
       CASE WHEN n > 0 THEN
         {micro_sql(zx)}
       END AS z_score
FROM m
"""


def cvm_spend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises criterion over per-customer net spend
    between the md5 A/B arms — the whole-distribution sibling of
    :func:`ks_spend_test`: KS reads only the single largest ECDF gap, CvM
    integrates the SQUARED gap over every pooled observation, so it sees
    broad mid-distribution shifts KS underweights.  T = n_a·n_b/(n)² ·
    Σ_v cnt_v·(F_A(v) − F_B(v))², computed as exact integers:
    Σ cnt·(n_b·cumA − n_a·cumB)² / (n_a·n_b·n²), with the inclusive dual
    cumulatives from ONE :func:`sketches.bucketed_prefix_rank` pass
    (inclusive mode, both measures) — the ks_spend_test machinery with
    the max swapped for a weighted sum.

    Degenerate cases (an empty arm) pin T to NULL on both engines.

    Scale shape: one customer rollup, one shuffle onto distinct values,
    bounded-bucket windows, one scalar aggregate.  The exact integer
    numerator is bounded by n³·max(cum)² ~ n⁵ — decimal(38,0) holds to
    n ≈ 10⁷ customers; past that the production form shards the sum by
    bucket before the final add (same class as ks's cross product)."""
    from ..functions.money import micro, to_cents
    from .sampling import _md5_bucket
    from .sketches import bucketed_prefix_rank
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    arms = per_cust.select(
        "cents",
        (_md5_bucket(F.col("customer_id"), 2) == 0).cast("long").alias("is_a"),
    )
    per_val = arms.groupBy("cents").agg(
        F.count("*").alias("cnt"), F.sum("is_a").alias("a_v")
    )
    cum = bucketed_prefix_rank(
        per_val, "cents", inclusive=True, sums={"cnt": "cum", "a_v": "cum_a"}
    ).select("cnt", "cum", "cum_a")
    tot = arms.agg(F.count("*").alias("n"), F.sum("is_a").alias("n_a"))
    j = cum.join(F.broadcast(tot))
    nb = F.col("n") - F.col("n_a")
    cum_b = dec38(F.col("cum")) - dec38(F.col("cum_a"))
    diff = dec38(nb) * dec38(F.col("cum_a")) - dec38(F.col("n_a")) * cum_b
    m = j.agg(
        F.max("n").alias("n"),
        F.max("n_a").alias("n_a"),
        F.sum(dec38(F.col("cnt")) * diff * diff).alias("s"),
    )
    n, na = F.col("n"), F.col("n_a")
    nbb = n - na
    dn, dna, dnb = dec38(n), dec38(na), dec38(nbb)
    t = (
        F.col("s").cast("double")
        / (dna * dnb).cast("double")
        / (dn * dn).cast("double")
    )
    ok = (na > 0) & (nbb > 0)
    return m.select(
        n.alias("n"),
        na.alias("n_a"),
        nbb.alias("n_b"),
        F.when(ok, micro(t)).alias("cvm_t"),
    )


def cvm_spend_test_sql() -> str:
    from ..functions.money import micro_sql, to_cents_sql
    from .sampling import _md5_bucket_sql
    from .transactions import transactions_sql

    tx = ("(s::double / (n_a::hugeint * (n - n_a))::double "
          "/ (n::hugeint * n)::double)")
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
arms AS (
  SELECT cents, ({_md5_bucket_sql('customer_id', 2)} = 0)::bigint AS is_a
  FROM per_cust
),
per_val AS (
  SELECT cents, count(*) AS cnt, sum(is_a) AS a_v
  FROM arms GROUP BY cents
),
cum AS (
  SELECT cnt,
         sum(cnt) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(a_v) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a
  FROM per_val
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(is_a) AS BIGINT) AS n_a
  FROM arms
),
m AS (
  SELECT max(n) AS n, max(n_a) AS n_a,
         sum((cnt::hugeint
              * ((n - n_a) * cum_a - n_a * (cum - cum_a))::hugeint
              * ((n - n_a) * cum_a - n_a * (cum - cum_a))::hugeint)) AS s
  FROM cum, tot
)
SELECT n, n_a, (n - n_a) AS n_b,
       CASE WHEN n_a > 0 AND n - n_a > 0 THEN
         {micro_sql(tx)}
       END AS cvm_t
FROM m
"""
