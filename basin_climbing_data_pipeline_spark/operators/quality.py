"""Warehouse data-quality constraint audit (deequ/dbt-test-style).

The reference defends against dirty data ad hoc at every load site —
``if col in df.columns`` (shared/data_loader.py:24-27), ``errors='coerce'``
timestamp parsing (shared/data_loader.py:23-28), ``row.get(..., default)``
(build_customer_master.py:187-191) — but never *measures* it.  A pipeline
that feeds training data needs the declarative form: a constraint table
(uniqueness, referential integrity, null rates, domain rules) evaluated on
every build, with violation counts as first-class output.

Each check is one aggregation over one warehouse table; checks on the same
table share a scan via a single multi-aggregate projection where possible.
At 100 TB this is the cheapest shape there is — metadata-only reads would
skip violations, and every check is a map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def warehouse_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per constraint: (check_name, n_rows, n_violations, passed).

    Checks:
    - ``transactions.transaction_id`` unique (ST4's exactly-once guarantee,
      reference pipeline_handler.py:330-331)
    - ``transactions.total_amount`` non-null
    - ``checkins.customer_id`` references ``customers`` (the id-space
      discipline of reference id_mapping.py:21-102)
    - ``memberships`` interval sanity: start_date <= end_date
    - ``customers.email`` well-formed (reference customer_matching.py:19-38)
    - ``checkins.entry_method`` in the known code domain (reference
      fetch_capitan_checkin_data.py MEM/ENT/GUE/FRE/EVE codes)
    """
    from .. import config
    from .customers import build_customers
    from .events import build_checkins
    from .memberships import build_memberships_2024
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    ck = build_checkins(spark, sf_dir)
    cust = build_customers(spark, sf_dir)
    mem = build_memberships_2024(spark, sf_dir)

    txn_stats = txn.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("transaction_id")).alias("dup_ids"),
        F.count(F.when(F.col("total_amount").isNull(), 1)).alias("null_amounts"),
    )
    txn_checks = txn_stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("transactions_id_unique").alias("check_name"),
                    F.col("n").alias("n_rows"),
                    F.col("dup_ids").alias("n_violations"),
                ),
                F.struct(
                    F.lit("transactions_amount_not_null").alias("check_name"),
                    F.col("n").alias("n_rows"),
                    F.col("null_amounts").alias("n_violations"),
                ),
            )
        ).alias("c")
    ).select("c.check_name", "c.n_rows", "c.n_violations")

    # FK check as ONE left join + conditional count — no separate anti-join
    # job, and the dimension side broadcasts
    orphan = (
        ck.join(
            F.broadcast(cust.select(F.col("customer_id").alias("known_id"))),
            ck["customer_id"] == F.col("known_id"),
            "left",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(F.col("known_id").isNull(), 1)).alias("n_violations"),
        )
        .select(F.lit("checkins_customer_fk").alias("check_name"), "n_rows", "n_violations")
    )

    mem_checks = mem.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("start_date") > F.col("end_date"), 1)).alias("n_violations"),
    ).select(F.lit("memberships_date_order").alias("check_name"), "n_rows", "n_violations")

    email_ok = F.col("email").rlike(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$")
    cust_checks = cust.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("email").isNotNull() & ~email_ok, 1)).alias("n_violations"),
    ).select(F.lit("customers_email_format").alias("check_name"), "n_rows", "n_violations")

    entry_methods = sorted(set(config.ENTRY_METHOD_BY_EVENT_TYPE.values()) | {"UNK"})
    entry_domain = ck.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(~F.col("entry_method").isin(*entry_methods), 1)).alias(
            "n_violations"
        ),
    ).select(F.lit("checkins_entry_domain").alias("check_name"), "n_rows", "n_violations")

    all_checks = (
        txn_checks.unionByName(orphan)
        .unionByName(mem_checks)
        .unionByName(cust_checks)
        .unionByName(entry_domain)
    )
    return all_checks.select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


def warehouse_constraint_audit_sql() -> str:
    from .. import config
    from .customers import customers_sql
    from .events import checkins_sql
    from .memberships import memberships_2024_sql
    from .transactions import transactions_sql

    entry_methods = sorted(set(config.ENTRY_METHOD_BY_EVENT_TYPE.values()) | {"UNK"})
    entry_list = ", ".join(f"'{m}'" for m in entry_methods)
    return f"""
WITH txn AS ({transactions_sql()}),
ck AS ({checkins_sql()}),
cust AS ({customers_sql()}),
mem AS ({memberships_2024_sql()}),
checks AS (
  SELECT 'transactions_id_unique' AS check_name,
         count(*) AS n_rows,
         count(*) - count(DISTINCT transaction_id) AS n_violations
  FROM txn
  UNION ALL
  SELECT 'transactions_amount_not_null', count(*),
         count(CASE WHEN total_amount IS NULL THEN 1 END)
  FROM txn
  UNION ALL
  SELECT 'checkins_customer_fk',
         (SELECT count(*) FROM ck),
         (SELECT count(*) FROM ck
          WHERE customer_id NOT IN (SELECT customer_id FROM cust))
  UNION ALL
  SELECT 'memberships_date_order', count(*),
         count(CASE WHEN start_date > end_date THEN 1 END)
  FROM mem
  UNION ALL
  SELECT 'customers_email_format', count(*),
         count(CASE WHEN email IS NOT NULL
                     AND NOT regexp_matches(email,
                       '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}$')
                    THEN 1 END)
  FROM cust
  UNION ALL
  SELECT 'checkins_entry_domain', count(*),
         count(CASE WHEN entry_method NOT IN ({entry_list}) THEN 1 END)
  FROM ck
)
SELECT check_name,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# k-anonymity audit — the governance gate before a dataset leaves the house
# ---------------------------------------------------------------------------

K_ANON_THRESHOLD = 5
ACCTBAL_BAND = 1000  # quasi-identifier coarsening: balance band width


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the customer quasi-identifiers (nation, market
    segment, account-balance band): group rows into equivalence classes
    and report the class-size histogram with the k=:data:`K_ANON_THRESHOLD`
    violation accounting — how many customers sit in classes small enough
    to re-identify, the number a release gate checks before any derived
    dataset ships.  Banding uses floor division so negative balances band
    consistently in both engines (DuckDB ``//`` floors, so the Spark side
    uses ``floor(x / w)`` rather than integer ``div``).

    Scale shape: one groupBy on the QI tuple (map-side combined), then a
    histogram over class sizes — the second aggregation's input is
    |classes|, not |rows|."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / float(ACCTBAL_BAND)).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count("*").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_customers"),
            (F.col("class_size") < K_ANON_THRESHOLD).alias("violates_k"),
        )
        .orderBy("class_size")
    )


def k_anonymity_audit_sql() -> str:
    return f"""
WITH classes AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / {float(ACCTBAL_BAND)!r}) AS BIGINT) AS bal_band,
         count(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT class_size,
       count(*) AS n_classes,
       CAST(class_size * count(*) AS BIGINT) AS n_customers,
       class_size < {K_ANON_THRESHOLD} AS violates_k
FROM classes
GROUP BY class_size
ORDER BY class_size
"""


# ---------------------------------------------------------------------------
# join-key skew audit — find the hot keys before the shuffle does
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of the events stream's join key (``user_id``): the
    :data:`SKEW_TOP_K` heaviest keys with each key's share of the table
    and its ratio to the MEAN key load — the numbers that decide whether
    a downstream join needs salting (:mod:`..operators.skew`), AQE
    skew-split, or a broadcast instead.  Run this BEFORE the 100-TB
    shuffle, not after it spills.

    Exactness: shares and ratios are integer-derived fixed-point (counts
    and the 1-row total are exact; one floored division each).

    Scale shape: one groupBy on the key (map-side combined), a 1-row
    total broadcast back, one top-k — the audit never moves more than
    |distinct keys| rows."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"), F.count("*").alias("n_keys")
    )
    joined = counts.crossJoin(F.broadcast(totals))
    share = F.floor(
        F.col("n_rows").cast("double") / F.col("total_rows").cast("double") * 1000000.0
        + 0.5
    ) / 1000000.0
    mean_ratio = F.floor(
        F.col("n_rows").cast("double")
        * F.col("n_keys").cast("double")
        / F.col("total_rows").cast("double")
        * 10000.0
        + 0.5
    ) / 10000.0
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc("user_id"))
    top = (
        joined.orderBy(F.desc("n_rows"), F.asc("user_id"))
        .limit(SKEW_TOP_K)
        .withColumn("rank", F.row_number().over(w))
    )
    return top.select(
        "rank",
        "user_id",
        "n_rows",
        share.alias("share"),
        mean_ratio.alias("x_mean_load"),
    ).orderBy("rank")


def join_key_skew_audit_sql() -> str:
    return f"""
WITH counts AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
),
totals AS (SELECT sum(n_rows) AS total_rows, count(*) AS n_keys FROM counts),
ranked AS (
  SELECT user_id, n_rows, total_rows, n_keys,
         row_number() OVER (ORDER BY n_rows DESC, user_id) AS rank
  FROM counts, totals
)
SELECT rank, user_id, n_rows,
       floor(n_rows::double / total_rows::double * 1000000.0 + 0.5) / 1000000.0 AS share,
       floor(n_rows::double * n_keys::double / total_rows::double * 10000.0 + 0.5)
         / 10000.0 AS x_mean_load
FROM ranked
WHERE rank <= {SKEW_TOP_K}
ORDER BY rank
"""


L_DIVERSITY_THRESHOLD = 3  # each QI class must see >= L distinct sensitive values


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity over the same quasi-identifier classes as
    :func:`k_anonymity_audit`, with the market segment as the SENSITIVE
    attribute: a class can be k-anonymous yet still leak (everyone in it
    shares one segment → membership reveals the value), so the release
    gate checks BOTH.  Reports, per distinct-sensitive-count l, how many
    classes and customers sit there and whether that l violates the
    threshold — plus each l-band's worst (largest) homogeneous exposure.

    QI here is (nation, balance band) — segment moves from the QI tuple
    to the sensitive slot, the standard complementary cut of the same
    columns.

    Scale shape: one groupBy on (QI, sensitive) — map-side combined —
    then one groupBy onto the class set, then a histogram over
    |distinct-sensitive| values.  Row volume never survives the first
    aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    per_sens = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / float(ACCTBAL_BAND)).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("sensitive"),
    ).agg(F.count("*").alias("n"))
    classes = per_sens.groupBy("nation", "bal_band").agg(
        F.count("*").alias("l_distinct"),
        F.sum("n").alias("class_size"),
    )
    return (
        classes.groupBy("l_distinct")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("class_size").alias("n_customers"),
            F.max("class_size").alias("max_class_size"),
        )
        .select(
            "l_distinct",
            "n_classes",
            "n_customers",
            "max_class_size",
            (F.col("l_distinct") < L_DIVERSITY_THRESHOLD).alias("violates_l"),
        )
        .orderBy("l_distinct")
    )


def l_diversity_audit_sql() -> str:
    return f"""
WITH per_sens AS (
  SELECT c_nationkey AS nation,
         CAST(floor(c_acctbal / {float(ACCTBAL_BAND)!r}) AS BIGINT) AS bal_band,
         c_mktsegment AS sensitive,
         count(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
),
classes AS (
  SELECT nation, bal_band, count(*) AS l_distinct, sum(n) AS class_size
  FROM per_sens GROUP BY 1, 2
)
SELECT l_distinct,
       count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_customers,
       CAST(max(class_size) AS BIGINT) AS max_class_size,
       l_distinct < {L_DIVERSITY_THRESHOLD} AS violates_l
FROM classes
GROUP BY l_distinct
ORDER BY l_distinct
"""


# ---------------------------------------------------------------------------
# column-level table profiling
# ---------------------------------------------------------------------------

# the profiled column set is part of the operator's contract (a profiler
# that silently follows schema drift hides the drift it should surface)
PROFILE_COLUMNS: tuple[str, ...] = (
    "transaction_id",
    "customer_id",
    "description",
    "total_amount",
    "txn_date",
    "revenue_category",
    "sub_category",
    "data_source",
)


def column_profile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the combined transactions table: one row
    per column with row count, null count, fixed-point null rate, and
    exact distinct count — the first query any pipeline runs against a
    new delivery, and the per-column companion to the row-level
    :func:`warehouse_constraint_audit`.  The reference eyeballs the same
    facts via ad-hoc pandas ``info()``/``nunique()`` during ingest
    debugging; this is the queryized, oracle-checked form.

    Long-format output is one two-level aggregation branch per column,
    unioned — the same UNION-ALL shape as the oracle, not an UNPIVOT
    (DuckDB drops NULL cells by default).

    ROUND-12 OPTIMIZATION (guide §2.3): the previous single-pass form
    asked for 8 ``countDistinct`` in one aggregate, which Catalyst plans
    as an Expand — every input row is replicated 9× (one copy per
    distinct-aggregate group + one for the plain aggregates) before the
    partial HashAggregate.  The per-column branch form hashes each row
    once per column (same total hash work, no replication through one
    stage chain), the branches' scans are column-pruned to ONE column
    each (same total bytes as the old 8-column scan), and the 8 branches
    overlap as sibling stages of the one job.  Each branch's shuffle
    carries only that column's per-partition distinct values.  n_rows /
    n_nulls ride the same groupBy (sum of per-value counts), so the
    whole profile is still exactly one pass over each column.

    Scale shape: 8 column-pruned scans (= one full-width scan in bytes),
    8 vocabulary-sized exchanges, an 8-row union.  Exact distinct is the
    contract here (audit numbers end up in data-quality SLAs); the HLL
    family covers the approximate variant."""
    from functools import reduce

    from ..functions.money import ratio
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)

    def profile(c: str) -> DataFrame:
        per_val = txn.groupBy(c).agg(F.count("*").alias("cnt"))
        return per_val.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("n_nulls"),
            F.count(F.when(F.col(c).isNotNull(), 1)).alias("n_distinct"),
        ).select(F.lit(c).alias("column_name"), "n_rows", "n_nulls", "n_distinct")

    longf = reduce(
        DataFrame.unionByName, [profile(c) for c in PROFILE_COLUMNS]
    )
    return longf.select(
        "column_name",
        "n_rows",
        "n_nulls",
        ratio(
            F.col("n_nulls").cast("double"), F.col("n_rows").cast("double"), 4
        ).alias("null_rate"),
        "n_distinct",
        # cardinality ratio: 1.0 flags a key, ~0 flags an enum — the
        # profiling number that picks join keys and dimension columns
        ratio(
            F.col("n_distinct").cast("double"),
            F.col("n_rows").cast("double"),
            4,
        ).alias("distinct_rate"),
    ).orderBy("column_name")


def column_profile_audit_sql() -> str:
    from ..functions.money import ratio_sql
    from .transactions import transactions_sql

    selects = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, count(*) AS n_rows,\n"
        f"       CAST(sum(({c} IS NULL)::bigint) AS BIGINT) AS n_nulls,\n"
        f"       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct\n"
        f"FROM txn"
        for c in PROFILE_COLUMNS
    )
    return f"""
WITH txn AS ({transactions_sql()}),
longf AS (
{selects}
)
SELECT column_name, n_rows, n_nulls,
       {ratio_sql('n_nulls::double', 'n_rows::double', 4)} AS null_rate,
       n_distinct,
       {ratio_sql('n_distinct::double', 'n_rows::double', 4)} AS distinct_rate
FROM longf
ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# chi-square independence + Cramér's V
# ---------------------------------------------------------------------------


def chisq_category_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of revenue_category × data_source,
    with Cramér's V — "does payment channel mix differ by category", the
    canonical contingency question a multi-source ingest asks before
    trusting per-source extrapolations.  The statistic and V are
    reported without a p-value: χ² tail probability needs the incomplete
    gamma, which neither engine evaluates — V IS the effect size that
    answers the question (0 independent, 1 determined).

    Absent cells count: a (category, source) pair with zero rows
    contributes its full expected mass to χ², so the grid is completed
    by crossing the two bounded margins before the left join.

    Scale shape: one groupBy onto the r×c contingency table; everything
    after runs on ≤ r·c rows (both vocabularies config-bounded)."""
    from pyspark.sql import Window

    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    obs = txn.groupBy("revenue_category", "data_source").agg(
        F.count("*").alias("o")
    )
    rows = obs.groupBy("revenue_category").agg(F.sum("o").alias("row_tot"))
    cols = obs.groupBy("data_source").agg(F.sum("o").alias("col_tot"))
    grid = (
        rows.crossJoin(cols)  # bounded: categories × sources
        .join(obs, ["revenue_category", "data_source"], "left")
        .select(
            "revenue_category",
            "data_source",
            "row_tot",
            "col_tot",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    tot = Window.partitionBy()
    enriched = grid.select("*", F.sum("o").over(tot).alias("n"))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    term_nano = F.floor(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
        * 1000000000.0
        + 0.5
    ).cast("long")
    per_cell = enriched.withColumn("term_nano", term_nano)
    agg = per_cell.agg(
        F.max("n").alias("n"),
        F.countDistinct("revenue_category").alias("r"),
        F.countDistinct("data_source").alias("c"),
        (F.sum("term_nano") / 1000000000.0).alias("chi2"),
    )
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    mind = F.least(F.col("r") - 1, F.col("c") - 1)
    micro = lambda x: F.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "n",
        F.col("r").alias("n_categories"),
        F.col("c").alias("n_sources"),
        "chi2",
        dof.alias("dof"),
        F.when(
            mind > 0,
            micro(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n").cast("double") * mind.cast("double"))
                )
            ),
        ).alias("cramers_v"),
    )


def chisq_category_source_sql() -> str:
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
obs AS (
  SELECT revenue_category, data_source, count(*) AS o
  FROM txn GROUP BY 1, 2
),
rows_ AS (SELECT revenue_category, sum(o) AS row_tot FROM obs GROUP BY 1),
cols_ AS (SELECT data_source, sum(o) AS col_tot FROM obs GROUP BY 1),
grid AS (
  SELECT r.revenue_category, c.data_source, r.row_tot, c.col_tot,
         coalesce(o.o, 0) AS o
  FROM rows_ r CROSS JOIN cols_ c
  LEFT JOIN obs o USING (revenue_category, data_source)
),
enriched AS (
  SELECT *, sum(o) OVER () AS n FROM grid
),
terms AS (
  SELECT n, revenue_category, data_source,
         floor((o::double - row_tot::double * col_tot::double / n::double)
               * (o::double - row_tot::double * col_tot::double / n::double)
               / (row_tot::double * col_tot::double / n::double)
               * 1000000000.0 + 0.5)::bigint AS term_nano
  FROM enriched
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         count(DISTINCT revenue_category) AS r,
         count(DISTINCT data_source) AS c,
         sum(term_nano) / 1000000000.0 AS chi2
  FROM terms
)
SELECT n, r AS n_categories, c AS n_sources, chi2,
       (r - 1) * (c - 1) AS dof,
       CASE WHEN least(r - 1, c - 1) > 0
            THEN floor(sqrt(chi2 / (n::double * least(r - 1, c - 1)::double))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS cramers_v
FROM agg
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

import math as _math

# Benford expected shares for digits 1..9, micro-rounded once in Python so
# both engines compare against the SAME literals
BENFORD_MICRO: tuple[int, ...] = tuple(
    int(_math.floor(_math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5))
    for d in range(1, 10)
)


def benford_amount_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of transaction amounts — the
    classic fabricated-numbers screen (organic multiplicative amounts
    follow P(d) = log10(1+1/d); keyed-in or invented ones don't).
    Per digit 1-9: observed share of nonzero |cents| vs the Benford
    expectation and the signed deviation; digits the corpus never
    produces still appear with share 0 (the audit's whole point).

    First digits come from the DECIMAL STRING of |cents| — exact in both
    engines, no log10-at-a-power-of-ten edge to disagree on.

    Scale shape: one groupBy onto ≤ 9 digits, joined to a 9-row literal
    spine."""
    from ..functions.money import ratio, to_cents
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    cents = to_cents(F.col("total_amount"))
    digits = (
        txn.select(F.abs(cents).alias("a"))
        .filter(F.col("a") > 0)
        .select(F.substring(F.col("a").cast("string"), 1, 1).cast("int").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n_obs"))
    )
    spine = F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("d")
    grid = (
        txn.sparkSession.range(1)
        .select(spine)
        .join(digits, "d", "left")
        .select("d", F.coalesce("n_obs", F.lit(0)).alias("n_obs"))
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    benford = F.element_at(
        F.array(*[F.lit(b / 1_000_000.0) for b in BENFORD_MICRO]), F.col("d")
    )
    return (
        grid.select(
            "*", F.sum("n_obs").over(tot).alias("n_total")
        )
        .select(
            F.col("d").alias("first_digit"),
            "n_obs",
            ratio(
                F.col("n_obs").cast("double") * 1.0,
                F.col("n_total").cast("double"),
                6,
            ).alias("obs_share"),
            benford.alias("benford_share"),
            (
                ratio(
                    F.col("n_obs").cast("double") * 1.0,
                    F.col("n_total").cast("double"),
                    6,
                )
                - benford
            ).alias("deviation"),
        )
        .orderBy("first_digit")
    )


def benford_amount_audit_sql() -> str:
    from ..functions.money import ratio_sql, to_cents_sql
    from .transactions import transactions_sql

    b_list = ", ".join(str(b / 1_000_000.0) for b in BENFORD_MICRO)
    return f"""
WITH txn AS ({transactions_sql()}),
digits AS (
  SELECT substr(abs({to_cents_sql('total_amount')})::varchar, 1, 1)::int AS d,
         count(*) AS n_obs
  FROM txn WHERE abs({to_cents_sql('total_amount')}) > 0
  GROUP BY 1
),
grid AS (
  SELECT s.d, coalesce(digits.n_obs, 0) AS n_obs
  FROM (SELECT unnest(range(1, 10)) AS d) s
  LEFT JOIN digits USING (d)
),
tot AS (
  SELECT *, sum(n_obs) OVER () AS n_total FROM grid
)
SELECT d AS first_digit, CAST(n_obs AS BIGINT) AS n_obs,
       {ratio_sql('n_obs::double * 1.0', 'n_total::double', 6)} AS obs_share,
       list_extract([{b_list}]::double[], d) AS benford_share,
       ({ratio_sql('n_obs::double * 1.0', 'n_total::double', 6)}
        - list_extract([{b_list}]::double[], d)) AS deviation
FROM tot
ORDER BY first_digit
"""


def mutual_info_category_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between revenue_category and data_source,
    with both marginal entropies and the normalized MI — the information-
    theoretic strength companion to :func:`chisq_category_source` (χ²
    asks "is there dependence"; MI says HOW MUCH, in the same units the
    token-entropy family already reports).  NMI = MI/min(H_cat, H_src),
    NULL when either marginal is degenerate (single value ⇒ H = 0).

    Determinism: probabilities come from exact integer counts; each
    p·ln(…) term is nano-floored to int64 BEFORE summation (the
    source_token_entropy / PSI discipline — summation-order immune, and
    the only transcendental is ln, applied identically in both engines).

    Scale shape: one groupBy onto the bounded r×c table; every window
    and sum after runs on ≤ r·c rows."""
    from pyspark.sql import Window

    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    obs = txn.groupBy("revenue_category", "data_source").agg(
        F.count("*").alias("o")
    )
    tot = Window.partitionBy()
    wr = Window.partitionBy("revenue_category")
    wc = Window.partitionBy("data_source")
    enriched = obs.select(
        "*",
        F.sum("o").over(tot).alias("n"),
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
    )
    nd = F.col("n").cast("double")
    p_xy = F.col("o").cast("double") / nd
    lift = (
        F.col("o").cast("double")
        * nd
        / (F.col("row_tot").cast("double") * F.col("col_tot").cast("double"))
    )
    mi_nano = F.floor(p_xy * F.log(lift) * 1000000000.0 + 0.5).cast("long")
    # marginal entropy terms, each counted once per distinct margin value:
    # tag the first cell of each margin partition
    first_in_row = F.row_number().over(wr.orderBy("data_source")) == 1
    first_in_col = F.row_number().over(wc.orderBy("revenue_category")) == 1
    hr_nano = F.when(
        first_in_row,
        F.floor(
            -(F.col("row_tot").cast("double") / nd)
            * F.log(F.col("row_tot").cast("double") / nd)
            * 1000000000.0
            + 0.5
        ).cast("long"),
    ).otherwise(0)
    hc_nano = F.when(
        first_in_col,
        F.floor(
            -(F.col("col_tot").cast("double") / nd)
            * F.log(F.col("col_tot").cast("double") / nd)
            * 1000000000.0
            + 0.5
        ).cast("long"),
    ).otherwise(0)
    agg = enriched.select(
        "n",
        mi_nano.alias("mi_nano"),
        hr_nano.alias("hr_nano"),
        hc_nano.alias("hc_nano"),
    ).groupBy("n").agg(
        (F.sum("mi_nano") / 1000000000.0).alias("mi_nats"),
        (F.sum("hr_nano") / 1000000000.0).alias("h_category"),
        (F.sum("hc_nano") / 1000000000.0).alias("h_source"),
    )
    minh = F.least(F.col("h_category"), F.col("h_source"))
    micro = lambda x: F.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "n",
        "mi_nats",
        "h_category",
        "h_source",
        F.when(minh > 0, micro(F.col("mi_nats") / minh)).alias("nmi"),
    )


def mutual_info_category_source_sql() -> str:
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()}),
obs AS (
  SELECT revenue_category, data_source, count(*) AS o
  FROM txn GROUP BY 1, 2
),
enriched AS (
  SELECT *,
         sum(o) OVER () AS n,
         sum(o) OVER (PARTITION BY revenue_category) AS row_tot,
         sum(o) OVER (PARTITION BY data_source) AS col_tot,
         row_number() OVER (PARTITION BY revenue_category
                            ORDER BY data_source) AS rn_r,
         row_number() OVER (PARTITION BY data_source
                            ORDER BY revenue_category) AS rn_c
  FROM obs
),
terms AS (
  SELECT n,
         floor((o::double / n::double)
               * ln(o::double * n::double
                    / (row_tot::double * col_tot::double))
               * 1000000000.0 + 0.5)::bigint AS mi_nano,
         CASE WHEN rn_r = 1
              THEN floor(-(row_tot::double / n::double)
                         * ln(row_tot::double / n::double)
                         * 1000000000.0 + 0.5)::bigint ELSE 0 END AS hr_nano,
         CASE WHEN rn_c = 1
              THEN floor(-(col_tot::double / n::double)
                         * ln(col_tot::double / n::double)
                         * 1000000000.0 + 0.5)::bigint ELSE 0 END AS hc_nano
  FROM enriched
),
agg AS (
  SELECT CAST(n AS BIGINT) AS n,
         sum(mi_nano) / 1000000000.0 AS mi_nats,
         sum(hr_nano) / 1000000000.0 AS h_category,
         sum(hc_nano) / 1000000000.0 AS h_source
  FROM terms GROUP BY n
)
SELECT n, mi_nats, h_category, h_source,
       CASE WHEN least(h_category, h_source) > 0
            THEN floor(mi_nats / least(h_category, h_source)
                       * 1000000.0 + 0.5) / 1000000.0
       END AS nmi
FROM agg
"""


def jsd_source_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (nats and bits) between each data
    source's revenue-category distribution and the corpus-wide one — the
    bounded, symmetric "how different is this source's mix" number that
    PSI (unbounded, asymmetric, bin-fragile) is usually a stand-in for;
    0 = identical mix, ln 2 nats = disjoint support.

    Determinism: P, Q and M = (P+Q)/2 come from exact integer counts;
    each p·ln(p/m) term is nano-floored to int64 BEFORE summation (the
    mutual_info / PSI discipline), and absent cells contribute their
    exact Q·ln 2 mass via the zero-filled category×source grid — both
    engines materialize the same grid, so absent-cell handling can't
    diverge.

    Scale shape: one groupBy onto the bounded category×source table;
    the grid, margins and sums all run on ≤ r·c rows."""
    from pyspark.sql import Window

    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    obs = txn.groupBy("revenue_category", "data_source").agg(F.count("*").alias("o"))
    cats = obs.select("revenue_category").distinct()
    srcs = obs.select("data_source").distinct()
    grid = cats.crossJoin(F.broadcast(srcs)).join(
        obs, ["revenue_category", "data_source"], "left"
    ).select(
        "revenue_category", "data_source", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    tot = Window.partitionBy()
    wc = Window.partitionBy("revenue_category")
    ws = Window.partitionBy("data_source")
    enriched = grid.select(
        "*",
        F.sum("o").over(tot).alias("n"),
        F.sum("o").over(wc).alias("cat_tot"),
        F.sum("o").over(ws).alias("src_tot"),
    )
    p = F.col("o").cast("double") / F.col("src_tot").cast("double")
    q = F.col("cat_tot").cast("double") / F.col("n").cast("double")
    m = (p + q) / 2.0
    term_p = F.when(
        F.col("o") > 0, F.floor(p * F.log(p / m) * 1000000000.0 + 0.5).cast("long")
    ).otherwise(F.lit(0))
    term_q = F.floor(q * F.log(q / m) * 1000000000.0 + 0.5).cast("long")
    agg = enriched.select(
        "data_source", "src_tot", term_p.alias("tp"), term_q.alias("tq")
    ).groupBy("data_source", "src_tot").agg(
        F.sum("tp").alias("sp"), F.sum("tq").alias("sq")
    )
    jsd_nats = (F.col("sp") + F.col("sq")).cast("double") / 2.0e9
    micro = lambda x: F.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "data_source",
        F.col("src_tot").alias("n_txns"),
        micro(jsd_nats).alias("jsd_nats"),
        micro(jsd_nats / F.log(F.lit(2.0))).alias("jsd_bits"),
    ).orderBy("data_source")


def jsd_source_categories_sql() -> str:
    return """
WITH txn AS ({txn}),
obs AS (
  SELECT revenue_category, data_source, count(*) AS o
  FROM txn GROUP BY 1, 2
),
grid AS (
  SELECT c.revenue_category, s.data_source, coalesce(o.o, 0) AS o
  FROM (SELECT DISTINCT revenue_category FROM obs) c
  CROSS JOIN (SELECT DISTINCT data_source FROM obs) s
  LEFT JOIN obs o USING (revenue_category, data_source)
),
enriched AS (
  SELECT *,
         sum(o) OVER () AS n,
         sum(o) OVER (PARTITION BY revenue_category) AS cat_tot,
         sum(o) OVER (PARTITION BY data_source) AS src_tot
  FROM grid
),
terms AS (
  SELECT data_source, src_tot,
         CASE WHEN o > 0
              THEN CAST(floor((o::double / src_tot::double)
                   * ln((o::double / src_tot::double)
                        / ((o::double / src_tot::double
                            + cat_tot::double / n::double) / 2.0))
                   * 1000000000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS tp,
         CAST(floor((cat_tot::double / n::double)
              * ln((cat_tot::double / n::double)
                   / ((o::double / src_tot::double
                       + cat_tot::double / n::double) / 2.0))
              * 1000000000.0 + 0.5) AS BIGINT) AS tq
  FROM enriched
),
agg AS (
  SELECT data_source, src_tot, sum(tp) AS sp, sum(tq) AS sq
  FROM terms GROUP BY 1, 2
)
SELECT data_source, CAST(src_tot AS BIGINT) AS n_txns,
       floor((sp + sq)::double / 2.0e9 * 1000000.0 + 0.5) / 1000000.0 AS jsd_nats,
       floor((sp + sq)::double / 2.0e9 / ln(2.0) * 1000000.0 + 0.5) / 1000000.0
         AS jsd_bits
FROM agg
ORDER BY data_source
""".format(txn=_txn_sql())


def _txn_sql() -> str:
    from .transactions import transactions_sql

    return transactions_sql()


def capture_recapture_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the total customer population
    from every pair of data sources, graded against the KNOWN truth: the
    two sources are two "captures", their customer overlap the "recapture",
    N̂ = (n_a+1)(n_b+1)/(m+1) − 1 with the Chapman standard error — the
    classic how-many-are-we-missing estimator for partial-coverage
    sources, and (because the fixture knows the real total) a built-in
    eval of how badly source-correlation biases it.

    Exactness: all counts are exact distinct integers; N̂ and the se are
    single double expressions over them, micro-rounded; a zero overlap
    still estimates (the +1s are the point of Chapman's correction).

    Scale shape: one distinct collapse per (source, customer); the pair
    stage is source-pair joins over per-source customer sets — each side
    a semi-collapsed (source, customer) frame, the overlap an equi join
    co-hashed on customer_id; sources are a bounded vocabulary."""
    from ..functions.money import micro
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    sc = txn.select("data_source", "customer_id").distinct()
    sizes = sc.groupBy("data_source").agg(F.count("*").alias("n"))
    a = sc.select(F.col("data_source").alias("src_a"), "customer_id")
    b = sc.select(F.col("data_source").alias("src_b"), "customer_id")
    overlap = (
        a.join(b, "customer_id")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("m"))
    )
    truth = txn.agg(F.countDistinct("customer_id").alias("n_true"))
    j = (
        overlap.join(
            F.broadcast(sizes.select(F.col("data_source").alias("src_a"), F.col("n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("data_source").alias("src_b"), F.col("n").alias("n_b"))),
            "src_b",
        )
        .join(F.broadcast(truth))
    )
    na, nb, m = (
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("m").cast("double"),
    )
    nhat = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
    se = F.sqrt(
        (na + 1.0)
        * (nb + 1.0)
        * (na - m)
        * (nb - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return j.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        F.col("m").alias("n_overlap"),
        micro(nhat).alias("chapman_estimate"),
        micro(se).alias("chapman_se"),
        "n_true",
        micro((nhat - F.col("n_true").cast("double")) / F.col("n_true").cast("double")).alias(
            "relative_bias"
        ),
    ).orderBy("src_a", "src_b")


def capture_recapture_population_sql() -> str:
    from ..functions.money import micro_sql
    from .transactions import transactions_sql

    nhat = "((n_a::double + 1.0) * (n_b::double + 1.0) / (m::double + 1.0) - 1.0)"
    se = (
        "sqrt((n_a::double + 1.0) * (n_b::double + 1.0)"
        " * (n_a::double - m::double) * (n_b::double - m::double)"
        " / ((m::double + 1.0) * (m::double + 1.0) * (m::double + 2.0)))"
    )
    return f"""
WITH txn AS ({transactions_sql()}),
sc AS (SELECT DISTINCT data_source, customer_id FROM txn),
sizes AS (SELECT data_source, count(*) AS n FROM sc GROUP BY 1),
overlap AS (
  SELECT a.data_source AS src_a, b.data_source AS src_b, count(*) AS m
  FROM sc a JOIN sc b ON a.customer_id = b.customer_id
  WHERE a.data_source < b.data_source
  GROUP BY 1, 2
),
truth AS (SELECT count(DISTINCT customer_id) AS n_true FROM txn)
SELECT o.src_a, o.src_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(o.m AS BIGINT) AS n_overlap,
       {micro_sql(nhat.replace('n_a', 'sa.n').replace('n_b', 'sb.n').replace('m::double', 'o.m::double'))} AS chapman_estimate,
       {micro_sql(se.replace('n_a', 'sa.n').replace('n_b', 'sb.n').replace('m::double', 'o.m::double'))} AS chapman_se,
       CAST(t.n_true AS BIGINT) AS n_true,
       {micro_sql(f"({nhat.replace('n_a', 'sa.n').replace('n_b', 'sb.n').replace('m::double', 'o.m::double')} - t.n_true::double) / t.n_true::double")} AS relative_bias
FROM overlap o
JOIN sizes sa ON o.src_a = sa.data_source
JOIN sizes sb ON o.src_b = sb.data_source
CROSS JOIN truth t
ORDER BY o.src_a, o.src_b
"""
