"""Customer/identity domain: normalization, dedup detection, fuzzy matching,
enrichment joins, and the family graph.

Realizes FIXTURES.md F4 on ``customer ⋈ nation``: synthetic emails (with
deterministic TLD typos for the typo-correction path), multi-format phones
(for E.164 normalization), shared last names + a parent mapping (for the
family-heuristic joins).  Re-expresses the reference's identity stack:

- email/phone/name normalizers (reference customer_matching.py:19-101)
- TLD-typo correction map (:131-187)
- duplicate-email detection (reference build_customer_master.py:139-153)
- Levenshtein fuzzy email matching blocked by corrected domain (:104-208,
  tier-3 match :432-445)
- identifiers table union (reference customer_matching.py:473-481)
- parent-contact enrichment via self-join + coalesce (reference
  build_customer_master.py:171-209)
- has-youth semi-join (:254-255), purchased-but-never-checked-in anti-join
  (reference build_purchased_not_checkedin.py:63-108)
- family edges with keep-best-confidence dedup (reference
  build_family_relationships.py:276-356 heuristic links, :455-462 dedup)

Synthetic identity mapping (all pure column expressions, SQL-mirrored):

    local     = 'member.' || lpad(c_custkey // 2, 7, '0')
                || ('x' if odd and custkey % 5 != 0)   -- near-dup vs exact-dup
    tld       = '.con' if custkey % 13 == 0 else '.com'  (typo to correct)
    email     = NULL for children (custkey % 7 == 0 and custkey > 0)
    phone     = 4 deterministic US formats by custkey % 4
    last_name = 'Fam' || custkey % 40        (shared across households)
    parent_id = custkey - 1 for children

Scale notes: the fuzzy join blocks on corrected domain exactly like the
reference; at 100 TB swap the in-block quadratic probe for the MinHash/LSH
operators in operators/dedup.py (same blocking contract).  Every lookup dim
(nation, parents) is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config
from ..functions.money import dec38
from ..functions.text import (
    NORMALIZE_PHONE_SQL,
    correct_tld,
    correct_tld_sql,
    levenshtein_similarity,
    normalize_phone,
)
from ..io import load_table, materialized

# ---------------------------------------------------------------------------
# builder (F4)
# ---------------------------------------------------------------------------


@materialized("customers")
def build_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension with synthesized contact fields + normalized
    email/phone/TLD columns (reference customer_matching.py normalization
    tier), per the FIXTURES.md mapping."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    k = F.col("c_custkey")
    is_child = (k % 7 == 0) & (k > 0)
    local = F.concat(
        F.lit("member."),
        F.lpad((k / F.lit(2)).cast("long").cast("string"), 7, "0"),
        F.when((k % 2 == 1) & (k % 5 != 0), F.lit("x")).otherwise(F.lit("")),
    )
    tld = F.when(k % 13 == 0, ".con").otherwise(".com")
    email = F.when(is_child, F.lit(None).cast("string")).otherwise(
        F.concat(local, F.lit("@"), F.lower(F.col("n_name")), tld)
    )
    digits7 = F.lpad((k % 10000000).cast("string"), 7, "0")
    phone = (
        F.when(k % 4 == 0, F.concat(F.lit("(512) "), F.substring(digits7, 1, 3), F.lit("-"), F.substring(digits7, 4, 4)))
        .when(k % 4 == 1, F.concat(F.lit("512-"), F.substring(digits7, 1, 3), F.lit("-"), F.substring(digits7, 4, 4)))
        .when(k % 4 == 2, F.concat(F.lit("+1512"), digits7))
        .otherwise(F.concat(F.lit("512"), digits7))
    )
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        k.alias("customer_id"),
        F.concat(F.lit("C"), k.cast("string")).alias("first_name"),
        F.concat(F.lit("Fam"), (k % 40).cast("string")).alias("last_name"),
        email.alias("email"),
        phone.alias("phone"),
        is_child.alias("is_child"),
        F.when(is_child, k - 1).alias("parent_customer_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acct_balance"),
        F.lower(F.col("n_name")).alias("nation"),
    )
    domain = F.substring_index(F.col("email"), "@", -1)
    return (
        df.withColumn("email_normalized", F.lower(F.trim(F.col("email"))))
        .withColumn("email_domain", correct_tld(domain, config.TLD_TYPO_MAP))
        .withColumn("phone_e164", normalize_phone(F.col("phone")))
    )


def customers_sql() -> str:
    domain_expr = "split_part(email, '@', 2)"
    corrected = correct_tld_sql(domain_expr, config.TLD_TYPO_MAP)
    phone_norm = NORMALIZE_PHONE_SQL.format(c="phone")
    return f"""
WITH base AS (
  SELECT
    c_custkey AS customer_id,
    'C' || c_custkey AS first_name,
    'Fam' || (c_custkey % 40) AS last_name,
    CASE WHEN c_custkey % 7 = 0 AND c_custkey > 0 THEN NULL
         ELSE 'member.' || lpad((c_custkey // 2)::varchar, 7, '0')
              || (CASE WHEN c_custkey % 2 = 1 AND c_custkey % 5 != 0 THEN 'x' ELSE '' END)
              || '@' || lower(n_name)
              || (CASE WHEN c_custkey % 13 = 0 THEN '.con' ELSE '.com' END)
    END AS email,
    CASE c_custkey % 4
      WHEN 0 THEN '(512) ' || substring(lpad((c_custkey % 10000000)::varchar, 7, '0'), 1, 3)
                  || '-' || substring(lpad((c_custkey % 10000000)::varchar, 7, '0'), 4, 4)
      WHEN 1 THEN '512-' || substring(lpad((c_custkey % 10000000)::varchar, 7, '0'), 1, 3)
                  || '-' || substring(lpad((c_custkey % 10000000)::varchar, 7, '0'), 4, 4)
      WHEN 2 THEN '+1512' || lpad((c_custkey % 10000000)::varchar, 7, '0')
      ELSE '512' || lpad((c_custkey % 10000000)::varchar, 7, '0')
    END AS phone,
    (c_custkey % 7 = 0 AND c_custkey > 0) AS is_child,
    CASE WHEN c_custkey % 7 = 0 AND c_custkey > 0 THEN c_custkey - 1 END AS parent_customer_id,
    c_mktsegment AS segment,
    c_acctbal AS acct_balance,
    lower(n_name) AS nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT *,
  lower(trim(email, ' ')) AS email_normalized,
  CASE WHEN email IS NULL THEN NULL ELSE {corrected} END AS email_domain,
  {phone_norm} AS phone_e164
FROM base
"""


# ---------------------------------------------------------------------------
# dedup detection + fuzzy matching
# ---------------------------------------------------------------------------


def duplicate_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: normalized emails shared by >1 customer."""
    cust = build_customers(spark, sf_dir).filter(F.col("email_normalized").isNotNull())
    return (
        cust.groupBy("email_normalized")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.sort_array(F.collect_list("customer_id")), ",").alias("customer_ids"),
        )
        .filter(F.col("n_customers") > 1)
        .orderBy("email_normalized")
    )


def duplicate_emails_sql() -> str:
    return f"""
WITH cust AS ({customers_sql()})
SELECT email_normalized, count(*) AS n_customers,
       array_to_string(list_sort(list(customer_id)), ',') AS customer_ids
FROM cust WHERE email_normalized IS NOT NULL
GROUP BY email_normalized HAVING count(*) > 1
ORDER BY email_normalized
"""


FUZZY_THRESHOLD = 0.9
NEIGHBORHOOD = 3


def fuzzy_email_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: near-duplicate emails — Levenshtein similarity ≥ 0.9 on the local
    part, blocked by corrected domain (the reference's tier-3 email match,
    customer_matching.py:432-445) + SORTED-NEIGHBORHOOD candidate generation:
    rank locals within each domain and only compare rows within ±NEIGHBORHOOD
    ranks.  Candidates scale O(N·w) instead of O(N²/domains) — the classic
    record-linkage windowing that keeps this join feasible at 100 TB (near-
    identical strings sort adjacently).  Excludes exact-equal normalized
    emails (those are A7 duplicates)."""
    from pyspark.sql import Window

    cust = (
        build_customers(spark, sf_dir)
        .filter(F.col("email_normalized").isNotNull())
        .select(
            "customer_id",
            F.substring_index("email_normalized", "@", 1).alias("local"),
            "email_domain",
            "email_normalized",
        )
    )
    w = Window.partitionBy("email_domain").orderBy("local", "customer_id")
    ranked = cust.withColumn("rank", F.row_number().over(w))
    # explode each row into its NEIGHBORHOOD probe ranks so the candidate
    # join is FULLY equi on (domain, rank) — O(N·w) rows, no in-block
    # quadratic (a bare rank-band predicate would be a post-filter on a
    # domain-only hash join)
    probes = ranked.withColumn(
        "probe_rank",
        F.explode(F.array(*[F.col("rank") + k for k in range(1, NEIGHBORHOOD + 1)])),
    )
    a = probes.alias("a")
    b = ranked.alias("b")
    sim = levenshtein_similarity(F.col("a.local"), F.col("b.local"))
    pairs = a.join(
        b,
        (F.col("a.email_domain") == F.col("b.email_domain"))
        & (F.col("b.rank") == F.col("a.probe_rank"))
        & (F.col("a.email_normalized") != F.col("b.email_normalized")),
    ).withColumn("similarity", sim).filter(F.col("similarity") >= FUZZY_THRESHOLD)
    lo = F.least(F.col("a.customer_id"), F.col("b.customer_id"))
    hi = F.greatest(F.col("a.customer_id"), F.col("b.customer_id"))
    return (
        pairs.select(
            lo.alias("customer_id_1"),
            hi.alias("customer_id_2"),
            F.when(lo == F.col("a.customer_id"), F.col("a.email_normalized"))
            .otherwise(F.col("b.email_normalized"))
            .alias("email_1"),
            F.when(lo == F.col("a.customer_id"), F.col("b.email_normalized"))
            .otherwise(F.col("a.email_normalized"))
            .alias("email_2"),
            "similarity",
        )
        .orderBy("customer_id_1", "customer_id_2")
    )


def fuzzy_email_matches_sql() -> str:
    sim = (
        "floor((1.0 - levenshtein(a.local, b.local)::double"
        " / greatest(length(a.local), length(b.local))) * 10000 + 0.5) / 10000"
    )
    return f"""
WITH cust AS ({customers_sql()}),
pool AS (
  SELECT customer_id, split_part(email_normalized, '@', 1) AS local,
         email_domain, email_normalized
  FROM cust WHERE email_normalized IS NOT NULL
),
ranked AS (
  SELECT customer_id, local, email_domain, email_normalized,
         row_number() OVER (PARTITION BY email_domain ORDER BY local, customer_id) AS rank
  FROM pool
)
SELECT least(a.customer_id, b.customer_id) AS customer_id_1,
       greatest(a.customer_id, b.customer_id) AS customer_id_2,
       CASE WHEN a.customer_id < b.customer_id THEN a.email_normalized
            ELSE b.email_normalized END AS email_1,
       CASE WHEN a.customer_id < b.customer_id THEN b.email_normalized
            ELSE a.email_normalized END AS email_2,
       {sim} AS similarity
FROM ranked a JOIN ranked b
  ON a.email_domain = b.email_domain
 AND b.rank > a.rank AND b.rank <= a.rank + {NEIGHBORHOOD}
 AND a.email_normalized != b.email_normalized
WHERE {sim} >= {FUZZY_THRESHOLD}
ORDER BY customer_id_1, customer_id_2
"""


def identifiers_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier × type union table (reference customer_identifiers,
    customer_matching.py:473-481) via unionByName (U1)."""
    cust = build_customers(spark, sf_dir)
    emails = cust.filter(F.col("email_normalized").isNotNull()).select(
        "customer_id",
        F.lit("email").alias("identifier_type"),
        F.col("email_normalized").alias("value"),
    )
    phones = cust.filter(F.col("phone_e164").isNotNull()).select(
        "customer_id",
        F.lit("phone").alias("identifier_type"),
        F.col("phone_e164").alias("value"),
    )
    names = cust.select(
        "customer_id",
        F.lit("name").alias("identifier_type"),
        F.lower(F.concat_ws(" ", "first_name", "last_name")).alias("value"),
    )
    return emails.unionByName(phones).unionByName(names)


def identifiers_build_sql() -> str:
    return f"""
WITH cust AS ({customers_sql()})
SELECT customer_id, 'email' AS identifier_type, email_normalized AS value
FROM cust WHERE email_normalized IS NOT NULL
UNION ALL
SELECT customer_id, 'phone', phone_e164 FROM cust WHERE phone_e164 IS NOT NULL
UNION ALL
SELECT customer_id, 'name', lower(concat_ws(' ', first_name, last_name)) FROM cust
"""


# ---------------------------------------------------------------------------
# enrichment / semi / anti joins
# ---------------------------------------------------------------------------


def parent_contact_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: children inherit contact info from their parent via a master↔master
    self-join + coalesce (reference parent-contact lookup,
    build_customer_master.py:171-209)."""
    cust = build_customers(spark, sf_dir)
    parents = cust.select(
        F.col("customer_id").alias("p_id"),
        F.col("email_normalized").alias("p_email"),
        F.col("phone_e164").alias("p_phone"),
    )
    return (
        cust.filter(F.col("is_child"))
        .join(F.broadcast(parents), F.col("parent_customer_id") == F.col("p_id"), "left")
        .select(
            "customer_id",
            "parent_customer_id",
            F.coalesce("email_normalized", "p_email").alias("contact_email"),
            F.coalesce("phone_e164", "p_phone").alias("contact_phone"),
            (F.col("email_normalized").isNull() & F.col("p_email").isNotNull()).alias(
                "used_parent_email"
            ),
        )
        .orderBy("customer_id")
    )


def parent_contact_enrichment_sql() -> str:
    return f"""
WITH cust AS ({customers_sql()})
SELECT c.customer_id, c.parent_customer_id,
       coalesce(c.email_normalized, p.email_normalized) AS contact_email,
       coalesce(c.phone_e164, p.phone_e164) AS contact_phone,
       (c.email_normalized IS NULL AND p.email_normalized IS NOT NULL) AS used_parent_email
FROM cust c
LEFT JOIN cust p ON c.parent_customer_id = p.customer_id
WHERE c.is_child
ORDER BY c.customer_id
"""


def customers_with_youth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 left-semi: customers who are a parent of at least one child."""
    cust = build_customers(spark, sf_dir)
    parent_ids = cust.filter(F.col("is_child")).select(
        F.col("parent_customer_id").alias("customer_id")
    )
    return (
        cust.join(parent_ids, "customer_id", "left_semi")
        .select("customer_id", "last_name", "nation", "segment")
        .orderBy("customer_id")
    )


def customers_with_youth_sql() -> str:
    return f"""
WITH cust AS ({customers_sql()})
SELECT customer_id, last_name, nation, segment
FROM cust
WHERE customer_id IN (SELECT parent_customer_id FROM cust WHERE is_child)
ORDER BY customer_id
"""


def purchasers_never_checked_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left-anti: customers with purchases (transactions) but no checkin
    ever (reference build_purchased_not_checkedin.py:63-108), rolled up."""
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir).filter(~F.col("is_refund"))
    ck = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("customer_id"))
    from ..functions.money import sum_money

    never = txn.join(ck, "customer_id", "left_anti")
    return (
        never.groupBy("customer_id")
        .agg(
            F.count("*").alias("n_purchases"),
            sum_money(F.col("total_amount")).alias("total_spend"),
        )
        .orderBy("customer_id")
    )


def purchasers_never_checked_in_sql() -> str:
    from .transactions import transactions_sql

    return f"""
WITH txn AS ({transactions_sql()})
SELECT customer_id, count(*) AS n_purchases,
       sum(CAST(floor(total_amount * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_spend
FROM txn
WHERE NOT is_refund
  AND customer_id NOT IN (SELECT user_id FROM events)
GROUP BY customer_id
ORDER BY customer_id
"""


# ---------------------------------------------------------------------------
# family graph (J12 heuristic + A9 keep-best dedup)
# ---------------------------------------------------------------------------

CONFIDENCE_RANK = {"high": 3, "medium": 2, "low": 1}


@materialized("family_relationships")
def family_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family edges from two sources — the direct parent mapping (high
    confidence) and the last-name heuristic (adult shares a child's last
    name, low confidence; reference build_family_relationships.py:276-356) —
    unioned then deduped keep-best-confidence per (parent, child) (A9,
    reference :455-462).

    Materialized: the reference persists this as its own warehouse table
    (customers/family_relationships.csv, config.py catalog) precisely
    because the master build and several reports all consume it; re-deriving
    the last-name candidate join per consumer was the customer_master
    regression flagged in round 3."""
    cust = build_customers(spark, sf_dir)
    children = cust.filter(F.col("is_child")).select(
        F.col("customer_id").alias("child_customer_id"),
        F.col("parent_customer_id").alias("direct_parent_id"),
        F.col("last_name").alias("child_last_name"),
    )
    direct = children.select(
        F.col("direct_parent_id").alias("parent_customer_id"),
        "child_customer_id",
        F.lit("parent_child").alias("relationship_type"),
        F.lit("high").alias("confidence"),
        F.lit("direct_parent").alias("source"),
    )
    adults = cust.filter(~F.col("is_child")).select(
        F.col("customer_id").alias("adult_id"), F.col("last_name").alias("adult_last_name")
    )
    heuristic = (
        children.join(adults, children.child_last_name == adults.adult_last_name)
        .filter(F.col("adult_id") != F.col("child_customer_id"))
        .select(
            F.col("adult_id").alias("parent_customer_id"),
            "child_customer_id",
            F.lit("parent_child").alias("relationship_type"),
            F.lit("low").alias("confidence"),
            F.lit("last_name_match").alias("source"),
        )
    )
    edges = direct.unionByName(heuristic)
    from pyspark.sql import Window

    conf_rank = (
        F.when(F.col("confidence") == "high", 3)
        .when(F.col("confidence") == "medium", 2)
        .otherwise(1)
    )
    w = Window.partitionBy("parent_customer_id", "child_customer_id").orderBy(
        F.desc("conf_rank"), "source"
    )
    return (
        edges.withColumn("conf_rank", conf_rank)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "conf_rank")
        .orderBy("parent_customer_id", "child_customer_id")
    )


def family_relationships_sql() -> str:
    return f"""
WITH cust AS ({customers_sql()}),
children AS (
  SELECT customer_id AS child_customer_id, parent_customer_id AS direct_parent_id,
         last_name AS child_last_name
  FROM cust WHERE is_child
),
direct AS (
  SELECT direct_parent_id AS parent_customer_id, child_customer_id,
         'parent_child' AS relationship_type, 'high' AS confidence,
         'direct_parent' AS source
  FROM children
),
heuristic AS (
  SELECT a.customer_id AS parent_customer_id, c.child_customer_id,
         'parent_child' AS relationship_type, 'low' AS confidence,
         'last_name_match' AS source
  FROM children c
  JOIN cust a ON NOT a.is_child AND a.last_name = c.child_last_name
  WHERE a.customer_id != c.child_customer_id
),
edges AS (SELECT * FROM direct UNION ALL SELECT * FROM heuristic),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY parent_customer_id, child_customer_id
    ORDER BY (CASE confidence WHEN 'high' THEN 3 WHEN 'medium' THEN 2 ELSE 1 END) DESC, source
  ) AS rn
  FROM edges
)
SELECT parent_customer_id, child_customer_id, relationship_type, confidence, source
FROM ranked WHERE rn = 1
ORDER BY parent_customer_id, child_customer_id
"""


# ---------------------------------------------------------------------------
# J10: pass-transfer grammar parse + fuzzy NAME join
# ---------------------------------------------------------------------------

# o_orderpriority -> transferred pass product (grammar left-hand side)
PASS_NAME_BY_PRIORITY = {
    "1-URGENT": "5 Climb Punch Pass",
    "2-HIGH": "Guest Pass",
    "3-MEDIUM": "10 Punch Pass",
    "4-NOT SPECIFIED": "Fitness Class Pass",
    "5-LOW": "2 Visit Pass",
}
TRANSFER_MOD = 11  # orders with o_orderkey % 11 == 0 carry a transfer note
NAME_LEV_MAX = 1  # levenshtein fallback tolerance (reference tier-2 name match)


def _delete1_keys(col: Column) -> Column:
    """Deletion-neighborhood index keys for edit-distance-1 blocking:
    ``{lower(s)} ∪ {lower(s) with one character deleted}`` (SymSpell /
    FastSS).  Any two strings with levenshtein distance <= 1 share at least
    one key, so an equi-join on these keys is a lossless candidate
    generator for a lev<=1 match — with candidate volume proportional to
    the number of true near-matches instead of the block size."""
    s = F.lower(col)
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, F.length(s))
        ),
    )
    return F.array_distinct(F.concat(F.array(s), deletes))


def pass_transfer_name_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass-transfer grammar parse + fuzzy name join (J10).

    The reference parses ``'<pass> from <name> (<n> remaining)'`` out of
    transaction descriptions (parse_pass_transfers.py:79-102) and then
    resolves the extracted giver name against the customer roster by
    normalized-name equality with a levenshtein fallback, blocked by last
    name (parse_pass_transfers.py:217-260, customer_events_builder.py:77-85).

    Here: transfer descriptions are synthesized onto every TRANSFER_MOD-th
    order from the giver's real name — with a deterministic leading-letter
    typo on every third giver, so both the exact (lev=0) and fuzzy (lev=1)
    branches carry rows — parsed with the shared grammar
    (functions/grammar.py), then matched: candidates are generated by an
    equi-join on the last-name block (never all-pairs), scored by
    levenshtein on the first name, and deduped keep-best (lowest distance,
    then lowest customer_id) per transfer — A9 keep-best-by-rank."""
    from pyspark.sql import Window

    from ..functions.grammar import parse_pass_transfer
    from ..functions.text import map_lookup

    cust = build_customers(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % TRANSFER_MOD == 0
    )
    giver = cust.select(
        F.col("customer_id").alias("giver_id"),
        F.col("first_name").alias("g_first"),
        F.col("last_name").alias("g_last"),
    )
    base = orders.join(giver, orders.o_custkey == giver.giver_id)
    display_first = F.when(
        F.col("giver_id") % 3 == 0,
        F.concat(F.lit("K"), F.substring(F.col("g_first"), 2, 100)),
    ).otherwise(F.col("g_first"))
    pass_name = map_lookup(
        F.col("o_orderpriority"), PASS_NAME_BY_PRIORITY, "Guest Pass"
    )
    desc = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(
            pass_name,
            F.lit(" from "),
            display_first,
            F.lit(" "),
            F.col("g_last"),
            F.lit(" ("),
            (F.col("o_orderkey") % 10).cast("string"),
            F.lit(" remaining)"),
        ),
    ).otherwise(
        F.concat(pass_name, F.lit(" from "), display_first, F.lit(" "), F.col("g_last"))
    )
    parsed = base.select(
        F.col("o_orderkey").alias("transfer_id"),
        parse_pass_transfer(desc).alias("p"),
    ).select(
        "transfer_id",
        F.col("p.pass_type").alias("pass_type"),
        F.col("p.purchaser_name").alias("purchaser_name"),
        F.col("p.remaining_count").alias("remaining_count"),
        F.col("p.is_punch_pass").alias("is_punch_pass"),
    )
    with_name = parsed.filter(F.col("purchaser_name").isNotNull()).select(
        "*",
        F.substring_index("purchaser_name", " ", 1).alias("from_first"),
        F.substring_index("purchaser_name", " ", -1).alias("from_last"),
    )
    roster = cust.select(
        F.col("customer_id").alias("matched_customer_id"),
        F.col("first_name").alias("r_first"),
        F.col("last_name").alias("r_last"),
    )
    # Blocking key = (last name, deletion-neighborhood variant of the first
    # name) — the SymSpell/FastSS inverted index.  Two strings within
    # levenshtein distance 1 ALWAYS share a key in {s} ∪ deletes1(s)
    # (equal -> s itself; substitution at i -> both delete position i;
    # insert/delete -> the longer side's delete equals the shorter string),
    # so the equi-join is lossless for lev<=1.  Unlike a
    # (last name, first-name length) block — which at this corpus still
    # yielded ~356 candidates per probe (4.85M pairs at sf0.1) because
    # synthesized first names cluster in length — the deletion index emits
    # essentially only true near-matches: candidate volume tracks the match
    # count, not the block size, and the per-row key fan-out is len+1
    # (~9 keys for a first name).  At a 1e9-row roster that is a 9e9-row
    # keyed build side feeding a plain equi-join — linear in N, no
    # per-surname cross product anywhere.  The 3-arg levenshtein then only
    # CONFIRMS distance on the handful of survivors (it early-exits past
    # the threshold, returning -1, which also drops the rare lev>=2 key
    # collision).  A (probe, roster) pair sharing two variant keys emits
    # two identical candidate rows; the keep-best row_number below picks
    # one of them, so no distinct is needed before ranking.
    lev = F.levenshtein(
        F.lower(F.col("from_first")), F.lower(F.col("r_first")), NAME_LEV_MAX
    )
    cands = (
        with_name.withColumn("vkey", F.explode(_delete1_keys(F.col("from_first"))))
        .join(
            roster.withColumn("rvkey", F.explode(_delete1_keys(F.col("r_first")))),
            (F.col("vkey") == F.col("rvkey"))
            & (F.col("from_last") == F.col("r_last")),
        )
        .withColumn("lev", lev)
        .filter((F.col("lev") >= 0) & (F.col("lev") <= NAME_LEV_MAX))
        .drop("vkey", "rvkey")
    )
    w = Window.partitionBy("transfer_id").orderBy("lev", "matched_customer_id")
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "transfer_id",
            "pass_type",
            "purchaser_name",
            "remaining_count",
            "is_punch_pass",
            "matched_customer_id",
            "lev",
            F.when(F.col("lev") == 0, "exact_name").otherwise("fuzzy_name").alias(
                "match_type"
            ),
        )
        .orderBy("transfer_id")
    )


def pass_transfer_name_links_sql() -> str:
    from ..functions.text import map_lookup_sql

    pass_name = map_lookup_sql("o_orderpriority", PASS_NAME_BY_PRIORITY, "Guest Pass")
    pat = r"^(.+?) from ([^(]+?)(?: \((\d+) remaining\))?$"
    return f"""
WITH cust AS ({customers_sql()}),
base AS (
  SELECT o.o_orderkey AS transfer_id,
         CASE WHEN o.o_orderkey % 2 = 0
              THEN ({pass_name}) || ' from ' ||
                   (CASE WHEN g.customer_id % 3 = 0
                         THEN 'K' || substring(g.first_name, 2)
                         ELSE g.first_name END) || ' ' || g.last_name ||
                   ' (' || (o.o_orderkey % 10)::varchar || ' remaining)'
              ELSE ({pass_name}) || ' from ' ||
                   (CASE WHEN g.customer_id % 3 = 0
                         THEN 'K' || substring(g.first_name, 2)
                         ELSE g.first_name END) || ' ' || g.last_name
         END AS description
  FROM orders o JOIN cust g ON o.o_custkey = g.customer_id
  WHERE o.o_orderkey % {TRANSFER_MOD} = 0
),
parsed AS (
  SELECT transfer_id,
         nullif(regexp_extract(description, '{pat}', 1), '') AS pass_type,
         nullif(trim(regexp_extract(description, '{pat}', 2)), '') AS purchaser_name,
         CAST(nullif(regexp_extract(description, '{pat}', 3), '') AS INTEGER)
           AS remaining_count,
         contains(lower(coalesce(nullif(regexp_extract(description, '{pat}', 1), ''), '')),
                  'punch') AS is_punch_pass
  FROM base
),
with_name AS (
  SELECT *,
         split_part(purchaser_name, ' ', 1) AS from_first,
         split_part(purchaser_name, ' ', -1) AS from_last
  FROM parsed WHERE purchaser_name IS NOT NULL
),
cands AS (
  SELECT w.*, r.customer_id AS matched_customer_id,
         levenshtein(lower(w.from_first), lower(r.first_name)) AS lev
  FROM with_name w JOIN cust r
    ON w.from_last = r.last_name
   AND abs(length(w.from_first) - length(r.first_name)) <= {NAME_LEV_MAX}
  WHERE levenshtein(lower(w.from_first), lower(r.first_name)) <= {NAME_LEV_MAX}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY transfer_id
                               ORDER BY lev, matched_customer_id) AS rn
  FROM cands
)
SELECT transfer_id, pass_type, purchaser_name, remaining_count, is_punch_pass,
       matched_customer_id, lev,
       CASE WHEN lev = 0 THEN 'exact_name' ELSE 'fuzzy_name' END AS match_type
FROM ranked WHERE rn = 1
ORDER BY transfer_id
"""


# ---------------------------------------------------------------------------
# data-questions queue: ambiguous/missing data needing human review
# ---------------------------------------------------------------------------

# Point-in-time anchor for the review queue (the 2024 event window's
# mid-January cut, same instant the flags engine evaluates at).
DATA_QUESTIONS_AS_OF = "2024-01-20"
DQ_RECENT_DAYS = 14


def data_questions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The human-review queue (reference build_data_questions.py:20-143:
    "customers with ambiguous or missing data that the pipeline can't
    resolve automatically", landed as ``customers/data_questions.csv`` for
    the crew CRM) — the deterministic half of the F6 agent surface, as a
    registered query.  Three rule families, each grounded in what THIS
    corpus makes ambiguous:

    * ``email_typo`` — the contact email's domain needed TLD-typo
      correction (the reference's correction map exists precisely because
      these records need a human fix at source); high priority when the
      customer actually visits (>= 3 checkins).
    * ``unreachable_guardian`` — a visiting child whose direct parent has
      no usable email (NULL or typo'd domain): who do we contact?
      (reference Q1 missing_parent, re-keyed to reachability since every
      corpus child carries a direct link).
    * ``ambiguous_family`` — a visiting child with >= 2 same-surname
      adults besides its direct parent (reference Q1 ambiguous_parent):
      which is the second guardian?
    * ``lapsed_no_recent_visit`` — membership ended before the cut, no
      checkin in the trailing {DQ_RECENT_DAYS} days, email on file
      (reference Q3 lapsed-members outreach gap).

    Scale shape: ONE enriched customer pass — checkin-count aggregate,
    broadcast surname counts, broadcast-keyed parent/membership lookups —
    then all four rules fire from a conditional-struct array explode (the
    F1 columnar fan-out idiom), so the customer dimension and the checkin
    aggregate are scanned once, not once per rule (a per-rule
    union-of-filters would re-derive them four times: Catalyst does not
    dedup common subtrees across union branches).  The queue is
    output-capped by its own predicates (rare-event rows), not a LIMIT."""
    import datetime as dt

    from .events import build_checkins
    from .memberships import build_memberships_2024

    as_of = dt.date.fromisoformat(DATA_QUESTIONS_AS_OF)
    recent_cut = as_of - dt.timedelta(days=DQ_RECENT_DAYS)
    cust = build_customers(spark, sf_dir)
    visits = (
        build_checkins(spark, sf_dir)
        .filter(F.col("checkin_date") <= F.lit(as_of))
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("n_visits"),
            F.max("checkin_date").alias("last_visit"),
        )
    )
    c = cust.join(visits, "customer_id", "left").na.fill({"n_visits": 0})
    reachable = F.col("email").isNotNull() & (
        F.substring_index(F.col("email"), "@", -1) == F.col("email_domain")
    )
    parents = c.select(
        F.col("customer_id").alias("parent_customer_id"),
        F.col("email").alias("parent_email"),
        reachable.alias("parent_reachable"),
    )
    adult_counts = (
        c.filter(~F.col("is_child") & F.col("email").isNotNull())
        .groupBy("last_name")
        .agg(F.count("*").alias("n_adults"))
    )
    mem_end = (
        build_memberships_2024(spark, sf_dir)
        .groupBy(F.col("owner_id").alias("customer_id"))
        .agg(F.max("end_date").alias("last_end"))
    )
    enriched = (
        c.join(parents, "parent_customer_id", "left")
        .join(F.broadcast(adult_counts), "last_name", "left")
        .join(mem_end, "customer_id", "left")
        .na.fill({"n_adults": 0})
    )

    has_typo = F.col("email").isNotNull() & (
        F.substring_index(F.col("email"), "@", -1) != F.col("email_domain")
    )
    is_visiting_child = F.col("is_child") & (F.col("n_visits") > 0)
    # candidates beyond the direct parent (the parent is an adult with
    # email in this corpus whenever reachable; subtract it when counted)
    n_candidates = F.col("n_adults") - F.when(F.col("parent_reachable"), 1).otherwise(0)
    vis_priority = lambda k: F.when(F.col("n_visits") >= k, "high").otherwise("medium")  # noqa: E731

    def q(cond, qtype: str, priority):
        return F.when(
            cond,
            F.struct(
                F.lit(qtype).alias("question_type"), priority.alias("priority")
            ),
        )

    questions = F.array(
        q(has_typo, "email_typo", vis_priority(3)),
        q(
            is_visiting_child
            & (F.col("parent_email").isNull() | ~F.col("parent_reachable")),
            "unreachable_guardian",
            vis_priority(3),
        ),
        q(is_visiting_child & (n_candidates >= 2), "ambiguous_family", F.lit("medium")),
        q(
            F.col("last_end").isNotNull()
            & (F.col("last_end") < F.lit(as_of))
            & F.col("email").isNotNull()
            & (F.col("last_visit").isNull() | (F.col("last_visit") <= F.lit(recent_cut))),
            "lapsed_no_recent_visit",
            vis_priority(5),
        ),
    )
    return (
        enriched.select("customer_id", "n_visits", F.explode(questions).alias("q"))
        .filter(F.col("q").isNotNull())
        .select(
            "customer_id",
            F.col("q.question_type").alias("question_type"),
            F.col("q.priority").alias("priority"),
            "n_visits",
        )
        .orderBy("customer_id", "question_type")
    )


def data_questions_sql() -> str:
    from .memberships import memberships_2024_sql

    mem2024 = memberships_2024_sql()
    return f"""
WITH cust AS ({customers_sql()}),
ck AS (
  SELECT user_id AS customer_id, count(*) AS n_visits, max(ts::date) AS last_visit
  FROM events WHERE ts::date <= DATE '{DATA_QUESTIONS_AS_OF}'
  GROUP BY user_id
),
c AS (
  SELECT cust.*, coalesce(ck.n_visits, 0) AS n_visits, ck.last_visit
  FROM cust LEFT JOIN ck USING (customer_id)
),
typo AS (
  SELECT customer_id, 'email_typo' AS question_type,
         CASE WHEN n_visits >= 3 THEN 'high' ELSE 'medium' END AS priority,
         n_visits
  FROM c
  WHERE email IS NOT NULL AND split_part(email, '@', 2) != email_domain
),
parents AS (
  SELECT customer_id AS parent_customer_id, email AS parent_email,
         email IS NOT NULL AND split_part(email, '@', 2) = email_domain
           AS parent_reachable
  FROM c
),
kids AS (
  SELECT c.*, p.parent_email, p.parent_reachable
  FROM c LEFT JOIN parents p USING (parent_customer_id)
  WHERE c.is_child AND c.n_visits > 0
),
guardian AS (
  SELECT customer_id, 'unreachable_guardian' AS question_type,
         CASE WHEN n_visits >= 3 THEN 'high' ELSE 'medium' END AS priority,
         n_visits
  FROM kids
  WHERE parent_email IS NULL OR NOT parent_reachable
),
adult_counts AS (
  SELECT last_name, count(*) AS n_adults
  FROM c WHERE NOT is_child AND email IS NOT NULL
  GROUP BY last_name
),
family AS (
  SELECT k.customer_id, 'ambiguous_family' AS question_type,
         'medium' AS priority, k.n_visits
  FROM kids k LEFT JOIN adult_counts a USING (last_name)
  WHERE coalesce(a.n_adults, 0)
        - (CASE WHEN k.parent_reachable THEN 1 ELSE 0 END) >= 2
),
mem_end AS (
  SELECT owner_id AS customer_id, max(end_date) AS last_end
  FROM ({mem2024}) GROUP BY owner_id
),
lapsed AS (
  SELECT c.customer_id, 'lapsed_no_recent_visit' AS question_type,
         CASE WHEN c.n_visits >= 5 THEN 'high' ELSE 'medium' END AS priority,
         c.n_visits
  FROM c JOIN mem_end m USING (customer_id)
  WHERE m.last_end < DATE '{DATA_QUESTIONS_AS_OF}'
    AND c.email IS NOT NULL
    AND (c.last_visit IS NULL
         OR c.last_visit <= DATE '{DATA_QUESTIONS_AS_OF}' - {DQ_RECENT_DAYS})
)
SELECT * FROM (
  SELECT * FROM typo
  UNION ALL SELECT * FROM guardian
  UNION ALL SELECT * FROM family
  UNION ALL SELECT * FROM lapsed
)
ORDER BY customer_id, question_type
"""


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage — the pattern table
# ---------------------------------------------------------------------------

FS_M = 0.95          # per-field P(agree | same entity) — documented convention
FS_WINDOW = 8        # sorted-neighborhood width inside the last-name block
FS_FIELDS = ("nation", "segment", "phone_e164", "email_domain")


def record_linkage_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record-linkage scoring as the CONTINGENCY TABLE: for
    every candidate customer pair, classify each comparison field as
    agree/disagree/missing, and report one row per agreement PATTERN with
    its pair count and log-likelihood-ratio score — the probabilistic
    generalization of the reference's tiered fuzzy matcher
    (customer_matching.py's exact-email / fuzzy-email / name+phone tiers
    are each ONE cell of this table).

    u-probabilities (P(agree | random pair)) are estimated from the data
    itself per field: u = Σ_v (n_v)² / N² over the non-null value counts —
    the standard frequency estimate, two tiny aggregations.
    m-probabilities are the fixed documented convention (0.95).  Field
    weights ln(m/u) / ln((1-m)/(1-u)) are nano-fixed-pointed BEFORE the
    per-pair sum, so pattern scores are exact integers cross-engine;
    missing fields contribute weight 0 (the F-S neutral-missing rule).
    Degenerate u (0 or 1: a field with no values or one value) pins that
    side's weight to 0 on both engines instead of ±Inf.

    Scale shape: candidates ride the sorted-neighborhood generator inside
    the last-name block (O(N·w), the fuzzy_email_matches discipline — no
    quadratic block interior); the 1-row weights frame reaches the pair
    stage by broadcast crossJoin (the repo's bounded stats-feed pattern);
    the output is ≤ 3^4 pattern rows regardless of corpus size."""
    from pyspark.sql import Window

    cust = build_customers(spark, sf_dir).select(
        "customer_id", "last_name", "first_name", *FS_FIELDS
    )
    # u estimate per field: Σ n_v² / N² over non-null values
    longf = cust.select(
        F.expr(
            "stack(4, 'nation', nation, 'segment', segment, "
            "'phone_e164', phone_e164, 'email_domain', email_domain) "
            "as (field, value)"
        )
    ).where(F.col("value").isNotNull())
    vc = longf.groupBy("field", "value").agg(F.count("*").alias("n"))
    stats = vc.groupBy("field").agg(
        F.sum(F.col("n") * F.col("n")).alias("n2"),
        F.sum("n").alias("nt"),
    )
    u = F.col("n2").cast("double") / (F.col("nt").cast("double") * F.col("nt").cast("double"))
    nano = lambda c: F.floor(c * 1000000000.0 + 0.5).cast("long")  # noqa: E731
    zero = F.lit(0).cast("long")
    weights = stats.select(
        "field",
        F.when((u > 0) & (u < 1), nano(F.log(F.lit(FS_M) / u))).otherwise(zero).alias("wa"),
        F.when((u > 0) & (u < 1), nano(F.log(F.lit(1.0 - FS_M) / (1.0 - u))))
        .otherwise(zero)
        .alias("wd"),
    )
    # 4 rows -> 1 row so the pair stage gets ONE broadcast stats feed
    one = weights.agg(
        *[
            F.max(F.when(F.col("field") == f, F.col(c))).alias(f"{c}_{f}")
            for f in FS_FIELDS
            for c in ("wa", "wd")
        ]
    )

    w = Window.partitionBy("last_name").orderBy("first_name", "customer_id")
    ranked = cust.withColumn("rank", F.row_number().over(w))
    probes = ranked.withColumn(
        "probe_rank",
        F.explode(F.array(*[F.col("rank") + k for k in range(1, FS_WINDOW + 1)])),
    )
    a, b = probes.alias("a"), ranked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.last_name") == F.col("b.last_name"))
        & (F.col("b.rank") == F.col("a.probe_rank")),
    ).join(F.broadcast(one))

    def fchar(f: str) -> F.Column:
        av, bv = F.col(f"a.{f}"), F.col(f"b.{f}")
        return (
            F.when(av.isNull() | bv.isNull(), F.lit("n"))
            .when(av == bv, F.lit("a"))
            .otherwise(F.lit("d"))
        )

    def fweight(f: str) -> F.Column:
        av, bv = F.col(f"a.{f}"), F.col(f"b.{f}")
        return (
            F.when(av.isNull() | bv.isNull(), zero)
            .when(av == bv, F.col(f"wa_{f}"))
            .otherwise(F.col(f"wd_{f}"))
        )

    pattern = F.concat(*[fchar(f) for f in FS_FIELDS])
    score_nano = sum(fweight(f) for f in FS_FIELDS)
    return (
        pairs.select(pattern.alias("pattern"), score_nano.alias("s"))
        .groupBy("pattern")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.max("s") / 1000000000.0).alias("llr_score"),
        )
        .orderBy("pattern")
    )


def record_linkage_patterns_sql() -> str:
    fields = FS_FIELDS
    char_exprs = []
    weight_exprs = []
    for f in fields:
        char_exprs.append(
            f"CASE WHEN a.{f} IS NULL OR b.{f} IS NULL THEN 'n' "
            f"WHEN a.{f} = b.{f} THEN 'a' ELSE 'd' END"
        )
        weight_exprs.append(
            f"CASE WHEN a.{f} IS NULL OR b.{f} IS NULL THEN 0::bigint "
            f"WHEN a.{f} = b.{f} THEN w.wa_{f} ELSE w.wd_{f} END"
        )
    pattern = " || ".join(char_exprs)
    score = " + ".join(f"({e})" for e in weight_exprs)
    piv = ",\n         ".join(
        f"max(CASE WHEN field = '{f}' THEN {c} END) AS {c}_{f}"
        for f in fields
        for c in ("wa", "wd")
    )
    return f"""
WITH cust AS ({customers_sql()}),
longf AS (
  SELECT 'nation' AS field, nation AS value FROM cust
  UNION ALL SELECT 'segment', segment FROM cust
  UNION ALL SELECT 'phone_e164', phone_e164 FROM cust
  UNION ALL SELECT 'email_domain', email_domain FROM cust
),
vc AS (
  SELECT field, value, count(*) AS n FROM longf
  WHERE value IS NOT NULL GROUP BY 1, 2
),
stats AS (
  SELECT field, sum(n * n) AS n2, sum(n) AS nt FROM vc GROUP BY field
),
wts AS (
  SELECT field,
         CASE WHEN n2::double / (nt::double * nt::double) > 0
               AND n2::double / (nt::double * nt::double) < 1
              THEN CAST(floor(ln({FS_M} / (n2::double / (nt::double * nt::double)))
                              * 1000000000.0 + 0.5) AS BIGINT)
              ELSE 0::bigint END AS wa,
         CASE WHEN n2::double / (nt::double * nt::double) > 0
               AND n2::double / (nt::double * nt::double) < 1
              THEN CAST(floor(ln((1.0 - {FS_M}) / (1.0 - n2::double / (nt::double * nt::double)))
                              * 1000000000.0 + 0.5) AS BIGINT)
              ELSE 0::bigint END AS wd
  FROM stats
),
one AS (
  SELECT {piv}
  FROM wts
),
ranked AS (
  SELECT customer_id, last_name, first_name,
         nation, segment, phone_e164, email_domain,
         row_number() OVER (PARTITION BY last_name
                            ORDER BY first_name, customer_id) AS rank
  FROM cust
),
pairs AS (
  SELECT {pattern} AS pattern, {score} AS s
  FROM ranked a
  JOIN ranked b
    ON a.last_name = b.last_name
   AND b.rank - a.rank BETWEEN 1 AND {FS_WINDOW}
  CROSS JOIN one w
)
SELECT pattern, count(*) AS n_pairs, max(s) / 1000000000.0 AS llr_score
FROM pairs
GROUP BY pattern
ORDER BY pattern
"""


FS_PRIOR = 0.01  # initial P(match) for the EM responsibility step


def linkage_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM update of the Fellegi-Sunter parameters from the observed
    agreement-pattern table — the step that turns
    :func:`record_linkage_patterns`'s fixed m = 0.95 convention into
    data-estimated match probabilities (Winkler's EM for record linkage,
    run one iteration at a time so every update is an auditable query,
    not an opaque fitted model).

    E-step: r(pattern) = π·Π m-terms / (π·Π m-terms + (1−π)·Π u-terms)
    over the ≤ 3⁴ pattern rows (agree → m, disagree → 1−m, missing → 1).
    M-step: m′_f = Σ r·n[agree_f] / Σ r·n[agree or disagree_f], u′_f the
    (1−r) mirror, π′ = Σ r·n / Σ n.

    Determinism: r is nano-floored per pattern BEFORE the weighted
    M-step sums; those sums are then exact integer products (nano·count
    in DECIMAL/HUGEINT), so the updated parameters are single exact-int
    ratios.  Fields with no agree+disagree mass pin m′/u′ to NULL.

    Scale shape: the pattern table is the corpus collapse (≤ 81 rows);
    everything here runs on bounded frames."""
    from pyspark.sql import Window

    pat = record_linkage_patterns(spark, sf_dir).select("pattern", "n_pairs")
    # per-field u estimates — same two tiny aggregations as the scorer
    cust = build_customers(spark, sf_dir).select(*FS_FIELDS)
    longf = cust.select(
        F.expr(
            "stack(4, 'nation', nation, 'segment', segment, "
            "'phone_e164', phone_e164, 'email_domain', email_domain) "
            "as (field, value)"
        )
    ).where(F.col("value").isNotNull())
    vc = longf.groupBy("field", "value").agg(F.count("*").alias("n"))
    stats = vc.groupBy("field").agg(
        F.sum(F.col("n") * F.col("n")).alias("n2"), F.sum("n").alias("nt")
    )
    u = F.col("n2").cast("double") / (
        F.col("nt").cast("double") * F.col("nt").cast("double")
    )
    u_guard = F.when((u > 0) & (u < 1), u).otherwise(F.lit(0.5))
    one = stats.select("field", u_guard.alias("u0")).agg(
        *[
            F.max(F.when(F.col("field") == f, F.col("u0"))).alias(f"u0_{f}")
            for f in FS_FIELDS
        ]
    )
    withu = pat.join(F.broadcast(one))

    def factor(i: int, f: str, p, q):
        ch = F.substring(F.col("pattern"), i + 1, 1)
        return F.when(ch == "a", p).when(ch == "d", 1.0 - p).otherwise(F.lit(1.0))

    pm = F.lit(float(FS_PRIOR))
    pu = F.lit(1.0 - FS_PRIOR)
    for i, f in enumerate(FS_FIELDS):
        pm = pm * factor(i, f, F.lit(FS_M), None)
        pu = pu * factor(i, f, F.col(f"u0_{f}"), None)
    r_nano = F.floor(pm / (pm + pu) * 1000000000.0 + 0.5).cast("long")
    scored = withu.select("pattern", "n_pairs", r_nano.alias("r"))

    aggs = [
        F.sum(dec38(F.col("r")) * dec38(F.col("n_pairs"))).alias("rn"),
        F.sum(dec38(F.lit(1000000000) - F.col("r")) * dec38(F.col("n_pairs"))).alias("sn"),
        F.sum("n_pairs").alias("n"),
    ]
    for i, f in enumerate(FS_FIELDS):
        ch = F.substring(F.col("pattern"), i + 1, 1)
        agree = F.when(ch == "a", F.col("n_pairs")).otherwise(F.lit(0))
        known = F.when(ch != "n", F.col("n_pairs")).otherwise(F.lit(0))
        aggs += [
            F.sum(dec38(F.col("r")) * dec38(agree)).alias(f"ma_{f}"),
            F.sum(dec38(F.col("r")) * dec38(known)).alias(f"mk_{f}"),
            F.sum(dec38(F.lit(1000000000) - F.col("r")) * dec38(agree)).alias(f"ua_{f}"),
            F.sum(dec38(F.lit(1000000000) - F.col("r")) * dec38(known)).alias(f"uk_{f}"),
        ]
    m = scored.agg(*aggs)
    micro = lambda x: F.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    rows = []
    for f in FS_FIELDS:
        rows.append(
            F.struct(
                F.lit(f).alias("field"),
                F.when(
                    F.col(f"mk_{f}") > 0,
                    micro(F.col(f"ma_{f}").cast("double") / F.col(f"mk_{f}").cast("double")),
                ).alias("m_updated"),
                F.when(
                    F.col(f"uk_{f}") > 0,
                    micro(F.col(f"ua_{f}").cast("double") / F.col(f"uk_{f}").cast("double")),
                ).alias("u_updated"),
            )
        )
    exploded = m.select(
        F.explode(F.array(*rows)).alias("s"),
        micro(
            F.col("rn").cast("double") / (F.col("n").cast("double") * 1.0e9)
        ).alias("pi_updated"),
        F.col("n").alias("n_pairs_total"),
    )
    return exploded.select(
        F.col("s.field").alias("field"),
        F.lit(FS_M).alias("m_initial"),
        F.col("s.m_updated").alias("m_updated"),
        F.col("s.u_updated").alias("u_updated"),
        "pi_updated",
        "n_pairs_total",
    ).orderBy("field")


def linkage_em_step_sql() -> str:
    pat = record_linkage_patterns_sql()
    field_terms_m = []
    field_terms_u = []
    per_field = []
    for i, f in enumerate(FS_FIELDS):
        ch = f"substr(pattern, {i + 1}, 1)"
        field_terms_m.append(
            f"(CASE WHEN {ch} = 'a' THEN {FS_M} WHEN {ch} = 'd' THEN 1.0 - {FS_M} ELSE 1.0 END)"
        )
        field_terms_u.append(
            f"(CASE WHEN {ch} = 'a' THEN u0_{f} WHEN {ch} = 'd' THEN 1.0 - u0_{f} ELSE 1.0 END)"
        )
        per_field.append(
            f"""SELECT '{f}' AS field,
       CASE WHEN sum(r::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) != 'n' THEN n_pairs ELSE 0 END)::hugeint) > 0
            THEN floor(sum(r::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) = 'a' THEN n_pairs ELSE 0 END)::hugeint)::double
                       / sum(r::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) != 'n' THEN n_pairs ELSE 0 END)::hugeint)::double
                       * 1000000.0 + 0.5) / 1000000.0 END AS m_updated,
       CASE WHEN sum((1000000000 - r)::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) != 'n' THEN n_pairs ELSE 0 END)::hugeint) > 0
            THEN floor(sum((1000000000 - r)::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) = 'a' THEN n_pairs ELSE 0 END)::hugeint)::double
                       / sum((1000000000 - r)::hugeint * (CASE WHEN substr(pattern, {i + 1}, 1) != 'n' THEN n_pairs ELSE 0 END)::hugeint)::double
                       * 1000000.0 + 0.5) / 1000000.0 END AS u_updated,
       floor(sum(r::hugeint * n_pairs::hugeint)::double
             / (sum(n_pairs)::double * 1.0e9) * 1000000.0 + 0.5) / 1000000.0 AS pi_updated,
       sum(n_pairs) AS n_pairs_total
FROM scored"""
        )
    u_cols = ",\n       ".join(
        f"max(CASE WHEN field = '{f}' THEN u0 END) AS u0_{f}" for f in FS_FIELDS
    )
    pm = f"{FS_PRIOR} * " + " * ".join(field_terms_m)
    pu = f"(1.0 - {FS_PRIOR}) * " + " * ".join(field_terms_u)
    body = "\nUNION ALL\n".join(per_field)
    return f"""
WITH pat AS ({pat}),
cust AS ({customers_sql()}),
longf AS (
  SELECT field, value FROM (
    SELECT nation AS value, 'nation' AS field FROM cust
    UNION ALL SELECT segment, 'segment' FROM cust
    UNION ALL SELECT phone_e164, 'phone_e164' FROM cust
    UNION ALL SELECT email_domain, 'email_domain' FROM cust
  ) WHERE value IS NOT NULL
),
vc AS (SELECT field, value, count(*) AS n FROM longf GROUP BY 1, 2),
stats AS (
  SELECT field, sum(n * n) AS n2, sum(n) AS nt FROM vc GROUP BY field
),
uest AS (
  SELECT field,
         CASE WHEN n2::double / (nt::double * nt::double) > 0
               AND n2::double / (nt::double * nt::double) < 1
              THEN n2::double / (nt::double * nt::double) ELSE 0.5 END AS u0
  FROM stats
),
one AS (
  SELECT {u_cols}
  FROM uest
),
scored AS (
  SELECT pattern, n_pairs,
         CAST(floor(({pm}) / (({pm}) + ({pu})) * 1000000000.0 + 0.5) AS BIGINT) AS r
  FROM pat, one
)
SELECT field, {FS_M}::double AS m_initial, m_updated, u_updated, pi_updated,
       CAST(n_pairs_total AS BIGINT) AS n_pairs_total
FROM ({body})
ORDER BY field
"""
