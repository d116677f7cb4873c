"""Sketch operators: HyperLogLog distinct-count and Count-Min heavy
hitters — the approximate-aggregation family that replaces exact
shuffles at 100 TB, built deterministically (md5-derived hashes, exact
integer register math) so Spark and DuckDB agree bit-for-bit and the
driver can value-hash the results.

Why sketches at scale: an exact COUNT(DISTINCT user) over 100 TB
shuffles every distinct key; an HLL register set is 256 int64s per
group, mergeable with a plain MAX aggregation — the shuffle carries
registers, not keys.  A Count-Min table is d×w counters, mergeable with
SUM — heavy-hitter queries stop depending on the vocabulary size.  Both
operators here compute the sketch AND the exact answer side-by-side and
report the measured error, following the repo's eval discipline
(ann_recall_eval, minhash_error_eval): an approximation you haven't
measured isn't an operator, it's a hope.

Exactness discipline (cross-engine): every hash is md5-hex → bigint;
register sums use the scaled-integer trick (Σ 2^(-M_j) is kept as
Σ 2^(RHO_CAP - M_j) over denominator 2^RHO_CAP — exact int64); the only
float step is the final estimate division, micro-rounded.

Reference scope: the reference's dashboards compute exact
value_counts/nunique per slice (dashboard/ aggregation callbacks); this
module is that surface's scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import micro as _gm
from ..functions.money import guarded_long_sql as _gl_sql
from ..functions.money import micro_sql as _gm_sql
from ..io import load_table

HLL_BUCKETS = 256  # m = 2^8: bucket = first 2 md5 hex digits
HLL_RHO_BITS = 48  # rank read from the next 12 hex digits
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_BUCKETS)  # standard alpha_m for m >= 128

CMS_DEPTH = 4  # d independent hash rows
CMS_WIDTH = 64  # w buckets per row


def _hll_register_rows(df: DataFrame, group_cols: list[F.Column], elem_col: str) -> DataFrame:
    """(group_cols..., bucket, rho) pre-aggregation rows for the
    deterministic md5 HLL.

    rho = leading zeros in the 48-bit tail + 1, CAPPED at RHO_BITS so the
    scaled register weight 2^(RHO_BITS - rho) stays a positive integer
    (tail = 0 would be rho = 49 in textbook HLL; bin(0) = '0' has length 1,
    so the formula below yields the cap 48 — a 2^-48-probability bias,
    traded for exact int64 register sums).  bit_length(v) == length(bin(v)).
    Shared by the batch register builder and the streaming stateful
    aggregation — MAX over these rows is streaming-legal, unlike
    approx_count_distinct's opaque HLL, and gives a DuckDB-mirrorable
    estimate."""
    h = F.md5(F.col(elem_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    tail = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")  # 48-bit
    rho = F.lit(HLL_RHO_BITS) - F.length(F.expr("bin(_tail)")) + 1
    return (
        df.select(*group_cols, bucket.alias("bucket"), tail.alias("_tail"))
        .withColumn("rho", rho)
        .drop("_tail")
    )


def _hll_registers(elems: DataFrame, group_col: str, elem_col: str) -> DataFrame:
    """(group, bucket, max_rho): the HLL register table.  One groupBy
    shuffle on (group, bucket) — at any scale the output is ≤ m rows per
    group, and MAX is algebraic so map-side partials do the heavy lifting."""
    rows = _hll_register_rows(elems, [F.col(group_col).alias("grp")], elem_col)
    return rows.groupBy("grp", "bucket").agg(F.max("rho").alias("max_rho"))


def _hll_scaled_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Σ 2^(RHO_BITS - M_j) over present buckets (exact int64) + present
    count, per group — the two numbers the estimator needs."""
    return regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(1L, {HLL_RHO_BITS} - cast(max_rho as int))")
        ).alias("s_present"),
        F.count("*").alias("n_present"),
    )


def _hll_estimate_col() -> F.Column:
    """Full Flajolet estimator over (s_present, n_present) columns: raw
    alpha·m²/Σ2^(-M_j), switched to linear counting m·ln(m/V) in the small
    range (raw ≤ 2.5m, V > 0)."""
    denom_unit = float(2**HLL_RHO_BITS)
    raw = (
        F.lit(HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS)
        / ((F.col("s_present") + (F.lit(HLL_BUCKETS) - F.col("n_present")) * F.lit(2**HLL_RHO_BITS)) / F.lit(denom_unit))
    )
    empty = F.lit(HLL_BUCKETS) - F.col("n_present")
    return F.when(
        (raw <= F.lit(2.5 * HLL_BUCKETS)) & (empty > 0),
        F.lit(float(HLL_BUCKETS)) * F.log(F.lit(float(HLL_BUCKETS)) / empty),
    ).otherwise(raw)


def hll_distinct_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: HLL distinct-user estimate vs the exact distinct
    count, with the measured relative error.  Full Flajolet et al.
    estimator: raw ``alpha·m²/Σ2^(-M_j)``, switched to linear counting
    ``m·ln(m/V)`` (V = empty buckets) in the small range (raw ≤ 2.5m, V>0)
    — without the switch the raw estimator over-reads small groups by
    ~80% at this corpus's cardinalities (measured before the fix).

    Scale shape: one shuffle keyed on (event_type, bucket) builds the
    registers (≤ 256 rows per group survive); the exact side is the
    count-distinct the sketch replaces, computed here only to measure the
    error.  Register merge across partitions/days is MAX — the reason
    this beats exact distinct at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    regs = _hll_registers(events, "event_type", "user_id")
    scaled = _hll_scaled_registers(regs, ["grp"])
    est = _hll_estimate_col()
    exact = events.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    out = scaled.join(exact, "grp").select(
        F.col("grp").alias("event_type"),
        "n_exact",
        _gm(est).alias("hll_estimate"),
        _gm(F.abs(est - F.col("n_exact")) / F.col("n_exact")).alias("rel_error"),
    )
    return out.orderBy("event_type")


def hll_distinct_eval_sql() -> str:
    rb = HLL_RHO_BITS
    return f"""
WITH elems AS (
  SELECT event_type AS grp,
         ('0x' || substr(md5(user_id::varchar), 1, 2))::bigint AS bucket,
         ('0x' || substr(md5(user_id::varchar), 3, 12))::bigint AS tail
  FROM events
),
regs AS (
  SELECT grp, bucket,
         max({rb} - length(bin(tail)) + 1) AS max_rho
  FROM elems GROUP BY grp, bucket
),
scaled AS (
  SELECT grp, sum((1::bigint << ({rb} - max_rho))::bigint)::bigint AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY grp
),
exact AS (
  SELECT event_type AS grp, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
),
raw_est AS (
  SELECT s.grp, e.n_exact, ({HLL_BUCKETS} - s.n_present) AS empty,
         {HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS} /
           ((s.s_present + ({HLL_BUCKETS} - s.n_present) * {2**HLL_RHO_BITS}::bigint)
              / {float(2**HLL_RHO_BITS)}) AS raw
  FROM scaled s JOIN exact e USING (grp)
),
est AS (
  SELECT grp, n_exact,
         CASE WHEN raw <= {2.5 * HLL_BUCKETS} AND empty > 0
              THEN {float(HLL_BUCKETS)} * ln({float(HLL_BUCKETS)} / empty)
              ELSE raw END AS raw
  FROM raw_est
)
SELECT grp AS event_type, n_exact,
       CASE WHEN abs(raw) < 1000000000000.0 THEN floor((raw) * 1000000.0 + 0.5) / 1000000.0 ELSE (raw) END AS hll_estimate,
       CASE WHEN abs(abs(raw - n_exact) / n_exact) < 1000000000000.0 THEN floor((abs(raw - n_exact) / n_exact) * 1000000.0 + 0.5) / 1000000.0 ELSE (abs(raw - n_exact) / n_exact) END AS rel_error
FROM est
ORDER BY event_type
"""


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the token stream: build the d×w
    counter table from ALL tokens, then read back the top-20 true-count
    tokens' estimates (min over the d rows) and the overestimate each
    paid to collisions.  CMS guarantees estimate ≥ true; the report
    measures how much ≥.

    Scale shape: the corpus collapses to the (token, n) count table
    first (the word-count shuffle every variant of this query pays);
    the counter table is d·w = 256 rows built from a vocab-sized input
    — at 100 TB the counters would instead be a SUM-mergeable
    per-partition sketch, same table, no vocab-sized intermediate; the
    top-k read-back joins 20·d rows against 256.  Nothing downstream of
    the count table touches corpus volume."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    rows = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    hashed = counts.select(
        "token",
        "n",
        F.explode(rows).alias("row"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat(F.col("row").cast("string"), F.lit("|"), F.col("token"))), 1, 8),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH,
    )
    counters = hashed.groupBy("row", "bucket").agg(F.sum("n").alias("counter"))
    top = (
        counts.orderBy(F.desc("n"), "token")
        .limit(20)
        .select("token", F.col("n").alias("true_n"))
    )
    top_cells = top.join(
        hashed.select("token", "row", "bucket"), "token"
    )  # 20·d rows
    est = (
        top_cells.join(counters, ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    return (
        top.join(est, "token")
        .select(
            "token",
            "true_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_n")).alias("overestimate"),
        )
        .orderBy(F.desc("true_n"), "token")
    )


def cms_heavy_hitters_sql() -> str:
    rows = ", ".join(str(i) for i in range(CMS_DEPTH))
    return f"""
WITH counts AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents)
  WHERE token != ''
  GROUP BY token
),
hashed AS (
  SELECT token, n, row,
         ('0x' || substr(md5(row::varchar || '|' || token), 1, 8))::bigint
           % {CMS_WIDTH} AS bucket
  FROM counts, (SELECT unnest([{rows}]) AS row)
),
counters AS (
  SELECT row, bucket, sum(n)::bigint AS counter FROM hashed GROUP BY row, bucket
),
top AS (
  SELECT token, n AS true_n FROM counts ORDER BY n DESC, token LIMIT 20
),
est AS (
  SELECT h.token, min(c.counter) AS cms_estimate
  FROM top t
  JOIN hashed h USING (token)
  JOIN counters c ON c.row = h.row AND c.bucket = h.bucket
  GROUP BY h.token
)
SELECT t.token, t.true_n, e.cms_estimate,
       e.cms_estimate - t.true_n AS overestimate
FROM top t JOIN est e USING (token)
ORDER BY t.true_n DESC, t.token
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 512  # m
BLOOM_HASHES = 3  # k
BLOOM_MIN_PURCHASES = 20  # build set = heavy-purchaser tail, sf-invariant density
BLOOM_WORDS = BLOOM_BITS // 32  # 32-bit lanes: shift stays < 32, overflow-safe in both engines


def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, evaluated: build an m-bit / k-hash
    Bloom filter over the BUILD key set (users who purchased in the first
    week), probe it with every distinct event user, and compare against
    the exact semi-join — reporting bloom pass count, false positives,
    the measured FPR and the theoretical ``(1 - e^(-kn/m))^k``.

    This is the primitive behind runtime row-group pruning of a 100 TB
    fact scan by a selective dim: the filter is a BIT_OR-mergeable
    8×int64 aggregate (broadcast for free), the probe is a column
    expression — no shuffle of the big side at all.  The guarantee the
    test pins: zero false NEGATIVES, so pruning never drops a matching
    row; false positives only cost wasted reads, and this query measures
    that cost.

    Determinism: bit positions are md5-derived (hash i of key =
    md5('i|key') first 8 hex mod m), register merge is BIT_OR — exact in
    both engines; the only floats are the final rates, micro-rounded."""
    events = load_table(spark, sf_dir, "events")
    base = events.select("user_id", "event_type")
    # selective build side at ANY sf: heavy purchasers (≥ BLOOM_MIN_PURCHASES
    # purchases — the per-user event density is sf-invariant in this corpus,
    # so the build set stays a small tail of the probe side as data scales)
    build = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_p"))
        .filter(F.col("n_p") >= BLOOM_MIN_PURCHASES)
        .select("user_id")
    )
    probe = base.select("user_id").distinct()

    idx = F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])

    def positions(df: DataFrame) -> DataFrame:
        return (
            df.select("user_id", F.explode(idx).alias("i"))
            .withColumn(
                "pos",
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("user_id").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % BLOOM_BITS,
            )
            .withColumn("word", F.expr("pos div 32"))
            .withColumn("mask", F.expr("shiftleft(1L, cast(pos % 32 as int))"))
        )

    bloom = positions(build).groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    # probe: a hash position passes iff its word's bits cover its mask;
    # a missing word row (no build key touched it) fails the probe
    probed = (
        positions(probe)
        .join(bloom, "word", "left")
        .withColumn(
            "hit",
            F.when(F.col("bits").isNotNull() & (F.expr("bits & mask") == F.col("mask")), F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg((F.min("hit") == 1).alias("bloom_pass"))
    )
    member = build.withColumn("is_member", F.lit(True))
    flags = probed.join(member.select("user_id", "is_member"), "user_id", "left").fillna(
        {"is_member": False}
    )
    # build ⊆ probe by construction (both derive from events), so
    # n_build == n_members — one aggregation, no 1-row scalar join
    out = flags.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.col("is_member").cast("int")).alias("n_members"),
        F.sum(F.col("bloom_pass").cast("int")).alias("n_bloom_pass"),
        F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("int")).alias("false_positives"),
        F.sum((~F.col("bloom_pass") & F.col("is_member")).cast("int")).alias("false_negatives"),
    ).withColumn("n_build", F.col("n_members"))
    theo = F.pow(
        F.lit(1.0) - F.exp(-F.lit(float(BLOOM_HASHES)) * F.col("n_build") / F.lit(float(BLOOM_BITS))),
        F.lit(float(BLOOM_HASHES)),
    )
    non_members = F.col("n_probe") - F.col("n_members")
    return out.select(
        "n_build",
        "n_probe",
        "n_members",
        "n_bloom_pass",
        "false_positives",
        "false_negatives",
        (F.floor(F.col("false_positives") / non_members * 1000000.0 + 0.5) / 1000000.0).alias(
            "measured_fpr"
        ),
        (F.floor(theo * 1000000.0 + 0.5) / 1000000.0).alias("theoretical_fpr"),
    )


def bloom_join_prune_sql() -> str:
    ks = ", ".join(str(i) for i in range(BLOOM_HASHES))
    return f"""
WITH build AS (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING count(*) >= {BLOOM_MIN_PURCHASES}
),
probe AS (SELECT DISTINCT user_id FROM events),
build_pos AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::varchar || '|' || user_id::varchar), 1, 8))::bigint
           % {BLOOM_BITS} AS pos
  FROM build, (SELECT unnest([{ks}]) AS i)
),
bloom AS (
  SELECT pos // 32 AS word, bit_or(1::bigint << (pos % 32)::int) AS bits
  FROM build_pos GROUP BY 1
),
probe_pos AS (
  SELECT user_id, i,
         ('0x' || substr(md5(i::varchar || '|' || user_id::varchar), 1, 8))::bigint
           % {BLOOM_BITS} AS pos
  FROM probe, (SELECT unnest([{ks}]) AS i)
),
probed AS (
  SELECT p.user_id,
         min(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::bigint << (p.pos % 32)::int))
                       = (1::bigint << (p.pos % 32)::int)
                  THEN 1 ELSE 0 END) = 1 AS bloom_pass
  FROM probe_pos p LEFT JOIN bloom b ON b.word = p.pos // 32
  GROUP BY p.user_id
),
flags AS (
  SELECT pr.user_id, pr.bloom_pass, (m.user_id IS NOT NULL) AS is_member
  FROM probed pr LEFT JOIN build m USING (user_id)
),
agg AS (
  SELECT count(*) AS n_probe,
         sum(is_member::int)::bigint AS n_members,
         sum(bloom_pass::int)::bigint AS n_bloom_pass,
         sum((bloom_pass AND NOT is_member)::int)::bigint AS false_positives,
         sum((NOT bloom_pass AND is_member)::int)::bigint AS false_negatives
  FROM flags
)
SELECT a.n_members AS n_build, a.n_probe, a.n_members, a.n_bloom_pass,
       a.false_positives, a.false_negatives,
       floor(a.false_positives::double / (a.n_probe - a.n_members) * 1000000.0 + 0.5)
         / 1000000.0 AS measured_fpr,
       floor(power(1.0 - exp(-{float(BLOOM_HASHES)} * a.n_members / {float(BLOOM_BITS)}),
                   {float(BLOOM_HASHES)}) * 1000000.0 + 0.5) / 1000000.0
         AS theoretical_fpr
FROM agg a
"""


# ---------------------------------------------------------------------------
# log-bucket histogram quantiles
# ---------------------------------------------------------------------------

HIST_SUBBUCKETS = 16  # buckets per decade: bucket = floor(log10(v+1) * 16)
HIST_QS = (0.5, 0.9, 0.99)


def log_bucket(value: F.Column) -> F.Column:
    """Sign-aware symmetric log bucket over an integer fixed-point column —
    THE shared bucketing primitive (single source of truth; formerly 14
    inline copies across the rank/sketch family, consolidated round 10).

    ``b >= 0`` covers ``[10^(b/16)-1, 10^((b+1)/16)-1)``; ``b < 0`` mirrors
    the magnitude (``-1 - floor(log10(-v+1)·16)``) so bucket order equals
    value order over the FULL signed range — monotone nondecreasing, the
    property every prefix-rank decomposition below depends on (and that
    ``tests/test_property_rank.py`` pins against adversarial magnitudes).
    Negative support matters: lifetime spend can be a net refund, where a
    plain ``log10`` bucket is undefined (and DuckDB raises while Spark
    NULLs — an engine-divergence trap).

    Bounds are DATA-INDEPENDENT: no min/max pre-pass, histograms from any
    two partitions/windows/days merge without re-bucketing, and the whole
    signed int64 cents range lands in ≤ ~2·19·16 ≈ 610 buckets."""
    return (
        F.when(value >= 0, F.floor(F.log10(value + 1) * HIST_SUBBUCKETS))
        .otherwise(-1 - F.floor(F.log10(-value + 1) * HIST_SUBBUCKETS))
        .cast("long")
    )


def log_bucket_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`log_bucket` for the oracles whose OUTPUT
    depends on bucket identity (theilsen's median pick, the PSI/decile
    histograms) — both engines must land every value in the same bucket,
    so the SQL is generated from one template instead of hand-copied.
    ``expr`` must already be integer fixed-point (cents / micro)."""
    return (
        f"CASE WHEN {expr} >= 0 "
        f"THEN floor(log10({expr} + 1) * {HIST_SUBBUCKETS}) "
        f"ELSE -1 - floor(log10(-({expr}) + 1) * {HIST_SUBBUCKETS}) "
        f"END::bigint"
    )


def bucketed_prefix_rank(
    per_val: DataFrame,
    value_col: str,
    *,
    partition_cols: tuple[str, ...] = (),
    descending: bool = False,
    inclusive: bool = False,
    sums: dict[str, str] | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Distributed prefix sums over a per-distinct-value frame with NO
    global row sort — the shared rank primitive behind the order-statistic
    family (Mann-Whitney/Kruskal/KS/Levene ranks, trimmed/winsorized and
    Gini/Pareto cuts, Spearman rank pairs, RFM and Tukey quantile picks;
    formerly five-plus hand-inlined copies, consolidated round 10).

    For each measure column ``m`` in ``sums`` (default ``{"cnt":
    "before"}``) appends ``sums[m]`` = Σ m over rows of the same
    ``partition_cols`` group whose ``value_col`` is strictly smaller
    (strictly larger when ``descending``; ≤/≥ when ``inclusive``).  All
    input columns pass through unchanged.

    How it scales: each value's global prefix decomposes as a bucket
    offset plus a within-bucket offset.  Bucket offsets are an EXCLUSIVE
    cumulative window over the bounded monotone :func:`log_bucket` table
    — ≤ ~610 rows TIMES the partition-group count, so the default
    broadcast join back is safe only while ``partition_cols`` has a
    bounded vocabulary (segments, revenue categories); pass
    ``broadcast_offsets=False`` for a corpus-sized partition key, where
    collecting groups×610 rows to the driver would be the scale bug.
    Within-bucket offsets are windows PARTITIONED by bucket, so no
    executor ever sorts more than one bucket's distinct values.
    Everything is exact integer math — bitwise-stable across engines and
    partitionings (the join strategy never changes values)."""
    from pyspark.sql import Window

    if sums is None:
        sums = {"cnt": "before"}
    pc = list(partition_cols)
    b = per_val.withColumn("_bpr_bkt", log_bucket(F.col(value_col)))
    bkt_counts = b.groupBy(*pc, "_bpr_bkt").agg(
        *[F.sum(m).alias(f"_bpr_sum_{m}") for m in sums]
    )
    wb = (
        Window.partitionBy(*pc)
        .orderBy(F.desc("_bpr_bkt") if descending else F.asc("_bpr_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bkt_counts.select(
        *pc,
        "_bpr_bkt",
        *[
            F.coalesce(F.sum(f"_bpr_sum_{m}").over(wb), F.lit(0)).alias(f"_bpr_off_{m}")
            for m in sums
        ],
    )
    win = (
        Window.partitionBy(*pc, "_bpr_bkt")
        .orderBy(F.desc(value_col) if descending else F.asc(value_col))
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    out = b.join(
        F.broadcast(offsets) if broadcast_offsets else offsets, pc + ["_bpr_bkt"]
    )
    for m, name in sums.items():
        out = out.withColumn(
            name,
            F.col(f"_bpr_off_{m}") + F.coalesce(F.sum(m).over(win), F.lit(0)),
        )
    return out.drop("_bpr_bkt", *[f"_bpr_off_{m}" for m in sums])


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a log-bucket histogram (HdrHistogram-style), evaluated
    against the exact discrete percentiles — the third canonical sketch
    next to HLL (distinct) and CMS (frequency): one pass, fixed
    ``decades × 16`` buckets of state, SUM-mergeable across partitions
    and days, quantile read-back by cumulative walk + linear
    interpolation inside the containing bucket.

    Bucket bounds are DATA-INDEPENDENT (``bucket = floor(log10(v+1)·16)``)
    — no min/max pre-pass, no scalar join, merge never re-buckets; the
    relative-error bound is set by the bucket width (~15% per bound here),
    and the query reports the measured error per quantile.

    Scale shape: the sketch side is one groupBy onto ≤ ~100 bucket rows and
    window math over that tiny table.  The EXACT side (ground truth for
    the eval only) pays a global rank — at 100 TB you'd run the sketch
    alone; the eval exists to certify it."""
    from pyspark.sql import Window

    vals = load_table(spark, sf_dir, "documents").select("n_chars", "doc_id")
    bucketed = vals.select(
        F.floor(F.log10(F.col("n_chars") + 1) * HIST_SUBBUCKETS).cast("long").alias("bucket")
    )
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket")  # histogram-sized frame
    cum = hist.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    qs = F.array(*[F.lit(q) for q in HIST_QS])
    per_q = cum.select("bucket", "cnt", "cum", "n", F.explode(qs).alias("q")).withColumn(
        "target", F.ceil(F.col("q") * F.col("n"))
    )
    containing = per_q.filter(
        (F.col("cum") >= F.col("target")) & (F.col("cum") - F.col("cnt") < F.col("target"))
    )
    lo = F.pow(F.lit(10.0), F.col("bucket") / F.lit(float(HIST_SUBBUCKETS))) - 1.0
    hi = F.pow(F.lit(10.0), (F.col("bucket") + 1) / F.lit(float(HIST_SUBBUCKETS))) - 1.0
    est = lo + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt") * (hi - lo)
    sketch_side = containing.select(
        "q", (F.floor(est * 1000000.0 + 0.5) / 1000000.0).alias("hist_estimate")
    )

    wr = Window.orderBy("n_chars", "doc_id")  # eval-only global rank
    ranked = vals.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    exact_per_q = (
        ranked.select("n_chars", "rn", "n", F.explode(qs).alias("q"))
        .filter(F.col("rn") == F.ceil(F.col("q") * F.col("n")))
        .select("q", F.col("n_chars").alias("exact_value"))
    )
    return (
        sketch_side.join(exact_per_q, "q")
        .select(
            "q",
            "exact_value",
            "hist_estimate",
            (
                F.floor(
                    F.abs(F.col("hist_estimate") - F.col("exact_value"))
                    / F.col("exact_value")
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("rel_error"),
        )
        .orderBy("q")
    )


def histogram_quantiles_sql() -> str:
    qs = ", ".join(f"{q}::double" for q in HIST_QS)
    sb = HIST_SUBBUCKETS
    return f"""
WITH bucketed AS (
  SELECT floor(log10(n_chars + 1) * {sb})::bigint AS bucket FROM documents
),
hist AS (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket),
cum AS (
  SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
),
per_q AS (
  SELECT bucket, cnt, cum, n, q, ceil(q * n) AS target
  FROM cum, (SELECT unnest([{qs}]) AS q)
),
containing AS (
  SELECT q,
         (power(10.0, bucket / {float(sb)}) - 1.0)
           + (target - (cum - cnt))::double / cnt
             * ((power(10.0, (bucket + 1) / {float(sb)}) - 1.0)
                - (power(10.0, bucket / {float(sb)}) - 1.0)) AS est
  FROM per_q
  WHERE cum >= target AND cum - cnt < target
),
ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER () AS n
  FROM documents
),
exact_per_q AS (
  SELECT q, n_chars AS exact_value
  FROM ranked, (SELECT unnest([{qs}]) AS q)
  WHERE rn = ceil(q * n)
)
SELECT c.q, e.exact_value,
       floor(c.est * 1000000.0 + 0.5) / 1000000.0 AS hist_estimate,
       floor(abs(floor(c.est * 1000000.0 + 0.5) / 1000000.0 - e.exact_value)
             / e.exact_value * 1000000.0 + 0.5) / 1000000.0 AS rel_error
FROM containing c JOIN exact_per_q e USING (q)
ORDER BY c.q
"""


# ---------------------------------------------------------------------------
# sketch-based decile assignment (the scale path for ntile segmentation)
# ---------------------------------------------------------------------------

DECILE_QS = tuple(i / 10.0 for i in range(1, 10))


def sketch_decile_cuts(per_cust: DataFrame) -> DataFrame:
    """9 decile cut points over a ``cents`` column, derived from the
    log-bucket histogram sketch — the scale path: no global row order
    anywhere, only a groupBy onto ≤ ~160 buckets plus window math over
    that tiny table.  Shared by :func:`sketch_decile_assignment` (the
    accuracy eval) and :func:`cohorts.customer_spend_deciles` (the
    default decile API)."""
    from pyspark.sql import Window

    bucketed = per_cust.select(log_bucket(F.col("cents")).alias("bucket"))
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket")  # histogram-sized frame
    cum = hist.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    qs = F.array(*[F.lit(q) for q in DECILE_QS])
    per_q = cum.select("bucket", "cnt", "cum", "n", F.explode(qs).alias("q")).withColumn(
        "target", F.ceil(F.col("q") * F.col("n"))
    )
    containing = per_q.filter(
        (F.col("cum") >= F.col("target")) & (F.col("cum") - F.col("cnt") < F.col("target"))
    )
    sb = float(HIST_SUBBUCKETS)
    b = F.col("bucket")
    m = -1 - b  # magnitude bucket for the negative branch
    lo = F.when(b >= 0, F.pow(F.lit(10.0), b / sb) - 1.0).otherwise(
        -(F.pow(F.lit(10.0), (m + 1) / sb) - 1.0)
    )
    hi = F.when(b >= 0, F.pow(F.lit(10.0), (b + 1) / sb) - 1.0).otherwise(
        -(F.pow(F.lit(10.0), m / sb) - 1.0)
    )
    est = lo + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt") * (hi - lo)
    return containing.select(
        (F.floor(est * 1000000.0 + 0.5) / 1000000.0).alias("cut")
    )


def sketch_decile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1e9-customer form of ``spend_deciles``, with its accuracy
    measured: derive the 9 decile cut points from the log-bucket histogram
    sketch (no global row order anywhere on the sketch path), assign each
    customer a decile by comparing spend against the broadcast cut points
    (map-side), and report per-exact-decile how often the sketch
    assignment agrees with exact ``ntile``.  This converts the documented
    single-partition-window caveat on ``spend_deciles`` into a measured
    design answer.

    Scale shape, sketch path only: one groupBy to per-customer cents, one
    groupBy onto ≤ ~160 histogram buckets, window math over that tiny
    table, then a broadcast of 9 cut-point rows and a map-side
    comparison.  The exact ntile side exists solely as the eval's ground
    truth.  Ties straddling a cut point are the irreducible disagreement
    (a value-based cut cannot split equal values the way a row-count tile
    does) — that is precisely what the agreement rate quantifies."""
    from pyspark.sql import Window

    from ..functions.money import to_cents
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    per_cust = txn.groupBy("customer_id").agg(
        F.sum(to_cents(F.col("total_amount"))).alias("cents")
    )
    cuts = sketch_decile_cuts(per_cust)
    assigned = per_cust.join(F.broadcast(cuts)).groupBy("customer_id", "cents").agg(
        (1 + F.sum((F.col("cents") > F.col("cut")).cast("int"))).alias("decile_sketch")
    )
    w = Window.orderBy("cents", "customer_id")
    exact = per_cust.withColumn("decile_exact", F.ntile(10).over(w))
    joined = exact.join(assigned, ["customer_id", "cents"])
    return (
        joined.groupBy("decile_exact")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum((F.col("decile_sketch") == F.col("decile_exact")).cast("long")).alias(
                "n_agree"
            ),
            F.max(F.abs(F.col("decile_sketch") - F.col("decile_exact"))).alias(
                "max_offset"
            ),
        )
        .withColumn(
            "agreement",
            (F.floor(F.col("n_agree") / F.col("n_customers") * 10000.0 + 0.5) / 10000.0),
        )
        .orderBy("decile_exact")
    )


def sketch_decile_assignment_sql() -> str:
    from ..functions.money import to_cents_sql
    from .transactions import transactions_sql

    qs_rows = ", ".join(f"({q})" for q in DECILE_QS)
    return f"""
WITH txn AS ({transactions_sql()}),
per_cust AS (
  SELECT customer_id, sum({to_cents_sql('total_amount')}) AS cents
  FROM txn GROUP BY customer_id
),
hist AS (
  SELECT {log_bucket_sql('cents')} AS bucket,
         count(*) AS cnt
  FROM per_cust GROUP BY 1
),
cum AS (
  SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
),
per_q AS (
  SELECT c.*, q.q, ceil(q.q * c.n) AS target
  FROM cum c CROSS JOIN (VALUES {qs_rows}) AS q(q)
),
containing AS (
  SELECT * FROM per_q WHERE cum >= target AND cum - cnt < target
),
bounds AS (
  SELECT *,
         CASE WHEN bucket >= 0
              THEN power(10.0, bucket / {HIST_SUBBUCKETS}.0) - 1.0
              ELSE -(power(10.0, ((-1 - bucket) + 1) / {HIST_SUBBUCKETS}.0) - 1.0)
         END AS lo,
         CASE WHEN bucket >= 0
              THEN power(10.0, (bucket + 1) / {HIST_SUBBUCKETS}.0) - 1.0
              ELSE -(power(10.0, (-1 - bucket) / {HIST_SUBBUCKETS}.0) - 1.0)
         END AS hi
  FROM containing
),
cuts AS (
  SELECT floor((lo + (target - (cum - cnt))::double / cnt * (hi - lo))
          * 1000000.0 + 0.5) / 1000000.0 AS cut
  FROM bounds
),
assigned AS (
  SELECT p.customer_id, p.cents,
         1 + sum((p.cents > c.cut)::int) AS decile_sketch
  FROM per_cust p CROSS JOIN cuts c
  GROUP BY p.customer_id, p.cents
),
exact AS (
  SELECT customer_id, cents,
         ntile(10) OVER (ORDER BY cents, customer_id) AS decile_exact
  FROM per_cust
)
SELECT e.decile_exact,
       count(*) AS n_customers,
       CAST(sum((a.decile_sketch = e.decile_exact)::int) AS BIGINT) AS n_agree,
       CAST(max(abs(a.decile_sketch - e.decile_exact)) AS BIGINT) AS max_offset,
       floor(sum((a.decile_sketch = e.decile_exact)::int)::double / count(*)
             * 10000.0 + 0.5) / 10000.0 AS agreement
FROM exact e JOIN assigned a USING (customer_id, cents)
GROUP BY e.decile_exact
ORDER BY e.decile_exact
"""


# ---------------------------------------------------------------------------
# population stability index (distribution drift monitor)
# ---------------------------------------------------------------------------

PSI_SPLIT_DATE = "1995-06-17"  # fixed epoch midpoint: before = baseline, after = current


def spend_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per revenue category: how far the
    transaction-amount distribution drifted between the baseline period
    (before ``PSI_SPLIT_DATE``) and the current one — THE standard
    model-monitoring drift metric (rule of thumb: <0.1 stable, 0.1–0.25
    shifting, >0.25 retrain).  A training-data pipeline runs exactly this
    per source/feature before each mixture refresh.

    Amounts land in the same sign-aware log buckets as
    ``sketch_decile_assignment`` (data-independent bounds, so baseline
    and current histograms are mergeable and comparable without a
    re-bucketing pass); shares are Laplace-smoothed over the union bucket
    set so empty cells stay finite.  Each bucket's PSI term is
    nano-rounded to int64 BEFORE the per-category sum — summation-order
    immune, same discipline as source_token_entropy.

    Scale shape: one groupBy to (category, bucket) counts — bounded at
    categories × ~160 buckets regardless of corpus size — then window
    math over that tiny table.  Nothing after the first aggregation
    touches transaction volume."""
    from pyspark.sql import Window

    from ..functions.money import to_cents
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir)
    cents = to_cents(F.col("total_amount"))
    bucket = log_bucket(cents)
    is_base = (F.col("txn_date") < F.lit(PSI_SPLIT_DATE).cast("date")).cast("long")
    counts = (
        txn.select(F.col("revenue_category"), bucket.alias("bucket"), is_base.alias("b"))
        .groupBy("revenue_category", "bucket")
        .agg(
            F.sum("b").alias("n_p"),
            F.sum(1 - F.col("b")).alias("n_q"),
        )
    )
    wc = Window.partitionBy("revenue_category")
    enriched = counts.select(
        "revenue_category",
        "n_p",
        "n_q",
        F.sum("n_p").over(wc).alias("np_tot"),
        F.sum("n_q").over(wc).alias("nq_tot"),
        F.count("*").over(wc).alias("n_buckets"),
    )
    p = (F.col("n_p") + 1).cast("double") / (F.col("np_tot") + F.col("n_buckets"))
    q = (F.col("n_q") + 1).cast("double") / (F.col("nq_tot") + F.col("n_buckets"))
    term_nano = F.floor((p - q) * F.log(p / q) * 1000000000.0 + 0.5).cast("long")
    return (
        enriched.withColumn("term_nano", term_nano)
        .groupBy("revenue_category")
        .agg(
            F.max("np_tot").alias("n_baseline"),
            F.max("nq_tot").alias("n_current"),
            F.max("n_buckets").alias("n_buckets"),
            (F.sum("term_nano") / 1000000000.0).alias("psi"),
        )
        .orderBy("revenue_category")
    )


def spend_drift_psi_sql() -> str:
    from ..functions.money import to_cents_sql

    from .transactions import transactions_sql

    cents = to_cents_sql("total_amount")
    return f"""
WITH txn AS ({transactions_sql()}),
bucketed AS (
  SELECT revenue_category,
         {log_bucket_sql(cents)} AS bucket,
         (txn_date < DATE '{PSI_SPLIT_DATE}')::bigint AS b
  FROM txn
),
counts AS (
  SELECT revenue_category, bucket,
         sum(b) AS n_p, sum(1 - b) AS n_q
  FROM bucketed GROUP BY 1, 2
),
enriched AS (
  SELECT revenue_category, n_p, n_q,
         sum(n_p) OVER (PARTITION BY revenue_category) AS np_tot,
         sum(n_q) OVER (PARTITION BY revenue_category) AS nq_tot,
         count(*) OVER (PARTITION BY revenue_category) AS n_buckets
  FROM counts
),
terms AS (
  SELECT revenue_category, np_tot, nq_tot, n_buckets,
         floor(((n_p + 1)::double / (np_tot + n_buckets)
                - (n_q + 1)::double / (nq_tot + n_buckets))
               * ln(((n_p + 1)::double / (np_tot + n_buckets))
                    / ((n_q + 1)::double / (nq_tot + n_buckets)))
               * 1000000000.0 + 0.5)::bigint AS term_nano
  FROM enriched
)
SELECT revenue_category,
       CAST(max(np_tot) AS BIGINT) AS n_baseline,
       CAST(max(nq_tot) AS BIGINT) AS n_current,
       max(n_buckets) AS n_buckets,
       sum(term_nano) / 1000000000.0 AS psi
FROM terms
GROUP BY revenue_category
ORDER BY revenue_category
"""


# ---------------------------------------------------------------------------
# windowed value-drift PSI — the sliding sibling of spend_drift_psi
# ---------------------------------------------------------------------------

DRIFT_WINDOW_US = 6 * 3600 * 1_000_000  # tumbling 6h, epoch-aligned


def _value_bucket() -> F.Column:
    """Sign-aware log bucket over the event ``value`` at micro fixed-point —
    the same data-independent bounds as ``sketch_decile_cuts``, so any two
    windows' histograms are comparable without a re-bucketing pass."""
    from ..functions.money import guarded_long

    vm = guarded_long(F.col("value") * 1000000.0)
    return log_bucket(vm)


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed drift monitor: per event type, the PSI between the value
    distribution of each 6-hour tumbling window and the PREVIOUS window —
    the time-resolved sibling of :func:`spend_drift_psi` (fixed
    baseline/current split) and the engine form of the reference's
    recency-drift segmentation (dashboard/dashboard.py:800-829, which
    re-buckets day-pass buyers by how their activity recency shifted).
    A training pipeline runs exactly this per source/feature to catch a
    mixture shift WITHIN a delivery, not just across deliveries.

    Window pairing uses the union-shift trick, not a self-join: each
    (window, type, bucket) count contributes once as "current" at its
    own window and once as "previous" at window + 6h, and a second
    groupBy folds the pair.  Shares are Laplace-smoothed over the pair's
    union bucket set; each bucket term is nano-rounded to int64 BEFORE
    the sum (summation-order immune).  Only windows where BOTH sides
    have events emit a row — PSI against an empty window is undefined,
    not infinite.

    Scale shape: ONE data-volume shuffle (groupBy onto window × type ×
    ~160 buckets); everything after runs on that bounded aggregate.  The
    streaming sibling (:func:`streaming.events_stream.
    streaming_value_drift_psi`) maintains the same histogram with a
    watermarked stateful aggregation and shares this post-process."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            (F.floor(F.unix_micros("ts") / DRIFT_WINDOW_US) * DRIFT_WINDOW_US)
            .cast("long")
            .alias("w"),
            "event_type",
            _value_bucket().alias("bucket"),
        )
        .groupBy("w", "event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )
    return _drift_psi_over_window_counts(counts)


def _drift_psi_over_window_counts(counts: DataFrame) -> DataFrame:
    """PSI of consecutive windows from (w, event_type, bucket, n) counts —
    shared by the batch scan and the streaming sibling's sink table."""
    from pyspark.sql import Window

    # explode each count into its two pair contributions ON the aggregated
    # frame — a unionByName of two selects over `counts` would duplicate the
    # whole pre-aggregation subtree (two scans + two data-volume shuffles in
    # the physical plan); the explode keeps ONE scan and one big shuffle,
    # with everything after running on windows × types × ~160 buckets
    zero = F.lit(0).cast("long")
    contrib = counts.select(
        "event_type",
        "bucket",
        F.explode(
            F.array(
                F.struct(
                    F.col("w").alias("window_start_us"),
                    F.col("n").alias("n_curr"),
                    zero.alias("n_prev"),
                ),
                F.struct(
                    (F.col("w") + DRIFT_WINDOW_US).alias("window_start_us"),
                    zero.alias("n_curr"),
                    F.col("n").alias("n_prev"),
                ),
            )
        ).alias("c"),
    ).select("event_type", "bucket", "c.window_start_us", "c.n_curr", "c.n_prev")
    paired = contrib.groupBy("event_type", "window_start_us", "bucket").agg(
        F.sum("n_curr").alias("n_q"), F.sum("n_prev").alias("n_p")
    )
    wc = Window.partitionBy("event_type", "window_start_us")
    enriched = paired.select(
        "event_type",
        "window_start_us",
        "n_p",
        "n_q",
        F.sum("n_p").over(wc).alias("np_tot"),
        F.sum("n_q").over(wc).alias("nq_tot"),
        F.count("*").over(wc).alias("n_buckets"),
    ).filter((F.col("np_tot") > 0) & (F.col("nq_tot") > 0))
    p = (F.col("n_p") + 1).cast("double") / (F.col("np_tot") + F.col("n_buckets"))
    q = (F.col("n_q") + 1).cast("double") / (F.col("nq_tot") + F.col("n_buckets"))
    term_nano = F.floor((p - q) * F.log(p / q) * 1000000000.0 + 0.5).cast("long")
    return (
        enriched.withColumn("term_nano", term_nano)
        .groupBy("event_type", "window_start_us")
        .agg(
            F.max("np_tot").alias("n_prev_window"),
            F.max("nq_tot").alias("n_curr_window"),
            F.max("n_buckets").alias("n_buckets"),
            (F.sum("term_nano") / 1000000000.0).alias("psi"),
        )
        .orderBy("event_type", "window_start_us")
    )


def value_drift_psi_sql() -> str:
    return f"""
WITH bucketed AS (
  SELECT (epoch_us(ts::TIMESTAMP) // {DRIFT_WINDOW_US}) * {DRIFT_WINDOW_US} AS w,
         event_type,
         {log_bucket_sql(_gl_sql("value * 1000000.0"))} AS bucket
  FROM events
),
counts AS (
  SELECT w, event_type, bucket, count(*) AS n
  FROM bucketed GROUP BY 1, 2, 3
),
paired AS (
  SELECT event_type, window_start_us, bucket,
         sum(n_curr) AS n_q, sum(n_prev) AS n_p
  FROM (
    SELECT event_type, w AS window_start_us, bucket, n AS n_curr, 0::bigint AS n_prev
    FROM counts
    UNION ALL
    SELECT event_type, w + {DRIFT_WINDOW_US} AS window_start_us, bucket,
           0::bigint AS n_curr, n AS n_prev
    FROM counts
  )
  GROUP BY 1, 2, 3
),
enriched AS (
  SELECT event_type, window_start_us, n_p, n_q,
         sum(n_p) OVER (PARTITION BY event_type, window_start_us) AS np_tot,
         sum(n_q) OVER (PARTITION BY event_type, window_start_us) AS nq_tot,
         count(*) OVER (PARTITION BY event_type, window_start_us) AS n_buckets
  FROM paired
),
terms AS (
  SELECT event_type, window_start_us, np_tot, nq_tot, n_buckets,
         floor(((n_p + 1)::double / (np_tot + n_buckets)
                - (n_q + 1)::double / (nq_tot + n_buckets))
               * ln(((n_p + 1)::double / (np_tot + n_buckets))
                    / ((n_q + 1)::double / (nq_tot + n_buckets)))
               * 1000000000.0 + 0.5)::bigint AS term_nano
  FROM enriched
  WHERE np_tot > 0 AND nq_tot > 0
)
SELECT event_type, window_start_us,
       CAST(max(np_tot) AS BIGINT) AS n_prev_window,
       CAST(max(nq_tot) AS BIGINT) AS n_curr_window,
       max(n_buckets) AS n_buckets,
       sum(term_nano) / 1000000000.0 AS psi
FROM terms
GROUP BY event_type, window_start_us
ORDER BY event_type, window_start_us
"""


def sliding_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users from MERGED tumbling sketches — the
    property that makes HLL the scale answer: registers union with a
    plain MAX, so the 12h-window/6h-slide distinct count is two tumbling
    6h register sets folded together, with NO second scan of the events
    and NO per-window re-count (exact distinct cannot do this: distinct
    sets don't merge, sketches do).  At 100 TB this is the difference
    between one register table reused for every window arithmetic the
    dashboard wants, and a full shuffle per window definition.

    Pipeline: one scan → 6h-tumbling (window, type, bucket, max_rho)
    registers; each tumbling register contributes to the two sliding
    windows that contain it (the value_drift_psi explode-shift trick,
    applied to the bounded register table); MAX-merge per sliding
    window; Flajolet estimate; exact side computed only as the eval.
    The estimate is bit-identical to sketching the sliding windows
    directly — a pytest pins that identity.

    Output: per (sliding window, event type): exact distinct, merged-HLL
    estimate, relative error."""
    from ..io import load_table

    events = load_table(spark, sf_dir, "events")
    win_us = 6 * 3600 * 1_000_000
    tumb = (
        _hll_register_rows(
            events,
            [
                (F.floor(F.unix_micros("ts") / win_us) * win_us)
                .cast("long")
                .alias("w"),
                F.col("event_type"),
            ],
            "user_id",
        )
        .groupBy("w", "event_type", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    # each 6h register row lands in the two 12h sliding windows containing
    # it: the one starting at w and the one starting at w - 6h
    zero = F.lit(0).cast("long")
    contrib = tumb.select(
        "event_type",
        "bucket",
        "max_rho",
        F.explode(
            F.array(F.col("w"), (F.col("w") - win_us).cast("long"))
        ).alias("window_start_us"),
    )
    merged = contrib.groupBy("window_start_us", "event_type", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    scaled = _hll_scaled_registers(merged, ["window_start_us", "event_type"])
    est = _hll_estimate_col()
    exact = events.select(
        "user_id",
        "event_type",
        F.explode(
            F.array(
                (F.floor(F.unix_micros("ts") / win_us) * win_us).cast("long"),
                (F.floor(F.unix_micros("ts") / win_us) * win_us - win_us).cast("long"),
            )
        ).alias("window_start_us"),
    ).groupBy("window_start_us", "event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        scaled.join(exact, ["window_start_us", "event_type"])
        .select(
            "window_start_us",
            "event_type",
            "n_exact",
            _gm(est).alias("hll_estimate"),
            (
                F.floor(
                    F.abs(est - F.col("n_exact")) / F.col("n_exact") * 1000000.0 + 0.5
                )
                / 1000000.0
            ).alias("rel_error"),
        )
        .orderBy("window_start_us", "event_type")
    )


def sliding_distinct_users_hll_sql() -> str:
    rb = HLL_RHO_BITS
    win_us = 6 * 3600 * 1_000_000
    return f"""
WITH elems AS (
  SELECT (epoch_us(ts::TIMESTAMP) // {win_us}) * {win_us} AS w,
         event_type, user_id,
         ('0x' || substr(md5(user_id::varchar), 1, 2))::bigint AS bucket,
         ('0x' || substr(md5(user_id::varchar), 3, 12))::bigint AS tail
  FROM events
),
tumb AS (
  SELECT w, event_type, bucket,
         max({rb} - length(bin(tail)) + 1) AS max_rho
  FROM elems GROUP BY 1, 2, 3
),
contrib AS (
  SELECT event_type, bucket, max_rho, w AS window_start_us FROM tumb
  UNION ALL
  SELECT event_type, bucket, max_rho, w - {win_us} FROM tumb
),
merged AS (
  SELECT window_start_us, event_type, bucket, max(max_rho) AS max_rho
  FROM contrib GROUP BY 1, 2, 3
),
scaled AS (
  SELECT window_start_us, event_type,
         sum((1::bigint << ({rb} - max_rho))::bigint)::bigint AS s_present,
         count(*) AS n_present
  FROM merged GROUP BY 1, 2
),
exact AS (
  SELECT window_start_us, event_type, count(DISTINCT user_id) AS n_exact
  FROM (
    SELECT user_id, event_type, w AS window_start_us FROM elems
    UNION ALL
    SELECT user_id, event_type, w - {win_us} FROM elems
  )
  GROUP BY 1, 2
),
raw_est AS (
  SELECT s.window_start_us, s.event_type, e.n_exact,
         ({HLL_BUCKETS} - s.n_present) AS empty,
         {HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS} /
           ((s.s_present + ({HLL_BUCKETS} - s.n_present) * {2**HLL_RHO_BITS}::bigint)
              / {float(2**HLL_RHO_BITS)}) AS raw
  FROM scaled s JOIN exact e USING (window_start_us, event_type)
),
est AS (
  SELECT window_start_us, event_type, n_exact,
         CASE WHEN raw <= {2.5 * HLL_BUCKETS} AND empty > 0
              THEN {float(HLL_BUCKETS)} * ln({float(HLL_BUCKETS)} / empty)
              ELSE raw END AS raw
  FROM raw_est
)
SELECT window_start_us, event_type, n_exact,
       CASE WHEN abs(raw) < 1000000000000.0 THEN floor((raw) * 1000000.0 + 0.5) / 1000000.0 ELSE (raw) END AS hll_estimate,
       CASE WHEN abs(abs(raw - n_exact) / n_exact) < 1000000000000.0 THEN floor((abs(raw - n_exact) / n_exact) * 1000000.0 + 0.5) / 1000000.0 ELSE (abs(raw - n_exact) / n_exact) END AS rel_error
FROM est
ORDER BY window_start_us, event_type
"""


def hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise customer-base overlap between data sources by HLL
    inclusion-exclusion: |A∩B| ≈ E(A) + E(B) − E(A∪B), where the union
    estimate comes from MERGED registers (bucket-wise max — the operation
    that makes HLL sketches composable and is exactly why a 100-TB
    engine keeps registers, not counts: any cross-source overlap matrix
    is then register-table joins, never a re-scan).  Jaccard and the
    overlap share of the smaller side ride along; the intersection
    estimate is clamped at 0 (inclusion-exclusion noise can go negative).

    Scale shape: ONE register build over transactions (groupBy
    (source, bucket), ≤ 256 rows per source survive); pair expansion and
    merging run entirely on register tables (sources² × 256 rows).

    Cites the same sketch contract as hll_distinct_eval / the sliding
    HLL family (reference has no sketch layer; this is the LLM-pipeline
    extension lane)."""
    from .transactions import build_transactions

    txn = build_transactions(spark, sf_dir).select("data_source", "customer_id")
    regs = _hll_registers(txn, "data_source", "customer_id")
    singles = _hll_scaled_registers(regs, ["grp"])
    est = _hll_estimate_col()
    single_est = singles.select(F.col("grp"), est.alias("e"))
    pairs = (
        single_est.select(F.col("grp").alias("src_a"), F.col("e").alias("e_a"))
        .crossJoin(
            F.broadcast(
                single_est.select(F.col("grp").alias("src_b"), F.col("e").alias("e_b"))
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    ra = pairs.select("src_a", "src_b").join(
        regs, F.col("grp") == F.col("src_a")
    ).select("src_a", "src_b", "bucket", "max_rho")
    rb = pairs.select("src_a", "src_b").join(
        regs, F.col("grp") == F.col("src_b")
    ).select("src_a", "src_b", "bucket", "max_rho")
    merged = ra.unionByName(rb).groupBy("src_a", "src_b", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    union_scaled = _hll_scaled_registers(merged, ["src_a", "src_b"])
    union_est = union_scaled.select("src_a", "src_b", est.alias("e_u"))
    j = pairs.join(union_est, ["src_a", "src_b"])
    inter = F.greatest(F.col("e_a") + F.col("e_b") - F.col("e_u"), F.lit(0.0))
    micro = _gm  # estimates are unbounded statistics -> guarded quantizer
    return j.select(
        "src_a",
        "src_b",
        micro(F.col("e_a")).alias("est_a"),
        micro(F.col("e_b")).alias("est_b"),
        micro(F.col("e_u")).alias("est_union"),
        micro(inter).alias("est_overlap"),
        F.when(F.col("e_u") > 0, micro(inter / F.col("e_u"))).alias("jaccard"),
        F.when(
            F.least(F.col("e_a"), F.col("e_b")) > 0,
            micro(inter / F.least(F.col("e_a"), F.col("e_b"))),
        ).alias("containment_min_side"),
    ).orderBy("src_a", "src_b")


def hll_source_overlap_sql() -> str:
    from .transactions import transactions_sql

    rb = HLL_RHO_BITS
    m = HLL_BUCKETS
    alpha_m2 = HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS
    unit = float(2**HLL_RHO_BITS)
    est = (
        f"CASE WHEN ({alpha_m2!r} / ((s_present + ({m} - n_present) * {2**rb}) / {unit!r}))"
        f" <= {2.5 * m!r} AND ({m} - n_present) > 0"
        f" THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_present))"
        f" ELSE {alpha_m2!r} / ((s_present + ({m} - n_present) * {2**rb}) / {unit!r}) END"
    )
    return f"""
WITH txn AS ({transactions_sql()}),
elems AS (
  SELECT data_source AS grp,
         ('0x' || substr(md5(customer_id::varchar), 1, 2))::bigint AS bucket,
         ('0x' || substr(md5(customer_id::varchar), 3, 12))::bigint AS tail
  FROM txn
),
regs AS (
  SELECT grp, bucket, max({rb} - length(bin(tail)) + 1) AS max_rho
  FROM elems GROUP BY grp, bucket
),
singles AS (
  SELECT grp,
         sum((1::bigint << ({rb} - max_rho::int))) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY grp
),
single_est AS (SELECT grp, {est} AS e FROM singles),
pairs AS (
  SELECT a.grp AS src_a, b.grp AS src_b, a.e AS e_a, b.e AS e_b
  FROM single_est a, single_est b
  WHERE a.grp < b.grp
),
merged AS (
  SELECT p.src_a, p.src_b, r.bucket, max(r.max_rho) AS max_rho
  FROM pairs p JOIN regs r ON r.grp = p.src_a OR r.grp = p.src_b
  GROUP BY 1, 2, 3
),
union_scaled AS (
  SELECT src_a, src_b,
         sum((1::bigint << ({rb} - max_rho::int))) AS s_present,
         count(*) AS n_present
  FROM merged GROUP BY 1, 2
),
union_est AS (SELECT src_a, src_b, {est} AS e_u FROM union_scaled)
SELECT p.src_a, p.src_b,
       CASE WHEN abs(e_a) < 1000000000000.0 THEN floor((e_a) * 1000000.0 + 0.5) / 1000000.0 ELSE (e_a) END AS est_a,
       CASE WHEN abs(e_b) < 1000000000000.0 THEN floor((e_b) * 1000000.0 + 0.5) / 1000000.0 ELSE (e_b) END AS est_b,
       CASE WHEN abs(e_u) < 1000000000000.0 THEN floor((e_u) * 1000000.0 + 0.5) / 1000000.0 ELSE (e_u) END AS est_union,
       CASE WHEN abs(greatest(e_a + e_b - e_u, 0.0)) < 1000000000000.0 THEN floor((greatest(e_a + e_b - e_u, 0.0)) * 1000000.0 + 0.5) / 1000000.0 ELSE (greatest(e_a + e_b - e_u, 0.0)) END AS est_overlap,
       CASE WHEN e_u > 0
            THEN CASE WHEN abs(greatest(e_a + e_b - e_u, 0.0) / e_u) < 1000000000000.0 THEN floor((greatest(e_a + e_b - e_u, 0.0) / e_u) * 1000000.0 + 0.5) / 1000000.0 ELSE (greatest(e_a + e_b - e_u, 0.0) / e_u) END
       END AS jaccard,
       CASE WHEN least(e_a, e_b) > 0
            THEN CASE WHEN abs(greatest(e_a + e_b - e_u, 0.0) / least(e_a, e_b)) < 1000000000000.0 THEN floor((greatest(e_a + e_b - e_u, 0.0) / least(e_a, e_b)) * 1000000.0 + 0.5) / 1000000.0 ELSE (greatest(e_a + e_b - e_u, 0.0) / least(e_a, e_b)) END
       END AS containment_min_side
FROM pairs p JOIN union_est u USING (src_a, src_b)
ORDER BY src_a, src_b
"""
