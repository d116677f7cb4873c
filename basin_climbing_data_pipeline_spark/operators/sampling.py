"""Deterministic sampling for training-data pipelines: hash-bucket
train/test split and per-source mixture sampling.

At 100 TB you cannot ``ORDER BY rand()`` — sampling must be a pure column
expression so it (a) needs no shuffle at all (narrow map stage), (b) is
reproducible run-to-run and engine-to-engine, and (c) assigns a stable
split to a document no matter which partition, executor, or engine touches
it.  Both operators therefore bucket on md5 (Spark ``conv(substring(md5))``
↔ DuckDB ``('0x' || substr(md5(...)))::bigint`` — the same parity trick the
flags AB assignment uses), never on ``rand()`` or Spark's ``hash()`` (which
DuckDB cannot reproduce).

Reference analog: the reference's AB experiment bucketing
(customer_flags_config.py:96-132) is the same stable-hash-percent idea;
train/test splitting and mixture weighting are the training-data-pipeline
generalization (BASELINE.json north-star operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import DEC38, dec38
from ..io import load_table

SPLIT_BUCKETS = 100
TRAIN_PCT = 80  # buckets [0, 80) → train, [80, 100) → test

# per-source target sampling percentages for the mixture sampler (a corpus
# recipe: oversample curated sources, downsample bulk crawl); sources not
# listed fall back to MIXTURE_DEFAULT_PCT
MIXTURE_PCT_BY_SOURCE = {
    "src0": 100,
    "src1": 75,
    "src2": 50,
    "src3": 25,
}
MIXTURE_DEFAULT_PCT = 10


def _md5_bucket(col: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Stable [0, buckets) assignment from the first 8 hex digits of md5 —
    bit-identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def _md5_bucket_sql(expr: str, buckets: int = SPLIT_BUCKETS) -> str:
    return f"('0x' || substr(md5(({expr})::varchar), 1, 8))::bigint % {buckets}"


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment: pure projection, no shuffle, stable
    across runs/engines/partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    b = _md5_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "source",
        b.alias("bucket"),
        F.when(b < TRAIN_PCT, "train").otherwise("test").alias("split"),
    ).orderBy("doc_id")


def train_test_split_sql() -> str:
    b = _md5_bucket_sql("doc_id")
    return f"""
SELECT doc_id, source, {b} AS bucket,
       CASE WHEN {b} < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


def mixture_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the per-source mixture recipe and report, per source: corpus
    size, target percentage, and how many documents the hash-gate kept.

    The gate itself (``bucket < target_pct``) is a narrow filter — the only
    shuffle in this query is the small per-source summary aggregation."""
    from ..functions.text import map_lookup

    docs = load_table(spark, sf_dir, "documents")
    rate_str = map_lookup(
        F.col("source"),
        {k: str(v) for k, v in MIXTURE_PCT_BY_SOURCE.items()},
        str(MIXTURE_DEFAULT_PCT),
    )
    gated = docs.select(
        "source",
        rate_str.cast("int").alias("target_pct"),
        (_md5_bucket(F.col("doc_id")) < rate_str.cast("int")).alias("kept"),
    )
    return (
        gated.groupBy("source", "target_pct")
        .agg(
            F.count("*").alias("total_docs"),
            F.sum(F.col("kept").cast("bigint")).alias("sampled_docs"),
        )
        .orderBy("source")
    )


def mixture_sample_summary_sql() -> str:
    from ..functions.text import map_lookup_sql

    rate = map_lookup_sql(
        "source",
        {k: str(v) for k, v in MIXTURE_PCT_BY_SOURCE.items()},
        str(MIXTURE_DEFAULT_PCT),
    )
    b = _md5_bucket_sql("doc_id")
    return f"""
WITH gated AS (
  SELECT source,
         ({rate})::int AS target_pct,
         ({b} < ({rate})::int) AS kept
  FROM documents
)
SELECT source, target_pct,
       count(*) AS total_docs,
       CAST(sum(kept::int) AS BIGINT) AS sampled_docs
FROM gated
GROUP BY source, target_pct
ORDER BY source
"""


# ---------------------------------------------------------------------------
# greedy sequence packing — training-batch construction
# ---------------------------------------------------------------------------

PACK_TOKEN_BUDGET = 512  # tokens per packed training sequence
PACK_SHARD_DOCS = 1000  # docs per packing shard (parallelism unit)


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: assign documents to fixed-token-
    budget training packs, reporting per-pack document count, token count
    and fill ratio — the batch-construction step between a filtered corpus
    and a trainer's fixed-length context windows.

    Packing is a running token cumsum in doc_id order; a doc starts a new
    pack when the budget is exhausted (greedy-with-overflow: the doc that
    crosses the boundary belongs to the pack where it started, so packs
    can exceed the budget by at most one document — deterministic, and no
    doc is ever split).

    Scale design: a single ORDER BY over the corpus would serialize
    packing through one partition per source.  Instead packs are local to
    a (source, shard) cell, shard = doc_id div PACK_SHARD_DOCS — packs
    never straddle shards, the window runs per cell (thousands of
    independent cells at corpus scale), and the only shuffle is the
    window's partitionBy.  This trades a sliver of fill efficiency at
    shard edges for full parallelism — the same contract as
    distributed-trainer shard files.  All arithmetic is integer-exact
    (fill ratio in floored micro units), so rows hash identically to the
    DuckDB oracle."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        (F.floor(F.col("doc_id") / PACK_SHARD_DOCS)).cast("long").alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source", "shard").orderBy("doc_id")
    packed = docs.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_TOKEN_BUDGET).cast(
            "long"
        ),
    )
    return (
        packed.groupBy("source", "shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .withColumn(
            "fill_micro",
            F.floor(F.col("n_tokens") * 1000000.0 / PACK_TOKEN_BUDGET).cast("long"),
        )
        .orderBy("source", "shard", "pack_id")
    )


def sequence_packing_sql() -> str:
    return f"""
WITH toks AS (
  SELECT source, doc_id,
         doc_id // {PACK_SHARD_DOCS} AS shard,
         len(string_split(trim(text, ' '), ' '))::BIGINT AS n_tokens
  FROM documents
),
packed AS (
  SELECT *,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY source, shard
                                         ORDER BY doc_id) - n_tokens)
                    / {PACK_TOKEN_BUDGET}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, shard, pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id,
       CAST(floor(sum(n_tokens) * 1000000.0 / {PACK_TOKEN_BUDGET}) AS BIGINT)
         AS fill_micro
FROM packed
GROUP BY source, shard, pack_id
ORDER BY source, shard, pack_id
"""


# ---------------------------------------------------------------------------
# corpus-construction funnel — the whole recipe in one audit table
# ---------------------------------------------------------------------------


def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus recipe as a funnel audit: documents surviving
    each stage — raw → exact dedup (keep canonical) → near-dup cluster
    collapse (keep one per MinHash cluster) → quality filter (drop the
    spam bucket) → decontamination (drop eval-set leakage).  One row per
    stage with the surviving count; the table a data lead actually reads
    before a training run.

    Composes the existing operators rather than re-deriving anything:
    exact_dedup's canonical flag, dedup_clusters' min-label (a doc is its
    cluster's keeper iff doc_id == cluster_id), the shared quality score
    (textstats.quality_score_col — same expression quality_buckets
    buckets on), and decontamination's flag.  Each stage is an anti- or
    semi-join on doc_id: at corpus scale every one is a broadcast or
    shuffle on a bigint key, and the expensive subtrees are the operators'
    own (already linear / materialized) paths.

    The five-branch union does NOT re-pay the expensive subtrees: the
    cluster labels are eagerly localCheckpoint-ed when dedup_clusters
    builds, and minhash pair-gen is session-materialized, so the only
    per-branch recomputation is the cheap hash/score projections — which
    parallelize across branches.  A single-pass flags-frame rewrite (four
    left joins + one conditional-sum agg) was measured SLOWER (4.5 s vs
    3.5 s warm at sf0.1) because it serializes those joins onto one
    critical path; keep the union shape."""
    from .dedup import decontamination, dedup_clusters, exact_canonical_ids
    from .textstats import QUALITY_SPAM_MAX, doc_stats, quality_score_col

    s_raw = load_table(spark, sf_dir, "documents").select("doc_id")
    # canonical ids straight from the groupBy-min (identical id set to
    # exact_dedup().filter(is_canonical) without its join-back — the
    # exact-dedup subtree sits under all four surviving-stage branches,
    # so the saved join is paid four times over)
    s_exact = exact_canonical_ids(spark, sf_dir)
    dupes = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    s_collapsed = s_exact.join(dupes, "doc_id", "left_anti")
    spam = (
        doc_stats(spark, sf_dir)
        .withColumn("q", quality_score_col())
        .filter(F.col("q") < QUALITY_SPAM_MAX)
        .select("doc_id")
    )
    s_quality = s_collapsed.join(spam, "doc_id", "left_anti")
    contaminated = (
        decontamination(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    s_clean = s_quality.join(contaminated, "doc_id", "left_anti")

    def stage(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_docs")).select(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            "n_docs",
        )

    return (
        stage(1, "raw", s_raw)
        .unionByName(stage(2, "exact_dedup", s_exact))
        .unionByName(stage(3, "near_dup_collapse", s_collapsed))
        .unionByName(stage(4, "quality_filter", s_quality))
        .unionByName(stage(5, "decontaminated", s_clean))
        .orderBy("stage_order")
    )


def corpus_funnel_sql() -> str:
    from .dedup import (
        CONTAM_MIN_SHINGLES,
        EVAL_SET_MOD,
        _SHINGLES_SQL,
        _clusters_cte_sql,
    )
    from .textstats import QUALITY_SPAM_MAX, doc_stats_sql, quality_score_sql

    return f"""
WITH RECURSIVE {_clusters_cte_sql()},
exact_canonical AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY md5(replace(replace(lower(trim(text, ' ')), chr(962), chr(963)), chr(775), '')))
             AS is_canonical
    FROM documents
  ) WHERE is_canonical
),
dupes AS (
  SELECT node AS doc_id FROM labels WHERE node != cluster_id
),
collapsed AS (
  SELECT doc_id FROM exact_canonical
  WHERE doc_id NOT IN (SELECT doc_id FROM dupes)
),
stats AS ({doc_stats_sql()}),
spam AS (
  SELECT doc_id FROM stats WHERE {quality_score_sql()} < {QUALITY_SPAM_MAX}
),
quality AS (
  SELECT doc_id FROM collapsed WHERE doc_id NOT IN (SELECT doc_id FROM spam)
),
{_SHINGLES_SQL.replace("shingle_rows AS (", "c_shingle_rows AS (").replace("shingles AS (", "c_shingles AS (").replace("FROM shingle_rows", "FROM c_shingle_rows")},
eval_shingles AS (
  SELECT DISTINCT shingle FROM c_shingles WHERE doc_id % {EVAL_SET_MOD} = 0
),
contaminated AS (
  SELECT t.doc_id
  FROM c_shingles t JOIN eval_shingles e USING (shingle)
  WHERE t.doc_id % {EVAL_SET_MOD} != 0
  GROUP BY t.doc_id
  HAVING count(DISTINCT t.shingle) >= {CONTAM_MIN_SHINGLES}
),
clean AS (
  SELECT doc_id FROM quality
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT * FROM (
  SELECT 1 AS stage_order, 'raw' AS stage, count(*) AS n_docs FROM documents
  UNION ALL
  SELECT 2, 'exact_dedup', count(*) FROM exact_canonical
  UNION ALL
  SELECT 3, 'near_dup_collapse', count(*) FROM collapsed
  UNION ALL
  SELECT 4, 'quality_filter', count(*) FROM quality
  UNION ALL
  SELECT 5, 'decontaminated', count(*) FROM clean
)
ORDER BY stage_order
"""


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights — multilingual/domain rebalancing
# ---------------------------------------------------------------------------

MIXTURE_TEMPERATURE_ALPHA = 0.5  # w_i ∝ share_i^alpha; 0.5 => sqrt scaling
_TEMP_W_SCALE = 1_000_000.0  # fixed-point scale for the sqrt weights


def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: per source, token count
    and share of the corpus, then w_i ∝ share_i^α (α = 0.5, i.e. sqrt)
    normalized to a sampling percentage — the standard rebalancing step
    that upsamples tail sources/languages relative to proportional
    sampling (α = 1 is proportional, α → 0 is uniform).

    Determinism across engines: the sqrt weights are fixed-pointed to
    BIGINT *before* normalization, so both the per-source weight and the
    normalizing sum are exact integer arithmetic — no float summation-order
    drift between Spark partitions and DuckDB.

    Scale shape: one partial-aggregated groupBy on source (the per-source
    rollup is tiny by definition), then window normalization over the
    ~|sources| aggregated rows — the unpartitioned window runs on the
    post-aggregation side, never on the corpus."""
    from pyspark.sql import Window

    from ..functions.money import ratio

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint")
    per_src = docs.select("source", n_words.alias("nw")).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("nw").alias("n_tokens")
    )
    w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w).cast("double")
    scaled = per_src.withColumn(
        "w_fix",
        F.floor(F.sqrt(share) * _TEMP_W_SCALE + 0.5).cast("bigint"),
    ).withColumn("token_share", ratio(share, F.lit(1.0), 6))
    return (
        scaled.select(
            "source",
            "n_docs",
            "n_tokens",
            "token_share",
            ratio(
                F.col("w_fix").cast("double"),
                F.sum("w_fix").over(w).cast("double"),
                6,
            ).alias("temp_weight"),
        )
        .orderBy("source")
    )


def temperature_mixture_weights_sql() -> str:
    from ..functions.money import ratio_sql

    s = _TEMP_W_SCALE
    return f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(trim(text, ' '), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
scaled AS (
  SELECT source, n_docs, n_tokens,
         n_tokens::double / (sum(n_tokens) OVER ())::double AS share,
         CAST(floor(sqrt(n_tokens::double / (sum(n_tokens) OVER ())::double)
              * {s} + 0.5) AS BIGINT) AS w_fix
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       {ratio_sql('share', '1.0', 6)} AS token_share,
       {ratio_sql('w_fix::double', '(sum(w_fix) OVER ())::double', 6)} AS temp_weight
FROM scaled
ORDER BY source
"""


# ---------------------------------------------------------------------------
# per-source document caps — head-of-domain selection
# ---------------------------------------------------------------------------

SOURCE_CAP_DOCS = 20  # max docs admitted per source


def source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap with quality-ranked admission: each source
    keeps its SOURCE_CAP_DOCS best documents by the shared composite
    quality score (deterministic tie-break on doc_id) — the "domain cap"
    step a web corpus applies so no single domain dominates the mix.
    Output per source: corpus size, kept count, and the admission
    cutoff (worst admitted score).

    Scale shape: one shuffle to rank within source (at web scale the
    partition key is the domain — bounded by the cap afterwards, and a
    pathologically hot domain is exactly what AQE skew-split handles),
    then a per-source rollup that rides the same partitioning."""
    from pyspark.sql import Window

    from .textstats import doc_stats, quality_score_col

    scored = (
        doc_stats(spark, sf_dir)
        .withColumn("q", quality_score_col())
        .select("doc_id", "source", "q")
    )
    w = Window.partitionBy("source").orderBy(F.desc("q"), "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") <= SOURCE_CAP_DOCS
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.min(F.when(kept, F.col("q"))).alias("cutoff_score"),
        )
        .orderBy("source")
    )


def source_quality_cap_sql() -> str:
    from .textstats import doc_stats_sql, quality_score_sql

    return f"""
WITH stats AS ({doc_stats_sql()}),
scored AS (
  SELECT doc_id, source, {quality_score_sql()} AS q FROM stats
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rn
  FROM scored
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum((rn <= {SOURCE_CAP_DOCS})::int) AS BIGINT) AS n_kept,
       min(CASE WHEN rn <= {SOURCE_CAP_DOCS} THEN q END) AS cutoff_score
FROM ranked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# training shard assignment — the final global shuffle
# ---------------------------------------------------------------------------

N_TRAIN_SHARDS = 8


def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-training global shuffle, deterministically: every document
    gets a shard (md5 bucket of doc_id — uniform, reproducible, no
    ``rand()``) and a position within its shard (rank by the full md5
    digest, doc_id tie-break).  Readers then stream shards sequentially
    and get a fixed pseudo-random document order — the property a trainer
    needs for restartable data loading.

    Scale shape: one hash shuffle on the shard key and a within-shard
    sort; shards are equal-sized in expectation, so the sort is
    (N/shards)·log(N/shards) per partition with no skew by construction."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.select(
        "doc_id",
        _md5_bucket(F.col("doc_id"), N_TRAIN_SHARDS).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("_digest"),
    )
    w = Window.partitionBy("shard").orderBy("_digest", "doc_id")
    return (
        assigned.withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def training_shard_assignment_sql() -> str:
    b = _md5_bucket_sql("doc_id", N_TRAIN_SHARDS)
    return f"""
WITH assigned AS (
  SELECT doc_id, {b} AS shard, md5(doc_id::varchar) AS _digest
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY _digest, doc_id) AS pos
FROM assigned
ORDER BY shard, pos
"""


# ---------------------------------------------------------------------------
# mixture epoch plan — from weights to an executable sampling schedule
# ---------------------------------------------------------------------------

EPOCH_TOKEN_BUDGET = 200_000  # total training-token budget for the plan


def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn the temperature mixture weights into the executable per-source
    schedule: target tokens = weight × budget, expressed as FULL EPOCHS of
    the source plus a fractional remainder — "repeat src3 twice, then take
    a 37.5% hash-gated sample for the third pass".  This is the table a
    data loader executes (integer repeats + one deterministic subsample),
    and the epochs number is the over-sampling diagnostic a recipe review
    reads ("are we doing 8 epochs of a tiny source?").

    All schedule numbers are exact integer micro-units derived from the
    already-integer weight fixed points — no float accumulates across
    rows.  Composes temperature_mixture_weights; adds zero extra passes
    over the corpus (the weights aggregate is the only corpus read)."""
    w = temperature_mixture_weights(spark, sf_dir)
    target_tokens = F.floor(
        F.col("temp_weight") * EPOCH_TOKEN_BUDGET
    ).cast("long")
    epochs_micro = F.floor(
        target_tokens * 1000000.0 / F.col("n_tokens")
    ).cast("long")
    return w.select(
        "source",
        "n_tokens",
        "temp_weight",
        target_tokens.alias("target_tokens"),
        (epochs_micro / F.lit(1000000)).cast("long").alias("full_epochs"),
        (epochs_micro % F.lit(1000000)).alias("frac_epoch_micro"),
    ).orderBy("source")


def mixture_epoch_plan_sql() -> str:
    return f"""
WITH weights AS (
{temperature_mixture_weights_sql()}
),
plan AS (
  SELECT source, n_tokens, temp_weight,
         CAST(floor(temp_weight * {EPOCH_TOKEN_BUDGET}) AS BIGINT) AS target_tokens
  FROM weights
)
SELECT source, n_tokens, temp_weight, target_tokens,
       CAST(floor(target_tokens * 1000000.0 / n_tokens) AS BIGINT) // 1000000
         AS full_epochs,
       CAST(floor(target_tokens * 1000000.0 / n_tokens) AS BIGINT) % 1000000
         AS frac_epoch_micro
FROM plan
ORDER BY source
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

# DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling", NeurIPS — public paper): select raw-corpus documents whose
# hashed n-gram feature distribution looks like a TARGET corpus, by scoring
# every doc with the log importance weight under two smoothed bag-of-hashed-
# ngram models and Gumbel-top-k sampling on those weights.  The target here
# is the English slice of the corpus (the "target = trusted distribution"
# analog of DSIR's Wikipedia+books target); features are hashed unigrams +
# bigrams, the paper's exact featurization.
DSIR_BUCKETS = 128
DSIR_TARGET_LANG = "en"
DSIR_KEEP = 100
# gumbel noise is derived from md5(doc_id) with a fixed salt so selection is
# reproducible across runs/engines/partitionings, like every sampler here
DSIR_SALT = "dsir|"
_TWO_32 = 4294967296.0


def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: hashed-ngram importance weights + deterministic
    Gumbel-top-k sampling.

    Pipeline (all relational, no UDFs):

    1. features: explode unigrams (non-empty tokens) and bigrams (the
       ``bigram_repetition`` slice/zip construction) and hash each into
       ``DSIR_BUCKETS`` md5 buckets — the same engine-portable md5 bucket
       every sampler in this module uses, never ``rand()``/``hash()``.
    2. two add-1-smoothed unigram models over buckets: p from the target
       slice (lang = 'en'), q from the whole corpus.  Both are
       ``DSIR_BUCKETS``-row aggregates — broadcast-sized at ANY corpus
       scale, the reason DSIR scales where per-token LMs don't.
    3. per-doc log importance weight: sum over feature OCCURRENCES of
       ln(p_f / q_f), micro-rounded once per bucket (int64 thereafter, so
       the per-doc sum is exact and order-insensitive — the repo's
       fixed-point discipline).
    4. Gumbel-top-k: key = lnw_micro + floor(1e6 * g) with
       g = -ln(-ln(u)), u a salted md5 uniform of doc_id — sampling
       without replacement ∝ importance weight, reproducible everywhere.
       The top-``DSIR_KEEP`` pick is orderBy+limit (TakeOrdered — a
       distributed heap, no single-partition window sort), then a
       broadcast semi-join flags survivors.

    Scale shape: two explode+groupBy passes over tokens (map-side
    combinable, keyed by (doc, bucket) so no hot keys), one broadcast join
    of a 128-row model table, one TakeOrdered top-k.  Nothing driver-side
    but the k-row id list."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    n_big = F.greatest(F.size(words) - 1, F.lit(0))
    uni = (
        docs.select("doc_id", "lang", F.explode(words).alias("feat"))
        .filter(F.col("feat") != "")
    )
    bi = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, n_big).alias("w1"),
                F.slice(words, 2, n_big).alias("w2"),
            )
        ).alias("p"),
    ).select(
        "doc_id", "lang", F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("feat")
    )
    feats = uni.unionByName(bi).select(
        "doc_id", "lang", _md5_bucket(F.col("feat"), DSIR_BUCKETS).alias("bucket")
    )
    from ..io import tracked_persist
    from pyspark.sql import Window

    # the q (corpus) and p (target-lang) bucket models in ONE aggregation
    # pass over the exploded features — identical counts to the former
    # two-pass + left-join shape: n_q = count per bucket; n_p = count of
    # target-lang occurrences (0 when absent, exactly the old
    # coalesce(n_p, 0)).  The map-side partial agg collapses to 128 bucket
    # rows before the exchange, so one tokenize pass replaces two.  (An
    # alternative that pre-collapsed feats to cached (doc, bucket) counts
    # for ALL consumers measured WORSE — 2.82 vs 2.35 s 5-rep min — the
    # (doc, bucket)-keyed shuffle + persist costs more than a second
    # codegen'd tokenize pass.)
    model = (
        feats.groupBy("bucket")
        .agg(
            F.count("*").alias("n_q"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("n_p"),
        )
        .withColumn("tot_q", F.sum("n_q").over(Window.partitionBy()))
        .withColumn("tot_p", F.sum("n_p").over(Window.partitionBy()))
    )
    ratio_micro = F.floor(
        F.log(
            ((F.col("n_p") + 1.0) * (F.col("tot_q") + F.lit(float(DSIR_BUCKETS))))
            / ((F.col("tot_p") + F.lit(float(DSIR_BUCKETS))) * (F.col("n_q") + 1.0))
        )
        * 1000000.0
        + 0.5
    ).cast("long")
    model = F.broadcast(model.select("bucket", ratio_micro.alias("ratio_micro")))

    # persist the per-doc weights — the top-k pick is a broadcast barrier,
    # so its consumer and the final join run SEQUENTIALLY (no overlap to
    # lose), and without the cache the tokenize subtree ran twice more
    per_doc = tracked_persist(
        feats.groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
        .join(model, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("ratio_micro")).alias("lnw_micro"),
        )
    )
    scored = (
        docs.select("doc_id", "source", "lang")
        .join(per_doc, "doc_id", "left")
        .withColumn("n_feats", F.coalesce(F.col("n_feats"), F.lit(0)))
        .withColumn("lnw_micro", F.coalesce(F.col("lnw_micro"), F.lit(0)))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(DSIR_SALT), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        + 0.5
    ) / _TWO_32
    g_micro = F.floor(-F.log(-F.log(u)) * 1000000.0 + 0.5).cast("long")
    keyed = scored.withColumn("sel_key", F.col("lnw_micro") + g_micro)
    top = keyed.orderBy(F.desc("sel_key"), "doc_id").limit(DSIR_KEEP).select(
        "doc_id", F.lit(True).alias("selected")
    )
    return (
        keyed.join(F.broadcast(top), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_feats",
            (F.col("lnw_micro") / 1000000.0).alias("lnw"),
            F.coalesce(F.col("selected"), F.lit(False)).alias("selected"),
        )
        .orderBy("doc_id")
    )


def dsir_selection_sql() -> str:
    b = DSIR_BUCKETS
    u_sql = (
        f"((('0x' || substr(md5('{DSIR_SALT}' || doc_id::varchar), 1, 8))::bigint + 0.5)"
        f" / {_TWO_32})"
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, split(trim(text, ' '), ' ') AS words FROM documents
),
uni AS (
  SELECT doc_id, lang, t.feat
  FROM (SELECT doc_id, lang, unnest(words) AS feat FROM base) t
  WHERE feat != ''
),
bi AS (
  SELECT doc_id, lang, words[i] || ' ' || words[i + 1] AS feat
  FROM base, unnest(range(1, len(words))) AS t(i)
),
feats AS (
  SELECT doc_id, lang, {_md5_bucket_sql('feat', b)} AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
q_cnt AS (SELECT bucket, count(*) AS n_q FROM feats GROUP BY bucket),
p_cnt AS (
  SELECT bucket, count(*) AS n_p FROM feats
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket
),
model AS (
  SELECT q.bucket,
         floor(ln(((coalesce(p.n_p, 0) + 1.0) * ((SELECT sum(n_q) FROM q_cnt) + {float(b)}))
                  / (((SELECT sum(coalesce(p2.n_p, 0)) FROM q_cnt q2
                       LEFT JOIN p_cnt p2 ON q2.bucket = p2.bucket) + {float(b)})
                     * (q.n_q + 1.0)))
               * 1000000.0 + 0.5)::bigint AS ratio_micro
  FROM q_cnt q LEFT JOIN p_cnt p ON q.bucket = p.bucket
),
per_doc AS (
  SELECT db.doc_id, sum(db.n) AS n_feats, sum(db.n * m.ratio_micro) AS lnw_micro
  FROM (SELECT doc_id, bucket, count(*) AS n FROM feats GROUP BY 1, 2) db
  JOIN model m ON db.bucket = m.bucket
  GROUP BY db.doc_id
),
scored AS (
  SELECT d.doc_id, d.source, d.lang,
         CAST(coalesce(p.n_feats, 0) AS BIGINT) AS n_feats,
         coalesce(p.lnw_micro, 0) AS lnw_micro,
         coalesce(p.lnw_micro, 0)
           + floor(-ln(-ln({u_sql})) * 1000000.0 + 0.5)::bigint AS sel_key
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY sel_key DESC, doc_id) AS rk FROM scored
)
SELECT doc_id, source, lang, n_feats,
       lnw_micro / 1000000.0 AS lnw,
       rk <= {DSIR_KEEP} AS selected
FROM ranked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# soft dedup: duplicate-discounted sampling mass instead of hard dropping
# ---------------------------------------------------------------------------


def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware DOWN-WEIGHTING per source: every document in a
    near-duplicate cluster carries sampling weight 1/cluster_size, so a
    cluster contributes one document's worth of expected training mass no
    matter how many copies exist — the soft alternative (SoftDeDup-style
    reweighting, He et al. 2024 — public paper) to hard keep-one dropping,
    which a mixture designer prefers when duplicates carry distribution
    signal.

    Output: one row per source with raw vs duplicate-discounted token
    mass and the retained fraction — the table that says "src7's crawl is
    31% duplicated mass; its temperature weight is overstated".

    Composes :func:`~..operators.dedup.dedup_clusters` (log-round star
    contraction, the scale path); the weighting itself is one left join
    of the clustered subset (coalesce singletons to size 1) and one
    per-source aggregation over exact integer micro-weights.  Nothing
    here adds a corpus-scale shuffle beyond the cluster build."""
    from .dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split(F.trim(F.col("text")), " "), lambda w: w != ""))
    base = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_size")
    weighted = (
        base.join(clusters, "doc_id", "left")
        .withColumn("cluster_size", F.coalesce(F.col("cluster_size"), F.lit(1)))
        .withColumn(
            "weight_micro",
            F.floor(1000000.0 / F.col("cluster_size") + 0.5).cast("long"),
        )
    )
    agg = weighted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0)).alias("n_clustered_docs"),
        F.sum("n_tokens").alias("raw_tokens"),
        F.sum(F.col("n_tokens") * F.col("weight_micro")).alias("_eff_micro"),
    )
    from ..functions.money import ratio

    return agg.select(
        "source",
        "n_docs",
        "n_clustered_docs",
        "raw_tokens",
        (F.col("_eff_micro") / 1000000.0).alias("effective_tokens"),
        F.when(
            F.col("raw_tokens") > 0,
            ratio(F.col("_eff_micro").cast("double"), F.col("raw_tokens") * 1000000.0, 4),
        ).alias("mass_retained"),
    ).orderBy("source")


def soft_dedup_weights_sql() -> str:
    from .dedup import _clusters_cte_sql
    from ..functions.money import ratio_sql

    retained = ratio_sql("eff_micro::double", "raw_tokens * 1000000.0", 4)
    return f"""
WITH RECURSIVE {_clusters_cte_sql()},
tok AS (
  SELECT doc_id, source,
         len(list_filter(split(trim(text, ' '), ' '), w -> w != '')) AS n_tokens
  FROM documents
),
weighted AS (
  SELECT t.doc_id, t.source, t.n_tokens,
         coalesce(s.cluster_size, 1) AS cluster_size,
         floor(1000000.0 / coalesce(s.cluster_size, 1) + 0.5)::bigint AS weight_micro
  FROM tok t
  LEFT JOIN labels l ON l.node = t.doc_id
  LEFT JOIN sizes s ON s.cluster_id = l.cluster_id
),
agg AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clustered_docs,
         CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
         CAST(sum(n_tokens * weight_micro) AS BIGINT) AS eff_micro
  FROM weighted GROUP BY source
)
SELECT source, n_docs, n_clustered_docs, raw_tokens,
       eff_micro / 1000000.0 AS effective_tokens,
       CASE WHEN raw_tokens > 0 THEN {retained} END AS mass_retained
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# stratified proportional sample — exact largest-remainder allocation
# ---------------------------------------------------------------------------

STRAT_BUDGET_DIV = 5  # sample budget = corpus_size // 5 (a 20% draw)


def stratified_sample_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sampling: allocate a corpus-derived
    budget (``total // STRAT_BUDGET_DIV``) across sources by the
    largest-remainder (Hamilton) method — ``base = N·n_s div T`` plus one
    extra seat for the ``N - Σbase`` largest remainders — then admit each
    stratum's quota by md5-digest rank (the repo's deterministic
    no-``rand()`` sampling discipline).  Unlike ``df.sampleBy`` (Bernoulli
    per row, only approximately proportional), the allocation is EXACT:
    Σquota == budget, every time, at every scale.

    All allocation arithmetic is int64 (``N·n_s`` ≤ budget·corpus — safe
    far beyond 100 TB row counts as BIGINT products), so both engines
    agree bit-for-bit with no float apportionment.

    Scale shape: per-source counts are one map-side-combined groupBy;
    the 1-row total broadcasts back; the remainder ranking is a window
    over ONE ROW PER STRATUM (sources/domains — thousands at web scale,
    driver-safe); admission is a per-source digest rank — the same
    bounded window as ``source_quality_cap``.  With budget < total,
    ``base ≤ n_s − 1`` for n_s ≥ 2 (and 1 for n_s = 1), so quota never
    exceeds the stratum size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # budget via INTEGER division on both sides: a float divide + cast
    # diverges cross-engine (Spark cast truncates 3.6 -> 3, DuckDB cast
    # ROUNDS 3.6 -> 4 — the fuzz corpus caught exactly this)
    totals = counts.agg(F.sum("n_docs").alias("total")).select(
        "total", F.expr(f"total div {STRAT_BUDGET_DIV}").alias("budget")
    )
    with_tot = counts.crossJoin(F.broadcast(totals))
    based = with_tot.select(
        "source",
        "n_docs",
        "budget",
        F.expr("budget * n_docs div total").alias("base"),
        F.expr("(budget * n_docs) % total").alias("rem"),
    )
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    leftover = F.col("budget") - F.sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    alloc = based.withColumn("rem_rank", F.row_number().over(w)).select(
        "source",
        "n_docs",
        (F.col("base") + (F.col("rem_rank") <= leftover).cast("long")).alias("quota"),
    )
    dw = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(dw))
    sel = ranked.join(F.broadcast(alloc.select("source", "quota")), "source").filter(
        F.col("rn") <= F.col("quota")
    )
    picked = sel.groupBy("source").agg(
        F.count("*").alias("n_selected"), F.min("doc_id").alias("first_doc")
    )
    return (
        alloc.join(picked, "source", "left")
        .select(
            "source",
            "n_docs",
            "quota",
            F.coalesce(F.col("n_selected"), F.lit(0)).cast("long").alias("n_selected"),
            "first_doc",
        )
        .orderBy("source")
    )


def stratified_sample_alloc_sql() -> str:
    return f"""
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
totals AS (
  SELECT sum(n_docs) AS total,
         sum(n_docs) // {STRAT_BUDGET_DIV} AS budget
  FROM counts
),
based AS (
  SELECT source, n_docs, budget,
         (budget * n_docs) // total AS base,
         (budget * n_docs) % total AS rem
  FROM counts, totals
),
alloc AS (
  SELECT source, n_docs,
         CAST(base + (row_number() OVER (ORDER BY rem DESC, source)
                      <= budget - sum(base) OVER ())::int AS BIGINT) AS quota
  FROM based
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::varchar), doc_id) AS rn
  FROM documents
),
picked AS (
  SELECT r.source, count(*) AS n_selected, min(r.doc_id) AS first_doc
  FROM ranked r JOIN alloc a USING (source)
  WHERE r.rn <= a.quota
  GROUP BY r.source
)
SELECT a.source, a.n_docs, a.quota,
       coalesce(p.n_selected, 0) AS n_selected,
       p.first_doc
FROM alloc a LEFT JOIN picked p USING (source)
ORDER BY a.source
"""


# ---------------------------------------------------------------------------
# weighted reservoir sample — A-ES (exponential-sort) top-K, hash-derived
# ---------------------------------------------------------------------------

RESERVOIR_K = 50


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement via the A-ES /
    Efraimidis–Spirakis exponential-sort key: each doc draws a
    deterministic uniform ``u = (h + 0.5) / 2^32`` (md5-derived ``h`` —
    never ``rand()``, so the sample is reproducible and
    partition-independent) and competes on ``key = ln(u) / w`` with
    weight ``w = n_chars``; the top-:data:`RESERVOIR_K` keys ARE a
    weighted sample without replacement.  This is the distributed
    replacement for a sequential reservoir: no state, no order
    dependence, pure top-k.

    Docs with ``n_chars <= 0`` carry no sampling mass and are excluded
    (the weight-domain invariant, mirrored in the oracle).

    Determinism: keys are ranked and emitted at nano fixed-point
    (``floor(key·1e9 + 0.5)``) with a doc_id tie-break — exact-dyadic
    ``u`` into ``ln``, fixed-point out (the ``zipf_slope`` discipline).

    Scale shape: a scan-side key projection plus ONE TakeOrdered top-K —
    ``orderBy().limit()`` compiles to per-partition partial top-K + a
    K-row driver merge, never a global sort; the rank window then runs
    over K rows only."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    u = (h.cast("double") + 0.5) / 4294967296.0
    key_micro = F.floor(F.log(u) / F.col("n_chars").cast("double") * 1000000000.0 + 0.5).cast(
        "long"
    )
    top = (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").alias("weight"), key_micro.alias("key_nano"))
        .orderBy(F.desc("key_nano"), F.asc("doc_id"))
        .limit(RESERVOIR_K)
    )
    w = Window.orderBy(F.desc("key_nano"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            "weight",
            (F.col("key_nano").cast("double") / 1000000000.0).alias("sel_key"),
        )
        .orderBy("rank")
    )


def weighted_reservoir_sample_sql() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
         CAST(floor(
           ln((('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint::double + 0.5)
              / 4294967296.0)
           / n_chars::double * 1000000000.0 + 0.5) AS BIGINT) AS key_nano
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, weight, key_nano,
         row_number() OVER (ORDER BY key_nano DESC, doc_id) AS rank
  FROM keyed
)
SELECT rank, doc_id, weight, key_nano::double / 1000000000.0 AS sel_key
FROM ranked
WHERE rank <= {RESERVOIR_K}
ORDER BY rank
"""


MIX_BUDGET_PCTS = (10, 30, 50, 70, 90)


def mixture_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning curve: at each token budget (% of the corpus),
    how many tokens each source receives under the temperature weights,
    whether its cap binds (allocation > available tokens ⇒ the source
    saturates and its surplus implicitly respreads), and its utilization
    — the table a data-mixture owner reads to pick the budget where the
    high-value small sources stop being starved (the budget axis is what
    :func:`temperature_mixture_weights` alone can't show).

    Exactness: allocations are integer-floor token counts from the
    micro-grid temperature weights (alloc = budget_tokens·w_micro div
    1e6 — integer arithmetic, no float rounding divergence); caps and
    utilizations are exact integer comparisons/ratios.

    Scale shape: the weight table is sources-bounded; the curve is a
    broadcast |grid| × sources expansion of that tiny frame."""
    from ..functions.money import ratio

    w = temperature_mixture_weights(spark, sf_dir).select(
        "source", "n_tokens", "temp_weight"
    )
    tot = w.agg(F.sum("n_tokens").alias("t"))
    grid = spark.createDataFrame(
        [(int(p),) for p in MIX_BUDGET_PCTS], "budget_pct int"
    )
    j = w.join(F.broadcast(tot)).crossJoin(F.broadcast(grid))
    # per-factor DECIMAL before the multiply: budget_tokens (≈1e14 at a
    # 100-TB corpus) × micro weight (≤1e6) wraps int64 silently on Spark
    # while DuckDB errors — the round-8 ADVICE overflow class
    alloc = F.expr(
        f"cast(cast(((t * budget_pct) div 100) as {DEC38}) * "
        f"cast(cast(floor(temp_weight * 1000000.0 + 0.5) as bigint) as {DEC38}) "
        "div 1000000 as bigint)"
    )
    binds = alloc > F.col("n_tokens")
    granted = F.least(alloc, F.col("n_tokens"))
    return j.select(
        "budget_pct",
        "source",
        F.col("n_tokens").alias("available_tokens"),
        alloc.alias("allocated_tokens"),
        granted.alias("granted_tokens"),
        binds.alias("cap_binding"),
        ratio(granted.cast("double"), F.col("n_tokens").cast("double"), 6).alias(
            "utilization"
        ),
    ).orderBy("budget_pct", "source")


def mixture_budget_curve_sql() -> str:
    from ..functions.money import ratio_sql

    pcts = ", ".join(f"({p})" for p in MIX_BUDGET_PCTS)
    return f"""
WITH w AS ({temperature_mixture_weights_sql()}),
tot AS (SELECT sum(n_tokens) AS t FROM w),
grid AS (SELECT * FROM (VALUES {pcts}) g(budget_pct)),
j AS (
  SELECT w.source, w.n_tokens, w.temp_weight, tot.t, g.budget_pct,
         CAST(((tot.t * g.budget_pct) // 100)::hugeint
           * CAST(floor(w.temp_weight * 1000000.0 + 0.5) AS BIGINT)::hugeint
           // 1000000 AS BIGINT) AS alloc
  FROM w, tot, grid g
)
SELECT budget_pct, source,
       CAST(n_tokens AS BIGINT) AS available_tokens,
       CAST(alloc AS BIGINT) AS allocated_tokens,
       CAST(least(alloc, n_tokens) AS BIGINT) AS granted_tokens,
       alloc > n_tokens AS cap_binding,
       {ratio_sql('least(alloc, n_tokens)::double', 'n_tokens::double', 6)}
         AS utilization
FROM j
ORDER BY budget_pct, source
"""


def dedup_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the soft-dedup weighting per source:
    ESS = (Σw)²/Σw² over the per-document 1/cluster_size weights — the
    number that says how many INDEPENDENT documents a source really
    contributes after duplicate down-weighting (ESS/n far below
    mass_retained means the weight distribution is lumpy: a few huge
    clusters, not uniform mild duplication — a different curation
    problem than :func:`soft_dedup_weights`' mass number shows).

    Exactness: weights are the same exact micro integers as
    soft_dedup_weights; Σw and Σw² are DECIMAL sums of per-factor-cast
    products; ESS is one double expression over them, micro-rounded.

    Scale shape: rides the cluster build; one per-source aggregation."""
    from ..functions.money import micro, ratio
    from .dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_size")
    weighted = (
        docs.join(clusters, "doc_id", "left")
        .withColumn("cluster_size", F.coalesce(F.col("cluster_size"), F.lit(1)))
        .withColumn(
            "w",
            F.floor(1000000.0 / F.col("cluster_size") + 0.5).cast("long"),
        )
    )
    agg = weighted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("sw"),
        F.sum(dec38(F.col("w")) * dec38(F.col("w"))).alias("sww"),
    )
    ess = (
        F.col("sw").cast("double") * F.col("sw").cast("double")
        / F.col("sww").cast("double")
    )
    return agg.select(
        "source",
        "n_docs",
        micro(ess).alias("ess"),
        ratio(ess, F.col("n_docs").cast("double"), 6).alias("ess_ratio"),
    ).orderBy("source")


def dedup_weight_ess_sql() -> str:
    from ..functions.money import micro_sql, ratio_sql
    from .dedup import _clusters_cte_sql

    ess = "(sw::double * sw::double / sww::double)"
    return f"""
WITH RECURSIVE {_clusters_cte_sql()},
weighted AS (
  SELECT d.doc_id, d.source,
         CAST(floor(1000000.0 / coalesce(s.cluster_size, 1) + 0.5) AS BIGINT) AS w
  FROM documents d
  LEFT JOIN labels l ON l.node = d.doc_id
  LEFT JOIN sizes s ON s.cluster_id = l.cluster_id
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(w) AS sw,
         sum(w::hugeint * w::hugeint) AS sww
  FROM weighted GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       {micro_sql(ess)} AS ess,
       {ratio_sql(ess, 'n_docs::double', 6)} AS ess_ratio
FROM agg
ORDER BY source
"""
