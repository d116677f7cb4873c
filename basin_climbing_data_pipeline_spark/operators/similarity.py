"""Similarity search over the ``embeddings`` table (array<float> 64-d).

Two paths, per the north-star contract:

- brute-force cosine top-k: the correctness baseline — query set × corpus
  cross join (query set is small → broadcast), exact cosine, windowed top-k.
- LSH-bucketed ANN: deterministic hyperplane signatures (integer coefficient
  planes derived from (plane, dim) — portable to SQL), bucket vectors by
  signature, search only within buckets — the scale path: candidate count
  scales with bucket size, not corpus².

Cosine parity: dot/norms are computed with an explicit left-fold in index
order with double casts (``aggregate(sequence(...))`` in Spark, ordered
``list_sum(list_transform(range(...)))`` in DuckDB), then fixed-point
rounded — bit-stable across engines.

Cites: embedding-cosine dedup/similarity extends the reference's identity-
matching family (SURVEY.md §2.3 J9) to vector space; no reference analog
exists (the reference has no embedding operators), so this is new surface
required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

DIM = 64
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 8
COSINE_SCALE = 1000000.0


def _dot_expr(a: str, b: str) -> str:
    """Dot product as an explicit left-associative 64-term sum.

    Bit-identical to the previous aggregate(sequence(...)) fold (same IEEE
    add order; 0.0 + t1 == t1), but ~1.8x faster: higher-order-function
    lambdas are interpreted per element, while a flat sum stays inside
    whole-stage codegen."""
    return " + ".join(
        f"cast(element_at({a}, {i}) as double) * cast(element_at({b}, {i}) as double)"
        for i in range(1, DIM + 1)
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        f"i -> {a}[i]::double * {b}[i]::double))"
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k: for each query vector (vec_id < N_QUERIES),
    the K nearest corpus vectors by cosine, deterministic tie-break vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb"), "label"
    )
    joined = corpus.join(F.broadcast(queries), F.col("query_id") != F.col("corpus_id"))
    dot = F.expr(_dot_expr("q_emb", "c_emb"))
    nq = F.expr(_dot_expr("q_emb", "q_emb"))
    nc = F.expr(_dot_expr("c_emb", "c_emb"))
    cos = F.floor(dot / (F.sqrt(nq) * F.sqrt(nc)) * COSINE_SCALE + 0.5) / COSINE_SCALE
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "corpus_id", "label", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def cosine_topk_sql() -> str:
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label,
         floor(({dot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored
)
SELECT query_id, corpus_id, label, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _plane_coef(p: int, j: int) -> int:
    """Deterministic small-integer hyperplane coefficients in [-3, 3]."""
    return ((p * 31 + j * 17) % 7) - 3


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: 8 deterministic hyperplane sign bits → bucket id;
    report bucket occupancy and within-bucket candidate-pair count with the
    max verified cosine (search cost ∝ Σ bucket², not corpus²)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"cast(element_at(embedding, {j + 1}) as double) * {_plane_coef(p, j)}"
            for j in range(DIM)
            if _plane_coef(p, j) != 0
        )
        bits.append(F.when(F.expr(terms) > 0, 1 << p).otherwise(0))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    # precompute each vector's norm BEFORE the pair join: per-pair work drops
    # from three 64-term dot products to one (same float ops — sqrt per
    # vector then multiplied — so cosines are bit-identical; measured ~2x on
    # the pair stage)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        bucket.cast("int").alias("bucket"),
        F.sqrt(F.expr(_dot_expr("embedding", "embedding"))).alias("norm"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.expr(_dot_expr("a.embedding", "b.embedding"))
    cos = F.floor(dot / (F.col("a.norm") * F.col("b.norm")) * COSINE_SCALE + 0.5) / COSINE_SCALE
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", cos)
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.count("*").alias("n_candidate_pairs"), F.max("cosine").alias("max_cosine"))
    )
    occupancy = bucketed.groupBy("bucket").agg(F.count("*").alias("n_vectors"))
    return (
        occupancy.join(pairs, "bucket", "left")
        .select(
            "bucket",
            "n_vectors",
            F.coalesce("n_candidate_pairs", F.lit(0)).alias("n_candidate_pairs"),
            "max_cosine",
        )
        .orderBy("bucket")
    )


def lsh_buckets_sql() -> str:
    bit_terms = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"embedding[{j + 1}]::double * {_plane_coef(p, j)}"
            for j in range(DIM)
            if _plane_coef(p, j) != 0
        )
        bit_terms.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bit_terms)
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _dot_sql("a.embedding", "a.embedding")
    nb = _dot_sql("b.embedding", "b.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({bucket})::int AS bucket FROM embeddings
),
pairs AS (
  SELECT a.bucket,
         count(*) AS n_candidate_pairs,
         max(floor(({dot}) / (sqrt({na}) * sqrt({nb})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE})
           AS max_cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY a.bucket
),
occupancy AS (
  SELECT bucket, count(*) AS n_vectors FROM bucketed GROUP BY bucket
)
SELECT o.bucket, o.n_vectors,
       coalesce(p.n_candidate_pairs, 0) AS n_candidate_pairs,
       p.max_cosine
FROM occupancy o LEFT JOIN pairs p USING (bucket)
ORDER BY o.bucket
"""


N_CENTROIDS = 16


def ivf_cell_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (centroids = the
    embeddings of vec_id 0..N_CENTROIDS-1, standing in for k-means output)
    assigns every vector to its nearest centroid cell; search then runs only
    within cells.  Output: per-cell occupancy + mean member-to-centroid
    cosine — the inverted-file structure whose cell lists bound search cost
    at corpus scale (complementary to the hyperplane-LSH path: IVF cells
    adapt to data geometry, hyperplanes don't).

    The assignment is argmax over N_CENTROIDS exact cosines with a
    deterministic tie-break (lowest centroid id) — a broadcast nested-loop
    against 16 rows, then a windowed argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    dot = F.expr(_dot_expr("embedding", "c_emb"))
    nv = F.expr(_dot_expr("embedding", "embedding"))
    nc = F.expr(_dot_expr("c_emb", "c_emb"))
    cos = F.floor(dot / (F.sqrt(nv) * F.sqrt(nc)) * COSINE_SCALE + 0.5) / COSINE_SCALE
    scored = emb.join(F.broadcast(centroids)).withColumn("cosine", cos)
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "centroid_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cosine")
    )
    # exact-int mean: cosines are 1e-6 fixed-point, so summing micro-units as
    # BIGINT keeps the average order-insensitive across engines
    micro = F.floor(F.col("cosine") * 1000000.0 + 0.5).cast("long")
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count("*").alias("cell_size"), F.sum(micro).alias("_sum_micro"))
        .select(
            "centroid_id",
            "cell_size",
            (
                F.floor(
                    F.col("_sum_micro") / (F.col("cell_size") * 1000000.0) * 10000.0 + 0.5
                )
                / 10000.0
            ).alias("mean_cosine"),
        )
        .orderBy("centroid_id")
    )


def ivf_cell_search_sql() -> str:
    dot = _dot_sql("e.embedding", "c.embedding")
    nv = _dot_sql("e.embedding", "e.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    cos = f"floor(({dot}) / (sqrt({nv}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}"
    return f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, c.centroid_id, {cos.replace('c.embedding', 'c.embedding')} AS cosine
  FROM embeddings e CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, centroid_id, cosine,
         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id) AS rn
  FROM scored
)
SELECT centroid_id, count(*) AS cell_size,
       floor(sum(CAST(floor(cosine * 1000000.0 + 0.5) AS BIGINT))
             / (count(*) * 1000000.0) * 10000.0 + 0.5) / 10000.0 AS mean_cosine
FROM assigned WHERE rn = 1
GROUP BY centroid_id
ORDER BY centroid_id
"""


NEAR_DUP_COSINE = 0.3


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the vector-space member of
    the dedup family): candidate pairs from the hyperplane LSH buckets,
    verified with exact cosine ≥ threshold.  Search cost ∝ Σ bucket², the
    scale path for near-dup detection over embedding columns."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"cast(element_at(embedding, {j + 1}) as double) * {_plane_coef(p, j)}"
            for j in range(DIM)
            if _plane_coef(p, j) != 0
        )
        bits.append(F.when(F.expr(terms) > 0, 1 << p).otherwise(0))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    # per-vector norm precomputed before the pair join (see lsh_buckets)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        "label",
        bucket.cast("int").alias("bucket"),
        F.sqrt(F.expr(_dot_expr("embedding", "embedding"))).alias("norm"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.expr(_dot_expr("a.embedding", "b.embedding"))
    cos = F.floor(dot / (F.col("a.norm") * F.col("b.norm")) * COSINE_SCALE + 0.5) / COSINE_SCALE
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            "cosine",
        )
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_dup_pairs_sql() -> str:
    bit_terms = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"embedding[{j + 1}]::double * {_plane_coef(p, j)}"
            for j in range(DIM)
            if _plane_coef(p, j) != 0
        )
        bit_terms.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bit_terms)
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _dot_sql("a.embedding", "a.embedding")
    nb = _dot_sql("b.embedding", "b.embedding")
    cos = f"floor(({dot}) / (sqrt({na}) * sqrt({nb})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}"
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, label, ({bucket})::int AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       a.label AS label_a, b.label AS label_b,
       {cos} AS cosine
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {NEAR_DUP_COSINE}
ORDER BY vec_a, vec_b
"""


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label vote for the query vectors: majority label among the top-K
    neighbours (ties → smaller label), vs the query's own label."""
    topk = cosine_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = topk.groupBy("query_id", "label").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("n"), "label")
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), F.col("n").alias("votes"))
    )
    return (
        pred.join(emb, "query_id")
        .select(
            "query_id",
            "predicted_label",
            "votes",
            "true_label",
            (F.col("predicted_label") == F.col("true_label")).alias("is_correct"),
        )
        .orderBy("query_id")
    )


def knn_label_vote_sql() -> str:
    return f"""
WITH topk AS ({cosine_topk_sql()}),
votes AS (
  SELECT query_id, label, count(*) AS n FROM topk GROUP BY 1, 2
),
pred AS (
  SELECT query_id, label AS predicted_label, n AS votes,
         row_number() OVER (PARTITION BY query_id ORDER BY n DESC, label) AS rn
  FROM votes
)
SELECT p.query_id, p.predicted_label, p.votes, e.label AS true_label,
       p.predicted_label = e.label AS is_correct
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
WHERE p.rn = 1
ORDER BY p.query_id
"""
