"""Similarity search over the ``embeddings`` table (array<float> 64-d).

INPUT INVARIANT — nonzero vectors: every operator in this module (cosine,
int8 quantization scale, LSH signs) divides by a vector norm or max-|v|
and assumes no all-zero embedding exists.  A zero vector would yield
Spark NULL vs DuckDB NaN/inf cosines (divergent cross-engine semantics)
and carries no direction to search by; a production ingest must drop or
re-embed zero vectors before this stage, exactly as FAISS requires for
its inner-product indexes.  The driver corpus satisfies the invariant by
construction (verified: min L2 norm > 0 at sf0.01/sf0.1).  Magnitude
envelope: the integer-micro arithmetic (floor(x*1e6)) keeps 64-dim
squared distances and dot products inside int64 while
64·(2·|x|·1e6)² < 2^63, i.e. |x| ≲ 150; fuzz-verified green through
|x| ≈ 30 on mixed-magnitude corpora, and embeddings are unit-normalized
here anyway — re-scale at ingest if a source emits larger coordinates.

Two paths, per the north-star contract:

- brute-force cosine top-k: the correctness baseline — query set × corpus
  cross join (query set is small → broadcast), exact cosine, windowed top-k.
- LSH-bucketed ANN: deterministic hyperplane sign signatures bucket the
  vectors; search runs only within buckets, so candidate count scales with
  bucket occupancy, not corpus².  The plane count is DERIVED FROM CORPUS
  SIZE (``_planes_for``): R = ceil(log2(N / TARGET_OCCUPANCY)) keeps the
  expected bucket size ≈ TARGET_OCCUPANCY at any N, so candidate volume is
  ~N·occ/2 — linear in corpus size (at N=1e9 that's R≈24, 16M buckets).
  Near-dup detection additionally uses N_BANDS independent signature bands
  (MinHash-style banding, dedup.py:219) and unions candidates — the recall
  knob — before a single exact-verify pass.

Engineering notes (measured, sf0.1):

- The PER-PAIR dot product is a JVM higher-order-function fold
  (``aggregate(zip_with(...))``, see ``_dot64``), not an inlined 64-term
  column expression (blows janino's 64 KB method limit, costs Catalyst
  seconds on 500+-term trees) and not a Pandas UDF (pair rows arrive
  after a join, in small irregular batches — Python worker spin-up +
  Arrow round-trips measured 3.4x slower cold on the sf0.1 pair stage).
- The fold order inside ``_dot64`` is a strict left fold across dimensions,
  bit-identical to DuckDB's ``list_sum(list_transform(...))`` (verified
  over 80k pairs) — so the 1e-6 fixed-point rounded cosines hash
  identically across engines.
- The PER-VECTOR signature build (``_band_buckets``) is the opposite
  shape — one dense corpus × coefficient-matrix product — so it IS an
  Arrow-batched numpy matmul, in exact int64 micro units: the integer
  sums are order-insensitive, which is precisely what makes vectorizing
  them safe (a float fold's sign near zero depends on add order).
  Measured 4.6 s → ~0.1 s on the sf0.1 signature build.
- Norms are computed once per vector BEFORE any pair join (sqrt of the same
  fold), so per-pair work is one dot, not three.
- Hyperplane coefficients mix plane and dimension through a Knuth
  multiplicative hash onto {-4..4}\\{0}.  (A previous (3(p+j)) mod 7 form
  made every 7th plane identical — planes must be pairwise independent for
  the occupancy math to hold.)

Cites: embedding-cosine dedup/similarity extends the reference's identity-
matching family (SURVEY.md §2.3 J9) to vector space; no reference analog
exists (the reference has no embedding operators), so this is new surface
required by BASELINE.json.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec38, dec38_prod
from ..io import load_table

DIM = 64
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_CENTROIDS = 16
N_BANDS = 2
TARGET_OCCUPANCY = 64
MIN_PLANES = 4
COSINE_SCALE = 1000000.0
NEAR_DUP_COSINE = 0.3
_MIX = 2654435761  # Knuth multiplicative hash constant


def _planes_for(n: int) -> int:
    """Rows-per-band R so that E[bucket size] = N / 2^R ≈ TARGET_OCCUPANCY."""
    if n <= TARGET_OCCUPANCY:
        return MIN_PLANES
    return max(MIN_PLANES, math.ceil(math.log2(n / float(TARGET_OCCUPANCY))))


_CORPUS_ROWS: dict[str, int] = {}


def _corpus_rows(spark: SparkSession, sf_dir: str) -> int:
    """Embedding-corpus row count for plane sizing, computed ONCE per sf_dir
    (it's a plan-build parameter, not per-call work).  Reads the parquet
    footer statistics when possible — a metadata-only read, no Spark job —
    falling back to a count() for non-file layouts."""
    import os as _os

    key = _os.path.abspath(sf_dir)
    if key not in _CORPUS_ROWS:
        try:
            import pyarrow.parquet as _pq

            n = _pq.ParquetFile(_os.path.join(key, "embeddings.parquet")).metadata.num_rows
        except Exception:
            n = load_table(spark, sf_dir, "embeddings").count()
        _CORPUS_ROWS[key] = n
    return _CORPUS_ROWS[key]


_PLANES_SQL = (
    f"SELECT greatest({MIN_PLANES}, "
    f"CAST(ceil(log2(count(*) / {float(TARGET_OCCUPANCY)})) AS INTEGER)) AS r "
    "FROM embeddings"
)


# ---------------------------------------------------------------------------
# exact vector math — Arrow-batched, fold-order-stable
# ---------------------------------------------------------------------------


def _dot64(a: Column, b: Column) -> Column:
    """Exact float64 dot product as a strict left fold across dimensions:
    ``aggregate(zip_with(a, b, *), 0.0, +)``.

    JVM higher-order functions — no Python workers, no Arrow transfer, and a
    tiny expression tree (an inlined 64-term sum blows janino's 64 KB method
    limit and costs Catalyst seconds on 500+-term trees; a Pandas UDF pays
    worker spin-up + Arrow round-trips that dominate small batches and
    measured 3.4x slower cold on the sf0.1 pair stage).  The fold order is
    the same IEEE add order as DuckDB's ``list_sum(list_transform(...))``
    left fold — verified bit-identical over 80k pairs — so the 1e-6
    fixed-point cosines hash identically across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        f"i -> {a}[i]::double * {b}[i]::double))"
    )


def _cosine(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    return F.floor(dot / (norm_a * norm_b) * COSINE_SCALE + 0.5) / COSINE_SCALE


def _with_norm(emb: DataFrame, cols: list[str]) -> DataFrame:
    """Project vec metadata + the precomputed L2 norm (one dot per vector)."""
    return emb.select(*cols, F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"))


# ---------------------------------------------------------------------------
# brute-force exact top-k (correctness baseline)
# ---------------------------------------------------------------------------


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k: for each query vector (vec_id < N_QUERIES),
    the K nearest corpus vectors by cosine, deterministic tie-break vec_id.
    Norms are precomputed per side so the pair stage is one dot, and the
    10-row query side is broadcast — the exact-search plan that still works
    when the corpus is 1e9 rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id", "embedding", "label", F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm")
    )
    queries = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    corpus = with_norm.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "label",
    )
    joined = corpus.join(F.broadcast(queries), F.col("query_id") != F.col("corpus_id"))
    cos = _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm"))
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


# ---------------------------------------------------------------------------
# hyperplane LSH — corpus-size-parameterized signatures
# ---------------------------------------------------------------------------


def _plane_coefs(plane: int) -> list[float]:
    """Deterministic hyperplane coefficients in {-4..-1, 1..4} for a global
    plane index, one per dimension.

    Two multiply-xor avalanche rounds over h = plane·DIM + j, then the low 3
    bits.  A single multiplicative hash is NOT enough here: taking
    ``(h·C) mod 8`` depends only on ``h mod 8`` (C odd), which made every
    plane identical, and taking high bits leaves planes shift-correlated
    (the products form a Weyl sequence in h).  Computed in PYTHON at plan
    build and shipped as the ``_band_buckets`` UDF's coefficient matrix:
    the coefficients depend only on (plane, j), so nothing re-derives the
    hash chain per row.  ``_coef_sql`` keeps the same integer arithmetic
    (everything below 2^63) so the DuckDB oracle derives identical values."""
    out = []
    for j in range(DIM):
        h = plane * DIM + j
        a = (h * _MIX) % 4294967296
        b = ((a ^ (a >> 13)) * 1597334677) % 4294967296
        v = (b ^ (b >> 16)) % 8
        out.append(float(v - 4 if v < 4 else v - 3))
    return out


def _coef_sql(plane_expr: str, j_expr: str) -> str:
    h = f"(({plane_expr}) * {DIM} + ({j_expr}))::BIGINT"
    a = f"(({h} * {_MIX}) % 4294967296)"
    b = f"((xor({a}, {a} >> 13) * 1597334677) % 4294967296)"
    v = f"(xor({b}, {b} >> 16) % 8)"
    return f"(CASE WHEN ({v}) < 4 THEN ({v}) - 4 ELSE ({v}) - 3 END)::BIGINT"


SIGN_MICRO = 1_000_000  # micro-unit quantization for hyperplane sign sums


def _band_buckets(n_planes: int, n_bands: int = N_BANDS) -> Column:
    """All bands' bucket signatures for the row's ``embedding`` in one
    Arrow-batched pass: ``array<int>`` indexed by band, each bucket the
    packed sign bits of that band's n_planes hyperplane sums.

    Plane sums are EXACT INTEGER dot products in micro units
    (floor(x·1e6 + 0.5) per dimension × integer coefficients in {-4..4}):
    order-insensitive under any partitioning or SIMD regrouping — unlike a
    float fold, whose sign near zero depends on IEEE add order — so the
    buckets are bit-identical across engines by arithmetic, not by
    matching fold order.  That order-freedom is what makes it safe to
    compute the whole (batch × planes) product as one int64 numpy matmul:
    the previous JVM higher-order-function fold paid interpreted
    evaluation per (row, plane) and measured 4.6 s for a mere
    2k × 10-plane signature build; this runs the same arithmetic in ~0.1 s
    and scales as a narrow map stage at any corpus size.  |sum| ≤
    64·4·max|x|·1e6 — far inside int64."""
    total = n_bands * n_planes
    cmat = np.array([_plane_coefs(p) for p in range(total)], dtype=np.int64)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        if emb.empty:  # np.stack raises on an empty batch
            return pd.Series([], dtype=object)
        em = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        micro = np.floor(em * SIGN_MICRO + 0.5).astype(np.int64)
        bits = (micro @ cmat.T > 0).astype(np.int64)
        packed = bits.reshape(len(em), n_bands, n_planes) @ weights
        return pd.Series([row.astype(np.int32).tolist() for row in packed])

    return buckets(F.col("embedding"))


def _band_bucket_sql(band_expr: str) -> str:
    """DuckDB mirror of :func:`_band_buckets` with the plane count taken
    from the ``params`` CTE (column ``r``) — the SQL stays valid at any
    corpus size the driver runs it at.  Same exact-integer micro-unit
    arithmetic, so engine parity holds for ANY summation order."""
    plane = f"(({band_expr}) * r + rr)"
    inner = (
        f"list_sum(list_transform(range(0, {DIM}), "
        f"j -> CAST(floor(embedding[j + 1]::double * {SIGN_MICRO} + 0.5) AS BIGINT)"
        f" * {_coef_sql(plane, 'j')}))"
    )
    return (
        "CAST(list_sum(list_transform(range(0, r), "
        f"rr -> CASE WHEN ({inner}) > 0 THEN (1::BIGINT << rr) ELSE 0 END)) AS INTEGER)"
    )


def lsh_buckets(spark: SparkSession, sf_dir: str, n_planes: int | None = None) -> DataFrame:
    """ANN scale path: R corpus-size-derived hyperplane sign bits → bucket
    id; report bucket occupancy and within-bucket candidate-pair count with
    the max verified cosine (search cost ∝ Σ bucket², held ≈ N·occ by
    deriving R from N)."""
    emb = load_table(spark, sf_dir, "embeddings")
    r = n_planes if n_planes is not None else _planes_for(_corpus_rows(spark, sf_dir))
    bucketed = emb.select(
        "vec_id",
        "embedding",
        _band_buckets(r, n_bands=1)[0].alias("bucket"),
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.bucket").alias("bucket"),
        _cosine(
            _dot64(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.norm"),
            F.col("b.norm"),
        ).alias("cosine"),
    )
    pair_stats = pairs.groupBy("bucket").agg(
        F.count("*").alias("n_candidate_pairs"), F.max("cosine").alias("max_cosine")
    )
    occupancy = bucketed.groupBy("bucket").agg(F.count("*").alias("n_vectors"))
    return (
        occupancy.join(pair_stats, "bucket", "left")
        .select(
            "bucket",
            "n_vectors",
            F.coalesce("n_candidate_pairs", F.lit(0)).alias("n_candidate_pairs"),
            "max_cosine",
        )
        .orderBy("bucket")
    )


def lsh_buckets_sql(n_planes: int | None = None) -> str:
    params = f"SELECT {n_planes} AS r" if n_planes is not None else _PLANES_SQL
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _dot_sql("a.embedding", "a.embedding")
    nb = _dot_sql("b.embedding", "b.embedding")
    return f"""
WITH params AS ({params}),
bucketed AS (
  SELECT vec_id, embedding, {_band_bucket_sql("0")} AS bucket
  FROM embeddings, params
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


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, n_planes: int | None = None
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the vector-space member of
    the dedup family): candidate pairs from N_BANDS independent hyperplane
    signature bands (banding = recall; see the MinHash path, dedup.py:219),
    deduplicated, then ONE exact-cosine verify pass ≥ threshold.

    Scale shape: per band, candidates ≈ N·occupancy/2 (R derived from N);
    the distinct is an equi-shuffle on the pair key; the verify joins are
    equi-joins on vec_id against the norm-annotated corpus — every stage is
    linear in N at fixed occupancy."""
    from ..io import tracked_persist

    emb = load_table(spark, sf_dir, "embeddings")
    r = n_planes if n_planes is not None else _planes_for(_corpus_rows(spark, sf_dir))

    # all bands' buckets in ONE corpus pass (vectorized signature UDF, then
    # posexplode in a SEPARATE projection — same select would compile to
    # Project-above-Generate and re-run the UDF per band), then ONE
    # self-join keyed on (band, bucket) — same candidate set as a
    # join-per-band + union, but half the join stages; the tiny (vec_id,
    # band, bucket) table is cached so the signature matmul computes once
    # instead of once per join side
    sig = tracked_persist(
        emb.select("vec_id", _band_buckets(r).alias("bks")).select(
            "vec_id", F.posexplode("bks").alias("band", "bucket")
        )
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )

    # cached: the x/y verify sides otherwise each recompute every vector's
    # norm fold (two full corpus passes for one small table)
    norms = tracked_persist(_with_norm(emb, ["vec_id", "embedding", "label"]))
    x = norms.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("label").alias("label_a"),
        F.col("norm").alias("norm_a"),
    )
    y = norms.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("label").alias("label_b"),
        F.col("norm").alias("norm_b"),
    )
    return (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
        .withColumn(
            "cosine",
            _cosine(_dot64(F.col("emb_a"), F.col("emb_b")), F.col("norm_a"), F.col("norm_b")),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .select("vec_a", "vec_b", "label_a", "label_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_dup_pairs_sql(n_planes: int | None = None) -> str:
    params = f"SELECT {n_planes} AS r" if n_planes is not None else _PLANES_SQL
    dot = _dot_sql("x.embedding", "y.embedding")
    nx = _dot_sql("x.embedding", "x.embedding")
    ny = _dot_sql("y.embedding", "y.embedding")
    cos = f"floor(({dot}) / (sqrt({nx}) * sqrt({ny})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}"
    return f"""
WITH params AS ({params}),
sig AS (
  SELECT e.vec_id, bands.band, {_band_bucket_sql("bands.band")} AS bucket
  FROM embeddings e, params,
       (VALUES {", ".join(f"({b})" for b in range(N_BANDS))}) AS bands(band)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b, x.label AS label_a, y.label AS label_b, {cos} AS cosine
FROM cand c
JOIN embeddings x ON x.vec_id = c.vec_a
JOIN embeddings y ON y.vec_id = c.vec_b
WHERE {cos} >= {NEAR_DUP_COSINE}
ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# IVF cells
# ---------------------------------------------------------------------------


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
    against 16 norm-annotated rows, then a windowed argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id", "embedding", F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm")
    )
    centroids = with_norm.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _cosine(_dot64(F.col("embedding"), F.col("c_emb")), F.col("norm"), F.col("c_norm"))
    scored = with_norm.join(F.broadcast(centroids)).withColumn("cosine", cos)
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
  SELECT e.vec_id, c.centroid_id, {cos} AS cosine
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


# ---------------------------------------------------------------------------
# k-means refinement (Lloyd's iterations for the IVF coarse quantizer)
# ---------------------------------------------------------------------------

KMEANS_ITERS = 2
MICRO = 1_000_000


def _micro_embedding() -> Column:
    """Embedding as exact micro-unit BIGINTs: floor(x*1e6 + 0.5) per dim.
    Integer arithmetic makes every distance and every centroid mean
    bit-identical across engines AND across partitionings — a float mean is
    summation-order-dependent, which on a 1000-executor cluster means two
    runs of the same k-means disagree.  |x| <= 1 here, so squared micro
    distances stay ~6.4e13 over 64 dims — far inside BIGINT."""
    return F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * MICRO + 0.5).cast("long"),
    )


def _nearest_centroid(cent_rows: list[tuple[int, list[int]]]) -> Column:
    """Nearest-centroid id for the row's ``e`` (micro-unit BIGINTs) by
    exact integer squared L2, tie-break lowest cluster id — centroids ride
    the UDF closure (the MLlib k-means shape: data never shuffles or joins
    for assignment), and the distance scan is an Arrow-batched int64
    numpy matmul.

    Why a pandas UDF when ``_dot64`` deliberately is not: assignment is a
    DENSE (batch x k x d) product against one shared constant matrix —
    numpy does it as one vectorized matmul per Arrow batch, where the
    column-expression form pays interpreted higher-order-function
    evaluation per (row, centroid): measured 1.5-2 s per pass over a mere
    2k x 16 x 64 corpus vs ~0.1 s here.  All arithmetic stays int64
    (|micro| <= 1e6 -> dot terms <= 6.4e13), so results remain
    bit-identical to the DuckDB oracle and to any partitioning."""
    cmat = np.array([c for _cid, c in cent_rows], dtype=np.int64)
    cids = np.array([cid for cid, _c in cent_rows], dtype=np.int64)
    c2 = (cmat * cmat).sum(axis=1)

    @F.pandas_udf("long")
    def nearest(e: pd.Series) -> pd.Series:
        if e.empty:  # np.stack raises on an empty batch
            return pd.Series([], dtype="int64")
        em = np.stack([np.asarray(v, dtype=np.int64) for v in e])
        # argmin over dist^2 = |e|^2 - 2 e.c + |c|^2; |e|^2 is constant per
        # row, so rank by (-2 e.c + |c|^2).  np.argmin returns the FIRST
        # minimum and cent_rows is sorted by cid -> lowest-cid tie-break.
        scores = c2[None, :] - 2 * (em @ cmat.T)
        return pd.Series(cids[np.argmin(scores, axis=1)])

    return nearest(F.col("e"))


def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means: KMEANS_ITERS assign/update rounds from the same
    deterministic seeds ivf_cell_search uses (vec_id < N_CENTROIDS), then a
    final assignment.  Upgrades the IVF coarse quantizer from "seeds
    standing in for k-means output" to actual k-means — the iterative-
    algorithm pattern (driver-coordinated loop, data distributed,
    localCheckpoint per round) shared with dedup_clusters.

    Centroid update = per-dimension floor(sum/n) in micro units: the sum is
    an exact BIGINT (order-insensitive under any partitioning) and the one
    floating division per (cluster, dim) is floored — so the trajectory is
    reproducible run-to-run and engine-to-engine, which float means are
    not.  Output: final cluster sizes + centroids (micro units)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _micro_embedding().alias("e")
    )
    from ..io import tracked_persist

    emb = tracked_persist(emb)  # reused by every round's assignment
    # seed centroids + per-round updated centroids live on the DRIVER as a
    # k x DIM int table (16 x 64 longs here) and are inlined into each
    # round's plan as literals — the canonical Spark k-means loop (MLlib
    # does exactly this with a broadcast).  The only per-round collect is
    # this bounded k x DIM fetch; the data side runs ONE shuffle per round
    # (the partial-aggregated groupBy(cluster_id, dim)) instead of three.
    cent_rows = sorted(
        (int(r["cluster_id"]), list(r["c"]))
        for r in emb.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("cluster_id"), F.col("e").alias("c"))
        .collect()
    )
    import math

    for _ in range(KMEANS_ITERS):
        # ROUND-12 OPTIMIZATION (guide §2.3): the old update posexploded
        # every vector into corpus×DIM (dim, val) rows before the
        # groupBy(cluster, dim) — a 64x row inflation feeding the
        # exchange.  DIM per-dimension sums inside ONE
        # groupBy(cluster_id) aggregate map-side-combine to k rows per
        # partition with no inflation; floor(sum/ n) replays the same
        # long→double cast, IEEE divide and floor on the driver, so the
        # centroid trajectory (and the oracle-checked output) is
        # bit-identical.  Assignment stays in its OWN select (the
        # Project-above-Generate 64x re-evaluation trap the old comment
        # documents is gone with the explode, but the distance argmax
        # still only needs evaluating once per vector).
        assigned = emb.select(_nearest_centroid(cent_rows).alias("cluster_id"), "e")
        per_cl = assigned.groupBy("cluster_id").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("e", i + 1)).alias(f"s{i}") for i in range(DIM)],
        )
        cent_rows = sorted(
            (
                int(r["cluster_id"]),
                [
                    int(math.floor(float(int(r[f"s{i}"])) / float(int(r["n"]))))
                    for i in range(DIM)
                ],
            )
            for r in per_cl.collect()
        )
    sizes = (
        emb.select(_nearest_centroid(cent_rows).alias("cluster_id"))
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"))
    )
    cents = spark.createDataFrame(
        cent_rows, "cluster_id bigint, centroid_arr array<bigint>"
    )
    # centroid serialized as a comma-joined string, not array<bigint>: the
    # driver's canonicalizer sorts result columns with pandas, which cannot
    # hash list cells — and a flat string hashes identically across engines.
    return (
        cents.join(sizes, "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            F.array_join(
                F.transform("centroid_arr", lambda x: x.cast("string")), ","
            ).alias("centroid_micro"),
        )
        .orderBy("cluster_id")
    )


def kmeans_refine_sql() -> str:
    def assign(emb: str, cents: str, out: str) -> str:
        return f"""
{out}_d AS (
  SELECT {emb}.vec_id, {cents}.cluster_id,
         list_sum(list_transform(range(1, {DIM + 1}),
                  i -> (e[i] - c[i]) * (e[i] - c[i]))) AS dist
  FROM {emb} CROSS JOIN {cents}
),
{out} AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
    FROM {out}_d
  ) WHERE rn = 1
)"""

    def update(asg: str, out: str) -> str:
        return f"""
{out} AS (
  SELECT cluster_id, list(m ORDER BY dim) AS c FROM (
    SELECT {asg}.cluster_id, t.i AS dim,
           CAST(floor(sum(e[t.i])::double / count(*)) AS BIGINT) AS m
    FROM {asg} JOIN emb USING (vec_id), unnest(range(1, {DIM + 1})) t(i)
    GROUP BY {asg}.cluster_id, t.i
  ) GROUP BY cluster_id
)"""

    return f"""
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x::double * {MICRO} + 0.5) AS BIGINT)) AS e
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster_id, e AS c FROM emb WHERE vec_id < {N_CENTROIDS}),
{assign('emb', 'c0', 'a1')},
{update('a1', 'c1')},
{assign('emb', 'c1', 'a2')},
{update('a2', 'c2')},
{assign('emb', 'c2', 'a3')}
SELECT c2.cluster_id, count(*) AS n_members,
       array_to_string(c2.c, ',') AS centroid_micro
FROM a3 JOIN c2 USING (cluster_id)
GROUP BY c2.cluster_id, c2.c
ORDER BY c2.cluster_id
"""


# ---------------------------------------------------------------------------
# ANN recall evaluation — measured quality of the approximate path
# ---------------------------------------------------------------------------


def _lsh_query_candidates(
    spark: SparkSession, sf_dir: str, n_planes: int | None = None
) -> DataFrame:
    """The banded hyperplane-LSH candidate set for the query vectors:
    (query_id, corpus_id) for every corpus vector sharing ANY band bucket
    with a query — the generation stage both ANN evals (recall, NDCG)
    grade.  Probe side is N_QUERIES x N_BANDS rows, broadcast into an
    equi-join on (band, bucket)."""
    emb = load_table(spark, sf_dir, "embeddings")
    r = n_planes if n_planes is not None else _planes_for(_corpus_rows(spark, sf_dir))
    # signature UDF in its own projection, posexplode above it (see
    # embedding_near_dup_pairs for the Project-above-Generate trap)
    sig = emb.select("vec_id", _band_buckets(r).alias("bks")).select(
        "vec_id", F.posexplode("bks").alias("band", "bucket")
    )
    qsig = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    return (
        sig.join(F.broadcast(qsig), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("corpus_id"))
        .distinct()
    )


def ann_recall_eval(
    spark: SparkSession, sf_dir: str, n_planes: int | None = None
) -> DataFrame:
    """Measured recall of the banded hyperplane-LSH candidate generator
    against brute-force ground truth — the eval query every approximate
    operator should ship with (a recall knob you never measure is a recall
    knob you don't have).

    For each query vector (vec_id < N_QUERIES): ground truth = exact
    cosine top-k (:func:`cosine_topk`); candidates = corpus vectors
    sharing ANY of the N_BANDS band buckets with the query (the exact
    candidate set :func:`embedding_near_dup_pairs` would verify).  Output
    per query: candidate count, hits inside the top-k, and recall@k in
    exact micro units — integer math end to end so the row hashes match
    the DuckDB oracle bit-for-bit.

    Scale shape: the probe side is N_QUERIES x N_BANDS rows broadcast
    into an equi-join on (band, bucket); candidate volume per query ≈
    N_BANDS x occupancy (corpus-size-derived R holds occupancy constant),
    and the top-k join is a broadcast of k x N_QUERIES rows."""
    cand = _lsh_query_candidates(spark, sf_dir, n_planes)
    from ..io import tracked_persist

    # truth is consumed twice (hit counting + the query spine); cache the
    # k x N_QUERIES rows so the brute-force scan — the expensive deliberate
    # BroadcastNestedLoop over the 10-row query side — runs once
    truth = tracked_persist(cosine_topk(spark, sf_dir).select("query_id", "corpus_id"))
    hits = (
        truth.join(cand, ["query_id", "corpus_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_cand = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    spine = truth.select("query_id").distinct()
    return (
        spine.join(n_cand, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.floor(
                F.coalesce("n_hits", F.lit(0)) * 1000000.0 / TOP_K
            ).cast("long").alias("recall_micro"),
        )
        .orderBy("query_id")
    )


def ann_recall_eval_sql(n_planes: int | None = None) -> str:
    params = f"SELECT {n_planes} AS r" if n_planes is not None else _PLANES_SQL
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    return f"""
WITH params AS ({params}),
sig AS (
  SELECT e.vec_id, bands.band, {_band_bucket_sql("bands.band")} AS bucket
  FROM embeddings e, params,
       (VALUES {", ".join(f"({b})" for b in range(N_BANDS))}) AS bands(band)
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, s.vec_id AS corpus_id
  FROM sig q JOIN sig s ON q.band = s.band AND q.bucket = s.bucket
  WHERE q.vec_id < {N_QUERIES} AND s.vec_id != q.vec_id
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         floor(({dot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
truth AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
hits AS (
  SELECT t.query_id, count(*) AS n_hits
  FROM truth t JOIN cand USING (query_id, corpus_id)
  GROUP BY t.query_id
),
n_cand AS (
  SELECT query_id, count(*) AS n_candidates FROM cand GROUP BY query_id
)
SELECT s.query_id,
       coalesce(n.n_candidates, 0) AS n_candidates,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST(floor(coalesce(h.n_hits, 0) * 1000000.0 / {TOP_K}) AS BIGINT)
         AS recall_micro
FROM (SELECT DISTINCT query_id FROM truth) s
LEFT JOIN n_cand n USING (query_id)
LEFT JOIN hits h USING (query_id)
ORDER BY s.query_id
"""


# NDCG position gains, micro-rounded IN PYTHON so both engines consume the
# SAME integer literals — the one transcendental (log2) never runs inside
# either engine, the zipf/entropy exactness discipline taken one step
# further.  Binary relevance: ideal DCG = all TOP_K positions relevant.
NDCG_GAIN_MICRO: tuple[int, ...] = tuple(
    int(math.floor(1_000_000 / math.log2(i + 1) + 0.5)) for i in range(1, TOP_K + 1)
)
IDCG_MICRO = sum(NDCG_GAIN_MICRO)


def ann_ndcg_eval(
    spark: SparkSession, sf_dir: str, n_planes: int | None = None
) -> DataFrame:
    """Rank-aware quality of the full serving path — LSH candidate
    generation + exact cosine re-rank + top-k cut — as binary NDCG@k
    against brute-force ground truth.  Recall@k (:func:`ann_recall_eval`)
    grades the candidate SET; this grades the ORDER the user actually
    sees: a true neighbor surfaced at rank 1 is worth ~2.6x one at rank 5
    (1/log2(i+1) gains), which is the number a retrieval dashboard wants.

    Exactness: position gains are micro-int constants precomputed in
    Python (identical literals in both engines), relevance is an exact
    set-membership test against the true top-k, so DCG is an exact
    integer sum and NDCG an integer division — bit-identical hashes.

    Scale shape: candidates ≈ N_BANDS x occupancy per query; the re-rank
    joins candidates to the two vector sides on their keys (query side
    broadcast), one window over per-query candidate counts, one k-row
    semi-join for relevance.  Corpus-sized work appears only in the
    ground-truth scan, which is the eval's bounded deliberate cost."""
    cand = _lsh_query_candidates(spark, sf_dir, n_planes)
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    q = with_norm.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "corpus_id")
        .withColumn(
            "cosine",
            _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    system = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "corpus_id", "rank")
    )
    from ..io import tracked_persist

    truth = tracked_persist(cosine_topk(spark, sf_dir).select("query_id", "corpus_id"))
    gain = F.when(F.col("rank") == 1, NDCG_GAIN_MICRO[0])
    for i in range(1, TOP_K):
        gain = gain.when(F.col("rank") == i + 1, NDCG_GAIN_MICRO[i])
    relevant = system.join(truth, ["query_id", "corpus_id"], "left_semi")
    per_q = relevant.groupBy("query_id").agg(
        F.count("*").alias("n_relevant_ranked"),
        F.sum(gain).alias("dcg_micro"),
    )
    n_ranked = system.groupBy("query_id").agg(F.count("*").alias("n_ranked"))
    spine = truth.select("query_id").distinct()
    return (
        spine.join(n_ranked, "query_id", "left")
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_ranked", F.lit(0)).alias("n_ranked"),
            F.coalesce("n_relevant_ranked", F.lit(0)).alias("n_relevant_ranked"),
            F.coalesce("dcg_micro", F.lit(0)).cast("long").alias("dcg_micro"),
            # integral div, not double /: the DuckDB mirror uses // and a
            # float quotient truncated could land one ulp under the exact
            # integer quotient
            F.expr(f"coalesce(dcg_micro, 0L) * 1000000L div {IDCG_MICRO}")
            .cast("long")
            .alias("ndcg_micro"),
        )
        .orderBy("query_id")
    )


def ann_ndcg_eval_sql(n_planes: int | None = None) -> str:
    params = f"SELECT {n_planes} AS r" if n_planes is not None else _PLANES_SQL
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    gains = " ".join(
        f"WHEN {i + 1} THEN {g}" for i, g in enumerate(NDCG_GAIN_MICRO)
    )
    return f"""
WITH params AS ({params}),
sig AS (
  SELECT e.vec_id, bands.band, {_band_bucket_sql("bands.band")} AS bucket
  FROM embeddings e, params,
       (VALUES {", ".join(f"({b})" for b in range(N_BANDS))}) AS bands(band)
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, s.vec_id AS corpus_id
  FROM sig q JOIN sig s ON q.band = s.band AND q.bucket = s.bucket
  WHERE q.vec_id < {N_QUERIES} AND s.vec_id != q.vec_id
),
rescored AS (
  SELECT cand.query_id, cand.corpus_id,
         floor(({dot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.corpus_id
),
system AS (
  SELECT query_id, corpus_id, rank FROM (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM rescored
  ) WHERE rank <= {TOP_K}
),
truth_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         floor(({dot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
truth AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM truth_scored
  ) WHERE rank <= {TOP_K}
),
per_q AS (
  SELECT s.query_id, count(*) AS n_relevant_ranked,
         sum(CASE s.rank {gains} END) AS dcg_micro
  FROM system s JOIN truth t USING (query_id, corpus_id)
  GROUP BY s.query_id
),
n_ranked AS (
  SELECT query_id, count(*) AS n_ranked FROM system GROUP BY query_id
)
SELECT sp.query_id,
       coalesce(n.n_ranked, 0) AS n_ranked,
       coalesce(p.n_relevant_ranked, 0) AS n_relevant_ranked,
       CAST(coalesce(p.dcg_micro, 0) AS BIGINT) AS dcg_micro,
       CAST(coalesce(p.dcg_micro, 0) * 1000000 // {IDCG_MICRO} AS BIGINT)
         AS ndcg_micro
FROM (SELECT DISTINCT query_id FROM truth) sp
LEFT JOIN n_ranked n USING (query_id)
LEFT JOIN per_q p USING (query_id)
ORDER BY sp.query_id
"""


# ---------------------------------------------------------------------------
# scalar int8 quantization — vector storage at 1/4 memory, error measured
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127  # symmetric int8: q in [-127, 127]


def quantization_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column with a measured
    reconstruction-error report — the storage-side member of the vector
    family (float32 → int8 + one scale per vector = 4× less memory and
    bandwidth at serving time; brute force / LSH / IVF / k-means cover
    search, this covers what sits on disk).

    Per vector: scale = max |x|, q_i = floor(x_i/scale·127 + 0.5)
    (symmetric, sign-preserving); reconstruction x̂_i = q_i·scale/127; the
    report = per-cosine-fidelity bucket counts of cos(x, x̂) in exact
    micro units plus the corpus-wide floor(mean).  All expressions are
    JVM column folds with the same left-fold order as the DuckDB oracle
    (the established ``_dot64`` parity contract), and every derived
    number is floored to integer micro units before comparison — so the
    quantizer itself, not a lookalike, is what the oracle verifies.

    Scale shape: one narrow projection per vector (no shuffle until the
    4-row histogram aggregation); at 100 TB this is a map-only pass you
    run once when writing the quantized table."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    scale = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    q = F.transform(
        x, lambda v: F.floor(v.cast("double") / scale * QUANT_LEVELS + 0.5)
    )
    deq = F.transform(q, lambda v: v * scale / QUANT_LEVELS)
    vec = emb.select(
        "vec_id", x.alias("orig"), deq.alias("recon")
    )
    cos = _cosine(
        _dot64(F.col("orig"), F.col("recon")),
        F.sqrt(_dot64(F.col("orig"), F.col("orig"))),
        F.sqrt(_dot64(F.col("recon"), F.col("recon"))),
    )
    scored = vec.select(
        F.floor(cos * 1000000.0 + 0.5).cast("long").alias("cos_micro")
    )
    # fidelity buckets: how far below perfect the reconstruction sits
    bucket = (
        F.when(F.col("cos_micro") >= 999990, ">=0.99999")
        .when(F.col("cos_micro") >= 999900, ">=0.9999")
        .when(F.col("cos_micro") >= 999000, ">=0.999")
        .otherwise("<0.999")
    )
    return (
        scored.groupBy(bucket.alias("fidelity"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.floor(F.avg("cos_micro")).cast("long").alias("mean_cos_micro"),
            F.min("cos_micro").alias("min_cos_micro"),
        )
        .orderBy("fidelity")
    )


def quantization_error_eval_sql() -> str:
    scale = "list_max(list_transform(embedding, v -> abs(v::double)))"
    q = f"list_transform(embedding, v -> floor(v::double / {scale} * {QUANT_LEVELS} + 0.5))"
    # materialize orig/recon in a CTE so the dot folds reference columns
    dot_or = _dot_sql("orig", "recon")
    n_o = _dot_sql("orig", "orig")
    n_r = _dot_sql("recon", "recon")
    cos = (
        f"floor(({dot_or}) / (sqrt({n_o}) * sqrt({n_r})) * {COSINE_SCALE} + 0.5)"
        f" / {COSINE_SCALE}"
    )
    return f"""
WITH vec AS (
  SELECT vec_id,
         list_transform(embedding, v -> v::double) AS orig,
         list_transform({q}, qv -> qv * {scale} / {QUANT_LEVELS}) AS recon
  FROM embeddings
),
scored AS (
  SELECT CAST(floor(({cos}) * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
  FROM vec
)
SELECT CASE WHEN cos_micro >= 999990 THEN '>=0.99999'
            WHEN cos_micro >= 999900 THEN '>=0.9999'
            WHEN cos_micro >= 999000 THEN '>=0.999'
            ELSE '<0.999' END AS fidelity,
       count(*) AS n_vectors,
       CAST(floor(avg(cos_micro)) AS BIGINT) AS mean_cos_micro,
       min(cos_micro) AS min_cos_micro
FROM scored
GROUP BY 1
ORDER BY fidelity
"""


# ---------------------------------------------------------------------------
# hard-negative mining — contrastive-training batch construction
# ---------------------------------------------------------------------------

HARD_NEG_K = 3  # hard negatives per query


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the HARD_NEG_K nearest corpus vectors with a DIFFERENT label —
    the highest-similarity wrong-label examples that make the strongest
    negatives in an InfoNCE batch.

    Plan shape is cosine_topk's (precomputed norms, broadcast query side,
    per-query top-k window) with the label-mismatch predicate pushed into
    the join condition, so non-candidates never reach the ranking window.
    Valid at 1e9-row corpus for the same reason cosine_topk is: the
    broadcast side is |queries| rows and the scan side streams."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        "label",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    queries = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("label").alias("query_label"),
    )
    corpus = with_norm.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        F.col("label").alias("neg_label"),
    )
    joined = corpus.join(
        F.broadcast(queries), F.col("neg_label") != F.col("query_label")
    )
    cos = _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("query_id", "query_label", "corpus_id", "neg_label", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def hard_negative_mining_sql() -> str:
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS corpus_id, c.label AS neg_label,
         floor(({dot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM embeddings q JOIN embeddings c ON q.label != c.label
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored
)
SELECT query_id, query_label, corpus_id, neg_label, cosine, rank
FROM ranked WHERE rank <= {HARD_NEG_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# quantized search recall — does int8 storage change the answers?
# ---------------------------------------------------------------------------


def quantized_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end int8 impact eval: run the SAME brute-force top-k twice —
    once on float embeddings (the cosine_topk ground truth), once on the
    int8-quantized vectors — and report per-query overlap@k.  This is the
    number a serving team actually decides on (reconstruction cosine,
    quantization_error_eval, is the proxy; neighbor-set recall is the
    product metric).

    Determinism: the quantized similarity is an INTEGER dot product of the
    q∈[-127,127] codes (exact BIGINT fold, order-insensitive) normalized
    by float sqrt of the integer self-dots — the one float op both engines
    round identically — then floored to micro units.  Ranking ties break
    on corpus_id.

    Scale shape: two broadcast-query scans over the corpus (the
    cosine_topk plan, twice) and a tiny per-query join of two k-row
    sets — still linear in corpus at 1e9 rows, and the integer dot is
    exactly the SIMD-friendly kernel an int8 serving index runs."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    scale = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    q = F.transform(
        x, lambda v: F.floor(v.cast("double") / scale * QUANT_LEVELS + 0.5).cast("long")
    )
    qvec = emb.select("vec_id", q.alias("qe"))
    qnorm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qe"), F.col("qe"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).cast("double")
    )
    with_norm = qvec.select("vec_id", "qe", qnorm.alias("qn"))
    queries = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_emb"),
        F.col("qn").alias("q_norm"),
    )
    corpus = with_norm.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("qe").alias("c_emb"),
        F.col("qn").alias("c_norm"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("c_emb"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    qcos_micro = F.floor(
        idot.cast("double") / (F.col("q_norm") * F.col("c_norm")) * 1000000.0 + 0.5
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos_micro"), "corpus_id")
    quant_topk = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("corpus_id"))
        .withColumn("qcos_micro", qcos_micro)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "corpus_id")
    )
    # both top-k sets are <= K * N_QUERIES rows by construction — broadcast
    # them explicitly (they come out of windows, so Catalyst has no size
    # stats and would otherwise plan sort-merge joins for 50-row inputs)
    exact_topk = cosine_topk(spark, sf_dir).select("query_id", "corpus_id")
    overlap = quant_topk.join(
        F.broadcast(exact_topk), ["query_id", "corpus_id"]
    ).groupBy("query_id").agg(F.count("*").alias("n_overlap"))
    # left join from the exact queries so recall 0 would still surface
    base = exact_topk.groupBy("query_id").agg(F.count("*").alias("k"))
    return (
        base.join(F.broadcast(overlap), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.floor(F.coalesce("n_overlap", F.lit(0)) * 1000000.0 / F.col("k")))
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("query_id")
    )


def quantized_topk_recall_sql() -> str:
    scale = "list_max(list_transform(embedding, v -> abs(v::double)))"
    q = (
        f"list_transform(embedding, v -> "
        f"floor(v::double / {scale} * {QUANT_LEVELS} + 0.5)::bigint)"
    )
    iq = f"list_sum(list_transform(range(1, {DIM + 1}), i -> a.qe[i] * b.qe[i]))"
    na = f"sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> a.qe[i] * a.qe[i]))::double)"
    nb = f"sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> b.qe[i] * b.qe[i]))::double)"
    exact = cosine_topk_sql()
    return f"""
WITH qvec AS (
  SELECT vec_id, {q} AS qe FROM embeddings
),
qscored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
         CAST(floor(({iq})::double / ({na} * {nb}) * 1000000.0 + 0.5) AS BIGINT)
           AS qcos_micro
  FROM qvec a JOIN qvec b ON a.vec_id != b.vec_id
  WHERE a.vec_id < {N_QUERIES}
),
qranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qcos_micro DESC, corpus_id) AS rank
  FROM qscored
),
quant_topk AS (
  SELECT query_id, corpus_id FROM qranked WHERE rank <= {TOP_K}
),
exact_topk AS (
  SELECT query_id, corpus_id FROM ({exact})
),
base AS (
  SELECT query_id, count(*) AS k FROM exact_topk GROUP BY query_id
),
overlap AS (
  SELECT q.query_id, count(*) AS n_overlap
  FROM quant_topk q JOIN exact_topk e USING (query_id, corpus_id)
  GROUP BY q.query_id
)
SELECT b.query_id,
       COALESCE(o.n_overlap, 0)::BIGINT AS n_overlap,
       CAST(floor(COALESCE(o.n_overlap, 0) * 1000000.0 / b.k) AS BIGINT)
         AS recall_micro
FROM base b LEFT JOIN overlap o USING (query_id)
ORDER BY b.query_id
"""


# ---------------------------------------------------------------------------
# semantic dedup (cluster-then-dedup, SemDeDup-style)
# ---------------------------------------------------------------------------

SEMDEDUP_COSINE = NEAR_DUP_COSINE  # same near-dup bar as the banded-LSH path


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-dedup over embedding space (the SemDeDup recipe, Abbas
    et al. 2023): assign every vector to its nearest coarse centroid,
    compare pairs only WITHIN a cell, mark the higher-id member of every
    ≥-threshold pair as a semantic duplicate, and report per-cell how much
    the corpus shrinks.  The third member of the embedding-dedup family:
    banded LSH (embedding_near_dup_pairs) trades recall for linear cost,
    brute force (cosine_topk) is exact but quadratic — cluster-local
    comparison is the middle path production corpus builds actually run.

    Scale shape: assignment is the IVF broadcast argmax (16 centroid rows
    here; k-means output in production); the pair stage is an equi self-join
    on the cell id, so cost is Σ cell² — held at N·occupancy by growing the
    centroid count with the corpus, exactly the IVF sizing argument
    (similarity.py:_planes_for).  The documented trade: a near-dup pair
    straddling two cells is missed — SemDeDup accepts that recall loss in
    exchange for never leaving cell-local work.

    Keep rule: a vector is REMOVED iff some smaller-id vector in its cell
    clears the threshold with it ("min-id representative" — deterministic,
    1-pass, no iterative components)."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    centroids = with_norm.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos_c = _cosine(_dot64(F.col("embedding"), F.col("c_emb")), F.col("norm"), F.col("c_norm"))
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("_ccos"), "centroid_id")
    assigned = (
        with_norm.join(F.broadcast(centroids))
        .withColumn("_ccos", cos_c)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "norm", "centroid_id")
    )
    from ..io import tracked_persist

    assigned = tracked_persist(assigned)  # both sides of the pair join + sizes
    a = assigned.alias("a")
    b = assigned.alias("b")
    pair_cos = _cosine(
        _dot64(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.norm"),
        F.col("b.norm"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", pair_cos)
        .filter(F.col("cosine") >= SEMDEDUP_COSINE)
        .select(F.col("a.centroid_id").alias("centroid_id"), F.col("b.vec_id").alias("removed_id"))
    )
    per_cell_pairs = pairs.groupBy("centroid_id").agg(
        F.count("*").alias("n_dup_pairs"),
        F.countDistinct("removed_id").alias("n_removed"),
    )
    sizes = assigned.groupBy("centroid_id").agg(F.count("*").alias("n_vectors"))
    return (
        sizes.join(per_cell_pairs, "centroid_id", "left")
        .na.fill({"n_dup_pairs": 0, "n_removed": 0})
        .select(
            "centroid_id",
            "n_vectors",
            "n_dup_pairs",
            "n_removed",
            (F.col("n_vectors") - F.col("n_removed")).alias("n_kept"),
        )
        .orderBy("centroid_id")
    )


def semantic_dedup_sql() -> str:
    dot_c = _dot_sql("e.embedding", "c.embedding")
    ne = _dot_sql("e.embedding", "e.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    cos_c = f"floor(({dot_c}) / (sqrt({ne}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}"
    dot_p = _dot_sql("a.embedding", "b.embedding")
    cos_p = f"floor(({dot_p}) / (a.norm * b.norm) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}"
    return f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id, {cos_c} AS ccos
  FROM embeddings e CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id,
         sqrt({_dot_sql('embedding', 'embedding')}) AS norm
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.centroid_id, b.vec_id AS removed_id
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {cos_p} >= {SEMDEDUP_COSINE}
),
per_cell AS (
  SELECT centroid_id, count(*) AS n_dup_pairs,
         count(DISTINCT removed_id) AS n_removed
  FROM pairs GROUP BY centroid_id
),
sizes AS (
  SELECT centroid_id, count(*) AS n_vectors FROM assigned GROUP BY centroid_id
)
SELECT s.centroid_id, s.n_vectors,
       coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
       coalesce(p.n_removed, 0) AS n_removed,
       s.n_vectors - coalesce(p.n_removed, 0) AS n_kept
FROM sizes s LEFT JOIN per_cell p USING (centroid_id)
ORDER BY s.centroid_id
"""


# ---------------------------------------------------------------------------
# MMR diversified top-k (serving-path re-ranking)
# ---------------------------------------------------------------------------

# Maximal Marginal Relevance (Carbonell & Goldstein 1998, SIGIR — public
# paper): re-rank a candidate pool so each pick trades relevance to the
# query against redundancy with what's already picked:
#   MMR(c) = λ·rel(q, c) − (1−λ)·max_{s∈selected} sim(c, s).
# λ = 0.7 encoded as exact integer weights 7/3 over the micro-int cosines,
# so every comparison is integer math and the greedy argmax is engine-exact.
MMR_POOL = 20   # top-M relevance pool per query (bounds ALL MMR work)
MMR_K = 5       # diversified picks per query
_MMR_REL_W = 7  # λ·10
_MMR_DIV_W = 3  # (1−λ)·10


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k serving: exact top-``MMR_POOL`` relevance pool per
    query, then ``MMR_K`` greedy MMR picks.

    Scale shape: the pool stage is the same broadcast-queries exact scan as
    :func:`cosine_topk` (the ANN candidate generators can feed the same
    pool); everything after is bounded at M²·Q rows (pairwise sims within
    each query's 20-candidate pool) REGARDLESS of corpus size — the greedy
    chain is replayed on the driver from two BOUNDED collects (≤ Q·MMR_POOL
    candidate rows and ≤ Q·MMR_POOL² pairwise sims, corpus-independent —
    the k-means-centroid bounded-collect class), exact integer arithmetic
    identical to the former per-step relational windows.

    Determinism: relevance and pairwise cosines are 1e-6 fixed-point; the
    greedy key is the exact integer 7·rel_micro − 3·maxsim_micro with
    corpus_id tie-break, so both engines pick identical chains."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    queries = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    corpus = with_norm.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    from pyspark.sql import Window

    rel = _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "corpus_id")
    pool = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("corpus_id"))
        .withColumn("rel", rel)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .select(
            "query_id",
            "corpus_id",
            "c_emb",
            "c_norm",
            F.floor(F.col("rel") * COSINE_SCALE + 0.5).cast("long").alias("rel_micro"),
        )
        .localCheckpoint()
    )
    a = pool.select(
        "query_id",
        F.col("corpus_id").alias("id_a"),
        F.col("c_emb").alias("emb_a"),
        F.col("c_norm").alias("norm_a"),
    )
    b = pool.select(
        "query_id",
        F.col("corpus_id").alias("id_b"),
        F.col("c_emb").alias("emb_b"),
        F.col("c_norm").alias("norm_b"),
    )
    sim = _cosine(_dot64(F.col("emb_a"), F.col("emb_b")), F.col("norm_a"), F.col("norm_b"))
    sims = (
        a.join(b, ["query_id"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.floor(sim * COSINE_SCALE + 0.5).cast("long").alias("sim_micro"),
        )
    )
    # The greedy chain is BOUNDED by constants — ≤ N_QUERIES·MMR_POOL cand
    # rows and ≤ N_QUERIES·MMR_POOL·(MMR_POOL−1) pairwise sims, corpus-size-
    # independent — so the K−1 relational steps (each a join + window +
    # localCheckpoint job barrier) are replayed on the driver instead: one
    # bounded collect per frame, then the identical exact-integer argmax
    # (7·rel − 3·maxsim, corpus_id tie-break) in Python.  Same bounded-
    # collect class as the k-means centroid fetch and the power-iteration
    # replay (round 12); the corpus-sized pool scan above stays distributed.
    cand_rows = sorted(
        (r["query_id"], r["corpus_id"], r["rel_micro"])
        for r in pool.select("query_id", "corpus_id", "rel_micro").collect()
    )
    sim_lookup = {
        (r["query_id"], r["id_a"], r["id_b"]): r["sim_micro"] for r in sims.collect()
    }
    by_query: dict[int, list[tuple[int, int]]] = {}
    for qid, cid, rel in cand_rows:
        by_query.setdefault(qid, []).append((cid, rel))
    out_rows = []
    for qid in sorted(by_query):
        cands_q = by_query[qid]
        # step 1: pure relevance argmax (selected set empty -> maxsim = 0)
        cid, rel = max(cands_q, key=lambda t: (t[1], -t[0]))
        selected = [cid]
        out_rows.append((qid, cid, rel, 0, 1))
        for step in range(2, MMR_K + 1):
            best = None
            for cid, rel in cands_q:
                if cid in selected:
                    continue
                # invariant: the sims collect carries EVERY (query,
                # cand, cand) pair of the pool — a missing key means the
                # pool/sims frames diverged upstream; fail with the
                # invariant named instead of a bare KeyError
                try:
                    maxsim = max(sim_lookup[(qid, cid, s)] for s in selected)
                except KeyError as e:  # pragma: no cover - invariant guard
                    raise AssertionError(
                        "mmr_diversified_topk: pairwise sim missing for "
                        f"(query_id={qid}, pair={e.args[0]}); the pool and "
                        "sims frames must cover the full pool cross-product"
                    ) from e
                key = (_MMR_REL_W * rel - _MMR_DIV_W * maxsim, -cid)
                if best is None or key > best[0]:
                    best = (key, cid, rel, maxsim)
            if best is None:
                break
            _, cid, rel, maxsim = best
            selected.append(cid)
            out_rows.append((qid, cid, rel, maxsim, step))

    sel = pool.sparkSession.createDataFrame(
        out_rows,
        "query_id long, corpus_id long, rel_micro long, maxsim_micro long, sel_rank int",
    )
    return sel.select(
        "query_id",
        "corpus_id",
        "sel_rank",
        (F.col("rel_micro") / COSINE_SCALE).alias("relevance"),
        (F.col("maxsim_micro") / COSINE_SCALE).alias("max_sim_selected"),
        (
            (
                F.lit(_MMR_REL_W) * F.col("rel_micro")
                - F.lit(_MMR_DIV_W) * F.col("maxsim_micro")
            )
            / F.lit(10.0 * COSINE_SCALE)
        ).alias("mmr_score"),
    ).orderBy("query_id", "sel_rank")


def mmr_diversified_topk_sql() -> str:
    dot_qc = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    dot_ab = _dot_sql("ea.embedding", "eb.embedding")
    na = _dot_sql("ea.embedding", "ea.embedding")
    nb = _dot_sql("eb.embedding", "eb.embedding")
    steps = []
    for i in range(2, MMR_K + 1):
        prev = f"sel{i - 1}"
        steps.append(
            f"""pick{i} AS (
  SELECT query_id, corpus_id, rel_micro, maxsim_micro, {i} AS sel_rank
  FROM (
    SELECT sc.*, row_number() OVER (
      PARTITION BY query_id
      ORDER BY {_MMR_REL_W} * rel_micro - {_MMR_DIV_W} * maxsim_micro DESC,
               corpus_id) AS rn
    FROM (
      SELECT p.query_id, p.corpus_id, p.rel_micro,
             max(sm.sim_micro) AS maxsim_micro
      FROM pool p
      JOIN {prev} s ON s.query_id = p.query_id
      JOIN sims sm ON sm.query_id = p.query_id
        AND sm.id_a = p.corpus_id AND sm.id_b = s.corpus_id
      WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                        WHERE x.query_id = p.query_id
                          AND x.corpus_id = p.corpus_id)
      GROUP BY p.query_id, p.corpus_id, p.rel_micro
    ) sc
  ) WHERE rn = 1
),
sel{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH pool AS (
  SELECT query_id, corpus_id, rel_micro FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           floor(({dot_qc}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5)::bigint
             AS rel_micro,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(({dot_qc}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) DESC,
                      c.vec_id) AS rn
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {MMR_POOL}
),
sims AS (
  SELECT a.query_id, a.corpus_id AS id_a, b.corpus_id AS id_b,
         floor(({dot_ab}) / (sqrt({na}) * sqrt({nb})) * {COSINE_SCALE} + 0.5)::bigint
           AS sim_micro
  FROM pool a
  JOIN pool b ON a.query_id = b.query_id AND a.corpus_id != b.corpus_id
  JOIN embeddings ea ON ea.vec_id = a.corpus_id
  JOIN embeddings eb ON eb.vec_id = b.corpus_id
),
sel1 AS (
  SELECT query_id, corpus_id, rel_micro, 0::bigint AS maxsim_micro, 1 AS sel_rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_micro DESC, corpus_id) AS rn
    FROM pool
  ) WHERE rn = 1
),
{steps_sql}
SELECT query_id, corpus_id, sel_rank,
       rel_micro / {COSINE_SCALE} AS relevance,
       maxsim_micro / {COSINE_SCALE} AS max_sim_selected,
       ({_MMR_REL_W} * rel_micro - {_MMR_DIV_W} * maxsim_micro) / {10.0 * COSINE_SCALE}
         AS mmr_score
FROM sel{MMR_K}
ORDER BY query_id, sel_rank
"""


# ---------------------------------------------------------------------------
# embedding centroid drift — per-label distribution shift vs the corpus
# ---------------------------------------------------------------------------


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid vs the corpus centroid: cosine of each
    label's mean vector to the global mean — the embedding-space analog
    of ``sketches.spend_drift_psi``.  A label (source/shard/time-slice at
    production scale) whose centroid swings away from the corpus centroid
    is the canonical "this slice's distribution moved" alarm for
    embedding pipelines (encoder drift, a source gone off-topic, a bad
    batch of vectors).

    Centroids use the k-means discipline (:func:`kmeans_refine`): exact
    BIGINT micro sums per (label, dim) — order-insensitive under any
    partitioning — and ONE floored division; the global centroid reuses
    the same per-(label, dim) partials (sum of sums), so the corpus is
    scanned once.  Dot/norm products stay inside int64 by the |x| <= 150
    magnitude envelope (module header).

    Scale shape: one posexplode + groupBy(label, dim) with map-side
    combine — labels x 64 rows out of the shuffle regardless of corpus
    size; everything after is labels-sized, and the dim join is a
    broadcast."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _micro_embedding().alias("e")
    )
    per_dim = (
        emb.select("label", F.posexplode("e").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
    )
    from ..io import tracked_persist

    per_dim = tracked_persist(per_dim)  # feeds both centroid levels
    lab = per_dim.withColumn(
        "m", F.floor(F.col("s").cast("double") / F.col("n")).cast("long")
    )
    glob = (
        per_dim.groupBy("dim")
        .agg(F.sum("s").alias("gs"), F.sum("n").alias("gn"))
        .select(
            "dim",
            F.floor(F.col("gs").cast("double") / F.col("gn")).cast("long").alias("g"),
        )
    )
    per_label = (
        lab.join(F.broadcast(glob), "dim")
        .groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sum(F.col("m") * F.col("g")).alias("dot"),
            F.sum(F.col("m") * F.col("m")).alias("mm"),
            F.sum(F.col("g") * F.col("g")).alias("gg"),
        )
    )
    cos = F.floor(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("mm").cast("double")) * F.sqrt(F.col("gg").cast("double")))
        * COSINE_SCALE
        + 0.5
    ) / COSINE_SCALE
    return per_label.select(
        "label",
        "n_vecs",
        F.when((F.col("mm") > 0) & (F.col("gg") > 0), cos).alias("cos_to_global"),
    ).orderBy("label")


def embedding_centroid_drift_sql() -> str:
    return f"""
WITH emb AS (
  SELECT label,
         list_transform(embedding, x -> CAST(floor(x::double * {MICRO} + 0.5) AS BIGINT)) AS e
  FROM embeddings
),
per_dim AS (
  SELECT label, t.i AS dim, sum(e[t.i]) AS s, count(*) AS n
  FROM emb, unnest(range(1, {DIM + 1})) t(i)
  GROUP BY label, t.i
),
lab AS (
  SELECT label, dim, n, CAST(floor(s::double / n) AS BIGINT) AS m FROM per_dim
),
gcent AS (
  SELECT dim, CAST(floor(sum(s)::double / sum(n)) AS BIGINT) AS g
  FROM per_dim GROUP BY dim
),
per_label AS (
  SELECT label, max(n) AS n_vecs,
         sum(m * g) AS dot, sum(m * m) AS mm, sum(g * g) AS gg
  FROM lab JOIN gcent USING (dim)
  GROUP BY label
)
SELECT label, n_vecs,
       CASE WHEN mm > 0 AND gg > 0 THEN
         floor(dot::double / (sqrt(mm::double) * sqrt(gg::double))
               * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
       END AS cos_to_global
FROM per_label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# IVF nprobe sweep — the recall/cost dial of the inverted-file path, measured
# ---------------------------------------------------------------------------

IVF_NPROBES = (1, 2, 4)


def ivf_probe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@:data:`TOP_K` of IVF search as a function of ``nprobe`` (how
    many nearest cells the query visits): for each query vector and each
    nprobe in :data:`IVF_NPROBES`, candidates = corpus vectors whose
    :func:`ivf_cell_search` cell is among the query's nprobe closest
    centroids; graded against brute-force truth (:func:`cosine_topk`).
    This is THE operating curve an ANN deployment tunes — "nprobe=2 buys
    92% recall at 2/16ths of the corpus scanned" — and a sibling of
    :func:`ann_recall_eval` (which grades the hyperplane-LSH generator;
    IVF cells adapt to data geometry, hyperplanes don't).

    Everything after the assignment argmax is integer arithmetic, so
    rows hash identically across engines.

    Scale shape: the corpus-side assignment is the same broadcast
    16-centroid argmax IVF always pays (once, amortized across queries);
    the query-side centroid ranking is N_QUERIES x N_CENTROIDS rows; the
    candidate join is query-cells (broadcast, ≤ N_QUERIES·max nprobe
    rows) against the cell-keyed corpus — candidate volume per (query,
    nprobe) ≈ nprobe/N_CENTROIDS of the corpus, which is the cost dial
    the output quantifies."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    from ..io import tracked_persist

    with_norm = tracked_persist(with_norm)  # assignment + query ranking + truth
    centroids = with_norm.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _cosine(_dot64(F.col("embedding"), F.col("c_emb")), F.col("norm"), F.col("c_norm"))
    # ROUND-12 OPTIMIZATION (guide §2.3/§2.4): the corpus-side assignment
    # only needs the PER-VECTOR ARGMAX of the 16 centroid cosines, so it
    # rides a map-side-combinable max_by aggregation (the 16 rows per
    # vector are generated inside one task by the broadcast join, so the
    # partial agg collapses them to 1 row before the exchange) instead of
    # shuffling corpus×16 rows — embedding arrays included — through a
    # row_number window sort.  Tie order is identical: max of
    # struct(cosine, -centroid_id) == first row under (cosine DESC,
    # centroid_id ASC); struct comparison and window ordering agree on
    # NULL-smallest/NaN-largest.  The query-side TOP-max_probe ranking
    # still uses the window, but only AFTER filtering to the N_QUERIES
    # vectors (was: window over the full corpus, filtered after).
    scored = with_norm.join(F.broadcast(centroids)).select(
        "vec_id", "centroid_id", cos.alias("cosine")
    )
    assigned = scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("cosine"), (-F.col("centroid_id")).alias("nc")),
        ).alias("centroid_id")
    ).select(F.col("vec_id").alias("corpus_id"), "centroid_id")
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "centroid_id")
    max_probe = max(IVF_NPROBES)
    qcells = (
        with_norm.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(centroids))
        .select("vec_id", "centroid_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_probe)
        .select(F.col("vec_id").alias("query_id"), "centroid_id", F.col("rn").alias("crank"))
    )
    probes = spark.createDataFrame([(p,) for p in IVF_NPROBES], "nprobe int")
    probe_cells = qcells.join(F.broadcast(probes), F.col("crank") <= F.col("nprobe")).select(
        "query_id", "nprobe", "centroid_id"
    )
    cand = (
        assigned.join(F.broadcast(probe_cells), "centroid_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "nprobe", "corpus_id")
    )
    truth = tracked_persist(cosine_topk(spark, sf_dir).select("query_id", "corpus_id"))
    hits = (
        cand.join(truth, ["query_id", "corpus_id"], "left_semi")
        .groupBy("query_id", "nprobe")
        .agg(F.count("*").alias("n_hits"))
    )
    n_cand = cand.groupBy("query_id", "nprobe").agg(F.count("*").alias("n_candidates"))
    spine = truth.select("query_id").distinct().crossJoin(F.broadcast(probes))
    return (
        spine.join(n_cand, ["query_id", "nprobe"], "left")
        .join(hits, ["query_id", "nprobe"], "left")
        .select(
            "query_id",
            "nprobe",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.floor(F.coalesce("n_hits", F.lit(0)) * 1000000.0 / TOP_K)
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("query_id", "nprobe")
    )


def ivf_probe_recall_sweep_sql() -> str:
    dot = _dot_sql("e.embedding", "c.embedding")
    ne = _dot_sql("e.embedding", "e.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    qdot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    probes_values = ", ".join(f"({p})" for p in IVF_NPROBES)
    return f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
ranked AS (
  SELECT e.vec_id, c.centroid_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY floor(({dot}) / (sqrt({ne}) * sqrt({nc})) * {COSINE_SCALE} + 0.5)
                      / {COSINE_SCALE} DESC,
                    c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id AS corpus_id, centroid_id FROM ranked WHERE rn = 1
),
probes(nprobe) AS (VALUES {probes_values}),
probe_cells AS (
  SELECT vec_id AS query_id, p.nprobe, centroid_id
  FROM ranked, probes p
  WHERE vec_id < {N_QUERIES} AND rn <= p.nprobe
),
cand AS (
  SELECT pc.query_id, pc.nprobe, a.corpus_id
  FROM assigned a JOIN probe_cells pc USING (centroid_id)
  WHERE a.corpus_id != pc.query_id
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         floor(({qdot}) / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5) / {COSINE_SCALE}
           AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
truth AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
hits AS (
  SELECT c.query_id, c.nprobe, count(*) AS n_hits
  FROM cand c SEMI JOIN truth t ON t.query_id = c.query_id AND t.corpus_id = c.corpus_id
  GROUP BY c.query_id, c.nprobe
),
n_cand AS (
  SELECT query_id, nprobe, count(*) AS n_candidates FROM cand GROUP BY query_id, nprobe
),
spine AS (
  SELECT DISTINCT t.query_id, p.nprobe FROM truth t, probes p
)
SELECT s.query_id, s.nprobe,
       coalesce(n.n_candidates, 0) AS n_candidates,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST(floor(coalesce(h.n_hits, 0) * 1000000.0 / {TOP_K}) AS BIGINT) AS recall_micro
FROM spine s
LEFT JOIN n_cand n USING (query_id, nprobe)
LEFT JOIN hits h USING (query_id, nprobe)
ORDER BY s.query_id, s.nprobe
"""


# ---------------------------------------------------------------------------
# product quantization — per-subspace codebook assignment + distortion
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64 dims / 8 per subvector)
PQ_SUBDIM = DIM // PQ_M
PQ_CODES = 16  # codewords per subspace (seed vectors, like the IVF quantizer)


def pq_codebook_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode + distortion audit: split every vector
    into :data:`PQ_M` subvectors, assign each to its nearest codeword
    (codebooks = the seed vectors' subvectors, vec_id < :data:`PQ_CODES`
    — standing in for per-subspace k-means exactly as
    :func:`ivf_cell_search` seeds its coarse quantizer), and report per
    subspace: codewords actually used and total/mean squared
    reconstruction error in exact micro² units.  PQ is the memory side of
    the 100-TB ANN story — IVF prunes the scan,
    PQ shrinks 64×4 bytes/vector to :data:`PQ_M` bytes — and this query
    is its distortion dashboard (a subspace whose code usage collapses or
    whose distortion spikes is a bad codebook).

    All arithmetic is int64 on micro units (|x| ≤ 150 envelope keeps the
    64-term squared sums under 2^63), so rows hash identically across
    engines.

    Scale shape: encode is the standard N×M×K scan (exploded to
    (vector, subspace) rows against a broadcast M×K codebook — 128 rows
    here), one windowed argmin, one M-row rollup; no shuffle touches
    anything corpus-sized except the argmin's (vec_id, m) partition."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _micro_embedding().alias("e")
    )
    subs = F.array(
        *[
            F.slice(F.col("e"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
            for m in range(PQ_M)
        ]
    )
    exploded = emb.select("vec_id", F.posexplode(subs).alias("m", "sub"))
    codebook = (
        emb.filter(F.col("vec_id") < PQ_CODES)
        .select(F.col("vec_id").alias("code_id"), F.posexplode(subs).alias("m", "csub"))
    )
    dist = F.expr(
        "aggregate(zip_with(sub, csub, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )
    scored = exploded.join(F.broadcast(codebook), "m").withColumn("sq_err", dist)
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id", "m").orderBy("sq_err", "code_id")
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy("m")
        .agg(
            F.count("*").alias("n_vectors"),
            F.countDistinct("code_id").alias("n_codes_used"),
            F.sum("sq_err").alias("total_sq_err"),
        )
        .select(
            F.col("m").alias("subspace"),
            "n_vectors",
            "n_codes_used",
            "total_sq_err",
            F.expr("total_sq_err div n_vectors").alias("mean_sq_err"),
        )
        .orderBy("subspace")
    )


def pq_codebook_eval_sql() -> str:
    return f"""
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x::double * {MICRO} + 0.5) AS BIGINT)) AS e
  FROM embeddings
),
subspaces(m) AS (VALUES {", ".join(f"({m})" for m in range(PQ_M))}),
exploded AS (
  SELECT vec_id, m, e[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sub
  FROM emb, subspaces
),
codebook AS (
  SELECT vec_id AS code_id, m, sub AS csub FROM exploded WHERE vec_id < {PQ_CODES}
),
scored AS (
  SELECT x.vec_id, x.m, c.code_id,
         list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
                  i -> (x.sub[i] - c.csub[i]) * (x.sub[i] - c.csub[i]))) AS sq_err
  FROM exploded x JOIN codebook c USING (m)
),
best AS (
  SELECT vec_id, m, code_id, sq_err,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY sq_err, code_id) AS rn
  FROM scored
)
SELECT m AS subspace,
       count(*) AS n_vectors,
       count(DISTINCT code_id) AS n_codes_used,
       CAST(sum(sq_err) AS BIGINT) AS total_sq_err,
       CAST(sum(sq_err) AS BIGINT) // count(*) AS mean_sq_err
FROM best
WHERE rn = 1
GROUP BY m
ORDER BY subspace
"""


# ---------------------------------------------------------------------------
# embedding dispersion — mean pairwise cosine WITHOUT materializing pairs
# ---------------------------------------------------------------------------


def embedding_dispersion_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diversity: the MEAN PAIRWISE COSINE of every
    vector pair inside the label, computed in ONE scan via the centroid
    identity — for unit vectors, Σᵢ≠ⱼ ûᵢ·ûⱼ = ‖Σû‖² − Σᵢ‖ûᵢ‖², so the
    n²/2 pair dots collapse to 64 per-dimension sums.  This is the
    mode-collapse / diversity monitor a training-data pipeline runs per
    source or per synthetic-data batch: mean pairwise cosine near 1 means
    the slice collapsed onto one direction; the companion
    ``centroid_norm`` (‖mean û‖, 0 = isotropic, 1 = identical) is the
    same statistic through the other lens.

    Exactness: unit vectors are quantized to micro ints
    (floor(x/‖x‖·1e6 + 0.5)), so the identity is evaluated EXACTLY for
    the quantized vectors — per-(label, dim) component sums and
    squared-norm sums are integer (decimal(38) against the 1e9-row
    overflow), and the single double division at the end is
    micro-rounded.  No float accumulates across rows, so any partitioning
    and any engine agree bit-for-bit.

    Scale shape: one posexplode + groupBy(label, dim) with map-side
    combine — labels × 64 rows out of the shuffle regardless of corpus
    size; everything after is labels-sized.  Compare
    ``semantic_dedup``/``simhash_near_pairs``, which need candidate pairs
    because they ask WHICH pairs are close; this asks only HOW close the
    slice is on average, which is why it gets to skip the pair stage
    entirely."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot64(F.col("embedding"), F.col("embedding")))
    base = emb.select("label", "embedding", nrm.alias("nrm")).where(F.col("nrm") > 0)
    unit = base.select(
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / F.col("nrm") * MICRO + 0.5).cast(
                "long"
            ),
        ).alias("u"),
    )
    per_dim = (
        unit.select("label", F.posexplode("u").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.sum("v").alias("s"),
            F.sum(dec38_prod(F.col("v"), F.col("v"))).alias("qq"),
            F.count("*").alias("n"),
        )
    )
    lab = per_dim.groupBy("label").agg(
        F.sum(dec38_prod(F.col("s"), F.col("s"))).alias("s2"),
        F.sum("qq").alias("qsum"),
        F.max("n").alias("n_vecs"),
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    n_d = F.col("n_vecs").cast("double")
    mpc = F.when(
        F.col("n_vecs") > 1,
        (F.col("s2") - F.col("qsum")).cast("double")
        / (n_d * (n_d - 1.0) * 1.0e12),
    )
    cnorm = F.sqrt(F.col("s2").cast("double")) / (n_d * 1.0e6)
    return lab.select(
        "label",
        "n_vecs",
        micro(mpc).alias("mean_pairwise_cosine"),
        micro(cnorm).alias("centroid_norm"),
    ).orderBy("label")


def embedding_dispersion_by_label_sql() -> str:
    nrm = _dot_sql("embedding", "embedding")
    return f"""
WITH base AS (
  SELECT label, embedding, sqrt({nrm}) AS nrm
  FROM embeddings
),
unitv AS (
  SELECT label,
         list_transform(embedding,
                        x -> CAST(floor(x::double / nrm * {MICRO} + 0.5) AS BIGINT)) AS u
  FROM base WHERE nrm > 0
),
per_dim AS (
  SELECT label, t.i AS dim,
         sum(u[t.i]) AS s,
         sum((u[t.i] * u[t.i])::hugeint) AS qq,
         count(*) AS n
  FROM unitv, unnest(range(1, {DIM + 1})) t(i)
  GROUP BY label, t.i
),
lab AS (
  SELECT label,
         sum(s::hugeint * s::hugeint) AS s2,
         sum(qq) AS qsum,
         max(n) AS n_vecs
  FROM per_dim GROUP BY label
)
SELECT label, n_vecs,
       floor(CASE WHEN n_vecs > 1
                  THEN (s2 - qsum)::double
                       / (n_vecs::double * (n_vecs::double - 1.0) * 1.0e12)
             END * 1000000.0 + 0.5) / 1000000.0 AS mean_pairwise_cosine,
       floor(sqrt(s2::double) / (n_vecs::double * 1.0e6) * 1000000.0 + 0.5)
         / 1000000.0 AS centroid_norm
FROM lab
ORDER BY label
"""


# ---------------------------------------------------------------------------
# top principal direction via deterministic power iteration
# ---------------------------------------------------------------------------

POWER_ITERATIONS = 3
NANO = 1_000_000_000


_GRAM_CHUNK = 4096  # level-1 long-sum chunk: 4096 vectors x |x*y|<=1e12 << int64


def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the unit-embedding second-moment matrix
    M = Σ ûûᵀ, by POWER ITERATION run entirely in-engine — the
    anisotropy/collapse monitor one number deeper than
    :func:`embedding_dispersion_by_label`'s centroid norm (a corpus can
    have centroid ~0 yet still collapse onto one AXIS; the top
    eigenvalue share catches that).  Output: n, the Rayleigh-quotient
    top eigenvalue share λ₁/trace (1/64 = isotropic, → 1 = rank-1
    collapse), and the iteration residual ‖Mv − λv‖/λ‖v‖ as the
    self-grading convergence column.

    Determinism discipline: M's 64×64 entries are EXACT integer sums of
    micro-unit products (one flatten-outer-product explode, map-side
    combined — never a self-join).  The iteration vector is re-quantized
    to nano int64 after each normalization, so every matvec is an exact
    decimal product-sum (float never accumulates across the 64 terms —
    a double groupBy sum would be partition-order dependent); the one
    double op per round (norm sqrt + divide) runs on exact ints.  Fixed
    all-ones start, fixed :data:`POWER_ITERATIONS` rounds, no
    convergence branch — both engines execute the identical arithmetic.

    Scale shape: the corpus-sized work is ONE explode-groupBy onto 64²
    rows; the iteration runs on 64-row/4096-row frames."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot64(F.col("embedding"), F.col("embedding")))
    base = emb.select("vec_id", "embedding", nrm.alias("nrm")).where(
        F.col("nrm") > 0
    )
    # try_divide, not `/`: the nrm > 0 filter above is NOT a guarantee the
    # division never sees a zero — whole-stage codegen evaluates this
    # transform as a common subexpression INSIDE the Filter evaluator
    # (observed on Spark 4.1: GeneratedClass$SpecificPredicate.subExpr_0
    # runs the ArrayTransform before the predicate verdict), so a single
    # zero-norm embedding row crashed the query under ANSI while the
    # DuckDB oracle (WHERE nrm > 0 before its division) returned the
    # degenerate row — a real cross-engine divergence, caught round 13 by
    # the new zero-corpus test.  try_divide is the identical IEEE divide
    # wherever nrm > 0, and the NULL it yields on filtered rows is never
    # observed.
    unit = base.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                F.try_divide(x.cast("double"), F.col("nrm")) * MICRO + 0.5
            ).cast("long"),
        ).alias("u"),
    )
    # ROUND-12 OPTIMIZATION (guide §2.3, second pass — same shape fix as
    # kmeans_refine): the flatten-outer-product explode inflated every
    # vector into DIM² = 4096 (i, j, p) rows before the groupBy — the
    # hash aggregate ingested corpus×4096 rows, every one through a
    # decimal(38) conversion.  Replaced with a TWO-LEVEL aggregation:
    # explode only the ROW index (corpus×64 rows) and (level 1) sum the
    # 64 per-j products in plain LONG within bounded chunks of
    # _GRAM_CHUNK = 4096 vectors (|x·y| ≤ 1e12 ⇒ |chunk sum| ≤ 4·10¹⁵,
    # three orders of magnitude inside int64 — whole-stage-codegen long
    # arithmetic, no decimal op per term), then (level 2) sum the chunk
    # subtotals in decimal(38).  Equivalence is exact: each m(i,j) is an
    # integer sum of the same products, and integer sums are associative
    # — Σ_dec38(terms) == Σ_dec38(Σ_long per chunk) regardless of chunk
    # assignment; the chunk key (vec_id div 4096) is deterministic data,
    # not a random key (guide §2.5).
    rows = unit.select(
        F.expr(f"vec_id div {_GRAM_CHUNK}").alias("chunk"),
        F.col("u"),
        F.posexplode("u").alias("i", "x"),
    )
    # ROUND-13 OPTIMIZATION (guide §1.2 — don't run a second corpus pass
    # for a count): n_vecs used to be its own unit.agg(count) job, which
    # re-ran the normalize over the whole corpus.  Every vector emits
    # exactly ONE rows-row per i, so count(*) per (chunk, i) summed over
    # chunks at any fixed i IS n_vecs — the count rides the Gram
    # aggregation and the single bounded collect below carries it.
    per_chunk = rows.groupBy("chunk", "i").agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.col("x") * F.element_at(F.col("u"), j + 1)).alias(f"m{j}")
            for j in range(DIM)
        ],
    )
    per_i = per_chunk.groupBy("i").agg(
        F.sum("cnt").alias("cnt_i"),
        *[F.sum(dec38(F.col(f"m{j}"))).alias(f"m{j}") for j in range(DIM)]
    )
    m_raw = per_i.select(
        "i",
        "cnt_i",
        F.posexplode(F.array(*[F.col(f"m{j}") for j in range(DIM)])).alias(
            "j", "m"
        ),
    )
    # trace-normalize M into 1e12 fixed point BEFORE iterating: raw entries
    # grow with the corpus (n·1e12 at 1e9 rows ≈ 1e21) and their downstream
    # products blow past decimal(38); M' = floor(M/trace·1e12 + 0.5) keeps
    # every later product bounded independent of corpus size, and
    # vᵀM'v/vᵀv = 1e12·λ/trace IS the eigenvalue share up to the fixed grid
    trace_raw = m_raw.filter(F.col("i") == F.col("j")).agg(
        F.sum("m").alias("trace_raw")
    )
    m_frame = (
        m_raw.join(F.broadcast(trace_raw))
        .select(
            "i",
            "j",
            "cnt_i",
            F.floor(
                F.col("m").cast("double") / F.col("trace_raw").cast("double")
                * 1.0e12
                + 0.5
            )
            .cast("long")
            .alias("m"),
        )
    )

    # ROUND-12 OPTIMIZATION (guide §1.2/§5): the iteration itself runs on a
    # CONSTANT 64×64 frame, but expressing it as 3 rounds of
    # join→groupBy→broadcast built ~20 tiny bounded-frame Spark jobs whose
    # fixed scheduling overhead dominated the query wall (round-8 plan
    # audit; measured 13.0 s isolated at sf0.1).  The corpus-sized work
    # (normalization + explode-Gram, the only part that grows with rows)
    # stays distributed above; M' is then fetched with ONE bounded collect
    # — ≤ DIM² = 4096 longs, corpus-size-independent, the same bounded
    # class as the k-means k×DIM centroid fetch — and the power iteration
    # replays the IDENTICAL exact arithmetic in driver Python: int sums
    # are exact in both (decimal(38) there, arbitrary-precision here), and
    # every double op (the casts, divides, floor(+0.5) re-quantizations)
    # is the same IEEE-754 sequence, so the output is bit-identical (the
    # unchanged closed-form SQL oracle verifies this per run).
    import math

    m_rows = m_frame.collect()  # bounded: ≤ DIM² rows of (i, j, cnt_i, m)
    # empty m_rows ⟺ empty unit frame (per_i always emits DIM rows from a
    # non-empty unit, and the broadcast trace join preserves them), so the
    # degenerate count is exactly 0 — same value the old count(*) job gave
    n_vecs = int(m_rows[0]["cnt_i"]) if m_rows else 0

    def out_frame(share_v, resid_v):
        return spark.createDataFrame(
            [(n_vecs, POWER_ITERATIONS, share_v, resid_v)],
            "n_vecs bigint, iterations int, top_eigen_share double, residual double",
        )

    if not m_rows:  # degenerate corpus: all-null stats, like the agg form
        return out_frame(None, None)
    m: dict[tuple[int, int], int] = {(r["i"], r["j"]): int(r["m"]) for r in m_rows}
    v = [NANO] * DIM
    for _ in range(POWER_ITERATIONS):
        w = [
            sum(m.get((i, j), 0) * v[j] for j in range(DIM)) for i in range(DIM)
        ]
        mx = max(abs(x) for x in w)
        v = [int(math.floor(float(x) / float(mx) * NANO + 0.5)) for x in w]
    mvs = [
        int(
            math.floor(
                float(sum(m.get((i, j), 0) * v[j] for j in range(DIM))) / 1.0e9
                + 0.5
            )
        )
        for i in range(DIM)
    ]
    vmv = sum(a * b for a, b in zip(mvs, v))
    vv = sum(b * b for b in v)
    mvmv = sum(a * a for a in mvs)
    lam = float(vmv) / float(vv)
    share = lam / 1.0e3
    resid = math.sqrt(
        max(float(mvmv) - lam * lam * float(vv), 0.0)
    ) / (lam * math.sqrt(float(vv)))
    micro = lambda x: math.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return out_frame(micro(share), micro(resid))


def embedding_top_component_sql() -> str:
    nrm = _dot_sql("embedding", "embedding")
    it_prev = "v0"
    its = []
    for r in range(1, POWER_ITERATIONS + 1):
        its.append(
            f"""w{r} AS (
  SELECT m.i, sum(m.m * {it_prev}.v::hugeint) AS w
  FROM m_frame m JOIN {it_prev} ON m.j = {it_prev}.j
  GROUP BY m.i
),
v{r} AS (
  SELECT w{r}.i AS j,
         CAST(floor(w{r}.w::double / (SELECT max(abs(w)) FROM w{r})::double
                    * {NANO} + 0.5) AS BIGINT) AS v
  FROM w{r}
)"""
        )
        it_prev = f"v{r}"
    iters = ",\n".join(its)
    return f"""
WITH base AS (
  SELECT embedding, sqrt({nrm}) AS nrm FROM embeddings
),
unitv AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(x::double / nrm * {MICRO} + 0.5) AS BIGINT)) AS u
  FROM base WHERE nrm > 0
),
pairs AS (
  SELECT gi.i AS i, gj.j AS j, (u[gi.i] * u[gj.j])::hugeint AS p
  FROM unitv,
       unnest(range(1, {DIM + 1})) gi(i),
       unnest(range(1, {DIM + 1})) gj(j)
),
m_raw AS (
  -- 0-based (i, j) to match Spark's transform index
  SELECT (i - 1)::int AS i, (j - 1)::int AS j, sum(p) AS m
  FROM pairs GROUP BY 1, 2
),
tr AS (SELECT sum(m) AS trace_raw FROM m_raw WHERE i = j),
m_frame AS (
  SELECT i, j,
         CAST(floor(m::double / (SELECT trace_raw FROM tr)::double * 1.0e12
                    + 0.5) AS BIGINT) AS m
  FROM m_raw
),
nv AS (SELECT count(*) AS n_vecs FROM unitv),
v0 AS (
  SELECT (x - 1)::int AS j, {NANO}::bigint AS v
  FROM unnest(range(1, {DIM + 1})) t(x)
),
{iters},
mv AS (
  SELECT i, CAST(floor(t::double / 1.0e9 + 0.5) AS BIGINT) AS mvs
  FROM (
    SELECT m.i, sum(m.m::hugeint * {it_prev}.v::hugeint) AS t
    FROM m_frame m JOIN {it_prev} ON m.j = {it_prev}.j
    GROUP BY m.i
  )
),
stats AS (
  SELECT sum(mv.mvs::hugeint * vv.v::hugeint) AS vmv,
         sum(vv.v::hugeint * vv.v::hugeint) AS vv,
         sum(mv.mvs::hugeint * mv.mvs::hugeint) AS mvmv
  FROM mv JOIN {it_prev} vv ON mv.i = vv.j
)
SELECT nv.n_vecs AS n_vecs,
       {POWER_ITERATIONS} AS iterations,
       floor((vmv::double / vv::double) / 1.0e3
             * 1000000.0 + 0.5) / 1000000.0 AS top_eigen_share,
       floor(sqrt(greatest(mvmv::double
                           - (vmv::double / vv::double)
                             * (vmv::double / vv::double) * vv::double, 0.0))
             / ((vmv::double / vv::double) * sqrt(vv::double))
             * 1000000.0 + 0.5) / 1000000.0 AS residual
FROM stats CROSS JOIN nv
"""


# Contamination threshold: real text-embedding corpora use ~0.9 (SemDeDup
# territory); this fixture's random near-orthogonal vectors cap pairwise
# cosine near 0.4, so the fixture threshold sits where the detector is
# actually EXERCISED (counts > 0 and both flag values occur) rather than
# vacuously green — the degeneracy lesson from the EB/CUPED incidents.
SEMDECON_TAU = 0.35


def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination: for each held-out query
    vector (vec_id < N_QUERIES — the same held-out convention as
    cosine_topk), how many CORPUS vectors sit at cosine ≥ SEMDECON_TAU,
    plus the worst offender — the semantic sibling of the n-gram
    :func:`dedup.decontamination` (which catches verbatim leakage; this
    catches paraphrase-level leakage n-grams miss, the gap SemDeDup-style
    audits exist for).

    Scale shape: the held-out side is bounded (broadcast); the corpus
    side is ONE scan with per-row dot products against the broadcast
    queries — the brute-force-but-linear exact plan; at production scale
    the IVF cell router (ivf_assign) prunes the scan per query.  The
    per-query top-1 and count are map-side partial aggregates.

    Determinism: the shared strict-left-fold dot (bit-identical vs the
    oracle's list_sum fold), 1e-6 fixed-point cosines, vec_id tie-break
    on the argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    queries = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    corpus = with_norm.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    joined = corpus.join(F.broadcast(queries))
    cos = _cosine(
        _dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm")
    )
    scored = joined.select("query_id", "corpus_id", cos.alias("cosine"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    counts = scored.groupBy("query_id").agg(
        F.sum((F.col("cosine") >= SEMDECON_TAU).cast("long")).alias("n_contaminated")
    )
    return (
        top.join(counts, "query_id")
        .select(
            "query_id",
            "n_contaminated",
            F.col("corpus_id").alias("nearest_corpus_id"),
            F.col("cosine").alias("nearest_cosine"),
            (F.col("cosine") >= SEMDECON_TAU).alias("is_contaminated"),
        )
        .orderBy("query_id")
    )


def semantic_decontamination_sql() -> str:
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         floor({dot} / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5)
           / {COSINE_SCALE} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
top AS (
  SELECT query_id, corpus_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, corpus_id) AS rn
  FROM scored
),
counts AS (
  SELECT query_id,
         sum((cosine >= {SEMDECON_TAU})::bigint) AS n_contaminated
  FROM scored GROUP BY query_id
)
SELECT t.query_id, CAST(c.n_contaminated AS BIGINT) AS n_contaminated,
       t.corpus_id AS nearest_corpus_id,
       t.cosine AS nearest_cosine,
       t.cosine >= {SEMDECON_TAU} AS is_contaminated
FROM top t JOIN counts c USING (query_id)
WHERE t.rn = 1
ORDER BY t.query_id
"""


def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding NORM health: mean/σ of vector norms from exact
    fixed-point moments, the min/max envelope, and how many vectors sit
    outside mean ± 3σ — the degenerate-embedding detector that catches
    what cosine-based checks can't (cosine normalizes norms away; a
    collapsing encoder often shows up in the norm distribution first).

    Determinism: each norm is NANO-quantized to int64 at the row (1e-9:
    on an exactly-unit-normalized corpus the float32 normalization
    jitter IS the signal — a micro grid would round every norm to 1.0
    and the audit would be vacuously flat, the degeneracy the registry
    audit forbids), so the moment sums are exact integers (per-factor
    DECIMAL products for Σx²); mean/σ/outlier fences are single double
    expressions over those integers.

    Scale shape: one scan with per-row fold dots, one groupBy onto
    labels, one broadcast-join second pass for the outlier count."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_micro = F.floor(
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))) * 1000000000.0 + 0.5
    ).cast("long")
    rows = emb.select("label", norm_micro.alias("nm"))
    m = rows.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum("nm").alias("s1"),
        F.sum(dec38(F.col("nm")) * dec38(F.col("nm"))).alias("s2"),
        F.min("nm").alias("mn"),
        F.max("nm").alias("mx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = (
        (dec38(F.col("n")) * F.col("s2") - dec38(F.col("s1")) * dec38(F.col("s1"))).cast(
            "double"
        )
        / (nd * nd)
    )
    sd = F.sqrt(var)
    stats = m.select(
        "label",
        "n",
        mean.alias("mean_m"),
        sd.alias("sd_m"),
        "mn",
        "mx",
    )
    j = rows.join(F.broadcast(stats), "label")
    out_cnt = j.filter(
        F.abs(F.col("nm").cast("double") - F.col("mean_m")) > 3.0 * F.col("sd_m")
    ).groupBy("label").agg(F.count("*").alias("n_outliers"))
    nano9 = lambda c: F.floor(c * 1000000000.0 + 0.5) / 1000000000.0  # noqa: E731
    return (
        stats.join(out_cnt, "label", "left")
        .select(
            "label",
            "n",
            nano9(F.col("mean_m") / 1.0e9).alias("mean_norm"),
            nano9(F.col("sd_m") / 1.0e9).alias("sd_norm"),
            (F.col("mn") / 1000000000.0).alias("min_norm"),
            (F.col("mx") / 1000000000.0).alias("max_norm"),
            F.coalesce(F.col("n_outliers"), F.lit(0)).alias("n_outliers_3sd"),
        )
        .orderBy("label")
    )


def embedding_norm_audit_sql() -> str:
    dot = _dot_sql("embedding", "embedding")
    return f"""
WITH rows_ AS (
  SELECT label,
         CAST(floor(sqrt({dot}) * 1000000000.0 + 0.5) AS BIGINT) AS nm
  FROM embeddings
),
m AS (
  SELECT label, count(*) AS n, sum(nm) AS s1,
         sum(nm::hugeint * nm::hugeint) AS s2,
         min(nm) AS mn, max(nm) AS mx
  FROM rows_ GROUP BY label
),
stats AS (
  SELECT label, n, s1::double / n::double AS mean_m,
         sqrt((n::hugeint * s2 - s1::hugeint * s1::hugeint)::double
              / (n::double * n::double)) AS sd_m,
         mn, mx
  FROM m
),
outs AS (
  SELECT r.label, count(*) AS n_outliers
  FROM rows_ r JOIN stats s USING (label)
  WHERE abs(r.nm::double - s.mean_m) > 3.0 * s.sd_m
  GROUP BY r.label
)
SELECT s.label, CAST(s.n AS BIGINT) AS n,
       floor(s.mean_m / 1.0e9 * 1000000000.0 + 0.5) / 1000000000.0 AS mean_norm,
       floor(s.sd_m / 1.0e9 * 1000000000.0 + 0.5) / 1000000000.0 AS sd_norm,
       s.mn / 1000000000.0 AS min_norm,
       s.mx / 1000000000.0 AS max_norm,
       coalesce(o.n_outliers, 0) AS n_outliers_3sd
FROM stats s LEFT JOIN outs o USING (label)
ORDER BY s.label
"""
