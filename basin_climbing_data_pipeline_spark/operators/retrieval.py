"""BM25 retrieval over the ``documents`` table.

Beyond-the-reference operator family (the brief's large-scale
training-data-pipeline surface; closest in-repo siblings are
``textstats.tfidf_keywords`` — rational tf-idf ranking — and the ANN
retrieval path in ``similarity.py``).  BM25 is the classic sparse
retrieval scorer a data-curation pipeline runs to mine topical documents
(query-targeted corpus selection, hard-negative mining for embedding
training, eval-set construction).

Design for 100 TB:

- Term frequencies are computed scan-side as pure column expressions
  (``size(filter(words, w -> w = t))`` per query term) — the query
  vocabulary is tiny and known up front, so there is NO corpus explode,
  no (doc, token) shuffle, and column pruning reaches the parquet scan.
- Corpus statistics (N, Σdl, per-term document frequencies) reduce to ONE
  single-row aggregate, broadcast back via the 1-row ``crossJoin`` pattern
  used across the repo (e.g. ``dedup.py`` corpus stats) — a map-side
  combine plus a 1-row exchange, nothing more.
- The per-query top-k is a window over only the docs that matched ≥1 term
  (score > 0) — at web scale that candidate set is the posting-list union,
  a tiny fraction of the corpus.  Spark's ``row_number + filter`` over a
  by-query partition resolves to a partial top-k per map task under AQE.

Determinism: scores are ranked by their micro-int image
``floor(score · 1e6 + 0.5)`` with a ``doc_id`` tie-break, and emitted at
the same fixed-point resolution, so both engines rank and hash
identically (the ``zipf_slope`` transcendental discipline: exact-integer
inputs into ``ln``, fixed-point on the way out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

# query_id -> terms.  Terms come from the synthetic corpus vocabulary; the
# scoring/ranking machinery is the operator, the query list is config.
BM25_QUERIES: dict[str, tuple[str, ...]] = {
    "q_engine": ("spark", "stream", "batch"),
    "q_exec": ("merge", "join", "hash"),
    "q_shape": ("data", "query", "fast"),
}

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
_SCALE = 1000000.0


def _terms() -> list[str]:
    """Distinct query terms in first-appearance order (stable)."""
    seen: list[str] = []
    for terms in BM25_QUERIES.values():
        for t in terms:
            if t not in seen:
                seen.append(t)
    return seen


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-:data:`BM25_TOP_K` documents per query under BM25
    (k1=1.2, b=0.75, Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf).

    Plan: one projection computes dl + per-term tf scan-side; one 1-row
    aggregate yields N / Σdl / df_t; a broadcast 1-row crossJoin feeds the
    per-(doc, query) score expressions; one window ranks within query."""
    docs = load_table(spark, sf_dir, "documents")
    words = "split(trim(text), ' ')"
    tf_cols = [
        F.expr(f"size(filter({words}, w -> w = '{t}'))").alias(f"tf_{t}")
        for t in _terms()
    ]
    base = docs.select(
        "doc_id", F.expr(f"size({words})").cast("long").alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _terms()
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(t: str) -> F.Column:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        n = F.col("n_docs").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))
        norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / avgdl)
        return F.when(F.col(f"tf_{t}") > 0, idf * (tf * (BM25_K1 + 1.0)) / norm).otherwise(
            F.lit(0.0)
        )

    per_query = [
        F.struct(
            F.lit(qid).alias("query_id"),
            sum(term_score(t) for t in terms).alias("s"),  # type: ignore[arg-type]
        )
        for qid, terms in BM25_QUERIES.items()
    ]
    scored = (
        joined.select("doc_id", F.explode(F.array(*per_query)).alias("q"))
        .select(
            "doc_id",
            F.col("q.query_id").alias("query_id"),
            F.floor(F.col("q.s") * _SCALE + 0.5).cast("long").alias("score_micro"),
        )
        .filter(F.col("score_micro") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("score_micro").cast("double") / _SCALE).alias("bm25_score"),
        )
        .orderBy("query_id", "rank")
    )


def bm25_topk_sql() -> str:
    terms = _terms()
    tf_exprs = ",\n         ".join(
        f"len(list_filter(words, w -> w = '{t}')) AS tf_{t}" for t in terms
    )
    df_exprs = ",\n         ".join(
        f"CAST(sum((tf_{t} > 0)::int) AS BIGINT) AS df_{t}" for t in terms
    )

    def term_score(t: str) -> str:
        idf = f"ln(1.0 + (n_docs::double - df_{t}::double + 0.5) / (df_{t}::double + 0.5))"
        norm = (
            f"(tf_{t}::double + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} "
            f"* dl::double / (sum_dl::double / n_docs::double)))"
        )
        return (
            f"CASE WHEN tf_{t} > 0 THEN {idf} * (tf_{t}::double * {BM25_K1 + 1.0}) "
            f"/ {norm} ELSE 0.0 END"
        )

    branches = "\n  UNION ALL\n".join(
        "  SELECT doc_id, '{qid}' AS query_id,\n"
        "         CAST(floor(({score}) * {scale} + 0.5) AS BIGINT) AS score_micro\n"
        "  FROM joined".format(
            qid=qid,
            score=" + ".join(term_score(t) for t in qterms),
            scale=_SCALE,
        )
        for qid, qterms in BM25_QUERIES.items()
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS dl,
         {tf_exprs}
  FROM (SELECT doc_id, string_split(trim(text, ' '), ' ') AS words FROM documents)
),
stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         {df_exprs}
  FROM base
),
joined AS (SELECT * FROM base, stats),
scored AS (
{branches}
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored
  WHERE score_micro > 0
)
SELECT query_id, rank, doc_id, score_micro::double / {_SCALE} AS bm25_score
FROM ranked
WHERE rank <= {BM25_TOP_K}
ORDER BY query_id, rank
"""
