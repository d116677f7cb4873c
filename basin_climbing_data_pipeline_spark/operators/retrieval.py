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


# ---------------------------------------------------------------------------
# hybrid retrieval — reciprocal-rank fusion of dense + lexical rankings
# ---------------------------------------------------------------------------

RRF_K = 60          # the standard RRF damping constant
RRF_CAND = 20       # per-ranker candidate depth fed into the fusion
RRF_TOP_K = 10      # fused results per query
RRF_NANO = 1_000_000_000
MAX_TOKEN_DF = 5000  # lexical inverted-index df prune (no-op at test scale;
#                      drops stop-token join blowup at 1e9 docs — the
#                      _pruned_shingles discipline, Jaccard defined over the
#                      pruned token space on both sides)


def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-by-example HYBRID retrieval: for each query document
    (doc_id < 10, the aligned vec_id query convention), fuse the DENSE
    ranking (embedding cosine) with the LEXICAL ranking (word-set
    Jaccard via inverted index) by reciprocal-rank fusion —
    RRF(d) = Σ_r 1/(K + rank_r(d)) — the standard hybrid-search
    combiner (Cormack et al.), and the retrieval shape every RAG-style
    data pipeline ships: lexical catches exact terms, dense catches
    paraphrase, RRF needs no score calibration because it only consumes
    RANKS.

    Exactness: each contribution is the INTEGER floor division
    1e9 // (K + rank), so fused scores are exact int64 sums — no float
    reciprocals to disagree on; per-ranker ranks come from micro-fixed
    cosine / Jaccard with doc_id tie-breaks.  A doc ranked by only one
    side contributes only that side (the standard top-M candidate-union
    semantics).

    Scale shape: the dense side is the bounded-query broadcast plan of
    ``cosine_topk`` (swap in the IVF/LSH candidate generator siblings at
    1e9 rows); the lexical side is a df-pruned inverted-index join
    (≤ |queries|·df rows); fusion is a full outer join over two
    ≤ queries×RRF_CAND frames."""
    from pyspark.sql import Window

    from .similarity import N_QUERIES, _cosine, _dot64

    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    q = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm"))
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    dense = (
        c.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn("rank_dense", F.row_number().over(wd))
        .filter(F.col("rank_dense") <= RRF_CAND)
        .select("query_id", "doc_id", "rank_dense")
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # ROUND-13 RE-ADJUDICATION (guide §5): round 12 cached the df-pruned
    # inverted index (three consumers); the driver record disagreed with
    # that A/B (0.90x), and a clean 2x-alternating 5-rep re-A/B this round
    # confirmed the driver: persisted mins 2.77/2.86 s vs uncached
    # 2.17/2.21 s at sf0.1 — the persist serializes the dense-scan and
    # inverted-index subtrees that otherwise overlap as sibling stages of
    # the one noop-write job (the retrieval_rank_agreement adjudication
    # generalizes here after all).  REVERTED to the uncached shape.
    pruned = toks.join(
        df_counts.filter(F.col("df") <= MAX_TOKEN_DF).select("tok"), "tok"
    )
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    qt = pruned.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    inter = (
        qt.join(pruned, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("common"))
    )
    sq = sizes.select(F.col("doc_id").alias("query_id"), F.col("n_tok").alias("n_q"))
    sd = sizes.select("doc_id", F.col("n_tok").alias("n_d"))
    jac = (
        F.floor(
            F.col("common")
            / (F.col("n_q") + F.col("n_d") - F.col("common"))
            * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("doc_id"))
    lex = (
        inter.join(sq, "query_id")
        .join(sd, "doc_id")
        .withColumn("jaccard", jac)
        .withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= RRF_CAND)
        .select("query_id", "doc_id", "rank_lex")
    )

    fused = dense.join(lex, ["query_id", "doc_id"], "full")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.expr(f"{RRF_NANO} div ({RRF_K} + {r})"), F.lit(0)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_nano"), F.asc("doc_id"))
    return (
        fused.withColumn("rrf_nano", contrib("rank_dense") + contrib("rank_lex"))
        .withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= RRF_TOP_K)
        .select(
            "query_id",
            "fused_rank",
            "doc_id",
            "rank_dense",
            "rank_lex",
            (F.col("rrf_nano") / float(RRF_NANO)).alias("rrf_score"),
        )
        .orderBy("query_id", "fused_rank")
    )


def hybrid_rrf_retrieval_sql() -> str:
    from .similarity import COSINE_SCALE, N_QUERIES, _dot_sql

    dot = _dot_sql("q.q_emb", "c.c_emb")
    return f"""
WITH norms AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS norm
  FROM embeddings
),
dense_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         floor({dot} / (q.q_norm * c.c_norm) * {COSINE_SCALE} + 0.5)
           / {COSINE_SCALE} AS cosine
  FROM (SELECT vec_id, embedding AS q_emb, norm AS q_norm FROM norms
        WHERE vec_id < {N_QUERIES}) q
  JOIN (SELECT vec_id, embedding AS c_emb, norm AS c_norm FROM norms) c
    ON c.vec_id != q.vec_id
),
dense AS (
  SELECT query_id, doc_id, rank_dense FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id) AS rank_dense
    FROM dense_pairs
  ) WHERE rank_dense <= {RRF_CAND}
),
toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(trim(text, ' '), ' ')) AS tok
        FROM documents)
  WHERE tok != ''
),
pruned AS (
  SELECT t.doc_id, t.tok FROM toks t
  JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= {MAX_TOKEN_DF}) d
    USING (tok)
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM pruned GROUP BY doc_id),
inter AS (
  SELECT q.doc_id AS query_id, d.doc_id, count(*) AS common
  FROM pruned q JOIN pruned d USING (tok)
  WHERE q.doc_id < {N_QUERIES} AND d.doc_id != q.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, rank_lex FROM (
    SELECT i.query_id, i.doc_id,
           row_number() OVER (
             PARTITION BY i.query_id
             ORDER BY floor(i.common
                            / (sq.n_tok + sd.n_tok - i.common)::double
                            * 1000000.0 + 0.5) / 1000000.0 DESC,
                      i.doc_id) AS rank_lex
    FROM inter i
    JOIN sizes sq ON sq.doc_id = i.query_id
    JOIN sizes sd ON sd.doc_id = i.doc_id
  ) WHERE rank_lex <= {RRF_CAND}
),
fused AS (
  SELECT coalesce(d.query_id, l.query_id) AS query_id,
         coalesce(d.doc_id, l.doc_id) AS doc_id,
         d.rank_dense, l.rank_lex,
         coalesce({RRF_NANO} // ({RRF_K} + d.rank_dense), 0)
           + coalesce({RRF_NANO} // ({RRF_K} + l.rank_lex), 0) AS rrf_nano
  FROM dense d FULL JOIN lex l
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id, fused_rank, doc_id, rank_dense, rank_lex,
       rrf_nano / {float(RRF_NANO)!r} AS rrf_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_nano DESC, doc_id) AS fused_rank
  FROM fused
)
WHERE fused_rank <= {RRF_TOP_K}
ORDER BY query_id, fused_rank
"""


def retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much do the dense and lexical retrievers AGREE?  Per query:
    overlap@K between the cosine top-K and the word-Jaccard top-K, plus
    the mean absolute rank displacement over the shared docs — the
    diagnostic that says whether :func:`hybrid_rrf_retrieval`'s fusion is
    actually adding signal (overlap ≈ 1 means the second retriever is
    redundant; overlap ≈ 0 with good downstream evals means they cover
    different failure modes — the reason hybrid search exists).

    Determinism: both rankings replicate the RRF candidate stages
    verbatim (1e-6 cosines / Jaccards, doc_id tie-breaks); agreement
    numbers are exact integer counts and micro ratios.

    Scale shape: identical to the RRF candidate stages (broadcast-query
    dense scan + df-pruned inverted index); agreement is a join of two
    ≤ queries×K frames."""
    from pyspark.sql import Window

    from ..io import load_table
    from .similarity import N_QUERIES, _cosine, _dot64

    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    q = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _cosine(_dot64(F.col("q_emb"), F.col("c_emb")), F.col("q_norm"), F.col("c_norm"))
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    dense = (
        c.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn("rank_dense", F.row_number().over(wd))
        .filter(F.col("rank_dense") <= RRF_CAND)
        .select("query_id", "doc_id", "rank_dense")
    )
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    pruned = toks.join(
        df_counts.filter(F.col("df") <= MAX_TOKEN_DF).select("tok"), "tok"
    )
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    qt = pruned.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    inter = (
        qt.join(pruned, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("common"))
    )
    sq = sizes.select(F.col("doc_id").alias("query_id"), F.col("n_tok").alias("n_q"))
    sd = sizes.select("doc_id", F.col("n_tok").alias("n_d"))
    jac = (
        F.floor(
            F.col("common")
            / (F.col("n_q") + F.col("n_d") - F.col("common"))
            * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("doc_id"))
    lex = (
        inter.join(sq, "query_id")
        .join(sd, "doc_id")
        .withColumn("jaccard", jac)
        .withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= RRF_CAND)
        .select("query_id", "doc_id", "rank_lex")
    )
    both = dense.join(lex, ["query_id", "doc_id"])
    per_q = both.groupBy("query_id").agg(
        F.count("*").alias("n_shared"),
        F.sum(F.abs(F.col("rank_dense") - F.col("rank_lex"))).alias("disp"),
    )
    n_lex = lex.groupBy("query_id").agg(F.count("*").alias("n_lex"))
    from ..functions.money import ratio

    return (
        dense.groupBy("query_id")
        .agg(F.count("*").alias("n_dense"))
        .join(n_lex, "query_id", "left")
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            "n_dense",
            F.coalesce(F.col("n_lex"), F.lit(0)).alias("n_lex"),
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.when(
                F.coalesce(F.col("n_lex"), F.lit(0)) + F.col("n_dense")
                - F.coalesce(F.col("n_shared"), F.lit(0))
                > 0,
                ratio(
                    F.coalesce(F.col("n_shared"), F.lit(0)).cast("double"),
                    (
                        F.col("n_dense")
                        + F.coalesce(F.col("n_lex"), F.lit(0))
                        - F.coalesce(F.col("n_shared"), F.lit(0))
                    ).cast("double"),
                    6,
                ),
            ).alias("overlap_jaccard"),
            F.when(
                F.coalesce(F.col("n_shared"), F.lit(0)) > 0,
                ratio(
                    F.col("disp").cast("double"), F.col("n_shared").cast("double"), 4
                ),
            ).alias("mean_rank_displacement"),
        )
        .orderBy("query_id")
    )


def retrieval_rank_agreement_sql() -> str:
    from .similarity import COSINE_SCALE, N_QUERIES, _dot_sql

    dot = _dot_sql("q.embedding", "c.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    nc = _dot_sql("c.embedding", "c.embedding")
    from ..functions.money import ratio_sql

    return f"""
WITH dense_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         floor({dot} / (sqrt({nq}) * sqrt({nc})) * {COSINE_SCALE} + 0.5)
           / {COSINE_SCALE} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
),
dense AS (
  SELECT query_id, doc_id, rank_dense FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id) AS rank_dense
    FROM dense_scored
  ) WHERE rank_dense <= {RRF_CAND}
),
toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(trim(text, ' '), ' ')) AS tok
  FROM documents
),
toks2 AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
dfc AS (SELECT tok, count(*) AS df FROM toks2 GROUP BY tok),
pruned AS (
  SELECT t.doc_id, t.tok FROM toks2 t JOIN dfc USING (tok)
  WHERE dfc.df <= {MAX_TOKEN_DF}
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM pruned GROUP BY doc_id),
inter AS (
  SELECT qt.doc_id AS query_id, p.doc_id, count(*) AS common
  FROM pruned qt JOIN pruned p USING (tok)
  WHERE qt.doc_id < {N_QUERIES} AND p.doc_id != qt.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, rank_lex FROM (
    SELECT i.query_id, i.doc_id,
           row_number() OVER (PARTITION BY i.query_id ORDER BY
             floor(i.common / (sq.n_tok + sd.n_tok - i.common) * 1000000.0 + 0.5)
               / 1000000.0 DESC, i.doc_id) AS rank_lex
    FROM inter i
    JOIN sizes sq ON sq.doc_id = i.query_id
    JOIN sizes sd ON sd.doc_id = i.doc_id
  ) WHERE rank_lex <= {RRF_CAND}
),
shared AS (
  SELECT d.query_id, count(*) AS n_shared,
         sum(abs(d.rank_dense - l.rank_lex)) AS disp
  FROM dense d JOIN lex l USING (query_id, doc_id)
  GROUP BY d.query_id
),
nd AS (SELECT query_id, count(*) AS n_dense FROM dense GROUP BY 1),
nl AS (SELECT query_id, count(*) AS n_lex FROM lex GROUP BY 1)
SELECT nd.query_id, CAST(nd.n_dense AS BIGINT) AS n_dense,
       CAST(coalesce(nl.n_lex, 0) AS BIGINT) AS n_lex,
       CAST(coalesce(b.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN nd.n_dense + coalesce(nl.n_lex, 0) - coalesce(b.n_shared, 0) > 0
            THEN {ratio_sql('coalesce(b.n_shared, 0)::double',
                            '(nd.n_dense + coalesce(nl.n_lex, 0) - coalesce(b.n_shared, 0))::double', 6)}
       END AS overlap_jaccard,
       CASE WHEN coalesce(b.n_shared, 0) > 0
            THEN {ratio_sql('b.disp::double', 'b.n_shared::double', 4)}
       END AS mean_rank_displacement
FROM nd LEFT JOIN nl USING (query_id) LEFT JOIN shared b USING (query_id)
ORDER BY nd.query_id
"""
