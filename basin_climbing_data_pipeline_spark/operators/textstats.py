"""Text-analysis operators over the ``documents`` table.

The large-scale training-data-pipeline operator family (BASELINE.json
north-star; the reference's closest analog is its LLM-enrichment UDF surface,
SURVEY.md §2.10 F4, fetch_instagram_data.py:189-290 — here re-expressed as
pure column expressions so the hot path never leaves the JVM):

- document stats: token counts (whitespace + regex tokenizer), unique-token
  ratio, stopword ratio, average word length
- language ID: marker-word scoring with deterministic argmax (n-gram
  heuristic family; markers are disjoint word sets per language)
- quality scoring: weighted composite of length/stopword/uniqueness ratios
  with good/ok/spam buckets
- token frequencies: corpus-level top-20
- fingerprinting: 60-bit md5-derived document fingerprint

All ratios are fixed-point (functions.money.ratio) for cross-engine hashing.
Scale: everything is a scan + per-row array ops + one groupBy; token
frequencies shuffle once on the token key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec38, dec38_prod, ratio, ratio_sql
from ..io import load_table

STOPWORDS = ("the", "a", "of", "and")

# disjoint marker-word sets per language (the scoring/argmax machinery is the
# operator; the marker lists are config)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast"),
    "es": ("data", "row", "slow"),
    "de": ("group", "hash", "key"),
    "fr": ("merge", "sort", "join"),
    "zh": ("spark", "query", "stream"),
}


def _words(col: F.Column) -> F.Column:
    return F.split(F.trim(col), " ")


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/unique-token stats from one pure-column
    projection — no UDFs, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    stop_pred = " OR ".join(f"w = '{s}'" for s in STOPWORDS)
    n_words = F.size(words)
    n_stop = F.size(F.expr(f"filter(split(trim(text), ' '), w -> {stop_pred})"))
    n_uniq = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("n_chars_actual"),
        n_words.alias("n_words"),
        n_uniq.alias("n_unique_words"),
        ratio(n_stop.cast("double"), n_words.cast("double"), 4).alias("stopword_ratio"),
        ratio(n_uniq.cast("double"), n_words.cast("double"), 4).alias("unique_ratio"),
        ratio(
            (F.length(F.trim(F.col("text"))) - n_words + 1).cast("double"),
            n_words.cast("double"),
            4,
        ).alias("avg_word_len"),
    )


def doc_stats_sql() -> str:
    stop_pred = " OR ".join(f"w = '{s}'" for s in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars, text,
         length(text) AS n_chars_actual,
         string_split(trim(text, ' '), ' ') AS words
  FROM documents
)
SELECT doc_id, lang, source, n_chars, n_chars_actual,
       len(words) AS n_words,
       len(list_distinct(words)) AS n_unique_words,
       {ratio_sql("len(list_filter(words, w -> " + stop_pred + "))::double", "len(words)::double", 4)} AS stopword_ratio,
       {ratio_sql('len(list_distinct(words))::double', 'len(words)::double', 4)} AS unique_ratio,
       {ratio_sql("(length(trim(text, ' ')) - len(words) + 1)::double", "len(words)::double", 4)} AS avg_word_len
FROM base
"""


def _lang_detected(docs: DataFrame, extra_cols: list[str]) -> DataFrame:
    """(extra_cols..., labeled_lang, detected_lang) — marker-word language
    ID: score = marker hits per language, detected = argmax with
    lexicographic tie-break.  Shared by the confusion matrix and the
    kappa eval."""
    scores = [
        F.size(
            F.expr(
                "filter(split(trim(text), ' '), w -> "
                + " OR ".join(f"w = '{m}'" for m in markers)
                + ")"
            )
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = docs.select(*extra_cols, F.col("lang").alias("labeled_lang"), *scores)
    # argmax with deterministic tie-break: greatest score wins, ties -> first
    # language in sorted order
    detected = None
    best = None
    for lang in sorted(LANG_MARKERS):
        s = F.col(f"score_{lang}")
        if detected is None:
            detected, best = F.lit(lang), s
        else:
            detected = F.when(s > best, lang).otherwise(detected)
            best = F.when(s > best, s).otherwise(best)
    return scored.withColumn("detected_lang", detected).drop(
        *[f"score_{lang}" for lang in LANG_MARKERS]
    )


def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: score = marker hits per language, detected =
    argmax with lexicographic tie-break; output the labeled × detected
    confusion matrix."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _lang_detected(docs, ["doc_id"])
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("labeled_lang", "detected_lang")
    )


def language_id_confusion_sql() -> str:
    score_cols = ",\n         ".join(
        "len(list_filter(words, w -> "
        + " OR ".join(f"w = '{m}'" for m in markers)
        + f")) AS score_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    langs = sorted(LANG_MARKERS)
    detect = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        detect = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {detect} END"
        best = f"greatest({best}, score_{lang})"
    return f"""
WITH base AS (
  SELECT doc_id, lang AS labeled_lang, string_split(trim(text, ' '), ' ') AS words
  FROM documents
),
scored AS (
  SELECT doc_id, labeled_lang,
         {score_cols}
  FROM base
)
SELECT labeled_lang, {detect} AS detected_lang, count(*) AS n_docs
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUALITY_SPAM_MAX = 0.35  # score below this -> the 'spam' bucket
QUALITY_GOOD_MIN = 0.5


def quality_score_col() -> F.Column:
    """Composite doc-quality score over the :func:`doc_stats` columns —
    shared by the bucket rollup and the corpus funnel so the two can never
    drift."""
    return ratio(
        0.4 * F.col("unique_ratio")
        + 0.3 * F.col("stopword_ratio")
        + 0.3 * F.least(F.col("n_words") / 100.0, F.lit(1.0)),
        F.lit(1.0),
        4,
    )


def quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score → good/ok/spam distribution per source."""
    stats = doc_stats(spark, sf_dir)
    bucketed = stats.withColumn("quality_score", quality_score_col()).withColumn(
        "quality_bucket",
        F.when(F.col("quality_score") >= QUALITY_GOOD_MIN, "good")
        .when(F.col("quality_score") >= QUALITY_SPAM_MAX, "ok")
        .otherwise("spam"),
    )
    return (
        bucketed.groupBy("source", "quality_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "quality_bucket")
    )


def quality_score_sql() -> str:
    return ratio_sql(
        "0.4 * unique_ratio + 0.3 * stopword_ratio + 0.3 * least(n_words / 100.0, 1.0)",
        "1.0",
        4,
    )


def quality_buckets_sql() -> str:
    score = quality_score_sql()
    return f"""
WITH stats AS ({doc_stats_sql()}),
scored AS (
  SELECT source, {score} AS quality_score FROM stats
)
SELECT source,
       CASE WHEN quality_score >= {QUALITY_GOOD_MIN} THEN 'good'
            WHEN quality_score >= {QUALITY_SPAM_MAX} THEN 'ok'
            ELSE 'spam' END AS quality_bucket,
       count(*) AS n_docs
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""


def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 tokens (explode → count → deterministic top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


def token_frequencies_sql() -> str:
    return """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents)
WHERE token != ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit md5-derived fingerprint of the normalized text (the document-
    fingerprinting primitive; grouping on it is exact dedup).  Normalization
    is :func:`fold_norm` — plain lower() is NOT engine-stable on arbitrary
    Unicode (Spark's context-sensitive Final_Sigma vs DuckDB's simple map
    made fingerprints disagree on Greek text; see functions/text.py)."""
    from ..functions.text import fold_norm

    docs = load_table(spark, sf_dir, "documents")
    fp = F.conv(F.substring(F.md5(fold_norm(F.col("text"))), 1, 15), 16, 10).cast("long")
    return docs.select("doc_id", fp.alias("fingerprint60"), "lang", "source")


def doc_fingerprints_sql() -> str:
    from ..functions.text import FOLD_NORM_SQL

    norm = FOLD_NORM_SQL.format(c="text")
    return f"""
SELECT doc_id,
       ('0x' || substr(md5({norm}), 1, 15))::bigint AS fingerprint60,
       lang, source
FROM documents
"""


def bigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, "Scaling Language Models", appendix A1.1 repetition filters —
    public paper): the share of the most frequent bigram and the fraction
    of bigram occurrences that are repeats.  High values flag boilerplate /
    degenerate text that pretraining pipelines drop.

    Shape: explode bigrams → count per (doc, bigram) → per-doc rollup.  The
    shuffle key includes doc_id, so no token is ever a hot key (unlike the
    corpus-level token_frequencies rollup); at 100 TB this is two map-side
    combinable aggregations.  The top-bigram pick is min(struct(-count,
    bigram)) — deterministic count-desc-then-lexicographic, no window sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    # bigrams as arrays_zip(words[1:], words[2:]) with the concat AFTER the
    # explode: slice/zip/explode/concat_ws are all codegen expressions,
    # where a transform() lambda building each bigram string runs
    # interpreted per element (measured 3x slower at sf0.1 — the same
    # higher-order-function trap as the LSH coefficients)
    n_bigrams_len = F.greatest(F.size(words) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(words, 1, n_bigrams_len).alias("w1"),
        F.slice(words, 2, n_bigrams_len).alias("w2"),
    )
    counts = (
        docs.select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "lang",
            F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("bigram"),
        )
        .groupBy("doc_id", "lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    per_doc = counts.groupBy("doc_id", "lang").agg(
        F.sum("n").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("_n_dup"),
        F.max("n").alias("_top_n"),
        F.min(F.struct((-F.col("n")).alias("neg"), F.col("bigram").alias("bigram"))).alias(
            "_top"
        ),
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "n_distinct_bigrams",
        F.col("_top.bigram").alias("top_bigram"),
        ratio(F.col("_top_n"), F.col("n_bigrams"), 4).alias("top_bigram_share"),
        ratio(F.col("_n_dup"), F.col("n_bigrams"), 4).alias("dup_bigram_frac"),
    ).orderBy("doc_id")


def bigram_repetition_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, split(trim(text, ' '), ' ') AS words FROM documents
),
bi AS (
  SELECT doc_id, lang, words[i] || ' ' || words[i + 1] AS bigram
  FROM toks, unnest(range(1, len(words))) AS t(i)
),
counts AS (
  SELECT doc_id, lang, bigram, count(*) AS n FROM bi GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(sum(n) AS BIGINT) AS n_bigrams,
         count(*) AS n_distinct_bigrams,
         CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup,
         max(n) AS top_n
  FROM counts GROUP BY 1, 2
),
top AS (
  SELECT doc_id, bigram AS top_bigram FROM (
    SELECT doc_id, bigram,
           row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bigram) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT p.doc_id, p.lang, p.n_bigrams, p.n_distinct_bigrams, t.top_bigram,
       {ratio_sql('top_n', 'n_bigrams', 4)} AS top_bigram_share,
       {ratio_sql('n_dup', 'n_bigrams', 4)} AS dup_bigram_frac
FROM per_doc p JOIN top t ON p.doc_id = t.doc_id
ORDER BY p.doc_id
"""


def source_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution: exact discrete p50/p90 plus
    count and fixed-point mean — the corpus-profiling stats a pretraining
    pipeline reports per data source before mixing.

    Percentiles are PERCENTILE_DISC computed with explicit rank math
    (value at row ceil(p*n) in ascending order): Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` both interpolate, and
    interpolated doubles hash-mismatch at ulp level across engines, while
    a discrete pick is a real row value — identical everywhere.  Approx
    sketches (``approx_percentile``) are the 100 TB alternative when exact
    ranks aren't required, but they are engine-specific by construction.
    Shape: one window sort per source partition + one groupBy."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select("source", "n_chars", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(Window.partitionBy("source")))

    def disc(p: float):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("n_chars"))
        )

    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            disc(0.5).alias("p50_chars"),
            disc(0.9).alias("p90_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            ratio(F.sum("n_chars"), F.count("*"), 2).alias("mean_chars"),
        )
        .orderBy("source")
    )


def source_length_percentiles_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       max(CASE WHEN rn = ceil(0.5 * n) THEN n_chars END) AS p50_chars,
       max(CASE WHEN rn = ceil(0.9 * n) THEN n_chars END) AS p90_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       {ratio_sql('sum(n_chars)', 'count(*)', 2)} AS mean_chars
FROM ranked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# PII-style pattern scrub — redaction audit over the corpus
# ---------------------------------------------------------------------------

# Redaction pattern families, applied in declaration order (order matters
# once patterns could overlap).  In a production corpus these are the usual
# email / E.164-phone / SSN / IP regexes (the reference normalizes exactly
# those identifier shapes, customer_matching.py:19-75); the synthetic corpus
# has no such tokens, so the config uses corpus-appropriate word patterns —
# the operator (count → replace → fingerprint) is pattern-independent.
SCRUB_PATTERNS: dict[str, str] = {
    "id_like": r"\b(customer|vector)\b",
    "contact_like": r"\b(line|row)\b",
}
SCRUB_TOKEN = "<scrub>"

# the production pattern set the same machinery runs on a real corpus
# (exercised against planted PII in tests/test_corpus_ops.py; Java and RE2
# compatible subset — no lookarounds)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,2}[ .-]?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def scrub_columns(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str],
    keep: list[str],
) -> DataFrame:
    """The scrub projection over any (…, text) frame: per-family match
    counts, total, and the md5 fingerprint of the text with every family
    replaced (in dict order — order matters once patterns overlap)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{fam}")
        for fam, pat in patterns.items()
    ]
    scrubbed = F.col(text_col)
    for pat in patterns.values():
        scrubbed = F.regexp_replace(scrubbed, pat, SCRUB_TOKEN)
    total = None
    for fam in patterns:
        c = F.col(f"n_{fam}")
        total = c if total is None else total + c
    return df.select(*keep, *counts, F.md5(scrubbed).alias("scrubbed_fp")).withColumn(
        "n_scrubbed_total", total
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction audit: per document, how many matches each scrub-pattern
    family has, plus the md5 fingerprint of the fully-scrubbed text (all
    families replaced, in config order).  The fingerprint is what a
    downstream exact-dedup pass would key on — scrubbing BEFORE dedup is
    the canonical order in a training-data pipeline, since redaction can
    make near-identical documents exactly identical.

    Scale shape: pure per-row column expressions (regexp_count +
    regexp_replace chain) — no UDF, no shuffle; the whole query is one
    codegen'd projection over the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return scrub_columns(docs, "text", SCRUB_PATTERNS, ["doc_id", "source"]).orderBy(
        "doc_id"
    )


def pii_scrub_sql() -> str:
    count_cols = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{fam}"
        for fam, pat in SCRUB_PATTERNS.items()
    )
    scrubbed = "text"
    for pat in SCRUB_PATTERNS.values():
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{SCRUB_TOKEN}', 'g')"
    total = " + ".join(f"n_{fam}" for fam in SCRUB_PATTERNS)
    return f"""
WITH scrubbed AS (
  SELECT doc_id, source,
       {count_cols},
       md5({scrubbed}) AS scrubbed_fp
  FROM documents
)
SELECT doc_id, source, {", ".join("n_" + f for f in SCRUB_PATTERNS)}, scrubbed_fp,
       ({total}) AS n_scrubbed_total
FROM scrubbed
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# subword / tokenizer-fertility stats
# ---------------------------------------------------------------------------

SUBWORD_PIECE_CHARS = 4  # fixed-width subword proxy: ceil(len/4) pieces/word


def subword_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting beyond whitespace (the budget unit a trainer
    actually bills in): per document, whitespace tokens, a BPE-ish regex
    token count (word / number / punctuation runs — the GPT-2 pre-tokenizer
    shape), a fixed-width subword count (ceil(len/SUBWORD_PIECE_CHARS)
    pieces per word — a deterministic stand-in for a learned BPE merge
    table, which would be a broadcast vocabulary lookup in the same plan
    position), and the resulting fertility (subword pieces per word).

    Scale shape: pure per-row expressions — the word loop is a JVM
    higher-order aggregate, not a UDF; one codegen'd projection over the
    scan, no shuffle but the output sort."""
    from ..functions.money import ratio

    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    n_subword = F.expr(
        f"aggregate(split(trim(text), ' '), 0L,"
        f" (acc, x) -> acc + (length(x) + {SUBWORD_PIECE_CHARS - 1})"
        f" div {SUBWORD_PIECE_CHARS})"
    )
    n_regex = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), F.lit(0))
    )
    return docs.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        n_subword.alias("n_subword_tokens"),
        n_regex.cast("bigint").alias("n_regex_tokens"),
        ratio(n_subword.cast("double"), n_words.cast("double"), 4).alias("fertility"),
    ).orderBy("doc_id")


def subword_token_stats_sql() -> str:
    from ..functions.money import ratio_sql

    k = SUBWORD_PIECE_CHARS
    return f"""
WITH base AS (
  SELECT doc_id, source, text, string_split(trim(text, ' '), ' ') AS words
  FROM documents
)
SELECT doc_id, source,
       len(words) AS n_words,
       CAST(list_sum(list_transform(words, x -> (length(x) + {k - 1}) // {k}))
            AS BIGINT) AS n_subword_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT)
         AS n_regex_tokens,
       {ratio_sql(
           "list_sum(list_transform(words, x -> (length(x) + "
           + str(k - 1) + ") // " + str(k) + "))::double",
           "len(words)::double",
           4,
       )} AS fertility
FROM base
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# sliding-window chunking — embedding-corpus construction
# ---------------------------------------------------------------------------

CHUNK_WINDOW_TOKENS = 32  # window width (tokens)
CHUNK_STRIDE_TOKENS = 24  # stride (tokens); < width => overlap


def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-width token windows
    (width CHUNK_WINDOW_TOKENS, stride CHUNK_STRIDE_TOKENS) — the chunking
    step that turns a document corpus into an embedding/RAG corpus, where
    each window becomes one embedding row.  Output: one row per window
    with its token span and an md5 fingerprint of the window text (the
    key a downstream chunk-level dedup or vector index would use).

    Window layout: starts at 0, stride apart; the last window is the
    first one whose end reaches the document end (so short docs yield
    exactly one window, and no trailing tokens are dropped — the
    guarantee a retrieval corpus needs).

    Scale shape: per-row transform + explode (output ∝ corpus × ~1.3
    overlap factor), no shuffle but the output sort; the fingerprint
    makes the result directly joinable against the dedup family."""
    docs = load_table(spark, sf_dir, "documents")
    wtok, stride = CHUNK_WINDOW_TOKENS, CHUNK_STRIDE_TOKENS
    # n_windows = 1 + ceil(max(n - width, 0) / stride)
    windows = F.expr(
        f"""
        transform(
          sequence(0, cast(ceil(greatest(size(w) - {wtok}, 0) / {stride}) as int)),
          i -> struct(
            i * {stride} AS start_tok,
            least(i * {stride} + {wtok}, size(w)) AS end_tok,
            concat_ws(' ', slice(w, i * {stride} + 1,
                                 least({wtok}, size(w) - i * {stride}))) AS chunk
          )
        )"""
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.split(F.trim(F.col("text")), " ").alias("w"),
        )
        .select("doc_id", "source", F.posexplode(windows).alias("window_idx", "win"))
        .select(
            "doc_id",
            "source",
            F.col("window_idx").cast("long").alias("window_idx"),
            F.col("win.start_tok").cast("long").alias("start_tok"),
            F.col("win.end_tok").cast("long").alias("end_tok"),
            F.md5(F.col("win.chunk")).alias("chunk_fp"),
        )
        .orderBy("doc_id", "window_idx")
    )


def sliding_window_chunks_sql() -> str:
    wtok, stride = CHUNK_WINDOW_TOKENS, CHUNK_STRIDE_TOKENS
    return f"""
WITH base AS (
  SELECT doc_id, source, string_split(trim(text, ' '), ' ') AS w FROM documents
),
wins AS (
  SELECT doc_id, source,
         unnest(range(0, ceil(greatest(len(w) - {wtok}, 0) / {stride})::bigint + 1))
           AS window_idx,
         w
  FROM base
)
SELECT doc_id, source, window_idx,
       window_idx * {stride} AS start_tok,
       least(window_idx * {stride} + {wtok}, len(w)) AS end_tok,
       md5(array_to_string(
         list_slice(w, (window_idx * {stride} + 1)::int,
                    least(window_idx * {stride} + {wtok}, len(w))::int), ' '))
         AS chunk_fp
FROM wins
ORDER BY doc_id, window_idx
"""


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

VOCAB_SIZES = (4, 8, 16, 32)


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage curve of a frequency-built vocabulary: for each candidate
    vocab size K, what fraction of all token OCCURRENCES is covered by the
    top-K tokens (1 − coverage = the OOV rate a K-entry tokenizer would
    pay).  The tokenizer-budget sizing query of a training-data pipeline.

    Scale shape: the corpus collapses to the token-count table first (one
    explode + one groupBy shuffle — the same aggregation any word-count
    does), and only THAT table (vocab-sized, ≪ corpus: a few 100k rows at
    any corpus scale) flows through the global rank window.  The window's
    single-partition sort is over the vocab, never the corpus, so it stays
    driver-safe at 100 TB.  K fan-out is an array explode over literal
    sizes — no re-scan per K."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # vocab-sized input: the unpartitioned rank window is over ~|vocab| rows
    ranked = counts.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n"), "token"))
    )
    sizes = F.array(*[F.lit(k) for k in VOCAB_SIZES])
    per_k = ranked.select(
        "n", "rk", F.explode(sizes).alias("vocab_size")
    )
    return (
        per_k.groupBy("vocab_size")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("vocab_size"), F.col("n")).otherwise(F.lit(0))).alias(
                "covered_tokens"
            ),
            F.sum("n").alias("total_tokens"),
        )
        .select(
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            ratio(F.col("covered_tokens"), F.col("total_tokens"), 6).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


def vocab_coverage_sql() -> str:
    sizes = ", ".join(str(k) for k in VOCAB_SIZES)
    return f"""
WITH counts AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents)
  WHERE token != ''
  GROUP BY token
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM counts
),
per_k AS (
  SELECT n, rk, unnest([{sizes}]) AS vocab_size FROM ranked
)
SELECT vocab_size,
       CAST(sum(CASE WHEN rk <= vocab_size THEN n ELSE 0 END) AS BIGINT) AS covered_tokens,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       {ratio_sql('sum(CASE WHEN rk <= vocab_size THEN n ELSE 0 END)',
                  'sum(n)', 6)} AS coverage
FROM per_k
GROUP BY vocab_size
ORDER BY vocab_size
"""


# ---------------------------------------------------------------------------
# tf-idf keyword extraction
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-:data:`TFIDF_TOP_K` keywords per document by a tf-idf score —
    the classic two-aggregation + per-doc-argmax extraction pattern
    (explode → per-(doc,token) tf → per-token df → rank within doc).

    The score is the RATIONAL surrogate ``tf * 1e6 div df`` (monotone in
    tf and in 1/df), computed in exact integer arithmetic so Spark and
    DuckDB agree bit-for-bit; production would swap in ``tf·ln(N/df)`` —
    a one-line change that alters no plan shape, only the ranking key.
    (Transcendental scoring is exercised — with exact micro-int sums —
    in :func:`zipf_slope`.)

    Scale shape: tf is one groupBy on (doc_id, token); df is one groupBy
    on token (vocab-sized output, broadcast to the tf side); the top-k
    window partitions by doc_id.  Two shuffles on high-cardinality keys,
    both key-balanced; the df join is a broadcast."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "score_micro", F.expr("tf * 1000000L div df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("token")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", F.col("rk").alias("rank"), "token", "tf", "df", "score_micro")
        .orderBy("doc_id", "rank")
    )


def tfidf_keywords_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks WHERE token != ''
  GROUP BY doc_id, token
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks WHERE token != ''
  GROUP BY token
),
scored AS (
  SELECT t.doc_id, t.token, t.tf, df.df,
         (t.tf * 1000000) // df.df AS score_micro,
         row_number() OVER (
           PARTITION BY t.doc_id ORDER BY (t.tf * 1000000) // df.df DESC, t.token
         ) AS rk
  FROM tf t JOIN df USING (token)
)
SELECT doc_id, rk AS rank, token, tf, df, score_micro
FROM scored WHERE rk <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 1000  # fit over the top-N tokens (whole vocab here; the head at scale)


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(freq) against ln(rank) over the top-N
    vocabulary — the Zipf exponent, a one-row corpus-health metric (a
    natural corpus fits slope ≈ −1; template/spam-heavy corpora flatten).

    Exactness discipline: the regression inputs ln(rank), ln(freq) are
    micro-rounded to int64 BEFORE summation, so the four sufficient
    statistics (Σx, Σy, Σxy, Σx²) are exact integer sums — immune to
    float summation-order drift across engines and partitions — and the
    final slope/intercept are micro-rounded doubles of those exact ints.
    ln itself is evaluated on exact integers in both engines; the only
    cross-engine risk is a libm ulp landing exactly on a .5 micro
    boundary (~1e-9 per value).

    Scale shape: same as :func:`vocab_coverage` — corpus → token-count
    table (one shuffle), rank window over the vocab-sized table only,
    then a single global aggregate of four int64 sums."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    ranked = (
        counts.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), "token"))
        )
        .filter(F.col("rk") <= ZIPF_TOP_N)
        .select(
            F.floor(F.log(F.col("rk").cast("double")) * 1000000.0 + 0.5)
            .cast("long")
            .alias("x"),
            F.floor(F.log(F.col("n").cast("double")) * 1000000.0 + 0.5)
            .cast("long")
            .alias("y"),
        )
    )
    # the moment products overflow int64 once the fitted head is large
    # (k=1000: k·sxx ≈ 4.8e19 > 2^63 — found by random-corpus fuzzing;
    # DuckDB silently promotes to HUGEINT while ANSI Spark THROWS), so the
    # squared moments accumulate as DECIMAL(38,0) — exact and
    # order-insensitive, same pattern as visit_spend_correlation
    stats = ranked.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec38_prod(F.col("x"), F.col("y"))).alias("sxy"),
        F.sum(dec38_prod(F.col("x"), F.col("x"))).alias("sxx"),
    )
    num = dec38(F.col("k")) * F.col("sxy") - dec38(F.col("sx")) * dec38(F.col("sy"))
    den = dec38(F.col("k")) * F.col("sxx") - dec38(F.col("sx")) * dec38(F.col("sx"))
    # slope in ln-units: the micro scaling of x and y cancels; the one
    # drop to double happens here, on both engines' identical exact ints.
    # den is exactly 0 when the ranked head is a single distinct token
    # (k=1 → x=ln(1)=0) and NULL on an empty corpus (k=0, null sums) —
    # both degenerate fits are reported as NULL rather than letting the
    # engines diverge on 0/0 (the event_funnel/refund-rate guard class).
    slope = num.cast("double") / den.cast("double")
    guard = lambda c: F.when(den != F.lit(0), c)  # noqa: E731
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k") / 1000000.0
    return stats.select(
        F.col("k").alias("n_tokens"),
        guard(F.floor(slope * 1000000.0 + 0.5) / 1000000.0).alias("zipf_slope"),
        guard(F.floor(intercept * 1000000.0 + 0.5) / 1000000.0).alias("ln_intercept"),
    )


def zipf_slope_sql() -> str:
    return f"""
WITH counts AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents)
  WHERE token != ''
  GROUP BY token
),
ranked AS (
  SELECT floor(ln(rk::double) * 1000000.0 + 0.5)::bigint AS x,
         floor(ln(n::double) * 1000000.0 + 0.5)::bigint AS y
  FROM (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM counts)
  WHERE rk <= {ZIPF_TOP_N}
),
stats AS (
  SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT k AS n_tokens,
       CASE WHEN k * sxx - sx * sx != 0 THEN
         floor((k * sxy - sx * sy)::double / (k * sxx - sx * sx) * 1000000.0 + 0.5)
           / 1000000.0 END AS zipf_slope,
       CASE WHEN k * sxx - sx * sx != 0 THEN
         floor(((sy - (k * sxy - sx * sy)::double / (k * sxx - sx * sx) * sx) / k)
               / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 END AS ln_intercept
FROM stats
"""


# ---------------------------------------------------------------------------
# per-source entropy / KL divergence
# ---------------------------------------------------------------------------


def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution health: Shannon entropy (nats) and KL
    divergence from the corpus-wide distribution — the two numbers mixture
    design actually reads (low entropy → templated source; high KL →
    source that skews the mix).

    Exactness: each term's log factor is micro-rounded to int64 BEFORE
    the weighted sum (``Σ n_ts · lnp_micro`` is an exact integer in both
    engines, immune to summation order); the division back to nats
    happens once per source and is micro-rounded.  Same discipline as
    zipf_slope.

    Scale shape: corpus → (source, token) count table (the one big
    shuffle); corpus-wide token totals are a SECOND aggregation of that
    same table (vocab-sized, broadcast back); per-source sums ride a
    groupBy on source.  Nothing after the first aggregation touches
    corpus volume."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("n_st"))
    )
    totals = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    from pyspark.sql import Window

    corpus = st.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    # corpus side is vocab-sized: the grand total rides a window over that
    # tiny table (no 1-row scalar join), and the result broadcasts
    corpus_q = F.broadcast(
        corpus.withColumn("n", F.sum("n_t").over(Window.partitionBy())).select(
            "token",
            F.floor(F.log(F.col("n_t") / F.col("n")) * 1000000.0 + 0.5)
            .cast("long")
            .alias("lnq_micro"),
        )
    )
    terms = (
        st.join(totals, "source")
        .withColumn(
            "lnp_micro",
            F.floor(F.log(F.col("n_st") / F.col("n_s")) * 1000000.0 + 0.5).cast("long"),
        )
        .join(corpus_q, "token")
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab_size"),
            F.sum(F.col("n_st") * F.col("lnp_micro")).alias("_e"),
            F.sum(F.col("n_st") * (F.col("lnp_micro") - F.col("lnq_micro"))).alias("_k"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab_size",
            (
                F.floor(-F.col("_e") / F.col("n_tokens") / 1000000.0 * 1000000.0 + 0.5)
                / 1000000.0
            ).alias("entropy_nats"),
            (
                F.floor(F.col("_k") / F.col("n_tokens") / 1000000.0 * 1000000.0 + 0.5)
                / 1000000.0
            ).alias("kl_from_corpus"),
        )
        .orderBy("source")
    )


def source_token_entropy_sql() -> str:
    return """
WITH st AS (
  SELECT source, token, count(*) AS n_st
  FROM (SELECT source, unnest(string_split(trim(text, ' '), ' ')) AS token FROM documents)
  WHERE token != ''
  GROUP BY source, token
),
totals AS (SELECT source, sum(n_st)::bigint AS n_s FROM st GROUP BY source),
corpus AS (SELECT token, sum(n_st)::bigint AS n_t FROM st GROUP BY token),
n_total AS (SELECT sum(n_t)::bigint AS n FROM corpus),
corpus_q AS (
  SELECT token,
         floor(ln(n_t::double / n.n) * 1000000.0 + 0.5)::bigint AS lnq_micro
  FROM corpus, n_total n
),
terms AS (
  SELECT s.source, s.n_st, t.n_s,
         floor(ln(s.n_st::double / t.n_s) * 1000000.0 + 0.5)::bigint AS lnp_micro,
         q.lnq_micro
  FROM st s
  JOIN totals t USING (source)
  JOIN corpus_q q USING (token)
)
SELECT source,
       max(n_s) AS n_tokens,
       count(*) AS vocab_size,
       floor(-sum(n_st * lnp_micro)::double / max(n_s) / 1000000.0 * 1000000.0 + 0.5)
         / 1000000.0 AS entropy_nats,
       floor(sum(n_st * (lnp_micro - lnq_micro))::double / max(n_s) / 1000000.0
             * 1000000.0 + 0.5) / 1000000.0 AS kl_from_corpus
FROM terms
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information —
    ``ln( p(xy) / (p(x)·p(y)) )`` — the classic phrase/collocation
    extractor of an NLP preprocessing stack (feeds tokenizer merge rules
    and stop-phrase lists).

    Determinism: every probability is a ratio of exact integer counts;
    the single ln per surviving bigram is evaluated on the identical
    double in both engines and the result is micro-rounded, with the
    micro value also serving as the sort key.

    Scale shape: one explode+groupBy each for bigrams and unigrams (the
    corpus shuffles); totals ride windows over those vocab-sized count
    tables; the unigram side broadcasts onto the bigram rows twice (x
    and y).  The min-count filter prunes the long tail before the join."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.split(F.trim(F.col("text")), " ").alias("w"))
    # the index filter (i+1 < size) is load-bearing under ANSI mode: an
    # out-of-range w[i+1] THROWS on a 1-word doc (Spark 4 default) — short
    # docs must contribute no bigrams, matching the oracle's NULL-drop
    bigrams = words.select(
        F.explode(
            F.expr(
                "transform("
                " filter(sequence(0, greatest(size(w) - 2, 0)), i -> i + 1 < size(w)),"
                " i -> struct(w[i] as x, w[i+1] as y))"
            )
        ).alias("bg")
    ).select("bg.x", "bg.y").filter(
        (F.col("x") != "") & (F.col("y") != "") & F.col("y").isNotNull()
    )
    bg_counts = bigrams.groupBy("x", "y").agg(F.count("*").alias("nxy"))
    uni = (
        docs.select(F.explode(_words(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").alias("n"))
    )
    b_total = bg_counts.withColumn("b", F.sum("nxy").over(Window.partitionBy()))
    u_total = F.broadcast(
        uni.withColumn("t_total", F.sum("n").over(Window.partitionBy()))
    )
    joined = (
        b_total.filter(F.col("nxy") >= PMI_MIN_COUNT)
        .join(
            u_total.select(F.col("t").alias("x"), F.col("n").alias("nx"), "t_total"),
            "x",
        )
        .join(u_total.select(F.col("t").alias("y"), F.col("n").alias("ny")), "y")
    )
    pmi = F.log(
        (F.col("nxy") / F.col("b"))
        / ((F.col("nx") / F.col("t_total")) * (F.col("ny") / F.col("t_total")))
    )
    return (
        joined.select(
            "x",
            "y",
            "nxy",
            F.floor(pmi * 1000000.0 + 0.5).cast("long").alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "x", "y")
        .limit(20)
    )


def pmi_collocations_sql() -> str:
    return f"""
WITH words AS (
  SELECT string_split(trim(text, ' '), ' ') AS w FROM documents
),
bigrams AS (
  SELECT w[i] AS x, w[i + 1] AS y
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM words)
  WHERE w[i] != '' AND w[i + 1] != ''
),
bg AS (SELECT x, y, count(*) AS nxy FROM bigrams GROUP BY x, y),
uni AS (
  SELECT t, count(*) AS n FROM (
    SELECT unnest(string_split(trim(text, ' '), ' ')) AS t FROM documents
  ) WHERE t != '' GROUP BY t
),
bt AS (SELECT x, y, nxy, sum(nxy) OVER () AS b FROM bg),
ut AS (SELECT t, n, sum(n) OVER () AS t_total FROM uni),
joined AS (
  SELECT bt.x, bt.y, bt.nxy,
         floor(ln((bt.nxy::double / bt.b)
                  / ((ux.n::double / ux.t_total) * (uy.n::double / uy.t_total)))
               * 1000000.0 + 0.5)::bigint AS pmi_micro
  FROM bt
  JOIN ut ux ON ux.t = bt.x
  JOIN ut uy ON uy.t = bt.y
  WHERE bt.nxy >= {PMI_MIN_COUNT}
)
SELECT x, y, nxy, pmi_micro
FROM joined
ORDER BY pmi_micro DESC, x, y
LIMIT 20
"""


# ---------------------------------------------------------------------------
# quality rule battery (Gopher-style hard filters)
# ---------------------------------------------------------------------------

# Rule bounds (module constants so Spark and the oracle compile the same
# thresholds).  All ratio comparisons run on the shared fixed-point ratio()
# output, so a doc sits on the same side of every threshold in both engines.
RULE_MIN_WORDS = 20
RULE_MAX_WORDS = 400
RULE_MIN_AVG_WORD_LEN = 2.0
RULE_MAX_AVG_WORD_LEN = 8.0
RULE_MAX_TOP_TOKEN_FRAC = 0.2
RULE_MIN_TTR = 0.3
RULE_MAX_STOPWORD_FRAC = 0.35


def quality_rule_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard-filter battery (doc-length bounds, mean-word-length
    bounds, most-frequent-token fraction, type-token ratio, stopword
    fraction) rolled up per source: how many documents each rule rejects and
    the all-rules pass rate.  This is the rule-count companion to the
    composite ``quality_buckets`` score — a training corpus applies BOTH
    (score for mixing, hard rules for outright removal).  Reference analog:
    the flags engine's per-rule trigger counts
    (customer_flags_engine.py:352-354), lifted to corpus hygiene.

    Scale shape: every rule is a pure column expression over one scan (the
    top-token fraction runs inside the row's token array — no explode, no
    shuffle), then ONE groupBy on source.  Nothing leaves the JVM."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    stop_pred = " OR ".join(f"w = '{s}'" for s in STOPWORDS)
    n_words = F.size(words)
    n_stop = F.size(F.expr(f"filter(split(trim(text), ' '), w -> {stop_pred})"))
    n_uniq = F.size(F.array_distinct(words))
    top_cnt = F.expr(
        "array_max(transform(array_distinct(split(trim(text), ' ')),"
        " t -> size(filter(split(trim(text), ' '), x -> x = t))))"
    )
    avg_len = ratio(
        (F.length(F.trim(F.col("text"))) - n_words + 1).cast("double"),
        n_words.cast("double"),
        4,
    )
    top_frac = ratio(top_cnt.cast("double"), n_words.cast("double"), 4)
    ttr = ratio(n_uniq.cast("double"), n_words.cast("double"), 4)
    stop_frac = ratio(n_stop.cast("double"), n_words.cast("double"), 4)
    fails = {
        "fail_len": ~n_words.between(RULE_MIN_WORDS, RULE_MAX_WORDS),
        "fail_word_len": ~avg_len.between(RULE_MIN_AVG_WORD_LEN, RULE_MAX_AVG_WORD_LEN),
        "fail_top_token": top_frac > RULE_MAX_TOP_TOKEN_FRAC,
        "fail_ttr": ttr < RULE_MIN_TTR,
        "fail_stopword": stop_frac > RULE_MAX_STOPWORD_FRAC,
    }
    flagged = docs.select(
        "source", *[cond.cast("bigint").alias(name) for name, cond in fails.items()]
    )
    pass_all = (sum(F.col(n) for n in fails) == 0).cast("bigint")
    return (
        flagged.withColumn("pass_all", pass_all)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            *[F.sum(n).alias(n) for n in fails],
            F.sum("pass_all").alias("n_pass"),
            ratio(F.sum("pass_all").cast("double"), F.count("*").cast("double"), 4).alias(
                "pass_rate"
            ),
        )
        .orderBy("source")
    )


def quality_rule_battery_sql() -> str:
    stop_pred = " OR ".join(f"w = '{s}'" for s in STOPWORDS)
    return f"""
WITH base AS (
  SELECT source, text, string_split(trim(text, ' '), ' ') AS words
  FROM documents
),
m AS (
  SELECT source,
         len(words) AS n_words,
         {ratio_sql("(length(trim(text, ' ')) - len(words) + 1)::double", "len(words)::double", 4)} AS avg_len,
         {ratio_sql('list_max(list_transform(list_distinct(words), t -> len(list_filter(words, x -> x = t))))::double', 'len(words)::double', 4)} AS top_frac,
         {ratio_sql('len(list_distinct(words))::double', 'len(words)::double', 4)} AS ttr,
         {ratio_sql('len(list_filter(words, w -> ' + stop_pred + '))::double', 'len(words)::double', 4)} AS stop_frac
  FROM base
),
f AS (
  SELECT source,
         (NOT (n_words BETWEEN {RULE_MIN_WORDS} AND {RULE_MAX_WORDS}))::int AS fail_len,
         (NOT (avg_len BETWEEN {RULE_MIN_AVG_WORD_LEN} AND {RULE_MAX_AVG_WORD_LEN}))::int AS fail_word_len,
         (top_frac > {RULE_MAX_TOP_TOKEN_FRAC})::int AS fail_top_token,
         (ttr < {RULE_MIN_TTR})::int AS fail_ttr,
         (stop_frac > {RULE_MAX_STOPWORD_FRAC})::int AS fail_stopword
  FROM m
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(fail_len) AS BIGINT) AS fail_len,
       CAST(sum(fail_word_len) AS BIGINT) AS fail_word_len,
       CAST(sum(fail_top_token) AS BIGINT) AS fail_top_token,
       CAST(sum(fail_ttr) AS BIGINT) AS fail_ttr,
       CAST(sum(fail_stopword) AS BIGINT) AS fail_stopword,
       CAST(sum((fail_len + fail_word_len + fail_top_token + fail_ttr + fail_stopword = 0)::int) AS BIGINT) AS n_pass,
       {ratio_sql('sum((fail_len + fail_word_len + fail_top_token + fail_ttr + fail_stopword = 0)::int)::double', 'count(*)::double', 4)} AS pass_rate
FROM f
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# unigram-LM log-probability scoring (perplexity proxy)
# ---------------------------------------------------------------------------

# micro-int thresholds for the likelihood buckets (ln-prob, nats * 1e6)
LOGPROB_LIKELY_MICRO = -3_000_000
LOGPROB_TYPICAL_MICRO = -4_500_000


def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: fit a unigram LM on the corpus
    itself (token frequencies), score every document by its mean token
    log-probability, and bucket into likely/typical/rare.  This is the
    cheapest member of the model-based-quality family (CCNet's wikipedia-LM
    perplexity filter, re-expressed with the corpus as its own LM) — rare
    mean-logprob documents are the OOD/garbage tail a mixture designer
    down-weights before the expensive model-based scorers run.

    Exactness: per-token ln p is micro-rounded to int64 once (vocab-sized
    table), each document sums exact integers (order-insensitive), and the
    per-doc mean is micro-rounded once — same discipline as
    ``source_token_entropy``.  Bucket thresholds compare the int64 micro
    mean, so a doc lands in the same bucket in both engines.

    Scale shape: one token-count aggregation (vocab-sized result,
    broadcast back), one explode + equi-join on token, one per-doc groupBy.
    Every stage is keyed; the vocab table is tiny at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", "source", F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    from pyspark.sql import Window

    uni = toks.groupBy("token").agg(F.count("*").alias("n_t"))
    lm = F.broadcast(
        uni.withColumn("n", F.sum("n_t").over(Window.partitionBy())).select(
            "token",
            F.floor(F.log(F.col("n_t") / F.col("n")) * 1000000.0 + 0.5)
            .cast("long")
            .alias("lnp_micro"),
        )
    )
    per_doc = (
        toks.join(lm, "token")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_tokens"), F.sum("lnp_micro").alias("_s"))
        .withColumn(
            "avg_micro",
            F.floor(F.col("_s").cast("double") / F.col("n_tokens") + 0.5).cast("long"),
        )
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("avg_micro") / 1000000.0).alias("avg_logprob"),
        F.when(F.col("avg_micro") >= LOGPROB_LIKELY_MICRO, "likely")
        .when(F.col("avg_micro") >= LOGPROB_TYPICAL_MICRO, "typical")
        .otherwise("rare")
        .alias("ppl_bucket"),
    ).orderBy("doc_id")


def unigram_logprob_quality_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, token
  FROM (SELECT doc_id, source, unnest(string_split(trim(text, ' '), ' ')) AS token
        FROM documents)
  WHERE token != ''
),
uni AS (SELECT token, count(*) AS n_t FROM toks GROUP BY token),
lm AS (
  SELECT token,
         floor(ln(n_t::double / (SELECT sum(n_t) FROM uni)) * 1000000.0 + 0.5)::bigint
           AS lnp_micro
  FROM uni
),
per_doc AS (
  SELECT t.doc_id, t.source,
         count(*) AS n_tokens,
         floor(sum(lm.lnp_micro)::double / count(*) + 0.5)::bigint AS avg_micro
  FROM toks t
  JOIN lm USING (token)
  GROUP BY t.doc_id, t.source
)
SELECT doc_id, source, n_tokens,
       avg_micro / 1000000.0 AS avg_logprob,
       CASE WHEN avg_micro >= {LOGPROB_LIKELY_MICRO} THEN 'likely'
            WHEN avg_micro >= {LOGPROB_TYPICAL_MICRO} THEN 'typical'
            ELSE 'rare' END AS ppl_bucket
FROM per_doc
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# gram novelty by source — how much NEW content each source contributes
# ---------------------------------------------------------------------------


def gram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source first-occurrence novelty: treating ``doc_id`` order as
    ingestion order (the corpus invariant — doc_ids are assigned at
    ingest), a document's novel grams are the distinct 3-word shingles
    whose FIRST occurrence (minimum doc_id corpus-wide) is that document.
    Rolled up per source: how many grams a source contributed total and
    how many were new when they arrived — the "is this crawl adding
    anything" number a corpus-growth dashboard tracks.

    Scale shape: identical inverted-index pattern to
    :func:`~.dedup.repeated_ngram_coverage` — one groupBy on the shingle
    key (min doc_id), one join back, two cheap rollups.  The min-per-gram
    aggregation combines map-side, so the shuffle carries one row per
    distinct gram per partition."""
    from ..functions.money import ratio
    from .dedup import _shingles_df

    sh = _shingles_df(spark, sf_dir).select("doc_id", "shingle")
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("bigint")).alias("n_novel"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    agg = (
        docs.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("n_grams"), F.lit(0))).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("n_novel"), F.lit(0))).cast("long").alias("n_novel_grams"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_grams",
        "n_novel_grams",
        F.when(
            F.col("n_grams") > 0,
            ratio(F.col("n_novel_grams").cast("double"), F.col("n_grams").cast("double"), 4),
        ).alias("novelty_ratio"),
    ).orderBy("source")


def gram_novelty_by_source_sql() -> str:
    from ..functions.money import ratio_sql
    from .dedup import _SHINGLES_SQL

    frac = ratio_sql("n_novel_grams::double", "n_grams::double", 4)
    return f"""
WITH {_SHINGLES_SQL},
first_seen AS (
  SELECT shingle, min(doc_id) AS first_doc FROM shingles GROUP BY shingle
),
per_doc AS (
  SELECT s.doc_id, count(*) AS n_grams,
         CAST(sum((s.doc_id = f.first_doc)::int) AS BIGINT) AS n_novel
  FROM shingles s JOIN first_seen f USING (shingle)
  GROUP BY s.doc_id
),
agg AS (
  SELECT d.source,
         count(*) AS n_docs,
         CAST(sum(coalesce(p.n_grams, 0)) AS BIGINT) AS n_grams,
         CAST(sum(coalesce(p.n_novel, 0)) AS BIGINT) AS n_novel_grams
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
  GROUP BY d.source
)
SELECT source, n_docs, n_grams, n_novel_grams,
       CASE WHEN n_grams > 0 THEN {frac} END AS novelty_ratio
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# interpolated bigram LM — the next rung of model-based quality scoring
# ---------------------------------------------------------------------------

BIGRAM_LAMBDA = 0.75  # dyadic interpolation weight (exact in IEEE doubles)


def bigram_interp_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    fit on the corpus itself: ``p(w|prev) = 0.75·n(prev,w)/n(prev) +
    0.25·n(w)/N`` (a document's first token backs off to the unigram
    term alone).  The next rung above
    :func:`unigram_logprob_quality` on the CCNet-style model-based
    quality ladder — bigram context separates "rare words" from "rare
    word ORDER", which is what machine-garbled text actually exhibits.

    Exactness: counts are exact integers; each probability is one or two
    correctly-rounded divisions combined with EXACT dyadic weights (0.75 /
    0.25), so the double entering ``ln`` is identical across engines; per
    -token ln p is micro-rounded to int64, per-doc sums are exact, and
    the mean is rounded once (the ``unigram_logprob_quality``
    discipline).

    Scale shape: token sequence via one per-doc window (lag); unigram and
    bigram count tables are vocab-/bigram-vocab-sized aggregations
    broadcast back; one per-doc rollup.  Every join is keyed on token
    identity — no corpus-sized shuffle beyond the tokenize itself."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.expr("filter(split(trim(text), ' '), w -> w != '')")).alias(
            "pos", "token"
        ),
    )
    # NOTE (round 12): caching the lagged sequence for the three consumers
    # measured WORSE (2.30 vs 1.91 s 5-rep alternating min at sf0.1) — the
    # token-sized persist costs more than the overlapping recomputes
    seq = toks.withColumn(
        "prev", F.lag("token").over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    uni = toks.groupBy("token").agg(F.count("*").alias("n_t"))
    n_total = F.sum("n_t").over(Window.partitionBy())
    uni = F.broadcast(uni.withColumn("n", n_total))
    big = F.broadcast(
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count("*").alias("n_b"))
    )
    prev_uni = F.broadcast(
        uni.select(F.col("token").alias("prev"), F.col("n_t").alias("n_prev"))
    )
    scored = (
        seq.join(uni, "token")
        .join(prev_uni, "prev", "left")
        .join(big, ["prev", "token"], "left")
    )
    p_uni = F.col("n_t").cast("double") / F.col("n").cast("double")
    p_big = F.col("n_b").cast("double") / F.col("n_prev").cast("double")
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(
        BIGRAM_LAMBDA * p_big + (1.0 - BIGRAM_LAMBDA) * p_uni
    )
    lnp_micro = F.floor(F.log(p) * 1000000.0 + 0.5).cast("long")
    per_doc = (
        scored.withColumn("lnp_micro", lnp_micro)
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_tokens"), F.sum("lnp_micro").alias("_s"))
        .withColumn(
            "avg_micro",
            F.floor(F.col("_s").cast("double") / F.col("n_tokens") + 0.5).cast("long"),
        )
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("avg_micro") / 1000000.0).alias("avg_logprob"),
    ).orderBy("doc_id")


def bigram_interp_logprob_sql() -> str:
    lam = BIGRAM_LAMBDA
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         generate_subscripts(words, 1) - 1 AS pos,
         unnest(words) AS token
  FROM (SELECT doc_id, source,
               list_filter(string_split(trim(text, ' '), ' '), w -> w != '') AS words
        FROM documents)
),
seq AS (
  SELECT doc_id, source, pos, token,
         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
uni AS (SELECT token, count(*) AS n_t FROM toks GROUP BY token),
big AS (
  SELECT prev, token, count(*) AS n_b FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, token
),
scored AS (
  SELECT s.doc_id, s.source,
         CASE WHEN s.prev IS NULL
              THEN u.n_t::double / (SELECT sum(n_t) FROM uni)::double
              ELSE {lam} * (b.n_b::double / pu.n_t::double)
                   + {1.0 - lam} * (u.n_t::double / (SELECT sum(n_t) FROM uni)::double)
         END AS p
  FROM seq s
  JOIN uni u ON u.token = s.token
  LEFT JOIN uni pu ON pu.token = s.prev
  LEFT JOIN big b ON b.prev = s.prev AND b.token = s.token
),
per_doc AS (
  SELECT doc_id, source, count(*) AS n_tokens,
         floor(sum(CAST(floor(ln(p) * 1000000.0 + 0.5) AS BIGINT))::double
               / count(*) + 0.5)::bigint AS avg_micro
  FROM scored
  GROUP BY doc_id, source
)
SELECT doc_id, source, n_tokens, avg_micro / 1000000.0 AS avg_logprob
FROM per_doc
ORDER BY doc_id
"""



# ---------------------------------------------------------------------------
# in-engine linear probe — model fitting via exact normal equations
# ---------------------------------------------------------------------------
#
# OLS regression of the composite quality score on its raw ingredients,
# solved in CLOSED FORM: one aggregation pass collects the 4x4 moment
# matrix as exact integer sums, Cramer's rule solves it in a 1-row
# projection.  Because the score IS a linear function of the features,
# the probe must recover the generating coefficients (0.3/0.4/0.3) to
# fixed-point resolution — the verifiable sanity property an in-engine
# trainer needs before you point it at real labels.
#
# Determinism: features and label are 1e-4 fixed point, so the scaled
# integers are exact; moment sums accumulate as DECIMAL(38,0) (Spark) /
# HUGEINT (DuckDB) — order-insensitive at any scale, no int64 overflow
# at 100-TB row counts; every double that follows is derived from those
# exact sums by the SAME textual expression in both engines (the Cramer
# expansion below is GENERATED once and fed to F.expr and the SQL).

_FEAT_SCALE = 10000  # the fixed-point grid of the ratio features


def _det3(m: list[list[str]]) -> str:
    """Symbolic 3x3 determinant (expansion fixed order — parity-safe)."""
    return (
        f"({m[0][0]}) * (({m[1][1]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][1]}))"
        f" - ({m[0][1]}) * (({m[1][0]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][0]}))"
        f" + ({m[0][2]}) * (({m[1][0]}) * ({m[2][1]}) - ({m[1][1]}) * ({m[2][0]}))"
    )


def _det4(m: list[list[str]]) -> str:
    """Symbolic 4x4 determinant via first-row cofactors of :func:`_det3`."""
    terms = []
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        sign = "+" if j % 2 == 0 else "-"
        terms.append(f"{sign} ({m[0][j]}) * ({_det3(minor)})")
    return " ".join(terms).lstrip("+ ")


def _probe_matrix() -> tuple[list[list[str]], list[str]]:
    """Normal-equation entries as expressions over the moment-row columns
    (mm_ij = Σ s_i·s_j in scaled-int units, mb_i = Σ s_i·t), rescaled to
    feature units.  s_0 ≡ the intercept's pseudo-feature (scale 1)."""
    sc = float(_FEAT_SCALE)

    def entry(i: int, j: int) -> str:
        div = (sc if i else 1.0) * (sc if j else 1.0)
        return f"CAST(mm_{min(i, j)}{max(i, j)} AS DOUBLE) / {div!r}"

    def rhs(i: int) -> str:
        div = (sc if i else 1.0) * sc
        return f"CAST(mb_{i} AS DOUBLE) / {div!r}"

    a = [[entry(i, j) for j in range(4)] for i in range(4)]
    b = [rhs(i) for i in range(4)]
    return a, b


def _probe_weight_exprs() -> dict[str, str]:
    """Cramer-rule weight/diagnostic expressions shared by both engines."""
    a, b = _probe_matrix()
    det_a = _det4(a)
    out = {"det_a": det_a}
    for i in range(4):
        m_i = [[b[r] if c == i else a[r][c] for c in range(4)] for r in range(4)]
        out[f"det_{i}"] = _det4(m_i)
    return out


def linear_probe_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit ``quality_score ~ stopword_ratio + unique_ratio +
    length_saturation`` by exact ordinary least squares, entirely
    in-engine: ONE scan aggregates the integer moment matrix, Cramer's
    rule solves the 4x4 normal equations in a 1-row projection — no
    iterations, no driver collect, no MLlib.  Output: recovered
    coefficients (micro fixed-point), R², and the max absolute deviation
    from the KNOWN generating coefficients (0.35-threshold composite,
    :func:`quality_score_col`) — the self-grading "did the trainer
    recover the rule" number.

    Scale shape: the aggregation is a map-side-combined 1-row reduce of
    15 decimal sums; everything after is scalar arithmetic on one row.
    This is the distributed-OLS layout (moments, not row matrices, move
    across the cluster) that works unchanged at any corpus size."""
    stats = doc_stats(spark, sf_dir)
    feats = stats.select(
        F.floor(F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s1"),
        F.floor(F.coalesce(F.col("unique_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s2"),
        F.floor(F.least(F.col("n_words") / 100.0, F.lit(1.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s3"),
        F.floor(quality_score_col() * _FEAT_SCALE + 0.5).cast("long").alias("t"),
    )
    s = {0: F.lit(1).cast("long"), 1: F.col("s1"), 2: F.col("s2"), 3: F.col("s3")}
    aggs = [F.count("*").alias("n_docs")]
    for i in range(4):
        for j in range(i, 4):
            aggs.append(F.sum(dec38(s[i] * s[j])).alias(f"mm_{i}{j}"))
        aggs.append(F.sum(dec38(s[i] * F.col("t"))).alias(f"mb_{i}"))
    aggs.append(F.sum(dec38(F.col("t") * F.col("t"))).alias("mtt"))
    mom = feats.agg(*aggs)

    exprs = _probe_weight_exprs()
    solved = mom.select(
        "n_docs",
        "mb_0",
        "mtt",
        *[F.expr(e).alias(k) for k, e in exprs.items()],
        *[F.expr(e).alias(f"b_{i}") for i, e in enumerate(_probe_matrix()[1])],
    )
    # Degenerate-fit guard (same 0/0 class as zipf_slope): a zero-variance
    # feature makes det_a = 0 and a constant target makes sst = 0; Spark
    # doubles would emit Inf/NaN where DuckDB emits NULL, so BOTH engines
    # pin the degenerate cases to NULL explicitly.
    nz = F.col("det_a") != F.lit(0)
    w = [F.when(nz, F.col(f"det_{i}") / F.col("det_a")) for i in range(4)]
    # SSE = Σt² − wᵀ(Xᵀy); SST = Σt² − (Σt)²/n   (all in feature units)
    yy = F.col("mtt").cast("double") / float(_FEAT_SCALE**2)
    ysum = F.col("mb_0").cast("double") / float(_FEAT_SCALE)
    sse = yy - sum(w[i] * F.col(f"b_{i}") for i in range(4))
    sst = yy - ysum * ysum / F.col("n_docs").cast("double")
    # Cramer's-rule weights are determinant RATIOS — near-collinear
    # features make them arbitrarily large, so use the overflow-guarded
    # shared quantizer (unguarded floor clamps to int64 on Spark past
    # ~9.2e12 while DuckDB stays in double).
    from ..functions.money import micro
    dev = F.greatest(
        F.abs(w[1] - 0.3), F.abs(w[2] - 0.4), F.abs(w[3] - 0.3)
    )
    return solved.select(
        "n_docs",
        micro(w[0]).alias("w_intercept"),
        micro(w[1]).alias("w_stopword"),
        micro(w[2]).alias("w_unique"),
        micro(w[3]).alias("w_length"),
        micro(
            F.when(nz & (sst != F.lit(0.0)), F.lit(1.0) - sse / sst)
        ).alias("r_squared"),
        micro(dev).alias("max_coef_deviation"),
    )


def linear_probe_quality_sql() -> str:
    exprs = _probe_weight_exprs()
    _a, b = _probe_matrix()
    mm_terms = []
    names = {0: "1", 1: "s1", 2: "s2", 3: "s3"}
    for i in range(4):
        for j in range(i, 4):
            mm_terms.append(f"sum(({names[i]}) * ({names[j]})) AS mm_{i}{j}")
        mm_terms.append(f"sum(({names[i]}) * t) AS mb_{i}")
    mm_terms.append("sum(t * t) AS mtt")
    # Degenerate-fit guard mirrored from the Spark side: det_a = 0 or
    # sst = 0 must yield NULL in BOTH engines, not Inf/NaN in one.
    w = [f"(CASE WHEN det_a <> 0 THEN det_{i} / det_a END)" for i in range(4)]
    sse = f"(yy - ({' + '.join(f'{w[i]} * b_{i}' for i in range(4))}))"
    from ..functions.money import micro_sql as micro  # guarded, mirrors Spark side
    dev = (
        f"greatest(abs({w[1]} - 0.3), abs({w[2]} - 0.4), abs({w[3]} - 0.3))"
    )
    mm_joined = ",\n         ".join(mm_terms)
    det_joined = ",\n         ".join(f"{e} AS {k}" for k, e in exprs.items())
    b_joined = ",\n         ".join(f"{e} AS b_{i}" for i, e in enumerate(b))
    return f"""
WITH stats AS ({doc_stats_sql()}),
feats AS (
  SELECT CAST(floor(coalesce(stopword_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s1,
         CAST(floor(coalesce(unique_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s2,
         CAST(floor(least(n_words / 100.0, 1.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s3,
         CAST(floor({quality_score_sql()} * {_FEAT_SCALE} + 0.5) AS BIGINT) AS t
  FROM stats
),
mom AS (
  SELECT count(*) AS n_docs,
         {mm_joined}
  FROM feats
),
solved AS (
  SELECT n_docs, mb_0, mtt,
         {det_joined},
         {b_joined}
  FROM mom
)
SELECT n_docs,
       {micro(w[0])} AS w_intercept,
       {micro(w[1])} AS w_stopword,
       {micro(w[2])} AS w_unique,
       {micro(w[3])} AS w_length,
       {micro(f"CASE WHEN det_a <> 0 AND (yy - ys * ys / n_docs::double) <> 0 THEN 1.0 - {sse} / (yy - ys * ys / n_docs::double) END")} AS r_squared,
       {micro(dev)} AS max_coef_deviation
FROM (
  SELECT *,
         CAST(mtt AS DOUBLE) / {float(_FEAT_SCALE**2)!r} AS yy,
         CAST(mb_0 AS DOUBLE) / {float(_FEAT_SCALE)!r} AS ys
  FROM solved
)
"""


def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the marker-word language ID against the labeled
    language, PER SOURCE — the chance-corrected agreement the raw accuracy
    (``language_id_confusion`` diagonal) overstates whenever one language
    dominates a source.  This is the classifier-vs-label eval a training
    pipeline runs before trusting a heuristic filter to route documents.

    All-integer identity: with n docs, a = agreeing docs, and per-class
    marginals nl_c (labeled) / np_c (predicted),

        kappa = (a·n − Σ_c nl_c·np_c) / (n² − Σ_c nl_c·np_c)

    — exact int64/decimal until ONE micro-rounded division (pe = 1, i.e.
    a single class on both sides, pins kappa to NULL on both engines).

    Scale shape: one groupBy onto (source, labeled, detected) — bounded at
    sources × langs² — then marginal sums and the kappa identity over that
    tiny frame."""
    docs = load_table(spark, sf_dir, "documents")
    cm = (
        _lang_detected(docs, ["source"])
        .groupBy("source", "labeled_lang", "detected_lang")
        .agg(F.count("*").alias("n"))
    )
    nl = cm.groupBy("source", F.col("labeled_lang").alias("cls")).agg(
        F.sum("n").alias("nl")
    )
    np_ = cm.groupBy("source", F.col("detected_lang").alias("cls")).agg(
        F.sum("n").alias("np")
    )
    # full outer on the class marginals: a class can appear only as a label
    # or only as a prediction; the absent side contributes 0 to Σ nl·np
    marg = nl.join(np_, ["source", "cls"], "full").select(
        "source",
        dec38(F.coalesce(F.col("nl"), F.lit(0))).alias("nl"),
        dec38(F.coalesce(F.col("np"), F.lit(0))).alias("np"),
    )
    chance = marg.groupBy("source").agg(F.sum(F.col("nl") * F.col("np")).alias("sum_nlnp"))
    totals = cm.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("labeled_lang") == F.col("detected_lang"), F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("agree"),
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    j = totals.join(chance, "source")
    n_dec = dec38(F.col("n_docs"))
    num = dec38(F.col("agree")) * n_dec - F.col("sum_nlnp")
    den = n_dec * n_dec - F.col("sum_nlnp")
    return j.select(
        "source",
        "n_docs",
        micro(F.col("agree").cast("double") / F.col("n_docs").cast("double")).alias(
            "agree_rate"
        ),
        micro(
            F.when(den != 0, num.cast("double") / den.cast("double"))
        ).alias("kappa"),
    ).orderBy("source")


def lang_id_kappa_sql() -> str:
    score_cols = ",\n         ".join(
        "len(list_filter(words, w -> "
        + " OR ".join(f"w = '{m}'" for m in markers)
        + f")) AS score_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    langs = sorted(LANG_MARKERS)
    detect = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        detect = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {detect} END"
        best = f"greatest({best}, score_{lang})"
    return f"""
WITH words_cte AS (
  SELECT source, lang AS labeled_lang,
         string_split(trim(text, ' '), ' ') AS words
  FROM documents
),
scored AS (
  SELECT source, labeled_lang,
         {score_cols}
  FROM words_cte
),
cm AS (
  SELECT source, labeled_lang, {detect} AS detected_lang, count(*) AS n
  FROM scored GROUP BY 1, 2, 3
),
nl AS (SELECT source, labeled_lang AS cls, sum(n) AS nl FROM cm GROUP BY 1, 2),
np AS (SELECT source, detected_lang AS cls, sum(n) AS np FROM cm GROUP BY 1, 2),
marg AS (
  SELECT coalesce(nl.source, np.source) AS source,
         coalesce(nl.nl, 0)::hugeint AS nl,
         coalesce(np.np, 0)::hugeint AS np
  FROM nl FULL JOIN np ON nl.source = np.source AND nl.cls = np.cls
),
chance AS (SELECT source, sum(nl * np) AS sum_nlnp FROM marg GROUP BY source),
totals AS (
  SELECT source, sum(n) AS n_docs,
         sum(CASE WHEN labeled_lang = detected_lang THEN n ELSE 0 END) AS agree
  FROM cm GROUP BY source
)
SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
       floor(t.agree::double / t.n_docs::double * 1000000.0 + 0.5) / 1000000.0
         AS agree_rate,
       floor(CASE WHEN (t.n_docs::hugeint * t.n_docs::hugeint - c.sum_nlnp) != 0
                  THEN (t.agree::hugeint * t.n_docs::hugeint - c.sum_nlnp)::double
                       / (t.n_docs::hugeint * t.n_docs::hugeint - c.sum_nlnp)::double
             END * 1000000.0 + 0.5) / 1000000.0 AS kappa
FROM totals t JOIN chance c USING (source)
ORDER BY t.source
"""


CONFORMAL_CALIB_PCT = 50   # md5 doc split: buckets [0,50) calibrate, rest test
CONFORMAL_ALPHA_PCT = 90   # target coverage of the conformal interval


def probe_conformal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the OLS quality probe: fit the
    :func:`linear_probe_quality` model on the md5-calibration half, take
    q̂ = the ⌈(n+1)·0.9⌉-th smallest calibration |residual| (the
    distribution-free split-conformal quantile), and report the MEASURED
    coverage of |residual| ≤ q̂ on the held-out half — the "is my model's
    uncertainty honest" audit, which finite-sample-guarantees ≥ 90%
    coverage no matter how wrong the linear model is.  This is the eval a
    pipeline runs before trusting any learned quality filter's
    confidence.

    Determinism and scale: the fit is the same 1-row exact-decimal moment
    reduce as the probe (calibration rows selected by conditional
    aggregation — ONE scan); residuals are scored through a broadcast
    1-row weights feed; q̂ comes from a basis-point histogram
    (floor(|r|·1e4) — ≤ ~2·10⁴ buckets through the cum-sum window at ANY
    corpus size, the sketch_decile discipline) taking the bucket UPPER
    edge, so the reported coverage is conservatively ≥ the rank
    definition's.  Degenerate calibration fits (det_a = 0) propagate
    NULL through q̂ and coverage on both engines."""
    from pyspark.sql import Window

    from .sampling import _md5_bucket

    stats = doc_stats(spark, sf_dir)
    feats = stats.select(
        "doc_id",
        (_md5_bucket(F.col("doc_id")) < CONFORMAL_CALIB_PCT).alias("is_calib"),
        F.floor(F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s1"),
        F.floor(F.coalesce(F.col("unique_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s2"),
        F.floor(F.least(F.col("n_words") / 100.0, F.lit(1.0)) * _FEAT_SCALE + 0.5)
        .cast("long")
        .alias("s3"),
        F.floor(quality_score_col() * _FEAT_SCALE + 0.5).cast("long").alias("t"),
    )
    # ROUND-12 OPTIMIZATION (guide §5): feats sits on top of the full
    # doc_stats tokenization subtree and is consumed by THREE independent
    # plans (the moment reduce, the calibration histogram, the held-out
    # coverage agg) — without a cache each consumer re-tokenizes the
    # corpus.  The cached frame is 5 longs + a bool per doc.
    from ..io import tracked_persist

    feats = tracked_persist(feats)
    s = {0: F.lit(1).cast("long"), 1: F.col("s1"), 2: F.col("s2"), 3: F.col("s3")}
    cal = lambda c: F.sum(F.when(F.col("is_calib"), dec38(c)).otherwise(dec38(F.lit(0))))  # noqa: E731
    aggs = [F.sum(F.col("is_calib").cast("long")).alias("n_docs")]
    for i in range(4):
        for j in range(i, 4):
            aggs.append(cal(s[i] * s[j]).alias(f"mm_{i}{j}"))
        aggs.append(cal(s[i] * F.col("t")).alias(f"mb_{i}"))
    mom = feats.agg(*aggs)
    exprs = _probe_weight_exprs()
    solved = mom.select(
        F.col("n_docs").alias("n_calib"),
        *[F.expr(e).alias(k) for k, e in exprs.items()],
    )
    nz = F.col("det_a") != 0
    weights = solved.select(
        "n_calib",
        *[F.when(nz, F.col(f"det_{i}") / F.col("det_a")).alias(f"w_{i}") for i in range(4)],
    )
    sc = float(_FEAT_SCALE)
    pred = (
        F.col("w_0")
        + F.col("w_1") * (F.col("s1") / sc)
        + F.col("w_2") * (F.col("s2") / sc)
        + F.col("w_3") * (F.col("s3") / sc)
    )
    resid_bps = F.floor(F.abs(F.col("t") / sc - pred) * 10000.0).cast("long")
    scored = feats.join(F.broadcast(weights)).select(
        "is_calib", resid_bps.alias("r_bps"), "n_calib"
    )
    hist = (
        scored.filter(F.col("is_calib") & F.col("r_bps").isNotNull())
        .groupBy("r_bps", "n_calib")
        .agg(F.count("*").alias("cnt"))
    )
    wb = Window.partitionBy("n_calib").orderBy("r_bps")
    target = F.ceil((F.col("n_calib") + 1) * CONFORMAL_ALPHA_PCT / 100.0)
    qhat_frame = (
        hist.withColumn("cum", F.sum("cnt").over(wb))
        .filter(F.col("cum") >= target)
        .groupBy("n_calib")
        .agg(((F.min("r_bps") + 1) / 10000.0).alias("q_hat"))
    )
    covered = scored.filter(~F.col("is_calib")).join(
        F.broadcast(qhat_frame.select("q_hat"))
    ).agg(
        F.max("n_calib").alias("n_calib"),
        F.count("*").alias("n_test"),
        F.max("q_hat").alias("q_hat"),
        F.sum(
            ((F.col("r_bps") / 10000.0) <= F.col("q_hat")).cast("long")
        ).alias("n_covered"),
    )
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return covered.select(
        "n_calib",
        "n_test",
        F.lit(CONFORMAL_ALPHA_PCT).alias("target_pct"),
        micro(F.col("q_hat")).alias("q_hat"),
        micro(F.col("n_covered").cast("double") / F.col("n_test").cast("double")).alias(
            "coverage"
        ),
    )


def probe_conformal_calibration_sql() -> str:
    from .sampling import _md5_bucket_sql

    exprs = _probe_weight_exprs()
    sc = float(_FEAT_SCALE)
    names = {0: "1", 1: "s1", 2: "s2", 3: "s3"}
    mm_terms = []
    for i in range(4):
        for j in range(i, 4):
            mm_terms.append(
                f"sum(CASE WHEN is_calib THEN ({names[i]}) * ({names[j]}) ELSE 0 END) AS mm_{i}{j}"
            )
        mm_terms.append(
            f"sum(CASE WHEN is_calib THEN ({names[i]}) * t ELSE 0 END) AS mb_{i}"
        )
    mm_joined = ",\n         ".join(mm_terms)
    det_joined = ",\n         ".join(f"{e} AS {k}" for k, e in exprs.items())
    w = {
        i: f"(CASE WHEN det_a <> 0 THEN det_{i} / det_a END)" for i in range(4)
    }
    pred = (
        f"({w[0]} + {w[1]} * (s1 / {sc!r}) + {w[2]} * (s2 / {sc!r})"
        f" + {w[3]} * (s3 / {sc!r}))"
    )
    return f"""
WITH stats AS ({doc_stats_sql()}),
feats AS (
  SELECT doc_id,
         {_md5_bucket_sql('doc_id')} < {CONFORMAL_CALIB_PCT} AS is_calib,
         CAST(floor(coalesce(stopword_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s1,
         CAST(floor(coalesce(unique_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s2,
         CAST(floor(least(n_words / 100.0, 1.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS s3,
         CAST(floor({quality_score_sql()} * {_FEAT_SCALE} + 0.5) AS BIGINT) AS t
  FROM stats
),
mom AS (
  SELECT sum(CASE WHEN is_calib THEN 1 ELSE 0 END) AS n_calib,
         {mm_joined}
  FROM feats
),
solved AS (
  SELECT n_calib,
         {det_joined}
  FROM mom
),
scored AS (
  SELECT f.is_calib, s.n_calib,
         CAST(floor(abs(f.t / {sc!r} - {pred}) * 10000.0) AS BIGINT) AS r_bps
  FROM feats f CROSS JOIN solved s
),
hist AS (
  SELECT r_bps, n_calib, count(*) AS cnt
  FROM scored WHERE is_calib AND r_bps IS NOT NULL
  GROUP BY r_bps, n_calib
),
qhat AS (
  SELECT n_calib, (min(r_bps) + 1) / 10000.0 AS q_hat
  FROM (
    SELECT r_bps, n_calib,
           sum(cnt) OVER (PARTITION BY n_calib ORDER BY r_bps) AS cum
    FROM hist
  )
  WHERE cum >= ceil((n_calib + 1) * {CONFORMAL_ALPHA_PCT} / 100.0)
  GROUP BY n_calib
)
SELECT max(s.n_calib)::bigint AS n_calib,
       count(*) AS n_test,
       {CONFORMAL_ALPHA_PCT} AS target_pct,
       floor(max(q.q_hat) * 1000000.0 + 0.5) / 1000000.0 AS q_hat,
       floor(sum(((s.r_bps / 10000.0) <= q.q_hat)::bigint)::double
             / count(*)::double * 1000000.0 + 0.5) / 1000000.0 AS coverage
FROM scored s CROSS JOIN qhat q
WHERE NOT s.is_calib
"""


EB_PASS_MIN = 0.4  # the shrinkage gate: strictly above the corpus spam floor
# (QUALITY_SPAM_MAX 0.35) and below the good line (QUALITY_GOOD_MIN 0.5, which
# the synthetic composite never reaches — a gate nothing passes makes every
# rate 0 and the prior degenerate by construction)


def eb_shrunk_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-source quality
    pass rates: a source with 40 documents and a lucky 80% pass rate
    should NOT outrank a 40k-document source at 72% — method-of-moments
    α, β from the cross-source rate distribution pull small-sample rates
    toward the corpus mean in proportion to their evidence, which is how
    a mixture planner should weigh per-source quality (raw small-n rates
    are exactly the thing ``temperature_mixture_weights`` must not trust).

    Determinism: per-source rates are micro fixed-point integers
    (floor(k·1e6/n)), so the across-source mean/variance moments are
    exact integer sums — no float accumulates across rows in either
    engine; α, β and the shrunk rates are single micro-rounded
    expressions, with the degenerate prior (zero between-source variance,
    or v ≥ m(1−m) — prior weaker than one pseudo-count) pinning the
    shrunk column to NULL on both engines.

    Scale shape: one groupBy to (source, n, k) — bounded by |sources| —
    then window moments over that tiny frame."""
    from pyspark.sql import Window

    stats = doc_stats(spark, sf_dir)
    per_source = stats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((quality_score_col() >= EB_PASS_MIN).cast("long")).alias("n_pass"),
    )
    r_micro = F.floor(F.col("n_pass") * 1000000 / F.col("n_docs")).cast("long")
    wall = Window.partitionBy()
    withr = per_source.withColumn("r_micro", r_micro).select(
        "*",
        F.count("*").over(wall).alias("g"),
        F.sum("r_micro").over(wall).alias("sr"),
        F.sum(F.col("r_micro") * F.col("r_micro")).over(wall).alias("srr"),
    )
    g = F.col("g").cast("double")
    m = F.col("sr").cast("double") / g / 1.0e6
    # population variance of the micro rates, rescaled to rate units
    v = (
        (F.col("srr").cast("double") - F.col("sr").cast("double") * F.col("sr").cast("double") / g)
        / g
        / 1.0e12
    )
    ab = F.when((v > 0) & (v < m * (1.0 - m)), m * (1.0 - m) / v - 1.0)
    alpha = m * ab
    beta = (1.0 - m) * ab
    shrunk = (F.col("n_pass").cast("double") + alpha) / (
        F.col("n_docs").cast("double") + ab
    )
    # prior strength ab = m(1-m)/v − 1 is bounded only by 1/v_min ≈ g²·1e12
    # (near-zero between-source variance) — an UNBOUNDED quantity, so the
    # guarded shared quantizer, not a bare floor (int64 clamp class).
    from ..functions.money import micro
    return withr.select(
        "source",
        "n_docs",
        "n_pass",
        (F.col("r_micro") / 1000000.0).alias("raw_rate"),
        micro(alpha).alias("prior_alpha"),
        micro(beta).alias("prior_beta"),
        micro(shrunk).alias("shrunk_rate"),
    ).orderBy("source")


def _eb_micro_sql(expr: str) -> str:
    from ..functions.money import micro_sql

    return micro_sql(expr)


def eb_shrunk_source_quality_sql() -> str:
    return f"""
WITH stats AS ({doc_stats_sql()}),
per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(({quality_score_sql()} >= {EB_PASS_MIN})::bigint) AS n_pass
  FROM stats GROUP BY source
),
withr AS (
  SELECT *,
         CAST(floor(n_pass * 1000000 / n_docs) AS BIGINT) AS r_micro,
         count(*) OVER () AS g,
         sum(CAST(floor(n_pass * 1000000 / n_docs) AS BIGINT)) OVER () AS sr,
         sum(CAST(floor(n_pass * 1000000 / n_docs) AS BIGINT)
             * CAST(floor(n_pass * 1000000 / n_docs) AS BIGINT)) OVER () AS srr
  FROM per_source
),
calc AS (
  SELECT *,
         sr::double / g::double / 1.0e6 AS m,
         (srr::double - sr::double * sr::double / g::double) / g::double / 1.0e12 AS v
  FROM withr
)
SELECT source, n_docs, CAST(n_pass AS BIGINT) AS n_pass,
       r_micro / 1000000.0 AS raw_rate,
       {_eb_micro_sql('CASE WHEN v > 0 AND v < m * (1.0 - m) '
                      'THEN m * (m * (1.0 - m) / v - 1.0) END')} AS prior_alpha,
       {_eb_micro_sql('CASE WHEN v > 0 AND v < m * (1.0 - m) '
                      'THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) END')} AS prior_beta,
       {_eb_micro_sql('CASE WHEN v > 0 AND v < m * (1.0 - m) '
                      'THEN (n_pass::double + m * (m * (1.0 - m) / v - 1.0)) '
                      '/ (n_docs::double + (m * (1.0 - m) / v - 1.0)) END')} AS shrunk_rate
FROM calc
ORDER BY source
"""


def feature_auc_screening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature ROC-AUC against the spam label — the numeric-feature
    screening table beside :func:`experiments.woe_iv_by_feature`'s
    categorical one: for each doc_stats feature, how well does the raw
    feature ALONE rank non-spam (composite score >= QUALITY_SPAM_MAX)
    above spam?  AUC is the Mann-Whitney identity
    (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with average tie ranks —
    exact 2× integer rank sums, one number per feature: 0.5 = useless,
    1.0 = separates perfectly, BELOW 0.5 = the feature separates in the
    INVERTED direction (short adversarial docs make unique_ratio rank
    spam HIGH on this corpus — exactly the screening surprise the table
    exists to surface); the screening signal is |AUC − 0.5|.

    Scale shape: features stack long-format map-side (3 rows per doc);
    each feature's rank frame is its ≤10⁴-point fixed-point score
    vocabulary (the _FEAT_SCALE grid), so the per-feature prefix windows
    run over BOUNDED frames — corpus size only passes through the one
    groupBy onto (feature, score)."""
    stats = doc_stats(spark, sf_dir)
    pos = (quality_score_col() >= QUALITY_SPAM_MAX).cast("long")
    feats = F.array(
        F.struct(
            F.lit("stopword_ratio").alias("feature"),
            F.floor(F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
            .cast("long")
            .alias("score"),
        ),
        F.struct(
            F.lit("unique_ratio").alias("feature"),
            F.floor(F.coalesce(F.col("unique_ratio"), F.lit(0.0)) * _FEAT_SCALE + 0.5)
            .cast("long")
            .alias("score"),
        ),
        F.struct(
            F.lit("length_saturation").alias("feature"),
            F.floor(F.least(F.col("n_words") / 100.0, F.lit(1.0)) * _FEAT_SCALE + 0.5)
            .cast("long")
            .alias("score"),
        ),
    )
    longf = stats.select(pos.alias("pos"), F.explode(feats).alias("f")).select(
        F.col("f.feature").alias("feature"), F.col("f.score").alias("score"), "pos"
    )
    per_val = longf.groupBy("feature", "score").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("n_pos_v")
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("feature")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_val.withColumn(
        "before", F.coalesce(F.sum("cnt").over(win), F.lit(0))
    )
    # dec38() each factor BEFORE the multiply: the rank-sum product is
    # n-dependent (before ≤ n_docs), so LONG arithmetic wraps silently
    # beyond ~3e9 docs while the oracle promotes to HUGEINT — same
    # overflow class the round-8 ADVICE flagged in mann_whitney.
    m = ranked.groupBy("feature").agg(
        F.sum("cnt").alias("n"),
        F.sum("n_pos_v").alias("n_pos"),
        F.sum(
            dec38(F.col("n_pos_v"))
            * (2 * dec38(F.col("before")) + dec38(F.col("cnt")) + 1)
        ).alias("r2_pos"),
    )
    n, npos = F.col("n"), F.col("n_pos")
    nneg = n - npos
    # AUC via U: 2U = 2R_pos − n_pos(n_pos+1); AUC = U / (n_pos·n_neg).
    # npos*(npos+1) and npos*nneg go through decimal before the double
    # cast — LONG would wrap silently beyond ~3e9 docs.
    dpos, dneg = dec38(npos), dec38(nneg)
    u2 = F.col("r2_pos").cast("double") - (dpos * (dpos + 1)).cast("double")
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return m.select(
        "feature",
        n.alias("n_docs"),
        npos.alias("n_not_spam"),
        F.when(
            (npos > 0) & (nneg > 0),
            micro(u2 / (2.0 * (dpos * dneg).cast("double"))),
        ).alias("auc_not_spam"),
    ).orderBy("feature")


def feature_auc_screening_sql() -> str:
    return f"""
WITH stats AS ({doc_stats_sql()}),
longf AS (
  SELECT 'stopword_ratio' AS feature,
         CAST(floor(coalesce(stopword_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT) AS score,
         ({quality_score_sql()} >= {QUALITY_SPAM_MAX})::bigint AS pos
  FROM stats
  UNION ALL
  SELECT 'unique_ratio',
         CAST(floor(coalesce(unique_ratio, 0.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
         ({quality_score_sql()} >= {QUALITY_SPAM_MAX})::bigint
  FROM stats
  UNION ALL
  SELECT 'length_saturation',
         CAST(floor(least(n_words / 100.0, 1.0) * {_FEAT_SCALE} + 0.5) AS BIGINT),
         ({quality_score_sql()} >= {QUALITY_SPAM_MAX})::bigint
  FROM stats
),
per_val AS (
  SELECT feature, score, count(*) AS cnt, sum(pos) AS n_pos_v
  FROM longf GROUP BY 1, 2
),
ranked AS (
  SELECT feature, cnt, n_pos_v,
         coalesce(sum(cnt) OVER (PARTITION BY feature ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_val
),
m AS (
  SELECT feature,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(n_pos_v) AS BIGINT) AS n_pos,
         sum((n_pos_v * (2 * before + cnt + 1))::hugeint) AS r2_pos
  FROM ranked GROUP BY feature
)
SELECT feature, n AS n_docs, n_pos AS n_not_spam,
       CASE WHEN n_pos > 0 AND n - n_pos > 0
            THEN floor((r2_pos::double - (n_pos * (n_pos + 1))::double)
                       / (2.0 * (n_pos * (n - n_pos))::double)
                       * 1000000.0 + 0.5) / 1000000.0
       END AS auc_not_spam
FROM m
ORDER BY feature
"""


def lang_id_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision / recall / F1 of the n-gram language
    detector, plus macro-F1 — the summary :func:`language_id_confusion`
    (the raw matrix) and :func:`lang_id_kappa` (chance-corrected overall
    agreement) bracket but don't report: kappa can look healthy while one
    minority language has zero recall, which is precisely what macro-F1
    (unweighted mean over languages) penalizes.

    Exactness: tp/fp/fn are exact integer margins of the confusion
    matrix; F1 = 2tp/(2tp+fp+fn) (the division-free identity — no
    precision·recall roundtrip); each F1 is micro-floored to the 1e-6
    grid and macro-F1 averages those exact grid integers, so no
    float-summation order exists anywhere.

    Scale shape: composes the confusion matrix (one corpus-sized groupBy
    there); everything here runs on the ≤ langs² frame."""
    from pyspark.sql import Window

    conf = language_id_confusion(spark, sf_dir)
    per_label = conf.groupBy("labeled_lang").agg(F.sum("n_docs").alias("n_labeled"))
    per_det = conf.groupBy("detected_lang").agg(F.sum("n_docs").alias("n_detected"))
    diag = conf.filter(F.col("labeled_lang") == F.col("detected_lang")).select(
        F.col("labeled_lang").alias("lang"), F.col("n_docs").alias("tp")
    )
    j = (
        per_label.select(F.col("labeled_lang").alias("lang"), "n_labeled")
        .join(
            per_det.select(F.col("detected_lang").alias("lang"), "n_detected"),
            "lang",
            "outer",
        )
        .join(diag, "lang", "left")
        .select(
            "lang",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            (F.coalesce(F.col("n_detected"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0))).alias("fp"),
            (F.coalesce(F.col("n_labeled"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0))).alias("fn"),
        )
    )
    den = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    f1_micro = F.when(
        den > 0,
        F.floor(
            2.0 * F.col("tp").cast("double") / den.cast("double") * 1000000.0 + 0.5
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    scored = j.withColumn("f1_micro", f1_micro)
    w = Window.partitionBy()
    from ..functions.money import ratio

    return scored.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            ratio(F.col("tp").cast("double"), (F.col("tp") + F.col("fp")).cast("double"), 6),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            ratio(F.col("tp").cast("double"), (F.col("tp") + F.col("fn")).cast("double"), 6),
        ).alias("recall"),
        (F.col("f1_micro") / 1000000.0).alias("f1"),
        F.floor(
            F.sum("f1_micro").over(w).cast("double") / F.count("*").over(w).cast("double")
            + 0.5
        ).cast("long").alias("macro_f1_micro"),
    ).orderBy("lang")


def lang_id_macro_f1_sql() -> str:
    from ..functions.money import ratio_sql

    return f"""
WITH conf AS ({language_id_confusion_sql()}),
per_label AS (
  SELECT labeled_lang AS lang, sum(n_docs) AS n_labeled FROM conf GROUP BY 1
),
per_det AS (
  SELECT detected_lang AS lang, sum(n_docs) AS n_detected FROM conf GROUP BY 1
),
diag AS (
  SELECT labeled_lang AS lang, n_docs AS tp FROM conf
  WHERE labeled_lang = detected_lang
),
j AS (
  SELECT coalesce(l.lang, d.lang) AS lang,
         coalesce(g.tp, 0) AS tp,
         coalesce(d.n_detected, 0) - coalesce(g.tp, 0) AS fp,
         coalesce(l.n_labeled, 0) - coalesce(g.tp, 0) AS fn
  FROM per_label l
  FULL OUTER JOIN per_det d ON l.lang = d.lang
  LEFT JOIN diag g ON coalesce(l.lang, d.lang) = g.lang
),
scored AS (
  SELECT *,
         CASE WHEN 2 * tp + fp + fn > 0
              THEN CAST(floor(2.0 * tp::double / (2 * tp + fp + fn)::double
                              * 1000000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS f1_micro
  FROM j
)
SELECT lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CASE WHEN tp + fp > 0 THEN {ratio_sql('tp::double', '(tp + fp)::double', 6)} END AS precision,
       CASE WHEN tp + fn > 0 THEN {ratio_sql('tp::double', '(tp + fn)::double', 6)} END AS recall,
       f1_micro / 1000000.0 AS f1,
       CAST(floor(sum(f1_micro) OVER ()::double / count(*) OVER ()::double + 0.5)
            AS BIGINT) AS macro_f1_micro
FROM scored
ORDER BY lang
"""


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability profile: average sentence length, average
    syllables per word (ASCII vowel-group heuristic), and the Flesch
    reading-ease score — the classic text-quality lens the quality-score
    battery (stopword/length ratios) doesn't cover: two corpora with the
    same token stats can sit at opposite ends of the reading-ease scale.

    Determinism: sentences = [.!?]+ terminator runs, with the standard
    fallback that a NON-EMPTY document with zero terminators counts as
    ONE sentence (transcript/title corpora carry no punctuation — an
    all-NULL score column on such a corpus is exactly the degeneracy the
    registry audit forbids); syllables = [aeiouyAEIOUY]+ runs (no
    lower(): its Final_Sigma/İ special-casing is adversarial class 2).
    Both are REGEX COUNTS over exact integers summed per source; the
    Flesch formula is one double expression over those totals,
    micro-rounded.  Non-Latin scripts count 0 syllables (documented
    ASCII heuristic); zero-word sources pin scores to NULL.

    Scale shape: pure per-row projections, one groupBy onto sources."""
    from ..functions.money import micro, ratio

    docs = load_table(spark, sf_dir, "documents")
    words = F.size(_words(F.col("text")))
    runs = F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)"))
    sents = F.when(
        (runs == 0) & (F.length(F.trim(F.col("text"))) > 0), F.lit(1)
    ).otherwise(runs)
    sylls = F.size(F.expr("regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)"))
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(words.cast("long")).alias("w"),
        F.sum(sents.cast("long")).alias("s"),
        F.sum(sylls.cast("long")).alias("y"),
    )
    wd = F.col("w").cast("double")
    sd = F.col("s").cast("double")
    yd = F.col("y").cast("double")
    flesch = 206.835 - 1.015 * (wd / sd) - 84.6 * (yd / wd)
    return per_src.select(
        "source",
        "n_docs",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("y").alias("n_syllables"),
        F.when(F.col("s") > 0, ratio(wd, sd, 4)).alias("words_per_sentence"),
        F.when(F.col("w") > 0, ratio(yd, wd, 4)).alias("syllables_per_word"),
        F.when((F.col("s") > 0) & (F.col("w") > 0), micro(flesch)).alias(
            "flesch_reading_ease"
        ),
    ).orderBy("source")


def readability_scores_sql() -> str:
    from ..functions.money import micro_sql, ratio_sql

    return f"""
WITH per_doc AS (
  SELECT source,
         len(string_split(trim(text, ' '), ' ')) AS w,
         CASE WHEN len(regexp_extract_all(text, '[.!?]+')) = 0
                   AND length(trim(text, ' ')) > 0
              THEN 1 ELSE len(regexp_extract_all(text, '[.!?]+')) END AS s,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS y
  FROM documents
),
per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(w::bigint) AS w, sum(s::bigint) AS s, sum(y::bigint) AS y
  FROM per_doc GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(y AS BIGINT) AS n_syllables,
       CASE WHEN s > 0 THEN {ratio_sql('w::double', 's::double', 4)} END
         AS words_per_sentence,
       CASE WHEN w > 0 THEN {ratio_sql('y::double', 'w::double', 4)} END
         AS syllables_per_word,
       CASE WHEN s > 0 AND w > 0
            THEN {micro_sql('206.835 - 1.015 * (w::double / s::double)'
                            ' - 84.6 * (y::double / w::double)')} END
         AS flesch_reading_ease
FROM per_src
ORDER BY source
"""


def source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-distribution drift: the exact two-sample KS
    distance between each source's n_chars distribution and the rest of
    the corpus — the whole-distribution upgrade of
    :func:`source_length_percentiles` (two sources can share a median
    while one is bimodal; D sees the whole CDF gap), and the per-source
    version of the ks_spend_test discipline.

    Exactness: D is located as the max INTEGER cross product
    |cum_s·n_rest − cum_rest·n_s| over the per-source length grid —
    the integer-lattice KS form, no CDF doubles until the single edge
    division; rest = corpus minus the source, so a dominant source
    can't dilute its own comparison.

    Scale shape: one (source, n_chars) collapse; each source's CDF walk
    runs over the per-source length vocabulary joined against the
    corpus-level vocabulary prefix (lengths are a bounded vocabulary —
    documents have a max length, not an unbounded one)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    per = docs.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    glob = per.groupBy("n_chars").agg(F.sum("c").alias("g"))
    # evaluate both CDFs on the GLOBAL length grid per source: grid join
    srcs = per.select("source").distinct()
    grid = srcs.crossJoin(F.broadcast(glob))
    gs = grid.join(per, ["source", "n_chars"], "left").select(
        "source", "n_chars", "g", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ws = Window.partitionBy("source")
    cum = gs.select(
        "source",
        "n_chars",
        F.sum("c").over(w).alias("cum_s"),
        (F.sum("g").over(w) - F.sum("c").over(w)).alias("cum_r"),
        F.sum("c").over(ws).alias("n_s"),
        (F.sum("g").over(ws) - F.sum("c").over(ws)).alias("n_r"),
    )
    cross = F.abs(
        dec38(F.col("cum_s")) * dec38(F.col("n_r")) - dec38(F.col("cum_r")) * dec38(F.col("n_s"))
    )
    m = cum.groupBy("source", "n_s", "n_r").agg(F.max(cross).alias("dmax"))
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    d = F.col("dmax").cast("double") / (
        F.col("n_s").cast("double") * F.col("n_r").cast("double")
    )
    return m.select(
        "source",
        F.col("n_s").alias("n_docs"),
        F.col("n_r").alias("n_rest"),
        F.when((F.col("n_s") > 0) & (F.col("n_r") > 0), micro(d)).alias("ks_d"),
    ).orderBy("source")


def source_length_ks_sql() -> str:
    return """
WITH per AS (
  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
),
lens AS (SELECT n_chars, sum(c) AS g FROM per GROUP BY 1),
grid AS (
  SELECT s.source, v.n_chars, v.g
  FROM (SELECT DISTINCT source FROM per) s CROSS JOIN lens v
),
gs AS (
  SELECT g.source, g.n_chars, g.g, coalesce(p.c, 0) AS c
  FROM grid g LEFT JOIN per p USING (source, n_chars)
),
cum AS (
  SELECT source, n_chars,
         sum(c) OVER w AS cum_s,
         sum(g) OVER w - sum(c) OVER w AS cum_r,
         sum(c) OVER ws AS n_s,
         sum(g) OVER ws - sum(c) OVER ws AS n_r
  FROM gs
  WINDOW w AS (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY source)
),
m AS (
  SELECT source, n_s, n_r,
         max(abs(cum_s::hugeint * n_r::hugeint - cum_r::hugeint * n_s::hugeint))
           AS dmax
  FROM cum GROUP BY 1, 2, 3
)
SELECT source, CAST(n_s AS BIGINT) AS n_docs, CAST(n_r AS BIGINT) AS n_rest,
       CASE WHEN n_s > 0 AND n_r > 0
            THEN floor(dmax::double / (n_s::double * n_r::double)
                       * 1000000.0 + 0.5) / 1000000.0 END AS ks_d
FROM m
ORDER BY source
"""


FORMAT_MARKERS = (
    # real-world curation markers (exercised by the adversarial corpora —
    # the driver's synthetic word-soup corpus contains no punctuation)
    ("url", "https?://"),
    ("list_item", "(^|\\n)[-*] "),
    ("qa_pair", "(^|\\n)(Q|A):"),
    ("code_brace", "[{};]"),
    ("numeric", "[0-9]"),
    # shape markers that vary on ANY tokenized corpus (keeps the profile
    # non-degenerate where the punctuation markers are honestly all-zero)
    ("single_char_token", "(^| )a( |$)"),
    ("leading_article", "^the "),
)


def format_marker_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source structural-format profile: the share of documents
    matching each format marker (URLs, list items, Q/A pairs, code-ish
    punctuation, digits) — the quick curation lens a mixture planner
    reads before weighting sources (a "books" source with 40% code-brace
    docs is mislabeled; an instruction source should be high qa_pair).

    Determinism: fixed regexes evaluated identically by RE2-compatible
    patterns (no lookahead/backrefs — the dialect-safe subset); shares
    are exact count ratios.

    Scale shape: pure per-row projections, one groupBy onto sources ×
    markers (bounded)."""
    from ..functions.money import ratio

    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n_docs")]
    for name, pat in FORMAT_MARKERS:
        aggs.append(
            F.sum(F.col("text").rlike(pat).cast("long")).alias(f"n_{name}")
        )
    per = docs.groupBy("source").agg(*aggs)
    cols = [F.col("source"), F.col("n_docs")]
    for name, _p in FORMAT_MARKERS:
        cols.append(
            ratio(
                F.col(f"n_{name}").cast("double"), F.col("n_docs").cast("double"), 6
            ).alias(f"{name}_rate")
        )
    return per.select(*cols).orderBy("source")


def format_marker_rates_sql() -> str:
    from ..functions.money import ratio_sql

    marker_sums = ",\n         ".join(
        f"sum(regexp_matches(text, '{pat}')::bigint) AS n_{name}"
        for name, pat in FORMAT_MARKERS
    )
    rate_cols = ",\n       ".join(
        ratio_sql(f"n_{name}::double", "n_docs::double", 6) + f" AS {name}_rate"
        for name, _p in FORMAT_MARKERS
    )
    return f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         {marker_sums}
  FROM documents GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       {rate_cols}
FROM per
ORDER BY source
"""


def split_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test token-distribution divergence: the Jensen-Shannon
    divergence between the two splits' unigram distributions — the
    one-number answer to "is my held-out set distributionally like the
    training set", the check that catches a split accidentally
    stratified by source or length (cluster_safe_split guards LEAKAGE;
    this guards REPRESENTATIVENESS — both can fail independently).

    Exactness: token counts are exact integers per (split, token); each
    p·ln(p/m) term is nano-floored BEFORE the corpus-level sum (the JSD
    discipline from jsd_source_categories applied at token vocabulary
    scale — the sum is order-immune integer addition).

    Scale shape: one (split, token) collapse (map-side combine does the
    heavy lifting), one token-vocabulary join of the two count columns,
    one global integer sum."""
    from .sampling import _md5_bucket, TRAIN_PCT

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(_md5_bucket(F.col("doc_id")) < TRAIN_PCT, "train")
        .otherwise("test")
        .alias("split"),
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("split", "tok").agg(F.count("*").alias("c"))
    wide = (
        counts.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("split") == "train", F.col("c")).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("split") == "test", F.col("c")).otherwise(0)).alias("b"),
        )
    )
    tot = wide.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    j = wide.join(F.broadcast(tot))
    p = F.col("a").cast("double") / F.col("na").cast("double")
    q = F.col("b").cast("double") / F.col("nb").cast("double")
    m = (p + q) / 2.0
    tp = F.when(
        F.col("a") > 0, F.floor(p * F.log(p / m) * 1000000000.0 + 0.5).cast("long")
    ).otherwise(F.lit(0))
    tq = F.when(
        F.col("b") > 0, F.floor(q * F.log(q / m) * 1000000000.0 + 0.5).cast("long")
    ).otherwise(F.lit(0))
    agg = j.select(
        "na", "nb", tp.alias("tp"), tq.alias("tq")
    ).groupBy("na", "nb").agg(
        F.sum("tp").alias("sp"), F.sum("tq").alias("sq"), F.count("*").alias("vocab")
    )
    jsd = (F.col("sp") + F.col("sq")).cast("double") / 2.0e9
    micro = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        F.col("na").alias("n_train_tokens"),
        F.col("nb").alias("n_test_tokens"),
        F.col("vocab").alias("vocab_size"),
        micro(jsd).alias("jsd_nats"),
        micro(jsd / F.log(F.lit(2.0))).alias("jsd_bits"),
    )


def split_token_jsd_sql() -> str:
    from .sampling import _md5_bucket_sql, TRAIN_PCT

    b = _md5_bucket_sql("doc_id", 100)
    return f"""
WITH toks AS (
  SELECT CASE WHEN {b} < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split,
         unnest(string_split(trim(text, ' '), ' ')) AS tok
  FROM documents
),
counts AS (
  SELECT split, tok, count(*) AS c FROM toks WHERE tok != '' GROUP BY 1, 2
),
wide AS (
  SELECT tok,
         sum(CASE WHEN split = 'train' THEN c ELSE 0 END) AS a,
         sum(CASE WHEN split = 'test' THEN c ELSE 0 END) AS b
  FROM counts GROUP BY tok
),
tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM wide),
terms AS (
  SELECT na, nb,
         CASE WHEN a > 0
              THEN CAST(floor((a::double / na::double)
                   * ln((a::double / na::double)
                        / ((a::double / na::double + b::double / nb::double) / 2.0))
                   * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS tp,
         CASE WHEN b > 0
              THEN CAST(floor((b::double / nb::double)
                   * ln((b::double / nb::double)
                        / ((a::double / na::double + b::double / nb::double) / 2.0))
                   * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS tq
  FROM wide, tot
),
agg AS (
  SELECT na, nb, sum(tp) AS sp, sum(tq) AS sq, count(*) AS vocab FROM terms
  GROUP BY na, nb
)
SELECT CAST(na AS BIGINT) AS n_train_tokens, CAST(nb AS BIGINT) AS n_test_tokens,
       CAST(vocab AS BIGINT) AS vocab_size,
       floor((sp + sq)::double / 2.0e9 * 1000000.0 + 0.5) / 1000000.0 AS jsd_nats,
       floor((sp + sq)::double / 2.0e9 / ln(2.0) * 1000000.0 + 0.5) / 1000000.0
         AS jsd_bits
FROM agg
"""


HEAPS_CUTS = (25, 50, 75, 100)  # doc-order prefixes (percent) the fit uses


def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) fit per source: V(N) ≈ K·N^β
    estimated from four doc-order prefixes — the saturation diagnostic a
    mixture planner reads (β near 1 = every new doc brings new vocabulary,
    the source is far from exhausted; β ≪ 1 = the crawl is re-covering
    itself and more of it buys little).

    Construction: prefixes are doc_id-order rank-quantiles of each
    source's docs; N_i = tokens in the prefix (exact window sums over the
    per-doc frame), V_i = tokens whose FIRST occurrence rank ≤ cut (one
    min-aggregate over the (source, token) collapse) — no re-scan per
    cut.  β̂/ln K̂ come from an exact-moment OLS over the 4 nano-quantized
    (ln N, ln V) points.

    Scale shape: one (source, token) collapse with a min(first_rank);
    one per-doc rank window per source (corpus-sized partitions ordered
    by doc_id — the same per-source window class as source_length
    percentiles); the fit runs on 4-row frames."""
    from pyspark.sql import Window

    from ..functions.money import micro

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    per_doc = toks.groupBy("source", "doc_id").agg(F.count("*").alias("n_tok"))
    wr = Window.partitionBy("source").orderBy("doc_id")
    ws = Window.partitionBy("source")
    ranked = per_doc.select(
        "source",
        "doc_id",
        "n_tok",
        F.row_number().over(wr).alias("rnk"),
        F.count("*").over(ws).alias("n_docs"),
        F.sum("n_tok").over(wr.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_tok"),
    )
    # first-occurrence rank per (source, token)
    tok_first = (
        toks.join(ranked.select("source", "doc_id", "rnk"), ["source", "doc_id"])
        .groupBy("source", "tok")
        .agg(F.min("rnk").alias("first_rnk"))
    )
    cuts = spark.createDataFrame([(int(c),) for c in HEAPS_CUTS], "cut int")
    # cut rank = nearest-rank ceil(cut% · n_docs)
    cut_ranks = (
        ranked.select("source", "n_docs").distinct().crossJoin(F.broadcast(cuts))
        .select(
            "source",
            "cut",
            F.expr("(cut * n_docs + 99) div 100").alias("cut_rnk"),
        )
    )
    n_at = (
        cut_ranks.join(ranked, ["source"])
        .filter(F.col("rnk") == F.col("cut_rnk"))
        .select("source", "cut", F.col("cum_tok").alias("n_i"))
    )
    v_at = (
        cut_ranks.join(tok_first, "source")
        .filter(F.col("first_rnk") <= F.col("cut_rnk"))
        .groupBy("source", "cut")
        .agg(F.count("*").alias("v_i"))
    )
    pts = n_at.join(v_at, ["source", "cut"])
    lnn = F.floor(F.log(F.col("n_i").cast("double")) * 1000000000.0 + 0.5).cast("long")
    lnv = F.floor(F.log(F.col("v_i").cast("double")) * 1000000000.0 + 0.5).cast("long")
    m = pts.filter((F.col("n_i") > 0) & (F.col("v_i") > 0)).groupBy("source").agg(
        F.count("*").alias("k"),
        F.sum(lnn).alias("sx"),
        F.sum(lnv).alias("sy"),
        F.sum(dec38(lnn) * dec38(lnn)).alias("sxx"),
        F.sum(dec38(lnn) * dec38(lnv)).alias("sxy"),
        F.max(F.when(F.col("cut") == 100, F.col("n_i"))).alias("n_total"),
        F.max(F.when(F.col("cut") == 100, F.col("v_i"))).alias("v_total"),
    )
    kd = F.col("k").cast("double")
    den = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / kd
    beta = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / kd
    ) / den
    lnk = (F.col("sy").cast("double") - beta * F.col("sx").cast("double")) / kd / 1.0e9
    return m.select(
        "source",
        F.col("n_total").alias("n_tokens"),
        F.col("v_total").alias("vocab_size"),
        F.when((F.col("k") > 1) & (den != 0.0), micro(beta)).alias("heaps_beta"),
        F.when((F.col("k") > 1) & (den != 0.0), micro(F.exp(lnk))).alias("heaps_k"),
    ).orderBy("source")


def heaps_law_fit_sql() -> str:
    from ..functions.money import micro_sql

    cuts = ", ".join(f"({c})" for c in HEAPS_CUTS)
    beta = (
        "((sxy::double - sx::double * sy::double / k::double)"
        " / (sxx::double - sx::double * sx::double / k::double))"
    )
    den_ok = "(sxx::double - sx::double * sx::double / k::double) != 0.0"
    lnk = f"((sy::double - {beta} * sx::double) / k::double / 1.0e9)"
    return f"""
WITH toks AS (
  SELECT source, doc_id,
         unnest(string_split(trim(text, ' '), ' ')) AS tok
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE tok != ''),
per_doc AS (
  SELECT source, doc_id, count(*) AS n_tok FROM toks2 GROUP BY 1, 2
),
ranked AS (
  SELECT source, doc_id, n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk,
         count(*) OVER (PARTITION BY source) AS n_docs,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM per_doc
),
tok_first AS (
  SELECT t.source, t.tok, min(r.rnk) AS first_rnk
  FROM toks2 t JOIN ranked r USING (source, doc_id)
  GROUP BY 1, 2
),
cut_ranks AS (
  SELECT s.source, c.cut, (c.cut * s.n_docs + 99) // 100 AS cut_rnk
  FROM (SELECT DISTINCT source, n_docs FROM ranked) s
  CROSS JOIN (SELECT * FROM (VALUES {cuts}) x(cut)) c
),
n_at AS (
  SELECT cr.source, cr.cut, r.cum_tok AS n_i
  FROM cut_ranks cr JOIN ranked r
    ON r.source = cr.source AND r.rnk = cr.cut_rnk
),
v_at AS (
  SELECT cr.source, cr.cut, count(*) AS v_i
  FROM cut_ranks cr JOIN tok_first tf ON tf.source = cr.source
  WHERE tf.first_rnk <= cr.cut_rnk
  GROUP BY 1, 2
),
pts AS (
  SELECT n.source, n.cut, n.n_i, v.v_i,
         CAST(floor(ln(n.n_i::double) * 1000000000.0 + 0.5) AS BIGINT) AS lnn,
         CAST(floor(ln(v.v_i::double) * 1000000000.0 + 0.5) AS BIGINT) AS lnv
  FROM n_at n JOIN v_at v USING (source, cut)
  WHERE n.n_i > 0 AND v.v_i > 0
),
m AS (
  SELECT source, count(*) AS k, sum(lnn) AS sx, sum(lnv) AS sy,
         sum(lnn::hugeint * lnn::hugeint) AS sxx,
         sum(lnn::hugeint * lnv::hugeint) AS sxy,
         max(CASE WHEN cut = 100 THEN n_i END) AS n_total,
         max(CASE WHEN cut = 100 THEN v_i END) AS v_total
  FROM pts GROUP BY source
)
SELECT source, CAST(n_total AS BIGINT) AS n_tokens,
       CAST(v_total AS BIGINT) AS vocab_size,
       CASE WHEN k > 1 AND {den_ok} THEN {micro_sql(beta)} END AS heaps_beta,
       CASE WHEN k > 1 AND {den_ok} THEN {micro_sql(f'exp({lnk})')} END AS heaps_k
FROM m
ORDER BY source
"""


# ---------------------------------------------------------------------------
# grouped-jackknife sensitivity of corpus-level statistics
# ---------------------------------------------------------------------------


def jackknife_source_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out (grouped delete-d) jackknife of the corpus
    mean document length: for each source, the corpus mean WITHOUT that
    source, the jackknife pseudo-value, and the grouped-jackknife
    standard error of the mean — "how fragile is any corpus-level stat
    to a single source?"  A source whose removal moves the mean by
    multiple SEs dominates the corpus (the length-stat cousin of
    :func:`eb_shrunk_source_quality`'s small-n distrust: EB asks "can I
    trust a small source", the jackknife asks "am I hostage to a big
    one").  SE uses the standard (G−1)/G grouped-jackknife scaling.  A
    single-source corpus returns an EMPTY frame on both engines
    (leave-one-out is undefined at G = 1: the only row has n == n_g and
    the n > n_g filter drops it), so non-empty output structurally has
    G ≥ 2.

    Determinism: per-source n_g and Σchars are exact int64; every
    leave-one-out mean θ_(g) = (S − s_g)/(n − n_g) is ONE double
    division of exact integers; the across-source moments (Σθ, Σ(θ−θ̄)²)
    accumulate as ORDERED cumulative window sums over the ≤|sources|-row
    frame in source order — both engines add the same doubles in the
    same sequence (the anova ≤5-row discipline on the ~20-row source
    frame).

    Scale shape: one map-side-combined groupBy(source) — tracked-persisted,
    because three independent Catalyst subtrees consume it (the ordered
    theta mean, the SS pass via withbar, and the final select): without
    the cache the corpus-sized scan+aggregate re-runs per consumer (the
    round-9 ADVICE finding; same collapse class as rfm_segments /
    permutation_test_spend).  Everything after runs on the bounded
    source frame."""
    from pyspark.sql import Window

    from ..functions.money import micro
    from ..io import tracked_persist

    docs = load_table(spark, sf_dir, "documents")
    g = tracked_persist(
        docs.groupBy("source").agg(
            F.count("*").alias("n_g"), F.sum("n_chars").alias("s_g")
        )
    )
    wk = Window.partitionBy()
    tot = g.select(
        "source",
        "n_g",
        "s_g",
        F.sum("n_g").over(wk).alias("n"),
        F.sum("s_g").over(wk).alias("s"),
        F.count("*").over(wk).alias("n_sources"),
    )
    theta_hat = F.col("s").cast("double") / F.col("n").cast("double")
    theta_loo = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    ).cast("double")
    gd = F.col("n_sources").cast("double")
    base = tot.filter(F.col("n") > F.col("n_g")).select(
        "source",
        "n_g",
        "n_sources",
        theta_hat.alias("theta_hat"),
        theta_loo.alias("theta_loo"),
        (gd * theta_hat - (gd - 1.0) * theta_loo).alias("pseudo"),
    )
    ws = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    # pass 1: ordered mean of theta_loo (final-row pick, then broadcast)
    mean_row = (
        base.select(
            F.sum("theta_loo").over(ws).alias("cum_theta"),
            F.row_number().over(Window.orderBy("source")).alias("rn"),
            F.count("*").over(wk).alias("g_eff"),
        )
        .filter(F.col("rn") == F.col("g_eff"))
        .select(
            (F.col("cum_theta") / F.col("g_eff").cast("double")).alias("theta_bar"),
            F.col("g_eff"),
        )
    )
    withbar = base.join(F.broadcast(mean_row))
    dev = F.col("theta_loo") - F.col("theta_bar")
    se_row = (
        withbar.select(
            F.sum(dev * dev).over(ws).alias("cum_ss"),
            F.row_number().over(Window.orderBy("source")).alias("rn"),
            "g_eff",
        )
        .filter(F.col("rn") == F.col("g_eff"))
        .select(
            F.sqrt(
                (F.col("g_eff").cast("double") - 1.0)
                / F.col("g_eff").cast("double")
                * F.col("cum_ss")
            ).alias("jk_se"),
        )
    )
    # no G==1 guard needed: a single-source corpus has n == n_g for its
    # only row, so `base` is EMPTY (leave-one-out is undefined) and any
    # non-empty output structurally has G >= 2
    return (
        withbar.join(F.broadcast(se_row))
        .select(
            "source",
            F.col("n_g").alias("n_docs"),
            micro(F.col("theta_hat")).alias("mean_chars_all"),
            micro(F.col("theta_loo")).alias("mean_chars_loo"),
            micro(F.col("pseudo")).alias("pseudo_value"),
            micro(F.col("jk_se")).alias("jk_se"),
        )
        .orderBy("source")
    )


def jackknife_source_mean_sql() -> str:
    from ..functions.money import micro_sql

    return f"""
WITH g AS (
  SELECT source, count(*) AS n_g, sum(n_chars) AS s_g
  FROM documents GROUP BY source
),
tot AS (
  SELECT source, n_g, s_g,
         sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
         count(*) OVER () AS n_sources
  FROM g
),
base AS (
  SELECT source, n_g, n_sources,
         s::double / n::double AS theta_hat,
         (s - s_g)::double / (n - n_g)::double AS theta_loo,
         n_sources::double * (s::double / n::double)
           - (n_sources::double - 1.0)
             * ((s - s_g)::double / (n - n_g)::double) AS pseudo
  FROM tot WHERE n > n_g
),
mean_row AS (
  SELECT cum_theta / g_eff::double AS theta_bar, g_eff
  FROM (
    SELECT sum(theta_loo) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cum_theta,
           row_number() OVER (ORDER BY source) AS rn,
           count(*) OVER () AS g_eff
    FROM base
  ) WHERE rn = g_eff
),
se_row AS (
  SELECT sqrt((g_eff::double - 1.0) / g_eff::double * cum_ss) AS jk_se
  FROM (
    SELECT sum((b.theta_loo - m.theta_bar) * (b.theta_loo - m.theta_bar))
               OVER (ORDER BY b.source ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_ss,
           row_number() OVER (ORDER BY b.source) AS rn,
           m.g_eff
    FROM base b, mean_row m
  ) WHERE rn = g_eff
)
SELECT b.source, CAST(b.n_g AS BIGINT) AS n_docs,
       {micro_sql('b.theta_hat')} AS mean_chars_all,
       {micro_sql('b.theta_loo')} AS mean_chars_loo,
       {micro_sql('b.pseudo')} AS pseudo_value,
       {micro_sql('s.jk_se')} AS jk_se
FROM base b, mean_row m, se_row s
ORDER BY b.source
"""
