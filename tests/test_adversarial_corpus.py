"""Adversarial-corpus parity: the documents-family queries must match the
DuckDB oracle on degenerate inputs the driver corpus never exercises.

Every doc in the test corpus is >= 10 ASCII words, which let two bug
classes hide: Spark 4's ANSI mode THROWS on out-of-range array indexing
(the 3-gram shingle and PMI bigram expressions crashed outright on docs
under 3 words), and byte-vs-character semantics only diverge on multi-byte
code points.  This corpus packs empty/whitespace/1-2-word docs, multi-byte
scripts, emoji, extreme repetition, a 5000-char token, and punctuation —
and requires exact Spark-vs-DuckDB row parity on a representative slice of
the text/dedup family.
"""

from __future__ import annotations

import shutil

import duckdb
import pandas as pd
import pytest

from basin_climbing_data_pipeline_spark import registry

TEXTS = [
    "",
    " ",
    "word",
    "two words",
    "a b c",
    "double  space   runs",
    " leading and trailing ",
    "tab\tand\nnewline tokens here",
    "héllo wörld ünïcode tökens düplicate düplicate",
    "日本語 テキスト の 単語 処理 確認 日本語 テキスト",
    "emoji 🎉 token 🎉 twice plus ascii words here",
    ("repeat " * 200).strip(),
    ("x" * 5000) + " short",
    ("the quick brown fox jumps over the lazy dog " * 50).strip(),
    "UPPER lower MiXeD case TOKENS tokens Tokens",
    "punct! mid,word. token's \"quoted\" (paren) semi;colon",
    "unique1 unique2 unique3 unique4 unique5 unique6 unique7 unique8 unique9 unique10",
    "1 2 3 4 5 numeric tokens 42 3.14 -7",
]

# the five that CRASHED before the ANSI index guards, plus one stats query
# per sub-family as a canary
QUERIES = [
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "decontamination",
    "pmi_collocations",
    "doc_stats",
    "sorted_neighborhood_pairs",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_corpus")
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": ["en", "de", "ja", "xx"][i % 4],
            "source": ["web", "books", "code"][i % 3],
            "n_chars": len(t),
        }
        for i, t in enumerate(TEXTS)
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_corpus_oracle_parity(spark, fuzz_dir, name):
    fn, sql = registry.REGISTRY[name]
    got = sorted(
        tuple(str(v) for v in row)
        for row in (
            fn(spark, fuzz_dir)
            .select(*sorted(fn(spark, fuzz_dir).columns))
            .collect()
        )
    )
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    want = sorted(
        tuple(str(v) for _c, v in sorted(zip(cols, row))) for row in cur.fetchall()
    )
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle rows"
