"""Invariant + matches-python tests for the BM25 retrieval operator.

Cross-engine value parity is covered by the tools/check.py oracle; these
pin the scoring semantics against an independent pure-Python BM25 and the
ranking contract a hash match alone wouldn't explain.
"""

from __future__ import annotations

import math

import pandas as pd

from basin_climbing_data_pipeline_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    BM25_TOP_K,
    bm25_topk,
)


def _python_bm25(sf_dir: str) -> dict[str, list[tuple[int, float]]]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {r.doc_id: str(r.text).strip().split(" ") for r in docs.itertuples()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    out: dict[str, list[tuple[int, float]]] = {}
    for qid, terms in BM25_QUERIES.items():
        dfs = {t: sum(1 for w in toks.values() if t in w) for t in terms}
        scored = []
        for doc_id, words in toks.items():
            s = 0.0
            for t in terms:
                tf = words.count(t)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                s += idf * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(words) / avgdl)
                )
            micro = math.floor(s * 1000000.0 + 0.5)
            if micro > 0:
                scored.append((micro, doc_id))
        scored.sort(key=lambda p: (-p[0], p[1]))
        out[qid] = [(d, m / 1000000.0) for m, d in scored[:BM25_TOP_K]]
    return out


def test_bm25_matches_python(spark, sf_dir):
    got = bm25_topk(spark, sf_dir).collect()
    want = _python_bm25(sf_dir)
    by_query: dict[str, list] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) <= set(BM25_QUERIES)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert [(r["doc_id"], r["bm25_score"]) for r in rows] == want[qid]


def test_bm25_ranking_contract(spark, sf_dir):
    rows = bm25_topk(spark, sf_dir).collect()
    assert rows, "synthetic corpus contains every query term"
    for r in rows:
        assert r["bm25_score"] > 0.0
    by_query: dict[str, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    for rows_q in by_query.values():
        rows_q.sort(key=lambda r: r["rank"])
        scores = [r["bm25_score"] for r in rows_q]
        assert scores == sorted(scores, reverse=True)
        assert len(rows_q) <= BM25_TOP_K
