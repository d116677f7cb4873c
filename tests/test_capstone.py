"""Capstone adversarial smoke: the FULL registry against the combined
adversarial corpus, in the default pytest run.

The capstone corpus (tools/capstone_corpus.py) makes every table
simultaneously adversarial — unicode/degenerate documents, tie-heavy
boundary events, edge-value transactions, exact-tie/zero-dot embeddings,
grammar-hostile part names — assembled from the SAME builders the
per-family parametrizations in test_adversarial_corpus.py use.  Running
the whole registry against it means every FUTURE operator gets coverage
of the 8 known cross-engine bug classes (ANSI throws, fold_norm, trim,
UNPIVOT NULLs, byte-vs-codepoint, NULL sort position, degenerate
denominators, empty payloads) by default, not by a separate tool
invocation.

Comparison reuses tools/check.py's canonicalizer (the driver-gate mimic:
sorted columns, order-insensitive value hash, repr-rounded floats), so a
pass here means the same thing a CHECKLOCAL pass means.
"""

from __future__ import annotations

import duckdb
import pytest

from basin_climbing_data_pipeline_spark import registry
from tools.capstone_corpus import TABLES, build
from tools.check import canon_rows, value_hash


@pytest.fixture(scope="module")
def capstone_dir(tmp_path_factory):
    return build(str(tmp_path_factory.mktemp("capstone")))


@pytest.fixture(scope="module")
def capstone_con(capstone_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{capstone_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(registry.REGISTRY))
def test_capstone_oracle_parity(spark, capstone_dir, capstone_con, name):
    fn, sql = registry.REGISTRY[name]
    sdf = fn(spark, capstone_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    assert sql is not None, f"{name} has no oracle"
    res = capstone_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, s_lines = canon_rows(s_cols, s_rows)
    dc, d_lines = canon_rows(d_cols, d_rows)
    assert sc == dc, f"schema: spark={sc} duckdb={dc}"
    assert len(s_rows) == len(d_rows), (
        f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if value_hash(s_lines) != value_hash(d_lines):
        s_only = sorted(set(s_lines) - set(d_lines))[:3]
        d_only = sorted(set(d_lines) - set(s_lines))[:3]
        raise AssertionError(
            f"value-hash mismatch\n spark-only: {s_only}\n duckdb-only: {d_only}"
        )
