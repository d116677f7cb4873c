"""Scale-trend probe: do the n²-risk operators actually scale ~linearly?

Builds a deterministic REPLICAS× dataset from sf0.1 (default 4x) under a
temp dir and times the blocked/bucketed operator families at both scales.
A blocked design should grow ~REPLICAS×; an accidental all-pairs design
grows ~REPLICAS²× — the probe makes the difference measurable instead of
asserted.

Replica construction (no RNG — the probe must be reproducible):
- documents: doc_id offset per replica; text gets a per-replica suffix
  token so replicas are NEAR-duplicates (realistic dedup load), not exact
  copies.
- embeddings: vec_id offset; one dimension nudged by replica*1e-3 so LSH
  buckets spread instead of stacking exact duplicates.
- events: event_id/ts shifted per replica by 35 days — longer history at
  the SAME event density, which is how real fact tables grow; replicating
  into the same time window would instead multiply co-occurrence density
  and legitimately blow up proximity pair counts.

Usage: python tools/scale_probe.py [replicas] [query ...]
Prints one line per query: name, base seconds, scaled seconds, ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# raw builder plans on BOTH sides: otherwise a materialized builder's base
# timing is a warehouse scan while the scaled dir pays the first build, and
# the ratio measures materialization, not the operator
os.environ.setdefault("SPARK_GRAFT_NO_MATERIALIZE", "1")

import duckdb

BASE = "/root/testdata/sf0.1"

# the operator families where a blocking mistake would show as superlinear
DEFAULT_QUERIES = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "dedup_clusters",
    "lsh_buckets",
    "embedding_near_dup_pairs",
    "kmeans_refine",
    "bigram_repetition",
    "proximity_connections",
    "checkin_sessions",
]


def build_scaled(dst: str, replicas: int) -> None:
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{BASE}/embeddings.parquet')"
    ).fetchone()[0]
    n_events = con.execute(
        f"SELECT count(*) FROM read_parquet('{BASE}/events.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.k * {n_docs} AS doc_id,
                 text || ' replica' || r.k AS text,
                 lang, source, n_chars
          FROM read_parquet('{BASE}/documents.parquet'),
               (SELECT unnest(range({replicas})) AS k) r
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + r.k * {n_vecs} AS vec_id,
                 list_transform(embedding,
                   x -> (x + r.k * 0.001)::float) AS embedding,
                 label
          FROM read_parquet('{BASE}/embeddings.parquet'),
               (SELECT unnest(range({replicas})) AS k) r
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT event_id + r.k * {n_events} AS event_id,
                 ts + to_days((35 * r.k)::INTEGER) AS ts,
                 user_id, event_type, value, props
          FROM read_parquet('{BASE}/events.parquet'),
               (SELECT unnest(range({replicas})) AS k) r
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = sys.argv[2:]
    queries = only or DEFAULT_QUERIES

    from basin_climbing_data_pipeline_spark.registry import REGISTRY
    from basin_climbing_data_pipeline_spark.session import get_spark

    scaled_dir = tempfile.mkdtemp(prefix="basin_scale_")
    try:
        build_scaled(scaled_dir, replicas)
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")

        def run(name: str, sf_dir: str) -> float:
            fn, _ = REGISTRY[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.time() - t0

        print(f"replicas={replicas}  (ratio ~{replicas} = linear, "
              f"~{replicas * replicas} = quadratic)")
        for name in queries:
            run(name, BASE)  # warm codegen + materialize base warehouse
            base_s = run(name, BASE)
            scaled_s = run(name, scaled_dir)
            ratio = scaled_s / base_s if base_s > 0 else float("nan")
            print(f"{name}: base={base_s:.2f}s scaled={scaled_s:.2f}s "
                  f"ratio={ratio:.1f}x")
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
