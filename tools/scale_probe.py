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
- customer/orders: custkey/orderkey offsets per replica (orders keep their
  giver's replica so transfer descriptions resolve within-replica).  First
  names stay unique across replicas while the 40-surname universe is
  shared — so each surname block grows REPLICAS×, which is exactly the
  load that separates a block-scan fuzzy join (quadratic in block size)
  from the deletion-neighborhood index (linear: candidates track true
  matches, which stay ~1 per probe).
- remaining tables: copied verbatim (lookup/dim sides).

Usage: python tools/scale_probe.py [replicas] [query ...]
Prints one line per query: name, base seconds, scaled seconds, ratio.

Measured at replicas=4 (sf0.1 base, local[32]):
- pass_transfer_name_links 2.2x — the deletion-neighborhood index holds
  candidates ∝ true matches even as every surname block grows 4x (the
  length-blocked predecessor grew with block size).
- ann_recall_eval 3.8x, minhash_error_eval 4.1x — candidate generation and
  signature joins linear in corpus, as designed.
- dedup_clusters 3.3x, source_priority_dedup 2.4x (round 6, star-contraction
  clustering) — LSH pair generation + log-round component labeling stay
  ~linear; the priority resolution adds only a broadcast map and a
  per-cluster min.  membership_scd2 0.9x — per-key windows over a 4-element
  grid explode; fixed session overhead dominates at this scale.
- dsir_selection 1.5x, soft_dedup_weights 2.4x, mmr_diversified_topk 1.2x
  (late round 6) — DSIR is two token passes + a 128-row broadcast model;
  soft-dedup rides the same ~linear cluster build as dedup_clusters; MMR's
  post-pool work is constant (M^2 x Q) by construction, so its ratio is
  pure candidate-scan growth.
- bm25_topk 1.5x, repeated_ngram_coverage 2.0x, gram_novelty_by_source
  2.1x (round-6 continuation) — BM25 is scan-side tf + a 1-row stats agg;
  the two gram ops are inverted-index joins, linear at fixed shingle
  occupancy.  stratified_sample_alloc 1.1x, weighted_reservoir_sample
  0.9x, embedding_centroid_drift 1.1x — allocation work is strata-sized,
  the reservoir is one TakeOrdered, and the centroid shuffle is
  labels x 64 rows regardless of corpus size.
- ewma_daily_revenue 0.8x, ivf_probe_recall_sweep 0.9x, pq_codebook_eval
  1.2x, cross_source_dup_matrix 1.3x, streaming_weighted_sample 0.9x,
  bigram_interp_logprob 1.1x (round-6 continuation, second batch) — the
  EWMA window and IVF/PQ encode are scan-shaped with
  fixed-size broadcast sides (calendar growth ≪ row growth; 16-centroid /
  128-codeword tables); the dup matrix rides the ~linear LSH pair
  build; the streaming fold's state is K rows regardless of stream
  length; the bigram LM is two vocab-sized count tables broadcast back.
- cusum_revenue_drift 1.0x, markov_holdout_accuracy 0.9x (round-6
  continuation, third batch) — both are one corpus-keyed window shuffle
  plus matrix-/calendar-sized downstream work.
- linear_probe_quality 1.3x — one map-side-combined 15-sum aggregate;
  everything after is a 1-row Cramer solve.
- k_anonymity_audit 0.8x, join_key_skew_audit 1.0x — one keyed groupBy
  each; downstream work is |classes| / |distinct keys|, not rows.
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
    "pass_transfer_name_links",
    "ann_recall_eval",
    "minhash_error_eval",
    # round-4 third-session inverted-index / pair-risk additions
    "chunk_boilerplate",
    "cross_source_leakage",
    "hard_negative_mining",
    "dedup_recall_eval",
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
    n_cust = con.execute(
        f"SELECT count(*) FROM read_parquet('{BASE}/customer.parquet')"
    ).fetchone()[0]
    n_orders = con.execute(
        f"SELECT count(*) FROM read_parquet('{BASE}/orders.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT c_custkey + r.k * {n_cust} AS c_custkey,
                 c_name, c_nationkey, c_acctbal, c_mktsegment
          FROM read_parquet('{BASE}/customer.parquet'),
               (SELECT unnest(range({replicas})) AS k) r
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """
    )
    # Opt-in relational-fact scaling (SPARK_GRAFT_SCALE_LINEITEM=1):
    # replicate lineitem with per-replica orderkey offsets AND tile the
    # order calendar by ~7 years per replica (past the base span, so day
    # vocabularies grow ~replicas x instead of stacking).  This is the
    # probe axis for the CALENDAR-bounded operators (theilsen's pair
    # frame is days^2: 8 replicas = ~64x pairs) — without it lineitem is
    # copied verbatim and the scaled transactions table equals the base
    # one (only replica 0's orders match), which is why those probes read
    # ~1.0x.  Default off: the event/doc probes above predate this knob
    # and stay comparable.
    scale_li = os.environ.get("SPARK_GRAFT_SCALE_LINEITEM") == "1"
    day_shift = "to_days((2557 * r.k)::INTEGER)"
    o_date = f"o_orderdate + {day_shift}" if scale_li else "o_orderdate"
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey + r.k * {n_orders} AS o_orderkey,
                 o_custkey + r.k * {n_cust} AS o_custkey,
                 o_orderstatus, o_totalprice, {o_date} AS o_orderdate,
                 o_orderpriority
          FROM read_parquet('{BASE}/orders.parquet'),
               (SELECT unnest(range({replicas})) AS k) r
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )
    if scale_li:
        con.execute(
            f"""
            COPY (
              SELECT l_orderkey + r.k * {n_orders} AS l_orderkey,
                     l_partkey, l_suppkey, l_linenumber, l_quantity,
                     l_extendedprice, l_discount, l_tax, l_returnflag,
                     l_linestatus,
                     l_shipdate + {day_shift} AS l_shipdate
              FROM read_parquet('{BASE}/lineitem.parquet'),
                   (SELECT unnest(range({replicas})) AS k) r
            ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
            """
        )
    fixed = ("region", "nation", "supplier", "part")
    for t in fixed if scale_li else fixed + ("lineitem",):
        shutil.copy(f"{BASE}/{t}.parquet", f"{dst}/{t}.parquet")


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
