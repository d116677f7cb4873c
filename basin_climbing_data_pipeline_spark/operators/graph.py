"""Graph analytics over the co-presence graph: fixed-iteration PageRank
and triangle counting / clustering coefficient.

The proximity pair rollup (events.proximity_connections — reference
build_customer_interactions.py's connection strength table) IS a graph;
these operators answer the questions a graph table exists for: who is
central (PageRank) and how clustered is the community (triangles).
Next to dedup_clusters' connected components this completes the graph
family: reachability, centrality, local structure.

Exactness discipline: PageRank is run in INTEGER MICRO-UNITS — scores
start at 1e6, each iteration sends ``score div degree`` to every
neighbor and damps with ``(85 · Σ) div 100`` — so the fixed-point after
any number of iterations is bit-identical across engines and across any
partitioning/summation order (float PageRank is neither).  Triangle
counts and wedge counts are exact integers; only the final clustering
coefficient is a micro-rounded ratio.

Scale shape: every PageRank iteration is one equi-join (scores ⋈ edges
on src) + one groupBy (dst) — the standard distributed power-method
step; each round eagerly ``localCheckpoint``s its scores exactly like
dedup_clusters' label propagation (dedup.py:486), so round k never
re-executes rounds 1..k-1 and lineage stays flat at any depth.  Triangles are the ordered
edge-edge equi-join (wedge generation on the shared vertex, then a
closing-edge semi join) — never an all-pairs scan; cost is bounded by
Σ deg² (wedges), the known triangle-join bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STRONG_TIE_MIN = 3  # graph ops run on the strong-tie subgraph (>= 3 co-presences):
# the raw co-presence graph is near-complete by construction (70% clustering,
# avg degree ~0.7·N), where wedge enumeration is Theta(N^3) for ANY engine;
# thresholding is the graph-analytics norm (edges that mean something) and
# bounds wedge volume by the strong-tie degree distribution instead.
#
# The threshold is applied as a RATE — co-presences per 30-day window of
# the pair's span (``_strong_tie_filter``) — because a plain COUNT is
# observation-window-dependent: 4x longer history for the same users grows
# degrees ~4x and wedge volume ~16x (measured 7.7x wall at the 4x probe on
# the count form).  The rate keeps the strong-tie degree distribution — and
# thus Σdeg² — stationary as history accumulates; for spans <= 30 days it
# reduces to the plain count >= STRONG_TIE_MIN.
PR_ITERS = 3
PR_DAMP_NUM = 85  # damping 0.85 as an exact integer ratio
PR_BASE_MICRO = 150_000  # (1 - 0.85) · 1e6


def _strong_tie_filter(df):
    """RATE-threshold strong ties: >= STRONG_TIE_MIN co-presences per
    30-day window of the pair's observed span.  A plain count threshold is
    observation-window-dependent (4x longer history for the same users
    grows degrees ~4x and wedge volume ~16x — measured 7.7x wall on the 4x
    probe); normalizing by the span keeps the strong-tie degree
    distribution — and thus the Σdeg² wedge bound — stationary as history
    accumulates.  For spans <= 30 days this reduces to the plain
    count >= STRONG_TIE_MIN."""
    windows = F.floor(F.datediff(F.col("last_date"), F.col("first_date")) / 30) + 1
    return df.filter(F.col("n_copresent") >= F.lit(STRONG_TIE_MIN) * windows)


_STRONG_TIE_SQL = (
    f"n_copresent >= {STRONG_TIE_MIN} * ((last_date - first_date) // 30 + 1)"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric directed edge list (src, dst) from the undirected
    proximity pairs."""
    from .events import proximity_connections

    pairs = _strong_tie_filter(proximity_connections(spark, sf_dir)).select(
        F.col("customer_id_1").alias("a"), F.col("customer_id_2").alias("b")
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def pagerank_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by integer-micro PageRank over the proximity
    graph after PR_ITERS power-method iterations."""
    from ..io import tracked_persist

    edges = tracked_persist(_edges(spark, sf_dir))
    # degree is joined every round AND seeds the scores — checkpoint once so
    # the proximity subtree isn't re-derived per iteration; per-round score
    # checkpoints keep the power-method lineage flat (same discipline as
    # dedup_clusters' label propagation, dedup.py), otherwise round k
    # re-executes rounds 1..k-1 and the plan grows multiplicatively.
    degree = edges.groupBy("src").agg(F.count("*").alias("degree")).localCheckpoint()
    scores = degree.select("src", F.lit(1_000_000).cast("long").alias("score"))
    for _ in range(PR_ITERS):
        contrib = (
            scores.join(degree, "src")
            .join(edges, "src")
            .select("dst", F.expr("score div degree").alias("c"))
        )
        incoming = contrib.groupBy(F.col("dst").alias("src")).agg(
            F.sum("c").alias("s")
        )
        # nodes with no in-edges can't occur (edges are symmetric), but an
        # outer join keeps the contract obvious
        scores = (
            degree.select("src")
            .join(incoming, "src", "left")
            .select(
                "src",
                (
                    F.lit(PR_BASE_MICRO)
                    + F.expr(f"({PR_DAMP_NUM} * coalesce(s, 0L)) div 100")
                ).alias("score"),
            )
            .localCheckpoint()
        )
    return (
        scores.join(degree, "src")
        .select(F.col("src").alias("customer_id"), "degree", F.col("score").alias("score_micro"))
        .orderBy(F.desc("score_micro"), "customer_id")
        .limit(20)
    )


def pagerank_proximity_sql() -> str:
    from .events import proximity_connections_sql

    it = """
it{n} AS (
  SELECT d.src,
         {base} + ({damp} * coalesce(i.s, 0)) // 100 AS score
  FROM degree d
  LEFT JOIN (
    SELECT e.dst AS src, sum(p.score // d2.degree)::bigint AS s
    FROM it{p} p
    JOIN degree d2 USING (src)
    JOIN edges e USING (src)
    GROUP BY e.dst
  ) i USING (src)
)"""
    iters = ",".join(
        it.format(n=i + 1, p=i, base=PR_BASE_MICRO, damp=PR_DAMP_NUM)
        for i in range(PR_ITERS)
    )
    return f"""
WITH prox AS MATERIALIZED ({proximity_connections_sql()}),
pairs AS MATERIALIZED (SELECT customer_id_1 AS a, customer_id_2 AS b FROM prox
          WHERE {_STRONG_TIE_SQL}),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
degree AS MATERIALIZED (SELECT src, count(*) AS degree FROM edges GROUP BY src),
it0 AS (SELECT src, 1000000::bigint AS score FROM degree),
{iters}
SELECT d.src AS customer_id, d.degree, s.score AS score_micro
FROM it{PR_ITERS} s JOIN degree d USING (src)
ORDER BY s.score DESC, d.src
LIMIT 20
"""


def triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the proximity graph: node/edge/triangle
    counts and the clustering coefficient 3·triangles / wedges."""
    from .events import proximity_connections

    pairs = _strong_tie_filter(proximity_connections(spark, sf_dir)).select(
        F.col("customer_id_1").alias("a"), F.col("customer_id_2").alias("b")
    )  # a < b by construction — the orientation that makes the join linear-ish
    # wedges a<b<c open at b... the ordered pattern: (a,b) + (b,c) + (a,c)
    ab = pairs.alias("ab")
    bc = pairs.alias("bc")
    wedges = ab.join(bc, F.col("ab.b") == F.col("bc.a")).select(
        F.col("ab.a").alias("a"), F.col("ab.b").alias("b"), F.col("bc.b").alias("c")
    )
    closing = pairs.select(F.col("a").alias("a"), F.col("b").alias("c"))
    triangles = wedges.join(closing, ["a", "c"], "left_semi")
    n_tri = triangles.agg(F.count("*").alias("n_triangles"))
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionByName(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    ).withColumn("k", F.lit(0))
    out = n_tri.withColumn("k", F.lit(0)).join(stats, "k").drop("k")
    return out.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        (
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges") * 1000000.0
                    + 0.5
                )
                / 1000000.0
            )
        ).alias("clustering_coeff"),
    )


def triangle_stats_sql() -> str:
    from .events import proximity_connections_sql

    return f"""
WITH prox AS MATERIALIZED ({proximity_connections_sql()}),
pairs AS MATERIALIZED (SELECT customer_id_1 AS a, customer_id_2 AS b FROM prox
          WHERE {_STRONG_TIE_SQL}),
tri AS (
  SELECT count(*) AS n_triangles
  FROM pairs ab
  JOIN pairs bc ON bc.a = ab.b
  WHERE EXISTS (
    SELECT 1 FROM pairs ac WHERE ac.a = ab.a AND ac.b = bc.b
  )
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs
  ) GROUP BY v
),
stats AS (
  SELECT count(*) AS n_nodes, (sum(d) / 2)::bigint AS n_edges,
         sum(d * (d - 1) // 2)::bigint AS n_wedges
  FROM deg
)
SELECT s.n_nodes, s.n_edges, t.n_triangles, s.n_wedges,
       CASE WHEN s.n_wedges = 0 THEN 0.0
            ELSE floor(3.0 * t.n_triangles / s.n_wedges * 1000000.0 + 0.5) / 1000000.0
       END AS clustering_coeff
FROM tri t, stats s
"""


# ---------------------------------------------------------------------------
# common-neighbor link prediction
# ---------------------------------------------------------------------------

RECS_TOP_K = 20
# Per-node adjacency cap for wedge generation: keep each node's ADJ_CAP
# strongest ties (by co-presence count, deterministic tie-break) before
# joining.  Wedge volume is Σ deg² — unbounded as the graph densifies (the
# 4× probe measured 8.7× on the uncapped join, same cause as
# triangle_stats' 7.7×) — capping bounds it at N·ADJ_CAP², which is the
# standard production shape for common-neighbor scoring (recommendations
# beyond a node's top ties are noise anyway).
ADJ_CAP = 16


def common_neighbor_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor counting: for every NON-adjacent
    ordered pair (a < b) sharing at least one strong-tie neighbor within
    the capped adjacency, score the pair by its common-neighbor count and
    neighbor-set Jaccard, and keep the global top-``RECS_TOP_K``.  This is
    the classic friend-of-friend recommender over the co-presence graph —
    the missing member of the graph family next to reachability
    (dedup_clusters), centrality (pagerank_proximity) and local structure
    (triangle_stats).  Reference analog: build_customer_connections.py's
    strength table is exactly the edge input a gym would feed "climbs with
    your partners" suggestions from.

    Scale shape: adjacency is capped per node FIRST (one window over the
    edge list — see ``ADJ_CAP``), then candidate pairs come from the same
    ordered wedge equi-join as the triangle census, now bounded at
    N·ADJ_CAP² instead of Σ deg²; direct edges leave via one left-anti
    equi-join; Jaccard needs only the two endpoint (capped) degrees —
    |N(a) ∪ N(b)| = deg(a) + deg(b) − common."""
    from pyspark.sql import Window

    from ..functions.money import ratio
    from .events import proximity_connections

    pairs = _strong_tie_filter(proximity_connections(spark, sf_dir)).select(
        F.col("customer_id_1").alias("a"),
        F.col("customer_id_2").alias("b"),
        "n_copresent",
    )
    directed = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "n_copresent"
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "n_copresent")
    )
    wcap = Window.partitionBy("src").orderBy(F.desc("n_copresent"), "dst")
    edges = (
        directed.withColumn("_rn", F.row_number().over(wcap))
        .filter(F.col("_rn") <= ADJ_CAP)
        .select("src", "dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).filter(
        F.col("e1.src") < F.col("e2.dst")
    )
    cand = wedges.groupBy(
        F.col("e1.src").alias("a"), F.col("e2.dst").alias("b")
    ).agg(F.count("*").alias("common_neighbors"))
    direct = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    non_adj = cand.join(direct, ["a", "b"], "left_anti")
    da = deg.select(F.col("src").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("degree").alias("deg_b"))
    return (
        non_adj.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            ratio(
                F.col("common_neighbors").cast("double"),
                (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")).cast(
                    "double"
                ),
                6,
            ).alias("neighbor_jaccard"),
        )
        .orderBy(F.desc("common_neighbors"), F.desc("neighbor_jaccard"), "a", "b")
        .limit(RECS_TOP_K)
    )


def common_neighbor_recs_sql() -> str:
    from .events import proximity_connections_sql

    return f"""
WITH prox AS MATERIALIZED ({proximity_connections_sql()}),
pairs AS MATERIALIZED (SELECT customer_id_1 AS a, customer_id_2 AS b, n_copresent
          FROM prox WHERE {_STRONG_TIE_SQL}),
directed AS (
  SELECT a AS src, b AS dst, n_copresent FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, n_copresent FROM pairs
),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY n_copresent DESC, dst) AS rn
    FROM directed
  ) WHERE rn <= {ADJ_CAP}
),
degree AS (SELECT src, count(*) AS degree FROM edges GROUP BY src),
cand AS (
  SELECT e1.src AS a, e2.dst AS b, count(*) AS common_neighbors
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
  GROUP BY e1.src, e2.dst
),
non_adj AS (
  SELECT c.* FROM cand c
  ANTI JOIN edges e ON e.src = c.a AND e.dst = c.b
)
SELECT n.a, n.b, n.common_neighbors,
       floor(n.common_neighbors::double
             / (da.degree + db.degree - n.common_neighbors) * 1000000.0 + 0.5)
         / 1000000.0 AS neighbor_jaccard
FROM non_adj n
JOIN degree da ON da.src = n.a
JOIN degree db ON db.src = n.b
ORDER BY n.common_neighbors DESC, neighbor_jaccard DESC, n.a, n.b
LIMIT {RECS_TOP_K}
"""


LPA_ITERS = 3


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    strong-tie co-presence graph: every node starts as its own label, and
    each of :data:`LPA_ITERS` rounds re-labels every node with its
    neighbors' MOST FREQUENT label (ties → smallest label — the
    deterministic pin the textbook random tie-break lacks; isolated
    update order is a non-issue because rounds are fully synchronous).
    LPA finds densely-knit groups that connected components (one big
    blob) and triangles (local only) both miss — the "friend circles"
    readout of the reference's interaction table.

    Output: one row per surviving community with member count and the
    canonical (min) member, plus each community's internal-edge count —
    the density evidence.  Deterministic by construction, so the oracle
    unrolls the same three rounds in SQL.

    Scale shape: each round is one equi-join (labels ⋈ edges) + one
    groupBy(node, label) + one per-node argmax aggregation — the Pregel
    step as relational algebra; ``localCheckpoint`` flattens lineage per
    round exactly like PageRank above.

    ROUND-12 OPTIMIZATION: (a) ``tracked_persist(edges)`` — the
    proximity-self-join edge list is consumed by every round's join, the
    node seed AND the internal-edge count (~6 rebuilds uncached; PageRank
    above already caches it); (b) the per-node argmax rides
    ``max_by(label, struct(n, -label))`` — max of (n, -label) is exactly
    the first row under (n DESC, label ASC), the same tie proof as
    ivf_probe_recall_sweep — so the partial aggregation collapses each
    node's candidate labels map-side instead of shuffling them into a
    row_number window sort."""
    from ..io import tracked_persist

    edges = tracked_persist(_edges(spark, sf_dir))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(LPA_ITERS):
        nbr = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(F.count("*").alias("n"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("n"), (-F.col("label")).alias("nl"))
                ).alias("label")
            )
            .localCheckpoint()
        )
    sizes = labels.groupBy("label").agg(
        F.count("*").alias("n_members"), F.min("node").alias("canonical_member")
    )
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("l_src"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("l_dst"))
    internal = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter((F.col("l_src") == F.col("l_dst")) & (F.col("src") < F.col("dst")))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    return (
        sizes.join(internal, "label", "left")
        .select(
            F.col("label").alias("community_id"),
            "n_members",
            "canonical_member",
            F.coalesce(F.col("internal_edges"), F.lit(0)).alias("internal_edges"),
        )
        .orderBy("community_id")
    )


def label_propagation_communities_sql() -> str:
    from .events import proximity_connections_sql

    rnd = """
lab{n} AS (
  SELECT node, label FROM (
    SELECT e.src AS node, p.label, count(*) AS n,
           row_number() OVER (PARTITION BY e.src
                              ORDER BY count(*) DESC, p.label) AS rn
    FROM edges e JOIN lab{p} p ON e.dst = p.node
    GROUP BY e.src, p.label
  ) WHERE rn = 1
)"""
    rounds = ",".join(rnd.format(n=i + 1, p=i) for i in range(LPA_ITERS))
    return f"""
WITH prox AS MATERIALIZED ({proximity_connections_sql()}),
pairs AS MATERIALIZED (SELECT customer_id_1 AS a, customer_id_2 AS b FROM prox
          WHERE {_STRONG_TIE_SQL}),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
lab0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{rounds},
sizes AS (
  SELECT label, count(*) AS n_members, min(node) AS canonical_member
  FROM lab{LPA_ITERS} GROUP BY label
),
internal AS (
  SELECT la.label, count(*) AS internal_edges
  FROM edges e
  JOIN lab{LPA_ITERS} la ON e.src = la.node
  JOIN lab{LPA_ITERS} lb ON e.dst = lb.node
  WHERE la.label = lb.label AND e.src < e.dst
  GROUP BY la.label
)
SELECT s.label AS community_id, s.n_members, s.canonical_member,
       coalesce(i.internal_edges, 0) AS internal_edges
FROM sizes s LEFT JOIN internal i USING (label)
ORDER BY community_id
"""
