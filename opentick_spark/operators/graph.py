"""Graph analytics over pair tables (e.g. near-duplicate edges, source
overlap): PageRank by distributed power iteration.

Connected components lives in dedup.py (min-label propagation); this
module holds the rank-style iterative algorithms. Same iteration
hygiene as the other iterative operators (k-means in similarity.py, CC
in dedup.py): every iteration is pure DataFrame ops (join on src →
contribution agg on dst), the driver only counts iterations, and
``localCheckpoint`` cuts lineage so plan depth stays constant — the
posture that keeps a billion-edge graph runnable on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 15,
    undirected: bool = True,
    checkpoint_every: int = 5,
    driver_if_edges_below: int | None = None,
) -> DataFrame:
    """PageRank over an edge list by fixed-iteration power iteration.

    ``undirected=True`` symmetrizes the edge list first (each edge
    contributes in both directions — the right reading for similarity /
    overlap graphs). Dangling nodes keep the teleport mass only. Ranks
    are initialized uniform over the nodes present in the edge list and
    NOT renormalized per step (teleport term uses 1/N), so the result
    matches the textbook iteration exactly.

    Shuffle story per iteration: one join of ranks to edges on the
    source key and one aggregation on the destination key — both
    partition on graph keys, nothing funnels through the driver; the
    edge table is reused every step (cache it for real workloads).
    Output: (node, pr).

    ``driver_if_edges_below``: adaptive strategy pick, same spirit as a
    broadcast join — when the (already aggregated) graph is provably
    tiny (e.g. one node per SOURCE or per LABEL), the identical
    iteration runs driver-side instead of paying ~2 Spark stages ×
    iterations of fixed scheduling cost. The distributed path stays the
    default and the golden test pins both to the same textbook values.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()
    if driver_if_edges_below is not None:
        pairs = [
            (r["src"], r["dst"])
            for r in e.limit(driver_if_edges_below + 1).collect()
        ]
        if len(pairs) <= driver_if_edges_below:
            return _pagerank_driver(
                edges.sparkSession, pairs, damping, iterations
            )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degree rides along with the edge so the per-iteration join is
    # single: (src, dst, deg)
    e_deg = e.join(out_deg, "src")
    e_deg = e_deg.localCheckpoint(eager=True)
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    teleport = (1.0 - damping) / n_nodes
    for it in range(iterations):
        contribs = (
            e_deg.join(ranks.withColumnsRenamed({"node": "src"}), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _pagerank_driver(spark, pairs, damping: float, iterations: int):
    """Driver-side variant of the same textbook iteration, for graphs
    already proven tiny (see pagerank's driver_if_edges_below). Pure
    Python floats with per-node ordered accumulation — matches the
    distributed path to float precision on small graphs (golden test)."""
    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    outs: list[list[int]] = [[] for _ in nodes]
    for s, d in pairs:
        outs[idx[s]].append(idx[d])
    n = len(nodes)
    pr = [1.0 / n] * n
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        new = [teleport] * n
        for s, ds in enumerate(outs):
            if not ds:
                continue
            share = damping * pr[s] / len(ds)
            for d in ds:
                new[d] += share
        pr = new
    node_type = "string" if nodes and isinstance(nodes[0], str) else "long"
    return spark.createDataFrame(
        [(nodes[i], pr[i]) for i in range(n)], f"node {node_type}, pr double"
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact per-vertex triangle counts by degree-ordered orientation —
    the classic bound that makes exact triangle counting feasible on a
    skewed 100 TB graph.

    The naive wedge join explodes on hub vertices (a degree-d hub emits
    d² wedges). Orienting every undirected edge from the
    (degree, id)-SMALLER endpoint to the larger one caps every oriented
    out-degree at O(sqrt(m)) — a vertex with out-degree k has k
    neighbors of degree ≥ its own, so k² ≤ 2m — bounding total wedge
    work at O(m^1.5) regardless of hub skew (Schank & Wagner 2005; the
    same orientation GraphX's triangleCount uses). Every triangle
    {x ≺ y ≺ z} is counted exactly once: as the wedge (y, z) at its
    ≺-minimum x closed by the oriented edge y→z.

    Shuffle story: dedup + degree agg + two joins on graph keys — all
    partition on vertex ids, nothing driver-side. Input direction and
    duplicate/self edges are normalized away first.

    Output: (node, n_tri) — one row per vertex appearing in any edge,
    counting the triangles it participates in (vertices in no triangle
    report 0); sum(n_tri) = 3 × global triangle count.
    """
    u, v = F.col(src_col), F.col(dst_col)
    # localCheckpoint (module-header hygiene): canon feeds the degree
    # agg, the orientation, AND (via deg) the zero-fill — un-cut, every
    # consumer re-executes the dedup from the raw edges (plan audit at
    # r12: 86 Exchange nodes; 14 after the two cuts)
    canon = (
        edges.filter(u != v)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        canon.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u", "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("n")).alias("ku"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("n")).alias("kv"),
        )
    )
    # three consumers (both wedge sides + the closing-edge probe)
    oriented = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kb"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("a"), F.col("b").alias("x"), F.col("kb").alias("kx")
    )
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("y"), F.col("kb").alias("ky")
    )
    wedges = e1.join(e2, "a").filter(F.col("kx") < F.col("ky")).select(
        "a", "x", "y"
    )
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"])  # each row = one triangle
    per_vertex = (
        tris.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.select("node")
        .join(per_vertex, "node", "left")
        .select("node", F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"))
    )
