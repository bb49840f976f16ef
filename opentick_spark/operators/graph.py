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
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()
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
