"""Hub-skew drill for graph.triangle_count (r12): the degree-ordered
orientation's whole point is that a hub vertex of degree d emits
C(d, 2) wedges under a naive src-grouped wedge join but at most
C(sqrt(2m), 2) ≈ m under the orientation — measure BOTH the wedge
volumes (deterministic, the structural signal) and the wall-clock of
the oriented operator on a hub-heavy fixture.

Fixture: one hub wired to H leaves, a K-clique (real triangle mass),
and a random G(n, p) background — the shape of a follower graph with a
celebrity node.

Run: python tests/skew_drill_triangles.py   (one JSON line per row)
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from opentick_spark.operators.graph import triangle_count
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="skew_drill_triangles", shuffle_partitions=32,
        driver_memory="8g",
    )
    rng = random.Random(7)
    H, K, N = 20_000, 300, 5_000
    edges = [(0, i) for i in range(1, H + 1)]  # hub 0
    clique = list(range(H + 1, H + 1 + K))
    edges += [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    base = H + K + 1
    edges += [
        (base + a, base + b)
        for a in range(N)
        for b in range(a + 1, min(a + 40, N))
        if rng.random() < 0.05
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    m = len(edges)

    # structural signal: wedge volume naive vs oriented
    canon = df.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    deg = (
        canon.select(F.col("u").alias("n"))
        .unionAll(canon.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    naive_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("w")
    ).collect()[0]["w"]
    # oriented out-degree: per edge, charged to the (deg,id)-smaller end
    keyed = (
        canon.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                F.struct(F.col("du"), F.col("u"))
                < F.struct(F.col("dv"), F.col("v")),
                F.col("u"),
            ).otherwise(F.col("v")).alias("a")
        )
    )
    odeg = keyed.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    oriented_wedges = odeg.agg(
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("w")
    ).collect()[0]["w"]
    max_odeg = odeg.agg(F.max("d")).collect()[0][0]

    t0 = time.time()
    total = triangle_count(df).agg(F.sum("n_tri")).collect()[0][0]
    dt = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "triangle_skew_drill",
                "edges": m,
                "hub_degree": H,
                "naive_wedges": naive_wedges,
                "oriented_wedges": oriented_wedges,
                "wedge_reduction": round(naive_wedges / max(oriented_wedges, 1), 1),
                "max_oriented_outdeg": max_odeg,
                "sqrt_2m_bound": int((2 * m) ** 0.5) + 1,
                "triangles": total // 3,
                "oriented_wallclock_s": dt,
            },
            separators=(",", ":"),
        )
    )
    assert max_odeg <= int((2 * m) ** 0.5) + 1, "orientation bound violated"
    assert oriented_wedges < naive_wedges / 10, "no skew win measured"


if __name__ == "__main__":
    main()
