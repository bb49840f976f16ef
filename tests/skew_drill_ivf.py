"""IVF hot-stripe drill (VERDICT r9 item 4, carried from r8 item 6):
a persisted IVF index where ONE centroid owns ~80% of the corpus —
the embedding analog of tests/skew_drill.py's hot-user fixture — at
25x the sf0.1 embeddings scale (50k vectors, 16 dims).

Planted routing (ids 0..15 are the basis vectors, so seed_centroids
yields exactly e_0..e_15): 80% of the remaining ids are e_0 (all
route to centroid 0), the rest spread over e_1..e_15. Measured against
a uniform control corpus of the same size:

- build (partitionBy write with one giant partition vs 16 even ones)
- cold probe: a query routed to a SMALL list on the HOT index must
  cost the same as on the uniform index — partition pruning means the
  hot directory is never opened (the whole point of the layout)
- hot probe: a query routed INTO the 40k-row list — completes, and its
  cost is candidate-bound (the inherent IVF recall/cost tradeoff),
  not a blowup; the per-query window sort is bounded by list size
- append: a 5k delta onto the hot index (routing + partition append)

Run: python tests/skew_drill_ivf.py   (one JSON line per measurement)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentick_spark.operators.similarity import (
    build_ivf_index,
    ivf_index_append,
    ivf_topk_indexed,
)
from opentick_spark.session import get_spark

N = 50_000
HOT = 8  # vec_id % 10 < HOT -> e_0: 80% hot mass


def basis_corpus(spark, n, hot: bool):
    """ids 0..15 = e_id (deterministic seeds); beyond that either the
    hot plant (80% e_0) or a uniform stripe spread."""
    stripe = (
        "CASE WHEN id < 16 THEN id "
        f"     WHEN id % 10 < {HOT} THEN 0 "
        "     ELSE 1 + id % 15 END"
        if hot
        else "id % 16"
    )
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, 15), a -> CAST(CASE WHEN a = ({stripe}) "
        "THEN 1.0 ELSE 0.0 END AS FLOAT)) AS embedding",
    )


def query_vec(spark, stripe: int):
    return spark.range(1).selectExpr(
        f"id + 10000000 AS vec_id",
        f"transform(sequence(0, 15), a -> CAST(CASE WHEN a = {stripe} "
        "THEN 1.0 ELSE 0.0 END AS FLOAT)) AS embedding",
    )


def timed(label, thunk, reps=3, **extra):
    times = []
    for _ in range(reps):
        t0 = time.time()
        thunk()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"op": label, "seconds": times, **extra}), flush=True)
    return min(times)


def list_sizes(path):
    sizes = {}
    for d in os.listdir(f"{path}/lists"):
        if d.startswith("centroid_id="):
            cid = int(d.split("=")[1])
            sizes[cid] = sum(
                os.path.getsize(os.path.join(path, "lists", d, f))
                for f in os.listdir(os.path.join(path, "lists", d))
            )
    return sizes


def main():
    spark = get_spark(app_name="skew_drill_ivf", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="otspark_ivf_drill_")
    paths = {"hot": f"{tmp}/hot", "uniform": f"{tmp}/uniform"}
    for kind, hot in (("hot", True), ("uniform", False)):
        corpus = basis_corpus(spark, N, hot).localCheckpoint(eager=True)
        timed(
            f"ivf_build_{kind}",
            lambda: build_ivf_index(corpus, paths[kind]),
            reps=3,
        )
    sizes = list_sizes(paths["hot"])
    hot_share = sizes[0] / sum(sizes.values())
    print(
        json.dumps(
            {"op": "hot_list_share_bytes", "share": round(hot_share, 3)}
        ),
        flush=True,
    )
    assert hot_share > 0.5, sizes  # the skew actually materialized

    for kind in ("hot", "uniform"):
        q_cold = query_vec(spark, 5)
        timed(
            f"ivf_cold_probe_{kind}",
            lambda: ivf_topk_indexed(
                spark, paths[kind], q_cold, k=10, nprobe=1
            ).collect(),
        )
    q_hot = query_vec(spark, 0)
    timed(
        "ivf_hot_probe_hot",
        lambda: ivf_topk_indexed(
            spark, paths["hot"], q_hot, k=10, nprobe=1
        ).collect(),
    )

    delta = basis_corpus(spark, N + 5_000, True).filter(
        F.col("vec_id") >= N
    ).localCheckpoint(eager=True)
    timed(
        "ivf_append_5k_hot",
        lambda: ivf_index_append(spark, delta, paths["hot"]),
        reps=1,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
