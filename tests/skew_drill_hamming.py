"""Hamming-ball blocking hot-chunk skew drill (r7, VERDICT r6 item 4):
the degenerate bucket the r6 verdict flagged — K signatures sharing a
chunk value (the real-world shape: constant-color images whose dHash is
all-zero, re-encoded copies, black video frames).

``hamming_blocked_pairs`` equi-joins on (chunk_idx, chunk_val): a
K-clone clique collides in EVERY one of the max_hamming+1 chunks, so it
emits ~(max_hamming+1)·C(K,2) join rows before the distinct — quadratic
in K, exactly like the LSH duplicate-clique cliff skew_drill_dedup.py
measured. ``hamming_blocked_star_edges`` (r7) emits one verified
hub→member star per bucket (K-1 edges) and feeds
``connected_components`` the same clusters — linear.

Fixture: sf0.01-sized spread of distinct signatures (xxhash64 of the
id — uniform 64-bit, so organic chunk collisions stay rare) + K clones
of the all-zero signature (every chunk collides — the worst case).

Measures (fresh plans, shared warm session):
- pairs op at K=400, 1200, 4000 (expect ~9x time/rows per 3x clones;
  K=10000 is excluded — 9 chunks x C(10k,2) ~ 4.5e8 pre-distinct rows)
- star edges + components at the same Ks AND K=10000 (expect flat)
- pairs-vs-star cluster equivalence at K=400

Run: python tests/skew_drill_hamming.py  (one JSON line per measurement;
numbers land in PLANS.md)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentick_spark.operators import dedup as D
from opentick_spark.session import get_spark

N_BASE = 500  # matches the sf0.01 documents/images corpus size


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, thunk, reps=2):
    times = []
    for _ in range(reps):
        t0 = time.time()
        thunk()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"op": label, "seconds": times}), flush=True)
    return times


def fixture(spark, k):
    base = spark.range(N_BASE).select(
        F.col("id"), F.xxhash64("id").alias("sh")
    )
    clones = spark.range(10_000_000, 10_000_000 + k).select(
        "id", F.lit(0).cast("long").alias("sh")
    )
    return base.unionByName(clones).localCheckpoint(eager=True)


def main():
    spark = get_spark(app_name="skew_drill_hamming", shuffle_partitions=32)
    # warm the plan shapes once on clean data
    base = fixture(spark, 4)
    mat(D.hamming_blocked_pairs(base, max_hamming=8))
    mat(D.hamming_blocked_star_edges(base, max_hamming=8))

    for k in (400, 1200, 4000):
        df = fixture(spark, k)
        timed(
            f"hamming_PAIRS_k{k}",
            lambda d=df: mat(D.hamming_blocked_pairs(d, max_hamming=8)),
        )
        timed(
            f"hamming_STAR_k{k}",
            lambda d=df: mat(D.hamming_blocked_star_edges(d, max_hamming=8)),
        )
    # the pairs op is intentionally NOT run at K=10000 (9 chunks ×
    # C(10k,2) ≈ 4.5e8 pre-distinct rows); star + components are
    df = fixture(spark, 10_000)
    timed(
        "hamming_STAR_k10000",
        lambda: mat(D.hamming_blocked_star_edges(df, max_hamming=8)),
    )
    timed(
        "hamming_star_components_k10000",
        lambda: mat(
            D.connected_components(
                D.hamming_blocked_star_edges(df, max_hamming=8)
            )
        ),
        reps=1,
    )

    # cluster equivalence at K=400: components over all verified pairs
    # vs components over verified star edges
    df = fixture(spark, 400)
    a = {
        (r["id"], r["cluster"])
        for r in D.connected_components(
            D.hamming_blocked_pairs(df, max_hamming=8)
        ).collect()
    }
    b = {
        (r["id"], r["cluster"])
        for r in D.connected_components(
            D.hamming_blocked_star_edges(df, max_hamming=8)
        ).collect()
    }
    print(
        json.dumps(
            {
                "cluster_equivalence_k400": sorted(a ^ b)[:10],
                "identical": a == b,
                "n_nodes": len(a),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
