"""Dedup skew drill (r5, VERDICT item 7): the banded-join fan-out under
a PATHOLOGICAL duplicate — one document ingested K times (the real-world
shape: a boilerplate page, a mirrored dump, a retried crawl).

``minhash_lsh_pairs`` emits C(n,2) candidates per (band, bucket); a
K-duplicate clique costs ~K²/2 pairs per band — quadratic in the
duplicate count. ``minhash_cluster_edges`` (r5) emits a verified STAR
per bucket (K-1 edges) and feeds ``connected_components`` the same
clusters. ``duplicate_spans``' gram join is a left-semi + count — no
pairwise work, measured for contrast.

Measures (fresh plans, shared warm session; fixture = sf0.01 documents
+ K clones of one doc):

- pairs op at K=400 and K=1200 (quadratic: 4x duplicates ⇒ ~9x pairs)
- star edges + components at the same Ks AND K=10000 (linear)
- duplicate_spans at K=10000
- cluster-equivalence check pairs-vs-star at K=400

Run: python tests/skew_drill_dedup.py  (one JSON line per measurement;
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


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
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    victim = docs.orderBy("doc_id").limit(1)
    clones = (
        victim.withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(k)))
        )
        .select(
            (F.lit(10_000_000) + F.col("rep")).alias("doc_id"), "text"
        )
    )
    return docs.unionByName(clones).localCheckpoint(eager=True)


def main():
    spark = get_spark(app_name="skew_drill_dedup", shuffle_partitions=32)
    # warm the plan shapes once on clean data
    base = fixture(spark, 4)
    mat(D.minhash_lsh_pairs(base, num_hashes=96, bands=24, threshold=0.5))
    mat(
        D.minhash_cluster_edges(
            base, num_hashes=96, bands=24, threshold=0.5
        )
    )
    mat(D.duplicate_spans(base, n=8, min_count=2))

    for k in (400, 1200):
        df = fixture(spark, k)
        timed(
            f"minhash_PAIRS_k{k}",
            lambda d=df: mat(
                D.minhash_lsh_pairs(d, num_hashes=96, bands=24, threshold=0.5)
            ),
        )
        timed(
            f"minhash_STAR_k{k}",
            lambda d=df: mat(
                D.minhash_cluster_edges(
                    d, num_hashes=96, bands=24, threshold=0.5
                )
            ),
        )
    # the pairs op is intentionally NOT run at K=10000 (~5*10^7 result
    # pairs per band); star + components and the span gram join are
    df = fixture(spark, 10_000)
    timed(
        "minhash_STAR_k10000",
        lambda: mat(
            D.minhash_cluster_edges(df, num_hashes=96, bands=24, threshold=0.5)
        ),
    )
    timed(
        "star_components_k10000",
        lambda: mat(
            D.connected_components(
                D.minhash_cluster_edges(
                    df, num_hashes=96, bands=24, threshold=0.5
                )
            )
        ),
        reps=1,
    )
    timed(
        "duplicate_spans_k10000",
        lambda: mat(D.duplicate_spans(df, n=8, min_count=2)),
    )

    # cluster equivalence at K=400: components over all verified pairs
    # vs components over verified star edges
    df = fixture(spark, 400)
    pairs = D.minhash_lsh_pairs(df, num_hashes=96, bands=24, threshold=0.5)
    star = D.minhash_cluster_edges(df, num_hashes=96, bands=24, threshold=0.5)
    a = {
        (r["id"], r["cluster"])
        for r in D.connected_components(pairs).collect()
    }
    b = {
        (r["id"], r["cluster"])
        for r in D.connected_components(star).collect()
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
