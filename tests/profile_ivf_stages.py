"""Stage-level profile of the IVF build/query lifecycle (r15 cont.):
time each phase of build_ivf_index + ivf_topk_indexed in isolation so
an optimization targets the measured cost, not a guess.

Usage: python tests/profile_ivf_stages.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opentick_spark.operators import similarity as S  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.workload.llm import (  # noqa: E402
    _planted_ann_corpus,
    _planted_ann_queries,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_ivf", shuffle_partitions=2 * cpus)
    materialize(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    corpus = _planted_ann_corpus(spark, SF_DIR)
    materialize(corpus)  # memoized fixture built untimed

    t = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    # --- build phases -----------------------------------------------------
    cents = clock(
        "seed_window", lambda: S.seed_centroids(corpus).localCheckpoint(True)
    )
    crows = clock("cent_collect", lambda: S._cent_rows(cents))
    assign = S._assign_to_centroids(corpus, crows, "vec_id", "embedding").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "centroid_id",
    )
    clock("assign_noop", lambda: materialize(assign))
    path = tempfile.mkdtemp(prefix="otspark_profivf_")
    clock(
        "cent_write",
        lambda: cents.write.mode("overwrite").parquet(f"{path}/centroids"),
    )
    clock(
        "lists_write",
        lambda: assign.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/lists"),
    )

    # --- query phases -----------------------------------------------------
    q = _planted_ann_queries(spark)
    materialize(q)
    cents2 = clock(
        "cent_read", lambda: spark.read.parquet(f"{path}/centroids")
    )
    crows2 = clock("cent_collect2", lambda: S._cent_rows(cents2))
    q_probe = S._probe_lists(q, crows2, 2, "vec_id", "embedding").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "centroid_id",
    )
    probed = clock(
        "probe_distinct_collect",
        lambda: [
            r["centroid_id"]
            for r in q_probe.select("centroid_id").distinct().collect()
        ],
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid_id").isin(probed)
    )
    scored = (
        lists.join(F.broadcast(q_probe), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            S.cosine_batch(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    clock(
        "scan_score_topk",
        lambda: materialize(
            scored.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= 10
            )
        ),
    )

    # --- full-row reference timings --------------------------------------
    path2 = tempfile.mkdtemp(prefix="otspark_profivf2_")
    clock("full_build", lambda: S.build_ivf_index(corpus, path2, ncentroids=16))
    clock(
        "full_query",
        lambda: materialize(
            S.ivf_topk_indexed(spark, path2, q, k=10, nprobe=2)
        ),
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path2, ignore_errors=True)
    print("PROFILE", t)
    spark.stop()


if __name__ == "__main__":
    main()
