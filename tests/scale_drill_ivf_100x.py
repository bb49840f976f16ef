"""100x scale drill for the r15 IVF routing rewrite (r16, VERDICT r15
item 5: the round's biggest structural change — matrix-argmax routing
replacing crossJoin+window everywhere — had only sf0.1 evidence).
Novelty-drill protocol: 24g driver, parquet-materialized tiers,
warm-timed phases, per-decade exponents, skew + plan contracts at 100x.

Fixture: 16 well-separated deterministic clusters, dim 64 float32,
cluster = vec_id % 16 with per-vector jitter — seed_centroids (min-id
per id%16 stripe) lands one seed inside each cluster, so routing is
content-driven and ~uniform (the healthy-index shape; the hot-list
skew shape is skew_drill territory).

Per tier (2e4 / 2e5 / 2e6 vectors — 1x matches the sf0.1 planted ANN
corpus scale):
- build:  build_ivf_index on the EVEN-id half (route + partitioned
          write), fresh path, warm-timed (2nd run into a fresh dir);
- append: ivf_index_append of the ODD half onto the built index,
          warm-timed (2nd append onto a fresh copy of the built index);
- query:  ivf_topk_indexed, 8 query vectors, k=10, nprobe=2,
          warm-timed noop materialization;
- contracts at 100x: max centroid-list row share (the centroid_id
  write funnel — healthy reads ~1/ncentroids of the routed half),
  and the EXECUTED query plan must show the probed-ids partition
  filter with pruned file counts (partition-pruned read).

Exponents: log10(t_10x/t_1x), log10(t_100x/t_10x) per phase;
super-linear (>1.0 past noise) = drill failure.

Run: python tests/scale_drill_ivf_100x.py   (one JSON line per row)
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64
NCENT = 16


def corpus_path(spark, n, cache={}):
    if n not in cache:
        d = tempfile.mkdtemp(prefix="otspark_ivf100_") + "/corpus"
        spark.range(0, n, 1, 64).selectExpr(
            "id AS vec_id",
            f"transform(sequence(0, {DIM - 1}), j -> cast("
            f"  sin((id % {NCENT}) * 97 + j * 13)"
            f"  + 0.05 * sin(id * 7 + j * 3) as float)) AS embedding",
        ).write.mode("overwrite").parquet(d)
        cache[n] = d
    return cache[n]


def queries_df(spark):
    # 8 query vectors, one per even cluster — probe shape matches the
    # bench's planted-ANN query batch
    return spark.range(0, 8, 1, 1).selectExpr(
        "cast(10000000 + id AS long) AS vec_id",
        f"transform(sequence(0, {DIM - 1}), j -> cast("
        f"  sin((id * 2) * 97 + j * 13) as float)) AS embedding",
    )


def main() -> None:
    from opentick_spark.operators import similarity as S
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="scale_drill_ivf_100x",
        shuffle_partitions=128,
        driver_memory="24g",
    )
    qdf = queries_df(spark)
    tiers = [20_000, 200_000, 2_000_000]
    t_build: dict[int, float] = {}
    t_append: dict[int, float] = {}
    t_query: dict[int, float] = {}
    last_index = None
    for n in tiers:
        cp = corpus_path(spark, n)
        corpus = spark.read.parquet(cp)
        even = corpus.filter(F.col("vec_id") % 2 == 0)
        odd = corpus.filter(F.col("vec_id") % 2 == 1)

        # --- build (warm: first build thrown away) ---
        for rep in range(2):
            path = tempfile.mkdtemp(prefix=f"otspark_ivfidx_{n}_")
            t0 = time.time()
            S.build_ivf_index(even, path, ncentroids=NCENT)
            dt = time.time() - t0
        t_build[n] = round(dt, 3)

        # --- append (warm: append onto a fresh copy both reps) ---
        for rep in range(2):
            apath = tempfile.mkdtemp(prefix=f"otspark_ivfapp_{n}_") + "/ix"
            shutil.copytree(path, apath)
            t0 = time.time()
            S.ivf_index_append(spark, odd, apath)
            dt = time.time() - t0
        t_append[n] = round(dt, 3)

        # --- query (warm-timed noop materialization) ---
        def run_q():
            out = S.ivf_topk_indexed(spark, apath, qdf, k=10, nprobe=2)
            out.write.mode("overwrite").format("noop").save()
            return out

        run_q()
        t0 = time.time()
        out = run_q()
        t_query[n] = round(time.time() - t0, 3)
        last_index = apath

        print(
            json.dumps(
                {
                    "metric": "tier",
                    "vectors": n,
                    "build_s": t_build[n],
                    "append_s": t_append[n],
                    "query_s": t_query[n],
                },
                separators=(",", ":"),
            ),
            flush=True,
        )

    def expo(t: dict[int, float]) -> dict[str, float]:
        return {
            "exp_1x_10x": round(math.log10(t[tiers[1]] / t[tiers[0]]), 2),
            "exp_10x_100x": round(math.log10(t[tiers[2]] / t[tiers[1]]), 2),
            "exp_composite": round(
                math.log10(t[tiers[2]] / t[tiers[0]]) / 2, 2
            ),
        }

    # --- contracts at 100x ---
    lists = spark.read.parquet(f"{last_index}/lists")
    per_list = {
        int(r["centroid_id"]): r["n"]
        for r in lists.groupBy("centroid_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    total = sum(per_list.values())
    max_share = round(max(per_list.values()) / total, 4)

    out = S.ivf_topk_indexed(spark, last_index, qdf, k=10, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    has_pf = "PartitionFilters: [centroid_id" in plan or (
        "centroid_id#" in plan and "isin" in plan.lower()
    )
    all_files = len(glob.glob(f"{last_index}/lists/centroid_id=*/*.parquet"))
    print(
        json.dumps(
            {
                "metric": "drill_summary",
                "build": expo(t_build),
                "append": expo(t_append),
                "query": expo(t_query),
                "max_list_share_100x": max_share,
                "n_lists": len(per_list),
                "total_rows_100x": total,
                "partition_filter_in_executed_plan": bool(has_pf),
                "total_list_files_100x": all_files,
                "super_linear": any(
                    e["exp_10x_100x"] > 1.05
                    for e in (expo(t_build), expo(t_append), expo(t_query))
                ),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    # the partition-filter line itself, for PLANS.md
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            print("PLANLINE " + line.strip()[:300], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
