"""100x scale drill for ngram_novelty (r15, VERDICT r14 item 2: every
drill so far is 10x; the bar is 100x posture on a flagship dedup
path). Same fixture family and claims as tests/scale_drill_novelty.py
— ONE shingle pass through the salted fork exchange, exact integer
tallies — taken to 5M docs (~480M gram rows through the fork):

- tiers 50k / 500k / 5M docs (1x / 10x / 100x of the r14 drill base),
  parquet-materialized, warm-timed;
- per-decade exponents (log10 of adjacent-tier ratio) and the
  composite 100x exponent — super-linear break = drill failure;
- max-task row share of the fork exchange layout at 100x (the salted
  (g, hash(id)%16) partitioning — a funnel reads near 1/|grams-hot|,
  healthy reads ~1/P);
- plan contract re-asserted at 100x scale (one Generate, reused
  exchange) on the EXECUTED plan.

Sizing per the r13/r14 notes: 24g driver, clean /tmp, shuffle
partitions 128 for the 100x tier's ~15 GB fork shuffle.

Run: python tests/scale_drill_novelty_100x.py   (one JSON line per
row; numbers land in PLANS.md)
"""

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def docs(spark, n, cache={}):
    if n not in cache:
        d = tempfile.mkdtemp(prefix="otspark_nov100_") + "/docs"
        spark.range(0, n, 1, 64).selectExpr(
            "id AS doc_id",
            "concat('s', id % 20) AS source",
            "array_join(transform(sequence(0, 99), "
            "  j -> concat('w', (id DIV 50 + j * j) % 4096)), ' ') AS text",
        ).write.mode("overwrite").parquet(d)
        cache[n] = d
    return spark.read.parquet(cache[n])


def timed_warm(fn):
    fn()
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main():
    from opentick_spark.operators.dedup import exploded_shingles, ngram_novelty
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="scale_drill_novelty_100x",
        shuffle_partitions=128,
        driver_memory="24g",
    )

    def run(n):
        def fn():
            return ngram_novelty(docs(spark, n), n=5).count()
        return fn

    tiers = [50_000, 500_000, 5_000_000]
    times = {}
    for n in tiers:
        t, groups = timed_warm(run(n))
        times[n] = t
        print(
            json.dumps(
                {"metric": "tier", "docs": n, "seconds": t, "groups": groups},
                separators=(",", ":"),
            ),
            flush=True,
        )

    e_10 = round(math.log10(times[500_000] / times[50_000]), 2)
    e_100 = round(math.log10(times[5_000_000] / times[500_000]), 2)
    e_comp = round(
        math.log10(times[5_000_000] / times[50_000]) / 2, 2
    )

    # plan contract at 100x on the executed plan (the AQE lesson)
    big = ngram_novelty(docs(spark, 5_000_000), n=5)
    big.collect()
    final = (
        big._jdf.queryExecution().executedPlan().toString()
        .split("+- == Initial Plan ==")[0]
    )
    plan_ok = final.count("Generate") == 1 and (
        "ReusedExchange" in final or "ReusedQueryStage" in final
    )

    # fork-layout max-task share at 100x: the operator's exact salted
    # partitioning, row share of the biggest of 128 partitions
    grams = exploded_shingles(
        docs(spark, 5_000_000), "doc_id", "text", n=5, distinct=False
    ).withColumn("__slt", F.pmod(F.hash("id"), F.lit(16)))
    parts = (
        grams.repartition(128, F.col("g"), F.col("__slt"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in parts)
    share = round(max(r["count"] for r in parts) / total, 4)

    print(
        json.dumps(
            {
                "metric": "scaling_100x",
                "row": "ngram_novelty_docs_axis",
                "t_1x": times[50_000],
                "t_10x": times[500_000],
                "t_100x": times[5_000_000],
                "exp_1x_to_10x": e_10,
                "exp_10x_to_100x": e_100,
                "exp_composite": e_comp,
                "plan_one_pass_at_100x": plan_ok,
                "fork_max_task_share_100x": share,
                "gram_rows_100x": total,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    if e_100 > 1.3 or not plan_ok:
        print(json.dumps({"metric": "scaling_verdict", "super_linear": True}))
        sys.exit(1)
    print(json.dumps({"metric": "scaling_verdict", "super_linear": False}))


if __name__ == "__main__":
    main()
