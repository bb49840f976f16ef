"""Hot-key skew drill (VERDICT r3 item 5): measure the skew escape
hatches on a fixture where ONE user owns ~80% of rows, at 10x the bench
scale (events sf0.1 x 10 = 1M rows).

Measures, 3 reps each (fresh plans, shared warm session):
- as-of join, sorted-merge, NO bucketing  (hot key bounds the stage)
- as-of join, sorted-merge, skew_buckets=32 (hot key splits 32 ways)
- as-of join, broadcast-interval strategy  (left keeps partitioning)
- EWMA window op keyed on user_id (unbucketed hot window, for contrast)
- hourly OHLCV rollup (naturally (key, bucket)-partitioned: immune)

Also prints the window-input partition-occupancy histogram: share of
rows landing in the largest hash partition before vs after bucketing —
the deterministic driver of task time for a window sort.

Run: python tests/skew_drill.py   (writes one JSON line per measurement)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentick_spark.operators.asof import asof_join
from opentick_spark.operators.timeseries import ewma, ohlcv_bars
from opentick_spark.session import get_spark
from opentick_spark.workload.util import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_USER = 7
REPL = 10


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, thunk, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        thunk()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"op": label, "seconds": times}), flush=True)
    return times


def main():
    spark = get_spark(app_name="skew_drill", shuffle_partitions=64)
    # workload loader: normalizes events.ts to epoch-nano longs whatever
    # the parquet stores (µs at this sf)
    ev = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").alias("t"), "value"
    )
    # 10x replication with time jitter, then 80% of rows onto one user:
    # deterministic (event_id-keyed), no rand() so reps see identical data
    skewed = (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(REPL - 1))))
        .withColumn("t", F.col("t") + F.col("rep"))
        .withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id", "rep"), F.lit(10)) < 8,
                F.lit(HOT_USER),
            ).otherwise(F.col("user_id")),
        )
        .drop("rep")
    )
    skewed = skewed.localCheckpoint(eager=True)  # fixture, not part of timing
    n = skewed.count()
    hot = skewed.filter(F.col("user_id") == HOT_USER).count()
    print(json.dumps({"fixture_rows": n, "hot_share": round(hot / n, 3)}), flush=True)

    views = skewed.filter(F.col("event_type") == "view")
    purchases = skewed.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t").alias("pt"), F.col("value").alias("pv")
    )

    # partition occupancy of the window input, before/after bucketing:
    # rows per user (the (keys,) partition) vs rows per (user, 32-bucket)
    tot = n + purchases.count()
    top_user = (
        skewed.groupBy("user_id").count().orderBy(F.desc("count")).first()
    )
    bounds = skewed.agg(F.min("t"), F.max("t")).first()
    width = (bounds[1] - bounds[0]) // 32 + 1
    top_bucket = (
        skewed.groupBy("user_id", F.expr(f"(t - {bounds[0]}L) div {width}L"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    print(
        json.dumps(
            {
                "largest_window_partition_share_unbucketed": round(
                    top_user["count"] / tot, 3
                ),
                "largest_window_partition_share_bucketed32": round(
                    top_bucket["count"] / tot, 3
                ),
            }
        ),
        flush=True,
    )

    timed(
        "asof_merge_unbucketed",
        lambda: mat(
            asof_join(views, purchases, ["user_id"], "t", "pt", value_cols=["pv"])
        ),
    )
    timed(
        "asof_merge_skew_buckets_32",
        lambda: mat(
            asof_join(
                views, purchases, ["user_id"], "t", "pt",
                value_cols=["pv"], skew_buckets=32,
            )
        ),
    )
    if os.environ.get("SKEW_DRILL_SLOW"):
        # the degenerate case — kept behind a flag (145 s per rep):
        # hot RIGHT key -> each left row scans every interval of its key
        timed(
            "asof_broadcast_interval_UNBUCKETED",
            lambda: mat(
                asof_join(
                    views, purchases, ["user_id"], "t", "pt",
                    value_cols=["pv"], strategy="broadcast",
                )
            ),
            reps=1,
        )
    timed(
        "asof_broadcast_interval_buckets_1024",
        lambda: mat(
            asof_join(
                views, purchases, ["user_id"], "t", "pt",
                value_cols=["pv"], strategy="broadcast",
                broadcast_buckets=1024,
            )
        ),
    )
    # bucketed broadcast must equal the sorted merge exactly
    m = asof_join(views, purchases, ["user_id"], "t", "pt", value_cols=["pv"])
    bb = asof_join(
        views, purchases, ["user_id"], "t", "pt", value_cols=["pv"],
        strategy="broadcast", broadcast_buckets=1024,
    )
    bdiff = m.exceptAll(bb).count() + bb.exceptAll(m).count()
    print(json.dumps({"broadcast_bucketed_equivalence_diff_rows": bdiff}), flush=True)
    # equivalence spot-check on the hot fixture (bucketed ≡ unbucketed)
    a = asof_join(views, purchases, ["user_id"], "t", "pt", value_cols=["pv"])
    b = asof_join(
        views, purchases, ["user_id"], "t", "pt", value_cols=["pv"], skew_buckets=32
    )
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(json.dumps({"bucketed_equivalence_diff_rows": diff}), flush=True)

    timed(
        "ewma_hot_user_window",
        lambda: mat(ewma(skewed, ["user_id"], "t", "value", alpha=0.2)),
    )
    timed(
        "ewma_skew_buckets_32",
        lambda: mat(
            ewma(skewed, ["user_id"], "t", "value", alpha=0.2, skew_buckets=32)
        ),
    )
    from opentick_spark.operators.timeseries import rolling_zscore

    timed(
        "rolling_zscore_hot_window",
        lambda: mat(rolling_zscore(skewed, ["user_id"], "t", "value")),
    )
    timed(
        "rolling_zscore_skew_buckets_32",
        lambda: mat(
            rolling_zscore(skewed, ["user_id"], "t", "value", skew_buckets=32)
        ),
    )
    timed(
        "ohlcv_hourly_rollup",
        lambda: mat(
            ohlcv_bars(skewed, ["user_id"], "t", "value", bucket_seconds=3600)
        ),
    )


if __name__ == "__main__":
    main()
