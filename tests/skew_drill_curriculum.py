"""Hot-difficulty-value skew drill for the curriculum shard writer —
VERDICT r13 item 6's done-criterion. A curriculum difficulty proxy is
exactly the kind of column that goes degenerate in practice (60% of a
crawl at quality score 0, half a dedup'd corpus at the modal length),
so the writer's scale posture IS its skew posture.

Two physical strategies for materializing shard-partitioned order:

- RANGE (shipped): repartitionByRange(n, shard, value, id) +
  sortWithinPartitions — the id tie-break in the RANGE KEYS lets one
  hot difficulty value split across writer tasks (same shard id, same
  directory; only the task parallelism changes).
- HASH (the naive alternative): repartition(n, "shard") +
  sortWithinPartitions — everything with the hot value hashes to ONE
  task, which also sorts it alone.

Fixture: 60% of rows on one difficulty value, the rest uniform over
100 values; 8 shards. Measured: wall time of the full write at 1x/10x
(recommended path; exponent > 1.3 = failure) plus both strategies'
max-task row share at 10x. Run: python tests/skew_drill_curriculum.py
"""

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture(spark, n):
    hot = int(n * 0.6)
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id < {hot}L THEN 50L "
        f"ELSE (id * 2654435761L) % 100L END AS diff",
        "id % 7 + 1 AS toks",
    )


def main():
    from pyspark.sql import functions as F

    from opentick_spark.session import get_spark
    from opentick_spark.sources import curriculum_order, export_curriculum_shards

    spark = get_spark(
        app_name="skew_drill_curriculum", shuffle_partitions=64,
        driver_memory="8g",
    )

    # ---- occupancy at 10M rows: range vs hash-on-shard ----
    df = fixture(spark, 10_000_000)
    _, ordered = curriculum_order(df, "diff", 8, id_col="doc_id")
    occ_range = [
        r["count"]
        for r in ordered.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    ]
    assigned, _ = curriculum_order(df, "diff", 8, id_col="doc_id")
    hashed = assigned.repartition(8, "shard").sortWithinPartitions(
        "shard", "diff", "doc_id"
    )
    occ_hash = [
        r["count"]
        for r in hashed.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    ]
    tot = sum(occ_range)
    print(json.dumps({
        "metric": "occupancy", "rows": tot, "hot_share": 0.6,
        "range_max_task_share": round(max(occ_range) / tot, 3),
        "hash_max_task_share": round(max(occ_hash) / tot, 3),
    }), flush=True)
    assert max(occ_range) / tot < 0.3, "hot value funneled a range task"

    # ---- full-write scaling, recommended path, 1M -> 10M ----
    def run(n):
        def fn():
            d = tempfile.mkdtemp(prefix="otspark_curr_drill_")
            try:
                m = export_curriculum_shards(
                    fixture(spark, n), d, "diff", 8,
                    id_col="doc_id", tokens_col="toks",
                )
                return m.count()
            finally:
                shutil.rmtree(d, ignore_errors=True)
        return fn

    def timed_warm(fn):
        fn()
        t0 = time.time()
        r = fn()
        return round(time.time() - t0, 3), r

    t1, n1 = timed_warm(run(1_000_000))
    t10, n10 = timed_warm(run(10_000_000))
    exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
    print(json.dumps({
        "metric": "scaling", "row": "curriculum_export_full_write",
        "rows_1x": 1_000_000, "rows_10x": 10_000_000,
        "t_1x": t1, "t_10x": t10, "exponent": exp,
        "shards_1x": n1, "shards_10x": n10,
    }, separators=(",", ":")), flush=True)
    if exp > 1.3:
        print(json.dumps({"metric": "scaling_verdict",
                          "super_linear": ["curriculum_export_full_write"]}))
        sys.exit(1)


if __name__ == "__main__":
    main()
