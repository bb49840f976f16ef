"""line_dedup hot-line skew drill (r15, VERDICT r14 item 3 'Done'
criterion): a boilerplate line carried by 60% of all documents — the
exact production shape the operator exists for (cookie banners, nav
bars) and the hot-key case for its count-over-window design.

The hot line's occurrences co-locate in ONE window partition (narrow
(id, pos, line) rows — one per occurrence, never whole documents), so
the exposure is a linear sorted count over those rows: the same class
as the groupBy/join it replaces, and the same accepted exposure as
chunk_dedup/duplicate_spans (r14 record). The drill measures:

- base corpus (no hot line) vs 60%-hot corpus at the same doc count —
  the hot-partition surcharge;
- 10x docs, both shapes — the scaling exponent with and without skew;
- max-task share of the window stage via per-partition row counts of
  the line-keyed exchange (a funnel reads ~0.6, healthy reads ~1/P on
  the doc-holding partitions).

Fixture: synthetic multi-line docs (7 lines each, mostly unique lines
with a shared-header pool), parquet-materialized so the scan is real.

Run: python tests/skew_drill_linededup.py   (one JSON line per row;
numbers land in PLANS.md)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opentick_spark.operators.dedup import line_dedup  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def build(spark, n_docs: int, hot: bool, path: str):
    """7-line docs: line 0 is the 60%-hot banner when ``hot`` (same
    literal line for 60% of docs), lines 1-6 mix per-doc-unique lines
    with a small shared pool (so the non-hot window partitions carry
    realistic duplicate traffic too)."""
    hot_line = (
        "CASE WHEN id % 5 < 3 THEN 'accept our cookies to continue' "
        "ELSE concat('intro ', id) END"
        if hot
        else "concat('intro ', id)"
    )
    df = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        f"concat_ws(chr(10), {hot_line}, "
        "concat('body one of doc ', id), "
        "concat('pool line ', id % 97), "
        "concat('body two of doc ', id), "
        "concat('pool line ', (id + 13) % 89), "
        "concat('body three of doc ', id), "
        "concat('sig ', id % 31)) AS text",
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def timed(label, thunk, reps=2):
    times = []
    for _ in range(reps):
        t0 = time.time()
        thunk()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"row": label, "seconds": times}), flush=True)
    return min(times)


def max_task_share(df_docs):
    """Row share of the biggest partition of the line-keyed exchange
    (reconstructed with the operator's key expression + Spark's
    hash partitioning)."""
    lines = df_docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias(
            "__pos", "__line"
        ),
    )
    # r16: mirror the operator's CURRENT key expression — the two-seed
    # xxhash64 pair (dedup.line_dedup keys its window on __k1/__k2
    # since the hash-pair change; the old 'L'+line / 'B'-namespaced
    # string key no longer exists, so measuring it would histogram an
    # exchange the operator never performs)
    exempt = F.trim(F.col("__line")) == ""

    def _key(seed_cols):
        return F.when(
            exempt,
            F.xxhash64(*seed_cols, F.lit("B"), F.col("id"), F.col("__pos")),
        ).otherwise(F.xxhash64(*seed_cols, F.lit("L"), F.col("__line")))

    keyed = lines.withColumn("__k1", _key([])).withColumn(
        "__k2", _key([F.lit(0x9E3779B9)])
    )
    parts = (
        keyed.repartition(64, "__k1", "__k2")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in parts)
    return round(max(r["count"] for r in parts) / total, 3)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="skew_drill_linededup", shuffle_partitions=2 * cpus
    )
    base_dir = tempfile.mkdtemp(prefix="otspark_linedrill_")
    n = int(os.environ.get("LINEDRILL_DOCS", "200000"))

    results = {}
    for docs_n, tag in ((n, "1x"), (10 * n, "10x")):
        for hot in (False, True):
            label = f"{tag}_{'hot60' if hot else 'nohot'}"
            d = build(
                spark, docs_n, hot, f"{base_dir}/{label}"
            )
            results[label] = timed(
                label, lambda d=d: mat(line_dedup(d, min_docs=2))
            )
    share = max_task_share(
        spark.read.parquet(f"{base_dir}/10x_hot60")
    )
    exp_nohot = (
        __import__("math").log(results["10x_nohot"] / results["1x_nohot"])
        / __import__("math").log(10)
    )
    exp_hot = (
        __import__("math").log(results["10x_hot60"] / results["1x_hot60"])
        / __import__("math").log(10)
    )
    print(
        json.dumps(
            {
                "docs_base": n,
                "hot_surcharge_1x": round(
                    results["1x_hot60"] / results["1x_nohot"], 3
                ),
                "hot_surcharge_10x": round(
                    results["10x_hot60"] / results["10x_nohot"], 3
                ),
                "exponent_nohot": round(exp_nohot, 3),
                "exponent_hot60": round(exp_hot, 3),
                "max_task_share_hot_10x": share,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
