"""Interleaved-A/B leg for the merge_delta_1k bench phase (r16): one
fresh process per invocation, 100k-row engine table built and
compacted UNTIMED (exactly the bench's fixture), then min-of-3 timed
1k-row merges (500 updates on existing PKs + 500 inserts) — the
bench's one_merge shape.

Usage: python tests/ab_merge.py <repo_tree_path>
"""

import json
import os
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
sys.path.insert(0, TREE)

from opentick_spark.engine import Engine  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_merge", shuffle_partitions=2 * cpus)
    eng = Engine(spark, tempfile.mkdtemp(prefix="ab_merge_"))
    eng.execute("create database bench")
    eng.use("bench")
    eng.execute(
        "create table test(sec int, interval int, tm timestamp, "
        "open double, high double, low double, close double, v double, "
        "vwap double, primary key(sec, interval, tm))"
    )
    pid = eng.prepare(
        "insert into test(sec, interval, tm, open, high, low, close, "
        "v, vwap) values(?, ?, ?, ?, ?, ?, ?, ?, ?)"
    )
    for b in range(10):
        eng.batch_insert(
            pid,
            [
                (1, 1, b * 10_000 + i, 2.2, 2.4, 2.1, 2.3, 1000000.0, 2.25)
                for i in range(10_000)
            ],
        )
    store = eng.store("bench", "test")
    store.compact(spark, target_partitions=8)

    best = None
    for i in range(3):
        delta = spark.range(1000).selectExpr(
            "CAST(1 AS int) AS sec",
            "CAST(1 AS int) AS interval",
            "CAST((CASE WHEN id < 500 THEN id "
            f"      ELSE 200000 + {i} * 1000 + id END) "
            "      * 1000000000 AS long) AS tm",
            "CAST(9.9 AS double) AS open",
            "CAST(9.9 AS double) AS high",
            "CAST(9.9 AS double) AS low",
            "CAST(9.9 AS double) AS close",
            "CAST(1.0 AS double) AS v",
            "CAST(9.9 AS double) AS vwap",
        )
        t0 = time.time()
        store.merge_into(spark, delta)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print("ABRESULT " + json.dumps({"tree": TREE, "merge_delta_1k": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
