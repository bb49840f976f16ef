"""Interleaved A/B attribution for the two r11→r12 bench drifts the
r12 verdict flagged past the ±15% band (item 2): `merge_delta_1k`
(0.877→1.270 s, +45%) and `wire_ingest_pipelined_100k`
(0.493→0.777 s, +58%). Same protocol as tests/ab_ivf.py: run BOTH rows
once in a fresh process against an arbitrary repo TREE (argv[1]), print
one JSON line; the orchestrator alternates trees rep-by-rep (min-of-5,
rested box) so host drift hits both trees equally.

Fixtures replicate bench.py's rows exactly (same schemas, row counts,
delta composition, rep structure) with the surrounding suite stripped —
the suite-position heap state is itself a candidate explanation (the
r11 `_family_break` finding), so the isolated number attributes the
CODE, and a drift that vanishes here but persists in-suite is heap
placement, not the operator.

Usage: python tests/ab_drift_r13.py <repo_tree_path>
"""

import json
import os
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_drift_r13", shuffle_partitions=2 * cpus)
    from opentick_spark.client import connect_tcp
    from opentick_spark.engine import Engine
    from opentick_spark.server import OpentickServer

    out = {"tree": TREE}

    # ---- merge_delta_1k: 100k-row PK-sorted base (untimed), then
    # min-of-5 reps of a fresh 1k delta (500 updates + 500 inserts) ----
    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_ab_"))
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
                (1, 1, b * 10_000 + i, 2.2, 2.4, 2.1, 2.3, 1e6, 2.25)
                for i in range(10_000)
            ],
        )
    store = eng.store("bench", "test")
    store.compact(spark, target_partitions=8)
    times = []
    for i in range(5):
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
        times.append(round(time.time() - t0, 3))
    out["merge_delta_1k"] = min(times)
    out["merge_delta_1k_spread"] = sorted(times)

    # ---- wire_ingest_pipelined_100k (json): 10 x 10k-row batches all
    # in flight, fresh table per rep, min-of-5 ----
    srv = OpentickServer(
        spark, tempfile.mkdtemp(prefix="otspark_ab_wire_"), protocol="json"
    ).start()
    c = connect_tcp("127.0.0.1", srv.port, protocol="json")
    c.execute("create database w")
    c.use("w")
    times = []
    for r in range(5):
        tbl = f"testp{r}"
        c.execute(
            f"create table {tbl}(sec int, interval int, tm timestamp, "
            "open double, high double, low double, close double, v double, "
            "vwap double, primary key(sec, interval, tm))"
        )
        sql = (
            f"insert into {tbl}(sec, interval, tm, open, high, low, close, "
            "v, vwap) values(?, ?, ?, ?, ?, ?, ?, ?, ?)"
        )
        batches = [
            [
                (1, 1, b * 10_000 + i, 2.2, 2.4, 2.1, 2.3, 1e6, 2.25)
                for i in range(10_000)
            ]
            for b in range(10)
        ]
        t0 = time.time()
        futs = [c.batch_insert_async(sql, rows) for rows in batches]
        for f in futs:
            f.get(180)
        times.append(round(time.time() - t0, 3))
    out["wire_ingest_pipelined_100k"] = min(times)
    out["wire_ingest_pipelined_100k_spread"] = sorted(times)
    c.close()
    srv.stop()
    print("ABRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
