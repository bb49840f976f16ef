"""Isolated scan_split_10 A/B: bench.py's exact fixture (100k-row bench
table via batch ingest, warmed split plan) timed min-of-5 in a fresh
process against an arbitrary tree. Usage: python ab_split.py <tree>"""
import json
import os
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_spark(app_name="ab_split", shuffle_partitions=64)
    from opentick_spark.engine import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_absplit_"))
    eng.execute("create database bench")
    eng.use("bench")
    eng.execute(
        "create table test(sec int, interval int, tm timestamp, open double, "
        "high double, low double, close double, v double, vwap double, "
        "primary key(sec, interval, tm))"
    )
    pid = eng.prepare(
        "insert into test(sec, interval, tm, open, high, low, close, v, "
        "vwap) values(?, ?, ?, ?, ?, ?, ?, ?, ?)"
    )
    for b in range(10):
        eng.batch_insert(pid, [
            (1, 1, b * 10_000 + i, 2.2, 2.4, 2.1, 2.3, 1e6, 2.25)
            for i in range(10_000)
        ])
    ranges = [(b * 10_000, (b + 1) * 10_000 - 1) for b in range(10)]
    sql = ("select * from test where sec=1 and interval=1 "
           "and tm>=? and tm<=?")
    materialize(eng.execute_split(sql, ranges))  # warm
    times = []
    for _ in range(5):
        t0 = time.time()
        materialize(eng.execute_split(sql, ranges))
        times.append(round(time.time() - t0, 3))
    print("ABRESULT " + json.dumps(
        {"tree": TREE, "scan_split_10": min(times), "spread": sorted(times)}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
