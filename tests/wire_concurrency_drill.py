"""Wire-server concurrency drill (r5): N concurrent TCP clients each
running prepared 10k-row scans against one OpentickServer — measures
how aggregate throughput scales with client parallelism (the
sMaxConcurrency analog: dispatch is a bounded pool over one shared
SparkSession, so per-client latency should degrade sublinearly while
aggregate rows/s climbs).

Run: python tests/wire_concurrency_drill.py   (one JSON line per N)
"""

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.client import connect_tcp
from opentick_spark.server import OpentickServer
from opentick_spark.session import get_spark

ROWS = 50_000
SCAN = 10_000


def main() -> None:
    spark = get_spark(app_name="wire_concurrency", shuffle_partitions=32)
    srv = OpentickServer(
        spark, tempfile.mkdtemp(prefix="otspark_conc_"), protocol="json"
    ).start()
    boot = connect_tcp(srv.host, srv.port)
    boot.execute("create database w")
    boot.use("w")
    boot.execute(
        "create table t(sec int, tm timestamp, px double, primary key(sec, tm))"
    )
    boot.batch_insert(
        "insert into t(sec, tm, px) values(?, ?, ?)",
        [(i % 5, i, 2.5) for i in range(ROWS)],
    )
    boot.execute("select * from t where sec=0 and tm=0")  # warm plan
    boot.close()

    def worker(n_scans, out, idx):
        c = connect_tcp(srv.host, srv.port, db_name="w")
        t0 = time.time()
        for s in range(n_scans):
            rows = c.execute(
                "select * from t where sec=?", [s % 5], timeout=300
            )
            assert len(rows) == SCAN, len(rows)
        out[idx] = time.time() - t0
        c.close()

    for n_clients in (1, 4, 8):
        n_scans = 8 // min(n_clients, 8) + 1  # keep total work comparable
        out = [None] * n_clients
        threads = [
            threading.Thread(target=worker, args=(n_scans, out, i))
            for i in range(n_clients)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        total_rows = n_clients * n_scans * SCAN
        print(
            json.dumps(
                {
                    "clients": n_clients,
                    "scans_per_client": n_scans,
                    "wall_s": round(wall, 2),
                    "rows_per_s": int(total_rows / wall),
                    "per_client_s": [round(x, 2) for x in out],
                }
            ),
            flush=True,
        )
    srv.stop()


if __name__ == "__main__":
    main()
