"""Structured Streaming ingest tests: multi-micro-batch upsert with
colliding PKs (latest file wins) — the reference's out-of-order insert
firehose semantics (test.py:44-61; upsert-by-PK server_test.go:96-99)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from opentick_spark.engine import Engine
from opentick_spark.streaming.ingest import stream_upsert


def test_stream_upsert_latest_wins(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute("create table t(sec int, tm timestamp, px double, primary key(sec, tm))")
    store = eng.store("s", "t")

    src = tmp_path / "src"
    src.mkdir()
    # three files, same PKs, increasing px; distinct mtimes so the file
    # source processes them in order with maxFilesPerTrigger=1-ish batching
    for i, px in enumerate([1.0, 2.0, 3.0]):
        tbl = pa.table(
            {
                "sec": pa.array([1, 1], pa.int32()),
                "tm": pa.array([10, 20], pa.int64()),
                "px": pa.array([px, px * 10], pa.float64()),
            }
        )
        path = src / f"part-{i}.parquet"
        pq.write_table(tbl, str(path))
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = store.spark_schema(with_meta=False)
    q = stream_upsert(
        spark,
        str(src),
        schema,
        store,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    rows = eng.execute_rows("select sec, tm, px from t where sec=1")
    assert rows == [(1, (0, 10), 3.0), (1, (0, 20), 30.0)]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state survives across micro-batches
    and the final totals equal the batch aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentick_spark.streaming.stateful import stateful_running_totals

    src = tmp_path / "src"
    src.mkdir()
    data = {
        0: [(1, 1.0), (1, 2.0), (2, 10.0)],
        1: [(1, 3.0), (2, 20.0)],
        2: [(2, 30.0)],
    }
    for i, rows in data.items():
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        )
        path = src / f"f{i}.parquet"
        pq.write_table(tbl, str(path))
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = "user_id long, value double"
    q = stateful_running_totals(
        spark, str(src), schema, "stateful_sink", str(tmp_path / "ck")
    )
    q.awaitTermination()
    rows = spark.table("stateful_sink").collect()
    # final state per key = row with the highest n
    final = {}
    for r in rows:
        if r.user_id not in final or r.n > final[r.user_id].n:
            final[r.user_id] = r
    assert final[1].n == 3 and final[1].sum_value == 6.0
    assert final[1].min_value == 1.0 and final[1].max_value == 3.0
    assert final[2].n == 3 and final[2].sum_value == 60.0
