"""One-off sf1.0 scaling checkpoint (r11, VERDICT r10 item 5).

The dual-SF sweeps pin correctness at sf0.01/sf0.1; this drill runs the
headline families once at a 10x scale-up of sf0.1 ("sf1.0-equivalent")
to expose any O(n^2) or driver-materialization break the 10x operator
drills missed. Two scaling axes, matching what each family actually
scales with:

- **harness axis (row count through the engine/wire)**: batch ingest,
  sync scan-back, and the full TCP wire round trip at 100k vs 1M rows.
  The reference's headline is ingest throughput, so the axis is rows,
  not parquet bytes.
- **data axis (table scale factor)**: documents/embeddings/events
  synthesized at 10x sf0.1 under /tmp (replica-suffixed text so dedup
  structure stays realistic instead of every doc gaining 10 exact
  clones; vec_id/event_id/doc_id remapped unique; event time range
  extended 10x so time-bucketed aggs grow in groups, not group size).
  Rows: the 3 LLM marquee ops (corpus_pipeline, dedup_minhash_lsh,
  sim_topk_bruteforce) + ohlcv_rollup + stats_by_event_type.

Each row is timed warm (one untimed warmup rep per scale — the bench's
steady-state posture) and reported with its scaling exponent
log10(t_10x / t_1x): 1.0 = linear, 0 = flat, >1.3 = superlinear (the
drill's failure signal).

Run: python tests/scaling_sf1.py   (one JSON line per row; ~10 min)
"""

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def synth_sf1(dst: str) -> None:
    """10x sf0.1 under dst: scaled documents/embeddings/events, other
    tables copied verbatim (dims don't scale with fact data)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SF01):
        if f.endswith(".parquet") and f.split(".")[0] not in (
            "documents",
            "embeddings",
            "events",
        ):
            shutil.copy(os.path.join(SF01, f), os.path.join(dst, f))

    docs = pq.read_table(os.path.join(SF01, "documents.parquet")).to_pandas()
    parts = []
    for r in range(10):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 10_000_000
        if r > 0:
            # replica suffix: keeps near-dup structure realistic (each
            # original doc gains 9 NEAR duplicates, not exact clones)
            d["text"] = d["text"] + f" replica{r}"
            d["n_chars"] = d["text"].str.len()
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SF01, "embeddings.parquet")).to_pandas()
    parts = []
    for r in range(10):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * 10_000_000
        parts.append(e)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )

    ev = pq.read_table(os.path.join(SF01, "events.parquet")).to_pandas()
    span = (ev["ts"].max() - ev["ts"].min()) + pd.Timedelta(hours=1)
    parts = []
    for r in range(10):
        e = ev.copy()
        e["event_id"] = e["event_id"] + r * 100_000_000
        e["ts"] = e["ts"] + r * span  # 10x the time range, same density
        parts.append(e)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )


def timed_warm(fn) -> float:
    """One untimed warmup (codegen/broadcast compile), then the timed
    steady-state rep — the bench suite's posture."""
    fn()
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def bench_harness_rows(spark, n_rows: int) -> dict:
    """Engine batch ingest of n_rows, sync scan-back, and the wire
    (BSON TCP) round trip at the same scale."""
    from opentick_spark import client as otc
    from opentick_spark.engine import Engine

    out = {}
    eng_wh = tempfile.mkdtemp(prefix="otspark_scale_")
    eng = Engine(spark, eng_wh)
    eng.execute("create database b")
    eng.use("b")
    eng.execute(
        "create table test(sec int, interval int, tm timestamp, open double,"
        " high double, low double, close double, v double, vwap double,"
        " primary key(sec, interval, tm))"
    )
    pid = eng.prepare(
        "insert into test(sec, interval, tm, open, high, low, close, v, "
        "vwap) values(?, ?, ?, ?, ?, ?, ?, ?, ?)"
    )
    t0 = time.time()
    for b in range(n_rows // 10_000):
        eng.batch_insert(
            pid,
            [
                (1, 1, b * 10_000 + i, 2.2, 2.4, 2.1, 2.3, 1e6, 2.25)
                for i in range(10_000)
            ],
        )
    out["ingest_batch"] = round(time.time() - t0, 3)
    out["scan_sync"] = timed_warm(
        lambda: eng.execute_rows("select * from test where sec=1")
    )

    import subprocess

    wh = tempfile.mkdtemp(prefix="otspark_scalewire_")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "opentick_spark.server",
            "--addr",
            "127.0.0.1:0",
            "--warehouse",
            wh,
            "--protocol",
            "bson",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        # loop until the ready line (the test_server_cli idiom): stray
        # stdout before it must not crash the drill after the expensive
        # engine-axis run
        while True:
            raw = proc.stdout.readline()
            if not raw:
                raise RuntimeError("server exited before ready line")
            if raw.startswith("OPENTICK_SPARK_LISTENING"):
                parts = raw.split()
                host, port = parts[1], int(parts[2])
                break
        conn = otc.connect_tcp(host, port, protocol="bson")
        conn.execute("create database w")
        conn.use("w")
        conn.execute(
            "create table test(sec int, interval int, tm timestamp, "
            "open double, high double, low double, close double, v double, "
            "vwap double, primary key(sec, interval, tm))"
        )
        rows = [
            (1, 1, i, 2.2, 2.4, 2.1, 2.3, 1e6, 2.25) for i in range(n_rows)
        ]
        ins = (
            "insert into test(sec, interval, tm, open, high, low, close, v, "
            "vwap) values(?, ?, ?, ?, ?, ?, ?, ?, ?)"
        )
        t0 = time.time()
        for off in range(0, n_rows, 10_000):
            conn.batch_insert(ins, rows[off : off + 10_000])
        out["wire_ingest_batch"] = round(time.time() - t0, 3)
        # pipelined twin (r11): same chunks, all in flight, applied in
        # send order — tracks whether overlap holds its exponent edge
        conn.execute(
            "create table test_p(sec int, interval int, tm timestamp, "
            "open double, high double, low double, close double, v double, "
            "vwap double, primary key(sec, interval, tm))"
        )
        ins_p = ins.replace("insert into test(", "insert into test_p(")
        t0 = time.time()
        futs = [
            conn.batch_insert_async(ins_p, rows[off : off + 10_000])
            for off in range(0, n_rows, 10_000)
        ]
        for f in futs:
            f.get(600)
        out["wire_ingest_pipelined"] = round(time.time() - t0, 3)
        conn.execute("select * from test where sec=1", timeout=600)  # warm
        t0 = time.time()
        got = conn.execute("select * from test where sec=1", timeout=600)
        out["wire_scan_warm"] = round(time.time() - t0, 3)
        assert len(got) == n_rows, len(got)
        conn.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(eng_wh, ignore_errors=True)
    return out


def main():
    from opentick_spark.session import get_spark

    spark = get_spark(app_name="scaling_sf1", shuffle_partitions=64)
    sf1 = tempfile.mkdtemp(prefix="otspark_sf1_")
    try:
        _main_inner(spark, sf1)
    finally:
        # the synth dir is ~GB-scale: never leak it, even on a failed run
        shutil.rmtree(sf1, ignore_errors=True)


def _main_inner(spark, sf1: str) -> None:
    from opentick_spark.workload import ALL_QUERIES

    synth_sf1(sf1)

    results = {}

    # --- harness axis: 100k vs 1M rows -------------------------------
    small = bench_harness_rows(spark, 100_000)
    big = bench_harness_rows(spark, 1_000_000)
    for k in small:
        exp = round(math.log10(max(big[k], 1e-3) / max(small[k], 1e-3)), 2)
        results[k] = {"t_1x": small[k], "t_10x": big[k], "exponent": exp}
        print(
            json.dumps(
                {"metric": "scaling", "row": k, **results[k]},
                separators=(",", ":"),
            ),
            flush=True,
        )

    # --- data axis: sf0.1 vs synthesized sf1.0 -----------------------
    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    rows = [
        "corpus_pipeline",
        "dedup_minhash_lsh",
        "sim_topk_bruteforce",
        "ohlcv_rollup",
        "stats_by_event_type",
    ]
    for name in rows:
        fn = ALL_QUERIES[name]
        t_small = timed_warm(lambda: materialize(fn(spark, SF01)))
        t_big = timed_warm(lambda: materialize(fn(spark, sf1)))
        exp = round(math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 2)
        results[name] = {"t_1x": t_small, "t_10x": t_big, "exponent": exp}
        print(
            json.dumps(
                {"metric": "scaling", "row": name, **results[name]},
                separators=(",", ":"),
            ),
            flush=True,
        )

    worst = max(results.items(), key=lambda kv: kv[1]["exponent"])
    super_linear = [k for k, v in results.items() if v["exponent"] > 1.3]
    print(
        json.dumps(
            {
                "metric": "scaling_verdict",
                "worst_row": worst[0],
                "worst_exponent": worst[1]["exponent"],
                "super_linear": super_linear,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
