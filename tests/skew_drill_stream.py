"""Streaming corpus-tail 10x drill (r10): stream_corpus_ingest
throughput at 5k docs (sf0.1 parity) vs 50k docs, with SHARD SIZE HELD
CONSTANT (~625 docs/shard — real corpora grow by adding shards, not by
fattening them), so the 10x run executes 10x the micro-batches
(maxFilesPerTrigger=8 over 8 vs 80 shards → 1 vs 10 triggers). What scales linearly is the
decode+commit work; what must NOT blow up is the per-batch fixed cost
(marker check + atomic commit + quarantine write) and the final
latest-wins read over 10x the commits.

Closed-form checks at both sizes (corrupt plant doc_id%50==13): table
row count, quarantine count, and sum(n_chars) — the 10x run is a
correctness sweep too.

Run: python tests/skew_drill_stream.py   (one JSON line per measurement)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from pyspark.sql import functions as F

from opentick_spark.engine import Engine
from opentick_spark.session import get_spark
from opentick_spark.sources import decode_jsonl_compressed_content
from opentick_spark.streaming.ingest import stream_corpus_ingest

SIZES = [5_000, 50_000]
DOCS_PER_SHARD = 625


def write_shards(src: str, n_docs: int) -> None:
    n_shards = n_docs // DOCS_PER_SHARD
    for s in range(n_shards):
        sink = pa.BufferOutputStream()
        with pa.output_stream(sink, compression="zstd") as out:
            for d in range(s * DOCS_PER_SHARD, (s + 1) * DOCS_PER_SHARD):
                if d % 50 == 13:
                    out.write(f'{{"doc_id": {d}, "lang":\n'.encode())
                else:
                    out.write(
                        f'{{"doc_id": {d}, "lang": "l{d % 5}", '
                        f'"n_chars": {d % 997}}}\n'.encode()
                    )
        with open(f"{src}/part-{s:05d}.jsonl.zst", "wb") as f:
            f.write(sink.getvalue().to_pybytes())


def run_once(spark, n_docs: int) -> float:
    src = tempfile.mkdtemp(prefix="otspark_sdrill_src_")
    write_shards(src, n_docs)
    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_sdrill_wh_"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute(
        "create table docs(doc_id bigint, lang text, n_chars bigint, "
        "primary key(doc_id))"
    )
    st = eng.store("s", "docs")
    quarantine = tempfile.mkdtemp(prefix="otspark_sdrill_q_")
    t0 = time.time()
    q = stream_corpus_ingest(
        spark,
        src,
        lambda files: decode_jsonl_compressed_content(
            files,
            "doc_id long, lang string, n_chars long",
            path_col="_source_path",
        ),
        st,
        tempfile.mkdtemp(prefix="otspark_sdrill_ck_"),
        quarantine_dir=quarantine,
        max_files_per_trigger=8,
    )
    q.awaitTermination()
    elapsed = time.time() - t0
    # closed-form correctness at every size
    row = (
        st.read(spark)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()[0]
    )
    want_n = sum(1 for d in range(n_docs) if d % 50 != 13)
    want_chars = sum(d % 997 for d in range(n_docs) if d % 50 != 13)
    assert row["n"] == want_n, (row, want_n)
    assert row["chars"] == want_chars, (row, want_chars)
    n_quar = spark.read.parquet(f"{quarantine}/batch=*").count()
    assert n_quar == n_docs - want_n, (n_quar, n_docs - want_n)
    shutil.rmtree(src, ignore_errors=True)
    return elapsed


def main():
    spark = get_spark(app_name="skew_drill_stream", shuffle_partitions=32)
    results = {}
    for n in SIZES:
        run_once(spark, n)  # warm plans/JIT once per size
        times = [round(run_once(spark, n), 3) for _ in range(3)]
        results[n] = min(times)
        print(
            json.dumps(
                {
                    "op": f"stream_zst_tail_{n}",
                    "seconds": times,
                    "docs_per_sec": round(n / min(times)),
                    "micro_batches": (n // DOCS_PER_SHARD + 7) // 8,
                }
            ),
            flush=True,
        )
    ratio = (results[SIZES[1]] / results[SIZES[0]]) / (SIZES[1] / SIZES[0])
    print(
        json.dumps(
            {"op": "stream_scaling", "time_ratio_vs_linear": round(ratio, 3)}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
