"""EXIF-audit 10x drill (VERDICT r9 item 4, carried from r8 item 6):
the header-only EXIF audit + strip + re-audit pipeline
(image_exif_audit's core) measured at sf0.1 parity (5k docs) and at
10x (50k docs). The pipeline is embarrassingly parallel Python-codec
work over a spread id frame (the _doc_ids lesson: round-robin
repartition ahead of the Python stage), so the expectation is ~linear
scaling in docs/sec — a super-linear blowup would mean a hidden
all-pairs or a single-partition bottleneck.

Also asserts the closed-form plants at BOTH sizes (gps count = N/5,
no-exif count = |{d : d%11==7}|, strip_clean all true) so the 10x run
is a correctness sweep too, not just a stopwatch.

Run: python tests/skew_drill_exif.py   (one JSON line per measurement)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentick_spark.operators import multimodal as M
from opentick_spark.session import get_spark

SIZES = [5_000, 50_000]


def audit(spark, n_docs: int):
    import numpy as np
    import pandas as pd

    ids = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = np.full((8, 8), 40 + d % 50, dtype=np.uint8)
                app1 = (
                    None
                    if d % 11 == 7
                    else M._encode_exif(orientation=1 + d % 8, gps=(d % 5 == 0))
                )
                payloads.append(M._encode_jpeg(img, quality=75, app1=app1))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    jp = ids.mapInPandas(gen, "doc_id long, payload binary").localCheckpoint(
        eager=True
    )
    meta = M.image_exif_meta(jp)
    clean = M.image_exif_meta(M.image_exif_strip(jp), id_col="id").select(
        "id", (~F.col("has_exif")).alias("strip_clean")
    )
    row = (
        meta.join(clean, "id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("has_gps").cast("long")).alias("n_gps"),
            F.sum((~F.col("has_exif")).cast("long")).alias("n_noexif"),
            F.sum(F.col("strip_clean").cast("long")).alias("n_clean"),
        )
        .collect()[0]
    )
    # closed-form plants hold at every size
    assert row["n"] == n_docs, row
    assert row["n_gps"] == sum(
        1 for d in range(n_docs) if d % 5 == 0 and d % 11 != 7
    ), row
    assert row["n_noexif"] == sum(1 for d in range(n_docs) if d % 11 == 7), row
    assert row["n_clean"] == n_docs, row


def main():
    spark = get_spark(app_name="skew_drill_exif", shuffle_partitions=32)
    results = {}
    for n in SIZES:
        audit(spark, n)  # warm plan + JIT once per size
        times = []
        for _ in range(3):
            t0 = time.time()
            audit(spark, n)
            times.append(round(time.time() - t0, 3))
        results[n] = min(times)
        print(
            json.dumps(
                {
                    "op": f"exif_audit_{n}",
                    "seconds": times,
                    "docs_per_sec": round(n / min(times)),
                }
            ),
            flush=True,
        )
    ratio = (results[SIZES[1]] / results[SIZES[0]]) / (SIZES[1] / SIZES[0])
    print(
        json.dumps(
            {"op": "exif_scaling", "time_ratio_vs_linear": round(ratio, 3)}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
