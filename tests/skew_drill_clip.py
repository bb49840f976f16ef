"""Clip-containment hot frame-hash bucket skew drill (r8, VERDICT r7
item 4): the degenerate corpus the r7 verdict flagged — K re-uploads of
a constant-frame video (black screens, test cards), every frame of
every clone colliding into ONE fhash bucket.

``video_clip_containments`` equi-joins on fhash: the clone cohort emits
(K·F)² alignment rows before coverage counting — quadratic in K,
exactly the pre-star Hamming hot-chunk cliff (and its K(K-1) output
pairs are quadratic too, so the pair-level op is doubly doomed on this
shape). ``video_clip_containment_groups`` collapses identical frame
sequences GLOBALLY first (one groupBy), aligns one representative per
distinct sequence, and returns the group-level relation — linear in
distinct content.

Fixture: sf0.01-sized spread of organic videos (4 frames each, unique
xxhash64 hashes — no organic collisions) + K clones of the all-zero
constant-frame sequence (the worst case: one bucket).

Measures (fresh plans, shared warm 4g session — the pairs op's
(4K)² alignment rows plus the (id_a,id_b,offset,__ia) pre-distinct
hash maps OOM a default 1g heap already at K=1500, which is itself
cliff evidence; 4g lets the drill put a number on it):
- pairs op at K=500, 1500 (expect ~9x time per 3x clones; K=4000 is
  excluded — 2.6e8 alignment rows OOM even the 4g heap — and K=10000
  would be 1.6e9)
- grouped op at K=500, 1500, 4000 AND K=10000 (expect flat)
- pairs-vs-expanded-groups equivalence is pytest-pinned
  (test_video_clip_star_pair_equivalence), not re-measured here

Run: python tests/skew_drill_clip.py  (one JSON line per measurement;
numbers land in PLANS.md)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentick_spark.operators import multimodal as M
from opentick_spark.session import get_spark

N_BASE = 500  # matches the sf0.01 documents corpus size
FRAMES = 4


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, thunk, reps=2):
    times = []
    for _ in range(reps):
        t0 = time.time()
        thunk()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"op": label, "seconds": times}), flush=True)
    return times


def fixture(spark, k):
    base = (
        spark.range(N_BASE)
        .selectExpr(f"explode(sequence(0, {FRAMES - 1})) AS frame_idx", "id")
        .select(
            "id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.xxhash64(F.expr(f"id * {FRAMES} + frame_idx")).alias("fhash"),
        )
    )
    clones = (
        spark.range(10_000_000, 10_000_000 + k)
        .selectExpr(f"explode(sequence(0, {FRAMES - 1})) AS frame_idx", "id")
        .select(
            "id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.lit(0).cast("long").alias("fhash"),
        )
    )
    return base.unionByName(clones).localCheckpoint(eager=True)


def main():
    spark = get_spark(
        app_name="skew_drill_clip",
        shuffle_partitions=32,
        driver_memory="4g",
    )
    # warm the plan shapes once on clean data
    warm = fixture(spark, 4)
    mat(M.video_clip_containments(warm))
    mat(M.video_clip_containment_groups(warm))

    for k in (500, 1500, 4000):
        df = fixture(spark, k)
        if k <= 1500:  # K=4000 OOMs: 2.6e8 alignment rows
            timed(
                f"clip_PAIRS_k{k}",
                lambda d=df: mat(M.video_clip_containments(d)),
            )
        timed(
            f"clip_GROUPS_k{k}",
            lambda d=df: mat(M.video_clip_containment_groups(d)),
        )
    # the pairs op is intentionally NOT run at K=10000 ((4*10k)^2 =
    # 1.6e9 pre-agg alignment rows); the grouped op is
    df = fixture(spark, 10_000)
    timed(
        "clip_GROUPS_k10000",
        lambda: mat(M.video_clip_containment_groups(df)),
    )
    spark.stop()


if __name__ == "__main__":
    main()
