"""Interleaved A/B attribution for the IVF lifecycle composites
(VERDICT r11 item 3): run `sim_topk_ivf_indexed` and
`sim_topk_ivf_append` once in a fresh process against an arbitrary
repo TREE (argv[1]) and print one JSON line. The orchestrator (PLANS
r12 records the invocation) alternates trees rep-by-rep, min-of-5,
rested box — the established protocol for deciding real regression vs
box state across round trees.

Usage: python tests/ab_ivf.py <repo_tree_path> [sf_dir]
"""

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.workload import ALL_QUERIES  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_ivf", shuffle_partitions=2 * cpus)
    out = {"tree": TREE}
    # one untimed warm-up scan so JVM/codegen startup isn't attributed
    # to the first timed row
    materialize(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    for name in ("sim_topk_ivf_indexed", "sim_topk_ivf_append"):
        t0 = time.time()
        materialize(ALL_QUERIES[name](spark, SF_DIR))
        out[name] = round(time.time() - t0, 3)
    print("ABRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
