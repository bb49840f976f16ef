"""Generic interleaved-A/B leg (r15): run ONE registry query in a
fresh process against an arbitrary repo TREE (argv[1]) and print one
JSON line. The orchestrator alternates trees rep-by-rep (min-of-N per
tree) — the established protocol that cancels the documented ambient
box drift.

Usage: python tests/ab_query.py <repo_tree_path> <query> [sf_dir] [reps]

reps (default 1) = in-process min-of-N per leg, the bench's own
timed_reps posture — r16: single-shot legs on short rows are dominated
by first-materialize codegen/warm costs (measured ~7s of fixed cost on
a 2s row), drowning real deltas; min-of-3 matches what the bench row
actually reports.
"""

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
QUERY = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.workload import ALL_QUERIES  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_query", shuffle_partitions=2 * cpus)
    # untimed warm-up so JVM/codegen/noop-sink startup isn't attributed
    # to the timed row
    materialize(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    best = None
    for _ in range(reps):
        t0 = time.time()
        materialize(ALL_QUERIES[QUERY](spark, SF_DIR))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out = {"tree": TREE, QUERY: round(best, 3)}
    print("ABRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
