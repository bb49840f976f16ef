"""Generic interleaved-A/B leg (r15): run ONE registry query in a
fresh process against an arbitrary repo TREE (argv[1]) and print one
JSON line. The orchestrator alternates trees rep-by-rep (min-of-N per
tree) — the established protocol that cancels the documented ambient
box drift.

Usage: python tests/ab_query.py <repo_tree_path> <query> [sf_dir]
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
    t0 = time.time()
    materialize(ALL_QUERIES[QUERY](spark, SF_DIR))
    out = {"tree": TREE, QUERY: round(time.time() - t0, 3)}
    print("ABRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
