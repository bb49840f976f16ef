"""Interleaved-A/B leg for the ivf_build bench phase (r15 cont.): one
fresh process per invocation, corpus fixture built UNTIMED (memoized,
exactly like bench.py), then min-of-3 timed build_ivf_index calls.

Usage: python tests/ab_ivf_build.py <repo_tree_path> [sf_dir]
"""

import json
import os
import shutil
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from pyspark.sql import functions as F  # noqa: E402

from opentick_spark.operators import similarity as S  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.workload.llm import _planted_ann_corpus  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_ivf_build", shuffle_partitions=2 * cpus)
    corpus = _planted_ann_corpus(spark, SF_DIR)
    even = corpus.filter(F.col("vec_id") % 2 == 0)
    materialize(even)
    # one untimed warm build compiles the plan/codegen path
    warm = tempfile.mkdtemp(prefix="otspark_abivf_w_")
    S.build_ivf_index(even, warm, ncentroids=16)
    shutil.rmtree(warm, ignore_errors=True)
    best = None
    for _ in range(3):
        path = tempfile.mkdtemp(prefix="otspark_abivf_")
        t0 = time.time()
        S.build_ivf_index(even, path, ncentroids=16)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        shutil.rmtree(path, ignore_errors=True)
    print("ABRESULT " + json.dumps({"tree": TREE, "ivf_build": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
