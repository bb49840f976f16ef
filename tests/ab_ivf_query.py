"""Interleaved-A/B leg for the ivf_query bench phase (r15 cont.):
fresh process, index built untimed, min-of-3 timed ivf_topk_indexed
probes at the bench configuration.

Usage: python tests/ab_ivf_query.py <repo_tree_path> [sf_dir]
"""

import json
import os
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_ivf_query", shuffle_partitions=2 * cpus)
    from opentick_spark.operators import similarity as S
    from opentick_spark.workload.llm import (
        _planted_ann_corpus,
        _planted_ann_queries,
    )

    corpus = _planted_ann_corpus(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="otspark_abivfq_")
    S.build_ivf_index(corpus, path, ncentroids=16)
    q = _planted_ann_queries(spark)
    materialize(q)

    def rep():
        materialize(S.ivf_topk_indexed(spark, path, q, k=10, nprobe=2))

    rep()  # untimed warm
    best = None
    for _ in range(3):
        t0 = time.time()
        rep()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print("ABRESULT " + json.dumps({"tree": TREE, "ivf_query": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
