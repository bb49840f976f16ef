"""Interleaved-A/B leg for the bitext_margin_ivf_probe4 bench row (r15
cont.): fresh process, fixture built untimed, min-of-3 timed reps of
the exact bench configuration.

Usage: python tests/ab_bitext.py <repo_tree_path> [sf_dir]
"""

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_bitext", shuffle_partitions=2 * cpus)
    from opentick_spark.operators.similarity import margin_bitext_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bt = embs.join(docs.withColumnRenamed("doc_id", "vec_id"), "vec_id")
    src = bt.filter("lang = 'de'")
    tgt = bt.filter("lang = 'en'")
    materialize(src)
    materialize(tgt)

    def rep():
        materialize(
            margin_bitext_pairs(
                src, tgt, k=4, threshold=1.1,
                strategy="ivf", ncentroids=16, nprobe=4,
            )
        )

    rep()  # untimed plan/codegen warm
    best = None
    for _ in range(3):
        t0 = time.time()
        rep()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(
        "ABRESULT "
        + json.dumps({"tree": TREE, "bitext_margin_ivf_probe4": round(best, 3)})
    )
    spark.stop()


if __name__ == "__main__":
    main()
