"""Interleaved A/B attribution for the r12→r13 `exact_length_percentiles`
bench drift the r13 verdict flagged past the ±15% band (item 2:
0.423 → 0.636 s at sf0.1, +50%). Protocol identical to
tests/ab_drift_r13.py: run the row min-of-5 in a fresh process against
an arbitrary repo TREE (argv[1]), print one JSON line; the orchestrator
alternates trees rep-by-rep on a rested box so host drift hits both
trees equally.

The candidate explanation is CODE, not box state: r13 rerouted the
percentile family's CDF through the two-level range-bucketed prefix sum
(operators/prefix_sum.py), which adds a bounds aggregate, a bucket-sums
groupBy, and an offsets join — machinery that wins at unbounded value
domains (the 10× drill measured exponent −0.06) but is pure overhead on
sf0.1's tiny n_chars histogram. This A/B quantifies that small-domain
tax in isolation.

Usage: python tests/ab_percentiles_r14.py <repo_tree_path>
"""

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab_percentiles_r14", shuffle_partitions=2 * cpus
    )
    from opentick_spark.workload import ALL_QUERIES

    fn = ALL_QUERIES["exact_length_percentiles"]
    fn(spark, sf_dir).collect()  # warm the plan shape, untimed
    times = []
    for _ in range(5):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times.append(round(time.time() - t0, 3))
    print(
        "ABRESULT "
        + json.dumps(
            {
                "tree": TREE,
                "exact_length_percentiles": min(times),
                "spread": sorted(times),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
