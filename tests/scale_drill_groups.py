"""Many-groups drill for the grouped two-level CDF — VERDICT r13
item 1's done-criterion: `exact_percentiles_by` through ≥1M groups
with FLAT memory and NO driver broadcast of the |groups|×n_buckets
offsets relation (pre-r14, prefix_sum.py carried an unconditional
`F.broadcast(offsets)` hint — at 1M groups that is a driver-built
broadcast of up to 64M rows, the exact scale killer the primitive
exists to remove; r14 drops the hint when grouped and lets AQE decide).

Fixture (JVM-side, no Python in the generator): rows//20 groups of
~20 values each; EVEN groups occupy a narrow slice of the global
range (value = grp*1000 + i — the r13 ADVICE skew case that global
bounds collapsed into one bucket), ODD groups span a wide shared
domain. Axes:

- groups axis (the realistic 100 TB shape — per-URL-domain length
  percentiles on a crawl): 100k groups / 2M rows → 1M groups / 20M
  rows, 10× work, expect exponent ≈ 1 (the work is one hash agg +
  histogram-sized joins; nothing should be super-linear).

Runtime plan contract at the 1M-group scale: no BroadcastExchange
anywhere under the offsets/bounds joins (AQE must pick a shuffle
join for the group-scaled relations; the only legal broadcasts are
the tiny q-table probe). Driver heap is pinned LOW (4g) on purpose —
the old unconditional broadcast dies here, flat memory passes.
Warm-timed, exponent > 1.3 = failure, one JSON line per row.
Run: python tests/scale_drill_groups.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture(spark, n_groups):
    # ~20 rows per group; even groups narrow-slice, odd groups global
    return spark.range(n_groups * 20).selectExpr(
        f"id % {n_groups}L AS grp",
        f"CASE WHEN (id % {n_groups}L) % 2 = 0 "
        f"THEN (id % {n_groups}L) * 1000L + (id DIV {n_groups}L) "
        f"ELSE (id * 2654435761L) % 1000000007L END AS v",
    )


def timed_warm(fn):
    fn()
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main():
    from opentick_spark.operators.selection import exact_percentiles_by
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="scale_drill_groups", shuffle_partitions=64,
        # deliberately small: the pre-r14 unconditional offsets
        # broadcast (|groups| x n_buckets driver-side rows) cannot
        # survive 1M groups here; the adaptive path must
        driver_memory="4g",
    )

    def run(n_groups):
        df = fixture(spark, n_groups)

        def fn():
            return exact_percentiles_by(df, "v", "grp").count()

        return fn

    # runtime plan contract at 1M groups: the group-scaled CDF joins
    # (bounds, offsets, totals) must NOT be driver broadcasts; the only
    # broadcast allowed is the 5-row q-table probe
    big = exact_percentiles_by(fixture(spark, 1_000_000), "v", "grp")
    big.count()
    plan = big._jdf.queryExecution().executedPlan().toString()
    n_bcast = plan.count("BroadcastExchange")
    assert n_bcast <= 1, f"group-scaled relation broadcast ({n_bcast} found)"
    print(json.dumps({"metric": "plan", "broadcast_exchanges": n_bcast,
                      "note": "only the 5-row q-table probe may broadcast"}))

    t1, n1 = timed_warm(run(100_000))
    t10, n10 = timed_warm(run(1_000_000))
    exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
    print(
        json.dumps(
            {
                "metric": "scaling", "row": "percentiles_by_groups_axis",
                "groups_1x": 100_000, "groups_10x": 1_000_000,
                "t_1x": t1, "t_10x": t10, "exponent": exp,
                "rows_out_1x": n1, "rows_out_10x": n10,
                "driver_memory": "4g",
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    if exp > 1.3:
        print(json.dumps({"metric": "scaling_verdict",
                          "super_linear": ["percentiles_by_groups_axis"]}))
        sys.exit(1)


if __name__ == "__main__":
    main()
