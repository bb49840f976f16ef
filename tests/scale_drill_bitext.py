"""10x scale drill for margin_bitext_pairs(strategy="ivf") — VERDICT
r12 item 1's done-criterion: the IVF candidate generator must hold a
sane scaling exponent at 10x with NO BroadcastNestedLoopJoin in the
plan (the exact path is an |S|x|T| broadcast cross by design and is
only timed at 1x for the contrast ratio).

Fixture: deterministic JVM-side vectors (16-dim sin lattice — no
Python in the data generator). Candidate work is
|S| x nprobe x (|T| / ncentroids), so the drill scales two honest
axes:

- corpus axis (the 100 TB axis): source seed set FIXED at 2k, target
  corpus 20k -> 200k, ncentroids fixed — work grows exactly 10x.
- both axes: (2k x 20k, C=64) -> (20k x 200k, C=640) — ncentroids
  scales with the corpus (constant list size, the IVF operating
  regime), so candidate work again grows 10x. Holding C fixed while
  BOTH sides grow 10x would be a mis-sized index (100x candidates —
  the first run of this drill OOMed exactly that way; recorded here
  as the sizing rule).

The exact cross at the 10x scale would be 4e9 cosine evaluations vs
~25M IVF candidates. Warm-timed, exponent = log10(t10/t1), > 1.3 =
failure, one JSON line per row. Run: python tests/scale_drill_bitext.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vectors(spark, n, id0=0):
    return spark.range(n).selectExpr(
        f"id + {id0} AS vec_id",
        # +1: id 0 would otherwise be the all-zero vector (undefined cosine)
        "transform(sequence(0, 15), a -> "
        f"CAST(sin((id + {id0} + 1) * (a + 1) * 0.7) AS FLOAT)) AS embedding",
    )


def timed_warm(fn):
    fn()
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main():
    from opentick_spark.operators.similarity import margin_bitext_pairs
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="scale_drill_bitext", shuffle_partitions=64,
        # the both-axes row checkpoints 2x ~25M candidate rows; 8g
        # GC-thrashes (recorded), 24g is comfortable on this box
        driver_memory="24g",
    )

    def run(n_src, n_tgt, strategy, ncentroids=64):
        src = vectors(spark, n_src)
        tgt = vectors(spark, n_tgt, id0=10_000_000)

        def fn():
            return margin_bitext_pairs(
                src, tgt, k=4, threshold=1.0, strategy=strategy,
                ncentroids=ncentroids, nprobe=4,
            ).count()

        return fn

    # plan contract at drill scale: no nested-loop anywhere in the plan
    big = margin_bitext_pairs(
        vectors(spark, 20_000), vectors(spark, 200_000, id0=10_000_000),
        k=4, threshold=1.0, strategy="ivf", ncentroids=640, nprobe=4,
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, "BNLJ leaked into IVF path"
    assert "CartesianProduct" not in plan
    print(json.dumps({"metric": "plan", "bnlj": 0, "cartesian": 0}))

    t_exact, n_exact = timed_warm(run(2_000, 20_000, "exact"))
    t1, n1 = timed_warm(run(2_000, 20_000, "ivf"))
    failures = []
    for row, t10_fn in (
        ("bitext_ivf_corpus_axis", run(2_000, 200_000, "ivf")),
        ("bitext_ivf_both_axes", run(20_000, 200_000, "ivf", ncentroids=640)),
    ):
        t10, n10 = timed_warm(t10_fn)
        exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
        print(
            json.dumps(
                {
                    "metric": "scaling", "row": row,
                    "t_exact_1x": t_exact, "pairs_exact_1x": n_exact,
                    "t_1x": t1, "t_10x": t10, "exponent": exp,
                    "pairs_1x": n1, "pairs_10x": n10,
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
        if exp > 1.3:
            failures.append(row)
    if failures:
        print(json.dumps({"metric": "scaling_verdict", "super_linear": failures}))
        sys.exit(1)


if __name__ == "__main__":
    main()
