"""10x scale drill for ngram_novelty (r14). The claim under test is
the ONE-shingle-pass plan: the fork-point ReusedExchange means 10x
documents cost ~one tokenize→window pass plus two hash aggs — if the
reuse silently regressed (either measured killer: optimizer-stripped
distinct below the fork, or a one-branch inferred isnotnull), the
drill would show it as a near-2x level shift and the plan assert
would fail outright.

Fixture (JVM-side): docs of 100 words drawn from overlapping modular
vocabularies so sources share most 5-grams (novelty concentrates in
the earliest ids — the realistic saturation shape). 50k -> 500k docs
(~4.8M -> 48M gram rows through the fork exchange). Warm-timed,
exponent > 1.3 = failure. Run: python tests/scale_drill_novelty.py
"""

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def docs(spark, n, cache={}):
    # 100 tokens per doc; token stream varies slowly with id so nearby
    # docs overlap heavily (dup-rich corpus, the novelty-relevant case).
    # Materialized to parquet once per size: the real usage path, and
    # the timed reps then measure the operator, not text generation.
    if n not in cache:
        d = tempfile.mkdtemp(prefix="otspark_nov_drill_") + "/docs"
        spark.range(n).selectExpr(
            "id AS doc_id",
            "concat('s', id % 20) AS source",
            "array_join(transform(sequence(0, 99), "
            "  j -> concat('w', (id DIV 50 + j * j) % 4096)), ' ') AS text",
        ).write.mode("overwrite").parquet(d)
        cache[n] = d
    return spark.read.parquet(cache[n])


def timed_warm(fn):
    fn()
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main():
    from opentick_spark.operators.dedup import ngram_novelty
    from opentick_spark.session import get_spark

    spark = get_spark(
        app_name="scale_drill_novelty", shuffle_partitions=64,
        driver_memory="8g",
    )

    # plan contract at drill scale: one Generate, reused fork exchange.
    # NOTE: must execute THIS plan — .count() executes a different
    # wrapped plan and the un-executed AQE plan never shows the reuse
    # (this drill's first two runs failed exactly that way)
    big = ngram_novelty(docs(spark, 500_000), n=5)
    big.collect()
    final = (
        big._jdf.queryExecution().executedPlan().toString()
        .split("+- == Initial Plan ==")[0]
    )
    assert final.count("Generate") == 1, "shingle pipeline ran per-branch"
    assert "ReusedExchange" in final or "ReusedQueryStage" in final
    print(json.dumps({"metric": "plan", "generates": 1, "reused": True}))

    def run(n):
        def fn():
            return ngram_novelty(docs(spark, n), n=5).count()
        return fn

    t1, n1 = timed_warm(run(50_000))
    t10, n10 = timed_warm(run(500_000))
    exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
    print(json.dumps({
        "metric": "scaling", "row": "ngram_novelty_docs_axis",
        "docs_1x": 50_000, "docs_10x": 500_000,
        "t_1x": t1, "t_10x": t10, "exponent": exp,
        "groups_1x": n1, "groups_10x": n10,
    }, separators=(",", ":")), flush=True)
    if exp > 1.3:
        print(json.dumps({"metric": "scaling_verdict",
                          "super_linear": ["ngram_novelty_docs_axis"]}))
        sys.exit(1)


if __name__ == "__main__":
    main()
