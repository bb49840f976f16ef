"""10x scale drill for the r12 operator additions: CMS build+probe,
bigram PMI, exact percentiles, triangle centrality, prefix-filtered
Jaccard join. Same protocol as scale_drill_selection.py: sf0.1 vs a
synthesized 10x (documents via the replica-suffix recipe; events via
the time-range-extension recipe from scaling_sf1.synth_sf1), warm-timed,
exponent = log10(t10/t1), >1.3 = failure signal.

Caveat recorded per run: the replica synth makes each original doc a
~0.99-Jaccard near-dup of its 9 replicas (the suffix changes only the
tail bigrams), so the prefix-join's OUTPUT grows by design —
5000 originals × C(10,2) clique pairs. Its row therefore also reports
output sizes; the honest signal is pairs/second, not wall-clock alone.

Run: python tests/scale_drill_r12ops.py   (one JSON line per row)
"""

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


from synth_util import synth_documents_10x, synth_events_10x  # noqa: E402


def synth_10x(dst: str) -> None:
    synth_documents_10x(dst)
    synth_events_10x(dst)


def timed_warm(fn):
    fn()
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main():
    from opentick_spark.session import get_spark
    from opentick_spark.workload import ALL_QUERIES

    spark = get_spark(app_name="scale_drill_r12ops", shuffle_partitions=64, driver_memory="8g")

    def run_noop(name, sf_dir):
        def fn():
            ALL_QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        return fn

    sf1 = tempfile.mkdtemp(prefix="otspark_r12ops10x_")
    try:
        synth_10x(sf1)
        results = {}
        rows = [
            "cms_word_freq",
            "bigram_pmi_top",
            "exact_length_percentiles",
            "user_triangle_centrality",
        ]
        for name in rows:
            t1, _ = timed_warm(run_noop(name, SF01))
            t10, _ = timed_warm(run_noop(name, sf1))
            exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
            results[name] = exp
            print(
                json.dumps(
                    {"metric": "scaling", "row": name, "t_1x": t1,
                     "t_10x": t10, "exponent": exp},
                    separators=(",", ":"),
                ),
                flush=True,
            )

        # prefix join: output grows by synth design (replica cliques) —
        # report pairs and pairs/sec alongside the exponent
        from opentick_spark.operators.dedup import prefix_filter_jaccard_pairs
        from opentick_spark.workload.util import load

        def run_pairs(sf_dir):
            def fn():
                return prefix_filter_jaccard_pairs(
                    load(spark, sf_dir, "documents"), n=2, threshold=0.8
                ).count()

            return fn

        t1, n1 = timed_warm(run_pairs(SF01))
        t10, n10 = timed_warm(run_pairs(sf1))
        exp = round(math.log10(max(t10, 1e-3) / max(t1, 1e-3)), 2)
        print(
            json.dumps(
                {"metric": "scaling", "row": "dedup_ppjoin",
                 "t_1x": t1, "t_10x": t10, "exponent": exp,
                 "pairs_1x": n1, "pairs_10x": n10,
                 "pairs_per_s_1x": round(n1 / max(t1, 1e-3), 1),
                 "pairs_per_s_10x": round(n10 / max(t10, 1e-3), 1)},
                separators=(",", ":"),
            ),
            flush=True,
        )
        results["dedup_ppjoin_pairs_per_s"] = (
            0.0 if n10 / max(t10, 1e-3) >= n1 / max(t1, 1e-3) else 9.9
        )

        super_linear = [k for k, v in results.items() if v > 1.3]
        print(
            json.dumps(
                {"metric": "scaling_verdict", "super_linear": super_linear},
                separators=(",", ":"),
            )
        )
        if super_linear:
            sys.exit(1)
    finally:
        shutil.rmtree(sf1, ignore_errors=True)


if __name__ == "__main__":
    main()
