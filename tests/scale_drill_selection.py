"""10x scale drill for the r11 selection newcomers (VERDICT r11 item 7):
`cdf_buckets` (curriculum_length_buckets) and `deterministic_shards`
(deterministic_shard_assign) at sf0.1 vs a synthesized sf1.0 documents
table — the one recorded-number drill these two were missing (the other
r11 additions have theirs in PLANS).

Both ops are designed to be shuffle-light at 100 TB:

- deterministic_shards: a pure narrow map (md5 of doc_id) — the drill's
  query adds the per-shard verification agg, so expected exponent ~1.0
  (scan-bound) with NO growth in shuffle volume per row beyond the
  64-group agg.
- cdf_buckets: the running-sum window runs on the VALUE HISTOGRAM
  (size = n_chars domain, not corpus), so the corpus-sized work is one
  hash-agg + one broadcast-joined bucket map. Expected exponent ~1.0;
  a superlinear exponent would mean histogram work is scaling with the
  corpus (the NTILE-global-sort failure mode this design avoids).

Replica-suffixed synth (scaling_sf1.synth_sf1's documents recipe):
lengths gain new values (replica suffix changes n_chars) so the
histogram grows too — the honest scaling shape for the CDF path.

Run: python tests/scale_drill_selection.py   (one JSON line per row)
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


from synth_util import synth_documents_10x  # noqa: E402


def timed_warm(fn) -> float:
    fn()
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main():
    from opentick_spark.session import get_spark
    from opentick_spark.workload import ALL_QUERIES

    spark = get_spark(app_name="scale_drill_selection", shuffle_partitions=64, driver_memory="8g")

    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    sf1 = tempfile.mkdtemp(prefix="otspark_sel10x_")
    try:
        synth_documents_10x(sf1)
        results = {}
        for name in ("deterministic_shard_assign", "curriculum_length_buckets"):
            fn = ALL_QUERIES[name]
            t_small = timed_warm(lambda: materialize(fn(spark, SF01)))
            t_big = timed_warm(lambda: materialize(fn(spark, sf1)))
            exp = round(
                math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 2
            )
            results[name] = {"t_1x": t_small, "t_10x": t_big, "exponent": exp}
            print(
                json.dumps(
                    {"metric": "scaling", "row": name, **results[name]},
                    separators=(",", ":"),
                ),
                flush=True,
            )
        super_linear = [k for k, v in results.items() if v["exponent"] > 1.3]
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
