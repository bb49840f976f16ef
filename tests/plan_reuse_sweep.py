"""Registry-wide fork-reuse audit (r14). ngram_novelty's build found
that a DataFrame forked into two consumers silently RECOMPUTES its
whole upstream pipeline unless the subtrees canonicalize equal at an
exchange — and that two innocuous-looking things (an optimizer-stripped
distinct, a one-branch inferred isnotnull) break that equality with no
warning. This sweep asks: which OTHER registry entries execute with
duplicated expensive subtrees?

Method: execute every registry query at sf0.01, read the FINAL
executed AQE plan (the only place reuse is visible), and report
per-entry counts of the expensive node kinds (Generate, Window, Sort,
HashAggregate, Exchange, ReusedExchange, parquet scans per table).
Entries where the same table is scanned N>1 times with zero reuse, or
where Generate/Window chains repeat, are candidates — to be judged by
hand (some are legitimately multi-pass: self-joins, union legs,
deliberate recompute-over-cache decisions).

Output: one JSON line per suspicious entry + a summary line.
Run: python tests/plan_reuse_sweep.py [name ...]
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from opentick_spark.session import get_spark
    from opentick_spark import workload as w

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan_reuse_sweep", shuffle_partitions=32)

    suspicious = []
    for name in sorted(w.ALL_QUERIES):
        if only and name not in only:
            continue
        try:
            df = w.ALL_QUERIES[name](spark, sf_dir)
            df.collect()
            full = df._jdf.queryExecution().executedPlan().toString()
            final = full.split("+- == Initial Plan ==")[0]
        except Exception as e:  # noqa: BLE001 - sweep must not die per-entry
            print(json.dumps({"entry": name, "error": str(e)[:120]}))
            continue
        gen = final.count("Generate ")
        win = len(re.findall(r"\bWindow \[", final))
        reused = final.count("ReusedExchange") + final.count("ReusedQueryStage")
        scans = re.findall(r"Scan parquet[^\[]*\[([a-z_#0-9L,]*)", final)
        # per-table scan multiplicity by first column signature
        from collections import Counter
        scan_counts = Counter(
            re.sub(r"#\d+L?", "", s.split(",")[0]) for s in scans
        )
        dup_scans = {k: v for k, v in scan_counts.items() if v > 1}
        flag = (gen > 1) or (win > 2) or (dup_scans and reused == 0 and win + gen > 0)
        rec = {
            "entry": name, "generate": gen, "window": win,
            "reused": reused, "dup_scans": dup_scans,
        }
        if flag:
            suspicious.append(rec)
            print(json.dumps(rec, separators=(",", ":")), flush=True)
    print(json.dumps({
        "metric": "plan_reuse_sweep",
        "flagged": len(suspicious),
        "entries": [r["entry"] for r in suspicious],
    }))


if __name__ == "__main__":
    main()
