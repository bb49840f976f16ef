"""Suite-level interleaved fresh-process tree-A/B (r14 VERDICT item 1).

The r14 artifact ran 66.0s vs r13's 51.3s with control rows (untouched
since r10) inflated 1.22-1.43x in lockstep; the judge's next-day run
reproduced 66.4s, so the elevation is persistent box state — but the
attribution rested entirely on control rows because bench.py's
calib_spark_ms probe stayed flat. This closes it at SUITE granularity:
run each tree's OWN full `python bench.py` alternately (fresh process
per run, A B A B ... min-of-N per tree), then compare per-row minima
over every row name the two artifacts share. Alternation cancels box
state; a per-row ratio ~1.0 over the full suite proves the r13->r14
code delta did not cause the artifact drift.

Environment evidence gathered alongside (r15, box idle, load 0.04):
the exact calib_py loop reads 676-771ms vs the r13 artifact's 413-482ms
(1.5-1.7x), with ZERO steal jiffies during the loop and normal memory
bandwidth (~12 GB/s in-place numpy stream) — fixed work takes more
wall time while the guest gets full CPU slices, i.e. the host delivers
fewer instructions/second (turbo loss / sibling contention), invisible
to calib_spark_ms because that probe is overhead+bandwidth dominated.

Usage: python tests/ab_suite_r15.py <treeA> <treeB> [reps=5]
Prints one JSON line: per-row min times per tree + ratio table.
"""

import json
import os
import statistics
import subprocess
import sys
import time


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    wall = time.time() - t0
    rows = {}
    total = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "headline_suite_seconds" in line:
            d = json.loads(line)
            rows = d["queries"]
            total = d["value"]
    if total is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-2000:] + "\n")
        raise RuntimeError(f"no artifact line from {tree}")
    return {"total": total, "wall": round(wall, 1), "rows": rows}


def main():
    tree_a, tree_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    runs = {tree_a: [], tree_b: []}
    for rep in range(reps):
        for tree in (tree_a, tree_b):
            r = run_bench(tree)
            runs[tree].append(r)
            sys.stderr.write(
                f"rep {rep} {os.path.basename(tree)}: total={r['total']} "
                f"wall={r['wall']}\n"
            )
            sys.stderr.flush()

    def min_rows(rs):
        out = {}
        for r in rs:
            for k, v in r["rows"].items():
                out[k] = min(out.get(k, v), v)
        return out

    a_min, b_min = min_rows(runs[tree_a]), min_rows(runs[tree_b])
    common = sorted(set(a_min) & set(b_min))
    ratios = {k: round(b_min[k] / a_min[k], 3) for k in common if a_min[k] > 0}
    med = statistics.median(ratios.values())
    print(
        json.dumps(
            {
                "tree_a": tree_a,
                "tree_b": tree_b,
                "reps": reps,
                "totals_a": [r["total"] for r in runs[tree_a]],
                "totals_b": [r["total"] for r in runs[tree_b]],
                "common_rows": len(common),
                "median_ratio_b_over_a": round(med, 3),
                "ratios": ratios,
                "min_a": {k: a_min[k] for k in common},
                "min_b": {k: b_min[k] for k in common},
            }
        )
    )


if __name__ == "__main__":
    main()
