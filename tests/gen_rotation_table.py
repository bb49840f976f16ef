"""Regenerate the rotation-audit table in COVERAGE.md.

The r4 verdict asked for rotation state in one auditable table instead
of docstring changelogs: every registry query → which rounds it sat in
the driver's 50-entry correctness window (and the outcome recorded in
CORRECTNESS_r{N}.json) → how it is verified locally each round. Run
from the repo root after editing ``workload.__init__._DRIVER_WINDOW``:

    python tests/gen_rotation_table.py

It rewrites everything below the ``## Driver-window rotation state``
marker in COVERAGE.md (appending the section if absent).
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Driver-window rotation state"


def main() -> None:
    from opentick_spark.workload import ALL_ORACLES, ALL_QUERIES, QUERIES

    rounds = {}  # name -> {round: status}
    nums = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnum = int(m.group(1))
        nums.append(rnum)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            rounds.setdefault(name, {})[rnum] = "green" if ok else "RED"
    cur = max(nums, default=0) + 1

    lines = [
        MARKER,
        "",
        "Authoritative per-query audit of the 50-entry driver correctness",
        "window (regenerate: `python tests/gen_rotation_table.py`).",
        '"r{N} green" = that round\'s CORRECTNESS_r{N}.json row passed',
        "rows+schema+hash. Every registry query — in or out of the window —",
        "is additionally value-checked against DuckDB by",
        "`tests/oracle_check.py` at sf0.01 (and sf0.1 for the 10× sweep)",
        "each round; as of r7 every registry entry has a DuckDB oracle",
        "(the former rows-only trio gained closed-form/replay oracles).",
        "",
        f"Current window (round {cur}): {len(QUERIES)} entries; "
        f"registry {len(ALL_QUERIES)} queries, {len(ALL_ORACLES)} with "
        "DuckDB oracles.",
        "",
        "| query | driver rounds | in r%d window | local verification |" % cur,
        "|---|---|---|---|",
    ]
    for name in sorted(ALL_QUERIES):
        hist = rounds.get(name, {})
        if hist:
            cell = ", ".join(
                f"r{r} {'green' if s == 'green' else '**RED**'}"
                for r, s in sorted(hist.items())
            )
        else:
            cell = "never"
        in_window = "yes" if name in QUERIES else ""
        local = (
            "oracle_check (DuckDB value-exact)"
            if name in ALL_ORACLES
            else "golden pytest (non-SQL-expressible)"
        )
        lines.append(f"| {name} | {cell} | {in_window} | {local} |")
    lines.append("")

    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        text = f.read()
    if MARKER in text:
        text = text[: text.index(MARKER)].rstrip() + "\n\n" + "\n".join(lines)
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    with open(cov_path, "w") as f:
        f.write(text)
    never = [n for n in ALL_QUERIES if n not in rounds and n not in QUERIES]
    print(f"wrote {len(ALL_QUERIES)} rows to COVERAGE.md")
    print(
        f"never-driver-checked and NOT in current window: {len(never)}"
        + (f" -> {sorted(never)}" if never else "")
    )


if __name__ == "__main__":
    main()
