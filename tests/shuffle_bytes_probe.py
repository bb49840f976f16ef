"""Measure total shuffle write bytes for one registry query on one
tree (r16): run the query once on a fresh session, then sum
shuffleWriteBytes over all completed stages from the local UI REST API.
Hard evidence for "shuffle fewer bytes" claims (guide §2.3) that wall
clock on this oscillating box cannot provide.

Usage: python tests/shuffle_bytes_probe.py <tree> <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

TREE = os.path.abspath(sys.argv[1])
QUERY = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
sys.path.insert(0, TREE)

from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.workload import ALL_QUERIES  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="shuffle_probe",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ALL_QUERIES[QUERY](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s.get("status") == "COMPLETE"]
    out = {
        "tree": TREE,
        "query": QUERY,
        "stages": len(done),
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in done),
        "shuffle_write_records": sum(
            s["shuffleWriteRecords"] for s in done
        ),
        "input_bytes": sum(s["inputBytes"] for s in done),
    }
    print("SHUFFLEPROBE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
