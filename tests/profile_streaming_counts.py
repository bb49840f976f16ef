"""Profile the streaming_window_counts bench row (r16, VERDICT r15
item 4): where does the per-rep ~0.5s go?

Runs the exact query shape the bench row runs (windowed_event_counts,
slide=30m, state_partitions=8, availableNow, complete-mode memory
sink) N times in one session and prints, per run:
  - wall seconds
  - number of micro-batches
  - the StreamingQueryProgress durationMs breakdown summed across
    batches (addBatch = the actual data work; everything else is
    streaming fixed cost: offset WAL, commit log, planning, trigger)
  - state store commit time if exposed in stateOperators

Usage: python tests/profile_streaming_counts.py [n_runs] [sf_dir] [n_state]
(n_state = state-store partition count, default 8 = the shipped value)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_STATE = int(sys.argv[3]) if len(sys.argv) > 3 else 8

from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.streaming.ingest import (  # noqa: E402
    state_partitions,
    windowed_event_counts,
)


def main() -> None:
    import pyspark.sql.functions as F  # noqa: F401

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="profile_streaming", shuffle_partitions=2 * cpus
    )
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    for run in range(N_RUNS):
        name = "prof_sink_" + uuid.uuid4().hex[:8]
        ckpt = tempfile.mkdtemp(prefix="otspark_prof_ck_")
        src_dir = tempfile.mkdtemp(prefix="otspark_prof_src_")
        os.symlink(
            os.path.abspath(f"{SF_DIR}/events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        t0 = time.time()
        with state_partitions(spark, N_STATE):
            query = windowed_event_counts(
                spark, src_dir, schema, name, ckpt, slide="30 minutes"
            )
            query.awaitTermination()
        wall = time.time() - t0
        prog = [json.loads(p.json) for p in query.recentProgress]
        dur: dict[str, int] = {}
        state = {"commitMs": 0, "rowsTotal": 0, "memBytes": 0}
        for p in prog:
            for k, v in p.get("durationMs", {}).items():
                dur[k] = dur.get(k, 0) + v
            for so in p.get("stateOperators", []):
                state["commitMs"] += so.get("commitTimeMs", 0)
                state["rowsTotal"] = max(
                    state["rowsTotal"], so.get("numRowsTotal", 0)
                )
                state["memBytes"] = max(
                    state["memBytes"], so.get("memoryUsedBytes", 0)
                )
        print(
            "STREAMPROF "
            + json.dumps(
                {
                    "run": run,
                    "wall_s": round(wall, 3),
                    "n_batches": len(prog),
                    "durationMs": dur,
                    "state": state,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
