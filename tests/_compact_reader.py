"""Subprocess reader for the reader-vs-compaction race test: boots its
own SparkSession (a genuinely separate process — no shared store lock,
no shared JVM) and loops full-table reads while the parent process
appends + compacts. Contract under test (table.py compact() docstring,
the VACUUM-style transient): every SUCCESSFUL read is a consistent
pre- or post-compaction snapshot — all keys present, all values from
ONE generation — and a read racing the swap may FAIL transiently (the
Delta/Iceberg expired-snapshot analog) but must never succeed with
missing or mixed rows.

argv: warehouse db table n_keys stop_file
stdout: one line ``READS <n_success> <n_transient>`` then
``READER_OK`` or ``READER_VIOLATION <detail>``. Progress is also
written to ``<stop_file>.progress`` after every successful read so the
parent can keep compacting until the race has actually been exercised
(a fixed generation count under-runs on a contended box).
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.catalog import Catalog  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.table import TableStore  # noqa: E402

#: per-attempt wall cap: under full-suite load a single attempt that
#: straddled a swap can sit in Spark's failure handling for minutes —
#: unbounded attempts are what starved the r6/r7 liveness floor. A
#: watchdog cancels the attempt's job group instead; the cancelled
#: attempt counts as transient and the NEXT attempt (against a settled
#: table in the quiescent phase) completes fast.
ATTEMPT_CAP_S = 45.0


def _read_bounded(spark, store):
    sc = spark.sparkContext
    sc.setJobGroup("reader_attempt", "race reader attempt",
                   interruptOnCancel=True)
    done = threading.Event()

    def watchdog():
        if not done.wait(ATTEMPT_CAP_S):
            try:
                sc.cancelJobGroup("reader_attempt")
            except Exception:
                pass

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return store.read(spark).collect()
    finally:
        done.set()


def main() -> None:
    warehouse, db, table, n_keys_s, stop_file = sys.argv[1:6]
    n_keys = int(n_keys_s)
    # small core count: the reader only collects 50 rows per read and
    # competes with the parent's 32-thread compaction jobs — fewer task
    # slots means less scheduler contention and faster read turnaround
    spark = get_spark(
        app_name="compact_reader", master="local[4]", shuffle_partitions=4
    )
    store = TableStore(Catalog(warehouse), db, table)  # opened ONCE:
    # per-read re-opens would block on the compactor's file lock and
    # serialize the race away — the transient window only exists for a
    # reader whose store handle predates the swap
    print("READER_READY", flush=True)
    n_success = 0
    n_transient = 0
    last_err = ""
    violation = None
    def write_progress() -> None:
        # after EVERY attempt (success or transient) so the parent can
        # tell "still churning through failure handling" from "hung"
        # and size its quiescent wait accordingly
        try:
            with open(stop_file + ".progress", "w") as f:
                f.write(f"{n_success} {n_transient}")
        except OSError:
            pass

    while not os.path.exists(stop_file):
        try:
            rows = _read_bounded(spark, store)
        except Exception as e:
            n_transient += 1
            last_err = f"{type(e).__name__}: {e}"[:200].replace("\n", " ")
            write_progress()
            continue
        n_success += 1
        write_progress()
        got_keys = sorted(r["a"] for r in rows)
        gens = {r["v"] for r in rows}
        if got_keys != list(range(n_keys)) or len(gens) != 1:
            violation = (
                f"keys={len(got_keys)}/{n_keys} generations={sorted(gens)[:5]}"
            )
            break
        time.sleep(0.01)
    print(f"READS {n_success} {n_transient}", flush=True)
    if last_err:
        print(f"LAST_TRANSIENT {last_err}", flush=True)
    if violation:
        print(f"READER_VIOLATION {violation}", flush=True)
        sys.exit(3)
    print("READER_OK", flush=True)


if __name__ == "__main__":
    main()
