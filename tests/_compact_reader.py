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

#: per-attempt wall caps: an attempt that straddled a swap can sit in
#: Spark's failure handling for minutes — unbounded doomed attempts
#: are what starved the r6/r7 liveness floor — so a watchdog cancels
#: the attempt's job group and the attempt counts as transient. Two
#: hard-won subtleties (each diagnosed from a real wedge):
#:
#: 1. The cancel must LOOP, not fire once: driver-side planning of the
#:    read under a saturated box can exceed the cap, and a one-shot
#:    cancel that lands while NO job is active is a no-op ("Cannot
#:    find active jobs") — the job that starts a moment later then
#:    runs unbounded (observed: 610 s, killed only by shutdown).
#: 2. The pressure-phase cap must not apply once the parent signals
#:    QUIESCENCE (<stop>.quiesce): the table is settled, every attempt
#:    is healthy, and a 50-row read legitimately took 150 s under four
#:    concurrent Spark JVMs — a tight cap was cancelling reads that
#:    would have succeeded. Quiescent attempts still get a LARGE cap
#:    so a scheduler-wedged job dies and retries instead of starving
#:    the floor forever.
ATTEMPT_CAP_S = 45.0
QUIESCENT_CAP_S = 240.0

_attempt_seq = 0


def _read_bounded(spark, store, cap_s: float):
    """One read attempt with a HARD wall cap, immune to a wedged JVM
    (r7, third iteration — diagnosed from persisted transcripts): the
    attempt runs in its own thread with its own job group; the caller
    waits ``cap_s`` then best-effort-cancels and ABANDONS it. Earlier
    designs cancelled the shared job group from a watchdog while the
    main thread stayed blocked in collect() — and a reader whose JVM
    stops scheduling tasks (observed: a 50-row job alive 605 s with
    its task executing only at shutdown) never returns control to the
    loop at all, starving the liveness floor no matter how the parent
    waits. Abandoned threads are daemonic and die with the process;
    per-attempt group names keep late cancels from hitting later
    attempts. Raises TimeoutError on abandonment (counted transient)."""
    global _attempt_seq
    _attempt_seq += 1
    group = f"reader_attempt_{_attempt_seq}"
    sc = spark.sparkContext
    result: dict = {}

    def run():
        # pinned-thread py4j: properties set here bind to THIS thread's
        # JVM thread, so the job carries our per-attempt group
        sc.setJobGroup(group, "race reader attempt")
        try:
            result["rows"] = store.read(spark).collect()
        except Exception as e:  # surfaced by the caller
            result["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(cap_s)
    if t.is_alive():
        try:
            sc.cancelJobGroup(group)
        except Exception:
            pass
        t.join(10.0)  # grace for the cancel to surface
    if t.is_alive():
        raise TimeoutError(f"attempt abandoned after {cap_s:.0f}s cap")
    if "err" in result:
        raise result["err"]
    return result["rows"]


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
    quiesce_file = stop_file + ".quiesce"

    def write_progress() -> None:
        # after EVERY attempt (success or transient) so the parent can
        # tell "still churning through failure handling" from "hung"
        # and size its quiescent wait accordingly
        try:
            with open(stop_file + ".progress", "w") as f:
                f.write(f"{n_success} {n_transient}")
        except OSError:
            pass

    # liveness heartbeat, independent of attempt duration: an unbounded
    # quiescent-phase attempt can legitimately run for minutes on a
    # saturated box, and the parent must be able to tell "slow but
    # alive" from "wedged". The same thread hastens shutdown: once the
    # parent writes the stop file, cancel the in-flight attempt so the
    # process exits promptly instead of finishing a minutes-long read.
    def heartbeat() -> None:
        while not os.path.exists(stop_file):
            try:
                os.utime(stop_file + ".progress", None)
            except OSError:
                write_progress()
            time.sleep(5)
        try:  # hasten shutdown: everything in this JVM may die now
            spark.sparkContext.cancelAllJobs()
        except Exception:
            pass

    write_progress()
    threading.Thread(target=heartbeat, daemon=True).start()

    while not os.path.exists(stop_file):
        t_a = time.time()
        try:
            cap = (
                QUIESCENT_CAP_S
                if os.path.exists(quiesce_file)
                else ATTEMPT_CAP_S
            )
            rows = _read_bounded(spark, store, cap)
        except Exception as e:
            n_transient += 1
            last_err = f"{type(e).__name__}: {e}"[:200].replace("\n", " ")
            write_progress()
            # timeline on stderr: the parent persists it for post-mortem
            print(
                f"ATTEMPT t={time.time() - t_a:.1f}s transient {last_err}",
                file=sys.stderr,
                flush=True,
            )
            continue
        n_success += 1
        write_progress()
        print(
            f"ATTEMPT t={time.time() - t_a:.1f}s ok rows={len(rows)}",
            file=sys.stderr,
            flush=True,
        )
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
