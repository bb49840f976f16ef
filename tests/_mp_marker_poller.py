"""Subprocess poller for the applied-marker visibility drill: loops
has_applied_marker over every CONFIRMED marker while writers append and
the parent process compacts — the lock-free read path must never
return False for a marker whose commit published (the r10 review race:
compaction GC'ing sidecar-bearing commits before folding their markers
into meta). Prints one VIOLATION line per miss; POLLER_DONE with the
check count on clean exit."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.catalog import Catalog  # noqa: E402
from opentick_spark.table import TableStore  # noqa: E402


def main() -> None:
    warehouse, db, table, confirmed_path, stop_path = sys.argv[1:6]
    store = TableStore(Catalog(warehouse), db, table)
    checks = 0
    violations = 0
    while True:
        done = os.path.exists(stop_path)
        try:
            with open(confirmed_path) as f:
                markers = [ln.strip() for ln in f if ln.strip()]
        except FileNotFoundError:
            markers = []
        for m in markers:
            checks += 1
            if not store.has_applied_marker(m):
                violations += 1
                print(f"VIOLATION {m}", flush=True)
        if done:
            break
        time.sleep(0.01)
    print(f"POLLER_DONE checks={checks} violations={violations}", flush=True)


if __name__ == "__main__":
    main()
