"""Subprocess helper for tests/test_compaction_recovery.py: run a real
``TableStore.compact`` but SIGKILL ourselves at a named point inside the
publish window, leaving the exact on-disk state a production crash
would. Usage: _compact_killer.py <warehouse> <db> <table> <kill_at>

kill_at == "between-renames": die after rename(base -> base.old) and
before rename(tmp -> base) — the worst state (no base directory at all).
"""

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.catalog import Catalog  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.table import TableStore  # noqa: E402


def main() -> None:
    warehouse, db, tbl, kill_at = sys.argv[1:5]
    store = TableStore(Catalog(warehouse), db, tbl)
    assert kill_at == "between-renames", kill_at
    real_rename = os.rename

    def patched(src, dst, *a, **k):
        real_rename(src, dst, *a, **k)
        if src == store.base_path and dst == store.base_path + ".old":
            os.kill(os.getpid(), signal.SIGKILL)

    os.rename = patched
    spark = get_spark(app_name="compact_killer", shuffle_partitions=2)
    store.compact(spark)
    # unreachable on the kill path; exiting 0 here means the kill hook
    # never fired and the test must fail
    print("COMPACT_FINISHED_WITHOUT_KILL")


if __name__ == "__main__":
    main()
