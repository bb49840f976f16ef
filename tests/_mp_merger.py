"""Subprocess merger for the multiprocess MERGE INTO drill: boots its
own SparkSession (a genuinely separate process — separate JVM, flock is
the only shared coordination, same as two real writers on one
warehouse) and runs a sequence of MERGE INTO operations against one
shared table whose PK range OVERLAPS the other merger's.

Per generation g:
- even g: an UPSERT merge (when_matched=update, when_not_matched=
  insert) over the worker's FULL key range — every source row lands,
  so the published commit must contain the complete range (the parent's
  half-merge check);
- odd g: a DELETE merge (when_matched=delete, when_not_matched=None)
  over the worker's keys ≡ worker (mod 3) — only currently-matched keys
  become tombstones, so the commit's keyset legitimately depends on the
  racy pre-state; atomicity is still per-commit (the parent validates
  every observed snapshot against subset-resolution of the final log).

Values encode provenance so the parent can attribute every surviving
row: v = worker*1_000_000 + g*1_000 + a, m = worker*100 + g.

argv: warehouse db table worker n_merges key_base n_keys
stdout: ``MERGER_DONE <worker>`` on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.catalog import Catalog  # noqa: E402
from opentick_spark.session import get_spark  # noqa: E402
from opentick_spark.table import TableStore  # noqa: E402


def main() -> None:
    warehouse, db, table, worker_s, merges_s, base_s, keys_s = sys.argv[1:8]
    worker, n_merges = int(worker_s), int(merges_s)
    base, n_keys = int(base_s), int(keys_s)
    spark = get_spark(
        app_name=f"mp_merger_{worker}", shuffle_partitions=2
    )
    store = TableStore(Catalog(warehouse), db, table)
    keys = list(range(base, base + n_keys))
    for g in range(n_merges):
        if g % 2 == 0:
            src = spark.createDataFrame(
                [
                    (a, worker * 1_000_000 + g * 1_000 + a, worker * 100 + g)
                    for a in keys
                ],
                "a int, v int, m int",
            )
            store.merge_into(
                spark, src, when_matched="update", when_not_matched="insert"
            )
        else:
            src = spark.createDataFrame(
                [(a,) for a in keys if a % 3 == worker],
                "a int",
            )
            store.merge_into(
                spark, src, when_matched="delete", when_not_matched=None
            )
    print(f"MERGER_DONE {worker}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
