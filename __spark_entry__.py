"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (full engine path: ingest →
dialect SQL → adj as-of).  ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline extension
surface; DuckDB oracles included wherever the op is SQL-expressible.

NOTE: events.ts is normalized to epoch-nano longs by the workload's own
load path regardless of how the parquet stores it (TIMESTAMP(MICROS) →
``unix_micros×1000``; TIMESTAMP(NANOS) → ns-longs via the nanosAsLong
conf, which ``entry``/each query defensively set on the session — it is
a runtime-settable session conf). The session timezone is pinned UTC to
match the DuckDB oracle's naive-timestamp semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_RUNTIME_CONFS = {
    # events.ts is parquet TIMESTAMP(NANOS): surface as epoch-nano longs
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # timestamp-literal casts are session-timezone-dependent; the DuckDB
    # oracle treats naive timestamps as UTC, so the session must too
    "spark.sql.session.timeZone": "UTC",
}


def _prep(spark: SparkSession) -> SparkSession:
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some contexts; reads will fail loudly if so
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: adj() forward adjustment through the full engine
    (Arrow/Spark ingest → PK storage → dialect SQL → sorted-merge as-of)."""
    from opentick_spark.workload.tick import adj_forward

    return adj_forward(_prep(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentick_spark.workload import QUERIES

    return {
        name: (lambda spark, sf_dir, fn=fn: fn(_prep(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from opentick_spark.workload import ORACLES

    return dict(ORACLES)
