"""Driver-facing workload: named queries + matching DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 (plus the LLM-pipeline extension
surface) is represented as a ``QUERIES[name]`` callable
``(spark, sf_dir) -> DataFrame`` and, where ANSI-SQL-expressible, an
``ORACLES[name]`` DuckDB SQL string producing identical column names and
values. Conventions shared by both sides:

- events.ts is epoch-nanos in Spark but µs-truncated in DuckDB's parquet
  reader, so every ts-derived output is µs (``ts div 1000`` ≡
  ``epoch_us(ts)``).
- every numeric output is explicitly cast: integers → long, floats →
  double, and float aggregates are rounded (r4/r6) so cross-engine
  summation-order ulps can't flip the driver's value hash.
"""

from opentick_spark.workload.core import QUERIES as _CORE_Q, ORACLES as _CORE_O
from opentick_spark.workload.llm import QUERIES as _LLM_Q, ORACLES as _LLM_O
from opentick_spark.workload.tick import QUERIES as _TICK_Q, ORACLES as _TICK_O

QUERIES = {**_CORE_Q, **_TICK_Q, **_LLM_Q}
ORACLES = {**_CORE_O, **_TICK_O, **_LLM_O}

__all__ = ["QUERIES", "ORACLES"]
