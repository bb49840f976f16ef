"""opentick_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of open-trade/opentick.

The reference (/root/reference, Go + FoundationDB) is a PK-ordered tick
database with a restricted SQL dialect, nanosecond timestamps, upsert-by-PK
ingest, and one custom analytic operator (``adj()`` price/volume
adjustment).  This package re-expresses those semantics Spark-first:

- storage: Parquet tables partitioned by leading PK columns, sorted by the
  trailing PK; upsert = append log + latest-wins dedup view (Delta MERGE
  semantics without Delta).
- queries: the opentick SQL dialect compiles to DataFrame plans (Catalyst
  does pushdown/pruning/limit natively — the reference achieved the same by
  *restricting* the language to storage-aligned queries).
- timestamps: epoch-nanosecond ``LongType`` everywhere (the reference's
  first-class nanosecond support; Spark's TimestampType is µs-only).
- adj(): cumulative-product window + as-of join (reference adj.go).
- extension surface: joins/aggregations/windows (Spark built-ins) plus the
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) the reference lacks.
"""

from opentick_spark.client import connect_tcp
from opentick_spark.engine import Engine, connect
from opentick_spark.errors import OpentickError
from opentick_spark.session import get_spark

__all__ = ["Engine", "connect", "connect_tcp", "OpentickError", "get_spark"]
__version__ = "0.1.0"
