"""Shared loaders/helpers for the workload queries.

events.ts convention: the engine's native timestamp type is an
epoch-nanosecond long (the reference's first-class nanosecond support;
Spark's TimestampType is µs-only). Driver data generations differ in how
the parquet stores it — TIMESTAMP(NANOS) surfaces as ns-longs under
``spark.sql.legacy.parquet.nanosAsLong``, TIMESTAMP(MICROS) surfaces as
``timestamp_ntz`` — so ``load`` normalizes events to ns-longs and
``ts_range_cond`` keeps range predicates on the STORED representation so
they still reach the parquet scan as pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The table exactly as stored (no column normalization). Use this
    schema for file streams over the driver's parquet."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events(df: DataFrame) -> DataFrame:
    """events.ts → epoch-nano long, whatever the stored representation.

    A pure projection: filters on other columns still push down; time
    range filters that must reach the scan go through ``ts_range_cond``
    BEFORE this conversion."""
    t = dict(df.dtypes).get("ts")
    if t and t.startswith("timestamp"):
        df = df.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "long"
            ),
        )
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = load_raw(spark, sf_dir, name)
    return normalize_events(df) if name == "events" else df


def ts_range_cond(
    df: DataFrame,
    lo_ns: int | None = None,
    hi_ns: int | None = None,
    col: str = "ts",
):
    """``[lo_ns, hi_ns)`` predicate on events.ts in its STORED type
    (timestamp literal vs long literal), so the bounds constant-fold and
    push to parquet row-group pruning instead of becoming a post-scan
    filter on the normalized ns-long projection."""
    t = dict(df.dtypes)[col]
    c = F.col(col)
    conds = []
    if t.startswith("timestamp"):
        # ts_ns >= lo ⇔ ts_us >= ceil(lo/1000); ts_ns < hi ⇔ ts_us < ceil(hi/1000)
        if lo_ns is not None:
            conds.append(c >= F.timestamp_micros(F.lit(-(-lo_ns // 1000))).cast(t))
        if hi_ns is not None:
            conds.append(c < F.timestamp_micros(F.lit(-(-hi_ns // 1000))).cast(t))
    else:
        if lo_ns is not None:
            conds.append(c >= F.lit(lo_ns))
        if hi_ns is not None:
            conds.append(c < F.lit(hi_ns))
    if not conds:
        return F.lit(True)
    out = conds[0]
    for x in conds[1:]:
        out = out & x
    return out


def ts_us(col: str = "ts") -> F.Column:
    """normalized events.ts epoch-nanos → epoch-µs long (matches DuckDB
    epoch_us(ts) for either parquet generation)."""
    return F.expr(f"{col} div 1000")


def r(col, digits: int = 6):
    return F.round(col, digits)
