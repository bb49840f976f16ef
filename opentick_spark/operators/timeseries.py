"""Time-series rollups over epoch-nano timestamp columns.

The reference models bars as pre-aggregated rows keyed by
(sec, interval, tm) — producing those bars from raw ticks is the natural
companion operator (and the shape of a hypertable rollup). Pure built-ins:
bucketing is integer arithmetic on the nano timestamp, OHLC uses
min_by/max_by (Spark >= 3.3), so the whole rollup is one partial+final
hash aggregation — no window, no shuffle beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS = 1_000_000_000


def time_bucket(ts_nanos: Column, bucket_ns: int) -> Column:
    """Bucket start (epoch nanos) for a fixed-width tumbling window."""
    return (ts_nanos - F.pmod(ts_nanos, F.lit(bucket_ns))).cast("long")


def ohlcv_bars(
    ticks: DataFrame,
    key_cols: list[str],
    ts_col: str,
    price_col: str,
    size_col: str | None = None,
    bucket_seconds: int = 60,
) -> DataFrame:
    """Roll raw ticks into OHLCV bars per (key_cols..., bar_ts).

    open/close = price at min/max timestamp (min_by/max_by — ties resolve
    to the smallest/largest ts's row deterministically when ts is unique
    per key, which PK semantics guarantee).
    """
    bucket = time_bucket(F.col(ts_col), bucket_seconds * NS).alias("bar_ts")
    aggs = [
        F.min_by(price_col, ts_col).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ts_col).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if size_col:
        aggs.append(F.sum(size_col).alias("volume"))
        aggs.append(
            (
                F.sum(F.col(price_col) * F.col(size_col)) / F.sum(size_col)
            ).alias("vwap")
        )
    return ticks.groupBy(*key_cols, bucket).agg(*aggs)


def resample_last(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """Downsample to the last observation per bucket (max_by)."""
    bucket = time_bucket(F.col(ts_col), bucket_seconds * NS).alias("bucket_ts")
    aggs = [F.max_by(c, ts_col).alias(c) for c in value_cols]
    return df.groupBy(*key_cols, bucket).agg(*aggs)
