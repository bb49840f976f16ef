"""Shared loaders/helpers for the workload queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_us(col: str = "ts") -> F.Column:
    """events.ts epoch-nanos → epoch-µs long (matches DuckDB epoch_us(ts)
    after its ns→µs read truncation)."""
    return F.expr(f"{col} div 1000")


def r(col, digits: int = 6):
    return F.round(col, digits)
