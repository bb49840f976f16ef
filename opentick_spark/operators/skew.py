"""Hot-key detection and hot/cold routing for skewed per-key operators.

The drill (PLANS.md, tests/skew_drill.py) showed the bucketed skew paths
are straggler insurance whose overhead scales with the number of keys
they are applied to — so at scale you apply them to the FEW hot keys and
run the plain path on the long tail. This module is that routing:

- ``hot_keys``: one hash aggregation finds the keys owning more than a
  threshold fraction of rows (key-cardinality-sized result).
- ``split_by_hot_keys``: broadcast semi/anti joins split the input; the
  broadcast filter pushes into both scans, no shuffle is added.
- ``route_hot_cold``: run the heavy (bucketed) variant on the hot slice,
  the plain variant on the cold slice, union the results — the shape
  every skew_buckets operator documents as its at-scale deployment.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame, key_cols: list[str], threshold: float = 0.05
) -> DataFrame:
    """Keys owning > ``threshold`` of the input rows. One aggregation
    keyed on the key columns (map-side combined, key-cardinality-sized);
    the total is derived from the same counts — no second scan."""
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("__n") > F.lit(threshold) * F.col("__tot"))
        .select(*key_cols)
    )


def split_by_hot_keys(
    df: DataFrame, key_cols: list[str], threshold: float = 0.05
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(hot_rows, cold_rows, hot_keys_df). The hot-key table is
    broadcast to both sides; semi/anti filters evaluate at the scan."""
    hk = hot_keys(df, key_cols, threshold)
    hot = df.join(F.broadcast(hk), key_cols, "left_semi")
    cold = df.join(F.broadcast(hk), key_cols, "left_anti")
    return hot, cold, hk


def route_hot_cold(
    df: DataFrame,
    key_cols: list[str],
    plain_fn: Callable[[DataFrame], DataFrame],
    hot_fn: Callable[[DataFrame], DataFrame],
    threshold: float = 0.05,
) -> DataFrame:
    """Apply ``hot_fn`` (a skew-hardened variant) to rows of hot keys and
    ``plain_fn`` to the rest, union by name. Row-level transforms only:
    both functions must emit one output row per input row with the same
    schema (every skew_buckets operator in this codebase qualifies)."""
    hot, cold, _ = split_by_hot_keys(df, key_cols, threshold)
    return plain_fn(cold).unionByName(hot_fn(hot))
