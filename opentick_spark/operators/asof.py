"""Generic as-of join — the time-series join the reference's adj()
specializes (adj.go's bisectRight lookup, generalized to any payload).

Sorted-merge design (same as operators/adj.py): union the right side into
the left stream tagged by kind, sort by (keys, time, kind), and resolve
the as-of row with one window pass. One shuffle on the join keys, linear
merge within partitions, no broadcast requirement — this is the plan that
survives 100 TB, unlike per-row subqueries or range cross-joins.

Direction semantics (matching the reference's conventions, adj.go:184-190):
- backward: last right row with time <= left time (inclusive)
- forward:  first right row with time >  left time (exclusive)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Attach the as-of row's ``value_cols`` from ``right`` to each row of
    ``left``. NULLs when no right row qualifies (or it is farther than
    ``tolerance`` in the time column's own units)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    left_cols = left.columns
    tagged_l = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    for c in left_cols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))
    if direction == "backward":
        # right rows sort before left rows at equal time → inclusive
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = {c: F.last(f"__v_{c}", ignorenulls=True).over(w) for c in value_cols}
        picked_t = F.last("__rt", ignorenulls=True).over(w)
    else:
        # right rows at equal time sort before left → excluded from the
        # strictly-following frame ⇒ first right row with time > left time
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(1, Window.unboundedFollowing)
        )
        picked = {c: F.first(f"__v_{c}", ignorenulls=True).over(w) for c in value_cols}
        picked_t = F.first("__rt", ignorenulls=True).over(w)
    out = merged
    for c, expr in picked.items():
        out = out.withColumn(f"__p_{c}", expr)
    out = out.withColumn("__p_t", picked_t)
    out = out.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap = (
            (F.col("__t") - F.col("__p_t"))
            if direction == "backward"
            else (F.col("__p_t") - F.col("__t"))
        )
        keep = F.col("__p_t").isNotNull() & (gap <= tolerance)
        for c in value_cols:
            out = out.withColumn(
                f"__p_{c}", F.when(keep, F.col(f"__p_{c}"))
            )
    sel = [F.col(c) for c in left_cols] + [
        F.col(f"__p_{c}").alias(c) for c in value_cols
    ]
    return out.select(*sel)
