"""Two-level range-bucketed prefix sums — the no-single-task-window
cumulative primitive (r13, VERDICT r12 item 3: factored out of
``sources.assign_token_shards`` so the histogram-CDF family shares it).

A global ``Window.orderBy(col)`` funnels every row through ONE task —
fine for provably tiny relations, a scale killer otherwise. The
two-level scheme keeps the exact global running sum while every window
stays partitioned:

1. rows are RANGE-bucketed on the ordering column (contiguous value
   ranges, so (bucket, value) order IS value order);
2. per-bucket totals (an ``n_buckets``-row relation, per group) are
   cumulated by a window over BUCKET IDS — bounded at n_buckets rows
   per partition by construction — and joined back as offsets;
3. an in-bucket window (partitioned by bucket) adds the local prefix.

``out = offset + local prefix`` is exactly the single-window answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType, T.DecimalType)


def is_rangeable(dtype: "T.DataType") -> bool:
    """True if ``two_level_cumsum`` can range-bucket this type."""
    return isinstance(dtype, _INTEGRAL + _FLOATING)


def two_level_cumsum(
    df: DataFrame,
    order_col: str,
    sum_col: str,
    out_col: str,
    n_buckets: int = 64,
    group_cols: tuple = (),
    inclusive: bool = False,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``sum_col`` in ``order_col``
    order (within each ``group_cols`` combination), computed with the
    two-level scheme above — no unpartitioned window ever sees more
    than ``n_buckets`` rows per group.

    Contract: ``order_col`` must be numeric (integral or floating —
    ``is_rangeable``; raises otherwise) and UNIQUE within each group
    (rows-frame windows are order-nondeterministic under ties; every
    caller here feeds ids or distinct histogram values). ``inclusive``
    includes the current row (CDF semantics); exclusive gives the
    tokens-before convention. Bucket bounds ride the PLAN as a
    broadcast one-row min/max aggregate (not a driver ``.first()`` —
    that made plan construction eager and, for histogram callers,
    executed the corpus aggregation twice; r13 review finding): the
    bounds subtree duplicates ``df``'s lineage, and the planner's
    ReuseExchange collapses the duplicate, so the input is still
    computed once and everything stays lazy. The offsets relation
    (|groups| × n_buckets rows) is broadcast back — at millions of
    groups size the broadcast accordingly or cut n_buckets."""
    dtype = df.schema[order_col].dataType
    if not is_rangeable(dtype):
        raise ValueError(
            f"two_level_cumsum: {order_col} has non-rangeable type "
            f"{dtype.simpleString()} — range bucketing needs a numeric "
            "ordering column"
        )
    bnds = df.agg(
        F.min(order_col).alias("__tl_lo"), F.max(order_col).alias("__tl_hi")
    )
    if isinstance(dtype, _INTEGRAL):
        # integer-exact bucketing (the assign_token_shards formula,
        # preserved bit-for-bit: width = max(1, (hi - lo) div B + 1))
        bkt = F.expr(
            "CASE WHEN __tl_lo IS NULL THEN 0L ELSE "
            f"(cast({order_col} AS long) - cast(__tl_lo AS long)) DIV "
            "greatest(1L, (cast(__tl_hi AS long) - cast(__tl_lo AS long)) "
            f"DIV {int(n_buckets)}L + 1L) END"
        )
    else:
        bkt = F.expr(
            "CASE WHEN __tl_lo IS NULL OR cast(__tl_hi AS double) <= "
            "cast(__tl_lo AS double) THEN 0L ELSE "
            f"least(CAST(floor((cast({order_col} AS double) - "
            "cast(__tl_lo AS double)) / ((cast(__tl_hi AS double) - "
            f"cast(__tl_lo AS double)) / {int(n_buckets)})) AS LONG), "
            f"{int(n_buckets) - 1}L) END"
        )
    gcols = list(group_cols)
    with_b = (
        df.crossJoin(F.broadcast(bnds))
        .withColumn("__tl_bkt", bkt)
        .drop("__tl_lo", "__tl_hi")
    )
    sums = with_b.groupBy(*gcols, "__tl_bkt").agg(
        F.sum(sum_col).alias("__tl_sum")
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__tl_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.withColumn(
        "__tl_off", F.coalesce(F.sum("__tl_sum").over(w_off), F.lit(0))
    ).select(*gcols, "__tl_bkt", "__tl_off")
    w_in = (
        Window.partitionBy(*gcols, "__tl_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    return (
        with_b.join(F.broadcast(offsets), gcols + ["__tl_bkt"])
        .withColumn(
            out_col,
            F.col("__tl_off") + F.coalesce(F.sum(sum_col).over(w_in), F.lit(0)),
        )
        .drop("__tl_bkt", "__tl_off")
    )
