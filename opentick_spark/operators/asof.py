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
    strategy: str = "merge",
    skew_buckets: int | None = None,
    broadcast_buckets: int | None = None,
) -> DataFrame:
    """Attach the as-of row's ``value_cols`` from ``right`` to each row of
    ``left``. NULLs when no right row qualifies (or it is farther than
    ``tolerance`` in the time column's own units).

    ``strategy="merge"`` (default) is the sorted-merge window above — no
    size assumption on either side. ``strategy="broadcast"`` is the
    plan for a broadcastable right side (reference data, corporate
    events, …): each right row becomes a half-open validity interval per
    key ([t, next_t) backward; [prev_t, t) forward), the interval table
    is broadcast, and the left stream resolves its as-of row with a
    broadcast-hash join + interval filter — the left side keeps its
    partitioning, so a hyper-hot LEFT key cannot bound the stage (same
    tradeoff as operators/adj.with_adj_factors). CAVEAT (measured,
    tests/skew_drill.py): a hyper-hot RIGHT key degenerates this plan —
    the hash join matches every interval of the key then post-filters,
    so each left row scans O(intervals-of-its-key) (145 s vs 0.6 s merge
    on the 80%-hot 1M-row fixture). ``broadcast_buckets=N`` fixes that
    by time-bucketing the broadcast side: each interval replicates to
    the buckets it spans and the join gains a bucket equi-key, bounding
    the per-row scan to intervals overlapping one bucket. Costs one
    min/max pass over the left time column and ~N extra broadcast rows
    per key.

    ``skew_buckets=N`` (merge strategy only) time-buckets the sorted-merge
    window: the heavy window partitions by (keys, time-bucket) instead of
    (keys,), so a single hyper-hot key splits across N partitions instead
    of bounding the stage on one. Left rows whose bucket holds no earlier
    (resp. later) right row take the carry-in — the per-(key, bucket)
    as-of payload rolled across buckets, an aggregate that is tiny
    (#keys × N rows) regardless of data volume. Results are identical to
    the unbucketed merge; tests/test_adj.py pins the equivalence."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if strategy not in ("merge", "broadcast"):
        raise ValueError(f"strategy must be merge|broadcast, got {strategy}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    # the as-of row is picked ATOMICALLY as one struct — per-column
    # last/first(ignorenulls) would stitch together values from
    # different right rows whenever payload columns contain NULLs
    payload = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    if strategy == "broadcast":
        wiv = Window.partitionBy(*on).orderBy(right_time)
        if direction == "backward":
            lo, hi = F.col(right_time), F.lead(right_time).over(wiv)
        else:
            lo, hi = F.lag(right_time).over(wiv), F.col(right_time)
        iv = right.select(
            *[F.col(c).alias(f"__k_{c}") for c in on],
            payload.alias("__vrow"),
            lo.alias("__lo"),
            hi.alias("__hi"),
        )
        lt = F.col(left_time)
        cond = F.lit(True)
        for c in on:
            cond = cond & (F.col(c) == F.col(f"__k_{c}"))
        cond = (
            cond
            & (F.col("__lo").isNull() | (lt >= F.col("__lo")))
            & (F.col("__hi").isNull() | (lt < F.col("__hi")))
        )
        join_left = left
        if broadcast_buckets is not None and broadcast_buckets > 1:
            # bucket equi-key bounds the per-left-row interval scan: one
            # driver-side min/max of the left time column sizes the
            # buckets, intervals are clamped to the observed left range
            # (out-of-range and zero-width ones can never match) and
            # replicated to every bucket they overlap
            b = left.agg(
                F.min(left_time).alias("lo"), F.max(left_time).alias("hi")
            ).first()
            llo, lhi = b["lo"], b["hi"]
            if llo is not None:
                width = max(1, (lhi - llo) // broadcast_buckets + 1)
                lo_c = F.greatest(
                    F.coalesce(F.col("__lo"), F.lit(llo)), F.lit(llo)
                )
                hi_c = F.least(
                    F.coalesce(F.col("__hi"), F.lit(lhi + 1)), F.lit(lhi + 1)
                )
                # integer div: double division would lose ulps on
                # ns-scale longs and could mis-bucket boundary rows
                iv = (
                    iv.withColumn("__lo_c", lo_c)
                    .withColumn("__hi_c", hi_c)
                    .filter(F.col("__lo_c") < F.col("__hi_c"))
                    .withColumn(
                        "__bkt",
                        F.explode(
                            F.sequence(
                                F.expr(f"(__lo_c - {llo}L) div {width}L"),
                                F.expr(f"(__hi_c - 1 - {llo}L) div {width}L"),
                            )
                        ),
                    )
                    .drop("__lo_c", "__hi_c")
                )
                join_left = left.withColumn(
                    "__lbkt", F.expr(f"({left_time} - {llo}L) div {width}L")
                )
                cond = cond & (F.col("__lbkt") == F.col("__bkt"))
        out = join_left.join(F.broadcast(iv), cond, "left")
        if tolerance is not None:
            gap = (
                (lt - F.col("__vrow.__rt"))
                if direction == "backward"
                else (F.col("__vrow.__rt") - lt)
            )
            out = out.withColumn(
                "__vrow",
                F.when(F.col("__vrow").isNotNull() & (gap <= tolerance), F.col("__vrow")),
            )
        sel = [F.col(c) for c in left.columns] + [
            F.col(f"__vrow.{c}").alias(c) for c in value_cols
        ]
        return out.select(*sel)
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        payload.alias("__vrow"),
    )
    left_cols = left.columns
    tagged_l = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tagged_r.schema["__vrow"].dataType).alias("__vrow"),
    )
    for c in left_cols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))
    if skew_buckets is not None and skew_buckets > 1:
        return _merge_bucketed(
            merged, on, left_cols, value_cols, direction, tolerance, skew_buckets
        )
    if direction == "backward":
        # right rows sort before left rows at equal time → inclusive
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("__vrow", ignorenulls=True).over(w)
    else:
        # right rows at equal time sort before left → excluded from the
        # strictly-following frame ⇒ first right row with time > left time
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(1, Window.unboundedFollowing)
        )
        picked = F.first("__vrow", ignorenulls=True).over(w)
    out = merged.withColumn("__p", picked).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap = (
            (F.col("__t") - F.col("__p.__rt"))
            if direction == "backward"
            else (F.col("__p.__rt") - F.col("__t"))
        )
        keep = F.col("__p").isNotNull() & (gap <= tolerance)
        out = out.withColumn("__p", F.when(keep, F.col("__p")))
    sel = [F.col(c) for c in left_cols] + [
        F.col(f"__p.{c}").alias(c) for c in value_cols
    ]
    return out.select(*sel)


def _merge_bucketed(
    merged: DataFrame,
    on: list[str],
    left_cols: list[str],
    value_cols: list[str],
    direction: str,
    tolerance: int | None,
    n_buckets: int,
) -> DataFrame:
    """Skew-split sorted merge: the heavy window partitions by
    (keys, time-bucket) so a hot key spreads over ``n_buckets`` tasks.

    Cross-bucket correctness comes from a carry join: per (key, bucket)
    the extreme right-side payload (latest for backward, earliest for
    forward) is aggregated — #keys × N rows, trivially small at any data
    volume — then rolled across buckets with a window so every bucket
    knows its as-of answer from outside the bucket. A left row prefers
    its in-bucket pick and falls back to the carry. Costs one extra
    min/max pass over the unioned stream for the bucket bounds (column-
    pruned to the time column, typically answered by parquet stats)."""
    bounds = merged.agg(F.min("__t").alias("lo"), F.max("__t").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    is_left = F.col("__is_left") == 1
    if lo is None or hi == lo:
        width, lo = 1, 0 if lo is None else lo
    else:
        width = (hi - lo) // n_buckets + 1
    merged = merged.withColumn("__b", F.expr(f"(__t - {lo}L) div {width}L"))
    part = [*on, "__b"]
    # extreme right payload per (key, bucket): struct max/min orders by
    # __t first; left rows contribute NULL and are ignored by the agg
    rpay = F.when(~is_left, F.struct(F.col("__t"), F.col("__vrow")))
    if direction == "backward":
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked_in = F.last("__vrow", ignorenulls=True).over(w)
        edge = F.max(rpay).alias("__e")
        cw = (
            Window.partitionBy(*on)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried = F.last("__e", ignorenulls=True).over(cw)
    else:
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(1, Window.unboundedFollowing)
        )
        picked_in = F.first("__vrow", ignorenulls=True).over(w)
        edge = F.min(rpay).alias("__e")
        cw = (
            Window.partitionBy(*on)
            .orderBy("__b")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carried = F.first("__e", ignorenulls=True).over(cw)
    carry = (
        merged.groupBy(*part)
        .agg(edge)
        .withColumn("__cv", carried["__vrow"])
        .select(*part, "__cv")
    )
    out = (
        merged.withColumn("__pin", picked_in)
        .filter(is_left)
        .join(carry, part, "left")
        .withColumn("__p", F.coalesce("__pin", "__cv"))
    )
    if tolerance is not None:
        gap = (
            (F.col("__t") - F.col("__p.__rt"))
            if direction == "backward"
            else (F.col("__p.__rt") - F.col("__t"))
        )
        out = out.withColumn(
            "__p", F.when(F.col("__p").isNotNull() & (gap <= tolerance), F.col("__p"))
        )
    sel = [F.col(c) for c in left_cols] + [
        F.col(f"__p.{c}").alias(c) for c in value_cols
    ]
    return out.select(*sel)
