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

r14 (VERDICT r13 items 1+3, ADVICE low):

- The offsets/bounds joins only carry a ``broadcast`` HINT when the
  sum is UNGROUPED (≤ n_buckets rows, provably tiny). Grouped, the
  relations are |groups|- and |groups|×n_buckets-sized — an
  unconditional driver broadcast of millions of rows is the same
  scale killer this module exists to remove. Unhinted, AQE broadcasts
  them when they are genuinely small and hash-joins otherwise.
- Grouped bounds are PER GROUP (one groupBy over the input), not a
  single global min/max: under global bounds, a group whose values
  occupy a narrow slice of the global range collapsed into one range
  bucket, reviving the per-group single-task funnel for exactly the
  skewed-group case the scheme targets.
- Non-numeric ordering columns bucket through an ORDER-PRESERVING
  long key (``bucket_key``): strings/binary by their first 7 bytes
  (Spark's default UTF8_BINARY collation compares strings by unsigned
  UTF-8 bytes, so the big-endian value of the zero-right-padded 7-byte
  prefix is monotone non-decreasing in string order — non-strict is
  enough, bucketing only needs contiguous ranges; the in-bucket window
  still orders by the REAL column), dates/timestamps by their exact
  epoch day/micros. Previously these types fell back to the caller's
  single global window (selection.py's string CDF — the last silent
  funnel in the family, VERDICT r13 item 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType, T.DecimalType)
_PREFIXABLE = (T.StringType, T.BinaryType)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def is_rangeable(dtype: "T.DataType") -> bool:
    """True if ``two_level_cumsum`` can range-bucket this type
    NUMERICALLY (the exact-arithmetic paths)."""
    return isinstance(dtype, _INTEGRAL + _FLOATING)


def is_bucketable(dtype: "T.DataType") -> bool:
    """True if ``two_level_cumsum`` can range-bucket this type at all —
    numeric types plus the order-preserving long-key domains (string,
    binary, date, timestamp)."""
    return is_rangeable(dtype) or isinstance(dtype, _PREFIXABLE + _TEMPORAL)


def bucket_key(col: str, dtype: "T.DataType") -> "Column | None":
    """A LONG expression monotone NON-DECREASING in the column's sort
    order, used only to assign contiguous range buckets (ties are fine:
    the in-bucket window orders by the real column). None for numeric
    types (they bucket on their own exact value/double paths)."""
    if isinstance(dtype, _PREFIXABLE):
        raw = (
            F.encode(F.col(col), "UTF-8")
            if isinstance(dtype, T.StringType)
            else F.col(col)
        )
        # big-endian unsigned value of the zero-right-padded 7-byte
        # prefix: 56 bits, always a positive long. Right-padding keeps
        # the map monotone ("b" > "aaa" must hold after mapping);
        # UTF8_BINARY string order IS unsigned byte order.
        return F.conv(
            F.hex(F.rpad(raw, 7, bytes([0]))), 16, 10
        ).cast("long")
    if isinstance(dtype, T.DateType):
        return F.unix_date(F.col(col)).cast("long")
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dtype, T.TimestampNTZType):
        # unix_micros rejects TIMESTAMP_NTZ (r14 review finding), and a
        # cast to TIMESTAMP would route through the session timezone —
        # build a timezone-independent epoch-seconds key from the NTZ
        # fields instead. Second granularity is enough: bucket keys
        # only need monotone NON-decreasing (the in-bucket window still
        # orders by the real column).
        c = F.col(col)
        return (
            (
                F.unix_date(F.to_date(c)) * F.lit(86400).cast("long")
                + F.hour(c) * 3600
                + F.minute(c) * 60
                + F.floor(F.second(c)).cast("long")
            ).cast("long")
        )
    return None


def _nullsafe_join(left: DataFrame, right: DataFrame, keys: list) -> DataFrame:
    """Inner-join on ``keys`` with null-safe equality (``<=>``), keeping
    one copy of each key column (the left one) like the name-list join
    form does. NULL key values match each other — the same grouping
    semantics as ``groupBy``/``Window.partitionBy``, which treat NULL
    as a real group; the name-list form's null-unsafe `=` drops those
    rows (r15, ADVICE r14). Catalyst extracts ``<=>`` as an equi-join
    key (EqualNullSafe in ExtractEquiJoinKeys), so the physical plan
    stays a hash/sort-merge join."""
    renamed = right.select(
        *[F.col(k).alias(f"__nsj_{i}") for i, k in enumerate(keys)],
        *[c for c in right.columns if c not in keys],
    )
    cond = None
    for i, k in enumerate(keys):
        c = left[k].eqNullSafe(renamed[f"__nsj_{i}"])
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond).drop(
        *[f"__nsj_{i}" for i in range(len(keys))]
    )


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
    than ~(group's value domain)/n_buckets rows.

    Contract: ``order_col`` must be ``is_bucketable`` (raises
    otherwise), NON-NULL, and UNIQUE within each group (rows-frame
    windows are order-nondeterministic under ties; every caller here
    feeds ids or distinct histogram values). ``group_cols`` MAY contain
    NULLs (r15, ADVICE r14): a NULL key forms its own group exactly as
    under ``groupBy`` — the bounds/offsets joins are null-safe, so
    those rows get correct per-group running sums instead of being
    silently dropped. ``inclusive`` includes the
    current row (CDF semantics); exclusive gives the tokens-before
    convention. Bucket bounds ride the PLAN as a broadcast one-row
    min/max aggregate when ungrouped (not a driver ``.first()`` — r13
    review finding: eager bounds executed the corpus aggregation
    twice; the bounds subtree duplicates ``df``'s lineage and
    ReuseExchange collapses the duplicate) and as a PER-GROUP min/max
    relation when grouped (r13 ADVICE: global bounds collapsed a
    narrow-range group into one bucket — the single-task funnel again).
    Broadcast hints only where provably tiny (ungrouped); grouped
    bounds/offsets joins are left to AQE (VERDICT r13 item 1)."""
    dtype = df.schema[order_col].dataType
    if not is_bucketable(dtype):
        raise ValueError(
            f"two_level_cumsum: {order_col} has non-bucketable type "
            f"{dtype.simpleString()} — range bucketing needs a numeric, "
            "string, binary, date, or timestamp ordering column"
        )
    key = bucket_key(order_col, dtype)
    if key is not None:
        df = df.withColumn("__tl_key", key)
        key_col, key_integral = "__tl_key", True
    else:
        key_col, key_integral = order_col, isinstance(dtype, _INTEGRAL)
    if key_integral:
        # integer-exact bucketing (the assign_token_shards formula,
        # preserved bit-for-bit: width = max(1, (hi - lo) div B + 1))
        bkt = F.expr(
            "CASE WHEN __tl_lo IS NULL THEN 0L ELSE "
            f"(cast({key_col} AS long) - cast(__tl_lo AS long)) DIV "
            "greatest(1L, (cast(__tl_hi AS long) - cast(__tl_lo AS long)) "
            f"DIV {int(n_buckets)}L + 1L) END"
        )
    else:
        bkt = F.expr(
            "CASE WHEN __tl_lo IS NULL OR cast(__tl_hi AS double) <= "
            "cast(__tl_lo AS double) THEN 0L ELSE "
            f"least(CAST(floor((cast({key_col} AS double) - "
            "cast(__tl_lo AS double)) / ((cast(__tl_hi AS double) - "
            f"cast(__tl_lo AS double)) / {int(n_buckets)})) AS LONG), "
            f"{int(n_buckets) - 1}L) END"
        )
    gcols = list(group_cols)
    if gcols:
        # per-group bounds, plain (AQE-decided) join back on the group
        # key: |groups| rows — broadcastable only when actually small.
        # NULL-SAFE equality (r15, ADVICE r14): a NULL group-key value
        # is a real group under groupBy/Window.partitionBy, but the
        # name-list join form uses null-unsafe `=` and silently DROPPED
        # those rows; `<=>` keeps them and Catalyst still extracts it
        # as an equi-join key (no BNLJ).
        bnds = df.groupBy(*gcols).agg(
            F.min(key_col).alias("__tl_lo"), F.max(key_col).alias("__tl_hi")
        )
        with_b = _nullsafe_join(df, bnds, gcols)
    else:
        bnds = df.agg(
            F.min(key_col).alias("__tl_lo"), F.max(key_col).alias("__tl_hi")
        )
        with_b = df.crossJoin(F.broadcast(bnds))
    with_b = with_b.withColumn("__tl_bkt", bkt).drop("__tl_lo", "__tl_hi")
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
    if not gcols:
        # ≤ n_buckets rows by construction — provably broadcastable
        offsets = F.broadcast(offsets)
    w_in = (
        Window.partitionBy(*gcols, "__tl_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    joined = (
        # null-safe on the group cols (same NULL-group reasoning as the
        # bounds join above); __tl_bkt itself is never NULL, and the
        # ungrouped branch keeps the plain name-join so the broadcast
        # hint on `offsets` sits directly under the join
        _nullsafe_join(with_b, offsets, gcols + ["__tl_bkt"])
        if gcols
        else with_b.join(offsets, ["__tl_bkt"])
    )
    out = (
        joined
        .withColumn(
            out_col,
            F.col("__tl_off") + F.coalesce(F.sum(sum_col).over(w_in), F.lit(0)),
        )
        .drop("__tl_bkt", "__tl_off")
    )
    return out.drop("__tl_key") if key is not None else out
