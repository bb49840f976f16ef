"""Join strategies for skewed keys at scale.

Spark's AQE skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); explicit salting
remains the tool when the skew is known ahead of time, when AQE can't help
(e.g. the skewed side feeds a window), or when a hot key exceeds what
partition splitting can balance. ``salted_join`` implements the classic
n-way salt: explode the small side n×, salt the big side's key with a
uniform shard id, join on (key, salt) — the hot key's rows spread over n
partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with an n-way key salt.

    ``big``'s rows get a random-but-deterministic shard id
    (xxhash64 of the whole row % salt — no rand(), so the plan stays
    deterministic and re-executable); ``small`` is exploded ``salt``×
    so every (key, shard) bucket finds its match. Use when one key in
    ``big`` dominates; costs ``salt``× duplication of the small side,
    which must stay broadcast-sized after explosion.
    """
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi"):
        # right/full outer would emit each unmatched small row salt times
        # (the small side is exploded before the join)
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt < 2:
        return big.join(small, on, how)
    shard = (
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    ).alias("__shard")
    big_s = big.select("*", shard)
    small_s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__shard")
    )
    return big_s.join(small_s, [*on, "__shard"], how).drop("__shard")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``lo <= point < hi``) as an EQUI-join.

    A naive containment join has no equality condition, so Spark plans a
    BroadcastNestedLoopJoin — O(|points| × |intervals|), which dies at
    scale. Here both sides are keyed by a time bucket of ``bucket_width``
    (each interval explodes into the buckets it overlaps), making it a
    plain hash join on the bucket plus a residual range filter: cost
    scales with true overlap density, and the shuffle is on a
    well-distributed integer key. Pick ``bucket_width`` near the typical
    interval length — each interval then lands in ~2 buckets.

    Left-outer keeps every point (an unmatched point carries NULL
    interval columns); a point inside k overlapping intervals emits k
    rows, exactly like the relational BETWEEN join it replaces.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"interval_join does not support how={how!r}")
    p = F.col(point_col)
    pb = points.withColumn("__bucket", (p - F.pmod(p, F.lit(bucket_width))))
    # empty intervals ([lo, hi) with hi <= lo) match nothing and would
    # make the bucket sequence degenerate — drop them up front
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.col(lo_col) - F.pmod(F.col(lo_col), F.lit(bucket_width)),
                # hi is exclusive: the last overlapped bucket is hi-1's
                F.col(hi_col)
                - F.pmod(F.col(hi_col), F.lit(bucket_width))
                - F.when(
                    F.pmod(F.col(hi_col), F.lit(bucket_width)) == 0,
                    F.lit(bucket_width),
                ).otherwise(F.lit(0)),
                F.lit(bucket_width),
            )
        ),
    )
    cond = [pb["__bucket"] == iv["__bucket"], p >= iv[lo_col], p < iv[hi_col]]
    if how == "inner":
        return pb.join(iv, cond, "inner").drop("__bucket")
    # left-outer: dedupe matches first is unnecessary (bucket equality is
    # part of the condition, and a point matches an interval in exactly
    # one shared bucket: the point's own)
    return pb.join(iv, cond, "left").drop("__bucket")
