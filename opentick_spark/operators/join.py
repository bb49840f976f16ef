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
