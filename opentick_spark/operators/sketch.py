"""Mergeable-sketch operators: HLL distinct-count rollups and a
Bloom-filter membership path for corpus-scale decontamination.

Both are *pre-aggregation* techniques — the 100 TB answer to questions
that would otherwise re-scan raw data per ask:

- **HLL rollup**: fine-grained (e.g. hourly) HLL sketch partials are a
  few-KB mergeable state per bucket. Any coarser rollup (day, month,
  arbitrary range) is a union of partials — the raw table is scanned
  ONCE ever, and re-aggregation cost is proportional to the number of
  buckets, not rows. This is the continuous-aggregate pattern for
  COUNT(DISTINCT), which (unlike SUM/COUNT) has no decomposable exact
  form. Spark 4's `hll_sketch_agg` / `hll_union_agg` /
  `hll_sketch_estimate` are Apache DataSketches HLL under the hood:
  partials built on executors, merged associatively — no driver funnel.

- **Bloom filter**: benchmark/eval decontamination where the benchmark
  side is small (evals always are, vs a 100 TB corpus) but the corpus
  probe must not shuffle. The filter is built distributively (positions
  exploded, `bit_or` per 64-bit word — at most m/64 rows ever shuffle),
  densified into ONE array<long> row, and broadcast; the probe is then a
  pure projection on the corpus — ZERO corpus-side exchange, exactly how
  Spark's own runtime-filter bloom joins work. False positives are
  bounded by sizing (FPP ≈ (1-e^(-kn/m))^k); false negatives are
  impossible by construction, which is the contract decontamination
  needs (never ship a contaminated doc).

No reference parity here (open-trade/opentick has no sketch surface) —
this is the training-data-pipeline extension block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HLL distinct-count rollup


def hll_partials(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch partials: the mergeable rollup state.

    One shuffle on the group key; each output row carries a ~2^lg_k-byte
    DataSketches HLL binary. lg_k=12 → relative standard error
    ~1.04/sqrt(4096) ≈ 1.6%. Output: group_cols + (sketch: binary).
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, lg_k).alias("sketch")
    )


def hll_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketch partials up to a coarser grouping: cost is
    O(#partials), the raw table is never touched. Output: group_cols +
    (approx_distinct: long)."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("approx_distinct")
    )


# ---------------------------------------------------------------------------
# Bloom filter


def _check_bloom_params(m_bits: int, k: int) -> None:
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")


def _probe_positions(col: Column, m_bits: int, k: int, seed: int) -> list[Column]:
    """k probe positions in [0, m_bits): xxhash64 of (value, salt) per
    probe — k independent-enough hash functions from one base hash
    family, all JVM-side."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 7001,
) -> DataFrame:
    """Build an m_bits-wide Bloom filter over ``df[col]`` distributively.

    Shape: explode the k probe positions (duplicate values are free —
    OR is idempotent, so no distinct shuffle), reduce to at most m/64
    (word_index, word) rows with a 64-bit ``bit_or`` per word, then
    densify into a single array<long> row ready to broadcast. The only
    shuffle is the word-level reduce, capped at m/64 rows regardless of
    input size. The densify step is one row: a map lookup per word slot
    (m/64 × occupied-words scalar ops, once).

    Output: one row (bloom: array<long>[m_bits/64]).
    """
    _check_bloom_params(m_bits, k)
    n_words = m_bits // 64
    pos = df.select(
        F.explode(F.array(*_probe_positions(F.col(col), m_bits, k, seed))).alias(
            "p"
        )
    )
    words = pos.select(
        F.expr("p div 64").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
    ).groupBy("w").agg(F.expr("bit_or(m)").alias("word"))
    return words.agg(
        F.expr("map_from_entries(collect_list(struct(w, word)))").alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "i -> coalesce(element_at(__m, cast(i as long)), 0L))"
        ).alias("bloom")
    )


def bloom_might_contain(
    col: Column,
    bloom_col: Column,
    m_bits: int,
    k: int = 5,
    seed: int = 7001,
) -> Column:
    """Membership probe against a (broadcast) bloom array column: true
    iff every one of the k probe bits is set. Pure projection — zero
    probe-side shuffle. Never false-negative for values that went
    through ``bloom_build`` with the same (m_bits, k, seed).

    The probe fails LOUDLY (raise_error) if the filter array's width
    disagrees with ``m_bits``: an out-of-range ``element_at`` would
    return NULL, silently turning a set bit into "absent" and breaking
    the no-false-negative guarantee — a build/probe parameter mismatch
    must never drop contaminated docs."""
    _check_bloom_params(m_bits, k)
    n_words = m_bits // 64
    checks = []
    for p in _probe_positions(col, m_bits, k, seed):
        word = F.element_at(bloom_col, F.floor(p / F.lit(64)).cast("int") + 1)
        bit = F.pmod(p, F.lit(64)).cast("int")
        checks.append(word.bitwiseAND(_shiftleft_one(bit)) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(F.size(bloom_col) == F.lit(n_words), out).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"bloom_might_contain: filter width mismatch — probe "
                    f"expects m_bits={m_bits} ({n_words} words), filter has "
                ),
                F.size(bloom_col).cast("string"),
                F.lit(" words"),
            )
        ).cast("boolean")
    )


def _shiftleft_one(bit: Column) -> Column:
    """1L << bit with a column-valued shift (the pyspark ``shiftleft``
    helper only accepts a literal count)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit)
