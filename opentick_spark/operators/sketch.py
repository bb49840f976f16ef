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


# ---------------------------------------------------------------------------
# Count-Min Sketch


def _cms_check(width: int, depth: int) -> None:
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")


def _cms_bucket(col: Column, row: int, width: int, seed: int) -> Column:
    """Bucket for hash row ``row``: md5(value || ':' || (seed+row))[:15
    hex] mod width — the repo's deterministic cross-engine hash idiom
    (selection.deterministic_shards), so a DuckDB oracle can replicate
    every cell exactly. 60 hash bits → modulo bias < width/2^60."""
    key = F.concat(col.cast("string"), F.lit(f":{seed + row}"))
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % F.lit(int(width))
    )


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 9101,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min Sketch over ``df[col]`` — THE mergeable frequency
    sketch for corpus-scale word/item statistics: depth×width counters,
    est(x) = min over rows of cell[row][bucket_row(x)], always ≥ the
    true count (overestimate-only, error ≤ 2N/width with prob 1-2^-depth
    — Cormode & Muthukrishnan 2005).

    Scale shape: the k bucket ids per row are a narrow projection;
    the ONLY shuffle is the (row, bucket) hash agg, map-side combined,
    so shuffle volume is ≤ depth×width per map partition regardless of
    corpus size — same posture as ``bloom_build``. Sketches from
    disjoint corpus slices merge by cell-wise SUM (``cms_merge``), which
    is how incremental maintenance works: sketch the delta, add.

    ``weight_col``: build from pre-aggregated (value, count) rows
    instead of one occurrence per row.

    Output: one row (cms: array<long>[depth*width], row-major).
    """
    _cms_check(width, depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(F.col(col), d, width, seed).alias("b"),
                            w.alias("w"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("e")
        )
        .select(
            (F.col("e.d") * F.lit(width) + F.col("e.b")).alias("cell"),
            F.col("e.w"),
        )
        .groupBy("cell")
        .agg(F.sum("w").alias("cnt"))
    )
    n_cells = depth * width
    return cells.agg(
        F.expr("map_from_entries(collect_list(struct(cell, cnt)))").alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_cells - 1}), "
            "i -> coalesce(element_at(__m, cast(i as long)), 0L))"
        ).alias("cms")
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge CMS partials built with identical (width, depth, seed):
    cell-wise sum via zip_with fold — O(#sketches × cells), the raw
    data is never rescanned."""
    return sketches.agg(
        F.reduce(
            F.collect_list("cms"),
            F.expr("cast(array() as array<long>)"),
            lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b)
            ),
        ).alias("cms")
    )


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 9101,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` against a built
    sketch: broadcast the one-row cms array and take the min over the
    depth cells — a pure projection on the probe side, zero probe-side
    shuffle (the bloom_might_contain posture). Estimates are exact for
    items whose cells suffered no collisions and overestimates
    otherwise — never underestimates."""
    _cms_check(width, depth)
    from pyspark.sql.functions import broadcast

    cells = [
        F.element_at(
            F.col("__cms"),
            (
                F.lit(d * width)
                + _cms_bucket(F.col(col), d, width, seed)
            ).cast("int")
            + 1,
        )
        for d in range(depth)
    ]
    # F.least requires >= 2 args; depth=1 (allowed by _cms_check) is the
    # single cell itself (r12 ADVICE)
    est = cells[0] if depth == 1 else F.least(*cells)
    return (
        probes.crossJoin(broadcast(cms.select(F.col("cms").alias("__cms"))))
        .withColumn(out_col, est)
        .drop("__cms")
    )
