"""Frequent-item (heavy-hitter) mining at corpus scale.

The scalable exact algorithm is two-pass: (1) a per-partition
Misra–Gries summary generates a candidate set with NO false negatives —
any item with global frequency ≥ 1/k must exceed n_p/k in at least one
partition (pigeonhole over ratios) and Misra–Gries with capacity > k
retains every such item; (2) candidates (a tiny set, ≤ capacity ×
partitions) are exactly counted with a broadcast semi-join. The full
term dictionary is never shuffled — only candidate occurrences — which
is the difference between this and a naive groupBy at 100 TB with a
long-tailed vocabulary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict, batch_counts, cap: int) -> dict:
    """Batched Misra–Gries merge: add a batch's value_counts, then if
    over capacity subtract the (cap+1)-th largest weight from everything
    and drop the non-positive — equivalent to that many single-item
    decrement rounds, preserving the MG undercount bound."""
    for w, c in batch_counts.items():
        counters[w] = counters.get(w, 0) + int(c)
    if len(counters) > cap:
        sub = sorted(counters.values(), reverse=True)[cap]
        counters = {w: c - sub for w, c in counters.items() if c > sub}
    return counters


def heavy_hitters(
    items: DataFrame,
    item_col: str = "w",
    min_freq_num: int = 1,
    min_freq_den: int = 100,
    slack: int = 4,
) -> DataFrame:
    """All items whose count ≥ (min_freq_num/min_freq_den) × total,
    with exact counts — threshold arithmetic stays integral so engines
    can't disagree on a float boundary.

    Output: (item, cnt, total) for qualifying items."""
    if min_freq_num <= 0 or min_freq_den <= 0:
        raise ValueError("min_freq must be a positive rational")
    cap = (min_freq_den // min_freq_num + 1) * slack

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counters = _mg_update(
                counters, pdf[item_col].value_counts().to_dict(), cap
            )
        yield pd.DataFrame({item_col: list(counters.keys())})

    src = items.select(F.col(item_col))
    candidates = src.mapInPandas(mg, f"{item_col} string").distinct()
    total = src.agg(F.count(F.lit(1)).cast("long").alias("total"))
    counted = (
        src.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        counted.crossJoin(total)
        .filter(
            F.col("cnt") * min_freq_den >= F.lit(min_freq_num) * F.col("total")
        )
        .select(item_col, "cnt", "total")
    )


def vocab_coverage(
    df: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Token coverage of the top-``top_n`` vocabulary — the
    tokenizer-design metric (what fraction of the corpus a vocab of size
    N explains). Exact: a word-count aggregation (shuffle keyed on the
    word — vocabulary-sized and zipf-flattened by the map-side partial,
    not corpus-sized), a deterministic top-N cut (count desc, word asc —
    stable under ties), then ONE final aggregation over counts
    broadcast-marked with top membership — total and covered mass come
    from the same pass, no crossJoin of scalar aggregates. The counts
    lineage is consumed twice (the top-N cut and the marked agg — an
    inherent data dependency); the duplicated word-count Exchange is
    deduped by ReuseExchange. Output: 1 row (total_tokens,
    covered_tokens, coverage)."""
    from opentick_spark.operators.text import ws_tokens

    toks = df.select(
        F.explode(ws_tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("w")).limit(top_n)
    marked = counts.join(
        F.broadcast(top.select("w", F.lit(True).alias("__top"))),
        "w",
        "left_outer",
    )
    return marked.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("__top"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("covered_tokens"),
    ).select(
        "total_tokens",
        "covered_tokens",
        F.round(F.col("covered_tokens") / F.col("total_tokens"), 6).alias(
            "coverage"
        ),
    )


def bigram_pmi_top(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the vocabulary-mining primitive behind multi-word
    token candidates (a BPE/WordPiece pre-step) and collocation-aware
    quality filters:

        pmi(a,b) = ln( (c_ab / N_bi) / ((c_a/N_uni) · (c_b/N_uni)) )

    Scale shape: one (w1,w2) hash agg for bigram counts and one w hash
    agg for unigram counts (both map-side combined); the ``min_count``
    floor is applied to bigrams BEFORE the unigram joins — under a
    Zipfian corpus most bigrams are singletons, so the floor prunes the
    join input by orders of magnitude. The two count joins then shuffle
    only floor-surviving bigrams against the vocabulary. Global top-k
    is orderBy+limit → TakeOrderedAndProject (never a full sort), and
    ranks are assigned on the k-row result.

    Cross-engine determinism: the ORDER key is the single IEEE division
    c_ab/(c_a·c_b) on exact integers (< 2^53) — bit-identical in any
    IEEE engine, monotone in pmi (N_uni, N_bi are constants) — with a
    (w1, w2) tie-break; the displayed ``pmi`` is rounded to 6dp and
    never used for ranking (the weighted_sample rank-on-raw lesson).

    Output: (w1, w2, c_ab, pmi, rank), rank 1..k by pmi descending.
    """
    from pyspark.sql import Window

    from opentick_spark.operators.text import ws_tokens

    toks = docs.select(ws_tokens(F.col(text_col)).alias("t")).select(
        F.filter("t", lambda w: w != F.lit("")).alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        # guard: slice length size-1 is NEGATIVE for an empty token
        # array (empty/whitespace-only doc) and Spark's slice throws on
        # it — filter before slicing (r12 review finding, reproduced)
        toks.filter(F.size("t") > 1)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("w1"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").cast("long").alias("n")).withColumn("__j", F.lit(1))
    n_bi = (
        toks.select((F.size("t") - 1).alias("m"))
        .filter("m > 0")
        .agg(F.sum("m").cast("long").alias("n_bi"))
        .withColumn("__j", F.lit(1))
    )
    totals = n_uni.join(n_bi, "__j").select(
        F.col("n").alias("n_uni"), "n_bi", "__j"
    )
    joined = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .withColumn("__j", F.lit(1))
        .join(F.broadcast(totals), "__j")
    )
    scored = joined.select(
        "w1",
        "w2",
        F.col("c_ab").cast("long").alias("c_ab"),
        # rank key: ONE exact-integer division — IEEE-identical cross-engine
        (
            F.col("c_ab").cast("double")
            / (F.col("c_a") * F.col("c_b")).cast("double")
        ).alias("__key"),
        F.round(
            F.log(
                F.col("c_ab").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
                / (
                    F.col("n_bi").cast("double")
                    * F.col("c_a").cast("double")
                    * F.col("c_b").cast("double")
                )
            ),
            6,
        ).alias("pmi"),
    )
    top = scored.orderBy(
        F.col("__key").desc(), F.col("w1"), F.col("w2")
    ).limit(k)
    w = Window.orderBy(F.col("__key").desc(), F.col("w1"), F.col("w2"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).drop(
        "__key"
    )
