"""Model-based quality filtering (r13, VERDICT r12 item 6): apply a
trained linear quality classifier corpus-wide — the FineWeb-Edu /
fastText-classifier stage of an LLM data pipeline (Penedo et al. 2024;
Joulin et al. 2017), the one selection stage the repo lacked.

Closest existing operator (the COVERAGE check): ``selection.dsir_
importance`` shares the hashed-feature idiom (md5 token buckets) but is
a GENERATIVE importance ratio fit from two corpus slices; this is a
DISCRIMINATIVE classifier — weights trained on a labeled sample, then
applied as a pure projection.

Spark-native shape, per stage:

- **Features**: hashed unigram bag, mean-pooled — token t hits bucket
  md5-hash(t) % dim (the DSIR/text.hash_split idiom: replayable in
  DuckDB, no vocabulary ever collected); a document's feature vector is
  x_b = count_b / n_tokens.
- **Training** (``train_quality_classifier``): full-batch logistic
  GD as a handful of DataFrame jobs over the LABELED SAMPLE (labeled
  quality data is small by construction — human or LLM annotations):
  per iteration one broadcast join puts w on the exploded features,
  one doc-key agg forms margins, one bucket-key agg forms the
  gradient (dim rows, collected — the PQ-codebook driver-small
  precedent). Nothing here touches the unlabeled corpus.
- **Scoring** (``score_quality``): ZERO-SHUFFLE narrow projection —
  the dim-sized weight vector rides the plan as an array literal and
  each document folds token-bucket weights in array order:
  margin = (Σ_t w[bucket(t)]) / n_tokens + bias, score = σ(margin).
  The fold's numerator is a sum of the literal weights — when weights
  are dyadic rationals (the registry fixture) it is EXACT and
  order-independent, which is what makes the DuckDB oracle hash-safe
  on the margin. No join, no Exchange (plan-asserted), so the corpus
  pass pipelines with whatever filter comes next in corpus_pipeline.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from opentick_spark.operators.text import ws_tokens


def _bucket(c: Column, dim: int) -> Column:
    """md5-hash bucket in [0, dim) — the repo's deterministic
    cross-engine hash (selection._h8 idiom, inlined to keep this
    module's feature definition self-contained)."""
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % dim
    )


def hashed_unigram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    extra_cols: tuple = (),
) -> DataFrame:
    """Exploded mean-pooled hashed features: (id, [extra_cols...], b,
    x) with x_b = count of bucket-b tokens / doc token count. Used by
    the TRAINER (which needs features as rows to aggregate gradients on
    the bucket key); the scorer never materializes them."""
    toks = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.explode(ws_tokens(F.col(text_col))).alias("t"),
    ).filter(F.col("t") != "")
    counted = toks.groupBy("id", *extra_cols, _bucket(F.col("t"), dim).alias("b")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    n_tok = counted.groupBy("id").agg(F.sum("__c").alias("__n"))
    return counted.join(n_tok, "id").select(
        "id",
        *extra_cols,
        "b",
        (F.col("__c").cast("double") / F.col("__n")).alias("x"),
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[list, float]:
    """Full-batch logistic regression on hashed unigram features:
    returns (weights: list[dim], bias). ``label_col`` is 0/1 (int or
    bool). Deterministic up to float summation order (the gradient is
    a distributed sum). The bias is the INTERCEPT feature — bucket -1
    with x = 1.0 on EVERY labeled document, zero-token documents
    included (r13 review findings: the first cut silently dropped
    empty docs from n_docs and the bias gradient, and ran the error
    sub-plan twice per iteration) — so each iteration is exactly one
    broadcast-weights join → per-doc margin agg → per-bucket gradient
    agg → one dim+1-row collect. The returned vector is dim-sized —
    driver-small by construction, like the PQ codebooks."""
    spark = df.sparkSession
    labeled = df.select(
        F.col(id_col), F.col(text_col),
        F.col(label_col).cast("double").alias("__y"),
    )
    feats = hashed_unigram_features(
        labeled,
        id_col=id_col,
        text_col=text_col,
        dim=dim,
        extra_cols=("__y",),
    )
    intercept = labeled.select(
        F.col(id_col).alias("id"),
        "__y",
        F.lit(-1).cast("long").alias("b"),
        F.lit(1.0).alias("x"),
    )
    feats = feats.select("id", "__y", "b", "x").unionAll(
        intercept
    ).localCheckpoint(eager=True)  # one tokenize, 2·iters consumers
    n_docs = df.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: no documents")
    w = [0.0] * dim
    bias = 0.0
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(-1, bias)] + [(b, w[b]) for b in range(dim)],
            "b long, __w double",
        )
        errs = (
            feats.join(F.broadcast(wdf), "b")
            .groupBy("id", "__y")
            .agg(F.sum(F.col("x") * F.col("__w")).alias("__m"))
            .select(
                "id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                    - F.col("__y")
                ).alias("__e"),
            )
        )
        grad_rows = (
            feats.join(F.broadcast(errs), "id")
            .groupBy("b")
            .agg(F.sum(F.col("x") * F.col("__e")).alias("__g"))
            .collect()
        )
        g = {r["b"]: r["__g"] for r in grad_rows}
        w = [
            w[b] - lr * ((g.get(b, 0.0) / n_docs) + l2 * w[b])
            for b in range(dim)
        ]
        bias -= lr * g.get(-1, 0.0) / n_docs  # intercept: no l2, ref parity
    return w, bias


def quality_margin(
    text: Column, weights: list, bias: float, dim: int
) -> Column:
    """The zero-shuffle scoring expression as a pure-JVM array fold —
    kept as the reference implementation (``quality_margin_arrow`` is
    the measured production scorer; bit-equality between the two is
    test-pinned): mean token-bucket weight + bias, 0-token documents
    scoring exactly ``bias``."""
    wlit = F.lit([float(x) for x in weights])
    toks = F.filter(ws_tokens(text), lambda t: t != F.lit(""))
    folded = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(wlit, (_bucket(t, dim) + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        F.when(F.size(toks) > 0, folded / F.size(toks)).otherwise(F.lit(0.0))
        + F.lit(float(bias))
    )


# Java \s (ASCII-only: [ \t\n\x0B\f\r]) — ws_tokens splits with Spark's
# Java regex, so the Arrow scorer must split identically, NOT with
# Python's Unicode-aware \s
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def quality_margin_arrow(
    text: Column, weights: list, bias: float, dim: int
) -> Column:
    """Arrow-vectorized margin, bit-identical to ``quality_margin``
    (r15, guide §4.2): the JVM array fold is a HigherOrderFunction —
    interpreted per token, never codegen — and per-token
    md5+conv+element_at through it measured ~9× slower than a Python
    worker doing hashlib.md5 with a per-task token→bucket memo (corpus
    token distributions are Zipfian: the memo hit rate is ~100%, which
    the JVM expression cannot exploit). Bit-equality holds because the
    Python loop accumulates in the SAME order (token order) with the
    same IEEE doubles, the tokenizer replicates Java semantics exactly
    (Java ``trim`` strips ≤ 0x20; Java ``\\s`` is ASCII-only), and the
    bucket is the same md5-prefix arithmetic. Plan shape: one
    ArrowEvalPython projection — still zero Exchange. Caveat (shared
    with the fold via ws_tokens' Java regex): tokenization is
    ASCII-whitespace; ``lower()`` may differ from the JVM on exotic
    case mappings — irrelevant for hash-bucketed features."""
    w = [float(x) for x in weights]
    b = float(bias)

    @pandas_udf(DoubleType())
    def _margin(texts: pd.Series) -> pd.Series:
        import hashlib

        memo: dict = {}
        out = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            if t is None:
                out[i] = b
                continue
            # Spark's trim strips ONLY 0x20 spaces (control chars are
            # token bytes there — edge-pinned by the equality test);
            # leading/trailing \t\n\x0b\f\r fall to the split anyway
            toks = [x for x in _JAVA_WS.split(t.strip(" ").lower()) if x]
            if not toks:
                out[i] = 0.0 + b
                continue
            s = 0.0
            for tok in toks:
                wb = memo.get(tok)
                if wb is None:
                    wb = w[
                        int(
                            hashlib.md5(tok.encode()).hexdigest()[:8], 16
                        )
                        % dim
                    ]
                    memo[tok] = wb
                s += wb
            out[i] = s / len(toks) + b
        return pd.Series(out)

    return _margin(text)


def score_quality(
    df: DataFrame,
    weights: list,
    bias: float,
    text_col: str = "text",
    dim: int = 4096,
    margin_col: str = "q_margin",
    score_col: str = "q_score",
) -> DataFrame:
    """Add the classifier margin and its sigmoid score — a pure
    projection (zero Exchange, plan-asserted in tests): the corpus-wide
    scoring pass of the FineWeb-Edu stage. r15: the margin is the
    Arrow-vectorized scorer (``quality_margin_arrow`` — measured ~3×
    faster than the interpreted JVM fold at sf0.1, bit-identical
    output, equality test-pinned incl. control-char/empty/null edges);
    the sigmoid stays a JVM expression on the margin."""
    if len(weights) != dim:
        raise ValueError(
            f"score_quality: got {len(weights)} weights for dim={dim}"
        )
    m = quality_margin_arrow(F.col(text_col), weights, bias, dim)
    return df.withColumn(margin_col, m).withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col)))
    )


def quality_model_filter(
    df: DataFrame,
    weights: list,
    bias: float,
    margin_threshold: float = 0.0,
    text_col: str = "text",
    dim: int = 4096,
) -> DataFrame:
    """Keep documents the classifier scores at/above the margin
    threshold (margin space, not sigmoid space: thresholds stay exact
    dyadic rationals, so the keep decision is cross-engine exact —
    σ is monotone, filtering on margin ≥ logit(τ) IS filtering on
    score ≥ τ). Composes with corpus_pipeline as one more narrow
    filter on the same scan."""
    scored = score_quality(df, weights, bias, text_col=text_col, dim=dim)
    return scored.filter(F.col("q_margin") >= F.lit(float(margin_threshold)))


def synthetic_quality_weights(dim: int = 4096) -> tuple[list, float]:
    """Deterministic dyadic-rational weight fixture for oracle replay:
    w_b = (b mod 97)/64 - 0.75 (every weight an exact multiple of
    2^-6, so per-document weight sums are EXACT doubles and
    order-independent — the property that makes the registry entry's
    DuckDB hash comparison safe), bias 0."""
    return [float((b % 97) / 64.0 - 0.75) for b in range(dim)], 0.0


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
