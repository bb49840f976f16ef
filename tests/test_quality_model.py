"""operators/quality_model (r13): trained linear quality classifier —
trainer vs a numpy reference, scorer plan contract (zero shuffle),
feature-definition consistency between trainer and scorer, and filter
semantics."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from opentick_spark.operators.quality_model import (
    hashed_unigram_features,
    quality_model_filter,
    score_quality,
    synthetic_quality_weights,
    train_quality_classifier,
)


def _bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _np_reference_train(texts, labels, dim, iters, lr, l2=0.0):
    """Straight-line numpy replica of train_quality_classifier: same
    features (lower/trim/whitespace-split, md5 buckets, mean pooling),
    same full-batch logistic GD updates."""
    import numpy as np

    X = np.zeros((len(texts), dim))
    for i, text in enumerate(texts):
        toks = [t for t in text.strip().lower().split() if t]
        for t in toks:
            X[i, _bucket(t, dim)] += 1.0
        X[i] /= max(len(toks), 1)
    y = np.asarray(labels, dtype=float)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w = w - lr * ((X.T @ e) / len(texts) + l2 * w)
        b -= lr * e.mean()
    return w, b


def _planted_corpus(seed, n=60):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = i % 2
        vocab = (
            ["excellent", "rigorous", "cited", "coherent", "thorough"]
            if label
            else ["spam", "clickbait", "garbled", "keyword", "stuffing"]
        )
        shared = ["the", "a", "document", "text"]
        words = [rng.choice(vocab + shared) for _ in range(12)]
        rows.append((i, " ".join(words), label))
    return rows


@pytest.mark.parametrize("seed", [51, 52])
def test_trainer_matches_numpy_reference(spark, seed):
    rows = _planted_corpus(seed)
    # zero-token labeled docs participate in full-batch GD: they carry
    # the intercept feature only, and they count in n_docs (r13 review
    # finding — the first cut silently dropped them)
    rows = rows + [(1000, "", 0), (1001, "   ", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    dim, iters, lr = 256, 15, 2.0
    w, b = train_quality_classifier(
        df, "label", dim=dim, iters=iters, lr=lr
    )
    w_ref, b_ref = _np_reference_train(
        [t for _, t, _ in rows], [y for _, _, y in rows], dim, iters, lr
    )
    assert b == pytest.approx(b_ref, abs=1e-9)
    assert max(abs(w[i] - w_ref[i]) for i in range(dim)) < 1e-9

    # and the trained model separates the planted classes perfectly
    scored = score_quality(df, w, b, dim=dim).collect()
    for r in scored:
        assert (r["q_score"] > 0.5) == (r["label"] == 1)


def test_scoring_is_zero_shuffle_projection(spark):
    """The corpus-wide scoring pass must be a pure narrow projection:
    no Exchange — it pipelines with the parquet scan. r15: the margin
    deliberately IS an Arrow-vectorized pandas UDF now (one
    ArrowEvalPython projection, measured ~3× faster than the
    interpreted JVM fold with bit-identical output — see
    test_arrow_scorer_bit_equals_fold); a row-at-a-time BatchEvalPython
    would still be a regression."""
    w, b = synthetic_quality_weights(512)
    docs = spark.range(200).selectExpr(
        "id AS doc_id", "concat('tok', id % 37, ' tok', id % 11) AS text"
    )
    scored = score_quality(docs, w, b, dim=512)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_arrow_scorer_bit_equals_fold(spark):
    """r15: ``quality_margin_arrow`` (the production scorer) must be
    BIT-identical to the reference JVM fold ``quality_margin`` — same
    tokenizer semantics (Spark trim strips only 0x20; Java ASCII-only
    \\s), same bucket arithmetic, same summation order — on dyadic AND
    non-dyadic weights, including control-char/empty/null edges."""
    import random

    from opentick_spark.operators.quality_model import (
        quality_margin,
        quality_margin_arrow,
    )

    rows = [
        (0, "hello world"), (1, "  leading and trailing  "),
        (2, "\ttabs\tand\nnewlines\r"), (3, ""), (4, None),
        (5, "\x0bvertical\x0c"), (6, "\x00nul\x01ctrl\x1f"),
        (7, "multi   spaces"), (8, "UPPER Case MiXeD"),
        (9, "\x1f\x00 "), (10, " \t\r\n"), (11, "tok1 tok2 tok1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for dim, (w, b) in (
        (128, synthetic_quality_weights(128)),
        (64, ([random.Random(7).uniform(-1, 1) for _ in range(64)], 0.137)),
    ):
        fold = {
            r["doc_id"]: r["m"]
            for r in df.select(
                "doc_id", quality_margin(F.col("text"), w, b, dim).alias("m")
            ).collect()
        }
        arrow = {
            r["doc_id"]: r["m"]
            for r in df.select(
                "doc_id",
                quality_margin_arrow(F.col("text"), w, b, dim).alias("m"),
            ).collect()
        }
        assert fold == arrow  # exact, not approx


def test_scorer_matches_exploded_features(spark):
    """Feature-definition consistency: the scorer's literal-array fold
    must equal margin = sum(x_b * w_b) computed from the trainer's
    exploded feature rows — a drifted tokenizer/bucket/pooling on
    either side breaks training-serving skew invisibly otherwise."""
    rows = _planted_corpus(53)
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    dim = 128
    w, b = synthetic_quality_weights(dim)
    via_scorer = {
        r["doc_id"]: r["q_margin"]
        for r in score_quality(df, w, b, dim=dim).collect()
    }
    wdf = spark.createDataFrame(
        [(i, w[i]) for i in range(dim)], "b long, w double"
    )
    via_feats = {
        r["id"]: r["m"]
        for r in hashed_unigram_features(df, dim=dim)
        .join(F.broadcast(wdf), "b")
        .groupBy("id")
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(b)).alias("m"))
        .collect()
    }
    assert set(via_scorer) == set(via_feats)
    for i in via_scorer:
        assert via_scorer[i] == pytest.approx(via_feats[i], abs=1e-12)


def test_filter_threshold_and_empty_doc(spark):
    dim = 64
    w, b = synthetic_quality_weights(dim)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r for r in score_quality(docs, w, b, dim=dim).collect()}
    # 0-token docs score exactly bias (margin 0 here)
    assert scored[2]["q_margin"] == 0.0 and scored[3]["q_margin"] == 0.0
    assert scored[2]["q_score"] == pytest.approx(0.5)
    # margin filter == sigmoid-score filter (monotone)
    tau_m = scored[1]["q_margin"]
    kept = quality_model_filter(docs, w, b, margin_threshold=tau_m, dim=dim)
    assert {r["doc_id"] for r in kept.collect()} == {
        i for i, r in scored.items() if r["q_margin"] >= tau_m
    }
    # margins are exact multiples of 1/(64*n_tokens): dyadic numerator
    m = scored[1]["q_margin"]
    assert m == (round(m * 64 * 3)) / (64 * 3)


def test_weight_dim_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    w, b = synthetic_quality_weights(64)
    with pytest.raises(ValueError, match="weights"):
        score_quality(docs, w, b, dim=128)


def test_composes_with_pipeline_no_extra_exchange(spark):
    """The corpus_pipeline composition claim: appending the model
    filter to a dedup→heuristic-gate pipeline must add ZERO Exchange
    nodes — the scoring fold rides the same scan/shuffle structure as
    the pipeline it extends."""
    from opentick_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} body text") for i in range(100)],
        ["doc_id", "text"],
    )
    keepers = exact_duplicates(docs).select(F.col("keeper").alias("doc_id"))
    base = docs.join(keepers, "doc_id")
    w, b = synthetic_quality_weights(64)
    filtered = quality_model_filter(base, w, b, margin_threshold=-10.0, dim=64)
    n_base = base._jdf.queryExecution().executedPlan().toString().count("Exchange")
    n_filt = filtered._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_filt == n_base
    assert filtered.count() == base.count()  # -10 margin keeps everything
