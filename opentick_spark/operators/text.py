"""Text-analysis operators for LLM-data pipelines, all JVM-side built-ins.

Everything here is expressed with ``pyspark.sql.functions`` (no Python
UDFs), so the hot path stays inside whole-stage codegen and scales
linearly with partitions: tokenization, quality metrics, language-ID by
stopword scoring, and document fingerprinting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the lang-ID heuristic. Deliberately
# tiny and fixed: the operator contract is "deterministic n-gram/stopword
# scoring", not a trained model.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "et", "est", "des"],
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric non-space symbols — a deterministic stand-in for a
# real BPE vocabulary's pre-tokenizer.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(col)), "\\s+")


def ws_token_count(col: Column) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp extraction."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    sw = stopwords or LANG_MARKERS["en"]
    toks = ws_tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def avg_word_len(col: Column) -> Column:
    toks = ws_tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts; 'zh' scored by CJK char count."""
    toks = ws_tokens(col)

    def member_of(markers: list[str]):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, member_of(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    scores["zh"] = F.length(F.regexp_replace(col, "[^\\u4e00-\\u9fff]", ""))
    return scores


def lang_id(col: Column) -> Column:
    """argmax over lang_scores with deterministic alphabetical tie-break
    (first language in sorted order wins at equal score)."""
    scores = lang_scores(col)
    best = None
    for lang in sorted(scores):  # de, en, es, fr, zh — earlier wins ties
        s = scores[lang]
        if best is None:
            best = (F.lit(lang), s)
        else:
            pred_lang, pred_s = best
            best = (
                F.when(s > pred_s, F.lit(lang)).otherwise(pred_lang),
                F.when(s > pred_s, s).otherwise(pred_s),
            )
    return best[0]


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9\\u4e00-\\u9fff ]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def md5_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def rolling_hash(col: Column, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the normalized text's characters —
    the classic Rabin-Karp document fingerprint, computed JVM-side with
    a higher-order aggregate (no UDF). acc stays < mod*base + 2^16 so
    long arithmetic never overflows under ANSI mode."""
    chars = F.split(normalize_text(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails before bare word runs; IPs before phone-ish
    # digit runs so dotted quads never half-match as phone numbers
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Scrub emails / IPv4s / phone-number-ish digit runs to typed
    placeholder tokens — the standard pre-training privacy pass, fully
    JVM-side (chained regexp_replace, codegen-friendly)."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training pipeline.

    Chunks start every ``chunk_tokens - overlap`` whitespace tokens; the
    final chunk may be short. Per-document array work (tokenize once,
    slice per start position) followed by one posexplode — no shuffle at
    all; chunking is embarrassingly parallel over input splits.
    Output: (id, chunk_idx, chunk_text, n_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = ws_tokens(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, chunk_tokens), " ")
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("__n"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    # drop degenerate trailing starts (start > n happens only when n == 0)
    return out.select(
        "id",
        "chunk_idx",
        "chunk_text",
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("chunk_idx") * step
        ).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences —
    context-window packing by cumulative fill.

    Documents are laid out in deterministic ``id_col`` order within each
    group; sequence k covers the docs whose preceding cumulative token
    count falls in [k*budget, (k+1)*budget). A doc may straddle a
    boundary (it belongs to the sequence where it starts) — the
    streaming-friendly definition that one prefix-sum window expresses
    exactly, identically in any engine. One shuffle on the group key.
    Output: group cols + (seq_id, doc_id, tokens_before).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return df.select(
        *group_cols,
        F.col(id_col),
        before.alias("tokens_before"),
        (before / F.lit(budget)).cast("long").alias("seq_id"),
    )


def bigrams(col: Column) -> Column:
    """Word-bigram array ('a b c' → ['a b', 'b c']); empty for <2 words."""
    toks = ws_tokens(col)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, entirely per-row.

    Adds ``n_words``, ``dup_word_frac`` (1 − distinct/total words) and
    ``top_bigram`` / ``top_bigram_frac`` (most frequent word bigram and
    the fraction of bigram slots it covers; ties break to the
    lexicographically smallest bigram; empty/0.0 when the doc has <2
    words).

    Scale shape: the naive plan (explode bigrams → groupBy(doc, bigram)
    → per-doc argmax) shuffles every token of the corpus. Instead the
    top bigram is found *inside the row*: sort the bigram array, then a
    single higher-order ``aggregate`` scans for the longest run —
    O(k log k) per doc, zero Exchange, embarrassingly parallel over
    input splits. No UDF; everything stays in codegen.
    """
    c = F.col(text_col)
    toks = ws_tokens(c)
    bg = F.array_sort(bigrams(c))
    # longest-run scan over the sorted bigrams: acc tracks the run in
    # progress and the best so far; strict '>' keeps the earliest (i.e.
    # lexicographically smallest) bigram on count ties.
    run = F.aggregate(
        bg,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("cur"),
            F.lit(0).cast("long").alias("best"),
            F.lit("").alias("best_bg"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["cur"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("cur"),
            F.when(
                F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
                > acc["best"],
                F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            )
            .otherwise(acc["best"])
            .cast("long")
            .alias("best"),
            F.when(
                F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
                > acc["best"],
                x,
            )
            .otherwise(acc["best_bg"])
            .alias("best_bg"),
        ),
    )
    n = F.size(toks)
    nbg = F.size(bg)
    return df.withColumns(
        {
            "n_words": n.cast("long"),
            "dup_word_frac": F.when(n == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n
            ),
            "top_bigram": run["best_bg"],
            "top_bigram_frac": F.when(nbg == 0, F.lit(0.0)).otherwise(
                run["best"].cast("double") / nbg
            ),
        }
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash — the reproducible dataset-split step of a training pipeline.

    Bucket = first 8 hex chars of md5(id) as an integer, mod 100; split
    boundaries are the cumulative weights. md5 (not the engine's native
    ``hash``) so the assignment is stable across engines, Spark
    versions, and partitionings. Pure per-row projection: no shuffle,
    no UDF.
    """
    weights = [w for _, w in splits]
    if sum(weights) != 100:
        raise ValueError("split weights must sum to 100")
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    expr = None
    hi = 0
    for name, w in splits:
        hi += w
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def dedup_aware_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Leakage-free dataset split (r8): exact-duplicate documents ALWAYS
    land in the same split. A plain per-doc ``hash_split`` scatters a
    duplicate group across train and test — the classic eval leak that
    survives train-side-only dedup. Here the assignment hashes the
    duplicate GROUP's representative (min id per normalized-text
    group), so every copy inherits one split by construction.

    Adds ``group_rep`` and ``split`` columns. One hash-shuffle (the
    group window on the normalized-text hash); the split itself stays
    the pure md5-bucket projection of ``hash_split`` — engine-stable,
    replayable in SQL. Near-dup-aware splitting composes the same way:
    feed ``dedup.connected_components`` labels in as ``group_rep`` and
    call ``hash_split(df, id_col="group_rep")`` directly."""
    from pyspark.sql import Window

    g = F.sha2(normalize_text(F.col(text_col)), 256)
    out = (
        df.withColumn("__g", g)
        .withColumn(
            "group_rep", F.min(id_col).over(Window.partitionBy("__g"))
        )
        .drop("__g")
    )
    return hash_split(out, id_col="group_rep", splits=list(splits))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-scoring columns used for corpus filtering."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_m": F.length(c),
            "n_ws_tokens": ws_token_count(c),
            "n_bpe_tokens": bpe_token_count(c),
            "punct_ratio": punct_ratio(c),
            "stopword_ratio": stopword_ratio(c),
            "avg_word_len": avg_word_len(c),
        }
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram language model — the CCNet-style LM-quality signal (docs far
    from the corpus distribution score high/surprising).

    p(t) = count(t) / total_tokens over the whole corpus;
    score(d) = − mean_t ln p(t) over the doc's tokens.

    Two aggregates, both map-side combinable: the model build keys on
    token (vocabulary-sized result, broadcast back), the scoring keys on
    doc id. The model stays a DataFrame end-to-end — no driver-side
    vocabulary, so a 100 TB corpus trains the same way.
    Output: (id, n_tokens, nll).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.col(text_col))).alias("t"),
    )
    model = toks.groupBy("t").agg(F.count("*").alias("c"))
    total = model.agg(F.sum("c").cast("double").alias("total"))
    scored = (
        toks.join(F.broadcast(model), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (-F.avg(F.log(F.col("c") / F.col("total")))).alias("nll"),
        )
    )
    return scored


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    add-k-smoothed bigram language model — the step up from
    ``unigram_logprob`` toward KenLM-style perplexity filtering:

    ``p(w|v) = (c2(v,w) + k) / (c1(v) + k·V)`` where ``c2`` counts
    bigrams, ``c1(v)`` counts v-as-context (the bigram marginal, so the
    conditional normalizes over the smoothed vocabulary), and ``V`` is
    the corpus vocabulary size.

    Scale shape: the bigram table is NOT broadcast (unlike the unigram
    model it can outgrow the vocabulary by orders of magnitude) — the
    scoring join shuffles on the bigram key, which is exactly how the
    counts were built, so the exchange is reused. The context table is
    vocabulary-sized and broadcast; V is a 1-row broadcast. Docs with
    fewer than 2 tokens emit ``n_bigrams=0`` with NULL nll.
    Output: (id, n_bigrams, nll).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("__pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("__pos")
    pairs = (
        toks.select("id", F.lag("t").over(w).alias("v"), "t")
        .filter(F.col("v").isNotNull())
    )
    c2 = pairs.groupBy("v", "t").agg(F.count(F.lit(1)).alias("c2"))
    c1 = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("t").cast("double").alias("__vocab"))
    scored = (
        pairs.join(c2, ["v", "t"])
        .join(F.broadcast(c1), "v")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (
                -F.avg(
                    F.log(
                        (F.col("c2") + F.lit(add_k))
                        / (F.col("c1") + F.lit(add_k) * F.col("__vocab"))
                    )
                )
            ).alias("nll"),
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        "nll",
    )


def _adjacent_pairs(col: Column) -> Column:
    """structs of adjacent element pairs of an array column."""
    n = F.size(col)
    return F.zip_with(
        F.slice(col, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(col, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _merge_pair(col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — one
    in-row fold, matching textbook BPE application order."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train BPE merge rules over a corpus (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") —
    the vocabulary-training step of an LLM data pipeline, distributed.

    Classic formulation: train on the WORD-FREQUENCY table (one hash
    aggregation compresses the corpus to its vocabulary — at 100 TB this
    is the only pass that touches every token), then iterate: count
    adjacent symbol pairs weighted by word count, take the global
    argmax (deterministic tie-break: highest count, then lexicographic
    pair), merge it greedily in every word. Each round is one small
    explode+aggregate over the vocabulary plus a per-row fold; only the
    single winning pair is collected. Lineage is cut with
    ``localCheckpoint`` every ``checkpoint_every`` rounds (the k-means
    pattern). Returns the ordered merge list.
    """
    words = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    syms = words.select(
        "cnt", F.filter(F.split("w", ""), lambda c: c != "").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            syms.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        syms = syms.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def mixture_sample(
    docs: DataFrame,
    budgets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic data mixing: fill each source's token budget
    (``budgets[source]``, in tokens) with that source's documents taken
    in md5(id) order — a reproducible pseudo-random sample with no seed
    exchange, the standard way pre-training mixtures are cut from a
    weighted source recipe. A document is selected iff the tokens before
    it (in hash order, within its source) are still under the budget, so
    each source fills to its budget with at most one overflowing doc.

    Scale shape: source cardinality is tiny (tens), so a naive running
    total windowed by source would funnel each source's entire corpus
    through one task. The running total here is a two-level prefix sum:
    cumsum within (source, 2-hex-char hash prefix) — 256-way parallel per
    source — plus per-bucket offsets from a #sources×256-row aggregate
    rolled with a cheap window and broadcast-joined back. Ordering by
    (bucket, hash) ≡ ordering by hash, so the selection is identical to
    the naive plan (pinned by test_mixture_sample_matches_naive_cumsum).
    """
    from pyspark.sql import Window

    src_b = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    d = docs.filter(F.col(source_col).isin(list(budgets))).select(
        source_col,
        id_col,
        ws_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    d = d.withColumn("__b", F.substring("__h", 1, 2))
    win_in = (
        Window.partitionBy(source_col, "__b")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_w = (
        Window.partitionBy(source_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy(source_col, "__b")
        .agg(F.sum("n_tokens").alias("__bt"))
        .withColumn("__off", F.coalesce(F.sum("__bt").over(off_w), F.lit(0)))
        .select(source_col, "__b", "__off")
    )
    return (
        d.withColumn("__cin", F.coalesce(F.sum("n_tokens").over(win_in), F.lit(0)))
        .join(F.broadcast(offsets), [source_col, "__b"])
        .withColumn("tokens_before", F.col("__cin") + F.col("__off"))
        .filter(F.col("tokens_before") < src_b[F.col(source_col)])
        .select(source_col, id_col, "n_tokens", "tokens_before")
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply trained BPE merge rules (from ``bpe_merges``) to tokenize
    each document into subword symbols — the encode half of the
    tokenizer. Whitespace pre-tokenization, then each word's character
    array folds through the merge list in training order (same greedy
    left-to-right ``_merge_pair`` the trainer uses, so train→encode is
    self-consistent).

    Scale shape: entirely JVM-side expression chaining inside one
    ``transform`` — a narrow, zero-shuffle plan that scales with
    partitions. The alternative (encode the distinct-word table once and
    join back) trades that repeated per-occurrence CPU for a join
    shuffle; at 100 TB the narrow plan keeps the stage
    pipeline-breaker-free and is preferred for moderate merge counts."""

    def enc(w: Column) -> Column:
        syms = F.filter(F.split(w, ""), lambda c: c != "")
        for a, b in merges:
            syms = _merge_pair(syms, a, b)
        return syms

    return df.withColumn(
        out_col, F.flatten(F.transform(ws_tokens(F.col(text_col)), enc))
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    buckets: int = 32,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every anchor id, ``k`` pseudo-random partners drawn without any
    RNG state — partner choice is pure md5 arithmetic, so the pairing is
    reproducible across engines, Spark versions, partitionings, and
    reruns (the property that makes a training dataset auditable).

    Scheme: ids hash into ``buckets``; slot j of anchor a targets bucket
    md5(a#j) and takes the candidate with the smallest md5(d@a#j) rank,
    excluding a itself. Plan: one equi-join on the bucket id (shuffle
    keyed on a well-distributed small int — never an n² cross join; join
    output is k·n/buckets rows per anchor partition) + one min_by hash
    aggregation. A slot whose target bucket holds no other doc emits no
    row (probability (1-1/B)^(n-1) — negligible beyond toy corpora).

    Output: (id_col, slot long, neg_id) — one row per filled slot.
    """
    h8 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    ids = df.select(F.col(id_col).cast("long").alias("__id"))
    cand = ids.select(
        F.col("__id").alias("neg_id"),
        (h8(F.col("__id").cast("string")) % buckets).alias("__b"),
    )
    slots = ids.select(
        "__id",
        F.explode(F.array([F.lit(j).cast("long") for j in range(k)])).alias(
            "slot"
        ),
    ).withColumn(
        "__b",
        h8(
            F.concat(
                F.col("__id").cast("string"),
                F.lit("#"),
                F.col("slot").cast("string"),
            )
        )
        % buckets,
    )
    joined = slots.join(cand, "__b").filter(F.col("neg_id") != F.col("__id"))
    rank = F.md5(
        F.concat(
            F.col("neg_id").cast("string"),
            F.lit("@"),
            F.col("__id").cast("string"),
            F.lit("#"),
            F.col("slot").cast("string"),
        )
    )
    return (
        joined.groupBy("__id", "slot")
        .agg(F.min_by("neg_id", rank).alias("neg_id"))
        .select(F.col("__id").alias(id_col), "slot", "neg_id")
    )


def save_bpe_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist trained merge rules (train once, encode many corpora):
    order is the contract — ``bpe_encode`` folds through the list in
    training order."""
    import json

    with open(path, "w") as f:
        json.dump([[a, b] for a, b in merges], f)


def load_bpe_merges(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        return [(a, b) for a, b in json.load(f)]


def compression_ratio(col_name: str = "text", level: int = 6) -> Column:
    """zlib compression ratio (compressed/raw bytes) of a string column —
    the classic cheap "templated or repetitive text" detector (highly
    compressible ⇒ low information density ⇒ curation red flag).

    DEFLATE needs a per-value byte loop, so this is one of the engine's
    few sanctioned Python paths: an Arrow-batched pandas UDF (zlib runs
    in C per batch; no row-at-a-time pickling). Empty strings report
    ratio 0.0. Deterministic for a fixed level — safe for oracles that
    recompute with the same zlib."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 0.0
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    return _ratio(F.col(col_name))


def group_kfold(df: DataFrame, group_col: str, k: int = 5) -> DataFrame:
    """Leakage-free grouped k-fold assignment: fold = md5(group) mod k,
    so EVERY row of a group lands in the same fold — the cross-validation
    split that keeps correlated rows (a user's events, a document's
    chunks) out of each other's held-out fold. Same engine-stable md5
    arithmetic as ``hash_split`` (no native hash, no RNG state): pure
    per-row projection, zero shuffle, reproducible across engines and
    partitionings. Adds a ``fold`` int column."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    fold = (
        F.conv(
            F.substring(F.md5(F.col(group_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % k
    )
    return df.withColumn("fold", fold.cast("int"))


def chunk_dedup_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
) -> DataFrame:
    """C4/RefinedWeb-style EXACT chunk-level dedup stats: documents are
    segmented into fixed ``chunk_words``-word windows, each chunk is
    md5-hashed, and a chunk is "duplicated" if its hash occurs more
    than once ANYWHERE in the corpus. Output per doc:
    (doc_id, n_chunks, dup_chunks, dup_ratio) — the paragraph-dedup
    decision signal at sub-document granularity, complementing
    ``duplicate_spans`` (token-level n-gram islands).

    Scale shape: tokenize once per doc (narrow), ONE shuffle on the
    chunk hash for the global frequency (map-side combinable count),
    one on doc id for the rollup — never pairwise, fan-out is exactly
    n_chunks rows per doc. Works unchanged at 100 TB because a chunk's
    global count is a hash-agg, not a join of documents.

    r14 (the plan_reuse_sweep finding): the original agg-then-join
    formulation forked the chunk relation into the frequency agg AND
    the join probe — Catalyst recomputed the tokenize→explode→md5
    pipeline once per consumer (two corpus passes, measured two
    Generates), and a fork-point exchange could not save it because
    column pruning diverges below the fork (the frequency branch drops
    doc_id, so the subtrees never canonicalize equal). The global
    chunk count is now a COUNT OVER (PARTITION BY hash) window on the
    single chunk relation: one pass, one shuffle, no join, no fork
    (plan-asserted one Generate). Same hot-hash exposure as the join
    it replaces — a degenerate chunk's rows co-locate either way."""
    if chunk_words <= 0:
        raise ValueError(f"chunk_words must be positive, got {chunk_words}")
    toks = ws_tokens(F.col(text_col))
    base = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__w"),
            F.size(toks).alias("__n"),
        )
        .filter(F.col("__n") > 0)
    )
    cw = int(chunk_words)
    chunks = base.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("__n") / F.lit(cw)).cast("long") - 1,
            )
        ).alias("__i"),
        "__w",
    ).select(
        "doc_id",
        F.expr(f"md5(array_join(slice(__w, __i * {cw} + 1, {cw}), ' '))").alias(
            "__h"
        ),
    )
    from pyspark.sql import Window

    counted = chunks.withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy("__h"))
    )
    return (
        counted
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("__cnt") > 1).cast("long")).alias("dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "dup_chunks",
            F.round(F.col("dup_chunks") / F.col("n_chunks"), 6).alias(
                "dup_ratio"
            ),
        )
    )


def char_entropy(col: Column) -> Column:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic gibberish/noise filter signal: natural language sits around
    4–4.5 bits, base64/minified blobs push toward log2(alphabet), and
    repeated-character spam collapses toward 0. Computed IN-ROW via an
    Arrow-batched pandas UDF (numpy on Counter counts) — a narrow map
    with ZERO shuffle at any corpus size; the explode-chars-and-groupBy
    alternative would shuffle every character of the corpus."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ent(texts: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for t in texts:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            c = np.fromiter(Counter(t).values(), dtype=np.float64)
            p = c / c.sum()
            out.append(float(-(p * np.log2(p)).sum()))
        return pd.Series(out)

    return _ent(col)
