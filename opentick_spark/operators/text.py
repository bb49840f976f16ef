"""Text-analysis operators for LLM-data pipelines, all JVM-side built-ins.

Everything here is expressed with ``pyspark.sql.functions`` (no Python
UDFs), so the hot path stays inside whole-stage codegen and scales
linearly with partitions: tokenization, quality metrics, language-ID by
stopword scoring, and document fingerprinting.
"""

from __future__ import annotations

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
