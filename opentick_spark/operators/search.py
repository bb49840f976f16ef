"""Keyword search over a document corpus — BM25 ranking, Spark-first.

The classic inverted-index scorer (Robertson & Spärck Jones; the exact
Okapi BM25 form given in Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") expressed as DataFrame ops:

- postings: explode tokens, keep only query terms — the filter lands
  BEFORE the shuffle, so only matching (doc, term) pairs move, the
  distributed analog of reading just those terms' posting lists.
- document frequencies: a per-term count over the postings — a tiny
  frame (≤ |query terms| rows), broadcast back.
- corpus stats (N, avgdl): one 1-row aggregate, broadcast via crossJoin.
- score: per-(doc, term) arithmetic, summed per doc — partial
  aggregation applies; the only data-sized shuffle keys on doc_id.

Everything is built-in functions (no UDF); ties rank deterministically
by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentick_spark.operators.text import ws_tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document matching ≥1 query term.

    idf(t)     = ln( (N − df + 0.5) / (df + 0.5) + 1 )   (Lucene form —
                 always positive, so a term in most docs can't produce
                 negative contributions)
    score(d)   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Output: (doc_id, score) — unrounded doubles; callers choose
    presentation rounding and top-k.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.col(text_col)).alias("__toks"),
    ).select("doc_id", "__toks", F.size("__toks").cast("double").alias("dl"))

    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(
                    F.col("__toks"), lambda t: t.isin(*[str(q) for q in query_terms])
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )

    # df must REFERENCE tf (docs where the term appears >= 1 time —
    # the same number as counting tf rows): as a bare row count the
    # optimizer eliminates the unused tf from this branch's copy of
    # the (doc, term) aggregate, the partial aggs stop canonicalizing
    # equal, and the corpus tokenize pipeline silently runs twice
    # (r14 plan_reuse_sweep finding, same class as tfidf_top_terms)
    df_t = tf.groupBy("term").agg(
        F.sum((F.col("tf") >= 1).cast("double")).alias("df")
    )

    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-N BM25 results, deterministically ordered: score is rounded
    to 6 places BEFORE ranking so cross-engine ulp noise can't reorder
    near-ties, then doc_id breaks exact ties."""
    scored = bm25_scores(docs, query_terms, **kwargs)
    r = scored.select("doc_id", F.round("score", 6).alias("score"))
    return r.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_n)
