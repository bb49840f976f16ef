"""LLM-data-pipeline workload over documents/embeddings: deduplication,
similarity search, text analysis, multimodal plumbing, streaming.

Oracle-checked where the computation is deterministic and
SQL-expressible; sketch/LSH variants are rows-only here and are asserted
against their exact counterparts in tests/.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentick_spark.operators import dedup as D
from opentick_spark.operators import multimodal as M
from opentick_spark.operators import similarity as S
from opentick_spark.operators import text as X
from opentick_spark.workload.util import load, load_raw

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id frame SPREAD for Python-codec corpus generators (r8): the
    documents table is a single small parquet file at test SFs, so its
    scan is ONE partition — a mapInPandas codec pipeline downstream of
    it ran on one core (measured: mjpg_frame_stats spent 16.5 s at
    sf0.1 doing ~26 s of single-threaded numpy JPEG work; encode+decode
    is 2.6 ms/doc). An id-only round-robin repartition ahead of the
    Python stage costs an 8-byte-row shuffle and engages every core; at
    warehouse scale the scan is already multi-split and the exchange
    coalesces under AQE."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )


# DuckDB equivalent of text.normalize_text (note the 'g' flag — DuckDB's
# regexp_replace is first-match-only by default, unlike Spark's)
# note \x{4e00} syntax: DuckDB's RE2 does not understand Java's \uXXXX
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9\\x{4e00}-\\x{9fff} ]', ' ', 'g'), '\\s+', ' ', 'g'))"
)
# DuckDB word-bigram shingles of the normalized text
_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split({norm}, ' '))), "
    "i -> string_split({norm}, ' ')[i] || ' ' || string_split({norm}, ' ')[i+1]))"
).format(norm="__norm")


# ---------------------------------------------------------------------------
# deduplication

@q(
    "dedup_exact",
    f"""
    SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM (SELECT doc_id, {_NORM} AS __norm FROM documents)
    GROUP BY __norm
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one hash shuffle (reference has
    none of this — pure extension surface)."""
    docs = load(spark, sf_dir, "documents")
    return D.exact_duplicates(docs).select("keeper", F.col("n_copies").cast("long"))


# Inverted-index formulation (same semantics as pairwise
# list_intersect over the distinct shingle sets: |A∪B| = |A|+|B|-|A∩B|),
# but the oracle itself scales like the operator — the all-pairs
# list_intersect version took DuckDB >1h at sf0.1; this runs in seconds.
_JACCARD_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, {_SHINGLES} AS sh
      FROM (SELECT doc_id, {_NORM} AS __norm FROM documents)
    ),
    e AS (SELECT doc_id, unnest(sh) AS s FROM t),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(sh) AS n FROM t)
    SELECT id_a, id_b,
           ROUND(i::DOUBLE / (na.n + nb.n - i), 6) AS jac
    FROM inter
    JOIN sz na ON na.doc_id = inter.id_a
    JOIN sz nb ON nb.doc_id = inter.id_b
    WHERE i::DOUBLE / (na.n + nb.n - i) >= 0.5
"""


@q("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise word-bigram Jaccard near-dups (ground truth for the
    approximate methods)."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jac", 6).alias("jac"))


@q("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dups, verified with exact Jaccard — same output
    contract as the exact operator, so it shares its oracle. 24 bands ×
    4 rows (96 hashes): this corpus's true pairs all sit at J≥0.818
    (measured at sf0.01 AND sf0.1), where per-pair miss probability is
    ≤6e-7 — 96/24 finds the identical 256-pair set as 128/32 while
    cutting a quarter of the signature aggregates and their codegen.
    3-row bands would lift J=0.5 recall to 0.986 but admit 13× the
    candidates from this corpus's heavy J≈0.3 tail, making exact
    verification the bottleneck — measured, not guessed."""
    docs = load(spark, sf_dir, "documents").repartition(
        2 * spark.sparkContext.defaultParallelism
    )  # r8: the 1-row-group scan is ONE partition; spread the
    # tokenize/explode map side across cores (measured -21..-42%)

    pairs = D.minhash_lsh_pairs(docs, n=2, num_hashes=96, bands=24, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jac", 6).alias("jac"))


@q(
    "dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (min-label propagation):
    the step that turns pairwise similarity into dedup decisions — the
    cluster id is the keeper. Oracle: DuckDB recursive CTE computing the
    min reachable label over the same exact-Jaccard edges."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    comps = D.connected_components(pairs)
    return comps.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
    )


@q(
    "dedup_star_clusters",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS clusters_identical
    FROM documents
    """,
)
def dedup_star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-fan-out LSH clustering (r5,
    operators/dedup.minhash_cluster_edges): per-bucket STAR edges
    (hub→member, n-1 per bucket) instead of the C(n,2) banded
    self-join — the scale escape for pathological duplicate groups
    (skew drill: one doc cloned 10k× makes the pairs op quadratic
    while star stays linear). Signatures aren't SQL-reproducible, so
    the checkable contract is self-verifying like dedup_simhash: the
    query computes connected components over BOTH graphs in-Spark and
    asserts they are identical on this corpus — the driver-green row
    pins the clustering-equivalence claim, the skew drill pins the
    asymptotics (PLANS.md). Both arms share one ``lsh_frames`` pass
    (r6): tokenize + minhash + banding run once, each arm reads the
    materialized shingle/bucket frames."""
    docs = load(spark, sf_dir, "documents")
    frames = D.lsh_frames(docs, num_hashes=96, bands=24)
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=96, bands=24, threshold=0.5, frames=frames
    )
    star = D.minhash_cluster_edges(
        docs, num_hashes=96, bands=24, threshold=0.5, frames=frames
    )
    # one propagation loop for both clusterings (tag-encoded union)
    comp_a, comp_b = D.connected_components_multi([pairs, star])
    ca = comp_a.withColumnRenamed("cluster", "ca")
    cb = comp_b.withColumnRenamed("cluster", "cb")
    mism = ca.join(cb, "id", "full_outer").select(
        (~F.col("ca").eqNullSafe(F.col("cb"))).cast("int").alias("m")
    )
    return docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        mism.agg(
            (F.coalesce(F.sum("m"), F.lit(0)) == 0).alias(
                "clusters_identical"
            )
        )
    )


@q(
    "embedding_norm_stats",
    """
    WITH v AS (
      SELECT list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (SELECT COUNT(*) AS n, AVG(sqrt(sq)) AS mn, AVG(sq) AS msq FROM v),
    p AS (
      SELECT pos, AVG(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)) AS m
      FROM embeddings,
           LATERAL unnest(range(1, len(embedding)+1)) AS u(pos)
      WHERE embedding IS NOT NULL
      GROUP BY pos
    ),
    c AS (SELECT SUM(m*m) AS c2 FROM p)
    SELECT CAST(n AS BIGINT) AS n_vectors,
           ROUND(mn, 6) AS mean_norm,
           ROUND(msq, 6) AS mean_sq_norm,
           ROUND(sqrt(c2), 6) AS centroid_norm,
           ROUND(c2 / msq, 6) AS isotropy_ratio
    FROM s, c
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-geometry health check before ANN/clustering/dedup:
    mean norm, mean squared norm, centroid norm, and the isotropy proxy
    ||centroid||²/E[||v||²] (→0 for well-spread embeddings, →1 when the
    space collapses toward a common direction — the classic symptom of
    a degenerate embedding model that silently ruins cosine dedup).
    Scale shape: norms are IN-ROW folds (narrow); the centroid is a
    dim-sized (64-key) posexplode aggregate — the only shuffle carries
    dim × partitions partial sums, invariant to corpus size. Rounded to
    6: cross-engine summation order on the means."""
    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    sq = F.expr(
        "aggregate(embedding, 0D, (a, x) -> a + cast(x as double) * "
        "cast(x as double))"
    )
    s = emb.select(sq.alias("sq")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.avg(F.sqrt(F.col("sq"))).alias("mn"),
        F.avg("sq").alias("msq"),
    )
    c = (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .agg(F.sum(F.col("m") * F.col("m")).alias("c2"))
    )
    return s.crossJoin(c).select(
        "n_vectors",
        F.round("mn", 6).alias("mean_norm"),
        F.round("msq", 6).alias("mean_sq_norm"),
        F.round(F.sqrt("c2"), 6).alias("centroid_norm"),
        F.round(F.col("c2") / F.col("msq"), 6).alias("isotropy_ratio"),
    )


@q(
    "incremental_neardup_assign",
    """
    SELECT CAST(SUM(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_delta,
           TRUE AS partitions_consistent
    FROM documents
    """,
)
def incremental_neardup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingest (r5, operators/dedup.
    lsh_cluster_index + incremental_cluster_assign): 80% of the corpus
    is clustered once into a (band, bucket) → cluster index, the 20%
    delta is assigned by probing that index + clustering a DELTA-SIZED
    graph — never re-clustering the corpus (the near-dup extension of
    ``incremental_dedup``'s exact-hash story). Self-checked like
    dedup_star_clusters: the query recomputes the FULL clustering of
    baseline ∪ delta in-Spark and asserts the delta docs are
    partitioned identically (cluster-representative comparison over
    delta ids) — the driver-green row pins incremental ≡ full on this
    corpus each round. All three arms (index build, delta assign, full
    re-cluster) share ONE ``lsh_frames`` pass over the corpus (r6):
    baseline/delta bucket occupancy are id-filters over the shared
    banded frame, so the corpus is tokenized and minhashed once."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    baseline = docs.filter(F.col("doc_id") % 5 != 4)
    delta = docs.filter(F.col("doc_id") % 5 == 4)
    _sh, banded = D.lsh_frames(docs, num_hashes=96, bands=24)
    b_banded = banded.filter(F.col("id") % 5 != 4)
    # index-build CC and full-recluster CC are independent — one
    # tag-encoded propagation loop runs both (the delta-assign CC has a
    # data dependency on the index, so it stays separate)
    comp_b, full = D.connected_components_multi(
        [
            D.star_edges_from_buckets(b_banded),
            D.star_edges_from_buckets(banded),
        ]
    )
    clusters_b = (
        baseline.select(F.col("doc_id").alias("id"))
        .join(comp_b, "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
    )
    idx = D.lsh_cluster_index(
        baseline,
        clusters=clusters_b,
        num_hashes=96,
        bands=24,
        banded=b_banded,
    )
    inc = D.incremental_cluster_assign(
        delta,
        idx,
        num_hashes=96,
        bands=24,
        banded=banded.filter(F.col("id") % 5 == 4),
    )
    fa = (
        delta.select(F.col("doc_id").alias("id"))
        .join(full, "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("fc"))
    )
    ri = inc.select(
        "id", F.min("id").over(Window.partitionBy("cluster")).alias("ra")
    )
    rf = fa.select(
        "id", F.min("id").over(Window.partitionBy("fc")).alias("rb")
    )
    mism = ri.join(rf, "id").select(
        (F.col("ra") != F.col("rb")).cast("int").alias("m")
    )
    return delta.agg(
        F.count(F.lit(1)).cast("long").alias("n_delta")
    ).crossJoin(
        mism.agg(
            (F.coalesce(F.sum("m"), F.lit(0)) == 0).alias(
                "partitions_consistent"
            )
        )
    )


@q(
    "dedup_simhash",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS blocking_complete
    FROM (SELECT {_NORM} AS __norm FROM documents)
    WHERE len(string_split(__norm, ' ')) >= 2
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-radius dedup, self-checked: xxhash64 signatures
    aren't reproducible in SQL, so the checkable contract is (a) the
    signature population — docs with ≥1 bigram shingle, oracle-exact —
    and (b) the pigeonhole guarantee itself: chunk-blocked candidate
    pairs at radius 8 must EQUAL the exhaustive all-pairs Hamming scan
    (100% recall by construction; the exhaustive scan is the in-Spark
    verifier, O(n²) popcounts — an oracle-only cost, not the scale
    path). A blocking bug flips the boolean and fails the hash gate."""
    docs = load(spark, sf_dir, "documents")
    # one signature pass, materialized: the blocked arm and BOTH sides
    # of the exhaustive verifier read the same checkpointed frame (r6)
    sigs = D.simhash_signatures(docs).localCheckpoint(eager=True)
    blocked = D.simhash_pairs(docs, max_hamming=8, sigs=sigs)
    exhaustive = (
        sigs.alias("x")
        .join(sigs.alias("y"), F.col("x.id") < F.col("y.id"))
        .filter(
            F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh"))) <= 8
        )
    )
    nd = sigs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    nb = blocked.agg(F.count(F.lit(1)).alias("__blocked"))
    ne = exhaustive.agg(F.count(F.lit(1)).alias("__exhaustive"))
    return (
        nd.crossJoin(nb)
        .crossJoin(ne)
        .select(
            "n_docs",
            (F.col("__blocked") == F.col("__exhaustive")).alias(
                "blocking_complete"
            ),
        )
    )


@q(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force baseline)."""
    emb = load(spark, sf_dir, "embeddings")
    pairs = D.embedding_cosine_pairs(emb, threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


@q(
    "semantic_contamination",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ev AS (SELECT * FROM e WHERE vec_id % 20 = 0),
    tr AS (SELECT * FROM e WHERE vec_id % 20 != 0),
    scored AS (
      SELECT tr.vec_id AS train_id, ev.vec_id AS eval_id,
             list_cosine_similarity(tr.v, ev.v) AS raw_cos
      FROM tr, ev
    ),
    ranked AS (
      SELECT train_id, eval_id, raw_cos,
             ROW_NUMBER() OVER (PARTITION BY train_id
                                ORDER BY raw_cos DESC, eval_id) AS rk
      FROM scored
    )
    SELECT train_id, eval_id, ROUND(raw_cos, 6) AS cos
    FROM ranked WHERE rk = 1 AND raw_cos >= 0.35
    """,
)
def semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination (r8): train vectors
    (vec_id %% 20 != 0) whose nearest eval vector (vec_id %% 20 = 0) is
    at cosine ≥ 0.35 — the semantic complement of the lexical
    ``contamination_8gram`` sweep (a paraphrased leak shares no 8-grams
    but keeps its embedding). ``similarity.semantic_contamination``:
    broadcast eval side, JVM cosine, per-train struct-max aggregate
    (map-side combinable — no train×eval pair shuffle)."""
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 20 == 0)
    # spread the train side: the 1-row-group embeddings scan is ONE
    # partition, which would single-core every train×eval JVM cosine
    tr = emb.filter(F.col("vec_id") % 20 != 0).repartition(
        2 * spark.sparkContext.defaultParallelism
    )
    out = S.semantic_contamination(tr, ev, threshold=0.35)
    return out.select(
        "train_id", "eval_id", F.round("cos", 6).alias("cos")
    )


# ---------------------------------------------------------------------------
# similarity search

@q(
    "sim_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS raw_cos
      FROM q JOIN embeddings c ON c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, ROUND(raw_cos, 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY raw_cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors: broadcast queries × corpus
    scan, JVM-side fold for the dot product, WindowGroupLimit top-k."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("long").alias("rank"),
    )


# The approximate-ANN queries emit a *checkable contract* instead of raw
# neighbor rows: the sketchy part (which neighbors) is verified in-Spark
# against the exact brute-force top-k (both deterministic: seeded
# hyperplanes/centroids, tie-broken ranks), and the oracle-matched
# columns (n_queries, n_results) come straight from the data. A recall
# regression — broken bucketing, bad centroid routing, quantizer drift —
# flips the boolean and fails the driver's hash gate.
_SIM_SELFCHECK_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(5 * COUNT(*) AS BIGINT) AS n_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
"""


def _sim_selfcheck(
    spark: SparkSession, sf_dir: str, approx_fn, min_recall: float, k: int = 5
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, k=k).select(
        "query_id", "neighbor_id"
    )
    approx = approx_fn(emb, queries).select("query_id", "neighbor_id")
    hits = approx.join(exact, ["query_id", "neighbor_id"])
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nr = approx.agg(F.count(F.lit(1)).cast("long").alias("n_results"))
    nh = hits.agg(F.count(F.lit(1)).alias("__hits"))
    return (
        nq.crossJoin(nr)
        .crossJoin(nh)
        .select(
            "n_queries",
            "n_results",
            (
                F.col("__hits")
                >= F.lit(min_recall) * F.lit(k) * F.col("n_queries")
            ).alias("recall_ok"),
        )
    )


@q("sim_topk_lsh", _SIM_SELFCHECK_ORACLE)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k, self-checked vs exact: 8-bit sketch,
    Hamming-2 multiprobe (37/256 buckets ≈ 14% of the corpus per query;
    measured recall@5 = 0.38 on this corpus, gated at ≥ 0.3)."""
    return _sim_selfcheck(
        spark,
        sf_dir,
        lambda c, qs: S.lsh_topk(c, qs, k=5, bits=8, probe_hamming=2),
        min_recall=0.3,
    )


@q("sim_topk_ivf", _SIM_SELFCHECK_ORACLE)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed top-k, self-checked vs exact: 16 lists, nprobe=4 (25%
    of the corpus per query; measured recall@5 = 0.92 here, gated ≥ 0.8)."""
    return _sim_selfcheck(
        spark,
        sf_dir,
        lambda c, qs: S.ivf_topk(c, qs, k=5, ncentroids=16, nprobe=4),
        min_recall=0.8,
    )


@q("sim_topk_pq", _SIM_SELFCHECK_ORACLE)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k with exact re-rank of the PQ
    shortlist (Jégou et al. 2011): 16 sub-codebooks × 32 centroids →
    16-byte codes (16× smaller than the float vectors), shortlist=50,
    then full-precision cosine on just the shortlist. Measured recall@5
    = 0.96 at sf0.01; gated ≥ 0.8."""
    return _sim_selfcheck(
        spark,
        sf_dir,
        lambda c, qs: S.pq_topk_rerank(
            c, qs, k=5, shortlist=50, m=16, ncentroids=32
        ),
        min_recall=0.8,
    )


@q("sim_topk_quantized", _SIM_SELFCHECK_ORACLE)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over int8-quantized embeddings (4× smaller scans),
    self-checked vs exact float top-k: quantization error is ~1e-2 cosine
    (measured recall@5 = 0.98 here, gated ≥ 0.9)."""
    return _sim_selfcheck(
        spark,
        sf_dir,
        lambda c, qs: S.quantized_topk(c, qs, k=5),
        min_recall=0.9,
    )


# ---------------------------------------------------------------------------
# text analysis

@q(
    "text_quality",
    """
    WITH t AS (SELECT doc_id, text,
                      string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_bpe_tokens,
           ROUND(CASE WHEN length(text) = 0 THEN 0 ELSE
             length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g'))::DOUBLE
             / length(text) END, 6) AS punct_ratio,
           ROUND(len(list_filter(toks, x -> x IN ('the','and','of','to','is','in')))::DOUBLE
                 / len(toks), 6) AS stopword_ratio,
           ROUND(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 6)
             AS avg_word_len
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring metrics, all whole-stage-codegen built-ins."""
    docs = load(spark, sf_dir, "documents").repartition(
        2 * spark.sparkContext.defaultParallelism
    )  # r8: the 1-row-group scan is ONE partition; spread the
    # tokenize/explode map side across cores (measured -21..-42%)

    out = X.quality_metrics(docs)
    return out.select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("avg_word_len", 6).alias("avg_word_len"),
    )


def _lang_oracle() -> str:
    score = {
        lang: (
            "len(list_filter(toks, x -> x IN ({})))".format(
                ",".join(f"'{w}'" for w in words)
            )
        )
        for lang, words in X.LANG_MARKERS.items()
    }
    score["zh"] = (
        "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))"
    )
    # same argmax + alphabetical tie-break as operators.text.lang_id
    langs = sorted(score)
    expr = f"'{langs[0]}'"
    best = score[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN {score[lang]} > ({best}) THEN '{lang}' ELSE ({expr}) END"
        best = f"CASE WHEN {score[lang]} > ({best}) THEN {score[lang]} ELSE ({best}) END"
    return f"""
    WITH t AS (SELECT doc_id, text,
                      string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM documents)
    SELECT doc_id, ({expr}) AS pred_lang FROM t
    """


@q("text_lang_id", _lang_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-scoring language ID with deterministic tie-break."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", X.lang_id(F.col("text")).alias("pred_lang"))


@q(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint (md5 of normalized text); the
    rolling-hash variant is exercised in tests."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", X.md5_fingerprint(F.col("text")).alias("fp"))


@q(
    "text_token_count_total",
    """
    SELECT lang,
           SUM(len(string_split_regex(trim(lower(text)), '\\s+')))::BIGINT AS total_ws_tokens,
           SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))::BIGINT
             AS total_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def text_token_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language — the budget query every
    training-data pipeline runs."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(X.ws_token_count(F.col("text"))).cast("long").alias("total_ws_tokens"),
        F.sum(X.bpe_token_count(F.col("text"))).cast("long").alias("total_bpe_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@q(
    "corpus_pipeline",
    f"""
    WITH norm AS (SELECT doc_id, lang, text, {_NORM} AS nrm FROM documents),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nrm),
    q AS (
      SELECT n.doc_id, n.lang,
             len(string_split_regex(trim(lower(n.text)), '\\s+'))::BIGINT AS n_ws_tokens,
             CASE WHEN length(n.text) = 0 THEN 0 ELSE
               length(regexp_replace(n.text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))::DOUBLE
               / length(n.text) END AS punct_ratio
      FROM norm n JOIN keepers k ON n.doc_id = k.doc_id
    )
    SELECT doc_id, lang, n_ws_tokens FROM q
    WHERE n_ws_tokens >= 5 AND punct_ratio < 0.2
    """,
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data pipeline: exact-dedup keepers → quality
    gates (token count, punctuation ratio) → clean corpus. One dedup
    shuffle + narrow filters; the shape every corpus build runs before
    tokenization."""
    docs = load(spark, sf_dir, "documents")
    keepers = D.exact_duplicates(docs).select(F.col("keeper").alias("doc_id"))
    kept = docs.join(keepers, "doc_id")
    scored = X.quality_metrics(kept)
    return (
        scored.filter((F.col("n_ws_tokens") >= 5) & (F.col("punct_ratio") < 0.2))
        .select("doc_id", "lang", F.col("n_ws_tokens").cast("long"))
    )


@q(
    "incremental_dedup",
    f"""
    WITH n AS (SELECT doc_id, {_NORM} AS nm FROM documents)
    SELECT a.doc_id,
           EXISTS(SELECT 1 FROM n b
                  WHERE b.doc_id % 4 != 0 AND b.nm = a.nm) AS dup_of_existing
    FROM n a WHERE a.doc_id % 4 = 0
    """,
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup over the commit log — the shape a 100 TB
    pipeline actually runs day-to-day: the initial corpus lands as one
    commit, a delivery adds new docs, ``TableStore.diff`` isolates
    exactly the added rows, and only THOSE are fingerprinted and checked
    against the existing corpus (broadcast-sized delta joins the
    full-corpus fingerprints; nothing re-deduplicates the whole table).
    Oracle: DuckDB replays the same existing-vs-added split directly on
    the documents table."""
    import tempfile

    from opentick_spark.engine import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_incr_"))
    eng.execute("create database c")
    eng.use("c")
    eng.execute("create table docs(doc_id bigint, txt text, primary key(doc_id))")
    st = eng.store("c", "docs")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("txt")
    )
    st.append_dataframe(docs.filter(F.col("doc_id") % 4 != 0))
    s1 = st.current_seq()
    st.append_dataframe(docs.filter(F.col("doc_id") % 4 == 0))

    fp = lambda df: df.withColumn(  # noqa: E731
        "__fp", F.md5(X.normalize_text(F.col("txt")))
    )
    added = fp(st.diff(spark, s1).filter(F.col("change") == "added"))
    existing = fp(st.read(spark, as_of_seq=s1)).select("__fp").distinct()
    return (
        added.join(
            existing.withColumn("__hit", F.lit(True)), "__fp", "left"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("__hit"), F.lit(False)).alias("dup_of_existing"),
        )
    )


# first-8-hex-chars-of-md5 → integer, DuckDB side (matches Spark's
# conv(substring(md5(x), 1, 8), 16, 10))
_H8 = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> strpos('0123456789abcdef', substr(md5({x}), i, 1)) - 1), "
    "(a, b) -> a * 16 + b)"
)


@q(
    "negative_sampling",
    f"""
    WITH ids AS (SELECT doc_id FROM documents),
    cand AS (
      SELECT doc_id AS neg_id,
             {_H8.format(x="doc_id::VARCHAR")} % 32 AS b
      FROM ids
    ),
    slots AS (
      SELECT doc_id, j AS slot,
             {_H8.format(x="doc_id::VARCHAR || '#' || j::VARCHAR")} % 32 AS b
      FROM ids, (SELECT unnest(range(0, 4)) AS j)
    ),
    cj AS (
      SELECT s.doc_id, s.slot, c.neg_id,
             md5(c.neg_id::VARCHAR || '@' || s.doc_id::VARCHAR
                 || '#' || s.slot::VARCHAR) AS r
      FROM slots s JOIN cand c ON c.b = s.b AND c.neg_id != s.doc_id
    )
    SELECT doc_id, slot, min_by(neg_id, r) AS neg_id
    FROM cj GROUP BY doc_id, slot
    """,
)
def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/text.negative_samples): 4 md5-arithmetic partners per
    doc, reproducible with no RNG state — bucket equi-join + min_by,
    never a cross join. The oracle replays the identical md5 scheme in
    DuckDB, so every sampled pair is value-checked."""
    docs = load(spark, sf_dir, "documents")
    return X.negative_samples(docs, id_col="doc_id", k=4, buckets=32)


_WS_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@q(
    "text_chunking",
    f"""
    WITH t AS (SELECT doc_id, {_WS_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS st
      FROM t
    )
    SELECT doc_id AS id, ((st - 1) // 24)::BIGINT AS chunk_idx,
           array_to_string(toks[st:st+31], ' ') AS chunk_text,
           LEAST(32, len(toks) - st + 1)::INT AS n_tokens
    FROM s WHERE len(toks) - st + 1 > 0
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks, 8-token
    overlap) — context-window prep; zero-shuffle, parallel over splits."""
    docs = load(spark, sf_dir, "documents")
    out = X.chunk_documents(docs, chunk_tokens=32, overlap=8)
    return out.select(
        "id", F.col("chunk_idx").cast("long"), "chunk_text", "n_tokens"
    )


@q(
    "text_pii_redaction",
    """
    WITH t AS (
      SELECT doc_id,
             text || ' reach me at user' || doc_id ||
             '@mail.example.com or 192.168.1.' || (doc_id % 200) ||
             ' call +1 415-555-0' || (1000 + doc_id % 1000) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS clean
    FROM t
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / IPv4 / phone runs → typed placeholders).
    The corpus has no organic PII, so deterministic PII is synthesized
    per doc and redacted — exercising every pattern on every row."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" reach me at user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 192.168.1."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(" call +1 415-555-0"),
        (1000 + F.col("doc_id") % 1000).cast("string"),
    )
    return docs.select("doc_id", X.redact_pii(raw).alias("clean"))


_NGRAM8 = (
    "list_distinct(list_transform("
    "range(1, greatest(len(__toks) - 6, 1)), "
    "i -> array_to_string(__toks[i:i+7], ' ')))"
)


@q(
    "contamination_8gram",
    f"""
    WITH t AS (
      SELECT doc_id, {_NGRAM8} AS sh
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS __toks FROM documents)
    )
    SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
           len(list_intersect(c.sh, b.sh))::BIGINT AS n_shared
    FROM t c JOIN t b ON c.doc_id >= 50 AND b.doc_id < 50
    WHERE len(list_intersect(c.sh, b.sh)) >= 3
    """,
)
def contamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-decontamination: corpus docs sharing >= 3 distinct 8-grams
    with any 'benchmark' doc (doc_id < 50 stands in for the eval set).
    Inverted-index join, benchmark side broadcast."""
    docs = load(spark, sf_dir, "documents")
    out = D.ngram_contamination(
        docs.filter(F.col("doc_id") >= 50),
        docs.filter(F.col("doc_id") < 50),
        n=8,
        min_shared=3,
    )
    return out.select("corpus_id", "bench_id", F.col("n_shared").cast("long"))


@q(
    "ngram_novelty",
    f"""
    WITH t AS (
      SELECT doc_id, source, list_distinct(list_transform(
               range(1, greatest(len(__toks) - 3, 1)),
               i -> array_to_string(__toks[i:i+4], ' '))) AS sh
      FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS __toks
            FROM documents)
    ),
    g AS (SELECT doc_id, source, unnest(sh) AS g FROM t),
    totals AS (SELECT doc_id, source, COUNT(*)::BIGINT AS n_ngrams
               FROM g GROUP BY 1, 2),
    novel AS (
      SELECT first_id, COUNT(*)::BIGINT AS n_novel
      FROM (SELECT g, MIN(doc_id) AS first_id FROM g GROUP BY 1)
      GROUP BY 1
    )
    SELECT totals.source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(totals.n_ngrams)::BIGINT AS total_ngrams,
           SUM(COALESCE(novel.n_novel, 0))::BIGINT AS novel_ngrams,
           SUM(CASE WHEN COALESCE(novel.n_novel, 0) = totals.n_ngrams
                    THEN 1 ELSE 0 END)::BIGINT AS fully_novel_docs
    FROM totals LEFT JOIN novel ON totals.doc_id = novel.first_id
    GROUP BY 1
    """,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 5-gram novelty accounting (r14) — how much of each
    source is text the corpus had NOT seen before it (first occurrence
    by lowest doc_id, the ingest-order convention): the
    redundancy-growth / corpus-saturation curve. Exact integer tallies,
    so the oracle is value-exact. One shingle pass + two hash aggs
    (per-doc counts; per-gram min-id, whose OUTPUT grouped by first id
    IS the novel count — no join back on the gram); docs with < 5
    tokens have no 5-grams and are excluded by both engines."""
    docs = load(spark, sf_dir, "documents")
    return D.ngram_novelty(docs, n=5, group_cols=("source",))


@q(
    "pack_sequences_by_lang",
    f"""
    WITH t AS (
      SELECT lang, doc_id, len({_WS_TOKS})::BIGINT AS n_tokens FROM documents
    )
    SELECT lang, doc_id,
           COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS tokens_before,
           (COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 2048)::BIGINT AS seq_id
    FROM t
    """,
)
def pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: docs laid out in id order per language,
    assigned to 2048-token training sequences by prefix-sum fill — one
    window pass, one shuffle on the group key."""
    docs = load(spark, sf_dir, "documents")
    with_counts = docs.select(
        "lang", "doc_id", X.ws_token_count(F.col("text")).alias("n_tokens")
    )
    return X.pack_sequences(with_counts, ["lang"], budget=2048)


# ---------------------------------------------------------------------------
# multimodal plumbing

@q(
    "multimodal_features",
    "SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes FROM documents",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (Arrow batches).
    The oracle checks the byte accounting; the feature vectors themselves
    are validated in tests (deterministic stub decode)."""
    docs = load(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    feats = M.extract_features(with_payload, decode="fake")
    return feats.select("id", F.col("n_bytes").cast("long").alias("n_bytes"))


@q(
    "multimodal_frame_sample",
    """
    WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id AS id,
           CAST(unnest(range(0, (n % 300) + 1, 30)) AS BIGINT) AS frame_idx
    FROM t
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: metadata-driven sequence+explode, no
    decode needed to plan the sampling. Fully deterministic (n_frames is
    a pure function of payload size), so the oracle replays the same
    arithmetic — Spark's inclusive sequence(0, nf-1, 30) ≡ DuckDB's
    half-open range(0, nf, 30)."""
    docs = load(spark, sf_dir, "documents")
    out = M.frame_sample(
        M.attach_payload(docs, media_type="video"), every_n=30
    )
    return out.select("id", F.col("frame_idx").cast("long").alias("frame_idx"))


@q(
    "multimodal_audio_windows",
    """
    WITH t AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    w AS (
      SELECT doc_id, n,
             unnest(range(0, CAST(ceil(n / 400.0) AS BIGINT))) AS i
      FROM t WHERE n > 0
    )
    SELECT doc_id AS id, i AS win_idx, i * 400 AS start_byte,
           LEAST(400, n - i * 400) AS n_bytes
    FROM w
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing without decode: chunk boundaries are integer math
    on (sample_rate × bytes_per_sample × window), each chunk a JVM-side
    binary slice (operators/multimodal.audio_windows — narrow plan, no
    shuffle). The boundary arithmetic is fully deterministic, so the
    oracle replays it from octet_length; the byte slices themselves are
    pinned by the reassembly unit test."""
    docs = load(spark, sf_dir, "documents")
    wp = M.attach_payload(docs, media_type="audio").withColumn(
        "media_meta",
        F.col("media_meta").withField("sample_rate", F.lit(200)),
    )
    out = M.audio_windows(wp, window_seconds=1, bytes_per_sample=2)
    return out.select("id", "win_idx", "start_byte", "n_bytes")


@q(
    "chunk_dedup_stats",
    f"""
    WITH t AS (
      SELECT doc_id, {_NORM} AS nt FROM documents
    ),
    base AS (
      SELECT doc_id, string_split(nt, ' ') AS w FROM t WHERE nt <> ''
    ),
    c AS (
      SELECT doc_id,
             md5(array_to_string(w[(i*20+1):((i+1)*20)], ' ')) AS h
      FROM base,
           LATERAL unnest(range(0, CAST(ceil(len(w)/20.0) AS BIGINT))) AS u(i)
    ),
    g AS (SELECT h, COUNT(*) AS cnt FROM c GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           ROUND(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS dup_ratio
    FROM c JOIN g USING (h) GROUP BY doc_id
    """,
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style exact chunk-level dedup (operators/text.
    chunk_dedup_metrics): fixed 20-word windows, md5 per chunk, global
    frequency by hash-agg — never pairwise. The sub-document dedup
    granularity between whole-doc exact dedup and token-level
    duplicate_spans. Oracle: DuckDB replays the same windows/hashes."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", X.normalize_text(F.col("text")).alias("text")
    )
    out = X.chunk_dedup_metrics(docs, chunk_words=20)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("dup_chunks").cast("long").alias("dup_chunks"),
        F.col("dup_ratio").cast("double").alias("dup_ratio"),
    )


@q(
    "char_entropy_stats",
    """
    WITH c AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
      FROM documents, LATERAL unnest(range(1, len(text)+1)) AS u(i)
    ),
    f AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM c GROUP BY doc_id, ch),
    n AS (SELECT doc_id, SUM(cnt) AS tot FROM f GROUP BY doc_id)
    SELECT doc_id, CAST(ANY_VALUE(tot) AS BIGINT) AS n_chars,
           ROUND(-SUM((cnt/tot) * log2(cnt/tot)), 6) AS char_entropy
    FROM f JOIN n USING (doc_id) GROUP BY doc_id
    """,
)
def char_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy gibberish signal (operators/text.char_entropy):
    Shannon bits/char per doc, computed IN-ROW by an Arrow-batched
    pandas UDF — zero shuffle at any scale, where the SQL oracle's
    explode-chars formulation shuffles every character (fine for DuckDB
    at oracle scale, the wrong plan at 100 TB — that contrast is the
    point). Rounded to 6 so cross-engine summation order can't flip the
    hash."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.length("text") > 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.length("text").cast("long").alias("n_chars"),
            F.round(X.char_entropy(F.col("text")), 6).alias("char_entropy"),
        )
    )


@q(
    "heaps_law_stats",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split({_NORM}, ' ')) AS t
      FROM documents WHERE {_NORM} <> ''
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab
      FROM tok GROUP BY source
    ),
    fit AS (
      SELECT ROUND(regr_slope(ln(vocab), ln(n_tokens)), 6) AS heaps_beta
      FROM s
    )
    SELECT s.source, s.n_tokens, s.vocab,
           ROUND(CAST(s.vocab AS DOUBLE) / s.n_tokens, 6) AS type_token_ratio,
           fit.heaps_beta
    FROM s, fit
    """,
)
def heaps_law_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth diagnostics per source + a corpus-level Heaps'
    law fit (V ≈ K·Nᵝ — β from an OLS regression of ln V on ln N across
    sources, one `regr_slope` aggregate): the curation signal that
    separates natural text (β ≈ 0.4–0.6) from template/boilerplate
    sources (β → 0, vocabulary saturates) and random noise (β → 1).
    Shape: one token-level hash aggregate per (source, token) — the
    vocabulary count is map-side combinable — then a source-cardinality
    regression broadcast back; nothing driver-side, nothing pairwise."""
    docs = load(spark, sf_dir, "documents").select(
        "source", X.normalize_text(F.col("text")).alias("nt")
    ).filter(F.col("nt") != "")
    tok = docs.select(
        "source", F.explode(X.ws_tokens(F.col("nt"))).alias("t")
    )
    s = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct("t").cast("long").alias("vocab"),
    )
    fit = s.agg(
        F.round(
            F.expr("regr_slope(ln(vocab), ln(n_tokens))"), 6
        ).alias("heaps_beta")
    )
    return s.crossJoin(F.broadcast(fit)).select(
        "source",
        "n_tokens",
        "vocab",
        F.round(F.col("vocab").cast("double") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        "heaps_beta",
    )


@q(
    "streaming_chunk_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    base AS (
      SELECT doc_id, string_split(nt, ' ') AS w FROM t WHERE nt <> ''
    ),
    c AS (
      SELECT md5(array_to_string(w[(i*20+1):((i+1)*20)], ' ')) AS h
      FROM base,
           LATERAL unnest(range(0, CAST(ceil(len(w)/20.0) AS BIGINT))) AS u(i)
    )
    SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_chunks FROM c
    """,
)
def streaming_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming chunk-level exact dedup (the ingest-time face of
    chunk_dedup_stats): documents arrive in THREE real micro-batches,
    each batch explodes its 20-word chunks with md5 hashes, and
    ``dropDuplicates`` keyed state emits every chunk hash exactly ONCE
    across the whole stream — first-occurrence-wins paragraph dedup at
    ingest, state sized by distinct chunks not deliveries. The result
    COUNTS the sink rows (not distinct-counts them), so any
    state-failure double emission would fail the oracle, which computes
    the batch-distinct chunk count in DuckDB."""
    name = "chunkdedup_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_chunk_src_")
    # three real files -> three micro-batches with maxFilesPerTrigger=1
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(
        src_dir
    )
    from opentick_spark.streaming.ingest import state_partitions

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    norm = X.normalize_text(F.col("text"))
    toks = X.ws_tokens(F.col("nt"))
    chunks = (
        stream.filter(F.length(F.trim(norm)) > 0)
        .select(norm.alias("nt"))
        .select(toks.alias("__w"), F.size(toks).alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            "__w",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.col("__n") / F.lit(20)).cast("long") - 1,
                )
            ).alias("__i"),
        )
        .select(
            F.expr("md5(array_join(slice(__w, __i * 20 + 1, 20), ' '))").alias(
                "h"
            )
        )
    )
    with state_partitions(spark, 8):
        query = (
            chunks.dropDuplicates(["h"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="otspark_chunk_ck_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks")
    )


@q(
    "streaming_image_dedup",
    """
    SELECT CAST(COUNT(DISTINCT doc_id % 40) AS BIGINT) AS n_distinct_images
    FROM documents
    """,
)
def streaming_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PERCEPTUAL image dedup (r6): the ingest-time face of
    ``image_dedup_dhash``. Images arrive in THREE real micro-batches
    (the same 40 planted pattern groups, brightness-jittered per clone
    so their bytes differ across deliveries), each batch decodes PNGs
    and computes dHash in a narrow Arrow map, and ``dropDuplicates``
    keyed state emits each perceptual hash exactly ONCE across the
    whole stream — first-occurrence-wins image dedup at ingest, state
    sized by DISTINCT images (40 hashes) not deliveries (N docs). The
    result COUNTS sink rows, so a state failure double-emitting, or a
    dHash failing brightness invariance across batches, fails the
    oracle."""
    import numpy as np
    import pandas as pd

    name = "imgdedup_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_img_src_")
    docs = _doc_ids(spark, sf_dir)
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(
        src_dir
    )
    from opentick_spark.streaming.ingest import state_partitions

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % 40)
                img = rng.randint(0, 180, size=(32, 36)).astype(np.int64)
                img = (img + (d % 3) * 10).astype(np.uint8)
                payloads.append(M._encode_png(img[:, :, None]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    pngs = stream.mapInPandas(gen, "doc_id long, payload binary")
    hashes = M.image_dhash(pngs).select("dhash")
    with state_partitions(spark, 8):
        query = (
            hashes.dropDuplicates(["dhash"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="otspark_img_ck_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_images")
    )


@q(
    "audio_dedup_fingerprint",
    """
    SELECT doc_id AS id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 35) AS keeper
    FROM documents
    """,
)
def audio_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL audio dedup over genuinely decoded PCM (r6 — the
    audio leg of the dedup trilogy beside image_dedup_dhash): every doc
    gets a real stdlib-``wave`` WAV whose sample pattern is seeded by
    doc_id % 35 (35 planted duplicate groups) and each clone is GAIN-
    scaled by 1 + doc_id % 3 — different bytes, same energy-envelope
    shape. ``multimodal.audio_dedup_groups`` must recover the planted
    partition exactly: the fingerprint (mean |amplitude| per window →
    derivative sign bits) is gain-invariant by construction. Keeper =
    min(doc_id) per group — arithmetic the oracle replays. Narrow
    Arrow decode; only 8-byte fingerprints shuffle."""
    import io
    import wave as _wave

    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % 35)
                base = rng.randint(-8000, 8000, size=3200)
                gain = 1 + d % 3
                pcm = (base * gain).astype("<i2").tobytes()
                bio = io.BytesIO()
                with _wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(pcm)
                payloads.append(bio.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    wavs = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.audio_dedup_groups(wavs).select(
        F.col("id").cast("long").alias("id"),
        F.col("keeper").cast("long").alias("keeper"),
    )


@q(
    "video_frame_stats",
    """
    WITH t AS (
      SELECT doc_id, 2 + doc_id % 4 AS nf,
             16 + (doc_id % 5) * 8 AS v1
      FROM documents
    )
    SELECT doc_id AS id,
           CAST(u.f AS INT) AS frame_idx,
           CAST(v1 + 32 + u.f * 2 AS DOUBLE) AS mean_pixel,
           CAST(32 AS DOUBLE) AS std_pixel,
           CAST(384 AS BIGINT) AS n_frame_bytes
    FROM t, LATERAL unnest(range(0, nf)) AS u(f)
    """,
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode at corpus scale (r6 — video joins
    WAV and PNG as stdlib-real): every doc gets a genuine AVI (RIFF
    hdrl/avih/strl/movi chunk tree, raw-DIB 24bpp frames with true
    bottom-up BGR padded rows) holding 2 + doc_id % 4 checkerboard
    frames whose pixel values are closed-form in (doc_id, frame_idx) —
    per-frame brightness ramps by 2/frame, so mean = v1+32+2f and
    std = 32 EXACTLY (dyadic). ``multimodal.video_frame_stats`` parses
    the actual container, slices each '00db' chunk, un-pads and flips
    the DIB rows, and measures TRUE pixels; the oracle replays the
    arithmetic per (doc, frame). Scale: synthesis + parse + stats are
    one narrow Arrow map; only per-frame scalars leave the executor."""
    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                nf = 2 + d % 4
                v1 = 16 + (d % 5) * 8
                yy, xx = np.mgrid[0:8, 0:16]
                checker = ((xx + yy) % 2) * 64
                frames = [
                    (checker + v1 + 2 * f).astype(np.uint8)[:, :, None]
                    .repeat(3, axis=2)
                    for f in range(nf)
                ]
                payloads.append(M._encode_avi(frames, fps=10))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    avis = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.video_frame_stats(avis).select(
        "id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("mean_pixel").cast("double").alias("mean_pixel"),
        F.col("std_pixel").cast("double").alias("std_pixel"),
        F.col("n_frame_bytes").cast("long").alias("n_frame_bytes"),
    )


@q(
    "video_clip_containment",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 25 AS g, (doc_id // 25) % 3 AS role
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(CASE WHEN a.role = 1 AND b.role = 0 THEN 1 ELSE 0 END
                AS INT) AS offset
    FROM d a JOIN d b ON a.g = b.g AND a.doc_id != b.doc_id
    WHERE (a.role = 0 AND b.role = 0)
       OR (a.role = 1 AND b.role IN (0, 1))
    """,
)
def video_clip_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP detection across a video corpus (r7): find every video
    whose entire frame sequence appears contiguously inside another —
    the re-upload/trim relation a whole-video fingerprint cannot see.
    ``multimodal.video_clip_containments``: per-frame dHash over
    genuinely decoded frames, ONE equi-join on the 8-byte frame hash,
    offset-grouped coverage count — never pairwise over videos.

    Planted design (closed-form oracle): group g = doc_id % 25 shares
    a 6-frame base sequence of seeded-random frames; role =
    (doc_id // 25) % 3 — 0 = full base, 1 = CLIP of frames 1-4,
    2 = decoy with doc-unique frames. Expected containments are pure
    doc_id arithmetic: equal sequences mutually contain at offset 0
    (base↔base, clip↔clip within a group), every clip sits in every
    base at offset 1, decoys match nothing."""
    # the containment op consumes the hash frame three times (|a| count
    # + both join sides); checkpointing makes the Python corpus-gen +
    # decode pipeline run ONCE (r8: 16.2 s → 10.2 s at sf0.1) — the
    # frame is narrow (id, idx, 8-byte hash), cheap to materialize
    hashes = _clip_hash_frames(spark, sf_dir).localCheckpoint(eager=True)
    return M.video_clip_containments(hashes).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("offset").cast("int").alias("offset"),
    )


def _clip_doc_payload(d: int) -> bytes:
    """One planted clip-corpus AVI payload: group g = doc_id %% 25,
    role = (doc_id // 25) %% 3 — full base (6 frames), clip (frames
    1-4), doc-unique decoy (3 frames). Shared by the payload corpus
    (``_clip_corpus``) and the fused gen→hash path
    (``_clip_hash_frames``) so the two compute byte-identical AVIs."""
    import numpy as np

    def frame(seed: int):
        a = np.random.RandomState(seed).randint(
            0, 256, (8, 16)
        ).astype(np.uint8)
        return a[:, :, None].repeat(3, axis=2)

    g, role = d % 25, (d // 25) % 3
    if role == 0:
        frames = [frame(1000 * g + f) for f in range(6)]
    elif role == 1:
        frames = [frame(1000 * g + f) for f in range(1, 5)]
    else:
        frames = [frame(7_000_000 + d * 10 + f) for f in range(3)]
    return M._encode_avi(frames, fps=10)


def _clip_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted clip-detection AVI corpus shared by
    ``video_clip_containment`` (pair path) and
    ``video_clip_containment_grouped`` (r8 scale path)."""
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        _clip_doc_payload(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.mapInPandas(gen, "doc_id long, payload binary")


def _clip_hash_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused gen→decode→hash twin of
    ``video_frame_hashes(_clip_corpus(...))`` (r16, guide §4: cross the
    Python boundary ONCE per media row): the identical AVI encode,
    container parse, frame decode and dHash per payload (the shared
    per-payload cores), without materializing the AVI bytes
    Python→JVM→Python between two mapInPandas stages. Exact output
    parity with the composed path is pinned by
    tests/test_fused_media_r16.py."""
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            out = {"id": [], "frame_idx": [], "fhash": []}
            for d in pdf["doc_id"]:
                d = int(d)
                rows = M.payload_frame_hash_rows(_clip_doc_payload(d))
                if rows is None:
                    continue
                for fi, fh in rows:
                    out["id"].append(d)
                    out["frame_idx"].append(fi)
                    out["fhash"].append(fh)
            yield pd.DataFrame(out)

    # the operator's own schema object — downstream nullability (and the
    # declared query schema) stays identical to the composed path
    return docs.mapInPandas(gen, M.VIDEO_FRAME_HASH_SCHEMA)


@q(
    "video_clip_containment_grouped",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 25 AS g, (doc_id // 25) % 3 AS role
      FROM documents
    ),
    agg AS (
      SELECT g,
             MIN(CASE WHEN role = 0 THEN doc_id END) AS rb,
             COUNT(CASE WHEN role = 0 THEN 1 END) AS nb,
             MIN(CASE WHEN role = 1 THEN doc_id END) AS rc,
             COUNT(CASE WHEN role = 1 THEN 1 END) AS nc
      FROM d GROUP BY g
    )
    SELECT rc AS rep_a, rb AS rep_b, CAST(1 AS INT) AS offset,
           CAST(nc AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM agg WHERE nc >= 1 AND nb >= 1
    UNION ALL
    SELECT rb, rb, CAST(0 AS INT), CAST(nb AS BIGINT),
           CAST(nb AS BIGINT)
    FROM agg WHERE nb > 1
    UNION ALL
    SELECT rc, rc, CAST(0 AS INT), CAST(nc AS BIGINT),
           CAST(nc AS BIGINT)
    FROM agg WHERE nc > 1
    """,
)
def video_clip_containment_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clip-containment SCALE path (r8, VERDICT r7 item 4) on the
    same planted corpus as ``video_clip_containment``:
    ``multimodal.video_clip_containment_groups`` collapses identical
    frame sequences globally, aligns one representative per distinct
    sequence, and returns the group-level relation — linear in distinct
    content where the pair path is quadratic in clones (skew drill in
    PLANS.md: pairs OOM at K=4000, groups flat at K=10000).

    The oracle replays the group arithmetic exactly: per planted group
    g, bases collapse to rep=min(base ids) and clips to rep=min(clip
    ids); output = clip-group→base-group at offset 1 plus the n>1
    mutual-containment cliques at offset 0; decoys are singleton groups
    that contain nothing — absent. Pair-path equivalence is pinned by
    test_video_clip_star_pair_equivalence."""
    # same one-pass checkpoint as video_clip_containment: the grouped
    # op consumes the hash frame for sequence collapse, the rep
    # semi-join, and the rep-level alignment
    hashes = _clip_hash_frames(spark, sf_dir).localCheckpoint(eager=True)
    return M.video_clip_containment_groups(hashes).select(
        F.col("rep_a").cast("long").alias("rep_a"),
        F.col("rep_b").cast("long").alias("rep_b"),
        F.col("offset").cast("int").alias("offset"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )


@q(
    "image_exif_audit",
    """
    SELECT doc_id,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CASE WHEN doc_id % 11 = 7 THEN NULL
                ELSE CAST(1 + doc_id % 8 AS INT) END AS orientation,
           CASE WHEN doc_id % 11 = 7 THEN FALSE
                ELSE doc_id % 5 = 0 END AS has_gps,
           doc_id % 11 != 7 AS has_exif,
           TRUE AS strip_clean
    FROM documents
    """,
)
def image_exif_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF privacy audit + scrub verification (r8): every training
    image's metadata — dimensions, Orientation, GPS presence — read
    HEADER-ONLY (marker walk + TIFF 6.0 IFD parse, no entropy decode:
    a corpus metadata sweep costs bytes-to-SOS, not decode CPU), then
    ``image_exif_strip`` removes every APPn/COM segment and the audit
    re-runs on the scrubbed bytes (``strip_clean`` — a residual Exif
    flips it and fails the driver hash; pixel identity after strip is
    pinned by pytest).

    Planted design (closed-form oracle): 8×8 JPEGs via the from-scratch
    encoder; orientation = 1 + doc_id %% 8; a GPSInfo IFD iff
    doc_id %% 5 == 0; docs with doc_id %% 11 == 7 carry NO Exif at all
    (the no-metadata path). All expectations are doc_id arithmetic."""
    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = np.full((8, 8), 40 + d % 50, dtype=np.uint8)
                app1 = (
                    None
                    if d % 11 == 7
                    else M._encode_exif(
                        orientation=1 + d % 8, gps=(d % 5 == 0)
                    )
                )
                payloads.append(M._encode_jpeg(img, quality=75, app1=app1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    # r15: the fused audit operator — one Python pass (audit + strip +
    # re-audit per payload) replaces meta JOIN strip→meta, so the JPEG
    # bytes cross the JVM↔Python boundary once and the checkpoint/join
    # disappear (guide §4; semantics pinned identical by the oracle and
    # test_exif_audit_fused_matches_composite)
    jp = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.image_exif_audit(jp).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("orientation").cast("int").alias("orientation"),
        "has_gps",
        "has_exif",
        "strip_clean",
    )


def _mjpg_oracle() -> str:
    """Closed-form oracle for the MJPG planted design: a block-constant
    grayscale-valued frame survives baseline-JPEG as pure DC
    quantization arithmetic (AC of a constant block is exactly 0 after
    the encoder's 1/256 coefficient snap; chroma of r=g=b content is
    exactly 128), so decoded pixel = lut[v] with lut the 256-entry
    quality-90 DC map precomputed HERE with plain integer/float
    arithmetic — independent of the codec under test. The verified
    absence of .5-boundary reconstructions at q_dc=3 (checked in
    tests/test_multimodal_jpeg.py's closed-form suite) makes the map
    fp-stable. Per frame the oracle averages the four block values
    through the lut and takes their population stddev."""
    import math

    q = 3  # quality-90 luma DC quant step: clip((16*20+50)//100, 1, 255)
    lut = []
    for v in range(256):
        f = 8.0 * (v - 128.0)
        qv = math.floor(abs(f) / q + 0.5) * (1 if f >= 0 else -1)
        lut.append(
            int(min(255, max(0, math.floor(qv * q / 8.0 + 128.0 + 0.5))))
        )
    lut_sql = "[" + ", ".join(str(x) for x in lut) + "]"
    return f"""
    WITH t AS (SELECT doc_id, 1 + doc_id % 3 AS nf FROM documents),
    fr AS (
      SELECT doc_id, CAST(u.f AS INT) AS frame_idx
      FROM t, LATERAL unnest(range(0, nf)) AS u(f)
    ),
    blk AS (
      SELECT doc_id, frame_idx,
             {lut_sql}[
               16 * (doc_id % 8) + 24 * u.b + 2 * frame_idx + 8 + 1
             ]::DOUBLE AS g
      FROM fr, LATERAL unnest(range(0, 4)) AS u(b)
    )
    SELECT doc_id AS id, frame_idx,
           ROUND(AVG(g), 6) AS mean_pixel,
           ROUND(COALESCE(STDDEV_POP(g), 0), 6) AS std_pixel
    FROM blk GROUP BY doc_id, frame_idx
    """


def _mjpg_doc_payload(d: int) -> bytes:
    """One planted MJPG AVI payload (1 + d %% 3 frames of 16×16
    block-constant color). Shared by the fused registry row and the
    parity test's composed twin so both encode byte-identical AVIs."""
    import numpy as np

    nf = 1 + d % 3
    frames = []
    for f in range(nf):
        vals = np.array(
            [
                [16 * (d % 8) + 24 * b + 2 * f + 8 for b in (0, 1)],
                [16 * (d % 8) + 24 * b + 2 * f + 8 for b in (2, 3)],
            ],
            dtype=np.uint8,
        )
        a = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        frames.append(a[:, :, None].repeat(3, axis=2))
    return M._encode_avi(frames, fps=10, codec="MJPG")


@q("mjpg_frame_stats", _mjpg_oracle())
def mjpg_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Motion-JPEG decode at corpus scale (r7 — the last media
    branch goes real, completing WAV→PNG→AVI→JPEG): every doc gets a
    genuine MJPG AVI (each '00dc' chunk a real baseline JPEG from the
    from-scratch encoder — Annex K tables, Huffman entropy coding),
    holding 1 + doc_id % 3 frames of 16×16 block-constant
    grayscale-valued color; the fused gen→decode pass (r16, guide §4:
    one Python stage per media row — the shared
    ``multimodal.payload_frame_stat_rows`` core) parses the container,
    runs the full JPEG decode path (Huffman + dequant + IDCT + color
    convert) per frame, and measures TRUE pixels, without shipping the
    AVI bytes Python→JVM→Python between two mapInPandas stages. Exact
    output parity with the composed gen→``video_frame_stats`` path is
    pinned by tests/test_fused_media_r16.py. The planted DC-only
    design makes the lossy codec's output EXACT closed-form (see
    _mjpg_oracle). Scale: synthesis + decode + stats are one narrow
    Arrow map; only per-frame scalars leave the executor."""
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            out = {
                "id": [], "frame_idx": [], "mean_pixel": [], "std_pixel": []
            }
            for d in pdf["doc_id"]:
                d = int(d)
                rows = M.payload_frame_stat_rows(_mjpg_doc_payload(d))
                if rows is None:
                    continue
                for fi, mean, std, _nbytes in rows:
                    out["id"].append(d)
                    out["frame_idx"].append(fi)
                    out["mean_pixel"].append(mean)
                    out["std_pixel"].append(std)
            yield pd.DataFrame(out)

    from pyspark.sql import types as T

    # prefix of multimodal.VIDEO_FRAME_STATS_SCHEMA (same nullability) so
    # the declared query schema is unchanged from the composed path
    schema = T.StructType(
        [f for f in M.VIDEO_FRAME_STATS_SCHEMA.fields
         if f.name != "n_frame_bytes"]
    )
    stats = docs.mapInPandas(gen, schema)
    return stats.select(
        "id",
        "frame_idx",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        F.round("std_pixel", 6).alias("std_pixel"),
    )


@q(
    "image_neardup_hamming",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images, TRUE AS blocking_complete
    FROM documents
    """,
)
def image_neardup_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image detection under pixel noise (r6): clones of
    the doc_id %% 40 base patterns get per-clone random pixel
    perturbations, so their dHashes differ by a FEW bits — exact-hash
    grouping would split them; Hamming-radius blocking must catch them.
    Signature values aren't SQL-reproducible, so the checkable contract
    is the pigeonhole guarantee itself (dedup_simhash's pattern):
    ``image_neardup_pairs``' blocked candidates at radius 6 must EQUAL
    the exhaustive all-pairs Hamming scan — 100%% recall by
    construction; the exhaustive arm is the in-Spark verifier (an
    oracle-only quadratic, not the scale path). A blocking bug flips
    the boolean and fails the driver's value hash."""
    import numpy as np
    import pandas as pd

    from opentick_spark.operators.dedup import hamming_blocked_pairs

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % 40)
                img = rng.randint(0, 180, size=(32, 36)).astype(np.int64)
                # per-clone noise: a different rng stream from doc_id
                noise = np.random.RandomState(10_000 + d)
                ij = noise.randint(0, 32 * 36, size=8)
                flat = img.reshape(-1)
                flat[ij] = np.clip(
                    flat[ij] + noise.randint(-40, 41, size=8), 0, 179
                )
                payloads.append(
                    M._encode_png(img.astype(np.uint8)[:, :, None])
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    pngs = docs.mapInPandas(gen, "doc_id long, payload binary")
    sigs = M.image_dhash(pngs).withColumnRenamed("dhash", "sh")
    sigs = sigs.localCheckpoint(eager=True)  # consumed by both arms
    blocked = hamming_blocked_pairs(sigs, max_hamming=6)
    exhaustive = (
        sigs.alias("x")
        .join(sigs.alias("y"), F.col("x.id") < F.col("y.id"))
        .filter(
            F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh"))) <= 6
        )
    )
    ni = sigs.agg(F.count(F.lit(1)).cast("long").alias("n_images"))
    nb = blocked.agg(F.count(F.lit(1)).alias("__blocked"))
    ne = exhaustive.agg(F.count(F.lit(1)).alias("__exhaustive"))
    return (
        ni.crossJoin(nb)
        .crossJoin(ne)
        .select(
            "n_images",
            (F.col("__blocked") == F.col("__exhaustive")).alias(
                "blocking_complete"
            ),
        )
    )


@q(
    "video_dedup_fingerprint",
    """
    SELECT doc_id AS id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 30) AS keeper
    FROM documents
    """,
)
def video_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL video dedup over genuinely decoded frames (r6 — the
    fourth modality leg: text shingles, image dHash, audio envelope,
    video frame-hash sequence). Every doc gets a real raw-DIB AVI whose
    frame patterns are seeded by doc_id % 30 (30 planted duplicate
    groups, 3 frames each) and each clone is brightness-regraded by
    (doc_id % 3)·12 across ALL frames — different bytes in every frame,
    same gradient structure. ``multimodal.video_dedup_groups`` must
    recover the planted partition exactly: per-frame dHash is
    brightness-invariant and the order-sensitive FNV mix pins the
    sequence. Keeper = min(doc_id) per group — arithmetic the oracle
    replays."""
    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % 30)
                regrade = (d % 3) * 12
                frames = []
                for _f in range(3):
                    img = rng.randint(0, 180, size=(16, 18)).astype(np.int64)
                    frames.append(
                        (img + regrade)
                        .astype(np.uint8)[:, :, None]
                        .repeat(3, axis=2)
                    )
                payloads.append(M._encode_avi(frames, fps=10))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    avis = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.video_dedup_groups(avis).select(
        F.col("id").cast("long").alias("id"),
        F.col("keeper").cast("long").alias("keeper"),
    )


@q(
    "wav_decode_features",
    """
    WITH t AS (
      SELECT doc_id, 400 + (doc_id % 7) * 150 AS nf,
             4096 + (doc_id % 5) * 1024 AS amp
      FROM documents
    )
    SELECT doc_id AS id,
           CAST(amp AS DOUBLE) / 32768 AS rms,
           CAST(amp AS DOUBLE) / 32768 AS peak,
           CAST(nf - 1 AS BIGINT) AS zero_crossings,
           CAST(nf AS DOUBLE) / 400 AS duration_s,
           CAST(ceil(nf / 400.0) AS BIGINT) AS n_windows
    FROM t
    """,
)
def wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode at corpus scale (no stub, no external codec):
    every doc gets a genuine RIFF/WAV payload written by the stdlib
    ``wave`` module — a ±amplitude square wave whose frame count and
    amplitude are closed-form in doc_id — then
    ``operators/multimodal.wav_features`` parses the actual header and
    decodes TRUE PCM with numpy (rms/peak/zero-crossings/duration), and
    ``wav_audio_windows`` counts 1-second windows of real sample
    frames. Alternating ±A square wave ⇒ rms = peak = A/2^15 exactly
    (dyadic — no float rounding), crossings = n_frames-1, so the oracle
    replays pure arithmetic. Scale posture: payload synthesis + decode
    are one narrow Arrow map each, the window count is a per-key count
    — nothing here shuffles more than the final tiny groupBy."""
    import io
    import struct as _struct
    import wave as _wave

    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                nf = 400 + (int(d) % 7) * 150
                amp = 4096 + (int(d) % 5) * 1024
                bio = io.BytesIO()
                with _wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(400)
                    pair = _struct.pack("<hh", amp, -amp)
                    w.writeframes(pair * (nf // 2))
                payloads.append(bio.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    wavs = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = M.wav_features(wavs)
    wins = (
        M.wav_audio_windows(wavs, window_seconds=1)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )
    return feats.join(wins, "id").select(
        "id",
        F.col("rms").cast("double").alias("rms"),
        F.col("peak").cast("double").alias("peak"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_s").cast("double").alias("duration_s"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


@q(
    "png_decode_features",
    """
    WITH t AS (
      SELECT doc_id,
             32 + (doc_id % 7) * 16 AS v1,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nc
      FROM documents
    )
    SELECT doc_id AS id,
           CAST(8 + (doc_id % 5) * 2 AS INT) AS width,
           CAST(6 + (doc_id % 3) * 2 AS INT) AS height,
           CAST(nc AS INT) AS n_channels,
           CAST(v1 + 32 AS DOUBLE) AS mean_pixel,
           CAST(32 AS DOUBLE) AS std_pixel,
           CAST(v1 AS INT) AS min_pixel,
           CAST(v1 + 64 AS INT) AS max_pixel
    FROM t
    """,
)
def png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode at corpus scale with ZERO codec dependencies
    (r6, VERDICT item 4 — the image analog of wav_decode_features): every
    doc gets a genuine PNG payload — zlib-DEFLATE IDAT, true scanline
    filters — whose pixels are a closed-form checkerboard in doc_id
    (v1/v1+64 alternating; even pixel count ⇒ mean = v1+32 and
    std = 32 EXACTLY, both dyadic — no float rounding), then
    ``operators/multimodal.png_features`` inflates, unfilters and
    measures TRUE pixel values. The scanline filter type cycles
    doc_id % 5, so all five PNG filters (None/Sub/Up/Average/Paeth)
    are decode-verified against the arithmetic oracle on every run.
    Scale posture: synthesis and decode are narrow Arrow maps — no
    shuffle, no driver collect."""
    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 + d % 5 * 2
                h = 6 + d % 3 * 2
                c = (1, 3, 4)[d % 3]
                v1 = 32 + (d % 7) * 16
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.where((xx + yy) % 2 == 0, v1, v1 + 64).astype(
                    np.uint8
                )
                img = np.repeat(img[:, :, None], c, axis=2)
                payloads.append(M._encode_png(img, filter_type=d % 5))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    pngs = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.png_features(pngs).select(
        "id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_channels").cast("int").alias("n_channels"),
        F.col("mean_pixel").cast("double").alias("mean_pixel"),
        F.col("std_pixel").cast("double").alias("std_pixel"),
        F.col("min_pixel").cast("int").alias("min_pixel"),
        F.col("max_pixel").cast("int").alias("max_pixel"),
    )


@q(
    "image_dedup_dhash",
    """
    SELECT doc_id AS id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 40) AS keeper
    FROM documents
    """,
)
def image_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL image dedup over genuinely decoded pixels (r6): every
    doc gets a real PNG whose pattern is seeded by doc_id % 40 — so the
    corpus carries 40 planted duplicate groups — and each clone is
    brightness-shifted by (doc_id % 3)·10, so the clones' BYTES (and
    any chunk/byte hash) differ while their pixel gradients are
    identical. ``multimodal.image_dedup_groups`` must recover the
    planted partition exactly: dHash (stdlib PNG decode → block-mean
    downsample → horizontal gradient signs) is invariant to the uniform
    brightness shift by construction. Keeper election = min(doc_id) per
    group — arithmetic the oracle replays. Scale: decode+hash is a
    narrow Arrow map; only the 8-byte hash shuffles."""
    import numpy as np
    import pandas as pd

    docs = _doc_ids(spark, sf_dir)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % 40)
                img = rng.randint(0, 180, size=(32, 36)).astype(np.int64)
                img = (img + (d % 3) * 10).astype(np.uint8)  # clone jitter
                payloads.append(M._encode_png(img[:, :, None]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    pngs = docs.mapInPandas(gen, "doc_id long, payload binary")
    return M.image_dedup_groups(pngs).select(
        F.col("id").cast("long").alias("id"),
        F.col("keeper").cast("long").alias("keeper"),
    )


# ---------------------------------------------------------------------------
# streaming

@q(
    "streaming_stateful_totals",
    """
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals maintained in keyed state across
    micro-batches. Oracle: after the stream drains, the final state per
    key must equal the batch aggregate."""
    from pyspark.sql import Window

    from opentick_spark.streaming.stateful import stateful_running_totals

    schema = load_raw(spark, sf_dir, "events").schema
    name = "stateful_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_state_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    from opentick_spark.streaming.ingest import state_partitions

    with state_partitions(spark, 8):
        query = stateful_running_totals(
            spark, src_dir, schema, name,
            tempfile.mkdtemp(prefix="otspark_state_ck_"),
        )
        query.awaitTermination()
    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        sink.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.round("sum_value", 4).alias("sum_value"),
            "min_value",
            "max_value",
        )
    )


@q(
    "streaming_session_windows",
    """
    WITH t AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE user_id < 10),
    m AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                       OR ts_us - LAG(ts_us) OVER w >= 3600000000
                  THEN 1 ELSE 0 END AS ns
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    s AS (
      SELECT user_id, ts_us,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM m
    )
    SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming sessionization (F.session_window stateful
    operator). Oracle: batch gaps-and-islands with the session_window
    boundary convention (a gap of exactly the threshold starts a NEW
    session — the window end is exclusive)."""
    schema = load_raw(spark, sf_dir, "events").schema
    name = "session_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_sess_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    from opentick_spark.streaming.ingest import session_window_counts, state_partitions

    with state_partitions(spark, 8):
        q_ = session_window_counts(
            spark,
            src_dir,
            schema,
            name,
            tempfile.mkdtemp(prefix="otspark_sess_ck_"),
        )
        q_.awaitTermination()
    out = spark.table(name).filter(F.col("user_id") < 10)
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("session_start_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@q(
    "streaming_dedup_ingest",
    """
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once deduplication: the source directory stages
    the events file TWICE (an at-least-once delivery), dropDuplicates on
    the PK emits each event exactly once — the aggregate over the sink
    must equal the batch aggregate over the ORIGINAL (unduplicated)
    table."""
    from opentick_spark.streaming.ingest import dedup_stream, state_partitions

    schema = load_raw(spark, sf_dir, "events").schema
    name = "dedup_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_dedup_src_")
    for i in range(2):  # duplicate delivery
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            os.path.join(src_dir, f"events_{i}.parquet"),
        )
    with state_partitions(spark, 8):
        q_ = dedup_stream(
            spark, src_dir, schema, name,
            tempfile.mkdtemp(prefix="otspark_dedup_ck_"), ["event_id"],
        )
        q_.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@q(
    "streaming_join_purchases",
    """
    WITH s AS (SELECT user_id, epoch_us(ts) AS s_us FROM events
               WHERE event_type = 'signup'),
    p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
          WHERE event_type = 'purchase')
    SELECT p.user_id, COUNT(*) AS n_pairs,
           CAST(COUNT(DISTINCT p.p_us) AS BIGINT) AS n_purchases
    FROM p JOIN s ON p.user_id = s.user_id
     AND p.p_us >= s.s_us AND p.p_us < s.s_us + 604800000000
    GROUP BY p.user_id
    """,
)
def streaming_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream join: purchases x signups of the same user
    within 7 days after signup, watermarks bounding the join state.
    Oracle: the equivalent batch time-range join."""
    from opentick_spark.streaming.ingest import state_partitions, stream_stream_join

    schema = load_raw(spark, sf_dir, "events").schema
    name = "ssj_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_ssj_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    with state_partitions(spark, 8):
        q_ = stream_stream_join(
            spark, src_dir, schema, name,
            tempfile.mkdtemp(prefix="otspark_ssj_ck_"),
        )
        q_.awaitTermination()
    sink = spark.table(name)
    return (
        sink.groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count_distinct(F.unix_micros("p_ts")).cast("long").alias("n_purchases"),
        )
    )


@q(
    "streaming_window_counts",
    """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS win_start_us,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: file stream over the events
    parquet → watermark → tumbling 1h window → memory sink (availableNow),
    then the sink is returned for comparison. The oracle is the batch
    equivalent — streaming and batch must agree on complete data."""
    from opentick_spark.streaming.ingest import windowed_event_counts

    schema = load_raw(spark, sf_dir, "events").schema
    name = "stream_sink_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="otspark_ckpt_")
    # the streaming file source needs a directory; stage a symlink
    src_dir = tempfile.mkdtemp(prefix="otspark_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    from opentick_spark.streaming.ingest import state_partitions

    with state_partitions(spark, 8):
        query = windowed_event_counts(spark, src_dir, schema, name, ckpt)
        query.awaitTermination()
    out = spark.table(name)
    return out.select(
        F.unix_micros(F.col("win.start")).alias("win_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@q(
    "streaming_enrich",
    """
    WITH s AS (
      SELECT user_id, epoch_us(MIN(ts)) AS signup_ts_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.user_id AS user_id, epoch_us(e.ts) AS ts_us, e.value AS value,
           s.signup_ts_us AS signup_ts_us
    FROM events e LEFT JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (stateless): the purchase
    firehose joins each micro-batch against a static per-user signup-time
    dimension — reference data attached in flight, stream side never
    shuffles. Oracle is the batch left join."""
    from opentick_spark.streaming.ingest import stream_static_enrich

    ev = load(spark, sf_dir, "events")
    schema = load_raw(spark, sf_dir, "events").schema
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.expr("min(ts) div 1000").alias("signup_ts_us"))
    )
    name = "stream_sink_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="otspark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="otspark_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    query = stream_static_enrich(spark, src_dir, schema, dim, name, ckpt)
    query.awaitTermination()
    return (
        spark.table(name)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "value",
            "signup_ts_us",
        )
    )


@q(
    "streaming_ohlcv",
    """
    SELECT user_id,
           epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bar_ts_us,
           min_by(value, ts) AS open, MAX(value) AS high, MIN(value) AS low,
           max_by(value, ts) AS close, COUNT(*) AS n_ticks,
           ROUND(SUM(value), 4) AS volume
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    """,
)
def streaming_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live tick→bar maintenance: REAL Structured Streaming execution of
    the hourly OHLCV rollup (streaming/ingest.streaming_ohlcv_bars) —
    the streaming twin of the batch `ohlcv_rollup`. The oracle is the
    batch SQL: on complete input the self-maintaining bars must equal the
    offline rollup exactly (open/close ordered by the raw ns ts)."""
    from opentick_spark.streaming.ingest import state_partitions, streaming_ohlcv_bars

    schema = load_raw(spark, sf_dir, "events").schema
    name = "stream_sink_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="otspark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="otspark_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    with state_partitions(spark, 8):
        query = streaming_ohlcv_bars(spark, src_dir, schema, name, ckpt)
        query.awaitTermination()
    out = spark.table(name)
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("bar_ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.round("volume", 4).alias("volume"),
    )


# ---------------------------------------------------------------------------
# extended text ops (EXTRA registry — oracle-checked by tests/oracle_check.py)

@q(
    "text_repetition",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)
    ),
    cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
    top AS (
      SELECT doc_id, b, c,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, b ASC) rn
      FROM cnt
    )
    SELECT w.doc_id,
           len(ws)::BIGINT AS n_words,
           ROUND(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 6)
             AS dup_word_frac,
           COALESCE(t.b, '') AS top_bigram,
           ROUND(COALESCE(t.c::DOUBLE / (len(ws) - 1), 0.0), 6)
             AS top_bigram_frac
    FROM w LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (dup-word fraction, top-bigram
    coverage) computed per-row with a sorted-run higher-order aggregate —
    zero Exchange, no exploded-token shuffle (see
    operators/text.repetition_metrics)."""
    docs = load(spark, sf_dir, "documents")
    out = X.repetition_metrics(docs)
    return out.select(
        "doc_id",
        "n_words",
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        "top_bigram",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


_BM25_TERMS = ["spark", "window", "join"]

@q(
    "text_bm25_search",
    """
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*)::DOUBLE AS n_docs, AVG(len(ws)::DOUBLE) AS avgdl
      FROM base
    ),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*)::DOUBLE AS tf
      FROM (SELECT doc_id, len(ws)::DOUBLE AS dl, unnest(ws) AS term
            FROM base)
      WHERE term IN ('spark', 'window', 'join')
      GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term)
    SELECT doc_id,
           ROUND(SUM( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                      * tf * 2.2
                      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ), 6)
             AS score
    FROM tf JOIN dft USING (term), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search: postings filtered before any shuffle, term
    stats broadcast, one doc-keyed aggregation (operators/search.py).
    Rounded-then-ranked so the top-20 cut is engine-stable."""
    from opentick_spark.operators import search as SE

    docs = load(spark, sf_dir, "documents")
    return SE.bm25_topk(docs, _BM25_TERMS, top_n=20)


@q(
    "dedup_aware_split_stats",
    f"""
    WITH n AS (SELECT doc_id, {_NORM} AS nrm FROM documents),
    g AS (SELECT nrm, MIN(doc_id) AS rep FROM n GROUP BY 1),
    d AS (
      SELECT n.doc_id, g.rep,
             list_reduce(
               list_transform(range(1, 9),
                 i -> strpos('0123456789abcdef',
                             substr(md5(g.rep::VARCHAR), i, 1)) - 1),
               (a, b) -> a * 16 + b) % 100 AS bucket
      FROM n JOIN g USING (nrm)
    ),
    s AS (
      SELECT doc_id, rep,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM d
    )
    SELECT split, COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT rep)::BIGINT AS n_groups,
           CAST(0 AS BIGINT) AS leaked_groups
    FROM s GROUP BY 1
    """,
)
def dedup_aware_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free dataset splitting (r8, ``text.dedup_aware_split``):
    exact-duplicate documents inherit their GROUP representative's
    md5-bucket split, so a duplicate pair can never straddle
    train/test — the eval leak a per-doc hash split allows.
    ``leaked_groups`` counts groups observed in >1 split IN-SPARK
    (zero by construction; a wiring bug flips the value and fails the
    driver hash, while the oracle replays the whole group → rep →
    bucket pipeline value-exactly)."""
    docs = load(spark, sf_dir, "documents")
    out = X.dedup_aware_split(docs)
    leaks = (
        out.groupBy("group_rep")
        .agg(F.countDistinct("split").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_groups"))
    )
    stats = out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("group_rep").cast("long").alias("n_groups"),
    )
    return stats.crossJoin(F.broadcast(leaks)).select(
        "split", "n_docs", "n_groups", "leaked_groups"
    )


def _export_ipc_shards(docs: DataFrame, out_dir: str) -> None:
    """Export (doc_id, lang, n_chars) as Feather-v2 shards, one IPC file
    per partition, written executor-side inside mapInPandas (no driver
    collect) — shared by the batch roundtrip entry and its streaming
    twin (r9) so both ingest the byte-identical corpus."""
    import pandas as pd

    def write_shards(it):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [pa.Table.from_pandas(pdf) for pdf in it if len(pdf)]
        if tables:
            tbl = pa.concat_tables(tables)
            with pa.OSFile(f"{out_dir}/part-{pid:05d}.arrow", "wb") as f:
                with pa.ipc.new_file(f, tbl.schema) as w:
                    w.write_table(tbl)
            yield pd.DataFrame({"n": [tbl.num_rows]})
        else:
            yield pd.DataFrame({"n": [0]})

    shards = docs.repartition(8).mapInPandas(write_shards, "n long")
    shards.write.mode("overwrite").format("noop").save()


def _export_zst_shards(docs: DataFrame, out_dir: str) -> None:
    """Export (doc_id, lang, n_chars) as ``.jsonl.zst`` shards with
    every doc_id %% 50 == 13 line PLANTED corrupt (truncated JSON) —
    shared by the batch ingest entry and its streaming twin (r9)."""
    import pandas as pd

    def write_shards(it):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sink = pa.BufferOutputStream()
        n = 0
        with pa.output_stream(sink, compression="zstd") as s:
            for pdf in it:
                for d, lang, nc in zip(
                    pdf["doc_id"], pdf["lang"], pdf["n_chars"]
                ):
                    if int(d) % 50 == 13:
                        s.write(f'{{"doc_id": {int(d)}, "lang":\n'.encode())
                    else:
                        s.write(
                            f'{{"doc_id": {int(d)}, "lang": "{lang}", '
                            f'"n_chars": {int(nc)}}}\n'.encode()
                        )
                    n += 1
        if n:
            with open(f"{out_dir}/part-{pid:05d}.jsonl.zst", "wb") as f:
                f.write(sink.getvalue().to_pybytes())
        yield pd.DataFrame({"n": [n]})

    shards = docs.repartition(8).mapInPandas(write_shards, "n long")
    shards.write.mode("overwrite").format("noop").save()


@q(
    "arrow_ipc_roundtrip_stats",
    """
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def arrow_ipc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC interchange roundtrip (r8, ``sources.read_arrow_ipc``):
    the corpus is exported executor-side as Feather-v2 shards (one IPC
    file per partition, written inside mapInPandas — no driver
    collect; shards land on a shared path, here local tmp) and read
    back through the distributed IPC reader (binaryFile source +
    per-file pyarrow decode); per-lang aggregates over the roundtrip
    must equal the same aggregates over the source table — any row
    lost, duplicated, or value-corrupted by either direction flips the
    driver hash."""
    import os
    import tempfile
    import uuid

    from opentick_spark.sources import read_arrow_ipc

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out_dir = tempfile.gettempdir() + f"/otspark_ipc_{uuid.uuid4().hex}"
    os.makedirs(out_dir, exist_ok=True)
    _export_ipc_shards(docs, out_dir)
    back = read_arrow_ipc(
        spark, out_dir, schema="doc_id long, lang string, n_chars long"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@q(
    "jsonl_zst_ingest_stats",
    """
    WITH g AS (
      SELECT lang, COUNT(*)::BIGINT AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents WHERE doc_id % 50 != 13 GROUP BY 1
    ),
    c AS (
      SELECT COUNT(*)::BIGINT AS n_corrupt
      FROM documents WHERE doc_id % 50 = 13
    )
    SELECT g.lang, g.n_docs, g.total_chars, c.n_corrupt FROM g, c
    """,
)
def jsonl_zst_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-JSONL corpus ingest (r8,
    ``sources.read_jsonl_compressed``): the documents table is exported
    executor-side as ``.jsonl.zst`` shards — with every doc_id %% 50 ==
    13 line PLANTED corrupt (truncated JSON) — then read back through
    the shard-parallel zstd path with the PERMISSIVE quarantine.
    Per-lang aggregates over the surviving rows plus the corpus-wide
    corrupt-line count must match the doc_id arithmetic exactly: a
    decompression fault, a lost/duplicated line, or a quarantine leak
    all flip the driver hash."""
    import os
    import tempfile
    import uuid

    from opentick_spark.sources import read_jsonl_compressed, split_corrupt

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out_dir = tempfile.gettempdir() + f"/otspark_zst_{uuid.uuid4().hex}"
    os.makedirs(out_dir, exist_ok=True)
    _export_zst_shards(docs, out_dir)
    back = read_jsonl_compressed(
        spark, out_dir, schema="doc_id long, lang string, n_chars long"
    )
    good, bad = split_corrupt(back)
    n_corrupt = bad.agg(
        F.count(F.lit(1)).cast("long").alias("n_corrupt")
    )
    return (
        good.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .crossJoin(F.broadcast(n_corrupt))
    )


@q(
    "streaming_arrow_ingest",
    """
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def streaming_arrow_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming Arrow-shard tail (r10, completing r9's
    half-landed item): the corpus is exported executor-side as
    Feather-v2 shards (``_export_ipc_shards`` — the SAME writer the
    batch roundtrip entry uses), then ``stream_corpus_ingest`` tails
    the landing directory through binaryFile readStream with the SAME
    executor-side decode as the batch reader
    (``decode_arrow_ipc_content``), landing each micro-batch as ONE
    atomic upsert commit into a PK table. maxFilesPerTrigger=3 over 8
    shards forces MULTIPLE micro-batches, so the aggregate crosses
    commit boundaries. Per-lang aggregates over the final table must
    equal the batch aggregates over the source documents — the
    batch/stream value-equality oracle."""
    from opentick_spark.engine import Engine
    from opentick_spark.sources import decode_arrow_ipc_content
    from opentick_spark.streaming.ingest import stream_corpus_ingest

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out_dir = tempfile.mkdtemp(prefix="otspark_sai_src_")
    _export_ipc_shards(docs, out_dir)

    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_sai_wh_"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute(
        "create table docs(doc_id bigint, lang text, n_chars bigint, "
        "primary key(doc_id))"
    )
    st = eng.store("s", "docs")
    q_ = stream_corpus_ingest(
        spark,
        out_dir,
        lambda files: decode_arrow_ipc_content(
            files, "doc_id long, lang string, n_chars long"
        ),
        st,
        tempfile.mkdtemp(prefix="otspark_sai_ck_"),
        max_files_per_trigger=3,
    )
    q_.awaitTermination()
    return (
        st.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@q(
    "streaming_zst_ingest",
    """
    WITH g AS (
      SELECT lang, COUNT(*)::BIGINT AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents WHERE doc_id % 50 != 13 GROUP BY 1
    ),
    c AS (
      SELECT COUNT(*)::BIGINT AS n_corrupt
      FROM documents WHERE doc_id % 50 = 13
    )
    SELECT g.lang, g.n_docs, g.total_chars, c.n_corrupt FROM g, c
    """,
)
def streaming_zst_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming ``.jsonl.zst`` shard tail with quarantine
    (r10): the corpus lands as zstd-JSONL shards with every doc_id %%
    50 == 13 line PLANTED corrupt (``_export_zst_shards`` — the SAME
    writer the batch ingest entry uses), ``stream_corpus_ingest`` tails
    them through the SAME decode as the batch reader
    (``decode_jsonl_compressed_content``, with ``path_col`` carrying
    shard provenance), corrupt lines divert to a batch-id-keyed
    quarantine and good rows upsert into a PK table across multiple
    micro-batches. Per-lang aggregates over the final table plus the
    quarantine's corpus-wide corrupt count must match the doc_id
    arithmetic exactly — a quarantine leak, a lost line, or a replayed
    duplicate all flip the driver hash."""
    from opentick_spark.engine import Engine
    from opentick_spark.sources import decode_jsonl_compressed_content
    from opentick_spark.streaming.ingest import stream_corpus_ingest

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out_dir = tempfile.mkdtemp(prefix="otspark_szi_src_")
    _export_zst_shards(docs, out_dir)

    eng = Engine(spark, tempfile.mkdtemp(prefix="otspark_szi_wh_"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute(
        "create table docs(doc_id bigint, lang text, n_chars bigint, "
        "primary key(doc_id))"
    )
    st = eng.store("s", "docs")
    quarantine = tempfile.mkdtemp(prefix="otspark_szi_q_")
    q_ = stream_corpus_ingest(
        spark,
        out_dir,
        lambda files: decode_jsonl_compressed_content(
            files,
            "doc_id long, lang string, n_chars long",
            path_col="_source_path",
        ),
        st,
        tempfile.mkdtemp(prefix="otspark_szi_ck_"),
        quarantine_dir=quarantine,
        max_files_per_trigger=3,
    )
    q_.awaitTermination()
    n_corrupt = (
        spark.read.parquet(f"{quarantine}/batch=*")
        .agg(F.count(F.lit(1)).cast("long").alias("n_corrupt"))
    )
    return (
        st.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .crossJoin(F.broadcast(n_corrupt))
    )


@q(
    "corpus_split_stats",
    """
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_toks,
             list_reduce(
               list_transform(range(1, 9),
                 i -> strpos('0123456789abcdef',
                             substr(md5(doc_id::VARCHAR), i, 1)) - 1),
               (a, b) -> a * 16 + b) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens
    FROM t GROUP BY 1
    """,
)
def corpus_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/val/test split (80/10/10) with
    per-split doc and token accounting — reproducible across engines and
    partitionings, pure projection + one tiny aggregate
    (operators/text.hash_split)."""
    docs = load(spark, sf_dir, "documents")
    split = X.hash_split(docs)
    return (
        split.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(X.ws_token_count(F.col("text"))).cast("long").alias("total_tokens"),
        )
    )


@q(
    "embedding_label_stats",
    """
    WITH e AS (SELECT label, embedding FROM embeddings),
    pos AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS pos,
             unnest(list_transform(embedding, v -> v::DOUBLE)) AS x
      FROM e
    ),
    cen AS (SELECT label, pos, AVG(x) AS m FROM pos GROUP BY label, pos),
    cn AS (SELECT label, SQRT(SUM(m * m)) AS centroid_norm FROM cen GROUP BY label),
    vn AS (
      SELECT label,
             COUNT(*)::BIGINT AS n,
             AVG(SQRT(list_reduce(
               list_transform(embedding, v -> v::DOUBLE * v::DOUBLE),
               (a, b) -> a + b))) AS avg_norm
      FROM e GROUP BY label
    )
    SELECT vn.label::BIGINT AS label, vn.n,
           ROUND(cn.centroid_norm, 6) AS centroid_norm,
           ROUND(vn.avg_norm, 6) AS avg_norm
    FROM vn JOIN cn USING (label)
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + mean vector norm: the distributed vector
    mean (posexplode → (label, pos) partial agg — state is labels×dim,
    never the vectors) with an in-row fold for per-vector norms
    (operators/similarity.label_centroid_stats)."""
    emb = load(spark, sf_dir, "embeddings")
    out = S.label_centroid_stats(emb)
    return out.select(
        "label",
        "n",
        F.round("centroid_norm", 6).alias("centroid_norm"),
        F.round("avg_norm", 6).alias("avg_norm"),
    )


@q(
    "streaming_dedup_watermark",
    """
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    duplicate delivery within the watermark is dropped and key state is
    evicted as event time advances — state scales with delivery delay,
    not corpus size. Same exactly-once contract (and oracle) as
    streaming_dedup_ingest."""
    from opentick_spark.streaming.ingest import (
        dedup_stream_within_watermark,
        state_partitions,
    )

    schema = load_raw(spark, sf_dir, "events").schema
    name = "dedup_wm_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_dedup_wm_src_")
    for i in range(2):  # duplicate delivery
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            os.path.join(src_dir, f"events_{i}.parquet"),
        )
    with state_partitions(spark, 8):
        q_ = dedup_stream_within_watermark(
            spark, src_dir, schema, name,
            tempfile.mkdtemp(prefix="otspark_dedup_wm_ck_"), ["event_id"],
        )
        q_.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@q(
    "text_unigram_nll",
    """
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
      FROM documents
    ),
    model AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    total AS (SELECT SUM(c)::DOUBLE AS total FROM model)
    SELECT id,
           COUNT(*)::BIGINT AS n_tokens,
           ROUND(-AVG(ln(c / total)), 6) AS nll
    FROM toks JOIN model USING (t), total
    GROUP BY id
    """,
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality scoring (CCNet-style): the corpus trains its
    own token model (vocabulary-sized aggregate, broadcast back), each
    doc scores as mean −ln p(token) (operators/text.unigram_logprob)."""
    docs = load(spark, sf_dir, "documents")
    out = X.unigram_logprob(docs)
    return out.select("id", "n_tokens", F.round("nll", 6).alias("nll"))


@q(
    "text_dup_ngram_coverage",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ws) - 6),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                    ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                    ws[i+6] || ' ' || ws[i+7])) AS sh
      FROM w
    ),
    dfq AS (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
    SELECT doc_id AS id, COUNT(*)::BIGINT AS n_shingles,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           ROUND(SUM(CASE WHEN df >= 2 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
             AS dup_frac
    FROM g JOIN dfq USING (sh)
    GROUP BY doc_id
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 8-grams shared with other docs —
    inverted-index shape, no pairwise work
    (operators/dedup.dup_ngram_coverage)."""
    docs = load(spark, sf_dir, "documents")
    out = D.dup_ngram_coverage(docs, n=8)
    return out.select(
        "id", "n_shingles", "n_shared", F.round("dup_frac", 6).alias("dup_frac")
    )


@q(
    "dedup_embedding_lsh",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           TRUE AS subset_ok, TRUE AS recall_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.4
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked embedding near-dup pairs, self-checked vs the exact
    brute-force pairs: the oracle pins the true pair count; the booleans
    verify the LSH output is a subset (precision 1 by construction) with
    recall ≥ 0.7 (measured 0.81 at sf0.01 / 0.76 at sf0.1 with 8 tables
    × 4 bits; deterministic seeded hyperplanes)."""
    emb = load(spark, sf_dir, "embeddings")
    exact = D.embedding_cosine_pairs(emb, threshold=0.4).select("id_a", "id_b")
    approx = D.embedding_lsh_pairs(
        emb, threshold=0.4, dim=64, bits=4, tables=8
    ).select("id_a", "id_b")
    hits = approx.join(exact, ["id_a", "id_b"])
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    n_extra = approx.join(exact, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__extra")
    )
    n_hits = hits.agg(F.count(F.lit(1)).alias("__hits"))
    return (
        n_true.crossJoin(n_extra)
        .crossJoin(n_hits)
        .select(
            "n_true_pairs",
            (F.col("__extra") == 0).alias("subset_ok"),
            (
                F.col("__hits").cast("double")
                >= 0.7 * F.col("n_true_pairs")
            ).alias("recall_ok"),
        )
    )


@q(
    "semantic_dedup",
    """
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS avec
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    s AS (
      SELECT e.vec_id AS id, e.embedding AS v, a.anchor_id,
             list_cosine_similarity(e.embedding::DOUBLE[],
                                    a.avec::DOUBLE[]) AS cos
      FROM embeddings e CROSS JOIN a
    ),
    asg AS (
      SELECT id, v, anchor_id AS cell_id
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY id ORDER BY cos DESC, anchor_id) AS rn FROM s)
      WHERE rn = 1
    ),
    d AS (
      SELECT DISTINCT y.id
      FROM asg x JOIN asg y ON x.cell_id = y.cell_id AND x.id < y.id
      WHERE list_cosine_similarity(x.v::DOUBLE[], y.v::DOUBLE[]) > 0.35
    )
    SELECT asg.id AS id, CAST(asg.cell_id AS BIGINT) AS cell_id,
           (d.id IS NOT NULL) AS is_dup
    FROM asg LEFT JOIN d ON asg.id = d.id
    """,
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.semantic_dedup):
    fixed-anchor cells (IVF coarse-quantizer shape, broadcast + Arrow
    cosine, no shuffle) then keep-lowest-id near-dup marking within each
    cell only — the oracle replays the exact assignment + in-cell test
    naively. Both sides compute cosine in float64, so the argmax and the
    threshold comparison agree bitwise."""
    emb = load(spark, sf_dir, "embeddings")
    return D.semantic_dedup(emb, anchor_stride=50, threshold=0.35)


@q(
    "mixture_sample",
    """
    WITH t AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_tokens,
             md5(doc_id::VARCHAR) AS h
      FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ), c AS (
      SELECT source, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before
      FROM t
    ), b(source, budget) AS (
      VALUES ('src0', 800), ('src1', 400), ('src2', 200), ('src3', 200)
    )
    SELECT c.source AS source, doc_id, n_tokens, tokens_before
    FROM c JOIN b ON c.source = b.source WHERE tokens_before < budget
    """,
)
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture cut: per-source token budgets (a 4:2:1:1 recipe)
    filled deterministically in md5(doc_id) order — reproducible weighted
    sampling with no seed exchange. The running total is a two-level
    prefix sum (see operators/text.mixture_sample) so a hot source never
    funnels through one task; the oracle is the naive windowed cumsum."""
    docs = load(spark, sf_dir, "documents")
    return X.mixture_sample(
        docs, {"src0": 800, "src1": 400, "src2": 200, "src3": 200}
    )


# BPE merge rules pinned for the encode query (trained by
# operators/text.bpe_merges over the sf0.01 documents corpus; any fixed
# list is a valid tokenizer — pinning makes the query deterministic and
# its oracle expressible).
_BPE_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"),
    ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
]


def _bpe_word_sql() -> str:
    """DuckDB expression encoding one word `s` with _BPE_MERGES: wrap
    every char in \\x01 sentinels, then each merge is one left-to-right
    non-overlapping `replace` — exactly the greedy textbook merge order
    the Spark-side fold applies."""
    e = "regexp_replace(s, '(.)', chr(1) || '\\1' || chr(1), 'g')"
    for a, b in _BPE_MERGES:
        pat = f"chr(1)||'{a}'||chr(1)||chr(1)||'{b}'||chr(1)"
        rep = f"chr(1)||'{a}{b}'||chr(1)"
        e = f"replace({e}, {pat}, {rep})"
    return f"trim(replace({e}, chr(1)||chr(1), ','), chr(1))"


@q(
    "bpe_encode_docs",
    f"""
    WITH t AS (
      SELECT doc_id,
             array_to_string(list_transform(
               string_split_regex(trim(lower(text)), '\\s+'),
               s -> {_bpe_word_sql()}), ',') AS tokens_csv
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN tokens_csv = '' THEN 0
                ELSE len(string_split(tokens_csv, ',')) END AS BIGINT)
             AS n_tokens,
           tokens_csv
    FROM t
    """,
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the pinned BPE merge list — value-exact
    oracle: DuckDB replays the same greedy merges as sentinel-delimited
    string replaces, so every token of every document is hash-checked
    (flattened to CSV; array columns break the driver canonicalizer)."""
    docs = load(spark, sf_dir, "documents")
    enc = X.bpe_encode(docs, _BPE_MERGES)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", ",").alias("tokens_csv"),
    )


@q(
    "heavy_hitter_words",
    """
    WITH w AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM w WHERE w <> '')
    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, t.total AS total
    FROM w, t WHERE w <> ''
    GROUP BY w, t.total
    HAVING COUNT(*) * 800 >= 27 * t.total
    """,
)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (words with frequency ≥ 27/800 = 3.375%): exact
    counts via the two-pass Misra–Gries candidate + verify pipeline —
    the vocabulary never shuffles, only candidate occurrences
    (operators/freq.py). Integral threshold arithmetic; oracle is the
    naive GROUP BY ... HAVING."""
    from opentick_spark.operators.freq import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(X.ws_tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    return heavy_hitters(words, "w", min_freq_num=27, min_freq_den=800)


@q(
    "vocab_coverage_top100",
    """
    WITH w AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    c AS (SELECT w, COUNT(*) AS c FROM w WHERE w <> '' GROUP BY w),
    top AS (SELECT w FROM c ORDER BY c DESC, w LIMIT 100)
    SELECT CAST(SUM(c.c) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN c.w IN (SELECT w FROM top) THEN c.c END) AS BIGINT)
             AS covered_tokens,
           ROUND(SUM(CASE WHEN c.w IN (SELECT w FROM top) THEN c.c END)::DOUBLE
                 / SUM(c.c), 6) AS coverage
    FROM c
    """,
)
def vocab_coverage_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary token coverage (operators/freq.vocab_coverage):
    the tokenizer-design metric. One vocabulary-sized shuffle, a
    deterministic tie-stable top-N cut, broadcast semi-join for the
    covered mass; every value hash-checked against the DuckDB replay."""
    from opentick_spark.operators.freq import vocab_coverage

    docs = load(spark, sf_dir, "documents")
    return vocab_coverage(docs, text_col="text", top_n=100)


@q(
    "seq_len_histogram",
    """
    WITH t AS (
      SELECT len(string_split_regex(trim(lower(text)), '\\s+')) AS n
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT CAST(FLOOR(LOG2(n)) AS BIGINT) AS log2_bucket,
           CAST(POWER(2, FLOOR(LOG2(n))) AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM t GROUP BY 1, 2
    """,
)
def seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution in power-of-two buckets — the metric
    that sizes context windows and predicts packing efficiency. Pure
    projection + one tiny hash agg (bucket cardinality ~log of max
    length); whole-stage codegen end to end."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    n = F.size(X.ws_tokens(F.col("text")))
    b = F.floor(F.log2(n))
    return (
        docs.select(n.alias("__n"), b.alias("log2_bucket"))
        .groupBy(
            F.col("log2_bucket").cast("long").alias("log2_bucket"),
            F.pow(F.lit(2.0), F.col("log2_bucket")).cast("long").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("total_tokens"),
        )
    )


@q(
    "dedup_keeper_by_quality",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(label) AS cluster FROM reach GROUP BY id),
    ql AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_toks
      FROM documents
    )
    SELECT c.cluster,
           first(c.doc_id ORDER BY q.n_toks DESC, c.doc_id DESC) AS keeper,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(q.n_toks) AS keeper_toks
    FROM comp c JOIN ql q ON q.doc_id = c.doc_id
    GROUP BY c.cluster
    """,
)
def dedup_keeper_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based keeper selection: near-dup clusters (exact-Jaccard
    edges → connected components) keep their LONGEST member (ties → max
    doc_id) instead of the lowest id — the SemDeDup-practice refinement
    where the surviving copy is the best one, not the first one. The
    cluster table is cluster-cardinality-sized, so the quality join and
    argmax are a small-side aggregation after the dedup shuffle.
    (Keeper key = lexicographic (n_toks, doc_id); the oracle uses an
    ordered FIRST aggregate — exact tuple order at any doc_id scale.)"""
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    comps = D.connected_components(pairs)
    ql = docs.select(
        "doc_id", F.size(X.ws_tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    j = comps.select(F.col("id").alias("doc_id"), "cluster").join(ql, "doc_id")
    return (
        j.groupBy(F.col("cluster").cast("long").alias("cluster"))
        .agg(
            F.max_by(
                "doc_id", F.struct(F.col("n_toks"), F.col("doc_id"))
            ).cast("long").alias("keeper"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("n_toks").alias("keeper_toks"),
        )
    )


@q(
    "streaming_hop_counts",
    """
    WITH h AS (
      SELECT event_type, value,
             epoch_us(time_bucket(INTERVAL '30 minutes', ts)) - off AS win_start_us
      FROM events, (SELECT unnest([0, 1800000000]) AS off)
    )
    SELECT win_start_us, event_type, COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM h GROUP BY 1, 2
    """,
)
def streaming_hop_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming hopping windows: 1h windows sliding
    every 30min under a watermark — each event lands in two windows
    inside ONE stateful aggregation (state = open windows × keys; the
    streaming twin of the batch `hop_window_counts`). Oracle replays the
    hop expansion as an unnest cross join, identical to the batch
    query's."""
    from opentick_spark.streaming.ingest import (
        state_partitions,
        windowed_event_counts,
    )

    schema = load_raw(spark, sf_dir, "events").schema
    name = "hop_sink_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="otspark_hop_ck_")
    src_dir = tempfile.mkdtemp(prefix="otspark_hop_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    with state_partitions(spark, 8):
        query = windowed_event_counts(
            spark, src_dir, schema, name, ckpt, slide="30 minutes"
        )
        query.awaitTermination()
    out = spark.table(name)
    return out.select(
        F.unix_micros(F.col("win.start")).alias("win_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@q(
    "dup_span_stats",
    f"""
    WITH nd AS (SELECT doc_id, {_NORM} AS __norm FROM documents),
    t AS (SELECT doc_id, string_split(__norm, ' ') AS toks FROM nd),
    gr AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS g
      FROM t, UNNEST(range(1, len(toks) - 6)) AS r(i)
    ),
    dup AS (SELECT g FROM gr GROUP BY g HAVING COUNT(*) >= 2),
    dp AS (SELECT doc_id, pos FROM gr SEMI JOIN dup USING (g)),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dp)
    ),
    sp AS (
      SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) AS e, COUNT(*) AS w
      FROM isl GROUP BY 1, 2
    ),
    pd AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(w) AS dup_windows,
             SUM(e + 8 - s) AS dup_tokens
      FROM sp GROUP BY doc_id
    )
    SELECT t.doc_id AS id,
           COALESCE(pd.n_spans, 0)::BIGINT AS n_spans,
           COALESCE(pd.dup_windows, 0)::BIGINT AS dup_windows,
           COALESCE(pd.dup_tokens, 0)::BIGINT AS dup_tokens,
           len(t.toks)::BIGINT AS total_tokens,
           ROUND(COALESCE(pd.dup_tokens, 0)::DOUBLE
                 / GREATEST(len(t.toks), 1), 6) AS dup_frac
    FROM t LEFT JOIN pd USING (doc_id)
    """,
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup per document: spans whose 8-token
    window repeats anywhere in the corpus (operators/dedup.
    duplicate_spans — the suffix-array dedup of Lee et al. 2022
    re-expressed as an n-gram-window inverted index + gaps-and-islands
    span merge; one gram-hash shuffle, no pairwise work)."""
    docs = load(spark, sf_dir, "documents").repartition(
        2 * spark.sparkContext.defaultParallelism
    )  # r8: the 1-row-group scan is ONE partition; spread the
    # tokenize/explode map side across cores (measured -21..-42%)

    return D.duplicate_spans(docs, n=8, min_count=2)


@q(
    "source_mixture_stats",
    """
    WITH d AS (
      SELECT source,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_toks
      FROM documents
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(n_toks)::BIGINT AS total_tokens
      FROM d GROUP BY source
    )
    SELECT source, n_docs, total_tokens,
           ROUND(total_tokens::DOUBLE / SUM(total_tokens) OVER (), 6)
             AS token_share
    FROM s
    """,
)
def source_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture composition (the what-is-my-corpus-made-of
    report behind mixture weighting): one hash aggregation on source,
    then the share normalizer is a window over the #sources-row result —
    never a second pass over the corpus."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(X.ws_tokens(F.col("text")))).cast("long").alias(
            "total_tokens"
        ),
    )
    return s.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens")
            / F.sum("total_tokens").over(Window.partitionBy()),
            6,
        ).alias("token_share"),
    )


@q(
    "balanced_sample_per_lang",
    """
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def balanced_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced sampling: exactly min(20, class size) docs
    per language, selected by md5-of-id rank — reproducible across
    engines and runs (no rand()), the class-balancing primitive for
    eval/calibration splits. Catalyst turns the rank filter into a
    WindowGroupLimit (top-k per key, no full sort of each class)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@q(
    "text_bigram_nll",
    """
    WITH ws AS (
      SELECT doc_id AS id,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    toks AS (
      SELECT id, toks[i] AS t, i AS pos
      FROM ws, UNNEST(range(1, len(toks) + 1)) AS r(i)
    ),
    pairs AS (
      SELECT id, lag(t) OVER (PARTITION BY id ORDER BY pos) AS v, t
      FROM toks QUALIFY v IS NOT NULL
    ),
    c2 AS (SELECT v, t, COUNT(*) AS c2 FROM pairs GROUP BY v, t),
    c1 AS (SELECT v, COUNT(*) AS c1 FROM pairs GROUP BY v),
    vocab AS (SELECT COUNT(DISTINCT t)::DOUBLE AS V FROM toks),
    scored AS (
      SELECT p.id, COUNT(*)::BIGINT AS n_bigrams,
             -AVG(ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * vocab.V))) AS nll
      FROM pairs p
      JOIN c2 ON c2.v = p.v AND c2.t = p.t
      JOIN c1 ON c1.v = p.v
      CROSS JOIN vocab
      GROUP BY p.id
    )
    SELECT d.doc_id AS id,
           COALESCE(s.n_bigrams, 0)::BIGINT AS n_bigrams,
           ROUND(s.nll, 6) AS nll
    FROM documents d LEFT JOIN scored s ON s.id = d.doc_id
    """,
)
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity scoring (operators/text.bigram_logprob):
    add-1-smoothed conditional NLL per document under the corpus's own
    bigram model — the KenLM-style quality filter one rung above the
    unigram signal. The bigram count table is joined, never broadcast
    (it outgrows the vocabulary); the context table and V broadcast."""
    docs = load(spark, sf_dir, "documents")
    out = X.bigram_logprob(docs)
    return out.select("id", "n_bigrams", F.round("nll", 6).alias("nll"))


@q(
    "token_shard_stats",
    """
    WITH d AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_toks
      FROM documents
    ),
    p AS (
      SELECT doc_id, n_toks,
             COALESCE(SUM(n_toks) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM d
    )
    SELECT CAST(bef // 5000 AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(n_toks)::BIGINT AS tokens
    FROM p GROUP BY 1
    """,
)
def token_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard layout over documents
    (sources.assign_token_shards): exact GLOBAL prefix sums via the
    range-bucketed two-level scheme — the oracle computes the same
    running totals with one naive global window, so the driver checks
    the distributed decomposition against the straight-line definition."""
    from opentick_spark.sources import assign_token_shards

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.ws_tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    sharded = assign_token_shards(docs, "doc_id", "n_toks", shard_tokens=5000)
    return sharded.groupBy(F.col("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("tokens"),
    )


@q(
    "curriculum_shard_export",
    """
    WITH d AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_toks
      FROM documents
    ),
    h AS (SELECT n_toks AS v, COUNT(*)::BIGINT AS c FROM d GROUP BY 1),
    cdf AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
             (SELECT SUM(c) FROM h) AS total
      FROM h
    ),
    s AS (SELECT v, CAST((cum * 8 + total - 1) // total AS BIGINT) AS shard
          FROM cdf)
    SELECT s.shard,
           COUNT(*)::BIGINT AS n_docs,
           MIN(d.n_toks)::BIGINT AS min_n_toks,
           MAX(d.n_toks)::BIGINT AS max_n_toks,
           SUM(d.n_toks)::BIGINT AS tokens
    FROM d JOIN s ON d.n_toks = s.v
    GROUP BY 1
    """,
)
def curriculum_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered shard MATERIALIZATION (r14, VERDICT r13
    item 6): ``sources.export_curriculum_shards`` writes the corpus
    easy→hard by token count into 8 shard directories — deterministic
    shard cut points from the exact histogram CDF (ceil(cum·n/total),
    the ``cdf_buckets`` integer math — NOT Spark's sampled range
    boundaries, which are not reproducible), physically ordered by
    ``repartitionByRange`` + ``sortWithinPartitions`` (no global Sort),
    with the id tie-break in the range keys so a hot difficulty value
    splits across writer tasks. The returned manifest is aggregated
    from the files ON DISK, so the oracle (the same window-free
    ordering math over the value histogram) value-checks what actually
    landed — the full write path, end to end."""
    import shutil

    from opentick_spark.sources import export_curriculum_shards

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(X.ws_tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    out_dir = tempfile.gettempdir() + f"/otspark_curr_{uuid.uuid4().hex}"
    try:
        # the returned manifest is rebuilt from collected rows (it does
        # not reference the written files), so the export can be swept
        # immediately — repeated bench/sweep runs must not pile up /tmp
        return export_curriculum_shards(
            docs, out_dir, "n_toks", 8, id_col="doc_id", tokens_col="n_toks"
        ).select("shard", "n_docs", "min_n_toks", "max_n_toks", "tokens")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@q(
    "temperature_sample",
    """
    WITH n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             CAST(ROUND(sqrt(n_docs) * 1000000) AS BIGINT) AS w_int
      FROM n
    ),
    t AS (
      SELECT source, n_docs,
             (200 * w_int) // (SELECT SUM(w_int) FROM w) AS target
      FROM w
    ),
    r AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d
    )
    SELECT r.source, r.doc_id
    FROM r JOIN t ON t.source = r.source
    WHERE r.rn <= t.target
    """,
)
def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual
    upsampling trick: per-source budget ∝ n^(1/T), here T=2 i.e. α=0.5 —
    low-resource sources get a super-proportional share of the 200-doc
    budget). Exactly reproducible across engines: weights are scaled to
    INTEGERS (round(sqrt(n)·1e6)) so the normalization and the budget
    split are pure integer arithmetic — no cross-engine float-sum
    association risk — and selection is the md5-rank top-target per
    source (WindowGroupLimit, like balanced_sample_per_lang)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = n.withColumn(
        "w_int", F.round(F.sqrt("n_docs") * 1e6).cast("long")
    )
    tot = w.agg(F.sum("w_int").alias("W"))
    t = w.crossJoin(F.broadcast(tot)).select(
        "source", F.expr("(200 * w_int) div W").alias("target")
    )
    rw = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(rw).alias("rn")
    )
    return (
        ranked.join(F.broadcast(t), "source")
        .filter(F.col("rn") <= F.col("target"))
        .select("source", "doc_id")
    )


@q(
    "length_batch_stats",
    """
    WITH d AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_toks
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_toks,
             row_number() OVER (ORDER BY n_toks DESC, doc_id) AS rk
      FROM d
    )
    SELECT CAST((rk - 1) // 32 AS INT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n_toks) AS max_len,
           SUM(n_toks)::BIGINT AS sum_len,
           ROUND(1.0 - SUM(n_toks)::DOUBLE / (COUNT(*) * MAX(n_toks)), 6)
             AS padding_frac
    FROM r GROUP BY 1
    """,
)
def length_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-sorted inference batching (sources.assign_length_batches):
    batches of 32 similar-length docs; padding_frac is the wasted
    fraction if each batch pads to its longest member. The oracle
    computes the global length rank with one naive window — the driver
    checks the length-bucketed two-level decomposition against it."""
    from opentick_spark.sources import assign_length_batches

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.ws_tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    batched = assign_length_batches(docs, "doc_id", "n_toks", batch_size=32)
    return batched.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_toks").alias("max_len"),
        F.sum("n_toks").cast("long").alias("sum_len"),
        F.round(
            1.0 - F.sum("n_toks") / (F.count(F.lit(1)) * F.max("n_toks")), 6
        ).alias("padding_frac"),
    )


@q(
    "hybrid_search",
    """
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*)::DOUBLE AS n_docs, AVG(len(ws)::DOUBLE) AS avgdl
      FROM base
    ),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*)::DOUBLE AS tf
      FROM (SELECT doc_id, len(ws)::DOUBLE AS dl, unnest(ws) AS term
            FROM base)
      WHERE term IN ('spark', 'window', 'join')
      GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
    bm AS (
      SELECT doc_id,
             ROUND(SUM( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * tf * 2.2
                        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ), 6)
               AS bm25
      FROM tf JOIN dft USING (term), stats
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id ASC
      LIMIT 50
    ),
    scored AS (
      SELECT b.doc_id, b.bm25,
             ROUND(list_cosine_similarity(
               e.embedding::DOUBLE[],
               (SELECT e2.embedding::DOUBLE[] FROM embeddings e2
                WHERE e2.vec_id = (SELECT doc_id FROM bm
                                   ORDER BY bm25 DESC, doc_id LIMIT 1))
             ), 6) AS cos
      FROM bm b JOIN embeddings e ON e.vec_id = b.doc_id
    )
    SELECT doc_id, bm25, cos,
           ROUND(0.5 * bm25 / (SELECT MAX(bm25) FROM bm) + 0.5 * cos, 6)
             AS hybrid
    FROM scored
    ORDER BY ROUND(0.5 * bm25 / (SELECT MAX(bm25) FROM bm) + 0.5 * cos, 6)
             DESC, doc_id
    LIMIT 10
    """,
)
def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword recall (top-50 candidates, rounded
    then ranked — engine-stable) re-scored with embedding cosine against
    the top-BM25 document's vector; hybrid = 0.5·bm25/max + 0.5·cos over
    ROUNDED inputs so the final rank is deterministic across engines.
    Scale shape: the rerank touches 50 candidate vectors, never the
    corpus — recall is the inverted-index stage, precision the vector
    stage."""
    from pyspark.sql import Window
    from opentick_spark.operators import search as SE
    from opentick_spark.operators.similarity import cosine

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    cand = SE.bm25_topk(docs, _BM25_TERMS, top_n=50).withColumnRenamed(
        "score", "bm25"
    )
    top1 = cand.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(1)
    qv = top1.join(emb, top1.doc_id == emb.vec_id).select(
        F.col("embedding").alias("__qv")
    )
    mx = cand.agg(F.max("bm25").alias("__mx"))
    scored = (
        cand.join(emb, cand.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            "bm25",
            F.round(
                cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("__qv").cast("array<double>"),
                ),
                6,
            ).alias("cos"),
            F.col("__mx"),
        )
        .withColumn(
            "hybrid",
            F.round(0.5 * F.col("bm25") / F.col("__mx") + 0.5 * F.col("cos"), 6),
        )
    )
    w = Window.orderBy(F.desc("hybrid"), F.asc("doc_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .select("doc_id", "bm25", "cos", "hybrid")
    )


@q(
    "curated_corpus_stats",
    f"""
    WITH RECURSIVE norm AS (
      SELECT doc_id, lang, text, {_NORM} AS nrm FROM documents
    ),
    ek AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nrm),
    pairs AS ({_JACCARD_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(label) AS cluster FROM reach GROUP BY id),
    ndk AS (SELECT cluster, MIN(doc_id) AS keeper FROM comp GROUP BY cluster),
    nd_drop AS (
      SELECT c.doc_id FROM comp c
      JOIN ndk k ON c.cluster = k.cluster AND c.doc_id != k.keeper
    ),
    sw AS (SELECT doc_id, string_split(nrm, ' ') AS toks FROM norm),
    sgr AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS g
      FROM sw, UNNEST(range(1, len(toks) - 6)) AS r(i)
    ),
    sdup AS (SELECT g FROM sgr GROUP BY g HAVING COUNT(*) >= 2),
    sdp AS (SELECT doc_id, pos FROM sgr SEMI JOIN sdup USING (g)),
    sisl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM sdp)
    ),
    ssp AS (
      SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) AS e
      FROM sisl GROUP BY 1, 2
    ),
    spd AS (
      SELECT doc_id, SUM(e + 8 - s) AS dup_tokens FROM ssp GROUP BY doc_id
    ),
    frac AS (
      SELECT sw.doc_id,
             COALESCE(spd.dup_tokens, 0)::DOUBLE
               / GREATEST(len(sw.toks), 1) AS span_frac
      FROM sw LEFT JOIN spd USING (doc_id)
    ),
    q AS (
      SELECT n.doc_id, n.lang,
             len(string_split_regex(trim(lower(n.text)), '\\s+'))::BIGINT
               AS n_toks,
             CASE WHEN length(n.text) = 0 THEN 0 ELSE
               length(regexp_replace(n.text,
                 '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))::DOUBLE
               / length(n.text) END AS punct
      FROM norm n
    )
    SELECT q.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(q.n_toks)::BIGINT AS total_tokens
    FROM q
    JOIN ek ON ek.doc_id = q.doc_id
    LEFT JOIN nd_drop nd ON nd.doc_id = q.doc_id
    JOIN frac f ON f.doc_id = q.doc_id
    WHERE nd.doc_id IS NULL AND f.span_frac <= 0.5
      AND q.n_toks >= 5 AND q.punct < 0.2
    GROUP BY q.lang
    """,
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end curation composite: exact-dedup keepers ∩
    near-dup cluster keepers (bigram-Jaccard ≥0.5 connected components)
    ∩ substring-dedup gate (≤50% of tokens inside repeated 8-gram
    spans) ∩ quality gates (≥5 tokens, punctuation <0.2) → per-language
    doc/token accounting of the surviving corpus. Every stage is the
    already-oracle-checked operator; the composite pins their
    INTERACTION (id-set semantics of keeper/anti joins) end to end."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    exact_keepers = D.exact_duplicates(docs).select(
        F.col("keeper").alias("doc_id")
    )
    comps = D.connected_components(
        D.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    )
    nd_drop = (
        comps.withColumn(
            "__keep", F.min("id").over(Window.partitionBy("cluster"))
        )
        .filter(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias("doc_id"))
    )
    span_ok = (
        D.duplicate_spans(docs, n=8, min_count=2)
        .filter(F.col("dup_frac") <= 0.5)
        .select(F.col("id").alias("doc_id"))
    )
    survivors = (
        docs.join(exact_keepers, "doc_id", "left_semi")
        .join(nd_drop, "doc_id", "left_anti")
        .join(span_ok, "doc_id", "left_semi")
        .filter(
            (F.size(X.ws_tokens(F.col("text"))) >= 5)
            & (X.punct_ratio(F.col("text")) < 0.2)
        )
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(X.ws_tokens(F.col("text")))).cast("long").alias(
            "total_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# data-selection / curation operators (round 4, second batch)

# DuckDB analog of text.ws_tokens on raw text
_WS_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@q(
    "tfidf_top_terms",
    f"""
    WITH tk AS (
      SELECT doc_id AS id, unnest({_WS_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT id, term, COUNT(*) AS tf FROM tk WHERE term != '' GROUP BY 1, 2
    ),
    dfq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents)
    SELECT id, term, tf, df_docs, ROUND(tfidf, 6) AS tfidf, rank FROM (
      SELECT id, term, tf, df_docs, tf * ln(n.n / df_docs) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY id ORDER BY tf * ln(n.n / df_docs) DESC, term
             ) AS rank
      FROM tf JOIN dfq USING (term), n
    ) WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF keywords: vocabulary-sized DF agg broadcast
    back, per-doc window top-k (operators/selection.py)."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    out = SEL.tfidf_top_terms(docs, k=5)
    return out.withColumn("tfidf", F.round("tfidf", 6))


@q(
    "dsir_importance_scores",
    f"""
    WITH tk AS (
      SELECT doc_id AS id, lang = 'en' AS is_target, unnest({_WS_TOKS}) AS t
      FROM documents
    ),
    b AS (
      SELECT id, is_target, {_H8.format(x="t")} % 1024 AS b
      FROM tk WHERE t != ''
    ),
    counts AS (
      SELECT b, COUNT(*) AS raw_c,
             SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tgt_c
      FROM b GROUP BY 1
    ),
    tot AS (
      SELECT SUM(raw_c)::DOUBLE AS raw_n, SUM(tgt_c)::DOUBLE AS tgt_n
      FROM counts
    ),
    wts AS (
      SELECT b, ln((tgt_c + 1.0) / (tgt_n + 1024.0))
               - ln((raw_c + 1.0) / (raw_n + 1024.0)) AS w
      FROM counts, tot
    )
    SELECT id, COUNT(*)::BIGINT AS n_tokens, is_target,
           ROUND(AVG(w), 6) AS dsir_score
    FROM b JOIN wts USING (b)
    GROUP BY id, is_target
    """,
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-ngram importance scores, target = English docs: the
    bucket-weight table is fixed-size (1024) and broadcast — no
    vocabulary ever leaves the executors (operators/selection.py)."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    out = SEL.dsir_importance(docs, F.col("lang") == "en", buckets=1024)
    return out.withColumn("dsir_score", F.round("dsir_score", 6))


@q(
    "source_token_entropy",
    f"""
    WITH counts AS (
      SELECT source AS "group", t, COUNT(*) AS c FROM (
        SELECT source, unnest({_WS_TOKS}) AS t FROM documents
      ) WHERE t != '' GROUP BY 1, 2
    )
    SELECT "group", SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS vocab,
           ROUND(ln(SUM(c)::DOUBLE) - SUM(c * ln(c::DOUBLE)) / SUM(c), 6)
             AS entropy
    FROM counts GROUP BY 1
    """,
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per source — template/boilerplate sources
    show depressed entropy (operators/selection.py)."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    out = SEL.token_entropy(docs, group_col="source")
    return out.withColumn("entropy", F.round("entropy", 6))


@q(
    "weighted_sample_docs",
    f"""
    WITH keyed AS (
      SELECT doc_id AS id, n_chars::DOUBLE AS weight,
             ln(({_H8.format(x="doc_id::VARCHAR")} + 1.0) / 4294967296.0)
               / n_chars AS es_key
      FROM documents WHERE n_chars > 0
    ),
    -- rank on the RAW key in a subquery: an outer ORDER BY es_key would
    -- capture the ROUNDED output alias and reorder rounding-collided
    -- keys at the top-k boundary (caught by the sf0.1 sweep)
    ranked AS (
      SELECT id, weight, es_key,
             ROW_NUMBER() OVER (ORDER BY es_key DESC, id) AS rank
      FROM keyed
    )
    SELECT id, weight, ROUND(es_key, 6) AS es_key, rank
    FROM ranked WHERE rank <= 100
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis deterministic weighted sample (w = n_chars):
    global top-k by reproducible exponential key, executed as
    TakeOrderedAndProject — never a full sort (operators/selection.py)."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    out = SEL.weighted_sample(docs, weight_col="n_chars", k=100)
    return out.withColumn("es_key", F.round("es_key", 6))


@q(
    "deterministic_shard_assign",
    """
    WITH assign AS (
      SELECT doc_id, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch0'),
                                 1, 15) AS UBIGINT) % 64 AS shard
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM assign GROUP BY shard
    """,
)
def deterministic_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-shard deal (r11): md5-keyed shard
    assignment is a pure narrow map — zero shuffle at 100 TB, identical
    across runs/engines/retries (operators/selection.py
    deterministic_shards). The verification agg (per-shard counts/char
    mass/min id) is the only shuffle here and is what a shard-balance
    monitor reads."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    out = SEL.deterministic_shards(docs, n_shards=64, salt="epoch0")
    return out.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


@q(
    "curriculum_length_buckets",
    """
    WITH hist AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
    ),
    cdf AS (
      SELECT n_chars, cnt,
             SUM(cnt) OVER (ORDER BY n_chars) AS cum,
             SUM(cnt) OVER () AS total
      FROM hist
    )
    SELECT CAST((cum * 10 + total - 1) // total AS BIGINT) AS bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_n_chars,
           MAX(n_chars) AS max_n_chars,
           CAST(SUM(n_chars * cnt) AS BIGINT) AS total_n_chars
    FROM cdf GROUP BY bucket
    """,
)
def curriculum_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering primitive (r11): exact length deciles via
    the value-histogram CDF — NTILE without the global sort that would
    funnel a 100 TB corpus through one partition (the running-sum
    window runs on the histogram, whose size is the length domain, not
    the corpus; operators/selection.py cdf_buckets). Same-length docs
    share a bucket by construction, so the result is deterministic with
    no row-order tie-break."""
    from opentick_spark.operators import selection as SEL

    docs = load(spark, sf_dir, "documents")
    return SEL.cdf_buckets(docs, "n_chars", n_buckets=10)


@q(
    "knn_label_vote",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 20 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
             list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[])
               AS cos
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id
        ) AS rk FROM scored
      ) WHERE rk <= 10
    ),
    votes AS (
      SELECT query_id, neighbor_label, COUNT(*) AS votes,
             MAX(cos) AS best_cos
      FROM topk GROUP BY 1, 2
    )
    SELECT query_id, neighbor_label AS predicted_label, votes,
           ROUND(best_cos, 6) AS best_cos
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY votes DESC, best_cos DESC, neighbor_label
      ) AS r FROM votes
    ) WHERE r = 1
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification (k=10, every-20th vector held out as query):
    broadcast queries over a stationary corpus, majority vote
    (operators/similarity.py knn_label_vote)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    out = S.knn_label_vote(emb, queries, k=10)
    return out.withColumn("best_cos", F.round("best_cos", 6))


@q(
    "source_overlap_matrix",
    f"""
    WITH t AS (
      SELECT doc_id, source, {{ngram8}} AS sh
      FROM (SELECT doc_id, source, string_split({{norm}}, ' ') AS __toks
            FROM documents)
    ),
    gg AS (SELECT DISTINCT source, unnest(sh) AS g FROM t),
    sizes AS (SELECT source, COUNT(*) AS n FROM gg GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
      FROM gg a JOIN gg b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, shared::BIGINT AS shared,
           ROUND(shared::DOUBLE / (sa.n + sb.n - shared), 6) AS jac
    FROM shared
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    """.format(ngram8=_NGRAM8, norm=_NORM),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources republish each other: distinct shared 8-grams and
    gram-set Jaccard per source pair — inverted-index self-join, fan-out
    bounded by |sources| per gram (operators/dedup.py
    shingle_overlap_matrix)."""
    docs = load(spark, sf_dir, "documents")
    return D.shingle_overlap_matrix(docs, group_col="source", n=8)


_ANN_RECALL_ORACLE = """
    WITH p AS (
      SELECT vec_id % 8 AS st, COUNT(*) AS pop FROM embeddings GROUP BY 1
    ),
    ok AS (
      SELECT (COUNT(*) = 8 AND MIN(pop) >= 10) AS full FROM p
    )
    SELECT m.method, CAST(8 AS BIGINT) AS n_queries,
           CASE WHEN ok.full THEN CAST(1.0 AS DOUBLE) END AS recall_at_10,
           CASE WHEN ok.full THEN CAST(1.0 AS DOUBLE) END AS mrr_at_10
    FROM ok, (VALUES ('int8'), ('ivf_p4'), ('lsh_h2'), ('pq_rerank'))
             AS m(method)
"""


@q("ann_recall_report", _ANN_RECALL_ORACLE)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-EXACT retrieval scorecard for ALL FOUR approximate ANN
    paths — hyperplane-LSH, IVF, PQ+re-rank, int8 — on a duplicate-ray
    plant whose recall@10/MRR@10 are closed-form 1.0 regardless of the
    LSH hyperplane seed or the trained PQ codebook (r10, retiring the
    r7 floor booleans; graded non-trivial recall arithmetic lives in
    ``ann_recall_planted``, whose IVF@nprobe=1 is exactly m/n_rel).

    The plant (keyed by the embeddings vec_ids): every corpus row IS
    ``e_{vec_id % 8}`` exactly; queries are e_0..e_7 (ids 10M+s, never
    corpus members). Forced behavior, provable per method:

    - exact: top-10 = the 10 lowest-id members of the query's stripe
      (cos exactly 1.0; everything else cos 0), given every stripe
      holds ≥ 10 members (asserted below; the oracle derives the same
      precondition from stripe pops).
    - lsh_h2: sign-sketch buckets are computed from IDENTICAL floats
      for query and members, so members share the query's bucket for
      ANY hyperplanes (the flip-0 probe); colliders re-rank below cos
      1.0. Set-equal to exact.
    - ivf_p4: seed_centroids stripes on id%16 → centroid c = e_{c%8};
      a member ties centroids s and s+8 at cos 1 and the lower id
      wins, so list s holds the whole stripe; the query's probe set
      contains centroid s. Set-equal.
    - pq_rerank (m=16 ⇒ scalar subspaces): every subspace sees only
      the values {0, 1}, seeds are data values, and Lloyd's rounds are
      fixed points on two-valued data — codewords stay exactly 0/1, so
      members score ADC cos 1.0 and distractors 0; the ≥10 lowest-id
      members always make the 50-shortlist and the exact re-rank
      restores set equality for ANY surviving codebook.
    - int8: quantize/dequantize of a basis vector is exact (scale 1,
      q ∈ {0, 127}), so the scoring plan IS the exact plan.

    A mechanics regression — a probe set dropping the query's own
    bucket, a routing/assignment tie-break drift, a codeword lookup
    off-by-one, a quantizer scale bug — sends a method's recall toward
    0 and fails the driver hash.

    Scale shape: the exact baseline is one broadcast-queries pass; each
    method joins its (query, neighbor) pairs to the baseline pairs on
    the composite key — result sizes are (k × n_queries), so everything
    after the searches themselves is broadcast-sized."""
    ids = load(spark, sf_dir, "embeddings").select("vec_id")
    corpus = ids.selectExpr(
        "vec_id",
        "transform(sequence(0, 15), a -> CAST(CASE WHEN a = vec_id % 8 "
        "THEN 1.0 ELSE 0.0 END AS FLOAT)) AS embedding",
    ).localCheckpoint(eager=True)
    queries = _planted_ann_queries(spark)
    # closed-form precondition: every stripe holds >= 10 members (else
    # the exact top-10 pads with cos-0 rows and LSH's pad set becomes
    # seed-dependent). The oracle checks the same pops; fail loudly.
    pops = corpus.groupBy((F.col("vec_id") % 8).alias("st")).count().collect()
    if len(pops) != 8 or min(r["count"] for r in pops) < 10:
        raise ValueError(
            f"ann_recall_report needs >=10 vectors per vec_id%8 stripe: "
            f"{sorted((r['st'], r['count']) for r in pops)}"
        )
    exact = (
        S.brute_force_topk(corpus, queries, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    methods = {
        "lsh_h2": lambda: S.lsh_topk(
            corpus, queries, k=10, bits=8, dim=16, probe_hamming=2
        ),
        "ivf_p4": lambda: S.ivf_topk(
            corpus, queries, k=10, ncentroids=16, nprobe=4
        ),
        "pq_rerank": lambda: S.pq_topk_rerank(
            corpus, queries, k=10, shortlist=50, m=16, ncentroids=32
        ),
        "int8": lambda: S.quantized_topk(corpus, queries, k=10),
    }
    reports = []
    for name, fn in sorted(methods.items()):
        got = fn().select("query_id", "neighbor_id", "rank")
        hits = got.join(
            F.broadcast(exact.withColumn("__rel", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        per_q = hits.groupBy("query_id").agg(
            F.sum(F.coalesce("__rel", F.lit(0))).alias("__hits"),
            F.min(F.when(F.col("__rel") == 1, F.col("rank"))).alias(
                "__first"
            ),
        )
        reports.append(
            per_q.agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(F.avg(F.col("__hits") / F.lit(10.0)), 6).alias(
                    "recall_at_10"
                ),
                F.round(
                    F.avg(F.coalesce(1.0 / F.col("__first"), F.lit(0.0))),
                    6,
                ).alias("mrr_at_10"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


_ANN_PLANTED_ORACLE = """
    WITH stripe AS (
      SELECT vec_id % 16 AS st, COUNT(*) AS pop FROM embeddings GROUP BY 1
    ),
    per_q AS (
      SELECT r.s AS qs,
             LEAST(7, COALESCE(m.pop, 0)) AS m,
             COALESCE(t.pop, 0) AS t
      FROM (SELECT unnest(range(8)) AS s) r
      LEFT JOIN stripe m ON m.st = r.s
      LEFT JOIN stripe t ON t.st = r.s + 8
    ),
    calc AS (
      SELECT qs, m, t, LEAST(10, m + t) AS n_rel FROM per_q
    )
    SELECT mm.method,
           CAST(8 AS BIGINT) AS n_queries,
           ROUND(AVG(CASE WHEN mm.method = 'ivf_p1'
                          THEN c.m * 1.0 / c.n_rel
                          ELSE 1.0 END), 6) AS recall_at_10,
           ROUND(AVG(1.0), 6) AS mrr_at_10
    FROM calc c, (VALUES ('exact'), ('int8'), ('ivf_p1'), ('ivf_p2'))
                 AS mm(method)
    GROUP BY 1
"""


#: per-(session, sf_dir) memo of the planted corpus as DRIVER-LOCAL
#: Arrow data — four registry rows (ann_recall_planted + the IVF rows)
#: consume the identical tiny frame (N×16 floats); rebuilding it per
#: row was measurable in the bench (r10, VERDICT r9 item 6). The memo
#: holds collected rows, NOT a localCheckpoint'd DataFrame: checkpoint
#: blocks live on executors and a lost executor would poison every
#: later consumer for the session (r10 review fix) — a local relation
#: re-ships ~1 MB per job and can never go stale.
_PLANTED_CORPUS_CACHE: dict = {}


def _planted_ann_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted 16-dim ANN geometry (see ``ann_recall_planted`` for
    the full derivation), keyed by the embeddings table's vec_ids:
    stripe = vec_id % 16; main stripes s<8 are e_s + g·e_{s+8} (g =
    0.01(r+1) for the 7 lowest ids per stripe, 3.0 for the rest); twin
    stripes are identically 0.92·e_{s-8} + 0.392·e_s.

    Memoized per (Spark application, sf_dir) as collected rows; every
    call returns a fresh local-relation DataFrame over them."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PLANTED_CORPUS_CACHE.get(key)
    if got is None:
        got = _build_planted_ann_corpus(spark, sf_dir).collect()
        _PLANTED_CORPUS_CACHE[key] = got
    return spark.createDataFrame(
        got, "vec_id long, embedding array<float>"
    )


def _build_planted_ann_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ids = load(spark, sf_dir, "embeddings").select("vec_id")
    w = Window.partitionBy(F.col("vec_id") % 16).orderBy("vec_id")
    out = ids.withColumn("__r", F.row_number().over(w) - 1).select(
        "vec_id",
        F.expr(
            """
            transform(sequence(0, 15), a -> CAST(
              CASE
                WHEN vec_id % 16 < 8 AND a = vec_id % 16 THEN 1.0
                WHEN vec_id % 16 < 8 AND a = vec_id % 16 + 8 THEN
                  CASE WHEN __r < 7 THEN 0.01 * (__r + 1) ELSE 3.0 END
                WHEN vec_id % 16 >= 8 AND a = vec_id % 16 - 8 THEN 0.92
                WHEN vec_id % 16 >= 8 AND a = vec_id % 16 THEN 0.392
                ELSE 0.0
              END AS FLOAT))
            """
        ).alias("embedding"),
    )
    return out


def _planted_ann_queries(spark: SparkSession) -> DataFrame:
    """The 8 planted queries: e_s exactly, ids 10M+s (never corpus)."""
    return spark.range(8).selectExpr(
        "id + 10000000 AS vec_id",
        "transform(sequence(0, 15), a -> CAST("
        "  CASE WHEN a = id THEN 1.0 ELSE 0.0 END AS FLOAT)) AS embedding",
    )


@q("ann_recall_planted", _ANN_PLANTED_ORACLE)
def ann_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-EXACT ANN recall scorecard (r8, VERDICT r7 item 5 — the
    mjpg/zlib planted-design precedent applied to retrieval): the
    embeddings table's vec_ids key a 16-dim planted geometry whose
    exact top-10 AND whose IVF routing are both closed-form, so
    recall@10/MRR@10 are numeric literals the DuckDB oracle derives
    from pure stripe-count arithmetic — no trusted booleans.

    The plant (stripe = vec_id % 16, r = rank within stripe):
    - main stripe s<8: vec = e_s + g·e_{s+8}, g = 0.01(r+1) for the 7
      lowest ids (cos to query e_s ≈ 0.9975+, distinct, ordered by g),
      g = 3.0 for the rest (cos = 0.316 — never in a top-10).
    - twin stripe s+8: every member IDENTICALLY 0.92·e_s + 0.392·e_s+8
      (cos to query = 0.92; ties broken by neighbor_id everywhere).
    - queries: e_s exactly, ids 10M+s — never corpus members.

    Forced behavior, provable from the geometry (test-pinned):
    - exact top-10 = min(7,pop) low-g mains then lowest-id twins.
    - ``seed_centroids`` stripes on id%16, so each cluster seeds its
      own centroid; a query's centroid ranking is own-main (≈0.9999),
      own-twin (0.92), all others 0. nprobe=1 probes ONLY the main
      list, which holds exactly the low-g mains (big-g members route
      to the twin centroid: cos 0.663 vs 0.326) → recall is EXACTLY
      m/n_rel (7/10 at standard SFs); nprobe=2 adds the twin list →
      recall 1. int8 quantization (1/127 grid) cannot reorder gaps
      this wide → set-equal to exact → recall 1. MRR = 1 for every
      method (rank-1 is always the g=0.01 main).

    The lsh/pq paths keep the floor contract in ``ann_recall_report``
    (their bucketing depends on seeded random hyperplanes / trained
    codebooks that no SQL replay can reproduce); this query makes the
    recall ARITHMETIC itself value-exact."""
    # the four method plans each consume corpus/queries/exact several
    # times; cut the shared window-function lineage once (tiny frames:
    # N×16 floats and 80 id pairs)
    corpus = _planted_ann_corpus(spark, sf_dir)  # memoized local relation
    queries = _planted_ann_queries(spark)
    exact = (
        S.brute_force_topk(corpus, queries, k=10)
        .select("query_id", "neighbor_id", F.col("rank").alias("__xrank"))
        .localCheckpoint(eager=True)
    )
    n_rel = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__n_rel")
    )
    methods = {
        # the control arm reuses the checkpointed baseline (recall 1.0
        # by definition; pins the scoring harness, not the search)
        "exact": lambda: exact.select(
            "query_id", "neighbor_id", F.col("__xrank").alias("rank")
        ),
        "int8": lambda: S.quantized_topk(corpus, queries, k=10),
        "ivf_p1": lambda: S.ivf_topk(
            corpus, queries, k=10, ncentroids=16, nprobe=1
        ),
        "ivf_p2": lambda: S.ivf_topk(
            corpus, queries, k=10, ncentroids=16, nprobe=2
        ),
    }
    reports = []
    for name, fn in sorted(methods.items()):
        got = fn().select("query_id", "neighbor_id", "rank")
        hits = got.join(
            F.broadcast(exact.withColumn("__rel", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        per_q = (
            hits.groupBy("query_id")
            .agg(
                F.sum(F.coalesce("__rel", F.lit(0))).alias("__hits"),
                F.min(
                    F.when(F.col("__rel") == 1, F.col("rank"))
                ).alias("__first"),
            )
            .join(F.broadcast(n_rel), "query_id")
        )
        reports.append(
            per_q.agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(
                    F.avg(F.col("__hits") / F.col("__n_rel")), 6
                ).alias("recall_at_10"),
                F.round(
                    F.avg(
                        F.coalesce(1.0 / F.col("__first"), F.lit(0.0))
                    ),
                    6,
                ).alias("mrr_at_10"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


_IVF_PLANTED_TOPK_ORACLE = """
    WITH base AS (
      SELECT vec_id, vec_id % 16 AS st,
             ROW_NUMBER() OVER (PARTITION BY vec_id % 16
                                ORDER BY vec_id) AS r
      FROM embeddings
    ),
    mcnt AS (
      SELECT st, LEAST(7, COUNT(*)) AS m FROM base WHERE st < 8 GROUP BY st
    ),
    cand AS (
      SELECT st AS qs, vec_id, r AS rk FROM base WHERE st < 8 AND r <= 7
      UNION ALL
      SELECT b.st - 8 AS qs, b.vec_id, COALESCE(mc.m, 0) + b.r AS rk
      FROM base b LEFT JOIN mcnt mc ON mc.st = b.st - 8
      WHERE b.st >= 8
    )
    SELECT CAST(10000000 + qs AS BIGINT) AS query_id,
           vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rank
    FROM cand WHERE rk <= 10
"""


@q("sim_topk_ivf_append", _IVF_PLANTED_TOPK_ORACLE)
def sim_topk_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance end-to-end (r8): build the persisted
    index on the EVEN-vec_id half of the planted corpus, then
    ``ivf_index_append`` routes the ODD half to the EXISTING centroids
    (one broadcast pass over just the delta, plain parquet append into
    only the affected centroid partitions — no retraining, no rewrite,
    concurrent readers stay consistent). Querying the grown index at
    nprobe=2 must return EXACTLY the full-corpus closed form — the
    planted geometry's routing is centroid-choice-insensitive (any
    low-g main / any twin represents its cluster), so the half-corpus
    seeds route the appended half identically and the oracle is the
    same vec_id window arithmetic as ``sim_topk_ivf_indexed``."""
    import tempfile

    corpus = _planted_ann_corpus(spark, sf_dir)  # memoized local relation
    path = tempfile.mkdtemp(prefix="otspark_ivfapp_")
    S.build_ivf_index(
        corpus.filter(F.col("vec_id") % 2 == 0), path, ncentroids=16
    )
    S.ivf_index_append(
        spark, corpus.filter(F.col("vec_id") % 2 == 1), path
    )
    out = S.ivf_topk_indexed(
        spark, path, _planted_ann_queries(spark), k=10, nprobe=2
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
    )


@q("streaming_ivf_append", _IVF_PLANTED_TOPK_ORACLE)
def streaming_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous ANN index maintenance as a STREAM (r10 — the
    streaming twin of ``sim_topk_ivf_append``): the persisted IVF index
    is built on the EVEN-vec_id half of the planted corpus, the ODD
    half lands as parquet shards in a tail directory, and
    ``stream_ivf_append`` folds them in across MULTIPLE micro-batches
    (maxFilesPerTrigger=2 over 4 shards), each routed by one broadcast
    pass and appended into only the affected centroid partitions —
    marker-guarded against re-delivery (duplicate vectors would flip
    this oracle's exact top-10). Querying the grown index at nprobe=2
    must return EXACTLY the full-corpus closed form, the same vec_id
    window arithmetic as the batch twins."""
    corpus = _planted_ann_corpus(spark, sf_dir)  # memoized local relation
    path = tempfile.mkdtemp(prefix="otspark_sivf_")
    S.build_ivf_index(
        corpus.filter(F.col("vec_id") % 2 == 0), path, ncentroids=16
    )
    land = tempfile.mkdtemp(prefix="otspark_sivf_land_")
    corpus.filter(F.col("vec_id") % 2 == 1).repartition(4).write.mode(
        "overwrite"
    ).parquet(land)
    from opentick_spark.streaming.ingest import stream_ivf_append

    q_ = stream_ivf_append(
        spark,
        land,
        "vec_id long, embedding array<float>",
        path,
        tempfile.mkdtemp(prefix="otspark_sivf_ck_"),
        max_files_per_trigger=2,
    )
    q_.awaitTermination()
    out = S.ivf_topk_indexed(
        spark, path, _planted_ann_queries(spark), k=10, nprobe=2
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
    )


@q(
    "sim_topk_ivf_indexed",
    """
    WITH base AS (
      SELECT vec_id, vec_id % 16 AS st,
             ROW_NUMBER() OVER (PARTITION BY vec_id % 16
                                ORDER BY vec_id) AS r
      FROM embeddings
    ),
    mcnt AS (
      SELECT st, LEAST(7, COUNT(*)) AS m FROM base WHERE st < 8 GROUP BY st
    ),
    cand AS (
      SELECT st AS qs, vec_id, r AS rk FROM base WHERE st < 8 AND r <= 7
      UNION ALL
      SELECT b.st - 8 AS qs, b.vec_id, COALESCE(mc.m, 0) + b.r AS rk
      FROM base b LEFT JOIN mcnt mc ON mc.st = b.st - 8
      WHERE b.st >= 8
    )
    SELECT CAST(10000000 + qs AS BIGINT) AS query_id,
           vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rank
    FROM cand WHERE rk <= 10
    """,
)
def sim_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED-index ANN (r8): ``build_ivf_index`` writes the corpus
    physically partitioned by centroid_id (parquet directory
    partitioning — the "assignment becomes the table's partition key"
    posture made an on-disk fact), then ``ivf_topk_indexed`` probes
    nprobe lists per query as an ``isin`` PARTITION filter: every
    unprobed directory is pruned at planning time, never opened — the
    100 TB shape where a query scans nprobe/ncentroids of the corpus.

    Runs on the planted 16-dim geometry (``_planted_ann_corpus``), so
    nprobe=2 probes exactly {main, twin} of the query's stripe and the
    retrieved top-10 is CLOSED-FORM: the ≤7 low-g mains in id order,
    then the lowest-id twins (identical vectors — ties break by
    neighbor_id) — pure vec_id window arithmetic the oracle replays.
    cos is omitted from the output (its float replay adds nothing the
    rank contract doesn't already pin)."""
    import tempfile

    corpus = _planted_ann_corpus(spark, sf_dir)  # memoized local relation
    path = tempfile.mkdtemp(prefix="otspark_ivfidx_")
    S.build_ivf_index(corpus, path, ncentroids=16)
    out = S.ivf_topk_indexed(
        spark, path, _planted_ann_queries(spark), k=10, nprobe=2
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
    )


@q(
    "dedup_edit_distance",
    f"""
    WITH t AS (
      SELECT doc_id AS id, {_NORM} AS n FROM documents
    ),
    blk AS (SELECT id, n, substr(n, 1, 12) AS b FROM t)
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.n, b.n)::BIGINT AS dist
    FROM blk a JOIN blk b ON a.b = b.b AND a.id < b.id
    WHERE levenshtein(a.n, b.n) <= 8
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-blocked Levenshtein near-dups (≤8 edits on normalized
    text): JVM levenshtein, per-block pairwise only
    (operators/dedup.py edit_distance_pairs)."""
    docs = load(spark, sf_dir, "documents")
    out = D.edit_distance_pairs(docs, max_dist=8, prefix_len=12)
    return out.select("id_a", "id_b", F.col("dist").cast("long"))


@q(
    "collocation_pmi_top100",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(ts)),
                    i -> struct_pack(a := ts[i], b := ts[i+1]))) AS p
      FROM toks
    ),
    c2 AS (
      SELECT p.a AS t1, p.b AS t2, COUNT(*) AS c2 FROM pairs
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ),
    c1 AS (
      SELECT t, COUNT(*) AS c1 FROM (
        SELECT unnest(ts) AS t FROM toks
      ) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(c1)::DOUBLE FROM c1) AS t_uni,
             (SELECT SUM(len(ts) - 1)::DOUBLE FROM toks WHERE len(ts) > 1)
               AS t_bi
    )
    SELECT t1, t2, c2.c2::BIGINT AS n,
           ROUND(ln((c2.c2 / tot.t_bi)
                 / ((ca.c1 / tot.t_uni) * (cb.c1 / tot.t_uni))), 6) AS pmi
    FROM c2
    JOIN c1 ca ON ca.t = c2.t1
    JOIN c1 cb ON cb.t = c2.t2, tot
    ORDER BY pmi DESC, t1, t2 LIMIT 100
    """,
)
def collocation_pmi_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-100 adjacent token pairs by pointwise
    mutual information, min count 5. Bigram counts keyed on the pair,
    vocabulary-sized unigram table broadcast back twice, totals a 1-row
    broadcast; final top-k is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(X.ws_tokens(F.col("text"))).alias("__pos", "t"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("__pos")
    pairs = (
        toks.select(F.lag("t").over(w).alias("t1"), F.col("t").alias("t2"))
        .filter(F.col("t1").isNotNull())
    )
    c2 = (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= 5)
    )
    c1 = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    tot = pairs.agg(F.count(F.lit(1)).cast("double").alias("t_bi")).crossJoin(
        c1.agg(F.sum("c1").cast("double").alias("t_uni"))
    )
    scored = (
        c2.join(F.broadcast(c1.withColumnsRenamed({"t": "t1", "c1": "ca"})), "t1")
        .join(F.broadcast(c1.withColumnsRenamed({"t": "t2", "c1": "cb"})), "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            F.col("c2").cast("long").alias("n"),
            F.round(
                F.log(
                    (F.col("c2") / F.col("t_bi"))
                    / ((F.col("ca") / F.col("t_uni")) * (F.col("cb") / F.col("t_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "t1", "t2").limit(100)


@q(
    "streaming_topk_values",
    """
    WITH rk AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS r,
             COUNT(*) OVER (PARTITION BY user_id) AS n_seen
      FROM events WHERE user_id < 40
    )
    SELECT user_id, ANY_VALUE(n_seen)::BIGINT AS n_seen,
           MAX(CASE WHEN r = 1 THEN value END) AS top1,
           MAX(CASE WHEN r = 2 THEN value END) AS top2,
           MAX(CASE WHEN r = 3 THEN value END) AS top3
    FROM rk GROUP BY user_id
    """,
)
def streaming_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second custom stateful streaming operator: per-user running top-3
    values held in bounded order-statistics state across micro-batches
    (applyInPandasWithState). Oracle: final state per key must equal the
    batch top-3 — valid because a top-k set is batch-order-insensitive."""
    from pyspark.sql import Window

    from opentick_spark.streaming.ingest import state_partitions
    from opentick_spark.streaming.stateful import stateful_topk_values

    raw = load_raw(spark, sf_dir, "events")
    schema = raw.schema
    name = "topk_sink_" + uuid.uuid4().hex[:8]
    src_dir = tempfile.mkdtemp(prefix="otspark_topk_src_")
    # restrict to a bounded key set and write a real 2-file source so
    # the state genuinely persists across micro-batches (2 batches via
    # maxFilesPerTrigger=1 — cross-batch state proven at half the
    # micro-batch cost of a wider fan-out)
    raw.filter(F.col("user_id") < 40).repartition(2).write.parquet(
        os.path.join(src_dir, "part"), mode="overwrite"
    )
    with state_partitions(spark, 8):
        query = stateful_topk_values(
            spark,
            os.path.join(src_dir, "part"),
            schema,
            name,
            tempfile.mkdtemp(prefix="otspark_topk_ck_"),
        )
        query.awaitTermination()
    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    return (
        sink.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "user_id",
            F.col("n_seen").cast("long").alias("n_seen"),
            "top1",
            "top2",
            "top3",
        )
    )


@q(
    "lang_id_confusion",
    f"""
    WITH p AS ({_lang_oracle()})
    SELECT d.lang AS true_lang, p.pred_lang, COUNT(*)::BIGINT AS n
    FROM p JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the heuristic language ID
    against the labeled lang column — the quality signal that tells a
    pipeline operator when the cheap classifier needs replacing for a
    given slice. One projection + one (true, pred)-keyed agg whose
    result is at most |langs|² rows."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("true_lang"),
            X.lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@q(
    "tokenizer_fertility_by_lang",
    """
    SELECT lang,
           SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))::BIGINT
             AS bpe_tokens,
           SUM(len(string_split_regex(trim(lower(text)), '\\s+')))::BIGINT
             AS ws_tokens,
           ROUND(SUM(len(regexp_extract_all(text,
                     '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))::DOUBLE
                 / SUM(len(string_split_regex(trim(lower(text)), '\\s+'))), 6)
             AS fertility
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (sub-tokens per whitespace word) per language
    — the standard tokenizer-equity metric (a high-fertility language
    pays more sequence length per word). One aggregate, JVM regex."""
    docs = load(spark, sf_dir, "documents")
    bpe = X.bpe_token_count(F.col("text"))
    ws = X.ws_token_count(F.col("text"))
    return docs.groupBy("lang").agg(
        F.sum(bpe).cast("long").alias("bpe_tokens"),
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.round(
            F.sum(bpe).cast("double") / F.sum(ws), 6
        ).alias("fertility"),
    )


@q(
    "hard_negative_mining",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id % 25 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neg_id,
             list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[])
               AS cos
      FROM q JOIN embeddings e
        ON e.vec_id != q.query_id AND e.label != q.qlabel
    )
    SELECT query_id, neg_id, ROUND(cos, 6) AS cos, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neg_id
      ) AS rank FROM scored
    ) WHERE rank <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for each held-out query, the
    5 most-similar vectors with a DIFFERENT label — the highest-value
    negatives for metric learning. Broadcast-queries/stationary-corpus
    shape with the label-mismatch predicate fused into the scoring pass."""
    emb = load(spark, sf_dir, "embeddings")
    q_side = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    from pyspark.sql import Window

    scored = (
        emb.select(
            F.col("vec_id").alias("neg_id"),
            F.col("embedding").alias("cv"),
            F.col("label").alias("nlabel"),
        )
        .crossJoin(F.broadcast(q_side))
        .filter(
            (F.col("neg_id") != F.col("query_id"))
            & (F.col("nlabel") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "neg_id",
            S.cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .withColumn("cos", F.round("cos", 6))
    )


def _pagerank_oracle_sql(iterations: int = 12, damping: float = 0.85) -> str:
    """DuckDB oracle for source_pagerank: the source_overlap_matrix edge
    CTE (same {_NGRAM8}/{_NORM} macros, jac filter applied on the SAME
    rounded value the Spark operator rounds), then the textbook power
    iteration UNROLLED as a generated chain of per-iteration CTEs —
    recursive-CTE aggregation over the working table is restricted in
    some engines, and a fixed 12-step unroll is exactly what the Spark
    loop executes anyway. Teleport/init arithmetic mirrors graph.py
    bit-for-bit ((1.0-0.85)/N, 1.0/N, pr/deg in doubles); summation
    order differs, absorbed by the final ROUND(pr, 6)."""
    steps = []
    for i in range(iterations):
        steps.append(
            f"""r{i + 1} AS (
      SELECT n.node,
             (1.0 - {damping})/(SELECT n FROM nn)
             + {damping} * COALESCE(c.inflow, 0.0) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r{i}.pr / e.deg) AS inflow
        FROM e JOIN r{i} ON r{i}.node = e.src GROUP BY 1
      ) c ON c.node = n.node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH t AS (
      SELECT doc_id, source, {_NGRAM8} AS sh
      FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS __toks
            FROM documents)
    ),
    gg AS (SELECT DISTINCT source, unnest(sh) AS g FROM t),
    sizes AS (SELECT source, COUNT(*) AS n FROM gg GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
      FROM gg a JOIN gg b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT src_a, src_b
      FROM shared
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      WHERE ROUND(shared::DOUBLE / (sa.n + sb.n - shared), 6) >= 0.0005
    ),
    ed AS (
      SELECT src_a AS src, src_b AS dst FROM pairs
      UNION
      SELECT src_b AS src, src_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1),
    e AS (SELECT ed.src, ed.dst, deg.deg FROM ed JOIN deg USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM ed),
    nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
    r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS pr FROM nodes),
    {chain}
    SELECT node AS source, ROUND(pr, 6) AS pr FROM r{iterations}
    """


@q("source_pagerank", _pagerank_oracle_sql())
def source_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of sources in the shared-8-gram overlap graph
    — which source sits at the center of the republishing network. Edges
    from shingle_overlap_matrix (Jaccard ≥ 0.0005 to drop hapax-collision
    noise), 12 undirected power iterations with localCheckpoint lineage
    cuts (operators/graph.py). Oracle-backed as of r6: the iteration is
    fixed-step and float-deterministic, so DuckDB can replay it as an
    unrolled 12-CTE chain (_pagerank_oracle_sql) on the proven
    source_overlap_matrix edge SQL; the golden pytest additionally pins
    the iteration against textbook numpy PageRank."""
    from opentick_spark.operators.graph import pagerank

    docs = load(spark, sf_dir, "documents")
    edges = D.shingle_overlap_matrix(docs, group_col="source", n=8).filter(
        F.col("jac") >= 0.0005
    )
    pr = pagerank(
        edges, src_col="src_a", dst_col="src_b", iterations=12,
        checkpoint_every=6, driver_if_edges_below=100_000,
    )
    return pr.select(
        F.col("node").alias("source"), F.round("pr", 6).alias("pr")
    )


def _lsh_banding_oracle() -> str:
    """Full DuckDB replay of the 24×4 MinHash banding pipeline (r7 —
    this was the last rows-only dedup entry). Portability hinges on the
    md5 base hash: every engine computes the same md5 hex, so the whole
    chain — base hash, the 96 (a·h+b) mod M permutation mins, the
    per-band polynomial-fold buckets, the candidate join, the exact
    Jaccard verify — is replayed value-exact in SQL with the SAME seed
    constants embedded as literals."""
    from opentick_spark.operators.dedup import _MERSENNE, _minhash_params

    params = _minhash_params(96, 42)
    mins = ",\n             ".join(
        f"min((hh * {a} + {b}) % {_MERSENNE}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )

    def fold(idx: list[int]) -> str:
        acc = "0"
        for i in idx:
            acc = f"(({acc}) * 1000003 + m{i}) % {_MERSENNE}"
        return acc

    bands = "\n      UNION ALL ".join(
        f"SELECT id, {b} AS band, {fold(list(range(b * 4, b * 4 + 4)))} "
        "AS bucket FROM m"
        for b in range(24)
    )
    return f"""
    WITH t AS (
      SELECT doc_id AS id, {_SHINGLES} AS sh
      FROM (SELECT doc_id, {_NORM} AS __norm FROM documents)
    ),
    e AS (SELECT id, unnest(sh) AS g FROM t),
    h AS (
      SELECT id,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {_MERSENNE}
               AS hh
      FROM e
    ),
    m AS (
      SELECT id,
             {mins}
      FROM h GROUP BY id
    ),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT x.id AS id_a, y.id AS id_b
      FROM bands x
      JOIN bands y
        ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN t sa ON sa.id = c.id_a
      JOIN t sb ON sb.id = c.id_b
      WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
            / (len(sa.sh) + len(sb.sh)
               - len(list_intersect(sa.sh, sb.sh))) >= 0.5
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM documents) AS nd,
             (SELECT COUNT(*) FROM cand) AS nc,
             (SELECT COUNT(*) FROM ver) AS nv
    )
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CAST(nd * (nd - 1) // 2 AS BIGINT) AS possible_pairs,
           CAST(nc AS BIGINT) AS candidate_pairs,
           CAST(nv AS BIGINT) AS verified_pairs,
           CASE WHEN nc > 0 THEN ROUND(nv::DOUBLE / nc, 6) END AS precision,
           CASE WHEN nd > 1
                THEN ROUND(1.0 - nc::DOUBLE / (nd * (nd - 1) // 2), 6)
           END AS pruning_ratio
    FROM counts
    """


@q("lsh_banding_efficiency", _lsh_banding_oracle())
def lsh_banding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-blocking scorecard (the near-dup analog of
    ann_recall_report): how many candidate pairs the 24x4 MinHash
    banding emits vs the n-squared it avoids, and what fraction of
    candidates survive exact-Jaccard verification.

    r7: value-exact DuckDB oracle — the pipeline runs on the PORTABLE
    hash family (md5 base hash, polynomial-fold band buckets; both JVM
    built-ins, see minhash_signatures/band_buckets), which every engine
    computes identically, so the oracle replays the entire banding
    chain rather than trusting a rows-only pin. No driver-side
    collects: the three counts meet in one crossJoin of 1-row
    aggregates.

    Output: n_docs, possible_pairs, candidate_pairs, verified_pairs,
    precision, pruning_ratio."""
    from opentick_spark.operators.dedup import (
        band_buckets,
        exploded_shingles,
        jaccard,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    sh = (
        exploded_shingles(docs, "doc_id", "text", 2, distinct=False)
        .groupBy("id")
        .agg(F.collect_set("g").alias("sh"))
        .localCheckpoint(eager=True)
    )
    re_exploded = sh.select("id", F.explode("sh").alias("g"))
    sigs = minhash_signatures(
        docs, "doc_id", "text", 2, 96, 42, shingles=re_exploded,
        base_hash="md5",
    )
    banded = band_buckets(sigs, 96, 24, portable=True)
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
    )
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    nc = cand.agg(F.count(F.lit(1)).alias("nc"))
    nv = verified.agg(F.count(F.lit(1)).alias("nv"))
    return (
        nd.crossJoin(nc)
        .crossJoin(nv)
        .select(
            F.col("nd").cast("long").alias("n_docs"),
            F.expr("CAST(nd * (nd - 1) div 2 AS BIGINT)").alias(
                "possible_pairs"
            ),
            F.col("nc").cast("long").alias("candidate_pairs"),
            F.col("nv").cast("long").alias("verified_pairs"),
            F.when(
                F.col("nc") > 0,
                F.round(F.col("nv").cast("double") / F.col("nc"), 6),
            ).alias("precision"),
            F.when(
                F.col("nd") > 1,
                F.round(
                    F.lit(1.0)
                    - F.col("nc").cast("double")
                    / F.expr("CAST(nd * (nd - 1) div 2 AS DOUBLE)"),
                    6,
                ),
            ).alias("pruning_ratio"),
        )
    )


def _planted_ztexts() -> list[str]:
    """32 deterministic texts spanning the compressibility spectrum —
    pure runs, short periodic repeats, and md5-hex pseudo-noise in
    varying mixes/lengths. Pure stdlib + fixed strings: any engine (or
    the oracle builder) reproduces them byte-for-byte."""
    import hashlib

    out = []
    for p in range(32):
        unit = "the quick brown fox "[: 3 + (p * 5) % 17]
        noise = hashlib.md5(f"zpat{p}".encode()).hexdigest() * (1 + p // 4)
        out.append(unit * (10 + 9 * p) + noise[: 11 * p])
    return out


def _text_compression_oracle() -> str:
    """Closed-form oracle for the planted design: the expected zlib
    ratio of each of the 32 patterns is precomputed HERE with the same
    stdlib zlib the Arrow UDF calls, half-up-rounded exactly like
    Spark's ROUND, and emitted as a CASE literal over doc_id % 32 —
    the driver then value-checks the whole distributed pipeline
    (planted-text projection → Arrow batching → zlib UDF) at any SF."""
    import zlib
    from decimal import ROUND_HALF_UP, Decimal

    whens = []
    for p, t in enumerate(_planted_ztexts()):
        raw = t.encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / len(raw)
        # repr() = shortest-roundtrip decimal, the same surface Spark's
        # ROUND sees (BigDecimal.valueOf → Double.toString), so the
        # half-up here can't diverge from the JVM at a half-boundary
        r6 = Decimal(repr(ratio)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        whens.append(f"WHEN {p} THEN {r6}")
    return (
        "SELECT doc_id, CAST(CASE doc_id % 32 "
        + " ".join(whens)
        + " END AS DOUBLE) AS zratio FROM documents"
    )


@q("text_compression_ratio", _text_compression_oracle())
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal per document (zlib level 6,
    Arrow-batched pandas UDF — a sanctioned Python escape hatch, kept
    off the row-count-heavy paths).

    r7: oracle-backed via the planted-design pattern (the WAV
    square-wave / PNG checkerboard precedent): each doc carries one of
    32 deterministic planted texts keyed by doc_id % 32, the REAL zlib
    UDF compresses them through the full distributed path, and the
    oracle replays the planted arithmetic closed-form (Python zlib at
    oracle-build time — same stdlib, independent of the Spark plumbing
    under test). Real-corpus ratios stay exact-golden-pinned against
    Python zlib in tests/test_selection.py via the same operator."""
    docs = load(spark, sf_dir, "documents")
    patterns = F.array(*[F.lit(t) for t in _planted_ztexts()])
    planted = docs.select(
        "doc_id",
        F.element_at(patterns, (F.col("doc_id") % 32 + 1).cast("int")).alias(
            "__planted"
        ),
    )
    return planted.select(
        "doc_id",
        F.round(X.compression_ratio("__planted"), 6).alias("zratio"),
    )


@q(
    "label_cohesion_stats",
    """
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    pos AS (
      SELECT vec_id, label,
             unnest(range(1, len(embedding) + 1)) AS pos,
             unnest(list_transform(embedding, v -> v::DOUBLE)) AS x
      FROM e
    ),
    cen AS (SELECT label, pos, AVG(x) AS m FROM pos GROUP BY 1, 2),
    dots AS (
      SELECT p.vec_id, p.label,
             SUM(p.x * c.m) AS dot,
             SQRT(SUM(p.x * p.x)) AS vnorm
      FROM pos p JOIN cen c ON c.label = p.label AND c.pos = p.pos
      GROUP BY 1, 2
    ),
    cn AS (SELECT label, SQRT(SUM(m * m)) AS mnorm FROM cen GROUP BY 1)
    SELECT d.label::BIGINT AS label, COUNT(*)::BIGINT AS n,
           ROUND(AVG(d.dot / (d.vnorm * cn.mnorm)), 6) AS avg_cos,
           ROUND(MIN(d.dot / (d.vnorm * cn.mnorm)), 6) AS min_cos
    FROM dots d JOIN cn USING (label) GROUP BY d.label
    """,
)
def label_cohesion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: mean and worst cosine of each vector to its
    label centroid — depressed cohesion flags mislabeled or mixed
    classes before they poison a classifier. Centroids come from the
    labels×dim posexplode aggregate (never the vectors), get broadcast
    back as arrays (|labels| rows), and the per-vector cosine is an
    in-row JVM fold — one linear pass, no pairwise work."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    cen = pos.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    cen_arr = (
        cen.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    scored = emb.join(F.broadcast(cen_arr), "label").select(
        "label",
        S.cosine(
            F.col("embedding").cast("array<double>"), F.col("centroid")
        ).alias("cos"),
    )
    return scored.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("cos"), 6).alias("avg_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
    )


@q(
    "dedup_containment",
    f"""
    WITH t AS (
      SELECT doc_id, {_SHINGLES} AS sh
      FROM (SELECT doc_id, {_NORM} AS __norm FROM documents)
    ),
    e AS (SELECT doc_id, unnest(sh) AS s FROM t),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(sh) AS n FROM t)
    SELECT id_a, id_b,
           ROUND(i::DOUBLE / least(na.n, nb.n), 6) AS containment,
           ROUND(i::DOUBLE / (na.n + nb.n - i), 6) AS jac
    FROM inter
    JOIN sz na ON na.doc_id = inter.id_a
    JOIN sz nb ON nb.doc_id = inter.id_b
    WHERE i::DOUBLE / least(na.n, nb.n) >= 0.8
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dups (|A∩B| / min set): sub-document duplication
    that Jaccard dilutes — same inverted index, different normalization
    (operators/dedup.ngram_containment_pairs)."""
    docs = load(spark, sf_dir, "documents")
    out = D.ngram_containment_pairs(docs, n=2, threshold=0.8)
    return out.select(
        "id_a",
        "id_b",
        F.round("containment", 6).alias("containment"),
        F.round("jac", 6).alias("jac"),
    )


@q(
    "split_contamination_stats",
    """
    WITH s0 AS (
      SELECT doc_id, string_split({norm}, ' ') AS __toks FROM documents
    ),
    s AS (
      SELECT doc_id,
             {h8} % 100 AS bucket,
             {ngram8} AS sh
      FROM s0
    ),
    tr AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE bucket < 80),
    te AS (
      SELECT doc_id, unnest(sh) AS g FROM s WHERE bucket >= 90
    ),
    hits AS (
      SELECT te.doc_id, COUNT(DISTINCT te.g) AS shared_grams
      FROM te JOIN tr ON tr.g = te.g
      GROUP BY te.doc_id
    ),
    totals AS (
      SELECT COUNT(*) AS n_test FROM s WHERE bucket >= 90
    )
    SELECT totals.n_test::BIGINT AS n_test,
           COUNT(hits.doc_id)::BIGINT AS n_contaminated,
           COALESCE(SUM(hits.shared_grams), 0)::BIGINT AS total_shared_grams,
           ROUND(COUNT(hits.doc_id)::DOUBLE / totals.n_test, 6)
             AS contaminated_frac
    FROM totals LEFT JOIN hits ON TRUE
    GROUP BY totals.n_test
    """.format(h8=_H8.format(x="doc_id::VARCHAR"), norm=_NORM, ngram8=_NGRAM8),
)
def split_contamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: how many md5-split TEST documents share at
    least one 8-gram with the TRAIN split, and how many distinct grams
    leak — the check that catches near-duplicate leakage across a
    'random' split before a model trains on it. Inverted-index join on
    the gram (train side reduced to distinct grams first); never
    doc×doc."""
    docs = load(spark, sf_dir, "documents")
    split = X.hash_split(docs)
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    tr_g = (
        D.exploded_shingles(train, "doc_id", "text", 8)
        .select("g")
        .distinct()
    )
    te = D.exploded_shingles(test, "doc_id", "text", 8)
    hits = (
        te.join(tr_g, "g")
        .groupBy("id")
        .agg(F.countDistinct("g").alias("shared_grams"))
    )
    n_test = test.count()
    agg = hits.agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.coalesce(F.sum("shared_grams"), F.lit(0)).alias("total_shared_grams"),
    )
    return agg.select(
        F.lit(n_test).cast("long").alias("n_test"),
        F.col("n_contaminated").cast("long"),
        F.col("total_shared_grams").cast("long"),
        F.round(F.col("n_contaminated") / F.lit(float(n_test)), 6).alias(
            "contaminated_frac"
        ),
    )


@q(
    "dataset_card",
    f"""
    WITH per AS (
      SELECT doc_id, lang, source,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_toks,
             md5({_NORM}) AS fp
      FROM documents
    ),
    langs AS (
      SELECT lang, COUNT(*) AS n FROM per GROUP BY lang
    ),
    top AS (
      SELECT lang, n FROM langs ORDER BY n DESC, lang LIMIT 1
    ),
    dups AS (
      SELECT COUNT(*) - COUNT(DISTINCT fp) AS n_dup FROM per
    )
    SELECT (SELECT COUNT(*) FROM per)::BIGINT AS n_docs,
           (SELECT COUNT(DISTINCT source) FROM per)::BIGINT AS n_sources,
           (SELECT COUNT(*) FROM langs)::BIGINT AS n_langs,
           (SELECT lang FROM top) AS top_lang,
           ROUND((SELECT n FROM top)::DOUBLE
                 / (SELECT COUNT(*) FROM per), 6) AS top_lang_share,
           (SELECT SUM(n_toks) FROM per)::BIGINT AS total_tokens,
           ROUND((SELECT AVG(n_toks) FROM per), 6) AS mean_doc_tokens,
           ROUND((SELECT SUM(CASE WHEN n_toks < 5 THEN 1 ELSE 0 END) FROM per)
                 ::DOUBLE / (SELECT COUNT(*) FROM per), 6) AS short_frac,
           ROUND((SELECT n_dup FROM dups)::DOUBLE
                 / (SELECT COUNT(*) FROM per), 6) AS exact_dup_rate
    """,
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset datasheet in one row: scale, source/language mix,
    token accounting, short-doc fraction, and exact-duplicate rate —
    the summary a data release ships with. One projection pass
    computes every per-doc metric, then a single multi-aggregate plus a
    fingerprint distinct-count; the langs table is |langs| rows."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "doc_id",
        "lang",
        "source",
        X.ws_token_count(F.col("text")).alias("n_toks"),
        X.md5_fingerprint(F.col("text")).alias("fp"),
    )
    langs = per.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    top = langs.orderBy(F.col("n").desc(), "lang").limit(1)
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.avg("n_toks").alias("mean_doc_tokens_raw"),
        F.sum(F.when(F.col("n_toks") < 5, 1).otherwise(0)).alias("n_short"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dup"),
    )
    n_langs = langs.agg(F.count(F.lit(1)).cast("long").alias("n_langs"))
    return (
        agg.crossJoin(F.broadcast(n_langs))
        .crossJoin(
            F.broadcast(
                top.select(
                    F.col("lang").alias("top_lang"), F.col("n").alias("top_n")
                )
            )
        )
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "top_lang",
            F.round(F.col("top_n") / F.col("n_docs"), 6).alias("top_lang_share"),
            "total_tokens",
            F.round("mean_doc_tokens_raw", 6).alias("mean_doc_tokens"),
            F.round(F.col("n_short") / F.col("n_docs"), 6).alias("short_frac"),
            F.round(F.col("n_dup") / F.col("n_docs"), 6).alias("exact_dup_rate"),
        )
    )


@q(
    "bloom_decontaminate",
    f"""
    WITH t AS (
      SELECT doc_id, {_NGRAM8} AS sh
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS __toks FROM documents)
    ),
    e AS (
      SELECT DISTINCT c.doc_id
      FROM t c JOIN t b ON c.doc_id >= 50 AND b.doc_id < 50
      WHERE len(list_intersect(c.sh, b.sh)) >= 1
    )
    SELECT (SELECT COUNT(*) FROM documents WHERE doc_id >= 50)::BIGINT
             AS n_corpus_docs,
           (SELECT COUNT(*) FROM e)::BIGINT AS n_contaminated_exact,
           TRUE AS no_false_negatives,
           TRUE AS fp_within_bound
    """,
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter eval decontamination: benchmark 8-grams (doc_id < 50
    stands in for the eval set) build a 128 Kbit filter distributively
    (bit_or per 64-bit word — at most m/64 rows shuffle, whatever the
    benchmark size), and the corpus probe is a pure projection against
    the ONE broadcast array row — zero corpus-side exchange before the
    per-doc flag reduce, unlike the inverted-index join path
    (contamination_8gram) which shuffles grams. The 100 TB trade: exact
    shared-gram evidence costs a corpus-wide shuffle; the bloom pass
    costs a corpus scan. Contract checked in-query: no false negatives
    (every exactly-contaminated doc is flagged — the decontamination
    guarantee) and measured false-positive docs within max(5, 1%) of the
    clean corpus (m=2^17, k=5 → per-gram FPP ~5e-6). Both booleans are
    deterministic for fixed input, so they hash-check; the exact
    contaminated count is the oracle-matched value."""
    from opentick_spark.operators import sketch as SK

    m_bits, k = 1 << 17, 5
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 50)
    corpus = docs.filter(F.col("doc_id") >= 50)
    bloom = SK.bloom_build(
        D.exploded_shingles(bench, n=8), "g", m_bits=m_bits, k=k
    )
    hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), m_bits, k)
    flagged = (
        D.exploded_shingles(corpus, n=8, distinct=False)
        .crossJoin(F.broadcast(bloom))
        .groupBy("id")
        .agg(F.bool_or(hit).alias("flagged"))
        .filter("flagged")
    )
    exact = D.ngram_contamination(corpus, bench, n=8, min_shared=1).select(
        "corpus_id"
    ).distinct()
    a = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_corpus_docs"))
    b = exact.agg(F.count(F.lit(1)).cast("long").alias("n_contaminated_exact"))
    c = flagged.agg(F.count(F.lit(1)).cast("long").alias("__n_flagged"))
    d = exact.join(
        flagged, exact.corpus_id == flagged.id, "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("__n_missed"))
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(d))
        .select(
            "n_corpus_docs",
            "n_contaminated_exact",
            (F.col("__n_missed") == 0).alias("no_false_negatives"),
            (
                (F.col("__n_flagged") - F.col("n_contaminated_exact"))
                <= F.greatest(
                    F.lit(5.0),
                    F.lit(0.01)
                    * (F.col("n_corpus_docs") - F.col("n_contaminated_exact")),
                )
            ).alias("fp_within_bound"),
        )
    )


@q("dedup_ppjoin", _JACCARD_ORACLE)
def dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard near-dups (AllPairs/PPJoin family):
    identical output contract — and oracle — as dedup_ngram_jaccard,
    with candidates generated only from each doc's rarest-shingle
    prefix, so the self-join fans out on LOW-frequency keys instead of
    every shingle. The deterministic exact-result scale path where
    MinHash-LSH's probabilistic recall is not acceptable."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.prefix_filter_jaccard_pairs(docs, n=2, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jac", 6).alias("jac"))


@q(
    "embedding_random_projection",
    """
    WITH s AS (
      SELECT i.i, j.j,
             CASE WHEN ('0x' || substr(md5(i.i || '_' || j.j), 1, 8))::UBIGINT
                       % 2 = 0
                  THEN 0.25 ELSE -0.25 END AS sgn
      FROM range(64) i(i), range(16) j(j)
    )
    SELECT e.vec_id, s.j::BIGINT AS j,
           -- + 0 normalizes IEEE -0.0 to +0.0 (Spark's round never emits
           -- negative zero; a bare DuckDB ROUND does, and the driver's
           -- canonicalizer sorts rows by repr, where '-0.0' misaligns)
           ROUND(SUM(e.embedding[s.i + 1] * s.sgn), 4) + 0 AS proj
    FROM embeddings e, s
    GROUP BY e.vec_id, s.j
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss reduction 64 -> 16 dims with a
    hash-deterministic Rademacher matrix (similarity.random_projection):
    a zero-shuffle Arrow-batched matmul whose sign matrix is derived
    from md5 parity, so DuckDB replays the exact projection — a
    full-value oracle for a 'random' projection. Long (vec_id, j, proj)
    scalar layout; proj rounded to 4dp to absorb summation-order ulps."""
    emb = load(spark, sf_dir, "embeddings")
    proj = S.random_projection(emb, out_dim=16)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("j", "p")
    ).select(
        "vec_id",
        F.col("j").cast("long").alias("j"),
        (F.round("p", 4) + F.lit(0.0)).alias("proj"),
    )


@q(
    "group_kfold_stats",
    """
    WITH t AS (
      SELECT *,
             list_reduce(
               list_transform(range(1, 9),
                 i -> strpos('0123456789abcdef',
                             substr(md5(user_id::VARCHAR), i, 1)) - 1),
               (a, b) -> a * 16 + b) % 5 AS fold
      FROM events
    )
    SELECT fold::INT AS fold,
           COUNT(DISTINCT user_id)::BIGINT AS n_users,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(value), 4) + 0 AS sum_value
    FROM t GROUP BY 1
    """,
)
def group_kfold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped 5-fold cross-validation assignment over events keyed by
    user (text.group_kfold): all of a user's rows share one fold —
    leakage-free held-out folds by construction (fold = md5(user) mod 5,
    engine-stable, zero shuffle for the assignment). Per-fold user/event
    counts and value mass; one tiny aggregate."""
    ev = load(spark, sf_dir, "events")
    folds = X.group_kfold(ev, "user_id", k=5)
    return folds.groupBy("fold").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
    )


@q(
    "cms_word_freq",
    """
    WITH t AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    w AS (SELECT unnest(ts) AS w FROM t),
    c AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
    -- the exact CMS cell table: md5-bucket per (depth row, word), the
    -- same cross-engine hash the Spark side uses (sketch.cms_build)
    cells AS (
      SELECT dd.d,
             CAST('0x' || substr(md5(c.w || ':' || CAST(9101 + dd.d AS VARCHAR)),
                                 1, 15) AS UBIGINT) % 1024 AS b,
             SUM(c.c) AS cnt
      FROM c, (SELECT unnest([0, 1, 2, 3]) AS d) dd
      GROUP BY dd.d, b
    ),
    top AS (SELECT w, c FROM c ORDER BY c DESC, w LIMIT 10),
    probe AS (
      SELECT top.w, top.c AS exact_cnt, dd.d,
             CAST('0x' || substr(md5(top.w || ':' || CAST(9101 + dd.d AS VARCHAR)),
                                 1, 15) AS UBIGINT) % 1024 AS b
      FROM top, (SELECT unnest([0, 1, 2, 3]) AS d) dd
    )
    SELECT p.w, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(cells.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(cells.cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probe p JOIN cells ON cells.d = p.d AND cells.b = p.b
    GROUP BY p.w, p.exact_cnt
    """,
)
def cms_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch word frequencies (r12, operators/sketch.py
    cms_build/cms_estimate): a 4×1024 mergeable sketch built with ONE
    map-side-combined hash agg whose shuffle volume is capped at
    depth×width per map partition regardless of corpus size; estimates
    are a broadcast-probe projection (zero probe-side shuffle — the
    bloom posture). Probes = the exact top-10 words; output compares
    est vs exact (CMS guarantees est ≥ exact). The oracle replicates
    every cell: the md5 bucket hash is the repo's cross-engine idiom,
    so the driver value-checks the sketch itself, not just its
    guarantee."""
    from opentick_spark.operators import sketch as SK

    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(X.ws_tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    # r15 (one-pass): the sketch is built FROM the exact word-count
    # relation via cms_build's weight_col mode — cell-identical by
    # definition (each cell is a SUM over words of their counts, which
    # is exactly what summing per-occurrence rows computes), so the
    # corpus is tokenized ONCE and the sketch's hash-agg input is
    # |vocab| rows instead of every token occurrence. Both consumers
    # (sketch + top-10) share the one groupBy(w) exchange.
    exact = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    cms = SK.cms_build(
        exact, "w", width=1024, depth=4, seed=9101, weight_col="exact_cnt"
    )
    top = exact.orderBy(F.desc("exact_cnt"), "w").limit(10)
    est = SK.cms_estimate(top, cms, "w", width=1024, depth=4, seed=9101)
    return est.select(
        "w",
        "exact_cnt",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


@q(
    "bigram_pmi_top",
    """
    WITH t AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    uc AS (
      SELECT w, COUNT(*) AS c FROM (SELECT unnest(ts) AS w FROM t) GROUP BY w
    ),
    nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc),
    nb AS (
      SELECT CAST(SUM(len(ts) - 1) AS BIGINT) AS n_bi FROM t WHERE len(ts) > 1
    ),
    bc AS (
      SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c_ab
      FROM (
        SELECT unnest(list_zip(ts[:len(ts) - 1], ts[2:])) AS p
        FROM t WHERE len(ts) > 1
      )
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    ),
    scored AS (
      SELECT bc.w1, bc.w2, bc.c_ab,
             -- rank key: ONE exact-integer IEEE division, identical in
             -- any IEEE engine (the Spark side uses the same shape)
             CAST(bc.c_ab AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS key,
             ((CAST(bc.c_ab AS DOUBLE) * CAST(nu.n_uni AS DOUBLE))
              * CAST(nu.n_uni AS DOUBLE))
             / ((CAST(nb.n_bi AS DOUBLE) * CAST(a.c AS DOUBLE))
                * CAST(b.c AS DOUBLE)) AS ratio
      FROM bc
      JOIN uc a ON a.w = bc.w1
      JOIN uc b ON b.w = bc.w2
      CROSS JOIN nu CROSS JOIN nb
    ),
    ranked AS (
      SELECT w1, w2, c_ab, ratio,
             ROW_NUMBER() OVER (ORDER BY key DESC, w1, w2) AS rank
      FROM scored
    )
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(LN(ratio), 6) AS pmi, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 50
    """,
)
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-bigram collocations by PMI (r12,
    operators/freq.bigram_pmi_top) — the vocabulary-mining primitive
    for multi-word token candidates. Two map-side-combined hash aggs;
    the min_count floor prunes bigrams BEFORE the vocabulary joins
    (Zipf: most bigrams are singletons); global top-k is
    TakeOrderedAndProject, never a full sort. Ranked on the raw
    exact-integer division c_ab/(c_a·c_b) (IEEE-identical cross-engine,
    monotone in pmi) with (w1,w2) tie-break; the displayed pmi is
    rounded 6dp and never used for ranking."""
    from opentick_spark.operators.freq import bigram_pmi_top as PMI

    docs = load(spark, sf_dir, "documents")
    return PMI(docs, k=50, min_count=5)


@q(
    "streaming_cms_freq",
    """
    -- identical cells to cms_word_freq: the streamed sketch must be
    -- cell-for-cell equal to a batch build over the same corpus
    WITH t AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    w AS (SELECT unnest(ts) AS w FROM t),
    c AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
    cells AS (
      SELECT dd.d,
             CAST('0x' || substr(md5(c.w || ':' || CAST(9101 + dd.d AS VARCHAR)),
                                 1, 15) AS UBIGINT) % 1024 AS b,
             SUM(c.c) AS cnt
      FROM c, (SELECT unnest([0, 1, 2, 3]) AS d) dd
      GROUP BY dd.d, b
    ),
    top AS (SELECT w, c FROM c ORDER BY c DESC, w LIMIT 10),
    probe AS (
      SELECT top.w, top.c AS exact_cnt, dd.d,
             CAST('0x' || substr(md5(top.w || ':' || CAST(9101 + dd.d AS VARCHAR)),
                                 1, 15) AS UBIGINT) % 1024 AS b
      FROM top, (SELECT unnest([0, 1, 2, 3]) AS d) dd
    )
    SELECT p.w, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(cells.cnt) AS BIGINT) AS cms_est
    FROM probe p JOIN cells ON cells.d = p.d AND cells.b = p.b
    GROUP BY p.w, p.exact_cnt
    """,
)
def streaming_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance (r12,
    streaming/rollup.streaming_cms_build): documents arrive in THREE
    real micro-batches; each batch's one-row sketch partial lands at a
    batch_id-keyed path (overwrite — a crash-replay rewrites identical
    content instead of double-counting the SUM-merged state), and the
    read-time merge estimates the exact top-10 words. The oracle is the
    full batch-CMS cell replication, so the driver verifies the
    streamed sketch is cell-for-cell identical to a batch build —
    exactly-once, not just approximately right."""
    from opentick_spark.streaming.rollup import (
        streaming_cms_build,
        streaming_cms_estimate,
    )

    src_dir = tempfile.mkdtemp(prefix="otspark_cmssrc_")
    partials_dir = tempfile.mkdtemp(prefix="otspark_cmsparts_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(
        src_dir
    )

    def to_words(batch_df: DataFrame) -> DataFrame:
        return batch_df.select(
            F.explode(X.ws_tokens(F.col("text"))).alias("w")
        ).filter(F.col("w") != "")

    query = streaming_cms_build(
        spark,
        src_dir,
        "doc_id long, text string",
        partials_dir,
        tempfile.mkdtemp(prefix="otspark_cmsck_"),
        "w",
        width=1024,
        depth=4,
        seed=9101,
        transform=to_words,
    )
    query.awaitTermination()

    words = docs.select(F.explode(X.ws_tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "w")
        .limit(10)
    )
    est = streaming_cms_estimate(
        spark, partials_dir, top, "w", width=1024, depth=4, seed=9101
    )
    return est.select(
        "w", "exact_cnt", F.col("cms_est").cast("long").alias("cms_est")
    )


@q(
    "exact_length_percentiles",
    """
    WITH hist AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
    ),
    cdf AS (
      SELECT n_chars,
             SUM(cnt) OVER (ORDER BY n_chars) AS cum,
             SUM(cnt) OVER () AS total
      FROM hist
    ),
    qs AS (
      SELECT * FROM (VALUES (25, 100), (50, 100), (75, 100),
                            (90, 100), (99, 100)) AS v(num, den)
    ),
    hit AS (
      SELECT CAST(qs.num AS DOUBLE) / qs.den AS q, cdf.n_chars, cdf.cum,
             cdf.total
      FROM cdf, qs
      WHERE cdf.cum >= (qs.num * cdf.total + qs.den - 1) // qs.den
    )
    SELECT q, MIN(n_chars) AS value,
           CAST(MIN(cum) AS BIGINT) AS cum_count,
           CAST(MIN(total) AS BIGINT) AS total
    FROM hit GROUP BY q
    """,
)
def exact_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p90/p99 of document length without a global
    sort (r12, operators/selection.exact_percentiles): the corpus-sized
    work is one hash agg (the n_chars histogram); the CDF window and
    threshold probes run on the histogram. Thresholds are integer-exact
    ceil-division — no doubles near the boundary, so the oracle is
    value-exact. The length-domain histogram stays bounded at any
    corpus scale — the same reason cdf_buckets scales."""
    from opentick_spark.operators.selection import exact_percentiles

    docs = load(spark, sf_dir, "documents")
    return exact_percentiles(docs, "n_chars")


@q(
    "user_triangle_centrality",
    """
    WITH occ AS (
      SELECT DISTINCT epoch_us(ts) // 60000000 AS mb, event_type AS et,
             user_id AS u
      FROM events
    ),
    canon AS (
      SELECT DISTINCT a.u AS u, b.u AS v
      FROM occ a JOIN occ b ON a.mb = b.mb AND a.et = b.et AND a.u < b.u
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM canon e1
      JOIN canon e2 ON e2.u = e1.v
      JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pv AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    nodes AS (SELECT DISTINCT u AS node FROM (
      SELECT u FROM canon UNION ALL SELECT v FROM canon
    )),
    ranked AS (
      SELECT n.node, COALESCE(pv.n_tri, 0) AS n_tri,
             ROW_NUMBER() OVER (ORDER BY COALESCE(pv.n_tri, 0) DESC, n.node)
               AS rank
      FROM nodes n LEFT JOIN pv ON pv.node = n.node
    )
    SELECT CAST(node AS BIGINT) AS user_id, CAST(n_tri AS BIGINT) AS n_tri,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def user_triangle_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by triangle participation in the co-activity graph
    (r12, operators/graph.triangle_count): edge (u,v) iff both users
    act in the same (minute, event_type) cell — minute-grain keeps the
    co-activity graph sparse (hour-grain is near-complete at sf0.1:
    789k edges/1500 nodes, 197M triangles — measured and rejected as a
    degenerate fixture). Exact counting via
    degree-ordered orientation — every oriented out-degree is capped at
    O(sqrt(m)), so wedge work is O(m^1.5) no matter how skewed the hub
    degrees (the GraphX orientation). Edge construction is grouped
    per-cell pair expansion; at 100 TB the cells are bounded by
    (minute × type) activity and the pair guard is the same
    group-size-capped posture as the clip-containment grouped path. The
    oracle triple-joins the canonical edge list directly."""
    from pyspark.sql import Window

    from opentick_spark.operators.graph import triangle_count

    ev = load(spark, sf_dir, "events")
    occ = ev.select(
        F.expr("ts div 60000000000").alias("mb"),
        F.col("event_type").alias("et"),
        F.col("user_id").alias("u"),
    ).distinct()
    pairs = (
        occ.alias("a")
        .join(
            occ.alias("b"),
            (F.col("a.mb") == F.col("b.mb"))
            & (F.col("a.et") == F.col("b.et"))
            & (F.col("a.u") < F.col("b.u")),
        )
        .select(F.col("a.u").alias("src"), F.col("b.u").alias("dst"))
        .distinct()
    )
    pv = triangle_count(pairs)
    w = Window.orderBy(F.desc("n_tri"), "node")
    return (
        pv.orderBy(F.desc("n_tri"), "node")
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            F.col("node").cast("long").alias("user_id"),
            F.col("n_tri").cast("long").alias("n_tri"),
            "rank",
        )
    )


@q(
    "bitext_margin_mine",
    """
    WITH s AS (
      SELECT e.vec_id AS sid, e.embedding AS sv
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'de'
    ),
    t AS (
      SELECT e.vec_id AS tid, e.embedding AS tv
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en'
    ),
    sc AS (
      SELECT sid, tid,
             list_cosine_similarity(sv::DOUBLE[], tv::DOUBLE[]) AS cos
      FROM s, t
    ),
    f AS (
      SELECT sid, AVG(cos) AS mu_s FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sid
                                     ORDER BY cos DESC, tid) AS r FROM sc
      ) WHERE r <= 4 GROUP BY sid
    ),
    b AS (
      SELECT tid, AVG(cos) AS mu_t FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY tid
                                     ORDER BY cos DESC, sid) AS r FROM sc
      ) WHERE r <= 4 GROUP BY tid
    ),
    m AS (
      SELECT sc.sid, sc.tid, sc.cos,
             sc.cos / ((f.mu_s + b.mu_t) / 2) AS margin
      FROM sc JOIN f USING (sid) JOIN b USING (tid)
      WHERE sc.cos > 0   -- the operator's positive-candidate guard
        AND (f.mu_s + b.mu_t) > 0  -- denominator guard (r12 ADVICE)
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY sid
                                   ORDER BY margin DESC, tid) AS bb
      FROM m
    )
    SELECT sid AS src_id, tid AS tgt_id, ROUND(cos, 6) AS cos,
           ROUND(margin, 6) AS margin
    FROM best WHERE bb = 1 AND margin >= 1.1
    """,
)
def bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining de→en (r12,
    operators/similarity.margin_bitext_pairs — the LASER recipe,
    Artetxe & Schwenk ACL'19): ratio margin normalizes each candidate
    cosine by both endpoints' k-NN neighborhood density, killing the
    hubness failure of absolute-cosine mining; 'max' strategy keeps
    each source's best-margin target at margin ≥ 1.1. The pairwise
    stage is the broadcast brute-force posture; at corpus scale the
    cross swaps for the IVF probe (the margin only needs each
    candidate's top-k neighborhood). Oracle replays the identical
    windowed pipeline on DuckDB's cosine."""
    from opentick_spark.operators.similarity import margin_bitext_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = load(spark, sf_dir, "embeddings")
    withlang = embs.join(
        docs.withColumnRenamed("doc_id", "vec_id"), "vec_id"
    )
    src = withlang.filter(F.col("lang") == "de")
    tgt = withlang.filter(F.col("lang") == "en")
    out = margin_bitext_pairs(src, tgt, k=4, threshold=1.1)
    return out.select(
        "src_id",
        "tgt_id",
        F.round("cos", 6).alias("cos"),
        F.round("margin", 6).alias("margin"),
    )


@q(
    "bitext_margin_mine_ivf",
    """
    WITH s AS (
      SELECT e.vec_id AS sid, e.embedding AS sv
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'de'
    ),
    t AS (
      SELECT e.vec_id AS tid, e.embedding AS tv
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en'
    ),
    sc AS (
      SELECT sid, tid,
             list_cosine_similarity(sv::DOUBLE[], tv::DOUBLE[]) AS cos
      FROM s, t
    ),
    f AS (
      SELECT sid, AVG(cos) AS mu_s FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sid
                                     ORDER BY cos DESC, tid) AS r FROM sc
      ) WHERE r <= 4 GROUP BY sid
    ),
    b AS (
      SELECT tid, AVG(cos) AS mu_t FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY tid
                                     ORDER BY cos DESC, sid) AS r FROM sc
      ) WHERE r <= 4 GROUP BY tid
    ),
    m AS (
      SELECT sc.sid, sc.tid, sc.cos,
             sc.cos / ((f.mu_s + b.mu_t) / 2) AS margin
      FROM sc JOIN f USING (sid) JOIN b USING (tid)
      WHERE sc.cos > 0
        AND (f.mu_s + b.mu_t) > 0
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY sid
                                   ORDER BY margin DESC, tid) AS bb
      FROM m
    )
    SELECT sid AS src_id, tid AS tgt_id, ROUND(cos, 6) AS cos,
           ROUND(margin, 6) AS margin
    FROM best WHERE bb = 1 AND margin >= 1.1
    """,
)
def bitext_margin_mine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining through the IVF candidate generator (r13, VERDICT
    r12 item 1 — operators/similarity.margin_bitext_pairs
    strategy='ivf'): candidates and both μ_k neighborhoods come from
    probed centroid lists (hash joins on centroid_id; no
    BroadcastNestedLoopJoin anywhere — plan-asserted in
    tests/test_operators.py), not the |S|×|T| cross. Probing EVERY
    list (nprobe == ncentroids) makes the result provably identical to
    the exact path, so this driver row value-checks the IVF plumbing
    against the SAME brute-force DuckDB oracle; partial-probe recall
    is pinned by the planted-geometry test and the 10× drill
    (tests/scale_drill_bitext.py: corpus-axis exponent 0.58, both-axes
    0.80, exact 30.7s vs IVF 6.6s at equal size)."""
    from opentick_spark.operators.similarity import margin_bitext_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = load(spark, sf_dir, "embeddings")
    withlang = embs.join(
        docs.withColumnRenamed("doc_id", "vec_id"), "vec_id"
    )
    src = withlang.filter(F.col("lang") == "de")
    tgt = withlang.filter(F.col("lang") == "en")
    out = margin_bitext_pairs(
        src, tgt, k=4, threshold=1.1, strategy="ivf",
        ncentroids=8, nprobe=8,
    )
    return out.select(
        "src_id",
        "tgt_id",
        F.round("cos", 6).alias("cos"),
        F.round("margin", 6).alias("margin"),
    )


@q(
    "model_quality_filter",
    f"""
    WITH tw AS (
      SELECT doc_id,
             (({_H8.format(x="t")} % 4096) % 97) / 64.0 - 0.75 AS w
      FROM (SELECT doc_id, unnest({_WS_TOKS}) AS t FROM documents)
      WHERE t != ''
    ),
    m AS (
      SELECT doc_id, SUM(w) / COUNT(*) AS margin FROM tw GROUP BY doc_id
    ),
    d AS (
      SELECT documents.source, COALESCE(m.margin, 0.0) AS margin
      FROM documents LEFT JOIN m USING (doc_id)
    )
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN margin >= 0.125 THEN 1 ELSE 0 END)::BIGINT
             AS n_kept,
           ROUND(AVG(margin), 6) AS avg_margin,
           ROUND(MIN(margin), 6) AS min_margin,
           ROUND(MAX(margin), 6) AS max_margin
    FROM d GROUP BY source
    """,
)
def model_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (r13, VERDICT r12 item 6 —
    operators/quality_model): the FineWeb-Edu-style corpus-wide scoring
    pass as a ZERO-SHUFFLE projection — the dim-sized classifier weight
    vector rides the plan as an array literal and each document folds
    its token-bucket weights in array order (plan-asserted: no Exchange
    on the scoring pass). The driver row uses the deterministic
    dyadic-rational weight fixture (w_b = (b mod 97)/64 − 0.75 —
    per-document weight sums are EXACT doubles, order-independent, so
    the DuckDB replay hashes identically; training itself is covered by
    tests/test_quality_model.py against a numpy reference) and keeps
    documents at margin ≥ 0.125 — margin space, where the threshold is
    an exact dyadic rational (σ is monotone; this IS a sigmoid-score
    threshold). Output: per-source kept counts + margin stats."""
    from opentick_spark.operators.quality_model import (
        score_quality,
        synthetic_quality_weights,
    )

    w, b = synthetic_quality_weights(4096)
    docs = load(spark, sf_dir, "documents")
    scored = score_quality(docs, w, b, dim=4096)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("q_margin") >= 0.125, 1).otherwise(0)
        ).cast("long").alias("n_kept"),
        F.round(F.avg("q_margin"), 6).alias("avg_margin"),
        F.round(F.min("q_margin"), 6).alias("min_margin"),
        F.round(F.max("q_margin"), 6).alias("max_margin"),
    )


@q(
    "source_length_percentiles",
    """
    WITH hist AS (
      SELECT source, n_chars, COUNT(*) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    cdf AS (
      SELECT source, n_chars,
             SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS total
      FROM hist
    ),
    qs AS (
      SELECT * FROM (VALUES (25, 100), (50, 100), (75, 100),
                            (90, 100), (99, 100)) AS v(num, den)
    ),
    hit AS (
      SELECT cdf.source, CAST(qs.num AS DOUBLE) / qs.den AS q,
             cdf.n_chars, cdf.cum, cdf.total
      FROM cdf, qs
      WHERE cdf.cum >= (qs.num * cdf.total + qs.den - 1) // qs.den
    )
    SELECT source, q, MIN(n_chars) AS value,
           CAST(MIN(cum) AS BIGINT) AS cum_count,
           CAST(MIN(total) AS BIGINT) AS total
    FROM hit GROUP BY source, q
    """,
)
def source_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact length percentiles (r12,
    operators/selection.exact_percentiles_by): the grouped twin of
    exact_length_percentiles — one corpus-sized hash agg, per-group
    histogram CDF windows, integer-exact thresholds. The per-source
    quality-report shape at 100 TB: after the first agg everything is
    |sources| × |length domain| rows."""
    from opentick_spark.operators.selection import exact_percentiles_by

    docs = load(spark, sf_dir, "documents")
    return exact_percentiles_by(docs, "n_chars", "source")


@q(
    "line_dedup_stats",
    """
    WITH d AS (
      SELECT doc_id, replace(text, ' a ', chr(10)) AS t FROM documents
    ),
    l AS (
      SELECT doc_id,
             generate_subscripts(string_split(t, chr(10)), 1) - 1 AS pos,
             unnest(string_split(t, chr(10))) AS line
      FROM d
    ),
    c AS (
      SELECT line, COUNT(DISTINCT doc_id) AS nd
      FROM l WHERE trim(line) <> '' GROUP BY line
    ),
    m AS (
      SELECT l.doc_id, l.pos, l.line,
             CASE WHEN trim(l.line) <> '' AND c.nd >= 2 THEN 1 ELSE 0 END
               AS rm
      FROM l LEFT JOIN c ON l.line = c.line
    )
    SELECT doc_id AS id,
           COALESCE(string_agg(CASE WHEN rm = 0 THEN line END, chr(10)
                               ORDER BY pos), '') AS clean_text,
           COUNT(*)::BIGINT AS n_lines,
           SUM(rm)::BIGINT AS removed_lines,
           ROUND(SUM(rm)::DOUBLE / GREATEST(COUNT(*), 1), 6)
             AS removed_frac
    FROM m GROUP BY doc_id
    """,
)
def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate dedup (r15, VERDICT r14 item 3:
    operators/dedup.line_dedup — the RefinedWeb/C4 curation staple):
    drop every line duplicated across >= 2 distinct documents, rebuild
    each document from its kept lines in order, report removal stats.
    The synthetic corpus is single-line, so the entry derives a
    deterministic multi-line corpus first (replace ' a ' -> newline,
    identical left-to-right non-overlapping scan in both engines); the
    operator itself is one Generate -> line-keyed distinct-doc count
    over ONE window exchange (no join, no fork) -> one groupBy(id)
    reassembly."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" a "), F.lit("\n"))
    )
    return D.line_dedup(docs, min_docs=2)
