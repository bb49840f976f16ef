"""Behavior tests for the data-selection operators (operators/selection.py
+ similarity.knn_label_vote): semantics and edge cases the oracle check
can't probe (empty text, zero weights, proportionality, vote ties)."""

import math

import pytest
from pyspark.sql import functions as F

from opentick_spark.operators import selection as SEL
from opentick_spark.operators import similarity as S


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_tfidf_corpus_wide_term_scores_zero(spark):
    # 'the' appears in every doc → idf = ln(3/3) = 0 → never ranks above
    # doc-specific terms
    df = docs_df(
        spark,
        [
            (1, "the cat", "en", "a", 7),
            (2, "the dog", "en", "a", 7),
            (3, "the bird", "en", "a", 8),
        ],
    )
    out = SEL.tfidf_top_terms(df, k=1)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["term"] == "cat" and rows[2]["term"] == "dog"
    assert all(r["tfidf"] == pytest.approx(math.log(3.0)) for r in rows.values())


def test_tfidf_empty_text_emits_nothing(spark):
    df = docs_df(spark, [(1, "", "en", "a", 0), (2, "word", "en", "a", 4)])
    out = SEL.tfidf_top_terms(df, k=3)
    assert [r["id"] for r in out.collect()] == [2]


def test_dsir_target_docs_score_higher(spark):
    # target rows share a disjoint vocabulary → their tokens' buckets have
    # high target/raw ratios, so target docs must outscore non-target ones
    rows = [(i, "alpha beta gamma", "en", "a", 16) for i in range(10)] + [
        (100 + i, "uno dos tres", "es", "a", 12) for i in range(10)
    ]
    out = SEL.dsir_importance(
        docs_df(spark, rows), F.col("lang") == "en", buckets=64
    ).collect()
    tgt = [r["dsir_score"] for r in out if r["is_target"]]
    raw = [r["dsir_score"] for r in out if not r["is_target"]]
    assert min(tgt) > max(raw)


def test_token_entropy_uniform_beats_skewed(spark):
    # 4 equiprobable tokens → ln(4); one dominant token → much lower
    df = docs_df(
        spark,
        [
            (1, "a b c d", "en", "uniform", 7),
            (2, "x x x x x x x y", "en", "skewed", 15),
        ],
    )
    out = {r["group"]: r for r in SEL.token_entropy(df, group_col="source").collect()}
    assert out["uniform"]["entropy"] == pytest.approx(math.log(4.0))
    assert out["skewed"]["entropy"] < 0.5
    assert out["uniform"]["vocab"] == 4 and out["skewed"]["vocab"] == 2


def test_weighted_sample_deterministic_and_weight_biased(spark):
    rows = [(i, "t", "en", "a", 1000 if i < 50 else 1) for i in range(1000)]
    df = docs_df(spark, rows)
    a = [r["id"] for r in SEL.weighted_sample(df, "n_chars", k=40).collect()]
    b = [r["id"] for r in SEL.weighted_sample(df, "n_chars", k=40).collect()]
    assert a == b  # reproducible, including order
    # 50 heavy rows (weight 1000) vs 950 light (weight 1): the sample
    # must be dominated by heavy rows
    heavy = sum(1 for i in a if i < 50)
    assert heavy >= 30


def test_weighted_sample_skips_nonpositive_weights(spark):
    df = docs_df(spark, [(1, "t", "en", "a", 0), (2, "t", "en", "a", 5)])
    out = SEL.weighted_sample(df, "n_chars", k=10).collect()
    assert [r["id"] for r in out] == [2]


def test_knn_vote_majority_and_tie_break(spark):
    # query 0 at e0; neighbors: two label-1 vecs near e0, one label-2 vec
    # exactly at e0 — with k=3 label 1 wins on votes despite label 2's
    # higher best cosine
    def vec(x, y):
        return [float(x), float(y)]

    emb = spark.createDataFrame(
        [
            (0, vec(1, 0), 9),
            (1, vec(1, 0.1), 1),
            (2, vec(1, -0.1), 1),
            (3, vec(1, 0), 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = S.knn_label_vote(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert len(out) == 1
    assert out[0]["predicted_label"] == 1
    assert out[0]["votes"] == 2


def test_knn_vote_equal_votes_higher_cos_wins(spark):
    def vec(x, y):
        return [float(x), float(y)]

    emb = spark.createDataFrame(
        [
            (0, vec(1, 0), 9),
            (1, vec(1, 0.05), 1),  # closer → label 1's best_cos higher
            (2, vec(1, 0.5), 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = S.knn_label_vote(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    assert out[0]["predicted_label"] == 1 and out[0]["votes"] == 1


def test_ann_recall_report_closed_form(spark):
    """r10 (retiring the r7 floor booleans): on the duplicate-ray plant
    ALL FOUR approximate paths are forced to exact set-equality with
    the brute-force baseline for ANY lsh seed / trained codebook, so
    recall@10 = MRR@10 = 1.0 exactly — not a floor, the value."""
    from opentick_spark.workload import ALL_QUERIES

    rows = {
        r["method"]: r
        for r in ALL_QUERIES["ann_recall_report"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"int8", "ivf_p4", "lsh_h2", "pq_rerank"}
    assert all(r["recall_at_10"] == 1.0 for r in rows.values()), rows
    assert all(r["mrr_at_10"] == 1.0 for r in rows.values()), rows
    assert all(r["n_queries"] == 8 for r in rows.values())


def test_edit_distance_pairs_fixture(spark):
    from opentick_spark.operators.dedup import edit_distance_pairs

    df = docs_df(
        spark,
        [
            # same 12-char normalized prefix, 1 edit apart
            (1, "the quick brown fox jumps", "en", "a", 25),
            (2, "the quick brown fox jumped", "en", "a", 26),
            # same prefix but far beyond max_dist
            (3, "the quick brown dog sat on something entirely else ok", "en", "a", 54),
            # different prefix: never a candidate even at distance 1
            (4, "a quick brown fox jumps", "en", "a", 23),
        ],
    )
    out = edit_distance_pairs(df, max_dist=3, prefix_len=12).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(1, 2, 2)]


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from opentick_spark.operators.graph import pagerank

    # directed 4-node graph with a dangling node (3)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)], "src long, dst long"
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges, damping=0.85, iterations=20, undirected=False
        ).collect()
    }
    # reference: textbook power iteration (same init, same teleport, no
    # renormalization, dangling mass dropped)
    n = 4
    adj = {0: [1, 2], 1: [2, 3], 2: [0]}
    pr = np.full(n, 1.0 / n)
    for _ in range(20):
        new = np.full(n, 0.15 / n)
        for s, outs in adj.items():
            for d in outs:
                new[d] += 0.85 * pr[s] / len(outs)
        pr = new
    for i in range(n):
        assert abs(got[i] - pr[i]) < 1e-12, (i, got[i], pr[i])


def test_pagerank_undirected_symmetry(spark):
    from opentick_spark.operators.graph import pagerank

    # path graph 0-1-2: ends must tie, middle must dominate
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["pr"] for r in pagerank(edges, iterations=30).collect()
    }
    assert abs(got[0] - got[2]) < 1e-12
    assert got[1] > got[0]


def test_compression_ratio_golden_and_ordering(spark):
    import zlib

    from opentick_spark.operators.text import compression_ratio
    from opentick_spark.workload import ALL_QUERIES
    from opentick_spark.workload.llm import _planted_ztexts

    # real-corpus golden: the operator on the documents table must match
    # Python zlib byte-for-byte (the registry entry moved to the planted
    # oracle design in r7; the real-text evidence lives here)
    docs_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    real = {
        r["doc_id"]: r["z"]
        for r in docs_df.select(
            "doc_id", F.round(compression_ratio("text"), 6).alias("z")
        ).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    assert set(real) == set(docs)
    for i, t in list(docs.items())[:20]:
        raw = t.encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6) if raw else 0.0
        assert real[i] == want, i
    # planted registry path: every doc's ratio equals Python zlib on its
    # planted pattern (the same arithmetic the DuckDB oracle embeds)
    out = {
        r["doc_id"]: r["zratio"]
        for r in ALL_QUERIES["text_compression_ratio"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    pats = _planted_ztexts()
    assert set(out) == set(docs)
    for i in list(out)[:40]:
        raw = pats[i % 32].encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert out[i] == want, i
    # repetitive text compresses harder than varied text
    rep = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{j}x{j*7%13}" for j in range(200)))],
        "doc_id long, text string",
    )
    from opentick_spark.operators.text import compression_ratio

    r = {x["doc_id"]: x["z"] for x in rep.select("doc_id", compression_ratio().alias("z")).collect()}
    assert r[1] < r[2]


def test_pagerank_driver_path_matches_distributed(spark):
    from opentick_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3), (3, 4), (4, 0)],
        "src long, dst long",
    )
    dist = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=15).collect()
    }
    drv = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges, iterations=15, driver_if_edges_below=1000
        ).collect()
    }
    assert set(dist) == set(drv)
    for k in dist:
        assert abs(dist[k] - drv[k]) < 1e-12, k


def test_ivf_index_append_finds_new_vectors(spark, tmp_path):
    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf")
    build_ivf_index(old, path, ncentroids=8)
    appended = ivf_index_append(spark, new, path)
    assert appended == new.count()
    # query WITH a new vector: exhaustive probe must return it as its own
    # nearest neighbor's source (new ids now searchable)
    q = new.limit(3)
    hits = ivf_topk_indexed(spark, path, q, k=3, nprobe=8)
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {r["vec_id"] for r in q.collect()}
    # at least one other appended vector is reachable through the index
    new_ids = {r["vec_id"] for r in new.collect()}
    assert any(n in new_ids for ns in by_q.values() for n in ns)


def test_ivf_index_append_marker_exactly_once(spark, tmp_path, monkeypatch):
    """ivf_index_append(marker_file=...) crash matrix (r11 advice fix —
    the stream_ivf_append append→marker window): (a) a completed publish
    is replay-proof, (b) a crash AFTER the staged links but BEFORE the
    marker rename replays to the exact same file set — zero duplicate
    vectors — and (c) staging is GC'd once the marker lands."""
    import glob
    import os

    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    n_new = new.count()
    path = str(tmp_path / "ivf")
    build_ivf_index(old, path, ncentroids=8)
    marker = str(tmp_path / "markers" / "batch0")

    def list_rows():
        return spark.read.parquet(f"{path}/lists").count()

    base_rows = list_rows()

    # ---- (b) crash between link step and marker publish: fail the
    # os.replace that targets the marker file, leaving staged+linked
    # files with no marker ----
    real_replace = os.replace

    def crashing_replace(src, dst, *a, **k):
        if str(dst) == marker:
            raise OSError("simulated crash before marker publish")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", crashing_replace)
    try:
        ivf_index_append(spark, new, path, marker_file=marker)
        raise AssertionError("crash injection did not fire")
    except OSError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)
    assert not os.path.exists(marker)
    # links landed (the crash was after the link step) but replaying the
    # SAME delivery must not duplicate them
    assert list_rows() == base_rows + n_new
    got = ivf_index_append(spark, new, path, marker_file=marker)
    assert got == n_new  # idempotent re-publish reports the batch size
    assert os.path.exists(marker)
    assert list_rows() == base_rows + n_new  # no duplicates
    # every vector id appears exactly once across the lists
    dup = (
        spark.read.parquet(f"{path}/lists")
        .groupBy("neighbor_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # ---- (c) staging GC'd after the marker landed ----
    assert glob.glob(os.path.join(path, "_staged", "*")) == []
    # ---- (a) full replay with the published marker: no job, no rows ----
    assert ivf_index_append(spark, new, path, marker_file=marker) == 0
    assert list_rows() == base_rows + n_new


def test_streaming_ivf_ingest_appends_batches(spark, tmp_path):
    """Continuous ANN-index maintenance: an embedding stream lands in
    the persisted IVF index per micro-batch (foreachBatch →
    ivf_index_append); after the stream drains, every streamed vector is
    searchable."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 450)
    new = emb.filter(F.col("vec_id") >= 450)
    path = str(tmp_path / "ivf")
    build_ivf_index(old, path, ncentroids=8)

    src = str(tmp_path / "stream_src")
    new.repartition(2).write.parquet(src)
    appended = []

    def sink(batch_df, batch_id):
        appended.append(ivf_index_append(spark, batch_df, path))

    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(appended) >= 2 and sum(appended) == new.count()
    queries = new.limit(2)
    hits = ivf_topk_indexed(spark, path, queries, k=2, nprobe=8)
    assert {r["query_id"] for r in hits.collect()} == {
        r["vec_id"] for r in queries.collect()
    }


def test_random_projection_golden_and_zero_shuffle(spark):
    """JL projection matches a straight-line python replay of the same
    md5-sign matrix, and the plan is a pure narrow map (no Exchange)."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import random_projection

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(5)
    out = random_projection(emb, out_dim=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    got = {r["vec_id"]: list(r["proj"]) for r in out.collect()}
    scale = 1.0 / math.sqrt(16)
    rows = emb.collect()
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        for j in range(16):
            want = sum(
                v
                * (
                    scale
                    if int(
                        hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16
                    )
                    % 2
                    == 0
                    else -scale
                )
                for i, v in enumerate(vec)
            )
            assert got[r["vec_id"]][j] == pytest.approx(want, abs=1e-9)


def test_random_projection_null_and_width_handling(spark):
    """r5 ADVICE regression: a NULL embedding in the first row used to
    crash width inference (len(None)); NULLs now project to NULL, an
    explicit in_dim skips the sampling job, and a wrong-width vector
    fails with an explicit dimension message, not a numpy shape error."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import random_projection

    emb = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0, 2.0]), (3, None), (4, [0.5, -1.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["proj"]
        for r in random_projection(emb, out_dim=4).collect()
    }
    assert got[1] is None and got[3] is None
    assert len(got[2]) == 4 and len(got[4]) == 4
    # explicit in_dim produces identical output to inferred width
    got2 = {
        r["vec_id"]: r["proj"]
        for r in random_projection(emb, out_dim=4, in_dim=3).collect()
    }
    assert got == got2
    # all-NULL column: empty result with the right schema, no crash
    nulls = emb.select("vec_id", F.lit(None).cast("array<double>").alias("embedding"))
    assert random_projection(nulls, out_dim=4).count() == 0
    # ragged width fails loudly with the operator's own message
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="expected 3-dim"):
        random_projection(ragged, out_dim=4).collect()


def test_random_projection_preserves_relative_distances(spark):
    """Loose JL sanity: across sampled pairs, projected cosine tracks the
    original ordering direction (positive rank correlation)."""
    import numpy as np

    from pyspark.sql import functions as F

    from opentick_spark.operators.similarity import random_projection

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(20)
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_projection(emb, out_dim=16).collect()
    }
    ids = sorted(orig)
    cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    o, p = [], []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        o.append(cos(orig[a], orig[b]))
        p.append(cos(proj[a], proj[b]))
    import numpy as _np

    ro = _np.argsort(_np.argsort(o))
    rp = _np.argsort(_np.argsort(p))
    n = len(o)
    corr = _np.corrcoef(ro, rp)[0, 1]
    assert n >= 8 and corr > 0.2


def test_ann_recall_planted_values_exact(spark):
    """r8 (VERDICT r7 item 5): the planted 16-dim geometry forces every
    method's recall/MRR to closed-form values — IVF@nprobe=1 retrieves
    exactly the 7 low-g mains of the probed list (recall 0.7), one more
    probe reaches the twin list (recall 1.0), int8's 1/127 grid cannot
    reorder the planted gaps (recall 1.0), MRR is 1.0 everywhere."""
    from opentick_spark.workload import ALL_QUERIES

    rows = {
        r["method"]: r
        for r in ALL_QUERIES["ann_recall_planted"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"exact", "int8", "ivf_p1", "ivf_p2"}
    assert all(r["n_queries"] == 8 for r in rows.values())
    assert all(r["mrr_at_10"] == 1.0 for r in rows.values())
    assert rows["exact"]["recall_at_10"] == 1.0
    assert rows["int8"]["recall_at_10"] == 1.0
    assert rows["ivf_p1"]["recall_at_10"] == 0.7
    assert rows["ivf_p2"]["recall_at_10"] == 1.0


def test_semantic_contamination_semantics(spark):
    """Nearest-eval argmax with (cos desc, eval_id asc) tie-break;
    below-threshold train vectors are absent."""
    from opentick_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # eval
            (20, [1.0, 0.0]),  # eval, duplicate of 0 -> tie on cos
            (40, [0.0, 1.0]),  # eval
            (1, [1.0, 0.0]),   # train: ties evals 0 and 20 -> picks 0
            (2, [0.6, 0.8]),   # train: nearest is 40 (0.8) over 0 (0.6)
            (3, [0.0, -1.0]),  # train: max cos 0.0 -> excluded
        ],
        "vec_id long, embedding array<float>",
    )
    ev = emb.filter("vec_id % 20 = 0")
    tr = emb.filter("vec_id % 20 != 0")
    got = {
        r["train_id"]: (r["eval_id"], round(r["cos"], 6))
        for r in S.semantic_contamination(tr, ev, threshold=0.5).collect()
    }
    assert got == {1: (0, 1.0), 2: (40, 0.8)}


def test_semantic_contamination_plan_partial_agg_no_pair_shuffle(spark):
    """The per-train argmax must partial-aggregate map-side: the plan
    shows a partial_max BEFORE the train_id exchange (the shuffle
    carries one row per train vector per partition, never the
    train x eval pair fan-out a window rank would), and the eval side
    is broadcast."""
    from opentick_spark.operators import similarity as S

    emb = spark.range(100).selectExpr(
        "id AS vec_id",
        "array(CAST(id AS FLOAT), CAST(id % 7 AS FLOAT)) AS embedding",
    )
    ev = emb.filter("vec_id % 20 = 0")
    tr = emb.filter("vec_id % 20 != 0")
    plan = (
        S.semantic_contamination(tr, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # a partial_max below any train_id exchange = map-side combine (on
    # some sources Catalyst elides the exchange entirely); a window-
    # rank implementation would shuffle every train x eval pair and
    # print a Window node instead
    assert "partial_max" in plan, plan[:2000]
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "Window" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_dedup_aware_split_no_leakage(spark):
    """r8: exact duplicates inherit the group representative's split —
    a duplicate pair can never straddle train/test — and unique docs
    keep their own md5-bucket assignment."""
    from opentick_spark.operators import text as X

    rows = [
        (1, "the same exact document"),
        (500, "The same EXACT document!!"),   # normalizes identically
        (900, "the same exact document"),
        (2, "a unique document"),
        (3, "another unique document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.dedup_aware_split(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    # the duplicate trio shares rep=1 and a single split
    assert {by_id[i]["group_rep"] for i in (1, 500, 900)} == {1}
    assert len({by_id[i]["split"] for i in (1, 500, 900)}) == 1
    # unique docs are their own rep, split = plain hash_split of own id
    solo = X.hash_split(
        df.filter("doc_id in (2, 3)"), id_col="doc_id"
    ).collect()
    expect = {r["doc_id"]: r["split"] for r in solo}
    assert by_id[2]["split"] == expect[2]
    assert by_id[3]["split"] == expect[3]
    assert by_id[2]["group_rep"] == 2 and by_id[3]["group_rep"] == 3


def test_deterministic_shards_stable_and_balanced(spark):
    """Shard deal is identical across evaluations (reproducibility is
    the operator's whole contract), re-dealt by salt, and statistically
    balanced (md5 uniformity: no shard further than 4x from fair share
    on 2000 ids x 16 shards)."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.selection import deterministic_shards

    ids = spark.range(2000).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["shard"] for r in deterministic_shards(ids, 16).collect()}
    b = {r["doc_id"]: r["shard"] for r in deterministic_shards(ids, 16).collect()}
    assert a == b
    assert all(0 <= s < 16 for s in a.values())
    c = {
        r["doc_id"]: r["shard"]
        for r in deterministic_shards(ids, 16, salt="epoch1").collect()
    }
    assert c != a  # a new epoch re-deals
    from collections import Counter

    counts = Counter(a.values())
    assert len(counts) == 16
    assert max(counts.values()) < 4 * (2000 / 16)


def test_cdf_buckets_exact_deciles_no_global_sort(spark):
    """cdf_buckets == NTILE semantics for all-distinct values, keeps
    same-value rows in one bucket, and the corpus-sized side of the
    plan has no global Sort/Exchange (the window runs on the
    histogram)."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.selection import cdf_buckets

    # all-distinct values 1..100, 10 buckets => exactly 10 per bucket
    df = spark.range(1, 101).selectExpr("id AS v")
    res = cdf_buckets(df, "v", 10)
    # plan shape IS the contract (r13: the CDF goes through the
    # two-level range-bucketed prefix sum): the bucket machinery is
    # present, the windows run above the histogram aggregate, and the
    # only unpartitioned window orders on the bounded __tl_bkt relation
    # — an NTILE-over-raw regression would window the corpus rows
    import re as _re

    opt = res._jdf.queryExecution().optimizedPlan().toString()
    assert "count(1) AS __cnt" in opt  # the histogram aggregate
    assert "__tl_bkt" in opt
    assert "Window [" in opt
    for spec in _re.findall(
        r"windowspecdefinition\(([^)]*?) (?:ASC|DESC)", opt
    ):
        if "," not in spec:  # unpartitioned window
            assert "__tl_bkt" in spec.split(",")[0], spec
    out = {r["bucket"]: r for r in res.collect()}
    assert sorted(out) == list(range(1, 11))
    for b, r in out.items():
        assert r["n_docs"] == 10
        assert r["min_v"] == (b - 1) * 10 + 1 and r["max_v"] == b * 10
    # heavy tie mass: one value holding >10% of rows stays in ONE bucket
    tied = spark.range(1000).selectExpr(
        "CASE WHEN id < 500 THEN 7 ELSE id END AS v"
    )
    res = cdf_buckets(tied, "v", 10).collect()
    n_per_bucket = {r["bucket"]: r["n_docs"] for r in res}
    assert sum(n_per_bucket.values()) == 1000
    # the 500-row tie of value 7 is entirely inside its single bucket
    seven = [r for r in res if r["min_v"] <= 7 <= r["max_v"]]
    assert len(seven) == 1 and seven[0]["n_docs"] >= 500


def test_deterministic_shards_is_zero_shuffle_narrow_map(spark):
    """The shard deal itself must stay a pure narrow map — zero
    Exchange in the physical plan (the 100 TB posture: every writer
    computes the assignment independently; VERDICT r11 item 7's drill
    records the flat 10x exponent, this pins the plan shape)."""
    from opentick_spark.operators.selection import deterministic_shards

    ids = spark.range(1000).selectExpr("id AS doc_id")
    plan = (
        deterministic_shards(ids, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()  # all JVM-side expressions


def test_exact_percentiles_ties_and_plan(spark):
    """exact_percentiles (r12): type-1 quantile semantics under heavy
    ties, integer-exact thresholds at tiny n, and the plan contract —
    the CDF windows run above the histogram aggregate, never on the
    corpus-sized input."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.selection import exact_percentiles

    # heavy tie: 90 rows of value 5, 10 of value 100 → p25..p90 all 5
    df = spark.range(100).selectExpr("CASE WHEN id < 90 THEN 5 ELSE 100 END AS v")
    out = {r["q"]: r["value"] for r in exact_percentiles(df, "v").collect()}
    assert out == {0.25: 5, 0.5: 5, 0.75: 5, 0.9: 5, 0.99: 100}

    # n=3: ceil thresholds — p50 of [10,20,30] is the 2nd value
    df3 = spark.createDataFrame([(10,), (20,), (30,)], ["v"])
    out3 = {r["q"]: r["value"] for r in exact_percentiles(df3, "v").collect()}
    assert out3[0.5] == 20 and out3[0.99] == 30 and out3[0.25] == 10

    res = exact_percentiles(df, "v")
    opt = res._jdf.queryExecution().optimizedPlan().toString()
    # r13 plan contract: the histogram agg feeds the two-level CDF; no
    # unpartitioned window orders on anything but the bounded __tl_bkt
    import re as _re

    assert "count(1) AS __cnt" in opt and "__tl_bkt" in opt
    for spec in _re.findall(r"windowspecdefinition\(([^)]*?) (?:ASC|DESC)", opt):
        if "," not in spec:
            assert "__tl_bkt" in spec.split(",")[0], spec


def test_percentiles_wide_domain_no_single_task_window(spark):
    """VERDICT r12 item 3: on a WIDE numeric value domain (every value
    distinct — the histogram IS the corpus) the CDF must use the
    two-level range-bucketed prefix sum, not a single-task global
    window. Plan contract: no unpartitioned window ordering on the
    value column (the only permitted unpartitioned window is the
    n_buckets-row offsets cumulation, which orders on __tl_bkt), the
    bucket machinery present, and the histogram exchange REUSED (one
    corpus agg feeds both the CDF and the total). Values: correct
    type-1 percentiles on distinct doubles."""
    import re

    from opentick_spark.operators.selection import (
        exact_percentiles,
        exact_percentiles_by,
    )

    df = spark.range(10_000).selectExpr(
        "CAST(id % 4 AS STRING) AS g",
        # distinct, non-monotone doubles: a genuinely wide domain
        "sin(CAST(id AS DOUBLE)) * 1e6 + id * 1e-3 AS v",
    )
    res = exact_percentiles(df, "v")
    vals = sorted(r["v"] for r in df.select("v").collect())
    out = {r["q"]: r["value"] for r in res.collect()}
    # plan inspected AFTER execution: AQE finalizes exchange reuse at
    # runtime (isFinalPlan=true)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # every unpartitioned windowspecdefinition must order on the
    # bounded bucket relation, never on the raw value column
    for spec in re.findall(r"windowspecdefinition\(([^)]*?) (?:ASC|DESC)", plan):
        first_arg = spec.split(",")[0].strip()
        if "," not in spec:  # no partition columns at all
            assert "__tl_bkt" in first_arg, f"single-task window on {first_arg}"
    assert "__tl_bkt" in plan
    assert "ReusedExchange" in plan  # one corpus agg, two consumers

    # values: p50 of 10k distinct values = the 5000th ascending value
    assert out[0.5] == vals[4999] and out[0.25] == vals[2499]
    assert out[0.99] == vals[9899]

    # grouped variant: per-group rows match per-group ground truth
    outg = {
        (r["g"], r["q"]): r["value"]
        for r in exact_percentiles_by(df, "v", "g").collect()
    }
    for g in ("0", "1", "2", "3"):
        gv = sorted(
            r["v"] for r in df.filter(F.col("g") == g).select("v").collect()
        )
        import math as _math

        assert outg[(g, 0.5)] == gv[_math.ceil(0.5 * len(gv)) - 1]
        assert outg[(g, 0.99)] == gv[_math.ceil(0.99 * len(gv)) - 1]


def test_percentile_family_excludes_nulls(spark):
    """r12 ADVICE: Spark windows sort NULLs first, DuckDB last — a NULL
    histogram row would shift every cumulative count differently per
    engine. Contract: NULL values are excluded, so a null-bearing input
    must produce byte-identical output to its non-null subset across
    all three histogram-CDF operators."""
    from opentick_spark.operators.selection import (
        cdf_buckets,
        exact_percentiles,
        exact_percentiles_by,
    )

    clean = spark.range(100).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "CAST(id % 11 AS LONG) AS v",
    )
    dirty = clean.unionAll(
        spark.range(17).selectExpr("'a' AS g", "CAST(NULL AS LONG) AS v")
    )
    for op in (
        lambda d: exact_percentiles(d, "v"),
        lambda d: exact_percentiles_by(d, "v", "g"),
        lambda d: cdf_buckets(d, "v", 4),
    ):
        a = sorted(map(tuple, op(clean).collect()))
        b = sorted(map(tuple, op(dirty).collect()))
        assert a == b and a  # identical, and not vacuously empty


def test_triangle_count_golden_and_orientation(spark):
    """graph.triangle_count (r12): K4 golden (4 triangles, every vertex
    in 3), pendant vertex reports 0, and input normalization — reversed
    duplicates and self loops don't change counts. Orientation cap:
    every oriented out-degree stays <= ceil(sqrt(2m))."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (4, 5)]  # dup/rev/self/pendant
    edges = spark.createDataFrame(noisy, ["src", "dst"])
    out = {r["node"]: r["n_tri"] for r in triangle_count(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}
    assert sum(out.values()) == 3 * 4  # 4 triangles, each counted at 3 vertices

    # star + one rim edge: hub 0 with leaves 1..6, rim edge (1,2): one triangle
    star = [(0, i) for i in range(1, 7)] + [(1, 2)]
    edges = spark.createDataFrame(star, ["src", "dst"])
    out = {r["node"]: r["n_tri"] for r in triangle_count(edges).collect()}
    assert out[0] == 1 and out[1] == 1 and out[2] == 1
    assert all(out[i] == 0 for i in range(3, 7))


def test_exact_percentiles_by_groups_match_ungrouped(spark):
    """exact_percentiles_by (r12): each group's rows must equal
    exact_percentiles run on that group alone, and the CDF windows must
    partition by the group (plan: no un-partitioned Window)."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.selection import (
        exact_percentiles,
        exact_percentiles_by,
    )

    df = spark.range(200).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "CAST(id % 37 AS LONG) AS v",
    )
    grouped = exact_percentiles_by(df, "v", "g")
    for g in ("a", "b"):
        want = {
            (r["q"], r["value"], r["cum_count"], r["total"])
            for r in exact_percentiles(df.filter(F.col("g") == g), "v").collect()
        }
        got = {
            (r["q"], r["value"], r["cum_count"], r["total"])
            for r in grouped.filter(F.col("g") == g).collect()
        }
        assert got == want, g
    opt = grouped._jdf.queryExecution().optimizedPlan().toString()
    import re

    # every Window in the plan is partitioned by the group column —
    # an un-partitioned window would funnel the corpus through one task
    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", opt)
    assert windows, opt[:500]
    for spec in windows:
        assert "g" in spec, opt[:500]


def test_two_level_cumsum_string_domain_plan_and_values(spark):
    """r14 (VERDICT r13 item 3): string value domains now range-bucket
    through the order-preserving 7-byte-prefix long key instead of
    falling back to a single global window. Values must equal the
    single-window answer exactly (unicode, empty string, shared
    prefixes longer than the key — ties land in one bucket and the
    in-bucket window orders by the REAL column); the executed plan must
    contain NO unpartitioned window over the value column."""
    import re

    from opentick_spark.operators.prefix_sum import two_level_cumsum

    vals = [
        "", "a", "A", "aaa", "ab", "b", "ß", "züü", "日本語", "~~~",
        "\x01x", "prefix-shared-very-long-0001", "prefix-shared-very-long-0002",
    ] + [f"doc-{i:05d}" for i in range(500)]
    df = spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(sorted(set(vals)))], "s string, n long"
    )
    out = two_level_cumsum(df, "s", "n", "cum", inclusive=True)
    got = {r["s"]: r["cum"] for r in out.collect()}
    rows = sorted((r["s"], r["n"]) for r in df.collect())
    run = 0
    for s, n in rows:
        run += n
        assert got[s] == run, s
    plan = out._jdf.queryExecution().executedPlan().toString()
    for spec in re.findall(
        r"windowspecdefinition\(([^)]*?) (?:ASC|DESC)", plan
    ):
        if "," not in spec:  # unpartitioned window
            assert "__tl_bkt" in spec.split(",")[0], (
                f"single-task window on {spec}"
            )
    assert "__tl_bkt" in plan  # bucket machinery actually engaged


def test_two_level_cumsum_temporal_and_binary(spark):
    """r14: date/timestamp bucket on their exact epoch keys, binary on
    the 7-byte prefix — all three must equal the single-window answer
    (the exclusive tokens-before convention this time)."""
    from opentick_spark.operators.prefix_sum import two_level_cumsum

    df = spark.range(300).selectExpr(
        "date_add(date'2001-03-04', CAST(id * 7 % 1000 AS INT)) AS d",
        "timestamp_micros(CAST(id * 1234567 AS LONG)) AS ts",
        # TIMESTAMP_NTZ: unix_micros rejects it (r14 review) — the key
        # is built from the NTZ fields, timezone-independent
        "CAST(timestamp_micros(CAST(id * 987654321 AS LONG)) "
        "AS TIMESTAMP_NTZ) AS tsn",
        "encode(concat('k', lpad(CAST(id AS STRING), 5, '0')), 'UTF-8') AS b",
        "id + 1 AS n",
    ).dropDuplicates(["d"])
    for col in ("d", "ts", "tsn", "b"):
        out = two_level_cumsum(df, col, "n", "cum", inclusive=False)
        got = {r[col]: r["cum"] for r in out.collect()}
        rows = sorted((r[col], r["n"]) for r in df.collect())
        run = 0
        for v, n in rows:
            assert got[v] == run, (col, v)
            run += n


def test_two_level_cumsum_per_group_bounds_and_hint_discipline(spark):
    """r14 (VERDICT r13 item 1 + r13 ADVICE low): grouped bounds are
    computed PER GROUP (the executed plan carries a min/max aggregate
    keyed on the group column — global bounds collapsed a narrow-range
    group into one bucket, reviving the single-task funnel), and the
    grouped offsets/bounds joins carry NO broadcast hint (AQE decides;
    a |groups|-scaled driver broadcast is the scale killer). Ungrouped
    keeps the provably-tiny broadcast hint. Values: a group occupying
    a 64-value slice of a 10M-wide global range still sums exactly."""
    import re

    from opentick_spark.operators.prefix_sum import two_level_cumsum

    wide = spark.range(2000).selectExpr(
        "'wide' AS g", "id * 5000 AS v", "id + 1 AS n"
    )
    narrow = spark.range(64).selectExpr(
        "'narrow' AS g", "5000000 + id AS v", "id + 1 AS n"
    )
    df = wide.unionAll(narrow)
    out = two_level_cumsum(
        df, "v", "n", "cum", group_cols=("g",), inclusive=True
    )
    # no broadcast hint anywhere in the grouped plan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    got = {(r["g"], r["v"]): r["cum"] for r in out.collect()}
    for g, rows in (
        ("wide", [(i * 5000, i + 1) for i in range(2000)]),
        ("narrow", [(5_000_000 + i, i + 1) for i in range(64)]),
    ):
        run = 0
        for v, n in rows:
            run += n
            assert got[(g, v)] == run, (g, v)
    # per-group bounds: a min/max aggregate KEYED on g in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"HashAggregate\(keys=\[g#\d+[^\]]*\], functions=\[[^\]]*min\("
        r"[^\]]*max\(", plan
    ), "bounds aggregate is not per-group"
    # ungrouped: the tiny offsets relation keeps its broadcast hint
    out1 = two_level_cumsum(wide, "v", "n", "cum")
    assert "ResolvedHint" in out1._jdf.queryExecution().analyzed().toString()


def test_two_level_cumsum_null_group_keys_kept(spark):
    """r15 (ADVICE r14): rows whose GROUP key is NULL form a real group
    (groupBy/Window.partitionBy semantics) — the bounds/offsets joins
    are null-safe, so those rows get correct per-group running sums
    instead of silently vanishing from the output."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.prefix_sum import two_level_cumsum

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), (None, 1, 5), (None, 3, 7), (None, 9, 11)],
        "grp string, v int, n int",
    )
    out = two_level_cumsum(
        df, "v", "n", "cum", n_buckets=4, group_cols=("grp",), inclusive=True
    ).collect()
    assert len(out) == 5, "NULL-group rows were dropped"
    got = {(r["grp"], r["v"]): r["cum"] for r in out}
    assert got[("a", 1)] == 10 and got[("a", 2)] == 30
    assert got[(None, 1)] == 5
    assert got[(None, 3)] == 12
    assert got[(None, 9)] == 23
