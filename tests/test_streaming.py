"""Structured Streaming ingest tests: multi-micro-batch upsert with
colliding PKs (latest file wins) — the reference's out-of-order insert
firehose semantics (test.py:44-61; upsert-by-PK server_test.go:96-99)."""

import os
import time

import pyarrow as pa
import pytest
import pyarrow.parquet as pq

from opentick_spark.engine import Engine
from opentick_spark.streaming.ingest import stream_upsert


def test_stream_upsert_latest_wins(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute("create table t(sec int, tm timestamp, px double, primary key(sec, tm))")
    store = eng.store("s", "t")

    src = tmp_path / "src"
    src.mkdir()
    # three files, same PKs, increasing px; distinct mtimes so the file
    # source processes them in order with maxFilesPerTrigger=1-ish batching
    for i, px in enumerate([1.0, 2.0, 3.0]):
        tbl = pa.table(
            {
                "sec": pa.array([1, 1], pa.int32()),
                "tm": pa.array([10, 20], pa.int64()),
                "px": pa.array([px, px * 10], pa.float64()),
            }
        )
        path = src / f"part-{i}.parquet"
        pq.write_table(tbl, str(path))
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = store.spark_schema(with_meta=False)
    q = stream_upsert(
        spark,
        str(src),
        schema,
        store,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    rows = eng.execute_rows("select sec, tm, px from t where sec=1")
    assert rows == [(1, (0, 10), 3.0), (1, (0, 20), 30.0)]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state survives across micro-batches
    and the final totals equal the batch aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentick_spark.streaming.stateful import stateful_running_totals

    src = tmp_path / "src"
    src.mkdir()
    data = {
        0: [(1, 1.0), (1, 2.0), (2, 10.0)],
        1: [(1, 3.0), (2, 20.0)],
        2: [(2, 30.0)],
    }
    for i, rows in data.items():
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        )
        path = src / f"f{i}.parquet"
        pq.write_table(tbl, str(path))
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = "user_id long, value double"
    q = stateful_running_totals(
        spark, str(src), schema, "stateful_sink", str(tmp_path / "ck")
    )
    q.awaitTermination()
    rows = spark.table("stateful_sink").collect()
    # final state per key = row with the highest n
    final = {}
    for r in rows:
        if r.user_id not in final or r.n > final[r.user_id].n:
            final[r.user_id] = r
    assert final[1].n == 3 and final[1].sum_value == 6.0
    assert final[1].min_value == 1.0 and final[1].max_value == 3.0
    assert final[2].n == 3 and final[2].sum_value == 60.0


def test_continuous_ohlcv_incremental_merge(spark, tmp_path):
    """A bar spanning several micro-batches must merge exactly: open from
    the earliest tick, close from the latest, sums/extremes combined —
    regardless of which batch carried which tick."""
    from opentick_spark.streaming.rollup import continuous_ohlcv

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database r")
    eng.use("r")
    eng.execute(
        "create table bars(sec int, bar_ts timestamp, open_ts timestamp, "
        "open double, high double, low double, close_ts timestamp, "
        "close double, n_ticks bigint, volume double, "
        "primary key(sec, bar_ts))"
    )
    hour = 3_600 * 10**9
    # batches deliberately deliver the bar's ticks OUT of time order:
    # batch0 has the middle ticks, batch1 the bar's true close, batch2
    # its true open. Second key (sec=2) lives in one batch only.
    batches = [
        [(1, hour + 300, 5.0), (1, hour + 400, 1.0)],
        [(1, hour + 900, 7.5), (2, 5 * hour + 1, 42.0)],
        [(1, hour + 100, 3.0), (1, 2 * hour, 9.0)],  # second tick: next bar
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "sec": pa.array([r[0] for r in rows], pa.int32()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        path = src / f"part-{i}.parquet"
        pq.write_table(tbl, str(path))
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    store = eng.store("r", "bars")
    q = continuous_ohlcv(
        spark,
        str(src),
        "sec int, ts long, value double",
        store,
        str(tmp_path / "ck"),
        key_cols=["sec"],
        ts_col="ts",
        price_col="value",
    )
    q.awaitTermination()
    got = {
        (r.sec, r.bar_ts): (r.open, r.high, r.low, r.close, r.n_ticks, r.volume)
        for r in store.read(spark).collect()
    }
    assert got == {
        (1, hour): (3.0, 7.5, 1.0, 7.5, 4, 16.5),
        (1, 2 * hour): (9.0, 9.0, 9.0, 9.0, 1, 9.0),
        (2, 5 * hour): (42.0, 42.0, 42.0, 42.0, 1, 42.0),
    }


def test_stream_upsert_jsonl_source(spark, tmp_path):
    """The streaming ingest path accepts JSONL drops — the common
    "log files land in a directory" pipeline — with identical upsert
    semantics."""
    import json as _json

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database s")
    eng.use("s")
    eng.execute("create table t(sec int, tm timestamp, px double, primary key(sec, tm))")
    store = eng.store("s", "t")

    src = tmp_path / "src"
    src.mkdir()
    for i, px in enumerate([1.0, 2.0]):
        with open(src / f"drop-{i}.json", "w") as f:
            for tm in (10, 20):
                f.write(_json.dumps({"sec": 1, "tm": tm, "px": px * tm}) + "\n")
        mtime = time.time() - 20 + i * 10
        os.utime(src / f"drop-{i}.json", (mtime, mtime))

    q = stream_upsert(
        spark,
        str(src),
        store.spark_schema(with_meta=False),
        store,
        str(tmp_path / "ck"),
        fmt="json",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    rows = sorted((r.sec, r.tm, r.px) for r in store.read(spark).collect())
    assert rows == [(1, 10, 20.0), (1, 20, 40.0)]  # later file wins


def test_stream_neardup_lsh_cross_batch(spark, tmp_path):
    """Streaming near-dup detection: a doc in batch 2 that near-matches a
    doc from batch 1 is reported (cross-batch state), in-batch dups break
    ties by id, and the full detection set equals the batch LSH run over
    the whole corpus."""
    from opentick_spark.operators.dedup import band_buckets, minhash_signatures
    from opentick_spark.streaming.neardup import (
        neardup_results,
        stream_neardup_lsh,
    )
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet green meadow near the old stone bridge"
    )
    uniq = [
        "completely different text about spacecraft telemetry and orbital mechanics calculations",
        "a recipe for sourdough bread with long fermentation and careful folding technique",
        "legal boilerplate concerning indemnification clauses and limitation of liability terms",
        "weather report heavy snowfall expected across the northern mountain passes tonight",
    ]
    batch1 = [
        (1, base),
        (2, base.replace("dog", "cat")),  # near-dup of 1, in-batch
        (3, uniq[0]),
        (4, uniq[1]),
    ]
    batch2 = [
        (11, base.replace("rain", "snow")),  # near-dup of 1/2, CROSS-batch
        (12, uniq[2]),
        (13, uniq[3]),
    ]
    src = tmp_path / "ndsrc"
    src.mkdir()
    for i, rows in enumerate([batch1, batch2]):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"f{i}"))
        t = time.time() - 30 + i * 10
        for root, _, files in os.walk(src / f"f{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    state = str(tmp_path / "ndstate")
    q = stream_neardup_lsh(
        spark,
        str(src / "f*"),
        "doc_id long, text string",
        state,
        str(tmp_path / "ndckpt"),
        threshold=0.5,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    got = {
        (r["id"], r["dup_of"]): r["est_jac"]
        for r in neardup_results(spark, state).collect()
    }
    # in-batch pair (2, 1) and cross-batch pairs (11, 1), (11, 2)
    assert (2, 1) in got
    assert (11, 1) in got and (11, 2) in got
    for v in got.values():
        assert v >= 0.5
    # never a self-pair or a later-doc partner
    assert all(i > d for i, d in got)

    # equivalence vs the batch run over the full corpus (same code path)
    full = spark.createDataFrame(
        batch1 + batch2, "doc_id long, text string"
    )
    sigs = minhash_signatures(full, "doc_id", "text", n=2, num_hashes=96)
    b = band_buckets(sigs, 96, 24)
    cand = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") > F.col("y.id")),
        )
        .select(F.col("x.id").alias("id"), F.col("y.id").alias("dup_of"))
        .distinct()
    )
    sx = sigs.select(F.col("id"), F.col("sig").alias("__sx"))
    sy = sigs.select(F.col("id").alias("dup_of"), F.col("sig").alias("__sy"))
    ref = {
        (r["id"], r["dup_of"])
        for r in cand.join(sx, "id")
        .join(sy, "dup_of")
        .withColumn(
            "est",
            F.size(
                F.filter(
                    F.zip_with(F.col("__sx"), F.col("__sy"), lambda a, c: a == c),
                    lambda x: x,
                )
            ).cast("double")
            / F.lit(96),
        )
        .filter(F.col("est") >= 0.5)
        .collect()
    }
    assert set(got) == ref


def test_stream_quality_matches_batch_validate(spark, tmp_path):
    """Continuous validation: the merged per-batch partials must produce
    EXACTLY the report the batch suite computes over the union of all
    micro-batches."""
    from opentick_spark.operators import quality as Q
    from opentick_spark.streaming.quality import quality_report, stream_quality

    rules = [
        Q.inc_not_null("v", max_null_frac=0.1),
        Q.inc_in_range("v", 0, 100),
        Q.inc_accepted_values("t", ["a", "b"]),
        Q.inc_min_rows(5),
    ]
    b1 = [(1, 5.0, "a"), (2, None, "b"), (3, 50.0, "a")]
    b2 = [(4, 500.0, "zzz"), (5, 7.0, "b"), (6, 8.0, "a"), (7, 9.0, "b")]
    src = tmp_path / "qsrc"
    src.mkdir()
    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, "id long, v double, t string").coalesce(
            1
        ).write.parquet(str(src / f"f{i}"))
        t = time.time() - 30 + i * 10
        for root, _, files in os.walk(src / f"f{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    q = stream_quality(
        spark,
        str(src / "f*"),
        "id long, v double, t string",
        str(tmp_path / "qstate"),
        str(tmp_path / "qckpt"),
        rules,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, quality_report(spark, str(tmp_path / "qstate"), rules).collect())
    )
    union = spark.createDataFrame(b1 + b2, "id long, v double, t string")
    want = sorted(map(tuple, Q.validate(union, rules).collect()))
    assert got == want
    by_rule = {r[0]: r for r in got}
    assert by_rule["not_null(v)"][3] is False  # 1/7 nulls > 0.1
    assert by_rule["in_range(v,0,100)"][1] == 1.0  # the 500.0
    assert by_rule["min_rows(5)"][3] is True  # 7 rows


def test_stream_quality_rejects_non_incremental_rule(spark, tmp_path):
    from opentick_spark.operators import quality as Q
    from opentick_spark.streaming.quality import stream_quality

    with pytest.raises(ValueError, match="not incremental"):
        stream_quality(
            spark,
            str(tmp_path),
            "id long",
            str(tmp_path / "s"),
            str(tmp_path / "c"),
            [Q.unique("id")],
        )


def test_stream_upsert_delete_col_cdc_apply(spark, engine, tmp_path):
    """stream_upsert(delete_col=...) (r11): a change feed with per-row
    upsert/delete ops applies atomically per micro-batch; a replay with
    a fresh checkpoint under the same stream identity is a no-op
    (exactly-once markers), and a delete for a never-inserted key
    leaves the key absent."""
    from pyspark.sql import functions as F

    from opentick_spark.streaming.ingest import stream_upsert

    engine.execute("create database cdc")
    engine.use("cdc")
    engine.execute("create table kv(k int, v double, primary key(k))")
    store = engine.store("cdc", "kv")
    store.append_dataframe(
        spark.range(5).selectExpr(
            "CAST(id AS int) AS k", "CAST(0.0 AS double) AS v"
        )
    )

    # change feed: upsert k=0..2 to 9.9; delete k=3; delete k=100
    # (never inserted); upsert k=200 (new)
    changes = spark.createDataFrame(
        [
            (0, 9.9, False),
            (1, 9.9, False),
            (2, 9.9, False),
            (3, None, True),
            (100, None, True),
            (200, 5.5, False),
        ],
        "k int, v double, is_del boolean",
    )
    src = str(tmp_path / "cdc_src")
    changes.repartition(3).write.parquet(src)

    def run(ck):
        q = stream_upsert(
            spark,
            src,
            "k int, v double, is_del boolean",
            store,
            ck,
            max_files_per_trigger=1,
            delete_col="is_del",
            stream_id="cdc-stream",
        )
        q.awaitTermination()

    run(str(tmp_path / "ck_a"))
    expect = [(0, 9.9), (1, 9.9), (2, 9.9), (4, 0.0), (200, 5.5)]
    assert engine.execute_rows("select k, v from kv") == expect
    seq_after = store.current_seq()
    # replay, fresh checkpoint, same identity: marker-skipped, no
    # new commits, state unchanged
    run(str(tmp_path / "ck_b"))
    assert store.current_seq() == seq_after
    assert engine.execute_rows("select k, v from kv") == expect


def test_streaming_cms_replay_is_exactly_once(spark, tmp_path):
    """streaming_cms_build (r12): CMS partials merge by SUM, so the
    exactly-once contract is deterministic batch_id-keyed overwrite —
    a FULL stream replay (fresh checkpoint, same partials dir, batch
    ids restart at 0) must leave the merged sketch cell-for-cell
    unchanged, and the streamed sketch must equal a batch build over
    the same rows."""
    from pyspark.sql import functions as F

    from opentick_spark.operators.sketch import cms_build, cms_merge
    from opentick_spark.streaming.rollup import (
        streaming_cms_build,
        streaming_cms_estimate,
    )

    src = str(tmp_path / "src")
    parts = str(tmp_path / "parts")
    rows = spark.range(0, 300).selectExpr(
        "id AS doc_id", "concat('tok', id % 37) AS text"
    )
    rows.repartitionByRange(3, "doc_id").write.parquet(src)

    def to_words(b):
        return b.select(F.col("text").alias("w"))

    def run(ck):
        q = streaming_cms_build(
            spark, src, "doc_id long, text string", parts, ck,
            "w", width=256, depth=3, transform=to_words,
        )
        q.awaitTermination()
        # explicit stop + drain: a terminated availableNow query can
        # linger in the session's active list and trip the
        # concurrent-checkpoint guard when the SAME checkpoint restarts
        q.stop()
        deadline = time.time() + 30
        while (
            any(a.id == q.id for a in spark.streams.active)
            and time.time() < deadline
        ):
            time.sleep(0.1)

    import os

    ck = str(tmp_path / "ck1")
    run(ck)
    merged1 = cms_merge(spark.read.parquet(parts).select("cms")).collect()[0][0]
    # crash replay: drop the LAST commit marker from the checkpoint —
    # on restart Structured Streaming re-executes that batch (the sink
    # ran but the commit was lost, the real at-least-once window); the
    # batch_id-keyed overwrite must rewrite identical content
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar of the commit
        os.remove(crc)
    run(ck)
    merged2 = cms_merge(spark.read.parquet(parts).select("cms")).collect()[0][0]
    assert merged1 == merged2  # no double counting from the replay

    # fresh-checkpoint restarts over live partials are FENCED: batch
    # ids would re-deal and stale partials double-count (r12 review)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fresh checkpoint"):
        run(str(tmp_path / "ck2"))

    # streamed state == batch build over the same rows, cell for cell
    batch = cms_build(
        rows.select(F.col("text").alias("w")), "w", width=256, depth=3
    ).collect()[0][0]
    assert merged2 == batch

    # and the probe path returns exact counts (roomy width, no collisions)
    probes = rows.select(F.col("text").alias("w")).distinct()
    est = streaming_cms_estimate(
        spark, parts, probes, "w", width=256, depth=3
    )
    exact = rows.groupBy(F.col("text").alias("w")).count()
    joined = est.join(exact, "w")
    assert joined.filter(F.col("cms_est") != F.col("count")).count() == 0


def test_streaming_cms_fence_sees_hadoop_fs_uris(spark, tmp_path):
    """r12 ADVICE (medium): the sink writes through Spark, which
    accepts any Hadoop FS URI — so the fence must probe through the
    Hadoop FileSystem API too. With ``file:``-scheme paths,
    os.path.isdir would silently say 'fresh, no partials' and the
    double-count fence is bypassed; the FS-API fence must still
    raise."""
    import os

    import pytest as _pytest

    from opentick_spark.streaming.rollup import streaming_cms_build

    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = tmp_path / "parts"
    (parts / "batch=0").mkdir(parents=True)  # stale partial from a prior run
    ck = tmp_path / "ck_fresh"  # no offsets/ → fresh checkpoint

    with _pytest.raises(ValueError, match="fresh checkpoint"):
        streaming_cms_build(
            spark,
            "file:" + src,
            "doc_id long, text string",
            "file:" + str(parts),
            "file:" + str(ck),
            "text",
        )


def test_state_probes_see_hadoop_fs_uris(spark, tmp_path):
    """r13 sweep of the r12-ADVICE fence class: every probe of
    Spark-written streaming state must go through the Hadoop FS API.
    With ``file:``-scheme paths, os.path probes answer 'missing' —
    quality_report would raise on good state, and neardup's
    _read_state would SILENTLY fabricate empty prior state (a dedup
    detector that forgets every previously-seen document)."""
    from opentick_spark.operators.quality import inc_not_null
    from opentick_spark.streaming.neardup import _read_state, _SIG_SCHEMA
    from opentick_spark.streaming.quality import partial_metrics, quality_report

    # quality: one Spark-written partial under a file:-scheme state dir
    qdir = str(tmp_path / "qstate")
    rules = [inc_not_null("n_chars")]

    spark.range(5).selectExpr("CAST(id AS LONG) AS n_chars").agg(
        *partial_metrics(rules)
    ).write.parquet(f"{qdir}/batch-000000001")
    rep = quality_report(spark, "file:" + qdir, rules)
    assert rep.count() >= 1  # found through the file: URI, no raise

    # neardup: Spark-written signature state behind a file: URI
    ndir = str(tmp_path / "nstate")
    spark.createDataFrame(
        [(1, [1, 2, 3])], _SIG_SCHEMA
    ).write.parquet(f"{ndir}/batch-000000001")
    got = _read_state(spark, "file:" + ndir, _SIG_SCHEMA).collect()
    assert [r["id"] for r in got] == [1]  # prior state NOT forgotten
