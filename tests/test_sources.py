"""JSONL/CSV corpus sources: explicit-schema reads, corrupt-line
quarantine, and atomic ingest into engine tables."""

import pytest

from opentick_spark import sources as S


@pytest.fixture()
def engine(spark, tmp_path):
    from opentick_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database src")
    eng.use("src")
    return eng


def test_jsonl_roundtrip_with_quarantine(spark, engine, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "body": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "body": "bonjour", "lang": "fr"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "body": "ciao", "lang": "it"}\n'
    )
    engine.execute(
        "create table docs(doc_id bigint, body text, lang text, "
        "primary key(doc_id))"
    )
    n_bad = S.ingest_jsonl(
        engine, "src", "docs", str(p),
        schema="doc_id long, body string, lang string",
    )
    assert n_bad == 1
    rows = engine.execute_rows("select * from docs")
    assert rows == [(1, "hello world", "en"), (2, "bonjour", "fr"), (3, "ciao", "it")]


def test_jsonl_failfast_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json\n')
    df = S.read_jsonl(spark, str(p), schema="a long", bad_record_col=None)
    with pytest.raises(Exception, match="FAILFAST|Malformed|corrupt"):
        df.collect()


def test_jsonl_missing_value_columns_padded(spark, engine, tmp_path):
    p = tmp_path / "sparse.jsonl"
    p.write_text('{"doc_id": 10, "body": "t"}\n')
    engine.execute(
        "create table sparse(doc_id bigint, body text, lang text, "
        "primary key(doc_id))"
    )
    S.ingest_jsonl(
        engine, "src", "sparse", str(p), schema="doc_id long, body string"
    )
    assert engine.execute_rows("select * from sparse") == [(10, "t", None)]


def test_jsonl_extra_column_rejected(spark, engine, tmp_path):
    p = tmp_path / "extra.jsonl"
    p.write_text('{"doc_id": 1, "body": "t", "oops": 5}\n')
    engine.execute(
        "create table narrow(doc_id bigint, body text, primary key(doc_id))"
    )
    with pytest.raises(ValueError, match="oops"):
        S.ingest_jsonl(
            engine, "src", "narrow", str(p),
            schema="doc_id long, body string, oops long",
        )


def test_csv_read_with_schema(spark, tmp_path):
    p = tmp_path / "events.csv"
    p.write_text("user_id,value\n1,2.5\n2,3.5\nbroken-row-no-comma\n")
    df = S.read_csv(spark, str(p), schema="user_id long, value double")
    good, bad = S.split_corrupt(df)
    assert sorted(map(tuple, good.collect())) == [(1, 2.5), (2, 3.5)]
    assert bad.count() == 1


def test_csv_infer_for_exploration(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = S.read_csv(spark, str(p), schema="infer")
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_token_shard_assignment_exact_and_deterministic(spark):
    from opentick_spark.sources import assign_token_shards

    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(500)], "doc_id long, n_toks long"
    )
    a = assign_token_shards(df, "doc_id", "n_toks", shard_tokens=400)
    rows = {r["doc_id"]: (r["tokens_before"], r["shard"]) for r in a.collect()}
    # exact global prefix sum in doc_id order (two-level == naive)
    run = 0
    for i in range(500):
        assert rows[i][0] == run, i
        assert rows[i][1] == run // 400
        run += 10 + i % 7
    # deterministic across runs
    b = assign_token_shards(df, "doc_id", "n_toks", shard_tokens=400)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_export_training_shards_manifest(spark, tmp_path):
    import json

    from opentick_spark.sources import export_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}", 50) for i in range(100)],
        "doc_id long, body string, n_toks long",
    )
    man = export_training_shards(
        df, str(tmp_path / "out"), "doc_id", "n_toks", shard_tokens=1000
    )
    assert man["total_rows"] == 100 and man["total_tokens"] == 5000
    assert man["n_shards"] == 5  # 5000 tokens / 1000 per shard
    assert all(s["tokens"] == 1000 for s in man["shards"])
    on_disk = json.load(open(tmp_path / "out" / "manifest.json"))
    assert on_disk == man
    back = spark.read.parquet(str(tmp_path / "out" / "data"))
    assert back.count() == 100
    assert back.select("shard").distinct().count() == 5


def test_orc_roundtrip_documents(spark, tmp_path):
    from opentick_spark.sources import read_orc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    # pushdown survives the format: filter reaches the ORC scan
    plan = (
        back.filter(back.doc_id == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan


def test_avro_reader_gated(spark, tmp_path):
    import pytest as _pt

    from opentick_spark.sources import read_avro

    try:
        spark.range(1).write.format("avro").save(str(tmp_path / "probe"))
        avro_available = True
    except Exception:
        avro_available = False
    if avro_available:
        df = read_avro(spark, str(tmp_path / "probe"))
        assert df.count() == 1
    else:
        with _pt.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "missing"))


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    from opentick_spark.sources import write_bucketed_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.selectExpr("doc_id", "n_chars * 2 AS feat")
    try:
        write_bucketed_table(
            docs, "bkt_docs", ["doc_id"], 4, sort_cols=["doc_id"],
            path=str(tmp_path / "bkt_docs"),
        )
        write_bucketed_table(
            stats, "bkt_stats", ["doc_id"], 4, sort_cols=["doc_id"],
            path=str(tmp_path / "bkt_stats"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # disable broadcast so the join must prove co-partitioning
            # (at real scale both sides are too big to broadcast anyway)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = (
                spark.table("bkt_docs")
                .join(spark.table("bkt_stats"), "doc_id")
                .selectExpr("doc_id", "lang", "feat")
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the whole point of the layout: co-located join, no shuffle
            assert "Exchange" not in plan
            assert "SortMergeJoin" in plan
            assert joined.count() == docs.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_docs")
        spark.sql("DROP TABLE IF EXISTS bkt_stats")


def test_read_arrow_ipc_roundtrip_and_inference(spark, tmp_path):
    """r8 Arrow IPC source: multi-file, multi-batch Feather-v2 shards
    read back exactly; schema inferred from ONE footer when omitted."""
    import pyarrow as pa

    from opentick_spark.sources import read_arrow_ipc

    d = tmp_path / "ipc"
    d.mkdir()
    rows = []
    for shard in range(3):
        ids = list(range(shard * 10, shard * 10 + 10))
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"doc {i}" for i in ids]),
                "score": pa.array([i / 4.0 for i in ids], pa.float64()),
            }
        )
        with pa.OSFile(str(d / f"part-{shard}.arrow"), "wb") as f:
            with pa.ipc.new_file(f, tbl.schema) as w:
                # two batches per file: the reader must walk them all
                w.write_table(tbl.slice(0, 4))
                w.write_table(tbl.slice(4))
        rows += [(i, f"doc {i}", i / 4.0) for i in ids]
    out = read_arrow_ipc(spark, str(d))  # inferred schema
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(rows)
    # explicit schema (subset order respected) + column projection
    out2 = read_arrow_ipc(
        spark, str(d), schema="doc_id long, text string, score double"
    )
    assert sorted(tuple(r) for r in out2.collect()) == sorted(rows)


def test_read_arrow_ipc_corrupt_quarantine(spark, tmp_path):
    """A corrupt shard fails loudly by default and contributes zero
    rows under on_corrupt='skip' (the JSONL PERMISSIVE analog)."""
    import pyarrow as pa
    import pytest

    from opentick_spark.sources import read_arrow_ipc

    d = tmp_path / "ipc"
    d.mkdir()
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})
    with pa.OSFile(str(d / "good.arrow"), "wb") as f:
        with pa.ipc.new_file(f, tbl.schema) as w:
            w.write_table(tbl)
    (d / "bad.arrow").write_bytes(b"ARROW1\x00\x00 this is not an ipc file")
    ok = read_arrow_ipc(spark, str(d), schema="doc_id long", on_corrupt="skip")
    assert sorted(r["doc_id"] for r in ok.collect()) == [1, 2, 3]
    strict = read_arrow_ipc(spark, str(d), schema="doc_id long")
    with pytest.raises(Exception):
        strict.collect()


def test_read_jsonl_zst_roundtrip_and_quarantine(spark, tmp_path):
    """r8 .jsonl.zst source: multi-shard zstd streams decode
    shard-parallel; malformed lines quarantine into the corrupt column
    (data columns NULL, raw line preserved); FAILFAST raises."""
    import pyarrow as pa
    import pytest

    from opentick_spark.sources import read_jsonl_compressed, split_corrupt

    d = tmp_path / "zst"
    d.mkdir()
    for shard in range(2):
        sink = pa.BufferOutputStream()
        with pa.output_stream(sink, compression="zstd") as s:
            for i in range(shard * 5, shard * 5 + 5):
                s.write(f'{{"doc_id": {i}, "text": "d{i}"}}\n'.encode())
            if shard == 1:
                s.write(b"{not json at all\n")
        (d / f"part-{shard}.jsonl.zst").write_bytes(
            sink.getvalue().to_pybytes()
        )
    df = read_jsonl_compressed(
        spark, str(d), schema="doc_id long, text string"
    )
    good, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in good.collect()) == list(range(10))
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["_corrupt_record"].startswith("{not json")
    with pytest.raises(Exception):
        read_jsonl_compressed(
            spark, str(d), schema="doc_id long, text string",
            bad_record_col=None,
        ).collect()
    with pytest.raises(ValueError):
        read_jsonl_compressed(spark, str(d), schema="infer")
    # gzip through the same path
    import gzip

    g = tmp_path / "gz"
    g.mkdir()
    (g / "p.jsonl.gz").write_bytes(
        gzip.compress(b'{"doc_id": 99, "text": "z"}\n')
    )
    gz = read_jsonl_compressed(
        spark, str(g), schema="doc_id long, text string", codec="gzip"
    )
    assert [r["doc_id"] for r in gz.collect()] == [99]


def _curriculum_ground_truth(rows, n_shards):
    """rows = [(id, value, tokens)] → {shard: (n, min, max, tokens)}
    via the documented ceil(cum·n/total) cut-point math."""
    import collections

    hist = collections.Counter(v for _, v, _ in rows)
    total, cum, smap = sum(hist.values()), 0, {}
    for v in sorted(hist):
        cum += hist[v]
        smap[v] = (cum * n_shards + total - 1) // total
    out = {}
    for _, v, t in rows:
        s = smap[v]
        e = out.setdefault(s, [0, None, None, 0])
        e[0] += 1
        e[1] = v if e[1] is None else min(e[1], v)
        e[2] = v if e[2] is None else max(e[2], v)
        e[3] += t
    return {s: tuple(e) for s, e in out.items()}


def test_export_curriculum_shards_values_and_layout(spark, tmp_path):
    """r14 (VERDICT r13 item 6): the curriculum writer's manifest must
    equal the window-free CDF math, the manifest is aggregated from the
    WRITTEN files, shard directories must be difficulty-ordered and
    non-overlapping, and rows inside each shard file must be sorted by
    (difficulty, id)."""
    import glob as _glob
    import json

    import pyarrow.parquet as pq

    from opentick_spark.sources import export_curriculum_shards

    rows = [(i, (i * 7) % 23, i % 5 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, diff long, toks long")
    d = str(tmp_path / "curr")
    m = export_curriculum_shards(
        df, d, "diff", 4, id_col="doc_id", tokens_col="toks"
    )
    got = {r["shard"]: (r["n_docs"], r["min_diff"], r["max_diff"], r["tokens"])
           for r in m.collect()}
    assert got == _curriculum_ground_truth(rows, 4)
    # manifest.json mirrors the DataFrame
    man = json.load(open(d + "/manifest.json"))
    assert [s["shard"] for s in man["shards"]] == sorted(got)
    for s in man["shards"]:
        assert (s["n_docs"], s["min_diff"], s["max_diff"], s["tokens"]) == got[s["shard"]]
    # shard dirs: ascending difficulty, non-overlapping ranges
    prev_max = None
    for s in sorted(got):
        if prev_max is not None:
            assert got[s][1] > prev_max
        prev_max = got[s][2]
    # in-file order: every shard file sorted by (diff, doc_id)
    for f in _glob.glob(d + "/data/shard=*/*.parquet"):
        t = pq.read_table(f).to_pydict()
        pairs = list(zip(t["diff"], t["doc_id"]))
        assert pairs == sorted(pairs), f


def test_curriculum_order_plan_no_global_sort(spark):
    """The writer's input plan: RangePartitioning exchange (the order
    ships with the shuffle) and ONLY partition-local sorts — a global
    Sort is the 100 TB scale killer this operator exists to avoid."""
    import re

    from opentick_spark.sources import curriculum_order

    df = spark.range(5000).selectExpr(
        "id AS doc_id", "CAST(id % 97 AS LONG) AS diff"
    )
    _, ordered = curriculum_order(df, "diff", 8, id_col="doc_id")
    ordered.collect()
    plan = ordered._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    for m in re.finditer(r"Sort \[[^\]]*\], (true|false)", plan):
        assert m.group(1) == "false", "global Sort in curriculum plan"


def test_curriculum_hot_value_splits_across_partitions(spark):
    """Skew posture: a difficulty value holding 60% of the corpus must
    RANGE-SPLIT across writer partitions via the id tie-break in the
    range keys (same shard id — layout unaffected) instead of funneling
    one task."""
    from pyspark.sql import functions as F

    from opentick_spark.sources import curriculum_order

    hot = spark.range(6000).selectExpr("id AS doc_id", "CAST(50 AS LONG) AS diff")
    rest = spark.range(4000).selectExpr(
        "10000 + id AS doc_id", "CAST(id % 100 AS LONG) AS diff"
    )
    _, ordered = curriculum_order(hot.unionAll(rest), "diff", 8, id_col="doc_id")
    sizes = (
        ordered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) < 6000  # hot value was split
    # NULL difficulty rows are excluded (the CDF convention)
    withnull = hot.unionAll(
        spark.range(7).selectExpr("90000 + id AS doc_id", "CAST(NULL AS LONG) AS diff")
    )
    assigned, _ = curriculum_order(withnull, "diff", 4, id_col="doc_id")
    assert assigned.count() == 6000


def test_export_curriculum_shards_temporal_and_detached(spark, tmp_path):
    """r14 review findings 3+5+6: a DATE difficulty column must survive
    manifest.json serialization (ISO strings), and the returned manifest
    must be DETACHED from the written files — deleting the export after
    the call must not break evaluating the returned DataFrame."""
    import json
    import shutil

    from opentick_spark.sources import export_curriculum_shards

    df = spark.range(100).selectExpr(
        "id AS doc_id",
        "date_add(date'2020-01-01', CAST(id % 10 AS INT)) AS day",
        "id % 3 + 1 AS toks",
    )
    d = str(tmp_path / "curr_dates")
    m = export_curriculum_shards(df, d, "day", 4, id_col="doc_id",
                                 tokens_col="toks")
    man = json.load(open(d + "/manifest.json"))
    assert all(isinstance(s["min_day"], str) for s in man["shards"])
    shutil.rmtree(d)  # detached: rows were collected once at export time
    got = {r["shard"]: r["n_docs"] for r in m.collect()}
    assert sum(got.values()) == 100


def test_export_curriculum_shards_verify_false(spark, tmp_path):
    """r15 (VERDICT r14 item 6): ``verify=False`` must produce the
    IDENTICAL manifest (DataFrame rows and manifest.json) from the
    pre-write assignment lineage — no scan of the written export — and
    still write the same shard layout to disk."""
    import glob as _glob
    import json

    from opentick_spark.sources import export_curriculum_shards

    rows = [(i, (i * 11) % 17, i % 4 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, diff long, toks long")
    d_v = str(tmp_path / "with_verify")
    d_f = str(tmp_path / "no_verify")
    m_v = export_curriculum_shards(
        df, d_v, "diff", 4, id_col="doc_id", tokens_col="toks"
    )
    m_f = export_curriculum_shards(
        df, d_f, "diff", 4, id_col="doc_id", tokens_col="toks", verify=False
    )
    assert sorted(map(tuple, m_v.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, m_f.collect()), key=lambda t: t[0]
    )
    man_v = json.load(open(d_v + "/manifest.json"))
    man_f = json.load(open(d_f + "/manifest.json"))
    assert man_v["shards"] == man_f["shards"]
    # the export itself still landed with the same partition layout
    dirs = lambda d: sorted(  # noqa: E731
        p.rsplit("/", 1)[-1] for p in _glob.glob(d + "/data/shard=*")
    )
    assert dirs(d_v) == dirs(d_f)
    assert _curriculum_ground_truth(rows, 4) == {
        r["shard"]: (r["n_docs"], r["min_diff"], r["max_diff"], r["tokens"])
        for r in m_f.collect()
    }


def test_export_curriculum_shards_binary_difficulty(spark, tmp_path):
    """r15 (ADVICE r14): a BinaryType difficulty column is bucketable,
    so the manifest's min/max must serialize (hex) instead of blowing
    up json.dump after the parquet data was already written."""
    import json

    from opentick_spark.sources import export_curriculum_shards

    df = spark.range(120).selectExpr(
        "id AS doc_id",
        "unhex(lpad(hex(id % 30), 4, '0')) AS fp",
        "id % 3 + 1 AS toks",
    )
    d = str(tmp_path / "curr_bin")
    m = export_curriculum_shards(
        df, d, "fp", 3, id_col="doc_id", tokens_col="toks"
    )
    man = json.load(open(d + "/manifest.json"))
    assert all(
        isinstance(s["min_fp"], str) and isinstance(s["max_fp"], str)
        for s in man["shards"]
    )
    assert sum(r["n_docs"] for r in m.collect()) == 120
