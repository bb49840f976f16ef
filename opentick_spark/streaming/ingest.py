"""Structured Streaming ingest + streaming analytics.

Exactly-once sinks (r10): every upsert sink stamps each micro-batch
commit with an applied-marker token ``<stream_id>:<batch_id>``
(``TableStore.append_dataframe(applied_marker=...)`` — the marker is a
sidecar inside the commit directory, atomic with the data) and checks
``has_applied_marker`` before applying. A batch re-delivered after a
crash between the sink and the checkpoint write is therefore SKIPPED
instead of re-appended — no duplicate commit, so a replay can no longer
regress rows a CONCURRENT writer updated in between (the r9 ADVICE
hazard). ``stream_id`` defaults to a per-INCARNATION identity stored
inside the checkpoint directory (``_default_stream_id``): the same
checkpoint re-delivers byte-identical batches (Spark's replay
contract), while a fresh OR re-created checkpoint — even at the same
path — gets a fresh identity, and its re-deliveries fall back to plain
latest-wins upserts. Markers key DELIVERY identity, not content:
pinning ``stream_id`` across checkpoint re-creations extends the skip
guarantee ONLY when the landing directory is append-only and listed
deterministically — otherwise a marker hit could skip a batch whose
files were never the ones originally applied — and only within the
marker-cache horizon (the last ``TableStore._MARKER_CACHE_CAP`` = 4096
marked commits survive compaction of their commit dirs). Default =
safe.

The reference's "streaming" is clients firing async inserts and atomic
batches at a TCP server (test.py:44-61); semantically that is a firehose
of PK-keyed upserts where arrival order never matters (rows carry their
own PK time, out-of-order tolerated — adj.go:162 even re-bisects when
time goes backward). The Spark-native equivalents:

- ``stream_upsert``: readStream → foreachBatch, each micro-batch lands as
  ONE atomic commit into the PK table (TableStore.append_dataframe), with
  the latest-wins view resolving replays/out-of-order — Delta-style
  streaming MERGE without Delta.
- ``windowed_event_counts``: watermark + tumbling window aggregation over
  the events stream (the extension surface the reference lacks).

Both run with ``availableNow`` triggers in tests so they execute real
micro-batch plans and terminate deterministically.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentick_spark.table import TableStore


def _normalize_event_times(stream: DataFrame) -> DataFrame:
    """events.ts → epoch-nano long on the stream, whatever the stored
    parquet representation (TIMESTAMP(NANOS) generations arrive as
    ns-longs via nanosAsLong; TIMESTAMP(MICROS) generations as
    timestamp_ntz). Downstream watermark/window/upsert logic is written
    against the engine-native ns-long and stays generation-independent.
    A pure projection — streaming-safe, applied before any state."""
    t = dict(stream.dtypes).get("ts")
    if t and t.startswith("timestamp"):
        stream = stream.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "long"
            ),
        )
    return stream


@contextlib.contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Size the state store for a stateful streaming query.

    Stateful operators fix their state-store partition count to
    ``spark.sql.shuffle.partitions`` at the FIRST checkpoint, and every
    micro-batch pays per-partition state-store open/commit overhead —
    with small per-key state, 32 partitions cost ~5x the wall clock of
    8 for identical results (measured at sf0.1). Real deployments size
    this deliberately for the same reason; this scopes the conf to the
    query and restores it afterwards. Hold it open until
    ``awaitTermination`` — the conf is read per micro-batch plan.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def stream_upsert(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    store: TableStore,
    checkpoint_dir: str,
    available_now: bool = True,
    transform=None,
    max_files_per_trigger: int = 8,
    fmt: str = "parquet",
    stream_id: str | None = None,
    delete_col: str | None = None,
):
    """File-stream → atomic per-batch upsert into a PK table.

    ``transform`` (optional) maps each micro-batch DataFrame to the
    table's column shape before the commit. ``fmt`` selects the source
    file format (parquet / json = JSONL / csv-with-header) — the
    streaming twin of ``TableStore.import_data``. Each batch commit is
    stamped with ``<stream_id>:<batch_id>`` and re-deliveries are
    skipped (exactly-once; see the module docstring). Returns the
    StreamingQuery (await/stop is the caller's job).

    ``delete_col`` (r11) turns the sink into a CDC APPLY: the named
    boolean column marks per-row tombstones, so one micro-batch can
    carry upserts AND deletes and still land as ONE atomic commit
    (``append_dataframe(delete_col=...)`` — the same primitive MERGE
    INTO builds on). A delete for a PK the table never held is a
    harmless tombstone (the key stays absent), matching SQL MERGE's
    WHEN MATCHED DELETE on no match.
    """
    if fmt not in ("parquet", "json", "csv"):
        raise ValueError(f"unsupported stream source format: {fmt}")
    sid = stream_id or _default_stream_id(checkpoint_dir)
    reader = spark.readStream.schema(source_schema).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.format(fmt).load(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{sid}:{batch_id}"
        if store.has_applied_marker(marker):
            return  # re-delivered batch: already committed atomically
        if transform is not None:
            batch_df = transform(batch_df)
        if not batch_df.isEmpty():
            store.append_dataframe(
                batch_df, delete_col=delete_col, applied_marker=marker
            )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _default_stream_id(checkpoint_dir: str) -> str:
    """Stream identity for applied markers = the checkpoint
    INCARNATION, not its path: a ``_otspark_stream_id`` file inside
    the checkpoint directory is created on first use and read back on
    resume. The same checkpoint re-delivers byte-identical batches
    (Spark's replay contract), so marker-keyed skips are safe exactly
    within one incarnation — and deleting/recreating the checkpoint at
    the SAME path (a routine ops reset) mints a fresh identity, so
    stale markers from the previous incarnation can never skip batches
    that were never ingested (r10 review fix; a path-derived id had
    exactly that hazard). Spark ignores foreign files at the
    checkpoint root."""
    import os as _os
    import uuid as _uuid

    _os.makedirs(checkpoint_dir, exist_ok=True)
    p = _os.path.join(checkpoint_dir, "_otspark_stream_id")
    try:
        with open(p) as f:
            return f.read().strip()
    except FileNotFoundError:
        pass
    sid = _uuid.uuid4().hex[:16]
    tmp = f"{p}.{_uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(sid)
    _os.replace(tmp, p)
    return sid


#: binaryFile's fixed schema — streaming sources demand an explicit
#: schema even for fixed-schema formats
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    decode,
    store: TableStore,
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
    bad_record_col: str = "_corrupt_record",
    source_path_col: str = "_source_path",
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    transform=None,
    stream_id: str | None = None,
):
    """Structured-Streaming shard tail for the corpus sources (r9,
    VERDICT item 5): real pipelines don't batch-load a finished
    directory — new ``.jsonl.zst`` / ``.arrow`` shards keep landing.

    ``binaryFile`` readStream tails ``source_dir`` at file granularity;
    ``decode`` is the SAME executor-side decoder the batch readers use
    (``sources.decode_jsonl_compressed_content`` /
    ``decode_arrow_ipc_content``, partially applied — mapInPandas works
    identically on streaming frames), so batch and streamed ingests of
    one corpus are value-identical by construction (the oracle for the
    registry entries ``streaming_arrow_ingest`` /
    ``streaming_zst_ingest``). Each micro-batch lands as ONE atomic
    upsert commit (foreachBatch → ``TableStore.append_dataframe``),
    keeping the corrupt-quarantine contract: rows whose
    ``bad_record_col`` is set are split out and written under
    ``quarantine_dir/batch=<id>`` with overwrite mode. If the decode
    carries ``source_path_col`` (pass ``path_col=`` to the decoder),
    quarantine records keep it as ``source_path`` — corrupt lines
    attribute to the shard that produced them — and it is dropped from
    the good rows before the table commit.

    Replay idempotency — EXACTLY-ONCE within a checkpoint's lifetime
    (r10): each batch commit is stamped ``<stream_id>:<batch_id>``
    (sidecar atomic with the data — ``TableStore.append_dataframe``)
    and a re-delivered batch is SKIPPED, so a crash between sink and
    checkpoint can no longer produce a duplicate commit — concurrent
    writers' interleaved updates survive the replay (the r9 ADVICE
    hazard is closed). The quarantine stays batch-id-keyed overwrite
    (idempotent by construction). ``stream_id`` defaults to the
    checkpoint's incarnation identity (see ``_default_stream_id`` —
    a re-created checkpoint gets a fresh one); pin it explicitly to
    extend the skip guarantee across checkpoint re-creations ONLY if
    the source re-lists batches deterministically (see the module
    docstring for the horizon caveat)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(source_dir)
    )
    rows = decode(files)
    sid = stream_id or _default_stream_id(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from opentick_spark.sources import split_corrupt

        marker = f"{sid}:{batch_id}"
        if store.has_applied_marker(marker):
            return  # re-delivered batch: already committed atomically
        has_path = source_path_col in batch_df.columns
        good, bad = split_corrupt(
            batch_df,
            bad_record_col,
            bad_keep_cols=(source_path_col,) if has_path else (),
        )
        if quarantine_dir is not None and bad_record_col in batch_df.columns:
            sel = [F.col(bad_record_col).alias("raw_line")]
            if has_path:
                sel.append(F.col(source_path_col).alias("source_path"))
            bad.select(*sel).write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch={batch_id}"
            )
        if has_path:
            good = good.drop(source_path_col)
        if transform is not None:
            good = transform(good)
        if not good.isEmpty():
            store.append_dataframe(good, applied_marker=marker)

    writer = rows.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
):
    """Watermarked window counts per event_type over the events stream
    (ts arrives as epoch-nanos long → µs timestamp for the window
    machinery). Tumbling by default; ``slide`` makes the windows hop —
    each event lands in window/slide windows, expanded JVM-side inside
    the same stateful aggregation (state scales with open windows ×
    keys). Writes a complete-mode memory sink named ``sink_table``."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    agg = (
        # integer div, NOT /1000: float division routes the nano long
        # through double and loses precision above 2^53 (~12% of values
        # drift 1µs, landing boundary rows in the wrong window)
        stream.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ts", watermark)
        .groupBy(
            (
                F.window("ts_ts", window, slide)
                if slide
                else F.window("ts_ts", window)
            ).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ivf_append(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    stream_id: str | None = None,
):
    """Continuous ANN index maintenance (r10): tail a landing directory
    of embedding shards (parquet) and fold each micro-batch into a
    persisted IVF index (``operators.similarity.build_ivf_index``
    layout) via ``ivf_index_append`` — routing is one broadcast pass
    over just the delta, and the parquet append touches only the
    affected centroid-list partitions. This is how a 100 TB vector
    corpus stays queryable while it grows: the index never rebuilds on
    ingest (periodic ``build_ivf_index`` handles centroid drift, like
    segment-merge maintenance in a serving ANN stack), and unprobed
    list directories remain planning-time-pruned for readers
    throughout.

    Replay guard (EXACTLY-ONCE since r11): the IVF lists are plain
    parquet (no PK resolution), so a re-delivered batch would DUPLICATE
    vectors. Each batch is keyed by a marker file (md5 of
    ``<stream_id>:<batch_id>`` — filename-safe everywhere) under
    ``<index>/_markers`` and published through
    ``ivf_index_append(marker_file=...)``'s staged protocol: the routed
    delta is staged under ``<index>/_staged/<marker>``, hard-linked
    into the list partitions under deterministic replay-stable names,
    and the marker lands LAST via atomic rename — a crash at ANY point
    in the stage→link→marker sequence replays to the same final file
    set, never a duplicate (the former append→marker window is closed).

    WARNING — markers key DELIVERY identity, not content: batch k means
    "whatever the checkpoint assigned to trigger k". Within ONE
    checkpoint that mapping is stable (Spark's replay contract). If you
    PIN ``stream_id`` and later re-create the checkpoint, the new
    incarnation may assign different files to the same batch ids, and a
    marker hit would then SKIP data that was never ingested. Leave
    ``stream_id`` defaulted (checkpoint-derived) unless your landing
    directory is append-only and listed deterministically. Returns the
    StreamingQuery."""
    import hashlib
    import os

    from opentick_spark.fsutil import require_local_path
    from opentick_spark.operators.similarity import ivf_index_append

    # the marker/staged lifecycle is a documented LOCAL design — reject
    # URIs before os.makedirs creates a literal "hdfs:" directory and
    # every marker probe answers "nothing there" (r14, VERDICT r13
    # item 4; the r13 fence sweep's silent-state lesson)
    require_local_path(index_path, "stream_ivf_append index_path")
    sid = stream_id or _default_stream_id(checkpoint_dir)
    marker_dir = os.path.join(index_path, "_markers")
    os.makedirs(marker_dir, exist_ok=True)
    # startup sweep (r11 review): GC staging left by a crash in the
    # marker-publish→cleanup window. A published batch is never
    # re-delivered (the checkpoint advanced), so nothing downstream
    # would ever reclaim these otherwise; the staged dir name IS the
    # marker name, making the check one listdir + exists each.
    import shutil

    staged_root = os.path.join(index_path, "_staged")
    if os.path.isdir(staged_root):
        for entry in os.listdir(staged_root):
            if os.path.exists(os.path.join(marker_dir, entry)):
                shutil.rmtree(
                    os.path.join(staged_root, entry), ignore_errors=True
                )
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(
            marker_dir,
            hashlib.md5(f"{sid}:{batch_id}".encode()).hexdigest(),
        )
        if os.path.exists(marker):
            # re-delivered batch: vectors already in the lists. GC any
            # staging a crash left in the publish→cleanup window (the
            # pre-check would otherwise shadow ivf_index_append's own
            # marker-exists cleanup forever — r11 review)
            import shutil

            shutil.rmtree(
                os.path.join(
                    index_path, "_staged", os.path.basename(marker)
                ),
                ignore_errors=True,
            )
            return
        if batch_df.isEmpty():
            # nothing to stage: the marker alone records the delivery
            tmp = marker + ".tmp"
            with open(tmp, "w"):
                pass
            os.replace(tmp, marker)
            return
        # staged exactly-once publish; the marker is written LAST by
        # the append itself (see ivf_index_append marker_file protocol)
        ivf_index_append(
            spark,
            batch_df,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            marker_file=marker,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    key_cols: list[str],
):
    """Streaming deduplication: each key is emitted exactly once across
    all micro-batches (state = seen keys) — the exactly-once ingest
    guard for at-least-once sources. Finite-input test shape keeps full
    key state; production should bound state with
    ``dropDuplicatesWithinWatermark`` once a delay bound is known.
    Append-mode memory sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    deduped = stream.dropDuplicates(key_cols)
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream_within_watermark(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    key_cols: list[str],
    watermark: str = "30 days",
):
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts a key's state once the event-time watermark passes it, so
    state size is delivery-delay-bounded instead of growing with every
    key ever seen — the 100 TB-stream counterpart of ``dedup_stream``.
    Duplicates arriving within ``watermark`` of the first occurrence are
    dropped (the at-least-once redelivery contract); the finite test
    input redelivers everything well inside the bound, so the sink must
    equal a global dedup. ts arrives as epoch-nanos long → µs timestamp
    for the watermark clock."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    deduped = (
        stream.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("ts_ts")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_join(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    join_window: str = "7 days",
    watermark: str = "30 days",
):
    """Stream-stream inner join with an event-time bound: purchases
    matched to the same user's signups within ``join_window`` AFTER the
    signup. Watermarks on both sides bound the join state (signups older
    than watermark+window are evicted); the time-range condition is what
    lets Spark prune state at all — an unbounded-time stream-stream join
    would grow state forever. Append-mode memory sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    s = (
        stream.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), ts.alias("s_ts"))
        .withWatermark("s_ts", watermark)
    )
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), ts.alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    joined = p.join(
        s,
        F.expr(
            f"s_user = p_user AND p_ts >= s_ts "
            f"AND p_ts < s_ts + INTERVAL {join_window}"
        ),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    gap: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming sessionization: ``F.session_window`` merges events per
    user whose gaps stay under ``gap`` — the built-in stateful session
    operator (state = open sessions per key, closed by the watermark).
    Complete-mode memory sink for deterministic comparison on finite
    input."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    agg = (
        stream.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ts", watermark)
        .groupBy(F.session_window("ts_ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ohlcv_bars(
    spark: SparkSession,
    events_dir: str,
    schema,
    sink_table: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Live tick→bar rollup: the streaming twin of
    ``operators/timeseries.ohlcv_bars`` (the reference pre-aggregates bar
    tables offline; here the bars maintain themselves as ticks land).
    min_by/max_by are declarative aggregates, so open/close run in the
    same windowed state store as high/low/volume — one stateful operator,
    state bounded by (#keys × #open-windows) with the watermark closing
    windows. Complete-mode memory sink for deterministic comparison on
    finite input."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    agg = (
        stream.filter(F.col("event_type") == "purchase")
        .withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", window).alias("win"), F.col("user_id"))
        .agg(
            # order open/close by the raw ns-long ts, not the µs-truncated
            # event-time column — exact parity with the batch rollup even
            # if two ticks ever share a µs
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("value").alias("volume"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    spark: SparkSession,
    events_dir: str,
    schema,
    static_dim: DataFrame,
    sink_table: str,
    checkpoint_dir: str,
    on: str = "user_id",
):
    """Stream-static broadcast enrichment: each micro-batch joins the
    event stream against a static dimension — stateless (no watermark,
    no state store), the dimension is broadcast per batch, append-mode
    sink. The everyday "attach reference data to a firehose" operator;
    at scale the stream side never shuffles."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_dir)
    )
    stream = _normalize_event_times(stream)
    enriched = stream.join(F.broadcast(static_dim), on, "left")
    return (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
