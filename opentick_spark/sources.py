"""External source formats for corpus ingestion: JSONL and CSV.

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


def _with_schema(reader, schema, bad_record_col):
    if schema == "infer":
        return reader
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if bad_record_col:
        schema = schema.add(T.StructField(bad_record_col, T.StringType(), True))
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
    df: DataFrame, bad_record_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split of a PERMISSIVE read: good rows drop the
    quarantine column, bad rows keep only it (for a reject-file sink)."""
    if bad_record_col not in df.columns:
        return df, df.limit(0).select()
    # caching contract of PERMISSIVE+corrupt-column reads: Spark refuses
    # a filter on the corrupt column alone unless the frame is cached
    # (it is populated during parsing) — a localCheckpoint makes both
    # halves read the same parsed pass
    df = df.localCheckpoint(eager=False)
    good = df.filter(F.col(bad_record_col).isNull()).drop(bad_record_col)
    bad = df.filter(F.col(bad_record_col).isNotNull()).select(bad_record_col)
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
