"""Streaming near-duplicate detection: MinHash-LSH against everything
seen so far.

Each micro-batch of documents is checked for near-duplicates against
BOTH the accumulated corpus and itself, via the same banded-minhash
bucket join as the batch operator (`operators/dedup.minhash_lsh_pairs`
— the band/bucket code is shared). A match emits
``(id, dup_of, est_jac)`` where ``est_jac`` is the fraction of equal
minhash components — the unbiased Jaccard estimator; the streaming
variant scores on signatures alone so state stays signature-sized
(k longs per doc), never text-sized.

State layout (under ``state_dir``): ``sigs/batch-<id>/`` (id, sig) and
``buckets/batch-<id>/`` (id, band, bucket) parquet, written with
overwrite per batch id so a replayed micro-batch is idempotent;
``dups/batch-<id>/`` holds that batch's detections. Orientation: a new
document reports every earlier near-dup (anything in state, plus
lower-id documents of its own batch).

Scale: per-batch cost is O(batch·k) signature work + a bucket join
whose shuffle carries collisions only; the state tables grow with the
corpus but are read via one pruned parquet scan per batch. At very
large state, compact the bucket table on (band, bucket) so each batch
joins against sorted bucket runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentick_spark.operators.dedup import band_buckets, minhash_signatures

_SIG_SCHEMA = "id long, sig array<bigint>"
_BUCKET_SCHEMA = "id long, band int, bucket long"


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # Hadoop-FS probe, not os.path (r13, the r12-ADVICE fence class):
    # the sink writes state via Spark to ANY filesystem; an os.path
    # check answers "missing" for non-local URIs, which would SILENTLY
    # fabricate empty prior state — a dedup detector that forgets every
    # previously-seen document is the worst failure mode this stream has
    from opentick_spark.fsutil import fs_has_child_with_prefix

    if fs_has_child_with_prefix(spark, path, "batch-"):
        return spark.read.schema(schema).parquet(f"{path}/batch-*")
    return spark.createDataFrame([], schema)


def stream_neardup_lsh(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 96,
    bands: int = 24,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Start the streaming detector; returns the StreamingQuery.
    Read detections afterwards with :func:`neardup_results`."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sigs = minhash_signatures(
            batch_df, id_col, text_col, n=n, num_hashes=num_hashes
        ).localCheckpoint(eager=True)
        buckets = band_buckets(sigs, num_hashes, bands)

        old_sigs = _read_state(spark, f"{state_dir}/sigs", _SIG_SCHEMA)
        old_buckets = _read_state(
            spark, f"{state_dir}/buckets", _BUCKET_SCHEMA
        )
        all_buckets = old_buckets.unionByName(
            buckets.withColumn("id", F.col("id").cast("long"))
        )
        all_sigs = old_sigs.unionByName(
            sigs.select(F.col("id").cast("long"), "sig")
        )

        # a new doc pairs with anything in state, or a LOWER-id doc of
        # its own batch (old ids are "earlier" by arrival; in-batch ties
        # break by id)
        new_ids = sigs.select(F.col("id").cast("long").alias("id"))
        cand = (
            buckets.alias("x")
            .join(
                all_buckets.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.id") != F.col("y.id")),
            )
            .join(
                new_ids.alias("nx"), F.col("x.id") == F.col("nx.id"), "left_semi"
            )
            .select(F.col("x.id").alias("id"), F.col("y.id").alias("dup_of"))
            .distinct()
        )
        # drop new-vs-new pairs where the partner is NOT earlier
        newer = new_ids.withColumnRenamed("id", "dup_of")
        cand = cand.join(newer, "dup_of", "left_anti").unionByName(
            cand.join(newer, "dup_of", "left_semi").filter(
                F.col("dup_of") < F.col("id")
            )
        )
        sx = all_sigs.withColumnsRenamed({"id": "id", "sig": "__sx"})
        sy = all_sigs.withColumnsRenamed({"id": "dup_of", "sig": "__sy"})
        dups = (
            cand.join(sx, "id")
            .join(sy, "dup_of")
            .withColumn(
                "est_jac",
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("__sx"), F.col("__sy"), lambda a, b: a == b
                        ),
                        lambda x: x,
                    )
                ).cast("double")
                / F.lit(num_hashes),
            )
            .filter(F.col("est_jac") >= threshold)
            .select("id", "dup_of", F.round("est_jac", 6).alias("est_jac"))
        )
        # batch-id-keyed overwrites: replaying a micro-batch rewrites the
        # same paths instead of duplicating state
        dups.write.mode("overwrite").parquet(
            f"{state_dir}/dups/batch-{batch_id:09d}"
        )
        sigs.select(F.col("id").cast("long"), "sig").write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/sigs/batch-{batch_id:09d}")
        buckets.write.mode("overwrite").parquet(
            f"{state_dir}/buckets/batch-{batch_id:09d}"
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardup_results(spark: SparkSession, state_dir: str) -> DataFrame:
    """All detections so far: (id, dup_of, est_jac)."""
    return _read_state(
        spark, f"{state_dir}/dups", "id long, dup_of long, est_jac double"
    )
