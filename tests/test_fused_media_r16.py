"""r16 fused-media parity: the gen→decode Python-stage fusions
(mjpg_frame_stats, _clip_hash_frames) must produce EXACTLY the rows the
composed gen → operator pipelines produce — same payload bytes in, same
decode code per payload (the shared multimodal.payload_frame_*_rows
cores), so equality is exact, floats included."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pytest  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

import opentick_spark.operators.multimodal as M  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from opentick_spark.session import get_spark

    return get_spark(app_name="test_fused_media_r16")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mjpg_fused_matches_composite(spark):
    """Fused registry row == composed gen → video_frame_stats → select
    (bit-exact: identical payload bytes, identical per-payload decode)."""
    from opentick_spark.workload.llm import (
        _doc_ids,
        _mjpg_doc_payload,
        mjpg_frame_stats,
    )

    fused = mjpg_frame_stats(spark, SF_DIR)

    docs = _doc_ids(spark, SF_DIR)

    def gen(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        _mjpg_doc_payload(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    avis = docs.mapInPandas(gen, "doc_id long, payload binary")
    composed = M.video_frame_stats(avis).select(
        "id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.round("mean_pixel", 6).alias("mean_pixel"),
        F.round("std_pixel", 6).alias("std_pixel"),
    )
    assert fused.schema == composed.schema
    f_rows = _rows(fused)
    assert f_rows == _rows(composed)
    assert len(f_rows) > 0


def test_clip_hash_frames_fused_matches_composite(spark):
    """_clip_hash_frames == video_frame_hashes(_clip_corpus(...))
    modulo the id column name (the fused frame uses the operator's
    output name directly)."""
    from opentick_spark.workload.llm import _clip_corpus, _clip_hash_frames

    fused = _clip_hash_frames(spark, SF_DIR)
    composed = M.video_frame_hashes(_clip_corpus(spark, SF_DIR))
    assert [f.name for f in fused.schema.fields] == [
        f.name for f in composed.schema.fields
    ]
    f_rows = _rows(fused)
    assert f_rows == _rows(composed)
    assert len(f_rows) > 0
