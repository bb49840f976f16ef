"""r14 (VERDICT r13 item 4): the deliberately-LOCAL os/open() designs
must reject scheme-qualified URIs LOUDLY instead of relying on docs —
the r13 fence-class sweep's lesson is that the silent failure mode
(os.path probing a URI answers "nothing there", streaming/neardup
fabricated empty state) is the dangerous one. A documented-LOCAL
design pointed at hdfs:// today must raise, not quietly create a
relative directory literally named "hdfs:"."""

import pytest

URIS = ["hdfs://nn:8020/warehouse", "s3a://bucket/ivf", "file:///tmp/x",
        # Hadoop Path accepts the one-slash URI form too (r14 review)
        "file:/tmp/x", "hdfs:/nn/warehouse"]


@pytest.mark.parametrize("uri", URIS)
def test_catalog_warehouse_rejects_uris(uri):
    from opentick_spark.catalog import Catalog

    with pytest.raises(ValueError, match="plain local filesystem path"):
        Catalog(uri)


@pytest.mark.parametrize("uri", URIS)
def test_ivf_index_append_rejects_uris(spark, uri, tmp_path):
    from opentick_spark.operators.similarity import ivf_index_append

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="plain local filesystem path"):
        ivf_index_append(spark, vecs, uri)
    # a URI marker_file on a local index path must be rejected too
    with pytest.raises(ValueError, match="plain local filesystem path"):
        ivf_index_append(
            spark, vecs, str(tmp_path / "idx"), marker_file=uri + "/m1"
        )


@pytest.mark.parametrize("uri", URIS)
def test_stream_ivf_append_rejects_uris(spark, uri, tmp_path):
    from opentick_spark.streaming.ingest import stream_ivf_append

    with pytest.raises(ValueError, match="plain local filesystem path"):
        stream_ivf_append(
            spark,
            source_dir=str(tmp_path / "landing"),
            source_schema="vec_id long, embedding array<double>",
            index_path=uri,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )


def test_plain_local_paths_still_accepted(tmp_path):
    from opentick_spark.catalog import Catalog
    from opentick_spark.fsutil import require_local_path

    # relative and absolute plain paths pass through unchanged
    assert require_local_path(str(tmp_path), "x") == str(tmp_path)
    assert require_local_path("rel/dir", "x") == "rel/dir"
    Catalog(str(tmp_path / "wh"))  # constructs fine
