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
    # r15 (ADVICE r14): colon-bearing LOCAL names are legal on Linux —
    # the guard is a remote-scheme ALLOWLIST now, not any-scheme; a
    # first segment that merely looks scheme-ish passes through (os.*
    # treats it as a plain directory name, which is correct local
    # semantics)
    assert require_local_path("data:v2/shard", "x") == "data:v2/shard"
    assert require_local_path("C:\\models\\x", "x") == "C:\\models\\x"
    # ...but known remote schemes still raise in any case form
    with pytest.raises(ValueError, match="plain local filesystem path"):
        require_local_path("HDFS://nn/warehouse", "x")
    with pytest.raises(ValueError, match="plain local filesystem path"):
        require_local_path("abfss://c@acct/x", "x")
