"""Optional-dependency real codec path (multimodal decode): when Pillow
is importable the ``decode="real"`` kernel must do a genuine image
decode; when it is not, it must raise NotImplementedError (the
documented stub contract). Exactly one branch runs per environment —
the other is skipped, never silently passed."""

import pytest

from opentick_spark.operators import multimodal as M

try:
    import PIL  # noqa: F401
    from PIL import Image

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


@pytest.mark.skipif(HAS_PIL, reason="Pillow present: the real path runs")
def test_real_decode_raises_without_codec():
    with pytest.raises(NotImplementedError, match="codec library"):
        M._real_decode_features(b"\x89PNG not really")


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_decode_with_generated_png(spark):
    from io import BytesIO

    import pyspark.sql.functions as F

    def png_bytes(shade: int) -> bytes:
        img = Image.new("L", (8, 8), color=shade)
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png_bytes(0)), (2, png_bytes(255))], "doc_id long, payload binary"
    )
    rows = {
        r["id"]: r["features"]
        for r in M.extract_features(df, decode="real").collect()
    }
    # uniform shade 0 → all mass in bucket 0; shade 255 → last bucket
    assert rows[1][0] == pytest.approx(1.0)
    assert rows[2][M.FEATURE_DIM - 1] == pytest.approx(1.0)
    for feats in rows.values():
        assert len(feats) == M.FEATURE_DIM
        assert sum(feats) == pytest.approx(1.0)
