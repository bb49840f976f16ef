"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: binary payload columns,
metadata structs, Arrow-batched ``mapInPandas`` pipelines with explicit
output schemas, and partition-count-preserving batch shapes. Three
formats are STDLIB-REAL — WAV (``wave``: true PCM decode, r5), PNG
(``zlib`` IDAT inflate + scanline unfiltering, r6), and AVI video
(RIFF chunk-tree parse with raw-DIB frames decoding to true pixels,
r6) — powering genuine metadata, feature, windowing and
perceptual-dedup operators with zero external dependencies. r7 adds a
from-scratch baseline-JPEG codec (SOF0 sequential: Annex K tables,
Huffman + dequant + vectorized IDCT, 4:4:4/4:2:0, DRI/RSTn), so
MJPG-in-AVI frames now decode to TRUE pixels too. Formats that
genuinely need codec libraries this environment does not ship
(H.264, progressive/arithmetic JPEG) keep the stub contract:
``decode=\"fake\"`` (default) derives deterministic features from the
bytes themselves; ``decode=\"real\"`` decodes PNG/JPEG for real and
raises NotImplementedError for the rest where a codec (ffmpeg) would
be called; unsupported AVI streams stay container-real with NULL
pixel stats.

At 100 TB the pattern matters more than the kernel: binaries stay in
columnar storage next to their metadata, pipelines stream Arrow batches
through Python workers without collecting, and feature extraction is a
narrow map (no shuffle) that preserves the table's partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "image"
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    In production the payload arrives from storage; here it is derived
    from the text bytes so the pipeline is runnable and deterministic.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(payload).cast("long")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        n.alias("n_bytes"),
        # deterministic fake dimensions derived from content size
        (F.pmod(n, F.lit(640)) + 16).cast("int").alias("width"),
        (F.pmod(n * 7, F.lit(480)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(n, F.lit(300)) + 1).cast("int").alias("n_frames"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a normalized
    histogram of byte values over FEATURE_DIM buckets."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = max(1, len(payload))
    return [c / total for c in counts]


def _real_decode_features(payload: bytes) -> list[float]:
    """Real image decode: grayscale luminance histogram over
    FEATURE_DIM buckets. PNG payloads decode with the module's own
    stdlib codec (``_decode_png`` — zlib inflate + unfilter, no
    external dependency; r6); baseline JPEG likewise (``_decode_jpeg``,
    r7); other formats fall back to Pillow when importable and raise
    NotImplementedError (not ImportError) when the codec library is
    absent, so callers see the contract the stub documents."""
    import numpy as np

    m = None
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        m = _decode_png(payload)
    elif payload[:2] == b"\xff\xd8":
        m = _decode_jpeg(payload)
    if m is not None:
        px = m["pixels"].astype(np.float64)
        # luminance = channel mean (alpha included as-is for GA/RGBA
        # — a histogram feature, not a compositing operation)
        luma = px.mean(axis=2).astype(np.int64).reshape(-1)
        counts = np.bincount(
            np.clip(luma * FEATURE_DIM // 256, 0, FEATURE_DIM - 1),
            minlength=FEATURE_DIM,
        )
        total = max(1, m["width"] * m["height"])
        return [c / total for c in counts.tolist()]
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real media decode of non-PNG formats requires a codec "
            "library (Pillow) that is not installed; PNG decodes with "
            "the stdlib codec, or use decode='fake' for the stub"
        ) from e
    img = Image.open(BytesIO(payload)).convert("L")
    counts = [0] * FEATURE_DIM
    for px in img.getdata():
        counts[(px * FEATURE_DIM) // 256] += 1
    total = max(1, img.width * img.height)
    return [c / total for c in counts]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: str = "fake",
    batch_note: str = "arrow",
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Output schema: (id, n_bytes, features array<double>[FEATURE_DIM]).
    ``decode=\"real\"`` runs a genuine image decode when Pillow is
    importable on the workers (optional dependency) and raises
    NotImplementedError where it is not — this sandbox ships no codecs,
    so the deterministic ``\"fake\"`` stub is the tested default.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField(
                "features", T.ArrayType(T.DoubleType(), False), False
            ),
        ]
    )
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    kernel = _real_decode_features if decode == "real" else _fake_decode_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(kernel),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def audio_windows(
    df: DataFrame,
    meta_col: str = "media_meta",
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_seconds: int = 1,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Fixed-duration audio windowing WITHOUT decode: for PCM-shaped
    payloads the window byte width is sample_rate × bytes_per_sample ×
    window_seconds, so chunk boundaries are pure integer math on the
    metadata and each chunk is a JVM-side binary slice
    (``Column.substr`` — no Python, no codec). One row per window with
    the actual byte slice; the decode/resample of a chunk is the stubbed
    kernel, exactly like image features. Narrow plan: sequence+explode,
    no shuffle, partitioning preserved."""
    if bytes_per_sample <= 0 or window_seconds <= 0:
        raise ValueError(
            f"bytes_per_sample and window_seconds must be positive, got "
            f"{bytes_per_sample}, {window_seconds}"
        )
    sr = F.col(meta_col).getField("sample_rate")
    win_bytes = (sr * F.lit(bytes_per_sample * window_seconds)).cast("long")
    n = F.length(F.col(payload_col)).cast("long")
    # guard sample_rate <= 0 / NULL: n/win_bytes would double-divide to
    # Infinity and ceil().cast('long') saturates to Long.MAX, blowing up
    # sequence() at runtime — drop such rows before window math
    df = df.filter(sr.isNotNull() & (sr > 0))
    n_win = F.ceil(n / win_bytes).cast("long")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("__p"),
        n.alias("__n"),
        win_bytes.alias("__w"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.greatest(n_win - 1, F.lit(0)))
        ).alias("win_idx"),
    )
    start = F.col("win_idx") * F.col("__w")
    clen = F.least(F.col("__w"), F.col("__n") - start)
    return (
        base.filter(F.col("__n") > 0)
        .select(
            "id",
            "win_idx",
            start.alias("start_byte"),
            clen.alias("n_bytes"),
            F.col("__p").substr(
                (start + 1).cast("int"), clen.cast("int")
            ).alias("chunk"),
        )
    )


def frame_sample(
    df: DataFrame,
    meta_col: str = "media_meta",
    id_col: str = "doc_id",
    every_n: int = 30,
) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    frame index — pure built-ins (sequence+explode), no decode needed to
    *plan* the sampling; the decode of each sampled frame is the stubbed
    kernel above."""
    nf = F.col(meta_col).getField("n_frames")
    idx = F.sequence(F.lit(0), nf - 1, F.lit(every_n))
    return df.select(
        F.col(id_col).alias("id"), F.explode(idx).alias("frame_idx")
    )


# ---------------------------------------------------------------- real WAV
# A genuinely REAL audio decode path with zero external dependencies:
# RIFF/WAV is parsed by the stdlib ``wave`` module (always present), PCM
# samples by numpy. This upgrades the "decode is stubbed" posture for
# the one codec this sandbox can actually run end-to-end — the Pillow
# hook (extract_features decode="real") remains the pattern for codecs
# that need optional libraries.

WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_width", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("data_offset", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)


def _parse_wav_header(payload: bytes) -> dict | None:
    """Parse one RIFF/WAV payload with the stdlib ``wave`` reader and
    locate the PCM byte range (the reader consumes chunks up to the
    ``data`` chunk, so ``BytesIO.tell`` after open IS the data offset).
    Returns None for non-WAV/corrupt payloads (callers surface NULLs —
    quarantine semantics, matching the corrupt-line posture of the
    corpus readers)."""
    import io
    import wave

    try:
        bio = io.BytesIO(payload)
        with wave.open(bio, "rb") as w:
            params = w.getparams()
            data_offset = bio.tell()
        return {
            "sample_rate": params.framerate,
            "n_channels": params.nchannels,
            "sample_width": params.sampwidth,
            "n_frames": params.nframes,
            "data_offset": data_offset,
            "duration_s": params.nframes / params.framerate
            if params.framerate
            else None,
        }
    except Exception:
        return None


def wav_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL WAV header decode over Arrow batches: one row per payload
    with the header-derived metadata (sample rate, channels, width,
    frame count, PCM data offset, duration). Non-WAV payloads yield
    NULL fields rather than failing the batch. Narrow plan — no
    shuffle, partitioning preserved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_parse_wav_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "sample_rate": [
                        m and m["sample_rate"] for m in metas
                    ],
                    "n_channels": [m and m["n_channels"] for m in metas],
                    "sample_width": [m and m["sample_width"] for m in metas],
                    "n_frames": [m and m["n_frames"] for m in metas],
                    "data_offset": [m and m["data_offset"] for m in metas],
                    "duration_s": [
                        m["duration_s"] if m else None for m in metas
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, WAV_META_SCHEMA
    )


def wav_audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_seconds: int = 1,
) -> DataFrame:
    """``audio_windows`` for REAL RIFF/WAV payloads: the header is
    decoded (Python, Arrow-batched, bytes-cheap — header only), then
    window boundaries are integer math on TRUE PCM frames and each
    chunk is a JVM-side ``substr`` slice of the actual sample data,
    skipping the header. Window byte width = sample_rate × sample_width
    × n_channels × window_seconds; the final window is the true
    remainder. Output: (id, win_idx, start_frame, n_frames, chunk)."""
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    meta = wav_metadata(df, id_col, payload_col)
    joined = df.select(
        F.col(id_col).alias("id"), F.col(payload_col).alias("__p")
    ).join(meta.filter(F.col("sample_rate").isNotNull()), "id")
    frame_bytes = (F.col("sample_width") * F.col("n_channels")).cast("long")
    win_frames = (F.col("sample_rate").cast("long") * F.lit(window_seconds))
    n_win = F.ceil(F.col("n_frames") / win_frames).cast("long")
    base = joined.filter(F.col("n_frames") > 0).select(
        "id",
        "__p",
        "data_offset",
        frame_bytes.alias("__fb"),
        win_frames.alias("__wf"),
        F.col("n_frames").alias("__nf"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.greatest(n_win - 1, F.lit(0)))
        ).alias("win_idx"),
    )
    start_frame = F.col("win_idx") * F.col("__wf")
    nf = F.least(F.col("__wf"), F.col("__nf") - start_frame)
    return base.select(
        "id",
        "win_idx",
        start_frame.alias("start_frame"),
        nf.alias("n_frames"),
        F.col("__p")
        .substr(
            (F.col("data_offset") + start_frame * F.col("__fb") + 1).cast(
                "int"
            ),
            (nf * F.col("__fb")).cast("int"),
        )
        .alias("chunk"),
    )


WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

_WIDTH_DTYPE = {1: "u1", 2: "<i2", 4: "<i4"}


def wav_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL PCM feature extraction: decode each WAV payload's samples
    (numpy ``frombuffer`` on the data chunk — vectorized, no per-sample
    Python) and emit normalized RMS, peak, zero-crossing count, and
    duration. Channels are averaged. 8-bit WAV is unsigned-offset per
    the spec (centered at 128); 16/32-bit are signed little-endian.
    Non-WAV payloads yield NULL features."""
    import numpy as np

    def one(payload: bytes):
        m = _parse_wav_header(payload)
        if m is None or m["sample_width"] not in _WIDTH_DTYPE:
            return None
        fb = m["sample_width"] * m["n_channels"]
        data = payload[m["data_offset"] : m["data_offset"] + m["n_frames"] * fb]
        # truncated payload quarantine: the header's n_frames may promise
        # more bytes than the payload carries; clamp to whole frames so
        # frombuffer (itemsize) and reshape (n_channels) never raise
        # inside the executor — a corrupt WAV yields NULLs, not a job kill
        if len(data) % fb:
            data = data[: len(data) - len(data) % fb]
        x = np.frombuffer(data, dtype=_WIDTH_DTYPE[m["sample_width"]]).astype(
            np.float64
        )
        if m["sample_width"] == 1:
            x = x - 128.0
            scale = 128.0
        else:
            scale = float(2 ** (8 * m["sample_width"] - 1))
        if m["n_channels"] > 1:
            x = x.reshape(-1, m["n_channels"]).mean(axis=1)
        x = x / scale
        if x.size == 0:
            return (0.0, 0.0, 0, m["duration_s"])
        rms = float(np.sqrt(np.mean(x * x)))
        peak = float(np.max(np.abs(x)))
        zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
        return (rms, peak, zc, m["duration_s"])

    def safe_one(payload: bytes):
        try:
            return one(payload)
        except Exception:
            return None  # NULL quarantine for any malformed payload

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [safe_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "rms": [f and f[0] for f in feats],
                    "peak": [f and f[1] for f in feats],
                    "zero_crossings": [f[2] if f else None for f in feats],
                    "duration_s": [f[3] if f else None for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, WAV_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# PNG: stdlib-real image decode (r6, per the public PNG spec — RFC 2083 /
# W3C PNG second edition: chunk stream, IHDR fields, DEFLATE IDAT, and
# the five type-0 scanline filters) — the image counterpart of the WAV
# work. PNG's compression is zlib DEFLATE and its scanline filters are
# pure arithmetic, so a genuine decode needs NOTHING beyond the stdlib:
# parse the chunk stream, inflate IDAT with ``zlib``, unfilter scanlines
# (all five filter types), and read true pixels. No Pillow, no fake
# kernel. Mirrors the reference's posture of typed media columns with
# real metadata (reference stores media as opaque blobs; decode parity
# is an extension surface here).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit only; palette/interlace are
# quarantined as unsupported, like non-PCM WAV)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _encode_png(arr, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG ENCODER for synthesis/tests: 8-bit gray
    (h, w), gray+alpha (h, w, 2), RGB (h, w, 3) or RGBA (h, w, 4),
    non-interlaced, one IDAT. ``filter_type`` applies the same PNG
    filter to every scanline (0..4) — exercising the decoder's
    unfilter paths with a genuine round-trip."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = a[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            filt = line - left
        elif filter_type == 2:  # Up
            filt = line - prev
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            filt = line - (left + prev) // 2
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = line - pred
        else:
            raise ValueError(f"filter_type {filter_type}")
        raw.append(filter_type)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = line
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _parse_png_chunks(payload: bytes):
    """Yield (tag, data) over a PNG chunk stream; raises on truncation."""
    import struct

    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        yield tag, data
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


def _decode_png(payload: bytes):
    """Stdlib-real PNG decode: returns dict(width, height, bit_depth,
    color_type, n_channels, pixels: uint8 ndarray (h, w, c)) or None
    for non-PNG / unsupported (palette, interlaced, non-8-bit) /
    corrupt payloads — NULL-quarantine semantics like
    ``_parse_wav_header``. All five scanline filters are implemented;
    Sub is a per-lane cumulative sum, Up is vectorized, Average/Paeth
    walk pixels with lane-vector steps (correctness path — synthetic
    corpora emit filter 0)."""
    import struct
    import zlib

    import numpy as np

    try:
        if not payload.startswith(_PNG_SIG):
            return None
        ihdr = None
        idat = bytearray()
        for tag, data in _parse_png_chunks(payload):
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif tag == b"IDAT":
                idat += data
        if ihdr is None or not idat:
            return None
        w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
        if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
            return None
        c = _PNG_CHANNELS[color_type]
        stride = w * c
        raw = zlib.decompress(bytes(idat))
        if len(raw) != h * (stride + 1):
            return None
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
            ft = row[0]
            line = np.frombuffer(row, dtype=np.uint8, offset=1).copy()
            if ft == 0:
                rec = line
            elif ft == 1:  # Sub: per-lane prefix sum mod 256
                rec = (
                    np.cumsum(line.reshape(w, c), axis=0, dtype=np.int64) % 256
                ).astype(np.uint8).reshape(stride)
            elif ft == 2:  # Up
                rec = line + prev  # uint8 wraps mod 256 natively
            elif ft in (3, 4):  # Average / Paeth: sequential in x
                rec = np.empty(stride, dtype=np.uint8)
                li = line.astype(np.int32).reshape(w, c)
                up = prev.astype(np.int32).reshape(w, c)
                rv = rec.reshape(w, c)
                left = np.zeros(c, dtype=np.int32)
                ul = np.zeros(c, dtype=np.int32)
                for x in range(w):
                    if ft == 3:
                        pred = (left + up[x]) // 2
                    else:
                        p = left + up[x] - ul
                        pa = np.abs(p - left)
                        pb = np.abs(p - up[x])
                        pc = np.abs(p - ul)
                        pred = np.where(
                            (pa <= pb) & (pa <= pc),
                            left,
                            np.where(pb <= pc, up[x], ul),
                        )
                    left = (li[x] + pred) % 256
                    ul = up[x]
                    rv[x] = left
            else:
                return None
            out[y] = rec
            prev = out[y]
        return {
            "width": int(w),
            "height": int(h),
            "bit_depth": int(bit_depth),
            "color_type": int(color_type),
            "n_channels": int(c),
            "pixels": out.reshape(h, w, c),
        }
    except Exception:
        return None


PNG_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("color_type", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def png_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL PNG header decode over Arrow batches (stdlib zlib — no
    codec dependency): dimensions, bit depth, color type, channel
    count. Corrupt/unsupported payloads yield NULLs. Narrow map — no
    shuffle, partitioning preserved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_decode_png(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": [m and m["width"] for m in metas],
                    "height": [m and m["height"] for m in metas],
                    "bit_depth": [m and m["bit_depth"] for m in metas],
                    "color_type": [m and m["color_type"] for m in metas],
                    "n_channels": [m and m["n_channels"] for m in metas],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, PNG_META_SCHEMA
    )


PNG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("std_pixel", T.DoubleType(), True),
        T.StructField("min_pixel", T.IntegerType(), True),
        T.StructField("max_pixel", T.IntegerType(), True),
        T.StructField(
            "channel_means", T.ArrayType(T.DoubleType(), True), True
        ),
    ]
)


def png_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL pixel statistics from genuinely decoded PNGs: inflate IDAT,
    unfilter, then numpy mean/std/min/max over true pixel values plus
    per-channel means — the image analog of ``wav_features``. Corrupt
    or unsupported payloads yield NULL features (quarantine). Narrow
    Arrow map; at 100 TB this runs where the bytes live, no shuffle."""
    import numpy as np

    def one(payload: bytes):
        m = _decode_png(payload)
        if m is None:
            return None
        px = m["pixels"].astype(np.float64)
        return (
            m["width"],
            m["height"],
            m["n_channels"],
            float(px.mean()),
            float(px.std()),
            int(px.min()),
            int(px.max()),
            [float(v) for v in px.mean(axis=(0, 1))],
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": [f and f[0] for f in feats],
                    "height": [f and f[1] for f in feats],
                    "n_channels": [f and f[2] for f in feats],
                    "mean_pixel": [f and f[3] for f in feats],
                    "std_pixel": [f and f[4] for f in feats],
                    "min_pixel": [f[5] if f else None for f in feats],
                    "max_pixel": [f[6] if f else None for f in feats],
                    "channel_means": [f[7] if f else None for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, PNG_FEATURES_SCHEMA
    )


def _dhash(pixels, hash_size: int = 8) -> int:
    """Perceptual difference-hash of a decoded image: grayscale luma,
    downsample to (hash_size, hash_size+1) — exact block mean when the
    dimensions divide, deterministic nearest-neighbor sampling
    otherwise — then one bit per horizontal gradient sign. Invariant to
    uniform brightness shifts (a constant offset cancels in the
    differences), which is what makes it a PERCEPTUAL dedup key rather
    than a byte hash. Returned as a signed 64-bit int (Spark long)."""
    import numpy as np

    px = pixels.astype(np.float64).mean(axis=2)
    h, w = px.shape
    th, tw = hash_size, hash_size + 1
    if h % th == 0 and w % tw == 0:
        small = px.reshape(th, h // th, tw, w // tw).mean(axis=(1, 3))
    else:
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        small = px[np.ix_(ys, xs)]
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual hash per image payload over genuinely decoded pixels
    (stdlib codecs — PNG, and baseline JPEG since r7; no Pillow):
    (id, dhash). Corrupt or unsupported payloads yield NULL
    (quarantine). Narrow Arrow map — the decode+hash runs where the
    bytes live; only the 8-byte hash ever moves, the 100 TB posture
    for image dedup."""

    def one(payload: bytes):
        if payload[:2] == b"\xff\xd8":
            m = _decode_jpeg(payload)
        else:
            m = _decode_png(payload)
        if m is None:
            return None
        return _dhash(m["pixels"], hash_size)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "dhash": [one(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, IMAGE_DHASH_SCHEMA
    )


def image_dedup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """Exact-dHash image dedup: every image joins the group of its
    perceptual hash; keeper = min(id) per group (the same
    keeper-election contract as the text dedup family). Brightness-
    shifted duplicates group together even though their BYTES differ —
    a chunk/byte hash cannot do this. NULL-hash (undecodable) payloads
    are quarantined as their own keeper, never grouped. ONE shuffle on
    the 8-byte hash; for Hamming-radius near-dup at scale, block the
    hash pigeonhole-style like ``dedup.simhash_pairs``."""
    from pyspark.sql import Window

    sigs = image_dhash(df, id_col, payload_col, hash_size)
    keeper = F.min("id").over(Window.partitionBy("dhash"))
    return sigs.select(
        "id",
        F.when(F.col("dhash").isNull(), F.col("id"))
        .otherwise(keeper)
        .alias("keeper"),
    )


def _audio_fingerprint(payload: bytes, n_windows: int = 32) -> int | None:
    """Perceptual fingerprint of a decoded WAV: the sign pattern of the
    energy-envelope derivative — true PCM decode (stdlib ``wave``
    header + numpy), mean |amplitude| per window, one bit per
    adjacent-window comparison. Invariant to uniform GAIN scaling (a
    positive gain scales every window energy equally, so the
    comparisons are unchanged) — the audio analog of ``_dhash``'s
    brightness invariance. Returns a signed 64-bit int (n_windows-1
    meaningful bits) or None for corrupt/unsupported/too-short
    payloads."""
    import numpy as np

    m = _parse_wav_header(payload)
    if m is None or m["sample_width"] not in _WIDTH_DTYPE:
        return None
    fb = m["sample_width"] * m["n_channels"]
    data = payload[m["data_offset"] : m["data_offset"] + m["n_frames"] * fb]
    if len(data) % fb:
        data = data[: len(data) - len(data) % fb]
    x = np.frombuffer(data, dtype=_WIDTH_DTYPE[m["sample_width"]]).astype(
        np.float64
    )
    if m["sample_width"] == 1:
        x = x - 128.0
    if m["n_channels"] > 1:
        x = x.reshape(-1, m["n_channels"]).mean(axis=1)
    w = x.size // n_windows
    if w == 0:
        return None
    env = np.abs(x[: n_windows * w]).reshape(n_windows, w).mean(axis=1)
    bits = env[1:] > env[:-1]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("fp", T.LongType(), True),
    ]
)


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_windows: int = 32,
) -> DataFrame:
    """(id, fp) perceptual audio fingerprints over genuinely decoded
    PCM — narrow Arrow map, NULL quarantine for undecodable payloads;
    only the 8-byte fingerprint ever shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "fp": [
                        _audio_fingerprint(p, n_windows)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


def audio_dedup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_windows: int = 32,
) -> DataFrame:
    """Exact-fingerprint audio dedup with min-id keeper election —
    gain-rescaled duplicates (re-encoded louder/quieter copies) group
    together where byte hashes cannot; corrupt payloads quarantine as
    their own keeper. Completes the perceptual-dedup trilogy: text
    (MinHash shingles), image (``image_dedup_groups``), audio. ONE
    shuffle on the fingerprint."""
    from pyspark.sql import Window

    sigs = audio_fingerprint(df, id_col, payload_col, n_windows)
    keeper = F.min("id").over(Window.partitionBy("fp"))
    return sigs.select(
        "id",
        F.when(F.col("fp").isNull(), F.col("id"))
        .otherwise(keeper)
        .alias("keeper"),
    )


# ---------------------------------------------------------------------------
# AVI: stdlib-real video container parse (r6) — the video leg beside WAV
# and PNG. AVI is RIFF (the same chunk grammar as WAV, per the public
# AVI/RIFF spec: 'hdrl' header list with avih/strh/strf, 'movi' list of
# '00db'/'00dc' frame chunks). For raw-DIB (BI_RGB 24bpp) streams the
# frame payloads ARE uncompressed pixels — bottom-up BGR rows padded to
# 4 bytes — so container parse + frame slicing + pixel statistics are
# fully real with zero codec dependencies. Compressed streams (MJPEG,
# H.264) parse at the container level (offsets/sizes/metadata real) and
# quarantine at the pixel level, the documented stub contract.

_AVI_DIB = 0  # BI_RGB
_AVI_MJPG = 0x47504A4D  # 'MJPG' fourcc as little-endian DWORD


def _encode_avi(frames, fps: int = 10, codec: str = "DIB") -> bytes:
    """Minimal stdlib AVI WRITER for synthesis/tests. ``codec="DIB"``:
    raw 24bpp video ('DIB ' handler, BI_RGB), one '00db' chunk per
    frame, real bottom-up BGR rows with 4-byte padding. ``codec="MJPG"``
    (r7): one '00dc' chunk per frame holding a REAL baseline JPEG from
    ``_encode_jpeg`` — a genuine Motion-JPEG AVI any player can read,
    used to exercise the MJPG decode path end-to-end."""
    import struct

    import numpy as np

    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"codec {codec}")
    mjpg = codec == "MJPG"
    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _c = fr[0].shape
    row = w * 3
    pad = (-row) % 4
    size_image = (row + pad) * h

    def dib(frame) -> bytes:
        # bottom-up, BGR, padded rows
        bgr = frame[::-1, :, ::-1]
        if pad:
            out = bytearray()
            for r in bgr:
                out += r.tobytes() + b"\x00" * pad
            return bytes(out)
        return bgr.tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        b = struct.pack("<4sI", tag, len(data)) + data
        return b + (b"\x00" if len(data) % 2 else b"")

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        size_image * fps,  # dwMaxBytesPerSec
        0,
        0x10,  # AVIF_HASINDEX off, flags minimal
        len(fr),  # dwTotalFrames
        0,
        1,  # dwStreams
        size_image,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids",
        b"MJPG" if mjpg else b"DIB ",
        0,
        0,
        0,
        0,
        1,  # dwScale
        fps,  # dwRate
        0,
        len(fr),
        size_image,
        0,
        -1,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,
        _AVI_MJPG if mjpg else _AVI_DIB,
        size_image, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    if mjpg:
        movi = lst(
            b"movi",
            b"".join(chunk(b"00dc", _encode_jpeg(f, quality=90)) for f in fr),
        )
    else:
        movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in fr))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _parse_avi(payload: bytes):
    """Stdlib-real AVI container parse: walks the RIFF chunk tree,
    reads avih/strf for metadata, and indexes every '00db'/'00dc'
    frame chunk (offset, size) in 'movi'. Returns dict(width, height,
    fps, n_frames, bit_count, compression, frames=[(offset, size)])
    or None for non-AVI/corrupt payloads."""
    import struct

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        meta = {}
        frames = []

        def walk(start: int, end: int) -> None:
            pos = start
            while pos + 8 <= end:
                tag, ln = struct.unpack("<4sI", payload[pos : pos + 8])
                body = pos + 8
                if body + ln > end:
                    raise ValueError("truncated chunk")
                if tag == b"LIST":
                    walk(body + 4, body + ln)
                elif tag == b"avih":
                    a = struct.unpack("<10I", payload[body : body + 40])
                    meta["fps"] = (
                        round(1_000_000 / a[0]) if a[0] else None
                    )
                    meta["n_frames"] = a[4]
                    meta["width"] = a[8]
                    meta["height"] = a[9]
                elif tag == b"strf" and "bit_count" not in meta:
                    b = struct.unpack("<IiiHHI", payload[body : body + 20])
                    meta["bit_count"] = b[4]
                    meta["compression"] = b[5]
                elif tag in (b"00db", b"00dc"):
                    frames.append((body, ln))
                pos = body + ln + (ln % 2)

        walk(12, len(payload))
        if "width" not in meta:
            return None
        meta["frames"] = frames
        return meta
    except Exception:
        return None


def _avi_frame_pixels(payload: bytes, meta: dict, idx: int):
    """TRUE pixels of one frame: raw-DIB ('00db') chunks are sliced,
    un-padded and flipped from bottom-up BGR; MJPG chunks (r7) run
    through the from-scratch baseline-JPEG decoder below — each MJPG
    frame IS a JPEG, conventionally without DHT segments (the Annex K
    tables are implied; ``_decode_jpeg`` installs them). Returns
    (h, w, 3) uint8 RGB or None for codecs that still need a real
    decoder (H.264 etc. — container metadata stays real)."""
    import numpy as np

    if meta.get("compression") == _AVI_MJPG:
        off, ln = meta["frames"][idx]
        d = _decode_jpeg(payload[off : off + ln])
        if d is None:
            return None
        px = d["pixels"]
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        return px
    if meta.get("compression") != _AVI_DIB or meta.get("bit_count") != 24:
        return None
    w, h = meta["width"], meta["height"]
    row = w * 3
    stride = row + ((-row) % 4)
    off, ln = meta["frames"][idx]
    if ln < stride * h:
        return None
    buf = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = buf.reshape(h, stride)[:, :row].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("bit_count", T.IntegerType(), True),
        T.StructField("is_raw_dib", T.BooleanType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def video_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL AVI container metadata over Arrow batches: dimensions, fps,
    frame count, pixel format — no codec library. Corrupt payloads
    yield NULLs. Narrow map, partitioning preserved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_parse_avi(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": [m and m["width"] for m in metas],
                    "height": [m and m["height"] for m in metas],
                    "fps": [m and m.get("fps") for m in metas],
                    "n_frames": [
                        m and len(m["frames"]) for m in metas
                    ],
                    "bit_count": [
                        m.get("bit_count") if m else None for m in metas
                    ],
                    "is_raw_dib": [
                        (
                            m.get("compression") == _AVI_DIB
                            and m.get("bit_count") == 24
                        )
                        if m
                        else None
                        for m in metas
                    ],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, VIDEO_META_SCHEMA
    )


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("std_pixel", T.DoubleType(), True),
        T.StructField("n_frame_bytes", T.LongType(), False),
    ]
)


def payload_frame_stat_rows(
    payload: bytes, every_k: int = 1
) -> "list[tuple] | None":
    """Per-payload core of ``video_frame_stats``: (frame_idx,
    mean_pixel, std_pixel, n_frame_bytes) rows for every sampled frame,
    or None for an unparseable payload. Factored out (r16, guide §4:
    cross the Python boundary once) so corpus GENERATORS can fuse
    synthesis and decode into ONE Python stage — the exact same
    encode→parse→decode work per payload, without shipping the video
    bytes JVM→Python a second time."""
    import numpy as np

    m = _parse_avi(payload)
    if m is None:
        return None
    out = []
    for fi in range(0, len(m["frames"]), every_k):
        px = _avi_frame_pixels(payload, m, fi)
        out.append(
            (
                fi,
                float(px.mean()) if px is not None else None,
                float(px.astype(np.float64).std())
                if px is not None
                else None,
                m["frames"][fi][1],
            )
        )
    return out


def payload_frame_hash_rows(
    payload: bytes, every_k: int = 1, hash_size: int = 8
) -> "list[tuple] | None":
    """Per-payload core of ``video_frame_hashes``: (frame_idx, fhash)
    rows (fhash NULL for an undecodable individual frame), or None for
    an unparseable payload. Shared by the DataFrame operator and fused
    gen→hash pipelines (r16, guide §4)."""
    m = _parse_avi(payload)
    if m is None:
        return None
    out = []
    for fi in range(0, len(m["frames"]), every_k):
        px = _avi_frame_pixels(payload, m, fi)
        out.append((fi, None if px is None else _dhash(px, hash_size)))
    return out


def video_frame_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 1,
) -> DataFrame:
    """Frame sampling with TRUE pixel statistics: one row per sampled
    frame (every ``every_k``-th), mean/std over genuinely decoded
    pixels — raw-DIB sliced directly, MJPG through the from-scratch
    baseline-JPEG decoder (r7). Frames of codecs that still need a
    real decoder (H.264 …) emit the real byte extent with NULL pixel
    stats (container-real, codec-stubbed). Narrow Arrow map — the
    video bytes never shuffle, only per-frame scalars."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "id": [], "frame_idx": [], "mean_pixel": [],
                "std_pixel": [], "n_frame_bytes": [],
            }
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                rows = payload_frame_stat_rows(p, every_k=every_k)
                if rows is None:
                    continue
                for fi, mean, std, nbytes in rows:
                    out["id"].append(int(i))
                    out["frame_idx"].append(fi)
                    out["mean_pixel"].append(mean)
                    out["std_pixel"].append(std)
                    out["n_frame_bytes"].append(nbytes)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches, VIDEO_FRAME_STATS_SCHEMA
    )


def video_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 1,
    hash_size: int = 8,
) -> DataFrame:
    """(id, fp) perceptual video fingerprints: dHash every ``every_k``-th
    genuinely decoded raw-DIB frame, then hash the ordered dHash
    sequence into one 64-bit fingerprint. Brightness-shifted duplicate
    videos fingerprint identically (each frame's dHash is invariant);
    reordered or trimmed videos do not (the sequence is part of the
    hash). NULL for corrupt/compressed payloads. Narrow Arrow map."""

    def one(payload: bytes):
        m = _parse_avi(payload)
        if m is None or not m["frames"]:
            return None
        hs = []
        for fi in range(0, len(m["frames"]), every_k):
            px = _avi_frame_pixels(payload, m, fi)
            if px is None:
                return None
            hs.append(_dhash(px, hash_size))
        # order-sensitive 64-bit mix of the frame-hash sequence (FNV-1a
        # over the 8-byte words — deterministic, stdlib-only)
        v = 0xCBF29CE484222325
        for h in hs:
            for b in (h & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"):
                v = ((v ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return v - (1 << 64) if v >= (1 << 63) else v

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "fp": [one(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


def video_dedup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 1,
) -> DataFrame:
    """Exact-fingerprint video dedup with min-id keeper election —
    the fourth modality leg (text shingles, image dHash, audio
    envelope, video frame-hash sequence). Brightness-regraded duplicate
    clips group together; corrupt payloads quarantine as their own
    keeper. ONE shuffle on the 8-byte fingerprint."""
    from pyspark.sql import Window

    sigs = video_fingerprint(df, id_col, payload_col, every_k)
    keeper = F.min("id").over(Window.partitionBy("fp"))
    return sigs.select(
        "id",
        F.when(F.col("fp").isNull(), F.col("id"))
        .otherwise(keeper)
        .alias("keeper"),
    )


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    hash_size: int = 8,
) -> DataFrame:
    """NEAR-duplicate image pairs: dHash over genuinely decoded pixels,
    then Hamming-ball blocking (``dedup.hamming_blocked_pairs`` — the
    same pigeonhole construction as text SimHash, 100% recall at the
    radius). Catches re-encodes with small pixel noise that flip a few
    gradient bits, where the exact-hash ``image_dedup_groups`` would
    split the group. Output: (id_a, id_b, hamming). Scale: decode is a
    narrow Arrow map; blocking shuffles only (id, 8-byte hash) chunk
    rows."""
    from opentick_spark.operators.dedup import hamming_blocked_pairs

    sigs = image_dhash(df, id_col, payload_col, hash_size).withColumnRenamed(
        "dhash", "sh"
    )
    return hamming_blocked_pairs(sigs, sig_col="sh", max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / ISO 10918-1, SOF0 sequential) — from-scratch
# stdlib+numpy codec (r7, VERDICT r6 item 6), completing the WAV→PNG→AVI
# pattern: encoder for planted synthesis, decoder for real pixel access,
# and the MJPG-in-AVI branch that was the last NULL-pixel media path.
# Spec constants below are the public Annex K example tables.

# K.1 / K.2 example quantization tables (natural order)
_JPEG_QL = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
# zig-zag scan order: natural index of each scan position
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
_JPEG_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


_JPEG_QTABLE_CACHE: dict = {}


def _jpeg_qtables(quality: int):
    """IJG quality scaling of the Annex K example tables. Memoized per
    quality (r15 §1.2 per-task work: the encoder is called once per
    frame; rebuilding two constant 8×8 tables per call measured ~4% of
    the planted-frame encode)."""
    import numpy as np

    q = max(1, min(100, int(quality)))
    hit = _JPEG_QTABLE_CACHE.get(q)
    if hit is not None:
        return hit
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_JPEG_QL, _JPEG_QC):
        t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
        t = np.clip(t, 1, 255).reshape(8, 8)
        # the cache hands the SAME ndarray to every caller; freeze it so
        # a future in-place mutation fails loudly instead of silently
        # poisoning all subsequent encodes (r15 ADVICE)
        t.setflags(write=False)
        out.append(t)
    _JPEG_QTABLE_CACHE[q] = out
    return out


_DCT_MATRIX_CACHE: list = []


def _dct_matrix():
    import numpy as np

    if _DCT_MATRIX_CACHE:
        return _DCT_MATRIX_CACHE[0]
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    # shared cached instance — read-only for the same reason as the
    # quant tables above (r15 ADVICE)
    c.setflags(write=False)
    _DCT_MATRIX_CACHE.append(c)
    return c


# test hook (test_encode_jpeg_entropy_fastpath_byte_identical): False
# forces the general AC run-length scan on every block so the all-zero-AC
# shortcut can be byte-compared against the loop it replaces
_ENC_AC_FASTPATH = True

_HUFF_ENC_CACHE: dict = {}


def _huff_encode_table(bits, vals):
    """symbol -> (code, length) per the spec's canonical code assignment.
    Memoized on the table VALUES (r15): the four Annex K tables are
    module constants rebuilt 6× per encoded frame — ~10% of the
    planted-frame encode for identical dicts. (Value keys, not id():
    an id can be reused after its object is collected, which would
    alias a different table to a stale cache entry.)"""
    key = (tuple(bits), tuple(vals))
    hit = _HUFF_ENC_CACHE.get(key)
    if hit is not None:
        return hit
    table, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    _HUFF_ENC_CACHE[key] = table
    return table


def _huff_decode_table(bits, vals):
    """(length, code) -> symbol for the bit-serial decoder."""
    table, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        # T.81 F.1.2.3: pad the final partial byte with 1-bits only.
        # (r8 ADVICE: the old 9-nbits formula emitted a leading 0 pad
        # bit when nbits==1, which strict third-party decoders can read
        # as the start of a spurious Huffman code.)
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_jpeg(
    arr,
    quality: int = 75,
    subsample: bool = False,
    restart: int = 0,
    app1: bytes | None = None,
) -> bytes:
    """Minimal from-scratch baseline-JPEG ENCODER for synthesis/tests:
    8-bit gray (h, w) or RGB (h, w, 3), SOF0 sequential, Annex K
    example Huffman tables, IJG-scaled example quant tables, 4:4:4 by
    default or 4:2:0 with ``subsample=True``, real DRI/RSTn restart
    markers every ``restart`` MCUs when nonzero (round-trip exercise
    for the decoder's resync path). Quantization rounds half-up
    (floor(x/q + 0.5) sign-symmetric) so planted closed-form oracles
    can replay the DC arithmetic exactly."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql, qc = _jpeg_qtables(quality)
    if gray:
        comps = [(1, 1, 1, a - 128.0, ql, 0)]
        sof_comps = [(1, 0x11, 0)]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even, then 2x2 mean
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def pad_even(ch):
                return np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge")
            cbs = pad_even(cb).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            crs = pad_even(cr).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            comps = [
                (1, 2, 2, y - 128.0, ql, 0),
                (2, 1, 1, cbs - 128.0, qc, 1),
                (3, 1, 1, crs - 128.0, qc, 1),
            ]
            sof_comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
        else:
            comps = [
                (1, 1, 1, y - 128.0, ql, 0),
                (2, 1, 1, cb - 128.0, qc, 1),
                (3, 1, 1, cr - 128.0, qc, 1),
            ]
            sof_comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_matrix()
    # per-component: pad to its own MCU-covering size, block, DCT, quant
    qblocks = []  # comp -> (by, bx) -> 64 zig-zag ints
    for _cid, sh, sv, ch, qt, _tc in comps:
        bh, bw = mcuy * sv * 8, mcux * sh * 8
        if (bh, bw) == ch.shape:
            chp = ch  # already MCU-aligned: np.pad with zero widths
            # still walks the full pad machinery (~15% of an aligned
            # planted-frame encode, r15 profile)
        else:
            chp = np.pad(
                ch,
                ((0, bh - ch.shape[0]), (0, bw - ch.shape[1])),
                mode="edge",
            )
        blocks = chp.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,rcxy,vy->rcuv", C, blocks, C)
        # snap to a 1/256 grid: kills the ~1e-13 einsum noise so integral
        # planted designs (constant blocks -> integral DC, zero AC)
        # quantize EXACTLY at half-boundaries — the property closed-form
        # oracles replay; sub-1/256 noise is far below any quant step
        f = np.round(f * 256.0) / 256.0
        qf = np.floor(np.abs(f) / qt + 0.5) * np.sign(f)
        qblocks.append(qf.astype(np.int64))
    # per-component table selection: luma tables for table-class 0
    enc_dc = [
        _huff_encode_table(*(_JPEG_DC_L if c[5] == 0 else _JPEG_DC_C))
        for c in comps
    ]
    enc_ac = [
        _huff_encode_table(*(_JPEG_AC_L if c[5] == 0 else _JPEG_AC_C))
        for c in comps
    ]
    # r15 (guide §1.2 per-task work): the entropy loop was the encoder's
    # hot path — 64 numpy-scalar reads per block plus a per-block zigzag
    # gather, ~770 interpreted iterations per 16×16 RGB frame. Byte-
    # identical rewrite: (a) zigzag every block of a component in ONE
    # vectorized gather and convert to Python ints wholesale (.tolist());
    # (b) skip the 63-coefficient AC scan entirely when a block has no
    # nonzero AC (precomputed per-block mask) — all-zero AC encodes as
    # exactly DC + EOB, which is what the dropped loop emitted. Planted
    # corpora (block-constant frames → zero AC after quant) hit the fast
    # path on every block; arbitrary images still save the per-scalar
    # overhead. Byte identity vs the loop it replaces is pinned by
    # test_encode_jpeg_entropy_fastpath_byte_identical.
    zzl = []  # comp -> (by, bx) -> 64 zig-zag ints (Python lists)
    acnz = []  # comp -> (by, bx) -> block has nonzero AC
    for qf in qblocks:
        nby, nbx = qf.shape[0], qf.shape[1]
        z = qf.reshape(nby, nbx, 64)[:, :, _JPEG_ZZ]
        zzl.append(z.tolist())
        acnz.append((z[:, :, 1:] != 0).any(axis=2).tolist())
    bw_ = _BitWriter()
    scan_parts = []
    pred = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                scan_parts.append(bw_.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst_n]))
                rst_n = (rst_n + 1) % 8
                bw_ = _BitWriter()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (_cid, sh, sv, _ch, _qt, _tc) in enumerate(comps):
                for by in range(sv):
                    for bx in range(sh):
                        zz = zzl[ci][my * sv + by][mx * sh + bx]
                        dc = zz[0]
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _jpeg_category(diff)
                        code, ln = enc_dc[ci][s]
                        bw_.write(code, ln)
                        if s:
                            v = diff if diff >= 0 else diff + (1 << s) - 1
                            bw_.write(v, s)
                        if _ENC_AC_FASTPATH and not acnz[ci][my * sv + by][mx * sh + bx]:
                            code, ln = enc_ac[ci][0x00]  # EOB
                            bw_.write(code, ln)
                            continue
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = enc_ac[ci][0xF0]  # ZRL
                                bw_.write(code, ln)
                                run -= 16
                            s = _jpeg_category(v)
                            code, ln = enc_ac[ci][(run << 4) | s]
                            bw_.write(code, ln)
                            vv = v if v >= 0 else v + (1 << s) - 1
                            bw_.write(vv, s)
                            run = 0
                        if run:
                            code, ln = enc_ac[ci][0x00]  # EOB
                            bw_.write(code, ln)
    scan_parts.append(bw_.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table) -> bytes:
        # values are clipped to 1..255, so uint8 tobytes is exact
        zz = table.reshape(64)[_JPEG_ZZ].astype(np.uint8)
        return seg(0xFFDB, bytes([tid]) + zz.tobytes())

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(
            0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if app1 is not None:  # e.g. an Exif blob from _encode_exif
        out += seg(0xFFE1, app1)
    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in sof_comps:
        sof += bytes([cid, hv, tq])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, *_JPEG_DC_L) + dht(1, 0, *_JPEG_AC_L)
    if not gray:
        out += dht(0, 1, *_JPEG_DC_C) + dht(1, 1, *_JPEG_AC_C)
    if restart:
        out += seg(0xFFDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for ci, (cid, _hv, _tq) in enumerate(sof_comps):
        td_ta = 0 if comps[ci][5] == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing; stops
    at any real marker (RSTn handled by the caller via ``sync``)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker terminates the scan

    def _fill(self) -> bool:
        b = self.buf
        while self.nbits < 25:
            if self.pos >= len(b):
                return self.nbits > 0
            v = b[self.pos]
            if v == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
                if nxt == 0x00:  # stuffed data byte
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    return self.nbits > 0  # RST boundary: caller syncs
                else:
                    self.marker = nxt
                    return self.nbits > 0
                v = 0xFF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | v
            self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("bitstream exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_rst(self) -> bool:
        """Consume an RSTn marker at the current byte boundary; returns
        True if one was consumed (caller resets DC predictors)."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        if (
            self.pos + 1 < len(b)
            and b[self.pos] == 0xFF
            and 0xD0 <= b[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


def _huff_read(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(payload: bytes):
    """From-scratch baseline-JPEG decode (SOF0 sequential, 8-bit, 1 or
    3 components, sampling factors 1-2, DRI/RSTn, byte unstuffing):
    returns dict(width, height, n_components, subsampling,
    pixels: uint8 (h, w, 3) RGB or (h, w, 1) gray) or None for
    non-JPEG / unsupported (progressive SOF2, arithmetic, 12-bit) /
    corrupt payloads — the same NULL-quarantine contract as
    ``_decode_png``. When the stream carries no DHT before SOS the
    Annex K example tables are installed — the MJPG-in-AVI convention,
    which is exactly the case this decoder exists to make real."""
    import struct

    import numpy as np

    try:
        if payload[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt = {}
        huff = {}
        sof = None
        restart = 0
        scan_comps = None
        scan_pos = None
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            pos += 1
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # the marker byte (r8 ADVICE — legal JPEGs with fill bytes
            # were misparsing the length field and getting quarantined)
            while pos < len(payload) and payload[pos] == 0xFF:
                pos += 1
            if pos >= len(payload):
                return None
            marker = payload[pos]
            pos += 1
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue  # TEM / RSTn: standalone, no length field
            if pos + 2 > len(payload):
                return None
            (ln,) = struct.unpack(">H", payload[pos : pos + 2])
            body = payload[pos + 2 : pos + ln]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(body):
                    pq, tid = body[p] >> 4, body[p] & 0xF
                    n = 64 * (2 if pq else 1)
                    raw = body[p + 1 : p + 1 + n]
                    vals = (
                        struct.unpack(f">{64}H", raw)
                        if pq
                        else list(raw)
                    )
                    nat = np.zeros(64, dtype=np.int64)
                    nat[_JPEG_ZZ] = vals
                    qt[tid] = nat.reshape(8, 8)
                    p += 1 + n
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(body):
                    tc, th = body[p] >> 4, body[p] & 0xF
                    bits = list(body[p + 1 : p + 17])
                    nv = sum(bits)
                    vals = list(body[p + 17 : p + 17 + nv])
                    huff[(tc, th)] = _huff_decode_table(bits, vals)
                    p += 17 + nv
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8:
                    return None
                comps = []
                for i in range(nc):
                    cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                sof = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan_comps = [
                    (body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0xF)
                    for i in range(ns)
                ]
                scan_pos = pos + ln
                break
            pos += ln
        if sof is None or scan_comps is None:
            return None
        if not huff:  # MJPG convention: tables omitted -> Annex K
            huff[(0, 0)] = _huff_decode_table(*_JPEG_DC_L)
            huff[(1, 0)] = _huff_decode_table(*_JPEG_AC_L)
            huff[(0, 1)] = _huff_decode_table(*_JPEG_DC_C)
            huff[(1, 1)] = _huff_decode_table(*_JPEG_AC_C)
        h, w, comps = sof
        if not comps or any(
            not (1 <= sh <= 2 and 1 <= sv <= 2) for _c, sh, sv, _q in comps
        ):
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        td_ta = {cid: (td, ta) for cid, td, ta in scan_comps}
        planes = [
            np.zeros((mcuy * sv * 8, mcux * sh * 8), dtype=np.float64)
            for _cid, sh, sv, _q in comps
        ]
        coef = [
            np.zeros((mcuy * sv, mcux * sh, 8, 8), dtype=np.float64)
            for _cid, sh, sv, _q in comps
        ]
        r = _BitReader(payload, scan_pos)
        pred = [0] * len(comps)
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_count and mcu_count % restart == 0:
                    if r.sync_rst():
                        pred = [0] * len(comps)
                for ci, (cid, sh, sv, tq) in enumerate(comps):
                    td, ta = td_ta[cid]
                    dc_t = huff[(0, td)]
                    ac_t = huff[(1, ta)]
                    for by in range(sv):
                        for bx in range(sh):
                            zz = np.zeros(64, dtype=np.int64)
                            s = _huff_read(r, dc_t)
                            diff = _jpeg_extend(r.bits(s), s) if s else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_read(r, ac_t)
                                rr, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if rr == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC overrun")
                                zz[k] = _jpeg_extend(r.bits(s), s)
                                k += 1
                            blk = np.zeros(64, dtype=np.float64)
                            blk[_JPEG_ZZ] = zz
                            coef[ci][
                                my * sv + by, mx * sh + bx
                            ] = blk.reshape(8, 8) * qt[tq]
                mcu_count += 1
        C = _dct_matrix()
        out_planes = []
        for ci, (_cid, sh, sv, _tq) in enumerate(comps):
            sp = np.einsum("xu,rcuv,yv->rcxy", C.T, coef[ci], C.T)
            ph, pw = planes[ci].shape
            img = sp.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
            # upsample to full MCU-grid resolution, crop to (h, w)
            if sh != hmax or sv != vmax:
                img = np.repeat(
                    np.repeat(img, vmax // sv, axis=0), hmax // sh, axis=1
                )
            out_planes.append(img[:h, :w])
        if len(comps) == 1:
            px = np.clip(np.floor(out_planes[0] + 0.5), 0, 255).astype(
                np.uint8
            )[:, :, None]
            ncomp = 1
        else:
            y, cb, cr = out_planes
            r_ = y + 1.402 * (cr - 128.0)
            g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b_ = y + 1.772 * (cb - 128.0)
            px = np.clip(
                np.floor(np.stack([r_, g_, b_], axis=2) + 0.5), 0, 255
            ).astype(np.uint8)
            ncomp = 3
        sub = "4:2:0" if (hmax, vmax) == (2, 2) else (
            "4:4:4" if (hmax, vmax) == (1, 1) else f"{hmax}x{vmax}"
        )
        return {
            "width": int(w),
            "height": int(h),
            "n_components": ncomp,
            "subsampling": sub if ncomp == 3 else "gray",
            "pixels": px,
        }
    except Exception:
        return None


VIDEO_FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("fhash", T.LongType(), True),
    ]
)


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 1,
    hash_size: int = 8,
) -> DataFrame:
    """(id, frame_idx, fhash) — per-frame perceptual dHash over
    genuinely decoded frames (raw-DIB sliced, MJPG through the r7
    baseline-JPEG decoder). The positional building block
    ``video_fingerprint`` collapses into one 64-bit value; kept
    separate for SUBSEQUENCE analytics (clip containment below).
    Undecodable PAYLOADS are absent; an undecodable individual FRAME
    emits its row with a NULL fhash (r8 ADVICE — silently dropping it
    let ``video_clip_containments`` judge a video on its decodable
    subset and report a containment that is not actually contiguous;
    a NULL never equi-joins, so such a video can never be claimed
    fully contained, and a gap in the containing side stays a gap).
    Narrow Arrow map — only (8-byte hash, int) pairs leave the
    executor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "frame_idx": [], "fhash": []}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                rows = payload_frame_hash_rows(
                    p, every_k=every_k, hash_size=hash_size
                )
                if rows is None:
                    continue
                for fi, fh in rows:
                    out["id"].append(int(i))
                    out["frame_idx"].append(fi)
                    out["fhash"].append(fh)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches, VIDEO_FRAME_HASH_SCHEMA
    )


def video_clip_containments(hashes: DataFrame) -> DataFrame:
    """Clip detection: (id_a, id_b, offset) for every pair where video
    a's ENTIRE frame-hash sequence appears contiguously inside video b
    at ``offset`` (a ≠ b) — the "this upload is a clip of that one"
    relation that whole-video fingerprints cannot express (any trim
    changes the sequence hash).

    Spark-first shape — never pairwise over videos: one equi-join on
    the 8-byte frame hash aligns candidate positions, the offset
    ``b.frame_idx − a.frame_idx`` groups alignments, and a containment
    is exactly an alignment whose distinct matched positions cover ALL
    of a's frames (count == |a|). Cost scales with hash collisions
    (shared content), not videos²; a degenerate constant-frame corpus
    concentrates in one hash bucket — the same skew contract as LSH
    buckets. Input: a ``video_frame_hashes`` frame."""
    n = hashes.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    a = hashes.select(
        F.col("id").alias("id_a"),
        F.col("frame_idx").alias("__ia"),
        "fhash",
    )
    b = hashes.select(
        F.col("id").alias("id_b"),
        F.col("frame_idx").alias("__ib"),
        "fhash",
    )
    aligned = (
        a.join(b, "fhash")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("__ib") - F.col("__ia")).alias("offset"),
            "__ia",
        )
    )
    covered = aligned.groupBy("id_a", "id_b", "offset").agg(
        F.countDistinct("__ia").alias("__matched")
    )
    return (
        covered.join(n.withColumnRenamed("id", "id_a"), "id_a")
        .filter(F.col("__matched") == F.col("__n"))
        .select("id_a", "id_b", F.col("offset").cast("int").alias("offset"))
    )


def video_sequence_groups(hashes: DataFrame) -> DataFrame:
    """Global collapse of identical frame-hash SEQUENCES (r8 — the
    ``hamming_blocked_star_edges`` pattern one level up): one row per
    video, (id, rep, n_members, has_null), where ``rep`` = min id over
    all videos with the exact same ordered (frame_idx, fhash) sequence.
    ``has_null`` marks sequences containing an undecodable frame (NULL
    fhash) — such a video can never be claimed contained (NULL never
    matches), which the expansion helpers must respect.

    r15 (the chunk_dedup/duplicate_spans count-over-window lesson):
    rep/n_members are windows over ONE exchange instead of the previous
    agg-then-join-back, whose two consumers of ``seqs`` re-ran the
    per-video collect aggregation twice over the full hash corpus (the
    silent fork-recompute class).

    r16 (guide §2.3 shuffle keys instead of payloads): each video
    collapses to a fixed-width sequence FINGERPRINT instead of a
    collected (frame_idx, fhash) struct array. Per-frame rows hash to
    64 bits under two independently seeded xxhash64 functions and are
    combined with order-insensitive aggregates (count + bit_xor/min/max
    of h1 + bit_xor of h2). frame_idx is distinct within a video and
    baked into every per-frame hash, so the combined multiset of
    per-frame hashes determines the ordered sequence exactly; two
    DIFFERENT sequences group together only if they collide on all five
    combiners at once (two independent 64-bit spaces plus count/min/max
    — ≈2^-128 per pair in the random model, far below any data-scale
    failure rate; the DuckDB oracle re-verifies the planted corpora at
    every SF). The wins over the array key: the groupBy(id) aggregate
    now PARTIALLY AGGREGATES map-side (one ~40-byte row per video per
    map partition crosses the exchange where collect_list shipped every
    frame row), and the rep/n_members window partitions on five scalar
    columns instead of shuffling whole struct arrays as the key."""
    from pyspark.sql import Window

    fh = hashes.select(
        "id",
        F.xxhash64("frame_idx", "fhash").alias("__h1"),
        F.xxhash64(F.lit(0x9E3779B9), "frame_idx", "fhash").alias("__h2"),
        F.col("fhash").isNull().alias("__nul"),
    )
    seqs = fh.groupBy("id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.bit_xor("__h1").alias("__x1"),
        F.min("__h1").alias("__lo1"),
        F.max("__h1").alias("__hi1"),
        F.bit_xor("__h2").alias("__x2"),
        F.max("__nul").alias("has_null"),
    )
    w = Window.partitionBy("__n", "__x1", "__lo1", "__hi1", "__x2")
    return seqs.select(
        "id",
        F.min("id").over(w).alias("rep"),
        F.count(F.lit(1)).over(w).alias("n_members"),
        "has_null",
    )


def video_clip_containment_groups(hashes: DataFrame) -> DataFrame:
    """Scale path for clip containment under degenerate corpora (r8,
    VERDICT r7 item 4): K re-uploads with IDENTICAL frame sequences
    (constant-frame videos, exact re-posts) make every frame of every
    clone collide into the same fhash bucket, so the naive
    ``video_clip_containments`` alignment join emits ~(K·F)² rows —
    quadratic in K — before coverage counting, exactly the pre-star
    Hamming hot-chunk cliff. This collapses identical sequences
    GLOBALLY first (``video_sequence_groups``), runs the alignment
    join over one representative per distinct sequence, and returns
    the GROUP-level relation — linear in distinct content, never in
    clone count:

      (rep_a, rep_b, offset, n_a, n_b)

    - rep_a ≠ rep_b: every member of a's group is contained in every
      member of b's group at ``offset`` (sequence-identical videos
      contain identically — exact transfer, including the NULL-frame
      contract, since members share the rep's sequence verbatim).
    - rep_a == rep_b (offset 0): the n>1 fully-decodable groups —
      mutual containment among all members (suppressed when the shared
      sequence has a NULL fhash: a video with an undecodable frame is
      never claimed contained).

    ``expand_containment_groups`` reproduces the exact pair relation
    (= ``video_clip_containments`` output) when the output size is
    affordable; at scale, consume the grouped form. Pinned by
    test_video_clip_star_pair_equivalence; asymptotics by
    tests/skew_drill_clip.py (PLANS.md)."""
    members = video_sequence_groups(hashes)
    # one row per group WITHOUT a distinct exchange (r15): the rep's
    # own member row already carries (rep, n_members, has_null).
    # r16: ``sizes`` has SIX consumers below (3 via the rep semi-join's
    # triple use inside video_clip_containments, 2 in the inter joins,
    # 1 in intra) — without a pin each one replays the corpus-wide
    # sequence-collapse aggregation (the silent fork-recompute class;
    # the r16 plan dump showed six __seq-fingerprint exchanges). The
    # lazy localCheckpoint evaluates the groups subtree ONCE; the
    # pinned relation is group-count-sized (one narrow row per distinct
    # sequence — executor-local, non-replicated blocks are fine at that
    # size, the ivf probe-pin precedent).
    sizes = (
        members.filter(F.col("id") == F.col("rep"))
        .select("rep", "n_members", "has_null")
        .localCheckpoint(eager=False)
    )
    rep_hashes = hashes.join(
        sizes.select(F.col("rep").alias("id")), "id", "left_semi"
    )
    rep_pairs = video_clip_containments(rep_hashes)
    inter = (
        rep_pairs.join(
            sizes.select(
                F.col("rep").alias("id_a"), F.col("n_members").alias("n_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col("rep").alias("id_b"), F.col("n_members").alias("n_b")
            ),
            "id_b",
        )
        .select(
            F.col("id_a").alias("rep_a"),
            F.col("id_b").alias("rep_b"),
            "offset",
            "n_a",
            "n_b",
        )
    )
    intra = (
        sizes.filter((F.col("n_members") > 1) & ~F.col("has_null"))
        .select(
            F.col("rep").alias("rep_a"),
            F.col("rep").alias("rep_b"),
            F.lit(0).cast("int").alias("offset"),
            F.col("n_members").alias("n_a"),
            F.col("n_members").alias("n_b"),
        )
    )
    return inter.unionByName(intra)


def expand_containment_groups(
    grouped: DataFrame, members: DataFrame
) -> DataFrame:
    """Expand ``video_clip_containment_groups`` output back to the full
    (id_a, id_b, offset) pair relation via two membership joins —
    output-sized work (the pair relation over K clones is inherently
    K², so only expand when that is what you actually want).
    ``members`` is a ``video_sequence_groups`` frame."""
    ma = members.select(F.col("id").alias("id_a"), F.col("rep").alias("rep_a"))
    mb = members.select(F.col("id").alias("id_b"), F.col("rep").alias("rep_b"))
    return (
        grouped.join(ma, "rep_a")
        .join(mb, "rep_b")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", F.col("offset").cast("int").alias("offset"))
    )


# ---------------------------------------------------------------------------
# EXIF metadata: audit + privacy strip (r8). JPEG APP1 carries an Exif
# blob — a TIFF 6.0 structure (public spec) whose IFD0 entries include
# Orientation (0x0112) and a GPSInfo sub-IFD pointer (0x8825) — the tag
# every training-data privacy pass must find and remove. The audit is
# HEADER-ONLY: marker walk + IFD parse, no entropy decode — at corpus
# scale you can sweep metadata without paying for pixels.

_EXIF_ORIENTATION = 0x0112
_EXIF_GPSINFO = 0x8825


def _encode_exif(orientation: int = 1, gps: bool = False) -> bytes:
    """Minimal little-endian Exif/TIFF blob for synthesis/tests: IFD0
    with Orientation (SHORT) and, when ``gps``, a GPSInfo LONG pointer
    to a one-entry GPS IFD (GPSVersionID 2.3). Layout per TIFF 6.0:
    8-byte header, 12-byte IFD entries, offsets relative to the TIFF
    header start."""
    import struct

    entries = [
        struct.pack("<HHI", _EXIF_ORIENTATION, 3, 1)
        + struct.pack("<HH", orientation & 0xFFFF, 0)
    ]
    n = 1 + (1 if gps else 0)
    ifd0_size = 2 + 12 * n + 4
    if gps:
        gps_off = 8 + ifd0_size
        entries.append(struct.pack("<HHII", _EXIF_GPSINFO, 4, 1, gps_off))
    tiff = bytearray(b"II" + struct.pack("<HI", 42, 8))
    tiff += struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    if gps:
        tiff += struct.pack("<H", 1)
        tiff += struct.pack("<HHI", 0x0000, 1, 4) + b"\x02\x03\x00\x00"
        tiff += struct.pack("<I", 0)
    return b"Exif\x00\x00" + bytes(tiff)


def _jpeg_segments(payload: bytes):
    """Yield (marker, seg_start, seg_end, body) for every header
    segment from SOI to (and including) SOS, tolerating fill bytes and
    standalone markers; stops at SOS (entropy data follows). Returns
    None-yields nothing for non-JPEG."""
    import struct

    if payload[:2] != b"\xff\xd8":
        return
    pos = 2
    while pos + 2 <= len(payload):
        seg_start = pos
        if payload[pos] != 0xFF:
            return
        pos += 1
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            return
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            yield marker, seg_start, pos, b""
            continue
        if pos + 2 > len(payload):
            return
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        yield marker, seg_start, pos + ln, body
        if marker == 0xDA:
            return
        pos += ln


def _parse_exif(body: bytes) -> dict | None:
    """Parse an APP1 Exif body (either TIFF endianness): returns
    {orientation, has_gps} or None when not an Exif blob / corrupt."""
    import struct

    try:
        if body[:6] != b"Exif\x00\x00":
            return None
        t = body[6:]
        if t[:2] == b"II":
            e = "<"
        elif t[:2] == b"MM":
            e = ">"
        else:
            return None
        if struct.unpack(e + "H", t[2:4])[0] != 42:
            return None
        (ifd_off,) = struct.unpack(e + "I", t[4:8])
        (n,) = struct.unpack(e + "H", t[ifd_off : ifd_off + 2])
        out = {"orientation": None, "has_gps": False}
        for i in range(n):
            ent = t[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
            tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
            if tag == _EXIF_ORIENTATION and typ == 3 and cnt == 1:
                out["orientation"] = struct.unpack(e + "H", ent[8:10])[0]
            elif tag == _EXIF_GPSINFO:
                out["has_gps"] = True
        return out
    except Exception:
        return None


def _jpeg_meta(payload: bytes) -> dict | None:
    """HEADER-ONLY JPEG metadata: dimensions from SOF0/SOF2, Exif
    orientation + GPS presence from APP1 — no entropy decode. None for
    non-JPEG."""
    import struct

    try:
        meta = {
            "width": None,
            "height": None,
            "orientation": None,
            "has_gps": False,
            "has_exif": False,
        }
        seen = False
        for marker, _s, _e, body in _jpeg_segments(payload):
            seen = True
            if marker in (0xC0, 0xC1, 0xC2):
                _prec, h, w, _nc = struct.unpack(">BHHB", body[:6])
                meta["width"], meta["height"] = int(w), int(h)
            elif marker == 0xE1:
                ex = _parse_exif(body)
                if ex is not None:
                    meta["has_exif"] = True
                    meta["orientation"] = ex["orientation"]
                    meta["has_gps"] = ex["has_gps"]
        return meta if seen else None
    except Exception:
        return None


def _jpeg_strip_metadata(payload: bytes) -> bytes | None:
    """Privacy strip: rebuild the JPEG with every APPn (0xE0-0xEF) and
    COM (0xFE) segment removed — pixels untouched (the entropy stream
    and all codec tables are copied verbatim). None for non-JPEG."""
    out = bytearray(b"\xff\xd8")
    any_seg = False
    for marker, s, e, _body in _jpeg_segments(payload):
        any_seg = True
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue
        out += payload[s:e]
        if marker == 0xDA:
            out += payload[e:]  # entropy-coded data + EOI, verbatim
            return bytes(out)
    return bytes(out) if any_seg else None


JPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("has_gps", T.BooleanType(), True),
        T.StructField("has_exif", T.BooleanType(), True),
    ]
)


def image_exif_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, width, height, orientation, has_gps, has_exif) per JPEG —
    header-only (marker walk + TIFF IFD parse, no pixel decode): the
    metadata sweep costs bytes-scanned-to-SOS, not decode CPU. Non-JPEG
    payloads quarantine as all-NULL metadata rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in JPEG_META_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = _jpeg_meta(p) or {}
                rows["id"].append(int(i))
                rows["width"].append(m.get("width"))
                rows["height"].append(m.get("height"))
                rows["orientation"].append(m.get("orientation"))
                rows["has_gps"].append(m.get("has_gps"))
                rows["has_exif"].append(m.get("has_exif"))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        batches, JPEG_META_SCHEMA
    )


JPEG_AUDIT_SCHEMA = T.StructType(
    JPEG_META_SCHEMA.fields
    + [T.StructField("strip_clean", T.BooleanType(), True)]
)


def image_exif_audit(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Fused audit + scrub-verification (r15): per payload, ONE Python
    pass computes the header metadata, strips every APPn/COM segment,
    and re-audits the scrubbed bytes — semantically identical to
    ``image_exif_meta(df) JOIN image_exif_meta(image_exif_strip(df))``
    but the payload crosses the JVM↔Python boundary once instead of
    three times and the plan has no join and no checkpoint (guide §4:
    the bytes are opaque to Spark — every extra stage re-ships them).
    ``strip_clean`` = NOT has_exif(stripped payload); NULL for
    non-JPEG payloads (matching the meta-join composite it replaces).
    Output: JPEG_META_SCHEMA + strip_clean."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in JPEG_AUDIT_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = _jpeg_meta(p) or {}
                s = _jpeg_strip_metadata(p)
                m2 = _jpeg_meta(p if s is None else s) or {}
                he2 = m2.get("has_exif")
                rows["id"].append(int(i))
                rows["width"].append(m.get("width"))
                rows["height"].append(m.get("height"))
                rows["orientation"].append(m.get("orientation"))
                rows["has_gps"].append(m.get("has_gps"))
                rows["has_exif"].append(m.get("has_exif"))
                rows["strip_clean"].append(
                    None if he2 is None else not he2
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        batches, JPEG_AUDIT_SCHEMA
    )


def image_exif_strip(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload) with all APPn/COM metadata removed — the privacy
    scrub before publication/training. Pixels are bit-identical (the
    entropy stream is copied verbatim; pinned by test). Non-JPEG
    payloads pass through unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                s = _jpeg_strip_metadata(p)
                ids.append(int(i))
                outs.append(p if s is None else s)
            yield pd.DataFrame({"id": ids, "payload": outs})

    return df.select(id_col, payload_col).mapInPandas(
        batches, "id long, payload binary"
    )
