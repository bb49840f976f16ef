"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: binary payload columns,
metadata structs, Arrow-batched ``mapInPandas`` pipelines with explicit
output schemas, and partition-count-preserving batch shapes. Three
formats are STDLIB-REAL — WAV (``wave``: true PCM decode, r5), PNG
(``zlib`` IDAT inflate + scanline unfiltering, r6), and AVI video
(RIFF chunk-tree parse with raw-DIB frames decoding to true pixels,
r6) — powering genuine metadata, feature, windowing and
perceptual-dedup operators with zero external dependencies. Formats
that genuinely need codec libraries this environment does not ship
(JPEG, MJPEG/H.264 frame payloads) keep the stub contract:
``decode=\"fake\"`` (default) derives deterministic features from the
bytes themselves; ``decode=\"real\"`` decodes PNG for real and raises
NotImplementedError for the rest where a codec (Pillow/ffmpeg) would
be called; compressed AVI streams stay container-real with NULL pixel
stats.

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
    external dependency; r6); other formats fall back to Pillow when
    importable and raise NotImplementedError (not ImportError) when the
    codec library is absent, so callers see the contract the stub
    documents."""
    import numpy as np

    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        m = _decode_png(payload)
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
    """Perceptual hash per image payload over genuinely decoded PNG
    pixels (stdlib codec — no Pillow): (id, dhash). Corrupt or
    non-PNG payloads yield NULL (quarantine). Narrow Arrow map — the
    decode+hash runs where the bytes live; only the 8-byte hash ever
    moves, the 100 TB posture for image dedup."""

    def one(payload: bytes):
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


def _encode_avi(frames, fps: int = 10) -> bytes:
    """Minimal stdlib AVI WRITER for synthesis/tests: raw-DIB 24bpp
    video stream ('DIB ' handler, BI_RGB), one '00db' chunk per frame,
    real bottom-up BGR rows with 4-byte padding — a genuine AVI any
    container tool can read."""
    import struct

    import numpy as np

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
        b"DIB ",
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
        40, w, h, 1, 24, _AVI_DIB, size_image, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
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
    """TRUE pixels of one raw-DIB frame: slice the '00db' chunk,
    un-pad and flip the bottom-up BGR rows. Returns (h, w, 3) uint8
    RGB or None when the stream is compressed (MJPEG/H.264 — container
    metadata is still real; pixel decode needs a codec)."""
    import numpy as np

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


def video_frame_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 1,
) -> DataFrame:
    """Frame sampling with TRUE pixel statistics: one row per sampled
    frame (every ``every_k``-th), mean/std over genuinely decoded
    raw-DIB pixels. Compressed-stream frames emit the real byte extent
    with NULL pixel stats (container-real, codec-stubbed). Narrow Arrow
    map — the video bytes never shuffle, only per-frame scalars."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "id": [], "frame_idx": [], "mean_pixel": [],
                "std_pixel": [], "n_frame_bytes": [],
            }
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = _parse_avi(p)
                if m is None:
                    continue
                for fi in range(0, len(m["frames"]), every_k):
                    px = _avi_frame_pixels(p, m, fi)
                    out["id"].append(int(i))
                    out["frame_idx"].append(fi)
                    out["mean_pixel"].append(
                        float(px.mean()) if px is not None else None
                    )
                    out["std_pixel"].append(
                        float(px.astype(np.float64).std())
                        if px is not None
                        else None
                    )
                    out["n_frame_bytes"].append(m["frames"][fi][1])
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
