"""From-scratch baseline-JPEG codec end-to-end (r7, VERDICT r6 item 6):
payloads are genuine SOF0 JPEGs — Annex K tables, real Huffman entropy
coding, byte stuffing, optional DRI/RSTn — built by the module's own
minimal encoder, and the decoder runs Huffman + dequant + vectorized
IDCT + chroma upsampling to TRUE pixels. No Pillow anywhere. The
closed-form case is DC-only block-constant grayscale, where the decode
result is exact quantization arithmetic (the planted design the
mjpg_frame_stats oracle replays)."""

import math

import numpy as np
import pytest

from opentick_spark.operators import multimodal as M
from opentick_spark.operators.multimodal import (
    _decode_jpeg,
    _encode_avi,
    _encode_jpeg,
    _jpeg_qtables,
)


def _expected_dc_gray(v: int, quality: int) -> int:
    """Closed-form decode of a constant 8x8 grayscale block: only the
    DC coefficient survives (AC of a constant block is exactly 0), so
    decoded = clip(floor(q*round_half_up(8(v-128)/q)/8 + 128 + 0.5))."""
    q = int(_jpeg_qtables(quality)[0][0, 0])
    f = 8.0 * (v - 128.0)
    qv = math.floor(abs(f) / q + 0.5) * (1 if f >= 0 else -1)
    rec = qv * q / 8.0 + 128.0
    return int(min(255, max(0, math.floor(rec + 0.5))))


def _block_gray(vals) -> np.ndarray:
    """Block-constant grayscale image from a 2-D list of block values."""
    a = np.asarray(vals, dtype=np.uint8)
    return np.repeat(np.repeat(a, 8, axis=0), 8, axis=1)


@pytest.mark.parametrize("quality", [25, 50, 75, 95])
def test_jpeg_dc_closed_form_exact(quality):
    vals = [[30, 100, 200], [250, 5, 128]]
    dec = _decode_jpeg(_encode_jpeg(_block_gray(vals), quality=quality))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["n_components"]) == (24, 16, 1)
    for by in range(2):
        for bx in range(3):
            blk = dec["pixels"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
            want = _expected_dc_gray(vals[by][bx], quality)
            assert set(blk.reshape(-1).tolist()) == {want}, (
                quality, vals[by][bx], want,
            )


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_constant_color_exact(subsample):
    """A constant grayscale-valued COLOR image: chroma is exactly 128
    everywhere (r=g=b), subsampling averages a constant, so both modes
    decode to the same closed-form DC value in all three channels."""
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    dec = _decode_jpeg(_encode_jpeg(img, quality=75, subsample=subsample))
    assert dec is not None and dec["n_components"] == 3
    assert dec["subsampling"] == ("4:2:0" if subsample else "4:4:4")
    want = _expected_dc_gray(77, 75)
    assert set(dec["pixels"].reshape(-1).tolist()) == {want}


def test_mjpg_planted_design_has_no_half_boundary_pixels():
    """The mjpg_frame_stats oracle's fp-stability claim: at the
    quality-90 DC step (q=3) NO 8-bit value reconstructs to an exact
    .5 boundary, so the decoder's floor(x+0.5) under ±1e-13 IDCT noise
    cannot flip a pixel against the closed-form lut."""
    q = int(_jpeg_qtables(90)[0][0, 0])
    assert q == 3
    for v in range(256):
        f = 8.0 * (v - 128.0)
        qv = math.floor(abs(f) / q + 0.5) * (1 if f >= 0 else -1)
        rec = qv * q / 8.0 + 128.0
        assert abs(rec - math.floor(rec) - 0.5) > 1e-9, v


def test_jpeg_smooth_roundtrip_small_error():
    xs = np.linspace(0, 255, 64)
    g = np.meshgrid(xs, xs)
    img = np.stack([g[0], g[1], (g[0] + g[1]) / 2], axis=2).astype(np.uint8)
    for sub in (False, True):
        dec = _decode_jpeg(_encode_jpeg(img, quality=90, subsample=sub))
        err = np.abs(dec["pixels"].astype(int) - img.astype(int)).mean()
        assert err < 3.0, (sub, err)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: predictors reset at byte-aligned restart boundaries —
    the decoded image must be IDENTICAL to the no-restart encode of the
    same input (restart changes framing, not content)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    base = _decode_jpeg(_encode_jpeg(img, quality=80))
    for interval in (1, 2, 5):
        rst = _decode_jpeg(_encode_jpeg(img, quality=80, restart=interval))
        assert rst is not None, interval
        assert np.array_equal(base["pixels"], rst["pixels"]), interval


def test_jpeg_standard_tables_when_dht_absent():
    """The MJPG convention: no DHT segments in the stream ⇒ Annex K
    tables implied. Our encoder writes the standard tables, so
    stripping every DHT must decode identically."""
    img = np.random.RandomState(5).randint(0, 256, (16, 16)).astype(np.uint8)
    enc = _encode_jpeg(img, quality=75)
    stripped = bytearray()
    pos = 0
    import struct

    stripped += enc[:2]
    pos = 2
    while pos + 4 <= len(enc):
        marker = enc[pos + 1]
        if marker == 0xD9:
            stripped += enc[pos:]
            break
        (ln,) = struct.unpack(">H", enc[pos + 2 : pos + 4])
        if marker == 0xDA:
            stripped += enc[pos:]
            break
        if marker != 0xC4:  # drop DHT
            stripped += enc[pos : pos + 2 + ln]
        pos += 2 + ln
    assert b"\xff\xc4" not in bytes(stripped)[:200]
    a = _decode_jpeg(enc)
    b = _decode_jpeg(bytes(stripped))
    assert b is not None
    assert np.array_equal(a["pixels"], b["pixels"])


def test_jpeg_decode_quarantines_garbage():
    assert _decode_jpeg(b"not a jpeg") is None
    enc = _encode_jpeg(np.zeros((8, 8), np.uint8))
    assert _decode_jpeg(enc[:10]) is None  # truncated in headers
    # progressive (SOF2) must quarantine, not mis-decode
    prog = bytearray(enc)
    i = bytes(prog).find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert _decode_jpeg(bytes(prog)) is None
    # truncated mid-scan: either None or a decode error caught -> None
    assert _decode_jpeg(enc[: len(enc) // 2]) is None


# ------------------------------------------------------ property testing
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    color=st.booleans(),
    sub=st.booleans(),
    quality=st.sampled_from([40, 75, 95]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, color, sub, quality, seed):
    """Any dimensions (including non-multiples of the MCU size), both
    color modes, both subsamplings, several qualities: encode → decode
    must return the exact metadata/shape and luma within the lossy-
    codec bound. Random content in a tiny edge-padded block at low
    quality is the worst legitimate case (~40 mean luma error); block
    or channel MISPLACEMENT on random content lands at ~85 (mean
    |U−U'| of independent uniforms), so a 60 bound separates bug from
    codec loss, and the DC closed-form tests pin placement exactly."""
    rng = np.random.RandomState(seed)
    if color:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    else:
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    dec = _decode_jpeg(_encode_jpeg(img, quality=quality, subsample=sub and color))
    assert dec is not None
    assert (dec["height"], dec["width"]) == (h, w)
    assert dec["n_components"] == (3 if color else 1)
    ref = img if color else img[:, :, None]
    # luma is preserved tightly even when chroma subsampling is lossy
    luma_got = dec["pixels"].astype(float).mean(axis=2)
    luma_want = ref.astype(float).mean(axis=2)
    assert np.abs(luma_got - luma_want).mean() < 60


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    prefix=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_decoder_never_raises_on_garbage(data, prefix, seed):
    """Fuzz the NULL-quarantine contract: arbitrary bytes — raw, with a
    forged SOI, or a valid JPEG corrupted at a random offset — must
    return None or a well-formed dict, never raise (the Arrow batch
    kernels rely on this)."""
    assert _decode_jpeg(data) is None or True
    forged = b"\xff\xd8" + data
    r = _decode_jpeg(forged)
    assert r is None or isinstance(r, dict)
    rng = np.random.RandomState(seed)
    enc = bytearray(_encode_jpeg(rng.randint(0, 256, (8, 8)).astype(np.uint8)))
    i = rng.randint(2, len(enc))
    enc[i] ^= 1 + rng.randint(0, 255)
    r = _decode_jpeg(bytes(enc))
    if r is not None:
        assert r["pixels"].shape == (r["height"], r["width"], r["n_components"])


@pytest.fixture(scope="module")
def mjpg_df(spark):
    def mjpg_avi(n_frames, base_vals):
        frames = [
            np.repeat(
                _block_gray([[v + 2 * f for v in base_vals]])[:, :, None],
                3,
                axis=2,
            )
            for f in range(n_frames)
        ]
        return _encode_avi(frames, fps=10, codec="MJPG")

    rows = [
        (1, mjpg_avi(3, [40, 120])),
        (2, mjpg_avi(1, [200, 60])),
        (3, b"corrupt video"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_mjpg_avi_true_pixels(mjpg_df):
    """The last NULL-pixel media branch is real: MJPG frames decode to
    true pixels through video_frame_stats, exactly at the closed-form
    DC values of the planted block-constant frames."""
    meta = {r["id"]: r.asDict() for r in M.video_metadata(mjpg_df).collect()}
    assert meta[1]["n_frames"] == 3 and meta[1]["width"] == 16
    assert meta[1]["is_raw_dib"] is False  # MJPG, not DIB
    rows = {
        (r["id"], r["frame_idx"]): r.asDict()
        for r in M.video_frame_stats(mjpg_df).collect()
    }
    for f in range(3):
        want = np.mean(
            [_expected_dc_gray(40 + 2 * f, 90), _expected_dc_gray(120 + 2 * f, 90)]
        )
        got = rows[(1, f)]
        assert got["mean_pixel"] == pytest.approx(want, abs=1e-9), f
        assert got["std_pixel"] is not None and got["std_pixel"] > 0
    assert rows[(2, 0)]["mean_pixel"] == pytest.approx(
        np.mean([_expected_dc_gray(200, 90), _expected_dc_gray(60, 90)]),
        abs=1e-9,
    )


def test_mjpg_video_fingerprint_and_dedup(spark):
    """MJPG videos fingerprint like raw-DIB ones: a re-encode of the
    same frames (MJPG vs DIB) may differ, but two identical MJPG
    payloads group, and a reordered MJPG video does not."""
    # distinct dHash per frame: dHash sees only UPWARD gradients, so the
    # patterns differ in up-edge POSITIONS (up@1, up@2, both)
    pats = [[40, 160, 160], [40, 40, 160], [40, 90, 160]]
    f1 = [
        np.repeat(_block_gray([p])[:, :, None], 3, axis=2) for p in pats
    ]
    a = _encode_avi(f1, codec="MJPG")
    b = _encode_avi(f1, codec="MJPG")
    c = _encode_avi(list(reversed(f1)), codec="MJPG")
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, payload binary"
    )
    keep = {r["id"]: r["keeper"] for r in M.video_dedup_groups(df).collect()}
    assert keep[1] == keep[2] == 1
    assert keep[3] == 3


def test_video_clip_containment_semantics(spark):
    """Subsequence containment must be CONTIGUOUS at one offset:
    repeated frames, gapped decoys and reversed clips are rejected;
    equal sequences mutually contain at offset 0; a true clip reports
    its exact offset. Built directly on the (id, frame_idx, fhash)
    frame so the arithmetic is tested without codec noise."""
    rows = [
        # video 1: base [A B C D]
        (1, 0, 100), (1, 1, 200), (1, 2, 300), (1, 3, 400),
        # video 2: clip [B C] -> contained in 1 at offset 1
        (2, 0, 200), (2, 1, 300),
        # video 3: gapped [B D] -> NOT contained (no single offset)
        (3, 0, 200), (3, 1, 400),
        # video 4: reversed [C B] -> NOT contained
        (4, 0, 300), (4, 1, 200),
        # video 5: identical to 2 -> mutual containment at offset 0
        (5, 0, 200), (5, 1, 300),
        # video 6: repeated frame [B B] -> needs ADJACENT B's: none
        (6, 0, 200), (6, 1, 200),
    ]
    hashes = spark.createDataFrame(
        rows, "id long, frame_idx int, fhash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["offset"]
        for r in M.video_clip_containments(hashes).collect()
    }
    assert got == {
        (2, 1): 1, (5, 1): 1,  # clips of the base at offset 1
        (2, 5): 0, (5, 2): 0,  # equal sequences, both directions
    }


def test_video_clip_containment_plan_no_cartesian(spark):
    hashes = spark.range(30).selectExpr(
        "id", "CAST(id % 3 AS INT) AS frame_idx", "xxhash64(id) AS fhash"
    )
    plan = (
        M.video_clip_containments(hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_jpeg_image_dhash_pipeline(spark):
    """image_dhash accepts JPEG payloads since r7: a JPEG and the PNG
    of the SAME pixels hash identically when the JPEG decode is exact
    (block-constant planted design)."""
    img = _block_gray([[30, 90, 150, 210], [60, 120, 180, 240]])
    # map through the codec's closed-form decode to get exact pixels
    dec = _decode_jpeg(_encode_jpeg(img, quality=75))
    from opentick_spark.operators.multimodal import _encode_png

    df = spark.createDataFrame(
        [
            (1, _encode_jpeg(img, quality=75)),
            (2, _encode_png(dec["pixels"][:, :, 0])),
            (3, b"corrupt"),
        ],
        "doc_id long, payload binary",
    )
    h = {r["id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    assert h[1] is not None and h[1] == h[2]
    assert h[3] is None


@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 5, 6, 7])
def test_bitwriter_flush_pads_with_one_bits_only(nbits):
    """T.81 F.1.2.3 (r8 ADVICE): the final partial byte is padded with
    1-bits ONLY. The old 9-nbits formula emitted a leading 0 pad bit at
    nbits==1, which strict decoders read as a spurious Huffman code."""
    w = M._BitWriter()
    w.write(0, nbits)  # nbits pending zero bits
    out = w.flush()
    assert out == bytes([(1 << (8 - nbits)) - 1])
    # and an aligned stream takes no pad byte at all
    w2 = M._BitWriter()
    w2.write(0xA5, 8)
    assert w2.flush() == b"\xa5"


def test_jpeg_decoder_tolerates_fill_bytes_and_tem():
    """T.81 B.1.1.2 (r8 ADVICE): any number of 0xFF fill bytes may
    precede a marker, and TEM (0x01) is standalone (no length field).
    Such streams are legal JPEGs and must decode identically, not get
    NULL-quarantined."""
    img = _block_gray([[30, 100, 200], [250, 5, 128]])
    payload = _encode_jpeg(img, quality=75)
    base = _decode_jpeg(payload)
    assert base is not None
    # inject fill bytes + a TEM marker right after SOI
    doctored = payload[:2] + b"\xff\xff\xff\x01" + payload[2:]
    dec = _decode_jpeg(doctored)
    assert dec is not None
    assert np.array_equal(dec["pixels"], base["pixels"])
    # fill bytes before EVERY marker segment (rewrite the header walk)
    doctored2 = payload[:2] + b"\xff" + payload[2:]
    dec2 = _decode_jpeg(doctored2)
    assert dec2 is not None
    assert np.array_equal(dec2["pixels"], base["pixels"])


def test_video_clip_containment_null_fhash_breaks_false_alignment(spark):
    """r8 ADVICE: an undecodable frame emits a NULL fhash row instead
    of vanishing. NULL never equi-joins, so (a) a video with an
    undecodable frame is NEVER claimed contained (its coverage count
    can't reach |frames|), and (b) a gap in the containing side stays
    a gap instead of letting the clip's frames skip over it."""
    rows = [
        # base [A B C D]
        (1, 0, 100), (1, 1, 200), (1, 2, 300), (1, 3, 400),
        # clip [B ? C]: middle frame undecodable -> NOT contained even
        # though its decodable subset {B@0, C@2} aligns with base
        (2, 0, 200), (2, 1, None), (2, 2, 300),
        # fully decodable clip [B C] -> still contained at offset 1
        (3, 0, 200), (3, 1, 300),
        # base with an undecodable middle [A ? C D]: clip [B C] must
        # NOT be claimed contained in it (B would land on the hole)
        (4, 0, 100), (4, 1, None), (4, 2, 300), (4, 3, 400),
    ]
    hashes = spark.createDataFrame(
        rows, "id long, frame_idx int, fhash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["offset"]
        for r in M.video_clip_containments(hashes).collect()
    }
    assert got == {(3, 1): 1}


def test_video_frame_hashes_emits_null_for_undecodable_frame(spark):
    """An AVI whose middle frame is corrupt MJPG yields all three
    frame_idx rows, the middle one with fhash NULL (r8 ADVICE)."""
    f0 = np.full((16, 16), 40, dtype=np.uint8)[:, :, None].repeat(3, 2)
    f1 = np.full((16, 16), 90, dtype=np.uint8)[:, :, None].repeat(3, 2)
    f2 = np.full((16, 16), 140, dtype=np.uint8)[:, :, None].repeat(3, 2)
    avi = _encode_avi([f0, f1, f2], fps=10, codec="MJPG")
    # corrupt frame 1's JPEG body in place: find its SOI inside the
    # movi chunk stream and truncate the entropy data to garbage
    meta = M._parse_avi(avi)
    off, size = meta["frames"][1]
    corrupted = bytearray(avi)
    corrupted[off : off + size] = b"\x00" * size
    df = spark.createDataFrame(
        [(7, bytes(corrupted))], "doc_id long, payload binary"
    )
    out = {
        r["frame_idx"]: r["fhash"]
        for r in M.video_frame_hashes(df).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[1] is None
    assert out[0] is not None and out[2] is not None


def test_video_clip_star_pair_equivalence(spark):
    """r8 (VERDICT item 4): the grouped containment path (global
    sequence collapse -> rep-level alignment -> membership expansion)
    reproduces the naive pair relation EXACTLY on a mixed corpus:
    clone groups (the hot-bucket shape), true clips, clip clones,
    gapped/reversed decoys, and NULL-frame (undecodable) variants."""
    rows = [
        # base [A B C D] + two exact clones (ids 10, 11)
        (1, 0, 100), (1, 1, 200), (1, 2, 300), (1, 3, 400),
        (10, 0, 100), (10, 1, 200), (10, 2, 300), (10, 3, 400),
        (11, 0, 100), (11, 1, 200), (11, 2, 300), (11, 3, 400),
        # clip [B C] + one clone (ids 2, 12)
        (2, 0, 200), (2, 1, 300),
        (12, 0, 200), (12, 1, 300),
        # gapped decoy [B D]
        (3, 0, 200), (3, 1, 400),
        # reversed decoy [C B]
        (4, 0, 300), (4, 1, 200),
        # clip with undecodable middle [B ? C] + an identical clone:
        # NEVER contained, and the clone group must not claim mutual
        # containment either (has_null suppresses the intra clique)
        (5, 0, 200), (5, 1, None), (5, 2, 300),
        (15, 0, 200), (15, 1, None), (15, 2, 300),
        # container with a hole [A ? C D]: contains nothing extra
        (6, 0, 100), (6, 1, None), (6, 2, 300), (6, 3, 400),
    ]
    hashes = spark.createDataFrame(
        rows, "id long, frame_idx int, fhash long"
    )
    naive = {
        (r["id_a"], r["id_b"], r["offset"])
        for r in M.video_clip_containments(hashes).collect()
    }
    members = M.video_sequence_groups(hashes)
    grouped = M.video_clip_containment_groups(hashes)
    star = {
        (r["id_a"], r["id_b"], r["offset"])
        for r in M.expand_containment_groups(grouped, members).collect()
    }
    assert star == naive
    # sanity: the relation is non-trivial (clone cliques + clip pairs)
    assert (2, 1, 1) in naive and (12, 10, 1) in naive
    assert (10, 1, 0) in naive and (1, 10, 0) in naive
    assert not any(a in (5, 15) for a, _b, _o in naive)


def test_video_clip_groups_plan_no_cartesian(spark):
    hashes = spark.range(30).selectExpr(
        "id", "CAST(id % 3 AS INT) AS frame_idx", "xxhash64(id) AS fhash"
    )
    plan = (
        M.video_clip_containment_groups(hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_exif_roundtrip_and_strip_pixel_identity():
    """r8 EXIF ops: the planted Exif blob reads back exactly
    (orientation + GPS presence, both TIFF endians tolerated on parse),
    stripping removes every APPn/COM segment, and the scrubbed JPEG
    decodes to BIT-IDENTICAL pixels (the entropy stream is copied
    verbatim)."""
    img = _block_gray([[30, 90], [150, 210]])
    p = M._encode_jpeg(
        img, quality=75, app1=M._encode_exif(orientation=6, gps=True)
    )
    m = M._jpeg_meta(p)
    assert m == {
        "width": 16, "height": 16, "orientation": 6,
        "has_gps": True, "has_exif": True,
    }
    s = M._jpeg_strip_metadata(p)
    ms = M._jpeg_meta(s)
    assert ms["has_exif"] is False and ms["orientation"] is None
    assert ms["width"] == 16 and ms["height"] == 16
    d1, d2 = M._decode_jpeg(p), M._decode_jpeg(s)
    assert np.array_equal(d1["pixels"], d2["pixels"])
    # big-endian (MM) TIFF parses too
    import struct
    blob = bytearray(M._encode_exif(orientation=3, gps=False))
    # rebuild as MM by hand: header + one IFD0 entry + next-offset
    mm = (b"Exif\x00\x00" + b"MM" + struct.pack(">HI", 42, 8)
          + struct.pack(">H", 1)
          + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 3, 0)
          + struct.pack(">I", 0))
    ex = M._parse_exif(bytes(mm))
    assert ex == {"orientation": 3, "has_gps": False}
    # non-JPEG and no-exif paths
    assert M._jpeg_meta(b"not a jpeg") is None
    plain = M._encode_jpeg(img)
    mp = M._jpeg_meta(plain)
    assert mp["has_exif"] is False and mp["has_gps"] is False


def test_exif_meta_is_header_only_on_truncated_entropy():
    """The audit must not need decodable pixels: truncating the
    entropy-coded data after SOS leaves the metadata sweep intact."""
    img = _block_gray([[30, 90], [150, 210]])
    p = M._encode_jpeg(
        img, quality=75, app1=M._encode_exif(orientation=2, gps=True)
    )
    # cut everything after SOS + a few bytes
    sos = p.find(b"\xff\xda")
    trunc = p[: sos + 16]
    m = M._jpeg_meta(trunc)
    assert m is not None and m["orientation"] == 2 and m["has_gps"]
    assert M._decode_jpeg(trunc) is None  # pixels genuinely gone


@settings(max_examples=80, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    prefix=st.booleans(),
    mutate=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_exif_parsers_never_raise(data, prefix, mutate, seed):
    """The metadata sweep has the same never-raise quarantine contract
    as the pixel decoder: random bytes, SOI-prefixed garbage, and
    bit-flipped REAL Exif payloads all return None/partial metadata,
    never an exception."""
    import numpy as np

    if mutate:
        img = np.full((8, 8), 77, dtype=np.uint8)
        base = bytearray(
            M._encode_jpeg(
                img, app1=M._encode_exif(orientation=5, gps=True)
            )
        )
        rng = np.random.RandomState(seed)
        for _ in range(4):
            base[rng.randint(0, len(base))] = rng.randint(0, 256)
        payload = bytes(base)
    else:
        payload = (b"\xff\xd8" + data) if prefix else data
    m = M._jpeg_meta(payload)
    assert m is None or isinstance(m, dict)
    s = M._jpeg_strip_metadata(payload)
    assert s is None or isinstance(s, bytes)
    if s is not None:
        # a stripped stream must never still carry APPn/COM segments
        ms = M._jpeg_meta(s)
        assert ms is None or ms["has_exif"] is False


def test_exif_audit_fused_matches_composite(spark):
    """r15 fusion: ``image_exif_audit`` (one Python pass) must equal
    the meta JOIN strip→meta composite it replaced, row for row —
    including the non-JPEG quarantine (all-NULL metadata, NULL
    strip_clean) and the no-Exif path."""
    import numpy as np
    from pyspark.sql import functions as F

    payloads = []
    for d in range(40):
        if d % 13 == 4:
            payloads.append((d, b"not a jpeg at all"))
            continue
        img = np.full((8, 8), 40 + d % 50, dtype=np.uint8)
        app1 = (
            None
            if d % 11 == 7
            else M._encode_exif(orientation=1 + d % 8, gps=(d % 5 == 0))
        )
        payloads.append((d, M._encode_jpeg(img, quality=75, app1=app1)))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    fused = {
        r["id"]: (
            r["width"], r["height"], r["orientation"], r["has_gps"],
            r["has_exif"], r["strip_clean"],
        )
        for r in M.image_exif_audit(df).collect()
    }
    meta = M.image_exif_meta(df)
    clean = M.image_exif_meta(M.image_exif_strip(df), id_col="id").select(
        "id", (~F.col("has_exif")).alias("strip_clean")
    )
    composite = {
        r["id"]: (
            r["width"], r["height"], r["orientation"], r["has_gps"],
            r["has_exif"], r["strip_clean"],
        )
        for r in meta.join(clean, "id").collect()
    }
    assert fused == composite and len(fused) == 40


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_video_clip_groups_equivalence_property(spark, data):
    """Property version of test_video_clip_star_pair_equivalence: on
    RANDOM small frame-hash corpora (heavy collisions, random lengths,
    occasional NULL frames), expand(video_clip_containment_groups) ==
    video_clip_containments exactly."""
    n_videos = data.draw(st.integers(2, 8))
    rows = []
    for vid in range(n_videos):
        n_frames = data.draw(st.integers(1, 5))
        for fi in range(n_frames):
            h = data.draw(
                st.one_of(st.none(), st.integers(100, 104))  # tiny hash space
            )
            rows.append((vid, fi, h))
    hashes = spark.createDataFrame(
        rows, "id long, frame_idx int, fhash long"
    )
    naive = {
        (r["id_a"], r["id_b"], r["offset"])
        for r in M.video_clip_containments(hashes).collect()
    }
    members = M.video_sequence_groups(hashes)
    star = {
        (r["id_a"], r["id_b"], r["offset"])
        for r in M.expand_containment_groups(
            M.video_clip_containment_groups(hashes), members
        ).collect()
    }
    assert star == naive


def test_encode_jpeg_entropy_fastpath_byte_identical():
    """r15: the encoder's all-zero-AC shortcut (DC + EOB without the
    63-coefficient run-length scan) must be BYTE-identical to the
    general loop it replaces, across planted zero-AC frames, random
    frames, gray, subsampled, and restart-marker configurations. The
    _ENC_AC_FASTPATH hook forces the general path for the comparison."""
    import numpy as np

    import opentick_spark.operators.multimodal as M

    rng = np.random.default_rng(11)
    vals = np.array([[8, 32], [56, 80]], dtype=np.uint8)
    planted = (
        np.repeat(np.repeat(vals, 8, 0), 8, 1)[:, :, None].repeat(3, 2)
    )
    cases = [
        (planted, {"quality": 90}),
        (np.full((8, 8), 77, np.uint8), {}),
        (rng.integers(0, 256, (17, 23, 3)).astype(np.uint8), {}),
        (
            rng.integers(0, 256, (32, 32, 3)).astype(np.uint8),
            {"subsample": True},
        ),
        (
            rng.integers(0, 256, (48, 40, 3)).astype(np.uint8),
            {"restart": 2},
        ),
        (
            rng.integers(0, 256, (24, 24)).astype(np.uint8),
            {"restart": 1, "quality": 30},
        ),
    ]
    assert M._ENC_AC_FASTPATH is True  # production default
    try:
        for arr, kw in cases:
            fast = M._encode_jpeg(arr, **kw)
            M._ENC_AC_FASTPATH = False
            general = M._encode_jpeg(arr, **kw)
            M._ENC_AC_FASTPATH = True
            assert fast == general, (arr.shape, kw)
    finally:
        M._ENC_AC_FASTPATH = True
