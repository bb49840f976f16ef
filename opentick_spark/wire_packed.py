"""Packed-columnar result payload for the BSON wire path (key ``1p``).

Pure-Python BSON encoding of a 100k-row, 9-column reply costs ~1.75 s
(PLANS.md r4 measurement) because every CELL pays per-element key/type
bookkeeping — ~4× the C-accelerated json path. This module instead
packs each result COLUMN into one fixed-width binary blob (BSON 0x05)
via ``struct``/``bytes.join`` — one C-level call per column instead of
one BSON element per cell — the write-side sibling of the r4 read-side
array-decode optimization.

Negotiated, never assumed: our client adds ``"5": 1`` to run commands;
the server only answers with ``1p`` when it saw that flag. The
reference's clients (bindings/python client.py:212-227 sends keys
0/1/2/3/4 only) never set it and keep receiving the reference row shape
in key ``"1"`` byte-for-byte (server.go parity, pinned by
tests/test_wire_golden.py).

Payload shape (all values BSON-encodable):
``{"n": row_count, "c": [colspec, ...]}`` where each colspec is
``{"k": kind, ...}``:

- ``q``  int64:   ``d`` = ``<n×q`` blob (NULLs packed as 0, masked)
- ``f``  float64: ``d`` = ``<n×d`` blob
- ``b``  bool:    ``d`` = one byte per row
- ``s``  utf-8:   ``d`` = concatenated bytes, ``o`` = ``<(n+1)×i``
  offsets blob (NULL ≡ empty slice, masked)
- ``t``  timestamp: ``d`` = ``<n×q`` epoch-nanos blob, unpacked back to
  the engine's ``(epoch_sec, nanosec)`` cell tuples
- ``o``  anything else (array cells, mixed): ``v`` = plain BSON list —
  correctness fallback, never fails

Optional ``m`` per colspec = little-endian null bitmap (bit i set ⇒
row i is NULL); omitted when a column has no NULLs (the common case —
zero overhead).
"""

from __future__ import annotations

import struct
from typing import Any

NS = 1_000_000_000


def _null_mask(col: list) -> bytes | None:
    if None not in col:
        return None
    m = bytearray((len(col) + 7) // 8)
    for i, v in enumerate(col):
        if v is None:
            m[i >> 3] |= 1 << (i & 7)
    return bytes(m)


def _pack_col(col: list) -> dict:
    n = len(col)
    sample = next((v for v in col if v is not None), None)
    spec: dict[str, Any]
    if sample is None:
        # all-NULL column: zero-width int blob + full mask
        spec = {"k": "q", "d": struct.pack(f"<{n}q", *([0] * n))}
    elif isinstance(sample, bool):
        spec = {
            "k": "b",
            "d": bytes(bytearray(1 if v else 0 for v in col)),
        }
    elif isinstance(sample, int):
        try:
            spec = {
                "k": "q",
                "d": struct.pack(
                    f"<{n}q", *(0 if v is None else v for v in col)
                ),
            }
        except struct.error:  # out-of-int64 or mixed types
            return {"k": "o", "v": col}
    elif isinstance(sample, float):
        try:
            spec = {
                "k": "f",
                "d": struct.pack(
                    f"<{n}d", *(0.0 if v is None else v for v in col)
                ),
            }
        except struct.error:
            return {"k": "o", "v": col}
    elif isinstance(sample, str):
        try:
            encoded = [b"" if v is None else v.encode("utf-8") for v in col]
        except AttributeError:  # mixed str/non-str
            return {"k": "o", "v": col}
        offsets = [0]
        for e in encoded:
            offsets.append(offsets[-1] + len(e))
        spec = {
            "k": "s",
            "d": b"".join(encoded),
            "o": struct.pack(f"<{n + 1}i", *offsets),
        }
    elif isinstance(sample, tuple) and len(sample) == 2:
        # engine timestamp cells: (epoch_sec, nanosec)
        try:
            spec = {
                "k": "t",
                "d": struct.pack(
                    f"<{n}q",
                    *(
                        0 if v is None else v[0] * NS + v[1]
                        for v in col
                    ),
                ),
            }
        except (struct.error, TypeError, IndexError):
            return {"k": "o", "v": col}
    else:
        return {"k": "o", "v": [list(v) if isinstance(v, tuple) else v for v in col]}
    m = _null_mask(col)
    if m is not None:
        spec["m"] = m
    return spec


def pack_columns(cols: list[list] | None) -> dict | None:
    """Engine column lists → the ``1p`` payload dict (None passthrough
    for row-less statements)."""
    if cols is None:
        return None
    return {"n": len(cols[0]) if cols else 0, "c": [_pack_col(c) for c in cols]}


def _fixed_buf(arr, itemsize: int) -> bytes:
    """The data buffer of a fixed-width Arrow array as bytes, honoring
    a non-zero slice offset."""
    buf = arr.buffers()[1]
    return buf.slice(arr.offset * itemsize, len(arr) * itemsize).to_pybytes()


def _arrow_null_mask(arr):
    """Payload null mask (LSB bitmap, set ⇒ NULL) from an Arrow array —
    ``is_null`` yields a bit-packed boolean array in EXACTLY that
    layout, so the mask is one C call + a buffer copy. Returns None for
    no nulls, or raises to signal the caller's per-column fallback when
    the bitmap is offset (can't be realigned without bit-shifting)."""
    if not arr.null_count:
        return None
    import pyarrow.compute as pc

    nulls = pc.is_null(arr)
    if nulls.offset:
        raise ValueError("offset null bitmap")
    buf = nulls.buffers()[1]
    return buf.slice(0, (len(arr) + 7) // 8).to_pybytes()


def _pack_arrow_col(arr, ot_type: str) -> dict:
    """One column straight from Arrow buffers — C-speed casts + buffer
    slices instead of ``to_pylist`` + per-cell Python. Cell-exact with
    ``_pack_col`` over the engine's materialized cells (the client's
    ``unpack_columns`` is shared and unchanged)."""
    import pyarrow as pa

    t = arr.type
    mask = _arrow_null_mask(arr)
    if arr.null_count:
        # deterministic bytes under the masked slots (masked cells never
        # surface — unpack substitutes None — but garbage bytes would
        # make payloads non-reproducible)
        zero = {"s": "", "f": 0.0, "b": False}.get(
            "s" if pa.types.is_string(t)
            else "f" if pa.types.is_floating(t)
            else "b" if pa.types.is_boolean(t)
            else "q", 0,
        )
        arr = arr.fill_null(zero)
    if ot_type == "timestamp" and pa.types.is_integer(t):
        a = arr.cast(pa.int64())
        spec = {"k": "t", "d": _fixed_buf(a, 8)}
    elif pa.types.is_integer(t):
        a = arr.cast(pa.int64())
        spec = {"k": "q", "d": _fixed_buf(a, 8)}
    elif pa.types.is_floating(t):
        a = arr.cast(pa.float64())
        spec = {"k": "f", "d": _fixed_buf(a, 8)}
    elif pa.types.is_boolean(t):
        a = arr.cast(pa.uint8())
        spec = {"k": "b", "d": _fixed_buf(a, 1)}
    elif pa.types.is_string(t) and arr.offset == 0:
        bufs = arr.buffers()  # [validity, int32 offsets, utf-8 data]
        offsets = bufs[1].slice(0, (len(arr) + 1) * 4).to_pybytes()
        end = struct.unpack_from("<i", offsets, len(arr) * 4)[0]
        data = bufs[2].slice(0, end).to_pybytes() if bufs[2] else b""
        spec = {"k": "s", "d": data, "o": offsets}
    else:
        raise ValueError(f"no buffer path for {t}")
    if mask is not None:
        spec["m"] = mask
    return spec


def pack_arrow_table(tbl, cols: list[tuple]) -> dict:
    """A sorted Arrow result table → the ``1p`` payload, column-wise
    zero-Python where the type allows (int/float/bool/string/ns-long
    timestamps); anything else falls back per column to the
    ``to_pylist`` + ``_pack_col`` cell path (timestamps converted to
    the engine's (sec, nsec) tuples first, so the fallback stays
    cell-exact). ``cols`` = [(name, opentick_type), ...] in reply
    order."""
    out = []
    for name, ot_type in cols:
        arr = tbl.column(name).combine_chunks()
        try:
            out.append(_pack_arrow_col(arr, ot_type))
        except Exception:
            cells = arr.to_pylist()
            if ot_type == "timestamp":
                # engine ts cells are ns int64; anything else (never
                # produced by engine tables) rides _pack_col's "o" leg
                cells = [
                    divmod(v, NS) if isinstance(v, int) else v
                    for v in cells
                ]
            out.append(_pack_col(cells))
    return {"n": tbl.num_rows, "c": out}


def _unpack_col(spec: dict, n: int) -> list:
    kind = spec["k"]
    if kind == "o":
        return [tuple(v) if isinstance(v, list) else v for v in spec["v"]]
    mask = spec.get("m")

    def masked(vals: list) -> list:
        if mask is None:
            return vals
        return [
            None if mask[i >> 3] & (1 << (i & 7)) else v
            for i, v in enumerate(vals)
        ]

    if kind == "q":
        return masked(list(struct.unpack(f"<{n}q", spec["d"])))
    if kind == "f":
        return masked(list(struct.unpack(f"<{n}d", spec["d"])))
    if kind == "b":
        return masked([bool(b) for b in spec["d"]])
    if kind == "t":
        return masked(
            [divmod(v, NS) for v in struct.unpack(f"<{n}q", spec["d"])]
        )
    if kind == "s":
        data = spec["d"]
        offsets = struct.unpack(f"<{n + 1}i", spec["o"])
        return masked(
            [
                data[offsets[i] : offsets[i + 1]].decode("utf-8")
                for i in range(n)
            ]
        )
    raise ValueError(f"unknown packed column kind: {kind!r}")


def unpack_columns(payload: dict) -> list[list]:
    """The ``1p`` payload → column lists (cells match what the row
    shape would have carried: ints, floats, bools, strs, (sec, nsec)
    timestamp tuples, None)."""
    n = payload["n"]
    return [_unpack_col(spec, n) for spec in payload["c"]]
