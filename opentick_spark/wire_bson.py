"""Minimal BSON codec for the wire protocol (no external dependency).

The reference server speaks BSON by default and JSON behind a
``protocol=json`` switch (server.go:186-207); this is the BSON side,
implemented straight from the public spec (bsonspec.org, version 1.1)
for exactly the types the protocol carries: documents with string keys
and int32/int64/double/string/bool/null/array/nested-document values.
Python ints choose int32 vs int64 by range; both decode back to ``int``.

Element types used: 0x01 double, 0x02 string, 0x03 document, 0x04 array
(document keyed "0", "1", …), 0x05 binary (subtype 0x00 — carries the
server's pre-serialized cached replies, reference reply() key "2"),
0x08 bool, 0x0A null, 0x10 int32, 0x12 int64.
"""

from __future__ import annotations

import struct
from typing import Any

_I32 = struct.Struct("<i")
_I64 = struct.Struct("<q")
_F64 = struct.Struct("<d")

_I32_MIN, _I32_MAX = -(2**31), 2**31 - 1


def _enc_cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise ValueError("BSON cstring cannot contain NUL")
    return b + b"\x00"


# pre-encoded array index cstrings ("0\x00", "1\x00", …): row payloads
# are arrays-of-arrays, so every cell pays a str(i)+NUL key — cache the
# common range (grown on demand) instead of re-encoding per element
_IDX_KEYS: list[bytes] = [str(i).encode() + b"\x00" for i in range(256)]


def _idx_key(i: int) -> bytes:
    try:
        return _IDX_KEYS[i]
    except IndexError:
        _IDX_KEYS.extend(
            str(j).encode() + b"\x00"
            for j in range(len(_IDX_KEYS), i + 256)
        )
        return _IDX_KEYS[i]


def _enc_element(name: str, v: Any, _key: bytes | None = None) -> bytes:
    key = _key if _key is not None else _enc_cstring(name)
    if v is None:
        return b"\x0a" + key
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if _I32_MIN <= v <= _I32_MAX:
            return b"\x10" + key + _I32.pack(v)
        return b"\x12" + key + _I64.pack(v)
    if isinstance(v, float):
        return b"\x01" + key + _F64.pack(v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return b"\x02" + key + _I32.pack(len(b) + 1) + b + b"\x00"
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + key + _I32.pack(len(v)) + b"\x00" + bytes(v)
    if isinstance(v, dict):
        return b"\x03" + key + dumps(v)
    if isinstance(v, (list, tuple)):
        enc, ik = _enc_element, _idx_key
        doc = b"".join(
            enc("", item, ik(i)) for i, item in enumerate(v)
        )
        return b"\x04" + key + _I32.pack(len(doc) + 5) + doc + b"\x00"
    raise TypeError(f"BSON cannot encode {type(v).__name__}")


def dumps(doc: dict) -> bytes:
    """Encode a dict (string keys) to a BSON document."""
    body = b"".join(_enc_element(str(k), v) for k, v in doc.items())
    return _I32.pack(len(body) + 5) + body + b"\x00"


def _dec_cstring(data: bytes, at: int) -> tuple[str, int]:
    end = data.index(b"\x00", at)
    return data[at:end].decode("utf-8"), end + 1


def _dec_element(t: int, data: bytes, at: int) -> tuple[Any, int]:
    if t == 0x0A:
        return None, at
    if t == 0x08:
        return data[at] != 0, at + 1
    if t == 0x10:
        return _I32.unpack_from(data, at)[0], at + 4
    if t == 0x12:
        return _I64.unpack_from(data, at)[0], at + 8
    if t == 0x01:
        return _F64.unpack_from(data, at)[0], at + 8
    if t == 0x02:
        (n,) = _I32.unpack_from(data, at)
        s = data[at + 4 : at + 4 + n - 1].decode("utf-8")
        return s, at + 4 + n
    if t == 0x05:
        (n,) = _I32.unpack_from(data, at)
        # at+4 is the subtype byte (generic 0x00); payload follows
        return data[at + 5 : at + 5 + n], at + 5 + n
    if t == 0x03:
        (n,) = _I32.unpack_from(data, at)
        return _dec_doc(data, at), at + n
    if t == 0x04:
        (n,) = _I32.unpack_from(data, at)
        return _dec_array(data, at), at + n
    raise ValueError(f"BSON type 0x{t:02x} not supported")


def _dec_array(data: bytes, at: int) -> list:
    """Array fast path: element keys are the indices "0","1",… in order,
    so skip past each key cstring without materializing a dict — row
    payloads are arrays-of-arrays and this decode dominates large
    replies."""
    (size,) = _I32.unpack_from(data, at)
    end = at + size - 1
    at += 4
    out: list = []
    dec, idx, append = _dec_element, data.index, out.append
    while at < end:
        t = data[at]
        at = idx(b"\x00", at + 1) + 1  # skip the index key
        v, at = dec(t, data, at)
        append(v)
    return out


def _dec_doc(data: bytes, at: int) -> dict:
    (size,) = _I32.unpack_from(data, at)
    end = at + size - 1  # position of the trailing 0x00
    at += 4
    out: dict = {}
    while at < end:
        t = data[at]
        name, at = _dec_cstring(data, at + 1)
        out[name], at = _dec_element(t, data, at)
    return out


def loads(data: bytes) -> dict:
    """Decode one BSON document to a dict."""
    return _dec_doc(data, 0)
