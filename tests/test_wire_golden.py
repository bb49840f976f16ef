"""Golden-frame wire interop (r5, VERDICT item 4): drive OpentickServer
with the exact BYTES the reference's Python client emits, decoded and
encoded by an independent mini-codec written from the public BSON spec —
deliberately NOT ``opentick_spark.wire_bson``, so a shared codec bug
cannot self-certify.

The reference client (bindings/python/opentick/client.py) emits:

- frame     = ``struct.pack('<I', len(body)) + body`` (client.py:403-412)
- prepare   = BSON ``{'0': ticket, '1': 'prepare', '2': sql}`` (:301-307)
- run       = ``{'0': t, '1': 'run', '2': sql-or-prepared-id, '3': args,
  '4': 1}`` (:212-227); datetimes pre-converted to ``[sec, nsec]`` int
  pairs (:292-299)
- batch     = ``{'0': t, '1': 'batch', '2': prepared-id, '3': argsArray}``
  (:245-261)
- login/use = ``{'0': t, '1': cmd, '2': 'user password [db]' | db}``
  (:112-120, 176-179 — note login SPACE-JOINS into key "2")
- meta      = ``{'0': t, '1': 'meta', '2': 'schema bars' | …}`` (:182-188)
- replies   : BSON ``{'0': ticket, '1': payload}``; strings in '1' are
  errors, ``meta schema`` returns ``[[keys],[values]]`` of [name, type]
  (server.go:461-477); 1-byte ``H`` frames are heartbeats the client
  absorbs and answers with an empty frame (:364-368, 403-406).

One frame is additionally pinned as a hand-derived hex literal so the
mini-codec itself is anchored to the spec, not to this repo.
"""

import socket
import struct

import pytest

from opentick_spark.server import OpentickServer

# --------------------------------------------------------------- mini-codec
# independent BSON subset encoder/decoder (public spec: bsonspec.org);
# covers exactly the element types the reference client can emit:
# 0x01 double, 0x02 string, 0x04 array, 0x08 bool, 0x0A null,
# 0x10 int32, 0x12 int64


def _el(key: str, v) -> bytes:
    k = key.encode() + b"\x00"
    if v is None:
        return b"\x0a" + k
    if isinstance(v, bool):
        return b"\x08" + k + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + k + struct.pack("<i", v)
        return b"\x12" + k + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + k + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return b"\x02" + k + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, (list, tuple)):
        inner = b"".join(_el(str(i), x) for i, x in enumerate(v))
        return b"\x04" + k + struct.pack("<i", len(inner) + 5) + inner + b"\x00"
    raise TypeError(type(v))


def _doc(d: dict) -> bytes:
    inner = b"".join(_el(k, v) for k, v in d.items())
    return struct.pack("<i", len(inner) + 5) + inner + b"\x00"


def _frame(d: dict) -> bytes:
    body = _doc(d)
    return struct.pack("<I", len(body)) + body


def _dec_doc(data: bytes, at: int = 0):
    end = at + struct.unpack_from("<i", data, at)[0]
    at += 4
    out = {}
    while data[at] != 0:
        t = data[at]
        at += 1
        z = data.index(b"\x00", at)
        key = data[at:z].decode()
        at = z + 1
        if t == 0x0A:
            out[key] = None
        elif t == 0x08:
            out[key] = data[at] == 1
            at += 1
        elif t == 0x10:
            out[key] = struct.unpack_from("<i", data, at)[0]
            at += 4
        elif t == 0x12:
            out[key] = struct.unpack_from("<q", data, at)[0]
            at += 8
        elif t == 0x01:
            out[key] = struct.unpack_from("<d", data, at)[0]
            at += 8
        elif t == 0x02:
            n = struct.unpack_from("<i", data, at)[0]
            out[key] = data[at + 4 : at + 4 + n - 1].decode()
            at += 4 + n
        elif t in (0x03, 0x04):
            sub, at = _dec_doc(data, at)
            out[key] = list(sub.values()) if t == 0x04 else sub
        elif t == 0x05:
            n = struct.unpack_from("<i", data, at)[0]
            out[key] = bytes(data[at + 5 : at + 5 + n])
            at += 5 + n
        else:
            raise AssertionError(f"unexpected BSON type 0x{t:02x}")
    assert at + 1 == end, (at, end)
    return out, end


# hand-derived from the BSON spec, byte by byte: the frame the reference
# client sends for prepare(ticket=1, sql="select * from t") — doc length
# 0x32 = 4 + (1+2+4) + (1+2+4+8) + (1+2+4+16) + 1
GOLDEN_PREPARE_FRAME = bytes.fromhex(
    "32000000"  # frame length prefix (<I 50)
    "32000000"  # document length (int32 50)
    "103000" "01000000"  # 0x10 '0\0' int32 ticket=1
    "023100" "08000000" "70726570617265" "00"  # 0x02 '1\0' "prepare"
    "023200" "10000000" "73656c656374202a2066726f6d2074" "00"  # '2' sql
    "00"  # document terminator
)


def test_mini_codec_matches_hand_derived_golden():
    assert (
        _frame({"0": 1, "1": "prepare", "2": "select * from t"})
        == GOLDEN_PREPARE_FRAME
    )
    doc, _ = _dec_doc(GOLDEN_PREPARE_FRAME[4:])
    assert doc == {"0": 1, "1": "prepare", "2": "select * from t"}


# ----------------------------------------------------------------- harness
class RawClient:
    """Byte-level stand-in for the reference client's socket loop."""

    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port), timeout=30)
        self.ticket = 0

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            got = self.sock.recv(n - len(buf))
            assert got, "connection closed"
            buf += got
        return buf

    def exchange(self, cmd: dict):
        self.ticket += 1
        cmd = {"0": self.ticket, **cmd}
        self.sock.sendall(_frame(cmd))
        while True:
            n = struct.unpack("<I", self._recv_exact(4))[0]
            body = self._recv_exact(n) if n else b""
            if n == 1 and body == b"H":  # heartbeat: ack like client.py:366
                self.sock.sendall(struct.pack("<I", 0))
                continue
            msg, _ = _dec_doc(body)
            assert msg["0"] == self.ticket
            return msg

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wire_golden") / "wh")
    srv = OpentickServer(spark, wh, heartbeat_s=0.2, protocol="bson").start()
    yield srv
    srv.stop()


@pytest.fixture()
def raw(server):
    c = RawClient(server.host, server.port)
    yield c
    c.close()


# ------------------------------------------------------------------- tests
def test_reference_client_session_end_to_end(raw):
    """One full session exactly as the reference Python client would
    emit it: login (space-joined) → create db → use → create table →
    prepare (the golden frame bytes) → batch insert → prepared
    parameterized select → full select with [sec, nsec] timestamps →
    meta schema (nested reply shape) → error-as-string."""
    # login: space-joined "user password" in key "2" (client.py:112-120)
    assert raw.exchange({"1": "login", "2": "alice secret"})["1"] is None
    assert (
        raw.exchange({"1": "run", "2": "create database wg", "3": [], "4": 1})[
            "1"
        ]
        is None
    )
    assert raw.exchange({"1": "use", "2": "wg"})["1"] is None
    assert (
        raw.exchange(
            {
                "1": "run",
                "2": "create table t(a int, tm timestamp, px double, "
                "primary key(a, tm))",
                "3": [],
                "4": 1,
            }
        )["1"]
        is None
    )
    # prepare via the hand-pinned golden frame path (same encoder)
    pid = raw.exchange(
        {"1": "prepare", "2": "insert into t(a, tm, px) values(?, ?, ?)"}
    )["1"]
    assert isinstance(pid, int)
    # batch: argsArray with [sec, nsec] timestamp pairs (client.py:292)
    assert (
        raw.exchange(
            {
                "1": "batch",
                "2": pid,
                "3": [[1, [5, 0], 2.5], [2, [6, 500], 3.5]],
            }
        )["1"]
        is None
    )
    # prepared parameterized select, reference-style
    sel = raw.exchange({"1": "prepare", "2": "select px from t where a=?"})[
        "1"
    ]
    rows = raw.exchange({"1": "run", "2": sel, "3": [2], "4": 1})["1"]
    assert rows == [[3.5]]
    # timestamps come back as [sec, nsec] pairs the reference client
    # turns into datetimes (client.py:430-440)
    rows = raw.exchange(
        {"1": "run", "2": "select * from t", "3": [], "4": 1}
    )["1"]
    assert rows == [[1, [5, 0], 2.5], [2, [6, 500], 3.5]]
    # meta, space-joined into "2" (client.py:188), nested reply shape
    sch = raw.exchange({"1": "meta", "2": "schema t"})["1"]
    assert sch == [
        [["a", "int"], ["tm", "timestamp"]],
        [["px", "double"]],
    ]
    dbs = raw.exchange({"1": "meta", "2": "list_databases"})["1"]
    assert "wg" in dbs
    # errors travel as strings in key "1" (Future.get raises on str)
    bad = raw.exchange({"1": "run", "2": "select * from nope", "3": []})["1"]
    assert isinstance(bad, str)


def test_login_validation_matches_reference_strings(raw):
    # server.go:401-404: fewer than two space-separated tokens
    assert (
        raw.exchange({"1": "login", "2": "only_user"})["1"]
        == "Both username and password required"
    )


def test_meta_without_subcommand(raw):
    assert (
        raw.exchange({"1": "meta", "2": ""})["1"]
        == "Please specify meta command"
    )


def test_heartbeats_interleave_without_corrupting_stream(raw):
    import time

    raw.exchange({"1": "run", "2": "create database wg2", "3": []})
    raw.exchange({"1": "use", "2": "wg2"})
    raw.exchange({"1": "run", "2": "create table h(a int, primary key(a))", "3": []})
    time.sleep(0.7)  # several 0.2 s heartbeats traverse the socket
    raw.exchange({"1": "run", "2": "insert into h(a) values(7)", "3": []})
    time.sleep(0.5)
    rows = raw.exchange({"1": "run", "2": "select * from h", "3": []})["1"]
    assert rows == [[7]]


# -------------------------------------------------- protocol negotiation
def test_json_client_negotiates_on_bson_server(server):
    """The reference serves BOTH protocols on one port: a json client
    announces itself with a literal 'protocol=json' frame
    (server.go:288-291). Our json client must work against the
    bson-DEFAULT server through that switch."""
    from opentick_spark.client import connect_tcp

    c = connect_tcp(server.host, server.port, protocol="json")
    try:
        c.execute("create database pn")
        c.use("pn")
        c.execute("create table t(a int, v double, primary key(a))")
        c.execute("insert into t(a, v) values(1, 2.5)")
        assert c.execute("select * from t") == [(1, 2.5)]
    finally:
        c.close()


def test_mixed_protocol_sessions_coexist(server):
    """One bson session and one json session on the same server, both
    live at once — per-connection codecs must not bleed."""
    from opentick_spark.client import connect_tcp

    cb = connect_tcp(server.host, server.port, protocol="bson")
    cj = connect_tcp(server.host, server.port, protocol="json")
    try:
        cb.execute("create database px")
        cb.use("px")
        cj.use("px")
        cb.execute("create table m(a int, primary key(a))")
        cb.execute("insert into m(a) values(1)")
        cj.execute("insert into m(a) values(2)")
        assert cb.execute("select * from m") == [(1,), (2,)]
        assert cj.execute("select * from m") == [(1,), (2,)]
    finally:
        cb.close()
        cj.close()


def test_client_heartbeat_request_gets_empty_frame(raw):
    """A client-sent 1-byte 'H' frame is a heartbeat REQUEST the
    reference answers with an EMPTY frame (server.go:292-295)."""
    raw.sock.sendall(struct.pack("<I", 1) + b"H")
    while True:
        n = struct.unpack("<I", raw._recv_exact(4))[0]
        body = raw._recv_exact(n) if n else b""
        if n == 1 and body == b"H":
            continue  # server's own periodic heartbeat push
        assert n == 0 and body == b""
        break
    # the session is still healthy afterwards
    assert raw.exchange({"1": "meta", "2": "list_databases"})["1"] is not None


def test_malformed_frames_drop_session_not_server(server):
    """Garbage frames (random bytes, truncated BSON, hostile length
    prefix) must kill at most THAT session — the server and concurrent
    sessions stay healthy (the reference's per-connection goroutine
    isolation)."""
    from opentick_spark.client import connect_tcp

    healthy = connect_tcp(server.host, server.port, protocol="bson")
    try:
        healthy.execute("create database rb")
        healthy.use("rb")
        healthy.execute("create table t(a int, primary key(a))")
        for garbage in (
            b"\x00\x01\x02\x03\xff\xfe",
            b"{not json or bson",
            bytes.fromhex("32000000103000"),  # truncated BSON document
            b"protocol=yaml",  # unknown switch literal
        ):
            s = socket.create_connection((server.host, server.port), timeout=10)
            s.sendall(struct.pack("<I", len(garbage)) + garbage)
            s.close()
        # oversize length prefix: receiver must refuse, not allocate
        s = socket.create_connection((server.host, server.port), timeout=10)
        s.sendall(struct.pack("<I", 1 << 30))
        s.close()
        # concurrent session unaffected throughout
        healthy.execute("insert into t(a) values(1)")
        assert healthy.execute("select * from t") == [(1,)]
        # and fresh sessions still connect
        fresh = connect_tcp(server.host, server.port, protocol="json")
        fresh.use("rb")
        assert fresh.execute("select * from t") == [(1,)]
        fresh.close()
    finally:
        healthy.close()


def test_json_client_reconnect_renegotiates(server):
    """Auto-reconnect opens a FRESH socket; the per-connection
    protocol=json announce must be re-sent or the bson-default server
    would misparse every frame after the drop."""
    from opentick_spark.client import connect_tcp

    c = connect_tcp(server.host, server.port, protocol="json")
    try:
        c.execute("create database rj")
        c.use("rj")
        c.execute("create table t(a int, v int, primary key(a))")
        c.execute("insert into t(a, v) values(1, 10)")
        c._sock.close()  # simulate a dropped connection
        c.execute("insert into t(a, v) values(2, 20)")  # reconnect path
        assert c.execute("select * from t") == [(1, 10), (2, 20)]
    finally:
        c.close()
