"""Optional TCP ingress for the engine — the reference's wire surface
re-expressed over the in-process Spark engine.

Protocol (C9, server.go:117-173, 186-207, 288-291): 4-byte little-endian
length prefix + message body. The reference speaks BSON by default with a
``protocol=json`` switch; this environment ships no BSON codec, so the
JSON variant is implemented and the framing layer is codec-agnostic (a
BSON codec drops in by swapping ``_dumps``/``_loads``). Message shape
(server.go:288-331):

    request : {"0": ticket, "1": cmd, "2": sql-or-prepared-id,
               "3": args, "4": async-flag}
    reply   : {"0": ticket, "1": rows-or-error-string}

Rows are lists of lists; timestamp cells are ``[epoch_sec, nanosec]``
pairs exactly like the reference's tuple encoding
(client/opentick.go:278-284). Errors travel as strings in key "1".

Heartbeat (C10, server.go:127-139): the server pushes a 1-byte ``H``
frame every ``heartbeat_s``; clients treat it as liveness and never
reply. Dispatch concurrency is bounded (sMaxConcurrency analog,
server.go:245). Each connection gets its OWN :class:`Engine` (session
db + login are per-connection state, server.go:399-439) over the shared
SparkSession + warehouse — the Spark analog of the reference's one
server process over one FDB cluster, which also makes the reference's
FDB connection pool (C12, server.go:21-32) genuinely n/a here.

Scale posture: the server is an *ingress facade*, not the compute path —
every query still executes as a distributed Spark plan; the TCP layer
only carries SQL in and collected client-sized results out.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from opentick_spark.engine import Engine
from opentick_spark.errors import OpentickError

_LEN = struct.Struct("<I")


def _dumps(msg: dict) -> bytes:
    return json.dumps(msg, separators=(",", ":")).encode("utf-8")


def _loads(body: bytes) -> dict:
    return json.loads(body.decode("utf-8"))


def _codecs() -> dict:
    from opentick_spark import wire_bson

    # reference default is BSON with a protocol=json switch
    # (server.go:186-207); both ride the same length-prefixed framing
    return {"json": (_dumps, _loads), "bson": (wire_bson.dumps, wire_bson.loads)}


def send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(_LEN.pack(len(payload)) + payload)


MAX_FRAME = 256 * 1024 * 1024  # corrupt/hostile length prefix guard


def recv_frame(sock: socket.socket) -> bytes | None:
    """Read one length-prefixed frame; None on clean EOF."""
    head = _recv_exact(sock, 4)
    if head is None:
        return None
    (n,) = _LEN.unpack(head)
    if n == 0:
        return b""
    if n > MAX_FRAME:
        raise OSError(f"frame length {n} exceeds MAX_FRAME")
    return _recv_exact(sock, n)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _jsonable_rows(rows: list[tuple] | None) -> list[list] | None:
    if rows is None:
        return None
    # execute_rows returns timestamp cells as (sec, nsec) tuples; JSON
    # renders tuples as lists — exactly the wire shape the clients expect
    return [list(r) for r in rows]


class _Session:
    """One TCP connection: reader loop, per-connection Engine + prepared
    registry, serialized writes."""

    def __init__(self, server: OpentickServer, sock: socket.socket):
        self.server = server
        self.sock = sock
        self.engine = Engine(
            server.spark,
            server.warehouse,
            permission_control=server.permission_control,
        )
        self.prepared: dict[int, int] = {}  # wire id -> engine prepared id
        self._next_id = 0
        self._wlock = threading.Lock()
        self.alive = True

    def send(self, payload: bytes) -> None:
        with self._wlock:
            send_frame(self.sock, payload)

    def reply(self, ticket: Any, result: Any) -> None:
        try:
            self.send(self.server._enc({"0": ticket, "1": result}))
        except OSError:
            self.alive = False

    def run(self) -> None:
        try:
            while self.alive:
                body = recv_frame(self.sock)
                if body is None:
                    break
                if body in (b"H", b""):
                    continue  # client-side heartbeat/noop
                try:
                    msg = self.server._dec(body)
                except Exception:
                    break  # undecodable frame: drop THIS session only
                self.server._dispatch(self, msg)
        except OSError:
            pass
        finally:
            self.alive = False
            self.server._drop(self)
            try:
                self.sock.close()
            except OSError:
                pass

    # executed on the dispatch pool ------------------------------------
    def handle(self, msg: dict) -> None:
        ticket = msg.get("0")
        try:
            cmd = msg.get("1")
            if cmd == "prepare":
                pid = self.engine.prepare(msg["2"])
                self._next_id += 1
                self.prepared[self._next_id] = pid
                self.reply(ticket, self._next_id)
                return
            if cmd == "run":
                what = msg["2"]
                args = tuple(msg.get("3") or ())
                if isinstance(what, int):
                    what = self._engine_pid(what)
                rows = self.engine.execute_rows(what, *args)
                self.reply(ticket, _jsonable_rows(rows))
                return
            if cmd == "batch":
                pid = self._engine_pid(msg["2"])
                rows = [tuple(r) for r in msg.get("3") or []]
                self.engine.batch_insert(pid, rows)
                self.reply(ticket, None)
                return
            if cmd == "use":
                self.engine.use(msg["2"])
                self.reply(ticket, None)
                return
            if cmd == "login":
                user, pwd = msg["2"], msg.get("3")
                if self.engine.permission_control:
                    self.engine.login(user, pwd)
                self.reply(ticket, None)
                return
            if cmd == "meta":
                self.reply(ticket, self._meta(msg.get("2"), msg.get("3")))
                return
            self.reply(ticket, f"Unknown command: {cmd!r}")
        except OpentickError as e:
            self.reply(ticket, str(e))
        except Exception as e:  # wire must answer every ticket
            self.reply(ticket, f"{type(e).__name__}: {e}")

    def _engine_pid(self, wire_id: int) -> int:
        try:
            return self.prepared[wire_id]
        except KeyError:
            raise OpentickError("Invalid prepared statement id") from None

    def _meta(self, sub: str, arg: Any):
        if sub == "list_databases":
            return self.engine.list_databases()
        if sub == "list_tables":
            return self.engine.list_tables()
        if sub == "schema":
            keys, vals = self.engine.table_meta(self.engine.current_db, arg)
            return [[n, t, True] for n, t in keys] + [
                [n, t, False] for n, t in vals
            ]
        raise OpentickError(f"Unknown meta command: {sub!r}")


class OpentickServer:
    """Threaded length-prefixed-JSON TCP server over one SparkSession."""

    def __init__(
        self,
        spark,
        warehouse: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_concurrency: int = 100,
        heartbeat_s: float = 10.0,
        permission_control: bool = False,
        protocol: str = "json",
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.host = host
        self._port = port
        try:
            self._enc, self._dec = _codecs()[protocol]
        except KeyError:
            raise ValueError(f"Unknown protocol: {protocol!r}") from None
        self.protocol = protocol
        self.heartbeat_s = heartbeat_s
        self.permission_control = permission_control
        self._pool = ThreadPoolExecutor(max_workers=min(max_concurrency, 64))
        self._gate = threading.Semaphore(max_concurrency)
        self._sessions: set[_Session] = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._listener: socket.socket | None = None

    # -- lifecycle -----------------------------------------------------
    @property
    def port(self) -> int:
        return self._port

    def start(self) -> OpentickServer:
        self._listener = socket.create_server(
            (self.host, self._port), reuse_port=False
        )
        self._port = self._listener.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        threading.Thread(target=self._heartbeat_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass
        with self._lock:
            sessions = list(self._sessions)
        for s in sessions:
            try:
                s.sock.close()
            except OSError:
                pass
        self._pool.shutdown(wait=False)

    # -- internals -----------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._listener.accept()
            except OSError:
                return
            sess = _Session(self, sock)
            with self._lock:
                self._sessions.add(sess)
            threading.Thread(target=sess.run, daemon=True).start()

    def _heartbeat_loop(self) -> None:
        while not self._stop.wait(self.heartbeat_s):
            with self._lock:
                sessions = list(self._sessions)
            for s in sessions:
                try:
                    s.send(b"H")
                except OSError:
                    s.alive = False

    def _dispatch(self, sess: _Session, msg: dict) -> None:
        self._gate.acquire()

        def work():
            try:
                sess.handle(msg)
            finally:
                self._gate.release()

        self._pool.submit(work)

    def _drop(self, sess: _Session) -> None:
        with self._lock:
            self._sessions.discard(sess)
