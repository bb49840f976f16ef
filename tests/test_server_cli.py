"""CLI server launcher (reference main/main.go:9-27): boot
``python -m opentick_spark.server`` in a real subprocess — its own JVM —
and drive it over TCP with the wire client, mirroring the reference's
server_test.go:33-104 session shape."""

import os
import subprocess
import sys
import time

import pytest

from opentick_spark.client import connect_tcp
from opentick_spark.errors import OpentickError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_server(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("cli_wh"))
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",  # a small JVM boots faster; wire tests are tiny
        SPARK_DRIVER_MEMORY="2g",
        PYTHONPATH=REPO,
    )
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "opentick_spark.server",
            "--addr",
            "127.0.0.1:0",  # ephemeral port, parsed from the ready line
            "--warehouse",
            wh,
            "--cache",
            "60",
            "--protocol",
            "bson",
            "--timeout",
            "1",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd=REPO,
        text=True,
    )
    port = None
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                if proc.poll() is not None:
                    raise RuntimeError(f"server exited rc={proc.returncode}")
                continue
            if line.startswith("OPENTICK_SPARK_LISTENING"):
                port = int(line.split()[2])
                break
        assert port, "server never printed its ready line"
        yield port
    finally:
        proc.terminate()
        try:
            proc.wait(15)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_cli_server_full_session(cli_server):
    c = connect_tcp("127.0.0.1", cli_server, protocol="bson")
    try:
        c.execute("create database clidb")
        c.use("clidb")
        c.execute(
            "create table test(sec int, interval int, tm timestamp, "
            "open double, high double, low double, close double, "
            "v double, vwap double, primary key(sec, interval, tm))"
        )
        c.batch_insert(
            "insert into test(sec, interval, tm, open) values(?, ?, ?, ?)",
            [(1, 1, [t, 0], 2.0 + t) for t in range(5)],
        )
        rows = c.execute("select tm, open from test where sec=? and interval=?", (1, 1))
        assert [(r[0][0], r[1]) for r in rows] == [(t, 2.0 + t) for t in range(5)]
        # prepared select rides the --cache 60 path; repeat must hit
        assert len(c.execute("select * from test where sec=?", (1,))) == 5
        assert len(c.execute("select * from test where sec=?", (1,))) == 5
        # tail read (A3, descending) over the CLI server
        assert c.execute("select open from test where sec=1 and interval=1 limit -2") == [
            (6.0,),
            (5.0,),
        ]
        with pytest.raises(OpentickError, match="does not exist"):
            c.execute("select * from missing")
        assert "clidb" in c.list_databases()
    finally:
        c.close()
