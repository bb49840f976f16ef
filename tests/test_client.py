"""Client facade test mirroring the reference's bindings/python/test.py
flow: DDL, async insert futures, batch insert, selects with datetime
roundtrip, tail read, meta calls."""

import datetime as dt

import pytest

from opentick_spark import client as otc


@pytest.fixture()
def conn(spark, tmp_path):
    c = otc.connect(db_name=None, spark=spark, warehouse=str(tmp_path / "wh"))
    c.execute("create database if not exists test")
    c.use("test")
    c.execute(
        "create table test(sec int, interval int, tm timestamp, open double, "
        "high double, low double, close double, vol double, vwap double, "
        "primary key(sec, interval, tm))"
    )
    yield c
    c.close()


def test_client_flow(conn):
    tm = dt.datetime(2024, 1, 1, 12, 0, 0)
    futs = [
        conn.execute_async(
            "insert into test(sec, interval, tm, open, high, low, close, vol, vwap) "
            "values(?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (1, 1, tm + dt.timedelta(microseconds=k), 2.2, 2.4, 2.1, 2.3, 1e6, 2.25),
        )
        for k in range(20)
    ]
    for f in futs:
        f.get()
    args_array = [
        (1, 2, tm + dt.timedelta(microseconds=k), 2.2, 2.4, 2.1, 2.3, 1e6, 2.25)
        for k in range(50)
    ]
    conn.batch_insert(
        "insert into test(sec, interval, tm, open, high, low, close, vol, vwap) "
        "values(?, ?, ?, ?, ?, ?, ?, ?, ?)",
        args_array,
        batch_size=25,
    )
    rows = conn.execute("select * from test where sec=? and interval=?", (1, 1))
    assert len(rows) == 20
    # datetime roundtrip (reference client returns datetimes)
    assert rows[0][2] == tm
    assert rows[-1][2] == tm + dt.timedelta(microseconds=19)
    rows = conn.execute("select tm, close from test where sec=1 and interval=2 limit -5")
    assert len(rows) == 5
    assert rows[0][0] == tm + dt.timedelta(microseconds=49)  # descending tail
    assert conn.list_databases() == ["test"]
    assert "test" in conn.list_tables()
    keys, values = conn.schema("test")
    assert [n for n, _ in keys] == ["sec", "interval", "tm"]
    assert conn.login("u", "p") is True
    # without permission control the connection is implicit admin and may
    # manage users (localhost-admin grant, server.go:106-110)
    conn.create_user("u", "p")
    assert "u" in conn.list_users()


def test_client_async_select_and_ranges(conn):
    tm = dt.datetime(2024, 1, 1)
    conn.batch_insert(
        "insert into test(sec, interval, tm, open) values(?, ?, ?, ?)",
        [(5, 1, tm + dt.timedelta(seconds=k), float(k)) for k in range(100)],
    )
    futs = [
        conn.execute_async(
            "select open from test where sec=5 and interval=?", (1,)
        )
    ]
    assert len(futs[0].get()) == 100
    parts = otc.split_range(0, 99, 4)
    assert len(parts) == 4
    # execute_split (r11): reference-client result contract — merged,
    # PK-ordered, boundary-deduped; timestamps as datetimes like the
    # rest of the in-process Connection surface
    base = int(tm.replace(tzinfo=dt.timezone.utc).timestamp())
    rows = conn.execute_split(
        "select tm, open from test where sec=5 and interval=1 "
        "and tm>=? and tm<=?",
        otc.split_range(base, base + 99, 4),
    )
    assert len(rows) == 100
    assert rows[0] == (tm, 0.0) and rows[-1] == (
        tm + dt.timedelta(seconds=99),
        99.0,
    )


def test_async_insert_group_commit(conn, spark):
    """100k-style async insert firehose: futures resolve after their
    group commit; the log holds few files, not one per row."""
    tm = dt.datetime(2024, 3, 1)
    futs = [
        conn.execute_async(
            "insert into test(sec, interval, tm, open) values(?, ?, ?, ?)",
            (9, 1, tm + dt.timedelta(microseconds=k), float(k)),
        )
        for k in range(5000)
    ]
    for f in futs:
        f.get(30)
    rows = conn.execute("select open from test where sec=9 and interval=1")
    assert len(rows) == 5000
    st = conn._engine.store("test", "test")
    import os

    n_commits = len(os.listdir(st.log_path))
    assert n_commits < 100  # group commit, not commit-per-row
