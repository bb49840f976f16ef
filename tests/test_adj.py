"""Golden adj tests reproducing adj_test.go:15-75 numerically (FIXTURES.md F2).

bar(a int, b timestamp, c double, d double, vol double, primary key(a, b));
_adj_ rows (sec=1): (1, 0.25, 4), (3, 0.5, 2), (5, 0.2, 5).
"""

import pytest

from opentick_spark.errors import OpentickError
from opentick_spark.operators.adj import cumulative_factors


@pytest.fixture()
def bar(engine):
    engine.execute("create database d")
    engine.use("d")
    engine.execute(
        "create table bar(a int, b timestamp, c double, d double, vol double, "
        "primary key(a, b))"
    )
    for t, px, vol in [(1, 0.25, 4.0), (3, 0.5, 2.0), (5, 0.2, 5.0)]:
        engine.execute("insert into _adj_(sec, time, px, vol) values(?, ?, ?, ?)", 1, t, px, vol)
    for t, v in [(0, 1.0), (2, 1.0), (3, 1.0), (4, 1.0), (5, 1.0), (99, 1.5), (100, 1.0)]:
        engine.execute(
            "insert into bar(a, b, c, d, vol) values(?, ?, ?, ?, ?)", 1, t, v, v, v
        )
    return engine


def approx(rows, expected):
    assert len(rows) == len(expected), (rows, expected)
    for r, e in zip(rows, expected):
        assert len(r) == len(e)
        for a, b in zip(r, e):
            if isinstance(b, float):
                assert a == pytest.approx(b, rel=1e-12), (rows, expected)
            else:
                assert a == b, (rows, expected)


def test_cumulative_factors(bar, spark):
    # golden: [{1 0.025 40 4 0.25} {3 0.1 10 8 0.125} {5 0.2 5 40 0.025}]
    adj_df = bar.store("d", "_adj_").read(spark)
    f = cumulative_factors(adj_df).orderBy("time").collect()
    got = [(r.time, r.px_f, r.vol_f, 1 / r.px_b, 1 / r.vol_b) for r in f]
    # adj_test.go:20 lists {Tm, Px, Vol, PxB, VolB} with PxB/VolB as the
    # *inverse-prefix* products: PxB[0]=4 means multiplier 4.
    expected = [
        (1_000_000_000, 0.025, 40.0, 0.25, 4.0),
        (3_000_000_000, 0.1, 10.0, 0.125, 8.0),
        (5_000_000_000, 0.2, 5.0, 0.025, 40.0),
    ]
    for g, e in zip(got, expected):
        assert g[0] == e[0]
        assert g[1] == pytest.approx(e[1])
        assert g[2] == pytest.approx(e[2])
        # backward multiplier = px_b (1/prefix-product)
    bwd = [(r.time, r.px_b, r.vol_b) for r in f]
    expected_bwd = [
        (1_000_000_000, 4.0, 0.25),
        (3_000_000_000, 8.0, 0.125),
        (5_000_000_000, 40.0, 0.025),
    ]
    for g, e in zip(bwd, expected_bwd):
        assert g[1] == pytest.approx(e[1])
        assert g[2] == pytest.approx(e[2])


def test_forward_adjustment(bar):
    # adj_test.go:37-54 golden: event exactly at row time EXCLUDED forward
    rows = bar.execute_rows("select b, adj(c), adj(d), adj(vol) from bar where a=1")
    got = [(r[0][0], r[1], r[2], r[3]) for r in rows]
    expected = [
        (0, 0.025, 0.025, 40.0),
        (2, 0.1, 0.1, 10.0),
        (3, 0.2, 0.2, 5.0),
        (4, 0.2, 0.2, 5.0),
        (5, 1.0, 1.0, 1.0),
        (99, 1.5, 1.5, 1.5),
        (100, 1.0, 1.0, 1.0),
    ]
    approx(got, expected)


def test_forward_point_and_tail(bar):
    rows = bar.execute_rows("select b, adj(c), adj(vol) from bar where a=1 and b=4")
    got = [(r[0][0], r[1], r[2]) for r in rows]
    approx(got, [(4, 0.2, 5.0)])
    # limit -10 returns descending (adj_test.go:51-54)
    rows = bar.execute_rows("select b, adj(c) from bar where a=1 limit -3")
    got = [(r[0][0], r[1]) for r in rows]
    approx(got, [(100, 1.0), (99, 1.5), (5, 1.0)])


def test_backward_adjustment(bar):
    # adj_test.go:56-72 golden: event exactly at row time INCLUDED backward
    rows = bar.execute_rows(
        "select b, adj(c, true), adj(d, true), adj(vol, true) from bar where a=1"
    )
    got = [(r[0][0], r[1], r[2], r[3]) for r in rows]
    expected = [
        (0, 1.0, 1.0, 1.0),
        (2, 4.0, 4.0, 0.25),
        (3, 8.0, 8.0, 0.125),
        (4, 8.0, 8.0, 0.125),
        (5, 40.0, 40.0, 0.025),
        (99, 60.0, 60.0, 0.0375),
        (100, 40.0, 40.0, 0.025),
    ]
    approx(got, expected)


def test_mixed_fwd_bwd_rejected(bar):
    with pytest.raises(OpentickError) as ei:
        bar.execute("select adj(c), adj(d, true) from bar where a=1")
    assert str(ei.value) == "Mixed backward and forward adj not allowed"


def test_adj_requirements(bar):
    bar.execute("create table nokey(x text, c double, primary key(x))")
    with pytest.raises(OpentickError) as ei:
        bar.execute("select adj(c) from nokey")
    assert str(ei.value) == "The first key of the table must be int for applying adj"


def test_adj_vol_dispatch_by_name(bar):
    # name contains qty/vol/size → volume factor (query.go:397-404)
    rows = bar.execute_rows("select b, adj(vol) from bar where a=1 and b=0")
    assert rows[0][1] == pytest.approx(40.0)
    rows = bar.execute_rows("select b, adj_px(vol) from bar where a=1 and b=0")
    assert rows[0][1] == pytest.approx(0.025)


def test_zero_factor_treated_as_one(engine):
    engine.execute("create database z")
    engine.use("z")
    engine.execute(
        "create table bar(a int, b timestamp, c double, primary key(a, b))"
    )
    engine.execute("insert into _adj_(sec, time, px, vol) values(1, 2, 0, 0)")
    engine.execute("insert into bar(a, b, c) values(1, 1, 10)")
    rows = engine.execute_rows("select adj(c) from bar where a=1")
    assert rows == [(10.0,)]


def test_adj_three_part_pk(engine):
    """adj on the canonical (sec, interval, tm) table (server_test.go:53):
    first key int + last key timestamp, middle keys untouched."""
    engine.execute("create database adj3")
    engine.use("adj3")
    engine.execute(
        "create table bars(sec int, interval int, tm timestamp, close double, "
        "vol double, primary key(sec, interval, tm))"
    )
    pid = engine.prepare(
        "insert into bars(sec, interval, tm, close, vol) values(?, ?, ?, ?, ?)"
    )
    engine.batch_insert(
        pid, [(1, itv, t, 100.0, 10.0) for itv in (1, 2) for t in (1, 4, 100)]
    )
    engine.execute(
        "insert into _adj_(sec, time, px, vol) values(?, ?, ?, ?)", 1, 5, 0.5, 2.0
    )
    rows = engine.execute_rows(
        "select tm, adj(close), adj(vol) from bars where sec=1 and interval=2"
    )
    # events at t<=4 are before the factor at t=5 → adjusted; t=100 is after
    assert rows == [
        ((1, 0), 50.0, 20.0),
        ((4, 0), 50.0, 20.0),
        ((100, 0), 100.0, 10.0),
    ]

def _skewed_frames(spark):
    """One hyper-hot sec (90% of rows) + several cold ones; factor events
    at times that exercise boundary semantics (rows exactly AT event
    times, before the first event, after the last)."""
    rows = [(1, t, float(t % 7 + 1), float(t % 5 + 1)) for t in range(0, 900)]
    rows += [(s, t, float(t + s), float(t)) for s in (2, 3, 4) for t in (0, 10, 50)]
    rdf = spark.createDataFrame(rows, "sec int, tm long, px double, qty double")
    adj = [(1, 100, 0.5, 2.0), (1, 500, 0.25, 4.0), (3, 10, 0.5, 2.0)]
    adf = spark.createDataFrame(adj, "sec long, time long, px double, vol double")
    return rdf, adf


@pytest.mark.parametrize("backward", [False, True])
def test_broadcast_strategy_matches_merge(spark, backward):
    """Skew hardening: the broadcast-interval plan must be value-identical
    to the sorted-merge window plan on a skewed stream, both directions."""
    from opentick_spark.operators.adj import apply_adj

    rdf, adf = _skewed_frames(spark)
    kw = dict(
        sec_col="sec", time_col="tm", px_cols=["px"], vol_cols=["qty"],
        backward=backward,
    )
    merge = apply_adj(rdf, adf, strategy="merge", **kw)
    bcast = apply_adj(rdf, adf, strategy="broadcast", **kw)
    a = sorted(map(tuple, merge.collect()))
    b = sorted(map(tuple, bcast.collect()))
    assert len(a) == len(b) == rdf.count()
    for x, y in zip(a, b):
        assert x == pytest.approx(y), (x, y)


def test_broadcast_strategy_plan_has_no_row_exchange(spark):
    """The broadcast-interval plan must not shuffle the row stream: the
    only Exchange is the tiny factor table's window prep + its
    BroadcastExchange; the rows side joins in place."""
    from opentick_spark.operators.adj import apply_adj

    rdf, adf = _skewed_frames(spark)
    df = apply_adj(
        rdf, adf, sec_col="sec", time_col="tm", px_cols=["px"],
        vol_cols=["qty"], strategy="broadcast",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # every Exchange in the plan belongs to the factor side: hash
    # exchanges only on the factor window key, plus one BroadcastExchange
    import re

    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+),", plan)
    assert all(k.startswith("sec") for k in hash_exchanges), hash_exchanges
    assert len(hash_exchanges) <= 1, plan.count("Exchange")


def test_invalid_strategy_rejected(spark):
    from opentick_spark.operators.adj import with_adj_factors

    rdf, adf = _skewed_frames(spark)
    with pytest.raises(ValueError):
        with_adj_factors(rdf, adf, "sec", "tm", False, strategy="bogus")


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 120])
def test_skew_buckets_matches_merge(spark, direction, tolerance):
    """Skew hardening #2: time-bucketed sub-partitioning of the sorted
    merge (asof.py skew_buckets) must be value-identical to the plain
    merge — hot key, both directions, with/without tolerance. Bucket
    boundaries land inside, between, and exactly on event times."""
    from opentick_spark.operators.asof import asof_join

    rdf, adf = _skewed_frames(spark)
    kw = dict(
        on=["sec"], left_time="tm", right_time="time",
        value_cols=["px", "vol"], direction=direction, tolerance=tolerance,
    )
    rdf = rdf.withColumn("sec", rdf["sec"].cast("long"))
    plain = sorted(map(tuple, asof_join(rdf, adf, **kw).collect()))
    for n in (2, 8, 64):  # 64 > span/… exercises near-empty buckets
        bucketed = sorted(
            map(tuple, asof_join(rdf, adf, skew_buckets=n, **kw).collect())
        )
        assert bucketed == plain, (n, bucketed[:3], plain[:3])


def test_skew_buckets_window_partitions_on_bucket(spark):
    """The heavy window must hash-partition on (key, time-bucket), not
    (key,) alone — that is the entire point of skew_buckets."""
    from opentick_spark.operators.asof import asof_join

    rdf, adf = _skewed_frames(spark)
    rdf = rdf.withColumn("sec", rdf["sec"].cast("long"))
    df = asof_join(
        rdf, adf, on=["sec"], left_time="tm", right_time="time",
        value_cols=["px"], skew_buckets=8,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(sec" in plan and "__b" in plan, plan
