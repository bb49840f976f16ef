"""Hot-key skew machinery on a genuinely skewed fixture (80% of rows on
one key) — the pytest counterpart of tests/skew_drill.py (which measured
the same shapes at 1M rows: occupancy 0.666 -> 0.022 with skew_buckets,
and 145 s -> ~2.8 s for broadcast with broadcast_buckets)."""

import pytest
from pyspark.sql import functions as F

from opentick_spark.operators.asof import asof_join

HOT = 7


@pytest.fixture(scope="module")
def hot_fixture(spark):
    # 2000 left rows, 80% on key HOT; right = every 5th row per key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 7 % 997).alias("t"),
        F.col("id").alias("rowid"),
    )
    right = spark.range(400).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 31 % 997).alias("rt"),
        (F.col("id") * 1.5).alias("v"),
    )
    return left, right


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_skew_buckets_identical_on_hot_key(spark, hot_fixture, direction):
    left, right = hot_fixture
    plain = asof_join(
        left, right, ["k"], "t", "rt", direction=direction, value_cols=["v"]
    )
    bucketed = asof_join(
        left, right, ["k"], "t", "rt", direction=direction,
        value_cols=["v"], skew_buckets=16,
    )
    assert _rows(plain) == _rows(bucketed)
    # the heavy window must partition by (k, __b), not (k,) alone
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_broadcast_buckets_identical_on_hot_key(spark, hot_fixture, direction):
    left, right = hot_fixture
    merge = asof_join(
        left, right, ["k"], "t", "rt", direction=direction, value_cols=["v"]
    )
    bb = asof_join(
        left, right, ["k"], "t", "rt", direction=direction,
        value_cols=["v"], strategy="broadcast", broadcast_buckets=64,
    )
    assert _rows(merge) == _rows(bb)


def test_broadcast_buckets_is_hash_join_on_bucket_key(spark, hot_fixture):
    """The bucket column must become a hash-join equi-key: the plan is a
    BroadcastHashJoin including __lbkt/__bkt, never a nested loop — that
    equi-key is exactly what bounds the per-left-row interval scan."""
    left, right = hot_fixture
    bb = asof_join(
        left, right, ["k"], "t", "rt", value_cols=["v"],
        strategy="broadcast", broadcast_buckets=64,
    )
    plan = bb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__lbkt" in plan and "__bkt" in plan


def test_broadcast_buckets_tolerance_and_missing_keys(spark, hot_fixture):
    left, right = hot_fixture
    # key 99 exists only on the left -> NULL payload rows survive
    extra = left.union(
        left.limit(3).select(F.lit(99).alias("k"), "t", "rowid")
    )
    merge = asof_join(
        extra, right, ["k"], "t", "rt", value_cols=["v"], tolerance=50
    )
    bb = asof_join(
        extra, right, ["k"], "t", "rt", value_cols=["v"], tolerance=50,
        strategy="broadcast", broadcast_buckets=32,
    )
    assert _rows(merge) == _rows(bb)
    assert bb.filter(F.col("k") == 99).count() == 3
    assert bb.filter(F.col("k") == 99).filter(F.col("v").isNotNull()).count() == 0


def test_ewma_skew_buckets_matches_sequential(spark):
    """Bucketed EWMA composes the per-bucket linear maps exactly: it must
    match the sequential pandas path to FP-associativity tolerance on the
    hot-key fixture (including keys whose rows span many buckets and keys
    living in a single bucket)."""
    from opentick_spark.operators.timeseries import ewma

    # EWMA is order-sensitive: ts must be unique per key (PK semantics),
    # unlike the as-of fixture where ties are resolved by the operator
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 13 % 4001).alias("t"),
        F.col("id").alias("rowid"),
        (F.col("id") % 17 * 1.25).alias("v"),
    )
    seq = {
        (r["k"], r["rowid"]): r["ewma"]
        for r in ewma(left, ["k"], "t", "v", alpha=0.3).collect()
    }
    par = {
        (r["k"], r["rowid"]): r["ewma"]
        for r in ewma(left, ["k"], "t", "v", alpha=0.3, skew_buckets=16).collect()
    }
    assert seq.keys() == par.keys()
    for key, v in seq.items():
        assert par[key] == pytest.approx(v, rel=1e-9, abs=1e-9), key


def test_ewma_skew_buckets_single_row_and_empty(spark):
    from opentick_spark.operators.timeseries import ewma

    one = spark.createDataFrame([(1, 10, 5.0)], "k long, t long, v double")
    got = ewma(one, ["k"], "t", "v", alpha=0.5, skew_buckets=8).collect()
    assert len(got) == 1 and got[0]["ewma"] == pytest.approx(5.0)
    empty = one.filter("k < 0")
    assert ewma(empty, ["k"], "t", "v", alpha=0.5, skew_buckets=8).count() == 0


def test_broadcast_buckets_empty_left(spark, hot_fixture):
    left, right = hot_fixture
    out = asof_join(
        left.filter(F.lit(False)), right, ["k"], "t", "rt",
        value_cols=["v"], strategy="broadcast", broadcast_buckets=32,
    )
    assert out.count() == 0
    assert set(out.columns) == {"k", "t", "rowid", "v"}


def test_rolling_zscore_skew_buckets_matches_plain(spark):
    """Halo-bucketed rolling z-score must reproduce every trailing frame
    exactly: n_window AND zscore identical to the plain window path,
    including the NULL-before-min_obs and constant-window gates."""
    from opentick_spark.operators.timeseries import rolling_zscore

    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 13 % 4001).alias("t"),
        (F.col("id") % 23 * 1.5).alias("v"),
    )
    kw = dict(window_rows=20, min_obs=5)
    plain = {
        (r["k"], r["t"]): (r["n_window"], r["zscore"])
        for r in rolling_zscore(left, ["k"], "t", "v", **kw).collect()
    }
    bucketed = {
        (r["k"], r["t"]): (r["n_window"], r["zscore"])
        for r in rolling_zscore(
            left, ["k"], "t", "v", skew_buckets=16, **kw
        ).collect()
    }
    assert plain.keys() == bucketed.keys()
    for key, (n1, z1) in plain.items():
        n2, z2 = bucketed[key]
        assert n1 == n2, key
        if z1 is None:
            assert z2 is None, key
        else:
            assert z2 == pytest.approx(z1, rel=1e-9, abs=1e-12), key


def test_rolling_zscore_skew_buckets_sparse_buckets(spark):
    """Frames spanning MULTIPLE earlier buckets (sparse buckets with
    fewer rows than the window) must still see the full prefix halo."""
    from opentick_spark.operators.timeseries import rolling_zscore

    # 30 rows, one key, times spread so ~2 rows land per bucket at N=16:
    # every frame of 20 reaches ~10 buckets back
    rows = [(1, i * 100, float(i % 7)) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    kw = dict(window_rows=20, min_obs=3)
    plain = {
        r["t"]: (r["n_window"], r["zscore"])
        for r in rolling_zscore(df, ["k"], "t", "v", **kw).collect()
    }
    bucketed = {
        r["t"]: (r["n_window"], r["zscore"])
        for r in rolling_zscore(df, ["k"], "t", "v", skew_buckets=16, **kw).collect()
    }
    assert plain.keys() == bucketed.keys()
    for t, (n1, z1) in plain.items():
        n2, z2 = bucketed[t]
        assert (n1, z1 is None) == (n2, z2 is None), t
        if z1 is not None:
            assert z2 == pytest.approx(z1, rel=1e-9), t


def test_drawdown_skew_buckets_matches_plain(spark):
    from opentick_spark.operators.timeseries import drawdown

    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 13 % 4001).alias("t"),
        (F.col("id") % 29 * 1.5 + 1.0).alias("p"),
    )
    plain = {
        (r["k"], r["t"]): (r["peak"], r["drawdown"])
        for r in drawdown(left, ["k"], "t", "p").collect()
    }
    bucketed = {
        (r["k"], r["t"]): (r["peak"], r["drawdown"])
        for r in drawdown(left, ["k"], "t", "p", skew_buckets=16).collect()
    }
    assert plain == bucketed


def test_gap_fill_skew_buckets_matches_plain(spark):
    """Carry-composed LOCF: gaps spanning several buckets (and leading
    gaps before any observation) must fill identically to the plain
    unbounded window."""
    from opentick_spark.operators.timeseries import NS, gap_fill

    # sparse observations: many missing buckets between them, two value
    # columns with independent NULL patterns
    rows = []
    for k in (1, 2):
        for i in (0, 1, 9, 10, 47, 90):
            rows.append(
                (
                    k,
                    i * NS,
                    float(i) if i % 3 else None,
                    float(i * 10),
                )
            )
    df = spark.createDataFrame(rows, "k long, b long, x double, y double")
    plain = sorted(
        map(tuple, gap_fill(df, ["k"], "b", ["x", "y"], 1).collect())
    )
    bucketed = sorted(
        map(
            tuple,
            gap_fill(df, ["k"], "b", ["x", "y"], 1, skew_buckets=8).collect(),
        )
    )
    assert plain == bucketed
    assert len(plain) == 2 * 91  # dense spine 0..90 per key


def test_hot_key_detection_and_split(spark, hot_fixture):
    from opentick_spark.operators.skew import split_by_hot_keys

    left, _ = hot_fixture
    # keys 8/9 own 10% each; only key 7 (80%) crosses a 0.3 threshold
    hot, cold, hk = split_by_hot_keys(left, ["k"], threshold=0.3)
    assert [r["k"] for r in hk.collect()] == [HOT]
    assert hot.count() == 1600 and cold.count() == 400
    assert hot.filter(F.col("k") != HOT).count() == 0
    assert cold.filter(F.col("k") == HOT).count() == 0
    # a lower threshold also nets the 10% keys
    hk2 = split_by_hot_keys(left, ["k"], threshold=0.05)[2]
    assert sorted(r["k"] for r in hk2.collect()) == [7, 8, 9]


def test_route_hot_cold_rolling_zscore_identical(spark):
    """Routing (plain path for the long tail, halo-bucketed path for the
    hot keys) must equal the plain path on everything."""
    from opentick_spark.operators.skew import route_hot_cold
    from opentick_spark.operators.timeseries import rolling_zscore

    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 8, F.lit(HOT))
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") * 13 % 4001).alias("t"),
        (F.col("id") % 23 * 1.5).alias("v"),
    )
    kw = dict(window_rows=20, min_obs=5)
    plain = {
        (r["k"], r["t"]): (r["n_window"], r["zscore"])
        for r in rolling_zscore(left, ["k"], "t", "v", **kw).collect()
    }
    routed = {
        (r["k"], r["t"]): (r["n_window"], r["zscore"])
        for r in route_hot_cold(
            left,
            ["k"],
            lambda d: rolling_zscore(d, ["k"], "t", "v", **kw),
            lambda d: rolling_zscore(d, ["k"], "t", "v", skew_buckets=16, **kw),
            threshold=0.05,
        ).collect()
    }
    assert plain.keys() == routed.keys()
    for key, (n1, z1) in plain.items():
        n2, z2 = routed[key]
        assert n1 == n2, key
        if z1 is None:
            assert z2 is None, key
        else:
            assert z2 == pytest.approx(z1, rel=1e-9), key


def test_hot_keys_threshold_validation(spark, hot_fixture):
    from opentick_spark.operators.skew import hot_keys

    left, _ = hot_fixture
    with pytest.raises(ValueError, match="threshold"):
        hot_keys(left, ["k"], threshold=1.5)


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's AQE skew-join handling (session.py enables it) must
    actually split a hot-key partition at runtime: the FINAL adaptive
    plan of an executed skewed join carries the skew=true marker. This
    is the zero-code skew path that complements the explicit
    skew_buckets/broadcast_buckets escapes."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # enough map partitions that the hot key stands out from the
        # median (the shared test session runs with 4)
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 8, 1).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        )
        g = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        assert g.collect()[0]["n"] == 16_010_000
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        txt = g._jdf.queryExecution().explainString(mode)
        assert "isFinalPlan=true" in txt
        assert "skew=true" in txt
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
