"""Core workload: PK-scan semantics over `events` + the relational
extension surface (joins, aggregations, windows, set ops, rollup, top-k)
over the TPC-H-ish tables.

Scale notes per query are in the docstrings — every plan here is
shuffle-minimal: filters/projections push to the parquet scan, small dims
are broadcast, aggregations are partial+final hash aggs, top-k uses
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opentick_spark.operators.asof import asof_join
from opentick_spark.operators.timeseries import gap_fill, ohlcv_bars, session_windows
from opentick_spark.workload.util import (
    load,
    load_raw,
    normalize_events,
    ts_range_cond,
    ts_us,
)

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# S1-S4/P1-P7/A1-A3: PK point/prefix/range scans, projection, tail limit
# (reference query.go:121-292; Catalyst pushes all of these to the scan)

@q(
    "pk_point_get",
    "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value "
    "FROM events WHERE event_id = 4242",
)
def pk_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point get on the PK — partition pruning + row-group stats make this
    near-O(1) on a PK-sorted layout (reference S2)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") == 4242).select(
        "event_id", ts_us().alias("ts_us"), "user_id", "event_type", "value"
    )


@q(
    "pk_prefix_scan",
    "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value "
    "FROM events WHERE user_id = 7",
)
def pk_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-prefix scan (reference S3): leading key equality, implicit PK
    order supplied by the sort/limit layer when needed."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 7).select(
        "user_id", ts_us().alias("ts_us"), "event_type", "value"
    )


@q(
    "pk_range_scan",
    "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value FROM events "
    "WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'",
)
def pk_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix + range on the trailing key (reference S3/P6/P7): inclusive
    start, exclusive end — both push to parquet row-group pruning (the
    range predicate is applied on the stored ts representation, BEFORE
    the ns-long normalization projection)."""
    raw = load_raw(spark, sf_dir, "events")
    lo = 1704844800 * 1_000_000_000  # 2024-01-10
    hi = 1705708800 * 1_000_000_000  # 2024-01-20
    ev = normalize_events(
        raw.filter((F.col("user_id") == 7) & ts_range_cond(raw, lo, hi))
    )
    return ev.select("user_id", ts_us().alias("ts_us"), "event_type", "value")


@q(
    "tail_limit",
    "SELECT epoch_us(ts) AS ts_us, event_type, value FROM events "
    "WHERE user_id = 7 ORDER BY ts DESC LIMIT 20",
)
def tail_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT -n tail semantics (reference A3): last n rows in descending
    PK order → Catalyst TakeOrderedAndProject (storage reverse scan)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 7)
        .orderBy(F.col("ts").desc())
        .limit(20)
        .select(ts_us().alias("ts_us"), "event_type", "value")
    )


@q(
    "full_scan_agg",
    "SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value, "
    "ROUND(AVG(value), 6) AS avg_value FROM events GROUP BY event_type",
)
def full_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table scan (reference S1) + hash aggregation (extension):
    partial+final agg, shuffle only on the 5 grouping keys."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# time-series rollup (hypertable-style; companion to the reference's
# pre-aggregated bar tables)

@q(
    "ohlcv_rollup",
    """
    SELECT user_id,
           epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bar_ts_us,
           min_by(value, ts) AS open, MAX(value) AS high, MIN(value) AS low,
           max_by(value, ts) AS close, COUNT(*) AS n_ticks,
           ROUND(SUM(value), 4) AS volume
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    """,
)
def ohlcv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw ticks → hourly OHLCV bars: single hash agg with min_by/max_by,
    no window, no second shuffle. (Ties are impossible: ts is unique per
    user at ns *and* µs granularity in this dataset.)"""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bars = ohlcv_bars(
        ev, ["user_id"], "ts", "value", size_col="value", bucket_seconds=3600
    )
    return bars.select(
        "user_id",
        F.expr("bar_ts div 1000").alias("bar_ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.round(F.col("volume"), 4).alias("volume"),
    )


# ---------------------------------------------------------------------------
# relational extension surface (SURVEY §2.3/2.4 "extension": joins, aggs,
# windows, set ops, rollup, top-k)

@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final hash aggregation; the
    shipdate filter pushes to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


@q(
    "revenue_by_nation",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query: fact table joins small dims — customer and
    nation are explicitly broadcast so lineitem⋈orders is the only
    shuffle join (AQE would pick this too; we make it deterministic)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@q(
    "top_orders_by_revenue",
    """
    SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch_us(ANY_VALUE(o_orderdate)) AS orderdate_us
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + deterministic top-k (revenue desc,
    orderkey asc) → TakeOrderedAndProject, no full sort."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.unix_micros(
                F.any_value("o_orderdate").cast("timestamp")
            ).alias("orderdate_us"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@q(
    "salted_join_revenue",
    """
    SELECT o_orderpriority, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join (explicit n-way salting, operators/join.py):
    identical output contract to the plain equi-join — the salt spreads
    any hot l_orderkey over 8 shards. AQE's skew splitting is the
    runtime fallback; this is the ahead-of-time form."""
    from opentick_spark.operators.join import salted_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on=["k"],
        salt=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@q(
    "window_running_sum",
    """
    SELECT user_id, epoch_us(ts) AS ts_us,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum
    FROM events WHERE user_id < 10
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate per key (extension A-surface): one shuffle on
    user_id, sorted within partitions — order includes event_id so ties
    are deterministic across engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        ts_us().alias("ts_us"),
        F.round(F.sum("value").over(w), 4).alias("run_sum"),
    )


@q(
    "window_rank_topn",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-n per group via row_number — Spark turns the rank filter into
    WindowGroupLimit (partial top-n before the shuffle)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@q(
    "pivot_event_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events WHERE user_id < 20 GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (extension): explicit value list so the plan is a single
    hash agg with conditional counts — no second pass to discover
    columns."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    # pivot leaves NULL for absent combos; the oracle's FILTER yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    )


@q(
    "window_rank_stats",
    """
    SELECT event_type, event_id,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           NTILE(4) OVER w AS quartile,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events WHERE user_id < 10
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (percent_rank / ntile / cume_dist) with
    a deterministic tie-break on event_id."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@q(
    "set_ops_except",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 195
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 195
    """,
)
def set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (extension): users with big purchases who never had
    a big error."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 195)
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.distinct().subtract(b.distinct())


@q(
    "semi_anti_join",
    """
    SELECT c_custkey, c_name, 'no_big_order' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT c_custkey, c_name, 'has_huge_order' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 500000)
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti joins (EXISTS / NOT EXISTS): broadcast-able build side
    at this scale; shuffle-hash semi/anti at 100 TB."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    huge = o.filter(F.col("o_totalprice") > 500000)
    anti = c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit("no_big_order").alias("tag")
    )
    semi = c.join(huge, c.c_custkey == huge.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit("has_huge_order").alias("tag")
    )
    return anti.unionAll(semi)


@q(
    "rollup_nation_region",
    """
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extension): region→nation hierarchy with
    super-aggregate rows; dims broadcast."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@q(
    "distinct_suppliers_per_flag",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct: Spark expands to a single pass with
    grouping-id rewrite (no per-distinct re-scan)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.countDistinct("l_partkey").cast("long").alias("n_part"),
    )


@q(
    "asof_join_purchase_signup",
    """
    SELECT p.user_id, epoch_us(p.ts) AS ts_us, p.value,
           epoch_us(s.ts) AS signup_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_join_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic as-of join (extension of the adj pattern): each purchase
    picks the user's most recent signup at-or-before it. Sorted-merge —
    one shuffle on user_id, no range cross-join."""
    ev = load(spark, sf_dir, "events")
    # compare in µs so Spark and the µs-truncated oracle agree on ties
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", ts_us().alias("ts_us"), "value"
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", ts_us().alias("signup_ts")
    )
    joined = asof_join(
        p,
        s,
        on=["user_id"],
        left_time="ts_us",
        right_time="signup_ts",
        direction="backward",
        value_cols=["signup_ts"],
    )
    return joined.select(
        "user_id", "ts_us", "value", F.col("signup_ts").alias("signup_ts_us")
    )


@q(
    "split_range_scan",
    "SELECT user_id, epoch_us(ts) AS ts_us, value FROM events "
    "WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-02-20'",
)
def split_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitRange analog (reference C11, client/opentick.go:63-127): the
    client splits a time range into n sub-ranges scanned in parallel and
    dedups the shared boundary row. Spark-native: n half-open sub-ranges
    union to exactly the original range — no boundary dedup needed, and
    the union's branches prune to disjoint row groups."""
    raw = load_raw(spark, sf_dir, "events")
    lo = 1704412800 * 1_000_000_000  # 2024-01-05
    hi = 1708387200 * 1_000_000_000  # 2024-02-20
    n = 4
    step = (hi - lo) // n
    bounds = [lo + i * step for i in range(n)] + [hi]
    parts = [
        normalize_events(
            raw.filter(
                (F.col("user_id") == 7)
                & ts_range_cond(raw, bounds[i], bounds[i + 1])
            )
        ).select("user_id", ts_us().alias("ts_us"), "value")
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@q(
    "json_props_stats",
    """
    SELECT event_type,
           CAST(SUM(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extension: JSON property extraction
    (get_json_object, JVM-side) + aggregation."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@q(
    "window_lead_lag",
    """
    SELECT user_id, epoch_us(ts) AS ts_us, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, value), 4) AS delta
    FROM events WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag navigation windows (extension A-surface): tick-to-tick
    deltas, one shuffle on user_id."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return ev.select(
        "user_id",
        ts_us().alias("ts_us"),
        "value",
        F.lag(v).over(w).alias("prev_value"),
        F.lead(v).over(w).alias("next_value"),
        F.round(v - F.coalesce(F.lag(v).over(w), v), 4).alias("delta"),
    )


@q(
    "window_range_frame",
    """
    SELECT user_id, epoch_us(ts) AS ts_us,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4)
             AS sum_1h,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
    FROM events WHERE user_id < 5
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based frame, not row-based): trailing
    1-hour sum per user — the time-series sliding aggregate."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us())
        .rangeBetween(-hour_us, Window.currentRow)
    )
    return ev.select(
        "user_id",
        ts_us().alias("ts_us"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
    )


@q(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (extension): all 4 grouping combinations in one
    pass (Spark expands + single shuffle)."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@q(
    "intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (extension): users with big purchases who also
    signed up."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    ).select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@q(
    "brand_nation_revenue",
    """
    SELECT p_brand, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY p_brand, n_name
    """,
)
def brand_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join over the remaining dims (part, supplier, nation): all
    three broadcast, so the fact table never shuffles before the agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@q(
    "stats_by_event_type",
    """
    SELECT event_type,
           ROUND(MEDIAN(value), 6) AS med_value,
           ROUND(STDDEV_SAMP(value), 6) AS sd_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def stats_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics + moments: median (exact, interpolated the
    same way in both engines) and sample stddev."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@q(
    "vwap_hourly",
    """
    SELECT user_id, epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bar_ts_us,
           ROUND(SUM(value * json_extract(props, '$.k')::BIGINT)
                 / SUM(json_extract(props, '$.k')::BIGINT), 6) AS vwap,
           CAST(SUM(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS volume
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    """,
)
def vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per hour (price=value, size=props.k):
    the canonical tick-DB aggregate — one hash agg, JSON size extraction
    JVM-side."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vol = F.get_json_object("props", "$.k").cast("long")
    bars = ohlcv_bars(
        ev.withColumn("__vol", vol), ["user_id"], "ts", "value",
        size_col="__vol", bucket_seconds=3600,
    )
    return bars.select(
        "user_id",
        F.expr("bar_ts div 1000").alias("bar_ts_us"),
        F.round("vwap", 6).alias("vwap"),
        F.col("volume").cast("long").alias("volume"),
    )


@q(
    "twap_hourly",
    """
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value,
             epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
               AS next_us
      FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT user_id, bucket_us, value,
             LEAST(COALESCE(next_us, bucket_us + 3600000000),
                   bucket_us + 3600000000) - ts_us AS dt
      FROM t
    )
    SELECT user_id, bucket_us,
           ROUND(SUM(value * dt) / SUM(dt), 6) AS twap
    FROM w WHERE dt > 0 GROUP BY user_id, bucket_us
    """,
)
def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per hour: each tick's price is
    weighted by its holding time (until the next tick or the bucket
    end). One window pass for the next-tick time + one hash agg — the
    classic tick-DB companion to VWAP, computed in µs so both engines
    agree."""
    hour_us = 3_600_000_000
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us().alias("t_us"), "value")
    )
    w = Window.partitionBy("user_id").orderBy("t_us")
    bucket = (F.col("t_us") - F.pmod(F.col("t_us"), F.lit(hour_us))).alias(
        "bucket_us"
    )
    t = ev.select(
        "user_id",
        "t_us",
        "value",
        bucket,
        F.lead("t_us").over(w).alias("next_us"),
    )
    dt = (
        F.least(
            F.coalesce(F.col("next_us"), F.col("bucket_us") + hour_us),
            F.col("bucket_us") + hour_us,
        )
        - F.col("t_us")
    ).alias("dt")
    weighted = t.select("user_id", "bucket_us", "value", dt).filter(F.col("dt") > 0)
    return weighted.groupBy("user_id", "bucket_us").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("twap")
    )


@q(
    "gap_fill_locf",
    """
    WITH bars AS (
      SELECT user_id, epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
             max_by(value, ts) AS last_value
      FROM events WHERE user_id < 5 GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(MIN(bucket_us), MAX(bucket_us), 3600000000))
               AS bucket_us
      FROM bars GROUP BY user_id
    ),
    j AS (
      SELECT s.user_id, s.bucket_us, b.last_value,
             b.last_value IS NULL AS is_filled
      FROM spine s LEFT JOIN bars b USING (user_id, bucket_us)
    )
    SELECT user_id, bucket_us,
           last_value(last_value IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY bucket_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value,
           is_filled
    FROM j
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with last-observation-carried-forward
    (the hypertable 'locf' op): sequence+explode spine, left join, one
    ignorenulls window."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    bars = (
        ev.groupBy(
            "user_id",
            (
                F.col("ts") - F.pmod(F.col("ts"), F.lit(3_600_000_000_000))
            ).alias("bucket"),
        )
        .agg(F.max_by("value", "ts").alias("last_value"))
    )
    filled = gap_fill(bars, ["user_id"], "bucket", ["last_value"], 3600)
    return filled.select(
        "user_id",
        F.expr("bucket div 1000").alias("bucket_us"),
        "last_value",
        "is_filled",
    )


@q(
    "session_windows",
    """
    WITH t AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE user_id < 10),
    m AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                       OR ts_us - LAG(ts_us) OVER w > 3600000000
                  THEN 1 ELSE 0 END AS ns
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    s AS (
      SELECT user_id, ts_us,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM m
    )
    SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (1h inactivity gap) — gaps-and-islands in one
    window pass + one agg; computed on µs so both engines agree on
    boundary gaps."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", ts_us().alias("t_us"))
    )
    sess = session_windows(ev, ["user_id"], "t_us", gap=3_600_000_000)
    return sess.select(
        "user_id",
        F.col("session_start").alias("session_start_us"),
        F.col("session_end").alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@q(
    "realized_vol_hourly",
    """
    WITH r AS (
      SELECT user_id, ts,
             ln(value / lag(value) OVER (PARTITION BY user_id ORDER BY ts)) AS lr
      FROM events WHERE event_type = 'purchase' AND value > 0
    )
    SELECT user_id,
           epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
           ROUND(sqrt(SUM(lr * lr)), 6) AS rvol,
           CAST(COUNT(*) AS BIGINT) AS n_returns
    FROM r WHERE lr IS NOT NULL GROUP BY 1, 2
    """,
)
def realized_vol_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly realized volatility per user over the purchase stream:
    lag-window log returns and the bucket aggregation share one key
    shuffle (operators/timeseries.realized_volatility)."""
    from opentick_spark.operators.timeseries import realized_volatility

    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 0))
    )
    rv = realized_volatility(ev, ["user_id"], "ts", "value", bucket_seconds=3600)
    return rv.select(
        "user_id",
        F.expr("bucket_ts div 1000").alias("bucket_us"),
        F.round("rvol", 6).alias("rvol"),
        "n_returns",
    )


@q(
    "return_correlation",
    """
    WITH s AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS h,
             AVG(value) AS v
      FROM events WHERE event_type = 'purchase' AND user_id < 30
      GROUP BY 1, 2
    )
    SELECT a.user_id AS key_a, b.user_id AS key_b,
           ROUND(corr(a.v, b.v), 4) AS corr, CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM s a JOIN s b ON a.h = b.h AND a.user_id < b.user_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
)
def return_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-asset correlation matrix: hourly mean series per user,
    inner-aligned equi-join on the hour (never an n² row cross product),
    Pearson corr per pair (operators/timeseries.pairwise_correlation)."""
    from opentick_spark.operators.timeseries import pairwise_correlation

    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 30)
    )
    daily = ev.groupBy(
        "user_id",
        F.expr(f"ts - pmod(ts, {86400 * 10**9})").alias("h"),
    ).agg(F.avg("value").alias("v"))
    pc = pairwise_correlation(daily, "user_id", "h", "v")
    return pc.filter(F.col("n_obs") >= 3).select(
        "key_a", "key_b", F.round("corr", 4).alias("corr"), "n_obs"
    )


@q(
    "market_beta",
    """
    WITH d AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day, AVG(value) AS v
      FROM events WHERE event_type = 'purchase' AND user_id < 50 GROUP BY 1, 2
    ),
    m AS (SELECT day, AVG(v) AS mv FROM d GROUP BY day)
    SELECT user_id, ROUND(covar_pop(v, mv) / var_pop(mv), 4) AS beta,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM d JOIN m USING (day)
    GROUP BY user_id HAVING COUNT(*) >= 10 AND var_pop(mv) > 0
    """,
)
def market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user beta vs the equal-weight market series: daily mean
    values, market = cross-user daily mean, beta = cov(u, m)/var(m).
    Two hash aggregations + an equi-join on the day key — the market
    side is day-cardinality (broadcastable at any scale); never a
    per-pair cross product."""
    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    day = F.expr(f"ts - pmod(ts, {86400 * 10**9})").alias("day")
    d = ev.groupBy("user_id", day).agg(F.avg("value").alias("v"))
    m = d.groupBy("day").agg(F.avg("v").alias("mv"))
    j = d.join(F.broadcast(m), "day")
    return (
        j.groupBy("user_id")
        .agg(
            F.round(F.covar_pop("v", "mv") / F.var_pop("mv"), 4).alias("beta"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.var_pop("mv").alias("__var"),
        )
        .filter((F.col("n_obs") >= 10) & (F.col("__var") > 0))
        .drop("__var")
    )


@q(
    "rolling_beta_7d",
    """
    WITH d AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day, AVG(value) AS v
      FROM events WHERE event_type = 'purchase' AND user_id < 50 GROUP BY 1, 2
    ),
    m AS (SELECT day, AVG(v) AS mv FROM d GROUP BY day),
    j AS (SELECT user_id, day, v, mv FROM d JOIN m USING (day)),
    w AS (
      SELECT user_id, day,
             covar_pop(v, mv) OVER win AS cv,
             var_pop(mv) OVER win AS vm,
             COUNT(*) OVER win AS n_obs
      FROM j
      WINDOW win AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, epoch_us(day) AS day_us,
           ROUND(cv / vm, 4) AS rolling_beta, CAST(n_obs AS BIGINT) AS n_obs
    FROM w WHERE n_obs >= 5 AND vm > 0
    """,
)
def rolling_beta_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day beta vs the equal-weight market series — the
    time-varying companion to ``market_beta``: cov/var over a bounded
    ROWS frame per user-day. Shape: daily agg (one shuffle), the
    day-cardinality market side broadcast back, then ONE window shuffle
    on user_id with a 7-row frame — bounded state per key, and the
    frame is hot-key-splittable with the exact prefix-halo technique
    the skew suite covers for bounded frames."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    day = F.expr(f"ts - pmod(ts, {86400 * 10**9})").alias("day")
    d = ev.groupBy("user_id", day).agg(F.avg("value").alias("v"))
    m = d.groupBy("day").agg(F.avg("v").alias("mv"))
    j = d.join(F.broadcast(m), "day")
    win = (
        Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    )
    w = j.select(
        "user_id",
        "day",
        F.covar_pop("v", "mv").over(win).alias("cv"),
        F.var_pop("mv").over(win).alias("vm"),
        F.count(F.lit(1)).over(win).alias("n_obs"),
    )
    return w.filter((F.col("n_obs") >= 5) & (F.col("vm") > 0)).select(
        "user_id",
        (F.col("day") / 1000).cast("long").alias("day_us"),
        F.round(F.col("cv") / F.col("vm"), 4).alias("rolling_beta"),
        F.col("n_obs").cast("long").alias("n_obs"),
    )


@q(
    "hll_intersection_users",
    """
    WITH f AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY user_id
    )
    SELECT CAST(SUM(p) AS BIGINT) AS purchase_users,
           CAST(SUM(v) AS BIGINT) AS view_users,
           CAST(SUM(p * v) AS BIGINT) AS exact_both,
           TRUE AS within_bound
    FROM f
    """,
)
def hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-INTERSECTION cardinality from mergeable sketches — the
    audience-overlap primitive: |purchasers ∩ viewers| estimated by
    inclusion-exclusion over three HLL sketches (est_A + est_B −
    est_A∪B), each a DataSketches partial that re-rolls at O(registers)
    — no re-scan of either side at 100 TB, unlike the exact per-user
    flag aggregation computed alongside. Sketch internals aren't
    cross-engine, so the oracle matches the EXACT counts and the
    inclusion-exclusion estimate is gated by a generous compounded
    bound (3 sketches at lgK=14, rsd≈0.8% each): |est − exact| ≤
    max(16, 15% of the union estimate) — deterministic for fixed input,
    so it hash-checks."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
    )
    exact = flags.agg(
        F.sum("p").cast("long").alias("purchase_users"),
        F.sum("v").cast("long").alias("view_users"),
        F.sum(F.col("p") * F.col("v")).cast("long").alias("exact_both"),
    )
    sk = ev.agg(
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg("
            "CASE WHEN event_type='purchase' THEN user_id END, 14))"
        ).alias("ea"),
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg("
            "CASE WHEN event_type='view' THEN user_id END, 14))"
        ).alias("eb"),
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg(user_id, 14))"
        ).alias("eu"),
    )
    return exact.crossJoin(sk).select(
        "purchase_users",
        "view_users",
        "exact_both",
        (
            F.abs(F.col("ea") + F.col("eb") - F.col("eu") - F.col("exact_both"))
            <= F.greatest(F.lit(16), F.lit(0.15) * F.col("eu"))
        ).alias("within_bound"),
    )


@q(
    "roll_spread_estimate",
    """
    WITH p AS (
      SELECT user_id, ts, event_id, value,
             lag(value) OVER w AS pv
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    d AS (
      SELECT user_id, value - pv AS dp,
             lag(value - pv) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS dpl
      FROM p WHERE pv IS NOT NULL
    ),
    c AS (
      SELECT user_id, covar_samp(dp, dpl) AS cv,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM d WHERE dpl IS NOT NULL
      GROUP BY user_id HAVING COUNT(*) >= 10
    )
    SELECT user_id,
           ROUND(CASE WHEN cv < 0 THEN 2 * sqrt(-cv) ELSE 0 END, 4)
             AS roll_spread,
           ROUND(cv, 2) AS serial_cov, n_obs
    FROM c
    """,
)
def roll_spread_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) implied effective spread: 2·√(−cov(Δpₜ, Δpₜ₋₁)) per
    key from the serial covariance of consecutive price changes
    (bid-ask bounce makes adjacent changes negatively correlated;
    positive covariance floors at 0 by convention). ONE window shuffle
    per key computes both lags (ties broken by event_id so the lag
    order is engine-deterministic), then a per-key hash aggregate —
    the classic microstructure measure at two-shuffle cost."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id", "ts", "event_id", "value",
        F.lag("value").over(w).alias("pv"),
    ).filter(F.col("pv").isNotNull())
    d = p.select(
        "user_id",
        (F.col("value") - F.col("pv")).alias("dp"),
        F.lag(F.col("value") - F.col("pv")).over(w).alias("dpl"),
    ).filter(F.col("dpl").isNotNull())
    c = (
        d.groupBy("user_id")
        .agg(
            F.covar_samp("dp", "dpl").alias("cv"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
        .filter(F.col("n_obs") >= 10)
    )
    return c.select(
        "user_id",
        F.round(
            F.when(F.col("cv") < 0, 2 * F.sqrt(-F.col("cv"))).otherwise(0.0),
            4,
        ).alias("roll_spread"),
        F.round("cv", 2).alias("serial_cov"),
        "n_obs",
    )


@q(
    "daily_growth_accounting",
    """
    WITH d AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS day
      FROM events
    ),
    f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id)
    SELECT epoch_us(day) AS day_us,
           CAST(COUNT(*) AS BIGINT) AS dau,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM d JOIN f USING (user_id)
    GROUP BY day
    """,
)
def daily_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — DAU split into new vs returning by
    first-seen attribution: two day-level aggregations plus one
    user-keyed equi-join (first_day is user-cardinality, co-partitioned
    with the activity frame on user_id so the join rides the same
    exchange). Day-cardinality output at any scale."""
    day_ns = 86400 * 10**9
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.expr(f"ts - pmod(ts, {day_ns})").alias("day")
    ).distinct()
    first = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dau"),
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("long")
            .alias("new_users"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("long")
            .alias("returning_users"),
        )
        .select(
            (F.col("day") / 1000).cast("long").alias("day_us"),
            "dau",
            "new_users",
            "returning_users",
        )
    )


@q(
    "retention_cohorts",
    """
    WITH s AS (
      SELECT user_id, MIN(time_bucket(INTERVAL '1 day', ts)) AS cohort
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS day
      FROM events
    ),
    r AS (
      SELECT s.cohort, s.user_id,
             MAX(CASE WHEN a.day = s.cohort + INTERVAL 1 DAY
                 THEN 1 ELSE 0 END) AS d1,
             MAX(CASE WHEN a.day = s.cohort + INTERVAL 7 DAY
                 THEN 1 ELSE 0 END) AS d7
      FROM s JOIN a USING (user_id) GROUP BY 1, 2
    )
    SELECT epoch_us(cohort) AS cohort_day_us,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(d1), 6) AS retained_d1,
           ROUND(AVG(d7), 6) AS retained_d7
    FROM r GROUP BY cohort
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the product-analytics staple: users cohorted
    by first-signup day, retention = fraction active exactly 1 and 7
    days later. Shape: two day-level aggregations (map-side combinable),
    ONE equi-join on user_id, final rollup on day-cardinality cohort
    keys — never a per-user-pair operation, so the plan is flat in user
    count at 100 TB."""
    day_ns = 86400 * 10**9
    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts - pmod(ts, {day_ns})")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort"))
    )
    a = ev.select("user_id", day.alias("day")).distinct()
    r = (
        s.join(a, "user_id")
        .groupBy("cohort", "user_id")
        .agg(
            F.max(
                (F.col("day") == F.col("cohort") + F.lit(day_ns)).cast("int")
            ).alias("d1"),
            F.max(
                (F.col("day") == F.col("cohort") + F.lit(7 * day_ns)).cast(
                    "int"
                )
            ).alias("d7"),
        )
    )
    return r.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg("d1"), 6).alias("retained_d1"),
        F.round(F.avg("d7"), 6).alias("retained_d7"),
    ).select(
        (F.col("cohort") / 1000).cast("long").alias("cohort_day_us"),
        "n_users",
        "retained_d1",
        "retained_d7",
    )


@q(
    "referential_integrity_audit",
    """
    SELECT
      CAST((SELECT COUNT(*) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL) AS BIGINT) AS orphan_lineitems,
      CAST((SELECT COUNT(*) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) AS BIGINT) AS orphan_orders,
      CAST((SELECT COUNT(*) FROM orders o
            LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
            ON o.o_orderkey = l.l_orderkey
            WHERE l.l_orderkey IS NULL) AS BIGINT) AS empty_orders,
      CAST((SELECT COUNT(*) FROM part p
            LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
            ON p.p_partkey = l.l_partkey
            WHERE l.l_partkey IS NULL) AS BIGINT) AS unreferenced_parts
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key health audit across the warehouse — the data-quality
    gate a pipeline runs before training-data extraction: orphan facts
    (lineitems without an order, orders without a customer) and dangling
    dimensions (orders with no lines, parts never referenced). All four
    are ANTI-join counts: dimension sides broadcast where small, fact
    sides never move twice, and each count is a map-side-combinable
    aggregate of the join output — no collect, no cross product."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")

    def cnt(df, alias):
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    orphan_li = cnt(
        li.join(F.broadcast(o.select("o_orderkey")),
                li.l_orderkey == o.o_orderkey, "left_anti"),
        "orphan_lineitems",
    )
    orphan_o = cnt(
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == c.c_custkey, "left_anti"),
        "orphan_orders",
    )
    empty_o = cnt(
        o.join(li.select("l_orderkey").distinct(),
               o.o_orderkey == li.l_orderkey, "left_anti"),
        "empty_orders",
    )
    unref_p = cnt(
        p.join(li.select("l_partkey").distinct(),
               p.p_partkey == li.l_partkey, "left_anti"),
        "unreferenced_parts",
    )
    return (
        orphan_li.crossJoin(orphan_o).crossJoin(empty_o).crossJoin(unref_p)
    )


@q(
    "bar_downsample_daily",
    """
    SELECT user_id,
           epoch_us(time_bucket(INTERVAL '1 day', ts)) AS day_ts_us,
           min_by(value, ts) AS open, MAX(value) AS high, MIN(value) AS low,
           max_by(value, ts) AS close, COUNT(*) AS n_ticks,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4) AS volume
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    """,
)
def bar_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical bar rollup (the reference's per-interval bar tables,
    sec/interval/tm): hourly bars carrying boundary timestamps →
    downsample_bars → daily bars. The oracle computes the daily bars
    DIRECTLY from raw ticks, so the hash check asserts hierarchical ≡
    direct exactly — open/close resolve through the carried
    open_ts/close_ts, min/max/count/sum recombine by algebra. At scale
    every coarser interval derives from the finest bar table (24× less
    data here) instead of re-scanning raw ticks. Volume sums through
    DECIMAL(30,6) on BOTH sides: decimal addition is exact/associative,
    so hierarchical (hourly→daily) and direct (raw ticks) summation
    cannot diverge by association order the way double partials can —
    no ulp-boundary ROUND flips across data generations."""
    from opentick_spark.operators.timeseries import downsample_bars

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("vol6", F.col("value").cast("decimal(30,6)"))
    )
    hourly = ohlcv_bars(
        ev,
        ["user_id"],
        "ts",
        "value",
        size_col="vol6",
        bucket_seconds=3600,
        with_boundaries=True,
    )
    daily = downsample_bars(
        hourly.drop("vwap"),
        ["user_id"],
        "bar_ts",
        from_bucket_seconds=3600,
        to_bucket_seconds=86400,
    )
    return daily.select(
        "user_id",
        F.expr("bar_ts div 1000").alias("day_ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.round(F.col("volume").cast("double"), 4).alias("volume"),
    )


@q(
    "max_drawdown",
    """
    WITH d AS (
      SELECT user_id, value,
             value / MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS dd
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, ROUND(MIN(dd), 6) AS max_drawdown,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM d GROUP BY user_id
    """,
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the purchase price series: running
    peak + per-key min in one key shuffle
    (operators/timeseries.drawdown)."""
    from opentick_spark.operators.timeseries import drawdown

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    dd = drawdown(
        ev.withColumn("__ord", F.struct("ts", "event_id")),
        ["user_id"],
        "__ord",
        "value",
    )
    return dd.groupBy("user_id").agg(
        F.round(F.min("drawdown"), 6).alias("max_drawdown"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    )


@q(
    "rolling_zscore_outliers",
    """
    WITH z AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value,
             COUNT(value) OVER w AS n_window,
             AVG(value) OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, ts_us, value,
           ROUND((value - mu) / sd, 4) AS z
    FROM z
    WHERE n_window >= 5 AND sd > 0 AND ROUND((value - mu) / sd, 4) >= 2.5
    """,
)
def rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-z-score outlier gate (the numeric twin of the text quality
    filters): trailing-20-row mean/std EXCLUDING the current row, outliers
    cut on the ROUNDED z so the threshold is engine-stable
    (operators/timeseries.rolling_zscore). One key shuffle."""
    from opentick_spark.operators.timeseries import rolling_zscore

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    z = rolling_zscore(
        ev.withColumn("__ord", F.struct("ts", "event_id")),
        ["user_id"],
        "__ord",
        "value",
        window_rows=20,
        min_obs=5,
    )
    z4 = F.round("zscore", 4)
    return (
        z.filter(z4 >= 2.5)
        .select(
            "user_id",
            ts_us().alias("ts_us"),
            "value",
            z4.alias("z"),
        )
    )


@q(
    "hop_window_counts",
    """
    WITH h AS (
      SELECT event_type, value,
             epoch_us(time_bucket(INTERVAL '30 minutes', ts)) - off AS win_start_us
      FROM events,
           (SELECT unnest([0, 1800000000]) AS off)
    )
    SELECT win_start_us, event_type, COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM h GROUP BY 1, 2
    """,
)
def hop_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour windows every 30 minutes via
    F.window's multi-assignment — each event lands in window_len/slide
    windows, expanded JVM-side before one hash agg (the streaming twin is
    the same expression under a watermark). Oracle replays the expansion
    as an unnest cross join of the two hop offsets."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(
            F.window("ts_ts", "1 hour", "30 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@q(
    "scalar_subquery_filter",
    """
    SELECT l_partkey, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    GROUP BY l_partkey
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) through the SQL
    front-end: Catalyst decorrelates to an aggregate + join — no
    per-row re-scan."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__li")
    return spark.sql(
        """
        SELECT l_partkey, CAST(COUNT(*) AS LONG) AS n,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM __li l1
        WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM __li l2
                            WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        """
    )


@q(
    "cohort_retention",
    """
    WITH a AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id)
    SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users bucketed by first-activity week,
    counted per week offset. Two hash aggs + one equi-join on user_id —
    the cohort frame is tiny (one row per user) and stays co-partitioned
    with the activity frame, so the join adds no extra exchange."""
    week_us = 604_800_000_000
    a = (
        load(spark, sf_dir, "events")
        .select("user_id", F.expr("(ts div 1000) div 604800000000").alias("wk"))
        .distinct()
    )
    c = a.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        a.join(c, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@q(
    "funnel_signup_purchase",
    """
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
      GROUP BY s.user_id
    )
    SELECT COUNT(*) AS n_signup_users,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_converted,
           CAST(COUNT(CASE WHEN p.first_purchase_us - s.signup_us
                                <= 604800000000 THEN 1 END) AS BIGINT)
             AS n_converted_7d
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: first signup → first purchase at-or-after it,
    with a 7-day-conversion count. Per-user min-aggregations co-partition
    on user_id, so the funnel join chain is one shuffle end-to-end."""
    week_us = 604_800_000_000
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts_us()).alias("signup_us"))
    )
    p = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", ts_us().alias("p_us")
            ),
            "user_id",
        )
        .filter(F.col("p_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("first_purchase_us"))
    )
    joined = s.join(p, "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_us").cast("long").alias("n_converted"),
        F.count(
            F.when(
                F.col("first_purchase_us") - F.col("signup_us") <= week_us, 1
            )
        )
        .cast("long")
        .alias("n_converted_7d"),
    )


@q(
    "except_all_high_value",
    """
    SELECT user_id FROM events WHERE value > 30
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def except_all_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics — Spark exceptAll): high-value
    event occurrences minus signup occurrences per user."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value") > 30).select("user_id").exceptAll(
        ev.filter(F.col("event_type") == "signup").select("user_id")
    )


@q(
    "conditional_agg_filter",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 4)
             AS purchase_value,
           ROUND(COALESCE(MAX(value) FILTER (WHERE event_type = 'error'), 0), 4)
             AS max_error_value
    FROM events WHERE user_id < 50 GROUP BY user_id
    """,
)
def conditional_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause ≡ count_if/sum(when)):
    several per-type metrics in ONE pass — no per-type re-scan, one
    partial+final hash agg."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    is_p = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count_if(is_p).alias("n_purchase"),
        F.count_if(F.col("event_type") == "click").alias("n_click"),
        F.round(
            F.coalesce(F.sum(F.when(is_p, F.col("value"))), F.lit(0.0)), 4
        ).alias("purchase_value"),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("event_type") == "error", F.col("value"))),
                F.lit(0.0),
            ),
            4,
        ).alias("max_error_value"),
    )


@q(
    "ewma_final_price",
    """
    SELECT user_id,
           ROUND(list_reduce(list(value ORDER BY epoch_us(ts)),
                             (acc, x) -> 0.9 * acc + 0.1 * x), 6) AS ewma_last,
           COUNT(*) AS n_ticks
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
    """,
)
def ewma_final_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(alpha=0.1) over each user's purchase-price series — the
    classic tick smoother. Sequential recurrence → applyInPandas (one
    shuffle on the key, vectorized ewm per series); checked on the final
    EWMA value per key, which DuckDB folds with list_reduce."""
    from opentick_spark.operators.timeseries import ewma

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us().alias("t_us"), "value")
    )
    sm = ewma(ev, ["user_id"], "t_us", "value", alpha=0.1)
    return sm.groupBy("user_id").agg(
        F.round(F.max_by("ewma", "t_us"), 6).alias("ewma_last"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    )


@q(
    "interval_join_windows",
    """
    WITH b AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
    w AS (
      SELECT i AS window_id,
             t0 + i * 604800000000 AS lo,
             t0 + i * 604800000000 + 86400000000 AS hi
      FROM b, range(0, 6) r(i)
    )
    SELECT w.window_id, COUNT(e.user_id) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM w LEFT JOIN events e
      ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
    GROUP BY w.window_id
    """,
)
def interval_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via time-bucket equi-join: six 1-day audit
    windows (one per week from the corpus start) matched against the
    event stream. A naive BETWEEN join would plan BroadcastNestedLoop —
    O(points × intervals); bucketing keys both sides on a day-width
    bucket so Catalyst plans a hash join (see interval_join)."""
    from opentick_spark.operators.join import interval_join

    day_us = 86_400_000_000
    week_us = 604_800_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id", ts_us().alias("t_us")
    )
    t0 = ev.agg(F.min("t_us").alias("t0"))
    windows = t0.select(
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("window_id"), "t0"
    ).select(
        "window_id",
        (F.col("t0") + F.col("window_id") * week_us).alias("lo"),
        (F.col("t0") + F.col("window_id") * week_us + day_us).alias("hi"),
    )
    joined = interval_join(ev, windows, "t_us", "lo", "hi", day_us)
    return (
        windows.join(joined.drop("lo", "hi"), "window_id", "left")
        .groupBy("window_id")
        .agg(
            F.count("user_id").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


@q(
    "grouping_sets_mixed",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond cube/rollup): three chosen
    granularities in one pass, disambiguated by GROUPING() ids — Spark
    expands the sets and still runs a single partial+final agg."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS LONG) AS n,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS LONG) AS gid
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@q(
    "window_count_distinct",
    """
    SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM events WHERE user_id < 5
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key — Spark has no native
    count-distinct window, so it's expressed as size(collect_set() OVER):
    same single shuffle + sort as any window, set state bounded by the
    distinct-value cardinality (5 event types here)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        ts_us().alias("ts_us"),
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("distinct_types_so_far"),
    )


@q(
    "stratified_sample",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS base_n,
           TRUE AS within_tolerance
    FROM events GROUP BY event_type
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy, seeded) — the
    corpus-balancing primitive. The sampled rows themselves are
    engine-specific RNG, so the *checkable contract* is emitted instead:
    per-stratum base counts (oracle-exact) plus a 5-sigma binomial bound
    on the sampled count — fractions 0.0/1.0 degenerate to exact
    equality, so the boolean is a hard gate on the sampler, not a
    formality."""
    ev = load(spark, sf_dir, "events")
    fractions = {"purchase": 0.5, "click": 0.1, "view": 0.1, "signup": 1.0,
                 "error": 0.0}
    sampled = ev.sampleBy("event_type", fractions, seed=42)
    samp = sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("samp_n")
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("base_n")
    )
    frac = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(fractions.items()) for x in kv]
        ),
        F.col("event_type"),
    )
    expected = frac * F.col("base_n")
    tol = F.lit(5.0) * F.sqrt(expected * (F.lit(1.0) - frac))
    return (
        base.join(samp, "event_type", "left")
        .na.fill({"samp_n": 0})
        .select(
            "event_type",
            "base_n",
            (F.abs(F.col("samp_n") - expected) <= tol).alias(
                "within_tolerance"
            ),
        )
    )


@q(
    "approx_distinct_users",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct next to the exact value: the
    sketch internals aren't cross-engine, so the query emits the exact
    count (oracle-matched) plus a 4-sigma boolean on the sketch's error
    (rsd=0.02 → |approx-exact| ≤ max(2, 8% of exact)) — deterministic
    for fixed input, so it hash-checks."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
            F.count_distinct("user_id").cast("long").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= F.greatest(
                    F.lit(2.0), F.lit(0.08) * F.col("exact_users")
                )
            ).alias("within_bound"),
        )
    )


@q(
    "approx_quantiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles, gated against the exact
    ones: the exact interpolated quantiles are the oracle-matched values
    and the GK estimates must land inside the exact [q-0.015, q+0.015]
    rank bracket (accuracy=10000 → rank error 1e-4, so the bracket is a
    150× margin; a broken sketch still trips it). Scalar columns only —
    array cells break the driver's canonicalizer."""
    ev = load(spark, sf_dir, "events")
    ag = ev.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
        ).alias("__ap"),
        F.expr(
            "percentile(value, array(0.485D, 0.5D, 0.515D, "
            "0.885D, 0.9D, 0.915D, 0.985D, 0.99D, 0.995D))"
        ).alias("__ex"),
    )
    in_bracket = (
        (F.col("__ap")[0] >= F.col("__ex")[0])
        & (F.col("__ap")[0] <= F.col("__ex")[2])
        & (F.col("__ap")[1] >= F.col("__ex")[3])
        & (F.col("__ap")[1] <= F.col("__ex")[5])
        & (F.col("__ap")[2] >= F.col("__ex")[6])
        & (F.col("__ap")[2] <= F.col("__ex")[8])
    )
    return ag.select(
        "event_type",
        F.round(F.col("__ex")[1], 4).alias("p50"),
        F.round(F.col("__ex")[4], 4).alias("p90"),
        F.round(F.col("__ex")[7], 4).alias("p99"),
        in_bracket.alias("within_bound"),
    )


@q(
    "profile_orders",
    """
    SELECT col, n_rows, n_null, n_distinct, min_s, max_s FROM (
      SELECT 'o_custkey' AS col, COUNT(*)::BIGINT AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*)::BIGINT,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*)::BIGINT,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
             CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
             CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
      FROM orders
    )
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling rollup (the pipeline health check run before any
    training job): per-column row/null/distinct counts and extremes in
    ONE scan — every metric is an aggregate expression, so Spark computes
    all columns' profiles in a single partial+final aggregation pass,
    then the tiny per-column reshape is a literal stack. No per-column
    scans, no driver loops."""
    orders = load(spark, sf_dir, "orders")

    def prof(c, render):
        return F.struct(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            render(F.min(c)).alias("min_s"),
            render(F.max(c)).alias("max_s"),
        )

    agg = orders.agg(
        prof("o_custkey", lambda x: x.cast("string")).alias("p1"),
        prof("o_orderstatus", lambda x: x.cast("string")).alias("p2"),
        prof("o_totalprice", lambda x: F.round(x, 2).cast("string")).alias("p3"),
    )
    return agg.select(
        F.explode(F.array("p1", "p2", "p3")).alias("p")
    ).select("p.col", "p.n_rows", "p.n_null", "p.n_distinct", "p.min_s", "p.max_s")


@q(
    "data_quality_report",
    """
    WITH m AS (
      SELECT
        SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::DOUBLE
          / GREATEST(COUNT(*), 1) AS m0,
        (COUNT(event_id) - COUNT(DISTINCT event_id))::DOUBLE AS m1,
        SUM(CASE WHEN value IS NOT NULL
                  AND value NOT BETWEEN 0 AND 1000 THEN 1 ELSE 0 END)::DOUBLE
          AS m2,
        SUM(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                  ('click','error','purchase','signup','view')
             THEN 1 ELSE 0 END)::DOUBLE AS m3,
        COUNT(*)::DOUBLE AS m4
      FROM events
    )
    -- CAST bound: the VALUES decimal literals type as DECIMAL(5,1),
    -- which the driver's value hash sees differently from Spark's double
    SELECT r.rule, r.metric, CAST(r.bound AS DOUBLE) AS bound, r.passed
    FROM m, LATERAL (
      SELECT * FROM (VALUES
        ('not_null(value)', ROUND(m.m0, 6), 0.0, m.m0 <= 0.0),
        ('unique(event_id)', ROUND(m.m1, 6), 0.0, m.m1 <= 0.0),
        ('in_range(value,0,1000)', ROUND(m.m2, 6), 0.0, m.m2 <= 0.0),
        ('accepted_values(event_type)', ROUND(m.m3, 6), 0.0, m.m3 <= 0.0),
        ('min_rows(1000)', ROUND(m.m4, 6), 1000.0, m.m4 >= 1000.0)
      ) AS v(rule, metric, bound, passed)
    ) r
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style validation suite over events (operators/quality.py):
    five rules compiled into ONE aggregation over ONE scan — null-frac
    bound, exact uniqueness, range check, accepted-set check, row floor.
    At 100 TB the property that matters is structural: adding a rule
    adds an aggregate expression, never a pass over the data."""
    from opentick_spark.operators import quality as Q

    ev = load(spark, sf_dir, "events")
    return Q.validate(
        ev,
        [
            Q.not_null("value"),
            Q.unique("event_id"),
            Q.in_range("value", 0, 1000),
            Q.accepted_values(
                "event_type", ["click", "error", "purchase", "signup", "view"]
            ),
            Q.min_rows(1000),
        ],
    )


@q(
    "decayed_event_stats",
    """
    WITH t AS (SELECT MAX(ts) AS tmax FROM events WHERE event_type = 'purchase'),
    w AS (
      SELECT user_id, value,
             exp(ln(2) * (epoch_us(ts) - epoch_us(tmax))
                 / (7.0 * 86400 * 1000000)) AS wgt
      FROM events, t WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(wgt), 4) AS decayed_count,
           ROUND(SUM(wgt * value), 4) AS decayed_value
    FROM w GROUP BY user_id
    """,
)
def decayed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed per-user aggregates (half-life 7 days, evaluated at
    the stream's latest timestamp): the feature-store recency primitive —
    exponential decay turns "activity" into a single number without
    windowing state. ONE aggregation after a 1-row max-ts broadcast;
    decay weights are pure row arithmetic (exp(ln2·Δt/hl), computed on
    µs so both engines share the clock base)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    tmax = ev.agg(F.max(ts_us()).alias("__tmax"))
    hl_us = 7.0 * 86400 * 1_000_000
    w = ev.select("user_id", "value", ts_us().alias("__t")).crossJoin(
        F.broadcast(tmax)
    ).withColumn(
        "__w",
        F.exp(
            F.lit(float(__import__("math").log(2)))
            * (F.col("__t") - F.col("__tmax"))
            / F.lit(hl_us)
        ),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("__w"), 4).alias("decayed_count"),
        F.round(F.sum(F.col("__w") * F.col("value")), 4).alias("decayed_value"),
    )


@q(
    "users_high_value_no_error",
    """
    SELECT DISTINCT e.user_id
    FROM events e
    WHERE EXISTS (
            SELECT 1 FROM events p
            WHERE p.user_id = e.user_id
              AND p.event_type = 'purchase' AND p.value > 200
          )
      AND NOT EXISTS (
            SELECT 1 FROM events x
            WHERE x.user_id = e.user_id
              AND x.event_type = 'error' AND x.value > 250
          )
    ORDER BY user_id
    """,
)
def users_high_value_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS shape: users with at least one
    >200 purchase and no high-value (>250) error — compiled as one semi
    join and one anti join on the same key (co-partitioned under AQE),
    never a correlated per-row subquery execution."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    hi = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).select("user_id")
    err = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 250)
    ).select("user_id")
    return (
        users.join(hi, "user_id", "left_semi")
        .join(err, "user_id", "left_anti")
        .orderBy("user_id")
    )


@q(
    "exact_quantiles_by_type",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def exact_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles per group (`percentile` — the
    sort-based exact aggregate; both engines use linear interpolation on
    the same rank formula, so the values match to rounding). The exact
    form is the oracle companion to `approx_quantiles`' sketch bound —
    at 100 TB you run the sketch; this is how you audit it."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# behavioral analytics (round 4, second batch)

@q(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS from_type,
             event_type AS to_type
      FROM events
    ),
    t AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
    FROM t
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence. One window pass partitioned by user (the natural data
    partitioning), then a (from,to)-keyed agg whose result is at most
    |event_type|² rows — the per-from normalization window runs on that
    tiny table, not on the events."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("prob"),
    )


@q(
    "mad_outlier_stats",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           SUM(CASE WHEN d.ad > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers,
           COUNT(*)::BIGINT AS n_total
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: median / MAD (the
    3·1.4826·MAD rule — the robust z-score). Medians are exact
    (percentile, not approx) because this query IS the oracle baseline;
    the two median aggs key on event_type (a handful of groups, partial
    agg crushes the shuffle) and their tiny results are broadcast back —
    the events table streams through three projected scans and never
    shuffles itself."""
    ev = normalize_events(load_raw(spark, sf_dir, "events")).select(
        "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )


@q(
    "run_length_histogram",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS island
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, island, COUNT(*) AS run_len
      FROM seq GROUP BY 1, 2, 3
    )
    SELECT event_type, run_len::BIGINT AS run_len, COUNT(*)::BIGINT AS n_runs
    FROM runs GROUP BY 1, 2
    """,
)
def run_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: how long users' consecutive same-event-type
    streaks run, as a (type, run_len) histogram. The classic
    two-row_number island id; both windows partition on user_id, so one
    shuffle on the user key feeds both sorts, and the island agg keys on
    (user, type, island) — never a global sort."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
                "island"
            ),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("event_type", F.col("run_len").cast("long").alias("run_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_runs")
    )


@q(
    "value_decile_stats",
    """
    WITH b AS (
      SELECT quantile_cont(value,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM events
    ),
    d AS (
      SELECT value,
             1 + len(list_filter(b.bs, x -> value > x)) AS decile
      FROM events, b
    )
    SELECT decile::BIGINT AS decile, COUNT(*)::BIGINT AS n,
           ROUND(MIN(value), 6) AS vmin, ROUND(MAX(value), 6) AS vmax,
           ROUND(AVG(value), 6) AS vavg
    FROM d GROUP BY 1
    """,
)
def value_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning without a global sort: exact decile
    boundaries from one percentile aggregate (a 1-row broadcast), then
    bucket membership is a pure projection — the scale-correct NTILE
    (a real NTILE window would funnel every row through one partition)."""
    ev = normalize_events(load_raw(spark, sf_dir, "events")).select("value")
    bounds = ev.agg(
        F.expr(
            "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("bs")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "value",
            (
                1 + F.size(F.filter(F.col("bs"), lambda x: F.col("value") > x))
            ).alias("decile"),
        )
        .groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
            F.round(F.avg("value"), 6).alias("vavg"),
        )
    )


@q(
    "lead_lag_correlation",
    """
    WITH p AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS h, AVG(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    w AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS h, AVG(value) AS w
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    l AS (SELECT unnest(range(-3, 4)) AS lag)
    SELECT l.lag::BIGINT AS lag, ROUND(corr(p.v, w.w), 4) AS corr,
           COUNT(*)::BIGINT AS n_obs
    FROM l
    JOIN p ON TRUE
    JOIN w ON w.h = p.h + l.lag * INTERVAL '1 day'
    GROUP BY 1
    """,
)
def lead_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily purchase and view
    series at lags −3..+3 days — does one series predict the other?
    The two daily aggregates are day-cardinality (tiny at any corpus
    size); the 7-row lag table fans them out via broadcast, so the
    whole sweep is a handful of broadcast joins over day-sized tables —
    the events table is scanned twice and never joined directly."""
    ev = load(spark, sf_dir, "events")
    day_ns = 86400 * 10**9
    day = F.expr(f"ts - pmod(ts, {day_ns})")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("h"))
        .agg(F.avg("value").alias("v"))
    )
    w = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(day.alias("h"))
        .agg(F.avg("value").alias("w"))
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    return (
        p.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(w.withColumnsRenamed({"h": "wh"})),
            F.col("wh") == F.col("h") + F.col("lag") * F.lit(day_ns),
        )
        .groupBy("lag")
        .agg(
            F.round(F.corr("v", "w"), 4).alias("corr"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )


@q(
    "funnel_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, MIN(epoch_us(e.ts)) - ANY_VALUE(s.signup_us)
               AS delta_us
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
      GROUP BY s.user_id
    )
    SELECT COUNT(*)::BIGINT AS n_converted,
           ROUND(quantile_cont(delta_us, 0.5) / 3600e6, 4) AS p50_hours,
           ROUND(quantile_cont(delta_us, 0.9) / 3600e6, 4) AS p90_hours,
           ROUND(AVG(delta_us) / 3600e6, 4) AS mean_hours
    FROM p
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long conversion takes: exact p50/p90/mean hours from first
    signup to first at-or-after purchase. Same one-shuffle funnel chain
    as funnel_signup_purchase (user-keyed min aggs co-partition), ending
    in a 1-row exact-percentile aggregate."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts_us()).alias("signup_us"))
    )
    p = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", ts_us().alias("p_us")
            ),
            "user_id",
        )
        .filter(F.col("p_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg((F.min("p_us") - F.first("signup_us")).alias("delta_us"))
    )
    h = 3600e6
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(delta_us, 0.5D)") / h, 4).alias("p50_hours"),
        F.round(F.expr("percentile(delta_us, 0.9D)") / h, 4).alias("p90_hours"),
        F.round(F.avg("delta_us") / h, 4).alias("mean_hours"),
    )


@q(
    "user_ts_features",
    """
    WITH t AS (
      SELECT user_id, value,
             epoch_us(ts) / 3600e6 AS t_h
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, COUNT(*)::BIGINT AS n,
           ROUND(AVG(value), 6) AS mean_v,
           ROUND(stddev_samp(value), 6) AS std_v,
           ROUND(regr_slope(value, t_h), 6) AS trend_per_hour
    FROM t GROUP BY user_id HAVING COUNT(*) >= 5
    """,
)
def user_ts_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity time-series feature vector for downstream ML: count,
    mean, sample stddev, and OLS trend slope of purchase values over
    time — all computed in ONE hash aggregate (regr_slope is the
    built-in covar/var ratio; no window, no second pass)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    t = ev.select(
        "user_id", "value", (ts_us() / F.lit(3600e6)).alias("t_h")
    )
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("mean_v"),
            F.round(F.stddev_samp("value"), 6).alias("std_v"),
            F.round(F.expr("regr_slope(value, t_h)"), 6).alias("trend_per_hour"),
        )
        .filter(F.col("n") >= 5)
    )


@q(
    "psi_value_drift",
    """
    WITH mm AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
    ),
    ref AS (
      SELECT value FROM events, mm WHERE epoch_us(ts) <= mm.mid
    ),
    b AS (
      SELECT quantile_cont(value,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM ref
    ),
    binned AS (
      SELECT 1 + len(list_filter(b.bs, x -> e.value > x)) AS bin,
             epoch_us(e.ts) <= mm.mid AS is_ref
      FROM events e, b, mm
    ),
    counts AS (
      SELECT bin,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n_ref)::DOUBLE AS t_ref, SUM(n_cur)::DOUBLE AS t_cur
      FROM counts
    )
    SELECT bin::BIGINT AS bin, n_ref::BIGINT AS n_ref, n_cur::BIGINT AS n_cur,
           ROUND(n_ref / tot.t_ref, 6) AS p,
           ROUND(n_cur / tot.t_cur, 6) AS q,
           ROUND((n_cur / tot.t_cur - n_ref / tot.t_ref)
                 * ln(greatest(n_cur / tot.t_cur, 1e-12)
                      / (n_ref / tot.t_ref)), 6) AS psi_term
    FROM counts, tot
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream (split at the midpoint timestamp): reference-decile
    bins, per-bin PSI terms — the standard ML feature-drift monitor.

    Scale shape: two 1-row broadcasts (time midpoint, reference decile
    boundaries — the second from an exact percentile over the reference
    slice), then ONE pass over events computing bin membership as a pure
    projection and a 10-row conditional-sum aggregate. Reference bins
    guarantee p > 0; q is clamped at 1e-12 inside the log."""
    ev = normalize_events(load_raw(spark, sf_dir, "events")).select(
        "value", F.expr("ts div 1000").alias("us")
    )
    mm = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid")
    )
    withmid = ev.crossJoin(F.broadcast(mm))
    bounds = (
        withmid.filter(F.col("us") <= F.col("mid"))
        .agg(
            F.expr(
                "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
                "0.6D,0.7D,0.8D,0.9D))"
            ).alias("bs")
        )
    )
    counts = (
        withmid.crossJoin(F.broadcast(bounds))
        .select(
            (1 + F.size(F.filter(F.col("bs"), lambda x: F.col("value") > x))).alias(
                "bin"
            ),
            (F.col("us") <= F.col("mid")).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
    )
    p = F.col("n_ref") / F.col("t_ref")
    qq = F.col("n_cur") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round(p, 6).alias("p"),
            F.round(qq, 6).alias("q"),
            F.round(
                (qq - p) * F.log(F.greatest(qq, F.lit(1e-12)) / p), 6
            ).alias("psi_term"),
        )
    )


@q(
    "key_skew_report",
    """
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    kt AS (SELECT COUNT(*) AS k, SUM(n) AS tot FROM c),
    r AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM c
    )
    SELECT kt.k::BIGINT AS n_keys,
           kt.tot::BIGINT AS n_rows,
           ROUND(2.0 * SUM(i * n) / (kt.k * kt.tot)
                 - (kt.k + 1.0) / kt.k, 6) AS gini,
           ROUND(SUM(CASE WHEN i > kt.k - greatest(kt.k // 100, 1)
                          THEN n ELSE 0 END)::DOUBLE / kt.tot, 6)
             AS top1pct_share,
           ROUND(MAX(n)::DOUBLE / kt.tot, 6) AS max_share
    FROM r, kt
    GROUP BY kt.k, kt.tot
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnostics for the user_id key: Gini
    coefficient of the per-key row distribution, the share held by the
    top 1% of keys, and the hottest key's share — the numbers that
    decide whether a layout needs salting / skew_buckets before a 100 TB
    run. The events table reduces to a key-cardinality count table in
    one agg; the rank window runs over THAT table (keys, not rows), and
    the report is a single-row aggregate."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("n", "user_id")
    r = (
        c.select(
            "n",
            F.row_number().over(w).alias("i"),
        )
    )
    k_tot = c.agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("tot")
    )
    return (
        r.crossJoin(F.broadcast(k_tot))
        .agg(
            F.first("k").cast("long").alias("n_keys"),
            F.first("tot").cast("long").alias("n_rows"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("n")) / (F.first("k") * F.first("tot"))
                - (F.first("k") + 1.0) / F.first("k"),
                6,
            ).alias("gini"),
            F.round(
                F.sum(
                    F.when(
                        F.col("i")
                        > F.col("k") - F.greatest(
                            F.expr("k div 100"), F.lit(1)
                        ),
                        F.col("n"),
                    ).otherwise(0)
                ).cast("double")
                / F.first("tot"),
                6,
            ).alias("top1pct_share"),
            F.round(F.max("n").cast("double") / F.first("tot"), 6).alias(
                "max_share"
            ),
        )
    )


@q(
    "mahalanobis_outliers",
    """
    WITH t AS (
      SELECT event_type, value AS x,
             json_extract(props, '$.k')::DOUBLE AS y
      FROM events
    ),
    m AS (
      SELECT event_type, AVG(x) AS mx, AVG(y) AS my,
             var_pop(x) AS sxx, var_pop(y) AS syy, covar_pop(x, y) AS sxy
      FROM t GROUP BY event_type
    )
    SELECT t.event_type, COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN
                 ((t.x - m.mx) * (t.x - m.mx) * m.syy
                  - 2 * (t.x - m.mx) * (t.y - m.my) * m.sxy
                  + (t.y - m.my) * (t.y - m.my) * m.sxx)
                 / (m.sxx * m.syy - m.sxy * m.sxy) > 13.815510557964274
               THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           ROUND(MAX(
                 ((t.x - m.mx) * (t.x - m.mx) * m.syy
                  - 2 * (t.x - m.mx) * (t.y - m.my) * m.sxy
                  + (t.y - m.my) * (t.y - m.my) * m.sxx)
                 / (m.sxx * m.syy - m.sxy * m.sxy)), 4) AS max_d2
    FROM t JOIN m USING (event_type)
    GROUP BY t.event_type
    """,
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outliers over (value, props.k) per event_type:
    squared Mahalanobis distance via the closed-form 2x2 inverse
    covariance, flagged at the chi-squared(2) p=0.001 cut. One moments
    aggregate per type (5 scalars, broadcast back), one scoring pass —
    the covariance matrix never leaves the executors as anything bigger
    than a handful of doubles."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    t = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("double").alias("y"),
    )
    m = t.groupBy("event_type").agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("sxx"),
        F.var_pop("y").alias("syy"),
        F.covar_pop("x", "y").alias("sxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    det = F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy")
    d2 = (
        dx * dx * F.col("syy") - 2 * dx * dy * F.col("sxy") + dy * dy * F.col("sxx")
    ) / det
    return (
        t.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(d2 > 13.815510557964274, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max(d2), 4).alias("max_d2"),
        )
    )


@q(
    "hourly_seasonality",
    """
    WITH h AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
             value
      FROM events
    ),
    per AS (
      SELECT event_type, hour, COUNT(*) AS n, AVG(value) AS avg_v
      FROM h GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, SUM(n * avg_v) / SUM(n) AS day_avg FROM per
      GROUP BY event_type
    )
    SELECT per.event_type, per.hour::BIGINT AS hour, per.n::BIGINT AS n,
           ROUND(per.avg_v, 6) AS avg_v,
           ROUND(per.avg_v / base.day_avg - 1.0, 6) AS rel_dev
    FROM per JOIN base USING (event_type)
    """,
)
def hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event_type: each hour's mean
    value and its relative deviation from the type's weighted all-hours
    mean. Two stacked aggregates — the hourly table is |types|x24 rows,
    so the baseline join is broadcast-trivial at any scale."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    h = ev.select(
        "event_type",
        (F.expr("(ts div 1000) div 3600000000") % 24).alias("hour"),
        "value",
    )
    per = h.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_v")
    )
    base = per.groupBy("event_type").agg(
        (F.sum(F.col("n") * F.col("avg_v")) / F.sum("n")).alias("day_avg")
    )
    return (
        per.join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            F.col("hour").cast("long").alias("hour"),
            F.col("n").cast("long").alias("n"),
            F.round("avg_v", 6).alias("avg_v"),
            F.round(F.col("avg_v") / F.col("day_avg") - 1.0, 6).alias("rel_dev"),
        )
    )


@q(
    "user_activity_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ent AS (
      SELECT user_id,
             ln(SUM(n)::DOUBLE) - SUM(n * ln(n::DOUBLE)) / SUM(n) AS h
      FROM c GROUP BY user_id
    )
    SELECT ROUND(h, 1) AS entropy_bin, COUNT(*)::BIGINT AS n_users
    FROM ent GROUP BY 1
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's event-type
    mix, reported as a 0.1-nat histogram — bots and single-purpose
    accounts pool at the low bins. Two stacked key-parallel aggregates
    ending in a bins-sized result."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    ent = c.groupBy("user_id").agg(
        (
            F.log(F.sum("n").cast("double"))
            - F.sum(F.col("n") * F.log(F.col("n"))) / F.sum("n")
        ).alias("h")
    )
    return ent.groupBy(F.round("h", 1).alias("entropy_bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@q(
    "event_type_lift",
    """
    WITH b AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
             event_type
      FROM events
    ),
    n AS (SELECT COUNT(DISTINCT (user_id, day)) AS n_baskets FROM b),
    s AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, c.event_type AS type_b, COUNT(*) AS n_ab
      FROM b a JOIN b c
        ON a.user_id = c.user_id AND a.day = c.day
       AND a.event_type < c.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_ab::BIGINT AS n_ab,
           ROUND(n_ab * n.n_baskets / (sa.n::DOUBLE * sb.n), 6) AS lift
    FROM pairs
    JOIN s sa ON sa.event_type = type_a
    JOIN s sb ON sb.event_type = type_b, n
    """,
)
def event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over (user, day) baskets: lift of
    each event-type pair — which behaviors travel together beyond
    chance. The basket table distincts once (one shuffle), the pair
    self-join keys on the basket id with fan-out bounded by types per
    basket, and the singles/total tables are |types|-sized broadcasts."""
    ev = normalize_events(load_raw(spark, sf_dir, "events"))
    day_ns = 86400 * 10**9
    b = ev.select(
        "user_id",
        F.expr(f"ts - pmod(ts, {day_ns})").alias("day"),
        "event_type",
    ).distinct()
    n = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    s = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = b.withColumnsRenamed({"event_type": "type_a"})
    c = b.withColumnsRenamed({"event_type": "type_b"})
    pairs = (
        a.join(c, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(s.withColumnsRenamed({"event_type": "type_a", "n": "na"})),
            "type_a",
        )
        .join(
            F.broadcast(s.withColumnsRenamed({"event_type": "type_b", "n": "nb"})),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.col("n_ab") * F.col("n_baskets")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@q(
    "pareto_nation_revenue",
    """
    WITH r AS (
      SELECT n.n_name AS nation, SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    t AS (SELECT SUM(rev) AS total FROM r)
    SELECT nation, ROUND(rev, 2) AS rev,
           ROUND(rev / t.total, 6) AS share,
           ROUND(SUM(rev) OVER (ORDER BY rev DESC, nation
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / t.total, 6) AS cum_share
    FROM r, t
    """,
)
def pareto_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis of revenue by nation: share and cumulative
    share in descending revenue order. The star join broadcasts every
    dimension; the Pareto window runs over the |nations|-sized aggregate
    only — ordering a 25-row table, never the fact table."""
    li = load_raw(spark, sf_dir, "lineitem")
    o = load_raw(spark, sf_dir, "orders")
    c = load_raw(spark, sf_dir, "customer")
    n = load_raw(spark, sf_dir, "nation")
    r = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    t = r.agg(F.sum("rev").alias("total"))
    w = Window.orderBy(F.col("rev").desc(), "nation").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        r.crossJoin(F.broadcast(t))
        .select(
            "nation",
            F.round("rev", 2).alias("rev"),
            F.round(F.col("rev") / F.col("total"), 6).alias("share"),
            F.round(F.sum("rev").over(w) / F.col("total"), 6).alias("cum_share"),
        )
    )


@q(
    "supplier_concentration_hhi",
    """
    WITH s AS (
      SELECT p.p_type AS ptype, l.l_suppkey,
             SUM(l.l_extendedprice) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    t AS (SELECT ptype, SUM(rev) AS total FROM s GROUP BY 1)
    SELECT s.ptype, COUNT(*)::BIGINT AS n_suppliers,
           ROUND(SUM(POW(s.rev / t.total, 2)), 6) AS hhi
    FROM s JOIN t USING (ptype)
    GROUP BY s.ptype
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per part type
    (Σ share² — 1/N for perfectly split supply, →1 for a monopoly).
    Two stacked aggregates on (type, supplier) then type; the totals
    join back on the type key the shares already carry."""
    li = load_raw(spark, sf_dir, "lineitem")
    p = load_raw(spark, sf_dir, "part")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("ptype"), "l_suppkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    t = s.groupBy("ptype").agg(F.sum("rev").alias("total"))
    return (
        s.join(F.broadcast(t), "ptype")
        .groupBy("ptype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.round(F.sum(F.pow(F.col("rev") / F.col("total"), 2)), 6).alias("hhi"),
        )
    )


@q(
    "hll_distinct_rollup",
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 86400000000)::BIGINT AS day_us,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via MERGEABLE hourly HLL sketches (Apache
    DataSketches through Spark's hll_sketch_agg/hll_union_agg): the
    continuous-aggregate pattern for COUNT(DISTINCT), which has no
    decomposable exact form. Hourly partials are built once (few KB per
    bucket); the day rollup unions partials without touching raw rows —
    at 100 TB the raw scan happens once ever and every coarser rollup
    costs O(#buckets). The day estimate (lg_k=12 → rse ~1.6%) must land
    within max(2, 8% of exact) — a 5-sigma gate a broken sketch trips.
    The exact count is the oracle-matched value; the bound boolean is
    deterministic for fixed input, so it hash-checks."""
    from opentick_spark.operators import sketch as SK

    ev = load(spark, sf_dir, "events")
    day_us = 86_400_000_000
    t_us = F.expr("ts div 1000")
    day = (t_us - F.pmod(t_us, F.lit(day_us))).alias("day_us")
    hour = (t_us - F.pmod(t_us, F.lit(3_600_000_000))).alias("hour_us")
    partials = SK.hll_partials(
        ev.select(day, hour, "user_id"), "user_id", ["day_us", "hour_us"]
    )
    est = SK.hll_rollup(partials, ["day_us"])
    exact = ev.select(day, "user_id").groupBy("day_us").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return exact.join(est, "day_us").select(
        "day_us",
        "exact_users",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users"))
            <= F.greatest(F.lit(2.0), F.lit(0.08) * F.col("exact_users"))
        ).alias("within_bound"),
    )
