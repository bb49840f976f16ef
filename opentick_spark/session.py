"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning, skew-join handling), shuffle partitions sized to the
parallelism actually available, Arrow enabled for the pandas-UDF paths, and
nanosecond parquet timestamps surfaced as epoch-nano longs (the engine's
native timestamp representation — see typesys.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opentick_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.parallelismFirst stays at Spark's default
        # (true) — TRIED AND REVERTED (r15): flipping it to false (the
        # production advice in Spark's tuning docs) coalesces this
        # suite's tiny post-shuffle relations to the 64MB advisory
        # size, i.e. ONE partition, single-coring window/agg stages
        # whose JVM work still benefits from fan-out; suite-level
        # interleaved A/B at 32 cores measured the flip SLOWER in both
        # adjacent pairs (53.3 vs 55.0, 63.0 vs 66.6). On a real
        # cluster with 100MB-1GB shuffle partitions the flag is moot —
        # size-based coalescing and parallelism-based coalescing agree
        # there; locally parallelism-first is the right default.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver's events table carries parquet TIMESTAMP(NANOS); Spark's
        # TimestampType is µs-only, so read nanos as epoch-nano longs — the
        # engine's native timestamp type (reference: nanosecond first-class,
        # README.md:9).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # carriage-return progress bars interleave with structured tool
        # output (bench JSON, oracle_check lines) and glue log lines
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.maxResultSize", "4g")
    )
    # ContextCleaner needs GC to reap weak refs before it can clean
    # shuffle files/broadcasts; with a big lazy heap that cleanup starves
    # on LONG sessions. But a short interval forces a full System.gc()
    # stop-the-world into short runs (a 45s interval lands ~once inside
    # the ~35s bench suite and cost 24% in r3's driver run — BENCH_r03 vs
    # r02). Default: leave Spark's 30min default (right for bench-length
    # sessions); override for long-lived servers via env.
    gc_interval = os.environ.get("SPARK_GRAFT_PERIODIC_GC", "")
    if gc_interval:
        builder = builder.config("spark.cleaner.periodicGC.interval", gc_interval)
    # Driver heap: LEAVE SPARK'S 1g DEFAULT unless asked. The r3 attempt
    # to "production-size" the local heap (RAM/4 clamped to 16g +
    # periodicGC 45s) cost 24% on the driver bench; the r4 measurement
    # matrix (PLANS.md, 2 reps × fresh JVM each, sf0.1 suite) reads:
    #   1g/defaultGC 24.8/27.0 · 4g/defaultGC 27.8/28.1 · 4g/45s
    #   29.8/36.4 · 8g/defaultGC 34.6/26.2 · 16g/defaultGC 29.5/28.8 ·
    #   16g/45s ≈ r3's 36.9 driver number.
    # Small heap = frequent cheap young-GCs that also keep the
    # ContextCleaner's weak-ref cleanup flowing; big heaps only delay and
    # fatten collections at this working-set size, and a forced
    # System.gc() every 45s lands mid-suite. Entry points with a larger
    # working set (oracle_check runs all 109 registry queries in one
    # session) opt in via ``driver_memory=`` or SPARK_DRIVER_MEMORY;
    # must be set before the JVM launches — ignored on getOrCreate of an
    # existing session.
    mem = os.environ.get("SPARK_DRIVER_MEMORY") or driver_memory
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
