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
    # In local mode the driver JVM IS the whole cluster (all executor
    # threads share its heap); pyspark's 1g default is sized for a
    # cluster driver that only coordinates, and 32 concurrent hash
    # aggregations starve it into OutOfMemoryError long before the
    # machine is loaded. But BIGGER IS NOT BETTER: a half-RAM (62g)
    # heap made GC so lazy that the ContextCleaner's weak-ref cleanup
    # starved and the bench's later queries degraded 3-10× (measured:
    # suite 24s @1g-when-it-survives, 28s @8g, 45s @62g). Production
    # executor JVMs are sized 8-16g for exactly this GC-health reason —
    # mirror that: a quarter of RAM clamped to [4g, 16g], overridable
    # via SPARK_DRIVER_MEMORY. Must be set before the JVM launches —
    # ignored on getOrCreate of an existing session.
    mem = os.environ.get("SPARK_DRIVER_MEMORY")
    if not mem:
        try:
            total_gb = (
                os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            ) / (1 << 30)
            mem = f"{max(4, min(int(total_gb * 0.25), 16))}g"
        except (ValueError, OSError, AttributeError):
            mem = "4g"
    builder = builder.config("spark.driver.memory", mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
