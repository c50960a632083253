"""SparkSession factory tuned for this engine.

Local-mode defaults target the test container (local[32], 128 GiB);
every knob is chosen to also be the right *shape* at cluster scale:
AQE on (runtime partition coalescing + skew-join handling), shuffle
partitions sized to parallelism, Arrow enabled for the Pandas-UDF
paths, UTC session timezone so results compare bit-for-bit against
the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mpi_word_count_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Env overrides: SPARK_GRAFT_CPUS (core count for local master),
    SPARK_GRAFT_DRIVER_MEM (driver heap).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner is weak-reference-driven: on a large heap that
        # never full-GCs, shuffle files / broadcast blocks from
        # completed jobs are never reclaimed and a long session slows
        # progressively (measured: a 7.6s fresh-session query ran 21s
        # mid-bench and 128s at bench end). The default periodic-GC
        # interval (30min) outlives a whole bench; 5min bounds the
        # litter. Same knob a long-running cluster driver needs.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
