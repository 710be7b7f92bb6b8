"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; the configs are chosen so the
same code is correct on a multi-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), UTC session timezone so
results are comparable with external oracles, Arrow for any pandas
exchange, and shuffle partitions sized to the core count rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_neptune_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults honor the driver environment: ``SPARK_GRAFT_CPUS`` sets the
    local core count (default 32).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Test parquet is written with TIMESTAMP(NANOS); Spark reads those
        # as raw nanos longs, which the table loader converts back.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # local[N] puts executors in the driver JVM; size the heap so the
        # 32-thread shuffle/agg working set doesn't trigger GC pauses
        # (the container gives us 128 GiB — 16g is still conservative).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
