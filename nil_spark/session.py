"""SparkSession factory with the engine's pinned runtime config."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "nil_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    **extra,
) -> SparkSession:
    master = master or os.environ.get("NIL_SPARK_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores and master == "local[*]":
        master = f"local[{cores}]"
    sp = shuffle_partitions or int(os.environ.get("NIL_SPARK_SHUFFLE", "32"))
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: one JVM hosts everything — size the heap for the
        # machine (128 GiB here) or 32 threads of shuffle/sort/cache
        # will spill and GC-thrash (observed: warm runs slower than cold)
        .config("spark.driver.memory", os.environ.get("NIL_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
