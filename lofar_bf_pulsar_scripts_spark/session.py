"""SparkSession factory.

Local-mode harness: one JVM, ``SPARK_GRAFT_CPUS`` executor threads
(default all). The configs below are the scale-relevant defaults we
would also ship on a real cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (vectorized pandas-UDF
transfer), UTC session timezone (oracle comparability), shuffle
partitions sized to the machine rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lofar-bf-pulsar-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep the default-ish 10 MB: a larger threshold made Catalyst
        # broadcast fact tables (measured 15x slowdown on the 6-way
        # join); true dimension tables get explicit broadcast() hints
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # driver testdata parquet carries TIMESTAMP(NANOS) — read as
        # int64 ns and normalize in tables.ts_seconds (DuckDB truncates
        # the same files to micros; see tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
