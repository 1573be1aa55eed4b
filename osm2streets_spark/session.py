"""SparkSession factory with scale-oriented defaults.

AQE (runtime re-planning + skew-join handling), Arrow-batched pandas
UDFs, and shuffle partitions sized to the core count — the settings we'd
ship in spark-defaults on a real cluster (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "osm2streets-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # 2x cores: enough granularity for AQE to coalesce, not so many
        # that small-scale runs drown in task overhead. On a 1000-executor
        # cluster this becomes ~2x total cores via the same env knob.
        shuffle_partitions = 2 * cores
    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # our shuffles are byte-small but Python-CPU-heavy (geometry
        # kernels); don't let AQE coalesce below the core count or the
        # UDF stages serialize onto one task
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
                str(cores))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]")
    return builder.getOrCreate()
