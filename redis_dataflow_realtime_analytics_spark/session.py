"""SparkSession factory tuned for this engine.

Local test profile runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same settings scale to a real cluster: AQE handles runtime re-planning
(partition coalescing, skew-join splitting), shuffle partitions default to
the core count locally but should be ~2-3x total cores on a cluster, and
Arrow is enabled so any Pandas-UDF path transfers columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "redis-dataflow-realtime-analytics-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    UTC session timezone keeps event-time minute bucketing identical to the
    reference's Joda UTC key formatting
    (processor/.../pipeline/MetricsCalculationPipeline.java:237-243) and to
    the DuckDB oracle, which reads parquet timestamps as naive UTC.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
