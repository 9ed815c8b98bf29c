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
        # Let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (build side < threshold × shuffle partitions and
        # ≤ 1/3 of the other side): skips BOTH sides' sorts. At sf0.1 the
        # static plans barely move (dimension joins already broadcast at
        # 64m; q21's lineitem self-joins fail SHJ's much-smaller gate and
        # stay SMJ) — the measured win comes from the AQE local-map
        # rewrite below. Quiet-host r10 A/B (n=6 floors, adjacent
        # sessions): q21 −14%, q13 −7%, q4 −6%, q18 −4%, rest parity, no
        # key slower; a noisy-host A/B saw −11..−35% on the same keys.
        # The same preference holds on a cluster whenever build
        # partitions fit executor memory (the planner's own gate); flip
        # SPARK_GRAFT_PREFER_SMJ=true where graceful sort-spill matters
        # more than the sort cost (severely memory-tight executors).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # and let AQE rewrite a planned sort-merge to shuffled-hash at
        # runtime when every post-shuffle partition is below the local-map
        # threshold (default 0 = off); sized to the broadcast threshold
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_THRESHOLD", "64m"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
