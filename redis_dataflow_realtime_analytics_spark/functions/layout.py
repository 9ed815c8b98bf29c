"""Date-partitioned table layout — partition pruning for time-sliced reads.

The reference's read side always fetches a small trailing time window
(default last 10 minutes — ``TimeseriesMetricsController.java:43``). At
100 TB, serving that from an unpartitioned event log means scanning every
file's footer. Hive-style date partitioning turns the time filter into
directory pruning: the scan never opens files outside the requested days
(``PartitionFilters`` in the plan — gated in tests/test_plans.py).

Complements ``functions/bucketing.py`` (co-located join layout): partition
by the dominant *filter* dimension (event date), bucket by the dominant
*join* key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.events import read_events


def write_date_partitioned_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """Materialize the events fixture Hive-partitioned by event date.

    At scale, also size files inside each partition (``maxRecordsPerFile``
    or periodic compaction) — many tiny files per day is the classic
    partitioned-layout failure mode.
    """
    ev = read_events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out_dir)


def read_events_for_day(spark: SparkSession, out_dir: str, day: str) -> DataFrame:
    """Events of one calendar day from the partitioned layout. The equality
    filter on the partition column prunes directories at planning time —
    no data files outside ``day`` are opened."""
    return spark.read.parquet(out_dir).where(F.col("event_date") == F.lit(day))
