"""Bucketed-table layout: co-located joins without a per-query shuffle.

At 100 TB the orders⋈lineitem equi-join is the dominant shuffle in every
order-grain query. Writing both fact tables bucketed (and sorted) by the
join key moves that shuffle to WRITE time, once: Spark's scan then reports
``outputPartitioning = HashPartitioning(key, n)`` on both sides and the
sort-merge join runs with NO Exchange — each task streams two pre-sorted,
co-located buckets (verified by tests/test_plans.py::test_bucketed_join_
has_no_shuffle).

Bucket count guidance: buckets ≥ peak parallelism, and sized so one bucket
of the larger table fits an executor's memory (128 MB–1 GB of parquet per
bucket is the usual band). Both tables MUST use the same count — mismatched
counts reintroduce the shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.

    Sorting within buckets lets the sort-merge join skip its sort stage
    too (scan → join directly).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def cobucketed_order_revenue(spark: SparkSession, orders_table: str, lineitem_table: str) -> DataFrame:
    """Order-grain revenue over two co-bucketed tables — the join plan
    must show no Exchange on either side."""
    from pyspark.sql import functions as F

    from .numeric import dsum

    o = spark.table(orders_table)
    li = spark.table(lineitem_table)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(rev, "revenue"))
    )
