"""Skew-resilient aggregation: salted two-phase exact distinct counts.

The reference's per-variant / per-experiment grains (W3–W6,
``MetricsCalculationPipeline.java:90-129``) group the whole stream by a
LOW-CARDINALITY key — 4 variants, 100 experiments. Redis absorbs that skew
because every ``SADD`` is an O(1) server-side op; a naive Spark
``groupBy(variant).agg(count_distinct(uid))`` instead funnels 100 TB of rows
into ≤|keys| reduce tasks — the canonical hot-key bottleneck.

The fix is value-hash salting: pre-aggregate on ``(key, salt)`` where
``salt = pmod(xxhash64(value), n_salts)``. Because the salt is a pure
function of the VALUE, each distinct value lands in exactly one salt bucket,
so per-bucket distinct sets are disjoint and phase 2 can plain-SUM the
partial counts — the result is EXACT (oracle-gated in the registry), unlike
sampling/sketch fallbacks. Parallelism becomes |keys| × n_salts.

AQE's skew-join splitting does not help here (it rebalances joins, not
aggregations), which is why this is an explicit operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default salt fan-out; at 1000 executors raise toward cores/|keys|.
N_SALTS = 16


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str | Column],
    value_col: str,
    alias: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Exact ``count(DISTINCT value_col)`` per ``keys`` under key skew.

    Phase 1 shuffles on (keys, salt) — n_salts× the naive parallelism;
    phase 2 shuffles only |keys|·n_salts pre-aggregated rows.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.groupBy(*keys, salt)
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))
