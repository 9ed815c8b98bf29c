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


def key_skew_profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Join/agg-key skew diagnostic: one report row per candidate key
    column — the measurement that decides, BEFORE a 100 TB run, whether a
    key needs salting (:func:`salted_count_distinct`), AQE skew-join
    handling, or nothing.

    Output per key: (key_name, n_keys, n_rows, max_count, top_share,
    p50_count, p99_count, skew_p99_p50). ``top_share`` ≈ 1/n_keys means
    uniform; a p99/p50 ratio ≫ 1 or a top key holding percents of the
    table is the hot-key signature that serializes a shuffle partition.

    Plan: one count shuffle per key (map-side partials — the profile
    itself never concentrates rows) + a ≤|keys|-row rollup; the per-key
    frames union into one report. Percentiles interpolate over per-key
    counts identically in Spark (``percentile``) and DuckDB
    (``quantile_cont``): sorted values, index p·(n−1), linear blend — so
    the report is hash-checkable.
    """
    reports = []
    for key in key_cols:
        counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
        reports.append(
            counts.agg(
                F.lit(key).alias("key_name"),
                F.count("*").alias("n_keys"),
                F.sum("cnt").alias("n_rows"),
                F.max("cnt").alias("max_count"),
                (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_share"),
                F.expr("percentile(cnt, 0.5)").alias("p50_count"),
                F.expr("percentile(cnt, 0.99)").alias("p99_count"),
                (
                    F.expr("percentile(cnt, 0.99)") / F.expr("percentile(cnt, 0.5)")
                ).alias("skew_p99_p50"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def oracle_key_skew_profile(key_cols: Sequence[str], source_cte: str) -> str:
    """DuckDB twin of :func:`key_skew_profile` over ``source_cte`` (a CTE
    body named ``src`` providing the profiled columns)."""
    legs = []
    for key in key_cols:
        legs.append(f"""SELECT '{key}' AS key_name,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_count,
       CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_share,
       quantile_cont(cnt, 0.5) AS p50_count,
       quantile_cont(cnt, 0.99) AS p99_count,
       quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5) AS skew_p99_p50
FROM (SELECT {key}, count(*) AS cnt FROM src GROUP BY {key})""")
    union = "\nUNION ALL\n".join(legs)
    return f"""WITH src AS ({source_cte})
{union}"""
