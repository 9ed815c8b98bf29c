"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Dot products fold through an exact ``DECIMAL(38,12)`` accumulator (see
``functions.numeric`` for why: order-independent bit-identical results
across partitionings and vs the DuckDB oracle). All expressions are
Catalyst higher-order functions — no Python UDFs in the hot path; the
per-element work stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Exact-decimal dot product of two array<float|double> columns."""
    return F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,12))), "
        f"CAST(0 AS DECIMAL(38,12)), (acc, v) -> CAST(acc + v AS DECIMAL(38,12))) AS DOUBLE)"
    )


def norm2(a: str) -> Column:
    """Squared L2 norm (exact-decimal accumulation)."""
    return dot(a, a)


def cosine(dot_col: str, n2_a: str, n2_b: str) -> Column:
    """Cosine from a precomputed dot product and squared norms.

    ``sqrt`` is IEEE-754 correctly rounded, so the result is deterministic
    across engines given identical inputs.
    """
    return F.col(dot_col) / (F.sqrt(F.col(n2_a)) * F.sqrt(F.col(n2_b)))


def oracle_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` for a pre-zipped pair — used inline by
    registry oracles (operates on ``unnest(list_zip(a, b))`` terms)."""
    return (
        f"CAST(SUM(CAST(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) "
        f"AS DECIMAL(38,12))) AS DOUBLE)"
    )
