"""Order-independent numeric aggregation helpers.

Floating-point sums are not associative, so a distributed Spark sum and a
single-threaded oracle sum over the same doubles can differ in the last
bits — enough to break an exact value-hash comparison. The engine therefore
aggregates measures through an exact decimal accumulator and casts the
result back to double:

    Spark :  CAST(SUM(CAST(x AS DECIMAL(38, 6))) AS DOUBLE)
    oracle:  CAST(SUM(CAST(x AS DECIMAL(38, 6))) AS DOUBLE)

Decimal addition is exact and order-independent, so both engines produce
bit-identical doubles regardless of partitioning/parallelism. The per-row
double→decimal cast is deterministic (a double is essentially never at a
decimal rounding tie). This also removes run-to-run nondeterminism at
1000-executor scale, where partial-aggregate merge order varies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, double division.

    Matches the oracle formulation
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)`` —
    identical double inputs to one IEEE division ⇒ identical result.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
