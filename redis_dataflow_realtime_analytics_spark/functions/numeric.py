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
    """DuckDB SQL twin of :func:`dsum`.

    The final decimal→double conversion routes through VARCHAR: DuckDB's
    direct decimal→double cast divides a double-converted unscaled
    hugeint by 10^scale, which double-rounds and lands on the wrong last
    bit for ~26% of decimals whose unscaled value exceeds 2^53 (measured
    r5, 20k samples) — i.e. any scale-6 sum above ~9e9, which TPC-H
    revenue aggregates reach at sf≥0.1. Printing the decimal (exact
    digits) and parsing with strtod is correctly rounded, as is Spark's
    BigDecimal.doubleValue, so both engines agree at any magnitude.
    """
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL twin of :func:`davg` (same varchar routing as
    :func:`oracle_dsum`)."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})"
    )


# ---------------------------------------------------------------------------
# Final-value quantization (r5). Transcendental finals (ln/exp/pow) are only
# correctly-rounded to within 1 ulp, and Java's Math.log and DuckDB's libm
# ln disagree in the last bit on ~1-2% of inputs (r4: text_token_entropy,
# 8/500 sf0.01 docs). Quantizing the FINAL float column to 12 dp on both
# sides collapses those — but only if both sides round the same way, and
# they don't by default. Measured facts (r5, 80k+ random doubles):
#   * Spark's double→decimal cast goes through Double.toString (shortest
#     round-trip repr) then digit-wise HALF_UP — NOT the exact binary
#     expansion (1075/60000 values differ from exact-expansion HALF_UP).
#   * DuckDB's direct double→DECIMAL(38,12) cast scales by 10^12 in double
#     arithmetic — disagrees with Spark on ~0.02% of values at |x|<5 and
#     ~0.4% at |x|~100 (this, not ln, was the residual red row after the
#     first r5 fix attempt).
#   * DuckDB's double→VARCHAR is also shortest round-trip repr, and its
#     VARCHAR→DECIMAL parse is digit-wise half-away-from-zero — composing
#     them reproduces Spark's cast BIT-EXACTLY: 0/81,259 mismatches over
#     |x|<9000 including negatives and ln-magnitude values.
#   * Validity domain |x| < 2^53 / 10^12 ≈ 9007: above that the DECIMAL's
#     unscaled int exceeds 2^53 and the decimal→double conversions diverge.
# Residual risk after quantization: a genuine 1-ulp input divergence lands
# within 1 ulp of a 12-dp rounding boundary — P ≈ 1e-4 per divergent row.
# ---------------------------------------------------------------------------

DEC12 = "decimal(38,12)"


def dquant(col: Column | str, alias: str | None = None) -> Column:
    """Quantize a final double expression to 12 dp (engine side).

    Use on any OUTPUT column whose value is produced by a transcendental
    (``F.log``/``exp``/``pow``) that is not already decimal-disciplined —
    pair with :func:`oracle_dquant` on the oracle side (bit-faithful at
    any magnitude; both of its conversions are varchar-routed).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = c.cast(DEC12).cast("double")
    return out.alias(alias) if alias else out


def oracle_dquant(expr: str) -> str:
    """DuckDB SQL twin of :func:`dquant` — bit-faithful to Spark's cast.

    Routes through VARCHAR because DuckDB's direct double→decimal cast
    rounds via a scaled double multiply and disagrees with Spark's
    toString-then-digit-round semantics on ~0.02-0.4% of values.
    TRY_CAST mirrors Spark's non-ANSI NaN/Inf→NULL cast behavior. The
    decimal→double conversion also routes through VARCHAR (exact digits +
    correctly-rounded strtod), because DuckDB's direct decimal→double
    cast is off by one ulp for ~26% of decimals with unscaled > 2^53 —
    with both conversions varchar-routed the idiom is bit-faithful to
    Spark's cast chain at ANY magnitude.
    """
    return (
        "CAST(CAST(TRY_CAST(CAST(("
        + expr
        + ") AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)"
    )


def oracle_dsum12(expr: str) -> str:
    """``CAST(sum(dterm) AS DOUBLE)`` with both conversions varchar-routed
    — the full oracle twin of Spark's
    ``F.sum(col.cast("decimal(38,12)")).cast("double")``."""
    return f"CAST(CAST(sum({oracle_dterm(expr)}) AS VARCHAR) AS DOUBLE)"


def oracle_dterm(expr: str) -> str:
    """Per-term twin of Spark's ``col.cast("decimal(38,12)")`` inside a
    decimal SUM — same varchar routing as :func:`oracle_dquant`, but stays
    DECIMAL so the enclosing SUM accumulates exactly. No magnitude limit:
    the 2^53 hazard applies only to decimal→double conversion, which for
    summed terms happens once on the (identical) final decimal sum.
    """
    return f"TRY_CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,12))"
