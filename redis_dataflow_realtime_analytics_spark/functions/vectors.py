"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Determinism strategy: **fixed-point arithmetic**. Each float component is
quantized once to ``floor(x · 2^20)`` as int64; dot products are then exact
int64 sums — associative, order-independent, bit-identical across any
partitioning and vs the DuckDB oracle, and far cheaper than a decimal
accumulator (plain long multiply-adds inside codegen).

Precision: components quantize with ≤2⁻²⁰ absolute error, so cosines are
exact to ~1e-5 — far below any meaningful similarity resolution, and the
oracle applies the identical quantization.

Overflow headroom: |x| ≤ 2³ ⇒ |qx·qy| ≤ 2⁴⁶; dims ≤ 2¹⁰ ⇒ |dot| ≤ 2⁵⁶ < 2⁶³.

All expressions are Catalyst higher-order functions — no Python UDFs in the
hot path; per-element work stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed-point scale: 2^20 (power of two ⇒ x·SCALE is an exact double op).
SCALE = float(1 << 20)


def quantize(col: str) -> Column:
    """array<float> → array<bigint>, component-wise floor(x · 2^20).

    Apply ONCE per vector (e.g. ``withColumn``) so joins/pair loops reuse
    the quantized form instead of re-quantizing per pair.
    """
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )


def qdot(a: str, b: str) -> Column:
    """Exact int64 dot product of two quantized (array<bigint>) columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def qnorm2(a: str) -> Column:
    """Squared L2 norm of a quantized vector (exact int64)."""
    return qdot(a, a)


def cosine(dot_col: str, n2_a: str, n2_b: str) -> Column:
    """Cosine from an int64 dot and squared norms.

    int64→double casts and ``sqrt`` are IEEE-exact/correctly-rounded, so the
    result is deterministic across engines given identical integer inputs.

    Zero-norm convention (r7 adversarial-fixture find): a zero vector made
    every consumer crash under ANSI mode (DIVIDE_BY_ZERO) — and at 100 TB
    a zero embedding WILL occur (failed encoder, padded batch). cosine
    with a zero vector is defined here as 0.0 (no similarity evidence);
    the oracle applies the identical CASE so both engines agree exactly.
    """
    denom = F.sqrt(F.col(n2_a).cast("double")) * F.sqrt(F.col(n2_b).cast("double"))
    return F.when(
        (F.col(n2_a) > 0) & (F.col(n2_b) > 0),
        F.col(dot_col).cast("double") / denom,
    ).otherwise(F.lit(0.0))


# --- int8 scalar quantization (compressed-ANN path) --------------------------
def vec_maxabs(col: str) -> Column:
    """Per-vector max |component| as double — the int8 scale denominator.
    Max over exact doubles is associative and engine-portable."""
    return F.expr(
        f"aggregate({col}, CAST(0 AS DOUBLE), (a, v) -> greatest(a, abs(CAST(v AS DOUBLE))))"
    )


def quantize_int8(col: str, maxabs_col: str) -> Column:
    """array<float> → int8-range array<bigint>: round-half-up of
    ``x · 127/max|x|`` — classic per-vector scalar quantization (4→1 byte
    per component; 32× smaller than the float64 working form, the memory
    lever that keeps a 100 TB embedding corpus scannable).

    ``floor(x·s + 0.5)`` is used instead of ``round`` because engines
    disagree on round-half semantics while floor is universally
    IEEE-exact; every double op here (cast, mul, add) is correctly
    rounded, so the quantized ints — and hence all downstream integer
    dots — are bit-identical across Spark, DuckDB, and numpy.

    ``maxabs_col`` must be a plain column (see :func:`vec_maxabs`) so the
    scale is computed once per vector, not once per component.
    """
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
        f"(CAST(127 AS DOUBLE) / greatest({maxabs_col}, 1e-30)) + 0.5) AS BIGINT))"
    )


# --- DuckDB oracle twins -----------------------------------------------------
def oracle_cosine(d: str, a: str, b: str) -> str:
    """SQL twin of :func:`cosine`, INCLUDING the zero-norm convention:
    CASE-guarded 0.0 when either squared norm is 0 — the same rule the
    engine applies, so a zero embedding hashes identically instead of
    crashing one engine and NaN-ing the other."""
    return (
        f"CASE WHEN {a} > 0 AND {b} > 0 THEN CAST({d} AS DOUBLE) / "
        f"(sqrt(CAST({a} AS DOUBLE)) * sqrt(CAST({b} AS DOUBLE))) "
        f"ELSE 0.0 END"
    )


def oracle_quantize(col: str) -> str:
    return f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"


def oracle_quantize_int8(col: str) -> str:
    """DuckDB twin of :func:`quantize_int8` (scale inlined via list_max)."""
    return (
        f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
        f"(CAST(127 AS DOUBLE) / greatest(list_max(list_transform({col}, "
        f"v -> abs(CAST(v AS DOUBLE)))), 1e-30)) + 0.5) AS BIGINT))"
    )


def oracle_qdot(x: str, y: str) -> str:
    """SUM of element products over an unnested zip — DuckDB SUM(BIGINT)
    yields HUGEINT, so cast back to BIGINT (values fit, see overflow note)."""
    return f"CAST(SUM({x} * {y}) AS BIGINT)"


def quantize_py(vec: list[float]) -> list[int]:
    """Python twin of :func:`quantize` — for driver-side vectors (e.g. a
    trained k-means codebook) that must join against SQL-quantized columns.
    ``math.floor`` on a double matches SQL ``floor`` bit-for-bit."""
    import math

    return [int(math.floor(float(x) * SCALE)) for x in vec]
