"""Registry-wide guard against oracle dtype drift — the r3/r5 failure
class where a value-exact query hash-fails at the driver because DuckDB
types an integer aggregate wider than Spark does.

The driver reads both sides through pandas and hashes stringified
cells.  DuckDB types ``sum(BIGINT)`` (plain and windowed) as HUGEINT,
which pandas lands as float64, so every integer cell stringifies
``"4568.0"`` against Spark's int64 ``"4568"`` — a whole-column
hash-fail with bit-exact values.  This shipped 4 red rows in r5
(``corpus_shard_assignment``, ``pack_efficiency_report``,
``text_bpe_merges``, ``text_token_entropy``) even though the repo had
already documented the lesson at the r3 ``corpus_mix_report`` oracle.

This test needs NO query execution: Spark-side dtypes come from the
analyzed schema (``df.schema``), oracle-side types from DuckDB's
``DESCRIBE (<sql>)`` (plan-only).  A Spark integral column paired with
a DuckDB HUGEINT/DECIMAL/DOUBLE column (or the converse) is a fail —
wrap the oracle expression in ``CAST(... AS BIGINT)``.

Known coincidence, deliberately NOT exempted here because it is
schema-level (both sides *declare* integer; the float64 widening only
happens at toPandas-time when NULLs are present on BOTH sides):
``asof_last_click_before_error``, ``corpus_version_history``,
``dedup_incremental_new_docs``, ``sink_redis_command_catalog``,
``stream_click_error_left_join`` carry NULL-bearing int columns that
ride on both sides landing float64 identically — they pass this test
because their declared types agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from redis_dataflow_realtime_analytics_spark import registry

from .conftest import SF_SMOKE
from .oracle import duck_con

SPARK_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
SPARK_FLOAT = (T.FloatType, T.DoubleType)

# DuckDB type names that land as pandas float64 (or object→float) and
# therefore stringify with a trailing ".0" against a Spark int64 column.
DUCK_FLOATISH = ("HUGEINT", "DECIMAL", "DOUBLE", "FLOAT", "REAL")
DUCK_INTISH = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
               "USMALLINT", "UINTEGER", "UBIGINT")


def _duck_types(con, sql: str) -> dict[str, str]:
    rows = con.sql(f"DESCRIBE ({sql})").fetchall()
    return {r[0]: r[1].upper() for r in rows}


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_oracle_dtype_parity(spark, name):
    con = duck_con(SF_SMOKE)
    try:
        duck = _duck_types(con, registry.ORACLE[name])
    finally:
        con.close()
    df = registry.QUERIES[name](spark, SF_SMOKE)
    drift = []
    for field in df.schema.fields:
        dt = duck.get(field.name)
        if dt is None:
            continue  # schema mismatch is the driver's separate gate
        base = dt.split("(")[0]
        if isinstance(field.dataType, SPARK_INT) and (
            base in DUCK_FLOATISH or base.startswith("DECIMAL")
        ):
            drift.append((field.name, str(field.dataType), dt))
        if isinstance(field.dataType, SPARK_FLOAT) and base in DUCK_INTISH:
            drift.append((field.name, str(field.dataType), dt))
    assert not drift, (
        f"{name}: oracle/engine dtype drift (driver will hash-fail on "
        f"stringified cells): {drift} — CAST the oracle column to match"
    )
