"""Differential test: every oracle-gated registry query matches DuckDB.

This mirrors the driver's t2 gate (sf0.01) but runs at sf0.001 for speed;
the full-size check is the driver's job.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark import registry  # noqa: E402

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_query_matches_oracle(spark, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    compare(df, registry.ORACLE[name], SF_SMOKE)


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLE)))
def test_unoracled_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
