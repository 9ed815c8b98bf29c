"""G1 generator invariants: wire distribution, determinism, parse round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.sources import parse_wire_events
from redis_dataflow_realtime_analytics_spark.sources.generator import (
    VARIANTS,
    generate_events,
    generate_wire_json,
)


def test_distribution(spark):
    ev = generate_events(spark, n=5000).cache()
    variants = {r.variant for r in ev.select("variant").distinct().collect()}
    assert variants == set(VARIANTS)
    exps = [int(r.experiment_id) for r in ev.select("experiment_id").distinct().collect()]
    assert min(exps) >= 1 and max(exps) <= 100
    # uid overlap model: consecutive drift windows share users
    n_users = ev.select("uid").distinct().count()
    assert 0 < n_users < 5000


def test_deterministic_across_parallelism(spark):
    a = sorted(map(tuple, generate_events(spark, n=500).collect()))
    b = sorted(map(tuple, generate_events(spark, n=500).repartition(13).collect()))
    assert a == b


def test_wire_roundtrip(spark):
    wire = generate_wire_json(spark, n=300)
    parsed = parse_wire_events(wire)
    assert parsed.count() == 300
    assert dict(parsed.dtypes)["timestamp"] == "timestamp"
    assert parsed.where(F.col("uid").isNull()).count() == 0
