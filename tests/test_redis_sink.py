"""Redis sink parity: emitted commands must use the reference's literal key
formats; the command-log fallback replaces redis-py when absent."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.sources import normalize_events, read_events
from redis_dataflow_realtime_analytics_spark.streaming.redis_sink import (
    RedisMetricsSink,
    metric_commands,
)

from .conftest import SF_SMOKE


def test_key_formats_match_reference(spark):
    ev = normalize_events(read_events(spark, SF_SMOKE)).limit(200)
    cmds = metric_commands(ev).cache()
    keys = [r.key for r in cmds.select("key").distinct().collect()]
    prefixes = {
        "visitCounter_", "evcounter_e_", "hll_var_", "set_var_", "hll_exp_",
        "set_exp_", "hll_experiments_experiments_", "set_experiments_experiments_",
        "hll_variants_variants_", "set_variants_variants_", "hll_dthr_", "set_dthr_",
    }
    assert all(any(k.startswith(p) for p in prefixes) for k in keys)
    # Joda 'prefix'_yyyy_MM_dd'T'HH_mm, e.g. visitCounter_2024_01_01T00_09
    minute_keys = [k for k in keys if k.startswith("visitCounter_")]
    assert minute_keys
    import re

    assert all(
        re.fullmatch(r"visitCounter_\d{4}_\d{2}_\d{2}T\d{2}_\d{2}", k) for k in minute_keys
    ), minute_keys[:3]


def test_methods_per_family(spark):
    ev = normalize_events(read_events(spark, SF_SMOKE)).limit(200)
    cmds = metric_commands(ev)
    m = {
        r.key.split("_")[0]: r.method
        for r in cmds.select("key", "method").distinct().collect()
    }
    assert m["visitCounter"] == "INCRBY"
    assert m["hll"] == "PFADD"
    assert m["set"] == "SADD"
    assert m["evcounter"] == "PFADD"


def test_command_log_fallback(spark, tmp_path):
    ev = normalize_events(read_events(spark, SF_SMOKE)).limit(100)
    sink = RedisMetricsSink(log_dir=str(tmp_path / "cmdlog"))
    sink(ev, batch_id=0)
    log = spark.read.parquet(str(tmp_path / "cmdlog"))
    assert log.where(F.col("method") == "INCRBY").count() > 0
    assert log.where(F.col("method") == "PFADD").count() > 0
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} == {0}
