"""transformWithState twins: availability, batch parity, legacy parity.

Spark 4's ``transformWithStateInPandas`` (SPARK-49564) is the successor
of ``applyInPandasWithState``; the engine carries both. These tests pin:

* the TWS uniques op equals the batch ``count_distinct`` truth;
* the TWS TTL-sessionization equals the LEGACY stateful op row-for-row
  (and therefore, transitively, the batch ``user_sessions`` oracle the
  legacy op is pinned against in test_streaming.py);
* re-running inside one session is stable (state stores and the
  protobuf shim don't leak across queries).

Skipped wholesale when the runtime can't host TWS (no protobuf runtime
and no vendored copy to shim — see ``stateful._protobuf_shim_path``).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.streaming import stateful

from .conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"

pytestmark = pytest.mark.skipif(
    not stateful.tws_available(),
    reason="transformWithStateInPandas unavailable: no protobuf runtime",
)


def test_tws_uniques_matches_batch(spark):
    got = {
        r["variant"]: r["unique_users"]
        for r in stateful.stream_exact_uniques_per_variant_tws(
            spark, EVENTS
        ).collect()
    }
    want = {
        r["variant"]: r["u"]
        for r in spark.read.parquet(EVENTS)
        .groupBy(F.col("event_type").alias("variant"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    assert got == want and got


def test_tws_sessions_matches_legacy(spark):
    tws = stateful.stream_sessions_ttl_tws(spark, EVENTS, max_files_per_trigger=2)
    legacy = stateful.stream_sessions_ttl(spark, EVENTS, max_files_per_trigger=2)
    assert tws.exceptAll(legacy).count() == 0
    assert legacy.exceptAll(tws).count() == 0
    assert tws.count() > 0


def test_tws_uniques_rerun_stable(spark):
    a = sorted(map(tuple, stateful.stream_exact_uniques_per_variant_tws(spark, EVENTS).collect()))
    b = sorted(map(tuple, stateful.stream_exact_uniques_per_variant_tws(spark, EVENTS).collect()))
    assert a == b


def test_tws_session_confs_restored(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    stateful.stream_exact_uniques_per_variant_tws(spark, EVENTS)
    assert spark.conf.get(key, None) == before
