"""Offline state-store reads (``streaming/state_reader.py``): the
``statestore`` / ``state-metadata`` data sources over the engine's own
checkpoints.

What these pin, beyond the registry's SQL oracles:

* the persisted state FILES — not the update-mode sink every other
  streaming gate watches — carry exactly the batch-distinct membership
  sets (legacy HDFS-provider tuple state AND TWS RocksDB MapState);
* time-travel (``batchId``) snapshots equal a file-level chunk-prefix
  oracle computed here from the replay directory itself, independent of
  both Spark and DuckDB;
* the time-travel read is LOAD-BEARING: a planted fixture puts a known
  uid only in the last chunk and a whole variant only in the middle
  chunk, and the early snapshots must not contain either;
* the ``state-metadata`` layout (operator names, partition counts,
  committed-batch bounds) is deterministic.

Reference analogue: redis-cli SCARD/SMEMBERS forensics against the live
keyspace (``MetricsCalculationPipeline.java:54-57``); here the durable
checkpoint is the keyspace.
"""

from __future__ import annotations

import collections

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.streaming import state_reader, stateful

from .conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"


def _batch_distinct(spark, path):
    return {
        r["variant"]: r["u"]
        for r in spark.read.parquet(path)
        .groupBy(F.col("event_type").alias("variant"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }


def test_final_state_matches_batch_distinct(spark):
    got = {
        r["variant"]: r["unique_users"]
        for r in state_reader.state_reader_uniques(spark, EVENTS).collect()
    }
    assert got == _batch_distinct(spark, EVENTS) and got


def test_time_travel_matches_file_level_prefix_oracle(spark):
    """Each batch-k snapshot equals distinct-per-variant over replay
    chunks 0..k, computed here straight from the chunk parquet files —
    an oracle independent of Spark AND DuckDB."""
    import glob
    import os

    replay = state_reader._ordered_chunked_replay_dir(EVENTS)
    chunks = sorted(glob.glob(os.path.join(replay, "chunk_*.parquet")))
    assert len(chunks) == state_reader.N_CHUNKS

    seen: dict[str, set] = collections.defaultdict(set)
    want = {}
    for k, fp in enumerate(chunks):
        t = pq.read_table(fp, columns=["event_type", "user_id"])
        for v, u in zip(
            t.column("event_type").to_pylist(), t.column("user_id").to_pylist()
        ):
            seen[v].add(u)
        want.update({(k, v): len(us) for v, us in seen.items()})

    got = {
        (r["batch_id"], r["variant"]): r["unique_users"]
        for r in state_reader.state_time_travel_uniques(spark, EVENTS).collect()
    }
    assert got == want and got


def test_time_travel_is_load_bearing(spark, tmp_path):
    """Planted: uid 9999 ('click') appears ONLY in the last chunk and
    variant 'signup' ONLY in the middle chunk — early snapshots must
    exclude them, which fails if every batchId read silently returned
    the final store image."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []

    def add(i, uid, variant):
        rows.append(
            {
                "event_id": len(rows),
                "ts": base + timedelta(minutes=i),
                "user_id": uid,
                "event_type": variant,
                "value": 1.0,
                "props": '{"k": "exp_a"}',
            }
        )

    # 9 rows -> 3 chunks of 3 under the (ts, event_id) order
    for i in range(3):  # chunk 0: clicks, uids 1-3
        add(i, 1 + i, "click")
    for i in range(3):  # chunk 1: the ONLY signup events, uids 1-3
        add(3 + i, 1 + i, "signup")
    add(6, 1, "click")  # chunk 2: one repeat uid...
    add(7, 2, "click")
    add(8, 9999, "click")  # ...and the planted fresh uid

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)

    got = {
        (r["batch_id"], r["variant"]): r["unique_users"]
        for r in state_reader.state_time_travel_uniques(spark, path).collect()
    }
    assert got == {
        (0, "click"): 3,          # signup absent entirely at batch 0
        (1, "click"): 3,
        (1, "signup"): 3,
        (2, "click"): 4,          # 9999 lands only in the final snapshot
        (2, "signup"): 3,
    }


@pytest.mark.skipif(
    not stateful.tws_available(),
    reason="transformWithStateInPandas unavailable: no protobuf runtime",
)
def test_tws_state_reader_matches_batch_distinct(spark):
    """Both RocksDB state variables — the `seen` MapState entry count
    and the `n` ValueState counter — equal the batch distinct count, via
    a JVM-only read (no shim injected for the scan)."""
    want = _batch_distinct(spark, EVENTS)
    rows = state_reader.state_reader_tws_uniques(spark, EVENTS).collect()
    assert {r["variant"]: r["unique_users"] for r in rows} == want
    assert {r["variant"]: r["counter_users"] for r in rows} == want
    assert rows


def test_changelog_is_delta_not_snapshot(spark, tmp_path):
    """Planted: 'click' has events in chunks 0 and 2 but NOT 1, and
    'signup' only in chunk 1 — the change feed must show exactly the
    batches whose input TOUCHED each variant (click: 0 and 2, with the
    batch-1 hole despite live state; signup: 1 only), with post-image
    set sizes. A reader that scanned snapshots instead of deltas would
    emit a click row at batch 1."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []

    def add(i, uid, variant):
        rows.append(
            {
                "event_id": len(rows),
                "ts": base + timedelta(minutes=i),
                "user_id": uid,
                "event_type": variant,
                "value": 1.0,
                "props": '{"k": "exp_a"}',
            }
        )

    for i in range(3):  # chunk 0: clicks, uids 1-3
        add(i, 1 + i, "click")
    for i in range(3):  # chunk 1: signups only — the click hole
        add(3 + i, 1 + i, "signup")
    add(6, 1, "click")  # chunk 2: one repeat + one fresh click uid
    add(7, 9999, "click")
    add(8, 9999, "click")

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)

    got = {
        (r["batch_id"], r["variant"]): (r["change_type"], r["unique_users"])
        for r in state_reader.state_changelog_uniques(spark, path).collect()
    }
    assert got == {
        (0, "click"): ("update", 3),
        (1, "signup"): ("update", 3),
        (2, "click"): ("update", 4),
    }


def test_sessions_ttl_state_store_drains(spark, tmp_path):
    """The bounded-state claim measured DIRECTLY in the store, not
    inferred from output: after the heartbeat replay's eviction batch,
    the sessions-TTL checkpoint holds NO real-user state (only the
    synthetic heartbeat key may stay open — nothing ever advances the
    watermark past its own session), while a mid-replay snapshot holds
    open real sessions — so the drained end-state is EVICTION at work,
    not a store that was never populated."""
    from redis_dataflow_realtime_analytics_spark.streaming import (
        pipeline,
        stateful,
    )

    ckpt = str(tmp_path / "ckpt")
    with pipeline._state_partitions(spark):
        q = (
            stateful.sessions_updates(spark, EVENTS)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    md = spark.read.format("state-metadata").load(ckpt).collect()
    last = max(r.maxBatchId for r in md)
    assert last >= 2, "heartbeat replay should schedule >=3 micro-batches"

    final = spark.read.format("statestore").load(ckpt)
    assert final.filter(F.col("key.user_id") >= 0).count() == 0
    # mid-replay (before the heartbeats arrive) real sessions ARE open
    mid = (
        spark.read.format("statestore")
        .option("batchId", 0)
        .load(ckpt)
        .filter(F.col("key.user_id") >= 0)
        .count()
    )
    assert mid > 0


def test_operator_catalog_layout(spark):
    """state-metadata rows are deterministic: one store per checkpoint,
    8 state partitions (``_state_partitions``), batches 0..N_CHUNKS-1
    all committed."""
    rows = state_reader.state_operator_catalog(spark, EVENTS).collect()
    legacy = [r for r in rows if r["checkpoint_kind"] == "legacy"]
    assert len(legacy) == 1
    r = legacy[0]
    assert r["operatorName"] == "applyInPandasWithState"
    assert r["stateStoreName"] == "default"
    assert r["numPartitions"] == 8
    assert (r["minBatchId"], r["maxBatchId"]) == (0, state_reader.N_CHUNKS - 1)
    if stateful.tws_available():
        tws = [r for r in rows if r["checkpoint_kind"] == "tws"]
        assert len(tws) == 1
        assert tws[0]["numPartitions"] == 8
        assert (tws[0]["minBatchId"], tws[0]["maxBatchId"]) == (
            0,
            state_reader.N_CHUNKS - 1,
        )
