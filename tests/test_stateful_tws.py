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


def test_tws_bootstrap_matches_scratch(spark):
    """Backfill-then-stream == replay-from-scratch on the real fixture."""
    boot = sorted(
        map(tuple, stateful.stream_uniques_tws_bootstrapped(spark, EVENTS).collect())
    )
    scratch = sorted(
        map(
            tuple,
            stateful.stream_exact_uniques_per_variant_tws(spark, EVENTS).collect(),
        )
    )
    assert boot == scratch and boot


def test_tws_bootstrap_seed_is_load_bearing(spark, tmp_path):
    """Planted fixture where the history half's uids NEVER reappear in the
    live half (and one variant has no live events at all): correct
    answers require handleInitialState to have seeded the store AND the
    read to union the seed counts — dropping either undercounts."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows, eid = [], 0

    def add(minutes, uid, variant):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": base + timedelta(minutes=minutes),
                "user_id": uid,
                "event_type": variant,
                "value": 1.0,
                "props": '{"k": "exp_a"}',
            }
        )
        eid += 1

    # history half (first 13 rows in ts order): clicks from uids
    # 1000-1004, views from uids 1000-1002 (view has NO live events)
    for i in range(10):
        add(i, 1000 + i % 5, "click")
    for i in range(3):
        add(10 + i, 1000 + i, "view")
    # live half (13 rows, one hour later): clicks from uids 2000-2004 only
    for i in range(13):
        add(60 + i, 2000 + i % 5, "click")

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
        r["variant"]: r["unique_users"]
        for r in stateful.stream_uniques_tws_bootstrapped(
            spark, path, history_fraction=0.5
        ).collect()
    }
    # click: 5 history-only + 5 live-only uids; view: 3 seed-only
    assert got == {"click": 10, "view": 3}


def test_tws_bootstrap_multichunk_seed_accumulates(spark, tmp_path):
    """sf1-sweep regression: a seed larger than one Arrow batch invokes
    handleInitialState MULTIPLE times per key (one call per chunk); the
    running count must accumulate across calls, not be assigned the last
    chunk's size (the 14960-vs-15000 undercount). 25k seed uids force
    ≥3 chunks at the default 10k Arrow batch size."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    n_seed, n_live_new = 25_000, 50
    rows = []
    for i in range(n_seed):  # history half: 25k distinct uids
        rows.append(
            {
                "event_id": i,
                "ts": base + timedelta(seconds=i % 600),
                "user_id": i,
                "event_type": "click",
                "value": 1.0,
                "props": '{"k": "exp_a"}',
            }
        )
    for i in range(n_seed):  # live half: 50 new uids, heavily repeated
        rows.append(
            {
                "event_id": n_seed + i,
                "ts": base + timedelta(hours=2, seconds=i % 600),
                "user_id": 100_000 + i % n_live_new,
                "event_type": "click",
                "value": 1.0,
                "props": '{"k": "exp_a"}',
            }
        )
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
        r["variant"]: r["unique_users"]
        for r in stateful.stream_uniques_tws_bootstrapped(
            spark, path, history_fraction=0.5
        ).collect()
    }
    assert got == {"click": n_seed + n_live_new}


def test_fresh_uids_strategy_by_size():
    """The membership step picks its probe strategy by size: empty state
    pays ZERO state-server calls, state <= batch pays ONE keys() scan,
    state > batch keeps the per-uid point probes (the at-scale shape)."""

    class _FakeMap:
        def __init__(self, stored):
            self._s = set(stored)
            self.contains_calls = 0
            self.keys_calls = 0

        def keys(self):
            self.keys_calls += 1
            return iter([(u,) for u in sorted(self._s)])

        def containsKey(self, k):
            self.contains_calls += 1
            return k[0] in self._s

    m = _FakeMap([])
    assert stateful._fresh_uids({"b", "a"}, 0, m) == ["a", "b"]
    assert m.contains_calls == 0 and m.keys_calls == 0

    m = _FakeMap(["a"])
    assert stateful._fresh_uids({"a", "b", "c"}, 1, m) == ["b", "c"]
    assert m.contains_calls == 0 and m.keys_calls == 1

    m = _FakeMap(["a", "b", "c", "d"])
    assert stateful._fresh_uids({"e", "a"}, 4, m) == ["e"]
    assert m.keys_calls == 0 and m.contains_calls == 2
