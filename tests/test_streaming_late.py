"""Late-data observability: stream_late_arrivals_audit.

The audit makes SURVEY §2.5's semantic delta measurable — the reference's
Redis INCRBY/PFADD legs accept arbitrarily late events forever, a Spark
watermark does not. These tests pin (1) the audit's drop rule against a
hand-computed planted fixture, and (2) PARITY with the real engine: an
update-mode watermarked windowed count over the same out-of-order replay
loses exactly the rows the audit reports, per minute.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.sources.events import read_events_stream
from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_planted_events(path: str) -> dict:
    """13 events: 12 on-time (event_id % 13 == 0 and % 25 != 0 -> zero
    arrival jitter) hourly from T0+1h, plus ONE buffered-client event
    (event_id=150: 150 % 25 == 0 -> 150 % 40 = 30 DAYS delay) with event
    time T0+1h30m. Its arrival sorts after every on-time event, so with
    n_chunks=3 (step = ceil(13/3) = 5) it lands in the third chunk,
    where the ENFORCED watermark — the engine applies the watermark from
    two batches back, i.e. max(chunk 0) = T0+5h, minus 10 min — is far
    past its window end: exactly one late row."""
    ids = [13 * i for i in range(1, 13)] + [150]
    ts = [T0 + dt.timedelta(hours=i) for i in range(1, 13)] + [
        T0 + dt.timedelta(hours=1, minutes=30)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([i % 4 for i in range(13)], pa.int64()),
            "event_type": pa.array(["click"] * 13),
            "value": pa.array([1.0] * 13),
            "props": pa.array(['{"k": "1"}'] * 13),
        }
    )
    pq.write_table(tbl, path)
    return {"late_minute": T0 + dt.timedelta(hours=1, minutes=30)}


def test_audit_matches_hand_computed_plant(spark, tmp_path):
    path = str(tmp_path / "events.parquet")
    plant = _write_planted_events(path)
    out = sp.stream_late_arrivals_audit(spark, path, n_chunks=3).collect()
    assert len(out) == 1
    row = out[0]
    assert row["minute"] == plant["late_minute"].replace(second=0, microsecond=0)
    assert row["late_events"] == 1


def test_parity_with_real_watermark_drop(spark, tmp_path):
    """The engine-parity gate: an UPDATE-mode watermarked 1-minute count
    over the same arrival-ordered replay drops exactly the rows the audit
    reports — batch_count(minute) − streamed_count(minute) ==
    audited_late(minute) for every minute."""
    path = str(tmp_path / "events.parquet")
    _write_planted_events(path)

    audit = {
        r["minute"]: r["late_events"]
        for r in sp.stream_late_arrivals_audit(spark, path, n_chunks=3).collect()
    }

    replay = sp._late_arrival_replay_dir(path, n_chunks=3)
    stream = (
        read_events_stream(spark, replay, max_files_per_trigger=1)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("minute"), "n")
    )
    import uuid

    name = f"late_parity_{uuid.uuid4().hex}"
    with sp._state_partitions(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the engine's OWN counter must agree with the audit total — the
        # strongest form of the parity claim (totals only; the audit adds
        # the per-minute attribution the counter can't give)
        dropped_counter = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    assert dropped_counter == sum(audit.values())
    streamed = {
        r["minute"]: r["n"]
        for r in spark.table(name)
        .groupBy("minute")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    batch = {
        r["minute"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for minute, n in batch.items():
        dropped = n - streamed.get(minute, 0)
        assert dropped == audit.get(minute, 0), minute
    # and the audit never reports a minute the engine didn't short
    assert set(audit) <= set(batch)


def test_audit_deterministic_and_oracle_shaped(spark):
    """Two runs over the sf0.001 fixture are identical (arrival order,
    chunking, and watermark sequence are pure functions of the data)."""
    path = "/root/testdata/sf0.001/events.parquet"
    a = sorted(map(tuple, sp.stream_late_arrivals_audit(spark, path).collect()))
    b = sorted(map(tuple, sp.stream_late_arrivals_audit(spark, path).collect()))
    assert a == b
    assert len(a) > 0  # heavy-tailed delay produces real drops at sf0.001
    assert all(n >= 1 for _, n in a)


@pytest.mark.parametrize("n_chunks", [2, 5])
def test_audit_chunk_count_changes_watermark_schedule(spark, tmp_path, n_chunks):
    """More chunks = finer watermark advancement = weakly MORE late rows;
    the audit must run clean (and stay internally consistent) at other
    chunkings even though the registry pins n_chunks=3."""
    path = str(tmp_path / "events.parquet")
    _write_planted_events(path)
    out = sp.stream_late_arrivals_audit(spark, path, n_chunks=n_chunks).collect()
    assert sum(r["late_events"] for r in out) >= (1 if n_chunks >= 3 else 0)


def _simulate_lag2_audit(rows, n_chunks=3, delay_minutes=10):
    """Pure-Python reference of the measured engine rule: arrival =
    ts + jitter(event_id); chunk by arrival rank; batch N filters
    against ms-truncated max event time over chunks <= N-2, minus the
    delay; drop iff window_end <= wm. rows = [(event_id, ts_us)]."""
    from redis_dataflow_realtime_analytics_spark.streaming.pipeline import (
        JITTER_MINUTES_MOD,
        LATE_DAYS_MOD,
        LATE_EVERY,
    )

    def jitter_us(eid):
        if eid % LATE_EVERY == 0:
            return (eid % LATE_DAYS_MOD) * 86_400_000_000
        return (eid % JITTER_MINUTES_MOD) * 60_000_000

    order = sorted(rows, key=lambda r: (r[1] + jitter_us(r[0]), r[0]))
    step = max(1, -(-len(order) // n_chunks))
    chunks = [order[i : i + step] for i in range(0, len(order), step)]
    delay_us = delay_minutes * 60_000_000
    late = {}
    maxes = []
    for i, ch in enumerate(chunks):
        if i >= 2:
            wm = (max(maxes[: i - 1]) // 1000) * 1000 - delay_us
            for _, tus in ch:
                minute = tus - (tus % 60_000_000)
                if minute + 60_000_000 <= wm:
                    late[minute] = late.get(minute, 0) + 1
        maxes.append(max(t for _, t in ch))
    return late


def test_audit_matches_lag2_simulator_on_random_streams(spark, tmp_path):
    """The audit over randomized event streams equals the pure-Python
    simulator of the measured engine rule — shapes (ties at chunk
    boundaries, multi-day gaps, repeated minutes) the fixture never
    produces. Deterministic seed; several stream shapes."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(7)
    base_us = 1_700_000_000_000_000
    for case in range(4):
        n = rng.randint(30, 120)
        rows = []
        for j in range(n):
            eid = rng.randint(0, 10_000)
            # seconds-resolution event times spread over up to 45 days
            tus = base_us + rng.randint(0, 45 * 86_400) * 1_000_000
            rows.append((eid * 1000 + j, tus))  # unique event_ids
        path = str(tmp_path / f"ev_{case}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([0] * n, pa.int64()),
                    "event_type": pa.array(["click"] * n),
                    "value": pa.array([1.0] * n),
                    "props": pa.array(['{"k": "1"}'] * n),
                }
            ),
            path,
        )
        from pyspark.sql import functions as F2

        got = {
            int(r["m"]): r["late_events"]
            for r in sp.stream_late_arrivals_audit(spark, path, n_chunks=3)
            .select(F2.unix_micros("minute").alias("m"), "late_events")
            .collect()
        }
        assert got == _simulate_lag2_audit(rows), f"case {case}"
