"""Custom stateful streaming operator: exact all-time distinct users per
variant via ``applyInPandasWithState``.

This is the exact twin of the reference's unbounded ``set_var_{variant}``
Redis sets (W4, MetricsCalculationPipeline.java:105-107): state grows with
uid cardinality, exactly like the reference's Redis memory (SURVEY §1.3
"unbounded all-time state"). The bounded-state alternative is the
mergeable-HLL store in ``streaming.pipeline`` (SURVEY §4 delta 2); keep
this operator for dimensions whose uid cardinality is genuinely bounded.

Scale notes: state is keyed by variant and hash-partitioned; each group's
uid set lives in the state store (RocksDB-backed on a real cluster).
Counts emitted per micro-batch are monotone non-decreasing, so the final
value per key is the max — which lets the availableNow replay read its
answer from an update-mode memory sink.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.events import normalize_events, read_events_stream

OUTPUT_SCHEMA = "variant string, unique_users bigint"
STATE_SCHEMA = "uids array<string>"


def stream_exact_uniques_per_variant(
    spark: SparkSession, events_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Replay ``events_path`` through the stateful operator (availableNow);
    return the final (variant, unique_users) — exact, matching the batch
    ``metrics.uniques_per_variant``."""

    # closure (not module-level) so cloudpickle ships it by value — Python
    # workers don't have this repo on their import path
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(pdf["user_id"].astype(str))
        state.update((sorted(seen),))
        yield pd.DataFrame({"variant": [key[0]], "unique_users": [len(seen)]})

    ev = normalize_events(read_events_stream(spark, events_path, max_files_per_trigger))
    updates = (
        ev.select("variant", "user_id")
        .groupBy("variant")
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
    from .pipeline import _state_partitions

    name = f"state_uniq_{uuid.uuid4().hex}"
    with _state_partitions(spark):
        q = (
            updates.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("variant")
        .agg(F.max("unique_users").alias("unique_users"))
    )


SESSION_OUT_SCHEMA = "user_id bigint, start_us bigint, end_us bigint, n_events bigint"
SESSION_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def stream_sessions_ttl(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Gap-based sessionization as a TTL-EVICTING stateful streaming
    operator — ``applyInPandasWithState`` with **EventTimeTimeout**: a
    user's open session lives in the state store and is EVICTED (and
    emitted) when the watermark passes ``last_event + gap``. This is the
    mechanism the catalog's other stateful op (NoTimeout all-time
    uniques) deliberately lacks: state here is bounded by the number of
    OPEN sessions, not by history — the production shape for unbounded
    uid cardinality.

    Intra-batch session splits emit immediately (they are already
    final); only the per-user open tail occupies state. The replay
    harness's two far-future heartbeat files advance the watermark past
    every real session and then trigger the eviction batch, so the
    replayed output is complete and DETERMINISTIC: it equals the batch
    ``sessions.user_sessions`` exactly (parity pytest) for every real
    user. Timestamps cross the Arrow boundary as ``unix_micros`` longs
    (never tz-ambiguous datetimes) and convert back Spark-side.

    Output: (user_id, session_start, session_end, n_events) with
    session_end = last event + gap (session_window semantics).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def row(s: int, l: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "start_us": s,
                "end_us": l + gap_us,
                "n_events": n,
            }

        if state.hasTimedOut:
            s, l, n = state.get
            state.remove()
            yield pd.DataFrame([row(s, l, n)])
            return
        ts = sorted(
            int(v) for pdf in pdfs for v in pdf["tus"].tolist()
        )
        if not ts:
            return
        if state.exists:
            cur_s, cur_l, cur_n = state.get
        else:
            cur_s, cur_l, cur_n = ts[0], ts[0], 0
            ts = ts  # first event counted in the loop below
        closed = []
        for t in ts:
            # STRICT > matches Spark session_window's measured boundary
            # (an event at exactly last+gap stays in the session — the
            # r7 hypothesis sweep caught the >= variant diverging from
            # the batch twin on a planted exact-gap pair)
            if t - cur_l > gap_us and cur_n > 0:
                closed.append(row(cur_s, cur_l, cur_n))
                cur_s, cur_l, cur_n = t, t, 1
            else:
                cur_l = t
                cur_n += 1
        state.update((cur_s, cur_l, cur_n))
        # evict when the watermark passes the open session's end; +1 ms
        # so an event arriving exactly AT the boundary (which belongs to
        # this session under the strict-> rule) can't race the eviction
        state.setTimeoutTimestamp((cur_l + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(closed)

    from .pipeline import _heartbeat_replay_dir

    replay_dir = _heartbeat_replay_dir(events_path)
    ev = (
        normalize_events(read_events_stream(spark, replay_dir, max_files_per_trigger))
        .withWatermark("ts", "10 minutes")
        .select("user_id", "ts", F.unix_micros("ts").alias("tus"))
    )
    updates = ev.groupBy("user_id").applyInPandasWithState(
        update,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    from .pipeline import _state_partitions

    name = f"state_sess_{uuid.uuid4().hex}"
    with _state_partitions(spark):
        q = (
            updates.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .where(F.col("user_id") >= 0)  # drop heartbeat rows
        .select(
            "user_id",
            F.timestamp_micros("start_us").alias("session_start"),
            F.timestamp_micros("end_us").alias("session_end"),
            "n_events",
        )
    )
