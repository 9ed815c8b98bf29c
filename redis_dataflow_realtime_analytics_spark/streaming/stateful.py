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
