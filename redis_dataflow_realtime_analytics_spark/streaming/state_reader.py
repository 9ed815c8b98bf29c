"""Offline state-store introspection: Spark 4's ``statestore`` /
``state-metadata`` data sources read back the engine's own checkpoints.

The reference keeps its authoritative aggregates in a live Redis
keyspace, so its operational "what does the store hold?" question is a
redis-cli one-liner — ``SCARD``/``SMEMBERS``/``PFCOUNT`` against the
keys the pipeline writes (reference
``processor/src/main/java/com/google/solutions/pipeline/MetricsCalculationPipeline.java:54-57``,
key grammar in ``redis_sink.py``). In this engine the durable truth is
the Structured Streaming state store inside the checkpoint; the readers
here are the redis-cli equivalent: audit the persisted membership sets
and counters WITHOUT re-running or disturbing the query, time-travel to
any committed micro-batch, and enumerate the operator/store layout —
the forensics surface a production on-call needs when a streaming
aggregate looks wrong.

Why this is trustworthy evidence and not a tautology: every other
streaming gate in this repo checks what the query EMITTED (its sink).
These keys check what the store PERSISTED — deserialized from RocksDB /
HDFS-provider files by a separate batch scan, a fully independent code
path from the processor that wrote it. A bug that updates the sink but
corrupts state (or vice versa) is invisible to the sink gates and red
here.

Scale: the ``statestore`` read is a plain columnar batch scan — one
task per state-store partition, predicate/column pruning apply, nothing
driver-side — so auditing a 10^9-key store is a normal distributed
scan, not a query replay. Time-travel cost is the provider's
delta-replay from the nearest snapshot (bounded by
``minDeltasForSnapshot``), again per-partition parallel. The TWS read
is JVM-only: no Python worker, no protobuf runtime needed even though
the WRITER needed both (probed: reads a ``transformWithStateInPandas``
RocksDB checkpoint on a session with no shim injected).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: replay shape shared by every key in this module (and re-derived by
#: their DuckDB oracles, so it is part of the contract): the events
#: fixture in (ts, event_id) total order — the unique tie-break that
#: makes chunk membership a pure function of the data — split into
#: N_CHUNKS files replayed one micro-batch each.
N_CHUNKS = 3

_ORDERED_REPLAY_DIRS: dict[tuple, str] = {}
_CKPT_DIRS: dict[tuple, str] = {}


def _ensure_state_coordinator(spark: SparkSession) -> None:
    """A ``statestore`` batch scan loads providers through the
    StateStoreCoordinator RPC endpoint, which a session only registers
    when its StreamingQueryManager is first touched — a FRESH session
    reading a checkpoint CACHED by an earlier process dies with
    RpcEndpointNotFoundException before any query ran (caught by the
    plain-session verify recipe). Touching ``spark.streams`` is the
    documented-surface warm-up; idempotent and free thereafter."""
    _ = spark.streams.active


def _ordered_chunked_replay_dir(events_path: str, n_chunks: int = N_CHUNKS) -> str:
    """(ts, event_id)-ordered n-chunk replay dir (one file per
    micro-batch, mtime ladder fixes arrival order). Same shape as the
    duplicate-delivery replay minus the redelivered copy: the total
    order is SQL-re-derivable, so a batch-k state snapshot has an exact
    chunk-prefix oracle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .pipeline import _ts_micros

    key = (events_path, os.stat(events_path).st_mtime_ns, n_chunks)
    if key in _ORDERED_REPLAY_DIRS:
        return _ORDERED_REPLAY_DIRS[key]
    tag = hashlib.md5(
        f"ordered:{events_path}:{key[1]}:{n_chunks}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"state_reader_replay_{tag}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.isfile(marker):
        _ORDERED_REPLAY_DIRS[key] = out
        return out

    import time as _time

    tbl = _ts_micros(pq.read_table(events_path))
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
    )
    os.makedirs(out, exist_ok=True)
    n = tbl.num_rows
    step = max(1, (n + n_chunks - 1) // n_chunks)
    paths = []
    for i in range(0, n, step):
        fp = os.path.join(out, f"chunk_{i // step:04d}.parquet")
        pq.write_table(tbl.slice(i, step), fp)
        paths.append(fp)
    base = _time.time() - 2 * len(paths)
    for i, fp in enumerate(paths):
        os.utime(fp, (base + 2 * i, base + 2 * i))
    with open(marker, "w") as fh:
        fh.write("ok\n")
    _ORDERED_REPLAY_DIRS[key] = out
    return out


def _checkpointed_run(
    spark: SparkSession, events_path: str, kind: str, n_chunks: int = N_CHUNKS
) -> str:
    """Run the ``kind`` uniques op ("legacy" = applyInPandasWithState /
    HDFS provider, "tws" = transformWithStateInPandas MapState /
    RocksDB) over the ordered replay to a content-cached checkpoint and
    return its location. The checkpoint is the ARTIFACT here — the
    readers below scan it; a ``_QUERY_DONE`` marker (written only after
    ``awaitTermination``) guards against reusing a half-built one."""
    from . import stateful

    # even on a cache hit the CALLER is about to scan state — warm the
    # coordinator here, the one chokepoint every reader passes through
    _ensure_state_coordinator(spark)
    key = (events_path, os.stat(events_path).st_mtime_ns, kind, n_chunks)
    if key in _CKPT_DIRS:
        return _CKPT_DIRS[key]
    tag = hashlib.md5(
        f"ckpt:{kind}:{events_path}:{key[1]}:{n_chunks}".encode()
    ).hexdigest()[:16]
    ckpt = os.path.join(tempfile.gettempdir(), f"state_reader_ckpt_{kind}_{tag}")
    marker = os.path.join(ckpt, "_QUERY_DONE")
    if os.path.isfile(marker):
        _CKPT_DIRS[key] = ckpt
        return ckpt
    if os.path.isdir(ckpt):  # crashed half-build: never resume into it
        shutil.rmtree(ckpt)

    replay = _ordered_chunked_replay_dir(events_path, n_chunks)
    if kind == "legacy":
        stateful.stream_exact_uniques_per_variant(
            spark, replay, checkpoint_dir=ckpt
        ).collect()
    elif kind == "tws":
        stateful.stream_exact_uniques_per_variant_tws(
            spark, replay, checkpoint_dir=ckpt
        ).collect()
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown checkpoint kind: {kind!r}")
    with open(marker, "w") as fh:
        fh.write("ok\n")
    _CKPT_DIRS[key] = ckpt
    return ckpt


def state_reader_uniques(spark: SparkSession, events_path: str) -> DataFrame:
    """Final-state audit of the legacy all-time-distinct store: scan the
    checkpoint's LAST committed state with the ``statestore`` source and
    count the uids each variant's membership set actually persisted.

    Output: (variant string, unique_users bigint) — must equal the
    batch ``count(DISTINCT user_id)`` per variant; equality proves the
    state FILES (not the update-mode sink the other gates watch) carry
    exactly the distinct sets. The reference-side analogue is
    ``SCARD set_all_users_variant:{v}`` against the live keyspace.
    """
    ckpt = _checkpointed_run(spark, events_path, "legacy")
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.variant").alias("variant"),
        F.size("value.groupState.uids").cast("bigint").alias("unique_users"),
    )


def state_time_travel_uniques(spark: SparkSession, events_path: str) -> DataFrame:
    """Per-batch state snapshots: read the SAME store as of every
    committed micro-batch (``batchId`` option) — the "what did the
    store hold after batch k" forensics question, which no sink can
    answer after the fact.

    Output: (batch_id bigint, variant string, unique_users bigint), one
    row per variant PRESENT in state at batch k. Oracle: re-derive
    chunk membership under the (ts, event_id) total order and count
    distinct uids over the chunk prefix 0..k — a variant whose first
    event falls in a later chunk is correctly ABSENT from the early
    snapshots, which is what makes the key non-vacuous: at sf0.01 the
    three snapshots differ (monotone growth), pinned by the planted
    pytest at one-uid granularity.
    """
    ckpt = _checkpointed_run(spark, events_path, "legacy")
    md = spark.read.format("state-metadata").load(ckpt).collect()
    max_batch = max(r.maxBatchId for r in md)
    if max_batch != N_CHUNKS - 1:
        # the oracle hard-codes chunk i == batch i; if the replay ever
        # schedules differently this must fail loudly, not hash-diverge
        raise RuntimeError(
            f"expected {N_CHUNKS} committed batches, checkpoint has "
            f"maxBatchId={max_batch}"
        )
    parts = []
    for k in range(N_CHUNKS):
        st = spark.read.format("statestore").option("batchId", k).load(ckpt)
        parts.append(
            st.select(
                F.lit(k).cast("bigint").alias("batch_id"),
                F.col("key.variant").alias("variant"),
                F.size("value.groupState.uids").cast("bigint").alias("unique_users"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def state_changelog_uniques(spark: SparkSession, events_path: str) -> DataFrame:
    """The store's CHANGE FEED (``readChangeFeed`` option): one row per
    state WRITE, i.e. per (micro-batch, variant) where that variant had
    input rows — the delta view, where :func:`state_time_travel_uniques`
    is the snapshot view. A variant with no events in chunk k produces
    NO row at batch k even though it has live state (the planted pytest
    pins exactly that hole), which is what distinguishes a changelog
    from a per-batch snapshot scan.

    Output: (batch_id bigint, change_type string, variant string,
    unique_users bigint) — unique_users is the POST-IMAGE set size the
    write persisted (the legacy tuple state rewrites the whole set, so
    every write is an 'update' post-image; no deletes under NoTimeout).
    Oracle: variants present in chunk k, counted over the chunk prefix
    0..k under the replay's (ts, event_id) total order.

    At scale this is the audit trail the reference's Redis AOF/keyspace
    notifications would give: WHICH aggregates moved in a window,
    without diffing full snapshots — the read streams the provider's
    per-batch delta files, O(writes), not O(store).
    """
    ckpt = _checkpointed_run(spark, events_path, "legacy")
    cf = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", 0)
        .load(ckpt)
    )
    return cf.select(
        F.col("batch_id").cast("bigint").alias("batch_id"),
        F.col("change_type").alias("change_type"),
        F.col("key.variant").alias("variant"),
        F.size("value.groupState.uids").cast("bigint").alias("unique_users"),
    )


def state_reader_tws_uniques(spark: SparkSession, events_path: str) -> DataFrame:
    """Audit the ``transformWithStateInPandas`` twin's RocksDB store by
    reading BOTH named state variables and cross-checking them: the
    ``seen`` MapState's entry count per variant (the membership set)
    and the ``n`` ValueState (the running counter the processor
    maintains alongside it).

    Output: (variant string, unique_users bigint, counter_users
    bigint) — both must equal the batch distinct count, so the oracle
    catches either variable drifting from the other (a processor bug
    where the counter and the set disagree would pass every sink gate).
    The read is JVM-only — no Python worker, no protobuf — even though
    the writer needed both; state audits stay runnable on hosts where
    TWS itself cannot (the shim-less degradation mode tws_available()
    probes for).
    """
    ckpt = _checkpointed_run(spark, events_path, "tws")
    seen = (
        spark.read.format("statestore")
        .option("stateVarName", "seen")
        .load(ckpt)
        .groupBy(F.col("key.variant").alias("variant"))
        .agg(F.count("user_map_key.uid").cast("bigint").alias("unique_users"))
    )
    n = (
        spark.read.format("statestore")
        .option("stateVarName", "n")
        .load(ckpt)
        .select(
            F.col("key.variant").alias("variant"),
            F.col("value.n").cast("bigint").alias("counter_users"),
        )
    )
    return seen.join(n, "variant", "inner")


def state_operator_catalog(spark: SparkSession, events_path: str) -> DataFrame:
    """The ``state-metadata`` layout listing for both checkpoints —
    operator name, store name, partition count, committed-batch bounds.
    The `redis-cli --scan` of this engine; exercised by the pytest
    suite (deterministic layout pinned there), not registry-oracled:
    its values describe the RUNTIME layout, not the data.
    """
    from . import stateful

    kinds = ("legacy", "tws") if stateful.tws_available() else ("legacy",)
    rows = []
    for kind in kinds:
        ckpt = _checkpointed_run(spark, events_path, kind)
        md = spark.read.format("state-metadata").load(ckpt)
        rows.append(md.withColumn("checkpoint_kind", F.lit(kind)))
    out = rows[0]
    for p in rows[1:]:
        out = out.unionByName(p)
    return out.select(
        "checkpoint_kind",
        "operatorId",
        "operatorName",
        "stateStoreName",
        "numPartitions",
        "minBatchId",
        "maxBatchId",
    )
