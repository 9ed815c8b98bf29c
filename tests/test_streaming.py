"""Streaming semantics: stream/batch parity, multi-batch incremental merge,
late/shuffled-data invariance, and the mergeable-sketch store.

The events fixture is re-written as 4 parquet files so availableNow +
maxFilesPerTrigger=1 replays it as 4 micro-batches — exercising real
incremental state, not a single-batch degenerate run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import metrics
from redis_dataflow_realtime_analytics_spark.sources import normalize_events, read_events
from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def multi_file_events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    path = str(d / "events")
    read_events(spark, SF_SMOKE).repartition(4).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def shuffled_events(spark, tmp_path_factory):
    """Same events in deliberately scrambled order (late-data simulation)."""
    d = tmp_path_factory.mktemp("events_shuffled")
    path = str(d / "events")
    (
        read_events(spark, SF_SMOKE)
        .orderBy(F.md5(F.col("event_id").cast("string")))  # deterministic scramble
        .repartition(4)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _batch_visits(spark):
    ev = normalize_events(read_events(spark, SF_SMOKE))
    return {r.minute: r.visits for r in metrics.visits_per_minute(ev).collect()}


def test_stream_batch_parity_visits(spark, multi_file_events):
    got = {
        r.minute: r.visits
        for r in sp.stream_visits_per_minute(spark, multi_file_events).collect()
    }
    assert got == _batch_visits(spark)


def test_late_data_lands_in_event_time_bucket(spark, shuffled_events):
    """Reference semantics: a late event still lands in its event-time
    minute (keys encode event time; Redis ops are commutative). Stream
    result must be order-invariant."""
    got = {
        r.minute: r.visits
        for r in sp.stream_visits_per_minute(spark, shuffled_events).collect()
    }
    assert got == _batch_visits(spark)


def test_sketch_store_merges_across_batches(spark, multi_file_events, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("store"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    sp.run_sketch_ingest(spark, multi_file_events, store, ckpt)

    # multiple batches actually happened
    n_batches = (
        spark.read.parquet(f"{store}/visits").select("batch_id").distinct().count()
    )
    assert n_batches >= 2, "expected a multi-batch replay"

    # visits partials merge to the exact batch answer
    got = {r.minute: r.visits for r in sp.read_visits(spark, store).collect()}
    assert got == _batch_visits(spark)

    # sketch merges estimate exact distincts within HLL error
    ev = normalize_events(read_events(spark, SF_SMOKE))
    exact = {r.variant: r.unique_users for r in metrics.uniques_per_variant(ev).collect()}
    est = {r.variant: r.unique_users for r in sp.read_uniques_per_variant(spark, store).collect()}
    assert set(est) == set(exact)
    for v, e in exact.items():
        assert abs(est[v] - e) <= max(3, 0.05 * e), (v, est[v], e)

    # exact twin family matches exactly
    exact_store = {
        r.variant: r.unique_users
        for r in sp.read_uniques_per_variant_exact(spark, store).collect()
    }
    assert exact_store == exact


def test_sketch_ingest_is_idempotent_on_replay(spark, multi_file_events, tmp_path_factory):
    """Re-running the same replay (fresh checkpoint → batches re-fire with
    the same ids) must overwrite, not double-count — the reference's INCRBY
    over-counts in this situation (SURVEY §4 delta 1)."""
    store = str(tmp_path_factory.mktemp("store2"))
    sp.run_sketch_ingest(spark, multi_file_events, store, str(tmp_path_factory.mktemp("c1")))
    first = {r.minute: r.visits for r in sp.read_visits(spark, store).collect()}
    sp.run_sketch_ingest(spark, multi_file_events, store, str(tmp_path_factory.mktemp("c2")))
    second = {r.minute: r.visits for r in sp.read_visits(spark, store).collect()}
    assert first == second == _batch_visits(spark)


def test_sketch_store_batch_replay_is_idempotent(spark, tmp_path):
    """The exactly-once claim (SURVEY §4 delta 1): re-delivering a
    micro-batch must NOT change any read-side result — unlike the
    reference's INCRBY legs, which over-count on Pub/Sub redelivery.
    A replayed batch_id overwrites its own partition, so writing the same
    batch twice (and one batch a third time) leaves every family's merge
    unchanged."""
    from redis_dataflow_realtime_analytics_spark.sources import (
        normalize_events,
        read_events,
    )
    from redis_dataflow_realtime_analytics_spark.streaming.pipeline import (
        SketchStoreWriter,
        read_uniques_per_variant_exact,
        read_visits,
    )

    ev = normalize_events(read_events(spark, SF_SMOKE))
    b0 = ev.where("user_id % 2 = 0")
    b1 = ev.where("user_id % 2 = 1")

    once = str(tmp_path / "once")
    w = SketchStoreWriter(once)
    w(b0, 0)
    w(b1, 1)

    replayed = str(tmp_path / "replayed")
    w2 = SketchStoreWriter(replayed)
    w2(b0, 0)
    w2(b0, 0)  # redelivery of batch 0
    w2(b1, 1)
    w2(b1, 1)  # redelivery of batch 1
    w2(b0, 0)  # and batch 0 once more

    for reader in (read_visits, read_uniques_per_variant_exact):
        a = sorted(map(tuple, reader(spark, once).collect()))
        b = sorted(map(tuple, reader(spark, replayed).collect()))
        assert a == b, f"{reader.__name__} changed under replay"


def test_stream_static_enrichment_matches_batch(spark, multi_file_events):
    """Stream-static broadcast left join must equal the batch twin on the
    same data (the join is stateless — every micro-batch is enriched
    independently), and must keep events with no matching customer."""
    from redis_dataflow_realtime_analytics_spark.operators.timeseries import (
        events_enriched_with_customer,
    )
    from redis_dataflow_realtime_analytics_spark.tables import load

    customer = load(spark, SF_SMOKE, "customer")
    got = {
        tuple(r)
        for r in sp.stream_enriched_events(spark, multi_file_events, customer).collect()
    }
    want = {
        tuple(r)
        for r in events_enriched_with_customer(
            normalize_events(read_events(spark, SF_SMOKE)), customer
        ).collect()
    }
    assert got == want
    # enrichment never drops events
    assert len(got) == read_events(spark, SF_SMOKE).count()


def test_stream_left_outer_join_matches_batch_twin(spark):
    """LEFT OUTER interval join parity: the streaming result (heartbeat-
    flushed replay) must equal the batch LEFT JOIN row-for-row — including
    one NULL row per never-converting click, the part inner joins skip.
    The single-row watermark-stall regression this guards: a heartbeat
    filter pushed below the click-side watermark node withholds exactly
    the LAST real click's NULL row."""
    from redis_dataflow_realtime_analytics_spark import registry

    from .oracle import compare

    out = sp.stream_click_error_left_join(spark, f"{SF_SMOKE}/events.parquet")
    compare(out, registry.ORACLE["stream_click_error_left_join"], SF_SMOKE)
    # no heartbeat rows leak, and every unmatched click carries full NULLs
    rows = out.collect()
    assert all(r.user_id >= 0 for r in rows)
    for r in rows:
        if r.error_id is None:
            assert r.error_ts is None and r.gap_us is None


def test_stream_decontamination_gate_matches_batch(spark):
    """The streaming gate must accept exactly the batch anti-join's clean
    corpus set: stateless per-document filtering means batching cannot
    change the verdict."""
    from redis_dataflow_realtime_analytics_spark.operators import dedup
    from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp
    import pyspark.sql.functions as F

    docs_path = f"{SF_SMOKE}/documents.parquet"
    accepted = {r.doc_id for r in sp.stream_decontamination_gate(spark, docs_path).collect()}
    contaminated = {r.doc_id for r in dedup.decontamination_hits(spark, SF_SMOKE).collect()}
    corpus = {
        r.doc_id
        for r in spark.read.parquet(docs_path)
        .where(F.col("doc_id") % dedup.DECON_MOD != 0)
        .select("doc_id")
        .collect()
    }
    assert accepted == corpus - contaminated
    assert accepted  # non-degenerate


def test_stream_image_ingest_matches_batch_histogram(spark):
    """The streaming ingest-path histogram must equal the batch one —
    the synthesis projection and the Arrow extractor are stateless, so
    micro-batching cannot change any count."""
    from redis_dataflow_realtime_analytics_spark.operators import multimodal as mm
    from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp

    stream = {
        (r.doc_id, r.channel, r.bin): r.n_pixels
        for r in sp.stream_image_ingest_features(spark, f"{SF_SMOKE}/documents.parquet").collect()
    }
    batch = {
        (r.doc_id, r.channel, r.bin): r.n_pixels
        for r in mm.image_histogram(mm.with_image_blob(spark, SF_SMOKE)).collect()
    }
    assert stream == batch and stream


def test_user_gap_profile_nulls_for_single_event_users(spark):
    """Single-event users must appear with NULL gap stats (count of gaps
    0), and n_rapid never exceeds n_gaps."""
    from redis_dataflow_realtime_analytics_spark.operators import sessions
    from redis_dataflow_realtime_analytics_spark.sources import normalize_events, read_events

    ev = normalize_events(read_events(spark, SF_SMOKE))
    rows = sessions.user_gap_profile(ev).collect()
    assert rows
    for r in rows:
        assert r.n_gaps == r.n_events - 1
        assert r.n_rapid <= max(r.n_gaps, 0)
        if r.n_gaps == 0:
            assert r.min_gap_us is None and r.avg_gap_us is None
