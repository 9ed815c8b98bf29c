"""Adversarial-fixture regression gate (r7): rebuild the tie-dense
degenerate-row fixture (`scripts/adversarial_fixture.py`) and re-run the
REPRESENTATIVE once-failing key of each of the five divergence classes the
r7 sweep found, engine vs oracle. Keeps zero-norm embeddings, empty/short
documents, phantom chunks, and source-duplicated event_ids permanently
covered without sweeping all 246 keys per test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark import registry  # noqa: E402

from .oracle import compare  # noqa: E402

#: one representative per r7 failure class, plus the portable ANN twin
#: (query-side zero-vector path) and a quality downstream consumer
KEYS = [
    "ann_topk_bruteforce",        # class 1: zero-norm cosine (engine+oracle guard)
    "ann_lsh_portable_topk",      # class 1 on the portable JVM-side planes
    "ann_ivfpq_topk",             # class 1 deepest pipeline (ADC + exact rerank)
    "text_quality_score",         # class 2: empty-text punct ratio
    "corpus_quality_gate",        # class 2 downstream consumer
    "text_fingerprints",          # class 3: short-doc sequence trap + kept rows
    "chunk_documents",            # class 4: phantom chunks on empty docs
    "stream_deduped_visits",      # class 5: source-duplicated event_ids
    # session-gap boundary (the hypothesis find): user 990990's events sit
    # EXACTLY 30:00.000000 apart — one session under the strict-> rule,
    # in the batch op, the stateful TTL twin, and the oracle alike
    "user_sessions",
    "stream_sessions_ttl",
    # rank/top-k windows on the planted VALUE TIES (rounded monetary
    # columns): green on first sweep — total-order tie-breaks verified
    "top_orders_by_value",
    "priciest_parts_per_brand",
    # r8 sweep extension (VERDICT r7 item 5): ALL 13 multimodal and ALL
    # 32 stream_* oracled keys were swept against this fixture — every
    # one green (the r7 guards held; the only new find was the 0-frame
    # Y4M crash, which the fixture can't produce — pinned by
    # test_multimodal_degenerate.py instead). Representatives kept in
    # the permanent gate: the deepest decode pipelines over the planted
    # empty/short/duplicate docs, and the stateful/audit streaming keys
    # over the planted duplicate ids + exact-minute event times.
    "multimodal_image_ahash",
    "multimodal_decode_features",
    "multimodal_video_scene_cuts",
    "multimodal_decode_audio",
    "stream_visits_per_minute",
    "stream_uniques_per_ev_minute",
    "stream_duplicate_delivery_audit",
    "stream_stateful_uniques_tws",
]


@pytest.fixture(scope="module")
def adv_sf(tmp_path_factory):
    from scripts.adversarial_fixture import build

    return build(dst=str(tmp_path_factory.mktemp("adv") / "sf"))


@pytest.mark.parametrize("key", KEYS)
def test_adversarial_key_matches_oracle(spark, adv_sf, key):
    compare(registry.QUERIES[key](spark, adv_sf), registry.ORACLE[key], adv_sf)
