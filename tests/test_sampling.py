"""Behavioral invariants for the deterministic sampling operators."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark.operators import sampling  # noqa: E402
from redis_dataflow_realtime_analytics_spark.tables import load  # noqa: E402

from .conftest import SF_SMOKE


def test_hash_sample_deterministic_under_repartition(spark):
    """The sample is a pure key filter: identical under any partitioning."""
    a = {r.doc_id for r in sampling.hash_sample_documents(spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").repartition(13)
    b = {
        r.doc_id
        for r in docs.where(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
        ).collect()
    }
    assert a == b


def test_hash_sample_fraction_in_expected_band(spark):
    total = load(spark, SF_SMOKE, "documents").count()
    kept = sampling.hash_sample_documents(spark, SF_SMOKE).count()
    # threshold '1a' keeps 26/256 ≈ 10.2%; allow a generous binomial band
    assert 0.02 <= kept / total <= 0.25


def test_chunks_reassemble_to_original_text(spark):
    docs = {r.doc_id: r.text for r in load(spark, SF_SMOKE, "documents").collect()}
    chunks = sampling.chunk_documents(spark, SF_SMOKE).collect()
    rebuilt: dict[int, list] = {}
    for r in chunks:
        rebuilt.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    assert set(rebuilt) == set(docs)
    for doc_id, parts in rebuilt.items():
        joined = "".join(t for _, t in sorted(parts))
        assert joined == docs[doc_id]
        widths = [len(t) for _, t in sorted(parts)]
        assert all(w == 400 for w in widths[:-1])  # only the tail may be short


def test_train_corpus_subset_of_filtered_dedup(spark):
    out = sampling.train_corpus_pipeline(spark, SF_SMOKE)
    rows = out.collect()
    assert all(r.lang == "en" and r.n_chars >= 150 for r in rows)
    # dedup: no two surviving docs share content
    docs = load(spark, SF_SMOKE, "documents")
    kept_ids = [r.doc_id for r in rows]
    texts = [
        r.text for r in docs.where(F.col("doc_id").isin(kept_ids)).collect()
    ]
    assert len(texts) == len(set(texts))


def test_upsample_multiplies_rows_by_weight(spark):
    """Every doc appears exactly `weight` times with copy_ids 1..weight."""
    docs = load(spark, SF_SMOKE, "documents").collect()
    want = {
        r.doc_id: 1 if r.lang == "en" else 2 if r.lang in ("de", "fr", "es") else 3
        for r in docs
    }
    rows = sampling.upsample_by_language(spark, SF_SMOKE).collect()
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r.copy_id)
        assert r.weight == want[r.doc_id]
    assert set(got) == set(want)
    for doc_id, copies in got.items():
        assert sorted(copies) == list(range(1, want[doc_id] + 1))


def test_pack_capacity_respected_at_entry(spark):
    """Bin-by-cumsum invariant: the running token total *before* each doc
    stays inside its pack's capacity window, packs are contiguous and
    non-decreasing along doc_id within every (lang, shard) stream."""
    rows = sampling.pack_documents(spark, SF_SMOKE, max_tokens=512).collect()
    streams: dict[tuple, list] = {}
    for r in rows:
        streams.setdefault((r.lang, r.shard), []).append(r)
    for stream in streams.values():
        stream.sort(key=lambda r: r.doc_id)
        before = 0
        prev_pack = 0
        for r in stream:
            assert r.pack_id == before // 512
            assert r.pack_id >= prev_pack
            prev_pack = r.pack_id
            before += r.n_tokens


def test_pack_deterministic_under_repartition(spark):
    a = sorted(map(tuple, sampling.pack_documents(spark, SF_SMOKE).collect()))
    b_df = sampling.pack_documents(spark, SF_SMOKE)
    b = sorted(map(tuple, b_df.repartition(7).collect()))
    assert a == b


def test_weighted_sample_deterministic_and_biased_toward_weight(spark):
    """ES sampling is reproducible (same md5 draw every run) and
    weight-proportional: the length-weighted sample's mean n_chars must
    exceed the unweighted population mean."""
    a = sampling.weighted_sample_documents(spark, SF_SMOKE, k=30).collect()
    b = sampling.weighted_sample_documents(spark, SF_SMOKE, k=30).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 30
    pop_mean = (
        load(spark, SF_SMOKE, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in a) / len(a)
    assert sample_mean > pop_mean


def test_weighted_sample_membership_matches_brute_force(spark):
    """The top-k by ES key computed via TakeOrderedAndProject must equal a
    driver-side brute-force recomputation of the same formula."""
    import math

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    import hashlib

    def es_key(doc_id, n_chars):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:13]
        u = (int(h, 16) + 1.0) / 16**13
        return math.log(u) / max(n_chars, 1)

    want = {
        d.doc_id
        for d in sorted(docs, key=lambda d: (-es_key(d.doc_id, d.n_chars), d.doc_id))[:30]
    }
    got = {
        r.doc_id for r in sampling.weighted_sample_documents(spark, SF_SMOKE, k=30).collect()
    }
    assert got == want


def test_temperature_mix_invariants(spark):
    """Shares are distributions; alpha < 1 pulls toward uniform, so the
    largest language is downweighted (factor < 1) and the smallest is
    upweighted (factor > 1). alpha == 1 is the identity mix."""
    rows = sampling.temperature_mix(spark, SF_SMOKE, alpha=0.3).collect()
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.smoothed_share for r in rows) - 1.0) < 1e-9
    biggest = max(rows, key=lambda r: r.natural_share)
    smallest = min(rows, key=lambda r: r.natural_share)
    assert biggest.upsample_factor < 1.0 < smallest.upsample_factor
    ident = sampling.temperature_mix(spark, SF_SMOKE, alpha=1.0).collect()
    for r in ident:
        assert abs(r.upsample_factor - 1.0) < 1e-9


def test_weighted_per_language_budget_and_determinism(spark):
    """Exactly k docs per language (or the whole stratum if smaller),
    reproducible across runs."""
    k = 10
    a = sampling.weighted_sample_per_language(spark, SF_SMOKE, k=k).collect()
    b = sampling.weighted_sample_per_language(spark, SF_SMOKE, k=k).collect()
    assert {(r.lang, r.doc_id) for r in a} == {(r.lang, r.doc_id) for r in b}
    sizes = {}
    for r in a:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    strata = {
        r.lang: r.n
        for r in load(spark, SF_SMOKE, "documents").groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    for lang, n in sizes.items():
        assert n == min(k, strata[lang])


def test_length_clip_bounds_are_data_values_and_band_holds(spark):
    """Every kept doc sits inside its language's [p5, p95] band; the
    bounds themselves are actual n_chars values from that language; and
    the filter keeps roughly 90% of each language."""
    docs = load(spark, SF_SMOKE, "documents")
    kept = sampling.length_clip_filter(spark, SF_SMOKE).collect()
    by_lang_vals = {
        r.lang: set(r.vals)
        for r in docs.groupBy("lang").agg(
            F.collect_set("n_chars").alias("vals")
        ).collect()
    }
    for r in kept:
        assert r.p_lo <= r.n_chars <= r.p_hi
        assert r.n_chars in by_lang_vals[r.lang]
        assert r.p_lo in by_lang_vals[r.lang] and r.p_hi in by_lang_vals[r.lang]
    total = docs.count()
    assert 0.8 * total <= len(kept) <= total


def test_split_is_stable_and_roughly_80_10_10(spark):
    """Split assignment is a pure function of doc_id (identical across
    runs and repartitionings) and the fractions sit near 80/10/10."""
    a = {r.doc_id: r.split for r in sampling.train_val_test_split(spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents")
    b = {
        r.doc_id: r.split
        for r in sampling.train_val_test_split(spark, SF_SMOKE)
        .repartition(7)
        .collect()
    }
    assert a == b
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in ("train", "val", "test")}
    assert 0.7 < frac["train"] < 0.9
    assert 0.03 < frac["val"] < 0.2
    assert 0.03 < frac["test"] < 0.2
    assert abs(sum(frac.values()) - 1.0) < 1e-9


def test_overlap_chunks_cover_text_with_stride_overlap(spark):
    """Consecutive chunks overlap by width - stride chars; chunk 0 starts
    at char 1; every character of the document appears in some chunk."""
    width, stride = 400, 300
    docs = {r.doc_id: r.text for r in load(spark, SF_SMOKE, "documents").collect()}
    out = sampling.chunk_documents_overlap(spark, SF_SMOKE, width, stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        rebuilt = set()
        for r in chunks:
            start = r.chunk_idx * stride
            assert r.chunk_text == text[start : start + width]
            rebuilt.update(range(start, start + len(r.chunk_text)))
        assert rebuilt == set(range(len(text)))
        if len(chunks) > 1:
            # genuine overlap between consecutive chunks
            assert chunks[0].chunk_len == width


def test_pack_boundary_hard_capacity(spark):
    """Boundary packer: no multi-doc pack exceeds the capacity, oversize
    docs sit alone in their pack, and pack ids are dense within each
    (lang, shard) stream."""
    from redis_dataflow_realtime_analytics_spark.operators import sampling

    cap = 512
    rows = sampling.pack_documents_boundary(spark, SF_SMOKE, max_tokens=cap).collect()
    assert rows
    packs = {}
    for r in rows:
        packs.setdefault((r.lang, r.shard, r.pack_id), []).append(r)
    for members in packs.values():
        total = sum(m.n_tokens for m in members)
        if len(members) > 1:
            assert total <= cap
        if any(m.oversize for m in members):
            assert len(members) == 1
    for (lang, shard) in {(r.lang, r.shard) for r in rows}:
        ids = sorted(p[2] for p in packs if p[0] == lang and p[1] == shard)
        assert ids == list(range(len(ids)))


def test_pack_boundary_deterministic_under_repartition(spark):
    from redis_dataflow_realtime_analytics_spark.operators import sampling

    a = {r.doc_id: r.pack_id for r in sampling.pack_documents_boundary(spark, SF_SMOKE).collect()}
    df2 = sampling.pack_documents_boundary(spark, SF_SMOKE)
    b = {r.doc_id: r.pack_id for r in df2.repartition(7).collect()}
    assert a == b


def test_version_history_scd2_invariants(spark):
    """Exactly one current row per doc; every non-current row's
    valid_to_version is the doc's successor version."""
    from redis_dataflow_realtime_analytics_spark.operators import sampling

    rows = sampling.corpus_version_history(spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, vs in by_doc.items():
        vs.sort(key=lambda r: r.version)
        assert sum(1 for r in vs if r.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to_version is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_version == b.version


def test_pack_efficiency_consistent_with_packers(spark):
    """The report's pack counts must equal what the two packers actually
    produce, and the boundary fill rate is in (0, 1] when no oversize
    docs exist in the language."""
    from redis_dataflow_realtime_analytics_spark.operators import sampling

    rep = {r.lang: r for r in sampling.pack_efficiency_report(spark, SF_SMOKE).collect()}
    b = sampling.pack_documents_boundary(spark, SF_SMOKE).collect()
    packs = {}
    oversize = {}
    for r in b:
        packs.setdefault(r.lang, set()).add((r.shard, r.pack_id))
        oversize[r.lang] = oversize.get(r.lang, 0) + int(r.oversize)
    for lang, r in rep.items():
        assert r.n_packs_boundary == len(packs[lang])
        assert r.n_oversize == oversize[lang]
        if r.n_oversize == 0:
            assert 0 < r.fill_boundary <= 1.0


def test_shard_assignment_matches_oracle(spark):
    from .oracle import compare

    compare(
        sampling.shard_assignment(spark, SF_SMOKE),
        sampling.oracle_shard_assignment(),
        SF_SMOKE,
    )


def test_shard_assignment_exact_global_scan(spark):
    """tokens_before must be the exact global running sum in doc_id
    order, independent of the bucket decomposition width, and stable
    under repartitioning."""
    rows = sorted(
        sampling.shard_assignment(spark, SF_SMOKE, bucket_docs=17).collect(),
        key=lambda r: r.doc_id,
    )
    run = 0
    for r in rows:
        assert r.tokens_before == run
        assert r.shard_id == run // 4096
        run += r.n_tokens
    again = {
        r.doc_id: r.tokens_before
        for r in sampling.shard_assignment(spark, SF_SMOKE, bucket_docs=17)
        .repartition(11)
        .collect()
    }
    assert again == {r.doc_id: r.tokens_before for r in rows}
