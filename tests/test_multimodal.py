"""Multimodal plumbing: binary column + metadata is real; decode stage is a
stub that must (a) run the Arrow/mapInPandas path with the fake decoder and
(b) raise cleanly without it."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from redis_dataflow_realtime_analytics_spark.operators import multimodal

from .conftest import SF_SMOKE


def test_blob_roundtrip(spark):
    blobs = multimodal.with_blob(spark, SF_SMOKE)
    row = blobs.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.content)
    assert row.meta.mime == "text/plain"


def test_fake_decode_runs_distributed(spark):
    blobs = multimodal.with_blob(spark, SF_SMOKE)
    feats = multimodal.decode_features(blobs, fake=True)
    rows = feats.collect()
    assert len(rows) == blobs.count()
    for r in rows[:20]:
        assert r.width == r.n_bytes % 512 + 1
        assert r.height == r.n_bytes // 512 + 1
        assert 0.0 <= r.mean_byte <= 255.0


def test_unsupported_codec_is_stubbed(spark):
    # text/plain blobs have no decodable raster: the real path must raise
    # the marked NotImplementedError, not silently fake features
    blobs = multimodal.with_blob(spark, SF_SMOKE).limit(1)
    feats = multimodal.decode_features(blobs, fake=False)
    with pytest.raises((Py4JJavaError, Exception)) as ei:
        feats.collect()
    assert "NotImplementedError" in str(ei.value) or "P6" in str(ei.value)


def test_image_blob_is_valid_p6(spark):
    blobs = multimodal.with_image_blob(spark, SF_SMOKE)
    for r in blobs.limit(10).collect():
        blob = bytes(r.content)
        w, h, img = multimodal._parse_pnm(blob)
        assert (w, h) == (r.meta.width, r.meta.height)
        assert r.meta.n_bytes == len(blob)
        assert img.shape == (h, w, 3)
        # deterministic: geometry derives from doc_id
        assert w == r.doc_id % 24 + 8 and h == (r.doc_id * 7) % 16 + 8


def test_real_p6_decode_matches_independent_decode(spark):
    import numpy as np

    blobs = multimodal.with_image_blob(spark, SF_SMOKE)
    raw = {r.doc_id: bytes(r.content) for r in blobs.collect()}
    feats = multimodal.decode_features(blobs, fake=False).collect()
    assert len(feats) == len(raw)
    for r in feats[:50]:
        w, h, img = multimodal._parse_pnm(raw[r.doc_id])
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        assert r.mean_byte == img.mean()
        assert r.channel_means == [float(x) for x in img.mean(axis=(0, 1))]


def test_real_p6_resize_is_exact_nearest_neighbor(spark):
    import numpy as np

    blobs = multimodal.with_image_blob(spark, SF_SMOKE).limit(20)
    raw = {r.doc_id: bytes(r.content) for r in blobs.collect()}
    out = multimodal.resize_images(blobs, width=16, height=8, fake=False).collect()
    assert len(out) == len(raw)
    for r in out:
        w, h, img = multimodal._parse_pnm(raw[r.doc_id])
        assert (r.width, r.height) == (w, h)
        w2, h2, resized = multimodal._parse_pnm(bytes(r.content))
        assert (w2, h2) == (16, 8)
        rows = (np.arange(8) * h) // 8
        cols = (np.arange(16) * w) // 16
        assert (resized == img[rows][:, cols]).all()


def test_gray_blob_is_valid_p5_and_decodes(spark):
    blobs = multimodal.with_gray_blob(spark, SF_SMOKE)
    raw = {r.doc_id: bytes(r.content) for r in blobs.limit(20).collect()}
    for doc_id, blob in raw.items():
        assert blob.startswith(b"P5 ")
        w, h, img = multimodal._parse_pnm(blob)
        assert img.shape == (h, w, 1)
        assert w == doc_id % 24 + 8 and h == (doc_id * 7) % 16 + 8
    feats = multimodal.decode_features(blobs, fake=False).collect()
    assert len(feats) == blobs.count()
    by_id = {r.doc_id: r for r in feats}
    for doc_id, blob in raw.items():
        r = by_id[doc_id]
        _, _, img = multimodal._parse_pnm(blob)
        assert r.n_channels == 1
        assert r.mean_byte == img.mean()
        assert r.channel_means == [float(img.mean())]


def test_real_p5_resize_roundtrips_as_p5(spark):
    import numpy as np

    blobs = multimodal.with_gray_blob(spark, SF_SMOKE).limit(10)
    raw = {r.doc_id: bytes(r.content) for r in blobs.collect()}
    out = multimodal.resize_images(blobs, width=12, height=6, fake=False).collect()
    assert len(out) == len(raw)
    for r in out:
        w, h, img = multimodal._parse_pnm(raw[r.doc_id])
        w2, h2, resized = multimodal._parse_pnm(bytes(r.content))
        assert (w2, h2) == (12, 6)
        assert resized.shape == (6, 12, 1)
        rows = (np.arange(6) * h) // 6
        cols = (np.arange(12) * w) // 12
        assert (resized == img[rows][:, cols]).all()


def test_audio_blob_is_valid_wav(spark):
    """The synthesized blob must parse with Python's stdlib wave module —
    independent evidence it is a genuinely valid RIFF/WAV file, not just
    bytes our own decoder accepts."""
    import io
    import wave

    blobs = multimodal.with_audio_blob(spark, SF_SMOKE)
    for r in blobs.limit(10).collect():
        wf = wave.open(io.BytesIO(bytes(r.content)))
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getframerate() == 8000
        assert wf.getnframes() == r.meta.n_samples == r.doc_id % 480 + 160


def test_real_wav_decode_matches_independent_decode(spark):
    import numpy as np

    blobs = multimodal.with_audio_blob(spark, SF_SMOKE)
    raw = {r.doc_id: bytes(r.content) for r in blobs.collect()}
    feats = multimodal.decode_audio_features(blobs).collect()
    assert len(feats) == len(raw)
    for r in feats[:50]:
        rate, samples = multimodal._parse_wav(raw[r.doc_id])
        s = samples.astype(np.int64)
        assert (r.sample_rate, r.n_samples) == (rate, len(s))
        assert r.peak_abs == int(np.abs(s).max())
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.sum_sq == int((s * s).sum())


def test_audio_resample_is_exact_decimation(spark):
    import io
    import wave

    import numpy as np

    blobs = multimodal.with_audio_blob(spark, SF_SMOKE).limit(10)
    raw = {r.doc_id: bytes(r.content) for r in blobs.collect()}
    out = multimodal.resample_audio(blobs, factor=2).collect()
    assert len(out) == len(raw)
    for r in out:
        rate, samples = multimodal._parse_wav(raw[r.doc_id])
        rate2, kept = multimodal._parse_wav(bytes(r.content))
        assert (rate2, len(kept)) == (rate // 2, (len(samples) + 1) // 2)
        assert (kept == samples[::2]).all()
        # and the re-encoded blob is stdlib-parseable at the new rate
        wf = wave.open(io.BytesIO(bytes(r.content)))
        assert wf.getframerate() == rate // 2


def test_video_blob_is_valid_y4m_and_sampler_matches(spark):
    import numpy as np

    blobs = multimodal.with_video_blob(spark, SF_SMOKE)
    raw = {r.doc_id: bytes(r.content) for r in blobs.limit(20).collect()}
    for doc_id, blob in raw.items():
        assert blob.startswith(b"YUV4MPEG2 W16 H8 ")
        frames = multimodal._parse_y4m(blob)
        assert frames.shape == (doc_id % 8 + 2, 3, 8, 16)
    sampled = [
        r for r in multimodal.sample_video_frames(blobs, every=2).collect()
        if r.doc_id in raw
    ]
    assert sampled
    for r in sampled:
        frames = multimodal._parse_y4m(raw[r.doc_id])
        assert r.frame_index % 2 == 0 and r.n_frames == len(frames)
        planes = frames[r.frame_index].astype(np.int64)
        assert (r.sum_y, r.sum_u, r.sum_v) == tuple(int(p.sum()) for p in planes)
    # every even frame of every doc appears exactly once
    expected = {(d, f) for d, b in raw.items() for f in range(0, d % 8 + 2, 2)}
    assert {(r.doc_id, r.frame_index) for r in sampled} == expected


def test_wav_decode_rejects_non_riff(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = multimodal.decode_audio_features(multimodal.with_blob(spark, SF_SMOKE).limit(1))
    with pytest.raises((PythonException, Py4JJavaError)):
        df.collect()


def test_frame_sampling_arithmetic(spark):
    df = multimodal.frame_sample_offsets(spark, SF_SMOKE, fps=24, every_n_seconds=10)
    rows = df.where(df.doc_id == df.first().doc_id).collect()
    secs = sorted(r.sample_second for r in rows)
    assert secs[0] == 0
    assert all(b - a == 10 for a, b in zip(secs, secs[1:]))
    for r in rows:
        assert r.frame_index == r.sample_second * 24


def test_resize_fake_shapes(spark):
    from redis_dataflow_realtime_analytics_spark.operators import multimodal

    out = multimodal.resize_images(
        multimodal.with_blob(spark, SF_SMOKE), width=16, height=8, fake=True
    ).collect()
    assert len(out) > 0
    for r in out:
        assert len(r.content) == 16 * 8
        assert r.target_width == 16 and r.target_height == 8


def test_resize_real_path_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from redis_dataflow_realtime_analytics_spark.operators import multimodal

    df = multimodal.resize_images(multimodal.with_blob(spark, SF_SMOKE), fake=False)
    with pytest.raises((PythonException, Py4JJavaError)):
        df.collect()


def test_bmp_blob_is_valid_and_round_trips(spark):
    """The synthesized blob is a well-formed 24-bit BI_RGB BMP: magic,
    header fields, stride-padded bottom-up payload; the strict parser
    recovers the advertised geometry and the file size matches the
    header's own size field."""
    rows = multimodal.with_bmp_blob(spark, SF_SMOKE).limit(20).collect()
    assert rows
    pads = set()
    for r in rows:
        blob = bytes(r.content)
        assert blob[:2] == b"BM"
        assert int.from_bytes(blob[2:6], "little") == len(blob)
        w, h, px = multimodal._parse_bmp(blob)
        assert (w, h) == (r.meta.width, r.meta.height)
        assert px.shape == (h, w, 3)
        pads.add((4 - (3 * w) % 4) % 4)
    # the doc_id-derived geometry must exercise non-zero padding
    assert pads - {0}


def test_bmp_decoder_unflips_bottom_up_rows(spark):
    """first_px_* must be the TOP-LEFT pixel, i.e. the FIRST 3 bytes of
    the LAST stored row — recomputed here from the raw blob, independent
    of the decoder's own numpy path."""
    feats = {
        r.doc_id: r
        for r in multimodal.decode_bmp_features(
            multimodal.with_bmp_blob(spark, SF_SMOKE).limit(10)
        ).collect()
    }
    for r in multimodal.with_bmp_blob(spark, SF_SMOKE).limit(10).collect():
        blob = bytes(r.content)
        w, h = r.meta.width, r.meta.height
        stride = (3 * w + 3) // 4 * 4
        last_row_off = 54 + (h - 1) * stride
        b, g, rr = blob[last_row_off : last_row_off + 3]
        f = feats[r.doc_id]
        assert (f.first_px_b, f.first_px_g, f.first_px_r) == (b, g, rr)
        assert f.row_pad == stride - 3 * w


def test_bmp_decoder_rejects_other_formats(spark):
    import pytest as _pytest

    blobs = multimodal.with_blob(spark, SF_SMOKE).limit(1)
    with _pytest.raises(Exception) as ei:
        multimodal.decode_bmp_features(blobs).collect()
    assert "NotImplementedError" in str(ei.value) or "only BI_RGB" in str(ei.value)


def test_image_histogram_counts_cover_raster(spark):
    """Histogram counts per (doc, channel) must sum to exactly w*h
    pixels, bins stay in range, and all three channels appear."""
    from redis_dataflow_realtime_analytics_spark.operators import multimodal as mm

    blobs = mm.with_image_blob(spark, SF_SMOKE)
    geom = {r.doc_id: (r.meta.width, r.meta.height) for r in blobs.select("doc_id", "meta").collect()}
    rows = mm.image_histogram(blobs).collect()
    per = {}
    for r in rows:
        assert 0 <= r.bin < 8 and 0 <= r.channel < 3
        per[(r.doc_id, r.channel)] = per.get((r.doc_id, r.channel), 0) + r.n_pixels
    for (doc_id, _), total in per.items():
        w, h = geom[doc_id]
        assert total == w * h
    assert {ch for _, ch in per} == {0, 1, 2}


def test_audio_frames_cover_all_samples(spark):
    """Frame lengths must tile each clip exactly (full frames + one short
    tail), crossings bounded by frame length, and sum_sq >= sum_abs when
    samples are integral with |x| >= 1."""
    from redis_dataflow_realtime_analytics_spark.operators import multimodal as mm

    blobs = mm.with_audio_blob(spark, SF_SMOKE)
    meta = {r.doc_id: r.meta.n_samples for r in blobs.select("doc_id", "meta").collect()}
    rows = mm.audio_frame_features(blobs).collect()
    per = {}
    for r in rows:
        assert 0 < r.n_frame_samples <= 160
        assert 0 <= r.zero_crossings < r.n_frame_samples
        assert r.peak_abs <= 32768 and r.sum_sq >= r.sum_abs
        per[r.doc_id] = per.get(r.doc_id, 0) + r.n_frame_samples
    assert per == meta


def test_scene_cuts_pair_count_and_bounds(spark):
    """Each clip yields exactly n_frames-1 SAD rows; SAD bounded by
    255 * Y-pixels; flag consistent with the threshold."""
    from redis_dataflow_realtime_analytics_spark.operators import multimodal as mm

    blobs = mm.with_video_blob(spark, SF_SMOKE)
    meta = {r.doc_id: r.meta.n_frames for r in blobs.select("doc_id", "meta").collect()}
    rows = mm.video_scene_cuts(blobs).collect()
    per = {}
    for r in rows:
        assert 0 <= r.sad_y <= 255 * mm.Y4M_W * mm.Y4M_H
        assert r.is_cut == (r.sad_y > mm.SCENE_CUT_SAD)
        per[r.doc_id] = per.get(r.doc_id, 0) + 1
    assert per == {d: n - 1 for d, n in meta.items()}


def test_image_ahash_matches_oracle(spark):
    from .oracle import compare
    from redis_dataflow_realtime_analytics_spark.operators import multimodal

    compare(
        multimodal.image_ahash_features(spark, SF_SMOKE),
        multimodal.oracle_image_ahash(),
        SF_SMOKE,
    )


def test_image_ahash_pairs_matches_oracle(spark):
    from .oracle import compare
    from redis_dataflow_realtime_analytics_spark.operators import multimodal

    compare(
        multimodal.image_ahash_pairs(spark, SF_SMOKE),
        multimodal.oracle_image_ahash_pairs(),
        SF_SMOKE,
    )


def test_image_ahash_invariants_and_neardup_recall(spark):
    """aHash bit budget: hash_hi/lo are unsigned 32-bit halves and the
    hex form round-trips them. Identical rasters MUST collide at
    Hamming 0, and the CDC synthesis must give the image leg real
    recall over the corpus's TEXT near-dups (1-token edits perturb ~1
    chunk of 8, so a useful fraction of pairs stays under the Hamming
    threshold; measured 3/14 at sf0.001, 9/25 at sf0.01 — that resilience is the entire point of content-defined
    chunking vs fixed-position windows)."""
    from redis_dataflow_realtime_analytics_spark.operators import dedup, multimodal

    rows = multimodal.image_ahash_features(spark, SF_SMOKE).collect()
    by_hash = {}
    for r in rows:
        assert 0 <= r.hash_hi < 2**32 and 0 <= r.hash_lo < 2**32
        assert r.ahash_hex == f"{(r.hash_hi << 32) | r.hash_lo:016x}"
        assert (r.width, r.height) == (16, 16)
        by_hash.setdefault((r.hash_hi, r.hash_lo), []).append(r.doc_id)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.image_ahash_pairs(spark, SF_SMOKE).collect()
    }
    for ids in by_hash.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                assert pairs.get((lo, hi)) == 0
    assert all(0 <= h <= 10 for h in pairs.values())
    nd = [(r.doc_a, r.doc_b) for r in dedup.minhash_neardup_pairs(spark, SF_SMOKE).collect()]
    if nd:
        recall = sum(1 for p in nd if p in pairs) / len(nd)
        assert recall >= 0.15, f"image-leg recall over text near-dups {recall}"
