"""Degenerate-blob sweep for the multimodal decode tier (r8, VERDICT
item 5): 0-pixel images, 0/1-sample WAVs, 0/1-frame Y4M streams — all
VALID containers the strict parsers accept, whose empty payloads are
where NaNs, empty-array reductions, and div-by-zero hide. Every case
pins an exact deterministic output (the fixture-level sweep can never
produce these geometries: the blob synthesis floors at 8×8 / 1 frame).
"""

from __future__ import annotations

import struct

import pytest

from redis_dataflow_realtime_analytics_spark.operators import multimodal as mm


def _blobs(spark, blob: bytes, doc_id: int = 1):
    return spark.createDataFrame(
        [(doc_id, bytearray(blob))], "doc_id bigint, content binary"
    )


def _wav(n_samples: int, rate: int = 8000, value: int = -7) -> bytes:
    payload = struct.pack(f"<{n_samples}h", *([value] * n_samples))
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )


def _y4m(n_frames: int, fill: int = 3) -> bytes:
    frame = b"FRAME\n" + bytes([fill]) * mm.Y4M_FRAME_BYTES
    return mm.Y4M_HEADER + frame * n_frames


# --- images -------------------------------------------------------------


@pytest.mark.parametrize(
    "blob,w,h,c",
    [
        (b"P6 0 0 255\n", 0, 0, 3),
        (b"P5 0 0 255\n", 0, 0, 1),
        (b"P6 0 5 255\n", 0, 5, 3),
        (b"P5 7 0 255\n", 7, 0, 1),
    ],
)
def test_decode_features_empty_raster_is_zero_not_nan(spark, blob, w, h, c):
    row = mm.decode_features(_blobs(spark, blob)).collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (w, h, c)
    assert row["mean_byte"] == 0.0  # pinned: NOT NaN
    assert row["channel_means"] == [0.0] * c


def test_ahash_zero_pixel_graymap_is_all_zero_hash(spark):
    row = mm.image_ahash(_blobs(spark, b"P5 0 0 255\n")).collect()[0]
    assert (row["hash_hi"], row["hash_lo"]) == (0, 0)
    assert row["ahash_hex"] == "0" * 16


def test_histogram_zero_pixel_image_emits_no_rows(spark):
    assert mm.image_histogram(_blobs(spark, b"P6 0 0 255\n")).count() == 0


def test_single_pixel_image(spark):
    blob = b"P6 1 1 255\n" + bytes([10, 20, 30])
    row = mm.decode_features(_blobs(spark, blob)).collect()[0]
    assert row["mean_byte"] == pytest.approx(20.0)
    assert row["channel_means"] == [10.0, 20.0, 30.0]


# --- audio --------------------------------------------------------------


def test_wav_zero_samples_all_stats_zero(spark):
    row = mm.decode_audio_features(_blobs(spark, _wav(0))).collect()[0]
    assert (row["n_samples"], row["peak_abs"], row["sum_abs"], row["sum_sq"]) == (
        0,
        0,
        0,
        0,
    )


def test_wav_single_sample_exact_stats(spark):
    row = mm.decode_audio_features(_blobs(spark, _wav(1, value=-7))).collect()[0]
    assert (row["n_samples"], row["peak_abs"], row["sum_abs"], row["sum_sq"]) == (
        1,
        7,
        7,
        49,
    )


def test_wav_zero_samples_frame_features_empty(spark):
    assert mm.audio_frame_features(_blobs(spark, _wav(0))).count() == 0


def test_wav_single_sample_one_partial_frame(spark):
    rows = mm.audio_frame_features(_blobs(spark, _wav(1, value=5))).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["frame"], r["n_frame_samples"], r["peak_abs"]) == (0, 1, 5)
    assert r["zero_crossings"] == 0


def test_resample_zero_and_single_sample(spark):
    # decimation keeps samples[::2]: 0 in -> 0 out; 1 in -> 1 out — and
    # the re-encoded blob must itself round-trip through the parser
    for n, expect_out in [(0, 0), (1, 1)]:
        row = mm.resample_audio(_blobs(spark, _wav(n)), factor=2).collect()[0]
        assert (row["n_samples_in"], row["n_samples_out"]) == (n, expect_out)
        rate, samples = mm._parse_wav(bytes(row["content"]))
        assert rate == 4000 and len(samples) == expect_out


# --- video --------------------------------------------------------------


def test_y4m_zero_frames(spark):
    blobs = _blobs(spark, _y4m(0))
    assert mm.sample_video_frames(blobs).count() == 0
    assert mm.video_scene_cuts(blobs).count() == 0


def test_y4m_single_frame(spark):
    blobs = _blobs(spark, _y4m(1, fill=3))
    rows = mm.sample_video_frames(blobs).collect()
    assert len(rows) == 1
    plane = 3 * mm.Y4M_W * mm.Y4M_H
    assert (rows[0]["frame_index"], rows[0]["n_frames"]) == (0, 1)
    assert rows[0]["sum_y"] == plane and rows[0]["sum_u"] == plane
    # a single frame has no predecessor: no SAD rows
    assert mm.video_scene_cuts(blobs).count() == 0


def test_y4m_two_identical_frames_zero_sad(spark):
    blobs = _blobs(spark, _y4m(2, fill=9))
    rows = mm.video_scene_cuts(blobs).collect()
    assert len(rows) == 1
    assert rows[0]["sad_y"] == 0 and rows[0]["is_cut"] is False
