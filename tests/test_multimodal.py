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


def test_real_decode_is_stubbed(spark):
    blobs = multimodal.with_blob(spark, SF_SMOKE).limit(1)
    feats = multimodal.decode_features(blobs, fake=False)
    with pytest.raises((Py4JJavaError, Exception)) as ei:
        feats.collect()
    assert "NotImplementedError" in str(ei.value) or "codecs unavailable" in str(ei.value)


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
