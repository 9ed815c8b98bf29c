"""Behavioral test for normalize_mask on text that actually contains
maskable content (the synthetic corpus has none, so the oracle diff
alone would not exercise the masking branches)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark.operators import text  # noqa: E402


def test_normalize_masks_urls_emails_numbers(spark, tmp_path):
    rows = [
        (1, "Visit https://example.com/a?q=1 or mail Bob@Example.org today", "en", "s", 60),
        (2, "card 1234567890   ends\twith  42", "en", "s", 31),
        (3, "plain  text   only", "en", "s", 18),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in text.normalize_mask(spark, str(tmp_path)).collect()}
    assert got[1].clean_text == "visit <url> or mail <email> today"
    assert (got[1].n_urls, got[1].n_emails, got[1].n_longnums) == (1, 1, 0)
    assert got[2].clean_text == "card <num> ends with 42"
    assert got[2].n_longnums == 1
    assert got[3].clean_text == "plain text only"
    assert (got[3].n_urls, got[3].n_emails, got[3].n_longnums) == (0, 0, 0)
    assert all(r.clean_chars == len(r.clean_text) for r in got.values())
