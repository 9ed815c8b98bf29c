"""Behavioral test for normalize_mask on text that actually contains
maskable content (the synthetic corpus has none, so the oracle diff
alone would not exercise the masking branches)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark.operators import text  # noqa: E402


def test_repetition_signals_flag_planted_loops(spark, tmp_path):
    """The synthetic corpus barely repeats trigrams, so plant real
    degenerate text: a looping doc must score high on both repetition
    signals, clean text near zero, and the frac algebra must hold."""
    loop = "buy now " * 20  # 40 tokens of one repeated bigram
    clean = "the quick brown fox jumps over a lazy dog near the river bank today"
    half = "alpha beta gamma delta " * 3 + "epsilon zeta eta theta iota kappa"
    rows = [(1, loop.strip(), "en", "s", 1), (2, clean, "en", "s", 1), (3, half, "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in text.repetition_signals(spark, str(tmp_path)).collect()}
    # doc 1: "buy now buy now ..." — every trigram occurs many times; the
    # top bigram ("buy now") covers 20 of 39 bigram slots
    assert got[1].dup_trigram_frac == 1.0
    assert got[1].top_bigram_frac > 0.5
    assert got[1].distinct_token_ratio == 2 / 40
    # doc 2: no repeated bigrams/trigrams at all
    assert got[2].dup_trigram_frac == 0.0
    assert got[2].top_bigram_count == 1
    # doc 3: partially looping — strictly between the two
    assert got[1].dup_trigram_frac > got[3].dup_trigram_frac > got[2].dup_trigram_frac
    for r in got.values():
        assert r.n_bigrams == r.n_tokens - 1
        assert r.n_trigrams == r.n_tokens - 2
        assert 0.0 <= r.top_bigram_frac <= 1.0 and 0.0 <= r.dup_trigram_frac <= 1.0


def test_sequential_mask_counts_and_vertical_tab_parity(spark, tmp_path):
    """Round-1 ADVICE regressions: (a) digit runs inside URLs must not count
    toward n_longnums (counts are taken on the progressively-masked text);
    (b) \\x0B (vertical tab): Java's \\s includes it, RE2's does not — the
    explicit whitespace class must make Spark and DuckDB agree bit-exactly.
    """
    import duckdb

    rows = [
        (1, "see https://x.io/1234567 now", "en", "s", 28),  # digits inside URL
        (2, "a\x0bb  c\x0b\x0bd 12345", "en", "s", 16),  # vertical tabs
        (3, "mail a1@b.co or a2@b.co id 9999", "en", "s", 31),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in text.normalize_mask(spark, str(tmp_path)).collect()}
    assert got[1].clean_text == "see <url> now"
    assert (got[1].n_urls, got[1].n_emails, got[1].n_longnums) == (1, 0, 0)
    assert got[2].clean_text == "a b c d <num>"
    assert (got[3].n_emails, got[3].n_longnums) == (2, 1)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: r
        for r in con.sql(text.oracle_normalize_mask()).fetchall()
    }
    con.close()
    for doc_id, r in got.items():
        assert tuple(r) == oracle[doc_id], f"doc {doc_id}: {tuple(r)} vs {oracle[doc_id]}"


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


def test_bigram_lm_penalizes_scrambled_word_order(spark, tmp_path):
    """Docs sharing a consistent bigram structure score high; a doc with
    the IDENTICAL unigram distribution but scrambled order must score
    strictly lower — the property that separates the bigram gate from
    the unigram gate."""
    from redis_dataflow_realtime_analytics_spark.operators import text as T

    pattern = "alpha beta gamma delta " * 10
    scrambled = "beta delta alpha gamma gamma alpha delta beta " * 5
    rows = [(i, pattern.strip(), "en", "web", len(pattern)) for i in range(20)]
    rows.append((99, scrambled.strip(), "en", "web", len(scrambled)))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / "bigram_sf"
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = {r.doc_id: r for r in T.bigram_logprob_scores(spark, str(d)).collect()}
    assert out[0].n_bigrams == 39  # 40 tokens -> 39 bigrams
    pattern_score = out[0].avg_logp
    assert all(out[i].avg_logp == pattern_score for i in range(20))
    assert out[99].avg_logp < pattern_score
