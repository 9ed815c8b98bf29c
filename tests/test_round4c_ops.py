"""Gates for the round-4 session-2 corpus-diagnostic operators: token
entropy / TTR, sentence stats, per-dimension embedding profile, dedup
cluster-size histogram, and per-source length deciles — each checked
against its DuckDB oracle at SF_SMOKE plus planted behavioral cases the
synthetic corpus alone would not exercise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import (
    dedup,
    sampling,
    similarity,
    text,
)

from .conftest import SF_SMOKE
from .oracle import compare


def test_token_entropy_matches_oracle(spark):
    compare(text.token_entropy(spark, SF_SMOKE), text.oracle_token_entropy(), SF_SMOKE)


def test_token_entropy_planted_extremes(spark, tmp_path):
    rows = [
        (1, "spam spam spam spam", "en", "s", 1),  # one type -> entropy 0
        (2, "a b c d", "en", "s", 1),  # uniform 4 types -> ln 4
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in text.token_entropy(spark, str(tmp_path)).collect()}
    # zero up to the decimal(38,12) rounding of the c*ln(c) terms
    assert abs(got[1].entropy) < 1e-9
    assert got[1].type_token_ratio == 0.25
    assert abs(got[2].entropy - math.log(4)) < 1e-12
    assert got[2].type_token_ratio == 1.0


def test_sentence_stats_matches_oracle(spark):
    compare(
        text.sentence_stats(spark, SF_SMOKE), text.oracle_sentence_stats(), SF_SMOKE
    )


def test_sentence_stats_planted(spark, tmp_path):
    rows = [
        (1, "One two. Three! Four five six?", "en", "s", 1),  # 3 sentences, 6 tokens
        (2, "no terminal punctuation at all", "en", "s", 1),  # 1 sentence
        (3, "...", "en", "s", 1),  # punctuation only -> 0 sentences, null avg
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in text.sentence_stats(spark, str(tmp_path)).collect()}
    assert (got[1].n_sentences, got[1].n_sentence_tokens) == (3, 6)
    assert got[1].avg_sentence_tokens == 2.0
    assert got[2].n_sentences == 1
    assert got[3].n_sentences == 0 and got[3].avg_sentence_tokens is None


def test_embedding_dim_stats_matches_oracle(spark):
    compare(
        similarity.embedding_dim_stats(spark, SF_SMOKE),
        similarity.oracle_embedding_dim_stats(),
        SF_SMOKE,
    )


def test_embedding_dim_stats_one_row_per_dimension(spark):
    from redis_dataflow_realtime_analytics_spark.tables import load

    emb = load(spark, SF_SMOKE, "embeddings")
    width = len(emb.select("embedding").first().embedding)
    n = emb.count()
    rows = similarity.embedding_dim_stats(spark, SF_SMOKE).collect()
    assert len(rows) == width
    assert all(r.n_vecs == n for r in rows)
    assert all(r.min_q <= r.max_q for r in rows)
    assert all(0 <= r.n_pos <= r.n_vecs for r in rows)


def test_cluster_size_histogram_matches_oracle(spark):
    compare(
        dedup.cluster_size_histogram(spark, SF_SMOKE),
        dedup.oracle_cluster_size_histogram(),
        SF_SMOKE,
    )


def test_cluster_size_histogram_consistent_with_components(spark):
    """The histogram must tally exactly the component labeling: every
    cluster has >= 2 docs (components only contain paired docs) and doc /
    cluster totals re-add to the component output."""
    comp = dedup.neardup_components(spark, SF_SMOKE)
    hist = dedup.cluster_size_histogram(spark, SF_SMOKE).collect()
    assert all(r.cluster_size >= 2 for r in hist)
    assert sum(r.n_docs for r in hist) == comp.count()
    assert (
        sum(r.n_clusters for r in hist)
        == comp.select("component_id").distinct().count()
    )


def test_length_deciles_matches_oracle(spark):
    compare(
        sampling.length_decile_profile(spark, SF_SMOKE),
        sampling.oracle_length_decile_profile(),
        SF_SMOKE,
    )


def test_length_deciles_monotone_and_complete(spark):
    """Deciles within a source must be contiguous 1..10 with
    non-decreasing length ranges and near-equal bucket sizes."""
    rows = sampling.length_decile_profile(spark, SF_SMOKE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, 11))
        for a, b in zip(rs, rs[1:]):
            assert a.min_chars <= b.min_chars  # ntile ordering respected
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1  # ntile's equal-split contract


def test_retention_cohorts_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.operators import sessions
    from redis_dataflow_realtime_analytics_spark.registry import EV_CTE

    compare(
        sessions.user_retention_cohorts(spark, SF_SMOKE),
        sessions.oracle_user_retention_cohorts(EV_CTE),
        SF_SMOKE,
    )


def test_retention_cohorts_planted(spark, tmp_path):
    """Two users cohorted on day 0; one returns on day 2; a day-1 cohort
    of one never returns. Offset-0 cells must equal cohort sizes."""
    import datetime as dt

    from redis_dataflow_realtime_analytics_spark.operators import sessions

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 100, "click", 1.0, '{"k": 1}'),
        (2, t0 + dt.timedelta(hours=1), 200, "view", 1.0, '{"k": 1}'),
        (3, t0 + dt.timedelta(days=2), 100, "click", 1.0, '{"k": 1}'),
        (4, t0 + dt.timedelta(days=1), 300, "view", 1.0, '{"k": 1}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (str(r.cohort_day), r.day_offset): r.active_users
        for r in sessions.user_retention_cohorts(spark, str(tmp_path)).collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 2)] == 1
    assert got[("2024-01-02", 0)] == 1
    assert ("2024-01-02", 1) not in got
