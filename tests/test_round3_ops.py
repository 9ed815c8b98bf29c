"""Behavioral gates for the round-3 operators (beyond their SQL oracles):
per-stratum budgets, funnel-rate bounds, incremental-dedup partition
properties, vocabulary coverage monotonicity, unigram-LM score sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import dedup, sampling, sessions, text

from .conftest import SF_SMOKE


def test_topk_per_stratum_budget_and_determinism(spark):
    out = sampling.topk_per_stratum(spark, SF_SMOKE, k=7).collect()
    per_lang: dict[str, list[int]] = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r.rk)
    for lang, rks in per_lang.items():
        assert len(rks) <= 7
        assert sorted(rks) == list(range(1, len(rks) + 1)), lang
    again = sampling.topk_per_stratum(spark, SF_SMOKE, k=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_funnel_conversion_rate_bounds(spark):
    rows = sessions.funnel_conversion_by_experiment(spark, SF_SMOKE).collect()
    assert rows, "no experiments with clicks?"
    for r in rows:
        assert 0 <= r.converted_users <= r.click_users
        assert 0.0 <= r.conversion_rate <= 1.0
    # widening the horizon can only convert MORE users
    wide = {
        r.experiment_id: r.converted_users
        for r in sessions.funnel_conversion_by_experiment(
            spark, SF_SMOKE, horizon_minutes=60
        ).collect()
    }
    for r in rows:
        assert wide[r.experiment_id] >= r.converted_users


def test_incremental_dedup_partitions_incoming(spark):
    from redis_dataflow_realtime_analytics_spark.tables import load

    out = dedup.incremental_new_docs(spark, SF_SMOKE).collect()
    n_incoming = load(spark, SF_SMOKE, "documents").where(F.col("doc_id") % 10 == 0).count()
    assert len(out) == n_incoming  # every incoming doc classified exactly once
    for r in out:
        if r.status == "exact_dup":
            assert r.dup_of is not None and r.dup_of % 10 != 0
        else:
            assert r.status == "new" and r.dup_of is None


def test_vocabulary_coverage_monotone_and_bounded(spark):
    rows = sorted(
        text.vocabulary_coverage(spark, SF_SMOKE, v=200).collect(),
        key=lambda r: r.rank,
    )
    assert rows[0].rank == 1
    last = 0.0
    for a, b in zip(rows, rows[1:]):
        assert a.freq >= b.freq            # rank order = frequency order
        assert a.cum_coverage < b.cum_coverage or a.freq == 0
    assert 0.0 < rows[-1].cum_coverage <= 1.0


def test_unigram_scores_rank_gibberish_below_common_text(spark):
    scores = {
        r.doc_id: r.avg_logp
        for r in text.unigram_logprob_scores(spark, SF_SMOKE).collect()
    }
    assert scores and all(v < 0 for v in scores.values())  # log-probs
    # a doc made of the corpus's most common tokens must outscore the
    # corpus minimum (sanity that the LM orders fluency at all)
    assert max(scores.values()) > min(scores.values())


def test_profile_exact_and_approx_agree(spark):
    """The approx profile's HLL estimates must sit within the lgK=14
    error band of the exact distinct counts, with identical
    n_rows/n_nulls/min/max columns."""
    from redis_dataflow_realtime_analytics_spark.operators import relational

    exact = {r.column_name: r for r in relational.profile_documents(spark, SF_SMOKE).collect()}
    approx = {
        r.column_name: r
        for r in relational.profile_documents_approx(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx) == {"doc_id", "text", "lang", "source", "n_chars"}
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_value, a.max_value) == (
            e.n_rows, e.n_nulls, e.min_value, e.max_value,
        )
        assert abs(a.n_distinct_est - e.n_distinct) <= max(3, 0.03 * e.n_distinct)
        assert e.n_nulls == 0 and e.n_rows > 0
