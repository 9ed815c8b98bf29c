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


def test_collocations_pmi_matches_oracle(spark):
    compare(
        text.collocations_pmi(spark, SF_SMOKE),
        text.oracle_collocations_pmi(),
        SF_SMOKE,
    )


def test_collocations_pmi_planted(spark, tmp_path):
    """A token pair that ONLY occurs together must out-PMI a pair of
    independently frequent tokens."""
    rows = [(i, "zig zag common common", "en", "s", 1) for i in range(10)]
    rows += [(100 + i, "common alpha common beta", "en", "s", 1) for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.bigram: r for r in text.collocations_pmi(spark, str(tmp_path), k=50, min_count=5).collect()}
    assert "zig zag" in got
    # 'zig zag' is a perfect collocation; 'common common' pairs two
    # high-frequency independent tokens
    assert got["zig zag"].pmi > got["common common"].pmi


def test_corpus_quality_gate_matches_oracle(spark):
    compare(
        text.corpus_quality_gate(spark, SF_SMOKE),
        text.oracle_corpus_quality_gate(),
        SF_SMOKE,
    )


def test_corpus_quality_gate_splits_and_localizes(spark):
    """The calibrated thresholds must reject a non-trivial slice at
    SF_SMOKE, and every keep verdict must equal the AND of its gates."""
    rows = text.corpus_quality_gate(spark, SF_SMOKE).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert r.keep == (r.pass_quality and r.pass_entropy and r.pass_repetition)


def test_embedding_top_component_planted_axis(spark, tmp_path):
    """Vectors concentrated along dimension 2 -> dominant component
    aligns with axis 2 and the eigenvalue dwarfs the off-axis energy."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        v = [rng.uniform(-0.05, 0.05) for _ in range(8)]
        v[2] = rng.uniform(0.8, 1.0) * (1 if i % 2 else -1)  # dominant axis
        rows.append((i, [float(x) for x in v], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    comp = similarity.embedding_top_component(spark, str(tmp_path)).collect()
    by_dim = {r.dim: r.component for r in comp}
    assert abs(by_dim[2]) > 0.99  # aligned with the planted axis
    assert all(abs(by_dim[d]) < 0.1 for d in by_dim if d != 2)
    assert comp[0].eigenvalue > 0


def test_embedding_top_component_deterministic(spark):
    a = similarity.embedding_top_component(spark, SF_SMOKE, iters=4).collect()
    b = similarity.embedding_top_component(spark, SF_SMOKE, iters=4).collect()
    assert a == b


def test_embedding_top_component_rayleigh_residual(spark):
    """v must be (near-)eigen: X'X v ≈ λ v after the iteration budget —
    checked via one more explicit multiply in numpy."""
    import numpy as np

    from redis_dataflow_realtime_analytics_spark.tables import load

    # generous iteration budget: convergence rate is (λ2/λ1)^t and the
    # fixture's spectrum is fairly flat
    comp = similarity.embedding_top_component(spark, SF_SMOKE, iters=30).collect()
    v = np.array([r.component for r in sorted(comp, key=lambda r: r.dim)])
    lam = comp[0].eigenvalue
    emb = np.array(
        [
            r.embedding
            for r in load(spark, SF_SMOKE, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * (1 << 20))  # the operator's fixed-point quantization
    w = q.T @ (q @ v)
    cos = w @ v / (np.linalg.norm(w) * np.linalg.norm(v))
    assert cos > 0.9995  # direction converged
    assert abs(lam - v @ w) / lam < 0.02  # Rayleigh quotient consistent


def test_stream_quality_filter_matches_batch_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.registry import ORACLE, QUERIES

    compare(
        QUERIES["stream_quality_filtered_docs"](spark, SF_SMOKE),
        ORACLE["stream_quality_filtered_docs"],
        SF_SMOKE,
    )


def test_stream_quality_filter_is_strict_subset(spark):
    from redis_dataflow_realtime_analytics_spark.registry import QUERIES

    out = QUERIES["stream_quality_filtered_docs"](spark, SF_SMOKE)
    batch = text.quality_score(spark, SF_SMOKE)
    n_all = batch.count()
    kept = out.count()
    assert 0 < kept < n_all  # threshold actually filters
    assert out.agg(F.min("quality")).first()[0] >= text.GATE_MIN_QUALITY


def test_lang_confusion_matrix_matches_oracle(spark):
    compare(
        text.lang_confusion_matrix(spark, SF_SMOKE),
        text.oracle_lang_confusion_matrix(),
        SF_SMOKE,
    )


def test_lang_confusion_matrix_shares_sum_to_one(spark):
    rows = text.lang_confusion_matrix(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == 500  # every doc lands in a cell
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.share_of_lang
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-12, (lang, s)


def test_semantic_components_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.registry import ORACLE

    compare(
        similarity.semantic_components(spark, SF_SMOKE),
        ORACLE["dedup_semantic_components"],
        SF_SMOKE,
    )


def test_semantic_components_cover_exactly_paired_vectors(spark):
    comp = similarity.semantic_components(spark, SF_SMOKE)
    pairs = similarity.embedding_neardup_pairs(spark, SF_SMOKE)
    paired = (
        pairs.selectExpr("vec_id_a AS v")
        .union(pairs.selectExpr("vec_id_b AS v"))
        .distinct()
    )
    assert comp.count() == paired.count()  # every paired vector, nothing else
    assert comp.where("component_id > vec_id").count() == 0  # min-label law


def test_curated_pipeline_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.registry import ORACLE

    compare(
        sampling.curated_corpus_pipeline(spark, SF_SMOKE),
        ORACLE["corpus_curated_pipeline"],
        SF_SMOKE,
    )


def test_curated_pipeline_bounded_by_gate(spark):
    """The curated corpus can never exceed the gate's keep count, and
    dedup can only shrink it further."""
    gate_kept = text.corpus_quality_gate(spark, SF_SMOKE).where("keep").count()
    mix = sampling.curated_corpus_pipeline(spark, SF_SMOKE).collect()
    curated = sum(r.n_docs for r in mix)
    assert 0 < curated <= gate_kept


def test_stream_ingest_dedup_matches_batch_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.registry import ORACLE, QUERIES

    compare(
        QUERIES["stream_ingest_dedup"](spark, SF_SMOKE),
        ORACLE["stream_ingest_dedup"],
        SF_SMOKE,
    )


def test_stream_ingest_dedup_planted_cross_batch_duplicates(spark, tmp_path):
    """A duplicate arriving in a LATER shipment must be rejected by the
    index probe (the cross-batch case the within-batch groupBy can't
    catch). doc_ids 0..5 split into 3 doc_id-ordered shipments of 2; the
    text of doc 0 recurs as docs 3 and 5."""
    from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp

    rows = [
        (0, "original text", "en", "s", 1),
        (1, "unique one", "en", "s", 1),
        (2, "unique two", "en", "s", 1),
        (3, "original text", "en", "s", 1),  # dup of 0, batch 2
        (4, "unique three", "en", "s", 1),
        (5, "original text", "en", "s", 1),  # dup of 0, batch 3
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = sp.stream_ingest_dedup(
        spark, f"{tmp_path}/documents.parquet", n_chunks=3
    ).collect()
    accepted = sorted(r.doc_id for r in got)
    assert accepted == [0, 1, 2, 4]


def test_activity_heatmap_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.operators import sessions
    from redis_dataflow_realtime_analytics_spark.registry import EV_CTE

    compare(
        sessions.events_activity_heatmap(spark, SF_SMOKE),
        sessions.oracle_events_activity_heatmap(EV_CTE),
        SF_SMOKE,
    )


def test_activity_heatmap_cell_domain(spark):
    from redis_dataflow_realtime_analytics_spark.operators import sessions

    rows = sessions.events_activity_heatmap(spark, SF_SMOKE).collect()
    assert all(1 <= r.day_of_week <= 7 and 0 <= r.hour <= 23 for r in rows)
    assert all(r.n_users <= r.n_events for r in rows)


def test_embedding_top_component_matches_numpy_eigh(spark):
    """The iterated direction must track numpy's exact dominant
    eigenvector of the same quantized second-moment matrix (up to sign)
    as far as the fixture's eigengap allows: λ2/λ1 ≈ 0.93 here, so 30
    power iterations leave ≈0.93³⁰ ≈ 0.11 residual — alignment is gated
    at that theory bound, and the Rayleigh eigenvalue (whose error is
    sin²θ-weighted over the near-degenerate tail, i.e. quadratically
    smaller) at 2%. The planted-axis test above covers the well-gapped
    case to 0.99 alignment."""
    import numpy as np

    from redis_dataflow_realtime_analytics_spark.tables import load

    comp = similarity.embedding_top_component(spark, SF_SMOKE, iters=30).collect()
    v = np.array([r.component for r in sorted(comp, key=lambda r: r.dim)])
    lam = comp[0].eigenvalue
    emb = np.array(
        [
            r.embedding
            for r in load(spark, SF_SMOKE, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * (1 << 20))
    w_exact, v_exact = np.linalg.eigh(q.T @ q)
    top = v_exact[:, -1]
    gap = w_exact[-2] / w_exact[-1]
    assert abs(v @ top) > 1.0 - 2.0 * gap**30  # alignment at the theory bound
    assert abs(lam - w_exact[-1]) / w_exact[-1] < 0.02


def test_stream_curated_ingest_matches_batch_oracle(spark):
    from redis_dataflow_realtime_analytics_spark.registry import ORACLE, QUERIES

    compare(
        QUERIES["stream_curated_ingest"](spark, SF_SMOKE),
        ORACLE["stream_curated_ingest"],
        SF_SMOKE,
    )


def test_stream_curated_ingest_is_gate_intersect_dedup(spark):
    """The fused ingest must accept exactly: quality-passing docs that are
    the first (lowest doc_id) of their content-hash group among
    quality-passing docs."""
    from redis_dataflow_realtime_analytics_spark.registry import QUERIES

    got = {r.doc_id for r in QUERIES["stream_curated_ingest"](spark, SF_SMOKE).collect()}
    kept = {
        r.doc_id
        for r in text.quality_score(spark, SF_SMOKE)
        .where(F.col("quality") >= text.GATE_MIN_QUALITY)
        .collect()
    }
    assert got <= kept  # never accepts a quality-rejected doc
    assert len(got) > 0


def test_top_subspace_planted_two_axes(spark, tmp_path):
    """Data concentrated on axes 1 and 5 (axis 1 stronger) -> the top-2
    subspace recovers exactly those axes in eigenvalue order."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(300):
        v = [rng.uniform(-0.02, 0.02) for _ in range(8)]
        v[1] = rng.uniform(0.9, 1.0) * (1 if i % 2 else -1)
        v[5] = rng.uniform(0.4, 0.5) * (1 if i % 3 else -1)
        rows.append((i, [float(x) for x in v], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = similarity.embedding_top_subspace(spark, str(tmp_path), r=2, iters=15).collect()
    comp = {}
    for r in out:
        comp.setdefault(r.component_idx, {})[r.dim] = r.value
    assert abs(comp[0][1]) > 0.99  # strongest axis first
    assert abs(comp[1][5]) > 0.99
    eigs = sorted({r.component_idx: r.eigenvalue for r in out}.items())
    assert eigs[0][1] > eigs[1][1] > 0


def test_top_subspace_orthonormal_and_deterministic(spark):
    import numpy as np

    a = similarity.embedding_top_subspace(spark, SF_SMOKE, r=3, iters=6).collect()
    b = similarity.embedding_top_subspace(spark, SF_SMOKE, r=3, iters=6).collect()
    assert a == b  # bit-identical across runs
    Vm = np.zeros((64, 3))
    for r in a:
        Vm[r.dim, r.component_idx] = r.value
    gram = Vm.T @ Vm
    assert np.allclose(gram, np.eye(3), atol=1e-12)  # orthonormal columns


def test_top_subspace_captures_numpy_spectral_mass(spark):
    """The captured Rayleigh mass must approach the exact top-r spectral
    mass (subspace convergence is gap-limited on the flat fixture
    spectrum, so gate the SUM of eigenvalues at 2%, not per-vector
    alignment)."""
    import numpy as np

    from redis_dataflow_realtime_analytics_spark.tables import load

    out = similarity.embedding_top_subspace(spark, SF_SMOKE, r=4, iters=20).collect()
    got_mass = sum({r.component_idx: r.eigenvalue for r in out}.values())
    emb = np.array(
        [
            r.embedding
            for r in load(spark, SF_SMOKE, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * (1 << 20))
    w_exact = np.linalg.eigh(q.T @ q)[0]
    exact_mass = float(w_exact[-4:].sum())
    assert got_mass <= exact_mass * (1 + 1e-9)  # can never exceed the optimum
    assert got_mass > exact_mass * 0.98


def test_bow_dedup_matches_oracle(spark):
    compare(
        dedup.bow_dedup_groups(spark, SF_SMOKE),
        dedup.oracle_bow_dedup_groups(),
        SF_SMOKE,
    )


def test_bow_dedup_catches_word_order_shuffle(spark, tmp_path):
    """Two docs with the same token multiset in different orders group
    together; a doc with one extra token does not."""
    rows = [
        (1, "alpha beta gamma", "en", "s", 1),
        (2, "gamma alpha beta", "en", "s", 1),  # shuffle of 1
        (3, "alpha beta gamma delta", "en", "s", 1),  # different multiset
        (4, "Alpha Beta GAMMA", "en", "s", 1),  # case-folds into group 1
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = dedup.bow_dedup_groups(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].n_docs == 3 and got[0].keeper_doc_id == 1
    # normalized exact dedup groups the CASE pair (1, 4) but cannot see
    # the order shuffle: its largest group stays at 2, while bow reaches 3
    exact = dedup.exact_dedup_groups(spark, str(tmp_path))
    exact_groups = exact.where(F.col("n_docs") >= 2).collect()
    assert len(exact_groups) == 1 and exact_groups[0].n_docs == 2


def test_subspace_projection_variance_ordering_and_bounds(spark):
    """Coordinate variances must be non-increasing (eigenvalue order) and
    each projected norm can never exceed the full vector norm."""
    import numpy as np

    from redis_dataflow_realtime_analytics_spark.tables import load

    out = similarity.embedding_subspace_projection(spark, SF_SMOKE, r=3, iters=15)
    pdf = out.toPandas().sort_values("vec_id").reset_index(drop=True)
    P = pdf[["proj_0", "proj_1", "proj_2"]].to_numpy()
    # uncentered second moments along the basis are non-increasing
    m = (P**2).mean(axis=0)
    assert m[0] >= m[1] >= m[2] > 0
    emb = np.array(
        [
            r.embedding
            for r in load(spark, SF_SMOKE, "embeddings")
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * (1 << 20))
    norms = np.linalg.norm(q, axis=1)
    proj_norms = np.linalg.norm(P, axis=1)
    assert (proj_norms <= norms * (1 + 1e-9)).all()  # orthonormal basis bound


def test_subspace_projection_deterministic(spark):
    a = similarity.embedding_subspace_projection(spark, SF_SMOKE, r=2, iters=5).collect()
    b = similarity.embedding_subspace_projection(spark, SF_SMOKE, r=2, iters=5).collect()
    assert sorted(a) == sorted(b)


def test_keep_best_per_cluster_matches_oracle(spark):
    compare(
        dedup.neardup_keep_best(spark, SF_SMOKE),
        dedup.oracle_neardup_keep_best(
            dedup.oracle_neardup_components(), text.oracle_quality_score()
        ),
        SF_SMOKE,
    )


def test_keep_best_picks_quality_not_first(spark, tmp_path):
    # Docs 1/2/3 are one near-dup cluster; doc 3 (HIGHER quality: more
    # tokens, no punctuation noise) must be kept even though doc 1 has the
    # smaller id — the exact case where keep-first and keep-best diverge.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base + " !!@@##", "en", "s", 1),  # punct-damaged copy
        (2, base + " $$%%^^", "en", "s", 1),  # punct-damaged copy
        (3, base + " iota kappa", "en", "s", 1),  # clean, longer
        (9, "totally unrelated text with no shared shingles at all", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in dedup.neardup_keep_best(spark, str(tmp_path)).collect()}
    assert set(got) == {3, 9}
    assert got[3].reason == "best_of_cluster"
    assert got[3].cluster_size == 3
    assert got[3].component_id == 1  # canonical label stays min doc_id
    assert got[9].reason == "unique"
    assert got[9].cluster_size == 1


def test_keep_best_covers_every_cluster_once(spark):
    kept = dedup.neardup_keep_best(spark, SF_SMOKE)
    comp = dedup.neardup_components(spark, SF_SMOKE)
    n_clusters = comp.select("component_id").distinct().count()
    n_unpaired = (
        text.quality_score(spark, SF_SMOKE)
        .join(comp.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    by_reason = {r.reason: r.n for r in kept.groupBy("reason").agg(F.count("*").alias("n")).collect()}
    assert by_reason.get("best_of_cluster", 0) == n_clusters
    assert by_reason.get("unique", 0) == n_unpaired
