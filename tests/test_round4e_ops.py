"""Gates for the round-4 session-4 operators: degree-oriented triangle
counting over the near-dup graph, BM25 lexical retrieval, per-source
quality calibration, and binary sign-sketch Hamming ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import dedup, sampling, similarity, text

from .conftest import SF_SMOKE
from .oracle import compare


def test_triangles_match_oracle(spark):
    compare(
        dedup.neardup_triangles(spark, SF_SMOKE),
        dedup.oracle_neardup_triangles(dedup.oracle_ngram_jaccard_pairs(0.5)),
        SF_SMOKE,
    )


def test_triangles_invariants(spark):
    # Each triangle contributes exactly 3 per-node increments, and the
    # local clustering coefficient is a proper ratio.
    rows = dedup.neardup_triangles(spark, SF_SMOKE).collect()
    assert sum(r.triangles for r in rows) % 3 == 0
    assert all(0.0 <= r.clustering <= 1.0 for r in rows)
    # a node's triangles can never exceed its wedge count
    assert all(r.triangles <= r.degree * (r.degree - 1) // 2 for r in rows)


def test_triangles_degree_orientation_equals_naive(spark):
    # The degree-oriented plan must enumerate the identical triangle set a
    # naive id-ordered 3-join finds (orientation invariance).
    edges = dedup.ngram_jaccard_pairs(spark, SF_SMOKE, threshold=0.5)
    e = edges.select("doc_a", "doc_b").cache()
    e1 = e.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y"))
    e2 = e.select(F.col("doc_a").alias("y"), F.col("doc_b").alias("z"))
    e3 = e.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("z"))
    naive = e1.join(e2, "y").join(e3, ["x", "z"])
    per_node = {}
    for r in naive.collect():
        for v in (r.x, r.y, r.z):
            per_node[v] = per_node.get(v, 0) + 1
    got = {
        r.doc_id: r.triangles
        for r in dedup.neardup_triangles(spark, SF_SMOKE).collect()
        if r.triangles > 0
    }
    assert got == per_node


def test_bm25_matches_oracle(spark):
    compare(text.bm25_topk(spark, SF_SMOKE), text.oracle_bm25_topk(), SF_SMOKE)


def test_bm25_shape(spark):
    rows = text.bm25_topk(spark, SF_SMOKE).collect()
    assert rows, "bm25 returned no rows"
    # a query never retrieves itself; ranks are 1..k contiguous per query
    assert all(r.query_id != r.doc_id for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert all(r.score > 0 for r in rows)


def test_quality_calibration_matches_oracle(spark):
    compare(
        sampling.quality_calibrated_by_source(spark, SF_SMOKE),
        sampling.oracle_quality_calibrated(text.oracle_quality_score()),
        SF_SMOKE,
    )


def test_quality_calibration_uniform_within_source(spark):
    # Percentile ranks span [0, 1] within every multi-doc source, and the
    # keep gate retains the same FRACTION of every source (the whole point
    # of calibrating before thresholding).
    df = sampling.quality_calibrated_by_source(spark, SF_SMOKE)
    agg = (
        df.groupBy("source")
        .agg(
            F.min("pct_rank").alias("lo"),
            F.max("pct_rank").alias("hi"),
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
        )
        .collect()
    )
    for r in agg:
        if r.n > 1:
            assert r.lo == 0.0 and r.hi == 1.0
            # keep_floor=0.25 drops the bottom quartile of EACH source
            assert abs(r.kept / r.n - 0.75) < 0.05, (r.source, r.kept, r.n)


def test_hamming_matches_oracle(spark):
    compare(
        similarity.ann_topk_hamming(spark, SF_SMOKE),
        similarity.oracle_ann_topk_hamming(),
        SF_SMOKE,
    )


def test_hamming_recall_vs_bruteforce(spark):
    """64-bit sign sketches keep only the orthant of each vector; top-10
    recall vs exact cosine lands well above chance (10/499 ≈ 0.02) but
    below the int8 path — the memory/recall trade of 1-bit quantization.
    Production shape: Hamming shortlist → exact re-rank."""
    exact = {}
    for r in similarity.ann_topk_bruteforce(spark, SF_SMOKE, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ham = {}
    for r in similarity.ann_topk_hamming(spark, SF_SMOKE, k=10).collect():
        ham.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & ham[q]) / 10 for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.15, f"sign-sketch mean recall {mean_recall}"


def test_hamming_distance_definition(spark):
    # Spot-check: the packed-sketch Hamming distance equals the number of
    # dimensions whose signs disagree, recomputed in plain Python.
    from redis_dataflow_realtime_analytics_spark.tables import load

    vecs = {
        r.vec_id: r.embedding
        for r in load(spark, SF_SMOKE, "embeddings").limit(300).collect()
    }
    rows = similarity.ann_topk_hamming(spark, SF_SMOKE, k=10).collect()
    checked = 0
    for r in rows:
        if r.query_id in vecs and r.neighbor_id in vecs:
            a, b = vecs[r.query_id], vecs[r.neighbor_id]
            want = sum((x > 0) != (y > 0) for x, y in zip(a, b))
            assert r.hamming == want, (r.query_id, r.neighbor_id)
            checked += 1
    assert checked > 0


def test_hamming_rerank_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.ann_hamming_rerank_topk(spark, SF_SMOKE),
        registry.ORACLE["ann_hamming_rerank_topk"],
        SF_SMOKE,
    )


def test_hamming_rerank_recovers_recall(spark):
    """The exact re-rank over a 50-candidate Hamming shortlist must beat
    the raw sketch ranking's recall by a wide margin (measured 0.36 →
    0.72 at the smoke SF) — the whole point of the two-stage layout."""
    exact, raw, rr = {}, {}, {}
    for r in similarity.ann_topk_bruteforce(spark, SF_SMOKE, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in similarity.ann_topk_hamming(spark, SF_SMOKE, k=10).collect():
        raw.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in similarity.ann_hamming_rerank_topk(spark, SF_SMOKE, k=10).collect():
        rr.setdefault(r.query_id, set()).add(r.neighbor_id)
    raw_recall = sum(len(exact[q] & raw[q]) / 10 for q in exact) / len(exact)
    rr_recall = sum(len(exact[q] & rr[q]) / 10 for q in exact) / len(exact)
    assert rr_recall >= raw_recall + 0.15, (raw_recall, rr_recall)
    assert rr_recall >= 0.5, rr_recall


def test_pq_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.ann_topk_pq(spark, SF_SMOKE),
        registry.ORACLE["ann_topk_pq"],
        SF_SMOKE,
    )


def test_pq_recall_band(spark):
    """ADC over an 8-subspace / ~10-codeword codebook (the fixture's
    modulo seeds) — coarse, but recall must stay well above chance
    (10/499 ≈ 0.02); a production deployment grows C, not the plan."""
    exact, pq = {}, {}
    for r in similarity.ann_topk_bruteforce(spark, SF_SMOKE, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in similarity.ann_topk_pq(spark, SF_SMOKE, k=10).collect():
        pq.setdefault(r.query_id, set()).add(r.neighbor_id)
    mean_recall = sum(len(exact[q] & pq[q]) / 10 for q in exact) / len(exact)
    assert mean_recall >= 0.1, f"PQ mean recall {mean_recall}"


def test_pq_code_count(spark):
    # Every vector encodes to exactly PQ_M codes, each drawn from the
    # donor set (cid % PQ_SEED_MOD == 0) — checked via the reconstructed
    # norms being sums of PQ_M codeword norms (all positive).
    df = similarity.ann_topk_pq(spark, SF_SMOKE, k=3)
    rows = df.collect()
    assert rows and all(0.0 < r.approx_cosine <= 1.5 for r in rows)


def test_retrieval_eval_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.retrieval_eval_report(spark, SF_SMOKE),
        registry.ORACLE["retrieval_eval_report"],
        SF_SMOKE,
    )


def test_retrieval_eval_shape(spark):
    # One row per shared query; overlap bounded by both list sizes;
    # jaccard consistent with the counts. (The fixture's embeddings are
    # independent of the text, so near-zero agreement is the CORRECT
    # reading — the report exists to measure exactly that.)
    rows = similarity.retrieval_eval_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.query_id % similarity.QUERY_MOD == 0
        assert 0 <= r.n_overlap <= min(r.n_sparse, r.n_dense)
        union = r.n_sparse + r.n_dense - r.n_overlap
        assert abs(r.jaccard - r.n_overlap / union) < 1e-12


def test_rrf_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.hybrid_rrf_topk(spark, SF_SMOKE),
        registry.ORACLE["hybrid_rrf_topk"],
        SF_SMOKE,
    )


def test_rrf_properties(spark):
    """A doc on BOTH lists at rank r scores strictly above a doc on one
    list at the same rank; every fused rank is 1..k contiguous."""
    rows = similarity.hybrid_rrf_topk(spark, SF_SMOKE, k=10).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        two = [x for x in rs if x.n_lists == 2]
        one = [x for x in rs if x.n_lists == 1]
        if two and one:
            # max single-list contribution is 1/61; min two-list score is
            # 1/(60+k)·2 — with k=10 every dual-list doc outranks every
            # single-list doc.
            assert min(x.rrf_score for x in two) > max(x.rrf_score for x in one)


def test_cross_source_matrix_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        dedup.cross_source_dup_matrix(spark, SF_SMOKE),
        registry.ORACLE["dedup_cross_source_matrix"],
        SF_SMOKE,
    )


def test_cross_source_matrix_counts(spark):
    # Matrix total equals the pair-list size; matrix is upper-triangular.
    pairs = dedup.ngram_jaccard_pairs(spark, SF_SMOKE, threshold=0.5)
    rows = dedup.cross_source_dup_matrix(spark, SF_SMOKE).collect()
    assert sum(r.n_pairs for r in rows) == pairs.count()
    assert all(r.source_a <= r.source_b for r in rows)


def test_zorder_layout_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        registry.QUERIES["events_zorder_layout"](spark, SF_SMOKE),
        registry.ORACLE["events_zorder_layout"],
        SF_SMOKE,
    )


def test_zorder_files_bound_both_dimensions(spark):
    """The point of the Morton layout: every 2^22-code file spans a
    BOUNDED range of BOTH dimensions (≤ ~2^12 per dim incl. box-boundary
    crossings), so either-dimension filters prune files; and the files
    partition the event count exactly."""
    from redis_dataflow_realtime_analytics_spark import registry
    from redis_dataflow_realtime_analytics_spark.sources import read_events

    rows = registry.QUERIES["events_zorder_layout"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.max_minute - r.min_minute <= 4096
        assert r.max_ub - r.min_ub <= 4096
    total = read_events(spark, SF_SMOKE).count()
    assert sum(r.n_events for r in rows) == total


def test_leakage_free_split_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        sampling.leakage_free_split(spark, SF_SMOKE),
        registry.ORACLE["corpus_leakage_free_split"],
        SF_SMOKE,
    )


def test_leakage_free_split_never_straddles_clusters(spark):
    """The defining property: every near-dup cluster lands in ONE split,
    and singleton docs match the plain doc-keyed split exactly."""
    split = {r.doc_id: (r.split_key, r.split)
             for r in sampling.leakage_free_split(spark, SF_SMOKE).collect()}
    comp = {r.doc_id: r.component_id
            for r in dedup.neardup_components(spark, SF_SMOKE).collect()}
    by_cluster = {}
    for doc, (key, sp) in split.items():
        if doc in comp:
            by_cluster.setdefault(comp[doc], set()).add(sp)
    assert by_cluster, "fixture has no near-dup clusters - test is vacuous"
    assert all(len(s) == 1 for s in by_cluster.values())
    plain = {r.doc_id: r.split
             for r in sampling.train_val_test_split(spark, SF_SMOKE).collect()}
    singles = [d for d in split if d not in comp]
    assert singles and all(split[d][1] == plain[d] for d in singles)


def test_containment_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        dedup.containment_pairs(spark, SF_SMOKE),
        registry.ORACLE["dedup_containment_pairs"],
        SF_SMOKE,
    )


def test_containment_asymmetry_and_jaccard_relation(spark):
    """Containment dominates Jaccard (|A∩B|/|A| ≥ |A∩B|/|A∪B|), and a
    planted short-doc-inside-long-doc pair scores containment 1.0 from
    the short side while its Jaccard stays low."""
    rows = dedup.containment_pairs(spark, SF_SMOKE, threshold=0.0).collect()
    cont = {(r.doc_src, r.doc_dst): r.containment for r in rows}
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, SF_SMOKE, threshold=0.0001).collect()
    }
    checked = 0
    for (a, b), j in jac.items():
        if (a, b) in cont:
            assert cont[(a, b)] >= j - 1e-12
            checked += 1
    assert checked > 0
    # planted pair: a long doc (the concatenation) fully contains a short one
    import pandas as pd
    import tempfile, os
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon",
                "completely different words entirely unrelated content here",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1, 1, 1],
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.to_parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            (r.doc_src, r.doc_dst): r.containment
            for r in dedup.containment_pairs(spark, tmp, threshold=0.9).collect()
        }
    assert got.get((1, 2)) == 1.0
    assert (2, 1) not in got


def test_hashed_features_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        text.hashed_features(spark, SF_SMOKE),
        registry.ORACLE["text_hashed_features"],
        SF_SMOKE,
    )


def test_hashed_features_properties(spark):
    """Per-doc totals reconcile with the token count; buckets stay inside
    the hashed dimension; |feat| never exceeds the bucket's term count
    (signs are ±1)."""
    from redis_dataflow_realtime_analytics_spark.operators.text import (
        FEATURE_HASH_DIM,
        token_stats,
    )

    rows = text.hashed_features(spark, SF_SMOKE).collect()
    assert rows
    per_doc = {}
    for r in rows:
        assert 0 <= r.bucket < FEATURE_HASH_DIM
        assert abs(r.feat) <= r.n_terms
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_terms
    n_tok = {r.doc_id: r.n_tokens for r in token_stats(spark, SF_SMOKE).collect()}
    assert all(per_doc[d] == n_tok[d] for d in per_doc)


def test_zorder_spread_bijective_against_python_reference(spark):
    """The magic-mask Morton spread must equal the bit-by-bit Python
    reference on random 16-bit pairs, and interleaving must be injective
    (Hypothesis-driven, one Spark round-trip for the whole batch)."""
    from hypothesis import given, settings, strategies as st

    from redis_dataflow_realtime_analytics_spark.functions.layout import zorder_key_sql

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 65535), st.integers(0, 65535))
    def collect(a, b):
        pairs.append((a, b))

    collect()
    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.selectExpr("a", "b", f"{zorder_key_sql('a', 'b')} AS z").collect()
    }
    assert all(got[(a, b)] == ref(a, b) for a, b in got)
    assert len(set(got.values())) == len(got), "Morton code collided"


def test_stream_postings_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        registry.QUERIES["stream_postings_ingest"](spark, SF_SMOKE),
        registry.ORACLE["stream_postings_ingest"],
        SF_SMOKE,
    )


def test_stream_postings_feed_bm25_identically(spark):
    """An index built from the stream must reproduce the batch tf frame
    bm25_topk derives internally — same (doc, term, tf) triples, same
    per-doc dl on every posting row."""
    from redis_dataflow_realtime_analytics_spark import registry

    rows = registry.QUERIES["stream_postings_ingest"](spark, SF_SMOKE).collect()
    dls = {}
    tf_sum = {}
    for r in rows:
        dls.setdefault(r.doc_id, set()).add(r.dl)
        tf_sum[r.doc_id] = tf_sum.get(r.doc_id, 0) + r.tf
    # dl is constant per doc and equals the sum of its tfs
    assert all(len(s) == 1 for s in dls.values())
    assert all(next(iter(dls[d])) == tf_sum[d] for d in dls)


def test_bm25_capped_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        registry.QUERIES["text_bm25_topk_capped"](spark, SF_SMOKE),
        registry.ORACLE["text_bm25_topk_capped"],
        SF_SMOKE,
    )


def test_bm25_cap_only_drops_stop_terms(spark):
    """With a cap at or above the max term df, the capped ranking equals
    the exact one — the cap is a pure stop-term filter, not a scorer."""
    exact = {(r.query_id, r.doc_id, r.rank)
             for r in text.bm25_topk(spark, SF_SMOKE).collect()}
    same = {(r.query_id, r.doc_id, r.rank)
            for r in text.bm25_topk(spark, SF_SMOKE, max_term_df=10**9).collect()}
    assert exact == same


def test_kmeans_exact_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.kmeans_exact_centroids(spark, SF_SMOKE),
        registry.ORACLE["kmeans_exact_centroids"],
        SF_SMOKE,
    )


def test_kmeans_exact_descends_and_partitions(spark):
    """Lloyd's invariants on the exact variant: every vector is assigned
    (cluster sizes sum to the corpus), and the quantization-grid inertia
    is non-increasing across iterations."""
    from redis_dataflow_realtime_analytics_spark.operators.similarity import (
        _quantized,
    )

    vecs = {r.vec_id: r.qvec for r in _quantized(spark, SF_SMOKE).collect()}

    def inertia(iters):
        rows = similarity.kmeans_exact_centroids(spark, SF_SMOKE, iters=iters).collect()
        cents = {}
        for r in rows:
            cents.setdefault(r.cid, [0.0] * 64)[r.pos - 1] = r.mean
        ns = {r.cid: r.n for r in rows}
        tot = 0.0
        for v in vecs.values():
            tot += min(
                sum((x - m) ** 2 for x, m in zip(v, c)) for c in cents.values()
            )
        return tot, sum(ns.values())

    i1, n1 = inertia(1)
    i3, n3 = inertia(3)
    assert n1 == len(vecs) and n3 == len(vecs)
    assert i3 <= i1 * (1 + 1e-12)


def test_ivf_exact_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.ann_ivf_exact_topk(spark, SF_SMOKE),
        registry.ORACLE["ann_ivf_exact_topk"],
        SF_SMOKE,
    )


def test_ivf_exact_recall_band(spark):
    """Learned coarse centroids probe 3 of 8 cells; recall vs the exact
    baseline must land well above the scanned fraction (measured 0.68 at
    the smoke SF — learned cells beat the modulo-seeded IVF's 0.3 floor)."""
    exact, got = {}, {}
    for r in similarity.ann_topk_bruteforce(spark, SF_SMOKE, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in similarity.ann_ivf_exact_topk(spark, SF_SMOKE, k=10).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    mean_recall = sum(len(exact[q] & got[q]) / 10 for q in exact) / len(exact)
    assert mean_recall >= 0.4, f"learned-IVF mean recall {mean_recall}"


def test_top_component_exact_matches_oracle(spark):
    from redis_dataflow_realtime_analytics_spark import registry

    compare(
        similarity.embedding_top_component_exact(spark, SF_SMOKE),
        registry.ORACLE["embedding_top_component_exact"],
        SF_SMOKE,
    )


def test_top_component_exact_planted_axis(spark, tmp_path):
    """Same convergence gate as the float variant: vectors concentrated
    along dimension 3 (1-based) -> the exact iterate aligns with that
    axis; the final iterate is unit-norm."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(200):
        v = [rng.uniform(-0.05, 0.05) for _ in range(8)]
        v[2] = rng.uniform(0.8, 1.0) * (1 if i % 2 else -1)
        rows.append((i, [float(x) for x in v], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    comp = {r.pos: r.component
            for r in similarity.embedding_top_component_exact(
                spark, str(tmp_path)).collect()}
    assert abs(comp[3]) > 0.99
    assert all(abs(comp[p]) < 0.1 for p in comp if p != 3)
    assert abs(sum(c * c for c in comp.values()) - 1.0) < 1e-9
