"""Gates for the late-round-4 corpus-diagnostic operators: label-centroid
pairwise cosine, per-source vocabulary Jaccard, and the per-source Zipf
fit — each checked against its DuckDB oracle at SF_SMOKE plus a planted
behavioral case the synthetic corpus alone would not exercise."""

from __future__ import annotations

from redis_dataflow_realtime_analytics_spark.operators import similarity, text

from .conftest import SF_SMOKE
from .oracle import compare


def test_centroid_pairwise_cosine_matches_oracle(spark):
    compare(
        similarity.centroid_pairwise_cosine(spark, SF_SMOKE),
        similarity.oracle_centroid_pairwise_cosine(),
        SF_SMOKE,
    )


def test_centroid_pairwise_cosine_shape_and_bounds(spark):
    from redis_dataflow_realtime_analytics_spark.tables import load

    rows = similarity.centroid_pairwise_cosine(spark, SF_SMOKE).collect()
    k = load(spark, SF_SMOKE, "embeddings").select("label").distinct().count()
    assert len(rows) == k * (k - 1) // 2  # every unordered label pair once
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 - 1e-12 <= r.cos_centroids <= 1.0 + 1e-12


def test_vocab_overlap_matches_oracle(spark):
    compare(
        text.vocab_overlap_between_sources(spark, SF_SMOKE),
        text.oracle_vocab_overlap(),
        SF_SMOKE,
    )


def test_vocab_overlap_identical_and_disjoint_sources(spark, tmp_path):
    rows = [
        (1, "alpha beta gamma", "en", "sA", 1),
        (2, "alpha beta gamma", "en", "sB", 1),  # sB == sA vocab
        (3, "delta epsilon", "en", "sC", 1),  # sC disjoint from both
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r.source_a, r.source_b): r
    for r in text.vocab_overlap_between_sources(spark, str(tmp_path)).collect()
    }
    assert got[("sA", "sB")].jaccard == 1.0
    assert got[("sA", "sB")].n_shared == 3
    # zero-intersection pairs are the headline finding — they must appear
    # with jaccard 0, not vanish from the output
    assert got[("sA", "sC")].jaccard == 0.0
    assert got[("sA", "sC")].n_shared == 0
    assert got[("sB", "sC")].jaccard == 0.0
    assert len(got) == 3  # the full pair grid over 3 sources


def test_zipf_slope_matches_oracle(spark):
    compare(
        text.zipf_slope_by_source(spark, SF_SMOKE),
        text.oracle_zipf_slope(),
        SF_SMOKE,
    )


def test_zipf_slope_on_planted_power_law(spark, tmp_path):
    """A corpus built to follow freq(rank r) = 60/r exactly must fit a
    slope of -1; a flat corpus (all counts equal) has zero variance in y,
    so its slope is 0."""
    zipf_tokens = []
    for r in range(1, 21):
        zipf_tokens += [f"w{r:02d}"] * (60 // r)
    flat = " ".join(f"t{i}" for i in range(30)) + " "
    rows = [
        (1, " ".join(zipf_tokens), "en", "zipfy", 1),
        (2, (flat * 2).strip(), "en", "flat", 1),  # every token count = 2
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: r for r in text.zipf_slope_by_source(spark, str(tmp_path)).collect()}
    # 60/r is only approximately integral; allow the integer-floor jitter
    assert abs(got["zipfy"].zipf_slope - (-1.0)) < 0.1
    # y is constant for the flat source so the OLS numerator cancels;
    # float summation order leaves at most ulp-level residue
    assert abs(got["flat"].zipf_slope) < 1e-9
    assert got["flat"].n_terms == 30


def test_zipf_slope_deterministic_under_repartition(spark):
    """The slope must not depend on partition-local float summation order:
    force genuinely different partitionings via shuffle-partition counts."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = {
            r.source: r.zipf_slope
            for r in text.zipf_slope_by_source(spark, SF_SMOKE).collect()
        }
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {
            r.source: r.zipf_slope
            for r in text.zipf_slope_by_source(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert set(a) == set(b)
    for s in a:
        assert abs(a[s] - b[s]) < 1e-9, s
