"""Round-6 operator invariants: BPE encoding over the persisted merge
table (train→apply closure)."""

from __future__ import annotations

import pyspark.sql.functions as F

from redis_dataflow_realtime_analytics_spark.operators import text

from .conftest import SF_SMOKE


def test_bpe_encode_reassembles_words(spark):
    """Concatenating a word's final symbols in spos order reproduces the
    original token exactly — encoding is a partition of the word, never
    a lossy rewrite."""
    enc = text.bpe_encode(spark, SF_SMOKE, n_merges=2, doc_mod=20)
    docs = text.spread(text.load(spark, SF_SMOKE, "documents")).where(
        "doc_id % 20 = 0"
    )
    words = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(F.trim(F.lower(F.col("text"))), text.TOKEN_RE)
            ).alias("p0", "w"),
        )
        .where(F.col("w") != "")
        .select("doc_id", (F.col("p0") + 1).alias("wpos"), "w")
    )
    rebuilt = (
        enc.groupBy("doc_id", "wpos")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("spos", "token"))).token
            ).alias("rw")
        )
    )
    bad = (
        words.join(rebuilt, ["doc_id", "wpos"], "full")
        .where((F.col("w") != F.col("rw")) | F.col("w").isNull() | F.col("rw").isNull())
        .count()
    )
    assert bad == 0


def test_bpe_encode_matches_inline_training_symbolization(spark):
    """The persisted-merge application must be bit-identical to the
    symbolization training itself produces — train and apply share
    _bpe_apply, so any drift is a persistence bug."""
    enc = text.bpe_encode(spark, SF_SMOKE, n_merges=2, doc_mod=20)
    merges = text.bpe_merges(spark, SF_SMOKE, n_merges=2)
    assert merges.count() == 2
    # token ids are dense 1..V over the distinct final symbols
    ids = enc.select("token", "token_id").distinct()
    n = ids.count()
    assert ids.agg(F.min("token_id"), F.max("token_id")).first() == (1, n)
