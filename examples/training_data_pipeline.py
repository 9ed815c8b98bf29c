"""End-to-end demo: the training-data curation pipeline, Spark-first.

    documents -> per-doc drop audit (benchmark holdout / quality gate /
    exact dedup / decontamination) -> surviving corpus -> seeded epoch
    shuffle (global training permutation) -> exact token-budget shard
    layout -> shard manifest + mix report

Run:  python examples/training_data_pipeline.py  [sf_dir]
      (default /root/testdata/sf0.001)

Every stage is the same oracle-gated operator the driver's correctness
gate exercises; this file wires them in pipeline order and prints each
stage's governance numbers — what a curator would read before training.
The arrival-path twins (stream_drop_audit, stream_shard_assignment,
stream_ingest_dedup) run the same stages per shipment at ingest.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import dedup, sampling
from redis_dataflow_realtime_analytics_spark.session import get_spark
from redis_dataflow_realtime_analytics_spark.tables import load


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="training-data-pipeline-demo")

    # 1. provenance: why does each document survive or drop?
    audit = dedup.corpus_drop_audit(spark, sf_dir).cache()
    mix = {r.drop_reason: r.n for r in
           audit.groupBy("drop_reason").agg(F.count("*").alias("n")).collect()}
    print(f"[1] drop audit: {mix}")

    # 2. the surviving corpus
    kept = audit.where("drop_reason = 'kept'").select("doc_id")
    docs = load(spark, sf_dir, "documents").join(kept, "doc_id", "left_semi")
    n_kept = docs.count()
    print(f"[2] surviving corpus: {n_kept} docs")

    # 3. seeded global training permutation (epoch 0 order shown)
    shuffled = sampling.epoch_shuffle(spark, sf_dir)
    head = (
        shuffled.where("epoch = 0")
        .join(kept, "doc_id", "left_semi")
        .orderBy("shuffle_pos")
        .limit(5)
        .collect()
    )
    print(f"[3] epoch-0 order head: {[r.doc_id for r in head]}")

    # 4. exact token-budget shard layout + writer manifest
    manifest = sampling.shard_manifest(spark, sf_dir)
    n_shards = manifest.count()
    fill = manifest.agg(F.avg("fill")).collect()[0][0]
    print(f"[4] shard layout: {n_shards} shards, mean fill {fill:.3f}")

    # 5. training-mix governance over the survivors
    by_lang = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"))
        .collect()
    )
    print(f"[5] mix by lang: {[(r.lang, r.n_docs) for r in by_lang]}")
    audit.unpersist()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
