"""End-to-end demo: the whole reference pipeline, Spark-first, in one file.

    generator -> wire JSON -> parse (drop malformed) -> streaming ingest
    (foreachBatch mergeable-partials store) -> dashboard reads
    (visits/users/overlap) -> LLM-data extras (dedup + ANN).

Run:  python examples/end_to_end.py  [sf_dir]  (default /root/testdata/sf0.001)

Every stage here is the same code the driver's correctness gate exercises —
this file just wires the stages together the way the reference deploys them
(loggen -> Dataflow -> Redis -> dashboard), minus the three services.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from redis_dataflow_realtime_analytics_spark.operators import dedup, similarity, timeseries
from redis_dataflow_realtime_analytics_spark.session import get_spark
from redis_dataflow_realtime_analytics_spark.sources import normalize_events, read_events
from redis_dataflow_realtime_analytics_spark.sources.generator import (
    generate_wire_json,
)
from redis_dataflow_realtime_analytics_spark.sources.events import parse_wire_events
from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="end-to-end-demo")

    # 1. generator -> wire JSON -> parse (SRC/G1 + PARSE)
    wire = generate_wire_json(spark, n=1_000)
    parsed = parse_wire_events(wire)
    print(f"[1] generated+parsed wire events: {parsed.count()} rows")

    # 2. streaming ingest over the fixture into the mergeable-partials store
    ev_path = f"{sf_dir}/events.parquet"
    with tempfile.TemporaryDirectory() as tmp:
        sp.run_sketch_ingest(spark, ev_path, f"{tmp}/store", f"{tmp}/ckpt")
        visits = sp.read_visits(spark, f"{tmp}/store")
        uniques = sp.read_uniques_per_variant(spark, f"{tmp}/store")
        print(f"[2] store merge: {visits.count()} minutes, "
              f"{uniques.count()} variants (HLL)")

    # 3. dashboard reads (R2/R3/R5) straight from the events table
    ev = normalize_events(read_events(spark, sf_dir))
    print(f"[3] /visits rows: {timeseries.visits_timeseries(ev).count()}, "
          f"/users rows: {timeseries.users_timeseries(ev).count()}")
    for r in timeseries.variant_overlap(ev).orderBy("variant_a", "variant_b").collect():
        print(f"    overlap {r.variant_a}~{r.variant_b}: {r.overlap}")

    # 4. LLM-data extras over documents/embeddings
    print(f"[4] exact-dup groups: {dedup.exact_dedup_groups(spark, sf_dir).count()}, "
          f"ANN top-k rows: {similarity.ann_topk_bruteforce(spark, sf_dir).count()}")

    # 5. training-corpus assembly: filter -> dedup -> sample -> chunk
    from redis_dataflow_realtime_analytics_spark.operators import sampling, text

    corpus = sampling.train_corpus_pipeline(spark, sf_dir)
    chunks = sampling.chunk_documents(spark, sf_dir)
    terms = text.tfidf_top_terms(spark, sf_dir)
    print(f"[5] corpus docs: {corpus.count()}, chunks: {chunks.count()}, "
          f"tf-idf term rows: {terms.count()}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
