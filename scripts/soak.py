"""Scale-up soak: measure the core operators at 10-100x the bench SF.

Generates synthetic inputs with the engine's own deterministic generator
(sources.generator) — no dependence on driver fixtures — and times the
reference-parity grains, streaming replay, and the dedup family at sizes
that expose super-linear behavior. Records events/s so scaling factors are
directly comparable with BASELINE.md.

Usage:  python scripts/soak.py [n_events] [doc_multiplier]
Prints one JSON line.

Heap sizing: above ~15 M events set SPARK_DRIVER_MEMORY=48g — the
streaming symmetric-hash-join state for a full-history replay plus the
section sequence exceeds the 16 g default (observed OOM at 30 M; the
session factory reads the env var before JVM start).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import dedup
from redis_dataflow_realtime_analytics_spark.operators.metrics import approx_uniques
from redis_dataflow_realtime_analytics_spark.session import get_spark
from redis_dataflow_realtime_analytics_spark.sources.generator import generate_events


def main(n_events: int = 10_000_000, doc_mult: int = 20) -> None:
    spark = get_spark(app_name="soak")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {}

    only = {
        x for x in os.environ.get("SPARK_GRAFT_SOAK_SECTIONS", "").split(",") if x
    }

    def section(name: str, fn) -> None:
        """Run one soak section; a failure records the error instead of
        losing every other section's numbers (a 30M-event streaming join
        can exhaust a local JVM - the batch numbers must still print).
        SPARK_GRAFT_SOAK_SECTIONS=a,b,c restricts the run to named
        sections (targeted A/Bs at multiple scales without paying for
        the whole ladder)."""
        if only and name not in only:
            return
        try:
            fn()
        except Exception as ex:  # noqa: BLE001 - diagnostic harness
            out[f"{name}_error"] = repr(ex)[:200]

    with tempfile.TemporaryDirectory() as tmp:
        # --- events at n_events (generator -> parquet, like a real ingest) ---
        ev_path = f"{tmp}/events"
        t0 = time.perf_counter()
        generate_events(spark, n=n_events).write.mode("overwrite").parquet(ev_path)
        out["generate_write_s"] = round(time.perf_counter() - t0, 2)

        ev = spark.read.parquet(ev_path).select(
            F.col("uid").alias("user_id"),
            "experiment_id",
            "variant",
            F.col("timestamp").alias("ts"),
        )
        for name, df in {
            "w1_visits": ev.groupBy(F.date_trunc("minute", "ts")).count(),
            "w2_ev_uniques": ev.groupBy(
                F.date_trunc("minute", "ts"), "experiment_id", "variant"
            ).agg(F.count_distinct("user_id")),
            "w11_uniques": ev.groupBy(F.date_trunc("minute", "ts")).agg(
                F.count_distinct("user_id")
            ),
            "w11_approx": ev.groupBy(F.date_trunc("minute", "ts")).agg(
                approx_uniques("user_id")
            ),
        }.items():
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out[f"{name}_s"] = round(dt, 2)
            out[f"{name}_events_per_s"] = int(n_events / dt)

        # --- sketch error bands at n_events (Theta overlap + KLL quantiles) --
        # The registry's theta/KLL keys are rows-only (sketch estimates have
        # no exact SQL oracle); their error-band claims are gated by pytest
        # at test SF. These sections back the same claims at soak scale:
        # estimate vs exact, max relative error recorded.
        # Above this, the EXACT verification joins (distinct pair self-join,
        # exact percentiles) thrash the single local JVM's heap under 32
        # concurrent tasks; the sketch paths themselves still run and time.
        # Error bands are a property of sketch size, not input size, so the
        # ≤cap runs carry the estimate-vs-exact evidence.
        exact_verify = n_events <= 15_000_000

        def _theta_overlap() -> None:
            t0 = time.perf_counter()
            sk = ev.groupBy("variant").agg(F.theta_sketch_agg("user_id").alias("sk"))
            est = (
                sk.alias("a")
                .join(sk.alias("b"), F.col("a.variant") < F.col("b.variant"))
                .select(
                    F.col("a.variant").alias("va"),
                    F.col("b.variant").alias("vb"),
                    F.theta_sketch_estimate(
                        F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
                    ).alias("est"),
                )
            ).collect()
            out["theta_overlap_s"] = round(time.perf_counter() - t0, 2)
            out["theta_overlap_pairs"] = len(est)
            if not exact_verify:
                out["theta_overlap_max_rel_err"] = "skipped (exact join > heap cap)"
                return
            du = ev.select("variant", "user_id").distinct()
            exact = {
                (r.va, r.vb): r.n
                for r in du.alias("a")
                .join(
                    du.alias("b"),
                    (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.variant") < F.col("b.variant")),
                )
                .groupBy(
                    F.col("a.variant").alias("va"), F.col("b.variant").alias("vb")
                )
                .agg(F.count("*").alias("n"))
                .collect()
            }
            errs = [
                abs(r.est - exact.get((r.va, r.vb), 0)) / max(exact.get((r.va, r.vb), 0), 1)
                for r in est
            ]
            out["theta_overlap_max_rel_err"] = round(max(errs), 4) if errs else None

        section("theta_overlap", _theta_overlap)

        def _kll_quantiles() -> None:
            # synthetic value column (generator events carry none): uniform
            # doubles derived from uid — rank error ≈ value error, so KLL's
            # published ~1.7% rank-error bound is directly checkable.
            vev = ev.withColumn(
                "value", (F.pmod(F.xxhash64("user_id", "ts"), F.lit(100000)) / 1000.0)
            )
            t0 = time.perf_counter()
            est = (
                vev.groupBy("variant")
                .agg(F.kll_sketch_agg_double(F.col("value")).alias("sk"))
                .select(
                    "variant",
                    F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
                    F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
                    F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
                )
                .collect()
            )
            out["kll_quantiles_s"] = round(time.perf_counter() - t0, 2)
            if not exact_verify:
                out["kll_quantiles_max_rel_err"] = "skipped (exact percentile > heap cap)"
                return
            exact = {
                r.variant: r
                for r in vev.groupBy("variant")
                .agg(
                    F.expr("percentile(value, 0.5)").alias("p50"),
                    F.expr("percentile(value, 0.9)").alias("p90"),
                    F.expr("percentile(value, 0.99)").alias("p99"),
                )
                .collect()
            }
            errs = [
                abs(getattr(r, q) - getattr(exact[r.variant], q))
                / max(abs(getattr(exact[r.variant], q)), 1e-9)
                for r in est
                for q in ("p50", "p90", "p99")
            ]
            out["kll_quantiles_max_rel_err"] = round(max(errs), 4) if errs else None

        section("kll_quantiles", _kll_quantiles)

        def _cms_heavy_hitters() -> None:
            # Count-min at soak scale: build the depth×width cell state over
            # all events, probe every distinct key, and (at ≤cap) check the
            # Cormode-Muthukrishnan bound — max overestimate ≤ ε·N with
            # ε = e/width — against exact per-key counts. Error is a
            # property of the GEOMETRY, not the input size, so the bound
            # holding at ~100× bench SF is the scale evidence the rows-only
            # CMS keys cite.
            from redis_dataflow_realtime_analytics_spark.operators.metrics import (
                CMS_WIDTH,
                cms_sketch,
                heavy_hitter_users_cms,
            )

            t0 = time.perf_counter()
            cms_sketch(ev).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out["cms_build_s"] = round(dt, 2)
            out["cms_build_events_per_s"] = int(n_events / dt)
            t0 = time.perf_counter()
            hh = heavy_hitter_users_cms(ev, phi=0.0005)
            out["cms_hh_rows"] = hh.count()
            out["cms_probe_s"] = round(time.perf_counter() - t0, 2)
            if exact_verify:
                est = heavy_hitter_users_cms(ev, phi=0.0)
                exact = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
                over = (
                    est.join(exact, "user_id")
                    .agg(
                        F.max(F.col("est_count") - F.col("true_n")).alias("max_over"),
                        F.min(F.col("est_count") - F.col("true_n")).alias("min_over"),
                    )
                    .first()
                )
                out["cms_max_overestimate"] = int(over.max_over)
                out["cms_min_overestimate"] = int(over.min_over)  # ≥0 = no underestimate
                out["cms_eps_n_bound"] = int(2.718281828 / CMS_WIDTH * n_events)

        section("cms_heavy_hitters", _cms_heavy_hitters)

        # --- streaming interval join at n_events (state-partition sizing) ---
        # Same watermarked stream-stream join shape as stream_click_error_join,
        # replayed over the generated events; run at two state-partition
        # counts to demonstrate the sizing rule (volume, not cores).
        import uuid as _uuid

        gen_schema = spark.read.parquet(ev_path).schema

        def _stream_join(parts: int):
            def run() -> None:
                os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = str(parts)
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                sev = spark.readStream.schema(gen_schema).parquet(ev_path)
                clicks = (
                    sev.where(F.col("variant").isin("default", "1"))
                    .select(
                        F.col("uid").alias("click_user"),
                        F.col("timestamp").alias("click_ts"),
                    )
                    .withWatermark("click_ts", "10 minutes")
                )
                errors = (
                    sev.where(F.col("variant").isin("2", "3"))
                    .select(
                        F.col("uid").alias("error_user"),
                        F.col("timestamp").alias("error_ts"),
                    )
                    .withWatermark("error_ts", "10 minutes")
                )
                joined = clicks.join(
                    errors,
                    F.expr(
                        "click_user = error_user AND error_ts > click_ts "
                        "AND error_ts <= click_ts + interval 5 minutes"
                    ),
                )
                t0 = time.perf_counter()
                q = (
                    joined.writeStream.format("noop")
                    .option("checkpointLocation", f"{tmp}/ck_{_uuid.uuid4().hex}")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                dt = time.perf_counter() - t0
                out[f"stream_join_p{parts}_s"] = round(dt, 2)
                out[f"stream_join_p{parts}_events_per_s"] = int(n_events / dt)

            return run

        for parts in (8, 32):
            section(f"stream_join_p{parts}", _stream_join(parts))
        os.environ.pop("SPARK_GRAFT_STATE_PARTITIONS", None)
        spark.conf.set(
            "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

        # --- documents at doc_mult x sf0.1 (dedup family) --------------------
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        big = docs.crossJoin(spark.range(doc_mult).select(F.col("id").alias("rep")))
        big = big.select(
            (F.col("doc_id") * doc_mult + F.col("rep")).alias("doc_id"),
            # perturb replicas so near-dup structure stays realistic
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"), F.col("rep").cast("string")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        doc_path = f"{tmp}/documents/documents.parquet"
        big.write.mode("overwrite").parquet(doc_path)
        n_docs = spark.read.parquet(doc_path).count()
        out["n_docs"] = n_docs

        sf_dir = f"{tmp}/documents"  # tables.load reads <dir>/documents.parquet
        for name, fn in {
            "dedup_exact": lambda: dedup.exact_dedup_groups(spark, sf_dir),
            "minhash_pairs": lambda: dedup.minhash_neardup_pairs(spark, sf_dir),
            "simhash_pairs": lambda: dedup.simhash_neardup_pairs(spark, sf_dir),
            "jaccard_capped": lambda: dedup.ngram_jaccard_pairs(
                spark, sf_dir, max_shingle_df=200
            ),
        }.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out[f"{name}_s"] = round(dt, 2)
            out[f"{name}_docs_per_s"] = int(n_docs / dt)

        # --- substring-level span dedup + int8 ANN at soak scale --------------
        def _spans() -> None:
            t0 = time.perf_counter()
            dedup.duplicate_spans(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            out["duplicate_spans_s"] = round(dt, 2)
            out["duplicate_spans_docs_per_s"] = int(n_docs / dt)

        section("duplicate_spans", _spans)

        def _int8() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import similarity

            t0 = time.perf_counter()
            similarity.ann_topk_int8(spark, "/root/testdata/sf0.1").write.mode(
                "overwrite"
            ).format("noop").save()
            out["ann_int8_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            similarity.ann_topk_bruteforce(spark, "/root/testdata/sf0.1").write.mode(
                "overwrite"
            ).format("noop").save()
            out["ann_exact_s"] = round(time.perf_counter() - t0, 2)

        section("ann_int8_vs_exact", _int8)

        # --- real P6 decode throughput at n_docs ------------------------------
        from redis_dataflow_realtime_analytics_spark.operators import multimodal

        def _p6() -> None:
            t0 = time.perf_counter()
            multimodal.decode_features(
                multimodal.with_image_blob(spark, sf_dir), fake=False
            ).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out["p6_decode_s"] = round(dt, 2)
            out["p6_decode_docs_per_s"] = int(n_docs / dt)

        section("p6_decode", _p6)

        # --- LSH candidates -> exact verify -> components at n_docs ----------
        def _lsh() -> None:
            t0 = time.perf_counter()
            dedup.lsh_components(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            out["lsh_components_s"] = round(dt, 2)
            out["lsh_components_docs_per_s"] = int(n_docs / dt)

        section("lsh_components", _lsh)

        # --- graph triangles over the capped near-dup edges at n_docs --------
        # (df-capped edges, like jaccard_capped above: the soak corpus is a
        # doc_mult-fold duplication, so uncapped stop-shingles explode).
        def _triangles() -> None:
            t0 = time.perf_counter()
            dedup.neardup_triangles(
                spark, sf_dir, threshold=0.5, max_shingle_df=200
            ).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out["triangles_s"] = round(dt, 2)
            out["triangles_docs_per_s"] = int(n_docs / dt)

        section("triangles", _triangles)

        # --- BM25 shingle retrieval at n_docs --------------------------------
        def _bm25() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import text

            t0 = time.perf_counter()
            text.bm25_topk(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            out["bm25_s"] = round(dt, 2)
            out["bm25_docs_per_s"] = int(n_docs / dt)

        section("bm25", _bm25)

        # --- binary / PQ compression legs (sf0.1 embeddings, same convention
        # as the int8 section: the fixture embedding table is the corpus) ----
        def _binary_ann() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import similarity

            for nm, fn in {
                "ann_hamming": lambda: similarity.ann_topk_hamming(
                    spark, "/root/testdata/sf0.1"
                ),
                "ann_hamming_rerank": lambda: similarity.ann_hamming_rerank_topk(
                    spark, "/root/testdata/sf0.1"
                ),
                "ann_pq": lambda: similarity.ann_topk_pq(
                    spark, "/root/testdata/sf0.1"
                ),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                out[f"{nm}_s"] = round(time.perf_counter() - t0, 2)

        section("binary_ann", _binary_ann)

        # --- bloom-pruned vs exact decontamination at n_docs ------------------
        # The exact plan broadcasts benchmark shingle STRINGS; the bloom twin
        # broadcasts a bitmap and pre-filters corpus shingles by integer
        # hashing. Also records the prune ratio (corpus shingles surviving
        # the probes / total) — the number that decides the 100 TB win.
        def _bloom_decon() -> None:
            t0 = time.perf_counter()
            dedup.decontamination_hits(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            out["decon_exact_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            dedup.decontamination_hits_bloom(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            out["decon_bloom_s"] = round(time.perf_counter() - t0, 2)
            # prune ratio on the same corpus
            from redis_dataflow_realtime_analytics_spark.tables import load, spread

            docs_df = spread(load(spark, sf_dir, "documents"))
            is_bench = F.col("doc_id") % dedup.DECON_MOD == 0
            corpus_sh = docs_df.where(~is_bench).select(
                F.explode(dedup._shingle_array(dedup.DECON_K)).alias("shingle")
            )
            total = corpus_sh.count()
            bench_sh = docs_df.where(is_bench).select(
                F.explode(dedup._shingle_array(dedup.DECON_K)).alias("shingle")
            )
            probes = []
            for seed in range(dedup.BLOOM_N_HASHES):
                word, mask = dedup._bloom_word_bit(seed, dedup.BLOOM_M_BITS)
                probes.append(F.struct(word.alias("word"), mask.alias("mask")))
            bitmap = (
                bench_sh.select(F.explode(F.array(*probes)).alias("p"))
                .groupBy(F.col("p.word").alias("word"))
                .agg(F.bit_or("p.mask").alias("bits"))
                .localCheckpoint()
            )
            cand = corpus_sh
            for seed in range(dedup.BLOOM_N_HASHES):
                word, mask = dedup._bloom_word_bit(seed, dedup.BLOOM_M_BITS)
                bm = F.broadcast(
                    bitmap.withColumnRenamed("word", f"w{seed}").withColumnRenamed(
                        "bits", f"bits{seed}"
                    )
                )
                cand = (
                    cand.withColumn(f"p{seed}", word)
                    .join(bm, F.col(f"p{seed}") == F.col(f"w{seed}"))
                    .where(F.col(f"bits{seed}").bitwiseAND(mask) != 0)
                    .drop(f"p{seed}", f"w{seed}", f"bits{seed}")
                )
            surviving = cand.count()
            out["decon_corpus_shingles"] = total
            out["decon_bloom_survivors"] = surviving
            out["decon_bloom_prune_ratio"] = round(1 - surviving / total, 4)

        section("bloom_decontamination", _bloom_decon)

        # --- star-rounds CC vs propagation CC on the soak pair graph ----------
        def _star_cc() -> None:
            edges = dedup.lsh_exact_jaccard_pairs(spark, sf_dir).select(
                "doc_a", "doc_b"
            ).localCheckpoint()
            t0 = time.perf_counter()
            a = dedup.connected_components(edges)
            na = a.count()
            out["cc_propagation_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            b = dedup.connected_components_star(edges)
            nb = b.count()
            out["cc_star_s"] = round(time.perf_counter() - t0, 2)
            out["cc_nodes"] = na
            out["cc_star_equal"] = bool(
                na == nb and a.exceptAll(b).limit(1).count() == 0
            )

        section("star_cc", _star_cc)

        # --- LEFT OUTER stream-stream join at n_events ------------------------
        # The outer variant's extra cost over the inner join is eviction:
        # every unmatched click is held in the state store until the
        # watermark proves no match can arrive, then emitted as a NULL row.
        # Two far-future heartbeat files appended to the replay dir force
        # that final eviction (registry harness rule); the section records
        # wall time AND the state rows left after the last batch — the
        # bounded-state claim is that eviction drains the real rows and
        # only the ≤4 heartbeat rows remain.
        def _outer_join() -> None:
            import shutil

            import pyarrow as pa
            import pyarrow.parquet as pq

            replay = f"{tmp}/outer_replay"
            shutil.copytree(ev_path, replay)
            agg = spark.read.parquet(ev_path).agg(F.max("timestamp")).first()
            last_ts = agg[0]
            from datetime import timedelta

            # uid is a STRING in the generator's schema (reference parity)
            hb_schema = pa.schema(
                [
                    ("uid", pa.string()),
                    ("experiment_id", pa.string()),
                    ("variant", pa.string()),
                    ("timestamp", pa.timestamp("us")),
                ]
            )
            base = time.time()
            for j in range(2):
                hb = [
                    {
                        "uid": "heartbeat",
                        "experiment_id": "hb",
                        "variant": v,
                        "timestamp": last_ts + timedelta(days=1, minutes=j),
                    }
                    for v in ("default", "2")
                ]
                p = f"{replay}/zz_heartbeat_{j}.parquet"
                pq.write_table(pa.Table.from_pylist(hb, schema=hb_schema), p)
                os.utime(p, (base + 2 * j, base + 2 * j))

            os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = "8"
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            sev = spark.readStream.schema(gen_schema).parquet(replay)
            clicks = (
                sev.where(F.col("variant").isin("default", "1"))
                .select(
                    F.col("uid").alias("click_user"),
                    F.col("timestamp").alias("click_ts"),
                )
                .withWatermark("click_ts", "10 minutes")
            )
            errors = (
                sev.where(F.col("variant").isin("2", "3"))
                .select(
                    F.col("uid").alias("error_user"),
                    F.col("timestamp").alias("error_ts"),
                )
                .withWatermark("error_ts", "10 minutes")
            )
            joined = clicks.join(
                errors,
                F.expr(
                    "click_user = error_user AND error_ts > click_ts "
                    "AND error_ts <= click_ts + interval 5 minutes"
                ),
                "leftOuter",
            )
            t0 = time.perf_counter()
            q = (
                joined.writeStream.format("noop")
                .option("checkpointLocation", f"{tmp}/ck_{_uuid.uuid4().hex}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0
            out["stream_outer_join_s"] = round(dt, 2)
            out["stream_outer_join_events_per_s"] = int(n_events / dt)
            prog = q.lastProgress
            if prog and prog.get("stateOperators"):
                out["stream_outer_join_state_rows_after_flush"] = prog[
                    "stateOperators"
                ][0]["numRowsTotal"]
            os.environ.pop("SPARK_GRAFT_STATE_PARTITIONS", None)
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )

        section("stream_outer_join", _outer_join)

        # --- corpus-mixing diagnostics at n_docs ------------------------------
        def _mix_diag() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import text

            t0 = time.perf_counter()
            text.vocab_overlap_between_sources(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            out["vocab_overlap_s"] = round(dt, 2)
            out["vocab_overlap_docs_per_s"] = int(n_docs / dt)
            t0 = time.perf_counter()
            text.zipf_slope_by_source(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            out["zipf_slope_s"] = round(dt, 2)
            out["zipf_slope_docs_per_s"] = int(n_docs / dt)

        section("mix_diagnostics", _mix_diag)

        # --- quality-gate stack + collocations at n_docs ----------------------
        # token_entropy is the heaviest new signal (one (doc_id, token)
        # count shuffle); corpus_quality_gate composes three signal frames;
        # collocations adds the bigram explode + integer top-k.
        def _quality_gates() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import text

            for nm, fn in {
                "token_entropy": lambda: text.token_entropy(spark, sf_dir),
                "quality_gate": lambda: text.corpus_quality_gate(spark, sf_dir),
                "collocations_pmi": lambda: text.collocations_pmi(spark, sf_dir),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{nm}_s"] = round(dt, 2)
                out[f"{nm}_docs_per_s"] = int(n_docs / dt)

        section("quality_gates", _quality_gates)

        # --- power iteration at replicated embedding scale --------------------
        # Scale check for the O(width)-state-per-iteration claim: replicate
        # sf0.1's embeddings doc_mult/4 x and time 4 iterations end to end.
        def _power_iteration() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import similarity

            emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
            rep = max(doc_mult // 4, 1)
            big_emb = emb.crossJoin(
                spark.range(rep).select(F.col("id").alias("rep"))
            ).select(
                (F.col("vec_id") * rep + F.col("rep")).alias("vec_id"),
                "embedding",
                "label",
            )
            emb_path = f"{tmp}/embeddings/embeddings.parquet"
            big_emb.write.mode("overwrite").parquet(emb_path)
            n_vecs = spark.read.parquet(emb_path).count()
            t0 = time.perf_counter()
            similarity.embedding_top_component(
                spark, f"{tmp}/embeddings", iters=4
            ).collect()
            dt = time.perf_counter() - t0
            out["power_iter_n_vecs"] = n_vecs
            out["power_iter4_s"] = round(dt, 2)
            out["power_iter_vecs_per_s_per_iter"] = int(n_vecs * 4 / dt)
            t0 = time.perf_counter()
            similarity.embedding_top_subspace(
                spark, f"{tmp}/embeddings", r=4, iters=4
            ).count()
            out["block_iter4_r4_s"] = round(time.perf_counter() - t0, 2)

        section("power_iteration", _power_iteration)

        # --- r5 additions: boundary packer, k-core peel, intensity
        # histogram, streaming decontamination — each at n_docs ------------
        def _r5_ops() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import (
                multimodal,
                sampling,
            )

            t0 = time.perf_counter()
            sampling.pack_documents_boundary(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            out["pack_boundary_s"] = round(dt, 2)
            out["pack_boundary_docs_per_s"] = int(n_docs / dt)

            # peel methodology matches the CC sections: LSH-bucketed
            # edges, pre-checkpointed, so the number is the peel itself
            # (end-to-end on uncapped exact pairs times the quadratic
            # pair generation instead: 73 s at this SF, r5 measured)
            kedges = dedup.lsh_exact_jaccard_pairs(spark, sf_dir).select(
                "doc_a", "doc_b"
            ).localCheckpoint()
            t0 = time.perf_counter()
            dedup.kcore_peel(kedges).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out["kcore_peel_s"] = round(dt, 2)
            out["kcore_docs_per_s"] = int(n_docs / dt)

            t0 = time.perf_counter()
            multimodal.image_histogram(
                multimodal.with_image_blob(spark, sf_dir)
            ).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            out["image_histogram_s"] = round(dt, 2)
            out["image_histogram_docs_per_s"] = int(n_docs / dt)

        section("r5_ops", _r5_ops)

        def _stream_decon() -> None:
            from redis_dataflow_realtime_analytics_spark.streaming import (
                pipeline as sp,
            )

            t0 = time.perf_counter()
            n_clean = sp.stream_decontamination_gate(
                spark, f"{sf_dir}/documents.parquet"
            ).count()
            dt = time.perf_counter() - t0
            out["stream_decon_s"] = round(dt, 2)
            out["stream_decon_docs_per_s"] = int(n_docs / dt)
            out["stream_decon_accepted"] = n_clean

        section("stream_decontamination", _stream_decon)

        # --- r6 additions: training permutation, pipeline drop audit,
        # quantile normalization, RAKE, sentence chunking (n_docs scale),
        # and the continuous-aggregate hierarchy (n_events scale) --------
        def _r6_ops() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import (
                relational,
                sampling,
                text,
            )
            from redis_dataflow_realtime_analytics_spark.operators.metrics import (
                hierarchical_time_rollup,
            )

            for name, fn in {
                "epoch_shuffle": lambda: sampling.epoch_shuffle(spark, sf_dir),
                "drop_audit": lambda: dedup.corpus_drop_audit(spark, sf_dir),
                "quantile_norm": lambda: sampling.quality_quantile_normalized(
                    spark, sf_dir
                ),
                "rake_keyphrases": lambda: text.rake_keyphrases(spark, sf_dir),
                "sentence_chunks": lambda: sampling.chunk_documents_sentences(
                    spark, sf_dir
                ),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_docs_per_s"] = int(n_docs / dt)

            rev = ev.withColumn(
                "value", (F.xxhash64("user_id") % 1000).cast("double") / 10.0
            )
            t0 = time.perf_counter()
            hierarchical_time_rollup(rev).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            out["hier_rollup_s"] = round(dt, 2)
            out["hier_rollup_events_per_s"] = int(n_events / dt)

        section("r6_ops", _r6_ops)

        # --- r7 soak refresh (VERDICT r6 item 5): the r6-new families that
        # only had fixture-scale timings — perceptron train/serve, ED-Join
        # entity resolution, BPE closure — plus the r7-new ops (maximal
        # duplicated spans, late-arrival audit). Doc-family ops run at
        # doc_mult x sf0.1; IVFPQ runs on the (unscaled) embeddings table
        # like the other ANN sections; the late audit replays the
        # n_events-scale generated table.
        def _r7_ops() -> None:
            from redis_dataflow_realtime_analytics_spark.operators import (
                classifier,
                similarity,
                text,
            )

            for name, fn in {
                "perceptron_train_scores": lambda: classifier.perceptron_scores(
                    spark, sf_dir
                ),
                # first call trains + persists the artifact (cold; the tmp
                # fixture is always fresh), second call is the warm serve
                "perceptron_persisted_cold": (
                    lambda: classifier.perceptron_persisted_scores(spark, sf_dir)
                ),
                "perceptron_persisted_warm": (
                    lambda: classifier.perceptron_persisted_scores(spark, sf_dir)
                ),
                "entity_matches": lambda: dedup.entity_match_pairs(spark, sf_dir),
                "entity_resolved": lambda: dedup.entity_resolve(spark, sf_dir),
                "bpe_merges": lambda: text.bpe_merges(spark, sf_dir),
                "bpe_encode": lambda: text.bpe_encode(spark, sf_dir),
                "maximal_spans": lambda: dedup.maximal_duplicate_spans(
                    spark, sf_dir
                ),
                "cut_spans": lambda: dedup.cut_duplicate_spans(spark, sf_dir),
                "cut_spans_keep_first": (
                    lambda: dedup.cut_duplicate_spans_keep_first(spark, sf_dir)
                ),
                # portable-permutation MinHash vs the xxhash64 scale path
                # (minhash_pairs above): md5 once per shingle shared by 16
                # perms vs 32 per-perm xxhash64 calls — sf0.1 benched the
                # portable twin FASTER (1.45 vs 1.73 s); confirm at soak
                # scale where the agg/join stages dominate differently
                "minhash_portable_pairs": lambda: dedup.minhash_portable_pairs(
                    spark, sf_dir
                ),
                "incremental_neardup_portable": (
                    lambda: dedup.incremental_neardup_portable(spark, sf_dir)
                ),
                "lsh_exact_jaccard_portable": (
                    lambda: dedup.lsh_exact_jaccard_portable(spark, sf_dir)
                ),
                "simhash_portable_pairs": (
                    lambda: dedup.simhash_portable_pairs(spark, sf_dir)
                ),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_docs_per_s"] = int(n_docs / dt)

            for name, fn in {
                "ivfpq_topk": lambda: similarity.ann_ivfpq_topk(
                    spark, "/root/testdata/sf0.1"
                ),
                "ivfpq_persisted_topk": lambda: similarity.ann_ivfpq_persisted_topk(
                    spark, "/root/testdata/sf0.1"
                ),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                out[f"{name}_s"] = round(time.perf_counter() - t0, 2)

        section("r7_ops", _r7_ops)

        def _r7_late_audit() -> None:
            from redis_dataflow_realtime_analytics_spark.streaming import (
                pipeline as sp,
            )

            # single-file events parquet for the replay writer
            one = f"{tmp}/events_one.parquet"
            spark.read.parquet(ev_path).withColumn(
                "event_id", F.xxhash64("uid", "timestamp")
            ).select(
                "event_id",
                F.col("timestamp").alias("ts"),
                F.col("uid").cast("long").alias("user_id"),
                F.col("variant").alias("event_type"),
                F.lit(1.0).alias("value"),
                F.concat(F.lit('{"k": "'), "experiment_id", F.lit('"}')).alias(
                    "props"
                ),
            ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events_one")
            import glob as _glob
            import shutil

            shutil.move(
                _glob.glob(f"{tmp}/events_one/part-*.parquet")[0], one
            )
            t0 = time.perf_counter()
            sp.stream_late_arrivals_audit(spark, one).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            out["late_audit_s"] = round(dt, 2)
            out["late_audit_events_per_s"] = int(n_events / dt)

        section("r7_late_audit", _r7_late_audit)

        def _r8_ops() -> None:
            """r8 additions: the portable weighted/OPH twins (doc-family
            slope rows), the duplicate-delivery audit, and the
            transformWithState pair (vs their legacy siblings)."""
            from redis_dataflow_realtime_analytics_spark.streaming import (
                pipeline as sp,
                stateful,
            )

            for name, fn in {
                "weighted_portable_pairs": (
                    lambda: dedup.minhash_weighted_portable_pairs(spark, sf_dir)
                ),
                "oph_portable_pairs": (
                    lambda: dedup.minhash_oph_portable_pairs(spark, sf_dir)
                ),
            }.items():
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_docs_per_s"] = int(n_docs / dt)

            # single-file events parquet (same shape the r7 late-audit
            # section builds) for the replay-based ops
            one = f"{tmp}/events_one_r8.parquet"
            spark.read.parquet(ev_path).withColumn(
                "event_id", F.xxhash64("uid", "timestamp")
            ).select(
                "event_id",
                F.col("timestamp").alias("ts"),
                F.col("uid").cast("long").alias("user_id"),
                F.col("variant").alias("event_type"),
                F.lit(1.0).alias("value"),
                F.concat(F.lit('{"k": "'), "experiment_id", F.lit('"}')).alias(
                    "props"
                ),
            ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events_one_r8")
            import glob as _glob
            import shutil

            shutil.move(
                _glob.glob(f"{tmp}/events_one_r8/part-*.parquet")[0], one
            )

            t0 = time.perf_counter()
            sp.stream_duplicate_delivery_audit(spark, one).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            out["dup_delivery_audit_s"] = round(dt, 2)
            out["dup_delivery_audit_events_per_s"] = int(n_events / dt)

            # Legacy legs have no shim dependency — run them regardless
            # so a TWS-less host still records the baselines (r9 advice).
            r8_tws_ok = stateful.tws_available()
            if not r8_tws_ok:
                out["r8_tws_skipped"] = "tws_unavailable"
            for name, fn in {
                "tws_uniques": (
                    lambda: stateful.stream_exact_uniques_per_variant_tws(
                        spark, one, max_files_per_trigger=4
                    )
                ),
                "legacy_uniques": (
                    lambda: stateful.stream_exact_uniques_per_variant(
                        spark, one, max_files_per_trigger=4
                    )
                ),
                "tws_sessions": (
                    lambda: stateful.stream_sessions_ttl_tws(
                        spark, one, max_files_per_trigger=4
                    )
                ),
                "legacy_sessions": (
                    lambda: stateful.stream_sessions_ttl(
                        spark, one, max_files_per_trigger=4
                    )
                ),
            }.items():
                if name.startswith("tws_") and not r8_tws_ok:
                    continue
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_events_per_s"] = int(n_events / dt)

        section("r8_ops", _r8_ops)

        def _r9_state_ab() -> None:
            """r9: the TWS uniques membership A/B (MapState containsKey
            vs the r8 ListState full-read vs the legacy whole-set
            rewrite), each with a PINNED checkpoint so the state store
            itself can be weighed afterwards — the state-size claim in
            stateful.py's docstring, measured (VERDICT r8 item 6)."""
            import subprocess

            from redis_dataflow_realtime_analytics_spark.streaming import (
                stateful,
            )

            # Only the two TWS formulations depend on the protobuf shim;
            # the legacy applyInPandasWithState legs run regardless so a
            # shim-less host still records the baseline rows (r9 advice).
            tws_ok = stateful.tws_available()
            if not tws_ok:
                out["r9_tws_skipped"] = "tws_unavailable"
            one = f"{tmp}/events_one_r8.parquet"  # built by _r8_ops
            if not os.path.isfile(one):  # section-filtered run: build it
                import glob as _glob
                import shutil

                spark.read.parquet(ev_path).withColumn(
                    "event_id", F.xxhash64("uid", "timestamp")
                ).select(
                    "event_id",
                    F.col("timestamp").alias("ts"),
                    F.col("uid").cast("long").alias("user_id"),
                    F.col("variant").alias("event_type"),
                    F.lit(1.0).alias("value"),
                    F.concat(
                        F.lit('{"k": "'), "experiment_id", F.lit('"}')
                    ).alias("props"),
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{tmp}/events_one_r8"
                )
                shutil.move(
                    _glob.glob(f"{tmp}/events_one_r8/part-*.parquet")[0], one
                )

            def _du(path: str) -> int:
                try:
                    r = subprocess.run(
                        ["du", "-sb", path], capture_output=True, text=True
                    )
                    return int(r.stdout.split()[0])
                except Exception:
                    return -1

            for name, fn in {
                "tws_uniques_map": (
                    lambda ck: stateful.stream_exact_uniques_per_variant_tws(
                        spark, one, max_files_per_trigger=4,
                        state_impl="map", checkpoint_dir=ck,
                    )
                ),
                "tws_uniques_list": (
                    lambda ck: stateful.stream_exact_uniques_per_variant_tws(
                        spark, one, max_files_per_trigger=4,
                        state_impl="list", checkpoint_dir=ck,
                    )
                ),
                "legacy_uniques_ckpt": (
                    lambda ck: stateful.stream_exact_uniques_per_variant(
                        spark, one, max_files_per_trigger=4,
                        checkpoint_dir=ck,
                    )
                ),
            }.items():
                if name.startswith("tws_") and not tws_ok:
                    continue
                ck = f"{tmp}/ckpt_{name}"
                t0 = time.perf_counter()
                fn(ck).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_events_per_s"] = int(n_events / dt)
                out[f"{name}_state_bytes"] = _du(f"{ck}/state")

            # the sessions pair extends the r8 protocol-overhead ratio
            # to this scale (state size is bounded by OPEN sessions for
            # both, so only time is recorded)
            for name, fn in {
                "r9_tws_sessions": (
                    lambda: stateful.stream_sessions_ttl_tws(
                        spark, one, max_files_per_trigger=4
                    )
                ),
                "r9_legacy_sessions": (
                    lambda: stateful.stream_sessions_ttl(
                        spark, one, max_files_per_trigger=4
                    )
                ),
            }.items():
                if "tws" in name and not tws_ok:
                    continue
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                out[f"{name}_s"] = round(dt, 2)
                out[f"{name}_events_per_s"] = int(n_events / dt)

        section("r9_state_ab", _r9_state_ab)

    out["n_events"] = n_events
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
    )
