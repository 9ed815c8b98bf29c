"""Round-7 operators: maximal duplicated spans (the Lee et al. 2021
cut-list deliverable) and the rows-only -> oracled conversions."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.operators import dedup

K = dedup.SPAN_K  # 8


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def _write_docs(path: str, texts: list[str]) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["t"] * len(texts)),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    pq.write_table(tbl, path)


def test_maximal_spans_merges_overlapping_windows(spark, tmp_path):
    """A shared 12-token phrase produces 5 overlapping duplicated k=8
    windows per doc; they must merge into ONE maximal interval covering
    exactly the phrase."""
    phrase = " ".join(_words("dup", 12))
    d1 = " ".join(_words("a", 6)) + " " + phrase + " " + " ".join(_words("b", 6))
    d2 = " ".join(_words("c", 10)) + " " + phrase
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [d1, d2])
    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in dedup.maximal_duplicate_spans(spark, str(tmp_path)).collect()
    }
    # doc1: phrase occupies tokens 7..18 -> windows at 7..11 (5 windows)
    r1 = rows[(1, 7)]
    assert (r1["span_end"], r1["span_tokens"], r1["n_windows"]) == (18, 12, 5)
    # doc2: phrase occupies tokens 11..22
    r2 = rows[(2, 11)]
    assert (r2["span_end"], r2["span_tokens"], r2["n_windows"]) == (22, 12, 5)
    assert len(rows) == 2


def test_maximal_spans_counts_self_repetition(spark, tmp_path):
    """The occurrence rule is global (>= 2 occurrences anywhere), so a
    phrase repeated INSIDE one document — invisible to duplicate_spans'
    distinct-per-doc >= 2-docs rule — still yields spans; far-apart
    repeats stay separate islands."""
    phrase = " ".join(_words("rep", K))  # exactly one window per occurrence
    filler = " ".join(_words("f", 20))
    doc = phrase + " " + filler + " " + phrase
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [doc])
    rows = sorted(
        dedup.maximal_duplicate_spans(spark, str(tmp_path)).collect(),
        key=lambda r: r["span_start"],
    )
    assert [(r["span_start"], r["span_end"]) for r in rows] == [
        (1, K),
        (K + 21, 2 * K + 20),
    ]
    assert all(r["n_windows"] == 1 for r in rows)


def test_maximal_spans_intervals_disjoint_and_bounded(spark):
    """Structural invariants on the real fixture: per doc, intervals are
    disjoint (gap > 0 between consecutive spans), ordered, within the
    doc's token count, and each covers >= k tokens' worth of windows."""
    out = dedup.maximal_duplicate_spans(spark, "/root/testdata/sf0.001")
    df = out.withColumn(
        "prev_end",
        F.lag("span_end").over(Window.partitionBy("doc_id").orderBy("span_start")),
    )
    bad = df.where(
        (F.col("span_start") <= F.col("prev_end"))
        | (F.col("span_end") < F.col("span_start"))
        | (F.col("span_tokens") != F.col("span_end") - F.col("span_start") + 1)
    ).count()
    assert bad == 0
    assert out.count() > 0


def test_cut_duplicate_spans_excises_exactly_the_intervals(spark, tmp_path):
    """The applied cut removes precisely the shared phrase's tokens from
    BOTH docs (cut-all-occurrences) and reassembles the rest in order."""
    phrase = " ".join(_words("dup", 12))
    a_toks, b_toks = _words("a", 6) + _words("b", 6), _words("c", 10)
    d1 = " ".join(a_toks[:6]) + " " + phrase + " " + " ".join(a_toks[6:])
    d2 = " ".join(b_toks) + " " + phrase
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [d1, d2])
    rows = {
        r["doc_id"]: r
        for r in dedup.cut_duplicate_spans(spark, str(tmp_path)).collect()
    }
    assert rows[1]["cleaned_text"] == " ".join(a_toks)
    assert rows[2]["cleaned_text"] == " ".join(b_toks)
    for r in rows.values():
        assert r["removed_tokens"] == 12
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_toks"]


def test_cut_duplicate_spans_keeps_clean_docs_verbatim(spark, tmp_path):
    """Docs with no duplicated spans come back with zero removed tokens
    and their (whitespace-normalized) text intact."""
    texts = [" ".join(_words(p, 30)) for p in ("x", "y", "z")]
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, texts)
    rows = sorted(
        dedup.cut_duplicate_spans(spark, str(tmp_path)).collect(),
        key=lambda r: r["doc_id"],
    )
    for r, t in zip(rows, texts):
        assert r["removed_tokens"] == 0
        assert r["cleaned_text"] == t


def test_capped_jaccard_oracle_is_subset_of_exact(spark):
    """The df-capped oracle (r7 conversion) must select a precision-1
    subset of the exact pairs — same invariant the Spark side has had
    since r2, now asserted on the ORACLE SQL too."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    exact = set(
        map(tuple, con.execute(dedup.oracle_ngram_jaccard_pairs()).fetchall())
    )
    capped = set(
        map(
            tuple,
            con.execute(
                dedup.oracle_ngram_jaccard_pairs(max_shingle_df=20)
            ).fetchall(),
        )
    )
    assert {(a, b) for a, b, _ in capped} <= {(a, b) for a, b, _ in exact}


# --- Portable MinHash (oracle-derivable permutations) ------------------------
def _py_portable_sig(text: str) -> list[int]:
    """Pure-Python reference of the portable MinHash signature — tokenize,
    shingle, md5→28-bit key, affine-permute, min — independent of BOTH
    Spark and DuckDB."""
    import hashlib
    import re

    toks = re.split(r"[^0-9A-Za-z]+", text.strip())
    k = dedup.NGRAM_K
    n = max(len(toks) - k, 0)
    shingles = {" ".join(toks[i : i + k]) for i in range(n + 1)}
    keys = [
        int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in shingles
    ]
    return [
        min((a * x + b) % dedup.PORTABLE_P for x in keys)
        for a, b in dedup._PORT_COEF
    ]


def test_portable_signature_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "pack my box with five dozen liquor jugs again and again today",
    ]
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, texts)
    docs = spark.read.parquet(path)
    got = {
        r["doc_id"]: [r[f"h{i}"] for i in range(dedup.PORTABLE_PERMS)]
        for r in dedup.portable_minhash_signatures(docs).collect()
    }
    for doc_id, text in enumerate(texts, start=1):
        assert got[doc_id] == _py_portable_sig(text), doc_id


def test_portable_pairs_find_planted_replica(spark, tmp_path):
    """An exact replica agrees on all 16 slots (est=1.0) and MUST surface
    through the band join; unrelated docs must not pair at threshold 0.5."""
    base = " ".join(_words("w", 40))
    other = " ".join(_words("z", 40))
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [base, base, other])
    rows = dedup.minhash_portable_pairs(spark, str(tmp_path)).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(1, 2)}
    assert rows[0]["n_agree"] == dedup.PORTABLE_PERMS
    assert rows[0]["est_jaccard"] == 1.0


def test_portable_incremental_probe_flags_only_incoming(spark, tmp_path):
    """Incoming = doc_id % 10 == 0. Plant a replica of doc 3 at doc 10:
    the probe must flag doc 10 against neardup_of=3 and nothing else."""
    texts = [" ".join(_words(f"t{i}", 30)) for i in range(9)]  # ids 1..9
    texts.append(texts[2])  # id 10 replicates id 3
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, texts)
    rows = dedup.incremental_neardup_portable(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["neardup_of"], r["n_agree"]) == (
        10,
        3,
        dedup.PORTABLE_PERMS,
    )


# --- keep-first span cut ------------------------------------------------------
def test_keep_first_cut_preserves_canonical_occurrence(spark, tmp_path):
    """A phrase shared by three docs survives ONLY in the lowest doc_id;
    the other two lose exactly the phrase tokens."""
    phrase = " ".join(_words("dup", K))  # exactly one window per occurrence
    uniq = [" ".join(_words(f"u{i}", 12)) for i in range(3)]
    texts = [f"{uniq[i]} {phrase}" for i in range(3)]
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, texts)
    rows = {
        r["doc_id"]: r
        for r in dedup.cut_duplicate_spans_keep_first(spark, str(tmp_path)).collect()
    }
    assert rows[1]["removed_tokens"] == 0
    assert rows[1]["cleaned_text"] == texts[0]
    for d in (2, 3):
        assert rows[d]["removed_tokens"] == K
        assert rows[d]["cleaned_text"] == uniq[d - 1]


def test_keep_first_cut_keeps_first_self_repetition(spark, tmp_path):
    """Intra-doc repetition: the FIRST occurrence survives, the later one
    is excised (far apart so the islands stay separate)."""
    phrase = " ".join(_words("rep", K))
    filler = " ".join(_words("f", 20))
    text = f"{phrase} {filler} {phrase}"
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [text])
    r = dedup.cut_duplicate_spans_keep_first(spark, str(tmp_path)).collect()[0]
    assert r["removed_tokens"] == K
    assert r["cleaned_text"] == f"{phrase} {filler}"


def test_keep_first_removes_no_more_than_cut_all(spark):
    """On the real fixture the keep-one policy must excise a strict
    subset of cut-all's tokens per doc (canonical occurrences survive),
    and total removal must be positive (the fixture has planted dups)."""
    sf = "/root/testdata/sf0.001"
    cut_all = {
        r["doc_id"]: r["removed_tokens"]
        for r in dedup.cut_duplicate_spans(spark, sf).collect()
    }
    keep1 = {
        r["doc_id"]: r["removed_tokens"]
        for r in dedup.cut_duplicate_spans_keep_first(spark, sf).collect()
    }
    assert set(cut_all) == set(keep1)
    assert all(keep1[d] <= cut_all[d] for d in cut_all)
    assert sum(keep1.values()) < sum(cut_all.values())


def test_stream_neardup_probe_equals_batch_probe(spark):
    """Stateless-per-batch + static index ⇒ the union of per-shipment
    outputs must equal the batch probe EXACTLY (same rows, same
    integers) — the identity that lets the streaming key share the
    batch oracle."""
    from redis_dataflow_realtime_analytics_spark.streaming import pipeline as sp

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in sp.stream_neardup_probe(
            spark, f"{sf}/documents.parquet"
        ).collect()
    }
    want = {
        tuple(r)
        for r in dedup.incremental_neardup_portable(spark, sf).collect()
    }
    assert got == want and len(want) > 0


def test_portable_two_stage_is_precision_one_subset(spark):
    """The portable two-stage pairs must carry EXACT Jaccard values: every
    emitted pair appears in the quadratic exact pair list with the same
    value (precision 1); recall on the fixture's planted dups ≥ the
    banding floor asserted for the xxhash64 twin."""
    sf = "/root/testdata/sf0.001"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(spark, sf, threshold=0.5).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.lsh_exact_jaccard_portable(spark, sf).collect()
    }
    assert set(got) <= set(exact)
    assert all(abs(got[k] - exact[k]) < 1e-12 for k in got)
    assert len(got) > 0


# --- Portable SimHash ---------------------------------------------------------
def _py_portable_simhash(text: str) -> int:
    """Pure-Python reference: 48-bit SimHash over distinct tokens, token
    key = first 12 md5 hex chars, majority vote with ties to 1."""
    import hashlib
    import re

    toks = set(re.split(r"[^0-9A-Za-z]+", text.strip()))
    keys = [int(hashlib.md5(t.encode()).hexdigest()[:12], 16) for t in toks]
    sig = 0
    for j in range(dedup.SIMHASH_PORTABLE_BITS):
        vote = sum(1 if (x >> j) & 1 else -1 for x in keys)
        if vote >= 0:
            sig |= 1 << j
    return sig


def test_portable_simhash_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "pack my box with five dozen liquor jugs again and again today",
    ]
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, texts)
    docs = spark.read.parquet(path)
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_portable_signatures(docs).collect()
    }
    for doc_id, text in enumerate(texts, start=1):
        assert got[doc_id] == _py_portable_simhash(text), doc_id


def test_portable_simhash_pairs_replica_and_bound(spark, tmp_path):
    """A replica pair surfaces at hamming 0; every emitted pair respects
    the hamming bound; unrelated docs don't pair unless genuinely close."""
    base = " ".join(_words("w", 40))
    other = " ".join(_words("z", 40))
    path = str(tmp_path / "documents.parquet")
    _write_docs(path, [base, base, other])
    rows = dedup.simhash_portable_pairs(spark, str(tmp_path)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0
    assert all(h <= 3 for h in got.values())


def test_portable_lsh_recall_vs_bruteforce(spark):
    """The portable integer hyperplanes must preserve LSH locality: every
    query surfaces (own bucket always probed), results are drawn from the
    exact candidate pool, and mean recall beats the random-scan floor —
    the same gate the float-hyperplane twin passes."""
    from redis_dataflow_realtime_analytics_spark.operators import similarity

    sf = "/root/testdata/sf0.001"

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(similarity.ann_topk_bruteforce(spark, sf, k=10))
    approx = topk_sets(similarity.ann_lsh_portable_topk(spark, sf, k=10))
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / 10 for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.27, f"portable LSH mean recall {mean_recall}"


def test_session_gap_boundary_exact_ttl(spark):
    """The r7 hypothesis find, pinned forever: two events EXACTLY 30:00
    apart are ONE session (Spark session_window keeps an event at
    last+gap), a microsecond more is two — and the DuckDB oracle's
    strict-> split agrees, as does the stateful twin's in-batch rule."""
    import duckdb

    from redis_dataflow_realtime_analytics_spark.operators import sessions

    base = 1_700_000_000_000_000
    for extra_us, want in [(0, 1), (1, 2)]:
        ev = spark.createDataFrame(
            [(1, base), (1, base + 30 * 60_000_000 + extra_us)], ["u", "us"]
        ).select("u", F.expr("timestamp_micros(us)").alias("ts"))
        n = ev.groupBy("u", F.session_window("ts", "30 minutes")).count().count()
        assert n == want, f"session_window extra_us={extra_us}"

        con = duckdb.connect()
        cte = (
            "WITH ev AS (SELECT 1 AS user_id, "
            f"make_timestamp({base}) AS ts UNION ALL SELECT 1, "
            f"make_timestamp({base + 30 * 60_000_000 + extra_us}))"
        )
        got = con.execute(sessions.oracle_user_sessions(cte)).fetchall()
        assert len(got) == want, f"oracle extra_us={extra_us}"


def test_portable_family_empty_and_singleton_inputs(spark, tmp_path):
    """Empty corpus → schema-stable empty results; single-doc corpus →
    no pairs anywhere and the keep-first cut removes nothing (every
    window is its own canonical occurrence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    empty = tmp_path / "empty"
    empty.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }
    )
    pq.write_table(tbl, str(empty / "documents.parquet"))
    for fn in (
        dedup.minhash_portable_pairs,
        dedup.incremental_neardup_portable,
        dedup.lsh_exact_jaccard_portable,
        dedup.simhash_portable_pairs,
        dedup.cut_duplicate_spans_keep_first,
    ):
        out = fn(spark, str(empty))
        assert out.count() == 0 and len(out.schema.fields) > 0, fn.__name__

    single = tmp_path / "single"
    single.mkdir()
    _write_docs(str(single / "documents.parquet"), [" ".join(_words("s", 30))])
    assert dedup.minhash_portable_pairs(spark, str(single)).count() == 0
    assert dedup.simhash_portable_pairs(spark, str(single)).count() == 0
    r = dedup.cut_duplicate_spans_keep_first(spark, str(single)).collect()[0]
    assert r["removed_tokens"] == 0 and r["kept_tokens"] == 30


def test_no_portable_neardup_pair_straddles_leakage_free_split(spark):
    """Integration property: every exact-verified near-dup pair from the
    portable two-stage detector must land in ONE split of
    leakage_free_split (its pairs are a subset of the exact-Jaccard
    edges the split's clusters are built from, so a straddle would mean
    train/test contamination the split exists to prevent)."""
    from redis_dataflow_realtime_analytics_spark.operators import sampling

    sf = "/root/testdata/sf0.001"
    split = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_free_split(spark, sf).collect()
    }
    pairs = dedup.lsh_exact_jaccard_portable(spark, sf).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert split[r["doc_a"]] == split[r["doc_b"]], (
            r["doc_a"],
            r["doc_b"],
            split[r["doc_a"]],
            split[r["doc_b"]],
        )
