"""Property-based invariants (hypothesis) over the engine's determinism
contracts: order-independence of aggregation grains, symmetry of pairwise
operators, and exactness of the fixed-point vector math.

Example counts are small — every example is a Spark job — but each property
runs over randomized inputs the fixture tables can't produce.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from redis_dataflow_realtime_analytics_spark.functions import vectors as V
from redis_dataflow_realtime_analytics_spark.functions.skew import salted_count_distinct
from redis_dataflow_realtime_analytics_spark.operators import timeseries

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),  # user_id
        st.sampled_from(["default", "1", "2", "3"]),  # variant
        st.integers(0, 120),  # seconds offset
    ),
    min_size=1,
    max_size=60,
)


def _ev_df(spark, rows):
    return spark.createDataFrame(
        [(u, v, s) for u, v, s in rows], ["user_id", "variant", "sec"]
    ).select(
        "user_id",
        "variant",
        F.expr("timestamp_micros(CAST(1700000000000000 + sec * 1000000 AS BIGINT))").alias("ts"),
    )


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_salted_distinct_equals_naive(spark, rows):
    """Salting never changes the exact distinct count, for any input."""
    ev = _ev_df(spark, rows)
    naive = {
        r.variant: r.n
        for r in ev.groupBy("variant").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    salted = {
        r.variant: r.n
        for r in salted_count_distinct(ev, ["variant"], "user_id", "n", n_salts=4).collect()
    }
    assert naive == salted


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_variant_overlap_symmetric_and_bounded(spark, rows):
    """overlap(a,b) is emitted once per unordered pair and never exceeds
    either variant's audience (R5 invariants)."""
    ev = _ev_df(spark, rows)
    uniques = {
        r.variant: r.n
        for r in ev.groupBy("variant").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    seen = set()
    for r in timeseries.variant_overlap(ev).collect():
        assert r.variant_a < r.variant_b
        assert (r.variant_a, r.variant_b) not in seen
        seen.add((r.variant_a, r.variant_b))
        assert 0 < r.overlap <= min(uniques[r.variant_a], uniques[r.variant_b])


@given(rows=events_strategy, seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_minute_grain_permutation_invariant(spark, rows, seed):
    """Event order (late data) never changes event-time minute buckets."""
    import random

    ev = _ev_df(spark, rows)
    shuffled_rows = list(rows)
    random.Random(seed).shuffle(shuffled_rows)
    ev2 = _ev_df(spark, shuffled_rows)

    def buckets(df):
        return sorted(
            (str(r.minute), r.visits)
            for r in df.groupBy(F.date_trunc("minute", "ts").alias("minute"))
            .agg(F.count("*").alias("visits"))
            .collect()
        )

    assert buckets(ev) == buckets(ev2)


vec_strategy = st.lists(
    st.floats(-4.0, 4.0, allow_nan=False, width=32), min_size=4, max_size=16
)


@given(a=vec_strategy)
@settings(**SETTINGS)
def test_quantized_dot_commutative_and_int_exact(spark, a):
    """Fixed-point dots are exact int64s: commutative, and the squared norm
    is non-negative regardless of float input."""
    b = list(reversed(a))
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>").select(
        V.quantize("a").alias("qa"), V.quantize("b").alias("qb")
    )
    r = df.select(
        V.qdot("qa", "qb").alias("ab"),
        V.qdot("qb", "qa").alias("ba"),
        V.qnorm2("qa").alias("n2"),
    ).collect()[0]
    assert r.ab == r.ba
    assert isinstance(r.ab, int)
    assert r.n2 >= 0


def test_decimal_moments_agree_with_builtin_stddev(spark):
    """The exact-decimal moments formulation equals Spark's builtin
    stddev_pop/avg within float tolerance (it exists for cross-engine
    determinism, not different math)."""
    from redis_dataflow_realtime_analytics_spark.operators import relational

    from .conftest import SF_SMOKE

    ours = {
        r.l_returnflag: (r.mean_price, r.stddev_pop_price)
        for r in relational.price_moments_by_flag(spark, SF_SMOKE).collect()
    }
    from pyspark.sql import functions as F

    from redis_dataflow_realtime_analytics_spark.tables import load

    ref = {
        r.l_returnflag: (r.m, r.s)
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.avg("l_extendedprice").alias("m"), F.stddev_pop("l_extendedprice").alias("s"))
        .collect()
    }
    assert set(ours) == set(ref)
    for k, (m, s) in ours.items():
        assert abs(m - ref[k][0]) < 1e-6 * max(1.0, abs(m))
        assert abs(s - ref[k][1]) < 1e-6 * max(1.0, abs(s))


def test_kll_quantiles_within_rank_error(spark):
    """KLL p50/p90/p99 estimates must sit within ±2% RANK error of the
    exact distribution (k=200 ⇒ ~1.7% normalized rank error): the
    estimate's true rank, not its value, is what the sketch bounds."""
    from redis_dataflow_realtime_analytics_spark.operators.relational import (
        price_quantiles_kll,
    )
    from redis_dataflow_realtime_analytics_spark.tables import load

    from .conftest import SF_SMOKE

    li = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", F.col("l_extendedprice").cast("double").alias("v"))
        .toPandas()
    )
    est = {r.l_returnflag: r for r in price_quantiles_kll(spark, SF_SMOKE).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        vals = grp["v"].sort_values().reset_index(drop=True)
        n = len(vals)
        for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
            rank = (vals <= getattr(est[flag], col)).sum() / n
            assert abs(rank - q) <= 0.02, (flag, q, rank)


words_strategy = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


@given(words=words_strategy)
@settings(**SETTINGS)
def test_bpe_window_walk_equals_sequential_fold(spark, words):
    """The window-function greedy merge (_bpe_apply, incl. the
    lhs==rhs run-parity path) must equal the textbook left-to-right
    fold on ADVERSARIAL two-letter corpora — maximal run/tie density
    that the fixture vocabulary cannot produce. Checks both the merge
    table and the final per-word symbolization (the encode surface)."""
    import os
    import tempfile

    import pandas as pd

    from redis_dataflow_realtime_analytics_spark.operators import text as tx

    from .test_round5_ops import _ref_bpe

    wc: dict[str, int] = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    docs = " ".join(words)
    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": [docs],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(docs)],
        }
    )
    n_merges = 2
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        rows = sorted(
            tx.bpe_merges(spark, d, n_merges=n_merges).collect(),
            key=lambda r: r.merge_rank,
        )
        ref = _ref_bpe(dict(wc), n_merges)
        assert [(r.lhs, r.rhs, r.pair_count) for r in rows] == ref

        # final symbolization: re-apply ref merges sequentially per word
        seqs = {w: list(w) for w in wc}
        for l, r, _ in ref:
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        enc = tx.bpe_encode(spark, d, n_merges=n_merges, doc_mod=1).collect()
        by_word: dict[int, list] = {}
        for r in enc:
            by_word.setdefault(r.wpos, []).append((r.spos, r.token))
        toks = {
            wpos: [t for _, t in sorted(v)] for wpos, v in by_word.items()
        }
        for i, w in enumerate(w for w in docs.strip().lower().split() if w):
            assert toks[i + 1] == seqs[w], (w, toks[i + 1], seqs[w])


docs_tokens_strategy = st.lists(
    st.tuples(st.integers(0, 4000), st.integers(0, 50)),  # (doc_id, n_tokens)
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(rows=docs_tokens_strategy)
@settings(**SETTINGS)
def test_two_level_prefix_sum_equals_naive_cumsum(spark, rows):
    """The distributed two-level prefix sum (shard layout's core) must
    equal the naive sequential cumsum for ANY doc_id distribution —
    including ids that straddle bucket boundaries and sparse/dense
    mixes the fixture can't produce."""
    from redis_dataflow_realtime_analytics_spark.operators.sampling import (
        _two_level_tokens_before,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: r.tokens_before
        for r in _two_level_tokens_before(df, bucket_docs=7).collect()
    }
    acc = 0
    for doc_id, n in sorted(rows):
        assert got[doc_id] == acc, (doc_id, got[doc_id], acc)
        acc += n


edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=30,
).map(lambda es: [(a, b) for a, b in es if a != b])


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_lpa_equals_synchronous_reference(spark, edges):
    """The window-function LPA must equal a direct Python simulation of
    the same synchronous rule (argmax neighbor-label count, min-label
    ties) on random small graphs — including multi-edges, which both
    sides must weight identically."""
    from hypothesis import assume

    from redis_dataflow_realtime_analytics_spark.operators.dedup import lpa_labels

    assume(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.community for r in lpa_labels(df, rounds=3).collect()}

    sym: dict[int, list[int]] = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    labels = {n: n for n in sym}
    for _ in range(3):
        nxt = {}
        for n, nbrs in sym.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[n] = best
        labels = nxt
    assert got == labels


doc_ids_strategy = st.lists(
    st.integers(0, 10_000), min_size=1, max_size=40, unique=True
)


@given(ids=doc_ids_strategy)
@settings(**SETTINGS)
def test_epoch_shuffle_equals_flat_permutation(spark, ids):
    """The two-level permutation rank must equal the naive flat
    sort-by-md5 permutation for ANY doc_id set — including ids that
    collide into one hex-prefix bucket or spread across all 256, which
    the fixture can't control. The reference order is computed in
    Python (hashlib md5 == Spark md5 on UTF-8)."""
    import hashlib
    import os
    import tempfile

    from redis_dataflow_realtime_analytics_spark.operators import sampling

    d = tempfile.mkdtemp(prefix="epoch_prop_")
    spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.epoch, r.doc_id): r.shuffle_pos
        for r in sampling.epoch_shuffle(spark, d).collect()
    }
    for e in (0, 1):
        expect = sorted(
            ids, key=lambda i: (hashlib.md5(f"{i}:{e}".encode()).hexdigest(), i)
        )
        for pos, i in enumerate(expect):
            assert got[(e, i)] == pos, (e, i, got[(e, i)], pos)


session_rows_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 200)),  # (user, minute offset)
    min_size=1,
    max_size=40,
)


@given(rows=session_rows_strategy)
@settings(**SETTINGS)
def test_active_sessions_sweepline_equals_bruteforce(spark, rows):
    """The sweep-line concurrency curve must equal the brute-force
    points-in-intervals count for ANY event pattern — overlapping
    sessions, gap-straddling users, single-event sessions; the Python
    reference recomputes the 30-minute gap sessionization and the
    per-minute interval cover directly."""
    import datetime

    base = 1_700_000_000_000_000  # micros
    ev = spark.createDataFrame(
        [(u, base + m * 60_000_000, f"e{i}") for i, (u, m) in enumerate(rows)],
        ["user_id", "us", "event_id"],
    ).select(
        "user_id", "event_id", F.expr("timestamp_micros(us)").alias("ts")
    )
    # the operator loads events from a fixture dir through the wire
    # schema; emulate by monkey-free reuse of the session + sweep bodies
    s = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("a"), F.col("w.end").alias("b"))
        .collect()
    )
    intervals = [(r.a, r.b) for r in s]
    # python reference sessionization must agree with session_window
    by_user: dict = {}
    for u, m in rows:
        by_user.setdefault(u, []).append(m)
    expect_intervals = []
    for u, ms in by_user.items():
        ms = sorted(ms)
        start = prev = ms[0]
        for m in ms[1:]:
            # strict >: session_window keeps an event at exactly
            # last+gap in the SAME session (measured; the >= variant
            # was this test's own falsifying example in r7)
            if m - prev > 30:
                expect_intervals.append((start, prev + 30))
                start = m
            prev = m
        expect_intervals.append((start, prev + 30))
    def _mins(ts):
        return int(
            (ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6 - base)
            // 60_000_000
        )

    got_iv = sorted((_mins(a), _mins(b)) for a, b in intervals)
    assert got_iv == sorted(expect_intervals)

    # brute-force concurrency over the observed axis == the sweep-line
    lo = min(a for a, _ in expect_intervals)
    hi = max(b - 1 for _, b in expect_intervals)
    brute = {
        m: sum(1 for a, b in expect_intervals if a <= m < b)
        for m in range(lo, hi + 1)
    }
    # run the sweep over the same intervals via the operator's algebra
    iv_df = spark.createDataFrame(expect_intervals, ["a", "b"])
    deltas = iv_df.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("m"), F.lit(1).alias("d")),
                F.struct(F.col("b").alias("m"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.m", "x.d")
    net = deltas.groupBy("m").agg(F.sum("d").alias("nd"))
    from pyspark.sql import Window as W

    axis = spark.range(lo, hi + 1).select(F.col("id").alias("m"))
    w = W.orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    curve = {
        r.m: r.c
        for r in axis.join(net, "m", "left")
        .select("m", F.coalesce(F.sum("nd").over(w), F.lit(0)).alias("c"))
        .collect()
    }
    assert curve == brute


# --- Maximal duplicated spans vs brute force (r7) ---------------------------
spans_corpus_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=25),
    min_size=2,
    max_size=6,
)


def _brute_maximal_spans(token_docs: list[list[str]], k: int):
    """Pure-Python reference: window inventory, global >=2 occurrence
    rule, contiguity merge (gap <= k), clamp to doc length."""
    from collections import Counter

    wins = []  # (doc_id, pos, text)
    for d, tk in enumerate(token_docs, start=1):
        n = len(tk)
        for i in range(1, max(n - k + 1, 1) + 1):
            wins.append((d, i, " ".join(tk[i - 1 : i - 1 + k])))
    occ = Counter(w for _, _, w in wins)
    out = set()
    for d, tk in enumerate(token_docs, start=1):
        pos = sorted(i for dd, i, w in wins if dd == d and occ[w] >= 2)
        islands: list[list[int]] = []
        for p in pos:
            if islands and p - islands[-1][-1] <= k:
                islands[-1].append(p)
            else:
                islands.append([p])
        n = len(tk)
        for isl in islands:
            s, e = isl[0], min(isl[-1] + k - 1, n)
            out.add((d, s, e, e - s + 1, len(isl)))
    return out


@given(docs=spans_corpus_strategy)
@settings(**SETTINGS)
def test_maximal_spans_match_bruteforce(spark, docs):
    """maximal_duplicate_spans == the brute-force inventory+merge on
    random small-vocabulary corpora (small vocab => dense duplicated
    windows, island merges, clamped short docs — shapes the fixture's
    natural text never produces)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import dedup

    k = 3
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array([" ".join(d) for d in docs]),
                "source": pa.array(["t"] * len(docs)),
                "lang": pa.array(["en"] * len(docs)),
            }
        )
        pq.write_table(tbl, f"{tmp}/documents.parquet")
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"])
            for r in dedup.maximal_duplicate_spans(spark, tmp, k=k).collect()
        }
    assert got == _brute_maximal_spans(docs, k)


@given(docs=spans_corpus_strategy)
@settings(**SETTINGS)
def test_cut_spans_match_bruteforce(spark, docs):
    """cut_duplicate_spans == brute-force excision of the brute-force
    span set, for any random corpus: counts AND the reassembled text."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import dedup

    k = 3
    spans = _brute_maximal_spans(docs, k)
    expect = {}
    for d, tk in enumerate(docs, start=1):
        covered = set()
        for dd, s, e, _, _ in spans:
            if dd == d:
                covered.update(range(s, e + 1))
        kept = [t for i, t in enumerate(tk, start=1) if i not in covered]
        expect[d] = (len(tk), len(tk) - len(kept), len(kept), " ".join(kept))
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array([" ".join(d) for d in docs]),
                "source": pa.array(["t"] * len(docs)),
                "lang": pa.array(["en"] * len(docs)),
            }
        )
        pq.write_table(tbl, f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: (
                r["n_toks"],
                r["removed_tokens"],
                r["kept_tokens"],
                r["cleaned_text"],
            )
            for r in dedup.cut_duplicate_spans(spark, tmp, k=k).collect()
        }
    assert got == expect


# --- keep-first span cut vs brute force (r7) ---------------------------------
def _brute_keep_first(token_docs: list[list[str]], k: int):
    """Pure-Python reference for the keep-one policy: window inventory,
    canonical = min (doc_id, pos) per duplicated window text, cut the
    non-canonical occurrences, same island merge + per-token cover."""
    from collections import Counter, defaultdict

    wins = []
    for d, tk in enumerate(token_docs, start=1):
        n = len(tk)
        for i in range(1, max(n - k + 1, 1) + 1):
            wins.append((d, i, " ".join(tk[i - 1 : i - 1 + k])))
    occ = Counter(w for _, _, w in wins)
    canon = {}
    for d, i, w in sorted(wins):
        canon.setdefault(w, (d, i))
    cut = defaultdict(list)
    for d, i, w in wins:
        if occ[w] >= 2 and canon[w] != (d, i):
            cut[d].append(i)
    expect = {}
    for d, tk in enumerate(token_docs, start=1):
        islands: list[list[int]] = []
        for p in sorted(cut.get(d, [])):
            if islands and p - islands[-1][-1] <= k:
                islands[-1].append(p)
            else:
                islands.append([p])
        n = len(tk)
        covered = set()
        for isl in islands:
            covered.update(range(isl[0], min(isl[-1] + k - 1, n) + 1))
        kept = [t for i, t in enumerate(tk, start=1) if i not in covered]
        expect[d] = (n, n - len(kept), len(kept), " ".join(kept))
    return expect


@given(docs=spans_corpus_strategy)
@settings(**SETTINGS)
def test_keep_first_cut_matches_bruteforce(spark, docs):
    """cut_duplicate_spans_keep_first == the brute-force canonical-owner
    excision for any random small-vocab corpus — counts AND text."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import dedup

    k = 3
    expect = _brute_keep_first(docs, k)
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array([" ".join(d) for d in docs]),
                "source": pa.array(["t"] * len(docs)),
                "lang": pa.array(["en"] * len(docs)),
            }
        )
        pq.write_table(tbl, f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: (
                r["n_toks"],
                r["removed_tokens"],
                r["kept_tokens"],
                r["cleaned_text"],
            )
            for r in dedup.cut_duplicate_spans_keep_first(spark, tmp, k=k).collect()
        }
    assert got == expect


# --- boundary packing vs brute force (r7) ------------------------------------
pack_docs_strategy = st.lists(
    st.integers(min_value=1, max_value=12), min_size=1, max_size=40
)


@given(sizes=pack_docs_strategy)
@settings(**SETTINGS)
def test_pack_boundary_matches_python_nextfit(spark, sizes):
    """pack_documents_boundary == a direct Python next-fit replay for any
    random size sequence at a tiny capacity (8 tokens) — exact fits,
    overflow-on-boundary, oversize singletons, oversize-first streams:
    the cases fixture text sizes never hit."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import sampling

    cap = 8
    # one lang, doc_ids 16 apart => one (lang, shard) stream, walk order = doc_id
    doc_ids = [1 + 16 * i for i in range(len(sizes))]
    texts = [" ".join(f"t{j}" for j in range(n)) for n in sizes]
    expect = {}
    fill, pack, started = 0, 0, False
    for did, n in zip(doc_ids, sizes):
        if started and fill + n > cap:
            pack += 1
            fill = 0
        started = True
        expect[did] = (pack, n > cap)
        fill += n
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(["t"] * len(sizes)),
                "lang": pa.array(["en"] * len(sizes)),
            }
        )
        pq.write_table(tbl, f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: (r["pack_id"], r["oversize"])
            for r in sampling.pack_documents_boundary(
                spark, tmp, max_tokens=cap
            ).collect()
        }
    assert got == expect


# --- portable MinHash banding vs brute force (r7) ----------------------------
@given(docs=spans_corpus_strategy)
@settings(**SETTINGS)
def test_portable_minhash_pairs_match_bruteforce(spark, docs):
    """minhash_portable_pairs == a pure-Python replay of the whole
    pipeline (signatures -> 4-band buckets -> candidate pairs ->
    agreement filter) on dense small-vocab corpora, where band-bucket
    collisions are far denser than fixture text produces."""
    import hashlib
    import re
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import dedup

    def sig_of(text: str) -> list[int]:
        toks = re.split(r"[^0-9A-Za-z]+", text.strip())
        k = dedup.NGRAM_K
        n = max(len(toks) - k, 0)
        shingles = {" ".join(toks[i : i + k]) for i in range(n + 1)}
        keys = [int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in shingles]
        return [
            min((a * x + b) % dedup.PORTABLE_P for x in keys)
            for a, b in dedup._PORT_COEF
        ]

    texts = [" ".join(d) for d in docs]
    sigs = {i + 1: sig_of(t) for i, t in enumerate(texts)}
    buckets: dict = {}
    for d, s in sigs.items():
        for b in range(dedup.PORTABLE_BANDS):
            key = (b, tuple(s[b * dedup.PORTABLE_ROWS : (b + 1) * dedup.PORTABLE_ROWS]))
            buckets.setdefault(key, []).append(d)
    cands = {
        (a, b)
        for ds in buckets.values()
        for i, a in enumerate(ds)
        for b in ds[i + 1 :]
        if a != b
    }
    expect = {}
    for a, b in cands:
        a, b = min(a, b), max(a, b)
        n_agree = sum(1 for i in range(dedup.PORTABLE_PERMS) if sigs[a][i] == sigs[b][i])
        if n_agree / dedup.PORTABLE_PERMS >= 0.5:
            expect[(a, b)] = n_agree
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(["t"] * len(texts)),
                "lang": pa.array(["en"] * len(texts)),
            }
        )
        pq.write_table(tbl, f"{tmp}/documents.parquet")
        got = {
            (r["doc_a"], r["doc_b"]): r["n_agree"]
            for r in dedup.minhash_portable_pairs(spark, tmp).collect()
        }
    assert got == expect


# --- overlap chunker vs brute force (r7) -------------------------------------
chunk_params_strategy = st.tuples(
    st.integers(min_value=0, max_value=60),   # n_chars
    st.integers(min_value=2, max_value=12),   # width
    st.integers(min_value=1, max_value=12),   # stride (may exceed width)
)


@given(params=st.lists(chunk_params_strategy, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_overlap_chunker_matches_python_reference(spark, params):
    """chunk_documents_overlap == a direct Python slicer for any
    (n_chars, width, stride) — exact multiples, text shorter than width,
    stride > width, empty text (one empty chunk by contract). Full-cover
    property asserted independently."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from redis_dataflow_realtime_analytics_spark.operators import sampling

    for n_chars, width, stride in params:
        text = "".join(chr(ord("a") + (i % 26)) for i in range(n_chars))
        expect = {}
        import math

        last = math.ceil(max(n_chars - width, 0) / stride)
        for i in range(last + 1):
            expect[i] = text[i * stride : i * stride + width]
        # python reference covers every char when stride <= width
        if stride <= width and n_chars:
            assert set("".join(expect.values())) == set(text)
        with tempfile.TemporaryDirectory() as tmp:
            tbl = pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([text]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["t"]),
                    "n_chars": pa.array([n_chars], pa.int64()),
                }
            )
            pq.write_table(tbl, f"{tmp}/documents.parquet")
            got = {
                r["chunk_idx"]: r["chunk_text"]
                for r in sampling.chunk_documents_overlap(
                    spark, tmp, width=width, stride=stride
                ).collect()
            }
        assert got == expect, (n_chars, width, stride)


# --- session oracle vs session_window on random patterns (r7) ----------------
session_minutes_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 120)),  # (user, minute)
    min_size=1,
    max_size=30,
)


@given(rows=session_minutes_strategy)
@settings(**SETTINGS)
def test_session_oracle_matches_session_window(spark, rows):
    """The DuckDB session oracle (strict-> split) must equal Spark
    session_window for ANY event pattern — including gap multiples of
    exactly 30 minutes, which the strategy produces constantly. Closes
    the triangle: engine↔python (sweepline test), exact-boundary
    regression, and now engine↔oracle on random inputs."""
    import duckdb

    from redis_dataflow_realtime_analytics_spark.operators import sessions

    base = 1_700_000_000_000_000
    ev = spark.createDataFrame(
        [(u, base + m * 60_000_000) for u, m in rows], ["user_id", "us"]
    ).select("user_id", F.expr("timestamp_micros(us)").alias("ts"))
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    vals = " UNION ALL ".join(
        f"SELECT {u} AS user_id, make_timestamp({base + m * 60_000_000}) AS ts"
        for u, m in rows
    )
    con = duckdb.connect()
    want = {
        (r[0], str(r[1]), str(r[2]), r[3])
        for r in con.execute(
            sessions.oracle_user_sessions(f"WITH ev AS ({vals})")
        ).fetchall()
    }
    assert got == want
