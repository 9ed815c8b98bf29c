"""Gates for the round-5 session operators: distributed BPE merge
training — oracle-differential plus an INDEPENDENT sequential-fold
reference (the SQL oracle shares the window-function formulation, so
semantics are additionally pinned against the classic left-to-right
scan every BPE implementation uses)."""

from __future__ import annotations

import re

from redis_dataflow_realtime_analytics_spark.operators import text
from redis_dataflow_realtime_analytics_spark.tables import load

from .conftest import SF_SMOKE
from .oracle import compare


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook sequential BPE: greedy leftmost-non-overlapping merge
    application, argmax by (count DESC, lhs, rhs)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:  # pairs exhausted before the merge budget: stop early
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
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
    return merges


def test_bpe_merges_matches_oracle(spark):
    compare(text.bpe_merges(spark, SF_SMOKE), text.oracle_bpe_merges(), SF_SMOKE)


def test_bpe_merges_matches_sequential_reference(spark):
    rows = sorted(
        text.bpe_merges(spark, SF_SMOKE, n_merges=4).collect(),
        key=lambda r: r.merge_rank,
    )
    wc: dict[str, int] = {}
    for r in load(spark, SF_SMOKE, "documents").select("text").collect():
        for w in re.split(r"[ \t\n\x0b\f\r]+", r.text.strip().lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    ref = _ref_bpe(wc, 4)
    got = [(r.lhs, r.rhs, r.pair_count) for r in rows]
    assert got == ref, f"{got} != {ref}"


def test_bpe_merge_application_run_parity(spark):
    """The lhs == rhs window-parity path: a planted corpus of 'aaaa'/'aaa'
    runs must merge exactly like the left-to-right scan (aaaa -> aa,aa;
    aaa -> aa,a), which shows up as round-2 counting 'aa' pairs."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["aaaa aaaa aaa", "aaaa b"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [13, 6],
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(os.path.join(d, "documents.parquet"))
        rows = sorted(
            text.bpe_merges(spark, d, n_merges=2).collect(),
            key=lambda r: r.merge_rank,
        )
        wc = {"aaaa": 3, "aaa": 1, "b": 1}
        assert [(r.lhs, r.rhs, r.pair_count) for r in rows] == _ref_bpe(wc, 2)
