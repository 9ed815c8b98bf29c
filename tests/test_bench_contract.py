"""Bench-harness output contract (VERDICT r6 item 4).

The driver captures a bounded tail of bench.py's stdout and parses the
LAST JSON line. In r4 and r5 the per-query dict outgrew that window
mid-line and the round's bench artifact was recorded as "parsed": null.
bench.py now prints one bounded record per query as measured, writes the
full result to bench_out.json, and ends with an O(1) summary line —
these tests keep that contract as HEADLINE grows.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
from redis_dataflow_realtime_analytics_spark import registry  # noqa: E402


def test_summary_line_is_bounded_regardless_of_headline_size():
    # worst plausible shape: every headline query with a max-width float
    times = {name: 12345.678 for name in bench.HEADLINE}
    line = bench.summary_line(times, 0.1)
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES
    # and the guard actually bites on an unbounded line
    parsed = json.loads(line)
    assert "queries" not in parsed, "per-query dict must never be on the final line"
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["queries_file"] == "bench_out.json"


def test_summary_line_stays_bounded_at_10x_future_growth():
    times = {f"future_query_with_a_long_name_{i:04d}": 9999.999 for i in range(1500)}
    line = bench.summary_line(times, 0.1)
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES


def test_headline_keys_all_registered():
    missing = [k for k in bench.HEADLINE if k not in registry.QUERIES]
    assert not missing, f"HEADLINE names unknown registry keys: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline keys"
