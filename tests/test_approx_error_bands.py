"""Error-band gates for every approx/sketch rows-only registry key.

Each approximate twin (HLL++ / DataSketches HLL / Theta sketch) is bounded
against its exact counterpart at sf0.01 — the driver's correctness SF — so
"rows-only" keys still carry a quantitative accuracy contract, not just a
row count. Bounds are generous multiples of the sketches' published error
(HLL lgK=14 ~ 0.81% std err; Theta default ~ <2%): per-group relative error
must stay within BOUND, which catches wiring mistakes (wrong column, wrong
grain) while never flaking on legitimate sketch variance.
"""

from __future__ import annotations

import pytest

from redis_dataflow_realtime_analytics_spark import registry

SF = "/root/testdata/sf0.01"
BOUND = 0.05

#: (approx_key, exact_key) — schemas agree on the group columns; the value
#: column is the single numeric the two twins share semantics for.
PAIRS = [
    ("w2_uniques_per_experiment_variant_minute_approx", "w2_uniques_per_experiment_variant_minute"),
    ("w3_uniques_per_variant_approx", "w3_uniques_per_variant"),
    ("w5_uniques_per_experiment_approx", "w5_uniques_per_experiment"),
    ("w11_uniques_per_minute_approx", "w11_uniques_per_minute"),
    ("w11_hll_sketch_estimates", "w11_uniques_per_minute"),
    ("r3_users_timeseries_approx", "r3_users_timeseries"),
    ("stream_uniques_per_minute_approx", "w11_uniques_per_minute"),
    ("r5_variant_overlap_approx", "r5_variant_overlap"),
    ("r5_variant_overlap_theta", "r5_variant_overlap"),
]


def _keyed(df):
    """rows → {group-key tuple: metric value}; the metric is the last
    numeric column, group key = every other column (stringified)."""
    cols = df.columns
    rows = df.collect()
    out = {}
    for r in rows:
        vals = list(r)
        out[tuple(str(v) for v in vals[:-1])] = float(vals[-1])
    return out


@pytest.mark.parametrize("approx_key,exact_key", PAIRS, ids=[p[0] for p in PAIRS])
def test_approx_within_band_of_exact(spark, approx_key, exact_key):
    approx = _keyed(registry.QUERIES[approx_key](spark, SF))
    exact = _keyed(registry.QUERIES[exact_key](spark, SF))
    assert approx.keys() == exact.keys(), (
        f"group keys differ: only-approx={list(set(approx) - set(exact))[:3]} "
        f"only-exact={list(set(exact) - set(approx))[:3]}"
    )
    worst = 0.0
    for k, a in approx.items():
        e = exact[k]
        err = abs(a - e) / max(e, 1.0)
        worst = max(worst, err)
    assert worst <= BOUND, f"worst relative error {worst:.4f} > {BOUND}"
