"""The 12-leg fan-out (metrics.all_grains) evaluates every grain from one
shared cached DataFrame, and approx twins stay within HLL tolerance of
their exact grain."""

from __future__ import annotations

from redis_dataflow_realtime_analytics_spark.operators import metrics
from redis_dataflow_realtime_analytics_spark.sources import normalize_events, read_events

from .conftest import SF_SMOKE


def test_all_grains_evaluate(spark):
    ev = normalize_events(read_events(spark, SF_SMOKE)).cache()
    try:
        grains = metrics.all_grains(ev)
        assert len(grains) == 13
        for name, df in grains.items():
            assert df.count() > 0, name
    finally:
        ev.unpersist()


def test_approx_twins_within_tolerance(spark):
    ev = normalize_events(read_events(spark, SF_SMOKE)).cache()
    try:
        exact = {r.variant: r.unique_users for r in metrics.uniques_per_variant(ev).collect()}
        approx = {
            r.variant: r.unique_users
            for r in metrics.uniques_per_variant(ev, exact=False).collect()
        }
        for v, n in exact.items():
            # rsd 0.008 ⇒ ±5% is a generous bound at smoke scale
            assert abs(approx[v] - n) <= max(0.05 * n, 2), (v, n, approx[v])
    finally:
        ev.unpersist()


def test_variant_overlap_approx_close_to_exact(spark):
    """HLL inclusion-exclusion overlap within 5% of the exact self-join
    (DataSketches default lgK=12 → ~1.6% rse per sketch; the difference
    of three estimates stays well inside 5% at these cardinalities)."""
    from redis_dataflow_realtime_analytics_spark.operators import timeseries
    from redis_dataflow_realtime_analytics_spark.sources import (
        normalize_events,
        read_events,
    )

    from .conftest import SF_SMOKE

    ev = normalize_events(read_events(spark, SF_SMOKE))
    exact = {
        (r.variant_a, r.variant_b): r.overlap
        for r in timeseries.variant_overlap(ev).collect()
    }
    approx = {
        (r.variant_a, r.variant_b): r.overlap_approx
        for r in timeseries.variant_overlap_approx(ev).collect()
    }
    assert set(exact) == set(approx)
    for pair, n in exact.items():
        assert abs(approx[pair] - n) <= max(0.05 * n, 3.0), (pair, n, approx[pair])


def test_variant_overlap_theta_close_to_exact(spark):
    """Theta-sketch intersection estimates within 5% of the exact overlap
    (default lgK ⇒ ~1.6% rse; intersection error scales with the overlap
    itself, not the union, so the bound is tighter in principle than
    HLL inclusion-exclusion)."""
    from redis_dataflow_realtime_analytics_spark.operators import timeseries
    from redis_dataflow_realtime_analytics_spark.sources import (
        normalize_events,
        read_events,
    )

    from .conftest import SF_SMOKE

    ev = normalize_events(read_events(spark, SF_SMOKE))
    exact = {
        (r.variant_a, r.variant_b): r.overlap
        for r in timeseries.variant_overlap(ev).collect()
    }
    theta = {
        (r.variant_a, r.variant_b): r.overlap_est
        for r in timeseries.variant_overlap_theta(ev).collect()
    }
    assert set(exact) == set(theta)
    for pair, n in exact.items():
        assert abs(theta[pair] - n) <= max(0.05 * n, 3.0), (pair, n, theta[pair])


def test_now_anchored_time_axis_shape(spark):
    # Production-parity R1 (TimeseriesMetricsController.java:144-152): the
    # last-N wall-clock minutes ending at date_trunc('minute', now()),
    # contiguous at 1-minute steps, independent of the data.
    import datetime as dt

    from redis_dataflow_realtime_analytics_spark.operators import timeseries
    from redis_dataflow_realtime_analytics_spark.sources import (
        normalize_events,
        read_events,
    )

    from .conftest import SF_SMOKE

    ev = normalize_events(read_events(spark, SF_SMOKE))
    n = 7
    rows = sorted(
        r.minute for r in timeseries.time_axis(ev, anchor_now=True, last_minutes=n).collect()
    )
    assert len(rows) == n
    steps = {(b - a) for a, b in zip(rows, rows[1:])}
    assert steps == {dt.timedelta(minutes=1)}
    assert rows[-1].second == 0
    # anchored at now(), not at the (historical) fixture data
    assert abs((dt.datetime.now(dt.timezone.utc).replace(tzinfo=None) - rows[-1]).total_seconds()) < 120
