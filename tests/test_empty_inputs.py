"""Empty-input robustness: every core event operator must return a
schema-stable EMPTY result on an empty stream, not raise — the behavior a
deployment hits on a quiet topic or an all-filtered micro-batch."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from redis_dataflow_realtime_analytics_spark.operators import (  # noqa: E402
    metrics,
    sessions,
    timeseries,
)
from redis_dataflow_realtime_analytics_spark.sources import (  # noqa: E402
    normalize_events,
    read_events,
)

from .conftest import SF_SMOKE


def _empty_ev(spark):
    return normalize_events(read_events(spark, SF_SMOKE)).where(F.lit(False))


def test_metric_grains_empty(spark):
    ev = _empty_ev(spark)
    for fn in (
        metrics.visits_per_minute,
        metrics.uniques_per_minute,
        metrics.uniques_per_experiment_variant_minute,
        metrics.uniques_per_variant,
        metrics.experiments_per_minute,
    ):
        out = fn(ev)
        assert out.count() == 0
        assert len(out.schema.fields) > 0


def test_read_side_empty(spark):
    ev = _empty_ev(spark)
    assert timeseries.time_axis(ev).count() == 0
    assert timeseries.visits_timeseries(ev).count() == 0
    assert timeseries.variant_overlap(ev).count() == 0
    assert timeseries.variant_overlap_approx(ev).count() == 0


def test_sessions_and_windows_empty(spark):
    ev = _empty_ev(spark)
    assert ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).count().count() == 0
    # window-based operators run on the full pipeline; emptiness propagates
    from redis_dataflow_realtime_analytics_spark.operators.sessions import (
        asof_last_click_before_error,
        rolling_week_user_value,
    )

    # these take (spark, sf_dir); exercise their window logic on empty via
    # the same expressions applied to the empty frame
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = ev.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("variant") == "click", F.col("ts")), ignorenulls=True).over(
            w
        ),
    ).where(F.col("variant") == "error")
    assert out.count() == 0
