"""Query catalog: every operator exposed to the driver's correctness gate.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string DuckDB runs on the same parquet tables.
Column names/aliases are kept identical on both sides (the driver sorts
columns by name before value-hashing). Approx/sketch queries have no oracle
entry — the driver records a rows-only check for those.

The ``ev`` CTE mirrors ``sources.normalize_events``'s dimension mapping
(FIXTURES.md §1): uid→user_id, variant→event_type,
experiment_id→json ``props.k``, timestamp→ts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import metrics, timeseries
from .sources import normalize_events, read_events

QueryFn = Callable[[SparkSession, str], DataFrame]

#: DuckDB twin of sources.normalize_events (dimension mapping, FIXTURES.md §1).
EV_CTE = """WITH ev AS (
  SELECT event_id, ts, user_id, event_type AS variant,
         json_extract_string(props, '$.k') AS experiment_id, value
  FROM events
)"""

#: DuckDB twin of operators.timeseries.time_axis (R1).
AXIS_CTE = """axis AS (
  SELECT unnest(generate_series(date_trunc('minute', b.t0),
                                date_trunc('minute', b.t1),
                                INTERVAL 1 MINUTE)) AS minute
  FROM (SELECT min(ts) AS t0, max(ts) AS t1 FROM ev) b
)"""


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_events(read_events(spark, sf_dir))


QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def q(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLE[name] = oracle


# ---------------------------------------------------------------------------
# Reference-parity metric grains (SURVEY §2.2, W1–W12)
# ---------------------------------------------------------------------------
q(
    "w1_visits_per_minute",
    lambda s, d: metrics.visits_per_minute(_ev(s, d)),
    f"""{EV_CTE}
SELECT date_trunc('minute', ts) AS minute, count(*) AS visits
FROM ev GROUP BY 1""",
)
q(
    "w2_uniques_per_experiment_variant_minute",
    lambda s, d: metrics.uniques_per_experiment_variant_minute(_ev(s, d)),
    f"""{EV_CTE}
SELECT date_trunc('minute', ts) AS minute, experiment_id, variant,
       count(DISTINCT user_id) AS unique_users
FROM ev GROUP BY 1, 2, 3""",
)
q(
    "w2_uniques_per_experiment_variant_minute_approx",
    lambda s, d: metrics.uniques_per_experiment_variant_minute(_ev(s, d), exact=False),
)
q(
    "w3_uniques_per_variant",
    lambda s, d: metrics.uniques_per_variant(_ev(s, d)),
    f"""{EV_CTE}
SELECT variant, count(DISTINCT user_id) AS unique_users FROM ev GROUP BY 1""",
)
q(
    "w3_uniques_per_variant_approx",
    lambda s, d: metrics.uniques_per_variant(_ev(s, d), exact=False),
)
q(
    "w5_uniques_per_experiment",
    lambda s, d: metrics.uniques_per_experiment(_ev(s, d)),
    f"""{EV_CTE}
SELECT experiment_id, count(DISTINCT user_id) AS unique_users FROM ev GROUP BY 1""",
)
q(
    "w5_uniques_per_experiment_approx",
    lambda s, d: metrics.uniques_per_experiment(_ev(s, d), exact=False),
)
q(
    "w7_experiments_per_minute",
    lambda s, d: metrics.experiments_per_minute(_ev(s, d)),
    f"""{EV_CTE}
SELECT date_trunc('minute', ts) AS minute,
       count(DISTINCT experiment_id) AS active_experiments
FROM ev GROUP BY 1""",
)
q(
    "w9_variants_per_minute",
    lambda s, d: metrics.variants_per_minute(_ev(s, d)),
    f"""{EV_CTE}
SELECT date_trunc('minute', ts) AS minute,
       count(DISTINCT variant) AS active_variants
FROM ev GROUP BY 1""",
)
q(
    "w11_uniques_per_minute",
    lambda s, d: metrics.uniques_per_minute(_ev(s, d)),
    f"""{EV_CTE}
SELECT date_trunc('minute', ts) AS minute,
       count(DISTINCT user_id) AS unique_users
FROM ev GROUP BY 1""",
)
q(
    "w11_uniques_per_minute_approx",
    lambda s, d: metrics.uniques_per_minute(_ev(s, d), exact=False),
)

# ---------------------------------------------------------------------------
# Read-side dashboard queries (SURVEY §2.3, R1–R7)
# ---------------------------------------------------------------------------
q(
    "r1_time_axis",
    lambda s, d: timeseries.times(_ev(s, d)),
    f"""{EV_CTE}, {AXIS_CTE}
SELECT minute FROM axis""",
)
q(
    "r2_visits_timeseries",
    lambda s, d: timeseries.visits_timeseries(_ev(s, d)),
    f"""{EV_CTE}, {AXIS_CTE},
g AS (SELECT date_trunc('minute', ts) AS minute, count(*) AS visits FROM ev GROUP BY 1)
SELECT a.minute, CAST(coalesce(g.visits, 0) AS DOUBLE) AS metric
FROM axis a LEFT JOIN g USING (minute)""",
)
q(
    "r3_users_timeseries",
    lambda s, d: timeseries.users_timeseries(_ev(s, d)),
    f"""{EV_CTE}, {AXIS_CTE},
g AS (SELECT date_trunc('minute', ts) AS minute,
             count(DISTINCT user_id) AS unique_users FROM ev GROUP BY 1)
SELECT a.minute, CAST(coalesce(g.unique_users, 0) AS DOUBLE) AS metric
FROM axis a LEFT JOIN g USING (minute)""",
)
q(
    "r3_users_timeseries_approx",
    lambda s, d: timeseries.users_timeseries(_ev(s, d), exact=False),
)
q(
    "r4_experiments_timeseries",
    lambda s, d: timeseries.experiments_timeseries(_ev(s, d)),
    f"""{EV_CTE}, {AXIS_CTE},
g AS (SELECT date_trunc('minute', ts) AS minute,
             count(DISTINCT experiment_id) AS active_experiments FROM ev GROUP BY 1)
SELECT a.minute, CAST(coalesce(g.active_experiments, 0) AS DOUBLE) AS metric
FROM axis a LEFT JOIN g USING (minute)""",
)
q(
    "r5_variant_overlap",
    lambda s, d: timeseries.variant_overlap(_ev(s, d)),
    f"""{EV_CTE},
uv AS (SELECT DISTINCT variant, user_id FROM ev)
SELECT a.variant AS variant_a, b.variant AS variant_b, count(*) AS overlap
FROM uv a JOIN uv b ON a.user_id = b.user_id AND a.variant < b.variant
GROUP BY 1, 2""",
)
