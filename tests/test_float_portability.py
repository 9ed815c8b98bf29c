"""Float-path portability: the measured blockers and the portable twin.

The rows-only ledger (COVERAGE.md) claims float k-means / power
iteration can't be SQL-oracled DIRECTLY because decimal pins of float
state diverge across engines. r9 measured the exact blockers and built
the workaround; these tests pin both so the ledger stays evidence, not
assertion:

* **blocker 1 (float→decimal)**: Spark casts float32→DECIMAL via the
  value's shortest decimal representation, DuckDB scales in float
  precision — 0.1f lands on different decimals entirely.
* **blocker 2 (double→decimal)**: near a half-boundary at the target
  scale, Spark (shortest-repr rounding) and DuckDB (binary scaling) can
  disagree by one unit in the last digit — hit once in 512 centroid
  cells at sf0.01 during r9 development.
* **the portable pin**: ``floor(x·1e12 + 0.5)`` uses only IEEE double
  ops, which ARE bit-identical — ``kmeans_float_portable_centroids``
  rides it and hash-gates the float Lloyd's loop end to end (the
  registry key; here we pin cross-engine exactness at sf0.001 plus
  float-path fidelity vs a numpy float64 re-implementation).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from redis_dataflow_realtime_analytics_spark.operators import similarity as S

from .conftest import SF_SMOKE


def test_blocker_float_to_decimal_cast_diverges(spark):
    got = str(
        spark.sql("SELECT CAST(CAST(0.1 AS FLOAT) AS DECIMAL(38,12)) AS d").first()["d"]
    )
    con = duckdb.connect()
    want = str(con.sql("SELECT CAST(CAST(0.1 AS FLOAT) AS DECIMAL(38,12))").fetchone()[0])
    con.close()
    # if a future engine pair agrees here, the direct decimal pin becomes
    # viable and the fixed-point detour can be retired — flag it
    assert got != want, (
        f"float→decimal now agrees across engines ({got}); "
        "revisit the COVERAGE.md float-portability ledger rows"
    )


def test_portable_pin_is_ieee_identical(spark):
    """floor(x*1e12 + 0.5) over the exact double-widened float values:
    bit-equal between Spark and DuckDB on every embedding cell."""
    sf = SF_SMOKE
    got = spark.sql(
        "SELECT sum(CAST(floor(CAST(x AS DOUBLE) * 1e12 + 0.5) AS DECIMAL(38,0))) AS s "
        f"FROM (SELECT explode(embedding) AS x FROM parquet.`{sf}/embeddings.parquet`)"
    ).first()["s"]
    con = duckdb.connect()
    want = con.sql(
        "SELECT sum(CAST(floor(CAST(x AS DOUBLE) * 1e12 + 0.5) AS DECIMAL(38,0))) "
        f"FROM (SELECT unnest(embedding) AS x FROM '{sf}/embeddings.parquet')"
    ).fetchone()[0]
    con.close()
    assert str(got) == str(want)


@pytest.fixture(scope="module")
def twin_rows(spark):
    return sorted(
        map(tuple, S.kmeans_float_portable_centroids(spark, SF_SMOKE).collect())
    )


def test_float_twin_cross_engine_exact(twin_rows):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.sql(S.oracle_kmeans_float_portable()).fetchall()))
    con.close()
    assert twin_rows == want


def test_float_twin_is_the_float_path(spark, twin_rows):
    """The twin must genuinely run the FLOAT algorithm: re-implement the
    same two Lloyd iterations in numpy float64 (seeds = k smallest
    vec_ids, left-fold distances, true float means) and require the
    twin's assignments to match exactly and its means to sit within the
    fixed-point pin's rounding budget (≤1e-12) of the true float means."""
    import pandas as pd

    pdf = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    k = 8
    C = X[:k].copy()
    counts = np.ones(k, dtype=np.int64)
    for _ in range(2):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        asg = d.argmin(axis=1)  # numpy argmin keeps the first (lowest cid) tie
        newC = C.copy()
        for c in range(k):
            members = X[asg == c]
            if len(members):
                newC[c] = members.mean(axis=0)
                counts[c] = len(members)
        C = newC
    got = {(r[0], r[1]): (r[2], r[3]) for r in twin_rows}
    cids = sorted({r[0] for r in twin_rows})
    for ci, cid in enumerate(cids):
        for pos in range(1, X.shape[1] + 1):
            mean, n = got[(cid, pos)]
            assert n == counts[ci]
            assert abs(mean - C[ci][pos - 1]) < 1e-12, (cid, pos, mean, C[ci][pos - 1])
