#!/usr/bin/env python3
"""Driver-faithful correctness dry-run: every SQL-oracled registry key
at sf0.01, canonicalized the way the per-round driver does it.

``tests/oracle.py`` compares *values* (math.isclose on floats), which is
the right engineering gate but is blind to the one failure class that has
produced red driver rows with correct values: *dtype drift* between the
Spark result and the DuckDB oracle. The driver converts both sides to
pandas, sorts rows, and hashes stringified cells — so DuckDB typing
``sum(bigint)`` as HUGEINT (-> float64 -> "123.0") against Spark's
int64 ("123") hash-fails even though every value is equal
(r3 ``corpus_mix_report``).

This script reproduces that canonicalization:
  * column order  = sorted by name
  * row order     = lexicographic sort over all columns
  * cell          = str(round(v, 6)) for floats, str(v) otherwise
and reports per-key rows/schema/hash verdicts, exit 1 on any mismatch.

Run before every round handoff:
    python scripts/driver_check.py                 # all oracled keys
    python scripts/driver_check.py corpus_mix_report multimodal_resize
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")


def _cell(v):
    """Stringify one pandas cell the way the driver's hash sees it.

    Both sides arrive through pandas (Spark ``toPandas()``, DuckDB
    ``.df()``), so dtype drift is *visible* here: an int64 cell
    stringifies ``"123"`` while a float64 cell stringifies ``"123.0"``
    — exactly the r3/r5 HUGEINT failure class.
    """
    import numpy as np

    if v is None:
        return "<NULL>"
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return "[" + ", ".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(round(f, 6))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    # pandas NaT / pd.NA and friends
    try:
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return "<NULL>"
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def _canon_pdf(pdf):
    """Driver canonical form from a pandas frame: columns sorted by
    name, rows stringified per-cell and lexicographically sorted.

    datetime64 columns stringify SERIES-wise (``astype(str)``), not
    per-element: pandas drops the midnight time for an all-midnight
    column ("2024-01-01"), which is exactly how a DuckDB DATE
    (datetime64 via ``.df()``) ends up equal to Spark's
    ``datetime.date`` objects ("2024-01-01") under the driver's hash —
    verified against the green ``user_retention_cohorts`` driver rows;
    per-element ``str()`` would emit "2024-01-01 00:00:00" and
    false-flag every date column."""
    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype(str)
    cols = sorted(pdf.columns)
    out = [tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    out.sort()
    return cols, out


def check_key(spark, con, name: str) -> dict:
    from redis_dataflow_realtime_analytics_spark import registry

    t0 = time.time()
    # Both sides through pandas — the driver's REAL path. (The previous
    # version detected HUGEINT from the DBAPI cursor description, but
    # DuckDB's DBAPI describes every numeric column as the generic
    # 'NUMBER', so that detection was dead code and the guard shipped
    # 4 red rows in r5. Do not approximate the driver; reproduce it.)
    spdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
    opdf = con.sql(registry.ORACLE[name]).df()

    rows_match = len(spdf) == len(opdf)
    schema_match = sorted(spdf.columns) == sorted(opdf.columns)
    hash_match = False
    detail = ""
    if rows_match and schema_match:
        sc, sr = _canon_pdf(spdf)
        _, orr = _canon_pdf(opdf)
        hash_match = sr == orr
        if not hash_match:
            sdt = {c: str(spdf[c].dtype) for c in sc}
            odt = {c: str(opdf[c].dtype) for c in sc}
            drift = [c for c in sc if sdt[c] != odt[c]]
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    detail = (
                        f"first diff row {i}: spark={a} oracle={b} cols={sc}"
                        f" dtype_drift={[(c, sdt[c], odt[c]) for c in drift]}"
                    )
                    break
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": len(spdf),
        "oracle_rows": len(opdf),
        "sec": round(time.time() - t0, 2),
        "detail": detail,
    }


def main(argv: list[str]) -> int:
    from redis_dataflow_realtime_analytics_spark import registry
    from redis_dataflow_realtime_analytics_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from tests.oracle import duck_con

    keys = argv or list(registry.ORACLE)
    unknown = [k for k in keys if k not in registry.ORACLE]
    if unknown:
        print(f"not oracled keys: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark()
    con = duck_con(SF_DIR)
    bad = []
    for name in keys:
        try:
            rec = check_key(spark, con, name)
        except Exception as e:  # noqa: BLE001 — report and continue like the driver
            rec = {"hash_match": False, "detail": f"ERR {type(e).__name__}: {e}"}
        ok = rec.get("hash_match")
        mark = "ok " if ok else "FAIL"
        print(f"{mark} {name:45s} rows={rec.get('spark_rows')} {rec.get('sec', '')}s {rec.get('detail', '')[:300]}")
        if not ok:
            bad.append(name)
    print(f"\n{len(keys) - len(bad)}/{len(keys)} green")
    if bad:
        print(f"RED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
