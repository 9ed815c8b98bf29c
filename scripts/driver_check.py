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


def _canon(cols, rows):
    """Mirror the driver's pandas-style canonical form closely enough to
    catch dtype drift: sorted columns, sorted stringified rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            r = round(v, 6)
            # driver stringifies the float64 cell: 123.0 stays "123.0"
            return repr(r)
        if isinstance(v, bool):
            return repr(v)
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def check_key(spark, con, name: str) -> dict:
    from redis_dataflow_realtime_analytics_spark import registry

    t0 = time.time()
    df = registry.QUERIES[name](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    res = con.sql(registry.ORACLE[name])
    o_cols = [d[0] for d in res.description]
    # fetchall() gives Python scalars; DuckDB HUGEINT -> float via .df()
    # in the driver, so detect it from the declared types instead.
    o_types = [str(d[1]) for d in res.description]
    o_rows = res.fetchall()
    # Driver reads the oracle through pandas: HUGEINT/DECIMAL columns land
    # as float64 there. Simulate by coercing those columns to float.
    coerce = [i for i, t in enumerate(o_types) if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
    if coerce:
        o_rows = [
            tuple(float(v) if i in coerce and v is not None else v for i, v in enumerate(r))
            for r in o_rows
        ]

    rows_match = len(s_rows) == len(o_rows)
    schema_match = sorted(s_cols) == sorted(o_cols)
    hash_match = False
    detail = ""
    if rows_match and schema_match:
        sc, sr = _canon(s_cols, s_rows)
        _, orr = _canon(o_cols, o_rows)
        hash_match = sr == orr
        if not hash_match:
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    detail = f"first diff row {i}: spark={a} oracle={b} cols={sc}"
                    break
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
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
