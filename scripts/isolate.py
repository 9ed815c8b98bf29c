#!/usr/bin/env python3
"""Isolated per-query measurement (guide §1): run the named queries in a
fresh session, each N times into the noop sink, print min/all times, and
optionally dump .explain("formatted") to plans/<round>/<name>_<tag>.txt
(round from $SPARK_GRAFT_PLANS_ROUND, default r11).

    python scripts/isolate.py [--plans TAG] [--n 3] name [name ...]

Timing methodology matches bench.py (construction + noop write, min of N,
clearCache between runs) so numbers are comparable run-for-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_dataflow_realtime_analytics_spark import registry
from redis_dataflow_realtime_analytics_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain(formatted) as <name>_<TAG>.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="isolate")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ident(s):
        return s

    _ident.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(1_000).select(pandas_udf(_ident, "long")("id")).collect()

    for name in args.names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        if args.plans:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({"query": name, "min": min(runs), "runs": runs}), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
