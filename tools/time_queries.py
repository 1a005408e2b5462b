"""Time individual registry queries with the noop sink, N runs each.

Usage: python tools/time_queries.py [-n RUNS] [sf_dir] query [query ...]

Mirrors bench.py methodology (same warmup, same noop sink, same
clearCache + leaked-block hygiene between runs) but scoped to the named
queries so a single plan can be measured in isolation. Run-1 vs run-2
separates one-time cost (codegen compile, scan listing) from
steady-state plan cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n_runs = 2
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args

    from big_data_stock_price_forecast_spark.plans.registry import all_queries
    from big_data_stock_price_forecast_spark.session import get_spark

    spark = get_spark(
        app_name="time-queries",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same JVM warmup as bench.py (codegen path, window exec, Arrow)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    warm = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    warm.groupBy("user_id").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()
    warm.select(
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("event_id"))
        .alias("rn")
    ).write.format("noop").mode("overwrite").save()
    warm.limit(64).mapInPandas(lambda it: it, schema=warm.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    def _drop_leaked(spark) -> None:
        try:
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist(False)
        except Exception:  # noqa: BLE001
            pass

    qs = all_queries()
    out = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                runs.append(f"ERROR {type(e).__name__}: {str(e)[:200]}")
                break
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            _drop_leaked(spark)
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
