"""Dump ``explain("formatted")`` for registry queries to text files.

Usage: python tools/explain_dump.py <out_dir> <suffix> [sf_dir] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (all
queries when none named). The optimization-round evidence trail:
``plans/r15/<q>_before.txt`` / ``_after.txt``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from big_data_stock_price_forecast_spark.plans.registry import all_queries
    from big_data_stock_price_forecast_spark.session import get_spark

    spark = get_spark(app_name="explain-dump", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = all_queries()
    names = only or list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — report, keep going
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
