"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given SF, compare row count, column names, and (column-name-sorted,
row-sorted) values. Exact match required for non-floats; floats compared
bitwise first, then with 1e-9 tolerance reported separately.

Usage: python tools/validate_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    # +0.0 collapses -0.0/0.0 so row alignment is zero-sign-insensitive
    return tuple(
        (v is None, str(type(v)), str(v + 0.0) if isinstance(v, float) else str(v))
        for v in row
    )


def main():
    from __spark_entry__ import oracle_sql, queries

    if os.environ.get("BDSPF_PLAIN_SESSION"):
        # emulate the driver's gate exactly: a bare session with none
        # of our configs — every query must self-provision (timezone,
        # nanos flag) through the __spark_entry__ wrappers
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").getOrCreate()
    else:
        from big_data_stock_price_forecast_spark.session import get_spark

        spark = get_spark(
            app_name="oracle-validate", cpus=16, shuffle_partitions=16
        )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(SF_DIR)

    qs, os_ = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in os_:
            print(f"SKIP  {name}: no oracle (rows-only)")
            try:
                n = fn(spark, SF_DIR).count()
                print(f"      rows={n}")
            except Exception as e:
                failures.append(name)
                print(f"ERROR {name}: {e}")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            # the driver's pandas canonicalizer crashes on non-atomic
            # output columns (sort_values → unhashable 'list'); the
            # old tuple-izing canon() masked that (emb_pq_codes, r6).
            # Mirror the driver: reject nested top-level types.
            nested = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if nested:
                failures.append(name)
                print(
                    f"FAIL  {name}: nested output column(s) {nested} — "
                    f"the driver gate cannot canonicalize Array/Map/"
                    f"Struct; serialize to an atomic column"
                )
                continue
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(canon(r[c]) for c in scols) for r in sdf.collect()),
                key=_sort_key,
            )
        except Exception as e:
            failures.append(name)
            print(f"ERROR {name} (spark): {type(e).__name__}: {str(e)[:300]}")
            continue
        try:
            ddf = con.sql(os_[name])
            # the driver canonicalizes through pandas, where DuckDB's
            # HUGEINT (e.g. sum(BIGINT)) lands as float64 while Spark
            # emits int64 — value-equal rows that hash differently.
            # fetchall() below hides that (Python ints), so flag the
            # type directly. (This was events_json_agg's r1-r4 fail.)
            huge = [
                c
                for c, t in zip(ddf.columns, ddf.types)
                if str(t) == "HUGEINT"
            ]
            if huge:
                failures.append(name)
                print(
                    f"FAIL  {name}: oracle emits HUGEINT column(s) "
                    f"{huge} — cast to BIGINT/DOUBLE in the SQL"
                )
                continue
            dcols_raw = ddf.columns
            dcols = sorted(dcols_raw)
            idx = [dcols_raw.index(c) for c in dcols]
            drows = sorted(
                (tuple(canon(row[i]) for i in idx) for row in ddf.fetchall()),
                key=_sort_key,
            )
        except Exception as e:
            failures.append(name)
            print(f"ERROR {name} (duckdb): {type(e).__name__}: {str(e)[:300]}")
            continue

        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            continue
        mismatch = None
        n_diff = 0
        max_reldiff = 0.0
        for a, b in zip(srows, drows):
            if a != b:
                n_diff += 1
                if mismatch is None:
                    mismatch = (a, b)
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        if x != y:
                            denom = max(abs(x), abs(y), 1e-30)
                            max_reldiff = max(max_reldiff, abs(x - y) / denom)
        if n_diff == 0:
            print(f"OK    {name}: {len(srows)} rows exact")
        else:
            failures.append(name)
            print(
                f"FAIL  {name}: {n_diff}/{len(srows)} differing rows, "
                f"max float reldiff {max_reldiff:.2e}"
            )
            print(f"      spark: {mismatch[0]}")
            print(f"      duck : {mismatch[1]}")

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
