"""Parquet table access for the driver's testdata star schema.

Reference parity: the reference caches one CSV per symbol and re-reads it
(core/data/cdd.py:88-100); here every table is columnar Parquet read
through the DataSource V2 scan, which gives predicate pushdown, column
pruning, and (on a cluster) split-per-rowgroup parallelism for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# testdata columns physically stored as TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they surface as long and are
# converted to microsecond timestamps here (floor-truncated, matching
# DuckDB's nanos→micros read of the same files)
_NANO_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer division: nanos exceed 2^53, double math would
            # round the low digits
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` table viewed as the OHLCV-like per-symbol series the
    reference operates on (symbol := user_id, datetime := ts,
    close := value). Column pruning here reaches the parquet scan.
    """
    return load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("datetime"),
        F.col("value").alias("close"),
        F.col("event_id"),
    )
