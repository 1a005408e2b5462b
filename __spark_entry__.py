"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship analogical-forecast pipeline
(SURVEY.md §3.3) on sf0.001. ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB oracles
(every query except win_vae_embed, whose iterative training loop is
non-SQL-expressible and takes the driver's rows-only check); see
``big_data_stock_price_forecast_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_stock_price_forecast_spark.plans.registry import (
    all_oracles,
    all_queries,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from big_data_stock_price_forecast_spark.plans.registry import q_flagship

    return q_flagship(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the testdata parquet stores TIMESTAMP(NANOS); this must be
            # set before any scan (no-op if the session already has it)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # timestamps are stored NTZ; every NTZ->instant cast
            # (streaming watermarks, unix_micros, timestamp literals)
            # must interpret them as UTC to match the DuckDB oracle's
            # naive read regardless of the harness session's zone
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/types)."""
    return all_oracles()
