"""Lake layout for time-series at scale: date-partitioned,
within-partition-sorted parquet.

Directory partitioning on the event date gives PARTITION PRUNING — a
query with a time predicate never opens files outside its range, which
at 100 TB is the difference between scanning a day and scanning three
years. Sorting within partitions by (key, time) gives parquet row-group
min/max statistics that prune further within each file, and clusters
each key's rows for cheap downstream windowing. This is the write-side
twin of the engine's read-side pushdown contract (tests assert the
filter actually reaches PartitionFilters, not just a post-scan
Filter).

Reference parity: the reference appends candles to one CSV per symbol
(core/data/cdd.py:88-110); this is that cache's cluster-scale layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_COL = "__date"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: tuple[str, ...] = ("user_id", "ts"),
) -> None:
    """Write ``df`` partitioned by the date of ``ts_col``, sorted by
    ``sort_cols`` within each file."""
    (
        df.withColumn(DATE_COL, F.to_date(F.col(ts_col)))
        .repartition(F.col(DATE_COL))
        .sortWithinPartitions(*sort_cols)
        .write.partitionBy(DATE_COL)
        .mode("overwrite")
        .parquet(path)
    )


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
