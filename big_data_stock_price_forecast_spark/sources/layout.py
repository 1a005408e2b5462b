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


# --------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-dimensional layout
# --------------------------------------------------------------------------


def zorder_terms(x: str, y: str, bits: int = 10) -> str:
    """Fully-parenthesized SQL expression interleaving the low ``bits``
    bits of integer expressions ``x`` (even positions) and ``y`` (odd
    positions) into a Morton key. The SAME string parses in Spark SQL
    and DuckDB (only >>/<<//&/+ on integers, parenthesized against
    their differing precedence), so the engine column and any oracle
    share one definition. Unrolled, not a lambda fold: 2*bits codegen-
    friendly integer ops, no higher-order function in the hot path."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(x: str, y: str, bits: int = 10):
    """Morton key Column from two integer column expressions."""
    return F.expr(zorder_terms(x, y, bits))


def write_zorder_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 10,
    num_files: int = 8,
) -> None:
    """Z-order-clustered parquet: range-partition on the Morton key of
    (x, y), so each output file covers a compact rectangle-ish region
    of the 2-D key space and its parquet min/max statistics are tight
    on BOTH columns — a predicate on either dimension prunes most
    files/row-groups, where a single-column sort clusters only its
    leading column. This is the lakehouse Z-ORDER/OPTIMIZE layout for
    the two-predicate scan pattern (key range x time range) at 100 TB;
    the linear sort in sources/layout.py:write_time_partitioned is the
    one-predicate special case. Cost: one range exchange + local sort,
    identical shape to any clustered write."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
