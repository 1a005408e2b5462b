"""Bucketed parquet tables — the co-located join/aggregate path.

At 100 TB the dominant cost of a fact-fact join or a high-cardinality
aggregate is the shuffle. Hash-bucketing a table at WRITE time
(`bucketBy(n, key)`) pins each row's bucket by key hash, so every later
join or groupBy on that key reads pre-clustered data: Catalyst drops
the Exchange entirely (bucketed scan satisfies the required
HashClusteredDistribution) and a sort-merge join runs map-side.
Re-used across many queries, one write-time shuffle amortizes into
zero read-time shuffles — the same contract as Hive bucketing or
Iceberg's bucket partition transform.

Reference parity: the reference caches one CSV per symbol
(core/data/cdd.py:88-100), which is exactly a 1-bucket-per-key layout;
this is its cluster-scale generalization.

The bucket metadata lives in the session catalog (`saveAsTable` with an
explicit path — plain parquet files plus catalog bucket spec; no Hive
metastore needed). Tests assert the no-Exchange plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Write ``df`` as a bucketed, bucket-sorted parquet table
    registered as ``table``. One shuffle now; none on every subsequent
    key-aligned join/aggregate."""
    (
        df.write.format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (reading the
    parquet path directly would lose the bucket spec and with it the
    no-shuffle property)."""
    return spark.table(table)
