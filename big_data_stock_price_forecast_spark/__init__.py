"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``nsarang/big-data-stock-price-forecast``
(time-series analogical forecasting) re-expressed Spark-first, plus
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, UTC, Arrow).
- ``sources``    : parquet table loading, OHLCV ingestion-shaped helpers.
- ``functions``  : column-level expression helpers (distances, z-score,
                   calendar, text) — all JVM-side ``pyspark.sql.functions``
                   compositions, no Python row UDFs.
- ``operators``  : DataFrame -> DataFrame operators mirroring SURVEY.md §2
                   (cleaning, resample, gap fill, rolling, windows, k-NN,
                   forecast, dedup, text).
- ``plans``      : composed end-to-end pipelines (the flagship query).
- ``streaming``  : Structured Streaming flavors of ingest/resample/dedup.
"""

__version__ = "0.1.0"
