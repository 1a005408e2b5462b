"""Ingestion contracts (SURVEY.md §2.1 S1-S8): pagination, cursor
advance, empty-range skip, bronze landing, silver keep-last merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.ingest import (
    HOUR_MS,
    default_start_ms,
    fetch_paginated,
    ingest,
    land_pages,
    read_bronze,
    silver_series,
    synthetic_exchange,
    validate_timeframe,
)


def test_timeframe_validation():
    assert validate_timeframe("1h") == HOUR_MS
    with pytest.raises(ValueError, match="not supported"):
        validate_timeframe("7m")


def test_default_start_from_total():
    assert default_start_ms(1_000 * HOUR_MS, 24, "1h") == 976 * HOUR_MS


def test_pagination_advances_cursor_and_caps_total():
    fetch = synthetic_exchange()
    rows, stats = fetch_paginated(fetch, "BTC/USD", 1_577_836_800_000, 2500,
                                  max_per_page=1000)
    assert len(rows) == 2500
    assert stats.pages >= 3  # 1000 + 1000 + 500
    ts = [r[0] for r in rows]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    # the synthetic outage candles are genuinely absent
    deltas = {b - a for a, b in zip(ts, ts[1:])}
    assert HOUR_MS in deltas and 2 * HOUR_MS in deltas


def test_empty_range_skip_advances_by_ten_days():
    calls = []

    def fetch(symbol, since, limit):
        calls.append(since)
        if len(calls) < 3:
            return []  # dead zone: force two S8 skips
        return synthetic_exchange()(symbol, since, limit)

    rows, stats = fetch_paginated(fetch, "BTC/USD", 0, 10)
    assert stats.empty_skips == 2
    assert calls[1] - calls[0] == 10 * 24 * HOUR_MS
    assert len(rows) == 10


def test_bronze_to_silver_keep_last_merge(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    fetch = synthetic_exchange()
    start = 1_577_836_800_000
    first, _ = fetch_paginated(fetch, "BTC/USD", start, 500)
    land_pages(spark, bronze, "BTC/USD", first, fetch_seq=0, page_rows=200)

    # refetch overlapping the tail with corrected values (close + 1)
    overlap_start = first[-100][0]
    second, _ = fetch_paginated(fetch, "BTC/USD", overlap_start, 150)
    second = [[r[0], r[1], r[2], r[3], r[4] + 1.0, r[5]] for r in second]
    land_pages(spark, bronze, "BTC/USD", second, fetch_seq=1, page_rows=200)

    silver = silver_series(read_bronze(spark, bronze))
    # one row per timestamp, later fetch wins on the overlap
    assert (
        silver.groupBy("symbol", "datetime").count().filter("count > 1").count()
        == 0
    )
    over = silver.filter(
        F.col("datetime") == F.timestamp_millis(F.lit(overlap_start))
    ).collect()[0]
    base = next(r for r in first if r[0] == overlap_start)
    assert over["close"] == base[4] + 1.0


def test_ingest_end_to_end(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = ingest(spark, bronze, ["BTC/USD", "ETH/USD"], total=300)
    counts = dict(
        (r["symbol"], r["count"])
        for r in silver.groupBy("symbol").count().collect()
    )
    assert counts == {"BTC/USD": 300, "ETH/USD": 300}
    # typed schema out of silver
    assert dict(silver.dtypes)["datetime"] == "timestamp"
    assert dict(silver.dtypes)["close"] == "double"


def test_bronze_landing_feeds_streaming_source(spark, tmp_path):
    """The file-per-page bronze layout IS the streaming contract: a
    readStream over the landing dir with maxFilesPerTrigger=1 replays
    the pages as micro-batches; a streaming keep-first dedup on
    (symbol, ts) yields exactly the distinct candle keys."""
    from pyspark.sql import functions as F

    from big_data_stock_price_forecast_spark.streaming import (
        distinct_keys_stream,
        run_available_now,
    )

    bronze = str(tmp_path / "bronze")
    fetch = synthetic_exchange()
    start = 1_577_836_800_000
    rows, _ = fetch_paginated(fetch, "BTC/USD", start, 600)
    land_pages(spark, bronze, "BTC/USD", rows, fetch_seq=0, page_rows=200)
    # overlapping refetch generation -> duplicate keys across batches
    rows2, _ = fetch_paginated(fetch, "BTC/USD", rows[-200][0], 250)
    land_pages(spark, bronze, "BTC/USD", rows2, fetch_seq=1, page_rows=200)

    schema = spark.read.parquet(bronze + "/*.parquet").schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(bronze + "/*.parquet")
        .select(
            F.col("symbol"),
            F.timestamp_millis(F.col("ts_ms")).alias("datetime"),
        )
    )
    out = run_available_now(
        distinct_keys_stream(sdf, ["symbol", "datetime"], "datetime"),
        "append",
    )
    distinct_keys = {r[0] for r in rows} | {r[0] for r in rows2}
    assert out.count() == len(distinct_keys)
