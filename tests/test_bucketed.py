"""Bucketed-table contracts: a write-time shuffle buys shuffle-free
joins and aggregates on the bucket key — asserted against the physical
plan, since that no-Exchange property IS the feature."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_and_agg_are_shuffle_free(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    facts = ev.select("event_id", "user_id", "value")
    dims = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
    )
    write_bucketed(
        facts, "b_facts", str(tmp_path / "b_facts"), "user_id", 4
    )
    write_bucketed(dims, "b_dims", str(tmp_path / "b_dims"), "user_id", 4)
    try:
        bf, bd = read_bucketed(spark, "b_facts"), read_bucketed(spark, "b_dims")

        # co-located join: same key, same bucket count -> zero Exchange
        joined = bf.join(bd.hint("merge"), "user_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        # key-aligned aggregate: zero Exchange
        agg = bf.groupBy("user_id").agg(F.sum("value").alias("s"))
        assert "Exchange" not in _plan(agg)

        # results match the unbucketed computation
        plain = facts.join(dims, "user_id")
        assert joined.count() == plain.count()
        assert joined.exceptAll(plain).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """A time predicate on the date-partitioned layout must prune at
    the PARTITION level (directory listing), not merely filter rows
    after a full scan."""
    from big_data_stock_price_forecast_spark.sources.layout import (
        DATE_COL,
        read_time_partitioned,
        write_time_partitioned,
    )

    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_date")
    write_time_partitioned(ev, path)

    back = read_time_partitioned(spark, path)
    # same data round-trips (modulo the added partition column)
    assert back.count() == ev.count()

    dates = sorted(r[0] for r in back.select(DATE_COL).distinct().collect())
    assert len(dates) > 1
    one_day = back.filter(F.col(DATE_COL) == F.lit(dates[0]))
    plan = _plan(one_day)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert DATE_COL in pf
    # and the pruned read returns exactly that day's rows
    expect = ev.filter(F.to_date("ts") == F.lit(dates[0])).count()
    assert one_day.count() == expect
