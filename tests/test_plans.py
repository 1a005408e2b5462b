"""Physical-plan contracts: the properties that make these queries
survive a 100x scale-up, asserted against `.explain` output so a
refactor that silently reintroduces a scale-killer (fact-table
broadcast, lost filter pushdown, extra shuffle, Python in a JVM-only
path) fails CI instead of failing at 100 TB.

Plans are inspected on the sf0.001 smoke data — the *shape* of the
plan (join strategy modulo AQE, pushdown, exchange count) is what is
being pinned, not its runtime.
"""

from __future__ import annotations

from big_data_stock_price_forecast_spark.plans.registry import (
    q_doc_exact_dup_groups,
    q_events_sessionize,
    q_top_revenue_nations,
    q_ts_time_filter,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_filter_pushes_down_to_scan(spark):
    """The 7-day head filter must reach the parquet scan as a pushed
    predicate — a scan that reads everything and filters later reads
    the whole 100 TB."""
    plan = _plan(q_ts_time_filter(spark, SF))
    assert "PushedFilters: [" in plan
    # the ts bound is in the pushed list, not only in a post-scan Filter
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "ts" in pushed


def test_top_revenue_nations_broadcasts_dims_only(spark):
    """Dimension tables (nation, 25 rows) may broadcast; the lineitem
    fact side must never appear under a BroadcastExchange."""
    plan = _plan(q_top_revenue_nations(spark, SF))
    for frag in plan.split("BroadcastExchange")[1:]:
        # the scan feeding each broadcast must not be the fact table
        scan_src = frag.split("Scan parquet", 1)
        if len(scan_src) > 1:
            assert "lineitem" not in scan_src[1].split("\n", 1)[0]


def test_sessionize_single_exchange(spark):
    """Lag window, cumulative session counter, and per-session
    aggregate all cluster on user_id: exactly one hash exchange."""
    plan = _plan(q_events_sessionize(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_exact_dup_groups_partial_aggregation(spark):
    """The hash-groupBy dedup must partially aggregate map-side
    (two HashAggregate levels around one exchange), the property that
    keeps the shuffle proportional to group count, not row count."""
    plan = _plan(q_doc_exact_dup_groups(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_jvm_only_queries_have_no_python_stage(spark):
    """Queries documented as pure-JVM must stay out of Python/Arrow:
    row-at-a-time (or even vectorized) Python in these hot paths is the
    10-100x slowdown the engine is designed to avoid."""
    for fn in [
        q_ts_time_filter,
        q_events_sessionize,
        q_doc_exact_dup_groups,
        q_top_revenue_nations,
    ]:
        plan = _plan(fn(spark, SF))
        assert "Python" not in plan and "ArrowEval" not in plan, fn.__name__


def test_flagship_plan_has_no_cartesian_or_fact_broadcast(spark):
    """The flagship forecast pipeline is the deepest plan in the
    engine: pin the two properties that would silently kill it at
    100x — a cartesian product, or a broadcast of the windows/fact
    side (only small query/dim frames may broadcast)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_flagship,
    )

    plan = _plan(q_flagship(spark, SF))
    assert "CartesianProduct" not in plan


def test_range_join_matches_theta_join_and_stays_equi(spark):
    """Bucketized range join must equal the naive theta join row-for-row
    and must execute as a hash/sort-merge EQUI join (no
    BroadcastNestedLoop / cartesian, which is what a non-equi condition
    degenerates to)."""
    import random

    from pyspark.sql import functions as F

    from big_data_stock_price_forecast_spark.operators.rangejoin import (
        range_join,
    )

    rng = random.Random(11)
    rows = [
        (u, i, rng.randrange(0, 500))
        for i, u in enumerate(rng.choices(range(5), k=300))
    ]
    df = spark.createDataFrame(rows, ["k", "rid", "ts"])
    left = df.select("k", F.col("rid").alias("lid"), F.col("ts").alias("__lts"))
    right = df.select("k", F.col("rid").alias("rid2"), F.col("ts").alias("__rts"))
    H = 37
    got = {
        (r["k"], r["lid"], r["rid2"])
        for r in range_join(left, right, ["k"], H).collect()
    }
    want = {
        (r["k"], r["lid"], r["rid2"])
        for r in left.join(
            right,
            (left.k == right.k)
            & (right.__rts > left.__lts)
            & (right.__rts <= left.__lts + H),
        )
        .select(left.k, "lid", "rid2")
        .collect()
    }
    assert got == want and got

    plan = range_join(left, right, ["k"], H)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
