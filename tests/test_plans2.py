"""Physical-plan contracts for the round-6 session-4 queries: the
properties that keep them 100 TB-shaped — dim-only broadcasts on the
TPC-H tail, no cartesian/nested-loop joins in the pair-heavy graph and
correlation queries, single-exchange window families, and pure-JVM hot
paths."""

from __future__ import annotations

from big_data_stock_price_forecast_spark.plans.registry import (
    q_events_assoc_rules,
    q_events_attribution,
    q_events_cohort_matrix,
    q_events_markov_transitions,
    q_events_path_trigrams,
    q_graph_hits_parts,
    q_graph_supplier_triangles,
    q_part_skyline,
    q_ts_cusum_alarms,
    q_ts_drawdown,
    q_ts_symbol_corr_matrix,
    q_tpch_q2_min_cost_supplier,
    q_tpch_q9_product_profit,
    q_tpch_q16_supplier_cnt,
    q_tpch_q20_promotion_supp,
    q_tpch_q21_waiting_supp,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_fact_broadcast(plan: str, fact: str = "lineitem") -> None:
    """No broadcast side may contain RAW fact rows. A fact scan under a
    broadcast is allowed only when an aggregate reduces it first (Q20's
    HAVING-cut key set: output bounded by the key domain, not the
    fact)."""
    for frag in plan.split("BroadcastExchange")[1:]:
        scan_src = frag.split("Scan parquet", 1)
        if len(scan_src) > 1 and fact in scan_src[1].split("\n", 1)[0]:
            assert "HashAggregate" in scan_src[0]


def test_tpch_tail_never_broadcasts_the_fact(spark):
    """Q2/Q9/Q16/Q20 broadcast dims (part/supplier/nation/region) into
    the lineitem scan; the fact side itself must never sit under a
    BroadcastExchange."""
    for fn in (
        q_tpch_q2_min_cost_supplier,
        q_tpch_q9_product_profit,
        q_tpch_q16_supplier_cnt,
        q_tpch_q20_promotion_supp,
    ):
        plan = _plan(fn(spark, SF))
        _no_fact_broadcast(plan)
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_q21_is_one_fact_aggregate_not_self_joins(spark):
    """The EXISTS/NOT-EXISTS correlation must run as the collapsed
    orderkey-grouped aggregate: lineitem is scanned at most twice (the
    late-line set and the per-order aggregate share the join), never
    the textbook four times, and no nested-loop join appears."""
    plan = _plan(q_tpch_q21_waiting_supp(spark, SF))
    assert plan.count("lineitem.parquet") == 2
    assert plan.count("orders.parquet") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_graph_queries_stay_equi_join(spark):
    """HITS and triangle counting are join-heavy by nature; they must
    execute as hash/sort-merge EQUI joins — a nested-loop join here is
    quadratic at corpus scale."""
    for fn in (q_graph_hits_parts, q_graph_supplier_triangles):
        plan = _plan(fn(spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_corr_matrix_join_is_equi_on_time(spark):
    """The all-pairs correlation join must be an equi-join on
    time_idx (k-bounded per bucket), never a cartesian pairing."""
    plan = _plan(q_ts_symbol_corr_matrix(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_analytics_are_pure_jvm(spark):
    """The new window/aggregate analytics must stay out of
    Python/Arrow — they are documented JVM-only paths."""
    for fn in (
        q_events_attribution,
        q_events_cohort_matrix,
        q_events_assoc_rules,
        q_events_markov_transitions,
        q_events_path_trigrams,
        q_ts_drawdown,
        q_ts_cusum_alarms,
        q_part_skyline,
    ):
        plan = _plan(fn(spark, SF))
        assert "Python" not in plan and "ArrowEval" not in plan, fn.__name__


def test_attribution_and_paths_single_user_exchange(spark):
    """The attribution window and the trigram LEADs each cluster on
    user_id: one hash exchange before the (tiny) report aggregate."""
    plan = _plan(q_events_attribution(spark, SF))
    # one exchange for the user window + one for the 3-row channel agg
    assert plan.count("Exchange hashpartitioning") <= 2
    plan = _plan(q_events_markov_transitions(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 3


def test_new_ts_family_exchange_budget(spark):
    """Single-pass window operators stay at ONE symbol exchange;
    two-pass (calibrate-then-score) operators get at most four —
    a regression here means a lost exchange reuse."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_autocorrelation,
        q_ts_cusum_alarms,
        q_ts_drawdown,
        q_ts_rolling_corr,
        q_ts_seasonal_decompose,
        q_ts_var_es,
    )

    one_pass = (q_ts_drawdown, q_ts_var_es, q_ts_rolling_corr)
    two_pass = (q_ts_cusum_alarms, q_ts_autocorrelation, q_ts_seasonal_decompose)
    for fn in one_pass:
        plan = _plan(fn(spark, SF))
        assert plan.count("Exchange hashpartitioning") <= 1, fn.__name__
        assert "Python" not in plan and "CartesianProduct" not in plan
    for fn in two_pass:
        plan = _plan(fn(spark, SF))
        assert plan.count("Exchange hashpartitioning") <= 4, fn.__name__
        assert "Python" not in plan and "CartesianProduct" not in plan


def test_topk_window_group_limit_is_pushed_below_exchange(spark):
    """Pin the map-side partial top-k both brute-force k-NN and the
    BQ Hamming scan depend on (r8 verdict): Spark >= 3.5's
    InferWindowGroupLimit must insert a WindowGroupLimit BELOW the
    per-query exchange, so each task keeps only k (resp. rerank)
    candidates per query instead of shipping the full N x Q rank
    input through the shuffle. If a Spark upgrade or a conf change
    (spark.sql.optimizer.windowGroupLimitThreshold = -1) silently
    drops the rewrite, these queries degrade from a skinny top-k
    shuffle to a full sort of the candidate set — this test makes
    that failure loud."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_bq_hamming_topk,
        q_knn_topk_metrics,
    )

    for fn in (q_knn_topk_metrics, q_emb_bq_hamming_topk):
        plan = _plan(fn(spark, SF))
        assert "WindowGroupLimit" in plan, fn.__name__
        # the PARTIAL (pre-shuffle, map-side) instance must sit below
        # the exchange: in executedPlan text the Partial-mode node
        # appears as a separate WindowGroupLimit under the Exchange
        # subtree, i.e. after the Exchange line in tree order
        for frag in plan.split("Exchange hashpartitioning")[1:]:
            if "row_number" in frag and "WindowGroupLimit" in frag:
                break
        else:
            raise AssertionError(
                f"{fn.__name__}: no map-side (below-exchange) "
                "WindowGroupLimit — partial top-k rewrite is gone"
            )


def test_indicators5_stays_single_shuffle(spark):
    """The in-pass derived tail exists precisely so the full ~85-column
    indicator pipeline keeps ONE data exchange (the battery's groupBy):
    an applyInPandas output carries no partitioning metadata, so any
    post-battery Window would re-shuffle the whole frame. Pin it: a
    regression (someone 'simplifying' back to the native twin in the
    registry query) doubles the pipeline's shuffle bytes."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_indicators5,
        q_ts_recursive_battery,
    )

    base = _plan(q_ts_recursive_battery(spark, SF)).count(
        "Exchange hashpartitioning"
    )
    tail = _plan(q_ts_indicators5(spark, SF)).count(
        "Exchange hashpartitioning"
    )
    assert tail == base == 1


def test_round10_global_topk_uses_take_ordered(spark):
    """The round-10 global top-25 queries (Adamic-Adar, RAKE) must
    plan as TakeOrderedAndProject — map-side partial top-k per input
    partition, one k-row merge — NOT an unpartitioned row_number
    window, which InferWindowGroupLimit does NOT rewrite (empty
    partition spec) and which would sort every candidate pair/phrase
    in a single task. The rank window that remains runs over the 25
    survivors only."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_rake_keyphrases,
        q_graph_adamic_adar,
    )

    for fn in (q_graph_adamic_adar, q_doc_rake_keyphrases):
        plan = _plan(fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, fn.__name__


def test_global_topk_audit_uses_take_ordered(spark):
    """Round-11 sweep of every PRE-round-10 query whose output is a
    globally ranked/limited frame (r10 verdict finding #1): each must
    plan its global cut as TakeOrderedAndProject, never an
    unpartitioned row_number over a data-sized frame. BM25 was the one
    offender (fixed r11); the rest were already orderBy+limit shaped —
    this pin keeps them that way."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bm25_topk,
        q_doc_textrank_terms,
        q_doc_zipf_fit,
        q_events_skew_report,
    )

    for fn in (
        q_doc_bm25_topk,
        q_doc_textrank_terms,
        q_doc_zipf_fit,
        q_events_skew_report,
        q_graph_hits_parts,
    ):
        plan = _plan(fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, fn.__name__


def test_round10_perclass_topk_gets_window_group_limit(spark):
    """The per-class top-5 (c-TF-IDF) keeps its partitioned
    row_number window, so it must get the map-side WindowGroupLimit
    rewrite (same contract as the k-NN/BQ pins above)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_ctfidf_class_terms,
    )

    plan = _plan(q_doc_ctfidf_class_terms(spark, SF))
    assert "WindowGroupLimit" in plan
