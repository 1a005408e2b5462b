"""Contracts for the second round-6 analytics batch: cohort retention
matrix, association rules, max drawdown, forecast baselines
(naive/drift/seasonal with MAE/sMAPE/MASE), and supplier triangle
counting."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    ASSOC_MIN_USERS,
    FC_SEASON,
    TRIANGLE_TOP_EDGES,
    q_events_assoc_rules,
    q_events_cohort_matrix,
    q_graph_supplier_triangles,
    q_ts_drawdown,
    q_ts_forecast_baselines,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_cohort_matrix_reconciles_with_user_population(spark, sf_dir):
    out = q_events_cohort_matrix(spark, sf_dir).collect()
    assert out
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # offset-0 cell of every cohort counts the whole cohort; summing
    # them accounts for every user exactly once
    week0 = [r for r in out if r["week_offset"] == 0]
    assert sum(r["n_users"] for r in week0) == n_users
    for r in out:
        assert r["week_offset"] >= 0 and r["n_users"] >= 1
    # retention can never exceed the cohort's size
    size = {r["cohort_week"]: r["n_users"] for r in week0}
    for r in out:
        assert r["n_users"] <= size[r["cohort_week"]]


def test_assoc_rules_match_python_counter(spark, sf_dir):
    out = {(r["ante"], r["cons"]): r for r in
           q_events_assoc_rules(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct().collect()
    baskets = defaultdict(set)
    for r in ev:
        baskets[r["user_id"]].add(r["event_type"])
    n_users = len(baskets)
    item: Counter = Counter()
    pair: Counter = Counter()
    for types in baskets.values():
        for t in types:
            item[t] += 1
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                pair[(a, b)] += 1
    expect = {k: v for k, v in pair.items() if v >= ASSOC_MIN_USERS}
    assert set(out) == set(expect)
    for (a, b), r in out.items():
        assert r["n_both"] == expect[(a, b)]
        assert abs(r["support"] - expect[(a, b)] / n_users) < 1e-12
        assert abs(r["confidence"] - expect[(a, b)] / item[a]) < 1e-12
        assert abs(
            r["lift"] - expect[(a, b)] * n_users / (item[a] * item[b])
        ) < 1e-9
        assert 0 < r["support"] <= 1 and 0 < r["confidence"] <= 1


def test_drawdown_is_nonpositive_and_trough_is_earliest_min(spark, sf_dir):
    out = q_ts_drawdown(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["max_drawdown"] <= 0.0
    # replay one symbol in python
    from big_data_stock_price_forecast_spark.plans.registry import _filled

    sym = out[0]["symbol"]
    rows = sorted(
        _filled(spark, sf_dir).filter(F.col("symbol") == sym).collect(),
        key=lambda r: r["time_idx"],
    )
    peak, best, best_t = -math.inf, math.inf, None
    for r in rows:
        peak = max(peak, r["close"])
        dd = (r["close"] - peak) / peak if peak != 0 else None
        if dd is not None and dd < best:
            best, best_t = dd, r["time_idx"]
    got = next(r for r in out if r["symbol"] == sym)
    assert abs(got["max_drawdown"] - best) < 2e-6
    assert got["trough_time_idx"] == best_t


def test_forecast_baselines_replay_one_symbol(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        FC_TRAIN_FRAC,
        _filled,
    )

    out = q_ts_forecast_baselines(spark, sf_dir).collect()
    assert out
    assert {r["method"] for r in out} == {"naive", "drift", "seasonal"}
    sym = out[0]["symbol"]
    series = [
        r["close"]
        for r in sorted(
            _filled(spark, sf_dir).filter(F.col("symbol") == sym).collect(),
            key=lambda r: r["time_idx"],
        )
    ]
    n = len(series)
    n_train = max(int(math.floor(n * FC_TRAIN_FRAC)), FC_SEASON + 1)
    train, test = series[:n_train], series[n_train:]
    mase_scale = sum(
        math.floor(abs(a - b) * 1e6 + 0.5) / 1e6
        for a, b in zip(train[1:], train[:-1])
    ) / (n_train - 1)
    season = train[-FC_SEASON:]
    slope = (train[-1] - train[0]) / (n_train - 1)
    for method in ("naive", "drift", "seasonal"):
        fcs = []
        for h in range(1, len(test) + 1):
            if method == "naive":
                fcs.append(train[-1])
            elif method == "drift":
                fcs.append(train[-1] + h * slope)
            else:
                fcs.append(season[(h - 1) % FC_SEASON])
        sae = sum(
            math.floor(abs(f - y) * 1e6 + 0.5) / 1e6
            for f, y in zip(fcs, test)
        )
        r = next(
            x for x in out if x["symbol"] == sym and x["method"] == method
        )
        assert r["n_test"] == len(test)
        assert abs(r["mae"] - sae / len(test)) < 2e-6
        assert abs(r["mase"] - (sae / len(test)) / mase_scale) < 2e-4


def test_triangles_match_python_enumeration(spark, sf_dir):
    out = {r["s_suppkey"]: r["n_triangles"] for r in
           q_graph_supplier_triangles(spark, sf_dir).collect()}
    ps = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct().collect()
    by_part = defaultdict(set)
    for r in ps:
        by_part[r["l_partkey"]].add(r["l_suppkey"])
    shared: Counter = Counter()
    for supps in by_part.values():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                shared[(a, b)] += 1
    ranked = sorted(shared.items(), key=lambda kv: (-kv[1], kv[0]))
    edges = {k for k, _ in ranked[:TRIANGLE_TOP_EDGES]}
    tri_count: Counter = Counter()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    for a, b in edges:
        for c in adj[b]:
            if (a, c) in edges:
                tri_count[a] += 1
                tri_count[b] += 1
                tri_count[c] += 1
    assert out == dict(tri_count)


def test_order_gaps_replay(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_gap_stats,
    )

    out = {r["o_custkey"]: r for r in
           q_orders_gap_stats(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append(r)
    for cust, rows in list(by_cust.items())[:50]:
        rows.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        gaps = [
            (b["o_orderdate"] - a["o_orderdate"]).days
            for a, b in zip(rows, rows[1:])
        ]
        r = out[cust]
        assert r["n_orders"] == len(rows)
        assert r["n_gaps"] == len(gaps)
        if gaps:
            assert r["max_gap_days"] == max(gaps)
            assert abs(r["mean_gap_days"] - sum(gaps) / len(gaps)) < 1e-9
        else:
            assert r["max_gap_days"] is None and r["mean_gap_days"] is None


def test_supply_risk_partitions_parts(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_part_supply_risk,
    )

    out = q_part_supply_risk(spark, sf_dir).collect()
    n_parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in out) == n_parts
    for r in out:
        assert r["n_suppliers"] >= 1 and r["revenue_at_risk"] > 0


def test_updown_runs_replay(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        _resampled,
        q_ts_updown_runs,
    )
    from pyspark.sql import functions as F

    out = {r["symbol"]: r for r in q_ts_updown_runs(spark, sf_dir).collect()}
    sym = next(iter(out))
    rows = sorted(
        _resampled(spark, sf_dir)
        .filter(F.col("symbol") == sym)
        .select("time_idx", "close")
        .collect(),
        key=lambda r: r["time_idx"],
    )
    dirs = []
    for a, b in zip(rows, rows[1:]):
        d = b["close"] - a["close"]
        if d > 0:
            dirs.append(1)
        elif d < 0:
            dirs.append(-1)
    runs = []
    for d in dirs:
        if runs and runs[-1][0] == d:
            runs[-1][1] += 1
        else:
            runs.append([d, 1])
    r = out[sym]
    assert r["n_moves"] == len(dirs)
    assert r["n_runs"] == len(runs)
    longest = max(x[1] for x in runs)
    assert r["longest_run"] == longest
    best = max(runs, key=lambda x: (x[1], x[0]))
    assert r["longest_dir"] == best[0]
