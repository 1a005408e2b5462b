"""Contracts for Holt linear-trend forecasting, BFS hop distances, and
exact conditional deciles."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.rolling import holt_linear
from big_data_stock_price_forecast_spark.plans.registry import (
    BFS_MAX_HOPS,
    DECILE_PS,
    HOLT_ALPHA,
    HOLT_BETA,
    TRIANGLE_TOP_EDGES,
    q_events_conditional_deciles,
    q_graph_bfs_hops,
    q_ts_holt_forecast,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_holt_linear_matches_python_recursion(spark):
    xs = [10.0, 12.0, 11.0, 14.0, 16.0, 15.0, 18.0, 21.0]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], ["symbol", "time_idx", "close"]
    )
    out = holt_linear(df, "close", HOLT_ALPHA, HOLT_BETA).collect()[0]
    lvl, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        new_l = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (lvl + b)
        b = HOLT_BETA * (new_l - lvl) + (1.0 - HOLT_BETA) * b
        lvl = new_l
    assert out["n_fit"] == len(xs)
    assert out["level"] == lvl  # bitwise: same operand order
    assert out["trend"] == b


def test_holt_on_linear_series_learns_the_slope(spark):
    # a perfectly linear series: trend converges to the slope and the
    # h-step forecast is exact
    xs = [5.0 + 2.0 * i for i in range(40)]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], ["symbol", "time_idx", "close"]
    )
    out = holt_linear(df, "close", HOLT_ALPHA, HOLT_BETA).collect()[0]
    assert abs(out["trend"] - 2.0) < 1e-6
    assert abs(out["level"] - xs[-1]) < 1e-6


def test_holt_forecast_query_shapes(spark, sf_dir):
    out = q_ts_holt_forecast(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_fit"] >= 5 and r["n_test"] >= 1
        assert r["mae"] >= 0.0


def test_bfs_distances_match_python_bfs(spark, sf_dir):
    out = {r["s_suppkey"]: r["dist"] for r in
           q_graph_bfs_hops(spark, sf_dir).collect()}
    ps = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct().collect()
    from collections import Counter, deque

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
    edges = [k for k, _ in ranked[:TRIANGLE_TOP_EDGES]]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # max-degree seed, key tie-break (matches the query's seed rule);
    # degree counts directed copies, i.e. the undirected degree
    seed = min(
        adj, key=lambda u: (-len(adj[u]), u)
    )
    dist = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if dist[u] >= BFS_MAX_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert out == dist


def test_conditional_deciles_are_monotone_and_exact(spark, sf_dir):
    out = q_events_conditional_deciles(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    ).collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append((r["value"], r["event_id"]))
    got = defaultdict(dict)
    for r in out:
        got[r["event_type"]][r["pct"]] = r["decile_value"]
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for p in DECILE_PS:
            expect = vals[int(math.floor((n - 1) * p))][0]
            assert got[t][int(round(p * 100))] == expect
        # monotone across the decile grid
        seq = [got[t][int(round(p * 100))] for p in DECILE_PS]
        assert seq == sorted(seq)


def test_seasonal_decompose_reconstructs_the_series(spark, sf_dir):
    import math

    from big_data_stock_price_forecast_spark.plans.registry import (
        SEAS_M,
        _filled,
        q_ts_seasonal_decompose,
    )

    out = q_ts_seasonal_decompose(spark, sf_dir).collect()
    assert out
    closes = {
        (r["symbol"], r["time_idx"]): r["close"]
        for r in _filled(spark, sf_dir).collect()
    }
    by_sym = defaultdict(list)
    for r in out:
        by_sym[r["symbol"]].append(r)
        # additive identity where the trend exists
        if r["trend"] is not None:
            x = closes[(r["symbol"], r["time_idx"])]
            assert abs(
                (r["trend"] + r["seasonal"] + r["residual"]) - x
            ) < 5e-6
        else:
            assert r["residual"] is None
    # seasonal components are phase-periodic and centered
    for sym, rows in list(by_sym.items())[:20]:
        phases = defaultdict(set)
        for r in rows:
            phases[r["time_idx"] % SEAS_M].add(r["seasonal"])
        assert all(len(v) == 1 for v in phases.values())
        assert abs(sum(next(iter(v)) for v in phases.values())) < 1e-4


def test_acf_lag_zero_normalization_and_replay(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        ACF_MAX_LAG,
        q_ts_autocorrelation,
    )

    out = q_ts_autocorrelation(spark, sf_dir).collect()
    assert out
    by_sym = defaultdict(dict)
    for r in out:
        by_sym[r["symbol"]][r["lag"]] = r["acf"]
        assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6
    # python replay for one symbol
    from big_data_stock_price_forecast_spark.plans.registry import _filled

    sym = out[0]["symbol"]
    xs = [
        r["close"]
        for r in sorted(
            _filled(spark, sf_dir)
            .filter(F.col("symbol") == sym)
            .collect(),
            key=lambda r: r["time_idx"],
        )
    ]

    def g(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    mu = sum(g(x) for x in xs) / len(xs)
    den = sum(g((x - mu) * (x - mu)) for x in xs)
    for lg in range(1, ACF_MAX_LAG + 1):
        num = sum(
            g((xs[i] - mu) * (xs[i - lg] - mu))
            for i in range(lg, len(xs))
        )
        assert abs(by_sym[sym][lg] - num / den) < 2e-6


def test_benford_terms_reconcile(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_benford_audit,
    )

    out = q_events_benford_audit(spark, sf_dir).collect()
    assert out
    by_type = defaultdict(list)
    for r in out:
        assert 1 <= r["digit"] <= 9
        assert r["chi2_term"] >= 0
        by_type[r["event_type"]].append(r)
    for t, rows in by_type.items():
        n = sum(r["n_obs"] for r in rows)
        # Benford expectations over present digits sum to <= n (all 9
        # digits would sum to exactly n)
        exp_sum = sum(r["n_expected"] for r in rows)
        assert exp_sum <= n + 1e-4  # 9 grid-rounded terms
        if len(rows) == 9:
            assert abs(exp_sum - n) < 1e-3


def test_zipf_slope_is_negative_and_sane(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        ZIPF_TOP_N,
        q_doc_zipf_fit,
    )

    r = q_doc_zipf_fit(spark, sf_dir).collect()[0]
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )

    vocab = set()
    for d in load_table(spark, sf_dir, "documents").select("text").collect():
        vocab.update(
            t for t in re.split(TOKEN_SPLIT_RE, d["text"].lower()) if t
        )
    assert r["n_terms"] == min(ZIPF_TOP_N, len(vocab))
    assert r["zipf_slope"] < 0  # frequency decreases with rank
    assert r["zipf_intercept"] > 0


def test_kalman_matches_python_recursion_bitwise(spark):
    from big_data_stock_price_forecast_spark.operators.smoothing import (
        kalman_local_level,
    )

    xs = [10.0, 14.0, 9.0, 11.0, 15.0, 13.0, 12.0, 16.0]
    qv, rv = 0.5, 2.0
    df = spark.createDataFrame(
        [(1, i, x, qv, rv) for i, x in enumerate(xs)],
        ["symbol", "time_idx", "close", "q_var", "r_var"],
    )
    out = sorted(
        kalman_local_level(df).collect(), key=lambda r: r["time_idx"]
    )
    lvl, p = None, rv
    for r, x in zip(out, xs):
        if lvl is None:
            lvl, k = x, 1.0
        else:
            pp = p + qv
            k = pp / (pp + rv)
            lvl = lvl + k * (x - lvl)
            p = (1.0 - k) * pp
        assert r["level"] == lvl  # bitwise
        assert r["gain"] == k


def test_kalman_gain_decreases_toward_steady_state(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        KALMAN_Q_FRAC,
        KALMAN_R_FRAC,
        q_ts_kalman_level,
    )

    out = q_ts_kalman_level(spark, sf_dir).collect()
    assert out
    # steady-state gain from the Riccati fixed point (sigma^2 cancels)
    q, r = KALMAN_Q_FRAC, KALMAN_R_FRAC
    p_ss = (-q + math.sqrt(q * q + 4 * q * r)) / 2
    k_ss = (p_ss + q) / (p_ss + q + r)
    by_sym = defaultdict(list)
    for rr in out:
        by_sym[rr["symbol"]].append(rr)
    for rows in by_sym.values():
        rows.sort(key=lambda rr: rr["time_idx"])
        if len(rows) >= 5:
            assert abs(rows[-1]["gain"] - k_ss) < 1e-3


def test_textrank_matches_python_iteration(spark, sf_dir):
    import re
    from collections import Counter as C

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        TEXTRANK_TOP_N,
        q_doc_textrank_terms,
    )

    out = [
        (r["term"], r["degree_score"], r["textrank_score"])
        for r in q_doc_textrank_terms(spark, sf_dir).collect()
    ]
    wt: C = C()
    for d in load_table(spark, sf_dir, "documents").select("text").collect():
        toks = [
            t for t in re.split(TOKEN_SPLIT_RE, d["text"].lower()) if t
        ]
        for a, b in zip(toks, toks[1:]):
            wt[(a, b)] += 1
            wt[(b, a)] += 1
    s1: C = C()
    for (u, _v), w in wt.items():
        s1[u] += w
    s2: C = C()
    for (u, v), w in wt.items():
        s2[u] += w * s1[v]
    expect = sorted(
        ((t, s1[t], s2[t]) for t in s2),
        key=lambda z: (-z[2], z[0]),
    )[:TEXTRANK_TOP_N]
    assert out == expect


def test_ljung_box_composes_acf(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        ACF_MAX_LAG,
        q_ts_autocorrelation,
        q_ts_ljung_box,
    )

    acf = defaultdict(dict)
    for r in q_ts_autocorrelation(spark, sf_dir).collect():
        acf[r["symbol"]][r["lag"]] = r["acf"]
    out = {r["symbol"]: r for r in q_ts_ljung_box(spark, sf_dir).collect()}
    assert out
    for sym, r in out.items():
        n = r["n_obs"]
        q = n * (n + 2) * sum(
            acf[sym][k] ** 2 / (n - k) for k in range(1, ACF_MAX_LAG + 1)
        )
        # acf values are emission-rounded; Q recomposed from them must
        # agree to the induced tolerance
        assert abs(r["q_stat"] - q) < max(1e-3, 1e-4 * abs(q))
        assert r["q_stat"] >= 0 and r["dof"] == ACF_MAX_LAG


def test_stream_hll_tracks_exact_within_hll_error(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_stream_hll_users,
    )

    out = q_stream_hll_users(spark, sf_dir).collect()
    assert out
    # m = 64 registers -> ~13% standard error; allow 4 sigma
    for r in out:
        assert r["n_exact"] >= 1
        assert abs(r["hll_est"] - r["n_exact"]) <= max(
            6, 0.52 * r["n_exact"]
        )


def test_holt_degenerate_series_emits_no_row(spark):
    # n<2: the trend seed needs two observations; the operator emits
    # no fit row, matching the recursive-CTE oracle (seed joins rn=2)
    df = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 5.0), (2, 1, 6.0)],
        ["symbol", "time_idx", "close"],
    )
    rows = {r["symbol"]: r for r in holt_linear(df, "close").collect()}
    assert 1 not in rows  # 1-point series dropped
    assert rows[2]["n_fit"] == 2


def test_cap_part_degree_bounds_pair_fanout(spark):
    # a hub part with degree > cap is dropped entirely; normal parts
    # survive untouched — so the pair self-join's per-key fanout is
    # bounded by cap² regardless of skew (the graph family's df-cap)
    from big_data_stock_price_forecast_spark.plans.registry import (
        _cap_part_degree,
    )

    rows = [(1, s) for s in range(10)]          # hub part, degree 10
    rows += [(2, 100), (2, 101), (3, 200)]      # normal parts
    ps = spark.createDataFrame(rows, ["l_partkey", "l_suppkey"])
    capped = _cap_part_degree(ps, cap=4)
    keys = {r["l_partkey"] for r in capped.collect()}
    assert keys == {2, 3}  # hub gone, others intact
    assert capped.count() == 3
    # fanout bound: the worst surviving key pairs at most cap²/2 rows
    s1 = capped.select("l_partkey", F.col("l_suppkey").alias("sa"))
    s2 = capped.select("l_partkey", F.col("l_suppkey").alias("sb"))
    pairs = s1.join(s2, "l_partkey").filter(F.col("sa") < F.col("sb"))
    per_key = pairs.groupBy("l_partkey").count().collect()
    assert all(r["count"] <= 4 * 4 // 2 for r in per_key)
