"""Round-11 batch-7 operator contracts: the moment-card family
(Jarque–Bera, risk ratios, Hill tail index), degree assortativity,
the χ² type×dow audit, and the embedding-isotropy card."""

from __future__ import annotations

import math

from tests.test_round11_ops import (
    _plan,
    _snap,
    _write_event_rows,
    _write_series,
    BASE_TS,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- jarque-bera


def _rel_rets(ys, scale):
    qs = [math.floor(y * 1e6 + 0.5) for y in ys]
    out = []
    for a, b in zip(qs, qs[1:]):
        if a <= 0:
            continue
        r = (b - a) / a
        if abs(r) < 100.0:
            out.append(math.floor(r * scale + 0.5))
    return out


def test_jarque_bera_normalish_vs_skewed_replay(spark, tmp_path):
    """A symmetric two-point return distribution has skew ~0 and
    kurt ~1 (sub-Gaussian -> large JB from the kurtosis arm); a
    one-sided jump series is strongly right-skewed; the raw-moment
    algebra replays exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_jarque_bera,
    )

    # symbol 1: +1% / -1% alternation around 100 -> skew 0
    sym1, p = [100.0], 100.0
    for i in range(20):
        p = p * (1.01 if i % 2 == 0 else 1.0 / 1.01)
        sym1.append(p)
    # symbol 2: tiny drifts with occasional +20% jumps -> right skew
    sym2, p = [100.0], 100.0
    for i in range(20):
        p = p * (1.2 if i % 7 == 3 else 1.001)
        sym2.append(p)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in sym1],
        2: [[(0, y)] for y in sym2],
    })
    got = {r["symbol"]: r for r in
           q_ts_jarque_bera(spark, str(tmp_path)).collect()}

    for sym, ys in ((1, sym1), (2, sym2)):
        rq = _rel_rets(ys, 1e6)
        n = len(rq)
        s1, s2 = sum(rq), sum(x * x for x in rq)
        s3, s4 = sum(x**3 for x in rq), sum(x**4 for x in rq)
        m = s1 / n
        m2 = s2 / n - m * m
        m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m**3
        m4 = (s4 / n - 4.0 * m * (s3 / n)
              + 6.0 * m * m * (s2 / n) - 3.0 * m**4)
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2)
        jb = n / 6.0 * (skew**2 + (kurt - 3.0) ** 2 / 4.0)
        r = got[sym]
        assert r["n"] == n
        assert r["mean_ret"] == _snap(m / 1e6, 10)
        assert r["skew"] == _snap(skew, 8)
        assert r["kurt"] == _snap(kurt, 8)
        assert r["jb"] == _snap(jb, 6)
    assert abs(got[1]["skew"]) < 0.05       # symmetric
    assert got[2]["skew"] > 1.0             # jumpy -> right-skewed
    assert got[2]["kurt"] > got[1]["kurt"]  # fat tail


def test_jarque_bera_zero_close_rows_drop(spark, tmp_path):
    """A zero close in the feed (they exist at sf0.1 — the Amihud
    lesson) must drop the affected return rows, not divide by zero."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_jarque_bera,
    )

    ys = [100.0, 0.0, 50.0] + [50.0 * 1.01 ** i for i in range(1, 12)]
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    got = q_ts_jarque_bera(spark, str(tmp_path)).collect()
    # returns off the zero close (and INTO it from 100) drop:
    # usable transitions = the 12 compounding steps ... minus cap cuts
    assert got[0]["n"] == len(_rel_rets(ys, 1e6))


# --------------------------------------------------- risk ratios


def test_risk_ratios_planted_asymmetry_replay(spark, tmp_path):
    """An up-biased series has hit_rate > 0.5 and Sortino > Sharpe
    (downside deviation uses only the losing buckets); the exact
    moment algebra replays bit-for-bit."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_risk_ratios,
    )

    ys, p = [100.0], 100.0
    for i in range(24):
        p = p * (1.02 if i % 3 != 0 else 1.0 / 1.01)
        ys.append(p)
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    r = q_ts_risk_ratios(spark, str(tmp_path)).collect()[0]

    rq = _rel_rets(ys, 1e8)
    n = len(rq)
    s1, s2 = sum(rq), sum(x * x for x in rq)
    sneg = sum(x * x for x in rq if x < 0)
    npos = sum(1 for x in rq if x > 0)
    mean = s1 / n / 1e8
    var = (n * s2 - s1 * s1) / (n * n) / 1e16
    vol = math.sqrt(max(var, 0.0))
    downside = math.sqrt(sneg / n) / 1e8
    assert r["n"] == n
    assert r["mean_ret"] == _snap(mean, 10)
    assert r["vol"] == _snap(vol, 10)
    assert r["sharpe"] == _snap(mean / vol, 8)
    assert r["sortino"] == _snap(mean / downside, 8)
    assert r["sharpe_ann"] == _snap(mean / vol * math.sqrt(1460.0), 8)
    assert r["hit_rate"] == _snap(npos / n, 8)
    assert r["hit_rate"] > 0.5
    assert r["sortino"] > r["sharpe"]


def test_risk_ratios_flat_series_null_ratios(spark, tmp_path):
    """A constant series has zero variance: vol = 0, Sharpe/Sortino
    NULL (guarded division), hit_rate 0."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_risk_ratios,
    )

    _write_series(spark, str(tmp_path),
                  {1: [[(0, 100.0)] for _ in range(12)]})
    r = q_ts_risk_ratios(spark, str(tmp_path)).collect()[0]
    assert r["vol"] == 0.0
    assert r["sharpe"] is None
    assert r["sortino"] is None
    assert r["hit_rate"] == 0.0


# --------------------------------------------------- hill tail


def test_hill_tail_pareto_vs_uniform(spark, tmp_path):
    """Price changes drawn from a planted power-law grid recover a
    small Hill alpha (heavy tail); near-equal changes give a large
    alpha; the ln-term algebra replays exactly, including the
    (k+1)-th-order-statistic threshold."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        HILL_K,
        q_ts_hill_tail,
    )

    # deterministic Pareto-ish |dx|: x_i = 1000 / i^2 (alpha ~ 0.5)
    heavy, p = [1000.0], 1000.0
    for i in range(1, 32):
        p = p + 1000.0 / (i * i) * (1 if i % 2 == 0 else -1)
        heavy.append(p)
    # thin tail: |dx| in a narrow band 10..10.31
    thin, p = [1000.0], 1000.0
    for i in range(1, 32):
        p = p + (10.0 + i * 0.01) * (1 if i % 2 == 0 else -1)
        thin.append(p)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in heavy],
        2: [[(0, y)] for y in thin],
    })
    got = {r["symbol"]: r for r in
           q_ts_hill_tail(spark, str(tmp_path)).collect()}

    for sym, ys in ((1, heavy), (2, thin)):
        qs = [math.floor(y * 1e6 + 0.5) for y in ys]
        absx = sorted((abs(b - a) for a, b in zip(qs, qs[1:])
                       if b != a), reverse=True)
        xk = absx[HILL_K]
        sq = sum(math.floor(math.log(x / xk) * 1e12 + 0.5)
                 for x in absx[:HILL_K])
        alpha = HILL_K * 1e12 / sq
        r = got[sym]
        assert r["k"] == HILL_K
        assert r["threshold"] == _snap(xk / 1e6, 8)
        assert r["hill_alpha"] == _snap(alpha, 8)
    assert got[1]["hill_alpha"] < 1.0   # heavy tail
    assert got[2]["hill_alpha"] > 5.0   # thin tail


def test_hill_tail_short_series_drops(spark, tmp_path):
    """Fewer than k+1 nonzero changes -> the symbol is absent (no
    partial-tail estimate in either engine)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_hill_tail,
    )

    ys = [100.0 + i for i in range(10)]
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    assert q_ts_hill_tail(spark, str(tmp_path)).count() == 0


def test_hill_tail_rank_window_is_group_limit(spark):
    """The per-symbol top-(k+1) must run as WindowGroupLimit — a full
    per-symbol sort materializing every |dx| would be the data-sized
    anti-shape at scale."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_hill_tail,
    )

    plan = _plan(q_ts_hill_tail(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan


# --------------------------------------------- degree assortativity


def test_assortativity_star_is_negative(spark, tmp_path):
    """A star graph (hub attends every item, leaves attend one) is
    maximally disassortative: every edge pairs deg=n-1 with deg=1 ->
    r = -1 exactly... but with only two distinct degree values the
    edge-end correlation is exactly -1.0; the moment algebra replays."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_assortativity,
    )

    # hub user 100 shares one item with each of 6 leaves; items are
    # (event_type, day, floor(value)) triples -> one item per leaf
    rows, eid = [], 0
    for leaf in range(1, 7):
        for uid in (100, leaf):
            rows.append((eid, BASE_TS, uid, "tick", float(leaf), "{}"))
            eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_graph_assortativity(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 7
    assert r["n_edges"] == 6
    # star: edge ends are (6,1) x6 and (1,6) x6 -> perfect anticorr
    assert r["assortativity"] == -1.0
    assert r["mean_deg"] == _snap((6 * 1 + 6 * 6) / 12.0, 8)


def test_assortativity_regular_graph_degenerate(spark, tmp_path):
    """A clique is degree-regular: zero degree variance -> the guarded
    correlation is NULL (not 0/0)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_assortativity,
    )

    rows, eid = [], 0
    for uid in range(1, 5):
        rows.append((eid, BASE_TS, uid, "tick", 1.0, "{}"))
        eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_graph_assortativity(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 6
    assert r["assortativity"] is None


# --------------------------------------------------- chi-square


def test_chisq_planted_dependence_replay(spark, tmp_path):
    """A type that only fires on one weekday carries the χ² mass;
    an evenly-spread type contributes ~0; expected counts and
    contributions replay exactly, and dow uses the Mon=0 epoch-mod
    convention (not either engine's dayofweek())."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_chisq_type_dow,
    )

    rows, eid = [], 0
    # BASE_TS = 2024-01-01 = a Monday -> dow 0
    for d in range(14):
        ts = BASE_TS + timedelta(days=d)
        rows.append((eid, ts, 1, "steady", 1.0, "{}")); eid += 1
        if d % 7 == 0:  # Mondays only
            for _ in range(5):
                rows.append((eid, ts, 1, "monday_burst", 1.0, "{}"))
                eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {(r["event_type"], r["dow"]): r for r in
           q_events_chisq_type_dow(spark, str(tmp_path)).collect()}
    assert ("monday_burst", 0) in got
    assert got[("monday_burst", 0)]["observed"] == 10
    # replay one cell: steady on Monday: O=2, rt=14, ct=12, N=24
    c = got[("steady", 0)]
    e = 14.0 * 12.0 / 24.0
    assert c["observed"] == 2
    assert c["expected"] == _snap(e, 6)
    assert c["contrib"] == _snap((2.0 - e) ** 2 / e, 8)
    # the burst type's Monday cell is the largest single contribution
    # (replay: O=10, E=10*12/24=5 -> contrib 5.0); zero-observed cells
    # are absent by construction (groupBy emits only occupied cells)
    assert got[("monday_burst", 0)]["contrib"] == 5.0
    assert all(got[("monday_burst", 0)]["contrib"] >= got[k]["contrib"]
               for k in got)
    assert ("monday_burst", 1) not in got


# --------------------------------------------------- emb isotropy


def test_emb_isotropy_aligned_vs_balanced(spark, tmp_path):
    """All-identical vectors have avg pairwise cosine 1 and mean-norm
    1; a balanced +e1/-e1 cloud has mean-norm ~0 and negative avg
    cosine; the ||sum u||^2 identity replays exactly on the snapped
    grid."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_isotropy,
    )

    import pandas as pd

    dim = 64
    e1 = [1.0] + [0.0] * (dim - 1)
    neg = [-1.0] + [0.0] * (dim - 1)
    diag = [1.0 / math.sqrt(dim)] * dim
    rows = (
        [(i, e1, 0) for i in range(4)]
        + [(10 + i, e1, 1) for i in range(2)]
        + [(20 + i, neg, 1) for i in range(2)]
        + [(30 + i, diag, 2) for i in range(3)]
        + [(40, [0.0] * dim, 3)]  # zero vector: label 3 drops
    )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {r["label"]: r for r in
           q_emb_isotropy(spark, str(tmp_path)).collect()}
    assert 3 not in got                      # zero vector dropped
    assert got[0]["avg_pairwise_cos"] == 1.0
    assert got[0]["mean_vec_norm"] == 1.0
    # label 1: 2 x e1 + 2 x (-e1): sum = 0 -> avg cos = (0 - 4)/12
    assert got[1]["mean_vec_norm"] == 0.0
    assert got[1]["avg_pairwise_cos"] == _snap(-4.0 / 12.0, 8)
    # label 2: identical diagonal vectors, snapped at 1e-6
    q = math.floor(1.0 / math.sqrt(dim) * 1e6 + 0.5)
    s2s = dim * (3 * q) ** 2
    sq2 = 3 * dim * q * q
    assert got[2]["avg_pairwise_cos"] == _snap(
        (s2s - sq2) / 6.0 / 1e12, 8
    )


def test_round11b_no_python_no_cartesian(spark):
    """Batch-7 plan hygiene on the real fixture: no Python/Arrow
    stages, no cartesian products."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_jarque_bera", "ts_risk_ratios", "ts_hill_tail",
                 "graph_assortativity", "events_chisq_type_dow",
                 "emb_isotropy"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
