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


# ================================================== round-11 batch 8


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_mw_utest_planted_shift_replay(spark, tmp_path):
    """A value distribution shifted up for the hash-group-1 users
    gives AUC > 0.5 and a positive z; the doubled-average-rank / tie
    algebra replays exactly against a pure-python Mann-Whitney."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_mw_utest,
    )

    # pick users deterministically split by the engine's hash
    g1 = [u for u in range(1, 200) if _h60(f"ab:{u}") % 2 == 1][:8]
    g0 = [u for u in range(1, 200) if _h60(f"ab:{u}") % 2 == 0][:8]
    rows, eid = [], 0
    vals = {}
    for i, u in enumerate(g0):
        v = 10.0 + i  # group 0: 10..17
        rows.append((eid, BASE_TS, u, "buy", v, "{}")); eid += 1
        vals[(0, u)] = v
    for i, u in enumerate(g1):
        v = 14.0 + i  # group 1: 14..21 (overlaps 14..17 -> ties)
        rows.append((eid, BASE_TS, u, "buy", v, "{}")); eid += 1
        vals[(1, u)] = v
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_events_mw_utest(spark, str(tmp_path)).collect()[0]

    # pure-python replay with average ranks
    a = sorted(int(v * 100 + 0.5) for (g, _), v in vals.items() if g == 1)
    b = sorted(int(v * 100 + 0.5) for (g, _), v in vals.items() if g == 0)
    pool = sorted(a + b)
    import collections

    cnt = collections.Counter(pool)
    below, ranks2 = {}, {}
    c = 0
    for v in sorted(cnt):
        below[v] = c
        ranks2[v] = 2 * c + cnt[v] + 1
        c += cnt[v]
    s2r = sum(ranks2[v] for v in a)
    na, nb = len(a), len(b)
    u2 = s2r - na * (na + 1)
    n = na + nb
    st = sum(t**3 - t for t in cnt.values())
    varu = na * nb / 12.0 * ((n + 1.0) - st / (n * (n - 1.0)))
    z = (u2 - na * nb) / (2.0 * math.sqrt(varu))
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["u"] == _snap(u2 / 2.0, 4)
    assert r["auc"] == _snap(u2 / (2.0 * na * nb), 8)
    assert r["z"] == _snap(z, 8)
    assert r["auc"] > 0.6 and r["z"] > 1.0


def test_mw_utest_identical_groups_auc_half(spark, tmp_path):
    """Identical value multisets in both groups -> U = nA*nB/2
    exactly, AUC = 0.5, z = 0."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_mw_utest,
    )

    g1 = [u for u in range(1, 300) if _h60(f"ab:{u}") % 2 == 1][:6]
    g0 = [u for u in range(1, 300) if _h60(f"ab:{u}") % 2 == 0][:6]
    rows, eid = [], 0
    for i in range(6):
        for u in (g0[i], g1[i]):
            rows.append((eid, BASE_TS, u, "buy", 5.0 + i, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_events_mw_utest(spark, str(tmp_path)).collect()[0]
    assert r["auc"] == 0.5
    assert r["z"] == 0.0


def test_spearman_monotone_nonlinear_is_one(spark, tmp_path):
    """An exponentially-scaled twin of a series has Pearson < 1 but
    Spearman exactly 1 (identical return ORDERINGS); an anti-monotone
    twin gives -1."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_spearman_corr,
        q_ts_symbol_corr_matrix,
    )

    # symbol 1: varied returns; symbol 2: cube of the same growth
    # factors (order-preserving); symbol 3: reciprocal (order-flip)
    facs = [1.01, 0.98, 1.05, 0.99, 1.03, 0.97, 1.04, 1.02, 0.96, 1.06,
            1.001, 0.995]
    s1, s2, s3 = [100.0], [100.0], [100.0]
    for f in facs:
        s1.append(s1[-1] * f)
        s2.append(s2[-1] * f**3)
        s3.append(s3[-1] / f)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in s1],
        2: [[(0, y)] for y in s2],
        3: [[(0, y)] for y in s3],
    })
    rho = {(r["sym_a"], r["sym_b"]): r["spearman"] for r in
           q_ts_spearman_corr(spark, str(tmp_path)).collect()}
    assert rho[(1, 2)] == 1.0
    assert rho[(1, 3)] == -1.0
    pea = {(r["sym_a"], r["sym_b"]): r["corr"] for r in
           q_ts_symbol_corr_matrix(spark, str(tmp_path)).collect()}
    assert pea[(1, 2)] < 1.0  # nonlinear -> Pearson strictly below


def test_spearman_tie_handling_replay(spark, tmp_path):
    """Flat stretches (ffill ties at snapped ret = 0) exercise the
    doubled-average-rank algebra; replay against scipy-free python."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_spearman_corr,
    )

    s1 = [100, 101, 101, 103, 103, 103, 104, 102, 102, 105]
    s2 = [200, 203, 203, 204, 204, 204, 210, 205, 205, 211]
    _write_series(spark, str(tmp_path), {
        1: [[(0, float(y))] for y in s1],
        2: [[(0, float(y))] for y in s2],
    })
    got = q_ts_spearman_corr(spark, str(tmp_path)).collect()[0]

    def rets(ys):
        return [math.floor((b / a - 1) * 1e6 + 0.5)
                for a, b in zip(ys, ys[1:])]

    def dranks(xs):
        out = []
        for x in xs:
            less = sum(1 for o in xs if o < x)
            eq = sum(1 for o in xs if o == x)
            out.append(2 * (less + 1) + eq - 1)  # 2*rank() + cnt - 1
        return out

    xa, xb = dranks(rets(s1)), dranks(rets(s2))
    n = len(xa)
    sx, sy = sum(xa), sum(xb)
    sxy = sum(a * b for a, b in zip(xa, xb))
    sxx = sum(a * a for a in xa)
    syy = sum(b * b for b in xb)
    rho = ((n * sxy - sx * sy)
           / math.sqrt(n * sxx - sx * sx) / math.sqrt(n * syy - sy * sy))
    assert got["n_obs"] == n
    assert got["spearman"] == _snap(rho, 6)


def test_ks_length_drift_disjoint_and_replay(spark, tmp_path):
    """A source whose lengths sit entirely above the rest's has
    KS = 1.0 at the rest's max length; a same-distribution source has
    a small KS; the cross-multiplied integer algebra replays."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_ks_length_drift,
    )

    rows = []
    did = 0
    for ln in (10, 20, 30, 40):          # source A: short docs
        rows.append((did, "x" * ln, "en", "A", ln)); did += 1
    for ln in (100, 200, 300, 400):      # source B: long docs
        rows.append((did, "x" * ln, "en", "B", ln)); did += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {r["source"]: r for r in
           q_doc_ks_length_drift(spark, str(tmp_path)).collect()}
    assert got["A"]["ks"] == 1.0 and got["B"]["ks"] == 1.0
    # A's CDF hits 1 at len 40 while rest is 0 -> argmax at 40
    assert got["A"]["ks_len"] == 40
    assert got["B"]["ks_len"] == 40  # gap maximal from 40 up to 99


def test_kcore_clique_survives_pendants_peel(spark, tmp_path):
    """A K4 (one shared item among 4 users) is its own 3-core; leaves
    hanging off it peel in round 1 and their removal cannot peel the
    clique (deg drops 3->3)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_kcore,
    )

    rows, eid = [], 0
    for u in (1, 2, 3, 4):  # clique item: all four co-attend value 1
        rows.append((eid, BASE_TS, u, "tick", 1.0, "{}")); eid += 1
    for leaf, v in ((10, 2.0), (11, 3.0)):  # leaf items: pair with u=1
        for u in (1, leaf):
            rows.append((eid, BASE_TS, u, "tick", v, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["user_id"]: r for r in
           q_graph_kcore(spark, str(tmp_path)).collect()}
    assert got[1]["deg0"] == 5          # 3 clique + 2 leaves
    assert got[1]["in_core"] == 1 and got[1]["deg_final"] == 3
    for u in (2, 3, 4):
        assert got[u]["in_core"] == 1 and got[u]["deg_final"] == 3
    for leaf in (10, 11):
        assert got[leaf]["in_core"] == 0 and got[leaf]["deg_final"] == 0


def test_ulcer_index_replay_and_flat(spark, tmp_path):
    """A flat series has ulcer 0 / 0% underwater; a drawdown path
    replays the exact snapped-ratio algebra."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_ulcer_index,
    )

    ys = [100.0, 110.0, 99.0, 104.5, 121.0, 115.5, 93.5, 126.5]
    _write_series(spark, str(tmp_path), {
        1: [[(0, 50.0)] for _ in range(8)],
        2: [[(0, y)] for y in ys],
    })
    got = {r["symbol"]: r for r in
           q_ts_ulcer_index(spark, str(tmp_path)).collect()}
    assert got[1]["ulcer"] == 0.0
    assert got[1]["pct_underwater"] == 0.0
    assert got[1]["max_dd_pct"] == 0.0
    qs = [math.floor(y * 1e6 + 0.5) for y in ys]
    pk, ddqs, nuw = 0, [], 0
    for q in qs:
        pk = max(pk, q)
        ddqs.append(math.floor((q - pk) / pk * 1e9 + 0.5))
        if q < pk:
            nuw += 1
    n = len(qs)
    ulcer = math.sqrt(sum(d * d for d in ddqs) / n) / 1e9 * 100.0
    r = got[2]
    assert r["n"] == n
    assert r["ulcer"] == _snap(ulcer, 8)
    assert r["max_dd_pct"] == _snap(-min(ddqs) / 1e9 * 100.0, 8)
    assert r["pct_underwater"] == _snap(nuw / n, 8)


def test_term_burstiness_concentrated_vs_spread(spark, tmp_path):
    """A term spread one-per-doc has VMR < 1 (sub-Poisson); the same
    total concentrated in one doc has VMR near the total; the integer
    moment algebra replays."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_term_burstiness,
    )

    n_docs = 10
    rows = []
    for i in range(n_docs):
        text = "spread"  # one per doc
        if i == 0:
            text += " bursty" * 10  # all 10 in doc 0
        rows.append((i, text, "en", "S", len(text)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {r["term"]: r for r in
           q_doc_term_burstiness(spark, str(tmp_path)).collect()}
    s, b = got["spread"], got["bursty"]
    assert (s["tf"], s["df"]) == (10, 10)
    assert (b["tf"], b["df"]) == (10, 1)

    def vmr(counts, n):
        tf = sum(counts)
        sc2 = sum(c * c for c in counts)
        mean = tf / n
        return (sc2 / n - mean * mean) / mean

    assert s["vmr"] == _snap(vmr([1] * 10, n_docs), 8)
    assert b["vmr"] == _snap(vmr([10], n_docs), 8)
    assert b["vmr"] > 5.0 > 1.0 > s["vmr"]
    assert b["tf_when_present"] == 10.0


def test_round11_batch8_no_python_no_cartesian(spark):
    """Batch-8 plan hygiene on the real fixture (the two scalar
    broadcast-of-one-row joins in ks/burstiness are BNLJ by design —
    assert no CartesianProduct and no Python instead)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("events_mw_utest", "ts_spearman_corr",
                 "doc_ks_length_drift", "graph_kcore",
                 "ts_ulcer_index", "doc_term_burstiness"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================== round-11 batch 9


def test_pacf_replay_and_alternation(spark, tmp_path):
    """A strongly alternating return series has acf1 near -1; the
    lag-moment / Durbin-Levinson algebra replays exactly against
    pure python."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_pacf,
    )

    ys, p = [100.0], 100.0
    for i in range(30):
        p = p * (1.02 if i % 2 == 0 else 1.0 / 1.015)
        ys.append(p)
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    r = q_ts_pacf(spark, str(tmp_path)).collect()[0]

    rq = _rel_rets(ys, 1e6)
    n = len(rq)
    s1, s2 = sum(rq), sum(x * x for x in rq)
    mu = s1 / n
    den = s2 - s1 * mu
    rho = {}
    for k in (1, 2, 3):
        pairs = list(zip(rq[k:], rq[:-k]))
        pk = sum(a * b for a, b in pairs)
        hk = sum(a for a, _ in pairs)
        tk = sum(b for _, b in pairs)
        rho[k] = (pk - mu * (hk + tk) + len(pairs) * mu * mu) / den
    d2 = 1.0 - rho[1] * rho[1]
    phi22 = (rho[2] - rho[1] * rho[1]) / d2
    phi21 = rho[1] * (1.0 - rho[2]) / d2
    d3 = 1.0 - phi21 * rho[1] - phi22 * rho[2]
    phi33 = (rho[3] - phi21 * rho[2] - phi22 * rho[1]) / d3
    assert r["n"] == n
    assert r["acf1"] == _snap(rho[1], 8)
    assert r["acf2"] == _snap(rho[2], 8)
    assert r["acf3"] == _snap(rho[3], 8)
    assert r["pacf2"] == _snap(phi22, 8)
    assert r["pacf3"] == _snap(phi33, 8)
    assert r["acf1"] < -0.8  # alternation


def test_knn_reciprocity_two_clusters_replay(spark, tmp_path):
    """Two tight 4-point clusters with k=5: within-cluster edges
    reciprocate, the 2 cross-cluster picks mostly don't; a far-off
    outlier points AT the clusters but is never pointed back at
    (reciprocity 0 for its label). Corpus < ANCHOR_BUDGET, so the
    fixed-budget sampler keeps every row identically in both engines;
    replay the exact top-5 graph in python."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        KNN_RECIP_K,
        q_emb_knn_reciprocity,
    )

    dim = 64
    rows = []
    pts = {}
    for i in range(4):  # cluster A (label 0) near +e1
        vid = 7 * (i + 1)
        v = [0.0] * dim
        v[0], v[1] = 1.0, 0.01 * (i + 1)
        rows.append((vid, v, 0)); pts[vid] = v
    for i in range(4):  # cluster B (label 1) near -e1
        vid = 7 * (i + 10)
        v = [0.0] * dim
        v[0], v[1] = -1.0, 0.013 * (i + 1)
        rows.append((vid, v, 1)); pts[vid] = v
    # a far-off outlier: its top-5 all point at the clusters, but no
    # cluster point's top-5 reaches it -> label-9 reciprocity 0
    rows.append((3, [5.0] + [0.0] * (dim - 1), 9))
    pts[3] = rows[-1][1]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {r["label"]: r for r in
           q_emb_knn_reciprocity(spark, str(tmp_path)).collect()}
    assert got[9]["n_edges"] == KNN_RECIP_K
    assert got[9]["reciprocity"] == 0.0

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    edges = set()
    for q, qv in pts.items():
        nb = sorted(
            ((d2(qv, nv), nid) for nid, nv in pts.items() if nid != q)
        )[:KNN_RECIP_K]
        for _, nid in nb:
            edges.add((q, nid))
    recip = sum(1 for (a, b) in edges if (b, a) in edges)
    assert got[-1]["n_edges"] == len(edges)
    assert got[-1]["reciprocity"] == _snap(recip / len(edges), 8)


def test_supplier_hhi_monopoly_vs_duopoly(spark, tmp_path):
    """One-supplier nation -> HHI 1 / effective_n 1; two equal
    suppliers -> HHI 0.5 / effective_n 2; revenue replays the TPC-H
    money device exactly."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_supplier_hhi,
    )

    sup = pd.DataFrame(
        [(1, "s1", 100, 0.0), (2, "s2", 200, 0.0), (3, "s3", 200, 0.0)],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    nat = pd.DataFrame(
        [(100, "MONO", 1), (200, "DUO", 1)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    li = pd.DataFrame(
        [
            (1, 1, 1, 1, 1.0, 1000.0, 0.10, 0.0, "N", "O", BASE_TS),
            (2, 1, 2, 1, 1.0, 500.0, 0.00, 0.0, "N", "O", BASE_TS),
            (3, 1, 3, 1, 1.0, 250.0, 0.00, 0.0, "N", "O", BASE_TS),
            (4, 1, 3, 2, 1.0, 250.0, 0.00, 0.0, "N", "O", BASE_TS),
        ],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    for name, pdf in (("supplier", sup), ("nation", nat),
                      ("lineitem", li)):
        spark.createDataFrame(pdf).write.parquet(
            f"{tmp_path}/{name}.parquet"
        )
    got = {r["nation"]: r for r in
           q_supplier_hhi(spark, str(tmp_path)).collect()}
    assert got["MONO"]["n_suppliers"] == 1
    assert got["MONO"]["hhi"] == 1.0
    assert got["MONO"]["effective_n"] == 1.0
    assert got["MONO"]["revenue"] == 900.0  # 1000 * (1 - 0.10)
    assert got["DUO"]["n_suppliers"] == 2
    assert got["DUO"]["hhi"] == 0.5
    assert got["DUO"]["effective_n"] == 2.0


def test_xsec_momentum_ordered_growth(spark, tmp_path):
    """Ten symbols with strictly ordered constant growth rates: the
    quintile sort is the symbol order at every rebalance, so mean
    forward return decreases monotonically from quintile 1 to 5; the
    snapped-mean algebra replays exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        XSEC_FWD_W,
        XSEC_N_Q,
        XSEC_TRAIL_W,
        q_ts_xsec_momentum,
    )

    n_buckets = 40
    growths = {s: 0.0005 * s for s in range(1, 11)}
    series = {}
    for s, g in growths.items():
        p, ys = 100.0, []
        for _ in range(n_buckets):
            ys.append(p)
            p = p * (1 + g)
        series[s] = [[(0, y)] for y in ys]
    _write_series(spark, str(tmp_path), series)
    got = {r["quintile"]: r for r in
           q_ts_xsec_momentum(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(1, XSEC_N_Q + 1))
    means = [got[q]["mean_fwd_ret"] for q in range(1, XSEC_N_Q + 1)]
    assert all(a > b for a, b in zip(means, means[1:]))  # monotone

    # replay quintile 1 (two fastest growers: symbols 10, 9)
    def fwd_snap(s):
        qs = [math.floor(100.0 * (1 + growths[s]) ** i * 1e6 + 0.5)
              for i in range(n_buckets)]
        out = []
        for t in range(XSEC_TRAIL_W, n_buckets - XSEC_FWD_W):
            out.append(math.floor(
                (qs[t + XSEC_FWD_W] - qs[t]) / qs[t] * 1e8 + 0.5))
        return out
    f10, f9 = fwd_snap(10), fwd_snap(9)
    exp = sum(f10 + f9) / len(f10 + f9) / 1e8
    assert got[1]["n_obs"] == len(f10) + len(f9)
    assert got[1]["mean_fwd_ret"] == _snap(exp, 10)


def test_simpson_diversity_mono_vs_uniform(spark, tmp_path):
    """A one-token-repeated source has Gini-Simpson 0 and effective
    vocab 1; an all-distinct source has Gini-Simpson 1 and effective
    vocab = its token count."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_simpson_diversity,
    )

    rows = [
        (0, "spam " * 20, "en", "mono", 100),
        (1, " ".join(f"tok{i}" for i in range(30)), "en", "uni", 150),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {r["source"]: r for r in
           q_doc_simpson_diversity(spark, str(tmp_path)).collect()}
    assert got["mono"]["gini_simpson"] == 0.0
    assert got["mono"]["eff_vocab"] == 1.0
    assert got["mono"]["vocab"] == 1
    assert got["uni"]["gini_simpson"] == 1.0
    assert got["uni"]["eff_vocab"] == 30.0
    assert got["uni"]["n_tokens"] == 30


def test_monthly_growth_gap_month_null(spark, tmp_path):
    """MoM compares only ADJACENT calendar months: a gap month's
    growth is NULL (not growth vs the pre-gap month); YoY lines up
    across exactly 12 months."""
    import pandas as pd
    from datetime import datetime

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_monthly_growth,
    )

    def o(k, month_dt, price):
        return (k, 1, "F", price, month_dt, "1-URGENT")

    rows = [
        o(1, datetime(2023, 1, 15), 100.0),
        o(2, datetime(2023, 2, 15), 110.0),
        # March missing (gap)
        o(3, datetime(2023, 4, 15), 121.0),
        o(4, datetime(2024, 1, 15), 150.0),  # YoY vs 2023-01
    ]
    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/orders.parquet"
    )
    got = {str(r["month"]): r for r in
           q_orders_monthly_growth(spark, str(tmp_path)).collect()}
    assert got["2023-02-01"]["mom_pct"] == _snap(10.0, 6)
    assert got["2023-04-01"]["mom_pct"] is None      # gap month
    assert got["2023-01-01"]["mom_pct"] is None      # first month
    assert got["2024-01-01"]["yoy_pct"] is None      # only 4 rows back
    assert got["2024-01-01"]["revenue"] == 150.0


def test_round11_batch9_no_python_no_cartesian(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_pacf", "emb_knn_reciprocity", "supplier_hhi",
                 "ts_xsec_momentum", "doc_simpson_diversity",
                 "orders_monthly_growth"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================= round-11 batch 10


def test_sliding_topn_window_assignment_and_emission(spark, tmp_path):
    """Every event lands in 4 overlapping 24h/6h windows; only
    windows whose end <= max event time emit (append-mode watermark
    semantics); ranking is per window (n DESC, symbol ASC). Replay
    the full window algebra in python."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_stream_sliding_topn,
    )

    # three symbols with distinct per-bucket activity over 3 days
    rows, eid = [], 0
    for d in range(12):  # 12 six-hour buckets
        ts = BASE_TS + timedelta(hours=6 * d)
        for sym, k in ((1, 3), (2, 2), (3, 1)):
            for j in range(k if d % 2 == 0 else 1):
                rows.append((eid, ts - timedelta(minutes=j + 1),
                             sym, "tick", 100.0 + sym, "{}"))
                eid += 1
    # the file-stream source globs for the single FILE events.parquet
    # (the real testdata layout); the batch writer's directory layout
    # would be filtered out, so plant a single file
    import glob
    import shutil

    tmpdir = f"{tmp_path}/__evtmp"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(tmpdir)
    shutil.move(
        glob.glob(f"{tmpdir}/part-*.parquet")[0],
        f"{tmp_path}/events.parquet",
    )
    shutil.rmtree(tmpdir)
    got = q_stream_sliding_topn(spark, str(tmp_path)).collect()

    # python replay: right-closed shift, 4 windows per event
    from collections import defaultdict

    SIX_H = timedelta(hours=6)
    counts = defaultdict(int)
    max_te = None
    for (_, ts, sym, _t, _v, _p) in rows:
        te = ts - timedelta(microseconds=1)
        max_te = te if max_te is None or te > max_te else max_te
        base = datetime_floor_6h(te)
        for k in range(4):
            wend = base - k * SIX_H + timedelta(hours=24)
            counts[(sym, wend)] += 1
    emitted = {(s, w): n for (s, w), n in counts.items() if w <= max_te}
    exp_top = {}
    for (s, w), n in emitted.items():
        exp_top.setdefault(w, []).append((-n, s))
    expected = set()
    for w, lst in exp_top.items():
        for rank, (negn, s) in enumerate(sorted(lst)[:3], start=1):
            expected.add((w, rank, s, -negn))
    assert {(r["window_end"], r["rank"], r["symbol"], r["n_rows"])
            for r in got} == expected
    # at least one trailing window was withheld (still-open state)
    all_wins = {w for (_, w) in counts}
    assert any(w > max_te for w in all_wins)


def datetime_floor_6h(t):
    from datetime import datetime

    secs = (t - datetime(1970, 1, 1)).total_seconds()
    return datetime(1970, 1, 1) + __import__("datetime").timedelta(
        seconds=(secs // 21600) * 21600
    )


def test_triplet_margin_clusters_and_mislabel(spark, tmp_path):
    """Well-separated label clusters give violation_rate 0 and a
    positive margin; a mislabeled pair makes every label-2 anchor's
    nearest neighbor cross the boundary -> violation_rate 1. Corpus <
    ANCHOR_BUDGET, so the fixed-budget sampler anchors EVERY row;
    replay the full per-anchor dpos/dneg/margin math in python."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_triplet_margin,
    )

    dim = 64

    def vec(x0, x1):
        v = [0.0] * dim
        v[0], v[1] = x0, x1
        return v

    rows = []
    # label 0: cluster at +e1
    rows.append((7, vec(1.0, 0.0), 0))
    rows.append((1, vec(1.0, 0.05), 0))
    rows.append((2, vec(1.0, 0.10), 0))
    # label 1: cluster at -e1
    rows.append((14, vec(-1.0, 0.0), 1))
    rows.append((4, vec(-1.0, 0.05), 1))
    # label 2: a "cluster" whose two members sit far apart, each
    # closer to another label's cluster -> every anchor violates
    rows.append((21, vec(1.0, 0.2), 2))
    rows.append((6, vec(-3.0, 0.0), 2))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {r["label"]: r for r in
           q_emb_triplet_margin(spark, str(tmp_path)).collect()}

    # python replay over ALL anchors (= all rows: corpus < budget)
    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    per_label: dict[int, list[float]] = {}
    for vid, v, lab in rows:
        dpos = min(
            (l2(v, w) for wid, w, wl in rows if wl == lab and wid != vid),
            default=None,
        )
        dneg = min(
            (l2(v, w) for wid, w, wl in rows if wl != lab),
            default=None,
        )
        if dpos is None or dneg is None:
            continue
        per_label.setdefault(lab, []).append(
            int(math.floor((dneg - dpos) * 1e9 + 0.5))
        )
    for lab, margins in per_label.items():
        assert got[lab]["n_anchors"] == len(margins)
        assert got[lab]["violation_rate"] == _snap(
            sum(1 for m in margins if m < 0) / len(margins), 8
        )
        assert got[lab]["mean_margin"] == _snap(
            float(sum(margins)) / len(margins) / 1e9, 8
        )
    assert got[0]["violation_rate"] == 0.0
    assert got[1]["violation_rate"] == 0.0
    assert got[2]["violation_rate"] == 1.0   # mislabeled cluster
    assert got[2]["mean_margin"] < 0


def test_dow_seasonality_planted_monday_effect(spark, tmp_path):
    """BASE_TS (2024-01-01) is a Monday: a series that only moves on
    Monday buckets concentrates nonzero mean returns at dow 0; the
    integer dow mapping ((idx div 4 + 5) mod 7) hits the real
    calendar."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_dow_seasonality,
    )

    # 21 days x 4 buckets; +1% on each Monday bucket, flat otherwise
    from big_data_stock_price_forecast_spark.functions.calendar import (
        ANCHOR_EPOCH,
    )

    buckets = []
    p = 100.0
    closes = []
    for d in range(21):
        for b in range(4):
            if d % 7 == 0:
                p = p * 1.01
            buckets.append([(0, p)])
            closes.append(p)
    _write_series(spark, str(tmp_path), {1: buckets})
    got = {r["dow"]: r for r in
           q_ts_dow_seasonality(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(7))

    # replay: bucket j's time_idx = base + j; its return attributes
    # to dow((idx div 4 + 5) mod 7); a Monday's midnight-end bucket
    # lands on Tuesday by the right-closed convention
    from datetime import datetime

    base_idx = int(
        ((BASE_TS - datetime(1970, 1, 1)).total_seconds() - ANCHOR_EPOCH)
        // 21600
    )
    qs = [math.floor(y * 1e6 + 0.5) for y in closes]
    by_dow = {}
    for j in range(1, len(qs)):
        rq = math.floor((qs[j] - qs[j - 1]) / qs[j - 1] * 1e8 + 0.5)
        dow = ((base_idx + j) // 4 + 5) % 7
        by_dow.setdefault(dow, []).append(rq)
    for d in range(7):
        rqs = by_dow[d]
        assert got[d]["n"] == len(rqs)
        assert got[d]["mean_ret"] == _snap(
            sum(rqs) / len(rqs) / 1e8, 10
        )
    # Monday carries the bulk; Tuesday gets only the midnight spill
    assert got[0]["mean_ret"] > got[1]["mean_ret"] > 0.0
    for d in range(2, 7):
        assert got[d]["mean_ret"] == 0.0


def test_new_vs_returning_split(spark, tmp_path):
    """User A active on day 1 and 2, user B only day 2: day 1 = 1
    new; day 2 = 1 new + 1 returning."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_new_vs_returning,
    )

    d1, d2 = BASE_TS, BASE_TS + timedelta(days=1)
    rows = [
        (0, d1, 1, "x", 1.0, "{}"),
        (1, d1 + timedelta(hours=1), 1, "x", 1.0, "{}"),  # same day dup
        (2, d2, 1, "x", 1.0, "{}"),
        (3, d2, 2, "x", 1.0, "{}"),
    ]
    _write_event_rows(spark, str(tmp_path), rows)
    got = {str(r["day"]): r for r in
           q_events_new_vs_returning(spark, str(tmp_path)).collect()}
    assert got["2024-01-01"]["n_active"] == 1
    assert got["2024-01-01"]["n_new"] == 1
    assert got["2024-01-01"]["n_returning"] == 0
    assert got["2024-01-02"]["n_active"] == 2
    assert got["2024-01-02"]["n_new"] == 1
    assert got["2024-01-02"]["n_returning"] == 1


def test_vol_of_vol_alternating_days_replay(spark, tmp_path):
    """Alternating calm/wild days give a large vol-of-vol; constant
    daily vol gives ~0; the two-level exact algebra replays."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_vol_of_vol,
    )

    buckets, p = [], 100.0
    moves = []
    for d in range(8):
        step = 1.03 if d % 2 == 0 else 1.001  # wild vs calm day
        for b in range(4):
            f = step if b % 2 == 0 else 1.0 / step
            p = p * f
            buckets.append([(0, p)])
            moves.append(p)
    _write_series(spark, str(tmp_path), {1: buckets})
    r = q_ts_vol_of_vol(spark, str(tmp_path)).collect()[0]

    from datetime import datetime

    from big_data_stock_price_forecast_spark.functions.calendar import (
        ANCHOR_EPOCH,
    )

    base_idx = int(
        ((BASE_TS - datetime(1970, 1, 1)).total_seconds() - ANCHOR_EPOCH)
        // 21600
    )
    qs = [math.floor(y * 1e6 + 0.5) for y in moves]
    days = {}
    for j in range(1, len(qs)):
        rq = math.floor((qs[j] - qs[j - 1]) / qs[j - 1] * 1e8 + 0.5)
        days.setdefault((base_idx + j) // 4, []).append(rq)
    rvqs = []
    for _, lst in sorted(days.items()):
        if len(lst) >= 2:
            s2 = sum(x * x for x in lst)
            rvqs.append(math.floor(math.sqrt(s2) / 1e8 * 1e9 + 0.5))
    n = len(rvqs)
    s1, s2s = sum(rvqs), sum(x * x for x in rvqs)
    mean = s1 / n / 1e9
    var = (n * s2s - s1 * s1) / (n * n) / 1e18
    assert r["n_days"] == n
    assert r["mean_rv"] == _snap(mean, 10)
    assert r["vol_of_vol"] == _snap(math.sqrt(max(var, 0.0)), 10)
    assert r["vol_of_vol"] > 0.005  # alternation is visible


def test_user_lifespan_buckets(spark, tmp_path):
    """Spans 0, 1, 5 and 100 days land in buckets 0, 1, 4, 64; the
    per-bucket means replay exactly."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_user_lifespan,
    )

    rows, eid = [], 0
    spans = {1: 0, 2: 1, 3: 5, 4: 100}
    for uid, span in spans.items():
        rows.append((eid, BASE_TS, uid, "x", 1.0, "{}")); eid += 1
        if span:
            rows.append((eid, BASE_TS + timedelta(days=span), uid,
                         "x", 1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["span_bucket"]: r for r in
           q_events_user_lifespan(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 4, 64}
    assert got[0]["n_users"] == 1 and got[0]["mean_events"] == 1.0
    assert got[1]["mean_span_days"] == 1.0
    assert got[4]["mean_span_days"] == 5.0
    assert got[64]["mean_span_days"] == 100.0
    assert got[64]["mean_events"] == 2.0


def test_round11_batch10_no_python_no_cartesian(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("emb_triplet_margin", "ts_dow_seasonality",
                 "events_new_vs_returning", "ts_vol_of_vol",
                 "events_user_lifespan"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================= round-11 batch 11


def test_granger_planted_lead_lag(spark, tmp_path):
    """Symbol 2's return IS symbol 1's previous return: the 1->2
    partial correlation is ~1 with a large t; the reverse direction
    carries no signal. Replay the three-correlation algebra."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_granger_screen,
    )

    # deterministic, aperiodic return pattern
    f1 = [1.0 + 0.01 * math.sin(i * 1.3) + 0.005 * ((i % 5) - 2)
          for i in range(40)]
    s1, p = [100.0], 100.0
    for f in f1:
        p *= f
        s1.append(p)
    # r2_t ~ 0.9 * r1_{t-1} + deterministic jitter (NOT exact: a
    # perfect copy gives partial corr exactly 1.0 and a NULL-guarded
    # t-stat)
    s2 = [200.0, 200.0]
    for i, f in enumerate(f1[:-1]):
        f_adj = 1.0 + 0.9 * (f - 1.0) + 0.002 * math.cos(i * 2.1)
        s2.append(s2[-1] * f_adj)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in s1],
        2: [[(0, y)] for y in s2],
    })
    got = {(r["cause"], r["effect"]): r for r in
           q_ts_granger_screen(spark, str(tmp_path)).collect()}
    assert got[(1, 2)]["granger_t"] > 5.0     # 1 leads 2
    assert abs(got[(2, 1)]["partial_corr"]) < 0.5

    # replay (1 -> 2): x = r2_t, z = r2_{t-1}, y = r1_{t-1}
    def rets(ys):
        qs = [math.floor(y * 1e6 + 0.5) for y in ys]
        # resampled ret convention: floor((b/a - 1) * 1e6 + 0.5)
        return [math.floor((b / a - 1) * 1e6 + 0.5)
                for a, b in zip(qs, qs[1:])]

    # NOTE: the query computes ret from the RESAMPLED close (not the
    # snapped one), so replay from raw floats: close_t/close_{t-1}
    def rets_raw(ys):
        return [math.floor((b / a - 1) * 1e6 + 0.5)
                for a, b in zip(ys, ys[1:])]

    r1, r2 = rets_raw(s1), rets_raw(s2)
    # aligned on time_idx: row t (t>=1 within each series, needs own
    # lag) -> x = r2[t], z = r2[t-1], y = r1[t-1] for t = 1..len-1
    xs, ys_, zs = [], [], []
    for t in range(1, min(len(r1), len(r2))):
        xs.append(r2[t]); zs.append(r2[t - 1]); ys_.append(r1[t - 1])
    n = len(xs)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return ((n * sab - sa * sb)
                / math.sqrt(n * saa - sa * sa)
                / math.sqrt(n * sbb - sb * sb))

    rxy, rxz, ryz = corr(xs, ys_), corr(xs, zs), corr(ys_, zs)
    rp = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2))
    t_ = rp * math.sqrt((n - 3) / (1 - rp * rp))
    r = got[(1, 2)]
    assert r["n"] == n
    assert r["partial_corr"] == _snap(rp, 8)
    assert r["granger_t"] == _snap(t_, 8)


def test_char_entropy_mono_vs_uniform(spark, tmp_path):
    """A one-character source has entropy 0; a uniform-over-domain
    source has entropy ln(37) (norm 1); out-of-domain characters are
    ignored."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        CHAR_DOMAIN,
        q_doc_char_entropy,
    )

    uni = CHAR_DOMAIN * 3
    rows = [
        (0, "aaaaAAAA", "en", "mono", 8),          # case-folds to 'a'
        (1, uni, "en", "uni", len(uni)),
        (2, "@@@###!!!", "en", "junk", 9),          # all out-of-domain
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {r["source"]: r for r in
           q_doc_char_entropy(spark, str(tmp_path)).collect()}
    assert got["mono"]["n_chars"] == 8
    assert got["mono"]["char_entropy"] == 0.0
    assert got["uni"]["n_chars"] == 3 * len(CHAR_DOMAIN)
    assert got["uni"]["entropy_norm"] == 1.0
    assert "junk" not in got  # zero in-domain chars -> dropped


def test_iqr_outliers_planted(spark, tmp_path):
    """Known quartiles (exact interpolation) and two planted extreme
    values: fence counts and share replay exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_iqr_outliers,
    )

    vals = [float(v) for v in range(1, 12)]  # 1..11: q1=3.5, q3=8.5
    vals += [100.0, -50.0]                    # outliers (iqr=5)
    rows = [(i, BASE_TS, 1, "buy", v, "{}") for i, v in enumerate(vals)]
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_events_iqr_outliers(spark, str(tmp_path)).collect()[0]
    import numpy as np

    q1 = float(np.percentile(vals, 25, method="linear"))
    q3 = float(np.percentile(vals, 75, method="linear"))
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert r["q1"] == _snap(q1, 6) and r["q3"] == _snap(q3, 6)
    assert r["n_low"] == sum(1 for v in vals if v < lo)
    assert r["n_high"] == sum(1 for v in vals if v > hi)
    assert r["outlier_share"] == _snap(
        (r["n_low"] + r["n_high"]) / len(vals), 8)


def test_type_lift_attract_vs_independent(spark, tmp_path):
    """Types X and Y always co-occur -> lift = B/(cX·cY)·cXY maximal
    (> 1); an every-basket type Z has lift exactly 1 with everything;
    exact replay."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_type_lift,
    )

    rows, eid = [], 0
    # 6 baskets (user 1, days 0-5): X,Y together in 3; Z in all 6
    for d in range(6):
        ts = BASE_TS + timedelta(days=d)
        rows.append((eid, ts, 1, "z", 1.0, "{}")); eid += 1
        if d < 3:
            rows.append((eid, ts, 1, "x", 1.0, "{}")); eid += 1
            rows.append((eid, ts, 1, "y", 1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {(r["t1"], r["t2"]): r for r in
           q_events_type_lift(spark, str(tmp_path)).collect()}
    B = 6.0
    assert got[("x", "y")]["n_cooccur"] == 3
    assert got[("x", "y")]["lift"] == _snap(3 * B / (3 * 3), 8)  # 2.0
    assert got[("x", "z")]["lift"] == _snap(3 * B / (3 * 6), 8)  # 1.0
    assert got[("y", "z")]["pmi"] == 0.0
    assert got[("x", "y")]["pmi"] == _snap(math.log(2.0), 8)


def test_trend_ols_linear_vs_flat(spark, tmp_path):
    """A perfectly linear price path has R^2 = 1 and an exact slope;
    a flat path has slope 0 and NULL R^2/t (zero price variance)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_trend_ols,
    )

    lin = [100.0 + 2.5 * i for i in range(16)]   # +2.5 per bucket
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in lin],
        2: [[(0, 77.0)] for _ in range(16)],
    })
    got = {r["symbol"]: r for r in
           q_ts_trend_ols(spark, str(tmp_path)).collect()}
    assert got[1]["r2"] == 1.0
    # slope per day = 2.5 * 4 = 10.0 price units
    assert got[1]["slope_per_day"] == 10.0
    assert got[2]["slope_per_day"] == 0.0
    assert got[2]["r2"] is None
    assert got[2]["trend_t"] is None


def test_drawdown_episodes_two_spells(spark, tmp_path):
    """A path with two separated underwater spells: episode count,
    durations, and snapped depths replay exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_drawdown_episodes,
    )

    #       peak  spell1 (2 rows)   peak   spell2 (3 rows)      top
    ys = [100.0, 90.0, 95.0, 110.0, 104.5, 99.0, 104.5, 121.0]
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    r = q_ts_drawdown_episodes(spark, str(tmp_path)).collect()[0]
    assert r["n_episodes"] == 2
    assert r["max_duration"] == 3
    assert r["mean_duration"] == 2.5

    def dq(q, pk):
        qi = math.floor(q * 1e6 + 0.5)
        pi = math.floor(pk * 1e6 + 0.5)
        return math.floor((qi - pi) / pi * 1e9 + 0.5)

    d1 = min(dq(90.0, 100.0), dq(95.0, 100.0))
    d2 = min(dq(104.5, 110.0), dq(99.0, 110.0), dq(104.5, 110.0))
    assert r["max_depth_pct"] == _snap(-min(d1, d2) / 1e9 * 100, 8)
    assert r["mean_depth_pct"] == _snap(-(d1 + d2) / 2 / 1e9 * 100, 8)


def test_round11_batch11_no_python_no_cartesian(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_granger_screen", "doc_char_entropy",
                 "events_iqr_outliers", "events_type_lift",
                 "ts_trend_ols", "ts_drawdown_episodes"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================= round-11 batch 12


def test_volatility_clustering_planted_regimes(spark, tmp_path):
    """Alternating calm/wild 4-bucket regimes make |r| strongly
    autocorrelated at lags 1-3 while a constant-|move| alternating
    series has |r|-ACF ~ degenerate-flat; replay the moment algebra
    on the regime series."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_volatility_clustering,
    )

    ys, p = [100.0], 100.0
    mags = []
    for d in range(10):
        mag = 0.03 if d % 2 == 0 else 0.002
        for b in range(4):
            f = (1 + mag) if b % 2 == 0 else 1.0 / (1 + mag)
            p *= f
            ys.append(p)
            mags.append(mag)
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    r = q_ts_volatility_clustering(spark, str(tmp_path)).collect()[0]

    aq = [abs(x) for x in _rel_rets(ys, 1e6)]
    n = len(aq)
    s1, s2 = sum(aq), sum(x * x for x in aq)
    mu = s1 / n
    den = s2 - s1 * mu
    for k, col in ((1, "acf1_abs"), (2, "acf2_abs"), (3, "acf3_abs")):
        pairs = list(zip(aq[k:], aq[:-k]))
        pk = sum(a * b for a, b in pairs)
        hk = sum(a for a, _ in pairs)
        tk = sum(b for _, b in pairs)
        rho = (pk - mu * (hk + tk) + len(pairs) * mu * mu) / den
        assert r[col] == _snap(rho, 8)
    # 4-bucket regimes: lags 1-3 stay inside a regime most of the time
    assert r["acf1_abs"] > 0.4


def test_fisher_ratio_separated_vs_mixed(spark, tmp_path):
    """Two tight, well-separated label clusters give a huge Fisher F;
    interleaved identical clouds give ~0. Exact scatter replay on the
    separated case."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_fisher_ratio,
    )

    dim = 64

    def vec(x0, eps):
        v = [0.0] * dim
        v[0], v[1] = x0, eps
        return v

    rows = []
    for i in range(4):
        rows.append((i, vec(1.0, 0.01 * i), 0))
        rows.append((10 + i, vec(-1.0, 0.01 * i), 1))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    r = q_emb_fisher_ratio(spark, str(tmp_path)).collect()[0]
    assert r["n_vectors"] == 8 and r["n_labels"] == 2
    assert r["fisher_f"] > 100.0
    # replay: snapped coords q, scatter identities with term snapping
    qs = {}
    for vid, v, lab in rows:
        qs[vid] = ([math.floor(x * 1e6 + 0.5) for x in v], lab)
    labels = {0: [v for v, l in qs.values() if l == 0],
              1: [v for v, l in qs.values() if l == 1]}
    sq2 = sum(q * q for v, _ in qs.values() for q in v)
    stl = 0
    for lab, vecs in labels.items():
        for d in range(dim):
            s = sum(v[d] for v in vecs)
            stl += math.floor(s * s / len(vecs) / 1e12 * 1e6 + 0.5)
    stg = 0
    for d in range(dim):
        s = sum(v[d] for v, _ in qs.values())
        stg += math.floor(s * s / 8 / 1e12 * 1e6 + 0.5)
    within = sq2 / 1e12 - stl / 1e6
    between = (stl - stg) / 1e6
    fisher = (between / 1.0) / (within / 6.0)
    assert r["between_scatter"] == _snap(between, 6)
    assert r["within_scatter"] == _snap(within, 6)
    assert r["fisher_f"] == _snap(fisher, 8)


def test_tail_dependence_cocrash_vs_independent(spark, tmp_path):
    """Two symbols that crash on the same buckets have tail lambda
    near 1; a pair whose crashes never align has lambda 0."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_tail_dependence,
    )

    def series(crash_days):
        ys, p = [100.0], 100.0
        for i in range(40):
            f = 0.90 if i in crash_days else (1.002 if i % 2 == 0
                                              else 1.0 / 1.001)
            p *= f
            ys.append(p)
        return ys

    crashes_a = {5, 15, 25, 35}
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in series(crashes_a)],
        2: [[(0, y)] for y in series(crashes_a)],        # co-crash
        3: [[(0, y)] for y in series({7, 17, 27, 37})],  # disjoint
    })
    got = {(r["sym_a"], r["sym_b"]): r for r in
           q_ts_tail_dependence(spark, str(tmp_path)).collect()}
    assert got[(1, 2)]["tail_lambda"] == 1.0
    assert got[(1, 3)]["tail_lambda"] == 0.0
    assert got[(1, 2)]["tail_lift"] > 5.0


def test_brand_price_spread_replay(spark, tmp_path):
    """Exact moments + interpolated median replay on a planted
    two-brand catalog."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_part_brand_price_spread,
    )

    prices = {"B1": [10.0, 20.0, 30.0, 100.0], "B2": [50.0, 50.0]}
    rows, pk = [], 0
    for b, ps in prices.items():
        for p in ps:
            rows.append((pk, f"part{pk}", b, "T", 1, p)); pk += 1
    pdf = pd.DataFrame(rows, columns=[
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"])
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/part.parquet")
    got = {r["brand"]: r for r in
           q_part_brand_price_spread(spark, str(tmp_path)).collect()}
    cents = [1000, 2000, 3000, 10000]
    n = 4
    s1, s2 = sum(cents), sum(c * c for c in cents)
    mean = s1 / n / 100.0
    var = (n * s2 - s1 * s1) / (n * n) / 1e4
    assert got["B1"]["mean_price"] == _snap(mean, 6)
    assert got["B1"]["cv"] == _snap(math.sqrt(var) / mean, 8)
    assert got["B1"]["median_price"] == 25.0  # (2000+3000)/2 cents
    assert got["B1"]["max_price"] == 100.0
    assert got["B2"]["cv"] == 0.0


def test_balance_profile_planted(spark, tmp_path):
    """Negative share and exact percentiles on a planted segment."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_customer_balance_profile,
    )

    bals = [-100.0, 0.0, 50.0, 100.0, 200.0]
    rows = [(i, f"c{i}", 0, b, "SEG") for i, b in enumerate(bals)]
    pdf = pd.DataFrame(rows, columns=[
        "c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/customer.parquet")
    r = q_customer_balance_profile(spark, str(tmp_path)).collect()[0]
    import numpy as np

    cents = [int(b * 100) for b in bals]
    assert r["n"] == 5
    assert r["pct_negative"] == 0.2
    assert r["mean_bal"] == _snap(sum(cents) / 5 / 100.0, 6)
    assert r["p50"] == 50.0
    assert r["p10"] == _snap(
        float(np.percentile(cents, 10, method="linear")) / 100.0, 6)


def test_prefix_boilerplate_template_group(spark, tmp_path):
    """Docs sharing a 64-char header group together (case-folded);
    unique-prefix docs don't appear; share divides by the FULL corpus
    count."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_prefix_boilerplate,
    )

    header = ("subject: weekly newsletter please do not reply to this "
              "address x")
    assert len(header) >= 64
    rows = [
        (0, header + " body one", "en", "A", 80),
        (1, header.upper() + " body two", "en", "B", 80),
        (2, header + " body three", "en", "A", 80),
        (3, "totally unique document text", "en", "A", 28),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet")
    got = q_doc_prefix_boilerplate(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["prefix"] == header.lower()[:64]
    assert r["n_docs"] == 3
    assert r["n_sources"] == 2
    assert r["share"] == 0.75


def test_round11_batch12_no_python_no_cartesian(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_volatility_clustering", "emb_fisher_ratio",
                 "ts_tail_dependence", "part_brand_price_spread",
                 "customer_balance_profile", "doc_prefix_boilerplate"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================= round-11 batch 13


def test_month_seasonality_planted_replay(spark, tmp_path):
    """A 3-month series with all movement in the middle month: month
    grouping uses the real calendar (anchor-date + day-index) and the
    moment algebra replays."""
    from big_data_stock_price_forecast_spark.functions.calendar import (
        ANCHOR_EPOCH,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_month_seasonality,
    )
    from datetime import datetime, date, timedelta

    buckets, p = [], 100.0
    closes = []
    for d in range(90):
        month = (BASE_TS + timedelta(days=d)).month
        for b in range(4):
            if month == 2:
                p *= 1.005
            buckets.append([(0, p)])
            closes.append(p)
    _write_series(spark, str(tmp_path), {1: buckets})
    got = {r["month"]: r for r in
           q_ts_month_seasonality(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}

    base_idx = int(
        ((BASE_TS - datetime(1970, 1, 1)).total_seconds() - ANCHOR_EPOCH)
        // 21600
    )
    qs = [__import__("math").floor(y * 1e6 + 0.5) for y in closes]
    by_m = {}
    for j in range(1, len(qs)):
        rq = math.floor((qs[j] - qs[j - 1]) / qs[j - 1] * 1e8 + 0.5)
        day_idx = (base_idx + j) // 4
        m = (date(2000, 1, 1) + timedelta(days=day_idx)).month
        by_m.setdefault(m, []).append(rq)
    for m, rqs in by_m.items():
        assert got[m]["n"] == len(rqs)
        assert got[m]["mean_ret"] == _snap(
            sum(rqs) / len(rqs) / 1e8, 10)
    assert got[2]["mean_ret"] > got[1]["mean_ret"]


def test_leverage_effect_planted_asymmetry(spark, tmp_path):
    """A series where every down move is followed by a LARGE move and
    every up move by a small one has negative corr(r_t, |r|_{t+1});
    the moment algebra replays."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_leverage_effect,
    )

    ys, p = [100.0], 100.0
    down_next = False
    for i in range(40):
        if down_next:
            mag = 0.04  # big move after a down day
            down_next = False
        else:
            mag = 0.005
        up = (i % 3) != 0
        f = (1 + mag) if up else 1.0 / (1 + mag)
        if not up:
            down_next = True
        p *= f
        ys.append(p)
    _write_series(spark, str(tmp_path), {1: [[(0, y)] for y in ys]})
    r = q_ts_leverage_effect(spark, str(tmp_path)).collect()[0]

    rq = _rel_rets(ys, 1e6)
    xs = rq[:-1]
    yv = [abs(x) for x in rq[1:]]
    n = len(xs)
    sx, sy = sum(xs), sum(yv)
    sxy = sum(a * b for a, b in zip(xs, yv))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in yv)
    rho = ((n * sxy - sx * sy)
           / math.sqrt(n * sxx - sx * sx)
           / math.sqrt(n * syy - sy * sy))
    assert r["n"] == n
    assert r["leverage_corr"] == _snap(rho, 8)
    assert r["leverage_corr"] < -0.3  # planted leverage asymmetry


def test_exact_dup_embeddings_groups_and_checksum(spark, tmp_path):
    """Two planted identical vectors (one with a sub-snap epsilon
    difference) group; a distinct vector doesn't; the summary row's
    XOR checksum replays the snap->join->hash chain exactly."""
    import hashlib

    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_exact_dup_groups,
    )

    dim = 64
    a = [0.5] * dim
    a_eps = [0.5 + 4e-8] + [0.5] * (dim - 1)  # same on the 1e-6 grid
    c = [0.25] * dim
    rows = [(1, a, 0), (2, a_eps, 1), (3, c, 0)]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet")
    got = q_emb_exact_dup_groups(spark, str(tmp_path)).collect()
    groups = [r for r in got if r["row_type"] == "group"]
    summary = [r for r in got if r["row_type"] == "summary"][0]
    assert len(groups) == 1
    g = groups[0]
    assert g["group_size"] == 2 and g["keeper_id"] == 1
    assert g["n_labels"] == 2  # cross-label exact dup = label noise

    def sig(vec):
        s = ",".join(str(math.floor(x * 1e6 + 0.5)) for x in vec)
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sigs = {sig(a), sig(c)}  # distinct signatures
    xor = 0
    for s in sigs:
        xor ^= s
    assert summary["sig"] == xor
    assert summary["keeper_id"] == 2   # distinct signatures
    assert summary["group_size"] == 3  # total vectors
    assert summary["n_labels"] == 2    # vectors in dup groups


def test_readability_simple_vs_long(spark, tmp_path):
    """Short words / short sentences score higher than long-word
    run-ons; the exact count algebra replays."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_readability,
    )

    simple = "the cat sat. the dog ran. we go now."
    dense = ("multidimensional considerations notwithstanding "
             "the interdepartmental reorganization proceeded "
             "irrespective of contemporaneous objections")
    rows = [(0, simple, "en", "simple", len(simple)),
            (1, dense, "en", "dense", len(dense))]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet")
    got = {r["source"]: r for r in
           q_doc_readability(spark, str(tmp_path)).collect()}
    s, d = got["simple"], got["dense"]
    assert s["flesch_proxy"] > d["flesch_proxy"]
    # replay 'simple': 9 words, 3 sentences, word chars
    words = simple.replace(".", " ").split()
    wc = sum(len(w) for w in words)
    wps = len(words) / 3.0
    cpw = wc / len(words)
    assert s["words_per_sentence"] == _snap(wps, 6)
    assert s["chars_per_word"] == _snap(cpw, 6)
    assert s["flesch_proxy"] == _snap(
        206.835 - 1.015 * wps - 84.6 * (cpw / 3.0), 6)
    # zero .!? -> greatest-guard counts ONE sentence
    assert d["words_per_sentence"] == float(len(dense.split()))


def test_retention_decay_planted_halflife(spark, tmp_path):
    """Users active on a geometric-decay schedule recover the planted
    half-life; only fully observable users (first day <= max - 14)
    enter."""
    from datetime import timedelta

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_retention_decay,
    )

    rows, eid = [], 0
    n_users = 64
    # user u active on day k (k=1..14) iff u < 64 * 2^(-k/3):
    # exact halflife = 3 days in user-count space
    for u in range(n_users):
        rows.append((eid, BASE_TS, u, "x", 1.0, "{}")); eid += 1
        for k in range(1, 15):
            if u < n_users * 2 ** (-k / 3.0):
                rows.append((eid, BASE_TS + timedelta(days=k), u,
                             "x", 1.0, "{}")); eid += 1
    # one late user (first day > max-14) must be EXCLUDED
    rows.append((eid, BASE_TS + timedelta(days=13), 999, "x", 1.0,
                 "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    r = q_events_retention_decay(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == n_users      # late user excluded
    assert r["k_points"] == 14
    assert 2.0 < r["halflife_days"] < 4.5   # planted ~3 (floor steps)
    assert r["r2"] > 0.9


def test_stress_corr_planted_breakdown(spark, tmp_path):
    """Two symbols independent in calm buckets but crashing together
    on market-stress buckets: corr_stress >> corr_calm."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_stress_corr,
    )

    # crash magnitudes VARY (identical crashes would give zero
    # stress-regime variance and a NULL-guarded correlation)
    crash = {7: 0.90, 15: 0.85, 23: 0.92, 31: 0.88}
    s1, s2 = [100.0], [200.0]
    for i in range(40):
        if i in crash:
            f1 = f2 = crash[i]  # joint crash -> market moves big
        else:
            # small idiosyncratic wiggles, deliberately unaligned
            f1 = 1.003 if i % 2 == 0 else 1.0 / 1.003
            f2 = 1.002 if i % 3 == 0 else 1.0 / 1.002
        s1.append(s1[-1] * f1)
        s2.append(s2[-1] * f2)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in s1],
        2: [[(0, y)] for y in s2],
    })
    r = q_ts_stress_corr(spark, str(tmp_path)).collect()[0]
    assert (r["sym_a"], r["sym_b"]) == (1, 2)
    assert r["corr_stress"] > 0.95
    assert abs(r["corr_calm"]) < 0.5
    assert r["corr_shift"] == _snap(
        r["corr_stress"] - r["corr_calm"], 8)


def test_round11_batch13_no_python_no_cartesian(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_month_seasonality", "ts_leverage_effect",
                 "emb_exact_dup_groups", "doc_readability",
                 "events_retention_decay", "ts_stress_corr"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name


# ================================================= round-11 batch 14


def test_cc_sizes_two_islands(spark, tmp_path):
    """Two co-attendance islands (a triangle and a pair) yield the
    size histogram {3: 1, 2: 1} with node shares 0.6 / 0.4."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_cc_sizes,
    )

    rows, eid = [], 0
    for u in (1, 2, 3):   # island A: one shared item
        rows.append((eid, BASE_TS, u, "tick", 1.0, "{}")); eid += 1
    for u in (10, 11):    # island B: another item
        rows.append((eid, BASE_TS, u, "tick", 2.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["component_size"]: r for r in
           q_graph_cc_sizes(spark, str(tmp_path)).collect()}
    assert set(got) == {3, 2}
    assert got[3]["n_components"] == 1
    assert got[2]["n_components"] == 1
    assert got[3]["node_share"] == 0.6
    assert got[2]["node_share"] == 0.4


def test_dup_source_matrix_cross_feed(spark, tmp_path):
    """Near-identical docs planted across two sources dominate the
    (A, B) cell; the within-feed pair lands on the diagonal."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_dup_source_matrix,
    )

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the band plays on " * 3)
    rows = [
        (0, base + "alpha", "A", "A-feed"),
        (1, base + "beta", "B", "B-feed"),   # cross-source near-dup
        (2, base + "gamma", "A", "A-feed"),  # within-A near-dup
        (3, "совершенно другой текст " * 10, "C", "C-feed"),
    ]
    pdf = pd.DataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s, _) in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet")
    got = {(r["source_a"], r["source_b"]): r for r in
           q_doc_dup_source_matrix(spark, str(tmp_path)).collect()}
    assert got[("A", "B")]["n_pairs"] == 2  # doc1 pairs with 0 and 2
    assert got[("A", "A")]["n_pairs"] == 1
    assert ("C", "C") not in got
    total = sum(r["n_pairs"] for r in got.values())
    for r in got.values():
        assert r["pair_share"] == _snap(r["n_pairs"] / total, 8)


def test_round_price_bias_planted_clustering(spark, tmp_path):
    """Prices quoted only at .00 and .50 concentrate the digit
    histogram on 0 and 50 with exact chi-square contributions."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_round_price_bias,
    )

    rows, eid = [], 0
    for i in range(60):
        v = 100.0 + (i % 3)          # .00 digits
        rows.append((eid, BASE_TS, 1, "tick", v, "{}")); eid += 1
    for i in range(40):
        v = 200.5 + (i % 2)          # .50 digits
        rows.append((eid, BASE_TS, 1, "tick", v, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["digit"]: r for r in
           q_ts_round_price_bias(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 50}
    assert got[0]["observed"] == 60 and got[50]["observed"] == 40
    e = 100 / 100.0
    assert got[0]["expected"] == _snap(e, 6)
    assert got[0]["chi2_contrib"] == _snap((60 - e) ** 2 / e, 8)
    assert got[0]["share"] == 0.6


def test_brand_returns_wilson_orders_small_n(spark, tmp_path):
    """A 1/1 brand has a raw rate of 1.0 but a Wilson lower bound far
    below a 90/100 brand — the ranking statistic the card exists
    for; exact replay."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_lineitem_brand_returns,
    )

    parts = pd.DataFrame(
        [(1, "p1", "BIG", "T", 1, 1.0), (2, "p2", "TINY", "T", 1, 1.0)],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    )
    li_rows = []
    for i in range(100):
        li_rows.append((i, 1, 1, 1, 1.0, 10.0, 0.0, 0.0,
                        "R" if i < 90 else "N", "O", BASE_TS))
    li_rows.append((1000, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "R", "O",
                    BASE_TS))
    li = pd.DataFrame(li_rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    spark.createDataFrame(parts).write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(li).write.parquet(
        f"{tmp_path}/lineitem.parquet")
    got = {r["brand"]: r for r in
           q_lineitem_brand_returns(spark, str(tmp_path)).collect()}
    assert got["TINY"]["return_rate"] == 1.0
    assert got["BIG"]["return_rate"] == 0.9
    assert got["TINY"]["wilson_lb"] < got["BIG"]["wilson_lb"]

    z2 = 1.959963984540054 ** 2
    ph, n = 0.9, 100.0
    wl = ((ph + z2 / (2 * n)
           - math.sqrt(z2) * math.sqrt(ph * (1 - ph) / n
                                       + z2 / (4 * n * n)))
          / (1 + z2 / n))
    assert got["BIG"]["wilson_lb"] == _snap(wl, 8)


def test_vocab_overlap_disjoint_vs_identical(spark, tmp_path):
    """Identical-vocabulary sources have Jaccard 1; disjoint ones
    don't appear (no shared term -> no pair row); partial overlap
    replays the exact |A|+|B|-|A∩B| identity."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_source_vocab_overlap,
    )

    rows = [
        (0, "alpha beta gamma", "en", "S1", 17),
        (1, "alpha beta gamma", "en", "S2", 17),     # same vocab
        (2, "alpha delta", "en", "S3", 11),          # overlap 1 of 4
        (3, "omega psi", "en", "S4", 9),             # disjoint
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet")
    got = {(r["source_a"], r["source_b"]): r for r in
           q_doc_source_vocab_overlap(spark, str(tmp_path)).collect()}
    assert got[("S1", "S2")]["jaccard"] == 1.0
    assert got[("S1", "S3")]["n_shared"] == 1
    assert got[("S1", "S3")]["jaccard"] == _snap(1 / (3 + 2 - 1), 8)
    assert ("S1", "S4") not in got


def test_intraday_vol_profile_planted_clock(spark, tmp_path):
    """All movement planted in bucket-of-day 2: that bucket carries
    ~all the movement share; counts and means replay exactly."""
    from big_data_stock_price_forecast_spark.functions.calendar import (
        ANCHOR_EPOCH,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_intraday_vol_profile,
    )
    from datetime import datetime

    base_idx = int(
        ((BASE_TS - datetime(1970, 1, 1)).total_seconds() - ANCHOR_EPOCH)
        // 21600
    )
    buckets, p = [], 100.0
    closes = []
    for j in range(40):
        # bucket j has time_idx = base_idx + j; move iff idx % 4 == 2
        if (base_idx + j) % 4 == 2:
            p = p * (1.02 if (j // 4) % 2 == 0 else 1.0 / 1.02)
        buckets.append([(0, p)])
        closes.append(p)
    _write_series(spark, str(tmp_path), {1: buckets})
    got = {r["bucket_of_day"]: r for r in
           q_ts_intraday_vol_profile(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[2]["movement_share"] == 1.0
    for b in (0, 1, 3):
        assert got[b]["mean_abs_ret"] == 0.0
    qs = [math.floor(y * 1e6 + 0.5) for y in closes]
    aqs = [abs(math.floor((b - a) / a * 1e8 + 0.5))
           for a, b in zip(qs, qs[1:])
           if True]
    moved = [aq for j, aq in enumerate(aqs, start=1)
             if (base_idx + j) % 4 == 2]
    assert got[2]["n"] == len(moved)
    assert got[2]["mean_abs_ret"] == _snap(
        sum(moved) / len(moved) / 1e8, 10)


def test_round11_batch14_plan_hygiene(spark):
    """graph_cc_sizes is excluded from the no-Python sweep: the CC
    operator's single-task union-find fast path is a documented Arrow
    pass behind a localCheckpoint (the doc_dup_clusters precedent)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("doc_dup_source_matrix", "ts_round_price_bias",
                 "lineitem_brand_returns", "doc_source_vocab_overlap",
                 "ts_intraday_vol_profile"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name
