"""Round-11 operator contracts: the segment-composed affine EMA scan
(parallel-prefix lift of the W4 per-symbol recursion constraint) and
the round's other additions."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.rolling import ewm_smooth
from big_data_stock_price_forecast_spark.operators.twophase import (
    affine_ema_scan,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- affine EMA scan


def test_affine_scan_matches_sequential_arrow_pass(spark):
    """The segment-composed scan must agree with the sequential
    ewm_smooth fold to <1e-8 on the real fixture series (divergence
    is ONLY the 1e-12 term-grid snap + per-segment reassociation).
    Multi-segment composition must actually exercise (seg_len=32 on a
    ~116-row series -> 4-segment chains incl. a partial tail)."""
    from big_data_stock_price_forecast_spark.plans.registry import _filled

    df = _filled(spark, SF).select("symbol", "time_idx", "close")
    scan = {
        r["symbol"]: (r["n"], r["n_seg"], r["ema_last"])
        for r in affine_ema_scan(
            df, "close", "symbol", "time_idx", alpha=0.5, seg_len=32
        ).collect()
    }
    assert scan and all(v[1] > 1 for v in scan.values())  # multi-segment
    seq = ewm_smooth(df, {"ema": ("close", 0.5)})
    w_last = (
        seq.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy(
                    F.col("time_idx").desc()
                )
            ),
        )
        .filter("rn = 1")
        .select("symbol", "ema")
    )
    last = {r["symbol"]: r["ema"] for r in w_last.collect()}
    for s, (n, n_seg, ema) in scan.items():
        assert abs(ema - last[s]) < 1e-8, (s, ema, last[s])


def test_affine_scan_python_replay_exact(spark):
    """Bit-level replay of the full two-phase algebra on a planted
    series long enough for 3 segments + partial tail, including the
    seed row's m=1 coefficient and the exact-power-of-two c^k path."""
    import pandas as pd

    ys = [100.0 + math.sin(i * 0.7) * 25.0 + (i % 7) for i in range(83)]
    pdf = pd.DataFrame(
        {"symbol": 1, "time_idx": range(83), "close": ys}
    )
    df = spark.createDataFrame(pdf)
    got = affine_ema_scan(
        df, "close", "symbol", "time_idx", alpha=0.5, seg_len=32
    ).collect()[0]
    assert (got["n"], got["n_seg"]) == (83, 3)

    # replay: per segment B = sum of snapped terms; fold across segs
    def seg_B(seg_ys, is_first):
        L = len(seg_ys)
        tot = 0
        for i, y in enumerate(seg_ys, start=1):
            m = 1.0 if (is_first and i == 1) else 0.5
            t = y * m * math.pow(0.5, L - i)
            tot += int(math.floor(t * 1e12 + 0.5))
        return tot / 1e12, L

    segs = [ys[k : k + 32] for k in range(0, 83, 32)]
    v, _ = seg_B(segs[0], True)
    for sgl in segs[1:]:
        B, L = seg_B(sgl, False)
        v = math.pow(0.5, L) * v + B
    assert got["ema_last"] == round(v, 8) or abs(got["ema_last"] - v) < 5e-9


def test_affine_scan_plan_has_no_python_and_bounded_exchanges(spark):
    """The scan's point is distribution: NO Arrow/Python stage (the
    sequential pass's applyInPandas), no per-symbol single-task
    collect of the raw series — the only data-sized shuffles are the
    symbol window + the (symbol, seg) aggregate."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_ema_scan,
    )

    plan = _plan(q_ts_ema_scan(spark, SF))
    assert "FlatMapGroupsInPandas" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


# ---------------------------------------------- round-11 second batch

import re
from collections import Counter
from datetime import datetime, timedelta

BASE_TS = datetime(2024, 1, 1, 6, 0, 0)  # 6h-boundary aligned


def _snap(x: float, n: int) -> float:
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_event_rows(spark, path: str, rows) -> None:
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


def _write_series(spark, path: str, series: dict) -> None:
    """series: symbol -> list of per-6h-bucket event lists, each a
    (back_off_h, value) pair list. Resample is right-closed, so
    bucket i's events sit AT or BEFORE the boundary BASE_TS + 6h*i:
    ts = boundary - back_off_h hours (back_off_h in [0, 6)).
    back_off 0 is the LAST tick (arg_max ts -> close); the largest
    back-offset is the first tick (arg_min ts -> open).
    n_rows per bucket = len(list)."""
    rows, eid = [], 0
    for sym, buckets in series.items():
        for i, evs in enumerate(buckets):
            for back_h, c in evs:
                assert 0 <= back_h < 6
                rows.append(
                    (eid,
                     BASE_TS + timedelta(hours=6 * i) - timedelta(
                         hours=back_h),
                     sym, "tick", float(c), "{}")
                )
                eid += 1
    _write_event_rows(spark, path, rows)


# ------------------------------------------------------- kyle lambda


def test_kyle_lambda_recovers_planted_impact(spark, tmp_path):
    """|Δclose| planted exactly proportional to the bucket trade count
    -> OLS slope recovers the impact coefficient and alpha -> 0."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_kyle_lambda,
    )

    lam = 0.25  # price units per trade
    vols = [1, 3, 2, 5, 4, 2, 6, 1, 3]
    closes, c = [], 100.0
    buckets = []
    for i, v in enumerate(vols):
        # v trades in the bucket; the LAST one (arg_max ts) sets close
        c = c + lam * v if i > 0 else c
        evs = [(0.5 * k, c) for k in range(v)]
        buckets.append(evs)
        closes.append(c)
    _write_series(spark, str(tmp_path), {3: buckets})
    got = q_ts_kyle_lambda(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == len(vols) - 1
    # replay the exact-integer normal equations
    qcs = [math.floor(x * 1e6 + 0.5) for x in closes]
    ys = [abs(qcs[i] - qcs[i - 1]) for i in range(1, len(qcs))]
    xs = vols[1:]
    n = len(ys)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    lam_q = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["lam"] == _snap(lam_q / 1e6, 12)
    assert abs(r["lam"] - lam) < 1e-9
    alpha = (sy / n - lam_q * (sx / n)) / 1e6
    assert r["alpha"] == _snap(alpha, 8)
    assert abs(r["alpha"]) < 1e-6


# ------------------------------------------------- garman-klass vols


def test_garman_klass_flat_bars_zero_and_replay(spark, tmp_path):
    """Flat bars -> all three estimators exactly 0; a shaped series
    replays the snapped-term DECIMAL means bit-for-bit."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_garman_klass_vol,
    )

    flat = [[(0, 50.0)] for _ in range(5)]
    shaped = []
    bars = [
        (100.0, 104.0, 99.0, 102.0),
        (102.0, 103.0, 97.0, 98.0),
        (98.0, 106.0, 98.0, 105.0),
    ]
    for o, h, lo, cl in bars:
        # ts order: open first (largest back-offset), then low, high,
        # close last (back-offset 0)
        shaped.append([(3.0, o), (2.0, lo), (1.0, h), (0.0, cl)])
    _write_series(spark, str(tmp_path), {1: flat, 2: shaped})
    got = {r["symbol"]: r for r in
           q_ts_garman_klass_vol(spark, str(tmp_path)).collect()}
    assert got[1]["parkinson"] == 0.0
    assert got[1]["garman_klass"] == 0.0
    assert got[1]["rogers_satchell"] == 0.0
    # replay symbol 2
    k = 2.0 * math.log(2.0) - 1.0
    spk = sgk = srs = 0
    for o, h, lo, cl in bars:
        u = math.log(h / lo)
        cc = math.log(cl / o)
        rs = (math.log(h / cl) * math.log(h / o)
              + math.log(lo / cl) * math.log(lo / o))
        spk += math.floor(u * u * 1e12 + 0.5)
        sgk += math.floor((0.5 * u * u - k * cc * cc) * 1e12 + 0.5)
        srs += math.floor(rs * 1e12 + 0.5)
    n = len(bars)
    r2 = got[2]
    assert r2["parkinson"] == _snap(
        math.sqrt(spk / 1e12 / (4.0 * math.log(2.0) * n)), 8)
    assert r2["garman_klass"] == _snap(math.sqrt(sgk / 1e12 / n), 8)
    assert r2["rogers_satchell"] == _snap(math.sqrt(srs / 1e12 / n), 8)


# -------------------------------------------- permutation entropy


def test_permutation_entropy_monotone_and_replay(spark, tmp_path):
    """A strictly increasing series collapses to ONE ordinal pattern
    (entropy exactly 0); a wiggly series replays the tie-toward-
    earlier-index coding and snapped entropy terms exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        PE_MIN_N,
        q_ts_permutation_entropy,
    )

    up = [[(0, 100.0 + i)] for i in range(PE_MIN_N + 2)]
    ys = [100.0, 102.0, 101.0, 101.0, 103.0, 99.0, 99.0, 99.0,
          104.0, 100.0, 101.0, 105.0]
    wig = [[(0, y)] for y in ys]
    _write_series(spark, str(tmp_path), {1: up, 2: wig})
    got = {r["symbol"]: r for r in
           q_ts_permutation_entropy(spark, str(tmp_path)).collect()}
    assert got[1]["n_patterns"] == 1
    assert got[1]["perm_entropy"] == 0.0
    # replay symbol 2
    qs = [math.floor(y * 1e6 + 0.5) for y in ys]
    codes = []
    for a, b, c in zip(qs, qs[1:], qs[2:]):
        code = (((b < a) + (c < a)) * 9
                + ((a <= b) + (c < b)) * 3
                + ((a <= c) + (b <= c)))
        codes.append(code)
    cnt = Counter(codes)
    n = len(codes)
    sh = sum(
        math.floor(-(c / n) * math.log(c / n) * 1e12 + 0.5)
        for c in cnt.values()
    ) / 1e12
    assert got[2]["n"] == n
    assert got[2]["n_patterns"] == len(cnt)
    assert got[2]["perm_entropy"] == _snap(sh / math.log(6.0), 8)


# ------------------------------------------------ triangle census


def test_triangle_count_planted_clique_and_df_cap(spark, tmp_path):
    """Users 1-2-3 share one item -> one triangle, cc = 1.0 each;
    a 20-user hub item (df > AA_DF_MAX) contributes NO edges."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        AA_DF_MAX,
        q_graph_triangle_count,
    )

    rows, eid = [], 0
    ts = BASE_TS
    for u in (1, 2, 3):  # item A: clique
        rows.append((eid, ts, u, "buy", 7.0, "{}")); eid += 1
    for u in (1, 2):  # item B: extra edge weight only
        rows.append((eid, ts, u, "view", 3.0, "{}")); eid += 1
    for u in range(100, 100 + AA_DF_MAX + 4):  # hub item, capped out
        rows.append((eid, ts, u, "spam", 1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["user_id"]: r for r in
           q_graph_triangle_count(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}
    for u in (1, 2, 3):
        assert got[u]["tri"] == 1 and got[u]["deg"] == 2
        assert got[u]["cc"] == 1.0


def test_triangle_count_topk_plan_is_take_ordered(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_triangle_count,
    )

    plan = _plan(q_graph_triangle_count(spark, SF))
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- js divergence


def test_js_divergence_single_source_zero_and_replay(spark, tmp_path):
    """One source -> p == q -> JSD exactly 0; two sources replay the
    per-term snapped mixture sum exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_js_divergence,
    )

    docs = [
        (1, "alpha beta beta gamma", "en", "one", 21),
        (2, "alpha gamma delta", "en", "one", 17),
        (3, "epsilon zeta zeta", "en", "two", 17),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["source"]: r for r in
           q_doc_js_divergence(spark, str(tmp_path)).collect()}
    # replay
    tf = Counter()
    for _, text, _, src, _ in docs:
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t:
                tf[(src, t)] += 1
    gtf = Counter()
    for (s, t), c in tf.items():
        gtf[t] += c
    ng = sum(gtf.values())
    for src in ("one", "two"):
        ns = sum(c for (s, t), c in tf.items() if s == src)
        sj = 0
        for t, g in gtf.items():
            p = tf.get((src, t), 0) / ns
            q = g / ng
            m = (p + q) / 2.0
            contrib = (0.5 * p * math.log(p / m) if p > 0 else 0.0) \
                + 0.5 * q * math.log(q / m)
            sj += math.floor(contrib * 1e12 + 0.5)
        sj /= 1e12
        assert got[src]["n_tokens"] == ns
        assert got[src]["jsd"] == _snap(sj, 8)
        assert got[src]["jsd_norm"] == _snap(sj / math.log(2.0), 8)


# ------------------------------------------------- engle-granger


def test_engle_granger_planted_cointegrated_pair(spark, tmp_path):
    """y tracks 2x + a mean-reverting wiggle -> beta ~ 2, phi < 0,
    adf_t < 0; full generic replay of the two-step snapped algebra."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_engle_granger,
    )

    xs = [100.0, 101.0, 99.0, 102.0, 103.0, 101.0, 104.0, 105.0,
          103.0, 106.0, 107.0, 105.0]
    wig = [0.4, -0.3, 0.2, -0.5, 0.1, 0.3, -0.2, 0.5, -0.4, 0.2,
           -0.1, -0.2]
    ys = [2 * x + 5 + w for x, w in zip(xs, wig)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, x)] for x in xs],
        2: [[(0, y)] for y in ys],
    })
    got = q_ts_engle_granger(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["sym_a"], r["sym_b"]) == (1, 2)
    # generic replay
    xq = [math.floor(x * 1e6 + 0.5) for x in xs]
    yq = [math.floor(y * 1e6 + 0.5) for y in ys]
    n = len(xq)
    sx, sy = sum(xq), sum(yq)
    sxy = sum(a * b for a, b in zip(xq, yq))
    sxx = sum(a * a for a in xq)
    syy = sum(b * b for b in yq)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    corr = cov_n / math.sqrt(varx_n * vary_n)
    beta = cov_n / varx_n
    alpha_q = sy / n - beta * (sx / n)
    eq = [math.floor(y - alpha_q - beta * x + 0.5)
          for x, y in zip(xq, yq)]
    els = eq[:-1]
    des = [b - a for a, b in zip(eq, eq[1:])]
    m = len(els)
    see = sum(e * e for e in els)
    sed = sum(e * d for e, d in zip(els, des))
    sdd = sum(d * d for d in des)
    phi = sed / see
    sse = sdd - 2.0 * phi * sed + phi * phi * see
    se = math.sqrt((sse / (m - 1)) / see)
    assert r["n"] == n and r["m"] == m
    assert r["corr"] == _snap(corr, 8)
    assert r["beta"] == _snap(beta, 8)
    assert abs(r["beta"] - 2.0) < 0.05
    assert r["alpha"] == _snap(alpha_q / 1e6, 8)
    assert r["phi"] == _snap(phi, 8)
    assert r["adf_t"] == _snap(phi / se, 8)
    assert r["phi"] < 0 and r["adf_t"] < 0  # mean-reverting spread


# -------------------------------------------------- burstiness


def test_burstiness_periodic_vs_bursty(spark, tmp_path):
    """Perfectly regular gaps -> B = -1 exactly; a bursty pattern
    replays the exact-integer-micros moment algebra."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_burstiness,
    )

    rows, eid = [], 0
    for i in range(10):  # regular: every 3600 s
        rows.append((eid, BASE_TS + timedelta(seconds=3600 * i),
                     1, "steady", 1.0, "{}")); eid += 1
    offs = [0, 10, 25, 30, 3000, 3010, 3015, 9000]  # bursty, seconds
    for o in offs:
        rows.append((eid, BASE_TS + timedelta(seconds=o),
                     2, "bursty", 1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["event_type"]: r for r in
           q_events_burstiness(spark, str(tmp_path)).collect()}
    assert got["steady"]["std_gap_s"] == 0.0
    assert got["steady"]["cv"] == 0.0
    assert got["steady"]["burstiness"] == -1.0
    assert got["steady"]["mean_gap_s"] == 3600.0
    gaps = [(b - a) * 1_000_000 for a, b in zip(offs, offs[1:])]
    n = len(gaps)
    sg, sgg = sum(gaps), sum(g * g for g in gaps)
    mu = sg / n
    sigma = math.sqrt(max(n * sgg - sg * sg, 0)) / n
    r = got["bursty"]
    assert r["n"] == n
    assert r["mean_gap_s"] == _snap(mu / 1e6, 8)
    assert r["std_gap_s"] == _snap(sigma / 1e6, 8)
    assert r["cv"] == _snap(sigma / mu, 8)
    assert r["burstiness"] == _snap((sigma - mu) / (sigma + mu), 8)
    assert r["burstiness"] > 0  # bursty side of the scale


# ------------------------------------------------- garch scan


def test_garch_scan_matches_sequential_arrow_pass(spark):
    """The generalized affine scan on GARCH(1,1) must agree with the
    sequential garch_filter fold to <1e-8 on the fixture series
    (divergence only the term-grid snap + per-segment
    reassociation), with real multi-segment composition."""
    from big_data_stock_price_forecast_spark.operators.rolling import (
        garch_filter,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        GARCH_SCAN_ALPHA,
        GARCH_SCAN_BETA,
        GARCH_SCAN_OMEGA,
        _filled,
        q_ts_garch_scan,
    )

    got = {
        r["symbol"]: (r["n"], r["n_seg"], r["garch_vol_last"])
        for r in q_ts_garch_scan(spark, SF).collect()
    }
    assert got and all(v[1] > 1 for v in got.values())
    df = _filled(spark, SF).select("symbol", "time_idx", "close")
    w = Window.partitionBy("symbol").orderBy("time_idx")
    prev = F.lag("close", 1).over(w)
    lr = F.when(
        (F.col("close") > 0) & (prev > 0),
        F.log(F.col("close") / prev),
    ).otherwise(F.when(prev.isNotNull(), F.lit(0.0)))
    base = df.withColumn(
        "r2", F.floor(lr * lr * 1e12 + F.lit(0.5)) / 1e12
    )
    seq = garch_filter(
        base, "r2", "v",
        omega=GARCH_SCAN_OMEGA, alpha=GARCH_SCAN_ALPHA,
        beta=GARCH_SCAN_BETA,
    )
    last = {
        r["symbol"]: r["v"]
        for r in seq.filter(F.col("v").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy(
                    F.col("time_idx").desc()
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    for s, (n, n_seg, vol) in got.items():
        assert abs(vol - math.sqrt(last[s])) < 1e-8, (s, vol, last[s])


def test_garch_scan_plan_has_no_python(spark):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_garch_scan,
    )

    plan = _plan(q_ts_garch_scan(spark, SF))
    assert "FlatMapGroupsInPandas" not in plan
    assert "Python" not in plan


# ---------------------------------------------- entropy rate


def test_entropy_rate_deterministic_and_uniform_chains(spark, tmp_path):
    """A deterministic chain (A->B always) has H(next|A) = 0; a
    uniform 2-way split has exactly ln 2; pi shares replay."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_entropy_rate,
    )

    rows, eid = [], 0
    # user 1: A B A B A B  -> A->B x3? sequence A,B,A,B,A,B:
    # transitions A->B, B->A, A->B, B->A, A->B  (det both ways)
    for i, t in enumerate(["A", "B", "A", "B", "A", "B"]):
        rows.append((eid, BASE_TS + timedelta(seconds=i), 1, t,
                     1.0, "{}")); eid += 1
    # user 2: C->D, C->E (uniform 2-way from C)
    for i, t in enumerate(["C", "D"]):
        rows.append((eid, BASE_TS + timedelta(seconds=i), 2, t,
                     1.0, "{}")); eid += 1
    for i, t in enumerate(["C", "E"]):
        rows.append((eid, BASE_TS + timedelta(seconds=i), 3, t,
                     1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["cur"]: r for r in
           q_events_entropy_rate(spark, str(tmp_path)).collect()}
    # totals: A->B x3, B->A x2, C->D, C->E => N = 7
    assert got["A"]["h_cond"] == 0.0 and got["B"]["h_cond"] == 0.0
    assert got["A"]["n_from"] == 3 and got["B"]["n_from"] == 2
    assert got["A"]["pi"] == _snap(3 / 7, 8)
    two = math.floor(0.5 * math.log(2.0) * 1e12 + 0.5) / 1e12 * 2
    assert got["C"]["h_cond"] == _snap(two, 8)
    assert got["C"]["rate_contrib"] == _snap((2 / 7) * two, 8)


# ------------------------------------------- price elasticity


def test_price_elasticity_planted_power_law(spark, tmp_path):
    """Demand planted exactly q = k * price^-2 -> elasticity -2,
    r2 = 1 (log-log line is exact)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_part_price_elasticity,
    )

    parts = [(i, f"part{i}", "BRAND#11", "t", 1, 10.0) for i in
             range(1, 7)]
    spark.createDataFrame(
        parts, "p_partkey long, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")
    rows = []
    prices = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    for i, price in enumerate(prices, start=1):
        qty = 64.0 / (price * price)  # q = 64 p^-2
        rows.append((i, i, 1, 1, qty, qty * price, 0.0, 0.0,
                     "N", "O", BASE_TS))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = q_part_price_elasticity(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == len(prices)
    assert abs(r["elasticity"] + 2.0) < 1e-6
    assert abs(r["r2"] - 1.0) < 1e-9


# ------------------------------------------------- heaps law


def test_heaps_law_replay_on_planted_corpus(spark, tmp_path):
    """Generic replay of the cumulative (N, V) checkpoints and the
    snapped log-log OLS over a hand-built corpus, including a doc
    with zero new types."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_heaps_law,
    )

    texts = [
        "alpha beta gamma",          # 3 new
        "alpha beta",                # 0 new
        "delta epsilon alpha zeta",  # 3 new
        "zeta eta",                  # 1 new
        "theta",                     # 1 new
    ]
    docs = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = q_doc_heaps_law(spark, str(tmp_path)).collect()[0]
    # replay
    seen, pts, N = set(), [], 0
    for t in texts:
        toks = t.split()
        N += len(toks)
        seen |= set(toks)
        pts.append((N, len(seen)))
    xs = [math.floor(math.log(n) * 1e9 + 0.5) for n, v in pts]
    ys = [math.floor(math.log(v) * 1e9 + 0.5) for n, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    b = cov_n / varx_n
    ln_k = (sy / n - b * (sx / n)) / 1e9
    r2 = (cov_n * cov_n) / (varx_n * vary_n)
    assert got["n_docs"] == n
    assert got["heaps_b"] == _snap(b, 8)
    assert got["heaps_k"] == _snap(math.exp(ln_k), 8)
    assert got["r2"] == _snap(r2, 8)
    assert 0 < got["heaps_b"] < 1  # sublinear vocabulary growth


# --------------------------------------------- ivf probe curve


def test_ivf_probe_curve_monotone_in_nprobe(spark):
    """More probes can only add candidates: mean_scanned strictly
    grows and mean_recall is non-decreasing in nprobe; recall is a
    valid fraction; the exact-integer identities hold."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        KNN_K,
        q_emb_ivf_probe_curve,
    )

    rows = {r["nprobe"]: r for r in
            q_emb_ivf_probe_curve(spark, SF).collect()}
    assert sorted(rows) == [1, 2, 4]
    prev_r, prev_s = -1.0, -1.0
    for np_ in (1, 2, 4):
        r = rows[np_]
        assert 0.0 <= r["mean_recall"] <= 1.0
        assert r["mean_recall"] >= prev_r
        assert r["mean_scanned"] > prev_s
        assert r["total_hits"] <= r["n_queries"] * KNN_K
        prev_r, prev_s = r["mean_recall"], r["mean_scanned"]
    assert rows[4]["mean_recall"] > 0.5  # 4 of 10 lists probed


# ------------------------------------------ hierarchical scan


def test_affine_scan_hierarchical_matches_flat(spark):
    """levels=2 (segments-of-segments composition) must agree with
    the flat levels=1 scan to fp tolerance on a series long enough
    for several SUPER-segments, and report the composed n_seg."""
    import pandas as pd

    n = 210
    ys = [100.0 + math.sin(i * 0.31) * 40.0 + (i % 11) for i in range(n)]
    pdf = pd.DataFrame({"symbol": 1, "time_idx": range(n), "close": ys})
    df = spark.createDataFrame(pdf)
    flat = affine_ema_scan(
        df, "close", "symbol", "time_idx", alpha=0.5, seg_len=8
    ).collect()[0]
    from big_data_stock_price_forecast_spark.operators.twophase import (
        affine_scan,
    )
    from pyspark.sql import functions as FF

    d = df.select(
        "symbol", "time_idx",
        (FF.col("close") * FF.lit(0.5)).alias("b"),
        FF.col("close").alias("b_seed"),
    )
    hier = affine_scan(
        d, "b", "b_seed", "symbol", "time_idx",
        mult=0.5, seg_len=8, levels=2, out_col="ema_last",
    ).collect()[0]
    assert flat["n"] == hier["n"] == n
    assert flat["n_seg"] == math.ceil(n / 8)          # 27 segments
    assert hier["n_seg"] == math.ceil(n / 64)         # 4 super-segments
    assert abs(flat["ema_last"] - hier["ema_last"]) < 1e-9


# ------------------------------------------------- r11 plan pins


def test_r11_market_cards_single_exchange(spark):
    """kyle/garman ride the ts family's one symbol exchange — no
    extra shuffle sneaks in as the cards evolve."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_garman_klass_vol,
        q_ts_kyle_lambda,
    )

    for fn in (q_ts_kyle_lambda, q_ts_garman_klass_vol):
        plan = _plan(fn(spark, SF))
        assert plan.count("Exchange hashpartitioning") <= 1, fn.__name__
        assert "Python" not in plan, fn.__name__


def test_r11_no_python_and_no_cartesian(spark):
    """None of the round-11 additions may regress to a Python stage
    or a real cartesian product (crossJoin only against broadcast
    one-row/scalar frames shows as BroadcastNestedLoopJoin over a
    SinglePartition broadcast — permitted; CartesianProduct is not)."""
    from big_data_stock_price_forecast_spark.plans import registry as R

    names = [
        "ts_ema_scan", "graph_jaccard_links", "ts_variance_ratio",
        "ts_capm_beta", "ts_amihud_illiq", "doc_lexical_diversity",
        "emb_ivf_balance", "graph_triangle_count", "ts_kyle_lambda",
        "ts_garman_klass_vol", "ts_permutation_entropy",
        "doc_js_divergence", "ts_engle_granger", "events_burstiness",
        "ts_garch_scan", "events_entropy_rate",
        "part_price_elasticity", "doc_heaps_law", "emb_ivf_probe_curve",
    ]
    qs = R.all_queries()
    for n in names:
        plan = _plan(qs[n](spark, SF))
        assert "Python" not in plan, n
        assert "CartesianProduct" not in plan, n


# --------------------------------------- amihud zero-close guard


def test_amihud_zero_close_buckets_are_excluded(spark, tmp_path):
    """A zero close on the grid must not blow up the dollar-volume
    division (ANSI throws on the unguarded form — sf0.1 regression,
    r11) and must leave count and mean identically."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_amihud_illiq,
    )

    closes = [100.0, 101.0, 0.0, 102.0, 103.0]
    _write_series(spark, str(tmp_path),
                  {1: [[(0, c)] for c in closes]})
    got = q_ts_amihud_illiq(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # rows excluded: rn=1 (no lag) and the qc=0 bucket -> n = 3
    assert r["n"] == 3
    qcs = [math.floor(c * 1e6 + 0.5) for c in closes]
    rqs = [
        math.floor(abs(qcs[i] - qcs[i - 1]) / (qcs[i] * 1.0) * 1e12
                   + 0.5)
        for i in range(1, len(qcs)) if qcs[i] > 0
    ]
    illiq = sum(rqs) / len(rqs) / 1e12 * 1e6
    assert r["illiq_x1e6"] == _snap(illiq, 8)


# ------------------- value-level contracts for the first batch
# (review finding: these five shipped with plan pins only)


def test_variance_ratio_momentum_vs_reversion_replay(spark, tmp_path):
    """Smooth positively-autocorrelated changes -> VR > 1 (momentum);
    an alternating zigzag (changes cancel over q periods) -> VR < 1;
    the snapped moment algebra replays exactly on both."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VR_Q,
        q_ts_variance_ratio,
    )

    smooth = [100.0 + 50.0 * math.sin(i * 0.2) for i in range(20)]
    zigzag = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(20)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in smooth],
        2: [[(0, y)] for y in zigzag],
    })
    got = {r["symbol"]: r for r in
           q_ts_variance_ratio(spark, str(tmp_path)).collect()}
    q = VR_Q
    for sym, ys in ((1, smooth), (2, zigzag)):
        qs = [math.floor(y * 1e6 + 0.5) for y in ys]
        xs = [b - a for a, b in zip(qs, qs[1:])]
        yq = [qs[i] - qs[i - q] for i in range(q, len(qs))]
        n1, nq = len(xs), len(yq)
        sx, sxx = sum(xs), sum(v * v for v in xs)
        sy, syy = sum(yq), sum(v * v for v in yq)
        var1 = (n1 * sxx - sx * sx) / (n1 * n1)
        varq = (nq * syy - sy * sy) / (nq * nq)
        vr = varq / (q * var1)
        z = (vr - 1.0) / math.sqrt(
            2.0 * (2 * q - 1) * (q - 1) / (3.0 * q) / nq
        )
        r = got[sym]
        assert (r["n1"], r["nq"]) == (n1, nq)
        assert r["vr"] == _snap(vr, 8)
        assert r["z"] == _snap(z, 8)
    assert got[1]["vr"] > 1.0  # persistent changes -> momentum
    assert got[2]["vr"] < 1.0  # q=4 telescopes the zigzag away


def test_capm_beta_planted_two_symbol_market(spark, tmp_path):
    """Symbol 2 moves 3x symbol 1 -> beta2 > 1 > beta1 against the
    equal-weight index; full generic replay of the snapped
    normal-equation algebra including the index construction."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_capm_beta,
    )

    moves = [0.0, 1.0, -0.5, 2.0, -1.0, 1.5, 0.5, -2.0, 1.0, 0.75]
    s1 = [100.0]
    for m in moves[1:]:
        s1.append(s1[-1] + m)
    s2 = [200.0]
    for m in moves[1:]:
        s2.append(s2[-1] + 3.0 * m)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in s1],
        2: [[(0, y)] for y in s2],
    })
    got = {r["symbol"]: r for r in
           q_ts_capm_beta(spark, str(tmp_path)).collect()}
    q1 = [math.floor(y * 1e6 + 0.5) for y in s1]
    q2 = [math.floor(y * 1e6 + 0.5) for y in s2]
    mq = [math.floor((a + b) / 2 + 0.5) for a, b in zip(q1, q2)]
    for sym, qs in ((1, q1), (2, q2)):
        xs = [b - a for a, b in zip(qs, qs[1:])]
        ms = [b - a for a, b in zip(mq, mq[1:])]
        n = len(xs)
        sx, sm = sum(xs), sum(ms)
        sxm = sum(a * b for a, b in zip(xs, ms))
        smm = sum(b * b for b in ms)
        sxx = sum(a * a for a in xs)
        cov_n = n * sxm - sx * sm
        varm_n = n * smm - sm * sm
        varx_n = n * sxx - sx * sx
        beta = cov_n / varm_n
        alpha = (sx / n - beta * (sm / n)) / 1e6
        r2 = (cov_n * cov_n) / (varm_n * varx_n)
        r = got[sym]
        assert r["n"] == n
        assert r["beta"] == _snap(beta, 8)
        assert r["alpha"] == _snap(alpha, 8)
        assert r["r2"] == _snap(r2, 8)
    assert got[2]["beta"] > 1.0 > got[1]["beta"]


def test_jaccard_links_planted_overlap(spark, tmp_path):
    """Users 1/2 share two items out of three -> J = 2/3 at rank 1;
    the deg/union integers and the (jac, u1, u2) tie-break replay."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_jaccard_links,
    )

    rows, eid = [], 0
    # items are (event_type, day, floor(value)); df >= 2 required
    plant = [
        ("i1", [1, 2]), ("i2", [1, 2]), ("i3", [1, 3]),
        ("i4", [2, 3]),
    ]
    for item, users in plant:
        for u in users:
            rows.append((eid, BASE_TS, u, item, 1.0, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {(r["u1"], r["u2"]): r for r in
           q_graph_jaccard_links(spark, str(tmp_path)).collect()}
    # deg: 1 -> {i1,i2,i3}=3, 2 -> {i1,i2,i4}=3, 3 -> {i3,i4}=2
    r12 = got[(1, 2)]
    assert (r12["inter"], r12["un"]) == (2, 4)
    assert r12["jaccard"] == _snap(2 / 4, 8)
    assert r12["rank"] == 1
    r13 = got[(1, 3)]
    assert (r13["inter"], r13["un"]) == (1, 4)
    r23 = got[(2, 3)]
    assert (r23["inter"], r23["un"]) == (1, 4)
    # tie between (1,3) and (2,3) at jac=0.25 -> u1 breaks it
    assert r13["rank"] == 2 and r23["rank"] == 3


def test_lexical_diversity_replay(spark, tmp_path):
    """TTR / hapax fraction / Herdan's C replay exactly on a planted
    two-source corpus; a one-token source is filtered (n >= 2)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_lexical_diversity,
    )

    docs = [
        (1, "a b b c c c", "en", "rich", 11),
        (2, "d d d d", "en", "rich", 7),
        (3, "x", "en", "tiny", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["source"]: r for r in
           q_doc_lexical_diversity(spark, str(tmp_path)).collect()}
    assert "tiny" not in got  # n_tokens = 1 < 2 filtered
    r = got["rich"]
    # rich: tokens a b b c c c d d d d -> n=10, types {a,b,c,d}=4,
    # hapax {a}=1
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (10, 4, 1)
    assert r["ttr"] == _snap(4 / 10, 8)
    assert r["hapax_frac"] == _snap(1 / 4, 8)
    assert r["herdan_c"] == _snap(math.log(4) / math.log(10), 8)


def test_ivf_balance_invariants(spark):
    """On the fixture index: K lists = label count, sizes sum to the
    corpus, imbalance >= 1 (Cauchy-Schwarz, = 1 iff perfectly
    balanced), and the empty count is consistent with min_sz."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        _emb,
        q_emb_ivf_balance,
    )

    r = q_emb_ivf_balance(spark, SF).collect()[0]
    n_emb = _emb(spark, SF).count()
    assert r["n_vecs"] == n_emb
    assert r["k_lists"] == 10
    assert r["min_sz"] <= n_emb / r["k_lists"] <= r["max_sz"]
    assert r["imbalance"] >= 1.0 - 1e-9
    assert (r["n_empty"] > 0) == (r["min_sz"] == 0)


# -------------------------------------------------- runs z-test


def test_runs_ztest_oscillating_vs_trending(spark, tmp_path):
    """A perfect zigzag maximizes runs (z > 0); a two-block trend
    minimizes them (z < 0); counts and the closed-form z replay."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_runs_ztest,
    )

    zig = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(13)]
    trend = [100.0 + (i if i < 6 else 12 - i) for i in range(13)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in zig],
        2: [[(0, y)] for y in trend],
    })
    got = {r["symbol"]: r for r in
           q_ts_runs_ztest(spark, str(tmp_path)).collect()}

    def replay(ys):
        dirs = [1 if b > a else -1 for a, b in zip(ys, ys[1:]) if b != a]
        n1 = sum(1 for d in dirs if d == 1)
        n2 = len(dirs) - n1
        runs = 1 + sum(1 for a, b in zip(dirs, dirs[1:]) if a != b)
        nn = n1 + n2
        e = 2.0 * n1 * n2 / nn + 1.0
        var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)
               / (nn * nn * (nn - 1.0)))
        return n1, n2, runs, e, (runs - e) / math.sqrt(var)

    for sym, ys in ((1, zig), (2, trend)):
        n1, n2, runs, e, z = replay(ys)
        r = got[sym]
        assert (r["n_up"], r["n_down"], r["runs"]) == (n1, n2, runs)
        assert r["e_runs"] == _snap(e, 8)
        assert r["z"] == _snap(z, 8)
    assert got[1]["z"] > 0 > got[2]["z"]


# ---------------------------------------------- vocab coverage


def test_vocab_coverage_monotone_and_replay(spark, tmp_path):
    """Coverage is non-decreasing in K and hits 1.0 once K >= vocab;
    the exact-integer covered counts replay with the (cnt DESC, term)
    tie-break."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VOCAB_COVERAGE_KS,
        q_doc_vocab_coverage,
    )

    docs = [(i, " ".join(f"w{j}" for j in range(i + 1)), "en", "s", 10)
            for i in range(30)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r["vocab_k"]: r for r in
            q_doc_vocab_coverage(spark, str(tmp_path)).collect()}
    cnt = Counter()
    for _, text, _, _, _ in docs:
        cnt.update(text.split())
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    prev = -1.0
    for k in VOCAB_COVERAGE_KS:
        covered = sum(c for _, c in ranked[:k])
        r = rows[k]
        assert r["n_types"] == len(cnt) and r["n_tokens"] == total
        assert r["covered_tokens"] == covered
        assert r["coverage"] == _snap(covered / total, 8)
        assert r["coverage"] >= prev
        prev = r["coverage"]
    assert rows[max(VOCAB_COVERAGE_KS)]["coverage"] == 1.0  # K > vocab


# ------------------------------------------- centroid margins


def test_centroid_margin_invariants(spark):
    """Margins are non-negative, every list with members appears,
    min <= mean, and the per-list vector counts sum to the corpus."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        _emb,
        q_emb_centroid_margin,
    )

    rows = q_emb_centroid_margin(spark, SF).collect()
    assert rows
    n_total = sum(r["n"] for r in rows)
    assert n_total == _emb(spark, SF).count()
    for r in rows:
        assert r["min_margin"] >= 0.0
        assert r["mean_margin"] >= r["min_margin"]


# ----------------------------------------------- adf unit root


def test_adf_unit_root_stationary_vs_walk(spark, tmp_path):
    """A strongly mean-reverting series gives a large-negative ADF t;
    a near-deterministic trend (unit-root-ish, changes independent of
    level) gives |phi| near 0; the two-regressor moment algebra
    replays exactly."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_adf_unit_root,
    )

    # OU-ish: y pulls hard toward 100 from alternating displacements
    revert = [100.0]
    for i in range(15):
        shock = 4.0 if i % 2 == 0 else -3.0
        revert.append(100.0 + 0.2 * (revert[-1] - 100.0) + shock)
    walkish = [100.0 + 1.0 * i + (0.3 if i % 2 == 0 else -0.2)
               for i in range(16)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in revert],
        2: [[(0, y)] for y in walkish],
    })
    got = {r["symbol"]: r for r in
           q_ts_adf_unit_root(spark, str(tmp_path)).collect()}

    def replay(ys):
        qs = [math.floor(y * 1e6 + 0.5) for y in ys]
        xl = qs[:-1]
        dy = [b - a for a, b in zip(qs, qs[1:])]
        n = len(dy)
        sx, sd = sum(xl), sum(dy)
        sxd = sum(a * b for a, b in zip(xl, dy))
        sxx = sum(a * a for a in xl)
        sdd = sum(b * b for b in dy)
        varx_n = n * sxx - sx * sx
        b = (n * sxd - sx * sd) / varx_n
        a = (sd - b * sx) / n
        sse = (sdd + n * a * a + b * b * sxx
               - 2.0 * a * sd - 2.0 * b * sxd + 2.0 * a * b * sx)
        se = math.sqrt(max(sse, 0.0) / (n - 2) * n / varx_n)
        return n, b, a, b / se

    for sym, ys in ((1, revert), (2, walkish)):
        n, b, a, t = replay(ys)
        r = got[sym]
        assert r["n"] == n
        assert r["phi"] == _snap(b, 10)
        assert r["drift"] == _snap(a / 1e6, 8)
        assert r["adf_t"] == _snap(t, 8)
    assert got[1]["adf_t"] < -3.0   # strong mean reversion
    assert got[1]["phi"] < -0.5
    assert abs(got[2]["phi"]) < 0.2  # level doesn't predict change


# ------------------------------------------------- haar energy


def test_haar_energy_replay_and_scale_localization(spark, tmp_path):
    """A pure 2-bucket alternation puts ALL its energy at level 1
    (levels 2-3 exactly 0); a planted series replays the exact
    block-sum algebra including partial-trailing-block drops."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        HAAR_LEVELS,
        q_ts_haar_energy,
    )

    alt = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(16)]
    ys = [100.0 + math.sin(i * 0.5) * 10.0 + i * 0.3 for i in range(13)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in alt],
        2: [[(0, y)] for y in ys],
    })
    got = {(r["symbol"], r["level"]): r for r in
           q_ts_haar_energy(spark, str(tmp_path)).collect()}
    # symbol 1: d at level 1 = (a-b)/2 = 1 per block -> E1 = 8 blocks * 1
    assert got[(1, 1)]["energy"] == 8.0
    assert got[(1, 2)]["energy"] == 0.0
    assert got[(1, 3)]["energy"] == 0.0
    # symbol 2 (13 rows): full blocks 6/3/1, trailing partials drop
    for k in HAAR_LEVELS:
        blk = 1 << k
        qs = [math.floor(y * 1e6 + 0.5) for y in ys]
        nb = len(qs) // blk
        ssq = 0
        for b in range(nb):
            seg = qs[b * blk:(b + 1) * blk]
            num = sum(seg[: blk // 2]) - sum(seg[blk // 2:])
            ssq += num * num
        r = got[(2, k)]
        assert r["n_blocks"] == nb
        exp = ssq / float(4 ** k) / 1e12
        assert r["energy"] == _snap(exp, 6)
