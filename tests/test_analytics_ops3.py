"""Contracts for the third round-6 analytics batch: window-form CUSUM
change-point alarms, the 2-D Pareto skyline, event-path trigrams, and
daily TWAP."""

from collections import Counter, defaultdict
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    CUSUM_H_SIGMA,
    CUSUM_K_SIGMA,
    PATH_TOP_N,
    _filled,
    _series,
    q_events_path_trigrams,
    q_part_skyline,
    q_ts_cusum_alarms,
    q_ts_twap_daily,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_cusum_window_form_matches_recursion(spark, sf_dir):
    """The closed window form (running sum − running min) must equal
    the textbook recursion s_t = max(0, s_{t-1} + dev_t)."""
    out = q_ts_cusum_alarms(spark, sf_dir).collect()
    assert out
    all_rows = _filled(spark, sf_dir).collect()
    by_sym = defaultdict(list)
    for r in all_rows:
        by_sym[r["symbol"]].append(r)

    def g(v):
        import math

        return math.floor(v * 1e6 + 0.5) / 1e6

    expect = []
    for sym, rows in by_sym.items():
        rows.sort(key=lambda r: r["time_idx"])
        xs = [r["close"] for r in rows]
        n = len(xs)
        mu = sum(g(x) for x in xs) / n
        var = sum(g(x * x) for x in xs) / n - mu * mu
        sigma = var**0.5
        k = CUSUM_K_SIGMA * sigma
        h = CUSUM_H_SIGMA * sigma
        s_up, s_dn = 0.0, 0.0
        pup, pdn = None, None
        for r, x in zip(rows, xs):
            s_up = max(0.0, s_up + (x - mu - k))
            s_dn = max(0.0, s_dn + (mu - k - x))
            if s_up > h and (pup is None or pup <= h):
                expect.append((sym, r["time_idx"], "up"))
            if s_dn > h and (pdn is None or pdn <= h):
                expect.append((sym, r["time_idx"], "down"))
            pup, pdn = s_up, s_dn
    got = sorted(
        (r["symbol"], r["time_idx"], r["direction"]) for r in out
    )
    assert got == sorted(expect)
    for r in out:
        assert r["stat_sigmas"] > CUSUM_H_SIGMA - 1e-6


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    out = {(r["p_partkey"]) for r in q_part_skyline(spark, sf_dir).collect()}
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    # brute-force dominance: minimize price, maximize size
    expect = set()
    for a in parts:
        dominated = any(
            (b["p_retailprice"] <= a["p_retailprice"])
            and (b["p_size"] >= a["p_size"])
            and (
                (b["p_retailprice"] < a["p_retailprice"])
                or (b["p_size"] > a["p_size"])
            )
            for b in parts
        )
        if not dominated:
            expect.add(a["p_partkey"])
    assert out == expect


def test_path_trigrams_match_python_replay(spark, sf_dir):
    out = [
        ((r["step1"], r["step2"], r["step3"]), r["n_paths"])
        for r in q_events_path_trigrams(spark, sf_dir).collect()
    ]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    cnt: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        types = [r["event_type"] for r in rows]
        for i in range(len(types) - 2):
            cnt[tuple(types[i : i + 3])] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_N]
    assert out == expect


def test_twap_replays_duration_weights(spark, sf_dir):
    out = {(r["symbol"], r["day"]): r for r in
           q_ts_twap_daily(spark, sf_dir).collect()}
    assert out
    rows = _series(spark, sf_dir).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[(r["symbol"], r["datetime"].date())].append(r)
    import math

    def g(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    checked = 0
    for (sym, day), rs in list(by_key.items())[:30]:
        rs.sort(key=lambda r: r["datetime"])
        day_end = datetime.combine(day, datetime.min.time()) + timedelta(
            days=1
        )
        swx = sw = 0.0
        for i, r in enumerate(rs):
            nxt = rs[i + 1]["datetime"] if i + 1 < len(rs) else day_end
            wt = (nxt - r["datetime"]).total_seconds()
            swx += g(r["close"] * wt)
            sw += g(wt)
        got = out[(sym, day)]
        assert got["n_obs"] == len(rs)
        assert abs(got["twap"] - swx / sw) < 2e-6
        lo, hi = min(r["close"] for r in rs), max(r["close"] for r in rs)
        assert lo - 1e-9 <= got["twap"] <= hi + 1e-9
        checked += 1
    assert checked


def test_markov_rows_are_probability_distributions(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_markov_transitions,
    )

    out = q_events_markov_transitions(spark, sf_dir).collect()
    assert out
    by_cur = defaultdict(float)
    for r in out:
        assert 0.0 < r["p"] <= 1.0 and r["n_trans"] >= 1
        by_cur[r["cur"]] += r["p"]
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-9, cur
    # replay one current state against the raw timelines
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    cnt = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(rows, rows[1:]):
            cnt[(a["event_type"], b["event_type"])] += 1
    got = {(r["cur"], r["nxt"]): r["n_trans"] for r in out}
    assert got == dict(cnt)
