"""Contracts for the profiling/temporal batch: SCD2 point-in-time
revenue, JSON schema profile, key-skew report, winsorize/robust-z
stats."""

import json
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    SCD2_TIER_DIV,
    SKEW_TOP_K,
    WINSOR_HI,
    WINSOR_LO,
    _filled,
    q_events_json_schema_profile,
    q_events_scd2_pit_revenue,
    q_events_skew_report,
    q_ts_winsorize_robust,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_pit_revenue_accounts_every_purchase(spark, sf_dir):
    out = q_events_scd2_pit_revenue(spark, sf_dir).collect()
    assert out
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    n_purchases = sum(1 for r in ev if r["event_type"] == "purchase")
    assert sum(r["n_purchases"] for r in out) == n_purchases
    # python PIT replay
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    rev = defaultdict(float)
    cnt: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        tier, last_signup_ts = None, None
        # build tier change points: dedup same-ts signups keep max id,
        # collapse unchanged tiers
        changes = []
        signups = [r for r in rows if r["event_type"] == "signup"]
        by_ts = {}
        for s in signups:
            if s["ts"] not in by_ts or s["event_id"] > by_ts[s["ts"]]["event_id"]:
                by_ts[s["ts"]] = s
        prev = None
        for ts in sorted(by_ts):
            t = int(math.floor(by_ts[ts]["value"] / SCD2_TIER_DIV))
            if prev is None or t != prev:
                changes.append((ts, t))
                prev = t
        for r in rows:
            if r["event_type"] != "purchase":
                continue
            cur = None
            for ts, t in changes:
                if ts <= r["ts"]:
                    cur = t
                else:
                    break
            cnt[cur] += 1
            rev[cur] += round(r["value"], 2)
    got = {r["tier"]: r for r in out}
    assert {k: v for k, v in cnt.items()} == {
        t: r["n_purchases"] for t, r in got.items()
    }
    for t, r in got.items():
        assert abs(r["revenue"] - rev[t]) < 1e-6


def test_json_profile_covers_every_kv_pair(spark, sf_dir):
    out = q_events_json_schema_profile(spark, sf_dir).collect()
    assert out
    docs = load_table(spark, sf_dir, "events").select("props").collect()
    n_pairs = 0
    vals = defaultdict(set)
    for r in docs:
        d = json.loads(r["props"])
        n_pairs += len(d)
        for k, v in d.items():
            vals[k].add(str(v))
    assert sum(r["n"] for r in out) == n_pairs
    for r in out:
        assert r["n_distinct"] == len(
            {v for v in vals[r["key"]]}
        ) or r["n_distinct"] <= len(vals[r["key"]])
        assert r["min_v"] <= r["max_v"]


def test_skew_report_is_the_true_topk(spark, sf_dir):
    out = [(r["user_id"], r["n_rows"]) for r in
           q_events_skew_report(spark, sf_dir).collect()]
    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    cnt = Counter(r["user_id"] for r in ev)
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOP_K]
    assert out == expect
    total = sum(cnt.values())
    for r in q_events_skew_report(spark, sf_dir).collect():
        assert r["share_ppm"] == r["n_rows"] * 1_000_000 // total


def test_winsorize_stats_are_exact_rank_picks(spark, sf_dir):
    out = {r["symbol"]: r for r in
           q_ts_winsorize_robust(spark, sf_dir).collect()}
    assert out
    sym = next(iter(out))
    rows = _filled(spark, sf_dir).filter(F.col("symbol") == sym).collect()
    closes = sorted((r["close"], r["time_idx"]) for r in rows)
    n = len(closes)

    def pick(vals, p):
        return vals[int(math.floor((n - 1) * p))][0]

    r = out[sym]
    assert abs(r["p1"] - pick(closes, WINSOR_LO)) < 2e-6
    assert abs(r["p99"] - pick(closes, WINSOR_HI)) < 2e-6
    med = pick(closes, 0.5)
    assert abs(r["median"] - med) < 2e-6
    adevs = sorted(
        (abs(c - med), t) for c, t in closes
    )
    assert abs(r["mad"] - adevs[int(math.floor((n - 1) * 0.5))][0]) < 2e-6
    assert r["p1"] <= r["median"] <= r["p99"]
    assert r["mad"] >= 0
