"""Contracts for the round-6 analytics additions: bipartite HITS,
last-touch attribution, cumulative distinct users, unigram LM scoring,
and the k-anonymity audit. The registry oracle pins full values against
DuckDB; these replay the semantics in plain Python on the small
fixture."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.text import TOKEN_SPLIT_RE
from big_data_stock_price_forecast_spark.plans.registry import (
    ATTRIB_TOUCHES,
    K_ANON_THRESHOLD,
    q_doc_unigram_ppl,
    q_events_attribution,
    q_events_cumulative_users,
    q_events_k_anonymity,
    q_graph_hits_parts,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

import re


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


def test_hits_matches_python_power_iteration(spark, sf_dir):
    out = q_graph_hits_parts(spark, sf_dir).collect()
    assert out
    edges = {
        (r["l_partkey"], r["l_suppkey"])
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    }
    auth1: Counter = Counter(p for p, _ in edges)
    hub1: Counter = Counter()
    for p, s in edges:
        hub1[s] += auth1[p]
    auth2: Counter = Counter()
    for p, s in edges:
        auth2[p] += hub1[s]
    ranked = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["p_partkey"], r["authority"]) for r in out]
    assert got == ranked
    for r in out:
        assert r["degree"] == auth1[r["p_partkey"]]


def test_attribution_replays_user_timelines(spark, sf_dir):
    out = {r["channel"]: r for r in
           q_events_attribution(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    expect_n: Counter = Counter()
    expect_rev: dict = defaultdict(float)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        last_touch = None
        for r in rows:
            if r["event_type"] == "purchase":
                ch = last_touch or "none"
                expect_n[ch] += 1
                expect_rev[ch] += round(r["value"], 2)
            if r["event_type"] in ATTRIB_TOUCHES:
                last_touch = r["event_type"]
    assert {c: r["n_purchases"] for c, r in out.items()} == dict(expect_n)
    for c, r in out.items():
        assert abs(r["revenue"] - expect_rev[c]) < 1e-6


def test_cumulative_users_is_a_prefix_sum_of_first_touches(spark, sf_dir):
    out = sorted(
        q_events_cumulative_users(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert out
    running = 0
    for r in out:
        running += r["n_new_users"]
        assert r["cum_users"] == running
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert out[-1]["cum_users"] == n_users


def test_unigram_ppl_matches_python_lm(spark, sf_dir):
    out = {r["doc_id"]: r for r in q_doc_unigram_ppl(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    counts: Counter = Counter()
    for d in docs:
        counts.update(_tokens(d["text"]))
    total = sum(counts.values())
    for d in docs[:40]:
        toks = _tokens(d["text"])
        r = out[d["doc_id"]]
        assert r["n_tok"] == len(toks)
        bits = [
            math.floor(-math.log2(counts[t] / total) * 1e6 + 0.5) / 1e6
            for t in toks
        ]
        # per-token grid snap then exact decimal sum — replayed exactly
        expect = math.floor(sum(bits) / len(bits) * 1e6 + 0.5) / 1e6
        assert abs(r["bits_per_token"] - expect) < 2e-6
        assert r["bits_per_token"] > 0


def test_k_anonymity_partitions_all_events(spark, sf_dir):
    out = q_events_k_anonymity(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in out) == n_events
    for r in out:
        assert r["at_risk"] == (r["n"] < K_ANON_THRESHOLD)
        assert r["n"] >= 1
