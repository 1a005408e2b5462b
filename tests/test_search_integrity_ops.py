"""Contracts for phrase search, containment near-dup, the table
checksum, and the streaming CUSUM monitor."""

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.text import TOKEN_SPLIT_RE
from big_data_stock_price_forecast_spark.plans.registry import (
    CONTAIN_TAU,
    PHRASE,
    q_doc_containment_pairs,
    q_doc_search_phrase,
    q_events_table_checksum,
    q_stream_cusum,
    q_ts_cusum_alarms,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def _toks(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


def test_phrase_search_matches_python_scan(spark, sf_dir):
    out = {r["doc_id"]: r["n_matches"] for r in
           q_doc_search_phrase(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = {}
    for d in docs:
        toks = _toks(d["text"])
        n = sum(
            1
            for a, b in zip(toks, toks[1:])
            if (a, b) == PHRASE
        )
        if n:
            expect[d["doc_id"]] = n
    assert out == expect


def test_containment_catches_subsets_jaccard_misses(spark):
    # B contains A verbatim inside a much longer text: containment of
    # the pair is 1.0 while jaccard is small
    base = "alpha beta gamma delta epsilon zeta eta theta"
    long = base + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, long)], ["doc_id", "text"]
    )
    from big_data_stock_price_forecast_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    c = containment_pairs(df, threshold=0.9).collect()
    assert len(c) == 1 and abs(c[0]["containment"] - 1.0) < 1e-12
    j = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert j == []  # symmetric jaccard misses the quote


def test_containment_query_bounds(spark, sf_dir):
    out = q_doc_containment_pairs(spark, sf_dir).collect()
    for r in out:
        assert CONTAIN_TAU <= r["containment"] <= 1.0 + 1e-12
        assert r["id_i"] < r["id_j"]


def test_checksum_detects_any_single_row_change(spark, sf_dir):
    out = {r["event_type"]: r for r in
           q_events_table_checksum(spark, sf_dir).collect()}
    total = out[None]
    per_type = [r for t, r in out.items() if t is not None]
    assert total["n_rows"] == sum(r["n_rows"] for r in per_type)
    # XOR of the per-type signatures reconstructs the grand signature
    sig = 0
    for r in per_type:
        sig ^= r["xor_sig"]
    assert sig == total["xor_sig"]
    # determinism under repartitioning: same signature from a different
    # physical layout
    again = {r["event_type"]: r["xor_sig"] for r in
             q_events_table_checksum(spark, sf_dir).collect()}
    assert again[None] == total["xor_sig"]


def test_stream_cusum_matches_batch_closed_form(spark, sf_dir):
    stream_rows = {
        (r["symbol"], r["event_id"], r["direction"]): r["stat_sigmas"]
        for r in q_stream_cusum(spark, sf_dir).collect()
    }
    assert stream_rows
    # python replay of the recursion over raw per-user series with the
    # same grid-snapped DECIMAL calibration
    import math

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)

    def g(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    expect = {}
    for sym, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        xs = [r["value"] for r in rows]
        n = len(xs)
        mu = sum(g(x) for x in xs) / n
        var = sum(g(x * x) for x in xs) / n - mu * mu
        sigma = math.sqrt(var)
        k, h = 0.5 * sigma, 4.0 * sigma
        s_up = s_dn = 0.0
        pup = pdn = None
        for r, x in zip(rows, xs):
            s_up = max(0.0, s_up + (x - mu - k))
            s_dn = max(0.0, s_dn + (mu - k - x))
            if s_up > h and (pup is None or pup <= h):
                expect[(sym, r["event_id"], "up")] = s_up / sigma
            if s_dn > h and (pdn is None or pdn <= h):
                expect[(sym, r["event_id"], "down")] = s_dn / sigma
            pup, pdn = s_up, s_dn
    assert set(stream_rows) == set(expect)
    for key, v in stream_rows.items():
        assert abs(v - expect[key]) < 2e-6


def test_stream_cms_bounds_true_counts_from_above(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        CMS_STREAM_TOP,
        q_stream_cms_top_users,
    )

    out = q_stream_cms_top_users(spark, sf_dir).collect()
    assert len(out) == CMS_STREAM_TOP
    for r in out:
        # Count-Min never undercounts
        assert r["cms_cnt"] >= r["true_cnt"]
    # the heaviest user's estimate is tight at this width
    heaviest = max(out, key=lambda r: r["true_cnt"])
    assert heaviest["cms_cnt"] <= 2 * heaviest["true_cnt"]
