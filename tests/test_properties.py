"""Property-based contracts (hypothesis): algebraic invariants that
hold for ANY input, not just the golden fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_stock_price_forecast_spark.operators.multimodal import (
    byte_histogram_features,
)
from big_data_stock_price_forecast_spark.operators.smoothing import savgol_np
from big_data_stock_price_forecast_spark.sources.ingest import (
    HOUR_MS,
    fetch_paginated,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=25, max_size=120), st.data())
def test_savgol_is_linear(xs, data):
    """SG smoothing is a linear map: f(a·x + y) == a·f(x) + f(y)."""
    ys = data.draw(
        st.lists(finite, min_size=len(xs), max_size=len(xs))
    )
    a = data.draw(st.floats(min_value=-5, max_value=5, allow_nan=False))
    x, y = np.array(xs), np.array(ys)
    left = savgol_np(a * x + y)
    right = a * savgol_np(x) + savgol_np(y)
    scale = np.abs(left).max() + np.abs(right).max() + 1.0
    np.testing.assert_allclose(left / scale, right / scale, atol=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=25, max_size=120))
def test_savgol_preserves_constants(xs):
    """A constant series is a degree-0 polynomial: passed through."""
    c = float(np.mean(xs))
    out = savgol_np(np.full(len(xs), c))
    np.testing.assert_allclose(out, c, atol=max(1.0, abs(c)) * 1e-9)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_byte_histogram_is_normalized(payload):
    h = byte_histogram_features(payload)
    assert len(h) == 8 and (h >= 0).all()
    if payload:
        assert abs(h.sum() - 1.0) < 1e-9
    else:
        assert h.sum() == 0.0


@settings(max_examples=30, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=3000), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=300),
)
def test_fetch_paginated_sorted_unique_capped(present, per_page, total):
    """For ANY availability pattern: results are sorted, unique, within
    the requested cap, and exactly the available candles when enough
    exist past the cursor."""
    start = 1_600_000_000_000
    ordered = sorted(present)

    def fetch(symbol, since, limit):
        out = [
            [start + i * HOUR_MS, 1.0, 2.0, 0.5, 1.5, 3.0]
            for i in ordered
            if start + i * HOUR_MS >= since
        ]
        return out[:limit]

    rows, _ = fetch_paginated(
        fetch, "X", start, total, max_per_page=per_page,
        empty_skip_ms=10**12, max_empty_skips=1,
    )
    ts = [r[0] for r in rows]
    assert ts == sorted(ts)
    assert len(set(ts)) == len(ts)
    assert len(rows) <= total
    assert len(rows) == min(total, len(present))


def _series_rows(rng, n_sym=2, n=40, dup_frac=0.3):
    rows = []
    eid = 0
    for s in range(n_sym):
        for i in range(n):
            t = int(rng.integers(0, n * 2))
            rows.append((s, t, float(rng.normal()), eid))
            eid += 1
    return rows


def test_dedup_keep_last_is_idempotent_and_complete(spark):
    from big_data_stock_price_forecast_spark.operators.cleaning import (
        dedup_keep_last,
    )

    rng = np.random.default_rng(0)
    df = spark.createDataFrame(
        _series_rows(rng), "symbol int, t int, v double, event_id int"
    )
    once = dedup_keep_last(df, ["symbol", "t"], "event_id")
    twice = dedup_keep_last(once, ["symbol", "t"], "event_id")
    assert once.count() == df.select("symbol", "t").distinct().count()
    assert once.exceptAll(twice).count() == 0
    # keep-LAST: winning event_id is the max per key
    mx = df.groupBy("symbol", "t").agg({"event_id": "max"})
    joined = once.join(
        mx.withColumnsRenamed({"max(event_id)": "m"}), ["symbol", "t"]
    )
    assert joined.filter("event_id <> m").count() == 0


def test_gap_fill_densifies_exactly(spark):
    from pyspark.sql import functions as F

    from big_data_stock_price_forecast_spark.operators.gapfill import (
        fill_missing_time_idx,
    )

    rng = np.random.default_rng(1)
    rows = []
    for s in range(3):
        idxs = sorted(rng.choice(200, size=30, replace=False))
        rows += [(s, int(i), float(rng.normal())) for i in idxs]
    df = spark.createDataFrame(rows, "symbol int, time_idx long, close double")
    out = fill_missing_time_idx(
        df, part_col="symbol", ts_col="__none__", fill_cols=["close"]
    )
    spans = df.groupBy("symbol").agg(
        F.min("time_idx").alias("mn"), F.max("time_idx").alias("mx")
    ).collect()
    expect = sum(r["mx"] - r["mn"] + 1 for r in spans)
    assert out.count() == expect
    # observed rows unchanged; synthesized rows flagged and ffilled
    assert out.filter("is_gap = 0").count() == len(rows)
    assert out.filter("close IS NULL").count() == 0
    # per symbol the index set is the full dense range
    per = out.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("time_idx").alias("d"),
        (F.max("time_idx") - F.min("time_idx") + 1).alias("span"),
    ).collect()
    for r in per:
        assert r["n"] == r["d"] == r["span"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=100_000),  # offsets in seconds
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_sessionize_invariants(offsets):
    """Pure-Python twin of the sessionize rule over arbitrary event
    times: within a session every consecutive gap <= 30 min; between
    consecutive sessions the gap > 30 min; sessions partition the
    events; durations are end - start."""
    gap_s = 1800
    ts = sorted(offsets)
    # reference sessionization
    sessions = [[ts[0]]]
    for a, b in zip(ts, ts[1:]):
        if b - a > gap_s:
            sessions.append([b])
        else:
            sessions[-1].append(b)

    # invariants the engine's windowed formulation relies on
    assert sum(len(s) for s in sessions) == len(ts)
    for s in sessions:
        for a, b in zip(s, s[1:]):
            assert b - a <= gap_s
    for s1, s2 in zip(sessions, sessions[1:]):
        assert s2[0] - s1[-1] > gap_s

    # the engine rule (cumulative sum of gap-breaks) produces the same
    # partition
    import itertools

    breaks = [1] + [1 if b - a > gap_s else 0 for a, b in zip(ts, ts[1:])]
    ids = list(itertools.accumulate(breaks))
    by_id = {}
    for t, i in zip(ts, ids):
        by_id.setdefault(i, []).append(t)
    assert [by_id[k] for k in sorted(by_id)] == sessions


def _events_from_prices(spark, prices_by_sym):
    import pandas as pd

    frames = []
    eid = 0
    for sym, xs in prices_by_sym.items():
        ts = pd.date_range("2024-01-01", periods=len(xs), freq="6h")
        frames.append(
            pd.DataFrame(
                {
                    "event_id": range(eid, eid + len(xs)),
                    "ts": ts,
                    "user_id": sym,
                    "event_type": "tick",
                    "value": xs,
                    "props": "{}",
                }
            )
        )
        eid += len(xs)
    return spark.createDataFrame(pd.concat(frames))


def test_vol_family_is_scale_invariant(spark):
    """Realized vol and EWMA vol depend on prices only through LOG
    returns, so scaling every price by a constant must leave both
    unchanged (up to the emission grid) — the invariance that makes
    them comparable across symbols of very different price levels."""
    import tempfile

    import numpy as np

    from big_data_stock_price_forecast_spark.plans import registry as R

    rng = np.random.RandomState(3)
    base = 50 * np.exp(np.cumsum(rng.randn(257) * 0.01))

    def run(scale):
        with tempfile.TemporaryDirectory() as d:
            _events_from_prices(spark, {1: base * scale}).write.parquet(
                f"{d}/events.parquet"
            )
            rv = {
                (r["symbol"], r["day"]): r["rv"]
                for r in R.q_ts_realized_vol(spark, d).collect()
            }
            ev = {
                (r["symbol"], r["time_idx"]): r["ewma_vol"]
                for r in R.q_ts_ewma_vol(spark, d).collect()
            }
        return rv, ev

    rv1, ev1 = run(1.0)
    rv4, ev4 = run(4.0)
    assert rv1.keys() == rv4.keys() and ev1.keys() == ev4.keys()
    for k in rv1:
        assert abs(rv1[k] - rv4[k]) < 1e-6  # grid-level equality
    for k in ev1:
        assert abs(ev1[k] - ev4[k]) < 1e-6
