"""Contracts for the quant/tokenizer additions: rolling correlation,
the top-k symbol correlation matrix, the BPE first-merge scan, and the
streaming attribution operator."""

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.text import TOKEN_SPLIT_RE
from big_data_stock_price_forecast_spark.operators.rolling import rolling_corr
from big_data_stock_price_forecast_spark.plans.registry import (
    q_doc_bpe_first_merges,
    q_events_attribution,
    q_stream_attribution,
    q_ts_rolling_corr,
    q_ts_symbol_corr_matrix,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_rolling_corr_matches_python_reference(spark):
    rows = [
        (1, i, float(x), float(y))
        for i, (x, y) in enumerate(
            zip(
                [1, 2, 3, 4, 5, 6, 5, 4, 3, 2, 1, 2],
                [2, 4, 5, 9, 10, 13, 11, 8, 6, 5, 1, 3],
            )
        )
    ]
    df = spark.createDataFrame(rows, ["symbol", "time_idx", "x", "y"])
    out = {
        r["time_idx"]: r["corr5"]
        for r in rolling_corr(df, "x", "y", n=5, out_col="corr5").collect()
    }
    xs = [r[2] for r in rows]
    ys = [r[3] for r in rows]
    for t in range(len(rows)):
        if t < 4:
            assert out[t] is None
            continue
        wx, wy = xs[t - 4 : t + 1], ys[t - 4 : t + 1]
        n = 5.0
        sx, sy = sum(wx), sum(wy)
        sxy = sum(a * b for a, b in zip(wx, wy))
        sxx, syy = sum(a * a for a in wx), sum(b * b for b in wy)
        cov = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        expect = cov / math.sqrt(vx * vy)
        assert abs(out[t] - expect) < 1e-9
        assert -1.0 - 1e-12 <= out[t] <= 1.0 + 1e-12


def test_rolling_corr_constant_series_is_null(spark):
    rows = [(1, i, float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["symbol", "time_idx", "x", "y"])
    out = rolling_corr(df, "x", "y", n=5, out_col="c").collect()
    assert all(r["c"] is None for r in out)


def test_ts_rolling_corr_bounded_and_warmup_null(spark, sf_dir):
    out = q_ts_rolling_corr(spark, sf_dir).collect()
    assert out
    by_sym = defaultdict(list)
    for r in out:
        by_sym[r["symbol"]].append(r)
    for rows in by_sym.values():
        rows.sort(key=lambda r: r["time_idx"])
        for i, r in enumerate(rows[:19]):
            assert r["corr20"] is None, (i, r)
        for r in rows:
            if r["corr20"] is not None:
                assert -1.0 - 1e-9 <= r["corr20"] <= 1.0 + 1e-9


def test_symbol_corr_matrix_pairs_and_bounds(spark, sf_dir):
    out = q_ts_symbol_corr_matrix(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["sym_a"] < r["sym_b"]
        assert r["n_obs"] >= 1
        if r["corr"] is not None:
            assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9
    pairs = {(r["sym_a"], r["sym_b"]) for r in out}
    assert len(pairs) == len(out)


def test_bpe_merges_match_python_counter(spark, sf_dir):
    out = [(r["pair"], r["weight"]) for r in
           q_doc_bpe_first_merges(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt: Counter = Counter()
    for d in docs:
        for t in re.split(TOKEN_SPLIT_RE, d["text"].lower()):
            if t:
                cnt[t] += 1
    pair_w: Counter = Counter()
    for t, c in cnt.items():
        for i in range(len(t) - 1):
            pair_w[t[i : i + 2]] += c
    expect = sorted(pair_w.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert out == expect


def test_stream_attribution_reconciles_with_batch_query(spark, sf_dir):
    stream_rows = q_stream_attribution(spark, sf_dir).collect()
    batch = {r["channel"]: r for r in
             q_events_attribution(spark, sf_dir).collect()}
    by_chan = defaultdict(list)
    for r in stream_rows:
        by_chan[r["channel"]].append(r)
    assert set(by_chan) == set(batch)
    for ch, rows in by_chan.items():
        assert len(rows) == batch[ch]["n_purchases"]
        assert abs(
            sum(round(r["value"], 2) for r in rows) - batch[ch]["revenue"]
        ) < 1e-6
    # every purchase appears exactly once
    ids = [r["event_id"] for r in stream_rows]
    assert len(ids) == len(set(ids))
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(ids) == n_purchases


def test_var_es_rank_picks_and_tail_mean(spark, sf_dir):
    import math as _math

    from big_data_stock_price_forecast_spark.plans.registry import (
        VAR_P,
        _resampled,
        q_ts_var_es,
    )

    out = {r["symbol"]: r for r in q_ts_var_es(spark, sf_dir).collect()}
    assert out
    sym = next(iter(out))
    rows = sorted(
        _resampled(spark, sf_dir)
        .filter(F.col("symbol") == sym)
        .select("time_idx", "close")
        .collect(),
        key=lambda r: r["time_idx"],
    )
    rets = [
        (rows[i]["close"] / rows[i - 1]["close"] - 1, rows[i]["time_idx"])
        for i in range(1, len(rows))
        if rows[i - 1]["close"] != 0
    ]
    rets.sort()
    n = len(rets)
    cut = int(_math.floor((n - 1) * VAR_P)) + 1
    var = rets[cut - 1][0]
    tail = [r for r, _ in rets[:cut]]
    es = sum(
        _math.floor(r * 1e6 + 0.5) / 1e6 for r in tail
    ) / cut
    r = out[sym]
    assert r["n_rets"] == n
    assert abs(r["var95"] - var) < 2e-6
    assert abs(r["es95"] - es) < 2e-6
    assert r["es95"] <= r["var95"] + 1e-9  # tail mean <= the cut point


def test_gini_bounds_and_replay(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_gini,
    )

    r = q_events_gini(spark, sf_dir).collect()[0]
    for g in (r["gini_events"], r["gini_value"]):
        assert -0.01 <= g <= 1.0
    from collections import Counter

    cnt = Counter(
        row["user_id"]
        for row in load_table(spark, sf_dir, "events")
        .select("user_id")
        .collect()
    )
    xs = sorted(cnt.values())
    n = len(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    g = 2.0 * six / (n * sum(xs)) - (n + 1) / n
    assert abs(r["gini_events"] - g) < 1e-9


def test_lang_confusion_covers_corpus_and_diagonal_dominates(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_lang_confusion,
    )

    out = q_doc_lang_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in out) == n_docs
    correct = sum(r["n"] for r in out if r["label"] == r["predicted"])
    # the stopword heuristic must beat random guessing on this corpus
    assert correct > n_docs / 5


def test_rolling_corr_is_affine_invariant(spark):
    # corr(a*x + b, y) == corr(x, y) for a > 0 — the scale-freeness
    # that makes the operator usable on unnormalized features
    rows = [(1, i, float(x), float(y)) for i, (x, y) in enumerate(
        zip([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4])
    )]
    df = spark.createDataFrame(rows, ["symbol", "time_idx", "x", "y"])
    base = {r["time_idx"]: r["c"] for r in
            rolling_corr(df, "x", "y", n=5, out_col="c").collect()}
    scaled = df.withColumn("x", 7.0 * F.col("x") + 100.0)
    got = {r["time_idx"]: r["c"] for r in
           rolling_corr(scaled, "x", "y", n=5, out_col="c").collect()}
    for t, c in base.items():
        if c is None:
            assert got[t] is None
        else:
            assert abs(got[t] - c) < 1e-9


def test_holt_is_shift_equivariant(spark):
    # holt(x + c): level shifts by c, trend unchanged
    from big_data_stock_price_forecast_spark.operators.rolling import (
        holt_linear,
    )

    xs = [10.0, 12.0, 11.0, 14.0, 16.0, 15.0, 18.0, 21.0, 19.0]
    df1 = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)],
        ["symbol", "time_idx", "close"],
    )
    df2 = spark.createDataFrame(
        [(1, i, x + 1000.0) for i, x in enumerate(xs)],
        ["symbol", "time_idx", "close"],
    )
    a = holt_linear(df1).collect()[0]
    b = holt_linear(df2).collect()[0]
    assert abs((b["level"] - a["level"]) - 1000.0) < 1e-9
    assert abs(b["trend"] - a["trend"]) < 1e-9


def test_pairs_signal_z_threshold_and_pair_is_argmax(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        PAIRS_Z_ENTRY,
        q_ts_pairs_trading_signal,
        q_ts_symbol_corr_matrix,
    )

    out = q_ts_pairs_trading_signal(spark, sf_dir).collect()
    assert out
    pair = {(r["sym_a"], r["sym_b"]) for r in out}
    assert len(pair) == 1
    for r in out:
        assert abs(r["zscore"]) > PAIRS_Z_ENTRY - 1e-6
        assert r["signal"] == (
            "short_spread" if r["zscore"] > 0 else "long_spread"
        )
    # the traded pair is the correlation-matrix argmax
    mat = q_ts_symbol_corr_matrix(spark, sf_dir).collect()
    best = max(
        (r for r in mat if r["corr"] is not None),
        key=lambda r: (r["corr"], -r["sym_a"], -r["sym_b"]),
    )
    assert pair == {(best["sym_a"], best["sym_b"])}
