"""Round-13 contracts: the flagship metric sweep (the reference's
headline dist_func_eval table), the fixed-budget anchor sampler, and
the fullscale-config oracle twin (added below as batches land)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
BASE_TS = datetime(2024, 1, 1)


def _snap(x: float, n: int = 6) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s + 0.0


def _write_event_rows(spark, path: str, rows) -> None:
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


# ------------------------------------------------- metric sweep


def test_metric_sweep_l2_branch_equals_summary(spark):
    """The sweep's L2 row must be BITWISE the flagship_summary row
    (same pipeline, same scorer — the sweep only parameterizes the
    metric), and every scorer evaluates the SAME query panel."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        FLAGSHIP_SWEEP_METRICS,
        q_flagship_metric_sweep,
        q_flagship_summary,
    )

    sweep = {r["metric"]: r for r in
             q_flagship_metric_sweep(spark, SF).collect()}
    assert set(sweep) == set(FLAGSHIP_SWEEP_METRICS)
    summ = q_flagship_summary(spark, SF).collect()[0]
    l2 = sweep["l2"]
    assert l2["mae_mean"] == summ["mae_mean"]
    assert l2["mae_std"] == summ["mae_std"]
    assert l2["n_queries"] == summ["n_queries"]
    # the scorer changes WHICH matches are ensembled, never which
    # queries are evaluated: the panel size is scorer-independent
    for r in sweep.values():
        assert r["n_queries"] == summ["n_queries"]
        assert r["mae_mean"] is not None and r["mae_std"] is not None


def test_metric_sweep_scorers_differ(spark):
    """L1 and L2 rank differently on real data — identical rows for
    every scorer would mean the metric parameter is dead."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_flagship_metric_sweep,
    )

    sweep = {r["metric"]: r for r in
             q_flagship_metric_sweep(spark, SF).collect()}
    means = {m: r["mae_mean"] for m, r in sweep.items()}
    assert len(set(means.values())) >= 2


def test_forecast_cosine_zero_norm_guard(spark):
    """A constant (zero-norm after z-score) candidate window must rank
    LAST under the cosine scorer (the -2.0 sentinel), not error under
    ANSI division or float-NULL-order divergence."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.operators.forecast import (
        forecast_evaluate,
    )

    L, P = 4, 2

    def win(sym, wid, xs, future, center=0.0, scale=1.0):
        return (sym, wid, center, scale, xs, future)

    cols = ["symbol", "window_id", "center", "scale", "xs", "future"]
    train = spark.createDataFrame(
        pd.DataFrame(
            [
                # zero-norm candidate: cosine undefined -> sentinel
                win(1, 10, [0.0] * L, [1.0, 1.0]),
                # aligned candidate: cosine 1.0 -> must win
                win(1, 11, [1.0, -1.0, 1.0, -1.0], [2.0, 2.0]),
            ],
            columns=cols,
        )
    )
    val = spark.createDataFrame(
        pd.DataFrame(
            [win(1, 99, [1.0, -1.0, 1.0, -1.0], [0.0, 0.0])],
            columns=cols,
        )
    )
    steps = forecast_evaluate(
        train, val, pred_window=P, k=2, ensemble=1, metric="cosine",
        dim=L, return_steps=True,
    ).collect()
    # ensemble=1 and the zero-norm window ranked last -> every pred
    # step comes from window 11's future (2.0, 2.0), rescaled by its
    # own center/scale (0, 1) through the z-score eps: 2/(1+1e-8)
    assert len(steps) == P
    exp = 2.0 / (1.0 + 1e-8)
    assert all(r["pred"] == exp for r in steps)


# --------------------------------------------- anchor sampler


def test_anchor_sample_budget_and_determinism(spark):
    """anchor_sample keeps exactly `budget` rows when the corpus is
    larger, the WHOLE corpus when smaller, and the pick is the
    hash-order prefix: the budget-64 set is a subset of budget-256."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        anchor_sample,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    n = emb.count()
    small = {r["vec_id"] for r in anchor_sample(emb, 64).collect()}
    big = {r["vec_id"] for r in anchor_sample(emb, 256).collect()}
    assert len(small) == 64 and len(big) == 256
    assert small < big
    assert {r["vec_id"] for r in anchor_sample(emb, n + 100).collect()} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    # engine-twin: DuckDB's ORDER BY hash60, vec_id LIMIT k picks the
    # SAME rows (the cross-engine contract every budgeted eval card
    # rides on)
    import duckdb

    got = duckdb.sql(
        f"""SELECT vec_id FROM '{SF}/embeddings.parquet'
        ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                      AS BIGINT), vec_id
        LIMIT 64"""
    ).fetchall()
    assert {r[0] for r in got} == small


# ------------------------------------------------ emb silhouette


def test_emb_silhouette_cluster_replay(spark, tmp_path):
    """Tight separated clusters score near +1; a mislabeled point
    sitting inside the other cluster scores negative. Full python
    replay of the snapped-centroid a/b/s math."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_silhouette,
    )

    dim = 64

    def vec(x0, x1):
        v = [0.0] * dim
        v[0], v[1] = x0, x1
        return v

    rows = [
        (1, vec(1.0, 0.0), 0),
        (2, vec(1.0, 0.1), 0),
        (3, vec(-0.9, 0.0), 0),  # mislabeled: sits at cluster 1
        (4, vec(-1.0, 0.0), 1),
        (5, vec(-1.0, 0.1), 1),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {r["label"]: r for r in
           q_emb_silhouette(spark, str(tmp_path)).collect()}

    # replay: snapped per-dim centroid means, then a/b/s per vector
    from collections import defaultdict

    by_label = defaultdict(list)
    for _, v, lab in rows:
        by_label[lab].append(v)
    cents = {
        lab: [
            math.floor(sum(v[d] for v in vs) / len(vs) * 1e6 + 0.5) / 1e6
            + 0.0
            for d in range(dim)
        ]
        for lab, vs in by_label.items()
    }

    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    agg = defaultdict(list)
    for _, v, lab in rows:
        a = l2(v, cents[lab])
        b = min(l2(v, c) for l2lab, c in cents.items() if l2lab != lab)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        agg[lab].append(int(math.floor(s * 1e9 + 0.5)))
    for lab, sqs in agg.items():
        assert got[lab]["n"] == len(sqs)
        assert got[lab]["n_negative"] == sum(1 for s in sqs if s < 0)
        assert got[lab]["mean_silhouette"] == _snap(
            float(sum(sqs)) / len(sqs) / 1e9, 8
        )
    assert got[1]["mean_silhouette"] > 0.8   # tight true cluster
    assert got[0]["n_negative"] == 1         # the mislabeled point


def test_emb_lsh_recall_bounds(spark):
    """Recall is a valid fraction on the real corpus, the panel is
    exactly the anchor budget, and single-band sign-LSH finds at
    least SOME true neighbors overall."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        IVF_Q_BUDGET,
        q_emb_lsh_recall,
    )

    rows = q_emb_lsh_recall(spark, SF).collect()
    assert len(rows) == IVF_Q_BUDGET
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    assert sum(r["n_hit"] for r in rows) > 0


# --------------------------------------------- doc dup inflation


def test_doc_dup_inflation_replay(spark, tmp_path):
    """Two exact dups of a long doc + a case-variant of a short one:
    token-mass shares and keep-one savings replay exactly (and differ
    from the doc-count rate, which is the point of the card)."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_dup_inflation,
    )

    docs = [
        (1, "en", "w1", "alpha beta gamma delta epsilon zeta"),   # 6 tok
        (2, "en", "w1", "alpha beta gamma delta epsilon zeta"),   # dup
        (3, "en", "w1", "ALPHA  beta GAMMA delta epsilon zeta"),  # canon dup
        (4, "en", "w2", "unique one"),                            # 2 tok
        (5, "en", "w2", "another singleton document"),            # 3 tok
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "lang", "source", "text"])
    spark.createDataFrame(pdf).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    r = q_doc_dup_inflation(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 5
    assert r["n_dup_docs"] == 3 and r["n_dup_groups"] == 1
    assert r["total_tok"] == 6 * 3 + 2 + 3
    assert r["dup_tok"] == 18
    assert r["removable_tok"] == 12       # keep doc 1, drop 2 + 3
    assert r["dup_token_share"] == _snap(18 / 23, 8)
    assert r["dedup_savings"] == _snap(12 / 23, 8)


def test_fertility_consistent_with_segment(spark):
    """The per-language fertility table and the per-doc segmentation
    share one trainer: total words and total pieces must agree."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bpe_segment,
        q_doc_tokenizer_fertility,
    )

    per_doc = q_doc_bpe_segment(spark, SF).collect()
    per_lang = q_doc_tokenizer_fertility(spark, SF).collect()
    assert sum(r["n_tok"] for r in per_doc) == sum(
        r["n_words"] for r in per_lang
    )
    assert sum(r["n_pieces"] for r in per_doc) == sum(
        r["n_pieces"] for r in per_lang
    )
    assert all(r["fertility"] >= 1.0 for r in per_lang)


# ------------------------------------------------- tick bars


def test_ts_tick_bars_replay(spark, tmp_path):
    """35 ticks at N=16 -> bars of 16/16/3; OHLC follows tick order
    and span is the exact microsecond range."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        TICK_BAR_N,
        q_ts_tick_bars,
    )

    assert TICK_BAR_N == 16
    closes = [100.0 + ((7 * i) % 13) - 6 for i in range(35)]
    rows = [
        (i, BASE_TS + timedelta(minutes=10 * i), 1, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["bar_id"]: r for r in
           q_ts_tick_bars(spark, str(tmp_path)).collect()}
    assert sorted(got) == [0, 1, 2]
    for bid in (0, 1, 2):
        lo = bid * 16
        hi = min(lo + 16, 35)
        seg = closes[lo:hi]
        r = got[bid]
        assert r["n_events"] == hi - lo
        assert r["open"] == seg[0] and r["close"] == seg[-1]
        assert r["high"] == max(seg) and r["low"] == min(seg)
        assert r["span_us"] == (hi - lo - 1) * 600 * 1_000_000


def test_ts_rolling_beta_self_market(spark, tmp_path):
    """A single-symbol corpus IS its own market: rolling beta and
    correlation are 1 up to the 1e-6 index grid."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_rolling_beta,
    )

    rows = []
    p = 100.0
    for i in range(40):
        p = round(p * (1.0 + (((3 * i) % 7) - 3) / 100.0), 2)
        rows.append(
            (i, BASE_TS + timedelta(hours=6 * i), 1, "tick", p, "{}")
        )
    _write_event_rows(spark, str(tmp_path), rows)
    out = q_ts_rolling_beta(spark, str(tmp_path)).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r["beta"] - 1.0) < 1e-3
        assert abs(r["corr"] - 1.0) < 1e-3


# ------------------------------------------- stream tick bars


def test_tick_bar_stream_across_batches(spark, tmp_path):
    """Splitting the tick stream into two micro-batches equals the
    batch tick bars' COMPLETE set — including a bar whose ticks span
    the batch boundary (the open-bar state carry this test exists
    for)."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        TICK_BAR_N,
        q_ts_tick_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        tick_bar_stream,
    )

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    pdf = ev.select("event_id", "ts", "user_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)
    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(land))
        .select(
            F.col("user_id").alias("symbol"),
            F.col("ts").cast("timestamp").alias("datetime"),
            F.col("value").alias("close"),
            "event_id",
        )
    )
    out = run_available_now(
        tick_bar_stream(sdf, n_bar=TICK_BAR_N), "append"
    )
    got = sorted(map(tuple, out.collect()))

    # batch twin over the SAME subset, complete bars only
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    full = pdf.copy()
    full["event_type"] = "tick"
    full["props"] = "{}"
    spark.createDataFrame(
        full.rename(columns={"value": "value"})[
            ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ]
    ).coalesce(1).write.parquet(f"{batch_dir}/events.parquet")
    batch = (
        q_ts_tick_bars(spark, str(batch_dir))
        .filter(F.col("n_events") == TICK_BAR_N)
        .collect()
    )
    assert got == sorted(map(tuple, batch))
    # the boundary case actually occurred: some symbol's tick count in
    # batch 1 is not a bar multiple, so a bar spanned the boundary
    c1 = pdf.iloc[:half].groupby("user_id").size()
    assert any(int(c) % TICK_BAR_N != 0 for c in c1)


def test_ts_volume_bars_replay(spark, tmp_path):
    """Notional-clock assignment: a tick joins bar
    floor(cum_cents_before / T); bars carry ~T notional each and the
    whole partition replays exactly in integer cents."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        q_ts_volume_bars,
    )

    closes = [round(300.0 + ((11 * i) % 17) * 10.0, 2) for i in range(30)]
    rows = [
        (i, BASE_TS + timedelta(minutes=5 * i), 1, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["bar_id"]: r for r in
           q_ts_volume_bars(spark, str(tmp_path)).collect()}

    bars = {}
    cum = 0
    for i, c in enumerate(closes):
        bid = cum // VOLBAR_T_CENTS
        bars.setdefault(bid, []).append((i, c))
        cum += int(math.floor(c * 100 + 0.5))
    assert set(got) == set(bars)
    for bid, seg in bars.items():
        r = got[bid]
        vals = [c for _, c in seg]
        assert r["n_events"] == len(seg)
        assert r["open"] == vals[0] and r["close"] == vals[-1]
        assert r["high"] == max(vals) and r["low"] == min(vals)
        cents = sum(int(math.floor(c * 100 + 0.5)) for c in vals)
        assert r["notional"] == _snap(cents / 100.0, 6)
        idxs = [i for i, _ in seg]
        assert r["span_us"] == (idxs[-1] - idxs[0]) * 300 * 1_000_000
    # multiple bars actually formed, and every non-trailing bar
    # crossed the threshold
    assert len(bars) >= 2


def test_dedup_threshold_sweep_monotone(spark):
    """Raising tau can only shrink every count; candidates are
    tau-independent; n_both <= min(n_exact, n_est); the curve is
    non-vacuous at the loose end on the real corpus."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_dedup_threshold_sweep,
    )

    rows = sorted(
        q_doc_dedup_threshold_sweep(spark, SF).collect(),
        key=lambda r: r["tau"],
    )
    assert [r["tau"] for r in rows] == [
        _snap(t / 10, 6) for t in range(1, 9)
    ]
    n_cand = {r["n_candidates"] for r in rows}
    assert len(n_cand) == 1 and n_cand.pop() > 0
    prev_ex = prev_est = None
    for r in rows:
        assert r["n_both"] <= min(r["n_exact"], r["n_est"])
        if prev_ex is not None:
            assert r["n_exact"] <= prev_ex
            assert r["n_est"] <= prev_est
        prev_ex, prev_est = r["n_exact"], r["n_est"]
    assert rows[0]["n_exact"] > 0  # tau=0.1 merges something


def test_volume_bar_stream_across_batches(spark, tmp_path):
    """Splitting the tick stream into two micro-batches equals the
    batch notional bars minus each symbol's trailing bar — the
    open-bar state (cum cents + running OHLC) carries across the
    boundary."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        q_ts_volume_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        volume_bar_stream,
    )
    from pyspark.sql import Window as W

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    pdf = ev.select("event_id", "ts", "user_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)
    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(land))
        .select(
            F.col("user_id").alias("symbol"),
            F.col("ts").cast("timestamp").alias("datetime"),
            F.col("value").alias("close"),
            "event_id",
        )
    )
    out = run_available_now(
        volume_bar_stream(sdf, t_cents=VOLBAR_T_CENTS), "append"
    )
    got = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["open"], r["high"],
         r["low"], r["close"], _snap(r["notional"], 6), r["span_us"])
        for r in out.collect()
    )
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    full = pdf.copy()
    full["event_type"] = "tick"
    full["props"] = "{}"
    spark.createDataFrame(
        full[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).coalesce(1).write.parquet(f"{batch_dir}/events.parquet")
    bars = q_ts_volume_bars(spark, str(batch_dir))
    complete = bars.withColumn(
        "__mx", F.max("bar_id").over(W.partitionBy("symbol"))
    ).filter(F.col("bar_id") < F.col("__mx")).drop("__mx")
    exp = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["open"], r["high"],
         r["low"], r["close"], r["notional"], r["span_us"])
        for r in complete.collect()
    )
    assert got == exp and len(got) > 0
