"""Contracts for the round-7 operators: embedding decontamination,
weighted priority sampling, realized volatility, Matryoshka recall,
DSIR importance weights."""

import math

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    EMB_BENCH_MOD,
    KNN_K,
    WSAMPLE_K,
    q_doc_dsir_importance,
    q_doc_weighted_sample,
    q_emb_bench_decontam,
    q_emb_matryoshka_recall,
    q_ts_realized_vol,
)


def test_bench_decontam_excludes_benchmark_and_bounds_cos(spark, sf_dir):
    rows = q_emb_bench_decontam(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["vec_id"] % EMB_BENCH_MOD != 0  # corpus only
        assert -1.0 - 1e-9 <= r["best_cos"] <= 1.0 + 1e-9
        assert r["is_contaminated"] == (r["best_cos"] >= 0.8)


def test_weighted_sample_is_deterministic_and_k_sized(spark, sf_dir):
    a = q_doc_weighted_sample(spark, sf_dir).collect()
    b = q_doc_weighted_sample(spark, sf_dir).collect()
    assert len(a) == WSAMPLE_K
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    # keys are ln(u)/w with u in (0,1]: never positive
    assert all(r["skey"] <= 0.0 for r in a)


def test_weighted_sample_key_matches_python_formula(spark, sf_dir):
    import hashlib

    rows = q_doc_weighted_sample(spark, sf_dir).collect()
    for r in rows[:5]:
        h = int(hashlib.md5(f"ws:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        u = (h % 2**53 + 1) / 9007199254740993.0
        key = math.floor(math.log(u) / r["n_chars"] * 1e6 + 0.5) / 1e6
        assert r["skey"] == key + 0.0


def test_realized_vol_nonnegative_and_replayable(spark, sf_dir):
    rows = q_ts_realized_vol(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rv"] >= 0.0
        assert r["n_rets"] >= 1


def test_matryoshka_recall_bounds(spark, sf_dir):
    rows = q_emb_matryoshka_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_overlap"] <= KNN_K
        assert abs(r["recall_at_k"] - r["n_overlap"] / KNN_K) < 1e-12
        assert r["k"] == KNN_K


def test_dsir_scores_separate_distinct_vocabularies(spark):
    # two sources with disjoint vocabularies: target-source docs must
    # score strictly higher than off-target docs (the resampling
    # signal DSIR exists to produce)
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans import registry as R

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    "alpha beta gamma alpha beta",
                    "beta alpha alpha gamma gamma",
                    "gamma alpha beta beta alpha",
                    "delta epsilon zeta delta zeta",
                    "zeta delta epsilon epsilon",
                    "epsilon zeta delta delta",
                ],
                "lang": ["en"] * 6,
                "source": ["src0"] * 3 + ["src1"] * 3,
                "n_chars": [27, 28, 28, 29, 26, 25],
            }
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r["dsir_logratio"]
            for r in R.q_doc_dsir_importance(spark, d).collect()
        }
    target = [out[i] for i in range(3)]
    off = [out[i] for i in range(3, 6)]
    assert min(target) > max(off)


def test_ewma_vol_replays_python_recursion(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        EWMA_VOL_LAMBDA,
        _filled,
        q_ts_ewma_vol,
    )

    out = q_ts_ewma_vol(spark, sf_dir).collect()
    assert out
    base = sorted(
        _filled(spark, sf_dir).collect(),
        key=lambda r: (r["symbol"], r["time_idx"]),
    )
    # replay one symbol bitwise
    sym = base[0]["symbol"]
    xs = [r["close"] for r in base if r["symbol"] == sym]
    a = 1.0 - EWMA_VOL_LAMBDA
    v = None
    expect = {}
    for i in range(1, len(xs)):
        lr = math.log(xs[i] / xs[i - 1])
        r2 = math.floor(lr * lr * 1e12 + 0.5) / 1e12
        v = r2 if v is None else (1.0 - a) * v + a * r2
        expect[i] = math.floor(math.sqrt(v) * 1e8 + 0.5) / 1e8
    got = {
        r["time_idx"]: r["ewma_vol"] for r in out if r["symbol"] == sym
    }
    tis = sorted(got)
    assert len(tis) == len(expect)
    for k, ti in enumerate(tis, start=1):
        assert got[ti] == expect[k] + 0.0


def test_open_concurrency_is_a_closed_step_function(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_open_concurrency,
    )

    rows = sorted(
        q_orders_open_concurrency(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert sum(r["delta"] for r in rows) == 0  # every order closes
    run = 0
    for r in rows:
        run += r["delta"]
        assert r["n_open"] == run
        assert run >= 0
    assert rows[-1]["n_open"] == 0


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_ngram_novelty,
    )

    rows = {r["doc_id"]: r for r in
            q_doc_ngram_novelty(spark, sf_dir).collect()}
    assert rows
    first = min(rows)
    assert rows[first]["novelty"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_cohort_ltv_is_monotone_per_cohort(spark, sf_dir):
    from collections import defaultdict

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_cohort_ltv,
    )

    rows = q_orders_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_c = defaultdict(list)
    for r in rows:
        by_c[r["cohort_month"]].append(r)
    for c, rs in by_c.items():
        rs.sort(key=lambda r: r["m"])
        assert rs[0]["m"] >= 0
        # cumulative revenue never decreases; ltv tracks it
        for a, b in zip(rs, rs[1:]):
            assert b["cum_cents"] >= a["cum_cents"]
            assert b["ltv_per_customer"] >= a["ltv_per_customer"]


def test_ood_flags_respect_the_p95_pick(spark, sf_dir):
    from collections import defaultdict

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_ood_score,
    )

    rows = q_emb_ood_score(spark, sf_dir).collect()
    assert rows
    by_l = defaultdict(list)
    for r in rows:
        by_l[r["list_id"]].append(r)
    for lst, rs in by_l.items():
        n_ood = sum(r["is_ood"] for r in rs)
        # at most 5% of a list sits above its p95 pick
        assert n_ood <= max(1, int(0.05 * len(rs)) + 1)
        thr = rs[0]["p95_dist"]
        assert all(r["p95_dist"] == thr for r in rs)


def test_pair_join_distances_stay_in_codegen(spark, sf_dir):
    # the corpus×queries / corpus×benchmark pair joins must carry FLAT
    # fixed-dim distance expressions — a single interpreted
    # higher-order lambda in these plans puts the whole hot path back
    # on the per-row interpreter (the r6 Arrow-shingler lesson)
    # knn_topk_metrics is deliberately NOT here: its 5-metric union
    # keeps the fold forms (five 64-dim flat expressions quintuple
    # the codegen compile cost and measured 2x slower than the folds
    # — see _knn_query's comment); the contract pins the
    # single-expression hot paths where flat measured 2x faster
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    for name in ("emb_bench_decontam", "emb_hard_negatives"):
        df = all_queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "lambdafunction" not in plan, (
            f"{name}: interpreted HOF lambda in the pair-join plan"
        )


def test_quality_filter_keep_is_conjunction_and_non_degenerate(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_quality_filter,
    )

    rows = q_doc_quality_filter(spark, sf_dir).collect()
    assert rows
    rules = ["rule_wordcount", "rule_mean_tok_len", "rule_punct",
             "rule_stopwords", "rule_dominance"]
    for r in rows:
        assert r["keep"] == all(r[k] for k in rules)
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}  # thresholds actually bind


def test_hard_negatives_margin_and_label_contract(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        _emb,
        q_emb_hard_negatives,
    )

    rows = q_emb_hard_negatives(spark, sf_dir).collect()
    assert rows
    labels = {r["vec_id"]: r["label"] for r in _emb(spark, sf_dir).collect()}
    for r in rows:
        assert labels[r["pos_id"]] == labels[r["q_id"]]
        assert labels[r["neg_id"]] != labels[r["q_id"]]
        assert abs(r["margin"] - (r["neg_dist"] - r["pos_dist"])) < 2e-6


def test_pagerank_sums_to_one_and_ranks_degree(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_graph_pagerank,
    )

    rows = q_graph_pagerank(spark, sf_dir).collect()
    assert rows
    total = sum(r["pagerank"] for r in rows)
    # probability mass is conserved up to the per-round snapping
    assert abs(total - 1.0) < 1e-4
    assert all(r["pagerank"] > 0 for r in rows)


def test_curation_decisions_precedence_and_partition(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_curation_decisions,
        q_doc_dedup_decisions,
        q_doc_quality_filter,
    )

    rows = {r["doc_id"]: r for r in
            q_doc_curation_decisions(spark, sf_dir).collect()}
    assert rows
    allowed = {"exact_dup", "near_dup", "quality_fail",
               "ood_embedding", "kept"}
    assert {r["reason"] for r in rows.values()} <= allowed
    # dedup verdicts dominate: any doc the dedup table drops is
    # dropped here with the same reason
    dd = {r["doc_id"]: r["reason"] for r in
          q_doc_dedup_decisions(spark, sf_dir).collect()}
    for d, reason in dd.items():
        if reason != "kept":
            assert rows[d]["reason"] == reason
    # quality failures surface only for dedup-kept docs
    qf = {r["doc_id"]: r["keep"] for r in
          q_doc_quality_filter(spark, sf_dir).collect()}
    for d, r in rows.items():
        if r["reason"] == "quality_fail":
            assert dd[d] == "kept" and qf[d] is False
        assert r["is_kept"] == (1 if r["reason"] == "kept" else 0)


def test_ivfpq_candidates_come_from_probed_lists(spark, sf_dir):
    # IVF-PQ's reported neighbors must be a subset of the plain
    # IVF probe's candidate universe (same quantizer, same nprobe),
    # and ADC distance approximates the exact one from below or above
    # but never by more than the worst per-subspace quantization error
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_ivfpq_topk,
    )

    rows = q_emb_ivfpq_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["adc_dist"] >= 0.0 and r["l2_dist"] >= 0.0
        # sane approximation: ADC within 3x of exact at toy scale
        assert r["adc_dist"] < 3 * r["l2_dist"] + 1.0


def test_hurst_in_range_and_random_walk_near_half(spark):
    # a hash-driven pseudo-random walk must land near H = 0.5; a
    # strongly trending series must land clearly above it
    from big_data_stock_price_forecast_spark.plans import registry as R
    import tempfile

    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n = 1024
    walk = np.cumsum(rng.choice([-1.0, 1.0], size=n) * 0.01) + 50
    # persistent series: AR(1) increments (phi=0.9) — R/S analysis
    # works on INCREMENTS, so persistence must live in the increments
    # themselves (a deterministic linear trend's increments are
    # MA(1)-anti-persistent after differencing, H < 0.5 — the
    # textbook subtlety, not a bug)
    eps = rng.randn(n) * 0.01
    inc = np.zeros(n)
    for i in range(1, n):
        inc[i] = 0.9 * inc[i - 1] + eps[i]
    persistent = 50 + np.cumsum(inc)
    frames = []
    for sym, xs in ((1, walk), (2, persistent)):
        ts = pd.date_range("2024-01-01", periods=n, freq="6h")
        frames.append(pd.DataFrame({
            "event_id": range(len(frames) * n, len(frames) * n + n),
            "ts": ts,
            "user_id": sym,
            "event_type": "tick",
            "value": xs,
            "props": "{}",
        }))
    ev = spark.createDataFrame(pd.concat(frames))
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {r["symbol"]: r["hurst"]
               for r in R.q_ts_hurst(spark, d).collect()}
    assert 0.3 < out[1] < 0.75          # random walk ~ 0.5
    assert out[2] > out[1]              # trend is more persistent
    assert out[2] > 0.8


def test_pinball_median_is_half_mae_consistent(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_pinball_loss,
    )

    rows = q_ts_pinball_loss(spark, sf_dir).collect()
    assert rows
    by_sym = {}
    for r in rows:
        by_sym.setdefault(r["symbol"], {})[r["q"]] = r
    for sym, d in by_sym.items():
        assert set(d) == {0.1, 0.5, 0.9}
        # quantile forecasts are monotone in q
        assert d[0.1]["qhat"] <= d[0.5]["qhat"] <= d[0.9]["qhat"]
        for r in d.values():
            assert r["pinball"] >= 0.0


def test_split_payments_only_multi_order_days(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_split_payments,
    )

    rows = q_orders_split_payments(spark, sf_dir).collect()
    assert rows  # non-degenerate at sf0.001+
    for r in rows:
        assert r["n_orders"] >= 2
        assert r["max_single_cents"] <= r["total_cents"]
        assert 0.0 < r["split_ratio"] < 1.0


def test_cluster_purity_bounds_and_reconciliation(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        _emb,
        q_emb_cluster_purity,
    )

    rows = q_emb_cluster_purity(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_members"] for r in rows)
    assert total == _emb(spark, sf_dir).count()
    for r in rows:
        assert 0.0 < r["purity"] <= 1.0
        assert r["n_majority"] <= r["n_members"]


def test_backtest_folds_expand_and_cover(spark, sf_dir):
    from collections import defaultdict

    from big_data_stock_price_forecast_spark.plans.registry import (
        BT_FOLDS,
        q_ts_backtest_folds,
    )

    rows = q_ts_backtest_folds(spark, sf_dir).collect()
    assert rows
    by_sym = defaultdict(dict)
    for r in rows:
        by_sym[r["symbol"]][r["fold"]] = r
    for sym, folds in by_sym.items():
        assert set(folds) == set(range(BT_FOLDS))
        trains = [folds[f]["n_train"] for f in range(BT_FOLDS)]
        assert trains == sorted(trains)  # expanding windows
        assert all(folds[f]["n_test"] >= 1 for f in folds)
        assert all(folds[f]["naive_mae"] >= 0.0 for f in folds)


def test_round7_relational_plans_have_no_cartesian(spark, sf_dir):
    # every round-7 relational/graph/ts addition must join on keys —
    # a CartesianProduct in any of these plans is a scale bug (the
    # only sanctioned BroadcastNestedLoop sites are one-row/scalar
    # broadcasts: pagerank's n_nodes, purity's centroid table)
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    names = [
        "orders_cohort_ltv", "orders_split_payments",
        "orders_open_concurrency", "doc_quality_filter",
        "doc_ngram_novelty", "graph_pagerank", "ts_hurst",
        "ts_pinball_loss", "ts_backtest_folds", "emb_cluster_purity",
    ]
    for name in names:
        df = all_queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_survival_curve_is_monotone_from_one_to_terminal(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_orders_survival_km,
    )

    rows = sorted(
        q_orders_survival_km(spark, sf_dir).collect(),
        key=lambda r: r["t"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9  # non-increasing
        assert r["d_events"] >= 1
        assert r["n_risk"] >= r["d_events"]
        prev = r["survival"]
    # at-risk counts are non-increasing in t
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_bot_detection_scores_and_flags(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        BOT_MIN_GAPS,
        BOT_REGULARITY_TAU,
        q_events_bot_detection,
    )

    rows = q_events_bot_detection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["median_gap_us"] > 0
        assert r["mad_gap_us"] >= 0
        assert r["is_bot_like"] == (
            r["mad_gap_us"] / r["median_gap_us"] < BOT_REGULARITY_TAU
            and r["n_gaps"] >= BOT_MIN_GAPS
        )


def test_ab_uplift_is_null_calibrated_on_hash_split(spark, sf_dir):
    # hash-split uniform data: uplift should be small relative to the
    # group means and |t| modest — the harness's null calibration
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_ab_uplift,
    )

    rows = q_events_ab_uplift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_t"] > 0 and r["n_c"] > 0
        assert abs(r["uplift"]) < 0.5 * max(
            abs(r["mean_treat"]), abs(r["mean_ctrl"]), 1e-9
        )
        assert abs(r["t_stat"]) < 6.0


def test_decontam_flags_exact_copy_of_benchmark(spark):
    # a corpus vector that IS a benchmark vector must flag at cos=1
    import tempfile

    import numpy as np
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans import registry as R

    rng = np.random.RandomState(11)
    n, dim = 300, 64
    vecs = rng.randn(n, dim).astype("float32")
    mod = R.EMB_BENCH_MOD
    # vec 1 (corpus) copies vec 0 (benchmark, 0 % mod == 0)
    vecs[1] = vecs[0]
    pdf = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [v.tolist() for v in vecs],
            "label": [int(i % 10) for i in range(n)],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(f"{d}/embeddings.parquet")
        rows = {r["vec_id"]: r for r in
                R.q_emb_bench_decontam(spark, d).collect()}
    assert rows[1]["is_contaminated"]
    assert rows[1]["best_bench_id"] == 0
    assert abs(rows[1]["best_cos"] - 1.0) < 1e-6


def test_quality_filter_skips_tokenless_docs(spark):
    import tempfile

    import pandas as pd

    from big_data_stock_price_forecast_spark.plans import registry as R

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["...!!!???", "the quick brown fox " * 10],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [9, 200],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
        rows = {r["doc_id"]: r for r in
                R.q_doc_quality_filter(spark, d).collect()}
    assert 0 not in rows  # no tokens -> no rule row (both engines)
    assert 1 in rows


def test_stickiness_bounds(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_stickiness,
    )

    rows = q_events_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["mean_dau"] <= r["mean_wau"] + 1e-9 or r["n_active_days"] <= 7
        assert r["mean_wau"] <= r["mau"] + 1e-9


def test_seasonality_strength_bounds_and_signal(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_seasonality_strength,
    )

    rows = q_ts_seasonality_strength(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["seasonal_strength"] <= 1.0 + 1e-9
        assert 0.0 <= r["trend_strength"] <= 1.0 + 1e-9


def test_funnel_latency_quartiles_are_monotone(spark, sf_dir):
    from collections import defaultdict

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_funnel_latency,
    )

    rows = q_events_funnel_latency(spark, sf_dir).collect()
    assert rows
    by_stage = defaultdict(dict)
    for r in rows:
        by_stage[r["stage"]][r["q"]] = r
    assert set(by_stage) == {"view_to_click", "click_to_purchase"}
    for stage, qs in by_stage.items():
        assert set(qs) == {0.25, 0.5, 0.75}
        assert (
            qs[0.25]["gap_seconds"]
            <= qs[0.5]["gap_seconds"]
            <= qs[0.75]["gap_seconds"]
        )
        assert qs[0.5]["n_converted"] >= 1
