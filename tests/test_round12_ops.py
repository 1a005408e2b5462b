"""Round-12 contracts: ADVICE r11 closures (prebuilt-quantizer IVF
entry point, affine_scan overflow guard) plus tests for the round's
new operators (added below as batches land)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.ivf import (
    assign_lists,
    ivf_ann_topk,
    ivf_topk_from_assigned,
    label_centroids,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )


def test_ivf_topk_from_assigned_prebuilt_matches(spark):
    """ADVICE r11: the prebuilt-quantizer entry point must produce the
    same answer as the self-building ivf_ann_topk when handed a
    pre-built (and localCheckpointed — the checkpointed-input path the
    docstring advertises) assigned/centroids pair."""
    emb = _emb(spark)
    centroids = label_centroids(emb).localCheckpoint(eager=True)
    assigned = assign_lists(emb, centroids).localCheckpoint(eager=True)
    got = sorted(
        (r["q_id"], r["vec_id"], r["rank"], r["dist"], r["list_id"])
        for r in ivf_topk_from_assigned(
            assigned, centroids, query_mod=97, k=5, nprobe=2
        ).collect()
    )
    want = sorted(
        (r["q_id"], r["vec_id"], r["rank"], r["dist"], r["list_id"])
        for r in ivf_ann_topk(emb, query_mod=97, k=5, nprobe=2).collect()
    )
    assert got and got == want


def test_affine_scan_overflow_guard_raises(spark):
    """ADVICE r11: |b|*term_scale beyond long range must fail loudly
    (floor(double) returns LONG — silent wraparound otherwise), and
    the guard must not disturb the valid path."""
    from big_data_stock_price_forecast_spark.operators.twophase import (
        affine_ema_scan,
    )

    big = spark.createDataFrame(
        [(1, i, 1.0e10) for i in range(4)],
        "symbol int, time_idx int, close double",
    )
    with pytest.raises(Exception, match="term_scale"):
        affine_ema_scan(
            big, "close", "symbol", "time_idx", alpha=0.5
        ).collect()
    # same series under a lowered scale stays on the valid path
    ok = affine_ema_scan(
        big, "close", "symbol", "time_idx", alpha=0.5, term_scale=1e6
    ).collect()
    assert len(ok) == 1 and abs(ok[0]["ema_last"] - 1.0e10) < 1.0


def test_doc_bpe_merges_matches_python_replay(spark):
    """k=5 BPE merge rounds replayed in plain python (Counter pair
    stats + left-to-right non-overlapping merge — Sennrich learn_bpe
    semantics) must reproduce the engine's learned merge table
    exactly, including the (weight desc, lhs asc, rhs asc) argmax
    tie-break."""
    import collections
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bpe_merges,
    )

    cnt: collections.Counter = collections.Counter()
    for r in load_table(spark, SF, "documents").select("text").collect():
        for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()):
            if t:
                cnt[t] += 1
    vocab = {tuple(w): c for w, c in cnt.items()}
    want = []
    for rnd in range(1, 6):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (a, b), wgt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rnd, a, b, wgt))
        new: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + c
        vocab = new
    got = [
        (r["round"], r["lhs"], r["rhs"], r["weight"])
        for r in q_doc_bpe_merges(spark, SF).orderBy("round").collect()
    ]
    assert got == want


# ===================================== round-12 batch A (quant/ts)


from tests.test_round11_ops import (  # noqa: E402
    BASE_TS,
    _plan,
    _snap,
    _write_series,
)


def test_ts_jump_test_planted_jump_replay(spark, tmp_path):
    """A smooth geometric drift has BV ≈ RV (rel_jump ≈ 0); one large
    isolated jump inflates RV but barely moves BV (rel_jump >> 0).
    The RV/BV integer-grid sums replay exactly."""
    import math as m

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_jump_test,
    )

    smooth = [100.0 * (1.002 ** i) for i in range(40)]
    # one PERSISTENT level shift: a single large return, so BV's
    # adjacent-|r| products stay small while RV takes the square
    jumpy = [y * (1.5 if i >= 20 else 1.0) for i, y in enumerate(smooth)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in smooth],
        2: [[(0, y)] for y in jumpy],
    })
    got = {r["symbol"]: r for r in q_ts_jump_test(spark, str(tmp_path)).collect()}

    def replay(ys):
        lrs = [m.log(b / a) for a, b in zip(ys, ys[1:]) if a > 0 and b > 0]
        r2 = sum(int(m.floor(r * r * 1e12 + 0.5)) for r in lrs)
        bp = sum(
            int(m.floor(abs(b) * abs(a) * 1e12 + 0.5))
            for a, b in zip(lrs, lrs[1:])
        )
        rv, bv = r2 / 1e12, (m.pi / 2.0) * (bp / 1e12)
        return _snap(rv, 10), _snap(bv, 10), _snap((rv - bv) / rv, 8)

    for sym, ys in ((1, smooth), (2, jumpy)):
        rv, bv, rj = replay(ys)
        assert got[sym]["rv"] == rv and got[sym]["bv"] == bv
        assert got[sym]["rel_jump"] == rj
    # the (π/2) scaling is calibrated for Gaussian returns, so the
    # deterministic drift sits at RJ = 1 − (π/2)(n−1)/n ≈ −0.57; the
    # jump must lift RJ far above that floor and above zero
    assert got[2]["rel_jump"] > 0.3
    assert got[2]["rel_jump"] - got[1]["rel_jump"] > 0.5


def test_ts_roll_spread_bounce_replay(spark, tmp_path):
    """A pure bid-ask bounce (mid 100, spread s=2, alternating ±s/2)
    has first autocovariance −s²/4, so the Roll estimator recovers s
    exactly; a trending series with positive autocov yields NULL."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_roll_spread,
    )

    bounce = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(40)]
    trend = [100.0 + 0.5 * i for i in range(40)]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in bounce],
        2: [[(0, y)] for y in trend],
    })
    got = {r["symbol"]: r for r in
           q_ts_roll_spread(spark, str(tmp_path)).collect()}
    # a DETERMINISTIC alternation flips sides every tick, so
    # cov = −s² (iid ±1 sides would give −s²/4) -> estimate 2s
    assert abs(got[1]["roll_spread"] - 4.0) < 1e-6
    assert got[1]["autocov"] < 0
    # constant-increment trend: Δp is constant -> autocov exactly 0,
    # no Roll solution
    assert got[2]["roll_spread"] is None and got[2]["autocov"] == 0.0


def test_ts_corwin_schultz_zero_range_and_spread(spark, tmp_path):
    """Zero-range bars (H=L) give β=γ=0 -> spread 0; planted in-bucket
    ranges produce a positive spread bounded by the range scale, and
    neg_share counts the raw-negative estimates."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_corwin_schultz,
    )

    flat = {1: [[(0, 100.0)] for _ in range(12)]}
    # symbol 2: each bucket has two ticks spanning [99, 101]
    ranged = {2: [[(1, 99.0), (0, 101.0)] for _ in range(12)]}
    _write_series(spark, str(tmp_path), {**flat, **ranged})
    got = {r["symbol"]: r for r in
           q_ts_corwin_schultz(spark, str(tmp_path)).collect()}
    assert got[1]["cs_spread"] == 0.0 and got[1]["neg_share"] == 0.0
    assert 0.0 < got[2]["cs_spread"] < 0.1
    assert got[1]["n_pairs"] == 11


def test_ts_vwap_deviation_replay(spark, tmp_path):
    """Two-tick buckets with known volumes: day VWAP = Σ(close·n)/Σn
    over the day's four buckets; the integer-grid replay is exact."""
    import math as m

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_vwap_deviation,
    )

    closes = [100.0, 102.0, 98.0, 104.0]  # one day, 1 tick each + vols
    buckets = [[(0, c)] * (i + 1) for i, c in enumerate(closes)]
    # re-planted: bucket i has i+1 ticks all at close c (vol = i+1)
    buckets = []
    for i, c in enumerate(closes):
        buckets.append([(j * 0.5, c) for j in range(i + 1)])
    _write_series(spark, str(tmp_path), {1: buckets})
    rows = {r["day"]: r for r in
            q_ts_vwap_deviation(spark, str(tmp_path)).collect()}
    # BASE_TS = 2024-01-01 06:00 -> bucket i has time_idx base+i with
    # base = (epoch - 2000-01-01)/6h; day = floor(time_idx/4), so the
    # four buckets straddle a midnight and split into two days
    import datetime as dt
    base = (
        int(BASE_TS.replace(tzinfo=dt.timezone.utc).timestamp())
        - 946684800
    ) // 21600
    by_day: dict = {}
    for i, c in enumerate(closes):
        by_day.setdefault((base + i) // 4, []).append((c, i + 1))
    assert set(rows) == set(by_day) and len(rows) == 2
    for day, cv in by_day.items():
        pv = sum(int(m.floor(c * v * 1e8 + 0.5)) for c, v in cv)
        vol = sum(v for _, v in cv)
        vwap = (pv / 1e8) / vol
        sdev = sum(
            int(m.floor(abs(c / vwap - 1.0) * 1e8 + 0.5)) for c, _ in cv
        )
        r = rows[day]
        assert r["n_buckets"] == len(cv)
        assert r["vwap"] == _snap(vwap, 8)
        assert r["mean_abs_dev"] == _snap((sdev / 1e8) / len(cv), 8)


def test_ts_dfa_persistent_vs_alternating(spark, tmp_path):
    """DFA separates persistence classes: a monotonic drift (maximally
    persistent increments) scores α near the upper range; a strictly
    alternating return series (anti-persistent) scores α near 0.
    Numpy replays the box math to float tolerance."""
    import numpy as np

    from big_data_stock_price_forecast_spark.plans.registry import q_ts_dfa

    n = 80
    # slowly-accelerating drift: persistent increments with nonzero
    # in-box curvature (a perfectly log-linear price detrends to a
    # zero profile -> F(n)=0 -> NULL alpha, by design)
    drift, p = [100.0], 100.0
    for i in range(n - 1):
        p = p * (1.0 + 0.005 + 0.0002 * i)
        drift.append(p)
    # alternating +1% / -1% returns around 100 (anti-persistent)
    alt, p = [100.0], 100.0
    for i in range(n - 1):
        p = p * (1.01 if i % 2 == 0 else 1.0 / 1.01)
        alt.append(p)
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in drift],
        2: [[(0, y)] for y in alt],
    })
    got = {r["symbol"]: r for r in q_ts_dfa(spark, str(tmp_path)).collect()}
    assert got[1]["alpha"] > 1.0 > 0.4 > got[2]["alpha"]

    def replay_f(ys, nb):
        lrs = np.array([
            np.floor(np.log(b / a) * 1e12 + 0.5) / 1e12
            for a, b in zip(ys, ys[1:])
        ])
        y = np.cumsum(lrs - lrs.sum() / len(lrs))
        k = len(y) // nb
        rvs = []
        for b in range(k):
            seg = y[b * nb:(b + 1) * nb]
            x = np.arange(nb, dtype=float)
            sy, syy = seg.sum(), (seg * seg).sum()
            sxy = (x * seg).sum()
            sx, sxx = x.sum(), (x * x).sum()
            den = sxx - sx * sx / nb
            rss = syy - sy * sy / nb - (sxy - sx / nb * sy) ** 2 / den
            rvs.append(rss / nb)
        return float(np.sqrt(np.mean(rvs)))

    for sym, ys in ((1, drift), (2, alt)):
        for nb in (8, 16, 32):
            assert abs(got[sym][f"f{nb}"] - replay_f(ys, nb)) < 1e-6


def test_ts_rolling_median_replay(spark):
    """Exact pandas replay on the real fixture: 5-bucket rolling
    median / MAD / robust z over the gap-filled closes."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.plans.registry import (
        _filled,
        q_ts_rolling_median,
    )

    pdf = (
        _filled(spark, SF)
        .select("symbol", "time_idx", "close")
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    got = {
        (r["symbol"], r["time_idx"]): (r["med5"], r["mad5"], r["robust_z"])
        for r in q_ts_rolling_median(spark, SF).collect()
    }
    n_checked = 0
    for sym, g in pdf.groupby("symbol"):
        cs = g["close"].to_numpy()
        ts = g["time_idx"].to_numpy()
        for i in range(4, len(cs)):
            arr = sorted(cs[i - 4:i + 1])
            med = arr[2]
            mad = sorted(abs(v - med) for v in cs[i - 4:i + 1])[2]
            rz = (cs[i] - med) / (1.4826 * mad + 1e-8)
            gm, gd, gz = got[(sym, ts[i])]
            assert gm == _snap(med, 8) and gd == _snap(mad, 8)
            assert gz == _snap(rz, 8)
            n_checked += 1
    assert n_checked == len(got) > 1000


def test_round12a_no_python_no_cartesian(spark):
    """Batch-A plan hygiene on the real fixture: no Python/Arrow
    stages, no cartesian products."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    for name in ("ts_jump_test", "ts_corwin_schultz", "ts_roll_spread",
                 "ts_vwap_deviation", "ts_dfa", "ts_rolling_median"):
        plan = _plan(qs[name](spark, SF))
        assert "Python" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


# ============================== round-12 batch B (doc/emb/graph/events)


def _write_docs(spark, path, docs):
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.parquet(f"{path}/documents.parquet")


def test_doc_bpe_segment_matches_replay(spark):
    """Piece counts on the real fixture equal the python BPE replay:
    train 5 merges (same argmax/tie-break as the merges test), apply
    to the vocabulary, sum per doc."""
    import collections
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bpe_segment,
    )

    doc_toks = {}
    cnt: collections.Counter = collections.Counter()
    for r in load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).collect():
        ts = [t for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()) if t]
        doc_toks[r["doc_id"]] = ts
        cnt.update(ts)
    seg = {t: tuple(t) for t in cnt}
    vocab = dict(cnt)
    for _ in range(5):
        pc: collections.Counter = collections.Counter()
        for t, c in vocab.items():
            syms = seg[t]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (a, b), _w = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for t in seg:
            syms, out, i = seg[t], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[t] = tuple(out)
    got = {r["doc_id"]: r for r in q_doc_bpe_segment(spark, SF).collect()}
    assert len(got) == len(doc_toks)
    for did, ts in doc_toks.items():
        n_pieces = sum(len(seg[t]) for t in ts)
        assert got[did]["n_tok"] == len(ts)
        assert got[did]["n_pieces"] == n_pieces


def test_doc_garbage_score_planted(spark, tmp_path):
    """Planted garbage vs clean text: a base64-ish blob trips the
    consonant-run and mixed-token detectors; clean prose stays low."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_garbage_score,
    )

    clean = "the quick brown fox jumps over the lazy dog again and again"
    blob = "xK9fQz7 mnbvcxzlkjhgfdsq p0q1w2e3r4t5 @@##$$%%^^&&"
    _write_docs(spark, str(tmp_path), [
        (1, clean, "en", "a", len(clean)),
        (2, blob, "en", "b", len(blob)),
    ])
    got = {r["doc_id"]: r for r in
           q_doc_garbage_score(spark, str(tmp_path)).collect()}
    assert got[1]["sym_ratio"] == 0.0
    assert got[1]["max_consonant_run"] <= 3  # no run beyond 'ckbr'-ish
    assert got[1]["mixed_tok_share"] == 0.0 and got[1]["digit_ratio"] == 0.0
    assert got[2]["sym_ratio"] > 0.1
    assert got[2]["max_consonant_run"] >= 10
    assert got[2]["mixed_tok_share"] > 0.2
    assert got[2]["digit_ratio"] > 0.1


def test_doc_length_quantiles_interpolation(spark, tmp_path):
    """Five known lengths: p50 picks the middle value exactly; p10/p90
    land on the classical (n−1)p interpolation points."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_length_quantiles,
    )

    lens = [10, 20, 30, 40, 100]
    _write_docs(spark, str(tmp_path), [
        (i, "x", "en", "s", n) for i, n in enumerate(lens)
    ])
    r = q_doc_length_quantiles(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 5 and r["p50"] == 30.0
    # h = (5-1)*0.1 = 0.4 -> 10 + 0.4*(20-10) = 14 ; p90: h=3.6 -> 76
    assert r["p10"] == _snap(14.0, 6)
    assert r["p90"] == _snap(40 + 0.6 * 60, 6)


def test_emb_jl_distortion_bounds(spark):
    """On the real corpus the 64→16 sign projection must concentrate:
    mean ratio within 25% of 1, extremes bounded away from 0/∞, and
    the pair panel non-vacuous."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_jl_distortion,
    )

    r = q_emb_jl_distortion(spark, SF).collect()[0]
    assert r["n_pairs"] > 100
    assert 0.75 < r["mean_ratio"] < 1.25
    assert 0.2 < r["min_ratio"] <= r["max_ratio"] < 3.0


def test_emb_lloyd_step_descends(spark):
    """The Lloyd invariant: one reassign-recenter-reassign round can
    only lower (or keep) the within-cluster inertia; cluster count
    stays within k."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_lloyd_step,
    )

    r = q_emb_lloyd_step(spark, SF).collect()[0]
    assert r["n_vecs"] > 0 and 1 <= r["k1"] <= r["k0"]
    # tolerance: centroids/d² are grid-snapped (1e-6), so descent
    # holds up to one grid cell per vector
    assert r["inertia1"] <= r["inertia0"] + 1e-4 * r["n_vecs"]


def test_events_type_user_jaccard_planted(spark, tmp_path):
    """Three types with known audiences: identical sets J=1, disjoint
    sets J=0 row still emitted? (no — disjoint pairs have no inter
    row; the planted overlap replays exactly)."""
    import datetime as dt

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_type_user_jaccard,
    )
    from tests.test_round11_ops import _write_event_rows

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # type a: users 1-4; type b: users 3-6 (J = 2/6); type c: user 99
    for u in (1, 2, 3, 4):
        rows.append((eid, t0, u, "a", 1.0, "{}")); eid += 1
    for u in (3, 4, 5, 6):
        rows.append((eid, t0, u, "b", 1.0, "{}")); eid += 1
    rows.append((eid, t0, 99, "c", 1.0, "{}"))
    _write_event_rows(spark, str(tmp_path), rows)
    got = {(r["t1"], r["t2"]): r for r in
           q_events_type_user_jaccard(spark, str(tmp_path)).collect()}
    assert set(got) == {("a", "b")}  # c shares no users
    r = got[("a", "b")]
    assert (r["n1"], r["n2"], r["n_both"]) == (4, 4, 2)
    assert r["jaccard"] == _snap(2.0 / 6.0, 8)


def test_graph_modularity_in_range_and_partition_consistent(spark):
    """Q on the real fixture stays in the modularity range and the
    community count matches the LPA query's distinct labels."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_queries,
        q_graph_modularity,
    )

    r = q_graph_modularity(spark, SF).collect()[0]
    assert -0.5 <= r["modularity"] <= 1.0
    lpa = all_queries()["graph_lpa_communities"](spark, SF)
    n_comm = lpa.select("community").distinct().count()
    assert r["n_communities"] == n_comm
    assert r["n_nodes"] == lpa.count()


# ============================ round-12 batch C (media/events/stream)


def test_media_phash_brightness_invariance(spark):
    """pHash's reason to exist beside aHash: adding a constant to
    every byte cell (uniform brightness shift) leaves all non-DC DCT
    coefficients unchanged, so the 16-bit hash is identical. Checked
    on the literal weight matrix: every non-DC row sums to ~0."""
    from big_data_stock_price_forecast_spark.operators.multimodal import (
        phash_dct_weights,
    )

    ws = phash_dct_weights()
    # DC row: all-equal positive weights; non-DC rows sum to 0
    assert all(w > 0 for w in ws[0])
    for c in range(1, 16):
        assert abs(sum(ws[c])) < 1e-9, c


def test_media_phash_banding_is_exhaustive(spark):
    """The engine's banded candidate join must find EXACTLY the pairs
    the brute-force scan finds at hamming <= PHASH_MAX_DIST
    (pigeonhole over the band count) — replayed in python on the real
    fixture."""
    import itertools

    from big_data_stock_price_forecast_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_MAX_DIST,
        phash16_bands,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        _media,
        q_media_phash_near_dup,
    )

    h = {
        r["media_id"]: [r[f"band{k}"] for k in range(PHASH_BANDS)]
        for r in phash16_bands(_media(spark, SF)).collect()
    }
    brute = set()
    for (i, a), (j, b) in itertools.combinations(sorted(h.items()), 2):
        d = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        if d <= PHASH_MAX_DIST:
            brute.add((i, j, d))
    got = {
        (r["k1"], r["k2"], r["v"])
        for r in q_media_phash_near_dup(spark, SF).collect()
        if r["kind"] == "pair"
    }
    assert got == brute
    bands = [
        r for r in q_media_phash_near_dup(spark, SF).collect()
        if r["kind"] == "band"
    ]
    assert len(bands) == PHASH_BANDS  # non-vacuous at every SF


def test_events_mad_outliers_planted(spark, tmp_path):
    """Planted per-type distributions: a tight cluster with one huge
    spike flags exactly one outlier; a symmetric spread flags none;
    med/mad replay exactly."""
    import datetime as dt

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_mad_outliers,
    )
    from tests.test_round11_ops import _write_event_rows

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for v in [10.0, 10.5, 11.0, 11.5, 12.0, 1000.0]:
        rows.append((eid, t0, eid, "spiky", v, "{}")); eid += 1
    for v in [1.0, 2.0, 3.0, 4.0, 5.0]:
        rows.append((eid, t0, eid, "even", v, "{}")); eid += 1
    _write_event_rows(spark, str(tmp_path), rows)
    got = {r["event_type"]: r for r in
           q_events_mad_outliers(spark, str(tmp_path)).collect()}
    s = got["spiky"]
    # sorted: 10,10.5,11,11.5,12,1000 -> med=(11+11.5)/2=11.25
    assert s["med"] == _snap(11.25, 8)
    # |v-med|: 1.25,0.75,0.25,0.25,0.75,988.75 -> sorted med=(.75+.75)/2
    assert s["mad"] == _snap(0.75, 8)
    assert s["n_outliers"] == 1 and s["n"] == 6
    e = got["even"]
    assert e["med"] == 3.0 and e["mad"] == 1.0 and e["n_outliers"] == 0


def test_ts_kendall_tau_monotone_and_replay(spark, tmp_path):
    """A strictly co-monotone (close, volume) tail gives τ_b = 1; an
    anti-monotone one gives −1 (volume = bucket row count, planted
    via per-bucket tick multiplicity)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_kendall_tau,
    )

    # close rises 1..12 with volume rising (i+1 ticks per bucket)
    up = [[(j * 0.4, float(10 + i)) for j in range(i + 1)]
          for i in range(12)]
    # close rises while volume falls
    down = [[(j * 0.4, float(10 + i)) for j in range(12 - i)]
            for i in range(12)]
    _write_series(spark, str(tmp_path), {1: up, 2: down})
    got = {r["symbol"]: r for r in
           q_ts_kendall_tau(spark, str(tmp_path)).collect()}
    assert got[1]["tau_b"] == 1.0 and got[1]["discordant"] == 0
    assert got[2]["tau_b"] == -1.0 and got[2]["concordant"] == 0
    assert got[1]["n_pairs"] == 12 * 11 // 2


def test_stream_jump_state_matches_batch_fold(spark, tmp_path):
    """The streamed integer-grid RV/BV sums across TWO micro-batches
    equal one continuous python fold over the whole feed — the
    no-float-drift contract of the integer state."""
    import datetime as dt
    import glob
    import math as m
    import os

    from big_data_stock_price_forecast_spark.streaming.ops import (
        jump_state_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)
    schema = "symbol long, datetime timestamp, close double, event_id long"

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("stage_" + name)))
        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*"))[0]
        os.rename(part, os.path.join(src, name + ".parquet"))

    ys1 = [100.0, 101.0, 99.5, 0.0, 102.0]  # incl. an invalid close
    ys2 = [103.0, 101.5, 104.0]
    land([(1, t0 + dt.timedelta(minutes=i), y, i)
          for i, y in enumerate(ys1)], "b0")
    land([(1, t0 + dt.timedelta(minutes=10 + i), y, 10 + i)
          for i, y in enumerate(ys2)], "b1")
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        jump_state_stream(sdf)
        .writeStream.format("memory")
        .queryName("jump_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    rows = spark.table("jump_t").collect()
    spark.catalog.dropTempView("jump_t")
    # one emission per micro-batch; the LAST carries the full fold
    final = max(rows, key=lambda r: r["n_rets"])
    n, prev, prev_absr, rv_q, bp_q = 0, None, None, 0, 0
    for x in ys1 + ys2:
        if prev is not None and x > 0 and prev > 0:
            r = m.log(x / prev)
            rv_q += int(m.floor(r * r * 1e12 + 0.5))
            if prev_absr is not None:
                bp_q += int(m.floor(abs(r) * prev_absr * 1e12 + 0.5))
            prev_absr = abs(r)
            n += 1
        prev = x
    assert (final["n_rets"], final["rv_q"], final["bp_q"]) == (n, rv_q, bp_q)
    assert len(rows) >= 2  # state genuinely crossed micro-batches


# ======================== round-12 batch D (KN LM, Benford, staleness)


def test_doc_kn_bigram_ppl_matches_python_replay(spark):
    """Interpolated Kneser–Ney replayed in plain python on the real
    fixture split: discounted seen mass + continuation backoff +
    unseen-context/word floors, surprisals on the 1e-9 integer grid."""
    import collections
    import math as m
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        KN_DISCOUNT,
        q_doc_kn_bigram_ppl,
    )

    docs = {
        r["doc_id"]: [
            t for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()) if t
        ]
        for r in load_table(spark, SF, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    c2: collections.Counter = collections.Counter()
    for did, ts in docs.items():
        if did % 5 != 0:
            for a, b in zip(ts, ts[1:]):
                c2[(a, b)] += 1
    c1: collections.Counter = collections.Counter()
    n1f: collections.Counter = collections.Counter()
    n1b: collections.Counter = collections.Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    tt = len(c2)
    d = KN_DISCOUNT
    want = {}
    for did, ts in docs.items():
        if did % 5 != 0 or len(ts) < 2:
            continue
        ssum, n = 0, 0
        for a, b in zip(ts, ts[1:]):
            pc = n1b.get(b, 0) / tt
            if a in c1:
                p = max(c2.get((a, b), 0) - d, 0.0) / c1[a] + (
                    d * n1f[a] / c1[a]
                ) * pc
            else:
                p = pc if b in n1b else d / tt
            p = max(p, d / tt / 1e6)
            ssum += int(m.floor(-m.log(p) * 1e9 + 0.5))
            n += 1
        want[did] = (n, _snap(m.exp((ssum / 1e9) / n), 6))
    got = {
        r["doc_id"]: (r["n_big"], r["kn_ppl"])
        for r in q_doc_kn_bigram_ppl(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_orders_benford_planted(spark, tmp_path):
    """Planted totals with known first digits; shares and chi terms
    replay against the literal Benford expectations."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        BENFORD_EXPECTED,
        q_orders_benford_law,
    )

    totals = [123.45, 19.99, 102.0, 940.10, 1.07, 55.0, 111.11, 9.81]
    rows = [
        (i, i % 3, "O", float(t), "1996-01-02", "1-URGENT", "c", 0, "x")
        for i, t in enumerate(totals)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string,"
        " o_clerk string, o_shippriority int, o_comment string",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    got = {r["digit"]: r for r in
           q_orders_benford_law(spark, str(tmp_path)).collect()}
    import collections
    cnt = collections.Counter(int(str(int(t * 100 + 0.5))[0]) for t in totals)
    assert {d: r["n"] for d, r in got.items()} == dict(cnt)
    for dig, r in got.items():
        assert r["expected"] == _snap(BENFORD_EXPECTED[dig - 1], 8)
        assert r["share"] == _snap(cnt[dig] / len(totals), 8)


def test_ts_price_staleness_planted_runs(spark, tmp_path):
    """Planted flat runs: closes [5,5,5,7,7,9] -> 3 flat transitions,
    max run 3; an always-changing series scores zero."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_price_staleness,
    )

    stale = [5.0, 5.0, 5.0, 7.0, 7.0, 9.0]
    fresh = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    _write_series(spark, str(tmp_path), {
        1: [[(0, y)] for y in stale],
        2: [[(0, y)] for y in fresh],
    })
    got = {r["symbol"]: r for r in
           q_ts_price_staleness(spark, str(tmp_path)).collect()}
    assert got[1]["n_flat"] == 3 and got[1]["max_flat_run"] == 3
    assert got[1]["flat_share"] == _snap(3 / 6, 8)
    assert got[2]["n_flat"] == 0 and got[2]["max_flat_run"] == 1
