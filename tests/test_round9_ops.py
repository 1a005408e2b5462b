"""Round-9 operator contracts: Okapi BM25 retrieval and per-document
token entropy (lexical-diversity quality signal).

BM25 reference: Robertson/Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond" (2009), with the Lucene non-negative idf
variant ln(1 + (N - df + 0.5)/(df + 0.5)). The tests replay the exact
scoring pipeline — including the shared 1e-6 grid-snap-then-exact-sum
determinism device — in plain Python and assert the Spark plan
reproduces it bit-for-bit.
"""

import math
import re
from collections import Counter

from pyspark.sql import Row, functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    q_doc_bm25_topk,
    q_doc_edit_sim_pairs,
    q_doc_token_entropy,
)


def _toks(text: str) -> list:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _snap6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_bm25(docs: dict) -> list:
    """(rank, doc_id, score, n_terms, total_tf) rows, the query's exact
    contract: per-(doc,term) contribution snapped to the 1e-6 grid,
    per-doc sum exact (ints of micro-units), rank on the exact sum."""
    toked = {d: _toks(t) for d, t in docs.items()}
    n_docs = len(toked)
    avgdl = sum(len(v) for v in toked.values()) / n_docs
    tf = {
        d: Counter(t for t in v if t in BM25_TERMS)
        for d, v in toked.items()
    }
    df = Counter(t for c in tf.values() for t in c)
    rows = []
    for d, c in tf.items():
        if not c:
            continue
        micro = 0
        for t, f in c.items():
            idf = math.log(
                1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            )
            tfp = (f * (BM25_K1 + 1.0)) / (
                f
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * len(toked[d]) / avgdl)
            )
            micro += round(_snap6(idf * tfp) * 1e6)
        rows.append((d, micro, len(c), sum(c.values())))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return [
        (i + 1, d, _snap6(micro / 1e6), nt, tt)
        for i, (d, micro, nt, tt) in enumerate(rows[:BM25_TOPK])
    ]


def test_bm25_matches_python_reference(spark, tmp_path):
    docs = {
        0: "spark merge spark table dup",  # all three terms, short
        1: "dup dup dup filter row",  # rare term repeated
        2: "spark spark spark spark merge " + "pad " * 40,  # long doc
        3: "table row filter scan",  # no query terms -> absent
        4: "merge",  # single-term, shortest doc
        5: "spark merge dup " + "x " * 10,
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
         for d, t in docs.items()]
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(p)
    got = [
        (r["rank"], r["doc_id"], r["score"], r["n_terms"], r["total_tf"])
        for r in q_doc_bm25_topk(spark, str(tmp_path)).collect()
    ]
    got.sort()
    assert got == _py_bm25(docs)
    # doc 3 has no query term: must not appear at all
    assert 3 not in {r[1] for r in got}


def test_bm25_partition_invariant(spark, sf_dir):
    a = sorted(map(tuple, q_doc_bm25_topk(spark, sf_dir).collect()))
    assert len(a) == BM25_TOPK
    ranks = sorted(r[0] for r in a)
    assert ranks == list(range(1, BM25_TOPK + 1))
    # exact-decimal ranking: scores are non-increasing in rank order
    by_rank = sorted(a)
    scores = [r[2] for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def _py_entropy(docs: dict) -> dict:
    out = {}
    for d, t in docs.items():
        c = Counter(_toks(t))
        n = sum(c.values())
        if n == 0:
            continue
        micro = sum(
            round(_snap6(f * math.log2(f)) * 1e6) for f in c.values()
        )
        ent = _snap6(math.log2(n) - (micro / 1e6) / n)
        out[d] = (n, len(c), ent, _snap6(len(c) / n))
    return out


def test_token_entropy_matches_python_reference(spark, tmp_path):
    docs = {
        0: "a a a a a a",  # zero entropy: one type
        1: "a b c d e f g h",  # uniform: log2(8) = 3 bits exactly
        2: "a a a a b",  # skewed
        3: "Mixed CASE, punct!! and   spacing — ok?",
        4: "",  # token-less: must be absent from the output
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
         for d, t in docs.items()]
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_tok"], r["n_types"], r["entropy_bits"], r["ttr"]
        )
        for r in q_doc_token_entropy(spark, str(tmp_path)).collect()
    }
    assert got == _py_entropy(docs)
    assert got[0][2] == 0.0
    assert got[1][2] == 3.0
    assert 4 not in got


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[len(b)]


def test_levenshtein_engine_matches_python_dp(spark):
    """doc_edit_sim_pairs rides on F.levenshtein: pin Spark's kernel to
    the textbook DP (unit-cost insert/delete/substitute) on the edge
    shapes — empty, equal, prefix, transposition (cost 2 under
    Levenshtein, unlike Damerau), repeats, and case sensitivity."""
    cases = [
        ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
        ("kitten", "sitting"), ("abcdef", "abcdefgh"),
        ("ab", "ba"), ("aaaa", "aabaa"), ("Spark", "spark"),
        ("the quick brown fox", "the quick brawn fax"),
    ]
    df = spark.createDataFrame(
        [Row(a=a, b=b) for a, b in cases]
    ).select("a", "b", F.levenshtein("a", "b").alias("ed"))
    for r in df.collect():
        assert r["ed"] == _py_lev(r["a"], r["b"]), (r["a"], r["b"])


def test_edit_sim_pairs_end_to_end(spark, tmp_path):
    """Two near-identical docs must band together and survive the sim
    threshold with the exact hand-computed edit distance; an unrelated
    doc must not pair with them."""
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a[:-10] + "cat again "  # small tail edit of a
    c = "completely different content about spark shuffles " * 5
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate([a, b, c])]
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_doc_edit_sim_pairs(spark, str(tmp_path)).collect()
    assert [(r["id_i"], r["id_j"]) for r in rows] == [(0, 1)]
    r = rows[0]
    assert r["ed"] == _py_lev(a, b)
    assert r["len_i"] == len(a) and r["len_j"] == len(b)
    expect = 1.0 - r["ed"] / max(len(a), len(b))
    assert abs(r["sim"] - expect) < 1e-6


def test_dup_ngram_spans_end_to_end(spark, tmp_path):
    """Span-level exact-dup detection: maximal runs of 8-gram shingles
    shared across >= 2 docs, with token-offset starts. Covers multi-span
    docs, sub-8-token docs (no shingles), and the within-doc-repetition
    exclusion (ndocs = 1 is doc_repetition's domain, not a span)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_dup_ngram_spans,
    )

    phrase = ("alpha beta gamma delta epsilon zeta eta theta iota"
              " kappa lambda mu")                       # 12 tokens
    phrase2 = "p q r s t u v w y z"                     # 10 tokens
    docs = {
        0: "one two three " + phrase + " four " + phrase2,
        1: phrase + " six seven eight",
        2: "nine ten eleven twelve",                    # < 8 tokens
        3: ("rep1 rep2 rep3 rep4 rep5 rep6 rep7 rep8 filler "
            "rep1 rep2 rep3 rep4 rep5 rep6 rep7 rep8"),  # within-doc only
        4: "x1 x2 " + phrase2 + " x3",
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
         for d, t in docs.items()]
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(p)
    got = sorted(
        map(tuple, q_doc_dup_ngram_spans(spark, str(tmp_path)).collect())
    )
    assert got == [
        (0, 3, 12, 5, 2),   # phrase at token 3, 5 dup shingles
        (0, 16, 10, 3, 2),  # phrase2 at token 16 — second span same doc
        (1, 0, 12, 5, 2),
        (4, 2, 10, 3, 2),
    ]


def test_ar2_yule_walker_device_recovers_coefficients():
    """Semantic check for ts_ar2_forecast's math (the oracle pins
    engine parity, not AR(2)-ness): the exact-integer computational-
    formula device, replayed in python on a simulated AR(2) process,
    must (a) equal the textbook mean-centered Yule-Walker solve to
    float precision and (b) recover the true coefficients."""
    import numpy as np

    rng = np.random.default_rng(3)
    phi1_true, phi2_true, n = 0.55, -0.25, 200_000
    x = np.zeros(n)
    eps = rng.normal(0, 0.01, n)
    for t in range(2, n):
        x[t] = phi1_true * x[t - 1] + phi2_true * x[t - 2] + eps[t]

    # the query's device: snap to 1e-6 grid, exact integer moments
    q = np.floor(x * 1e6 + 0.5).astype(np.int64)
    nn = float(len(q))
    s = int(q.sum())
    m = s / nn
    p0, p1, p2 = (
        int((q * q).sum()),
        int((q[1:] * q[:-1]).sum()),
        int((q[2:] * q[:-2]).sum()),
    )
    a1, b1 = int(q[1:].sum()), int(q[:-1].sum())
    a2, b2 = int(q[2:].sum()), int(q[:-2].sum())
    g = lambda p, a, b, k: (p - m * a - m * b + (nn - k) * m * m) / nn
    g0, g1, g2 = g(p0, s, s, 0), g(p1, a1, b1, 1), g(p2, a2, b2, 2)
    rho1, rho2 = g1 / g0, g2 / g0
    den = 1.0 - rho1 * rho1
    phi1 = rho1 * (1.0 - rho2) / den
    phi2 = (rho2 - rho1 * rho1) / den

    # (a) equals the textbook estimator on the snapped series
    xs = q / 1e6
    xc = xs - xs.mean()
    gam = [float((xc[k:] * xc[: len(xc) - k]).sum() / len(xc))
           for k in (0, 1, 2)]
    r1, r2 = gam[1] / gam[0], gam[2] / gam[0]
    ref1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    ref2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert abs(phi1 - ref1) < 1e-9 and abs(phi2 - ref2) < 1e-9
    # (b) recovers the simulated process
    assert abs(phi1 - phi1_true) < 0.02
    assert abs(phi2 - phi2_true) < 0.02
    # residual variance ~ innovation variance
    sig2 = g0 * (1.0 - phi1 * rho1 - phi2 * rho2) / 1e12
    assert abs(sig2 - 0.01**2) / 0.01**2 < 0.05


def test_ab_bootstrap_ci_null_calibration(spark, sf_dir):
    """On the hash-split null (both arms drawn from the same
    distribution), the bootstrap interval must behave like one:
    lo <= hi per event type, the point uplift inside its own interval,
    and 0 covered for most types (the split is null, so a ~94%
    interval missing zero in more than one of five types would flag a
    broken resampler)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_ab_bootstrap_ci,
    )

    rows = q_events_ab_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == 5
    covered = 0
    for r in rows:
        assert r["n_boot"] == 32
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["ci_lo"] <= r["uplift"] <= r["ci_hi"]
        if r["ci_lo"] <= 0.0 <= r["ci_hi"]:
            covered += 1
    assert covered >= 4


def test_poisson_weight_device_matches_python():
    """The Poisson(1) CDF chain over the hash-uniform must reproduce a
    direct python evaluation — and its weights must average ~1 (the
    bootstrap's resample-size preservation)."""
    import numpy as np

    from big_data_stock_price_forecast_spark.plans.registry import (
        _BOOT_POIS_CDF,
    )

    rng = np.random.default_rng(11)
    us = rng.random(200_000)
    ws = np.searchsorted(np.asarray(_BOOT_POIS_CDF), us, side="right")
    # mean ~ 1, var ~ 1 (Poisson(1) moments within sampling error)
    assert abs(ws.mean() - 1.0) < 0.01
    assert abs(ws.var() - 1.0) < 0.02
    # CASE chain semantics: first threshold GREATER than u wins
    for u, w in [(0.0, 0), (0.36787944117144233, 1), (0.99, 4),
                 (0.9999999, 7)]:
        expect = next(
            (j for j, c in enumerate(_BOOT_POIS_CDF) if u < c),
            len(_BOOT_POIS_CDF),
        )
        assert expect == w


def test_changepoint_device_finds_planted_shift():
    """Semantic check for ts_changepoint_meanshift's math: the exact-
    integer-prefix-sum scan statistic, replayed in python, must locate
    a planted mean shift and prefer it decisively over null splits."""
    import numpy as np

    rng = np.random.default_rng(13)
    n, t_true, delta = 4000, 2600, 0.003
    r = rng.normal(0.0, 0.001, n)
    r[t_true:] += delta
    q = np.floor(r * 1e6 + 0.5).astype(np.int64)
    pfx = np.cumsum(q)
    s = int(pfx[-1])
    best = (-1.0, -1)
    null_stats = []
    for t in range(5, n - 4):
        m1 = pfx[t - 1] / t
        m2 = (s - pfx[t - 1]) / (n - t)
        stat = abs(m1 - m2) * np.sqrt(t * (n - t) / n)
        if stat > best[0]:
            best = (stat, t)
    assert abs(best[1] - t_true) <= 25  # within noise of the true split
    # and the recovered segment means match the planted levels
    t = best[1]
    m1 = pfx[t - 1] / t / 1e6
    m2 = (s - pfx[t - 1]) / (n - t) / 1e6
    assert abs(m1 - 0.0) < 3e-4 and abs(m2 - delta) < 3e-4


def test_fracdiff_weights_properties():
    """d=1 must degenerate to the first difference (w=[1,-1,0,...]);
    d=0 to the identity; and the d=0.4 truncated kernel applied by
    convolution must match the query's left-associated sum chain."""
    import numpy as np

    from big_data_stock_price_forecast_spark.plans.registry import (
        _fracdiff_weights,
    )

    w1 = _fracdiff_weights(1.0, 5)
    assert w1[0] == 1.0 and w1[1] == -1.0 and all(x == 0.0 for x in w1[2:])
    w0 = _fracdiff_weights(0.0, 5)
    assert w0[0] == 1.0 and all(x == 0.0 for x in w0[1:])
    ws = _fracdiff_weights(0.4, 20)
    # alternating-sign decay after w0: all negative, shrinking
    assert all(ws[j] < 0 for j in range(1, 20))
    assert all(abs(ws[j + 1]) < abs(ws[j]) for j in range(1, 19))
    rng = np.random.default_rng(17)
    x = np.cumsum(rng.normal(0, 0.01, 100)) + 4.0
    # left-associated chain, exactly as the engines evaluate it
    got = []
    for t in range(19, 100):
        acc = ws[0] * x[t]
        for j in range(1, 20):
            acc = acc + ws[j] * x[t - j]
        got.append(acc)
    conv = np.convolve(x, ws, mode="valid")
    np.testing.assert_allclose(got, conv, rtol=1e-12)


def test_cycle_power_device_detects_planted_cycle():
    """Semantic check for ts_cycle_power: the snap-then-exact-sum DFT
    bin, replayed in python, must read a planted period-28 cycle far
    above noise at period 28 and near-noise at the other bins — and
    recover the planted amplitude."""
    import math

    import numpy as np

    from big_data_stock_price_forecast_spark.plans.registry import (
        CYCLE_PERIODS,
        _cycle_angle_rows,
    )

    rng = np.random.default_rng(19)
    n, amp_true, p_true = 20_000, 0.004, 28
    t = np.arange(n)
    x = amp_true * np.cos(2 * math.pi * t / p_true) + rng.normal(
        0, 0.001, n
    )
    q = np.floor(x * 1e6 + 0.5).astype(np.int64)
    tab = {(p, r): (c, s) for p, r, c, s in _cycle_angle_rows()}
    amps = {}
    for p in CYCLE_PERIODS:
        cs = np.array([tab[(p, int(r))] for r in t % p])
        sa = int(np.floor(q * cs[:, 0] * 1e3 + 0.5).sum())
        sb = int(np.floor(q * cs[:, 1] * 1e3 + 0.5).sum())
        a, b = sa / 1e3, sb / 1e3
        amps[p] = 2.0 * math.sqrt(a * a + b * b) / n / 1e6
    assert abs(amps[p_true] - amp_true) / amp_true < 0.02
    for p in CYCLE_PERIODS:
        if p != p_true:
            assert amps[p] < amp_true / 10


def test_holt_winters_tracks_planted_seasonality(spark):
    """holt_winters_arrow on a trend + period-4 seasonal signal: the
    late-series seasonal states must approach the planted offsets
    (zero-mean), the level must track the trend line, and the
    one-step fitted error must be far below the seasonal amplitude
    (i.e. the model actually absorbed the cycle)."""
    import numpy as np

    from big_data_stock_price_forecast_spark.operators.rolling import (
        holt_winters_arrow,
    )

    n = 400
    seas = [2.0, -1.0, -2.0, 1.0]  # zero-mean period-4 pattern
    rows = [
        (1, i, 100.0 + 0.05 * i + seas[i % 4]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "symbol int, time_idx int, close double")
    g = (
        holt_winters_arrow(df)
        .toPandas()
        .sort_values("time_idx")
        .reset_index(drop=True)
    )
    assert g["hw_fitted"].isna().sum() == 1  # seed row only
    tail = g.iloc[-40:]
    # late fitted error << seasonal amplitude (2.0)
    actual = np.array([100.0 + 0.05 * i + seas[i % 4]
                       for i in tail["time_idx"]])
    err = np.abs(tail["hw_fitted"].to_numpy() - actual)
    assert err.mean() < 0.2
    # seasonal states converge to the planted offsets
    for ph in range(4):
        got = tail[tail["time_idx"] % 4 == ph]["hw_seasonal"].mean()
        assert abs(got - seas[ph]) < 0.3, ph
    # level tracks the trend line (seasonal removed)
    lvl_err = np.abs(
        tail["hw_level"].to_numpy()
        - (100.0 + 0.05 * tail["time_idx"].to_numpy())
    )
    assert lvl_err.mean() < 0.3


def test_format_roundtrip_checksum_detects_corruption(spark, tmp_path):
    """The XOR row-signature must actually have detection power: after
    corrupting a single value in one CSV part file, the re-read
    replica's signature must differ from the original's (count
    unchanged — corruption, not loss)."""
    import glob

    from big_data_stock_price_forecast_spark.plans.registry import (
        hash60,
    )

    df = spark.createDataFrame(
        [(i, f"u{i % 7}", float(i) / 3.0) for i in range(500)],
        "id bigint, name string, v double",
    )
    p = str(tmp_path / "csv")
    df.coalesce(1).write.option("header", True).csv(p)

    def sig(frame):
        canon = F.concat_ws(
            "|", F.col("id").cast("string"), F.col("name"),
            F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint")
            .cast("string"),
        )
        row = (
            frame.select(hash60(canon).alias("h"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(h)").alias("x"))
            .first()
        )
        return row["n"], row["x"]

    def rd(path):
        return spark.read.schema(df.schema).option(
            "header", True
        ).csv(path)

    n0, x0 = sig(rd(p))
    assert n0 == 500
    # corrupt ONE cell into a fresh directory (in-place edits trip
    # Spark's file-change detection, which is not what's under test)
    import os

    p2 = str(tmp_path / "csv2")
    os.makedirs(p2)
    part = glob.glob(p + "/part-*.csv")[0]
    txt = open(part).read()
    assert "u3" in txt
    with open(os.path.join(p2, "part-0.csv"), "w") as f:
        f.write(txt.replace("u3", "u9", 1))
    n1, x1 = sig(rd(p2))
    assert n1 == 500 and x1 != x0


def test_overlap_eval_pairs_hand_computed(spark, tmp_path):
    """BLEU-2 / ROUGE-1 against hand-computed values on planted pairs:
    an exact duplicate must score 1.0 everywhere; a one-token edit of
    a 20-token doc must score exactly p1=19/20, p2=17/19 (the two
    bigrams through the edited position break), rouge1=19/20,
    bleu2=sqrt(p1*p2) with brevity penalty 1 (equal lengths)."""
    import math

    from pyspark.sql import Row

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_overlap_eval_pairs,
    )

    base = [f"w{i}" for i in range(20)]
    edited = base[:10] + ["zz"] + base[11:]
    docs = {
        0: " ".join(base),
        1: " ".join(base),      # exact dup of 0
        6: " ".join(base),      # third copy — also pairs with 0 and 1
        9: " ".join(edited),    # one-token edit
        12: "totally different words entirely here now",
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
         for d, t in docs.items()]
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        (r["id_i"], r["id_j"]): r
        for r in q_doc_overlap_eval_pairs(spark, str(tmp_path)).collect()
    }
    r01 = rows[(0, 1)]
    assert (r01["p1"], r01["p2"], r01["rouge1"], r01["bleu2"]) == (
        1.0, 1.0, 1.0, 1.0,
    )
    r09 = rows[(0, 9)]
    assert r09["ov1"] == 19 and r09["ov2"] == 17
    assert r09["p1"] == round(19 / 20, 6)
    assert r09["p2"] == round(math.floor(17 / 19 * 1e6 + 0.5) / 1e6, 6)
    assert r09["rouge1"] == round(19 / 20, 6)
    expect_bleu = math.sqrt((19 / 20) * (17 / 19))
    assert abs(r09["bleu2"] - expect_bleu) < 2e-6
    # the unrelated doc must not appear in any pair
    assert all(12 not in k for k in rows)


def test_emb_dim_drift_detects_planted_shift(spark, tmp_path):
    """Drift monitor semantics: on a corpus where the odd half is the
    even half shifted by +0.5 in dims 0-2, those dims' abs_shift must
    read ~0.5 and all other dims ~0."""
    import numpy as np

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_emb_dim_drift,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(400):
        v = rng.normal(0, 0.1, 64)
        if i % 2 == 1:  # "current" half: planted encoder shift
            v[:3] += 0.5
        rows.append((i, [float(x) for x in v.astype(np.float32)], i % 10))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {r["dim"]: r for r in q_emb_dim_drift(spark, str(tmp_path)).collect()}
    assert len(got) == 64
    assert all(r["n_ref"] == 200 and r["n_cur"] == 200
               for r in got.values())
    for d in range(3):
        assert abs(got[d]["abs_shift"] - 0.5) < 0.05, d
    for d in range(3, 64):
        assert got[d]["abs_shift"] < 0.05, d
