"""Contracts for the in-engine VAE trainer (operators/vaetrain.py,
reference core/nn/vae.py + lit.py criterion): analytic gradient vs
finite differences, bit-exact partition independence, a pure-numpy
replay of the distributed training loop, loss descent, and the
mu-head encode twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.vaetrain import (
    GRID,
    VaeParams,
    _eps_for,
    _forward_backward,
    _forward_backward_rows,
    train_vae,
    vae_encode,
)

L, H, K = 6, 5, 3


def _toy_rows(n=40, seed=3):
    rng = np.random.RandomState(seed)
    return [
        (int(i), [float(x) for x in rng.randn(L)]) for i in range(n)
    ]


@pytest.fixture(scope="module")
def toy_df(spark):
    return spark.createDataFrame(
        _toy_rows(), "uid long, xs array<double>"
    )


def _loss_at(vec, xs, uid, epoch, kl_beta):
    p = VaeParams(L, H, K, vec)
    _, r_sum, kl_sum = _forward_backward(xs, uid, p, epoch, kl_beta)
    n = xs.shape[0]
    return r_sum / n + kl_beta * (kl_sum / n)


def test_gradient_matches_finite_differences():
    rows = _toy_rows(12)
    xs = np.array([r[1] for r in rows])
    uid = np.array([r[0] for r in rows], np.int64)
    p = VaeParams.init(L, H, K, seed=11)
    kl_beta = 5e-4
    grad, _, _ = _forward_backward(xs, uid, p, epoch=2, kl_beta=kl_beta)
    g = grad / xs.shape[0]
    h = 1e-6
    rng = np.random.RandomState(0)
    for i in rng.choice(p.vec.shape[0], size=25, replace=False):
        vp = p.vec.copy()
        vm = p.vec.copy()
        vp[i] += h
        vm[i] -= h
        num = (
            _loss_at(vp, xs, uid, 2, kl_beta)
            - _loss_at(vm, xs, uid, 2, kl_beta)
        ) / (2 * h)
        assert abs(num - g[i]) < 1e-5 * max(1.0, abs(num)), i


def test_gradient_matches_finite_differences_at_logvar_clamp():
    """Saturate the logvar clamp (b3 pushed below -30: std → ~0 so
    the loss stays O(1) and finite differences stay numerically
    meaningful, unlike the +30 side where exp(lv) ≈ 1e13 swamps FD)
    and re-check the analytic gradient against finite differences on
    the W3/b3 slices AND on W1/b1 (which dlv contaminates through
    dh1 if the clamp is wrongly treated as identity). Guards the
    np.clip backward: dlv must be zeroed where |lv_pre| > 30."""
    rows = _toy_rows(10, seed=5)
    xs = np.array([r[1] for r in rows])
    uid = np.array([r[0] for r in rows], np.int64)
    p = VaeParams.init(L, H, K, seed=11)
    o3, n3, _ = p.slices["b3"]
    p.vec[o3:o3 + n3] = -40.0  # lv_pre << -30 for every row/dim
    kl_beta = 5e-4
    grad, _, _ = _forward_backward(xs, uid, p, epoch=2, kl_beta=kl_beta)
    g = grad / xs.shape[0]
    h = 1e-6
    ow3, nw3, _ = p.slices["W3"]
    ow1, nw1, _ = p.slices["W1"]
    ob1, nb1, _ = p.slices["b1"]
    probe = (
        list(range(ow3, ow3 + min(6, nw3)))
        + list(range(o3, o3 + n3))
        + list(range(ow1, ow1 + min(6, nw1)))
        + list(range(ob1, ob1 + min(3, nb1)))
    )
    for i in probe:
        vp = p.vec.copy()
        vm = p.vec.copy()
        vp[i] += h
        vm[i] -= h
        num = (
            _loss_at(vp, xs, uid, 2, kl_beta)
            - _loss_at(vm, xs, uid, 2, kl_beta)
        ) / (2 * h)
        assert abs(num - g[i]) < 1e-5 * max(1.0, abs(num)), i
    # the saturated W3/b3 slices get exactly zero gradient
    assert np.all(g[ow3:ow3 + nw3] == 0.0)
    assert np.all(g[o3:o3 + n3] == 0.0)


def test_training_is_partition_independent(spark, toy_df):
    """The determinism contract: int-snapped per-row gradients summed
    exactly mean the trained parameters are BIT-IDENTICAL under any
    partitioning — 1 partition vs 7 must agree to the last bit."""
    p1, h1 = train_vae(
        toy_df.repartition(1), L=L, hidden=H, k=K, epochs=3
    )
    p7, h7 = train_vae(
        toy_df.repartition(7), L=L, hidden=H, k=K, epochs=3
    )
    assert np.array_equal(p1.vec, p7.vec)
    assert h1 == h7


def test_training_matches_numpy_replay(spark, toy_df):
    """The distributed loop replayed locally: same snap, same exact
    integer sum, same AdamW — parameters must match bit-for-bit (the
    trainer's analog of the DuckDB oracle for an iterative op)."""
    ps, hist_s = train_vae(toy_df, L=L, hidden=H, k=K, epochs=4)

    rows = _toy_rows()
    xs_all = np.array([r[1] for r in rows])
    uid_all = np.array([r[0] for r in rows], np.int64)
    p = VaeParams.init(L, H, K, seed=7)
    m = np.zeros_like(p.vec)
    v = np.zeros_like(p.vec)
    kl_beta, lr, wd = 5e-4, 1e-2, 1e-4
    for ep in range(4):
        # replay the exact contract: snap each ROW's gradient to the
        # grid, sum as integers — batching-invariant by construction,
        # so this local replay must equal the Spark run bit-for-bit
        grads, _, _ = _forward_backward_rows(
            xs_all, uid_all, p, ep, kl_beta
        )
        g = (
            np.rint(grads * GRID).astype(np.int64).sum(axis=0)
            / GRID / len(rows)
        )
        t = ep + 1
        # (1 - 0.9) != 0.1 in float64 — use the trainer's exact forms
        m = 0.9 * m + (1 - 0.9) * g
        v = 0.999 * v + (1 - 0.999) * g * g
        mh = m / (1 - 0.9 ** t)
        vh = v / (1 - 0.999 ** t)
        p.vec = p.vec - lr * (mh / (np.sqrt(vh) + 1e-8) + wd * p.vec)
    # same exact integer sums + same float64 AdamW = bit-for-bit
    assert np.array_equal(ps.vec, p.vec)


def test_loss_descends_and_matches_reference_criterion(spark, toy_df):
    _, hist = train_vae(
        toy_df, L=L, hidden=H, k=K, epochs=8, lr=5e-2
    )
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0]
    # criterion shape: loss = loss_r + kl_beta * loss_kl (lit.py:91)
    for h in hist:
        assert abs(h["loss"] - (h["loss_r"] + 5e-4 * h["loss_kl"])) < 1e-12


def test_eps_is_deterministic_and_standardish():
    uid = np.arange(4000, dtype=np.int64)
    e1 = _eps_for(uid, 3, 4)
    e2 = _eps_for(uid, 3, 4)
    assert np.array_equal(e1, e2)
    assert abs(float(e1.mean())) < 0.05
    assert abs(float(e1.std()) - 1.0) < 0.05
    assert not np.array_equal(e1, _eps_for(uid, 4, 4))


def test_vae_encode_shape_and_determinism(spark, toy_df):
    p, _ = train_vae(toy_df, L=L, hidden=H, k=K, epochs=2)
    df = toy_df.withColumn("symbol", F.lit(1)).withColumn(
        "window_id", F.col("uid")
    )
    out = vae_encode(df, p).orderBy("window_id").collect()
    assert len(out) == 40
    assert all(len(r["emb"]) == K for r in out)
    out2 = vae_encode(df.repartition(5), p).orderBy("window_id").collect()
    for a, b in zip(out, out2):
        assert a["emb"] == b["emb"]


def test_minibatch_mode_is_deterministic_and_subsets(spark, toy_df):
    """100 TB mode: each step trains on a hash-selected subset. The
    member set is a pure function of (uid, step) — two runs agree
    bit-for-bit and differ from the full-batch fit; the scan-side
    filter selects roughly the requested fraction."""
    from big_data_stock_price_forecast_spark.operators.vaetrain import (
        minibatch_filter,
    )

    pa, ha = train_vae(
        toy_df, L=L, hidden=H, k=K, epochs=3, minibatch_frac=0.6
    )
    pb, hb = train_vae(
        toy_df.repartition(5), L=L, hidden=H, k=K, epochs=3,
        minibatch_frac=0.6,
    )
    assert np.array_equal(pa.vec, pb.vec)
    assert ha == hb
    pf, _ = train_vae(toy_df, L=L, hidden=H, k=K, epochs=3)
    assert not np.array_equal(pa.vec, pf.vec)
    n0 = toy_df.filter(minibatch_filter("uid", 0, 0.6)).count()
    n1 = toy_df.filter(minibatch_filter("uid", 1, 0.6)).count()
    assert 10 <= n0 <= 38 and 10 <= n1 <= 38
    # different steps select different subsets
    s0 = {r["uid"] for r in
          toy_df.filter(minibatch_filter("uid", 0, 0.6)).collect()}
    s1 = {r["uid"] for r in
          toy_df.filter(minibatch_filter("uid", 1, 0.6)).collect()}
    assert s0 != s1
