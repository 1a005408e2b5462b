"""In-engine VAE training (SURVEY.md §2.8 M2-M6) — the one reference
capability previously declared out of scope, now expressed Spark-first.

Reference: core/nn/vae.py:79-202 (conv VAE, reparameterization
``z = eps * std + mu``), core/nn/lit.py:84-92 (criterion
``mse_loss(recon, x) + kl_beta * mean(-0.5 * sum(1 + logvar - mu^2
- exp(logvar)))``), lit.py:34-46 (AdamW-family optimizer, lr 1e-4,
weight_decay 1e-4), train.py:96-108 (pytorch-lightning DDP
data-parallel fit). The torch checkpoint-inference twin is
operators/embed.py embed_windows_torch.

What carries over EXACTLY: the loss (same MSE-mean + beta-weighted KL
form), the reparameterization, the optimizer family (AdamW), and the
data-parallel shape — per-row gradients reduced across the cluster
each step, parameters broadcast back (DDP's allreduce, re-expressed as
one ``groupBy(param_idx).sum`` per epoch). What is deliberately
smaller: the architecture. The reference's 21-conv-layer encoder is a
GPU-sized model; the in-engine trainer fits an MLP VAE over the same
sliding windows (enc L -> tanh h -> (mu, logvar) k; dec k -> tanh h ->
L), which is the right size for a CPU-cluster engine and keeps every
epoch a single scan + one tiny aggregate. A user who wants the conv
model trains offline with train.py / TorchDistributor and loads the
checkpoint through embed_windows_torch — this operator is the
in-engine path for training ON the cluster's data without torch.

Determinism contract (what makes this testable and resumable):

- **Gradient sums are exact integers.** Each row's gradient vector is
  snapped to the 1e-9 grid (``rint(g * 1e9)`` as int64) INSIDE the
  Arrow batch, partial-summed per batch, and the per-batch partial
  sums reduced by an exact DECIMAL(38,0) groupBy sum. Integer addition
  is associative and commutative, so the epoch gradient is
  bit-identical under ANY partitioning, task order, or cluster size —
  the float-summation nondeterminism that makes distributed SGD
  unreproducible is removed by construction. (The float
  ``treeAggregate`` is the swap-in where last-ulp drift is
  acceptable; the grid is the engine's shared-rounding convention,
  cf. the sketch/quantile operators.)
- **Reparameterization noise is hash-derived.** eps ~ N(0,1) comes
  from splitmix64 of (row uid, epoch, dim) through Box-Muller —
  per-row, per-epoch, engine-reproducible, no RNG state to
  coordinate across executors (the same reason every sampler in this
  repo avoids rand()).
- **Full-batch GD + driver-side AdamW.** One aggregate per epoch; the
  optimizer state (m, v) lives on the driver and is pure elementwise
  float64 math on the exact gradient — deterministic given the
  gradient. Mini-batching at 100 TB = a deterministic hash60 filter
  per step (same machinery as events_hash_sample), trading scans for
  steps; full-batch keeps the oracle-style replay exact and is the
  honest default for an L-BFGS-sized model.

Scale shape at 100 TB: per epoch ONE scan of the window frame (the
parameter vector broadcasts at ~4 KB), a mapInPandas emitting
``n_params + 2`` partial-sum rows PER ARROW BATCH (not per row), and a
groupBy over ~500 keys — shuffle bytes per epoch are
O(batches x params), independent of row count. The collect is the
~500-row parameter vector. No driver-side loop touches data.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000_000  # 1e-9 gradient grid (int64-snapped)
# loss accumulators ride the same aggregate as two pseudo-parameters
_IDX_RLOSS = -1
_IDX_KL = -2
_IDX_COUNT = -3


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(
        np.uint64
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(
        np.uint64
    )
    return x ^ (x >> np.uint64(31))


def _eps_for(uid: np.ndarray, epoch: int, k: int) -> np.ndarray:
    """N(0,1) noise [B, k] from splitmix64(uid, epoch, dim) through
    Box-Muller — reproducible on any executor, no RNG state."""
    B = uid.shape[0]
    d = np.arange(k, dtype=np.uint64)[None, :]
    # epoch mix precomputed in Python ints (explicit mod-2^64 — numpy
    # scalar uint64 multiply warns on the intended wraparound)
    epoch_mix = np.uint64((epoch * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        base = _splitmix64(
            uid.astype(np.uint64)[:, None]
            ^ epoch_mix
            ^ (d * np.uint64(0xD1B54A32D192ED03))
        )
    u1 = (_splitmix64(base) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )
    u2 = (
        _splitmix64(base ^ np.uint64(0xA5A5A5A5A5A5A5A5)) >> np.uint64(11)
    ).astype(np.float64) / float(1 << 53)
    u1 = np.clip(u1, 1e-12, 1.0)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


class VaeParams:
    """Flat float64 parameter vector with named views — the broadcast
    payload (~(2Lh + 3hk + 2h + 2k + L) doubles)."""

    def __init__(self, L: int, h: int, k: int, vec: np.ndarray):
        self.L, self.h, self.k = L, h, k
        self.vec = vec
        o = 0
        self.slices = {}
        for name, shape in self.shapes(L, h, k).items():
            n = int(np.prod(shape))
            self.slices[name] = (o, n, shape)
            o += n
        assert o == vec.shape[0]

    @staticmethod
    def shapes(L: int, h: int, k: int) -> dict[str, tuple]:
        return {
            "W1": (h, L), "b1": (h,),
            "W2": (k, h), "b2": (k,),
            "W3": (k, h), "b3": (k,),
            "W4": (h, k), "b4": (h,),
            "W5": (L, h), "b5": (L,),
        }

    @classmethod
    def n_params(cls, L: int, h: int, k: int) -> int:
        return int(
            sum(np.prod(s) for s in cls.shapes(L, h, k).values())
        )

    @classmethod
    def init(cls, L: int, h: int, k: int, seed: int = 7) -> "VaeParams":
        """Deterministic Glorot-ish init (driver-side, seeded)."""
        rng = np.random.RandomState(seed)
        parts = []
        for name, shape in cls.shapes(L, h, k).items():
            if name.startswith("W"):
                lim = math.sqrt(6.0 / (shape[0] + shape[1]))
                parts.append(rng.uniform(-lim, lim, size=shape).ravel())
            else:
                parts.append(np.zeros(shape))
        return cls(L, h, k, np.concatenate(parts))

    def get(self, name: str) -> np.ndarray:
        o, n, shape = self.slices[name]
        return self.vec[o:o + n].reshape(shape)


def _forward_backward_rows(
    xs: np.ndarray, uid: np.ndarray, p: VaeParams, epoch: int,
    kl_beta: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PER-ROW unnormalized gradients ``[B, n_params]`` (each row is
    d(row's contribution to N*loss)/d(theta); the driver divides the
    exact sum by N) plus per-row r and kl loss contributions. Per-row
    — not batch-summed — because the determinism contract snaps EACH
    ROW's gradient to the grid before the integer sum: rint(a+b) !=
    rint(a)+rint(b), so a batch-level snap would make the total depend
    on Arrow batching and partition boundaries. einsum outer products
    keep it vectorized (B x ~500 doubles per batch)."""
    W1, b1 = p.get("W1"), p.get("b1")
    W2, b2 = p.get("W2"), p.get("b2")
    W3, b3 = p.get("W3"), p.get("b3")
    W4, b4 = p.get("W4"), p.get("b4")
    W5, b5 = p.get("W5"), p.get("b5")
    L, k = p.L, p.k

    h1 = np.tanh(xs @ W1.T + b1)
    mu = h1 @ W2.T + b2
    lv_pre = h1 @ W3.T + b3
    lv = np.clip(lv_pre, -30.0, 30.0)
    std = np.exp(0.5 * lv)
    eps = _eps_for(uid, epoch, k)
    z = mu + eps * std
    h2 = np.tanh(z @ W4.T + b4)
    xh = h2 @ W5.T + b5

    # reference criterion (lit.py:84-92): r = mean over ALL elements,
    # kl = mean over rows of -0.5 * sum_dims(...)
    diff = xh - xs
    r_row = np.sum(diff * diff, axis=1) / L  # row contribution * N
    kl_row = -0.5 * np.sum(1.0 + lv - mu * mu - np.exp(lv), axis=1)

    dxh = 2.0 * diff / L
    dh2 = dxh @ W5
    da2 = dh2 * (1.0 - h2 * h2)
    dz = da2 @ W4
    dmu = dz + kl_beta * mu
    dlv = dz * eps * 0.5 * std + kl_beta * 0.5 * (np.exp(lv) - 1.0)
    # the clamp is NOT identity where it saturates: d(clip)/d(lv_pre)
    # is 0 outside [-30, 30] (inclusive boundary passes, torch.clamp
    # convention), so zero those rows' dlv before it backpropagates
    # into W3/b3 and dh1
    dlv = np.where((lv_pre >= -30.0) & (lv_pre <= 30.0), dlv, 0.0)
    dh1 = dmu @ W2 + dlv @ W3
    da1 = dh1 * (1.0 - h1 * h1)

    B = xs.shape[0]
    grads = np.concatenate([
        np.einsum("bh,bl->bhl", da1, xs).reshape(B, -1),
        da1,
        np.einsum("bk,bh->bkh", dmu, h1).reshape(B, -1),
        dmu,
        np.einsum("bk,bh->bkh", dlv, h1).reshape(B, -1),
        dlv,
        np.einsum("bh,bk->bhk", da2, z).reshape(B, -1),
        da2,
        np.einsum("bl,bh->blh", dxh, h2).reshape(B, -1),
        dxh,
    ], axis=1)
    return grads, r_row, kl_row


def _forward_backward(
    xs: np.ndarray, uid: np.ndarray, p: VaeParams, epoch: int,
    kl_beta: float,
) -> tuple[np.ndarray, float, float]:
    """Batch-summed (unsnapped) gradient — the finite-difference /
    replay convenience wrapper over the per-row kernel."""
    grads, r_row, kl_row = _forward_backward_rows(
        xs, uid, p, epoch, kl_beta
    )
    return grads.sum(axis=0), float(r_row.sum()), float(kl_row.sum())


def minibatch_filter(
    uid: "F.Column | str", step: int, frac: float
) -> "F.Column":
    """Deterministic per-step mini-batch membership: splitmix64-style
    hash of (uid, step) against a ppm threshold — same machinery as
    the engine's hash60 samplers (reproducible across runs, engines,
    and cluster sizes; no rand()). Pure JVM expression, so the scan
    filter prunes rows BEFORE the gradient UDF — a step touches
    ~frac of the corpus I/O, not all of it."""
    ppm = int(round(frac * 1_000_000))
    h = F.xxhash64(F.col(uid) if isinstance(uid, str) else uid,
                   F.lit(int(step)))
    return F.pmod(h, F.lit(1_000_000)) < F.lit(ppm)


def _grad_epoch(
    windows: DataFrame, p: VaeParams, epoch: int, kl_beta: float,
    xs_col: str, uid_col: str,
) -> tuple[np.ndarray, float, float, int]:
    """One distributed epoch-gradient: snap per-row grads to the 1e-9
    grid inside each Arrow batch (int64 partial sums, exact), reduce
    with a DECIMAL(38,0) groupBy — bit-identical at any partitioning."""
    vec = p.vec.copy()
    L, h, k = p.L, p.h, p.k

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pp = VaeParams(L, h, k, vec)
        for pdf in batches:
            if not len(pdf):
                continue
            xs = np.stack(pdf[xs_col].to_numpy()).astype(np.float64)
            uid = pdf[uid_col].to_numpy().astype(np.int64)
            grads, r_row, kl_row = _forward_backward_rows(
                xs, uid, pp, epoch, kl_beta
            )
            # snap PER ROW, then sum exact int64 — per-row grads are
            # batching-invariant (each depends only on its row + the
            # broadcast params), so these partial sums reduce to the
            # same total under any partitioning
            snapped = np.rint(grads * GRID).astype(np.int64).sum(axis=0)
            idx = np.concatenate([
                np.arange(snapped.shape[0], dtype=np.int64),
                np.array([_IDX_RLOSS, _IDX_KL, _IDX_COUNT], np.int64),
            ])
            val = np.concatenate([
                snapped,
                np.array([
                    np.rint(r_row * GRID).astype(np.int64).sum(),
                    np.rint(kl_row * GRID).astype(np.int64).sum(),
                    len(pdf) * GRID,
                ], np.int64),
            ])
            yield pd.DataFrame({"idx": idx, "g": val})

    sums = (
        windows.select(uid_col, xs_col)
        .mapInPandas(gen, schema="idx long, g long")
        .groupBy("idx")
        .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    out = np.zeros(vec.shape[0])
    r_tot = kl_tot = 0.0
    n_rows = 0
    for row in sums:
        i, s = row["idx"], float(row["s"]) / GRID
        if i == _IDX_RLOSS:
            r_tot = s
        elif i == _IDX_KL:
            kl_tot = s
        elif i == _IDX_COUNT:
            n_rows = int(round(s))
        else:
            out[i] = s
    return out, r_tot, kl_tot, n_rows


def train_vae(
    windows: DataFrame,
    xs_col: str = "xs",
    uid_col: str = "uid",
    L: int = 8,
    hidden: int = 16,
    k: int = 4,
    epochs: int = 5,
    lr: float = 1e-2,
    kl_beta: float = 5e-4,
    weight_decay: float = 1e-4,
    seed: int = 7,
    minibatch_frac: float | None = None,
) -> tuple[VaeParams, list[dict]]:
    """Fit the MLP VAE by full-batch AdamW over ``windows``
    (one scan + one ~500-key aggregate per epoch; kl_beta/weight_decay
    defaults are the reference's train.py:67-68 values). Returns the
    trained parameters and the per-epoch loss history (r, kl, loss —
    the reference's loss_r / -loss_kl / loss log dict).

    ``minibatch_frac`` switches each step to a deterministic
    hash-selected subset (:func:`minibatch_filter`) — the 100 TB mode
    where a full-corpus scan per step is too much I/O. The step's
    member set is a pure function of (uid, step), so runs remain
    bit-reproducible; the loss history then reports the per-step
    subset's loss."""
    p = VaeParams.init(L, hidden, k, seed)
    m = np.zeros_like(p.vec)
    v = np.zeros_like(p.vec)
    b1, b2, eps_o = 0.9, 0.999, 1e-8
    history = []
    for ep in range(epochs):
        step_df = windows
        if minibatch_frac is not None:
            step_df = windows.filter(
                minibatch_filter(uid_col, ep, minibatch_frac)
            )
        grad, r_tot, kl_tot, n = _grad_epoch(
            step_df, p, ep, kl_beta, xs_col, uid_col
        )
        if n == 0:
            raise ValueError(
                "train_vae: empty window frame"
                if minibatch_frac is None
                else f"train_vae: step {ep} mini-batch selected 0 rows "
                     f"(frac={minibatch_frac}); raise the fraction"
            )
        g = grad / n
        r = r_tot / n
        kl = kl_tot / n
        history.append(
            {"epoch": ep, "loss_r": r, "loss_kl": kl,
             "loss": r + kl_beta * kl}
        )
        # AdamW (decoupled weight decay), driver-side, deterministic
        t = ep + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** t)
        vh = v / (1 - b2 ** t)
        p.vec = p.vec - lr * (
            mh / (np.sqrt(vh) + eps_o) + weight_decay * p.vec
        )
    return p, history


def vae_encode(
    windows: DataFrame,
    p: VaeParams,
    xs_col: str = "xs",
    keep_cols: tuple[str, ...] = ("symbol", "window_id"),
) -> DataFrame:
    """Deterministic posterior-mean embedding (mu head — the
    reference's test.ipynb inference uses encode()[0] too): the M7
    batch-embed slot served by the in-engine-trained model, no torch."""
    vec = p.vec.copy()
    L, h, k = p.L, p.h, p.k

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pp = VaeParams(L, h, k, vec)
        W1, bb1 = pp.get("W1"), pp.get("b1")
        W2, bb2 = pp.get("W2"), pp.get("b2")
        for pdf in batches:
            if not len(pdf):
                continue
            xs = np.stack(pdf[xs_col].to_numpy()).astype(np.float64)
            mu = np.tanh(xs @ W1.T + bb1) @ W2.T + bb2
            out = {c: pdf[c] for c in keep_cols}
            out["emb"] = list(mu)
            yield pd.DataFrame(out)

    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in windows.schema.fields
        if f.name in keep_cols
    )
    return windows.mapInPandas(
        gen, schema=f"{keep_schema}, emb array<double>"
    )
