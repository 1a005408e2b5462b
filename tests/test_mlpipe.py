"""MLlib pipeline embedder: fit/transform shape, checkpoint
save/load roundtrip (S9), agreement with a numpy PCA reference."""

from __future__ import annotations

import numpy as np

from big_data_stock_price_forecast_spark.operators.mlpipe import (
    fit_embedder,
    load_embedder,
    save_embedder,
    transform_windows,
)


def _windows_df(spark, n=300, L=8):
    rng = np.random.default_rng(11)
    # low-rank structure so PCA has something real to find
    comps = rng.normal(0, 1, (3, L))
    rows = []
    for i in range(n):
        mix = rng.normal(0, [3.0, 1.5, 0.5])
        xs = mix @ comps + rng.normal(0, 0.05, L)
        rows.append((i % 4, i, [float(v) for v in xs]))
    return spark.createDataFrame(
        rows, "symbol int, window_id int, xs array<double>"
    )


def test_fit_transform_shape_and_checkpoint_roundtrip(spark, tmp_path):
    w = _windows_df(spark)
    model = fit_embedder(w, k=3)
    emb = transform_windows(model, w).collect()
    assert len(emb) == 300 and all(len(r["emb"]) == 3 for r in emb)

    path = str(tmp_path / "embedder")
    save_embedder(model, path)
    reloaded = load_embedder(path)
    emb2 = {r["window_id"]: r["emb"] for r in transform_windows(reloaded, w).collect()}
    for r in emb:
        np.testing.assert_allclose(emb2[r["window_id"]], r["emb"], atol=0)


def test_pca_matches_numpy_reference(spark):
    """MLlib latents equal numpy PCA of the standardized matrix up to
    per-component sign."""
    w = _windows_df(spark)
    model = fit_embedder(w, k=3)
    got = (
        transform_windows(model, w)
        .orderBy("window_id")
        .select("emb")
        .toPandas()["emb"]
    )
    got = np.stack(got.to_numpy())

    xs = np.stack(
        w.orderBy("window_id").toPandas()["xs"].to_numpy()
    ).astype("float64")
    std = xs.std(axis=0, ddof=1)  # MLlib StandardScaler uses sample std
    z = (xs - xs.mean(axis=0)) / std
    # principal axes of the (sample) covariance
    cov = np.cov(z, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    ref = z @ vecs[:, order]
    for j in range(3):
        c = np.corrcoef(got[:, j], ref[:, j])[0, 1]
        assert abs(abs(c) - 1.0) < 1e-6, f"component {j}: |corr|={abs(c)}"


def test_variance_concentrates_in_leading_components(spark):
    model = fit_embedder(_windows_df(spark), k=3)
    ev = model.stages[-1].explainedVariance.toArray()
    assert ev[0] >= ev[1] >= ev[2] > 0
    assert ev.sum() > 0.9  # 3 planted factors dominate


def test_embed_windows_torch_gate(spark):
    """The torch-checkpoint slot must fail loudly without torch and
    run the checkpoint when it exists."""
    import pytest

    from big_data_stock_price_forecast_spark.operators.embed import (
        embed_windows_torch,
    )

    df = spark.createDataFrame(
        [(1, i, [float(j) for j in range(8)]) for i in range(4)],
        "symbol long, window_id long, xs array<double>",
    )
    try:
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch"):
            embed_windows_torch(df, "/tmp/none.pt", lambda: None, k=4)
        return
    # torch available: run a linear encoder checkpoint end-to-end
    import tempfile

    import torch.nn as nn

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(8, 4, bias=False)

        def encode(self, x):
            return self.lin(x)

    m = Enc()
    path = tempfile.mktemp(suffix=".pt")
    torch.save(m.state_dict(), path)
    out = embed_windows_torch(df, path, Enc, k=4).collect()
    assert len(out) == 4 and len(out[0]["emb"]) == 4
    # the checkpoint must actually LOAD on the worker (not a fresh
    # random init): emb == xs @ W.T for the saved weight matrix
    import numpy as np

    w = m.lin.weight.detach().numpy()
    xs = np.arange(8, dtype=np.float32)
    expect = (xs @ w.T).astype(np.float64)
    got = np.array(sorted(out, key=lambda r: r["window_id"])[0]["emb"])
    assert np.allclose(got, expect, atol=1e-6)
