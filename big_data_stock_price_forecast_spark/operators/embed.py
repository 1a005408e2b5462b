"""Batch window→latent embedding (reference M7: iterate a DataLoader,
``vae.encode(batch)``, concatenate latents — notebooks/test.ipynb cells
13-14), restated as an Arrow ``mapInPandas`` pass over the windows
table.

The reference's encoder is a trained conv VAE; training is out of
engine scope (SURVEY.md §2.8), so the in-engine embedder is a
deterministic linear codec with the same *query shape* (fixed-dim
latent per z-scored window): the first ``k`` DCT-II coefficients. Like
the VAE, it concentrates a smooth series' energy into few coefficients;
unlike the VAE it needs no weights, is reproducible everywhere, and is
SQL-expressible for the oracle. A torch checkpoint could be dropped
into ``run()`` unchanged — that is the point of the mapInPandas
boundary: executor-side batch inference, Arrow in, Arrow out.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def dct_basis(L: int, k: int) -> np.ndarray:
    """Orthonormal DCT-II analysis rows: basis[d, i] =
    s_d * cos(pi * d * (i + 0.5) / L), s_0 = sqrt(1/L), s_d = sqrt(2/L).
    Computed with ``math`` per element — deterministic literal-for-
    literal with the SQL oracle's expression."""
    rows = []
    for d in range(k):
        s = math.sqrt((1.0 if d == 0 else 2.0) / L)
        rows.append(
            [s * math.cos(math.pi * d * (i + 0.5) / L) for i in range(L)]
        )
    return np.array(rows, dtype=np.float64)


def embed_windows(
    windows: DataFrame,
    L: int,
    k: int = 4,
    xs_col: str = "xs",
    keep_cols: tuple[str, ...] = ("symbol", "window_id"),
) -> DataFrame:
    """windows(…, xs: array<double>[L]) → (…, emb: array<double>[k]).

    One matmul per Arrow batch on the executor — the exact slot a torch
    ``encoder(batch)`` occupies on a GPU cluster, with batch size
    governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    basis_t = dct_basis(L, k).T  # L x k

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = np.stack(pdf[xs_col].to_numpy())  # B x L
            emb = xs @ basis_t  # B x k
            out = {c: pdf[c] for c in keep_cols}
            out["emb"] = list(emb)
            yield pd.DataFrame(out)

    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in windows.schema.fields
        if f.name in keep_cols
    )
    return windows.mapInPandas(
        run, schema=f"{keep_schema}, emb array<double>"
    )


def embed_windows_torch(
    windows: DataFrame,
    state_dict_path: str,
    encoder_factory,
    k: int,
    xs_col: str = "xs",
    keep_cols: tuple[str, ...] = ("symbol", "window_id"),
) -> DataFrame:
    """The reference's actual checkpoint-inference flow (M1/M7,
    notebooks/test.ipynb cells 12-14: load state dict, ``encode`` each
    batch) in the same mapInPandas slot as :func:`embed_windows`.

    ``encoder_factory()`` must return an un-initialized torch module
    whose ``encode(Tensor[B, L]) -> Tensor[B, k]`` matches the
    checkpoint; the state dict loads ONCE PER PYTHON WORKER (inside the
    generator, before the batch loop), not per batch — on a GPU cluster
    this is where the model pins to the executor's device.

    torch is optional (out of engine scope, SURVEY.md §2.8): without it
    this raises NotImplementedError at call time, and the DCT codec in
    :func:`embed_windows` remains the deterministic, oracle-checkable
    stand-in with the identical query shape.
    """
    try:
        import torch
    except ImportError as exc:  # pragma: no cover - env without torch
        raise NotImplementedError(
            "embed_windows_torch needs the optional torch package; use "
            "embed_windows (DCT codec) for the torch-free engine path"
        ) from exc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = encoder_factory()
        model.load_state_dict(
            torch.load(state_dict_path, map_location="cpu")
        )
        model.eval()
        with torch.no_grad():
            for pdf in batches:
                xs = np.stack(pdf[xs_col].to_numpy())
                emb = (
                    model.encode(torch.from_numpy(xs).float())
                    .cpu()
                    .numpy()
                    .astype(np.float64)
                )
                out = {c: pdf[c] for c in keep_cols}
                out["emb"] = list(emb)
                yield pd.DataFrame(out)

    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in windows.schema.fields
        if f.name in keep_cols
    )
    return windows.mapInPandas(
        run, schema=f"{keep_schema}, emb array<double>"
    )
