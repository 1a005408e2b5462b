"""MLlib pipeline embedder (SURVEY.md §2.8 M1 stand-in + §2.1 S9).

The reference encodes windows with a trained conv VAE and persists
top-k checkpoints (train.py:85-91), reloading them for inference
(notebooks/test.ipynb cell 12). In-engine, the MLlib-native analog is a
fitted ``PipelineModel`` — StandardScaler (the dataset-level second
normalization knob the per-window z-score doesn't cover) into PCA
(k-dim linear latent, the same query shape as mu/logvar) — with
``save``/``load`` as the checkpoint story: a distributed fit, a
persisted model artifact, and executor-side transform at any scale.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import PCA, StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_feature_frame(windows: DataFrame, xs_col: str = "xs") -> DataFrame:
    """windows(…, xs: array<double>) -> adds ``fv: Vector`` for MLlib."""
    return windows.withColumn("fv", array_to_vector(F.col(xs_col)))


def embedding_pipeline(k: int = 4) -> Pipeline:
    """StandardScaler(withMean) -> PCA(k) over the window vectors."""
    scaler = StandardScaler(
        inputCol="fv", outputCol="scaled", withMean=True, withStd=True
    )
    pca = PCA(k=k, inputCol="scaled", outputCol="latent")
    return Pipeline(stages=[scaler, pca])


def fit_embedder(windows: DataFrame, k: int = 4) -> PipelineModel:
    return embedding_pipeline(k).fit(window_feature_frame(windows))


def transform_windows(
    model: PipelineModel,
    windows: DataFrame,
    keep_cols: tuple[str, ...] = ("symbol", "window_id"),
) -> DataFrame:
    """(keep_cols…, emb: array<double>[k]) via the fitted pipeline."""
    out = model.transform(window_feature_frame(windows))
    return out.select(
        *keep_cols, vector_to_array(F.col("latent")).alias("emb")
    )


def save_embedder(model: PipelineModel, path: str) -> None:
    """S9 checkpoint sink: persist the fitted pipeline artifact."""
    model.write().overwrite().save(path)


def load_embedder(path: str) -> PipelineModel:
    """S9 checkpoint source."""
    return PipelineModel.load(path)
