"""k-nearest-neighbor similarity join (SURVEY.md §2.3 J2 + §2.5 W10).

Reference: brute-force ``torch.topk(torch.cdist(train_emb, q), k)``
(notebooks/test.ipynb cells 17, 21) under L1 / L2 / cosine metrics.

Physical strategy:
- ``knn_bruteforce`` — exact. Broadcast the (small) query set against
  the (large) vector store: a broadcast nested-loop join with the
  distance as a sequential-fold expression (see
  plans/registry.py _knn_query for the measured fold-vs-flat-codegen
  trade), then per-query top-k via ``row_number``. Spark ≥3.5's ``InferWindowGroupLimit`` pushes the
  rank filter into the sort, so each partition keeps only k candidates
  per query (partial top-k map-side) — no global sort of N·Q rows.
  Right side stays partitioned: scales linearly in vectors × queries
  with NO shuffle of the vector store.
- ``knn_lsh`` — approximate scale path (README.md:155's "optimized
  K-NN" future-work): MLlib BucketedRandomProjectionLSH; cosine is
  served by L2 over L2-normalized vectors (standard equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cos_sim, dist_l1, dist_l2

METRICS = {"l1": dist_l1, "l2": dist_l2, "cosine": cos_sim}


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "vec",
    id_col: str = "vec_id",
    query_vec_col: str = "q_vec",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact top-k per query. Returns
    (q_id, vec_id, dist, rank) — for cosine, ``dist`` is similarity and
    ranking is descending. Ties break on vec_id ascending for
    determinism.
    """
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {sorted(METRICS)}")
    d = METRICS[metric](F.col(vec_col), F.col(query_vec_col)).alias("dist")
    joined = vectors.join(F.broadcast(queries)).select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("vec_id"),
        d,
    )
    order = (
        [F.col("dist").desc(), F.col("vec_id").asc()]
        if metric == "cosine"
        else [F.col("dist").asc(), F.col("vec_id").asc()]
    )
    w = Window.partitionBy("q_id").orderBy(*order)
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "vec",
    id_col: str = "vec_id",
    query_vec_col: str = "q_vec",
    query_id_col: str = "q_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH (L2). For
    ``metric='cosine'`` both sides are L2-normalized first, so L2-NN
    order equals cosine-NN order. Same output schema as brute force;
    ``dist`` is the true (post-verify) distance on candidate pairs.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    if metric == "cosine":
        norm = lambda c: F.transform(  # noqa: E731
            c, lambda v: v / F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))
        )
        vectors = vectors.withColumn(vec_col, norm(F.col(vec_col)))
        queries = queries.withColumn(query_vec_col, norm(F.col(query_vec_col)))
    elif metric != "l2":
        raise ValueError("LSH path supports l2/cosine")

    v = vectors.withColumn("__f", array_to_vector(F.col(vec_col).cast("array<double>")))
    q = queries.withColumn("__f", array_to_vector(F.col(query_vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="__f",
        outputCol="__h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(v)
    pairs = model.approxSimilarityJoin(
        model.transform(v), model.transform(q), float("inf"), distCol="dist"
    ).select(
        F.col(f"datasetB.{query_id_col}").alias("q_id"),
        F.col(f"datasetA.{id_col}").alias("vec_id"),
        F.col("dist"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
