"""Vector-similarity operators over embedding columns.

- ``embedding_near_dup_pairs``: exact pairwise cosine >= threshold
  (quadratic baseline; at scale run it per sign-LSH bucket).
- ``sign_lsh_bucket`` / ``ann_lsh_topk``: random-hyperplane LSH where
  each plane is a deterministic ±1 vector (derived from md5 parity, so
  any engine reproduces the same buckets). Bucketing reduces ANN search
  to an equi-join on the bucket id; the per-bucket candidate set is
  ranked by exact cosine. Plane count tunes bucket size: ~n/2^planes
  vectors per bucket, so planes ≈ log2(n / target_bucket) at scale.

Float determinism: every dot product is a sequential left fold
(``aggregate`` seed 0.0), the same op order DuckDB's ``list_reduce``
uses, so scores are bitwise reproducible across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANN_PLANES = 6


def sign_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1.0 hyperplane matrix from md5 parity of "k:j"."""
    return [
        [
            1.0
            if hashlib.md5(f"{k}:{j}".encode()).digest()[0] % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for k in range(n_planes)
    ]


def sign_lsh_bucket(
    vec: Column, n_planes: int = ANN_PLANES, dim: int = 64
) -> Column:
    """Integer bucket id: bit k set when plane_k . vec >= 0. Multiplying
    by ±1.0 is exact, and the fold is sequential, so the bucket id is
    engine-independent."""
    planes = sign_planes(n_planes, dim)
    bucket = F.lit(0)
    for k, row in enumerate(planes):
        # flat left-associated sum == the sequential fold, but codegen
        d = F.element_at(vec, 1) * F.lit(row[0])
        for j in range(1, dim):
            d = d + F.element_at(vec, j + 1) * F.lit(row[j])
        bucket = bucket + F.when(d >= 0, F.lit(1 << k)).otherwise(F.lit(0))
    return bucket


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.4,
    dim: int = 64,
) -> DataFrame:
    """Exact cosine near-duplicate pairs (i < j, cos >= threshold).

    Physical strategy: broadcast matmul. A pure-DataFrame pair join
    evaluates an interpreted 64-term dot inside a nested-loop join
    condition — row-at-a-time and ~30x too slow — so this is the
    documented Arrow escape hatch: the (small) right matrix ships to
    every task, and each Arrow batch of left rows computes a
    batch x n score block in NumPy. The accumulation loops run
    SEQUENTIALLY OVER DIMENSIONS (vectorized over pairs), i.e.
    ``c = ((0 + a1*b1) + a2*b2) + ...`` per pair — bitwise-identical to
    the engine-independent sequential fold the DuckDB oracle computes.
    At 100 TB, block the pair space with ``sign_lsh_bucket`` first and
    run this kernel per bucket; the all-pairs form is the exact
    baseline.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    def _seq_norm(m: "np.ndarray") -> "np.ndarray":
        # sequential-over-dims sum of squares == the SQL fold
        n2 = np.zeros(len(m))
        for j in range(m.shape[1]):
            n2 = n2 + m[:, j] * m[:, j]
        return np.sqrt(n2)

    right = emb.select(id_col, vec_col).toPandas()
    b_ids = right[id_col].to_numpy()
    bm = np.stack(right[vec_col].to_numpy()).astype("float64")
    bn = bm / _seq_norm(bm)[:, None]

    schema = StructType(
        [
            StructField("id_i", LongType()),
            StructField("id_j", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            am = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            an = am / _seq_norm(am)[:, None]
            c = np.zeros((len(an), len(bn)))
            for j in range(am.shape[1]):
                c = c + an[:, j][:, None] * bn[None, :, j]
            ii, jj = np.nonzero(
                (c >= threshold) & (ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {"id_i": ids[ii], "id_j": b_ids[jj], "cos": c[ii, jj]}
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def with_sign_bucket_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = ANN_PLANES,
    dim: int = 64,
) -> DataFrame:
    """(id, v, bucket) with the sign-LSH bucket computed in one Arrow
    pass: the per-plane dot accumulates SEQUENTIALLY OVER DIMENSIONS
    (vectorized over rows), the same left-associated order as the
    codegen expression in :func:`sign_lsh_bucket` and the DuckDB
    oracle's fold — bitwise-identical signs, none of the
    (planes x dim)-term codegen compile cost."""
    import numpy as np
    import pandas as pd

    pl = np.array(sign_planes(n_planes, dim))  # k x dim

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            d = np.zeros((len(vm), n_planes))
            for j in range(dim):
                d = d + vm[:, j][:, None] * pl[None, :, j]
            bucket = (
                (d >= 0).astype("int64")
                * (1 << np.arange(n_planes, dtype="int64"))[None, :]
            ).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "v": pdf[vec_col],
                    "bucket": bucket.astype("int64"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema="id long, v array<double>, bucket long"
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_planes: int = ANN_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k neighbors: candidates share the query's sign-
    LSH bucket; exact cosine ranks within the bucket. Equi-join on the
    bucket id — shuffle by a single int key, no cross product."""
    # repartition by id first: a single-file corpus is one input split,
    # which would run every hyperplane dot on one core
    bucketed = with_sign_bucket_arrow(
        emb.repartition(F.col(id_col)), id_col, vec_col, n_planes, dim
    )
    qb = with_sign_bucket_arrow(
        queries, id_col, vec_col, n_planes, dim
    ).withColumnsRenamed({"id": "q_id", "v": "qv"})
    from pyspark.sql import Window

    from ..functions.distance import dot_fixed, l2_norm_fixed

    cos = dot_fixed(F.col("v"), F.col("qv"), dim) / (
        l2_norm_fixed(F.col("v"), dim) * l2_norm_fixed(F.col("qv"), dim)
    )
    cand = (
        bucketed.join(qb, "bucket")
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return cand.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)
