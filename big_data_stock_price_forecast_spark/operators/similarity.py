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


def sign_planes(
    n_planes: int, dim: int, band: int = 0
) -> list[list[float]]:
    """Deterministic ±1.0 hyperplane matrix from md5 parity of "k:j"
    (band 0) / "b{band}:k:j" — independent plane sets per band."""
    prefix = "" if band == 0 else f"b{band}:"
    return [
        [
            1.0
            if hashlib.md5(f"{prefix}{k}:{j}".encode()).digest()[0] % 2 == 0
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


def _seq_norm(m):
    """Sequential-over-dims sum of squares == the SQL fold."""
    import numpy as np

    n2 = np.zeros(len(m))
    for j in range(m.shape[1]):
        n2 = n2 + m[:, j] * m[:, j]
    return np.sqrt(n2)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = ANN_PLANES,
    n_bands: int = 4,
) -> DataFrame:
    """Cosine near-duplicate pairs, multi-band sign-LSH blocked: a pair
    (i < j) is a candidate when the two vectors share a bucket in ANY of
    ``n_bands`` independent plane sets; candidates scoring
    cos >= threshold are kept (banded OR raises recall:
    1-(1-p^planes)^bands for per-plane agreement p = 1 - theta/pi, e.g.
    ~0.86 for cos 0.9 at 6 planes x 4 bands).

    Physical strategy — fully distributed, nothing touches the driver:
    one Arrow pass per band assigns buckets, the union exchange hashes
    on (band, bucket), each bucket's pair block is a dense NumPy matmul
    inside ``applyInPandas``, and a final dropDuplicates collapses pairs
    co-bucketed in several bands (their scores are bitwise identical).
    Work per task is O(bucket²); at scale ``n_planes`` grows like
    log2(n / target_bucket) so bucket size — and with it task memory —
    stays constant while tasks scale out linearly, and ``n_bands``
    multiplies recall at a linear cost factor.

    The per-pair score accumulates SEQUENTIALLY OVER DIMENSIONS
    (vectorized over pairs), i.e. ``c = ((0 + a1*b1) + a2*b2) + ...`` —
    bitwise-identical to the engine-independent sequential fold the
    DuckDB oracle computes (the oracle mirrors the exact same buckets,
    possible because the plane dots are exact ±1.0 sums).
    """
    import numpy as np
    import pandas as pd

    src = emb.repartition(F.col(id_col))
    per_band = [
        with_sign_bucket_arrow(
            src, id_col, vec_col, n_planes, dim, band
        ).withColumn("band", F.lit(band))
        for band in range(n_bands)
    ]
    bucketed = per_band[0]
    for b in per_band[1:]:
        bucketed = bucketed.unionByName(b)

    def pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy()).astype("float64")
        vn = m / _seq_norm(m)[:, None]
        c = np.zeros((len(vn), len(vn)))
        for j in range(m.shape[1]):
            c = c + vn[:, j][:, None] * vn[None, :, j]
        ii, jj = np.nonzero(
            (c >= threshold) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame(
            {"id_i": ids[ii], "id_j": ids[jj], "cos": c[ii, jj]}
        )

    return bucketed.groupBy("band", "bucket").applyInPandas(
        pairs, schema="id_i long, id_j long, cos double"
    ).dropDuplicates(["id_i", "id_j"])


def with_sign_bucket_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = ANN_PLANES,
    dim: int = 64,
    band: int = 0,
) -> DataFrame:
    """(id, v, bucket) with the sign-LSH bucket computed in one Arrow
    pass: the per-plane dot accumulates SEQUENTIALLY OVER DIMENSIONS
    (vectorized over rows), the same left-associated order as the
    codegen expression in :func:`sign_lsh_bucket` and the DuckDB
    oracle's fold — bitwise-identical signs, none of the
    (planes x dim)-term codegen compile cost."""
    import numpy as np
    import pandas as pd

    pl = np.array(sign_planes(n_planes, dim, band))  # k x dim

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


def binary_quantize(vec: Column, dim: int = 64) -> Column:
    """1-bit-per-dimension binary quantization: bit ``d`` of the packed
    64-bit code is set when ``vec[d] > 0``. A 64-dim float64 vector
    (512 B) compresses to ONE long (8 B) — the 64x shrink that makes
    exhaustive candidate generation affordable at corpus scale (the
    whole-corpus code column of a 10^9-vector index is 8 GB, a
    broadcast-side or cached-scan size; the float vectors never move).
    Pure integer expression, engine-exact: the sign rule is strict
    ``> 0`` on both engines and bit 63 is the long's sign bit (shift
    semantics, no overflow check applies)."""
    code = F.lit(0).cast("long")
    for d in range(dim):
        code = code.bitwiseOR(
            F.when(
                F.element_at(vec, d + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), d),
            ).otherwise(F.lit(0).cast("long"))
        )
    return code


def bq_hamming_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    rerank: int = 32,
    radius: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Two-stage binary-quantization ANN (the modern low-memory scale
    pattern, cf. FAISS IndexBinaryFlat + refine / Cohere int1 embeddings):

    1. **Hamming scan** — every corpus code XORs against each broadcast
       query code; ``bit_count`` gives the Hamming distance. The scan
       frame carries ONLY ``(id, code)`` (16 B/row): the float vectors
       are projected away before the join, so the full-corpus pass
       touches 64x less data than a float cosine scan.
    2. **Radius cut** — candidates with ``hamming > radius`` drop
       map-side, BEFORE the per-query top-R shuffle. For random unit
       vectors E[hamming] = dim/2 with sd = 4 at dim 64, so
       ``radius = dim/2 - 1`` discards the unrelated half of the corpus
       while true neighbors (hamming << 32) always survive — the skinny
       shuffle is the only exchange and it is half-corpus-sized at
       worst, candidate-sized in practice.
    3. **Exact re-rank** — the per-query top-``rerank`` Hamming
       survivors (a queries x rerank frame, tiny by construction) join
       back to the float vectors — broadcast of the CANDIDATE list into
       the corpus scan, never the reverse — and exact cosine
       (sequential fold, bitwise engine-equal) picks the final top-k.

    Ties break by id at both stages, so the result is deterministic and
    oracle-exact. ``radius=None`` (default) derives ``dim // 2 - 1`` so
    the cut tracks a caller-supplied ``dim`` — a hardcoded 31 would
    silently over-prune at dim 128 (E[hamming] = 64 there)."""
    from pyspark.sql import Window

    if radius is None:
        radius = dim // 2 - 1

    from ..functions.distance import dot_fixed, l2_norm_fixed

    codes = emb.select(
        F.col(id_col).alias("id"),
        binary_quantize(F.col(vec_col), dim).alias("code"),
    )
    qcodes = queries.select(
        F.col(id_col).alias("q_id"),
        binary_quantize(F.col(vec_col), dim).alias("qcode"),
    )
    ham = F.bit_count(F.col("code").bitwiseXOR(F.col("qcode")))
    cand = (
        codes.crossJoin(F.broadcast(qcodes))
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", ham.alias("hamming"))
        .filter(F.col("hamming") <= radius)
    )
    wh = Window.partitionBy("q_id").orderBy(
        F.col("hamming").asc(), F.col("id").asc()
    )
    topr = cand.withColumn("rr", F.row_number().over(wh)).filter(
        F.col("rr") <= rerank
    )
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    qvecs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    cos = dot_fixed(F.col("v"), F.col("qv"), dim) / (
        l2_norm_fixed(F.col("v"), dim) * l2_norm_fixed(F.col("qv"), dim)
    )
    rer = (
        vecs.join(F.broadcast(topr.select("q_id", "id", "hamming")), "id")
        .join(F.broadcast(qvecs), "q_id")
        .select("q_id", "id", "hamming", cos.alias("cos"))
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return rer.withColumn(
        "rank", F.row_number().over(wk).cast("int")
    ).filter(F.col("rank") <= k)


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
