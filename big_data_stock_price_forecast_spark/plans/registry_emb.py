"""Embedding / ANN / kNN / window-embedding / multimodal query domain (embeddings table, media payloads).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    AHASH_MAX_DIST,
    BQ_RADIUS,
    BQ_RERANK,
    DataFrame,
    F,
    IVFPQ_NPROBE,
    IVF_CURVE_NPROBES,
    IVF_NPROBE,
    KNN_K,
    KNN_QUERY_MOD,
    MMR_CAND_N,
    MMR_K,
    MMR_LAMBDA,
    MMR_NPROBE,
    MRL_DIM,
    OOD_QUANTILE,
    PQ_ADC_K,
    PQ_DSUB,
    RQ_ORTH_DIMS,
    SQL_FILLED,
    SQL_RES6H,
    SQL_SERIES,
    SparkSession,
    Window,
    _DCT_K,
    _DCT_L,
    _emb,
    _filled,
    _media,
    _pq_assignments,
    _pq_codebook,
    _r6,
    _r6e,
    _rne,
    _sql_anchor_clause,
    _sql_ann_lsh,
    _sql_bq_hamming,
    _sql_dot,
    _sql_ivf_base,
    _sql_knn,
    _sql_l2,
    _sql_norm,
    _sql_r6_wrap,
    _sql_rne,
    _sql_sign_bucket,
    _sql_zz_windows,
    ann_lsh_topk,
    dist_l2_fixed64,
    dist_l2sq,
    embedding_near_dup_pairs,
    hash60,
    math,
    sliding_windows,
    sql_hash60,
    weighted_dist,
)



def _knn_query(spark, sf_dir, metric: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # flat fixed-dim expressions (bitwise-equal to the sequential
    # folds, functions/distance.py) so the corpus x queries pair join
    # stays inside whole-stage codegen — the folds are interpreted
    # per row, the dominant cost of wide pair joins at scale
    # the 5-metric union keeps the SEQUENTIAL-FOLD distance forms on
    # purpose: five 64-dim flat expressions in one query quintuple the
    # whole-stage-codegen compile cost, which dominates this
    # brute-force BASELINE at every measured scale (A/B at sf0.1:
    # fold union 2.5s vs flat union 5.4s warm, while a SINGLE flat
    # expression beats its fold 0.4s vs 0.65s — flat stays in the
    # one-expression hot paths: IVF, decontam, matryoshka, hard
    # negatives). The scale path for k-NN is the IVF/LSH family, not
    # this union.
    from ..functions.distance import cos_sim, dist_l1, dist_l2

    v, qv = F.col("v"), F.col("qv")
    dists = {
        "cosine": lambda: cos_sim(v, qv),
        "l2": lambda: dist_l2(v, qv),
        "l1": lambda: dist_l1(v, qv),
        # the reference's mu/logvar weighting: full weight on the first
        # 32 dims, half on the rest (test.ipynb cell 21 cdist_w_cmp)
        "weighted_l2": lambda: weighted_dist(
            v, qv, split=32, dist=dist_l2
        ),
        "weighted_cosine": lambda: weighted_dist(
            v, qv, split=32, dist=cos_sim
        ),
    }
    dist = dists[metric]()
    cand = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", dist.alias("dist"))
    )
    order = (
        [F.col("dist").desc(), F.col("vec_id").asc()]
        if metric in ("cosine", "weighted_cosine")
        else [F.col("dist").asc(), F.col("vec_id").asc()]
    )
    w = Window.partitionBy("q_id").orderBy(*order)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("q_id", "vec_id", "rank", _r6("dist"))
    )


def q_knn_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_query(spark, sf_dir, "l2")


def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_query(spark, sf_dir, "cosine")


def q_knn_l1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_query(spark, sf_dir, "l1")


def q_knn_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_query(spark, sf_dir, "weighted_l2")


def q_knn_weighted_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_query(spark, sf_dir, "weighted_cosine")


def q_emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("v").alias("pos0", "x"))
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(_r6e(F.avg("x"), "centroid"), F.count(F.lit(1)).alias("n"))
    )


SQL_EMB_CENTROID = f"""
SELECT label, i::INT AS pos,
       {_sql_rne('avg(v[i])', 'centroid')},
       count(*) AS n
FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
     LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
GROUP BY label, pos"""


# --------------------------------------------------------------------------
# embedding near-dup + ANN (embeddings table)
# --------------------------------------------------------------------------

EMB_NEAR_DUP_TAU = 0.4


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=EMB_NEAR_DUP_TAU
    )
    return out.select("id_i", "id_j", _r6("cos"))


def _sql_emb_near_dup(n_bands: int = 4) -> str:
    bands = " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band, {_sql_sign_bucket(b)} AS bucket FROM emb"
        for b in range(n_bands)
    )
    body = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bb AS ({bands}),
n AS (
  SELECT vec_id, band, bucket, list_transform(v, x -> x / nrm) AS vn
  FROM (SELECT vec_id, band, bucket, v, {_sql_norm('v')} AS nrm FROM bb)
),
p AS (
  SELECT DISTINCT a.vec_id AS id_i, b.vec_id AS id_j,
         {_sql_dot('a.vn', 'b.vn')} AS cos
  FROM n a JOIN n b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id
)
SELECT id_i, id_j, cos FROM p WHERE cos >= {EMB_NEAR_DUP_TAU}"""
    return _sql_r6_wrap(body, ["id_i", "id_j"], ["cos"])


SQL_EMB_NEAR_DUP = _sql_emb_near_dup()


def q_emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ann_lsh_topk(emb, queries, k=KNN_K)
    return out.select("q_id", "id", "rank", _r6("cos"))


SQL_EMB_ANN_LSH = _sql_ann_lsh()


def q_emb_sq8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (the standard ANN
    compression step: per-vector min/max range, 255 levels) with
    per-label reconstruction-error stats — the quality gate a pipeline
    runs before switching its similarity index to quantized codes.
    Everything is a JVM array expression (transform + sequential
    aggregate fold, matching the oracle's list_reduce operand order
    bitwise); codes checksum as exact integers, the mean absolute
    error goes through shared rounding."""
    emb = _emb(spark, sf_dir)
    mn = F.array_min("v")
    sc = (F.array_max("v") - mn) / F.lit(255.0)
    code = lambda x: F.floor((x - mn) / sc + F.lit(0.5))  # noqa: E731
    err_sum = F.when(sc == 0.0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(
                F.col("v"), lambda x: F.abs(x - (mn + code(x) * sc))
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    code_sum = F.when(sc == 0.0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.transform(F.col("v"), code),
            F.lit(0).cast("long"),
            lambda a, x: a + x.cast("long"),
        )
    )
    per_vec = emb.select(
        "label",
        err_sum.alias("e"),
        code_sum.alias("cs"),
        F.size("v").alias("d"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("cs").alias("code_checksum"),
        _rne(F.avg(F.col("e") / F.col("d")), "mean_abs_err"),
    )


def _sql_emb_sq8() -> str:
    code = "floor((x - mn) / sc + 0.5)"
    body = f"""WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
q AS (
  SELECT vec_id, label, v, list_min(v) AS mn,
         (list_max(v) - list_min(v)) / 255.0 AS sc
  FROM e
),
c AS (
  SELECT label, len(v) AS d,
         CASE WHEN sc = 0 THEN 0.0 ELSE
           list_reduce(list_prepend(0.0, list_transform(v,
             x -> abs(x - (mn + {code} * sc)))), (a, b) -> a + b)
         END AS e,
         CASE WHEN sc = 0 THEN 0 ELSE
           CAST(list_reduce(list_prepend(0.0, list_transform(v,
             x -> {code})), (a, b) -> a + b) AS BIGINT)
         END AS cs
  FROM q
)
SELECT label, count(*) AS n_vecs,
       CAST(sum(cs) AS BIGINT) AS code_checksum,
       avg(e / d) AS mean_abs_err
FROM c GROUP BY 1"""
    return _sql_r6_wrap(
        body, ["label", "n_vecs", "code_checksum"], ["mean_abs_err"]
    )


def q_win_dct_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-embed the windows table through the Arrow mapInPandas
    inference slot (DCT-II codec standing in for the VAE encoder)."""
    from ..operators.embed import embed_windows

    w = sliding_windows(
        _filled(spark, sf_dir).select("symbol", "time_idx", "close"), L=_DCT_L
    )
    out = embed_windows(w, L=_DCT_L, k=_DCT_K)
    return out.select(
        "symbol",
        "window_id",
        *[
            (
                F.floor(F.element_at("emb", d + 1) * 1e6 + F.lit(0.5)) / 1e6
                + F.lit(0.0)
            ).alias(f"e{d}")
            for d in range(_DCT_K)
        ],
    )


def q_win_pca_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib PipelineModel (StandardScaler -> PCA) fitted on the
    windows table, then applied — the M1/M7 checkpointable embedder
    (reference analog: notebooks/test.ipynb cells 12-14, where the
    trained encoder's embedding is likewise a checked artifact).

    Oracle design: an eigensolve is not SQL-expressible and MLlib's
    eigenvector sign/order is indeterminate, so the checked output
    quotients that out. The pipeline runs at FULL rank (k = L): the PCA
    projection is then an orthonormal rotation, so per window
    ``||latent||^2 == ||scaled||^2`` must hold, and the scaler output
    itself is plain per-position mean/stddev_samp aggregates DuckDB
    computes independently. Emitting the scaled coordinates (exact
    StandardScaler check) plus the latent norm (PCA orthonormality +
    transform-plumbing check) makes every column hash-verifiable while
    still exercising the whole fitted PipelineModel. The k<L
    dimensionality-reduction path (and save/load checkpointing) is
    covered by tests/test_mlpipe.py, where sign-normalized comparison
    against a local eigensolve is possible."""
    from pyspark.ml.functions import vector_to_array

    from ..operators.mlpipe import fit_embedder, window_feature_frame

    # localCheckpoint (not persist): the fit runs TWO eager passes
    # (scaler stats, PCA covariance) and the transform a third —
    # without pinning, the whole resample/gap-fill/window lineage
    # recomputes each time. Checkpoint blocks are GC-reclaimed after
    # the query; a persist() would pin them for the session.
    w = sliding_windows(
        _filled(spark, sf_dir).select("symbol", "time_idx", "close"), L=_DCT_L
    ).localCheckpoint(eager=True)
    model = fit_embedder(w, k=_DCT_L)
    out = model.transform(window_feature_frame(w))
    scaled = vector_to_array(F.col("scaled"))
    latent = vector_to_array(F.col("latent"))
    norm2 = F.aggregate(latent, F.lit(0.0), lambda a, x: a + x * x)
    return out.select(
        "symbol",
        "window_id",
        *[
            _rne(F.element_at(scaled, d + 1), f"s{d}", 6)
            for d in range(_DCT_L)
        ],
        _rne(norm2, "latent_norm2", 6),
    )


def _sql_win_pca() -> str:
    """Oracle for q_win_pca_embed: per-position standardization of the
    per-window z-scored arrays (MLlib StandardScaler uses the UNBIASED
    sample std -> stddev_samp) and the rotation-invariant norm."""
    L = _DCT_L
    cases = ",\n         ".join(
        f"max(CASE WHEN i = {d + 1} THEN z END) AS s{d}" for d in range(L)
    )
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED},
{_sql_zz_windows(L)},
ex AS (
  SELECT symbol, window_id, i, xs[i] AS v
  FROM zz, LATERAL (SELECT unnest(generate_series(1, {L})) AS i)
),
st AS (SELECT i, avg(v) AS m, stddev_samp(v) AS s FROM ex GROUP BY i),
sc AS (
  -- MLlib StandardScaler emits 0.0 for zero-std features; DuckDB's
  -- (v-m)/s would be NULL there (and stddev_samp of a single window is
  -- NULL) — mirror the scaler so degenerate fixtures can't desync
  SELECT symbol, window_id, i,
         CASE WHEN s IS NULL OR s = 0 THEN 0.0 ELSE (v - m) / s END AS z
  FROM ex JOIN st USING (i)
),
agg AS (
  SELECT symbol, window_id,
         {cases},
         sum(z*z) AS latent_norm2
  FROM sc GROUP BY symbol, window_id
)
SELECT * FROM agg"""
    return _sql_r6_wrap(
        body,
        ["symbol", "window_id"],
        [f"s{d}" for d in range(L)] + ["latent_norm2"],
    )


def q_emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_ann_topk

    out = ivf_ann_topk(
        _emb(spark, sf_dir), query_mod=KNN_QUERY_MOD, k=KNN_K, nprobe=IVF_NPROBE
    )
    return out.select("q_id", "vec_id", "rank", _r6("dist"), "list_id")


def q_emb_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality: recall@k of the IVF index against the
    exact L2 top-k, per query point — the approximate path's accuracy
    is a NUMBER the pipeline checks, not a hope. Both rankings break
    distance ties on vec_id and both engines compute L2 as the same
    sequential fold, so the top-k sets (and hence recall) are
    bitwise-deterministic. Queries ride the FIXED deterministic
    anchor budget (top-IVF_Q_BUDGET by portable hash, r12 verdict
    item 1) so the exact-GT brute-force side is O(n·K) with K
    constant at any corpus size — a %-of-corpus query panel made the
    GT quadratic. Brute force broadcasts the K-row query side."""
    from ..operators.ivf import (
        assign_lists,
        ivf_topk_for_queries,
        label_centroids,
    )

    emb = _emb(spark, sf_dir)
    # localCheckpoint(eager): the K-row query panel feeds THREE
    # consumers (brute-force GT, probe ranking, rerank join) —
    # materialize once so the TakeOrdered pick and its codegen run
    # once, not per consumer (the probe-curve fix pattern)
    q = (
        anchor_sample(emb, IVF_Q_BUDGET, cols=("vec_id", "v"))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .localCheckpoint(eager=True)
    )
    bf = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            dist_l2_fixed64(F.col("v"), F.col("qv")).alias("dist"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("dist").asc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= KNN_K)
        .select("q_id", "vec_id")
    )
    cent = label_centroids(emb).localCheckpoint(eager=True)
    ivf = ivf_topk_for_queries(
        assign_lists(emb, cent), cent, q, k=KNN_K, nprobe=IVF_NPROBE
    ).select("q_id", "vec_id")
    hits = bf.join(ivf, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return q.select("q_id").join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        (
            F.coalesce("n_hit", F.lit(0)).cast("double") / F.lit(float(KNN_K))
        ).alias("recall"),
    )


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup: keep one representative per coarse cluster —
    see operators/ivf.py:list_representatives for the plan shape
    (assignment + single map-side-combined argmin aggregate). The
    representative's distance is fold-exact on both engines (r6); the
    cluster's mean distance is a group-order-dependent double sum and
    goes through the coarse shared rounding (r4, the avg(mae)
    convention)."""
    from ..operators.ivf import list_representatives

    out = list_representatives(_emb(spark, sf_dir))
    return out.select(
        "list_id",
        "rep_vec_id",
        _r6("rep_dist"),
        "n_members",
        _rne(F.col("mean_dist"), "mean_dist", 4),
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import media_meta

    m = media_meta(_media(spark, sf_dir))
    return m.select(
        "media_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "payload_sha",
    )


# sha256(text) over the VARCHAR hashes its UTF-8 bytes — identical to
# Spark's sha2(encode(text,'UTF-8')); strlen is the UTF-8 byte length
SQL_MEDIA_META = """
SELECT doc_id AS media_id,
       list_extract(['image', 'audio', 'video'], (doc_id % 3 + 1)::INT)
         AS media_type,
       strlen(text)::BIGINT AS n_bytes,
       (strlen(text) % 640 + 1)::BIGINT AS width,
       (strlen(text) % 480 + 1)::BIGINT AS height,
       sha256(text) AS payload_sha
FROM documents"""


def q_media_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-stride 16-byte thumbnail per image payload (the resize
    analog — operators/multimodal.py thumbnail); emitted as hex for
    the cross-engine hash."""
    from ..operators.multimodal import thumbnail

    out = thumbnail(_media(spark, sf_dir))
    return out.select(
        "media_id", "n_bytes", "stride", F.hex("thumb").alias("thumb_hex")
    )


def q_media_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dedup groups — the binary-column analog of the text
    dedup family: payloads grouped per media type by the byte-stride
    signature ("tiny-thumbnail hash" grouping — near-identical
    payloads with equal stride collide), with the distinct-sha count
    separating exact duplicates from near-duplicates inside each
    group. One projection pass + one map-side-combined groupBy on
    (type, signature); the payloads themselves never shuffle — only
    32-byte keys do."""
    from ..operators.multimodal import payload_signature

    sig = payload_signature(_media(spark, sf_dir))
    return (
        sig.groupBy("media_type", "sig")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("media_id").alias("canonical_id"),
            F.count_distinct("payload_sha").alias("n_payloads"),
        )
        .filter(F.col("n_items") >= 2)
        .select("media_type", "sig", "n_items", "canonical_id", "n_payloads")
    )


def _sql_media_dup_groups(out_bytes: int = 16) -> str:
    picks = " || ".join(
        f"substring(hx, 2 * ((n // {out_bytes}) * {i}) + 1, 2)"
        for i in range(out_bytes)
    )
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
         list_extract(['image', 'audio', 'video'], (doc_id % 3 + 1)::INT)
           AS media_type,
         hex(encode(text)) AS hx, strlen(text)::BIGINT AS n,
         sha256(text) AS payload_sha
  FROM documents
),
s AS (
  SELECT media_id, media_type, payload_sha, {picks} AS sig
  FROM m WHERE n >= {out_bytes}
)
SELECT media_type, sig, count(*) AS n_items,
       min(media_id) AS canonical_id,
       count(DISTINCT payload_sha) AS n_payloads
FROM s GROUP BY 1, 2 HAVING count(*) >= 2"""


def _sql_media_thumbnail(out_bytes: int = 16) -> str:
    picks = " || ".join(
        f"substring(hx, 2 * ((n // {out_bytes}) * {i}) + 1, 2)"
        for i in range(out_bytes)
    )
    return f"""WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         strlen(text)::BIGINT AS n
  FROM documents WHERE (doc_id % 3 + 1)::INT = 1
)
SELECT media_id, n AS n_bytes, (n // {out_bytes})::BIGINT AS stride,
       {picks} AS thumb_hex
FROM m WHERE n >= {out_bytes}"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample

    fr = frame_sample(_media(spark, sf_dir))
    return fr.select(
        "media_id",
        "frame_no",
        F.length("frame").cast("long").alias("n_bytes"),
        F.hex("frame").alias("frame_hex"),
    )


# byte slicing checked through the hex codec: character-substring of
# hex(blob) at 2x the byte offsets equals Spark's binary substring
SQL_MEDIA_FRAMES = """WITH vids AS (
  SELECT doc_id AS media_id, text, strlen(text) AS n
  FROM documents
  WHERE doc_id % 3 = 2 AND strlen(text) >= 64
),
fr AS (
  SELECT media_id, text,
         unnest(generate_series(0, ((n - 64) // 128)::BIGINT)) AS frame_no
  FROM vids
)
SELECT media_id, frame_no, 64::BIGINT AS n_bytes,
       substring(hex(encode(text)), (frame_no * 256 + 1)::BIGINT, 128)
         AS frame_hex
FROM fr"""


def q_media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow mapInPandas decode slot, fully oracle-checked: the
    deterministic fake decode (L1-normalized byte-bucket histogram) is
    reproduced in SQL through the hex codec — bucket = first hex
    nibble >> 1 — so the Arrow batch path itself gets a bitwise value
    check, not just a row count."""
    from ..operators.multimodal import FEATURE_DIM, extract_features

    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        *[
            F.element_at("features", j + 1).alias(f"f{j}")
            for j in range(FEATURE_DIM)
        ],
    )


def _sql_media_byte_features() -> str:
    from ..operators.multimodal import FEATURE_DIM

    cols = ",\n  ".join(
        f"CASE WHEN n = 0 THEN 0.0"
        f" ELSE len(list_filter(bk, x -> x = {j})) / n END AS f{j}"
        for j in range(FEATURE_DIM)
    )
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
         list_extract(['image', 'audio', 'video'], (doc_id % 3 + 1)::INT)
           AS media_type,
         hex(encode(text)) AS hx, strlen(text) AS n
  FROM documents
),
d AS (
  SELECT media_id, media_type, n,
         list_transform(range(0, n::BIGINT),
           i -> (strpos('0123456789ABCDEF',
                        substring(hx, (2 * i + 1)::BIGINT, 1)) - 1) // 2
         ) AS bk
  FROM m
)
SELECT media_id, media_type,
  {cols}
FROM d"""


KNN_METRICS = ("l1", "l2", "cosine", "weighted_l2", "weighted_cosine")


def q_knn_topk_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five distance metrics' exact top-k in one result, tagged by
    ``metric`` (J2/F5/W10). Each branch is the same broadcast-query
    codegen-distance InferWindowGroupLimit plan as before; the union is
    branch-parallel."""
    parts = [
        _knn_query(spark, sf_dir, m).withColumn("metric", F.lit(m))
        for m in KNN_METRICS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_knn_metrics() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT q_id, vec_id, rank, dist, '{m}' AS metric FROM ({_sql_knn(m)})"
        for m in KNN_METRICS
    )


def q_emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the memory-side companion to IVF: each
    vector compresses to PQ_M sub-space code bytes, with the
    reconstruction error emitted per vector (the same
    approximation-is-a-measured-number contract as sq8/CMS/HLL). The
    codebook reuses the IVF trick: label-grouped sub-vector means
    (deterministic, no iterative k-means), rounded through the shared
    1e-6 grid so both engines build the identical quantizer. The
    assignment is a broadcast codebook cross join collapsed by a
    map-side-combined min(struct) per (vector, subspace) — the
    crossed rows never shuffle — and the per-vector fold orders
    subspaces explicitly so the error sum is sequence-exact. The code
    sequence is emitted as a '-'-joined string (not ARRAY) so the
    output schema stays atomic — nested output columns are banned
    registry-wide (see tests/test_registry_contracts.py)."""
    emb = _emb(spark, sf_dir)
    cb = _pq_codebook(emb)
    best = _pq_assignments(emb, cb)
    per_vec = best.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct("s", F.col("m.code").alias("code")))
        ).alias("sc"),
        F.array_sort(
            F.collect_list(F.struct("s", F.col("m.err2").alias("err2")))
        ).alias("se"),
    )
    return per_vec.select(
        "vec_id",
        F.concat_ws(
            "-",
            F.transform("sc", lambda z: z["code"].cast("string")),
        ).alias("codes"),
        _rne(
            F.sqrt(
                F.aggregate(
                    "se", F.lit(0.0), lambda acc, z: acc + z["err2"]
                )
            ),
            "recon_err",
            6,
        ),
    )


def _sql_emb_pq_codes() -> str:
    sl = f"list_slice(e.v, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    err2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({sl}, cb.cvec), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        f" (x, y) -> x + y)"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cb_dims AS (
  SELECT label, CAST((i - 1) // {PQ_DSUB} AS INT) AS s, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM emb, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY 1, 2, 3
),
cb AS (SELECT label AS code, s, list(c ORDER BY pos) AS cvec
       FROM cb_dims GROUP BY 1, 2),
cand AS (
  SELECT e.vec_id, cb.s, cb.code, {err2} AS err2
  FROM emb e CROSS JOIN cb
),
best AS (
  SELECT vec_id, s, code, err2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      ORDER BY err2 ASC, code ASC) AS rn
    FROM cand)
  WHERE rn = 1
)
SELECT vec_id, array_to_string(list(code ORDER BY s), '-') AS codes,
       {_sql_rne(
           'sqrt(list_reduce(list_prepend(0.0, list(err2 ORDER BY s)),'
           ' (x, y) -> x + y))',
           'recon_err', 6)}
FROM best GROUP BY vec_id"""


def q_emb_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means in pure DataFrames — the
    iterative-refinement pattern beyond connected components:
    label-mean seeds -> nearest-centroid assignment -> recomputed
    means -> re-assignment -> per-cluster inertia. Cross-engine
    determinism at every step: centroid means round through the
    shared 1e-6 grid (exactly the IVF quantizer contract), the argmin
    tie-breaks on (distance, label), and the inertia is a DECIMAL sum
    of per-member distances rounded at 1e-6 — so the float
    accumulation order that plagues naive k-means comparisons never
    enters. At scale each iteration is one assignment pass (broadcast
    centroids, map-side-combined min-struct) plus one explode+mean
    shuffle — the canonical distributed Lloyd cost shape."""
    from ..operators.ivf import assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    cent0 = label_centroids(emb)
    a0 = assign_lists(emb, cent0).select(
        "vec_id", "v", F.col("list_id").alias("c0")
    )
    ex = a0.select("c0", F.posexplode("v").alias("pos", "x"))
    cent1 = (
        ex.groupBy("c0", "pos")
        .agg(
            (F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)).alias(
                "c"
            )
        )
        .groupBy(F.col("c0").alias("label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda z: z["c"],
            ).alias("cvec")
        )
    )
    a1 = (
        emb.crossJoin(
            F.broadcast(
                cent1.select(F.col("label").alias("label_c"), "cvec")
            )
        )
        .withColumn("d", dist_l2_fixed64(F.col("v"), F.col("cvec")))
        .groupBy("vec_id")
        .agg(F.min(F.struct(F.col("d"), F.col("label_c"))).alias("m"))
        .select(
            "vec_id",
            F.col("m.label_c").alias("cluster"),
            F.col("m.d").alias("d"),
        )
    )
    d6 = (F.floor(F.col("d") * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)).cast(
        "decimal(18,6)"
    )
    return a1.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(d6).cast("double").alias("inertia"),
    )


def _sql_emb_kmeans_refine() -> str:
    l2_ec = _sql_l2("e.v", "c.cvec")
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cent0_dims AS (
  SELECT label, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM emb, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY 1, 2),
cent0 AS (SELECT label, list(c ORDER BY pos) AS cvec
          FROM cent0_dims GROUP BY 1),
a0 AS (
  SELECT vec_id, v, c0 FROM (
    SELECT e.vec_id, e.v, c.label AS c0,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_ec} ASC, c.label ASC) AS rn
    FROM emb e CROSS JOIN cent0 c)
  WHERE rn = 1),
cent1_dims AS (
  SELECT c0, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM a0, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY 1, 2),
cent1 AS (SELECT c0 AS label, list(c ORDER BY pos) AS cvec
          FROM cent1_dims GROUP BY 1),
a1 AS (
  SELECT vec_id, cluster, d FROM (
    SELECT e.vec_id, c.label AS cluster, {l2_ec} AS d,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_ec} ASC, c.label ASC) AS rn
    FROM emb e CROSS JOIN cent1 c)
  WHERE rn = 1)
SELECT cluster, count(*) AS n_members,
       CAST(sum(CAST(floor(d * 1000000.0 + 0.5) / 1000000.0 + 0.0
                     AS DECIMAL(18,6))) AS DOUBLE) AS inertia
FROM a1 GROUP BY 1"""


def q_emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified reranking — the
    retrieval-pipeline step between ANN and the consumer: greedily
    pick K results maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    trading relevance against redundancy. Each greedy round is one
    candidate×selected similarity aggregate + a per-query argmax —
    selected is ≤K rows per query, so round cost is candidate-sized
    and the driver only orchestrates K rounds (the loop the unrolled
    oracle replays as K CTE steps). All similarities snap to the 1e-6
    grid BEFORE the score arithmetic, so the greedy argmax tie-breaks
    identically in both engines.

    Candidate generation rides the IVF ANN index, not brute force:
    each query probes its ``MMR_NPROBE`` nearest coarse lists and
    keeps the ``MMR_CAND_N`` most-similar vectors from those lists
    (equi-join on list_id — no corpus-sized broadcast anywhere), so
    the candidate frame is queries × N and the greedy rounds stay
    candidate-sized at any corpus scale. The oracle replays the same
    quantizer (shared _sql_ivf_base CTEs) so the pools are identical
    row sets in both engines."""
    from ..functions.distance import (
        dist_l2_fixed,
        dot_fixed,
        l2_norm_fixed,
    )
    from ..operators.ivf import EMB_DIM, assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    cent = label_centroids(emb)
    assigned = assign_lists(emb, cent)
    queries = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__cdist").asc(), F.col("label_c").asc()
    )
    probes = (
        queries.crossJoin(
            F.broadcast(
                cent.select(F.col("label").alias("label_c"), "cvec")
            )
        )
        .withColumn(
            "__cdist", dist_l2_fixed(F.col("qv"), F.col("cvec"), EMB_DIM)
        )
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= MMR_NPROBE)
        .select("q_id", "qv", F.col("label_c").alias("list_id"))
    )
    wc = Window.partitionBy("q_id").orderBy(
        F.col("simq").desc(), F.col("id").asc()
    )
    cand = (
        assigned.join(probes, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("id"),
            "v",
            snap(
                dot_fixed("v", "qv", EMB_DIM)
                / (
                    l2_norm_fixed("v", EMB_DIM)
                    * l2_norm_fixed("qv", EMB_DIM)
                )
            ).alias("simq"),
        )
        .withColumn("__crk", F.row_number().over(wc))
        .filter(F.col("__crk") <= MMR_CAND_N)
        .drop("__crk")
    )
    # the greedy K rounds run PER QUERY inside one Arrow pass: the
    # candidate pool is bounded (≤ MMR_CAND_N rows per q_id by
    # construction), so the loop is group-local work — fully
    # distributed across queries, zero driver rounds / checkpoints
    # (the previous K-round driver loop spent its whole wall time on
    # per-round scheduling at any SF). The python arithmetic replays
    # the JVM fold order exactly (sequential left folds for dot/norm,
    # lam*simq − (1−lam)*ms with the same double constants), and every
    # similarity snaps to the 1e-6 grid before scoring, so the oracle's
    # unrolled-CTE greedy still matches bitwise.
    import math

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    lam = MMR_LAMBDA
    out_schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        def g(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        def cosv(a, b) -> float:
            dot = 0.0
            for x, y in zip(a, b):
                dot = dot + x * y
            na = 0.0
            for x in a:
                na = na + x * x
            nb = 0.0
            for y in b:
                nb = nb + y * y
            return dot / (math.sqrt(na) * math.sqrt(nb))

        ids = [int(i) for i in pdf["id"]]
        vs = dict(zip(ids, pdf["v"]))
        simq = dict(zip(ids, (float(s) for s in pdf["simq"])))
        qid = int(pdf["q_id"].iloc[0])
        sel: list[int] = []
        out = []
        for rank in range(1, MMR_K + 1):
            best = None
            for d in sorted(vs):
                if d in sel:
                    continue
                if rank == 1:
                    score = lam * simq[d]
                else:
                    ms = max(g(cosv(vs[d], vs[s])) for s in sel)
                    score = lam * simq[d] - (1 - lam) * ms
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d, score)
            if best is None:
                break
            sel.append(best[1])
            out.append((qid, rank, best[1], best[2]))
        return pd.DataFrame(
            out, columns=["q_id", "rank", "id", "score"]
        )

    sel = cand.groupBy("q_id").applyInPandas(greedy, schema=out_schema)
    return sel.select(
        "q_id", "rank", F.col("id").alias("vec_id"), _rne(F.col("score"), "score", 6)
    )


def _sql_emb_mmr() -> str:
    cos = lambda a, b: (  # noqa: E731
        f"{_sql_dot(a, b)} / ({_sql_norm(a)} * {_sql_norm(b)})"
    )
    snap = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    lam, mu = MMR_LAMBDA, 1 - MMR_LAMBDA
    steps = []
    prev = "sel1"
    steps.append(f"""sel1 AS (
  SELECT q_id, id, 1 AS rank, {lam} * simq AS score
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY q_id
    ORDER BY {lam} * simq DESC, id ASC) = 1)""")
    for i in range(2, MMR_K + 1):
        steps.append(f"""m{i} AS (
  SELECT c.q_id, c.id, c.simq,
         max({snap(cos('c.v', 'ev.v'))}) AS ms
  FROM cand c
  JOIN {prev} s ON s.q_id = c.q_id
  JOIN emb ev ON ev.vec_id = s.id
  LEFT JOIN {prev} x ON x.q_id = c.q_id AND x.id = c.id
  WHERE x.id IS NULL
  GROUP BY 1, 2, 3),
p{i} AS (
  SELECT q_id, id, {i} AS rank,
         {lam} * simq - {mu} * ms AS score
  FROM m{i}
  QUALIFY row_number() OVER (PARTITION BY q_id
    ORDER BY {lam} * simq - {mu} * ms DESC, id ASC) = 1),
sel{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{i})""")
        prev = f"sel{i}"
    body = ",\n".join(steps)
    l2_qc = _sql_l2("q.qv", "c.cvec")
    return f"""
WITH {_sql_ivf_base()},
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
probes AS (
  SELECT q_id, qv, list_id FROM (
    SELECT q.q_id, q.qv, c.label AS list_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2_qc} ASC, c.label ASC) AS rk
    FROM q CROSS JOIN cent c)
  WHERE rk <= {MMR_NPROBE}),
cand_pool AS (
  SELECT p.q_id, a.vec_id AS id, a.v,
         {snap(cos('a.v', 'p.qv'))} AS simq
  FROM assigned a JOIN probes p USING (list_id)
  WHERE a.vec_id <> p.q_id),
cand AS (
  SELECT q_id, id, v, simq FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY simq DESC, id ASC) AS crk
    FROM cand_pool)
  WHERE crk <= {MMR_CAND_N}),
{body}
SELECT q_id, rank, id AS vec_id,
       {_sql_rne('score', 'score')}
FROM {prev}"""


def q_emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the query-side
    payoff of the PQ codes: per query, a (subspace × code) lookup
    table of exact sub-distances (queries × codebook, both tiny,
    broadcast), then each database vector's approximate distance is
    FOUR LUT adds over its codes — no full-vector math per candidate,
    which is the entire point of PQ at 100 TB (the scan touches 4
    bytes + 4 adds per vector instead of 64 floats). Exact distances
    are recomputed ONLY for the reported top-k rows, emitting the
    approximation error as a measured column (the engine's standard
    sketch contract)."""
    emb = _emb(spark, sf_dir)
    cb = _pq_codebook(emb)
    codes = _pq_assignments(emb, cb).select(
        "vec_id", "s", F.col("m.code").alias("code")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    lut = queries.crossJoin(F.broadcast(cb)).select(
        "q_id",
        "s",
        "code",
        dist_l2sq(
            F.slice("qv", F.col("s") * PQ_DSUB + 1, PQ_DSUB), F.col("cvec")
        ).alias("d2"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d2"))),
                    lambda z: z["d2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc2")
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc2").asc(), F.col("vec_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= PQ_ADC_K
    )
    # queries-sized by construction: filter to the query stride
    # BEFORE broadcasting (a corpus-sized broadcast here would
    # defeat the pruned-scan design this query demonstrates).
    qv = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dv = emb.select("vec_id", "v")
    return (
        top.join(F.broadcast(qv), "q_id")
        .join(dv, "vec_id")
        .select(
            "q_id",
            "rank",
            "vec_id",
            _rne(F.sqrt(F.col("adc2")), "adc_dist", 6),
            _rne(F.sqrt(dist_l2sq(F.col("qv"), F.col("v"))), "l2_dist", 6),
        )
    )


def q_emb_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor — the check a pipeline
    runs when the encoder (or the corpus) changes under a vector
    index: per dimension, the reference-vs-current mean shift between
    the two hash-split halves of the corpus, plus each half's mean.
    At the null (random split of one distribution) shifts are small;
    a re-encoded or re-weighted corpus shows per-dim displacement long
    before recall collapses. Determinism: each coordinate snaps to
    the 1e-9 grid and the per-(half, dim) sums ride exact
    DECIMAL(38,0) — order-free; one explode + one map-side-combined
    groupBy on (dim), 64 output rows."""
    emb = _emb(spark, sf_dir)
    half = (F.col("vec_id") % 2 == 0).cast("int")
    e = emb.select(
        half.alias("ref"),
        F.posexplode("v").alias("dim", "x"),
    ).select(
        "ref",
        "dim",
        F.floor(F.col("x") * 1e9 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    agg = e.groupBy("dim").agg(
        F.sum(F.when(F.col("ref") == 1, F.col("q"))).alias("sr"),
        F.sum(F.when(F.col("ref") == 1, F.lit(1)).otherwise(F.lit(0)))
        .alias("nr"),
        F.sum(F.when(F.col("ref") == 0, F.col("q"))).alias("sc"),
        F.sum(F.when(F.col("ref") == 0, F.lit(1)).otherwise(F.lit(0)))
        .alias("nc"),
    )
    mr = F.col("sr").cast("double") / F.col("nr").cast("double") / 1e9
    mc = F.col("sc").cast("double") / F.col("nc").cast("double") / 1e9
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("nr").cast("long").alias("n_ref"),
        F.col("nc").cast("long").alias("n_cur"),
        _rne(mr, "mean_ref", 8),
        _rne(mc, "mean_cur", 8),
        _rne(F.abs(mr - mc), "abs_shift", 8),
    )


def _sql_emb_dim_drift() -> str:
    mr = "sr::DOUBLE / nr::DOUBLE / 1000000000.0"
    mc = "sc::DOUBLE / nc::DOUBLE / 1000000000.0"
    return f"""
WITH e AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS ref,
         i - 1 AS dim,
         floor(embedding[i]::DOUBLE * 1000000000.0 + 0.5)
           ::DECIMAL(38,0) AS q
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
agg AS (
  SELECT dim,
         sum(CASE WHEN ref = 1 THEN q END) AS sr,
         sum(CASE WHEN ref = 1 THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN ref = 0 THEN q END) AS sc,
         sum(CASE WHEN ref = 0 THEN 1 ELSE 0 END) AS nc
  FROM e GROUP BY 1)
SELECT dim::BIGINT AS dim, nr::BIGINT AS n_ref, nc::BIGINT AS n_cur,
       {_sql_rne(mr, 'mean_ref', 8)},
       {_sql_rne(mc, 'mean_cur', 8)},
       {_sql_rne(f'abs({mr} - {mc})', 'abs_shift', 8)}
FROM agg"""


# --------------------------------------------------------------------------
# round-7 additions: training-data pipeline + quant extensions
# --------------------------------------------------------------------------

EMB_BENCH_MOD = 97
EMB_DECONTAM_TAU = 0.8


def q_emb_bench_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination — the semantic sibling of the
    exact 5-gram / Bloom decontam pair: corpus vectors whose cosine to
    ANY benchmark vector reaches ``EMB_DECONTAM_TAU`` are flagged
    (paraphrased eval leakage that n-gram overlap misses). The
    benchmark set (vec_id % EMB_BENCH_MOD == 0) is fixed-size by
    construction and broadcasts; the corpus×benchmark crossed rows
    collapse MAP-SIDE via a max(struct) argmax per corpus vector —
    nothing bench-crossed ever shuffles, so the plan is scan-shaped at
    any corpus size. Similarities snap to the 1e-6 grid before the
    argmax so the (cos desc, bench_id asc) tie-break is engine-exact.
    """
    from ..functions.distance import dot_fixed, l2_norm_fixed

    emb = _emb(spark, sf_dir)
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    bench = emb.filter(F.col("vec_id") % EMB_BENCH_MOD == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("v").alias("bv")
    )
    corpus = emb.filter(F.col("vec_id") % EMB_BENCH_MOD != 0)
    cand = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bench_id",
        snap(
            dot_fixed("v", "bv", 64)
            / (l2_norm_fixed("v", 64) * l2_norm_fixed("bv", 64))
        ).alias("cs"),
    )
    m = F.max(
        F.struct(
            F.col("cs").alias("c"), (-F.col("bench_id")).alias("nb")
        )
    ).alias("m")
    best = cand.groupBy("vec_id").agg(m)
    return best.select(
        "vec_id",
        (-F.col("m.nb")).alias("best_bench_id"),
        (F.col("m.c") + F.lit(0.0)).alias("best_cos"),
        (F.col("m.c") >= EMB_DECONTAM_TAU).alias("is_contaminated"),
    )


def _sql_emb_bench_decontam() -> str:
    cos = f"{_sql_dot('c.v', 'b.bv')} / ({_sql_norm('c.v')} * {_sql_norm('b.bv')})"
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bench AS (SELECT vec_id AS bench_id, v AS bv FROM emb
          WHERE vec_id % {EMB_BENCH_MOD} = 0),
corpus AS (SELECT vec_id, v FROM emb WHERE vec_id % {EMB_BENCH_MOD} <> 0),
cand AS (
  SELECT c.vec_id, b.bench_id,
         floor(({cos}) * 1000000.0 + 0.5) / 1000000.0 AS cs
  FROM corpus c CROSS JOIN bench b),
best AS (
  SELECT vec_id, bench_id, cs FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
      ORDER BY cs DESC, bench_id ASC) AS rn FROM cand)
  WHERE rn = 1)
SELECT vec_id, bench_id AS best_bench_id, cs + 0.0 AS best_cos,
       cs >= {EMB_DECONTAM_TAU} AS is_contaminated
FROM best"""


def q_emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval card: how much ANN recall survives
    keeping only the first ``MRL_DIM`` of 64 dims? Per query, top-k
    by full-dim cosine (ground truth) vs top-k by truncated-dim
    cosine, reporting the overlap — the measured-approximation
    contract (sq8/CMS/HLL/PQ) applied to dimensionality truncation.
    Both rankings read ONE crossed frame (queries are the strided
    KNN_QUERY_MOD set, broadcast — the sanctioned brute-force eval
    baseline the k-NN family uses); at corpus scale the truncated
    ranking would ride the IVF index and this card measures what that
    buys."""
    from ..functions.distance import (
        cos_fixed_range,
        dot_fixed,
        l2_norm_fixed,
    )

    emb = _emb(spark, sf_dir)
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    q = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            snap(
                dot_fixed("v", "qv", 64)
                / (l2_norm_fixed("v", 64) * l2_norm_fixed("qv", 64))
            ).alias("cs_full"),
            # range-offset form, not element_at(slice(...)) — the
            # slice would re-materialize per element (O(dim²)/row)
            snap(cos_fixed_range("v", "qv", 1, MRL_DIM)).alias(
                "cs_trunc"
            ),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(
        F.col("cs_full").desc(), F.col("vec_id").asc()
    )
    wt = Window.partitionBy("q_id").orderBy(
        F.col("cs_trunc").desc(), F.col("vec_id").asc()
    )
    ranked = cand.select(
        "q_id",
        "vec_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wt).alias("rk_trunc"),
    )
    return (
        ranked.filter(
            (F.col("rk_full") <= KNN_K) | (F.col("rk_trunc") <= KNN_K)
        )
        .groupBy("q_id")
        .agg(
            F.count_if(
                (F.col("rk_full") <= KNN_K) & (F.col("rk_trunc") <= KNN_K)
            ).alias("n_overlap")
        )
        .select(
            "q_id",
            F.lit(KNN_K).alias("k"),
            "n_overlap",
            (F.col("n_overlap") / F.lit(KNN_K)).alias("recall_at_k"),
        )
    )


def _sql_emb_matryoshka() -> str:
    cosf = f"{_sql_dot('e.v', 'q.qv')} / ({_sql_norm('e.v')} * {_sql_norm('q.qv')})"
    tv = f"list_slice(e.v, 1, {MRL_DIM})"
    tq = f"list_slice(q.qv, 1, {MRL_DIM})"
    cost = f"{_sql_dot(tv, tq)} / ({_sql_norm(tv)} * {_sql_norm(tq)})"
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM emb
      WHERE vec_id % {KNN_QUERY_MOD} = 0),
cand AS (
  SELECT q.q_id, e.vec_id,
         floor(({cosf}) * 1000000.0 + 0.5) / 1000000.0 AS cs_full,
         floor(({cost}) * 1000000.0 + 0.5) / 1000000.0 AS cs_trunc
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
           ORDER BY cs_full DESC, vec_id ASC) AS rk_full,
         row_number() OVER (PARTITION BY q_id
           ORDER BY cs_trunc DESC, vec_id ASC) AS rk_trunc
  FROM cand)
SELECT q_id, {KNN_K} AS k,
       CAST(count(*) FILTER (rk_full <= {KNN_K} AND rk_trunc <= {KNN_K})
            AS BIGINT) AS n_overlap,
       CAST(count(*) FILTER (rk_full <= {KNN_K} AND rk_trunc <= {KNN_K})
            AS DOUBLE) / {KNN_K} AS recall_at_k
FROM ranked WHERE rk_full <= {KNN_K} OR rk_trunc <= {KNN_K}
GROUP BY 1"""


def q_emb_ood_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution scoring against the IVF coarse quantizer:
    each vector's distance to its OWN nearest centroid, flagged
    against its list's p95 distance (explicit rank pick — no engine
    quantile interpolation is load-bearing) — the cheap OOD screen a
    curation pipeline runs before admitting embeddings to an index
    (far-from-every-centroid vectors are garbage, adversarial, or a
    new mode the quantizer has not learned). One assignment pass
    (broadcast centroids, map-side argmin) + one list-partitioned
    rank window; the threshold compare uses the RAW distances (both
    engines reproduce them bitwise via the sequential-fold contract),
    rounding only the emitted columns."""
    from ..operators.ivf import EMB_DIM, assign_lists, label_centroids

    from ..functions.distance import dist_l2_fixed

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb)
    assigned = assign_lists(emb, cent)
    withd = assigned.join(
        F.broadcast(cent.select(F.col("label").alias("list_id"), "cvec")),
        "list_id",
    ).select(
        "vec_id",
        "list_id",
        dist_l2_fixed(F.col("v"), F.col("cvec"), EMB_DIM).alias("d"),
    )
    wr = Window.partitionBy("list_id").orderBy(
        F.col("d").asc(), F.col("vec_id").asc()
    )
    wn = Window.partitionBy("list_id")
    ranked = withd.select(
        "vec_id",
        "list_id",
        "d",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = F.floor((F.col("n") - 1) * F.lit(OOD_QUANTILE)).cast(
        "int"
    ) + F.lit(1)
    thr = ranked.filter(F.col("rn") == pick).select(
        "list_id", F.col("d").alias("thr")
    )
    return (
        ranked.join(F.broadcast(thr), "list_id")
        .select(
            "vec_id",
            "list_id",
            _rne(F.col("d"), "dist", 6),
            _rne(F.col("thr"), "p95_dist", 6),
            (F.col("d") > F.col("thr")).alias("is_ood"),
        )
    )


def _sql_emb_ood() -> str:
    l2 = _sql_l2("a.v", "c.cvec")
    return f"""
WITH {_sql_ivf_base()},
withd AS (
  SELECT a.vec_id, a.list_id, {l2} AS d
  FROM assigned a JOIN cent c ON c.label = a.list_id),
ranked AS (
  SELECT vec_id, list_id, d,
         row_number() OVER (PARTITION BY list_id
           ORDER BY d ASC, vec_id ASC) AS rn,
         count(*) OVER (PARTITION BY list_id) AS n
  FROM withd),
thr AS (
  SELECT list_id, d AS thr FROM ranked
  WHERE rn = CAST(floor((n - 1) * {OOD_QUANTILE}) AS INT) + 1)
SELECT r.vec_id, r.list_id,
       {_sql_rne('r.d', 'dist')},
       {_sql_rne('t.thr', 'p95_dist')},
       r.d > t.thr AS is_ood
FROM ranked r JOIN thr t USING (list_id)"""


def q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    nearest SAME-label vector (positive) and the nearest
    DIFFERENT-label vector (hard negative), with the margin between
    them — the pair-construction step of a retrieval-training
    pipeline, where margin ≈ 0 marks the pairs worth training on.
    Brute-force over the strided query set (the sanctioned eval-card
    baseline; the production form probes the IVF index), flat
    fixed-dim distances, ONE map-side-combined min(struct) aggregate
    per side — the crossed rows never shuffle."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("q_label"),
    )
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            dist_l2_fixed64(F.col("v"), F.col("qv")).alias("d"),
        )
    )
    pick = lambda cond: F.min(  # noqa: E731
        F.when(cond, F.struct(F.col("d"), F.col("vec_id")))
    )
    best = cand.groupBy("q_id").agg(
        pick(F.col("label") == F.col("q_label")).alias("pos"),
        pick(F.col("label") != F.col("q_label")).alias("neg"),
    )
    return best.select(
        "q_id",
        F.col("pos.vec_id").alias("pos_id"),
        F.col("neg.vec_id").alias("neg_id"),
        _rne(F.col("pos.d"), "pos_dist", 6),
        _rne(F.col("neg.d"), "neg_dist", 6),
        _rne(F.col("neg.d") - F.col("pos.d"), "margin", 6),
    )


def _sql_emb_hard_negatives() -> str:
    l2 = _sql_l2("e.v", "q.qv")
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
             FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM emb
      WHERE vec_id % {KNN_QUERY_MOD} = 0),
cand AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label, {l2} AS d
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id),
pos AS (
  SELECT q_id, vec_id AS pos_id, d AS pos_d FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY d ASC, vec_id ASC) AS rn
    FROM cand WHERE label = q_label) WHERE rn = 1),
neg AS (
  SELECT q_id, vec_id AS neg_id, d AS neg_d FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY d ASC, vec_id ASC) AS rn
    FROM cand WHERE label <> q_label) WHERE rn = 1)
SELECT p.q_id, p.pos_id, n.neg_id,
       {_sql_rne('p.pos_d', 'pos_dist')},
       {_sql_rne('n.neg_d', 'neg_dist')},
       {_sql_rne('n.neg_d - p.pos_d', 'margin')}
FROM pos p JOIN neg n USING (q_id)"""


def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search — the composition that IS the standard
    100 TB vector-index layout (FAISS's IVFADC): the coarse quantizer
    prunes the corpus to ``IVFPQ_NPROBE`` probed lists, then PQ's ADC
    lookup table scores ONLY those candidates at 4 LUT adds per
    vector, and exact distances are recomputed just for the reported
    top-k (approximation error as a measured column). Both halves are
    the already-verified building blocks (emb_ivf_ann_topk's probe
    pruning, emb_pq_adc_topk's LUT scan) joined at the candidate set:
    scan cost = probed fraction × 4 adds, the product of the two
    savings. Everything broadcast here (centroids, codebook, LUT) is
    fixed-size by construction; the candidate join is equi on
    list_id."""
    from ..operators.ivf import assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb)
    assigned = assign_lists(emb, cent)
    cb = _pq_codebook(emb)
    codes = _pq_assignments(emb, cb).select(
        "vec_id", "s", F.col("m.code").alias("code")
    )
    queries = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__cdist").asc(), F.col("label_c").asc()
    )
    probes = (
        queries.crossJoin(
            F.broadcast(
                cent.select(F.col("label").alias("label_c"), "cvec")
            )
        )
        .withColumn("__cdist", dist_l2_fixed64(F.col("qv"), F.col("cvec")))
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= IVFPQ_NPROBE)
        .select("q_id", F.col("label_c").alias("list_id"))
    )
    cand = (
        assigned.join(probes, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    lut = queries.crossJoin(F.broadcast(cb)).select(
        "q_id",
        "s",
        "code",
        dist_l2sq(
            F.slice("qv", F.col("s") * PQ_DSUB + 1, PQ_DSUB), F.col("cvec")
        ).alias("d2"),
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["q_id", "s", "code"])
        .groupBy("q_id", "vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d2"))),
                    lambda z: z["d2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc2")
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc2").asc(), F.col("vec_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= PQ_ADC_K
    )
    # queries-sized by construction: filter to the query stride
    # BEFORE broadcasting (a corpus-sized broadcast here would
    # defeat the pruned-scan design this query demonstrates).
    qv = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dv = emb.select("vec_id", "v")
    return (
        top.join(F.broadcast(qv), "q_id")
        .join(dv, "vec_id")
        .select(
            "q_id",
            "rank",
            "vec_id",
            _rne(F.sqrt(F.col("adc2")), "adc_dist", 6),
            _rne(F.sqrt(dist_l2sq(F.col("qv"), F.col("v"))), "l2_dist", 6),
        )
    )


def _sql_emb_ivfpq() -> str:
    sl = f"list_slice(e.v, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    err2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({sl}, cb.cvec), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        f" (x, y) -> x + y)"
    )
    qsl = f"list_slice(q.qv, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    qd2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({qsl}, cb.cvec), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        f" (x, y) -> x + y)"
    )
    exact = (
        "list_reduce(list_prepend(0.0, list_transform("
        "list_zip(qq.qv, dv.v), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        " (x, y) -> x + y)"
    )
    l2_qc = _sql_l2("q.qv", "c.cvec")
    return f"""
WITH {_sql_ivf_base()},
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
probes AS (
  SELECT q_id, list_id FROM (
    SELECT q.q_id, c.label AS list_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2_qc} ASC, c.label ASC) AS rk
    FROM q CROSS JOIN cent c)
  WHERE rk <= {IVFPQ_NPROBE}),
cand_ids AS (
  SELECT p.q_id, a.vec_id
  FROM assigned a JOIN probes p USING (list_id)
  WHERE a.vec_id <> p.q_id),
pq_dims AS (
  SELECT label, CAST((i - 1) // {PQ_DSUB} AS INT) AS s, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM emb, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY 1, 2, 3),
cb AS (SELECT label AS code, s, list(c ORDER BY pos) AS cvec
       FROM pq_dims GROUP BY 1, 2),
code_cand AS (
  SELECT e.vec_id, cb.s, cb.code, {err2} AS err2
  FROM emb e CROSS JOIN cb),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      ORDER BY err2 ASC, code ASC) AS rn
    FROM code_cand)
  WHERE rn = 1),
lut AS (
  SELECT q.q_id, cb.s, cb.code, {qd2} AS d2
  FROM q CROSS JOIN cb),
scored AS (
  SELECT ci.q_id, ci.vec_id,
         list_reduce(list_prepend(0.0, list(l.d2 ORDER BY c.s)),
                     (x, y) -> x + y) AS adc2
  FROM cand_ids ci
  JOIN codes c ON c.vec_id = ci.vec_id
  JOIN lut l ON l.q_id = ci.q_id AND l.s = c.s AND l.code = c.code
  GROUP BY 1, 2),
top AS (
  SELECT q_id, vec_id, adc2,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc2 ASC, vec_id ASC) AS rank
  FROM scored QUALIFY rank <= {PQ_ADC_K})
SELECT t.q_id, t.rank, t.vec_id,
       {_sql_rne('sqrt(t.adc2)', 'adc_dist')},
       {_sql_rne('sqrt(' + exact + ')', 'l2_dist')}
FROM top t
JOIN (SELECT vec_id AS q_id, v AS qv FROM emb) qq ON t.q_id = qq.q_id
JOIN (SELECT vec_id, v FROM emb) dv ON t.vec_id = dv.vec_id"""


def q_emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality eval card for the IVF coarse quantizer:
    per-list label purity (majority-label share) plus the list's
    majority label and size — the diagnostic that says whether the
    quantizer's lists are semantically coherent enough for
    semantic-dedup / OOD decisions to mean anything. One assignment
    pass + one (list, label) count aggregate; the majority pick is a
    max(struct) with a label tie-break, engine-exact on integers."""
    from ..operators.ivf import assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    assigned = assign_lists(emb, label_centroids(emb))
    counts = assigned.groupBy("list_id", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.max(
        F.struct(F.col("n").alias("n"), (-F.col("label")).alias("nl"))
    ).alias("m")
    per_list = counts.groupBy("list_id").agg(
        F.sum("n").alias("n_members"), m
    )
    return per_list.select(
        "list_id",
        "n_members",
        (-F.col("m.nl")).cast("int").alias("majority_label"),
        F.col("m.n").alias("n_majority"),
        (F.col("m.n") / F.col("n_members").cast("double")).alias(
            "purity"
        ),
    )


def _sql_emb_cluster_purity() -> str:
    return f"""
WITH {_sql_ivf_base()},
lab AS (
  SELECT a.vec_id, a.list_id, e.label
  FROM assigned a JOIN emb e USING (vec_id)),
counts AS (
  SELECT list_id, label, count(*) AS n FROM lab GROUP BY 1, 2),
pick AS (
  SELECT list_id, label, n FROM (
    SELECT *, row_number() OVER (PARTITION BY list_id
      ORDER BY n DESC, label ASC) AS rn
    FROM counts)
  WHERE rn = 1),
tot AS (SELECT list_id, CAST(sum(n) AS BIGINT) AS n_members
        FROM counts GROUP BY 1)
SELECT t.list_id, t.n_members, p.label AS majority_label,
       p.n AS n_majority,
       CAST(p.n AS DOUBLE) / t.n_members AS purity
FROM tot t JOIN pick p USING (list_id)"""


def q_emb_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary-quantization ANN: pack each 64-dim vector into
    ONE 64-bit sign code (64x smaller than the float vector — the
    representation a 10^9-vector corpus can afford to scan
    exhaustively), Hamming-scan the codes against the broadcast query
    codes with a map-side ``hamming <= dim/2 - 1`` radius cut, take
    the per-query top-``BQ_RERANK`` Hamming survivors, and re-rank
    those few by exact cosine over the float vectors (candidate list
    broadcast into the corpus scan — the floats never shuffle).
    Complements the PQ/IVF family with the third production
    quantization regime (1-bit). All-integer first stage, so the
    candidate set is engine-exact; the re-rank cosine is the
    bitwise-reproducible sequential fold."""
    from ..operators.similarity import bq_hamming_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = bq_hamming_topk(
        emb, queries, k=KNN_K, rerank=BQ_RERANK, radius=BQ_RADIUS
    )
    return out.select(
        "q_id",
        "id",
        "rank",
        F.col("hamming").cast("long").alias("hamming"),
        _r6("cos"),
    )


SQL_EMB_BQ_HAMMING = _sql_bq_hamming()


def q_win_vae_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2-M6 in-engine VAE TRAINING (reference core/nn/vae.py:79-202 +
    lit.py:84-92 criterion + train.py:96-108 data-parallel fit) — the
    last reference capability, now on the cluster: fit the MLP VAE
    over the flagship sliding windows by full-batch AdamW (3 epochs,
    the reference's kl_beta = 5e-4 / weight_decay = 1e-4) with
    grid-snapped exact-integer gradient reduction (bit-identical at
    any partitioning — operators/vaetrain.py's determinism contract,
    proven by tests/test_vaetrain.py), then emit each window's
    posterior-mean embedding through the same Arrow encode slot as
    the DCT/PCA twins. Training is iterative and non-SQL-expressible,
    so this is the registry's one rows-only gate entry (no DuckDB
    oracle); exactness is covered by the numpy-replay test instead.
    Per epoch: ONE scan of the pinned window frame + a ~300-key exact
    DECIMAL aggregate; shuffle bytes O(arrow_batches x params),
    independent of row count."""
    from ..operators.vaetrain import train_vae, vae_encode

    w = sliding_windows(
        _filled(spark, sf_dir).select("symbol", "time_idx", "close"),
        L=_DCT_L,
    ).select(
        "symbol",
        "window_id",
        "xs",
        F.xxhash64("symbol", "window_id").alias("uid"),
    )
    # 3 training epochs + encode = 4 scans: pin the window build once
    # (localCheckpoint — GC-reclaimed, not session-pinned)
    w = w.localCheckpoint(eager=True)
    p, _hist = train_vae(
        w, L=_DCT_L, hidden=16, k=_DCT_K, epochs=3, lr=1e-2,
        kl_beta=5e-4, weight_decay=1e-4, seed=7,
    )
    out = vae_encode(w, p)
    return out.select(
        "symbol",
        "window_id",
        *[
            _rne(F.element_at("emb", d + 1), f"e{d}", 6)
            for d in range(_DCT_K)
        ],
    )


def q_media_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the image corpus:
    64-bit average-hash per payload (operators/multimodal.py
    ahash_bands — integer-exact, one JVM projection pass), pairs at
    hamming ≤ 7. The 8 8-bit bands double as LSH blocking keys, and
    by pigeonhole ANY pair at hamming ≤ 7 shares an identical band —
    so the banded candidate join is EXHAUSTIVE at this threshold and
    the engine's bucket-join answer equals the oracle's brute-force
    all-pairs answer exactly (the oracle deliberately brute-forces to
    prove the banding loses nothing). Engine cost: candidates ∝
    Σ per-band-bucket df², never all-pairs; hamming is 8 xor+popcount
    ops on 8-byte codes — the payload bytes never join.

    Output is two row kinds in one frame (kind, k1, k2, v):
    ``('band', bi, n_buckets, cand_pairs)`` — one row per LSH band
    with its bucket count and Σ df·(df−1)/2 candidate-pair mass — and
    ``('pair', id_i, id_j, hamming)`` for each near-dup pair. The band
    tier is non-empty at EVERY scale factor, so the driver's oracle
    hash always covers real rows (r10 verdict: the pair-only output
    was vacuously green at SFs where the corpus has no near-dups),
    and it doubles as the banding-cost audit a 100 TB run would read
    before launching the candidate join."""
    from ..operators.multimodal import AHASH_BANDS, ahash_bands

    h = ahash_bands(_media(spark, sf_dir))
    h = h.localCheckpoint(eager=True)  # 3 consumers: cand x2 + rejoin
    cand = None
    for k in range(AHASH_BANDS):
        c = h.select(
            "media_id", F.lit(k).alias("bi"), F.col(f"band{k}").alias("bv")
        )
        cand = c if cand is None else cand.unionByName(c)
    pairs = (
        cand.alias("a")
        .join(cand.alias("b"), ["bi", "bv"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_i"),
            F.col("b.media_id").alias("id_j"),
        )
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("id_i"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(AHASH_BANDS)],
    )
    hb = h.select(
        F.col("media_id").alias("id_j"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(AHASH_BANDS)],
    )
    ham = sum(
        F.expr(f"bit_count(a{k} ^ b{k})") for k in range(AHASH_BANDS)
    )
    pair_rows = (
        pairs.join(ha, "id_i")
        .join(hb, "id_j")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= AHASH_MAX_DIST)
        .select(
            F.lit("pair").alias("kind"),
            F.col("id_i").alias("k1"),
            F.col("id_j").alias("k2"),
            F.col("hamming").alias("v"),
        )
    )
    band_rows = (
        cand.groupBy("bi", "bv")
        .agg(F.count(F.lit(1)).alias("df"))
        .groupBy("bi")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("df * (df - 1) div 2")).alias("cand_pairs"),
        )
        .select(
            F.lit("band").alias("kind"),
            F.col("bi").cast("long").alias("k1"),
            F.col("n_buckets").cast("long").alias("k2"),
            F.col("cand_pairs").cast("long").alias("v"),
        )
    )
    return band_rows.unionByName(pair_rows)


def _sql_media_ahash_near_dup() -> str:
    from ..operators.multimodal import AHASH_BAND_BITS, AHASH_BANDS

    hexpos = "strpos('0123456789ABCDEF', substring(hx, ({pos})::BIGINT, 1))"
    byte_hi = hexpos.format(pos="2 * j + 1")
    byte_lo = hexpos.format(pos="2 * j + 2")
    w = AHASH_BAND_BITS
    band_cols = ",\n         ".join(
        f"list_sum(list_transform(range(0, {w}),"
        f" t -> bt[({k * w} + t + 1)::BIGINT]"
        f" * (1::BIGINT << t)))::BIGINT AS a{k}"
        for k in range(AHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.a{k}, b.a{k}))" for k in range(AHASH_BANDS)
    )
    band_unpivot = "\n  UNION ALL ".join(
        f"SELECT media_id, {k} AS bi, a{k} AS bv FROM bands"
        for k in range(AHASH_BANDS)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         strlen(text)::BIGINT AS n
  FROM documents WHERE doc_id % 3 = 0 AND strlen(text) >= 1),
d AS (
  SELECT media_id, n,
         list_transform(range(0, n),
           j -> ({byte_hi} - 1) * 16 + ({byte_lo} - 1)) AS bytes
  FROM m),
s AS (SELECT media_id, n, bytes, list_sum(bytes) AS S FROM d),
bits AS (
  SELECT media_id,
         list_transform(range(0, 64), i -> CASE WHEN
             coalesce(list_sum(
               bytes[((i * n) // 64 + 1)::BIGINT
                     : (((i + 1) * n) // 64)::BIGINT]), 0) * n
             > S * (((i + 1) * n) // 64 - (i * n) // 64)
           THEN 1::BIGINT ELSE 0::BIGINT END) AS bt
  FROM s),
bands AS (
  SELECT media_id,
         {band_cols}
  FROM bits),
ub AS (
  {band_unpivot}),
bstats AS (SELECT bi, bv, count(*) AS df FROM ub GROUP BY 1, 2),
brows AS (
  SELECT 'band' AS kind, bi::BIGINT AS k1, count(*)::BIGINT AS k2,
         sum(df * (df - 1) // 2)::BIGINT AS v
  FROM bstats GROUP BY bi),
prows AS (
  SELECT 'pair' AS kind, id_i AS k1, id_j AS k2, hamming AS v FROM (
    SELECT a.media_id AS id_i, b.media_id AS id_j,
           ({ham})::BIGINT AS hamming
    FROM bands a JOIN bands b ON a.media_id < b.media_id)
  WHERE hamming <= {AHASH_MAX_DIST})
SELECT * FROM brows UNION ALL SELECT * FROM prows"""


def q_emb_rq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level residual quantization (the RQ sibling of the PQ/BQ
    family): level 1 is the IVF label-mean quantizer (the exact
    persisted-quantizer contract every IVF-family query shares);
    level 2 quantizes the RESIDUAL v − c1 against 16 centroids
    trained as sign-orthant means of the first four residual dims —
    the deterministic stand-in for a residual k-means, same device as
    the PQ codebook's label-grouped means. Assignment is the
    broadcast-cross-join + map-side min_by argmin (crossed rows never
    shuffle); distances snap to 1e-6 before the argmin so the
    (dist, code) tie-break is engine-exact; residual coordinates snap
    to 1e-9 before the codebook's exact DECIMAL mean. Emits both
    codes and the final reconstruction error — approximation is a
    measured number, like every sketch here."""
    from ..functions.distance import dist_l2_fixed
    from ..operators.ivf import EMB_DIM, assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb).localCheckpoint(eager=True)
    asg = assign_lists(emb, cent)
    res = asg.join(
        F.broadcast(
            cent.select(F.col("label").alias("list_id"), "cvec")
        ),
        "list_id",
    ).select(
        "vec_id",
        "list_id",
        F.expr("zip_with(v, cvec, (a, b) -> a - b)").alias("r"),
    )
    orth = sum(
        (F.element_at("r", d + 1) > 0).cast("int") * F.lit(2**d)
        for d in range(RQ_ORTH_DIMS)
    )
    res = res.withColumn("orth", orth).localCheckpoint(eager=True)
    ex = res.select(
        "orth", F.posexplode("r").alias("pos", "x")
    ).select(
        "orth",
        "pos",
        F.floor(F.col("x") * 1e9 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    cb2d = (
        ex.groupBy("orth", "pos")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("cnt"))
        .select(
            "orth",
            "pos",
            (
                F.floor(
                    F.col("sq").cast("double")
                    / F.col("cnt")
                    / F.lit(1e9)
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
                + F.lit(0.0)
            ).alias("c"),
        )
    )
    cb2 = cb2d.groupBy("orth").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("c2")
    )
    cand = res.crossJoin(
        F.broadcast(cb2.select(F.col("orth").alias("code2"), "c2"))
    ).withColumn(
        "d2s",
        F.floor(
            dist_l2_fixed(F.col("r"), F.col("c2"), EMB_DIM) * 1e6
            + F.lit(0.5)
        )
        / 1e6,
    )
    best = cand.groupBy("vec_id").agg(
        F.first("list_id").alias("code1"),
        F.first("r").alias("r"),
        F.min_by(
            F.struct(F.col("code2"), F.col("c2")),
            F.struct(F.col("d2s"), F.col("code2")),
        ).alias("m"),
    )
    return best.select(
        "vec_id",
        F.col("code1").cast("int").alias("code1"),
        F.col("m.code2").cast("int").alias("code2"),
        _rne(
            dist_l2_fixed(F.col("r"), F.col("m.c2"), EMB_DIM),
            "recon_err",
            6,
        ),
    )


def _sql_emb_rq_codes() -> str:
    l2_rc = _sql_l2("o.r", "b.c2")
    orth_bits = " + ".join(
        f"{2**d} * (r[{d + 1}] > 0)::INT" for d in range(RQ_ORTH_DIMS)
    )
    return f"""
WITH {_sql_ivf_base()},
wc AS (
  SELECT a.vec_id, a.list_id,
         list_transform(range(1, 65), i -> a.v[i] - c.cvec[i]) AS r
  FROM assigned a JOIN cent c ON a.list_id = c.label),
orth AS (SELECT *, {orth_bits} AS orth FROM wc),
ex AS (
  SELECT orth AS o, i AS pos,
         floor(r[i] * 1000000000.0 + 0.5)::DECIMAL(38,0) AS q
  FROM orth, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
cb2d AS (
  SELECT o, pos,
         floor(sum(q)::DOUBLE / count(*) / 1000000000.0
               * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM ex GROUP BY 1, 2),
cb2 AS (SELECT o, list(c ORDER BY pos) AS c2 FROM cb2d GROUP BY 1),
cand AS (
  SELECT o.vec_id, o.list_id, o.r, b.o AS code2, b.c2,
         floor({l2_rc} * 1000000.0 + 0.5) / 1000000.0 AS d2s
  FROM orth o CROSS JOIN cb2 b),
best AS (
  SELECT vec_id, list_id, r, code2, c2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY d2s ASC, code2 ASC) AS rk
    FROM cand)
  WHERE rk = 1)
SELECT vec_id, list_id::INT AS code1, code2::INT AS code2,
       {_sql_rne(_sql_l2('r', 'c2'), 'recon_err', 6)}
FROM best"""


def q_emb_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health card — the balance audit an ANN operator reads
    BEFORE trusting nprobe latency at scale: list-size min/max/empty
    count and the FAISS imbalance factor K·Σ(size²)/N² (1.0 = perfectly
    balanced; the expected per-query scan cost multiplier under
    size-proportional probe hits). Reuses the exact shared quantizer
    (label_centroids + assign_lists — same contract as every IVF-family
    query, oracle twin _sql_ivf_base, so this audit measures the REAL
    index layout, not a lookalike). Empty lists come from the
    centroid-side LEFT join. All-integer inputs, one final division;
    sums ride DECIMAL so the card survives 100 TB list sizes."""
    from ..operators.ivf import assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb)
    sizes = (
        assign_lists(emb, cent)
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    per = (
        cent.select(F.col("label").alias("list_id"))
        .join(sizes, "list_id", "left")
        .withColumn("sz", F.coalesce(F.col("sz"), F.lit(0)))
    )
    szd = F.col("sz").cast("decimal(38,0)")
    card = per.agg(
        F.count(F.lit(1)).cast("long").alias("k_lists"),
        F.sum("sz").cast("long").alias("n_vecs"),
        F.min("sz").cast("long").alias("min_sz"),
        F.max("sz").cast("long").alias("max_sz"),
        F.sum(F.when(F.col("sz") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
        F.sum(szd * szd).alias("ssq"),
    )
    kd = F.col("k_lists").cast("decimal(38,0)")
    nd = F.col("n_vecs").cast("decimal(38,0)")
    imb = F.when(
        F.col("n_vecs") > 0,
        (kd * F.col("ssq")).cast("double") / (nd * nd).cast("double"),
    )
    return card.select(
        "k_lists",
        "n_vecs",
        "min_sz",
        "max_sz",
        "n_empty",
        _rne(imb, "imbalance", 8),
    )


def _sql_emb_ivf_balance() -> str:
    return f"""
WITH {_sql_ivf_base()},
sizes AS (SELECT list_id, count(*) AS sz FROM assigned GROUP BY 1),
per AS (
  SELECT c.label AS list_id, coalesce(s.sz, 0) AS sz
  FROM cent c LEFT JOIN sizes s ON c.label = s.list_id),
card AS (
  SELECT count(*)::BIGINT AS k_lists, sum(sz)::BIGINT AS n_vecs,
         min(sz)::BIGINT AS min_sz, max(sz)::BIGINT AS max_sz,
         sum(CASE WHEN sz = 0 THEN 1 ELSE 0 END)::BIGINT AS n_empty,
         sum(sz::DECIMAL(38,0) * sz::DECIMAL(38,0)) AS ssq
  FROM per)
SELECT k_lists, n_vecs, min_sz, max_sz, n_empty,
       {_sql_rne(
           'CASE WHEN n_vecs > 0 THEN '
           '(k_lists::DECIMAL(38,0) * ssq)::DOUBLE '
           '/ (n_vecs::DECIMAL(38,0) * n_vecs::DECIMAL(38,0))::DOUBLE END',
           'imbalance', 8)}
FROM card"""


def q_emb_ivf_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall-vs-cost CURVE — the number that decides nprobe
    in production: for nprobe ∈ {1, 2, 4}, mean recall@k against the
    exact top-k AND the mean scanned-candidate count per query (the
    price paid for that recall). emb_ivf_recall fixes nprobe and
    reports per-query recall; this card sweeps it and aggregates, so
    capacity planning reads one 3-row frame. Everything stays exact:
    hit counts and candidate counts are integers (both rankings break
    ties on vec_id over identical fold-exact distances), so
    mean_recall = Σhits/(n_q·k) and mean_scanned = Σcand/n_q are
    single divisions of exact integers. Queries ride the FIXED
    deterministic anchor budget (exact-GT side O(n·K), K constant —
    r12 verdict item 1). The sweep is ONE single-pass plan (r13
    verdict item 2, the doc_dedup_threshold_sweep pattern): the
    probed candidate set is computed once at the widest nprobe with
    each candidate tagged by its probe rank, a literal nprobe explode
    fans it over the thresholds, and one groupBy(nprobe) scores every
    branch — replacing the r12 per-branch loop (3 filter+agg jobs +
    an eager candidate checkpoint) with one job; the exact brute-force
    panel rides along as a broadcast hit-marker join. Distances are
    fold-shaped (dist_l2, bitwise the flat form): every frame here is
    anchor-budget-bounded, and in a 340-query bench session the
    codegen cache is long evicted, so the flat 64-term form paid a
    multi-second janino recompile EVERY run while the interpreted
    fold pays a per-row constant on budget-bounded rows. assign_lists
    keeps its flat form — it is the production index build. (At
    layout scale the probed-list partition pruning of ivf_probe_layout
    replaces the assignment join.)"""
    from ..functions.distance import dist_l2
    from ..operators.ivf import assign_lists, label_centroids

    emb = _emb(spark, sf_dir)
    q = (
        anchor_sample(emb, IVF_Q_BUDGET, cols=("vec_id", "v"))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .localCheckpoint(eager=True)
    )
    centroids = label_centroids(emb).localCheckpoint(eager=True)
    assigned = assign_lists(emb, centroids)
    bf = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            dist_l2(F.col("v"), F.col("qv")).alias("dist"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("dist").asc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= KNN_K)
        .select("q_id", "vec_id", F.lit(1).alias("__hit"))
    )
    # every query's centroid ranking up to the WIDEST nprobe, tagged
    # with probe_rk — an nprobe=j branch is `probe_rk <= j`
    max_np = max(IVF_CURVE_NPROBES)
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__cdist").asc(), F.col("label_c").asc()
    )
    probes = (
        q.crossJoin(
            F.broadcast(
                centroids.select(F.col("label").alias("label_c"), "cvec")
            )
        )
        .withColumn("__cdist", dist_l2(F.col("qv"), F.col("cvec")))
        .withColumn("probe_rk", F.row_number().over(wq))
        .filter(F.col("probe_rk") <= max_np)
        .select("q_id", "qv", F.col("label_c").alias("list_id"), "probe_rk")
    )
    cand = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "probe_rk",
            dist_l2(F.col("v"), F.col("qv")).alias("dist"),
        )
    )
    sweep = cand.select(
        "*",
        F.explode(
            F.array(*[F.lit(int(n)) for n in IVF_CURVE_NPROBES])
        ).alias("nprobe"),
    ).filter(F.col("probe_rk") <= F.col("nprobe"))
    wk = Window.partitionBy("nprobe", "q_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    flagged = sweep.withColumn("rank", F.row_number().over(wk)).join(
        F.broadcast(bf), ["q_id", "vec_id"], "left"
    )
    agg = flagged.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("total_scanned"),
        F.sum(
            F.when(
                (F.col("rank") <= KNN_K) & (F.col("__hit") == 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("total_hits"),
    )
    # a literal left spine keeps one row per threshold even on a
    # degenerate corpus (the r12 loop's agg-without-groupBy semantics)
    nps = spark.createDataFrame(
        [(int(n),) for n in IVF_CURVE_NPROBES], "nprobe int"
    )
    n_q = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return (
        nps.join(F.broadcast(agg), "nprobe", "left")
        .crossJoin(F.broadcast(n_q))
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.col("n_queries").cast("long").alias("n_queries"),
            F.coalesce(F.col("total_hits"), F.lit(0))
            .cast("long")
            .alias("total_hits"),
            F.coalesce(F.col("total_scanned"), F.lit(0))
            .cast("long")
            .alias("total_scanned"),
            _rne(
                F.coalesce(F.col("total_hits"), F.lit(0)).cast("double")
                / (
                    F.col("n_queries").cast("double")
                    * F.lit(float(KNN_K))
                ),
                "mean_recall",
                8,
            ),
            _rne(
                F.coalesce(F.col("total_scanned"), F.lit(0)).cast(
                    "double"
                )
                / F.col("n_queries").cast("double"),
                "mean_scanned",
                8,
            ),
        )
    )


def _sql_emb_ivf_probe_curve() -> str:
    l2_qc = _sql_l2("q.qv", "c.cvec")
    l2_aq = _sql_l2("a.v", "p.qv")
    l2_bf = _sql_l2("e.v", "q.qv")
    blocks = []
    for np_ in IVF_CURVE_NPROBES:
        blocks.append(f"""
SELECT {np_}::BIGINT AS nprobe,
       (SELECT count(*) FROM q)::BIGINT AS n_queries,
       (SELECT count(*) FROM (
          SELECT b.q_id, b.vec_id FROM bf b
          JOIN (SELECT q_id, vec_id FROM (
                  SELECT p.q_id, a.vec_id,
                         row_number() OVER (PARTITION BY p.q_id
                           ORDER BY {l2_aq} ASC, a.vec_id ASC) AS rank
                  FROM assigned a
                  JOIN (SELECT q_id, qv, list_id FROM (
                          SELECT q.q_id, q.qv, c.label AS list_id,
                                 row_number() OVER (PARTITION BY q.q_id
                                   ORDER BY {l2_qc} ASC, c.label ASC)
                                   AS rk
                          FROM q CROSS JOIN cent c)
                        WHERE rk <= {np_}) p USING (list_id)
                  WHERE a.vec_id <> p.q_id)
                WHERE rank <= {KNN_K}) i
          ON b.q_id = i.q_id AND b.vec_id = i.vec_id))::BIGINT
         AS total_hits,
       (SELECT count(*) FROM assigned a
        JOIN (SELECT q_id, list_id FROM (
                SELECT q.q_id, c.label AS list_id,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY {l2_qc} ASC, c.label ASC) AS rk
                FROM q CROSS JOIN cent c)
              WHERE rk <= {np_}) p USING (list_id)
        WHERE a.vec_id <> p.q_id)::BIGINT AS total_scanned""")
    sels = " UNION ALL ".join(blocks)
    return f"""
WITH {_sql_ivf_base()},
q AS (SELECT vec_id AS q_id, v AS qv FROM emb
      {_sql_anchor_clause(IVF_Q_BUDGET)}),
bf AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2_bf} ASC, e.vec_id ASC) AS rn
    FROM emb e JOIN q ON e.vec_id <> q.q_id)
  WHERE rn <= {KNN_K}),
curve AS ({sels})
SELECT nprobe, n_queries, total_hits, total_scanned,
       {_sql_rne(
           'total_hits::DOUBLE / (n_queries::DOUBLE * ' +
           str(float(KNN_K)) + ')',
           'mean_recall', 8)},
       {_sql_rne('total_scanned::DOUBLE / n_queries::DOUBLE',
                 'mean_scanned', 8)}
FROM curve"""


def q_emb_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-confidence card per IVF list: the margin between
    each vector's nearest and second-nearest centroid distances
    (d₂ − d₁ — small margins mean boundary vectors whose neighbors
    live in the UNPROBED list, the per-list predictor of where
    nprobe=1 recall is lost; read next to emb_ivf_balance and the
    probe curve). Distances are the shared fold-exact flat-codegen
    L2 against the broadcast centroids; the two nearest ranks break
    ties on the centroid label; per-row margins snap to the 1e-12
    grid and sum in exact DECIMAL. One broadcast join + two windows
    on the vector key + one map-side groupBy."""
    from ..functions.distance import dist_l2_fixed
    from ..operators.ivf import EMB_DIM, label_centroids

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb)
    d = emb.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("clabel"), "cvec"))
    ).select(
        "vec_id",
        "clabel",
        dist_l2_fixed(F.col("v"), F.col("cvec"), EMB_DIM).alias("cd"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("cd").asc(), F.col("clabel").asc()
    )
    two = d.withColumn("rk", F.row_number().over(wv)).filter(
        F.col("rk") <= 2
    )
    piv = two.groupBy("vec_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("clabel"))).alias(
            "list_id"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("cd"))).alias("d1"),
        F.max(F.when(F.col("rk") == 2, F.col("cd"))).alias("d2"),
    ).filter(F.col("d2").isNotNull())
    mq = (
        F.floor((F.col("d2") - F.col("d1")) * 1e12 + F.lit(0.5)) / 1e12
    ).cast("decimal(30,12)")
    agg = piv.withColumn("mq", mq).groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mq").alias("sm"),
        F.min("mq").alias("min_m"),
    )
    return agg.select(
        F.col("list_id").cast("long").alias("list_id"),
        F.col("n").cast("long").alias("n"),
        _rne(
            F.col("sm").cast("double") / F.col("n").cast("double"),
            "mean_margin",
            8,
        ),
        _rne(F.col("min_m").cast("double"), "min_margin", 8),
    )


def _sql_emb_centroid_margin() -> str:
    l2_ec = _sql_l2("e.v", "c.cvec")
    return f"""
WITH {_sql_ivf_base()},
d AS (
  SELECT e.vec_id, c.label AS clabel, {l2_ec} AS cd
  FROM emb e CROSS JOIN cent c),
two AS (
  SELECT vec_id, clabel, cd,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY cd ASC, clabel ASC) AS rk
  FROM d QUALIFY rk <= 2),
piv AS (
  SELECT vec_id,
         max(CASE WHEN rk = 1 THEN clabel END) AS list_id,
         max(CASE WHEN rk = 1 THEN cd END) AS d1,
         max(CASE WHEN rk = 2 THEN cd END) AS d2
  FROM two GROUP BY 1
  HAVING max(CASE WHEN rk = 2 THEN cd END) IS NOT NULL),
m AS (
  SELECT list_id,
         CAST(floor((d2 - d1) * 1000000000000.0 + 0.5)
              / 1000000000000.0 AS DECIMAL(30,12)) AS mq
  FROM piv),
agg AS (
  SELECT list_id, count(*) AS n, sum(mq) AS sm, min(mq) AS min_m
  FROM m GROUP BY 1)
SELECT list_id::BIGINT AS list_id, n::BIGINT AS n,
       {_sql_rne('sm::DOUBLE / n::DOUBLE', 'mean_margin', 8)},
       {_sql_rne('min_m::DOUBLE', 'min_margin', 8)}
FROM agg"""


EMB_DIM = 64


def q_emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-isotropy card per label — the geometry check under
    every cosine-based retrieval/dedup stage (anisotropic embeddings —
    all vectors sharing a dominant direction — inflate every cosine
    and defeat threshold-based near-dup cuts; the fix literature:
    mean-centering / whitening). Per label over L2-normalized vectors:
    mean pairwise cosine via the exact identity (‖Σu‖² − Σ‖u‖²) /
    (n(n−1)) — NO pair expansion, one explode + one (label, dim)
    map-side-combined aggregate — and the mean-vector norm ‖Σu‖/n
    (→0 for isotropic clouds). Each normalized coordinate snaps to
    the 1e-6 grid so the per-dim sums and both Σ-terms ride exact
    DECIMAL; the per-vector norm is one sequential left-fold +
    sqrt + divide, deterministic IEEE in both engines (the _sql_norm
    device). Zero vectors drop identically."""
    emb = _emb(spark, sf_dir)
    nrm = F.sqrt(
        F.aggregate(
            "v", F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    base = emb.select("label", "v", nrm.alias("nrm")).filter(
        F.col("nrm") > 0
    )
    cnt = base.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    e = base.select(
        "label", "nrm", F.posexplode("v").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x") / F.col("nrm") * F.lit(1e6) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    dims = e.groupBy("label", "dim").agg(
        F.sum("q").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("q2"),
    )
    lab = dims.groupBy("label").agg(
        F.sum(F.col("sd") * F.col("sd")).alias("s2s"),
        F.sum("q2").alias("sq2"),
    )
    j = lab.join(F.broadcast(cnt), "label")
    n_ = F.col("n").cast("double")
    avg_cos = F.when(
        F.col("n") >= 2,
        (F.col("s2s") - F.col("sq2")).cast("double")
        / (n_ * (n_ - F.lit(1.0)))
        / F.lit(1e12),
    )
    mean_norm = (
        F.sqrt(F.col("s2s").cast("double")) / n_ / F.lit(1e6)
    )
    return j.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n"),
        _rne(avg_cos, "avg_pairwise_cos", 8),
        _rne(mean_norm, "mean_vec_norm", 8),
    )


def _sql_emb_isotropy() -> str:
    return f"""
WITH v AS (
  SELECT label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
b AS (
  SELECT label, v, {_sql_norm('v')} AS nrm FROM v
  WHERE {_sql_norm('v')} > 0),
e AS (
  SELECT label, i - 1 AS dim,
         floor(v[i] / nrm * 1000000.0 + 0.5)::DECIMAL(38,0) AS q
  FROM b, LATERAL (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)),
dims AS (
  SELECT label, dim, sum(q) AS sd, sum(q * q) AS q2
  FROM e GROUP BY 1, 2),
lab AS (
  SELECT label, sum(sd * sd) AS s2s, sum(q2) AS sq2
  FROM dims GROUP BY 1),
cnt AS (SELECT label, count(*) AS n FROM b GROUP BY 1)
SELECT lab.label::BIGINT AS label, n::BIGINT AS n,
       {_sql_rne(
           'CASE WHEN n >= 2 THEN (s2s - sq2)::DOUBLE'
           ' / (n::DOUBLE * (n::DOUBLE - 1.0)) / 1e12 END',
           'avg_pairwise_cos', 8)},
       {_sql_rne(
           'sqrt(s2s::DOUBLE) / n::DOUBLE / 1000000.0',
           'mean_vec_norm', 8)}
FROM lab JOIN cnt ON lab.label = cnt.label"""


KNN_RECIP_K = 5


def q_emb_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph reciprocity card — the fraction of directed top-k
    edges whose reverse edge also exists: the hubness diagnostic for
    a vector corpus (high-dimensional anisotropy creates hub vectors
    that appear in everyone's top-k without reciprocating — low
    reciprocity predicts poor kNN-graph clustering and inflated ANN
    recall variance; reads next to emb_isotropy). Runs on the FIXED
    deterministic anchor budget (top-ANCHOR_BUDGET vec_ids by portable
    hash — no rand(), and no corpus-fraction dial: the pair frame is
    budget², CONSTANT at any corpus size, r12 verdict item 1);
    distances are the flat-codegen L2 (bitwise equal to the oracle's
    sequential fold), the per-query top-k rank runs as
    WindowGroupLimit, and the reverse-edge probe is one self-join
    on the (lo, hi) edge key. Output: one row per label + the
    corpus-level row (label = -1). The budget frame is
    localCheckpoint(eager)ed: both self-join sides read K
    materialized rows instead of re-running (and re-compiling) the
    TakeOrdered pick per side."""
    emb = anchor_sample(_emb(spark, sf_dir), ANCHOR_BUDGET).localCheckpoint(
        eager=True
    )
    a = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    b = emb.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    pairs = a.join(b, F.col("qid") != F.col("nid")).select(
        "qid",
        "qlabel",
        "nid",
        dist_l2_fixed64(F.col("qv"), F.col("nv")).alias("d"),
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("d").asc(), F.col("nid").asc()
    )
    topk = pairs.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= KNN_RECIP_K
    )
    fwd = topk.select("qid", "qlabel", "nid")
    rev = topk.select(
        F.col("nid").alias("qid"), F.col("qid").alias("nid")
    )
    marked = fwd.join(rev, ["qid", "nid"], "left_semi").select(
        "qid", "qlabel"
    )
    recip = marked.groupBy("qlabel").agg(
        F.count(F.lit(1)).alias("n_recip")
    )
    tot = fwd.groupBy("qlabel").agg(F.count(F.lit(1)).alias("n_edges"))
    per = tot.join(recip, "qlabel", "left").select(
        F.col("qlabel").cast("long").alias("label"),
        "n_edges",
        F.coalesce(F.col("n_recip"), F.lit(0)).alias("n_recip"),
    )
    allrow = per.groupBy().agg(
        F.lit(-1).cast("long").alias("label"),
        F.sum("n_edges").alias("n_edges"),
        F.sum("n_recip").alias("n_recip"),
    )
    out = per.unionAll(allrow)
    return out.select(
        "label",
        F.col("n_edges").cast("long").alias("n_edges"),
        _rne(
            F.col("n_recip").cast("double")
            / F.col("n_edges").cast("double"),
            "reciprocity",
            8,
        ),
    )


def _sql_emb_knn_reciprocity() -> str:
    return f"""
WITH s AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
  FROM embeddings {_sql_anchor_clause(ANCHOR_BUDGET)}),
pairs AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid,
         {_sql_l2('a.v', 'b.v')} AS d
  FROM s a JOIN s b ON a.vec_id <> b.vec_id),
topk AS (
  SELECT qid, qlabel, nid,
         row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
  FROM pairs QUALIFY rn <= {KNN_RECIP_K}),
marked AS (
  SELECT f.qid, f.qlabel
  FROM topk f
  WHERE EXISTS (SELECT 1 FROM topk r
                WHERE r.qid = f.nid AND r.nid = f.qid)),
per AS (
  SELECT t.qlabel AS label, count(*) AS n_edges,
         (SELECT count(*) FROM marked m WHERE m.qlabel = t.qlabel)
           AS n_recip
  FROM topk t GROUP BY 1),
unioned AS (
  SELECT label, n_edges, n_recip FROM per
  UNION ALL
  SELECT -1 AS label, sum(n_edges), sum(n_recip) FROM per)
SELECT label::BIGINT AS label, n_edges::BIGINT AS n_edges,
       {_sql_rne('n_recip::DOUBLE / n_edges::DOUBLE',
                 'reciprocity', 8)}
FROM unioned"""


def q_emb_triplet_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-margin health card for labeled embeddings — for each
    sampled anchor, the gap d(nearest OTHER-label) − d(nearest
    SAME-label): the metric-learning objective read back as an eval
    (violations = anchors whose nearest neighbor crosses the label
    boundary — exactly what degrades kNN classification and
    label-stratified retrieval; reads next to emb_cluster_purity /
    emb_hard_negatives). Anchors ride the FIXED deterministic anchor
    budget (top-ANCHOR_BUDGET by portable hash — O(n·K) with K
    constant at any corpus size, r12 verdict item 1; a %-of-corpus
    dial would be quadratic); candidates are the FULL corpus, reduced
    by ONE aggregate per anchor (two conditional mins — no window, no
    pair materialization); margins snap to the 1e-9 grid for exact
    DECIMAL means. Anchors whose label has no second vector drop
    identically in both engines."""
    emb = _emb(spark, sf_dir)
    anchors = (
        anchor_sample(emb, ANCHOR_BUDGET)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("label").alias("qlabel"),
        )
        .localCheckpoint(eager=True)
    )
    cands = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("v").alias("nv"),
        F.col("label").alias("nlabel"),
    )
    d = dist_l2_fixed64(F.col("qv"), F.col("nv"))
    # project the flat 64-dim distance ONCE per pair, then aggregate
    # over the scalar — instantiating it inside both conditional mins
    # doubles the whole-stage-codegen compile cost, the dominant cost
    # of this card at every measured scale (the knn-suite finding)
    pairs = cands.join(
        F.broadcast(anchors), F.col("qid") != F.col("nid")
    ).select(
        "qid",
        "qlabel",
        (F.col("nlabel") == F.col("qlabel")).alias("same"),
        d.alias("d"),
    )
    per = (
        pairs.groupBy("qid", "qlabel")
        .agg(
            F.min(F.when(F.col("same"), F.col("d"))).alias("dpos"),
            F.min(F.when(~F.col("same"), F.col("d"))).alias("dneg"),
        )
        .filter(F.col("dpos").isNotNull() & F.col("dneg").isNotNull())
    )
    mq = F.floor(
        (F.col("dneg") - F.col("dpos")) * F.lit(1e9) + F.lit(0.5)
    ).cast("decimal(38,0)")
    agg = per.select("qlabel", mq.alias("mq")).groupBy("qlabel").agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.sum(F.when(F.col("mq") < 0, 1).otherwise(0)).alias("n_viol"),
        F.sum("mq").alias("sm"),
    )
    n_ = F.col("n_anchors").cast("double")
    return agg.select(
        F.col("qlabel").cast("long").alias("label"),
        F.col("n_anchors").cast("long").alias("n_anchors"),
        _rne(F.col("n_viol").cast("double") / n_, "violation_rate", 8),
        _rne(F.col("sm").cast("double") / n_ / F.lit(1e9),
             "mean_margin", 8),
    )


def _sql_emb_triplet_margin() -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
  FROM embeddings),
anch AS (
  SELECT vec_id, v, label FROM emb {_sql_anchor_clause(ANCHOR_BUDGET)}),
per AS (
  SELECT a.vec_id AS qid, a.label AS qlabel,
         min(CASE WHEN b.label = a.label
                  THEN {_sql_l2('a.v', 'b.v')} END) AS dpos,
         min(CASE WHEN b.label <> a.label
                  THEN {_sql_l2('a.v', 'b.v')} END) AS dneg
  FROM anch a JOIN emb b ON a.vec_id <> b.vec_id
  GROUP BY 1, 2
  HAVING dpos IS NOT NULL AND dneg IS NOT NULL),
m AS (
  SELECT qlabel,
         floor((dneg - dpos) * 1000000000.0 + 0.5)::DECIMAL(38,0) AS mq
  FROM per),
agg AS (
  SELECT qlabel, count(*) AS n_anchors,
         sum(CASE WHEN mq < 0 THEN 1 ELSE 0 END) AS n_viol,
         sum(mq) AS sm
  FROM m GROUP BY 1)
SELECT qlabel::BIGINT AS label, n_anchors::BIGINT AS n_anchors,
       {_sql_rne('n_viol::DOUBLE / n_anchors::DOUBLE',
                 'violation_rate', 8)},
       {_sql_rne('sm::DOUBLE / n_anchors::DOUBLE / 1000000000.0',
                 'mean_margin', 8)}
FROM agg"""


def q_emb_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher discriminant ratio of the labeled embedding corpus —
    between-class vs within-class scatter (the one-number answer to
    'are these labels linearly separable in this embedding space';
    low Fisher predicts poor kNN/centroid classification BEFORE any
    model is trained — reads next to emb_cluster_purity and
    emb_triplet_margin). Scatter identities keep everything
    aggregate-shaped: within = Σ‖x‖² − Σ_l ‖S_l‖²/n_l, between =
    Σ_l ‖S_l‖²/n_l − ‖S‖²/N — one explode + one (label, dim)
    exact-DECIMAL aggregate, NO per-pair or per-centroid join. The
    per-(label,dim) and per-dim division terms snap to the 1e-6 grid
    into DECIMAL sums (order-free); the F statistic scales by the
    (N−K)/(K−1) dof ratio. Output is one row."""
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "label", F.posexplode("v").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x") * 1e6 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    nl = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    ld = e.groupBy("label", "dim").agg(
        F.sum("q").alias("s_ld"),
        F.sum(F.col("q") * F.col("q")).alias("q2_ld"),
    ).join(F.broadcast(nl), "label")
    t_l = F.floor(
        (F.col("s_ld") * F.col("s_ld")).cast("double")
        / F.col("n_l").cast("double")
        / F.lit(1e12)
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    mid = ld.select(
        "dim",
        "s_ld",
        F.col("q2_ld").alias("q2"),
        t_l.alias("tl"),
        "label",
    )
    dims = mid.groupBy("dim").agg(
        F.sum("s_ld").alias("s_d"),
        F.sum("q2").alias("q2_d"),
        F.sum("tl").alias("tl_d"),
    )
    ntot = emb.agg(
        F.count(F.lit(1)).alias("nn"),
        F.countDistinct("label").alias("kk"),
    )
    t_g = F.floor(
        (F.col("s_d") * F.col("s_d")).cast("double")
        / F.col("nn").cast("double")
        / F.lit(1e12)
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    j = dims.crossJoin(F.broadcast(ntot)).select(
        "nn",
        "kk",
        "q2_d",
        "tl_d",
        t_g.alias("tg"),
    )
    agg = j.groupBy("nn", "kk").agg(
        F.sum("q2_d").alias("sq2"),
        F.sum("tl_d").alias("stl"),
        F.sum("tg").alias("stg"),
    )
    # units: q² terms are 1e12-scaled; tl/tg snapped at 1e6 of the
    # 1e12-descaled value -> descale consistently
    within = F.col("sq2").cast("double") / F.lit(1e12) - F.col(
        "stl"
    ).cast("double") / F.lit(1e6)
    between = (
        F.col("stl").cast("double") - F.col("stg").cast("double")
    ) / F.lit(1e6)
    n_ = F.col("nn").cast("double")
    k_ = F.col("kk").cast("double")
    fisher = F.when(
        (within > 0) & (k_ > 1),
        (between / (k_ - F.lit(1.0))) / (within / (n_ - k_)),
    )
    return agg.select(
        F.col("nn").cast("long").alias("n_vectors"),
        F.col("kk").cast("long").alias("n_labels"),
        _rne(between, "between_scatter", 6),
        _rne(within, "within_scatter", 6),
        _rne(fisher, "fisher_f", 8),
    )


def _sql_emb_fisher_ratio() -> str:
    return f"""
WITH e AS (
  SELECT label, i - 1 AS dim,
         floor(embedding[i]::DOUBLE * 1000000.0 + 0.5)
           ::DECIMAL(38,0) AS q
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)),
nl AS (SELECT label, count(*) AS n_l FROM embeddings GROUP BY 1),
ld AS (
  SELECT e.label, e.dim, sum(q) AS s_ld, sum(q * q) AS q2_ld
  FROM e GROUP BY 1, 2),
mid AS (
  SELECT ld.dim, ld.s_ld, ld.q2_ld,
         floor((ld.s_ld * ld.s_ld)::DOUBLE / nl.n_l::DOUBLE / 1e12
               * 1000000.0 + 0.5)::DECIMAL(38,0) AS tl
  FROM ld JOIN nl ON ld.label = nl.label),
dims AS (
  SELECT dim, sum(s_ld) AS s_d, sum(q2_ld) AS q2_d, sum(tl) AS tl_d
  FROM mid GROUP BY 1),
nt AS (SELECT count(*) AS nn, count(DISTINCT label) AS kk
       FROM embeddings),
j AS (
  SELECT nn, kk, q2_d, tl_d,
         floor((s_d * s_d)::DOUBLE / nn::DOUBLE / 1e12
               * 1000000.0 + 0.5)::DECIMAL(38,0) AS tg
  FROM dims CROSS JOIN nt),
agg AS (
  SELECT nn, kk, sum(q2_d) AS sq2, sum(tl_d) AS stl, sum(tg) AS stg
  FROM j GROUP BY 1, 2)
SELECT nn::BIGINT AS n_vectors, kk::BIGINT AS n_labels,
       {_sql_rne(
           '(stl::DOUBLE - stg::DOUBLE) / 1000000.0',
           'between_scatter', 6)},
       {_sql_rne(
           'sq2::DOUBLE / 1e12 - stl::DOUBLE / 1000000.0',
           'within_scatter', 6)},
       {_sql_rne(
           'CASE WHEN sq2::DOUBLE / 1e12 - stl::DOUBLE / 1000000.0 > 0'
           ' AND kk > 1 THEN'
           ' ((stl::DOUBLE - stg::DOUBLE) / 1000000.0'
           '  / (kk::DOUBLE - 1.0))'
           ' / ((sq2::DOUBLE / 1e12 - stl::DOUBLE / 1000000.0)'
           '    / (nn::DOUBLE - kk::DOUBLE)) END', 'fisher_f', 8)}
FROM agg"""


def q_emb_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate embedding groups — vectors identical on the
    1e-6 grid, keyed by a portable signature hash of the snapped
    coordinates: the cheap FIRST tier of the vector-dedup cascade
    (emb_near_dup_pairs' LSH spends banding on pairs this groupBy
    removes for free; the doc-side twin is doc_exact_dup_groups).
    One in-row transform (snap → string-join → hash60, no explode)
    + one groupBy. The output is the ALWAYS-NON-EMPTY summary row
    (the media_ahash lesson: a fixture with zero dups must still
    exercise the signature derivation in the cross-engine gate) —
    total vectors, distinct signatures, dup groups/vectors, largest
    group, and an XOR checksum of ALL signatures (order-free; a
    one-bit divergence in either engine's snap→join→hash chain flips
    it) — plus one row per dup group when they exist."""
    emb = _emb(spark, sf_dir)
    sig_str = F.concat_ws(
        ",",
        F.transform(
            "v",
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .cast("string"),
        ),
    )
    d = emb.select(
        "vec_id", "label", hash60(sig_str).alias("sig")
    )
    grp = d.groupBy("sig").agg(
        F.count(F.lit(1)).alias("gs"),
        F.min("vec_id").alias("keeper"),
        F.countDistinct("label").alias("nl"),
    )
    dups = grp.filter(F.col("gs") >= 2).select(
        F.lit("group").alias("row_type"),
        F.col("sig").cast("long").alias("sig"),
        F.col("gs").cast("long").alias("group_size"),
        F.col("keeper").cast("long").alias("keeper_id"),
        F.col("nl").cast("long").alias("n_labels"),
    )
    summary = grp.agg(
        F.lit("summary").alias("row_type"),
        # XOR-fold of signatures: order/partitioning-free
        F.expr("bit_xor(sig)").cast("long").alias("sig"),
        F.sum("gs").cast("long").alias("group_size"),
        F.count(F.lit(1)).cast("long").alias("keeper_id"),
        F.sum(F.when(F.col("gs") >= 2, F.col("gs")).otherwise(0))
        .cast("long")
        .alias("n_labels"),
    )
    return dups.unionAll(summary).select(
        "row_type",
        "sig",
        "group_size",
        "keeper_id",
        "n_labels",
    )


def _sql_emb_exact_dup_groups() -> str:
    sig = sql_hash60(
        "array_to_string(list_transform(embedding,"
        " x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT)"
        "::VARCHAR), ',')"
    )
    return f"""
WITH grp AS (
  SELECT {sig} AS sig, count(*) AS gs, min(vec_id) AS keeper,
         count(DISTINCT label) AS nl
  FROM embeddings GROUP BY 1)
SELECT 'group' AS row_type, sig::BIGINT AS sig,
       gs::BIGINT AS group_size, keeper::BIGINT AS keeper_id,
       nl::BIGINT AS n_labels
FROM grp WHERE gs >= 2
UNION ALL
SELECT 'summary' AS row_type, bit_xor(sig)::BIGINT AS sig,
       sum(gs)::BIGINT AS group_size, count(*)::BIGINT AS keeper_id,
       sum(CASE WHEN gs >= 2 THEN gs ELSE 0 END)::BIGINT AS n_labels
FROM grp"""


JL_OUT_DIM = 16


def _jl_signs() -> list:
    """Deterministic ±1 sign matrix (JL_OUT_DIM x 64), derived from
    md5 at plan-build time so Spark and DuckDB consume IDENTICAL
    literals — no engine hash functions in the hot path."""
    import hashlib

    signs = []
    for j in range(JL_OUT_DIM):
        row = []
        for i in range(64):
            h = hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[-1], 16) % 2 == 0 else -1.0)
        signs.append(row)
    return signs


def q_emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit of a ±1 random-sign
    projection 64→16 — the measurement behind 'can we ANN-search in a
    4x cheaper space': project every corpus vector with a FIXED
    hash-derived sign matrix (literals, identical in both engines),
    then compare projected vs original pair distances over the
    bounded query×candidate panel — BOTH sides ride the fixed
    deterministic anchor budget (candidates = top-JL_C_BUDGET by
    portable hash, queries = the first JL_Q_BUDGET of the SAME
    ordering, so q ⊆ c by prefix), making the panel ≤ Q·C CONSTANT
    at any corpus size (r12 verdict item 1; the old mod-101×mod-13
    fractions were n²/1313). Projections are left-assoc 64-term sign
    chains (bitwise cross-engine); the ratio d₁₆/d₆₄ snaps to 1e-8
    and averages in DECIMAL; min/max are exact comparisons. At 100 TB
    the two TakeOrdered anchor picks are the only corpus-sized work —
    linear scans, no shuffle of the corpus."""
    emb = _emb(spark, sf_dir)
    signs = _jl_signs()
    scale = 1.0 / math.sqrt(float(JL_OUT_DIM))

    def proj_cols(vcol):
        # F.aggregate fold over a literal sign array — bitwise-equal
        # to the oracle's unrolled left-assoc chain (0.0 + t₀ ≡ t₀;
        # ±1.0 products are exact sign flips; A/B-verified bitwise on
        # the real corpus) but LOOP-shaped codegen: the unrolled
        # 16×64-term projection cost ~5-8 s of janino compile per run
        def fold_row(sarr, n):
            return F.aggregate(
                F.sequence(F.lit(1), F.lit(n)),
                F.lit(0.0),
                lambda a, i: a
                + F.element_at(vcol, i) * F.element_at(sarr, i),
            )

        cols = []
        for j, row in enumerate(signs):
            sarr = F.array(*[F.lit(s) for s in row])
            cols.append(
                (fold_row(sarr, len(row)) * F.lit(scale)).alias(f"p{j}")
            )
        return cols

    anch = anchor_sample(emb, JL_C_BUDGET, cols=("vec_id", "v"))
    base = anch.select(
        "vec_id", "v", *proj_cols(F.col("v"))
    )
    parr = F.array(*[F.col(f"p{j}") for j in range(JL_OUT_DIM)])
    # localCheckpoint(eager): materialize the ≤JL_C_BUDGET projected
    # rows so CollapseProject cannot inline the 16×64-term sign chains
    # into the pair join (which blows the 64KB codegen method limit →
    # interpreted eval of a giant expression per pair — the pHash
    # failure mode, caught again here at 2.4× the r12 bench line)
    base = base.select("vec_id", "v", parr.alias("p")).localCheckpoint(
        eager=True
    )
    h = hash60(F.col("vec_id").cast("string"))
    q = (
        base.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(JL_Q_BUDGET)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("p").alias("qp"),
        )
    )
    c = base
    from ..functions.distance import dist_l2_fixed

    pairs = c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    d64 = dist_l2_fixed(F.col("v"), F.col("qv"), 64)
    d16 = dist_l2_fixed(F.col("p"), F.col("qp"), JL_OUT_DIM)
    # exact-duplicate vectors have d64 = 0: no ratio (ANSI division)
    r = pairs.select(
        F.when(d64 > 0, d16 / d64).alias("ratio"),
    ).filter(F.col("ratio").isNotNull())
    snap8 = (F.floor(F.col("ratio") * 1e8 + F.lit(0.5)) / 1e8).cast(
        "decimal(30,8)"
    )
    agg = r.select(F.col("ratio"), snap8.alias("rs")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("rs").alias("sr"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
    )
    return agg.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        _rne(
            F.col("sr").cast("double") / F.col("n_pairs").cast("double"),
            "mean_ratio",
            8,
        ),
        _rne(F.col("min_ratio"), "min_ratio", 8),
        _rne(F.col("max_ratio"), "max_ratio", 8),
    )


def _sql_emb_jl_distortion() -> str:
    signs = _jl_signs()
    scale = 1.0 / math.sqrt(float(JL_OUT_DIM))
    projs = []
    for j, row in enumerate(signs):
        chain = None
        for i, s in enumerate(row):
            term = f"v[{i + 1}] * ({s})"
            chain = term if chain is None else f"({chain} + {term})"
        projs.append(f"{chain} * {scale!r} AS p{j}")
    plist = ", ".join(f"p{j}" for j in range(JL_OUT_DIM))
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
anch AS (
  SELECT vec_id, v FROM base {_sql_anchor_clause(JL_C_BUDGET)}),
pr AS (
  SELECT vec_id, v, {', '.join(projs)} FROM anch),
pa AS (
  SELECT vec_id, v, [{plist}] AS p FROM pr),
q AS (
  SELECT vec_id AS q_id, v AS qv, p AS qp FROM pa
  {_sql_anchor_clause(JL_Q_BUDGET)}),
c AS (SELECT * FROM pa),
pairs AS (
  SELECT CASE WHEN {_sql_l2('c.v', 'q.qv')} > 0
              THEN {_sql_l2('c.p', 'q.qp')} / {_sql_l2('c.v', 'q.qv')}
         END AS ratio
  FROM c JOIN q ON c.vec_id <> q.q_id),
r AS (SELECT ratio,
             CAST(floor(ratio * 1e8 + 0.5) / 1e8 AS DECIMAL(30,8)) AS rs
      FROM pairs WHERE ratio IS NOT NULL)
SELECT count(*)::BIGINT AS n_pairs,
       {_sql_rne('sum(rs)::DOUBLE / count(*)::DOUBLE', 'mean_ratio', 8)},
       {_sql_rne('min(ratio)', 'min_ratio', 8)},
       {_sql_rne('max(ratio)', 'max_ratio', 8)}
FROM r"""


def q_emb_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bounded Lloyd iteration from the label centroids — the
    k-means refinement step the IVF index build would run, with the
    inertia drop measured (the monotone-descent invariant IS the
    correctness check): assign each vector to its nearest exact
    centroid (distance, label tie-break), recompute centroids as the
    snapped-grid means of their assignments, re-assign, and report
    inertia before/after. Centroids come from the 1e-6 integer-grid
    DECIMAL device (order-free, bitwise cross-engine); distances are
    sequential-fold L2; per-vector d² snaps to 1e-6 into DECIMAL
    sums. Two assignment passes = two broadcast joins of k centroid
    arrays against the corpus — linear in N, never quadratic."""
    from ..functions.distance import dist_l2_fixed

    emb = _emb(spark, sf_dir)

    def centroids_of(df, label_col):
        e = df.select(
            F.col(label_col).alias("cl"), F.posexplode("v").alias("dim", "x")
        ).select(
            "cl",
            "dim",
            F.floor(F.col("x") * 1e6 + F.lit(0.5))
            .cast("decimal(38,0)")
            .alias("q"),
        )
        ld = e.groupBy("cl", "dim").agg(
            F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
        )
        return ld.groupBy("cl").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", "s", "n"))
                ),
                lambda t: t.getField("s").cast("double")
                / t.getField("n").cast("double")
                / F.lit(1e6),
            ).alias("cvec")
        )

    def assign(df, cents):
        d = df.crossJoin(
            F.broadcast(cents.select(F.col("cl"), "cvec"))
        ).withColumn("d2", dist_l2_fixed(F.col("v"), F.col("cvec"), 64))
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("cl").asc()
        )
        return (
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "v", F.col("cl").alias("acl"), "d2")
        )

    snap6 = lambda c: (  # noqa: E731
        F.floor(F.col(c) * F.col(c) * 1e6 + F.lit(0.5))
    ).cast("decimal(38,0)")

    c0 = centroids_of(emb, "label").localCheckpoint(eager=True)
    a0 = assign(emb, c0).localCheckpoint(eager=True)
    inertia0 = a0.select(snap6("d2").alias("i")).agg(
        F.sum("i").alias("s0"), F.count(F.lit(1)).alias("n")
    )
    c1 = centroids_of(a0, "acl").localCheckpoint(eager=True)
    a1 = assign(emb, c1)
    inertia1 = a1.select("acl", snap6("d2").alias("i")).agg(
        F.sum("i").alias("s1"),
        F.countDistinct("acl").alias("k1"),
    )
    k0 = c0.agg(F.count(F.lit(1)).alias("k0"))
    return (
        inertia0.crossJoin(F.broadcast(inertia1))
        .crossJoin(F.broadcast(k0))
        .select(
            F.col("n").cast("long").alias("n_vecs"),
            F.col("k0").cast("long").alias("k0"),
            F.col("k1").cast("long").alias("k1"),
            _rne(F.col("s0").cast("double") / 1e6, "inertia0", 6),
            _rne(F.col("s1").cast("double") / 1e6, "inertia1", 6),
        )
    )


def _sql_emb_lloyd_step() -> str:
    def cents(src, label, name):
        return f"""{name}_e AS (
  SELECT {label} AS cl, i AS dim,
         CAST(floor(v[i] * 1e6 + 0.5) AS DECIMAL(38,0)) AS q
  FROM {src}, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
{name}_ld AS (
  SELECT cl, dim, sum(q) AS s, count(*) AS n
  FROM {name}_e GROUP BY 1, 2),
{name} AS (
  SELECT cl, list_transform(
           list_sort(list(struct_pack(dim := dim, s := s, n := n))),
           t -> t.s::DOUBLE / t.n::DOUBLE / 1e6) AS cvec
  FROM {name}_ld GROUP BY 1)"""

    def assign(cent, name):
        return f"""{name}_d AS (
  SELECT b.vec_id, b.v, c.cl,
         {_sql_l2('b.v', 'c.cvec')} AS dd
  FROM base b CROSS JOIN {cent} c),
{name} AS (
  SELECT vec_id, v, cl AS acl, dd * dd AS d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY dd ASC, cl ASC) AS rk
    FROM {name}_d) WHERE rk = 1)"""

    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
{cents('base', 'label', 'c0')},
{assign('c0', 'a0')},
{cents('a0', 'acl', 'c1')},
{assign('c1', 'a1')},
i0 AS (
  SELECT sum(CAST(floor(d2 * 1e6 + 0.5) AS DECIMAL(38,0))) AS s0,
         count(*) AS n
  FROM a0),
i1 AS (
  SELECT sum(CAST(floor(d2 * 1e6 + 0.5) AS DECIMAL(38,0))) AS s1,
         count(DISTINCT acl) AS k1
  FROM a1),
k0 AS (SELECT count(*) AS k0 FROM c0)
SELECT n::BIGINT AS n_vecs, k0::BIGINT AS k0, k1::BIGINT AS k1,
       {_sql_rne('s0::DOUBLE / 1e6', 'inertia0', 6)},
       {_sql_rne('s1::DOUBLE / 1e6', 'inertia1', 6)}
FROM i0 CROSS JOIN i1 CROSS JOIN k0"""


def q_emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette per label — THE standard
    clustering-quality score, in its O(N·k) medoid-free form: for
    every vector, a = distance to its OWN label centroid, b = the
    nearest OTHER centroid; s = (b − a)/max(a, b) ∈ [−1, 1] (negative
    s flags vectors closer to a foreign cluster — reads next to
    emb_cluster_purity / emb_triplet_margin / emb_fisher_ratio as the
    scale-free one). Centroids are the shared exact grid-snapped
    quantizer (same contract as every IVF-family query); distances
    the flat-codegen L2 (fold-bitwise); per-row s snaps to the 1e-9
    grid into exact DECIMAL sums. ONE broadcast of k centroids
    against the corpus + one map-side-combined aggregate — no window,
    no pair frame, linear at any corpus size."""
    from ..operators.ivf import EMB_DIM, label_centroids

    emb = _emb(spark, sf_dir)
    cent = label_centroids(emb)
    from ..functions.distance import dist_l2_fixed

    d = emb.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("clabel"), "cvec"))
    ).select(
        "vec_id",
        "label",
        "clabel",
        dist_l2_fixed(F.col("v"), F.col("cvec"), EMB_DIM).alias("cd"),
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("cd"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("cd"))).alias(
            "b"
        ),
    )
    s = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    sq = F.floor(s * F.lit(1e9) + F.lit(0.5)).cast("decimal(38,0)")
    per = (
        ab.filter(F.col("b").isNotNull())
        .select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sq").alias("ss"),
            F.sum(F.when(F.col("sq") < 0, 1).otherwise(0)).alias(
                "n_negative"
            ),
        )
    )
    return per.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n"),
        F.col("n_negative").cast("long").alias("n_negative"),
        _rne(
            F.col("ss").cast("double") / F.col("n").cast("double") / 1e9,
            "mean_silhouette",
            8,
        ),
    )


def _sql_emb_silhouette() -> str:
    return f"""
WITH {_sql_ivf_base()},
d AS (
  SELECT e.vec_id, e.label, c.label AS clabel,
         {_sql_l2('e.v', 'c.cvec')} AS cd
  FROM emb e CROSS JOIN cent c),
ab AS (
  SELECT vec_id, label,
         min(CASE WHEN clabel = label THEN cd END) AS a,
         min(CASE WHEN clabel <> label THEN cd END) AS b
  FROM d GROUP BY 1, 2),
s AS (
  SELECT label,
         CAST(floor(CASE WHEN greatest(a, b) > 0
                         THEN (b - a) / greatest(a, b) ELSE 0.0 END
                    * 1e9 + 0.5) AS DECIMAL(38,0)) AS sq
  FROM ab WHERE b IS NOT NULL)
SELECT label::BIGINT AS label, count(*)::BIGINT AS n,
       sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative,
       {_sql_rne('sum(sq)::DOUBLE / count(*)::DOUBLE / 1e9',
                 'mean_silhouette', 8)}
FROM s GROUP BY 1"""


def q_emb_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k of the sign-LSH bucketed search against the
    exact cosine top-k — the missing half of emb_ann_lsh_topk's
    contract (the IVF path has emb_ivf_recall; a production index
    swap needs BOTH measured on the same panel before choosing).
    Queries ride the fixed deterministic anchor budget (exact-GT side
    O(n·K), K constant — the r13 anchor rule); candidates share the
    query's bucket (equi-join on one int key), exact cosine ranks
    within the bucket with (cos DESC, id ASC) ties — identical in
    both engines. Queries whose bucket holds fewer than k neighbors
    (or none) simply score what the bucket gave them: recall IS the
    cost of single-band LSH, that's the number this card reports."""
    from ..functions.distance import dot_fixed, l2_norm_fixed

    emb = _emb(spark, sf_dir)
    q = (
        anchor_sample(emb, IVF_Q_BUDGET, cols=("vec_id", "v"))
        .localCheckpoint(eager=True)
    )
    lsh = ann_lsh_topk(emb, q, k=KNN_K).select(
        "q_id", F.col("id").alias("vec_id")
    )
    qq = q.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    cos = dot_fixed(F.col("v"), F.col("qv"), 64) / (
        l2_norm_fixed(F.col("v"), 64) * l2_norm_fixed(F.col("qv"), 64)
    )
    bf = (
        emb.join(F.broadcast(qq))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cos").desc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= KNN_K)
        .select("q_id", "vec_id")
    )
    hits = bf.join(lsh, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return qq.select("q_id").join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        (
            F.coalesce("n_hit", F.lit(0)).cast("double")
            / F.lit(float(KNN_K))
        ).alias("recall"),
    )


def _sql_emb_lsh_recall() -> str:
    bucket = _sql_sign_bucket()
    cos_lsh = (
        f"{_sql_dot('e.v', 'q.qv')}"
        f" / ({_sql_norm('e.v')} * {_sql_norm('q.qv')})"
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM emb),
q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b
      {_sql_anchor_clause(IVF_Q_BUDGET)}),
lsh AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {cos_lsh} DESC, e.vec_id ASC) AS rank
    FROM b e JOIN q ON e.bucket = q.bucket
    WHERE e.vec_id <> q.q_id)
  WHERE rank <= {KNN_K}),
bf AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {cos_lsh} DESC, e.vec_id ASC) AS rn
    FROM emb e JOIN q ON e.vec_id <> q.q_id)
  WHERE rn <= {KNN_K}),
hits AS (
  SELECT q_id, count(*) AS n_hit
  FROM bf JOIN lsh USING (q_id, vec_id) GROUP BY 1)
SELECT q.q_id, COALESCE(n_hit, 0) AS n_hit,
       COALESCE(n_hit, 0)::DOUBLE / {float(KNN_K)} AS recall
FROM q LEFT JOIN hits ON q.q_id = hits.q_id"""


def q_media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain perceptual near-dup pairs: 16-bit DCT pHash
    per image payload (operators/multimodal.py phash16_bands — float
    cell means through 16 fixed-literal DCT chains, median-of-non-DC
    threshold) with pairs at hamming <= 1 — the near-identical
    tier. Complements
    media_ahash_near_dup: aHash flips on local brightness, pHash only
    on low-frequency structure. Same two-tier output contract as the
    aHash query — ('band', bi, n_buckets, cand_pairs) rows (non-empty
    at every SF, the r10 anti-vacuous lesson) plus
    ('pair', id_i, id_j, hamming) rows — and the same pigeonhole
    guarantee: 2 bands of 8 bits make the banded candidate join
    EXHAUSTIVE at the threshold (8-bit bands keep per-band buckets at
    up to 256; a 4-bit-band variant measured ~16 buckets and a
    Σdf²-dominated candidate join), which the brute-force oracle
    proves.
    Engine cost: candidates ∝ Σ per-band-bucket df², one JVM
    projection pass for the hash, payload bytes never join."""
    from ..operators.multimodal import (
        PHASH_BANDS,
        PHASH_MAX_DIST,
        phash16_bands,
    )

    h = phash16_bands(_media(spark, sf_dir))
    h = h.localCheckpoint(eager=True)  # 3 consumers: cand x2 + rejoin
    cand = None
    for k in range(PHASH_BANDS):
        c = h.select(
            "media_id", F.lit(k).alias("bi"), F.col(f"band{k}").alias("bv")
        )
        cand = c if cand is None else cand.unionByName(c)
    pairs = (
        cand.alias("a")
        .join(cand.alias("b"), ["bi", "bv"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_i"),
            F.col("b.media_id").alias("id_j"),
        )
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("id_i"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(PHASH_BANDS)],
    )
    hb = h.select(
        F.col("media_id").alias("id_j"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(PHASH_BANDS)],
    )
    ham = sum(
        F.expr(f"bit_count(a{k} ^ b{k})") for k in range(PHASH_BANDS)
    )
    pair_rows = (
        pairs.join(ha, "id_i")
        .join(hb, "id_j")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= PHASH_MAX_DIST)
        .select(
            F.lit("pair").alias("kind"),
            F.col("id_i").alias("k1"),
            F.col("id_j").alias("k2"),
            F.col("hamming").alias("v"),
        )
    )
    band_rows = (
        cand.groupBy("bi", "bv")
        .agg(F.count(F.lit(1)).alias("df"))
        .groupBy("bi")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("df * (df - 1) div 2")).alias("cand_pairs"),
        )
        .select(
            F.lit("band").alias("kind"),
            F.col("bi").cast("long").alias("k1"),
            F.col("n_buckets").cast("long").alias("k2"),
            F.col("cand_pairs").cast("long").alias("v"),
        )
    )
    return band_rows.unionByName(pair_rows)


def _sql_media_phash_near_dup() -> str:
    from ..operators.multimodal import (
        PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_MAX_DIST,
        phash_dct_weights,
    )

    hexpos = "strpos('0123456789ABCDEF', substring(hx, ({pos})::BIGINT, 1))"
    byte_hi = hexpos.format(pos="2 * j + 1")
    byte_lo = hexpos.format(pos="2 * j + 2")
    ws = phash_dct_weights()
    coeff_cols = []
    for c, row in enumerate(ws):
        chain = None
        for i, w in enumerate(row):
            term = f"cl[{i + 1}] * ({w!r})"
            chain = term if chain is None else f"({chain} + {term})"
        coeff_cols.append(f"{chain} AS c{c}")
    nondc = ", ".join(f"c{c}" for c in range(1, 16))
    band_cols = []
    for k in range(PHASH_BANDS):
        parts = []
        for t in range(PHASH_BAND_BITS):
            c = k * PHASH_BAND_BITS + t
            parts.append(
                f"(CASE WHEN c{c} > med THEN 1::BIGINT ELSE 0::BIGINT END)"
                f" * {1 << t}"
            )
        band_cols.append("(" + " + ".join(parts) + f")::BIGINT AS a{k}")
    ham = " + ".join(
        f"bit_count(xor(a.a{k}, b.a{k}))" for k in range(PHASH_BANDS)
    )
    band_unpivot = "\n  UNION ALL ".join(
        f"SELECT media_id, {k} AS bi, a{k} AS bv FROM bands"
        for k in range(PHASH_BANDS)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         strlen(text)::BIGINT AS n
  FROM documents WHERE doc_id % 3 = 0 AND strlen(text) >= 1),
d AS (
  SELECT media_id, n,
         list_transform(range(0, n),
           j -> ({byte_hi} - 1) * 16 + ({byte_lo} - 1)) AS bytes
  FROM m),
cells AS (
  SELECT media_id,
         list_transform(range(0, 64), i -> CASE WHEN
             ((i + 1) * n) // 64 - (i * n) // 64 > 0
           THEN coalesce(list_sum(
               bytes[((i * n) // 64 + 1)::BIGINT
                     : (((i + 1) * n) // 64)::BIGINT]), 0)::DOUBLE
             / (((i + 1) * n) // 64 - (i * n) // 64)::DOUBLE
           ELSE 0.0 END) AS cl
  FROM d),
co AS (
  SELECT media_id, {', '.join(coeff_cols)} FROM cells),
cm AS (
  SELECT *, list_sort([{nondc}])[8] AS med FROM co),
bands AS (
  SELECT media_id, {', '.join(band_cols)} FROM cm),
ub AS (
  {band_unpivot}),
bstats AS (SELECT bi, bv, count(*) AS df FROM ub GROUP BY 1, 2),
brows AS (
  SELECT 'band' AS kind, bi::BIGINT AS k1, count(*)::BIGINT AS k2,
         sum(df * (df - 1) // 2)::BIGINT AS v
  FROM bstats GROUP BY bi),
prows AS (
  SELECT 'pair' AS kind, id_i AS k1, id_j AS k2, hamming AS v FROM (
    SELECT a.media_id AS id_i, b.media_id AS id_j,
           ({ham})::BIGINT AS hamming
    FROM bands a JOIN bands b ON a.media_id < b.media_id)
  WHERE hamming <= {PHASH_MAX_DIST})
SELECT * FROM brows UNION ALL SELECT * FROM prows"""
