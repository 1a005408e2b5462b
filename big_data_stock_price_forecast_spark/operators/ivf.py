"""IVF (inverted-file) approximate nearest neighbor — the scale path
for the reference's brute-force k-NN (notebooks/test.ipynb cell 17;
README.md:155 lists "optimized K-NN in O(logn)" as future work).

Structure of a classical IVF index, expressed relationally:

1. **coarse quantizer**: a small centroid table (here: per-label mean
   vectors — a deterministic, already-meaningful partitioning of the
   corpus; a KMeans fit would slot in identically),
2. **lists**: every vector assigned to its nearest centroid
   (broadcast the tiny centroid table, flat fixed-dim codegen L2 —
   bitwise-equal to the sequential fold, see functions/distance.py
   ``dist_l2_fixed`` — argmin),
3. **probe**: each query ranks centroids, keeps ``nprobe`` lists,
4. **rerank**: exact distance only against vectors in probed lists.

At 100 TB the corpus would be written bucketed/partitioned BY list_id
so a probe prunes partitions at the scan; locally the probe is a
broadcast semi-join on list_id. Centroids are rounded to 6 decimals
before any distance so quantizer assignment is bitwise reproducible
across engines (the fold distances then see identical inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import dist_l2_fixed

EMB_DIM = 64  # embeddings table dimension; flat codegen distances


def label_centroids(emb: DataFrame, dim: int = 64) -> DataFrame:
    """(label, cvec: array<double>[dim]) — per-label mean, each
    coordinate rounded via floor(x*1e6+0.5)/1e6 for cross-engine
    bitwise reproducibility."""
    exploded = emb.select("label", F.posexplode("v").alias("pos", "x"))
    per_dim = exploded.groupBy("label", "pos").agg(
        (F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)).alias("c")
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cvec")
    )


def assign_lists(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table; the
    argmin is a ``groupBy`` + ``min_by`` aggregate, so the N x C
    crossed rows partially aggregate MAP-SIDE (a C-fold reduction
    before the shuffle) instead of shuffling the full crossed table
    through a row_number window. The ordering struct
    (distance, centroid label) is total — centroid labels are unique —
    so the assignment is deterministic, matching the oracle's
    (distance, label) rank tie-break."""
    return (
        emb.crossJoin(
            F.broadcast(
                centroids.select(
                    F.col("label").alias("label_c"), F.col("cvec")
                )
            )
        )
        .withColumn(
            "__cdist", dist_l2_fixed(F.col("v"), F.col("cvec"), EMB_DIM)
        )
        .groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.first("label").alias("label"),
            F.min_by(
                "label_c", F.struct(F.col("__cdist"), F.col("label_c"))
            ).alias("list_id"),
        )
    )


def write_ivf_layout(
    emb: DataFrame, path: str, centroids: DataFrame | None = None
) -> None:
    """Materialize the corpus partitioned BY list_id — the 100 TB IVF
    layout: a probe then reads ONLY its nprobe list directories
    (partition pruning at the scan, verified by the plan test) instead
    of scanning the corpus and semi-joining. One assignment pass + one
    write; the index is append-friendly (new vectors assign against
    the same persisted centroids and land in their list's directory).
    Centroids persist beside the lists so probes quantize against
    EXACTLY the index's quantizer, not a recomputed one."""
    centroids = centroids if centroids is not None else label_centroids(emb)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = assign_lists(emb, centroids)
    (
        assigned.repartition("list_id")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(f"{path}/lists")
    )


def write_ivf_stream_layout(emb: DataFrame, path: str) -> None:
    """Seed a streaming-growable IVF layout: same quantizer + lists as
    :func:`write_ivf_layout` but with a ``batch=`` partition level
    (seed lands as ``batch=-1``) so micro-batch fold-ins
    (``batch=N``, see streaming/ops.py ``ann_ingest_stream``) keep one
    consistent partition depth, and an empty ``probes`` seed dir
    (``partitionBy(list_id)`` like every later probe write, so the
    layout has one depth; the stream read supplies the schema
    explicitly because the seed dir holds no data files)."""
    centroids = label_centroids(emb)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = assign_lists(emb, centroids)
    (
        assigned.repartition("list_id")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(f"{path}/lists/batch=-1")
    )
    spark = emb.sparkSession
    empty = spark.createDataFrame(
        [], "q_id bigint, qv array<double>, list_id int"
    )
    empty.write.partitionBy("list_id").mode("overwrite").parquet(
        f"{path}/probes/batch=-1"
    )


def ivf_query_probes(
    centroids: DataFrame, queries: DataFrame, nprobe: int = 2
) -> DataFrame:
    """(q_id, qv, list_id): each query's ``nprobe`` nearest centroid
    lists — the coarse-quantization half of a probe, against the
    EXACT persisted quantizer. Deterministic (distance, label)
    tie-break, same as :func:`assign_lists`."""
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__cdist").asc(), F.col("label_c").asc()
    )
    return (
        queries.crossJoin(
            F.broadcast(
                centroids.select(F.col("label").alias("label_c"), "cvec")
            )
        )
        .withColumn(
            "__cdist", dist_l2_fixed(F.col("qv"), F.col("cvec"), EMB_DIM)
        )
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= nprobe)
        .select("q_id", "qv", F.col("label_c").alias("list_id"))
    )


def ivf_probe_candidates(
    spark, path: str, probes: DataFrame
) -> DataFrame:
    """ALL exact-distance candidates in the probed lists — no top-k
    cut: (q_id, vec_id, dist, list_id), self excluded. The list_id
    join key is a partition filter on the layout scan (only probed
    list directories are read). Callers that want a final answer rank
    afterwards; streaming ingest emits candidates unranked because a
    later batch can still displace a neighbor."""
    lists = spark.read.parquet(f"{path}/lists")
    return (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("dist", dist_l2_fixed(F.col("v"), F.col("qv"), EMB_DIM))
        .select("q_id", "vec_id", "dist", "list_id")
    )


def ivf_probe_layout(
    spark, path: str, queries: DataFrame, k: int = 5, nprobe: int = 2
) -> DataFrame:
    """Top-k against a :func:`write_ivf_layout` index: rank the
    persisted centroids per query, keep ``nprobe`` list_ids, and scan
    ONLY those partitions (the list_id filter is a partition filter —
    the scan never opens other lists' files). Returns
    (q_id, vec_id, rank, dist, list_id) with the same ordering
    contract as :func:`ivf_ann_topk`."""
    centroids = spark.read.parquet(f"{path}/centroids")
    probes = ivf_query_probes(centroids, queries, nprobe)
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        ivf_probe_candidates(spark, path, probes)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "dist", "list_id")
    )


def ivf_ann_topk(
    emb: DataFrame,
    query_mod: int,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Queries = vec_id % query_mod == 0 (matching the brute-force
    suite's convention). Returns (q_id, vec_id, rank, dist, list_id):
    top-k by exact L2 among vectors whose list is one of the query's
    ``nprobe`` nearest centroids, self excluded.
    """
    centroids = label_centroids(emb)
    assigned = assign_lists(emb, centroids)
    return ivf_topk_from_assigned(
        assigned, centroids, query_mod, k=k, nprobe=nprobe
    )


def ivf_topk_from_assigned(
    assigned: DataFrame,
    centroids: DataFrame,
    query_mod: int,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """:func:`ivf_ann_topk` against a PRE-BUILT (and possibly
    checkpointed) assignment + centroid pair — callers that sweep a
    parameter (the nprobe recall/cost curve) build the quantizer once
    instead of re-deriving it per branch."""
    queries = assigned.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    return ivf_topk_for_queries(
        assigned, centroids, queries, k=k, nprobe=nprobe
    )


def ivf_topk_for_queries(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """:func:`ivf_topk_from_assigned` with an EXPLICIT (q_id, qv)
    query frame — the eval cards pass their fixed deterministic
    anchor budget here instead of a corpus-fraction modulus (whose
    exact-GT panel would grow quadratically with the corpus)."""
    probes = ivf_query_probes(centroids, queries, nprobe)
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("dist", dist_l2_fixed(F.col("v"), F.col("qv"), EMB_DIM))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "dist", "list_id")
    )


def list_representatives(
    emb: DataFrame, centroids: DataFrame | None = None
) -> DataFrame:
    """Semantic dedup, keep-one-per-cluster: collapse each coarse
    cluster (IVF list) to its medoid-like representative — the member
    nearest the centroid — plus cluster size and mean member-centroid
    distance (the compactness diagnostic a semantic-dedup stage
    reports beside its keep set).

    Plan shape: one nearest-centroid assignment pass
    (:func:`assign_lists` — broadcast centroids, map-side-combined
    argmin), then ONE groupBy(list_id) whose representative argmin is a
    ``min(struct(dist, vec_id))`` aggregate — again partially
    aggregated map-side, so per-cluster membership never shuffles as
    raw vectors more than once and no window sort materializes the
    cluster. The (dist, vec_id) struct ordering is total, so the
    representative is deterministic under ties, matching the oracle's
    (d, vec_id) row_number contract.

    Reference parity: the reference dedups only exactly (drop_duplicates
    on candle rows, core/data/preprocess.py); semantic collapse of
    near-identical windows is the embedding-side analog at corpus
    scale.
    """
    centroids = centroids if centroids is not None else label_centroids(emb)
    assigned = assign_lists(emb, centroids)
    withc = assigned.join(
        F.broadcast(
            centroids.select(F.col("label").alias("list_id"), "cvec")
        ),
        "list_id",
    ).withColumn("__d", dist_l2_fixed(F.col("v"), F.col("cvec"), EMB_DIM))
    best = F.min(
        F.struct(F.col("__d").alias("d"), F.col("vec_id").alias("vid"))
    )
    return withc.groupBy("list_id").agg(
        best.getField("vid").alias("rep_vec_id"),
        best.getField("d").alias("rep_dist"),
        F.count(F.lit(1)).alias("n_members"),
        F.avg("__d").alias("mean_dist"),
    )
