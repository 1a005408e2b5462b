"""Document deduplication operators (training-data pipeline surface).

Four dedup families over a documents table, all expressed as native
DataFrame plans (no Python UDFs anywhere):

- exact: hash-groupBy on text (or its fingerprint) — one shuffle.
- MinHash + LSH: shingle -> 60-bit hash -> k permuted mins -> band keys
  -> bucket self-join -> exact-Jaccard verify of candidates only.
- SimHash: 60-bit signature per doc; near-dup pairs via pigeonhole
  banding (distance <= h implies >= 1 of h+1 chunks equal) + exact
  Hamming verify. Banding makes the join an equi-join on chunk value —
  no O(n^2) cross product at any scale.
- n-gram Jaccard: brute-force pairwise on distinct shingle sets — the
  exact baseline the sketches are verified against (quadratic; only for
  oracle-scale data or within-bucket verification).

Scale design: every pair-generating step is an equi-join on a sketch
bucket (shuffle partitioned by bucket key); the quadratic work happens
only inside buckets, whose size is controlled by the sketch parameters
(bands*rows for MinHash, chunk width for SimHash). Candidate
verification touches only the joined pairs. All sketch arithmetic is
integer (md5-derived 60-bit hashes, mod-2^31-1 affine permutations), so
results are reproducible across engines and partitionings bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expr import let_ as _let
from ..functions.text import TOKEN_SPLIT_RE, hash60, shingles, tokens

MH_PRIME = 2147483647  # 2^31 - 1: keeps a*h + b within signed 64-bit
MH_PERMS = 64
MH_BANDS = 16
MH_ROWS = 4

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # pigeonhole: catches all pairs with distance <= 3
SIMHASH_MAX_DIST = SIMHASH_CHUNKS - 1

# Persisted-index partition fanout: the bands table partitions by a
# hash bucket of the (band, key) LSH bucket key, shingles by a hash
# bucket of the doc id. A probe joining on the partition column with
# the batch side broadcast gets DYNAMIC PARTITION PRUNING at the scan
# — per-batch cost O(batch x matching buckets), not O(index) — the
# same discipline operators/ivf.py write_ivf_layout proves for ANN.
# 32 buckets: small micro-batches prune hard (a 1-file trigger's band
# rows hit a strict subset), while a bulk backfill (which hits all
# buckets) writes at most 32 dirs per fold-in batch.
IDX_BUCKETS = 32


def band_bucket(band: Column, key: Column) -> Column:
    """Partition bucket of an LSH (band, key) bucket key — Spark-side
    layout only (never oracle-visible), so xxhash64 is fine."""
    return F.pmod(F.xxhash64(band, key), F.lit(IDX_BUCKETS)).cast("int")


def id_bucket(idc: Column) -> Column:
    """Partition bucket of a doc id for the shingles index."""
    return F.pmod(F.xxhash64(idc), F.lit(IDX_BUCKETS)).cast("int")


def minhash_coeffs(k: int = MH_PERMS) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation coefficients (a*h + b) mod P.
    Fixed multipliers (Knuth/Numerical-Recipes LCG constants) so the
    DuckDB oracle can inline the same values."""
    a = [(2654435761 * (i + 1)) % MH_PRIME or 1 for i in range(k)]
    b = [(1013904223 * (i + 1)) % MH_PRIME for i in range(k)]
    return a, b



def _parallelize_texts(docs: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition by id before the CPU-heavy tokenize/shingle/
    sketch expressions. A small corpus often arrives as ONE input split
    (single parquet file, or post-filter residue), which would run the
    entire per-document compute on one core; shuffling the raw text
    first costs MBs and buys full-cluster parallelism for the sketch
    math. At real scale (many splits) the exchange is AQE-coalesced or
    a no-op relative to compute."""
    return docs.repartition(F.col(id_col))


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "sh"
) -> DataFrame:
    """Distinct word n-gram shingles of the tokenized text (JVM
    expression form — see :func:`shingle_sets` for the Arrow fast path
    the dedup pipelines use)."""
    return df.withColumn(out, shingles(tokens(F.col(text_col)), n))


def shingle_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    out: str = "sh",
) -> DataFrame:
    """(id, sh) distinct word n-gram shingle sets — one Arrow pass.

    Semantically identical to ``with_shingles(tokens(...))`` (same
    lowercase + ``[^a-z0-9]+`` split + space-joined n-grams +
    first-occurrence distinct; bitwise-equal for ASCII text, which the
    tokenizer's alnum alphabet effectively enforces), but ~5x faster:
    Spark evaluates lambda higher-order functions (transform/slice/
    concat_ws per position) INTERPRETED, outside whole-stage codegen —
    measured ~0.8 ms/doc on small docs, which made the shingle pass the
    single largest cost in every dedup query. Batched Python string
    ops through Arrow beat the interpreted expression tree by an order
    of magnitude at any document size; this is the same
    boundary-placement rule as the indicator battery (rolling.py): when
    the JVM path can't codegen, vectorize through Arrow instead.
    Rows whose shingle set is empty (< n tokens) are dropped, matching
    the callers' ``filter(size(sh) > 0)``.
    """
    import re

    import pandas as pd

    tok_re = re.compile(TOKEN_SPLIT_RE)

    def run(batches):
        for pdf in batches:
            ids, shs = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in tok_re.split(str(txt).lower()) if t]
                seen: set[str] = set()
                ordered: list[str] = []
                for j in range(len(toks) - n + 1):
                    s = " ".join(toks[j : j + n])
                    if s not in seen:
                        seen.add(s)
                        ordered.append(s)
                if ordered:
                    ids.append(i)
                    shs.append(ordered)
            yield pd.DataFrame({id_col: ids, out: shs})

    return _parallelize_texts(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema=f"`{id_col}` long, `{out}` array<string>")


def ngram_count_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_ngrams, n_distinct) per document in one Arrow pass —
    total word n-gram occurrences (max(tokens-n+1, 0)) and distinct
    n-grams. Emits a row for EVERY doc (zero counts for short docs),
    unlike :func:`shingle_sets`. Feeds repetition-ratio quality
    scoring without materializing the n-gram arrays at all."""
    import re

    import pandas as pd

    tok_re = re.compile(TOKEN_SPLIT_RE)

    def run(batches):
        for pdf in batches:
            ids, tots, dists = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in tok_re.split(str(txt).lower()) if t]
                total = max(len(toks) - n + 1, 0)
                distinct = len(
                    {
                        " ".join(toks[j : j + n])
                        for j in range(total)
                    }
                )
                ids.append(i)
                tots.append(total)
                dists.append(distinct)
            yield pd.DataFrame(
                {id_col: ids, "n_ngrams": tots, "n_distinct": dists}
            )

    return _parallelize_texts(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(
        run, schema=f"`{id_col}` long, n_ngrams int, n_distinct int"
    )


def minhash_signature(
    df: DataFrame,
    shingle_col: str = "sh",
    k: int = MH_PERMS,
    out: str = "sig",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-permutation MinHash signature per id as an array<long> column.

    Shingle hashing (md5-derived, oracle-matched) stays JVM-side; the
    k permuted minimums are one vectorized Arrow pass: per document an
    (n_shingles x k) int64 ``(h*a + b) mod P`` block min-reduced along
    the shingle axis. Exact integer arithmetic (products < 2^62, no
    float rounding), so results are identical to a per-permutation
    ``min()`` aggregate — but with no explode, no shuffle, and none of
    the k-column codegen that dominates compile time. min() is
    order-independent; docs with no shingles are filtered upstream.
    """
    import numpy as np
    import pandas as pd

    a_np = np.array(minhash_coeffs(k)[0], dtype=np.int64)
    b_np = np.array(minhash_coeffs(k)[1], dtype=np.int64)

    hashed = df.select(
        id_col,
        F.transform(F.col(shingle_col), lambda s: hash60(s) % MH_PRIME).alias(
            "__hs"
        ),
    )

    def sign(batches):
        for pdf in batches:
            sig = _batch_signatures(pdf["__hs"], a_np, b_np)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out: list(sig)}
            )

    return hashed.mapInPandas(sign, schema=f"`{id_col}` long, `{out}` array<long>")


def _batch_signatures(hs_series, a_np, b_np) -> "np.ndarray":
    """(n_docs x k) MinHash signature block for a whole Arrow batch:
    all documents' shingle hashes concatenate into one flat vector and
    each permutation's per-document minimum comes from ONE
    ``np.minimum.reduceat`` over segment starts — k vectorized passes
    over the batch instead of a Python loop over documents (the loop
    was ~40% of the sketch pass). Identical integer arithmetic:
    (h*a + b) mod P, exact in int64."""
    import numpy as np

    lengths = np.fromiter(
        (len(h) for h in hs_series), dtype=np.int64, count=len(hs_series)
    )
    flat = (
        np.concatenate([np.asarray(h, dtype=np.int64) for h in hs_series])
        if len(hs_series)
        else np.empty(0, dtype=np.int64)
    )
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    sig = np.empty((len(lengths), len(a_np)), dtype=np.int64)
    for j in range(len(a_np)):
        vals = (flat * a_np[j] + b_np[j]) % MH_PRIME
        sig[:, j] = np.minimum.reduceat(vals, starts)
    return sig


def minhash_band_rows(
    df: DataFrame,
    shingle_col: str = "sh",
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, key) LSH bucket rows straight out of the signature's
    Arrow pass — same exact arithmetic as :func:`minhash_signature`,
    but the banding (signature slice -> '_'-joined key string) happens
    in the same numpy step, skipping the (bands x rows)-term band-key
    expression and its explode entirely. Output is n_docs x bands rows
    — the natural shuffle granularity for the bucket join at any scale.
    """
    import numpy as np
    import pandas as pd

    a_np = np.array(minhash_coeffs(k)[0], dtype=np.int64)
    b_np = np.array(minhash_coeffs(k)[1], dtype=np.int64)

    hashed = df.select(
        id_col,
        F.transform(F.col(shingle_col), lambda s: hash60(s) % MH_PRIME).alias(
            "__hs"
        ),
    )

    def gen(batches):
        for pdf in batches:
            sig = _batch_signatures(pdf["__hs"], a_np, b_np)
            n = sig.shape[0]
            ids = np.repeat(pdf[id_col].to_numpy(), bands)
            band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
            keys = [
                "_".join(str(int(x)) for x in sig[i, b * rows : (b + 1) * rows])
                for i in range(n)
                for b in range(bands)
            ]
            yield pd.DataFrame({"id": ids, "band": band_ids, "key": keys})

    return hashed.mapInPandas(gen, schema="id long, band int, key string")


def lsh_band_keys(
    sig_col: str = "sig", bands: int = MH_BANDS, rows: int = MH_ROWS
) -> Column:
    """Array of (band_id, key) structs: key = '_'-joined signature slice.
    Equal key within a band <=> the rows of that band collide."""
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at(F.col(sig_col), bi * rows + j + 1).cast(
                            "string"
                        )
                        for j in range(rows)
                    ],
                ).alias("key"),
            )
            for bi in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two DISTINCT-element arrays via the inclusion-
    exclusion identity |A∩B| = |A|+|B|-|A∪B| — integer sizes, one
    double division, engine-independent."""
    union = F.size(F.array_distinct(F.concat(a, b)))
    inter = F.size(a) + F.size(b) - union
    return inter.cast("double") / F.nullif(union, F.lit(0)).cast("double")


def _ordered_bucket_pairs(ps: Column) -> Column:
    """All unordered element pairs of an array<struct> (structs must
    have an ``id`` field), each emitted as struct(a, b) with a.id <
    b.id. Used to expand grouped LSH buckets into candidate pairs
    without a self-join — a self-join would recompute the whole sketch
    lineage once per side."""

    def _with_rest(x, i):
        rest = F.slice(ps, i + 2, F.size(ps))
        return F.transform(
            rest,
            lambda y: F.struct(
                F.when(x["id"] < y["id"], x).otherwise(y).alias("a"),
                F.when(x["id"] < y["id"], y).otherwise(x).alias("b"),
            ),
        )

    return F.flatten(F.transform(ps, _with_rest))


# per-side member bound for one bucket-expansion task; a bucket larger
# than this is triangle-chunked so no single task materializes it
BUCKET_CHUNK_TARGET = 256


def bucket_pairs_skew_safe(
    df: DataFrame,
    bucket_cols: list[str],
    payload: list[str],
    chunk_target: int = BUCKET_CHUNK_TARGET,
) -> DataFrame:
    """All unordered member pairs per bucket as column ``p`` =
    struct(a, b) with a.id < b.id — hot-bucket safe.

    Buckets up to ``chunk_target`` members expand exactly as before
    (one collect_list row, one task). A larger bucket — e.g. a huge
    identical-template cluster landing in one LSH key — is hash-split
    into nc = ceil(n / chunk_target) chunks and every chunk pair runs
    as its OWN task (triangle scheme): a member of chunk c joins the nc
    groups (min(c, p), max(c, p)); off-diagonal groups emit only
    cross-chunk pairs and the diagonal group emits within-chunk pairs,
    so every bucket pair appears exactly once and per-task memory is
    bounded by 2 * chunk_target members regardless of bucket size. The
    pair SET is identical to the unchunked expansion — results are
    unchanged, only the task decomposition differs.

    ``payload`` columns must include ``id`` (the pair ordering key).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_cols)
    sized = df.withColumn(
        "__nc",
        F.greatest(
            F.ceil(F.count(F.lit(1)).over(w) / F.lit(chunk_target)),
            F.lit(1),
        ).cast("int"),
    ).withColumn(
        "__c", F.pmod(F.xxhash64(F.col("id")), F.col("__nc")).cast("int")
    )
    rep = sized.withColumn(
        "__p", F.explode(F.sequence(F.lit(0), F.col("__nc") - F.lit(1)))
    )
    grouped = (
        rep.groupBy(
            *bucket_cols,
            F.least("__c", "__p").alias("__g1"),
            F.greatest("__c", "__p").alias("__g2"),
        )
        .agg(
            F.collect_list(
                F.struct(*payload, F.col("__c"))
            ).alias("ps")
        )
        .filter(F.size("ps") > 1)
    )
    return (
        grouped.select(
            "__g1",
            "__g2",
            F.explode(_ordered_bucket_pairs(F.col("ps"))).alias("p"),
        )
        .filter(
            (F.col("__g1") == F.col("__g2"))
            | (F.col("p.a.__c") != F.col("p.b.__c"))
        )
        .select("p")
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
) -> DataFrame:
    """LSH candidate pairs only (id_i < id_j), no exact verify: the
    front half of :func:`minhash_lsh_pairs`, reusable by verifiers
    that score candidates with a different exact metric (edit
    distance, containment) — the candidate-only-expensive-verify
    pattern with the sketch stage shared. The shingle lineage is
    consumed once here, so no pinning is needed."""
    base = shingle_sets(docs, id_col=id_col, text_col=text_col, n=n)
    banded = minhash_band_rows(
        base, k=k, bands=bands, rows=rows, id_col=id_col
    )
    return (
        bucket_pairs_skew_safe(banded, ["band", "key"], ["id"])
        .select(
            F.col("p.a.id").alias("id_i"), F.col("p.b.id").alias("id_j")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
) -> DataFrame:
    """Near-duplicate pairs (i < j, exact shingle-Jaccard >= threshold)
    among LSH candidates. Returns (id_i, id_j, jac).

    Plan shape: explode postings -> ONE codegen hash-agg builds the
    signatures; band keys group docs into buckets; pairs expand inside
    each bucket (groupBy + collect_list, never a self-join, so the
    sketch lineage runs once); distinct collapses multi-band hits; two
    hash joins re-attach shingle sets for the exact-Jaccard verify of
    the (tiny) candidate set.
    """
    # localCheckpoint (not persist): the shingle lineage feeds the
    # signature build AND both sides of the verify join — without
    # pinning Spark recomputes the tokenize+shingle+hash pipeline three
    # times. Checkpoint blocks are reclaimed by the ContextCleaner when
    # this frame is GC'd; a persist() would stay pinned in the
    # CacheManager until an explicit unpersist that no caller of a
    # lazily-returned pair list can reasonably place.
    base = shingle_sets(
        docs, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    sh = base.select(F.col(id_col).alias("id"), "sh")
    banded = minhash_band_rows(
        base, k=k, bands=bands, rows=rows, id_col=id_col
    )

    cand = (
        bucket_pairs_skew_safe(banded, ["band", "key"], ["id"])
        .select(
            F.col("p.a.id").alias("id_i"), F.col("p.b.id").alias("id_j")
        )
        .distinct()
    )

    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_i", "sh": "sh_i"}), "id_i")
        .join(sh.withColumnsRenamed({"id": "id_j", "sh": "sh_j"}), "id_j")
        .withColumn("jac", jaccard(F.col("sh_i"), F.col("sh_j")))
        .filter(F.col("jac") >= threshold)
        .select("id_i", "id_j", "jac")
    )
    return verified


def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
) -> tuple[DataFrame, DataFrame]:
    """The corpus's dedup sketch as two reusable frames:
    ``(band_rows, shingle_sets)`` with schemas (id, band, key) and
    (id, sh array<string>). This is the ONE-TIME work of near-dup
    ingest — the analog of the reference's don't-refetch CSV cache
    (core/data/cdd.py:88-100): sketch the corpus once, persist the
    sketch, and every later batch checks against it without touching
    the corpus text again. Write with :func:`write_minhash_index`
    (bucketed by bucket key, so the daily batch join needs no
    corpus-side shuffle)."""
    base = shingle_sets(docs, id_col=id_col, text_col=text_col, n=n)
    banded = minhash_band_rows(
        base, k=k, bands=bands, rows=rows, id_col=id_col
    )
    shing = base.select(F.col(id_col).alias("id"), "sh")
    return banded, shing


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
) -> None:
    """Materialize :func:`minhash_index` under ``path`` as
    ``{path}/bands`` and ``{path}/shingles`` parquet, PARTITIONED by
    ``kb`` (hash bucket of the (band, key) LSH key) and ``ib`` (hash
    bucket of the doc id) respectively, files clustered by (band, key)
    / id within each bucket. A probe that joins on the partition
    column with the batch side broadcast then reads ONLY the batch's
    matching bucket directories (dynamic partition pruning at the
    scan — the plan test pins it), so the per-batch cost of the daily
    / streaming incremental run is O(batch x matching buckets), never
    O(index). (On a warehouse with a catalog, write these via
    sources/bucketed.py ``write_bucketed`` instead to also elide the
    probe-side Exchange; plain partitioned parquet keeps this path
    catalog-free.)

    Each table is seeded as a ``batch=seed`` partition so streaming
    ingest (streaming/ops.py ``dedup_ingest_stream``) can grow the
    index one ``batch=N`` partition per micro-batch in the same
    directory; readers see the extra ``batch``/``kb``/``ib`` partition
    columns, which the join core detects (kb/ib → pruned probe path)
    or ignores."""
    banded, shing = minhash_index(
        docs, id_col=id_col, text_col=text_col, n=n, k=k, bands=bands,
        rows=rows,
    )
    (
        banded.withColumn("kb", band_bucket(F.col("band"), F.col("key")))
        .repartition("kb")
        .sortWithinPartitions("band", "key")
        .write.partitionBy("kb")
        .mode("overwrite")
        .parquet(f"{path}/bands/batch=seed")
    )
    (
        shing.withColumn("ib", id_bucket(F.col("id")))
        .repartition("ib")
        .sortWithinPartitions("id")
        .write.partitionBy("ib")
        .mode("overwrite")
        .parquet(f"{path}/shingles/batch=seed")
    )


def minhash_lsh_pairs_vs_index(
    new_docs: DataFrame,
    seen_bands: DataFrame,
    seen_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental near-dup check against a PRE-SKETCHED corpus: every
    pair touching a NEW document (new x seen and new x new), with
    sketch work proportional to the BATCH only — the daily-ingest
    shape where the corpus is 100 TB and the batch is a sliver.

    ``seen_bands`` (id, band, key) and ``seen_shingles`` (id, sh) come
    from :func:`minhash_index` / :func:`write_minhash_index`; nothing
    here re-reads corpus text. Candidates touching a new doc are
    EXACTLY the corresponding subset of a full run's candidates, so
    results match a full-run filter bitwise. Returns (id_i, id_j, jac)
    with exact-Jaccard verification (seen-side sets come from the
    index, new-side from the batch sketch).

    ``broadcast_batch`` hints the batch's band rows broadcast into the
    bucket join — right when the batch fits the driver (the usual
    case). Spark honors the hint regardless of size, so pass False for
    a bulk backfill and let AQE pick the join strategy.
    """
    new_base = shingle_sets(
        new_docs, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    # ^ batch-sized (NOT corpus-sized): feeds the banding pass and the
    # new-side verify join; localCheckpoint so the per-batch blocks are
    # GC-reclaimed between micro-batches instead of accumulating in the
    # CacheManager for the stream's lifetime
    nb = minhash_band_rows(
        new_base, k=k, bands=bands, rows=rows, id_col=id_col
    )
    new_sh = new_base.select(F.col(id_col).alias("id"), "sh")
    return _pairs_from_sketches(
        nb, new_sh, seen_bands, seen_shingles, threshold, broadcast_batch
    )


def _pairs_from_sketches(
    nb: DataFrame,
    new_sh: DataFrame,
    seen_bands: DataFrame,
    seen_shingles: DataFrame,
    threshold: float,
    broadcast_batch: bool,
) -> DataFrame:
    """Candidate generation + exact-Jaccard verify given the BATCH's
    sketch frames (nb: (id, band, key), new_sh: (id, sh)) and the
    corpus index — the join core shared by the batch and streaming
    incremental paths.

    When the index carries the ``kb``/``ib`` partition columns
    (:func:`write_minhash_index` layout), the probe joins INCLUDE the
    partition column with the batch side broadcast, so the scans get
    dynamic partition pruning — per-batch cost O(batch x matching
    buckets), not a full index scan per micro-batch. Pair set is
    identical either way (the bucket is a pure function of the join
    key, so adding it to the equi-join filters nothing)."""
    pruned_bands = "kb" in seen_bands.columns
    nbq = nb.select(F.col("id").alias("nid"), "band", "key")
    if broadcast_batch:
        nbq = F.broadcast(nbq)
    if pruned_bands:
        # new x seen rides the kb-partitioned scan (DPP); new x new is
        # a batch x batch join — together exactly the old probe union
        # the trailing kb >= 0 is semantically a no-op (pmod range) but
        # load-bearing: the batch frame is typically CACHED, which
        # hides any upstream selective predicate from Catalyst's
        # PartitionPruning rule — without a visible selective filter
        # on this side the rule skips DPP entirely. Pinned by the
        # plan test (test_text_dedup.py::test_index_probe_prunes...).
        nbk = nbq.withColumn(
            "kb", band_bucket(F.col("band"), F.col("key"))
        ).filter(F.col("kb") >= 0)
        raw = (
            seen_bands.select("kb", "band", "key", "id")
            .join(nbk, ["kb", "band", "key"])
            .select("nid", "id")
            .unionByName(
                nb.select("id", "band", "key")
                .join(nbq, ["band", "key"])
                .select("nid", "id")
            )
        )
    else:
        # probe side: corpus bands plus the batch's own bands, so
        # new x new pairs surface in the same join as new x seen
        probe = seen_bands.select("id", "band", "key").unionByName(
            nb.select("id", "band", "key")
        )
        raw = nbq.join(probe, ["band", "key"]).select("nid", "id")
    cand = (
        raw.filter(F.col("nid") != F.col("id"))
        .select(
            F.least("nid", "id").alias("id_i"),
            F.greatest("nid", "id").alias("id_j"),
        )
        .distinct()
    )
    if pruned_bands:
        # the candidate set feeds THREE plan references below (the
        # verify chain plus `need` inside each sh_all occurrence);
        # without materialization the pruned bands join re-executes
        # per reference. cand is candidate-pair-sized (batch-scale) —
        # an eager localCheckpoint is tiny and cuts steady-state
        # micro-batch time ~3x (measured at sf0.1).
        cand = cand.localCheckpoint(eager=True)
    # verify joins read shingle sets from the index for seen docs and
    # from the (batch-sized) sketch for new docs; a doc id appears in
    # exactly one side, so the union is disjoint
    if "ib" in seen_shingles.columns:
        # restrict the index scan to the candidates' bucket dirs: the
        # needed-id frame is candidate-sized (broadcast), its join
        # carries the ib partition column → DPP prunes the scan. The
        # candidate subtree feeds both `need` and the final joins —
        # one shuffle, reused (ReusedExchange), not recomputed.
        # ib >= 0: same DPP-visibility no-op as the kb filter above
        need = F.broadcast(
            cand.select(
                F.explode(F.array("id_i", "id_j")).alias("id")
            )
            .distinct()
            .withColumn("ib", id_bucket(F.col("id")))
            .filter(F.col("ib") >= 0)
        )
        seen_needed = (
            seen_shingles.select("ib", "id", "sh")
            .join(need, ["ib", "id"])
            .select("id", "sh")
        )
        sh_all = seen_needed.unionByName(new_sh.select("id", "sh"))
    else:
        sh_all = seen_shingles.select("id", "sh").unionByName(new_sh)
    return (
        cand.join(
            sh_all.withColumnsRenamed({"id": "id_i", "sh": "sh_i"}), "id_i"
        )
        .join(
            sh_all.withColumnsRenamed({"id": "id_j", "sh": "sh_j"}), "id_j"
        )
        .withColumn("jac", jaccard(F.col("sh_i"), F.col("sh_j")))
        .filter(F.col("jac") >= threshold)
        .select("id_i", "id_j", "jac")
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    k: int = MH_PERMS,
    bands: int = MH_BANDS,
    rows: int = MH_ROWS,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Bootstrap flavor of :func:`minhash_lsh_pairs_vs_index` taking
    the seen corpus as RAW TEXT: sketches the corpus inline (one
    banding + one shingle pass) and delegates. Use only when no
    persisted index exists yet — for recurring ingest, build the index
    once with :func:`write_minhash_index` and call the vs_index form,
    whose per-run cost is proportional to the batch."""
    seen_bands, seen_sh = minhash_index(
        seen_docs, id_col=id_col, text_col=text_col, n=n, k=k,
        bands=bands, rows=rows,
    )
    return minhash_lsh_pairs_vs_index(
        new_docs,
        seen_bands,
        seen_sh,
        id_col=id_col,
        text_col=text_col,
        n=n,
        threshold=threshold,
        k=k,
        bands=bands,
        rows=rows,
        broadcast_batch=broadcast_batch,
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact all-pairs shingle-Jaccard >= threshold via an inverted
    index — NOT a cross product. Explode (doc, shingle-hash), self-
    equi-join on the hash, count shared shingles per pair (inter), then
    jac = inter / (|A| + |B| - inter). Any pair with jac >= tau > 0
    shares a shingle, so nothing is missed; work scales with
    sum(df(shingle)^2) — near-linear when shingles are rare — instead
    of n^2. Shingles join as 60-bit integer hashes (cheap shuffle keys;
    md5-collision odds are negligible).
    """
    sh = shingle_sets(docs, id_col=id_col, text_col=text_col, n=n).select(
        F.col(id_col).alias("id"), "sh"
    )
    ex = sh.select(
        "id",
        F.size("sh").alias("cnt"),
        F.explode(F.transform("sh", lambda s: hash60(s))).alias("h"),
    )
    buckets = (
        ex.groupBy("h")
        .agg(F.collect_list(F.struct("id", "cnt")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    inter = (
        buckets.select(
            F.explode(_ordered_bucket_pairs(F.col("ps"))).alias("p")
        )
        .groupBy(
            F.col("p.a.id").alias("id_i"),
            F.col("p.a.cnt").alias("cnt_i"),
            F.col("p.b.id").alias("id_j"),
            F.col("p.b.cnt").alias("cnt_j"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("cnt_i") + F.col("cnt_j") - F.col("inter")
    ).cast("double")
    return inter.select(
        "id_i", "id_j", jac.alias("jac")
    ).filter(F.col("jac") >= threshold)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric near-dup: max containment inter/min(|A|,|B|) over
    shingle sets — catches a short document quoted inside a long one,
    which symmetric Jaccard structurally misses (jac ≈ |A|/|B| → 0 as
    B grows while containment stays 1). Same inverted-index cost model
    as :func:`ngram_jaccard_pairs` (work ∝ Σ df(shingle)², never n²);
    the ratio is a double quotient of identical integers on both
    engines, so no rounding is needed."""
    sh = shingle_sets(docs, id_col=id_col, text_col=text_col, n=n).select(
        F.col(id_col).alias("id"), "sh"
    )
    ex = sh.select(
        "id",
        F.size("sh").alias("cnt"),
        F.explode(F.transform("sh", lambda s: hash60(s))).alias("h"),
    )
    buckets = (
        ex.groupBy("h")
        .agg(F.collect_list(F.struct("id", "cnt")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    inter = (
        buckets.select(
            F.explode(_ordered_bucket_pairs(F.col("ps"))).alias("p")
        )
        .groupBy(
            F.col("p.a.id").alias("id_i"),
            F.col("p.a.cnt").alias("cnt_i"),
            F.col("p.b.id").alias("id_j"),
            F.col("p.b.cnt").alias("cnt_j"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cmax = F.col("inter").cast("double") / F.least(
        "cnt_i", "cnt_j"
    ).cast("double")
    return inter.select(
        "id_i", "id_j", "inter", cmax.alias("containment")
    ).filter(F.col("containment") >= threshold)


WINNOW_K = 8  # char k-gram length over the normalized text
WINNOW_W = 4  # winnowing window: any match >= w+k-1 chars is guaranteed
WINNOW_DF_CAP = 64  # drop fingerprints shared by more docs (boilerplate)


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every char ``k``-gram of the
    normalized text (lowercased, non-alnum stripped), then keep the
    MINIMUM hash of each sliding window of ``w`` consecutive grams.
    The selected set is content-defined — insertions/deletions only
    perturb fingerprints near the edit — and carries the guarantee
    that any shared substring of length >= w+k-1 chars contributes at
    least one shared fingerprint, a positional promise MinHash (a
    whole-document sample) cannot make.

    Everything is ONE per-row array expression — NO shuffle and no
    explode happens here; density is ~2/(w+1) fingerprints per gram,
    so downstream joins see a ~(w+1)/2-fold smaller posting list than
    full k-gram indexing. The normalized text and the gram-hash array
    are :func:`_let`-bound so each is computed once per row even after
    Catalyst collapses this projection into downstream explodes (see
    ``_let`` for the O(n²) failure mode this prevents). Docs with
    fewer than ``w`` grams degrade gracefully to min-of-all-grams
    (one fingerprint); docs shorter than ``k`` normalized chars yield
    an empty set. Hashes are the portable 60-bit md5 ints
    (functions/text.py), so the DuckDB oracle reproduces the
    selection bitwise. Returns (id, fps).
    """
    empty = F.array().cast("array<long>")

    def _grams(nrm: Column) -> Column:
        return F.when(
            F.length(nrm) >= k,
            F.transform(
                F.sequence(F.lit(1), F.length(nrm) - (k - 1)),
                lambda i: hash60(F.substr(nrm, i, F.lit(k))),
            ),
        ).otherwise(empty)

    def _winnow(g: Column) -> Column:
        return F.when(
            F.size(g) >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(g) - (w - 1), F.lit(1))
                    ),
                    lambda j: F.array_min(
                        F.slice(g, j, F.least(F.lit(w), F.size(g)))
                    ),
                )
            ),
        ).otherwise(empty)

    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    fps = _let(norm, lambda nrm: _let(_grams(nrm), _winnow))
    return docs.select(F.col(id_col).alias("id"), fps.alias("fps"))


def winnow_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    out: str = "fps",
) -> DataFrame:
    """(id, fps) winnowing fingerprint sets — one Arrow pass.

    Semantically identical to :func:`winnow_fingerprints` (same
    ``[^a-z0-9]``-strip normalization, 60-bit md5 gram hashes,
    min-per-window selection, first-occurrence distinct; bitwise-equal
    for ASCII text, which the normalization alphabet effectively
    enforces), but the fast path for the same reason as
    :func:`shingle_sets`: Spark evaluates nested higher-order-function
    lambdas interpreted, outside whole-stage codegen, and the
    fingerprint column gets inlined up to 3x through the downstream
    explode — measured 5.4 s for 5000 sf0.1 docs on ONE task (a single
    parquet split serializes the whole pass). Batched Python through
    Arrow plus the :func:`_parallelize_texts` repartition turns that
    into a full-width sub-second stage. Rows with an empty fingerprint
    set (< k normalized chars) are dropped, matching the callers'
    needs (they contribute no pairs)."""
    import hashlib
    import re

    import pandas as pd

    strip_re = re.compile("[^a-z0-9]")

    def run(batches):
        for pdf in batches:
            ids, fps = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                nrm = strip_re.sub("", str(txt).lower())
                grams = [
                    int(
                        hashlib.md5(
                            nrm[j : j + k].encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    for j in range(len(nrm) - k + 1)
                ]
                if not grams:
                    continue
                n_win = max(len(grams) - w + 1, 1)
                sel = dict.fromkeys(
                    min(grams[j : j + w]) for j in range(n_win)
                )
                ids.append(i)
                fps.append(list(sel))
            yield pd.DataFrame({"id": ids, out: fps})

    return _parallelize_texts(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema=f"id long, `{out}` array<long>")


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    threshold: float = 0.15,
    df_cap: int = WINNOW_DF_CAP,
) -> DataFrame:
    """Near-dup pairs over winnowing fingerprints via the same
    inverted-index shape as :func:`ngram_jaccard_pairs`: explode
    (doc, fingerprint), group by fingerprint, expand in-bucket pairs,
    count shared fingerprints, score jac = shared/(|A|+|B|-shared).
    Work ∝ Σ df(fp)² with df capped at ``df_cap`` — a fingerprint
    selected by more than ``df_cap`` docs is boilerplate (MOSS's
    "ignore ubiquitous code" rule) and is dropped BEFORE pair
    expansion, which both bounds the hottest bucket and removes the
    quadratic blowup a viral n-gram would cause at corpus scale. The
    score is a double quotient of identical integers on both engines
    — no rounding needed. Fingerprints ride the Arrow fast path
    (:func:`winnow_sets`); :func:`winnow_fingerprints` is the
    oracle-documented JVM-expression twin the equality test pins."""
    fp = winnow_sets(docs, id_col, text_col, k, w)
    ex = fp.select(
        "id", F.size("fps").alias("cnt"), F.explode("fps").alias("h")
    )
    buckets = (
        ex.groupBy("h")
        .agg(F.collect_list(F.struct("id", "cnt")).alias("ps"))
        .filter((F.size("ps") > 1) & (F.size("ps") <= df_cap))
    )
    inter = (
        buckets.select(
            F.explode(_ordered_bucket_pairs(F.col("ps"))).alias("p")
        )
        .groupBy(
            F.col("p.a.id").alias("id_i"),
            F.col("p.a.cnt").alias("cnt_i"),
            F.col("p.b.id").alias("id_j"),
            F.col("p.b.cnt").alias("cnt_j"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    wj = F.col("shared").cast("double") / (
        F.col("cnt_i") + F.col("cnt_j") - F.col("shared")
    ).cast("double")
    return inter.select(
        "id_i", "id_j", "shared", wj.alias("winnow_jac")
    ).filter(F.col("winnow_jac") >= threshold)


_POWS = [1 << j for j in range(SIMHASH_BITS)]


def simhash(tok: Column) -> Column:
    """60-bit SimHash of a token array: each token occurrence votes
    +1/-1 per bit of its 60-bit hash; bit j of the result is set when
    votes[j] >= 0. Pure integer folds — order-independent and exact."""
    pows = F.array(*[F.lit(p) for p in _POWS])
    bitlists = F.transform(
        tok,
        lambda t: F.transform(
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda j: F.when(
                hash60(t).bitwiseAND(F.element_at(pows, j + 1)) != 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    votes = F.aggregate(
        bitlists,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
    )
    return F.aggregate(
        F.zip_with(
            votes, pows, lambda vt, p: F.when(vt >= 0, p).otherwise(F.lit(0))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out: str = "simhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash) via explode + ONE codegen hash-agg: each token
    occurrence becomes a row (occurrences weight the vote — classic
    SimHash uses term frequency), 60 conditional-sum columns accumulate
    the bit votes, and a flat 60-term expression assembles the
    signature. Integer sums are order-independent, so this equals the
    per-row array fold bit-for-bit while staying inside whole-stage
    codegen. Docs with no tokens produce no rows."""
    ex = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(id_col, hash60(F.col("__t")).alias("__h"))
    aggs = [
        F.sum(
            F.when(
                F.col("__h").bitwiseAND(F.lit(_POWS[j])) != 0, 1
            ).otherwise(-1)
        ).alias(f"__v{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = ex.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sim = sim + F.when(
            F.col(f"__v{j}") >= 0, F.lit(_POWS[j])
        ).otherwise(F.lit(0))
    return votes.select(id_col, sim.alias(out))


def simhash_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "simhash",
) -> DataFrame:
    """(id, simhash) in one Arrow pass — tokenize, one md5 per token
    occurrence, numpy bit votes. Bitwise-identical to
    :func:`with_simhash` (the codegen explode+aggregate twin, which
    the brute-force banding test cross-checks against this path), but
    skips the 60-conditional-sum aggregate and its codegen compile —
    the same interpreted-HOF/codegen-weight boundary rule as
    :func:`shingle_sets`."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(TOKEN_SPLIT_RE)
    jbits = np.arange(SIMHASH_BITS, dtype=np.int64)

    def run(batches):
        for pdf in batches:
            ids, sims = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in tok_re.split(str(txt).lower()) if t]
                if not toks:
                    continue  # matches with_simhash: no rows, no group
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                        for t in toks
                    ],
                    dtype=np.int64,
                )
                bits = (hs[:, None] >> jbits[None, :]) & 1
                votes = (2 * bits - 1).sum(axis=0)
                sim = int(((votes >= 0).astype(np.int64) << jbits).sum())
                ids.append(i)
                sims.append(sim)
            yield pd.DataFrame({id_col: ids, out: sims})

    return _parallelize_texts(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema=f"`{id_col}` long, `{out}` long")


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = SIMHASH_MAX_DIST,
    chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """Pairs (i < j) with SimHash Hamming distance <= max_dist.

    Pigeonhole banding: split the 60 bits into ``chunks`` equal chunks;
    any pair within distance chunks-1 must agree on >= 1 chunk, so an
    equi-join on (chunk_idx, chunk_value) finds ALL such pairs — the
    result equals brute force exactly, at equi-join cost.
    """
    if max_dist >= chunks:
        raise ValueError("need chunks > max_dist for exact pigeonhole")
    width = SIMHASH_BITS // chunks
    base = simhash_frame(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("id"), "simhash"
    )
    chunked = base.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("v"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.c", "ck.v")
    pairs = bucket_pairs_skew_safe(
        chunked, ["c", "v"], ["id", "simhash"]
    ).select(
        F.col("p.a.id").alias("id_i"),
        F.col("p.b.id").alias("id_j"),
        F.bit_count(
            F.col("p.a.simhash").bitwiseXOR(F.col("p.b.simhash"))
        ).alias("hamming"),
    )
    # filter BEFORE distinct: correlated signatures make chunk buckets
    # large, and deduplicating the full candidate set would shuffle
    # orders of magnitude more rows than the survivors
    return pairs.filter(F.col("hamming") <= max_dist).distinct()


# below this many edges the whole graph is one task's worth of work:
# skip the iterative rounds (each one a checkpoint barrier + a
# convergence read — fixed cost that dominates at small scale) and
# union-find the edge list in a single executor task
CC_SMALL_GRAPH_EDGES = 100_000


def _cc_single_task(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Connected components of an edge list small enough for one task:
    coalesce to a single partition and union-find it in one Arrow pass
    ON THE EXECUTOR (no driver collect). Components are labeled by
    their minimum node id — identical semantics to the hash-min
    iterative path."""
    import pandas as pd

    def run(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["src"], pdf["dst"]):
                a, b = int(a), int(b)
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp = {n: find(n) for n in parent}
        # with min-root unions the root IS the minimum member id
        yield pd.DataFrame(
            {"node": list(comp), "component": list(comp.values())}
        )

    return (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .coalesce(1)
        .mapInPandas(run, schema="node long, component long")
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_i",
    dst_col: str = "id_j",
    max_iters: int = 50,
    small_graph_edges: int = CC_SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Hash-min connected components over an undirected edge list —
    the cluster-resolution step that turns near-duplicate PAIRS into
    dedup decisions (reference has no equivalent; this is the
    training-data-pipeline completion of doc_minhash/simhash_pairs).

    Label propagation with shortcut edges (pointer doubling): every
    node starts labeled min(self, min neighbor); each round the current
    node<->label mapping is unioned into the edge set, so a node sees
    its label's label through the shortcut — label paths halve per
    round and convergence needs O(log diameter) rounds rather than
    O(diameter). (The shortcut is expressed as EXTRA EDGES, not a
    label-table self-join: a self-join of the evolving frame is both
    ambiguous to resolve and was measured to blow up the optimizer.)
    Each round is one shuffle join + partial min-agg of the edge+star
    list, the plan GraphX Pregel runs for CC at cluster scale. The
    per-round driver-side action is iteration CONTROL (it reads one
    aggregate, the label-sum, which strictly decreases until
    convergence), not data movement.

    Returns (node, component) where component = min reachable node id.

    ``max_iters`` is a backstop, not a truncation risk: with pointer
    doubling and two propagation steps per checkpointed round the
    reachable-label distance at least quarters per round, so 50 rounds
    cover any component of diameter < 4**50 — convergence (and the
    early break) always wins first on real data.
    """
    # localCheckpoint everywhere (not persist): persist caches DATA but
    # every reference still carries — and re-analyzes — the full
    # upstream logical plan (here: the whole near-dup pipeline), and
    # ``labels``/``cand`` appear several times per round, so the plan
    # tree multiplies per round and the analyzer dies long before the
    # data does. Checkpointing pins each step to its materialized
    # result — constant plan size at any iteration count. (On a real
    # cluster prefer reliable checkpoint() to a fault-tolerant store;
    # localCheckpoint trades executor-loss recovery for speed.)
    # materialize the pair list ONCE before symmetrizing — the union
    # references ``edges`` twice, which would run the whole upstream
    # pair-generation pipeline twice
    edges = edges.localCheckpoint(eager=True)
    # the count is a cheap scan of the checkpointed list and decides
    # the execution strategy, not the result: small graphs collapse to
    # a single union-find task (saving 2-3 checkpoint barriers +
    # convergence reads), everything else takes the iterative
    # O(log diameter) rounds
    if edges.count() <= small_graph_edges:
        return _cc_single_task(edges, src_col, dst_col)
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed with min(self, min neighbor): one propagation round folded
    # into initialization
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("mn"))
        .select(
            "node", F.least(F.col("node"), F.col("mn")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    # decimal(38,0) so the convergence checksum cannot overflow at any
    # node-id magnitude
    def _prop_once(labels: DataFrame) -> DataFrame:
        # self-loops make the propagation aggregate ITSELF the next
        # label table: every node appears as a dst with (at least) its
        # own component, so min-over-incoming == least(own, neighbor
        # mins) and the former labels-join-back (two more exchanges
        # per round) disappears
        star = labels.filter(F.col("node") != F.col("component"))
        symr = (
            sym.union(
                star.select(
                    F.col("node").alias("src"),
                    F.col("component").alias("dst"),
                )
            )
            .union(
                star.select(
                    F.col("component").alias("src"),
                    F.col("node").alias("dst"),
                )
            )
            .union(
                labels.select(
                    F.col("node").alias("src"), F.col("node").alias("dst")
                )
            )
        )
        return (
            symr.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("component"))
        )

    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)"))
    ).first()[0]
    for rnd in range(max_iters):
        # Adaptive step batching: near-dup graphs are almost always
        # shallow (seed + one round reaches the fixpoint, a second
        # confirms), so the first two rounds run ONE propagation step —
        # the cheapest possible confirm. A graph still unconverged
        # after that has real diameter, and from then on each
        # checkpointed round applies TWO steps: the dominant per-round
        # cost at scale is the fixed overhead of the checkpoint
        # materialization + convergence read (a cluster barrier +
        # state write on a real cluster), while an extra monotone
        # propagation join is cheap and can never change the
        # min-reachable fixpoint. The intermediate is persist()ed —
        # not checkpointed — so the second step's references to it
        # compute it once inside the round's single job; lineage depth
        # stays bounded because the round output is checkpointed.
        if rnd < 2:
            nxt = _prop_once(labels).localCheckpoint(eager=True)
            mid = None
        else:
            mid = _prop_once(labels).persist()
            nxt = _prop_once(mid).localCheckpoint(eager=True)
        if mid is not None:
            mid.unpersist()
        cur_sum = nxt.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]
        labels = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dup_clusters(
    pairs: DataFrame, src_col: str = "id_i", dst_col: str = "id_j"
) -> DataFrame:
    """Near-dup clusters from a pair list: (doc_id, cluster_id,
    cluster_size, is_canonical) for every doc in >= 1 pair. The
    canonical survivor per cluster is the min doc_id — the
    deterministic keep-one-drop-rest policy a dedup pipeline applies
    after pair generation.

    cluster_size goes through groupBy + join rather than a
    count-over-window: a window partitioned by component puts an
    entire cluster's membership in ONE task (a near-all-duplicates
    corpus = one giant partition), while the aggregate gets map-side
    combine and the join gets AQE skew splitting."""
    cc = connected_components(pairs, src_col, dst_col)
    sizes = cc.groupBy(F.col("component").alias("__c")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, cc.component == sizes.__c).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        (F.col("node") == F.col("component")).cast("int").alias(
            "is_canonical"
        ),
    )
