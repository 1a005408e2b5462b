"""Document / text-analysis query domain (documents table).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    BIGRAM_LM_K,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    BURST_TOP_K,
    CHAR_DOMAIN,
    CHUNK_S,
    CHUNK_W,
    CMS_HH_DEN,
    CONTAIN_TAU,
    CTFIDF_TOPK,
    DECONTAM_BENCH_MAX,
    DECONTAM_N,
    DROPOUT_KEEP_MOD,
    DSIR_TARGET_SOURCE,
    DataFrame,
    EDIT_SIM_TAU,
    EN_STOPWORDS,
    F,
    MIX_PPM,
    NEAR_DUP_TAU,
    N_DOC_SHARDS,
    PACK_BUDGET,
    PACK_SHARDS,
    PHRASE,
    PMI_MIN_SUPPORT,
    PMI_TOPK,
    PREFIX_LEN,
    PREFIX_TOP_K,
    QF_MAX_MTL,
    QF_MAX_PUNCT,
    QF_MAX_TOKENS,
    QF_MAX_TOP_SHARE,
    QF_MIN_MTL,
    QF_MIN_STOP,
    QF_MIN_TOKENS,
    RAKE_MAX_PHRASE,
    RAKE_TOPK,
    SEARCH_TERMS,
    SPAN_LEN,
    SPAN_MASK_MOD,
    SQL_INCR_SPLIT,
    SQL_TOKS,
    SparkSession,
    TEXTRANK_TOP_N,
    VOCAB_COVERAGE_KS,
    WINNOW_TAU,
    WSAMPLE_K,
    Window,
    ZIPF_TOP_N,
    _SQL_DOC_MINHASH_BODY,
    _SQL_MINHASH_CAND_CTES,
    _docs_parallel,
    _incr_split_id,
    _minhash_index_path,
    _r6,
    _r6e,
    _rne,
    _snap6_dec,
    _sql_jaccard,
    _sql_r6,
    _sql_r6_wrap,
    _sql_rne,
    _sql_simhash_cte,
    _sql_simhash_pairs,
    _sql_snap6_dec,
    _sql_winnow_pairs,
    fingerprint,
    hash60,
    load_table,
    math,
    minhash_candidate_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    pos_shingles,
    predicted_lang,
    shingles,
    simhash_pairs,
    sql_fingerprint,
    sql_hash60,
    sql_lang_case,
    sql_pos_shingles,
    sql_shingles,
    sql_tokens,
    tokens,
)
from .registry_emb import (  # noqa: F401
    _sql_emb_ood,
    q_emb_ood_score,
)



# --------------------------------------------------------------------------
# document/text queries (documents table)
# --------------------------------------------------------------------------


def q_doc_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


SQL_DOC_EXACT_DUP = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1"""


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, threshold=NEAR_DUP_TAU)
    return out.select("id_i", "id_j", _r6("jac"))


def q_doc_overlap_eval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-eval metrics over the near-dup candidate pairs:
    BLEU-2 (clipped 1/2-gram precisions, geometric mean, brevity
    penalty; Papineni et al. 2002) and ROUGE-1 recall (Lin 2004),
    treating the lower doc_id as reference and the higher as
    candidate — the eval-metric family a training pipeline runs over
    (reference, generation) pairs, here driven by the MinHash sketch
    so the pair set is candidate-sized, never all-pairs. Clipped
    multiset overlaps are integer sums over a (doc, gram) count frame
    joined pair-wise (grams use the positional bigram builder — order
    matters for BLEU); only the final ratios / exp / sqrt run in
    float, identically shaped in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs)
    tok = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    uni = (
        tok.select("doc_id", F.explode("tok").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        tok.select(
            "doc_id", F.explode(pos_shingles(F.col("tok"), 2)).alias("g")
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lens = tok.select("doc_id", F.size("tok").cast("long").alias("n_tok"))

    def clipped(counts, n):
        cd = counts.withColumnsRenamed({"doc_id": "id_j", "c": "cc"})
        rf = counts.withColumnsRenamed({"doc_id": "id_i", "c": "cr"})
        return (
            cand.join(cd, "id_j")
            .join(rf, ["id_i", "g"], "left")
            .groupBy("id_i", "id_j")
            .agg(
                F.sum(
                    F.least(F.col("cc"), F.coalesce(F.col("cr"), F.lit(0)))
                ).alias(f"ov{n}"),
                F.sum("cc").alias(f"tot{n}"),
            )
        )

    j = (
        cand.join(clipped(uni, 1), ["id_i", "id_j"])
        .join(clipped(big, 2), ["id_i", "id_j"], "left")
        .join(
            lens.withColumnsRenamed(
                {"doc_id": "id_i", "n_tok": "len_r"}
            ),
            "id_i",
        )
        .join(
            lens.withColumnsRenamed(
                {"doc_id": "id_j", "n_tok": "len_c"}
            ),
            "id_j",
        )
    )
    p1 = F.col("ov1").cast("double") / F.col("tot1").cast("double")
    p2 = F.when(
        F.col("tot2") > 0,
        F.col("ov2").cast("double") / F.col("tot2").cast("double"),
    )
    rouge1 = F.when(
        F.col("len_r") > 0,
        F.col("ov1").cast("double") / F.col("len_r").cast("double"),
    )
    bp = F.when(F.col("len_c") >= F.col("len_r"), F.lit(1.0)).otherwise(
        F.exp(
            1.0
            - F.col("len_r").cast("double") / F.col("len_c").cast("double")
        )
    )
    x = j.select(
        "id_i", "id_j", "ov1", "ov2", "len_r", "len_c",
        p1.alias("p1"), p2.alias("p2"),
        rouge1.alias("rouge1"), bp.alias("bp"),
    )
    bleu2 = F.when(
        (F.col("p1") > 0) & (F.col("p2") > 0),
        F.col("bp") * F.sqrt(F.col("p1") * F.col("p2")),
    ).otherwise(0.0)
    return x.select(
        "id_i", "id_j", "ov1", "ov2", "len_r", "len_c",
        _rne(F.col("p1"), "p1", 6),
        _rne(F.col("p2"), "p2", 6),
        _rne(F.col("rouge1"), "rouge1", 6),
        _rne(bleu2, "bleu2", 6),
    )


def _sql_doc_overlap_eval_pairs() -> str:
    body = f"""WITH {_SQL_MINHASH_CAND_CTES},
unic AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(tok) AS g FROM toks) GROUP BY 1, 2),
bigc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({sql_pos_shingles('tok', 2)}) AS g
        FROM toks) GROUP BY 1, 2),
lens AS (SELECT doc_id, len(tok)::BIGINT AS n_tok FROM toks),
u AS (
  SELECT c.id_i, c.id_j,
         CAST(sum(least(cd.c, coalesce(rf.c, 0))) AS BIGINT) AS ov1,
         CAST(sum(cd.c) AS BIGINT) AS tot1
  FROM cand c JOIN unic cd ON cd.doc_id = c.id_j
  LEFT JOIN unic rf ON rf.doc_id = c.id_i AND rf.g = cd.g
  GROUP BY 1, 2),
b AS (
  SELECT c.id_i, c.id_j,
         CAST(sum(least(cd.c, coalesce(rf.c, 0))) AS BIGINT) AS ov2,
         CAST(sum(cd.c) AS BIGINT) AS tot2
  FROM cand c JOIN bigc cd ON cd.doc_id = c.id_j
  LEFT JOIN bigc rf ON rf.doc_id = c.id_i AND rf.g = cd.g
  GROUP BY 1, 2),
x AS (
  SELECT c.id_i, c.id_j, u.ov1, b.ov2, lr.n_tok AS len_r,
         lc.n_tok AS len_c,
         u.ov1::DOUBLE / u.tot1::DOUBLE AS p1,
         CASE WHEN b.tot2 > 0
              THEN b.ov2::DOUBLE / b.tot2::DOUBLE END AS p2,
         CASE WHEN lr.n_tok > 0
              THEN u.ov1::DOUBLE / lr.n_tok::DOUBLE END AS rouge1,
         CASE WHEN lc.n_tok >= lr.n_tok THEN 1.0
              ELSE exp(1.0 - lr.n_tok::DOUBLE / lc.n_tok::DOUBLE)
              END AS bp
  FROM cand c JOIN u USING (id_i, id_j)
  LEFT JOIN b USING (id_i, id_j)
  JOIN lens lr ON lr.doc_id = c.id_i
  JOIN lens lc ON lc.doc_id = c.id_j)
SELECT id_i, id_j, ov1, ov2, len_r, len_c, p1, p2, rouge1,
       CASE WHEN p1 > 0 AND p2 > 0 THEN bp * sqrt(p1 * p2)
            ELSE 0.0 END AS bleu2
FROM x"""
    return _sql_r6_wrap(
        body, ["id_i", "id_j", "ov1", "ov2", "len_r", "len_c"],
        ["p1", "p2", "rouge1", "bleu2"],
    )


def q_doc_edit_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs verified by EXACT edit distance: MinHash-
    LSH proposes candidates, Levenshtein scores them, sim = 1 -
    ed/max(len) thresholds at 0.4 — the candidate-only-expensive-
    verify pattern with a true string metric (shingle Jaccard can
    score reordered-but-distinct docs high; edit distance cannot).
    Scale: Levenshtein is O(len²) per pair, so all-pairs is impossible
    at corpus scale — the sketch restricts DP work to candidate
    buckets, and a LOSSLESS length-gap prefilter (ed >= |len_i-len_j|,
    so |Δlen| > (1-τ)·maxlen already caps sim below τ) skips the DP
    for hopeless candidates before it runs. Deterministic end to end:
    integer ed, single-division sim."""
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs)
    t = docs.select(
        "doc_id", "text", F.length("text").cast("int").alias("len")
    )
    j = cand.join(
        t.withColumnsRenamed(
            {"doc_id": "id_i", "text": "text_i", "len": "len_i"}
        ),
        "id_i",
    ).join(
        t.withColumnsRenamed(
            {"doc_id": "id_j", "text": "text_j", "len": "len_j"}
        ),
        "id_j",
    )
    maxlen = F.greatest("len_i", "len_j")
    pre = j.filter(
        F.abs(F.col("len_i") - F.col("len_j"))
        <= F.lit(1.0 - EDIT_SIM_TAU) * maxlen
    )
    out = (
        pre.withColumn("ed", F.levenshtein("text_i", "text_j"))
        .withColumn(
            "sim", F.lit(1.0) - F.col("ed") / maxlen.cast("double")
        )
        .filter(F.col("sim") >= F.lit(EDIT_SIM_TAU))
    )
    return out.select("id_i", "id_j", "ed", "len_i", "len_j", _r6("sim"))


def q_doc_incremental_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup shape: near-dup pairs touching the NEW batch
    (the top tenth of the id space) against the seen corpus, with
    per-run sketch work proportional to the BATCH — the corpus's band
    rows and shingle sets come from the persisted index (built on
    first use, reused after; operators/dedup.py ``write_minhash_index``
    / ``minhash_lsh_pairs_vs_index``). The oracle is the full-run pair
    set filtered to new-touching pairs — the incremental candidate set
    is exactly that subset."""
    from ..operators.dedup import minhash_lsh_pairs_vs_index

    docs = load_table(spark, sf_dir, "documents")
    split = _incr_split_id(spark, sf_dir)
    idx = _minhash_index_path(spark, sf_dir)
    out = minhash_lsh_pairs_vs_index(
        docs.filter(F.col("doc_id") >= split),
        spark.read.parquet(f"{idx}/bands"),
        spark.read.parquet(f"{idx}/shingles"),
        threshold=NEAR_DUP_TAU,
    )
    return out.select("id_i", "id_j", _r6("jac"))


SQL_DOC_INCR = _sql_r6_wrap(
    f"""SELECT * FROM ({_SQL_DOC_MINHASH_BODY})
WHERE id_i >= {SQL_INCR_SPLIT} OR id_j >= {SQL_INCR_SPLIT}""",
    ["id_i", "id_j"],
    ["jac"],
)


def q_doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=NEAR_DUP_TAU)
    return out.select("id_i", "id_j", _r6("jac"))


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs).select(
        "id_i", "id_j", F.col("hamming").cast("int").alias("hamming")
    )


SQL_DOC_SIMHASH = _sql_simhash_pairs()


def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution over the SimHash near-dup pairs: hash-min
    connected components (operators/dedup.py ``connected_components``,
    the GraphX-Pregel-shaped iterative plan), min-id canonical per
    cluster. This is the keep-one-drop-rest decision step a 100-TB
    dedup pipeline runs after pair generation; the oracle labels
    components with a recursive transitive-closure CTE."""
    from ..operators.dedup import dup_clusters, simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return dup_clusters(simhash_pairs(docs))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48) — the
    LLM-data-prep staple that turns long documents into training
    sequences. Pure JVM: one ``sequence`` of chunk starts exploded per
    document, token-array slices re-joined; rows stream out of the
    scan with no shuffle. The trailing partial chunk is kept when it
    has at least stride-overlap-free content (start < n), matching
    the oracle exactly."""
    docs = _docs_parallel(spark, sf_dir)
    tok = tokens(F.col("text"))
    d = docs.select("doc_id", tok.alias("tok"), F.size(tok).alias("n"))
    n_chunks = F.when(
        F.col("n") <= CHUNK_W, F.lit(1)
    ).otherwise(
        F.ceil((F.col("n") - F.lit(CHUNK_W)) / F.lit(CHUNK_S)) + 1
    )
    return (
        d.filter(F.col("n") > 0)
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
            ).alias("chunk_id"),
            "tok",
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(
                " ",
                F.slice(
                    "tok", F.col("chunk_id") * CHUNK_S + 1, CHUNK_W
                ),
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_W), F.col("n") - F.col("chunk_id") * CHUNK_S
            ).alias("n_tokens"),
        )
    )


def _sql_doc_chunks() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS tok FROM documents
),
d AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0),
c AS (
  SELECT doc_id, n, tok,
         unnest(generate_series(0,
           CASE WHEN n <= {CHUNK_W} THEN 0
                ELSE CAST(ceil((n - {CHUNK_W}) / {CHUNK_S}.0) AS INT)
           END)) AS chunk_id
  FROM d
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(list_slice(tok, chunk_id * {CHUNK_S} + 1,
                                  chunk_id * {CHUNK_S} + {CHUNK_W}), ' ')
         AS chunk_text,
       CAST(least({CHUNK_W}, n - chunk_id * {CHUNK_S}) AS INT) AS n_tokens
FROM c"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: fraction of duplicated word
    3-grams (1 - distinct/total) — the boilerplate/spam signal quality
    filters threshold on. Counts come from one Arrow pass
    (operators/dedup.py ngram_count_frame — the n-gram arrays are
    never materialized); the ratio stays a JVM expression."""
    from ..operators.dedup import ngram_count_frame

    docs = load_table(spark, sf_dir, "documents")
    counts = ngram_count_frame(docs, n=3)
    n3 = F.col("n_ngrams")
    d3 = F.col("n_distinct")
    rep = F.when(
        n3 > 0, F.lit(1.0) - d3.cast("double") / n3
    ).otherwise(F.lit(0.0))
    return counts.select(
        "doc_id",
        n3.alias("n_trigrams"),
        F.col("n_distinct"),
        _rne(rep, "rep_ratio"),
    )


def _sql_doc_repetition() -> str:
    body = f"""WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS tok FROM documents
)
SELECT doc_id,
       CAST(greatest(len(tok) - 2, 0) AS INT) AS n_trigrams,
       CAST(len({sql_shingles('tok', 3)}) AS INT) AS n_distinct,
       CASE WHEN greatest(len(tok) - 2, 0) > 0
            THEN 1.0 - len({sql_shingles('tok', 3)})::DOUBLE
                 / greatest(len(tok) - 2, 0)
            ELSE 0.0 END AS rep_ratio
FROM t"""
    return _sql_r6_wrap(
        body, ["doc_id", "n_trigrams", "n_distinct"], ["rep_ratio"]
    )


def q_doc_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: exact word-5-gram overlap of
    every training document against the benchmark set (here: doc_id <
    10 stands in for the held-out eval suite) — the eval-leakage check
    a pretraining pipeline runs before mixing data. The benchmark
    shingle set is tiny by construction and BROADCASTS; the training
    side streams through the join at scan parallelism, so the plan is
    one broadcast join + one aggregate regardless of corpus size.
    Emits per-doc totals, hit counts, the touched-benchmark count, and
    the contamination ratio.

    Plan shape: ONE Arrow shingle pass (operators/dedup.py
    shingle_sets — per-doc distinct 5-grams, so count(*) ==
    countDistinct within a doc), one broadcast LEFT join, one
    aggregate. The left join multiplies a train shingle by its bench
    matches, so every measure is a count-DISTINCT; totals and hits
    come out of the same grouped pass instead of two lineage
    evaluations + a re-join."""
    from ..operators.dedup import shingle_sets

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, n=DECONTAM_N).select(
        "doc_id", F.explode("sh").alias("sh")
    )
    bench = sh.filter(F.col("doc_id") < DECONTAM_BENCH_MAX).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    train = sh.filter(F.col("doc_id") >= DECONTAM_BENCH_MAX)
    return (
        train.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shingles"),
            F.countDistinct(
                F.when(F.col("bench_id").isNotNull(), F.col("sh"))
            ).alias("n_hit"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            "n_bench_docs",
            _rne(
                F.col("n_hit").cast("double") / F.col("n_shingles"),
                "contam_ratio",
            ),
        )
    )


def _sql_doc_decontam() -> str:
    body = f"""WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS tok FROM documents
),
sh AS (
  SELECT doc_id, unnest({sql_shingles('tok', DECONTAM_N)}) AS sh FROM t
),
bench AS (
  SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id < {DECONTAM_BENCH_MAX}
),
train AS (SELECT * FROM sh WHERE doc_id >= {DECONTAM_BENCH_MAX}),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_hit,
         count(DISTINCT b.bench_id) AS n_bench_docs
  FROM train tr JOIN bench b USING (sh) GROUP BY 1
),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1)
SELECT tot.doc_id, n_shingles,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(n_bench_docs, 0) AS BIGINT) AS n_bench_docs,
       coalesce(n_hit, 0)::DOUBLE / n_shingles AS contam_ratio
FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id"""
    return _sql_r6_wrap(
        body,
        ["doc_id", "n_shingles", "n_hit", "n_bench_docs"],
        ["contam_ratio"],
    )


def q_doc_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: probe every training 5-gram
    against a Bloom filter of the benchmark set and report, per doc,
    the filter's hit count NEXT TO the exact overlap — so the
    false-positive rate (the filter's one price) is a measured column,
    not an assumption. A shingle "hits" when ALL k of its bit
    positions are set (countDistinct(d) == k against the benchmark's
    distinct-position frame); at cluster scale the position frame
    packs into a broadcast bitmask and the probe is a map-side bit
    test with no shuffle at all — the standard pre-join pruning
    filter."""
    from ..operators.dedup import shingle_sets
    from ..operators.sketch import BLOOM_K, bloom_positions

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, n=DECONTAM_N).select(
        "doc_id", F.explode("sh").alias("__s")
    ).select("doc_id", hash60(F.col("__s")).alias("h"))
    bench_h = (
        sh.filter(F.col("doc_id") < DECONTAM_BENCH_MAX)
        .select("h")
        .distinct()
    )
    bench_bits = bloom_positions(bench_h).select("pos").distinct()
    train = sh.filter(F.col("doc_id") >= DECONTAM_BENCH_MAX)
    probe = bloom_positions(train)
    full_hits = (
        probe.join(F.broadcast(bench_bits), "pos")
        .groupBy("doc_id", "h")
        .agg(F.countDistinct("d").alias("__k"))
        .filter(F.col("__k") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_bloom_hits"))
    )
    exact_hits = (
        train.join(F.broadcast(bench_h), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_exact_hits"))
    )
    totals = train.groupBy("doc_id").agg(
        F.countDistinct("h").alias("n_shingles")
    )
    return (
        totals.join(full_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
        )
    )


def q_doc_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter terms via a Count-Min sketch (operators/sketch.py):
    build the D x W sparse cell frame in one map-side-combined groupBy,
    estimate every candidate term as the min over its D cells, and keep
    terms whose ESTIMATE clears 0.5% of total token mass. Emits the
    exact count beside the estimate, so the sketch's one-sided error
    (est >= true, inflated only by collisions) is a measured column.
    The hash family is the MinHash affine permutation over the md5
    60-bit term hash — fully deterministic, so the oracle rebuilds the
    identical sketch."""
    from ..operators.sketch import cms_cells, cms_estimate

    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    cells = cms_cells(toks)
    # exact counts double as the candidate set and the error reference
    cand = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(cand.select("term"), cells)
    thresh = toks.agg(
        (F.count(F.lit(1)) / F.lit(CMS_HH_DEN)).alias("__t")
    )
    return (
        cand.join(est, "term")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("est_cnt") >= F.col("__t"))
        .select("term", "true_cnt", "est_cnt")
    )


def q_doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the classic text-pipeline
    relevance feature. TF and DF are exact integer aggregates; the
    corpus size joins in as a broadcast scalar (no collect); ranking is
    by the INTEGER key (tf DESC, df ASC, term ASC) so the result set is
    bitwise deterministic even though the attached smoothed-idf score
    is float (ln differs in the last ulp across libm implementations —
    it is emitted through shared rounding, never used to rank)."""
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # localCheckpoint (not persist): tf feeds BOTH the df aggregate and
    # the scoring join — without pinning, the tokenize+explode+count
    # lineage runs twice. localCheckpoint blocks are reclaimed by the
    # ContextCleaner once this frame is GC'd; persist() would stay
    # pinned in the CacheManager for the session's lifetime (storage
    # leak across a 201-query run).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfx, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (F.col("n_docs") + F.lit(1.0))
                    / (F.col("df") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "rank", "term", "tf", "df", _r6("tfidf"))
    )


def _sql_doc_tfidf() -> str:
    body = f"""WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
j AS (
  SELECT doc_id, term, tf, df,
         tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tf DESC, df ASC, term ASC) AS INT) AS rank
  FROM tf JOIN dfx USING (term), n
)
SELECT doc_id, rank, term, tf, df, tfidf FROM j WHERE rank <= 5"""
    return _sql_r6_wrap(
        body, ["doc_id", "rank", "term", "tf", "df"], ["tfidf"]
    )


def q_doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (Lucene idf variant): top-10 documents for
    a fixed multi-term query — the ranking function every search /
    RAG retrieval stage runs, completing the text-retrieval family
    (doc_search_and is boolean AND, doc_tfidf_topk is per-doc term
    weighting; this is corpus-ranked retrieval with document-length
    normalization). Scale shape: the scan-side token filter keeps only
    query-term tokens, so the posting frame entering the shuffle is
    query-sized, not corpus-sized; doc lengths come from a second
    map-side-only ``size(tokens(text))`` pass (no explode, no
    shuffle — tokenizing twice beats shuffling the exploded corpus);
    corpus stats (N, avgdl) ride in as a broadcast one-row frame.
    Determinism: each (doc, term) BM25 contribution snaps to the 1e-6
    grid and the per-doc sum runs in exact DECIMAL; the top-k ranks on
    that exact decimal (score DESC, doc_id ASC) — float summation
    order cannot reorder the cutoff."""
    docs = _docs_parallel(spark, sf_dir)
    tok = tokens(F.col("text"))
    terms = list(BM25_TERMS)
    # dl feeds BOTH the corpus-stats aggregate and the scoring join;
    # localCheckpoint pins the ~16 B/row (doc_id, dl) frame so the
    # full-text tokenize pass doesn't rerun per consumer (and the
    # blocks are GC-reclaimed, unlike a session-pinned persist). The
    # join with tf then runs on the co-partitioned doc_id layout both
    # sides inherit from _docs_parallel — no extra shuffle at scale.
    dl = docs.select("doc_id", F.size(tok).alias("dl")).localCheckpoint(
        eager=True
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    hits = docs.select(
        "doc_id",
        F.explode(F.filter(tok, lambda t: t.isin(*terms))).alias("term"),
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tf.join(F.broadcast(dfx), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfp = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
    )
    scored = j.select(
        "doc_id",
        "tf",
        _snap6_dec(idf * tfp).alias("contrib"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("score_dec"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("tf").alias("total_tf"),
    )
    # global top-k via orderBy+limit → TakeOrderedAndProject (map-side
    # partial top-k per input partition, then one k-row merge); the
    # previous unpartitioned row_number window sorted EVERY matching
    # doc in one task — InferWindowGroupLimit doesn't fire on an empty
    # partition spec (plan-pinned in tests/test_plans2.py). The rank
    # window then runs over the BM25_TOPK survivors only.
    top = agg.orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    ).limit(BM25_TOPK)
    w = Window.orderBy(F.col("score_dec").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            _r6e(F.col("score_dec").cast("double"), "score"),
            "n_terms",
            "total_tf",
        )
    )


def _sql_doc_bm25() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    contrib = (
        "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
        f" * (tf * {BM25_K1 + 1.0}) / (tf + {BM25_K1}"
        f" * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))"
    )
    body = f"""WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS tok FROM documents
),
dl AS (SELECT doc_id, len(tok) AS dl FROM tok),
st AS (SELECT count(*) AS n_docs,
              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
hits AS (SELECT doc_id, unnest(tok) AS term FROM tok),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM hits
  WHERE term IN ({terms}) GROUP BY 1, 2
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT doc_id,
         sum({_sql_snap6_dec(contrib)}) AS score_dec,
         count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS total_tf
  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), st
  GROUP BY 1
),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY score_dec DESC, doc_id ASC)
         AS INT) AS rank,
         doc_id, CAST(score_dec AS DOUBLE) AS score,
         n_terms, total_tf
  FROM sc
)
SELECT rank, doc_id, score, n_terms, total_tf
FROM r WHERE rank <= {BM25_TOPK}"""
    return _sql_r6_wrap(
        body, ["rank", "doc_id", "n_terms", "total_tf"], ["score"]
    )


def q_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-entropy quality signal: Shannon entropy of
    the document's unigram distribution (bits) plus the type/token
    ratio — the lexical-diversity filter a pretraining pipeline runs
    beside the Gopher rules (low entropy = template/boilerplate/
    repetition; doc_repetition catches LOCAL loops, entropy catches
    GLOBAL skew). H = log2(n) - (Σ tf·log2 tf)/n over the per-doc term
    counts, so one tokenize+explode pass and one doc-keyed combine
    compute it — no per-doc distribution materializes. Determinism:
    the tf·log2(tf) terms snap to the 1e-6 grid and sum in exact
    DECIMAL (shared device with doc_unigram_ppl), so summation order
    cannot perturb the hash."""
    docs = _docs_parallel(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tok"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            _snap6_dec(F.col("tf") * F.log2(F.col("tf")))
        ).alias("sum_bits"),
    )
    ent = F.log2(F.col("n_tok")) - F.col("sum_bits").cast("double") / F.col(
        "n_tok"
    )
    return agg.select(
        "doc_id",
        "n_tok",
        "n_types",
        _r6e(ent, "entropy_bits"),
        _r6e(F.col("n_types") / F.col("n_tok"), "ttr"),
    )


def _sql_doc_token_entropy() -> str:
    body = f"""WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok, count(*) AS n_types,
         sum({_sql_snap6_dec('tf * log2(tf)')}) AS sum_bits
  FROM tf GROUP BY 1
)
SELECT doc_id, n_tok, n_types,
       log2(n_tok) - CAST(sum_bits AS DOUBLE) / n_tok AS entropy_bits,
       CAST(n_types AS DOUBLE) / n_tok AS ttr
FROM agg"""
    return _sql_r6_wrap(
        body, ["doc_id", "n_tok", "n_types"], ["entropy_bits", "ttr"]
    )


def q_doc_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top adjacent-bigram phrases by count with
    pointwise mutual information — the phrase-discovery stage of a
    corpus analysis pipeline (PMI >> 0 = a real phrase, PMI ~ 0 =
    words co-occurring by chance). One tokenize pass feeds both the
    unigram and the bigram counts; the min-support filter prunes the
    bigram table BEFORE the two vocabulary joins (at 100 TB the
    singleton-bigram tail is most of the table, so filtering first is
    the difference between joining a long tail and joining the head);
    corpus totals ride in as a broadcast one-row frame. Ordering and
    the top-k cut use only exact integers and ASCII tokens
    (c_ab DESC, w1, w2); the float PMI is emitted through the shared
    floor-rounding, never ranked on (ln differs in the last ulp
    across libm implementations)."""
    docs = _docs_parallel(spark, sf_dir)
    # localCheckpoint (not persist): one tokenize pass feeds unigram
    # and bigram counts; GC-reclaimable, unlike a session-pinned cache
    toks = docs.select(tokens(F.col("text")).alias("tok")).localCheckpoint(
        eager=True
    )
    uni = toks.select(F.explode("tok").alias("term"))
    uc = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    bigrams = F.when(
        F.size("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tok") - 1),
            lambda i: F.struct(
                F.element_at("tok", i).alias("w1"),
                F.element_at("tok", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = toks.select(F.explode(bigrams).alias("bg")).select(
        "bg.w1", "bg.w2"
    )
    bc = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_SUPPORT)
    )
    totals = uni.agg(F.count(F.lit(1)).alias("n_tok")).crossJoin(
        bi.agg(F.count(F.lit(1)).alias("n_big"))
    )
    pmi = F.log(
        (F.col("c_ab") * 1.0 / F.col("n_big"))
        / (
            (F.col("c_a") * 1.0 / F.col("n_tok"))
            * (F.col("c_b") * 1.0 / F.col("n_tok"))
        )
    )
    return (
        bc.join(uc.select(F.col("term").alias("w1"),
                          F.col("c").alias("c_a")), "w1")
        .join(uc.select(F.col("term").alias("w2"),
                        F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(totals))
        .orderBy(F.col("c_ab").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOPK)
        .select("w1", "w2", "c_ab", "c_a", "c_b", _r6e(pmi, "pmi"))
    )


def _sql_doc_bigram_pmi() -> str:
    pmi = (
        "ln((c_ab * 1.0 / n_big) / "
        "((c_a * 1.0 / n_tok) * (c_b * 1.0 / n_tok)))"
    )
    return f"""
WITH toks AS (SELECT {sql_tokens('text')} AS tok FROM documents),
uni AS (SELECT unnest(tok) AS term FROM toks),
uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
bi AS (
  SELECT tok[i] AS w1, tok[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tok) - 1)) AS i)
  WHERE len(tok) >= 2
),
bc AS (
  SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1, 2
  HAVING count(*) >= {PMI_MIN_SUPPORT}
),
nt AS (SELECT count(*) AS n_tok FROM uni),
nb AS (SELECT count(*) AS n_big FROM bi)
SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
       {_sql_rne(pmi, 'pmi')}
FROM bc JOIN uc a ON w1 = a.term JOIN uc b ON w2 = b.term, nt, nb
ORDER BY c_ab DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOPK}"""


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 terms via an EXPLICIT two-phase aggregate:
    partial counts per (term, physical partition) first, then the final
    sum per term — the salting pattern that keeps a skewed hot key
    (stopwords here; a viral doc id at 100 TB) from funneling through
    one reducer. Counts are exact ints, so the salt never changes the
    answer; top-20 is total-ordered (n DESC, term ASC)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    partial = toks.withColumn("salt", F.spark_partition_id()).groupBy(
        "term", "salt"
    ).agg(F.count(F.lit(1)).alias("pn"))
    return (
        partial.groupBy("term")
        .agg(F.sum("pn").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(20)
    )


SQL_DOC_TOP_TERMS = f"""
SELECT term, count(*) AS n
FROM (SELECT unnest({sql_tokens('text')}) AS term FROM documents)
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT 20"""


def q_doc_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-document text-analysis profile in ONE projection
    pass (previously four queries scanning the table four times):
    whitespace-token stats, quality scoring, heuristic language-ID, and
    the rolling-hash fingerprint. ``n_ws_tokens`` is the
    whitespace-split count; ``n_tokens`` the normalized-token count;
    ``n_bpe_tokens`` a BPE-ish piece count (GPT-2-style word /
    number / punctuation-run splits — the cheap estimator for "how many
    subword tokens will this document cost", verified to split
    identically under Java regex and RE2)."""
    docs = _docs_parallel(spark, sf_dir)
    ws_toks = F.split(F.trim(F.col("text")), r"\s+")
    nonws = F.length(F.regexp_replace("text", r"\s+", ""))
    d = docs.withColumn("tok", tokens(F.col("text")))
    n_tok = F.size("tok")
    tok_chars = F.aggregate(
        F.transform(F.col("tok"), lambda t: F.length(t)),
        F.lit(0),
        lambda a, x: a + x,
    )
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    stop_hits = F.size(
        F.filter(F.col("tok"), lambda t: t.isin(*EN_STOPWORDS))
    )
    d = d.select(
        "doc_id",
        "lang",
        F.size(ws_toks).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"), 0
            )
        ).alias("n_bpe_tokens"),
        F.length("text").alias("len_chars"),
        (nonws / F.size(ws_toks)).alias("avg_token_len"),
        n_tok.alias("n_tokens"),
        (tok_chars.cast("double") / F.nullif(n_tok, F.lit(0))).alias(
            "mean_tok_len"
        ),
        (punct.cast("double") / F.length("text")).alias("punct_ratio"),
        (stop_hits.cast("double") / F.nullif(n_tok, F.lit(0))).alias(
            "stop_ratio"
        ),
        predicted_lang(F.col("tok")).alias("pred_lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    quality = (
        F.when(F.col("n_tokens") >= 10, 1).otherwise(0)
        + F.when(F.col("mean_tok_len").between(3.0, 10.0), 1).otherwise(0)
        + F.when(F.col("punct_ratio") < 0.1, 1).otherwise(0)
        + F.when(F.col("stop_ratio") > 0.05, 1).otherwise(0)
    )
    return d.select(
        "doc_id", "lang", "n_ws_tokens", "n_bpe_tokens", "len_chars",
        "avg_token_len", "n_tokens", _r6("mean_tok_len"),
        _r6("punct_ratio"),
        _r6("stop_ratio"), quality.cast("int").alias("quality"),
        "pred_lang",
        (F.col("pred_lang") == F.col("lang")).cast("int").alias("hit"),
        "fp",
    )


def _sql_doc_text_profile() -> str:
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return rf"""WITH {SQL_TOKS},
m AS (
  SELECT doc_id, lang, text, tok,
    len(string_split_regex(trim(text), '\s+'))::INT AS n_ws_tokens,
    len(regexp_extract_all(text,
        ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))::INT AS n_bpe_tokens,
    length(text)::INT AS len_chars,
    length(regexp_replace(text, '\s+', '', 'g')) /
      len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
    len(tok) AS n_tokens,
    list_reduce(list_prepend(0, list_transform(tok, t -> length(t))),
      (a, x) -> a + x)::DOUBLE / nullif(len(tok), 0) AS mean_tok_len,
    length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
      / length(text) AS punct_ratio,
    len(list_filter(tok, t -> t IN ({stop_list})))::DOUBLE
      / nullif(len(tok), 0) AS stop_ratio
  FROM toks
)
SELECT doc_id, lang, n_ws_tokens, n_bpe_tokens, len_chars, avg_token_len,
  CAST(n_tokens AS INT) AS n_tokens,
  {_sql_r6('mean_tok_len')}, {_sql_r6('punct_ratio')},
  {_sql_r6('stop_ratio')},
  CAST((CASE WHEN n_tokens >= 10 THEN 1 ELSE 0 END
      + CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END
      + CASE WHEN punct_ratio < 0.1 THEN 1 ELSE 0 END
      + CASE WHEN stop_ratio > 0.05 THEN 1 ELSE 0 END) AS INT) AS quality,
  {sql_lang_case('tok')} AS pred_lang,
  CAST({sql_lang_case('tok')} = lang AS INT) AS hit,
  {sql_fingerprint('text')} AS fp
FROM m"""


def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / denylist redaction — the scrub stage every training-data
    pipeline runs before tokenization. Rule set (functions/text.py
    SCRUB_RULES): email, phone, IPv4, term denylist — regexes kept to
    the Java∩RE2-identical subset so engine and oracle agree bitwise.
    Everything is a chained ``regexp_replace``/``regexp_count`` JVM
    expression evaluated at the scan: at 100 TB this is a pure map
    stage — no shuffle, no Python, whole-stage codegen end to end.
    Counts are per-rule on the original text; the scrubbed text is
    carried as an md5 signature plus before/after lengths so the full
    redacted corpus never has to flow through the comparison."""
    from ..functions.text import scrub_col, scrub_counts

    docs = load_table(spark, sf_dir, "documents")
    cnt = scrub_counts(F.col("text"))
    scrubbed = scrub_col(F.col("text"))
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{name}") for name, c in cnt.items()],
        F.md5(scrubbed).alias("scrub_sig"),
        F.length("text").cast("int").alias("len_before"),
        F.length(scrubbed).cast("int").alias("len_after"),
    )


def _sql_doc_pii_scrub() -> str:
    from ..functions.text import sql_scrub, sql_scrub_counts

    cnt = sql_scrub_counts("text")
    counts = ", ".join(f"{e} AS n_{name}" for name, e in cnt.items())
    sc = sql_scrub("text")
    return f"""
SELECT doc_id, {counts},
       md5({sc}) AS scrub_sig,
       CAST(length(text) AS INT) AS len_before,
       CAST(length({sc}) AS INT) AS len_after
FROM documents"""


def q_doc_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-shard writing: every
    doc gets a shard via the portable hash60 (reproducible across
    engines, runs, and cluster sizes — ``rand()`` is none of those)
    and a within-shard position by hash order. At 100 TB this is one
    hash-partition exchange + a per-shard sort — exactly the plan a
    shard writer wants: shards are written in parallel, each task
    sorts only its own shard, and re-running the job yields the same
    shard layout byte for byte."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"))
    d = docs.select(
        "doc_id",
        (h % F.lit(N_DOC_SHARDS)).cast("int").alias("shard_id"),
        h.alias("h"),
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return d.select(
        "doc_id", "shard_id", F.row_number().over(w).alias("pos")
    )


def _sql_doc_shard_assign() -> str:
    h = sql_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, CAST(h % {N_DOC_SHARDS} AS INT) AS shard_id,
       CAST(row_number() OVER (
         PARTITION BY h % {N_DOC_SHARDS} ORDER BY h, doc_id) AS INT) AS pos
FROM (SELECT doc_id, {h} AS h FROM documents)"""


def q_doc_lang_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing — downsample every language to the
    rarest language's volume (the 'data mixing' stage that keeps one
    domain from swamping the training mix). The per-language rate
    table is a tiny two-level aggregate broadcast back onto the scan;
    the keep-decision is the deterministic hash60 Bernoulli thresholded
    in integer ppm so both engines make bit-identical choices. At
    100 TB: one map-side-combined agg for the rates, then a pure scan
    filter — the dropped rows never leave the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    nmin = counts.agg(F.min("n_total").alias("n_min"))
    rates = counts.join(F.broadcast(nmin)).withColumn(
        "keep_ppm",
        F.floor(F.lit(MIX_PPM) * F.col("n_min") / F.col("n_total")).cast(
            "long"
        ),
    )
    kept = (
        docs.join(F.broadcast(rates.select("lang", "keep_ppm")), "lang")
        .filter(
            hash60(F.col("doc_id").cast("string")) % MIX_PPM
            < F.col("keep_ppm")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_kept_id"),
            F.max("doc_id").alias("max_kept_id"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            "keep_ppm",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "min_kept_id",
            "max_kept_id",
        )
    )


def _sql_doc_lang_mixture() -> str:
    h = sql_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
WITH counts AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
rates AS (
  SELECT lang, n_total,
         CAST(floor({MIX_PPM} * (SELECT min(n_total) FROM counts)
                    / n_total) AS BIGINT) AS keep_ppm
  FROM counts),
kept AS (
  SELECT d.lang, count(*) AS n_kept,
         min(doc_id) AS min_kept_id, max(doc_id) AS max_kept_id
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE {h} % {MIX_PPM} < r.keep_ppm
  GROUP BY 1)
SELECT r.lang, r.n_total, r.keep_ppm,
       COALESCE(k.n_kept, 0) AS n_kept, k.min_kept_id, k.max_kept_id
FROM rates r LEFT JOIN kept k ON r.lang = k.lang"""


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — documents are laid head to
    tail in deterministic order and cut into fixed token budgets (the
    GPT-style packing that turns ragged docs into dense training
    sequences; a doc straddling a boundary belongs to the pack where
    it starts). Packing runs independently inside each hash shard so
    the running-offset window parallelizes across the cluster instead
    of serializing on one global cumsum — the per-shard plan is one
    exchange + one sort, and shards stream independently at 100 TB."""
    docs = _docs_parallel(spark, sf_dir)
    tok = tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        (hash60(F.col("doc_id").cast("string")) % F.lit(PACK_SHARDS))
        .cast("int")
        .alias("shard_id"),
        F.size(tok).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    return (
        d.withColumn(
            "pack_id", F.floor(start / F.lit(PACK_BUDGET)).cast("int")
        )
        .groupBy("shard_id", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


def _sql_doc_pack_sequences() -> str:
    h = sql_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT doc_id, CAST({h} % {PACK_SHARDS} AS INT) AS shard_id,
         len({sql_tokens('text')}) AS n_tok
  FROM documents),
o AS (
  SELECT doc_id, shard_id, n_tok,
         sum(n_tok) OVER (PARTITION BY shard_id ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) - n_tok AS start
  FROM d)
SELECT shard_id, CAST(floor(start / {PACK_BUDGET}) AS INT) AS pack_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM o GROUP BY 1, 2"""


def q_doc_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: group on the md5 of the
    canonical token stream (lowercase, punctuation/whitespace
    collapsed) so case/formatting variants of the same content land in
    one group — the cheap dedup tier between byte-exact and MinHash.
    ``n_raw_variants`` counts distinct raw byte forms inside each
    canonical group, i.e. exactly what normalization bought. One
    map-side-combined aggregate; the canonical string never shuffles
    (only its hash does)."""
    docs = _docs_parallel(spark, sf_dir)
    sig = F.md5(F.concat_ws(" ", tokens(F.col("text"))))
    return (
        docs.select("doc_id", sig.alias("canon_sig"), F.md5("text").alias("raw_sig"))
        .groupBy("canon_sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_sig").alias("n_raw_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def _sql_doc_normalized_dedup() -> str:
    return f"""
SELECT md5(array_to_string({sql_tokens('text')}, ' ')) AS canon_sig,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_raw_variants,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1"""


def q_doc_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-level dedup KPI a curation pipeline budgets by:
    what fraction of the TOKEN MASS sits in (normalized-)exact
    duplicate groups, and how many tokens keep-one-per-group dedup
    would actually remove (group mass minus the keeper's — the number
    that becomes storage/compute savings, distinct from the doc-count
    dup rate when duplicates skew long or short). Same canonical md5
    signature as doc_normalized_dedup (ONE definition of 'duplicate'
    engine-wide); keeper = min doc_id via arg-min, removable = group
    token sum minus keeper's. Two map-side-combined aggregates over
    exact integers — the canonical strings never shuffle, only their
    hashes; one corpus row out."""
    docs = _docs_parallel(spark, sf_dir)
    sig = F.md5(F.concat_ws(" ", tokens(F.col("text"))))
    per_doc = docs.select(
        "doc_id",
        sig.alias("canon_sig"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    grp = per_doc.groupBy("canon_sig").agg(
        F.count(F.lit(1)).alias("gs"),
        F.sum("n_tok").alias("g_tok"),
        F.min_by("n_tok", "doc_id").alias("keeper_tok"),
    )
    dup = F.col("gs") >= 2
    agg = grp.agg(
        F.sum("gs").cast("long").alias("n_docs"),
        F.sum(F.when(dup, F.col("gs")).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias(
            "n_dup_groups"
        ),
        F.sum("g_tok").cast("long").alias("total_tok"),
        F.sum(F.when(dup, F.col("g_tok")).otherwise(0))
        .cast("long")
        .alias("dup_tok"),
        F.sum(
            F.when(dup, F.col("g_tok") - F.col("keeper_tok")).otherwise(0)
        )
        .cast("long")
        .alias("removable_tok"),
    )
    return agg.select(
        "n_docs",
        "n_dup_docs",
        "n_dup_groups",
        "total_tok",
        "dup_tok",
        "removable_tok",
        _rne(
            F.col("dup_tok").cast("double")
            / F.col("total_tok").cast("double"),
            "dup_token_share",
            8,
        ),
        _rne(
            F.col("removable_tok").cast("double")
            / F.col("total_tok").cast("double"),
            "dedup_savings",
            8,
        ),
    )


def _sql_doc_dup_inflation() -> str:
    return f"""
WITH per_doc AS (
  SELECT doc_id,
         md5(array_to_string({sql_tokens('text')}, ' ')) AS canon_sig,
         len({sql_tokens('text')})::BIGINT AS n_tok
  FROM documents),
grp AS (
  SELECT canon_sig, count(*) AS gs, sum(n_tok) AS g_tok,
         arg_min(n_tok, doc_id) AS keeper_tok
  FROM per_doc GROUP BY 1)
SELECT sum(gs)::BIGINT AS n_docs,
       sum(CASE WHEN gs >= 2 THEN gs ELSE 0 END)::BIGINT AS n_dup_docs,
       sum(CASE WHEN gs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
       sum(g_tok)::BIGINT AS total_tok,
       sum(CASE WHEN gs >= 2 THEN g_tok ELSE 0 END)::BIGINT AS dup_tok,
       sum(CASE WHEN gs >= 2 THEN g_tok - keeper_tok ELSE 0 END)::BIGINT
         AS removable_tok,
       {_sql_rne(
           'sum(CASE WHEN gs >= 2 THEN g_tok ELSE 0 END)::DOUBLE'
           ' / sum(g_tok)::DOUBLE', 'dup_token_share', 8)},
       {_sql_rne(
           'sum(CASE WHEN gs >= 2 THEN g_tok - keeper_tok ELSE 0 END)'
           '::DOUBLE / sum(g_tok)::DOUBLE', 'dedup_savings', 8)}
FROM grp"""


def q_doc_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash sketch accuracy as a measured column — for every LSH
    candidate pair, the signature-agreement Jaccard estimate
    (matching positions / k) next to the exact shingle Jaccard and
    their absolute error. Same philosophy as the CMS/HLL/Bloom/IVF
    entries: the approximation's quality is a NUMBER the pipeline
    monitors, not a hope. One Arrow signature pass feeds BOTH the
    banding (JVM band-key explode) and the estimate; the exact side
    touches candidates only. k=64 keeps the estimate an exact binary
    fraction, so no rounding is needed on the estimate itself."""
    from ..operators.dedup import (
        MH_PERMS,
        bucket_pairs_skew_safe,
        jaccard,
        lsh_band_keys,
        minhash_signature,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint (not persist): base feeds the signature build AND
    # the exact-Jaccard verify; sig feeds the banding AND the estimate.
    # Blocks are GC-reclaimed after the query — persist() here leaked
    # two corpus-sized cached frames per run (r8 verdict nit).
    base = shingle_sets(docs).localCheckpoint(eager=True)
    sig = minhash_signature(base).localCheckpoint(eager=True)
    banded = sig.select(
        F.col("doc_id").alias("id"),
        F.explode(lsh_band_keys("sig")).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        bucket_pairs_skew_safe(banded, ["band", "key"], ["id"])
        .select(F.col("p.a.id").alias("id_i"), F.col("p.b.id").alias("id_j"))
        .distinct()
    )
    sh = base.select(F.col("doc_id").alias("id"), "sh")
    sg = sig.select(F.col("doc_id").alias("id"), "sig")
    n_eq = F.size(
        F.filter(
            F.zip_with(F.col("sig_i"), F.col("sig_j"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_i", "sh": "sh_i"}), "id_i")
        .join(sh.withColumnsRenamed({"id": "id_j", "sh": "sh_j"}), "id_j")
        .join(sg.withColumnsRenamed({"id": "id_i", "sig": "sig_i"}), "id_i")
        .join(sg.withColumnsRenamed({"id": "id_j", "sig": "sig_j"}), "id_j")
        .withColumn("n_eq", n_eq)
        .withColumn(
            "jac_est",
            F.col("n_eq").cast("double") / F.lit(float(MH_PERMS)),
        )
        .withColumn("jac_exact", jaccard(F.col("sh_i"), F.col("sh_j")))
        .select(
            "id_i",
            "id_j",
            "n_eq",
            "jac_est",
            _r6("jac_exact"),
            _rne(F.abs(F.col("jac_est") - F.col("jac_exact")), "abs_err", 6),
        )
    )


DEDUP_SWEEP_T10S = (1, 2, 3, 4, 5, 6, 7, 8)  # tau = t/10


def q_doc_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-threshold OPERATING CURVE — the table a curation
    pipeline reads before committing to a Jaccard cutoff: for every
    tau in 0.1..0.8, how many LSH candidate pairs the EXACT verify
    would merge, how many the sketch estimate alone would merge, and
    the sketch's precision/recall against the exact decision at that
    tau (pick the cheapest tier whose precision clears policy). Every
    threshold test is an EXACT INTEGER comparison — jac >= t/10 ⟺
    10·|∩| >= t·|∪| and est >= t/10 ⟺ 10·n_eq >= t·k — so the curve
    is bitwise cross-engine with no float thresholds. One candidate
    frame (the shared banded-LSH device, never all-pairs) feeds all
    8 thresholds via a literal explode + one keyed aggregate."""
    from ..operators.dedup import (
        MH_PERMS,
        bucket_pairs_skew_safe,
        lsh_band_keys,
        minhash_signature,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = shingle_sets(docs).localCheckpoint(eager=True)
    sig = minhash_signature(base).localCheckpoint(eager=True)
    banded = sig.select(
        F.col("doc_id").alias("id"),
        F.explode(lsh_band_keys("sig")).alias("bk"),
    ).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    cand = (
        bucket_pairs_skew_safe(banded, ["band", "key"], ["id"])
        .select(F.col("p.a.id").alias("id_i"), F.col("p.b.id").alias("id_j"))
        .distinct()
    )
    sh = base.select(F.col("doc_id").alias("id"), "sh")
    sg = sig.select(F.col("doc_id").alias("id"), "sig")
    n_eq = F.size(
        F.filter(
            F.zip_with(F.col("sig_i"), F.col("sig_j"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_i"), F.col("sh_j")))
    pairs = (
        cand.join(sh.withColumnsRenamed({"id": "id_i", "sh": "sh_i"}), "id_i")
        .join(sh.withColumnsRenamed({"id": "id_j", "sh": "sh_j"}), "id_j")
        .join(sg.withColumnsRenamed({"id": "id_i", "sig": "sig_i"}), "id_i")
        .join(sg.withColumnsRenamed({"id": "id_j", "sig": "sig_j"}), "id_j")
        .select(
            inter.cast("long").alias("inter"),
            (
                F.size("sh_i") + F.size("sh_j") - inter
            ).cast("long").alias("uni"),
            n_eq.cast("long").alias("n_eq"),
        )
    )
    e = pairs.select(
        "inter",
        "uni",
        "n_eq",
        F.explode(
            F.array(*[F.lit(t) for t in DEDUP_SWEEP_T10S])
        ).alias("t10"),
    )
    ex_hit = (10 * F.col("inter") >= F.col("t10") * F.col("uni")).cast(
        "long"
    )
    est_hit = (10 * F.col("n_eq") >= F.col("t10") * MH_PERMS).cast("long")
    agg = e.groupBy("t10").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(ex_hit).alias("n_exact"),
        F.sum(est_hit).alias("n_est"),
        F.sum(ex_hit * est_hit).alias("n_both"),
    )
    prec = F.when(
        F.col("n_est") > 0,
        F.col("n_both").cast("double") / F.col("n_est").cast("double"),
    )
    rec = F.when(
        F.col("n_exact") > 0,
        F.col("n_both").cast("double") / F.col("n_exact").cast("double"),
    )
    return agg.select(
        (F.col("t10").cast("double") / 10).alias("tau"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_est").cast("long").alias("n_est"),
        F.col("n_both").cast("long").alias("n_both"),
        _rne(prec, "est_precision", 8),
        _rne(rec, "est_recall", 8),
    )


def _sql_doc_dedup_threshold_sweep() -> str:
    from ..operators.dedup import MH_PERMS

    eq = (
        f"len(list_filter(range(1, {MH_PERMS} + 1),"
        f" i -> x.sig[i] = y.sig[i]))"
    )
    uni = "len(list_distinct(list_concat(x.sh, y.sh)))"
    t10s = ", ".join(str(t) for t in DEDUP_SWEEP_T10S)
    return f"""WITH {_SQL_MINHASH_CAND_CTES},
pairs AS (
  SELECT (len(x.sh) + len(y.sh) - {uni})::BIGINT AS inter,
         {uni}::BIGINT AS uni,
         CAST({eq} AS BIGINT) AS n_eq
  FROM cand c
  JOIN sigs x ON x.doc_id = c.id_i
  JOIN sigs y ON y.doc_id = c.id_j),
e AS (
  SELECT p.*, t10 FROM pairs p,
         LATERAL (SELECT unnest([{t10s}]) AS t10)),
agg AS (
  SELECT t10, count(*) AS n_candidates,
         sum(CASE WHEN 10 * inter >= t10 * uni THEN 1 ELSE 0 END)
           AS n_exact,
         sum(CASE WHEN 10 * n_eq >= t10 * {MH_PERMS} THEN 1 ELSE 0 END)
           AS n_est,
         sum(CASE WHEN 10 * inter >= t10 * uni
                   AND 10 * n_eq >= t10 * {MH_PERMS}
                  THEN 1 ELSE 0 END) AS n_both
  FROM e GROUP BY 1)
SELECT t10::DOUBLE / 10 AS tau,
       n_candidates::BIGINT AS n_candidates,
       n_exact::BIGINT AS n_exact, n_est::BIGINT AS n_est,
       n_both::BIGINT AS n_both,
       {_sql_rne('CASE WHEN n_est > 0'
                 ' THEN n_both::DOUBLE / n_est::DOUBLE END',
                 'est_precision', 8)},
       {_sql_rne('CASE WHEN n_exact > 0'
                 ' THEN n_both::DOUBLE / n_exact::DOUBLE END',
                 'est_recall', 8)}
FROM agg"""


def q_doc_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup verdict table — what a production pipeline
    actually emits: one row per document with its resolved cluster,
    keep/drop decision, and the reason tier (exact_dup beats near_dup
    beats kept). Composes the exact-hash groups with the SimHash
    connected-components clusters; the keep rule is min-id-canonical
    at both tiers, so the verdict is deterministic and the exact tier
    can never disagree with the cluster tier (identical text implies
    same sketch implies same cluster). One hash aggregate + the CC
    lineage + two broadcast-scale joins back onto the doc list."""
    from ..operators.dedup import dup_clusters, simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    clusters = dup_clusters(simhash_pairs(docs)).select(
        F.col("doc_id").alias("c_doc"), "cluster_id"
    )
    raw = docs.select("doc_id", F.md5("text").alias("raw_sig"))
    eg = raw.groupBy("raw_sig").agg(
        F.min("doc_id").alias("exact_keep"),
        F.count(F.lit(1)).alias("exact_n"),
    )
    j = raw.join(eg, "raw_sig").join(
        clusters, raw["doc_id"] == clusters["c_doc"], "left"
    )
    reason = (
        F.when(
            (F.col("exact_n") > 1) & (F.col("doc_id") != F.col("exact_keep")),
            F.lit("exact_dup"),
        )
        .when(
            F.col("cluster_id").isNotNull()
            & (F.col("doc_id") != F.col("cluster_id")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        reason.alias("reason"),
        (reason == "kept").cast("int").alias("is_kept"),
    )


def _sql_doc_dedup_decisions() -> str:
    return f"""WITH RECURSIVE {_sql_simhash_cte()},
edges AS (
  SELECT id_i AS src, id_j AS dst FROM spairs
  UNION
  SELECT id_j AS src, id_i AS dst FROM spairs
),
r AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM r GROUP BY node),
ex AS (SELECT doc_id, md5(text) AS raw_sig FROM documents),
eg AS (SELECT raw_sig, min(doc_id) AS exact_keep, count(*) AS exact_n
       FROM ex GROUP BY 1),
dec AS (
  SELECT d.doc_id,
         COALESCE(comp.cluster_id, d.doc_id) AS cluster_id,
         CASE WHEN eg.exact_n > 1 AND d.doc_id <> eg.exact_keep
                THEN 'exact_dup'
              WHEN comp.cluster_id IS NOT NULL
                   AND d.doc_id <> comp.cluster_id THEN 'near_dup'
              ELSE 'kept' END AS reason
  FROM ex d JOIN eg USING (raw_sig)
  LEFT JOIN comp ON d.doc_id = comp.node)
SELECT doc_id, cluster_id, reason,
       CAST(reason = 'kept' AS INT) AS is_kept
FROM dec"""


def q_doc_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index conjunctive (AND) search: documents containing
    EVERY query term, with per-term frequencies and a combined score —
    the posting-list-intersection shape. The scan-side filter keeps
    only query-term tokens, so the posting frame entering the shuffle
    is query-sized, not corpus-sized; the intersection is a count
    of distinct matched terms (no self-join of postings)."""
    docs = _docs_parallel(spark, sf_dir)
    tok = tokens(F.col("text"))
    terms = list(SEARCH_TERMS)
    hits = docs.select(
        "doc_id",
        F.explode(F.filter(tok, lambda t: t.isin(*terms))).alias("term"),
    )
    per_term = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    agg = per_term.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").alias("score"),
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .alias(f"tf_{t}")
            for t in terms
        ],
    )
    return agg.filter(F.col("n_terms") == len(terms)).select(
        "doc_id", "score", *[f"tf_{t}" for t in terms]
    )


def _sql_doc_search_and() -> str:
    terms = list(SEARCH_TERMS)
    in_list = ", ".join(f"'{t}'" for t in terms)
    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN term = '{t}' THEN tf ELSE 0 END) AS BIGINT)"
        f" AS tf_{t}"
        for t in terms
    )
    return f"""
WITH {SQL_TOKS},
hits AS (
  SELECT doc_id, unnest(list_filter(tok, t -> t IN ({in_list}))) AS term
  FROM toks),
per_term AS (
  SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score, {tf_cols}
FROM per_term GROUP BY doc_id
HAVING count(DISTINCT term) = {len(terms)}"""


def q_doc_minhash_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH near-dup detector against
    the exact inverted-index Jaccard ground truth at the same
    threshold — the one-row eval card for the sketch family.
    Verification inside the LSH path makes precision 1 by
    construction; what this measures is RECALL (pairs the banding
    never candidates), which is the number an operator tunes bands
    against. Both pair sets are the engine's own green queries; the
    eval adds one full-outer join of two pair-sized frames."""
    docs = load_table(spark, sf_dir, "documents")
    lsh = minhash_lsh_pairs(docs, threshold=NEAR_DUP_TAU).select(
        "id_i", "id_j", F.lit(1).alias("in_lsh")
    )
    exact = ngram_jaccard_pairs(docs, threshold=NEAR_DUP_TAU).select(
        "id_i", "id_j", F.lit(1).alias("in_exact")
    )
    j = lsh.join(exact, ["id_i", "id_j"], "full_outer")
    return j.agg(
        F.count_if(
            F.col("in_lsh").isNotNull() & F.col("in_exact").isNotNull()
        ).alias("tp"),
        F.count_if(
            F.col("in_lsh").isNotNull() & F.col("in_exact").isNull()
        ).alias("fp"),
        F.count_if(
            F.col("in_lsh").isNull() & F.col("in_exact").isNotNull()
        ).alias("fn"),
    ).select(
        "tp",
        "fp",
        "fn",
        # an empty candidate (or truth) set makes the denominator 0:
        # Spark's Divide yields NULL there but DuckDB's double
        # division yields nan (0/0) — emit NULL in both engines by
        # construction (CASE WHEN mirrored in the oracle)
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp") / (F.col("tp") + F.col("fp")),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp") / (F.col("tp") + F.col("fn")),
        ).alias("recall"),
    )


def q_doc_textrank_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank-style keyword ranking: the word co-occurrence graph
    (adjacent token pairs, weighted by count) scored with two
    unnormalized power iterations — score₁ = weighted degree,
    score₂(w) = Σ_{u∈N(w)} weight(u,w)·score₁(u) — the same
    all-integer iteration algebra as the HITS query, applied to the
    keyword-extraction task. Top-20 terms, fully tie-broken."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(tokens(F.col("text")).alias("ts"))
    pairs = tok.select(
        F.explode(
            F.zip_with(
                F.slice("ts", 1, F.size("ts") - 1),
                F.slice("ts", 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("v")),
            )
        ).alias("p")
    ).select("p.u", "p.v")
    und = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges = und.groupBy("u", "v").agg(F.count(F.lit(1)).alias("wt"))
    s1 = edges.groupBy("u").agg(F.sum("wt").alias("s1"))
    s2 = (
        edges.join(s1.select(F.col("u").alias("v"), "s1"), "v")
        .groupBy("u")
        .agg(F.sum(F.col("wt") * F.col("s1")).alias("s2"))
    )
    return (
        s2.join(s1, "u")
        .select(
            F.col("u").alias("term"),
            F.col("s1").alias("degree_score"),
            F.col("s2").alias("textrank_score"),
        )
        .orderBy(F.col("textrank_score").desc(), F.col("term").asc())
        .limit(TEXTRANK_TOP_N)
    )


def _sql_doc_textrank() -> str:
    return f"""
WITH toks AS (SELECT {sql_tokens('text')} AS ts FROM documents),
pairs AS (
  SELECT ts[i] AS u, ts[i + 1] AS v
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ts) - 1)) AS i)),
und AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
edges AS (SELECT u, v, count(*) AS wt FROM und GROUP BY 1, 2),
s1 AS (SELECT u, sum(wt) AS s1 FROM edges GROUP BY 1),
s2 AS (
  SELECT e.u, sum(e.wt * n.s1) AS s2
  FROM edges e JOIN s1 n ON e.v = n.u GROUP BY 1)
SELECT s2.u AS term, CAST(s1.s1 AS BIGINT) AS degree_score,
       CAST(s2.s2 AS BIGINT) AS textrank_score
FROM s2 JOIN s1 ON s2.u = s1.u
ORDER BY textrank_score DESC, term ASC LIMIT {TEXTRANK_TOP_N}"""


def q_doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the engine's
    stopword-profile language heuristic (functions/text.py
    predicted_lang) against the labeled lang column, with per-cell
    counts — the eval artifact that justifies (or retires) a
    heuristic classifier in the pipeline. One scan, one
    map-side-combined count; the prediction expression is shared
    verbatim with the text-profile query."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("label"),
            predicted_lang(tokens(F.col("text"))).alias("predicted"),
        )
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _sql_doc_lang_confusion() -> str:
    return f"""
WITH t AS (
  SELECT lang AS label, {sql_lang_case(sql_tokens('text'))} AS predicted
  FROM documents)
SELECT label, predicted, count(*) AS n
FROM t GROUP BY 1, 2"""


def q_doc_augment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-data augmentation as engine transforms:
    hash-keyed token dropout (keep a token iff
    hash(doc_id|pos) % 10 < 9) and T5-style span corruption (mask
    every token whose 8-token span hashes to 0 mod 5) — reproducible
    across runs, partitions, and engines because the randomness IS the
    portable hash, never rand(). Emits per-doc counts plus the md5 of
    each augmented token stream, so the downstream pipeline can verify
    byte-identical augmentation without shipping the text."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    keep = (
        hash60(
            F.concat_ws("|", F.col("doc_id").cast("string"),
                        F.col("pos").cast("string"))
        )
        % DROPOUT_KEEP_MOD
        < DROPOUT_KEEP_MOD - 1
    )
    span = (F.col("pos") / SPAN_LEN).cast("long")
    masked = (
        hash60(
            F.concat_ws("#", F.col("doc_id").cast("string"),
                        span.cast("string"))
        )
        % SPAN_MASK_MOD
        == 0
    )
    d = tok.withColumn("keep", keep).withColumn("masked", masked)
    return d.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.count_if(F.col("keep")).alias("n_kept"),
        F.count_if(F.col("masked")).alias("n_masked"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("pos", "tok"),
                            )
                        )
                    ),
                    lambda z: z["tok"],
                ),
            )
        ).alias("dropout_md5"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok", "masked"))),
                    lambda z: F.when(z["masked"], F.lit("<X>")).otherwise(
                        z["tok"]
                    ),
                ),
            )
        ).alias("corrupt_md5"),
    )


def _sql_doc_augment() -> str:
    keep_h = sql_hash60(
        "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(pos AS VARCHAR))"
    )
    span_h = sql_hash60(
        f"concat_ws('#', CAST(doc_id AS VARCHAR),"
        f" CAST(CAST(floor(pos / {SPAN_LEN}) AS BIGINT) AS VARCHAR))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, u.pos, u.tok
  FROM documents, LATERAL (
    SELECT unnest({sql_tokens('text')}) AS tok,
           generate_subscripts({sql_tokens('text')}, 1) - 1 AS pos) u),
d AS (
  SELECT doc_id, pos, tok,
         {keep_h} % {DROPOUT_KEEP_MOD} < {DROPOUT_KEEP_MOD - 1} AS keep,
         {span_h} % {SPAN_MASK_MOD} = 0 AS masked
  FROM tok)
SELECT doc_id, count(*) AS n_tok,
       CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (masked) AS BIGINT) AS n_masked,
       md5(string_agg(tok, ' ' ORDER BY pos) FILTER (keep))
         AS dropout_md5,
       md5(string_agg(CASE WHEN masked THEN '<X>' ELSE tok END,
                      ' ' ORDER BY pos)) AS corrupt_md5
FROM d GROUP BY 1"""


def q_doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope
    of ln(frequency) against ln(rank) for the top-100 terms — the
    corpus-statistics sanity check (natural language sits near −1;
    boilerplate-heavy or synthetic corpora drift). Ranking is fully
    tie-broken (count desc, term asc); regression terms snap to the
    1e-6 grid before exact DECIMAL sums, so only the closed-form
    division runs in float."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    ranked = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(ZIPF_TOP_N)
        .withColumn(
            "rank",
            # global window is safe here: it runs over the post-limit
            # frame (≤ ZIPF_TOP_N = 100 rows — constant, not
            # data-sized), so the single task holds 100 rows at any SF
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
            ),
        )
    )
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    terms = ranked.select(
        snap(F.log(F.col("rank").cast("double"))).alias("x"),
        snap(F.log(F.col("cnt").cast("double"))).alias("y"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(18,6)")).alias("sy"),
        F.sum(
            snap(F.col("x") * F.col("y")).cast("decimal(18,6)")
        ).alias("sxy"),
        F.sum(
            snap(F.col("x") * F.col("x")).cast("decimal(18,6)")
        ).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return agg.select(
        F.col("n").alias("n_terms"),
        _rne(slope, "zipf_slope", 6),
        _rne(intercept, "zipf_intercept", 6),
    )


def _sql_doc_zipf() -> str:
    snap = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    return f"""
WITH tok AS (
  SELECT unnest({sql_tokens('text')}) AS tok FROM documents),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
  FROM (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1)
  ORDER BY cnt DESC, tok ASC LIMIT {ZIPF_TOP_N}),
terms AS (
  SELECT {snap('ln(CAST(rank AS DOUBLE))')} AS x,
         {snap('ln(CAST(cnt AS DOUBLE))')} AS y
  FROM ranked),
agg AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST({snap('x * y')} AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST({snap('x * x')} AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM terms)
SELECT n AS n_terms,
       {_sql_rne(
           '(n * sxy - sx * sy) / (n * sxx - sx * sx)', 'zipf_slope')},
       {_sql_rne(
           '(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n',
           'zipf_intercept')}
FROM agg"""


def q_doc_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: documents containing the exact token
    sequence — the positional-index shape a search engine uses beyond
    bag-of-words AND. Tokens posexplode with their positions, the
    scan-side term filter keeps the posting frame phrase-sized, and
    adjacency is an equi-join on (doc, pos+1) — never a string scan of
    the whole corpus per query. Emits doc_id + match count."""
    docs = load_table(spark, sf_dir, "documents")
    w1, w2 = PHRASE
    pos = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "term"),
    ).filter(F.col("term").isin(w1, w2))
    a = pos.filter(F.col("term") == w1).select(
        "doc_id", F.col("pos").alias("p1")
    )
    b = pos.filter(F.col("term") == w2).select(
        "doc_id", F.col("pos").alias("p2")
    )
    return (
        a.join(b, "doc_id")
        .filter(F.col("p2") == F.col("p1") + 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


SQL_DOC_SEARCH_PHRASE = f"""
WITH pos AS (
  SELECT doc_id, u.term, u.pos
  FROM documents, LATERAL (
    SELECT unnest({sql_tokens('text')}) AS term,
           generate_subscripts({sql_tokens('text')}, 1) AS pos) u
  WHERE u.term IN ('{PHRASE[0]}', '{PHRASE[1]}'))
SELECT a.doc_id, count(*) AS n_matches
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
GROUP BY 1"""


def q_doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (operators/dedup.py
    containment_pairs): inter/min(|A|,|B|) ≥ 0.5 — the
    quote/subset-duplication detector symmetric Jaccard misses."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=CONTAIN_TAU)


SQL_DOC_CONTAINMENT = f"""WITH {{toks}},
s AS (SELECT doc_id, {{shingles}} AS sh FROM toks),
sf AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
e AS (
  SELECT doc_id, len(sh) AS cnt,
         unnest(list_transform(sh, s -> {{h60}})) AS h
  FROM sf),
p AS (
  SELECT a.doc_id AS id_i, a.cnt AS cnt_i, b.doc_id AS id_j,
         b.cnt AS cnt_j, count(*) AS inter
  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_i, id_j, inter,
       inter::DOUBLE / least(cnt_i, cnt_j)::DOUBLE AS containment
FROM p
WHERE inter::DOUBLE / least(cnt_i, cnt_j)::DOUBLE >= {CONTAIN_TAU}"""


def q_doc_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first scan of BPE tokenizer training: adjacent character
    pairs inside word tokens, weighted by token frequency — the
    pair-count table whose argmax is BPE's first merge. Computed over
    the VOCABULARY (distinct tokens + counts), not the token stream:
    by Heaps' law the vocab is sublinear in corpus size, so the
    character-pair explosion — the expensive step — runs on the small
    frame while the corpus contributes only a map-side-combined token
    count. All integer arithmetic; top-20 with pair tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.length("tok") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(20)
    )


SQL_DOC_BPE_MERGES = f"""
WITH tok AS (
  SELECT unnest({sql_tokens('text')}) AS tok FROM documents),
vocab AS (
  SELECT tok, count(*) AS cnt FROM tok GROUP BY 1 HAVING length(tok) >= 2),
pairs AS (
  SELECT substr(tok, i, 2) AS pair, cnt
  FROM vocab, LATERAL (
    SELECT unnest(generate_series(1, length(tok) - 1)) AS i))
SELECT pair, CAST(sum(cnt) AS BIGINT) AS weight
FROM pairs GROUP BY 1
ORDER BY weight DESC, pair ASC LIMIT 20"""


BPE_ROUNDS = 5


def q_doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, k=5 bounded merge rounds (VERDICT r11
    item 5; extends doc_bpe_first_merges from the first argmax to the
    iterative loop a real LLM-data pipeline runs — Sennrich et al.'s
    learn_bpe): words live as space-separated symbol strings over the
    VOCABULARY (distinct token + count — Heaps-law sublinear in the
    corpus, so only the first tf pass is corpus-sized); each round
    counts adjacent symbol pairs weighted by token frequency, takes
    the argmax (weight desc, pair asc — deterministic), and merges it
    everywhere with one literal ``replace(word, 'a b', 'ab')`` —
    leftmost non-overlapping, exactly learn_bpe's single-pass merge,
    and bitwise-identical semantics in Spark and DuckDB. Per round:
    one vocab-sized pair aggregate + a 1-row broadcast joined back —
    never corpus-sized after the tf pass; rounds are a bounded unroll
    (the PageRank/k-core convention). Returns the learned merge table
    (round, lhs, rhs, weight). All-integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.array_join(F.split("tok", ""), " ").alias("word"), "cnt"
        )
    )
    merges = []
    for rnd in range(1, BPE_ROUNDS + 1):
        syms = F.split("word", " ")
        # single-symbol words carry no pairs (and F.sequence would run
        # DESCENDING on size-2 < 0 — Spark's start>stop semantics)
        pairs = vocab.filter(F.size(syms) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(syms) - 2),
                    lambda i: F.struct(
                        F.element_at(syms, i + 1).alias("lhs"),
                        F.element_at(syms, i + 2).alias("rhs"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("weight"))
            .orderBy(
                F.col("weight").desc(),
                F.col("lhs").asc(),
                F.col("rhs").asc(),
            )
            .limit(1)
        )
        best = best.localCheckpoint(eager=True)  # pin the argmax: the
        # merged vocab feeds the NEXT round's counts, so without a
        # barrier each round would recompute every prior round's scan
        merges.append(best.select(F.lit(rnd).cast("long").alias("round"), "*"))
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            F.replace(
                F.col("word"),
                F.concat(F.col("lhs"), F.lit(" "), F.col("rhs")),
                F.concat(F.col("lhs"), F.col("rhs")),
            ).alias("word"),
            "cnt",
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _sql_doc_bpe_merges() -> str:
    ctes = [
        f"tok AS (SELECT unnest({sql_tokens('text')}) AS tok"
        " FROM documents)",
        "vocab0 AS (SELECT array_to_string(string_split(tok, ''), ' ')"
        " AS word, count(*) AS cnt FROM tok GROUP BY tok)",
    ]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(
            f"""p{r} AS (
  SELECT syms[i] AS lhs, syms[i+1] AS rhs, cnt
  FROM (SELECT string_split(word, ' ') AS syms, cnt FROM vocab{r - 1}),
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i))"""
        )
        ctes.append(
            f"""best{r} AS (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS weight
  FROM p{r} GROUP BY 1, 2
  ORDER BY weight DESC, lhs ASC, rhs ASC LIMIT 1)"""
        )
        ctes.append(
            f"""vocab{r} AS (
  SELECT replace(word, lhs || ' ' || rhs, lhs || rhs) AS word, cnt
  FROM vocab{r - 1}, best{r})"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, lhs, rhs, weight"
        f" FROM best{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def q_doc_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: a unigram language model is fit
    on the corpus itself (one token-count aggregate), then every
    document is scored by its mean negative log₂ token probability
    (bits/token) — the perplexity filter a pretraining pipeline runs
    to rank documents by fluency. The vocabulary aggregate broadcasts
    back into the exploded token stream (vocab ≪ corpus — the whole
    point of a unigram LM), so the scoring pass is one doc_id-keyed
    combine. Determinism: each token's surprisal snaps to the 1e-6
    grid BEFORE the per-doc sum, which then runs in exact
    DECIMAL(18,6) — summation order cannot perturb the result."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    bits = F.floor(
        -F.log2(F.col("cnt") / F.col("total")) * 1e6 + F.lit(0.5)
    ) / 1e6
    scored = tok.join(F.broadcast(vocab.crossJoin(total)), "tok").select(
        "doc_id", bits.cast("decimal(18,6)").alias("bits")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("bits").alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_tok",
            (
                F.floor(
                    F.col("sum_bits").cast("double")
                    / F.col("n_tok")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("bits_per_token"),
        )
    )


SQL_DOC_UNIGRAM_PPL = f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
total AS (SELECT sum(cnt) AS total FROM vocab),
scored AS (
  SELECT doc_id,
         CAST(floor(-log2(cnt / total) * 1000000.0 + 0.5) / 1000000.0
              AS DECIMAL(18,6)) AS bits
  FROM tok JOIN vocab USING (tok) CROSS JOIN total)
SELECT doc_id, count(*) AS n_tok,
       floor(CAST(sum(bits) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
         / 1000000.0 AS bits_per_token
FROM scored GROUP BY 1"""


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc draws u from the portable
    hash60 (reproducible across engines/runs/cluster sizes — rand()
    is none of those) and competes on key = ln(u)/w with w = n_chars;
    the top-``WSAMPLE_K`` keys ARE a weight-proportional sample
    without replacement. The selection is a distributed top-K
    (orderBy+limit — per-partition heaps, no global window, no
    shuffle of the losers), so the plan is one scan + one K-row
    reduce at any corpus size. Keys snap to the 1e-6 grid with a
    doc_id tie-break so the cut is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
    m53 = F.lit(9007199254740992)  # 2^53
    u = (h % m53 + 1).cast("double") / F.lit(9007199254740993.0)
    key = F.floor(
        F.log(u) / F.col("n_chars") * 1e6 + F.lit(0.5)
    ) / 1e6 + F.lit(0.0)
    # w = 0 docs carry key = -inf under A-ES (never sampled), but the
    # division itself diverges across engines (Spark NULL vs DuckDB
    # -inf), so exclude them BEFORE dividing — mirrored in the oracle.
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", key.alias("skey"))
        .orderBy(F.col("skey").desc(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
    )


def _sql_doc_weighted_sample() -> str:
    h = sql_hash60("'ws:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, n_chars,
       floor(ln((({h}) % 9007199254740992 + 1) / 9007199254740993.0)
             / n_chars * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS skey
FROM documents
WHERE n_chars > 0
ORDER BY skey DESC, doc_id ASC LIMIT {WSAMPLE_K}"""


def q_doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by the mean
    per-token log-likelihood ratio between a TARGET unigram LM (docs
    from ``DSIR_TARGET_SOURCE``) and the CORPUS LM, both
    Laplace-smoothed over the shared corpus vocabulary — the signal a
    pretraining pipeline resamples on to shift the mixture toward a
    target domain. Same plumbing contract as the perplexity filter:
    vocab aggregates broadcast back into the token stream (vocab ≪
    corpus), each token's log-ratio snaps to the 1e-6 grid, per-doc
    sums run in exact DECIMAL(18,6), and only the final mean divides
    in float."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_cnt"),
        F.count_if(F.col("source") == DSIR_TARGET_SOURCE).alias("t_cnt"),
    )
    totals = vocab.agg(
        F.sum("c_cnt").alias("c_total"),
        F.sum("t_cnt").alias("t_total"),
        F.count(F.lit(1)).alias("vsize"),
    )
    lam = F.floor(
        (
            F.log(
                (F.col("t_cnt") + 1)
                / (F.col("t_total") + F.col("vsize")).cast("double")
            )
            - F.log(
                (F.col("c_cnt") + 1)
                / (F.col("c_total") + F.col("vsize")).cast("double")
            )
        )
        * 1e6
        + F.lit(0.5)
    ) / 1e6
    scored = tok.join(
        F.broadcast(vocab.crossJoin(totals)), "tok"
    ).select("doc_id", lam.cast("decimal(18,6)").alias("lam"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("lam").alias("sum_lam"),
        )
        .select(
            "doc_id",
            "n_tok",
            _rne(
                F.col("sum_lam").cast("double") / F.col("n_tok"),
                "dsir_logratio",
                6,
            ),
        )
    )


def _sql_doc_dsir() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, source, unnest({sql_tokens('text')}) AS tok
  FROM documents),
vocab AS (
  SELECT tok, count(*) AS c_cnt,
         count(*) FILTER (source = '{DSIR_TARGET_SOURCE}') AS t_cnt
  FROM tok GROUP BY 1),
totals AS (
  SELECT sum(c_cnt) AS c_total, sum(t_cnt) AS t_total,
         count(*) AS vsize FROM vocab),
scored AS (
  SELECT doc_id,
         CAST(floor((ln((t_cnt + 1) / CAST(t_total + vsize AS DOUBLE))
                     - ln((c_cnt + 1) / CAST(c_total + vsize AS DOUBLE)))
                * 1000000.0 + 0.5) / 1000000.0
              AS DECIMAL(18,6)) AS lam
  FROM tok JOIN vocab USING (tok) CROSS JOIN totals)
SELECT doc_id, count(*) AS n_tok,
       {_sql_rne('CAST(sum(lam) AS DOUBLE) / count(*)', 'dsir_logratio')}
FROM scored GROUP BY 1"""


def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — what fraction of a doc's 3-gram
    shingles appear in NO earlier document (by doc_id ingest order)?
    The dataset-curation curve behind "is the tail of this crawl still
    contributing new content": novelty decays as a corpus saturates,
    and near-zero novelty docs are cheap near-dup suspects. One
    inverted-index aggregate (min doc_id per shingle — map-side
    combined) joined back to the doc-shingle stream: Σdf cost, never
    pairwise. Shares the hash60-shingle plumbing (and hence the
    df-cap discipline) with the Jaccard family; docs with < 3 tokens
    have no shingles and emit no row in either engine."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    e = tok.select(
        "doc_id",
        F.explode(shingles(F.col("tok"), 3)).alias("s"),
    ).select("doc_id", hash60(F.col("s")).alias("h"))
    first = e.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        e.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias(
                "n_novel"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        _rne(
            F.col("n_novel") / F.col("n_shingles").cast("double"),
            "novelty",
            6,
        ),
    )


def _sql_doc_ngram_novelty() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS tok FROM documents),
s AS (SELECT doc_id, {sql_shingles('tok', 3)} AS sh FROM toks),
e AS (
  SELECT doc_id, unnest(list_transform(sh, x -> {sql_hash60('x')})) AS h
  FROM s WHERE len(sh) > 0),
first_ AS (SELECT h, min(doc_id) AS first_doc FROM e GROUP BY 1)
SELECT e.doc_id, count(*) AS n_shingles,
       CAST(count(*) FILTER (f.first_doc = e.doc_id) AS BIGINT)
         AS n_novel,
       {_sql_rne(
           'CAST(count(*) FILTER (f.first_doc = e.doc_id) AS DOUBLE)'
           ' / count(*)', 'novelty')}
FROM e JOIN first_ f USING (h) GROUP BY 1"""



def q_doc_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact duplicate detection (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    substring-dedup shape): maximal runs of consecutive 8-gram
    shingles that appear in ≥ 2 distinct documents — the spans a
    training pipeline would cut, where doc-level dedup keeps both
    docs. One inverted-index distinct-doc count per shingle (map-side
    combined, shuffle keyed on the 60-bit hash — uniformly
    distributed), joined back co-partitioned on the same key, then a
    per-doc ``pos − row_number()`` run-merge window. Work is Σ
    positions — NEVER pairwise, no suffix array materialization; the
    span report is integers end-to-end (no float hashing concerns).
    Docs with < 8 tokens have no shingles and emit nothing in either
    engine; within-doc repetition (ndocs = 1) is excluded by design —
    that is ``doc_repetition``'s domain. Uses POSITIONAL (non-distinct)
    shingles — array index must be the token offset, which the
    dedup-family ``shingles()`` breaks by design."""
    n = 8
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    e = (
        tok.select(
            "doc_id",
            F.posexplode(pos_shingles(F.col("tok"), n)).alias("pos", "s"),
        )
        .select("doc_id", "pos", hash60(F.col("s")).alias("h"))
    )
    dfh = e.groupBy("h").agg(F.count_distinct("doc_id").alias("ndocs"))
    dup = e.join(dfh.filter(F.col("ndocs") >= 2), "h").select(
        "doc_id", "pos", "ndocs"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(n))
            .cast("long")
            .alias("span_len_tokens"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
            F.max("ndocs").alias("max_df"),
        )
        .select(
            "doc_id", "span_start", "span_len_tokens",
            "n_dup_shingles", "max_df",
        )
    )


def _sql_doc_dup_ngram_spans() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS tok FROM documents),
s AS (SELECT doc_id, {sql_pos_shingles('tok', 8)} AS sh FROM toks),
e AS (
  SELECT doc_id,
         unnest(list_transform(sh, x -> {sql_hash60('x')})) AS h,
         unnest(range(len(sh))) AS pos
  FROM s WHERE len(sh) > 0),
dfh AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM e GROUP BY 1),
dup AS (SELECT e.doc_id, e.pos, d.ndocs
        FROM e JOIN dfh d USING (h) WHERE d.ndocs >= 2),
runs AS (
  SELECT doc_id, pos, ndocs,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS grp
  FROM dup)
SELECT doc_id, min(pos) AS span_start,
       max(pos) - min(pos) + 8 AS span_len_tokens,
       count(*) AS n_dup_shingles, max(ndocs) AS max_df
FROM runs GROUP BY doc_id, grp"""


def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality DECISION per document — the
    curation step downstream of the measurement profile
    (doc_text_profile): five boolean rules (token-count window, mean
    token length window, punctuation ratio cap, stopword-presence
    floor, single-token dominance cap) and the conjunctive keep flag,
    each emitted so rejected docs are auditable by reason. One
    token-grain aggregate (map-side combined) joined back to the
    doc-grain text metrics — all ratios are divisions of identical
    integers, so the rule booleans are engine-exact with no grid
    involved."""
    docs = _docs_parallel(spark, sf_dir)
    tokc = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok_agg = tokc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tok"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.length("tok") * F.col("cnt")).alias("tok_chars"),
        F.sum(
            F.when(F.col("tok").isin(*EN_STOPWORDS), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("stop_hits"),
    )
    text_m = docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).alias(
            "n_punct"
        ),
    )
    j = tok_agg.join(text_m, "doc_id")
    mtl = F.col("tok_chars").cast("double") / F.col("n_tok")
    punct_ratio = F.col("n_punct").cast("double") / F.col("len_chars")
    stop_ratio = F.col("stop_hits").cast("double") / F.col("n_tok")
    top_share = F.col("max_cnt").cast("double") / F.col("n_tok")
    r_wc = (F.col("n_tok") >= QF_MIN_TOKENS) & (
        F.col("n_tok") <= QF_MAX_TOKENS
    )
    r_mtl = (mtl >= QF_MIN_MTL) & (mtl <= QF_MAX_MTL)
    r_punct = punct_ratio <= QF_MAX_PUNCT
    r_stop = stop_ratio >= QF_MIN_STOP
    r_dom = top_share <= QF_MAX_TOP_SHARE
    return j.select(
        "doc_id",
        "n_tok",
        r_wc.alias("rule_wordcount"),
        r_mtl.alias("rule_mean_tok_len"),
        r_punct.alias("rule_punct"),
        r_stop.alias("rule_stopwords"),
        r_dom.alias("rule_dominance"),
        (r_wc & r_mtl & r_punct & r_stop & r_dom).alias("keep"),
    )


def _sql_doc_quality_filter() -> str:
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH tokc AS (
  SELECT doc_id, tok, count(*) AS cnt FROM (
    SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents)
  GROUP BY 1, 2),
tok_agg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
         max(cnt) AS max_cnt,
         CAST(sum(length(tok) * cnt) AS BIGINT) AS tok_chars,
         CAST(sum(CASE WHEN tok IN ({stop_list}) THEN cnt ELSE 0 END)
              AS BIGINT) AS stop_hits
  FROM tokc GROUP BY 1),
text_m AS (
  SELECT doc_id, length(text) AS len_chars,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
  FROM documents),
j AS (SELECT * FROM tok_agg JOIN text_m USING (doc_id)),
rules AS (
  SELECT doc_id, n_tok,
         n_tok >= {QF_MIN_TOKENS} AND n_tok <= {QF_MAX_TOKENS}
           AS rule_wordcount,
         CAST(tok_chars AS DOUBLE) / n_tok >= {QF_MIN_MTL}
           AND CAST(tok_chars AS DOUBLE) / n_tok <= {QF_MAX_MTL}
           AS rule_mean_tok_len,
         CAST(n_punct AS DOUBLE) / len_chars <= {QF_MAX_PUNCT}
           AS rule_punct,
         CAST(stop_hits AS DOUBLE) / n_tok >= {QF_MIN_STOP}
           AS rule_stopwords,
         CAST(max_cnt AS DOUBLE) / n_tok <= {QF_MAX_TOP_SHARE}
           AS rule_dominance
  FROM j)
SELECT doc_id, n_tok, rule_wordcount, rule_mean_tok_len, rule_punct,
       rule_stopwords, rule_dominance,
       rule_wordcount AND rule_mean_tok_len AND rule_punct
         AND rule_stopwords AND rule_dominance AS keep
FROM rules"""



def q_doc_curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline's per-document verdict — the
    capstone that composes the dedup tiers (exact ▸ near), the
    Gopher-rules quality filter, and the embedding OOD screen into
    ONE keep/drop table with an auditable reason per drop, in fixed
    precedence: exact_dup > near_dup > quality_fail > ood_embedding >
    kept. This is the table a pretraining-data pipeline actually
    ships: every upstream signal stays independently queryable (each
    is its own oracle-checked query), and this join-of-verdicts costs
    three doc-grain hash joins on top of them. Embeddings pair 1:1
    with documents by id in the synthetic corpus (vec_id = doc_id) —
    the production analog is the doc's stored embedding column."""
    dd = q_doc_dedup_decisions(spark, sf_dir).select(
        "doc_id", F.col("reason").alias("dd_reason")
    )
    qf = q_doc_quality_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    od = q_emb_ood_score(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "is_ood"
    )
    j = dd.join(qf, "doc_id", "left").join(od, "doc_id", "left")
    reason = (
        F.when(F.col("dd_reason") != "kept", F.col("dd_reason"))
        .when(~F.coalesce(F.col("q_keep"), F.lit(True)), "quality_fail")
        .when(F.coalesce(F.col("is_ood"), F.lit(False)), "ood_embedding")
        .otherwise("kept")
    )
    return j.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "kept").cast("int").alias("is_kept"),
    )


def _sql_doc_curation_decisions() -> str:
    return f"""
WITH dd AS (SELECT doc_id, reason AS dd_reason FROM (
  {_sql_doc_dedup_decisions()})),
qf AS (SELECT doc_id, keep AS q_keep FROM (
  {_sql_doc_quality_filter()})),
od AS (SELECT vec_id AS doc_id, is_ood FROM ({_sql_emb_ood()})),
j AS (
  SELECT dd.doc_id, dd.dd_reason, qf.q_keep, od.is_ood
  FROM dd LEFT JOIN qf USING (doc_id) LEFT JOIN od USING (doc_id)),
verdict AS (
  SELECT doc_id,
         CASE WHEN dd_reason <> 'kept' THEN dd_reason
              WHEN NOT coalesce(q_keep, TRUE) THEN 'quality_fail'
              WHEN coalesce(is_ood, FALSE) THEN 'ood_embedding'
              ELSE 'kept' END AS reason
  FROM j)
SELECT doc_id, reason,
       CAST(reason = 'kept' AS INT) AS is_kept
FROM verdict"""


def q_doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint near-dup pairs: content-defined
    min-hash-per-window selection over char 8-grams guarantees any
    shared run >= w+k-1 chars yields a shared fingerprint — the
    positional-match complement to MinHash's whole-document sample.
    Pairs come from the df-capped inverted index (work ∝ Σ df², never
    n²); score = shared/(|A|+|B|-shared), an exact integer quotient."""
    from ..operators.dedup import winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_pairs(docs, threshold=WINNOW_TAU).select(
        "id_i", "id_j", "shared", "winnow_jac"
    )


SQL_DOC_WINNOW = _sql_winnow_pairs()


def q_doc_bigram_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity with a PROPER train/eval
    split (train = doc_id % 5 != 0, eval = the rest) — the held-out
    fluency score the unigram filter can't give (it ignores word
    order): P(b|a) = (c(a,b)+k)/(c(a·)+k·V) with add-k smoothing
    k=0.5, V = train unigram vocabulary, unseen contexts fall back
    to the uniform k/(kV) floor. Per eval doc: ppl =
    exp(Σ −ln P / n). Bigrams come from an in-row transform+explode
    (NO per-doc window exchange — the pair stream is scan-shaped);
    eval bigrams pre-aggregate to (doc, a, b, count) before joining
    the count tables, so the join input is type-sized, not
    token-sized. Determinism: each surprisal snaps to the 1e-9 grid,
    per-doc sums ride exact DECIMAL — summation order cannot perturb
    ppl (r6)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 5 == 0).alias("is_eval"),
        tokens(F.col("text")).alias("toks"),
    )
    # size>=2 filter BEFORE sequence(): Spark's sequence(1, 0) is the
    # descending [1, 0], not empty
    big = (
        base.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "is_eval",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "is_eval", "p.a", "p.b")
    )
    train_big = big.filter(~F.col("is_eval"))
    c2 = train_big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train_big.groupBy("a").agg(F.count(F.lit(1)).alias("c1"))
    vsize = (
        base.filter(~F.col("is_eval"))
        .select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    ev = (
        big.filter(F.col("is_eval"))
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    k = F.lit(BIGRAM_LM_K)
    joined = (
        ev.join(c2, ["a", "b"], "left")
        .join(c1, ["a"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "doc_id",
            "m",
            # v >= 1 guard: an all-eval corpus (empty train split)
            # would put ln(x/0)=Inf through floor, where Spark's
            # DECIMAL cast nulls and DuckDB's errors — NULL the
            # surprisal identically instead
            F.when(
                F.col("v") >= 1,
                F.floor(
                    -F.log(
                        (F.coalesce(F.col("c2"), F.lit(0)) + k)
                        / (
                            F.coalesce(F.col("c1"), F.lit(0))
                            + k * F.col("v")
                        )
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("decimal(38,0)"),
            ).alias("sq"),
        )
    )
    agg = joined.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("sq") * F.col("m")).alias("sumq"),
    )
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        _rne(
            F.exp(
                F.col("sumq").cast("double")
                / F.col("n_bigrams")
                / F.lit(1e9)
            ),
            "ppl",
            6,
        ),
    )


def _sql_doc_bigram_lm_ppl() -> str:
    k = BIGRAM_LM_K
    return f"""
WITH base AS (
  SELECT doc_id, doc_id % 5 = 0 AS is_eval,
         {sql_tokens('text')} AS toks
  FROM documents),
big AS (
  SELECT doc_id, is_eval,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i])) AS a,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i + 1])) AS b
  FROM base),
c2 AS (
  SELECT a, b, count(*) AS c2 FROM big WHERE NOT is_eval GROUP BY 1, 2),
c1 AS (
  SELECT a, count(*) AS c1 FROM big WHERE NOT is_eval GROUP BY 1),
vsize AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(toks) AS tok FROM base WHERE NOT is_eval)),
ev AS (
  SELECT doc_id, a, b, count(*) AS m
  FROM big WHERE is_eval GROUP BY 1, 2, 3),
joined AS (
  SELECT doc_id, m,
         CASE WHEN v >= 1 THEN
           floor(-ln((coalesce(c2, 0) + {k})
                     / (coalesce(c1, 0) + {k} * v))
                 * 1000000000.0 + 0.5)::DECIMAL(38,0)
         END AS sq
  FROM ev
  LEFT JOIN c2 USING (a, b)
  LEFT JOIN c1 USING (a)
  CROSS JOIN vsize),
agg AS (
  SELECT doc_id, sum(m) AS n_bigrams, sum(sq * m) AS sumq
  FROM joined GROUP BY 1)
SELECT doc_id, n_bigrams::BIGINT AS n_bigrams,
       {_sql_rne('exp(sumq::DOUBLE / n_bigrams / 1000000000.0)', 'ppl', 6)}
FROM agg"""


def q_doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction at corpus level (Rose et al. 2010):
    candidate phrases are maximal stopword-free token runs (capped at
    3 tokens for boundedness), word score = degree/frequency over the
    candidate set (degree counts phrase-length co-occurrence,
    frequency counts occurrences), phrase score = Σ member word
    scores with multiplicity (computed once per DISTINCT phrase text
    — instances share the score exactly); top-25 distinct phrases by
    the exact-DECIMAL score. Run extraction is the established
    pos − row_number() run-merge device (one doc-keyed window); word
    stats are one map-side groupBy; per-word scores snap to the 1e-9
    grid before the exact phrase sum, so the (score desc, phrase asc)
    ranking is order-free."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(~F.col("tok").isin(*EN_STOPWORDS))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = tok.withColumn(
        "run_id", F.col("pos") - F.row_number().over(wd)
    )
    ph = (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen") <= RAKE_MAX_PHRASE)
    )
    ph = ph.localCheckpoint(eager=True)  # feeds word stats + occ + rejoin
    words = ph.select(
        F.explode(F.split(F.col("phrase"), " ")).alias("w"), "plen"
    )
    stats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    wscore = stats.select(
        "w",
        F.floor(
            F.col("deg").cast("double") / F.col("freq") * 1e9 + F.lit(0.5)
        )
        .cast("decimal(38,0)")
        .alias("wq"),
    )
    pw = (
        ph.select("phrase")
        .distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    )
    pscore = pw.join(wscore, "w").groupBy("phrase").agg(
        F.sum("wq").alias("sq")
    )
    occ = ph.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    # global top-k via orderBy+limit → TakeOrderedAndProject (see
    # q_graph_adamic_adar); the rank window then runs over 25 rows
    top = (
        pscore.join(occ, "phrase")
        .orderBy(F.col("sq").desc(), F.col("phrase").asc())
        .limit(RAKE_TOPK)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("sq").desc(), F.col("phrase").asc())
            ),
        )
    )
    return top.select(
        "rank",
        "phrase",
        F.col("n_occ").cast("long").alias("n_occ"),
        _rne(F.col("sq").cast("double") / F.lit(1e9), "score", 8),
    )


def _sql_doc_rake_keyphrases() -> str:
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH tok AS (
  SELECT doc_id, pos, tok FROM (
    SELECT doc_id,
           unnest(range(0, len(toks))) AS pos,
           unnest(toks) AS tok
    FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents))
  WHERE tok NOT IN ({stop_list})),
runs AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS run_id
  FROM tok),
ph AS (
  SELECT doc_id, run_id,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM runs GROUP BY 1, 2 HAVING count(*) <= {RAKE_MAX_PHRASE}),
words AS (
  SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM ph),
stats AS (
  SELECT w, count(*) AS freq, sum(plen) AS deg FROM words GROUP BY 1),
wscore AS (
  SELECT w, floor(deg::DOUBLE / freq * 1000000000.0 + 0.5)
               ::DECIMAL(38,0) AS wq
  FROM stats),
pw AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w
  FROM (SELECT DISTINCT phrase FROM ph)),
pscore AS (
  SELECT phrase, sum(wq) AS sq
  FROM pw JOIN wscore USING (w) GROUP BY 1),
occ AS (SELECT phrase, count(*) AS n_occ FROM ph GROUP BY 1),
top AS (
  SELECT row_number() OVER (ORDER BY sq DESC, phrase ASC) AS rank,
         phrase, n_occ, sq
  FROM pscore JOIN occ USING (phrase))
SELECT rank, phrase, n_occ::BIGINT AS n_occ,
       {_sql_rne('sq::DOUBLE / 1000000000.0', 'score', 8)}
FROM top WHERE rank <= {RAKE_TOPK}"""


def q_doc_ctfidf_class_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF (the BERTopic c-TF-IDF labeling device —
    Grootendorst 2022): classes are (lang, source) strata, term score
    within a class = (tf_{t,c} / total_c) · ln(1 + A / f_t) with A =
    average class token mass and f_t = corpus frequency — the terms
    that DESCRIBE a cluster rather than merely occur in it. Top-5
    terms per class ranked on the 1e-9-snapped score (exact tie-break
    term asc). One token aggregate keyed (class, term) + one
    broadcast of the term totals — scan-shaped, no per-doc state."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("cls"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    tfc = tok.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("tf"))
    totc = tfc.groupBy("cls").agg(F.sum("tf").alias("total_c"))
    ft = tfc.groupBy("tok").agg(F.sum("tf").alias("f_t"))
    av = totc.agg(
        (
            F.sum("total_c").cast("double") / F.count(F.lit(1))
        ).alias("a")
    )
    scored = (
        tfc.join(totc, "cls")
        .join(ft, "tok")
        .crossJoin(F.broadcast(av))
        .select(
            "cls",
            "tok",
            "tf",
            F.floor(
                (F.col("tf").cast("double") / F.col("total_c"))
                * F.log(F.lit(1.0) + F.col("a") / F.col("f_t"))
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("decimal(38,0)")
            .alias("q"),
        )
    )
    w = Window.partitionBy("cls").orderBy(
        F.col("q").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CTFIDF_TOPK)
        .select(
            "cls",
            "rank",
            F.col("tok").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            _rne(F.col("q").cast("double") / F.lit(1e9), "score", 8),
        )
    )


def _sql_doc_ctfidf_class_terms() -> str:
    return f"""
WITH tok AS (
  SELECT lang || ':' || source AS cls,
         unnest({sql_tokens('text')}) AS tok
  FROM documents),
tfc AS (SELECT cls, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
totc AS (SELECT cls, sum(tf) AS total_c FROM tfc GROUP BY 1),
ft AS (SELECT tok, sum(tf) AS f_t FROM tfc GROUP BY 1),
av AS (SELECT sum(total_c)::DOUBLE / count(*) AS a FROM totc),
scored AS (
  SELECT cls, tok, tf,
         floor((tf::DOUBLE / total_c) * ln(1.0 + a / f_t)
               * 1000000000.0 + 0.5)::DECIMAL(38,0) AS q
  FROM tfc JOIN totc USING (cls) JOIN ft USING (tok) CROSS JOIN av),
ranked AS (
  SELECT cls, tok, tf, q,
         row_number() OVER (PARTITION BY cls
                            ORDER BY q DESC, tok ASC) AS rank
  FROM scored)
SELECT cls, rank, tok AS term, tf::BIGINT AS tf,
       {_sql_rne('q::DOUBLE / 1000000000.0', 'score', 8)}
FROM ranked WHERE rank <= {CTFIDF_TOPK}"""


def q_doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity card — the corpus-health metrics a
    curation pipeline reads next to the Gopher rules: type/token ratio,
    hapax fraction (singleton vocabulary share — high = rich/noisy,
    low = templated), and Herdan's C (log-vocab growth exponent, the
    size-robust TTR). One explode + one (source, term) count + one
    map-side rollup; every input to the three ratios is an exact
    integer, each ratio/log is one identical IEEE expression in both
    engines. At scale this is the same shuffle shape as doc_top_terms:
    the (source, term) frame is vocabulary-sized, not token-sized,
    after the map-side combine."""
    docs = _docs_parallel(spark, sf_dir)
    tf = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = tf.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    nt = F.col("n_tokens").cast("double")
    nv = F.col("n_types").cast("double")
    return agg.filter(F.col("n_tokens") >= 2).select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        _rne(nv / nt, "ttr", 8),
        _rne(F.col("n_hapax").cast("double") / nv, "hapax_frac", 8),
        _rne(F.log(nv) / F.log(nt), "herdan_c", 8),
    )


def _sql_doc_lexical_diversity() -> str:
    return f"""
WITH t AS (
  SELECT source, unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY 1, 2),
agg AS (
  SELECT source, sum(cnt)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_types,
         sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
  FROM tf GROUP BY 1)
SELECT source, n_tokens, n_types, n_hapax,
       {_sql_rne('n_types::DOUBLE / n_tokens::DOUBLE', 'ttr', 8)},
       {_sql_rne('n_hapax::DOUBLE / n_types::DOUBLE', 'hapax_frac', 8)},
       {_sql_rne('ln(n_types::DOUBLE) / ln(n_tokens::DOUBLE)',
                 'herdan_c', 8)}
FROM agg WHERE n_tokens >= 2"""


def q_doc_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's unigram
    distribution from the corpus-wide distribution — the standard
    domain-shift card a curation pipeline reads next to DSIR weights
    (JSD is DSIR's importance-weight denominator geometry; symmetric,
    bounded by ln 2). Per (source, term) and global term counts are
    exact integers off ONE tokenize+explode pass (the
    doc_lexical_diversity shuffle shape — vocabulary-sized after the
    map-side combine, never token-sized); each union-vocab term
    contributes 0.5·p·ln(p/m) + 0.5·q·ln(q/m) (m the mixture),
    snapped to the 1e-12 grid and summed in exact DECIMAL. jsd_norm
    (÷ln 2) lands in [0,1]. At scale: one vocab-keyed join of the
    per-source frame against the broadcast-able global frame."""
    docs = _docs_parallel(spark, sf_dir)
    tf = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gtf = tf.groupBy("term").agg(F.sum("cnt").alias("gcnt"))
    n_s = tf.groupBy("source").agg(F.sum("cnt").alias("ns"))
    n_g = gtf.agg(F.sum("gcnt").alias("ng"))
    # union vocab per source = global vocab (q > 0 everywhere; p = 0
    # off-source terms contribute only the q-side term)
    j = (
        n_s.join(gtf, how="cross")
        .join(
            tf.withColumnRenamed("cnt", "scnt"), ["source", "term"], "left"
        )
        .crossJoin(F.broadcast(n_g))
    )
    p = F.coalesce(F.col("scnt"), F.lit(0)).cast("double") / F.col(
        "ns"
    ).cast("double")
    q = F.col("gcnt").cast("double") / F.col("ng").cast("double")
    m = (p + q) / F.lit(2.0)
    contrib = (
        F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.lit(0.5) * q * F.log(q / m)
    )
    term = (
        F.floor(contrib * 1e12 + F.lit(0.5)) / 1e12
    ).cast("decimal(30,12)")
    agg = j.groupBy("source", "ns").agg(F.sum(term).alias("sj"))
    return agg.select(
        "source",
        F.col("ns").cast("long").alias("n_tokens"),
        _rne(F.col("sj").cast("double"), "jsd", 8),
        _rne(
            F.col("sj").cast("double") / F.log(F.lit(2.0)),
            "jsd_norm",
            8,
        ),
    )


def _sql_doc_js_divergence() -> str:
    return f"""
WITH t AS (
  SELECT source, unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY 1, 2),
gtf AS (SELECT term, sum(cnt) AS gcnt FROM tf GROUP BY 1),
ns AS (SELECT source, sum(cnt) AS ns FROM tf GROUP BY 1),
ng AS (SELECT sum(gcnt) AS ng FROM gtf),
j AS (
  SELECT s.source, s.ns, g.term, g.gcnt, ng.ng,
         coalesce(f.cnt, 0) AS scnt
  FROM ns s CROSS JOIN gtf g CROSS JOIN ng
  LEFT JOIN tf f ON f.source = s.source AND f.term = g.term),
terms AS (
  SELECT source, ns,
         CAST(floor((
           CASE WHEN scnt > 0 THEN
             0.5 * (scnt::DOUBLE / ns::DOUBLE)
             * ln((scnt::DOUBLE / ns::DOUBLE)
                  / ((scnt::DOUBLE / ns::DOUBLE
                      + gcnt::DOUBLE / ng::DOUBLE) / 2.0))
           ELSE 0.0 END
           + 0.5 * (gcnt::DOUBLE / ng::DOUBLE)
           * ln((gcnt::DOUBLE / ng::DOUBLE)
                / ((scnt::DOUBLE / ns::DOUBLE
                    + gcnt::DOUBLE / ng::DOUBLE) / 2.0))
         ) * 1000000000000.0 + 0.5)
              / 1000000000000.0 AS DECIMAL(30,12)) AS term
  FROM j)
SELECT source, ns::BIGINT AS n_tokens,
       {_sql_rne('sum(term)::DOUBLE', 'jsd', 8)},
       {_sql_rne('sum(term)::DOUBLE / ln(2.0)', 'jsd_norm', 8)}
FROM terms GROUP BY source, ns"""


def q_doc_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit over the corpus in doc_id order — V(N) ≈ k·N^b,
    the vocabulary-growth exponent that predicts how big a tokenizer
    vocabulary must grow with corpus size (the planning twin of
    doc_zipf_fit). Per doc: token count and NEW-type count (a term
    counts at its min-doc_id first occurrence); the cumulative (N, V)
    checkpoints come from the TWO-PHASE bucketed prefix sum
    (operators/twophase.py prefix_agg, log2(doc_id) buckets) — no
    data-sized single-task global window (the doc-count frame grows
    with the corpus). OLS of ln V on ln N over checkpoints with
    V ≥ 1: each ln snaps to the integer 1e-9 grid, the normal
    equations ride exact DECIMAL, b is the scale-free slope and
    k = exp of the rescaled intercept."""
    from ..operators.twophase import log2_bucket, prefix_agg

    docs = _docs_parallel(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    first = tok.groupBy("term").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    base = per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
    )
    b1 = prefix_agg(
        base,
        F.col("n_tok"),
        log2_bucket(F.col("doc_id")),
        [F.col("doc_id").asc()],
        agg="sum",
        strict=False,
        out_col="N",
    )
    b2 = prefix_agg(
        b1,
        F.col("n_new"),
        log2_bucket(F.col("doc_id")),
        [F.col("doc_id").asc()],
        agg="sum",
        strict=False,
        out_col="V",
    )
    pts = b2.filter((F.col("N") >= 1) & (F.col("V") >= 1)).select(
        F.floor(F.log(F.col("N").cast("double")) * 1e9 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("x"),
        F.floor(F.log(F.col("V").cast("double")) * 1e9 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 3)
    nd = F.col("n").cast("decimal(38,0)")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy") * F.col("sy")
    b = F.when(
        varx_n.cast("double") > 0,
        cov_n.cast("double") / varx_n.cast("double"),
    )
    ln_k = (
        F.col("sy").cast("double") / F.col("n").cast("double")
        - b * (F.col("sx").cast("double") / F.col("n").cast("double"))
    ) / F.lit(1e9)
    r2 = F.when(
        (varx_n.cast("double") > 0) & (vary_n.cast("double") > 0),
        (cov_n.cast("double") * cov_n.cast("double"))
        / (varx_n.cast("double") * vary_n.cast("double")),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        _rne(b, "heaps_b", 8),
        _rne(F.exp(ln_k), "heaps_k", 8),
        _rne(r2, "r2", 8),
    )


def _sql_doc_heaps_law() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
first_ AS (
  SELECT term, min(doc_id) AS doc_id FROM tok GROUP BY 1),
new_per_doc AS (
  SELECT doc_id, count(*) AS n_new FROM first_ GROUP BY 1),
base AS (
  SELECT p.doc_id, p.n_tok, coalesce(np.n_new, 0) AS n_new
  FROM per_doc p LEFT JOIN new_per_doc np ON p.doc_id = np.doc_id),
cum AS (
  SELECT doc_id,
         sum(n_tok) OVER w AS N, sum(n_new) OVER w AS V
  FROM base
  WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)),
pts AS (
  SELECT floor(ln(N::DOUBLE) * 1000000000.0 + 0.5)::DECIMAL(38,0) AS x,
         floor(ln(V::DOUBLE) * 1000000000.0 + 0.5)::DECIMAL(38,0) AS y
  FROM cum WHERE N >= 1 AND V >= 1),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pts HAVING count(*) >= 3),
fit AS (
  SELECT n,
         (n::DECIMAL(38,0) * sxy - sx * sy)::DOUBLE AS cov_n,
         (n::DECIMAL(38,0) * sxx - sx * sx)::DOUBLE AS varx_n,
         (n::DECIMAL(38,0) * syy - sy * sy)::DOUBLE AS vary_n,
         sx::DOUBLE AS sxd, sy::DOUBLE AS syd
  FROM agg),
st AS (
  SELECT n,
         CASE WHEN varx_n > 0 THEN cov_n / varx_n END AS b,
         cov_n, varx_n, vary_n, sxd, syd
  FROM fit)
SELECT n::BIGINT AS n_docs,
       {_sql_rne('b', 'heaps_b', 8)},
       {_sql_rne(
           'exp((syd / n::DOUBLE - b * (sxd / n::DOUBLE)) '
           '/ 1000000000.0)',
           'heaps_k', 8)},
       {_sql_rne(
           'CASE WHEN varx_n > 0 AND vary_n > 0 '
           'THEN (cov_n * cov_n) / (varx_n * vary_n) END',
           'r2', 8)}
FROM st"""


def q_doc_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget coverage curve — for vocabulary sizes
    K ∈ {100, 1k, 10k}: what fraction of all corpus tokens the top-K
    most frequent terms cover (the number that decides a vocab/BPE
    budget, read next to doc_heaps_law's growth exponent and
    doc_zipf_fit's slope). One tokenize+count pass; each K's top set
    is a TakeOrderedAndProject over the vocabulary-sized frame
    ((cnt DESC, term ASC) total order — deterministic under count
    ties); covered/total are exact integers, coverage is ONE
    division. Output is |Ks| rows at any corpus scale."""
    docs = _docs_parallel(spark, sf_dir)
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = tf.agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    )
    out = None
    for k in VOCAB_COVERAGE_KS:
        top = tf.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(
            k
        )
        cov = top.agg(F.sum("cnt").alias("covered"))
        row = (
            tot.crossJoin(cov)
            .select(
                F.lit(k).cast("long").alias("vocab_k"),
                F.col("n_types").cast("long").alias("n_types"),
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.coalesce(F.col("covered"), F.lit(0))
                .cast("long")
                .alias("covered_tokens"),
                _rne(
                    F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                    / F.col("n_tokens").cast("double"),
                    "coverage",
                    8,
                ),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


def _sql_doc_vocab_coverage() -> str:
    blocks = []
    for k in VOCAB_COVERAGE_KS:
        blocks.append(f"""
SELECT {k}::BIGINT AS vocab_k,
       (SELECT count(*) FROM tf)::BIGINT AS n_types,
       (SELECT sum(cnt) FROM tf)::BIGINT AS n_tokens,
       coalesce((SELECT sum(cnt) FROM (
          SELECT cnt FROM tf
          ORDER BY cnt DESC, term ASC LIMIT {k})), 0)::BIGINT
         AS covered_tokens""")
    sels = " UNION ALL ".join(blocks)
    return f"""
WITH t AS (
  SELECT unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
curve AS ({sels})
SELECT vocab_k, n_types, n_tokens, covered_tokens,
       {_sql_rne('covered_tokens::DOUBLE / n_tokens::DOUBLE',
                 'coverage', 8)}
FROM curve"""


def q_doc_ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov length-drift audit per source: the max CDF
    gap between a source's doc-length distribution and the REST of
    the corpus — the distribution-shift screen a curation pipeline
    runs per ingest feed (a feed whose length profile walks away from
    the corpus needs its quality thresholds re-tuned; the PSI/JS
    cards are binned, KS is bin-free). The evaluation grid is
    (source × distinct n_chars) — bounded by the LENGTH DOMAIN, not
    the corpus (the log2-bucket argument, uncoarsened) — both CDFs
    ride cumulative integer counts over that grid, and the KS gap
    compares cross-multiplied integers |cum_s·n_rest − cum_rest·n_s|
    EXACTLY (no float CDFs); the statistic's single division is the
    only float op. The argmax length reports where the distributions
    split (ties → smallest length, deterministically)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.col("n_chars").cast("long").alias("len"))
        .filter(F.col("source").isNotNull() & F.col("len").isNotNull())
    )
    per = docs.groupBy("source", "len").agg(
        F.count(F.lit(1)).alias("c")
    )
    lens = docs.groupBy("len").agg(F.count(F.lit(1)).alias("gc"))
    srcs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    ntot = docs.agg(F.count(F.lit(1)).alias("nt"))
    grid = (
        srcs.crossJoin(F.broadcast(lens))
        .join(per, ["source", "len"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(F.broadcast(ntot))
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = grid.withColumn("cs", F.sum("c").over(wc)).withColumn(
        "cg", F.sum("gc").over(wc)
    )
    nr = F.col("nt") - F.col("ns")
    diffnum = F.abs(
        F.col("cs").cast("decimal(38,0)") * nr.cast("decimal(38,0)")
        - (F.col("cg") - F.col("cs")).cast("decimal(38,0)")
        * F.col("ns").cast("decimal(38,0)")
    )
    g = g.withColumn("dn", diffnum).filter(nr > 0)
    mx = g.groupBy("source", "ns", "nt").agg(F.max("dn").alias("mxd"))
    loc = (
        g.join(
            F.broadcast(mx.select("source", "mxd")),
            ["source"],
        )
        .filter(F.col("dn") == F.col("mxd"))
        .groupBy("source")
        .agg(F.min("len").alias("ks_len"))
    )
    out = mx.join(F.broadcast(loc), "source")
    ks = F.col("mxd").cast("double") / (
        F.col("ns").cast("double")
        * (F.col("nt") - F.col("ns")).cast("double")
    )
    return out.select(
        "source",
        F.col("ns").cast("long").alias("n_docs"),
        _rne(ks, "ks", 8),
        F.col("ks_len").cast("long").alias("ks_len"),
    )


def _sql_doc_ks_length_drift() -> str:
    return """
WITH d AS (
  SELECT source, n_chars::BIGINT AS len FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
per AS (SELECT source, len, count(*) AS c FROM d GROUP BY 1, 2),
lens AS (SELECT len, count(*) AS gc FROM d GROUP BY 1),
srcs AS (SELECT source, count(*) AS ns FROM d GROUP BY 1),
nt AS (SELECT count(*) AS nt FROM d),
grid AS (
  SELECT s.source, l.len, s.ns, nt.nt, l.gc,
         coalesce(p.c, 0) AS c
  FROM srcs s CROSS JOIN lens l CROSS JOIN nt
  LEFT JOIN per p ON p.source = s.source AND p.len = l.len),
g AS (
  SELECT source, len, ns, nt,
         sum(c) OVER (PARTITION BY source ORDER BY len
           ROWS UNBOUNDED PRECEDING) AS cs,
         sum(gc) OVER (PARTITION BY source ORDER BY len
           ROWS UNBOUNDED PRECEDING) AS cg
  FROM grid),
dn AS (
  SELECT source, len, ns, nt,
         abs(cs::DECIMAL(38,0) * (nt - ns)::DECIMAL(38,0)
             - (cg - cs)::DECIMAL(38,0) * ns::DECIMAL(38,0)) AS dn
  FROM g WHERE nt - ns > 0),
mx AS (SELECT source, ns, nt, max(dn) AS mxd FROM dn GROUP BY 1, 2, 3),
loc AS (
  SELECT dn.source, min(dn.len) AS ks_len
  FROM dn JOIN mx ON dn.source = mx.source AND dn.dn = mx.mxd
  GROUP BY 1)
SELECT mx.source, ns::BIGINT AS n_docs,
       CASE WHEN abs(mxd::DOUBLE / (ns::DOUBLE * (nt - ns)::DOUBLE))
              < 1000000000000.0
            THEN floor(mxd::DOUBLE / (ns::DOUBLE * (nt - ns)::DOUBLE)
              * 100000000.0 + 0.5) / 100000000.0 + 0.0
            ELSE mxd::DOUBLE / (ns::DOUBLE * (nt - ns)::DOUBLE) + 0.0
       END AS ks,
       ks_len::BIGINT AS ks_len
FROM mx JOIN loc ON mx.source = loc.source"""


def q_doc_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness card — variance-to-mean ratio (index of
    dispersion) of per-doc counts for the top-25 corpus terms: a
    Poisson-scattered term has VMR ≈ 1, a topical/bursty term
    (Church–Gale) concentrates in few docs with VMR ≫ 1 — the signal
    that separates content words from function words ABOVE the df
    cut, complementing zipf/heaps (which see only totals). All
    moments are exact integers per (term, doc) — zero-docs enter the
    mean through N, not through rows — and the top-k cut is
    TakeOrderedAndProject on the term-aggregate frame BEFORE any
    float; VMR / mean-tf-when-present are final ops. One explode +
    two map-side-combined aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    ntot = docs.agg(F.count(F.lit(1)).alias("nt"))
    td = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = td.groupBy("term").agg(
        F.sum("c").alias("tf"),
        F.count(F.lit(1)).alias("df"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("sc2"),
    )
    top = per.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(
        BURST_TOP_K
    )
    j = top.crossJoin(F.broadcast(ntot))
    tf_ = F.col("tf").cast("double")
    nt_ = F.col("nt").cast("double")
    sc2_ = F.col("sc2").cast("double")
    mean = tf_ / nt_
    var = sc2_ / nt_ - mean * mean
    return j.select(
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        _rne(var / mean, "vmr", 8),
        _rne(tf_ / F.col("df").cast("double"), "tf_when_present", 8),
    )


def _sql_doc_term_burstiness() -> str:
    return f"""
WITH nt AS (SELECT count(*) AS nt FROM documents),
td AS (
  SELECT term, doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS term
        FROM documents)
  GROUP BY 1, 2),
per AS (
  SELECT term, sum(c) AS tf, count(*) AS df,
         sum(c::DECIMAL(38,0) * c::DECIMAL(38,0)) AS sc2
  FROM td GROUP BY 1),
top AS (
  SELECT * FROM per ORDER BY tf DESC, term ASC LIMIT {BURST_TOP_K})
SELECT term, tf::BIGINT AS tf, df::BIGINT AS df,
       {_sql_rne(
           '(sc2::DOUBLE / nt::DOUBLE - (tf::DOUBLE / nt::DOUBLE)'
           ' * (tf::DOUBLE / nt::DOUBLE))'
           ' / (tf::DOUBLE / nt::DOUBLE)', 'vmr', 8)},
       {_sql_rne('tf::DOUBLE / df::DOUBLE', 'tf_when_present', 8)}
FROM top CROSS JOIN nt"""


def q_doc_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini–Simpson lexical concentration per source — the
    probability two random tokens differ (1 − Σc(c−1)/(T(T−1)),
    unbiased form) plus the effective vocabulary T²/Σc² (inverse
    Simpson): the repetition-collapse screen that catches template/
    boilerplate feeds which pass mean-based quality checks
    (complements doc_lexical_diversity's TTR — TTR is length-biased,
    Simpson is not). ALL moments are exact integers per (source,
    term) with map-side combine; two final float divisions. One
    explode + two aggregates."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    tc = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("decimal(38,0)")
    agg = tc.groupBy("source").agg(
        F.sum("c").alias("t"),
        F.count(F.lit(1)).alias("v"),
        F.sum(cd * (cd - F.lit(1).cast("decimal(38,0)"))).alias("sp"),
        F.sum(cd * cd).alias("sc2"),
    ).filter(F.col("t") >= 2)
    t_ = F.col("t").cast("double")
    gini = F.lit(1.0) - F.col("sp").cast("double") / (
        t_ * (t_ - F.lit(1.0))
    )
    eff = t_ * t_ / F.col("sc2").cast("double")
    return agg.select(
        "source",
        F.col("t").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab"),
        _rne(gini, "gini_simpson", 10),
        _rne(eff, "eff_vocab", 6),
    )


def _sql_doc_simpson_diversity() -> str:
    return f"""
WITH tc AS (
  SELECT source, term, count(*) AS c
  FROM (SELECT source, unnest({sql_tokens('text')}) AS term
        FROM documents WHERE source IS NOT NULL)
  GROUP BY 1, 2),
agg AS (
  SELECT source, sum(c) AS t, count(*) AS v,
         sum(c::DECIMAL(38,0) * (c::DECIMAL(38,0)
             - 1::DECIMAL(38,0))) AS sp,
         sum(c::DECIMAL(38,0) * c::DECIMAL(38,0)) AS sc2
  FROM tc GROUP BY 1 HAVING sum(c) >= 2)
SELECT source, t::BIGINT AS n_tokens, v::BIGINT AS vocab,
       {_sql_rne(
           '1.0 - sp::DOUBLE / (t::DOUBLE * (t::DOUBLE - 1.0))',
           'gini_simpson', 10)},
       {_sql_rne('t::DOUBLE * t::DOUBLE / sc2::DOUBLE',
                 'eff_vocab', 6)}
FROM agg"""


def q_doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy per source over a FIXED 37-char
    domain (a–z, 0–9, space; lowercased) — the encoding/garbage
    screen below token level: mojibake, base64 blobs and
    hex-dump-like feeds shift the char distribution long before
    token-level quality scores move (reads next to doc_text_profile /
    doc_token_entropy, which both tokenize first and so can't see
    it). Counts come from the replace-length trick (len(text) −
    len(replace(text, c))) — 37 expressions in ONE scan-shaped
    projection, NO per-character explode (a char-explode multiplies
    the scan by avg doc length); per-source sums are exact integers
    and the entropy terms are an identical generated expression chain
    in both engines."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    lowered = F.lower(F.col("text"))
    cnts = [
        (
            F.length(lowered)
            - F.length(F.replace(lowered, F.lit(c)))
        ).alias(f"c{i}")
        for i, c in enumerate(CHAR_DOMAIN)
    ]
    per = docs.select("source", *cnts)
    agg = per.groupBy("source").agg(
        *[F.sum(f"c{i}").alias(f"c{i}") for i in range(len(CHAR_DOMAIN))]
    )
    total = None
    for i in range(len(CHAR_DOMAIN)):
        total = F.col(f"c{i}") if total is None else total + F.col(f"c{i}")
    agg = agg.withColumn("nt", total).filter(F.col("nt") > 0)
    n_ = F.col("nt").cast("double")
    ent = None
    for i in range(len(CHAR_DOMAIN)):
        p = F.col(f"c{i}").cast("double") / n_
        term = F.when(F.col(f"c{i}") > 0, -p * F.log(p)).otherwise(
            F.lit(0.0)
        )
        ent = term if ent is None else ent + term
    return agg.select(
        "source",
        F.col("nt").cast("long").alias("n_chars"),
        _rne(ent, "char_entropy", 8),
        _rne(ent / F.lit(math.log(len(CHAR_DOMAIN))), "entropy_norm", 8),
    )


def _sql_doc_char_entropy() -> str:
    cnts = ", ".join(
        "sum(length(lt) - length(replace(lt, '" + c + "', '')))"
        f" AS c{i}"
        for i, c in enumerate(CHAR_DOMAIN)
        if c != "'"
    )
    tot = " + ".join(f"c{i}" for i in range(len(CHAR_DOMAIN)))
    ent = " + ".join(
        f"CASE WHEN c{i} > 0 THEN -(c{i}::DOUBLE / nt::DOUBLE)"
        f" * ln(c{i}::DOUBLE / nt::DOUBLE) ELSE 0.0 END"
        for i in range(len(CHAR_DOMAIN))
    )
    return f"""
WITH lowered AS (
  SELECT source, lower(text) AS lt FROM documents
  WHERE source IS NOT NULL),
agg AS (
  SELECT source, {cnts}
  FROM lowered GROUP BY 1),
tot AS (
  SELECT *, {tot} AS nt FROM agg)
SELECT source, nt::BIGINT AS n_chars,
       {_sql_rne(f'({ent})', 'char_entropy', 8)},
       {_sql_rne(f'({ent}) / {math.log(len(CHAR_DOMAIN))!r}',
                 'entropy_norm', 8)}
FROM tot WHERE nt > 0"""


def q_doc_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix screen — document groups sharing an
    identical lowercased 64-char prefix: the template/header
    detector that catches scraped-site chrome, license headers and
    form letters BEFORE near-dup hashing spends shingles on them
    (exact-prefix grouping is the cheap first tier of the dedup
    cascade; reads next to doc_exact_dup_groups, which needs the
    WHOLE doc equal). Counts are exact; the top-20 cut is
    TakeOrderedAndProject on the group aggregate; share divides by
    one broadcast scalar. Output: ≤20 rows."""
    docs = load_table(spark, sf_dir, "documents")
    ntot = docs.agg(F.count(F.lit(1)).alias("nt"))
    pref = docs.select(
        F.lower(F.substring(F.col("text"), 1, PREFIX_LEN)).alias(
            "prefix"
        ),
        "source",
    ).filter(F.col("prefix").isNotNull() & (F.col("prefix") != ""))
    grp = pref.groupBy("prefix").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    ).filter(F.col("n_docs") >= 2)
    top = grp.orderBy(
        F.col("n_docs").desc(), F.col("prefix").asc()
    ).limit(PREFIX_TOP_K)
    j = top.crossJoin(F.broadcast(ntot))
    return j.select(
        "prefix",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        _rne(
            F.col("n_docs").cast("double") / F.col("nt").cast("double"),
            "share",
            8,
        ),
    )


def _sql_doc_prefix_boilerplate() -> str:
    return f"""
WITH nt AS (SELECT count(*) AS nt FROM documents),
pref AS (
  SELECT lower(substr(text, 1, {PREFIX_LEN})) AS prefix, source
  FROM documents
  WHERE text IS NOT NULL AND substr(text, 1, {PREFIX_LEN}) <> ''),
grp AS (
  SELECT prefix, count(*) AS n_docs,
         count(DISTINCT source) AS n_sources
  FROM pref GROUP BY 1 HAVING count(*) >= 2),
top AS (
  SELECT * FROM grp ORDER BY n_docs DESC, prefix ASC
  LIMIT {PREFIX_TOP_K})
SELECT prefix, n_docs::BIGINT AS n_docs, n_sources::BIGINT AS n_sources,
       {_sql_rne('n_docs::DOUBLE / nt::DOUBLE', 'share', 8)}
FROM top CROSS JOIN nt"""


def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per source — mean words/sentence, mean
    chars/word, and a deterministic Flesch-style score (206.835 −
    1.015·wps − 84.6·(cpw/3) — chars-per-word/3 standing in for
    syllables-per-word: a monotone proxy that needs no dictionary
    and no regex dialect): the fluency screen between
    doc_text_profile's raw counts and the LM-perplexity cards.
    Sentences are counted with the replace-length trick on .!? (the
    char-entropy device — no regex, engine-neutral); words/chars
    come from the shared tokenizer. All sums exact integers; the
    score is one final expression; docs with zero sentences count as
    one sentence in both engines (greatest guard)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    toks = tokens(F.col("text"))
    sent = None
    for ch in ".!?":
        c = F.length(F.col("text")) - F.length(
            F.replace(F.col("text"), F.lit(ch))
        )
        sent = c if sent is None else sent + c
    per = docs.select(
        "source",
        F.size(toks).alias("w"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("wc"),
        F.greatest(sent, F.lit(1)).alias("s"),
    ).filter(F.col("w") > 0)
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("tw"),
        F.sum("wc").alias("twc"),
        F.sum("s").alias("ts"),
    )
    wps = F.col("tw").cast("double") / F.col("ts").cast("double")
    cpw = F.col("twc").cast("double") / F.col("tw").cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * wps
        - F.lit(84.6) * (cpw / F.lit(3.0))
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        _rne(wps, "words_per_sentence", 6),
        _rne(cpw, "chars_per_word", 6),
        _rne(flesch, "flesch_proxy", 6),
    )


def _sql_doc_readability() -> str:
    sent = " + ".join(
        f"(length(text) - length(replace(text, '{ch}', '')))"
        for ch in ".!?"
    )
    return f"""
WITH per AS (
  SELECT source,
         length({sql_tokens('text')}) AS w,
         list_reduce(list_transform({sql_tokens('text')},
                                    t -> length(t)),
                     (a, b) -> a + b) AS wc,
         greatest({sent}, 1) AS s
  FROM documents WHERE source IS NOT NULL),
agg AS (
  SELECT source, count(*) AS n_docs, sum(w) AS tw, sum(wc) AS twc,
         sum(s) AS ts
  FROM per WHERE w > 0 GROUP BY 1)
SELECT source, n_docs::BIGINT AS n_docs,
       {_sql_rne('tw::DOUBLE / ts::DOUBLE', 'words_per_sentence', 6)},
       {_sql_rne('twc::DOUBLE / tw::DOUBLE', 'chars_per_word', 6)},
       {_sql_rne(
           '206.835 - 1.015 * (tw::DOUBLE / ts::DOUBLE)'
           ' - 84.6 * ((twc::DOUBLE / tw::DOUBLE) / 3.0)',
           'flesch_proxy', 6)}
FROM agg"""


def q_doc_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — MinHash-LSH near-dup pairs
    rolled up to (source_a, source_b): WHO copies WHOM, the
    provenance view on top of doc_minhash_lsh_pairs' per-pair frame
    (a feed pair with a fat off-diagonal cell means one scrapes the
    other — drop the later crawl; the diagonal measures within-feed
    redundancy). Reuses the banded candidate join verbatim (work ∝
    Σdf², never all-pairs); the rollup adds one |sources|²-bounded
    aggregate with exact counts and a share against the pair
    total."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=NEAR_DUP_TAU)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_i"),
                F.col("source").alias("sa"),
            ),
            "id_i",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_j"),
                F.col("source").alias("sb"),
            ),
            "id_j",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    ntot = j.agg(F.count(F.lit(1)).alias("nt"))
    agg = j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    ).crossJoin(F.broadcast(ntot))
    return agg.select(
        "source_a",
        "source_b",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        _rne(
            F.col("n_pairs").cast("double") / F.col("nt").cast("double"),
            "pair_share",
            8,
        ),
    )


def _sql_doc_dup_source_matrix() -> str:
    # the candidate+verify CTEs are the doc_minhash_lsh_pairs
    # oracle's, reused verbatim via the shared fragment
    return f"""WITH {_SQL_MINHASH_CAND_CTES},
mpairs AS (
  SELECT c.id_i, c.id_j
  FROM cand c
  JOIN sf x ON x.doc_id = c.id_i
  JOIN sf y ON y.doc_id = c.id_j
  WHERE {_sql_jaccard('x.sh', 'y.sh')} >= {NEAR_DUP_TAU}),
src AS (SELECT doc_id, source FROM documents),
m AS (
  SELECT least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM mpairs p
  JOIN src a ON p.id_i = a.doc_id
  JOIN src b ON p.id_j = b.doc_id),
nt AS (SELECT count(*) AS nt FROM m)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
       {_sql_rne(
           'count(*)::DOUBLE / any_value(nt.nt)::DOUBLE',
           'pair_share', 8)}
FROM m CROSS JOIN nt
GROUP BY 1, 2"""


def q_doc_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — which feeds
    speak the same language (high overlap pairs are dedup-risk and
    domain-mixture candidates; a near-zero row is a genuinely novel
    domain — the source-level complement of doc_js_divergence's
    distributional distance, on SETS instead of frequencies). One
    distinct (source, term) frame; the intersection self-join keys on
    term (work ∝ Σ per-term source-count², bounded by the SOURCE
    universe, never the corpus); union sizes come from the exact
    |A| + |B| − |A∩B| identity. |sources|² output rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    st = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .distinct()
    )
    vocab = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = st.select(F.col("source").alias("sa"), "term")
    b = st.select(F.col("source").alias("sb"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            F.broadcast(
                vocab.select(F.col("source").alias("sa"),
                             F.col("v").alias("va"))
            ),
            "sa",
        )
        .join(
            F.broadcast(
                vocab.select(F.col("source").alias("sb"),
                             F.col("v").alias("vb"))
            ),
            "sb",
        )
    )
    uni = F.col("va") + F.col("vb") - F.col("inter")
    return j.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("inter").cast("long").alias("n_shared"),
        _rne(
            F.col("inter").cast("double") / uni.cast("double"),
            "jaccard",
            8,
        ),
    )


def _sql_doc_source_vocab_overlap() -> str:
    return f"""
WITH st AS (
  SELECT DISTINCT source, term
  FROM (SELECT source, unnest({sql_tokens('text')}) AS term
        FROM documents WHERE source IS NOT NULL)),
vocab AS (SELECT source, count(*) AS v FROM st GROUP BY 1),
inter AS (
  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT sa AS source_a, sb AS source_b, inter::BIGINT AS n_shared,
       {_sql_rne(
           'inter::DOUBLE / (va.v + vb.v - inter)::DOUBLE',
           'jaccard', 8)}
FROM inter
JOIN vocab va ON va.source = sa
JOIN vocab vb ON vb.source = sb"""


def _bpe_seg_from_tok(tok: DataFrame) -> DataFrame:
    """(tok, n_pieces) after ``BPE_ROUNDS`` training rounds over the
    token frame's vocabulary — the shared trainer behind
    doc_bpe_segment and doc_tokenizer_fertility (one definition of
    the merge order engine-wide; each round's argmax is a
    localCheckpoint barrier so later rounds never recompute earlier
    scans — the doc_bpe_merges device). ``tok`` needs a ``tok``
    column; extra columns are ignored by the vocabulary build."""
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "tok",
            F.array_join(F.split("tok", ""), " ").alias("word"),
            "cnt",
        )
    )
    for _ in range(BPE_ROUNDS):
        syms = F.split("word", " ")
        pairs = vocab.filter(F.size(syms) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(syms) - 2),
                    lambda i: F.struct(
                        F.element_at(syms, i + 1).alias("lhs"),
                        F.element_at(syms, i + 2).alias("rhs"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("weight"))
            .orderBy(
                F.col("weight").desc(),
                F.col("lhs").asc(),
                F.col("rhs").asc(),
            )
            .limit(1)
            .localCheckpoint(eager=True)
        )
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "tok",
            F.replace(
                F.col("word"),
                F.concat(F.col("lhs"), F.lit(" "), F.col("rhs")),
                F.concat(F.col("lhs"), F.col("rhs")),
            ).alias("word"),
            "cnt",
        )
    return vocab.select(
        "tok", F.size(F.split("word", " ")).cast("long").alias("n_pieces")
    )


def q_doc_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the serving half of
    doc_bpe_merges: run the same k=5 training rounds (vocabulary-
    sized), keep each token's final segmentation, and score every
    document by its piece count (the budget quantity an LLM-data
    pipeline packs context windows by). The token stream joins the
    segmented vocabulary on a broadcast (vocab ≪ corpus — the same
    asymmetry the unigram-LM scorer exploits), so the corpus-sized
    pass is one broadcast-join + one doc_id combine. All integer
    arithmetic except the final pieces-per-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    seg = _bpe_seg_from_tok(tok)
    per_doc = (
        tok.join(F.broadcast(seg), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
        _rne(
            F.col("n_pieces").cast("double") / F.col("n_tok").cast("double"),
            "pieces_per_tok",
            8,
        ),
    )


def _sql_bpe_seg_ctes(tok_cte: str) -> str:
    """The shared BPE-training CTE chain (tok → vocab0..vocabK → seg)
    over a caller-supplied ``tok`` CTE body — one SQL definition of
    the merge order, mirroring :func:`_bpe_seg_from_tok`."""
    ctes = [
        f"tok AS ({tok_cte})",
        "vocab0 AS (SELECT tok,"
        " array_to_string(string_split(tok, ''), ' ') AS word,"
        " count(*) AS cnt FROM tok GROUP BY tok)",
    ]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(
            f"""p{r} AS (
  SELECT syms[i] AS lhs, syms[i+1] AS rhs, cnt
  FROM (SELECT string_split(word, ' ') AS syms, cnt FROM vocab{r - 1}),
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i))"""
        )
        ctes.append(
            f"""best{r} AS (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS weight
  FROM p{r} GROUP BY 1, 2
  ORDER BY weight DESC, lhs ASC, rhs ASC LIMIT 1)"""
        )
        ctes.append(
            f"""vocab{r} AS (
  SELECT tok, replace(word, lhs || ' ' || rhs, lhs || rhs) AS word, cnt
  FROM vocab{r - 1}, best{r})"""
        )
    ctes.append(
        f"seg AS (SELECT tok, len(string_split(word, ' '))::BIGINT"
        f" AS n_pieces FROM vocab{BPE_ROUNDS})"
    )
    return ",\n".join(ctes)


def _sql_doc_bpe_segment() -> str:
    body = _sql_bpe_seg_ctes(
        f"SELECT doc_id, unnest({sql_tokens('text')}) AS tok"
        " FROM documents"
    )
    return (
        "WITH "
        + body
        + f"""
SELECT doc_id, count(*)::BIGINT AS n_tok,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       {_sql_rne('sum(n_pieces)::DOUBLE / count(*)::DOUBLE',
                 'pieces_per_tok', 8)}
FROM tok JOIN seg USING (tok)
GROUP BY 1"""
    )


def q_doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — pieces per word under the
    corpus-trained BPE segmentation, the standard cross-lingual
    tokenizer-quality table (a language whose fertility is 2× pays 2×
    the context budget and 2× the inference cost for the same text —
    the number multilingual data pipelines balance vocab size by).
    Same trainer as doc_bpe_segment (one merge-order definition); the
    corpus-sized pass is one broadcast vocab join, then ONE
    (lang)-keyed integer aggregate. Also emits distinct word types
    per language — fertility on types vs runs separates 'hard
    morphology' from 'frequent unknown words'."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    seg = _bpe_seg_from_tok(tok)
    per_lang = (
        tok.join(F.broadcast(seg), "tok")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct("tok").alias("n_types"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )
    return per_lang.select(
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
        _rne(
            F.col("n_pieces").cast("double")
            / F.col("n_words").cast("double"),
            "fertility",
            8,
        ),
    )


def _sql_doc_tokenizer_fertility() -> str:
    body = _sql_bpe_seg_ctes(
        f"SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok"
        " FROM documents"
    )
    return (
        "WITH "
        + body
        + f"""
SELECT lang, count(*)::BIGINT AS n_words,
       count(DISTINCT tok)::BIGINT AS n_types,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       {_sql_rne('sum(n_pieces)::DOUBLE / count(*)::DOUBLE',
                 'fertility', 8)}
FROM tok JOIN seg USING (tok)
GROUP BY 1"""
    )


GARBAGE_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def q_doc_garbage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR/garbage heuristics per document — the cheap pre-filter a
    pretraining pipeline runs before any model-based quality score:
    symbol ratio (non-alnum non-space), digit ratio, longest
    lowercase-consonant run (OCR noise and base64 blobs produce runs
    real words never do), and mixed alnum-token share. All string
    expressions (regexp_replace lengths, regexp_extract_all run
    scan) — one projection, no explode, no shuffle beyond the scan."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    n = F.length(txt).cast("double")
    n_sym = F.length(
        F.regexp_replace(txt, r"[A-Za-z0-9\s]", "")
    ).cast("double")
    n_dig = F.length(F.regexp_replace(txt, r"[^0-9]", "")).cast("double")
    runs = F.expr(
        f"regexp_extract_all(lower(text), '[{GARBAGE_CONSONANTS}]+', 0)"
    )
    max_run = F.coalesce(
        F.array_max(F.transform(runs, F.length)).cast("long"), F.lit(0)
    )
    toks = tokens(txt)
    mixed = F.size(
        F.filter(
            toks,
            lambda t: t.rlike("[a-z]") & t.rlike("[0-9]"),
        )
    ).cast("double")
    n_tok = F.size(toks).cast("double")
    return docs.select(
        "doc_id",
        _rne(F.when(n > 0, n_sym / n).otherwise(F.lit(0.0)), "sym_ratio", 8),
        _rne(F.when(n > 0, n_dig / n).otherwise(F.lit(0.0)), "digit_ratio", 8),
        max_run.alias("max_consonant_run"),
        _rne(
            F.when(n_tok > 0, mixed / n_tok).otherwise(F.lit(0.0)),
            "mixed_tok_share",
            8,
        ),
    )


def _sql_doc_garbage_score() -> str:
    sym = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[A-Za-z0-9" + "\\s" + "]', '', 'g'))"
        "::DOUBLE / length(text) ELSE 0.0 END"
    )
    dig = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE"
        " / length(text) ELSE 0.0 END"
    )
    toks = sql_tokens("text")
    mixed = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> "
        "regexp_matches(t, '[a-z]') AND regexp_matches(t, '[0-9]')))"
        f"::DOUBLE / len({toks}) ELSE 0.0 END"
    )
    return f"""
SELECT doc_id,
       {_sql_rne(sym, 'sym_ratio', 8)},
       {_sql_rne(dig, 'digit_ratio', 8)},
       coalesce(list_max(list_transform(
           regexp_extract_all(lower(text), '[{GARBAGE_CONSONANTS}]+', 0),
           r -> length(r))), 0)::BIGINT AS max_consonant_run,
       {_sql_rne(mixed, 'mixed_tok_share', 8)}
FROM documents"""


DOC_QUANTILES = (0.1, 0.5, 0.9)


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated length quantiles per source — the
    distribution audit behind any length-based curation cut (Gopher's
    length rules pick thresholds from exactly this view). Both
    engines compute the same classical estimator (h = (n−1)p;
    x_⌊h⌋ + (h−⌊h⌋)·(x_⌊h⌋₊₁ − x_⌊h⌋) on the sorted values — Spark
    ``percentile``, DuckDB ``quantile_cont``), identical IEEE ops on
    integer inputs, rounded on the shared grid. One aggregate; at
    scale this is the sort-based percentile per group, never a global
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    qs = ", ".join(str(q) for q in DOC_QUANTILES)
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"percentile(n_chars, array({qs}))").alias("qs"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        *[
            _rne(F.element_at("qs", i + 1), f"p{int(q * 100)}", 6)
            for i, q in enumerate(DOC_QUANTILES)
        ],
    )


def _sql_doc_length_quantiles() -> str:
    cols = ",\n       ".join(
        _sql_rne(f"quantile_cont(n_chars, {q})", f"p{int(q * 100)}", 6)
        for q in DOC_QUANTILES
    )
    return f"""
SELECT source, count(*)::BIGINT AS n_docs,
       {cols}
FROM documents GROUP BY 1"""


KN_DISCOUNT = 0.75


def q_doc_kn_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram perplexity over the same
    train/eval split as doc_bigram_lm_ppl — the standard LM smoothing
    (absolute discount D=0.75 + continuation probability) that add-k
    approximates badly: P(b|a) = max(c(a,b)−D,0)/c(a·) +
    D·N₁₊(a·)/c(a·) · P_cont(b), P_cont(b) = N₁₊(·b)/|bigram types|;
    an unseen context backs off to P_cont(b), an unseen word floors
    at D/|types| (engine convention, identical in the oracle). Four
    count aggregates over the train bigram stream (type-sized, never
    token-sized past the first pass) joined onto the pre-aggregated
    eval bigrams; each surprisal snaps to the 1e-9 grid and per-doc
    sums ride exact DECIMAL (the bigram_lm device)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 5 == 0).alias("is_eval"),
        tokens(F.col("text")).alias("toks"),
    )
    big = (
        base.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "is_eval",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "is_eval", "p.a", "p.b")
    )
    train = big.filter(~F.col("is_eval"))
    c2 = train.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("a").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    nb = c2.groupBy("b").agg(F.count(F.lit(1)).alias("n1b"))
    tt = c2.agg(F.count(F.lit(1)).alias("tt"))
    ev = (
        big.filter(F.col("is_eval"))
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    d = F.lit(KN_DISCOUNT)
    j = (
        ev.join(c2, ["a", "b"], "left")
        .join(c1, "a", "left")
        .join(nb, "b", "left")
        .crossJoin(F.broadcast(tt))
    )
    pcont = F.col("n1b").cast("double") / F.col("tt").cast("double")
    c1d = F.col("c1").cast("double")
    p_seen_ctx = (
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0)).cast("double") - d, F.lit(0.0)
        )
        / c1d
        + d * F.col("n1f").cast("double") / c1d
        * F.coalesce(pcont, F.lit(0.0))
    )
    p = F.when(F.col("c1").isNotNull(), p_seen_ctx).otherwise(
        F.coalesce(pcont, d / F.col("tt").cast("double"))
    )
    # the interpolated term can be exactly 0 only if pcont is 0 AND
    # c2<=D with a seen context; floor identically on both sides
    p = F.greatest(p, d / F.col("tt").cast("double") / F.lit(1e6))
    bits = (
        F.floor(-F.log(p) * F.col("m") * 1e9 + F.lit(0.5)) / 1e9
    ).cast("decimal(24,9)")
    agg = j.select("doc_id", F.col("m"), bits.alias("s")).groupBy(
        "doc_id"
    ).agg(F.sum("m").alias("n_big"), F.sum("s").alias("ssum"))
    return agg.select(
        "doc_id",
        F.col("n_big").cast("long").alias("n_big"),
        _rne(
            F.exp(
                F.col("ssum").cast("double") / F.col("n_big").cast("double")
            ),
            "kn_ppl",
            6,
        ),
    )


def _sql_doc_kn_bigram_ppl() -> str:
    d = KN_DISCOUNT
    return f"""
WITH base AS (
  SELECT doc_id, doc_id % 5 = 0 AS is_eval,
         {sql_tokens('text')} AS toks
  FROM documents),
big AS (
  SELECT doc_id, is_eval, toks[i] AS a, toks[i+1] AS b
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 2),
c2 AS (SELECT a, b, count(*) AS c2 FROM big WHERE NOT is_eval GROUP BY 1, 2),
c1 AS (SELECT a, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY 1),
nb AS (SELECT b, count(*) AS n1b FROM c2 GROUP BY 1),
tt AS (SELECT count(*) AS tt FROM c2),
ev AS (SELECT doc_id, a, b, count(*) AS m FROM big WHERE is_eval
       GROUP BY 1, 2, 3),
j AS (
  SELECT ev.doc_id, ev.m,
         CASE WHEN c1.c1 IS NOT NULL THEN
           greatest(coalesce(c2.c2, 0)::DOUBLE - {d}, 0.0) / c1.c1::DOUBLE
           + {d} * c1.n1f::DOUBLE / c1.c1::DOUBLE
             * coalesce(nb.n1b::DOUBLE / tt.tt::DOUBLE, 0.0)
         ELSE coalesce(nb.n1b::DOUBLE / tt.tt::DOUBLE,
                       {d} / tt.tt::DOUBLE) END AS p0
  FROM ev LEFT JOIN c2 USING (a, b)
          LEFT JOIN c1 USING (a)
          LEFT JOIN nb USING (b)
          CROSS JOIN tt),
s AS (
  SELECT doc_id, m,
         CAST(floor(-ln(greatest(p0,
                (SELECT {d} / tt::DOUBLE / 1e6 FROM tt))) * m * 1e9 + 0.5)
              / 1e9 AS DECIMAL(24,9)) AS s
  FROM j)
SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_big,
       {_sql_rne('exp(sum(s)::DOUBLE / sum(m)::DOUBLE)', 'kn_ppl', 6)}
FROM s GROUP BY 1"""
