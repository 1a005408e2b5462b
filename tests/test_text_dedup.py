"""Contracts for the text-analysis and dedup operator stack.

Pins the portable-hash definition (md5-prefix 60-bit), sketch
reproducibility (MinHash/SimHash pure-integer math), pigeonhole
exactness of the banded joins, and the ±1-plane LSH bucketing."""

import hashlib
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.text import (
    fingerprint,
    hash60,
    predicted_lang,
    shingles,
    tokens,
)
from big_data_stock_price_forecast_spark.operators.dedup import (
    MH_PERMS,
    jaccard,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_shingles,
    with_simhash,
)
from big_data_stock_price_forecast_spark.operators.similarity import (
    ann_lsh_topk,
    embedding_near_dup_pairs,
    sign_lsh_bucket,
    sign_planes,
)


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash60_matches_md5_prefix(spark):
    df = spark.createDataFrame([("hello",), ("spark sql",)], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", hash60(F.col("s")).alias("h")).collect()}
    assert got == {s: _py_h60(s) for s in got}


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The cat, the CAT sat!",)], ["text"])
    row = df.select(
        tokens(F.col("text")).alias("tok"),
        shingles(tokens(F.col("text")), 2).alias("sh"),
    ).collect()[0]
    assert row["tok"] == ["the", "cat", "the", "cat", "sat"]
    # distinct bigrams only
    assert sorted(row["sh"]) == ["cat sat", "cat the", "the cat"]


def test_short_doc_has_no_shingles(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    assert df.select(shingles(tokens(F.col("text")), 3).alias("sh")).collect()[0][
        "sh"
    ] == []


def test_jaccard_identity_and_disjoint(spark):
    df = spark.createDataFrame(
        [Row(a=["x", "y"], b=["x", "y"]), Row(a=["x"], b=["y"])]
    )
    vals = [r["j"] for r in df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()]
    assert vals == [1.0, 0.0]


def test_fingerprint_matches_python_reference(spark):
    texts = ["abc", "a b c!", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]

    def ref(t):
        h = 0
        for ch in t:
            h = (h * 257 + ord(ch)) % 2147483647
        return h

    assert got == [ref(t) for t in texts]


def test_langid_real_sentences(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in a box",),
            ("der hund und die katze ist nicht da",),
            ("el perro y la casa es un lugar",),
            ("zzz qqq www",),
        ],
        ["text"],
    )
    got = [
        r["p"]
        for r in df.select(
            predicted_lang(tokens(F.col("text"))).alias("p")
        ).collect()
    ]
    assert got == ["en", "de", "es", "und"]


def test_minhash_identical_docs_collide(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    sigs = minhash_signature(with_shingles(docs)).select("doc_id", "sig").collect()
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert len(by_id[1]) == MH_PERMS
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]

    pairs = minhash_lsh_pairs(docs, threshold=0.9).collect()
    assert [(p["id_i"], p["id_j"], p["jac"]) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_banding_equals_brute_force(spark, sf_dir):
    """Pigeonhole banding must find EXACTLY the brute-force pair set."""
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120).cache()
    banded = {
        (r["id_i"], r["id_j"], r["hamming"])
        for r in simhash_pairs(docs).collect()
    }
    sims = with_simhash(docs).select(F.col("doc_id").alias("id"), "simhash")
    brute = (
        sims.alias("a")
        .join(sims.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_i"),
            F.col("b.id").alias("id_j"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    assert banded == {
        (r["id_i"], r["id_j"], r["hamming"]) for r in brute.collect()
    }
    docs.unpersist()


def test_simhash_python_reference(spark):
    text = "key agg row scan slow fast table"
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    got = with_simhash(df).collect()[0]["simhash"]

    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    votes = [0] * 60
    for t in toks:
        h = _py_h60(t)
        for j in range(60):
            votes[j] += 1 if (h >> j) & 1 else -1
    want = sum(1 << j for j in range(60) if votes[j] >= 0)
    assert got == want


def test_ngram_jaccard_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e g"),
            (3, "q r s t u v"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_i"], r["id_j"]): r["jac"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    # docs 1,2 share 3 of their 4+4 trigrams -> jac = 3/5; docs with no
    # shared shingle never pair (inverted index: tau must be > 0)
    assert pairs == {(1, 2): pytest.approx(3 / 5)}


def test_sign_lsh_bucket_range_and_determinism(spark, sf_dir):
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = emb.select(sign_lsh_bucket(F.col("v")).alias("b"))
    lo, hi = b.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= lo and hi < 64
    # determinism: same plane matrix on recompute
    assert sign_planes(2, 4) == sign_planes(2, 4)


def test_ann_topk_is_bucket_local_and_ranked(spark, sf_dir):
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ann_lsh_topk(emb, queries, k=3).collect()
    assert out, "expected non-empty ANN results"
    by_q = {}
    for r in out:
        assert r["rank"] <= 3 and r["id"] != r["q_id"]
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["cos"]))
    for ranks in by_q.values():
        ranks.sort()
        cos_vals = [c for _, c in ranks]
        assert cos_vals == sorted(cos_vals, reverse=True)


def test_embedding_near_dup_threshold(spark, sf_dir):
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = embedding_near_dup_pairs(emb, threshold=0.4).collect()
    for r in out:
        assert r["cos"] >= 0.4 and r["id_i"] < r["id_j"]


def test_bucket_pairs_skew_safe_chunking_preserves_pairs(spark):
    """A hot bucket forced through triangle chunking must yield exactly
    the unchunked pair set (and exactly the brute-force expectation)."""
    import itertools

    from big_data_stock_price_forecast_spark.operators.dedup import (
        bucket_pairs_skew_safe,
    )

    rows = [
        (b, i)
        for b in range(3)
        for i in range(b * 100, b * 100 + (40 if b == 0 else 5))
    ]
    df = spark.createDataFrame(rows, ["key", "id"])

    def pair_set(ct):
        out = bucket_pairs_skew_safe(df, ["key"], ["id"], chunk_target=ct)
        return {
            (r["p"]["a"]["id"], r["p"]["b"]["id"]) for r in out.collect()
        }

    big = pair_set(10**6)  # single-task path
    small = pair_set(4)  # forced triangle chunking (bucket of 40 -> 10 chunks)
    assert small == big

    expected = set()
    for b in range(3):
        ids = [i for (k, i) in rows if k == b]
        expected |= {
            (min(x, y), max(x, y))
            for x, y in itertools.combinations(ids, 2)
        }
    assert big == expected


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain must collapse to one component (propagation
    crosses the full diameter) and disjoint pairs must stay separate;
    canonical = min id."""
    from big_data_stock_price_forecast_spark.operators.dedup import (
        dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(2, 9), (9, 4), (4, 7), (20, 21)], ["id_i", "id_j"]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dup_clusters(pairs).collect()
    }
    assert got == {
        2: (2, 4, 1), 9: (2, 4, 0), 4: (2, 4, 0), 7: (2, 4, 0),
        20: (20, 2, 1), 21: (20, 2, 0),
    }


def test_connected_components_random_graphs_match_union_find(spark):
    """Distributed CC vs a pure-Python union-find on random graphs —
    same partition into components, canonical = min id."""
    import numpy as np

    from big_data_stock_price_forecast_spark.operators.dedup import (
        connected_components,
    )

    rng = np.random.default_rng(7)
    for n_nodes, n_edges in [(60, 40), (120, 150)]:
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for e in edges for a in e}
        expect = {x: find(x) for x in touched}
        # both strategies must agree with the reference: the single-task
        # union-find fast path (default at this size) and the iterative
        # hash-min rounds (forced with small_graph_edges=0)
        for threshold in (None, 0):
            kw = {} if threshold is None else {"small_graph_edges": threshold}
            got = {
                r["node"]: r["component"]
                for r in connected_components(
                    spark.createDataFrame(edges, ["id_i", "id_j"]), **kw
                ).collect()
            }
            assert got == expect


def test_connected_components_long_chain_double_step(spark):
    """A 64-node path graph needs several pointer-doubling rounds, so
    it exercises the adaptive two-steps-per-checkpoint path (rounds 2+)
    that shallow near-dup graphs never reach. Every node must collapse
    to component 0."""
    from big_data_stock_price_forecast_spark.operators.dedup import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(63)]
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, ["id_i", "id_j"]),
            # force the iterative path — at this size the default would
            # take the single-task union-find shortcut
            small_graph_edges=0,
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_incremental_vs_index_matches_full_run_subset(spark, sf_dir, tmp_path):
    """The persisted-index incremental path must emit EXACTLY the
    full-run pairs that touch a new doc — and the bootstrap (raw-text)
    flavor must agree with it."""
    from big_data_stock_price_forecast_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        minhash_lsh_pairs_vs_index,
        write_minhash_index,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    split = 400
    new = docs.filter(F.col("doc_id") >= split)
    seen = docs.filter(F.col("doc_id") < split)

    full = {
        (r["id_i"], r["id_j"], r["jac"])
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
        if r["id_i"] >= split or r["id_j"] >= split
    }

    idx = str(tmp_path / "mh_index")
    write_minhash_index(seen, idx)
    got_idx = {
        (r["id_i"], r["id_j"], r["jac"])
        for r in minhash_lsh_pairs_vs_index(
            new,
            spark.read.parquet(f"{idx}/bands"),
            spark.read.parquet(f"{idx}/shingles"),
            threshold=0.2,
        ).collect()
    }
    assert got_idx == full

    got_boot = {
        (r["id_i"], r["id_j"], r["jac"])
        for r in minhash_lsh_pairs_incremental(
            new, seen, threshold=0.2, broadcast_batch=False
        ).collect()
    }
    assert got_boot == full


def test_shingle_sets_matches_jvm_expression(spark):
    """The Arrow shingler must be value-identical to the JVM
    with_shingles(tokens(...)) expression it replaces — same lowercase,
    same [^a-z0-9]+ split, same space-joined n-grams, same
    first-occurrence distinct, same empty-set drop."""
    from big_data_stock_price_forecast_spark.operators.dedup import (
        shingle_sets,
        with_shingles,
    )

    texts = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "a b"),                      # < n tokens -> dropped
        (2, ""),                         # empty -> dropped
        (3, "  Mixed   CASE    and 123 numbers-with-dashes  "),
        (4, "dup dup dup dup dup"),      # collapses to one shingle
        (5, "x!y@z#w$v%u"),              # punctuation-only separators
        (6, "tab\tand\nnewline separated tokens here"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    via_jvm = {
        r["doc_id"]: r["sh"]
        for r in with_shingles(docs)
        .filter(F.size("sh") > 0)
        .select("doc_id", "sh")
        .collect()
    }
    via_arrow = {
        r["doc_id"]: r["sh"] for r in shingle_sets(docs).collect()
    }
    assert via_arrow == via_jvm


def test_cms_estimate_upper_bounds_and_converges(spark):
    """Count-Min invariants: est >= true for every term (one-sided
    error), and with a wide-enough table (no collisions at this
    vocabulary) est == true exactly."""
    from big_data_stock_price_forecast_spark.operators.sketch import (
        cms_cells,
        cms_estimate,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = [(w,) for i, w in enumerate(words) for _ in range(i + 1)]
    toks = spark.createDataFrame(rows * 3, ["term"])  # counts 3,6,9,12,15
    truth = {w: 3 * (i + 1) for i, w in enumerate(words)}
    cand = toks.distinct()

    wide = cms_estimate(
        cand, cms_cells(toks, width=1 << 16), width=1 << 16
    ).collect()
    assert {r["term"]: r["est_cnt"] for r in wide} == truth

    # a 2-cell table forces collisions: estimates must only inflate
    tiny = cms_estimate(cand, cms_cells(toks, width=2), width=2).collect()
    for r in tiny:
        assert r["est_cnt"] >= truth[r["term"]]


def test_hll_estimate_accuracy_and_mergeability(spark):
    """HLL invariants: the estimate lands within ~3 standard errors
    (1.04/sqrt(64) ~ 13%) of the true cardinality, and registers built
    from two halves of the data merge (re-max) to the registers of the
    whole — the property that makes the sketch distributable."""
    from big_data_stock_price_forecast_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    n = 3000
    df = spark.createDataFrame(
        [("g", i) for i in range(n)], ["g", "uid"]
    )
    regs = hll_registers(df, "uid", ["g"])
    est = hll_estimate(regs, ["g"]).collect()[0]["hll_est"]
    assert abs(est - n) / n < 0.40  # 3 sigma at m=64

    half1 = hll_registers(df.filter(F.col("uid") < n // 2), "uid", ["g"])
    half2 = hll_registers(df.filter(F.col("uid") >= n // 2), "uid", ["g"])
    merged = (
        half1.unionByName(half2)
        .groupBy("g", "bucket")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    whole = {
        (r["bucket"], r["m_rank"]) for r in regs.collect()
    }
    assert {
        (r["bucket"], r["m_rank"]) for r in merged.collect()
    } == whole


def test_bloom_hits_superset_of_exact(spark, sf_dir):
    """Bloom membership can only over-report (no false negatives):
    per doc, n_bloom_hits >= n_exact_hits, and every exact hit's
    positions are all set."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bloom_decontam,
    )

    rows = q_doc_bloom_decontam(spark, sf_dir).collect()
    assert rows
    assert any(r["n_exact_hits"] > 0 for r in rows)
    for r in rows:
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
        assert r["n_shingles"] >= r["n_bloom_hits"]


def test_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Scale contract of the persisted-index layout: the bands and
    shingles scans must carry dynamic partition-pruning filters (the
    probe reads only the batch's matching kb/ib bucket dirs, never the
    whole index), and the layout must actually be partitioned."""
    import os

    from big_data_stock_price_forecast_spark.operators.dedup import (
        IDX_BUCKETS,
        minhash_lsh_pairs_vs_index,
        write_minhash_index,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs.filter(F.col("doc_id") < 400), idx)
    kb_dirs = [
        d for d in os.listdir(os.path.join(idx, "bands", "batch=seed"))
        if d.startswith("kb=")
    ]
    assert 1 < len(kb_dirs) <= IDX_BUCKETS
    out = minhash_lsh_pairs_vs_index(
        docs.filter(F.col("doc_id") >= 400),
        spark.read.parquet(f"{idx}/bands"),
        spark.read.parquet(f"{idx}/shingles"),
        threshold=0.2,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("dynamicpruning") >= 2, plan[:2000]


def test_shingles_let_binding_tokenizes_once(spark):
    # Regression pin (r8): shingles(tokens(col)) composed as a raw
    # expression used to place the filter(split(lower)) tokenizer
    # INSIDE the per-shingle slice lambda — re-tokenizing the document
    # once per shingle, O(tokens²) per doc. The let_ binding keeps
    # exactly one split site in the plan regardless of projection
    # collapsing; the slice inside the lambda must reference a lambda
    # variable, never the tokenizer.
    df = spark.createDataFrame([("a b c d e f",)], ["text"])
    plan = (
        df.select(shingles(tokens(F.col("text")), 3).alias("sh"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1, plan
