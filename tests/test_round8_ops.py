"""Round-8 operator contracts: winnowing fingerprints (MOSS) and
binary-quantization Hamming ANN.

Winnowing reference: Schleimer/Wilkerson/Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD'03. The property tests
replay the selection rule in plain Python and assert the Spark
expression reproduces it exactly, including the short-document
degenerate branches.
"""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from big_data_stock_price_forecast_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_pairs,
    winnow_sets,
)
from big_data_stock_price_forecast_spark.operators.similarity import (
    binary_quantize,
    bq_hamming_topk,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set:
    nrm = "".join(c for c in text.lower() if c.isalnum())
    grams = [_h60(nrm[i : i + k]) for i in range(len(nrm) - k + 1)]
    if not grams:
        return set()
    n_win = max(len(grams) - w + 1, 1)
    return {min(grams[j : j + w]) for j in range(n_win)}


def test_winnow_matches_python_reference(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog again and again.",
        "short",
        "ab",  # < k normalized chars -> empty fingerprint set
        "abcdefghij",  # exactly a few grams, fewer than w windows
        "aaaaaaaaaaaaaaaaaaaa",  # degenerate: all grams identical
        "Punctuation, CASE & unicode-ish spacing   should not matter!!",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["id"]: set(r["fps"])
        for r in winnow_fingerprints(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), f"doc {i}: {t!r}"


def test_winnow_guarantee_shared_substring(spark):
    # Any shared substring of >= w + k - 1 normalized chars must
    # contribute at least one shared fingerprint (the MOSS guarantee).
    shared = "zqxjvkwpyh bmfg"  # 14 alnum chars > w+k-1 = 11
    a = "left context one " + shared + " tail alpha"
    b = "completely different prefix " + shared + " other suffix"
    fa, fb = _py_winnow(a), _py_winnow(b)
    assert fa & fb
    df = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b)]
    )
    got = {r["id"]: set(r["fps"]) for r in winnow_fingerprints(df).collect()}
    assert got[1] & got[2]


def test_winnow_pairs_scores_and_threshold(spark):
    base = "the cat sat on the mat while the dog slept by the door frame"
    near = base + " extra trailing clause appended"
    other = "completely unrelated content about spark shuffle exchanges"
    df = spark.createDataFrame(
        [
            Row(doc_id=10, text=base),
            Row(doc_id=11, text=near),
            Row(doc_id=12, text=other),
        ]
    )
    rows = winnow_pairs(df, threshold=0.15).collect()
    pairs = {(r["id_i"], r["id_j"]): r["winnow_jac"] for r in rows}
    assert (10, 11) in pairs
    assert all(12 not in p for p in pairs)
    fa, fb = _py_winnow(base), _py_winnow(near)
    exp = len(fa & fb) / len(fa | fb)
    assert pairs[(10, 11)] == pytest.approx(exp, abs=0)


def test_winnow_is_shuffle_free_fingerprinting(spark):
    # fingerprint extraction itself must be a pure projection: no
    # Exchange in the plan (the shuffle belongs to the downstream
    # inverted-index groupBy only).
    df = spark.createDataFrame([Row(doc_id=1, text="abcdefghijklmno")])
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnow_sets_matches_jvm_expression(spark, sf_dir):
    # The Arrow fast path (winnow_sets, what winnow_pairs runs) must
    # select EXACTLY the fingerprints of the oracle-documented JVM
    # expression (winnow_fingerprints) on real corpus text — same
    # normalization, gram hashes, and min-per-window rule. Rows whose
    # set is empty are dropped by the Arrow path.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    jvm = {
        r["id"]: set(r["fps"])
        for r in winnow_fingerprints(docs).collect()
        if r["fps"]
    }
    arrow = {r["id"]: set(r["fps"]) for r in winnow_sets(docs).collect()}
    assert arrow == jvm


def test_winnow_let_binding_survives_explode(spark):
    # Regression pin for the O(n²) projection-collapse blowup: when the
    # fps column flows into an explode, Catalyst inlines it into every
    # reference — without the _let lambda-variable binding the gram
    # md5-array got re-evaluated inside each window slice (plan grew to
    # 5 md5 sites; 500 docs went from 4 s to stuck). With the binding,
    # each inlined copy is linear: the optimized plan may carry a few
    # whole-fps copies but never nests the gram hash inside the
    # window-min lambda, so md5 sites stay small and constant.
    df = spark.createDataFrame([Row(doc_id=1, text="abcdefghijklmno")])
    ex = winnow_fingerprints(df).select(
        "id", F.size("fps").alias("cnt"), F.explode("fps").alias("h")
    )
    plan = ex._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") <= 3, plan


def test_binary_quantize_bits(spark):
    vec = [1.0 if d % 3 == 0 else (-1.0 if d % 3 == 1 else 0.0) for d in range(64)]
    exp = 0
    for d, x in enumerate(vec):
        if x > 0:
            exp |= 1 << d
    if exp >= 1 << 63:
        exp -= 1 << 64
    df = spark.createDataFrame([Row(v=vec)])
    got = df.select(binary_quantize(F.col("v")).alias("c")).collect()[0]["c"]
    assert got == exp
    # bit 63 set -> negative long, no overflow error
    top = [0.0] * 63 + [1.0]
    got2 = (
        spark.createDataFrame([Row(v=top)])
        .select(binary_quantize(F.col("v")).alias("c"))
        .collect()[0]["c"]
    )
    assert got2 == -(1 << 63)


def test_bq_hamming_topk_finds_planted_neighbors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = bq_hamming_topk(emb, queries, k=3, rerank=16, radius=31)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert by_q, "no query produced candidates"
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(r["hamming"] <= 31 for r in rs)
        assert all(r["id"] != q for r in rs)
        # re-rank order is by exact cosine desc
        by_rank = sorted(rs, key=lambda r: r["rank"])
        coss = [r["cos"] for r in by_rank]
        assert coss == sorted(coss, reverse=True)


def test_bq_scan_projects_away_floats(spark, sf_dir):
    # The Hamming stage must not carry the float vectors: the
    # candidate plan's scan of the corpus side reads only what the
    # code column needs, and the only corpus-wide join is against a
    # broadcast of the (tiny) query codes.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = bq_hamming_topk(emb, queries, k=3, rerank=16, radius=31)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # exactly one shuffle family: the per-query top-R/top-k windows
    # (plus AQE artifacts); no SortMergeJoin anywhere.
    assert "SortMergeJoin" not in plan
