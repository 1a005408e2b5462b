"""Window->latent embedding (M7 stand-in) and IVF ANN contracts."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.embed import (
    dct_basis,
    embed_windows,
)
from big_data_stock_price_forecast_spark.operators.ivf import (
    assign_lists,
    ivf_ann_topk,
    label_centroids,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_dct_basis_is_orthonormal():
    b = dct_basis(16, 6)
    np.testing.assert_allclose(b @ b.T, np.eye(6), atol=1e-12)


def test_embed_windows_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = [
        (s, i, [float(v) for v in rng.normal(0, 1, 8)])
        for s in range(2)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "symbol int, window_id int, xs array<double>"
    )
    out = {
        (r["symbol"], r["window_id"]): np.array(r["emb"])
        for r in embed_windows(df, L=8, k=4).collect()
    }
    basis_t = dct_basis(8, 4).T
    for s, i, xs in rows:
        np.testing.assert_allclose(
            out[(s, i)], np.array(xs) @ basis_t, atol=1e-12
        )


def _emb(spark):
    return load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def test_ivf_assignment_covers_corpus_once(spark):
    emb = _emb(spark)
    assigned = assign_lists(emb, label_centroids(emb))
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    n_lists = assigned.select("list_id").distinct().count()
    assert 1 < n_lists <= emb.select("label").distinct().count()


def test_ivf_topk_is_exact_within_probed_lists(spark):
    """IVF results must equal brute force restricted to probed lists:
    ranks contiguous from 1, distances ascending, and every result's
    list among the query's probes."""
    emb = _emb(spark)
    out = ivf_ann_topk(emb, query_mod=97, k=5, nprobe=2).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    centroids = label_centroids(emb)
    vecs = {r["vec_id"]: np.array(r["v"]) for r in emb.collect()}
    assigned = {
        r["vec_id"]: r["list_id"]
        for r in assign_lists(emb, centroids).collect()
    }
    cents = {r["label"]: np.array(r["cvec"]) for r in centroids.collect()}
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r["dist"] for r in rows]
        assert dists == sorted(dists)
        # the query's actual nprobe=2 nearest centroids
        probed = set(
            sorted(
                cents,
                key=lambda lb: (
                    float(np.sqrt(((cents[lb] - vecs[q_id]) ** 2).sum())),
                    lb,
                ),
            )[:2]
        )
        assert {r["list_id"] for r in rows} <= probed
        # top-k must be the exact brute-force top-k of the probed union
        in_lists = [
            v for v, lid in assigned.items() if lid in probed and v != q_id
        ]
        brute = sorted(
            in_lists,
            key=lambda v: (
                float(np.sqrt(((vecs[v] - vecs[q_id]) ** 2).sum())),
                v,
            ),
        )[: len(rows)]
        assert [r["vec_id"] for r in rows] == brute
        for r in rows:
            expect = float(np.sqrt(((vecs[r["vec_id"]] - vecs[q_id]) ** 2).sum()))
            assert abs(r["dist"] - expect) < 1e-6


def test_ivf_layout_probe_matches_inmemory_and_prunes(spark, tmp_path):
    """The persisted bucket-by-list layout must return the same top-k
    as the in-memory IVF path, and the probe's scan of the lists table
    must carry a dynamic partition-pruning filter on list_id — only
    probed list directories are read."""
    from big_data_stock_price_forecast_spark.operators.ivf import (
        ivf_probe_layout,
        write_ivf_layout,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    path = str(tmp_path / "ivf")
    write_ivf_layout(emb, path)

    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    via_layout = ivf_probe_layout(spark, path, queries, k=3, nprobe=2)
    got = {
        (r["q_id"], r["vec_id"], r["rank"], r["list_id"])
        for r in via_layout.collect()
    }
    want = {
        (r["q_id"], r["vec_id"], r["rank"], r["list_id"])
        for r in ivf_ann_topk(emb, query_mod=50, k=3, nprobe=2).collect()
    }
    assert got == want and got

    plan = (
        via_layout._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_ivf_stream_layout_probe_prunes(spark, tmp_path):
    """The streaming-growable layout adds a batch= partition level;
    the candidate probe's scan must STILL carry the dynamic
    partition-pruning filter on list_id — the stream's per-batch cost
    contract (read only probed list dirs, never O(corpus)) depends on
    it."""
    from big_data_stock_price_forecast_spark.operators.ivf import (
        ivf_probe_candidates,
        ivf_query_probes,
        write_ivf_stream_layout,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    path = str(tmp_path / "ivfs")
    write_ivf_stream_layout(emb, path)
    cent = spark.read.parquet(path + "/centroids")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cands = ivf_probe_candidates(
        spark, path, ivf_query_probes(cent, queries, 2)
    )
    assert cands.count() > 0
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
