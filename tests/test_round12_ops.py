"""Round-12 contracts: ADVICE r11 closures (prebuilt-quantizer IVF
entry point, affine_scan overflow guard) plus tests for the round's
new operators (added below as batches land)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.ivf import (
    assign_lists,
    ivf_ann_topk,
    ivf_topk_from_assigned,
    label_centroids,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )


def test_ivf_topk_from_assigned_prebuilt_matches(spark):
    """ADVICE r11: the prebuilt-quantizer entry point must produce the
    same answer as the self-building ivf_ann_topk when handed a
    pre-built (and localCheckpointed — the checkpointed-input path the
    docstring advertises) assigned/centroids pair."""
    emb = _emb(spark)
    centroids = label_centroids(emb).localCheckpoint(eager=True)
    assigned = assign_lists(emb, centroids).localCheckpoint(eager=True)
    got = sorted(
        (r["q_id"], r["vec_id"], r["rank"], r["dist"], r["list_id"])
        for r in ivf_topk_from_assigned(
            assigned, centroids, query_mod=97, k=5, nprobe=2
        ).collect()
    )
    want = sorted(
        (r["q_id"], r["vec_id"], r["rank"], r["dist"], r["list_id"])
        for r in ivf_ann_topk(emb, query_mod=97, k=5, nprobe=2).collect()
    )
    assert got and got == want


def test_affine_scan_overflow_guard_raises(spark):
    """ADVICE r11: |b|*term_scale beyond long range must fail loudly
    (floor(double) returns LONG — silent wraparound otherwise), and
    the guard must not disturb the valid path."""
    from big_data_stock_price_forecast_spark.operators.twophase import (
        affine_ema_scan,
    )

    big = spark.createDataFrame(
        [(1, i, 1.0e10) for i in range(4)],
        "symbol int, time_idx int, close double",
    )
    with pytest.raises(Exception, match="term_scale"):
        affine_ema_scan(
            big, "close", "symbol", "time_idx", alpha=0.5
        ).collect()
    # same series under a lowered scale stays on the valid path
    ok = affine_ema_scan(
        big, "close", "symbol", "time_idx", alpha=0.5, term_scale=1e6
    ).collect()
    assert len(ok) == 1 and abs(ok[0]["ema_last"] - 1.0e10) < 1.0


def test_doc_bpe_merges_matches_python_replay(spark):
    """k=5 BPE merge rounds replayed in plain python (Counter pair
    stats + left-to-right non-overlapping merge — Sennrich learn_bpe
    semantics) must reproduce the engine's learned merge table
    exactly, including the (weight desc, lhs asc, rhs asc) argmax
    tie-break."""
    import collections
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_bpe_merges,
    )

    cnt: collections.Counter = collections.Counter()
    for r in load_table(spark, SF, "documents").select("text").collect():
        for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()):
            if t:
                cnt[t] += 1
    vocab = {tuple(w): c for w, c in cnt.items()}
    want = []
    for rnd in range(1, 6):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (a, b), wgt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rnd, a, b, wgt))
        new: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + c
        vocab = new
    got = [
        (r["round"], r["lhs"], r["rhs"], r["weight"])
        for r in q_doc_bpe_merges(spark, SF).orderBy("round").collect()
    ]
    assert got == want
