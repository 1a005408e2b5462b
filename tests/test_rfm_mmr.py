"""Contracts for RFM segmentation and MMR diversified reranking."""

import math
from collections import defaultdict

from big_data_stock_price_forecast_spark.plans.registry import (
    MMR_CAND_N,
    MMR_K,
    MMR_LAMBDA,
    MMR_NPROBE,
    RFM_BUCKETS,
    _emb,
    q_emb_mmr_rerank,
    q_orders_rfm_segments,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_rfm_cells_partition_customers(spark, sf_dir):
    out = q_orders_rfm_segments(spark, sf_dir).collect()
    assert out
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in out) == n_cust
    for r in out:
        for b in (r["r_bucket"], r["f_bucket"], r["m_bucket"]):
            assert 1 <= b <= RFM_BUCKETS
        assert r["cell_spend"] > 0


def test_rfm_bucket_sizes_follow_ntile_rule(spark, sf_dir):
    out = q_orders_rfm_segments(spark, sf_dir).collect()
    n = sum(r["n_customers"] for r in out)
    # ntile splits n into RFM_BUCKETS groups: n%B groups of n//B+1 then
    # groups of n//B — check the marginal distribution of r_bucket
    sizes = defaultdict(int)
    for r in out:
        sizes[r["r_bucket"]] += r["n_customers"]
    big, small = n // RFM_BUCKETS + 1, n // RFM_BUCKETS
    n_big = n % RFM_BUCKETS
    for b in range(1, RFM_BUCKETS + 1):
        assert sizes[b] == (big if b <= n_big else small)


def test_mmr_replays_python_greedy(spark, sf_dir):
    out = sorted(
        q_emb_mmr_rerank(spark, sf_dir).collect(),
        key=lambda r: (r["q_id"], r["rank"]),
    )
    assert out
    emb_rows = _emb(spark, sf_dir).collect()
    vecs = {r["vec_id"]: r["v"] for r in emb_rows}
    labels = {r["vec_id"]: r["label"] for r in emb_rows}

    def g(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    def l2(a, b):
        # sequential left fold then sqrt — dist_l2's numeric contract
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return math.sqrt(s)

    # replay the IVF candidate pool: per-label rounded-mean centroids,
    # nearest-centroid assignment, per-query nprobe lists, top-N simq
    dim = len(next(iter(vecs.values())))
    cents = {}
    for lbl in sorted(set(labels.values())):
        members = [vecs[i] for i in vecs if labels[i] == lbl]
        cents[lbl] = [
            g(sum(v[d] for v in members) / len(members)) for d in range(dim)
        ]
    assign = {
        i: min(cents, key=lambda c: (l2(vecs[i], cents[c]), c))
        for i in vecs
    }
    lam = MMR_LAMBDA
    expect = []
    for q_id in sorted(v for v in vecs if v % 100 == 0):
        qv = vecs[q_id]
        probed = sorted(cents, key=lambda c: (l2(qv, cents[c]), c))[
            :MMR_NPROBE
        ]
        pool = [
            d for d in vecs if d != q_id and assign[d] in probed
        ]
        pool_simq = {d: g(cos(vecs[d], qv)) for d in pool}
        top = sorted(pool, key=lambda d: (-pool_simq[d], d))[:MMR_CAND_N]
        simq = {d: pool_simq[d] for d in top}
        sel = []
        for rank in range(1, MMR_K + 1):
            best = None
            for d, sq in simq.items():
                if d in sel:
                    continue
                if rank == 1:
                    score = lam * sq
                else:
                    ms = max(g(cos(vecs[d], vecs[s])) for s in sel)
                    score = lam * sq - (1 - lam) * ms
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d, score)
            sel.append(best[1])
            expect.append((q_id, rank, best[1]))
    got = [(r["q_id"], r["rank"], r["vec_id"]) for r in out]
    assert got == expect
    # diversity: the MMR list never contains near-identical pairs
    # unless relevance dominates; scores are monotone within a query
    by_q = defaultdict(list)
    for r in out:
        by_q[r["q_id"]].append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert len({r["vec_id"] for r in rows}) == MMR_K


def test_abc_classes_partition_and_order(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_lineitem_abc_analysis,
    )

    out = {r["abc"]: r for r in
           q_lineitem_abc_analysis(spark, sf_dir).collect()}
    assert set(out) <= {"A", "B", "C"} and "A" in out
    n_parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in out.values()) == n_parts
    # A carries the bulk of revenue with the fewest parts per unit
    total = sum(r["class_revenue"] for r in out.values())
    assert out["A"]["class_revenue"] / total >= 0.75
    if "C" in out:
        a_pp = out["A"]["class_revenue"] / out["A"]["n_parts"]
        c_pp = out["C"]["class_revenue"] / out["C"]["n_parts"]
        assert a_pp > c_pp


def test_minhash_pr_eval_consistency(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_minhash_pr_eval,
    )

    r = q_doc_minhash_pr_eval(spark, sf_dir).collect()[0]
    assert r["tp"] >= 0 and r["fp"] >= 0 and r["fn"] >= 0
    assert abs(r["precision"] - r["tp"] / (r["tp"] + r["fp"])) < 1e-12
    assert abs(r["recall"] - r["tp"] / (r["tp"] + r["fn"])) < 1e-12
    # verification inside the LSH path makes precision exactly 1
    assert r["fp"] == 0 and r["precision"] == 1.0
    assert 0.0 < r["recall"] <= 1.0
