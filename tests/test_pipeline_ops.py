"""Contracts for the training-data pipeline operators added in round 6:
PII/denylist scrub, deterministic shard assignment, language-mixture
rebalancing, concat-and-chunk sequence packing, normalization-aware
exact dedup, and the Q13/Q22-shaped join aggregates.

Each contract checks the operator's algebraic invariants against a
Python reference on crafted rows — the registry oracle already pins the
full-table result against DuckDB, so these focus on edge semantics."""

import hashlib
import re

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.text import (
    SCRUB_RULES,
    hash60,
    scrub_col,
    scrub_counts,
)
from big_data_stock_price_forecast_spark.plans.registry import (
    MIX_PPM,
    N_DOC_SHARDS,
    PACK_BUDGET,
    PACK_SHARDS,
    q_doc_lang_mixture_sample,
    q_doc_pack_sequences,
    q_doc_shard_assign,
    q_tpch_q13_custdist,
    q_tpch_q22_idle_balances,
)


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_scrub_rules_match_python_reference(spark):
    texts = [
        "mail bob@x-mail.co.uk and ALICE@SITE.ORG now",
        "call 555-123-4567 or ping 10.0.0.1 twice 10.0.0.2",
        "the customer bought a vector of customers",
        "nothing sensitive here",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    cnt = scrub_counts(F.col("text"))
    rows = df.select(
        "text",
        scrub_col(F.col("text")).alias("scrubbed"),
        *[c.alias(name) for name, c in cnt.items()],
    ).collect()
    for r in rows:
        expect = r["text"]
        for name, pat, rep in SCRUB_RULES:
            assert r[name] == len(re.findall(pat, r["text"])), (name, r["text"])
            expect = re.sub(pat, rep, expect)
        assert r["scrubbed"] == expect


def test_scrub_replacement_is_fixed_point(spark):
    # scrubbed text must not re-match any rule (replacement tokens are
    # inert) — scrubbing twice equals scrubbing once
    df = spark.createDataFrame(
        [("a@b.io 1.2.3.4 555-123-4567 customer vector",)], ["text"]
    )
    once = df.select(scrub_col(F.col("text")).alias("t"))
    twice = once.select(scrub_col(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()


def test_shard_assign_partitions_and_positions(spark, sf_dir):
    out = q_doc_shard_assign(spark, sf_dir).collect()
    assert all(0 <= r["shard_id"] < N_DOC_SHARDS for r in out)
    # expected shard from the python hash reference
    for r in out[:50]:
        assert r["shard_id"] == _py_h60(str(r["doc_id"])) % N_DOC_SHARDS
    # positions are a contiguous 1..n ranking inside each shard
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: a second run yields the identical assignment
    again = q_doc_shard_assign(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_lang_mixture_downsamples_to_rarest(spark, sf_dir):
    rows = {r["lang"]: r for r in q_doc_lang_mixture_sample(spark, sf_dir).collect()}
    n_min = min(r["n_total"] for r in rows.values())
    for r in rows.values():
        assert r["n_kept"] <= r["n_total"]
        assert r["keep_ppm"] == MIX_PPM * n_min // r["n_total"]
        if r["n_total"] == n_min:
            # rarest language: rate is exactly 1.0 -> keeps everything
            assert r["keep_ppm"] == MIX_PPM
            assert r["n_kept"] == r["n_total"]


def test_pack_sequences_conserves_tokens_and_orders_packs(spark, sf_dir):
    from big_data_stock_price_forecast_spark.functions.text import tokens
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = q_doc_pack_sequences(spark, sf_dir).collect()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
        .collect()
    )
    total = sum(r["n_tok"] for r in docs)
    assert sum(r["n_tokens"] for r in out) == total
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert set(by_shard) <= set(range(PACK_SHARDS))
    for packs in by_shard.values():
        packs.sort(key=lambda r: r["pack_id"])
        # pack ids are contiguous from 0 and doc ranges never interleave
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        for a, b in zip(packs, packs[1:]):
            assert a["last_doc_id"] < b["first_doc_id"]
        # every pack but the last starts before the budget boundary of
        # the next: cumulative starts reproduce the python packing
        offset = 0
        for p in packs:
            assert offset // PACK_BUDGET == p["pack_id"]
            offset += p["n_tokens"]


def test_q13_distribution_accounts_every_customer(spark, sf_dir):
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = q_tpch_q13_custdist(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in out) == n_cust
    assert all(r["c_count"] >= 0 and r["custdist"] >= 1 for r in out)


def test_q22_idle_subset_of_high_balance(spark, sf_dir):
    out = q_tpch_q22_idle_balances(spark, sf_dir).collect()
    assert out, "high-balance rollup must be non-empty"
    for r in out:
        assert 0 <= r["n_idle"] <= r["n_custs"]
        assert r["total_acctbal"] > 0


def test_q7_directions_and_positive_revenue(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_tpch_q7_nation_volume,
    )

    out = q_tpch_q7_nation_volume(spark, sf_dir).collect()
    assert out
    dirs = {(r["supp_nation"], r["cust_nation"]) for r in out}
    assert all(a != b for a, b in dirs)
    assert all(r["revenue"] > 0 and r["n_lineitems"] > 0 for r in out)


def test_q8_share_bounded_by_total(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_tpch_q8_market_share,
    )

    out = q_tpch_q8_market_share(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["nation_volume"] <= r["total_volume"]


def test_q15_returns_the_actual_max(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        Q15_END,
        Q15_START,
        q_tpch_q15_top_supplier,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = q_tpch_q15_top_supplier(spark, sf_dir).collect()
    assert len(out) >= 1
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(3,2)")
                    - F.col("l_discount").cast("decimal(3,2)")
                )
            ).alias("rev")
        )
        .agg(F.max(F.col("rev").cast("double")))
        .first()[0]
    )
    assert all(abs(r["total_revenue"] - best) < 1e-6 for r in out)


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    from big_data_stock_price_forecast_spark.operators.dedup import MH_PERMS
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_minhash_est_error,
    )

    out = q_doc_minhash_est_error(spark, sf_dir).collect()
    assert out, "sf0.001 corpus has near-dup candidates"
    for r in out:
        assert 0 <= r["n_eq"] <= MH_PERMS
        assert abs(r["jac_est"] - r["n_eq"] / MH_PERMS) < 1e-12
        assert abs(abs(r["jac_est"] - r["jac_exact"]) - r["abs_err"]) < 1e-6
    mean_err = sum(r["abs_err"] for r in out) / len(out)
    assert mean_err < 0.15, f"sketch error implausibly high: {mean_err}"


def test_dedup_decisions_cover_corpus_one_kept_per_cluster(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_dedup_decisions,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = q_doc_dedup_decisions(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        kept = [r for r in rows if r["is_kept"] == 1]
        # min-id canonical: exactly the cluster_id doc is kept
        assert len(kept) == 1 and kept[0]["doc_id"] == cid
    assert all(
        r["reason"] in ("kept", "exact_dup", "near_dup") for r in out
    )


def test_pq_codes_shape_and_error_bounds(spark, sf_dir):
    import math

    from big_data_stock_price_forecast_spark.plans.registry import (
        PQ_M,
        _emb,
        q_emb_pq_codes,
    )

    out = {r["vec_id"]: r for r in q_emb_pq_codes(spark, sf_dir).collect()}
    emb = {r["vec_id"]: r["v"] for r in _emb(spark, sf_dir).collect()}
    assert set(out) == set(emb)
    for vid, r in out.items():
        # codes is a '-'-joined string (atomic output-schema contract)
        parts = r["codes"].split("-")
        assert len(parts) == PQ_M
        assert all(p.isdigit() for p in parts)
        assert r["recon_err"] >= 0.0
        # quantizing to the nearest codeword can never be worse than
        # the zero vector codeword bound: ||v - c|| <= ||v|| + max||c||
        norm = math.sqrt(sum(x * x for x in emb[vid]))
        assert r["recon_err"] < 4 * (norm + 1.0)


def test_cube_margins_are_consistent(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import q_events_cube

    rows = q_events_cube(spark, sf_dir).collect()
    cells = [r for r in rows if r["gid"] == 0]
    total = [r for r in rows if r["gid"] == 3]
    by_type = [r for r in rows if r["gid"] == 1]  # dow rolled up
    by_dow = [r for r in rows if r["gid"] == 2]   # event_type rolled up
    assert len(total) == 1
    assert total[0]["event_type"] is None and total[0]["dow"] is None
    n_cells = sum(r["n_events"] for r in cells)
    assert n_cells == total[0]["n_events"]
    assert sum(r["n_events"] for r in by_type) == total[0]["n_events"]
    assert sum(r["n_events"] for r in by_dow) == total[0]["n_events"]
    # margin value sums reconcile exactly (DECIMAL-backed)
    assert abs(sum(r["value_sum"] for r in cells) - total[0]["value_sum"]) < 1e-6


def test_range_window_matches_python_replay(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        RANGE_WIN_S,
        q_ts_range_window_avg,
    )

    out = q_ts_range_window_avg(spark, sf_dir).collect()
    by_symbol: dict = {}
    for r in out:
        by_symbol.setdefault(r["symbol"], []).append(r)
    some = 0
    for sym, rows in list(by_symbol.items())[:3]:
        rows.sort(key=lambda r: r["ts"])
        epochs = [int(r["ts"].timestamp()) for r in rows]
        for i, r in enumerate(rows):
            lo = epochs[i] - RANGE_WIN_S
            n = sum(1 for e in epochs if lo <= e <= epochs[i])
            assert r["n_6h"] == n
            some += 1
    assert some > 0
    # variable frame width is the point: at least one row must differ
    widths = {r["n_6h"] for r in out}
    assert len(widths) > 1


def test_dq_suite_reports_known_clean_table(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_dq_suite,
    )

    rows = {r["check_name"]: r for r in q_events_dq_suite(spark, sf_dir).collect()}
    assert set(rows) == {
        "unique_event_id", "ts_complete", "value_nonnegative",
        "event_type_in_domain", "user_id_positive",
    }
    for r in rows.values():
        assert (r["violations"] == 0) == (r["passed"] == 1)
    # the synthetic events table is clean on id uniqueness and ts
    assert rows["unique_event_id"]["passed"] == 1
    assert rows["ts_complete"]["passed"] == 1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q19_pushes_each_sides_disjunction_to_its_scan(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_tpch_q19_disjunctive,
    )

    plan = q_tpch_q19_disjunctive(spark, sf_dir)._jdf.queryExecution()
    s = plan.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    # the quantity-only disjunction reaches the lineitem scan and the
    # brand/size-only disjunction reaches the part scan (constraint
    # propagation) — neither scan reads rows no arm could match
    li_scans = [
        l for l in s.splitlines() if "FileScan" in l and "l_quantity" in l
    ]
    assert li_scans and "l_quantity" in li_scans[0].split("DataFilters")[-1]
    p_scans = [
        l for l in s.splitlines() if "FileScan" in l and "p_brand" in l
    ]
    assert p_scans and "p_brand" in p_scans[0].split("DataFilters")[-1]


def test_shard_assign_is_one_exchange_and_pruned_scan(spark, sf_dir):
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_doc_shard_assign,
    )

    df = q_doc_shard_assign(spark, sf_dir)
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert s.count("Exchange") == 1, s
    # column pruning: the scan reads only doc_id
    scan = [l for l in s.splitlines() if "FileScan" in l][0]
    assert "struct<doc_id:bigint>" in scan


def test_search_and_requires_every_term(spark, sf_dir):
    from big_data_stock_price_forecast_spark.functions.text import tokens
    from big_data_stock_price_forecast_spark.plans.registry import (
        SEARCH_TERMS,
        q_doc_search_and,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in q_doc_search_and(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).collect()
    for d in docs:
        toks = d["tok"]
        tfs = {t: toks.count(t) for t in SEARCH_TERMS}
        if all(v > 0 for v in tfs.values()):
            r = out[d["doc_id"]]
            for t in SEARCH_TERMS:
                assert r[f"tf_{t}"] == tfs[t]
            assert r["score"] == sum(tfs.values())
        else:
            assert d["doc_id"] not in out


def test_kmeans_refine_covers_corpus_and_reduces_inertia(spark, sf_dir):
    from big_data_stock_price_forecast_spark.operators.ivf import (
        assign_lists,
        label_centroids,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        _emb,
        q_emb_kmeans_refine,
    )

    out = q_emb_kmeans_refine(spark, sf_dir).collect()
    emb = _emb(spark, sf_dir)
    assert sum(r["n_members"] for r in out) == emb.count()
    assert all(r["inertia"] >= 0 for r in out)
    # Lloyd's monotonicity: total inertia after the refinement step is
    # no worse than assigning against the seed centroids
    from pyspark.sql import functions as SF
    from big_data_stock_price_forecast_spark.functions.distance import dist_l2

    cent0 = label_centroids(emb)
    a0 = assign_lists(emb, cent0)
    d0 = (
        a0.join(
            SF.broadcast(
                cent0.select(SF.col("label").alias("list_id"), "cvec")
            ),
            "list_id",
        )
        .select(dist_l2(SF.col("v"), SF.col("cvec")).alias("d"))
        .agg(SF.sum("d"))
        .first()[0]
    )
    assert sum(r["inertia"] for r in out) <= d0 + 1e-6


def test_augmentation_is_deterministic_and_hash_keyed(spark, sf_dir):
    import hashlib
    import re

    from big_data_stock_price_forecast_spark.functions.text import (
        TOKEN_SPLIT_RE,
    )
    from big_data_stock_price_forecast_spark.plans.registry import (
        DROPOUT_KEEP_MOD,
        SPAN_LEN,
        SPAN_MASK_MOD,
        q_doc_augment_stats,
    )
    from big_data_stock_price_forecast_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in
           q_doc_augment_stats(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for d in docs[:40]:
        toks = [
            t for t in re.split(TOKEN_SPLIT_RE, d["text"].lower()) if t
        ]
        kept, corrupted, n_masked = [], [], 0
        for p, t in enumerate(toks):
            if h60(f"{d['doc_id']}|{p}") % DROPOUT_KEEP_MOD < (
                DROPOUT_KEEP_MOD - 1
            ):
                kept.append(t)
            if h60(f"{d['doc_id']}#{p // SPAN_LEN}") % SPAN_MASK_MOD == 0:
                corrupted.append("<X>")
                n_masked += 1
            else:
                corrupted.append(t)
        r = out[d["doc_id"]]
        assert r["n_tok"] == len(toks)
        assert r["n_kept"] == len(kept)
        assert r["n_masked"] == n_masked
        assert r["dropout_md5"] == hashlib.md5(
            " ".join(kept).encode()
        ).hexdigest()
        assert r["corrupt_md5"] == hashlib.md5(
            " ".join(corrupted).encode()
        ).hexdigest()
    # augmentation drops roughly 1/10 and masks roughly 1/5 overall
    n_tok = sum(r["n_tok"] for r in out.values())
    n_kept = sum(r["n_kept"] for r in out.values())
    n_masked = sum(r["n_masked"] for r in out.values())
    assert 0.85 <= n_kept / n_tok <= 0.95
    assert 0.1 <= n_masked / n_tok <= 0.3
