"""Contracts for PQ-ADC search and the lateness/partition audits."""

from collections import defaultdict

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.plans.registry import (
    PARTITION_MIN_ROWS,
    PQ_ADC_K,
    q_emb_pq_adc_topk,
    q_events_lateness_audit,
    q_events_partition_audit,
)
from big_data_stock_price_forecast_spark.sources.tables import load_table


def test_pq_adc_ranks_are_contiguous_and_error_measured(spark, sf_dir):
    out = q_emb_pq_adc_topk(spark, sf_dir).collect()
    assert out
    by_q = defaultdict(list)
    for r in out:
        by_q[r["q_id"]].append(r)
        assert r["adc_dist"] >= 0 and r["l2_dist"] >= 0
        assert r["vec_id"] != r["q_id"]
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, PQ_ADC_K + 1))
        # approximate distances are nondecreasing in rank
        adcs = [r["adc_dist"] for r in rows]
        assert adcs == sorted(adcs)


def test_pq_adc_is_a_reasonable_approximation(spark, sf_dir):
    # the quantizer is coarse (label-mean codebooks), but the ADC
    # distance must correlate with the true distance: on average the
    # reported neighbors must beat the dataset's typical pairwise
    # distance (data-relative — no magic constant)
    import statistics

    from big_data_stock_price_forecast_spark.plans.registry import _emb

    out = q_emb_pq_adc_topk(spark, sf_dir).collect()
    mean_l2 = statistics.mean(r["l2_dist"] for r in out)
    rows = _emb(spark, sf_dir).limit(60).collect()
    typical = statistics.mean(
        sum((a - b) ** 2 for a, b in zip(rows[i]["v"], rows[j]["v"]))
        ** 0.5
        for i in range(20)
        for j in range(20, 40)
    )
    assert mean_l2 < typical


def test_lateness_audit_replays_running_max(spark, sf_dir):
    out = {r["user_id"]: r for r in
           q_events_lateness_audit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    for user, rows in list(by_user.items())[:40]:
        rows.sort(key=lambda r: r["event_id"])
        run = None
        inv = 0
        max_late = 0
        for r in rows:
            t = r["ts"]
            if run is not None and t < run:
                inv += 1
                max_late = max(
                    max_late, int((run - t).total_seconds() * 1e6)
                )
            run = t if run is None else max(run, t)
        got = out[user]
        assert got["n_events"] == len(rows)
        assert got["n_inversions"] == inv
        assert got["max_late_us"] == max_late


def test_partition_audit_covers_the_full_range(spark, sf_dir):
    out = sorted(
        q_events_partition_audit(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert out
    # contiguous day grid
    days = [r["day"] for r in out]
    assert (days[-1] - days[0]).days + 1 == len(days)
    n_total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in out) == n_total
    for r in out:
        if r["n_rows"] == 0:
            assert r["status"] == "missing"
        elif r["n_rows"] < PARTITION_MIN_ROWS:
            assert r["status"] == "thin"
        else:
            assert r["status"] == "ok"


def test_join_size_estimate_bounds_exact_from_above(spark, sf_dir):
    from collections import Counter

    from big_data_stock_price_forecast_spark.plans.registry import (
        q_events_join_size_estimate,
    )

    r = q_events_join_size_estimate(spark, sf_dir).collect()[0]
    cnt = Counter(
        row["user_id"]
        for row in load_table(spark, sf_dir, "events")
        .select("user_id")
        .collect()
    )
    exact = sum(c * c for c in cnt.values())
    assert r["exact_size"] == exact
    # CMS inner product overestimates (hash collisions only add mass)
    assert r["est_size"] >= r["exact_size"]
    assert r["overestimate"] >= 1.0


def test_psi_is_zero_for_identical_halves_and_replays(spark, sf_dir):
    import math
    from collections import defaultdict

    from big_data_stock_price_forecast_spark.plans.registry import (
        PSI_SPLIT_TS,
        q_events_psi_drift,
    )

    out = {r["event_type"]: r for r in
           q_events_psi_drift(spark, sf_dir).collect()}
    assert out
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    from datetime import datetime

    split = datetime.fromisoformat(PSI_SPLIT_TS)
    bins = defaultdict(lambda: [0, 0])
    for r in ev:
        h = 0 if r["ts"] < split else 1
        bins[(r["event_type"], math.floor(r["value"] / 10))][h] += 1
    per_type = defaultdict(dict)
    for (t, b), (n1, n2) in bins.items():
        per_type[t][b] = (n1, n2)
    for t, bmap in per_type.items():
        t1 = sum(v[0] for v in bmap.values())
        t2 = sum(v[1] for v in bmap.values())
        nb = len(bmap)
        psi = 0.0
        for n1, n2 in bmap.values():
            p1 = (n1 + 1) / (t1 + nb)
            p2 = (n2 + 1) / (t2 + nb)
            term = (p2 - p1) * math.log(p2 / p1)
            psi += math.floor(term * 1e6 + 0.5) / 1e6
        r = out[t]
        assert r["n_first_half"] == t1 and r["n_second_half"] == t2
        assert abs(r["psi"] - psi) < 2e-6
        assert r["psi"] >= 0.0 or abs(r["psi"]) < 1e-3
