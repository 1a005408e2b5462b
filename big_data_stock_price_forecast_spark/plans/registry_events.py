"""Event-analytics query domain (events table).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    ASSOC_MIN_USERS,
    ATTRIB_TOUCHES,
    BOOT_B,
    BOT_MIN_GAPS,
    BOT_REGULARITY_TAU,
    DECILE_PS,
    DQ_EVENT_TYPES,
    DataFrame,
    F,
    HQ_QUANTILES,
    K_ANON_THRESHOLD,
    LIFESPAN_BOUNDS,
    MW_MIN_GROUP,
    PARTITION_MIN_ROWS,
    PATH_TOP_N,
    PSI_SPLIT_TS,
    RANGE_JOIN_HORIZON_US,
    RET_DECAY_MAX_K,
    SCD2_TIER_DIV,
    SKEW_TOP_K,
    STRATA_DENOMS,
    SparkSession,
    Window,
    ZORDER_BITS,
    _BOOT_POIS_CDF,
    _r6,
    _r6e,
    _rne,
    _sql_r6,
    _sql_r6_wrap,
    _sql_rne,
    hash60,
    load_table,
    math,
    require_utc,
    sql_hash60,
    weekday_mon0,
)



def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution: how many sessions have N events,
    with total duration per bucket — the report downstream of the
    sessionize operator (same single-exchange lineage plus one more
    aggregate)."""
    s = q_events_sessionize(spark, sf_dir)
    return s.groupBy("n_events").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("duration_sec").alias("total_duration_sec"),
    )


def _sql_events_session_stats() -> str:
    # lazy: SQL_EVENTS_SESSIONS is defined later in the module
    return f"""
SELECT n_events, count(*) AS n_sessions,
       CAST(sum(duration_sec) AS BIGINT) AS total_duration_sec
FROM ({SQL_EVENTS_SESSIONS})
GROUP BY 1"""


def q_events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 temporal-dimension build (gaps-and-islands): each user's
    signup events define a tier; consecutive same-tier signups
    collapse and each island becomes a validity interval
    [valid_from, valid_to) with an is_current flag — the
    slowly-changing-dimension type-2 table every warehouse maintains.
    Plan: ONE shuffle on user_id reused by all three windows (dedup
    row_number, change-detect lag, interval-close lead) — Catalyst
    collapses same-partitioning windows into one sort, no second
    exchange. At 100 TB this is a single keyed sort per user
    partition; the dimension output is tiny relative to the event
    scan."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(f"CAST(floor(value / {SCD2_TIER_DIV}) AS INT)").alias("tier"),
    )
    # dedup WITHOUT a (user_id, ts) exchange: ordered (ts, event_id
    # DESC) per user, the first row of each ts-run is the max-event_id
    # keeper — same user_id partitioning as the windows below, so the
    # whole query rides one exchange
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").desc()
    )
    dedup = (
        s.withColumn("prev_ts", F.lag("ts").over(wd))
        .filter(F.col("prev_ts").isNull() | (F.col("prev_ts") != F.col("ts")))
        .drop("prev_ts")
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = dedup.withColumn(
        "prev_tier", F.lag("tier").over(wu)
    ).filter(
        F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier"))
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        F.col("user_id").alias("symbol"),
        "tier",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.lead("ts").over(wv).isNull().alias("is_current"),
    )


SQL_EVENTS_SCD2 = f"""
WITH s AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value / {SCD2_TIER_DIV}) AS INT) AS tier,
         row_number() OVER (PARTITION BY user_id, ts
           ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
),
d AS (SELECT user_id, ts, event_id, tier FROM s WHERE rn = 1),
c AS (
  SELECT *, lag(tier) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_tier
  FROM d
),
isl AS (
  SELECT user_id, ts, event_id, tier FROM c
  WHERE prev_tier IS NULL OR prev_tier <> tier
)
SELECT user_id AS symbol, tier, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM isl
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


# --------------------------------------------------------------------------
# semi-structured: JSON props on the events stream
# --------------------------------------------------------------------------


def q_events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a JSON property and aggregate by (event_type, decile
    bucket). Average emitted as integer MICRO-units (``k_avg_micros``
    BIGINT), not a rounded double: the per-group sum/count are exact
    integers, the single division + floor is deterministic IEEE-754, and
    an integer column hashes identically under any harness
    canonicalization (rounds 1-2 validated the rounded-double variant
    bitwise-exact locally at every SF while the driver's float hash
    still differed — integers take that variable off the table).

    Root cause of the rounds 1-4 hash mismatch, finally identified:
    DuckDB's ``sum(BIGINT)`` returns HUGEINT (int128), which a
    pandas-based harness converts to float64 (``12740.0``) while Spark
    emits int64 (``12740``) — value-equal, repr/dtype-unequal. The
    oracle now CASTs the sum back to BIGINT so both engines hand the
    harness an int64 column."""
    ev = load_table(spark, sf_dir, "events")
    # string-extraction then strict BIGINT cast on BOTH engines (no JSON
    # intermediate type)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") - F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
        )
        .withColumn(
            "k_avg_micros",
            F.floor(
                F.col("k_sum").cast("double") / F.col("n") * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type, k - k % 10 AS k_bucket, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(floor((sum(k)::DOUBLE / count(*)) * 1000000.0 + 0.5) AS BIGINT)
         AS k_avg_micros
FROM (SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k FROM events)
GROUP BY 1, 2"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event 1-hour lookahead density: for every event, how many
    SAME-USER events land in (ts, ts + 1h] — the range-join operator
    (operators/rangejoin.py) driving a burst/velocity feature. The
    bucketized equi-join replaces the theta-join a naive translation
    would produce; events with an empty window keep a zero via the
    left join back to the base."""
    from ..operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    base = ev.select(
        "user_id", "event_id", F.unix_micros(ts).alias("__lts")
    )
    right = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("__rid"),
        F.unix_micros(ts).alias("__rts"),
    )
    counts = (
        range_join(base, right, ["user_id"], RANGE_JOIN_HORIZON_US)
        .groupBy("user_id", "event_id")
        .agg(F.count(F.lit(1)).alias("n_next_1h"))
    )
    return base.select("user_id", "event_id").join(
        counts, ["user_id", "event_id"], "left"
    ).select(
        "user_id",
        "event_id",
        F.coalesce("n_next_1h", F.lit(0)).alias("n_next_1h"),
    )


SQL_EVENTS_RANGE_JOIN = f"""
SELECT a.user_id, a.event_id, count(b.event_id) AS n_next_1h
FROM events a LEFT JOIN events b
  ON b.user_id = a.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + {RANGE_JOIN_HORIZON_US}
GROUP BY 1, 2"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity splits a session) —
    the canonical large-scale event-pipeline operator. One shuffle
    total: the lag window, the cumulative session counter, and the
    final per-session aggregate all cluster on user_id, so Catalyst
    reuses a single hash exchange (HashPartitioning(user_id) satisfies
    the (user_id, session_no) clustering requirement).

    Timestamps are NTZ in the lake; the gap arithmetic casts through
    LTZ under a UTC-pinned session so unix_micros is exact (same
    contract as q_ts_delta_hist)."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    s = (
        ev.withColumn("__m", F.unix_micros(ts))
        .withColumn("__new", is_new)
        .withColumn("session_no", F.sum("__new").over(wc))
    )
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.expr("(max(__m) - min(__m)) div 1000000").alias("duration_sec"),
    )


# windowed sum(int) is HUGEINT in DuckDB -> CAST to BIGINT so the
# session key hashes as int64 on both engines (the events_json_agg
# lesson); integer floor-division on both sides for the duration
SQL_EVENTS_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS m,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, m,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM o
)
SELECT user_id, session_no, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       (max(m) - min(m)) // 1000000 AS duration_sec
FROM s GROUP BY 1, 2"""


def q_events_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample (~5%) via the portable
    md5-based hash60 on the event key — reproducible across engines,
    runs, partitionings, and cluster sizes, which is the property a
    training-data sampling stage needs (rand()-based sampling is none
    of those). The filter is a pure JVM expression evaluated at the
    scan, so at 100 TB the sample never materializes the full table
    past the filter; per-stratum stats aggregate with map-side combine.
    Money-style DECIMAL sum keeps the per-group total order-independent
    and bitwise (the tpch_q1 pattern)."""
    from ..functions.text import hash60

    ev = load_table(spark, sf_dir, "events")
    sampled = ev.filter(hash60(F.col("event_id").cast("string")) % 20 == 0)
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def _sql_events_hash_sample() -> str:
    from ..functions.text import sql_hash60

    h = sql_hash60("CAST(event_id AS VARCHAR)")
    return f"""
SELECT event_type, count(*) AS n_sampled,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       min(event_id) AS min_event_id, max(event_id) AS max_event_id
FROM events
WHERE {h} % 20 = 0
GROUP BY 1"""


def q_events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: a per-stratum rate table
    drives a Bernoulli keep-decision computed from the portable
    ``hash60`` of the row key — reproducible across engines, runs, and
    partitionings, unlike ``rand()``/``sample()``. The rate table is a
    BROADCAST dim (here 5 rows; the same plan carries thousands of
    strata), so the keep-filter evaluates streaming at the scan with
    no shuffle before the filter; at 100 TB only the sampled fraction
    survives into the aggregate. One conditional-aggregation pass
    emits sampled and total counts together (no second scan), so the
    achieved rate is measured beside the configured one."""
    ev = load_table(spark, sf_dir, "events")
    rates = spark.createDataFrame(
        [(t, d) for t, d in STRATA_DENOMS.items()],
        ["event_type", "denom"],
    )
    keep = hash60(F.col("event_id").cast("string")) % F.col("denom") == 0
    return (
        ev.join(F.broadcast(rates), "event_type")
        .withColumn("__keep", keep)
        .groupBy("event_type", "denom")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("__keep").cast("bigint")).alias("n_sampled"),
            F.round(
                F.sum(F.col("__keep").cast("bigint"))
                / F.count(F.lit(1)),
                6,
            ).alias("rate_achieved"),
            F.sum(
                F.when(F.col("__keep"), F.col("value"))
                .otherwise(F.lit(None))
                .cast("decimal(18,2)")
            )
            .cast("double")
            .alias("value_sum"),
            F.min(F.when(F.col("__keep"), F.col("event_id"))).alias(
                "min_event_id"
            ),
        )
    )


def _sql_events_stratified_sample() -> str:
    from ..functions.text import sql_hash60

    h = sql_hash60("CAST(event_id AS VARCHAR)")
    vals = ", ".join(
        f"('{t}', {d})" for t, d in STRATA_DENOMS.items()
    )
    return f"""
WITH rates(event_type, denom) AS (VALUES {vals}),
tagged AS (
  SELECT e.event_type, r.denom, e.event_id, e.value,
         {h} % r.denom = 0 AS keep
  FROM events e JOIN rates r USING (event_type)
)
SELECT event_type, denom, count(*) AS n_total,
       CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS n_sampled,
       round(sum(CAST(keep AS BIGINT))::DOUBLE / count(*), 6)
         AS rate_achieved,
       CAST(sum(CASE WHEN keep THEN CAST(value AS DECIMAL(18,2)) END)
            AS DOUBLE) AS value_sum,
       min(CASE WHEN keep THEN event_id END) AS min_event_id
FROM tagged
GROUP BY 1, 2"""


def q_events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: Morton-interleave (user bucket, day
    index) — the key sources/layout.py:write_zorder_layout range-
    partitions on — and aggregate per 256-key super-cell. Exercises
    the exact bit-interleave expression (one shared generator string
    for both engines, sources/layout.py:zorder_terms) the clustered
    write uses, so the layout's key math is itself oracle-checked;
    the write path's file-level clustering is pinned by the layout
    pytest. All integer math; one shuffle (the cell groupBy)."""
    from ..sources.layout import zorder_terms

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id",
        (F.col("user_id") % 1024).alias("xb"),
        (
            (
                (
                    F.datediff(
                        F.col("ts").cast("date"),
                        F.lit("2024-01-01").cast("date"),
                    )
                    % 1024
                )
                + 1024
            )
            % 1024
        ).alias("yb"),
    ).withColumn("z", F.expr(zorder_terms("xb", "yb", ZORDER_BITS)))
    return keyed.groupBy(
        F.shiftright(F.col("z"), 8).alias("cell")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _sql_events_zorder_cells() -> str:
    from ..sources.layout import zorder_terms

    z = zorder_terms("xb", "yb", ZORDER_BITS)
    return f"""
WITH keyed AS (
  SELECT user_id,
         user_id % 1024 AS xb,
         (((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 1024)
           + 1024) % 1024) AS yb
  FROM events
),
zk AS (SELECT user_id, {z} AS z FROM keyed)
SELECT z >> 8 AS cell, count(*) AS n_events,
       min(z) AS z_min, max(z) AS z_max,
       count(DISTINCT user_id) AS n_users
FROM zk GROUP BY 1"""


def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user-decile event counts, one column per event type
    — the wide-format report shape. The pivot values are declared
    explicitly (never inferred at plan time: inference is an extra
    distinct scan AND makes the schema data-dependent, which breaks at
    100 TB); the aggregate is a plain count with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_decile"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def _sql_events_type_pivot() -> str:
    arms = ", ".join(
        f"count(*) FILTER (event_type = '{t}') AS {t}"
        for t in ["click", "view", "purchase", "signup", "error"]
    )
    return f"""
SELECT user_id % 10 AS user_decile, {arms}
FROM events GROUP BY 1"""


def q_events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations as a retention report: users active in the first
    week, the second week, both (INTERSECT), and only the first
    (EXCEPT) — counted. Set ops hash-dedup on the key; both engines
    reduce to the same semi/anti joins."""
    ev = load_table(spark, sf_dir, "events")
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    w1 = ev.filter(F.col("ts") < lo).select("user_id")
    w2 = ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).select(
        "user_id"
    )
    return (
        w1.intersect(w2)
        .agg(F.count(F.lit(1)).alias("retained"))
        .crossJoin(
            w1.distinct()
            .exceptAll(w2.distinct())
            .agg(F.count(F.lit(1)).alias("churned"))
        )
        .crossJoin(w1.distinct().agg(F.count(F.lit(1)).alias("week1")))
        .crossJoin(w2.distinct().agg(F.count(F.lit(1)).alias("week2")))
        .select("week1", "week2", "retained", "churned")
    )


SQL_EVENTS_RETENTION = """
WITH w1 AS (SELECT DISTINCT user_id FROM events
            WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
w2 AS (SELECT DISTINCT user_id FROM events
       WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
         AND ts < TIMESTAMP '2024-01-15 00:00:00')
SELECT (SELECT count(*) FROM w1) AS week1,
       (SELECT count(*) FROM w2) AS week2,
       (SELECT count(*) FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2))
         AS retained,
       (SELECT count(*) FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2))
         AS churned"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their
    first view, then purchased AFTER that click — the classic
    event-analytics query. Three keyed aggregates chained by
    strictly-after conditions; every stage clusters on user_id so the
    exchanges reuse, and the final counts are order-free integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    tv = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("tv")
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        tv.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(tc.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


SQL_EVENTS_FUNNEL = """
WITH tv AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY 1
),
tc AS (
  SELECT e.user_id, min(ts) AS tc
  FROM events e JOIN tv ON e.user_id = tv.user_id
  WHERE e.event_type = 'click' AND e.ts > tv.tv GROUP BY 1
),
tp AS (
  SELECT e.user_id, min(ts) AS tp
  FROM events e JOIN tc ON e.user_id = tc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > tc.tc GROUP BY 1
)
SELECT (SELECT count(*) FROM tv) AS n_viewed,
       (SELECT count(*) FROM tc) AS n_clicked_after,
       (SELECT count(*) FROM tp) AS n_purchased_after"""


def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quantiles of ``value`` per stratum —
    the data-profiling query a pipeline runs before choosing filter
    thresholds. Spark's ``percentile`` is the exact sort-based
    aggregate (rank p*(n-1), linear interpolation — the same contract
    as DuckDB's quantile_cont); at 100 TB swap in ``percentile_approx``
    (t-digest, single pass, mergeable) when approximation is
    acceptable — same query shape."""
    ev = load_table(spark, sf_dir, "events")
    q = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.9D))")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        _rne(F.element_at(q, 1), "p25"),
        _rne(F.element_at(q, 2), "p50"),
        _rne(F.element_at(q, 3), "p75"),
        _rne(F.element_at(q, 4), "p90"),
    )


def q_events_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch: equi-width bucket counts (mergeable —
    cells sum, the CM-sketch property) estimate p50/p90/p99 per
    stratum by interpolating inside the bucket where the cumulative
    count crosses q*n; the EXACT sort-based percentile rides beside it
    so the approximation error is a measured column (the sketch-suite
    contract). The sketch path is the 100 TB shape: one bucket-count
    groupBy with map-side combine and a B-row-per-stratum cumulative
    window — the exact column is the toy-scale reference and the first
    thing to drop at scale. Both engines evaluate the SAME bucket and
    interpolation expression strings (operators/sketch.py), so
    estimates match bitwise before the shared rounding."""
    from ..operators.sketch import (
        HIST_BUCKETS,
        hist_bucket_expr,
        hist_quantile_est_expr,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    fracs = ", ".join(f"{q}D" for q in HQ_QUANTILES)
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.expr(f"percentile(value, array({fracs}))").alias("qs"),
    )
    bucketed = ev.join(
        F.broadcast(stats.select("event_type", "lo", "hi")), "event_type"
    ).withColumn("b", F.expr(hist_bucket_expr("value", "lo", "hi")))
    hist = bucketed.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum))
    targets = (
        stats.select(
            "event_type",
            "n",
            "lo",
            "hi",
            "qs",
            F.posexplode(
                F.array(*[F.lit(q) for q in HQ_QUANTILES])
            ).alias("qi", "q"),
        )
        .withColumn("exact", F.element_at("qs", F.col("qi") + 1))
        .drop("qs", "qi")
    )
    cand = cum.join(F.broadcast(targets), "event_type").filter(
        F.col("cum") >= F.col("q") * F.col("n")
    )
    pick = (
        cand.groupBy("event_type", "q")
        .agg(
            F.min_by(F.struct("b", "c", "cum"), F.col("b")).alias("s"),
            F.min("n").alias("n"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
            F.min("exact").alias("exact"),
        )
        .select(
            "event_type",
            "q",
            "n",
            "lo",
            "hi",
            "exact",
            F.col("s.b").alias("b"),
            F.col("s.c").alias("c"),
            F.col("s.cum").alias("cum"),
        )
        .withColumn(
            "est",
            F.expr(hist_quantile_est_expr(buckets=HIST_BUCKETS)),
        )
    )
    return pick.select(
        "event_type",
        "q",
        "n",
        _r6("est"),
        _r6("exact"),
        _r6e(F.abs(F.col("est") - F.col("exact")), "abs_err"),
    )


def _sql_events_hist_quantiles() -> str:
    from ..operators.sketch import (
        HIST_BUCKETS,
        hist_bucket_expr,
        hist_quantile_est_expr,
    )

    fracs = ", ".join(str(q) for q in HQ_QUANTILES)
    vals = ", ".join(
        f"({i + 1}, CAST({q} AS DOUBLE))"
        for i, q in enumerate(HQ_QUANTILES)
    )
    bexpr = hist_bucket_expr("e.value", "s.lo", "s.hi", HIST_BUCKETS)
    est = hist_quantile_est_expr(buckets=HIST_BUCKETS)
    return f"""
WITH ev AS (SELECT event_type, value FROM events),
stats AS (
  SELECT event_type, count(value) AS n, min(value) AS lo,
         max(value) AS hi,
         quantile_cont(value, [{fracs}]) AS qs
  FROM ev GROUP BY 1
),
bucketed AS (
  SELECT e.event_type, {bexpr} AS b
  FROM ev e JOIN stats s USING (event_type)
),
hist AS (SELECT event_type, b, count(*) AS c FROM bucketed GROUP BY 1, 2),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum
  FROM hist
),
targets AS (
  SELECT event_type, n, lo, hi, qs[qi] AS exact, qv AS q
  FROM stats, (VALUES {vals}) AS t(qi, qv)
),
cand AS (
  SELECT c2.event_type, t.q, t.n, t.lo, t.hi, t.exact,
         c2.b, c2.c, c2.cum,
         row_number() OVER (PARTITION BY c2.event_type, t.q
           ORDER BY c2.b) AS rn
  FROM cum c2 JOIN targets t USING (event_type)
  WHERE c2.cum >= t.q * t.n
),
pick AS (SELECT *, {est} AS est FROM cand WHERE rn = 1)
SELECT event_type, q, n, {_sql_r6('est')}, {_sql_r6('exact')},
       {_sql_rne('abs(est - exact)', 'abs_err')}
FROM pick"""


def q_events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a DETERMINISTIC HyperLogLog
    (operators/sketch.py) with the exact countDistinct beside it — the
    cardinality sketch a 100 TB pipeline uses instead of shuffling
    every distinct key, with its error measured rather than assumed.
    Registers come from the md5 60-bit hash (no float log2 — rank via
    the bin()-string length both engines define identically) and the
    harmonic sum is integer, so the oracle reproduces the estimate to
    the shared rounding."""
    from ..operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(
        ev.select("event_type", "user_id"), "user_id", ["event_type"]
    )
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "n_buckets", _r6("hll_est")
    )


def _sql_events_hll() -> str:
    from ..operators.sketch import HLL_ALPHA, HLL_M, HLL_W_BITS

    p = HLL_W_BITS + 1
    alpha_mm = HLL_ALPHA * HLL_M * HLL_M
    body = f"""WITH h AS (
  SELECT event_type, {sql_hash60('CAST(user_id AS VARCHAR)')} AS h
  FROM events
),
r AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_M.bit_length() - 1}) = 0 THEN {p}
              ELSE {p} - length(bin(h >> {HLL_M.bit_length() - 1})) END
           AS rank
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(rank) AS m FROM r GROUP BY 1, 2
),
agg AS (
  SELECT event_type, count(*) AS n_buckets,
         CAST(sum(CAST(power(2.0, {p} - m) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type, n_buckets,
         {alpha_mm!r} * {float(1 << p)!r}
           / (s_present + ({HLL_M} - n_buckets) * {1 << p}) AS raw,
         {HLL_M} - n_buckets AS v
  FROM agg
),
fin AS (
  SELECT event_type, n_buckets,
         CASE WHEN raw <= {2.5 * HLL_M} AND v > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
              ELSE raw END AS hll_est
  FROM est
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
)
SELECT ex.event_type, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_buckets AS BIGINT) AS n_buckets, hll_est
FROM ex JOIN fin ON ex.event_type = fin.event_type"""
    return _sql_r6_wrap(
        body, ["event_type", "n_exact", "n_buckets"], ["hll_est"]
    )


SQL_EVENTS_QUANTILES = _sql_r6_wrap(
    """SELECT event_type, n, v_min, v_max,
       qs[1] AS p25, qs[2] AS p50, qs[3] AS p75, qs[4] AS p90
FROM (
  SELECT event_type, count(value) AS n,
         min(value) AS v_min, max(value) AS v_max,
         quantile_cont(value, [0.25, 0.5, 0.75, 0.9]) AS qs
  FROM events GROUP BY 1
)""",
    ["event_type", "n", "v_min", "v_max"],
    ["p25", "p50", "p75", "p90"],
)


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: event counts + exact value sums per (event_type,
    day) with subtotal and grand-total levels — Spark ROLLUP vs the
    oracle's GROUPING SETS. Sums go through DECIMAL so subtotal
    accumulation order can't smear doubles."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts"))
    return (
        ev.select(
            F.col("event_type"),
            day.alias("day"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("double").alias("value_sum"),
            F.grouping("event_type").cast("int").alias("lvl_type"),
            F.grouping("day").cast("int").alias("lvl_day"),
        )
    )


SQL_EVENTS_ROLLUP = """
SELECT event_type, day, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       CASE WHEN GROUPING(event_type) THEN 1 ELSE 0 END AS lvl_type,
       CASE WHEN GROUPING(day) THEN 1 ELSE 0 END AS lvl_day
FROM (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
GROUP BY ROLLUP (event_type, day)"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF enrichment: each purchase gets the user's most recent
    at-or-before view (id, value, microsecond lag) — see
    operators/asof.py for the one-shuffle union-tag plan. The right
    side is deduped to one row per (user, ts) keep-max-event_id first,
    because DuckDB's ASOF tie rule at equal timestamps is unspecified;
    with unique right timestamps both engines' picks coincide
    exactly."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
            F.col("value").alias("view_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id")
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_tiebreak="view_event_id",
    )
    # unix_micros needs an instant; NTZ->LTZ cast is micros-preserving
    # only under UTC (asserted, the q_ts_delta_hist convention)
    lts, rts = F.col("ts"), F.col("view_ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        lts, rts = lts.cast("timestamp"), rts.cast("timestamp")
    return out.select(
        "purchase_event_id",
        F.col("user_id").alias("symbol"),
        "view_event_id",
        (F.unix_micros(lts) - F.unix_micros(rts)).alias("lag_us"),
        "view_value",
    )


SQL_EVENTS_ASOF_JOIN = """
WITH v0 AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts
           ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
),
v AS (SELECT user_id, ts, event_id AS view_event_id,
             value AS view_value
      FROM v0 WHERE rn = 1),
p AS (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_event_id, p.user_id AS symbol,
       v.view_event_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
       v.view_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts <= p.ts"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional CUBE aggregate: counts and exact DECIMAL
    value totals for every (event_type × weekday) combination plus
    all three rollup margins and the grand total, labeled by
    grouping_id so a report layer can tell margins from cells. CUBE
    is one shuffle producing all 2^d grouping sets via partial
    aggregation — not 4 separate queries — which is exactly the
    at-scale reason the operator exists."""
    ev = load_table(spark, sf_dir, "events")
    dow = weekday_mon0(F.col("ts")).cast("int").alias("dow")
    return (
        ev.select("event_type", dow, "value")
        .cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


SQL_EVENTS_CUBE = """
SELECT event_type, (isodow(ts) - 1)::INT AS dow,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       CAST(GROUPING(event_type, (isodow(ts) - 1)::INT) AS INT) AS gid
FROM events
GROUP BY CUBE (1, 2)"""


def q_events_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Deequ/Great-Expectations
    shape): one scan computes every metric as a conditional aggregate,
    then the single metrics row unpivots into one row per constraint
    with its violation count and pass flag. At 100 TB this is ONE
    map-side-combined pass over the table — never one scan per check —
    and the output is the tiny audit artifact a pipeline gates on."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.count_if(F.col("ts").isNull()).alias("ts_nulls"),
        F.count_if(F.col("value") < 0).alias("neg_values"),
        F.count_if(~F.col("event_type").isin(DQ_EVENT_TYPES)).alias(
            "bad_types"
        ),
        F.count_if(F.col("user_id") <= 0).alias("bad_users"),
    )
    checks = [
        ("unique_event_id", F.col("n") - F.col("n_ids")),
        ("ts_complete", F.col("ts_nulls")),
        ("value_nonnegative", F.col("neg_values")),
        ("event_type_in_domain", F.col("bad_types")),
        ("user_id_positive", F.col("bad_users")),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                v.cast("long").alias("violations"),
            )
            for name, v in checks
        ]
    )
    return (
        m.select(F.explode(rows).alias("c"))
        .select("c.check_name", "c.violations")
        .withColumn("passed", (F.col("violations") == 0).cast("int"))
    )


def _sql_events_dq_suite() -> str:
    types = ", ".join(f"'{t}'" for t in DQ_EVENT_TYPES)
    return f"""
WITH m AS (
  SELECT count(*) AS n, count(DISTINCT event_id) AS n_ids,
         count(*) FILTER (ts IS NULL) AS ts_nulls,
         count(*) FILTER (value < 0) AS neg_values,
         count(*) FILTER (event_type NOT IN ({types})) AS bad_types,
         count(*) FILTER (user_id <= 0) AS bad_users
  FROM events),
u AS (
  SELECT 'unique_event_id' AS check_name, n - n_ids AS violations FROM m
  UNION ALL SELECT 'ts_complete', ts_nulls FROM m
  UNION ALL SELECT 'value_nonnegative', neg_values FROM m
  UNION ALL SELECT 'event_type_in_domain', bad_types FROM m
  UNION ALL SELECT 'user_id_positive', bad_users FROM m)
SELECT check_name, CAST(violations AS BIGINT) AS violations,
       CAST(violations = 0 AS INT) AS passed
FROM u"""


def q_events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths: the most frequent 3-step sequences of a
    user's consecutive events — the path-analysis query behind journey
    funnels. Two LEAD windows on the user exchange (ordered by
    (ts, event_id), the engine's deterministic event order), a filter
    to complete trigrams, and a map-side-combined count; the top-N cut
    is fully tie-broken on the three step names."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = ev.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(
            F.col("n_paths").desc(),
            F.col("step1").asc(),
            F.col("step2").asc(),
            F.col("step3").asc(),
        )
        .limit(PATH_TOP_N)
    )


SQL_EVENTS_PATH_TRIGRAMS = f"""
WITH tri AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER w AS step2,
         lead(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
SELECT step1, step2, step3, count(*) AS n_paths
FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
LIMIT {PATH_TOP_N}"""


def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity concentration (events and
    exact DECIMAL value volume) — the inequality measure behind
    engagement-concentration dashboards, computed by the sorted-rank
    closed form G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n. Both numerator and
    denominator are exact integers (counts; value in integer cents),
    so the only float is the final division of identical integers on
    both engines. The global rank i is the two-phase bucketed prefix
    count (operators/twophase): 1 + #earlier rows, computed with
    parallel per-bucket windows — no single-task sort of the user
    grain."""
    from ..operators.twophase import log2_bucket, prefix_agg

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
    )

    def gini(col: str, tiebreak: str):
        ranked = prefix_agg(
            per_user,
            F.lit(1),
            log2_bucket(F.col(col)),
            [F.col(col).asc(), F.col(tiebreak).asc()],
            agg="count",
            out_col="__n_before",
        ).select(
            F.col(col).alias("x"),
            (F.coalesce(F.col("__n_before"), F.lit(0)) + 1).alias("i"),
        )
        return ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("i") * F.col("x")).alias("six"),
        ).select(
            (
                F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
                - (F.col("n") + 1) / F.col("n").cast("double")
            ).alias("g")
        )

    ge = gini("n_events", "user_id").select(
        F.col("g").alias("gini_events")
    )
    gv = gini("cents", "user_id").select(F.col("g").alias("gini_value"))
    return ge.crossJoin(gv)


SQL_EVENTS_GINI = """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1),
re AS (
  SELECT n_events AS x,
         row_number() OVER (ORDER BY n_events ASC, user_id ASC) AS i
  FROM per_user),
rv AS (
  SELECT cents AS x,
         row_number() OVER (ORDER BY cents ASC, user_id ASC) AS i
  FROM per_user),
ge AS (
  SELECT 2.0 * sum(i * x) / (count(*) * sum(x))
         - (count(*) + 1) / CAST(count(*) AS DOUBLE) AS gini_events
  FROM re),
gv AS (
  SELECT 2.0 * sum(i * x) / (count(*) * sum(x))
         - (count(*) + 1) / CAST(count(*) AS DOUBLE) AS gini_value
  FROM rv)
SELECT gini_events, gini_value FROM ge CROSS JOIN gv"""


def q_events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit per event type — the fraud/anomaly
    screen an auditor runs over monetary columns: observed
    first-significant-digit counts vs the Benford expectation
    n·log₁₀(1+1/d), with each digit's χ² contribution emitted
    (grid-snapped so the term is engine-reproducible). Values < 1 are
    excluded (no stable first digit); the digit is read off the
    integer part's decimal string — for value ≥ 1 the leading digit
    of floor(value) IS the first significant digit, and a string read
    cannot be flipped by a last-ulp libm difference the way
    floor(log10/pow) can on near-power-of-ten values."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 1)
    digit = F.substring(
        F.floor("value").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = ev.groupBy("event_type", digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = obs.groupBy("event_type").agg(F.sum("n_obs").alias("n"))
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    j = obs.join(F.broadcast(tot), "event_type")
    expected = F.col("n") * F.log10(1 + 1 / F.col("digit").cast("double"))
    chi = (
        (F.col("n_obs") - expected)
        * (F.col("n_obs") - expected)
        / expected
    )
    return j.select(
        "event_type",
        "digit",
        "n_obs",
        _rne(expected, "n_expected", 6),
        _rne(snap(chi), "chi2_term", 6),
    )


def _sql_events_benford() -> str:
    snap = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    return f"""
WITH f AS (SELECT event_type, value FROM events WHERE value >= 1),
obs AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         count(*) AS n_obs
  FROM f GROUP BY 1, 2),
tot AS (SELECT event_type, sum(n_obs) AS n FROM obs GROUP BY 1),
calc AS (
  SELECT o.event_type, o.digit, o.n_obs,
         n * log10(1 + 1 / CAST(digit AS DOUBLE)) AS expected
  FROM obs o JOIN tot USING (event_type))
SELECT event_type, digit, CAST(n_obs AS BIGINT) AS n_obs,
       {_sql_rne('expected', 'n_expected')},
       {_sql_rne(
           snap('(n_obs - expected) * (n_obs - expected) / expected'),
           'chi2_term')}
FROM calc"""


def q_events_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by sketch inner product — the
    AMS/Count-Min classic an optimizer uses before committing to a
    join strategy: |A ⋈ B| on a key is Σ_k c_A(k)·c_B(k), estimated as
    the MIN over depth rows of the cellwise product of the two CMS
    sketches (here A = B = events.user_id, so the estimate bounds the
    self-join size Σ c²). Sketch cells come from the engine's
    deterministic CMS (operators/sketch.py), so the estimate — like
    every sketch in the suite — sits beside its exact value as a
    measured number. At 100 TB the sketches are KBs per side and the
    estimate costs one scan each, vs actually running the join."""
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_cells

    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("term"))
    cells = cms_cells(keys, depth=CMS_DEPTH, width=CMS_WIDTH)
    est = (
        cells.groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ip"))
        .agg(F.min("ip").alias("est_size"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_size"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "est_size",
        (F.col("est_size") / F.col("exact_size")).alias("overestimate"),
    )


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the month's
    two halves — the ML-ops drift metric a feature pipeline monitors
    (PSI < 0.1 stable, > 0.25 action). Fixed integer value buckets
    (floor(value/10)) with Laplace smoothing over the observed bucket
    union, so empty bins never produce ±∞ terms; per-bin terms
    (p₂−p₁)·ln(p₂/p₁) snap to the 1e-6 grid before the exact DECIMAL
    sum — ln() last-ulp differences between engines collapse under
    the grid. Two map-side-combined aggregates, output is one row per
    event type."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp_ntz"), 1
    ).otherwise(2)
    binned = ev.select(
        "event_type",
        F.floor(F.col("value") / 10).cast("int").alias("vbucket"),
        half.alias("half"),
    )
    per_bin = binned.groupBy("event_type", "vbucket").agg(
        F.count_if(F.col("half") == 1).alias("n1"),
        F.count_if(F.col("half") == 2).alias("n2"),
    )
    tot = per_bin.groupBy("event_type").agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    j = per_bin.join(F.broadcast(tot), "event_type")
    p1 = (F.col("n1") + 1) / (F.col("t1") + F.col("n_bins"))
    p2 = (F.col("n2") + 1) / (F.col("t2") + F.col("n_bins"))
    term = snap((p2 - p1) * F.log(p2 / p1)).cast("decimal(18,6)")
    return (
        j.select("event_type", term.alias("term"), "t1", "t2")
        .groupBy("event_type")
        .agg(
            F.max("t1").alias("n_first_half"),
            F.max("t2").alias("n_second_half"),
            F.sum("term").cast("double").alias("psi_raw"),
        )
        .select(
            "event_type",
            "n_first_half",
            "n_second_half",
            _rne(F.col("psi_raw"), "psi", 6),
        )
    )


def q_events_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit per user: how far events arrive out
    of order relative to arrival sequence (event_id) — the measurement
    that SIZES a streaming watermark instead of guessing it. Lateness
    of an event = running-max event time so far minus its own time
    (exact integer micros); per user: inversion count, max lateness,
    and total events. One user-keyed window ordered by arrival."""
    require_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = ev.select("user_id", "event_id", us.alias("t_us")).withColumn(
        "late_us", F.max("t_us").over(w) - F.col("t_us")
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("late_us") > 0).alias("n_inversions"),
        F.max("late_us").alias("max_late_us"),
    )


SQL_EVENTS_LATENESS = """
WITH d AS (
  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t_us,
         max(epoch_us(ts::TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) - epoch_us(ts::TIMESTAMP) AS late_us
  FROM events)
SELECT user_id, count(*) AS n_events,
       CAST(count(*) FILTER (late_us > 0) AS BIGINT) AS n_inversions,
       max(late_us) AS max_late_us
FROM d GROUP BY 1"""


def q_events_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-completeness audit: every calendar day in the table's
    range vs actual row counts, flagging missing or thin days — the
    backfill planner's input. The expected day grid generates from the
    global min/max (a broadcast one-row frame exploded with
    ``sequence``), left-joins the per-day counts, and emits status
    ('missing' / 'thin' / 'ok') — so absent partitions appear as rows,
    which a plain GROUP BY can never show."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = grid.join(per_day, "day", "left").select(
        "day", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )
    status = (
        F.when(F.col("n_rows") == 0, "missing")
        .when(F.col("n_rows") < PARTITION_MIN_ROWS, "thin")
        .otherwise("ok")
    )
    return joined.select("day", "n_rows", status.alias("status"))


SQL_EVENTS_PARTITION_AUDIT = f"""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows
  FROM events GROUP BY 1),
bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
         FROM bounds)
SELECT g.day, coalesce(p.n_rows, 0) AS n_rows,
       CASE WHEN coalesce(p.n_rows, 0) = 0 THEN 'missing'
            WHEN coalesce(p.n_rows, 0) < {PARTITION_MIN_ROWS} THEN 'thin'
            ELSE 'ok' END AS status
FROM grid g LEFT JOIN per_day p USING (day)"""


def q_events_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: XOR of canonical per-row
    60-bit hashes, per event type plus the grand total (one ROLLUP) —
    the cross-replica parity check a 100 TB migration runs instead of
    row-by-row diffs. Canonicalization avoids engine float/timestamp
    formatting: timestamps as integer micros, values as integer
    cents, then one md5-based hash per row; XOR is associative and
    commutative, so the signature is partitioning- and
    order-independent by construction."""
    require_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        .cast("string"),
        F.col("props"),
    )
    h = ev.select("event_type", hash60(canon).alias("h"))
    return (
        h.rollup("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_sig"),
        )
        .select("event_type", "n_rows", "xor_sig")
    )


SQL_EVENTS_CHECKSUM = f"""
WITH h AS (
  SELECT event_type,
         {sql_hash60("concat_ws('|', CAST(event_id AS VARCHAR), "
                     "CAST(epoch_us(ts::TIMESTAMP) AS VARCHAR), "
                     "CAST(user_id AS VARCHAR), event_type, "
                     "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) "
                     "AS VARCHAR), props)")} AS h
  FROM events)
SELECT event_type, count(*) AS n_rows, bit_xor(h) AS xor_sig
FROM h GROUP BY ROLLUP (event_type)"""


def q_events_scd2_pit_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension: every purchase
    is attributed to the tier that was VALID AT ITS TIMESTAMP (the
    temporal-warehouse query the SCD2 table exists to answer), then
    revenue rolls up per tier. The validity lookup is the backward
    ASOF shape — latest tier change at-or-before the purchase — so it
    reuses the engine's union-tag single-shuffle asof_join instead of
    an interval theta-join; purchases before any tier change land in
    the NULL tier. Output is tiers+1 rows."""
    from ..operators.asof import asof_join

    dim = q_events_scd2_intervals(spark, sf_dir).select(
        F.col("symbol").alias("user_id"),
        F.col("valid_from"),
        "tier",
    )
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        dim,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        right_tiebreak="tier",
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


SQL_EVENTS_SCD2_PIT = f"""
WITH s AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value / {SCD2_TIER_DIV}) AS INT) AS tier,
         row_number() OVER (PARTITION BY user_id, ts
           ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'),
d AS (SELECT user_id, ts, event_id, tier FROM s WHERE rn = 1),
c AS (
  SELECT *, lag(tier) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_tier
  FROM d),
isl AS (
  SELECT user_id, ts AS valid_from, tier FROM c
  WHERE prev_tier IS NULL OR prev_tier <> tier),
p AS (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase')
SELECT i.tier, count(*) AS n_purchases,
       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM p ASOF LEFT JOIN isl i
  ON p.user_id = i.user_id AND i.valid_from <= p.ts
GROUP BY 1"""


def q_events_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: key frequency and inferred
    value-type distribution across the events ``props`` JSON column —
    the discovery query a lake pipeline runs before declaring a
    schema. JVM-side json parsing (from_json to map<string,string>),
    one explode + map-side-combined count; type inference is a regex
    class over the raw value text (int / float / bool / string),
    identical under Java regex and RE2."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("k", "v")
    )
    vtype = (
        F.when(F.col("v").rlike("^-?[0-9]+$"), "int")
        .when(F.col("v").rlike("^-?[0-9]+\\.[0-9]+$"), "float")
        .when(F.col("v").isin("true", "false"), "bool")
        .otherwise("string")
    )
    return (
        kv.groupBy(F.col("k").alias("key"), vtype.alias("vtype"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("v").alias("n_distinct"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


SQL_EVENTS_JSON_SCHEMA = """
WITH kv AS (
  SELECT k.key AS key,
         json_extract_string(props, '$.' || k.key) AS v
  FROM events, LATERAL (
    SELECT unnest(json_keys(props::JSON)) AS key) k)
SELECT key,
       CASE WHEN regexp_full_match(v, '-?[0-9]+') THEN 'int'
            WHEN regexp_full_match(v, '-?[0-9]+\\.[0-9]+') THEN 'float'
            WHEN v IN ('true', 'false') THEN 'bool'
            ELSE 'string' END AS vtype,
       count(*) AS n,
       count(DISTINCT v) AS n_distinct,
       min(v) AS min_v, max(v) AS max_v
FROM kv GROUP BY 1, 2"""


def q_events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew report for the user_id key: the top-K
    heaviest keys with their share of total rows in parts-per-million
    (integer-exact) — the diagnostic that decides whether a key needs
    the salted-join path (operators/skew.py) before a 100 TB run. One
    map-side-combined count + a broadcast total; deterministic top-K."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_rows",
            (F.col("n_rows") * F.lit(1_000_000) / F.col("total"))
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("user_id").asc())
        .limit(SKEW_TOP_K)
    )


SQL_EVENTS_SKEW = f"""
WITH counts AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
total AS (SELECT sum(n_rows) AS total FROM counts)
SELECT user_id, n_rows,
       CAST(n_rows * 1000000 / total AS BIGINT) AS share_ppm
FROM counts CROSS JOIN total
ORDER BY n_rows DESC, user_id ASC LIMIT {SKEW_TOP_K}"""


def q_events_conditional_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact conditional deciles of value per event type — the
    distribution profile behind outlier thresholds and per-segment
    SLOs. Discrete (type-7-lower) quantiles picked EXPLICITLY: rank
    rows per type ordered by (value, event_id) and keep ranks
    floor((n−1)p)+1 — the same definition spelled out in both engines,
    so no reliance on either engine's quantile interpolation
    arithmetic. One user exchange, output is types × 9 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    n = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n).alias("n"),
    )
    picks = None
    for p in DECILE_PS:
        sel = ranked.filter(
            F.col("rn")
            == F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1
        ).select(
            "event_type",
            F.lit(int(round(p * 100))).alias("pct"),
            F.col("value").alias("decile_value"),
        )
        picks = sel if picks is None else picks.unionByName(sel)
    return picks


def _sql_events_deciles() -> str:
    arms = " UNION ALL ".join(
        f"""SELECT event_type, {int(round(p * 100))} AS pct,
value AS decile_value
FROM ranked WHERE rn = CAST(floor((n - 1) * {p}) AS BIGINT) + 1"""
        for p in DECILE_PS
    )
    return f"""WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
           ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
{arms}"""


def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next event type | current) with transition counts — the model
    behind next-action prediction and journey simulation. One LEAD
    window on the user exchange, a (cur, next) count, and a window-sum
    normalizer per current state; probabilities are double quotients
    of identical integers on both engines (no rounding). The matrix is
    states², tiny at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    trans = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = trans.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    row_tot = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n_trans",
        (F.col("n_trans") / F.sum("n_trans").over(row_tot)).alias("p"),
    )


SQL_EVENTS_MARKOV = """
WITH trans AS (
  SELECT event_type AS cur, lead(event_type) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
counts AS (
  SELECT cur, nxt, count(*) AS n_trans FROM trans
  WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT cur, nxt, n_trans,
       n_trans / sum(n_trans) OVER (PARTITION BY cur) AS p
FROM counts"""


def q_events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week
    (the cohort), counted as distinct actives in each subsequent week
    offset — the full product-analytics generalization of the two-week
    retention query. Two aggregates: first-touch per user (one user
    exchange), then distinct users per (cohort_week, offset); the
    distinct collapses at the user grain BEFORE the matrix aggregate,
    so the second shuffle moves at most users × weeks rows. All
    integer week arithmetic from the epoch-day quotient."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(  # noqa: E731
        (
            F.floor(F.unix_micros(c.cast("timestamp")) / F.lit(86_400_000_000))
            - F.lit(19723)
        )
        / 7
    ).cast("int")
    require_utc(spark)
    acts = ev.select(
        "user_id", week(F.col("ts")).alias("act_week")
    ).distinct()
    cohorts = acts.groupBy("user_id").agg(
        F.min("act_week").alias("cohort_week")
    )
    return (
        acts.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("act_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_EVENTS_COHORT = """
WITH acts AS (
  SELECT DISTINCT user_id,
         CAST(floor((floor(epoch_us(ts::TIMESTAMP) / 86400000000.0)
                     - 19723) / 7) AS INT) AS act_week
  FROM events),
cohorts AS (
  SELECT user_id, min(act_week) AS cohort_week FROM acts GROUP BY 1)
SELECT cohort_week, act_week - cohort_week AS week_offset,
       count(*) AS n_users
FROM acts JOIN cohorts USING (user_id)
GROUP BY 1, 2"""


def q_events_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type sets:
    support, confidence, and lift for every type pair with at least
    ``ASSOC_MIN_USERS`` co-occurring users — the first level of an
    FP-growth-style frequent-itemset mine. The basket distinct
    collapses to user × type (≤ 5 rows/user) before the pair
    self-join, per-item counts broadcast (the item vocabulary is tiny
    by construction), and the user total rides a broadcast scalar.
    The emitted ratios are double quotients of identical integers on
    both engines — no rounding needed anywhere."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    item_counts = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    n_users = baskets.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = baskets.select("user_id", F.col("event_type").alias("ante"))
    b = baskets.select("user_id", F.col("event_type").alias("cons"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= ASSOC_MIN_USERS)
    )
    na = item_counts.select(
        F.col("event_type").alias("ante"), F.col("n_item").alias("n_ante")
    )
    nc = item_counts.select(
        F.col("event_type").alias("cons"), F.col("n_item").alias("n_cons")
    )
    return (
        pairs.join(F.broadcast(na), "ante")
        .join(F.broadcast(nc), "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            "n_both",
            (F.col("n_both") / F.col("n_users")).alias("support"),
            (F.col("n_both") / F.col("n_ante")).alias("confidence"),
            (
                F.col("n_both")
                * F.col("n_users")
                / (F.col("n_ante") * F.col("n_cons"))
            ).alias("lift"),
        )
    )


SQL_EVENTS_ASSOC = f"""
WITH baskets AS (SELECT DISTINCT user_id, event_type FROM events),
item_counts AS (
  SELECT event_type, count(*) AS n_item FROM baskets GROUP BY 1),
total AS (SELECT count(DISTINCT user_id) AS n_users FROM baskets),
pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2 HAVING count(*) >= {ASSOC_MIN_USERS})
SELECT ante, cons, n_both,
       n_both / n_users AS support,
       n_both / na.n_item AS confidence,
       n_both * n_users / (na.n_item * nc.n_item) AS lift
FROM pairs
JOIN item_counts na ON na.event_type = ante
JOIN item_counts nc ON nc.event_type = cons
CROSS JOIN total"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding touch event (view or click), or
    'none' if the purchase had no prior touch. One user-keyed window
    (ordered by ts with the event_id tie-break) carries the
    last-non-null touch type to every row — the classic
    conditional-LAST(ignorenulls) frame — then purchases aggregate per
    channel with exact DECIMAL revenue. One exchange on user_id; the
    channel rollup partially aggregates map-side into ≤3 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin(*ATTRIB_TOUCHES), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", F.coalesce(touch, F.lit("none")))
        .filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


SQL_EVENTS_ATTRIBUTION = """
WITH tagged AS (
  SELECT event_type, value,
         coalesce(last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  'none') AS channel
  FROM events)
SELECT channel, count(*) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1"""


def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts and the running distinct-user total — the
    cumulative-COUNT-DISTINCT report, computed scalably via the
    first-touch transform: a running distinct count over raw events
    would hold per-key state in every frame, but each user's FIRST
    event (one min-aggregate on user_id) contributes exactly one row,
    after which the cumulative curve is an ordinary prefix sum over
    the ~30 day-grain rows. The only full-sort window runs on the
    day-grain frame (bounded by the calendar, not the data), which is
    the documented at-scale contract."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    daily = (
        first_seen.groupBy(F.to_date(F.col("first_ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


SQL_EVENTS_CUMULATIVE_USERS = """
WITH first_seen AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
daily AS (
  SELECT CAST(first_ts AS DATE) AS day, count(*) AS n_new_users
  FROM first_seen GROUP BY 1)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily"""


def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (event_type,
    weekday, value decile bucket): group sizes plus an at-risk flag for
    groups smaller than k — the privacy check a data-release pipeline
    runs before publishing. One map-side-combined aggregate; the value
    bucket is integer floor(value/10) so the cut is exact (no
    quantile estimation inside the audit)."""
    ev = load_table(spark, sf_dir, "events")
    dow = weekday_mon0(F.col("ts")).cast("int").alias("dow")
    vbucket = F.floor(F.col("value") / 10).cast("int").alias("vbucket")
    return (
        ev.select("event_type", dow, vbucket)
        .groupBy("event_type", "dow", "vbucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "at_risk", (F.col("n") < K_ANON_THRESHOLD).cast("boolean")
        )
    )


SQL_EVENTS_K_ANONYMITY = f"""
SELECT event_type, (isodow(ts) - 1)::INT AS dow,
       CAST(floor(value / 10) AS INT) AS vbucket,
       count(*) AS n,
       count(*) < {K_ANON_THRESHOLD} AS at_risk
FROM events GROUP BY 1, 2, 3"""


def q_events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screen on event cadence: humans emit events with
    high gap dispersion, schedulers with near-constant gaps — flag
    users whose MAD/median inter-event gap falls below
    ``BOT_REGULARITY_TAU`` (with ≥ ``BOT_MIN_GAPS`` gaps). Gaps are
    exact integer microseconds; median and MAD are explicit rank
    picks (no quantile interpolation); the regularity score is one
    float division of deterministic integers. One user exchange
    end-to-end."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("ts"), "event_id"
    )
    # NTZ->LTZ cast preserves stored micros only under UTC (asserted,
    # never set — the ts_delta_hist convention)
    ts = F.col("ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag(ts, 1).over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id",
            (
                F.unix_micros(ts) - F.unix_micros(F.col("prev"))
            ).alias("gap"),
        )
    )
    wg = Window.partitionBy("user_id").orderBy(F.col("gap").asc())
    wn = Window.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "gap",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med_pick = F.floor((F.col("n") - 1) * 0.5).cast("int") + 1
    med = ranked.filter(F.col("rn") == med_pick).select(
        "user_id", F.col("gap").alias("med"), "n"
    )
    dev = gaps.join(med, "user_id").select(
        "user_id", F.abs(F.col("gap") - F.col("med")).alias("ad"),
        "med", "n",
    )
    wd = Window.partitionBy("user_id").orderBy(F.col("ad").asc())
    dranked = dev.select(
        "user_id", "ad", "med", "n",
        F.row_number().over(wd).alias("rn"),
    )
    mad = dranked.filter(
        F.col("rn") == F.floor((F.col("n") - 1) * 0.5).cast("int") + 1
    ).select("user_id", F.col("ad").alias("mad"), "med", "n")
    # med = 0 (all-identical timestamps) → define regularity as 0.0
    # (perfectly regular) instead of dividing: Spark's Divide yields
    # NULL on a zero divisor while DuckDB yields inf for doubles, so
    # an unguarded division diverges across engines the first time a
    # user's gaps are all zero. The CASE below is mirrored in the
    # oracle so both engines agree by construction.
    reg = F.when(
        F.col("med") > 0, F.col("mad") / F.col("med").cast("double")
    ).otherwise(F.lit(0.0))
    return mad.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.col("med").alias("median_gap_us"),
        F.col("mad").alias("mad_gap_us"),
        _rne(reg, "regularity", 6),
        (
            (reg < BOT_REGULARITY_TAU) & (F.col("n") >= BOT_MIN_GAPS)
        ).alias("is_bot_like"),
    )


def _sql_events_bot_detection() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id FROM events),
gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM ev QUALIFY gap IS NOT NULL),
ranked AS (
  SELECT user_id, gap,
         row_number() OVER (PARTITION BY user_id ORDER BY gap ASC)
           AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM gaps),
med AS (
  SELECT user_id, gap AS med, n FROM ranked
  WHERE rn = CAST(floor((n - 1) * 0.5) AS INT) + 1),
dev AS (
  SELECT g.user_id, abs(g.gap - m.med) AS ad, m.med, m.n
  FROM gaps g JOIN med m USING (user_id)),
dranked AS (
  SELECT user_id, ad, med, n,
         row_number() OVER (PARTITION BY user_id ORDER BY ad ASC)
           AS rn
  FROM dev),
mad AS (
  SELECT user_id, ad AS mad, med, n FROM dranked
  WHERE rn = CAST(floor((n - 1) * 0.5) AS INT) + 1)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       CAST(med AS BIGINT) AS median_gap_us,
       CAST(mad AS BIGINT) AS mad_gap_us,
       {_sql_rne(
           'CASE WHEN med > 0 THEN CAST(mad AS DOUBLE) / med'
           ' ELSE 0.0 END', 'regularity')},
       (CASE WHEN med > 0 THEN CAST(mad AS DOUBLE) / med
         ELSE 0.0 END) < {BOT_REGULARITY_TAU}
         AND n >= {BOT_MIN_GAPS} AS is_bot_like
FROM mad"""


def q_events_ab_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B uplift readout with a deterministic hash split: users
    assign to treatment by the portable hash60 (reproducible across
    engines/runs — the same reason every sampler here avoids rand()),
    and each event type reports group means in exact integer cents,
    the uplift, and the Welch t statistic (two-pass variance with
    grid-snapped squared deviations in DECIMAL — no engine variance
    formula is load-bearing). The expected readout on hash-split
    uniform data is uplift ≈ 0 — this query is the HARNESS, and its
    null behavior is the calibration check."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    grp = (
        hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
        % 2
    ).cast("int")
    t = ev.withColumn("g", grp)
    means = t.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
    ).withColumn(
        "mean_c", F.col("sc").cast("double") / F.col("n")
    )
    withm = t.join(means, ["event_type", "g"]).select(
        "event_type",
        "g",
        "n",
        "mean_c",
        (
            F.floor(
                (F.col("cents") - F.col("mean_c"))
                * (F.col("cents") - F.col("mean_c"))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).cast("decimal(28,4)").alias("sq"),
    )
    # n = 1 groups are excluded BEFORE the (n - 1) variance divisor:
    # Spark's Divide yields NULL on zero while DuckDB yields inf, so
    # a singleton group would diverge across engines. Mirrored in the
    # oracle (WHERE n >= 2) so both agree by construction.
    var = (
        withm.filter(F.col("n") >= 2)
        .groupBy("event_type", "g", "n", "mean_c")
        .agg(
            (
                F.sum("sq").cast("double")
                / (F.col("n") - 1).cast("double")
            ).alias("s2")
        )
    )
    a = var.filter(F.col("g") == 1).select(
        "event_type",
        F.col("n").alias("n_t"),
        F.col("mean_c").alias("mean_t"),
        F.col("s2").alias("s2_t"),
    )
    b = var.filter(F.col("g") == 0).select(
        "event_type",
        F.col("n").alias("n_c"),
        F.col("mean_c").alias("mean_c"),
        F.col("s2").alias("s2_c"),
    )
    j = a.join(b, "event_type")
    uplift = F.col("mean_t") - F.col("mean_c")
    se = F.sqrt(
        F.col("s2_t") / F.col("n_t") + F.col("s2_c") / F.col("n_c")
    )
    # se = 0 (both arms constant) would diverge: Spark's Divide yields
    # NULL on a zero divisor, DuckDB IEEE double division yields inf.
    # Emit NULL in both engines by construction (CASE WHEN mirrored in
    # the oracle) — a t statistic is undefined at zero variance anyway.
    t_stat = F.when(se > 0, uplift / se)
    return j.select(
        "event_type",
        "n_t",
        "n_c",
        _rne(F.col("mean_t") / 100.0, "mean_treat", 6),
        _rne(F.col("mean_c") / 100.0, "mean_ctrl", 6),
        _rne(uplift / 100.0, "uplift", 6),
        _rne(t_stat, "t_stat", 6),
    )


def _sql_events_ab_uplift() -> str:
    h = sql_hash60("'ab:' || CAST(user_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_type, CAST(({h}) % 2 AS INT) AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
means AS (
  SELECT event_type, g, count(*) AS n,
         CAST(sum(cents) AS DOUBLE) / count(*) AS mean_c
  FROM ev GROUP BY 1, 2),
sq AS (
  SELECT e.event_type, e.g, m.n, m.mean_c,
         CAST(floor((e.cents - m.mean_c) * (e.cents - m.mean_c)
                * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4)) AS sq
  FROM ev e JOIN means m USING (event_type, g)),
var_ AS (
  SELECT event_type, g, n, mean_c,
         CAST(sum(sq) AS DOUBLE) / (n - 1) AS s2
  FROM sq WHERE n >= 2 GROUP BY 1, 2, 3, 4),
j AS (
  SELECT a.event_type, a.n AS n_t, a.mean_c AS mean_t, a.s2 AS s2_t,
         b.n AS n_c, b.mean_c AS mean_ctl, b.s2 AS s2_c
  FROM var_ a JOIN var_ b
    ON a.event_type = b.event_type AND a.g = 1 AND b.g = 0)
SELECT event_type, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       {_sql_rne('mean_t / 100.0', 'mean_treat')},
       {_sql_rne('mean_ctl / 100.0', 'mean_ctrl')},
       {_sql_rne('(mean_t - mean_ctl) / 100.0', 'uplift')},
       {_sql_rne(
           'CASE WHEN sqrt(s2_t / n_t + s2_c / n_c) > 0'
           ' THEN (mean_t - mean_ctl)'
           ' / sqrt(s2_t / n_t + s2_c / n_c) END', 't_stat')}
FROM j"""


def q_events_ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap CI for the A/B uplift — the resampling
    companion to ``events_ab_uplift``'s Welch t: B=32 Poisson(1)
    bootstrap replicates (Efron's Poisson-weight approximation, THE
    stream/scale-friendly bootstrap — weights are independent per row,
    so no N-sized resample index is ever materialized), each weight
    derived from the portable hash60(b, event_id) through the
    Poisson CDF as pasted literals — deterministic across engines,
    runs, and partitionings, like every sampler here. Per replicate
    and arm the weighted mean rides exact integer sums (weight ×
    cents in DECIMAL); the CI is the [1/32, 31/32] empirical interval
    of the replicate uplifts, tie-broken by replicate id. One 32×
    row expansion collapsed map-side to (event_type × arm × B)
    groups — the blowup never crosses the shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    grp = (
        hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
        % 2
    ).cast("int")
    t = ev.withColumn("g", grp)
    # point estimate: plain mean difference on exact integer sums
    pt = (
        t.groupBy("event_type", "g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sc"))
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("g") == 1,
                    F.col("sc").cast("double") / F.col("n"),
                )
            ).alias("m1"),
            F.max(
                F.when(
                    F.col("g") == 0,
                    F.col("sc").cast("double") / F.col("n"),
                )
            ).alias("m0"),
        )
        .select(
            "event_type", (F.col("m1") - F.col("m0")).alias("uplift")
        )
    )
    b_ = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    u = hash60(
        F.concat(
            F.lit("bs:"),
            F.col("b").cast("string"),
            F.lit(":"),
            F.col("event_id").cast("string"),
        )
    ).cast("double") / float(1 << 60)
    w = F.lit(len(_BOOT_POIS_CDF))
    for j in range(len(_BOOT_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_BOOT_POIS_CDF[j]), F.lit(j)).otherwise(w)
    rep = (
        t.select("event_type", "g", "cents", "event_id", b_)
        .withColumn("w", w.cast("long"))
        .groupBy("event_type", "g", "b")
        .agg(
            F.sum(
                (F.col("w") * F.col("cents")).cast("decimal(38,0)")
            ).alias("swc"),
            F.sum("w").alias("sw"),
        )
    )
    arm = (
        rep.groupBy("event_type", "b")
        .agg(
            F.max(
                F.when(
                    (F.col("g") == 1) & (F.col("sw") > 0),
                    F.col("swc").cast("double") / F.col("sw").cast("double"),
                )
            ).alias("m1"),
            F.max(
                F.when(
                    (F.col("g") == 0) & (F.col("sw") > 0),
                    F.col("swc").cast("double") / F.col("sw").cast("double"),
                )
            ).alias("m0"),
        )
        .select(
            "event_type", "b", (F.col("m1") - F.col("m0")).alias("ub")
        )
        .filter(F.col("ub").isNotNull())
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("ub").asc(), F.col("b").asc()
    )
    ranked = arm.withColumn("rk", F.row_number().over(wr))
    ci = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_boot"),
        F.max(F.when(F.col("rk") == 2, F.col("ub"))).alias("lo"),
        F.max(F.when(F.col("rk") == BOOT_B - 1, F.col("ub"))).alias("hi"),
    )
    return pt.join(ci, "event_type").select(
        "event_type",
        "n_boot",
        _rne(F.col("uplift"), "uplift", 6),
        _rne(F.col("lo"), "ci_lo", 6),
        _rne(F.col("hi"), "ci_hi", 6),
    )


def _sql_events_ab_bootstrap_ci() -> str:
    h = sql_hash60("'ab:' || CAST(user_id AS VARCHAR)")
    hb = sql_hash60(
        "'bs:' || CAST(b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)"
    )
    wcase = "CASE " + " ".join(
        f"WHEN u < {_BOOT_POIS_CDF[j]!r} THEN {j}"
        for j in range(len(_BOOT_POIS_CDF))
    ) + f" ELSE {len(_BOOT_POIS_CDF)} END"
    return f"""
WITH ev AS (
  SELECT event_type, event_id, CAST(({h}) % 2 AS INT) AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
pt AS (
  SELECT event_type,
         max(CASE WHEN g = 1 THEN sc / n END)
           - max(CASE WHEN g = 0 THEN sc / n END) AS uplift
  FROM (SELECT event_type, g, count(*)::DOUBLE AS n,
               sum(cents)::DOUBLE AS sc
        FROM ev GROUP BY 1, 2)
  GROUP BY 1),
reps AS (
  SELECT event_type, g, b,
         sum((w * cents)::DECIMAL(38,0)) AS swc, sum(w) AS sw
  FROM (
    SELECT event_type, g, cents, b, {wcase} AS w
    FROM (
      SELECT e.event_type, e.g, e.cents, r.b,
             ({hb})::DOUBLE / 1152921504606846976.0 AS u
      FROM ev e, LATERAL (SELECT unnest(range(0, {BOOT_B})) AS b) r))
  GROUP BY 1, 2, 3),
arm AS (
  SELECT event_type, b,
         max(CASE WHEN g = 1 AND sw > 0
                  THEN swc::DOUBLE / sw::DOUBLE END)
           - max(CASE WHEN g = 0 AND sw > 0
                      THEN swc::DOUBLE / sw::DOUBLE END) AS ub
  FROM reps GROUP BY 1, 2),
ranked AS (
  SELECT event_type, b, ub,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ub ASC, b ASC) AS rk
  FROM arm WHERE ub IS NOT NULL),
ci AS (
  SELECT event_type, count(*) AS n_boot,
         max(CASE WHEN rk = 2 THEN ub END) AS lo,
         max(CASE WHEN rk = {BOOT_B - 1} THEN ub END) AS hi
  FROM ranked GROUP BY 1)
SELECT event_type, n_boot,
       {_sql_rne('uplift', 'uplift', 6)},
       {_sql_rne('lo', 'ci_lo', 6)},
       {_sql_rne('hi', 'ci_hi', 6)}
FROM pt JOIN ci USING (event_type)"""


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU stickiness per calendar month — the product-health
    metric suite: distinct active users at day/week/month grain with
    stickiness = mean-DAU/MAU (how many of the month's users show up
    on an average day). Exact distinct counts (the HLL family is the
    approximate twin at extreme scale), month grain is calendar-
    bounded, and the DAU mean is a DECIMAL-exact sum of integer daily
    counts over an integer day count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    month = F.to_date(F.date_trunc("month", "day")).alias("month")
    dau = ev.distinct().groupBy(month, F.col("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    per_month_dau = dau.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.sum("dau").alias("sum_dau"),
    )
    mau = (
        ev.select(month, "user_id")
        .distinct()
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    wau = (
        ev.select(
            month,
            F.weekofyear("day").alias("wk"),
            "user_id",
        )
        .distinct()
        .groupBy("month")
        .agg(
            (
                F.count(F.lit(1))
                / F.count_distinct(F.col("wk")).cast("double")
            ).alias("mean_wau")
        )
    )
    j = per_month_dau.join(mau, "month").join(wau, "month")
    mean_dau = F.col("sum_dau").cast("double") / F.col("n_active_days")
    return j.select(
        "month",
        "n_active_days",
        "mau",
        _rne(mean_dau, "mean_dau", 6),
        _rne(F.col("mean_wau"), "mean_wau", 6),
        _rne(mean_dau / F.col("mau"), "stickiness", 6),
    )


SQL_EVENTS_STICKINESS = f"""
WITH ev AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
m AS (
  SELECT user_id, day, CAST(date_trunc('month', day) AS DATE) AS month
  FROM ev),
dau AS (
  SELECT month, day, count(*) AS dau FROM m GROUP BY 1, 2),
pmd AS (
  SELECT month, count(*) AS n_active_days,
         CAST(sum(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY 1),
mau AS (
  SELECT month, count(DISTINCT user_id) AS mau FROM m GROUP BY 1),
wau AS (
  SELECT month,
         CAST(count(DISTINCT (weekofyear(day), user_id)) AS DOUBLE)
           / count(DISTINCT weekofyear(day)) AS mean_wau
  FROM m GROUP BY 1)
SELECT p.month, p.n_active_days, CAST(mau.mau AS BIGINT) AS mau,
       {_sql_rne('CAST(p.sum_dau AS DOUBLE) / p.n_active_days',
                 'mean_dau')},
       {_sql_rne('wau.mean_wau', 'mean_wau')},
       {_sql_rne(
           'CAST(p.sum_dau AS DOUBLE) / p.n_active_days / mau.mau',
           'stickiness')}
FROM pmd p JOIN mau USING (month) JOIN wau USING (month)"""


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion LATENCY — the companion the count-only funnel
    lacks: among converting users, the distribution of time from
    first view to first subsequent click and from that click to first
    subsequent purchase, as exact rank-picked quartiles of integer
    second gaps. Same strictly-after chaining as q_events_funnel (the
    contracts stay consistent), one user exchange, output is
    2 stages × 3 quartiles."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    tv = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("tv")
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"), F.min("tv").alias("tv"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("tp"),
            F.min("tc").alias("tc"),
            F.min("tv").alias("tv"),
        )
    )
    gaps = tp.select(
        "user_id",
        ((F.unix_micros(F.col("tc").cast("timestamp"))
          - F.unix_micros(F.col("tv").cast("timestamp"))) / 1_000_000)
        .cast("long")
        .alias("view_to_click_s"),
        ((F.unix_micros(F.col("tp").cast("timestamp"))
          - F.unix_micros(F.col("tc").cast("timestamp"))) / 1_000_000)
        .cast("long")
        .alias("click_to_purchase_s"),
    )
    require_utc(spark)
    long = gaps.select(
        F.lit("view_to_click").alias("stage"),
        F.col("view_to_click_s").alias("gap_s"),
    ).unionByName(
        gaps.select(
            F.lit("click_to_purchase").alias("stage"),
            F.col("click_to_purchase_s").alias("gap_s"),
        )
    )
    wr = Window.partitionBy("stage").orderBy(F.col("gap_s").asc())
    wn = Window.partitionBy("stage")
    ranked = long.select(
        "stage",
        "gap_s",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    out = None
    for q in (0.25, 0.5, 0.75):
        pick = F.floor((F.col("n") - 1) * F.lit(q)).cast("int") + 1
        part = ranked.filter(F.col("rn") == pick).select(
            "stage",
            F.lit(q).alias("q"),
            F.col("gap_s").alias("gap_seconds"),
            F.col("n").alias("n_converted"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def _sql_events_funnel_latency() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT stage, CAST({q} AS DOUBLE) AS q,
       gap_s AS gap_seconds, CAST(n AS BIGINT) AS n_converted
FROM ranked WHERE rn = CAST(floor((n - 1) * {q}) AS INT) + 1"""
        for q in (0.25, 0.5, 0.75)
    )
    return f"""
WITH tv AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY 1),
tc AS (
  SELECT e.user_id, min(e.ts) AS tc, min(v.tv) AS tv
  FROM events e JOIN tv v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
tp AS (
  SELECT e.user_id, min(e.ts) AS tp, min(c.tc) AS tc, min(c.tv) AS tv
  FROM events e JOIN tc c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1),
long AS (
  SELECT 'view_to_click' AS stage,
         CAST((epoch_us(tc) - epoch_us(tv)) // 1000000 AS BIGINT)
           AS gap_s
  FROM tp
  UNION ALL
  SELECT 'click_to_purchase',
         CAST((epoch_us(tp) - epoch_us(tc)) // 1000000 AS BIGINT)
  FROM tp),
ranked AS (
  SELECT stage, gap_s,
         row_number() OVER (PARTITION BY stage ORDER BY gap_s ASC)
           AS rn,
         count(*) OVER (PARTITION BY stage) AS n
  FROM long)
{arms}"""


def q_events_did_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences uplift per event type — the causal
    readout the plain A/B harness (events_ab_uplift) can't give when
    groups start from different baselines: users hash-split into
    treat/control (same portable hash60 device as the A/B family),
    time split pre/post at the 2/3 point of the observed window
    (integer-micros cut — exact), and
    DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre) over
    exact integer-cents means. On hash-split uniform data the
    expected readout is ≈ 0 — like the A/B harness, the null
    behavior IS the calibration check. One conditional aggregate per
    event type (8 cells in one map-side-combined pass); any empty
    cell propagates NULL identically in both engines."""
    raw = load_table(spark, sf_dir, "events")
    # NTZ->LTZ cast preserves stored micros only under UTC (see
    # q_ts_delta_hist); assert, never set
    ts = F.col("ts")
    if dict(raw.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    ev = raw.select(
        "event_type",
        "user_id",
        F.unix_micros(ts).alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    bounds = ev.agg(
        F.min("us").alias("mn"),
        F.max("us").alias("mx"),
    ).select(
        # integer div on BOTH sides: Spark double->long cast truncates,
        # DuckDB ::BIGINT rounds -- float division would diverge
        F.expr("mn + (mx - mn) * 2 div 3").alias("cut")
    )
    g = (
        hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
        % 2
    ).cast("int")
    t = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        g.alias("g"),
        (F.col("us") >= F.col("cut")).cast("int").alias("post"),
        "cents",
    )

    def cell(gv: int, pv: int, what: str):
        cond = (F.col("g") == gv) & (F.col("post") == pv)
        if what == "n":
            return F.sum(F.when(cond, 1).otherwise(0))
        return F.sum(F.when(cond, F.col("cents")))

    agg = t.groupBy("event_type").agg(
        cell(1, 0, "n").alias("n_tp"),
        cell(1, 0, "s").alias("s_tp"),
        cell(1, 1, "n").alias("n_tq"),
        cell(1, 1, "s").alias("s_tq"),
        cell(0, 0, "n").alias("n_cp"),
        cell(0, 0, "s").alias("s_cp"),
        cell(0, 1, "n").alias("n_cq"),
        cell(0, 1, "s").alias("s_cq"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n) / F.lit(100.0)  # noqa: E731
    did = (m("s_tq", "n_tq") - m("s_tp", "n_tp")) - (
        m("s_cq", "n_cq") - m("s_cp", "n_cp")
    )
    return agg.select(
        "event_type",
        F.col("n_tp").cast("long").alias("n_treat_pre"),
        F.col("n_tq").cast("long").alias("n_treat_post"),
        F.col("n_cp").cast("long").alias("n_ctrl_pre"),
        F.col("n_cq").cast("long").alias("n_ctrl_post"),
        _rne(m("s_tq", "n_tq") - m("s_tp", "n_tp"), "delta_treat", 8),
        _rne(m("s_cq", "n_cq") - m("s_cp", "n_cp"), "delta_ctrl", 8),
        _rne(did, "did", 8),
    )


def _sql_events_did_uplift() -> str:
    m = lambda s, n: f"{s}::DOUBLE / {n} / 100.0"  # noqa: E731
    dt = f"({m('s_tq', 'n_tq')} - {m('s_tp', 'n_tp')})"
    dc = f"({m('s_cq', 'n_cq')} - {m('s_cp', 'n_cp')})"
    return f"""
WITH bounds AS (
  SELECT min(epoch_us(ts))
          + (max(epoch_us(ts)) - min(epoch_us(ts))) * 2 // 3 AS cut
  FROM events),
t AS (
  SELECT event_type,
         ({sql_hash60("'ab:' || CAST(user_id AS VARCHAR)")} % 2)::INT AS g,
         (epoch_us(ts) >= cut)::INT AS post,
         floor(value * 100 + 0.5)::DECIMAL(38,0) AS cents
  FROM events CROSS JOIN bounds),
agg AS (
  SELECT event_type,
         sum(CASE WHEN g = 1 AND post = 0 THEN 1 ELSE 0 END) AS n_tp,
         sum(CASE WHEN g = 1 AND post = 0 THEN cents END) AS s_tp,
         sum(CASE WHEN g = 1 AND post = 1 THEN 1 ELSE 0 END) AS n_tq,
         sum(CASE WHEN g = 1 AND post = 1 THEN cents END) AS s_tq,
         sum(CASE WHEN g = 0 AND post = 0 THEN 1 ELSE 0 END) AS n_cp,
         sum(CASE WHEN g = 0 AND post = 0 THEN cents END) AS s_cp,
         sum(CASE WHEN g = 0 AND post = 1 THEN 1 ELSE 0 END) AS n_cq,
         sum(CASE WHEN g = 0 AND post = 1 THEN cents END) AS s_cq
  FROM t GROUP BY 1)
SELECT event_type,
       n_tp::BIGINT AS n_treat_pre, n_tq::BIGINT AS n_treat_post,
       n_cp::BIGINT AS n_ctrl_pre, n_cq::BIGINT AS n_ctrl_post,
       {_sql_rne(dt, 'delta_treat', 8)},
       {_sql_rne(dc, 'delta_ctrl', 8)},
       {_sql_rne(f'{dt} - {dc}', 'did', 8)}
FROM agg"""


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type — Goh–Barabási
    B = (σ−μ)/(σ+μ) over the gaps between consecutive events of the
    same type (B → −1 periodic, 0 Poisson, → 1 bursty), plus the
    coefficient of variation. The card event-pipeline teams read to
    size stream buffers and pick watermark slack (bursty types need
    both). Gaps are exact integer microseconds off one lag window per
    type ((ts, event_id) total order — simultaneous events break ties
    deterministically); μ and σ ride exact DECIMAL sums with the
    computational-variance identity n·Σx²−(Σx)², so only the final
    sqrt and the two ratios run in float — identical expressions both
    engines. Output is |event types| rows at any corpus scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    # unix_micros requires an instant (LTZ) timestamp; the testdata's
    # ts is TIMESTAMP_NTZ — the NTZ->LTZ cast preserves the stored
    # micros bitwise only under UTC (asserted, never set — the
    # ts_delta_hist convention)
    ts = F.col("ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = (
        ev.withColumn("us", F.unix_micros(ts).cast("decimal(38,0)"))
        .withColumn("gap", F.col("us") - F.lag("us", 1).over(w))
        .filter(F.col("gap").isNotNull())
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).alias("sgg"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("decimal(38,0)")
    var_n2 = nd * F.col("sgg") - F.col("sg") * F.col("sg")  # n² · σ²
    mu = F.col("sg").cast("double") / F.col("n").cast("double")
    sigma = F.sqrt(
        F.greatest(var_n2.cast("double"), F.lit(0.0))
    ) / F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _rne(mu / F.lit(1e6), "mean_gap_s", 8),
        _rne(sigma / F.lit(1e6), "std_gap_s", 8),
        _rne(F.when(mu > 0, sigma / mu), "cv", 8),
        _rne(
            F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)),
            "burstiness",
            8,
        ),
    )


def _sql_events_burstiness() -> str:
    return f"""
WITH g AS (
  SELECT event_type,
         us - lag(us, 1) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM (SELECT event_type, ts, event_id,
               epoch_us(ts)::DECIMAL(38,0) AS us
        FROM events)
  QUALIFY gap IS NOT NULL),
agg AS (
  SELECT event_type, count(*) AS n, sum(gap) AS sg,
         sum(gap * gap) AS sgg
  FROM g GROUP BY 1 HAVING count(*) >= 2),
st AS (
  SELECT event_type, n,
         sg::DOUBLE / n::DOUBLE AS mu,
         sqrt(greatest((n::DECIMAL(38,0) * sgg - sg * sg)::DOUBLE, 0.0))
           / n::DOUBLE AS sigma
  FROM agg)
SELECT event_type, n::BIGINT AS n,
       {_sql_rne('mu / 1000000.0', 'mean_gap_s', 8)},
       {_sql_rne('sigma / 1000000.0', 'std_gap_s', 8)},
       {_sql_rne('CASE WHEN mu > 0 THEN sigma / mu END', 'cv', 8)},
       {_sql_rne(
           'CASE WHEN sigma + mu > 0 '
           'THEN (sigma - mu) / (sigma + mu) END',
           'burstiness', 8)}
FROM st"""


def q_events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain — the
    information-theoretic ceiling on next-action predictability that
    sits on top of events_markov_transitions: per current state,
    H(next|cur) = −Σ p ln p over its outgoing transitions, π(cur) =
    its empirical share of transitions, and the rate contribution
    π·H. Σ contributions = the chain's entropy rate (the driver sums
    rows; each row is one state). All counts are exact integers off
    ONE lead window on the user exchange; each entropy term is a
    single ln of an integer ratio snapped to the 1e-12 grid and
    summed in DECIMAL; the |states|-sized output is dimension-bounded
    at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    trans = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = trans.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).alias("ncn")
    )
    tot_c = cnt.groupBy("cur").agg(F.sum("ncn").alias("nc"))
    total = cnt.agg(F.sum("ncn").alias("nn"))
    j = cnt.join(tot_c, "cur").crossJoin(F.broadcast(total))
    p_cond = F.col("ncn").cast("double") / F.col("nc").cast("double")
    hterm = (
        F.floor(-p_cond * F.log(p_cond) * 1e12 + F.lit(0.5)) / 1e12
    ).cast("decimal(30,12)")
    agg = j.groupBy("cur", "nc", "nn").agg(F.sum(hterm).alias("sh"))
    pi = F.col("nc").cast("double") / F.col("nn").cast("double")
    h_cond = F.col("sh").cast("double")
    return agg.select(
        "cur",
        F.col("nc").cast("long").alias("n_from"),
        _rne(pi, "pi", 8),
        _rne(h_cond, "h_cond", 8),
        _rne(pi * h_cond, "rate_contrib", 8),
    )


def _sql_events_entropy_rate() -> str:
    return f"""
WITH trans AS (
  SELECT event_type AS cur, lead(event_type) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
cnt AS (
  SELECT cur, nxt, count(*) AS ncn FROM trans
  WHERE nxt IS NOT NULL GROUP BY 1, 2),
tot_c AS (SELECT cur, sum(ncn) AS nc FROM cnt GROUP BY 1),
total AS (SELECT sum(ncn) AS nn FROM cnt),
terms AS (
  SELECT cnt.cur, tot_c.nc, total.nn,
         CAST(floor(-(cnt.ncn::DOUBLE / tot_c.nc::DOUBLE)
                    * ln(cnt.ncn::DOUBLE / tot_c.nc::DOUBLE)
                * 1000000000000.0 + 0.5)
              / 1000000000000.0 AS DECIMAL(30,12)) AS hterm
  FROM cnt JOIN tot_c ON cnt.cur = tot_c.cur CROSS JOIN total),
agg AS (
  SELECT cur, nc, nn, sum(hterm)::DOUBLE AS h_cond
  FROM terms GROUP BY 1, 2, 3)
SELECT cur, nc::BIGINT AS n_from,
       {_sql_rne('nc::DOUBLE / nn::DOUBLE', 'pi', 8)},
       {_sql_rne('h_cond', 'h_cond', 8)},
       {_sql_rne('(nc::DOUBLE / nn::DOUBLE) * h_cond',
                 'rate_contrib', 8)}
FROM agg"""


def q_events_chisq_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence audit: is event_type volume independent of
    day-of-week? The seasonality screen a pipeline runs before
    trusting a daily-aggregated metric (a type that clusters on
    weekends biases any day-sampled train split). Day-of-week is
    computed engine-neutrally as (days-since-epoch + 3) mod 7 (Mon=0 —
    the W7 calendar convention; Spark's dayofweek() and DuckDB's
    disagree on numbering). Observed counts are exact; row/column/
    grand totals ride windows over the CELL frame (|types|·7 rows —
    calendar-bounded, never data-sized); expected = rt·ct/N and the
    per-cell contribution are final float ops. Output is one row per
    cell; Σcontrib ~ χ²((R−1)(C−1))."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    )
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")) + F.lit(3)
    ) % 7
    cells = ev.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = F.sum("obs").over(Window.partitionBy("event_type"))
    ct = F.sum("obs").over(Window.partitionBy("dow"))
    nn = F.sum("obs").over(Window.partitionBy())
    c = cells.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        "obs",
        rt.alias("rt"),
        ct.alias("ct"),
        nn.alias("nn"),
    )
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("nn").cast("double")
    )
    o = F.col("obs").cast("double")
    return c.select(
        "event_type",
        "dow",
        F.col("obs").cast("long").alias("observed"),
        _rne(e, "expected", 6),
        _rne((o - e) * (o - e) / e, "contrib", 8),
    )


def _sql_events_chisq_type_dow() -> str:
    e = "rt::DOUBLE * ct::DOUBLE / nn::DOUBLE"
    return f"""
WITH cells AS (
  SELECT event_type,
         ((ts::DATE - DATE '1970-01-01') + 3) % 7 AS dow,
         count(*) AS obs
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
tot AS (
  SELECT event_type, dow, obs,
         sum(obs) OVER (PARTITION BY event_type) AS rt,
         sum(obs) OVER (PARTITION BY dow) AS ct,
         sum(obs) OVER () AS nn
  FROM cells)
SELECT event_type, dow::BIGINT AS dow, obs::BIGINT AS observed,
       {_sql_rne(e, 'expected', 6)},
       {_sql_rne(
           f'(obs::DOUBLE - ({e})) * (obs::DOUBLE - ({e})) / ({e})',
           'contrib', 8)}
FROM tot"""


def q_events_mw_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test per event_type on the hash60 A/B split —
    the NONPARAMETRIC twin of events_ab_uplift's Welch t (rank-based:
    immune to the heavy tails ts_jarque_bera just flagged; U/(nA·nB)
    is the common-language effect size = P(A-draw > B-draw)). Values
    ride exact integer cents; the rank sum uses average ranks in
    DOUBLED units (2·rankavg = 2·below + cnt + 1 — all integers) with
    'below' computed TWO-PHASE per type: strict prefix within
    (type, log2-bucket) partitions + a per-type prefix over the
    ≤~60-row bucket frame joined back broadcast — never a data-sized
    single-task per-type sort (the BM25 lesson, grouped variant of
    operators/twophase.py). Tie variance uses Σ(t³−t) exact; z and
    the AUC are the only float ops. Output is |types| rows."""
    from ..operators.twophase import log2_bucket

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .filter(F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    )
    g = (
        hash60(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 2
    ).cast("int")
    vals = (
        ev.withColumn("g", g)
        .groupBy("event_type", "cents")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("g")).alias("ca"),
        )
    )
    vals = vals.withColumn("bkt", log2_bucket(F.col("cents")))
    wloc = (
        Window.partitionBy("event_type", "bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vals = vals.withColumn("loc", F.sum("cnt").over(wloc))
    btot = vals.groupBy("event_type", "bkt").agg(
        F.sum("cnt").alias("bt")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = btot.select(
        "event_type", "bkt", F.sum("bt").over(wb).alias("pri")
    )
    d = vals.join(F.broadcast(prior), ["event_type", "bkt"])
    below = F.coalesce(F.col("loc"), F.lit(0)) + F.coalesce(
        F.col("pri"), F.lit(0)
    )
    cd = F.col("cnt").cast("decimal(38,0)")
    r2a = F.col("ca").cast("decimal(38,0)") * (
        F.lit(2).cast("decimal(38,0)") * below.cast("decimal(38,0)")
        + cd
        + F.lit(1).cast("decimal(38,0)")
    )
    tie = cd * cd * cd - cd
    agg = d.groupBy("event_type").agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("cnt") - F.col("ca")).alias("nb"),
        F.sum(r2a).alias("s2r"),
        F.sum(tie).alias("st"),
    ).filter((F.col("na") >= MW_MIN_GROUP) & (F.col("nb") >= MW_MIN_GROUP))
    nad = F.col("na").cast("decimal(38,0)")
    u2 = F.col("s2r") - nad * (nad + F.lit(1).cast("decimal(38,0)"))
    na_ = F.col("na").cast("double")
    nb_ = F.col("nb").cast("double")
    n_ = na_ + nb_
    st_ = F.col("st").cast("double")
    u2_ = u2.cast("double")
    varu = (
        na_
        * nb_
        / F.lit(12.0)
        * ((n_ + F.lit(1.0)) - st_ / (n_ * (n_ - F.lit(1.0))))
    )
    z = F.when(varu > 0, (u2_ - na_ * nb_) / (F.lit(2.0) * F.sqrt(varu)))
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        _rne(u2_ / F.lit(2.0), "u", 4),
        _rne(u2_ / (F.lit(2.0) * na_ * nb_), "auc", 8),
        _rne(z, "z", 8),
    )


def _sql_events_mw_utest() -> str:
    # the oracle states the prefix as ONE plain per-type cumulative
    # window — DuckDB is single-node; the two-phase Spark form is
    # bitwise-identical by the association-exactness argument
    # (integer counts) documented in operators/twophase.py
    varu = (
        "na::DOUBLE * nb::DOUBLE / 12.0 * ((na::DOUBLE + nb::DOUBLE + 1.0)"
        " - st::DOUBLE / ((na::DOUBLE + nb::DOUBLE)"
        " * (na::DOUBLE + nb::DOUBLE - 1.0)))"
    )
    return f"""
WITH ev AS (
  SELECT event_type,
         floor(value * 100 + 0.5)::BIGINT AS cents,
         ({sql_hash60("'ab:' || CAST(user_id AS VARCHAR)")}) % 2 AS g
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
vals AS (
  SELECT event_type, cents, count(*) AS cnt, sum(g) AS ca
  FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, cents, cnt, ca,
         coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM vals),
agg AS (
  SELECT event_type, sum(ca) AS na, sum(cnt - ca) AS nb,
         sum(ca::DECIMAL(38,0) * (2::DECIMAL(38,0) * below::DECIMAL(38,0)
             + cnt::DECIMAL(38,0) + 1::DECIMAL(38,0))) AS s2r,
         sum(cnt::DECIMAL(38,0) * cnt::DECIMAL(38,0) * cnt::DECIMAL(38,0)
             - cnt::DECIMAL(38,0)) AS st
  FROM cum GROUP BY 1
  HAVING sum(ca) >= {MW_MIN_GROUP} AND sum(cnt - ca) >= {MW_MIN_GROUP}),
fit AS (
  SELECT event_type, na, nb, st,
         (s2r - na::DECIMAL(38,0) * (na::DECIMAL(38,0)
            + 1::DECIMAL(38,0)))::DOUBLE AS u2_
  FROM agg)
SELECT event_type, na::BIGINT AS n_a, nb::BIGINT AS n_b,
       {_sql_rne('u2_ / 2.0', 'u', 4)},
       {_sql_rne('u2_ / (2.0 * na::DOUBLE * nb::DOUBLE)', 'auc', 8)},
       {_sql_rne(
           f'CASE WHEN {varu} > 0 THEN (u2_ - na::DOUBLE * nb::DOUBLE)'
           f' / (2.0 * sqrt({varu})) END', 'z', 8)}
FROM fit"""


def q_events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the growth-accounting
    card under every retention analysis (DAU alone hides whether
    growth is acquisition or habit; this splits it): a user is NEW on
    their first active day, RETURNING on any later active day. One
    (user, day) distinct, one per-user min-day aggregate, one
    co-partitioned join back on user_id (both sides hash by user —
    no extra exchange), one per-day count — all exact integers."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .filter(F.col("user_id").isNotNull() & F.col("day").isNotNull())
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ev.join(first, "user_id")
    agg = j.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).alias("n_new"),
    )
    return agg.select(
        "day",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_new").cast("long").alias("n_new"),
        (F.col("n_active") - F.col("n_new"))
        .cast("long")
        .alias("n_returning"),
    )


def _sql_events_new_vs_returning() -> str:
    return """
WITH a AS (
  SELECT DISTINCT user_id, ts::DATE AS day FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, min(day) AS first_day FROM a GROUP BY 1)
SELECT a.day, count(*)::BIGINT AS n_active,
       sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)::BIGINT
         AS n_new,
       (count(*) - sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0
        END))::BIGINT AS n_returning
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1"""


def q_events_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifespan histogram — days between first and last activity,
    bucketed on fixed power-of-two bounds (0, 1, 2–3, 4–7, …, 512+):
    the engagement-depth summary that complements the per-cohort
    retention matrix with one corpus-level distribution (and sizes
    TTL/state-retention decisions: the watermark a streaming
    attribution op needs IS a lifespan quantile). The bucket is a
    generated CASE chain over integer day-diffs — NO float log2
    (Math.log-based log2 can return 2.9999…96 at exact powers of two
    and mis-bucket in exactly one engine). One per-user aggregate +
    one |buckets|-row aggregate, exact integers throughout."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .filter(F.col("user_id").isNotNull() & F.col("day").isNotNull())
    )
    per = ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    span = F.datediff(F.col("last_day"), F.col("first_day"))
    bucket = F.lit(int(LIFESPAN_BOUNDS[-1]))
    for lo in reversed(LIFESPAN_BOUNDS[:-1]):
        nxt = LIFESPAN_BOUNDS[LIFESPAN_BOUNDS.index(lo) + 1]
        bucket = F.when(span < nxt, F.lit(int(lo))).otherwise(bucket)
    agg = per.select(
        bucket.alias("span_bucket"),
        span.alias("span"),
        "n_events",
    ).groupBy("span_bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("se"),
        F.sum("span").alias("ss"),
    )
    n_ = F.col("n_users").cast("double")
    return agg.select(
        F.col("span_bucket").cast("long").alias("span_bucket"),
        F.col("n_users").cast("long").alias("n_users"),
        _rne(F.col("se").cast("double") / n_, "mean_events", 8),
        _rne(F.col("ss").cast("double") / n_, "mean_span_days", 8),
    )


def _sql_events_user_lifespan() -> str:
    arms = " ".join(
        f"WHEN span < {LIFESPAN_BOUNDS[i + 1]} THEN {lo}"
        for i, lo in enumerate(LIFESPAN_BOUNDS[:-1])
    )
    return f"""
WITH per AS (
  SELECT user_id, max(ts::DATE) - min(ts::DATE) AS span,
         count(*) AS n_events
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1),
b AS (
  SELECT CASE {arms} ELSE {LIFESPAN_BOUNDS[-1]} END AS span_bucket,
         span, n_events
  FROM per),
agg AS (
  SELECT span_bucket, count(*) AS n_users, sum(n_events) AS se,
         sum(span) AS ss
  FROM b GROUP BY 1)
SELECT span_bucket::BIGINT AS span_bucket, n_users::BIGINT AS n_users,
       {_sql_rne('se::DOUBLE / n_users::DOUBLE', 'mean_events', 8)},
       {_sql_rne('ss::DOUBLE / n_users::DOUBLE', 'mean_span_days', 8)}
FROM agg"""


def q_events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event_type — the robust
    complement of the z-score anomaly card (fences at q1/q3 ±
    1.5·IQR are median-family statistics a few wild values cannot
    drag, unlike a mean/σ filter at the exact moment it matters).
    Quantiles use Spark's exact sort-based ``percentile`` —
    bit-identical contract to DuckDB's quantile_cont (the
    events_value_quantiles device; at 100 TB swap percentile_approx
    in the same shape) — then ONE broadcast join of the |types|-row
    stats frame back to the scan for the exact fence counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
    q = F.expr("percentile(value, array(0.25D, 0.75D))")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), q.alias("qs")
    ).select(
        "event_type",
        "n",
        F.element_at("qs", 1).alias("q1"),
        F.element_at("qs", 2).alias("q3"),
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    j = ev.join(F.broadcast(stats), "event_type")
    agg = j.groupBy("event_type", "n", "q1", "q3").agg(
        F.sum(F.when(F.col("value") < lo, 1).otherwise(0)).alias(
            "n_low"
        ),
        F.sum(F.when(F.col("value") > hi, 1).otherwise(0)).alias(
            "n_high"
        ),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _rne(F.col("q1"), "q1", 6),
        _rne(F.col("q3"), "q3", 6),
        F.col("n_low").cast("long").alias("n_low"),
        F.col("n_high").cast("long").alias("n_high"),
        _rne(
            (F.col("n_low") + F.col("n_high")).cast("double")
            / F.col("n").cast("double"),
            "outlier_share",
            8,
        ),
    )


def _sql_events_iqr_outliers() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
stats AS (
  SELECT event_type, count(*) AS n,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM ev GROUP BY 1),
agg AS (
  SELECT e.event_type, s.n, s.q1, s.q3,
         sum(CASE WHEN e.value < s.q1 - 1.5 * (s.q3 - s.q1)
                  THEN 1 ELSE 0 END) AS n_low,
         sum(CASE WHEN e.value > s.q3 + 1.5 * (s.q3 - s.q1)
                  THEN 1 ELSE 0 END) AS n_high
  FROM ev e JOIN stats s ON e.event_type = s.event_type
  GROUP BY 1, 2, 3, 4)
SELECT event_type, n::BIGINT AS n,
       {_sql_rne('q1', 'q1', 6)},
       {_sql_rne('q3', 'q3', 6)},
       n_low::BIGINT AS n_low, n_high::BIGINT AS n_high,
       {_sql_rne('(n_low + n_high)::DOUBLE / n::DOUBLE',
                 'outlier_share', 8)}
FROM agg"""


def q_events_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift over (user, day) baskets — which
    behaviors travel together (lift > 1) or repel (lift < 1): the
    type-level association view beside events_assoc_rules' itemset
    rules and events_markov_transitions' sequential view. Baskets are
    distinct (user, day, type) triples; the pair expansion self-joins
    WITHIN a basket, so work is Σ per-basket |types|² — bounded by
    the type-universe, never the corpus. lift = c12·B/(c1·c2) and
    PMI = ln lift are exact-integer ratios with one ln; |types|²
    output rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .filter(
            F.col("user_id").isNotNull()
            & F.col("day").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .distinct()
    )
    baskets = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("sz")
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("b"))
    singles = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c1"))
    a = ev.select("user_id", "day", F.col("event_type").alias("t1"))
    b = ev.select("user_id", "day", F.col("event_type").alias("t2"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    j = (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("t1"),
                                       F.col("c1").alias("ca"))),
            "t1",
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("t2"),
                                       F.col("c1").alias("cb"))),
            "t2",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    lift = (
        F.col("c12").cast("double")
        * F.col("b").cast("double")
        / (F.col("ca").cast("double") * F.col("cb").cast("double"))
    )
    return j.select(
        "t1",
        "t2",
        F.col("c12").cast("long").alias("n_cooccur"),
        _rne(lift, "lift", 8),
        _rne(F.log(lift), "pmi", 8),
    )


def _sql_events_type_lift() -> str:
    lift = "c12::DOUBLE * b::DOUBLE / (ca::DOUBLE * cb::DOUBLE)"
    return f"""
WITH ev AS (
  SELECT DISTINCT user_id, ts::DATE AS day, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
nb AS (
  SELECT count(*) AS b FROM (SELECT DISTINCT user_id, day FROM ev)),
singles AS (SELECT event_type, count(*) AS c1 FROM ev GROUP BY 1),
pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS c12
  FROM ev a JOIN ev b
    ON a.user_id = b.user_id AND a.day = b.day
    AND a.event_type < b.event_type
  GROUP BY 1, 2),
j AS (
  SELECT p.t1, p.t2, p.c12, sa.c1 AS ca, sb.c1 AS cb, nb.b
  FROM pairs p
  JOIN singles sa ON sa.event_type = p.t1
  JOIN singles sb ON sb.event_type = p.t2
  CROSS JOIN nb)
SELECT t1, t2, c12::BIGINT AS n_cooccur,
       {_sql_rne(lift, 'lift', 8)},
       {_sql_rne(f'ln({lift})', 'pmi', 8)}
FROM j"""


def q_events_retention_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-decay fit — pooled day-k retention rates for k =
    1..14 with an exponential fit ln(r_k) = a + b·k → half-life =
    −ln2/b: the one-number engagement summary on top of the cohort
    matrix (and the principled way to size streaming state TTLs —
    the half-life IS the state-retention knob). Only FULLY OBSERVABLE
    users enter (first day ≤ max day − 14, one broadcast scalar) so
    late cohorts can't bias the tail; rates are exact integer ratios,
    their lns snap to the 1e-12 grid, and the OLS runs over a ≤14-row
    frame. Output is one row."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .filter(F.col("user_id").isNotNull() & F.col("day").isNotNull())
        .distinct()
    )
    mx = ev.agg(F.max("day").alias("mxd"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    obs = first.crossJoin(F.broadcast(mx)).filter(
        F.col("fd") <= F.date_sub(F.col("mxd"), RET_DECAY_MAX_K)
    ).select("user_id", "fd")
    nobs = obs.agg(F.count(F.lit(1)).alias("nu"))
    act = ev.join(obs, "user_id").select(
        "user_id", F.datediff(F.col("day"), F.col("fd")).alias("k")
    ).filter((F.col("k") >= 1) & (F.col("k") <= RET_DECAY_MAX_K))
    byk = act.groupBy("k").agg(
        F.countDistinct("user_id").alias("uk")
    ).crossJoin(F.broadcast(nobs))
    lr = F.log(
        F.col("uk").cast("double") / F.col("nu").cast("double")
    )
    pts = byk.filter(F.col("uk") > 0).select(
        F.col("k").cast("decimal(38,0)").alias("x"),
        F.floor(lr * F.lit(1e12) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("yq"),
        "nu",
    )
    agg = pts.groupBy("nu").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("x") * F.col("yq")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
    ).filter(F.col("np") >= 3)
    nd = F.col("np").cast("decimal(38,0)")
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    b = F.when(vx > 0, cov / vx / F.lit(1e12))
    r2 = F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
    half = F.when(b < 0, F.lit(-math.log(2.0)) / b)
    return agg.select(
        F.col("nu").cast("long").alias("n_users"),
        F.col("np").cast("long").alias("k_points"),
        _rne(b, "decay_rate", 10),
        _rne(half, "halflife_days", 6),
        _rne(r2, "r2", 8),
    )


def _sql_events_retention_decay() -> str:
    k = RET_DECAY_MAX_K
    vx = "(np::DECIMAL(38,0) * sxx - sx * sx)::DOUBLE"
    vy = "(np::DECIMAL(38,0) * syy - sy * sy)::DOUBLE"
    cov = "(np::DECIMAL(38,0) * sxy - sx * sy)::DOUBLE"
    b = f"CASE WHEN {vx} > 0 THEN {cov} / {vx} / 1e12 END"
    return f"""
WITH a AS (
  SELECT DISTINCT user_id, ts::DATE AS day FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
mx AS (SELECT max(day) AS mxd FROM a),
first AS (SELECT user_id, min(day) AS fd FROM a GROUP BY 1),
obs AS (
  SELECT user_id, fd FROM first, mx
  WHERE fd <= mxd - INTERVAL {k} DAY),
nobs AS (SELECT count(*) AS nu FROM obs),
act AS (
  SELECT a.user_id, (a.day - o.fd) AS kk
  FROM a JOIN obs o ON a.user_id = o.user_id
  WHERE (a.day - o.fd) BETWEEN 1 AND {k}),
byk AS (
  SELECT kk, count(DISTINCT user_id) AS uk FROM act GROUP BY 1),
pts AS (
  SELECT kk::DECIMAL(38,0) AS x,
         floor(ln(uk::DOUBLE / nu::DOUBLE) * 1000000000000.0 + 0.5)
           ::DECIMAL(38,0) AS yq,
         nu
  FROM byk, nobs WHERE uk > 0),
agg AS (
  SELECT nu, count(*) AS np, sum(x) AS sx, sum(yq) AS sy,
         sum(x * yq) AS sxy, sum(x * x) AS sxx, sum(yq * yq) AS syy
  FROM pts GROUP BY 1 HAVING count(*) >= 3)
SELECT nu::BIGINT AS n_users, np::BIGINT AS k_points,
       {_sql_rne(b, 'decay_rate', 10)},
       {_sql_rne(
           f'CASE WHEN ({b}) < 0 THEN {-math.log(2.0)!r} / ({b}) END',
           'halflife_days', 6)},
       {_sql_rne(
           f'CASE WHEN {vx} > 0 AND {vy} > 0 THEN ({cov}) * ({cov})'
           f' / (({vx}) * ({vy})) END', 'r2', 8)}
FROM agg"""


def q_events_type_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-audience overlap between event types: Jaccard of the
    distinct user sets for every type pair (t1 < t2) — the audience-
    segmentation view beside events_type_lift's basket co-occurrence
    (lift asks 'do they happen together'; this asks 'do the same
    PEOPLE do both'). Distinct (type, user) pairs self-join on the
    user key (work = Σ per-user |types|², bounded by the type
    universe, never the corpus); Jaccard is one IEEE division of
    exact longs. Type pair count is |types|²/2 — tiny — so the
    output is a complete matrix, no top-k cut needed."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select(
        F.col("event_type").alias("t"), F.col("user_id").alias("u")
    ).distinct()
    a = tu.select(F.col("t").alias("t1"), "u")
    b = tu.select(F.col("t").alias("t2"), "u")
    inter = (
        a.join(b, "u")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = tu.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("t").alias("t1"),
                                     F.col("n").alias("n1"))), "t1"
        )
        .join(
            F.broadcast(sizes.select(F.col("t").alias("t2"),
                                     F.col("n").alias("n2"))), "t2"
        )
    )
    return out.select(
        "t1",
        "t2",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n_both").cast("long").alias("n_both"),
        _rne(
            F.col("n_both").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_both")).cast("double"),
            "jaccard",
            8,
        ),
    )


def _sql_events_type_user_jaccard() -> str:
    return f"""
WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
inter AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS n_both
  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2),
sizes AS (SELECT t, count(*) AS n FROM tu GROUP BY 1)
SELECT t1, t2, s1.n::BIGINT AS n1, s2.n::BIGINT AS n2,
       n_both::BIGINT AS n_both,
       {_sql_rne('n_both::DOUBLE / (s1.n + s2.n - n_both)::DOUBLE',
                 'jaccard', 8)}
FROM inter JOIN sizes s1 ON inter.t1 = s1.t
           JOIN sizes s2 ON inter.t2 = s2.t"""


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: exact median(value), MAD
    (median absolute deviation), and the count/share of values beyond
    the 3σ-equivalent robust fence (3·1.4826·MAD) — the batch sibling
    of ts_rolling_median's robust z (a mean/std fence would let one
    heavy tail drag its own threshold; the MAD fence doesn't). Two
    exact interpolated-percentile aggregates (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, same classical estimator) with the
    per-type medians broadcast back — never a global sort. Counts are
    exact longs; med/mad round on the shared grid."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), F.col("value").alias("v")
    )
    med = ev.groupBy("t").agg(
        F.expr("percentile(v, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = ev.join(F.broadcast(med), "t").select(
        "t", "v", "med", "n", F.abs(F.col("v") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("t").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    out = dev.join(F.broadcast(mad), "t")
    fence = F.lit(3.0 * 1.4826) * F.col("mad")
    agg = out.groupBy("t").agg(
        F.first("n").alias("n"),
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
        F.sum((F.col("ad") > fence).cast("long")).alias("n_out"),
    )
    return agg.select(
        F.col("t").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        _rne(F.col("med"), "med", 8),
        _rne(F.col("mad"), "mad", 8),
        F.col("n_out").cast("long").alias("n_outliers"),
        _rne(
            F.col("n_out").cast("double") / F.col("n").cast("double"),
            "outlier_share",
            8,
        ),
    )


def _sql_events_mad_outliers() -> str:
    return f"""
WITH ev AS (SELECT event_type AS t, value AS v FROM events),
med AS (
  SELECT t, quantile_cont(v, 0.5) AS med, count(*) AS n
  FROM ev GROUP BY 1),
dev AS (
  SELECT ev.t, v, med, n, abs(v - med) AS ad
  FROM ev JOIN med USING (t)),
mad AS (SELECT t, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1),
agg AS (
  SELECT t, first(n) AS n, first(med) AS med, first(mad) AS mad,
         sum(CASE WHEN ad > 3.0 * 1.4826 * mad THEN 1 ELSE 0 END) AS n_out
  FROM dev JOIN mad USING (t) GROUP BY t)
SELECT t AS event_type, n::BIGINT AS n,
       {_sql_rne('med', 'med', 8)},
       {_sql_rne('mad', 'mad', 8)},
       n_out::BIGINT AS n_outliers,
       {_sql_rne('n_out::DOUBLE / n::DOUBLE', 'outlier_share', 8)}
FROM agg"""
