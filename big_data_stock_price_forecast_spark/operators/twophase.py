"""Two-phase (bucketed) global-order prefix aggregates.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
frame into ONE task — the classic global-sort straggler. When the
prefix aggregate's ordering key is a value (not an arbitrary rank),
the standard distributed form is range-partitioned two-phase:

1. bucket every row by a MONOTONIC function of the leading order key
   (e.g. ``floor(log2(x))`` — bucket count bounded by the value
   range, not the row count),
2. compute the prefix aggregate WITHIN each bucket in parallel
   (``Window.partitionBy(bucket)`` — many tasks),
3. aggregate one total per bucket, run the global prefix over the
   bucket-count-sized frame (a window over ≤~2k rows — driver-safe),
4. join the prior-bucket prefix back (broadcast — tiny) and combine.

The result is bitwise-identical to the single-task global window
(same total ordering — equal keys land in the same bucket, so the
within-bucket tie-break is the global tie-break) — PROVIDED the
aggregate is association-exact: integer/DECIMAL sums, counts, min/
max. A raw float/double SUM is NOT (the two-phase combine groups the
additions differently, and IEEE addition is non-associative — found
by the hypothesis test at values straddling a bucket boundary);
every registry call site therefore sums exact types only (the
engine-wide snap-to-grid → DECIMAL discipline), which is also what
makes the DuckDB oracles' plain global-window formulation match.

Used by the registry's part_skyline / lineitem_abc_analysis /
events_gini / orders_open_concurrency / orders_survival_km plans
(the round-6 verdict's "single-task global sort" scale holes)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__tp_bucket"
_LOCAL = "__tp_local"
_PRIOR = "__tp_prior"
_BTOTAL = "__tp_btotal"


def log2_bucket(col: Column) -> Column:
    """Monotonic non-decreasing bucket id for positive-ish values:
    floor(log2(max(x, 1))). Values ≤ 1 share bucket 0 (monotonicity
    holds — they are all ≤ every bucket-1 value). Bucket count is
    bounded by the VALUE range (≤ ~2100 for doubles), independent of
    row count."""
    return F.floor(F.log2(F.greatest(col.cast("double"), F.lit(1.0))))


def prefix_agg(
    df: DataFrame,
    value: Column,
    bucket: Column,
    order_by: list[Column],
    *,
    agg: str = "sum",
    bucket_asc: bool = True,
    strict: bool = True,
    out_col: str = "prefix",
) -> DataFrame:
    """Add ``out_col`` = AGG(value) over all rows before the current
    one in the global ordering, computed two-phase (no single-task
    global sort).

    ``bucket`` MUST be monotonic (non-decreasing if ``bucket_asc``,
    non-increasing otherwise) in the global ordering's leading key —
    equal leading keys must share a bucket so the within-bucket
    tie-break IS the global tie-break. ``strict`` excludes the current
    row (rowsBetween(unboundedPreceding, -1)); an empty frame yields
    NULL, matching the plain global window.

    agg ∈ {"sum", "max", "count"}; for "count" the prefix is the
    number of earlier rows (value ignored), i.e. rank−1 when strict.
    """
    aggf = {"sum": F.sum, "max": F.max, "count": F.count}[agg]
    v = F.lit(1) if agg == "count" else value
    df2 = df.withColumn(_BUCKET, bucket)
    end = -1 if strict else 0
    wloc = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    df2 = df2.withColumn(_LOCAL, aggf(v).over(wloc))
    btotals = df2.groupBy(_BUCKET).agg(aggf(v).alias(_BTOTAL))
    border = F.col(_BUCKET).asc() if bucket_asc else F.col(_BUCKET).desc()
    wb = Window.orderBy(border).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = btotals.select(
        _BUCKET, F.sum(_BTOTAL).over(wb).alias(_PRIOR)
        if agg in ("sum", "count")
        else F.max(_BTOTAL).over(wb).alias(_PRIOR),
    )
    out = df2.join(F.broadcast(prior), _BUCKET)
    if agg == "max":
        # greatest() skips NULLs; NULL only when both sides are NULL —
        # exactly the empty-prefix-frame semantics of the plain window
        combined = F.greatest(F.col(_LOCAL), F.col(_PRIOR))
    else:
        combined = F.when(
            F.col(_LOCAL).isNull() & F.col(_PRIOR).isNull(), F.lit(None)
        ).otherwise(
            F.coalesce(F.col(_LOCAL), F.lit(0)) + F.coalesce(F.col(_PRIOR), F.lit(0))
        )
    return out.withColumn(out_col, combined).drop(_BUCKET, _LOCAL, _PRIOR)


def ntile_from_rank(
    rank: Column, n_total: Column, n_buckets: int
) -> Column:
    """NTILE(n) as a pure function of the 1-based global rank and the
    total row count — Spark and DuckDB share the even-split rule: the
    first (N mod n) buckets hold floor(N/n)+1 rows, the rest
    floor(N/n). Expressing NTILE this way is what lets it ride the
    two-phase prefix rank instead of a single-task global sort.
    Integer arithmetic throughout (counts are exact longs)."""
    n = n_total.cast("long")
    b = F.lit(int(n_buckets)).cast("long")
    q = F.floor(n / b).cast("long")
    rem = (n % b).cast("long")
    boundary = rem * (q + F.lit(1))
    # q = 0 (N < n) never reaches the otherwise-branch: boundary = N
    # covers every rank, and CASE branches evaluate lazily.
    return F.when(
        rank <= boundary,
        (F.floor((rank - F.lit(1)) / (q + F.lit(1))) + F.lit(1)).cast(
            "int"
        ),
    ).otherwise(
        (
            rem
            + F.floor((rank - boundary - F.lit(1)) / q)
            + F.lit(1)
        ).cast("int")
    )


def ntile_two_phase(
    df: DataFrame,
    order_by: list[Column],
    bucket: Column,
    n_buckets: int,
    *,
    bucket_asc: bool = True,
    out_col: str = "ntile",
) -> DataFrame:
    """Add ``out_col`` = NTILE(n_buckets) over the global ordering,
    computed two-phase: global rank via the bucketed strict prefix
    COUNT (+1), total count via one broadcast scalar, then
    ``ntile_from_rank``. ``order_by`` MUST be a total order (fully
    tie-broken) — NTILE over ties is otherwise nondeterministic in
    any engine — and ``bucket`` must be monotonic in its leading key
    (see ``prefix_agg``). No data-sized single-task sort anywhere:
    the only unpartitioned window runs over the bucket-count frame."""
    ranked = prefix_agg(
        df,
        F.lit(1),
        bucket,
        order_by,
        agg="count",
        bucket_asc=bucket_asc,
        strict=True,
        out_col="__tp_rank0",
    )
    total = df.agg(F.count(F.lit(1)).alias("__tp_n"))
    out = ranked.crossJoin(F.broadcast(total))
    rank = F.col("__tp_rank0") + F.lit(1)
    return out.withColumn(
        out_col, ntile_from_rank(rank, F.col("__tp_n"), n_buckets)
    ).drop("__tp_rank0", "__tp_n")


def affine_ema_scan(
    df: DataFrame,
    value_col: str,
    part_col: str = "symbol",
    idx_col: str = "time_idx",
    *,
    alpha: float = 0.5,
    seg_len: int = 256,
    term_scale: float = 1e12,
) -> DataFrame:
    """Per-partition EMA final state via a two-phase SEGMENT-COMPOSED
    scan — the parallel-prefix form of the W4 affine recursion
    ``v ← (1−α)·v + α·x`` (seeded with the first value), lifting the
    one-task-per-symbol constraint of the sequential Arrow pass
    (SCALE.md "inherent to recursion" — no longer inherent):

    1. rows bucket into fixed-length segments (``seg = (rn−1) div
       seg_len``); within a segment of length ``len`` the fold is the
       affine map ``v_out = c^len·v_in + B`` with
       ``B = Σ_i m_i·c^(len−i)·x_i`` (``c = 1−α``; ``m_i`` is 1 for
       the global seed row, α otherwise) — B is a plain per-segment
       aggregate, computed MAP-SIDE in parallel with no ordering
       dependence because each term is snapped to the ``1/term_scale``
       grid and summed in exact DECIMAL (``term_scale`` must keep
       ``|value|·term_scale`` inside long range — Spark's
       ``floor(double)`` returns LONG — so 1e12 bounds values at
       ~9e6; the snap truncates the geometric tail identically in
       both engines and costs ≤ seg_len/(2·term_scale) ≈ 1.3e-10
       absolute vs the unsnapped fold),
    2. one per-partition fold over the n/seg_len segment summaries
       (an in-row array aggregate ~seg_len× smaller than the series;
       for series beyond ~10⁸ rows, apply the same device
       hierarchically — segments of segments).

    Cross-engine bitwise parity holds when ``c`` is a power of two
    (α = 0.5 → every ``c^k`` and ``m_i`` multiplication is an exact
    exponent shift; the only rounded float ops are the term-grid snap
    and the fold's one add per segment, identical single IEEE ops in
    both engines). For non-dyadic α the scan is still deterministic
    per engine but agrees with a sequential fold only to fp tolerance
    (pytest pins 1e-9 vs ``ewm_smooth``).

    Returns one row per partition: (part_col, n, n_seg, ema_last).
    """
    c = 1.0 - alpha
    d = df.filter(F.col(value_col).isNotNull())
    b = (F.col(value_col).cast("double") * F.lit(alpha)).alias("__b")
    bs = F.col(value_col).cast("double").alias("__b_seed")
    return affine_scan(
        d.select(part_col, idx_col, F.col(value_col), b, bs),
        "__b",
        "__b_seed",
        part_col,
        idx_col,
        mult=c,
        seg_len=seg_len,
        term_scale=term_scale,
        out_col="ema_last",
    )


def affine_scan(
    df: DataFrame,
    b_col: str,
    b_seed_col: str,
    part_col: str = "symbol",
    idx_col: str = "time_idx",
    *,
    mult: float,
    seg_len: int = 256,
    term_scale: float = 1e12,
    out_col: str = "v_last",
    levels: int = 1,
) -> DataFrame:
    """General two-phase segment-composed scan for ANY per-partition
    affine recurrence ``v_t = mult·v_{t−1} + b_t`` with seed
    ``v_1 = b_seed_1`` — the EMA scan's algebra with the intercept
    freed: EMA is ``b = α·x`` (seed x), GARCH(1,1) is
    ``b = ω + α·r²`` (seed r², mult β), EWMA-vol is EMA on r².
    Same device: each fixed-length segment reduces MAP-SIDE to its
    composed map ``v_out = mult^len·v_in + B`` with
    ``B = Σ_i b'_i·mult^(len−i)`` (``b'`` = b_seed on the global
    first row, b otherwise), each term snapped to the
    ``1/term_scale`` grid and summed in exact DECIMAL (order-free);
    then one per-partition fold over the n/seg_len segment
    summaries. Bitwise cross-engine when ``mult`` is a power of two
    and b itself is a single identical IEEE expression per row.
    Rows where ``b_col`` is NULL are dropped before numbering (the
    caller decides what is a tick).

    ``levels`` — the HIERARCHICAL form for very long series: each
    extra level composes ``seg_len`` adjacent segment maps into one
    super-segment map ((c^l1,B1)∘(c^l2,B2) = (c^(l1+l2),
    c^l2·B1 + B2) — affine maps are closed under composition) via a
    bounded in-group fold, so the final per-partition array holds
    n/seg_len^levels structs instead of n/seg_len. levels=2 with
    seg_len=256 bounds the final fold at 256 structs up to ~16.7M
    rows per partition; levels=3 to ~4.3B. The composed fold
    reassociates float adds, so hierarchical results match levels=1
    to fp tolerance (pytest-pinned), not bitwise — use levels=1
    where an oracle pins bitwise parity.

    Returns one row per partition: (part_col, n, n_seg, out_col) —
    n_seg counts FINAL-level segments.
    """
    w = Window.partitionBy(part_col).orderBy(idx_col)
    d = (
        df.filter(F.col(b_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__seg", F.expr(f"(__rn - 1) div {seg_len}"))
        .withColumn("__i", F.expr(f"(__rn - 1) % {seg_len} + 1"))
    )
    wseg = Window.partitionBy(part_col, "__seg")
    d = d.withColumn("__len", F.count(F.lit(1)).over(wseg))
    bp = F.when(F.col("__rn") == 1, F.col(b_seed_col)).otherwise(
        F.col(b_col)
    )
    term = bp * F.pow(
        F.lit(mult), (F.col("__len") - F.col("__i")).cast("double")
    )
    # guard the documented precondition instead of trusting it:
    # floor(double) returns LONG, so |term|*term_scale beyond long
    # range would silently wrap into garbage. Fail loudly per-row
    # (lazy CaseWhen branch — zero cost on the valid path).
    tq_raw = term * F.lit(term_scale) + F.lit(0.5)
    tq = F.floor(
        F.when(
            F.abs(tq_raw) > F.lit(9.2e18),
            F.raise_error(
                F.lit(
                    "affine_scan: |b|*term_scale exceeds long range "
                    "(~9.2e18) — lower term_scale or rescale the input"
                )
            ).cast("double"),
        ).otherwise(tq_raw)
    ).cast("decimal(38,0)")
    segs = (
        d.withColumn("__tq", tq)
        .groupBy(part_col, "__seg")
        .agg(
            F.max("__len").alias("__len"),
            F.sum("__tq").alias("__bq"),
        )
        .withColumn(
            "__B", F.col("__bq").cast("double") / F.lit(term_scale)
        )
    )
    def _compose_fold(arr):
        """Fold a __seg-sorted struct array of affine maps into the
        composed (B, len): v_out = mult^len_total·v_in + B."""
        return F.aggregate(
            F.expr(f"slice({arr}, 2, size({arr}) - 1)"),
            F.element_at(arr, 1).getField("__B"),
            lambda acc, s: F.pow(
                F.lit(mult), s.getField("__len").cast("double")
            )
            * acc
            + s.getField("__B"),
        )

    for _ in range(levels - 1):
        segs = (
            segs.withColumn(
                "__sseg", F.expr(f"__seg div {seg_len}")
            )
            .groupBy(part_col, "__sseg")
            .agg(
                F.sum("__len").alias("__len"),
                F.sort_array(
                    F.collect_list(
                        F.struct("__seg", "__len", "__B")
                    )
                ).alias("__sarr"),
            )
            .select(
                part_col,
                F.col("__sseg").alias("__seg"),
                "__len",
                _compose_fold("__sarr").alias("__B"),
            )
        )
    per = segs.groupBy(part_col).agg(
        F.sum("__len").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_seg"),
        F.sort_array(
            F.collect_list(F.struct("__seg", "__len", "__B"))
        ).alias("__arr"),
    )
    return per.select(
        part_col, "n", "n_seg", _compose_fold("__arr").alias(out_col)
    )
