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
