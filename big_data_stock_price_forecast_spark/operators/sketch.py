"""Count-Min sketch frequency estimation (training-data pipeline
surface: heavy-hitter terms over a corpus too wide for an exact
distinct-term aggregate to be cheap).

The sketch is a D x W counter table: each term increments one cell per
row d at column ((a_d * h60(term) + b_d) mod P) mod W; the estimate is
the MIN over the D cells, an upper bound on the true count (cells only
ever over-count via collisions). Expressed relationally the table is a
SPARSE frame (d, cell, cnt) produced by ONE map-side-combined groupBy
— the natural Spark encoding, mergeable across partitions, batches,
or days by summing cnt per (d, cell), which is exactly how a streaming
foreachBatch would maintain it.

Hash family: the MinHash affine permutations (same public LCG
constants, same md5-derived 60-bit term hash), so the DuckDB oracle
reproduces every cell and every estimate bit-for-bit — the sketch is
deterministic by construction, not a sampled approximation.

At 100 TB: the exact path shuffles every distinct term; the sketch
shuffles at most D x W cells per partition after map-side combine —
constant-size state regardless of vocabulary, the CM guarantee
(Cormode & Muthukrishnan 2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60
from .dedup import MH_PRIME, minhash_coeffs

CMS_DEPTH = 4
CMS_WIDTH = 1024

BLOOM_K = 4
BLOOM_M_BITS = 4096


def bloom_positions(
    df: DataFrame,
    hash_col: str = "h",
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Explode each row into its k Bloom bit positions (d, pos) —
    the MinHash affine family over the 60-bit hash again, so both
    engines and the build/probe sides derive identical bits. The
    relational form (a distinct-position frame instead of a packed
    bitmap) is what makes the filter oracle-checkable; a cluster
    deployment packs the same positions into a broadcast bitmask."""
    a, b = minhash_coeffs(k)
    # reduce the 60-bit hash mod P FIRST: h*a must stay under 2^62
    h = F.pmod(F.col(hash_col), F.lit(MH_PRIME))
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.pmod(
                                h * F.lit(a[d]) + F.lit(b[d]),
                                F.lit(MH_PRIME),
                            ),
                            F.lit(m_bits),
                        ).alias("pos"),
                    )
                    for d in range(k)
                ]
            )
        ).alias("dp"),
    ).select("*", "dp.d", "dp.pos").drop("dp")


HLL_BUCKET_BITS = 6            # m = 64 registers
HLL_M = 1 << HLL_BUCKET_BITS
HLL_W_BITS = 60 - HLL_BUCKET_BITS  # 54-bit rank window
# alpha_m for m = 64 (Flajolet et al. 2007); computed once in Python
# and inlined as the SAME double literal on both engines
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HyperLogLog registers (bucket, max rank) from the
    md5-derived 60-bit key hash: bucket = low 6 bits, rank = leftmost
    1-bit position of the remaining 54 (via the bin()-string length,
    which Spark and DuckDB define identically — no float log2 anywhere,
    so registers are bit-deterministic). ONE map-side-combined groupBy;
    registers merge across partitions/batches by re-maxing, the HLL
    mergeability property."""
    h = hash60(F.col(key_col).cast("string"))
    w = F.shiftright(h, HLL_BUCKET_BITS)
    rank = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(HLL_M)).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_rank"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per group from the register frame.

    The harmonic sum is computed as the INTEGER sum(2^(P - M_j))
    (P = 55) including 2^P per empty register — exact in int64, so no
    float accumulation order can perturb the estimate; the only float
    ops are one division and (in the small-range linear-counting
    branch) one ln, both over identical integers on every engine.
    Returns (*group_cols, n_buckets, hll_est)."""
    p = HLL_W_BITS + 1  # 55
    term = F.pow(F.lit(2.0), F.lit(p) - F.col("m_rank")).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(term).alias("__s_present"),
    )
    s_int = F.col("__s_present") + (
        F.lit(HLL_M) - F.col("n_buckets")
    ) * F.lit(1 << p)
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.lit(float(1 << p)) / s_int
    )
    v = F.lit(HLL_M) - F.col("n_buckets")  # empty registers
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "n_buckets", est.alias("hll_est")
    )


def _cell(h, d: int, a: list[int], b: list[int], width: int):
    return F.pmod(
        F.pmod(h * F.lit(a[d]) + F.lit(b[d]), F.lit(MH_PRIME)),
        F.lit(width),
    )


def cms_cells(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch as a sparse (d, cell, cnt) frame — one exploded
    projection + one groupBy (map-side combined). Merge two sketches by
    unioning and re-summing per (d, cell)."""
    a, b = minhash_coeffs(depth)
    h = hash60(F.col(term_col)) % F.lit(MH_PRIME)
    cells = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(h, d, a, b, width).alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc")
    )
    return cells.groupBy("dc.d", "dc.cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    candidates: DataFrame,
    cells: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Attach ``est_cnt`` (the Count-Min upper bound) to each candidate
    term: D small joins against the sparse cell frame collapsed by a
    min-aggregate. ``candidates`` rows must be distinct terms."""
    a, b = minhash_coeffs(depth)
    h = hash60(F.col(term_col)) % F.lit(MH_PRIME)
    probes = candidates.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(h, d, a, b, width).alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc"),
    ).select(term_col, "dc.d", "dc.cell")
    return (
        probes.join(cells, ["d", "cell"])
        .groupBy(term_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


# --------------------------------------------------------------------------
# equi-width histogram quantile sketch
# --------------------------------------------------------------------------

HIST_BUCKETS = 128


def hist_bucket_expr(
    value: str, lo: str, hi: str, buckets: int = HIST_BUCKETS
) -> str:
    """Equi-width bucket index as a shared Spark/DuckDB SQL string.
    ``floor`` before the INT cast matters: DuckDB CASTs doubles by
    rounding while Spark truncates — an integral double casts
    identically in both."""
    return (
        f"LEAST({buckets - 1}, GREATEST(0, "
        f"CAST(floor(((({value}) - ({lo})) / (({hi}) - ({lo}))) "
        f"* {buckets}.0) AS INT)))"
    )


def hist_quantile_est_expr(
    b: str = "b",
    c: str = "c",
    cum: str = "cum",
    lo: str = "lo",
    hi: str = "hi",
    q: str = "q",
    n: str = "n",
    buckets: int = HIST_BUCKETS,
) -> str:
    """Linear interpolation inside the bucket where the cumulative
    count crosses the target rank q*n — one shared expression string so
    engine and oracle run the identical IEEE operation sequence."""
    return (
        f"({lo}) + ((CAST({b} AS DOUBLE) + "
        f"((({q}) * ({n})) - CAST(({cum}) - ({c}) AS DOUBLE)) "
        f"/ CAST({c} AS DOUBLE)) * ((({hi}) - ({lo})) / {buckets}.0))"
    )
