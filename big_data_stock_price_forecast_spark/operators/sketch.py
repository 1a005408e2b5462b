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
