"""Range join: pair rows whose timestamps fall within an interval of
each other — the time-window flavor of the as-of join family (brief:
as-of join / range join / rollup). The reference's nearest analog is
the future-gather (notebooks/test.ipynb cell 20, covered by
operators/windows.py); this is its set-valued generalization: ALL
right rows with ``right_ts`` in ``(left_ts, left_ts + horizon]`` per
key, not just the next P.

Scale design: a naive theta-join (``ON r.ts > l.ts AND r.ts <= l.ts +
H``) degenerates to a per-key cross product — Spark executes
non-equi conditions as BroadcastNestedLoop or a cartesian-per-key
sort-merge. Instead both sides bucket their timestamps into
``horizon``-wide grains and join as an EQUI-join on (key, bucket):
a left row's matches can only live in its own bucket or the next one
(interval width == bucket width), so the left side probes exactly two
buckets (explode of a 2-element array), the join shuffles on
(key, bucket) like any hash join, and the exact interval predicate
filters the candidates. Candidate inflation is bounded by 2x the
true-match density per bucket; skewed keys get AQE's skew-join
splitting like every other equi-join in the engine. The same pattern
with coarser grains is how interval/temporal joins run in Flink SQL
and in TimescaleDB-style hypertables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    horizon_us: int,
    left_ts: str = "__lts",
    right_ts: str = "__rts",
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` keys with
    ``right_ts`` in ``(left_ts, left_ts + horizon_us]`` (microsecond
    longs). Returns left columns + right columns; callers project /
    aggregate on top. Both ts columns must already be epoch-micros
    longs (cast upstream under a pinned-UTC session)."""
    bucket_l = F.floor(F.col(left_ts) / F.lit(horizon_us))
    bucket_r = F.floor(F.col(right_ts) / F.lit(horizon_us))
    probe = left.withColumn(
        "__b",
        F.explode(F.array(bucket_l, bucket_l + F.lit(1))),
    )
    build = right.withColumn("__b", bucket_r)
    cond = (F.col(right_ts) > F.col(left_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.lit(horizon_us)
    )
    return probe.join(build, [*on, "__b"]).filter(cond).drop("__b")
