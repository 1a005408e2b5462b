"""Skew mitigation for joins: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it only applies
to sort-merge joins and only after the skewed map output exists. When
a join key's distribution is KNOWN to be pathological (one tenant, one
null-bucket, one hot symbol holding half the table), salting fixes the
layout at plan time: the fact side scatters each hot key across S
sub-keys with a deterministic salt, the dim side replicates each row S
times, and the join runs on (key, salt) with no partition ever larger
than 1/S of the hot key.

The salt is derived from a hash of the fact row's OTHER columns — not
rand() — so results are reproducible run-to-run and retry-safe
(a recomputed task re-derives the same salts; rand() would make
shuffle retries nondeterministic, which Spark flags as a correctness
hazard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: list[str] | None = None,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` with ``dim`` on ``key`` with the fact side salted
    across ``num_salts`` sub-partitions per key. ``salt_from`` names
    the fact columns the deterministic salt hashes (default: all
    non-key columns). Result equals ``fact.join(dim, key, how)``
    row-for-row; only the shuffle layout differs.

    ``how`` is restricted to fact-side-preserving joins: a right/full/
    outer join would emit each UNMATCHED dim row once per salt replica
    (num_salts times instead of once). Those shapes don't need fact-side
    salting anyway — the unmatched-dim tail is dim-sized, not hot-key
    sized."""
    how_norm = how.replace("_", "").lower()
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            "salted_join supports how in (inner, left, left_semi, "
            f"left_anti); got {how!r} — a {how} join would duplicate "
            "unmatched dim rows once per salt replica"
        )
    salt_cols: list[Column] = [
        F.col(c) for c in (salt_from or fact.columns) if c != key
    ]
    if not salt_cols:
        # key-only fact frame: no other columns to derive a salt from —
        # hash the key itself (degenerate but correct: every row of a
        # hot key lands in one salt, i.e. behaves like the plain join)
        salt_cols = [F.col(key)]
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(num_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>")
        ),
    )
    return salted_fact.join(replicated_dim, [key, "__salt"], how).drop(
        "__salt"
    )
