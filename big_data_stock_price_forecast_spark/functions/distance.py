"""Vector distance expressions over ``array<float|double>`` columns.

Reference parity: the k-NN comparators in notebooks/test.ipynb cell 17/21
(torch.cdist p=1/p=2, cosine_similarity, and the mu/logvar-weighted
variants). Implemented as pure Catalyst expressions (``zip_with`` +
``aggregate``) so distance computation stays inside whole-stage codegen —
no Python/Arrow boundary in the k-NN hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dist_l1(a: Column | str, b: Column | str) -> Column:
    """Sum of absolute elementwise differences (torch.cdist p=1)."""
    a, b = _to_col(a), _to_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dist_l2sq(a: Column | str, b: Column | str) -> Column:
    a, b = _to_col(a), _to_col(b)
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v * v)


def dist_l2(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (torch.cdist p=2)."""
    return F.sqrt(dist_l2sq(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _to_col(a), _to_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    a = _to_col(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cos_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (higher = closer; callers order DESC)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product as a FLAT left-associated sum of ``dim`` products.

    Bitwise-identical to the sequential ``aggregate`` fold (0.0 + p1 ==
    p1), but a flat expression compiles under whole-stage codegen while
    higher-order lambdas are interpreted per row — ~10x faster in
    pair-join hot paths. Requires a statically known dimension."""
    a, b = _to_col(a), _to_col(b)
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def l2_norm_fixed(a: Column | str, dim: int) -> Column:
    """Flat-codegen L2 norm; bitwise equal to ``l2_norm`` (see
    ``dot_fixed``)."""
    a = _to_col(a)
    out = F.element_at(a, 1) * F.element_at(a, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(a, i)
    return F.sqrt(out)


METRICS_ORDER_DESC = {"l1": False, "l2": False, "cosine": True}


def metric_expr(metric: str, a: Column | str, b: Column | str) -> tuple[Column, bool]:
    """(distance-or-similarity expression, order-descending?) for a
    metric name. Cosine ranks descending (higher = closer)."""
    fns = {"l1": dist_l1, "l2": dist_l2, "cosine": cos_sim}
    if metric not in fns:
        raise ValueError(f"metric must be one of {sorted(fns)}")
    return fns[metric](a, b), METRICS_ORDER_DESC[metric]


def weighted_dist(
    a: Column | str, b: Column | str, split: int, dist=dist_l2
) -> Column:
    """The reference's mu/logvar-weighted distance: full weight on the
    first ``split`` components, half weight on the rest
    (notebooks/test.ipynb cell 21 ``cdist_w_cmp``).
    """
    a, b = _to_col(a), _to_col(b)
    head_a, head_b = F.slice(a, 1, split), F.slice(b, 1, split)
    tail_a = F.slice(a, split + 1, F.size(a) - split)
    tail_b = F.slice(b, split + 1, F.size(b) - split)
    return dist(head_a, head_b) + dist(tail_a, tail_b) / F.lit(2.0)


def dist_l1_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Flat-codegen L1 (see ``dot_fixed`` for why); bitwise equal to
    ``dist_l1``'s sequential fold."""
    a, b = _to_col(a), _to_col(b)
    out = F.abs(F.element_at(a, 1) - F.element_at(b, 1))
    for i in range(2, dim + 1):
        out = out + F.abs(F.element_at(a, i) - F.element_at(b, i))
    return out


def dist_l2_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Flat-codegen L2; bitwise equal to ``dist_l2``."""
    a, b = _to_col(a), _to_col(b)
    d = F.element_at(a, 1) - F.element_at(b, 1)
    out = d * d
    for i in range(2, dim + 1):
        d = F.element_at(a, i) - F.element_at(b, i)
        out = out + d * d
    return F.sqrt(out)


def metric_expr_fixed(
    metric: str, a: Column | str, b: Column | str, dim: int
) -> tuple[Column, bool]:
    """Like :func:`metric_expr` but with flat fixed-dimension
    expressions that stay inside whole-stage codegen — the form to use
    in wide pair joins (global k-NN search), where interpreted lambda
    folds dominate runtime."""
    fns = {
        "l1": lambda: dist_l1_fixed(a, b, dim),
        "l2": lambda: dist_l2_fixed(a, b, dim),
        "cosine": lambda: dot_fixed(a, b, dim)
        / (l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim)),
    }
    if metric not in fns:
        raise ValueError(f"metric must be one of {sorted(fns)}")
    return fns[metric](), METRICS_ORDER_DESC[metric]


def dot_fixed_range(
    a: Column | str, b: Column | str, start: int, end: int
) -> Column:
    """Flat dot product over elements ``start..end`` (1-based,
    inclusive) of the ORIGINAL arrays — the slice-free form of
    ``dot_fixed(slice(a, start, n), ...)``. ``element_at(slice(...))``
    re-materializes the slice per element (O(dim²) per row, the
    measured 2× regression in the 5-metric k-NN union); indexing with
    an offset is the same doubles in the same fold order at O(dim)."""
    a, b = _to_col(a), _to_col(b)
    out = F.element_at(a, start) * F.element_at(b, start)
    for i in range(start + 1, end + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def l2_norm_fixed_range(a: Column | str, start: int, end: int) -> Column:
    a = _to_col(a)
    out = F.element_at(a, start) * F.element_at(a, start)
    for i in range(start + 1, end + 1):
        out = out + F.element_at(a, i) * F.element_at(a, i)
    return F.sqrt(out)


def dist_l2_fixed_range(
    a: Column | str, b: Column | str, start: int, end: int
) -> Column:
    a, b = _to_col(a), _to_col(b)
    d = F.element_at(a, start) - F.element_at(b, start)
    out = d * d
    for i in range(start + 1, end + 1):
        d = F.element_at(a, i) - F.element_at(b, i)
        out = out + d * d
    return F.sqrt(out)


def cos_fixed_range(
    a: Column | str, b: Column | str, start: int, end: int
) -> Column:
    return dot_fixed_range(a, b, start, end) / (
        l2_norm_fixed_range(a, start, end)
        * l2_norm_fixed_range(b, start, end)
    )
