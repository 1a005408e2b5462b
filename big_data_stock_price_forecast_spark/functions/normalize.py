"""Per-window z-score normalization expressions.

Numeric contract (core/data/dataset.py:19-20): population stddev
(ddof=0) and epsilon 1e-8 added to the *scale* before dividing; the
inverse transform is ``x * scale + center`` (notebooks/test.ipynb
cells 19-20).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-8


def zscore_array(xs: Column, center: Column, scale: Column, eps: float = EPS) -> Column:
    """(x - center) / (scale + eps) elementwise over an array column."""
    return F.transform(xs, lambda v: (v - center) / (scale + F.lit(eps)))


def zscore_inverse_array(xs: Column, center: Column, scale: Column) -> Column:
    """x * scale + center elementwise (plot/real-unit inversion)."""
    return F.transform(xs, lambda v: v * scale + center)
