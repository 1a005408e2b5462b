"""Expression-level utilities shared across operator families."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(bound: Column, body) -> Column:
    """Expression-level let binding: evaluate ``bound`` exactly once per
    row and hand it to ``body`` as a higher-order-function lambda
    variable (``element_at(transform(array(bound), body), 1)``).

    Why this exists: a column expression that appears INSIDE a
    ``transform``/``filter`` lambda body is re-evaluated per array
    element — whether it got there by direct composition (the caller
    passed an expression, not an attribute) or by Catalyst's projection
    collapsing inlining a produced column through ``explode``. Either
    way a linear pass turns quadratic: winnowing's gram md5-array
    re-evaluated inside each window slice took 500 sf0.001 docs from
    4 s to stuck-for-minutes (the optimized plan grew from 1 md5 site
    to 5), and ``shingles`` composed directly over ``tokens(...)``
    re-tokenized the document once per shingle. A lambda variable is a
    per-row slot the optimizer cannot substitute through, so ``bound``
    stays evaluated once no matter how the surrounding projections
    collapse. Cost: one single-element array allocation per row.
    """
    return F.element_at(F.transform(F.array(bound), body), 1)
