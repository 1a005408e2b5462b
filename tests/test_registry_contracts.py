"""Registry-wide output-shape contracts.

The driver's correctness gate canonicalizes every query's result
through pandas ``sort_values`` — which crashes with ``unhashable
type: 'list'`` on any Array/Map/Struct-typed output column (the
emb_pq_codes red row in CORRECTNESS_r06). This contract makes that
failure class structurally impossible: every ``queries()`` entry must
emit only atomic top-level column types.

Building the DataFrame is enough — schemas resolve at plan time, so
lazy queries cost analysis only.  Queries that execute eagerly inside
their builder (streaming drains, iterative driver loops) run at
sf0.001, which keeps the whole sweep fast.
"""

import pytest

from big_data_stock_price_forecast_spark.plans.registry import all_queries

NESTED = ("array", "map", "struct")


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_output_schema_is_atomic(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    nested = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.typeName() in NESTED
    ]
    assert not nested, (
        f"{name} emits nested output column(s) {nested}; the driver "
        f"gate cannot canonicalize them — serialize to atomic columns"
    )


def test_gate_window_composition():
    """Positions 1-50 are the driver's correctness-gate window: they
    must hold the canaries plus never-verified entries ONLY — a
    careless registration-order edit silently unverifies a rotation.
    (Tags are maintained by hand; this guards the structure, the
    CORRECTNESS files guard the truth.)"""
    names = list(all_queries())
    window = names[:50]
    canaries = {
        "flagship_forecast_mae",
        "ts_indicators",
        "doc_minhash_lsh_pairs",
    }
    assert canaries <= set(window)
    assert len(names) == len(set(names))  # no duplicate registrations


# Queries with no DuckDB-SQL oracle by design: the driver records a
# weaker rows-only check for these; exactness is test-pinned instead
# (win_vae_embed: iterative VAE training, non-SQL-expressible —
# bit-identical-under-repartitioning + numpy-replay tests in
# tests/test_vaetrain.py).
ROWS_ONLY = {"win_vae_embed"}


def test_every_query_has_an_oracle_entry():
    from big_data_stock_price_forecast_spark.plans.registry import (
        all_oracles,
    )

    qs, os_ = all_queries(), all_oracles()
    # every oracle-less query must be on the documented rows-only list,
    # and the oracle map preserves registration order over the rest
    assert set(qs) - set(os_) == ROWS_ONLY
    assert list(os_) == [n for n in qs if n not in ROWS_ONLY]
