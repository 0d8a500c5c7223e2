"""Drives the exact driver contract: entry() smoke at sf0.001, every queries()
entry vs its oracle_sql() at sf0.01 (the same comparison CORRECTNESS_r{N}.json uses).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches

QUERY_KEYS = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_every_query_has_callable_and_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries keys"
    for name, fn in q.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_schema_is_scalar(spark, sf_dir, name):
    """The driver canonicalizes result frames via a pandas sort; array/map/
    struct cells raise `TypeError: unhashable type` there (the r8
    `pack_sequences` regression). Every declared query must emit only
    scalar columns — CSV-join or checksum anything array-shaped."""
    df = entrymod.queries()[name](spark, sf_dir)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(("array", "map", "struct")), (
            f"{name}: declared column {f.name!r} has non-scalar type {t}; "
            "the driver's pandas canonicalizer cannot sort it"
        )


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_matches_oracle(spark, sf_correct, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, sf_correct)
    if name in oracles:
        assert_matches(df, oracles[name], sf_correct)
    else:
        # driver's weaker rows-only check — collect() like the driver does
        # (count() would let Catalyst prune final projections that the real
        # materialization must evaluate)
        assert len(df.collect()) >= 0
