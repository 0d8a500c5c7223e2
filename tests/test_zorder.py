"""Z-order clustering (`operators/zorder`): DuckDB bit-arithmetic twin of
the Morton key, a pure-Python interleave reference, REALIZED footer-stats
pruning on engine-written stores (vs a single-column sort), NULL/constant
discipline, partitioning invariance, and guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.zorder import (
    pruned_fraction,
    write_zordered,
    zorder_key,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches

BITS = 8


def _zkey_twin_sql(bits: int = BITS) -> str:
    k, top, scale = 2, (1 << bits) - 1, 1 << bits
    terms = " | ".join(
        f"(((r{i + 1} >> {j}) & 1) << {j * k + i})"
        for j in range(bits)
        for i in range(k)
    )
    return f"""
WITH s AS (
  SELECT min(CAST(user_id AS DOUBLE)) lo1, max(CAST(user_id AS DOUBLE)) hi1,
         min(CAST(value AS DOUBLE)) lo2, max(CAST(value AS DOUBLE)) hi2
  FROM events
),
r AS (
  SELECT event_id,
    least(greatest(CAST(floor(((CAST(user_id AS DOUBLE) - lo1) / (hi1 - lo1))
                              * {scale}) AS BIGINT), 0), {top}) AS r1,
    least(greatest(CAST(floor(((CAST(value AS DOUBLE) - lo2) / (hi2 - lo2))
                              * {scale}) AS BIGINT), 0), {top}) AS r2
  FROM events, s
)
SELECT event_id, {terms} AS zkey FROM r
"""


def _ref_zkey(vals, bounds, bits):
    ranks = []
    for v, (lo, hi) in zip(vals, bounds):
        if v is None or not hi > lo:
            r = 0
        else:
            r = min(
                max(int(math.floor((v - lo) / (hi - lo) * (1 << bits))), 0),
                (1 << bits) - 1,
            )
        ranks.append(r)
    z = 0
    for j in range(bits):
        for i, r in enumerate(ranks):
            z |= ((r >> j) & 1) << (j * len(ranks) + i)
    return z


def test_zkey_matches_duckdb_twin(spark, sf_correct):
    events = load_table(spark, sf_correct, "events")
    got = zorder_key(events, ["user_id", "value"], bits=BITS).select(
        "event_id", "zkey"
    )
    assert_matches(got, _zkey_twin_sql(), sf_correct)


def test_zkey_matches_python_reference_and_is_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 1000)), rng.uniform(-5, 5))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r["id"]: r["zkey"]
        for r in zorder_key(df, ["x", "y"], bits=10).collect()
    }
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    bounds = [(min(xs), max(xs)), (min(ys), max(ys))]
    for i, x, y in rows:
        assert got[i] == _ref_zkey([x, y], bounds, 10), i
    again = {
        r["id"]: r["zkey"]
        for r in zorder_key(df.repartition(13), ["x", "y"], bits=10).collect()
    }
    assert got == again


def test_pruning_realized_on_written_store(spark, sf_correct, tmp_path):
    """The whole point: on the ENGINE-WRITTEN store, footer min/max stats
    prune a value-only box (the dimension a user_id sort cannot help) and a
    2-d box. Compared against the same data sorted by user_id alone."""
    events = load_table(spark, sf_correct, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(events, zpath, ["user_id", "value"], n_files=16)
    (
        events.repartitionByRange(16, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )
    row = events.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).first()
    vlo, vhi, ulo, uhi = row
    vband = (
        vlo + 0.45 * (vhi - vlo),
        vlo + 0.55 * (vhi - vlo),
    )
    # value-only box: a user_id sort gives ZERO skipping here
    z_v = pruned_fraction(zpath, {"value": vband})
    l_v = pruned_fraction(lpath, {"value": vband})
    assert z_v >= 0.5, f"z-order pruned only {z_v:.0%} on the value box"
    assert l_v <= 0.1, f"linear layout unexpectedly pruned {l_v:.0%}"
    # 2-d box: z-order prunes harder than either single-column layout
    box2 = {
        "value": vband,
        "user_id": (ulo + 0.4 * (uhi - ulo), ulo + 0.6 * (uhi - ulo)),
    }
    z_2 = pruned_fraction(zpath, box2)
    l_2 = pruned_fraction(lpath, box2)
    assert z_2 >= 0.7 and z_2 > l_2
    # row counts survive the rewrite
    assert spark.read.parquet(zpath).count() == events.count()


def test_null_and_constant_columns_rank_bottom(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, 5.0), (3, 9.0, 5.0)],
        "id long, x double, y double",
    )
    got = {r["id"]: r["zkey"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    # y is constant → contributes 0 bits; NULL x ranks 0 → zkey 0
    assert got[1] == 0
    assert got[2] == 0  # x=min ranks 0 too
    assert got[3] > 0


def test_guards(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="signed long"):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="n_files"):
        write_zordered(df, "/tmp/nope", ["x", "y"], n_files=0)
