"""Round-4 guards: corpus-size-aware SRP-LSH parameters (the fix for the
quadratic candidate join the sf0.1→sf1 scale bench exposed at fixed planes),
and the adaptive events-timestamp loader."""

from __future__ import annotations

import pytest

from photo_vector_search_spark.operators.dedup import (
    _SRP_PAIRS_RECALL,
    _SRP_SQL_RECALL,
    srp_auto_params,
    srp_lsh_near_dup_sql,
)
from photo_vector_search_spark.sources.tables import load_table


def test_srp_auto_params_reproduce_fixture_constants():
    """At fixture scale the size-derived parameters must equal the hand-tuned
    constants bit-for-bit — that is what keeps the declared oracle (whose SQL
    hardcodes 6 planes / 16 tables) and all bench history unchanged."""
    for n in (1, 100, 500, 2000):
        assert srp_auto_params(n, _SRP_SQL_RECALL) == (6, 16), n
        assert srp_auto_params(n, _SRP_PAIRS_RECALL) == (6, 24), n


def test_srp_auto_params_bound_bucket_occupancy():
    """Past fixture scale, planes grow with log2(N) so expected random-pair
    bucket occupancy N/2^planes stays bounded — the property that keeps the
    candidate join sub-quadratic (fixed planes ⇒ occupancy ∝ N ⇒ pairs ∝ N²)."""
    prev_tables = 0
    for n in (5_000, 20_000, 200_000, 2_000_000):
        planes, tables = srp_auto_params(n, _SRP_SQL_RECALL)
        assert n / 2**planes <= 64, (n, planes)  # ≤ 2× target occupancy
        assert tables >= prev_tables, "tables must not shrink as planes sharpen"
        prev_tables = tables
    # sharper buckets need more tables to hold the recall target, amplification
    # identity: recall = 1 - (1 - p^planes)^tables  with p ≈ 0.6486 at sim 0.45
    import math

    p = 1 - math.acos(0.45) / math.pi
    from photo_vector_search_spark.operators.dedup import _SRP_MAX_TABLES

    for n in (500, 20_000, 200_000):
        planes, tables = srp_auto_params(n, _SRP_SQL_RECALL)
        recall = 1 - (1 - p**planes) ** tables
        if tables < _SRP_MAX_TABLES:  # past the cap recall degrades by design
            assert recall >= _SRP_SQL_RECALL - 1e-9, (n, recall)
        else:
            assert recall >= 0.5, (n, recall)  # capped but not collapsed


def test_srp_auto_params_table_ceiling():
    """At extreme N the recall-preserving table count would be thousands of
    full-data passes; the cap trades recall (documented) for a sane job."""
    from photo_vector_search_spark.operators.dedup import _SRP_MAX_TABLES

    for n in (10**8, 10**9):
        planes, tables = srp_auto_params(n, _SRP_SQL_RECALL)
        assert tables <= _SRP_MAX_TABLES, (n, tables)
        assert planes >= 20, (n, planes)  # buckets keep sharpening regardless


def test_srp_sql_auto_defaults_match_explicit_at_fixture_scale(spark, sf_dir):
    """Calling without explicit params (auto path) must return the identical
    pair set as the pinned fixture constants — the declared query's contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    auto = {
        (r.vec_a, r.vec_b): r.sim
        for r in srp_lsh_near_dup_sql(emb, tau=0.45).collect()
    }
    pinned = {
        (r.vec_a, r.vec_b): r.sim
        for r in srp_lsh_near_dup_sql(emb, tau=0.45, n_tables=16, n_planes=6).collect()
    }
    assert auto == pinned and len(auto) > 0


def test_regroup_from_finest_matches_native_cube(spark, sf_dir):
    """The from-finest grouping-sets rewrite must equal Spark's native .cube()
    bit-for-bit — count and decimal sum are exact decomposable aggregates, so
    marginals re-aggregated from finest cells carry no re-ordering error."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.plans.relational import regroup_from_finest

    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    native = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
        )
        .collect()
    )
    finest = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
    )
    sets = [
        ("l_returnflag", "l_linestatus"),
        ("l_returnflag",),
        ("l_linestatus",),
        (),
    ]
    ours = regroup_from_finest(finest, ["l_returnflag", "l_linestatus"], sets).collect()
    assert sorted([tuple(r) for r in native], key=lambda t: (t[0] or "", t[1] or "")) == sorted(
        [tuple(r) for r in ours], key=lambda t: (t[0] or "", t[1] or "")
    )


def test_events_loader_normalizes_micros_timestamp(spark, sf_dir):
    """events.ts must arrive as session-TZ TIMESTAMP whatever the parquet
    physical type (nanos-INT64 in early fixture generations, micros TIMESTAMP
    now) so downstream epoch arithmetic (cast to bigint) stays legal."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # the cast that broke under TIMESTAMP_NTZ (gap arithmetic in events_asof)
    row = ev.select(F.col("ts").cast("bigint").alias("epoch")).first()
    assert row.epoch > 0

def test_regroup_from_finest_separates_data_nulls_from_markers(spark):
    """ADVICE r4 (medium): a finest group whose KEY VALUE is NULL must stay a
    distinct output row from the grouping-set marker NULL — native .cube()
    separates them by grouping id even when the visible columns tie, and the
    DuckDB oracle does the same. Exercised on data where the two actually
    collide (flag=NULL rows present)."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.plans.relational import regroup_from_finest

    rows = [
        (None, "a", 1),
        (None, "b", 2),
        ("x", "a", 4),
        ("x", None, 8),
        (None, None, 16),
        ("y", "a", 32),
    ]
    df = spark.createDataFrame(rows, "flag string, status string, v int")
    native = (
        df.cube("flag", "status")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    )
    finest = df.groupBy("flag", "status").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    sets = [("flag", "status"), ("flag",), ("status",), ()]
    ours = regroup_from_finest(finest, ["flag", "status"], sets).collect()

    def key(t):
        return tuple("" if x is None else str(x) for x in t)

    assert sorted([tuple(r) for r in native], key=key) == sorted(
        [tuple(r) for r in ours], key=key
    )
    # the collision is real in this fixture: visible (NULL, 'a') appears twice
    # in the native multiset (data NULL at gid 0 vs flag-marginal at gid 2)
    na = [r for r in native if r[0] is None and r[1] == "a"]
    assert len(na) == 2
