"""Misra–Gries heavy hitters (`operators/heavy_hitters`): deterministic
count-bound contracts against exact DuckDB/groupBy counts, guaranteed
presence above the error threshold, exactness when capacity covers the
batch vocabulary (DuckDB assert_matches), skew recovery under forced
truncation, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.heavy_hitters import (
    heavy_hitter_tokens,
    heavy_hitters,
    mg_summaries,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches


def _exact_token_counts(spark, sf_dir):
    from photo_vector_search_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.explode(F.array_remove(tokens(F.col("text")), "")).alias("tok")
        )
        .groupBy("tok")
        .count()
    )


def test_bounds_hold_against_exact_counts(spark, sf_dir):
    """est ≤ true ≤ max for every reported item, under a capacity small
    enough that truncation really happens (residual > 0)."""
    exact = {
        r["tok"]: r["count"] for r in _exact_token_counts(spark, sf_dir).collect()
    }
    got = heavy_hitter_tokens(
        load_table(spark, sf_dir, "documents"), k=50, capacity=8
    ).collect()
    assert got
    assert any(r["max_count"] > r["est_count"] for r in got), (
        "capacity=8 should force truncation on this corpus (31 distinct)"
    )
    for r in got:
        true = exact[r["item"]]
        assert r["est_count"] <= true <= r["max_count"], (
            r["item"],
            r["est_count"],
            true,
            r["max_count"],
        )


def test_guaranteed_presence_above_threshold(spark, sf_dir):
    """No false negatives: every token whose true count exceeds the global
    residual must appear in the summary (the MG guarantee)."""
    exact = {
        r["tok"]: r["count"] for r in _exact_token_counts(spark, sf_dir).collect()
    }
    full = heavy_hitter_tokens(
        load_table(spark, sf_dir, "documents"), k=10_000, capacity=8
    ).collect()
    resid = max(r["max_count"] - r["est_count"] for r in full)
    present = {r["item"] for r in full}
    missing = {
        t for t, c in exact.items() if c > resid and t not in present
    }
    assert not missing, f"items above the error bound absent: {missing}"


def test_exact_when_capacity_covers_vocabulary(spark, sf_dir):
    """With capacity ≥ every batch's distinct count the summary IS the
    exact count (residual 0) — pinned against DuckDB token counts."""
    docs = load_table(spark, sf_dir, "documents")
    got = heavy_hitter_tokens(docs, k=15, capacity=1_000_000)
    oracle = r"""
    WITH toks AS (
      SELECT t.tok FROM (
        SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS l
        FROM documents WHERE text IS NOT NULL
      ), LATERAL unnest(l) AS t(tok)
    ),
    c AS (SELECT tok AS item, count(*) AS est_count FROM toks GROUP BY tok)
    SELECT item, est_count, est_count AS max_count
    FROM c ORDER BY est_count DESC, item ASC LIMIT 15
    """
    assert_matches(got, oracle, sf_dir)


def test_skewed_top_k_recovered_under_hard_truncation(spark):
    """Zipf-ish stream with 5 dominant items + long unique tail: capacity 8
    must still rank the dominant 5 first, in order."""
    rows = []
    rid = 0
    for i in range(5):
        for _ in range(400 - 50 * i):
            rows.append((rid, f"hot_{i}")); rid += 1
    for j in range(3000):
        rows.append((rid, f"tail_{j}")); rid += 1
    df = spark.createDataFrame(rows, "id long, item string").repartition(8)
    got = heavy_hitters(df, "item", k=5, capacity=8).collect()
    assert [r["item"] for r in got] == [f"hot_{i}" for i in range(5)]
    for i, r in enumerate(got):
        assert r["est_count"] <= 400 - 50 * i <= r["max_count"]


def test_summary_shuffle_is_bounded(spark):
    """The merged frame aggregates ≤ batches·capacity rows — the summary
    pass emits summary rows, never the input stream."""
    df = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(10_000)], "id long, item string"
    ).repartition(4)
    summ = mg_summaries(df, "item", capacity=4)
    # 4 partitions (1 batch each here) x <= 4 items + residual rows
    assert summ.count() <= 4 * 5
    got = heavy_hitters(df, "item", k=3, capacity=4).collect()
    assert {r["item"] for r in got} == {"v0", "v1", "v2"}
    # no truncation happened (3 distinct < capacity) → exact counts
    for r in got:
        assert r["est_count"] == r["max_count"]


def test_nulls_ignored_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, item string"
    )
    got = heavy_hitters(df, "item", k=5, capacity=10).collect()
    assert {(r["item"], r["est_count"]) for r in got} == {("a", 2), ("b", 1)}
    with pytest.raises(ValueError, match="capacity"):
        mg_summaries(df, "item", capacity=0)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "item", k=0)
