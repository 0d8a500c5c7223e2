"""Deterministic and leakage-safe splits: fraction attainment, insertion
stability, partitioning invariance, a DuckDB twin of the draw, and the
no-straddling guarantee over real LSH pairs and adversarial chains."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
from photo_vector_search_spark.operators.splits import (
    assign_split,
    leakage_safe_split,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import run_oracle

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_fractions_attained_and_no_null(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    out = assign_split(docs, FRACS)
    got = {r["split"]: r["n"] for r in out.groupBy("split").count()
           .withColumnRenamed("count", "n").collect()}
    n = docs.count()
    assert sum(got.values()) == n  # no NULL split: every row named
    for name, frac in FRACS.items():
        assert got.get(name, 0) == pytest.approx(n * frac, rel=0.35), (name, got)


def test_deterministic_insertion_stable_partition_invariant(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    full = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.repartition(13), FRACS).collect()
    }
    # partitioning invariance
    one = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.coalesce(1), FRACS).collect()
    }
    assert full == one
    # insertion stability: assignments over a SUBSET are unchanged — adding
    # docs later never reshuffles earlier ones (randomSplit fails this)
    sub = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.filter(F.col("doc_id") % 3 == 0), FRACS).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_draw_matches_duckdb_twin(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, FRACS, seed=7).collect()
    }
    want = run_oracle(
        """
        SELECT doc_id,
               CASE
                 WHEN (CAST(concat('0x', substring(md5('7-' || CAST(doc_id AS VARCHAR)), 1, 12))
                       AS BIGINT) + 1) / power(16, 12) <= 0.8 THEN 'train'
                 WHEN (CAST(concat('0x', substring(md5('7-' || CAST(doc_id AS VARCHAR)), 1, 12))
                       AS BIGINT) + 1) / power(16, 12) <= 0.9 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
        """,
        sf_correct,
    )
    assert got == dict(zip(want["doc_id"], want["split"]))


def test_leakage_safe_no_pair_straddles(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    pairs = minhash_lsh_pairs(docs, n=3, tau=0.5).select("doc_a", "doc_b")
    assert pairs.count() > 0  # sf corpus must actually exercise the guarantee
    out = leakage_safe_split(docs, pairs, FRACS)
    assert out.count() == docs.count()  # left join keeps every doc
    side = out.select("doc_id", "group_id", "split")
    straddle = (
        pairs.join(side.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .drop("group_id")
        .join(side.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .filter(F.col("split_a") != F.col("split"))
    )
    assert straddle.count() == 0


def test_transitive_chain_shares_split(spark):
    # a-b and b-c pairs: a and c are never directly paired but MUST share a
    # split through the component closure
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["w", "x", "y", "z"]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, pairs, FRACS).collect()}
    assert out[1]["group_id"] == out[2]["group_id"] == out[3]["group_id"] == 1
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    # the singleton is its own group and still gets a split
    assert out[4]["group_id"] == 4 and out[4]["split"] in FRACS


def test_fraction_validation(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="> 0"):
        assign_split(docs, {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="at least one"):
        assign_split(docs, {})
