"""Deterministic corpus shuffle: value parity with the DuckDB row_number twin,
partitioning invariance (the property seeded rand() lacks), and seed behavior."""

from __future__ import annotations

import duckdb
import pandas as pd

from photo_vector_search_spark.operators.shuffle import shuffle_corpus
from photo_vector_search_spark.sources.tables import load_table


def _duck_order(sf_dir: str, seed: int) -> list[tuple[int, int]]:
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY md5('{seed}' || '-' || CAST(doc_id AS VARCHAR)),
                              doc_id
                   ) - 1 AS pos
            FROM read_parquet('{sf_dir}/documents.parquet')
            ORDER BY doc_id
            """
        ).fetchall()
    finally:
        con.close()


def test_shuffle_matches_duckdb_twin(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in shuffle_corpus(docs, seed=7).select("doc_id", "pos").collect()
    )
    assert got == _duck_order(sf_correct, 7)
    # pos is a dense 0..N-1 permutation
    n = len(got)
    assert sorted(p for _, p in got) == list(range(n))


def test_shuffle_invariant_to_input_partitioning(spark, sf_correct):
    """The contract seeded rand() cannot give: re-reading the same corpus with
    a different physical split yields the SAME order."""
    docs = load_table(spark, sf_correct, "documents")
    a = {
        r["doc_id"]: r["pos"]
        for r in shuffle_corpus(docs.repartition(7), seed=3)
        .select("doc_id", "pos")
        .collect()
    }
    b = {
        r["doc_id"]: r["pos"]
        for r in shuffle_corpus(docs.coalesce(1), seed=3)
        .select("doc_id", "pos")
        .collect()
    }
    assert a == b


def test_auto_stage_plan_inspection(spark, sf_correct, tmp_path):
    """stage=None inspects the optimized plan: a bare deterministic scan
    (+ narrow project/filter) re-executes instead of staging — two scans of
    immutable files can't diverge and beat a write+read round trip — while
    nondeterministic or wide plans stage."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.operators.shuffle import _rescan_safe_and_cheap

    docs = load_table(spark, sf_correct, "documents")
    assert _rescan_safe_and_cheap(docs)
    assert _rescan_safe_and_cheap(docs.select("doc_id").filter(F.col("doc_id") > 3))
    # nondeterministic projection MUST stage (the ADVICE divergence scenario)
    assert not _rescan_safe_and_cheap(docs.withColumn("r", F.rand(1)))
    # wide plans stage: recompute would double real work
    assert not _rescan_safe_and_cheap(docs.groupBy("source").count())
    assert not _rescan_safe_and_cheap(docs.join(docs.select("doc_id"), "doc_id"))
    assert not _rescan_safe_and_cheap(docs.repartition(7))

    # the no-stage fast path produces the identical permutation, and never
    # touches the caller's staging_dir
    sd = str(tmp_path / "never_written")
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in shuffle_corpus(docs, seed=7, staging_dir=sd)
        .select("doc_id", "pos")
        .collect()
    )
    assert got == _duck_order(sf_correct, 7)
    import os

    assert not os.path.exists(sd)

    # a nondeterministic upstream still yields one consistent dense
    # permutation (both passes read the SAME staged rows)
    nd = docs.withColumn("r", F.rand(42))
    rows = shuffle_corpus(nd, seed=5, staging_dir=str(tmp_path / "st")).collect()
    assert sorted(r["pos"] for r in rows) == list(range(len(rows)))

    # explicit override wins over inspection
    sd2 = str(tmp_path / "forced")
    shuffle_corpus(docs, seed=7, staging_dir=sd2, stage=True).count()
    assert os.path.exists(sd2)


def test_shuffle_seed_changes_order_and_keeps_rows(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "source")
    s0 = shuffle_corpus(docs, seed=0).select("doc_id", "pos").collect()
    s1 = shuffle_corpus(docs, seed=1).select("doc_id", "pos").collect()
    m0 = {r["doc_id"]: r["pos"] for r in s0}
    m1 = {r["doc_id"]: r["pos"] for r in s1}
    assert set(m0) == set(m1)  # a permutation, never a sample
    moved = sum(1 for d in m0 if m0[d] != m1[d])
    assert moved > len(m0) * 0.9  # different seed => essentially everything moves
    # original columns survive alongside pos
    assert {f.name for f in shuffle_corpus(docs, seed=0).schema} == {
        "doc_id",
        "source",
        "pos",
    }
