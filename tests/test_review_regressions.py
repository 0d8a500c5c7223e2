"""Regression tests for code-review findings: each encodes a failure scenario
that the fixture-driven oracle tests could not expose."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.joins import asof_join_backward
from photo_vector_search_spark.operators.knn import knn_batch, knn_batch_fast, knn_topk
from photo_vector_search_spark.plans.pipeline_queries import q_set_ops


def test_zero_norm_vector_never_ranks(spark):
    """A zero embedding has no cosine distance: it must not appear in results
    (previously its NULL distance sorted FIRST and displaced the true top hit)."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 0.0, 0.0], 0),  # zero-norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for fast in (False, True):
        got = [r.vec_id for r in knn_topk(emb, [1.0, 0.0, 0.0, 0.0], k=3, fast=fast).collect()]
        assert got == [1, 2], f"fast={fast}: zero-norm row leaked: {got}"
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got_b = [r.vec_id for r in knn_batch(emb, queries, k=3).collect()]
    got_bf = [r.vec_id for r in knn_batch_fast(emb, queries, k=3).collect()]
    assert got_b == got_bf == [1, 2]


def test_knn_batch_fast_boundary_ties(spark):
    """Duplicate embeddings tied exactly at the k boundary: both paths must pick
    the same (lowest) vec_ids."""
    v = [0.5, 0.5, 0.0, 0.0]
    rows = [(i, v, 0) for i in (10, 5, 7, 3)] + [(1, [1.0, 0.0, 0.0, 0.0], 0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = spark.createDataFrame([(99, v)], "query_id long, query_vec array<float>")
    a = [(r.vec_id, r.rank) for r in knn_batch(emb, queries, k=2).collect()]
    b = [(r.vec_id, r.rank) for r in knn_batch_fast(emb, queries, k=2).collect()]
    assert a == b == [(3, 1), (5, 2)]  # lowest tied ids win in both paths


def test_set_ops_shared_lang_with_multiplicity(spark, sf_correct):
    """A lang appearing in BOTH sources (many times in src0) must be labeled
    'both' and never 'only_src0' (the old exceptAll-on-multisets bug)."""
    out = {(r.kind, r.lang) for r in q_set_ops(spark, sf_correct).collect()}
    only = {l for k, l in out if k == "only_src0"}
    both = {l for k, l in out if k == "both"}
    assert not (only & both), f"langs labeled both ways: {only & both}"


def test_crashed_snapshot_swap_recovers_from_old(spark, tmp_path):
    """Crash between the swap renames leaves only `.old`: the next read or write
    must restore it, not silently treat the store as empty (which previously
    destroyed the backup on the following write)."""
    import os

    from photo_vector_search_spark.operators.store import (
        recover_store,
        snapshot_overwrite,
    )

    store = str(tmp_path / "store")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    snapshot_overwrite(df1, store)
    # simulate the crash window: store renamed away, new snapshot never landed
    os.rename(store, store + ".old")
    assert not os.path.exists(store)
    recover_store(store)
    assert {r.id for r in spark.read.parquet(store).collect()} == {1, 2}
    # and a write in the crashed state must MERGE with the recovered data
    os.rename(store, store + ".old")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    from photo_vector_search_spark.operators.store import merge_upsert

    recover_store(store)
    merged = merge_upsert(spark.read.parquet(store), df2, ["id"])
    snapshot_overwrite(merged, store)
    assert {r.id for r in spark.read.parquet(store).collect()} == {1, 2, 3}


def test_multiline_text_tokenizes_correctly(spark):
    """Newlines/tabs/space-runs are token separators; identical content with
    different whitespace must dedup together and count the same tokens."""
    from photo_vector_search_spark.functions.text import token_count
    from photo_vector_search_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox\njumps over\tthe lazy  dog today"),
        ],
        "doc_id long, text string",
    )
    counts = {r.doc_id: r.n for r in docs.select(
        "doc_id", token_count(docs.text).alias("n")).collect()}
    assert counts == {1: 10, 2: 10}
    pairs = jaccard_pairs(docs, 3, 0.99).collect()
    assert [(p.doc_a, p.doc_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_asof_atomic_row_fill(spark):
    """A newer right row with a NULL value must yield (its ts, NULL) — never the
    newer ts paired with an OLDER row's value."""
    t = datetime.datetime
    right = spark.createDataFrame(
        [(1, t(2024, 1, 1, 10), 5.0), (1, t(2024, 1, 1, 11), None)],
        "user_id long, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [(100, 1, t(2024, 1, 1, 12))], "event_id long, user_id long, ts timestamp"
    )
    got = asof_join_backward(
        left, right, by=["user_id"], left_ts="ts", right_ts="ts", value_cols=["v"]
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.matched_ts == t(2024, 1, 1, 11) and r.v is None
