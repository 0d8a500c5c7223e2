"""Batched pseudo-relevance feedback (`bm25.rm3_batch_topk`,
`knn.rocchio_batch_topk`): batch ≡ a Python loop of the single-query
operator per query — the batched-serving contract the knn/bm25/hamming/
sq8/cascade families already carry, extended to both PRF operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.bm25 import rm3_batch_topk, rm3_topk
from photo_vector_search_spark.operators.knn import (
    rocchio_batch_topk,
    rocchio_topk,
)
from photo_vector_search_spark.sources.tables import load_table

RM3_QUERIES = [
    (0, "the quick brown fox"),
    (1, "data quality and language"),
    (2, "river bank"),
]


def test_rm3_batch_equals_per_query_loop(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    queries = spark.createDataFrame(RM3_QUERIES, "query_id long, query string")
    got = rm3_batch_topk(docs, queries, k=8, fb_docs=5, fb_terms=6)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["n_terms"], r["rank"])
        )
    for qid, qtext in RM3_QUERIES:
        want = [
            (r["doc_id"], r["score"], r["n_terms"], r["rank"])
            for r in rm3_topk(docs, qtext, k=8, fb_docs=5, fb_terms=6).collect()
        ]
        assert sorted(by_q.get(qid, []), key=lambda t: t[3]) == want, (
            f"query {qid}"
        )
    # at least two of the three queries must actually retrieve something —
    # an all-empty fixture would vacuously pass
    assert sum(1 for q, _ in RM3_QUERIES if by_q.get(q)) >= 2


def test_rm3_batch_alpha_one_is_plain_bm25_batch(spark, sf_correct):
    """alpha=1 zeroes the feedback mix — scores must equal plain weighted
    BM25 of the original terms (the rm3_topk alpha=1 identity, batched)."""
    docs = load_table(spark, sf_correct, "documents")
    queries = spark.createDataFrame(RM3_QUERIES[:2], "query_id long, query string")
    got = rm3_batch_topk(docs, queries, k=5, fb_docs=5, fb_terms=6, alpha=1.0)
    for qid, qtext in RM3_QUERIES[:2]:
        want = [
            (r["doc_id"], r["score"], r["rank"])
            for r in rm3_topk(docs, qtext, k=5, fb_docs=5, fb_terms=6, alpha=1.0).collect()
        ]
        rows = sorted(
            (
                (r["doc_id"], r["score"], r["rank"])
                for r in got.collect()
                if r["query_id"] == qid
            ),
            key=lambda t: t[2],
        )
        assert rows == want


def test_rocchio_batch_equals_per_query_loop(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    queries = spark.createDataFrame(
        [(i, v) for i, v in sorted(qvecs.items())],
        "query_id long, query_vec array<double>",
    )
    got = rocchio_batch_topk(emb, queries, k=5, fb_k=8)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["label"], r["dist"], r["rank"])
        )
    for qid, vec in sorted(qvecs.items()):
        want = rocchio_topk(emb, vec, k=5, fb_k=8).collect()
        want_rows = [
            (r["vec_id"], r["label"], r["dist"]) for r in want
        ]
        rows = [
            (v, l, d)
            for v, l, d, _ in sorted(by_q[qid], key=lambda t: t[3])
        ]
        assert rows == want_rows, f"query {qid}"


def test_rocchio_batch_negative_and_label_scopes_match_loop(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 2).collect()
    }
    queries = spark.createDataFrame(
        [(i, v) for i, v in sorted(qvecs.items())],
        "query_id long, query_vec array<double>",
    )
    kw = dict(k=5, fb_k=5, gamma=0.25, neg_k=5, label=3)
    got = rocchio_batch_topk(emb, queries, **kw)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["label"], r["dist"])
        )
    for qid, vec in sorted(qvecs.items()):
        want = [
            (r["vec_id"], r["label"], r["dist"])
            for r in rocchio_topk(emb, vec, **kw).collect()
        ]
        assert by_q[qid] == want, f"query {qid}"


def test_batch_guards(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "query_id long, query string"
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        rm3_batch_topk(docs, dup, k=3)
    empty = spark.createDataFrame([], "query_id long, query string")
    with pytest.raises(ValueError, match="empty"):
        rm3_batch_topk(docs, empty, k=3)
    q3 = spark.createDataFrame(
        [(i, "quick fox") for i in range(3)], "query_id long, query string"
    )
    with pytest.raises(ValueError, match="max_queries"):
        rm3_batch_topk(docs, q3, k=3, max_queries=2)
    vdup = spark.createDataFrame(
        [(1, [1.0] * 64), (1, [0.5] * 64)],
        "query_id long, query_vec array<double>",
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        rocchio_batch_topk(emb, vdup, k=3)
    with pytest.raises(ValueError, match="negative set"):
        rocchio_batch_topk(
            emb,
            spark.createDataFrame(
                [(1, [1.0] * 64)], "query_id long, query_vec array<double>"
            ),
            gamma=0.5,
            neg_k=0,
        )
