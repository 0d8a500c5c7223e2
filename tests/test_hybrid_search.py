"""Hybrid text search: the one-call composition equals hand-fusing its two
audited runs, surfaces docs that either modality alone ranks highly, and
validates its pool/weights contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.bm25 import bm25_topk
from photo_vector_search_spark.operators.fusion import hybrid_text_search, rrf_fuse
from photo_vector_search_spark.operators.knn import knn_topk
from photo_vector_search_spark.pipelines.embed import stub_embedding_expr
from photo_vector_search_spark.sources.tables import load_table

QUERY = "the quick brown fox"


def test_equals_hand_fused_runs(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    k, pool = 10, 30
    got = hybrid_text_search(docs, emb, QUERY, k=k, pool=pool).collect()

    qv = [
        float(v)
        for v in spark.range(1)
        .select(stub_embedding_expr(F.lit(QUERY)).alias("qv"))
        .first()["qv"]
    ]
    vec_run = (
        knn_topk(emb, qv, k=pool)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("dist").asc(), F.col("vec_id").asc())
            ),
        )
        .select(F.lit(0).alias("query_id"), F.col("vec_id").alias("doc_id"), "rank")
    )
    lex_run = bm25_topk(docs, QUERY, k=pool).select(
        F.lit(0).alias("query_id"), "doc_id", "rank"
    )
    want = (
        rrf_fuse([vec_run, lex_run], top_n=k)
        .select("doc_id", "rrf_score", "rank")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == k
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, k + 1)
    )


def test_both_modalities_contribute(spark, sf_correct):
    """A doc ranked #1 by either single run must appear in the fused pool
    ahead of docs neither run retrieved (RRF's monotonicity)."""
    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    fused = {r["doc_id"] for r in hybrid_text_search(docs, emb, QUERY, k=20).collect()}
    lex_best = bm25_topk(docs, QUERY, k=1).first()["doc_id"]
    assert lex_best in fused


def test_validation(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    with pytest.raises(ValueError, match="pool"):
        hybrid_text_search(docs, emb, QUERY, k=10, pool=5)
    with pytest.raises(ValueError, match="weights"):
        hybrid_text_search(docs, emb, QUERY, weights=(1.0,))


def test_hybrid_batch_equals_per_query_loop(spark, sf_correct):
    """hybrid_batch_search ≡ a Python loop of hybrid_text_search per query
    — the batched-serving contract extended to the fused hybrid family."""
    from photo_vector_search_spark.operators.fusion import (
        hybrid_batch_search,
        hybrid_text_search,
    )

    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    QS = [(0, "the quick brown fox"), (1, "data quality language")]
    queries = spark.createDataFrame(QS, "query_id long, query string")
    got = hybrid_batch_search(docs, emb, queries, k=6, pool=12)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rrf_score"], r["rank"])
        )
    for qid, qtext in QS:
        want = [
            (r["doc_id"], r["rrf_score"], r["rank"])
            for r in hybrid_text_search(
                docs, emb, qtext, k=6, pool=12
            ).collect()
        ]
        assert sorted(by_q.get(qid, []), key=lambda t: t[2]) == want, qid
    assert all(by_q.get(q) for q, _ in QS)


def test_hybrid_batch_guards(spark, sf_correct):
    import pytest as _pytest

    from photo_vector_search_spark.operators.fusion import hybrid_batch_search

    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "query_id long, query string"
    )
    with _pytest.raises(ValueError, match="duplicate query_id"):
        hybrid_batch_search(docs, emb, dup, k=3)
    termless = spark.createDataFrame(
        [(1, "fine query"), (2, "   ")], "query_id long, query string"
    )
    with _pytest.raises(ValueError, match="no terms"):
        hybrid_batch_search(docs, emb, termless, k=3)
    empty = spark.createDataFrame([], "query_id long, query string")
    with _pytest.raises(ValueError, match="empty"):
        hybrid_batch_search(docs, emb, empty, k=3)
    with _pytest.raises(ValueError, match="pool"):
        hybrid_batch_search(
            docs, emb,
            spark.createDataFrame([(1, "x")], "query_id long, query string"),
            k=5, pool=3,
        )


def test_hybrid_batch_store_lexical_matches_corpus(spark, sf_correct, tmp_path):
    """r13: hybrid_batch_search with the lexical pool served from the BM25
    postings store ≡ the corpus-pass hybrid, row-for-row — the shape the
    bench's hybrid_batch8 case now measures."""
    from photo_vector_search_spark.operators.bm25_store import build_bm25_store
    from photo_vector_search_spark.operators.fusion import hybrid_batch_search

    docs = load_table(spark, sf_correct, "documents")
    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "bm25_hybrid")
    build_bm25_store(docs, path)
    queries = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "data quality language")],
        "query_id long, query string",
    )
    got = hybrid_batch_search(
        docs, emb, queries, k=6, pool=12, bm25_store_path=path
    )
    want = hybrid_batch_search(docs, emb, queries, k=6, pool=12)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )
