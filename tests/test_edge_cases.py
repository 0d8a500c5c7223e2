"""Empty/degenerate-input behavior of every operator family — the regressions
that bite when a filter upstream happens to match nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.canonicalize import canonicalize_groups
from photo_vector_search_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from photo_vector_search_spark.operators.knn import knn_batch, knn_topk
from photo_vector_search_spark.operators.store import merge_upsert
from photo_vector_search_spark.pipelines.embed import index_photos
from photo_vector_search_spark.pipelines.multimodal import decode_images
from photo_vector_search_spark.sources.tables import load_table


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_knn_on_empty_store(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(0)
    assert knn_topk(emb, [0.1] * 64, k=5).count() == 0


def test_knn_batch_with_empty_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert knn_batch(emb, queries, k=3).count() == 0


def test_dedup_family_on_empty_docs(spark):
    docs = _empty_docs(spark)
    assert exact_dedup(docs).count() == 0
    assert jaccard_pairs(docs, 3, 0.5).count() == 0
    assert minhash_lsh_pairs(docs, 3, 0.5).count() == 0
    assert simhash_pairs(docs).count() == 0


def test_short_docs_produce_no_shingles_but_survive(spark):
    """Docs shorter than the shingle width have no trigrams — pair ops skip them,
    exact dedup still handles them."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "a much longer document with many words here")],
        "doc_id long, text string",
    )
    assert jaccard_pairs(docs, 3, 0.1).count() == 0  # no shared trigrams possible
    groups = {r.doc_id: r.group_size for r in exact_dedup(docs).collect()}
    assert groups == {1: 2, 2: 2, 3: 1}


def test_merge_upsert_into_empty_existing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(5)
    empty = docs.limit(0)
    merged = merge_upsert(empty, docs, ["doc_id"])
    assert merged.count() == 5
    merged2 = merge_upsert(docs, empty, ["doc_id"])
    assert merged2.count() == 5


def test_index_photos_empty_batch(spark):
    files = spark.createDataFrame([], "path string, content binary")
    assert index_photos(files, existing=None).count() == 0


def test_decode_images_empty_and_null_content(spark):
    files = spark.createDataFrame(
        [("/m/empty.img", b""), ("/m/null.img", None)], "path string, content binary"
    )
    rows = {r.path: r for r in decode_images(files).collect()}
    assert all(r.error.startswith("decode_error") for r in rows.values())


def test_canonicalize_empty(spark):
    records = spark.createDataFrame(
        [], "doc_id long, group_id string, source string, quality double"
    )
    assert canonicalize_groups(records).count() == 0
