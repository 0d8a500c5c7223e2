"""Cross-family integration: the conditioned serving ladder — PCA-whiten
the corpus, SQ8-encode the whitened vectors, search the codes, and measure
the ladder against exact search in the SAME whitened space with the
evaluation operators. Pins that the r10b families compose end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.embeddings import (
    apply_whitening,
    fit_pca_whitening,
)
from photo_vector_search_spark.operators.evaluation import (
    ann_recall,
    retrieval_summary,
)
from photo_vector_search_spark.operators.knn import knn_batch
from photo_vector_search_spark.operators.sq import encode_sq8, fit_sq8, sq8_topk
from photo_vector_search_spark.sources.tables import load_table


def test_whiten_sq8_search_eval_ladder(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")

    # 1. condition: whiten to 32 dims
    wm = fit_pca_whitening(emb, dim=32)
    white = apply_whitening(emb, wm).select(
        "vec_id", "label", F.col("embedding_white").alias("embedding")
    )

    # 2. compress: SQ8 over the whitened space
    sqm = fit_sq8(white)
    coded = encode_sq8(white, sqm)

    # 3. serve: per-query coarse+rerank vs exact, both in whitened space
    qrows = white.filter(F.col("vec_id") < 8).collect()
    approx_parts, exact_parts = [], []
    for r in qrows:
        qv = [float(v) for v in r["embedding"]]
        a = sq8_topk(coded, sqm, qv, k=5, rerank=40).withColumn(
            "query_id", F.lit(r["vec_id"])
        )
        approx_parts.append(a)
    approx = approx_parts[0]
    for p in approx_parts[1:]:
        approx = approx.unionByName(p)
    queries = white.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_batch(white, queries, k=5)

    # 4. evaluate: rerank ladder must reproduce exact search
    per_q = ann_recall(approx, exact, 5).collect()
    assert len(per_q) == 8
    assert all(r["recall"] == 1.0 for r in per_q), per_q

    # and the corpus-mean surface agrees
    row = retrieval_summary(
        approx, exact.select("query_id", "vec_id"), 5, doc_col="vec_id"
    ).first()
    assert row["n_queries"] == 8
    assert row["mean_recall"] == pytest.approx(1.0)
