"""Retrieval metrics: hand-computed fixture values, boundary behaviors
(zero-hit queries, result-only queries, gold dup collapse), self-recall
identity, and a full DuckDB twin of a label-gold eval over real embeddings."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.vector import cosine_distance
from photo_vector_search_spark.operators.evaluation import (
    ann_recall,
    retrieval_metrics,
    retrieval_summary,
)
from photo_vector_search_spark.operators.knn import knn_batch
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import run_oracle


def _fixture(spark):
    results = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1, 1, 2, 2, 2, 4, 4],
                "doc_id": ["a", "x", "b", "p", "q", "y", "m", "n"],
                "rank": [1, 2, 3, 1, 2, 3, 1, 2],
            }
        )
    )
    # q3 has gold but no results; q4 has results but no gold; q1 gold has a
    # duplicate pair that must collapse
    gold = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1, 1, 1, 2, 3],
                "doc_id": ["a", "b", "c", "a", "y", "z"],
            }
        )
    )
    return results, gold


def test_hand_computed_metrics(spark):
    results, gold = _fixture(spark)
    out = {r["query_id"]: r.asDict() for r in retrieval_metrics(results, gold, 3).collect()}
    assert set(out) == {1, 2, 3}  # q4 (no gold) excluded

    q1 = out[1]
    assert (q1["n_gold"], q1["n_hits"], q1["hit"]) == (3, 2, 1)
    assert q1["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["mrr"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert q1["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)

    q2 = out[2]
    assert (q2["n_gold"], q2["n_hits"]) == (1, 1)
    assert q2["recall"] == 1.0 and q2["precision"] == pytest.approx(1 / 3, abs=1e-6)
    assert q2["mrr"] == pytest.approx(1 / 3, abs=1e-6)
    assert q2["ndcg"] == pytest.approx(round((1 / math.log2(4)) / 1.0, 6), abs=1e-6)

    q3 = out[3]  # gold, nothing retrieved: zeros, not a dropped row
    assert (q3["n_hits"], q3["recall"], q3["mrr"], q3["ndcg"], q3["hit"]) == (
        0, 0.0, 0.0, 0.0, 0,
    )


def test_summary_means(spark):
    results, gold = _fixture(spark)
    row = retrieval_summary(results, gold, 3).first()
    assert row["n_queries"] == 3
    assert row["mean_hit"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["mean_recall"] == pytest.approx((2 / 3 + 1 + 0) / 3, abs=1e-6)


def test_cutoff_applies_to_results(spark):
    results, gold = _fixture(spark)
    # k=1: q1 keeps only rank-1 'a' (hit), q2's gold sits at rank 3 (miss)
    out = {r["query_id"]: r for r in retrieval_metrics(results, gold, 1).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["precision"] == 1.0
    assert out[2]["n_hits"] == 0 and out[2]["mrr"] == 0.0


def test_ann_self_recall_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_batch(emb, queries, k=5)
    per_q = ann_recall(exact, exact, 5).collect()
    assert len(per_q) == 8
    assert all(r["recall"] == 1.0 and r["ndcg"] == 1.0 and r["mrr"] == 1.0 for r in per_q)


def test_label_gold_eval_matches_duckdb(spark, sf_correct):
    # leave-one-out label retrieval eval: queries = first 16 vectors,
    # candidates exclude the query itself, gold = same-label others
    emb = load_table(spark, sf_correct, "embeddings")
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    k = 10
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    results = (
        emb.crossJoin(F.broadcast(queries.drop("query_label")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_distance(
                F.col("embedding").cast("array<double>"), F.col("query_vec")
            ).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    gold = (
        emb.select("vec_id", "label")
        .join(
            F.broadcast(queries.select("query_id", "query_label")),
            F.col("label") == F.col("query_label"),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id"))
    )
    got = (
        retrieval_metrics(results, gold, k, doc_col="vec_id")
        .orderBy("query_id")
        .toPandas()
    )
    want = run_oracle(
        f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 16
),
ranked AS (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY 1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv) ASC,
                    e.vec_id ASC
         ) AS rank
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
res AS (SELECT * FROM ranked WHERE rank <= {k}),
gold AS (
  SELECT q.query_id, e.vec_id
  FROM embeddings e JOIN q ON e.label = q.ql AND e.vec_id <> q.query_id
),
gn AS (SELECT query_id, count(*) AS n_gold FROM gold GROUP BY query_id),
h AS (
  SELECT r.query_id, count(*) AS n_hits, min(r.rank) AS first_rank,
         sum(1.0 / log2(r.rank + 1.0)) AS dcg
  FROM res r JOIN gold g ON g.query_id = r.query_id AND g.vec_id = r.vec_id
  GROUP BY r.query_id
),
idcg AS (
  SELECT gn.query_id, sum(1.0 / log2(ri.i + 1.0)) AS v
  FROM gn JOIN (SELECT unnest(generate_series(1, {k})) AS i) ri
    ON ri.i <= least({k}, gn.n_gold)
  GROUP BY gn.query_id
)
SELECT gn.query_id, gn.n_gold,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 / gn.n_gold, 6) AS recall,
       round(coalesce(h.n_hits, 0) * 1.0 / {k}, 6) AS precision,
       CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS hit,
       round(coalesce(1.0 / h.first_rank, 0.0), 6) AS mrr,
       round(coalesce(h.dcg, 0.0) / idcg.v, 6) AS ndcg
FROM gn
LEFT JOIN h ON h.query_id = gn.query_id
JOIN idcg ON idcg.query_id = gn.query_id
ORDER BY gn.query_id
        """,
        sf_correct,
    )
    assert len(got) == len(want) == 16
    for col in ("n_gold", "n_hits", "hit"):
        assert got[col].tolist() == want[col].tolist(), col
    for col in ("recall", "precision", "mrr", "ndcg"):
        assert got[col].tolist() == pytest.approx(want[col].tolist(), abs=1e-6), col


def test_duplicate_result_rows_collapse_to_best_rank(spark):
    """A duplicate-emitting ranker must not double-join its gold pair: dup
    (query, doc) rows within the cutoff collapse to their best rank, so the
    metrics equal the clean ranker's exactly (trec_eval first-occurrence
    semantics) — the enforced form of the old documented precondition."""
    clean = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1, 1],
                "doc_id": ["a", "x", "b"],
                "rank": [1, 2, 3],
            }
        )
    )
    # same list but 'a' re-emitted at ranks 2 and 3, 'b' duplicated at 3
    dup = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1, 1, 1, 1, 1],
                "doc_id": ["a", "a", "x", "b", "a", "b"],
                "rank": [1, 2, 2, 3, 3, 3],
            }
        )
    )
    gold = spark.createDataFrame(
        pd.DataFrame({"query_id": [1, 1, 1], "doc_id": ["a", "b", "c"]})
    )
    want = {r["query_id"]: r.asDict() for r in retrieval_metrics(clean, gold, 3).collect()}
    got = {r["query_id"]: r.asDict() for r in retrieval_metrics(dup, gold, 3).collect()}
    assert got == want
    # n_hits counts UNIQUE gold docs retrieved (2), never join multiplicity
    assert got[1]["n_hits"] == 2
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert got[1]["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)


def test_k_validation(spark):
    results, gold = _fixture(spark)
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(results, gold, 0)
