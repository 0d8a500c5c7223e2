"""BM25 lexical retrieval: full-formula DuckDB twin over the real documents
table, hand-computed tiny-corpus values, NULL/empty discipline, top-k rank
ordering, partitioning invariance, and parameter validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.bm25 import (
    bm25_scores,
    bm25_topk,
    query_terms,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches

QUERY = "the quick brown fox"


def _twin_sql(query: str, k1: float = 1.2, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms(query))
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
tf AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*) AS tf
  FROM base, LATERAL unnest(toks) AS t(term)
  WHERE t.term IN ({terms})
  GROUP BY doc_id, len(toks), t.term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       round(sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl))), 6)
         AS bm25,
       count(*) AS n_terms
FROM tf JOIN df USING (term) CROSS JOIN stats s
GROUP BY tf.doc_id
"""


def test_matches_duckdb_twin_on_fixture_corpus(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = bm25_scores(docs, QUERY)
    assert got.count() > 0  # the query must actually match something
    assert_matches(got, _twin_sql(QUERY), sf_correct)
    # a second parameterization exercises k1/b in both engines
    got2 = bm25_scores(docs, QUERY, k1=0.9, b=0.4)
    assert_matches(got2, _twin_sql(QUERY, k1=0.9, b=0.4), sf_correct)


def test_hand_computed_tiny_corpus(spark):
    """One term, three docs, closed-form check of the Lucene-idf BM25."""
    docs = spark.createDataFrame(
        [
            (0, "fox fox jumps"),   # tf=2, dl=3
            (1, "fox sleeps"),      # tf=1, dl=2
            (2, "no match here"),   # absent from output
            (3, None),              # NULL: never matches
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in bm25_scores(docs, "fox").collect()}
    assert set(out) == {0, 1}
    n, avgdl = 3, (3 + 2 + 3) / 3  # NULL doc excluded everywhere
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert out[0]["bm25"] == pytest.approx(s(2, 3), abs=1e-6)
    assert out[1]["bm25"] == pytest.approx(s(1, 2), abs=1e-6)
    assert out[0]["n_terms"] == out[1]["n_terms"] == 1
    # term saturation: tf=2 scores more than tf=1 but less than 2x
    assert out[1]["bm25"] < out[0]["bm25"] < 2 * out[1]["bm25"]


def test_topk_ordering_and_consistency(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    top = bm25_topk(docs, QUERY, k=10).collect()
    assert 0 < len(top) <= 10
    assert [r["rank"] for r in top] == list(range(1, len(top) + 1))
    scores = [r["bm25"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # top-k is exactly the k best rows of the full score frame
    full = bm25_scores(docs, QUERY).collect()
    want = sorted(full, key=lambda r: (-r["bm25"], r["doc_id"]))[: len(top)]
    assert [(r["doc_id"], r["bm25"]) for r in top] == [
        (r["doc_id"], r["bm25"]) for r in want
    ]


def test_partitioning_invariant(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    a = sorted(map(tuple, bm25_scores(docs.repartition(13), QUERY).collect()))
    b = sorted(map(tuple, bm25_scores(docs.coalesce(1), QUERY).collect()))
    assert a == b


def test_batch_equals_per_query_loop_and_twin(spark, sf_correct):
    """bm25_batch_topk ≡ a Python loop of bm25_topk per query (idf/avgdl/N
    are corpus statistics, so shared-pass scoring changes nothing), and a
    DuckDB twin recomputes the whole batch from the registered queries."""
    import duckdb
    import pandas as pd

    from photo_vector_search_spark.operators.bm25 import bm25_batch_topk

    docs = load_table(spark, sf_correct, "documents")
    QS = [
        (0, "the quick brown fox"),
        (1, "lazy dog river"),
        (2, "distributed query engines"),
    ]
    queries = spark.createDataFrame(QS, "query_id long, query string")
    batch = bm25_batch_topk(docs, queries, k=8)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["bm25"])
        )
    for qid, q in QS:
        loop = bm25_topk(docs, q, k=8).collect()
        want = [(r["rank"], r["doc_id"], r["bm25"]) for r in loop]
        assert sorted(got.get(qid, [])) == sorted(want), qid

    # DuckDB twin of the batched form (query tokenization replayed in SQL)
    con = duckdb.connect()
    try:
        con.register(
            "queries", pd.DataFrame(QS, columns=["query_id", "query"])
        )
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_correct}/documents.parquet')"
        )
        want_rows = con.execute(
            r"""
WITH qt AS (
  SELECT DISTINCT query_id, t.term
  FROM queries, LATERAL unnest(
    list_filter(regexp_split_to_array(lower(trim(query)), '\s+'),
                x -> x <> '')) AS t(term)
),
base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
tf AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*) AS tf
  FROM base, LATERAL unnest(toks) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
  GROUP BY doc_id, len(toks), t.term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6)
           AS bm25
  FROM tf JOIN df USING (term) JOIN qt USING (term) CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)
SELECT query_id, doc_id, bm25,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank
FROM scored QUALIFY rank <= 8
            """
        ).fetchall()
    finally:
        con.close()
    want = {(q, d, b_, rk) for q, d, b_, rk in want_rows}
    got_set = {
        (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
        for r in batch.collect()
    }
    assert got_set == want

    with pytest.raises(ValueError, match="split the query set"):
        bm25_batch_topk(docs, queries, k=8, max_queries=2)
    dup_q = spark.createDataFrame(
        [(1, "quick fox"), (1, "lazy dog")], "query_id long, query string"
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        bm25_batch_topk(docs, dup_q, k=8)
    with pytest.raises(ValueError, match="no query has any terms"):
        bm25_batch_topk(
            docs,
            spark.createDataFrame([(0, "  ")], "query_id long, query string"),
        )


def test_absent_terms_and_validation(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    # a query term missing from the corpus contributes nothing; others score
    out = bm25_scores(docs, "alpha zzz_nowhere").collect()
    assert {r["doc_id"] for r in out} == {0}
    # all-absent query: empty result, not an error
    assert bm25_scores(docs, "zzz_nowhere").count() == 0
    with pytest.raises(ValueError, match="no terms"):
        bm25_scores(docs, "   ")
    with pytest.raises(ValueError, match="k1"):
        bm25_scores(docs, "alpha", k1=-0.1)
    with pytest.raises(ValueError, match="b must"):
        bm25_scores(docs, "alpha", b=1.5)
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(docs, "alpha", k=0)
    # empty corpus: empty frame with the right schema
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_scores(empty, "alpha")
    assert out.count() == 0 and set(out.columns) == {"doc_id", "bm25", "n_terms"}
