"""Declared queries for the embedding-generation pipeline (SURVEY §2.7, §7 phase 3).

`embed_documents` value-checks embedding GENERATION itself (stub formula computed
independently by DuckDB); `search_by_text` is the reference's
`search-photos-by-text` flow end-to-end: embed the query string → cosine top-k
(photo_vector_search.py:156-176 with `_get_text_embedding`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.vector import cosine_distance
from photo_vector_search_spark.pipelines.embed import (
    stub_embedding_expr,
    stub_embedding_sql,
    with_stub_embedding,
)
from photo_vector_search_spark.sources.tables import load_table


def q_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-embed every document (JVM expression path); project spot components
    + the norm so values (not just shape) are oracle-checked."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = with_stub_embedding(docs, "text")
    norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return emb.select(
        "doc_id",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 2), 6).alias("e1"),
        F.round(F.element_at("embedding", 64), 6).alias("e63"),
        F.round(norm, 6).alias("norm"),
    )


_ORACLE_EMBED_DOCS = f"""
WITH emb AS (
  SELECT doc_id, {stub_embedding_sql('text')} AS e FROM documents
)
SELECT doc_id,
       round(e[1], 6) AS e0,
       round(e[2], 6) AS e1,
       round(e[64], 6) AS e63,
       round(sqrt(list_sum(list_transform(e, x -> x*x))), 6) AS norm
FROM emb
"""


_QUERY_TEXT = "tractor"  # the reference's own example query (examples.txt:11)


def q_search_by_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → stub embedding → exact cosine top-5 over the embeddings table —
    the full `search-photos-by-text` path (SURVEY §3.2), embedding computed
    in-engine on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = spark.range(1).select(
        stub_embedding_expr(F.lit(_QUERY_TEXT)).cast("array<double>").alias("qv")
    )
    from photo_vector_search_spark.operators.knn import _valid_dist

    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        cosine_distance(F.col("embedding"), F.col("qv")).alias("_dist"),
    ).filter(_valid_dist(F.col("_dist")))  # zero-norm rows never rank (any path)
    return (
        scored.orderBy(F.col("_dist").asc(), F.col("vec_id").asc())
        .limit(5)
        .select("vec_id", "label", F.round("_dist", 6).alias("dist"))
    )


_ORACLE_SEARCH_BY_TEXT = f"""
WITH q AS (SELECT {stub_embedding_sql(f"'{_QUERY_TEXT}'")} AS qv),
scored AS (
  SELECT vec_id, label,
         1.0 - list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS d
  FROM embeddings
)
SELECT vec_id, label, round(d, 6) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT 5
"""


QUERIES = {
    "embed_documents": q_embed_documents,
    "search_by_text": q_search_by_text,
}

ORACLES = {
    "embed_documents": _ORACLE_EMBED_DOCS,
    "search_by_text": _ORACLE_SEARCH_BY_TEXT,
}
