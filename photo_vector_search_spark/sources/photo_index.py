"""Derived `photo_index` table — the reference's logical row shape (SURVEY §1.1).

The reference's ChromaDB collection holds one row per (photo_path, aspect_name) with
an embedding and an Ollama-generated description (photo_vector_search.py:127-150).
The driver fixtures don't ship that table, so we derive it deterministically from
`embeddings` + `documents` (FIXTURES.md "derived fixtures"):

- 5 aspects per photo: photo_path = '/photos/img_<vec_id div 5>.jpg',
  aspect_name = 'aspect_<vec_id mod 5>'
- id = photo_path || '_' || aspect_name  (the reference's key recipe,
  photo_vector_search.py:127)
- description = documents.text joined on doc_id = vec_id (stands in for the
  VLM output, photo_vector_search.py:42-82)
- norm = L2 norm, precomputed at "write" time so cosine degrades to a dot product
  (SURVEY §4.2 item 2)

The same derivation exists as ``PHOTO_INDEX_SQL`` for the DuckDB oracle, so every
store operator built on this table is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.vector import l2_norm
from photo_vector_search_spark.sources.tables import load_table

ASPECTS_PER_PHOTO = 5

# DuckDB-side twin of build_photo_index (keep in lockstep!)
PHOTO_INDEX_SQL = """
SELECT
  '/photos/img_' || CAST(CAST(floor(e.vec_id / 5) AS BIGINT) AS VARCHAR) || '.jpg'
    AS photo_path,
  'aspect_' || CAST(e.vec_id % 5 AS VARCHAR) AS aspect_name,
  '/photos/img_' || CAST(CAST(floor(e.vec_id / 5) AS BIGINT) AS VARCHAR) || '.jpg'
    || '_' || 'aspect_' || CAST(e.vec_id % 5 AS VARCHAR) AS id,
  d.text AS description,
  e.vec_id, e.label
FROM embeddings e
LEFT JOIN documents d ON d.doc_id = e.vec_id
"""


def build_photo_index(
    spark: SparkSession, sf_dir: str, with_embedding: bool = False
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    photo_path = F.concat(
        F.lit("/photos/img_"),
        F.floor(F.col("vec_id") / ASPECTS_PER_PHOTO).cast("long").cast("string"),
        F.lit(".jpg"),
    )
    aspect = F.concat(F.lit("aspect_"), (F.col("vec_id") % ASPECTS_PER_PHOTO).cast("string"))
    cols = [
        photo_path.alias("photo_path"),
        aspect.alias("aspect_name"),
        F.concat(photo_path, F.lit("_"), aspect).alias("id"),  # F2 key recipe
        F.col("text").alias("description"),
        "vec_id",
        "label",
    ]
    if with_embedding:
        cols += [F.col("embedding"), l2_norm(F.col("embedding")).alias("norm")]
    # join key doc_id==vec_id is unique on both sides; Spark broadcasts the smaller
    # scan automatically under AQE — at 100 TB this becomes a co-partitioned join if
    # both tables are bucketed by the key.
    return emb.join(docs, emb.vec_id == docs.doc_id, "left").select(*cols)
