"""Declared queries for the reference's CRUD/store surface (SURVEY §2.2, §2.4, §2.6,
§2.8) over the derived `photo_index` table.

Determinism conventions (FIXTURES.md):
- no raw float or array columns in outputs — floats rounded after exact
  (decimal-summed) aggregation, arrays rendered as sorted CSV strings;
- every computed column aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.store import (
    delete_by_key,
    delete_where,
    merge_upsert,
    point_lookup,
    truncate,
)
from photo_vector_search_spark.sources.photo_index import PHOTO_INDEX_SQL, build_photo_index
from photo_vector_search_spark.sources.tables import load_table

_PI = f"WITH photo_index AS ({PHOTO_INDEX_SQL})"


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 — examine-image: all aspects of one photo (cli.py:166-185)."""
    store = build_photo_index(spark, sf_dir)
    return point_lookup(store, "/photos/img_7.jpg").select(
        "id", "aspect_name", "description", "label"
    )


def q_distinct_photos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — unique photo list (app.py:52-53)."""
    return build_photo_index(spark, sf_dir).select("photo_path").distinct()


def q_photo_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — per-photo aspect reconstruction (cli.py:178-185), CSV-rendered."""
    return (
        build_photo_index(spark, sf_dir)
        .groupBy("photo_path")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("aspect_name"))).alias("aspects_csv"),
            F.count(F.lit(1)).alias("n_aspects"),
        )
    )


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — batch last-write-wins upsert end state (photo_vector_search.py:114-154)."""
    full = build_photo_index(spark, sf_dir)
    existing = full.select("id", "photo_path", "aspect_name", "description")
    updates = full.filter(F.col("vec_id") < 25).select(
        "id",
        "photo_path",
        "aspect_name",
        F.concat(F.lit("UPDATED:"), F.col("id")).alias("description"),
    )
    return merge_upsert(existing, updates, ["id"])


def q_delete_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D2 — per-photo row counts after a keyed delete and a predicate delete
    (photo_vector_search.py:198-212)."""
    store = build_photo_index(spark, sf_dir)
    after_d1 = delete_by_key(store, "/photos/img_3.jpg", "aspect_2")
    after_d2 = delete_where(after_d1, F.col("photo_path") == "/photos/img_4.jpg")
    return after_d2.groupBy("photo_path").agg(F.count(F.lit(1)).alias("n_rows"))


def q_store_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC7 — truncate keeps schema, drops all rows (cli.py:149). RETIRED from
    the declared surface (round 7, for the substring_dedup slot): a limit(0)
    schema check; still oracle-verified via tests/test_retired_surface.py."""
    return truncate(build_photo_index(spark, sf_dir).select("id", "photo_path"))


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F7 scalar surface in one projection (concat key, lower, length, base64,
    trim, rounded float, basename extraction)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat_ws("_", F.col("source"), F.col("lang")).alias("key"),
        F.lower(F.col("source")).alias("source_lc"),
        # long, matching DuckDB length()'s BIGINT (type-level parity, not just value)
        F.length(F.col("text")).cast("long").alias("text_len"),
        F.base64(F.substring(F.col("text"), 1, 16).cast("binary")).alias("b64_prefix"),
        F.trim(F.substring(F.col("text"), 1, 20)).alias("trimmed"),
        F.round(F.col("n_chars").cast("double") / 100, 4).alias("chars_h"),
        F.element_at(F.split(F.lit("/photos/img_3.jpg"), "/"), -1).alias("basename"),
    )


def q_describe_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store browse summary (app.py:24-46 View/Manage parity — the non-
    presentation content of the reference's UI pages): per-aspect rows, distinct
    photos, described fraction, embedding dims. RETIRED from the declared
    surface (round 7, for the encode_bpe slot): overlaps photo_group_collect /
    distinct_photos; still oracle-verified via tests/test_retired_surface.py."""
    from photo_vector_search_spark.operators.store import describe_store

    return describe_store(build_photo_index(spark, sf_dir, with_embedding=True))


def q_store_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC4 write path + P2 — the store persisted hive-partitioned
    (``snapshot_overwrite(partition_by=...)``, the at-rest half of the IVF
    design) and queried through a partition filter: ``label IN (3,5)`` prunes
    whole directories at file-listing time (PartitionFilters — runtime scan
    metrics asserted in tests/test_scale_design.py), then exact top-k on the
    surviving fraction."""
    import atexit
    import shutil
    import tempfile

    from photo_vector_search_spark.operators.knn import fetch_query_vector, knn_topk
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    emb = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="pvs_part_store_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    store_path = tmp + "/store"
    snapshot_overwrite(emb, store_path, partition_by=["label"])
    pruned = spark.read.parquet(store_path).filter(F.col("label").isin(3, 5))
    return knn_topk(pruned, fetch_query_vector(spark, sf_dir, 0), k=10)


def q_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — input cardinality (cli.py:43). RETIRED from the declared surface
    (round 3): a bare count(*) is subsumed by `distinct_counts` (n_docs) and
    `describe_store` (n_rows); still oracle-verified locally via
    tests/test_retired_surface.py."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


QUERIES = {
    "upsert_merge": q_upsert_merge,
    "store_partition_pruned": q_store_partition_pruned,
}

# store_truncate / describe_store RETIRED r7 to free two checked slots for
# the round-6 operators (substring_dedup, encode_bpe): truncate is a
# limit(0) schema check and describe_store overlaps photo_group_collect /
# distinct_photos — both stay implemented and locally oracle-verified via
# tests/test_retired_surface.py.
# point_lookup retired r7b (for the ppl_filter slot): a single conjunctive
# point predicate whose pushdown shape is already declared-evidenced by
# store_partition_pruned (point predicate + partition pruning + top-k) and
# delete_ops/scalar_funcs (conjunctive filters); stays locally oracle-exact.
# delete_ops / scalar_funcs retired r10 (for the curriculum_order / kn_score
# slots): both are thin — delete_ops is two NOT-predicates + a groupBy count
# whose machinery stays declared via dedup_exact/upsert_merge, and
# scalar_funcs is a pure scalar projection already pytest-pinned per
# function; both remain locally oracle-verified here.
# distinct_photos / photo_group_collect retired r10b (for the retrieval_eval /
# budget_select slots): a bare DISTINCT and a collect_list/concat_ws rollup,
# the thinnest declared entries left — their machinery stays declared via
# dedup_exact (distinct/group canonicalization) and pack_sequences (ordered
# array-to-CSV aggregation); both remain locally oracle-verified here and
# photo_group_collect keeps its bench/scale rows.
RETIRED_QUERIES = {
    "point_lookup": q_point_lookup,
    "count_rows": q_count_rows,
    "store_truncate": q_store_truncate,
    "describe_store": q_describe_store,
    "delete_ops": q_delete_ops,
    "scalar_funcs": q_scalar_funcs,
    "distinct_photos": q_distinct_photos,
    "photo_group_collect": q_photo_group_collect,
}

RETIRED_ORACLES = {
    "point_lookup": f"""{_PI}
SELECT id, aspect_name, description, label FROM photo_index
WHERE photo_path = '/photos/img_7.jpg'""",
    "count_rows": "SELECT count(*) AS n FROM lineitem",
    "store_truncate": f"""{_PI}
SELECT id, photo_path FROM photo_index WHERE 1 = 0""",
    "describe_store": """
SELECT 'aspect_' || CAST(e.vec_id % 5 AS VARCHAR) AS aspect_name,
       count(*) AS n_rows,
       count(DISTINCT '/photos/img_' || CAST(CAST(floor(e.vec_id / 5) AS BIGINT) AS VARCHAR)
             || '.jpg') AS n_photos,
       CAST(sum(CASE WHEN length(coalesce(d.text, '')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_described,
       min(len(e.embedding)) AS dim_min,
       max(len(e.embedding)) AS dim_max
FROM embeddings e LEFT JOIN documents d ON d.doc_id = e.vec_id
GROUP BY 1""",
    "delete_ops": f"""{_PI}
SELECT photo_path, count(*) AS n_rows FROM photo_index
WHERE NOT (photo_path = '/photos/img_3.jpg' AND aspect_name = 'aspect_2')
  AND NOT (photo_path = '/photos/img_4.jpg')
GROUP BY photo_path""",
    "scalar_funcs": """
SELECT doc_id,
       source || '_' || lang AS key,
       lower(source) AS source_lc,
       length(text) AS text_len,
       to_base64(substring(text, 1, 16)::BLOB) AS b64_prefix,
       trim(substring(text, 1, 20)) AS trimmed,
       round(CAST(n_chars AS DOUBLE) / 100, 4) AS chars_h,
       string_split('/photos/img_3.jpg', '/')[-1] AS basename
FROM documents WHERE doc_id < 50""",
    "distinct_photos": f"""{_PI}
SELECT DISTINCT photo_path FROM photo_index""",
    "photo_group_collect": f"""{_PI}
SELECT photo_path,
       array_to_string(list_sort(list(aspect_name)), ',') AS aspects_csv,
       count(*) AS n_aspects
FROM photo_index GROUP BY photo_path""",
}

ORACLES = {
    "upsert_merge": f"""{_PI},
existing AS (SELECT id, photo_path, aspect_name, description FROM photo_index),
updates AS (SELECT id, photo_path, aspect_name, 'UPDATED:' || id AS description
            FROM photo_index WHERE vec_id < 25)
SELECT e.* FROM existing e ANTI JOIN updates u ON e.id = u.id
UNION ALL SELECT * FROM updates""",
    "store_partition_pruned": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         1.0 - list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS d
  FROM embeddings WHERE label IN (3, 5)
)
SELECT vec_id, label, round(d, 6) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT 10""",
}
