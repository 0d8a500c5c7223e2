"""Fan-out staging economics (r7): operators whose derived frame feeds
multiple consumers stage it to parquet exactly when re-deriving is NOT a
cheap bare-scan re-read — the shuffle_corpus plan-inspection rule — and
results are identical either way."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import (
    fuzzy_pairs_blocked,
    jaccard_pairs,
)
from photo_vector_search_spark.sources.tables import load_table


def _gen_count(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Generate")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jaccard_auto_stage_by_input_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bare = jaccard_pairs(docs)  # bare scan: re-derive (staging measured slower)
    assert _gen_count(bare) > 0
    wide = docs.groupBy("doc_id").agg(F.first("text").alias("text"))
    staged = jaccard_pairs(wide)  # wide upstream: staged, single execution
    assert _gen_count(staged) == 0
    assert _rows(bare) == _rows(staged)
    # explicit override wins in both directions
    assert _gen_count(jaccard_pairs(docs, stage=True)) == 0
    assert _gen_count(jaccard_pairs(wide, stage=False)) > 0


def test_fuzzy_auto_stage_by_input_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bare = fuzzy_pairs_blocked(docs, max_dist=20)
    assert _gen_count(bare) > 0
    wide = docs.groupBy("doc_id").agg(F.first("text").alias("text"))
    staged = fuzzy_pairs_blocked(wide, max_dist=20)
    assert _gen_count(staged) == 0
    assert _rows(bare) == _rows(staged)


def test_jaccard_max_df_staged_path_matches(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # max_df prunes the same shingles staged or not
    assert _rows(jaccard_pairs(docs, max_df=0.9, stage=True)) == _rows(
        jaccard_pairs(docs, max_df=0.9, stage=False)
    )
