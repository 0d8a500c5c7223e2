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
    # plan-shape assertions need the BARE file scan: a table cached by an
    # earlier test substitutes InMemoryRelation into this plan (Spark's
    # CacheManager matches analyzed subtrees), and auto mode then — correctly —
    # classifies the upstream as not-a-bare-scan and stages it
    spark.catalog.clearCache()
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
    spark.catalog.clearCache()  # see test_jaccard_auto_stage_by_input_shape
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bare = fuzzy_pairs_blocked(docs, max_dist=20)
    assert _gen_count(bare) > 0
    wide = docs.groupBy("doc_id").agg(F.first("text").alias("text"))
    staged = fuzzy_pairs_blocked(wide, max_dist=20)
    assert _gen_count(staged) == 0
    assert _rows(bare) == _rows(staged)


def test_pack_auto_stage_by_input_shape(spark):
    """pack_token_windows fans its token frame into THREE jobs; a wide
    upstream must be staged once (plan reads the staged parquet scan), a
    bare-scan-equivalent shape re-derives, and results match either way."""
    from photo_vector_search_spark.operators.packing import pack_token_windows

    rows = [(i, list(range(1, 1 + i % 9))) for i in range(80)]
    df = spark.createDataFrame(rows, "pos long, input_ids array<int>")
    # LocalRelation is not a bare FILE scan — auto mode stages it: the main
    # plan reads the staged parquet, not the local rows
    auto = pack_token_windows(df, 16)
    assert "pvs_pack" in auto._jdf.queryExecution().executedPlan().toString()
    forced_off = pack_token_windows(df, 16, stage=False)
    assert "pvs_pack" not in forced_off._jdf.queryExecution().executedPlan().toString()
    assert _rows(auto.select("seq_id", "n_tokens", "n_docs")) == _rows(
        forced_off.select("seq_id", "n_tokens", "n_docs")
    )
    a = {r["seq_id"]: list(r["input_ids"]) for r in auto.collect()}
    b = {r["seq_id"]: list(r["input_ids"]) for r in forced_off.collect()}
    assert a == b and len(a) > 0


def test_jaccard_max_df_staged_path_matches(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # max_df prunes the same shingles staged or not
    assert _rows(jaccard_pairs(docs, max_df=0.9, stage=True)) == _rows(
        jaccard_pairs(docs, max_df=0.9, stage=False)
    )
