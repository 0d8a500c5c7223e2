"""Incremental maintenance for the ColBERTv2 compressed token store:
upsert/delete/revive/live-serve ≡ in-memory composition against the FROZEN
quantizer, convergent compaction (store_sig restamped, side tables
cleared), empty-doc refusal, foreign-build side-table refusal, and the
Structured-Streaming ingestion rung with full-replay idempotence."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.cv2_maintenance import (
    compact_colbertv2_store,
    delete_from_colbertv2_store,
    live_colbertv2_search,
    load_live_colbertv2,
    upsert_colbertv2_store,
)
from photo_vector_search_spark.operators.token_compression import (
    build_colbertv2_store,
    colbertv2_store_search,
    encode_token_matrices,
    load_colbertv2_store,
    maxsim_topk_compressed,
)
from photo_vector_search_spark.sources.tables import load_table

QUERY = "the quick brown fox"


def _docs(spark, sf_correct):
    return load_table(spark, sf_correct, "documents").select("doc_id", "text")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _composed_topk(spark, path, docs_composed, k=6):
    """Ground truth: encode the COMPOSED corpus against the store's frozen
    quantizer in memory and search — what live serving must reproduce."""
    from photo_vector_search_spark.operators.late_interaction import (
        doc_token_embeddings,
    )

    _base, quant, meta = load_colbertv2_store(spark, path)
    toks = doc_token_embeddings(
        docs_composed, max_tokens=meta["max_tokens"], dim=meta["dim"]
    )
    coded = encode_token_matrices(toks, quant, id_col=meta["id_col"])
    return maxsim_topk_compressed(coded, quant, QUERY, k=k)


def test_upsert_delete_revive_live_compact(spark, sf_correct, tmp_path):
    docs = _docs(spark, sf_correct)
    base = docs.filter(F.col("doc_id") < 400)
    path = str(tmp_path / "cv2")
    build_colbertv2_store(base, path, n_centroids=16)

    new = spark.createDataFrame(
        [
            (0, "quick quick fox jumps"),
            (2, "fox fox fox"),
            (9000, "the quick addition"),
        ],
        "doc_id long, text string",
    )
    assert upsert_colbertv2_store(spark, path, new) == 3
    composed = base.join(new.select("doc_id"), "doc_id", "left_anti").unionByName(new)
    got = _rows(live_colbertv2_search(spark, path, QUERY, k=6))
    assert got == _rows(_composed_topk(spark, path, composed))

    # delete one base + one upserted id
    assert delete_from_colbertv2_store(spark, path, [0, 9000]) == 2
    composed2 = composed.filter(~F.col("doc_id").isin([0, 9000]))
    assert _rows(live_colbertv2_search(spark, path, QUERY, k=6)) == _rows(
        _composed_topk(spark, path, composed2)
    )

    # revive a tombstoned id
    revive = spark.createDataFrame(
        [(9000, "fox quick fox quick")], "doc_id long, text string"
    )
    assert upsert_colbertv2_store(spark, path, revive) == 1
    composed3 = composed2.unionByName(revive)
    live_before = _rows(live_colbertv2_search(spark, path, QUERY, k=6))
    assert live_before == _rows(_composed_topk(spark, path, composed3))

    # compact: base serving ≡ live before it; side tables gone; live == base
    n = compact_colbertv2_store(spark, path)
    assert n == composed3.count()
    assert _rows(colbertv2_store_search(spark, path, QUERY, k=6)) == live_before
    assert _rows(live_colbertv2_search(spark, path, QUERY, k=6)) == live_before
    for side in (".delta", ".tombstones"):
        assert not os.path.exists(path + side)
    _b, _q, meta = load_colbertv2_store(spark, path)  # sig restamp verified
    assert meta["n_docs"] == composed3.count()


def test_prefiltered_live_serving_and_empty_doc_refusal(
    spark, sf_correct, tmp_path
):
    docs = _docs(spark, sf_correct)
    path = str(tmp_path / "cv2")
    build_colbertv2_store(docs.filter(F.col("doc_id") < 200), path, n_centroids=8)
    new = spark.createDataFrame(
        [(9000, "quick brown fox everywhere")], "doc_id long, text string"
    )
    upsert_colbertv2_store(spark, path, new)

    # prefilter covering the live corpus ≡ unfiltered live
    full = _rows(live_colbertv2_search(spark, path, QUERY, k=5))
    cov = _rows(live_colbertv2_search(spark, path, QUERY, k=5, prefilter_n=201))
    assert cov == full
    # the upserted doc (three exact query-token matches) must win
    assert full[0][0] == 9000

    with pytest.raises(ValueError, match="cannot shadow"):
        upsert_colbertv2_store(
            spark,
            path,
            spark.createDataFrame([(5, "")], "doc_id long, text string"),
        )
    with pytest.raises(ValueError, match="duplicate ids"):
        upsert_colbertv2_store(
            spark,
            path,
            spark.createDataFrame(
                [(5, "a"), (5, "b")], "doc_id long, text string"
            ),
        )


def test_foreign_build_side_table_refused(spark, sf_correct, tmp_path):
    docs = _docs(spark, sf_correct)
    path = str(tmp_path / "cv2")
    other = str(tmp_path / "cv2b")
    build_colbertv2_store(docs.filter(F.col("doc_id") < 150), path, n_centroids=8)
    build_colbertv2_store(docs.filter(F.col("doc_id") < 80), other, n_centroids=4)
    upsert_colbertv2_store(
        spark,
        other,
        spark.createDataFrame([(9000, "xx yy")], "doc_id long, text string"),
    )
    # a delta encoded under ANOTHER codebook must be refused, not decoded
    shutil.copytree(other + ".delta", path + ".delta")
    with pytest.raises(ValueError, match="different"):
        load_live_colbertv2(spark, path)


def test_streaming_incremental_cv2_index(spark, sf_correct, tmp_path):
    """Drained batches land in the delta (base untouched), live serving ≡
    the composed corpus, NULL/empty-text rows dropped, and a full replay
    from a fresh checkpoint leaves byte-identical delta state."""
    from photo_vector_search_spark.streaming.incremental import (
        incremental_cv2_index,
    )

    docs = _docs(spark, sf_correct)
    path = str(tmp_path / "store")
    build_colbertv2_store(docs.filter(F.col("doc_id") < 400), path, n_centroids=16)
    base_files = set(os.listdir(path))

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)).coalesce(
        1
    ).write.parquet(f"{inp}/b1")
    extra = docs.filter((F.col("doc_id") >= 450) & (F.col("doc_id") < 500))
    extra.unionByName(
        spark.createDataFrame(
            [(99999, None), (88888, "")], "doc_id long, text string"
        )
    ).coalesce(1).write.parquet(f"{inp}/b2")

    q = incremental_cv2_index(spark, inp + "/*", path, str(tmp_path / "c1"))
    q.awaitTermination()
    live, _quant, _meta = load_live_colbertv2(spark, path)
    assert live.count() == 500  # 400 base + 100 streamed; NULL/empty dropped
    assert set(os.listdir(path)) == base_files  # base untouched

    got = _rows(live_colbertv2_search(spark, path, QUERY, k=5))
    want = _rows(
        _composed_topk(spark, path, docs.filter(F.col("doc_id") < 500), k=5)
    )
    assert got == want

    def _delta_state():
        return sorted(
            (r["doc_id"], tuple(r["tok_cids"]), tuple(map(tuple, r["tok_codes"])))
            for r in spark.read.parquet(path + ".delta").collect()
        )

    before = _delta_state()
    q2 = incremental_cv2_index(spark, inp + "/*", path, str(tmp_path / "c2"))
    q2.awaitTermination()
    assert _delta_state() == before
