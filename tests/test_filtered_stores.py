"""Filtered late-interaction serving (the P2 filter-before-distance
discipline extended to the token stores): keep_cols metadata rides the
store rows, a predicate applied BEFORE the prefilter restricts candidates
to matching docs, and the result equals serving a store built from the
pre-filtered corpus (maxsim; for the compressed store, the in-memory
composition over the same frozen quantizer). Upserts into keep_cols
stores carry the metadata; batches lacking it are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.late_interaction import (
    build_maxsim_store,
    load_maxsim_store,
    maxsim_store_search,
)
from photo_vector_search_spark.operators.maxsim_maintenance import (
    live_maxsim_search,
    upsert_maxsim_store,
)
from photo_vector_search_spark.operators.token_compression import (
    build_colbertv2_store,
    colbertv2_store_search,
    load_colbertv2_store,
)
from photo_vector_search_spark.sources.tables import load_table

QUERY = "the quick brown fox"


def _docs(spark, sf_correct):
    return load_table(spark, sf_correct, "documents").select(
        "doc_id", "text", "lang", "source"
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_maxsim_store_filtered_equals_filtered_corpus_store(
    spark, sf_correct, tmp_path
):
    docs = _docs(spark, sf_correct)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    lang = sorted(langs)[0]
    n_match = docs.filter(F.col("lang") == lang).count()
    assert 0 < n_match < docs.count()  # the filter must actually cut

    path = str(tmp_path / "ms")
    build_maxsim_store(docs, path, keep_cols=("lang", "source"))
    store, meta = load_maxsim_store(spark, path)
    assert {"lang", "source"} <= set(store.columns)
    assert meta["keep_cols"] == "lang,source"

    got = _rows(
        maxsim_store_search(
            spark, path, QUERY, k=5, prefilter_n=32,
            filter=F.col("lang") == lang,
        )
    )
    # ground truth: a store built from the PRE-FILTERED corpus — identical
    # embeddings, so filtered serving must reproduce it exactly
    ref_path = str(tmp_path / "ms_ref")
    build_maxsim_store(docs.filter(F.col("lang") == lang), ref_path)
    want = _rows(
        maxsim_store_search(spark, ref_path, QUERY, k=5, prefilter_n=32)
    )
    assert got == want and len(got) == 5
    # and every hit satisfies the predicate
    hit_ids = [r[0] for r in got]
    hit_langs = {
        r["lang"]
        for r in store.filter(F.col("doc_id").isin(hit_ids)).collect()
    }
    assert hit_langs == {lang}

    # a SQL-string predicate works identically (the filter= contract)
    got_sql = _rows(
        maxsim_store_search(
            spark, path, QUERY, k=5, prefilter_n=32,
            filter=f"lang = '{lang}'",
        )
    )
    assert got_sql == want


def test_maxsim_filtered_live_and_keep_cols_upsert(
    spark, sf_correct, tmp_path
):
    docs = _docs(spark, sf_correct)
    lang = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )[0]
    path = str(tmp_path / "ms")
    build_maxsim_store(
        docs.filter(F.col("doc_id") < 300), path, keep_cols=("lang",)
    )

    # upsert WITH the metadata column: lands in the delta, filterable live
    new = spark.createDataFrame(
        [(9000, "quick brown fox everywhere", lang)],
        "doc_id long, text string, lang string",
    )
    assert upsert_maxsim_store(spark, path, new) == 1
    got = _rows(
        live_maxsim_search(
            spark, path, QUERY, k=3, filter=F.col("lang") == lang
        )
    )
    assert got[0][0] == 9000  # three exact query-token matches wins
    other = _rows(
        live_maxsim_search(
            spark, path, QUERY, k=3, filter=F.col("lang") != lang
        )
    )
    assert 9000 not in [r[0] for r in other]

    # a batch LACKING the recorded metadata column is refused
    with pytest.raises(ValueError, match="keep_cols"):
        upsert_maxsim_store(
            spark,
            path,
            spark.createDataFrame(
                [(9001, "more text")], "doc_id long, text string"
            ),
        )


def test_cv2_store_filtered_serving(spark, sf_correct, tmp_path):
    docs = _docs(spark, sf_correct)
    lang = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )[0]
    path = str(tmp_path / "cv2")
    build_colbertv2_store(docs, path, n_centroids=16, keep_cols=("lang",))
    coded, quant, meta = load_colbertv2_store(spark, path)
    assert "lang" in coded.columns and meta["keep_cols"] == "lang"

    got = _rows(
        colbertv2_store_search(
            spark, path, QUERY, k=5, prefilter_n=32,
            filter=F.col("lang") == lang,
        )
    )
    # in-memory composition over the SAME frozen quantizer: filter the
    # coded frame first, then the identical prefilter + compressed rescore
    from photo_vector_search_spark.operators.token_compression import (
        maxsim_topk_compressed,
    )
    import numpy as np

    from photo_vector_search_spark.operators.late_interaction import (
        MAX_QUERY_TOKENS,
        _pooled_flat_candidate_ids,
        _query_token_vecs,
    )

    sub = coded.filter(F.col("lang") == lang)
    qvecs = np.asarray(
        _query_token_vecs(QUERY, MAX_QUERY_TOKENS, meta["dim"]),
        dtype=np.float64,
    )
    cand = _pooled_flat_candidate_ids(sub, qvecs.mean(axis=0), 32, "doc_id")
    want = _rows(
        maxsim_topk_compressed(
            sub.filter(F.col("doc_id").isin(cand)), quant, QUERY, k=5
        )
    )
    assert got == want and len(got) == 5
    hit_ids = [r[0] for r in got]
    hit_langs = {
        r["lang"]
        for r in coded.filter(F.col("doc_id").isin(hit_ids)).collect()
    }
    assert hit_langs == {lang}
