"""Persisted MaxSim token store (`operators/late_interaction`,
build_maxsim_store / load_maxsim_store / maxsim_store_search): roundtrip
identity, torn-pair refusal under the shared content-signature contract,
store-served ≡ in-memory search, and the no-re-embed serving property
(serving reads the store's parquet, never the documents table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.late_interaction import (
    build_maxsim_store,
    doc_token_embeddings,
    load_maxsim_store,
    maxsim_search,
    maxsim_store_search,
)
from photo_vector_search_spark.sources.tables import load_table

QUERY = "quick brown fox"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)


def test_roundtrip_identity_and_meta(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "colbert_store")
    build_id = build_maxsim_store(docs, path, max_tokens=12, dim=32)
    toks, meta = load_maxsim_store(spark, path)
    assert meta["build_id"] == build_id
    assert (meta["max_tokens"], meta["dim"], meta["id_col"]) == (12, 32, "doc_id")
    want = {
        r["doc_id"]: [list(v) for v in r["tok_embs"]]
        for r in doc_token_embeddings(docs, max_tokens=12, dim=32).collect()
    }
    got = {
        r["doc_id"]: [list(v) for v in r["tok_embs"]] for r in toks.collect()
    }
    assert got == want  # byte-identical matrices, token order preserved
    assert meta["n_docs"] == len(want)


def test_store_served_equals_in_memory_search(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "colbert_store")
    build_maxsim_store(docs, path)
    for pf in (None, 40):
        served = maxsim_store_search(
            spark, path, QUERY, k=5, prefilter_n=pf
        ).collect()
        direct = maxsim_search(docs, QUERY, k=5, prefilter_n=pf).collect()
        assert [tuple(r) for r in served] == [tuple(r) for r in direct]


def test_torn_pair_is_refused(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "colbert_store")
    build_maxsim_store(docs, path)
    # simulate a crash between the two snapshot swaps: the main store is
    # rewritten (fresh part files -> new content signature) but the sidecar
    # still records the previous build
    toks = doc_token_embeddings(docs.limit(10))
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    snapshot_overwrite(toks, path)
    with pytest.raises(ValueError, match="torn"):
        load_maxsim_store(spark, path)
    # and a content-preserving rename inside the dir also trips it
    path2 = str(tmp_path / "colbert_store2")
    build_maxsim_store(docs.limit(20), path2)
    part = next(
        f for f in os.listdir(path2) if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(path2, part), os.path.join(path2, "renamed-" + part)
    )
    with pytest.raises(ValueError, match="torn"):
        load_maxsim_store(spark, path2)


def test_serving_never_rereads_documents(spark, sf_dir, tmp_path):
    """The store's point: serving must not re-embed the corpus. The served
    plan's file scans read ONLY store paths — the documents parquet appears
    nowhere in the executed plan."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "colbert_store")
    build_maxsim_store(docs, path)
    out = maxsim_store_search(spark, path, QUERY, k=5, prefilter_n=40)
    files = out.inputFiles()
    assert files, "plan reads no files?"
    assert all("colbert_store" in f for f in files), files
    assert not any("documents" in f for f in files), files


def test_sidecar_shape_guard(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "colbert_store")
    build_maxsim_store(docs, path)
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    meta = spark.read.parquet(path + ".meta")
    snapshot_overwrite(meta.unionByName(meta), path + ".meta")
    with pytest.raises(ValueError, match="exactly 1"):
        load_maxsim_store(spark, path)
