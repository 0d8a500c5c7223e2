"""Chunk-embedding pooling (`operators/embeddings.pool_embeddings`):
DuckDB twin of the grouped component means + renorm, NumPy twins for
weighted/max pooling, NULL/zero-norm discipline, the chunk→embed→pool
composition, and guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.embeddings import pool_embeddings
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches


def test_mean_pool_matches_duckdb_twin(spark, sf_correct):
    """Pool the embeddings table by label (each label's rows standing in
    for one document's chunks): component means + L2 renorm, spot
    components + count pinned against DuckDB."""
    emb = load_table(spark, sf_correct, "embeddings")
    pooled = pool_embeddings(emb, by="label", vec_col="embedding")
    got = pooled.select(
        "label",
        "n_chunks",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 33), 6).alias("e32"),
        F.round(F.element_at("embedding", 64), 6).alias("e63"),
    )
    oracle = """
    WITH e AS (
      SELECT label, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    comps AS (
      SELECT label, r.range AS i, avg(v[r.range]) AS m
      FROM e, range(1, 65) r GROUP BY 1, 2
    ),
    vecs AS (
      SELECT label, list(m ORDER BY i) AS mv FROM comps GROUP BY label
    ),
    n AS (SELECT label, count(*) AS n_chunks FROM e GROUP BY label),
    nrm AS (
      SELECT label, sqrt(list_sum(list_transform(mv, x -> x*x))) AS s, mv
      FROM vecs
    )
    SELECT n.label, n.n_chunks,
           round(mv[1] / s, 6) AS e0,
           round(mv[33] / s, 6) AS e32,
           round(mv[64] / s, 6) AS e63
    FROM nrm JOIN n USING (label)
    """
    assert_matches(got, oracle, sf_correct)


def test_weighted_and_max_pool_match_numpy(spark):
    rng = np.random.default_rng(3)
    rows = []
    for d in range(4):
        for c in range(5):
            rows.append(
                (d, [float(x) for x in rng.normal(size=8)], float(c + 1))
            )
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>, w double")

    got_w = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in pool_embeddings(df, weight_col="w").collect()
    }
    got_m = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in pool_embeddings(df, method="max").collect()
    }
    for d in range(4):
        x = np.vstack([v for dd, v, _ in rows if dd == d])
        w = np.asarray([wt for dd, _, wt in rows if dd == d])
        vw = np.average(x, axis=0, weights=w)
        vw /= np.linalg.norm(vw)
        vm = x.max(axis=0)
        vm /= np.linalg.norm(vm)
        np.testing.assert_allclose(got_w[d], vw, rtol=1e-12)
        np.testing.assert_allclose(got_m[d], vm, rtol=1e-12)


def test_null_and_zero_norm_discipline(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (1, [-1.0, 0.0]),  # mean = zero vector → NULL under renorm
            (2, None),         # all-NULL group → NULL, n_chunks 0
            (3, [0.0, 2.0]),
            (3, None),         # NULL chunks don't count
        ],
        "doc_id long, embedding array<double>",
    )
    got = {r["doc_id"]: r for r in pool_embeddings(df).collect()}
    assert got[1]["embedding"] is None and got[1]["n_chunks"] == 2
    assert got[2]["embedding"] is None and got[2]["n_chunks"] == 0
    assert got[3]["n_chunks"] == 1
    np.testing.assert_allclose(got[3]["embedding"], [0.0, 1.0])
    # without renorm the zero vector comes through as-is
    raw = {
        r["doc_id"]: r
        for r in pool_embeddings(df, renorm=False).collect()
    }
    np.testing.assert_allclose(raw[1]["embedding"], [0.0, 0.0])


def test_chunk_embed_pool_composition(spark, sf_dir):
    """The real pipeline: chunk documents → stub-embed each chunk →
    pool back to documents. One unit-norm vector per chunked doc; chunk
    counts agree with the chunker."""
    from photo_vector_search_spark.pipelines.embed import with_stub_embedding
    from photo_vector_search_spark.plans.text_queries import chunk_tokens

    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = chunk_tokens(docs, size=32, stride=24).select(
        "doc_id", F.concat_ws(" ", "chunk_toks").alias("text")
    )
    chunk_counts = {
        r["doc_id"]: r["n"]
        for r in chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    embedded = with_stub_embedding(chunks, "text")
    pooled = pool_embeddings(embedded, by="doc_id").collect()
    assert {r["doc_id"] for r in pooled} == set(chunk_counts)
    for r in pooled:
        assert r["n_chunks"] == chunk_counts[r["doc_id"]]
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-9


def test_guards(spark):
    df = spark.createDataFrame(
        [(1, [1.0], 0.0)], "doc_id long, embedding array<double>, w double"
    )
    with pytest.raises(ValueError, match="method"):
        pool_embeddings(df, method="median")
    with pytest.raises(ValueError, match="weight_col only"):
        pool_embeddings(df, method="max", weight_col="w")
    with pytest.raises(Exception, match="positive sum"):
        pool_embeddings(df, weight_col="w").collect()


def test_declared_pool_embeddings_matches_oracle(spark, sf_dir):
    import __spark_entry__ as m

    assert_matches(
        m.queries()["pool_embeddings"](spark, sf_dir),
        m.oracle_sql()["pool_embeddings"],
        sf_dir,
    )


def test_order_pin_makes_pooling_bit_deterministic(spark, sf_dir):
    """order_col pins the float summation order, so the pooled vectors are
    BIT-identical under any repartition (the declared query's shape — the
    pinned-eigenvector-signs discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = (
        pool_embeddings(emb, by="label", order_col="vec_id")
        .toPandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    b = (
        pool_embeddings(emb.repartition(13), by="label", order_col="vec_id")
        .toPandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for x, y in zip(a.embedding, b.embedding):
        assert np.array_equal(np.asarray(x), np.asarray(y))
