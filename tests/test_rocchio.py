"""Rocchio dense pseudo-relevance feedback (`operators/knn.rocchio_*`):
DuckDB/NumPy replay of the whole loop, beta=0 identity with plain knn,
feedback-pull semantics on the labeled fixture, negative-set handling,
and guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.knn import (
    knn_topk,
    rocchio_expand,
    rocchio_topk,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import run_oracle

FB_K, ALPHA, BETA = 8, 1.0, 0.75


def _replay_expand(sf_dir: str, q: np.ndarray) -> np.ndarray:
    """Independent DuckDB+NumPy replay: feedback top-k via the DuckDB knn
    twin, centroid + mixture in NumPy."""
    qv = ", ".join(repr(float(v)) for v in q)
    fb = run_oracle(
        f"""
        WITH scored AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 1.0 - list_cosine_similarity(embedding::DOUBLE[], [{qv}]) AS d
          FROM embeddings
        )
        SELECT vec_id, v FROM scored ORDER BY d ASC, vec_id ASC LIMIT {FB_K}
        """,
        sf_dir,
    )
    centroid = np.mean([np.asarray(v) for v in fb.v], axis=0)
    return ALPHA * q + BETA * centroid


def test_expand_matches_duckdb_numpy_replay(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )
    got = np.asarray(
        rocchio_expand(emb, q, fb_k=FB_K, alpha=ALPHA, beta=BETA)
    )
    want = _replay_expand(sf_correct, q)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # and the full search equals knn over the replayed vector
    top = rocchio_topk(emb, q, k=5, fb_k=FB_K, alpha=ALPHA, beta=BETA).toPandas()
    want_top = knn_topk(emb, [float(v) for v in want], k=5).toPandas()
    assert top.values.tolist() == want_top.values.tolist()


def test_beta_zero_is_plain_knn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    got = rocchio_topk(emb, q, k=5, fb_k=5, alpha=2.0, beta=0.0).toPandas()
    want = knn_topk(emb, q, k=5).toPandas()
    # cosine is scale-invariant, so alpha alone changes nothing
    assert got.values.tolist() == want.values.tolist()


def test_feedback_pulls_toward_neighbor_mass(spark, sf_dir):
    """The expanded query must sit closer to its feedback centroid than
    the raw query did (the whole point of the pull)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = np.asarray(
        emb.filter(F.col("vec_id") == 3).first()["embedding"], dtype=np.float64
    )
    fb_ids = [r["vec_id"] for r in knn_topk(emb, q, k=FB_K).collect()]
    fb = np.vstack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.filter(F.col("vec_id").isin(fb_ids)).collect()
        ]
    )
    centroid = fb.mean(axis=0)
    q2 = np.asarray(rocchio_expand(emb, q, fb_k=FB_K))

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(q2, centroid) > cos(q, centroid)


def test_negative_set_pushes_away(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = np.asarray(
        emb.filter(F.col("vec_id") == 11).first()["embedding"],
        dtype=np.float64,
    )
    q2 = np.asarray(
        rocchio_expand(emb, q, fb_k=5, gamma=0.25, neg_k=5)
    )
    # replay: farthest 5 by cosine distance
    scored = [
        (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        for r in emb.collect()
    ]
    def d(v):
        return 1.0 - float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
    worst = sorted(scored, key=lambda t: (-d(t[1]), t[0]))[:5]
    neg_centroid = np.mean([v for _, v in worst], axis=0)
    fb_ids = [r["vec_id"] for r in knn_topk(emb, q, k=5).collect()]
    fb_centroid = np.mean(
        [v for i, v in scored if i in set(fb_ids)], axis=0
    )
    want = q + 0.75 * fb_centroid - 0.25 * neg_centroid
    np.testing.assert_allclose(q2, want, rtol=1e-9)


def test_guards(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.first()["embedding"]
    with pytest.raises(ValueError, match="fb_k"):
        rocchio_expand(emb, q, fb_k=0)
    with pytest.raises(ValueError, match="neg_k"):
        rocchio_expand(emb, q, neg_k=-1)
    with pytest.raises(ValueError, match="negative set"):
        rocchio_expand(emb, q, gamma=0.5, neg_k=0)
