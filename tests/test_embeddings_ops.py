"""PCA whitening + matryoshka truncation: NumPy twin of the fit, identity
covariance after application, NULL discipline, partitioning invariance,
and built-in-only truncation semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.embeddings import (
    WhiteningModel,
    apply_whitening,
    fit_pca_whitening,
    truncate_renorm,
)
from photo_vector_search_spark.sources.tables import load_table


def _numpy_whitening(x: np.ndarray, dim=None, eps=1e-6):
    """Independent reference: same math, written against numpy directly."""
    n, d = x.shape
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / n
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    flips = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(d)])
    flips[flips == 0] = 1.0
    vecs = vecs * flips
    k = d if dim is None else dim
    return mean, vecs[:, :k] / np.sqrt(np.maximum(vals[:k], 0.0) + eps)


def _collect_matrix(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_fit_matches_numpy(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    x = _collect_matrix(emb)
    model = fit_pca_whitening(emb)
    mean_ref, w_ref = _numpy_whitening(x)
    np.testing.assert_allclose(model.mean, mean_ref, atol=1e-9)
    np.testing.assert_allclose(model.w, w_ref, atol=1e-7)
    assert np.all(np.diff(model.eigenvalues) <= 1e-12)  # descending spectrum


def test_whitened_covariance_is_identity(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    model = fit_pca_whitening(emb)
    out = apply_whitening(emb, model)
    y = np.vstack(
        [
            np.asarray(r["embedding_white"], dtype=np.float64)
            for r in out.select("embedding_white").collect()
        ]
    )
    cov = (y - y.mean(axis=0)).T @ (y - y.mean(axis=0)) / len(y)
    np.testing.assert_allclose(cov, np.eye(y.shape[1]), atol=1e-3)
    # schema: original columns preserved + the new array<double>
    assert out.columns == emb.columns + ["embedding_white"]


def test_dim_truncation_keeps_top_variance(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    model = fit_pca_whitening(emb, dim=8)
    assert model.w.shape == (64, 8)
    out = apply_whitening(emb, model)
    first = out.select("embedding_white").first()[0]
    assert len(first) == 8
    # the kept directions are the TOP of the spectrum: projecting onto them
    # explains more variance than any other 8 (eigenvalues are sorted)
    assert model.eigenvalues[7] >= model.eigenvalues[8]


def test_null_vectors_excluded_and_passed_through(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings").withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(F.col("embedding")),
    )
    dense = emb.filter(F.col("embedding").isNotNull())
    model = fit_pca_whitening(emb)
    model_dense = fit_pca_whitening(dense)
    np.testing.assert_allclose(model.w, model_dense.w, atol=1e-9)
    out = apply_whitening(emb, model)
    assert out.filter(
        F.col("embedding").isNull() & F.col("embedding_white").isNotNull()
    ).count() == 0
    assert out.filter(F.col("embedding_white").isNull()).count() == out.filter(
        F.col("embedding").isNull()
    ).count()


def test_partitioning_invariant(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    a = fit_pca_whitening(emb.repartition(17))
    b = fit_pca_whitening(emb.coalesce(1))
    np.testing.assert_allclose(a.w, b.w, atol=1e-7)
    np.testing.assert_allclose(a.mean, b.mean, atol=1e-10)


def test_truncate_renorm(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1],
                "embedding": [[3.0, 4.0, 99.0], [0.0, 0.0, 5.0]],
            }
        )
    )
    out = df.select(
        "vec_id", truncate_renorm("embedding", 2).alias("t")
    ).orderBy("vec_id").collect()
    np.testing.assert_allclose(out[0]["t"], [0.6, 0.8], atol=1e-12)
    assert out[1]["t"] is None  # zero-norm prefix -> NULL, not a blowup
    raw = df.select(
        truncate_renorm("embedding", 2, renorm=False).alias("t")
    ).first()["t"]
    np.testing.assert_allclose(raw, [3.0, 4.0], atol=0)
    with pytest.raises(ValueError, match="dim must be"):
        truncate_renorm("embedding", 0)


def test_fit_validation(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    with pytest.raises(ValueError, match="dim must be in"):
        fit_pca_whitening(emb, dim=65)
    with pytest.raises(ValueError, match="non-NULL"):
        fit_pca_whitening(
            emb.withColumn("embedding", F.lit(None).cast("array<double>"))
        )


def test_whitening_improves_or_preserves_shape_for_ann(spark, sf_correct):
    # downstream contract: whitened vectors are plain array<double> usable by
    # the knn family — cosine over them is finite and self-distance is 0
    from photo_vector_search_spark.functions.vector import cosine_distance

    emb = load_table(spark, sf_correct, "embeddings")
    model = fit_pca_whitening(emb, dim=16)
    out = apply_whitening(emb, model).select(
        "vec_id", F.col("embedding_white").alias("v")
    )
    d = out.select(cosine_distance(F.col("v"), F.col("v")).alias("d")).agg(
        F.max(F.abs(F.col("d")))
    ).first()[0]
    assert d == pytest.approx(0.0, abs=1e-9)
