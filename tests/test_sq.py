"""SQ8 scalar quantization: reconstruction error bound, endpoint exactness,
constant-component handling, NULL discipline, near-exact retrieval and the
rerank-equals-exact ladder, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.knn import knn_topk
from photo_vector_search_spark.operators.sq import (
    SQ8Model,
    encode_sq8,
    fit_sq8,
    sq8_topk,
)
from photo_vector_search_spark.sources.tables import load_table


def _fit_and_encode(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    model = fit_sq8(emb)
    return emb, model, encode_sq8(emb, model)


def test_roundtrip_error_bounded(spark, sf_correct):
    emb, model, coded = _fit_and_encode(spark, sf_correct)
    rows = coded.select("embedding", "sq8").collect()
    step = model.scale
    for r in rows[:200]:
        x = np.asarray(r["embedding"], dtype=np.float64)
        c = np.asarray(r["sq8"], dtype=np.float64)
        xhat = model.vmin + c * step
        # round-to-nearest: error <= step/2 (+ float slack)
        assert np.all(np.abs(xhat - x) <= step / 2 + 1e-12)
    # codes are genuine bytes
    flat = coded.select(F.explode("sq8").alias("c")).agg(
        F.min("c"), F.max("c")
    ).first()
    assert flat[0] >= 0 and flat[1] <= 255


def test_endpoints_and_constant_component_exact(spark):
    # column 0 constant, column 1 spans [-2, 6]: endpoints must decode exactly
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "label": [0, 0, 0],
            "embedding": [[5.0, -2.0], [5.0, 6.0], [5.0, 2.0]],
        }
    )
    df = spark.createDataFrame(pdf)
    model = fit_sq8(df)
    np.testing.assert_allclose(model.vmin, [5.0, -2.0])
    np.testing.assert_allclose(model.vmax, [5.0, 6.0])
    got = {
        r["vec_id"]: np.asarray(r["sq8"]) for r in encode_sq8(df, model).collect()
    }
    assert got[0][0] == 0 and got[1][0] == 0  # constant comp -> code 0
    assert got[0][1] == 0 and got[1][1] == 255  # range endpoints -> 0 / 255
    # decode endpoint exactness
    assert model.vmin[1] + got[0][1] * model.scale[1] == -2.0
    assert model.vmin[1] + got[1][1] * model.scale[1] == 6.0
    assert model.vmin[0] + got[2][0] * model.scale[0] == 5.0  # constant exact


def test_null_vectors_skipped(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings").withColumn(
        "embedding",
        F.when(F.col("vec_id") % 9 == 0, F.lit(None)).otherwise(F.col("embedding")),
    )
    model = fit_sq8(emb)
    coded = encode_sq8(emb, model)
    assert (
        coded.filter(F.col("embedding").isNull() & F.col("sq8").isNotNull()).count()
        == 0
    )
    top = sq8_topk(coded, model, [1.0] * 64, k=5).collect()
    null_ids = {r["vec_id"] for r in emb.filter(F.col("embedding").isNull()).collect()}
    assert not null_ids & {r["vec_id"] for r in top}


def test_sq8_search_near_exact_and_rerank_exact(spark, sf_correct):
    emb, model, coded = _fit_and_encode(spark, sf_correct)
    qv = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    qv = [float(v) for v in qv]
    exact = knn_topk(emb, qv, k=5).collect()
    # coarse SQ8 ranking: 8-bit decode barely moves 64-dim cosine ranks
    coarse = sq8_topk(coded, model, qv, k=5).collect()
    overlap = {r["vec_id"] for r in coarse} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 4, (sorted(r["vec_id"] for r in coarse),
                               sorted(r["vec_id"] for r in exact))
    # rerank ladder: pool of 50 re-scored exactly == the exact top-5
    ladder = sq8_topk(coded, model, qv, k=5, rerank=50).collect()
    assert [
        (r["vec_id"], r["label"], r["dist"]) for r in ladder
    ] == [(r["vec_id"], r["label"], r["dist"]) for r in exact]


def test_partitioning_invariant(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    m1 = fit_sq8(emb.repartition(17))
    m2 = fit_sq8(emb.coalesce(1))
    np.testing.assert_allclose(m1.vmin, m2.vmin, atol=0)
    np.testing.assert_allclose(m1.vmax, m2.vmax, atol=0)
    coded = encode_sq8(emb, m1)
    a = sq8_topk(coded.repartition(13), m1, [1.0] * 64, k=5).collect()
    b = sq8_topk(coded.coalesce(1), m1, [1.0] * 64, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_validation(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    model = fit_sq8(emb)
    coded = encode_sq8(emb, model)
    with pytest.raises(ValueError, match="k must be"):
        sq8_topk(coded, model, [1.0] * 64, k=0)
    with pytest.raises(ValueError, match="rerank pool"):
        sq8_topk(coded, model, [1.0] * 64, k=5, rerank=3)
    with pytest.raises(ValueError, match="positive norm"):
        sq8_topk(coded, model, [0.0] * 64, k=5)
    with pytest.raises(ValueError, match="non-NULL"):
        fit_sq8(emb.withColumn("embedding", F.lit(None).cast("array<double>")))


def test_persisted_store_roundtrip_and_rerank(spark, sf_correct, tmp_path):
    from photo_vector_search_spark.operators.sq import (
        build_sq8_store,
        load_sq8_store,
        sq8_store_topk,
    )

    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "sq8_store")
    model = build_sq8_store(emb, path)

    codes, loaded = load_sq8_store(spark, path)
    np.testing.assert_allclose(loaded.vmin, model.vmin, atol=0)
    np.testing.assert_allclose(loaded.vmax, model.vmax, atol=0)
    assert "embedding" not in codes.columns  # codes-only at rest
    assert codes.count() == emb.count()

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    # store search == in-memory search on the same model
    mem = sq8_topk(encode_sq8(emb, model).select("vec_id", "label", "sq8"),
                   model, qv, k=5).collect()
    st = sq8_store_topk(spark, path, qv, k=5).collect()
    assert [tuple(r) for r in st] == [tuple(r) for r in mem]

    # rerank from the SOURCE corpus reproduces exact knn
    ladder = sq8_store_topk(
        spark, path, qv, k=5, rerank=50, rerank_source=emb
    ).collect()
    exact = knn_topk(emb, qv, k=5).collect()
    assert [(r["vec_id"], r["dist"]) for r in ladder] == [
        (r["vec_id"], r["dist"]) for r in exact
    ]

    # rerank without a source is a usage error (the store has no floats)
    with pytest.raises(ValueError, match="rerank_source"):
        sq8_store_topk(spark, path, qv, k=5, rerank=50)


def test_persisted_store_torn_pair_refused(spark, sf_correct, tmp_path):
    from photo_vector_search_spark.operators.sq import (
        build_sq8_store,
        load_sq8_store,
    )

    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "sq8_torn")
    build_sq8_store(emb, path)
    # simulate a rebuild that crashed between the two snapshot swaps:
    # rebuild the SIDECAR from a different fit (shifted range) only
    shifted = emb.withColumn(
        "embedding",
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 2.0),
    )
    other = str(tmp_path / "sq8_other")
    build_sq8_store(shifted, other)
    import shutil

    shutil.rmtree(path + ".sqmeta")
    shutil.copytree(other + ".sqmeta", path + ".sqmeta")
    with pytest.raises(ValueError, match="crashed between"):
        load_sq8_store(spark, path)


def test_ivf_sq8_full_probe_equals_flat_and_prunes(spark, sf_correct):
    from photo_vector_search_spark.operators.ann import (
        assign_clusters,
        train_centroids,
    )
    from photo_vector_search_spark.operators.sq import ivf_sq8_topk
    from photo_vector_search_spark.sources.synthetic import mog_embeddings

    emb = load_table(spark, sf_correct, "embeddings")
    cents = train_centroids(emb, n_clusters=8)
    model = fit_sq8(emb)
    coded = encode_sq8(assign_clusters(emb, cents), model).select(
        "vec_id", "label", "cluster_id", "sq8"
    )
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 3).first()["embedding"]]

    # probing EVERY cluster degenerates to the flat SQ8 scan exactly
    full = ivf_sq8_topk(coded, cents, model, qv, k=5, nprobe=8).collect()
    flat = sq8_topk(coded.drop("cluster_id"), model, qv, k=5).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in flat]

    # nprobe=1 scans only the query's own cluster (pruning is real)
    one = ivf_sq8_topk(coded, cents, model, qv, k=5, nprobe=1)
    probed_rows = one.count()
    assert 0 < probed_rows <= 5

    # clustered geometry (the regime IVF earns its keep): nprobe=2 of 8
    # reproduces the flat-SQ8 top-5 with the exact rerank on top
    mog = mog_embeddings(spark, n=800, n_components=8).withColumn(
        "label", F.lit(0)
    )
    mcents = train_centroids(mog, n_clusters=8)
    mmodel = fit_sq8(mog)
    mcoded = encode_sq8(assign_clusters(mog, mcents), mmodel).select(
        "vec_id", "label", "cluster_id", "sq8"
    )
    mq = [float(v) for v in mog.filter(F.col("vec_id") == 11).first()["embedding"]]
    got = ivf_sq8_topk(
        mcoded, mcents, mmodel, mq, k=5, nprobe=2, rerank=30, rerank_source=mog
    ).collect()
    exact = knn_topk(mog, mq, k=5).collect()
    hit = {r["vec_id"] for r in got} & {r["vec_id"] for r in exact}
    assert len(hit) >= 4, (sorted(r["vec_id"] for r in got),
                           sorted(r["vec_id"] for r in exact))

    with pytest.raises(ValueError, match="nprobe"):
        ivf_sq8_topk(coded, cents, model, qv, k=5, nprobe=0)

    # codes-only frame + rerank but no rerank_source: a clear ValueError at
    # plan time, not a missing-column AnalysisException at execution
    with pytest.raises(ValueError, match="rerank_source"):
        ivf_sq8_topk(coded, cents, model, qv, k=5, nprobe=2, rerank=20)
    # ... but a frame that still carries the floats reranks from itself
    with_floats = encode_sq8(assign_clusters(emb, cents), model)
    self_rr = ivf_sq8_topk(
        with_floats, cents, model, qv, k=5, nprobe=8, rerank=30
    ).collect()
    assert len(self_rr) == 5
