"""Persisted IVF,SQ8 store: build/load roundtrip identity, realized
Parquet partition pruning (runtime scan metrics, not plan text), the
torn-pair crash-consistency refusal, the codes-only rerank guard, and
rerank-equals-exact over the persisted store."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.knn import knn_topk
from photo_vector_search_spark.operators.sq import (
    build_ivf_sq8_store,
    ivf_sq8_store_topk,
    ivf_sq8_topk,
    load_ivf_sq8_store,
    sq8_topk,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.test_scale_design import _scan_metrics


def _query(emb, vec_id=3):
    return [float(v) for v in emb.filter(F.col("vec_id") == vec_id).first()["embedding"]]


def test_build_load_roundtrip_and_full_probe_identity(spark, sf_correct, tmp_path):
    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    cents, model = build_ivf_sq8_store(emb, path, n_clusters=8)

    store, loaded_cents, loaded_model = load_ivf_sq8_store(spark, path)
    assert loaded_cents.shape == cents.shape and (loaded_cents == cents).all()
    assert (loaded_model.vmin == model.vmin).all()
    assert (loaded_model.vmax == model.vmax).all()
    # codes-only at rest: the floats deliberately never land in the store
    assert "embedding" not in store.columns
    assert store.count() == emb.count()

    # probing EVERY cluster over the persisted store degenerates to the
    # flat SQ8 scan bit-for-bit (the composition identity, now through disk)
    qv = _query(emb)
    full = ivf_sq8_store_topk(spark, path, qv, k=5, nprobe=8).collect()
    flat = sq8_topk(store.drop("cluster_id", "build_id"), model, qv, k=5).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in flat]


def test_store_prunes_partitions_at_file_level(spark, sf_correct, tmp_path):
    """The store's whole point: a probe filter must scan ONLY the probed
    clusters' directories — asserted on runtime FileSourceScan metrics."""
    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_store(emb, path, n_clusters=8)
    store, cents, model = load_ivf_sq8_store(spark, path)

    n_parts = store.select("cluster_id").distinct().count()
    probe = [0, 3]
    probed = store.filter(F.col("cluster_id").isin(probe))
    metrics = _scan_metrics(probed)
    assert metrics["numPartitions"] == len(probe), metrics
    full = _scan_metrics(store)
    assert metrics["numFiles"] < full["numFiles"], (metrics, full)
    assert n_parts > len(probe)  # pruning actually skipped something

    # and the serving path at nprobe=1 reads exactly one partition's rows
    qv = _query(emb)
    one = ivf_sq8_store_topk(spark, path, qv, k=5, nprobe=1)
    assert 0 < one.count() <= 5


def test_torn_pair_refused_and_empty_store_message(spark, sf_correct, tmp_path):
    """Store and sidecar are two snapshot swaps; a crash between them pairs
    new assignments with old centroids/ranges. load must refuse the torn
    pair via the build_id stamp instead of silently decoding garbage."""
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_store(emb, path, n_clusters=4)

    # simulate the crash: sidecar re-swapped from a DIFFERENT build
    side = spark.read.parquet(path + ".ivfsqmeta").withColumn(
        "build_id", F.lit("deadbeefdeadbeef")
    )
    snapshot_overwrite(side, path + ".ivfsqmeta")
    with pytest.raises(ValueError, match="crashed between"):
        load_ivf_sq8_store(spark, path)

    # a store that was never built reports that, not a torn pair
    with pytest.raises(ValueError, match="build_ivf_sq8_store first"):
        load_ivf_sq8_store(spark, str(tmp_path / "never_built"))


def test_codes_only_rerank_guard_and_rerank_equals_exact(spark, sf_correct, tmp_path):
    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_store(emb, path, n_clusters=8)
    qv = _query(emb)

    # the store holds codes only: rerank without a float source is a clear
    # error at call time, not an AnalysisException mid-plan
    with pytest.raises(ValueError, match="rerank_source"):
        ivf_sq8_store_topk(spark, path, qv, k=5, rerank=50)

    # full probe + exact rerank from the source frame == exact knn
    got = ivf_sq8_store_topk(
        spark, path, qv, k=5, nprobe=8, rerank=50, rerank_source=emb
    ).collect()
    want = knn_topk(emb, qv, k=5).collect()
    assert [(r["vec_id"], r["label"], r["dist"]) for r in got] == [
        (r["vec_id"], r["label"], r["dist"]) for r in want
    ]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_batch_equals_per_query_loop(spark, sf_correct, tmp_path):
    """The batched kernels are pure plumbing: full-probe sq8_batch_topk ≡ a
    Python loop of sq8_topk, and ivf_sq8_batch_topk ≡ a loop of
    ivf_sq8_topk with the same nprobe — per query, value for value."""
    from photo_vector_search_spark.operators.sq import (
        ivf_sq8_batch_topk,
        sq8_batch_topk,
    )

    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_store(emb, path, n_clusters=8)
    store, cents, model = load_ivf_sq8_store(spark, path)
    qids = [0, 3, 7, 11]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    # flat parity: every cluster allowed == the flat scan per query
    batch = sq8_batch_topk(store, model, queries, k=5)
    got = {
        q: [(r["vec_id"], r["label"], r["dist"], r["rank"]) for r in rows]
        for q, rows in _by_query(batch)
    }
    for q in qids:
        loop = sq8_topk(
            store.drop("cluster_id", "build_id"), model, _query(emb, q), k=5
        ).collect()
        assert got[q] == [
            (r["vec_id"], r["label"], r["dist"], r["rank"]) for r in loop
        ], q

    # IVF parity at nprobe=2: same probes, same mask, same values
    ivf_batch = ivf_sq8_batch_topk(spark, path, queries, k=5, nprobe=2)
    got = {
        q: [(r["vec_id"], r["dist"], r["rank"]) for r in rows]
        for q, rows in _by_query(ivf_batch)
    }
    for q in qids:
        loop = ivf_sq8_topk(store, cents, model, _query(emb, q), k=5, nprobe=2).collect()
        assert got[q] == [(r["vec_id"], r["dist"], r["rank"]) for r in loop], q

    # union-pruned scan: the batch reads at most the union of probe sets
    assert ivf_batch.count() <= len(qids) * 5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="nprobe"):
        ivf_sq8_batch_topk(spark, path, queries, k=5, nprobe=0)
    with _pytest.raises(ValueError, match="split the query set"):
        ivf_sq8_batch_topk(spark, path, queries, k=5, nprobe=2, max_queries=2)
    dup_q = queries.limit(1).unionByName(queries.limit(1))
    with _pytest.raises(ValueError, match="duplicate query_id"):
        ivf_sq8_batch_topk(spark, path, dup_q, k=5, nprobe=2)


def _by_query(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return [
        (q, sorted(v, key=lambda r: r["rank"])) for q, v in out.items()
    ]


def test_store_matches_in_memory_composition(spark, sf_correct, tmp_path):
    """The persisted path is the SAME operator as the in-memory composition:
    searching the loaded store equals ivf_sq8_topk over a frame encoded with
    the loaded model/centroids (the store adds durability, not semantics)."""
    from photo_vector_search_spark.operators.ann import assign_clusters
    from photo_vector_search_spark.operators.sq import encode_sq8

    emb = load_table(spark, sf_correct, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_store(emb, path, n_clusters=8)
    store, cents, model = load_ivf_sq8_store(spark, path)
    qv = _query(emb, vec_id=7)

    mem = encode_sq8(assign_clusters(emb, cents), model).select(
        "vec_id", "label", "cluster_id", "sq8"
    )
    for nprobe in (2, 8):
        got = ivf_sq8_topk(store, cents, model, qv, k=5, nprobe=nprobe).collect()
        want = ivf_sq8_topk(mem, cents, model, qv, k=5, nprobe=nprobe).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
