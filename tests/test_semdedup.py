"""SemDeDup semantic dedup: value parity of the deterministic rung vs an
independent NumPy reference (seed centroids → rounded argmax assignment →
upper-triangular greedy drop), production-rung behavior on planted
near-duplicates, and invariance/guard contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.semdedup import (
    drop_greedy,
    seed_centroids,
    semdedup,
    semdedup_deterministic,
    within_cluster_pairs,
)


def _mog(n=200, dim=16, k=5, seed=3, dup_every=11):
    """Mixture-of-Gaussians vectors with planted near-duplicates: every
    ``dup_every``-th vector is a tiny perturbation of its predecessor."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 4
    x = np.vstack(
        [centers[i % k] + rng.randn(dim) * 0.5 for i in range(n)]
    )
    for i in range(1, n):
        if i % dup_every == 0:
            x[i] = x[i - 1] + rng.randn(dim) * 1e-3
    return x


def _py_semdedup(x, k, tau, round_to=6):
    """Independent serial reference of the deterministic rung."""

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(np.dot(a, b) / (na * nb))

    cents = x[:k]
    assign = []
    for i in range(len(x)):
        sims = [round(cos(x[i], c), round_to) for c in cents]
        best = max(range(k), key=lambda j: (sims[j], -j))
        assign.append(best)
    kept = []
    for i in range(len(x)):
        dup = any(
            assign[j] == assign[i]
            and round(cos(x[i], x[j]), round_to) >= tau
            for j in range(i)
        )
        kept.append(not dup)
    return assign, kept


def _df(spark, x):
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_deterministic_rung_matches_numpy_reference(spark):
    x = _mog()
    emb = _df(spark, x)
    out = semdedup_deterministic(emb, k=5, tau=0.999)
    got = {
        r["vec_id"]: (r["cluster_id"], r["kept"]) for r in out.collect()
    }
    assign, kept = _py_semdedup(x, k=5, tau=0.999)
    assert len(got) == len(x)
    for i in range(len(x)):
        # reference centroid index j maps to centroid id = vec_id j (seeds
        # are the k lowest ids and ids here are dense 0..n)
        assert got[i] == (assign[i], kept[i]), i
    # the planted near-dups actually drop: every dup_every-th vector is a
    # 1e-3 perturbation of its predecessor (same cluster, cos ≈ 1)
    dropped = [i for i in range(len(x)) if not kept[i]]
    assert len(dropped) >= len(x) // 11 - 2 and all(
        not got[i][1] for i in dropped
    )


def test_partitioning_invariance(spark):
    x = _mog(n=120)
    emb = _df(spark, x)
    a = {
        r["vec_id"]: (r["cluster_id"], r["kept"])
        for r in semdedup_deterministic(emb.repartition(13), 4, 0.999).collect()
    }
    b = {
        r["vec_id"]: (r["cluster_id"], r["kept"])
        for r in semdedup_deterministic(emb.coalesce(1), 4, 0.999).collect()
    }
    assert a == b and len(a) == 120


def test_greedy_rule_chain_semantics(spark):
    """a~b, b~c, a!~c (a<b<c): b drops for a, c drops for b EVEN THOUGH b
    itself dropped — the paper's max_{j<i} test, not connected-components
    canonicalization."""
    pairs = spark.createDataFrame(
        [(0, 0, 1, 0.95), (0, 1, 2, 0.95)],
        "cluster_id int, vec_a long, vec_b long, sim double",
    )
    emb = spark.createDataFrame(
        [(0, [1.0]), (1, [1.0]), (2, [1.0])], "vec_id long, embedding array<double>"
    )
    kept = sorted(r["vec_id"] for r in drop_greedy(emb, pairs).collect())
    assert kept == [0]


def test_production_rung_drops_planted_dups(spark):
    x = _mog(n=150, dup_every=10)
    emb = _df(spark, x)
    survivors = semdedup(emb, tau=0.999, n_clusters=5, n_assign=2)
    ids = {r["vec_id"] for r in survivors.collect()}
    # every planted duplicate pair loses exactly its higher id (pairs are
    # near-identical, so blocking cannot split them across all assigned
    # clusters with n_assign=2 — they share nearest centroids)
    planted = [i for i in range(1, 150) if i % 10 == 0]
    assert all(i not in ids for i in planted)
    assert all(i - 1 in ids or (i - 1) % 10 == 0 for i in planted)
    # nothing else vanishes en masse: survivor count is N - |planted| ± slack
    # (a few organic near-dups may exist in the mixture)
    assert len(ids) >= 150 - len(planted) - 10


def test_seed_centroids_sparse_ids_and_guards(spark):
    emb = spark.createDataFrame(
        [(100, [1.0, 0.0]), (7, [0.0, 1.0]), (55, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = sorted(r["cid"] for r in seed_centroids(emb, 2).collect())
    assert cents == [7, 55]
    with pytest.raises(ValueError, match="positive"):
        seed_centroids(emb, 0)
    # tau above every sim → all kept, pairs empty
    out = semdedup_deterministic(emb, k=2, tau=1.1)
    assert all(r["kept"] for r in out.collect())
    assert (
        within_cluster_pairs(
            out.select("vec_id", "embedding", "cluster_id"), tau=1.1
        ).count()
        == 0
    )
