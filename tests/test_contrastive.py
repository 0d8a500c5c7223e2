"""Hard-negative mining: exactness vs a brute-force NumPy reference and a
DuckDB window twin in the single-cluster setting (blocking exact), recall
behavior under multi-probe blocking, determinism, and label contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.contrastive import (
    hard_negatives,
    positive_pairs,
)


def _mog(n=160, dim=12, n_labels=4, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_labels, dim) * 3
    labels = [i % n_labels for i in range(n)]
    x = np.vstack([centers[l] + rng.randn(dim) * 0.8 for l in labels])
    return x, labels


def _df(spark, x, labels):
    rows = [
        (i, [float(v) for v in x[i]], int(labels[i])) for i in range(len(x))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def _py_hard_negatives(x, labels, k, round_to=6):
    m = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    sims = np.round(m @ m.T, round_to)
    want = {}
    for i in range(len(x)):
        cand = [
            (-sims[i, j], j) for j in range(len(x)) if labels[j] != labels[i]
        ]
        cand.sort()
        want[i] = [(j, -s) for s, j in cand[:k]]
    return want


def test_single_cluster_matches_bruteforce_and_duckdb(spark):
    """n_clusters=1 puts every vector in one block → the kernel IS the exact
    computation; the NumPy reference and a DuckDB window twin must agree
    row-for-row (ids, order, rounded sims)."""
    x, labels = _mog()
    emb = _df(spark, x, labels)
    got_rows = hard_negatives(emb, k=4, n_clusters=1, n_assign=1).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["anchor_id"], r["rank"])):
        got.setdefault(r["anchor_id"], []).append((r["neg_id"], r["sim"]))
    want = _py_hard_negatives(x, labels, k=4)
    assert set(got) == set(want)
    for a in want:
        assert got[a] == [(j, pytest.approx(s, abs=2e-6)) for j, s in want[a]], a

    # DuckDB twin of the whole rule over a registered temp view
    import duckdb

    con = duckdb.connect()
    try:
        con.register(
            "emb",
            emb.toPandas().assign(
                embedding=lambda d: d["embedding"].map(list)
            ),
        )
        twin = con.execute(
            """
            WITH pairs AS (
              SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
                     a.label AS label, b.label AS neg_label,
                     round(list_cosine_similarity(a.embedding, b.embedding), 6) AS sim
              FROM emb a JOIN emb b
                ON a.vec_id <> b.vec_id AND a.label <> b.label
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY anchor_id ORDER BY sim DESC, neg_id
              ) AS rank
              FROM pairs
            )
            SELECT anchor_id, neg_id, sim, rank FROM ranked WHERE rank <= 4
            """
        ).fetchall()
    finally:
        con.close()
    twin_map = {}
    for a, j, s, rk in sorted(twin, key=lambda t: (t[0], t[3])):
        twin_map.setdefault(a, []).append((j, s))
    assert set(twin_map) == set(got)
    for a in got:
        assert [j for j, _ in got[a]] == [j for j, _ in twin_map[a]], a
        for (j1, s1), (j2, s2) in zip(got[a], twin_map[a]):
            assert s1 == pytest.approx(s2, abs=2e-6)


def test_multiprobe_blocking_recall_and_determinism(spark):
    # labels DECORRELATED from the mixture geometry (random assignment):
    # each spatial cluster holds all labels, so an anchor's hard negatives
    # are co-clustered — the setting the blocking is built for. (When labels
    # ≈ clusters, negatives sit across Voronoi borders and recall rests
    # entirely on n_assign — the documented worst case.)
    x, _ = _mog(n=240)
    rng = np.random.RandomState(11)
    labels = rng.randint(0, 4, size=len(x)).tolist()
    emb = _df(spark, x, labels)
    exact = {
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(emb, k=3, n_clusters=1).collect()
    }
    blocked_rows = hard_negatives(emb, k=3, n_clusters=6, n_assign=2).collect()
    blocked = {(r["anchor_id"], r["neg_id"]) for r in blocked_rows}
    # blocked recall of the true top-3 pairs is high on clustered data
    assert len(blocked & exact) / len(exact) >= 0.8
    # every anchor emits at most k rows with dense ranks
    per = {}
    for r in blocked_rows:
        per.setdefault(r["anchor_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per.values())
    # deterministic under re-run and partitioning
    again = {
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(emb.repartition(7), k=3, n_clusters=6, n_assign=2).collect()
    }
    assert again == blocked


def test_label_contracts_and_guards(spark):
    x, labels = _mog(n=40, n_labels=2)
    rows = [
        (i, [float(v) for v in x[i]], int(labels[i]) if i % 7 else None)
        for i in range(len(x))
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(emb, k=2, n_clusters=1).collect()
    null_ids = {i for i in range(40) if i % 7 == 0}
    assert all(r["anchor_id"] not in null_ids for r in out)
    assert all(r["neg_id"] not in null_ids for r in out)
    assert all(r["label"] != r["neg_label"] for r in out)
    with pytest.raises(ValueError, match="positive"):
        hard_negatives(emb, k=0)
    # single-label corpus: no certified negatives exist
    mono = spark.createDataFrame(
        [(i, [float(v) for v in x[i]], 1) for i in range(20)],
        "vec_id long, embedding array<double>, label int",
    )
    assert hard_negatives(mono, k=2, n_clusters=1).count() == 0


def test_positive_pairs_same_label_only(spark):
    x, labels = _mog(n=120)
    emb = _df(spark, x, labels)
    pos = positive_pairs(emb, tau=0.9, n_clusters=4, n_assign=2)
    lab = {i: labels[i] for i in range(len(x))}
    rows = pos.collect()
    assert len(rows) > 0
    assert all(lab[r["vec_a"]] == lab[r["vec_b"]] for r in rows)
    assert all(r["vec_a"] < r["vec_b"] and r["sim"] >= 0.9 for r in rows)


def test_deterministic_rung_single_centroid_matches_bruteforce(spark):
    """n_centroids=1 puts every vector in one cluster → the deterministic
    rung must reproduce the brute-force reference exactly (ids, order,
    rounded sims), and be invariant under input repartitioning."""
    from photo_vector_search_spark.operators.contrastive import (
        hard_negatives_deterministic,
    )

    x, labels = _mog(n=80)
    emb = _df(spark, x, labels)
    got_rows = hard_negatives_deterministic(
        emb, k=4, n_centroids=1, stage=False
    ).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["anchor_id"], r["rank"])):
        got.setdefault(r["anchor_id"], []).append((r["neg_id"], r["sim"]))
    want = _py_hard_negatives(x, labels, k=4)
    assert set(got) == set(want)
    for a in want:
        assert got[a] == [(j, pytest.approx(s, abs=2e-6)) for j, s in want[a]], a

    again = {
        (r["anchor_id"], r["neg_id"], r["rank"])
        for r in hard_negatives_deterministic(
            emb.repartition(7), k=4, n_centroids=1, stage=False
        ).collect()
    }
    assert again == {
        (r["anchor_id"], r["neg_id"], r["rank"]) for r in got_rows
    }


def test_deterministic_rung_declared_oracle(spark, sf_dir):
    """The declared r8 query replays bit-for-bit in DuckDB (the driver's
    compare, run locally at smoke scale)."""
    from photo_vector_search_spark.plans import pipeline_queries as pq
    from tests.oracle import assert_matches

    assert_matches(
        pq.q_hard_negatives(spark, sf_dir), pq.ORACLES["hard_negatives"], sf_dir
    )
