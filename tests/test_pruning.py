"""Prototype-difficulty pruning (Sorscher et al. 2022): the deterministic
rung is replayed bit-for-bit by a DuckDB window twin over the fixture
embeddings; the production rung matches an independent NumPy reference on
the same trained centroids; quota/ordering/guard semantics pinned."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.pruning import (
    prototype_difficulty,
    prune_prototypes,
    prune_prototypes_deterministic,
)
from photo_vector_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K = 8


def _duck_twin(keep_frac: float, keep: str) -> list[tuple]:
    order = "difficulty DESC" if keep == "hard" else "difficulty ASC"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    return con.execute(f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {K}),
sims AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.v, c.cv), 6) AS s
  FROM e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, cid, s FROM (
    SELECT vec_id, cid, s,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
scored AS (
  SELECT vec_id, cid AS cluster_id, round(1.0 - s, 6) AS difficulty
  FROM assign
),
ranked AS (
  SELECT vec_id, cluster_id, difficulty,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY {order}, vec_id
         ) AS rank,
         count(*) OVER (PARTITION BY cluster_id) AS n
  FROM scored
)
SELECT vec_id, cluster_id, difficulty, rank
FROM ranked WHERE rank <= ceil({keep_frac} * n)
ORDER BY vec_id
""").fetchall()


@pytest.mark.parametrize("keep_frac,keep", [(0.5, "hard"), (0.25, "easy")])
def test_deterministic_rung_matches_duckdb_twin(spark, keep_frac, keep):
    emb = load_table(spark, SF, "embeddings")
    got = sorted(
        (
            (r["vec_id"], r["cluster_id"], r["difficulty"], r["rank"])
            for r in prune_prototypes_deterministic(
                emb, keep_frac=keep_frac, n_clusters=K, keep=keep
            )
            .select("vec_id", "cluster_id", "difficulty", "rank")
            .collect()
        )
    )
    want = sorted((r[0], r[1], r[2], r[3]) for r in _duck_twin(keep_frac, keep))
    assert got == want
    assert len(got) > 0


def test_deterministic_rung_partitioning_invariant(spark):
    emb = load_table(spark, SF, "embeddings")
    one = sorted(
        r["vec_id"]
        for r in prune_prototypes_deterministic(
            emb.coalesce(1), keep_frac=0.5, n_clusters=K
        ).collect()
    )
    many = sorted(
        r["vec_id"]
        for r in prune_prototypes_deterministic(
            emb.repartition(13), keep_frac=0.5, n_clusters=K
        ).collect()
    )
    assert one == many


def _np_reference(x, ids, cents, keep_frac, keep):
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-300
    )
    sims = xn @ cn.T
    best = np.argmax(sims, axis=1)
    diff = np.round(1.0 - sims[np.arange(len(x)), best], 6)
    kept = []
    for c in range(len(cents)):
        members = [
            (diff[i], ids[i]) for i in range(len(x)) if best[i] == c
        ]
        if not members:
            continue
        sign = -1 if keep == "hard" else 1
        members.sort(key=lambda t: (sign * t[0], t[1]))
        quota = int(np.ceil(keep_frac * len(members)))
        kept.extend(vid for _, vid in members[:quota])
    return sorted(kept)


def test_production_rung_matches_numpy_reference(spark):
    from photo_vector_search_spark.operators.ann import train_centroids

    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    x = np.vstack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    cents = train_centroids(emb, n_clusters=6, sample=4096, seed=7)

    got = sorted(
        r["vec_id"]
        for r in prune_prototypes(
            emb, keep_frac=0.5, n_clusters=6, sample=4096, seed=7
        ).collect()
    )
    want = _np_reference(x, ids, cents, 0.5, "hard")
    assert got == want


def test_quota_and_ordering_semantics(spark):
    emb = load_table(spark, SF, "embeddings")
    out = prune_prototypes_deterministic(
        emb, keep_frac=0.5, n_clusters=K, keep="hard"
    )
    per_cluster = {
        r["cluster_id"]: r["cnt"]
        for r in out.groupBy("cluster_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    scored = prune_prototypes_deterministic(
        emb, keep_frac=1.0, n_clusters=K, keep="hard"
    )
    full = {
        r["cluster_id"]: r["cnt"]
        for r in scored.groupBy("cluster_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for c, n in full.items():
        assert per_cluster.get(c, 0) == int(np.ceil(0.5 * n)), c
    # keep='hard' survivors are the per-cluster difficulty maxima: every
    # survivor's difficulty >= every pruned row's in the same cluster
    # (modulo the id tie-break at the boundary)
    kept = prune_prototypes_deterministic(
        emb, keep_frac=0.5, n_clusters=K, keep="hard"
    ).select("cluster_id", "difficulty")
    boundary = kept.groupBy("cluster_id").agg(
        F.min("difficulty").alias("lo")
    )
    pruned_max = (
        scored.join(
            kept.select("cluster_id", "difficulty").withColumn(
                "_k", F.lit(1)
            ),
            ["cluster_id", "difficulty"],
            "left_anti",
        )
        .groupBy("cluster_id")
        .agg(F.max("difficulty").alias("hi"))
    )
    for r in boundary.join(pruned_max, "cluster_id").collect():
        assert r["lo"] >= r["hi"], r


def test_guards(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="keep_frac"):
        prune_prototypes_deterministic(emb, keep_frac=0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        prune_prototypes_deterministic(emb, keep_frac=1.5)
    with pytest.raises(ValueError, match="keep must be"):
        prune_prototypes_deterministic(emb, keep="both")


def test_prototype_difficulty_zero_norm_contract(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = {
        r["vec_id"]: (r["cluster_id"], r["difficulty"])
        for r in prototype_difficulty(df, cents).collect()
    }
    assert got[0] == (0, 0.0)
    assert got[1] == (0, 1.0)  # zero-norm: cos 0 everywhere, prototype 0
    assert got[2] == (1, pytest.approx(1.0 - 0.8, abs=1e-6))


def test_prune_ivf_store_single_assign_matches_composition(spark, tmp_path):
    """On a single-assign store, in-place pruning keeps exactly what
    prototype_difficulty + the quota rule keep with the store's own
    centroids — and the rewritten store still loads, still serves the
    adaptive EXACT probe (fresh radii sidecar), and shrank on disk."""
    from photo_vector_search_spark.operators.ann import (
        build_ivf_store,
        ivf_search,
        load_ivf_store,
    )
    from photo_vector_search_spark.operators.knn import knn_topk
    from photo_vector_search_spark.operators.pruning import (
        _rank_and_keep,
        prune_ivf_store,
    )
    from photo_vector_search_spark.sources.synthetic import mog_embeddings

    emb = mog_embeddings(spark, n=200, dim=16, n_components=4, noise=0.05)
    path = str(tmp_path / "store")
    cents = build_ivf_store(emb, path, n_clusters=4)

    want = {
        r["vec_id"]
        for r in _rank_and_keep(
            prototype_difficulty(emb.select("vec_id", "embedding"), cents),
            0.5, "hard", "vec_id",
        ).collect()
    }
    got = prune_ivf_store(spark, path, keep_frac=0.5, keep="hard")
    got_ids = {r["vec_id"] for r in got.collect()}
    assert got_ids == want

    store, cents2 = load_ivf_store(spark, path)  # torn-pair check passes
    assert np.array_equal(cents, cents2)
    assert store.count() == len(want)
    assert {r["vec_id"] for r in store.select("vec_id").collect()} == want

    # adaptive probe (exact by construction) over the pruned store equals
    # brute-force exact search over the surviving vectors — the refreshed
    # radii sidecar is both accepted and correct
    survivors = emb.join(
        spark.createDataFrame([(i,) for i in sorted(want)], "vec_id long"),
        "vec_id",
    )
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    adaptive = ivf_search(spark, path, q, k=5).collect()
    exact = knn_topk(survivors, q, k=5).collect()
    assert [(r["vec_id"], r["dist"]) for r in adaptive] == [
        (r["vec_id"], r["dist"]) for r in exact
    ]


def test_prune_ivf_store_multi_assign_semantics(spark, tmp_path):
    """Multi-assign: per-vector difficulty is the distance to the NEAREST
    assigned centroid, quotas count distinct vectors per primary cluster,
    survivors keep ALL their copies, and rewrite=False leaves disk alone."""
    from photo_vector_search_spark.operators.ann import (
        build_ivf_store,
        load_ivf_store,
    )
    from photo_vector_search_spark.operators.pruning import prune_ivf_store
    from photo_vector_search_spark.sources.synthetic import mog_embeddings

    emb = mog_embeddings(spark, n=150, dim=16, n_components=4, noise=0.05)
    path = str(tmp_path / "store_ma")
    cents = build_ivf_store(emb, path, n_clusters=4, n_assign=2)
    before = spark.read.parquet(path).count()
    assert before == 300  # 2 rows per vector

    dry = prune_ivf_store(spark, path, keep_frac=0.5, rewrite=False)
    rows = dry.collect()
    assert spark.read.parquet(path).count() == before  # disk untouched

    # NumPy reference: nearest centroid overall (for n_assign=2 over
    # 4 clusters the top-2 always contains the argmax), quota per primary
    xs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    prim, diff = {}, {}
    for vid, v in xs.items():
        vv = v / max(np.linalg.norm(v), 1e-300)
        sims = cn @ vv
        c = int(np.argmax(sims))
        prim[vid], diff[vid] = c, round(1.0 - float(sims[c]), 6)
    want = set()
    for c in range(4):
        members = sorted(
            (vid for vid in xs if prim[vid] == c),
            key=lambda v: (-diff[v], v),
        )
        quota = int(np.ceil(0.5 * len(members)))
        want.update(members[:quota])
    assert {r["vec_id"] for r in rows} == want
    for r in rows:
        assert r["cluster_id"] == prim[r["vec_id"]]
        assert r["difficulty"] == pytest.approx(diff[r["vec_id"]], abs=2e-6)

    # now rewrite: every survivor keeps BOTH multi-assign copies
    prune_ivf_store(spark, path, keep_frac=0.5)
    store, _ = load_ivf_store(spark, path)
    per_vec = (
        store.groupBy("vec_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_vec] == [2]
    assert store.select("vec_id").distinct().count() == len(want)


def test_prune_ivf_store_sidecar_stats_match_written_store(spark, tmp_path):
    """The rewrite's radii/count/signature sidecar — now computed in ONE
    pre-swap cluster_stats pass over the pruned frame (round-10 fix) — is
    bit-identical to what a post-write recompute would produce, and is
    ACCEPTED by the loader (no silent fallback recompute): radius equals
    cluster_radii over the written rows, built_rows equals the written
    count, store_sig matches the directory signature, n_assign survives."""
    from photo_vector_search_spark.operators.ann import (
        _store_signature,
        build_ivf_store,
        cluster_radii,
        cluster_stats,
        load_ivf_store,
        stored_n_assign,
    )
    from photo_vector_search_spark.operators.pruning import prune_ivf_store
    from photo_vector_search_spark.sources.synthetic import mog_embeddings

    emb = mog_embeddings(spark, n=160, dim=16, n_components=4, noise=0.05)
    path = str(tmp_path / "store_sc")
    build_ivf_store(emb, path, n_clusters=4, n_assign=2)
    prune_ivf_store(spark, path, keep_frac=0.5)

    store, cents = load_ivf_store(spark, path)
    sidecar = {
        r["centroid_id"]: r
        for r in spark.read.parquet(path + ".centroids").collect()
    }
    want_radii = cluster_radii(store, cents)
    for cid, row in sidecar.items():
        assert row["radius"] == pytest.approx(want_radii[cid], abs=0)
        assert row["built_rows"] == store.count()
        assert row["store_sig"] == _store_signature(path)
        assert row["n_assign"] == 2
    # the fused helper itself agrees with its two-pass ancestors
    r2, n2 = cluster_stats(store, cents)
    assert np.allclose(r2, want_radii) and n2 == store.count()
