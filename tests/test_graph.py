"""Distributed connected components vs an independent Python union-find, on
random graphs, a worst-case chain, and the real minhash pair output."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
from photo_vector_search_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from photo_vector_search_spark.sources.tables import load_table


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min element of each component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["group_id"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(11)
    for trial in range(3):
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(120 + 60 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == _union_find(edges), trial


def test_cc_long_chain_converges_logarithmically(spark):
    """A 300-node path is the diameter worst case: plain min-propagation
    needs ~300 rounds; pointer jumping must finish far under max_iters=30."""
    edges = [(i, i + 1) for i in range(300)]
    got = _cc(spark, edges, max_iters=30)
    assert got == {i: 0 for i in range(301)}


def test_dedup_clusters_from_real_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, n=3, tau=0.5)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edge_list  # fixture exercises the operator
    want = _union_find(edge_list)

    assigned = dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["group_id"] for r in assigned.collect()}
    assert len(got) == docs.count()  # every doc assigned, singletons included
    for d, g in got.items():
        assert g == want.get(d, d), d
    # canonical contract: every group's id is a member of the group
    groups = {}
    for d, g in got.items():
        groups.setdefault(g, set()).add(d)
    assert all(g in members for g, members in groups.items())


def test_cc_string_ids_not_cast_to_null(spark):
    """String doc ids (UUIDs, paths) must cluster correctly — the original
    long cast turned them into NULLs and silently disabled dedup (r5 second
    review). group_id = lexicographic min."""
    edges = [("u-b", "u-a"), ("u-b", "u-c"), ("u-x", "u-y")]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        r["doc_id"]: r["group_id"] for r in connected_components(df).collect()
    }
    assert got == {
        "u-a": "u-a",
        "u-b": "u-a",
        "u-c": "u-a",
        "u-x": "u-x",
        "u-y": "u-x",
    }
    # dedup_clusters over string-keyed docs: singletons self-assign
    docs = spark.createDataFrame(
        [("u-a",), ("u-b",), ("u-z",)], "doc_id string"
    )
    assigned = {
        r["doc_id"]: r["group_id"] for r in dedup_clusters(docs, df).collect()
    }
    assert assigned == {"u-a": "u-a", "u-b": "u-a", "u-z": "u-z"}


def test_cc_reliable_checkpoint_identical_labels(spark, tmp_path):
    """checkpoint_dir switches per-round lineage truncation to RELIABLE
    checkpoint (survives executor loss on a cluster); labels must be
    byte-identical to the default localCheckpoint run, and checkpoint files
    must actually land in the directory."""
    import os

    rng = random.Random(23)
    edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]
    ckpt = str(tmp_path / "cc_ckpt")
    got = _cc(spark, edges, checkpoint_dir=ckpt, checkpoint_every=2)
    assert got == _union_find(edges)
    assert got == _cc(spark, edges)  # identical to the local-checkpoint path
    # reliable checkpoints were really written (not silently local)
    found = [
        names for _, _, names in os.walk(ckpt) if names
    ]
    assert found, "no checkpoint files written under checkpoint_dir"


def test_cc_giant_component_skew(spark):
    """Web-dedup reality: one giant component holds ~90% of the edges, so the
    pointer-jump join keys concentrate on one hot label. Must converge with
    correct labels and a wall bounded vs a uniform graph of the same size
    (AQE skew handling + the log-round bound keep the hot key from blowing
    up)."""
    import time

    rng = random.Random(7)
    n = 4000
    giant_nodes = int(n * 0.9)
    # giant component: a path (worst-case depth) + random chords
    edges = [(i, i + 1) for i in range(giant_nodes - 1)]
    edges += [
        (rng.randrange(giant_nodes), rng.randrange(giant_nodes)) for _ in range(500)
    ]
    # the remaining 10%: many small components
    for start in range(giant_nodes, n - 1, 4):
        edges.append((start, min(start + 1, n - 1)))

    t0 = time.perf_counter()
    got = _cc(spark, [(a, b) for a, b in edges if a != b])
    wall_skew = time.perf_counter() - t0
    assert got == _union_find([(a, b) for a, b in edges if a != b])
    # every giant-component node got the single min label
    assert {got[i] for i in range(giant_nodes)} == {0}

    # uniform comparison graph: same node/edge count, no giant component
    uni = []
    for start in range(0, n - 3, 4):
        uni += [(start, start + 1), (start + 1, start + 2), (start + 2, start + 3)]
    uni = uni[: len(edges)]
    t0 = time.perf_counter()
    got_u = _cc(spark, uni)
    wall_uni = time.perf_counter() - t0
    assert got_u == _union_find(uni)
    # giant-skew run is bounded: more rounds (deeper label tree) but within
    # a small multiple of the uniform run — not a hot-key blowup
    assert wall_skew < max(5.0 * wall_uni, 60.0), (wall_skew, wall_uni)
    print(f"CC skew evidence: giant={wall_skew:.1f}s uniform={wall_uni:.1f}s")


def test_cc_matches_duckdb_recursive_cte_on_real_pairs(spark, sf_correct):
    """Cross-ENGINE twin of the component closure: DuckDB replays the
    min-id transitive reachability with a recursive CTE over the SAME
    MinHash-LSH pairs the dedup family produces at sf0.01 — a fully
    independent formulation (fixpoint recursion vs alternating star
    joins), so an error in either converges differently."""
    import duckdb
    import pandas as pd

    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
    from photo_vector_search_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents")
    pairs = minhash_lsh_pairs(docs, n=3, tau=0.5).select("doc_a", "doc_b")
    ppdf = pairs.toPandas()
    assert len(ppdf) > 0

    got = {
        (r["doc_id"], r["group_id"])
        for r in connected_components(pairs).collect()
    }

    con = duckdb.connect()
    try:
        con.register("pairs", ppdf)
        rows = con.execute(
            """
            WITH RECURSIVE
            edges AS (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS n FROM edges),
            reach(n, r) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.n
            )
            SELECT n AS doc_id, min(r) AS group_id FROM reach GROUP BY n
            """
        ).fetchall()
    finally:
        con.close()
    assert got == set(rows)


def test_driver_fast_path_matches_distributed_rounds(spark):
    """The small-graph union-find shortcut must label exactly like the
    iterative join rounds (group_id = component min), including chains,
    stars, self-loops, duplicate/reversed edges, and string ids."""
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # chain
        (10, 11), (10, 12), (10, 13),             # star
        (20, 20),                                  # self-loop
        (30, 31), (31, 30), (30, 31),              # dup + reversed
        (40, 41), (42, 41),                        # min arrives via middle
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r["doc_id"], r["group_id"])
        for r in connected_components(pairs).collect()
    }
    slow = {
        (r["doc_id"], r["group_id"])
        for r in connected_components(pairs, driver_edge_limit=0).collect()
    }
    assert fast == slow and len(fast) == 15

    spairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    sfast = {
        (r["doc_id"], r["group_id"])
        for r in connected_components(spairs).collect()
    }
    sslow = {
        (r["doc_id"], r["group_id"])
        for r in connected_components(spairs, driver_edge_limit=0).collect()
    }
    assert sfast == sslow
    assert ("c", "a") in sfast and ("y", "x") in sfast
