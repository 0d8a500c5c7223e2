"""Distributed connected components — the missing link between the dedup
family's PAIR outputs (jaccard/minhash/simhash/fuzzy/embedding/SRP all emit
(doc_a, doc_b) edges) and ``canonicalize_groups`` (which consumes per-record
``group_id`` assignments): duplicate CLUSTERS are the connected components of
the pair graph.

Algorithm: iterative min-label propagation with POINTER JUMPING —
each round every node takes the min of (its label, its neighbors' labels),
then short-circuits ``comp(node) ← comp(comp(node))``. Neighbor propagation
alone needs O(graph diameter) rounds (a 10⁶-long duplicate chain would need
10⁶ joins); the jump halves label-tree depth every round, giving O(log n)
convergence — the standard MapReduce CC recipe (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — the
large-star/small-star family; this is its simpler min-label cousin with the
same log-round bound on the label tree).

Every round is two keyed joins + one groupBy-min — all map-side combinable,
shuffle keyed on node id, nothing driver-sized. Each round's labels are
``localCheckpoint``ed (materialized, lineage TRUNCATED): without that, every
iteration's logical plan nests the previous one and Catalyst analysis time
grows super-linearly with rounds — the classic iterative-algorithm trap on
Spark (checkpointing each round is the standard fix, same as GraphX/Pregel).
One convergence-count job per round; peak storage is two label tables
(|V| rows each).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many (deduplicated, symmetrized) edges the component closure
# runs as a driver-side union-find on the already-materialized edge
# checkpoint instead of iterative join rounds: each distributed round costs
# three joins plus a checkpoint job, which dominates wall-clock on the small
# graphs LSH dedup typically emits, while ≤ this many edge rows collect in a
# few MB (the bounded-collect discipline). Identical labels either way (the
# union-find tracks each component's minimum id — asserted in tests);
# env-tunable for clusters with bigger drivers.
CC_DRIVER_EDGE_LIMIT = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "100000"))


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """(doc_id, group_id) via union-find over a COLLECTED edge list — the
    small-graph fast path. ``edges`` must be materialized (checkpointed)
    and deduplicated; the representative of every set is its minimum
    member, so labels equal the join-iteration fixpoint exactly."""
    from pyspark.sql import types as T

    rows = edges.collect()  # bounded by CC_DRIVER_EDGE_LIMIT (checked by caller)
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row["a"], row["b"]
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label union: the smaller id stays the root, so every
            # root IS its component's minimum member
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = sorted((n, find(n)) for n in parent)
    id_type = edges.schema["a"].dataType
    schema = T.StructType(
        [
            T.StructField("doc_id", id_type, True),
            T.StructField("group_id", id_type, True),
        ]
    )
    return edges.sparkSession.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 30,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 3,
    driver_edge_limit: int | None = None,
) -> DataFrame:
    """(doc_id, group_id) for every node that appears in ``pairs``;
    ``group_id`` = the smallest doc_id in the node's connected component (the
    dedup family's canonical-id convention — for string ids, the
    lexicographic minimum; any orderable id type works, and ids keep their
    own type rather than being cast, so UUID/path ids don't silently become
    NULL and disable dedup). Nodes with no edges simply don't appear —
    left-join and coalesce to self for the full-corpus assignment. Edges with
    a NULL endpoint are malformed input and are dropped (NULL joins to
    nothing; keeping them would only create phantom isolated labels).

    Durability trade (``checkpoint_dir``): by default each round's labels are
    ``localCheckpoint``ed — blocks live on EXECUTORS, which truncates lineage
    fast but means a lost executor after round k kills the job with no
    recompute path. Fine on local[n]; on a real multi-executor cluster a long
    CC run should pass ``checkpoint_dir`` (shared storage every executor can
    reach): every ``checkpoint_every``-th round then uses RELIABLE
    ``checkpoint`` (HDFS/S3-backed, survives executor loss), and the rounds
    BETWEEN use ``persist(MEMORY_AND_DISK)`` — NOT localCheckpoint, whose
    truncated-lineage executor-local blocks are unrecoverable and would void
    the durability the reliable snapshots bought. Persisted rounds keep
    RECOMPUTABLE lineage rooted at the last reliable checkpoint, so an
    executor loss at any point re-derives at most ``checkpoint_every - 1``
    rounds of (cached, cheap) joins instead of killing the job; lineage/plan
    depth stays bounded by the same window. Superseded persisted rounds are
    unpersisted as the iteration advances (peak: two label tables + the last
    reliable snapshot). Sets the session's checkpoint dir as a side effect
    (Spark has one per SparkContext). Identical labels either way (asserted
    in tests).

    Checkpoint-file lifecycle: reliable checkpoints are DURABLE BY DESIGN —
    Spark does not delete them unless the context was started with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (a
    construction-time conf this library cannot set for you), so each
    checkpointed round leaves a labels snapshot in ``checkpoint_dir``. Pass
    a RUN-SCOPED directory and delete it after materializing the result
    (write the returned labels out first — deleting while the returned
    DataFrame is still lazy severs its lineage). Auto-deletion here would
    be unsafe: the dir is SparkContext-global and may be shared.

    Raises if ``max_iters`` rounds don't converge (with pointer jumping that
    means a component chain longer than ~2^max_iters — not a real corpus)."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    # rounds materialized via persist() (reliable-checkpoint mode only) — safe
    # to unpersist once superseded: their lineage stays recomputable from the
    # last reliable snapshot, unlike localCheckpoints whose blocks ARE the data
    _persisted: list[DataFrame] = []

    def _drain_persisted(keep: DataFrame | None) -> None:
        for df in _persisted[:]:
            if df is not keep:
                df.unpersist(blocking=False)
                _persisted.remove(df)

    def _ckpt(df: DataFrame, rnd: int) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        if rnd % max(checkpoint_every, 1) == 0:
            return df.checkpoint(eager=True)
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # materialize eagerly — same cadence as the checkpoints
        _persisted.append(df)
        return df

    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # symmetrize once; propagation below then only needs one join direction
    # checkpoint: materialize AND truncate lineage — see module docstring.
    # The edge count rides the checkpoint action as an observed metric (the
    # round loop's convergence-count pattern) so the small-graph routing
    # decision below costs no extra job in localCheckpoint mode.
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    n_edges = None
    if checkpoint_dir is None:
        from pyspark.sql import Observation

        eobs = Observation()
        sym = sym.observe(eobs, F.count(F.lit(1)).alias("n"))
    edges = _ckpt(sym, 0)
    if checkpoint_dir is None:
        try:
            n_edges = int(eobs.get["n"] or 0)
        except Exception:
            n_edges = None  # empty-plan corner: fall back to the count
    if n_edges is None:
        n_edges = edges.count()  # cheap: counts the materialized checkpoint
    limit = (
        driver_edge_limit
        if driver_edge_limit is not None
        else CC_DRIVER_EDGE_LIMIT
    )
    if n_edges <= limit:
        # small graph: the per-round join+checkpoint overhead dominates —
        # collapse on the driver from the materialized edges (identical
        # labels; see _driver_union_find)
        return _driver_union_find(edges)
    labels = _ckpt(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node")),
        0,
    )
    for _rnd in range(max_iters):
        # neighbor minima come via ONE keyed join + groupBy; the node's own
        # label joins back so the round carries (old, new) side by side —
        # min(union(labels, nb)) and least(own, min-neighbors) are the same
        # value (every node appears in labels), but this form lets the
        # convergence count ride ON the checkpoint action as an observed
        # metric instead of a second per-round join+count job (r12; the
        # localCheckpoint is a SQL action, so Observation fills — verified)
        nbmin = (
            edges.join(labels, edges["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("_ncomp"))
        )
        merged = labels.select("node", F.col("comp").alias("_old")).join(
            nbmin, "node", "left"
        ).select(
            "node",
            "_old",
            F.least(
                F.col("_old"), F.coalesce(F.col("_ncomp"), F.col("_old"))
            ).alias("comp"),
        )
        # pointer jumping: comp(node) <- comp(comp(node)); labels only
        # ever decrease, so the jump is monotone and safe
        m2 = merged.select(F.col("node").alias("jnode"), F.col("comp").alias("jcomp"))
        stepped = merged.join(m2, merged["comp"] == m2["jnode"], "left").select(
            "node",
            "_old",
            F.least(
                F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))
            ).alias("comp"),
        )
        changed = None
        if checkpoint_dir is None:
            from pyspark.sql import Observation

            obs = Observation()
            stepped = stepped.observe(
                obs,
                F.sum(
                    F.when(F.col("comp") != F.col("_old"), 1).otherwise(0)
                ).alias("chg"),
            )
        ck = _ckpt(stepped, _rnd + 1)
        if checkpoint_dir is None:
            try:
                changed = int(obs.get["chg"] or 0)
            except Exception:
                changed = None  # empty-plan corner: fall back to the count
        if changed is None:
            changed = ck.filter(F.col("comp") != F.col("_old")).count()
        new = ck.select("node", "comp")
        # the old round is superseded (and no longer referenced by any
        # pending job): release its cache; lineage stays recomputable
        _drain_persisted(keep=ck)
        labels = new
        if changed == 0:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "a component label-chain deeper than pointer jumping can collapse "
        "in that budget; raise max_iters"
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full-corpus group assignment from a pair list: every doc gets a
    ``group_id`` (its component's min id; singletons map to themselves) —
    exactly the shape ``canonicalize_groups`` consumes and the
    witness-correct alternative to greedy doc_b pruning (every non-canonical
    member's group DOES contain its surviving canonical)."""
    comp = connected_components(pairs)
    return docs.join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn("group_id", F.coalesce(F.col("group_id"), F.col(id_col)))
