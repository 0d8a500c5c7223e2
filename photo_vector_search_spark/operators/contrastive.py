"""Contrastive training-pair mining over the embedding store — the step
between "deduplicated embeddings" and "training a retriever/encoder":
for every anchor, the k most-similar vectors carrying a DIFFERENT label
(hard negatives — near the anchor in embedding space but semantically
other, the pairs that actually move a contrastive loss), and optionally
same-label positives above a floor.

Spark-first shape, riding the IVF blocking machinery (the same
cluster-then-block scheme as ``ann.ivf_near_dup_pairs``/SemDeDup):

1. sampled k-means centroids (bounded driver train), map-only multi-probe
   assignment (``n_assign`` nearest clusters per vector — the recall knob:
   an anchor's true neighbor just across a Voronoi border is still found
   in a shared cluster);
2. per-cluster Arrow kernel: blocked matmul, per-anchor top-k
   different-label rows (ROUNDED sims; deterministic (sim desc, id asc)
   tie-break);
3. one groupBy(anchor) merge of the ≤ k·n_assign candidate rows (dedup of
   pairs seen in several shared clusters, then the same ordered top-k) —
   shuffle volume O(N·k·n_assign), never O(N²).

Semantics: sims are exact cosine for every emitted pair (precision exact);
RECALL is the blocking trade — a hard negative sharing no assigned cluster
with its anchor is missed; raise ``n_assign``/``n_clusters`` per the
ivf_near_dup_pairs sizing rule (clusters ≈ N / target_rows). Recall caveat
specific to THIS operator: when labels correlate strongly with embedding
geometry (each spatial cluster ≈ one label), different-label neighbors sit
across Voronoi borders by construction and recall rests entirely on the
multi-probe — raise ``n_assign`` aggressively there, or mine from a
label-balanced reclustering. Verified
against a brute-force NumPy reference and a DuckDB window twin at fixture
scale (tests/test_contrastive.py — the single-cluster setting makes the
blocked path EXACT, which is what the twin pins).

Reference scope note: the reference (photo_vector_search) retrieves top-k
for a user query (photo_vector_search.py:156-193); this is the bulk
self-supervised variant its stack never needed — an engine-native
extension of the mandated similarity-search family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hard_negatives(
    emb: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
    block_rows: int = 2048,
    sample: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """(anchor_id, neg_id, label, neg_label, sim, rank): for each anchor the
    ``k`` most-similar different-label vectors found in its assigned
    clusters, rank 1 = hardest. NULL-label rows are excluded from BOTH
    sides (no label ⇒ can't certify "different"). Anchors with no
    different-label co-clustered vector emit nothing."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from photo_vector_search_spark.operators.ann import (
        assign_clusters,
        train_centroids,
    )

    # train_centroids/assign_clusters hardcode (vec_id, embedding): rename
    # INTO that contract so non-default id/vec columns neither throw nor —
    # worse, if a stale 'embedding' column coexists — silently cluster the
    # wrong space; the output renames back
    labeled = emb.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col(label_col).alias("_lbl"),
    )
    centroids = train_centroids(
        labeled, n_clusters=n_clusters, sample=sample, seed=seed
    )
    assigned = assign_clusters(labeled, centroids, n_assign=n_assign)
    cands = _cluster_hard_negatives(
        assigned, k, "vec_id", "embedding", "_lbl", round_to, block_rows
    )
    # pairs found via several shared clusters dedup to one row, then the
    # global per-anchor top-k replays the kernel's (sim desc, id asc) order
    dedup = cands.groupBy("anchor_id", "neg_id").agg(
        F.first("label").alias("label"),
        F.first("neg_label").alias("neg_label"),
        F.max("sim").alias("sim"),  # rounding makes all copies equal anyway
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("neg_id")
    )
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "label", "neg_label", "sim", "rank")
    )


def _cluster_hard_negatives(
    assigned: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_to: int,
    block_rows: int,
) -> DataFrame:
    """Per-cluster blocked top-k different-label candidates (Arrow kernel)."""
    import numpy as np
    import pandas as pd

    dtypes = dict(assigned.dtypes)
    schema = (
        f"anchor_id {dtypes[id_col]}, neg_id {dtypes[id_col]}, "
        f"label {dtypes[label_col]}, neg_label {dtypes[label_col]}, sim double"
    )

    def fn(key, pdf):
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        labels = pdf[label_col].to_numpy()[order]
        m = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64, copy=False)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        out = {c: [] for c in ("anchor_id", "neg_id", "label", "neg_label", "sim")}
        n = len(ids)
        for s0 in range(0, n, block_rows):
            blk = m[s0 : s0 + block_rows]
            sims = np.round(blk @ m.T, round_to)
            for i in range(blk.shape[0]):
                gi = s0 + i
                diff = np.nonzero(labels != labels[gi])[0]
                if not len(diff):
                    continue
                row = sims[gi - s0, diff]
                # ids are ascending, so a stable sort on -sim breaks ties by
                # ascending neg_id — the merge window's exact order
                top = diff[np.argsort(-row, kind="stable")[: k]]
                out["anchor_id"].extend([ids[gi]] * len(top))
                out["neg_id"].extend(ids[top])
                out["label"].extend([labels[gi]] * len(top))
                out["neg_label"].extend(labels[top])
                out["sim"].extend(sims[gi - s0, top])
        return pd.DataFrame(out)

    return assigned.select("cluster_id", id_col, vec_col, label_col).groupBy(
        "cluster_id"
    ).applyInPandas(fn, schema)


def hard_negatives_deterministic(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
    block_rows: int = 2048,
    stage: bool = True,
) -> DataFrame:
    """The oracle-replayable rung of ``hard_negatives`` (the
    ``semdedup_deterministic`` pattern): centroids = the ``n_centroids``
    lowest-id vectors, assignment = argmax ROUNDED cosine with centroid-id
    tie-break, single assignment per vector (``n_assign=1``), per-cluster
    different-label top-k on ROUNDED sims with the (sim desc, id asc)
    tie-break. Every comparison is 6-dp-stable, so a DuckDB window query
    replays the whole pipeline bit-for-bit. Same output schema as
    ``hard_negatives``; with a single assignment the per-cluster top-k IS
    the global top-k, so the merge stage reduces to the rank window.

    The assigned frame feeds TWO consumers (the pair kernel and nothing
    else here, but the kernel itself is wide); staged once by default so a
    re-derivation never recomputes the k·N assignment matmul."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from photo_vector_search_spark.operators.semdedup import (
        assign_rounded,
        seed_centroids,
    )

    labeled = emb.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col(label_col).alias("_lbl"),
    )
    cent = seed_centroids(labeled, n_centroids)
    assigned = assign_rounded(labeled, cent, round_to=round_to)
    if stage:
        from photo_vector_search_spark.operators.staging import stage_frame

        assigned = stage_frame(assigned, "pvs_hardneg")
    cands = _cluster_hard_negatives(
        assigned, k, "vec_id", "embedding", "_lbl", round_to, block_rows
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("neg_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "label", "neg_label", "sim", "rank")
    )


def positive_pairs(
    emb: DataFrame,
    tau: float,
    n_clusters: int = 16,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    **ivf_kwargs,
) -> DataFrame:
    """Same-label τ-pairs (anchor positives for a contrastive batch): the
    cluster-blocked pair generator filtered to label-equal pairs. Columns
    (vec_a, vec_b, sim) with vec_a < vec_b."""
    from photo_vector_search_spark.operators.ann import ivf_near_dup_pairs

    # rename into ivf_near_dup_pairs' hardcoded (vec_id, embedding) contract
    labeled = emb.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col(label_col).alias("_lbl"),
    )
    pairs = ivf_near_dup_pairs(
        labeled.select("vec_id", "embedding"),
        tau=tau,
        n_clusters=n_clusters,
        n_assign=n_assign,
        **ivf_kwargs,
    )
    lab = labeled.select(
        F.col("vec_id").alias("vec_a"), F.col("_lbl").alias("_la")
    )
    lab_b = labeled.select(
        F.col("vec_id").alias("vec_b"), F.col("_lbl").alias("_lb")
    )
    return (
        pairs.join(lab, "vec_a")
        .join(lab_b, "vec_b")
        .filter(F.col("_la") == F.col("_lb"))
        .select("vec_a", "vec_b", "sim")
    )
