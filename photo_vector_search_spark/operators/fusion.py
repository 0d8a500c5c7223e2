"""Reciprocal Rank Fusion (RRF) — hybrid-retrieval result merging (Cormack,
Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
individual Rank Learning Methods"; the fusion Elasticsearch/OpenSearch ship
for BM25 + vector hybrid search).

score(q, d) = Σ_runs w_i / (k + rank_i(q, d)), summed over the runs that
retrieved d for q. Rank-based (not score-based) fusion needs NO score
calibration between runs — a cosine distance and a BM25 score fuse without
normalization, which is why RRF is the production default.

This is the glue between the engine's two retrieval families: the embedding
rungs (knn/ivf/pq/sq) and the lexical rung (`operators/bm25`), both of which
emit the (query_id, doc_id, rank) shape `operators/evaluation` consumes —
so fuse → evaluate composes directly.

Scale shape (100 TB): inputs are rank lists, ≤ k rows per query per run by
construction — the union is (runs · k) rows per query, NOT corpus-sized.
One per-run (q, d) min-rank agg (the duplicate-collapse discipline shared
with retrieval_metrics), one keyed (q, d) sum, one per-QUERY window whose
partitions are bounded by runs·k — no global sort, no corpus scan.

Cf. reference scope: the reference searches by one modality at a time
(photo_vector_search.py:84-130, CLIP image/text query against one HNSW
index); fusion is the missing multi-ranker rung of that family.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # the paper's (and Elasticsearch's) default rank constant


def rrf_fuse(
    runs: Sequence[DataFrame],
    k: int = RRF_K,
    weights: Sequence[float] | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    top_n: int | None = None,
) -> DataFrame:
    """Fuse ranked result lists into one ranking per query.

    ``runs``: ranked frames (query_col, doc_col, rank_col), rank 1-based —
    the knn_batch / bm25_topk / retrieval_metrics shape. ``weights`` scales
    each run's contribution (default: all 1.0 — the paper's form).
    Duplicate (query, doc) rows WITHIN a run collapse to their best rank
    before contributing (the retrieval_metrics duplicate discipline); the
    same doc across DIFFERENT runs is the point — contributions add.

    Output: (query_col, doc_col, rrf_score rounded 6dp, rank) re-ranked per
    query, ties broken by ascending doc id so the ranking is deterministic
    and partitioning-invariant. ``top_n`` keeps the fused top n per query."""
    if not runs:
        raise ValueError("need at least one run to fuse")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError(
            f"got {len(runs)} runs but {len(weights)} weights"
        )
    if top_n is not None and top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    contribs = []
    for run, w in zip(runs, weights):
        best = (
            run.select(
                F.col(query_col).alias("_q"),
                F.col(doc_col).alias("_d"),
                F.col(rank_col).cast("long").alias("_r"),
            )
            .filter(F.col("_r") >= 1)
            .groupBy("_q", "_d")
            .agg(F.min("_r").alias("_r"))
        )
        contribs.append(
            best.select(
                "_q",
                "_d",
                (F.lit(float(w)) / (F.lit(float(k)) + F.col("_r"))).alias("_c"),
            )
        )
    fused = (
        reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy("_q", "_d")
        .agg(F.round(F.sum("_c"), 6).alias("rrf_score"))
    )
    w_rank = Window.partitionBy("_q").orderBy(
        F.col("rrf_score").desc(), F.col("_d").asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w_rank))
    if top_n is not None:
        out = out.filter(F.col("rank") <= top_n)
    return out.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(doc_col),
        "rrf_score",
        "rank",
    )
