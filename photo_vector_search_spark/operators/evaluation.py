"""Distributed retrieval evaluation: recall@k, precision@k, hit@k, MRR@k
and nDCG@k over ranked result lists — the measurement rung every
ANN/serving ladder needs (tools/ivf_recall.py's driver-side recall sweep,
promoted to a distributed operator a user can run over millions of queries;
metric definitions per the standard IR formulations, e.g. TREC / BEIR).

Inputs:
- ``results``: ranked candidates ``(query_id, doc_id, rank)`` with rank
  1-based per query — exactly the shape `knn_batch`/`ivf_pq_batch_search`
  emit (their ``vec_id`` aliased to ``doc_id``).
- ``gold``: relevant pairs ``(query_id, doc_id)`` — binary relevance (the
  graded-relevance extension is a weight column on this frame; not needed
  by any pipeline here).

Semantics (all at cutoff ``k``):
- recall@k    = |retrieved@k ∩ gold| / |gold|
- precision@k = |retrieved@k ∩ gold| / k           (k, not |retrieved|: a
  system that returns fewer than k pays for the empty slots)
- hit@k       = 1 if any gold doc retrieved@k else 0
- mrr@k       = 1 / rank of the first gold doc (0 if none in top-k)
- ndcg@k      = DCG@k / IDCG@k with DCG = Σ 1/log2(rank+1) over gold hits,
  IDCG = Σ_{i=1..min(k,|gold|)} 1/log2(i+1)

Queries present in ``gold`` but absent from ``results`` score 0 on every
metric (a system that returns nothing for a query must not be dropped from
the mean — silent-cap rule). Queries in ``results`` with NO gold entry are
excluded (undefined denominators), matching trec_eval.

Scale shape (100 TB): ONE gold-left-join on (query_id, doc_id) — results
at the cutoff are the small side at any scale (≤ k rows per query; AQE
broadcasts when they fit), and every metric numerator AND denominator
falls out of ONE per-query aggregation over the joined rows (≤ |gold| per
query in, 1 row out, map-side combinable); the corpus-level mean is a
one-row final agg. No windows, no second pass, no driver data beyond the
metric row.

Cf. reference scope: the reference (rianders/photo-vector-search) never
measures retrieval quality — this extends the mandated similarity-search
family with its missing eval half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRICS = ("recall", "precision", "hit", "mrr", "ndcg")


def retrieval_metrics(
    results: DataFrame,
    gold: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query metrics at cutoff ``k``: one row per gold query with
    (query_id, n_gold, n_hits, recall, precision, hit, mrr, ndcg), floats
    rounded to 6dp (the repo-wide oracle discipline)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    # Duplicate (query, doc) rows within the cutoff collapse to their BEST
    # rank here, structurally: eval operators get pointed at arbitrary
    # ranker output, and a duplicate-emitting ranker must not double-join
    # its gold pair and inflate DCG/hit counts (trec_eval counts the first
    # occurrence). The agg is keyed on the same (_q, _d) as the join below,
    # so the join reuses its exchange — no extra shuffle in the plan.
    res = (
        results.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        .filter(F.col("_r") <= k)
        .groupBy("_q", "_d")
        .agg(F.min("_r").alias("_r"))
    )
    g = gold.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()

    # ONE gold-left-join + ONE per-query agg: each gold pair either finds
    # its retrieved rank (hit) or carries a NULL rank (miss), so the gold
    # count, hit count, first rank and DCG all fall out of a single
    # aggregation — zero-hit (or entirely missing) queries keep their row
    # and score 0.
    joined = g.join(res, ["_q", "_d"], "left")
    per_q = joined.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_gold"),
        F.count("_r").alias("n_hits"),
        F.min("_r").alias("first_rank"),
        F.sum(1.0 / F.log2(F.col("_r") + 1.0)).alias("dcg"),
    )

    # IDCG@k = Σ_{i=1..min(k, n_gold)} 1/log2(i+1): closed over a literal
    # sequence — codegen, no join against a rank table
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_gold"))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )

    out = (
        per_q.na.fill({"n_hits": 0, "dcg": 0.0})
        .select(
            F.col("_q").alias(query_col),
            "n_gold",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_gold"), 6).alias("recall"),
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("precision"),
            (F.col("n_hits") > 0).cast("int").alias("hit"),
            F.round(
                F.when(F.col("first_rank").isNotNull(), 1.0 / F.col("first_rank"))
                .otherwise(0.0),
                6,
            ).alias("mrr"),
            F.round(F.col("dcg") / idcg, 6).alias("ndcg"),
        )
    )
    return out


def retrieval_summary(
    results: DataFrame,
    gold: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Corpus-level means of the per-query metrics (one row): the number a
    dashboard reports. Same join/agg pipeline plus a one-row final agg."""
    per_q = retrieval_metrics(results, gold, k, query_col, doc_col, rank_col)
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        *[F.round(F.avg(m), 6).alias(f"mean_{m}") for m in METRICS],
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Recall@k of an approximate index against the exact top-k (the
    ivf_recall sweep's statistic, distributed): the exact result's top-k IS
    the gold set, so recall = |approx@k ∩ exact@k| / k for every query with
    a full exact list. Returns the per-query frame of retrieval_metrics."""
    g = exact
    if rank_col in exact.columns:
        g = g.filter(F.col(rank_col) <= k)
    gold = g.select(query_col, doc_col)
    return retrieval_metrics(
        approx, gold, k, query_col=query_col, doc_col=doc_col, rank_col=rank_col
    )
