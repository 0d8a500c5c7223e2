"""Cascade (multi-stage) ANN serving: 1-bit Hamming shortlist → SQ8
asymmetric rerank → exact float rerank — the production retrieval funnel
that reads the cheapest representation first and touches floats only for
a bounded candidate pool (the FAISS/ScaNN two-level rerank pattern,
composed here from the engine's own ladder rungs `operators/bq` and
`operators/sq`).

Why a cascade at 100 TB: the 1-bit codes are 64× smaller than float64 and
their scan is pure whole-stage codegen (`bit_count(code XOR q)` into
TakeOrderedAndProject — zero exchanges, zero Python); SQ8 then re-scores
only the c1-row shortlist (broadcast-size join against the 8× codes); the
exact pass reads c2 float rows. Total float bytes read: c2 vectors,
regardless of corpus size.

Pool semantics are MONOTONE: widening c1/c2 can only improve the final
top-k (candidate supersets), and c1 = c2 = N reproduces exact knn bit for
bit — both pinned in tests/test_cascade.py.

``prefilter`` (an arbitrary boolean Column over the BQ frame's columns)
applies at the FIRST stage — the filtered-search discipline: filtering
after shortlisting collapses recall for selective predicates, filtering
before the cheapest scan costs nothing (it rides the same codegen stage).

Cf. reference scope: the reference's single HNSW index serves raw floats
(photo_vector_search.py:17-20); this is the storage/serving-axis extension
of the mandated similarity-search family (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bq import BQModel, hamming_expr, encode_query, load_bq_store
from .sq import SQ8Model, load_sq8_store, sq8_topk


def cascade_topk(
    coded_bq: DataFrame,
    bq_model: BQModel,
    coded_sq8: DataFrame,
    sq8_model: SQ8Model,
    source: DataFrame,
    query_vec,
    k: int = 5,
    c1: int = 200,
    c2: int = 50,
    prefilter: Column | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Three-stage cascade top-k — (vec_id, label, dist, rank) with the
    EXACT cosine distance of the final pass (the sq8_topk rerank contract).
    ``coded_bq``/``coded_sq8`` carry (vec_id, label, bq)/(vec_id, label,
    sq8); ``source`` carries the floats for the exact tail. Pools must
    nest: k ≤ c2 ≤ c1."""
    if not k >= 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not k <= c2 <= c1:
        raise ValueError(f"pools must nest: k={k} <= c2={c2} <= c1={c1}")
    qwords = encode_query(bq_model, query_vec)
    stage1 = coded_bq.filter(F.col("bq").isNotNull())
    if prefilter is not None:
        stage1 = stage1.filter(prefilter)
    shortlist = (
        stage1.select("vec_id", hamming_expr("bq", qwords).alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(c1)
        .select("vec_id")
    )
    pool_sq8 = coded_sq8.join(F.broadcast(shortlist), "vec_id")
    return sq8_topk(
        pool_sq8,
        sq8_model,
        query_vec,
        k=k,
        rerank=c2,
        vec_col=vec_col,
        rerank_source=source,
    )


def cascade_store_topk(
    spark,
    bq_path: str,
    sq8_path: str,
    source: DataFrame,
    query_vec,
    k: int = 5,
    c1: int = 200,
    c2: int = 50,
    prefilter: Column | None = None,
) -> DataFrame:
    """One-call cascade over the two PERSISTED code stores (each loaded
    under its own crash-consistency contract — a torn pair in either store
    refuses the whole cascade). The at-rest serving shape: 1-bit codes
    scanned, 8-bit codes read for c1 rows, floats for c2."""
    coded_bq, bq_model = load_bq_store(spark, bq_path)
    coded_sq8, sq8_model = load_sq8_store(spark, sq8_path)
    return cascade_topk(
        coded_bq,
        bq_model,
        coded_sq8,
        sq8_model,
        source,
        query_vec,
        k=k,
        c1=c1,
        c2=c2,
        prefilter=prefilter,
    )
