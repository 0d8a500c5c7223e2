"""Late-interaction (MaxSim) retrieval — the ColBERT scoring family
(Khattab & Zaharia, SIGIR'20): score(q, d) = Σ_{t∈q} max_{j∈d}
⟨q_t, d_j⟩ over per-TOKEN embeddings, so a document matches when each
query token finds its own best-matching document token — finer-grained
than one pooled vector (which averages a long document's topics away),
cheaper than a cross-encoder.

This completes the retrieval-family matrix: lexical (`operators/bm25`),
dense single-vector (knn/ivf/pq/sq/bq ladder), hybrid fusion
(`operators/fusion`), and now late interaction — with the standard
two-stage serving composition (`maxsim_search(prefilter_n=...)`): a
pooled single-vector top-N candidate pass first, MaxSim re-scoring only
the candidates (the ColBERT-v2 / PLAID deployment shape).

Engine shape:
- token embeddings ride as one ``array<array<double>>`` per document
  (token budget capped — the ColBERT doc-length budget — so the matrix
  is bounded); built once by `doc_token_embeddings` (explode → the
  Arrow stub-embed kernel → collect back in token order).
- scoring is PURE CODEGEN: both sides are unit vectors (the stub embeds
  L2-normalize; CLIP/ColBERT convention), so sim = dot product, and the
  whole MaxSim is an unrolled fold — per query token an
  ``aggregate(tok_embs, -inf, greatest(acc, zip_with-dot))`` — no UDF,
  no shuffle before the final TakeOrdered top-k.
- at scale the brute-force pass reads every doc's token matrix once
  (map-only into TakeOrdered); ``prefilter_n`` bounds that to N
  candidates chosen by the pooled single-vector rung.

NULL discipline: docs with NULL/empty token matrices never rank; query
text must tokenize to ≥1 token.

DuckDB twin: the same per-token stub embeddings + list_max/list_dot
fold, value-checked in tests/test_late_interaction.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_DOC_TOKENS = 16
MAX_QUERY_TOKENS = 8


def doc_token_embeddings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = MAX_DOC_TOKENS,
    dim: int = 64,
) -> DataFrame:
    """(id, tok_embs) — per-token stub embeddings for the first
    ``max_tokens`` tokens (the ColBERT document budget), kept in token
    order. One explode → Arrow embed kernel → one keyed collect-back;
    each document's matrix is bounded by max_tokens · dim doubles."""
    from ..functions.text import tokens
    from ..pipelines.embed import with_stub_embedding

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.slice(F.array_remove(tokens(F.col(text_col)), ""), 1, max_tokens)
        ).alias("_pos", "_tok"),
    )
    embedded = with_stub_embedding(toks, "_tok", out_col="_temb", dim=dim)
    return (
        embedded.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_temb"))
                ),
                lambda s: s["_temb"].cast("array<double>"),
            ).alias("tok_embs")
        )
    )


def _query_token_vecs(query: str, max_query_tokens: int, dim: int):
    # raw ordered split, duplicates KEPT — ColBERT scores every query
    # token occurrence (unlike bm25.query_terms' distinct set)
    from ..pipelines.embed import stub_embed_one

    qtoks = [
        t
        for t in str(query).strip().lower().split()
        if t
    ][:max_query_tokens]
    if not qtoks:
        raise ValueError("query has no tokens")
    return [stub_embed_one(t, dim=dim) for t in qtoks]


def maxsim_scores(
    doc_toks: DataFrame,
    query: str,
    id_col: str = "doc_id",
    max_query_tokens: int = MAX_QUERY_TOKENS,
    dim: int = 64,
) -> DataFrame:
    """(id, maxsim rounded 6dp): Σ over query tokens of the best doc-token
    dot product — unrolled codegen fold, zero exchanges. Docs with empty
    or NULL token matrices never score."""
    qvecs = _query_token_vecs(query, max_query_tokens, dim)

    def _dot(x: Column, qlit) -> Column:
        return F.aggregate(
            F.zip_with(x, qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    total = F.lit(0.0)
    for qv in qvecs:
        qlit = F.array(*[F.lit(float(v)) for v in qv])
        best = F.aggregate(
            F.col("tok_embs"),
            F.lit(float("-inf")),
            lambda acc, x: F.greatest(acc, _dot(x, qlit)),
        )
        total = total + best
    return (
        doc_toks.filter(
            F.col("tok_embs").isNotNull() & (F.size("tok_embs") > 0)
        )
        .select(id_col, F.round(total, 6).alias("maxsim"))
    )


def maxsim_topk(
    doc_toks: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    max_query_tokens: int = MAX_QUERY_TOKENS,
    dim: int = 64,
) -> DataFrame:
    """Top-k by MaxSim — (id, maxsim, rank), ties by ascending id;
    TakeOrderedAndProject (the knn ordering discipline)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scores = maxsim_scores(
        doc_toks, query, id_col=id_col,
        max_query_tokens=max_query_tokens, dim=dim,
    )
    top = scores.orderBy(F.col("maxsim").desc(), F.col(id_col).asc()).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("maxsim").desc(), F.col(id_col).asc())
        ),
    ).select(id_col, "maxsim", "rank")


def maxsim_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    prefilter_n: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = MAX_DOC_TOKENS,
    max_query_tokens: int = MAX_QUERY_TOKENS,
    dim: int = 64,
) -> DataFrame:
    """One-call text → MaxSim top-k. ``prefilter_n`` turns on the two-stage
    shape: a POOLED single-vector cosine pass picks N candidates (mean of
    the doc's token embeddings vs the mean query token vector — cheap,
    map-only into TakeOrdered), and MaxSim re-scores only those — the
    ColBERT-v2/PLAID deployment pattern. ``prefilter_n=None`` scores the
    whole corpus (exact MaxSim; with prefilter_n >= corpus size the
    two-stage result equals it exactly, pinned in tests)."""
    import numpy as np

    doc_toks = doc_token_embeddings(
        docs, text_col=text_col, id_col=id_col,
        max_tokens=max_tokens, dim=dim,
    )
    if prefilter_n is not None:
        if prefilter_n < k:
            raise ValueError(
                f"prefilter_n ({prefilter_n}) must be >= k ({k})"
            )
        qvecs = np.asarray(
            _query_token_vecs(query, max_query_tokens, dim), dtype=float
        )
        qmean = qvecs.mean(axis=0)
        qlit = F.array(*[F.lit(float(v)) for v in qmean])
        # pooled doc vector = mean of token embeddings (codegen fold)
        dim_n = F.size(F.element_at("tok_embs", 1))
        pooled = F.transform(
            F.sequence(F.lit(1), dim_n),
            lambda i: F.aggregate(
                F.col("tok_embs"),
                F.lit(0.0),
                lambda acc, x: acc + F.element_at(x, i),
            )
            / F.size("tok_embs"),
        )
        dot = F.aggregate(
            F.zip_with(pooled, qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cands = (
            doc_toks.filter(
                F.col("tok_embs").isNotNull() & (F.size("tok_embs") > 0)
            )
            .select(id_col, "tok_embs", dot.alias("_pool"))
            .orderBy(F.col("_pool").desc(), F.col(id_col).asc())
            .limit(prefilter_n)
            .drop("_pool")
        )
        doc_toks = cands
    return maxsim_topk(
        doc_toks, query, k=k, id_col=id_col,
        max_query_tokens=max_query_tokens, dim=dim,
    )
