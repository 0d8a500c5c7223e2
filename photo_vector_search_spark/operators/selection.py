"""Token-budget corpus selection: keep the best-scored documents whose
token counts fill an exact budget — the "take the top-quality 1T tokens"
step every curation pipeline ends with (DSIR §5 selects top-k by importance
weight; Dolma/FineWeb release budget-sized cuts ranked by quality signals).

Semantics (total order, engine-portable): rank documents by
``(score DESC|ASC, NULLs last, id ASC)`` and keep the maximal prefix whose
cumulative token count stays ``<= budget_tokens``. A document is either
wholly in or wholly out — no partial docs; the first doc that would cross
the budget (and everything after it) is dropped, even if a later, smaller
doc would still have fit (strict-prefix semantics keep the output a pure
function of the order, replayable by any engine's window cumsum).

Scale shape (100 TB): the textbook form — one GLOBAL window cumsum — has a
single-reducer sort and dies at scale. This operator instead:

1. sketches ``n_buckets`` score cut points (``approx_percentile``, one
   map-side-combinable pass);
2. aggregates per-bucket token totals (second map-side-combinable pass,
   <= n_buckets+2 rows collected);
3. classifies each bucket on the driver: buckets whose running offset +
   total fit the budget are FULLY IN (kept map-only, no exchange), buckets
   past the crossing are FULLY OUT (dropped map-only) — only the single
   BOUNDARY bucket (~N/n_buckets rows) is exchanged for a within-bucket
   cumsum window seeded with the broadcast offset.

The one exchange therefore carries ~N/n_buckets rows regardless of where
the budget lands. Cut quality affects only performance, never the result:
any bucketing yields the same kept set because the within-bucket walk uses
the same total order. Degenerate skew (a huge mass of EQUAL scores at the
boundary) widens the boundary bucket — equal scores cannot be split by a
score cut — and degrades toward the global window; that is data-degenerate
(a score column with ties spanning the budget crossing), documented rather
than salted, because the tie-break walk (id order) is inherently
sequential in token space.

Cf. reference scope: the reference (rianders/photo-vector-search,
photo_vector_search.py) has no corpus-curation surface — this is part of
the mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def _bucket_of(sort_key: Column, cuts: list[float], n_buckets: int) -> Column:
    """Bucket index of ``sort_key`` against ascending ``cuts`` — the count
    of cuts <= key, computed as one codegen'd filter+size over the literal
    cut array (n_buckets is small; no join, no UDF). NULL keys (unscored
    docs, ordered last) land in the dedicated final bucket."""
    if not cuts:
        return F.when(sort_key.isNull(), F.lit(1)).otherwise(F.lit(0))
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    idx = F.size(F.filter(arr, lambda c: c <= sort_key))
    return F.when(sort_key.isNull(), F.lit(len(cuts) + 1)).otherwise(idx)


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    score_col: str = "score",
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    ascending: bool = False,
    n_buckets: int = 256,
) -> DataFrame:
    """Keep the maximal best-first prefix of ``docs`` whose cumulative
    token count is <= ``budget_tokens``.

    ``ascending=False`` (default) keeps the HIGHEST scores first (quality
    scores); ``ascending=True`` keeps the LOWEST first (perplexities —
    compose with ``doc_log_perplexity_kn`` / the add-k LM). NULL scores
    order last in both walks (an unscoreable doc is only taken once every
    scored doc is). Tokens come from ``token_col`` when given, else
    ``token_count(text_col)``; NULL counts cost 0 (the mix_corpus
    convention — a NULL text has no tokens to spend). A caller-supplied
    ``token_col`` must be non-negative — the prefix walk relies on the
    cumulative sum being monotone.

    Returns the kept rows with the input schema (no helper columns) —
    selection is a filter, so downstream lineage and pushdowns survive.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    tok_src = (
        F.col(token_col) if token_col is not None else token_count(F.col(text_col))
    )
    tok = F.coalesce(tok_src.cast("long"), F.lit(0))
    # unified ASCENDING walk: negate for the descending (best-is-highest)
    # default so every downstream step orders one way only
    score = F.col(score_col).cast("double")
    sort_key = score if ascending else -score

    d = docs.withColumn("_bs_tok", tok).withColumn("_bs_key", sort_key)

    # pass 1: score cuts. approx_percentile ignores NULLs; a corpus with no
    # scored doc at all yields NULL cuts -> single bucket (exact, global
    # window over the NULL tier only, which the walk orders by id anyway).
    cuts: list[float] = []
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        row = d.agg(
            F.percentile_approx("_bs_key", probs, 10_000).alias("c")
        ).first()
        if row["c"] is not None:
            # dedup preserves correctness (equal cuts create empty buckets)
            seen: list[float] = []
            for c in row["c"]:
                if c is not None and (not seen or c > seen[-1]):
                    seen.append(float(c))
            cuts = seen

    d = d.withColumn("_bs_b", _bucket_of(F.col("_bs_key"), cuts, len(cuts)))

    # pass 2: per-bucket token totals (<= len(cuts)+2 rows on the driver)
    totals = {
        r["_bs_b"]: r["t"]
        for r in d.groupBy("_bs_b").agg(F.sum("_bs_tok").alias("t")).collect()
    }
    offset = 0
    full_in: list[int] = []
    boundary: int | None = None
    boundary_offset = 0
    for b in sorted(totals):
        t = totals[b] or 0
        if offset + t <= budget_tokens:
            full_in.append(b)
        elif boundary is None:
            boundary = b
            boundary_offset = offset
        # buckets after the boundary are fully out: even an all-zero-token
        # run cannot precede the crossing doc in the walk... unless it IS
        # zero-cost. Zero-token docs in later buckets rank after the
        # crossing doc and are dropped by strict-prefix semantics.
        else:
            break
        offset += t

    base_cols = docs.columns
    kept_full = d.filter(F.col("_bs_b").isin(full_in)) if full_in else None

    if boundary is None:
        out = kept_full if kept_full is not None else d.limit(0)
        return out.select(*base_cols)

    # boundary bucket: the ONE exchange — within-bucket cumsum seeded with
    # the driver offset, over ~N/n_buckets rows
    w = (
        Window.partitionBy("_bs_b")
        .orderBy(
            F.col("_bs_key").asc_nulls_last(), F.col(id_col).asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_boundary = (
        d.filter(F.col("_bs_b") == boundary)
        .withColumn("_bs_cum", F.sum("_bs_tok").over(w) + F.lit(boundary_offset))
        .filter(F.col("_bs_cum") <= budget_tokens)
    )
    out = (
        kept_boundary.select(*base_cols)
        if kept_full is None
        else kept_full.select(*base_cols).unionByName(
            kept_boundary.select(*base_cols)
        )
    )
    return out
