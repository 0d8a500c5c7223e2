"""Heavy hitters via Misra–Gries summaries (Misra & Gries 1982; the
merge-bound analysis of Agarwal et al., "Mergeable Summaries", PODS'12) —
frequent-item discovery whose memory and shuffle are bounded by the
summary CAPACITY, not the vocabulary.

The exact form of "top tokens" (explode → groupBy token → global sort)
shuffles the whole vocabulary — at 100 TB that is billions of distinct
grams moving to the reducers. The MG form keeps at most ``capacity``
counters per Arrow batch (computed vectorized from the batch's exact
counts: keep the top ``capacity`` items minus the (capacity+1)-th count —
the standard exact-counts construction of an MG summary, same guarantee
as the streaming decrement rule), emits ≤ capacity tiny (item, est) rows
per batch plus ONE residual row, and merges by plain summation:

    est(x)  ≤  true_count(x)  ≤  est(x) + residual_total,
    residual_total  ≤  N / (capacity + 1),

so every item with true frequency above N/(capacity+1) is GUARANTEED
present (no false negatives above the threshold), and every reported
count carries a deterministic error interval — not a probabilistic
sketch. Shuffle: O(batches · capacity) rows, independent of vocabulary
and corpus size.

Complements the exact rungs kept in the declared surface
(tfidf_top_terms, retired vocab_top_tokens): same question, the
bounded-memory answer a 100 TB corpus requires.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summaries(
    df: DataFrame, col: str, capacity: int = 256
) -> DataFrame:
    """Per-batch Misra–Gries summaries: ≤ ``capacity`` rows
    (item, est) per Arrow batch plus one residual row (item NULL,
    est = the batch's subtracted threshold · its drop mass upper bound).
    NULL items are ignored (the token-discipline convention). Map-only —
    the caller aggregates."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf[col].dropna()
            if not len(vals):
                continue
            counts = vals.value_counts()  # exact within the batch
            if len(counts) > capacity:
                t = int(counts.iloc[capacity])
                kept = counts.iloc[:capacity] - t
                kept = kept[kept > 0]
            else:
                t = 0
                kept = counts
            out = pd.DataFrame(
                {"item": kept.index.astype(str), "est": kept.to_numpy("int64")}
            )
            if t > 0:
                out = pd.concat(
                    [out, pd.DataFrame({"item": [None], "est": [t]})],
                    ignore_index=True,
                )
            yield out

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _summarize, schema="item string, est long"
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """Top-``k`` frequent values of ``col`` with deterministic count
    bounds — (item, est_count, max_count), est_count ≤ true ≤ max_count,
    ordered by est_count desc then item asc. ``capacity`` trades summary
    size for tightness: the global error (max_count − est_count) is the
    sum of per-batch residuals, ≤ N/(capacity+1). Every item with true
    count above that error is guaranteed to appear in the summary.

    Plan: one map-only summary pass, ONE groupBy over ≤ batches·capacity
    tiny rows, TakeOrdered top-k — the vocabulary never shuffles."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    summ = mg_summaries(df, col, capacity=capacity)
    merged = summ.groupBy("item").agg(F.sum("est").alias("est_count"))
    items = merged.filter(F.col("item").isNotNull())
    resid = merged.filter(F.col("item").isNull()).select(
        F.coalesce(F.first("est_count"), F.lit(0)).alias("_resid")
    )
    return (
        items.crossJoin(F.broadcast(resid))
        .select(
            "item",
            "est_count",
            (F.col("est_count") + F.col("_resid")).alias("max_count"),
        )
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(k)
    )


def heavy_hitter_tokens(
    docs: DataFrame,
    k: int = 20,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Frequent TOKENS of a document corpus — the bounded-memory form of
    the vocab-top-tokens question: explode stays map-side (it feeds the
    summarizer in the same stage), and only summary rows ever shuffle."""
    from ..functions.text import tokens

    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.explode(F.array_remove(tokens(F.col(text_col)), "")).alias("_tok")
    )
    return heavy_hitters(toks, "_tok", k=k, capacity=capacity)
