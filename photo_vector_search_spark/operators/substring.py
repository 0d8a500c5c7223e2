"""Exact repeated-span removal at n-gram resolution — the distributed form of
"exact substring deduplication" (Lee et al., Deduplicating Training Data
Makes Language Models Better): any token span of length ≥ n that occurs
``min_dup``+ times across the corpus is removed everywhere except one
canonical keeper occurrence.

Suffix-array machinery (the paper's single-node approach) does not
distribute; the n-gram formulation does, exactly, with three bounded steps:

1. **Gram pass** — per doc, md5 over each n-token window (128-bit keys: a
   64-bit hash would birthday-collide at web-corpus gram counts). One
   explode, O(tokens) rows.
2. **Hot set** — ``groupBy(gram)`` keeping groups with ≥ min_dup
   occurrences; the canonical keeper is ``min(doc_id, pos)`` so the result
   is deterministic under any partitioning. Keyed join back to occurrences
   (never broadcast — the hot set is corpus-sized in the worst case).
3. **Span mask** — per doc, the non-keeper hot starts form intervals
   ``[pos, pos+n-1]``; tokens under any interval are dropped via
   index-aware ``filter`` lambdas (pure Catalyst, no UDF).

A span of length L ≥ n duplicated across docs yields L-n+1 overlapping hot
grams whose union covers the whole span, so full passages vanish, not just
their first n tokens. NOT idempotent by design: removal can create new
adjacencies (also true of the suffix-array original at cut boundaries);
run-to-fixpoint if that matters. Whitespace is canonicalized by
tokenization (the same ``tokens()`` every text operator uses).

Reference scope note: the reference (photo_vector_search) has no text dedup
at all; this extends the mandated LLM-pipeline dedup family (exact /
MinHash / SimHash / fuzzy / embedding) down to sub-document granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 10,
    min_dup: int = 2,
    text_col: str = "text",
    staging_dir: str | None = None,
    stage: bool = True,
) -> DataFrame:
    """(doc_id, pos, gram_hash) for every NON-KEEPER occurrence of an n-gram
    seen ≥ min_dup times corpus-wide. ``pos`` is the 0-based token index of
    the window start. The keeper (global min (doc_id, pos) per gram) is
    excluded — it survives removal."""
    occ = _hot_occurrences(docs, n, min_dup, text_col, staging_dir, stage)
    return occ.filter(~F.col("is_keeper")).select(
        "doc_id", "pos", F.col("h").alias("gram_hash")
    )


def _gram_frame(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """One (doc_id, pos, h) row per n-token window — the O(tokens) explode."""
    toked = docs.select(
        "doc_id", F.array_remove(tokens(F.col(text_col)), "").alias("toks")
    )
    return toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        # single-space join is boundary-exact: tokens are
                        # whitespace-split and can never contain a space
                        # (any other separator byte could appear INSIDE a
                        # token and collide shifted boundaries)
                        F.md5(
                            F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n))
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))


def _hot_occurrences(
    docs: DataFrame,
    n: int,
    min_dup: int,
    text_col: str,
    staging_dir: str | None,
    stage: bool,
) -> DataFrame:
    """(doc_id, pos, h, is_keeper) for every occurrence of a hot (≥ min_dup)
    gram. The gram frame feeds TWO consumers — the hot-set aggregation and
    the occurrence probe join — so by default it is STAGED to parquet once
    (``operators.staging``; the ``shuffle_corpus`` pattern): the explode +
    md5, the operator's dominant cost at corpus scale, executes exactly once
    instead of once per consumer. ``stage=False`` opts out (re-derives the
    explode per consumer — only sensible for tiny inputs); an explicit
    ``staging_dir`` must outlive the returned DataFrame's consumers.

    Skew posture unchanged: the hot set stays a map-side-combinable groupBy
    (never a window over h — a mega-hot boilerplate gram would straggle a
    single window task) and the probe stays a keyed equi-join AQE can
    skew-split; the hot set is never broadcast-forced (corpus-sized in the
    worst case)."""
    grams = _gram_frame(docs, n, text_col)
    if stage:
        from photo_vector_search_spark.operators.staging import stage_frame

        grams = stage_frame(grams, "pvs_substring", staging_dir)
    hot = (
        grams.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("keeper"),
        )
        .filter(F.col("n_occ") >= min_dup)
    )
    return (
        grams.join(hot, "h")  # keyed equi-join: hot set is never driver-sized
        .select(
            "doc_id",
            "pos",
            "h",
            (
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("pos") == F.col("keeper.pos"))
            ).alias("is_keeper"),
        )
    )


def remove_repeated_ngrams(
    docs: DataFrame,
    n: int = 10,
    min_dup: int = 2,
    text_col: str = "text",
    staging_dir: str | None = None,
    stage: bool = True,
) -> DataFrame:
    """Remove every duplicated n-gram span (except its canonical keeper
    occurrence) from the corpus. Adds ``{text_col}_deduped`` (tokens joined
    by single spaces — tokenization canonicalizes whitespace/case) and
    ``n_removed_tokens``; all input columns pass through. NULL text stays
    NULL; docs shorter than ``n`` tokens pass through unchanged.

    KEEPER-SPAN PROTECTION: in a self-overlapping repeat (a run of
    identical tokens, '- - - -' chrome), the non-keeper windows' intervals
    overlap the keeper window itself; a token covered by a KEEPER interval
    therefore always survives, so the canonical occurrence is preserved
    verbatim even inside runs (the price: a non-keeper span that overlaps a
    keeper span in the same doc keeps the overlapping tokens).

    Plan shape: one gram explode (STAGED to parquet once — both its
    consumers, the hot-set agg and the probe join, read the staged copy, so
    the dominant O(tokens) pass executes exactly once) + one groupBy(gram) +
    one keyed join + ONE groupBy(doc_id) collecting that doc's hot and
    keeper starts together (``collect_list`` skips NULLs, so one aggregation
    splits the flagged occurrences; bounded by the doc's own length) + an
    index-lambda filter — no UDF, no broadcast of anything corpus-sized,
    nothing driver-side. ``stage=False`` opts out of staging (tiny inputs);
    an explicit ``staging_dir`` must outlive the returned DataFrame."""
    occ = _hot_occurrences(docs, n, min_dup, text_col, staging_dir, stage)
    doc_marks = occ.groupBy("doc_id").agg(
        F.collect_list(F.when(~F.col("is_keeper"), F.col("pos"))).alias("_hot_starts"),
        F.collect_list(F.when(F.col("is_keeper"), F.col("pos"))).alias("_keep_starts"),
    )
    out = (
        docs.join(doc_marks, "doc_id", "left")
        .withColumn(
            "_keep_starts",
            F.coalesce(F.col("_keep_starts"), F.array().cast("array<int>")),
        )
        .withColumn("_toks", F.array_remove(tokens(F.col(text_col)), ""))
        .withColumn(
            "_kept",
            F.when(F.col(text_col).isNull(), F.lit(None))
            .when(F.col("_hot_starts").isNull(), F.col("_toks"))
            .otherwise(
                F.filter(
                    F.col("_toks"),
                    lambda _x, j: ~F.exists(
                        F.col("_hot_starts"),
                        lambda p: (p <= j) & (j <= p + (n - 1)),
                    )
                    | F.exists(
                        F.col("_keep_starts"),
                        lambda q: (q <= j) & (j <= q + (n - 1)),
                    ),
                )
            ),
        )
        .withColumn(
            f"{text_col}_deduped", F.concat_ws(" ", F.col("_kept"))
        )
        .withColumn(
            f"{text_col}_deduped",
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.col(f"{text_col}_deduped")
            ),
        )
        .withColumn(
            "n_removed_tokens",
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.size("_toks") - F.size("_kept")
            ),
        )
        .drop("_hot_starts", "_keep_starts", "_toks", "_kept")
    )
    return out
