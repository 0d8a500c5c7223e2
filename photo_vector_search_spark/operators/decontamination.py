"""Span-level benchmark decontamination (GPT-3 appendix C / PaLM style).

The doc-level operators (`plans/text_queries.q_decontaminate`,
`operators/bloom.decontaminate_bloom`) DROP any training document that
overlaps the benchmark. For long documents that is needlessly destructive —
a 50k-token book containing one quoted benchmark question loses 50k tokens.
The span rung instead removes every contaminated n-gram WINDOW and keeps the
clean fragments between them as separate training rows, the policy GPT-3
used for its training-set cleanup (13-gram windows, fragments shorter than a
floor discarded).

Reference parity note: the reference repo has no text-corpus surface at all
(it is a photo search CLI, photo_vector_search.py:1-153); this module is
part of the SURVEY §2.10 north-star extension family (benchmark
decontamination), extending the doc-level rung that already ships.

Scale design (100 TB):
- Benchmark n-grams are DISTINCT over a benchmark, and benchmarks are tiny
  by construction (eval sets, not corpora) — the gram set is broadcast, so
  hit detection is a map-only pass over the corpus gram explode: no
  corpus-sized shuffle to find contamination.
- Hit positions are SPARSE (contamination is the exception). They aggregate
  per doc via a map-side-combinable ``collect_list`` — the shuffle moves
  only (doc_id, position) hit rows, never text.
- The fragment rebuild joins the tiny per-doc hit table back to the corpus;
  AQE sizes that join at runtime (broadcast when hits are small — the
  common case — so the corpus again does not shuffle). Untouched docs pass
  through with their text VERBATIM (same contract as the curation substring
  stage).
- Equal-length windows make the clean-fragment complement closed-form: for
  sorted hit starts s_1..s_m with window n, interval ends are also sorted,
  so the complement of ∪[s_i, s_i+n) is exactly [0, s_1) ∪ [s_i+n, s_{i+1})
  ∪ [s_m+n, L) with empty gaps dropping out — no interval-merge fold, no
  per-doc quadratic accumulator, all JVM-side array expressions.
- Both rungs (fragment rows / in-place rewrite) share ONE hit-detection and
  gap-complement implementation (``_hits_and_gaps``), and each emits its
  output from a SINGLE branch — a union of filtered branches would
  re-execute the corpus-sized gram explode once per branch (caught in the
  r8 plan audit: the fused plan is 2 exchanges / 1 explode, down from 4/2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens, word_ngrams


def benchmark_ngrams(benchmark: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Distinct lowercased word n-grams of the benchmark set — the
    (broadcastable) contamination dictionary. Matching is case-insensitive
    and whitespace-normalized: quoting a benchmark question with different
    casing or line wrapping is still contamination."""
    return (
        benchmark.select(
            F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("gram")
        )
        .distinct()
    )


def _hits_and_gaps(
    toks: DataFrame,
    benchmark: DataFrame,
    n: int,
    min_fragment_tokens: int,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, Column, Column]:
    """The shared core of both rungs: ``toks`` (any frame carrying a
    ``_toks`` case-preserving token array) left-joined with each doc's
    sorted hit starts (``_starts``), plus the closed-form clean-gap
    complement and the NULL-safe token length.

    Matching tokenization = lower() of the SAME ``_toks`` array, so gram
    positions index it identically. NULL text → NULL ``_toks``, whose
    size() is NULL (ANSI) or -1 (legacy) — clamped to 0 so a NULL doc's
    untouched fragment is (0, 0), never garbage negative-length rows."""
    bench = F.broadcast(benchmark_ngrams(benchmark, n, text_col=text_col))
    grams = toks.select(
        id_col,
        F.posexplode(
            word_ngrams(F.transform(F.col("_toks"), F.lower), n)
        ).alias("pos", "gram"),
    )
    hits = (
        grams.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_starts"))
    )
    marked = toks.join(hits, id_col, "left")
    m = F.size("_starts")
    length = F.coalesce(F.greatest(F.size("_toks"), F.lit(0)), F.lit(0))
    # gap i (0-based, i = 0..m): [prev window end, next hit start)
    gap_frags = F.filter(
        F.transform(
            F.sequence(F.lit(0), m),
            lambda i: F.struct(
                F.when(i == 0, F.lit(0))
                .otherwise(F.element_at("_starts", i) + n)
                .alias("lo"),
                F.when(i == m, length)
                .otherwise(F.element_at("_starts", i + 1))
                .alias("hi"),
            ),
        ),
        # max(…, 1) also drops the negative-length pseudo-gaps that
        # overlapping hits produce (hi < lo) — the closed-form complement's
        # only artifact
        lambda g: (g.hi - g.lo) >= F.lit(max(min_fragment_tokens, 1)),
    )
    return marked, gap_frags, length


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_fragment_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every length-``n`` token window of ``docs`` that appears (as a
    lowercased n-gram) anywhere in ``benchmark``; return the clean fragments.

    Output: one row per surviving fragment —
    ``(id_col, frag_idx int, n_tokens int, text string)``. Documents with no
    contamination yield one fragment (``frag_idx = 0``) whose text is the
    original string VERBATIM (whitespace and all; NULL text yields one
    ``(0, 0, NULL)`` fragment). Contaminated documents are split at the
    removed windows; fragments shorter than ``min_fragment_tokens`` are
    discarded (GPT-3's floor), and fragment text is rebuilt from the doc's
    whitespace tokens joined by single spaces — case PRESERVED (only the
    match is case-insensitive), whitespace normalized (token space is the
    operator's working resolution).

    Exactness: matching tokenization and reconstruction tokenization both
    split the same trimmed text on ``\\s+``, so gram positions index both
    arrays identically; the complement construction in the module docstring
    covers overlapping and adjacent hits without an interval-merge fold.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select(
        id_col,
        text_col,
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    marked, gap_frags, length = _hits_and_gaps(
        toks, benchmark, n, min_fragment_tokens, id_col, text_col
    )
    # ONE branch for clean and split docs — a union of filtered branches
    # would re-execute the whole hits subtree (the corpus-sized gram
    # explode) once per branch, the exact double-execution the plan audit
    # exists to catch. Clean docs are the degenerate single-fragment case
    # (no floor: untouched docs pass verbatim regardless of length).
    untouched = F.col("_starts").isNull()
    frags = F.when(
        untouched,
        F.array(F.struct(F.lit(0).alias("lo"), length.alias("hi"))),
    ).otherwise(gap_frags)
    return marked.select(
        id_col,
        text_col,
        "_toks",
        untouched.alias("_untouched"),
        F.posexplode(frags).alias("frag_idx", "_g"),
    ).select(
        id_col,
        "frag_idx",
        (F.col("_g.hi") - F.col("_g.lo")).alias("n_tokens"),
        F.when(F.col("_untouched"), F.col(text_col))
        .otherwise(
            F.array_join(
                F.slice(
                    "_toks", F.col("_g.lo") + 1, F.col("_g.hi") - F.col("_g.lo")
                ),
                " ",
            )
        )
        .alias("text"),
    )


def decontaminate_rewrite(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_fragment_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-granularity-preserving rung of ``decontaminate_spans`` for
    pipelines keyed on a unique ``id_col`` (curation): instead of splitting
    a contaminated document into fragment ROWS, remove the contaminated
    windows (and sub-floor fragment shrapnel) in place and keep ONE row per
    surviving document — the same contract as the curation substring stage:
    untouched docs keep their text VERBATIM; rewritten docs get the
    token-joined surviving fragments (case preserved, whitespace
    normalized, removed spans collapsed to a single space — the accepted
    false-adjacency tradeoff of in-place removal). Documents whose every
    fragment falls below ``min_fragment_tokens`` are dropped.

    All non-text columns pass through. Adds ``n_removed_tokens`` (0 for
    untouched docs) so callers can count rewrites and removed volume.
    Same matching, hit aggregation, and closed-form gap complement as
    ``decontaminate_spans`` (shared ``_hits_and_gaps``) — see the module
    docstring for the 100 TB shape."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.withColumn("_toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    marked, frags, length = _hits_and_gaps(
        toks, benchmark, n, min_fragment_tokens, id_col, text_col
    )
    kept = F.aggregate(
        frags, F.lit(0), lambda acc, g: acc + (g.hi - g.lo)
    )
    rebuilt = F.array_join(
        F.transform(
            frags,
            lambda g: F.array_join(
                F.slice("_toks", g.lo + 1, g.hi - g.lo), " "
            ),
        ),
        " ",
    )
    out_cols = [
        F.when(F.col("_starts").isNull(), F.col(c))
        .otherwise(rebuilt)
        .alias(c)
        if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return (
        marked.withColumn("_kept", kept)
        .filter(F.col("_starts").isNull() | (F.col("_kept") > 0))
        .select(
            *out_cols,
            F.when(F.col("_starts").isNull(), F.lit(0))
            .otherwise(length - F.col("_kept"))
            .alias("n_removed_tokens"),
        )
    )
