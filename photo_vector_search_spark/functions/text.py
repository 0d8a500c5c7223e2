"""Text-analysis column functions (SURVEY §2.10 — LLM-pipeline operators).

All JVM-side built-ins (no Python UDFs in these hot paths) and all portable to the
DuckDB oracle: every function here has an exact SQL twin used in plans/*.

The reference's only text artifacts are the Ollama descriptions and their
`.strip()` (photo_vector_search.py:77); these operators are the north-star
extensions over the `documents` corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny English stopword list — fixed, shared verbatim with the SQL oracle twin
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text — \\s+ class, not a literal
    space: newlines/tabs/space-runs would otherwise merge words or inject
    empty-string tokens into every downstream text operator. DuckDB twin:
    ``regexp_split_to_array(lower(trim(text)), '\\s+')``."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams in order (with repeats), joined by single spaces.

    Guarded for short inputs: Spark's ``sequence(1, 0)`` is DESCENDING ``[1, 0]``
    (not empty like DuckDB's generate_series), which would feed ``slice`` a zero
    start and error under ANSI — docs with fewer than ``n`` tokens must
    short-circuit to an empty array explicitly."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(grams)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (order-insensitive set)."""
    return F.array_distinct(word_ngrams(toks, n))


def hash32(s: Column) -> Column:
    """Deterministic 32-bit hash portable across engines: first 8 hex chars of md5.
    (Spark's xxhash64/crc32 have no DuckDB twin; md5 prefixes do.)"""
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, punctuation singletons —
    the regex is RE2/Java-compatible so Spark and DuckDB agree."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword presence +
    token-length sanity (the classic cheap pre-filters before LLM training)."""
    toks = tokens(text)
    n = F.size(toks)
    len_ok = F.when((n >= 20) & (n <= 400), 1.0).otherwise(0.5)
    sw = stopword_ratio(toks)
    sw_ok = F.when((sw > 0.01) & (sw < 0.6), 1.0).otherwise(0.5)
    atl = avg_token_len(toks)
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_ok + sw_ok + atl_ok) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """N-gram-free heuristic language ID: English stopword density vs non-ASCII
    density. Deterministic and SQL-twinned; a real model would slot in as a pandas
    UDF behind the same column contract."""
    toks = tokens(text)
    sw = stopword_ratio(toks)
    # whitespace controls (\t \n \r) are ASCII formatting, not foreign script —
    # excluding them from the class would tag line-broken English as non_latin
    non_ascii = F.length(F.regexp_replace(text, r"[ -~\t\n\r]", ""))
    return (
        F.when(non_ascii > F.length(text) * 0.3, "non_latin")
        .when(sw >= 0.05, "en")
        .otherwise("unknown")
    )


def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.md5(norm.cast("binary"))
