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

    Built as a zip of ``n`` shifted array slices (``n`` O(size) slices per
    doc) rather than a per-position ``transform(sequence, i -> slice(toks,
    i, n))`` — the per-position form allocates one slice per GRAM and
    measured ~6x slower on the sf0.1 corpus (r7; value-identical, asserted
    in tests). Each slice start j+1 with length size-n+1 stays in bounds by
    construction, so nothing trips ANSI mode.

    Guarded for short inputs: docs with fewer than ``n`` tokens
    short-circuit to an empty array explicitly (matching DuckDB's empty
    ``generate_series``)."""
    length = F.size(toks) - F.lit(n - 1)
    grams = F.slice(toks, 1, length)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, length),
            lambda a, b: F.concat_ws(" ", a, b),
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


def md5_uniform(seed: int, key: Column) -> Column:
    """Seeded uniform draw in (0, 1]: first 12 hex chars of
    ``md5(seed || '-' || key)`` scaled by 16^12 (shifted by 1 so 0 is
    excluded — safe under log/pow transforms). The engine-portable,
    PARTITIONING-INVARIANT replacement for seeded ``rand()`` (whose streams
    are per-partition-seeded, so a repartition changes every draw) — the
    same hashing discipline as ``hash32`` and the shuffle/sample buckets,
    widened to 48 bits for use as a probability."""
    h = F.md5(F.concat_ws("-", F.lit(str(seed)), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**12))


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


# ------------------------------------------------- Gopher-style quality gates
#
# The repetition/length/symbol heuristics from Gopher's data pipeline
# (Rae et al. 2021, "Scaling Language Models", table A1) re-expressed as
# codegen-level column predicates. Thresholds are the published defaults;
# every rule stays in the RE2 ∩ Java regex subset so the DuckDB twin
# (``gopher_flags_sql``) runs the IDENTICAL rules — value-verified in
# tests/test_gopher.py. Like ``quality_score`` these are the cheap
# pre-filters; model-based quality classifiers slot in behind the same
# column contract.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1  # '#' and ellipsis per word
GOPHER_MAX_BULLET_RATIO = 0.9  # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_RATIO = 0.3  # lines ending with an ellipsis
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8  # words containing >=1 letter
GOPHER_MIN_STOPWORD_HITS = 2  # distinct required stopwords present

_SYMBOL_PATTERN = r"#|\.\.\."
_BULLET_PATTERN = r"^\s*[-*•]"
_ELLIPSIS_PATTERN = r"\.\.\.\s*$"

# the exact columns gopher_flags emits — callers that add-then-drop the flags
# (pipelines/curation.py) must drop THESE names, never a "g_" prefix match
# that would silently destroy user columns like g_score
GOPHER_FLAG_COLUMNS = (
    "g_words",
    "g_mean_word_len",
    "g_symbol_ratio",
    "g_bullet_ratio",
    "g_ellipsis_ratio",
    "g_alpha_words",
    "g_stopwords",
    "gopher_pass",
)


def gopher_flags(text: Column) -> list[Column]:
    """Per-rule boolean columns (``g_words`` … ``g_stopwords``) plus the
    conjunction ``gopher_pass`` — one codegen'd Project, no UDF, no shuffle;
    filter with ``df.filter(F.col('gopher_pass'))`` or keep the per-rule flags
    for an audit table (which rule kills how much of each source)."""
    toks = tokens(text)
    n = F.size(toks)
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mwl = avg_token_len(toks)
    n_sym = F.size(F.regexp_extract_all(text, F.lit(_SYMBOL_PATTERN), 0))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(_BULLET_PATTERN)))
    n_ellip = F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_PATTERN)))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_stop = F.size(F.array_distinct(F.filter(toks, lambda t: t.isin(*STOPWORDS))))
    flags = {
        "g_words": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "g_mean_word_len": (mwl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mwl <= GOPHER_MAX_MEAN_WORD_LEN),
        "g_symbol_ratio": n_sym <= GOPHER_MAX_SYMBOL_RATIO * n,
        "g_bullet_ratio": n_bullet <= GOPHER_MAX_BULLET_RATIO * n_lines,
        "g_ellipsis_ratio": n_ellip <= GOPHER_MAX_ELLIPSIS_RATIO * n_lines,
        "g_alpha_words": n_alpha >= GOPHER_MIN_ALPHA_WORD_RATIO * n,
        "g_stopwords": n_stop >= GOPHER_MIN_STOPWORD_HITS,
    }
    # single-sourcing guard: a rule added here without updating
    # GOPHER_FLAG_COLUMNS would leak its g_* column through curation's
    # add-then-drop (drop of a missing name is a silent no-op)
    assert tuple(flags) + ("gopher_pass",) == GOPHER_FLAG_COLUMNS
    cols = [v.alias(k) for k, v in flags.items()]
    gate = None
    for v in flags.values():
        gate = v if gate is None else (gate & v)
    return cols + [gate.alias("gopher_pass")]


def gopher_flags_sql(col: str) -> dict[str, str]:
    """DuckDB twins of every ``gopher_flags`` column, built from the SAME
    thresholds/patterns — {flag name: SQL boolean expression}."""
    toks = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    n = f"len({toks})"
    lines = f"string_split({col}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)"
    total_len = (
        f"list_sum(list_transform({toks}, t -> CAST(length(t) AS DOUBLE)))"
    )
    # no COALESCE: NULL text must yield NULL flags in BOTH engines (Spark's
    # aggregate over a NULL array is NULL); non-null text always has >=1 token
    # (splitting '' gives ['']), so list_sum never sees an empty list
    mwl = f"({total_len} / greatest({n}, 1))"
    n_sym = f"length(regexp_extract_all({col}, '{_SYMBOL_PATTERN}'))"
    n_bullet = (
        f"len(list_filter({lines}, l -> regexp_matches(l, '{_BULLET_PATTERN}')))"
    )
    n_ellip = (
        f"len(list_filter({lines}, l -> regexp_matches(l, '{_ELLIPSIS_PATTERN}')))"
    )
    n_alpha = f"len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))"
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = f"len(list_distinct(list_filter({toks}, t -> t IN ({in_list}))))"
    flags = {
        "g_words": f"({n} >= {GOPHER_MIN_WORDS} AND {n} <= {GOPHER_MAX_WORDS})",
        "g_mean_word_len": f"({mwl} >= {GOPHER_MIN_MEAN_WORD_LEN} "
        f"AND {mwl} <= {GOPHER_MAX_MEAN_WORD_LEN})",
        "g_symbol_ratio": f"({n_sym} <= {GOPHER_MAX_SYMBOL_RATIO} * {n})",
        "g_bullet_ratio": f"({n_bullet} <= {GOPHER_MAX_BULLET_RATIO} * {n_lines})",
        "g_ellipsis_ratio": f"({n_ellip} <= {GOPHER_MAX_ELLIPSIS_RATIO} * {n_lines})",
        "g_alpha_words": f"({n_alpha} >= {GOPHER_MIN_ALPHA_WORD_RATIO} * {n})",
        "g_stopwords": f"({n_stop} >= {GOPHER_MIN_STOPWORD_HITS})",
    }
    flags["gopher_pass"] = "(" + " AND ".join(flags.values()) + ")"
    return flags


# ------------------------------------------------------------ text normalization

URL_PATTERN = r"(https?://|www\.)[^\s]+"  # RE2 ∩ Java, shared with the SQL twin
CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"  # keep \t \n \r


def normalize_text(
    text: Column,
    strip_urls: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
    lowercase: bool = False,
) -> Column:
    """Standard pre-dedup text normalization: URL→``<URL>`` token, control
    characters out, whitespace runs collapsed (preserving newlines is the
    caller's choice — collapse maps ALL whitespace runs to one space, so run
    it AFTER line-structured operators like ``remove_boilerplate_lines``),
    optional lowercasing. One codegen'd expression chain, no UDF, no
    shuffle; DuckDB twin ``normalize_text_sql`` shares the pattern
    constants — value parity in tests/test_normalize.py."""
    out = text
    if strip_urls:
        out = F.regexp_replace(out, URL_PATTERN, "<URL>")
    if strip_controls:
        out = F.regexp_replace(out, CONTROL_PATTERN, "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def normalize_text_sql(
    col: str,
    strip_urls: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
    lowercase: bool = False,
) -> str:
    """DuckDB twin of ``normalize_text`` built from the same constants."""
    out = col
    if strip_urls:
        out = f"regexp_replace({out}, '{URL_PATTERN}', '<URL>', 'g')"
    if strip_controls:
        out = f"regexp_replace({out}, '{CONTROL_PATTERN}', '', 'g')"
    if collapse_ws:
        out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    if lowercase:
        out = f"lower({out})"
    return out
