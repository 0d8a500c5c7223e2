"""PII scrubbing — a first-class training-data-pipeline operator the reference
(a personal photo indexer, photo_vector_search.py) never needed, but a 100 TB
text-corpus engine does before any pretraining run.

Design:
- All JVM-side ``regexp_replace``/``regexp_count`` built-ins — no Python UDF:
  a redaction pass is a pure map stage, pipelined into the scan with zero
  shuffles at any scale (WholeStageCodegen; the regex automaton runs per
  batch-row inside codegen, exactly like ``functions/text.py``).
- Every pattern lives in the RE2 ∩ Java-regex subset (character classes,
  bounded repeats, alternation, word boundaries — no backreferences or
  lookaround), so the DuckDB oracle can run the IDENTICAL rules via
  ``redact_pii_sql``/``pii_count_sql`` below — value-verified, not just
  shape-verified (tests/test_redact.py, both engines on the same corpus).
- Rule order is part of the contract: IP before PHONE (an IPv4 octet run is
  digit-groups-with-dots and must not half-match as a phone), SSN before
  PHONE (3-2-4 grouping is not 3-3-4, but keeps intent explicit), EMAIL first
  (its local-part may contain digits that other rules would shred).

Recall/precision trade (stated, like the dedup family): these are
pattern-level rules — they catch the canonical shapes (user@host.tld, dotted
IPv4, 3-3-4 phones with separators, SSN 3-2-4) and deliberately do NOT chase
free-form obfuscations ("user at host dot com"), which need model-backed NER —
that belongs in a ``pipelines/models.py``-style adapter, not a regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, pattern, replacement) — ORDER MATTERS (see module docstring).
# Patterns are string-identical across Spark (Java regex) and DuckDB (RE2).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)
_KINDS = tuple(k for k, _, _ in PII_RULES)


def _rules(kinds: tuple[str, ...] | None) -> tuple[tuple[str, str, str], ...]:
    if kinds is None:
        return PII_RULES
    unknown = set(kinds) - set(_KINDS)
    if unknown:
        raise ValueError(f"unknown PII kinds {sorted(unknown)}; have {_KINDS}")
    # preserve RULE order regardless of caller order — order is the contract
    return tuple(r for r in PII_RULES if r[0] in kinds)


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with its typed token (``<EMAIL>`` etc.).

    Chained ``regexp_replace`` — one codegen'd map expression, no UDF, no
    shuffle. Spark's ``regexp_replace`` is replace-ALL by default; the DuckDB
    twin needs the explicit ``'g'`` flag (``redact_pii_sql`` adds it)."""
    out = text
    for _, pat, repl in _rules(kinds):
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(col: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB-SQL twin of ``redact_pii`` built from the SAME rule constants —
    the oracle runs the identical automaton, so tests verify values."""
    out = col
    for _, pat, repl in _rules(kinds):
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_counts(text: Column, kinds: tuple[str, ...] | None = None) -> list[Column]:
    """Per-kind REPLACEMENT counts (``n_email``, ``n_ip``, ...) — the
    audit/metrics face of ``redact_pii``: each rule is counted on the text
    AFTER the preceding rules' replacements, so the counts are exactly the
    number of ``<KIND>`` tokens the redaction emits. Counting every rule on
    the raw text instead would double-book overlaps ('555-123-4567@host.com'
    is ONE email replacement, not an email and a phone) and an audit could
    never reconcile counts with emitted tokens. Pure map-side expressions;
    aggregate with SUM for corpus totals (map-side combinable)."""
    out = []
    staged = text
    for kind, pat, repl in _rules(kinds):
        out.append(F.regexp_count(staged, F.lit(pat)).alias(f"n_{kind}"))
        staged = F.regexp_replace(staged, pat, repl)
    return out


def pii_count_sql(col: str, kind: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of one ``pii_counts`` column (same progressive semantics:
    the pattern is counted on the text after the PRECEDING rules' replacements
    within the same ``kinds`` selection). RE2 has no regexp_count, so the twin
    counts via ``regexp_extract_all`` length — same automaton."""
    staged = col
    for k, pat, repl in _rules(kinds):
        if k == kind:
            return f"length(regexp_extract_all({staged}, '{pat}'))"
        staged = f"regexp_replace({staged}, '{pat}', '{repl}', 'g')"
    raise ValueError(f"unknown PII kind {kind!r}; have {_KINDS}")
