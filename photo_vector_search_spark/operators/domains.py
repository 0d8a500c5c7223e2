"""Per-domain document caps — the CommonCrawl-pipeline rung that bounds any
single host's share of the corpus (C4 and RefinedWeb both cap per-domain
contributions so template-heavy hosts can't dominate training data).

``cap_per_domain`` keeps the first ``cap`` documents of each domain under a
DETERMINISTIC total order (default: ascending ``doc_id``; pass e.g. a
quality score's doc_id-tie-broken ordering to keep the BEST ``cap`` docs
instead of the first). Exact semantics = one ``row_number() <= cap`` per
domain.

Scale shape: a bare per-domain window would shuffle every row of a domain
into ONE task — and web corpora are exactly the workload where one domain
(a crawler trap, a mirror farm) holds 10^8+ docs. The default two-phase
form is skew-proof and EXACT:

  1. salted partial cap — ``row_number`` over ``(domain, salt)`` with
     ``salt = pmod(xxhash64(key), n_salt)``, keeping ``cap`` rows per
     salted group. Any member of the domain's true top-``cap`` is also in
     the top-``cap`` OF ITS OWN SALT GROUP (the salt group is a subset with
     the same order), so phase 1 never discards a final survivor. A giant
     domain spreads over ``n_salt`` tasks, and at most ``cap * n_salt``
     rows per domain survive.
  2. final cap — ``row_number`` over the (now ≤ ``cap * n_salt``-row)
     domains, keeping ``cap``.

``url_host`` turns a URL column into the domain key with Spark's built-in
``parse_url`` (codegen, no UDF).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL (NULL for unparseable values) — the domain
    key for ``cap_per_domain`` when the corpus carries full URLs.
    ``try_parse_url``, not ``parse_url``: under ANSI mode (Spark 4's
    default) the latter THROWS on the malformed URLs every real crawl
    contains."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_by: tuple[str, ...] = ("doc_id",),
    pre_prune: bool = True,
    n_salt: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` docs per ``domain_col`` value, the first ``cap``
    under ascending ``order_by``. ``order_by`` MUST end in a unique key
    (default ``("doc_id",)``) — with a non-total order, "the first cap" is
    not well-defined and results would vary by partitioning.

    ``pre_prune=True`` (default) runs the salted two-phase form above —
    exact, and the shape to use at scale. ``pre_prune=False`` is the
    textbook single window (fine when no domain is huge); both produce
    identical rows. NULL domains form their own group (capped like any
    other — crawl rows with no parseable host shouldn't bypass the cap)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    order_cols = [F.col(c).asc() for c in order_by]
    if pre_prune:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_by]), F.lit(n_salt))
        w1 = Window.partitionBy(F.col(domain_col), salt).orderBy(*order_cols)
        docs = (
            docs.withColumn("_dc_rn", F.row_number().over(w1))
            .filter(F.col("_dc_rn") <= cap)
            .drop("_dc_rn")
        )
    w2 = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        docs.withColumn("_dc_rn", F.row_number().over(w2))
        .filter(F.col("_dc_rn") <= cap)
        .drop("_dc_rn")
    )


def host_suffixes(host: Column) -> Column:
    """Array of dot-suffixes of a host, pure Catalyst (split + sequence +
    transform + slice — no UDF): ``a.b.example.com`` →
    ``[a.b.example.com, b.example.com, example.com]``. The bare final label
    (``com``) is EXCLUDED — UT1-style blocklists carry host/registered-
    domain entries, and a TLD entry would nuke the corpus; a single-label
    host (``localhost``) yields itself so explicit entries still match.
    NULL host → NULL (the caller decides what an unparseable URL means)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    multi = F.transform(
        F.sequence(F.lit(1), n - F.lit(1)),
        lambda i: F.array_join(F.slice(labels, i, n - i + F.lit(1)), "."),
    )
    return F.when(host.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(n >= 2, multi).otherwise(F.array(host))
    )


def filter_urls(
    docs: DataFrame,
    hosts: list[str] | set[str],
    url_col: str = "url",
    mode: str = "block",
    keep_unparseable: bool | None = None,
) -> DataFrame:
    """Block/allow-list URL filtering — the CommonCrawl-pipeline rung C4 and
    RefinedWeb run before any content gate (RefinedWeb §3.1 filters against
    the UT1 blocklist; an entry ``example.com`` covers every subdomain). A
    document matches when its URL's host OR ANY parent domain of it (label-
    boundary suffixes — ``notexample.com`` never matches ``example.com``)
    is in ``hosts``; ``mode='block'`` drops matches, ``mode='allow'`` keeps
    only matches.

    ``keep_unparseable`` decides rows whose URL yields no host (defaults to
    the mode's natural reading: kept under a blocklist — an unparseable
    host cannot be ON the list — and dropped under an allow-list).

    Scale shape (100 TB): ZERO shuffles — host extraction is the codegen
    ``try_parse_url``, and membership is one map-only Arrow pass testing
    each row's ≤ label-count suffixes against the broadcast frozen set
    (UT1's adult list is ~4M hosts ≈ low-hundreds MB as a Python set —
    executor-memory bounded, never a join). A pure-Catalyst twin (explode
    suffixes + broadcast join + per-key agg) would add an exchange for the
    doc-level verdict; the broadcast-set kernel keeps the filter fully
    pipelined into the scan. DuckDB twin in tests/test_url_filter.py
    replays the suffix semantics in SQL.

    Cf. reference scope: the reference has no corpus-curation surface at
    all (photo_vector_search.py delegates storage row-at-a-time) — this is
    part of the mandated LLM-pipeline extension."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    if keep_unparseable is None:
        keep_unparseable = mode == "block"
    blocked = frozenset(h.lower().strip().strip(".") for h in hosts) - {""}
    bc = docs.sparkSession.sparkContext.broadcast(blocked)

    @F.pandas_udf("boolean")
    def _listed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        listed = bc.value
        for hosts_ser in it:
            out = []
            for h in hosts_ser:
                if h is None:
                    out.append(None)
                    continue
                labels = h.split(".")
                out.append(
                    any(
                        ".".join(labels[i:]) in listed
                        for i in range(max(1, len(labels) - 1))
                    )
                )
            yield pd.Series(out, dtype="object")

    hit = _listed(url_host(F.col(url_col)))
    if mode == "block":
        keep = ~F.coalesce(hit, F.lit(not keep_unparseable))
    else:
        keep = F.coalesce(hit, F.lit(keep_unparseable))
    return docs.filter(keep)
