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
