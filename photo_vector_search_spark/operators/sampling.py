"""Deterministic corpus sampling: stratified Bernoulli fractions and
weighted reservoir (without replacement) — the subsampling primitives a
training-data pipeline needs between filtering and mixing (downsample an
over-represented source, draw a fixed-size eval slice per language, pick
quality-weighted exemplars).

All draws use the engine-portable, PARTITIONING-INVARIANT ``md5_uniform``
discipline (`functions/text.py` — the mix_corpus/shuffle_corpus/splits
convention): u = (int(md5(seed || '-' || key)[:12], 16) + 1) / 16^12, so a
repartition or a Spark upgrade never changes the sample, and DuckDB can
replay the draw exactly.

- ``sample_fraction``: keep rows with u <= fraction — map-only, ZERO
  exchanges, one codegen pass regardless of stratification (per-stratum
  fractions become a literal CASE over the broadcast dict). The Bernoulli
  form: output size is binomial around f·N per stratum.
- ``sample_weighted``: exactly n rows per stratum, probability ∝ weight,
  WITHOUT replacement — Efraimidis & Spirakis (2006) A-ES: key_i =
  u_i^(1/w_i) (equivalently ln(u_i)/w_i, the log form used here for
  numeric stability), take the n largest keys. Stratified: one keyed
  window exchange (rank ≤ n per stratum); global: TakeOrderedAndProject,
  zero exchanges. At 100 TB the global form never shuffles the corpus —
  every executor forwards at most n candidate rows.
- ``sample_exact_n``: uniform fixed-n = the w≡1 special case.

Cf. reference scope: the reference has no sampling surface (its corpus is
one directory, photo_vector_search.py:84-117); this serves SURVEY §2.10's
training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_uniform


def _draw(seed: int, key_col: str) -> Column:
    return md5_uniform(seed, F.col(key_col))


def sample_fraction(
    df: DataFrame,
    fraction: float | dict[str, float],
    by: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5 draw is <= the
    fraction. ``fraction`` may be one float, or (with ``by``) a
    stratum→fraction dict — strata absent from the dict are DROPPED
    (explicit is the contract: a silent keep would over-sample a stratum
    added upstream later). Map-only, zero exchanges; the same row set
    survives under any partitioning and in the DuckDB twin."""
    u = _draw(seed, key_col)
    if isinstance(fraction, dict):
        if by is None:
            raise ValueError("per-stratum fractions need `by`")
        for s, f in fraction.items():
            if not 0.0 <= f <= 1.0:
                raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
        cut = F.lit(0.0)
        for s, f in sorted(fraction.items()):
            cut = F.when(F.col(by) == s, F.lit(float(f))).otherwise(cut)
        return df.filter(u <= cut)
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(u <= F.lit(float(fraction)))


def _aes_key(seed: int, key_col: str, weight_col: str | None) -> Column:
    """Efraimidis–Spirakis reservoir key in log form: ln(u)/w (monotone in
    u^(1/w), the paper's key). u ∈ (0,1] so ln(u) ∈ (-inf, 0]; larger is
    better. w must be > 0 — NULL/non-positive weights never sample."""
    u = _draw(seed, key_col)
    if weight_col is None:
        return F.log(u)
    w = F.col(weight_col).cast("double")
    return F.when(w > 0, F.log(u) / w)


def sample_weighted(
    df: DataFrame,
    n: int,
    weight_col: str | None = None,
    by: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``n`` rows (per stratum with ``by``), drawn WITHOUT
    replacement with probability proportional to ``weight_col`` —
    Efraimidis & Spirakis A-ES over the deterministic md5 draw. Appends
    ``sample_rank`` (1 = first drawn, the reservoir order). Rows with
    NULL or non-positive weight never sample; strata with fewer than n
    eligible rows return all of them. Global form (by=None) is
    TakeOrderedAndProject — zero exchanges; stratified is ONE keyed
    window exchange."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    key = _aes_key(seed, key_col, weight_col)
    scored = df.withColumn("_aes", key).filter(F.col("_aes").isNotNull())
    order = [F.col("_aes").desc(), F.col(key_col).asc()]
    if by is None:
        # TakeOrderedAndProject forwards <= n rows per task; the rank
        # window then runs over n rows only
        pool = scored.orderBy(*order).limit(n)
        return pool.withColumn(
            "sample_rank", F.row_number().over(Window.orderBy(*order))
        ).drop("_aes")
    w = Window.partitionBy(by).orderBy(*order)
    return (
        scored.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .drop("_aes")
    )


def sample_exact_n(
    df: DataFrame,
    n: int,
    by: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Uniform fixed-size sample (per stratum with ``by``): the w ≡ 1
    special case of ``sample_weighted`` — every row equally likely, order
    by the raw draw."""
    return sample_weighted(
        df, n, weight_col=None, by=by, key_col=key_col, seed=seed
    )
