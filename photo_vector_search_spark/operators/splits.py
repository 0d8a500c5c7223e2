"""Deterministic train/val/test splits, including the leakage-safe
group-aware form: near-duplicate documents must land in the SAME split, or
the held-out set silently overlaps training data and every eval number is
inflated (the cross-split contamination measured by Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" §6.2 — dedup
papers consistently find eval overlap from near-dups that doc-level random
splits cannot prevent).

``assign_split`` is the doc-level rung: an engine-portable seeded hash draw
(``md5_uniform`` — the same discipline as `mix_corpus`/`shuffle_corpus`;
seeded ``rand()`` is per-partition-seeded and changes under repartition)
cut against the cumulative fraction boundaries. Stable under re-runs AND
under corpus growth: a doc's split never changes when other docs are added,
the property ``randomSplit`` lacks.

``leakage_safe_split`` is the group-aware rung: near-dup pairs (from ANY of
the dedup family's candidate generators — MinHash-LSH, SimHash, SRP-LSH,
embedding cosine) are closed into connected components
(`graph.dedup_clusters`), and the hash draw is taken on the GROUP id, so
every member of a component inherits one split and no pair can straddle.

Scale shape (100 TB): the split assignment itself is MAP-ONLY — zero
exchanges, no state, no driver data. The group closure reuses
`connected_components`' alternating large-star/small-star joins (its scale
story lives there); the final docs⋈components join shuffles on the id, and
the components side holds only docs that appear in some pair — after LSH
dedup that is a small fraction of the corpus, so AQE typically broadcasts
it. NULL group keys cannot occur (singletons coalesce to their own id).

Cf. reference scope: the reference (rianders/photo-vector-search) has no
train/eval surface — this extends the mandated LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_uniform
from .graph import dedup_clusters


def _validate_fractions(fractions: dict[str, float]) -> list[tuple[str, float]]:
    if not fractions:
        raise ValueError("fractions must name at least one split")
    items = list(fractions.items())
    for name, frac in items:
        if not name:
            raise ValueError("split names must be non-empty strings")
        if not frac > 0:
            raise ValueError(f"split {name!r} fraction must be > 0, got {frac}")
    total = sum(f for _, f in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    return items


def split_expr(
    fractions: dict[str, float], key: Column, seed: int = 0
) -> Column:
    """The split-name expression: seeded uniform draw on ``key`` cut against
    cumulative boundaries (insertion order; the final boundary is forced to
    exactly 1.0 so the draw's closed upper end u=1 always lands in the last
    split). DuckDB twin of the draw: see ``md5_uniform``."""
    items = _validate_fractions(fractions)
    u = md5_uniform(seed, key)
    expr = None
    cum = 0.0
    for i, (name, frac) in enumerate(items):
        cum = 1.0 if i == len(items) - 1 else cum + frac
        cond = u <= F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return expr


def assign_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` naming each row's split: deterministic, map-only,
    partitioning-invariant, insertion-stable. ``fractions`` maps split name
    -> expected fraction (must sum to 1); realized fractions converge on the
    expectation by the uniformity of the md5 draw. ``key_col`` must be
    non-NULL (NULL keys would all receive the same draw — pre-coalesce a
    surrogate if the corpus allows NULL ids)."""
    return df.withColumn(split_col, split_expr(fractions, F.col(key_col), seed))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
    group_col: str = "group_id",
) -> DataFrame:
    """Split assignment that no near-dup pair can straddle: close ``pairs``
    (columns ``doc_a``/``doc_b``, any dedup candidate generator's output)
    into connected components, then draw the split on the component id.
    Returns ``docs`` + ``group_col`` (component min-id; singletons = own id)
    + ``split_col``. Guarantee: rows joined by any pair path share a group,
    hence a split — eval contamination from near-dups is structurally
    impossible rather than merely improbable."""
    grouped = dedup_clusters(docs, pairs, id_col=id_col)
    if group_col != "group_id":
        grouped = grouped.withColumnRenamed("group_id", group_col)
    return assign_split(
        grouped, fractions, key_col=group_col, seed=seed, split_col=split_col
    )
