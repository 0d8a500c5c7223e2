"""Group-wise canonicalization via ``applyInPandas`` (SURVEY §2.7 note —
"grouped model inference"): collapse each duplicate cluster to one canonical
record with merged metadata.

This is the post-dedup step every training pipeline runs: given (record, group)
assignments from any dedup operator, keep one representative per group and
aggregate the rest (provenance count, source list, max quality). A model-backed
chooser (e.g. "pick the highest-LM-quality member") plugs into ``choose`` —
pandas-per-group is exactly the grouped-inference execution shape Spark gives
applyInPandas: one shuffle on group_id, then pure per-group Python."""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame

CANON_SCHEMA = (
    "group_id string, canonical_id long, n_members long, sources string, best_quality double"
)


def default_choose(group: pd.DataFrame) -> pd.Series:
    """Deterministic default: smallest id wins (the reference's min-id canonical
    from exact_dedup); quality = max over members."""
    winner = group.loc[group["doc_id"].idxmin()]
    return pd.Series(
        {
            "canonical_id": int(winner["doc_id"]),
            "best_quality": float(group["quality"].max()),
        }
    )


def canonicalize_groups(
    records: DataFrame,
    choose: Callable[[pd.DataFrame], pd.Series] = default_choose,
) -> DataFrame:
    """records: (doc_id, group_id, source, quality) → one row per group_id."""

    def _collapse(group: pd.DataFrame) -> pd.DataFrame:
        pick = choose(group)
        return pd.DataFrame(
            [
                {
                    "group_id": group["group_id"].iloc[0],
                    "canonical_id": int(pick["canonical_id"]),
                    "n_members": len(group),
                    "sources": ",".join(sorted(set(group["source"]))),
                    "best_quality": float(pick["best_quality"]),
                }
            ]
        )

    return records.groupBy("group_id").applyInPandas(_collapse, schema=CANON_SCHEMA)
