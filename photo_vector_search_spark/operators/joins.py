"""As-of join — the temporal join Spark lacks as a built-in (SURVEY custom-op
guidance: compose from existing DataFrame ops when semantics allow).

``asof_join_backward(left, right, ...)``: for each left row, the right row with
the greatest right_ts ≤ left_ts within the same key (inclusive, like DuckDB's
`ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses to cross-validate).

Implementation: tag + union + one window pass —
  union(right(tagged 1), left(tagged 0))
  → window over key ORDER BY (ts, tag DESC): last(right_value, ignoreNulls)
  → keep left rows.
One shuffle on the key, sort within partitions; no join explosion, no
per-row probing. At 100 TB this is the standard log-to-snapshot enrichment
shape: shuffle volume = |left| + |right| rows, each narrow.

Right side must be unique per (key, ts) — pre-aggregate if not (ties would make
"the" as-of row ambiguous in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Inner backward as-of join. Output: all left columns + matched value_cols
    + ``matched_ts`` (the right row's timestamp). Left rows with no prior right
    row are dropped (inner semantics — keeps oracle parity trivial)."""
    from pyspark.sql.types import StructField, StructType

    lcols = [c for c in left.columns]
    # the matched right ROW travels as ONE struct so ts and values fill
    # atomically — per-column last(ignorenulls) would pair the newest ts with an
    # OLDER column's value whenever the newest row holds a null in that column
    row_struct_type = StructType(
        [StructField("_ts_r", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(
            F.col(right_ts).alias("_ts_r"), *[F.col(c) for c in value_cols]
        ).alias("_row"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(row_struct_type).alias("_row"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # right sorts before left at equal ts (_is_right DESC) → inclusive ts_r ≤ ts_l
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        "*", F.last("_row", ignorenulls=True).over(w).alias("_m")
    )
    out = filled.filter((F.col("_is_right") == 0) & F.col("_m").isNotNull())
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.col("_m._ts_r").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
