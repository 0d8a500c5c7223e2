"""Z-order (Morton) multi-column clustering for data-skipping writes —
the layout optimization that makes MULTI-dimensional predicates prunable
at rest (Morton 1966; the Delta Lake / Databricks OPTIMIZE ZORDER BY
technique, built here from public bit arithmetic).

A sort by one column gives perfect min/max pruning on that column and
none on any other. Interleaving the bits of k columns' rank values into
one key and range-partitioning the write by that key gives every output
file a small HYPERCUBE of the k-dimensional space, so parquet footer
min/max stats stay tight on ALL k columns simultaneously — a box
predicate (x BETWEEN … AND y BETWEEN …) overlaps only the few files whose
cube intersects it. At 100 TB this is the difference between scanning the
corpus and scanning a few percent of it for every selective multi-column
query, with zero runtime cost (the work happens once, at write time).

Mechanics:
- per column: min/max in ONE agg (a single driver row), then
  rank = clamp(floor((v - lo) / (hi - lo) · 2^bits), 0, 2^bits − 1) —
  pure codegen double arithmetic, engine-portable (the DuckDB twin
  replays it bit-for-bit, tests/test_zorder.py);
- interleave: zkey bit (j·k + i) = bit j of column i's rank — an
  UNROLLED shift/and/or codegen expression (bits·k terms), no UDF;
- write: repartitionByRange(n_files, zkey) + sortWithinPartitions —
  ONE range exchange (sampled bounds), the same cost as any sorted write.

NULL handling: NULL ranks as 0 (the bottom corner) — NULLs cluster
together rather than poisoning the key (documented contract).

Cf. reference scope: the reference's store is one ChromaDB directory with
no layout control (photo_vector_search.py:16-20); this serves the mandated
100 TB store axis (SURVEY §2.1 store family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _rank_expr(col: Column, lo: float, hi: float, bits: int) -> Column:
    """clamp(floor((v − lo)/(hi − lo) · 2^bits), 0, 2^bits − 1), NULL → 0."""
    top = (1 << bits) - 1
    if not hi > lo:  # constant column (or single row): everything ranks 0
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(1 << bits))
    ).cast("long")
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(top)), F.lit(0)
    )


def _interleave_expr(ranks: list[Column], bits: int) -> Column:
    """zkey bit (j·k + i) = bit j of ranks[i] — unrolled codegen."""
    k = len(ranks)
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, j).bitwiseAND(F.lit(1)), j * k + i
                )
            )
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Morton key over ``cols`` (2–4 numeric columns; cast your
    timestamps to epoch first). One min/max agg (driver-side literals) +
    one map-only codegen projection — zero exchanges."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(
            f"zorder needs 2-4 columns, got {len(cols)} ({cols})"
        )
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(
            f"bits*k must fit a signed long: bits={bits} k={len(cols)}"
        )
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    row = df.agg(*aggs).first()
    ranks = []
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        if lo is None:  # all-NULL column: every rank is 0
            lo, hi = 0.0, 0.0
        ranks.append(_rank_expr(F.col(c), lo, hi, bits))
    return df.withColumn(out_col, _interleave_expr(ranks, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` to parquet clustered by the Morton key: ONE range
    exchange (repartitionByRange samples the key bounds) + an in-partition
    sort, key dropped before the write — every output file covers a
    contiguous zkey range, i.e. a small hypercube of the ``cols`` space,
    so parquet min/max footer stats prune box predicates on ANY subset of
    the z-ordered columns (realized pruning is asserted on the written
    footers in tests/test_zorder.py)."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruned_fraction(path: str, box: dict[str, tuple[float, float]]) -> float:
    """Fraction of the store's parquet ROW GROUPS a box predicate can skip
    from footer min/max stats alone (the exact statistic a stats-aware
    reader exploits). Pure pyarrow metadata walk — no data pages read."""
    import pyarrow.parquet as pq

    ds = pq.ParquetDataset(path)
    total = pruned = 0
    for frag in ds.fragments:
        md = frag.metadata
        names = {c: i for i, c in enumerate(frag.physical_schema.names)}
        for g in range(md.num_row_groups):
            total += 1
            rg = md.row_group(g)
            for c, (lo, hi) in box.items():
                st = rg.column(names[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.min > hi or st.max < lo:
                    pruned += 1
                    break
    if total == 0:
        raise ValueError(f"no row groups under {path!r}")
    return pruned / total
