"""Deterministic global corpus shuffle — training-order randomization.

A pretraining run needs every epoch's document order to be (a) effectively
random, (b) reproducible from a seed, and (c) stable under re-partitioning of
the input (a re-read of the same corpus with different file splits must yield
the SAME order). Seeded ``df.sample``/``rand()`` fails (c) — Spark's random
streams are seeded per-partition, so the draw changes with the physical split.

The engine-portable form: order by ``md5(seed || '-' || key)``. Catalyst plans
the ``orderBy`` as a range-repartition + per-partition sort — the scale-native
total order (one pass of range sampling over the hash, one shuffle; no global
single-partition bottleneck). Global positions are then assigned WITHOUT a
global-window shuffle: per-partition row counts (a tiny collected aggregate —
one long per partition) become broadcast offsets, and a ``mapInPandas`` pass
adds ``offset[partition] + running index`` while streaming each partition's
Arrow batches. Sortedness across partition INDEX order is exactly what
Spark's sort guarantees, so the positions are the global ranks.

DuckDB twin (value-verified in tests/test_shuffle.py):
``row_number() OVER (ORDER BY md5(seed || '-' || key), key) - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_corpus(df: DataFrame, seed: int = 0, key_col: str = "doc_id") -> DataFrame:
    """Return ``df`` with a ``pos`` column: the row's rank in the seeded
    pseudo-random total order (0-based, dense, deterministic).

    ``key_col`` must be unique per row (it tie-breaks equal hashes — md5
    collisions are negligible but the determinism contract must not rest on
    their absence). Different seeds give statistically independent orders;
    the same seed gives byte-identical ``pos`` under ANY input partitioning
    (asserted in tests)."""
    h = F.md5(F.concat_ws("-", F.lit(str(seed)), F.col(key_col).cast("string")))
    ordered = df.withColumn("_h", h).orderBy("_h", key_col)

    # Per-partition counts of the SORTED output: cheap (count(1) per partition)
    # but it does run the sort once to know the split. At 100 TB you'd instead
    # persist `ordered` (or write it) so sort work isn't paid twice; fixture
    # scale keeps the recompute, the plan shape is identical either way.
    sizes = (
        ordered.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r["pid"]: r["n"] for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def _number(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = bc.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pos"] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    from pyspark.sql.types import LongType, StructField, StructType

    # structural schema, not a DDL string — exotic column names/types have no
    # stable simpleString round-trip (ADVICE r4, same fix as with_stub_embedding)
    schema = StructType(list(ordered.schema.fields) + [StructField("pos", LongType())])
    return ordered.mapInPandas(_number, schema=schema).drop("_h")
