"""Store operators: point reads, distinct, per-photo reconstruction, batch upsert,
deletes — the reference's CRUD surface (SURVEY §2.2, §2.4 A3, §2.8).

All are pure DataFrame→DataFrame transformations; persistence is a snapshot-swap
overwrite handled by ``snapshot_overwrite`` (the reference's analogue: ChromaDB's
add/update/delete mutating its SQLite+HNSW store in place,
photo_vector_search.py:136-150, 198-212).

Scale notes:
- ``merge_upsert`` is one left-anti join + union. The update batch is usually tiny
  relative to the store → Spark broadcasts it (AQE converts at runtime); the big
  side streams through without a shuffle. At 100 TB with a bucketed store table the
  anti-join co-locates and even the sort disappears.
- deletes are filters — map-side only, no shuffle, pushed to the scan where possible.
- ``group_photos`` (A3) is the only shuffling op here (groupBy photo_path); partial
  aggregation applies since collect_list is map-side combinable per group.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_lookup(store: DataFrame, photo_path: str, aspect_name: str | None = None) -> DataFrame:
    """P3/P4 — `collection.get(where={photo_path[, aspect_name]})`
    (photo_vector_search.py:117-125, 204-207; cli.py:173-176)."""
    df = store.filter(F.col("photo_path") == photo_path)
    if aspect_name is not None:
        df = df.filter(F.col("aspect_name") == aspect_name)
    return df


def distinct_photos(store: DataFrame) -> DataFrame:
    """P5 — unique photo list (`app.py:52-53` does set() over a full scan)."""
    return store.select("photo_path").distinct()


def group_photos(store: DataFrame) -> DataFrame:
    """A3 — reconstruct each photo as its sorted aspect list (cli.py:178-185).

    Sorted so the result is deterministic for the oracle (`collect_list` order is
    otherwise partition-dependent)."""
    return store.groupBy("photo_path").agg(
        F.sort_array(F.collect_list("aspect_name")).alias("aspects"),
        F.count(F.lit(1)).alias("n_aspects"),
    )


def describe_store(store: DataFrame) -> DataFrame:
    """Store summary, one row per aspect — the engine-side analogue of the
    reference UI's browse/manage pages (app.py:24-46 View/Manage list photos and
    aspects with counts). Everything the pages show that isn't presentation:
    rows, distinct photos, described fraction, embedding dimension.

    Single groupBy — map-side combinable aggs, one shuffle on aspect_name."""
    return (
        store.groupBy("aspect_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("photo_path").alias("n_photos"),
            F.sum(
                F.when(F.length(F.coalesce("description", F.lit(""))) > 0, 1).otherwise(0)
            ).alias("n_described"),
            F.min(F.size("embedding")).alias("dim_min"),
            F.max(F.size("embedding")).alias("dim_max"),
        )
    )


def merge_upsert(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """U1 — last-write-wins batch upsert (photo_vector_search.py:114-154).

    The reference upserts row-at-a-time (exists-check → update | add); the batch
    formulation with deterministic keys reaches the same end state in one pass:
    rows of `existing` whose key appears in `updates` are replaced."""
    return existing.join(
        updates.select(*keys).distinct(), on=keys, how="left_anti"
    ).unionByName(updates)


def delete_by_key(store: DataFrame, photo_path: str, aspect_name: str) -> DataFrame:
    """D1 — delete one (photo_path, aspect) row (photo_vector_search.py:198-201)."""
    return store.filter(
        ~((F.col("photo_path") == photo_path) & (F.col("aspect_name") == aspect_name))
    )


def delete_where(store: DataFrame, predicate: Column) -> DataFrame:
    """D2 — delete all rows matching a predicate (photo_vector_search.py:203-212
    deletes every aspect of a photo)."""
    return store.filter(~predicate)


def truncate(store: DataFrame) -> DataFrame:
    """SC7 — `collection.delete(where={})` keeps the store, removes all rows
    (cli.py:149)."""
    return store.limit(0)


def drop_store(path: str) -> None:
    """SC8 — remove the persistent store entirely (`shutil.rmtree(db_path)`,
    cli.py:158-162; the interactive confirm stays with the caller)."""
    shutil.rmtree(path, ignore_errors=True)


def recover_store(path: str) -> None:
    """Crash recovery for the snapshot swap: if a previous run died between the
    two renames, `path` is absent but `path + '.old'` holds the last complete
    snapshot — restore it. Call before reading OR writing a store; no-op when
    the store is healthy."""
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)


def snapshot_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Persist a new store state atomically-enough: write tmp dir, swap (SURVEY §7
    "hard parts" #1). On a real deployment this is a table-format commit (Delta/
    Iceberg); plain Parquet + rename is the dependency-free stand-in.

    ``partition_by``: hive-partition the snapshot by these columns (e.g.
    ``["cluster_id"]`` for an IVF store) — reads that filter on them then prune
    whole directories at file-listing time (PartitionFilters), which is the
    at-rest half of the IVF design (ann.py)."""
    recover_store(path)  # never clobber a crashed run's only surviving snapshot
    parent = os.path.dirname(os.path.abspath(path))
    tmp = tempfile.mkdtemp(prefix="._snapshot_", dir=parent)
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        old = path + ".old"
        # after recover_store, an existing .old alongside an existing store is
        # leftover garbage from an interrupted cleanup — safe to clear
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
            # crash window: between these renames `path` is briefly absent —
            # POSIX has no atomic directory swap; a table format (Delta/Iceberg)
            # closes this gap with a metadata commit. `.old` holds the previous
            # snapshot and recover_store restores it on the next access.
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
