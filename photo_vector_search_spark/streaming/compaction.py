"""Bucket-partitioned compaction for the streaming-dedup state — the piece
that upgrades the streams' per-batch cost from "one O(history) columnar scan"
to "a partition-PRUNED probe of the touched buckets".

The incremental dedup streams (`incremental_lsh_dedup` / `incremental_srp_dedup`)
accumulate state as one parquet partition per micro-batch. Every shuffle is
already bounded by O(batch + collided candidates), but each state family must
still be *scanned* per batch because a batch_id layout can't prune by content.
This module is the LSM-style answer: periodically fold committed batch
partitions into a BASE table partitioned by a hash prefix of each family's
probe key, so the per-batch read prunes to the prefixes the batch actually
touches:

    family             probe key            base partition key (pfx)
    bands              (band, band_key)     pmod(hash(band, band_key), P)
    shingles           doc_id               pmod(hash(doc_id), P)
    docs  (registry)   doc_id               pmod(hash(doc_id), P)
    buckets            (table, bkey)        pmod(hash(table, bkey), P)
    vectors (registry) vec_id               pmod(hash(vec_id), P)

``pairs`` is an append-only RESULT, not probe state — never compacted.

Commit protocol (crash-safe, mirrors `operators/versioned_store`'s
write-data-then-link discipline):
  1. the new base (old base rows + compacted batch partitions) is written
     under ``_base_<id>/<family>/pfx=N/`` — invisible to readers;
  2. the manifest ``_compaction.json`` is atomically replaced (os.replace of
     a same-directory tempfile) — THE commit point: it names the live
     base_id and lists every compacted batch id;
  3. old base dirs and compacted batch partitions are deleted best-effort —
     readers skip any batch id the manifest lists, so a crash between (2)
     and (3) leaves inert garbage, never double-counted rows.

Caller contract: run compaction only while the stream is STOPPED (the same
cadence as an IVF rebalance). The newest batch partition is excluded by
default — a crashed final attempt may have committed state partitions
without the checkpoint commit, and folding them into the base would defeat
the replay rule that re-reads exclude the replayed batch's own partitions.

Reference scope note: the reference (photo_vector_search) re-indexes by hand
and has no streaming/state surface; this is part of the mandated
LLM-pipeline extension, designed Spark-first.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_compaction.json"

# family -> (probe-key columns, partition count key is hashed from)
FAMILY_KEYS = {
    "bands": ["band", "band_key"],
    "shingles": ["doc_id"],
    "docs": ["doc_id"],
    "buckets": ["table", "bkey"],
    "vectors": ["vec_id"],
    "ibands": ["band", "bkey"],
    "images": ["path"],
    "abands": ["band", "bkey"],
    "aframes": ["fid"],
    "atracks": ["path"],
}

LSH_FAMILIES = ("bands", "shingles", "docs")
SRP_FAMILIES = ("buckets", "vectors")
PHASH_FAMILIES = ("ibands", "images")
AUDIO_FAMILIES = ("abands", "aframes", "atracks")


def pfx_col(family: str, n_prefixes: int):
    """The deterministic partition prefix for a family's probe key —
    ``F.hash`` is Spark's seeded Murmur3 (stable across sessions), ``pmod``
    keeps it non-negative."""
    return F.pmod(F.hash(*[F.col(c) for c in FAMILY_KEYS[family]]), F.lit(n_prefixes))


def load_manifest(state_path: str) -> dict | None:
    p = os.path.join(state_path, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_manifest(state_path: str, manifest: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=state_path, prefix="._compact_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(state_path, MANIFEST))  # atomic commit
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _batch_dirs(root: str) -> dict[int, str]:
    if not os.path.isdir(root):
        return {}
    out = {}
    for name in os.listdir(root):
        if name.startswith("batch_id="):
            try:
                out[int(name.split("=", 1)[1])] = os.path.join(root, name)
            except ValueError:
                continue
    return out


def base_dir(state_path: str, base_id: str, family: str) -> str:
    return os.path.join(state_path, f"_base_{base_id}", family)


BANDING_MARKER = "_banding.json"
BAND_LAYOUT = "interleaved-v1"  # image_dedup._permuted_hash_sql's partition


def check_band_layout(state_path: str, family: str, n_bands: int) -> None:
    """Refuse to stream against persisted band state written under a
    DIFFERENT band-key definition — keys are a compatibility contract, not
    an implementation detail: the r8 interleaved partition (or a changed
    ``n_bands``) makes every previously persisted (band, bkey) row match
    nothing, so the semi-join silently misses every old-vs-new pair while
    the stream keeps committing (review finding). First use on an empty
    family stamps its record into ``_banding.json``; state without the
    stamp predates the interleaved layout and must be rebuilt via the batch
    operator.

    The marker is keyed BY FAMILY (``{family: {layout, n_bands}}``): an
    image stream (``ibands``) and an audio stream (``abands``) sharing one
    ``state_path`` have disjoint band families, so each checks — and may
    differ in — its own ``n_bands``. A flat legacy record (pre-r9 single
    ``{layout, n_bands}``) is migrated to the families that actually HAVE
    state under this path — the stamping family necessarily does, while a
    brand-new family must NOT inherit the old record (it would spuriously
    fail a different n_bands despite having nothing to protect)."""
    marker = os.path.join(state_path, BANDING_MARKER)
    records: dict[str, dict] = {}
    if os.path.exists(marker):
        with open(marker) as f:
            rec = json.load(f)
        if "layout" in rec:  # legacy flat record
            mani0 = load_manifest(state_path)
            mani_fams = set(mani0.get("families", [])) if mani0 else set()
            stamped = [
                f
                for f in FAMILY_KEYS
                if f in mani_fams
                or _batch_dirs(os.path.join(state_path, f))
            ]
            # no state at all (marker stamped, then nothing written before
            # the upgrade): the record still belongs to SOME pre-r9 family;
            # keep it for the checking family so an n_bands change on truly
            # empty state stays harmless either way
            records = {f: rec for f in (stamped or [family])}
        else:
            records = rec
    mine = records.get(family)
    if mine is not None:
        if mine.get("layout") != BAND_LAYOUT or mine.get("n_bands") != n_bands:
            raise ValueError(
                f"band state at {state_path!r} family {family!r} was written "
                f"with layout={mine.get('layout')!r} "
                f"n_bands={mine.get('n_bands')} but this stream uses "
                f"layout={BAND_LAYOUT!r} n_bands={n_bands} — band keys are "
                "incompatible; rebuild the state with the batch operator "
                "over the current corpus"
            )
        if os.path.exists(marker):
            with open(marker) as f:
                on_disk = json.load(f)
            if "layout" in on_disk:  # persist the legacy->keyed migration
                _write_banding(marker, records)
        return
    mani = load_manifest(state_path)
    has_state = bool(_batch_dirs(os.path.join(state_path, family))) or (
        mani is not None and family in mani.get("families", [])
    )
    if has_state:
        raise ValueError(
            f"band state at {state_path!r} has no banding marker for family "
            f"{family!r} — it predates the interleaved band layout, and its "
            "persisted keys would silently match nothing; rebuild the state "
            "with the batch operator over the current corpus"
        )
    os.makedirs(state_path, exist_ok=True)
    records[family] = {"layout": BAND_LAYOUT, "n_bands": n_bands}
    _write_banding(marker, records)


def _write_banding(marker: str, records: dict) -> None:
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(records, f)
    os.replace(tmp, marker)


def read_state_family(
    spark: SparkSession,
    state_path: str,
    family: str,
    current_batch: int,
    pfx_values: list[int] | None = None,
) -> DataFrame | None:
    """The accumulated state of one family: compacted base (partition-PRUNED
    to ``pfx_values`` when given) unioned with the not-yet-compacted batch
    partitions — excluding ``current_batch``'s own partition (the replay
    rule) and excluding any batch the manifest lists as compacted (the
    crash-window-before-cleanup rule). Returns None when no state exists."""
    mani = load_manifest(state_path)
    compacted: set[int] = set(mani["compacted"]) if mani else set()
    parts: list[DataFrame] = []
    if mani is not None and family in mani["families"]:
        bdir = base_dir(state_path, mani["base_id"], family)
        if os.path.isdir(bdir):
            base = spark.read.parquet(bdir)
            if pfx_values is not None:
                base = base.filter(F.col("pfx").isin([int(v) for v in pfx_values]))
            parts.append(base.drop("pfx"))
    root = os.path.join(state_path, family)
    skip = compacted | {current_batch}
    deltas = [d for b, d in sorted(_batch_dirs(root).items()) if b not in skip]
    if deltas:
        # mergeSchema: batch partitions written by different library versions
        # can differ (legacy SRP vectors lack the r6 `fp` column); without it
        # the surviving schema depends on WHICH footer Spark samples, and a
        # legacy-file win would silently drop `fp` for every partition —
        # nondeterministically disabling the changed-embedding clash check.
        # With it, legacy rows surface as fp=NULL, which the registry's
        # isNotNull filter already handles. Cost: one footer read per file at
        # planning time, on dedup-cadence state reads.
        parts.append(spark.read.option("mergeSchema", "true").parquet(*deltas))
    if not parts:
        return None
    out = parts[0]
    for extra in parts[1:]:
        # allowMissingColumns: a base compacted from pre-r6 (no-fp) partitions
        # unioned with r6 deltas (or vice versa) must not throw — the missing
        # side's fp surfaces as NULL, same fail-safe as the mergeSchema read
        out = out.unionByName(extra, allowMissingColumns=True)
    return out


def state_batches(state_path: str, family: str) -> set[int]:
    """Batch ids with a live (non-compacted) partition, plus a synthetic
    coverage marker for compacted history — used by the stream's
    registry-coverage check. Compaction validates coverage up front, so the
    compacted prefix is covered by construction."""
    mani = load_manifest(state_path)
    compacted: set[int] = set(mani["compacted"]) if mani else set()
    return set(_batch_dirs(os.path.join(state_path, family))) - compacted


def compact_dedup_state(
    spark: SparkSession,
    state_path: str,
    kind: str,
    n_prefixes: int = 64,
    keep_latest: bool = True,
) -> dict:
    """Fold committed batch partitions into the bucket-partitioned base.

    ``kind``: 'lsh' (bands/shingles/docs), 'srp' (buckets/vectors), 'phash'
    (ibands/images) or 'audio' (abands/aframes/atracks).
    ``keep_latest=True`` (default) excludes the newest batch id — it may be a
    crashed attempt whose replay depends on the exclude-own-batch read rule;
    pass False only when the stream is known cleanly stopped (drained with
    availableNow and terminated). Run ONLY while the stream is stopped.

    Returns a summary dict {compacted: [...], base_id, families}. No-op (and
    empty summary) when there is nothing eligible."""
    families = {
        "lsh": LSH_FAMILIES,
        "srp": SRP_FAMILIES,
        "phash": PHASH_FAMILIES,
        "audio": AUDIO_FAMILIES,
    }.get(kind)
    if families is None:
        raise ValueError(
            f"kind must be 'lsh', 'srp', 'phash' or 'audio', got {kind!r}"
        )
    mani = load_manifest(state_path)
    already: set[int] = set(mani["compacted"]) if mani else set()
    # sweep orphaned bases: a crash in a previous compaction's
    # write→commit→cleanup window can leave a _base_<id> dir the manifest
    # never names (written-but-uncommitted) or no longer names
    # (committed-over-but-undeleted). Readers only ever follow the manifest,
    # so anything else is inert garbage — and this is the one safe moment to
    # reap it (the caller contract: the stream is stopped).
    live_base = f"_base_{mani['base_id']}" if mani else None
    if os.path.isdir(state_path):
        for name in os.listdir(state_path):
            if name.startswith("_base_") and name != live_base:
                shutil.rmtree(os.path.join(state_path, name), ignore_errors=True)
    # eligible = batches present in EVERY family (a partially-written crash
    # attempt is missing its later families and must stay a delta so replay
    # rewrites it)
    per_family = [set(_batch_dirs(os.path.join(state_path, f))) - already for f in families]
    eligible = set.intersection(*per_family) if per_family else set()
    if keep_latest and eligible:
        # the newest id across ALL families, committed or not, stays a delta
        newest = max(set.union(*per_family))
        eligible.discard(newest)
    # Legacy-format guard. Pure pre-registry state (the index family has
    # batches but the registry family has NONE, and no compacted base that
    # could hold registry rows) is refused loudly: nothing here is safely
    # foldable and the caller should rebuild. Anything less than pure —
    # a crashed attempt's index-without-registry batch, mixed legacy+r6
    # deltas — is handled by `eligible` itself: a batch missing ANY family
    # is simply not in the intersection, stays a delta, and the stream's
    # covered/fallback logic keeps treating it correctly.
    index_fam, reg_fam = {
        "lsh": ("bands", "docs"),
        "srp": ("buckets", "vectors"),
        "phash": ("ibands", "images"),
        "audio": ("abands", "atracks"),
    }[kind]
    reg_dirs = _batch_dirs(os.path.join(state_path, reg_fam))
    index_all = set(_batch_dirs(os.path.join(state_path, index_fam))) - already
    if index_all and not reg_dirs and not already:
        raise ValueError(
            f"compact_dedup_state: legacy state ({index_fam} batches without "
            f"any {reg_fam} registry partition) cannot be compacted — re-run "
            "the batch operator to rebuild, or keep streaming uncompacted"
        )
    fold_reg = [reg_dirs[b] for b in sorted(eligible) if b in reg_dirs]
    if fold_reg:
        # pre-fingerprint registry partitions (no `fp` column) must stay
        # deltas: folding them would build a base whose schema diverges from
        # later deltas (unionByName failure) or silently drop the
        # changed-content detection for those ids. One merged-schema read +
        # one limit-1 job over exactly the partitions being folded — not a
        # per-directory driver round-trip (O(deltas) serial reads).
        merged = spark.read.option("mergeSchema", "true").parquet(*fold_reg)
        legacy = (
            "fp" not in merged.columns
            or merged.filter(F.col("fp").isNull()).limit(1).count() > 0
        )
        if legacy:
            raise ValueError(
                f"compact_dedup_state: legacy {reg_fam} partition(s) without "
                "fingerprints among the batches to fold — rebuild the state "
                "with the current stream before compacting"
            )
    if not eligible:
        return {"compacted": sorted(already), "base_id": mani["base_id"] if mani else None, "families": list(families)}

    new_id = uuid.uuid4().hex[:12]
    for fam in families:
        pieces = []
        if mani is not None and fam in mani["families"]:
            old_base = base_dir(state_path, mani["base_id"], fam)
            if os.path.isdir(old_base):
                pieces.append(spark.read.parquet(old_base).drop("pfx"))
        root = os.path.join(state_path, fam)
        dirs = _batch_dirs(root)
        delta_dirs = [dirs[b] for b in sorted(eligible) if b in dirs]
        if delta_dirs:
            pieces.append(spark.read.parquet(*delta_dirs))
        if not pieces:
            continue
        merged = pieces[0]
        for extra in pieces[1:]:
            merged = merged.unionByName(extra)
        (
            merged.withColumn("pfx", pfx_col(fam, n_prefixes))
            .repartition("pfx")
            .write.mode("overwrite")
            .partitionBy("pfx")
            .parquet(base_dir(state_path, new_id, fam))
        )
    # per-family base bytes: lets readers skip the touched-prefix job when
    # the base is too small for pruning to beat its own overhead
    fam_bytes: dict[str, int] = {}
    for fam in families:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(base_dir(state_path, new_id, fam)):
            for fn in filenames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, fn))
                except OSError:
                    continue
        fam_bytes[fam] = total
    manifest = {
        "base_id": new_id,
        "families": list(families),
        "n_prefixes": n_prefixes,
        "bytes": fam_bytes,
        "compacted": sorted(already | eligible),
    }
    _write_manifest(state_path, manifest)  # commit point
    # best-effort cleanup: readers already skip everything deleted here
    if mani is not None:
        shutil.rmtree(
            os.path.join(state_path, f"_base_{mani['base_id']}"), ignore_errors=True
        )
    for fam in families:
        dirs = _batch_dirs(os.path.join(state_path, fam))
        for b in eligible:
            if b in dirs:
                shutil.rmtree(dirs[b], ignore_errors=True)
    return manifest
