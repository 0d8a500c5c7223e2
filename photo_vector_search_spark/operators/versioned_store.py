"""Versioned store: a commit-log of immutable snapshots with time travel.

The single-snapshot store (``store.snapshot_overwrite``) keeps exactly one live
state plus a ``.old`` crash backup — the reference's semantics (ChromaDB mutates
one collection in place, photo_vector_search.py:136-150). This module is the
scale form of that idea: every mutation is a *commit* appended to a log, old
versions stay readable (time travel), and storage is reclaimed explicitly
(``vacuum``) instead of implicitly on the next write. It is the same design a
table format (Delta/Iceberg) uses, reduced to its load-bearing core:

    <path>/_log/00000000.json , 00000001.json , ...   # one manifest per commit
    <path>/data/<uuid>/                               # immutable parquet dirs

- A manifest lists the *live data directories* at its version, so a commit is
  O(metadata), not O(table): ``append`` writes only the new rows' parquet and a
  manifest referencing previous dirs + the new one. At 100 TB the ingest path
  (append-heavy) never rewrites existing data.
- ``overwrite`` / ``rewrite`` (delete, upsert compaction) are copy-on-write:
  they write the full new state as one dir and a manifest referencing only it —
  Delta's default COW strategy. Partition-level rewrite is the next rung; the
  commit protocol here doesn't change for it.
- The COMMIT POINT is the manifest link: data dirs are written first, then the
  manifest json is written to a tempfile and ``os.link``ed to its version name
  in ``_log/`` (atomic on POSIX, and — unlike rename — FAILS if the name
  already exists). A crash before the link leaves orphan data dirs that no
  manifest references — invisible to every reader, reclaimed by ``vacuum``.
- Concurrency: the exclusive link is the optimistic-concurrency check. Each
  writer pins the version it READ (base) and commits at base+1, so ANY
  intervening commit — not just a same-version race — collides on the link
  and raises ``VersionedStoreError``. ``commit_append``/``commit_overwrite``
  then retry automatically: re-read the new latest manifest, merge, relink
  (manifest-only — the data dir is written once). Two racing appends both
  land in some linear order, neither dropping the other's dirs.
  ``commit_rewrite`` does NOT retry by default: it is read-modify-write, so
  the caller must re-derive from the new state (see its docstring).
- ``vacuum`` only reclaims unreferenced dirs older than ``min_age_seconds`` so
  an in-flight commit (data written, manifest not yet linked) cannot have its
  dir deleted out from under it — the same retention-window guard Delta uses.

Driver-side filesystem ops are metadata-only (json manifests); all data moves
through executors as parquet. On a real deployment ``path`` is an object-store
prefix and these os.* calls become the storage client — the protocol is
unchanged, which is the point of putting the commit in ONE rename.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_log"
_DATA = "data"


class VersionedStoreError(RuntimeError):
    pass


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _data_dir(path: str) -> str:
    return os.path.join(path, _DATA)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.json")


def _list_versions(path: str) -> list[int]:
    log = _log_dir(path)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json"):
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue  # foreign file in _log — ignore, never a commit
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def latest_version(path: str) -> int | None:
    versions = _list_versions(path)
    return versions[-1] if versions else None


def _commit(
    path: str, op: str, live_dirs: list[str], n_rows: int, base_version: int | None
) -> int:
    """Write the manifest for version ``base_version + 1``; the exclusive link
    IS the commit. ``os.link`` to an existing name raises (atomically, unlike
    rename, which silently replaces) — so a lost race is an error, never a
    silently overwritten manifest.

    ``base_version`` is pinned by the CALLER at the moment it read the state it
    derived ``live_dirs`` from. Recomputing `latest` here instead would shrink
    the OCC window to same-version races only: a writer that committed between
    the caller's read and this link would be silently built over with a stale
    live-set (lost update). Pinning makes ANY intervening commit collide on the
    link and surface as ``VersionedStoreError``."""
    os.makedirs(_log_dir(path), exist_ok=True)
    version = 0 if base_version is None else base_version + 1
    manifest = {
        "version": version,
        "op": op,
        "live": sorted(live_dirs),
        "n_rows": n_rows,
        "committed_at": time.time(),
    }
    fd, tmp = tempfile.mkstemp(dir=_log_dir(path), prefix="._commit_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        target = _manifest_path(path, version)
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise VersionedStoreError(
                f"lost commit race: version {version} already committed at "
                f"{path}; re-read the latest manifest and retry (the commit_* "
                "helpers do this automatically; this attempt's data dir stays "
                "an invisible orphan until vacuum)"
            ) from None
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return version


def _write_data(df: DataFrame, path: str) -> tuple[str, int]:
    """Write df as a new immutable data dir; returns (relative dir name, rows).

    The count comes from the written files (one extra metadata-only read) so the
    manifest's n_rows is what readers will actually see, not what the plan
    claimed before the write."""
    rel = os.path.join(_DATA, uuid.uuid4().hex)
    full = os.path.join(path, rel)
    os.makedirs(_data_dir(path), exist_ok=True)
    df.write.mode("error").parquet(full)
    n = df.sparkSession.read.parquet(full).count()
    return rel, n


def _retrying_commit(path: str, build, max_retries: int) -> int:
    """OCC retry loop shared by the commit_* helpers.

    ``build()`` re-reads the CURRENT latest manifest and returns
    ``(op, live_dirs, n_rows, base_version)``; on a lost race we rebuild from
    the new latest and relink. Only the manifest is rewritten on retry — the
    data dir was written exactly once before entering the loop, so a retry is
    O(one small json), never O(data). A writer that exhausts retries surfaces
    the last ``VersionedStoreError`` (its data dir stays an invisible orphan)."""
    last_err: VersionedStoreError | None = None
    for attempt in range(max_retries + 1):
        op, live_dirs, n_rows, base_version = build()
        try:
            return _commit(path, op, live_dirs, n_rows, base_version)
        except VersionedStoreError as e:
            last_err = e
            # brief backoff so two symmetric writers don't lockstep-collide;
            # deterministic (attempt-indexed), no randomness needed locally
            time.sleep(0.01 * (attempt + 1))
    raise last_err  # type: ignore[misc]


def commit_overwrite(df: DataFrame, path: str, max_retries: int = 8) -> int:
    """Commit df as the complete new state (copy-on-write full snapshot).

    Loses no work on a race: the new state doesn't depend on the previous one,
    so a retry just re-pins the base version and relinks the manifest."""
    rel, n = _write_data(df, path)
    return _retrying_commit(
        path, lambda: ("overwrite", [rel], n, latest_version(path)), max_retries
    )


def commit_append(df: DataFrame, path: str, max_retries: int = 8) -> int:
    """Commit df as NEW rows on top of the current state — O(delta) data write.

    This is the 100 TB ingest path: previous data dirs are referenced, not
    rewritten. Keys are not checked; append means append (use
    ``commit_upsert`` for keyed last-write-wins).

    Concurrency: the base version is pinned at manifest-read time and passed
    into the commit, so an intervening commit collides on the link; the retry
    loop then re-reads the NEW latest manifest and merges on top of it — two
    racing appends both land, in some linear order, neither dropping the
    other's dirs (the round-3 lost-update hazard, ADVICE r3)."""
    rel, n = _write_data(df, path)

    def build():
        last = latest_version(path)
        m = _read_manifest(path, last) if last is not None else {"live": [], "n_rows": 0}
        return "append", [*m["live"], rel], m["n_rows"] + n, last

    return _retrying_commit(path, build, max_retries)


def commit_rewrite(df: DataFrame, path: str, op: str = "rewrite", max_retries: int = 0) -> int:
    """Commit df as the full new state under a named op (delete/upsert/compact).

    Copy-on-write: correctness first, then optimize — a partition-pruned rewrite
    writes only changed partitions' dirs and carries the rest by reference; the
    manifest format above already supports it (live = kept dirs + new dirs).

    ``max_retries`` defaults to 0: a rewrite is usually DERIVED from a read of
    the state it replaces (read v, delete rows, write v+1), so blindly
    relinking after an intervening commit would silently discard that commit's
    effect. The caller must re-derive from the new state and re-invoke —
    surfacing the conflict is the correct default for read-modify-write."""
    rel, n = _write_data(df, path)
    return _retrying_commit(
        path, lambda: (op, [rel], n, latest_version(path)), max_retries
    )


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read the store as of ``version`` (default: latest). Time travel is just
    'union the dirs that manifest lists' — old versions stay valid until
    ``vacuum`` drops their unreferenced dirs."""
    versions = _list_versions(path)
    if not versions:
        raise VersionedStoreError(f"no commits at {path} — commit_overwrite first")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise VersionedStoreError(
            f"version {version} not found at {path} (have {versions[0]}..{versions[-1]}"
            f"{' with gaps' if versions[-1] - versions[0] + 1 != len(versions) else ''})"
        )
    manifest = _read_manifest(path, version)
    live = [os.path.join(path, rel) for rel in manifest["live"]]
    if not live:  # a truncate commit: empty state needs a schema-less empty frame
        raise VersionedStoreError(
            f"version {version} at {path} has no data dirs (empty commit); "
            "read a neighboring version or re-commit with rows"
        )
    return spark.read.parquet(*live)


def history(path: str) -> list[dict]:
    """Commit log, newest first — version, op, n_rows, committed_at, n_files."""
    out = []
    for v in reversed(_list_versions(path)):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "op": m["op"],
                "n_rows": m["n_rows"],
                "n_dirs": len(m["live"]),
                "committed_at": m["committed_at"],
            }
        )
    return out


def vacuum(path: str, keep_last: int = 1, min_age_seconds: float = 3600.0) -> list[str]:
    """Drop manifests older than the last ``keep_last`` and every data dir no
    kept manifest references (including orphans from crashed commits, and
    crashed ``._commit_*`` manifest tempfiles). Returns removed paths. Time
    travel reaches only kept versions afterwards.

    ``min_age_seconds`` is the retention window, guarding BOTH races Delta's
    retention guards:

    - in-flight COMMITS: an unreferenced dir younger than the window is NOT
      reclaimed — it may belong to a commit whose data is written but whose
      manifest is not yet linked;
    - in-flight READERS: a version COMMITTED within the window is kept
      entirely (manifest + referenced dirs), even past ``keep_last``. A
      time-travel reader that pinned version N is therefore provably safe
      while N is in retention: every path its plan lists stays on disk for at
      least ``min_age_seconds`` after N's commit — the reader's contract is
      "finish (or re-pin) within the retention window", the same contract
      Delta gives `versionAsOf` readers.

    Pass 0 only when no writer OR reader can be concurrent with the vacuum."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 — vacuuming the latest version "
                         "would delete the live table")
    cutoff = time.time() - min_age_seconds
    versions = _list_versions(path)
    kept = set(versions[-keep_last:])
    # retention guard for readers: versions committed inside the window stay
    kept.update(
        v for v in versions if _read_manifest(path, v).get("committed_at", 0) > cutoff
    )
    referenced: set[str] = set()
    for v in kept:
        referenced.update(_read_manifest(path, v)["live"])

    def _old_enough(p: str) -> bool:
        try:
            return os.path.getmtime(p) <= cutoff
        except OSError:  # already gone — nothing to reclaim
            return False

    removed: list[str] = []
    for v in versions:
        if v not in kept:
            os.remove(_manifest_path(path, v))
            removed.append(_manifest_path(path, v))
    log = _log_dir(path)
    if os.path.isdir(log):
        for name in sorted(os.listdir(log)):
            full = os.path.join(log, name)
            if name.startswith("._commit_") and _old_enough(full):
                os.remove(full)
                removed.append(full)
    data = _data_dir(path)
    if os.path.isdir(data):
        for name in sorted(os.listdir(data)):
            rel = os.path.join(_DATA, name)
            full = os.path.join(path, rel)
            if rel not in referenced and _old_enough(full):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
    return removed


def _read_dirs(spark: SparkSession, path: str, rels: list[str], schema_rels: list[str]) -> DataFrame:
    """Read a subset of a version's live dirs; empty subset → an empty frame
    with the version's schema (footer-only read of one live dir)."""
    if rels:
        return spark.read.parquet(*[os.path.join(path, rel) for rel in rels])
    probe = spark.read.parquet(os.path.join(path, schema_rels[0]))
    return probe.limit(0)


def diff_versions(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two committed versions: one row per changed
    key with ``change_type`` ∈ {insert, update, delete}. Inserts/updates carry
    the NEW row's columns, deletes the OLD row's (the row a downstream
    consumer must retract) — the standard CDC feed shape, derived entirely
    from time travel (no extra write-path bookkeeping; Delta's CDF trades
    storage for skipping exactly this join).

    Manifest-level file pruning (r6): data dirs are immutable, so a dir live
    in BOTH manifests contributes identical rows to both sides — under the
    keyed-store precondition (each version has at most one row per key, the
    same precondition that makes a keyed diff well-defined at all) none of
    those keys can also appear in a non-shared dir, so shared dirs produce
    only ``unchanged`` rows and are pruned BEFORE any read. A diff across an
    append commit therefore reads only the appended dirs (O(delta), verified
    by inputFiles in tests), exactly how Delta/Iceberg CDC uses its manifest.
    Stores that violate key uniqueness get garbage from any keyed diff,
    pruned or not.

    Plan: read both versions' non-shared dirs (with whatever pruning the
    consumer's projection pushes down), compare via ONE full outer join on
    ``key_cols`` — update detection hashes the non-key columns (sorted by
    name, so schema column order can't flip it) instead of comparing N
    columns pairwise. Shuffle = two pruned scans keyed once; nothing
    driver-sized."""
    for v in (v_old, v_new):
        if v not in _list_versions(path):
            # surface the same error read_version would
            read_version(spark, path, v)
    live_old = _read_manifest(path, v_old)["live"]
    live_new = _read_manifest(path, v_new)["live"]
    if not live_old or not live_new:
        raise VersionedStoreError(
            f"diff_versions: version {v_old if not live_old else v_new} at "
            f"{path} has no data dirs (empty commit)"
        )
    shared = set(live_old) & set(live_new)
    old_df = _read_dirs(spark, path, [d for d in live_old if d not in shared], live_old)
    new_df = _read_dirs(spark, path, [d for d in live_new if d not in shared], live_new)
    if set(old_df.columns) != set(new_df.columns):
        raise VersionedStoreError(
            f"diff_versions requires matching schemas; v{v_old} has "
            f"{sorted(old_df.columns)} vs v{v_new} {sorted(new_df.columns)}"
        )
    missing = [k for k in key_cols if k not in new_df.columns]
    if missing:
        raise VersionedStoreError(f"key columns {missing} not in store schema")
    val_cols = sorted(c for c in new_df.columns if c not in key_cols)

    def _hash(df: DataFrame):
        # to_json over a struct: field boundaries are quoted/escaped and NULL
        # is a distinct JSON token, so values shifting across columns
        # ('x\x1fy','z' vs 'x','y\x1fz') or NULL-vs-sentinel changes can never
        # collide the way a separator-joined concat_ws would
        return F.md5(
            F.to_json(F.struct(*val_cols), {"ignoreNullFields": "false"})
        )

    o = old_df.select(*key_cols, _hash(old_df).alias("_oh"), F.struct(*val_cols).alias("_ov")).alias("o")
    n = new_df.select(*key_cols, _hash(new_df).alias("_nh"), F.struct(*val_cols).alias("_nv")).alias("n")
    # eqNullSafe keys: a name-list join treats NULL != NULL, so an unchanged
    # row with a NULL key would surface as a phantom delete+insert every diff
    cond = None
    for kcol in key_cols:
        term = F.col(f"o.{kcol}").eqNullSafe(F.col(f"n.{kcol}"))
        cond = term if cond is None else (cond & term)
    j = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"o.{kcol}"), F.col(f"n.{kcol}")).alias(kcol)
            for kcol in key_cols
        ],
        "_oh",
        "_ov",
        "_nh",
        "_nv",
    )
    change = (
        F.when(F.col("_oh").isNull(), "insert")
        .when(F.col("_nh").isNull(), "delete")
        .when(F.col("_oh") != F.col("_nh"), "update")
    )
    picked = F.when(F.col("_nh").isNull(), F.col("_ov")).otherwise(F.col("_nv"))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            "change_type",
            *key_cols,
            *[picked[c].alias(c) for c in val_cols],
        )
    )
