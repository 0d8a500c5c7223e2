"""Incremental maintenance for the persisted MaxSim token store —
upsert/delete/live-serve/compact WITHOUT re-embedding or rewriting the
corpus (the delta-segment + tombstone pattern `index_maintenance` applies
to the IVF,SQ8 store, extended to the late-interaction family so EVERY
persisted serving index can grow incrementally; cf. the reference's
incremental per-file upsert loop, photo_vector_search.py:84-117).

Layout around a `late_interaction.build_maxsim_store` store at ``path``:
- ``path``            base (id, tok_embs, pooled[, cluster_id]) — FROZEN
                      between compactions; its content signature is the
                      build id the meta sidecar records.
- ``path + '.delta'`` upserted rows, re-embedded against the build's
                      (max_tokens, dim) and — for clustered stores —
                      assigned to the build's FROZEN centroids (the clip
                      convention: probes stay valid, geometry drifts only
                      until the next compaction). O(delta) rewrite.
- ``path + '.tombstones'`` deleted ids. Both side tables carry the base
                      ``build_id``; a side table from a different build is
                      refused (serving stale-geometry rows silently would
                      collapse recall).

Live view = delta ∪ (base anti delta-ids) − tombstones. The cluster-probe
filter pushes THROUGH the union, so the base scan keeps its hive-partition
pruning; the side tables are broadcast-sized joins.

Crash windows (all bounded, all heal on retry):
- upsert writes the delta BEFORE reviving tombstones — a crash between the
  two swaps leaves a re-upserted, previously-tombstoned id invisible until
  the upsert is replayed (same window, same reasoning as
  `index_maintenance.upsert_ivf_sq8_store`).
- compact rewrites the base, which changes the store's directory
  signature, so it rewrites the meta sidecar with the new ``store_sig``
  (the ``build_id`` is STABLE — a params+centroids hash — so side tables
  and the centroid sidecar need no restamp). A crash between the base
  swap and the meta rewrite leaves a store `load_maxsim_store` refuses as
  torn; compact reads the RAW tables (meta for params, side tables
  checked against the META build id) and is convergent — re-running it
  from any crash point folds the same live view and completes the
  rewrite. A stale side table restored AFTER a successful compaction
  carries the same stable build id and overlays idempotently (its rows
  are already folded into the base; the anti-join + union reproduces the
  identical view — the `index_maintenance` crash-sim semantics, pinned in
  tests). Nothing is ever SERVED from a half-compacted state — the sig
  check guarantees that.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.index_maintenance import (
    _check_build,
    _read_side_table,
)
from photo_vector_search_spark.operators.late_interaction import (
    _load_maxsim_centroids,
    _serve_maxsim,
    doc_token_embeddings,
    load_maxsim_store,
    with_pooled_column,
)


def _base_partitioning(meta) -> list | None:
    return ["cluster_id"] if meta["n_clusters"] >= 1 else None


def _meta_keep_cols(meta) -> list[str]:
    """keep_cols recorded at build (empty for stores predating the field —
    Row lookup on a missing column raises, old sidecars have none)."""
    try:
        raw = meta["keep_cols"]
    except Exception:
        return []
    return [c for c in (raw or "").split(",") if c]


def _embed_against_build(spark, path, meta, new_docs: DataFrame, text_col: str):
    """Re-embed ONLY the new docs under the build's frozen parameters
    (max_tokens, dim, centroids) — the O(delta) half of the contract. A
    keep_cols store requires the same metadata columns on the upsert batch
    (delta rows must union with the base schema)."""
    keep = _meta_keep_cols(meta)
    missing = [c for c in keep if c not in new_docs.columns]
    if missing:
        raise ValueError(
            f"store was built with keep_cols={keep} but the upsert batch "
            f"lacks {missing} — supply the metadata columns"
        )
    toks = with_pooled_column(
        doc_token_embeddings(
            new_docs,
            text_col=text_col,
            id_col=meta["id_col"],
            max_tokens=meta["max_tokens"],
            dim=meta["dim"],
        ),
        id_col=meta["id_col"],
    )
    if keep:
        toks = toks.join(new_docs.select(meta["id_col"], *keep), meta["id_col"])
    if meta["n_clusters"] >= 1:
        from photo_vector_search_spark.operators.ann import assign_clusters

        centroids = _load_maxsim_centroids(spark, path, meta)
        toks = assign_clusters(
            toks.withColumnRenamed("pooled", "embedding"), centroids
        ).withColumnRenamed("embedding", "pooled")
    return toks


def upsert_maxsim_store(
    spark, path: str, new_docs: DataFrame, text_col: str = "text"
) -> int:
    """Embed ``new_docs`` against the store's frozen build and merge them
    into the delta segment (same-id delta rows replaced, tombstones
    revived). Returns the number of upserted docs. O(new + delta) — the
    base is never rewritten; the embed pass runs over the NEW docs only."""
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    base, meta = load_maxsim_store(spark, path)
    id_col = meta["id_col"]
    n_new = new_docs.count()
    if n_new == 0:
        return 0
    ids = new_docs.select(F.col(id_col)).distinct()
    if ids.count() != n_new:
        raise ValueError("duplicate ids in the upsert batch — one row per id")
    coded = _embed_against_build(spark, path, meta, new_docs, text_col).withColumn(
        "build_id", F.lit(meta["build_id"])
    )
    n_coded = coded.count()
    if n_coded != n_new:
        # a doc that tokenizes to ZERO tokens produces no token matrix and
        # therefore no delta row — silently keeping its OLD base version
        # would violate delta-wins; make the caller decide (delete it, or
        # fix the text) instead of guessing
        raise ValueError(
            f"{n_new - n_coded} upsert doc(s) have NULL/empty text and "
            "produce no token matrix — an empty doc cannot shadow its old "
            "version; delete those ids instead (delete_from_maxsim_store)"
        )

    delta_path = path + ".delta"
    old_delta = _read_side_table(spark, delta_path)
    _check_build(delta_path, old_delta, meta["build_id"], "delta segment")
    if old_delta is not None:
        coded = coded.unionByName(
            old_delta.join(F.broadcast(ids), id_col, "left_anti")
        )
    # the new delta must be MATERIALIZED before the swap — a lazy plan
    # reading the old delta dir would race its own overwrite
    coded = coded.localCheckpoint(eager=True)
    snapshot_overwrite(coded, delta_path, partition_by=_base_partitioning(meta))

    # revive tombstoned ids (see module docstring for the crash window)
    ts_path = path + ".tombstones"
    ts = _read_side_table(spark, ts_path)
    _check_build(ts_path, ts, meta["build_id"], "tombstone set")
    if ts is not None:
        kept = ts.join(F.broadcast(ids), id_col, "left_anti").localCheckpoint(
            eager=True
        )
        snapshot_overwrite(kept, ts_path)
    return n_new


def delete_from_maxsim_store(spark, path: str, doc_ids) -> int:
    """Tombstone ``doc_ids`` (a list or a one-column DataFrame) and drop
    them from the delta. Returns the number of ids tombstoned."""
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    _, meta = load_maxsim_store(spark, path)
    id_col = meta["id_col"]
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col(doc_ids.columns[0]).alias(id_col)).distinct()
    else:
        ids = spark.createDataFrame(
            [(int(v),) for v in doc_ids], f"`{id_col}` long"
        ).distinct()
    n = ids.count()
    if n == 0:
        return 0

    ts_path = path + ".tombstones"
    old_ts = _read_side_table(spark, ts_path)
    _check_build(ts_path, old_ts, meta["build_id"], "tombstone set")
    new_ts = ids.withColumn("build_id", F.lit(meta["build_id"]))
    if old_ts is not None:
        new_ts = new_ts.unionByName(
            old_ts.join(F.broadcast(ids), id_col, "left_anti")
        ).distinct()
    snapshot_overwrite(new_ts.localCheckpoint(eager=True), ts_path)

    delta_path = path + ".delta"
    delta = _read_side_table(spark, delta_path)
    _check_build(delta_path, delta, meta["build_id"], "delta segment")
    if delta is not None:
        kept = delta.join(F.broadcast(ids), id_col, "left_anti").localCheckpoint(
            eager=True
        )
        snapshot_overwrite(kept, delta_path, partition_by=_base_partitioning(meta))
    return n


def load_live_maxsim(spark, path: str):
    """(live token frame, meta): delta ∪ (base anti delta-ids) − tombstones,
    every side table build-checked. Cluster/pool filters push through the
    union, so the base scan keeps its partition pruning."""
    base, meta = load_maxsim_store(spark, path)
    id_col = meta["id_col"]
    delta = _read_side_table(spark, path + ".delta")
    _check_build(path + ".delta", delta, meta["build_id"], "delta segment")
    ts = _read_side_table(spark, path + ".tombstones")
    _check_build(path + ".tombstones", ts, meta["build_id"], "tombstone set")

    live = base
    if delta is not None:
        live = base.join(
            F.broadcast(delta.select(id_col)), id_col, "left_anti"
        ).unionByName(delta.select(*base.columns))
    if ts is not None:
        live = live.join(F.broadcast(ts.select(id_col)), id_col, "left_anti")
    return live, meta


def live_maxsim_search(
    spark,
    path: str,
    query: str,
    k: int = 10,
    prefilter_n: int | None = None,
    max_query_tokens: int | None = None,
    fast: bool = True,
    nprobe: int | None = None,
    filter=None,
) -> DataFrame:
    """`maxsim_store_search` over the LIVE view (base + delta − tombstones):
    the serving call for a store growing through upserts between
    compactions. ≡ composing the corpora in memory, pinned in tests.
    ``filter`` (keep_cols stores): metadata predicate applied before the
    prefilter, pushed through the union to both the base and delta scans."""
    from photo_vector_search_spark.operators.late_interaction import (
        MAX_QUERY_TOKENS,
    )

    live, meta = load_live_maxsim(spark, path)
    centroids = (
        _load_maxsim_centroids(spark, path, meta)
        if nprobe is not None and meta["n_clusters"] >= 1
        else None
    )
    return _serve_maxsim(
        spark, live, meta, query, k=k, prefilter_n=prefilter_n,
        max_query_tokens=(
            MAX_QUERY_TOKENS if max_query_tokens is None else max_query_tokens
        ),
        fast=fast, nprobe=nprobe, centroids=centroids, filter=filter,
    )


def compact_maxsim_store(spark, path: str) -> int:
    """Fold delta and tombstones into the base and clear them. Rewriting
    the base changes the store's directory signature, so compact rewrites
    the meta sidecar with the new ``store_sig`` (``build_id`` is stable —
    no side-table or centroid restamp). Reads the RAW tables — side
    tables checked against the META build id, the signature deliberately
    NOT verified — so it converges when re-run from any crash point
    (module docstring); `load_maxsim_store` refuses to SERVE any
    intermediate state. Returns the compacted base row count."""
    from photo_vector_search_spark.operators.ann import _store_signature
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    meta_rows = spark.read.parquet(path + ".meta").collect()
    if len(meta_rows) != 1:
        raise ValueError(
            f"maxsim store sidecar at {path + '.meta'!r} has "
            f"{len(meta_rows)} rows, want exactly 1 — rebuild the store"
        )
    meta = meta_rows[0]
    id_col = meta["id_col"]
    base = spark.read.parquet(path)
    delta = _read_side_table(spark, path + ".delta")
    _check_build(path + ".delta", delta, meta["build_id"], "delta segment")
    ts = _read_side_table(spark, path + ".tombstones")
    _check_build(path + ".tombstones", ts, meta["build_id"], "tombstone set")

    live = base
    if delta is not None:
        live = base.join(
            F.broadcast(delta.select(id_col)), id_col, "left_anti"
        ).unionByName(delta.select(*base.columns))
    if ts is not None:
        live = live.join(F.broadcast(ts.select(id_col)), id_col, "left_anti")

    live = live.localCheckpoint(eager=True)
    n = live.count()
    snapshot_overwrite(live, path, partition_by=_base_partitioning(meta))
    snapshot_overwrite(
        spark.createDataFrame(
            [
                (
                    meta["build_id"],
                    _store_signature(path),
                    id_col,
                    meta["max_tokens"],
                    meta["dim"],
                    n,
                    meta["n_clusters"],
                    ",".join(_meta_keep_cols(meta)),
                )
            ],
            "build_id string, store_sig string, id_col string, "
            "max_tokens int, dim int, n_docs long, n_clusters int, "
            "keep_cols string",
        ),
        path + ".meta",
    )
    for side in (".tombstones", ".delta"):
        shutil.rmtree(path + side, ignore_errors=True)
        shutil.rmtree(path + side + ".old", ignore_errors=True)
    return n
