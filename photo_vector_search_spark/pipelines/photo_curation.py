"""Photo-corpus curation — the image-modality sibling of
``pipelines/curation.curate_corpus``: dedup a photo library BEFORE indexing
it, composing the individually-verified image operators into one pipeline
with per-stage survivor stats.

Stages (coarse-to-fine, each opt-out/opt-in):

1. **Exact dedup** — md5 content fingerprint, keep the lexically-first path
   of each byte-identical group (one narrow groupBy over (fp, path): the
   binary payload never shuffles).
2. **Decode gate** — undecodable files drop (counted); the pHash pass is the
   decoder, so the gate is free.
3. **Perceptual near-dup** — ``image_dedup.hamming_pairs`` (pair-band
   blocking, exact ≤ ``max_hamming`` verification), greedy keep-lowest-path
   (a photo drops iff it is the LARGER path of any near-dup pair — the
   SemDeDup upper-triangular rule, so the first path of every similar set
   always survives).
4. **Semantic near-dup** (opt-in, ``tau``) — embed the survivors
   (``embedder`` or the deterministic stub) and drop cosine-τ duplicates via
   ``operators/semdedup.semdedup`` with N-sized cluster blocking.

Returns ``(curated_files, stats)``: the surviving (path, content, …) rows —
feed them straight into ``pipelines.embed.index_photos`` — and per-stage
counts. Reference provenance: the reference indexes every scanned file
unconditionally (cli.py:41-61); dedup-before-index is the engine-native
extension a 10⁸-photo library needs (every stage is a derived-key join or
map-only Arrow pass — never all-pairs; see the operators' own scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_photos(
    files: DataFrame,
    max_hamming: int = 6,
    tau: float | None = None,
    embedder=None,
    n_clusters: int | None = None,
    decode_gate: bool = True,
    compute_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Deduplicate a photo corpus (``files``: path string, content binary,
    extra columns pass through). See the module docstring for the stage
    ladder. ``tau=None`` skips the semantic stage; ``n_clusters=None`` sizes
    the semantic blocking from the survivor count (~125 rows/cluster, the
    ``ivf_near_dup_pairs`` prescription — one count job).
    ``decode_gate=False`` KEEPS undecodable files (they can't participate in
    perceptual dedup — NULL hashes never pair — but still exact-dedup and
    index; the reference indexes every scannable file, so the CLI's
    ``--dedup`` uses this mode)."""
    from photo_vector_search_spark.operators.image_dedup import (
        hamming_pairs,
        phash_images,
    )
    from photo_vector_search_spark.operators.shuffle import (
        _rescan_safe_and_cheap,
    )
    from photo_vector_search_spark.operators.staging import stage_frame

    stats: dict[str, int] = {}

    def _stat(key: str, df: DataFrame) -> None:
        if compute_stats:
            stats[key] = df.count()

    # files feeds several consumers (fingerprint agg, hash pass, survivor
    # joins) — the house multi-consumer rule: stage unless it is a bare
    # deterministic scan (binaryFile directory scans are; re-reading
    # immutable files IS the staged read)
    if not _rescan_safe_and_cheap(files):
        files = stage_frame(files, "pvs_photo_curation_in")
    _stat("input", files)

    # 1. exact dedup: only (fp, path) shuffles; the binary payload stays put
    fp = files.select(
        "path", F.md5(F.coalesce(F.col("content"), F.lit(b""))).alias("_fp")
    )
    keep_exact = fp.groupBy("_fp").agg(F.min("path").alias("path")).select("path")
    survivors = files.join(keep_exact, "path", "left_semi")
    _stat("after_exact_dedup", survivors)

    # 2+3. decode gate + perceptual near-dup: ONE pHash pass is both (NULL
    # phash == undecodable). The hash frame is (path, phash) — narrow — and
    # feeds the band join twice plus the survivor anti-join, so stage it.
    hashed = stage_frame(
        phash_images(survivors.select("path", "content")).select(
            "path", "phash"
        ),
        "pvs_photo_curation_phash",
    )
    if decode_gate:
        decodable = hashed.filter(F.col("phash").isNotNull()).select("path")
        survivors = survivors.join(decodable, "path", "left_semi")
        _stat("after_decode_gate", survivors)

    pairs = hamming_pairs(
        hashed.filter(F.col("phash").isNotNull()), max_hamming=max_hamming
    )
    # pairs hold id_a < id_b (lexical); dropping every id_b keeps the first
    # path of each similar set — output-sized distinct + one anti-join
    dropped = pairs.select(F.col("id_b").alias("path")).distinct()
    survivors = survivors.join(dropped, "path", "left_anti")
    _stat("after_phash_dedup", survivors)

    if tau is not None:
        from photo_vector_search_spark.operators.semdedup import semdedup
        from photo_vector_search_spark.pipelines.embed import stub_embedder

        embedder = embedder or stub_embedder()
        emb = stage_frame(
            survivors.select(
                "path", embedder.udf()(F.col("content")).alias("embedding")
            ).filter(F.col("embedding").isNotNull()),
            "pvs_photo_curation_emb",
        )
        if n_clusters is None:
            n_clusters = max(8, emb.count() // 125)
        kept = semdedup(
            emb,
            tau=tau,
            n_clusters=n_clusters,
            id_col="path",
            vec_col="embedding",
        ).select("path")
        survivors = survivors.join(kept, "path", "left_semi")
        _stat("after_semantic_dedup", survivors)

    return survivors, stats
