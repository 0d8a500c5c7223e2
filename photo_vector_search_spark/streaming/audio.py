"""Streaming audio near-dup detection — the Haitsma–Kalker family of the
incremental dedup suite, completing the modality trio (text MinHash-LSH and
embedding SRP in ``streaming/incremental.py``, image pHash in
``streaming/images.py``). Same state/commit/compaction discipline; the unit
of state is the FRAME (a track yields one 64-bit subfingerprint per
spectral frame), the unit of append-only delivery is the TRACK.

State layout (parquet, partitioned by micro-batch, exactly-once
overwrite-own-partition):

  ``atracks/batch_id=K`` (path, fp, n_frames) — the REGISTRY: one row per
                         known track; ``fp`` = md5 of the raw content
                         (append-only clash detection), ``n_frames`` 0 for
                         undecodable tracks (registered so a replayed bad
                         file is a no-op, but never banded). Written LAST —
                         the commit point.
  ``aframes/batch_id=K`` (fid, afp) — per-frame subfingerprints, the verify
                         state (``fid`` = ``path#frame_index``).
  ``abands/batch_id=K``  (fid, band, bkey) — the hamming band index.
  ``apairs/batch_id=K``  (track_a, track_b, n_shared_frames) — APPEND-ONLY
                         track-level result.

Completeness invariant (tested): drained pairs == the batch
``audio_near_dup`` over the union corpus. It holds because tracks arrive
WHOLE in one batch (append-only), so every track pair has a strictly-newer
member whose frames all sit in that batch and band-join against
history ∪ batch; the per-pair shared-frame count is therefore complete the
moment the newer track commits — track-level rollup rows never need
cross-batch merging.

Per-batch cost mirrors the pHash stream: each family scanned once, every
shuffle bounded by O(batch frames + candidates) (history bands semi-joined
to the batch's bucket keys, frame-hash probes semi-joined to the candidate
fids); after ``compact_dedup_state(kind='audio')`` the scans prune to the
hash-prefix partitions the batch touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.streaming.incremental import (
    _raise_on_in_batch_clash,
    _start_merge_stream,
    _touched_pfx,
)

AUDIO_SCHEMA = "path string, content binary"


def incremental_audio_dedup(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    checkpoint_dir: str,
    max_hamming: int = 6,
    n_bands: int = 8,
    min_shared_frames: int = 1,
    available_now: bool = True,
):
    """Stream (path, content) audio files; per micro-batch: fingerprint the
    new tracks (map-only Arrow, one 64-bit subfingerprint per spectral
    frame), band-join the new frames against the accumulated index, verify
    hamming exactly, roll frame matches up to track pairs, commit
    pairs + index + frames + registry. Append-only: an identical
    re-delivery is a no-op, changed content raises (rebuild via the batch
    operator). ``n_bands`` must divide 64; single-band pigeonhole
    completeness holds for ``max_hamming ≤ n_bands − 1``."""
    from photo_vector_search_spark.operators.image_dedup import (
        check_band_completeness,
    )

    check_band_completeness(max_hamming, n_bands)
    from photo_vector_search_spark.streaming.compaction import (
        check_band_layout,
    )

    check_band_layout(state_path, "abands", n_bands)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from photo_vector_search_spark.operators.audio_dedup import (
            audio_fingerprints,
        )
        from photo_vector_search_spark.operators.image_dedup import (
            band_rows,
            rollup_frame_pairs,
        )
        from photo_vector_search_spark.streaming.compaction import (
            load_manifest,
            read_state_family,
        )

        spark_b = batch_df.sparkSession
        mani = load_manifest(state_path)
        fped = batch_df.withColumn(
            "_fp", F.md5(F.coalesce(F.col("content"), F.lit(b"")))
        )
        _raise_on_in_batch_clash(fped, "path")
        new = fped.dropDuplicates(["path"])
        reg = read_state_family(
            spark_b,
            state_path,
            "atracks",
            batch_id,
            pfx_values=_touched_pfx(new.select("path"), "atracks", mani),
        )
        if reg is not None:
            hits = reg.join(
                F.broadcast(new.select("path", "_fp")), "path", "inner"
            ).persist()
            try:
                clash = (
                    hits.filter(F.col("fp") != F.col("_fp")).select("path").take(1)
                )
                if clash:
                    raise ValueError(
                        f"incremental_audio_dedup: re-delivered path "
                        f"{clash[0]['path']!r} has DIFFERENT content than the "
                        "accumulated state — the stream is append-only; "
                        "changed tracks require a state rebuild (re-run the "
                        "batch operator over the current corpus)"
                    )
                new = new.join(
                    F.broadcast(hits.select("path")), "path", "left_anti"
                )
            finally:
                hits.unpersist(blocking=True)

        # the BATCH operators are the single source of truth:
        # audio_fingerprints is the one fingerprint definition, band_rows the
        # one banding, rollup_frame_pairs the one track rollup — batch/stream
        # parity cannot drift
        fps = audio_fingerprints(new.select("path", "content")).persist()
        frames_new = (
            fps.filter(F.col("afp").isNotNull())
            .select(
                F.concat_ws("#", F.col("path"), F.col("frame_index")).alias(
                    "fid"
                ),
                "afp",
            )
            .persist()
        )
        bands_new = band_rows(frames_new, "fid", "afp", n_bands).select(
            "fid", "band", "bkey"
        ).persist()
        old_bands = read_state_family(
            spark_b,
            state_path,
            "abands",
            batch_id,
            pfx_values=_touched_pfx(
                bands_new.select("band", "bkey"), "abands", mani
            ),
        )
        if old_bands is not None:
            old_bands = old_bands.join(
                F.broadcast(bands_new.select("band", "bkey").distinct()),
                ["band", "bkey"],
                "left_semi",
            )
        all_bands = (
            bands_new if old_bands is None else bands_new.unionByName(old_bands)
        )
        l, r = bands_new.alias("l"), all_bands.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkey") == F.col("r.bkey"))
                & (F.col("l.fid") != F.col("r.fid")),
            )
            .select(
                F.least(F.col("l.fid"), F.col("r.fid")).alias("id_a"),
                F.greatest(F.col("l.fid"), F.col("r.fid")).alias("id_b"),
            )
            .distinct()
            .persist()
        )
        cand_ids = (
            cand.select(F.col("id_a").alias("fid"))
            .union(cand.select(F.col("id_b").alias("fid")))
            .distinct()
        )
        hashes = frames_new
        old_frames = read_state_family(
            spark_b,
            state_path,
            "aframes",
            batch_id,
            pfx_values=_touched_pfx(cand_ids, "aframes", mani),
        )
        if old_frames is not None:
            hashes = hashes.unionByName(
                old_frames.select("fid", "afp").join(
                    F.broadcast(cand_ids), "fid", "left_semi"
                )
            )
        ha = hashes.select(F.col("fid").alias("id_a"), F.col("afp").alias("_ha"))
        hb = hashes.select(F.col("fid").alias("id_b"), F.col("afp").alias("_hb"))
        ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        fpairs = (
            cand.join(ha, "id_a")
            .join(hb, "id_b")
            .filter(ham <= max_hamming)
            .select("id_a", "id_b")
        )
        pairs = rollup_frame_pairs(fpairs, min_shared_frames=min_shared_frames)
        registry = fps.groupBy("path").agg(
            F.sum(F.col("afp").isNotNull().cast("int")).alias("n_frames")
        ).join(F.broadcast(new.select("path", F.col("_fp").alias("fp"))), "path")
        try:
            # pairs first; the registry write LAST is the commit point
            pairs.write.mode("overwrite").parquet(
                f"{state_path}/apairs/batch_id={batch_id}"
            )
            bands_new.write.mode("overwrite").parquet(
                f"{state_path}/abands/batch_id={batch_id}"
            )
            frames_new.write.mode("overwrite").parquet(
                f"{state_path}/aframes/batch_id={batch_id}"
            )
            registry.select("path", "fp", "n_frames").write.mode(
                "overwrite"
            ).parquet(f"{state_path}/atracks/batch_id={batch_id}")
        finally:
            fps.unpersist(blocking=True)
            frames_new.unpersist(blocking=True)
            bands_new.unpersist(blocking=True)
            cand.unpersist(blocking=True)

    stream = (
        spark.readStream.schema(AUDIO_SCHEMA).format("parquet").load(input_dir)
    )
    return _start_merge_stream(stream, _merge_batch, checkpoint_dir, available_now)


def read_audio_pairs(spark: SparkSession, state_path: str) -> DataFrame:
    """The accumulated track-level near-dup pairs."""
    return spark.read.parquet(f"{state_path}/apairs").drop("batch_id")
