"""Streaming image near-dup detection — the pHash family of the incremental
dedup suite (text MinHash-LSH and embedding SRP live in
``streaming/incremental.py``; this brings the image modality under the same
state/commit/compaction discipline).

State layout (parquet, partitioned by micro-batch, same exactly-once
overwrite-own-partition rule as the LSH/SRP streams):

  ``images/batch_id=K``  (path, phash, fp) — the REGISTRY: one narrow row
                         per known image; ``fp`` = md5 of the raw content
                         (append-only clash detection), ``phash`` NULL for
                         undecodable rows (registered so a replayed bad file
                         is a no-op, but never banded). Written LAST — the
                         commit point.
  ``ibands/batch_id=K``  (path, band, bkey) — the 8×8-bit hamming band index.
  ``pairs/batch_id=K``   (id_a, id_b, hamming) — APPEND-ONLY result.

The 64-bit hash IS the verify state (no third family like LSH's shingles):
candidates fetch both hashes from batch ∪ registry and check
``bit_count(xor) ≤ max_hamming`` exactly.

Completeness invariant (tested): drained pairs == the batch
``image_near_dup`` over the union corpus — every pair has a strictly-newer
member, and that member's batch band-joins against history ∪ batch.

Per-batch cost mirrors the LSH stream's honest contract: each family is
scanned once per batch, every shuffle bounded by O(batch + candidates)
(history bands semi-joined down to the batch's bucket keys, registry probes
broadcast the batch's ids); after ``compact_dedup_state(kind='phash')`` the
scans prune to the hash-prefix partitions the batch touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.streaming.incremental import (
    _raise_on_in_batch_clash,
    _start_merge_stream,
    _touched_pfx,
)

IMAGES_SCHEMA = "path string, content binary"


def incremental_phash_dedup(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    checkpoint_dir: str,
    max_hamming: int = 6,
    n_bands: int = 8,
    available_now: bool = True,
):
    """Stream (path, content) image files; per micro-batch: pHash the new
    images (map-only Arrow), band-join against the accumulated index, verify
    hamming exactly, commit pairs + index + registry. Append-only: an
    identical re-delivery is a no-op, changed content raises (rebuild via
    the batch operator). ``n_bands`` must divide 64; pigeonhole completeness
    holds for ``max_hamming ≤ n_bands − 1``."""
    from photo_vector_search_spark.operators.image_dedup import (
        check_band_completeness,
    )

    check_band_completeness(max_hamming, n_bands)
    from photo_vector_search_spark.streaming.compaction import (
        check_band_layout,
    )

    check_band_layout(state_path, "ibands", n_bands)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from photo_vector_search_spark.operators.image_dedup import (
            band_rows,
            phash_images,
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
            "images",
            batch_id,
            pfx_values=_touched_pfx(new.select("path"), "images", mani),
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
                        f"incremental_phash_dedup: re-delivered path "
                        f"{clash[0]['path']!r} has DIFFERENT content than the "
                        "accumulated state — the stream is append-only; "
                        "changed images require a state rebuild (re-run the "
                        "batch operator over the current corpus)"
                    )
                known = hits.select("path")
                new = new.join(F.broadcast(known), "path", "left_anti")
            finally:
                hits.unpersist(blocking=True)

        # the BATCH operators are the single source of truth: phash_images
        # passes every input column through, and band_rows is the one banding
        # definition hamming_pairs uses — batch/stream parity cannot drift
        hashed = phash_images(
            new.select("path", "content", F.col("_fp").alias("fp"))
        ).select("path", "phash", "fp").persist()
        bands_new = band_rows(
            hashed.select("path", "phash"), "path", "phash", n_bands
        ).select("path", "band", "bkey").persist()
        old_bands = read_state_family(
            spark_b,
            state_path,
            "ibands",
            batch_id,
            pfx_values=_touched_pfx(
                bands_new.select("band", "bkey"), "ibands", mani
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
                & (F.col("l.path") != F.col("r.path")),
            )
            .select(
                F.least(F.col("l.path"), F.col("r.path")).alias("id_a"),
                F.greatest(F.col("l.path"), F.col("r.path")).alias("id_b"),
            )
            .distinct()
            .persist()
        )
        cand_ids = (
            cand.select(F.col("id_a").alias("path"))
            .union(cand.select(F.col("id_b").alias("path")))
            .distinct()
        )
        hashes = hashed.select("path", "phash")
        old_reg = read_state_family(
            spark_b,
            state_path,
            "images",
            batch_id,
            pfx_values=_touched_pfx(cand_ids, "images", mani),
        )
        if old_reg is not None:
            hashes = hashes.unionByName(
                old_reg.select("path", "phash").join(
                    F.broadcast(cand_ids), "path", "left_semi"
                )
            )
        ha = hashes.select(F.col("path").alias("id_a"), F.col("phash").alias("_ha"))
        hb = hashes.select(F.col("path").alias("id_b"), F.col("phash").alias("_hb"))
        ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        pairs = (
            cand.join(ha, "id_a")
            .join(hb, "id_b")
            .filter(ham <= max_hamming)
            .select("id_a", "id_b", ham.alias("hamming"))
        )
        try:
            # pairs first; the registry write LAST is the commit point
            pairs.write.mode("overwrite").parquet(
                f"{state_path}/pairs/batch_id={batch_id}"
            )
            bands_new.write.mode("overwrite").parquet(
                f"{state_path}/ibands/batch_id={batch_id}"
            )
            hashed.select("path", "phash", "fp").write.mode("overwrite").parquet(
                f"{state_path}/images/batch_id={batch_id}"
            )
        finally:
            hashed.unpersist(blocking=True)
            bands_new.unpersist(blocking=True)
            cand.unpersist(blocking=True)

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA).format("parquet").load(input_dir)
    )
    return _start_merge_stream(stream, _merge_batch, checkpoint_dir, available_now)


def read_image_pairs(spark: SparkSession, state_path: str) -> DataFrame:
    """The accumulated near-dup image pairs."""
    return spark.read.parquet(f"{state_path}/pairs").drop("batch_id")
