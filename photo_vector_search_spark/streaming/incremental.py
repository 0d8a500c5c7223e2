"""Incremental indexing via Structured Streaming (SURVEY §2.9 S1, §7 phase 5).

The reference re-runs `index-photos` by hand; its deterministic ids
(photo_vector_search.py:127) make re-indexing idempotent. The streaming form keeps
that contract: a file-source stream of new photo batches, each micro-batch pushed
through the same ``index_photos`` pipeline inside ``foreachBatch`` and merged into
the Parquet store with a snapshot swap. No watermarks/event-time — the keyed
upsert is idempotent by construction, so at-least-once delivery is enough.

Scale notes: ``foreachBatch`` + merge is the standard Spark pattern for streaming
upserts into a table without a table format. With Delta/Iceberg the snapshot swap
becomes a MERGE INTO commit; nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from photo_vector_search_spark.operators.store import recover_store, snapshot_overwrite
from photo_vector_search_spark.pipelines.embed import (
    Describer,
    Embedder,
    index_photos,
)

FILES_SCHEMA = "path string, content binary"


def incremental_index(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    embedder: Embedder | None = None,
    describer: Describer | None = None,
    available_now: bool = True,
):
    """Stream parquet batches of (path, content) from ``input_dir`` and upsert
    them into the embeddings store at ``store_path``.

    ``available_now=True`` drains everything currently available then stops —
    the batch-catchup trigger (used in tests and backfills); pass False for a
    continuously running micro-batch stream."""

    stream = (
        spark.readStream.schema(FILES_SCHEMA).format("parquet").load(input_dir)
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        recover_store(store_path)  # restore from .old if a prior swap crashed
        existing = None
        if os.path.exists(store_path):
            existing = spark_b.read.parquet(store_path)
        new_state = index_photos(
            batch_df, existing=existing, embedder=embedder, describer=describer
        )
        snapshot_overwrite(new_state, store_path)

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
