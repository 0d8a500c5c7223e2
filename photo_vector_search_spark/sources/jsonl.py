"""JSONL shard sink/source — the interchange format LLM training loaders
consume (one JSON object per line, fixed shard count, optionally gzip'd).

The engine's native storage is parquet (every store/snapshot); JSONL is the
EXPORT boundary: the last step of a curation pipeline hands shards to a
tokenizer/dataloader fleet that reads line-delimited JSON, not parquet. The
reference has no export surface at all (ChromaDB is its terminal store);
this is a north-star pipeline extension like the rest of the corpus
operators.

Scale design: sharding is ONE hash repartition on the shard key (deterministic
— the same row lands in the same shard under any input partitioning, unlike
round-robin ``repartition(n)``, whose assignment depends on the physical
split); each shard is written by exactly one task, so a 1000-shard export of
100 TB is 1000 parallel writers with no post-pass. Spark's JSON writer is
JVM-side (Jackson) — no Python in the path.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str = "doc_id",
    compression: str | None = "gzip",
) -> int:
    """Export ``df`` as JSONL part files under ``path`` — at most ``n_shards``
    (Spark writes NO file for an empty hash bucket, so skewed or tiny inputs
    can yield fewer; consumers provisioning one reader per shard index must
    iterate the files present, or the returned count).

    Rows are assigned to shards by hash of ``shard_key`` — deterministic and
    reproducible (re-running the export re-creates byte-stable shard
    MEMBERSHIP; row order within a shard follows task output order, so line
    order is not part of the contract — training loaders shuffle anyway, and
    the engine's ``shuffle_corpus`` provides a deterministic global order
    upstream when one is needed). Returns the number of part files written.

    Binary columns are base64-encoded by the JSON writer (Spark convention);
    this sink is for TEXT corpora — parquet remains the store format for
    multimodal payloads.

    The returned count comes from a driver-local directory listing — the same
    POSIX-path assumption as the LSH staging default (``minhash_lsh_pairs``):
    on a real cluster point ``path`` at storage the driver can list (or treat
    the count as advisory; the writer guarantees ≤ n_shards part files
    regardless)."""
    writer = (
        df.repartition(n_shards, F.col(shard_key))
        .write.mode("overwrite")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return len(_part_files(path))


def read_jsonl_shards(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a JSONL shard directory (or any line-delimited JSON tree) back
    into a DataFrame. Pass ``schema`` (DDL string) to skip the inference scan
    — at scale, inference reads every byte once before the real job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def _part_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(path, "part-*"))
        if not p.endswith((".crc", "_SUCCESS"))
    ]
