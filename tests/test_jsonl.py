"""JSONL export/import: exact shard count, deterministic membership under
re-partitioning, and value round-trip for a text corpus."""

from __future__ import annotations

import gzip
import json
import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.sources.jsonl import (
    _part_files,
    read_jsonl_shards,
    write_jsonl_shards,
)
from photo_vector_search_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (r["doc_id"], r["source"], r["text"]) for r in df.collect()
    )


def test_jsonl_roundtrip_and_shard_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tmp = tempfile.mkdtemp(prefix="pvs_jsonl_")
    try:
        n = write_jsonl_shards(docs, f"{tmp}/shards", n_shards=5)
        assert n == 5
        back = read_jsonl_shards(
            spark, f"{tmp}/shards", "doc_id long, source string, text string"
        )
        assert _rows(back) == _rows(docs)
        # the files really are line-delimited JSON (gzip default)
        part = _part_files(f"{tmp}/shards")[0]
        with gzip.open(part, "rt") as f:
            line = json.loads(f.readline())
        assert set(line) <= {"doc_id", "source", "text"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_jsonl_shard_membership_deterministic(spark, sf_dir):
    """Hash-keyed sharding: the same doc lands in a shard with the same member
    set regardless of the input's physical partitioning (round-robin
    repartition(n) fails this)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="pvs_jsonl_det_")

    def members(path):
        out = {}
        for p in sorted(_part_files(path)):
            with gzip.open(p, "rt") as f:
                out[frozenset(json.loads(ln)["doc_id"] for ln in f)] = True
        return set(out)

    try:
        write_jsonl_shards(docs.repartition(7), f"{tmp}/a", n_shards=4)
        write_jsonl_shards(docs.coalesce(1), f"{tmp}/b", n_shards=4)
        assert members(f"{tmp}/a") == members(f"{tmp}/b")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
