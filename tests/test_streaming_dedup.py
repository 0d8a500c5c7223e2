"""Streaming incremental near-dup: the accumulated pairs after draining any
batch sequence must equal the BATCH minhash_lsh_pairs over the union corpus
(completeness invariant), re-delivered doc_ids must contribute nothing, and
an empty drain must change nothing."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
from photo_vector_search_spark.sources.tables import load_table
from photo_vector_search_spark.streaming.incremental import (
    incremental_lsh_dedup,
    read_dedup_pairs,
)


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_lsh_dedup_matches_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = _pairs(minhash_lsh_pairs(docs, n=3, tau=0.5))
    assert len(expected) > 0  # the fixture must exercise the operator

    tmp = tempfile.mkdtemp(prefix="pvs_lshstream_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        half1 = docs.filter(F.col("doc_id") % 2 == 0)
        half2 = docs.filter(F.col("doc_id") % 2 == 1)

        half1.write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        assert q.awaitTermination(600)
        got1 = _pairs(read_dedup_pairs(spark, state))
        # after batch 1 only even-even pairs can exist, and all of them must
        assert got1 == {p for p in expected if p[0] % 2 == 0 and p[1] % 2 == 0}

        half2.write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        assert q.awaitTermination(600)
        got2 = _pairs(read_dedup_pairs(spark, state))
        assert got2 == expected  # completeness: streamed == batch on the union

        # re-delivery: the same docs under new file names add NOTHING
        half1.write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        assert q.awaitTermination(600)
        assert _pairs(read_dedup_pairs(spark, state)) == expected

        # state registry grew exactly once per doc
        bands = spark.read.parquet(f"{state}/bands")
        assert (
            bands.select("doc_id").distinct().count() == docs.count()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_lsh_dedup_replay_after_crash(spark, sf_dir):
    """Crash-and-replay: an attempt at batch 0 that committed ALL its state
    partitions (pairs, shingles, bands) but died before the checkpoint commit
    is replayed from scratch. The replay must not read the crashed attempt's
    own partitions as history — that would anti-join the whole batch away and
    overwrite its pairs with an empty set."""
    from photo_vector_search_spark.operators.dedup import (
        _bands_from_wide,
        _wide_signatures,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    expected1 = _pairs(minhash_lsh_pairs(half1, n=3, tau=0.5))
    assert len(expected1) > 0

    tmp = tempfile.mkdtemp(prefix="pvs_lshreplay_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        # the crashed attempt's full state for batch 0
        sh = shingle_sets(half1, 3)
        bands = _bands_from_wide(_wide_signatures(sh))
        for df, root in ((sh, "shingles"), (bands, "bands")):
            df.write.mode("overwrite").parquet(f"{state}/{root}/batch_id=0")
        spark.createDataFrame(
            sorted(expected1), "doc_a long, doc_b long, jaccard double"
        ).write.mode("overwrite").parquet(f"{state}/pairs/batch_id=0")

        # replay: fresh checkpoint re-delivers the same docs as batch 0
        half1.write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        assert q.awaitTermination(600)
        assert _pairs(read_dedup_pairs(spark, state)) == expected1
        # and the registry holds each doc exactly once
        bands_now = spark.read.parquet(f"{state}/bands")
        assert bands_now.select("doc_id").distinct().count() == half1.count()
        assert bands_now.select("batch_id").distinct().count() == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_lsh_dedup_changed_content_raises(spark, sf_dir):
    """Append-only contract: a re-delivered doc_id whose TEXT changed must
    raise (stale shingles/bands would silently diverge from the batch
    operator on the current corpus — ADVICE r5), not be dropped by the
    id-only anti-join."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)

    tmp = tempfile.mkdtemp(prefix="pvs_lshclash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        docs.write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        assert q.awaitTermination(600)

        # same ids, mutated text
        docs.withColumn("text", F.concat(F.col("text"), F.lit(" MUTATED"))).write.mode(
            "append"
        ).parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
            raise AssertionError("stream accepted changed content silently")
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)
