"""Streaming embedding near-dup: completeness invariant vs the batch SRP
operator at the same pinned params, plus re-delivery idempotence."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import srp_lsh_near_dup_pairs
from photo_vector_search_spark.sources.tables import load_table
from photo_vector_search_spark.streaming.incremental import incremental_srp_dedup

PARAMS = dict(tau=0.45, n_planes=6, n_tables=16, seed=42)


def _pairs(df):
    return {(r["vec_a"], r["vec_b"], r["sim"]) for r in df.collect()}


def test_incremental_srp_dedup_matches_batch(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    expected = _pairs(srp_lsh_near_dup_pairs(emb, **PARAMS))
    assert len(expected) > 0

    tmp = tempfile.mkdtemp(prefix="pvs_srpstream_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        half1 = emb.filter(F.col("vec_id") % 2 == 0).withColumn("label", F.lit(0))
        half2 = emb.filter(F.col("vec_id") % 2 == 1).withColumn("label", F.lit(0))

        half1.write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)
        got1 = _pairs(spark.read.parquet(f"{state}/pairs").drop("batch_id"))
        assert got1 == {p for p in expected if p[0] % 2 == 0 and p[1] % 2 == 0}

        half2.write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)
        got2 = _pairs(spark.read.parquet(f"{state}/pairs").drop("batch_id"))
        assert got2 == expected  # streamed == batch on the union

        # re-delivery contributes nothing
        half1.write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)
        assert (
            _pairs(spark.read.parquet(f"{state}/pairs").drop("batch_id")) == expected
        )
        buckets = spark.read.parquet(f"{state}/buckets")
        assert buckets.select("vec_id").distinct().count() == emb.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_srp_dedup_replay_after_crash(spark, sf_dir):
    """Same replay contract as the text stream (separately implemented
    _read_state, separately tested): a crashed batch-0 attempt that committed
    all three state partitions must be reproducible from a fresh checkpoint
    without the anti-join suppressing the batch."""
    from photo_vector_search_spark.operators.dedup import (
        srp_bucket_rows,
        srp_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    expected = _pairs(srp_lsh_near_dup_pairs(half, **PARAMS))
    assert len(expected) > 0

    tmp = tempfile.mkdtemp(prefix="pvs_srpreplay_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        dim = len(half.first()["embedding"])
        planes = srp_planes(dim, PARAMS["n_planes"], PARAMS["n_tables"], PARAMS["seed"])
        srp_bucket_rows(half, planes).write.mode("overwrite").parquet(
            f"{state}/buckets/batch_id=0"
        )
        half.write.mode("overwrite").parquet(f"{state}/vectors/batch_id=0")
        spark.createDataFrame(
            sorted(expected), "vec_a long, vec_b long, sim double"
        ).write.mode("overwrite").parquet(f"{state}/pairs/batch_id=0")

        half.withColumn("label", F.lit(0)).write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)
        assert _pairs(spark.read.parquet(f"{state}/pairs").drop("batch_id")) == expected
        buckets = spark.read.parquet(f"{state}/buckets")
        assert buckets.select("vec_id").distinct().count() == half.count()
        assert buckets.select("batch_id").distinct().count() == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_srp_dedup_rejects_dim_drift(spark, sf_dir):
    """A re-embedded (different-dim) batch must raise loudly — old bucket
    keys are meaningless under new-dim planes, and silently accepting the
    batch would permanently lose every cross-batch pair (the batch operator
    raises on the same mixed-dim union)."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="pvs_srpdim_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        emb.limit(50).withColumn("label", F.lit(0)).write.mode("append").parquet(
            in_dir
        )
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)

        drifted = spark.createDataFrame(
            [(990001, [1.0, 0.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
        )
        drifted.write.mode("append").parquet(in_dir)
        q2 = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        with pytest.raises(Exception, match="state REBUILD|stream/state dim"):
            q2.awaitTermination(600)
            q2.processAllAvailable()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_srp_dedup_changed_embedding_raises(spark, sf_dir):
    """Append-only contract (vector twin): a re-delivered vec_id with a
    DIFFERENT embedding must raise, not silently keep the stale buckets."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(50)

    tmp = tempfile.mkdtemp(prefix="pvs_srpclash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        emb.withColumn("label", F.lit(0)).write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        assert q.awaitTermination(600)

        mutated = emb.withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x + F.lit(1.0)).cast(
                "array<float>"
            ),
        ).withColumn("label", F.lit(0))
        mutated.write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **PARAMS)
        with pytest.raises(Exception, match="DIFFERENT embedding"):
            q.awaitTermination(600)
            raise AssertionError("stream accepted changed embeddings silently")
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)
