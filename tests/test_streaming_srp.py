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
