"""MLlib LSH variants (SURVEY §2.10 table: MinHashLSH / BucketedRandomProjectionLSH)
cross-checked against this engine's exact operators — the built-in alternatives a
Spark deployment may prefer; VectorUDT conversions stay localized here
(SURVEY §7 'nothing requires custom types')."""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.linalg import Vectors, VectorUDT
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens, word_shingles
from photo_vector_search_spark.operators.dedup import (
    embedding_near_dup_pairs,
    jaccard_pairs,
)
from photo_vector_search_spark.sources.tables import load_table


def test_mllib_minhash_lsh_recovers_exact_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id", word_shingles(tokens(F.col("text")), 3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 16)
    feat = tf.transform(shingled)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feat)
    # approxSimilarityJoin threshold is JACCARD DISTANCE (1 - sim)
    joined = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jd")
    got = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id")).collect()
    }
    exact = {(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, 3, 0.5).collect()}
    # HashingTF buckets shingles (collisions shift Jaccard slightly) and LSH is
    # probabilistic — require high recall, not equality
    assert exact, "fixture must contain pairs"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"MLlib MinHashLSH recall {recall:.2f}"


def test_mllib_brp_lsh_vs_exact_cosine(spark, sf_dir):
    """Euclidean BRP-LSH over L2-normalized vectors ranks like cosine:
    ‖a−b‖² = 2(1−cos). Check the τ=0.4 exact pair set is recovered."""
    emb = load_table(spark, sf_dir, "embeddings")
    import numpy as np

    @F.udf(VectorUDT())
    def to_unit_vec(a):
        v = np.asarray(a, dtype=float)
        n = np.linalg.norm(v) or 1.0
        return Vectors.dense((v / n).tolist())

    feat = emb.select("vec_id", to_unit_vec("embedding").alias("features"))
    # cos >= 0.4  ⇔  euclid <= sqrt(2*(1-0.4)) ≈ 1.0954 on unit vectors
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.8, numHashTables=6, seed=42
    )
    model = brp.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 1.0954, distCol="ed")
    got = {
        (r["datasetA"]["vec_id"], r["datasetB"]["vec_id"])
        for r in joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id")).collect()
    }
    exact = {(r.vec_a, r.vec_b) for r in embedding_near_dup_pairs(emb, tau=0.4).collect()}
    assert exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"MLlib BRP-LSH recall {recall:.2f}"
