"""Regression tests for the round-6 ADVICE findings (fixed in round 7):
mixed-schema streaming-state reads, quality-scorer passthrough collisions,
and the curation substring stage's corpus-wide canonicalization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_read_state_family_merges_mixed_batch_schemas(spark, tmp_path):
    """Legacy (pre-fp) and r6 (fp) vector partitions mixed under one family:
    without mergeSchema the surviving schema depended on which footer Spark
    sampled — a legacy win silently dropped `fp` for EVERY partition and
    nondeterministically disabled the changed-embedding clash check. The
    merged read must surface `fp` with NULL for legacy rows, regardless of
    file order."""
    from photo_vector_search_spark.streaming.compaction import read_state_family

    state = str(tmp_path / "state")
    legacy = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    modern = spark.createDataFrame(
        [(2, [0.3, 0.4], "abc")], "vec_id long, embedding array<double>, fp string"
    )
    legacy.write.parquet(os.path.join(state, "vectors", "batch_id=0"))
    modern.write.parquet(os.path.join(state, "vectors", "batch_id=1"))

    got = read_state_family(spark, state, "vectors", current_batch=99)
    assert "fp" in got.columns
    rows = {r["vec_id"]: r["fp"] for r in got.collect()}
    assert rows == {1: None, 2: "abc"}


def test_score_quality_passes_through_ml_named_user_columns(spark):
    """User metadata columns named prediction/probability/rawPrediction must
    survive score_quality untouched (the model's own outputs use uniquified
    _q_* names) — previously transform either threw 'output column already
    exists' or the trailing drop deleted the user's columns."""
    from photo_vector_search_spark.pipelines.quality import (
        score_quality,
        train_quality_classifier,
    )

    pos = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, "zxq vvk jjw qqp zzt") for i in range(8, 16)],
        "doc_id long, text string",
    )
    model = train_quality_classifier(pos, neg, n_features=1 << 10, max_iter=10)

    docs = pos.withColumn("prediction", F.lit("user-kept")).withColumn(
        "probability", F.lit(0.5)
    ).withColumn("rawPrediction", F.lit("raw-kept"))
    scored = score_quality(docs, model)
    assert {"prediction", "probability", "rawPrediction", "quality_score"} <= set(
        scored.columns
    )
    row = scored.limit(1).collect()[0]
    assert row["prediction"] == "user-kept"
    assert row["probability"] == 0.5
    assert row["rawPrediction"] == "raw-kept"
    assert 0.0 <= row["quality_score"] <= 1.0


def test_curation_substring_stage_keeps_untouched_docs_verbatim(spark):
    """Enabling substring_ngram must NOT rewrite docs that lost no span:
    original casing/whitespace survives; only span-losing docs get the
    canonicalized rebuild, and stats reports how many."""
    from photo_vector_search_spark.pipelines.curation import curate_corpus

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"Original CASING  and   spacing preserved here. {shared}"),
        (2, f"{shared} trailing unique content two"),
        (3, "An UNTOUCHED Document   with odd   spacing."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, stats = curate_corpus(
        docs,
        quality_gate=False,
        substring_ngram=5,
        lsh_tau=0.95,
        compute_stats=True,
    )
    got = {r["doc_id"]: r["text"] for r in curated.collect()}
    # doc 3 lost nothing: byte-identical original text
    assert got[3] == "An UNTOUCHED Document   with odd   spacing."
    # exactly one of docs 1/2 holds the keeper span; the other was rewritten
    rewritten = [d for d in (1, 2) if shared not in got[d]]
    assert len(rewritten) == 1
    assert stats["substring_rewritten"] == 1
    # the keeper doc also kept its original surface
    keeper = ({1, 2} - set(rewritten)).pop()
    assert got[keeper] == dict(rows)[keeper]
