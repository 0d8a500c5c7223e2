"""Regression tests for the round-7 ADVICE findings (fixed in round 8):
positive-only mix-oracle weight normalization, SQL-hostile bloom probe
column names, and null-safe perplexity-cutoff joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mix_oracle_wsum_positive_only(monkeypatch, spark, sf_dir):
    """_mix_oracle must normalize by the POSITIVE weight sum, mirroring
    mixture_rates — a zero-weight source previously inflated the oracle's
    normalizer and silently diverged it from Spark."""
    from photo_vector_search_spark.plans import pipeline_queries as pq
    from tests.oracle import assert_matches

    weights = dict(pq.MIX_WEIGHTS)
    weights["src_dead"] = 0.0  # must not change any rate on either side
    monkeypatch.setattr(pq, "MIX_WEIGHTS", weights)
    assert_matches(pq.q_mix_corpus(spark, sf_dir), pq._mix_oracle(), sf_dir)


def test_bloom_probe_sql_hostile_column_names(spark):
    """Probe columns whose names need backtick quoting (spaces, dots,
    hyphens, embedded backticks) must parse; an input that already carries a
    _bloom_bits column must not collide with the internal bitmap column."""
    from photo_vector_search_spark.operators.bloom import (
        build_bloom,
        with_bloom_contains,
    )

    vals = spark.createDataFrame([("a",), ("b",), ("c",)], ["v"])
    model = build_bloom(vals, "v", fpp=0.01)

    hostile = ["the value", "dotted.name", "dash-ed", "back`tick"]
    for name in hostile:
        df = spark.createDataFrame(
            [("a", 1), ("zzz", 2)], ["x", "row"]
        ).withColumnRenamed("x", name)
        got = {
            r["row"]: r["bloom_hit"]
            for r in with_bloom_contains(df, model, name).collect()
        }
        assert got[1] is True, name  # member always hits (no false negatives)

    # pre-existing _bloom_bits column survives untouched
    df = spark.createDataFrame(
        [("a", [1, 2]), ("zzz", [3])], "v string, _bloom_bits array<bigint>"
    )
    out = with_bloom_contains(df, model, "v")
    rows = {tuple(r["_bloom_bits"]): r["bloom_hit"] for r in out.collect()}
    assert rows[(1, 2)] is True
    assert "_bloom_bits" in out.columns


def test_perplexity_buckets_null_group_gets_own_cutoffs(spark):
    """Docs whose group key is NULL must be bucketed against the NULL
    group's cutoffs, not auto-labeled 'tail' (the equi-join NULL != NULL
    trap). Build two groups with disjoint nll ranges; if the NULL group
    matched nothing, all its docs would be 'tail'."""
    from photo_vector_search_spark.plans.text_queries import (
        perplexity_buckets,
        train_bigram_lm,
    )

    # 9 docs per group: repeated-phrase docs score low nll; the group split
    # (lang='en' vs NULL) must each get head/middle/tail within the group.
    rows = []
    base = "alpha beta gamma delta"
    for i in range(9):
        rows.append((i, base + " " + " ".join(["w%d" % (i % 3)] * (i + 2)), "en"))
    for i in range(9, 18):
        rows.append((i, base + " " + " ".join(["v%d" % (i % 3)] * (i + 2)), None))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    lm, vocab = train_bigram_lm(docs)
    out = perplexity_buckets(docs, lm, vocab, by="lang").collect()
    null_buckets = {r["bucket"] for r in out if r["lang"] is None}
    # with the fix the NULL group spans buckets; pre-fix it was {'tail'} only
    assert "head" in null_buckets, null_buckets
    assert len(null_buckets) >= 2, null_buckets
