"""Relational Bloom filter: zero false negatives (guaranteed), FP rate within
the configured budget, decontamination parity vs the exact semi-join
(exact-flagged ⊆ bloom-flagged, per-doc overlap never undercounts), sizing
math, and NULL/guard contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.bloom import (
    MAX_BITS,
    bloom_params,
    build_bloom,
    decontaminate_bloom,
    with_bloom_contains,
)
from photo_vector_search_spark.sources.tables import load_table


def test_params_math():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # optimum ≈ 9.585 bits/item at 1%, k ≈ 7
    assert abs(m - 9.585 * 1000) < 128
    assert k == round(m / 1000 * math.log(2))
    with pytest.raises(ValueError, match="positive"):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError, match="fpp"):
        bloom_params(10, 1.5)
    with pytest.raises(ValueError, match="exact semi-join"):
        bloom_params(MAX_BITS, 1e-9)


def test_no_false_negatives_and_fp_budget(spark):
    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(2000)], "v string"
    )
    model = build_bloom(members, "v", fpp=0.01)
    # every member hits
    hits = with_bloom_contains(members, model, "v")
    assert hits.filter(~F.col("bloom_hit")).count() == 0
    # non-members false-hit at ≈ fpp (allow 3x slack on 10k trials)
    probes = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(10_000)], "v string"
    )
    fp = with_bloom_contains(probes, model, "v").filter("bloom_hit").count()
    assert fp <= 0.03 * 10_000, fp
    # NULLs never hit
    nulls = spark.createDataFrame([(None,), ("member-5",)], "v string")
    got = {
        r["v"]: r["bloom_hit"]
        for r in with_bloom_contains(nulls, model, "v").collect()
    }
    assert got[None] is False and got["member-5"] is True


def test_expected_items_skips_count_but_sizes_same(spark):
    members = spark.createDataFrame([(f"x{i}",) for i in range(500)], "v string")
    a = build_bloom(members, "v", fpp=0.01)
    b = build_bloom(members, "v", expected_items=500, fpp=0.01)
    assert (a.n_bits, a.n_hashes, a.words) == (b.n_bits, b.n_hashes, b.words)
    assert a.n_set_bits > 0


def test_decontaminate_bloom_superset_of_exact(spark, sf_correct):
    """The scale rung can only OVER-flag: exact-flagged docs all appear with
    n_overlap >= the exact count, and the extra flags stay near the FP
    budget (each clean shingle false-hits w.p. ≈ fpp, and min_overlap=5
    demands five hits in one doc)."""
    from photo_vector_search_spark.plans.text_queries import QUERIES

    docs = load_table(spark, sf_correct, "documents")
    bench_ids = docs.filter(F.col("doc_id") < 20).select("doc_id")
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in QUERIES["decontaminate"](spark, sf_correct).collect()
    }
    bloom = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate_bloom(
            docs, bench_ids, n=3, min_overlap=5, fpp=0.01
        ).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, d
    # extra flags are docs with GENUINE sub-threshold overlap (the corpus
    # has near-dups sharing trigrams with the benchmark) plus per-doc FPs
    # that scale with doc length (Binomial(n_shingles, fpp)) — the
    # principled corpus-level check is the TOTAL false-hit budget over all
    # train-shingle probes, same as the synthetic test but on real text
    from photo_vector_search_spark.operators.bloom import build_bloom
    from photo_vector_search_spark.operators.dedup import shingle_sets

    sh = shingle_sets(docs, n=3)
    bench_sh = sh.join(bench_ids, "doc_id").select("shingle").distinct()
    train_sh = sh.join(bench_ids, "doc_id", "left_anti")
    model = build_bloom(bench_sh, "shingle", fpp=0.01)
    probed = with_bloom_contains(train_sh, model, "shingle")
    true_hits = train_sh.join(bench_sh, "shingle").count()
    bloom_hits = probed.filter("bloom_hit").count()
    n_probes = train_sh.count()
    fps = bloom_hits - true_hits
    assert fps >= 0
    assert fps <= 0.03 * n_probes, (fps, n_probes)  # 3x slack on the 1% budget


def test_broadcast_compression_measured(spark, sf_correct):
    """The claim decontaminate_bloom rests on, measured on real shingles:
    the bitmap broadcast is an order of magnitude smaller than the exact
    string set it replaces."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.operators.dedup import shingle_sets
    from photo_vector_search_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents")
    bench_sh = (
        shingle_sets(docs.filter(F.col("doc_id") < 20), n=3)
        .select("shingle")
        .distinct()
    )
    exact_bytes = bench_sh.agg(
        F.sum(F.length("shingle")).alias("b")
    ).first()["b"]
    model = build_bloom(bench_sh, "shingle", fpp=0.01)
    bloom_bytes = model.n_bits // 8
    assert bloom_bytes * 8 <= exact_bytes, (bloom_bytes, exact_bytes)
    # record the ratio in the assertion message space: ≥8x smaller here
