"""Token-budget mixture sampling: rate math, budget attainment in
expectation, determinism, and a DuckDB twin of the full emission rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import token_count
from photo_vector_search_spark.operators.mixing import (
    mix_corpus,
    mixture_rates,
    source_token_totals,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches

WEIGHTS = {"src0": 0.6, "src1": 0.3, "src2": 0.1}


def test_mixture_rates_math():
    totals = [("src0", 1000), ("src1", 1000), ("src2", 4000)]
    rates = mixture_rates(totals, WEIGHTS, budget_tokens=2000)
    assert rates["src0"] == pytest.approx(0.6 * 2000 / 1000)  # 1.2 -> upsample
    assert rates["src1"] == pytest.approx(0.3 * 2000 / 1000)  # 0.6 -> downsample
    assert rates["src2"] == pytest.approx(0.1 * 2000 / 4000)  # 0.05
    # weights renormalize; zero-weight sources drop; missing-source raises
    assert "src2" not in mixture_rates(totals, {"src0": 2.0, "src2": 0.0}, 100)
    with pytest.raises(ValueError, match="no tokens"):
        mixture_rates(totals, {"ghost": 1.0}, 100)
    with pytest.raises(ValueError, match="positive"):
        mixture_rates(totals, WEIGHTS, 0)
    with pytest.raises(ValueError, match="positive entry"):
        mixture_rates(totals, {"src0": 0.0}, 100)


def test_budget_attained_in_expectation(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    corpus_tokens = docs.agg(
        F.sum(F.coalesce(token_count(F.col("text")), F.lit(0)))
    ).first()[0]
    budget = int(corpus_tokens * 1.5)  # forces upsampling on heavy-weight sources
    mixed = mix_corpus(docs, WEIGHTS, budget)
    got = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source")
        .agg(F.sum(F.coalesce(token_count(F.col("text")), F.lit(0))).alias("t"))
        .collect()
    }
    for s, w in WEIGHTS.items():
        target = w * budget
        assert got[s] == pytest.approx(target, rel=0.12), (s, got[s], target)
    # upsampled sources actually repeat docs across epochs
    assert mixed.agg(F.max("epoch")).first()[0] >= 1


def test_deterministic_and_partitioning_invariant(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    budget = 50_000
    a = {
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs.repartition(13), WEIGHTS, budget).select(
            "doc_id", "epoch"
        ).collect()
    }
    b = {
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs.coalesce(1), WEIGHTS, budget).select(
            "doc_id", "epoch"
        ).collect()
    }
    assert a == b and len(a) > 0
    # a different seed reshuffles the partial-epoch membership
    c = {
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs, WEIGHTS, budget, seed=1).select(
            "doc_id", "epoch"
        ).collect()
    }
    assert c != a


def test_duckdb_twin_emission_rule(spark, sf_correct):
    """The full rule — token totals, normalized rates, epoch explode,
    md5-uniform partial epoch — re-expressed in DuckDB over the same
    parquet; (doc_id, epoch) sets must match exactly."""
    docs = load_table(spark, sf_correct, "documents")
    budget = 60_000
    out = mix_corpus(docs, WEIGHTS, budget).select("doc_id", "source", "epoch")
    wsum = sum(WEIGHTS.values())
    weight_sql = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(WEIGHTS.items())
    )
    oracle = f"""
WITH tok AS (
  SELECT doc_id, source,
         CASE WHEN text IS NULL THEN 0
              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS nt,
         CASE {weight_sql} ELSE 0.0 END AS w
  FROM documents
),
totals AS (SELECT source, sum(nt) AS n_tokens FROM tok GROUP BY source),
rated AS (
  SELECT t.doc_id, t.source, (t.w / {wsum}) * {budget} / s.n_tokens AS rate
  FROM tok t JOIN totals s USING (source) WHERE t.w > 0
),
exploded AS (
  SELECT doc_id, source, rate, CAST(floor(rate) AS INT) AS n_full,
         unnest(generate_series(0, CAST(floor(rate) AS BIGINT))) AS epoch
  FROM rated
)
SELECT doc_id, source, CAST(epoch AS INT) AS epoch
FROM exploded
WHERE epoch < n_full
   OR (CAST(concat('0x', substring(md5('0-' || epoch || '|' || doc_id), 1, 12)) AS BIGINT) + 1)
      / power(16, 12) <= rate - n_full
"""
    assert_matches(out, oracle, sf_correct)


def test_temperature_weights_math():
    """w_s = n_s^alpha / sum n^alpha against a direct computation; the two
    endpoints (alpha=1 natural, alpha=0 uniform); monotone tail lift."""
    from photo_vector_search_spark.operators.mixing import temperature_weights

    totals = [("big", 900_000), ("mid", 90_000), ("tail", 10_000)]
    for alpha in (0.0, 0.3, 0.5, 1.0, 2.0):
        got = temperature_weights(totals, alpha)
        z = sum(n ** alpha for _, n in totals)
        for s, n in totals:
            assert got[s] == pytest.approx(n ** alpha / z, rel=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    nat = temperature_weights(totals, 1.0)
    assert nat["big"] == pytest.approx(0.9)
    uni = temperature_weights(totals, 0.0)
    assert all(w == pytest.approx(1 / 3) for w in uni.values())
    # XLM-R's alpha=0.3 sits strictly between natural and uniform for
    # every source: the tail is lifted, the head damped, order preserved
    t = temperature_weights(totals, 0.3)
    assert uni["tail"] > t["tail"] > nat["tail"]
    assert nat["big"] > t["big"] > uni["big"]
    assert t["big"] > t["mid"] > t["tail"]
    # zero-token sources are dropped; all-zero raises; negative alpha raises
    assert "empty" not in temperature_weights(totals + [("empty", 0)], 0.3)
    with pytest.raises(ValueError, match="tokens"):
        temperature_weights([("a", 0)], 0.3)
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(totals, -0.1)


def test_temperature_weights_compose_with_mix_corpus(spark, sf_correct):
    """The alpha-sampled mix reuses the SAME totals pass and lands each
    source's expected token share at w_s(alpha) of the budget."""
    from photo_vector_search_spark.operators.mixing import (
        mix_corpus,
        source_token_totals,
        temperature_weights,
    )

    docs = load_table(spark, sf_correct, "documents")
    totals = [
        (r["source"], r["n_tokens"])
        for r in source_token_totals(docs).collect()
    ]
    weights = temperature_weights(totals, alpha=0.3)
    budget = 30_000
    out = mix_corpus(docs, weights, budget, totals=totals)
    got = {
        r["source"]: r["n"]
        for r in out.withColumn(
            "tok", F.coalesce(token_count(F.col("text")), F.lit(0))
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("n"))
        .collect()
    }
    for s, w in weights.items():
        want = w * budget
        # doc-length granularity + per-doc Bernoulli draws: generous band
        assert want * 0.5 <= got.get(s, 0) <= want * 1.6, (s, got.get(s), want)
