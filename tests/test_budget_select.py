"""Token-budget selection: parity with the textbook global-window prefix,
edge budgets, NULL/zero-token handling, tie floods at the boundary, both
walk directions, and partitioning invariance."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import token_count
from photo_vector_search_spark.operators.selection import budget_select
from photo_vector_search_spark.sources.tables import load_table


def _reference_keep(rows, budget, ascending):
    """Global-order prefix walk in plain Python: rank by (score, NULLs last,
    doc_id), keep while the cumulative token count stays <= budget."""
    def key(r):
        score = r["score"]
        null = score is None
        k = float("inf") if null else (score if ascending else -score)
        return (k, r["doc_id"])

    kept, cum = set(), 0
    for r in sorted(rows, key=key):
        cum += r["tok"]
        if cum > budget:
            break
        kept.add(r["doc_id"])
    return kept


def _scored_docs(spark, sf_correct):
    """sf documents with a deterministic synthetic score: NULL for one lang
    band (unscoreable tier), heavy TIES via round-to-1dp so the boundary
    bucket widens, plus the real token counts materialized for the
    reference walk."""
    return (
        load_table(spark, sf_correct, "documents")
        .withColumn(
            "score",
            F.when(
                F.col("lang") == "de", F.lit(None).cast("double")
            ).otherwise(F.round(F.pmod(F.xxhash64("doc_id"), F.lit(97)) / 10.0, 1)),
        )
        .withColumn("tok", F.coalesce(token_count(F.col("text")), F.lit(0)))
    )


def _spark_vs_reference(docs, budget, ascending, **kw):
    rows = [r.asDict() for r in docs.select("doc_id", "score", "tok").collect()]
    want = _reference_keep(rows, budget, ascending)
    got = {
        r["doc_id"]
        for r in budget_select(
            docs, budget, score_col="score", ascending=ascending, **kw
        )
        .select("doc_id")
        .collect()
    }
    assert got == want, (
        f"budget={budget} ascending={ascending}: "
        f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
    )
    return want


def test_matches_global_prefix_descending(spark, sf_correct):
    docs = _scored_docs(spark, sf_correct)
    total = docs.agg(F.sum("tok")).first()[0]
    # mid-corpus crossing, tiny budget, over-budget (keeps everything)
    for budget in (total // 3, 500, total + 1):
        kept = _spark_vs_reference(docs, budget, ascending=False)
        if budget > total:
            assert len(kept) == docs.count()


def test_matches_global_prefix_ascending(spark, sf_correct):
    # perplexity-style walk: LOWEST score first
    docs = _scored_docs(spark, sf_correct)
    total = docs.agg(F.sum("tok")).first()[0]
    _spark_vs_reference(docs, total // 4, ascending=True)


def test_null_scores_taken_last(spark, sf_correct):
    docs = _scored_docs(spark, sf_correct)
    scored_tokens = docs.filter(F.col("score").isNotNull()).agg(F.sum("tok")).first()[0]
    # budget covers every scored doc plus a sliver: NULL-score docs may only
    # appear once ALL scored docs are in
    out = budget_select(docs, scored_tokens + 1, score_col="score")
    n_scored = docs.filter(F.col("score").isNotNull()).count()
    assert out.filter(F.col("score").isNotNull()).count() == n_scored
    # below that budget no NULL-score doc is ever selected
    out2 = budget_select(docs, scored_tokens // 2, score_col="score")
    assert out2.filter(F.col("score").isNull()).count() == 0


def test_degenerate_buckets_and_tie_flood(spark):
    # every score EQUAL: one bucket holds the whole corpus; walk reduces to
    # pure doc_id order -> first-k-by-id semantics
    pdf = pd.DataFrame(
        {"doc_id": range(100), "score": [1.0] * 100, "text": ["a b c"] * 100}
    )
    docs = spark.createDataFrame(pdf)
    out = budget_select(docs, 30, score_col="score", n_buckets=16)
    assert {r["doc_id"] for r in out.collect()} == set(range(10))  # 3 tok each
    # n_buckets=1 (no sketch pass) agrees
    out1 = budget_select(docs, 30, score_col="score", n_buckets=1)
    assert {r["doc_id"] for r in out1.collect()} == set(range(10))


def test_zero_token_and_zero_budget(spark):
    # explicit token_col: zero-cost docs and a NULL count (costs 0 by the
    # mix_corpus convention)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "score": [9.0, 8.0, 7.0, 6.0],
            "tok_n": pd.array([0, None, 2, 0], dtype="Int64"),
            "text": ["", "", "x y", ""],
        }
    )
    docs = spark.createDataFrame(pdf)
    # budget 0: the leading zero-cost docs fit (cum stays 0); the first
    # priced doc crosses and strict-prefix drops it AND the zero-cost doc
    # after it
    out = {
        r["doc_id"]
        for r in budget_select(docs, 0, score_col="score", token_col="tok_n").collect()
    }
    assert out == {0, 1}
    # empty input
    empty = budget_select(docs.limit(0), 10, score_col="score")
    assert empty.count() == 0 and empty.columns == docs.columns


def test_token_col_and_schema_preserved(spark, sf_correct):
    docs = _scored_docs(spark, sf_correct)
    # explicit token_col path must agree with the text_col default
    a = {
        r["doc_id"]
        for r in budget_select(docs, 9000, score_col="score", token_col="tok")
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in budget_select(docs, 9000, score_col="score").select("doc_id").collect()
    }
    assert a == b
    out = budget_select(docs, 9000, score_col="score", token_col="tok")
    assert out.columns == docs.columns  # selection is a pure filter


def test_partitioning_invariant(spark, sf_correct):
    docs = _scored_docs(spark, sf_correct)
    budget = 12_345
    a = {
        r["doc_id"]
        for r in budget_select(docs.repartition(17), budget, score_col="score")
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in budget_select(docs.coalesce(1), budget, score_col="score")
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_usage_errors(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "score": [1.0], "text": ["x"]})
    )
    with pytest.raises(ValueError, match="budget_tokens"):
        budget_select(docs, -1, score_col="score")
    with pytest.raises(ValueError, match="n_buckets"):
        budget_select(docs, 1, score_col="score", n_buckets=0)
