"""Deterministic sampling operators (`operators/sampling`): the declared
weighted-reservoir query against its DuckDB twin, an INDEPENDENT
hashlib+NumPy replay of the whole A-ES selection, partitioning invariance,
statistical weight-monotonicity, fraction semantics, and guards."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.sampling import (
    sample_exact_n,
    sample_fraction,
    sample_weighted,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches


def _u(seed: int, key) -> float:
    """Python replay of functions.text.md5_uniform — hashlib, not Spark."""
    h = hashlib.md5(f"{seed}-{key}".encode()).hexdigest()
    return (int(h[:12], 16) + 1.0) / 16.0**12


def test_declared_sample_weighted_matches_oracle(spark, sf_dir):
    import __spark_entry__ as m

    assert_matches(
        m.queries()["sample_weighted"](spark, sf_dir),
        m.oracle_sql()["sample_weighted"],
        sf_dir,
    )


def test_weighted_matches_hashlib_numpy_replay(spark, sf_dir):
    """Full independent replay: hashlib md5 draws + numpy ln(u)/w keys +
    pandas per-stratum argsort must reproduce the engine's sample exactly
    (ids AND ranks)."""
    docs = load_table(spark, sf_dir, "documents")
    got = (
        sample_weighted(docs, 5, weight_col="n_chars", by="lang", seed=0)
        .select("doc_id", "lang", "sample_rank")
        .toPandas()
        .sort_values(["lang", "sample_rank"])
        .reset_index(drop=True)
    )
    pdf = docs.select("doc_id", "lang", "n_chars").toPandas()
    pdf = pdf[pdf.n_chars > 0].copy()
    pdf["aes"] = [
        math.log(_u(0, d)) / w for d, w in zip(pdf.doc_id, pdf.n_chars)
    ]
    rows = []
    for lang, g in pdf.groupby("lang"):
        g = g.sort_values(["aes", "doc_id"], ascending=[False, True]).head(5)
        for r, d in enumerate(g.doc_id, start=1):
            rows.append((int(d), lang, r))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "lang", "sample_rank"])
        .sort_values(["lang", "sample_rank"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()


def test_sample_is_partitioning_invariant(spark, sf_dir):
    """The draw is md5(key), not rand(): any repartition yields the same
    sample — the property seeded rand() loses."""
    docs = load_table(spark, sf_dir, "documents")
    a = set(
        sample_weighted(docs, 7, weight_col="n_chars", by="lang", seed=3)
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    b = set(
        sample_weighted(
            docs.repartition(17), 7, weight_col="n_chars", by="lang", seed=3
        )
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    assert a == b
    c = set(
        sample_fraction(docs, 0.3, key_col="doc_id", seed=1)
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    d = set(
        sample_fraction(docs.repartition(13), 0.3, key_col="doc_id", seed=1)
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    assert c == d


def test_fraction_matches_duckdb_and_dict_semantics(spark, sf_dir):
    """Per-stratum fractions: DuckDB replays the md5 threshold; strata
    absent from the dict are dropped (the explicit contract)."""
    docs = load_table(spark, sf_dir, "documents")
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )
    fr = {langs[0]: 0.5, langs[1]: 0.1}
    got = sample_fraction(docs, fr, by="lang", seed=2).select(
        "doc_id", "lang"
    )
    oracle = f"""
    SELECT doc_id, lang FROM documents
    WHERE (CAST(concat('0x', substring(md5('2-' || CAST(doc_id AS VARCHAR)),
                 1, 12)) AS BIGINT) + 1) / power(16, 12)
          <= CASE lang WHEN '{langs[0]}' THEN 0.5
                       WHEN '{langs[1]}' THEN 0.1 ELSE 0.0 END
    """
    assert_matches(got, oracle, sf_dir)
    kept_langs = {
        r["lang"] for r in got.select("lang").distinct().collect()
    }
    assert kept_langs <= {langs[0], langs[1]}


def test_fraction_rate_is_roughly_honored(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    kept = sample_fraction(docs, 0.25, seed=5).count()
    assert abs(kept / n - 0.25) < 0.1


def test_weight_monotonicity_over_seeds(spark):
    """Statistical contract: across many seeds, a 10x-weight row samples
    into a 1-of-4 reservoir far more often than a unit-weight row (A-ES
    inclusion probability is monotone in weight)."""
    rows = [(i, 10.0 if i == 0 else 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = light = 0
    for seed in range(120):
        pdf = [
            (r, math.log(_u(seed, i)) / w)
            for (i, w), r in zip(rows, range(len(rows)))
        ]
        # replay driver-side (cheap, exact same math as the operator)
        ids = sorted(range(len(rows)), key=lambda j: -pdf[j][1])[:1]
        heavy += 0 in ids
        light += 1 in ids
    # engine agrees with the replay on a couple of spot seeds
    for seed in (0, 7):
        got = set(
            sample_weighted(df, 1, weight_col="w", seed=seed)
            .select("doc_id")
            .toPandas()["doc_id"]
        )
        want = {
            min(
                range(len(rows)),
                key=lambda j: (-(math.log(_u(seed, j)) / rows[j][1]), j),
            )
        }
        assert got == want
    assert heavy > light * 3


def test_short_strata_return_all_and_ranks_contiguous(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 1.0), (3, "b", 1.0)],
        "doc_id long, lang string, w double",
    )
    got = (
        sample_weighted(df, 5, weight_col="w", by="lang")
        .toPandas()
        .sort_values(["lang", "sample_rank"])
    )
    assert len(got) == 3
    assert got[got.lang == "a"]["sample_rank"].tolist() == [1, 2]
    assert got[got.lang == "b"]["sample_rank"].tolist() == [1]


def test_nonpositive_and_null_weights_never_sample(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = set(
        sample_weighted(df, 10, weight_col="w")
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    assert got == {1, 5}


def test_exact_n_is_unit_weight_case(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sample_exact_n(docs, 6, by="lang", seed=9).select(
        "doc_id", "sample_rank"
    ).toPandas()
    b = sample_weighted(docs, 6, weight_col=None, by="lang", seed=9).select(
        "doc_id", "sample_rank"
    ).toPandas()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )


def test_global_form_is_takeordered_and_fraction_is_scanside(spark, sf_dir):
    """Scale shape: global weighted sample = TakeOrderedAndProject (no
    Exchange before the take); fraction sample = pure filter in the scan
    stage (zero exchanges anywhere)."""
    docs = load_table(spark, sf_dir, "documents")
    plan_g = (
        sample_weighted(docs, 5, weight_col="n_chars", seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan_g
    plan_f = (
        sample_fraction(docs, 0.2, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_f


def test_guards(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, lang string, w double")
    with pytest.raises(ValueError, match="n must be"):
        sample_weighted(df, 0, weight_col="w")
    with pytest.raises(ValueError, match="need `by`"):
        sample_fraction(df, {"a": 0.5})
    with pytest.raises(ValueError, match="must be in"):
        sample_fraction(df, 1.5)
    with pytest.raises(ValueError, match="must be in"):
        sample_fraction(df, {"a": -0.1}, by="lang")
