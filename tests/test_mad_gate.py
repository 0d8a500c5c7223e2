"""MAD outlier gate: DuckDB twin (exact percentiles), planted-outlier
behavior per group, zero-spread and NULL conventions, and guards."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.pipelines.quality import mad_outlier_gate
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import run_oracle


def test_matches_duckdb_twin_grouped(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = {
        r["doc_id"]
        for r in mad_outlier_gate(
            docs, "n_chars", by="lang", k=2.0, exact=True
        ).collect()
    }
    want = set(
        run_oracle(
            """
            WITH med AS (
              SELECT lang, median(CAST(n_chars AS DOUBLE)) AS m
              FROM documents WHERE n_chars IS NOT NULL GROUP BY lang
            ),
            mad AS (
              SELECT d.lang, median(abs(CAST(d.n_chars AS DOUBLE) - med.m)) AS s
              FROM documents d JOIN med ON med.lang IS NOT DISTINCT FROM d.lang
              WHERE d.n_chars IS NOT NULL GROUP BY d.lang
            )
            SELECT d.doc_id
            FROM documents d
            JOIN med ON med.lang IS NOT DISTINCT FROM d.lang
            JOIN mad ON mad.lang IS NOT DISTINCT FROM d.lang
            WHERE mad.s = 0
               OR abs(CAST(d.n_chars AS DOUBLE) - med.m) <= 2.0 * 1.4826 * mad.s
            """,
            sf_correct,
        )["doc_id"]
    )
    assert got == want and len(got) > 0


def test_planted_outliers_dropped_per_group(spark):
    rows = [("a", i, 100.0 + (i % 7)) for i in range(40)]
    rows += [("a", 100, 10_000.0), ("a", 101, -5_000.0)]  # monsters in group a
    rows += [("b", 200 + i, 10_000.0 + (i % 5)) for i in range(40)]  # normal FOR b
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["lang", "doc_id", "sig"])
    )
    kept = {
        r["doc_id"]
        for r in mad_outlier_gate(docs, "sig", by="lang", k=3.0, exact=True).collect()
    }
    assert 100 not in kept and 101 not in kept  # outliers relative to group a
    assert all(200 + i in kept for i in range(40))  # 10k is NORMAL for group b
    assert all(i in kept for i in range(40))


def test_zero_spread_and_null_conventions(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "sig": [5.0, 5.0, 5.0, 5.0, 99.0, None],
        }
    )
    docs = spark.createDataFrame(pdf)
    # median 5, MAD 0 -> zero spread keeps the WHOLE group incl. 99
    kept = {r["doc_id"] for r in mad_outlier_gate(docs, "sig", exact=True).collect()}
    assert kept == {0, 1, 2, 3, 4, 5}
    # null_pass=False drops only the NULL row
    strict = {
        r["doc_id"]
        for r in mad_outlier_gate(docs, "sig", exact=True, null_pass=False).collect()
    }
    assert strict == {0, 1, 2, 3, 4}
    # schema is a pure filter
    out = mad_outlier_gate(docs, "sig", exact=True)
    assert out.columns == docs.columns


def test_global_gate_and_guards(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    out = mad_outlier_gate(docs, "n_chars", k=3.0, exact=True)
    assert 0 < out.count() <= docs.count()
    # sketch default agrees with exact on the fixture (sf percentiles are
    # well-separated; pin so a sketch-accuracy regression is visible)
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in mad_outlier_gate(docs, "n_chars", k=3.0).collect()}
    assert a == b
    with pytest.raises(ValueError, match="k must be"):
        mad_outlier_gate(docs, "n_chars", k=0)
