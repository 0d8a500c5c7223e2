"""C4 line-level cleanup: pinned Raffel et al. §2.2 semantics on an
adversarial fixture, a DuckDB twin over the real documents table, the
zero-exchange plan claim, and composition with the boilerplate rung."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.pipelines.quality import c4_clean
from photo_vector_search_spark.sources.tables import load_table

FIXTURE = [
    (0, "This line survives with enough words here.\nshort line.\nAnother good line stays right here!\nDoes a question mark count as terminal today?\nno terminal punctuation on this line"),
    (1, 'He said "the quote ends the line properly today."\nSecond surviving line has many words today.\nThird surviving line also has many words today.'),
    (2, "Only one good line with enough words here.\nbad\nbad again"),  # < min_lines -> page drops
    (3, "A fine line with lorem ipsum inside stays long today.\nSecond fine line with enough words today.\nThird fine line with enough words today."),  # lorem ipsum -> drops
    (4, "A fine line with code = { inside } stays long today.\nSecond fine line with enough words today.\nThird fine line with enough words today."),  # brace -> drops
    (5, None),  # NULL -> drops
]


def test_pinned_c4_semantics(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    out = {r["doc_id"]: r["clean"] for r in c4_clean(docs).collect()}
    assert set(out) == {0, 1}
    assert out[0] == (
        "This line survives with enough words here.\n"
        "Another good line stays right here!\n"
        "Does a question mark count as terminal today?"
    )
    # end-quote after the period counts as terminal (the C4 rule)
    assert out[1].startswith('He said "the quote ends the line properly today."')
    assert len(out[1].split("\n")) == 3
    with pytest.raises(ValueError, match="min_words"):
        c4_clean(docs, min_words=0)
    with pytest.raises(ValueError, match="min_lines"):
        c4_clean(docs, min_lines=0)


def test_matches_duckdb_twin_on_real_corpus(spark, sf_correct):
    """Twin over the fixture documents (single-line docs: the line gate IS
    the doc gate at min_lines=1) plus a synthesized multi-line corpus."""
    # fixture docs carry no terminal punctuation — use the shared C4-shaped
    # synthesis (bench/plan-audit/twin all read the same corpus)
    from bench import fake_c4_docs

    docs = fake_c4_docs(spark, sf_correct)
    got = {
        r["doc_id"]: r["clean"]
        for r in c4_clean(docs, min_words=5, min_lines=2).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_correct}/documents.parquet')"
        )
        rows = con.execute(
            r"""
WITH d2 AS (
  SELECT doc_id,
         concat_ws(chr(10),
                   text || '.',
                   'tiny line.',
                   CASE WHEN doc_id % 7 = 0 THEN text END,
                   'This synthetic second line has enough words today.') AS text
  FROM documents WHERE text IS NOT NULL
),
kept AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           ln -> regexp_matches(ln, '[.!?]["”]?\s*$')
                 AND len(list_filter(regexp_split_to_array(trim(ln), '\s+'),
                                     w -> w <> '')) >= 5) AS ls
  FROM d2
)
SELECT doc_id, array_to_string(ls, chr(10)) AS clean
FROM kept
WHERE len(ls) >= 2
  AND NOT contains(lower(text), 'lorem ipsum')
  AND NOT contains(text, '{')
            """
        ).fetchall()
    finally:
        con.close()
    assert got == dict(rows)
    assert len(got) > 0


def test_zero_exchange_plan_and_boilerplate_composition(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    explained = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    # the whole operator lives in the scan stage: no Exchange anywhere
    assert "Exchange" not in explained
    # composes: C4 structural pass first, then the cross-doc frequency rung
    from photo_vector_search_spark.operators.dedup import remove_boilerplate_lines

    multi = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("This shared footer line has enough words today."),
        ).alias("text"),
    )
    cleaned = c4_clean(multi, min_words=3, min_lines=1).select(
        "doc_id", F.col("clean").alias("text")
    )
    deboiled = remove_boilerplate_lines(cleaned, min_docs=50)
    assert deboiled.filter(
        F.col("clean").contains("shared footer")
    ).count() == 0
