"""Paragraph keep-first dedup: Spark vs a DuckDB twin of the same
split/winner/join/rebuild algorithm, plus the semantics the docstring pins —
earliest (doc_id, pos) survives, within-doc repeats collapse, blank and
under-min paragraphs are exempt, fully-deduped docs drop — and composition
with the boilerplate rung on real fixture documents."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import (
    dedup_paragraphs,
    remove_boilerplate_lines,
)
from photo_vector_search_spark.sources.tables import load_table

QUOTE = "The quick brown fox jumps over the lazy dog."
SHORT = "Yes."
CORPUS = [
    (0, f"Original article body.\n{QUOTE}\nMore original text."),
    (1, f"{QUOTE}\nCommentary on the quote.\n{SHORT}"),  # quote repeated later
    (2, f"Reblog intro.\n{QUOTE}\n{QUOTE}"),  # cross-doc AND in-doc repeat
    (3, f"{SHORT}\nIndependent content."),  # short line repeats, exempt
    (4, f"{QUOTE}"),  # whole doc is a later copy -> drops entirely
    (5, "  \n \n"),  # blank structure, untouched
    (6, None),  # NULL -> no rows -> drops
]
MIN_CHARS = 5


def _duck_twin() -> dict[int, str]:
    con = duckdb.connect()
    try:
        con.register("docs", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        rows = con.execute(
            f"""
            WITH arr AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs
            ),
            lines AS (
              SELECT doc_id, ls[pos] AS line, pos
              FROM arr, LATERAL unnest(generate_series(1, len(ls))) AS g(pos)
            ),
            winners AS (
              SELECT line, doc_id AS w_doc, pos AS w_pos
              FROM (SELECT line, doc_id, pos,
                           row_number() OVER (PARTITION BY line
                                              ORDER BY doc_id, pos) AS rn
                    FROM lines WHERE length(trim(line)) >= {MIN_CHARS})
              WHERE rn = 1
            ),
            kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l LEFT JOIN winners w ON l.line = w.line
              WHERE w.w_doc IS NULL
                 OR (l.doc_id = w.w_doc AND l.pos = w.w_pos)
            )
            SELECT doc_id,
                   array_to_string(list(line ORDER BY pos), chr(10)) AS clean
            FROM kept GROUP BY doc_id
            """
        ).fetchall()
        return dict(rows)
    finally:
        con.close()


def test_matches_duckdb_twin_and_pinned_semantics(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean"]
        for r in dedup_paragraphs(docs, min_chars=MIN_CHARS).collect()
    }
    assert got == _duck_twin()
    # pinned semantics, independently of the twin:
    assert QUOTE in got[0]  # earliest occurrence survives in doc 0
    assert QUOTE not in got[1] and QUOTE not in got[2]  # later copies gone
    assert got[2] == "Reblog intro."  # in-doc repeat collapsed too
    assert got[1] == f"Commentary on the quote.\n{SHORT}"  # short exempt
    assert got[3] == f"{SHORT}\nIndependent content."
    assert 4 not in got  # whole-doc later copy drops
    assert got[5] == "  \n \n"  # blank structure untouched
    assert 6 not in got  # NULL drops


def test_partitioning_invariant_and_composes_with_boilerplate(spark, sf_correct):
    # synthesize multi-paragraph docs from the single-line fixtures by
    # pairing each doc with a shared quote paragraph
    base = load_table(spark, sf_correct, "documents").filter(
        F.col("doc_id") < 100
    )
    # quote in 10 docs (real repeated content), footer in all 100 (chrome):
    # the frequency rule at min_docs=50 must kill only the footer, the
    # keep-first rule then collapses the quote to one copy
    docs = base.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") < 10, F.lit(QUOTE)),
            F.col("text"),
            F.lit("Footer chrome line."),
        ).alias("text"),
    )
    a = {
        r["doc_id"]: r["clean"]
        for r in dedup_paragraphs(docs.repartition(13), min_chars=5).collect()
    }
    b = {
        r["doc_id"]: r["clean"]
        for r in dedup_paragraphs(docs.coalesce(1), min_chars=5).collect()
    }
    assert a == b
    # exactly ONE doc keeps the quote (the min doc_id among its carriers)
    keepers = [d for d, t in a.items() if QUOTE in t]
    assert keepers == [min(d for d in a if d < 10)]
    # composition: boilerplate first removes the footer from everyone,
    # paragraph dedup then keeps one quote copy
    deboiled = remove_boilerplate_lines(docs, min_docs=50).withColumnRenamed(
        "clean", "text"
    )
    final = {
        r["doc_id"]: r["clean"]
        for r in dedup_paragraphs(deboiled, min_chars=5).collect()
    }
    assert all("Footer chrome line." not in t for t in final.values())
    assert sum(QUOTE in t for t in final.values()) == 1
