"""Gopher quality gates: Spark flags must equal the DuckDB twin built from the
same thresholds/patterns, across docs engineered to trip each rule."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import (
    gopher_flags,
    gopher_flags_sql,
)

_GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs on for "
    "quite a while because this document needs to be long enough to pass "
    "the minimum word count rule of the gopher pipeline so we keep adding "
    "plain english words in simple sentences until the counter is happy "
    "and the stopword rule sees the usual words it expects to find here"
)

CORPUS = [
    (0, _GOOD),
    (1, "too short to pass"),
    (2, _GOOD + " ###### ... ... ... " + "# " * 40),  # symbol-heavy
    (3, "\n".join(f"- bullet {i} of the list" for i in range(10))),  # all bullets
    (4, _GOOD + "\n" + "\n".join(f"trailing line {i}..." for i in range(9))),
    (5, " ".join(str(i) for i in range(120))),  # numbers, no alpha words
    (6, " ".join(f"w{i}x" for i in range(80))),  # alpha but zero stopwords
    (7, ""),
    (8, None),
]


def test_gopher_flags_match_duckdb_twin(spark):
    got = (
        spark.createDataFrame(CORPUS, "doc_id long, text string")
        .select("doc_id", *gopher_flags(F.col("text")))
        .orderBy("doc_id")
        .collect()
    )
    twins = gopher_flags_sql("text")
    con = duckdb.connect()
    try:
        con.register("corpus", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        cols = ", ".join(f"{sql} AS {name}" for name, sql in twins.items())
        want = con.execute(
            f"SELECT doc_id, {cols} FROM corpus ORDER BY doc_id"
        ).fetchdf()
    finally:
        con.close()
    for r, (_, w) in zip(got, want.iterrows()):
        for name in twins:
            wv = w[name]
            wv = None if pd.isna(wv) else bool(wv)
            assert r[name] == wv, (r["doc_id"], name, r[name], wv)
    # each engineered doc trips the rule it targets (and doc 0 passes all)
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[0]["gopher_pass"] is True
    assert by_id[1]["g_words"] is False
    assert by_id[2]["g_symbol_ratio"] is False
    assert by_id[3]["g_bullet_ratio"] is False
    assert by_id[4]["g_ellipsis_ratio"] is False
    assert by_id[5]["g_alpha_words"] is False
    assert by_id[6]["g_stopwords"] is False
    assert all(by_id[i]["gopher_pass"] is not True for i in range(1, 8))
