"""normalize_text: Spark vs DuckDB twin on URL/control/whitespace cases, and
flag independence."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import (
    normalize_text,
    normalize_text_sql,
)

CORPUS = [
    (0, "see https://example.com/a?b=1#f and www.foo.org/bar for more"),
    (1, "tabs\tand\nnewlines\r\nand   runs of    spaces"),
    (2, "ctrl\x00chars\x07here\x1fgone but\ttabs stay pre-collapse"),
    (3, "MiXeD Case Stays Unless Asked"),
    (4, ""),
    (5, None),
]


def _duck(expr: str) -> list:
    con = duckdb.connect()
    try:
        con.register("c", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        return [
            v for (v,) in con.execute(f"SELECT {expr} FROM c ORDER BY doc_id").fetchall()
        ]
    finally:
        con.close()


def _spark(spark, **kw) -> list:
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return [
        r["n"]
        for r in df.select(normalize_text(F.col("text"), **kw).alias("n"))
        .orderBy("doc_id")
        .collect()
    ]


def test_normalize_matches_duckdb_twin(spark):
    for kw in (
        {},
        {"lowercase": True},
        {"strip_urls": False},
        {"collapse_ws": False},
        {"strip_controls": False, "collapse_ws": False},
    ):
        got = _spark(spark, **kw)
        want = [
            None if pd.isna(v) else v
            for v in _duck(normalize_text_sql("text", **kw))
        ]
        assert got == want, kw
    # semantics actually fired
    full = _spark(spark)
    assert full[0] == "see <URL> and <URL> for more"
    assert full[1] == "tabs and newlines and runs of spaces"
    assert "\x00" not in full[2] and "\x07" not in full[2]
    assert full[3] == "MiXeD Case Stays Unless Asked"
    assert _spark(spark, lowercase=True)[3] == "mixed case stays unless asked"
    assert full[4] == "" and full[5] is None
