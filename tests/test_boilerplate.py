"""Line-level boilerplate removal: Spark vs the DuckDB twin running the same
split/df-count/anti-join/ordered-rebuild algorithm, on a synthetic multi-line
corpus (the fixture documents are single-line word salad)."""

from __future__ import annotations

import duckdb
import pandas as pd

from photo_vector_search_spark.operators.dedup import remove_boilerplate_lines

FOOTER = "Subscribe to our newsletter!"
NAV = "Home | About | Contact"
CORPUS = [
    (0, f"{NAV}\nFirst real paragraph.\n\n{FOOTER}"),
    (1, f"{NAV}\nA different body line.\nSecond body line.\n{FOOTER}"),
    (2, f"Unique document without chrome.\n{FOOTER}"),
    (3, f"{NAV}\n{FOOTER}"),  # pure boilerplate -> disappears
    (4, "   \n \n"),  # blank lines are structure, never boilerplate
    (5, None),  # NULL text explodes to no rows -> disappears
]


def _duck_twin(min_docs: int) -> dict[int, str]:
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
            hot AS (
              SELECT line FROM lines WHERE trim(line) <> ''
              GROUP BY line HAVING count(DISTINCT doc_id) >= {min_docs}
            ),
            kept AS (
              SELECT l.* FROM lines l ANTI JOIN hot h ON l.line = h.line
            )
            SELECT doc_id,
                   array_to_string(list(line ORDER BY pos), chr(10)) AS clean
            FROM kept GROUP BY doc_id
            """
        ).fetchall()
        return dict(rows)
    finally:
        con.close()


def _spark_result(spark, min_docs: int) -> dict[int, str]:
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return {
        r["doc_id"]: r["clean"]
        for r in remove_boilerplate_lines(docs, min_docs=min_docs).collect()
    }


def test_boilerplate_matches_duckdb_twin(spark):
    got, want = _spark_result(spark, 2), _duck_twin(2)
    assert got == want
    # the semantics actually fired: chrome gone, bodies and order intact
    assert got[0] == "First real paragraph.\n"  # blank line survives at the end
    assert got[1] == "A different body line.\nSecond body line."
    assert got[2] == "Unique document without chrome."
    assert 3 not in got and 5 not in got  # pure boilerplate / NULL vanish
    assert got[4] == "   \n \n".rstrip("x")  # blank-only doc fully preserved


def test_boilerplate_threshold_sweep(spark):
    # min_docs=3: FOOTER (4 docs) still hot, NAV (3 docs) still hot;
    # min_docs=4: NAV (3 docs) survives, FOOTER (4 docs) still removed
    got4, want4 = _spark_result(spark, 4), _duck_twin(4)
    assert got4 == want4
    assert got4[0].startswith(NAV) and FOOTER not in got4[0]
    # min_docs above every df: identity on non-null docs
    got9, want9 = _spark_result(spark, 9), _duck_twin(9)
    assert got9 == want9
    assert got9[0] == CORPUS[0][1]
