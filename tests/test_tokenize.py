"""Vocab build + tokenization: exact value parity with a DuckDB twin running
the identical rank/join/reassemble algorithm, plus OOV semantics."""

from __future__ import annotations

import duckdb

from photo_vector_search_spark.plans.text_queries import (
    build_vocab,
    tokenize_documents,
)
from photo_vector_search_spark.sources.tables import load_table


def test_build_vocab_and_tokenize_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = build_vocab(docs, max_size=10).cache()
    n_vocab = vocab.count()
    assert 0 < n_vocab <= 10

    got_vocab = {(r["tok"], r["id"], r["tf"]) for r in vocab.collect()}
    got = {
        r["doc_id"]: (list(r["ids"]), r["n_oov"])
        for r in tokenize_documents(docs, vocab).collect()
    }

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want_vocab = set(
            con.execute(
                r"""
                WITH tok AS (
                  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS tok
                  FROM documents
                ),
                tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok)
                SELECT tok,
                       CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) - 1 AS INT) AS id,
                       tf
                FROM tf QUALIFY id < 10
                """
            ).fetchall()
        )
        want = {
            d: (ids, n)
            for d, ids, n in con.execute(
                rf"""
                WITH tok AS (
                  SELECT doc_id, u.tok, u.pos
                  FROM (SELECT doc_id,
                               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                           t -> t <> '') AS ts
                        FROM documents) t,
                       LATERAL (SELECT ts[p] AS tok, p AS pos
                                FROM unnest(generate_series(1, len(ts))) AS g(p)) u
                ),
                tf AS (
                  SELECT tok, count(*) AS tf FROM tok GROUP BY tok
                ),
                vocab AS (
                  SELECT tok,
                         CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) - 1 AS INT) AS id
                  FROM tf QUALIFY id < 10
                )
                SELECT t.doc_id,
                       list(COALESCE(v.id, 10) ORDER BY t.pos) AS ids,
                       CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
                GROUP BY t.doc_id
                """
            ).fetchall()
        }
    finally:
        con.close()

    assert got_vocab == want_vocab
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == list(want[d][0]), d
        assert got[d][1] == want[d][1], d
    # OOV id defaults to one past the largest vocab id and actually fires
    assert any(n > 0 for _, n in got.values())
    vocab.unpersist()


def test_tokenize_empty_and_whitespace_docs(spark):
    """ADVICE r5: splitting '' yields [''] — the empty-string token must not
    enter the vocab, and empty/whitespace-only docs must tokenize to
    (ids=[], n_oov=0) rather than a phantom [oov_id] (or vanish entirely)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, ""),
            (3, "   \t\n "),
            (4, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, max_size=10)
    vs = {(r["tok"], r["id"], r["tf"]) for r in vocab.collect()}
    assert "" not in {t for t, _, _ in vs}
    assert vs == {("alpha", 0, 2), ("beta", 1, 2), ("gamma", 2, 1)}

    got = {
        r["doc_id"]: (list(r["ids"]), r["n_oov"])
        for r in tokenize_documents(docs, vocab).collect()
    }
    assert got == {
        1: ([0, 1, 0], 0),
        2: ([], 0),
        3: ([], 0),
        4: ([1, 2], 0),
    }

    # DuckDB twin of the same corpus agrees on the empty-doc semantics
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            "(1, 'alpha beta alpha'), (2, ''), (3, '   ' || chr(9)), "
            "(4, 'beta gamma')) AS t(doc_id, text)"
        )
        want = {
            d: (ids, n)
            for d, ids, n in con.execute(
                r"""
                WITH base AS (
                  SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                     t -> t <> '') AS ts
                  FROM documents
                ),
                tok AS (
                  SELECT doc_id, u.tok, u.pos
                  FROM base, LATERAL (SELECT ts[p] AS tok, p AS pos
                                      FROM unnest(generate_series(1, len(ts))) AS g(p)) u
                ),
                tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
                vocab AS (
                  SELECT tok,
                         CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) - 1 AS INT) AS id
                  FROM tf QUALIFY id < 10
                ),
                per_doc AS (
                  SELECT t.doc_id,
                         list(COALESCE(v.id, 3) ORDER BY t.pos) AS ids,
                         CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
                  GROUP BY t.doc_id
                )
                SELECT b.doc_id, COALESCE(p.ids, []) AS ids,
                       COALESCE(p.n_oov, 0) AS n_oov
                FROM base b LEFT JOIN per_doc p USING (doc_id)
                """
            ).fetchall()
        }
    finally:
        con.close()
    assert {d: (list(i), n) for d, (i, n) in want.items()} == got


def test_word_ngrams_zip_form_matches_per_position_reference(spark):
    """r7 perf rewrite: word_ngrams as a zip of n shifted slices (n slices
    per doc) must be value-identical to the original per-position
    transform(sequence, i -> slice(toks, i, n)) form (one slice per GRAM,
    measured ~6x slower at sf0.1) — including the short-doc, empty-doc and
    NULL-text corners."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.functions.text import tokens, word_ngrams

    def reference_ngrams(toks, n):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            grams
        )

    rows = [
        (0, "a b c d e f"),
        (1, "a b"),
        (2, "a"),
        (3, ""),
        (4, None),
        (5, "x  y\tz\nw"),
        (6, "one two one two one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.array_remove(tokens(F.col("text")), "")
    for n in (2, 3, 5):
        got = {
            r["doc_id"]: r["g"]
            for r in docs.select("doc_id", word_ngrams(toks, n).alias("g")).collect()
        }
        want = {
            r["doc_id"]: r["g"]
            for r in docs.select(
                "doc_id", reference_ngrams(toks, n).alias("g")
            ).collect()
        }
        assert got == want, n
    # dense sanity for the n=2 case
    got2 = (
        docs.filter("doc_id = 0")
        .select(word_ngrams(toks, 2).alias("g"))
        .first()["g"]
    )
    assert got2 == ["a b", "b c", "c d", "d e", "e f"]
