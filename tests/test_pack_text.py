"""Materialized packing: value parity with the DuckDB twin (string_agg with
ordered concatenation over the identical shard/pack assignment)."""

from __future__ import annotations

import duckdb

from photo_vector_search_spark.plans.pipeline_queries import (
    PACK_CAP,
    pack_documents_text,
)
from photo_vector_search_spark.sources.tables import load_table


def test_pack_documents_text_matches_duckdb_twin(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    got = {
        (r["shard"], r["pack_id"]): (r["text"], r["n_docs"], r["n_tokens"])
        for r in pack_documents_text(docs, n_shards=8).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_correct}/documents.parquet')"
        )
        want = con.execute(
            rf"""
            WITH toks AS (
              SELECT doc_id, text,
                     CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 8 AS shard,
                     len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
              FROM documents
            ),
            packed AS (
              SELECT shard, doc_id, text, n_tok,
                     CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAP})
                          AS BIGINT) AS pack_id
              FROM toks
            )
            SELECT shard, pack_id,
                   string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS text,
                   count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
            FROM packed GROUP BY shard, pack_id
            """
        ).fetchall()
    finally:
        con.close()
    assert got == {
        (s, p): (t, n, tok) for s, p, t, n, tok in want
    }
    # packs are non-degenerate and fills hover near the cap (except tails)
    assert len(got) > 10
    non_tail = [v[2] for v in got.values() if v[2] >= PACK_CAP]
    assert non_tail, "no pack ever reached the cap — packing not exercised"
