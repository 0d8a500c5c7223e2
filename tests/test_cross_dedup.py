"""Cross-corpus dedup: exact-fingerprint and MinHash variants against an
adversarial new-vs-reference fixture (exact copies, whitespace/case mirrors,
near-copies, novel docs, overlapping id spaces, NULLs), a DuckDB twin of the
full two-sided MinHash chain, and the exact/minhash ladder composition."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.cross_dedup import (
    dedup_against,
    exact_dedup_against,
    minhash_dedup_against,
    minhash_pairs_against,
)
from photo_vector_search_spark.operators.dedup import (
    MINHASH_P,
    minhash_lsh_pairs,
    minhash_perms,
)
from photo_vector_search_spark.sources.tables import load_table

REF = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1, "a completely different reference document about distributed query engines"),
    (2, "short unique reference text nobody copies"),
]
NEW = [
    # id 0 OVERLAPS a reference id on purpose (id spaces must never mix)
    (0, "an entirely novel new document about scalar quantization ladders"),
    (1, "THE  QUICK   brown fox jumps over the lazy dog near the old river bank"),  # exact after normalization
    (2, "the quick brown fox jumps over the lazy dog near the old river bend today"),  # near-dup of ref 0
    (3, "short unique reference text nobody copies"),  # byte-exact copy of ref 2
    (4, None),  # NULL text: survives every gate (drop only on evidence)
    (5, "another fresh document mentioning rivers and dogs but mostly new words overall"),
]


def _frames(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    new = spark.createDataFrame(NEW, "doc_id long, text string")
    return new, ref


def test_exact_variant_drops_normalized_copies(spark):
    new, ref = _frames(spark)
    kept = {r["doc_id"] for r in exact_dedup_against(new, ref).collect()}
    # 1 (whitespace/case mirror) and 3 (byte copy) drop; near-dup 2 survives
    assert kept == {0, 2, 4, 5}
    # all columns pass through, no helper columns leak
    assert exact_dedup_against(new, ref).columns == ["doc_id", "text"]


def test_minhash_variant_drops_near_dups_and_twin(spark):
    new, ref = _frames(spark)
    pairs = minhash_pairs_against(new, ref, n=3, tau=0.5)
    got_pairs = {(r["new_id"], r["ref_id"]): r["jaccard"] for r in pairs.collect()}
    # near-dup 2 and the mirrors 1/3 all pair with their reference source
    assert (2, 0) in got_pairs and (1, 0) in got_pairs and (3, 2) in got_pairs
    assert all(j >= 0.5 for j in got_pairs.values())

    kept = {r["doc_id"] for r in minhash_dedup_against(new, ref).collect()}
    assert kept == {0, 4, 5}  # novel, NULL, and fresh survive

    # DuckDB twin of the WHOLE two-sided chain (shared permutation family)
    perm_values = ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_perms())
    side_sql = r"""
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(0, len(t) - 2)),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM {side} WHERE text IS NOT NULL)
"""
    chain = r"""
  SELECT doc_id, CAST(i // 2 AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY i ASC), ',')) AS band_key
  FROM (SELECT doc_id, i, min((a * h + b) % {p}) AS mh
        FROM (SELECT doc_id,
                     CAST(concat('0x', substring(md5(shingle), 1, 8)) AS BIGINT) AS h
              FROM {sh}) CROSS JOIN perms GROUP BY doc_id, i)
  GROUP BY doc_id, CAST(i // 2 AS INT)
"""
    con = duckdb.connect()
    try:
        con.register("new_docs", pd.DataFrame(NEW, columns=["doc_id", "text"]))
        con.register("ref_docs", pd.DataFrame(REF, columns=["doc_id", "text"]))
        want = con.execute(
            f"""
WITH perms(i, a, b) AS (VALUES {perm_values}),
sh_new AS ({side_sql.format(side="new_docs")}),
sh_ref AS ({side_sql.format(side="ref_docs")}),
bn AS ({chain.format(p=MINHASH_P, sh="sh_new")}),
br AS ({chain.format(p=MINHASH_P, sh="sh_ref")}),
cand AS (
  SELECT DISTINCT bn.doc_id AS new_id, br.doc_id AS ref_id
  FROM bn JOIN br ON bn.band = br.band AND bn.band_key = br.band_key
),
cn AS (SELECT doc_id, count(*) AS n FROM sh_new GROUP BY doc_id),
cr AS (SELECT doc_id, count(*) AS n FROM sh_ref GROUP BY doc_id),
common AS (
  SELECT c.new_id, c.ref_id, count(*) AS common
  FROM cand c
  JOIN sh_new a ON a.doc_id = c.new_id
  JOIN sh_ref b ON b.doc_id = c.ref_id AND b.shingle = a.shingle
  GROUP BY c.new_id, c.ref_id
)
SELECT new_id, ref_id,
       round(common * 1.0 / (cn.n + cr.n - common), 6) AS jaccard
FROM common
JOIN cn ON cn.doc_id = new_id
JOIN cr ON cr.doc_id = ref_id
WHERE common * 1.0 / (cn.n + cr.n - common) >= 0.5
            """
        ).fetchall()
    finally:
        con.close()
    assert got_pairs == {(a, b): j for a, b, j in want}


def test_twin_on_real_corpus_vs_in_corpus_pairs(spark, sf_correct):
    """Splitting the fixture corpus in two and cross-deduping must find
    exactly the in-corpus LSH pairs that straddle the split — the
    cross-corpus operator agrees with the declared in-corpus one."""
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    ref = docs.filter(F.col("doc_id") % 2 == 1)
    got = {
        (r["new_id"], r["ref_id"], r["jaccard"])
        for r in minhash_pairs_against(new, ref, n=3, tau=0.5).collect()
    }
    in_corpus = minhash_lsh_pairs(docs, n=3, tau=0.5).collect()
    want = set()
    for r in in_corpus:
        a, b, j = r["doc_a"], r["doc_b"], r["jaccard"]
        if a % 2 == 0 and b % 2 == 1:
            want.add((a, b, j))
        elif a % 2 == 1 and b % 2 == 0:
            want.add((b, a, j))
    assert got == want


def test_ladder_composition_and_dispatch(spark):
    new, ref = _frames(spark)
    exact_then_near = minhash_dedup_against(
        exact_dedup_against(new, ref), ref
    )
    kept = {r["doc_id"] for r in exact_then_near.collect()}
    assert kept == {0, 4, 5}
    # dispatch helper routes and validates
    assert {
        r["doc_id"] for r in dedup_against(new, ref, method="exact").collect()
    } == {0, 2, 4, 5}
    with pytest.raises(ValueError, match="unknown method"):
        dedup_against(new, ref, method="simhash")
    with pytest.raises(ValueError, match="tau"):
        minhash_pairs_against(new, ref, tau=0.0)
