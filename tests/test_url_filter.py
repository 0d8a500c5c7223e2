"""UT1-style URL blocklist filtering (round 10): DuckDB twin replaying the
label-boundary suffix semantics in SQL over the shared synthesized-URL
corpus, an independent urllib-based Python reference, and the semantic
edges (sibling hosts, TLD exclusion, single-label hosts, unparseable URLs,
allow mode)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bench import URL_BLOCKLIST, fake_url_docs
from photo_vector_search_spark.operators.domains import (
    filter_urls,
    host_suffixes,
    url_host,
)


def _python_reference(rows, blocked, mode="block"):
    """Independent per-row reference: urllib host extraction + explicit
    suffix walk (written against the published rule, not the operator)."""
    from urllib.parse import urlsplit

    keep = []
    for doc_id, url in rows:
        try:
            host = urlsplit(url).hostname
        except ValueError:
            host = None
        if host is None:
            keep.append(doc_id) if mode == "block" else None
            continue
        labels = host.lower().split(".")
        n = max(1, len(labels) - 1)
        hit = any(".".join(labels[i:]) in blocked for i in range(n))
        if (mode == "block") != hit:
            keep.append(doc_id)
    return sorted(keep)


def _duck_twin(sf_dir: str, blocked, mode="block"):
    """SQL replay: same host synthesis as fake_url_docs, generic suffix
    walk over split labels (excluding the bare TLD), blocklist as VALUES."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    vals = ", ".join(f"('{h}')" for h in sorted(blocked))
    hit = """EXISTS (
        SELECT 1
        FROM unnest(generate_series(1, greatest(1, len(ls) - 1))) AS t(i)
        WHERE array_to_string(ls[i:], '.') IN (SELECT h FROM bl)
      )"""
    cond = (
        f"(host IS NULL OR NOT {hit})" if mode == "block"
        else f"(host IS NOT NULL AND {hit})"
    )
    rows = con.execute(f"""
WITH bl(h) AS (VALUES {vals}),
hosts AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 4 THEN NULL
              WHEN doc_id % 5 = 0 THEN 'example' || CAST(doc_id % 2 AS VARCHAR) || '.com'
              WHEN doc_id % 5 = 1 THEN 'cdn.example' || CAST(doc_id % 2 AS VARCHAR) || '.com'
              WHEN doc_id % 5 = 2 THEN 'notexample' || CAST(doc_id % 2 AS VARCHAR) || '.com'
              ELSE 'docs' || CAST(doc_id % 4 AS VARCHAR) || '.org'
         END AS host
  FROM documents
),
split AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM hosts)
SELECT doc_id FROM split WHERE {cond} ORDER BY doc_id
""").fetchall()
    con.close()
    return [r[0] for r in rows]


def test_block_mode_matches_duckdb_twin_and_python_reference(spark, sf_correct):
    docs = fake_url_docs(spark, sf_correct)
    blocked = set(URL_BLOCKLIST)
    got = sorted(
        r["doc_id"]
        for r in filter_urls(docs, blocked).select("doc_id").collect()
    )
    assert got == _duck_twin(sf_correct, blocked, "block")
    rows = [(r["doc_id"], r["url"]) for r in docs.collect()]
    assert got == _python_reference(rows, blocked, "block")
    # the synthesis really exercises every class: something was dropped,
    # subdomain rows (sel==1, doc_id%2 hits the blocklist) are gone,
    # sibling rows (sel==2) and malformed rows (sel==4) survived
    all_ids = {r[0] for r in rows}
    kept = set(got)
    assert kept < all_ids
    assert all(i in kept for i in all_ids if i % 5 == 2)
    assert all(i in kept for i in all_ids if i % 5 == 4)
    assert all(i not in kept for i in all_ids if i % 5 in (0, 1))


def test_allow_mode_is_the_complement_on_parseable_hosts(spark, sf_correct):
    docs = fake_url_docs(spark, sf_correct)
    blocked = set(URL_BLOCKLIST)
    allow = sorted(
        r["doc_id"]
        for r in filter_urls(docs, blocked, mode="allow")
        .select("doc_id")
        .collect()
    )
    assert allow == _duck_twin(sf_correct, blocked, "allow")
    rows = [(r["doc_id"], r["url"]) for r in docs.collect()]
    assert allow == _python_reference(rows, blocked, "allow")
    block = {
        r["doc_id"] for r in filter_urls(docs, blocked).select("doc_id").collect()
    }
    # block ∪ allow covers everything except nothing; overlap is empty;
    # unparseable rows (sel==4) land on the block-kept side only
    all_ids = {r[0] for r in rows}
    assert set(allow) | block == all_ids
    assert set(allow) & block == set()


def test_semantic_edges(spark):
    rows = [
        (0, "https://example.com/x"),          # exact
        (1, "https://a.b.example.com/x"),      # deep subdomain
        (2, "https://notexample.com/x"),       # string suffix, not a label
        (3, "https://example.com.evil.org/x"), # blocked host as INFIX only
        (4, "https://localhost/x"),            # single label, listed
        (5, "https://intranet/x"),             # single label, not listed
        (6, "https://com/x"),                  # bare TLD as a host: entry
        (7, "not a url at all"),               # unparseable
        (8, None),                             # NULL url
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = {"example.com", "localhost", "com"}
    kept = {
        r["doc_id"] for r in filter_urls(docs, blocked).select("doc_id").collect()
    }
    # 0,1 match example.com; 4 matches localhost; 6 is a single-label host
    # 'com' which IS the entry (single-label hosts match themselves);
    # 2,3 must survive (label boundaries / no suffix match); 5 unlisted;
    # 7,8 unparseable -> kept under a blocklist
    assert kept == {2, 3, 5, 7, 8}
    # multi-label hosts never match a bare-TLD entry: 'com' in the list
    # must not drop example-suffix-free .com hosts
    more = spark.createDataFrame(
        [(0, "https://clean.com/x")], "doc_id long, url string"
    )
    assert filter_urls(more, {"com"}).count() == 1
    # keep_unparseable override + allow-mode default
    assert filter_urls(docs, blocked, keep_unparseable=False).select(
        "doc_id"
    ).count() == 3  # {2, 3, 5}
    allow_kept = {
        r["doc_id"]
        for r in filter_urls(docs, blocked, mode="allow").collect()
    }
    assert allow_kept == {0, 1, 4, 6}
    with pytest.raises(ValueError, match="mode"):
        filter_urls(docs, blocked, mode="deny")


def test_host_suffixes_matches_kernel_semantics(spark):
    """The pure-Catalyst suffix helper (for explode/join workflows) agrees
    with the broadcast-set kernel's suffix walk on every host shape."""
    rows = [
        (0, "a.b.example.com"),
        (1, "example.com"),
        (2, "localhost"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "i long, host string")
    got = {
        r["i"]: r["sfx"]
        for r in df.select(
            "i", host_suffixes(F.col("host")).alias("sfx")
        ).collect()
    }
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com"]
    assert got[1] == ["example.com"]
    assert got[2] == ["localhost"]
    assert got[3] is None


def test_url_host_and_zero_shuffle_plan(spark, sf_correct):
    docs = fake_url_docs(spark, sf_correct)
    # malformed URLs yield NULL host instead of throwing under ANSI mode
    n_null = docs.select(url_host(F.col("url")).alias("h")).filter(
        F.col("h").isNull()
    ).count()
    assert n_null == docs.filter(F.col("doc_id") % 5 == 4).count()
    # the filter pipelines into the scan: no Exchange in the plan
    plan = filter_urls(docs, set(URL_BLOCKLIST))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
