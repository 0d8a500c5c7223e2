"""Per-domain caps: exact value parity with a DuckDB row_number twin in both
the windowed and salted two-phase forms, skew-shape equivalence, quality-
ordered keeps, url_host extraction, and guard contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.domains import cap_per_domain, url_host
from photo_vector_search_spark.sources.tables import load_table


def _duckdb_kept(pdf, cap, order_sql="doc_id"):
    con = duckdb.connect()
    try:
        con.register("docs", pdf)
        return {
            r[0]
            for r in con.execute(
                f"""
                SELECT doc_id FROM (
                  SELECT doc_id,
                         row_number() OVER (PARTITION BY source ORDER BY {order_sql}) AS rn
                  FROM docs
                ) WHERE rn <= {cap}
                """
            ).fetchall()
        }
    finally:
        con.close()


def test_cap_matches_duckdb_twin_both_forms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    want = _duckdb_kept(docs.toPandas(), 7)
    for pre_prune in (True, False):
        got = {
            r["doc_id"]
            for r in cap_per_domain(docs, 7, pre_prune=pre_prune).collect()
        }
        assert got == want, pre_prune
    # columns pass through untouched
    out = cap_per_domain(load_table(spark, sf_dir, "documents"), 7)
    assert set(out.columns) == set(load_table(spark, sf_dir, "documents").columns)


def test_cap_skewed_domain_exact(spark):
    # one crawler-trap domain with 5000 docs, two small ones
    rows = [(i, "trap.example") for i in range(5000)]
    rows += [(10_000 + i, "a.example") for i in range(3)]
    rows += [(20_000 + i, "b.example") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string").repartition(16)
    kept = cap_per_domain(docs, 25, n_salt=8)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"trap.example": 25, "a.example": 3, "b.example": 25}
    # "first cap" under the order: the lowest doc_ids survive
    trap_ids = {
        r["doc_id"]
        for r in kept.filter(F.col("source") == "trap.example").collect()
    }
    assert trap_ids == set(range(25))
    want = _duckdb_kept(docs.toPandas(), 25)
    got = {r["doc_id"] for r in kept.collect()}
    assert got == want


def test_cap_quality_ordering_and_null_domain(spark):
    rows = [
        (1, "x", 0.9), (2, "x", 0.1), (3, "x", 0.5),
        (4, None, 0.7), (5, None, 0.2), (6, None, 0.8),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, badness double")
    # keep the LOWEST-badness doc per domain; doc_id breaks ties totally
    kept = {
        r["doc_id"]
        for r in cap_per_domain(docs, 1, order_by=("badness", "doc_id")).collect()
    }
    assert kept == {2, 5}  # NULL domains form their own capped group
    pdf = docs.toPandas()
    assert kept == {
        r[0]
        for r in duckdb.connect()
        .execute(
            """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY source ORDER BY badness, doc_id) AS rn
              FROM pdf
            ) WHERE rn <= 1
            """
        )
        .fetchall()
    }


def test_url_host_and_guards(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.Example.COM/path?q=1"),
            (2, "http://sub.host.org:8080/x"),
            (3, "not a url"),
        ],
        "doc_id long, url string",
    )
    hosts = {r["doc_id"]: r["h"] for r in df.select("doc_id", url_host("url").alias("h")).collect()}
    assert hosts[1] == "www.example.com"
    assert hosts[2] == "sub.host.org"
    assert hosts[3] is None
    with pytest.raises(ValueError, match="cap"):
        cap_per_domain(df, 0, domain_col="url")
    with pytest.raises(ValueError, match="n_salt"):
        cap_per_domain(df, 1, domain_col="url", n_salt=0)


def test_partitioning_invariance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = {r["doc_id"] for r in cap_per_domain(docs, 9).collect()}
    b = {r["doc_id"] for r in cap_per_domain(docs.repartition(13), 9).collect()}
    assert a == b
