"""Persisted cross-dedup fingerprint store (`operators/cross_dedup`,
build/extend/serve): store-served dedup ≡ dedup against the full reference
corpus, the reference parquet is never re-read at serve time (input-file
audit), and the snapshot N-1 → N extend workflow composes."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.cross_dedup import (
    build_fingerprint_store,
    exact_dedup_against,
    exact_dedup_against_store,
    extend_fingerprint_store,
)
from photo_vector_search_spark.sources.tables import load_table


def _snapshot(spark, sf_dir, lo, hi, shift):
    """A simulated crawl: docs [lo, hi) re-fetched under shifted ids, even
    originals as whitespace/case mirrors (dupes), odd with novel tails."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )
    return docs.select(
        (F.col("doc_id") + shift).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" "), F.upper("text"), F.lit("  ")),
        )
        .otherwise(F.concat(F.col("text"), F.lit(" tail-"), F.col("doc_id")))
        .alias("text"),
    )


def test_store_served_equals_full_reference_dedup(spark, sf_correct, tmp_path):
    ref = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    new = _snapshot(spark, sf_correct, 0, 200, 100000)
    path = str(tmp_path / "fps")
    n = build_fingerprint_store(ref, path)
    assert n == ref.select("text").filter(F.col("text").isNotNull()).distinct().count()
    want = sorted(map(tuple, exact_dedup_against(new, ref).collect()))
    got = sorted(map(tuple, exact_dedup_against_store(new, path).collect()))
    assert got == want
    # the fixture is adversarial in both directions: some rows drop, some keep
    assert 0 < len(got) < new.count()


def test_serving_never_rereads_reference(spark, sf_correct, tmp_path):
    ref = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    path = str(tmp_path / "fps")
    build_fingerprint_store(ref, path)
    new = spark.createDataFrame(
        [(1, "a brand new page"), (2, "another page")],
        "doc_id long, text string",
    )
    out = exact_dedup_against_store(new, path)
    files = out.inputFiles()
    assert files and all("fps" in f for f in files), files
    assert not any("documents" in f for f in files), files


def test_extend_workflow_matches_union_reference(spark, sf_correct, tmp_path):
    """Snapshot chain: build from N-1, dedup snapshot N, extend the store
    with N's survivors, dedup snapshot N+1 — each store-served result must
    equal deduping against the corresponding CORPUS union."""
    ref = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    path = str(tmp_path / "fps")
    build_fingerprint_store(ref, path)

    snap_n = _snapshot(spark, sf_correct, 0, 300, 100000)
    # materialize before the swap: kept_n's lazy plan reads the CURRENT
    # store snapshot, which extend_fingerprint_store is about to replace
    # (the documented caller contract)
    kept_n = exact_dedup_against_store(snap_n, path).localCheckpoint(eager=True)
    extend_fingerprint_store(kept_n, path)

    # snapshot N+1 contains: mirrors of the ORIGINAL corpus (drop), exact
    # copies of snapshot-N survivors (drop — the extend must catch these),
    # and novel docs (keep)
    copies_of_kept = kept_n.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    ).limit(50)
    novel = spark.createDataFrame(
        [(900001, "genuinely new content one"), (900002, "genuinely new two")],
        "doc_id long, text string",
    )
    snap_n1 = (
        _snapshot(spark, sf_correct, 300, 400, 200000)
        .unionByName(copies_of_kept)
        .unionByName(novel)
    )
    got = sorted(
        map(tuple, exact_dedup_against_store(snap_n1, path).collect())
    )
    union_ref = ref.unionByName(kept_n)
    want = sorted(
        map(tuple, exact_dedup_against(snap_n1, union_ref).collect())
    )
    assert got == want
    got_ids = {t[0] for t in got}
    assert {900001, 900002} <= got_ids  # novels survive
    assert not any(i >= 500000 and i < 900000 for i in got_ids)  # copies drop


def test_null_text_survives_store_dedup(spark, sf_correct, tmp_path):
    ref = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    path = str(tmp_path / "fps")
    build_fingerprint_store(ref, path)
    new = spark.createDataFrame(
        [(1, None), (2, "fresh")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in exact_dedup_against_store(new, path).collect()}
    assert kept == {1, 2}  # NULL never fingerprint-matches: drop on evidence only
