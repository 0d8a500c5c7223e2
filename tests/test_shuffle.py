"""Deterministic corpus shuffle: value parity with the DuckDB row_number twin,
partitioning invariance (the property seeded rand() lacks), and seed behavior."""

from __future__ import annotations

import duckdb
import pandas as pd

from photo_vector_search_spark.operators.shuffle import shuffle_corpus
from photo_vector_search_spark.sources.tables import load_table


def _duck_order(sf_dir: str, seed: int) -> list[tuple[int, int]]:
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY md5('{seed}' || '-' || CAST(doc_id AS VARCHAR)),
                              doc_id
                   ) - 1 AS pos
            FROM read_parquet('{sf_dir}/documents.parquet')
            ORDER BY doc_id
            """
        ).fetchall()
    finally:
        con.close()


def test_shuffle_matches_duckdb_twin(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in shuffle_corpus(docs, seed=7).select("doc_id", "pos").collect()
    )
    assert got == _duck_order(sf_correct, 7)
    # pos is a dense 0..N-1 permutation
    n = len(got)
    assert sorted(p for _, p in got) == list(range(n))


def test_shuffle_invariant_to_input_partitioning(spark, sf_correct):
    """The contract seeded rand() cannot give: re-reading the same corpus with
    a different physical split yields the SAME order."""
    docs = load_table(spark, sf_correct, "documents")
    a = {
        r["doc_id"]: r["pos"]
        for r in shuffle_corpus(docs.repartition(7), seed=3)
        .select("doc_id", "pos")
        .collect()
    }
    b = {
        r["doc_id"]: r["pos"]
        for r in shuffle_corpus(docs.coalesce(1), seed=3)
        .select("doc_id", "pos")
        .collect()
    }
    assert a == b


def test_auto_stage_plan_inspection(spark, sf_correct, tmp_path):
    """stage=None inspects the optimized plan: a bare deterministic scan
    (+ narrow project/filter) re-executes instead of staging — two scans of
    immutable files can't diverge and beat a write+read round trip — while
    nondeterministic or wide plans stage."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.operators.shuffle import _rescan_safe_and_cheap

    docs = load_table(spark, sf_correct, "documents")
    assert _rescan_safe_and_cheap(docs)
    assert _rescan_safe_and_cheap(docs.select("doc_id").filter(F.col("doc_id") > 3))
    # nondeterministic projection MUST stage (the ADVICE divergence scenario)
    assert not _rescan_safe_and_cheap(docs.withColumn("r", F.rand(1)))
    # wide plans stage: recompute would double real work
    assert not _rescan_safe_and_cheap(docs.groupBy("source").count())
    assert not _rescan_safe_and_cheap(docs.join(docs.select("doc_id"), "doc_id"))
    assert not _rescan_safe_and_cheap(docs.repartition(7))

    # the no-stage fast path produces the identical permutation, and never
    # touches the caller's staging_dir
    sd = str(tmp_path / "never_written")
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in shuffle_corpus(docs, seed=7, staging_dir=sd)
        .select("doc_id", "pos")
        .collect()
    )
    assert got == _duck_order(sf_correct, 7)
    import os

    assert not os.path.exists(sd)

    # a nondeterministic upstream still yields one consistent dense
    # permutation (both passes read the SAME staged rows)
    nd = docs.withColumn("r", F.rand(42))
    rows = shuffle_corpus(nd, seed=5, staging_dir=str(tmp_path / "st")).collect()
    assert sorted(r["pos"] for r in rows) == list(range(len(rows)))

    # explicit override wins over inspection
    sd2 = str(tmp_path / "forced")
    shuffle_corpus(docs, seed=7, staging_dir=sd2, stage=True).count()
    assert os.path.exists(sd2)


def test_shuffle_seed_changes_order_and_keeps_rows(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "source")
    s0 = shuffle_corpus(docs, seed=0).select("doc_id", "pos").collect()
    s1 = shuffle_corpus(docs, seed=1).select("doc_id", "pos").collect()
    m0 = {r["doc_id"]: r["pos"] for r in s0}
    m1 = {r["doc_id"]: r["pos"] for r in s1}
    assert set(m0) == set(m1)  # a permutation, never a sample
    moved = sum(1 for d in m0 if m0[d] != m1[d])
    assert moved > len(m0) * 0.9  # different seed => essentially everything moves
    # original columns survive alongside pos
    assert {f.name for f in shuffle_corpus(docs, seed=0).schema} == {
        "doc_id",
        "source",
        "pos",
    }


def _duck_curriculum(sf_dir: str, seed: int, cuts: list[float]) -> list:
    """Full-order twin: tier walks the cut boundaries (NULLs in a
    strictly-final extra tier), md5 shuffle within tier."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    tier = " + ".join(
        f"(CASE WHEN n_chars > {c} THEN 1 ELSE 0 END)" for c in cuts
    )
    return con.execute(f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY (CASE WHEN n_chars IS NULL THEN {len(cuts) + 1}
                        ELSE {tier} END),
                  md5(concat('{seed}', '-', CAST(doc_id AS VARCHAR))),
                  doc_id
       ) - 1 AS pos
FROM documents ORDER BY doc_id
""").fetchall()


def test_curriculum_order_matches_duckdb_twin(spark, sf_correct):
    from photo_vector_search_spark.operators.shuffle import curriculum_order

    docs = load_table(spark, sf_correct, "documents")
    cuts = [150.0, 250.0, 400.0]
    res = curriculum_order(docs, "n_chars", seed=5, cuts=cuts)
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in res.df.select("doc_id", "pos").collect()
    )
    assert got == [(d, p) for d, p in _duck_curriculum(sf_correct, 5, cuts)]
    assert res.cuts == cuts
    # the result is an explicit (df, cuts) pair — unpackable, no dynamic attrs
    df2, cuts2 = res
    assert cuts2 == cuts and df2 is res.df


def test_curriculum_order_semantics(spark, sf_correct):
    """Walking pos ascending, the difficulty tier is non-decreasing; within
    a tier the order equals shuffle_corpus's seeded order restricted to the
    tier; descending reverses the tier walk; partitioning-invariant."""
    from photo_vector_search_spark.operators.shuffle import curriculum_order

    docs = load_table(spark, sf_correct, "documents")
    cuts = [200.0, 350.0]
    out = curriculum_order(docs, "n_chars", seed=3, cuts=cuts).df
    rows = sorted(
        out.select("doc_id", "n_chars", "pos").collect(),
        key=lambda r: r["pos"],
    )
    tiers = [sum(r["n_chars"] > c for c in cuts) for r in rows]
    assert tiers == sorted(tiers)  # difficulty ramp, never down
    assert [r["pos"] for r in rows] == list(range(len(rows)))  # dense

    # within-tier order == the seeded shuffle order restricted to the tier
    shuf = {
        r["doc_id"]: r["pos"]
        for r in shuffle_corpus(docs, seed=3).collect()
    }
    for t in range(len(cuts) + 1):
        members = [r["doc_id"] for r in rows
                   if sum(r["n_chars"] > c for c in cuts) == t]
        assert members == sorted(members, key=lambda d: (shuf[d], d))

    desc = curriculum_order(docs, "n_chars", seed=3, cuts=cuts,
                            ascending=False).df
    drows = sorted(
        desc.select("doc_id", "n_chars", "pos").collect(),
        key=lambda r: r["pos"],
    )
    dtiers = [sum(r["n_chars"] > c for c in cuts) for r in drows]
    assert dtiers == sorted(dtiers, reverse=True)

    # partitioning invariance
    repart = curriculum_order(
        docs.repartition(13), "n_chars", seed=3, cuts=cuts
    ).df
    got2 = {r["doc_id"]: r["pos"] for r in repart.collect()}
    assert got2 == {r["doc_id"]: r["pos"] for r in rows}


def test_curriculum_order_nulls_train_last_both_directions(spark, sf_correct):
    """Unscoreable (NULL-score) rows occupy a strictly-final tier whether the
    walk is easy→hard or hard→easy — the descending reversal must not flip
    them to train first (round-10 review fix)."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.operators.shuffle import curriculum_order

    docs = (
        load_table(spark, sf_correct, "documents")
        .withColumn(
            "score",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                F.col("n_chars").cast("double")
            ),
        )
        .select("doc_id", "score")
    )
    cuts = [200.0, 350.0]
    for ascending in (True, False):
        out = curriculum_order(
            docs, "score", seed=11, cuts=cuts, ascending=ascending
        ).df
        rows = sorted(out.collect(), key=lambda r: r["pos"])
        n_null = sum(1 for r in rows if r["score"] is None)
        assert n_null > 0
        # every NULL-score row sits in the final contiguous block
        assert all(r["score"] is None for r in rows[-n_null:])
        assert all(r["score"] is not None for r in rows[:-n_null])


def test_curriculum_order_auto_cuts_and_guards(spark, sf_correct):
    import pytest

    from photo_vector_search_spark.operators.shuffle import curriculum_order

    docs = load_table(spark, sf_correct, "documents")
    res = curriculum_order(docs, "n_chars", n_tiers=4, seed=1)
    assert len(res.cuts) == 3  # the persistable artifact
    n = docs.count()
    assert res.df.count() == n
    # sketch cuts give roughly balanced tiers (each within 2x of n/4)
    rows = res.df.select("n_chars").collect()
    for t in range(4):
        size = sum(
            1 for r in rows
            if sum(r["n_chars"] > c for c in res.cuts) == t
        )
        assert n / 8 <= size <= n / 2, (t, size)

    with pytest.raises(ValueError, match="n_tiers"):
        curriculum_order(docs, "n_chars", n_tiers=1)
    with pytest.raises(ValueError, match="ascending"):
        curriculum_order(docs, "n_chars", cuts=[5.0, 2.0])
