"""DSIR importance weighting: value parity vs an independent Python
reference, partitioning invariance, selection semantics, guards, and a
DuckDB twin of the full scoring rule."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_pipeline,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches


# --- independent reference (pure Python, no Spark) --------------------------


def _py_tokens(text):
    if text is None:
        return []
    return [t for t in text.strip().lower().split() if t != ""]


def _py_grams(text):
    t = _py_tokens(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _py_bucket(gram, b):
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % b


def _py_scores(rows, target_ids, b):
    """rows: [(id, text)]; returns {id: (n_feats, score)} — the obviously
    correct serial scorer."""
    c_raw: dict[int, int] = {}
    c_tgt: dict[int, int] = {}
    feats = {}
    for i, text in rows:
        bs = [_py_bucket(g, b) for g in _py_grams(text)]
        feats[i] = bs
        for k in bs:
            c_raw[k] = c_raw.get(k, 0) + 1
            if i in target_ids:
                c_tgt[k] = c_tgt.get(k, 0) + 1
    n_raw, n_tgt = sum(c_raw.values()), sum(c_tgt.values())
    lr = {
        k: math.log((c_tgt.get(k, 0) + 1.0) / (n_tgt + b))
        - math.log((c_raw[k] + 1.0) / (n_raw + b))
        for k in c_raw
    }
    return {
        i: (len(bs), sum(lr[k] for k in bs)) for i, bs in feats.items()
    }


FIXTURE = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "lorem ipsum dolor sit amet consectetur"),
    (3, "quick brown foxes jump"),
    (4, None),
    (5, ""),
    (6, "the the the the"),
    (7, "dolor sit amet"),
    (8, "a completely unrelated sentence about spark engines"),
    (9, "the quick brown fox jumps"),
]
TARGET_IDS = {0, 1, 9}  # "fox-like" docs are the target distribution


def _fixture_df(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


def test_scores_match_python_reference(spark):
    docs = _fixture_df(spark)
    ratios = dsir_log_ratios(
        docs, target_filter=F.col("doc_id").isin(*TARGET_IDS), n_buckets=512
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"])
        for r in dsir_scores(docs, ratios, n_buckets=512).collect()
    }
    want = _py_scores(FIXTURE, TARGET_IDS, 512)
    assert set(got) == set(r[0] for r in FIXTURE)
    for i, text in FIXTURE:
        if not _py_grams(text):
            assert got[i] == (0, 0.0), i  # featureless docs pass through at 0
        else:
            nf, s = want[i]
            assert got[i][0] == nf, i
            assert got[i][1] == pytest.approx(s, abs=1e-9), i
    # target-like docs must outscore the unrelated one
    assert got[9][1] > got[8][1] and got[1][1] > got[2][1]


def test_partitioning_invariance(spark):
    docs = _fixture_df(spark)
    flt = F.col("doc_id").isin(*TARGET_IDS)

    def run(df):
        ratios = dsir_log_ratios(df, target_filter=flt, n_buckets=512)
        return {
            r["doc_id"]: r["dsir_score"]
            for r in dsir_scores(df, ratios, n_buckets=512).collect()
        }

    a = run(docs.repartition(7))
    b = run(docs.coalesce(1))
    assert a == b  # decimal-accumulated sums: EXACT equality, not approx


def test_separate_target_corpus_matches_filter_form(spark):
    docs = _fixture_df(spark)
    tgt = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
    r_filter = dsir_log_ratios(
        docs, target_filter=F.col("doc_id").isin(*TARGET_IDS), n_buckets=512
    )
    r_corpus = dsir_log_ratios(docs, target_docs=tgt, n_buckets=512)
    a = {r["bucket"]: r["lr"] for r in r_filter.collect()}
    b = {r["bucket"]: r["lr"] for r in r_corpus.collect()}
    assert a == b


def test_select_gumbel_semantics(spark):
    docs = _fixture_df(spark)
    flt = F.col("doc_id").isin(*TARGET_IDS)
    scored = dsir_scores(docs, dsir_log_ratios(docs, flt, n_buckets=512), 512)
    # deterministic under re-run and partitioning
    a = {r["doc_id"] for r in dsir_select(scored, 4, seed=3).collect()}
    b = {
        r["doc_id"]
        for r in dsir_select(scored.repartition(5), 4, seed=3).collect()
    }
    assert a == b and len(a) == 4
    # a different seed can pick a different set; tiny T = deterministic top-k
    cold = {
        r["doc_id"]
        for r in dsir_select(scored, 4, temperature=1e-9).collect()
    }
    by_score = [
        r["doc_id"]
        for r in scored.orderBy(
            F.col("dsir_score").desc(), F.col("doc_id")
        ).limit(4).collect()
    ]
    assert cold == set(by_score)
    # selection is score-biased: among FEATURED docs (featureless ones score a
    # neutral 0.0 — "no evidence" — which tops this all-negative fixture and
    # is why real DSIR runs drop empty docs first) the 3 target docs hold the
    # 3 best scores, so a cold-ish T must hand them most of the slots
    featured = scored.filter(F.col("n_feats") > 0)
    hits = 0
    for seed in range(8):
        sel = {
            r["doc_id"]
            for r in dsir_select(featured, 3, temperature=0.25, seed=seed).collect()
        }
        hits += len(sel & TARGET_IDS)
    assert hits >= 18  # uniform would average 9/24; score-dominated ≈ 24


def test_guards(spark):
    docs = _fixture_df(spark)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_ratios(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_ratios(docs, target_filter=F.lit(True), target_docs=docs)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_log_ratios(docs, target_filter=F.lit(True), n_buckets=10**6)
    with pytest.raises(ValueError, match="target corpus has no features"):
        dsir_log_ratios(docs, target_filter=F.lit(False))
    scored = docs.withColumn("dsir_score", F.lit(0.0))
    with pytest.raises(ValueError, match="n_keep"):
        dsir_select(scored, 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(scored, 1, temperature=0.0)


def test_pipeline_end_to_end(spark):
    docs = _fixture_df(spark)
    kept = dsir_pipeline(
        docs, n_keep=3, target_filter=F.col("doc_id").isin(*TARGET_IDS),
        n_buckets=512, temperature=0.25, seed=1,
    )
    rows = kept.collect()
    assert len(rows) == 3
    assert set(kept.columns) >= {"doc_id", "text", "dsir_score", "n_feats"}


def test_duckdb_twin_scoring_rule(spark, sf_correct):
    """The full rule — grams, hashed buckets, one-pass conditional counts,
    smoothed engine-side log-ratios, decimal-exact per-doc sums — replayed
    in DuckDB over the documents parquet."""
    docs = load_table(spark, sf_correct, "documents")
    ratios = dsir_log_ratios(
        docs, target_filter=F.col("source") == "src0", n_buckets=4096
    )
    out = dsir_scores(docs, ratios, n_buckets=4096).select(
        "doc_id", "n_feats", F.round("dsir_score", 6).alias("dsir_score")
    )
    oracle = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(t || list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks
),
feats AS (
  SELECT doc_id, source,
         CAST(CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT) % 4096
              AS INTEGER) AS bucket
  FROM grams
),
counts AS (
  SELECT bucket, count(*) AS c_raw,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c_tgt
  FROM feats GROUP BY bucket
),
tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM counts),
lr AS (
  SELECT bucket,
         ln((c_tgt + 1.0) / CAST(n_tgt + 4096 AS DOUBLE))
           - ln((c_raw + 1.0) / CAST(n_raw + 4096 AS DOUBLE)) AS lr
  FROM counts CROSS JOIN tot
),
scored AS (
  SELECT f.doc_id, count(*) AS n_feats,
         sum(CAST(l.lr AS DECIMAL(28,18))) AS s
  FROM feats f JOIN lr l USING (bucket) GROUP BY f.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_feats, 0) AS n_feats,
       round(COALESCE(CAST(s.s AS DOUBLE), 0.0), 6) AS dsir_score
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
    assert_matches(out, oracle, sf_correct)


def test_featurize_once_path_matches_rederive_path(spark):
    """The staged single-explode path (dsir_featurize + feats=) must be
    value-identical to the re-derive path — decimal sums make this EXACT."""
    from photo_vector_search_spark.operators.dsir import dsir_featurize

    docs = _fixture_df(spark)
    flt = F.col("doc_id").isin(*TARGET_IDS)
    ratios_a = dsir_log_ratios(docs, target_filter=flt, n_buckets=512)
    a = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"])
        for r in dsir_scores(docs, ratios_a, 512).collect()
    }
    feats = dsir_featurize(docs, flt, n_buckets=512)
    ratios_b = dsir_log_ratios(None, n_buckets=512, feats=feats)
    b = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"])
        for r in dsir_scores(docs, ratios_b, 512, feats=feats).collect()
    }
    assert a == b


def test_null_predicate_docs_are_not_target(spark):
    """A NULL target predicate (e.g. source == 'src0' with NULL source) must
    mean NOT-target — matching the oracle's CASE ... ELSE 0 — not poison the
    collected counts (r7 review fix: un-coalesced NULLs made F.sum return
    None and the totals sum throw)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta", "src0"), (2, "zzz qqq www", None), (3, "alpha", "src1")],
        "doc_id long, text string, source string",
    )
    flt = F.col("source") == "src0"
    ratios = dsir_log_ratios(docs, target_filter=flt, n_buckets=64)
    scored = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(docs, ratios, 64).collect()
    }
    assert set(scored) == {1, 2, 3}
    assert scored[1] > scored[2]  # target doc outscores the NULL-source doc
    # the curation stage path (featurize) handles NULLs identically
    from photo_vector_search_spark.operators.dsir import dsir_featurize

    feats = dsir_featurize(docs, flt, n_buckets=64)
    ratios2 = dsir_log_ratios(None, n_buckets=64, feats=feats)
    a = {r["bucket"]: r["lr"] for r in ratios.collect()}
    b = {r["bucket"]: r["lr"] for r in ratios2.collect()}
    assert a == b


def test_feats_combined_with_target_args_rejected(spark):
    from photo_vector_search_spark.operators.dsir import dsir_featurize

    docs = _fixture_df(spark)
    feats = dsir_featurize(docs, F.lit(True), n_buckets=64)
    with pytest.raises(ValueError, match="embeds the target flag"):
        dsir_log_ratios(docs, target_filter=F.lit(True), feats=feats)
    with pytest.raises(ValueError, match="embeds the target flag"):
        dsir_log_ratios(None, target_docs=docs, feats=feats)
