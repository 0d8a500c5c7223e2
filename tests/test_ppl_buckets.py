"""CCNet perplexity bucketing (`perplexity_buckets` / `ccnet_keep`): label
parity with an independent NumPy reference computed from the same scores,
cutoff parity with DuckDB's percentile_cont, the paper's semantics (garbage
lands in the tail), unscored handling, and partitioning invariance.

The nll scores themselves are value-parity-tested against a DuckDB twin in
tests/test_bigram_lm.py; here the references consume the ENGINE's scores so
the bucketing rule is isolated (a 2e-6 score difference must not flip a
label assertion)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from photo_vector_search_spark.plans.text_queries import (
    ccnet_keep,
    doc_log_perplexity,
    perplexity_buckets,
    train_bigram_lm,
)
from photo_vector_search_spark.sources.tables import load_table

BOUNDS = (1.0 / 3.0, 2.0 / 3.0)


def _reference_labels(rows, by_vals, bounds=BOUNDS, tol=1e-5):
    """Independent bucketing: np.percentile (linear interpolation — the same
    continuous-quantile definition as Spark's exact `percentile`), rounded
    6dp like the engine. Returns {doc_id: set-of-acceptable-labels}: docs
    whose score sits within `tol` of a cutoff accept either adjacent label
    (the reference's interpolation may differ from the JVM's in the last
    ulp; everything else must match exactly)."""
    out = {}
    groups = {}
    for (doc_id, nll), g in zip(rows, by_vals):
        groups.setdefault(g, []).append((doc_id, nll))
    for g, members in groups.items():
        scored = [(d, v) for d, v in members if v is not None]
        vals = np.array([v for _, v in scored])
        c_head = round(float(np.percentile(vals, bounds[0] * 100)), 6)
        c_mid = round(float(np.percentile(vals, bounds[1] * 100)), 6)
        for d, v in members:
            if v is None:
                out[d] = {"unscored"}
                continue
            labels = set()
            if v <= c_head + tol:
                labels.add("head")
            if c_head - tol < v <= c_mid + tol:
                labels.add("middle")
            if v > c_mid - tol:
                labels.add("tail")
            out[d] = labels
    return out


def test_buckets_match_numpy_reference_per_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lm, vocab = train_bigram_lm(docs)
    got = {
        r["doc_id"]: (r["bucket"], r["nll"], r["lang"])
        for r in perplexity_buckets(docs, lm, vocab, by="lang").collect()
    }
    assert len(got) == docs.count()
    rows = [(d, nll) for d, (_, nll, _) in got.items()]
    want = _reference_labels(rows, [g for (_, (_, _, g)) in got.items()])
    for d, (bucket, _, _) in got.items():
        assert bucket in want[d], (d, bucket, want[d])
    # every language with >= 3 scored docs has all three buckets populated
    langs = {}
    for d, (bucket, nll, lang) in got.items():
        if nll is not None:
            langs.setdefault(lang, set()).add(bucket)
    for lang, buckets in langs.items():
        assert buckets == {"head", "middle", "tail"}, (lang, buckets)


def test_cutoffs_match_duckdb_percentile_cont(spark, sf_dir):
    """Re-derive the per-language cutoffs in DuckDB from the ENGINE's scores
    and check each engine label against them (ties at the cutoff get the
    last-ulp tolerance)."""
    docs = load_table(spark, sf_dir, "documents")
    lm, vocab = train_bigram_lm(docs)
    scored = doc_log_perplexity(docs, lm, vocab)
    pdf = (
        docs.select("doc_id", "lang")
        .join(scored.select("doc_id", "nll"), "doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    try:
        con.register("scored", pdf)
        cuts = {
            lang: (c1, c2)
            for lang, c1, c2 in con.execute(
                f"""
                SELECT lang,
                       round(percentile_cont({BOUNDS[0]}) WITHIN GROUP (ORDER BY nll), 6),
                       round(percentile_cont({BOUNDS[1]}) WITHIN GROUP (ORDER BY nll), 6)
                FROM scored GROUP BY lang
                """
            ).fetchall()
        }
    finally:
        con.close()
    got = {
        r["doc_id"]: (r["bucket"], r["nll"], r["lang"])
        for r in perplexity_buckets(docs, lm, vocab, by="lang").collect()
        if r["nll"] is not None
    }
    for d, (bucket, nll, lang) in got.items():
        c_head, c_mid = cuts[lang]
        if nll <= c_head - 1e-5:
            assert bucket == "head", (d, nll, cuts[lang], bucket)
        elif c_head + 1e-5 < nll <= c_mid - 1e-5:
            assert bucket == "middle", (d, nll, cuts[lang], bucket)
        elif nll > c_mid + 1e-5:
            assert bucket == "tail", (d, nll, cuts[lang], bucket)


def test_garbage_lands_in_tail(spark):
    phrase = "the quick brown fox jumps over the lazy dog again and again"
    fluent = [(i, phrase + f" round {i % 7}") for i in range(80)]
    garbage = [
        (1000 + i, " ".join(f"zq{i}x{j}" for j in range(12))) for i in range(20)
    ]
    docs = spark.createDataFrame(fluent + garbage, "doc_id long, text string")
    lm, vocab = train_bigram_lm(docs)
    rows = perplexity_buckets(docs, lm, vocab, by=None).collect()
    out = {r["doc_id"]: r["bucket"] for r in rows}
    for i in range(20):
        assert out[1000 + i] == "tail", (1000 + i, out[1000 + i])
    # ties share a bucket (the fixture has few distinct texts, so tie runs
    # straddle cutoffs and counts deviate from n/3 — by design); the exact
    # property is score-monotonicity: max(head) <= min(middle) <= ... and
    # every bucket populated
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["nll"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_unscored_and_ccnet_keep(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma"), (2, "single"),
         (3, None), (4, "beta gamma delta alpha beta")],
        "doc_id long, text string",
    )
    lm, vocab = train_bigram_lm(docs)
    out = perplexity_buckets(docs, lm, vocab, by=None)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["bucket"] == "unscored" and rows[2]["nll"] is None
    assert rows[3]["bucket"] == "unscored" and rows[3]["nll"] is None
    kept = {r["doc_id"] for r in ccnet_keep(out).collect()}
    assert 2 not in kept and 3 not in kept
    assert kept <= {0, 1, 4}
    kept_u = {r["doc_id"] for r in ccnet_keep(out, keep_unscored=True).collect()}
    assert {2, 3} <= kept_u
    assert "bucket" not in ccnet_keep(out).columns
    assert "nll" not in ccnet_keep(out).columns


def test_partitioning_invariance_and_approx_path(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lm, vocab = train_bigram_lm(docs)
    a = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs, lm, vocab).collect()
    }
    b = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs.repartition(7), lm, vocab).collect()
    }
    assert a == b
    # the 100 TB path: percentile_approx at default accuracy agrees on all
    # but cutoff-adjacent docs; at fixture scale the sketch is exact or
    # near-exact, so demand >= 95% label agreement and identical coverage
    c = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs, lm, vocab, exact=False).collect()
    }
    assert set(c) == set(a)
    agree = sum(1 for d in a if a[d] == c[d])
    assert agree >= 0.95 * len(a), (agree, len(a))


def test_bounds_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    lm, vocab = train_bigram_lm(docs)
    with pytest.raises(ValueError):
        perplexity_buckets(docs, lm, vocab, bounds=(0.7, 0.3))
