"""RM3 pseudo-relevance feedback (`operators/bm25.rm3_expand` /
`bm25_scores_weighted` / `rm3_topk`): layered DuckDB/Python replay of the
whole chain (feedback retrieval → relevance model → mixture → weighted
rescore), alpha endpoint identities, empty-feedback fallback, and guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.bm25 import (
    BM25_B,
    BM25_K1,
    bm25_scores_weighted,
    bm25_topk,
    query_terms,
    rm3_expand,
    rm3_topk,
)
from photo_vector_search_spark.sources.tables import load_table
from tests.oracle import assert_matches, run_oracle

QUERY = "the quick brown fox"
FB_DOCS, FB_TERMS, ALPHA = 8, 12, 0.5


def _weighted_twin_sql(term_weights, k1=BM25_K1, b=BM25_B) -> str:
    values = ", ".join(f"('{t}', {w!r})" for t, w in term_weights)
    terms = ", ".join(f"'{t}'" for t, _ in term_weights)
    return rf"""
WITH wts(term, w) AS (VALUES {values}),
base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
tf AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*) AS tf
  FROM base, LATERAL unnest(toks) AS t(term)
  WHERE t.term IN ({terms})
  GROUP BY doc_id, len(toks), t.term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       round(sum(wts.w * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl))), 6)
         AS score,
       count(*) AS n_terms
FROM tf JOIN df USING (term) JOIN wts USING (term) CROSS JOIN stats s
GROUP BY tf.doc_id
"""


def _replay_expand(sf_dir: str, query: str) -> list[tuple[str, float]]:
    """Independent DuckDB+Python replay of rm3_expand (feedback top-k via
    the DuckDB bm25 twin, MLE term distribution via SQL, mixture in
    Python)."""
    from tests.test_bm25 import _twin_sql

    orig = query_terms(query)
    p_orig = {t: 1.0 / len(orig) for t in orig}
    fb = (
        run_oracle(_twin_sql(query), sf_dir)
        .sort_values(["bm25", "doc_id"], ascending=[False, True])
        .head(FB_DOCS)
    )
    if not len(fb):
        return sorted(p_orig.items())
    total = float(fb.bm25.sum())
    p_doc = dict(zip(fb.doc_id, fb.bm25 / total))
    ids = ", ".join(str(int(d)) for d in p_doc)
    dist = run_oracle(
        rf"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
          WHERE text IS NOT NULL AND doc_id IN ({ids})
        ),
        tf AS (
          SELECT doc_id, len(toks) AS dl, t.term, count(*) AS tf
          FROM base, LATERAL unnest(toks) AS t(term)
          WHERE len(toks) > 0
          GROUP BY doc_id, len(toks), t.term
        )
        SELECT term, doc_id, tf * 1.0 / dl AS pwd FROM tf
        """,
        sf_dir,
    )
    acc: dict[str, float] = {}
    for _, r in dist.iterrows():
        acc[r.term] = acc.get(r.term, 0.0) + r.pwd * p_doc[r.doc_id]
    top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    out = {}
    for t in set(p_orig) | {t for t, _ in top}:
        w = ALPHA * p_orig.get(t, 0.0) + (1 - ALPHA) * dict(top).get(t, 0.0)
        if w > 0:
            out[t] = w
    return sorted(out.items())


def test_expand_matches_duckdb_python_replay(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = rm3_expand(
        docs, QUERY, fb_docs=FB_DOCS, fb_terms=FB_TERMS, alpha=ALPHA
    )
    want = _replay_expand(sf_correct, QUERY)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)
    # expansion really happened: more terms than the original query
    assert len(got) > len(query_terms(QUERY))


def test_weighted_scores_match_duckdb_twin(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    weights = rm3_expand(
        docs, QUERY, fb_docs=FB_DOCS, fb_terms=FB_TERMS, alpha=ALPHA
    )
    got = bm25_scores_weighted(docs, weights)
    assert got.count() > 0
    assert_matches(got, _weighted_twin_sql(weights), sf_correct)


def test_rm3_topk_end_to_end(spark, sf_correct):
    """Full pipeline vs the replay: expansion weights replayed through the
    DuckDB weighted scorer must reproduce the engine's top-k exactly."""
    docs = load_table(spark, sf_correct, "documents")
    got = rm3_topk(
        docs, QUERY, k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS, alpha=ALPHA
    ).toPandas()
    want = (
        run_oracle(_weighted_twin_sql(_replay_expand(sf_correct, QUERY)), sf_correct)
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.score.tolist() == pytest.approx(want.score.tolist())
    assert got["rank"].tolist() == list(range(1, len(got) + 1))


def test_alpha_one_reproduces_plain_bm25_ranking(spark, sf_correct):
    """α=1 keeps only the original terms with uniform weights — a constant
    factor on BM25, so the RANKING must equal plain bm25_topk exactly."""
    docs = load_table(spark, sf_correct, "documents")
    got = rm3_topk(docs, QUERY, k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
                   alpha=1.0).toPandas()
    want = bm25_topk(docs, QUERY, k=10).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    # and the scores are exactly bm25 / |q| (up to the 6dp rounding)
    nq = len(query_terms(QUERY))
    for s, sb in zip(got.score, want.bm25):
        assert s == pytest.approx(sb / nq, abs=2e-6)


def test_empty_feedback_and_guards(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    w = rm3_expand(docs, "zzznope qqqmiss", fb_docs=5, fb_terms=5)
    assert w == [("qqqmiss", 0.5), ("zzznope", 0.5)]

    with pytest.raises(ValueError, match="fb_docs"):
        rm3_expand(docs, "alpha", fb_docs=0)
    with pytest.raises(ValueError, match="alpha"):
        rm3_expand(docs, "alpha", alpha=1.5)
    with pytest.raises(ValueError, match="no terms"):
        rm3_expand(docs, "   ")
    with pytest.raises(ValueError, match="empty"):
        bm25_scores_weighted(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_scores_weighted(docs, [("a", 0.5), ("a", 0.5)])
    with pytest.raises(ValueError, match="must be > 0"):
        bm25_scores_weighted(docs, [("a", 0.0)])
    with pytest.raises(ValueError, match="k must be"):
        rm3_topk(docs, "alpha", k=0)


def test_expansion_improves_term_recall(spark, sf_correct):
    """Sanity: RM3's expanded term set retrieves documents the raw query
    cannot (docs matching only expansion terms get nonzero scores)."""
    docs = load_table(spark, sf_correct, "documents")
    weights = rm3_expand(
        docs, QUERY, fb_docs=FB_DOCS, fb_terms=FB_TERMS, alpha=ALPHA
    )
    new_terms = [t for t, _ in weights if t not in query_terms(QUERY)]
    assert new_terms
    matched_raw = {
        r["doc_id"]
        for r in bm25_scores_weighted(
            docs, [(t, 1.0) for t in query_terms(QUERY)]
        ).collect()
    }
    matched_rm3 = {
        r["doc_id"] for r in bm25_scores_weighted(docs, weights).collect()
    }
    assert matched_rm3 >= matched_raw
    assert matched_rm3 - matched_raw


def test_cli_search_text_expand_rm3(tmp_path, capsys, spark):
    """`search-text --expand rm3` runs the feedback loop end to end and
    prints the weighted scores; invalid RM3 params exit 2."""
    from photo_vector_search_spark.cli import main

    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a slow green turtle naps under the warm sun"),
            (3, "quick quick fox fox everywhere in this text"),
            (4, "lazy dog sleeps while the fox runs"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)

    rc = main(
        ["search-text", "--docs", docs_path, "quick fox", "-k", "4",
         "--expand", "rm3", "--fb-docs", "2", "--fb-terms", "5"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # expansion pulls in docs sharing only feedback terms (doc 4 via
    # lazy/dog/the), so MORE than the 2 raw-match docs rank
    assert len(out) == 4
    assert all("bm25=" in ln for ln in out)

    assert main(
        ["search-text", "--docs", docs_path, "quick fox",
         "--expand", "rm3", "--alpha", "1.5"]
    ) == 2
    assert "alpha" in capsys.readouterr().err
