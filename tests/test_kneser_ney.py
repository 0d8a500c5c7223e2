"""Interpolated Kneser-Ney bigram LM: a full DuckDB SQL twin (train on the
even-doc half, score everything — exercising the unseen-context and
unseen-continuation backoff paths), an independent Python reference, the
Σ P(w2|w1) = 1 normalization invariant, and filter semantics."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.kneser_ney import (
    doc_log_perplexity_kn,
    kn_ppl_filter,
    train_kn_lm,
)
from photo_vector_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_matches_duckdb_twin_with_held_out_docs(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    lm, consts = train_kn_lm(train, stage=False)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in doc_log_perplexity_kn(docs, lm, consts).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    k = consts["k_cont"]
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
  FROM toks WHERE len(ts) >= 2
),
big AS (SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM pos),
c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM big
  WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
w1t AS (SELECT w1, sum(c12) AS c1, count(*) AS ncont1 FROM c12 GROUP BY 1),
w2t AS (SELECT w2, count(*) AS npred2 FROM c12 GROUP BY 1),
nt AS (
  SELECT count(*) AS n_types,
         sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
  FROM c12
),
v AS (
  SELECT count(DISTINCT tok) AS vs FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
    FROM documents WHERE doc_id % 2 = 0)
),
d AS (
  SELECT CASE WHEN n1 + 2 * n2 > 0
              THEN least(0.95, greatest(0.05, n1 / (n1 + 2.0 * n2)))
              ELSE 0.75 END AS dd,
         n_types
  FROM nt
)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(-log2(
         CASE WHEN w1t.c1 IS NOT NULL
           THEN greatest(coalesce(c12.c12, 0) - (SELECT dd FROM d), 0)
                  / w1t.c1
                + (SELECT dd FROM d) * w1t.ncont1 / w1t.c1
                  * ((coalesce(w2t.npred2, 0) + {k})
                     / ((SELECT n_types FROM d) + {k} * (SELECT vs FROM v)))
           ELSE (coalesce(w2t.npred2, 0) + {k})
                / ((SELECT n_types FROM d) + {k} * (SELECT vs FROM v))
         END)), 6) AS nll
FROM big b
LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
LEFT JOIN w1t ON b.w1 = w1t.w1
LEFT JOIN w2t ON b.w2 = w2t.w2
GROUP BY b.doc_id
""").fetchall()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d


def _toy_docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "the cat ate the fish"),
        (3, "a dog and a cat"),
        (4, "fish swim and birds fly over the mat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_python_reference_and_normalization_invariant(spark):
    """Independent per-bigram Python replay of the formula matches the
    DataFrame scorer, and Σ_{w2∈V} P(w2|w1) = 1 exactly for every seen w1
    AND for the unseen-context backoff."""
    docs = _toy_docs(spark)
    lm, consts = train_kn_lm(docs, stage=False)
    rows = lm.collect()
    c12 = {(r["w1"], r["w2"]): r["c12"] for r in rows}
    w1t = {r["w1"]: (r["c1"], r["ncont1"]) for r in rows}
    w2t = {r["w2"]: r["npred2"] for r in rows}
    vocab = sorted(
        {
            t
            for r in docs.collect()
            for t in r["text"].lower().strip().split()
        }
    )
    assert consts["vocab_size"] == len(vocab)
    D, nt, k = consts["D"], consts["n_types"], consts["k_cont"]

    def pc(w2):
        return (w2t.get(w2, 0) + k) / (nt + k * len(vocab))

    def p(w1, w2):
        if w1 not in w1t:
            return pc(w2)
        c1, ncont = w1t[w1]
        return max(c12.get((w1, w2), 0) - D, 0) / c1 + D * ncont / c1 * pc(
            w2
        )

    # normalization: seen contexts and the unseen-context fallback both
    # distribute exactly one unit of mass over the vocabulary
    for w1 in list(w1t)[:5] + ["neverseenword"]:
        assert sum(p(w1, w2) for w2 in vocab) == pytest.approx(
            1.0, abs=1e-9
        ), w1

    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in doc_log_perplexity_kn(docs, lm, consts).collect()
    }
    for r in docs.collect():
        ts = r["text"].lower().strip().split()
        grams = list(zip(ts, ts[1:]))
        nll = sum(-math.log2(p(a, b)) for a, b in grams) / len(grams)
        assert got[r["doc_id"]] == (
            len(grams),
            pytest.approx(round(nll, 6), abs=2e-6),
        ), r["doc_id"]


def test_discount_estimate_and_guards(spark):
    docs = _toy_docs(spark)
    lm, consts = train_kn_lm(docs, stage=False)
    assert 0.05 <= consts["D"] <= 0.95
    # explicit discount wins
    _, c2 = train_kn_lm(docs, stage=False, discount=0.4)
    assert c2["D"] == 0.4
    with pytest.raises(ValueError, match="discount"):
        train_kn_lm(docs, stage=False, discount=1.5)
    with pytest.raises(ValueError, match="keep_frac"):
        kn_ppl_filter(docs, lm, consts, keep_frac=0.0)


def test_kn_filter_keeps_most_fluent_fraction(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm, consts = train_kn_lm(docs, stage=False)
    scored = doc_log_perplexity_kn(docs, lm, consts)
    n_scored = scored.count()
    kept = kn_ppl_filter(docs, lm, consts, keep_frac=0.5, exact=True)
    n_kept = kept.count()
    # exact percentile keeps ~half (ties at the cutoff may add a few)
    assert 0.45 * n_scored <= n_kept <= 0.6 * n_scored
    # every kept doc scores <= every dropped doc's nll
    max_kept = kept.agg(F.max("nll")).first()[0]
    dropped = scored.join(kept.select("doc_id"), "doc_id", "left_anti")
    min_drop = dropped.agg(F.min("nll")).first()[0]
    assert max_kept <= min_drop
    # the sketch path returns a similar-sized keep set
    n_approx = kn_ppl_filter(docs, lm, consts, keep_frac=0.5).count()
    assert abs(n_approx - n_kept) <= 0.1 * n_scored
