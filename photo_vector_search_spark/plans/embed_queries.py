"""Declared queries for the embedding-generation pipeline (SURVEY §2.7, §7 phase 3).

`embed_documents` value-checks embedding GENERATION itself (stub formula computed
independently by DuckDB); `search_by_text` is the reference's
`search-photos-by-text` flow end-to-end: embed the query string → cosine top-k
(photo_vector_search.py:156-176 with `_get_text_embedding`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.vector import cosine_distance
from photo_vector_search_spark.pipelines.embed import (
    stub_embedding_expr,
    stub_embedding_sql,
    with_stub_embedding,
)
from photo_vector_search_spark.sources.tables import load_table


def q_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-embed every document (JVM expression path); project spot components
    + the norm so values (not just shape) are oracle-checked."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = with_stub_embedding(docs, "text")
    norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return emb.select(
        "doc_id",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 2), 6).alias("e1"),
        F.round(F.element_at("embedding", 64), 6).alias("e63"),
        F.round(norm, 6).alias("norm"),
    )


_ORACLE_EMBED_DOCS = f"""
WITH emb AS (
  SELECT doc_id, {stub_embedding_sql('text')} AS e FROM documents
)
SELECT doc_id,
       round(e[1], 6) AS e0,
       round(e[2], 6) AS e1,
       round(e[64], 6) AS e63,
       round(sqrt(list_sum(list_transform(e, x -> x*x))), 6) AS norm
FROM emb
"""


_QUERY_TEXT = "tractor"  # the reference's own example query (examples.txt:11)


def q_search_by_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → stub embedding → exact cosine top-5 over the embeddings table —
    the full `search-photos-by-text` path (SURVEY §3.2), embedding computed
    in-engine on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = spark.range(1).select(
        stub_embedding_expr(F.lit(_QUERY_TEXT)).cast("array<double>").alias("qv")
    )
    from photo_vector_search_spark.operators.knn import _valid_dist

    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        cosine_distance(F.col("embedding"), F.col("qv")).alias("_dist"),
    ).filter(_valid_dist(F.col("_dist")))  # zero-norm rows never rank (any path)
    return (
        scored.orderBy(F.col("_dist").asc(), F.col("vec_id").asc())
        .limit(5)
        .select("vec_id", "label", F.round("_dist", 6).alias("dist"))
    )


_ORACLE_SEARCH_BY_TEXT = f"""
WITH q AS (SELECT {stub_embedding_sql(f"'{_QUERY_TEXT}'")} AS qv),
scored AS (
  SELECT vec_id, label,
         1.0 - list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS d
  FROM embeddings
)
SELECT vec_id, label, round(d, 6) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT 5
"""


_EVAL_K = 10
_EVAL_N_QUERIES = 16


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out label-retrieval eval (`operators/evaluation`): the first
    16 vectors query the corpus (self excluded), gold = same-label others,
    per-query recall/precision/hit/MRR/nDCG at k=10. The eval half the
    reference's retrieval engine never had (SURVEY §2.10 similarity-search
    extension); one results⋈gold join + one per-query agg, both broadcast/
    map-side-combinable at scale."""
    from pyspark.sql import Window

    from photo_vector_search_spark.operators.evaluation import retrieval_metrics

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _EVAL_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    results = (
        emb.crossJoin(F.broadcast(queries.drop("query_label")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_distance(
                F.col("embedding").cast("array<double>"), F.col("query_vec")
            ).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _EVAL_K)
    )
    gold = (
        emb.select("vec_id", "label")
        .join(
            F.broadcast(queries.select("query_id", "query_label")),
            F.col("label") == F.col("query_label"),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    return retrieval_metrics(results, gold, _EVAL_K, doc_col="vec_id")


_ORACLE_RETRIEVAL_EVAL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < {_EVAL_N_QUERIES}
),
ranked AS (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY 1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv) ASC,
                    e.vec_id ASC
         ) AS rank
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
res AS (SELECT * FROM ranked WHERE rank <= {_EVAL_K}),
gold AS (
  SELECT q.query_id, e.vec_id
  FROM embeddings e JOIN q ON e.label = q.ql AND e.vec_id <> q.query_id
),
gn AS (SELECT query_id, count(*) AS n_gold FROM gold GROUP BY query_id),
h AS (
  SELECT r.query_id, count(*) AS n_hits, min(r.rank) AS first_rank,
         sum(1.0 / log2(r.rank + 1.0)) AS dcg
  FROM res r JOIN gold g ON g.query_id = r.query_id AND g.vec_id = r.vec_id
  GROUP BY r.query_id
),
idcg AS (
  SELECT gn.query_id, sum(1.0 / log2(ri.i + 1.0)) AS v
  FROM gn JOIN (SELECT unnest(generate_series(1, {_EVAL_K})) AS i) ri
    ON ri.i <= least({_EVAL_K}, gn.n_gold)
  GROUP BY gn.query_id
)
SELECT gn.query_id, gn.n_gold,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 / gn.n_gold, 6) AS recall,
       round(coalesce(h.n_hits, 0) * 1.0 / {_EVAL_K}, 6) AS precision,
       CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS hit,
       round(coalesce(1.0 / h.first_rank, 0.0), 6) AS mrr,
       round(coalesce(h.dcg, 0.0) / idcg.v, 6) AS ndcg
FROM gn
LEFT JOIN h ON h.query_id = gn.query_id
JOIN idcg ON idcg.query_id = gn.query_id
"""


_BQ_K = 8
_BQ_DIM = 64  # the fixture embedding width (the operator itself is dim-agnostic)


def q_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit serving rung (`operators/bq`): fit per-component mean
    thresholds, pack sign bits into int64 words, Hamming top-8 for the
    vec_id=0 query — distance is pure codegen ``bit_count(code XOR q)``
    into TakeOrderedAndProject (zero exchanges; plan pinned in PLANS.md).
    The oracle recomputes thresholds (round(avg, 6) — the engine-portable
    sign boundary) and counts sign mismatches directly, so the packed
    representation itself is value-checked end to end."""
    from photo_vector_search_spark.operators.bq import (
        encode_bq,
        fit_bq,
        hamming_topk,
    )
    from photo_vector_search_spark.operators.knn import fetch_query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_bq(emb)
    coded = encode_bq(emb, model)
    vec = fetch_query_vector(spark, sf_dir, 0)
    return hamming_topk(coded, model, vec, k=_BQ_K)


_ORACLE_HAMMING_TOPK = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
comps AS (
  SELECT r.range AS i, round(avg(v[r.range]), 6) AS a
  FROM e, range(1, {_BQ_DIM + 1}) r GROUP BY 1
),
thr AS (SELECT list(a ORDER BY i) AS t FROM comps),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         length(list_filter(range(1, {_BQ_DIM + 1}),
                            i -> (v[i] > t[i]) != (qv[i] > t[i]))) AS h
  FROM e, thr, q
)
SELECT vec_id, label, h AS hamming,
       row_number() OVER (ORDER BY h ASC, vec_id ASC) AS rank
FROM scored ORDER BY h ASC, vec_id ASC LIMIT {_BQ_K}
"""


def q_pool_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-embedding pooling (`operators/embeddings.pool_embeddings`,
    label standing in for the chunk group): per-group component means, L2
    renormalized, with the summation order pinned on vec_id so the result
    is partitioning-invariant. Declared output = group, chunk count, spot
    components (arrays stay out of the compare, FIXTURES.md). Supersedes
    the retired `label_prototypes` slot — the same grouped-mean machinery
    plus the renorm/weighting the pooling operator adds."""
    from photo_vector_search_spark.operators.embeddings import pool_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    pooled = pool_embeddings(
        emb, by="label", vec_col="embedding", order_col="vec_id"
    )
    return pooled.select(
        "label",
        "n_chunks",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 33), 6).alias("e32"),
        F.round(F.element_at("embedding", 64), 6).alias("e63"),
    )


_ORACLE_POOL_EMBEDDINGS = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
comps AS (
  SELECT label, r.range AS i, avg(v[r.range]) AS m
  FROM e, range(1, 65) r GROUP BY 1, 2
),
vecs AS (
  SELECT label, list(m ORDER BY i) AS mv FROM comps GROUP BY label
),
n AS (SELECT label, count(*) AS n_chunks FROM e GROUP BY label),
nrm AS (
  SELECT label, sqrt(list_sum(list_transform(mv, x -> x*x))) AS s, mv
  FROM vecs
)
SELECT n.label, n.n_chunks,
       round(mv[1] / s, 6) AS e0,
       round(mv[33] / s, 6) AS e32,
       round(mv[64] / s, 6) AS e63
FROM nrm JOIN n USING (label)
"""


_RRF_QUERY = "the quick brown fox"


def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion (promoted r12): a vector run (batched exact
    cosine top-8 for 4 queries) and a lexical run (BM25 top-8, fanned out
    per query) merged by Reciprocal Rank Fusion (Cormack et al. 2009,
    score = Σ 1/(60+rank)) — the Elasticsearch/OpenSearch hybrid-search
    default. The DuckDB oracle recomputes BOTH rankers AND the fusion
    end-to-end from the parquet tables."""
    from photo_vector_search_spark.operators.bm25 import bm25_topk
    from photo_vector_search_spark.operators.fusion import rrf_fuse
    from photo_vector_search_spark.operators.knn import knn_batch_fast

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # declared through the map-side matmul fast path (the `knn_batch`
    # declaration precedent: tie-break- and rounding-parity-tested against
    # the window formulation, which the oracle SQL mirrors) — the window
    # form shuffles N·Q scored rows, the fast path O(batches·Q·k) (r12)
    vec_run = knn_batch_fast(emb, queries, k=8).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    lex = bm25_topk(docs, _RRF_QUERY, k=8).select("doc_id", "rank")
    lex_run = queries.select("query_id").crossJoin(lex)
    return rrf_fuse([vec_run, lex_run], k=60)


def _rrf_oracle(query: str) -> str:
    from photo_vector_search_spark.operators.bm25 import query_terms

    terms = ", ".join(f"'{t}'" for t in query_terms(query))
    return rf"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 4
),
vscored AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY 1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv) ASC,
                    e.vec_id ASC) AS rank
  FROM embeddings e CROSS JOIN q
),
vec_run AS (SELECT query_id, doc_id, rank FROM vscored WHERE rank <= 8),
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
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
lscores AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6)
           AS bm25
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
lexranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM lscores
),
lex_top AS (SELECT doc_id, rank FROM lexranked WHERE rank <= 8),
lex_run AS (
  SELECT qq.query_id, lex_top.doc_id, lex_top.rank
  FROM (SELECT DISTINCT query_id FROM q) qq CROSS JOIN lex_top
),
u AS (
  SELECT query_id, doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS c FROM vec_run
  UNION ALL
  SELECT query_id, doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS c FROM lex_run
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
  FROM u GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score,
       row_number() OVER (
         PARTITION BY query_id
         ORDER BY rrf_score DESC, doc_id ASC) AS rank
FROM fused
"""


def q_ivf_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF retrieval through the ADAPTIVE multi-probe path (retired from the
    declared window r12 — its oracle is literally the exact-knn SQL that
    `knn_topk` already holds declared; the full train→assign→radii→
    bounded-probe machinery stays DuckDB-verified here and plan/scale-
    audited via its bench cases): probe clusters in centroid-distance order
    until the triangle bound ``||q−c|| − r_c`` proves no unprobed cluster
    can improve the top-k — uncapped, PROVABLY the exact top-k."""
    from photo_vector_search_spark.operators.ann import (
        assign_clusters,
        cluster_radii,
        ivf_topk_adaptive,
        train_centroids,
    )
    from photo_vector_search_spark.operators.knn import fetch_query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb, n_clusters=8)
    indexed = assign_clusters(emb, centroids)
    radii = cluster_radii(indexed, centroids)
    vec = fetch_query_vector(spark, sf_dir, 0)
    return ivf_topk_adaptive(indexed, centroids, radii, vec, k=5)


_ORACLE_IVF_EXACT = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         1.0 - list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS d
  FROM embeddings
)
SELECT vec_id, label, round(d, 6) AS dist
FROM scored
ORDER BY d ASC, vec_id ASC
LIMIT 5
"""


QUERIES = {
    "embed_documents": q_embed_documents,
    "search_by_text": q_search_by_text,
    "retrieval_eval": q_retrieval_eval,
    "hamming_topk": q_hamming_topk,
    "rrf_fuse": q_rrf_fuse,
    "pool_embeddings": q_pool_embeddings,
}

ORACLES = {
    "embed_documents": _ORACLE_EMBED_DOCS,
    "search_by_text": _ORACLE_SEARCH_BY_TEXT,
    "retrieval_eval": _ORACLE_RETRIEVAL_EVAL,
    "hamming_topk": _ORACLE_HAMMING_TOPK,
    "rrf_fuse": _rrf_oracle(_RRF_QUERY),
    "pool_embeddings": _ORACLE_POOL_EMBEDDINGS,
}

# Retired from the 50-slot declared surface (driver checks exactly 50
# entries; see text_queries.RETIRED_QUERIES). Still implemented + locally
# oracle-verified via tests/test_retired_surface.py:
RETIRED_QUERIES = {
    "ivf_topk_exact": q_ivf_topk_exact,
}

RETIRED_ORACLES = {
    "ivf_topk_exact": _ORACLE_IVF_EXACT,
}
