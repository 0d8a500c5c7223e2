"""Declared queries for training-data pipeline operators beyond dedup: set ops,
rollup, distinct counts, deterministic train/test split, sequence packing —
the remaining SURVEY §2.4 A4 / §2.10 surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import token_count
from photo_vector_search_spark.sources.tables import load_table


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — exact distinct counts per dimension. The scale variant is
    ``approx_distinct_counts`` below (HLL sketches aren't cross-engine
    comparable, so the declared oracle stays exact)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("text").alias("n_texts"),
        F.count(F.lit(1)).alias("n_docs"),
    )


_ORACLE_DISTINCT_COUNTS = """
SELECT count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       count(DISTINCT text) AS n_texts,
       count(*) AS n_docs
FROM documents
"""


def approx_distinct_counts(docs: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HLL++ sketch variant of ``q_distinct_counts`` — the 100 TB path.

    Exact ``count_distinct`` over a high-cardinality column shuffles every
    distinct VALUE (the text column is the whole corpus); the sketch is a
    fixed-size register array per partition, merged map-side — one shuffle of
    kilobytes regardless of data size. ``rsd`` is the target relative standard
    deviation (Spark's HLL++ parameter). Not oracle-declared: sketch estimates
    are engine-specific (FIXTURES.md exactness policy); accuracy is bounded
    against the exact anchor in tests/test_sketches.py."""
    return docs.agg(
        F.approx_count_distinct("lang", rsd).alias("n_langs"),
        F.approx_count_distinct("source", rsd).alias("n_sources"),
        F.approx_count_distinct("text", rsd).alias("n_texts"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (union/intersect/except — no reference analogue, engine
    scaffolding): langs seen by src0 but not src1, plus langs seen by both."""
    docs = load_table(spark, sf_dir, "documents")
    src0 = docs.filter(F.col("source") == "src0").select("lang")
    src1 = docs.filter(F.col("source") == "src1").select("lang")
    # set semantics need distinct BEFORE except: exceptAll on raw rows removes
    # only one occurrence per match, so shared langs with multiplicity >1 in
    # src0 would survive and be mislabeled "only_src0"
    only0 = (
        src0.distinct().exceptAll(src1.distinct()).withColumn("kind", F.lit("only_src0"))
    )
    both = src0.intersect(src1).withColumn("kind", F.lit("both"))
    return only0.unionByName(both).select("kind", "lang")


_ORACLE_SET_OPS = """
WITH src0 AS (SELECT lang FROM documents WHERE source = 'src0'),
src1 AS (SELECT lang FROM documents WHERE source = 'src1'),
only0 AS (
  SELECT 'only_src0' AS kind, lang FROM (
    SELECT DISTINCT lang FROM src0 EXCEPT SELECT DISTINCT lang FROM src1)
),
in_both AS (SELECT 'both' AS kind, lang FROM (SELECT lang FROM src0 INTERSECT SELECT lang FROM src1))
SELECT kind, lang FROM only0 UNION ALL SELECT kind, lang FROM in_both
"""


def q_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (engine scaffolding, SURVEY §2.4 note): event counts by
    (event_type, day) with subtotals and grand total — via the same
    rollup-from-finest pattern as `cube_lineitem` (one finest pass over events,
    the 3 rollup sets expanded on the tiny aggregate; count/decimal-sum are
    exact decomposable aggs so values are bit-identical to one-pass ROLLUP,
    which remains the oracle's formulation)."""
    from photo_vector_search_spark.plans.relational import regroup_from_finest

    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    finest = (
        ev.select("event_type", day, "value")
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_dv"),
        )
    )
    rollup_sets = [("event_type", "day"), ("event_type",), ()]
    return regroup_from_finest(finest, ["event_type", "day"], rollup_sets).select(
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        F.coalesce("day", F.lit("<all>")).alias("day"),
        "n",
        F.round(F.col("_dv").cast("double"), 4).alias("total_value"),
    )


_ORACLE_ROLLUP_EVENTS = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day, '<all>') AS day,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
      FROM events)
GROUP BY ROLLUP (event_type, day)
"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (the reproducible alternative to randomSplit —
    stable under re-runs and insertions, the property a training pipeline needs).
    Bucket = md5(doc_id) mod 100; test = bucket < 10 (10%)."""
    from photo_vector_search_spark.functions.text import hash32

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    split = F.when(bucket < 10, "test").otherwise("train")
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_ORACLE_TRAIN_TEST_SPLIT = """
WITH b AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
           AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 10 THEN 'test' ELSE 'train' END AS split,
       count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM b GROUP BY 1
"""


PACK_CAP = 512  # tokens per packed sequence


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sequence packing: documents in doc_id order are assigned to packs
    by exclusive running token count div cap — the deterministic approximation of
    greedy packing used by training pipelines (window cumsum, no per-pack state).

    The global-ordered window is a single-partition reduction — fine for a
    declared correctness query, but at 100 TB you shard first (pack within
    hash(doc_id) shards, or two-pass: per-partition token sums → prefix offsets →
    local cumsum + offset; same outputs, fully parallel). Output: per-pack doc
    count and token fill."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    packed = docs.withColumn(
        "pack_id",
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / PACK_CAP).cast("long"),
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


_ORACLE_PACK_DOCUMENTS = rf"""
WITH toks AS (
  SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok FROM documents
),
packed AS (
  SELECT doc_id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAP})
              AS BIGINT) AS pack_id
  FROM toks
)
SELECT pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM packed GROUP BY pack_id
"""


PACK_SHARDS = 8


def assign_packs(
    docs: DataFrame, cap: int = PACK_CAP, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """Shared shard+pack assignment: deterministic hash shard of ``doc_id``,
    exclusive running-token-count cumsum within each shard, ``pack_id`` =
    cumsum div cap. The SINGLE source of pack membership for the stats query
    (``q_pack_documents_sharded``) and the materializing packer
    (``pack_documents_text``) — bit-identical by construction, not by parallel
    maintenance of two copies. Input needs (doc_id, text, ...); output adds
    (shard, n_tok, pack_id) and keeps the rest."""
    from photo_vector_search_spark.functions.text import hash32

    toks = docs.withColumns(
        {
            "shard": hash32(F.col("doc_id").cast("string")) % n_shards,
            "n_tok": token_count(F.col("text")),
        }
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.withColumn(
        "pack_id",
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / cap).cast("long"),
    )


def q_pack_documents_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of sequence packing promised in ``q_pack_documents``'s
    docstring: shard by a deterministic hash, pack WITHIN each shard — the window
    partitions by shard so every shard's cumsum runs in parallel (no
    single-partition global window; ~N/shards rows per task at any scale).
    Output: per-(shard, pack) doc count and token fill."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return assign_packs(docs).groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


_ORACLE_PACK_SHARDED = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {PACK_SHARDS} AS shard,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAP})
              AS BIGINT) AS pack_id
  FROM toks
)
SELECT shard, pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM packed GROUP BY shard, pack_id
"""


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (training-corpus QC): per-event-type min/max/median/p95 via
    EXACT interpolated percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`
    on doubles). The scale variant is ``approx_data_profile`` below — sketches
    don't cross-engine-compare, so the declared oracle stays exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_v"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_v"),
        F.count(F.lit(1)).alias("n"),
    )


_ORACLE_DATA_PROFILE = """
SELECT event_type,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS median_v,
       round(quantile_cont(CAST(value AS DOUBLE), 0.95), 6) AS p95_v,
       count(*) AS n
FROM events GROUP BY event_type
"""


def approx_data_profile(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """KLL-sketch variant of ``q_data_profile`` — the 100 TB path.

    Exact interpolated percentiles buffer every group value; Spark's
    ``approx_percentile`` keeps a bounded sketch per group (error ≤ 1/accuracy
    in RANK, merged map-side), so the shuffle carries sketches, not values.
    Same output shape as the exact query; accuracy bounded against it in
    tests/test_sketches.py (rank error translates to value error only through
    the data's local density, hence the rank-based test)."""
    return events.groupBy("event_type").agg(
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(
            F.expr(f"approx_percentile(value, 0.5, {accuracy})"), 6
        ).alias("median_v"),
        F.round(
            F.expr(f"approx_percentile(value, 0.95, {accuracy})"), 6
        ).alias("p95_v"),
        F.count(F.lit(1)).alias("n"),
    )


PROTO_DIMS = 8  # leading components declared (full vector is the same agg)


def q_label_prototypes(
    spark: SparkSession, sf_dir: str, dims: int | None = PROTO_DIMS
) -> DataFrame:
    """Per-label embedding prototypes (class centroids — the curation primitive
    behind dataset balancing / outlier mining): mean embedding per label,
    computed component-wise via posexplode → groupBy(label, pos) with the
    decimal-exact sum discipline. Declared output = the first PROTO_DIMS
    components per label (arrays stay out of the compare per FIXTURES.md);
    ``dims=None`` aggregates every component — the same agg, used by the
    full-vector-vs-NumPy parity test to prove the truncation is purely a
    compare-surface choice.

    Shuffle: one keyed agg on (label, pos) — rows = N·dim but fully map-side
    combinable, so the exchange carries labels·dim partials per partition."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    if dims is not None:
        comp = comp.filter(F.col("pos") < dims)
    return comp.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            (F.sum(F.col("v").cast("decimal(28,12)")) / F.count(F.lit(1))).cast("double"), 6
        ).alias("mean_v"),
    )


_ORACLE_LABEL_PROTOTYPES = f"""
WITH comp AS (
  SELECT label,
         unnest(range(len(embedding))) AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
)
SELECT label, pos, count(*) AS n,
       round(CAST(sum(CAST(v AS DECIMAL(28,12))) / count(*) AS DOUBLE), 6) AS mean_v
FROM comp WHERE pos < {PROTO_DIMS}
GROUP BY label, pos
"""


HIST_BINS = 20


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (profiling primitive): bin =
    floor((v - lo) / w) clamped to the last bin, bounds from one min/max pass.
    Two scans (bounds + binning) — at scale the bounds come from table stats or
    a sampled pass; binning itself is one map-side-combinable agg."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).first()
    if b["lo"] is None:
        raise ValueError("events_histogram: input has no rows with a value")
    lo, hi = float(b["lo"]), float(b["hi"])
    if hi <= lo:
        # degenerate distribution: w would be 0 and the bin expression NaN/NULL
        # on both engines — fail deterministically instead
        raise ValueError(
            f"events_histogram: degenerate value distribution (min == max == {lo}); "
            "histogram bins are undefined"
        )
    w = (hi - lo) / HIST_BINS
    bin_col = F.least(
        F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("long"),
        F.lit(HIST_BINS - 1),
    )
    return ev.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )


_ORACLE_EVENTS_HISTOGRAM = f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT least(CAST(floor((value - lo) / ((hi - lo) / {HIST_BINS})) AS BIGINT),
               {HIST_BINS - 1}) AS bin,
         value
  FROM events CROSS JOIN bounds
)
SELECT bin, count(*) AS n,
       round(min(value), 6) AS bin_min,
       round(max(value), 6) AS bin_max
FROM binned GROUP BY bin
"""


DRIFT_SOURCES = ("src0", "src1", "src2")


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between training-data sources: pairwise total-variation
    distance between per-source token distributions (TV = ½·Σ|p_a − p_b|).
    TV instead of KL/JS on purpose: no logs — counts, ratios and |diff| are
    bit-deterministic across engines, so the oracle is exact, not approximate.

    Shuffle shape: one explode + one groupBy(term) with conditional partial
    aggs; the per-source totals are a single broadcast row. Per-term |diff|
    terms are decimal-cast before summation (order-free exact sum, the repo's
    standard double-sum discipline)."""
    from photo_vector_search_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("term")).filter(
        F.length("term") > 0
    )
    counts = tok.groupBy("term").agg(
        *[
            F.sum(F.when(F.col("source") == s, 1).otherwise(0)).alias(f"c{i}")
            for i, s in enumerate(DRIFT_SOURCES)
        ]
    )
    # totals are exactly the column sums of the per-term counts (every token
    # lands in some term group) — summing the counts frame avoids a second full
    # tokenize+explode pass over the corpus, bit-identically
    totals = counts.agg(
        *[F.sum(f"c{i}").alias(f"t{i}") for i in range(len(DRIFT_SOURCES))]
    )
    joined = counts.crossJoin(F.broadcast(totals))
    pairs = [(0, 1), (0, 2), (1, 2)]
    aggs = [
        F.round(
            (
                F.sum(
                    F.abs(
                        F.col(f"c{a}") / F.col(f"t{a}") - F.col(f"c{b}") / F.col(f"t{b}")
                    ).cast("decimal(28,18)")
                )
                / 2
            ).cast("double"),
            6,
        ).alias(f"tv_{DRIFT_SOURCES[a]}_{DRIFT_SOURCES[b]}")
        for a, b in pairs
    ]
    return joined.agg(*aggs, F.count(F.lit(1)).alias("n_terms"))


_drift_cols = ",\n       ".join(
    f"round(CAST(sum(CAST(abs(c{a} / CAST(t{a} AS DOUBLE) - c{b} / CAST(t{b} AS DOUBLE))"
    f" AS DECIMAL(28,18))) / 2 AS DOUBLE), 6) AS tv_src{a}_src{b}"
    for a, b in ((0, 1), (0, 2), (1, 2))
)
_ORACLE_SOURCE_DRIFT = f"""
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tok_f AS (SELECT source, term FROM tok WHERE length(term) > 0),
counts AS (
  SELECT term,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS c2
  FROM tok_f GROUP BY term
),
totals AS (
  SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS t0,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS t1,
         sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS t2
  FROM tok_f
)
SELECT {_drift_cols},
       count(*) AS n_terms
FROM counts CROSS JOIN totals
"""


def q_canonicalize_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise canonicalization (applyInPandas — grouped-Python execution
    path) over exact-dedup groups of documents ∪ re-crawl. The oracle recomputes
    the same collapse in pure SQL, cross-checking the pandas path value-for-value."""
    from photo_vector_search_spark.functions.text import quality_score
    from photo_vector_search_spark.operators.canonicalize import canonicalize_groups
    from photo_vector_search_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    recrawl = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", F.lit("recrawl").alias("source")
    )
    all_docs = docs.unionByName(recrawl)
    groups = exact_dedup(all_docs).select("doc_id", F.col("fp").alias("group_id"))
    records = (
        all_docs.join(groups, "doc_id")
        .withColumn("quality", quality_score(F.col("text")))
        .select("doc_id", "group_id", "source", "quality")
    )
    out = canonicalize_groups(records)
    return out.select(
        "group_id",
        "canonical_id",
        "n_members",
        "sources",
        F.round("best_quality", 6).alias("best_quality"),
    )


_ORACLE_CANONICALIZE = r"""
WITH all_docs AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, 'recrawl' AS source
  FROM documents WHERE doc_id < 100
),
recs AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS group_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS t
  FROM all_docs
),
q AS (
  SELECT doc_id, source, group_id,
         len(t) AS n_tok,
         list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE)))
           / greatest(len(t), 1) AS atl,
         len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','it','on','for'], x)))
           * 1.0 / greatest(len(t), 1) AS swr
  FROM recs
),
scored AS (
  SELECT doc_id, source, group_id,
         round(((CASE WHEN n_tok BETWEEN 20 AND 400 THEN 1.0 ELSE 0.5 END)
              + (CASE WHEN swr > 0.01 AND swr < 0.6 THEN 1.0 ELSE 0.5 END)
              + (CASE WHEN atl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END)) / 3.0, 6)
           AS quality
  FROM q
)
SELECT group_id,
       min(doc_id) AS canonical_id,
       count(*) AS n_members,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
       round(max(quality), 6) AS best_quality
FROM scored GROUP BY group_id
"""


def q_srp_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH embedding near-dup — fully distributed (nothing broadcast-sized,
    nothing collected), declared through the engine-portable formulation:
    ±1 md5-parity hyperplanes + exact DECIMAL projection sums, so the DuckDB
    oracle runs the IDENTICAL bucketing and the check is hash-exact (the same
    trick that made MinHash-LSH bit-identical) — recall stays approximate by
    design, but the algorithm itself is now value-verified, not rows-only.
    The numpy-kernel twin (`srp_lsh_near_dup_pairs`) is recall-tested in pytest."""
    from photo_vector_search_spark.operators.dedup import (
        SRP_SQL_PLANES,
        SRP_SQL_TABLES,
        srp_lsh_near_dup_sql,
    )

    # PINNED to the constants `_srp_oracle()` hardcodes: the declared query must
    # bucket identically to the oracle SQL no matter how large the driver
    # regenerates the embeddings fixture (auto-derivation would flip n_planes to
    # 7 past 2048 rows and silently break hash parity), and pinning also drops
    # the per-call count() pre-job from the declared/benched path. Library
    # callers still get size-derived params by default.
    return srp_lsh_near_dup_sql(
        load_table(spark, sf_dir, "embeddings"),
        tau=0.45,
        n_planes=SRP_SQL_PLANES,
        n_tables=SRP_SQL_TABLES,
    )


def _srp_oracle() -> str:
    from photo_vector_search_spark.operators.dedup import (
        SRP_SQL_DIM,
        SRP_SQL_PLANES,
        SRP_SQL_TABLES,
    )

    return f"""
WITH planes AS (
  SELECT t, j, i,
         CASE WHEN CAST(concat('0x', substring(md5(concat_ws('_', t, j, i)), 1, 8))
                   AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS c
  FROM (SELECT unnest(generate_series(0, {SRP_SQL_TABLES - 1})) AS t)
  CROSS JOIN (SELECT unnest(generate_series(0, {SRP_SQL_PLANES - 1})) AS j)
  CROSS JOIN (SELECT unnest(generate_series(0, {SRP_SQL_DIM - 1})) AS i)
),
comp AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS i,
         CAST(unnest(embedding::DOUBLE[]) AS DECIMAL(28,12)) AS xd
  FROM embeddings
),
proj AS (
  SELECT vec_id, t, j, sum(CASE WHEN c = 1 THEN xd ELSE -xd END) AS s
  FROM comp JOIN planes USING (i)
  GROUP BY vec_id, t, j
),
buckets AS (
  SELECT vec_id, t,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)
           AS bkey
  FROM proj GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM buckets l JOIN buckets r
    ON l.t = r.t AND l.bkey = r.bkey AND l.vec_id < r.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS s
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, round(s, 6) AS sim FROM scored WHERE s >= 0.45
"""


SAMPLE_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.25}  # training-mix weights


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixing: per-source
    keep rates applied via md5-bucket thresholds (reproducible under re-runs and
    insertions, unlike seeded random sampling whose draw depends on
    partitioning). Output: per-source kept counts + id checksum."""
    from photo_vector_search_spark.functions.text import hash32

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 1000
    rate = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(r))
            for s, r in sorted(SAMPLE_RATES.items())
        ],
        F.lit(0.0),
    )
    kept = docs.withColumn("_b", bucket).filter(F.col("_b") < rate * 1000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )


_rates_sql = " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items())
)
_ORACLE_STRATIFIED_SAMPLE = f"""
WITH b AS (
  SELECT doc_id, source,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
           AS bucket,
         CASE {_rates_sql} ELSE 0.0 END AS rate
  FROM documents
)
SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM b WHERE bucket < rate * 1000 GROUP BY source
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of the embedding column — the 4× (float32)
    storage cut a 100 TB vector corpus takes at rest. Per-vector scale =
    max|x|/127; q_i = round(x_i / scale). Output keeps arrays out of the compare:
    per-vector scale + quantized checksum + reconstruction error bound."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = max_abs / F.lit(127.0)
    # try_divide: an all-zero vector has scale 0 and must yield NULLs, not a
    # DIVIDE_BY_ZERO abort of the whole job (ANSI mode throws on plain /)
    q = F.transform(x, lambda v: F.round(F.try_divide(v, scale)).cast("int"))
    max_err = F.array_max(
        F.zip_with(x, q, lambda v, qq: F.abs(v - qq.cast("double") * scale))
    )
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, v: a + v).alias("q_sum"),
        F.round(max_err, 6).alias("max_err"),
    )


_ORACLE_EMBEDDING_QUANTIZE = """
WITH q AS (
  SELECT vec_id,
         embedding::DOUBLE[] AS x,
         list_max(list_transform(embedding::DOUBLE[], v -> abs(v))) / 127.0 AS scale
  FROM embeddings
)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_sum(list_transform(x, v -> CAST(round(v / nullif(scale, 0)) AS BIGINT))) AS BIGINT)
         AS q_sum,
       round(list_max(list_transform(x, v -> abs(v - round(v / nullif(scale, 0)) * scale))), 6)
         AS max_err
FROM q
"""


# --- r7 promotions: the fixed-window packer and the token-budget mixer ------

PACK_WIN_CTX = 128  # training context length of the declared packing query
PACK_WIN_VOCAB = 32768  # hashed-token id space (any deterministic id works)
PACK_WIN_EOS = 0  # document separator id


def q_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length sequence packing (`operators/packing.pack_token_windows`) —
    the terminal LLM-pipeline transform: tokenize `documents` (hashed-md5
    token ids, portable to the oracle), concatenate in doc_id order with an
    EOS separator, re-chunk into exact 128-token windows. Output keeps arrays
    out of the compare: per-window position-weighted id checksum (catches any
    reorder within a window) + first/last id + doc count."""
    from photo_vector_search_spark.functions.text import hash32, tokens
    from photo_vector_search_spark.operators.packing import pack_token_windows

    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_remove(tokens(F.col("text")), "")
    ids = F.transform(
        toks, lambda t: (hash32(t) % PACK_WIN_VOCAB).cast("int")
    )
    tokenized = docs.select(F.col("doc_id").alias("pos"), ids.alias("input_ids"))
    packed = pack_token_windows(tokenized, PACK_WIN_CTX, eos_id=PACK_WIN_EOS)
    wsum = F.aggregate(
        F.zip_with(
            F.col("input_ids"),
            F.sequence(F.lit(1), F.size("input_ids")),
            lambda x, i: x.cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return packed.select(
        "seq_id",
        "n_tokens",
        "n_docs",
        wsum.alias("ids_wsum"),
        F.element_at("input_ids", 1).alias("first_id"),
        F.element_at("input_ids", -1).alias("last_id"),
    )


_ORACLE_PACK_WINDOWS = f"""
WITH ids0 AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE list_append(
                list_transform(
                  list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              x -> x <> ''),
                  tok -> CAST(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
                              % {PACK_WIN_VOCAB} AS INTEGER)),
                {PACK_WIN_EOS}) END AS ids
  FROM documents
),
off AS (
  SELECT doc_id, ids, len(ids) AS n,
         COALESCE(CAST(SUM(len(ids)) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) AS o
  FROM ids0 WHERE ids IS NOT NULL
),
pieces AS (
  SELECT o,
         unnest(list_transform(
           generate_series(o // {PACK_WIN_CTX}, (o + n - 1) // {PACK_WIN_CTX}),
           win -> struct_pack(
             seq_id := win,
             chunk := ids[(greatest(win * {PACK_WIN_CTX}, o) - o + 1):
                          (least((win + 1) * {PACK_WIN_CTX}, o + n) - o)])))
         AS p
  FROM off WHERE n > 0
),
flat AS (SELECT o, p.seq_id AS seq_id, p.chunk AS chunk FROM pieces),
wins AS (
  SELECT seq_id, flatten(list(chunk ORDER BY o)) AS ids, count(*) AS n_docs
  FROM flat GROUP BY seq_id
)
SELECT seq_id,
       CAST(len(ids) AS INTEGER) AS n_tokens,
       n_docs,
       CAST(list_sum(list_transform(generate_series(1, len(ids)),
                                    i -> CAST(list_extract(ids, i) AS BIGINT) * i))
            AS BIGINT) AS ids_wsum,
       ids[1] AS first_id,
       ids[len(ids)] AS last_id
FROM wins WHERE len(ids) = {PACK_WIN_CTX}
"""


MIX_WEIGHTS = {"src0": 0.6, "src1": 0.3, "src2": 0.1}  # DoReMi-style domain mix
MIX_BUDGET = 60_000  # target emitted tokens; > sf0.01 corpus => upsampling


def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (`operators/mixing.mix_corpus`): per-source
    emission rates from normalized weights over one token-total pass, epoch
    explode for upsampled sources, md5-uniform partial-epoch membership.
    Output: per (source, epoch) emitted doc count + id checksum + token sum
    (membership-exact: any flipped draw moves a row between groups)."""
    from photo_vector_search_spark.operators.mixing import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_corpus(docs, MIX_WEIGHTS, MIX_BUDGET)
    return mixed.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.sum(
            F.coalesce(token_count(F.col("text")), F.lit(0)).cast("long")
        ).alias("tok_sum"),
    )


def _mix_oracle() -> str:
    # positive-only, same float-sum order as mixture_rates (operators/mixing.py:59)
    # — a zero/negative weight must not inflate the normalizer on either side
    wsum = sum(w for w in MIX_WEIGHTS.values() if w > 0)
    weight_sql = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH tok AS (
  SELECT doc_id, source,
         CASE WHEN text IS NULL THEN 0
              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS nt,
         CASE {weight_sql} ELSE 0.0 END AS w
  FROM documents
),
totals AS (SELECT source, sum(nt) AS n_tokens FROM tok GROUP BY source),
rated AS (
  SELECT t.doc_id, t.source, t.nt,
         (t.w / {wsum!r}) * {MIX_BUDGET} / s.n_tokens AS rate
  FROM tok t JOIN totals s USING (source) WHERE t.w > 0
),
exploded AS (
  SELECT doc_id, source, nt, rate, CAST(floor(rate) AS INT) AS n_full,
         unnest(generate_series(0, CAST(floor(rate) AS BIGINT))) AS epoch
  FROM rated
),
kept AS (
  SELECT * FROM exploded
  WHERE epoch < n_full
     OR (CAST(concat('0x', substring(md5('0-' || epoch || '|' || doc_id), 1, 12))
              AS BIGINT) + 1) / power(16, 12) <= rate - n_full
)
SELECT source, CAST(epoch AS INT) AS epoch,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(nt) AS BIGINT) AS tok_sum
FROM kept GROUP BY source, epoch
"""


DSIR_BUCKETS = 4096  # hashed-feature space of the declared DSIR query


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (`operators/dsir`): hashed unigram+bigram
    features, one-pass conditional bucket counts (target = src0 docs standing
    in for the high-quality seed corpus), add-1-smoothed engine-side
    log-ratios, decimal-exact per-doc score sums. Output: every doc's feature
    count + rounded importance score (featureless docs pass through at 0).
    The gram explode is featurized ONCE (`dsir_featurize` stages it to
    parquet; measured 3.8 s -> 2.7 s at sf0.1) and feeds both the count
    table and the scoring join."""
    from photo_vector_search_spark.operators.dsir import (
        dsir_featurize,
        dsir_log_ratios,
        dsir_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = dsir_featurize(
        docs, F.col("source") == "src0", n_buckets=DSIR_BUCKETS
    )
    ratios = dsir_log_ratios(None, n_buckets=DSIR_BUCKETS, feats=feats)
    return dsir_scores(docs, ratios, n_buckets=DSIR_BUCKETS, feats=feats).select(
        "doc_id", "n_feats", F.round("dsir_score", 6).alias("dsir_score")
    )


_ORACLE_DSIR_WEIGHTS = f"""
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
         CAST(CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT)
              % {DSIR_BUCKETS} AS INTEGER) AS bucket
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
         ln((c_tgt + 1.0) / CAST(n_tgt + {DSIR_BUCKETS} AS DOUBLE))
           - ln((c_raw + 1.0) / CAST(n_raw + {DSIR_BUCKETS} AS DOUBLE)) AS lr
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


SEM_K = 8  # deterministic seed centroids of the declared SemDeDup query
SEM_TAU = 0.45  # the fixture corpus's embedding near-dup threshold


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end (`operators/semdedup`): seed centroids (the
    SEM_K lowest-id vectors — deterministic, oracle-replayable; real runs
    use the sampled k-means train), rounded-cosine argmax assignment with
    centroid-id tie-break, within-cluster τ-pairs on rounded cosine, and the
    paper's upper-triangular greedy drop. Output: per-cluster totals,
    survivor counts and survivor-id checksums (any flipped assignment or
    keep/drop decision moves a row between groups)."""
    from photo_vector_search_spark.operators.semdedup import (
        semdedup_deterministic,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semdedup_deterministic(emb, k=SEM_K, tau=SEM_TAU)
    return out.groupBy(F.col("cluster_id").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("vec_id"))).alias("kept_id_sum"),
    )


_ORACLE_SEMDEDUP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {SEM_K}),
sims AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.v, c.cv), 6) AS s
  FROM e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id AS vb
  FROM assign a
  JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {SEM_TAU}
)
SELECT a.cid AS cluster,
       count(*) AS n_vecs,
       CAST(sum(CASE WHEN d.vb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN d.vb IS NULL THEN a.vec_id END) AS BIGINT)
         AS kept_id_sum
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vb
GROUP BY a.cid
"""


PACK_SEQ_LEN = 128  # token budget of the declared SFT-packing query
PACK_SEQ_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting SFT packing (`operators/packing.pack_sequences`),
    declared r8: deterministic hash shards, NEXT-FIT in doc_id order within
    each shard, docs never split across windows, overflow truncated to the
    budget. Token ids derive from a deterministic surrogate (per-token
    character lengths — both engines replay it exactly); the declared
    output pins every packing DECISION (membership, in-pack order, per-doc
    effective lengths, fills) via CSV-joined doc_ids/seq_lens — scalar
    strings, because the driver's canonicalizer sorts result frames with
    pandas and list-typed columns are unhashable there (the r8 regression).
    The id CONTENT concat is pytest-pinned against an independent packer.
    The oracle replays the sequential next-fit with a recursive CTE."""
    from photo_vector_search_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select(
        "doc_id",
        F.transform(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: F.length(t),
        )
        .cast("array<int>")
        .alias("input_ids"),
    )
    packed = pack_sequences(
        ids,
        PACK_SEQ_LEN,
        order_col="doc_id",
        eos_id=0,
        n_shards=PACK_SEQ_SHARDS,
    )
    return packed.select(
        "shard",
        "pack_id",
        "n_docs",
        "n_tokens",
        F.concat_ws(",", F.col("doc_ids").cast("array<string>")).alias(
            "doc_ids_csv"
        ),
        F.concat_ws(",", F.col("seq_lens").cast("array<string>")).alias(
            "seq_lens_csv"
        ),
    )


_ORACLE_PACK_SEQUENCES = f"""
WITH RECURSIVE lens AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {PACK_SEQ_SHARDS} AS INT) AS shard,
         least(len(regexp_split_to_array(lower(trim(text)), '\\s+')) + 1,
               {PACK_SEQ_LEN}) AS e
  FROM documents WHERE text IS NOT NULL
),
ordered AS (
  SELECT shard, doc_id, e,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM lens
),
fit AS (
  SELECT shard, rn, doc_id, e, CAST(0 AS BIGINT) AS pack_id, e AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.e,
         CASE WHEN f.fill + o.e > {PACK_SEQ_LEN} THEN f.pack_id + 1
              ELSE f.pack_id END,
         CASE WHEN f.fill + o.e > {PACK_SEQ_LEN} THEN o.e
              ELSE f.fill + o.e END
  FROM ordered o JOIN fit f ON o.shard = f.shard AND o.rn = f.rn + 1
)
SELECT shard, pack_id,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(e) AS INT) AS n_tokens,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS doc_ids_csv,
       string_agg(CAST(CAST(e AS INT) AS VARCHAR), ',' ORDER BY rn)
         AS seq_lens_csv
FROM fit GROUP BY shard, pack_id
"""


HN_K = 5  # negatives per anchor in the declared hard-negative query
HN_CENTROIDS = 8  # deterministic seed centroids (the semdedup SEM_K pattern)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (`operators/contrastive`), declared
    r8 through the deterministic rung: seed centroids = lowest-id vectors,
    rounded-cosine argmax assignment with centroid-id tie-break, per-cluster
    different-label top-k on rounded sims, (sim desc, id asc) tie-break —
    the full DuckDB window replay of the production IVF-blocked kernel
    (which test_contrastive pins against brute-force NumPy). Output: every
    (anchor, negative) pair with both labels, similarity and rank."""
    from photo_vector_search_spark.operators.contrastive import (
        hard_negatives_deterministic,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives_deterministic(emb, k=HN_K, n_centroids=HN_CENTROIDS)


_ORACLE_HARD_NEGATIVES = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE label IS NOT NULL
),
cent AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {HN_CENTROIDS}),
sims AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.v, c.cv), 6) AS s
  FROM e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
         ea.label AS label, eb.label AS neg_label,
         round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE ea.label <> eb.label
)
SELECT anchor_id, neg_id, label, neg_label, sim, CAST(rank AS INT) AS rank
FROM (
  SELECT p.*,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY sim DESC, neg_id) AS rank
  FROM pairs p
) WHERE rank <= {HN_K}
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 crawl hygiene, declared r7b — per-domain document cap
    (`operators/domains.cap_per_domain`, the C4/RefinedWeb host-share bound)
    through the DEFAULT salted two-phase path, so the declared row verifies
    the scale shape (salted partial cap -> final cap), not just the textbook
    single window the oracle states."""
    from photo_vector_search_spark.operators.domains import cap_per_domain

    return cap_per_domain(load_table(spark, sf_dir, "documents"), 15)


_ORACLE_DOMAIN_CAP = """
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 15
"""

_CURRICULUM_CUTS = [150.0, 250.0, 400.0]
_CURRICULUM_SEED = 5


def q_curriculum_order(spark, sf_dir: str) -> DataFrame:
    """§2.10 training-order export, curriculum rung (declared r10, promoted
    from pytest-only — the full-order DuckDB window twin already existed in
    tests/test_shuffle.py): walk difficulty tiers over ``n_chars`` at fixed
    cuts, seeded md5 shuffle within each tier, positions dense 0..N-1 and
    deterministic under any partitioning (the fixed-prefix-bucket machinery
    of ``shuffle_corpus`` with the tier prepended — ONE data exchange, a
    ≤ n_tiers·4096-row offset collect, no global window)."""
    from photo_vector_search_spark.operators.shuffle import curriculum_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return curriculum_order(
        docs, "n_chars", seed=_CURRICULUM_SEED, cuts=_CURRICULUM_CUTS
    ).df.select("doc_id", "pos")


def _curriculum_oracle() -> str:
    """Full-order twin: one global window ordered by (tier, md5, key) — the
    semantics the distributed bucket/offset machinery must reproduce. NULL
    scores sit in a strictly-final extra tier (none in the fixture, but the
    twin states the whole contract)."""
    tier = " + ".join(
        f"(CASE WHEN n_chars > {c} THEN 1 ELSE 0 END)"
        for c in _CURRICULUM_CUTS
    )
    return f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY (CASE WHEN n_chars IS NULL THEN {len(_CURRICULUM_CUTS) + 1}
                        ELSE {tier} END),
                  md5(concat('{_CURRICULUM_SEED}', '-',
                             CAST(doc_id AS VARCHAR))),
                  doc_id
       ) - 1 AS pos
FROM documents
"""


BUDGET_SELECT_TOKENS = 12_000  # mid-corpus crossing at sf0.01 (~27k tokens)


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection (`operators/selection.budget_select`): keep the
    highest-n_chars documents whose cumulative whitespace-token count fits a
    12k budget — the 'take the best N tokens' cut every curation pipeline
    ends with (DSIR §5 / FineWeb budget releases). Declared through the
    bucketed two-sketch-pass + boundary-window form (ONE exchange carrying
    ~N/256 rows); the oracle replays the total order as the textbook global
    window cumsum DuckDB can afford at sf0.01."""
    from photo_vector_search_spark.operators.selection import budget_select

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "score", F.col("n_chars").cast("double")
    )
    kept = budget_select(docs, BUDGET_SELECT_TOKENS, score_col="score")
    return kept.select("doc_id", "lang", "source", "n_chars")


_ORACLE_BUDGET_SELECT = f"""
WITH d AS (
  SELECT doc_id, lang, source, n_chars,
         CAST(n_chars AS DOUBLE) AS score,
         coalesce(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 0) AS tok
  FROM documents
),
c AS (
  SELECT *, sum(tok) OVER (ORDER BY score DESC NULLS LAST, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, lang, source, n_chars FROM c WHERE cum <= {BUDGET_SELECT_TOKENS}
"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe group-aware split (`operators/splits.leakage_safe_split`):
    MinHash-LSH near-dup pairs closed into connected components, the md5
    split draw taken on the GROUP id so no near-dup pair straddles
    eval/train. Output: every doc's (doc_id, group_id, split) — membership
    exact (any flipped draw or mis-closed component moves a row)."""
    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
    from photo_vector_search_spark.operators.splits import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, n=3, tau=0.5).select("doc_a", "doc_b")
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "group_id", "split")


def _leakage_split_oracle() -> str:
    """DuckDB twin of the WHOLE chain: the dedup_minhash_lsh oracle's pair
    CTEs (same md5-prefix hashing + shared permutation constants), the
    recursive-CTE component closure (tests/test_graph.py's independent
    fixpoint formulation vs Spark's alternating star joins), and the
    md5_uniform draw cut at the cumulative boundaries (the mix/shuffle
    oracle rule)."""
    from photo_vector_search_spark.operators.dedup import (
        MINHASH_P,
        minhash_perms,
    )

    from .text_queries import _SQL_SHINGLES, _SQL_TOKS

    perm_values = ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_perms())
    draw = (
        "(CAST(concat('0x', substring(md5('0-' || CAST(group_id AS VARCHAR)), "
        "1, 12)) AS BIGINT) + 1) / power(16, 12)"
    )
    return f"""
WITH RECURSIVE toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SHINGLES}),
hashed AS (
  SELECT doc_id, shingle,
         CAST(concat('0x', substring(md5(shingle), 1, 8)) AS BIGINT) AS h
  FROM sh
),
perms(i, a, b) AS (VALUES {perm_values}),
sig AS (
  SELECT doc_id, i, min((a * h + b) % {MINHASH_P}) AS mh
  FROM hashed CROSS JOIN perms GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // 2 AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY i ASC), ',')) AS band_key
  FROM sig GROUP BY doc_id, CAST(i // 2 AS INT)
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.n
),
comp AS (SELECT n AS doc_id, min(r) AS group_id FROM reach GROUP BY n),
assigned AS (
  SELECT d.doc_id, coalesce(c.group_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, group_id,
       CASE WHEN {draw} <= 0.8 THEN 'train'
            WHEN {draw} <= 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM assigned
"""


_SW_N = 5
_SW_SEED = 0


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (`operators/sampling.sample_weighted`,
    Efraimidis & Spirakis A-ES): exactly 5 docs per language, probability
    ∝ n_chars, without replacement, over the deterministic md5_uniform
    draw — so DuckDB replays the draw and the ln(u)/w reservoir keys
    exactly. ONE keyed window exchange; the sample never depends on
    partitioning."""
    from photo_vector_search_spark.operators.sampling import sample_weighted

    docs = load_table(spark, sf_dir, "documents")
    return sample_weighted(
        docs, _SW_N, weight_col="n_chars", by="lang", seed=_SW_SEED
    ).select("doc_id", "lang", "n_chars", "sample_rank")


_ORACLE_SAMPLE_WEIGHTED = f"""
WITH keys AS (
  SELECT doc_id, lang, n_chars,
         ln((CAST(concat('0x', substring(md5('{_SW_SEED}-' ||
                 CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
            / power(16, 12)) / CAST(n_chars AS DOUBLE) AS aes
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY aes DESC, doc_id ASC
         ) AS sample_rank
  FROM keys
)
SELECT doc_id, lang, n_chars, sample_rank
FROM ranked WHERE sample_rank <= {_SW_N}
"""


QUERIES = {
    "budget_select": q_budget_select,
    "sample_weighted": q_sample_weighted,
    "leakage_safe_split": q_leakage_safe_split,
    "curriculum_order": q_curriculum_order,
    "domain_cap": q_domain_cap,
    "pack_documents_sharded": q_pack_documents_sharded,
    "hard_negatives": q_hard_negatives,
    "srp_lsh_near_dup": q_srp_lsh_near_dup,
    "source_drift": q_source_drift,
    "pack_sequences": q_pack_sequences,
    "mix_corpus": q_mix_corpus,
    "dsir_weights": q_dsir_weights,
    "semdedup": q_semdedup,
}

ORACLES = {
    "budget_select": _ORACLE_BUDGET_SELECT,
    "sample_weighted": _ORACLE_SAMPLE_WEIGHTED,
    "curriculum_order": _curriculum_oracle(),
    "domain_cap": _ORACLE_DOMAIN_CAP,
    "pack_documents_sharded": _ORACLE_PACK_SHARDED,
    "hard_negatives": _ORACLE_HARD_NEGATIVES,
    "srp_lsh_near_dup": _srp_oracle(),
    "leakage_safe_split": _leakage_split_oracle(),
    "source_drift": _ORACLE_SOURCE_DRIFT,
    "pack_sequences": _ORACLE_PACK_SEQUENCES,
    "mix_corpus": _mix_oracle(),
    "dsir_weights": _ORACLE_DSIR_WEIGHTS,
    "semdedup": _ORACLE_SEMDEDUP,
}

# Retired from the 50-slot declared surface (driver checks exactly 50 entries;
# see text_queries.RETIRED_QUERIES). All remain implemented + locally
# oracle-verified (tests/test_retired_surface.py):
# - pack_documents: the global-window form is strictly subsumed by
#   pack_documents_sharded (the declared, 100 TB-shaped variant);
# - train_test_split: the md5-bucket split is the single-stratum degenerate
#   case of stratified_sample (same hash32-threshold mechanism);
# - set_ops (retired r7 for pack_windows): INTERSECT/EXCEPT engine
#   scaffolding with no SURVEY §2 row of its own — distinct/anti-join
#   semantics stay exercised by dedup_exact/decontaminate/delete_ops;
# - events_histogram (retired r7 for mix_corpus): width_bucket profiling
#   rung, no §2 row — min/max + binned groupBy aggregation stays exercised
#   by events_resample/rollup_events/data_profile;
# - stratified_sample (retired r7 for dsir_weights): the doc-count sampling
#   rung — mix_corpus (declared) is the token-budget superset of the same
#   md5-threshold family, and train_test_split (already retired) its
#   degenerate case;
# - distinct_counts (retired r7 for semdedup): §2.4 A2 cardinality — still
#   locally oracle-verified; data_profile keeps exact profiling declared and
#   the HLL sketch variant stays twin-tested in test_sketches.
# - rollup_events (retired r7b for domain_cap): grouping-set agg over events —
#   cube_lineitem keeps the regroup_from_finest machinery declared (the
#   harder 8-set case) and events_resample keeps time-bucketed event aggs.
# - embedding_quantize (retired r8 for pack_sequences): int8 scale-quantize
#   map — a pure per-row arithmetic transform; the vector-function family
#   stays declared via every knn/cosine oracle and the operator remains
#   locally oracle-verified + pytest-covered (round-trip error bounds).
# - canonicalize_dups (retired r8 for hard_negatives): keep-lowest-id group
#   canonicalization — its distinct/applyInPandas machinery stays declared
#   via dedup_exact + photo_group_collect, and the operator itself remains
#   both locally oracle-verified and exercised inside curate_corpus.
#
# Deliberately pytest-only (no declared row, r9 decision):
# - fim_transform: the layout draw consumes a VARIABLE number of md5-PRNG
#   uniforms per row (apply?→layout?→split points), so a SQL twin would
#   have to replay the exact draw SEQUENCE — unlike mix/shuffle, whose
#   single-draw-per-row md5 rule IS the oracle-able trick. The transform's
#   contract is losslessness, which SQL can't strengthen: the
#   reconstruct∘transform=id inverse is pinned per row in pytest alongside
#   rate/layout-mix/partitioning-invariance checks (test_fim.py).
# - corrupt_spans: same variable-draw PRNG shape; its round-trip inverse
#   (reconstruct_spans over exported pairs) is the pinned contract.
# - encode_unigram_sampled / FFD packing / batched-ADC / PQ-family rungs:
#   approximate or stochastic by construction — each is twin-pinned in
#   pytest against an independent reference (analytic sampler posterior,
#   serial packer, per-row ADC) rather than a DuckDB value hash; declared
#   siblings (encode_bpe, pack_sequences, knn/ivf oracles) keep the
#   deterministic machinery in the checked window.
# - data_profile (retired r11 for leakage_safe_split): exact one-row numeric
#   profiling (min/max/avg/exact percentiles over events) — the percentile
#   machinery stays declared via mad_outlier_gate's grouped sketches and
#   budget_select's percentile cuts, the KLL sketch variant stays twin-tested
#   in test_sketches, and the pair remains locally DuckDB-verified here.
RETIRED_QUERIES = {
    # label_prototypes (retired r11 for pool_embeddings): per-label mean
    # embedding — pool_embeddings(by=label) is the strict superset (same
    # grouped component means, plus renorm / weights / max and the
    # chunk→doc composition) and carries its own DuckDB oracle; the
    # decimal-exact posexplode formulation stays verified here
    "label_prototypes": q_label_prototypes,
    # pack_windows (retired r11 for sample_weighted): fixed-length window
    # re-chunking — the packing family keeps TWO declared rows
    # (pack_sequences: boundary-respecting SFT packer; pack_documents_sharded:
    # FFD) and the window form stays locally DuckDB-verified here plus
    # serial-packer-twinned in tests/test_packing.py
    "pack_windows": q_pack_windows,
    "data_profile": q_data_profile,
    "rollup_events": q_rollup_events,
    "distinct_counts": q_distinct_counts,
    "train_test_split": q_train_test_split,
    "pack_documents": q_pack_documents,
    "set_ops": q_set_ops,
    "events_histogram": q_events_histogram,
    "stratified_sample": q_stratified_sample,
    "canonicalize_dups": q_canonicalize_dups,
    "embedding_quantize": q_embedding_quantize,
}

RETIRED_ORACLES = {
    "label_prototypes": _ORACLE_LABEL_PROTOTYPES,
    "pack_windows": _ORACLE_PACK_WINDOWS,
    "data_profile": _ORACLE_DATA_PROFILE,
    "rollup_events": _ORACLE_ROLLUP_EVENTS,
    "distinct_counts": _ORACLE_DISTINCT_COUNTS,
    "train_test_split": _ORACLE_TRAIN_TEST_SPLIT,
    "pack_documents": _ORACLE_PACK_DOCUMENTS,
    "set_ops": _ORACLE_SET_OPS,
    "events_histogram": _ORACLE_EVENTS_HISTOGRAM,
    "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
    "canonicalize_dups": _ORACLE_CANONICALIZE,
    "embedding_quantize": _ORACLE_EMBEDDING_QUANTIZE,
}


def pack_documents_text(
    docs: DataFrame,
    cap: int = PACK_CAP,
    n_shards: int = PACK_SHARDS,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialized sequence packing — the training ARTIFACT the stats-only
    packers (`q_pack_documents*`) audit: each (shard, pack) becomes one row
    with its member documents' texts concatenated in doc_id order.

    Pack membership comes from the SHARED ``assign_packs`` helper (the same
    code path ``q_pack_documents_sharded`` groups — identical by
    construction, not by keeping two copies in sync), then ONE extra
    per-(shard, pack) groupBy assembling
    ``array_join(sort_array(collect_list(struct(doc_id, text))))`` — the
    per-group sort is bounded by docs-per-pack (cap/avg-doc-tokens), never
    global. Feed the result to ``sources/jsonl.write_jsonl_shards`` for the
    packed-corpus export. DuckDB twin in tests/test_pack_text.py
    (``string_agg(text, sep ORDER BY doc_id)``) verifies values, not just
    counts."""
    packed = assign_packs(docs.select("doc_id", "text"), cap=cap, n_shards=n_shards)
    return packed.groupBy("shard", "pack_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda x: x["text"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
