"""DSIR-style data selection with importance resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw-pool document by how much more likely its
hashed n-gram features are under a TARGET distribution (a small high-quality
seed corpus) than under the RAW pool's own distribution, then keep a sample
weighted toward high scores — the importance-resampling step that turns "we
have 100 TB of crawl" into "train on the slice that looks like the target".

Spark-first shape:

1. **Hashed features.** Unigrams + word bigrams (the paper's feature map),
   hashed into ``n_buckets`` via the engine-portable md5-prefix hash — no
   vocabulary state, any corpus size, identical buckets on any engine.
2. **Bucket log-ratios.** One map-side-combinable groupBy(bucket) pass per
   corpus (a single conditional-agg pass when the target is a predicate over
   the pool) → ≤``n_buckets`` rows collected to the driver (the same bounded
   small-side discipline as the shuffle's ≤4096 offsets; guarded), add-1
   smoothed, and re-emitted as a broadcast (bucket, lr) table with
   ``lr = ln p_target(bucket) − ln p_raw(bucket)`` computed IN SPARK so the
   DuckDB oracle twin replays the identical expression.
3. **Scoring.** Map-side broadcast join features→lr, one groupBy(doc) with a
   DECIMAL-cast sum (order-free exact summation — float sums depend on
   partition order and would leak into the rounded output). Docs with no
   features (NULL/empty text) score 0 and pass through.
4. **Selection.** Gumbel top-k: ``score/temperature − ln(−ln(u))`` with the
   partitioning-invariant ``md5_uniform`` draw — the standard reduction of
   sampling-without-replacement ∝ exp(score/T) to a deterministic top-k,
   which Spark executes as TakeOrderedAndProject (per-partition top-k +
   driver merge of k·partitions rows, no global sort shuffle).

Scale: nothing driver-sized except the ≤``n_buckets`` count rows and the
k-row selection result; the only corpus shuffles are the bucket agg (combines
map-side to ≤n_buckets partials per task) and the per-doc score agg.

Reference scope note: the reference (photo_vector_search) has no corpus
surface; this extends the mandated LLM-pipeline curation family (Gopher
gates = rule rung, quality classifier = learned rung, this = the
importance-resampling rung those two feed).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import (
    hash32,
    md5_uniform,
    tokens,
    word_ngrams,
)

N_BUCKETS = 4096
_MAX_BUCKETS = 65536  # driver-collect guard: the count table must stay tiny


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per unigram/bigram OCCURRENCE: (id, [extra...], bucket).
    Tokenization is the corpus-wide ``tokens()`` canonicalization with empty
    strings removed; bigrams are space-joined consecutive token pairs
    (``word_ngrams(·, 2)``). NULL/empty text yields no rows (the scorer
    restores those docs with score 0)."""
    toks = F.array_remove(tokens(F.col(text_col)), "")
    grams = F.concat(toks, word_ngrams(toks, 2))
    return docs.select(
        id_col, *extra_cols, F.explode(grams).alias("_g")
    ).select(
        id_col,
        *extra_cols,
        (hash32(F.col("_g")) % n_buckets).cast("int").alias("bucket"),
    )


def dsir_featurize(
    docs: DataFrame,
    target_filter: Column,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    staging_dir: str | None = None,
) -> DataFrame:
    """The STAGED (id, _tgt, bucket) feature frame shared by ratio
    estimation and scoring — built once, written to parquet
    (``operators.staging``), both consumers read the staged scan. Without
    this, ``dsir_log_ratios`` + ``dsir_scores`` each re-derive the gram
    explode (the corpus-sized work) from ``docs`` — two executions of the
    pipeline's dominant pass (the multi-consumer fan-out trap; the staged
    frame is hash-valued and compact, the shape staging measurably wins
    on). Pass the result as ``feats=`` to both calls."""
    from photo_vector_search_spark.operators.staging import stage_frame

    feats = hashed_ngram_features(
        docs.select(
            F.col(id_col),
            F.col(text_col),
            # NULL-safe: a NULL predicate (e.g. source == 'src0' with NULL
            # source) must mean "not target", exactly like the oracle's
            # CASE ... ELSE 0 — an un-coalesced NULL would make F.sum skip
            # the row and poison the collected counts with None
            F.coalesce(target_filter, F.lit(False)).alias("_tgt"),
        ),
        n_buckets,
        text_col,
        id_col,
        extra_cols=("_tgt",),
    )
    return stage_frame(feats, "pvs_dsir", staging_dir)


def dsir_log_ratios(
    docs: DataFrame | None,
    target_filter: Column | None = None,
    target_docs: DataFrame | None = None,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """The broadcastable (bucket, lr) importance table.

    Exactly one of ``target_filter`` (a boolean Column over ``docs`` — target
    is a slice of the pool, ONE corpus pass with conditional aggregation) or
    ``target_docs`` (a separate seed corpus — one pass over each) selects the
    target distribution. Add-1 smoothing on both sides keeps every bucket
    finite; totals are exact ints computed from the collected count table
    (≤``n_buckets`` rows — raises if ``n_buckets`` exceeds the driver guard).
    The log expression itself is evaluated by Spark on the re-emitted count
    table, so an oracle can replay it verbatim.

    ``feats`` (a ``dsir_featurize`` result) replaces the target_filter-mode
    derivation with a read of the already-staged frame — pass the SAME frame
    to ``dsir_scores`` so the corpus-sized gram explode executes exactly
    once across the two calls (``dsir_pipeline`` does this)."""
    if feats is not None:
        if target_filter is not None or target_docs is not None:
            raise ValueError(
                "dsir_log_ratios: feats already embeds the target flag — "
                "combining it with target_filter/target_docs would silently "
                "ignore them; pass one or the other"
            )
    elif (target_filter is None) == (target_docs is None):
        raise ValueError(
            "dsir_log_ratios: pass exactly one of target_filter / target_docs"
        )
    if not 0 < n_buckets <= _MAX_BUCKETS:
        raise ValueError(
            f"n_buckets must be in (0, {_MAX_BUCKETS}], got {n_buckets} — the "
            "count table is collected to the driver"
        )
    spark = (docs if docs is not None else feats).sparkSession
    if feats is not None or target_filter is not None:
        if feats is None:
            feats = hashed_ngram_features(
                docs.select(
                    F.col(id_col),
                    F.col(text_col),
                    F.coalesce(target_filter, F.lit(False)).alias("_tgt"),
                ),
                n_buckets,
                text_col,
                id_col,
                extra_cols=("_tgt",),
            )
        counts = {
            r["bucket"]: (r["c_raw"], r["c_tgt"])
            for r in feats.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("c_raw"),
                F.sum(F.col("_tgt").cast("int")).alias("c_tgt"),
            )
            .collect()
        }
    else:
        raw = {
            r["bucket"]: r["c"]
            for r in hashed_ngram_features(docs, n_buckets, text_col, id_col)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        tgt = {
            r["bucket"]: r["c"]
            for r in hashed_ngram_features(
                target_docs, n_buckets, text_col, id_col
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        counts = {
            b: (raw.get(b, 0), tgt.get(b, 0)) for b in set(raw) | set(tgt)
        }
    n_raw = sum(c for c, _ in counts.values())
    n_tgt = sum(t for _, t in counts.values())
    if n_tgt == 0:
        raise ValueError("dsir_log_ratios: target corpus has no features")
    if n_raw == 0:
        raise ValueError("dsir_log_ratios: raw corpus has no features")
    rows = [
        (b, int(c_raw), int(c_tgt)) for b, (c_raw, c_tgt) in sorted(counts.items())
    ]
    cdf = spark.createDataFrame(rows, "bucket int, c_raw long, c_tgt long")
    # ln((c_t+1)/(N_t+B)) − ln((c_r+1)/(N_r+B)), evaluated by the ENGINE so
    # the oracle twin replays the exact same expression on the same ints
    lr = F.log(
        (F.col("c_tgt") + F.lit(1.0)) / F.lit(float(n_tgt + n_buckets))
    ) - F.log((F.col("c_raw") + F.lit(1.0)) / F.lit(float(n_raw + n_buckets)))
    return cdf.select("bucket", lr.alias("lr"))


def dsir_scores(
    docs: DataFrame,
    ratios: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "dsir_score",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Per-doc importance score = Σ over the doc's feature occurrences of the
    bucket's log-ratio. All input columns pass through; featureless docs
    (NULL/empty text) get score 0.0 and ``n_feats`` 0. The per-doc sum is
    DECIMAL-accumulated (order-free exact — a double sum would vary in its
    low bits with partition order, which a rounded-output oracle would see).

    Plan: map-only explode+hash → broadcast join on the ≤``n_buckets`` ratio
    table → one groupBy(id) shuffle → broadcast join back onto ``docs``.
    Pass ``feats`` (the ``dsir_featurize`` frame already fed to
    ``dsir_log_ratios``) to read the staged gram explode instead of
    re-deriving it — extra columns like its ``_tgt`` flag are ignored."""
    if feats is None:
        feats = hashed_ngram_features(docs, n_buckets, text_col, id_col)
    feats = feats.select(id_col, "bucket")
    per_doc = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("lr").cast("decimal(28,18)")).alias("_s"),
            F.count(F.lit(1)).alias("_nf"),
        )
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            score_col,
            F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
        )
        .withColumn("n_feats", F.coalesce(F.col("_nf"), F.lit(0).cast("long")))
        .drop("_s", "_nf")
    )


def dsir_select(
    scored: DataFrame,
    n_keep: int,
    temperature: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
    score_col: str = "dsir_score",
) -> DataFrame:
    """Gumbel top-k selection: keep the ``n_keep`` docs maximizing
    ``score/temperature + Gumbel(0,1)`` — equivalent to sampling ``n_keep``
    docs WITHOUT replacement with probability ∝ exp(score/temperature)
    (Gumbel-max). The noise is ``−ln(−ln(u))`` with the deterministic,
    partitioning-invariant ``md5_uniform(seed, id)`` draw. u ∈ (0,1] by
    construction; the u=1 corner (probability 16⁻¹², where −ln(u)=0 and the
    outer ln would hit 0) is clamped by a +1e-300 epsilon to a large finite
    draw, and exact key ties are broken by id. ``temperature → 0``
    approaches deterministic top-k by score; large T approaches uniform.
    Executes as TakeOrderedAndProject: no global sort shuffle."""
    if n_keep <= 0:
        raise ValueError(f"n_keep must be positive, got {n_keep}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    u = md5_uniform(seed, F.col(id_col))
    gumbel = -F.log(-F.log(u) + F.lit(1e-300))  # u=1 → finite, id tie-break
    key = F.col(score_col) / F.lit(float(temperature)) + gumbel
    return (
        scored.withColumn("_gk", key)
        .orderBy(F.col("_gk").desc(), F.col(id_col))
        .limit(n_keep)
        .drop("_gk")
    )


def dsir_pipeline(
    docs: DataFrame,
    n_keep: int,
    target_filter: Column | None = None,
    target_docs: DataFrame | None = None,
    n_buckets: int = N_BUCKETS,
    temperature: float = 1.0,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ratios → scores → Gumbel top-k in one call (the paper's end-to-end
    selection)."""
    if target_filter is not None and target_docs is None:
        # featurize ONCE: the staged gram frame feeds both the count table
        # and the scoring join (otherwise the corpus-sized explode runs twice)
        feats = dsir_featurize(docs, target_filter, n_buckets, text_col, id_col)
        ratios = dsir_log_ratios(None, n_buckets=n_buckets, feats=feats)
        scored = dsir_scores(docs, ratios, n_buckets, text_col, id_col, feats=feats)
    else:
        ratios = dsir_log_ratios(
            docs, target_filter, target_docs, n_buckets, text_col, id_col
        )
        scored = dsir_scores(docs, ratios, n_buckets, text_col, id_col)
    return dsir_select(scored, n_keep, temperature, seed, id_col)


def _py_log_ratio(c_raw: int, c_tgt: int, n_raw: int, n_tgt: int, b: int) -> float:
    """Driver-side twin of the engine lr expression (tests)."""
    return math.log((c_tgt + 1.0) / float(n_tgt + b)) - math.log(
        (c_raw + 1.0) / float(n_raw + b)
    )
