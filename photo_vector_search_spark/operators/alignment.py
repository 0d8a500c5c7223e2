"""Image-text alignment scoring + filtering — the CLIP-score curation gate
(Schuhmann et al. 2021, LAION-400M §3.2: keep an (image, caption) pair only
when the cosine similarity of its CLIP image and text embeddings clears a
threshold; 0.3 for ViT-B/32 in the paper). The large-scale web-pair
pipelines (LAION, DataComp) all start here: alignment filtering removes
mismatched alt-text before any other curation stage sees the pair.

Reference parity: the reference embeds photos and text queries into ONE
CLIP space and ranks by cosine (photo_vector_search.py:27-40, 156-193) but
never *filters pairs* by cross-modal agreement — this operator is part of
the mandated LLM-pipeline extension, reusing the same pluggable
``Embedder`` surfaces (`pipelines/embed.py`) the photo pipeline runs on,
so a real CLIP adapter drops in for both modalities unchanged.

Scale design (100 TB of pairs):
- Map-only, ZERO shuffle: both embedders are iterator Pandas UDFs whose
  model handle loads once per Python worker, and the cosine is the JVM
  ``cosine_similarity`` expression over the two produced array columns —
  one pass over the pair table, filter included.
- Binary image payloads never shuffle (nothing here groups or joins); the
  threshold filter lands before any downstream exchange, so unaligned
  pairs (the majority, in web crawls) are dropped at scan-adjacent cost.
- Degenerate (zero-norm) embeddings score NULL via ``try_divide`` and are
  dropped by the filter — a broken decode must not pass the gate by
  accident. A NULL embedding from either embedder likewise scores NULL
  (what an embedder does with a NULL *input* is its own contract: the
  stub maps None to the empty string, a real adapter may return None).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.vector import cosine_similarity
from photo_vector_search_spark.pipelines.embed import Embedder

#: LAION-400M's published CLIP ViT-B/32 threshold (paper §3.2).
DEFAULT_ALIGN_THRESHOLD = 0.3


def image_text_alignment(
    pairs: DataFrame,
    image_embedder: Embedder,
    text_embedder: Embedder,
    image_col: str = "content",
    text_col: str = "caption",
    out_col: str = "align_score",
) -> DataFrame:
    """Append ``out_col`` = cosine(image embedding, caption embedding) to
    every pair row — the CLIP-score. Rounded to 6dp (the repo's float
    discipline); NULL when either embedding is NULL or zero-norm.

    Both embeddings are plan-internal columns: they are computed, consumed
    by the cosine, and dropped — the output schema is the input plus
    ``out_col``, so a 100 TB pair table doesn't carry 2 transient vector
    columns into downstream stages."""
    img_emb = image_embedder.udf()(F.col(image_col))
    txt_emb = text_embedder.udf()(F.col(text_col))
    score = F.round(
        cosine_similarity(
            img_emb.cast("array<double>"), txt_emb.cast("array<double>")
        ),
        6,
    )
    return pairs.withColumn(out_col, score)


def filter_aligned(
    pairs: DataFrame,
    image_embedder: Embedder,
    text_embedder: Embedder,
    threshold: float = DEFAULT_ALIGN_THRESHOLD,
    image_col: str = "content",
    text_col: str = "caption",
    out_col: str = "align_score",
    keep_score: bool = True,
) -> DataFrame:
    """The LAION gate: keep pairs whose alignment score clears
    ``threshold`` (strictly NULL-dropping — a pair that cannot be scored
    cannot pass). ``keep_score=False`` drops the score column for
    pipelines that only want the surviving pairs."""
    scored = image_text_alignment(
        pairs,
        image_embedder,
        text_embedder,
        image_col=image_col,
        text_col=text_col,
        out_col=out_col,
    ).filter(F.col(out_col) >= F.lit(float(threshold)))
    return scored if keep_score else scored.drop(out_col)


def alignment_stats(
    scored: DataFrame,
    out_col: str = "align_score",
    threshold: float = DEFAULT_ALIGN_THRESHOLD,
) -> DataFrame:
    """One-row corpus summary of an alignment-scored pair table: pair
    count, scoreable count, kept-at-threshold count, mean/min/max score —
    the monitoring row a crawl-curation run logs per shard. One map-side
    combinable JVM aggregation (the ``tokenizer_stats`` shape)."""
    s = F.col(out_col)
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(s).alias("n_scored"),
        # coalesce: a shard with ZERO scoreable pairs must report n_kept=0,
        # not NULL — sum over all-NULL input is NULL (review finding), and
        # downstream per-shard rollups would drop or propagate it
        F.coalesce(
            F.sum((s >= F.lit(float(threshold))).cast("long")), F.lit(0)
        ).alias("n_kept"),
        F.round(F.avg(s), 6).alias("mean_score"),
        F.round(F.min(s), 6).alias("min_score"),
        F.round(F.max(s), 6).alias("max_score"),
    )
