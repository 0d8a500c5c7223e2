"""Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995; the
interpolated form and the n1/(n1+2·n2) discount estimate from Chen &
Goodman 1998 §3) — the principled upgrade of the add-k bigram perplexity
filter (`plans/text_queries.train_bigram_lm`). CCNet (Wenzek et al. 2020)
scores corpora with a KenLM whose smoothing IS modified Kneser-Ney; this
module is the engine-native, dependency-free analogue at bigram order,
behind the same (doc_id, n_bigrams, nll) scoring contract so either LM
slots into the perplexity-filter pipeline.

The model:

    P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1,·)/c1) · Pc(w2)   seen w1
    P(w2|w1) = Pc(w2)                                           unseen w1
    Pc(w2)   = (N1+(·,w2) + k) / (N1+(··) + k·V)

where N1+(w1,·) is w1's distinct-continuation count, N1+(·,w2) is w2's
distinct-predecessor count (the "how many contexts has this word completed"
novelty signal that makes KN beat frequency smoothing), N1+(··) is the
number of distinct bigram types, and the small ``k`` spreads continuation
mass onto vocabulary words never seen as a continuation (log(0) guard).
With k's vocabulary-complete denominator, Σ_{w2∈V} P(w2|w1) = 1 exactly —
pinned as a test invariant. D defaults to the Chen-Goodman estimate
n1/(n1 + 2·n2) over bigram type counts-of-counts.

Scale design (100 TB):
- Training is the same TWO corpus passes as the add-k LM (bigram
  explode+groupBy, distinct-token count); every KN statistic (c1, the two
  N1+ marginals, counts-of-counts, the type total) derives from the
  bigram-VOCABULARY-sized aggregate via window sums/counts — no third
  corpus pass.
- The staged LM parquet feeds scoring's three probes (bigram, w1-marginal,
  w2-continuation) without re-deriving the corpus aggregation per subtree
  (the ``train_bigram_lm`` staging rationale).
- Scoring is one explode + three broadcastable lookup joins + one per-doc
  agg — identical shuffle shape to the add-k scorer; the filter's cutoff
  is a |corpus|-independent one-row aggregate broadcast back (quantile
  sketch by default, exact only on demand — the ``ppl_filter`` rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens

KN_CONT_K = 1e-6  # continuation-mass epsilon for never-continued vocab words


def train_kn_lm(
    docs: DataFrame, stage: bool = True, discount: float | None = None
) -> tuple[DataFrame, dict]:
    """Fit the KN bigram model. Returns ``(lm, consts)``:

    - ``lm``: one row per observed bigram type — (w1, w2, c12, c1, ncont1,
      npred2) with both marginals pre-attached (window count/sum over the
      type table, NOT extra corpus passes);
    - ``consts``: {"D", "n_types", "vocab_size", "k_cont"} — the scalars
      scoring needs. ``discount=None`` estimates D = n1/(n1 + 2·n2) from
      the bigram counts-of-counts (Chen-Goodman), clamped to [0.05, 0.95]
      and defaulting to 0.75 when the corpus has no singleton/doubleton
      evidence."""
    toks = docs.select(tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    big = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
            )
        ).alias("bg")
    ).select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lm = (
        c12.withColumn("c1", F.sum("c12").over(Window.partitionBy("w1")))
        .withColumn(
            "ncont1", F.count(F.lit(1)).over(Window.partitionBy("w1"))
        )
        .withColumn(
            "npred2", F.count(F.lit(1)).over(Window.partitionBy("w2"))
        )
    )
    if stage:
        from photo_vector_search_spark.operators.staging import stage_frame

        lm = stage_frame(lm, "pvs_kn_lm")
    # one type-table aggregation for every scalar: type total + the
    # counts-of-counts the discount estimate needs
    stats = lm.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("c12") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c12") == 2).cast("long")).alias("n2"),
    ).first()
    vocab_size = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t"))
        .first()[0]
    )
    if discount is None:
        n1, n2 = int(stats["n1"]), int(stats["n2"])
        discount = (
            min(0.95, max(0.05, n1 / (n1 + 2.0 * n2)))
            if (n1 + 2 * n2) > 0
            else 0.75
        )
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    consts = {
        "D": float(discount),
        "n_types": int(stats["n_types"]),
        "vocab_size": int(vocab_size),
        "k_cont": KN_CONT_K,
    }
    return lm, consts


def _prob_expr(consts: dict):
    """The interpolated-KN probability as a Catalyst expression over the
    three joined probe columns (NULL = not observed). D < 1 and integer
    counts make the max(c12−D, 0) clamp vacuous for seen bigrams — kept for
    fidelity to the published form."""
    D = float(consts["D"])
    denom = consts["n_types"] + consts["k_cont"] * consts["vocab_size"]
    pc = (F.coalesce(F.col("npred2"), F.lit(0)) + F.lit(consts["k_cont"])) / (
        F.lit(float(denom))
    )
    seen_w1 = F.col("c1").isNotNull()
    base = F.greatest(
        F.coalesce(F.col("c12"), F.lit(0)) - F.lit(D), F.lit(0.0)
    ) / F.col("c1")
    lam = F.lit(D) * F.col("ncont1") / F.col("c1")
    return F.when(seen_w1, base + lam * pc).otherwise(pc)


def doc_log_perplexity_kn(
    docs: DataFrame, lm: DataFrame, consts: dict
) -> DataFrame:
    """Per-document mean negative log2 KN bigram probability — the CCNet
    quality signal under the KN model. Output (doc_id, n_bigrams, nll),
    nll rounded 6dp; docs with < 2 tokens get no row (no bigram evidence).

    The w1 marginal joins by w1 ALONE and the continuation by w2 ALONE
    (the add-k scorer's held-out-bigram rule: a novel (w1, w2) pairing of
    two seen words must back off through w1's real mass, not the
    unseen-context path)."""
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    w1_tbl = lm.select("w1", "c1", "ncont1").distinct()
    w2_tbl = lm.select("w2", "npred2").distinct()
    scored = (
        big.join(lm.select("w1", "w2", "c12"), ["w1", "w2"], "left")
        .join(w1_tbl, "w1", "left")
        .join(w2_tbl, "w2", "left")
        .select("doc_id", (-F.log2(_prob_expr(consts))).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("nll"),
    )


def kn_ppl_filter(
    docs: DataFrame,
    lm: DataFrame,
    consts: dict,
    keep_frac: float = 0.67,
    exact: bool = False,
) -> DataFrame:
    """Keep the most-fluent ``keep_frac`` of scoreable documents (lowest
    KN nll) — the CCNet keep-head/middle rule under the KN model. The
    cutoff is ONE one-row aggregate broadcast back into a map-only filter:
    ``approx_percentile`` (a bounded sketch — the 100 TB default) or the
    exact percentile on demand. Ties at the cutoff keep everything at the
    boundary value (deterministic, no id lottery)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    scored = doc_log_perplexity_kn(docs, lm, consts)
    fn = F.percentile if exact else F.percentile_approx
    cut = scored.agg(
        fn(F.col("nll"), F.lit(float(keep_frac))).alias("cut")
    )
    return scored.join(F.broadcast(cut)).filter(
        F.col("nll") <= F.col("cut")
    ).drop("cut")
