"""Token-budget corpus mixing — the Pile/DoReMi-style domain-weighting step:
given per-source mixture weights and a total token budget, emit each source's
documents with the right REPEAT factor (upsampling high-weight small sources
across epochs, the standard pretraining practice) or deterministic
down-sampling (low-weight large sources), so the emitted corpus hits the
target token distribution.

Why token-budget and not doc-count: sources have wildly different doc
lengths; weighting by document count (``stratified_sample``'s rung) skews
the TOKEN mix a model actually trains on.

Spark-first shape: one map-side-combinable agg (per-source token totals →
a handful of driver rows), a broadcast rate table, then a map-only
epoch-explode + md5-uniform filter — deterministic under any partitioning
(the same ``md5_uniform`` discipline as `pareto_keep`/`shuffle_corpus`;
seeded ``rand()`` draws change with the physical split). Nothing
driver-sized beyond the per-source table.

Reference scope note: the reference (photo_vector_search) has no corpus
surface; this extends the mandated LLM-pipeline mixing family
(`stratified_sample` = doc-count rung, this = token rung).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import md5_uniform, token_count


def source_token_totals(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, n_tokens) — the one corpus-sized pass of mixing.
    Token counts use the same ``tokens()`` canonicalization as every text
    operator (NULL text counts 0)."""
    return docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
        ).alias("n_tokens"),
    )


def temperature_weights(
    totals: list[tuple[str, int]], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-scaled sampling weights over observed source sizes —
    the multilingual-pretraining rule (XLM-R / mT5, both α=0.3; exponential
    smoothing of the natural distribution): ``w_s = n_s^α / Σ_t n_t^α``.

    α=1 reproduces the natural (proportional) mix, α=0 the uniform mix;
    0<α<1 up-weights small sources without letting any source vanish —
    the standard fix for high-resource languages drowning the tail.
    Feed the result straight into ``mix_corpus``/``mixture_rates`` (reuse
    the same ``totals`` so the corpus pass runs once). Sources with zero
    tokens are dropped (they cannot fill any share — ``mixture_rates``
    would raise on them). Driver-side arithmetic over the |sources|-row
    totals — no distributed work of its own."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    sized = [(s, int(n)) for s, n in totals if int(n) > 0]
    if not sized:
        raise ValueError("temperature_weights: no source has tokens")
    powed = {s: float(n) ** alpha for s, n in sized}
    z = sum(powed.values())
    return {s: p / z for s, p in powed.items()}


def mixture_rates(
    totals: list[tuple[str, int]], weights: dict[str, float], budget_tokens: int
) -> dict[str, float]:
    """Per-source emission rate: ``rate_s = (w_s / Σw) · budget / tokens_s``.

    rate < 1 → down-sample (keep that fraction); rate > 1 → UP-sample: emit
    ``floor(rate)`` full epochs plus a ``frac(rate)``-sampled partial epoch.
    Sources absent from ``weights`` or with zero/negative weight rate 0 —
    dropped. A POSITIVE-weight source with no tokens in ``totals`` RAISES
    (a silent 0 would under-fill the budget the caller asked for)."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    tok = {s: int(n) for s, n in totals}
    wsum = float(sum(w for w in weights.values() if w > 0))
    if wsum <= 0:
        raise ValueError("weights must contain at least one positive entry")
    rates: dict[str, float] = {}
    for s, w in weights.items():
        if w <= 0:
            continue
        if tok.get(s, 0) <= 0:
            raise ValueError(
                f"mixture_rates: source {s!r} has weight {w} but no tokens in the "
                "corpus — its budget share cannot be filled"
            )
        rates[s] = (w / wsum) * budget_tokens / tok[s]
    return rates


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    seed: int = 0,
    key_col: str = "doc_id",
    totals: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Emit the mixed corpus: every output row is one TRAINING INSTANCE of a
    document, tagged with ``epoch`` (0-based repeat index; downsampled
    sources only ever emit epoch 0). Expected emitted tokens per source =
    its normalized weight share of ``budget_tokens`` (exact in expectation;
    realized totals differ by doc-length granularity, like every stochastic
    mixer).

    Selection is per (epoch, doc): doc d appears in partial epoch k iff
    ``md5_uniform(seed·k-composite) ≤ frac(rate)`` — deterministic and
    partitioning-invariant. Each doc's uniform draw depends only on
    ``(seed, epoch, key)``, never on other docs; corpus changes move a
    source's RATE (totals shift) but cannot reshuffle which side of a fixed
    threshold any given draw lands on. All input columns pass through.

    Two corpus passes by design (the totals aggregate must finish before the
    emission rates exist); pass ``totals`` — a previous
    ``source_token_totals`` result, persisted however the caller likes — to
    skip the first pass on re-runs over an unchanged corpus."""
    if totals is None:
        totals = [
            (r[source_col], r["n_tokens"])
            for r in source_token_totals(docs, source_col, text_col).collect()
        ]
    rates = mixture_rates(totals, weights, budget_tokens)
    spark = docs.sparkSession
    rate_rows = [(s, float(r)) for s, r in sorted(rates.items())]
    if not rate_rows:
        return docs.filter(F.lit(False)).withColumn("epoch", F.lit(0))
    if "epoch" in docs.columns or "_mx_rate" in docs.columns:
        # `epoch` is this operator's OUTPUT column (the repeat index) and
        # would silently overwrite user data; _mx_rate is the internal name
        raise ValueError(
            "mix_corpus: input already has an 'epoch' or '_mx_rate' column — "
            "rename it first; 'epoch' is the operator's output"
        )
    rate_df = F.broadcast(
        spark.createDataFrame(rate_rows, f"{source_col} string, _mx_rate double")
    )
    with_rate = docs.join(rate_df, source_col)  # unweighted sources drop here
    # epochs 0..floor(rate): full epochs always emit; the last (partial)
    # epoch emits iff the per-(doc, epoch) uniform clears frac(rate)
    n_full = F.floor(F.col("_mx_rate")).cast("int")
    frac = F.col("_mx_rate") - n_full
    exploded = with_rate.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), n_full))
    )
    u = md5_uniform(seed, F.concat_ws("|", F.col("epoch"), F.col(key_col)))
    return (
        exploded.filter((F.col("epoch") < n_full) | (u <= frac))
        .drop("_mx_rate")
    )
