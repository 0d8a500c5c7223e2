"""Learned corpus-quality classifier — the GPT-3/CCNet filtering rung.

The rule-based gates (`functions/text.gopher_flags`) catch structural junk;
the LEARNED filter catches everything they can't: train a linear classifier
to separate a high-quality seed corpus (positive) from the raw crawl
(negative), score every document, and keep probabilistically with the
GPT-3 Pareto rule so the kept set isn't a hard cliff at the threshold.

Spark-first: features are hashed token counts (``HashingTF`` over the same
``tokens()`` canonicalization every text operator uses — no vocabulary state,
any corpus size), the model is MLlib ``LogisticRegression`` (distributed
L-BFGS, deterministic: no sampling in either stage), and scoring is one
``transform`` — a map-only stage that pipelines into the scan. The Pareto
keep-rule uses the engine-portable md5-uniform (the `stratified_sample`
discipline), NOT ``rand()``: re-partitioning cannot change which docs
survive.

Reference scope note: the reference (photo_vector_search) has no text
pipeline; this extends the mandated LLM-pipeline quality family (Gopher
gates, bigram-LM perplexity) with its learned tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens

_FEATURES = "_q_features"
_TOKS = "_q_toks"
# uniquified ML output columns: Spark ML's defaults (prediction/probability/
# rawPrediction) would collide with — or silently delete — user metadata
# columns of those common names in score_quality's passthrough
_PRED = "_q_prediction"
_PROB = "_q_probability"
_RAW = "_q_raw"


def strip_training_summaries(model) -> None:
    """Drop the in-memory training summary from every stage of a fitted
    model, in place.

    A freshly-fit MLlib classifier keeps a ``trainingSummary`` whose JVM
    object references the owning SparkSession. The session is serializable
    only while its lazy ``observationManager`` field is uninitialized; the
    first ``DataFrame.observe`` in the session initializes it (Spark 4.1's
    ``ObservationManager`` is not ``Serializable``), after which ANY task
    closure that captures the summary-carrying model — every
    ``model.transform`` whose prediction survives into a filter or
    projection — dies with ``Task not serializable``. Models loaded from
    disk never carry a summary; stripping makes fresh fits match them.
    (Scala's ``private[ml] setSummary`` compiles to a public JVM method, so
    py4j can reach it.) Read any metrics you want from the summary BEFORE
    calling this."""
    from py4j.protocol import Py4JError

    for stage in getattr(model, "stages", None) or [model]:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            if jobj.hasSummary():
                jvm = model.sc._jvm if hasattr(model, "sc") else None
                if jvm is None:
                    from pyspark import SparkContext

                    jvm = SparkContext._active_spark_context._jvm
                jobj.setSummary(jvm.scala.Option.apply(None))
        except Py4JError:
            continue  # stage without a summary interface (e.g. HashingTF)


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 60,
):
    """Fit the quality model: positive = high-quality seed corpus, negative =
    raw/unfiltered corpus (label it all 0 — the GPT-3 recipe tolerates
    positives hiding in the negative sample). Returns a fitted
    ``pyspark.ml.PipelineModel`` (persistable with ``.save(path)`` /
    ``PipelineModel.load``).

    Reproducibility: no stage samples (hashing is stateless, L-BFGS
    optimizes a fixed objective), so retraining on the same data converges
    to the same optimum — but the gradient treeAggregate sums floats in
    partition order, so models trained under DIFFERENT partitionings can
    differ in low-order bits (scores agree to ~1e-6 in tests, not
    bit-exactly). Train once and PERSIST the model (``model.save``) when the
    survivor set must be byte-stable across runs; ``pareto_keep`` itself is
    exactly deterministic given a model."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    train = positive.select(
        F.lit(1.0).alias("label"), _tok_col(text_col)
    ).unionByName(negative.select(F.lit(0.0).alias("label"), _tok_col(text_col)))
    pipe = Pipeline(
        stages=[
            HashingTF(inputCol=_TOKS, outputCol=_FEATURES, numFeatures=n_features),
            LogisticRegression(
                featuresCol=_FEATURES,
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
                standardization=False,
                predictionCol=_PRED,
                probabilityCol=_PROB,
                rawPredictionCol=_RAW,
            ),
        ]
    )
    model = pipe.fit(train)
    # see strip_training_summaries: a summary-carrying model cannot enter a
    # task closure once any Observation has run in the session
    strip_training_summaries(model)
    return model


def _tok_col(text_col: str):
    # NULL-safe: HashingTF rejects null arrays; a NULL doc gets no tokens
    # (and the intercept-only score downstream)
    return F.coalesce(
        F.array_remove(tokens(F.col(text_col)), ""), F.array().cast("array<string>")
    ).alias(_TOKS)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Add ``out_col`` = P(high quality) ∈ [0,1]. Map-only: hashing +
    one dot product per doc, no shuffle; all input columns pass through —
    including user columns named ``prediction``/``probability``/
    ``rawPrediction`` (the model's outputs use uniquified ``_q_*`` names, so
    ``transform`` can neither collide with nor overwrite user metadata).

    Side effect: a model still carrying its training summary is stripped IN
    PLACE first (see ``strip_training_summaries`` — a summary-holding model
    cannot enter a task closure once any Observation has run in the
    session; engine-trained and disk-loaded models are already
    summary-free, this covers caller-fit ones)."""
    from pyspark.ml.functions import vector_to_array

    strip_training_summaries(model)
    scored = model.transform(docs.withColumn(_TOKS, _tok_col(text_col)))
    if _PROB in scored.columns:
        prob, extras = _PROB, (_FEATURES, _RAW, _PROB, _PRED)
    else:
        # backward compat: a model persisted BEFORE the r7 _q_* rename emits
        # MLlib's default output names — score it rather than fail, but only
        # drop the columns the transform actually ADDED (a default-named
        # model on docs that already carry e.g. a user `prediction` column
        # is unresolvable either way and surfaces as Spark's own collision
        # error at transform time)
        added = [c for c in scored.columns if c not in docs.columns and c != _TOKS]
        prob, extras = "probability", added
    return scored.withColumn(
        out_col, vector_to_array(F.col(prob)).getItem(1)
    ).drop(_TOKS, *extras)


def pareto_keep(
    docs: DataFrame,
    score_col: str = "quality_score",
    alpha: float = 9.0,
    seed: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """GPT-3's stochastic keep rule: keep a document iff

        score > 1 - pareto(alpha)      pareto(a) = u^(-1/a) - 1

    so high-score docs are (almost) always kept while low-score docs still
    leak through with small probability — no hard quality cliff, and the
    negative tail stays represented. ``u`` is the md5-uniform of
    ``(seed, key_col)`` (deterministic under any partitioning — seeded
    ``rand()`` is per-partition-seeded and is NOT), so the survivor set is
    reproducible and re-runnable."""
    from photo_vector_search_spark.functions.text import md5_uniform

    u = md5_uniform(seed, F.col(key_col))
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return docs.filter(F.col(score_col) > F.lit(1.0) - pareto)


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "zlib_ratio",
    level: int = 6,
) -> DataFrame:
    """Append ``out_col`` = len(zlib(text)) / len(text) over UTF-8 bytes —
    the compression-ratio quality signal the web-corpus pipelines use
    (Dolma's zlib gate; RedPajama-v2 ships it as the ``ccnet_*``-adjacent
    signal family): highly repetitive boilerplate/spam compresses far
    below fluent prose, while random-character noise refuses to compress
    (ratio near or above 1, zlib framing included). Rounded 6dp; NULL text
    → NULL ratio; empty text → NULL (no bytes, no evidence).

    One map-only Arrow pass; zlib is stdlib C, so the kernel cost is the
    compressor itself, not Python row overhead. DuckDB has no zlib — this
    signal is pytest-pinned against direct per-row zlib instead of a SQL
    twin."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _ratio(batches):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [one(t) for t in pdf[text_col]], index=pdf.index, dtype=object
            )
            yield pdf

    return docs.mapInPandas(_ratio, schema=schema)


def compression_gate(
    docs: DataFrame,
    min_ratio: float = 0.25,
    max_ratio: float = 1.1,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Two-sided compression gate: drop documents whose zlib ratio falls
    below ``min_ratio`` (pathologically repetitive — template spam, token
    floods) or above ``max_ratio`` (incompressible noise — binary spill,
    encrypted/garbled text). Unscoreable docs (NULL/empty text) drop, the
    rule-gate convention. The transient ratio column is removed; use
    ``compression_ratio`` directly to keep it. Thresholds are
    corpus-dependent — calibrate on a held-out slice (the defaults bracket
    typical natural-language prose, which lands ≈0.3-0.7)."""
    if not 0.0 <= min_ratio < max_ratio:
        raise ValueError(
            f"need 0 <= min_ratio < max_ratio, got {min_ratio}, {max_ratio}"
        )
    scored = compression_ratio(docs, text_col=text_col, level=level)
    return scored.filter(
        F.col("zlib_ratio").between(
            F.lit(float(min_ratio)), F.lit(float(max_ratio))
        )
    ).drop("zlib_ratio")


def c4_clean(
    docs: DataFrame,
    min_words: int = 5,
    min_lines: int = 3,
    text_col: str = "text",
    out_col: str = "clean",
) -> DataFrame:
    """C4's line-level cleanup (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer" §2.2 — the
    rules that built C4 from Common Crawl): keep only lines that END in a
    terminal punctuation mark (. ! ? or a closing double quote) AND have at
    least ``min_words`` words; drop any page left with fewer than
    ``min_lines`` surviving lines, any page containing the phrase
    "lorem ipsum" (case-insensitive), and any page containing a curly
    brace (code). Output: (all columns, ``out_col``) for surviving pages,
    rebuilt from surviving lines in original order.

    Distinct from the frequency rules (`dedup.remove_boilerplate_lines`
    drops lines because they repeat ACROSS docs) and the doc-stat gates
    (`functions/text.gopher_flags`): C4's rules are per-line STRUCTURAL —
    no corpus statistics at all.

    Scale shape (100 TB): ZERO exchanges — the whole operator is array
    expressions inside the scan stage (split → filter lambda → array_join
    + three codegen predicates); it pipelines with whatever runs next and
    costs one pass over text bytes. NULL text fails the min-lines gate and
    drops (a cleaner cannot vouch for text it cannot read)."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if min_lines < 1:
        raise ValueError(f"min_lines must be >= 1, got {min_lines}")
    lines = F.split(F.col(text_col), "\n")
    # terminal punctuation per the C4 rule; ” is the curly close quote;
    # surviving lines keep their ORIGINAL bytes (gates select, never rewrite)
    terminal = r'[.!?]["”]?\s*$'
    keep_line = lambda ln: ln.rlike(terminal) & (  # noqa: E731
        F.size(F.array_remove(F.split(F.trim(ln), r"\s+"), "")) >= min_words
    )
    kept = F.filter(lines, keep_line)
    return (
        docs.withColumn("_kept", kept)
        .filter(F.size("_kept") >= min_lines)
        .filter(~F.lower(F.col(text_col)).contains("lorem ipsum"))
        .filter(~F.col(text_col).contains("{"))
        .withColumn(out_col, F.array_join(F.col("_kept"), "\n"))
        .drop("_kept")
    )


def mad_outlier_gate(
    docs: DataFrame,
    signal_col: str,
    by: str | None = None,
    k: float = 3.0,
    exact: bool = False,
    null_pass: bool = True,
) -> DataFrame:
    """Robust outlier gate over a quality signal: keep rows within
    ``k`` robust standard deviations of the (per-``by``-group) median,
    scale = 1.4826·MAD (the normal-consistency constant) — the
    median/MAD discipline corpus reports use because web-scale quality
    signals are heavy-tailed and a mean/stddev gate lets one 10^6-token
    monster doc move its own cutoff.

    Two aggregation passes (median, then MAD of the residuals), both
    grouped map-side-combinable sketches by default (`percentile_approx`
    — the 100 TB posture; ``exact=True`` swaps in the exact percentile
    for oracle replays), each producing a |groups|-row frame broadcast
    back into a map-only filter — no windows, no global sort.

    Degenerate spread (MAD == 0: over half the group shares one value)
    keeps the whole group — zero spread is zero evidence of outlierness,
    and dropping everything off-median would let a constant-signal group
    self-destruct. NULL signals pass by default (a gate drops only on
    evidence; ``null_pass=False`` for strict pipelines). NULL ``by``
    groups gate like any other group (null-safe equality join)."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    fn = F.percentile if exact else F.percentile_approx
    x = F.col(signal_col).cast("double")
    # Aggregate frames carry the key under a fresh name (`_by`) so the join
    # condition never references two lineage-shared attributes — the
    # ambiguous-self-join shape that breaks on some Spark versions.
    keys = [F.col(by).alias("_by")] if by else []
    med = docs.filter(x.isNotNull()).groupBy(*keys).agg(
        fn(x, F.lit(0.5)).alias("_med")
    )

    def _join(left, stats):
        if not by:
            return left.crossJoin(F.broadcast(stats))
        return left.join(
            F.broadcast(stats),
            on=[F.col(by).eqNullSafe(stats["_by"])],
            how="left",
        ).drop("_by")

    with_med = _join(docs, med)
    mad = (
        with_med.filter(x.isNotNull())
        .groupBy(*keys)
        .agg(fn(F.abs(x - F.col("_med")), F.lit(0.5)).alias("_mad"))
    )
    gated = _join(with_med, mad)
    scale = F.lit(1.4826) * F.col("_mad")
    keep = F.when(x.isNull(), F.lit(null_pass)).otherwise(
        (F.col("_mad") == 0) | (F.abs(x - F.col("_med")) <= F.lit(k) * scale)
    )
    return gated.filter(keep).drop("_med", "_mad")
