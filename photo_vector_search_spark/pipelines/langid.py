"""Learned language identification — the fastText-style rung of the lang-ID
family (Joulin et al. 2016: a linear classifier over hashed character
n-grams is competitive with deep models for language ID and runs at
corpus speed). The heuristic rung (`functions/text.lang_id`-style stopword
statistics) needs no training; this learned rung handles the many-language
regime a real crawl pipeline faces (CCNet runs fastText lang-ID as its
first stage).

Spark-first: char n-grams are built JVM-side (`sequence` + `transform` +
`substring` — codegen, no UDF), features are `HashingTF` hashed counts (no
vocabulary state, any corpus size), the model is MLlib multinomial
`LogisticRegression` (distributed L-BFGS, no sampling), labels round-trip
through `StringIndexer(alphabetAsc)`/`IndexToString` (alphabetical order,
NOT the frequency-dependent default — retraining on a re-sampled corpus
must not silently permute the label mapping). Scoring is one map-only
`transform` that pipelines into the scan; all user columns pass through
(`_li_*` uniquified internals, the quality-classifier convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NORM = "_li_norm"
_GRAMS = "_li_grams"
_FEATURES = "_li_features"
_LABEL = "_li_label"
_PRED = "_li_prediction"
_PROB = "_li_probability"
_RAW = "_li_raw"
_OUT = "_li_lang"


def _norm_text(text: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form grams are cut
    from (formatting must not shadow the script signal)."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def _grams_of(s: Column, n: int) -> Column:
    """n-gram array of an ALREADY-NORMALIZED string column. ``s`` must be a
    plain column reference when this feeds a corpus-sized pass: Spark does
    not CSE a composite expression into ``transform``'s lambda, so an
    inline ``regexp_replace(...)`` here re-executes once PER GRAM — measured
    10x the whole scoring wall (18.8s -> 1.8s on the sf0.1 corpus). The
    length guard matters too: ``sequence(1, 0)`` is DESCENDING in Spark, so
    an unguarded short string would fabricate grams."""
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: F.substring(s, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Lowercased character ``n``-grams of a string column, as an array;
    NULL/short strings give an empty array (HashingTF rejects NULL arrays).
    Convenience/test surface — the train/predict pipelines materialize the
    normalized string into a column first and gram over THAT (see
    ``_grams_of`` for why the inline form is 10x slower per pass)."""
    return _grams_of(_norm_text(text), n)


def train_langid(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    n_features: int = 1 << 16,
    reg_param: float = 1e-4,
    max_iter: int = 60,
):
    """Fit the language classifier on ``(text, lang)`` rows. Returns a
    fitted ``PipelineModel`` (persistable via ``.save``/``PipelineModel.load``
    — persist it: like the quality model, L-BFGS float sums vary in
    low-order bits across partitionings). Rows with NULL label are dropped
    (unlabeled text can't supervise); NULL text trains as the empty gram
    set. Training is one hashing pass + L-BFGS treeAggregate rounds —
    corpus-linear per iteration, no driver-sized state beyond the
    (n_features × n_labels) coefficient matrix."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, StringIndexer

    train = (
        labeled.filter(F.col(label_col).isNotNull())
        .withColumn(_NORM, _norm_text(F.col(text_col)))
        .select(
            F.col(label_col).cast("string").alias("_li_raw_label"),
            _grams_of(F.col(_NORM), n).alias(_GRAMS),
        )
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCol="_li_raw_label",
                outputCol=_LABEL,
                stringOrderType="alphabetAsc",
                handleInvalid="error",
            ),
            HashingTF(inputCol=_GRAMS, outputCol=_FEATURES, numFeatures=n_features),
            LogisticRegression(
                featuresCol=_FEATURES,
                labelCol=_LABEL,
                maxIter=max_iter,
                regParam=reg_param,
                family="multinomial",
                standardization=False,
                predictionCol=_PRED,
                probabilityCol=_PROB,
                rawPredictionCol=_RAW,
            ),
        ]
    )
    model = pipe.fit(train)
    # see quality.strip_training_summaries: a summary-carrying model cannot
    # enter a task closure once any Observation has run in the session
    from photo_vector_search_spark.pipelines.quality import (
        strip_training_summaries,
    )

    strip_training_summaries(model)
    return model


def predict_lang(
    docs: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "lang_pred",
    conf_col: str | None = "lang_conf",
    n: int = 3,
) -> DataFrame:
    """Add ``out_col`` = predicted language label (+ ``conf_col`` = its
    probability, 6dp, unless None). ``n`` must match the training n-gram
    length. Map-only — hashing + one matrix-vector product per doc,
    pipelines into the scan, no shuffle. All input columns pass through
    untouched (internals are ``_li_*``-uniquified).

    Side effect: a model still carrying its training summary is stripped in
    place first (see ``quality.strip_training_summaries`` — such a model
    cannot enter a task closure once any Observation has run in the
    session)."""
    from pyspark.ml.functions import vector_to_array

    from photo_vector_search_spark.pipelines.quality import (
        strip_training_summaries,
    )

    strip_training_summaries(model)

    labels = model.stages[0].labels
    scored = model.transform(
        docs.withColumn(_NORM, _norm_text(F.col(text_col)))
        .withColumn(_GRAMS, _grams_of(F.col(_NORM), n))
        .withColumn("_li_raw_label", F.lit(labels[0]))  # indexer needs a value
    )
    label_arr = F.array(*[F.lit(x) for x in labels])
    out = scored.withColumn(
        out_col, F.element_at(label_arr, F.col(_PRED).cast("int") + 1)
    )
    if conf_col is not None:
        out = out.withColumn(
            conf_col,
            F.round(
                F.element_at(
                    vector_to_array(F.col(_PROB)), F.col(_PRED).cast("int") + 1
                ),
                6,
            ),
        )
    return out.drop(
        _NORM, _GRAMS, _FEATURES, _LABEL, _PRED, _PROB, _RAW, "_li_raw_label"
    )
