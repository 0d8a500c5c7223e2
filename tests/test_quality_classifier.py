"""Learned quality classifier: separability on a synthetic seed-vs-crawl
split, determinism of training and of the Pareto keep rule, and NULL/empty
contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.pipelines.quality import (
    pareto_keep,
    score_quality,
    train_quality_classifier,
)
from photo_vector_search_spark.sources.tables import load_table


def _cipher(col):
    """Substitution-cipher the text (the scale bench's trick): same lengths
    and whitespace, alien token distribution — a clean 'raw crawl' stand-in."""
    return F.translate(col, "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba")


def _split(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    pos = docs.filter(F.col("doc_id") % 2 == 0)
    neg = docs.filter(F.col("doc_id") % 2 == 1).withColumn("text", _cipher(F.col("text")))
    return docs, pos, neg


def test_separates_seed_from_crawl_with_holdout(spark, sf_correct):
    docs, pos, neg = _split(spark, sf_correct)
    # train on doc_id % 4 ∈ {0,1}, evaluate on the held-out half
    model = train_quality_classifier(
        pos.filter(F.col("doc_id") % 4 == 0), neg.filter(F.col("doc_id") % 4 == 1)
    )
    held_pos = pos.filter(F.col("doc_id") % 4 == 2)
    held_neg = neg.filter(F.col("doc_id") % 4 == 3)
    sp = [r["quality_score"] for r in score_quality(held_pos, model).collect()]
    sn = [r["quality_score"] for r in score_quality(held_neg, model).collect()]
    assert all(0.0 <= s <= 1.0 for s in sp + sn)
    # strong separation on held-out docs: compare every cross pair (AUC)
    auc = sum(1 for a in sp for b in sn if a > b) / (len(sp) * len(sn))
    assert auc > 0.95, auc
    assert sum(sp) / len(sp) > 0.8 > 0.2 > sum(sn) / len(sn)


def test_training_and_scoring_deterministic(spark, sf_correct):
    """Same data, different partitionings: the gradient treeAggregate sums
    floats in partition order, so coefficients may differ in low-order bits
    — scores must agree closely (1e-6) but bit-exactness is NOT the
    contract (the docstring prescribes persisting the model for that)."""
    _, pos, neg = _split(spark, sf_correct)
    m1 = train_quality_classifier(pos.repartition(7), neg.repartition(3))
    m2 = train_quality_classifier(pos.coalesce(1), neg.coalesce(1))
    probe = pos.limit(40)
    s1 = {r["doc_id"]: r["quality_score"] for r in score_quality(probe, m1).collect()}
    s2 = {r["doc_id"]: r["quality_score"] for r in score_quality(probe, m2).collect()}
    assert set(s1) == set(s2)
    assert all(abs(s1[d] - s2[d]) < 1e-6 for d in s1)
    # scoring the SAME model twice IS exact
    s1b = {r["doc_id"]: r["quality_score"] for r in score_quality(probe, m1).collect()}
    assert s1 == s1b


def test_score_passthrough_and_null_empty(spark, sf_correct):
    _, pos, neg = _split(spark, sf_correct)
    model = train_quality_classifier(pos, neg)
    df = spark.createDataFrame(
        [(1, "some text", "m"), (2, None, "m"), (3, "", "m")],
        "doc_id int, text string, meta string",
    )
    out = score_quality(df, model)
    assert set(out.columns) == {"doc_id", "text", "meta", "quality_score"}
    rows = {r["doc_id"]: r for r in out.collect()}
    # NULL/empty docs hash to no tokens -> the intercept-only score, defined
    assert 0.0 <= rows[2]["quality_score"] <= 1.0
    assert rows[2]["quality_score"] == rows[3]["quality_score"]
    assert rows[2]["text"] is None


def test_pareto_keep_deterministic_and_score_monotone(spark):
    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") / n).cast("double").alias("quality_score")
    )
    a = {r["doc_id"] for r in pareto_keep(df.repartition(11), seed=5).collect()}
    b = {r["doc_id"] for r in pareto_keep(df.coalesce(1), seed=5).collect()}
    assert a == b  # md5-uniform: partitioning-invariant, unlike rand()
    c = {r["doc_id"] for r in pareto_keep(df, seed=6).collect()}
    assert a != c  # different seed, different survivors
    # keep-rate matches the rule's analytics: P(keep | score s) = (2-s)^-9,
    # so the top decile averages ~0.65, the bottom ~0.003, and the overall
    # rate is ∫(2-s)^-9 ds = (1 - 2^-8)/8 ≈ 0.1245
    top = sum(1 for d in a if d >= n * 0.9) / (n * 0.1)
    bot = sum(1 for d in a if d < n * 0.1) / (n * 0.1)
    assert 0.55 < top < 0.75, top
    assert bot < 0.02, bot
    assert 0.10 < len(a) / n < 0.15, len(a) / n


def test_score_quality_accepts_legacy_default_named_model(spark):
    """A model persisted BEFORE the r7 _q_* output rename emits MLlib's
    default prediction/probability/rawPrediction columns; score_quality must
    score it (compat fallback) and drop exactly the columns the transform
    added."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.sql import functions as F

    from photo_vector_search_spark.pipelines.quality import (
        _FEATURES,
        _TOKS,
        score_quality,
    )

    docs = spark.createDataFrame(
        [(0, "good clean text", 1.0), (1, "zzz qq xx", 0.0)] * 10,
        "doc_id long, text string, label double",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    train = docs.withColumn(
        _TOKS, F.array_remove(F.split(F.lower("text"), r"\s+"), "")
    )
    legacy = Pipeline(
        stages=[
            HashingTF(inputCol=_TOKS, outputCol=_FEATURES, numFeatures=64),
            LogisticRegression(featuresCol=_FEATURES, labelCol="label"),
        ]
    ).fit(train)
    out = score_quality(docs.select("doc_id", "text"), legacy)
    rows = out.collect()
    assert set(out.columns) == {"doc_id", "text", "quality_score"}
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)


def test_model_survives_session_observation(spark, sf_correct):
    """Once any DataFrame.observe has run in the session, Spark 4.1's
    SparkSession holds a non-serializable ObservationManager — a freshly-fit
    model that still carried its trainingSummary (which references the
    session) would then fail task-closure serialization in every transform
    whose prediction survives into a filter. train_quality_classifier strips
    the summary, so score→filter→count must work AFTER an observation."""
    from pyspark.sql import Observation

    docs, pos, neg = _split(spark, sf_correct)
    model = train_quality_classifier(pos, neg)
    # every fitted stage must already be summary-free
    for stage in model.stages:
        assert not getattr(stage, "hasSummary", False)
    obs = Observation()
    docs.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    assert obs.get["n"] > 0  # the manager is now initialized for the session
    scored = score_quality(docs, model)
    assert scored.filter(F.col("quality_score") >= 0.0).count() == docs.count()

    # a CALLER-fit model (bypassing train_quality_classifier) still carries
    # its summary — score_quality must strip it defensively, or scoring
    # fails in any session that has run an observation (full-suite order
    # dependence caught exactly this)
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from photo_vector_search_spark.pipelines.quality import _FEATURES, _TOKS

    train = pos.limit(20).select(
        F.lit(1.0).alias("label"),
        F.array_remove(F.split(F.lower("text"), r"\s+"), "").alias(_TOKS),
    ).unionByName(
        neg.limit(20).select(
            F.lit(0.0).alias("label"),
            F.array_remove(F.split(F.lower("text"), r"\s+"), "").alias(_TOKS),
        )
    )
    caller_fit = Pipeline(
        stages=[
            HashingTF(inputCol=_TOKS, outputCol=_FEATURES, numFeatures=64),
            LogisticRegression(featuresCol=_FEATURES, labelCol="label", maxIter=5),
        ]
    ).fit(train)
    assert any(getattr(s, "hasSummary", False) for s in caller_fit.stages)
    out = score_quality(docs, caller_fit)
    assert out.filter(F.col("quality_score") >= 0.0).count() == docs.count()
