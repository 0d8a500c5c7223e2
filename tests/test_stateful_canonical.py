"""applyInPandasWithState streaming sessionization, SRP-LSH recall, and
applyInPandas group canonicalization."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import quality_score
from photo_vector_search_spark.operators.canonicalize import canonicalize_groups
from photo_vector_search_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    srp_lsh_near_dup_pairs,
)
from photo_vector_search_spark.sources.tables import load_table


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    """Drain the events table through the stateful operator (one micro-batch) —
    session counts per user must match the batch lag/cumsum computation."""
    from photo_vector_search_spark.plans.relational import q_events_sessionize
    from photo_vector_search_spark.streaming.stateful import streaming_sessionize

    tmp = tempfile.mkdtemp(prefix="pvs_state_")
    try:
        # subset of users keeps the state-store run quick; semantics unchanged
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") < 30)
            .select("event_id", "ts", "user_id")
        )
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        q = (
            streaming_sessionize(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        # availableNow terminates on its own; a silent awaitTermination timeout
        # would leave the memory sink incomplete and fail below as a confusing
        # value mismatch — make "host too slow" its own clear failure instead
        finished = q.awaitTermination(600)
        assert finished, "streaming sessionize did not drain within 600s"
        # the append stream emits cumulative open-session snapshots plus a final
        # closed row per session (timeout or gap rollover) — reduce to one row
        # per (user, session) via max(n_events) before totaling, as any real
        # consumer of this stream would
        got = spark.sql(
            "SELECT user_id, max(session_id) AS n_sessions, sum(mx) AS n_events FROM ("
            "  SELECT user_id, session_id, max(n_events) AS mx FROM sessions"
            "  GROUP BY user_id, session_id) GROUP BY user_id"
        )
        # batch twin counts sessions 1-based via sum of new-session flags
        batch = q_events_sessionize(spark, sf_dir).withColumn(
            "n_sessions", F.col("n_sessions") - 1  # align to 0-based session ids
        )
        a = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}
        b = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in batch.collect()
            if r.user_id < 30
        }
        assert a == b and len(a) > 0
    finally:
        spark.catalog.dropTempView("sessions")
        shutil.rmtree(tmp, ignore_errors=True)


def test_srp_lsh_recall_and_precision(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    exact = {(r.vec_a, r.vec_b): r.sim for r in embedding_near_dup_pairs(emb, tau=0.4).collect()}
    lsh = {(r.vec_a, r.vec_b): r.sim for r in srp_lsh_near_dup_pairs(emb, tau=0.4).collect()}
    # precision is exact by construction (verified candidates)
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # recall floor on the fixture (deterministic planes)
    assert exact, "fixture should contain pairs at tau=0.4"
    recall = len(lsh) / len(exact)
    assert recall >= 0.5, f"SRP-LSH recall {recall:.2f} below floor"


def test_canonicalize_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    recrawl = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", F.lit("recrawl").alias("source")
    )
    all_docs = docs.unionByName(recrawl)
    groups = exact_dedup(all_docs).select("doc_id", F.col("fp").alias("group_id"))
    records = (
        all_docs.join(groups, "doc_id")
        .withColumn("quality", quality_score(F.col("text")))
        .select("doc_id", "group_id", "source", "quality")
    )
    canon = canonicalize_groups(records).cache()
    assert canon.count() == docs.count()  # one row per distinct text
    dups = canon.filter(F.col("n_members") > 1)
    assert dups.count() == 50
    r = dups.orderBy("canonical_id").first()
    assert r.n_members == 2 and "recrawl" in r.sources.split(",")
    assert r.canonical_id < 100000  # min-id wins
