"""Incremental IVF,SQ8 store maintenance (`operators/index_maintenance`):
upsert/delete/live-serving equivalence against the in-memory composition,
delta-wins and revival semantics, cross-build refusal, compaction identity
+ crash idempotence, and guards."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.index_maintenance import (
    compact_ivf_sq8_store,
    delete_from_ivf_sq8_store,
    live_ivf_sq8_topk,
    load_live_ivf_sq8,
    upsert_ivf_sq8_store,
)
from photo_vector_search_spark.operators.sq import (
    build_ivf_sq8_store,
    encode_sq8,
    ivf_sq8_topk,
    load_ivf_sq8_store,
)
from photo_vector_search_spark.sources.tables import load_table

NPROBE_ALL = 8  # full probe: approximation-free comparisons


@pytest.fixture()
def store(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivfsq8")
    centroids, model = build_ivf_sq8_store(base, path, n_clusters=NPROBE_ALL)
    return emb, base, extra, path, centroids, model


def _expected_topk(emb_subset, centroids, model, q, k=5):
    from photo_vector_search_spark.operators.ann import assign_clusters

    coded = encode_sq8(assign_clusters(emb_subset, centroids), model).select(
        "vec_id", "label", "cluster_id", "sq8"
    )
    return ivf_sq8_topk(coded, centroids, model, q, k=k, nprobe=NPROBE_ALL)


def test_upsert_makes_new_vectors_retrievable(spark, store):
    emb, base, extra, path, centroids, model = store
    q = emb.filter(F.col("vec_id") == 450).first()["embedding"]
    n = upsert_ivf_sq8_store(spark, path, extra)
    assert n == extra.count()
    got = live_ivf_sq8_topk(spark, path, q, k=5, nprobe=NPROBE_ALL).toPandas()
    assert got.vec_id.iloc[0] == 450  # the upserted query vector itself
    want = _expected_topk(emb, centroids, model, q).toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_upsert_replaces_same_id(spark, store):
    emb, base, extra, path, centroids, model = store
    # move vec 7 onto vec 300's embedding: searching near 300 now finds 7 too
    moved = (
        emb.filter(F.col("vec_id") == 300)
        .select(
            F.lit(7).cast("long").alias("vec_id"),
            "embedding",
            F.lit(99).cast("int").alias("label"),
        )
    )
    upsert_ivf_sq8_store(spark, path, moved)
    q = emb.filter(F.col("vec_id") == 300).first()["embedding"]
    got = live_ivf_sq8_topk(spark, path, q, k=2, nprobe=NPROBE_ALL).toPandas()
    assert set(got.vec_id) == {300, 7}
    assert got[got.vec_id == 7].label.iloc[0] == 99
    # exactly one live row for id 7
    live, _, _ = load_live_ivf_sq8(spark, path)
    assert live.filter(F.col("vec_id") == 7).count() == 1


def test_delete_and_revive(spark, store):
    emb, base, extra, path, centroids, model = store
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    before = live_ivf_sq8_topk(spark, path, q, k=3, nprobe=NPROBE_ALL).toPandas()
    assert before.vec_id.iloc[0] == 3
    assert delete_from_ivf_sq8_store(spark, path, [3]) == 1
    after = live_ivf_sq8_topk(
        spark, path, q, k=400, nprobe=NPROBE_ALL
    ).toPandas()
    assert 3 not in set(after.vec_id)
    # revive by re-upserting the same id
    upsert_ivf_sq8_store(spark, path, emb.filter(F.col("vec_id") == 3))
    revived = live_ivf_sq8_topk(spark, path, q, k=3, nprobe=NPROBE_ALL).toPandas()
    assert revived.vec_id.iloc[0] == 3


def test_cross_build_side_tables_refused(spark, store):
    emb, base, extra, path, centroids, model = store
    upsert_ivf_sq8_store(spark, path, extra.limit(5))
    # stamp the delta with a foreign build
    delta = spark.read.parquet(path + ".delta").withColumn(
        "build_id", F.lit("deadbeefdeadbeef")
    )
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    snapshot_overwrite(
        delta.localCheckpoint(eager=True),
        path + ".delta",
        partition_by=["cluster_id"],
    )
    with pytest.raises(ValueError, match="different centroids"):
        load_live_ivf_sq8(spark, path)


def test_compaction_identity_and_cleanup(spark, store):
    emb, base, extra, path, centroids, model = store
    upsert_ivf_sq8_store(spark, path, extra)
    delete_from_ivf_sq8_store(spark, path, [0, 1, 2])
    q = emb.filter(F.col("vec_id") == 123).first()["embedding"]
    before = live_ivf_sq8_topk(spark, path, q, k=8, nprobe=NPROBE_ALL).toPandas()

    n = compact_ivf_sq8_store(spark, path)
    assert n == emb.count() - 3
    assert not os.path.isdir(path + ".delta")
    assert not os.path.isdir(path + ".tombstones")
    after = live_ivf_sq8_topk(spark, path, q, k=8, nprobe=NPROBE_ALL).toPandas()
    assert after.values.tolist() == before.values.tolist()
    # the compacted base alone (no live overlay) serves identically
    coded, cents, m = load_ivf_sq8_store(spark, path)
    alone = ivf_sq8_topk(coded, cents, m, q, k=8, nprobe=NPROBE_ALL).toPandas()
    assert alone.values.tolist() == before.values.tolist()
    # base keeps the hive partitioning (cluster_id dirs)
    assert any(
        d.startswith("cluster_id=") for d in os.listdir(path)
    ), os.listdir(path)


def test_stale_side_tables_after_crash_are_harmless(spark, store, tmp_path):
    """Crash simulation: compaction committed the new base but died before
    clearing delta/tombstones — the stale side tables must not change the
    live view (idempotent overlay)."""
    emb, base, extra, path, centroids, model = store
    upsert_ivf_sq8_store(spark, path, extra)
    delete_from_ivf_sq8_store(spark, path, [5])
    q = emb.filter(F.col("vec_id") == 200).first()["embedding"]
    want = live_ivf_sq8_topk(spark, path, q, k=6, nprobe=NPROBE_ALL).toPandas()

    # preserve the side tables, compact, then restore them = the crash state
    keep = str(tmp_path / "stale")
    os.makedirs(keep)
    shutil.copytree(path + ".delta", keep + "/delta")
    shutil.copytree(path + ".tombstones", keep + "/ts")
    compact_ivf_sq8_store(spark, path)
    shutil.copytree(keep + "/delta", path + ".delta")
    shutil.copytree(keep + "/ts", path + ".tombstones")

    got = live_ivf_sq8_topk(spark, path, q, k=6, nprobe=NPROBE_ALL).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # a second compaction converges to the same clean state
    compact_ivf_sq8_store(spark, path)
    again = live_ivf_sq8_topk(spark, path, q, k=6, nprobe=NPROBE_ALL).toPandas()
    assert again.values.tolist() == want.values.tolist()


def test_guards(spark, store):
    emb, base, extra, path, centroids, model = store
    dup = extra.limit(1).unionByName(extra.limit(1))
    with pytest.raises(ValueError, match="duplicate ids"):
        upsert_ivf_sq8_store(spark, path, dup)
    assert upsert_ivf_sq8_store(spark, path, extra.limit(0)) == 0
    assert delete_from_ivf_sq8_store(spark, path, []) == 0
    q = emb.first()["embedding"]
    with pytest.raises(ValueError, match="rerank_source"):
        live_ivf_sq8_topk(spark, path, q, k=3, rerank=10)


def test_streaming_delta_upserts(spark, sf_dir, tmp_path):
    """Structured-Streaming ingestion through the delta segment
    (`streaming/incremental.incremental_ivf_sq8_index`): two drained
    micro-batch files land in the delta, live search sees them, the base
    is untouched, and a full REPLAY (fresh checkpoint over the same input)
    leaves the state byte-identical — the exactly-once effect."""
    from photo_vector_search_spark.streaming.incremental import (
        incremental_ivf_sq8_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "store")
    build_ivf_sq8_store(
        emb.filter(F.col("vec_id") < 400), path, n_clusters=NPROBE_ALL
    )
    base_files = set(os.listdir(path))

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    for lo, hi, name in ((400, 450, "b1"), (450, 500, "b2")):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(f"{inp}/{name}")

    q = incremental_ivf_sq8_index(
        spark, inp + "/*", path, str(tmp_path / "ckpt1")
    )
    q.awaitTermination()
    live, _, _ = load_live_ivf_sq8(spark, path)
    assert live.count() == 500
    assert set(os.listdir(path)) == base_files  # base untouched
    qv = emb.filter(F.col("vec_id") == 470).first()["embedding"]
    got = live_ivf_sq8_topk(spark, path, qv, k=1, nprobe=NPROBE_ALL).toPandas()
    assert got.vec_id.iloc[0] == 470

    state_before = sorted(
        tuple(r)
        for r in spark.read.parquet(path + ".delta")
        .select("vec_id", "label", "cluster_id", "build_id")
        .collect()
    )
    # replay: fresh checkpoint over the same input = every batch re-runs
    q2 = incremental_ivf_sq8_index(
        spark, inp + "/*", path, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    state_after = sorted(
        tuple(r)
        for r in spark.read.parquet(path + ".delta")
        .select("vec_id", "label", "cluster_id", "build_id")
        .collect()
    )
    assert state_after == state_before
    assert load_live_ivf_sq8(spark, path)[0].count() == 500


def test_upsert_keep_cols_must_match_base(spark, store):
    emb, base, extra, path, centroids, model = store
    with pytest.raises(ValueError, match="do not match the base"):
        upsert_ivf_sq8_store(spark, path, extra.limit(3), keep_cols=())


def test_cli_vector_index_lifecycle(spark, sf_dir, tmp_path, capsys):
    """`vector-index build/upsert/delete/search/compact` drives the whole
    lifecycle from the command line — the reference's index-photos/
    delete-photo loop on the engine's flagship store."""
    from photo_vector_search_spark.cli import main

    emb = load_table(spark, sf_dir, "embeddings")
    base_p = str(tmp_path / "base.parquet")
    extra_p = str(tmp_path / "extra.parquet")
    emb.filter(F.col("vec_id") < 450).write.parquet(base_p)
    emb.filter(F.col("vec_id") >= 450).write.parquet(extra_p)
    idx = str(tmp_path / "idx")

    assert main(["vector-index", "build", "--index", idx,
                 "--embeddings", base_p, "--clusters", "8"]) == 0
    assert "built IVF,SQ8 index" in capsys.readouterr().out
    assert main(["vector-index", "upsert", "--index", idx,
                 "--embeddings", extra_p]) == 0
    assert "upserted 50" in capsys.readouterr().out
    assert main(["vector-index", "search", "--index", idx,
                 "--embeddings", extra_p, "--query-id", "470",
                 "-k", "3", "--nprobe", "8"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].lstrip().startswith("1. vec 470")
    assert main(["vector-index", "delete", "--index", idx,
                 "--ids", "470"]) == 0
    capsys.readouterr()
    assert main(["vector-index", "search", "--index", idx,
                 "--embeddings", extra_p, "--query-id", "470",
                 "-k", "3", "--nprobe", "8"]) == 0
    assert "vec 470 " not in capsys.readouterr().out
    assert main(["vector-index", "compact", "--index", idx]) == 0
    assert "compacted to 499 live rows" in capsys.readouterr().out
    # a bad query id exits 2 with a message
    assert main(["vector-index", "search", "--index", idx,
                 "--embeddings", extra_p, "--query-id", "999999"]) == 2
