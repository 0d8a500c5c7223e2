"""Incremental MaxSim store maintenance (`operators/maxsim_maintenance`):
live-serve ≡ in-memory composition, delta-wins replace, tombstone delete +
revive, empty-text upsert refusal, cross-build refusal, compaction
identity + idempotence + crash simulation, and the clustered-store
variant (frozen-centroid assignment, probe filter through the union)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.late_interaction import (
    build_maxsim_store,
    load_maxsim_store,
    maxsim_search,
    maxsim_store_search,
)
from photo_vector_search_spark.operators.maxsim_maintenance import (
    compact_maxsim_store,
    delete_from_maxsim_store,
    live_maxsim_search,
    load_live_maxsim,
    upsert_maxsim_store,
)
from photo_vector_search_spark.sources.tables import load_table

QUERY = "quick brown fox"


def _base_docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )


def _new_docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130))
    )


def test_live_serve_equals_in_memory_composition(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    new = _new_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path)
    assert upsert_maxsim_store(spark, path, new) == 30
    for pf in (None, 40):
        got = live_maxsim_search(
            spark, path, QUERY, k=5, prefilter_n=pf
        ).collect()
        want = maxsim_search(
            base.unionByName(new), QUERY, k=5, prefilter_n=pf
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], pf


def test_delta_wins_delete_and_revive(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path)
    # replace doc 7's text: the delta row must shadow the base row
    repl = spark.createDataFrame(
        [(7, "quick brown fox quick brown fox")], "doc_id long, text string"
    )
    upsert_maxsim_store(spark, path, repl)
    top = live_maxsim_search(spark, path, QUERY, k=1).collect()
    assert top[0]["doc_id"] == 7  # exact triple match beats every real doc
    # delete: the id must disappear from the live view
    assert delete_from_maxsim_store(spark, path, [7]) == 1
    ids = {r["doc_id"] for r in live_maxsim_search(spark, path, QUERY, k=10).collect()}
    assert 7 not in ids
    # revive by re-upsert
    upsert_maxsim_store(spark, path, repl)
    top = live_maxsim_search(spark, path, QUERY, k=1).collect()
    assert top[0]["doc_id"] == 7


def test_empty_text_upsert_is_refused(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path)
    bad = spark.createDataFrame(
        [(1, "fine text"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no token matrix"):
        upsert_maxsim_store(spark, path, bad)
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        upsert_maxsim_store(spark, path, dup)


def test_cross_build_side_table_is_refused(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path)
    upsert_maxsim_store(spark, path, _new_docs(spark, sf_dir))
    delta = spark.read.parquet(path + ".delta")
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    snapshot_overwrite(
        delta.withColumn("build_id", F.lit("deadbeef")).localCheckpoint(
            eager=True
        ),
        path + ".delta",
    )
    with pytest.raises(ValueError, match="build"):
        load_live_maxsim(spark, path)


def test_compaction_identity_idempotence_and_crash_sim(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    new = _new_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path)
    upsert_maxsim_store(spark, path, new)
    delete_from_maxsim_store(spark, path, [3, 101])
    before = [
        tuple(r)
        for r in live_maxsim_search(spark, path, QUERY, k=8, prefilter_n=50).collect()
    ]
    # snapshot the side tables to simulate a crash restoring them later
    shutil.copytree(path + ".delta", str(tmp_path / "stale_delta"))
    shutil.copytree(path + ".tombstones", str(tmp_path / "stale_ts"))

    n = compact_maxsim_store(spark, path)
    toks, meta = load_maxsim_store(spark, path)  # sig check passes post-compact
    assert meta["n_docs"] == n == toks.count()
    import os

    assert not os.path.exists(path + ".delta")
    after = [
        tuple(r)
        for r in live_maxsim_search(spark, path, QUERY, k=8, prefilter_n=50).collect()
    ]
    assert after == before
    # deleted ids stay gone after folding
    assert 3 not in {t[0] for t in after}

    # crash sim: stale side tables reappear AFTER compaction — same stable
    # build id, rows already folded: the overlay must reproduce the
    # identical view, and a second compaction must converge
    shutil.copytree(str(tmp_path / "stale_delta"), path + ".delta")
    shutil.copytree(str(tmp_path / "stale_ts"), path + ".tombstones")
    overlay = [
        tuple(r)
        for r in live_maxsim_search(spark, path, QUERY, k=8, prefilter_n=50).collect()
    ]
    assert overlay == before
    n2 = compact_maxsim_store(spark, path)
    assert n2 == n
    again = [
        tuple(r)
        for r in live_maxsim_search(spark, path, QUERY, k=8, prefilter_n=50).collect()
    ]
    assert again == before


def test_clustered_store_maintenance_and_probe(spark, sf_dir, tmp_path):
    base = _base_docs(spark, sf_dir)
    new = _new_docs(spark, sf_dir)
    path = str(tmp_path / "store")
    build_maxsim_store(base, path, n_clusters=3)
    upsert_maxsim_store(spark, path, new)
    # delta rows were assigned against the FROZEN centroids
    delta = spark.read.parquet(path + ".delta")
    assert set(delta.select("cluster_id").toPandas()["cluster_id"]) <= {0, 1, 2}
    # full probe over the live view == unclustered live composition
    got = live_maxsim_search(
        spark, path, QUERY, k=5, prefilter_n=40, nprobe=3
    ).collect()
    want = maxsim_search(
        base.unionByName(new), QUERY, k=5, prefilter_n=40
    ).collect()
    assert [tuple(r)[:2] for r in got] == [tuple(r)[:2] for r in want]
    # compaction keeps the clustered layout + the same build id
    _, meta0 = load_maxsim_store(spark, path)
    compact_maxsim_store(spark, path)
    toks, meta = load_maxsim_store(spark, path)
    assert meta["build_id"] == meta0["build_id"]  # stable across compaction
    assert "cluster_id" in toks.columns
    served = maxsim_store_search(
        spark, path, QUERY, k=5, prefilter_n=40, nprobe=3
    ).collect()
    assert [tuple(r)[:2] for r in served] == [tuple(r)[:2] for r in want]


def test_streaming_maxsim_index_replay_identity(spark, sf_dir, tmp_path):
    """Structured-Streaming rung (`incremental_maxsim_index`): drained
    micro-batches land in the delta, live search sees them, the base is
    untouched, and a full REPLAY (fresh checkpoint over the same input)
    leaves the state byte-identical — the exactly-once effect; NULL and
    empty-text docs are dropped before the upsert."""
    import os

    from photo_vector_search_spark.streaming.incremental import (
        incremental_maxsim_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "store")
    build_maxsim_store(docs.filter(F.col("doc_id") < 400), path)
    base_files = set(os.listdir(path))

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)).coalesce(
        1
    ).write.parquet(f"{inp}/b1")
    # batch 2 carries a NULL-text row that must be dropped, not refused
    extra = docs.filter((F.col("doc_id") >= 450) & (F.col("doc_id") < 500))
    extra.unionByName(
        spark.createDataFrame([(99999, None)], "doc_id long, text string")
    ).coalesce(1).write.parquet(f"{inp}/b2")

    q = incremental_maxsim_index(spark, inp + "/*", path, str(tmp_path / "c1"))
    q.awaitTermination()
    live, _ = load_live_maxsim(spark, path)
    assert live.count() == 500  # 400 base + 100 streamed, NULL doc dropped
    assert set(os.listdir(path)) == base_files  # base untouched

    got = live_maxsim_search(spark, path, QUERY, k=5, prefilter_n=40).collect()
    want = maxsim_search(
        docs.filter(F.col("doc_id") < 500), QUERY, k=5, prefilter_n=40
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    state_before = sorted(
        (r["doc_id"], tuple(map(tuple, r["tok_embs"])))
        for r in spark.read.parquet(path + ".delta").collect()
    )
    q2 = incremental_maxsim_index(spark, inp + "/*", path, str(tmp_path / "c2"))
    q2.awaitTermination()
    state_after = sorted(
        (r["doc_id"], tuple(map(tuple, r["tok_embs"])))
        for r in spark.read.parquet(path + ".delta").collect()
    )
    assert state_after == state_before


def test_cli_colbert_index_lifecycle(spark, sf_dir, tmp_path, capsys):
    """`colbert-index build/upsert/search --live/delete/compact` drives the
    whole incremental lifecycle from the CLI, matching the vector-index
    command's shape."""
    from photo_vector_search_spark.cli import main

    docs_path = str(tmp_path / "docs.parquet")
    _base_docs(spark, sf_dir).write.parquet(docs_path)
    new_path = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(500, "quick brown fox quick brown fox")], "doc_id long, text string"
    ).write.parquet(new_path)
    idx = str(tmp_path / "idx")

    assert main(["colbert-index", "build", "--docs", docs_path,
                 "--index", idx]) == 0
    assert main(["colbert-index", "upsert", "--docs", new_path,
                 "--index", idx]) == 0
    assert "upserted 1 docs" in capsys.readouterr().out
    assert main(["colbert-index", "search", "--index", idx, "--live",
                 QUERY, "-k", "1"]) == 0
    assert "1. doc 500" in capsys.readouterr().out
    assert main(["colbert-index", "delete", "--index", idx,
                 "--ids", "500"]) == 0
    assert main(["colbert-index", "search", "--index", idx, "--live",
                 QUERY, "-k", "1"]) == 0
    assert "doc 500" not in capsys.readouterr().out
    assert main(["colbert-index", "compact", "--index", idx]) == 0
    assert "compacted to 100 live docs" in capsys.readouterr().out
    # post-compact static search serves the folded state
    assert main(["colbert-index", "search", "--index", idx, QUERY,
                 "-k", "2"]) == 0
    # nprobe on an unclustered store is a clean usage error
    assert main(["colbert-index", "search", "--index", idx, QUERY,
                 "--nprobe", "2"]) == 2
    assert "CLUSTERED" in capsys.readouterr().err


def test_cli_colbert_index_clustered_probe(spark, sf_dir, tmp_path, capsys):
    """`colbert-index build --clusters N` + `search --nprobe n` drive the
    PLAID layout from the CLI; full probe equals the flat store's answer."""
    from photo_vector_search_spark.cli import main

    docs_path = str(tmp_path / "docs.parquet")
    _base_docs(spark, sf_dir).write.parquet(docs_path)
    flat, clus = str(tmp_path / "flat"), str(tmp_path / "clus")
    assert main(["colbert-index", "build", "--docs", docs_path,
                 "--index", flat]) == 0
    assert main(["colbert-index", "build", "--docs", docs_path,
                 "--index", clus, "--clusters", "4"]) == 0
    capsys.readouterr()
    assert main(["colbert-index", "search", "--index", flat, QUERY,
                 "-k", "3", "--prefilter", "40"]) == 0
    want = capsys.readouterr().out
    assert main(["colbert-index", "search", "--index", clus, QUERY,
                 "-k", "3", "--prefilter", "40", "--nprobe", "4"]) == 0
    assert capsys.readouterr().out == want
    # narrow probe still serves
    assert main(["colbert-index", "search", "--index", clus, QUERY,
                 "-k", "3", "--prefilter", "40", "--nprobe", "1"]) == 0
