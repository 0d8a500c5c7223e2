"""Streaming-state compaction: folding batch partitions into the
bucket-partitioned base must preserve every stream contract (completeness
parity, re-delivery no-op, changed-content clash), physically prune base
reads to touched prefixes, and survive its own crash window."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import (
    minhash_lsh_pairs,
    srp_lsh_near_dup_pairs,
)
from photo_vector_search_spark.sources.tables import load_table
from photo_vector_search_spark.streaming.compaction import (
    base_dir,
    compact_dedup_state,
    load_manifest,
    read_state_family,
    state_batches,
)
from photo_vector_search_spark.streaming.incremental import (
    incremental_lsh_dedup,
    incremental_srp_dedup,
    read_dedup_pairs,
    read_srp_pairs,
)

SRP_PARAMS = dict(tau=0.45, n_planes=6, n_tables=16, seed=42)


def _pairs(df, a="doc_a", b="doc_b", v="jaccard"):
    return {(r[a], r[b], r[v]) for r in df.collect()}


def _drain_lsh(spark, df, in_dir, state, ckpt):
    df.write.mode("append").parquet(in_dir)
    q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
    assert q.awaitTermination(600)


def test_lsh_compaction_preserves_stream_contracts(spark, sf_dir, monkeypatch):
    # force the pruned-probe read path even on this tiny base — the size
    # gate (PRUNE_MIN_BASE_BYTES) would otherwise fall back to full scans
    from photo_vector_search_spark.streaming import incremental as inc

    monkeypatch.setattr(inc, "PRUNE_MIN_BASE_BYTES", 0)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = _pairs(minhash_lsh_pairs(docs, n=3, tau=0.5))

    tmp = tempfile.mkdtemp(prefix="pvs_compact_lsh_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        third = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
        _drain_lsh(spark, third[0], in_dir, state, ckpt)
        _drain_lsh(spark, third[1], in_dir, state, ckpt)

        # compact the fully-committed prefix (keep_latest leaves batch 1)
        summary = compact_dedup_state(spark, state, "lsh", n_prefixes=16)
        assert summary["compacted"] == [0]
        assert state_batches(state, "bands") == {1}
        assert os.path.isdir(base_dir(state, summary["base_id"], "bands"))

        # stream continues over the compacted base: completeness holds
        _drain_lsh(spark, third[2], in_dir, state, ckpt)
        assert _pairs(read_dedup_pairs(spark, state)) == expected

        # re-delivery of COMPACTED docs is still a no-op (registry base)
        _drain_lsh(spark, third[0], in_dir, state, ckpt)
        assert _pairs(read_dedup_pairs(spark, state)) == expected
        reg = read_state_family(spark, state, "docs", current_batch=10**6)
        assert reg.select("doc_id").distinct().count() == docs.count()
        assert reg.count() == docs.count()  # exactly once, base + deltas

        # changed content of a COMPACTED doc still raises (fingerprint base)
        import pytest

        third[0].withColumn("text", F.concat(F.col("text"), F.lit("X"))).write.mode(
            "append"
        ).parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
            raise AssertionError("clash not detected through compacted base")
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_srp_compaction_preserves_parity(spark, sf_dir, monkeypatch):
    from photo_vector_search_spark.streaming import incremental as inc

    monkeypatch.setattr(inc, "PRUNE_MIN_BASE_BYTES", 0)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    expected = _pairs(
        srp_lsh_near_dup_pairs(emb, **SRP_PARAMS), "vec_a", "vec_b", "sim"
    )

    tmp = tempfile.mkdtemp(prefix="pvs_compact_srp_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        halves = [
            emb.filter(F.col("vec_id") % 2 == k).withColumn("label", F.lit(0))
            for k in range(2)
        ]
        halves[0].write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **SRP_PARAMS)
        assert q.awaitTermination(600)

        summary = compact_dedup_state(
            spark, state, "srp", n_prefixes=16, keep_latest=False
        )
        assert summary["compacted"] == [0]
        assert state_batches(state, "buckets") == set()

        halves[1].write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **SRP_PARAMS)
        assert q.awaitTermination(600)
        assert _pairs(read_srp_pairs(spark, state), "vec_a", "vec_b", "sim") == expected
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_compacted_base_read_is_partition_pruned(spark, sf_dir):
    """The point of the base layout: a probe that touches few prefixes must
    physically read ONLY those pfx directories."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="pvs_compact_prune_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        _drain_lsh(spark, docs, in_dir, state, ckpt)
        summary = compact_dedup_state(
            spark, state, "lsh", n_prefixes=16, keep_latest=False
        )
        assert summary["compacted"] == [0]

        def _files_read(df) -> int:
            # runtime FileSourceScan metrics (inputFiles() reflects the file
            # index BEFORE partition pruning; executed-plan metrics are the
            # truth — same mechanism as tools/ivf_pruning_scan.py)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan()
            try:
                plan = plan.executedPlan()
            except Exception:
                pass
            total = 0
            leaves = plan.collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                if "FileSourceScan" in leaf.getClass().getName():
                    m = leaf.metrics()
                    if m.contains("numFiles"):
                        total += m.apply("numFiles").value()
            return total

        pruned = read_state_family(
            spark, state, "shingles", current_batch=10**6, pfx_values=[3, 7]
        )
        full = read_state_family(spark, state, "shingles", current_batch=10**6)
        n_pruned, n_full = _files_read(pruned), _files_read(full)
        assert 0 < n_pruned < n_full, (n_pruned, n_full)
        assert n_pruned <= n_full * 2 / 16 + 1  # ~2 of 16 prefixes touched
        # pruning is transparent: pruned rows == full rows restricted to pfx
        from photo_vector_search_spark.streaming.compaction import pfx_col

        want = full.filter(pfx_col("shingles", 16).isin([3, 7])).count()
        assert pruned.count() == want
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_small_base_skips_prefix_pruning(spark, sf_dir):
    """Below PRUNE_MIN_BASE_BYTES the touched-prefix driver job is skipped
    (pfx=None → full base scan): at tiny scale the extra job costs more than
    the scan it would avoid, and the manifest now carries the per-family
    bytes that decide this."""
    from photo_vector_search_spark.streaming.incremental import _touched_pfx

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_gate_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        _drain_lsh(spark, docs, in_dir, state, ckpt)
        compact_dedup_state(spark, state, "lsh", n_prefixes=8, keep_latest=False)
        mani = load_manifest(state)
        assert 0 < mani["bytes"]["bands"] < 256 * 1024 * 1024
        probe = docs.select("doc_id")
        assert _touched_pfx(probe, "docs", mani) is None  # gate: skip the job
        # a big-enough base DOES collect prefixes
        big = dict(mani, bytes={**mani["bytes"], "docs": 1 << 40})
        got = _touched_pfx(probe, "docs", big)
        assert got is not None and 0 < len(got) <= mani["n_prefixes"]
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_crash_window_no_double_count(spark, sf_dir):
    """Crash between manifest commit and cleanup: a compacted batch dir that
    was never deleted must be skipped by readers (manifest is authoritative),
    never double-counted."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_crash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        _drain_lsh(spark, docs, in_dir, state, ckpt)
        before = read_state_family(spark, state, "docs", current_batch=10**6).count()

        # snapshot the batch-0 docs partition, compact, then "un-delete" it
        saved = f"{tmp}/saved_docs_b0"
        shutil.copytree(f"{state}/docs/batch_id=0", saved)
        compact_dedup_state(spark, state, "lsh", n_prefixes=8, keep_latest=False)
        shutil.copytree(saved, f"{state}/docs/batch_id=0")

        after = read_state_family(spark, state, "docs", current_batch=10**6)
        assert after.count() == before  # stale dir is inert, not double-counted
        assert load_manifest(state)["compacted"] == [0]
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_refuses_legacy_state(spark, sf_dir):
    """Pre-registry state (bands without docs partitions) must be refused —
    folding away legacy bands would let re-delivered legacy docs re-enter."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_legacy_")
    state = f"{tmp}/state"
    try:
        from photo_vector_search_spark.operators.dedup import (
            _bands_from_wide,
            _wide_signatures,
            shingle_sets,
        )

        sh = shingle_sets(docs, 3)
        sh.write.mode("overwrite").parquet(f"{state}/shingles/batch_id=0")
        _bands_from_wide(_wide_signatures(sh)).write.mode("overwrite").parquet(
            f"{state}/bands/batch_id=0"
        )
        with pytest.raises(ValueError, match="legacy"):
            compact_dedup_state(spark, state, "lsh", keep_latest=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_crashed_final_attempt_is_not_misdiagnosed_as_legacy(spark, sf_dir):
    """A crash between the bands and docs writes of the FINAL batch leaves
    bands/batch_id=K without docs/batch_id=K. keep_latest=True exists
    exactly for that attempt — the legacy check must excuse it and compact
    the committed prefix."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_crashfinal_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        _drain_lsh(spark, docs.filter(F.col("doc_id") % 2 == 0), in_dir, state, ckpt)
        _drain_lsh(spark, docs.filter(F.col("doc_id") % 2 == 1), in_dir, state, ckpt)
        shutil.rmtree(f"{state}/docs/batch_id=1")  # simulate the crash window
        summary = compact_dedup_state(spark, state, "lsh", n_prefixes=8)
        assert summary["compacted"] == [0]
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_srp_compaction_refuses_pre_fingerprint_state(spark, sf_dir):
    """Legacy SRP vectors state (no fp column) must be refused: folding it
    would build a base whose schema diverges from later deltas."""
    import pytest

    from photo_vector_search_spark.operators.dedup import srp_bucket_rows, srp_planes

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(50)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_srplegacy_")
    state = f"{tmp}/state"
    try:
        dim = len(emb.first()["embedding"])
        planes = spark.sparkContext.broadcast(
            __import__(
                "photo_vector_search_spark.operators.dedup", fromlist=["srp_planes"]
            ).srp_planes(dim, n_planes=6, n_tables=4, seed=42)
        )
        srp_bucket_rows(emb, planes).write.mode("overwrite").parquet(
            f"{state}/buckets/batch_id=0"
        )
        emb.write.mode("overwrite").parquet(f"{state}/vectors/batch_id=0")  # no fp
        with pytest.raises(ValueError, match="fingerprint"):
            compact_dedup_state(spark, state, "srp", keep_latest=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_orphaned_base_dirs_are_swept(spark, sf_dir):
    """_base_ dirs not named by the manifest (crash leftovers in the
    write->commit->cleanup window) are reaped at the next compaction."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    tmp = tempfile.mkdtemp(prefix="pvs_compact_orphan_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        _drain_lsh(spark, docs.filter(F.col("doc_id") % 2 == 0), in_dir, state, ckpt)
        orphan = os.path.join(state, "_base_deadbeef0000")
        os.makedirs(os.path.join(orphan, "bands"))
        summary = compact_dedup_state(spark, state, "lsh", keep_latest=False)
        assert not os.path.exists(orphan)
        assert os.path.isdir(base_dir(state, summary["base_id"], "bands"))
        # the LIVE base survives the next sweep
        _drain_lsh(spark, docs.filter(F.col("doc_id") % 2 == 1), in_dir, state, ckpt)
        compact_dedup_state(spark, state, "lsh", keep_latest=False)
        assert load_manifest(state)["compacted"] == [0, 1]
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_in_batch_conflicting_content_raises(spark):
    """The same doc_id twice in ONE micro-batch with different text must
    raise (the in-batch twin of the fingerprint-registry clash) instead of
    letting dropDuplicates pick a nondeterministic winner."""
    import pytest

    tmp = tempfile.mkdtemp(prefix="pvs_inbatch_clash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        spark.createDataFrame(
            [(1, "version one"), (1, "version two"), (2, "fine")],
            "doc_id long, text string",
        ).write.mode("append").parquet(in_dir)
        q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
            raise AssertionError("in-batch clash not detected")
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_in_batch_null_embedding_clash_raises(spark):
    """A NULL embedding must not hide an in-batch clash: to_json(NULL) is
    NULL and count_distinct skips NULLs, so the fingerprint coalesces to a
    sentinel — (id, NULL) + (id, real vector) in one batch raises."""
    import pytest

    tmp = tempfile.mkdtemp(prefix="pvs_inbatch_nullclash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        spark.createDataFrame(
            [(7, None), (7, [0.1, 0.2, 0.3]), (8, [0.3, 0.2, 0.1])],
            "vec_id long, embedding array<float>",
        ).withColumn("label", F.lit(0)).write.mode("append").parquet(in_dir)
        q = incremental_srp_dedup(spark, in_dir, state, ckpt, **SRP_PARAMS)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
            raise AssertionError("NULL-embedding clash not detected")
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)
