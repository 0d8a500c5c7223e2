"""Streaming audio dedup: drained track pairs must equal the BATCH
audio_near_dup over the union corpus, re-deliveries contribute nothing,
changed content raises, undecodable tracks register but never pair, and
compaction preserves the streamed≡batch parity."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.audio_dedup import audio_near_dup
from photo_vector_search_spark.streaming.audio import (
    incremental_audio_dedup,
    read_audio_pairs,
)


def _fake(payload: bytes) -> bytes:
    return b"FAKEAUDIO:" + payload


def _corpus(n=24, seed=4):
    """Tracks with planted near-dups: every 4th is a one-byte perturbation
    of its predecessor; one undecodable row."""
    rng = np.random.RandomState(seed)
    rows = []
    payloads = {}
    for i in range(n):
        if i % 4 == 1 and i > 1:
            p = bytearray(payloads[i - 1])
            p[5] = (p[5] + 1) % 256
            payload = bytes(p)
        else:
            payload = bytes(rng.randint(0, 256, size=80, dtype=np.uint8))
        payloads[i] = payload
        rows.append((f"trk{i:03d}", bytes(_fake(payload))))
    rows.append(("trkBAD", b"not-audio-at-all"))
    return rows


def _pairs(df):
    return {
        (r["track_a"], r["track_b"], r["n_shared_frames"]) for r in df.collect()
    }


def test_streamed_matches_batch_and_redelivery_noop(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "path string, content binary")
    expected = _pairs(audio_near_dup(df, max_hamming=6))
    assert len(expected) > 0

    tmp = tempfile.mkdtemp(prefix="pvs_audstream_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        num = F.expr("try_cast(substring(path, 4, 3) AS int)")
        half1 = df.filter(num % 2 == 0)
        half2 = df.join(half1, "path", "left_anti")

        half1.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        got1 = _pairs(read_audio_pairs(spark, state))
        assert got1 <= expected  # only even-even pairs can exist yet

        half2.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        assert _pairs(read_audio_pairs(spark, state)) == expected

        # identical re-delivery adds nothing
        half1.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        assert _pairs(read_audio_pairs(spark, state)) == expected

        # registry holds every track exactly once (incl. the undecodable
        # one, with 0 frames), and the bad row never pairs
        reg = spark.read.parquet(f"{state}/atracks")
        assert reg.select("path").distinct().count() == len(rows)
        assert reg.filter("path = 'trkBAD'").first()["n_frames"] == 0
        assert all("trkBAD" not in p[:2] for p in expected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_changed_content_raises_identical_passes(spark):
    rows = _corpus(n=8)
    df = spark.createDataFrame(rows, "path string, content binary")
    tmp = tempfile.mkdtemp(prefix="pvs_audclash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        df.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)

        changed = spark.createDataFrame(
            [("trk003", bytes(_fake(b"\x07" * 80)))],
            "path string, content binary",
        )
        changed.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_in_batch_clash_raises(spark):
    tmp = tempfile.mkdtemp(prefix="pvs_audinbatch_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        dup = spark.createDataFrame(
            [
                ("trkX", bytes(_fake(b"aaaa" * 20))),
                ("trkX", bytes(_fake(b"bbbb" * 20))),
            ],
            "path string, content binary",
        )
        dup.write.mode("append").parquet(in_dir)
        q = incremental_audio_dedup(spark, in_dir, state, ckpt)
        with pytest.raises(Exception, match="ONE\\s+micro-batch|ONE micro-batch"):
            q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_preserves_parity(spark):
    from photo_vector_search_spark.streaming.compaction import (
        compact_dedup_state,
        load_manifest,
    )

    rows = _corpus(n=18)
    df = spark.createDataFrame(rows, "path string, content binary")
    expected = _pairs(audio_near_dup(df, max_hamming=6))
    tmp = tempfile.mkdtemp(prefix="pvs_audcompact_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        num = F.expr("try_cast(substring(path, 4, 3) AS int)")
        thirds = [df.filter(num % 3 == m) for m in (0, 1)] + [
            df.filter(num.isNull() | (num % 3 == 2))
        ]
        for i, part in enumerate(thirds):
            part.write.mode("append").parquet(in_dir)
            q = incremental_audio_dedup(spark, in_dir, state, ckpt)
            assert q.awaitTermination(600)
            if i == 1:
                # stream stopped between batches: fold committed state
                summary = compact_dedup_state(
                    spark, state, kind="audio", keep_latest=False
                )
                assert summary["compacted"]
                assert load_manifest(state) is not None
        assert _pairs(read_audio_pairs(spark, state)) == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
