"""Streaming pHash image dedup: drained pairs must equal the BATCH
image_near_dup over the union corpus, re-deliveries contribute nothing,
changed content raises, undecodable rows register but never pair, and
compaction preserves the streamed≡batch parity."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.image_dedup import image_near_dup
from photo_vector_search_spark.streaming.images import (
    incremental_phash_dedup,
    read_image_pairs,
)


def _fake(w, h, payload: bytes) -> bytes:
    return b"FAKEIMG:%dx%d:" % (w, h) + payload


def _corpus(n=40, seed=2):
    """Images with planted near-dups: every 5th is a small perturbation of
    its predecessor; one undecodable row."""
    rng = np.random.RandomState(seed)
    rows = []
    payloads = {}
    for i in range(n):
        if i % 5 == 1 and i > 1:
            p = bytearray(payloads[i - 1])
            p[3] ^= 0x08
            payload = bytes(p)
        else:
            payload = bytes(rng.randint(0, 256, size=400, dtype=np.uint8))
        payloads[i] = payload
        rows.append((f"img{i:03d}", bytes(_fake(200, 100, payload))))
    rows.append(("imgBAD", b"not-an-image"))
    return rows


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def test_streamed_matches_batch_and_redelivery_noop(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "path string, content binary")
    expected = _pairs(image_near_dup(df, max_hamming=6))
    assert len(expected) > 0

    tmp = tempfile.mkdtemp(prefix="pvs_imgstream_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        num = F.expr("try_cast(substring(path, 4, 3) AS int)")
        half1 = df.filter(num % 2 == 0)
        half2 = df.join(half1, "path", "left_anti")

        half1.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        got1 = _pairs(read_image_pairs(spark, state))
        assert got1 <= expected  # only even-even pairs can exist yet

        half2.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        assert _pairs(read_image_pairs(spark, state)) == expected

        # identical re-delivery adds nothing
        half1.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)
        assert _pairs(read_image_pairs(spark, state)) == expected

        # registry holds every image exactly once (incl. the undecodable
        # one, with NULL phash), and the bad row never pairs
        reg = spark.read.parquet(f"{state}/images")
        assert reg.select("path").distinct().count() == len(rows)
        assert reg.filter("path = 'imgBAD'").first()["phash"] is None
        assert all("imgBAD" not in p[:2] for p in expected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_changed_content_raises_identical_passes(spark):
    rows = _corpus(n=10)
    df = spark.createDataFrame(rows, "path string, content binary")
    tmp = tempfile.mkdtemp(prefix="pvs_imgclash_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        df.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        assert q.awaitTermination(600)

        changed = spark.createDataFrame(
            [("img003", bytes(_fake(200, 100, b"\x01" * 400)))],
            "path string, content binary",
        )
        changed.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        with pytest.raises(Exception, match="DIFFERENT content"):
            q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_in_batch_clash_raises(spark):
    tmp = tempfile.mkdtemp(prefix="pvs_imginbatch_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        dup = spark.createDataFrame(
            [
                ("imgX", bytes(_fake(10, 10, b"aaaa"))),
                ("imgX", bytes(_fake(10, 10, b"bbbb"))),
            ],
            "path string, content binary",
        )
        dup.write.mode("append").parquet(in_dir)
        q = incremental_phash_dedup(spark, in_dir, state, ckpt)
        with pytest.raises(Exception, match="ONE\\s+micro-batch|ONE micro-batch"):
            q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_preserves_parity(spark):
    from photo_vector_search_spark.streaming.compaction import (
        compact_dedup_state,
        load_manifest,
    )

    rows = _corpus(n=30)
    df = spark.createDataFrame(rows, "path string, content binary")
    expected = _pairs(image_near_dup(df, max_hamming=6))
    tmp = tempfile.mkdtemp(prefix="pvs_imgcompact_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        num = F.expr("try_cast(substring(path, 4, 3) AS int)")
        thirds = [df.filter(num % 3 == m) for m in (0, 1)] + [
            df.filter(num.isNull() | (num % 3 == 2))
        ]
        for i, part in enumerate(thirds):
            part.write.mode("append").parquet(in_dir)
            q = incremental_phash_dedup(spark, in_dir, state, ckpt)
            assert q.awaitTermination(600)
            if i == 1:
                # stream stopped between batches: fold committed state
                summary = compact_dedup_state(
                    spark, state, kind="phash", keep_latest=False
                )
                assert summary["compacted"]
                assert load_manifest(state) is not None
        assert _pairs(read_image_pairs(spark, state)) == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_band_layout_guard(spark, tmp_path):
    """Persisted band state is keyed by the band LAYOUT: an unstamped
    pre-existing state (pre-interleaving) and a stamped-but-mismatched one
    are both refused loudly; a fresh state gets the marker."""
    import json
    import os

    import pytest

    from photo_vector_search_spark.streaming.compaction import (
        BANDING_MARKER,
        check_band_layout,
    )

    fresh = str(tmp_path / "fresh")
    check_band_layout(fresh, "ibands", 8)
    assert os.path.exists(f"{fresh}/{BANDING_MARKER}")
    check_band_layout(fresh, "ibands", 8)  # idempotent
    with pytest.raises(ValueError, match="incompatible"):
        check_band_layout(fresh, "ibands", 16)  # n_bands mismatch

    legacy = str(tmp_path / "legacy" )
    os.makedirs(f"{legacy}/ibands/batch_id=0")
    with pytest.raises(ValueError, match="predates"):
        check_band_layout(legacy, "ibands", 8)

    # families are independent: an image stream (ibands) and an audio
    # stream (abands) sharing one state_path may use different n_bands
    # without tripping each other's guard (r8 ADVICE finding)
    shared = str(tmp_path / "shared")
    check_band_layout(shared, "ibands", 8)
    check_band_layout(shared, "abands", 12)  # must NOT raise
    check_band_layout(shared, "ibands", 8)  # still idempotent per family
    with pytest.raises(ValueError, match="incompatible"):
        check_band_layout(shared, "abands", 16)  # per-family mismatch

    # pre-r9 flat marker: claimed by the first family that reads it, then
    # migrated to the keyed form so later families stamp independently
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    with open(f"{flat}/{BANDING_MARKER}", "w") as f:
        json.dump({"layout": "interleaved-v1", "n_bands": 8}, f)
    check_band_layout(flat, "ibands", 8)
    with open(f"{flat}/{BANDING_MARKER}") as f:
        migrated = json.load(f)
    assert migrated == {"ibands": {"layout": "interleaved-v1", "n_bands": 8}}
    check_band_layout(flat, "abands", 12)  # new family stamps alongside


def test_completeness_guard_rejects_uncoverable_threshold(spark):
    import pytest

    from photo_vector_search_spark.operators.image_dedup import hamming_pairs
    from photo_vector_search_spark.streaming.images import (
        incremental_phash_dedup,
    )

    df = spark.createDataFrame([("p", 1)], "path string, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_pairs(df, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="pigeonhole"):
        incremental_phash_dedup(spark, "/tmp/x", "/tmp/y", "/tmp/z",
                                max_hamming=9, n_bands=8)


def test_band_layout_legacy_marker_goes_to_stamping_family(spark, tmp_path):
    """A pre-r9 flat marker migrates to the family that HAS state, not to
    whichever family checks first (review finding): a brand-new family with
    a different n_bands must pass, and the stamping family's record must
    survive that other family's check."""
    import json
    import os

    import pytest

    from photo_vector_search_spark.streaming.compaction import (
        BANDING_MARKER,
        check_band_layout,
    )

    root = str(tmp_path / "legacy_owner")
    os.makedirs(f"{root}/ibands/batch_id=0")  # ibands is the stamping family
    with open(f"{root}/{BANDING_MARKER}", "w") as f:
        json.dump({"layout": "interleaved-v1", "n_bands": 8}, f)

    # a NEW family with different n_bands checks FIRST — must not claim the
    # flat record and must stamp its own
    check_band_layout(root, "abands", 12)
    # ...and the stamping family's protection is intact afterwards
    check_band_layout(root, "ibands", 8)
    with pytest.raises(ValueError, match="incompatible"):
        check_band_layout(root, "ibands", 16)
    with open(f"{root}/{BANDING_MARKER}") as f:
        rec = json.load(f)
    assert rec["ibands"]["n_bands"] == 8
    assert rec["abands"]["n_bands"] == 12
