"""Photo-corpus curation: exact → decode gate → perceptual → semantic
dedup ladder over FAKEIMG fixtures, stage contracts, and the
feeds-index_photos round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd

from photo_vector_search_spark.pipelines.photo_curation import curate_photos


def _fake(payload: bytes, w=64, h=32) -> bytes:
    return b"FAKEIMG:%dx%d:" % (w, h) + payload


def _corpus(spark):
    rng = np.random.RandomState(9)
    pays = {}

    def pay(i):
        if i not in pays:
            pays[i] = bytes(rng.randint(0, 256, size=300, dtype=np.uint8))
        return pays[i]

    rows = [
        ("a/p0.img", _fake(pay(0))),
        ("b/p0_copy.img", _fake(pay(0))),       # exact dup of p0 (larger path)
        ("a/p1.img", _fake(pay(1))),
        ("a/p1_near.img", _fake(bytes(bytearray(pay(1))[:7]) + bytes([pay(1)[7] ^ 0x04]) + pay(1)[8:])),  # near-dup of p1
        ("a/p2.img", _fake(pay(2))),
        ("z/broken.img", b"not an image"),       # undecodable
    ]
    return spark.createDataFrame(rows, "path string, content binary")


def test_ladder_counts_and_survivors(spark):
    files = _corpus(spark)
    curated, stats = curate_photos(files)
    got = {r["path"] for r in curated.select("path").collect()}
    # exact dup keeps lexically-first; near-dup keeps first; broken dropped
    assert got == {"a/p0.img", "a/p1.img", "a/p2.img"}
    assert stats["input"] == 6
    assert stats["after_exact_dedup"] == 5
    assert stats["after_decode_gate"] == 4
    assert stats["after_phash_dedup"] == 3
    assert "after_semantic_dedup" not in stats
    # content column passes through intact
    row = curated.filter("path = 'a/p2.img'").first()
    assert bytes(row["content"]).startswith(b"FAKEIMG:")


def test_semantic_stage_with_custom_embedder(spark):
    from photo_vector_search_spark.pipelines.embed import Embedder

    # planted semantic groups: payload byte 0 names the group; different
    # contents in one group embed to the same direction (cos = 1)
    def make_fn():
        def embed(s: pd.Series) -> pd.Series:
            def one(content):
                b = bytes(content)
                g = b[b.index(b":", 8) + 1] % 4  # first payload byte
                v = [0.0] * 8
                v[g] = 1.0
                return v

            return s.map(one)

        return embed

    # random payloads: perceptually unrelated (no pHash pairs), semantically
    # grouped only by the planted first byte
    rng = np.random.RandomState(3)
    rows = [
        ("g1/a.img", _fake(bytes([1]) + bytes(rng.randint(0, 256, 200, dtype=np.uint8)))),
        ("g1/b.img", _fake(bytes([1]) + bytes(rng.randint(0, 256, 200, dtype=np.uint8)))),
        ("g2/a.img", _fake(bytes([2]) + bytes(rng.randint(0, 256, 200, dtype=np.uint8)))),
    ]
    files = spark.createDataFrame(rows, "path string, content binary")
    curated, stats = curate_photos(
        files, tau=0.99, embedder=Embedder(dim=8, make_fn=make_fn), n_clusters=2
    )
    got = {r["path"] for r in curated.select("path").collect()}
    assert got == {"g1/a.img", "g2/a.img"}
    assert stats["after_phash_dedup"] == 3  # unrelated payloads: no phash pairs
    assert stats["after_semantic_dedup"] == 2


def test_curated_feeds_index_photos(spark):
    from photo_vector_search_spark.pipelines.embed import index_photos

    curated, _ = curate_photos(_corpus(spark), compute_stats=False)
    store = index_photos(curated, existing=None)
    rows = store.collect()
    assert {r["photo_path"] for r in rows} == {
        "a/p0.img", "a/p1.img", "a/p2.img"
    }
    assert all(r["embedding"] is not None for r in rows)


def test_decode_gate_opt_out_keeps_undecodable(spark):
    rows = [
        ("a/x.img", _fake(bytes(np.random.RandomState(1).randint(0, 256, 200, dtype=np.uint8)))),
        ("z/raw.bin", b"IMAGE:raw-bytes"),
    ]
    files = spark.createDataFrame(rows, "path string, content binary")
    kept, stats = curate_photos(files, decode_gate=False)
    assert {r["path"] for r in kept.collect()} == {"a/x.img", "z/raw.bin"}
    assert "after_decode_gate" not in stats


def test_cli_index_photos_dedup_flag(spark, capsys):
    import shutil
    import tempfile

    from photo_vector_search_spark.cli import main

    tmp = tempfile.mkdtemp(prefix="pvs_cli_dedup_")
    photos, store = f"{tmp}/photos", f"{tmp}/store"
    import os

    os.makedirs(photos)
    rng = np.random.RandomState(7)
    pay = bytes(rng.randint(0, 256, 200, dtype=np.uint8))
    for name, content in (
        ("a.jpg", _fake(pay)),
        ("a_copy.jpg", _fake(pay)),          # exact duplicate
        ("b.jpg", _fake(bytes(rng.randint(0, 256, 200, dtype=np.uint8)))),
    ):
        with open(f"{photos}/{name}", "wb") as f:
            f.write(content)
    try:
        assert main(
            ["index-photos", "--photo-dir", photos, "--store", store, "--dedup"]
        ) == 0
        out = capsys.readouterr().out
        assert "dedup: input=3" in out
        assert "indexed 2 files" in out
        assert spark.read.parquet(store).count() == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
