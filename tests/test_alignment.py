"""Image-text alignment (CLIP-score) gate: score parity vs an independent
NumPy composition of the same embedders, threshold/NULL semantics, stats
aggregation, partitioning invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.alignment import (
    alignment_stats,
    filter_aligned,
    image_text_alignment,
)
from photo_vector_search_spark.pipelines.embed import (
    Embedder,
    stub_embed_one,
    stub_embedder,
)


def _pairs(spark):
    rows = [
        # caption identical to the content string -> identical stub
        # embedding -> cosine exactly 1.0
        ("p0", b"sunset over the bay", "sunset over the bay"),
        ("p1", b"a dog on grass", "totally unrelated caption text"),
        ("p2", b"city skyline at night", "city skyline at night"),
        ("p3", b"random bytes payload", "another mismatched alt text"),
        ("p4", None, "caption with a null image"),
    ]
    return spark.createDataFrame(
        rows, "path string, content binary, caption string"
    )


def _decoding_embedder():
    """Test-local 'CLIP image tower' stand-in that projects the DECODED
    payload text — so a caption equal to the payload must score exactly
    1.0 (the two towers land on the same point)."""

    def make_fn():
        def embed(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: stub_embed_one(
                    "" if t is None else bytes(t).decode("utf-8")
                )
            )

        return embed

    return Embedder(dim=64, make_fn=make_fn)


def _ref_score(content, caption):
    a = np.array(
        stub_embed_one("" if content is None else content.decode("utf-8"))
    )
    b = np.array(stub_embed_one(caption))
    return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)


def test_score_matches_independent_composition(spark):
    pairs = _pairs(spark)
    img, txt = _decoding_embedder(), stub_embedder()
    got = {
        r["path"]: r["align_score"]
        for r in image_text_alignment(pairs, img, txt).collect()
    }
    want = {
        r["path"]: _ref_score(
            bytes(r["content"]) if r["content"] is not None else None,
            r["caption"],
        )
        for r in pairs.collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=2e-6), p
    # matched pairs land on the same embedding -> score 1.0 on the nose
    assert got["p0"] == pytest.approx(1.0, abs=1e-6)
    assert got["p2"] == pytest.approx(1.0, abs=1e-6)
    # mismatched pairs are near-orthogonal under the hash projection
    assert abs(got["p1"]) < 0.5 and abs(got["p3"]) < 0.5
    # the output schema is input + score only (no transient vector columns)
    out = image_text_alignment(pairs, img, txt)
    assert out.columns == ["path", "content", "caption", "align_score"]


def test_filter_threshold_and_keep_score(spark):
    pairs = _pairs(spark)
    img, txt = _decoding_embedder(), stub_embedder()
    kept = filter_aligned(pairs, img, txt, threshold=0.9).collect()
    assert sorted(r["path"] for r in kept) == ["p0", "p2"]
    assert all(r["align_score"] >= 0.9 for r in kept)
    bare = filter_aligned(pairs, img, txt, threshold=0.9, keep_score=False)
    assert bare.columns == ["path", "content", "caption"]
    # threshold 'keep everything scoreable': stub embeds of distinct
    # strings are near-orthogonal but finite, so -1.0 keeps all 5
    assert filter_aligned(pairs, img, txt, threshold=-1.0).count() == 5


def test_null_embedding_scores_null_and_is_dropped(spark):
    """An embedder that returns None (a real adapter's failed decode)
    yields a NULL score, and the gate drops the pair."""

    def make_fn():
        def embed(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: None if t is None else stub_embed_one(str(t))
            )

        return embed

    strict = Embedder(dim=64, make_fn=make_fn)
    pairs = _pairs(spark)
    scored = image_text_alignment(pairs, strict, strict)
    rows = {r["path"]: r["align_score"] for r in scored.collect()}
    assert rows["p4"] is None  # NULL image -> NULL embedding -> NULL score
    assert rows["p0"] is not None
    kept = filter_aligned(pairs, strict, strict, threshold=-1.0)
    assert sorted(r["path"] for r in kept.collect()) == [
        "p0", "p1", "p2", "p3"
    ]  # NULL never passes, even at the loosest threshold


def test_alignment_stats_one_row(spark):
    pairs = _pairs(spark)

    def img_fn():
        def embed(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: None
                if t is None
                else stub_embed_one(bytes(t).decode("utf-8"))
            )

        return embed

    strict_img = Embedder(dim=64, make_fn=img_fn)
    scored = image_text_alignment(pairs, strict_img, stub_embedder())
    stat = alignment_stats(scored, threshold=0.9).collect()
    assert len(stat) == 1
    row = stat[0]
    assert row["n_pairs"] == 5
    assert row["n_scored"] == 4  # p4 is unscoreable
    assert row["n_kept"] == 2  # the two caption==payload pairs
    assert row["max_score"] == pytest.approx(1.0, abs=1e-6)
    assert row["min_score"] < 0.9


def test_partitioning_invariance(spark):
    pairs = _pairs(spark)
    emb = stub_embedder()
    one = {
        r["path"]: r["align_score"]
        for r in image_text_alignment(
            pairs.coalesce(1), emb, emb
        ).collect()
    }
    many = {
        r["path"]: r["align_score"]
        for r in image_text_alignment(
            pairs.repartition(7), emb, emb
        ).collect()
    }
    assert one == many


def test_alignment_stats_all_null_shard_reports_zero_kept(spark):
    """A shard with zero scoreable pairs must report n_kept=0, not NULL
    (review finding: sum over all-NULL input is NULL)."""

    def make_fn():
        def embed(s: pd.Series) -> pd.Series:
            return s.map(lambda t: None)

        return embed

    broken = Embedder(dim=64, make_fn=make_fn)
    pairs = _pairs(spark)
    scored = image_text_alignment(pairs, broken, broken)
    row = alignment_stats(scored).collect()[0]
    assert row["n_scored"] == 0
    assert row["n_kept"] == 0
    assert row["mean_score"] is None
