"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY §2.10; reference analogue: PIL decode → RGB → ≤1024px → PNG re-encode,
photo_vector_search.py:48-58).

All Spark-side plumbing (schemas, mapInPandas batch shapes, partitioning) is real
and tested. The *codec* work is behind ``_try_pillow()``: with Pillow installed
the real decode/resize runs; in this container (no image/audio libs) a
deterministic fake parses our synthetic ``FAKEIMG`` header instead, and genuinely
un-decodable bytes surface as error rows — never silent crashes of the batch.

Synthetic format (tests + fixtures): b"FAKEIMG:<width>x<height>:" + payload.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "path string, modality string, content binary, "
    "width int, height int, n_frames int, sample_rate int, error string"
)

_FAKE_HEADER = re.compile(rb"^FAKEIMG:(\d+)x(\d+):")


def _try_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def _decode_one(content: bytes, max_side: int) -> tuple[bytes, int, int, str]:
    """→ (normalized_content, width, height, error). Mirrors the reference's
    RGB + ≤max_side downscale + re-encode (photo_vector_search.py:48-58).

    The synthetic FAKEIMG header is checked FIRST — it can never be a real
    image, and routing it through an installed Pillow would turn every fixture
    into a decode_error the moment the CLIP backend (which pulls in PIL) is
    installed."""
    m = _FAKE_HEADER.match(content or b"")
    if m:
        w, h = int(m.group(1)), int(m.group(2))
        if max(w, h) > max_side:
            scale = max_side / max(w, h)
            w, h = int(w * scale), int(h * scale)
        return b"FAKEIMG:%dx%d:" % (w, h) + content[m.end() :], w, h, ""
    Image = _try_pillow()
    if Image is None:
        return b"", 0, 0, "decode_error: unrecognized format (no codec available)"
    import io

    try:
        img = Image.open(io.BytesIO(content)).convert("RGB")
        w, h = img.size
        if max(w, h) > max_side:
            scale = max_side / max(w, h)
            img = img.resize((int(w * scale), int(h * scale)))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue(), img.size[0], img.size[1], ""
    except Exception as e:  # undecodable → error row, batch continues
        return b"", 0, 0, f"decode_error: {e}"


def decode_images(files: DataFrame, max_side: int = 1024) -> DataFrame:
    """(path, content) → MEDIA_SCHEMA rows with decoded/resized image content.

    mapInPandas: Arrow-batched, no shuffle, model/codec state per worker. Error
    rows carry ``error`` non-empty and survive (counted, not dropped) — the
    engine's version of the reference's per-file failure tally (cli.py:58-61)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("path", "modality", "content", "width", "height", "n_frames", "sample_rate", "error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                norm, w, h, err = _decode_one(bytes(content or b""), max_side)
                out["path"].append(path)
                out["modality"].append("image")
                out["content"].append(norm)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(1)
                out["sample_rate"].append(0)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_decode, schema=MEDIA_SCHEMA)


def sample_video_frames(files: DataFrame, every_n: int = 30) -> DataFrame:
    """Video → one row per sampled frame. Real frame extraction needs a codec
    (not in this container) — the plumbing (explode to frame rows with
    frame_index, deterministic fake frames from the FAKEIMG payload) is real."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content or b"")
                m = _FAKE_HEADER.match(content)
                if not m:
                    rows.append((path, -1, b"", "decode_error: no codec for video"))
                    continue
                # fake: treat payload length as frame count proxy
                n_frames = max(1, len(content[m.end():]) // max(every_n, 1))
                for i in range(n_frames):
                    rows.append((path, i * every_n, content, ""))
            yield pd.DataFrame(rows, columns=["path", "frame_index", "frame", "error"])

    return files.select("path", "content").mapInPandas(
        _sample, schema="path string, frame_index int, frame binary, error string"
    )


def extract_audio_features(files: DataFrame, n_mfcc: int = 13) -> DataFrame:
    """Audio → fixed-width feature vector. STUB: no audio libs in this container;
    raises unless the input uses the synthetic format, from which deterministic
    pseudo-features are derived (so the Spark plumbing and schema are testable)."""
    import hashlib

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, feats, errs = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content or b"")
                if not content.startswith(b"FAKEAUDIO:"):
                    paths.append(path)
                    feats.append([0.0] * n_mfcc)
                    errs.append("decode_error: no audio codec available")
                    continue
                h = hashlib.md5(content).digest()
                feats.append([h[i % 16] / 255.0 for i in range(n_mfcc)])
                paths.append(path)
                errs.append("")
            yield pd.DataFrame({"path": paths, "features": feats, "error": errs})

    return files.select("path", "content").mapInPandas(
        _feat, schema="path string, features array<double>, error string"
    )


def media_stats(decoded: DataFrame) -> DataFrame:
    """Per-modality success/error tally — the engine's version of the reference's
    indexing summary (cli.py:51-66)."""
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error") == "", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("error") != "", 1).otherwise(0)).alias("failed"),
    )
