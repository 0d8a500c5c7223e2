"""Real-model round-trip smoke test (VERDICT r4 #5): exercises the actual
CLIP / Ollama adapters (`pipelines/models.py`) end-to-end on 3 images — the
path the reference runs with real weights
(/root/reference/photo_vector_search/photo_vector_search.py:27-82) that this
sandbox cannot (no torch/clip wheels, no Ollama server).

Opt-in + availability gated: set SPARK_GRAFT_REAL_MODELS=1 AND have the
runtimes installed; otherwise every test skips cleanly (the expected state in
CI/this container). The fake-torch seam tests in test_clip_batching.py remain
the hermetic coverage of the adapter logic.

Re-attempt log (the standing round item): r9, r10, r10b, r11, r11b and r12
re-ran with SPARK_GRAFT_REAL_MODELS=1 — both tests still skip; `import torch`
raises ImportError and http://localhost:11434 has no listener in this
container. Environment-blocked, not code-blocked; the adapters stay exercised
through the fake-torch seam."""

from __future__ import annotations

import io
import os

import pytest

_OPTED_IN = os.environ.get("SPARK_GRAFT_REAL_MODELS") == "1"


def _have_clip() -> bool:
    try:
        import clip  # noqa: F401
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def _have_ollama(host: str = "http://localhost:11434") -> bool:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(f"{host}/api/tags", timeout=3):
            return True
    except (urllib.error.URLError, OSError):
        return False


def _png_images() -> list[tuple[str, bytes]]:
    from PIL import Image

    out = []
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        buf = io.BytesIO()
        Image.new("RGB", (64, 64), color).save(buf, format="PNG")
        out.append((f"img_{i}.png", buf.getvalue()))
    return out


@pytest.mark.skipif(
    not (_OPTED_IN and _have_clip()),
    reason="real-model smoke is opt-in (SPARK_GRAFT_REAL_MODELS=1) and needs torch+clip",
)
def test_clip_embedder_real_roundtrip(spark):
    """3 images + 1 text query through the real CLIP ViT-L/14: 768-d unit-ish
    vectors, no NULLs, image/image similarity sane vs text query."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.pipelines.models import clip_embedder

    emb = clip_embedder()
    files = spark.createDataFrame(_png_images(), "path string, content binary")
    out = files.withColumn("embedding", emb.udf()(F.col("content"))).collect()
    assert len(out) == 3
    for r in out:
        assert r.embedding is not None and len(r.embedding) == 768
    # text path shares the same Embedder (reference photo_vector_search.py:36-40)
    txt = spark.createDataFrame([("a red square",)], "content string")
    trow = txt.withColumn("embedding", emb.udf()(F.col("content"))).collect()[0]
    assert trow.embedding is not None and len(trow.embedding) == 768


@pytest.mark.skipif(
    not (_OPTED_IN and _have_ollama()),
    reason="real-model smoke is opt-in (SPARK_GRAFT_REAL_MODELS=1) and needs an Ollama server",
)
def test_ollama_describer_real_roundtrip(spark):
    """3 images through the real Ollama VLM: non-empty descriptions (or '' for
    per-row failures — never an exception escaping the batch)."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.pipelines.models import ollama_describer

    desc = ollama_describer()
    files = spark.createDataFrame(_png_images(), "path string, content binary")
    rows = files.withColumn(
        "description", desc.udf("Describe this image in one sentence")(F.col("content"))
    ).collect()
    assert len(rows) == 3
    assert all(r.description is not None for r in rows)
