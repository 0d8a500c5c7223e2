"""The CLIP adapter must run ONE stacked forward pass per Arrow batch (not one
per image — the reference's batch-size-1 defect, photo_vector_search.py:30-34),
while preserving per-row decode-error -> None semantics. Torch/clip/PIL aren't
in this container, so fakes stand in; the contract under test is call count and
output placement, which the fakes observe exactly."""

from __future__ import annotations

import contextlib
import io
import sys
import types

import numpy as np
import pandas as pd
import pytest

DIM = 4


class FakeTensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr, dtype=np.float64)

    def to(self, device):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.arr


class FakeImage:
    def __init__(self, seed: float):
        self.seed = seed

    def convert(self, mode):
        assert mode == "RGB"
        return self


def _install_fakes(monkeypatch, calls: list):
    torch = types.ModuleType("torch")
    torch.no_grad = contextlib.nullcontext
    torch.cuda = types.SimpleNamespace(is_available=lambda: False)
    torch.stack = lambda ts: FakeTensor(np.stack([t.arr for t in ts]))

    def load(name, device):
        def preprocess(img):
            return FakeTensor(np.full(DIM, img.seed))

        def encode_image(batch):
            calls.append(batch.arr.shape)
            return FakeTensor(batch.arr * 2.0)

        return types.SimpleNamespace(encode_image=encode_image), preprocess

    clip = types.ModuleType("clip")
    clip.load = load

    def image_open(bio: io.BytesIO):
        data = bio.getvalue()
        if data.startswith(b"BAD"):
            raise ValueError("corrupt image")
        return FakeImage(float(len(data)))

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = image_open
    pil.Image = pil_image

    for name, mod in [("torch", torch), ("clip", clip), ("PIL", pil), ("PIL.Image", pil_image)]:
        monkeypatch.setitem(sys.modules, name, mod)


def test_one_forward_per_batch_with_error_rows(monkeypatch):
    calls: list = []
    _install_fakes(monkeypatch, calls)
    from photo_vector_search_spark.pipelines.models import clip_embedder

    embed = clip_embedder(dim=DIM).make_fn()
    s = pd.Series([b"img-aa", b"BAD!!", b"img-bbbb", b"img-c"])
    out = embed(s)

    assert len(calls) == 1, f"expected ONE stacked forward, got {len(calls)}: {calls}"
    assert calls[0] == (3, DIM)  # only the 3 decodable rows enter the batch
    assert out[1] is None  # decode failure aborts only its row
    # outputs land on the right rows: encode doubles the per-image seed (= len)
    assert out[0] == [12.0] * DIM and out[2] == [16.0] * DIM and out[3] == [10.0] * DIM


def test_batched_outputs_match_per_row_reference(monkeypatch):
    """Values must be identical to embedding each image alone (the old path)."""
    calls: list = []
    _install_fakes(monkeypatch, calls)
    from photo_vector_search_spark.pipelines.models import clip_embedder

    embed = clip_embedder(dim=DIM).make_fn()
    imgs = [b"x" * n for n in (3, 9, 27)]
    batched = embed(pd.Series(imgs))
    singles = [embed(pd.Series([b]))[0] for b in imgs]
    assert list(batched) == singles
    assert calls[0] == (3, DIM) and all(c == (1, DIM) for c in calls[1:])


def test_all_rows_corrupt_skips_forward(monkeypatch):
    calls: list = []
    _install_fakes(monkeypatch, calls)
    from photo_vector_search_spark.pipelines.models import clip_embedder

    embed = clip_embedder(dim=DIM).make_fn()
    out = embed(pd.Series([b"BAD1", b"BAD2"]))
    assert calls == [] and list(out) == [None, None]


def test_constructor_still_errors_without_runtimes():
    from photo_vector_search_spark.pipelines.models import clip_embedder

    with pytest.raises(ImportError, match="torch"):
        clip_embedder()
