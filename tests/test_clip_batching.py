"""The CLIP adapter must run stacked forward passes per bounded chunk (not one
per image — the reference's batch-size-1 defect, photo_vector_search.py:30-34 —
and not one unbounded stack per 10k-row Arrow batch, which would OOM a GPU),
while preserving per-row decode-error -> None semantics, isolating forward-pass
failures to rows, and routing text queries through the text tower. Torch/clip/
PIL aren't in this container, so fakes stand in; the contract under test is
call count/shape and output placement, which the fakes observe exactly."""

from __future__ import annotations

import contextlib
import io
import sys
import types

import numpy as np
import pandas as pd
import pytest

DIM = 4
POISON = 666.0  # image seed whose tensor makes a STACKED forward raise


def _install_fakes(monkeypatch, calls: list, text_calls: list | None = None):
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

    torch = types.ModuleType("torch")
    torch.no_grad = contextlib.nullcontext
    torch.cuda = types.SimpleNamespace(is_available=lambda: False)
    torch.stack = lambda ts: FakeTensor(np.stack([t.arr for t in ts]))

    def load(name, device):
        def preprocess(img):
            return FakeTensor(np.full(DIM, img.seed))

        def encode_image(batch):
            calls.append(batch.arr.shape)
            if batch.arr.shape[0] > 1 and (batch.arr == POISON).any():
                raise RuntimeError("poisoned stacked forward")
            if (batch.arr == POISON).all():
                raise RuntimeError("poisoned row")
            return FakeTensor(batch.arr * 2.0)

        def encode_text(tok):
            if text_calls is not None:
                text_calls.append(tok.arr.shape)
            return FakeTensor(tok.arr * 3.0)

        model = types.SimpleNamespace(encode_image=encode_image, encode_text=encode_text)
        return model, preprocess

    clip = types.ModuleType("clip")
    clip.load = load
    clip.tokenize = lambda texts, truncate=False: FakeTensor(
        np.array([[float(len(t))] * DIM for t in texts])
    )

    def image_open(bio: io.BytesIO):
        data = bio.getvalue()
        if data.startswith(b"BAD"):
            raise ValueError("corrupt image")
        if data.startswith(b"POISON"):
            return FakeImage(POISON)
        return FakeImage(float(len(data)))

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = image_open
    pil.Image = pil_image

    for name, mod in [("torch", torch), ("clip", clip), ("PIL", pil), ("PIL.Image", pil_image)]:
        monkeypatch.setitem(sys.modules, name, mod)


def _embedder(**kw):
    from photo_vector_search_spark.pipelines.models import clip_embedder

    return clip_embedder(dim=DIM, **kw).make_fn()


def test_one_forward_per_batch_with_error_rows(monkeypatch):
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder()
    out = embed(pd.Series([b"img-aa", b"BAD!!", b"img-bbbb", b"img-c"]))

    assert len(calls) == 1, f"expected ONE stacked forward, got {len(calls)}: {calls}"
    assert calls[0] == (3, DIM)  # only the 3 decodable rows enter the batch
    assert out[1] is None  # decode failure aborts only its row
    # outputs land on the right rows: encode doubles the per-image seed (= len)
    assert out[0] == [12.0] * DIM and out[2] == [16.0] * DIM and out[3] == [10.0] * DIM


def test_forward_is_chunked_not_unbounded(monkeypatch):
    """A huge Arrow batch must NOT become one giant stacked tensor: forwards are
    bounded by forward_chunk (GPU activation memory bound)."""
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder(forward_chunk=2)
    out = embed(pd.Series([b"x" * n for n in (1, 2, 3, 4, 5)]))
    assert calls == [(2, DIM), (2, DIM), (1, DIM)]
    assert list(out) == [[2.0 * n] * DIM for n in (1, 2, 3, 4, 5)]


def test_chunk_forward_failure_isolates_to_rows(monkeypatch):
    """If a stacked forward raises (one bad tensor, transient CUDA error), the
    adapter falls back to per-row encodes: good rows still embed, only the bad
    row becomes None — the reference's abort-the-row semantics."""
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder()
    out = embed(pd.Series([b"img-aa", b"POISON", b"img-c"]))
    assert calls[0] == (3, DIM)  # stacked attempt
    assert sorted(c[0] for c in calls[1:]) == [1, 1, 1]  # per-row fallback
    assert out[0] == [12.0] * DIM and out[2] == [10.0] * DIM
    assert out[1] is None


def test_batched_outputs_match_per_row_reference(monkeypatch):
    """Values must be identical to embedding each image alone (the old path)."""
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder()
    imgs = [b"x" * n for n in (3, 9, 27)]
    batched = embed(pd.Series(imgs))
    singles = [embed(pd.Series([b]))[0] for b in imgs]
    assert list(batched) == singles
    assert calls[0] == (3, DIM) and all(c == (1, DIM) for c in calls[1:])


def test_text_queries_use_text_tower(monkeypatch):
    calls: list = []
    text_calls: list = []
    _install_fakes(monkeypatch, calls, text_calls)
    embed = _embedder()
    out = embed(pd.Series(["tractor in a field"]))
    assert calls == [] and text_calls == [(1, DIM)]
    assert out[0] == [float(len("tractor in a field")) * 3.0] * DIM


def test_all_rows_corrupt_skips_forward(monkeypatch):
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder()
    out = embed(pd.Series([b"BAD1", b"BAD2"]))
    assert calls == [] and list(out) == [None, None]


def test_constructor_still_errors_without_runtimes():
    from photo_vector_search_spark.pipelines.models import clip_embedder

    with pytest.raises(ImportError, match="torch"):
        clip_embedder()
