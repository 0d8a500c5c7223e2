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
from pyspark.sql import functions as F

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
        # a bare ModuleType has __spec__ = None, and importlib.util.find_spec
        # RAISES on that for an already-imported module — pyspark probes
        # find_spec("torch") lazily (e.g. state.update -> pyspark.testing
        # import), so a spec-less fake poisons any code path that probes it
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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


def test_default_forward_chunk_is_128(monkeypatch):
    """The documented GPU-activation bound: an Arrow batch of 130 images becomes
    exactly one 128-stack + one 2-stack forward under the DEFAULT chunk."""
    from photo_vector_search_spark.pipelines.models import CLIP_FORWARD_CHUNK

    assert CLIP_FORWARD_CHUNK == 128
    calls: list = []
    _install_fakes(monkeypatch, calls)
    embed = _embedder()  # default forward_chunk
    out = embed(pd.Series([b"i" * (n + 1) for n in range(130)]))
    assert calls == [(128, DIM), (2, DIM)]
    assert list(out) == [[2.0 * (n + 1)] * DIM for n in range(130)]


def test_cuda_device_routing(monkeypatch):
    """When torch reports CUDA, the model loads on 'cuda' and every tensor is
    moved there before the forward."""
    calls: list = []
    devices: list = []
    _install_fakes(monkeypatch, calls)
    import sys as _sys

    torch = _sys.modules["torch"]
    torch.cuda = types.SimpleNamespace(is_available=lambda: True)
    clip = _sys.modules["clip"]
    orig_load = clip.load

    def load(name, device):
        devices.append(("load", device))
        model, preprocess = orig_load(name, device)
        orig_encode = model.encode_image

        def encode_image(batch):
            return orig_encode(batch)

        model.encode_image = encode_image
        return model, preprocess

    clip.load = load

    class RecordingTensorFactory:
        pass

    # record .to targets by wrapping torch.stack's output
    orig_stack = torch.stack

    def stack(ts):
        t = orig_stack(ts)
        orig_to = t.to

        def to(device):
            devices.append(("to", device))
            return orig_to(device)

        t.to = to
        return t

    torch.stack = stack
    embed = _embedder()
    out = embed(pd.Series([b"img-aa"]))
    assert ("load", "cuda") in devices
    assert ("to", "cuda") in devices
    assert out[0] == [12.0] * DIM


def _install_worker_fakes():
    """Self-contained fake torch/clip/PIL installer that cloudpickle ships INTO
    the Spark Python workers (driver monkeypatches never reach them). Fake
    encode_image writes the STACKED BATCH SIZE into the last vector component,
    so the chunking behavior on the worker is observable from the collected
    rows. Idempotent for reused workers; fake PIL raises for any bytes that are
    not this test's markers, so a polluted reused worker still yields the
    standard decode_error path for every other test."""
    import sys
    import types

    import numpy as np

    if getattr(sys.modules.get("torch"), "_pvs_fake", False):
        return

    class FakeTensor:
        def __init__(self, arr):
            self.arr = np.asarray(arr, dtype=np.float64)

        def to(self, device):
            assert device == "cpu", f"worker should be on cpu, got {device}"
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.arr

    class FakeImage:
        def __init__(self, seed):
            self.seed = seed

        def convert(self, mode):
            return self

    torch = types.ModuleType("torch")
    torch._pvs_fake = True
    import contextlib

    torch.no_grad = contextlib.nullcontext
    torch.cuda = types.SimpleNamespace(is_available=lambda: False)
    torch.stack = lambda ts: FakeTensor(np.stack([t.arr for t in ts]))

    def load(name, device):
        def preprocess(img):
            return FakeTensor([float(img.seed)] * 4)

        def encode_image(batch):
            out = batch.arr * 2.0
            out[:, -1] = batch.arr.shape[0]  # observable chunk size
            return FakeTensor(out)

        def encode_text(tok):
            return FakeTensor(tok.arr * 3.0)

        return types.SimpleNamespace(
            encode_image=encode_image, encode_text=encode_text
        ), preprocess

    clip = types.ModuleType("clip")
    clip._pvs_fake = True
    clip.load = load
    clip.tokenize = lambda texts, truncate=False: FakeTensor(
        np.array([[float(len(t))] * 4 for t in texts])
    )

    def image_open(bio):
        data = bio.getvalue()
        if data.startswith(b"UDFIMG:"):
            return FakeImage(int(data[7:]))
        raise ValueError("fake PIL: unknown bytes")

    pil = types.ModuleType("PIL")
    pil._pvs_fake = True
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = image_open
    pil.Image = pil_image
    for name, mod in [("torch", torch), ("clip", clip), ("PIL", pil), ("PIL.Image", pil_image)]:
        # give each fake a real ModuleSpec: workers are REUSED across tests in
        # the session, and pyspark's stateful-processing path lazily runs
        # importlib.util.find_spec("torch") (state.update -> pyspark.testing
        # import), which RAISES "torch.__spec__ is None" on a spec-less module
        # — poisoning every later stateful test that lands on this worker
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def test_clip_adapter_through_real_pandas_udf(monkeypatch, spark):
    """End-to-end through Spark's iterator pandas UDF on real Python workers:
    the CLIP adapter's chunked batching, per-row decode errors, and output
    placement all hold across the Arrow boundary — the real-model UDF shape,
    exercised without torch installed."""
    from photo_vector_search_spark.pipelines.embed import Embedder
    from photo_vector_search_spark.pipelines.models import clip_embedder

    _install_fakes(monkeypatch, [])  # driver-side: constructor import check
    base = clip_embedder(dim=4, forward_chunk=2)
    inner = base.make_fn

    def worker_make_fn():
        _install_worker_fakes()
        return inner()

    emb = Embedder(dim=4, make_fn=worker_make_fn)
    rows = [(i, b"UDFIMG:%d" % (10 + i)) for i in range(5)] + [(5, b"CORRUPT")]
    df = (
        spark.createDataFrame(rows, "id int, content binary")
        .repartition(1)  # one Arrow batch → chunking pattern is deterministic
        .sortWithinPartitions("id")
    )
    got = {r.id: r.vec for r in df.select("id", emb.udf()(F.col("content")).alias("vec")).collect()}

    assert got[5] is None  # decode failure aborts only its row
    # seeds 10..14 doubled, last component = size of the stacked forward the row
    # rode in: chunk=2 over 5 decodable rows → forwards of 2, 2, 1
    sizes = [got[i][-1] for i in range(5)]
    assert sizes == [2.0, 2.0, 2.0, 2.0, 1.0]
    for i in range(5):
        assert got[i][:-1] == [float((10 + i) * 2)] * 3
