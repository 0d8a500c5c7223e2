"""Real model backends behind the pluggable interfaces (reference parity:
CLIP ViT-L/14 for embeddings, photo_vector_search.py:27-40; Ollama VLM for
descriptions, :42-82).

Heavy runtimes (torch/clip, an Ollama server) are NOT in this container, so
these constructors import lazily and raise a clear error at *construction* time
when unavailable — pipelines keep running hermetically on the deterministic
stubs. The UDF shape is identical to the stubs': iterator pandas UDFs, model
loaded once per Python worker (the reference loads CLIP once per process).
"""

from __future__ import annotations

import base64

import pandas as pd

from photo_vector_search_spark.pipelines.embed import Describer, Embedder


CLIP_FORWARD_CHUNK = 128  # images per encode_image call: bounds GPU activation
# memory (an Arrow batch can hold 10k rows — stacking all of them into one
# forward would OOM any real GPU) while keeping the 10-100x batching win


def clip_embedder(
    model_name: str = "ViT-L/14", dim: int = 768, forward_chunk: int = CLIP_FORWARD_CHUNK
) -> Embedder:
    """CLIP image/text embedder (768-d for ViT-L/14). Requires torch + clip.

    Images (bytes) go through preprocess + ``encode_image``; strings go through
    ``encode_text`` (the reference's text-query path, photo_vector_search.py:
    36-40), so the same Embedder serves indexing AND query embedding."""
    try:
        import clip  # noqa: F401
        import torch  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "clip_embedder needs the 'torch' and 'clip' packages (not installed "
            "in this environment); use stub_embedder() for hermetic runs"
        ) from e

    def make_fn():
        import io

        import clip
        import torch
        from PIL import Image

        device = "cuda" if torch.cuda.is_available() else "cpu"
        model, preprocess = clip.load(model_name, device=device)  # once per worker

        def _encode_one(t):
            with torch.no_grad():
                v = model.encode_image(torch.stack([t]).to(device)).cpu().numpy()[0]
            return [float(x) for x in v]

        def _encode_text_one(text: str):
            with torch.no_grad():
                tok = clip.tokenize([text], truncate=True).to(device)
                v = model.encode_text(tok).cpu().numpy()[0]
            return [float(x) for x in v]

        def embed(s: pd.Series) -> pd.Series:
            # Decode/preprocess per row (errors abort only that row), then ONE
            # stacked forward per bounded chunk — the reference's worst defect is
            # its batch-size-1 encode loop (photo_vector_search.py:30-34); SURVEY
            # §4.1 promises stacked tensors. A failing chunk forward (one bad
            # tensor, transient CUDA error) falls back to per-row encodes so the
            # reference's 'embed failure aborts the row' semantics still hold.
            outs = [None] * len(s)
            tensors, idx = [], []
            for i, content in enumerate(s):
                try:
                    if isinstance(content, str):  # text query path
                        outs[i] = _encode_text_one(content)
                        continue
                    img = Image.open(io.BytesIO(content)).convert("RGB")
                    tensors.append(preprocess(img))
                    idx.append(i)
                except Exception:
                    pass  # embed failure aborts the row -> stays None
            for c0 in range(0, len(tensors), forward_chunk):
                chunk, cidx = tensors[c0 : c0 + forward_chunk], idx[c0 : c0 + forward_chunk]
                try:
                    with torch.no_grad():
                        vecs = model.encode_image(torch.stack(chunk).to(device)).cpu().numpy()
                    for j, i in enumerate(cidx):
                        outs[i] = [float(x) for x in vecs[j]]
                except Exception:
                    for t, i in zip(chunk, cidx):  # isolate the bad row(s)
                        try:
                            outs[i] = _encode_one(t)
                        except Exception:
                            pass  # that row stays None
            return pd.Series(outs, index=s.index)

        return embed

    return Embedder(dim=dim, make_fn=make_fn)


def ollama_describer(
    model: str = "llava-phi3:latest",
    host: str = "http://localhost:11434",
    max_side: int = 1024,
) -> Describer:
    """Ollama VLM describer. Requires a reachable Ollama server; per-row errors
    map to '' with the row still indexed (photo_vector_search.py:80-82)."""
    try:
        import urllib.request  # stdlib — constructor succeeds; errors are per-row
    except ImportError as e:  # pragma: no cover
        raise ImportError("urllib unavailable") from e

    def make_fn():
        import json
        import urllib.request

        def describe(content, prompt: str) -> str:
            payload = {
                "model": model,
                "prompt": prompt,
                "images": [base64.b64encode(bytes(content)).decode()],
                "stream": False,
            }
            req = urllib.request.Request(
                f"{host}/api/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read())["response"].strip()

        return describe

    return Describer(make_fn=make_fn)
