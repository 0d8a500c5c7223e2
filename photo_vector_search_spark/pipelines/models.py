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


def clip_embedder(model_name: str = "ViT-L/14", dim: int = 768) -> Embedder:
    """CLIP image/text embedder (768-d for ViT-L/14). Requires torch + clip."""
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

        def embed(s: pd.Series) -> pd.Series:
            # Decode/preprocess per row (errors abort only that row), then ONE
            # stacked forward pass per Arrow batch — the reference's worst defect
            # is its batch-size-1 encode loop (photo_vector_search.py:30-34);
            # SURVEY §4.1 promises stacked tensors, and on a GPU a single
            # encode_image over the batch is 10-100x the per-image loop.
            tensors, idx = [], []
            for i, content in enumerate(s):
                try:
                    img = Image.open(io.BytesIO(content)).convert("RGB")
                    tensors.append(preprocess(img))
                    idx.append(i)
                except Exception:
                    pass  # embed failure aborts the row -> stays None
            outs = [None] * len(s)
            if tensors:
                with torch.no_grad():
                    batch = torch.stack(tensors).to(device)
                    vecs = model.encode_image(batch).cpu().numpy()
                for j, i in enumerate(idx):
                    outs[i] = [float(x) for x in vecs[j]]
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
