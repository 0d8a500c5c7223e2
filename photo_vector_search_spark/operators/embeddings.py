"""Embedding post-processing: PCA whitening and matryoshka truncation —
the representation-conditioning rungs between an encoder and the
dedup/ANN/retrieval families. Whitening decorrelates and equalizes
component variance, which measurably improves cosine retrieval on anisotropic
encoder outputs (Su et al. 2021, "Whitening Sentence Representations";
the BERT-flow/whitening line) and is the preprocessing OPQ assumes;
matryoshka truncation (Kusupati et al. 2022) cuts serving cost by slicing
prefixes of MRL-trained embeddings and renormalizing.

`fit_pca_whitening` is the two-pass scale shape:

1. ONE map-side pass over the corpus computing per-partition-batch moment
   partials (count, component sums, flattened outer-product sums) via
   Arrow batches — d=64 means a 4 KB sum + 32 KB outer row per batch; the
   driver collect is bounded by the PARTITION count, not the row count
   (the same bounded-sidecar discipline as ann.cluster_radii).
2. Driver: covariance from the reduced moments, `eigh`, whitening matrix
   W = V_k · diag(1/sqrt(λ_k + eps)) with a DETERMINISTIC sign convention
   (each eigenvector's largest-|component| is made positive — BLAS returns
   arbitrary signs, which would make results partitioning-dependent).

`apply_whitening` is then MAP-ONLY: broadcast (mean, W), one Arrow matmul
pass, zero shuffles — the shape that holds at any corpus size.

`truncate_renorm` is pure built-ins (slice + fold-norm division): codegen,
no Python at all.

Cf. reference scope: the reference (rianders/photo-vector-search) stores
raw CLIP vectors with no conditioning — this extends the mandated
similarity-search family.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import l2_norm


class WhiteningModel(NamedTuple):
    """Fitted whitening transform: y = (x - mean) @ w. ``w`` is (d, k) —
    k <= d principal directions, variance-equalized."""

    mean: np.ndarray
    w: np.ndarray
    eigenvalues: np.ndarray  # full spectrum, descending — for variance audits


def _moment_partials(vec_col: str, dim: int):
    def inner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {x.shape[1]} != declared dim {dim}"
                )
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "m2": [(x.T @ x).ravel()],
                }
            )

    return inner


def fit_pca_whitening(
    emb: DataFrame,
    dim: int | None = None,
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> WhiteningModel:
    """Fit PCA whitening on ``emb[vec_col]`` (array<float|double>, fixed
    width). ``dim`` keeps the top-``dim`` principal directions (None = all).
    NULL vectors are excluded from the fit (they would poison the moments);
    apply_whitening passes them through as NULL. Deterministic: moment sums
    are order-insensitive (float addition reassociation is absorbed by the
    eigensolve's tolerance at these widths) and eigenvector signs are pinned."""
    d = emb.select(F.size(vec_col).alias("d")).filter(
        F.col("d") >= 0
    ).first()
    if d is None:
        raise ValueError(
            "cannot fit whitening: empty frame or no non-NULL vectors"
        )
    width = d["d"]
    if dim is not None and not 1 <= dim <= width:
        raise ValueError(f"dim must be in [1, {width}], got {dim}")

    parts = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(
            _moment_partials(vec_col, width),
            schema="n long, s array<double>, m2 array<double>",
        )
        .collect()  # bounded: one row per Arrow batch per partition
    )
    if not parts:
        raise ValueError("cannot fit whitening: no non-NULL vectors")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    m2 = np.sum([np.asarray(r["m2"]) for r in parts], axis=0).reshape(width, width)
    mean = s / n
    cov = m2 / n - np.outer(mean, mean)
    # symmetrize against accumulation noise before eigh
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign: largest-|component| of each eigenvector positive
    flips = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(width)])
    flips[flips == 0] = 1.0
    vecs = vecs * flips
    k = width if dim is None else dim
    w = vecs[:, :k] / np.sqrt(np.maximum(vals[:k], 0.0) + eps)
    return WhiteningModel(mean=mean, w=w, eigenvalues=vals)


def apply_whitening(
    emb: DataFrame,
    model: WhiteningModel,
    vec_col: str = "embedding",
    out_col: str = "embedding_white",
) -> DataFrame:
    """Map-only application of a fitted whitening: y = (x - mean) @ w,
    broadcast constants, one Arrow matmul per batch, zero shuffles. NULL
    input vectors yield NULL output (they were excluded from the fit)."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast((model.mean, model.w))
    out_fields = emb.schema.fieldNames() + [out_col]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in emb.schema)
        + f", `{out_col}` array<double>"
    )

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, w = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            mask = pdf[vec_col].notna().to_numpy()
            out = pd.Series([None] * len(pdf), dtype=object)
            if mask.any():
                x = np.vstack(
                    pdf.loc[mask, vec_col].to_numpy()
                ).astype(np.float64)
                y = (x - mean) @ w
                out[np.flatnonzero(mask)] = list(y)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf[out_fields]

    return emb.mapInPandas(_apply, schema=out_schema)


def truncate_renorm(
    vec: Column | str, dim: int, renorm: bool = True
) -> Column:
    """Matryoshka prefix: first ``dim`` components, L2-renormalized by
    default (cosine over the prefix). Pure built-ins (slice + fold), so it
    pipelines into any scan. Zero-norm prefixes yield NULL under renorm
    (the knn family's zero-norm discipline) rather than a division blowup."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    col = F.col(vec) if isinstance(vec, str) else vec
    pre = F.slice(col.cast("array<double>"), 1, dim)
    if not renorm:
        return pre
    n = l2_norm(pre)
    return F.when(n > 0, F.transform(pre, lambda x: x / n)).otherwise(
        F.lit(None).cast("array<double>")
    )


def pool_embeddings(
    chunks: DataFrame,
    by: str = "doc_id",
    vec_col: str = "embedding",
    weight_col: str | None = None,
    method: str = "mean",
    renorm: bool = True,
    out_col: str = "embedding",
    order_col: str | None = None,
) -> DataFrame:
    """Pool CHUNK embeddings back to one vector per ``by`` group — the
    long-document pattern (embed bounded chunks, mean-pool to the document;
    the Sentence-BERT / RAG aggregation convention). ``method``: 'mean'
    (optionally ``weight_col``-weighted — e.g. chunk token counts, so long
    chunks count proportionally) or 'max' (element-wise max-pool). L2
    renormalized by default (cosine-ready); all-NULL groups and (under
    renorm) zero-norm results yield NULL vectors — the knn discipline.

    Scale shape: ONE keyed shuffle (groupBy ``by``) of the chunk vectors
    into a vectorized Arrow kernel (np.average / np.max per group) — the
    rows must meet their group somewhere, and chunkers emit a document's
    chunks adjacently, so AQE-coalesced exchanges stay cheap; output is one
    row per group. Returns (by, n_chunks, out_col)."""
    if method not in ("mean", "max"):
        raise ValueError(f"method must be 'mean' or 'max', got {method!r}")
    if weight_col is not None and method != "mean":
        raise ValueError("weight_col only applies to method='mean'")

    cols = [by, vec_col] + ([weight_col] if weight_col else [])
    if order_col is not None and order_col not in cols:
        cols.append(order_col)
    key_type = chunks.schema[by].dataType.simpleString()
    out_schema = (
        f"`{by}` {key_type}, n_chunks long, `{out_col}` array<double>"
    )
    w_name = weight_col
    order_name = order_col

    def _pool(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[pdf[vec_col].notna()]
        if order_name is not None:
            # pin the float summation ORDER: without it the group's row
            # order (hence the last-ulp of the mean) depends on the
            # physical partitioning — the pinned-eigenvector-signs rule
            vals = vals.sort_values(order_name, kind="stable")
        n = len(vals)
        if n == 0:
            return pd.DataFrame(
                {by: [key[0]], "n_chunks": [0], out_col: [None]}
            )
        x = np.vstack(vals[vec_col].to_numpy()).astype(np.float64)
        if method == "max":
            v = x.max(axis=0)
        elif w_name is not None:
            w = vals[w_name].to_numpy(dtype=np.float64)
            if not (w >= 0).all() or not w.sum() > 0:
                raise ValueError(
                    f"group {key[0]!r}: weights must be >= 0 with a "
                    "positive sum"
                )
            v = np.average(x, axis=0, weights=w)
        else:
            v = x.mean(axis=0)
        if renorm:
            nrm = float(np.linalg.norm(v))
            v = v / nrm if nrm > 0 else None
        return pd.DataFrame(
            {
                by: [key[0]],
                "n_chunks": [n],
                out_col: [None if v is None else list(v)],
            }
        )

    return (
        chunks.select(*cols)
        .groupBy(by)
        .applyInPandas(_pool, schema=out_schema)
    )
