"""Vector distance kernels.

The reference never computes cosine itself — it configures ChromaDB's HNSW index with
``{"hnsw:space": "cosine"}`` and consumes the distances it returns
(photo_vector_search.py:19, 171, 181-187). The engine therefore owns the kernel:

- **SQL-expression path** (this module's column functions): ``zip_with`` +
  ``aggregate`` over ``array<float>`` cast to double. Fully codegen-able, exactly
  reproducible against the DuckDB oracle (both accumulate doubles in index order, so
  results agree far below the round-6 comparison tolerance).
- **Fast path** (``pandas_cosine_distances`` / operators.knn.knn_batch fast mode):
  Arrow-batched NumPy matmul of a broadcast query matrix against each partition's
  embedding matrix — the vectorized execution the reference's batch-size-1 loop
  conspicuously lacks (photo_vector_search.py:30-34, SURVEY §4.1 last row).

Scale note (100 TB): both paths are narrow map-side work with no shuffle; the
expression path whole-stage-codegens into the scan stage, the fast path streams Arrow
batches. Store vectors L2-normalized (``l2_normalize`` at write time) and cosine
degrades to a pure dot product.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a_i * b_i, accumulated in double in index order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column) -> Column:
    """Divide each element by the vector's L2 norm (norm-0 vectors pass through as-is)."""
    n = l2_norm(a)
    return F.when(n == 0.0, _as_double(a)).otherwise(
        F.transform(_as_double(a), lambda x: x / n)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL for zero-norm inputs: try_divide, because under ANSI mode (Spark 4
    default) a plain double division by zero THROWS mid-query instead of
    yielding NULL — one degenerate vector must not kill a whole search."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine_similarity — the distance ChromaDB's cosine space returns
    (photo_vector_search.py:19), i.e. what the reference's search results carry."""
    return F.lit(1.0) - cosine_similarity(a, b)


def query_vector_literal(vec) -> Column:
    """A query embedding as a double-array literal column (broadcast to executors
    inside the plan — no driver-side loop, no extra scan)."""
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_distance_to_query(emb: Column, vec) -> Column:
    """cosine_distance(emb, literal query vector) with the query norm precomputed
    driver-side — Catalyst doesn't constant-fold ``aggregate`` over a literal array,
    so folding it here halves the per-row lambda work vs ``cosine_distance``."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in vec))
    # try_divide: zero-norm rows → NULL (ANSI double div-by-zero throws otherwise)
    return F.lit(1.0) - F.try_divide(
        dot_product(emb, query_vector_literal(vec)), l2_norm(emb) * F.lit(qnorm)
    )


def make_pandas_cosine_distance_udf(query_vec):
    """Fast-path kernel: blocked NumPy matmul against a fixed query vector.

    Returns a scalar iterator pandas UDF (DoubleType). The query vector is captured
    once per python worker (the reference's analogous trick: CLIP loaded once per
    process, photo_vector_search.py:27-28).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @F.pandas_udf(DoubleType())
    def _cos_dist(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            m = np.vstack(s.to_numpy())  # (rows, dim) float32
            m = m.astype(np.float64, copy=False)
            norms = np.linalg.norm(m, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (m @ q) / (norms * qn)  # zero-norm rows → NaN,
            yield pd.Series(1.0 - sims)  # excluded downstream by _valid_dist

    return _cos_dist
