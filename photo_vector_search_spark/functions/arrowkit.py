"""Zero-copy Arrow → NumPy helpers for the vectorized serving kernels.

A ``list<list<double>>`` (or ``list<list<int*>>``) Arrow column is ONE
contiguous values buffer plus two offset arrays — so a batch's stacked
token matrix is a ``reshape`` over the flat buffer, not 10⁵ per-row
``np.asarray``/``np.vstack`` calls (measured ~2.5× the cost of the actual
BLAS scoring at sf0.1; guide §4.2: operations that only re-slice bytes
should re-slice buffers). The kernels that consume these helpers moved
from ``mapInPandas`` (which materializes each cell as a nested object
array) to ``mapInArrow`` for exactly this reason.

Parity: the helpers produce the SAME flat (ΣT, dim) float64 stack, row
order, counts and keep-mask as the pandas-era ``_tok_matrices`` loop —
the arithmetic downstream is untouched, so scores are bit-identical
(parity-pinned in the operators' tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_lengths(col: pa.Array) -> np.ndarray:
    """Per-row inner-list lengths with NULL rows as 0 — int64."""
    return (
        pa.compute.fill_null(pa.compute.list_value_length(col), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def nested_matrix(col: pa.Array, dim: int):
    """(flat (ΣT, dim) float64, per-KEPT-row token counts, keep mask) for a
    ``list<list<numeric>>`` column — the Arrow twin of the pandas-era
    ``_tok_matrices``. NULL/empty rows are dropped from the stack (keep
    False). Raises if any inner vector's length differs from ``dim`` (the
    store contract; the old ``np.vstack`` path errored on ragged input
    too)."""
    outer_len = list_lengths(col)
    keep = outer_len > 0
    counts = outer_len[keep]
    if not counts.size:
        return None, None, keep
    inner = col.flatten()  # token vectors of kept rows, in row order
    if inner.null_count:
        # a NULL inner vector would silently drop from the flat buffer and
        # misalign every row after it — refuse instead
        raise ValueError("nested_matrix: NULL inner vector in list column")
    inner_len = pa.compute.list_value_length(inner)
    mn = pa.compute.min(inner_len).as_py()
    mx = pa.compute.max(inner_len).as_py()
    if mn != dim or mx != dim:
        raise ValueError(
            f"nested_matrix: inner vectors must all have length {dim}, "
            f"got lengths in [{mn}, {mx}]"
        )
    flat = inner.flatten().to_numpy(zero_copy_only=False)
    return (
        np.ascontiguousarray(flat, dtype=np.float64).reshape(-1, dim),
        counts,
        keep,
    )


def flat_values(col: pa.Array, dtype=np.int64) -> np.ndarray:
    """Concatenated inner values of a ``list<numeric>`` column (NULL rows
    contribute nothing), as ``dtype``."""
    return col.flatten().to_numpy(zero_copy_only=False).astype(dtype)


def fixed_matrix(col: pa.Array, dim: int):
    """(matrix (kept, dim) float64, keep mask) for a ``list<double>`` column
    of fixed-width vectors (e.g. the pooled column): NULL/empty rows are
    dropped; raises on ragged widths."""
    lens = list_lengths(col)
    keep = lens > 0
    if not keep.any():
        return None, keep
    bad = lens[keep]
    if bad.min() != dim or bad.max() != dim:
        raise ValueError(
            f"fixed_matrix: vectors must all have length {dim}, got "
            f"lengths in [{bad.min()}, {bad.max()}]"
        )
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return (
        np.ascontiguousarray(flat, dtype=np.float64).reshape(-1, dim),
        keep,
    )
