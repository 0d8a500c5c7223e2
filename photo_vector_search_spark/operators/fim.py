"""Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
Training of Language Models to Fill in the Middle") — the infilling sibling
of T5 span corruption (`operators/corruption`).

FIM teaches a causal LM to complete a MIDDLE given its surroundings: each
document (or packed window) is cut at two random points into
(prefix, middle, suffix) and re-laid-out with sentinels so autoregressive
training sees the middle LAST —

- PSM: ``[PRE] prefix [SUF] suffix [MID] middle``
- SPM: ``[SUF] suffix [PRE] prefix [MID] middle``

The paper's headline result is the "FIM-for-free" property: applying the
transform to a RATE-sized fraction of documents (joint training) leaves
left-to-right perplexity unchanged while adding the infilling capability —
hence the per-row Bernoulli(rate) gate here, not a global split.

Reference parity note: the reference repo has no training-data surface
(photo_vector_search.py:1-153); this is the SURVEY §2.10 dataset-
construction family, alongside span corruption and sequence packing.

Scale design (100 TB): one map-only Arrow pass, zero shuffles — identical
to ``corrupt_spans``. Distributed determinism likewise: every row's draws
(the Bernoulli gate, both cut points, the PSM/SPM choice) depend ONLY on
(seed, row id) via a per-row md5-seeded PRNG, so output is
partitioning-invariant where Spark's seeded rand streams are not.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame


def fim_transform(
    windows: DataFrame,
    rate: float = 0.5,
    spm_fraction: float = 0.5,
    sentinel_start: int = 32_000,
    seed: int = 0,
    ids_col: str = "input_ids",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Replace ``ids_col`` with the FIM layout for a Bernoulli(``rate``)
    subset of rows; the rest pass through untouched (the paper's joint
    training mix). Adds ``fim_applied`` (bool) and ``n_middle_tokens``.

    Sentinels: ``[PRE] = sentinel_start``, ``[SUF] = sentinel_start - 1``,
    ``[MID] = sentinel_start - 2`` — real ids must sit below them (the
    ``corrupt_spans`` contract). Cut points are drawn uniformly over
    0 ≤ a ≤ b ≤ len (empty prefix/middle/suffix are all legal, as in the
    paper's character-level cuts); each transformed row is PSM or SPM with
    probability ``spm_fraction`` for SPM. Rows shorter than 1 token and
    NULLs pass through untransformed. Lossless: ``reconstruct_fim`` inverts
    every transformed row exactly (pinned in tests)."""
    if not 0 <= rate <= 1:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if not 0 <= spm_fraction <= 1:
        raise ValueError(
            f"spm_fraction must be in [0, 1], got {spm_fraction}"
        )
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    pre, suf, mid = sentinel_start, sentinel_start - 1, sentinel_start - 2
    in_fields = [f for f in windows.schema.fields if f.name != ids_col]
    out_schema = StructType(
        in_fields
        + [
            StructField(ids_col, ArrayType(IntegerType()), True),
            StructField("fim_applied", BooleanType(), True),
            StructField("n_middle_tokens", IntegerType(), True),
        ]
    )
    in_cols = [f.name for f in in_fields]

    def run(batches):
        for pdf in batches:
            out_ids, applied, n_mid = [], [], []
            for ids, sid in zip(pdf[ids_col], pdf[seq_col]):
                if ids is None:
                    out_ids.append(None)
                    applied.append(None)
                    n_mid.append(None)
                    continue
                ids = [int(x) for x in ids]
                rng = random.Random(
                    int.from_bytes(
                        hashlib.md5(f"fim|{seed}|{sid}".encode()).digest()[:8],
                        "big",
                    )
                )
                if len(ids) < 1 or rng.random() >= rate:
                    out_ids.append(ids)
                    applied.append(False)
                    n_mid.append(0)
                    continue
                a = rng.randint(0, len(ids))
                b = rng.randint(0, len(ids))
                if a > b:
                    a, b = b, a
                p, md, s = ids[:a], ids[a:b], ids[b:]
                if rng.random() < spm_fraction:  # SPM
                    row = [suf, *s, pre, *p, mid, *md]
                else:  # PSM
                    row = [pre, *p, suf, *s, mid, *md]
                out_ids.append(row)
                applied.append(True)
                n_mid.append(len(md))
            out = pdf[in_cols].copy()
            out[ids_col] = out_ids
            out["fim_applied"] = applied
            out["n_middle_tokens"] = n_mid
            yield out

    return windows.mapInPandas(run, schema=out_schema)


def reconstruct_fim(row: list[int], sentinel_start: int = 32_000) -> list[int]:
    """Driver-side inverse (validation/debug): undo either FIM layout back
    to the original token order. ``reconstruct(transform(w)) == w`` exactly
    for every transformed row — the losslessness proof the tests pin.
    Untransformed rows (no leading sentinel) return unchanged."""
    pre, suf, mid = sentinel_start, sentinel_start - 1, sentinel_start - 2
    if not row or row[0] not in (pre, suf):
        return list(row)
    im = row.index(mid)
    middle = row[im + 1 :]
    if row[0] == pre:  # PSM: [PRE] p [SUF] s [MID] m
        isuf = row.index(suf)
        prefix, suffix = row[1:isuf], row[isuf + 1 : im]
    else:  # SPM: [SUF] s [PRE] p [MID] m
        ipre = row.index(pre)
        suffix, prefix = row[1:ipre], row[ipre + 1 : im]
    return [*prefix, *middle, *suffix]
