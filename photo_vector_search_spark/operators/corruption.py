"""Span-corruption dataset construction (T5's denoising objective, Raffel et
al. 2020 §3.1.4; also the R-denoiser of UL2): turn packed token windows into
(inputs, targets) training pairs — each selected span is replaced by one
sentinel id in the inputs, and the targets list every sentinel followed by
the tokens it hid, so inputs+targets is a lossless re-encoding of the
window (the round-trip the tests assert).

Distributed determinism: every row's mask depends ONLY on (seed, seq_id) —
a per-row PRNG seeded from md5, the T5 per-example convention made
partitioning-invariant (Spark's seeded rand() streams change with the
physical split; a hash-seeded per-row generator cannot). The kernel is one
Arrow-batched map (no shuffle), sized by the output's ~(1+r) token blow-up.

Span layout follows T5's ``random_spans_noise_mask``: ``n_noise =
round(L·r)`` tokens in ``n_spans = max(1, round(n_noise/mean_span_len))``
spans, span/gap lengths drawn as uniform random compositions, first segment
a gap (no leading sentinel bias), spans never adjacent (every sentinel is
separated by ≥1 kept token except possibly at the window end).

Sentinels descend from ``sentinel_start`` (T5 uses the top of the vocab:
pass ``len(vocab) + n`` to sit above ``encode_bpe``'s OOV id).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame


def _span_layout(
    rng: random.Random, length: int, rate: float, mean_span: float
) -> list[tuple[int, int]]:
    """[(start, span_len)] noise spans for a window of ``length`` tokens —
    T5's composition sampling: pick n_noise/n_spans, split both the noise
    budget and the non-noise budget into n_spans random positive parts,
    interleave gap, span, gap, span, ..."""
    n_noise = int(round(length * rate))
    if n_noise == 0 or length < 2:
        return []
    n_noise = min(n_noise, length - 1)  # keep at least one real token
    n_spans = max(1, int(round(n_noise / mean_span)))
    n_spans = min(n_spans, n_noise)
    n_keep = length - n_noise
    # a random composition of `total` into `parts` positive integers
    def comp(total: int, parts: int) -> list[int]:
        if parts == 1:
            return [total]
        cuts = sorted(rng.sample(range(1, total), parts - 1))
        return [b - a for a, b in zip([0] + cuts, cuts + [total])]

    # gaps: n_spans positive parts (first gap positive => no span at pos 0;
    # T5 allows a zero first gap — we require ≥1 so every sentinel has a
    # left context token, documented above)
    if n_keep < n_spans:
        n_spans = max(1, n_keep)
        # re-cap noise so the interleave stays feasible
    spans = comp(n_noise, n_spans)
    gaps = comp(n_keep, n_spans)
    out, pos = [], 0
    for g, s in zip(gaps, spans):
        pos += g
        out.append((pos, s))
        pos += s
    return out


def corrupt_spans(
    windows: DataFrame,
    rate: float = 0.15,
    mean_span_len: float = 3.0,
    sentinel_start: int = 32_000,
    seed: int = 0,
    ids_col: str = "input_ids",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Replace ``ids_col`` with the corrupted ``inputs`` and add ``targets``
    (sentinel-delimited hidden spans) + ``n_noise_tokens``. NULL windows pass
    through NULL; windows too short to corrupt (< 2 tokens, or rate rounds
    to zero spans) emit ``inputs == original`` and empty ``targets``."""
    if not 0 <= rate < 1:
        raise ValueError(f"rate must be in [0, 1), got {rate}")
    if mean_span_len <= 0:
        raise ValueError(f"mean_span_len must be positive, got {mean_span_len}")
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    in_fields = [f for f in windows.schema.fields if f.name != ids_col]
    out_schema = StructType(
        in_fields
        + [
            StructField("inputs", ArrayType(IntegerType()), True),
            StructField("targets", ArrayType(IntegerType()), True),
            StructField("n_noise_tokens", IntegerType(), True),
        ]
    )
    in_cols = [f.name for f in in_fields]

    def run(batches):
        for pdf in batches:
            inputs, targets, n_noise = [], [], []
            for ids, sid in zip(pdf[ids_col], pdf[seq_col]):
                if ids is None:
                    inputs.append(None)
                    targets.append(None)
                    n_noise.append(None)
                    continue
                ids = list(int(x) for x in ids)
                rng = random.Random(
                    int.from_bytes(
                        hashlib.md5(f"{seed}|{sid}".encode()).digest()[:8],
                        "big",
                    )
                )
                spans = _span_layout(rng, len(ids), rate, mean_span_len)
                inp, tgt, last, noise = [], [], 0, 0
                for si, (start, slen) in enumerate(spans):
                    inp.extend(ids[last:start])
                    inp.append(sentinel_start - si)
                    tgt.append(sentinel_start - si)
                    tgt.extend(ids[start : start + slen])
                    last = start + slen
                    noise += slen
                inp.extend(ids[last:])
                inputs.append(inp)
                targets.append(tgt)
                n_noise.append(noise)
            out = pdf[in_cols].copy()
            out["inputs"] = inputs
            out["targets"] = targets
            out["n_noise_tokens"] = n_noise
            yield out

    return windows.mapInPandas(run, schema=out_schema)


def reconstruct_spans(
    inputs: list[int], targets: list[int], sentinel_start: int
) -> list[int]:
    """Driver-side inverse (validation/debug): splice each sentinel's hidden
    span back into the inputs. ``reconstruct(corrupt(w)) == w`` exactly —
    the losslessness proof the tests pin. Requires real token ids to sit
    BELOW the sentinel range (the ``sentinel_start`` contract), so the next
    expected descending sentinel value is unambiguous."""
    spans: dict[int, list[int]] = {}
    cur: int | None = None
    expected = sentinel_start
    for t in targets:
        if t == expected:
            spans[t] = []
            cur = t
            expected -= 1
        else:
            spans[cur].append(t)
    out: list[int] = []
    for t in inputs:
        if t in spans:
            out.extend(spans[t])
        else:
            out.append(t)
    return out
