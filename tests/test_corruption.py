"""T5 span corruption: losslessness (reconstruct == original, exactly),
noise-rate accuracy, span statistics, determinism/partitioning invariance,
and the short-window/NULL/guard contracts."""

from __future__ import annotations

import pytest

from photo_vector_search_spark.operators.corruption import (
    corrupt_spans,
    reconstruct_spans,
)

SENT = 32_000


def _windows(spark, n=200, L=128, seed=1):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.randrange(1000) for _ in range(L)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "seq_id long, input_ids array<int>"), dict(rows)


def test_lossless_round_trip_and_rate(spark):
    df, original = _windows(spark)
    out = corrupt_spans(df, rate=0.15, mean_span_len=3.0, sentinel_start=SENT)
    rows = out.collect()
    assert len(rows) == len(original)
    total_noise, total_tokens = 0, 0
    for r in rows:
        want = original[r["seq_id"]]
        got = reconstruct_spans(list(r["inputs"]), list(r["targets"]), SENT)
        assert got == want, r["seq_id"]
        # every sentinel appears exactly once in inputs and once in targets,
        # descending from SENT
        sents_in = [t for t in r["inputs"] if t > SENT - 100]
        sents_tg = [t for t in r["targets"] if t > SENT - 100]
        assert sents_in == sorted(sents_in, reverse=True)
        assert sents_in == sents_tg
        assert r["n_noise_tokens"] == len(r["targets"]) - len(sents_tg)
        total_noise += r["n_noise_tokens"]
        total_tokens += len(want)
    assert total_noise / total_tokens == pytest.approx(0.15, abs=0.01)
    # mean span length tracks the parameter
    n_spans = sum(
        len([t for t in r["targets"] if t > SENT - 100]) for r in rows
    )
    assert total_noise / n_spans == pytest.approx(3.0, abs=0.5)


def test_deterministic_and_partitioning_invariant(spark):
    df, _ = _windows(spark, n=80)
    a = {
        r["seq_id"]: (list(r["inputs"]), list(r["targets"]))
        for r in corrupt_spans(df.repartition(13), seed=7).collect()
    }
    b = {
        r["seq_id"]: (list(r["inputs"]), list(r["targets"]))
        for r in corrupt_spans(df.coalesce(1), seed=7).collect()
    }
    assert a == b
    c = {
        r["seq_id"]: (list(r["inputs"]), list(r["targets"]))
        for r in corrupt_spans(df, seed=8).collect()
    }
    assert c != a  # a different seed reshapes the masks


def test_short_null_and_guard_contracts(spark):
    rows = [(0, [1]), (1, []), (2, None), (3, [5, 6, 7, 8, 9, 10])]
    df = spark.createDataFrame(rows, "seq_id long, input_ids array<int>")
    got = {
        r["seq_id"]: (
            None if r["inputs"] is None else list(r["inputs"]),
            None if r["targets"] is None else list(r["targets"]),
        )
        for r in corrupt_spans(df, rate=0.3, sentinel_start=SENT).collect()
    }
    assert got[0] == ([1], [])       # 1 token: too short, passthrough
    assert got[1] == ([], [])        # empty: passthrough
    assert got[2] == (None, None)    # NULL: passthrough
    inp, tgt = got[3]
    assert reconstruct_spans(inp, tgt, SENT) == [5, 6, 7, 8, 9, 10]
    assert len(tgt) > 0              # 6 tokens at 0.3 => ~2 noise tokens
    with pytest.raises(ValueError, match="rate"):
        corrupt_spans(df, rate=1.0)
    with pytest.raises(ValueError, match="mean_span_len"):
        corrupt_spans(df, mean_span_len=0)
    # rate=0 is legal: no-op corruption
    clean = {
        r["seq_id"]: list(r["targets"] or [])
        for r in corrupt_spans(df, rate=0.0).collect()
        if r["targets"] is not None
    }
    assert all(v == [] for v in clean.values())


def test_spans_never_start_at_zero_and_are_separated(spark):
    df, original = _windows(spark, n=60, L=64)
    rows = corrupt_spans(df, rate=0.25, sentinel_start=SENT).collect()
    for r in rows:
        inp = list(r["inputs"])
        # first token is never a sentinel (layout guarantees a leading gap)
        assert not inp[0] > SENT - 100, r["seq_id"]
        # no two sentinels adjacent in inputs (spans separated by >=1 token)
        for x, y in zip(inp, inp[1:]):
            assert not (x > SENT - 100 and y > SENT - 100), r["seq_id"]
