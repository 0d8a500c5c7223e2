"""FIM transformation: losslessness (reconstruct∘transform = id) on every
row, the Bernoulli(rate) gate and PSM/SPM mix hit their parameters, expected
middle share matches the uniform two-cut model (len/3), determinism +
partitioning invariance, layout and NULL/short contracts."""

from __future__ import annotations

import numpy as np

from photo_vector_search_spark.operators.fim import (
    fim_transform,
    reconstruct_fim,
)

SENT = 32_000


def _windows(spark, n=400, seed=9):
    rng = np.random.RandomState(seed)
    rows = [
        (i, [int(t) for t in rng.randint(0, 1000, size=rng.randint(1, 60))])
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "seq_id long, input_ids array<int>"),
        dict(rows),
    )


def test_lossless_and_layout(spark):
    df, orig = _windows(spark)
    got = fim_transform(df, rate=1.0, seed=3).collect()
    assert len(got) == len(orig)
    for r in got:
        row = list(r["input_ids"])
        assert r["fim_applied"]
        # exactly one of each sentinel, [MID] last among them
        assert row.count(SENT) == 1 and row.count(SENT - 1) == 1
        assert row.count(SENT - 2) == 1
        assert reconstruct_fim(row, SENT) == orig[r["seq_id"]]
        im = row.index(SENT - 2)
        assert len(row[im + 1 :]) == r["n_middle_tokens"]


def test_rate_gate_and_spm_mix(spark):
    df, orig = _windows(spark, n=800)
    got = fim_transform(df, rate=0.4, spm_fraction=0.25, seed=1).collect()
    applied = [r for r in got if r["fim_applied"]]
    assert abs(len(applied) / len(got) - 0.4) < 0.06
    spm = sum(1 for r in applied if r["input_ids"][0] == SENT - 1)
    assert abs(spm / len(applied) - 0.25) < 0.08
    # untouched rows pass through verbatim
    for r in got:
        if not r["fim_applied"]:
            assert list(r["input_ids"]) == orig[r["seq_id"]]
            assert r["n_middle_tokens"] == 0


def test_middle_share_matches_uniform_two_cut_model(spark):
    # E[b - a] for two uniform cuts over [0, L] is L/3
    df, orig = _windows(spark, n=600, seed=2)
    got = fim_transform(df, rate=1.0, seed=5).collect()
    share = np.mean(
        [r["n_middle_tokens"] / len(orig[r["seq_id"]]) for r in got]
    )
    assert abs(share - 1 / 3) < 0.04, share


def test_determinism_and_partitioning_invariance(spark):
    df, _ = _windows(spark)
    a = {r["seq_id"]: list(r["input_ids"]) for r in fim_transform(df, seed=7).collect()}
    b = {
        r["seq_id"]: list(r["input_ids"])
        for r in fim_transform(df.repartition(11), seed=7).collect()
    }
    assert a == b
    c = {r["seq_id"]: list(r["input_ids"]) for r in fim_transform(df, seed=8).collect()}
    assert c != a


def test_null_and_guards(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, None), (1, [5])], "seq_id long, input_ids array<int>"
    )
    got = {r["seq_id"]: r for r in fim_transform(df, rate=1.0).collect()}
    assert got[0]["input_ids"] is None and got[0]["fim_applied"] is None
    assert reconstruct_fim(list(got[1]["input_ids"]), SENT) == [5]
    with pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=1.5)


def test_curation_fim_terminal_stage(spark):
    """fim_rate slots in after packing exactly like corrupt_rate: windows
    carry the sentinel layout on a rate-subset, the stat records it, and
    mixing both objectives is rejected at entry."""
    import pytest

    from photo_vector_search_spark.operators.bpe import train_bpe_model
    from photo_vector_search_spark.pipelines.curation import curate_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long journey",
        "how quickly daft jumping zebras vex the watching crowd today",
    ] * 6
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bpe = train_bpe_model(docs, n_merges=50, min_count=1)
    cur, stats = curate_corpus(
        docs,
        quality_gate=False,
        bpe_model=bpe,
        pack_context_len=32,
        pack_eos_id=0,
        fim_rate=1.0,
    )
    rows = cur.collect()
    assert rows and stats["fim_transformed"] == len(rows)
    for r in rows:
        assert r["fim_applied"]
        assert 32_000 - 2 in list(r["input_ids"])  # [MID] present

    with pytest.raises(ValueError, match="mutually"):
        curate_corpus(
            docs, quality_gate=False, bpe_model=bpe,
            pack_context_len=32, pack_eos_id=0,
            fim_rate=0.5, corrupt_rate=0.15,
        )
