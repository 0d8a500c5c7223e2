"""Fixed-length sequence packing vs an independent Python reference
(collect → concat in order → rechunk), plus partitioning invariance and the
doc-boundary/EOS/edge contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.packing import pack_token_windows


def _py_pack(rows, L, eos_id=None, keep_partial=False):
    """rows: [(order, ids-or-None)] — the obviously-correct serial packer."""
    stream: list[int] = []
    bounds: list[int] = []  # doc start offsets in the stream (non-NULL docs)
    for _o, ids in sorted(rows):
        if ids is None:
            continue
        bounds.append(len(stream))
        stream.extend(ids)
        if eos_id is not None:
            stream.append(eos_id)
    out = {}
    for s in range(0, len(stream), L):
        chunk = stream[s : s + L]
        if len(chunk) < L and not keep_partial:
            continue
        n_docs = sum(
            1
            for i, b in enumerate(bounds)
            if b < s + len(chunk)
            and (bounds[i + 1] if i + 1 < len(bounds) else len(stream)) > s
        )
        out[s // L] = (chunk, len(chunk), n_docs)
    return out


def _spark_pack(spark, rows, L, **kw):
    df = spark.createDataFrame(rows, "pos long, input_ids array<int>")
    got = {
        r["seq_id"]: (list(r["input_ids"]), r["n_tokens"], r["n_docs"])
        for r in pack_token_windows(df, L, **kw).collect()
    }
    return got


def _fixture_rows(n_docs=300, seed=7):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if i % 37 == 5:
            rows.append((i, None))  # absent
        elif i % 23 == 3:
            rows.append((i, []))  # empty doc
        else:
            rows.append((i, [rng.randrange(1000) for _ in range(rng.randrange(1, 40))]))
    return rows


def test_matches_python_reference(spark):
    rows = _fixture_rows()
    want = _py_pack(rows, 64)
    got = _spark_pack(spark, rows, 64)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    assert all(v[1] == 64 for v in got.values())


def test_eos_and_doc_counts(spark):
    rows = [(0, [1, 2, 3]), (1, [4, 5]), (2, [6, 7, 8, 9])]
    # with eos=0: stream = 1 2 3 0 4 5 0 6 7 8 9 0  (12 tokens)
    got = _spark_pack(spark, rows, 4, eos_id=0)
    want = _py_pack(rows, 4, eos_id=0)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    assert got[0][0] == [1, 2, 3, 0]
    assert got[1][0] == [4, 5, 0, 6]
    assert got[2][0] == [7, 8, 9, 0]
    # window 1 spans docs 1 and 2
    assert got[1][2] == 2
    # empty doc still emits its EOS separator; NULL contributes nothing
    rows2 = [(0, [1, 2, 3]), (1, []), (2, None), (3, [4])]
    got2 = _spark_pack(spark, rows2, 5, eos_id=0)
    assert got2[0][0] == [1, 2, 3, 0, 0]


def test_partial_window_dropped_or_kept(spark):
    rows = [(0, [1, 2, 3, 4, 5, 6, 7])]
    assert set(_spark_pack(spark, rows, 4)) == {0}
    kept = _spark_pack(spark, rows, 4, keep_partial=True)
    assert kept[1] == ([5, 6, 7], 3, 1)


def test_partitioning_invariance_and_sparse_order(spark):
    rows = _fixture_rows(200, seed=11)
    # sparse, non-dense order values (e.g. a filtered corpus keeps its pos)
    rows = [(o * 97 + 13, ids) for o, ids in rows]
    df = spark.createDataFrame(rows, "pos long, input_ids array<int>")
    a = {
        r["seq_id"]: list(r["input_ids"])
        for r in pack_token_windows(df.repartition(17), 32).collect()
    }
    b = {
        r["seq_id"]: list(r["input_ids"])
        for r in pack_token_windows(df.coalesce(1), 32).collect()
    }
    assert a == b
    want = _py_pack(rows, 32)
    assert a == {k: v[0] for k, v in want.items()}


def test_empty_input_and_long_doc_spanning_many_windows(spark):
    empty = spark.createDataFrame([], "pos long, input_ids array<int>")
    assert pack_token_windows(empty, 8).count() == 0
    # one doc much longer than L: spans many windows exactly
    rows = [(0, list(range(100))), (1, [100, 101])]
    got = _spark_pack(spark, rows, 8)
    want = _py_pack(rows, 8)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    assert len(got) == 102 // 8
