"""Fixed-length sequence packing vs an independent Python reference
(collect → concat in order → rechunk), plus partitioning invariance and the
doc-boundary/EOS/edge contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.packing import pack_token_windows


def _py_pack(rows, L, eos_id=None, keep_partial=False):
    """rows: [(order, ids-or-None)] — the obviously-correct serial packer.
    n_docs counts docs whose token interval [start, end) intersects the
    window: an EMPTY interval (zero-length doc without EOS) contributes no
    tokens and is not counted — the engine's contract."""
    stream: list[int] = []
    spans: list[tuple[int, int]] = []  # (start, end) per non-NULL doc
    for _o, ids in sorted(rows):
        if ids is None:
            continue
        start = len(stream)
        stream.extend(ids)
        if eos_id is not None:
            stream.append(eos_id)
        spans.append((start, len(stream)))
    out = {}
    for s in range(0, len(stream), L):
        chunk = stream[s : s + L]
        if len(chunk) < L and not keep_partial:
            continue
        n_docs = sum(
            1 for b, e in spans if b < s + len(chunk) and e > s and e > b
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


# ---------------------------------------------------------------------------
# pack_sequences — the boundary-respecting SFT packer


def _py_hash32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_pack_sequences(rows, L, eos_id=None, pad_id=None, n_shards=8,
                       overflow="truncate"):
    """Independent serial next-fit packer: shard by md5-prefix hash, walk in
    order, never split a doc."""
    shards = {}
    for o, ids in sorted(rows):
        if ids is None:
            continue
        shards.setdefault(_py_hash32(str(o)) % n_shards, []).append((o, ids))
    out = {}
    for sh, docs in shards.items():
        packs, cur = [], None
        for o, ids in docs:
            ids = list(ids) + ([eos_id] if eos_id is not None else [])
            if not ids:
                continue
            if len(ids) > L:
                if overflow == "drop":
                    continue
                ids = (ids[: L - 1] + [eos_id]) if eos_id is not None else ids[:L]
            if cur is None or cur["fill"] + len(ids) > L:
                cur = {"fill": 0, "ids": [], "docs": [], "lens": []}
                packs.append(cur)
            cur["fill"] += len(ids)
            cur["ids"].extend(ids)
            cur["docs"].append(o)
            cur["lens"].append(len(ids))
        for pid, p in enumerate(packs):
            ids = p["ids"] + [pad_id] * (L - p["fill"]) if pad_id is not None else p["ids"]
            out[(sh, pid)] = (ids, p["fill"], p["docs"], p["lens"])
    return out


def _collect_sequences(df):
    return {
        (r["shard"], r["pack_id"]): (
            list(r["input_ids"]),
            r["n_tokens"],
            list(r["doc_ids"]),
            list(r["seq_lens"]),
        )
        for r in df.collect()
    }


def test_pack_sequences_matches_python_reference(spark):
    from photo_vector_search_spark.operators.packing import pack_sequences

    rows = _fixture_rows()
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    for kw in (
        dict(eos_id=0, pad_id=-1),
        dict(eos_id=None, pad_id=None),
        dict(eos_id=7, pad_id=None, n_shards=3),
    ):
        got = _collect_sequences(pack_sequences(df, 64, **kw))
        want = _py_pack_sequences(rows, 64, **{
            "eos_id": kw.get("eos_id"), "pad_id": kw.get("pad_id"),
            "n_shards": kw.get("n_shards", 8)})
        assert got == want, kw


def test_pack_sequences_invariants_and_partitioning(spark):
    from photo_vector_search_spark.operators.packing import pack_sequences

    rows = _fixture_rows(n_docs=250, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    out = pack_sequences(df, 48, eos_id=0, pad_id=-1).collect()
    # every pack: padded to L, fill ≤ L, seq_lens sum to fill, docs whole
    by_doc = {o: ids for o, ids in rows if ids is not None}
    for r in out:
        assert len(r["input_ids"]) == 48
        assert r["n_tokens"] <= 48
        assert sum(r["seq_lens"]) == r["n_tokens"]
        assert r["n_docs"] == len(r["doc_ids"])
        # reconstruct: each doc's ids appear contiguously, in doc order
        off = 0
        for d, ln in zip(r["doc_ids"], r["seq_lens"]):
            want = (by_doc[d] + [0])[:ln]
            assert list(r["input_ids"][off : off + ln]) == want, d
            off += ln
        assert all(t == -1 for t in r["input_ids"][r["n_tokens"]:])
    # no doc lost or duplicated (every non-NULL doc packs: eos makes empties real)
    packed = [d for r in out for d in r["doc_ids"]]
    assert sorted(packed) == sorted(by_doc)
    # partitioning invariance: hash-sharding keys on values, not partitions
    again = _collect_sequences(
        pack_sequences(df.repartition(13), 48, eos_id=0, pad_id=-1)
    )
    assert again == _collect_sequences(
        pack_sequences(df.coalesce(1), 48, eos_id=0, pad_id=-1)
    )


def test_pack_sequences_overflow_contracts(spark):
    import pytest

    from photo_vector_search_spark.operators.packing import pack_sequences

    rows = [(1, list(range(100))), (2, [1, 2, 3])]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    # truncate: long doc fills one pack exactly, EOS survives as last token
    trunc = {r["doc_ids"][0]: r for r in
             pack_sequences(df, 16, eos_id=0, n_shards=1).collect()}
    assert trunc[1]["n_tokens"] == 16
    assert list(trunc[1]["input_ids"])[-1] == 0
    assert list(trunc[1]["input_ids"])[:15] == list(range(15))
    # drop: the long doc vanishes
    dropped = pack_sequences(df, 16, eos_id=0, n_shards=1, overflow="drop")
    assert [r["doc_ids"] for r in dropped.collect()] == [[2]]
    # error: raises at execution
    with pytest.raises(Exception, match="context_len"):
        pack_sequences(df, 16, eos_id=0, n_shards=1, overflow="error").collect()
    with pytest.raises(ValueError, match="overflow"):
        pack_sequences(df, 16, overflow="nope")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, 0)


def test_pack_sequences_duckdb_recursive_twin(spark):
    """The next-fit rule replays in SQL (recursive CTE over the sharded,
    ordered docs) — certifying the operator as a declared-surface candidate."""
    import duckdb

    from photo_vector_search_spark.operators.packing import pack_sequences

    rows = [(o, ids) for o, ids in _fixture_rows(n_docs=120, seed=3)]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    got = {
        (r["shard"], r["pack_id"], tuple(r["doc_ids"]), r["n_tokens"])
        for r in pack_sequences(df, 32, eos_id=0, n_shards=4).collect()
    }

    con = duckdb.connect()
    try:
        import pandas as pd

        con.register(
            "docs",
            pd.DataFrame(
                [(o, list(ids)) for o, ids in rows if ids is not None],
                columns=["doc_id", "input_ids"],
            ),
        )
        twin = con.execute(
            """
WITH RECURSIVE lens AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 4 AS INT) AS shard,
         least(len(input_ids) + 1, 32) AS e,
         row_number() OVER (
           PARTITION BY CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 4 AS INT)
           ORDER BY doc_id) AS rn
  FROM docs
),
fit AS (
  SELECT shard, rn, doc_id, e, CAST(0 AS BIGINT) AS pack_id, e AS fill
  FROM lens WHERE rn = 1
  UNION ALL
  SELECT l.shard, l.rn, l.doc_id, l.e,
         CASE WHEN f.fill + l.e > 32 THEN f.pack_id + 1 ELSE f.pack_id END,
         CASE WHEN f.fill + l.e > 32 THEN l.e ELSE f.fill + l.e END
  FROM lens l JOIN fit f ON l.shard = f.shard AND l.rn = f.rn + 1
)
SELECT shard, pack_id, list(doc_id ORDER BY rn) AS doc_ids,
       CAST(sum(e) AS INT) AS n_tokens
FROM fit GROUP BY shard, pack_id
            """
        ).fetchall()
    finally:
        con.close()
    twin_set = {(s, p, tuple(d), n) for s, p, d, n in twin}
    assert twin_set == got


def _py_pack_sequences_ffd(rows, L, eos_id=None, n_shards=8, max_open_bins=1024):
    """Independent FFD reference: per shard sort by (effective len desc, id),
    first-fit over open bins in creation order, fullest-bin eviction past the
    cap, remaining bins emitted in creation order."""
    shards = {}
    for o, ids in sorted(rows):
        if ids is None:
            continue
        shards.setdefault(_py_hash32(str(o)) % n_shards, []).append((o, ids))
    out = {}
    for sh, docs in shards.items():
        prepped = []
        for o, ids in docs:
            ids = list(ids) + ([eos_id] if eos_id is not None else [])
            if not ids:
                continue
            if len(ids) > L:
                ids = (ids[: L - 1] + [eos_id]) if eos_id is not None else ids[:L]
            prepped.append((o, ids))
        prepped.sort(key=lambda t: (-len(t[1]), t[0]))
        bins, emitted = [], []
        for o, ids in prepped:
            b = next((x for x in bins if len(x["ids"]) + len(ids) <= L), None)
            if b is None:
                b = {"ids": [], "docs": [], "lens": []}
                bins.append(b)
                if len(bins) > max_open_bins:
                    full = max(bins, key=lambda x: len(x["ids"]))
                    emitted.append(full)
                    bins.remove(full)
            b["ids"].extend(ids)
            b["docs"].append(o)
            b["lens"].append(len(ids))
        emitted.extend(b for b in bins if b["docs"])
        for pid, b in enumerate(emitted):
            out[(sh, pid)] = (b["ids"], len(b["ids"]), b["docs"], b["lens"])
    return out


def test_pack_sequences_ffd_matches_reference_and_beats_nextfit(spark):
    from photo_vector_search_spark.operators.packing import pack_sequences

    rows = _fixture_rows(n_docs=300, seed=21)
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    got = {
        (r["shard"], r["pack_id"]): (
            list(r["input_ids"]), r["n_tokens"], list(r["doc_ids"]),
            list(r["seq_lens"]),
        )
        for r in pack_sequences(df, 48, eos_id=0, algorithm="ffd").collect()
    }
    want = _py_pack_sequences_ffd(rows, 48, eos_id=0)
    assert got == want
    # density: FFD needs no more bins than next-fit, usually fewer
    n_nextfit = pack_sequences(df, 48, eos_id=0).count()
    assert len(got) <= n_nextfit
    # every bin respects the budget; no doc lost
    assert all(n <= 48 for _, n, _, _ in got.values())
    packed = sorted(d for _, _, ds, _ in got.values() for d in ds)
    assert packed == sorted(o for o, ids in rows if ids is not None)
    # partitioning invariance
    again = {
        (r["shard"], r["pack_id"]): tuple(r["doc_ids"])
        for r in pack_sequences(
            df.repartition(11), 48, eos_id=0, algorithm="ffd"
        ).collect()
    }
    assert again == {k: tuple(d) for k, (_, _, d, _) in want.items()}


def test_pack_sequences_ffd_bounded_open_bins(spark):
    from photo_vector_search_spark.operators.packing import pack_sequences

    # lengths engineered so unbounded FFD would hold many open bins: lots of
    # L-1 docs (each its own bin) followed by 1-token docs that fit them
    rows = [(i, [7] * 15) for i in range(40)] + [
        (100 + i, [9]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    bounded = _py_pack_sequences_ffd(rows, 16, n_shards=1, max_open_bins=4)
    got = {
        (r["shard"], r["pack_id"]): tuple(r["doc_ids"])
        for r in pack_sequences(
            df, 16, n_shards=1, algorithm="ffd", max_open_bins=4
        ).collect()
    }
    assert got == {k: tuple(d) for k, (_, _, d, _) in bounded.items()}
    import pytest

    with pytest.raises(ValueError, match="algorithm"):
        pack_sequences(df, 16, algorithm="bestfit")
    with pytest.raises(ValueError, match="max_open_bins"):
        pack_sequences(df, 16, algorithm="ffd", max_open_bins=0)
