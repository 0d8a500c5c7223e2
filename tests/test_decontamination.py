"""Span-level decontamination: planted-contamination fragment checks, the
overlap/adjacency closed-form complement, case/whitespace contracts, the
min-fragment floor, and full parity against an independently written pure-
Python reference (its own tokenizer, its own interval union + complement —
no shared helpers) plus a DuckDB list-function twin on the same corpus."""

from __future__ import annotations

import random

import pytest

from photo_vector_search_spark.operators.decontamination import (
    decontaminate_spans,
)


# --- independent reference: explicit interval UNION then complement ------
def _ref(docs, bench, n, min_frag):
    bench_grams = set()
    for _, text in bench:
        toks = text.strip().lower().split()
        for i in range(len(toks) - n + 1):
            bench_grams.add(" ".join(toks[i : i + n]))
    out = []
    for doc_id, text in docs:
        toks = text.strip().split()
        low = [t.lower() for t in toks]
        hits = [
            i
            for i in range(len(low) - n + 1)
            if " ".join(low[i : i + n]) in bench_grams
        ]
        if not hits:
            out.append((doc_id, 0, len(toks), text))
            continue
        covered = set()
        for s in hits:
            covered.update(range(s, s + n))
        frags, cur = [], []
        for i in range(len(toks)):
            if i in covered:
                if cur:
                    frags.append(cur)
                cur = []
            else:
                cur.append(toks[i])
        if cur:
            frags.append(cur)
        for idx, frag in enumerate(f for f in frags if len(f) >= max(min_frag, 1)):
            out.append((doc_id, idx, len(frag), " ".join(frag)))
    return sorted(out)


def _run(spark, docs, bench, n, min_frag):
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame(bench, "doc_id string, text string")
    rows = decontaminate_spans(
        ddf, bdf, n=n, min_fragment_tokens=min_frag
    ).collect()
    return sorted((r.doc_id, r.frag_idx, r.n_tokens, r.text) for r in rows)


def _words(rng, k):
    return " ".join(f"w{rng.randrange(40)}" for _ in range(k))


def test_planted_contamination_splits_at_known_offsets(spark):
    bench = [("b0", "alpha beta gamma")]
    # doc: 5 clean + the 3-gram + 4 clean tokens
    docs = [("d0", "one two three four five alpha beta gamma six seven eight nine")]
    got = _run(spark, docs, bench, n=3, min_frag=1)
    assert got == [
        ("d0", 0, 5, "one two three four five"),
        ("d0", 1, 4, "six seven eight nine"),
    ]


def test_overlapping_and_adjacent_hits_merge(spark):
    # "a b c d" contains both "a b c" and "b c d" (overlap) — one removed
    # span, not two fragments of junk between them
    bench = [("b0", "a b c"), ("b1", "b c d")]
    docs = [("d0", "x y z a b c d p q r")]
    got = _run(spark, docs, bench, n=3, min_frag=1)
    assert got == [("d0", 0, 3, "x y z"), ("d0", 1, 3, "p q r")]
    # adjacent (back-to-back) windows also yield no empty fragment between
    docs2 = [("d1", "x y z a b c d e f p q r")]
    bench2 = [("b0", "a b c"), ("b1", "d e f")]
    got2 = _run(spark, docs2, bench2, n=3, min_frag=1)
    assert got2 == [("d1", 0, 3, "x y z"), ("d1", 1, 3, "p q r")]


def test_clean_docs_pass_verbatim_and_matching_is_case_insensitive(spark):
    bench = [("b0", "Alpha BETA gamma")]
    docs = [
        ("clean", "  spaced\tout\n\ntext   kept verbatim  "),
        ("hit", "Keep1 Keep2 ALPHA beta GaMmA Tail1 Tail2"),
    ]
    got = _run(spark, docs, bench, n=3, min_frag=1)
    assert ("clean", 0, 5, "  spaced\tout\n\ntext   kept verbatim  ") in got
    # case preserved in the surviving fragments, match found despite casing
    assert ("hit", 0, 2, "Keep1 Keep2") in got
    assert ("hit", 1, 2, "Tail1 Tail2") in got
    assert len(got) == 3


def test_min_fragment_floor_drops_shrapnel(spark):
    bench = [("b0", "a b c")]
    docs = [("d0", "t1 t2 a b c t3 t4 t5 t6 t7 t8 t9 t10")]
    got = _run(spark, docs, bench, n=3, min_frag=3)
    # the 2-token head is shrapnel; the 8-token tail survives as frag 0
    assert got == [("d0", 0, 8, "t3 t4 t5 t6 t7 t8 t9 t10")]


def test_hit_at_both_edges_and_whole_doc_contaminated(spark):
    bench = [("b0", "a b c")]
    docs = [
        ("edge", "a b c mid1 mid2 mid3 a b c"),
        ("whole", "a b c"),
        ("short", "x y"),  # shorter than n: no grams, clean
    ]
    got = _run(spark, docs, bench, n=3, min_frag=1)
    assert got == [
        ("edge", 0, 3, "mid1 mid2 mid3"),
        ("short", 0, 2, "x y"),
    ]


def test_parity_with_independent_reference(spark):
    rng = random.Random(4242)
    bench = [(f"b{i}", _words(rng, rng.randrange(13, 40))) for i in range(6)]
    docs = []
    for i in range(120):
        text = _words(rng, rng.randrange(1, 80))
        if i % 4 == 0:  # plant a benchmark excerpt mid-doc
            src = bench[rng.randrange(len(bench))][1].split()
            k = rng.randrange(0, max(len(src) - 13, 1))
            text = f"{text} {' '.join(src[k:k + 13 + rng.randrange(6)])} {_words(rng, rng.randrange(1, 40))}"
        docs.append((f"d{i:03d}", text))
    assert _run(spark, docs, bench, n=13, min_frag=5) == _ref(
        docs, bench, n=13, min_frag=5
    )


def test_duckdb_twin_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(99)
    bench = [(f"b{i}", _words(rng, 20)) for i in range(4)]
    docs = []
    for i in range(60):
        text = _words(rng, rng.randrange(1, 50))
        if i % 3 == 0:
            src = bench[rng.randrange(len(bench))][1].split()
            text = f"{text} {' '.join(src[2:2 + 7])} {_words(rng, 10)}"
        docs.append((f"d{i:03d}", text))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.execute("CREATE TABLE bench(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench)
    n, min_frag = 7, 2
    twin = con.execute(f"""
WITH btoks AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM bench
),
bgrams AS (
  SELECT DISTINCT unnest(list_transform(
           generate_series(1, greatest(0, len(t) - {n} + 1)),
           i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))) AS gram
  FROM btoks
),
dtoks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks, text
  FROM docs
),
dgrams AS (
  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
    SELECT doc_id, unnest(list_transform(
             generate_series(1, greatest(0, len(toks) - {n} + 1)),
             i -> struct_pack(pos := i - 1,
                    gram := array_to_string(
                      list_transform(list_slice(toks, i, i + {n} - 1),
                                     x -> lower(x)), ' ')))) AS u
    FROM dtoks)
),
hits AS (
  SELECT doc_id, list_sort(list(pos)) AS starts
  FROM dgrams JOIN bgrams USING (gram) GROUP BY doc_id
),
marked AS (
  SELECT d.doc_id, d.toks, d.text, h.starts FROM dtoks d
  LEFT JOIN hits h USING (doc_id)
),
gaps AS (
  SELECT doc_id, toks,
         list_filter(
           list_transform(
             generate_series(0, len(starts)),
             i -> struct_pack(
               lo := CASE WHEN i = 0 THEN 0 ELSE starts[i] + {n} END,
               hi := CASE WHEN i = len(starts) THEN len(toks)
                          ELSE starts[i + 1] END)),
           g -> g.hi - g.lo >= {max(min_frag, 1)}) AS frags
  FROM marked WHERE starts IS NOT NULL
),
split_rows AS (
  SELECT doc_id, u.frag_idx AS frag_idx, u.n_tokens AS n_tokens,
         u.text AS text FROM (
    SELECT doc_id, unnest(list_transform(
             generate_series(1, len(frags)),
             i -> struct_pack(frag_idx := i - 1,
                    n_tokens := frags[i].hi - frags[i].lo,
                    text := array_to_string(
                      list_slice(toks, frags[i].lo + 1, frags[i].hi),
                      ' ')))) AS u
    FROM gaps)
),
clean_rows AS (
  SELECT doc_id, 0 AS frag_idx, len(toks) AS n_tokens, text
  FROM marked WHERE starts IS NULL
)
SELECT * FROM clean_rows UNION ALL SELECT * FROM split_rows
ORDER BY doc_id, frag_idx
""").fetchall()
    got = _run(spark, docs, bench, n=n, min_frag=min_frag)
    assert got == sorted((r[0], r[1], r[2], r[3]) for r in twin)


# --- rewrite rung ---------------------------------------------------------
def _run_rw(spark, docs, bench, n, min_frag):
    from photo_vector_search_spark.operators.decontamination import (
        decontaminate_rewrite,
    )

    ddf = spark.createDataFrame(docs, "doc_id string, text string, meta int")
    bdf = spark.createDataFrame(
        [(d, t) for d, t in bench], "doc_id string, text string"
    )
    rows = decontaminate_rewrite(
        ddf, bdf, n=n, min_fragment_tokens=min_frag
    ).collect()
    return {r.doc_id: (r.text, r.n_removed_tokens, r.meta) for r in rows}


def test_rewrite_matches_split_fragments_and_passes_columns(spark):
    bench = [("b0", "a b c")]
    docs = [
        ("clean", "  keep\tme   verbatim ", 7),
        ("hit", "h1 h2 h3 a b c t1 t2 t3 t4", 9),
        ("allgone", "a b c", 3),
    ]
    got = _run_rw(spark, docs, bench, n=3, min_frag=1)
    # untouched: verbatim text, zero removed, metadata intact
    assert got["clean"] == ("  keep\tme   verbatim ", 0, 7)
    # rewritten: surviving fragments token-joined in order; 3 tokens removed
    assert got["hit"] == ("h1 h2 h3 t1 t2 t3 t4", 3, 9)
    # fully contaminated doc dropped
    assert "allgone" not in got
    # rewrite ≡ split: same surviving tokens as the fragment rows, joined
    frag = _run(
        spark, [(d, t) for d, t, _ in docs], bench, n=3, min_frag=1
    )
    joined = " ".join(
        t for (d, _, _, t) in sorted(frag) if d == "hit"
    )
    assert joined == got["hit"][0]


def test_rewrite_min_fragment_floor(spark):
    bench = [("b0", "a b c")]
    docs = [("d0", "t1 t2 a b c t3 t4 t5 t6 t7 t8 t9 t10", 0)]
    got = _run_rw(spark, docs, bench, n=3, min_frag=3)
    # the 2-token head is shrapnel (dropped AND counted as removed)
    assert got["d0"] == ("t3 t4 t5 t6 t7 t8 t9 t10", 5, 0)


def test_null_text_passes_through_both_rungs(spark):
    """NULL-text docs yield one (0, 0, NULL) fragment in the spans rung
    (regression: size(NULL) is -1/-NULL and once produced a negative-length
    garbage fragment) and pass verbatim through the rewrite rung."""
    from photo_vector_search_spark.operators.decontamination import (
        decontaminate_rewrite,
    )

    bench = spark.createDataFrame(
        [("b0", "a b c")], "doc_id string, text string"
    )
    docs = spark.createDataFrame(
        [("nul", None), ("ok", "x y z")], "doc_id string, text string"
    )
    frags = {
        r["doc_id"]: r
        for r in decontaminate_spans(docs, bench, n=3, min_fragment_tokens=1).collect()
    }
    assert frags["nul"]["frag_idx"] == 0
    assert frags["nul"]["n_tokens"] == 0
    assert frags["nul"]["text"] is None
    assert frags["ok"]["text"] == "x y z"

    rw = {
        r["doc_id"]: r
        for r in decontaminate_rewrite(
            docs, bench, n=3, min_fragment_tokens=1
        ).collect()
    }
    assert rw["nul"]["text"] is None and rw["nul"]["n_removed_tokens"] == 0
