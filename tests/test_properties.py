"""Hypothesis property tests (SURVEY §5.2): pure-Python twins fuzzed hard,
Spark operators validated on generated inputs against Python reference
implementations (few examples — each costs a Spark job)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from photo_vector_search_spark.operators.dedup import MINHASH_P, minhash_perms
from photo_vector_search_spark.pipelines.embed import STUB_DIM, stub_embed_one

# --------------------------------------------------------------- python twins


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_stub_embedding_unit_norm_and_deterministic(t):
    e1 = stub_embed_one(t)
    e2 = stub_embed_one(t)
    assert e1 == e2 and len(e1) == STUB_DIM
    assert math.isclose(sum(x * x for x in e1), 1.0, abs_tol=1e-9)


@given(st.text(max_size=100), st.text(max_size=100))
@settings(max_examples=100)
def test_stub_embedding_injective_in_practice(a, b):
    if a != b:
        assert stub_embed_one(a) != stub_embed_one(b)


def test_minhash_perm_constants_overflow_safe():
    """a < 2^30 and h < 2^32 ⇒ a*h + b < 2^62 + 2^32: no int64 overflow in Spark
    ANSI mode, no HUGEINT promotion drift in DuckDB."""
    for i, a, b in minhash_perms(64):
        assert 0 < a < (1 << 30) and a % 2 == 1
        assert 0 <= b < (1 << 32)
        assert a * ((1 << 32) - 1) + b < (1 << 62) + (1 << 32)
    assert MINHASH_P > (1 << 32)


# ------------------------------------------------------- spark vs python twin

_word = st.sampled_from(["spark", "join", "sort", "the", "a", "data", "row", "x1"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().strip().split(" ")
    return {" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}


def _py_jaccard_pairs(texts: list[str], tau: float) -> dict[tuple[int, int], float]:
    out = {}
    sets = [_py_shingles(t) for t in texts]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= tau:
                out[(i, j)] = round(jac, 6)
    return out


@given(st.lists(_doc, min_size=2, max_size=8))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_jaccard_pairs_matches_python_reference(spark_session_holder, docs_texts):
    from photo_vector_search_spark.operators.dedup import jaccard_pairs

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(df, 3, 0.3).collect()}
    expect = _py_jaccard_pairs(docs_texts, 0.3)
    assert got == expect


@given(
    st.dictionaries(st.integers(0, 20), st.integers(0, 5), min_size=0, max_size=10),
    st.dictionaries(st.integers(0, 20), st.integers(6, 9), min_size=0, max_size=10),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_upsert_laws(spark_session_holder, existing_kv, updates_kv):
    from photo_vector_search_spark.operators.store import merge_upsert

    spark = spark_session_holder
    schema = "id long, v long"
    existing = spark.createDataFrame(list(existing_kv.items()) or [], schema)
    updates = spark.createDataFrame(list(updates_kv.items()) or [], schema)
    merged = {r.id: r.v for r in merge_upsert(existing, updates, ["id"]).collect()}
    assert merged == {**existing_kv, **updates_kv}  # last-write-wins, key union


_ts = st.integers(0, 50)  # small event-time domain to force boundary collisions


def _py_asof(left_rows, right_rows):
    """Brute-force backward as-of (inclusive): for each left (id, key, ts) the
    right row with max ts_r <= ts within key; right unique per (key, ts)."""
    out = {}
    for lid, key, lts in left_rows:
        best = None
        for rkey, rts, v in right_rows:
            if rkey == key and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        if best is not None:
            out[lid] = best
    return out


@given(
    st.lists(st.tuples(st.integers(0, 2), _ts, st.integers(0, 9)), min_size=0, max_size=12),
    st.lists(st.tuples(st.integers(0, 2), _ts), min_size=0, max_size=12),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_python_reference(spark_session_holder, right_raw, left_raw):
    import datetime

    from photo_vector_search_spark.operators.joins import asof_join_backward

    spark = spark_session_holder
    base = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    right_rows = {(k, t): v for k, t, v in right_raw}  # unique per (key, ts)
    right_rows = [(k, t, v) for (k, t), v in right_rows.items()]
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left_raw)]
    right = spark.createDataFrame(
        [(k, base + t * sec, float(v)) for k, t, v in right_rows] or [],
        "key long, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [(i, k, base + t * sec) for i, k, t in left_rows] or [],
        "event_id long, key long, ts timestamp",
    )
    got = {
        r.event_id: (int((r.matched_ts - base).total_seconds()), r.v)
        for r in asof_join_backward(
            left, right, by=["key"], left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    expect = {lid: (t, float(v)) for lid, (t, v) in _py_asof(left_rows, right_rows).items()}
    assert got == expect


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = text.lower().strip().split(" ")
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 4))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_word_ngrams_matches_python_reference(spark_session_holder, docs_texts, n):
    """Guards the Spark sequence(1,0)-is-DESCENDING pitfall for every n and every
    short-input shape hypothesis finds (docs with < n tokens must yield [])."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.functions.text import tokens, word_ngrams

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: list(r.grams)
        for r in df.select(
            "doc_id", word_ngrams(tokens(F.col("text")), n).alias("grams")
        ).collect()
    }
    assert got == {i: _py_ngrams(t, n) for i, t in enumerate(docs_texts)}


def _py_pack(tok_counts: list[int], cap: int) -> dict[int, int]:
    """doc index -> pack_id by exclusive running-sum div cap."""
    out, run = {}, 0
    for i, c in enumerate(tok_counts):
        out[i] = run // cap
        run += c
    return out


@given(st.lists(st.integers(0, 40), min_size=1, max_size=15), st.integers(8, 64))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_assignment_matches_python_reference(spark_session_holder, counts, cap):
    """The window-cumsum pack assignment (q_pack_documents's kernel) against the
    obvious sequential fold, on arbitrary token-count shapes incl. zeros."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tok long"
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    got = {
        r.doc_id: r.pack_id
        for r in df.withColumn(
            "pack_id",
            (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / cap).cast("long"),
        ).collect()
    }
    assert got == _py_pack(counts, cap)


def _py_chunks(text: str, size: int, stride: int) -> list[tuple[int, int, list[str]]]:
    """(chunk_id, n_tok, chunk_toks) by the obvious sequential slide."""
    import re

    toks = re.split(r"\s+", text.lower().strip())
    return [
        (cid, len(toks[s : s + size]), toks[s : s + size])
        for cid, s in enumerate(range(0, max(len(toks), 1), stride))
    ]


@given(
    st.lists(_doc, min_size=1, max_size=6),
    st.integers(1, 8),
    st.integers(1, 8),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_tokens_matches_python_reference(spark_session_holder, docs_texts, size, stride):
    """chunk_tokens (q_chunk_documents's kernel) vs a sequential Python slide,
    over arbitrary size/stride shapes incl. stride > size (gaps) and
    whitespace-only docs (one single-empty-token chunk)."""
    from photo_vector_search_spark.plans.text_queries import chunk_tokens

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_tok, list(r.chunk_toks))
        for r in chunk_tokens(df, size=size, stride=stride).collect()
    }
    expect = {
        (i, cid): (n, toks)
        for i, t in enumerate(docs_texts)
        for cid, n, toks in _py_chunks(t, size, stride)
    }
    assert got == expect


# pytest fixture bridging: hypothesis needs a non-function-scoped spark handle
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


# ------------------------------------------------- round-5 operator properties


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_redact_pii_idempotent_python_level(texts):
    """redact(redact(x)) == redact(x): replacement tokens (<EMAIL> etc.)
    contain no characters any rule can match, so a second pass is a no-op.
    Checked with Python re (same RE2∩Java subset) to keep fuzzing cheap —
    the Spark/DuckDB twin parity is tests/test_redact.py."""
    import re

    from photo_vector_search_spark.functions.redact import PII_RULES

    def redact(s: str) -> str:
        for _, pat, repl in PII_RULES:
            s = re.sub(pat, repl, s)
        return s

    for t in texts:
        once = redact(t)
        assert redact(once) == once


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["alpha beta", "COMMON FOOTER", "x y z", "", "  ", "unique-ish"]
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boilerplate_subset_and_order(spark, line_lists):
    """For ANY corpus: each output doc's lines are a subsequence of its input
    lines (order preserved, nothing invented), removed lines are exactly those
    whose df >= min_docs, and blank lines always survive."""
    from photo_vector_search_spark.operators.dedup import remove_boilerplate_lines

    docs = [(i, "\n".join(ls)) for i, ls in enumerate(line_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean"].split("\n") if r["clean"] != "" else [""]
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    # python reference
    from collections import defaultdict

    docs_lines = {i: ("\n".join(ls)).split("\n") for i, ls in enumerate(line_lists)}
    dfc = defaultdict(set)
    for i, ls in docs_lines.items():
        for ln in ls:
            if ln.strip():
                dfc[ln].add(i)
    hot = {ln for ln, s in dfc.items() if len(s) >= 2}
    expect = {
        i: [ln for ln in ls if ln not in hot] for i, ls in docs_lines.items()
    }
    expect = {i: ls for i, ls in expect.items() if ls}
    assert got == expect


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(min_value=0, max_value=999), max_size=25),
        ),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=9),
    st.booleans(),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_windows_matches_serial_reference(spark, docs, L, use_eos):
    """Property form of the r7 packing contract: for ANY doc list (NULLs,
    empties, ragged lengths) and any context length, the distributed packer
    equals the obviously-correct serial concat-and-rechunk."""
    from tests.test_packing import _py_pack

    from photo_vector_search_spark.operators.packing import pack_token_windows

    rows = [(i, ids) for i, ids in enumerate(docs)]
    df = spark.createDataFrame(rows, "pos long, input_ids array<int>")
    eos = 1000 if use_eos else None
    got = {
        r["seq_id"]: (list(r["input_ids"]), r["n_docs"])
        for r in pack_token_windows(df, L, eos_id=eos).collect()
    }
    want = {
        k: (chunk, nd) for k, (chunk, _n, nd) in _py_pack(rows, L, eos_id=eos).items()
    }
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=60),
    st.floats(min_value=0.0, max_value=0.6, exclude_max=True),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_span_corruption_lossless_for_any_window(ids, rate, seed):
    """Property form of the r7 corruption contract: for ANY window, rate and
    seed, reconstruct(corrupt(w)) == w — driven through the same kernel the
    Arrow pass runs (layout + splice logic, no Spark needed)."""
    import hashlib
    import random

    from photo_vector_search_spark.operators.corruption import (
        _span_layout,
        reconstruct_spans,
    )

    SENT = 32_000
    rng = random.Random(
        int.from_bytes(hashlib.md5(f"{seed}|0".encode()).digest()[:8], "big")
    )
    spans = _span_layout(rng, len(ids), rate, 3.0)
    inp, tgt, last = [], [], 0
    for si, (start, slen) in enumerate(spans):
        inp.extend(ids[last:start])
        inp.append(SENT - si)
        tgt.append(SENT - si)
        tgt.extend(ids[start : start + slen])
        last = start + slen
    inp.extend(ids[last:])
    assert reconstruct_spans(inp, tgt, SENT) == list(ids)
    # layout sanity: spans in-bounds, ordered, non-adjacent, never at pos 0
    pos = 0
    for start, slen in spans:
        # strictly after the previous span's end: spans separated by >= 1
        # kept token, and never at position 0 (leading gap)
        assert start > pos and slen >= 1 and start + slen <= len(ids)
        pos = start + slen


# ------------------------------------------------ round-10b operator properties


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5).map(float)),  # score (ties!)
            st.integers(0, 20),  # token cost
        ),
        min_size=0,
        max_size=18,
    ),
    st.integers(0, 60),  # budget
    st.booleans(),  # walk direction
    st.sampled_from([1, 3, 256]),  # bucket counts incl. degenerate
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_budget_select_matches_prefix_reference(
    spark_session_holder, rows, budget, ascending, n_buckets
):
    """budget_select == the plain-Python global prefix walk for ANY scores
    (NULLs, heavy ties), token costs (zeros), budget, direction and
    bucketing — the bucketed two-pass form is provably order-equivalent."""
    from photo_vector_search_spark.operators.selection import budget_select

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, s, t, "x") for i, (s, t) in enumerate(rows)],
        "doc_id long, score double, tok long, text string",
    )
    got = {
        r["doc_id"]
        for r in budget_select(
            df, budget, score_col="score", token_col="tok",
            ascending=ascending, n_buckets=n_buckets,
        ).collect()
    }
    # reference: sort by (score with NULLs last, id), keep while cum <= budget
    def key(i_s_t):
        i, (s, t) = i_s_t
        k = float("inf") if s is None else (s if ascending else -s)
        return (k, i)

    want, cum = set(), 0
    for i, (s, t) in sorted(enumerate(rows), key=key):
        cum += t
        if cum > budget:
            break
        want.add(i)
    assert got == want


@given(
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=14),
    st.integers(13, 20),  # number of docs (every pair endpoint exists)
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_leakage_split_matches_union_find(spark_session_holder, pairs, n_docs):
    """leakage_safe_split's group ids == plain union-find components (min
    member), and no pair ever straddles a split."""
    from photo_vector_search_spark.operators.splits import leakage_safe_split

    spark = spark_session_holder
    pairs = [(a, b) for a, b in pairs if a != b]
    docs = spark.createDataFrame(
        [(i, "t") for i in range(n_docs)], "doc_id long, text string"
    )
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "doc_a long, doc_b long"
    ).filter("doc_a != doc_b")
    out = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in leakage_safe_split(
            docs, pdf, {"train": 0.7, "test": 0.3}
        ).collect()
    }
    # union-find reference
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n_docs):
        comp.setdefault(find(i), []).append(i)
    want_group = {i: min(comp[find(i)]) for i in range(n_docs)}
    assert {i: g for i, (g, _) in out.items()} == want_group
    for a, b in pairs:
        assert out[a][1] == out[b][1], (a, b)


@given(
    st.lists(
        st.lists(st.sampled_from(["aaaa", "bbbb", "cc", "dddd", ""]),
                 min_size=0, max_size=5),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_dedup_paragraphs_matches_keep_first_reference(
    spark_session_holder, paragraph_lists
):
    """dedup_paragraphs == the plain keep-first walk over (doc_id, pos) for
    arbitrary repeated/blank/short paragraphs."""
    from photo_vector_search_spark.operators.dedup import dedup_paragraphs

    spark = spark_session_holder
    min_chars = 3  # "cc" is exempt, "" is blank structure
    docs = spark.createDataFrame(
        [(i, "\n".join(ps)) for i, ps in enumerate(paragraph_lists)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean"] for r in dedup_paragraphs(docs, min_chars).collect()
    }
    seen, want = set(), {}
    for i, ps in enumerate(paragraph_lists):
        # model the operator's framing exactly: the doc's text is the JOIN,
        # re-split on newline — an empty text is ONE blank paragraph
        ps = "\n".join(ps).split("\n")
        kept = []
        for p in ps:
            if len(p.strip()) < min_chars:
                kept.append(p)  # blank/short: structure, always kept
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            want[i] = "\n".join(kept)
    assert got == want


# ------------------------------------------------ round-11 operator properties

_R11_LINES = st.sampled_from(
    [
        "Good first line with plenty of words here.",
        "Another surviving line carries enough words too!",
        "Does this question line carry enough words today?",
        'He said "the quote closes this line properly."',
        "short one.",
        "no terminal punctuation but several words here",
        "tiny.",
        "",
        "   ",
    ]
)


@given(
    st.lists(st.lists(_R11_LINES, min_size=0, max_size=6), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=3),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_c4_clean_matches_python_reference(spark, line_lists, min_words, min_lines):
    """c4_clean == the plain per-line walk of Raffel et al. §2.2 for ANY
    combination of terminal/short/blank lines and page-level gates."""
    import re

    from photo_vector_search_spark.pipelines.quality import c4_clean

    docs = spark.createDataFrame(
        [(i, "\n".join(ls)) for i, ls in enumerate(line_lists)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean"]
        for r in c4_clean(docs, min_words=min_words, min_lines=min_lines).collect()
    }
    term = re.compile(r'[.!?]["”]?\s*$')
    want = {}
    for i, ls in enumerate(line_lists):
        text = "\n".join(ls)
        if "lorem ipsum" in text.lower() or "{" in text:
            continue
        # model the operator's framing: join then re-split (an empty list
        # becomes ONE empty line)
        kept = [
            ln
            for ln in text.split("\n")
            if term.search(ln) and len(ln.strip().split()) >= min_words
        ]
        if len(kept) >= min_lines:
            want[i] = "\n".join(kept)
    assert got == want


_R11_WORDS = st.sampled_from(
    ["spark", "fox", "dog", "river", "query", "the", "a", "engine"]
)
_R11_DOC = st.lists(_R11_WORDS, min_size=0, max_size=10).map(" ".join)


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    docs = {
        i: [w for w in t.lower().strip().split() if w]
        for i, t in enumerate(texts)
        if t is not None
    }
    n = len(docs)
    total = sum(len(v) for v in docs.values())
    if n == 0 or total == 0:
        return {}
    avgdl = total / n
    df = {t: sum(1 for v in docs.values() if t in v) for t in terms}
    out = {}
    for i, toks in docs.items():
        s = 0.0
        hit = 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if hit:
            out[i] = (round(s, 6), hit)
    return out


@given(st.lists(_R11_DOC, min_size=1, max_size=8), st.lists(_R11_WORDS, min_size=1, max_size=3))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_matches_python_reference(spark, texts, qwords):
    """bm25_scores == the textbook per-doc walk (Lucene idf) for ANY tiny
    corpus and query drawn from the shared word pool — including all-empty
    docs (empty result), absent terms, and repeated query words (the
    distinct-terms rule)."""
    from photo_vector_search_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    query = " ".join(qwords)
    from photo_vector_search_spark.operators.bm25 import query_terms

    got = {
        r["doc_id"]: (r["bm25"], r["n_terms"])
        for r in bm25_scores(docs, query).collect()
    }
    want = _py_bm25(texts, query_terms(query))
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1], i
        assert math.isclose(got[i][0], want[i][0], abs_tol=2e-6), (i, got[i], want[i])


@given(
    st.lists(  # each run: a permutation-ish ranked list over a doc pool
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=1, max_value=90),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rrf_matches_python_reference_and_is_run_order_invariant(spark, runs, k):
    """rrf_fuse == Σ 1/(k + rank) per (query, doc) for ANY rank lists, and
    equal-weight fusion is invariant to the ORDER of the runs."""
    from photo_vector_search_spark.operators.fusion import rrf_fuse

    frames = [
        spark.createDataFrame(
            [(0, d, r + 1) for r, d in enumerate(docs)],
            "query_id long, doc_id long, rank long",
        )
        for docs in runs
    ]
    got = {
        r["doc_id"]: r["rrf_score"] for r in rrf_fuse(frames, k=k).collect()
    }
    want: dict[int, float] = {}
    for docs in runs:
        for r, d in enumerate(docs):
            want[d] = want.get(d, 0.0) + 1.0 / (k + r + 1)
    want = {d: round(s, 6) for d, s in want.items()}
    assert got == want
    rev = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(list(reversed(frames)), k=k).collect()
    }
    assert rev == got


@given(
    st.lists(_R11_DOC, min_size=1, max_size=6),
    st.lists(_R11_DOC, min_size=1, max_size=6),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_dedup_against_matches_set_difference(spark, new_texts, ref_texts):
    """exact_dedup_against == normalized-text set difference for ANY pair of
    corpora (whitespace-collapse + lowercase normalization, the
    doc_fingerprint contract)."""
    import re as _re

    from photo_vector_search_spark.operators.cross_dedup import exact_dedup_against

    norm = lambda t: _re.sub(r"\s+", " ", t.lower().strip())  # noqa: E731
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_texts)], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in exact_dedup_against(new, ref).collect()}
    ref_set = {norm(t) for t in ref_texts}
    want = {i for i, t in enumerate(new_texts) if norm(t) not in ref_set}
    assert got == want
