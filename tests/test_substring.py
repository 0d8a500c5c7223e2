"""Repeated n-gram span removal vs an independent Python reference that
implements the same rule naively (count every n-gram, keep the global
min-(doc_id,pos) occurrence, drop every token covered by another hot
occurrence)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.substring import (
    remove_repeated_ngrams,
    repeated_ngram_spans,
)
from photo_vector_search_spark.sources.tables import load_table


def _py_remove(texts: dict[int, str | None], n: int, min_dup: int):
    toks = {
        d: (t.strip().lower().split() if t is not None else None)
        for d, t in texts.items()
    }
    occ = defaultdict(list)
    for d in sorted(toks):
        tt = toks[d]
        if tt is None:
            continue
        for p in range(len(tt) - n + 1):
            occ[tuple(tt[p : p + n])].append((d, p))
    drop = defaultdict(set)  # doc -> token indexes covered by non-keeper spans
    keep = defaultdict(set)  # doc -> token indexes covered by KEEPER spans
    for gram, places in occ.items():
        if len(places) < min_dup:
            continue
        kd, kp = min(places)
        keep[kd].update(range(kp, kp + n))
        for d, p in places:
            if (d, p) != (kd, kp):
                drop[d].update(range(p, p + n))
    out = {}
    for d, tt in toks.items():
        if tt is None:
            out[d] = (None, None)
        else:
            kept = [
                w
                for j, w in enumerate(tt)
                if j not in drop[d] or j in keep[d]  # keeper coverage wins
            ]
            out[d] = (" ".join(kept), len(tt) - len(kept))
    return out


def _fixture_with_shared_passages(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    # graft a shared passage into several docs so cross-doc spans exist at n=5
    passage = F.lit(" the quick brown fox jumps over the lazy dog again and again")
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), passage)).otherwise(
            F.col("text")
        ),
    )


def test_matches_python_reference(spark, sf_correct):
    docs = _fixture_with_shared_passages(spark, sf_correct)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = _py_remove(texts, n=5, min_dup=2)
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_repeated_ngrams(docs, n=5, min_dup=2).collect()
    }
    assert got == want
    assert sum(1 for t, nr in got.values() if nr and nr > 0) > 5  # it did work


def test_full_passage_removed_not_just_first_window(spark):
    """L>n duplicated span: the overlapping hot windows cover the WHOLE
    passage, so it disappears entirely from the non-keeper doc."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, f"one two {shared} three"), (2, f"{shared} four five")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_repeated_ngrams(df, n=3, min_dup=2).collect()
    }
    assert got[1] == f"one two {shared} three"  # keeper doc intact
    assert got[2] == "four five"  # entire passage gone, remainder kept


def test_partitioning_invariance_and_edge_cases(spark, sf_correct):
    docs = _fixture_with_shared_passages(spark, sf_correct)
    a = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_repeated_ngrams(docs.repartition(11), n=5).collect()
    }
    b = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_repeated_ngrams(docs.coalesce(1), n=5).collect()
    }
    assert a == b
    edge = spark.createDataFrame(
        [(1, "short doc"), (2, None), (3, ""), (4, "x y z"), (5, "x y z")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in remove_repeated_ngrams(edge, n=3).collect()}
    assert got[1]["text_deduped"] == "short doc"  # shorter than n: unchanged
    assert got[2]["text_deduped"] is None and got[2]["n_removed_tokens"] is None
    assert got[3]["text_deduped"] == "" and got[3]["n_removed_tokens"] == 0
    assert got[4]["text_deduped"] == "x y z"  # keeper (min doc_id)
    assert got[5]["text_deduped"] == "" and got[5]["n_removed_tokens"] == 3


def test_spans_exclude_keeper_and_count_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "z a b c")],
        "doc_id int, text string",
    )
    spans = repeated_ngram_spans(df, n=3, min_dup=2).collect()
    got = {(r["doc_id"], r["pos"]) for r in spans}
    # "a b c" occurs at (1,0) keeper, (2,0), (3,1): keeper excluded
    assert got == {(2, 0), (3, 1)}


def test_boundary_shifted_tokens_do_not_collide(spark):
    """["ab","c",...] vs ["a","bc",...]: a separator-less gram join would
    hash these identically and falsely dedup; the space join must not."""
    df = spark.createDataFrame(
        [(1, "ab c d e f"), (2, "a bc d e f")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_repeated_ngrams(df, n=5, min_dup=2).collect()
    }
    assert got == {1: ("ab c d e f", 0), 2: ("a bc d e f", 0)}


def test_identical_token_run_preserves_keeper_span(spark):
    """Self-overlapping repeat: every window of a 20-token run shares one
    hash; the non-keeper windows overlap the keeper window, which must
    still survive verbatim (keeper-span protection)."""
    run = " ".join(["tok"] * 20)
    df = spark.createDataFrame(
        [(1, run), (2, run)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_repeated_ngrams(df, n=10, min_dup=2).collect()
    }
    # doc 1 holds the keeper window [0,9]: those 10 tokens survive, the
    # rest of the run (covered only by non-keeper windows) is removed;
    # doc 2 is entirely non-keeper and vanishes
    assert got[1] == (" ".join(["tok"] * 10), 10)
    assert got[2] == ("", 20)
    # and the generic Python reference agrees
    want = _py_remove({1: run, 2: run}, n=10, min_dup=2)
    assert {d: got[d] for d in got} == want
