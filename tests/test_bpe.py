"""Distributed BPE training/application vs an independent naive reference.

The naive twin recounts every pair from scratch each iteration (obviously
correct, O(dict x merges)); the operator maintains counts incrementally.
Identical merge sequences on real fixture text is the value-parity check.
"""

from __future__ import annotations

from collections import Counter

import pytest

from photo_vector_search_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_merges_df,
    bpe_word_counts,
    train_bpe,
)
from photo_vector_search_spark.sources.tables import load_table


def _naive_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Recount-from-scratch reference: Sennrich's algorithm verbatim."""
    words = {w: [*w, EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges, words


def _py_word_counts(texts, min_count=1):
    c = Counter()
    for t in texts:
        if t:
            c.update(t.strip().lower().split())
    return {w: n for w, n in c.items() if n >= min_count}


def test_word_counts_match_python(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    got = {r["word"]: r["n"] for r in bpe_word_counts(docs, min_count=2).collect()}
    want = _py_word_counts([r["text"] for r in docs.select("text").collect()], 2)
    assert got == want


def test_merges_match_naive_reference_on_fixture(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    merges = train_bpe(docs, n_merges=60, min_count=2)
    wc = _py_word_counts([r["text"] for r in docs.select("text").collect()], 2)
    want, _ = _naive_bpe(wc, 60)
    assert merges == want
    assert len(merges) > 0


def test_merges_invariant_to_partitioning_and_early_stop(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    a = train_bpe(docs.repartition(13), n_merges=40, min_count=2)
    b = train_bpe(docs.coalesce(1), n_merges=40, min_count=2)
    assert a == b
    # min_pair_count high enough stops learning before n_merges
    short = train_bpe(docs, n_merges=10_000, min_count=2, min_pair_count=10_000_000)
    assert short == []


def test_apply_matches_training_segmentation(spark, sf_correct):
    """Segmenting a dict word with the learned ranks reproduces exactly the
    symbols the trainer left for it — tokenize(train corpus) is
    self-consistent — and concatenation round-trips the word."""
    docs = load_table(spark, sf_correct, "documents")
    wc = _py_word_counts([r["text"] for r in docs.select("text").collect()], 2)
    merges = train_bpe(docs, n_merges=60, min_count=2)
    _, trained_words = _naive_bpe(wc, 60)

    out = apply_bpe(docs.select("doc_id", "text"), merges).collect()
    by_id = {r["doc_id"]: r for r in out}
    raw = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    checked_words = 0
    for doc_id, text in raw.items():
        toks = by_id[doc_id]["bpe_tokens"]
        # re-split the token stream at </w> boundaries and round-trip
        words, cur = [], []
        for t in toks:
            cur.append(t)
            if t.endswith(EOW):
                words.append(cur)
                cur = []
        assert cur == []  # every word ends with an EOW-bearing token
        assert ["".join(w).removesuffix(EOW) for w in words] == text.strip().lower().split()
        for w_syms, w in zip(words, text.strip().lower().split()):
            if w in trained_words:  # dict words must match the trainer exactly
                assert w_syms == trained_words[w]
                checked_words += 1
    assert checked_words > 100


def test_apply_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "hello hello world"), (2, ""), (3, "   "), (4, None)],
        "doc_id int, text string",
    )
    merges = [("l", "l"), ("o", EOW)]
    got = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(df, merges).collect()}
    assert got[2] == [] and got[3] == []
    assert got[4] is None
    assert "".join(got[1]).count("ll") == 2


def test_max_words_guard_raises(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(docs, n_merges=5, min_count=1, max_words=3)


def test_merges_df_round_trip(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    merges = train_bpe(docs, n_merges=25, min_count=2)
    mdf = bpe_merges_df(spark, merges)
    back = [
        (r["left"], r["right"]) for r in mdf.orderBy("rank").collect()
    ]
    assert back == merges


def test_encode_ids_round_trip_and_oov(spark, sf_correct):
    from photo_vector_search_spark.operators.bpe import (
        bpe_vocab,
        corpus_charset,
        encode_bpe,
    )

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    merges = train_bpe(docs, n_merges=40, min_count=2)
    chars = corpus_charset(docs)
    vocab = bpe_vocab(merges, chars)
    # layout: base chars sorted, then EOW, then merged symbols in merge order
    assert vocab[EOW] == len(set(chars))
    assert list(vocab.values()) == list(range(len(vocab)))

    probe = docs.limit(50)
    ids = {r["doc_id"]: r["input_ids"] for r in encode_bpe(probe, merges, vocab).collect()}
    toks = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(probe, merges).collect()}
    inv = {i: s for s, i in vocab.items()}
    for d in ids:
        assert [inv[i] for i in ids[d]] == toks[d]  # ids <-> symbols exactly

    # a character unseen at training time -> OOV id everywhere it appears
    oov_df = spark.createDataFrame([(1, "héllo")], "doc_id int, text string")
    got = encode_bpe(oov_df, merges, vocab).collect()[0]["input_ids"]
    assert len(vocab) in got  # é's symbol can't be in vocab


def test_train_bpe_model_one_pass_matches_assembled_path(spark, sf_correct):
    """train_bpe_model (ONE corpus job) must equal the assembled
    train_bpe + corpus_charset + bpe_vocab path — with the documented
    caveat that its charset covers the min_count-pruned dict."""
    from photo_vector_search_spark.operators.bpe import (
        bpe_vocab,
        charset_from_word_counts,
        collect_word_dict,
        corpus_charset,
        train_bpe_model,
    )

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    merges, vocab = train_bpe_model(docs, n_merges=40, min_count=2)
    assert merges == train_bpe(docs, n_merges=40, min_count=2)
    wd = collect_word_dict(docs, min_count=2)
    assert vocab == bpe_vocab(merges, charset_from_word_counts(wd))
    # with min_count=1 the dict-derived charset IS the corpus charset
    wd1 = collect_word_dict(docs, min_count=1)
    assert charset_from_word_counts(wd1) == corpus_charset(docs)


def test_charset_from_pruned_dict_drops_rare_only_chars():
    from photo_vector_search_spark.operators.bpe import charset_from_word_counts

    # 'z' appears only in a word a min_count=2 prune would have removed
    assert charset_from_word_counts([("ab", 5)]) == ["a", "b"]
    assert charset_from_word_counts([("ab", 5), ("za", 1)]) == ["a", "b", "z"]


def test_nbsp_segmentation_matches_training(spark):
    """Java's \\s (Spark tokens()) does NOT split a non-breaking space;
    Python's str.split() does. apply/encode must mirror the TRAINING
    tokenization or NBSP docs segment differently at apply time."""
    df = spark.createDataFrame([(1, "foo bar foo bar")], "doc_id int, text string")
    wc = {r["word"]: r["n"] for r in bpe_word_counts(df).collect()}
    assert wc == {"foo bar": 2}  # one NBSP-joined word, per Java \s
    toks = apply_bpe(df, merges=[]).collect()[0]["bpe_tokens"]
    # unmerged segmentation = chars + EOW per WORD: 2 words of 7 chars, not
    # the 4 words Python whitespace-splitting would produce
    assert len(toks) == 2 * (7 + 1)
    assert "".join(toks).count(EOW) == 2


def test_decode_round_trip(spark, sf_correct):
    """decode(encode(text)) recovers the encoder's canonical surface
    (lowercased, whitespace-normalized) exactly for in-vocab corpora; OOV
    ids render as the replacement token; NULL/empty contracts hold."""
    from photo_vector_search_spark.operators.bpe import (
        decode_bpe,
        encode_bpe,
        train_bpe_model,
    )
    from photo_vector_search_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text").limit(80)
    # min_count=1: every training word stays segmentable from the charset,
    # so the round trip is exact on the training corpus itself
    merges, vocab = train_bpe_model(docs, n_merges=80, min_count=1)
    enc = encode_bpe(docs, merges, vocab)
    dec = decode_bpe(enc, vocab)
    rows = dec.select("doc_id", "text", "text_decoded").collect()
    assert len(rows) == 80
    import re

    for r in rows:
        if r["text"] is None:
            assert r["text_decoded"] is None
            continue
        want = " ".join(w for w in re.split(r"\s+", r["text"].lower()) if w)
        assert r["text_decoded"] == want, r["doc_id"]

    # OOV and empty contracts on a controlled frame
    small = spark.createDataFrame(
        [(0, [0, 1]), (1, []), (2, None), (3, [10**6])],
        "doc_id long, input_ids array<int>",
    )
    got = {
        r["doc_id"]: r["text_decoded"]
        for r in decode_bpe(small, vocab).collect()
    }
    assert got[1] == "" and got[2] is None
    assert "�" in got[3]


def test_model_persistence_round_trip(spark, sf_correct, tmp_path):
    """save_bpe_model/load_bpe_model: byte-exact (merges order, vocab ids),
    and the loaded model encodes identically to the in-memory one."""
    from photo_vector_search_spark.operators.bpe import (
        encode_bpe,
        load_bpe_model,
        save_bpe_model,
        train_bpe_model,
    )
    from photo_vector_search_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text").limit(60)
    model = train_bpe_model(docs, n_merges=50, min_count=1)
    save_bpe_model(spark, model, str(tmp_path / "bpe"))
    loaded = load_bpe_model(spark, str(tmp_path / "bpe"))
    assert loaded[0] == model[0]
    assert loaded[1] == model[1]
    a = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_bpe(docs, *model).collect()
    }
    b = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_bpe(docs, *loaded).collect()
    }
    assert a == b
