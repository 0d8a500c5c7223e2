"""Unigram-LM tokenizer (SentencePiece's unigram model, Kudo 2018) —
the probabilistic sibling of ``operators/bpe``.

BPE builds its vocabulary bottom-up by greedy pair merging; the unigram
model starts from a LARGE seed vocabulary of candidate pieces, fits piece
probabilities by EM over each word's segmentation lattice, and prunes the
vocabulary down to the target size — encoding is then the Viterbi (maximum
log-probability) segmentation. The published trade-off: unigram
tokenizations are probabilistic (enabling subword regularization via
sampling) and tend to segment morphology better than BPE's frequency
merges.

Reference parity note: the reference repo tokenizes nothing (it delegates
text handling to CLIP/Ollama, photo_vector_search.py:27-40); this module is
part of the SURVEY §2.10 tokenizer family the training-data pipeline needs.

Scale design (100 TB) — identical discipline to BPE training
(`operators/bpe.py`):
- Exactly ONE corpus-sized job: the word-frequency dict
  (``collect_word_dict`` — explode + map-side-combinable groupBy + bounded
  ``limit(max_words+1).collect()``). Seed building, EM, and pruning all run
  driver-side over the dict: per-word lattice work is
  O(len(word)·max_piece_len) per EM pass, and the dict — not the corpus —
  is the unit of iteration, so corpus size only enters through the one
  aggregation job.
- Encoding is a map-only Arrow pass with the (piece → logprob, id) tables
  broadcast and a per-task word cache — the same shape as ``encode_bpe``,
  zero shuffles.

Word-boundary convention: SentencePiece's — each word is prefixed with
"▁" (U+2581 LOWER ONE EIGHTH BLOCK) and pieces are substrings of the marked
word; decoded text splits at the marker. Every single character of the
marked words is force-kept in the vocabulary (full coverage: any training
word segments), so only characters unseen at training time encode to the
reserved OOV id ``len(vocab)`` (the ``encode_bpe``/``tokenize_documents``
contract).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from photo_vector_search_spark.operators.bpe import collect_word_dict

WORD_MARK = "▁"  # SentencePiece's word-boundary marker


def _marked_words(word_counts: list[tuple[str, int]]) -> list[tuple[str, int]]:
    return [(WORD_MARK + w, c) for w, c in word_counts]


def _seed_pieces(
    marked: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Candidate vocabulary: every substring (≤ max_piece_len) of every
    marked word, scored by frequency·length (SentencePiece's seed heuristic
    — favors long pieces that explain many characters), capped at
    ``seed_size`` by score with ALL single characters force-included (full
    coverage). Returns initial log-probs ∝ score."""
    scores: dict[str, float] = {}
    chars: set[str] = set()
    for w, c in marked:
        L = len(w)
        chars.update(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                piece = w[i:j]
                scores[piece] = scores.get(piece, 0.0) + c * (j - i)
    multi = sorted(
        ((s, p) for p, s in scores.items() if len(p) > 1),
        key=lambda kv: (-kv[0], kv[1]),
    )[: max(seed_size - len(chars), 0)]
    seed = {p: s for s, p in multi}
    for ch in chars:
        seed[ch] = scores.get(ch, 1.0)
    total = sum(seed.values())
    return {p: math.log(s / total) for p, s in seed.items()}


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _em_pass(
    marked: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One full EM iteration over the word dict: forward-backward expected
    piece counts (E), renormalize (M). Returns (new log-probs, corpus
    log-likelihood) — EM guarantees the likelihood is non-decreasing, which
    the tests pin as the correctness property."""
    expected: dict[str, float] = {}
    ll = 0.0
    for w, c in marked:
        L = len(w)
        alpha = [-math.inf] * (L + 1)
        alpha[0] = 0.0
        for i in range(1, L + 1):
            terms = []
            for j in range(max(0, i - max_piece_len), i):
                lp = logp.get(w[j:i])
                if lp is not None and alpha[j] != -math.inf:
                    terms.append(alpha[j] + lp)
            if terms:
                alpha[i] = _logsumexp(terms)
        z = alpha[L]
        if z == -math.inf:  # unsegmentable (can't happen with char coverage)
            continue
        ll += c * z
        beta = [-math.inf] * (L + 1)
        beta[L] = 0.0
        for j in range(L - 1, -1, -1):
            terms = []
            for i in range(j + 1, min(j + max_piece_len, L) + 1):
                lp = logp.get(w[j:i])
                if lp is not None and beta[i] != -math.inf:
                    terms.append(lp + beta[i])
            if terms:
                beta[j] = _logsumexp(terms)
        for j in range(L):
            if alpha[j] == -math.inf:
                continue
            for i in range(j + 1, min(j + max_piece_len, L) + 1):
                lp = logp.get(w[j:i])
                if lp is not None and beta[i] != -math.inf:
                    expected[w[j:i]] = expected.get(w[j:i], 0.0) + c * math.exp(
                        alpha[j] + lp + beta[i] - z
                    )
    total = sum(expected.values())
    log_total = math.log(total)
    # log(e) - log(total), not log(e/total): the ratio underflows to 0.0
    # for rare pieces long before log(e) does
    new_logp = {
        p: math.log(e) - log_total for p, e in expected.items() if e > 0.0
    }
    return new_logp, ll


def train_unigram_model(
    docs: DataFrame,
    vocab_size: int = 8000,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int = 1_000_000,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    shrink_keep: float = 0.75,
    em_iters_per_round: int = 2,
) -> tuple[dict[str, float], dict[str, int]]:
    """Train the unigram LM: ONE corpus job (the word dict), then driver-side
    seed → (EM ×k → prune) rounds → final EM, until ≤ ``vocab_size`` pieces.

    Pruning rung: drop the lowest-expected-count quarter
    (``1 - shrink_keep``) of the multi-character pieces each round — the
    expected-count approximation of SentencePiece's likelihood-loss ranking
    (a piece with near-zero expected count contributes near-zero likelihood;
    removing it reroutes its mass through its own sub-pieces). Single
    characters are never pruned (full coverage). Deterministic: ties break
    lexicographically.

    Returns ``(logprobs, vocab)``: piece → log-probability and piece → id
    (ids dense by (-logprob, piece); OOV id = len(vocab), the shared
    tokenizer contract)."""
    wd = collect_word_dict(
        docs, text_col=text_col, min_count=min_count, max_words=max_words
    )
    marked = _marked_words(wd)
    if not marked:
        return {}, {}
    if seed_size is None:
        seed_size = max(vocab_size * 4, vocab_size + 64)
    logp = _seed_pieces(marked, max_piece_len, seed_size)
    chars = {p for p in logp if len(p) == 1}

    while True:
        expected = None
        for _ in range(em_iters_per_round):
            logp, _ll = _em_pass(marked, logp, max_piece_len)
            # chars can drop out of EM support when every occurrence routes
            # through longer pieces; re-add at floor prob for coverage
            floor = min(logp.values()) - math.log(2.0)
            for ch in chars:
                logp.setdefault(ch, floor)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(vocab_size - len(chars), 0)
        if n_multi <= target_multi:
            break
        keep_multi = max(int(n_multi * shrink_keep), target_multi)
        if keep_multi >= n_multi:
            keep_multi = target_multi
        ranked = sorted(
            ((lp, p) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[0], kv[1]),
        )
        kept = {p for _, p in ranked[:keep_multi]}
        logp = {
            p: lp for p, lp in logp.items() if len(p) == 1 or p in kept
        }
        # renormalize after the cut
        z = _logsumexp(list(logp.values()))
        logp = {p: lp - z for p, lp in logp.items()}

    logp, _ll = _em_pass(marked, logp, max_piece_len)
    floor = min(logp.values()) - math.log(2.0)
    for ch in chars:
        logp.setdefault(ch, floor)
    z = _logsumexp(list(logp.values()))
    logp = {p: lp - z for p, lp in logp.items()}
    vocab = {
        p: i
        for i, p in enumerate(
            sorted(logp, key=lambda p: (-logp[p], p))
        )
    }
    return logp, vocab


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str] | None:
    """Maximum-log-probability segmentation of one marked word (None when
    some character has no piece — the OOV word case). Ties break toward the
    FEWER-pieces split, then lexicographically smaller piece at the last
    boundary — deterministic across runs and engines."""
    L = len(word)
    best = [(-math.inf, 0, "")] * (L + 1)
    best[0] = (0.0, 0, "")
    back = [-1] * (L + 1)
    for i in range(1, L + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j][0] == -math.inf:
                continue
            # best[j][1] already holds -n_pieces; appending a piece is -1
            # more (the first cut re-negated it, flipping the fewer-pieces
            # tie-break on every odd/even count boundary — caught by review,
            # pinned in test_viterbi_tie_breaks_to_fewer_pieces)
            cand = (
                best[j][0] + lp,
                best[j][1] - 1,
                word[j:i],
            )
            # maximize (logprob, -n_pieces); ties -> lexicographically
            # SMALLEST final piece, so invert the piece for comparison
            cur = best[i]
            if (cand[0], cand[1]) > (cur[0], cur[1]) or (
                (cand[0], cand[1]) == (cur[0], cur[1])
                and (cur[2] == "" or cand[2] < cur[2])
            ):
                best[i] = cand
                back[i] = j
    if best[L][0] == -math.inf:
        return None
    pieces: list[str] = []
    i = L
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def sample_segment(
    word: str,
    logp: dict[str, float],
    rng,
    alpha: float = 0.5,
    max_piece_len: int = 8,
) -> list[str] | None:
    """One segmentation SAMPLED from the lattice posterior with temperature
    ``alpha`` — P(seg) ∝ (Π p(piece))^alpha — by forward-filtering
    backward-sampling (exact: forward alphas under the alpha-scaled model,
    then each boundary drawn from its true conditional). alpha → ∞ recovers
    Viterbi; alpha = 0 is uniform over segmentations. None when the word is
    uncoverable (same contract as ``viterbi_segment``)."""
    L = len(word)
    alphas = [-math.inf] * (L + 1)
    alphas[0] = 0.0
    for i in range(1, L + 1):
        terms = []
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alphas[j] != -math.inf:
                terms.append(alphas[j] + alpha * lp)
        if terms:
            alphas[i] = _logsumexp(terms)
    if alphas[L] == -math.inf:
        return None
    pieces: list[str] = []
    i = L
    while i > 0:
        opts, weights = [], []
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alphas[j] != -math.inf:
                opts.append(j)
                weights.append(math.exp(alphas[j] + alpha * lp - alphas[i]))
        # weights sum to 1 by construction of alphas[i]; guard float dust
        r = rng.random() * sum(weights)
        acc = 0.0
        pick = opts[-1]
        for j, w in zip(opts, weights):
            acc += w
            if r <= acc:
                pick = j
                break
        pieces.append(word[pick:i])
        i = pick
    return pieces[::-1]


def encode_unigram_sampled(
    docs: DataFrame,
    logp: dict[str, float],
    vocab: dict[str, int],
    alpha: float = 0.5,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "input_ids",
    max_piece_len: int = 8,
) -> DataFrame:
    """Subword regularization (Kudo 2018 §3): tokenize with a SAMPLED
    segmentation per word occurrence instead of Viterbi — the stochastic
    tokenization that regularizes subword models in training. Each word
    occurrence draws independently from the exact lattice posterior at
    temperature ``alpha`` (``sample_segment``).

    Distributed determinism: the corruption-operator convention — every
    row's draws depend ONLY on (seed, row id), via a per-row md5-seeded
    PRNG, so output is partitioning-invariant (Spark's seeded rand streams
    are not). Same OOV/NULL contracts and map-only Arrow shape as
    ``encode_unigram``; no per-task cache (samples must stay independent
    per occurrence)."""
    import hashlib
    import random as _random

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = docs.sparkSession
    logp_bc = spark.sparkContext.broadcast(dict(logp))
    vocab_bc = spark.sparkContext.broadcast(dict(vocab))
    oov = len(vocab)
    out_schema = StructType(
        [f for f in docs.schema.fields if f.name != out_col]
        + [StructField(out_col, ArrayType(IntegerType()), True)]
    )
    in_cols = [f.name for f in docs.schema.fields if f.name != out_col]

    def run(batches):
        lp, voc = logp_bc.value, vocab_bc.value

        def enc(text, rid):
            if text is None:
                return None
            rng = _random.Random(
                int.from_bytes(
                    hashlib.md5(f"{seed}|{rid}".encode()).digest()[:8],
                    "big",
                )
            )
            out: list[int] = []
            for w in text.strip().lower().split():
                marked = WORD_MARK + w
                seg = sample_segment(marked, lp, rng, alpha, max_piece_len)
                if seg is None:
                    # uncovered chars -> OOV id; covered runs sampled
                    run_start = 0
                    for k, ch in enumerate(marked):
                        if ch not in lp:
                            if k > run_start:
                                sub = sample_segment(
                                    marked[run_start:k], lp, rng, alpha,
                                    max_piece_len,
                                )
                                out.extend(voc.get(s, oov) for s in sub)
                            out.append(oov)
                            run_start = k + 1
                    if run_start < len(marked):
                        sub = sample_segment(
                            marked[run_start:], lp, rng, alpha, max_piece_len
                        )
                        out.extend(voc.get(s, oov) for s in sub)
                else:
                    out.extend(voc.get(s, oov) for s in seg)
            return out

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = [
                enc(t, r) for t, r in zip(pdf[text_col], pdf[id_col])
            ]
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def encode_unigram(
    docs: DataFrame,
    logp: dict[str, float],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "input_ids",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize to unigram ids: Viterbi per word, fused with the vocab
    lookup in one Arrow-batched pass (the ``encode_bpe`` shape — broadcast
    tables, per-task word cache, zero shuffles). Words containing
    characters outside the model segment greedily around them: covered
    runs Viterbi-encode, uncovered characters map to the reserved OOV id
    ``len(vocab)``. NULL text → NULL; empty → empty array."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = docs.sparkSession
    logp_bc = spark.sparkContext.broadcast(dict(logp))
    vocab_bc = spark.sparkContext.broadcast(dict(vocab))
    oov = len(vocab)
    out_schema = StructType(
        [f for f in docs.schema.fields if f.name != out_col]
        + [StructField(out_col, ArrayType(IntegerType()), True)]
    )
    in_cols = [f.name for f in docs.schema.fields if f.name != out_col]

    def run(batches):
        lp, voc = logp_bc.value, vocab_bc.value
        cache: dict[str, list[int]] = {}

        def enc_word(w: str) -> list[int]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            marked = WORD_MARK + w
            seg = viterbi_segment(marked, lp, max_piece_len)
            if seg is None:
                # split at uncovered characters; Viterbi the covered runs
                ids: list[int] = []
                run_start = 0
                for k, ch in enumerate(marked):
                    if ch not in lp:
                        if k > run_start:
                            sub = viterbi_segment(
                                marked[run_start:k], lp, max_piece_len
                            )
                            ids.extend(voc.get(s, oov) for s in sub)
                        ids.append(oov)
                        run_start = k + 1
                if run_start < len(marked):
                    sub = viterbi_segment(
                        marked[run_start:], lp, max_piece_len
                    )
                    ids.extend(voc.get(s, oov) for s in sub)
            else:
                ids = [voc.get(s, oov) for s in seg]
            cache[w] = ids
            return ids

        def enc(text):
            if text is None:
                return None
            out: list[int] = []
            for w in text.strip().lower().split():
                out.extend(enc_word(w))
            return out

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def decode_unigram(
    docs: DataFrame,
    vocab: dict[str, int],
    ids_col: str = "input_ids",
    out_col: str = "text_decoded",
    oov_token: str = "�",
) -> DataFrame:
    """Invert ``encode_unigram``: ids → pieces → concatenate → split at the
    word marker → space-joined text. Exact round trip onto the encoder's
    canonical surface (lower + whitespace-normalized) for in-vocab docs,
    pinned in tests. OOV ids render as ``oov_token`` (boundary-uncertain,
    the ``decode_bpe`` caveat). Map-only Arrow pass."""
    from pyspark.sql.types import StringType, StructField, StructType

    spark = docs.sparkSession
    inv_bc = spark.sparkContext.broadcast({i: p for p, i in vocab.items()})
    out_schema = StructType(
        [f for f in docs.schema.fields if f.name != out_col]
        + [StructField(out_col, StringType(), True)]
    )
    in_cols = [f.name for f in docs.schema.fields if f.name != out_col]

    def run(batches):
        inv = inv_bc.value

        def dec(ids):
            if ids is None:
                return None
            joined = "".join(inv.get(int(i), oov_token) for i in ids)
            return " ".join(
                w for w in joined.split(WORD_MARK) if w != ""
            )

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = pdf[ids_col].map(dec)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def unigram_pieces_df(
    spark, logp: dict[str, float], vocab: dict[str, int]
) -> DataFrame:
    """Persistable artifact: (piece, id, logprob) — write to parquet, reload
    with ``load_unigram_pieces``. The BPE ``bpe_merges_df`` persistence
    contract."""
    rows = [(p, vocab[p], float(logp[p])) for p in vocab]
    return spark.createDataFrame(rows, "piece string, id int, logprob double")


def load_unigram_pieces(
    pieces: DataFrame,
) -> tuple[dict[str, float], dict[str, int]]:
    """Inverse of ``unigram_pieces_df`` (bounded collect: vocab-sized)."""
    rows = pieces.select("piece", "id", "logprob").collect()
    logp = {r["piece"]: r["logprob"] for r in rows}
    vocab = {r["piece"]: r["id"] for r in rows}
    return logp, vocab
