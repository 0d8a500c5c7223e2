"""Distributed BPE (byte-pair-encoding) tokenizer training + application.

The subword vocabulary is the one tokenizer artifact an LLM data pipeline
actually trains from the corpus (word-level `build_vocab` covers frequency
analysis; model training wants BPE merges). The architecture follows every
production trainer (Sennrich's subword-nmt, GPT-2, HF tokenizers) split
Spark-first:

1. **Corpus pass — distributed.** One explode + one map-side-combinable
   ``groupBy(word)`` turns 100 TB of text into the word-frequency dict. A
   ``min_count`` threshold (exact counts, not a top-N rank cut — no sampling
   nondeterminism) bounds the dict: Zipf guarantees the surviving dict is
   tiny relative to the corpus, and a ``max_words`` guard RAISES rather than
   silently truncating if it is not.
2. **Merge learning — driver, on the compact dict.** BPE's greedy argmax is
   inherently sequential (merge k+1 depends on k); every real trainer runs
   it on the word dict, never the corpus. The dict is the bounded small side
   (the same driver-size discipline as the ≤4096-row shuffle offsets). Ties
   break by (count desc, pair lexicographic) so the merge list is
   byte-stable across runs, partitionings, and engines.
3. **Application — distributed, Arrow-batched.** ``apply_bpe`` broadcasts
   the merge ranks and segments each document's words via the GPT-2
   lowest-rank-pair loop inside ``mapInPandas``, with a per-batch word
   cache (Zipf again: the hit rate is enormous, so per-doc cost is near the
   distinct-word cost).

Training segmentation and application agree exactly: applying the learned
merges to any dict word reproduces the symbols the trainer left for it
(tested), so tokenize(train-corpus) is self-consistent.

Reference scope note: the reference (photo_vector_search) has no text
tokenizer at all — this is part of the mandated LLM-pipeline extension,
alongside `plans/text_queries.build_vocab` (word-level ids).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import tokens

EOW = "</w>"  # end-of-word marker: keeps word-final merges distinct

# Python mirror of the Spark-side `tokens()` split: Java's \s is the ASCII
# class [ \t\n\x0B\f\r] — Python's str.split() additionally splits Unicode
# whitespace (NBSP etc.), which would segment some documents differently at
# APPLY time than the TRAINING pass counted them, breaking the
# apply==training self-consistency contract.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _py_words(text: str) -> list[str]:
    return [w for w in _JAVA_WS.split(text.lower()) if w]


def bpe_word_counts(docs: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """The word-frequency dict — the ONLY corpus-sized job in BPE training.

    One explode + one groupBy(word) with map-side partial aggregation;
    empty-string tokens (whitespace-only docs) are removed before counting,
    mirroring ``build_vocab``. ``min_count`` prunes the long tail with exact
    counts: deterministic under any partitioning, unlike a top-N cut whose
    boundary ties would depend on sort stability."""
    wc = (
        docs.select(F.explode(F.array_remove(tokens(F.col(text_col)), "")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    return wc


def _learn_merges(
    word_counts: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Exact greedy BPE on a word-frequency dict, with incremental pair-count
    maintenance (only words containing the merged pair are re-scanned) —
    O(affected words) per merge instead of O(dict)."""
    words = [list(w) + [EOW] for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in sorted(pair_words.get(best, ())):
            syms, c = words[i], counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
        # the merged pair itself must be gone regardless of bookkeeping order
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    min_count: int = 2,
    min_pair_count: int = 2,
    max_words: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (earlier = higher priority), byte-stable across runs and
    input partitionings.

    The corpus collapses to its word-frequency dict in one distributed pass;
    merges are learned exactly on the dict driver-side (the architecture of
    every production BPE trainer — the greedy argmax is sequential and the
    dict is Zipf-bounded). ``max_words`` is the honesty guard: if the
    ``min_count``-pruned dict still exceeds it, this RAISES with guidance
    instead of silently degrading — raise ``min_count`` (exact-count
    pruning keeps determinism) and retry. Learning stops early when the
    best remaining pair count falls below ``min_pair_count``."""
    pairs = collect_word_dict(docs, text_col=text_col, min_count=min_count, max_words=max_words)
    return _learn_merges(pairs, n_merges, min_pair_count)


def collect_word_dict(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int = 5_000_000,
) -> list[tuple[str, int]]:
    """Materialize the word-frequency dict driver-side in ONE corpus job:
    ``limit(max_words + 1).collect()`` bounds driver memory identically to a
    pre-count guard but without executing the explode+groupBy twice (a
    ``count()`` then ``collect()`` would run the only corpus-sized pass in
    BPE training two times). Raises when the pruned dict exceeds
    ``max_words`` — raise ``min_count`` (exact-count pruning, deterministic)
    and retry. Returns (word, count) sorted by word."""
    wc = bpe_word_counts(docs, text_col=text_col, min_count=min_count)
    rows = wc.limit(max_words + 1).collect()  # one job; driver holds ≤ max_words+1 rows
    if len(rows) > max_words:
        raise ValueError(
            f"collect_word_dict: word dict exceeds max_words={max_words}; "
            f"raise min_count (exact-count pruning, deterministic) or max_words"
        )
    # sort for determinism of the incremental bookkeeping's iteration order
    # (the algorithm is order-independent, but cheap insurance is cheap)
    return sorted((r["word"], r["n"]) for r in rows)


def _segment_word(word: str, ranks: dict[tuple[str, str], int], cache: dict) -> list[str]:
    """GPT-2-style greedy segmentation: repeatedly merge the present pair
    with the LOWEST merge rank until none applies."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        joined = best[0] + best[1]
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                out.append(joined)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    cache[word] = syms
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize each document into BPE subword tokens (ordered, ``</w>``
    marking word ends). Arrow-batched ``mapInPandas``: the merge ranks ride
    a broadcast variable, and a per-task word→segmentation cache makes the
    per-document cost approach the distinct-word cost (Zipf). NULL text →
    NULL tokens; empty/whitespace-only text → empty array. All other
    columns pass through."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    spark = docs.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    out_schema = StructType(
        [f for f in docs.schema.fields if f.name != out_col]
        + [StructField(out_col, ArrayType(StringType()), True)]
    )
    in_cols = [f.name for f in docs.schema.fields if f.name != out_col]

    def run(batches: Iterator) -> Iterator:
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}

        def tokenize(text):
            if text is None:
                return None
            out: list[str] = []
            for w in _py_words(text):
                out.extend(_segment_word(w, ranks, cache))
            return out

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = pdf[text_col].map(tokenize)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def bpe_merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merge list as a (rank, left, right) DataFrame — the persistable
    model artifact (write it next to the store; ``load`` = read + orderBy
    rank + collect)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank int, left string, right string"
    )


def bpe_vocab(merges: list[tuple[str, str]], corpus_chars: list[str]) -> dict[str, int]:
    """The symbol → id table a trained model consumes: base symbols first
    (sorted corpus characters, then ``</w>``), merged symbols after in merge
    order — the standard BPE id layout, byte-stable given the same merges
    and character inventory. ``corpus_chars`` is the training corpus's
    character set (collect it with ``corpus_charset``)."""
    vocab: dict[str, int] = {}
    for ch in sorted(set(corpus_chars)):
        vocab[ch] = len(vocab)
    vocab[EOW] = len(vocab)
    for a, b in merges:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return vocab


def charset_from_word_counts(word_counts: list[tuple[str, int]]) -> list[str]:
    """Distinct characters of an already-collected word dict — FREE
    driver-side, no corpus job. This is the charset the encode path should
    use when the dict is in hand (``collect_word_dict`` / ``train_bpe_model``):
    a separate ``corpus_charset`` pass would re-scan the corpus a second time
    for information the dict already contains.

    Exactness caveat: the charset covers the ``min_count``-PRUNED dict, so a
    character appearing ONLY in pruned (rare) words is absent and its
    symbols map to the reserved OOV id at encode time — the behavior a
    trained model wants anyway (a sub-``min_count`` character has no
    trainable embedding signal). Derive from a ``min_count=1`` dict when
    full coverage matters."""
    return sorted({ch for w, _ in word_counts for ch in w})


def train_bpe_model(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    min_count: int = 2,
    min_pair_count: int = 2,
    max_words: int = 5_000_000,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """The full training artifact — ``(merges, vocab)`` — in exactly ONE
    corpus-sized job: the word dict is collected once (``collect_word_dict``),
    merges are learned on it driver-side, and the vocab's base charset is
    derived from the same dict (``charset_from_word_counts`` — no separate
    ``corpus_charset`` pass). Feed the result straight to ``encode_bpe``;
    the encode pipeline then runs exactly one corpus job beyond
    ``apply_bpe`` itself (this one)."""
    wd = collect_word_dict(docs, text_col=text_col, min_count=min_count, max_words=max_words)
    merges = _learn_merges(wd, n_merges, min_pair_count)
    return merges, bpe_vocab(merges, charset_from_word_counts(wd))


def corpus_charset(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Distinct characters of the tokenized corpus — one explode+distinct
    (bounded: alphabets are small; collect is ≤ thousands of rows even for
    CJK corpora). Prefer ``charset_from_word_counts`` when the word dict is
    already collected (training): this pass re-scans the corpus."""
    rows = (
        docs.select(F.explode(F.array_remove(tokens(F.col(text_col)), "")).alias("w"))
        .select(F.explode(F.split(F.col("w"), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r["c"] for r in rows)


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "input_ids",
) -> DataFrame:
    """Tokenize to BPE ids — ``apply_bpe`` then the vocab lookup, fused in
    one Arrow-batched pass. Symbols outside ``vocab`` (characters unseen at
    training time) map to ``len(vocab)``, the reserved OOV id (mirroring
    ``tokenize_documents``). NULL text → NULL; empty → empty array."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    spark = docs.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    vocab_bc = spark.sparkContext.broadcast(dict(vocab))
    oov = len(vocab)
    out_schema = StructType(
        [f for f in docs.schema.fields if f.name != out_col]
        + [StructField(out_col, ArrayType(IntegerType()), True)]
    )
    in_cols = [f.name for f in docs.schema.fields if f.name != out_col]

    def run(batches):
        ranks, voc = ranks_bc.value, vocab_bc.value
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[int] = []
            for w in _py_words(text):
                out.extend(voc.get(s, oov) for s in _segment_word(w, ranks, cache))
            return out

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def decode_bpe(
    docs: DataFrame,
    vocab: dict[str, int],
    ids_col: str = "input_ids",
    out_col: str = "text_decoded",
    oov_token: str = "�",
) -> DataFrame:
    """Invert ``encode_bpe``: ids → symbols (inverse vocab lookup) → words
    (symbols concatenate to ``word</w>`` runs; split on the end-of-word
    marker) → space-joined text. Exact round trip onto the encoder's
    canonical surface: ``decode_bpe(encode_bpe(d)) == lower+ws-normalized
    text`` for every in-vocab doc (asserted in tests) — the validation/debug
    surface a tokenized-shards pipeline needs. The reserved OOV id (and any
    out-of-range id) renders as ``oov_token``. OOV LIMITATION (inherent, not
    fixable at decode time): the single OOV id erases which symbol it
    replaced — including whether it carried the ``</w>`` word-end marker —
    so a word whose FINAL symbol was out-of-vocab merges with the following
    word in the decoded surface (``x b`` → ``�b``). Word structure is exact
    only for in-vocab docs; treat any ``oov_token`` in the output as a
    boundary-uncertain region. NULL ids → NULL text; empty ids → empty
    string. Map-only Arrow pass, mirroring the encoder."""
    from pyspark.sql.types import StringType, StructField, StructType

    spark = docs.sparkSession
    inv_bc = spark.sparkContext.broadcast({i: s for s, i in vocab.items()})
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
            return " ".join(w for w in joined.split(EOW) if w != "")

        for pdf in batches:
            pdf = pdf[in_cols].copy()
            pdf[out_col] = pdf[ids_col].map(dec)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def save_bpe_model(
    spark,
    model: tuple[list[tuple[str, str]], dict[str, int]],
    path: str,
) -> None:
    """Persist a ``train_bpe_model`` artifact as two tiny parquet tables
    (``{path}/merges``: rank/left/right; ``{path}/vocab``: symbol/id) — the
    cluster-durable form a 100 TB pipeline trains ONCE and every later run
    loads (re-training would re-scan the corpus and, worse, could drift the
    ids under corpus churn)."""
    merges, vocab = model
    bpe_merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/merges"
    )
    spark.createDataFrame(
        sorted(vocab.items(), key=lambda kv: kv[1]), "symbol string, id int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab")


def load_bpe_model(
    spark, path: str
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Inverse of ``save_bpe_model``: returns ``(merges, vocab)`` ready for
    ``encode_bpe``/``decode_bpe``. Byte-exact round trip (asserted in
    tests); both tables are rank-bounded driver collects."""
    merge_rows = (
        spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    )
    merges = [(r["left"], r["right"]) for r in merge_rows]
    vocab = {
        r["symbol"]: r["id"]
        for r in spark.read.parquet(f"{path}/vocab").collect()
    }
    return merges, vocab


def tokenizer_stats(
    encoded: DataFrame,
    by: str | None = None,
    ids_col: str = "input_ids",
    text_col: str = "text",
    oov_id: int | None = None,
) -> DataFrame:
    """Tokenizer evaluation aggregate over an encoded corpus (works for BPE
    and unigram output alike — anything with ``ids_col`` next to the source
    text): per ``by``-group (or one global row) —

    - ``fertility``: pieces per whitespace word (the standard tokenizer
      quality number; lower = better compression of the language),
    - ``chars_per_piece``: source characters per piece,
    - ``oov_rate``: share of ids equal to ``oov_id`` (0.0 when not given),
    - ``n_docs / n_pieces / n_words / n_chars``: the raw sums.

    One map-side-combinable aggregation, all JVM-side expressions — the
    corpus-wide audit a tokenizer rollout gates on (a fertility regression
    on one language is invisible in global averages; pass ``by='lang'``).
    NULL-ids docs (NULL text) are excluded from every sum."""
    from photo_vector_search_spark.functions.text import token_count

    rows = encoded.filter(F.col(ids_col).isNotNull()).select(
        *([F.col(by)] if by else []),
        F.size(ids_col).alias("_p"),
        token_count(F.col(text_col)).alias("_w"),
        F.length(text_col).alias("_c"),
        (
            F.size(F.filter(ids_col, lambda x: x == F.lit(oov_id)))
            if oov_id is not None
            else F.lit(0)
        ).alias("_o"),
    )
    agg = rows.groupBy(*([by] if by else [])).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_p").alias("n_pieces"),
        F.sum("_w").alias("n_words"),
        F.sum("_c").alias("n_chars"),
        F.sum("_o").alias("_n_oov"),
    )
    return agg.select(
        *([by] if by else []),
        "n_docs",
        "n_pieces",
        "n_words",
        "n_chars",
        F.round(F.try_divide(F.col("n_pieces"), F.col("n_words")), 6).alias(
            "fertility"
        ),
        F.round(F.try_divide(F.col("n_chars"), F.col("n_pieces")), 6).alias(
            "chars_per_piece"
        ),
        F.round(F.try_divide(F.col("_n_oov"), F.col("n_pieces")), 6).alias(
            "oov_rate"
        ),
    )
