"""Independent-reference cross-checks for the paired-oracle dedup operators.

The DuckDB oracles run the SAME banding algorithms as the Spark plans, so a
conceptual bug would pass both engines (memory-noted hazard from round 1). These
tests re-implement the full MinHash-LSH and SimHash pipelines in plain Python
sets/ints — no Spark, no SQL, no shared expression code — and require the Spark
output to match EXACTLY on a 200-doc corpus with planted near-duplicates.
(Template: the asof-vs-DuckDB-native-ASOF test.)"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from photo_vector_search_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_P,
    NUM_HASHES,
    SIMHASH_BITS,
    minhash_perms,
)

# ----------------------------------------------------------- python reference


def _py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _py_shingle_set(text: str, n: int = 3) -> set[str]:
    toks = _py_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_minhash_signature(shingles: set[str]) -> list[int]:
    hs = [_py_hash32(s) for s in shingles]
    return [min((a * h + b) % MINHASH_P for h in hs) for _, a, b in minhash_perms(NUM_HASHES)]


def _py_band_keys(sig: list[int]) -> list[tuple[int, str]]:
    rpb = NUM_HASHES // LSH_BANDS
    return [
        (b, hashlib.md5(",".join(str(x) for x in sig[b * rpb : (b + 1) * rpb]).encode()).hexdigest())
        for b in range(LSH_BANDS)
    ]


def _py_minhash_lsh_pairs(texts: dict[int, str], n: int, tau: float) -> dict[tuple[int, int], float]:
    sets = {i: _py_shingle_set(t, n) for i, t in texts.items()}
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sh in sets.items():
        if not sh:
            continue
        for bk in _py_band_keys(_py_minhash_signature(sh)):
            buckets.setdefault(bk, []).append(i)
    cands = set()
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cands.add((members[x], members[y]))
    out = {}
    for a, b in cands:
        inter = len(sets[a] & sets[b])
        if not inter:
            continue
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= tau:
            out[(a, b)] = round(jac, 6)
    return out


def _py_simhash(text: str) -> int:
    toks = set(_py_tokens(text))
    sums = [0] * SIMHASH_BITS
    for t in toks:
        h = _py_hash32(t)
        for b in range(SIMHASH_BITS):
            sums[b] += ((h >> b) & 1) * 2 - 1
    return sum(1 << b for b in range(SIMHASH_BITS) if sums[b] > 0)


def _py_simhash_pairs(texts: dict[int, str], max_hamming: int) -> dict[tuple[int, int], int]:
    fps = {i: _py_simhash(t) for i, t in texts.items()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, fp in fps.items():
        for band in range(4):
            buckets.setdefault((band, (fp >> (band * 8)) & 255), []).append(i)
    out = {}
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                ham = bin(fps[a] ^ fps[b]).count("1")
                if ham <= max_hamming:
                    out[(a, b)] = ham
    return out


# ----------------------------------------------------------------- the corpus

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu apple river stone cloud meadow"
).split()


@pytest.fixture(scope="module")
def corpus() -> dict[int, str]:
    """200 docs: 140 random, 30 perturbed near-dup copies (~10% token swaps),
    30 moderate rewrites — a spread of Jaccard values around the 0.5 threshold."""
    rng = random.Random(20260813)
    texts: dict[int, str] = {}
    for i in range(140):
        texts[i] = " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(12, 30)))
    for j in range(30):  # strong near-dups of docs 0..29
        toks = texts[j].split()
        for _ in range(max(1, len(toks) // 10)):
            toks[rng.randrange(len(toks))] = rng.choice(_VOCAB)
        texts[140 + j] = " ".join(toks)
    for j in range(30):  # weaker rewrites of docs 30..59
        toks = texts[30 + j].split()
        for _ in range(max(1, len(toks) // 3)):
            toks[rng.randrange(len(toks))] = rng.choice(_VOCAB)
        texts[170 + j] = " ".join(toks)
    return texts


def _docs_df(spark, texts):
    return spark.createDataFrame(list(texts.items()), "doc_id long, text string")


# ------------------------------------------------------------------ the tests


def test_minhash_lsh_pipeline_matches_pure_python(spark, corpus):
    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(_docs_df(spark, corpus), n=3, tau=0.5).collect()
    }
    expect = _py_minhash_lsh_pairs(corpus, n=3, tau=0.5)
    assert got == expect
    assert len(expect) >= 20, "corpus must actually exercise the near-dup regime"


def test_minhash_verified_pairs_subset_of_bruteforce(spark, corpus):
    """Precision is exact by construction: every emitted pair must equal the
    brute-force set-Jaccard value and pass tau; recall on the planted strong
    near-dups must be total (their similarity makes banding collision ~certain)."""
    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(_docs_df(spark, corpus), n=3, tau=0.5).collect()
    }
    sets = {i: _py_shingle_set(t, 3) for i, t in corpus.items()}
    for (a, b), jac in got.items():
        inter = len(sets[a] & sets[b])
        true_jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
        assert jac == true_jac and true_jac >= 0.5
    strong = {(j, 140 + j) for j in range(30)
              if _true_jac(sets[j], sets[140 + j]) >= 0.7}
    assert strong <= set(got), f"missed strong planted dups: {strong - set(got)}"


def _true_jac(sa: set, sb: set) -> float:
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if inter else 0.0


def test_simhash_fingerprints_match_pure_python(spark, corpus):
    from photo_vector_search_spark.operators.dedup import simhash

    small = {i: corpus[i] for i in list(corpus)[:60]}
    got = {r.doc_id: r.simhash for r in simhash(_docs_df(spark, small)).collect()}
    assert got == {i: _py_simhash(t) for i, t in small.items()}


def test_simhash_pairs_match_pure_python(spark, corpus):
    from photo_vector_search_spark.operators.dedup import simhash_pairs

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(_docs_df(spark, corpus), max_hamming=6).collect()
    }
    assert got == _py_simhash_pairs(corpus, max_hamming=6)
