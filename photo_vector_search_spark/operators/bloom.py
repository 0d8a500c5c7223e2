"""Distributed Bloom filter in pure DataFrame ops — the broadcast-side
COMPRESSION rung for membership tests at 100 TB.

The exact decontamination semi-join broadcasts the benchmark's distinct
shingle STRINGS; fine while benchmarks are MBs, but a large held-out set
(a whole eval suite, a previous training run's corpus) can outgrow the
broadcast budget long before the bitmap of a Bloom filter does: m bits at
1% FPP is ~9.6 bits per item vs ~50-200 bits per shingle string — a
10-20x smaller broadcast with ZERO false negatives (the safe direction for
decontamination: it can only over-drop, never leak a contaminated doc).

Spark-first shape (PySpark 4 exposes no ``stat.bloomFilter`` and the
``bloom_filter_agg`` expression is not registered, so the filter is built
from relational primitives — which also keeps it engine-inspectable):

- **Build**: k positions per value via seeded ``xxhash64`` (JVM-side,
  whole-stage codegen) → pack into 64-bit words with one map-side-combinable
  ``groupBy(word) bit_or`` → collect ≤ m/64 longs (guarded) → one-row
  bitmap table.
- **Probe**: broadcast the one-row bitmap (BroadcastNestedLoopJoin of a
  single row), then each candidate tests its k bits with
  ``element_at``/``shiftright``/``&`` — all Catalyst, no Python, no shuffle.

FPP math is the standard optimum: m = −n·ln p/ln²2 (rounded up to whole
words), k = round(m/n·ln 2). Not oracle-declared: membership is
probabilistic and the hash is engine-specific (the same FIXTURES.md policy
as the HLL/KLL sketches); the FP bound and the zero-FN guarantee are
pinned against the exact operator in tests/test_bloom.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# collect guard: m/64 longs land on the driver once at build time.
# 2^30 bits = 16M longs = 128 MB bitmap — about the sane broadcast ceiling.
MAX_BITS = 1 << 30


@dataclass(frozen=True)
class BloomModel:
    """A built filter: bit count, hash count, and the packed 64-bit words
    (python ints, length n_bits // 64). Persist as a tiny parquet of
    (idx, word) rows if it must outlive the session."""

    n_bits: int
    n_hashes: int
    words: list[int]

    @property
    def n_set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)


def _positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The k bit positions of a value: pmod(xxhash64(seed_i, v), m). Seeding
    by a literal first argument gives k independent 64-bit streams without
    leaving codegen."""
    return [
        F.pmod(F.xxhash64(F.lit(i), col), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (n_bits rounded to whole 64-bit words, n_hashes)."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    if m > MAX_BITS:
        raise ValueError(
            f"bloom filter needs {m} bits (> {MAX_BITS}) for {n_items} items "
            f"at fpp={fpp} — raise fpp, shard the filter, or fall back to the "
            "exact semi-join"
        )
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def build_bloom(
    values: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> BloomModel:
    """Build over the DISTINCT values of ``values[col]`` (the caller dedups
    if the input has repeats it wants counted once — positions are set-
    idempotent anyway, this only affects the sizing count). One pass to
    count (skipped when ``expected_items`` is given), one pass to pack bits.
    NULL values are skipped (NULL is never "contained")."""
    vals = values.select(F.col(col).alias("_v")).filter(F.col("_v").isNotNull())
    n = expected_items if expected_items is not None else vals.count()
    m, k = bloom_params(max(int(n), 1), fpp)
    pos = vals.select(F.explode(F.array(*_positions(F.col("_v"), m, k))).alias("p"))
    packed = (
        pos.select(
            F.expr("CAST(p DIV 64 AS INT)").alias("w"),
            F.expr("SHIFTLEFT(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    words = [0] * (m // 64)
    for r in packed.collect():  # ≤ m/64 rows, bounded by MAX_BITS
        words[r["w"]] = r["bits"]
    return BloomModel(m, k, words)


def with_bloom_contains(
    df: DataFrame, model: BloomModel, col: str, out_col: str = "bloom_hit"
) -> DataFrame:
    """Add ``out_col`` (bool): every one of the value's k bits is set. The
    bitmap rides in as a broadcast ONE-ROW table (no plan-embedded literal,
    no Python round trip); each probe is k element_at + shift + mask ops
    inside codegen. NULL values probe to false. Probe columns with SQL-hostile
    names (spaces, dots, hyphens) are backtick-quoted; the internal bitmap
    column is uniquified against the input schema."""
    spark = df.sparkSession
    bits_col = "_bloom_bits"
    while bits_col in df.columns:
        bits_col = "_" + bits_col
    bdf = spark.createDataFrame(
        [(model.words,)], f"{bits_col} array<bigint>"
    )
    joined = df.crossJoin(F.broadcast(bdf))
    return joined.withColumn(
        out_col, _contains_expr(model, col, bits_col)
    ).drop(bits_col)


def _quote_ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into a SQL fragment
    (internal backticks escape by doubling, the Spark identifier rule)."""
    return "`" + name.replace("`", "``") + "`"


def _contains_expr(
    model: BloomModel, col: str, bits_col: str = "_bloom_bits"
) -> Column:
    # SQL fragments rather than the Python helpers: F.shiftright only accepts
    # a LITERAL int shift amount, and the shift here is a per-row column
    qcol = _quote_ident(col)
    qbits = _quote_ident(bits_col)
    terms = []
    for i in range(model.n_hashes):
        p = f"pmod(xxhash64({i}, {qcol}), {model.n_bits})"
        word = f"element_at({qbits}, CAST({p} DIV 64 AS INT) + 1)"
        terms.append(
            F.expr(f"(shiftright({word}, CAST({p} % 64 AS INT)) & 1) = 1")
        )
    # xxhash64 SKIPS null inputs (hashing only the seed), so without the
    # guard a NULL value would probe a fixed position and could false-hit.
    # F.col parses bare dots as struct access — quote here too.
    return F.when(F.col(qcol).isNull(), F.lit(False)).otherwise(
        reduce(lambda a, b: a & b, terms)
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench_ids: DataFrame,
    n: int = 3,
    min_overlap: int = 5,
    fpp: float = 0.01,
    id_col: str = "doc_id",
) -> DataFrame:
    """The Bloom rung of benchmark decontamination: same semantics as the
    exact inverted-index semi-join (flag training docs sharing ≥
    ``min_overlap`` distinct n-gram shingles with the benchmark set), but
    the benchmark side travels as a bitmap instead of a string set.

    Guarantees: NO false negatives (every doc the exact operator flags is
    flagged here — bloom membership is a superset), per-doc ``n_overlap`` ≥
    the exact count, and extra flags are bounded by the FP rate (each
    non-benchmark shingle false-hits with probability ≈ fpp). Pinned
    against the exact operator in tests."""
    from photo_vector_search_spark.operators.dedup import shingle_sets

    # join each slice BEFORE shingling: a semi-join cannot push below a
    # Generate, so `shingle_sets(docs).join(bench_ids)` would explode the
    # WHOLE corpus on the build side and explode it again on the probe side
    # — two full passes where the slices are disjoint and cover one
    bench_sh = (
        shingle_sets(docs.join(bench_ids, id_col), n=n)
        .select("shingle")
        .distinct()
    )
    model = build_bloom(bench_sh, "shingle", fpp=fpp)
    train_sh = shingle_sets(docs.join(bench_ids, id_col, "left_anti"), n=n)
    hits = with_bloom_contains(train_sh, model, "shingle")
    return (
        hits.filter(F.col("bloom_hit"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(id_col, "n_overlap")
    )
