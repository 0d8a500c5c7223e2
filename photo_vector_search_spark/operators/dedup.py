"""Deduplication operators (SURVEY §2.10): exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Design for 100 TB:
- Nothing here is O(N²) in the corpus except the tiny embedding fixture's declared
  exact-pair query. Text near-dup goes shingle → inverted index (join on shingle) or
  minhash-band buckets (join on band key) — both shuffle keyed, linear-ish in data
  with bounded per-key fan-out.
- The common skew hazard is a hot shingle/band shared by thousands of docs
  (quadratic blow-up inside one key). ``jaccard_pairs`` takes ``max_df`` to drop
  shingles present in more than a fraction of docs (standard df-pruning — a shingle
  that common cannot push a pair over any useful τ by itself); AQE skew-join
  splitting covers the residue.
- All hash arithmetic is engine-portable (md5-prefix base hash, (a·h+b) mod p with
  a < 2^30, h < 2^32 so products stay under 2^62 — no int64 overflow in Spark's
  ANSI mode and no HUGEINT promotion drift in DuckDB), so the DuckDB oracle runs
  the *same algorithm*, not a brute-force stand-in: even LSH candidate pruning is
  bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import (
    doc_fingerprint,
    hash32,
    tokens,
    word_shingles,
)
from photo_vector_search_spark.functions.vector import cosine_similarity

# --------------------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-text fingerprint: each doc mapped to the minimum
    id sharing its fingerprint (canonical), with the group size.

    groupBy on the fingerprint → map-side partial agg; one shuffle on the hash."""
    fp = docs.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fp"))
    win = Window.partitionBy("fp")
    return fp.select(
        id_col,
        "fp",
        F.min(id_col).over(win).alias("canonical_id"),
        F.count(F.lit(1)).over(win).alias("group_size"),
    )


# ------------------------------------------------------------------- jaccard pairs


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-n-gram rows.

    Two-stage projection so the tokenizing split() materializes once per row
    instead of being re-inlined into every lambda evaluation by project collapse.
    No shuffle — shingling stays in the scan stage."""
    toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return toks_df.select(
        "doc_id", F.explode(word_shingles(F.col("toks"), n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    max_df: float | None = None,
    stage: bool | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via inverted index.

    |A∩B| from a self-join on shingle; |A|, |B| from per-doc counts;
    J = |A∩B| / (|A|+|B|-|A∩B|). Output: (doc_a, doc_b, jaccard) for J ≥ tau,
    doc_a < doc_b, jaccard rounded 6dp.

    ``max_df``: optional document-frequency pruning fraction — shingles appearing
    in > max_df·N docs are dropped before the pair join (skew guard; changes
    results only for pairs whose overlap is dominated by ubiquitous shingles,
    which τ-useful dedup doesn't care about). The declared oracle query runs with
    max_df=None so Spark and DuckDB agree exactly.

    Fan-out economics (r7): the shingle frame feeds three consumers (per-doc
    counts, both pair-join sides; plus the df agg and pruning join under
    ``max_df``) and Spark re-executes its subtree per consumer (no
    cross-branch reuse — verified on executed adaptive plans). Whether to
    STAGE it is decided by the ``shuffle_corpus`` plan inspection
    (``stage=None``, the default): when ``docs`` is a bare deterministic
    scan, re-deriving the shingles is a cheap columnar re-scan + split and
    staging was MEASURED SLOWER at sf0.1 (the exploded frame is bulky
    token-strings — writing it costs more than recomputing it); when
    ``docs`` is a wide or nondeterministic upstream (mid-pipeline), the
    frame is staged to parquet once so the upstream executes exactly once.
    ``stage=True``/``False`` overrides; with ``max_df`` a staged run stages
    the pruned frame a second time so the fan-out reads the filtered copy.
    """
    from photo_vector_search_spark.operators.shuffle import _rescan_safe_and_cheap
    from photo_vector_search_spark.operators.staging import stage_frame

    if stage is None:
        stage = not _rescan_safe_and_cheap(docs)
    if stage and max_df is not None:
        # one execution total: explode_outer keeps shingle-less docs as
        # NULL-shingle rows, so the staged frame carries the exact doc count
        # for the max_df threshold — a docs.count() here would re-execute
        # the very upstream staging exists to run once (r7 review fix)
        toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        sh = stage_frame(
            toks_df.select(
                "doc_id",
                F.explode_outer(word_shingles(F.col("toks"), n)).alias("shingle"),
            ),
            "pvs_jaccard_sh",
        )
        n_docs = sh.select("doc_id").distinct().count()
        sh = sh.filter(F.col("shingle").isNotNull())
    else:
        sh = shingle_sets(docs, n)
        if stage:
            sh = stage_frame(sh, "pvs_jaccard_sh")
    if max_df is not None:
        if not stage:
            n_docs = docs.count()
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df * n_docs)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
        if stage:
            sh = stage_frame(sh, "pvs_jaccard_sh_pruned")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= tau)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ------------------------------------------------------------------ minhash + LSH

MINHASH_P = 4_294_967_311  # prime > 2^32
NUM_HASHES = 32
LSH_BANDS = 16  # 16 bands × 2 rows: P(candidate) = 1-(1-s²)^16 ≈ .99 at s=0.5


def minhash_perms(num_hashes: int = NUM_HASHES) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) hash-family constants, a < 2^30 (overflow-safe),
    derived from a fixed LCG so the Spark plan and the generated oracle SQL share
    the exact same family."""
    out = []
    for i in range(num_hashes):
        a = (2_654_435_761 * (i + 1)) % ((1 << 30) - 1) | 1
        b = (40_503 * (i + 1) * (i + 1) + 17) % (1 << 32)
        out.append((i, a, b))
    return out


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, i, mh): minhash value per doc per hash function.

    Computed in ONE pass over the shingle rows: 32 min-aggregations per doc instead
    of exploding shingles × perms (which multiplies the shuffle input 32×). All
    map-side combinable; the shuffle carries ≤ num_hashes values per doc per
    partition. The narrow (i, mh) output shape is kept for the band stage and the
    oracle twin."""
    sh = shingle_sets(docs, n)
    return _wide_signatures(sh, num_hashes).select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(num_hashes)])).alias(
            "i", "mh"
        ),
    )


def _wide_signatures(sh: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) — one row per doc, one shuffle total."""
    hashed = sh.select("doc_id", hash32(F.col("shingle")).alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, a, b in minhash_perms(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def _check_band_width(num_hashes: int, bands: int) -> None:
    """Both banding formulations require bands | num_hashes: with a remainder,
    the narrow form would spill leftover signature rows into an extra partial
    band while the wide form would drop them — silently different band keys."""
    if bands <= 0 or num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of bands "
            f"({bands}) so lsh_bands and the wide banding stay bit-identical"
        )


def lsh_bands(
    signatures: DataFrame, bands: int = LSH_BANDS, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, band, band_key): md5 over the band's ordered minhash values.

    Narrow-input form (one shuffle to regroup); kept for API parity with the
    oracle's formulation. The LSH pipeline itself uses ``_bands_from_wide``,
    which computes the same keys map-only from the wide signature row.
    ``num_hashes`` must match the signature width used upstream."""
    _check_band_width(num_hashes, bands)
    rows_per_band = num_hashes // bands
    # integer division (`div`), not double-divide+cast: Spark truncates double→int
    # but DuckDB rounds, so the oracle twin uses `//` and both stay integral.
    sig = signatures.withColumn("band", F.expr(f"CAST(i div {rows_per_band} AS INT)"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "mh"))), lambda x: x["mh"].cast("string")
    )
    return sig.groupBy("doc_id", "band").agg(
        F.md5(F.concat_ws(",", ordered).cast("binary")).alias("band_key")
    )


def _bands_from_wide(wide: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Map-only banding: same (doc_id, band, band_key) rows as ``lsh_bands`` but
    computed directly from the wide signature columns — no regroup shuffle.
    Signature width is read off the actual mh* columns, not the module default."""
    num_hashes = sum(1 for c in wide.columns if c.startswith("mh"))
    _check_band_width(num_hashes, bands)
    rows_per_band = num_hashes // bands
    entries = []
    for b in range(bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols).cast("binary")).alias("band_key"),
            )
        )
    return wide.select(
        "doc_id", F.explode(F.array(*entries)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def prune_hot_buckets(bandsdf: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop (band, band_key) buckets holding more than ``max_bucket_size`` docs.

    A hot bucket of B docs contributes B²/2 candidate pairs inside ONE join key —
    the quadratic blow-up AQE skew-splitting can spread across tasks but cannot
    shrink. The standard mitigation (used by production text-dedup pipelines) is
    to cap bucket size: a bucket that hot is near-identical boilerplate, which
    exact dedup (run FIRST — ``exact_dedup``) already collapses; what remains is
    template spam whose pairs either recur in other, smaller bands or aren't
    τ-useful. The hot set is tiny (it's the skew tail), so the anti-join
    broadcasts. Recall trade documented + tested in tests/test_scale_design.py."""
    hot = (
        bandsdf.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > max_bucket_size)
        .select("band", "band_key")
    )
    return bandsdf.join(F.broadcast(hot), ["band", "band_key"], "left_anti")


def verify_jaccard_pairs(
    cand: DataFrame, sh: DataFrame, tau: float, counts: DataFrame | None = None
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against a
    (doc_id, shingle) table: |A∩B| via the inverted-index join RESTRICTED to
    candidate pairs, |A|/|B| from per-doc counts — the shared verify stage of
    the batch LSH pipeline and the streaming incremental dedup (which verifies
    each micro-batch's candidates against history + batch shingles). Keyed
    joins only; work ∝ candidate shingle rows, never all-pairs.

    ``counts``: optional precomputed (doc_id, n_sh) set sizes covering at
    least every doc that appears in ``cand`` — the streaming path persists
    these as registry state so per-batch verify never re-aggregates history
    shingles. Default None re-derives them from ``sh`` (so ``sh`` must then
    hold the COMPLETE shingle set of every candidate doc, which it does in
    the batch pipeline and after the stream's candidate semi-join)."""
    if counts is None:
        counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("s_a"))
    sb = sh.select(F.col("doc_id").alias("_sb_doc"), F.col("shingle").alias("s_b"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("_sb_doc")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= tau)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    staging_dir: str | None = None,
    max_bucket_size: int | None = None,
    stage: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Candidate pairs = docs sharing ≥1 (band, band_key) bucket; each candidate is
    then exact-verified via the inverted-index intersection restricted to
    candidates only. Output identical in shape to ``jaccard_pairs`` —
    (doc_a, doc_b, jaccard ≥ tau) — but the pair join touches only bucket
    collisions instead of every shared shingle, which is the 100 TB path.

    Cache lifecycle: the shared shingle table (feeding signatures, counts and the
    verify join) is persisted only for the duration of this call — the pair
    result is staged to parquet, the shingle cache is unpersisted, and the
    returned DataFrame reads the staged result. Repeated calls in a long-lived
    session leave NO cached RDDs behind (asserted in tests).

    ``staging_dir``: where to stage the pair result. The default — the
    ``SPARK_GRAFT_STAGING_DIR`` env var, else a driver-local temp dir — is a
    LOCAL-MODE convenience: on a real cluster executors cannot read/write a
    driver-local path, so deployments MUST point ``staging_dir`` (or the env
    var) at shared storage every executor can reach (HDFS/S3/NFS scratch),
    where the staged write is the standard distributed checkpoint pattern.

    ``max_bucket_size``: skew guard — prune (band, band_key) buckets larger than
    this before the candidate self-join (see ``prune_hot_buckets``). None (the
    declared-oracle default) keeps every bucket so Spark and DuckDB agree
    exactly; at corpus scale pick ~500-1000 after running ``exact_dedup``.

    ``stage=False`` returns the UNSTAGED pair DataFrame — the full
    banding/candidate-join/verify plan, not the staged-parquet read. For plan
    audits (tools/plan_report.py explains the real compute this way) and for
    callers composing further transformations before their own checkpoint.
    The shingle cache stays persisted in that mode (the plan references it);
    the caller owns its lifecycle — call ``spark.catalog.clearCache()`` or
    ``.unpersist()`` when done. The staged default exists because the pair
    result feeds multiple downstream actions and recomputing the LSH pass per
    action is the expensive path."""
    from photo_vector_search_spark.operators.shuffle import (
        _rescan_safe_and_cheap,
    )
    from photo_vector_search_spark.operators.staging import session_staging_dir

    if staging_dir is None:
        staging_dir = session_staging_dir("pvs_lsh_pairs")
    # the shared shingle table feeds signatures, counts and both verify-join
    # sides. For a bare deterministic scan input, re-deriving the explode per
    # consumer is CHEAPER than caching it (measured at sf0.1,
    # OPTIMIZATION_r12.md — persisting the string-valued shingle rows blocks
    # codegen fusion and materializes more bytes than the recompute costs;
    # the fuzzy_pairs_blocked auto-staging rule). Wide or nondeterministic
    # upstreams keep the persist so the expensive upstream executes once;
    # unpersisted deterministically below once the staged write has
    # consumed it.
    _cache_sh = not _rescan_safe_and_cheap(docs)
    sh = shingle_sets(docs, n)
    if _cache_sh:
        sh = sh.persist()
    bandsdf = _bands_from_wide(_wide_signatures(sh))
    if max_bucket_size is not None:
        bandsdf = prune_hot_buckets(bandsdf, max_bucket_size)
    l, r = bandsdf.alias("l"), bandsdf.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    pairs = verify_jaccard_pairs(cand, sh, tau)
    if not stage:
        return pairs  # caller owns the shingle cache lifecycle (see docstring)
    try:
        pairs.write.mode("overwrite").parquet(staging_dir)
    finally:
        if _cache_sh:
            # a failed staged write must not leak the cache
            sh.unpersist(blocking=True)
    return docs.sparkSession.read.parquet(staging_dir)


# ----------------------------------------------------------------------- simhash

SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over the distinct whitespace token set.

    Token → 32-bit hash; bit b contributes +1 if set else −1; fingerprint bit b is
    1 iff the sum over tokens is positive. Built entirely from explode + bit ops so
    the oracle can run it verbatim. rows ≈ docs × tokens × 32 — bounded, map-heavy,
    one groupBy shuffle on doc_id. (shift amounts are columns, so F.expr — the
    Python shiftleft/shiftright wrappers take only int literals.)"""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).select("doc_id", hash32(F.col("tok")).alias("h"))
    bits = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        "h",
    ).select(
        "doc_id",
        "b",
        F.expr("(shiftright(h, b) & 1) * 2 - 1").alias("c"),
    )
    return (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END")).alias(
                "simhash"
            )
        )
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup candidate pairs by SimHash hamming distance ≤ max_hamming.

    Candidates = pairs sharing ≥1 exact fingerprint byte (4 bands × 8 bits);
    each candidate's true hamming distance is then checked ≤ max_hamming.
    RECALL CAVEAT: pigeonhole guarantees a colliding byte only for distance ≤ 3 —
    a pair at distance 4-6 whose differing bits spread across all 4 bytes is
    never a candidate and is silently missed (the standard LSH recall/cost
    trade; the DuckDB oracle runs the same banding, so parity holds while
    absolute recall is bounded — recall floor asserted in tests).
    Output: (doc_a, doc_b, hamming)."""
    fp = simhash(docs)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr("shiftright(simhash, band * 8) & 255").alias("bkey"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # verify BEFORE the dedup shuffle (r7b, the hamming_pairs discipline):
    # a candidate can collide in up to 4 bands and the hamming check is a
    # map-side expression — failing candidates die before the distinct
    # exchange. hamming is a function of the pair, so distinct semantics
    # (and the DuckDB oracle's result) are unchanged.
    return (
        cand.filter(ham <= max_hamming)
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
    )


# ------------------------------------------------------- fuzzy (edit-distance)


def fuzzy_pairs_blocked(
    docs: DataFrame,
    prefix_len: int = 40,
    q: int = 8,
    max_dist: int = 16,
    max_df: float | None = None,
    stage: bool | None = None,
) -> DataFrame:
    """Edit-distance fuzzy pairs via character-q-gram blocking — the scale form
    of Levenshtein matching (the character-level member of the dedup family,
    alongside Jaccard/MinHash/SimHash).

    Blocking: candidates = pairs sharing ≥1 character q-gram of the normalized
    prefix — an EQUI-join on the gram (same inverted-index skeleton as
    ``jaccard_pairs``), never an unblocked self-join. Verify: Levenshtein on the
    prefixes, ≤ ``max_dist``, inside candidate blocks only.

    Recall: blocked ⊆ unblocked by construction (precision is exact); a pair
    whose edits shred every shared q-char run produces no common gram and is
    missed — the standard q-gram-filter trade. On the fixture's distance profile
    recall is 1.0 (property-tested against the unblocked self-join in
    tests/test_operators.py). Shrink ``q`` for higher recall at more candidates.

    ``max_df``: optional gram document-frequency pruning (fraction of docs), the
    same hot-key skew guard as ``jaccard_pairs`` — a gram present in half the
    corpus (boilerplate openers) otherwise contributes B²/2 candidate pairs
    inside one join key. Default None keeps the declared oracle exact.

    Fan-out economics (r7): the gram frame feeds both sides of the candidate
    self-join (plus the df agg and pruning join under ``max_df``) and Spark
    re-executes the explode per consumer (no cross-branch reuse — verified
    on executed adaptive plans). ``stage=None`` (default) decides by the
    ``shuffle_corpus`` plan inspection: bare-scan inputs re-derive (staging
    the string-valued gram frame was MEASURED SLOWER at sf0.1 than the
    substring-split recompute), wide/nondeterministic upstreams stage to
    parquet once. ``stage=True``/``False`` overrides; staged ``max_df`` runs
    stage the pruned frame a second time.

    Output: (doc_a, doc_b, lev) with doc_a < doc_b, lev ≤ max_dist."""
    from photo_vector_search_spark.operators.shuffle import _rescan_safe_and_cheap
    from photo_vector_search_spark.operators.staging import stage_frame

    if stage is None:
        stage = not _rescan_safe_and_cheap(docs)
    p = docs.select(
        "doc_id", F.substring(F.lower(F.col("text")), 1, prefix_len).alias("p")
    )
    if stage:
        # the PREFIX frame is what every consumer derives from (grams, both
        # verify sides, the max_df count) — staging only the gram explode
        # (pre-r7-review) left the verify joins re-executing the upstream,
        # so a nondeterministic upstream could verify prefixes that never
        # produced the blocking grams. Staging p (40 chars/doc, compact)
        # makes the upstream execute exactly once, as documented.
        p = stage_frame(p, "pvs_fuzzy_prefix")
    grams = p.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(p) - {q - 1}, 1)),"
                    f" s -> substring(p, s, {q}))"
                )
            )
        ).alias("gram"),
    )
    if stage:
        grams = stage_frame(grams, "pvs_fuzzy_grams")
    if max_df is not None:
        # staged mode counts docs from the staged prefix frame (one row per
        # doc, NULL-text included) — never a second upstream execution
        n_docs = p.count() if stage else docs.count()
        keep = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df * n_docs)
            .select("gram")
        )
        grams = grams.join(keep, "gram")
        if stage:
            grams = stage_frame(grams, "pvs_fuzzy_grams_pruned")
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pa = p.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("p_a"))
    pb = p.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("p_b"))
    # threshold=max_dist switches the JVM kernel to banded DP — O(len·max_dist)
    # per pair instead of O(len²) — returning -1 for pairs beyond the band.
    # Retained rows (lev ≤ max_dist) carry the exact distance, so the declared
    # output is bit-identical to the unbounded form; only the discarded work
    # changes.
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("p_a"), F.col("p_b"), max_dist).alias("lev"),
        )
        .filter((F.col("lev") >= 0) & (F.col("lev") <= max_dist))
    )


# ------------------------------------------------------------ embedding near-dup


def embedding_near_dup_pairs(embeddings: DataFrame, tau: float = 0.45) -> DataFrame:
    """Exact cosine near-dup pairs (vec_a < vec_b, sim ≥ tau).

    Declared form is the exact O(N²) self-join — correct and oracle-checkable on
    the fixture-sized vector tables. The 100 TB path is ``ann.ivf_near_dup_pairs``
    (cluster-pruned) or LSH bucketing; this exact form remains the correctness
    anchor the approximate paths are measured against."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    sim = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("_sim"),
        )
        .filter(F.col("_sim") >= tau)
        .select("vec_a", "vec_b", F.round("_sim", 6).alias("sim"))
    )


def _uniform_embedding_dim(embeddings: DataFrame, op: str) -> int | None:
    """Require one embedding dimension across the table; return it (None if empty).

    Every vectorized kernel below ``np.vstack``s whole Arrow batches, which on a
    mixed-dimension embeddings table (e.g. indexed under two models) dies inside
    the executor with an opaque stacking error — while the SQL fold path would
    instead degrade to NULL sims that silently filter out. One cheap min/max agg
    up front makes both paths agree: fail loudly, before any job is launched
    (ADVICE r3). Same discipline the CLI applies to query/store dim mismatch."""
    d = embeddings.agg(
        F.min(F.size("embedding")).alias("lo"), F.max(F.size("embedding")).alias("hi")
    ).first()
    if d["lo"] is None:
        return None
    if d["lo"] != d["hi"]:
        raise ValueError(
            f"{op} requires a single embedding dimension, found {d['lo']}-{d['hi']} "
            "(mixed-model table? filter to one model or re-index before deduping)"
        )
    return int(d["hi"])


def srp_planes(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """The (n_tables, n_planes, dim) hyperplane tensor — a pure function of
    its arguments (seeded), so independent callers (the batch operator, each
    STREAMING micro-batch) derive byte-identical planes and their bucket keys
    compare across calls."""
    import numpy as np

    return np.random.RandomState(seed).normal(size=(n_tables, n_planes, dim))


def srp_bucket_rows(embeddings: DataFrame, planes) -> DataFrame:
    """(vec_id, table, bkey) SRP bucket rows — the map-only int64-matmul
    bucketing stage shared by ``srp_lsh_near_dup_pairs`` and the streaming
    ``incremental_srp_dedup`` (which accumulates these rows as its index
    state). One Arrow batch computes all tables' keys in BLAS.

    ``planes`` may be the ndarray or an existing ``Broadcast`` of it — a
    continuous stream passes one broadcast created at first batch so
    thousands of micro-batches don't each re-broadcast an identical tensor."""
    import numpy as np
    from pyspark.broadcast import Broadcast

    bc = (
        planes
        if isinstance(planes, Broadcast)
        else embeddings.sparkSession.sparkContext.broadcast(planes)
    )

    def _buckets(batches):
        import pandas as pd

        pl = bc.value
        for pdf in batches:
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            out_vec, out_tab, out_key = [], [], []
            for t in range(pl.shape[0]):
                bits = (m @ pl[t].T) > 0  # (rows, n_planes)
                keys = bits @ (1 << np.arange(pl.shape[1], dtype=np.int64))
                out_vec.extend(pdf["vec_id"].tolist())
                out_tab.extend([t] * len(pdf))
                out_key.extend(keys.tolist())
            yield pd.DataFrame({"vec_id": out_vec, "table": out_tab, "bkey": out_key})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _buckets, schema="vec_id long, table int, bkey long"
    )


def srp_lsh_near_dup_pairs(
    embeddings: DataFrame,
    tau: float = 0.45,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding near-dup via signed-random-projection LSH (cosine sketch) —
    the scale path when NEITHER side fits a broadcast.

    Each of ``n_tables`` hash tables buckets vectors by the sign pattern of
    ``n_planes`` random hyperplane projections (P[bit collision] = 1 - θ/π).
    Candidates = pairs sharing a bucket in ≥1 table; each candidate is verified
    with the exact cosine expression, so precision is exact and only recall is
    approximate. Shuffle volume: O(N · n_tables) bucket rows + per-bucket pair
    fan-out — never a full O(N²).

    Parameter regime matters: detection prob per pair is 1-(1-p^n_planes)^n_tables
    with p = 1 - arccos(sim)/π. True near-dup workloads (sim ≥ 0.9, p ≈ 0.86)
    afford 16+ planes and a few tables (large buckets pruned hard); the defaults
    here (6 planes × 24 tables ≈ 0.84 detection at sim 0.45) suit the fixture's
    moderate-similarity regime at the cost of coarser buckets — tune up
    ``n_planes`` as your tau rises. Deterministic: seeded planes, broadcast.

    ``n_planes``/``n_tables`` default to None = size-derived via
    ``srp_auto_params`` (recall target 0.84, reproducing (6, 24) at fixture
    scale; sub-quadratic candidate growth past it — see srp_auto_params).
    ``n_rows`` is an optional size hint that skips the ``count()`` job (use it
    when ``embeddings`` is an expensive uncached upstream)."""
    import numpy as np

    if n_planes is None or n_tables is None:
        auto_planes, auto_tables = srp_auto_params(
            embeddings.count() if n_rows is None else n_rows,
            target_recall=_SRP_PAIRS_RECALL,
        )
        n_planes = auto_planes if n_planes is None else n_planes
        n_tables = auto_tables if n_tables is None else n_tables

    dim = _uniform_embedding_dim(embeddings, "srp_lsh_near_dup_pairs")
    if dim is None:  # empty input degrades to empty output like the other ops
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, sim double"
        )
    planes = srp_planes(dim, n_planes=n_planes, n_tables=n_tables, seed=seed)
    buckets = srp_bucket_rows(embeddings, planes)
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    return _verify_cosine_candidates(embeddings, cand, tau)


def _verify_cosine_candidates(
    embeddings: DataFrame,
    cand: DataFrame,
    tau: float,
    vectorized: bool = False,
    dim_checked: bool = False,
) -> DataFrame:
    """Exact-cosine verification of (vec_a, vec_b) candidate pairs — shared by
    every LSH rung so precision is always exact and only recall approximates.

    ``vectorized=True`` computes the same dot/(|a|·|b|) in a NumPy Arrow batch
    instead of the SQL fold expression: Spark doesn't codegen higher-order
    functions, so at ~10⁵+ candidate pairs the interpreted per-pair fold
    dominates (measured ~4× on the SRP verify at sf0.1). Identical values by
    the same HALF_UP-rounding discipline as ``embedding_near_dup_fast`` (whose
    oracle is hash-green against DuckDB's list_cosine_similarity)."""
    ea = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    joined = cand.join(ea, "vec_a").join(eb, "vec_b")
    if not vectorized:
        sim = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
        return (
            joined.select("vec_a", "vec_b", sim.alias("_sim"))
            .filter(F.col("_sim") >= tau)
            .select("vec_a", "vec_b", F.round("_sim", 6).alias("sim"))
        )
    import numpy as np
    import pandas as pd

    if not dim_checked:  # the vstack below crashes opaquely on mixed dims
        _uniform_embedding_dim(embeddings, "cosine candidate verification")

    def _sims(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.vstack(pdf["emb_a"].to_numpy()).astype(np.float64, copy=False)
            b = np.vstack(pdf["emb_b"].to_numpy()).astype(np.float64, copy=False)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (a * b).sum(axis=1) / (
                    np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                )
            keep = s >= tau  # NaN (zero-norm) fails, like the SQL path's NULL
            s = s[keep]
            rounded = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6  # HALF_UP
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "sim": rounded,
                }
            )

    return joined.select("vec_a", "vec_b", "emb_a", "emb_b").mapInPandas(
        _sims, schema="vec_a long, vec_b long, sim double"
    )


# SQL-exact SRP variant: hyperplane coefficients are ±1 Rademacher signs drawn
# from the portable md5-prefix hash (SRP theory needs only a symmetric
# coefficient distribution), and projections are summed as DECIMAL(28,12) —
# exact, order-free arithmetic — so Spark and the DuckDB oracle compute
# bit-identical bucket keys. Same discipline that made MinHash-LSH oracle-exact.
SRP_SQL_TABLES = 16
SRP_SQL_PLANES = 6
SRP_SQL_DIM = 64
# Auto-tuning design point: detection probability per pair at sim ≈ 0.45 (the
# fixture near-dup tau). p = 1 - arccos(0.45)/π; recall targets chosen so the
# size-derived parameters REPRODUCE the hand-tuned constants at fixture scale
# (≤ ~2k vectors → planes 6; then tables: SQL 16, numpy-pairs 24).
_SRP_DESIGN_SIM = 0.45
_SRP_SQL_RECALL = 0.7095  # 0.71 would put ceil() at 17 tables (ratio 16.005)
_SRP_PAIRS_RECALL = 0.84
_SRP_TARGET_OCCUPANCY = 32
# Table-count ceiling: at the low-similarity design point the recall-preserving
# table count grows ~N^0.62, which at extreme N (10^8+) asks for tens of
# thousands of tables — at that point LSH at low tau is the wrong tool (each
# table is a full pass over the data). Cap and let recall degrade gracefully;
# the docstring's regime guidance (raise tau → exponent → 1, or use the IVF
# candidate path) is the real answer past the cap.
_SRP_MAX_TABLES = 256


def srp_auto_params(
    n_rows: int,
    target_recall: float = _SRP_SQL_RECALL,
    sim: float = _SRP_DESIGN_SIM,
    target_occupancy: int = _SRP_TARGET_OCCUPANCY,
    min_planes: int = SRP_SQL_PLANES,
) -> tuple[int, int]:
    """Corpus-size-aware (n_planes, n_tables) for SRP-LSH.

    The scale failure of FIXED parameters: expected candidate pairs are
    ``n_tables · C(N,2) · 2^-n_planes`` for near-orthogonal pairs, so constant
    planes make the candidate join QUADRATIC in N once buckets fill (measured:
    the sf0.1→sf1 scale bench flagged fixed-(6,16) SRP 34x for 10x rows).
    Classic LSH tuning instead grows planes with corpus size and re-derives
    tables from the recall target:

    - ``n_planes = max(min_planes, ceil(log2(N / target_occupancy)))`` keeps
      expected random-pair bucket occupancy ~constant, so per-bucket fan-out
      never grows with N;
    - ``n_tables = ceil(ln(1-R) / ln(1-p^n_planes))`` restores pair-detection
      recall R at the design similarity (p = 1 - arccos(sim)/π) — the standard
      amplification identity recall = 1-(1-p^b)^L.

    Net candidate volume then scales as N^(1+ρ), ρ = log2(1/p) (≈ N^1.62 at
    the moderate sim-0.45 design point; ≈ N^1.25 at sim 0.7, ≈ N^1.07 at
    sim 0.9 — true near-dup regimes are cheap, exploratory low-tau search is
    the expensive end). Deterministic in N; at fixture scales (N ≤ ~2k) it
    reproduces the hand-tuned constants exactly, so oracle parity and bench
    history are unchanged."""
    import math

    n_planes = min_planes
    if n_rows > target_occupancy:
        n_planes = max(min_planes, math.ceil(math.log2(n_rows / target_occupancy)))
    p = 1 - math.acos(min(max(sim, -1.0), 1.0)) / math.pi
    hit = p**n_planes
    n_tables = max(1, math.ceil(math.log(1 - target_recall) / math.log(1 - hit)))
    # cap: past this, per-pair detection recall degrades below target rather
    # than the job degrading into hundreds of full-data passes (see constant)
    return n_planes, min(n_tables, _SRP_MAX_TABLES)
# scale 12 fixes the cast rounding (identical at any precision); precision 18
# keeps every value AND the sum buffer in Spark's compact-long Decimal fast
# path (precision >18 falls back to BigDecimal objects — measured ~4x slower
# aggregation). |x| ≤ 1 and |Σ| ≤ dim, far inside 6 integer digits.
_SRP_DEC = "decimal(18,12)"


def srp_lsh_near_dup_sql(
    embeddings: DataFrame,
    tau: float = 0.45,
    n_tables: int | None = None,
    n_planes: int | None = None,
    dim: int = SRP_SQL_DIM,
    n_rows: int | None = None,
) -> DataFrame:
    """SRP-LSH near-dup with an engine-portable, oracle-exact formulation.

    Same algorithm as ``srp_lsh_near_dup_pairs`` (bucket by sign patterns of
    ``n_planes`` projections × ``n_tables`` tables; exact-cosine verify), but
    expressed entirely in DataFrame ops with deterministic integer/decimal
    arithmetic so the DuckDB oracle runs it bit-for-bit:

    - plane coefficients c(t,j,i) ∈ {−1, +1} from md5-prefix parity (portable:
      hashlib for the worker kernel, SQL md5 in the oracle — same bytes, same
      parity);
    - projection sign from EXACT arithmetic: each component is quantized
      JVM-side by the engine-portable decimal(·,12) HALF_UP cast, scaled to an
      int64, and the projection is an integer matmul in an Arrow batch — exact
      and order-free, so it equals the oracle's decimal sums bit-for-bit (no
      float sum whose execution order could flip a sign);
    - bucket key = Σ 2^j over positive planes; candidates equi-join on
      (table, key); exact cosine ≥ tau verify (shared `_verify_cosine_candidates`,
      vectorized).

    Components past ``dim`` (planes exist only for i < dim) are ignored by the
    projection in BOTH engines — the kernel slices, the oracle's join drops.

    Shuffle shape: bucketing is map-only (quantize → int64 matmul per batch);
    only the N·n_tables bucket rows shuffle into the candidate equi-join —
    linear in N like the text-LSH path; no driver collect, nothing quadratic.
    The numpy ``srp_lsh_near_dup_pairs`` remains the float kernel; this variant
    is the cross-engine-verifiable twin at essentially the same speed.

    ``n_planes``/``n_tables`` default to None = size-derived via
    ``srp_auto_params``; at fixture scale that reproduces the (6, 16) constants
    bit-for-bit, at larger corpora buckets sharpen so the candidate join stays
    sub-quadratic. The derivation needs the corpus size: pass ``n_rows`` as a
    hint to avoid the ``count()`` Spark job (which re-executes the whole
    upstream plan when ``embeddings`` is an uncached derived pipeline). Pass
    explicit plane/table values to pin them entirely (the oracle SQL string
    hardcodes the fixture-scale constants, so a DECLARED query must pin — see
    ``q_srp_lsh_near_dup``)."""
    import hashlib

    import numpy as np
    import pandas as pd

    if n_planes is None or n_tables is None:
        auto_planes, auto_tables = srp_auto_params(
            embeddings.count() if n_rows is None else n_rows,
            target_recall=_SRP_SQL_RECALL,
        )
        n_planes = auto_planes if n_planes is None else n_planes
        n_tables = auto_tables if n_tables is None else n_tables

    # ±1 plane coefficients from md5-prefix parity of "t_j_i" — hashlib here,
    # SQL md5 in the oracle: same bytes hashed, same parity, same planes.
    flat = np.empty((n_tables * n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for j in range(n_planes):
            for i in range(dim):
                h = int(hashlib.md5(f"{t}_{j}_{i}".encode()).hexdigest()[:8], 16)
                flat[t * n_planes + j, i] = 1 if h % 2 == 1 else -1
    bc = embeddings.sparkSession.sparkContext.broadcast(flat)

    # Exact quantization JVM-side: double → decimal(18,12) (the engine-portable
    # HALF_UP cast both engines share) → ×10^12 → long. The projection sign is
    # then a pure int64 matmul in the Arrow batch — exact, order-free integer
    # arithmetic, so it equals the oracle's decimal sums bit-for-bit while the
    # kernel stays vectorized. |Σ| ≤ dim·10^12 ≈ 6.4e13 « 2^63: no overflow.
    # (Two earlier formulations measured slower at sf0.1: posexplode → broadcast
    # plane join → decimal aggs shuffled N·dim·tables rows (~12s — the 12M-row
    # join output dominates); 96 inlined zip_with/aggregate folds blew up plan
    # compile + interpreted eval (~2× worse still). The repartition spreads the
    # matmul across cores even off a single-file parquet scan.)
    scale = 10**12
    emb_q = embeddings.repartition("vec_id").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda v: (v.cast(_SRP_DEC) * F.lit(scale)).cast("long"),
        ).alias("xq"),
    )
    pw = np.left_shift(np.int64(1), np.arange(n_planes, dtype=np.int64))

    def _buckets(batches):
        planes_flat = bc.value  # (n_tables·n_planes, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf["xq"].to_numpy()).astype(np.int64, copy=False)
            d = min(m.shape[1], dim)  # extra components have no plane: dropped,
            proj = m[:, :d] @ planes_flat[:, :d].T  # like the oracle's i<dim join
            bits = (proj > 0).reshape(len(pdf), n_tables, n_planes)
            keys = (bits * pw).sum(axis=2)  # (rows, n_tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "t": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bkey": keys.reshape(-1),
                }
            )

    buckets = emb_q.mapInPandas(_buckets, schema="vec_id long, t int, bkey long")
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    return _verify_cosine_candidates(embeddings, cand, tau, vectorized=True)


MAX_BROADCAST_BYTES = 512 << 20  # ~512 MiB of raw vector doubles on the driver


def embedding_near_dup_fast(
    embeddings: DataFrame,
    tau: float = 0.45,
    max_broadcast_bytes: int = MAX_BROADCAST_BYTES,
    allow_approx: bool = True,
) -> DataFrame:
    """Same pairs as ``embedding_near_dup_pairs`` via broadcast + NumPy matmul.

    One side is gathered and broadcast (vectors are the *small* table in this
    engine's data model — photos' metadata dwarfs the 64-768-dim vectors; for a
    side too big to broadcast, the IVF operator is the scale path). Each Arrow
    batch computes a (batch × N) similarity block in BLAS and emits only pairs
    ≥ tau with vec_a < vec_b — the quadratic work stays columnar and never
    materializes as rows. Results identical to the exact pair join (double matmul,
    same rounding).

    Guarded, then LADDERED: the gather is sized (rows × dim × 8 bytes) BEFORE
    collecting; a corpus above ``max_broadcast_bytes`` re-routes to
    ``srp_lsh_near_dup_pairs`` — the fully distributed rung (bucketed LSH
    candidates, exact-cosine verify, nothing collected to the driver) — so at
    100× the data the SAME call keeps working and degrades only in RECALL.
    On corpora that actually CLUSTER (real encoder output), prefer the
    explicit ``ann.ivf_near_dup_pairs`` rung — density-following k-means
    blocks recover higher recall than fixed SRP planes at the same linear
    shuffle shape; the auto-reroute stays on SRP because its cost model is
    distribution-independent (no collapsed-cluster failure mode to guard)
    (~0.84 pair-detection at sim 0.45 with the SRP defaults, exact precision;
    see srp_lsh_near_dup_pairs for the probability model), never in memory.
    Pass ``allow_approx=False`` to get the round-3 behavior: raise instead of
    silently trading recall (for callers whose downstream needs exactness)."""
    import numpy as np
    import pandas as pd

    stats = embeddings.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
    ).first()
    if not stats["n"]:  # empty input degrades to empty output like every rung
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, sim double"
        )
    if stats["n"]:
        if stats["min_dim"] != stats["max_dim"]:
            # the vstacks below (and every downstream matmul) need one dim;
            # fail loudly before any gather (ADVICE r3)
            raise ValueError(
                "embedding_near_dup requires a single embedding dimension, found "
                f"{stats['min_dim']}-{stats['max_dim']} (mixed-model table? filter "
                "to one model or re-index before deduping)"
            )
        # ONE pre-job (count + min/max dim together)
        est = stats["n"] * stats["max_dim"] * 8
        if est > max_broadcast_bytes:
            if allow_approx:
                # distributed rung: linear shuffle, no driver gather; recall
                # trade documented above. dim already validated → skip re-check.
                return srp_lsh_near_dup_pairs(embeddings, tau=tau)
            raise ValueError(
                f"embedding_near_dup_fast would collect ~{est >> 20} MiB of vectors "
                f"to the driver (limit {max_broadcast_bytes >> 20} MiB); this rung of "
                "the ladder is for broadcastable corpora — use srp_lsh_near_dup_pairs "
                "for a fully distributed near-dup pass (or allow_approx=True to "
                "re-route automatically)"
            )
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def _pairs(batches):
        bids, bmat, bnorms = bc.value
        for pdf in batches:
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            mnorms = np.linalg.norm(m, axis=1)
            # dot / (|a|·|b|), matching the SQL expression's formula shape so the
            # rounded values agree with the exact path; zero-norm rows → NaN,
            # which fails `sims >= tau` and drops out like the exact path's NULL
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (m @ bmat.T) / np.outer(mnorms, bnorms)
            my_ids = pdf["vec_id"].to_numpy()
            bi, bj = np.nonzero((sims >= tau) & (my_ids[:, None] < bids[None, :]))
            s = sims[bi, bj]
            # HALF_UP like Spark's F.round — np.round is banker's (half-to-even)
            # and diverges from the exact path on .5 boundaries
            rounded = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame({"vec_a": my_ids[bi], "vec_b": bids[bj], "sim": rounded})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _pairs, schema="vec_a long, vec_b long, sim double"
    )


# ------------------------------------------------------- line-level boilerplate


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level cross-document deduplication (CCNet's paragraph-dedup
    preprocessing step, the line-granularity member of the dedup family):
    drop every non-blank line that appears in ≥ ``min_docs`` distinct
    documents — headers, footers, cookie banners, navigation chrome — and
    rebuild each document with its surviving lines in original order.

    Plan (all shuffles keyed, nothing quadratic):
      1. ``posexplode(split(text, '\\n'))`` — map-only line table with
         in-document positions;
      2. line document-frequency — ONE groupBy over a 128-bit line hash pair
         ``(xxhash64(line), xxhash64(1, line))`` with map-side partial
         ``count(distinct doc)`` (the substring-dedup key discipline: the
         shuffle and the hot dictionary carry 16 bytes per line, not the
         line's bytes — hot boilerplate lines are kilobytes on a web corpus;
         a 64-bit key alone would birthday-collide at web line counts);
      3. anti-join lines against the hot set — keyed on the hash pair;
         Catalyst/AQE broadcasts the hot side when it is small, and at web
         scale (where boilerplate volume can be arbitrarily large) it
         degrades to a shuffle join, never a driver gather; line TEXT rides
         only on the lines side, for the rebuild;
      4. rebuild — ONE groupBy(doc) re-assembling
         ``array_join(array_sort(collect_list(struct(pos, line))))``; the sort
         is per-document (bounded by document length), not global.

    Semantics shared exactly with the DuckDB twin (tests/test_boilerplate.py):
    blank lines are structure, not boilerplate — never counted, never removed;
    a document whose EVERY line is removed disappears from the output (it was
    pure boilerplate); NULL text explodes to no rows and likewise drops.

    The reference has no corpus-hygiene surface at all (single-user photo
    store); this is a north-star training-pipeline operator like the rest of
    the dedup family."""
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).select(
        id_col,
        "pos",
        "line",
        F.xxhash64("line").alias("_h1"),
        F.xxhash64(F.lit(1), F.col("line")).alias("_h2"),
    )
    hot = (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("_h1", "_h2")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("_h1", "_h2")
    )
    kept = lines.join(hot, ["_h1", "_h2"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean")
    )


def dedup_paragraphs(
    docs: DataFrame,
    min_chars: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level keep-FIRST dedup across the corpus (Dolma's paragraph
    dedup rung — Soldaini et al. 2024 §2.2): every repeated non-blank
    paragraph keeps exactly its EARLIEST occurrence (lowest ``(doc_id,
    pos)``) and every later copy is removed; each document is rebuilt from
    its surviving paragraphs in original order.

    Distinct from ``remove_boilerplate_lines``: that rung removes a hot line
    from EVERY document (chrome has no canonical owner); this one preserves
    one canonical copy (real content quoted or mirrored downstream must
    survive somewhere). Compose both: boilerplate first (frequency rule),
    then paragraph dedup for what remains.

    Semantics shared with the DuckDB twin (tests/test_paragraph_dedup.py):
    paragraphs are newline-delimited; blank paragraphs are structure — never
    counted, never removed; paragraphs under ``min_chars`` (trimmed) are
    exempt (too short to meaningfully dedup — "Yes." should not vanish
    corpus-wide); repeats WITHIN one document also collapse to the first
    position; a document whose every paragraph is removed drops from the
    output; NULL text explodes to no rows and likewise drops.

    Plan (the boilerplate skeleton, nothing quadratic): map-only
    posexplode; ONE groupBy over a 128-bit paragraph hash pair
    ``(xxhash64(line), xxhash64(1, line))`` computing the min (doc_id, pos)
    winner (map-side-combinable min of a struct — the substring-dedup key
    discipline: the winner dictionary and the join comparison carry 16
    bytes per paragraph, never the paragraph's bytes, which on a web
    corpus are kilobytes for hot paragraphs); one keyed join back on the
    hash pair (AQE broadcasts when the dup dictionary is small) with text
    riding only on the lines side for the rebuild; ONE per-doc rebuild
    groupBy whose sort is bounded by document length. At 100 TB every
    shuffle is keyed on paragraph hash or doc id — the same inverted-index
    shape as decontaminate/boilerplate."""
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).select(
        id_col,
        "pos",
        "line",
        F.xxhash64("line").alias("_h1"),
        F.xxhash64(F.lit(1), F.col("line")).alias("_h2"),
    )
    eligible = F.length(F.trim(F.col("line"))) > F.greatest(
        F.lit(0), F.lit(min_chars) - 1
    )
    winners = (
        lines.filter(eligible)
        .groupBy("_h1", "_h2")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"))
        .select(
            "_h1",
            "_h2",
            F.col(f"w.{id_col}").alias("_w_doc"),
            F.col("w.pos").alias("_w_pos"),
        )
    )
    kept = (
        lines.join(winners, ["_h1", "_h2"], "left")
        .filter(
            F.col("_w_doc").isNull()  # blank / under-min: always kept
            | ((F.col(id_col) == F.col("_w_doc")) & (F.col("pos") == F.col("_w_pos")))
        )
        .select(id_col, "pos", "line")
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean")
    )
