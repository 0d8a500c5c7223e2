"""Cross-corpus deduplication: drop NEW documents that duplicate (exactly
or near-) documents in an existing REFERENCE corpus — the incremental-crawl
rung of the dedup family. A training pipeline re-ingesting CommonCrawl
snapshot N must not re-admit pages already kept from snapshot N-1; dedup
reports treat this new-vs-old pass as its own stage (Lee et al. 2022 §4
dedup BETWEEN train and eval; Penedo et al. 2024 FineWeb's per-snapshot
then cross-snapshot MinHash).

Distinct from the in-corpus family (`dedup.exact_dedup` / `minhash_lsh_pairs`
pick canonicals WITHIN one corpus) and from decontamination
(`decontamination.py` broadcasts a TINY benchmark gram set): here BOTH sides
are corpus-scale, so nothing broadcasts — the plan is the two-sided keyed
join.

Scale shape (100 TB):
- exact: one fingerprint per doc each side (map-only md5 over normalized
  text — `functions.text.doc_fingerprint`), ONE left_anti join keyed on the
  16-byte fingerprint. Reference text never moves: only its distinct
  fingerprints shuffle (store/maintain them as a fingerprint table and the
  reference corpus is never re-read).
- minhash: each side computes wide signatures + band keys with the SHARED
  permutation constants (`dedup.minhash_perms`), candidates come from the
  new×ref (band, band_key) equi-join — bucket collisions only, never
  all-pairs — and exact-Jaccard verification joins each side's shingles
  by ITS OWN doc id (two keyed joins), so colliding id spaces between the
  corpora are harmless. Survivors = new docs anti-joined on contaminated
  ids.

Cf. reference scope: the reference re-indexes a directory from scratch each
run (photo_vector_search.py:48-82, per-file upsert into ChromaDB) and never
compares against prior corpora; this is the corpus-versioned extension of
the mandated dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.text import doc_fingerprint
from photo_vector_search_spark.operators.dedup import (
    LSH_BANDS,
    _bands_from_wide,
    _wide_signatures,
    shingle_sets,
)


def exact_dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """NEW docs whose normalized-text fingerprint does NOT appear in the
    reference corpus — all new columns pass through. NULL text never
    fingerprint-matches (md5 of NULL is NULL; NULL joins nothing), so NULL
    docs survive — cross-dedup drops only on evidence (the gate rule)."""
    rcol = ref_text_col or text_col
    ref_fp = reference.select(
        doc_fingerprint(F.col(rcol)).alias("_fp")
    ).distinct()
    return (
        new_docs.withColumn("_fp", doc_fingerprint(F.col(text_col)))
        .join(ref_fp, "_fp", "left_anti")
        .drop("_fp")
    )


def build_fingerprint_store(reference: DataFrame, path: str, text_col: str = "text") -> int:
    """Persist the reference corpus' DISTINCT normalized-text fingerprints —
    the snapshot N-1 → N workflow the module docstring promises: dedup of
    snapshot N runs against this 16-byte-per-distinct-doc table and the
    reference corpus is NEVER re-read (pinned via an input-file audit in
    tests/test_cross_dedup_store.py). Extend it with each snapshot's kept
    docs (`extend_fingerprint_store`) and the store stays the running union
    of everything admitted so far.

    One table, one snapshot swap — no sidecar, so no torn-pair state exists
    (unlike the two-swap index stores). NULL fingerprints (NULL text) are
    not stored: they join nothing in the anti-join anyway. Returns the
    number of distinct fingerprints written."""
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    fps = (
        reference.select(doc_fingerprint(F.col(text_col)).alias("fp"))
        .filter(F.col("fp").isNotNull())
        .distinct()
    )
    snapshot_overwrite(fps, path)
    return reference.sparkSession.read.parquet(path).count()


def extend_fingerprint_store(new_kept: DataFrame, path: str, text_col: str = "text") -> int:
    """Union the fingerprints of a new snapshot's KEPT docs into the store
    (call after each snapshot's dedup admits its survivors). Rewrites only
    the fingerprint table — O(distinct fps), never the corpora. Returns the
    store's new size.

    Caller contract: ``new_kept`` is typically DERIVED from this very store
    (`exact_dedup_against_store`), and the swap invalidates any lazy plan
    still reading the old snapshot files. The extend itself materializes
    everything it needs BEFORE swapping (the localCheckpoint below), but a
    caller who wants to keep using its `kept` frame after extending must
    materialize it first (localCheckpoint / write) — the standard
    snapshot-swap discipline (`store.snapshot_overwrite`)."""
    from photo_vector_search_spark.operators.store import snapshot_overwrite

    spark = new_kept.sparkSession
    existing = spark.read.parquet(path)
    add = (
        new_kept.select(doc_fingerprint(F.col(text_col)).alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    # localCheckpoint: the union must be MATERIALIZED before the swap — a
    # lazy plan reading the old store dir would race its own overwrite
    merged = existing.unionByName(add).distinct().localCheckpoint(eager=True)
    snapshot_overwrite(merged, path)
    return spark.read.parquet(path).count()


def exact_dedup_against_store(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`exact_dedup_against` served from a persisted fingerprint store:
    NEW docs whose normalized-text fingerprint is absent from the store —
    identical results to deduping against the full reference corpus the
    store was built from (pinned in tests), but the plan reads only the
    fingerprint table."""
    ref_fp = new_docs.sparkSession.read.parquet(path).select(
        F.col("fp").alias("_fp")
    )
    return (
        new_docs.withColumn("_fp", doc_fingerprint(F.col(text_col)))
        .join(ref_fp, "_fp", "left_anti")
        .drop("_fp")
    )


def minhash_pairs_against(
    new_docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    bands: int = LSH_BANDS,
    staging_dir: str | None = None,
    stage: bool | None = None,
) -> DataFrame:
    """(new_id, ref_id, jaccard) for every new/reference pair with exact
    n-gram Jaccard ≥ tau among LSH band-bucket collisions — the evidence
    frame behind ``minhash_dedup_against`` (audit it to see WHAT matched
    before dropping). Id spaces may overlap freely: sides never mix.

    Fan-out economics (r12): each side's shingle table feeds THREE
    consumers (its banding, its set-size count, its verify-join side) and
    Spark re-executes unstaged common subtrees per consumer. ``stage=None``
    (default) decides by the ``shuffle_corpus`` plan inspection, the same
    rule ``fuzzy_pairs_blocked`` uses: bare deterministic scans re-derive
    (re-scanning immutable files IS the staged read, and persisting the
    string-valued shingle table was MEASURED SLOWER at sf0.1 than the
    recompute — OPTIMIZATION_r12.md); wide or nondeterministic upstreams
    persist their shingle caches for the duration of the call and stage the
    pair result to parquet, so the expensive upstream executes exactly
    once. ``stage=True`` forces that persist+stage mode; ``stage=False``
    forces pure lazy plans (the caller owns any materialization)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    from photo_vector_search_spark.operators.shuffle import (
        _rescan_safe_and_cheap,
    )
    from photo_vector_search_spark.operators.staging import session_staging_dir

    if stage is None:
        stage = not (
            _rescan_safe_and_cheap(new_docs)
            and _rescan_safe_and_cheap(reference)
        )
    sh_new = shingle_sets(new_docs, n)
    sh_ref = shingle_sets(reference, n)
    if stage:
        if staging_dir is None:
            staging_dir = session_staging_dir("pvs_xdedup_pairs")
        sh_new = sh_new.persist()
        sh_ref = sh_ref.persist()
    bands_new = _bands_from_wide(_wide_signatures(sh_new), bands)
    bands_ref = _bands_from_wide(_wide_signatures(sh_ref), bands)
    cand = (
        bands_new.select(
            F.col("doc_id").alias("new_id"), "band", "band_key"
        )
        .join(
            bands_ref.select(
                F.col("doc_id").alias("ref_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .select("new_id", "ref_id")
        .distinct()
    )
    # two-sided exact-Jaccard verify: each side's shingles join by its OWN id
    cnt_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_new"))
    cnt_ref = sh_ref.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_ref"))
    sa = sh_new.select(F.col("doc_id").alias("new_id"), F.col("shingle").alias("_s"))
    sb = sh_ref.select(F.col("doc_id").alias("_rb"), F.col("shingle").alias("_t"))
    common = (
        cand.join(sa, "new_id")
        .join(sb, (F.col("ref_id") == F.col("_rb")) & (F.col("_s") == F.col("_t")))
        .groupBy("new_id", "ref_id")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    jac = F.col("_common") / (F.col("_n_new") + F.col("_n_ref") - F.col("_common"))
    pairs = (
        common.join(cnt_new.withColumnRenamed("doc_id", "new_id"), "new_id")
        .join(cnt_ref.withColumnRenamed("doc_id", "ref_id"), "ref_id")
        .filter(jac >= tau)
        .select("new_id", "ref_id", F.round(jac, 6).alias("jaccard"))
    )
    if not stage:
        return pairs  # fully lazy: nothing persisted, nothing staged
    try:
        pairs.write.mode("overwrite").parquet(staging_dir)
    finally:
        # a failed staged write must not leak the caches
        sh_new.unpersist(blocking=True)
        sh_ref.unpersist(blocking=True)
    return new_docs.sparkSession.read.parquet(staging_dir)


def minhash_dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
) -> DataFrame:
    """NEW docs with no near-duplicate (exact Jaccard ≥ tau over word
    n-grams, LSH-candidates-only) in the reference corpus. Both corpora
    must carry (doc_id, text); all new columns pass through."""
    pairs = minhash_pairs_against(new_docs, reference, n=n, tau=tau, bands=bands)
    contaminated = pairs.select(F.col("new_id").alias(id_col)).distinct()
    return new_docs.join(contaminated, id_col, "left_anti")


def dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    method: str = "exact",
    **kwargs,
) -> DataFrame:
    """One-call cross-corpus dedup: ``method`` = 'exact' (normalized
    fingerprint anti-join) or 'minhash' (LSH + exact-Jaccard verify).
    Production runs exact FIRST (cheap, catches mirrors), then minhash on
    the survivors — compose the two calls for that ladder."""
    if method == "exact":
        return exact_dedup_against(new_docs, reference, **kwargs)
    if method == "minhash":
        return minhash_dedup_against(new_docs, reference, **kwargs)
    raise ValueError(f"unknown method {method!r}: use 'exact' or 'minhash'")
