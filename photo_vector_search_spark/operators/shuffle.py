"""Deterministic global corpus shuffle — training-order randomization.

A pretraining run needs every epoch's document order to be (a) effectively
random, (b) reproducible from a seed, and (c) stable under re-partitioning of
the input (a re-read of the same corpus with different file splits must yield
the SAME order). Seeded ``df.sample``/``rand()`` fails (c) — Spark's random
streams are seeded per-partition, so the draw changes with the physical split.

The engine-portable order is ``md5(seed || '-' || key)``. Assigning each row
its global RANK in that order without a global-window bottleneck is done with
FIXED hash-prefix buckets rather than Spark's range-partitioned sort: the
first 3 hex chars of the md5 are the bucket (0..4095), which is a PREFIX of
the sort key — so (bucket, h, key) order equals (h, key) order — and

  pos = offset[bucket] + row_number within bucket (ordered by h, key) - 1

where the offsets come from one tiny per-bucket count (≤4096 longs,
broadcast). The upstream plan executes ONCE: the hashed projection is staged
to parquet and both the count pre-pass and the numbering window read the
staged copy — except when the optimized plan is a bare deterministic file
scan (+ narrow deterministic ops), where re-scanning the immutable files IS
the cheapest staged read and staging is skipped (plan-inspected, overridable
via ``stage=``). One data shuffle total (the per-bucket window).

Why not ``orderBy(h)`` + per-partition offsets: Spark's RangePartitioner
SAMPLES the data to pick partition bounds, with a seed derived from the
ephemeral RDD id — two executions of the same sort (the counts job and the
numbering job) can pick DIFFERENT bounds, silently corrupting the offsets.
Fixed buckets make both passes deterministic by construction, at any scale,
under any partitioning. (Caught in round-5 self-review; the fixture was too
small to expose it — AQE coalesced the sort to one partition.)

DuckDB twin (value-verified in tests/test_shuffle.py):
``row_number() OVER (ORDER BY md5(seed || '-' || key), key) - 1``.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class CurriculumOrder(NamedTuple):
    """``curriculum_order``'s result: the positioned frame plus the tier
    cuts that reproduce the exact order across sessions. A real field, not
    a dynamic DataFrame attribute — transformations and cross-session
    handoffs can't silently drop the reproducibility artifact (round-10
    review fix)."""

    df: DataFrame
    cuts: list[float]

N_BUCKETS = 4096  # 3 hex chars; md5 uniformity keeps buckets ~N/4096 rows

# optimized-plan nodes whose re-execution is a bare columnar re-scan: narrow,
# no shuffle, no recompute beyond the scan itself
_RESCAN_CHEAP_NODES = {"LogicalRelation", "Project", "Filter", "SubqueryAlias"}


def _rescan_safe_and_cheap(df: DataFrame) -> bool:
    """True iff executing ``df``'s plan twice is both CORRECT (every node
    deterministic — immutable file scans + deterministic narrow ops cannot
    diverge between executions) and CHEAP (no join/agg/window/generate whose
    recompute would double real work). Decides the auto staging mode; any
    inspection failure conservatively stages."""
    try:
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() not in _RESCAN_CHEAP_NODES:
                return False
            if not node.deterministic():
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False


def shuffle_corpus(
    df: DataFrame,
    seed: int = 0,
    key_col: str = "doc_id",
    staging_dir: str | None = None,
    stage: bool | None = None,
) -> DataFrame:
    """Return ``df`` with a ``pos`` column: the row's rank in the seeded
    pseudo-random total order (0-based, dense, deterministic).

    ``key_col`` must be unique per row (it tie-breaks equal hashes — md5
    collisions are negligible but the determinism contract must not rest on
    their absence). Different seeds give statistically independent orders;
    the same seed gives byte-identical ``pos`` under ANY input partitioning
    (asserted in tests). Rows are returned bucket-grouped, not pos-sorted —
    ``orderBy('pos')`` (or sharded export, which shuffles anyway) if physical
    order matters downstream.

    Single upstream execution: by default (``stage=None``) the hashed
    projection is STAGED to parquet once and both downstream jobs (the
    ≤4096-row per-bucket count and the numbering window) read the staged
    copy — the upstream plan (at the end of a curation pipeline, the whole
    pipeline) executes exactly once, and the two passes can never observe
    divergent rows even if an upstream column were nondeterministic — UNLESS
    the optimized plan is a bare deterministic scan (file relation + narrow
    deterministic project/filter only), where re-executing IS the staged
    read: two scans of immutable files cannot diverge and cost less than a
    write+read round trip. ``stage=True``/``False`` overrides the
    inspection. ``staging_dir`` defaults to session scratch
    (``SPARK_GRAFT_STAGING_DIR`` on a cluster — see ``operators.staging``);
    the returned DataFrame reads the staged files, so an explicit caller-owned
    dir must outlive its consumers."""
    from photo_vector_search_spark.operators.staging import session_staging_dir

    if stage is None:
        stage = not _rescan_safe_and_cheap(df)
    h = F.md5(F.concat_ws("-", F.lit(str(seed)), F.col(key_col).cast("string")))
    bucketed = df.withColumn("_h", h).withColumn(
        "_b", F.conv(F.substring(F.col("_h"), 1, 3), 16, 10).cast("int")
    )
    spark = df.sparkSession
    if stage:
        if staging_dir is None:
            staging_dir = session_staging_dir("pvs_shuffle")
        bucketed.write.mode("overwrite").parquet(staging_dir)
        staged = spark.read.parquet(staging_dir)
    else:
        staged = bucketed

    # per-bucket counts: a map-side-combinable agg over the staged scan —
    # deterministic by construction, ≤ N_BUCKETS rows collected
    counts = {
        r["_b"]: r["n"]
        for r in staged.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    if not offsets:  # empty input: preserve schema, add the pos column
        return staged.drop("_h", "_b").withColumn("pos", F.lit(None).cast("long"))
    off = F.broadcast(
        spark.createDataFrame(offsets, "_b int, _off long")
    )

    win = Window.partitionBy("_b").orderBy("_h", key_col)
    return (
        staged.join(off, "_b")
        .withColumn("pos", F.col("_off") + F.row_number().over(win) - 1)
        .drop("_h", "_b", "_off")
    )


def curriculum_order(
    df: DataFrame,
    by_col: str,
    n_tiers: int = 10,
    seed: int = 0,
    key_col: str = "doc_id",
    cuts: list[float] | None = None,
    ascending: bool = True,
    staging_dir: str | None = None,
    stage: bool | None = None,
) -> CurriculumOrder:
    """Curriculum training order: global positions that walk difficulty
    TIERS in ``by_col`` order (easy→hard for ``ascending=True``) with the
    seeded pseudo-random shuffle WITHIN each tier — the standard curriculum
    export (Bengio et al. 2009 practice: coarse difficulty bands, shuffled
    inside the band, so the model sees a stable difficulty ramp without a
    deterministic per-example order).

    Mechanics are ``shuffle_corpus``'s exactly, with the tier prepended to
    the fixed-prefix sort key: full order = (tier, md5(seed||'-'||key),
    key), buckets = (tier, 3-hex-prefix) — still a PREFIX of the sort key,
    so per-composite-bucket row_number + broadcast offsets reproduce the
    global rank with ONE data shuffle and a ≤ ``n_tiers``·4096-row offset
    collect. No range-sampled sort, no global window; deterministic under
    any partitioning GIVEN the cuts.

    ``cuts``: the ``n_tiers-1`` ascending tier boundaries (tier =
    #{cuts below-or-equal score}; rows with NULL ``by_col`` go to a
    strictly-final extra tier in EITHER walk direction — unscoreable
    examples train last, not first). ``cuts=None`` estimates them once via
    ``percentile_approx`` — a bounded driver artifact, the
    ``train_centroids`` pattern: PERSIST the returned ``.cuts`` to
    reproduce the exact order across sessions, since the sketch depends on
    the input split. ``ascending=False`` reverses the tier walk
    (hard→easy), keeping within-tier shuffle identical.

    Returns ``CurriculumOrder(df, cuts)`` — the positioned frame and the
    reproducibility artifact as explicit fields.

    DuckDB twin (value-verified in tests):
    ``row_number() OVER (ORDER BY tier, md5(seed||'-'||key), key) - 1``.
    """
    from photo_vector_search_spark.operators.staging import session_staging_dir

    if n_tiers < 2:
        raise ValueError(f"n_tiers must be >= 2, got {n_tiers}")
    spark = df.sparkSession
    if cuts is None:
        qs = [i / n_tiers for i in range(1, n_tiers)]
        row = df.agg(
            F.percentile_approx(F.col(by_col), qs).alias("c")
        ).first()
        cuts = [float(c) for c in (row["c"] or [])]
    if sorted(cuts) != list(cuts):
        raise ValueError(f"cuts must be ascending, got {cuts}")
    tier = F.lit(0)
    for c in cuts:
        tier = tier + (F.col(by_col) > F.lit(float(c))).cast("int")
    last = len(cuts)
    if not ascending:
        tier = F.lit(last) - tier
    # NULL scores go to a strictly-final extra tier in EITHER direction —
    # applied after the reversal so descending cannot promote unscoreable
    # rows to train first (round-10 review fix; previously the reversal
    # flipped the NULL tier to 0)
    tier = F.when(F.col(by_col).isNull(), F.lit(last + 1)).otherwise(tier)
    if stage is None:
        stage = not _rescan_safe_and_cheap(df)
    h = F.md5(
        F.concat_ws("-", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    bucketed = (
        df.withColumn("_t", tier.cast("int"))
        .withColumn("_h", h)
        .withColumn(
            "_b", F.conv(F.substring(F.col("_h"), 1, 3), 16, 10).cast("int")
        )
    )
    if stage:
        if staging_dir is None:
            staging_dir = session_staging_dir("pvs_curriculum")
        bucketed.write.mode("overwrite").parquet(staging_dir)
        staged = spark.read.parquet(staging_dir)
    else:
        staged = bucketed
    counts = {
        (r["_t"], r["_b"]): r["n"]
        for r in staged.groupBy("_t", "_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for t, b in sorted(counts):
        offsets.append((t, b, acc))
        acc += counts[(t, b)]
    if not offsets:
        out = staged.drop("_t", "_h", "_b").withColumn(
            "pos", F.lit(None).cast("long")
        )
        return CurriculumOrder(out, cuts)
    off = F.broadcast(
        spark.createDataFrame(offsets, "_t int, _b int, _off long")
    )
    win = Window.partitionBy("_t", "_b").orderBy("_h", key_col)
    out = (
        staged.join(off, ["_t", "_b"])
        .withColumn("pos", F.col("_off") + F.row_number().over(win) - 1)
        .drop("_t", "_h", "_b", "_off")
    )
    return CurriculumOrder(out, cuts)
