"""Compaction wall-crossover micro-bench (VERDICT r6 item 5).

The 50k-doc stream table in SCALE_BENCH.md shows size-GATED compaction
slightly wall-NEGATIVE (~15%) — at tens-of-MB state the touched-prefix
driver job costs more than the sub-second scans it prunes. This tool
measures the regime the pruning exists for: a LARGE accumulated state
(millions of band rows across hundreds of committed batch partitions —
the shape a long-running stream actually accretes), probed per batch by a
candidate semi-join, comparing

  A. uncompacted: read_state_family over N batch_id partitions, then the
     probe join (every batch re-opens/re-scans N directories);
  B. compacted:   the same rows folded into a pfx-partitioned base, read
     with pfx_values = the probe batch's touched prefixes (computed inside
     the timed region, as the stream does), then the same probe join.

Prints one JSON line with per-probe-size walls and the state geometry.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

STATE = "/tmp/pvs_compact_xover/state"
N_BATCHES = 128
ROWS_PER_BATCH = 50_000
N_PREFIXES = 256
PROBE_SIZES = (200, 2_000, 20_000)
RUNS = 3


def synthesize(spark) -> None:
    if os.path.exists(f"{STATE}/_SYNTH_DONE"):
        return
    shutil.rmtree(STATE, ignore_errors=True)
    for b in range(N_BATCHES):
        (
            spark.range(ROWS_PER_BATCH)
            .select(
                (F.col("id") % 9).cast("int").alias("band"),
                F.md5(F.concat_ws("-", F.lit(b), F.col("id"))).alias("band_key"),
                (F.lit(b) * ROWS_PER_BATCH + F.col("id")).alias("doc_id"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{STATE}/bands/batch_id={b}")
        )
        # registry family: required by the compaction eligibility rule
        (
            spark.range(ROWS_PER_BATCH)
            .select(
                (F.lit(b) * ROWS_PER_BATCH + F.col("id")).alias("doc_id"),
                F.md5(F.col("id").cast("string")).alias("fp"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{STATE}/docs/batch_id={b}")
        )
        # shingles family can be empty-equivalent but must exist per batch
        (
            spark.range(1)
            .select(
                (F.lit(b) * ROWS_PER_BATCH).alias("doc_id"),
                F.lit(0).cast("int").alias("shingle"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{STATE}/shingles/batch_id={b}")
        )
    open(f"{STATE}/_SYNTH_DONE", "w").close()


def probe_frame(spark, size: int):
    """A batch's candidate keys: uniform sample of the key space (the same
    md5 construction, so every probe key EXISTS in state — the worst case
    for pruning: real hits in every touched prefix)."""
    return (
        spark.range(size)
        .select(
            (F.col("id") % 9).cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    "-", (F.col("id") % N_BATCHES), (F.col("id") * 251) % ROWS_PER_BATCH
                )
            ).alias("band_key"),
        )
        .distinct()
    )


def timed_probe(spark, size: int, compacted: bool) -> float:
    from photo_vector_search_spark.streaming.compaction import (
        load_manifest,
        read_state_family,
    )

    probe = probe_frame(spark, size)
    probe.count()  # materialize the probe input outside the timed region
    t0 = time.perf_counter()
    pfx_values = None
    if compacted:
        from photo_vector_search_spark.streaming.compaction import pfx_col

        mani = load_manifest(STATE)
        # the touched-prefix job, INSIDE the timed region (the stream pays it)
        pfx_values = [
            r["pfx"]
            for r in probe.select(
                pfx_col("bands", mani["n_prefixes"]).alias("pfx")
            )
            .distinct()
            .collect()
        ]
    state = read_state_family(
        spark, STATE, "bands", current_batch=10**9, pfx_values=pfx_values
    )
    n = state.join(F.broadcast(probe), ["band", "band_key"]).count()
    dt = time.perf_counter() - t0
    assert n >= 0
    return dt


def main() -> None:
    from photo_vector_search_spark.session import get_spark
    from photo_vector_search_spark.streaming.compaction import compact_dedup_state

    spark = get_spark("pvs-compact-xover")
    try:
        synthesize(spark)
        out: dict = {
            "n_batches": N_BATCHES,
            "rows": N_BATCHES * ROWS_PER_BATCH,
            "n_prefixes": N_PREFIXES,
        }
        # A: uncompacted (state is all batch partitions)
        for size in PROBE_SIZES:
            out[f"uncompacted_probe{size}"] = round(
                min(timed_probe(spark, size, compacted=False) for _ in range(RUNS)), 3
            )
        # fold everything (keep_latest=False: bench owns the dir, no stream)
        t0 = time.perf_counter()
        mani = compact_dedup_state(
            spark, STATE, "lsh", n_prefixes=N_PREFIXES, keep_latest=False
        )
        out["compact_wall"] = round(time.perf_counter() - t0, 1)
        out["base_bytes_bands"] = mani["bytes"]["bands"]
        for size in PROBE_SIZES:
            out[f"compacted_probe{size}"] = round(
                min(timed_probe(spark, size, compacted=True) for _ in range(RUNS)), 3
            )
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
