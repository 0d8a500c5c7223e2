"""Measure streaming-dedup per-batch cost as HISTORY grows (the scale claim of
incremental_lsh_dedup: each drain pays for its batch + keyed joins against the
accumulated index — never a recompute over history).

Usage: python tools/stream_dedup_bench.py [n_batches] [sf_dir] [op] [compact_every]

``op`` ∈ {lsh, srp}: text MinHash stream over documents (default) or the
embedding SRP stream over embeddings. Splits the table into n equal batches
by id mod n, drains them one at a time through ONE state dir, and prints
per-batch wall seconds plus the final pair-count parity against the batch
operator on the union corpus.

``compact_every`` > 0 folds the state into the bucket-partitioned base
(``streaming.compaction.compact_dedup_state``) after every K drains — the
offline cadence a production stream would run — so the walls measure the
pruned-probe read path AND the final parity validates correctness through
compaction end-to-end.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


SRP_PARAMS = dict(tau=0.45, n_planes=6, n_tables=16, seed=42)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    op = sys.argv[3] if len(sys.argv) > 3 else "lsh"
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from photo_vector_search_spark.operators.dedup import (
        minhash_lsh_pairs,
        srp_lsh_near_dup_pairs,
    )
    from photo_vector_search_spark.session import get_spark
    from photo_vector_search_spark.sources.tables import load_table
    from photo_vector_search_spark.streaming.incremental import (
        incremental_lsh_dedup,
        incremental_srp_dedup,
    )

    spark = get_spark("pvs-stream-dedup-bench")
    tmp = tempfile.mkdtemp(prefix="pvs_streambench_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        if op == "lsh":
            table = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            id_col = "doc_id"
            start = lambda: incremental_lsh_dedup(  # noqa: E731
                spark, in_dir, state, ckpt, n=3, tau=0.5
            )
            batch_count = lambda df: minhash_lsh_pairs(df, n=3, tau=0.5).count()  # noqa: E731
        elif op == "srp":
            table = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "embedding", "label"
            )
            id_col = "vec_id"
            start = lambda: incremental_srp_dedup(  # noqa: E731
                spark, in_dir, state, ckpt, **SRP_PARAMS
            )
            batch_count = lambda df: srp_lsh_near_dup_pairs(  # noqa: E731
                df.select("vec_id", "embedding"), **SRP_PARAMS
            ).count()
        else:
            raise SystemExit(f"op must be lsh|srp, got {op!r}")
        table = table.persist()
        n_rows = table.count()
        walls = []
        for b in range(n_batches):
            batch = table.filter(F.col(id_col) % n_batches == b)
            batch.write.mode("append").parquet(in_dir)
            t0 = time.perf_counter()
            q = start()
            if not q.awaitTermination(600):
                # a still-running drain would corrupt every later wall and the
                # parity check — fail loudly rather than print plausible junk
                q.stop()
                raise SystemExit(f"batch {b} drain exceeded 600s; aborting bench")
            walls.append(round(time.perf_counter() - t0, 2))
            if compact_every and (b + 1) % compact_every == 0:
                from photo_vector_search_spark.streaming.compaction import (
                    compact_dedup_state,
                )

                # stream is stopped (drain terminated) — the caller contract;
                # keep_latest stays True: the NEXT start() replays nothing,
                # but the exclusion rule must hold for a crashed final attempt
                compact_dedup_state(spark, state, kind=op)
        streamed = spark.read.parquet(f"{state}/pairs").drop("batch_id").count()
        batch_pairs = batch_count(table)
        print(
            {
                "op": op,
                "compact_every": compact_every,
                "sf_dir": sf_dir,
                "n_rows": n_rows,
                "n_batches": n_batches,
                "per_batch_wall_s": walls,
                "streamed_pairs": streamed,
                "batch_pairs": batch_pairs,
                "parity": streamed == batch_pairs,
            }
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
