"""Measure streaming-dedup per-batch cost as HISTORY grows (the scale claim of
incremental_lsh_dedup: each drain pays for its batch + keyed joins against the
accumulated index — never a recompute over history).

Usage: python tools/stream_dedup_bench.py [n_batches] [sf_dir]

Splits the sf documents into n equal batches by doc_id mod n, drains them one
at a time through ONE state dir, and prints per-batch wall seconds plus the
final pair-count parity against the batch operator on the union corpus.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
    from photo_vector_search_spark.session import get_spark
    from photo_vector_search_spark.sources.tables import load_table
    from photo_vector_search_spark.streaming.incremental import (
        incremental_lsh_dedup,
        read_dedup_pairs,
    )

    spark = get_spark("pvs-stream-dedup-bench")
    tmp = tempfile.mkdtemp(prefix="pvs_streambench_")
    in_dir, state, ckpt = f"{tmp}/in", f"{tmp}/state", f"{tmp}/ckpt"
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        docs = docs.persist()
        n_docs = docs.count()
        walls = []
        for b in range(n_batches):
            batch = docs.filter(F.col("doc_id") % n_batches == b)
            batch.write.mode("append").parquet(in_dir)
            t0 = time.perf_counter()
            q = incremental_lsh_dedup(spark, in_dir, state, ckpt, n=3, tau=0.5)
            q.awaitTermination(600)
            walls.append(round(time.perf_counter() - t0, 2))
        streamed = read_dedup_pairs(spark, state).count()
        batch_pairs = minhash_lsh_pairs(docs, n=3, tau=0.5).count()
        print(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
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
