"""Measure IVF partition pruning on RUNTIME scan metrics at fixture scale and at
the synthesized sf1 (VERDICT r3 item 7): build the hive-partitioned IVF store
(`build_ivf_store`), probe at each nprobe, and record numFiles / numPartitions /
bytes read from the executed FileSourceScan — ground truth that query cost is
proportional to the probed fraction, independent of corpus size.

Run AFTER tools/scale_bench.py has synthesized /tmp/pvs_scaled/sf1.0 (or pass
sf dirs explicitly):

    python tools/ivf_pruning_scan.py [sf_small] [sf_big]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photo_vector_search_spark.operators.ann import build_ivf_store, ivf_topk, load_ivf_store
from photo_vector_search_spark.operators.knn import fetch_query_vector
from photo_vector_search_spark.session import get_spark
from photo_vector_search_spark.sources.tables import load_table

SF_SMALL = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF_BIG = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pvs_scaled/sf1.0"
N_CLUSTERS = 16
NPROBES = (1, 2, 4, 8, 16)


def _scan_metrics(df) -> dict[str, int]:
    """Runtime FileSourceScan metrics after executing ``df`` (same mechanism as
    tests/test_scale_design.py — executed-plan leaves, not plan-text grep)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    try:
        plan = plan.executedPlan()  # unwrap AdaptiveSparkPlanExec
    except Exception:
        pass
    out: dict[str, int] = {}
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "FileSourceScan" in leaf.getClass().getName():
            m = leaf.metrics()
            keys = m.keys().iterator()
            while keys.hasNext():
                k = keys.next()
                out[k] = out.get(k, 0) + m.apply(k).value()
    return out


def sweep(spark, sf_dir: str, title: str) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    vec = fetch_query_vector(spark, sf_dir, 0)
    tmp = tempfile.mkdtemp(prefix="pvs_ivf_prune_")
    path = tmp + "/store"
    try:
        build_ivf_store(emb, path, n_clusters=N_CLUSTERS)
        store, centroids = load_ivf_store(spark, path)
        print(f"\n## {title} — {n} vectors, {N_CLUSTERS} clusters (hive-partitioned store)\n")
        print("| nprobe | files read | partitions read | bytes read | scan fraction | wall s |")
        print("|---|---|---|---|---|---|")
        full_bytes = None
        for nprobe in reversed(NPROBES):  # full probe first → its bytes = denominator
            t0 = time.perf_counter()
            res = ivf_topk(store, centroids, vec, k=5, nprobe=nprobe)
            m = _scan_metrics(res)
            wall = time.perf_counter() - t0
            size = m.get("filesSize", m.get("bytesRead", 0))
            if nprobe == max(NPROBES):
                full_bytes = max(size, 1)
            frac = size / full_bytes if full_bytes else float("nan")
            print(
                f"| {nprobe} | {m.get('numFiles', '?')} | {m.get('numPartitions', '?')} "
                f"| {size:,} | {frac:.3f} | {wall:.2f} |"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark("pvs-ivf-pruning")
    try:
        sweep(spark, SF_SMALL, f"sf0.1 ({SF_SMALL})")
        if os.path.exists(f"{SF_BIG}/embeddings.parquet"):
            sweep(spark, SF_BIG, f"synthesized sf1 ({SF_BIG})")
        else:
            print(f"\n(skip sf1: {SF_BIG} not synthesized — run tools/scale_bench.py first)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
