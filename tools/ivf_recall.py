"""Measure the IVF recall@k vs nprobe curve at bench scale (default sf0.1) so a
user can pick nprobe with data (VERDICT r2 item 6). Prints a markdown table of
mean recall@5 against exact knn_topk over the first N_QUERIES query vectors,
plus the probed-cluster fraction each nprobe implies.

Run: python tools/ivf_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photo_vector_search_spark.operators.ann import assign_clusters, ivf_topk, train_centroids
from photo_vector_search_spark.operators.knn import fetch_query_vector, knn_topk
from photo_vector_search_spark.session import get_spark
from photo_vector_search_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_CLUSTERS = 16
K = 5
N_QUERIES = 32
NPROBES = (1, 2, 4, 8, 16)


def main() -> None:
    spark = get_spark("pvs-ivf-recall")
    try:
        emb = load_table(spark, SF_DIR, "embeddings").cache()
        n = emb.count()
        centroids = train_centroids(emb, n_clusters=N_CLUSTERS)
        indexed = assign_clusters(emb, centroids).cache()
        indexed.count()

        vecs = {qid: fetch_query_vector(spark, SF_DIR, qid) for qid in range(N_QUERIES)}
        exact = {
            qid: {r.vec_id for r in knn_topk(emb, v, k=K).collect()}
            for qid, v in vecs.items()
        }

        print(f"# IVF recall@{K} vs nprobe — {SF_DIR} ({n} vectors, "
              f"{N_CLUSTERS} clusters, {N_QUERIES} queries)\n")
        print("| nprobe | clusters probed | mean recall@5 | min recall@5 | sweep wall s |")
        print("|---|---|---|---|---|")
        for nprobe in NPROBES:
            t0 = time.perf_counter()
            recalls = []
            for qid, v in vecs.items():
                approx = {
                    r.vec_id
                    for r in ivf_topk(indexed, centroids, v, k=K, nprobe=nprobe).collect()
                }
                recalls.append(len(exact[qid] & approx) / K)
            wall = time.perf_counter() - t0
            print(
                f"| {nprobe} | {nprobe}/{N_CLUSTERS} ({100 * nprobe // N_CLUSTERS}%) "
                f"| {sum(recalls) / len(recalls):.3f} | {min(recalls):.3f} "
                f"| {wall:.2f} |"
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
