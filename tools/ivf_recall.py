"""Measure the IVF recall@k vs nprobe curve so a user can pick nprobe with data
(VERDICT r2 item 6, extended per VERDICT r3 item 4 with a CLUSTERED fixture and
build-time multi-assign). Prints markdown tables of mean recall@5 against exact
knn_topk over N_QUERIES query vectors, plus the probed-cluster fraction.

Fixtures:
- ``sf``  — the driver's uniform-random embeddings parquet: IVF's worst case
            (no structure → recall ≈ probed fraction). Honest lower bound.
- ``mog`` — mixture-of-Gaussians on the unit sphere (sources/synthetic.py):
            the clustered regime real encoders produce, where IVF earns its
            keep. Also measured with n_assign=2 (each vector stored in its 2
            nearest clusters — build-time multi-probe).

Run: python tools/ivf_recall.py [sf_dir] [fixture ...]   (default: both)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photo_vector_search_spark.operators.ann import assign_clusters, ivf_topk, train_centroids
from photo_vector_search_spark.operators.knn import fetch_query_vector, knn_topk
from photo_vector_search_spark.session import get_spark
from photo_vector_search_spark.sources.synthetic import mog_embeddings
from photo_vector_search_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FIXTURES = sys.argv[2:] or ["sf", "mog"]
N_CLUSTERS = 16
K = 5
N_QUERIES = 32
NPROBES = (1, 2, 4, 8, 16)


def sweep(spark, emb, title: str, n_assign: int = 1) -> None:
    n = emb.count()
    centroids = train_centroids(emb, n_clusters=N_CLUSTERS)
    indexed = assign_clusters(emb, centroids, n_assign=n_assign).cache()
    indexed.count()

    qrows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(N_QUERIES).collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in qrows}
    exact = {
        qid: {r.vec_id for r in knn_topk(emb, v, k=K).collect()}
        for qid, v in vecs.items()
    }

    print(f"\n## {title} — {n} vectors, {N_CLUSTERS} clusters, "
          f"n_assign={n_assign}, {N_QUERIES} queries\n")
    print("| nprobe | clusters probed | mean recall@5 | min recall@5 | sweep wall s |")
    print("|---|---|---|---|---|")
    for nprobe in NPROBES:
        t0 = time.perf_counter()
        recalls = []
        for qid, v in vecs.items():
            approx = {
                r.vec_id
                for r in ivf_topk(
                    indexed, centroids, v, k=K, nprobe=nprobe, n_assign=n_assign
                ).collect()
            }
            recalls.append(len(exact[qid] & approx) / K)
        wall = time.perf_counter() - t0
        print(
            f"| {nprobe} | {nprobe}/{N_CLUSTERS} ({100 * nprobe // N_CLUSTERS}%) "
            f"| {sum(recalls) / len(recalls):.3f} | {min(recalls):.3f} "
            f"| {wall:.2f} |"
        )
    indexed.unpersist()


def main() -> None:
    spark = get_spark("pvs-ivf-recall")
    try:
        if "sf" in FIXTURES:
            emb = load_table(spark, SF_DIR, "embeddings").cache()
            sweep(spark, emb, f"uniform-random fixture ({SF_DIR})")
            emb.unpersist()
        if "mog" in FIXTURES:
            emb = mog_embeddings(spark, n=2000, dim=64, n_components=32).cache()
            sweep(spark, emb, "clustered fixture (MoG, 32 components, noise 0.15)")
            sweep(
                spark,
                emb,
                "clustered fixture (MoG) + build-time multi-assign",
                n_assign=2,
            )
            emb.unpersist()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
