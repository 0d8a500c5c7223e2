"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full computation, no write
I/O, no driver collect skew). Timings exclude SparkSession startup; a warmup scan
primes the JVM/code-gen so the first measured query isn't paying JIT costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from photo_vector_search_spark.operators.dedup import (
    embedding_near_dup_fast,
    exact_dedup,
    fuzzy_pairs_blocked,
    minhash_lsh_pairs,
    srp_lsh_near_dup_sql,
)
from photo_vector_search_spark.operators.knn import (
    fetch_query_vector,
    knn_batch_fast,
    knn_topk,
)
from photo_vector_search_spark.operators.ann import (
    assign_clusters,
    ivf_topk,
    train_centroids,
)
from photo_vector_search_spark.plans import (
    embed_queries,
    pipeline_queries,
    relational,
    store_queries,
    text_queries,
)
from photo_vector_search_spark.session import get_spark
from photo_vector_search_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    emb = load_table(spark, sf_dir, "embeddings")
    vec = fetch_query_vector(spark, sf_dir, 0)
    queries64 = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    cases = {
        # flagship retrieval (SQL expression path + fast batched path)
        "knn_topk": lambda: _force(knn_topk(emb, vec, k=5)),
        "knn_batch64_fast": lambda: _force(knn_batch_fast(emb, queries64, k=5)),
        # relational / shuffle-heavy
        "tpch_q1": lambda: _force(relational.q_tpch_q1(spark, sf_dir)),
        "tpch_q3": lambda: _force(relational.q_tpch_q3(spark, sf_dir)),
        "tpch_q5": lambda: _force(relational.q_tpch_q5(spark, sf_dir)),
        "window_topk_orders": lambda: _force(relational.q_window_topk_orders(spark, sf_dir)),
        "events_hourly": lambda: _force(relational.q_events_hourly(spark, sf_dir)),
        "events_sessionize": lambda: _force(relational.q_events_sessionize(spark, sf_dir)),
        # LLM-pipeline operators
        "dedup_exact": lambda: _force(
            exact_dedup(load_table(spark, sf_dir, "documents"))
        ),
        "dedup_minhash_lsh": lambda: _force(
            minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), n=3, tau=0.5)
        ),
        "fuzzy_levenshtein_blocked": lambda: _force(
            fuzzy_pairs_blocked(
                load_table(spark, sf_dir, "documents"), max_dist=16, max_df=0.02
            )
        ),
        "srp_lsh_near_dup_sql": lambda: _force(srp_lsh_near_dup_sql(emb, tau=0.45)),
        "embedding_near_dup": lambda: _force(embedding_near_dup_fast(emb, tau=0.45)),
        "text_stats": lambda: _force(text_queries.q_text_stats(spark, sf_dir)),
        "pack_documents_sharded": lambda: _force(
            pipeline_queries.q_pack_documents_sharded(spark, sf_dir)
        ),
        "cube_lineitem": lambda: _force(relational.q_cube_lineitem(spark, sf_dir)),
        "tfidf_top_terms": lambda: _force(text_queries.q_tfidf_top_terms(spark, sf_dir)),
        "source_drift": lambda: _force(pipeline_queries.q_source_drift(spark, sf_dir)),
        "embed_documents": lambda: _force(embed_queries.q_embed_documents(spark, sf_dir)),
        "ivf_build_and_query": lambda: _force(
            ivf_topk(
                assign_clusters(emb, _centroids := train_centroids(emb, n_clusters=16)),
                _centroids,
                vec,
                k=5,
                nprobe=4,
            )
        ),
        # store surface
        "upsert_merge": lambda: _force(store_queries.q_upsert_merge(spark, sf_dir)),
        "photo_group_collect": lambda: _force(
            store_queries.q_photo_group_collect(spark, sf_dir)
        ),
    }

    only = os.environ.get("SPARK_GRAFT_BENCH_CASES")
    if only:
        keep = [c.strip() for c in only.split(",") if c.strip()]
        unknown = [c for c in keep if c not in cases]
        if unknown:
            raise KeyError(f"unknown bench cases: {unknown}")
        cases = {name: cases[name] for name in keep}

    timings: dict[str, float] = {}
    for name, fn in cases.items():
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    spark = get_spark("pvs-spark-bench")
    try:
        # warmup: small scan through codegen + noop sink
        _force(load_table(spark, SF_DIR, "region"))
        timings = bench_queries(spark, SF_DIR)
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf_val: float | str = float(sf)
        except ValueError:
            sf_val = sf
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_wall",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf_val,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
