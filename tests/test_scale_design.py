"""Scale-design evidence tests: the plan-level properties that make operators
survive 100×, asserted on real plans (not just docstring claims).

- partition pruning: IVF store written partitionBy(cluster_id) → probe filter
  prunes at the file-listing level;
- bucketed co-located join: bucketBy the join key → sort-merge join with NO
  shuffle exchange on either side;
- salting: skewed aggregation rewritten as two-phase salted agg, same results.
"""

from __future__ import annotations

import io
import shutil
import tempfile
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.operators.ann import assign_clusters, train_centroids
from photo_vector_search_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ivf_partitioned_store_prunes_files(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb, n_clusters=8)
    indexed = assign_clusters(emb, centroids)
    tmp = tempfile.mkdtemp(prefix="pvs_ivf_store_")
    try:
        indexed.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
        store = spark.read.parquet(tmp)
        probed = store.filter(F.col("cluster_id").isin([0, 3]))
        plan = _plan(probed)
        assert "PartitionFilters" in plan and "cluster_id" in plan.split("PartitionFilters")[1].split("]")[0]
        # pruned read returns exactly those clusters' rows
        expect = indexed.filter(F.col("cluster_id").isin([0, 3])).count()
        assert probed.count() == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """bucketBy(join key) both sides → co-located sort-merge join: the physical
    plan must contain no Exchange (the 100 TB fact-fact join strategy)."""
    tmp = tempfile.mkdtemp(prefix="pvs_warehouse_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_quantity"
        )
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        # external tables: bucketBy needs saveAsTable; explicit paths keep the
        # data out of the default warehouse (warehouse.dir is a static conf)
        li.write.mode("overwrite").option("path", f"{tmp}/li_b").bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").saveAsTable("li_b")
        orders.write.mode("overwrite").option("path", f"{tmp}/o_b").bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").saveAsTable("o_b")
        j = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan(j)
        phys = plan.split("== Physical Plan ==")[1]
        assert "SortMergeJoin" in phys
        assert "Exchange" not in phys, "bucketed join must not shuffle"
        # and it computes the right thing
        assert j.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
        shutil.rmtree(tmp, ignore_errors=True)


def test_salted_aggregation_matches_plain(spark, sf_dir):
    """Two-phase salted agg (hot-key guard): salt → partial agg on (key, salt) →
    final agg on key. Same results as the direct groupBy; the first shuffle
    spreads a hot key over `salt_n` reducers."""
    ev = load_table(spark, sf_dir, "events")
    salt_n = 8
    salted = (
        ev.withColumn("_salt", (F.col("event_id") % salt_n).cast("int"))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv").cast("double"), 4).alias("total"),
        )
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
