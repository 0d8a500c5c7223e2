"""binaryFile directory-scan source (SC1/SC2) and Structured Streaming
event-time window aggregation with watermark (SURVEY §2.9)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.sources.binary_files import scan_images, with_basename
from photo_vector_search_spark.sources.tables import load_table


def test_scan_images_recursive_extension_filter(spark):
    tmp = tempfile.mkdtemp(prefix="pvs_scan_")
    try:
        os.makedirs(f"{tmp}/sub/deep")
        for rel, content in [
            ("a.jpg", b"jpg-a"),
            ("b.PNG", b"png-b"),  # case-insensitive match (cli.py:42 lowercases)
            ("sub/c.jpeg", b"jpeg-c"),
            ("sub/deep/d.jpg", b"jpg-d"),
            ("notes.txt", b"not an image"),
            ("sub/skip.gif", b"gif"),
        ]:
            with open(f"{tmp}/{rel}", "wb") as f:
                f.write(content)
        df = with_basename(scan_images(spark, tmp))
        rows = {r.basename: r for r in df.collect()}
        assert set(rows) == {"a.jpg", "b.PNG", "c.jpeg", "d.jpg"}
        assert bytes(rows["d.jpg"].content) == b"jpg-d"  # recursive + content read
        assert rows["a.jpg"].length == 5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_dedup_with_watermark(spark, sf_dir):
    """Streaming exact dedup: dropDuplicates on the key within the watermark —
    re-delivered events collapse to one row (at-least-once → effectively-once)."""
    tmp = tempfile.mkdtemp(prefix="pvs_sdedup_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(200)
        # write the same batch twice = duplicate delivery
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        ev.write.mode("append").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_stream")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), 'stream did not drain within 600s'
        n = spark.sql("SELECT count(*) AS n FROM dedup_stream").first()["n"]
        assert n == 200  # 400 delivered, 200 unique
    finally:
        spark.catalog.dropTempView("dedup_stream")
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_windowed_agg_with_watermark(spark, sf_dir):
    """Real readStream: tumbling 1-hour event-time windows with a watermark,
    availableNow drain into a memory sink; totals must equal the batch query."""
    tmp = tempfile.mkdtemp(prefix="pvs_wstream_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # complete mode: append would withhold windows the watermark hasn't
        # closed yet (the stream's final hours would never emit in a drain run)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("windowed_counts")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), 'stream did not drain within 600s'
        got = spark.sql(
            "SELECT date_format(w.start, 'yyyy-MM-dd HH:mm') AS hour, event_type, n "
            "FROM windowed_counts"
        )
        batch = ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n"))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    finally:
        spark.catalog.dropTempView("windowed_counts")
        shutil.rmtree(tmp, ignore_errors=True)
