"""Fixture-table loaders (see FIXTURES.md for verified schemas).

The driver's synthetic tables at /root/testdata/sf*/ stand in for the reference's data:
``embeddings`` plays the ChromaDB collection (photo_vector_search.py:17-20) with
``label`` as the ``aspect_name`` facet; ``documents`` plays the Ollama-generated
description corpus (photo_vector_search.py:42-82).

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown / column pruning /
partition pruning on these scans, so loaders stay dumb on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects outright — or TIMESTAMP(MICROS). Handle both: nanos are
    read as long (runtime-settable SQL conf) and truncated to micros the same way
    DuckDB does, so oracle parity holds; micros pass through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # Integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53 exact
        # range, so a float divide can land on a different microsecond than DuckDB's
        # integer truncation. Keep the arithmetic in int64 end to end.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Normalize to session-TZ TIMESTAMP: the session TZ is pinned UTC
        # (session.py), so the cast is a wall-clock identity, and downstream
        # epoch arithmetic (cast to bigint, unix_timestamp) stays legal — NTZ
        # forbids those casts. DuckDB reads the same parquet as naive-UTC, so
        # oracle parity is unaffected.
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
