"""Fixture-table loaders (see FIXTURES.md for verified schemas).

The driver's synthetic tables at /root/testdata/sf*/ stand in for the reference's data:
``embeddings`` plays the ChromaDB collection (photo_vector_search.py:17-20) with
``label`` as the ``aspect_name`` facet; ``documents`` plays the Ollama-generated
description corpus (photo_vector_search.py:42-82).

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown / column pruning /
partition pruning on these scans — plus a **physical-type normalization layer**: the
fixture parquet is driver-owned and regenerated between rounds, and its physical types
have already changed once in the wild (``events.ts`` flipped TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) in round 4, breaking every event query at the correctness gate).
Each loader therefore normalizes what it read to the documented LOGICAL schema
(FIXTURES.md): integral key columns to their documented width, money/measure columns
to double, and every timestamp column through the same nanos-long / micros-NTZ /
micros-TZ adaptive path. All normalizing casts are value-exact for the variants a
regeneration can produce (int widening/narrowing within range, float→double widening,
decimal(≤15 sig digits)→double round-trips exactly through the queries' decimal(18,6)
re-cast), so DuckDB-oracle hash parity is preserved — the oracle reads the same
variant parquet natively and its own casts land on the same values.

``embedding`` deliberately passes through un-normalized: every consumer (and every
oracle) widens it to double at the use site, so a float→double physical flip is
parity-safe without a cast here, while a loader-side cast *to* the documented float
would lose precision against an oracle reading doubles.

The normalization select is a no-op (``changed`` guard) on the current fixtures, so
plans, pushdown, and bench numbers are untouched until a variant actually appears.
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

# Documented logical types (FIXTURES.md) for every column whose physical type a
# driver regeneration could plausibly change. Strings and the embedding array
# are intentionally absent (pass-through; see module docstring).
_LOGICAL: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
    },
    "events": {"event_id": "bigint", "user_id": "bigint", "value": "double"},
    "documents": {"doc_id": "bigint", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "label": "int"},
}

# Timestamp columns, all normalized through the same adaptive path events.ts
# needed in round 4 (FIXTURES.md documents ts resolution as fixture-variable).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    from pyspark.sql import functions as F

    if name in _TS_COLS:
        # must be set BEFORE the read: the vectorized reader rejects
        # TIMESTAMP(NANOS) parquet outright without it (harmless otherwise —
        # it only changes how nanos, which Spark never writes, are read)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, ()):
        df = _normalize_timestamp(df, c)
    targets = _LOGICAL.get(name, {})
    exprs, changed = [], False
    for f in df.schema.fields:
        want = targets.get(f.name)
        if want is not None and f.dataType.simpleString() != want:
            exprs.append(F.col(f.name).cast(want).alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def _normalize_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Normalize a parquet timestamp column to session-TZ TIMESTAMP whatever
    physical type it shipped as: TIMESTAMP(NANOS) — which arrives as a long
    under ``nanosAsLong`` and is integer-truncated to micros the same way
    DuckDB truncates, so oracle parity holds — TIMESTAMP(MICROS) as NTZ
    (cast is a wall-clock identity under the pinned-UTC session), or an
    already-TZ timestamp (pass-through)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema[col].dataType
    if isinstance(ts_type, T.LongType):
        # Integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
        # exact range, so a float divide can land on a different microsecond
        # than DuckDB's integer truncation. Keep the arithmetic in int64.
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
