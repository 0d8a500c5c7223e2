"""Local replica of the driver's DuckDB-oracle comparison
(__spark_entry__.py docstring: row-count + schema + order-insensitive value-hash).

Stricter than the driver: compares normalized cell values directly, so a pass here
should imply a pass there. Floats must already be rounded identically in both engines
(FIXTURES.md conventions); timestamps are normalized to ISO strings; column order is
ignored (sorted by name), row order is ignored (rows sorted by all columns).
"""

from __future__ import annotations

import datetime as _dt

import duckdb
import pandas as pd

from photo_vector_search_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v):
    import numpy as np

    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        # RAW str, exactly like the driver's value hash: no re-rounding here,
        # or a query missing its round(x, 6) would pass locally and MISMATCH
        # at the driver. NaN → 'nan', -0.0 → '-0.0' — also raw.
        return str(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = run_oracle(oracle_sql, sf_dir)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"schema mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row-count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in o_rows][:5]
        diff_o = [r for r in o_rows if r not in s_rows][:5]
        raise AssertionError(
            f"value mismatch (cols={sorted(spark_pdf.columns)}):\n"
            f"  spark-only rows (≤5): {diff_s}\n  oracle-only rows (≤5): {diff_o}"
        )
