"""Simulates the spark-graft driver: smoke entry() at sf0.001, then each
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 with an
order-insensitive value hash."""
import hashlib, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

from photo_vector_search_spark.sources.tables import TABLES

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("driver-sim").getOrCreate())

import __spark_entry__ as m

# t1 smoke
df = m.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

_NON_SCALAR_PREFIXES = ("array", "map", "struct")


def assert_scalar_schema(name, sdf):
    """The real driver canonicalizes result frames with a pandas sort;
    list/dict-typed cells raise `TypeError: unhashable type` there (the r8
    `pack_sequences` regression). Reject them at sim time."""
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if any(t.startswith(p) for p in _NON_SCALAR_PREFIXES):
            raise AssertionError(
                f"{name}: declared column {f.name!r} has non-scalar type {t}; "
                "the driver's pandas canonicalizer cannot sort it — CSV-join "
                "or checksum it instead"
            )


def pandas_sort_probe(cols, rows):
    """Replicate the real driver's pandas sort_values as a CRASH PROBE only
    — its output is discarded. Hashing must NOT flow through pandas: a NULL
    in a numeric column coerces the whole column to float64 there ('1.0' /
    'nan') while the DuckDB side str()s raw values ('1' / 'None'), so a
    pandas-derived hash would MISMATCH on correct queries."""
    import pandas as pd

    cols = sorted(cols)
    pdf = pd.DataFrame(
        [{c: row.asDict()[c] for c in cols} for row in rows]
    )
    if len(pdf):
        pdf.sort_values(by=cols, kind="mergesort")


def value_hash(cols, rows):
    cols = sorted(cols)
    out = [tuple(str(r.asDict()[c]) for c in cols) for r in rows]
    return hashlib.sha256(json.dumps(sorted(out)).encode()).hexdigest()[:12]

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

qs, os_ = m.queries(), m.oracle_sql()
results = {}
for name, fn in qs.items():
    sdf = fn(spark, sf)
    assert_scalar_schema(name, sdf)
    srows = sdf.collect()
    pandas_sort_probe(sdf.columns, srows)
    scols = sdf.columns
    if name not in os_:
        results[name] = f"rows-only: {len(srows)} rows"
        continue
    ores = con.execute(os_[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    sh = value_hash(scols, srows)
    oh = hashlib.sha256(json.dumps(sorted(
        [tuple(str(dict(zip(ocols, r))[c]) for c in sorted(ocols)) for r in orows]
    )).encode()).hexdigest()[:12]
    match = (len(srows) == len(orows)) and (sorted(scols) == sorted(ocols)) and (sh == oh)
    results[name] = f"{'MATCH' if match else 'MISMATCH'} rows={len(srows)}/{len(orows)} hash={sh}/{oh}"
print(json.dumps(results, indent=2))
assert all("MISMATCH" not in v for v in results.values()), "oracle mismatch"
print("DRIVER-SIM: ALL OK")
