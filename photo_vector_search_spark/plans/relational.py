"""Relational scaffolding queries: TPC-H-style joins/aggregations plus event-time
and JSON operators over the `events` table (SURVEY §2.3 note, §2.9 S1, FIXTURES.md).

The reference has no relational joins (SURVEY §2.3) — these exercise the engine
capabilities any Spark deployment of it would also serve, and they are the
shuffle-heavy part of the bench.

Float-determinism: double addition is order-dependent and Spark's partial
aggregation order differs from DuckDB's sequential scan, so every SUM over doubles
is computed over DECIMAL casts (exact, order-free) and only converted back to
double for the final rounded output. Products stay in double (deterministic
per-row) and are decimal-cast before summation.

Scale notes:
- q1: single scan + partial/final hash agg on 4 groups — map-side combine does
  nearly all the work; shuffle is O(groups × partitions).
- q3/q5: equi-joins; `region`/`nation` (and `customer` at these SFs) are broadcast
  — AQE converts at runtime. The lineitem side never shuffles for broadcast joins;
  the final agg shuffles only the grouped partials.
- window/top-k per group: one shuffle on the partition key; rows within groups
  stay in their shuffle partition (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from photo_vector_search_spark.sources.tables import load_table


def _dsum(col: Column) -> Column:
    """Exact order-free sum of a double expression: cast each term to decimal."""
    return F.sum(col.cast("decimal(18,6)"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (adapted to fixture columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_dsum(F.col("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(_dsum(F.col("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(_dsum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(_dsum(charge).cast("double"), 4).alias("sum_charge"),
            F.round(_dsum(F.col("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
            F.round(_dsum(F.col("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
            F.round(_dsum(F.col("l_discount")).cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


_ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority top-10 (join customer⨝orders⨝lineitem)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
    )
    return (
        agg.orderBy(F.col("_rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


_ORACLE_Q3 = """
WITH agg AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS _rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1996-01-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, round(CAST(_rev AS DOUBLE), 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM agg ORDER BY _rev DESC, l_orderkey ASC LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume (6-table join, broadcast dims)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
        .select("n_name", F.round(F.col("_rev").cast("double"), 4).alias("revenue"))
    )


_ORACLE_Q5 = """
SELECT n_name, round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""


def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 batched analogue on relational data: top-2 orders per customer by price."""
    o = load_table(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank",
        )
    )


_ORACLE_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 2
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/§2.10 — tumbling event-time aggregation (batch form of the streaming
    windowed agg; same grouping Structured Streaming would produce)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(_dsum(F.col("value")).cast("double"), 4).alias("total_value"),
        )
    )


_ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note — JSON prop extraction (`props` is the MapType escape hatch)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k_val"), "value")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k_val"), 6).alias("avg_k"),
            F.max("k_val").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_ORACLE_EVENTS_JSON = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap per user (lag + running sum) — the
    batch twin of a session window. Summarized per user for a compact result."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_flag = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    with_sid = with_flag.withColumn("session_id", F.sum("new_sess").over(w))
    return (
        with_sid.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_ORACLE_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM sess GROUP BY user_id
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the user's most recent prior (or
    simultaneous) click — oracle uses DuckDB's NATIVE ASOF JOIN, so the Spark
    union-window implementation is validated against an independent engine's
    built-in temporal-join semantics."""
    from photo_vector_search_spark.operators.joins import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    joined = asof_join_backward(
        errors, clicks, by=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["click_value"],
    )
    gap = F.col("ts").cast("long") - F.col("matched_ts").cast("long")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("err_ts"),
        F.round("click_value", 6).alias("click_value"),
        gap.alias("gap_sec"),
    )


_ORACLE_EVENTS_ASOF = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
       round(c.click_value, 6) AS click_value,
       date_diff('second', c.ts, e.ts) AS gap_sec
FROM errors e ASOF JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: resample events onto a dense per-user hourly
    grid with forward fill — the telemetry-alignment op (grid generation ×
    dimension crossJoin, left join of hourly partials, window ffill). Users < 20
    keep the grid bounded; the grid spans the table's full hour range."""
    ev = load_table(spark, sf_dir, "events")
    # collect EPOCH LONGS, not datetimes: collected timestamps are naive in the
    # session/driver TZ, and any Python-side reinterpretation (.timestamp(),
    # .replace(tzinfo=...)) is wrong on some machine — unix_timestamp stays on
    # the internal epoch and is TZ-proof
    b = ev.agg(
        F.unix_timestamp(F.min(F.date_trunc("hour", "ts"))).alias("e0"),
        F.unix_timestamp(F.max(F.date_trunc("hour", "ts"))).alias("e1"),
    ).first()
    h0_epoch, h1_epoch = int(b["e0"]), int(b["e1"])
    n_hours = (h1_epoch - h0_epoch) // 3600 + 1
    grid = spark.range(n_hours).select(
        F.timestamp_seconds(F.lit(h0_epoch) + F.col("id") * 3600).alias("hour_ts")
    )
    users = ev.filter(F.col("user_id") < 20).select("user_id").distinct()
    agg = (
        ev.filter(F.col("user_id") < 20)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(_dsum(F.col("value")).cast("double"), 4).alias("hsum"),
        )
    )
    full = grid.crossJoin(users).join(agg, ["user_id", "hour_ts"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return full.select(
        "user_id",
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm").alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n"),
        "hsum",
        F.last("hsum", ignorenulls=True).over(w).alias("filled_sum"),
    )


_ORACLE_EVENTS_RESAMPLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events
),
grid AS (
  SELECT unnest(generate_series((SELECT h0 FROM bounds), (SELECT h1 FROM bounds),
                                INTERVAL 1 HOUR)) AS hour_ts
),
users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, count(*) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS hsum
  FROM events WHERE user_id < 20 GROUP BY 1, 2
)
SELECT u.user_id,
       strftime(g.hour_ts, '%Y-%m-%d %H:%M') AS hour,
       coalesce(a.n, 0) AS n,
       a.hsum AS hsum,
       last_value(a.hsum IGNORE NULLS) OVER (
         PARTITION BY u.user_id ORDER BY g.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
FROM grid g
CROSS JOIN users u
LEFT JOIN agg a ON a.user_id = u.user_id AND a.hour_ts = g.hour_ts
"""


PRICE_BANDS = [
    ("budget", 0.0, 20_000.0),
    ("mid", 20_000.0, 60_000.0),
    ("high", 60_000.0, 200_000.0),
    ("luxury", 200_000.0, 10_000_000.0),
]


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: classify orders into price bands via a broadcast
    non-equi join (lo ≤ price < hi). With a handful of bands the broadcast
    nested-loop IS the optimal plan; for large interval tables the scale form
    maps rows to bucket keys (floor(price/width)) and equi-joins on the bucket —
    same results, hash join instead of NLJ."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(_dsum(F.col("o_totalprice")).cast("double"), 2).alias("total"),
    )


_bands_values = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
_ORACLE_RANGE_BAND_JOIN = f"""
WITH bands(band, lo, hi) AS (VALUES {_bands_values})
SELECT band, count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change (adapted to fixture ranges): pure
    filter + aggregate, zero joins/zero-group agg — the query whose entire cost
    is the scan, so every predicate MUST reach the Parquet reader (PushedFilters;
    audited in PLANS.md). At 100 TB this is the pattern where row-group min/max
    pruning does most of the work."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).cast("double"), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


_ORACLE_Q6 = """
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


def regroup_from_finest(
    finest: DataFrame, key_cols: list[str], sets: list[tuple[str, ...]]
) -> DataFrame:
    """Grouping-sets-from-finest: expand an already-aggregated finest-granularity
    table into arbitrary grouping sets and re-aggregate.

    Spark's built-in ``.cube()``/``.rollup()`` expand every INPUT row into all
    grouping sets BEFORE the first aggregation, multiplying partial-agg work by
    |sets| (measured 2.9 s → 1.2 s on the sf0.1 lineitem cube). When every
    aggregate is decomposable and exact (count, decimal sum — associative with
    no re-ordering error), the marginals re-aggregated from the finest cells
    are bit-identical to aggregating the raw rows, and grouping-set expansion
    cost moves from O(rows) to O(distinct groups): the finest table explodes
    ×|sets| (keys outside a set nulled, mirroring CUBE's null-marking) and one
    extra shuffle of |groups|·|sets| rows re-aggregates. At 100 TB the finest
    pass dominates and runs exactly once. NOT valid for non-decomposable aggs
    (median, distinct counts) — those need the raw-row expansion.

    ``finest`` = groupBy(*key_cols) with every measure already aggregated;
    every non-key column is re-aggregated with SUM (pre-aggregate counts as
    counts, sums as sums). Callers apply rounding/display AFTER this, exactly
    as they would after a one-pass cube.

    NULL keys: an explicit grouping id (bitmask of nulled-out columns, Spark's
    ``grouping_id()`` bit order) rides through the expansion and the regroup,
    so a finest cell whose DATA value is NULL stays a distinct output row from
    the grouping-set marker NULL — exactly the native ``.cube()``/``ROLLUP``
    multiset (which separates them by grouping id even when the visible
    columns tie). The id is dropped from the result; only row identity is
    affected."""
    measures = [c for c in finest.columns if c not in key_cols]
    gid_col = "__gid"
    while gid_col in finest.columns:  # avoid capture by a user column
        gid_col = "_" + gid_col
    structs = []
    for s in sets:
        gid = 0
        fields = []
        for bit, k in enumerate(key_cols):
            if k in s:
                fields.append(F.col(k).alias(k))
            else:
                gid |= 1 << (len(key_cols) - 1 - bit)
                fields.append(F.lit(None).cast(finest.schema[k].dataType).alias(k))
        structs.append(F.struct(*fields, F.lit(gid).alias(gid_col)))
    return (
        finest.select(F.explode(F.array(*structs)).alias("g"), *measures)
        .groupBy(
            *[F.col(f"g.{k}").alias(k) for k in key_cols],
            F.col(f"g.{gid_col}").alias(gid_col),
        )
        .agg(*[F.sum(m).alias(m) for m in measures])
        .drop(gid_col)
    )


def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets aggregation (engine scaffolding alongside rollup):
    quantity/revenue totals for every (returnflag, linestatus) combination plus
    all marginals — computed via ``regroup_from_finest`` (one finest pass over
    the fact table, grouping sets expanded on the tiny aggregate). The oracle
    stays DuckDB's native GROUP BY CUBE; results are bit-identical because
    count/decimal-sum are exact decomposable aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    finest = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_quantity")).alias("_dq"),
        _dsum(F.col("l_extendedprice")).alias("_dp"),
    )
    keys = ["l_returnflag", "l_linestatus"]
    cube_sets = [
        ("l_returnflag", "l_linestatus"),
        ("l_returnflag",),
        ("l_linestatus",),
        (),
    ]
    return regroup_from_finest(finest, keys, cube_sets).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
        "n",
        F.round(F.col("_dq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("_dp").cast("double"), 2).alias("sum_price"),
    )


_ORACLE_CUBE = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       count(*) AS n,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


QUERIES = {
    "tpch_q1": q_tpch_q1,
    "cube_lineitem": q_cube_lineitem,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "window_topk_orders": q_window_topk_orders,
    "events_sessionize": q_events_sessionize,
    "events_asof": q_events_asof,
    "events_resample": q_events_resample,
    "range_band_join": q_range_band_join,
}

ORACLES = {
    "range_band_join": _ORACLE_RANGE_BAND_JOIN,
    "cube_lineitem": _ORACLE_CUBE,
    "events_asof": _ORACLE_EVENTS_ASOF,
    "events_resample": _ORACLE_EVENTS_RESAMPLE,
    "tpch_q1": _ORACLE_Q1,
    "tpch_q3": _ORACLE_Q3,
    "tpch_q5": _ORACLE_Q5,
    "window_topk_orders": _ORACLE_WINDOW_TOPK,
    "events_sessionize": _ORACLE_EVENTS_SESSIONIZE,
}

# Retired from the 50-slot declared surface (driver checks exactly 50; see
# text_queries.RETIRED_QUERIES). Both stay implemented + locally oracle-checked
# (tests/test_retired_surface.py):
# - tpch_q6: pure filter+scan-agg — the same pushdown shape tpch_q1 and
#   store_partition_pruned already evidence (PLANS.md keeps its plan audit);
# - events_hourly: tumbling groupBy-count — subsumed by rollup_events
#   (same keyed agg at (type, day) + subtotals) and events_resample
#   (finer-grained time bucketing).
# - events_json (retired r11 for dedup_paragraphs): from_json projection over
#   the events payload — a pure map/scan shape whose pushdown evidence lives
#   in events_resample/sessionize and the store point-lookup plans; stays
#   locally DuckDB-verified here.
RETIRED_QUERIES = {
    "tpch_q6": q_tpch_q6,
    "events_hourly": q_events_hourly,
    "events_json": q_events_json,
}

RETIRED_ORACLES = {
    "tpch_q6": _ORACLE_Q6,
    "events_hourly": _ORACLE_EVENTS_HOURLY,
    "events_json": _ORACLE_EVENTS_JSON,
}
