"""Query registry: every SURVEY.md §2 operator as a named (Spark, oracle) pair.

``QUERIES[name](spark, sf_dir) -> DataFrame`` is the engine's implementation;
``ORACLES[name]`` is equivalent ANSI SQL for DuckDB over the same parquet
tables (views: region nation customer supplier part orders lineitem events
documents embeddings).  Conventions that make hash-comparison stable:

- every aggregate/computed column is aliased identically on both sides
- every floating-point output is ``round(x, n)`` on both sides
- every LIMIT has a fully deterministic ORDER BY (ties broken by a key)
- counts are BIGINT on both sides (DuckDB HUGEINT sums are cast down)
- md5-derived integers use the low-60-bit hex slice, portable to any
  engine: Spark ``conv(substr(md5(x),18,15),16,10)`` ≡ DuckDB
  ``('0x'||substr(md5(x),18,15))::BIGINT``
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    jaccard_pairs_via_minhash,
    md5_64,
    minhash_near_duplicates,
    simhash64,
    simhash_near_duplicates,
)
from high_throughput_etl_pipeline_spark.operators.graph import dedup_clusters
from high_throughput_etl_pipeline_spark.operators.multimodal import (
    extract_features,
    make_media_table,
    sample_frames,
)
from high_throughput_etl_pipeline_spark.operators.similarity import (
    _dot,
    embedding_near_duplicates,
    hyperplanes,
    ivf_topk,
    lsh_topk,
)
from high_throughput_etl_pipeline_spark.operators.text import (
    BPE_PIECE_RE,
    LANG_STOPWORDS,
    detect_language,
    fingerprint,
    quality_features,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the caller may own the session (the driver does): pin UTC so
    # date_format over timestamps matches the naive values DuckDB sees,
    # regardless of the host session's timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _read_events(spark, f"{sf_dir}/events.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Load an events table whose ``ts`` column may be stored as parquet
    TIMESTAMP(NANOS) (no native Spark type — read nanos-as-long and truncate
    to micros, exactly what DuckDB does), TIMESTAMP(MICROS) naive
    (TimestampNTZ — reinterpret as UTC instant), or TIMESTAMP(MICROS)
    UTC-adjusted (TimestampType — pass through).  Branching on the dtype the
    footer actually declares makes testdata regeneration a no-op."""
    from pyspark.errors import AnalysisException
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        df = spark.read.parquet(path)
    except AnalysisException as exc:
        # Spark refuses TIMESTAMP(NANOS) without the legacy flag; ONLY
        # that refusal takes the retry path — a missing/corrupt file must
        # surface its real error, not a confusing second failure with the
        # session-wide legacy flag left flipped
        if "NANOS" not in str(exc).upper():
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
            raise
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        # session TZ is pinned UTC above, so this reinterprets the naive
        # value as the same wall-clock instant DuckDB sees
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.2-§2.5): aggregations, joins, windows, sorts
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 2)                                   AS sum_qty,
           round(SUM(l_extendedprice), 2)                              AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                       AS sum_charge,
           round(AVG(l_quantity), 4)                                   AS avg_qty,
           round(AVG(l_extendedprice), 4)                              AS avg_price,
           round(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 grouped rollup — the flagship scan+agg (map-side combine,
    4-group output; shuffle is 4 rows per partition)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi-joins + grouped agg + deterministic top-k (O1/O3).
    customer is the small side → broadcast."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            li.l_orderkey.alias("o_orderkey"),
            F.date_format(o.o_orderdate, "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: facts shuffle-join on keys, all dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "events_daily_rollup",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           COUNT(*)                 AS events,
           round(SUM(value), 4)     AS total_value,
           COUNT(DISTINCT user_id)  AS unique_users
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
    ORDER BY date
    """,
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — the Athena daily-summary shape (Athena.sql:114-123) on events."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date"))
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("date")
    )


@query(
    "events_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*)                          AS n,
           round(AVG(value), 4)              AS avg_value,
           round(MIN(value), 4)              AS min_value,
           round(MAX(value), 4)              AS max_value,
           round(stddev_samp(value), 4)      AS stddev_value,
           round(quantile_cont(value, 0.5), 4) AS median_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6 — statistical profile per group (analyze_metrics.py:86-94)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_percentiles",
    oracle="""
    SELECT round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    """,
)
def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — P50/P95/P99 (analyze_metrics.py:97-100); exact interpolated
    percentile so the oracle matches bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "events_peak_hour",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d-%H') AS date_hour,
           COUNT(*) AS file_count,
           round(SUM(value), 4) AS volume
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d-%H')
    ORDER BY file_count DESC, date_hour
    LIMIT 1
    """,
)
def events_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W1 — argmax hour (analyze_metrics.py:109-110)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd-HH").alias("date_hour"))
        .agg(
            F.count("*").alias("file_count"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .orderBy(F.desc("file_count"), "date_hour")
        .limit(1)
    )


@query(
    "events_hourly_breakdown",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d-%H') AS date_hour,
           COUNT(*) AS file_count,
           round(SUM(value), 4) AS volume
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d-%H')
    ORDER BY date_hour
    """,
)
def events_hourly_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — per-hour breakdown table (analyze_metrics.py:151-160)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd-HH").alias("date_hour"))
        .agg(
            F.count("*").alias("file_count"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .orderBy("date_hour")
    )


@query(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS order_count,
           round(SUM(o.o_totalprice), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + O1/O3 — grouped join + deterministic top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@query(
    "q4_priority_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS → left-semi join, then priority rollup
    (adapted to this schema's returnflag; no commit/receipt dates)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(strftime(l.l_shipdate, '%Y') AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: two-nation trade volume by year — one fact-fact
    shuffle join (lineitem-orders); supplier/customer/nation broadcast."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: lost-revenue ranking over returned items in one
    quarter; date filter pushes to the orders scan, returnflag to the
    lineitem scan, dims broadcast.

    Revenue is summed in exact DECIMAL on both engines (then cast to
    double for the rounded output): double summation ORDER differs
    between engines, and this query's sums land on round-half midpoints
    (…x.xx5) where a 1-ulp order difference flips the rounded cent."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(big.total_qty, 2) AS total_qty
    FROM (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: join against own aggregate (HAVING pre-filter
    shrinks the fact side before the joins)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: disjunctive join+filter predicates — Catalyst
    extracts the common l_partkey equi-key so the join stays hash-based
    with the OR applied as a post-join filter (never a nested loop)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ), eligible AS (
        SELECT c.l_partkey, c.unit_cost, s.s_name, n.n_name
        FROM costs c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, e.s_name, e.n_name,
           round(e.unit_cost, 6) AS unit_cost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
      AND e.unit_cost = (
          SELECT MIN(e2.unit_cost) FROM eligible e2
          WHERE e2.l_partkey = e.l_partkey)
    ORDER BY p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: correlated-min subquery → window argmin per part.

    No partsupp table in this schema, so "supply cost" is the min observed
    unit price (l_extendedprice/l_quantity) per (part, supplier).  The
    correlated ``= (SELECT MIN ...)`` becomes a window min over l_partkey —
    one shuffle on the part key, no self-join; dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    costs = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eligible = (
        costs.join(F.broadcast(s), costs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        eligible.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                          ELSE 0 END) / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: conditional-share aggregate — one fact-fact join
    (lineitem-orders), every dim broadcast, share computed as a
    case-sum / sum in a single grouped pass."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))
                    .otherwise(F.lit(0.0))
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_profit_rollup",
    oracle="""
    SELECT nation, o_year, round(SUM(amount), 2) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year ORDER BY nation, o_year
    """,
)
def q9_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: derived-cost profit by supplier nation × year.

    No ps_supplycost column — cost is proxied as 60% of p_retailprice per
    unit, which preserves the query shape (revenue minus a part-joined
    cost term).  lineitem-orders is the only fact-fact shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q11_important_value",
    oracle="""
    WITH scoped AS (
        SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    ), per_part AS (
        SELECT l_partkey AS p_partkey, SUM(val) AS part_value
        FROM scoped GROUP BY 1
    )
    SELECT p_partkey, CAST(round(part_value, 2) AS DOUBLE) AS part_value
    FROM per_part
    WHERE part_value > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(6,3))
                        FROM scoped)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: HAVING vs a global scalar — per-part value compared
    against a fraction of the whole-scope total.

    The scalar total is a broadcast cross-join (one row), so the only
    shuffle is the per-part aggregate.  Sums run in DECIMAL(18,2) so the
    threshold comparison is exact and order-independent (double sums are
    associativity-sensitive; a part near the boundary could flip)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "l_partkey",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("val"),
        )
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum("val").alias("part_value")
    )
    total = scoped.agg(
        (F.sum("val") * F.expr("CAST(0.001 AS DECIMAL(6,3))")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            "p_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: two conditional counts per group after a fact-fact
    join (l_linestatus stands in for shipmode, which this schema lacks)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: outer-join count distribution — customers keep a
    zero bucket via LEFT join; two cascaded aggregates (the second is
    tiny, one row per distinct order count)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: conditional-ratio aggregate over a broadcast part
    join, one month of shipments."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
                )
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: max-over-aggregate (the view + scalar subquery
    becomes agg → broadcast scalar max → exact-equality filter).

    Revenue sums run in DECIMAL so ``= MAX(...)`` is exact on both
    engines — a double sum is associativity-sensitive and the equality
    could miss under a different reduction order."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%7%')
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct-count per part attributes with a NOT IN
    exclusion — the subquery becomes a broadcast left-anti join (never a
    shuffled NOT IN expansion)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49)
    )
    l = _t(spark, sf_dir, "lineitem")
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(excluded), l.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT sh.l_suppkey FROM shipped sh
        JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE '%bolt%' AND sh.qty > 50
    )
    ORDER BY s_name
    """,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: nested semi-join chain — aggregate-then-threshold
    feeding an IN, executed as agg → broadcast part filter → left-semi.
    l_quantity values are whole numbers, so the double sum is exact and
    the > 50 threshold is engine-stable."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    qualified = (
        l.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: scalar-subquery threshold + NOT EXISTS anti-join —
    above-average-balance customers with no order since 1999, by nation.
    (This generator gives every customer at least one order overall, so
    the unrestricted NOT EXISTS would be a vacuous 0-row check — same
    fix as customers_without_orders.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH pairs AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_orderkey, l.l_suppkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM pairs t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE t.late = 1
      AND EXISTS (SELECT 1 FROM pairs p2
                  WHERE p2.l_orderkey = t.l_orderkey
                    AND p2.l_suppkey <> t.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM pairs p3
                      WHERE p3.l_orderkey = t.l_orderkey
                        AND p3.l_suppkey <> t.l_suppkey
                        AND p3.late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: the EXISTS / NOT EXISTS double correlation over
    lineitem, rewritten as one per-order aggregate instead of two
    self-joins.

    This schema has no commit/receipt dates, so "late" is proxied as
    shipping more than 60 days after the order date.  The classic plan
    self-joins lineitem twice (EXISTS: another supplier on the order;
    NOT EXISTS: another *late* supplier); aggregating (n_suppliers,
    n_late_suppliers) per order replaces both with a single shuffle on
    l_orderkey — the form that survives a 100× scale-up."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"), F.sum("late").alias("nlate")
    )
    return (
        pairs.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "events_rollup_totals",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS d, event_type,
           CAST(GROUPING(strftime(ts, '%Y-%m-%d'), event_type) AS BIGINT)
             AS gid,
           COUNT(*) AS n_events,
           round(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP (d, event_type)
    ORDER BY gid, d, event_type
    """,
)
def events_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: (day, type) cells + per-day subtotals + grand total in
    ONE grouped pass — Spark expands the grouping sets map-side, so the
    shuffle carries each row once per grouping set, never a re-scan per
    level.  ``gid`` disambiguates a NULL group key from a subtotal row."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type", "value"
        )
        .rollup("d", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("gid", "d", "event_type")
    )


@query(
    "events_range_window",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE),
                 2) AS sum_1h
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: for each purchase, the user's purchase
    count and value sum over the PRECEDING HOUR — a frame defined by
    event time, not row offsets (`rangeBetween(-3600, 0)` over epoch
    seconds; rows sharing a second are peers and join the frame together
    on both engines).  The velocity/rate-limit shape: partitioned by
    user, so it scales like any grouped window.  The frame sums in
    DECIMAL: sliding-frame double sums are reduction-order-sensitive
    (same lesson as events_rolling_stats)."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        p.withColumn("n_1h", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn(
            "sum_1h",
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)"))
                .over(w)
                .cast("double"),
                2,
            ),
        )
        .select("event_id", "user_id", "n_1h", "sum_1h")
        .orderBy("event_id")
    )


@query(
    "events_cube_matrix",
    oracle="""
    SELECT event_type, dayname(ts) AS dow,
           CAST(GROUPING(event_type, dayname(ts)) AS BIGINT) AS gid,
           COUNT(*) AS n_events,
           round(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, dow)
    ORDER BY gid, event_type, dow
    """,
)
def events_cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE: every (type, weekday) cell PLUS both one-dimension
    margins and the grand total in one grouped pass — 2^d grouping sets
    expand map-side, the shuffle carries each row once per set (ROLLUP's
    sibling; `events_rollup_totals` covers the hierarchical case)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.date_format("ts", "EEEE").alias("dow"),
            "value",
        )
        .cube("event_type", "dow")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("gid", "event_type", "dow")
    )


@query(
    "events_rolling_stats",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               round(SUM(value), 2) AS daily_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, daily_value,
           round(CAST(SUM(CAST(daily_value AS DECIMAL(18,2))) OVER w7
                      AS DOUBLE)
                 / COUNT(*) OVER w7, 4) AS ma7,
           round(daily_value
                 - LAG(daily_value) OVER (PARTITION BY event_type
                                          ORDER BY d), 2) AS delta,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                AS BIGINT) AS day_idx
    FROM daily
    WINDOW w7 AS (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, d
    """,
)
def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series window suite over a daily rollup: 7-day moving average
    (ROWS frame), day-over-day delta (lag), and day index — all three
    share one (event_type, d) sort, so Spark plans a single window
    exchange.

    The moving sum runs in DECIMAL(18,2): engines disagree on the
    reduction ORDER of double sums inside sliding frames (DuckDB uses a
    segment tree), so the frame sum must be exact before the final
    double division."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.round(F.sum("value"), 2).alias("daily_value"))
    )
    by_day = Window.partitionBy("event_type").orderBy("d")
    w7 = by_day.rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        "d",
        "daily_value",
        F.round(
            F.sum(F.col("daily_value").cast("decimal(18,2)")).over(w7)
            .cast("double")
            / F.count(F.lit(1)).over(w7),
            4,
        ).alias("ma7"),
        F.round(
            F.col("daily_value") - F.lag("daily_value").over(by_day), 2
        ).alias("delta"),
        F.row_number().over(by_day).cast("long").alias("day_idx"),
    ).orderBy("event_type", "d")


@query(
    "customer_value_ntiles",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               round(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(spend AS DOUBLE) AS spend,
           CAST(ntile(10) OVER w AS INT) AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM cust
    WINDOW w AS (ORDER BY spend DESC, o_custkey)
    ORDER BY spend DESC, o_custkey
    LIMIT 200
    """,
)
def customer_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite: decile bucketing + distribution ranks over
    per-customer spend — WITHOUT a global window.  global_rank
    (operators/ranking.py) range-partitions the total ordering and adds
    per-partition offsets, so the plan has no empty-partition-spec Window
    (a ~15M-row single-task sort at 100 TB); ntile/percent_rank/cume_dist
    then come in closed form from (rank, n), exactly matching the window
    functions because the (spend DESC, custkey) ordering is total.
    Spend sums in DECIMAL so the rank order is engine-exact."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
        ).alias("spend")
    )
    ranked, n = global_rank(
        cust, [F.col("spend").desc(), F.col("o_custkey")], rank_col="_rank"
    )
    # ntile(10): the first n%10 tiles hold ceil(n/10) rows, the rest
    # floor(n/10) — closed form over the exact rank (n is driver-side)
    tiles = 10
    q, m = divmod(n, tiles)
    big = (q + 1) * m
    r = F.col("_rank")
    if q == 0:
        decile = r.cast("int")
    else:
        decile = (
            F.when(r <= big, F.ceil(r / (q + 1)))
            .otherwise(m + F.ceil((r - big) / q))
            .cast("int")
        )
    pct_rank = (
        F.round((r - 1) / float(n - 1), 6) if n > 1 else F.lit(0.0)
    )
    return (
        ranked.select(
            "o_custkey",
            F.col("spend").cast("double").alias("spend"),
            decile.alias("decile"),
            pct_rank.alias("pct_rank"),
            F.round(r / float(n), 6).alias("cume"),
        )
        .orderBy(F.desc("spend"), "o_custkey")
        .limit(200)
    )


@query(
    "events_daily_pivot",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS d,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'view')     AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           round(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0.0),
                 2) AS purchase_value
    FROM events
    GROUP BY d ORDER BY d
    """,
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): day × event-type matrix via ``pivot`` with an
    EXPLICIT value list — without it Spark runs an extra distinct pass to
    discover columns, and the output schema depends on the data (both
    wrong at scale).  Count and value ride ONE multi-aggregate pivot —
    one scan, one shuffle, same plan as the oracle's FILTER form."""
    e = _t(spark, sf_dir, "events")
    wide = (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
            "event_type",
            "value",
        )
        .groupBy("d")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("val"),
        )
    )
    return wide.select(
        "d",
        F.coalesce("click_n", F.lit(0)).alias("click"),
        F.coalesce("view_n", F.lit(0)).alias("view"),
        F.coalesce("purchase_n", F.lit(0)).alias("purchase"),
        F.coalesce("purchase_val", F.lit(0.0)).alias("purchase_value"),
    ).orderBy("d")


@query(
    "nation_order_coverage",
    oracle="""
    WITH nat_orders AS (
        SELECT c.c_nationkey AS nationkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority = '1-URGENT'
        GROUP BY c.c_nationkey
    )
    SELECT COALESCE(n.n_nationkey, no.nationkey) AS nationkey,
           n.n_name,
           COALESCE(no.n_orders, 0) AS urgent_orders
    FROM nation n
    FULL OUTER JOIN nat_orders no ON no.nationkey = n.n_nationkey
    ORDER BY nationkey
    """,
)
def nation_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: every nation appears even with zero urgent
    orders, and (defensively) every order-nation even if the dim were
    incomplete — the referential-integrity audit shape.  The aggregate
    runs BEFORE the join, so the outer join sees one row per nation,
    and the small side broadcasts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    n = _t(spark, sf_dir, "nation")
    nat_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        n.join(
            nat_orders, n.n_nationkey == nat_orders.nationkey, "full_outer"
        )
        .select(
            F.coalesce("n_nationkey", "nationkey").alias("nationkey"),
            "n_name",
            F.coalesce("n_orders", F.lit(0)).alias("urgent_orders"),
        )
        .orderBy("nationkey")
    )


@query(
    "distinct_event_types",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
)
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O2 — sorted distinct key set (builder.py:867-920)."""
    return _t(spark, sf_dir, "events").select("event_type").distinct().orderBy(
        "event_type"
    )


@query(
    "orders_batching",
    oracle="""
    WITH numbered AS (
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m') AS order_month,
               row_number() OVER (
                   PARTITION BY strftime(o_orderdate, '%Y-%m')
                   ORDER BY o_orderkey
               ) AS rn
        FROM orders
    )
    SELECT order_month,
           CAST(floor((rn - 1) / 100.0) AS BIGINT) AS batch_id,
           COUNT(*) AS file_count,
           MIN(o_orderkey) AS first_key,
           MAX(o_orderkey) AS last_key
    FROM numbered
    GROUP BY 1, 2
    ORDER BY order_month, batch_id
    """,
)
def orders_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — fixed-size chunked batching as a window op
    (builder.py:1029-1070 driver loop → row_number/floor).

    The window is PARTITIONED by order month — the same shape
    assign_batches uses (partition by date_prefix, operators/batching.py)
    — so the numbering parallelizes; an unpartitioned row_number would be
    a single-task sort at scale."""
    o = _t(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM")
    w = Window.partitionBy("order_month").orderBy("o_orderkey")
    return (
        o.withColumn("order_month", month)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", F.floor((F.col("rn") - 1) / 100.0))
        .groupBy("order_month", "batch_id")
        .agg(
            F.count("*").alias("file_count"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .orderBy("order_month", "batch_id")
    )


@query(
    "status_shard_roundtrip",
    oracle="""
    WITH sharded AS (
        SELECT c_name,
               ('0x' || substr(md5(c_name), 18, 15))::BIGINT % 10 AS shard_id
        FROM customer
    ), tagged AS (
        SELECT c_name, shard_id,
               'pending#' || shard_id AS status
        FROM sharded
    )
    SELECT split_part(status, '#', 1) AS status_base,
           CAST(split_part(status, '#', 2) AS INT) AS shard_back,
           COUNT(*) AS n
    FROM tagged
    GROUP BY 1, 2
    ORDER BY status_base, shard_back
    """,
)
def status_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8 — md5 write-shard + `status#shard` build/split round trip
    (builder.py:97-121); the skew-spreading pattern as columns."""
    c = _t(spark, sf_dir, "customer")
    shard = F.pmod(md5_64(F.col("c_name")), F.lit(10))
    tagged = c.withColumn(
        "status", F.concat_ws("#", F.lit("pending"), shard.cast("string"))
    )
    return (
        tagged.select(
            F.substring_index("status", "#", 1).alias("status_base"),
            F.substring_index("status", "#", -1).cast("int").alias("shard_back"),
        )
        .groupBy("status_base", "shard_back")
        .agg(F.count("*").alias("n"))
        .orderBy("status_base", "shard_back")
    )


@query(
    "file_date_extraction",
    oracle="""
    WITH keys AS (
        SELECT 'pipeline/input/' || strftime(ts, '%Y-%m-%d') || '-evt'
               || event_id || '.ndjson' AS file_key
        FROM events
    )
    SELECT regexp_extract(file_key, '(\\d{4}-\\d{2}-\\d{2})', 1) AS date_prefix,
           COUNT(*) AS n
    FROM keys
    GROUP BY 1
    ORDER BY date_prefix
    """,
)
def file_date_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — YYYY-MM-DD extraction from file keys (builder.py:596-618)."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.select(
        F.concat(
            F.lit("pipeline/input/"),
            F.date_format("ts", "yyyy-MM-dd"),
            F.lit("-evt"),
            F.col("event_id").cast("string"),
            F.lit(".ndjson"),
        ).alias("file_key")
    )
    return (
        keys.select(
            F.regexp_extract("file_key", r"(\d{4}-\d{2}-\d{2})", 1).alias(
                "date_prefix"
            )
        )
        .groupBy("date_prefix")
        .agg(F.count("*").alias("n"))
        .orderBy("date_prefix")
    )


@query(
    "events_unit_metrics",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           CAST(strftime(ts, '%Y') AS INT) AS year,
           CAST(strftime(ts, '%m') AS INT) AS month,
           CAST(strftime(ts, '%d') AS INT) AS day,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_bytes,
           round(CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / (1024.0 * 1024.0), 4) AS sum_mb,
           round(CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / (1024.0 * 1024.0 * 1024.0), 6) AS sum_gb
    FROM events
    GROUP BY 1, 2, 3, 4
    ORDER BY date
    """,
)
def events_unit_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9-P11 — bytes→MB/GB conversions + date components
    (metrics_collector_lambda.py:47-71)."""
    ev = _t(spark, sf_dir, "events")
    b = F.floor(F.col("value") * 1000000).cast("bigint")
    return (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
            b.alias("bytes"),
        )
        .groupBy("date", "year", "month", "day")
        .agg(
            F.sum("bytes").alias("sum_bytes"),
            F.round(F.sum("bytes") / (1024.0 * 1024.0), 4).alias("sum_mb"),
            F.round(F.sum("bytes") / (1024.0 * 1024.0 * 1024.0), 6).alias(
                "sum_gb"
            ),
        )
        .orderBy("date")
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
    )
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — left-anti join (the idempotent-insert pattern,
    builder.py:645-653).  Anti-joins against the 2001+ order slice so the
    result is provably non-empty at every SF (this generator gives every
    customer at least one order overall, which made the unrestricted
    anti-join a vacuous 0-row check)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "machinery_customer_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'MACHINERY'
    )
    ORDER BY o.o_orderkey
    LIMIT 50
    """,
)
def machinery_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — key-lookup semi-join (batch_status_updater.py:120-159)."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "doc_word_counts",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents
    )
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def doc_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — explode + aggregate (the CROSS JOIN UNNEST shape,
    Athena.sql:174-176)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "validation_split",
    oracle="""
    WITH files AS (
        SELECT 'input/' || strftime(ts, '%Y-%m-%d') || '-' || event_id
               || (CASE WHEN event_id % 19 = 0 THEN '.json' ELSE '.ndjson' END)
               AS file_path,
               value / 10.0 AS file_size_mb
        FROM events
    )
    SELECT CASE
             WHEN file_path NOT LIKE '%.ndjson' THEN 'invalid_extension'
             WHEN file_size_mb NOT BETWEEN 1.75 AND 5.25 THEN 'size_out_of_range'
             ELSE 'valid'
           END AS verdict,
           COUNT(*) AS n
    FROM files
    GROUP BY 1
    ORDER BY verdict
    """,
)
def validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/S8 — extension + size-window validation with quarantine
    reasons (builder.py:542-567), as one grouped projection."""
    ev = _t(spark, sf_dir, "events")
    files = ev.select(
        F.concat(
            F.lit("input/"),
            F.date_format("ts", "yyyy-MM-dd"),
            F.lit("-"),
            F.col("event_id").cast("string"),
            F.when(F.col("event_id") % 19 == 0, F.lit(".json")).otherwise(
                F.lit(".ndjson")
            ),
        ).alias("file_path"),
        (F.col("value") / 10.0).alias("file_size_mb"),
    )
    verdict = (
        F.when(~F.col("file_path").endswith(".ndjson"), "invalid_extension")
        .when(
            ~F.col("file_size_mb").between(1.75, 5.25), "size_out_of_range"
        )
        .otherwise("valid")
    )
    return (
        files.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count("*").alias("n"))
        .orderBy("verdict")
    )


@query(
    "nation_all_string",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
           CAST(n_name AS VARCHAR)      AS n_name,
           CAST(n_regionkey AS VARCHAR) AS n_regionkey
    FROM nation
    ORDER BY CAST(n_nationkey AS INT)
    """,
)
def nation_all_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — the cast-all-to-string storage semantic
    (glue_batch_job.py:161-168) on a whole table."""
    from high_throughput_etl_pipeline_spark.functions.scalar import (
        cast_all_to_string,
    )

    n = _t(spark, sf_dir, "nation")
    return cast_all_to_string(n).orderBy(F.col("n_nationkey").cast("int"))


@query(
    "metrics_size_profile",
    oracle="""
    SELECT COUNT(*)                                  AS file_count,
           round(SUM(value), 4)                      AS total_mb,
           round(AVG(value), 4)                      AS mean_mb,
           round(quantile_cont(value, 0.5), 4)       AS median_mb,
           round(MIN(value), 4)                      AS min_mb,
           round(MAX(value), 4)                      AS max_mb,
           round(stddev_samp(value), 4)              AS stddev_mb,
           round(quantile_cont(value, 0.95), 4)      AS p95_mb,
           round(quantile_cont(value, 0.99), 4)      AS p99_mb
    FROM events
    """,
)
def metrics_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 — the full metrics statistical profile
    (analyze_metrics.py:86-100) in ONE aggregation pass."""
    from high_throughput_etl_pipeline_spark.plans.metrics import size_profile

    ev = _t(spark, sf_dir, "events").withColumn("size_mb", F.col("value"))
    return size_profile(ev, "size_mb")


# ---------------------------------------------------------------------------
# Text analysis (training-data operators)
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    oracle=f"""
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'))
                    END) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_PIECE_RE}'))) AS BIGINT)
               AS total_bpe_pieces,
           round(AVG(length(text)), 4) AS avg_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces.

    Routed through the text operators (token_count / bpe_token_estimate)
    so the oracle exercises the actual operator surface.
    """
    from high_throughput_etl_pipeline_spark.operators.text import (
        bpe_token_estimate,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
            F.sum(bpe_token_estimate(F.col("text"))).alias("total_bpe_pieces"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
        .orderBy("source")
    )


def _lang_hits_sql(lang: str) -> str:
    words = "|".join(LANG_STOPWORDS[lang])
    return f"len(regexp_extract_all(lower(text), '\\b({words})\\b'))"


@query(
    "text_lang_detect",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS labeled_lang,
               {_lang_hits_sql("en")} AS s_en,
               {_lang_hits_sql("de")} AS s_de,
               {_lang_hits_sql("fr")} AS s_fr,
               {_lang_hits_sql("es")} AS s_es
        FROM documents
    ), best AS (
        SELECT labeled_lang,
               CASE
                 WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 ELSE 'es'
               END AS predicted_lang
        FROM scored
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n
    FROM best
    GROUP BY 1, 2
    ORDER BY labeled_lang, predicted_lang
    """,
)
def text_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword n-gram hits, deterministic argmax)
    cross-tabbed against the labeled lang."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("labeled_lang"),
            detect_language(F.lower(F.col("text"))).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("labeled_lang", "predicted_lang")
    )


@query(
    "text_quality_by_source",
    oracle="""
    WITH feats AS (
        SELECT source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(len(regexp_extract_all(text, '[^\\w\\s]'))
                     / greatest(length(text), 1), 4) AS punct_ratio,
               round(len(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1), 4) AS digit_ratio,
               round(len(regexp_extract_all(lower(text),
                     '\\b(the|and|of|to|a|in|is|that)\\b'))
                     / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                     4) AS stopword_ratio
        FROM documents
    ), scored AS (
        SELECT source,
               round(0.25 * least(n_tokens / 100.0, 1.0)
                   + 0.25 * (1.0 - least(punct_ratio * 5, 1.0))
                   + 0.25 * (1.0 - least(digit_ratio * 5, 1.0))
                   + 0.25 * least(stopword_ratio * 4, 1.0), 4) AS quality_score
        FROM feats
    )
    SELECT source,
           round(AVG(quality_score), 4) AS avg_quality,
           CAST(SUM(CASE WHEN quality_score < 0.35 THEN 1 ELSE 0 END) AS BIGINT)
               AS low_quality_docs
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/digit/stopword features → bounded
    score; the cheap-filter stage ahead of dedup/training."""
    d = _t(spark, sf_dir, "documents")
    feats = quality_features(d)
    return (
        feats.groupBy("source")
        .agg(
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum(
                F.when(F.col("quality_score") < 0.35, 1).otherwise(0)
            ).cast("bigint").alias("low_quality_docs"),
        )
        .orderBy("source")
    )


@query(
    "quality_percentile_filter",
    oracle="""
    WITH feats AS (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(len(regexp_extract_all(text, '[^\\w\\s]'))
                     / greatest(length(text), 1), 4) AS punct_ratio,
               round(len(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1), 4) AS digit_ratio,
               round(len(regexp_extract_all(lower(text),
                     '\\b(the|and|of|to|a|in|is|that)\\b'))
                     / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                     4) AS stopword_ratio
        FROM documents
    ), scored AS (
        SELECT doc_id, source,
               round(0.25 * least(n_tokens / 100.0, 1.0)
                   + 0.25 * (1.0 - least(punct_ratio * 5, 1.0))
                   + 0.25 * (1.0 - least(digit_ratio * 5, 1.0))
                   + 0.25 * least(stopword_ratio * 4, 1.0), 4) AS quality_score
        FROM feats
    ), ranked AS (
        SELECT doc_id, source, quality_score,
               percent_rank() OVER (PARTITION BY source
                                    ORDER BY quality_score DESC, doc_id) AS pr
        FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           round(MIN(quality_score), 4) AS min_kept_score
    FROM ranked WHERE pr < 0.5
    GROUP BY source
    ORDER BY source
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balanced quality curation: keep each source's best half by
    quality score (percent_rank window with a deterministic id
    tie-break), so no source floods the kept set.  ``id_sum`` makes the
    kept SET value-checked, not just its size (operators/corpus.py:
    percentile_filter)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        percentile_filter,
    )

    d = _t(spark, sf_dir, "documents")
    kept = percentile_filter(
        quality_features(d), "quality_score", "source", keep_frac=0.5
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.round(F.min("quality_score"), 4).alias("min_kept_score"),
        )
        .orderBy("source")
    )


@query(
    "text_sentiment_by_lang",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang,
               round((len(regexp_extract_all(lower(text),
                          '\\b(fast|big)\\b'))
                      - len(regexp_extract_all(lower(text),
                            '\\b(slow|small)\\b')))
                     / CAST(len(regexp_extract_all(lower(text),
                                '\\b(fast|big)\\b'))
                            + len(regexp_extract_all(lower(text),
                                  '\\b(slow|small)\\b')) + 1 AS DOUBLE),
                     4) AS sent
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs,
           round(AVG(sent), 4) AS avg_sentiment,
           CAST(SUM(CASE WHEN sent > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS positive_docs,
           CAST(SUM(CASE WHEN sent < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS negative_docs
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def text_sentiment_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment (SURVEY §7.1.8's text-analysis slot) rolled up
    per language: two JVM-side regex counts per doc, no UDF
    (operators/text.py:sentiment_score)."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        sentiment_score,
    )

    d = _t(spark, sf_dir, "documents")
    s = d.select("lang", sentiment_score(F.col("text")).alias("sent"))
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("sent"), 4).alias("avg_sentiment"),
            F.sum(F.when(F.col("sent") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("positive_docs"),
            F.sum(F.when(F.col("sent") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("negative_docs"),
        )
        .orderBy("lang")
    )


@query(
    "cluster_balanced_sample",
    oracle="""
    WITH r AS (
        SELECT vec_id, label,
               row_number() OVER (
                   PARTITION BY label
                   ORDER BY ('0x' || substr(md5('cbal-v1:' ||
                             CAST(vec_id AS VARCHAR)), 18, 15))::BIGINT,
                            vec_id) AS rn
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM r WHERE rn <= 12
    GROUP BY label ORDER BY label
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subsampling: cap every embedding cluster at 12
    members, chosen by keyed hash (deterministic, engine-portable — no
    RNG) — the diversity-preserving downsample after clustering
    (SemDeDup-style prototype capping).  One grouped window keyed on the
    cluster label; id_sum value-checks the kept SET."""
    d = _t(spark, sf_dir, "embeddings")
    order_key = md5_64(
        F.concat(F.lit("cbal-v1:"), F.col("vec_id").cast("string"))
    )
    w = Window.partitionBy("label").orderBy(order_key, F.col("vec_id"))
    kept = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 12)
    return (
        kept.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("vec_id").alias("id_sum"),
        )
        .orderBy("label")
    )


@query(
    "doc_fingerprints",
    oracle="""
    SELECT source,
           COUNT(*) AS docs,
           COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
               AS distinct_fingerprints
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over casefolded, space-collapsed text
    (per source, so the check carries one row per group rather than a
    single global pair of counts)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct(fingerprint(F.col("text"))).alias(
                "distinct_fingerprints"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Dedup (training-data operators)
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           COUNT(*) AS dup_count,
           MIN(doc_id) AS keep_id
    FROM fp
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on the 16-byte fingerprint —
    shuffle key is constant-size regardless of document size."""
    d = _t(spark, sf_dir, "documents")
    return (
        exact_duplicates(d)
        .select("fingerprint", "dup_count", "keep_id")
        .orderBy("fingerprint")
    )


@query(
    "dedup_spans",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
        FROM documents
    ), occ AS (
        SELECT doc_id,
               i - 1 AS pos,
               array_to_string(words[((i-1)*10+1):((i-1)*10+10)], ' ')
                   AS span
        FROM w, LATERAL (
            SELECT unnest(generate_series(
                1, greatest(CAST(ceil(len(words) / 10.0) AS INT), 1))) AS i
        )
    ), hashed AS (
        SELECT doc_id, pos, span,
               ('0x' || substr(md5(span), 18, 15))::BIGINT AS h,
               doc_id * 1048576 + pos AS ck
        FROM occ
    ), agg AS (
        SELECT h, COUNT(*) AS n, MIN(ck) AS canon FROM hashed GROUP BY h
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN a.n = 1 OR o.ck = a.canon
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_kept,
           coalesce(string_agg(
               CASE WHEN a.n = 1 OR o.ck = a.canon THEN o.span END,
               ' ' ORDER BY o.pos), '') AS text_deduped
    FROM hashed o JOIN agg a USING (h)
    GROUP BY o.doc_id
    ORDER BY o.doc_id
    """,
)
def dedup_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document span dedup (C4-style boilerplate removal): repeated
    10-word spans are removed corpus-wide except one canonical occurrence
    (min encoded (doc_id, pos)), and documents are re-assembled from the
    surviving spans.  Two keyed shuffles (span hash, then doc); no
    pairwise comparisons anywhere — the scalable shape for line-level
    dedup at corpus scale (operators/dedup.py:span_dedup)."""
    from high_throughput_etl_pipeline_spark.operators.dedup import span_dedup

    d = _t(spark, sf_dir, "documents")
    return span_dedup(d, span_words=10).orderBy("doc_id")


@query(
    "dedup_spans_within_doc",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
        FROM documents
    ), occ AS (
        SELECT doc_id,
               i - 1 AS pos,
               array_to_string(words[((i-1)*2+1):((i-1)*2+2)], ' ') AS span
        FROM w, LATERAL (
            SELECT unnest(generate_series(
                1, greatest(CAST(ceil(len(words) / 2.0) AS INT), 1))) AS i
        )
    ), hashed AS (
        SELECT doc_id, pos, span,
               ('0x' || substr(md5(span), 18, 15))::BIGINT AS h,
               doc_id * 1048576 + pos AS ck
        FROM occ
    ), agg AS (
        SELECT doc_id, h, COUNT(*) AS n, MIN(ck) AS canon
        FROM hashed GROUP BY doc_id, h
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN a.n = 1 OR o.ck = a.canon
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_kept,
           coalesce(string_agg(
               CASE WHEN a.n = 1 OR o.ck = a.canon THEN o.span END,
               ' ' ORDER BY o.pos), '') AS text_deduped
    FROM hashed o JOIN agg a USING (doc_id, h)
    GROUP BY o.doc_id
    ORDER BY o.doc_id
    """,
)
def dedup_spans_within_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style INTRA-document repetition removal: a span repeated
    inside the same document keeps only its first occurrence (other
    documents unaffected — the grouping key carries the doc id, so no
    shuffle ever mixes documents).  2-word spans model repeated short
    phrases; 250 occurrences removed at sf0.01 — non-vacuous
    (operators/dedup.py:span_dedup, scope='document')."""
    from high_throughput_etl_pipeline_spark.operators.dedup import span_dedup

    d = _t(spark, sf_dir, "documents")
    return span_dedup(d, span_words=2, scope="document").orderBy("doc_id")


# Shared by dedup_jaccard_pairs and dedup_cc_clusters: blocked bigram-
# Jaccard pairs over documents, threshold 0.05 on the 4-dp-rounded value
# (the Spark operator rounds before filtering — both sides must agree on
# which boundary pairs survive).
_JACCARD_PAIRS_CTE = """
    docs AS (
        SELECT doc_id, lang,
               CAST(floor(n_chars / 64.0) AS BIGINT) AS len_bucket,
               list_distinct([
                   array_to_string(words[i:i+1], ' ')
                   for i in range(1, len(words))
               ]) AS shingles
        FROM (
            SELECT doc_id, lang, n_chars,
                   string_split_regex(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' ') AS words
            FROM documents
        )
        WHERE len(words) >= 2
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.shingles, b.shingles))
                     / greatest(len(a.shingles) + len(b.shingles)
                                - len(list_intersect(a.shingles,
                                                     b.shingles)), 1),
                     4) AS jaccard
        FROM docs a
        JOIN docs b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.shingles, b.shingles))
                    / greatest(len(a.shingles) + len(b.shingles)
                               - len(list_intersect(a.shingles,
                                                    b.shingles)), 1),
                    4) >= 0.05
    )
"""

@query(
    "decontamination_fuzzy",
    # the cross-corpus twin of _JACCARD_MINHASH_PAIRS_CTE: same md5-lane
    # signature arithmetic, but candidates join CORPUS bands against
    # BENCHMARK bands (never a self-join)
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(words[i:i+1], ' ')
                   for i in range(1, len(words))
               ]) AS shingles
        FROM docs
        WHERE len(words) >= 2
    ), sig AS (
        SELECT doc_id,
               flatten([
                   [list_min([
                       ('0x' || substr(md5(j || ':' || s), 2, 14))::BIGINT
                       for s in shingles
                   ]),
                    list_min([
                       ('0x' || substr(md5(j || ':' || s), 18, 14))::BIGINT
                       for s in shingles
                   ])]
                   for j in range(0, 4)
               ]) AS sig
        FROM sh
    ), bands AS (
        SELECT doc_id, b,
               md5(array_to_string(
                   [CAST(x AS VARCHAR) for x in sig[b*2+1:b*2+2]],
                   ',')) AS band_hash
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
        SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS bench_id
        FROM bands c
        JOIN bands e ON c.b = e.b AND c.band_hash = e.band_hash
        WHERE c.doc_id % 100 <> 7 AND e.doc_id % 100 = 7
    ), scored AS (
        SELECT p.doc_id, p.bench_id,
               round(len(list_intersect(sa.shingles, sb.shingles))
                     / greatest(len(sa.shingles) + len(sb.shingles)
                                - len(list_intersect(sa.shingles,
                                                     sb.shingles)), 1),
                     4) AS jaccard
        FROM cand p
        JOIN sh sa ON sa.doc_id = p.doc_id
        JOIN sh sb ON sb.doc_id = p.bench_id
    )
    SELECT doc_id, bench_id, jaccard FROM scored
    WHERE jaccard >= 0.05
    ORDER BY doc_id, bench_id
    """,
)
def decontamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate decontamination: corpus docs whose bigram Jaccard
    against a benchmark doc clears 0.05 — catches paraphrased/edited eval
    leakage that exact n-gram overlap (benchmark_contamination) misses.
    Candidates come from a cross-corpus band join (corpus bands ×
    benchmark bands, never all-pairs); one exact-Jaccard verify per
    candidate (operators/dedup.py:fuzzy_decontamination)."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        fuzzy_decontamination,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 == 7)
    corpus = d.filter(F.col("doc_id") % 100 != 7)
    return fuzzy_decontamination(corpus, bench, threshold=0.05).orderBy(
        "doc_id", "bench_id"
    )


# Reusable CTE chain: md5-MinHash LSH candidates -> exact-Jaccard verified
# pairs at >= 0.05.  `pairs` is the verified, thresholded pair set —
# dedup_jaccard_minhash selects it directly; dedup_cc_clusters walks it
# with a recursive CTE.  Mirrors jaccard_pairs_via_minhash exactly
# (8 hashes, 4 bands, bigram shingles).
_JACCARD_MINHASH_PAIRS_CTE = """docs AS (
    SELECT doc_id,
           string_split_regex(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct([
               array_to_string(words[i:i+1], ' ')
               for i in range(1, len(words))
           ]) AS shingles
    FROM docs
    WHERE len(words) >= 2
), sig AS (
    SELECT doc_id,
           flatten([
               [list_min([
                   ('0x' || substr(md5(j || ':' || s), 2, 14))::BIGINT
                   for s in shingles
               ]),
                list_min([
                   ('0x' || substr(md5(j || ':' || s), 18, 14))::BIGINT
                   for s in shingles
               ])]
               for j in range(0, 4)
           ]) AS sig
    FROM sh
), bands AS (
    SELECT doc_id, b,
           md5(array_to_string(
               [CAST(x AS VARCHAR) for x in sig[b*2+1:b*2+2]], ',')) AS band_hash
    FROM sig, (SELECT unnest(range(0, 4)) AS b)
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
), scored AS (
    SELECT p.id_a, p.id_b,
           round(len(list_intersect(sa.shingles, sb.shingles))
                 / greatest(len(sa.shingles) + len(sb.shingles)
                            - len(list_intersect(sa.shingles, sb.shingles)), 1),
                 4) AS jaccard
    FROM cand p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
), pairs AS (
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.05
)"""


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT id_a, id_b, jaccard FROM pairs
    ORDER BY id_a, id_b
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs, blocked by (lang, length-bucket) so
    the pair count is bounded (never all-pairs)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 64.0)
    )
    return jaccard_pairs(
        d,
        block_cols=["lang", "len_bucket"],
        shingle_n=2,
        threshold=0.05,
    ).orderBy("id_a", "id_b")


@query(
    "dedup_cc_clusters",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_MINHASH_PAIRS_CTE},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node)
    SELECT cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc_id
    FROM cc GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-candidate Jaccard pairs → connected
    components → one row per component (cluster_id = min doc id;
    keep-policy falls out as node == cluster_id).

    Pair generation rides md5-MinHash LSH banding
    (jaccard_pairs_via_minhash), NOT (lang, len_bucket) blocking — at
    100× a hot natural-language length bucket makes the blocked join
    quadratic in the block size, while banded-candidate volume tracks
    true near-dup density.  Edge recall is governed by the band
    parameters (8 hashes / 4 bands here); the oracle mirrors the same
    banding, so the check is value-for-value.  The blocked variant
    survives as dedup_jaccard_pairs.  The oracle walks the same edge
    list with a recursive CTE; Spark runs min-label propagation
    (operators/graph.py) — O(diameter) keyed joins, lineage cut per
    round."""
    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    )
    cc = dedup_clusters(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("node").alias("max_doc_id"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------


@query(
    "knn_bruteforce",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 3
    ), v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), scored AS (
        SELECT q.query_id, v.vec_id,
               round(list_dot_product(v.ev, q.qv)
                     / (sqrt(list_dot_product(v.ev, v.ev))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM v CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, one pass over vectors,
    per-query window top-k.  Ties broken by vec_id; cosine rounded 6 dp."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    dot = _dot(F.col("embedding"), F.col("qv"))
    na = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    nb = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(dot / (na * nb), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


# Multi-table LSH parameters shared between the Spark operator and the
# DuckDB oracle (6 tables × 4 sign-projections; threshold picked so the
# result is NON-empty at sf0.01 — 37 pairs — and sf0.1, so the oracle
# actually exercises the pair math).
_ND_TABLES, _ND_BITS, _ND_THRESHOLD = 6, 4, 0.4


def _planes_sql_literal(n_planes: int) -> list[str]:
    planes = hyperplanes(64, n_planes, seed=42)
    return ["[" + ", ".join(f"{x!r}" for x in p) + "]" for p in planes]


def _embedding_neardup_cte() -> str:
    """Shared CTE chain: multi-table LSH collide → cosine verify →
    thresholded `pairs` — used by embedding_near_dup directly and walked
    recursively by embedding_dedup_clusters."""
    planes = _planes_sql_literal(_ND_TABLES * _ND_BITS)
    buckets = []
    for t in range(_ND_TABLES):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(ev, {planes[t * _ND_BITS + i]}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(_ND_BITS)
        )
        buckets.append(f"({terms}) AS b{t}")
    collide = " OR ".join(f"a.b{t} = b.b{t}" for t in range(_ND_TABLES))
    return f"""v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev,
               {", ".join(buckets)}
        FROM embeddings
    ), scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.ev, b.ev)
                     / (sqrt(list_dot_product(a.ev, a.ev))
                        * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id AND ({collide})
    ), pairs AS (
        SELECT id_a, id_b, cosine FROM scored
        WHERE cosine >= {_ND_THRESHOLD}
    )"""


def _embedding_neardup_oracle() -> str:
    return f"""
    WITH {_embedding_neardup_cte()}
    SELECT id_a, id_b, cosine FROM pairs
    ORDER BY id_a, id_b
    """


@query("embedding_near_dup", oracle=_embedding_neardup_oracle())
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via multi-table hyperplane LSH self-join;
    deterministic hyperplanes → reproducible, oracle-checkable plan.
    (The oracle's OR-join is the sf0.01 semantic spec; the Spark plan is
    the scale shape — narrow (table, bucket, id) equi-join, pair-dedup,
    then one cosine per surviving pair.)

    ``bits_per_table`` auto-sizes from the collection so bucket load is
    bounded at any SF (fixed ``_ND_BITS`` measured 98 s at sf1 — the
    quadratic-bucket failure :func:`auto_lsh_bits` exists to prevent).
    At the driver's correctness SF (0.01, 500 vectors) auto-sizing
    yields exactly ``_ND_BITS`` = 4, so the pinned-plane oracle above
    still matches hash-for-hash; ``tests/test_similarity.py`` pins that
    equality so a testdata resize fails loudly instead of red-rowing."""
    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        e,
        threshold=_ND_THRESHOLD,
        n_tables=_ND_TABLES,
        bits_per_table=None,
    ).orderBy("id_a", "id_b")


def _embedding_dedup_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_embedding_neardup_cte()},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node)
    SELECT cluster_id,
           COUNT(*) AS n_vecs,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_pruned,
           MAX(node) AS max_vec_id
    FROM cc GROUP BY cluster_id
    ORDER BY cluster_id
    """


@query("embedding_dedup_clusters", oracle=_embedding_dedup_clusters_oracle())
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup-style): embedding-cosine near-dup pairs →
    connected components → one canonical vector per cluster (min id),
    with ``n_pruned`` = vectors the dedup would drop.  Composes two
    scale-shaped operators end-to-end: LSH-bucketed pair generation
    (never all-pairs) and min-label-propagation clustering (keyed joins,
    lineage cut per round) — the pipeline that deduplicates an embedding
    corpus without any quadratic stage.  Oracle: recursive-CTE walk over
    the same plane-literal pair spec."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_duplicates(
        e,
        threshold=_ND_THRESHOLD,
        n_tables=_ND_TABLES,
        # auto-sized (= _ND_BITS at the driver's sf0.01 — see
        # embedding_near_dup's docstring; same parity pin applies)
        bits_per_table=None,
    )
    cc = dedup_clusters(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_pruned"),
            F.max("node").alias("max_vec_id"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Non-SQL-expressible operators (rows-only driver check; no oracle entry)
# ---------------------------------------------------------------------------


_MINHASH_LSH_ORACLE = """
WITH docs AS (
    SELECT doc_id,
           string_split_regex(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct([
               array_to_string(words[i:i+2], ' ')
               for i in range(1, len(words) - 1)
           ]) AS shingles
    FROM docs
    WHERE len(words) >= 3
), hp AS (
    SELECT doc_id,
           [('0x' || substr(md5(s), 18, 15))::BIGINT
            for s in shingles] AS h1s,
           [('0x' || substr(md5('kh2:' || s), 18, 15))::BIGINT
                % 288230376151711744
            for s in shingles] AS h2s
    FROM sh
), sig AS (
    SELECT doc_id,
           [list_min(list_transform(range(len(h1s)),
                                    j -> h1s[j + 1] + i * h2s[j + 1]))
            for i in range(0, 16)] AS sig
    FROM hp
), bands AS (
    SELECT doc_id, b,
           md5(array_to_string(
               [CAST(x AS VARCHAR) for x in sig[b*4+1:b*4+4]], ',')) AS band_hash
    FROM sig, (SELECT unnest(range(0, 4)) AS b)
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
), scored AS (
    SELECT p.id_a, p.id_b,
           round(len([i for i in range(1, 17) if sa.sig[i] = sb.sig[i]]) / 16.0,
                 4) AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, est_jaccard
FROM scored
WHERE est_jaccard >= 0.25
ORDER BY id_a, id_b
"""


@query("dedup_minhash_lsh", oracle=_MINHASH_LSH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (16 lanes, 4 bands, 3-gram
    shingles) with the PORTABLE Kirsch-Mitzenmacher lane family —
    lane i = h1 + i·h2 over two md5-low-60-bit hashes per shingle,
    pure integer arithmetic after that, so banding, candidate
    generation, and the signature-agreement estimate are value-checked
    end-to-end (the r1/r3 driver rows for this name predate the
    oracle; the md5-per-lane twin ``dedup_minhash_md5`` pins the same
    band algebra at the 8-lane point).  xxhash64 remains the
    operator's default family for oracle-free callers."""
    d = _t(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d,
        num_hashes=16,
        bands=4,
        shingle_n=3,
        jaccard_threshold=0.25,
        portable=True,
    ).orderBy("id_a", "id_b")


def _simhash_blocked_oracle(
    n_bits: int = 64, max_hamming: int = 3, prefix_bits: int = 12
) -> str:
    """DuckDB replica of the PRODUCTION simhash shape — portable
    md5-token hash, ±1 vote per bit, sign → bit, prefix blocking, then
    pairwise hamming INSIDE blocks only (so the oracle checks the
    blocking recall surface too, not just the vote algebra)."""
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(n_bits)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) "
        f"ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ')) AS t
        FROM documents
    ), hashed AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 18, 15))::BIGINT AS h
        FROM toks
    ), votes AS (
        SELECT doc_id,
               {votes}
        FROM hashed GROUP BY doc_id
    ), sh AS (
        SELECT doc_id, {bits} AS simhash FROM votes
    ), blocked AS (
        SELECT doc_id, simhash,
               simhash >> {n_bits - prefix_bits} AS block
        FROM sh
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM blocked a
    JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY id_a, id_b
    """


@query("dedup_simhash", oracle=_simhash_blocked_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit, Hamming ≤ 3, 12-bit prefix
    block) over the PORTABLE md5-low-60-bit token hash — the full
    production shape (vote algebra AND prefix blocking AND in-block
    verify) is now value-checked against an independent replay; the
    r1 driver row for this name predates the oracle.  With 60-bit
    token hashes, simhash bits 60..63 are structurally zero, so the
    12-bit prefix carries 8 effective bits — identically on both
    engines.  xxhash64 remains the operator default for oracle-free
    callers."""
    d = _t(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        d, n_bits=64, max_hamming=3, prefix_bits=12, portable=True
    ).orderBy("id_a", "id_b")


@query(
    "dedup_cc_rounds",
    oracle="""
    WITH RECURSIVE e0 AS (
        SELECT doc_id AS s, doc_id + 1 AS d
        FROM documents WHERE doc_id % 10 < 3
    ),
    edges AS (
        SELECT s, d FROM e0
        UNION
        SELECT d, s FROM e0
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node)
    SELECT cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc_id
    FROM cc GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def dedup_cc_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components propagation in ISOLATION: the edge list is a
    near-free projection (chains doc_id—doc_id+1 where doc_id%10<3), so
    this query's wall clock is the CC loop itself — persisted adjacency,
    keyed joins, per-round localCheckpoint — not pair generation.  The
    bench pairs it with dedup_cc_clusters (MinHash pairs + CC) so
    round-over-round deltas attribute to the right stage.  Value-checked
    against a recursive-CTE walk of the same chain rule."""
    d = _t(spark, sf_dir, "documents")
    pairs = d.filter(F.col("doc_id") % 10 < 3).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    )
    cc = dedup_clusters(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("node").alias("max_doc_id"),
        )
        .orderBy("cluster_id")
    )


@query(
    "ann_ivf_topk",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), c AS (
        SELECT CAST(vec_id AS INT) AS list_id, ev AS center
        FROM v WHERE vec_id < 8
    ), vd AS (
        SELECT v.vec_id, v.ev, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN c
    ), va AS (
        SELECT vec_id, ev, list_id FROM vd WHERE rn = 1
    ), qd AS (
        SELECT v.vec_id AS query_id, v.ev AS qv, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN c WHERE v.vec_id < 3
    ), qp AS (
        SELECT query_id, qv, list_id FROM qd WHERE rn <= 4
    ), scored AS (
        SELECT qp.query_id, va.vec_id, va.list_id,
               round(list_dot_product(va.ev, qp.qv)
                     / (sqrt(list_dot_product(va.ev, va.ev))
                        * sqrt(list_dot_product(qp.qv, qp.qv))), 6) AS cosine
        FROM va JOIN qp ON va.list_id = qp.list_id
    )
    SELECT query_id, vec_id, list_id, cosine, rank FROM (
        SELECT query_id, vec_id, list_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a FIXED coarse quantizer (the first 8
    embedding vectors as centroids), so assignment argmin, nprobe probe
    selection, per-list search, and ranking are ALL value-checked against
    the oracle — including each hit's coarse cell (``list_id``).  The
    k-means-trained production variant is ann_ivf_kmeans_topk (rows-only
    + recall-vs-exact test); the IVF *pruning machinery* is identical —
    only quantizer training differs."""
    e = _t(spark, sf_dir, "embeddings")
    centers = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").cast("array<double>").alias("center"),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        e, q, k=5, nprobe=4, centers=centers, with_list_id=True
    ).orderBy("query_id", "rank")


def _kmeans_train_cte(
    nlist: int = 8, rounds: int = 3, scale: int = 1000
) -> str:
    """Unrolled-Lloyd DuckDB replay of the lattice k-means quantizer
    (``similarity.kmeans_centers_lattice``): each round is (exact
    integer argmin assignment) → (per-list per-dim integer sums) →
    (round-half-away integer division).  Produces CTEs ``v`` (vec_id,
    vi lattice ints, ev doubles) and ``cf`` (list_id, center DOUBLE[])
    — shared by the ann_ivf_kmeans_topk and corpus_semdedup oracles."""
    dist_int = (
        "list_sum(list_transform(generate_series(1, len(v.vi)), "
        "i -> (v.vi[i] - c.c[i]) * (v.vi[i] - c.c[i])))"
    )
    parts = [
        f"""v AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   x -> CAST(round(x * {scale}, 0) AS BIGINT)) AS vi,
               embedding::DOUBLE[] AS ev
        FROM embeddings
    ), c0 AS (
        SELECT CAST(vec_id AS INT) AS list_id, vi AS c
        FROM v WHERE vec_id < {nlist}
    )"""
    ]
    for r in range(rounds):
        parts.append(
            f""", a{r} AS (
        SELECT v.vec_id, v.vi, c.list_id,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY {dist_int}, c.list_id) AS rn
        FROM v CROSS JOIN c{r} c
    ), s{r} AS (
        SELECT list_id, pos, SUM(x) AS s, COUNT(*) AS n
        FROM (
            SELECT list_id, UNNEST(generate_series(1, len(vi))) AS pos,
                   UNNEST(vi) AS x
            FROM a{r} WHERE rn = 1
        ) GROUP BY 1, 2
    ), c{r + 1} AS (
        SELECT list_id,
               list(CAST(CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                              ELSE -((-2*s + n) // (2*n)) END
                         AS BIGINT) ORDER BY pos) AS c
        FROM s{r} GROUP BY list_id
    )"""
        )
    parts.append(
        f""", cf AS (
        SELECT list_id,
               list_transform(c, x -> CAST(x AS DOUBLE) / {scale})
                   AS center
        FROM c{rounds}
    )"""
    )
    return "".join(parts)


def _ivf_kmeans_oracle(
    nlist: int = 8,
    rounds: int = 3,
    nprobe: int = 4,
    k: int = 5,
    scale: int = 1000,
) -> str:
    """Lattice k-means training replay + the same IVF assign/probe/rank
    chain the ann_ivf_topk oracle pins."""
    parts = [
        "\n    WITH ",
        _kmeans_train_cte(nlist, rounds, scale),
    ]
    parts.append(
        f""", vd AS (
        SELECT v.vec_id, v.ev, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN cf c
    ), va AS (
        SELECT vec_id, ev, list_id FROM vd WHERE rn = 1
    ), qd AS (
        SELECT v.vec_id AS query_id, v.ev AS qv, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN cf c WHERE v.vec_id < 3
    ), qp AS (
        SELECT query_id, qv, list_id FROM qd WHERE rn <= {nprobe}
    ), scored AS (
        SELECT qp.query_id, va.vec_id, va.list_id,
               round(list_dot_product(va.ev, qp.qv)
                     / (sqrt(list_dot_product(va.ev, va.ev))
                        * sqrt(list_dot_product(qp.qv, qp.qv))), 6) AS cosine
        FROM va JOIN qp ON va.list_id = qp.list_id
    )
    SELECT query_id, vec_id, list_id, cosine, rank FROM (
        SELECT query_id, vec_id, list_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """
    )
    return "".join(parts)


@query("ann_ivf_kmeans_topk", oracle=_ivf_kmeans_oracle())
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a TRAINED coarse quantizer — now the
    deterministic lattice-Lloyd trainer (``similarity.
    kmeans_centers_lattice``: 1e-3 integer lattice, init = first 8
    vectors, 3 exact integer assignment/update rounds) instead of
    pyspark.ml KMeans, which makes training itself value-checkable:
    the oracle replays all three Lloyd rounds as unrolled CTEs
    (integer argmin, integer sums, round-half-away division), then
    pins assignment, probe selection, per-list search, and ranking —
    the full production path train-to-serve (this name's r5 driver
    row was rows-only; the fixed-quantizer machinery twin is
    ann_ivf_topk)."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        kmeans_centers_lattice,
    )

    e = _t(spark, sf_dir, "embeddings")
    centers = kmeans_centers_lattice(e, nlist=8, rounds=3)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        e, q, k=5, nprobe=4, centers=centers, with_list_id=True
    ).orderBy("query_id", "rank")


def _semdedup_oracle(
    nlist: int = 8, rounds: int = 3, tau: float = 0.95
) -> str:
    return f"""
    WITH {_kmeans_train_cte(nlist, rounds)}, vd AS (
        SELECT v.vec_id, v.ev, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN cf c
    ), va AS (
        SELECT vec_id, ev, list_id FROM vd WHERE rn = 1
    ), pr AS (
        SELECT b.vec_id, CAST(COUNT(*) AS BIGINT) AS n_dup_smaller
        FROM va a JOIN va b
          ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.ev, b.ev)
                    / (sqrt(list_dot_product(a.ev, a.ev))
                       * sqrt(list_dot_product(b.ev, b.ev))), 6) >= {tau}
        GROUP BY b.vec_id
    )
    SELECT va.vec_id, va.list_id,
           COALESCE(pr.n_dup_smaller, 0) AS n_dup_smaller,
           pr.vec_id IS NULL AS keep
    FROM va LEFT JOIN pr ON pr.vec_id = va.vec_id
    ORDER BY va.vec_id
    """


@query("corpus_semdedup", oracle=_semdedup_oracle())
def corpus_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23) over the embedding corpus
    (``similarity.semdedup``): lattice-Lloyd k-means clusters, then a
    within-cluster cosine self-join prunes every vector that has a
    LOWER-id neighbor at cosine ≥ 0.95 — the semantic near-duplicate
    filter that catches paraphrases exact/MinHash dedup cannot see.
    Fully value-checked train-to-prune: the oracle replays the three
    Lloyd rounds (exact integer CTEs), the assignment argmin, and the
    per-cluster pair pruning.  The cluster is the blocking key (no
    corpus² pairs); nlist is the paper's scale knob (k grows with the
    corpus so per-cluster pair mass stays bounded)."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        semdedup,
    )

    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, nlist=8, rounds=3, tau=0.95).orderBy("vec_id")


@query(
    "corpus_dsir_weights",
    oracle="""
    WITH tok AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
               unnest(string_split_regex(trim(text),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS t
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, tgt,
               ('0x' || substr(md5(t), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), cnt AS (
        SELECT fid, CAST(COUNT(*) AS BIGINT) AS cr,
               CAST(SUM(tgt) AS BIGINT) AS ct
        FROM feat GROUP BY fid
    ), tot AS (
        SELECT CAST(SUM(cr) AS BIGINT) AS tr,
               CAST(SUM(ct) AS BIGINT) AS tt
        FROM cnt
    ), lr AS (
        SELECT fid,
               CAST(round(ln(CAST((ct + 1) * (tr + 4096) AS DOUBLE)
                             / CAST((cr + 1) * (tt + 4096) AS DOUBLE))
                          * 1e6, 0) AS BIGINT) AS lr
        FROM cnt CROSS JOIN tot
    ), per AS (
        SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               MAX(f.tgt) AS is_tgt, CAST(SUM(lr.lr) AS BIGINT) AS sw
        FROM feat f JOIN lr ON lr.fid = f.fid GROUP BY f.doc_id
    )
    SELECT doc_id, is_tgt = 1 AS is_target, n_tokens,
           round(CAST(sw AS DOUBLE) / 1e6, 6) AS dsir_logw
    FROM per ORDER BY doc_id
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection weights (Xie et al. '23) with the English
    slice as the target domain (``text.dsir_log_weights``): per-doc
    log importance weight Σ ln(p_target/p_raw) over hashed unigram
    buckets, Laplace-smoothed — the importance-resampling score that
    picks pretraining data "like the target" from a raw crawl.  Each
    bucket's single ln is 1e-6 lattice-rounded BEFORE the per-doc sum
    (the hardened transcendental discipline), so the driver check is
    exact.  Classifier-scoring plan shape: one explode, two rollups,
    one broadcast ratio table."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        dsir_log_weights,
    )

    d = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        d, target=F.col("lang") == "en", n_features=4096
    ).orderBy("doc_id")


@query(
    "dedup_token_savings",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_MINHASH_PAIRS_CTE},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node),
    tokc AS (
        SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tok FROM docs
    )
    SELECT cc.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN cc.node = cc.cluster_id
                         THEN t.n_tok ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           CAST(SUM(CASE WHEN cc.node = cc.cluster_id
                         THEN 0 ELSE t.n_tok END) AS BIGINT)
               AS saved_tokens
    FROM cc JOIN tokc t ON t.doc_id = cc.node
    GROUP BY cc.cluster_id
    ORDER BY cc.cluster_id
    """,
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ROI readout: near-dup clusters (md5-MinHash pairs →
    connected components, the dedup_cc_clusters pipeline) joined back
    to per-document token counts — per cluster, how many tokens the
    keep-one policy (representative = min doc id) actually removes
    from the training corpus.  This is the number a data team budgets
    by before running the full dedup: one extra broadcast-scale join
    over the CC output, everything else shared with the cluster
    query."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    )
    cc = dedup_clusters(pairs)
    tokc = d.select(
        F.col("doc_id").alias("node"),
        F.size(norm_words(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    return (
        cc.join(tokc, "node")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(
                    F.col("node") == F.col("cluster_id"), F.col("n_tok")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_tokens"),
            F.sum(
                F.when(
                    F.col("node") == F.col("cluster_id"), 0
                ).otherwise(F.col("n_tok"))
            )
            .cast("bigint")
            .alias("saved_tokens"),
        )
        .orderBy("cluster_id")
    )


def _lsh_topk_oracle() -> str:
    planes = _planes_sql_literal(8)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(ev, {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = "\n        UNION ALL ".join(
        ["SELECT query_id, qv, bucket FROM q"]
        + [
            f"SELECT query_id, qv, xor(bucket, {1 << i}) FROM q"
            for i in range(3)
        ]
    )
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev,
               {bucket} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv, bucket FROM v WHERE vec_id < 3
    ), probes AS (
        {probes}
    ), scored AS (
        SELECT p.query_id, v.vec_id,
               round(list_dot_product(v.ev, p.qv)
                     / (sqrt(list_dot_product(v.ev, v.ev))
                        * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine
        FROM v JOIN probes p ON v.bucket = p.bucket
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("lsh_topk", oracle=_lsh_topk_oracle())
def lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k with multi-probe (own bucket +
    3 single-bit flips).  Plane literals shared with the DuckDB oracle, so
    the bucketing, probing, and ranking are value-checked end to end."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(
        e, q, k=5, n_planes=8, dim=64, seed=42, n_probes=4
    ).orderBy("query_id", "rank")


@query(
    "sample_frames",
    oracle="""
    WITH grid AS (
        SELECT doc_id AS media_id,
               UNNEST(range(0, LEAST(GREATEST(
                   CAST(floor(n_chars * 37 / 1000.0) AS INT), 1), 16))) AS f
        FROM documents
    )
    SELECT media_id,
           CAST(f AS INT) AS frame_index,
           CAST(f * 1000 AS INT) AS frame_ts_ms,
           TRUE AS decode_ok
    FROM grid
    ORDER BY media_id, frame_index
    """,
)
def sample_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling grid: one row per sampled frame, evenly spaced
    over duration (1 fps, ≤16 frames).  The JVM-side grid (explode over
    sequence) is value-checked against the oracle; the per-frame decode
    columns (md5 fake) are exercised but projected out (covered rows-only
    by multimodal_features + pytest)."""
    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/mp4").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 37).cast("int").alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )
    frames = sample_frames(media, fps=1.0, max_frames=16)
    return frames.select(
        "media_id", "frame_index", "frame_ts_ms", "decode_ok"
    ).orderBy("media_id", "frame_index")


# Shared CTE fragments for the PQ oracles: codebooks derived FROM the
# table (centroid j of subspace si = slice si of vector j — the same
# relational rule fixed_pq_codebooks applies Spark-side), encode = argmin
# over the 16 sub-centroids per (vector, subspace), ADC = true squared
# subspace distance per (query, subspace, centroid).  m=8 subspaces of
# sub=8 dims over dim=64; ksub=16.
_PQ_ORACLE_CTES = """
    sub_idx AS (
        SELECT UNNEST(range(0, 8)) AS si
    ), cb AS (
        SELECT s.si, CAST(v.vec_id AS INT) AS j,
               v.ev[s.si * 8 + 1 : s.si * 8 + 8] AS cvec
        FROM v CROSS JOIN sub_idx s WHERE v.vec_id < 16
    ), enc AS (
        SELECT vec_id, si, j AS code FROM (
            SELECT v.vec_id, c.si, c.j,
                   row_number() OVER (
                       PARTITION BY v.vec_id, c.si
                       ORDER BY list_sum(list_transform(
                           range(1, 9),
                           t -> (v.ev[c.si * 8 + t] - c.cvec[t])
                              * (v.ev[c.si * 8 + t] - c.cvec[t])
                       )), c.j
                   ) AS rn
            FROM v CROSS JOIN cb c
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 3
    ), adc AS (
        SELECT q.query_id, c.si, c.j,
               list_sum(list_transform(
                   range(1, 9),
                   t -> (q.qv[c.si * 8 + t] - c.cvec[t])
                      * (q.qv[c.si * 8 + t] - c.cvec[t])
               )) AS d2
        FROM q CROSS JOIN cb c
    )"""


@query(
    "ann_pq_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), {_PQ_ORACLE_CTES}, scored AS (
        SELECT a.query_id, e.vec_id, round(SUM(a.d2), 6) AS approx_d2
        FROM enc e JOIN adc a ON a.si = e.si AND a.j = e.code
        GROUP BY a.query_id, e.vec_id
    )
    SELECT query_id, vec_id, approx_d2, rank FROM (
        SELECT query_id, vec_id, approx_d2,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY approx_d2, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (8 subspaces × 16 centroids) with
    a FIXED data-derived codebook — centroid ``j`` of subspace ``i`` is
    slice ``i`` of vector ``j`` — so the oracle derives the identical
    codebooks relationally and the ENTIRE pipeline (sub-code argmin
    assignment, per-query ADC tables, m-lookup scoring, ranking) is
    value-checked, not just row-counted.  The k-means-trained production
    codebook path (train_pq_codebooks) keeps its recall-vs-exact and
    determinism pytest gates; only quantizer training differs — the
    encode/ADC machinery checked here is byte-identical."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        fixed_pq_codebooks,
        pq_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    books = fixed_pq_codebooks(e, m=8, ksub=16, dim=64)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(e, q, books, k=5).orderBy("query_id", "rank")


@query(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), c AS (
        SELECT CAST(vec_id AS INT) AS list_id, ev AS center
        FROM v WHERE vec_id < 8
    ), va AS (
        SELECT vec_id, list_id FROM (
            SELECT v.vec_id, c.list_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_sum(list_transform(
                           generate_series(1, len(v.ev)),
                           i -> (v.ev[i] - c.center[i])
                              * (v.ev[i] - c.center[i])
                       )), c.list_id
                   ) AS rn
            FROM v CROSS JOIN c
        ) WHERE rn = 1
    ), qp AS (
        SELECT query_id, list_id FROM (
            SELECT v.vec_id AS query_id, c.list_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_sum(list_transform(
                           generate_series(1, len(v.ev)),
                           i -> (v.ev[i] - c.center[i])
                              * (v.ev[i] - c.center[i])
                       )), c.list_id
                   ) AS rn
            FROM v CROSS JOIN c WHERE v.vec_id < 3
        ) WHERE rn <= 3
    ), {_PQ_ORACLE_CTES}, scored AS (
        SELECT qp.query_id, va.vec_id, round(SUM(a.d2), 6) AS approx_d2
        FROM va JOIN qp ON va.list_id = qp.list_id
        JOIN enc e ON e.vec_id = va.vec_id
        JOIN adc a ON a.query_id = qp.query_id
                  AND a.si = e.si AND a.j = e.code
        GROUP BY qp.query_id, va.vec_id
    )
    SELECT query_id, vec_id, approx_d2, rank FROM (
        SELECT query_id, vec_id, approx_d2,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY approx_d2, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed ANN (the billion-scale layout): coarse lists
    prune the scan, PQ/ADC scores the survivors byte-wise.  Both stages
    run FIXED data-derived quantizers (coarse centers = first 8 vectors,
    exactly ann_ivf_topk's; PQ codebooks = first-16-vector slices,
    exactly ann_pq_topk's), so list assignment, probe selection, PQ
    encoding, ADC scoring, and ranking are ALL value-checked against the
    composed oracle.  The k-means-trained path keeps its recall and
    pruning pytest gates (ann_ivf_kmeans_topk + test_sketches/similarity
    suites); the pruned plan shape is identical."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        fixed_pq_codebooks,
        ivfpq_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    books = fixed_pq_codebooks(e, m=8, ksub=16, dim=64)
    centers = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").cast("array<double>").alias("center"),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_topk(
        e, q, books, k=5, nlist=8, nprobe=3, centers=centers
    ).orderBy("query_id", "rank")


def _multimodal_features_oracle() -> str:
    """DuckDB replica of ``_fake_decode``: feature ``i`` is the first 4
    bytes (little-endian) of ``md5(payload + i.to_bytes(4, 'little'))``
    over 2^32, rounded through FLOAT exactly like the Arrow batch.
    DuckDB's ``md5(VARCHAR)`` hashes the utf-8 bytes and ``CHR(0)``
    round-trips NUL, so the hashes are byte-identical with Python's."""

    def feat(i: int) -> str:
        h = f"md5(COALESCE(text, '') || CHR({i}) || CHR(0) || CHR(0) || CHR(0))"
        le = " + ".join(
            f"('0x' || substr({h}, {1 + 2 * b}, 2))::UBIGINT * {1 << (8 * b)}"
            for b in range(4)
        )
        return f"CAST(CAST(({le}) / 4294967296.0 AS FLOAT) AS DOUBLE)"

    total = " + ".join(feat(i) for i in range(8))
    return f"""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(8 AS INT) AS feat_dim,
           TRUE AS decode_ok,
           round({total}, 6) AS feat_sum
    FROM documents
    ORDER BY media_id
    """


@query("multimodal_features", oracle=_multimodal_features_oracle())
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: media table → Arrow-batched feature
    extraction (deterministic fake decoder; real decoder is a drop-in).
    The md5-derived feature values themselves are value-checked (as a
    rounded float32 sum) against a DuckDB replica of the fake decoder —
    proving the Arrow batch boundary delivers byte-exact payloads and
    float32 feature semantics, which is the part a real decoder would
    inherit."""
    d = _t(spark, sf_dir, "documents")
    media = make_media_table(d)
    feats = extract_features(media, feat_dim=8, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "feat_dim",
        "decode_ok",
        F.round(
            F.aggregate(
                "features",
                F.lit(0.0).cast("double"),
                lambda a, x: a + x.cast("double"),
            ),
            6,
        ).alias("feat_sum"),
    ).orderBy("media_id")


@query(
    "multimodal_wav_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               ('0x' || substr(md5('wav-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 65536 AS s,
               CAST(16 + doc_id % 49 AS BIGINT) AS n
        FROM documents
    ), grid AS (
        SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS k
    ), samp AS (
        SELECT b.doc_id, b.n, g.k,
               ((b.s * (g.k + 1) + 2654435761 * g.k * g.k) % 65536)
                   - 32768 AS x
        FROM base b JOIN grid g ON g.k < b.n
    ), nxt AS (
        SELECT doc_id, n, k, x,
               LEAD(x) OVER (PARTITION BY doc_id ORDER BY k) AS x2
        FROM samp
    ), feat AS (
        SELECT doc_id,
               CAST(MAX(n) AS INT) AS n_samples,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sum_sq,
               CAST(SUM(CASE WHEN x * x2 < 0 THEN 1 ELSE 0 END) AS INT)
                   AS zero_crossings,
               CAST(MAX(abs(x)) AS INT) AS peak
        FROM nxt GROUP BY doc_id
    )
    SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
           n_samples, sum_sq, zero_crossings, peak, TRUE AS decode_ok,
           round(sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 6) AS rms
    FROM feat ORDER BY media_id
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end to end and value-checked: a synth stage
    writes genuine RIFF/WAVE PCM16 payloads into a binary column
    (``make_wav_table`` — real 44-byte headers, real little-endian
    frames, waveform = a closed-form integer sequence keyed by doc_id),
    then ``extract_wav_features`` DECODES those bytes with the stdlib
    ``wave`` module behind the Arrow ``mapInPandas`` boundary and
    computes Σx², strict zero crossings, and peak from the decoded
    samples.  The oracle never sees a WAV byte — it replays the
    waveform formula with plain integer arithmetic over a k-grid — so a
    hash match proves the entire encode → Arrow transfer → header parse
    → PCM decode → DSP path is exact, not stubbed (this retires the
    'no real decoder' adjudication for the audio modality; image/video
    stay documented stubs pending PIL/pyav).  Float math is one
    engine-side sqrt-of-mean at the very end.  At 100 TB the synth
    stage is replaced by reading the real binary column off object
    storage; decode cost is Arrow-amortized per batch and the rollup
    is one keyed pass."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        extract_wav_features,
        make_wav_table,
    )

    d = _t(spark, sf_dir, "documents")
    media = make_wav_table(d, sample_rate=8000, max_samples=64)
    feats = extract_wav_features(media)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "sum_sq",
        "zero_crossings",
        "peak",
        "decode_ok",
        F.round(
            F.sqrt(
                F.col("sum_sq").cast("double") / F.col("n_samples")
            ),
            6,
        ).alias("rms"),
    ).orderBy("media_id")


@query(
    "text_repetition_stats",
    oracle="""
    WITH words AS (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+')) AS term
        FROM documents WHERE trim(text) <> ''
    ), wcounts AS (
        SELECT doc_id, source, term, count(*) AS c
        FROM words GROUP BY 1, 2, 3
    ), wdoc AS (
        SELECT doc_id, source,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(max(c) AS BIGINT) AS top,
               CAST(sum(c - 1) AS BIGINT) AS dups
        FROM wcounts GROUP BY 1, 2
    ), wlists AS (
        SELECT doc_id,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS w
        FROM documents WHERE trim(text) <> ''
    ), bigrams AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i + 1])) AS term
        FROM wlists WHERE len(w) >= 2
    ), bcounts AS (
        SELECT doc_id, term, count(*) AS c FROM bigrams GROUP BY 1, 2
    ), bdoc AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS btotal,
               CAST(sum(c - 1) AS BIGINT) AS bdups
        FROM bcounts GROUP BY 1
    ), per_doc AS (
        SELECT w.source,
               round(CAST(w.top AS DOUBLE) / w.total, 6) AS top_word_frac,
               round(CAST(w.dups AS DOUBLE) / w.total, 6) AS dup_word_frac,
               round(coalesce(CAST(b.bdups AS DOUBLE) / b.btotal, 0.0), 6)
                   AS dup_bigram_frac
        FROM wdoc w LEFT JOIN bdoc b USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS docs,
           round(AVG(top_word_frac), 6) AS avg_top_word_frac,
           round(AVG(dup_word_frac), 6) AS avg_dup_word_frac,
           round(AVG(dup_bigram_frac), 6) AS avg_dup_bigram_frac
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (top-word fraction,
    duplicate word/bigram fractions) aggregated per source."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        repetition_stats,
    )

    d = _t(spark, sf_dir, "documents")
    rep = repetition_stats(d)
    return (
        rep.join(d.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("top_word_frac"), 6).alias("avg_top_word_frac"),
            F.round(F.avg("dup_word_frac"), 6).alias("avg_dup_word_frac"),
            F.round(F.avg("dup_bigram_frac"), 6).alias("avg_dup_bigram_frac"),
        )
        .orderBy("source")
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH terms AS (
        SELECT source AS grp,
               unnest(string_split_regex(trim(lower(text)),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS term
        FROM documents WHERE trim(text) <> ''
    ), tf AS (
        SELECT grp, term, CAST(count(*) AS BIGINT) AS tf
        FROM terms GROUP BY 1, 2
    ), gf AS (
        SELECT term, CAST(count(DISTINCT grp) AS BIGINT) AS group_freq
        FROM tf GROUP BY 1
    ), n AS (
        SELECT CAST(count(DISTINCT source) AS DOUBLE) AS ng FROM documents
    ), scored AS (
        SELECT grp, term, tf, group_freq,
               round(tf * ln(ng / group_freq), 6) AS tfidf
        FROM tf JOIN gf USING (term) CROSS JOIN n
    )
    SELECT grp AS source, term, tf, group_freq, tfidf, rank FROM (
        SELECT grp, term, tf, group_freq, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY grp ORDER BY tfidf DESC, term
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY source, rank
    """,
)
def tfidf_top_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-5 tf-idf terms per source (idf over the
    source groups) — fully distributed, no driver-side vocab."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        tfidf_top_terms,
    )

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, group_col="source", k=5).orderBy(
        "source", "rank"
    )


@query(
    "table_column_stats",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           round(CAST(MIN(o_custkey) AS DOUBLE), 4) AS min_val,
           round(CAST(MAX(o_custkey) AS DOUBLE), 4) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', COUNT(*),
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           round(CAST(MIN(o_orderkey) AS DOUBLE), 4),
           round(CAST(MAX(o_orderkey) AS DOUBLE), 4)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           round(CAST(MIN(o_totalprice) AS DOUBLE), 4),
           round(CAST(MAX(o_totalprice) AS DOUBLE), 4)
    FROM orders
    ORDER BY column_name
    """,
)
def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (rows, nulls, NDV, min/max) in
    ONE pass over the table, unpivoted to a row per column.  Exact NDV
    here for oracle parity; at 100 TB swap in approx_count_distinct
    (HyperLogLog — no exact-distinct shuffle) for the same plan shape."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderkey", "o_totalprice"]
    agg = o.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(c).alias(f"_nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"_nd_{c}") for c in cols],
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    )
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.round(F.col(f"_min_{c}"), 4).alias("min_val"),
                F.round(F.col(f"_max_{c}"), 4).alias("max_val"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(stats).alias("s"))
        .select("s.*")
        .orderBy("column_name")
    )


@query(
    "events_salted_rollup",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-salt two-phase aggregation (operators/skew.py) — the
    hot-key spreading pattern; result must equal the plain GROUP BY (the
    oracle IS the plain form, so salting is proven value-neutral)."""
    from high_throughput_etl_pipeline_spark.operators.skew import salted_count

    ev = _t(spark, sf_dir, "events")
    return (
        salted_count(ev, ["event_type"], n_salts=8)
        .select("event_type", F.col("count").alias("n"))
        .orderBy("event_type")
    )


@query(
    "doc_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w
    ), total AS (
        SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocab
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN SUM(CAST(round(ln(v.c / total.n) * 1e9, 0)
                                   AS BIGINT)) >= 0
                     THEN (2 * SUM(CAST(round(ln(v.c / total.n) * 1e9, 0)
                                        AS BIGINT)) + count(*))
                          // (2 * count(*))
                     ELSE -((2 * -SUM(CAST(round(ln(v.c / total.n) * 1e9,
                                                 0) AS BIGINT))
                             + count(*)) // (2 * count(*)))
                END AS BIGINT) AS avg_lp_nanos
    FROM toks t JOIN vocab v USING (w) CROSS JOIN total
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM score per document (avg ln p(w)) — the
    cheap perplexity-style quality signal.  Fully distributed: vocabulary
    and corpus total stay DataFrames (tiny total broadcasts via cross
    join); token→vocab is a keyed shuffle join, linear in token count.
    Hardened r11: each per-token ln rounds to the 1e-9 integer lattice
    BEFORE the per-doc mean (the r5 form averaged RAW ln outputs —
    exactly the libm-summation class that flipped the KM fold on the
    r8 driver), and the mean itself is half-away-from-zero integer
    nanos (no decimal-tie surface)."""
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("n"))
    return (
        toks.join(vocab, on="w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("c") / F.col("n")) * F.lit(1e9), 0)
            .cast("bigint")
            .alias("_lp9"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr(
                "CAST(CASE WHEN SUM(_lp9) >= 0"
                " THEN (2 * SUM(_lp9) + COUNT(*)) div (2 * COUNT(*))"
                " ELSE -((2 * -SUM(_lp9) + COUNT(*)) div (2 * COUNT(*)))"
                " END AS BIGINT)"
            ).alias("avg_lp_nanos"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_bigram_perplexity",
    oracle="""
    WITH tr AS (
        SELECT doc_id,
               list_prepend('<s>', string_split_regex(trim(lower(text)),
                                                      '[ \\t\\n\\r\\f\\x0b]+')) AS t
        FROM documents WHERE trim(text) <> '' AND doc_id % 10 < 8
    ), trb AS (
        SELECT t[i] AS prev, t[i+1] AS w
        FROM tr, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), bc AS (
        SELECT prev, w, count(*) AS cbw FROM trb GROUP BY prev, w
    ), cc AS (
        SELECT prev, count(*) AS cp FROM trb GROUP BY prev
    ), v AS (
        SELECT count(DISTINCT w) AS vv FROM trb
    ), sc AS (
        SELECT doc_id,
               list_prepend('<s>', string_split_regex(trim(lower(text)),
                                                      '[ \\t\\n\\r\\f\\x0b]+')) AS t
        FROM documents WHERE trim(text) <> '' AND doc_id % 10 >= 8
    ), scb AS (
        SELECT doc_id, t[i] AS prev, t[i+1] AS w
        FROM sc, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), lp AS (
        SELECT s.doc_id,
               CAST(round(ln((coalesce(b.cbw, 0) + 0.5)
                  / (coalesce(c.cp, 0) + 0.5 * (v.vv + 1))) * 1e9, 0)
                    AS BIGINT) AS lp9
        FROM scb s
        LEFT JOIN bc b ON s.prev = b.prev AND s.w = b.w
        LEFT JOIN cc c ON s.prev = c.prev
        CROSS JOIN v
    )
    SELECT doc_id, n_tokens, avg_lp_nanos,
           round(exp(-CAST(avg_lp_nanos AS DOUBLE) / 1e9), 4)
               AS perplexity
    FROM (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(CASE WHEN SUM(lp9) >= 0
                         THEN (2 * SUM(lp9) + count(*))
                              // (2 * count(*))
                         ELSE -((2 * -SUM(lp9) + count(*))
                                // (2 * count(*)))
                    END AS BIGINT) AS avg_lp_nanos
        FROM lp GROUP BY doc_id
    ) ORDER BY doc_id
    """,
)
def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: a bigram model with additive
    smoothing is trained on 80% of the corpus (doc_id % 10 < 8) and
    scores the held-out 20% with per-doc avg log-prob and perplexity.
    The model stays distributed (two count DataFrames, keyed scoring
    joins); only the 1-row vocab size broadcasts (operators/text.py:
    bigram_lm_scores)."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        bigram_lm_scores,
    )

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 10 < 8)
    held = d.filter(F.col("doc_id") % 10 >= 8)
    return bigram_lm_scores(train, held, k=0.5).orderBy("doc_id")


@query("bpe_vocab_merges")
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (Sennrich et al. 2016) over the corpus:
    12 merge rounds, each a small explode → groupBy(pair) → argmax over
    the word-TYPE table (bounded by vocabulary, not corpus size), with
    only the winning pair collected per round.  No SQL oracle — BPE is
    inherently iterative (each round's input is the previous argmax);
    semantic parity with a reference implementation is pytest-pinned on
    the classic low/lower/newest/widest example
    (operators/bpe.py:bpe_train)."""
    from high_throughput_etl_pipeline_spark.operators.bpe import (
        bpe_merges_df,
        bpe_train,
    )

    d = _t(spark, sf_dir, "documents")
    return bpe_merges_df(spark, bpe_train(d, n_merges=12)).orderBy("rank")


# Frozen BPE merge table (rank order) — the sf0.01 bpe_train(n_merges=12)
# output, frozen as a literal exactly like the ann_ivf_topk quantizer:
# a tokenizer is trained once and shipped as an artifact, so the ENCODER
# is a deterministic fold any engine can replay.  bpe_vocab_merges keeps
# exercising the live training loop (its own honest no_oracle row).
_BPE_FROZEN_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
]


def _bpe_encode_oracle() -> str:
    """Greedy BPE encoding as pure SQL: per word TYPE, a recursive-CTE
    fixpoint of space-delimited ``replace`` per merge rank.  Leftmost
    non-overlapping ``replace`` equals the greedy left-to-right fold
    because a merge never creates a new (left, right) adjacency — the
    only divergence (a consumed separator hiding the next run pair) is
    exactly what the per-rank fixpoint iteration repairs."""
    vals = ",\n        ".join(
        f"({i}, ' {l} {r} ', ' {l}{r} ')"
        for i, (l, r) in enumerate(_BPE_FROZEN_MERGES)
    )
    n = len(_BPE_FROZEN_MERGES)
    return f"""
    WITH RECURSIVE m(rank, pat, rep) AS (VALUES {vals}),
    t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents WHERE len(trim(text)) > 0
    ),
    occ AS (
        SELECT doc_id, i AS pos, words[i] AS word
        FROM t, LATERAL (SELECT unnest(range(1, len(words) + 1)) AS i)
    ),
    enc AS (
        SELECT word,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g')
                   || '</w> ' AS s,
               0 AS r
        FROM (SELECT DISTINCT word FROM occ)
        UNION ALL
        SELECT word,
               CASE WHEN replace(s, m.pat, m.rep) <> s
                    THEN replace(s, m.pat, m.rep) ELSE s END,
               CASE WHEN replace(s, m.pat, m.rep) <> s
                    THEN r ELSE r + 1 END
        FROM enc JOIN m ON m.rank = enc.r
    ),
    done AS (
        SELECT word, trim(s) AS toks,
               len(string_split(trim(s), ' ')) AS n_toks
        FROM enc WHERE r = {n}
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(d.n_toks) AS BIGINT) AS n_tokens,
           md5(string_agg(d.toks, ' ' ORDER BY o.pos)) AS tokens_md5
    FROM occ o JOIN done d ON o.word = d.word
    GROUP BY o.doc_id ORDER BY o.doc_id
    """


@query("bpe_encode_docs", oracle=_bpe_encode_oracle())
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a FROZEN merge list (the trained
    artifact): map-side fold chain, one array fold per merge rank, no
    shuffle, no Python.  Equal words encode identically, so the hash
    gate binds the whole greedy encoder — merge order, overlap
    resolution, end-of-word handling — against the oracle's
    recursive-CTE replay (see _bpe_encode_oracle)."""
    from high_throughput_etl_pipeline_spark.operators.bpe import bpe_encode

    d = _t(spark, sf_dir, "documents")
    merges = [
        {"rank": i, "left": l, "right": r, "merged": l + r, "freq": 0}
        for i, (l, r) in enumerate(_BPE_FROZEN_MERGES)
    ]
    enc = bpe_encode(d, merges)
    return enc.select(
        "doc_id",
        "n_words",
        "n_tokens",
        F.md5(F.concat_ws(" ", F.col("tokens"))).alias("tokens_md5"),
    ).orderBy("doc_id")


@query(
    "corpus_mixture_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'))
                    END AS nt
        FROM documents
    ), per_src AS (
        SELECT source, CAST(SUM(nt) AS BIGINT) AS src_tokens
        FROM t GROUP BY source
    ), tot AS (
        SELECT CAST(floor(SUM(src_tokens) * 0.1) AS BIGINT) AS budget
        FROM per_src
    ), rates AS (
        SELECT source, src_tokens,
               least(10000, CAST(floor(10000.0 * budget *
                   CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
                               WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                               ELSE 0.0 END
                   / src_tokens) AS BIGINT)) AS cutoff
        FROM per_src CROSS JOIN tot
    ), kept AS (
        SELECT t.doc_id, t.source, t.nt
        FROM t JOIN rates r ON t.source = r.source
        WHERE ('0x' || substr(md5('mix-v1:' || CAST(t.doc_id AS VARCHAR)),
                              18, 15))::BIGINT % 10000 < r.cutoff
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(nt) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source ORDER BY source
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (the data-mixing step): keep ~10%
    of total tokens distributed 40/30/20/10 across four sources, rates
    DERIVED from measured per-source token mass (min(1, budget·share/
    source_tokens)), then the deterministic keyed-hash filter.  Unlisted
    sources drop; an under-supplied share caps at rate 1 and surfaces
    as a shortfall (operators/corpus.py:mixture_sample)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        mixture_sample,
    )
    from high_throughput_etl_pipeline_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    kept = mixture_sample(
        d,
        targets={"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        budget_frac=0.1,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(token_count(F.col("text")).cast("bigint")).alias(
                "kept_tokens"
            ),
        )
        .orderBy("source")
    )


@query(
    "corpus_datacard",
    oracle="""
    WITH feats AS (
        SELECT doc_id, source, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(len(regexp_extract_all(text, '[^\\w\\s]'))
                     / greatest(length(text), 1), 4) AS punct_ratio,
               round(len(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1), 4) AS digit_ratio,
               round(len(regexp_extract_all(lower(text),
                     '\\b(the|and|of|to|a|in|is|that)\\b'))
                     / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                     4) AS stopword_ratio,
               md5(array_to_string(list_slice(string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' '), 1, 8), ' ')) AS pfx
        FROM documents
    ), scored AS (
        SELECT *,
               round(0.25 * least(n_tokens / 100.0, 1.0)
                   + 0.25 * (1.0 - least(punct_ratio * 5, 1.0))
                   + 0.25 * (1.0 - least(digit_ratio * 5, 1.0))
                   + 0.25 * least(stopword_ratio * 4, 1.0), 4) AS q
        FROM feats
    ), pc AS (
        SELECT pfx, COUNT(*) AS pcnt FROM feats GROUP BY pfx
    ), main AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               round(AVG(n_tokens), 2) AS mean_tokens,
               round(quantile_cont(n_tokens, 0.5), 1) AS median_tokens,
               round(AVG(q), 4) AS avg_quality,
               CAST(SUM(CASE WHEN q < 0.35 THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_quality_docs,
               CAST(SUM(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END) AS BIGINT)
                   AS short_docs,
               CAST(SUM(CASE WHEN pc.pcnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS boilerplate_docs
        FROM scored JOIN pc USING (pfx)
        GROUP BY source
    ), lc AS (
        SELECT source, lang, COUNT(*) AS cnt
        FROM documents GROUP BY source, lang
    ), lt AS (
        SELECT source, lang AS top_lang, cnt,
               row_number() OVER (PARTITION BY source
                                  ORDER BY cnt DESC, lang) AS rn
        FROM lc
    )
    SELECT m.source, m.n_docs, m.total_tokens, m.mean_tokens,
           m.median_tokens, m.avg_quality, m.low_quality_docs,
           m.short_docs, m.boilerplate_docs, lt.top_lang,
           round(lt.cnt * 1.0 / m.n_docs, 4) AS top_lang_frac
    FROM main m JOIN lt ON m.source = lt.source AND lt.rn = 1
    ORDER BY m.source
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card — the summary a curation run emits
    alongside its output: volume (docs, tokens, mean/median), language
    mix (top lang + share), quality (avg score, low-quality count),
    short-doc count, and boilerplate-prefix members (docs sharing their
    first 8 normalized words with another doc — 47 bind at sf0.01).
    Composes quality_features + the dedup normalizer; two grouped
    passes + one tiny lang argmax window, no per-doc output."""
    from high_throughput_etl_pipeline_spark.operators.dedup import _norm
    from high_throughput_etl_pipeline_spark.operators.text import (
        quality_features,
    )

    d = _t(spark, sf_dir, "documents")
    feats = quality_features(d).withColumn(
        "_pfx",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(_norm(F.col("text")), " "), 1, 8)
            )
        ),
    )
    pc = feats.groupBy("_pfx").agg(F.count(F.lit(1)).alias("_pcnt"))
    main = (
        feats.join(pc, on="_pfx")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.5)), 1).alias(
                "median_tokens"
            ),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum(
                F.when(F.col("quality_score") < 0.35, 1).otherwise(0)
            ).alias("low_quality_docs"),
            F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0)).alias(
                "short_docs"
            ),
            F.sum(F.when(F.col("_pcnt") > 1, 1).otherwise(0)).alias(
                "boilerplate_docs"
            ),
        )
    )
    lc = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    lt = (
        lc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("cnt").desc(), F.col("lang")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "cnt")
    )
    return (
        main.join(lt, on="source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "mean_tokens",
            "median_tokens",
            "avg_quality",
            "low_quality_docs",
            "short_docs",
            "boilerplate_docs",
            "top_lang",
            F.round(F.col("cnt") / F.col("n_docs"), 4).alias(
                "top_lang_frac"
            ),
        )
        .orderBy("source")
    )


@query(
    "events_freq_sketch",
    oracle="""
    WITH counters AS (
        SELECT r.i,
               ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':'
                    || CAST(e.user_id AS VARCHAR)), 18, 15))::BIGINT % 256
                   AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events e CROSS JOIN generate_series(0, 3) r(i)
        GROUP BY 1, 2
    ), probes AS (
        SELECT DISTINCT user_id FROM events WHERE user_id <= 25
    ), probe_b AS (
        SELECT p.user_id, r.i,
               ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':'
                    || CAST(p.user_id AS VARCHAR)), 18, 15))::BIGINT % 256
                   AS b
        FROM probes p CROSS JOIN generate_series(0, 3) r(i)
    ), est AS (
        SELECT pb.user_id, CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate
        FROM probe_b pb JOIN counters c ON pb.i = c.i AND pb.b = c.b
        GROUP BY pb.user_id
    ), exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM events WHERE user_id <= 25 GROUP BY user_id
    )
    SELECT e.user_id, est.cms_estimate, e.exact_count
    FROM est JOIN exact e ON est.user_id = e.user_id
    ORDER BY e.user_id
    """,
)
def events_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (operators/sketches.py:cms_sketches):
    per-day 4×256 counter matrices over events.user_id, merged into ONE
    matrix by elementwise sketch sum (cms_merge — totals from stored
    sketches, no rescan), then point estimates for the user_id ≤ 25
    probe set.  CMS arithmetic is exact integer counting over portable
    md5 buckets, so — unlike HLL/KLL — the estimates hash-match an
    independent engine bit-for-bit; the oracle rebuilds the same
    counters from first principles (the per-day split is invisible to
    it, which is exactly the mergeability claim under test)."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketches,
    )

    ev = _t(spark, sf_dir, "events")
    daily = cms_sketches(
        ev, key_col="user_id", group_col=F.to_date("ts").cast("string")
    )
    merged = cms_merge(daily)
    probes = ev.filter(F.col("user_id") <= 25).select("user_id").distinct()
    est = cms_estimate(probes, merged, "user_id")
    exact = (
        ev.filter(F.col("user_id") <= 25)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, on="user_id")
        .select("user_id", "cms_estimate", "exact_count")
        .orderBy("user_id")
    )


@query(
    "text_classifier_scores",
    oracle="""
    WITH w AS (
        SELECT i AS fid,
               (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 18, 15))
                   ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM generate_series(0, 4095) t(i)
    ), tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), s AS (
        SELECT doc_id, source, SUM(wt) AS sw, COUNT(*) AS n
        FROM feat JOIN w ON feat.fid = w.fid
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN round(sw / n, 6) > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_keep,
           round(SUM(round(sw / n, 6)), 4) AS score_sum,
           CAST(SUM(CASE WHEN round(sw / n, 6) > 0 THEN doc_id END)
               AS BIGINT) AS keep_id_sum
    FROM s GROUP BY source ORDER BY source
    """,
)
def text_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier inference
    (operators/text.py:linear_quality_score): md5-hashed bag-of-words
    into 4096 buckets, deterministic pseudo-weight table (the trained-
    model stand-in, reproduced by the oracle from the same md5
    derivation), document score = mean feature weight via explode →
    codegen md5 → broadcast weight join → per-doc rollup (the measured
    8x replacement for the interpreted HOF fold — SCALE.md).  Keep
    decision (score > 0) is
    value-checked per source via the kept-id sum; per-doc scores round
    to 6 before the cross-engine sum."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    w = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, w, n_features=4096).withColumn(
        # threshold on the ROUNDED score: raw sums can land within an
        # ulp of 0 and flip sign under a different summation order
        "_sr",
        F.round(F.col("score"), 6),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("_sr") > 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_keep"),
            F.round(F.sum("_sr"), 4).alias("score_sum"),
            F.sum(F.when(F.col("_sr") > 0, F.col("doc_id"))).alias(
                "keep_id_sum"
            ),
        )
        .orderBy("source")
    )


@query(
    "corpus_epoch_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               ('0x' || substr(md5('shuffle-v1:e1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT AS k
        FROM documents
    ), sh AS (
        SELECT doc_id, k,
               CAST(k % 8 AS INT) AS shard,
               row_number() OVER (PARTITION BY k % 8 ORDER BY k, doc_id)
                   AS pos
        FROM keyed
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos * doc_id) AS BIGINT) AS pos_weighted_sum,
           CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc
    FROM sh GROUP BY shard ORDER BY shard
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment
    (operators/corpus.py:shuffle_shards): epoch-1 permutation into 8
    shards, checked order-sensitively — pos_weighted_sum is
    SUM(pos·doc_id), which differs under ANY misordering within a
    shard, and head_doc pins each shard's first export row."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        shuffle_shards,
    )

    d = _t(spark, sf_dir, "documents")
    s = shuffle_shards(d, epoch=1, n_shards=8)
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pos").cast("bigint") * F.col("doc_id")).alias(
                "pos_weighted_sum"
            ),
            F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias(
                "head_doc"
            ),
        )
        .orderBy("shard")
    )


@query(
    "corpus_hash_split",
    oracle="""
    WITH b AS (
        SELECT source, n_chars,
               ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 10000 AS bucket
        FROM documents
    ), tagged AS (
        SELECT source, n_chars,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    WHEN bucket < 10000 THEN 'test' END AS split
        FROM b
    )
    SELECT source, split,
           COUNT(*) AS docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by portable keyed hash —
    stable across runs and engines, no RNG state."""
    from high_throughput_etl_pipeline_spark.operators.corpus import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        hash_split(d, weights={"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


def _pii_oracle() -> str:
    """Oracle built from the SAME pattern list the Spark operator uses —
    pattern drift between engine and oracle is impossible."""
    from high_throughput_etl_pipeline_spark.operators.text import PII_PATTERNS

    expr = "t"
    for pattern, placeholder in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{placeholder}', 'g')"
    return f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail-example.org or +1 555 '
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
        FROM documents WHERE doc_id < 40
    ), red AS (
        SELECT doc_id, {expr} AS t FROM aug
    )
    SELECT doc_id, md5(t) AS red_md5,
           CAST(len(regexp_extract_all(t, '<EMAIL>|<PHONE>|<IP>'))
                AS BIGINT) AS n_hits
    FROM red ORDER BY doc_id
    """


@query("text_pii_redaction", oracle=_pii_oracle())
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.py redact_pii): emails, +intl phones,
    IPv4 → typed placeholders.  Synthetic docs carry no PII, so the query
    PLANTS one of each per row (derived from doc_id) — the check is
    value-sensitive (md5 of the full redacted text), never vacuous."""
    from high_throughput_etl_pipeline_spark.operators.text import redact_pii

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-example.org or +1 555 "),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" host 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
    )
    red = d.select("doc_id", redact_pii(aug).alias("t"))
    return red.select(
        "doc_id",
        F.md5("t").alias("red_md5"),
        F.regexp_count(F.col("t"), F.lit("<EMAIL>|<PHONE>|<IP>"))
        .cast("long")
        .alias("n_hits"),
    ).orderBy("doc_id")


@query(
    "corpus_stratified_sample",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('sample-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 10000 AS bucket,
               CASE lang WHEN 'en' THEN 4000 WHEN 'zh' THEN 8000
                         ELSE 2000 END AS hi
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM s WHERE bucket < hi
    GROUP BY lang ORDER BY lang
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: cap English at 40%, boost
    zh to 80%, default 20% — the language-rebalancing pass of corpus
    curation.  Pure map-side hash filter (operators/corpus.py
    stratified_sample): no RNG, no shuffle, same kept set on any engine.
    ``id_sum`` makes the check value-sensitive, not just a count."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        stratified_sample,
    )

    d = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        d, "lang", rates={"en": 0.4, "zh": 0.8}, default_rate=0.2
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


@query(
    "benchmark_contamination",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents WHERE trim(text) <> ''
    ), g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 3, 1)),
                   i -> array_to_string(words[i:i+3], ' ')))) AS gram
        FROM w WHERE len(words) >= 4
    ), bench AS (
        SELECT DISTINCT
               ('0x' || substr(md5(gram), 18, 15))::BIGINT AS gh
        FROM g WHERE doc_id % 100 = 7
    ), corpus AS (
        SELECT doc_id,
               ('0x' || substr(md5(gram), 18, 15))::BIGINT AS gh
        FROM g WHERE doc_id % 100 <> 7
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
    FROM corpus c JOIN bench USING (gh)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def benchmark_contamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination primitive: corpus docs sharing 4-gram hashes with a
    (deterministic) benchmark slice; benchmark gram set broadcasts."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        benchmark_contamination,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 == 7)
    corpus = d.filter(F.col("doc_id") % 100 != 7)
    return benchmark_contamination(corpus, bench, ngram_n=4).orderBy("doc_id")


@query(
    "contamination_bloom",
    # identical semantics to benchmark_contamination — the Bloom filter is
    # a pre-filter with no false negatives and the exact confirming join
    # removes its false positives, so the exact oracle transfers verbatim
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents WHERE trim(text) <> ''
    ), g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 3, 1)),
                   i -> array_to_string(words[i:i+3], ' ')))) AS gram
        FROM w WHERE len(words) >= 4
    ), bench AS (
        SELECT DISTINCT
               ('0x' || substr(md5(gram), 18, 15))::BIGINT AS gh
        FROM g WHERE doc_id % 100 = 7
    ), corpus AS (
        SELECT doc_id,
               ('0x' || substr(md5(gram), 18, 15))::BIGINT AS gh
        FROM g WHERE doc_id % 100 <> 7
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
    FROM corpus c JOIN bench USING (gh)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def contamination_bloom_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at the scale where the benchmark gram set no longer
    broadcasts: a 64 KB Bloom filter (plan literal) drops non-colliding
    corpus grams map-side; the exact join then confirms survivors, so the
    result is bit-identical to ``benchmark_contamination`` while only
    true-ish matches ride the shuffle (operators/corpus.py:
    bloom_contamination)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        bloom_contamination,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 == 7)
    corpus = d.filter(F.col("doc_id") % 100 != 7)
    return bloom_contamination(corpus, bench, ngram_n=4).orderBy("doc_id")


@query(
    "embedding_centering",
    oracle="""
    WITH m AS (
        SELECT t.i, AVG(CAST(e.embedding[t.i] AS DOUBLE)) AS mu
        FROM embeddings e CROSS JOIN generate_series(1, 64) t(i)
        GROUP BY t.i
    ), raw AS (
        SELECT vec_id, label,
               sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS rn
        FROM embeddings
    ), cent AS (
        SELECT e.vec_id,
               sqrt(SUM(power(CAST(e.embedding[t.i] AS DOUBLE) - m.mu, 2)))
                   AS cn
        FROM embeddings e
        CROSS JOIN generate_series(1, 64) t(i)
        JOIN m ON m.i = t.i
        GROUP BY e.vec_id
    )
    SELECT r.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(AVG(r.rn), 4) AS avg_raw_norm,
           round(AVG(c.cn), 4) AS avg_centered_norm
    FROM raw r JOIN cent c ON r.vec_id = c.vec_id
    GROUP BY r.label ORDER BY r.label
    """,
)
def embedding_centering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mean centering (operators/similarity.py:center_embeddings)
    — ANN/SemDeDup preprocessing.  The mean vector is one pass of 64
    avg aggregates broadcast back as a one-row array; subtraction is a
    map-side zip_with.  Per-label norm shift (raw vs centered) is the
    value check; the oracle recomputes the mean per dimension from
    first principles."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        _dot,
        center_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings")
    c = center_embeddings(emb, "embedding", dim=64)
    withn = c.select(
        "label",
        F.sqrt(
            _dot(
                F.col("embedding").cast("array<double>"),
                F.col("embedding").cast("array<double>"),
            )
        ).alias("_rn"),
        F.sqrt(_dot(F.col("centered"), F.col("centered"))).alias("_cn"),
    )
    return (
        withn.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("_rn"), 4).alias("avg_raw_norm"),
            F.round(F.avg("_cn"), 4).alias("avg_centered_norm"),
        )
        .orderBy("label")
    )


@query(
    "events_winsorized",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS lo,
               quantile_cont(value, 0.99) AS hi
        FROM events GROUP BY event_type
    ), c AS (
        SELECT e.event_type, e.value,
               least(greatest(e.value, b.lo), b.hi) AS vw,
               CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS cl,
               CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS ch
        FROM events e JOIN b USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cl) AS BIGINT) AS clipped_lo,
           CAST(SUM(ch) AS BIGINT) AS clipped_hi,
           round(AVG(value), 4) AS mean_raw,
           round(AVG(vw), 4) AS mean_winsorized,
           round(MIN(vw), 4) AS min_w,
           round(MAX(vw), 4) AS max_w
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization (plans/metrics.py:winsorize): clip values
    to the type's [p01, p99], report clip counts and the raw-vs-robust
    mean shift.  The bounds table (rows = #types) broadcast-joins back;
    the clip is map-side; at 100 TB swap exact percentile for
    approx_percentile (same contract)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import winsorize

    ev = _t(spark, sf_dir, "events")
    w = winsorize(ev, "value", "event_type", 0.01, 0.99)
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clipped_lo").alias("clipped_lo"),
            F.sum("clipped_hi").alias("clipped_hi"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg("value_w"), 4).alias("mean_winsorized"),
            F.round(F.min("value_w"), 4).alias("min_w"),
            F.round(F.max("value_w"), 4).alias("max_w"),
        )
        .orderBy("event_type")
    )


@query(
    "source_overlap_matrix",
    oracle="""
    WITH w AS (
        SELECT source,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents WHERE trim(text) <> ''
    ), g AS (
        SELECT source,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 4, 1)),
                   i -> array_to_string(words[i:i+4], ' ')))) AS gram
        FROM w WHERE len(words) >= 5
    ), sg AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(gram), 18, 15))::BIGINT AS gh
        FROM g
    ), sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM sg GROUP BY source
    ), shared AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS shared_grams
        FROM sg a JOIN sg b ON a.gh = b.gh AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, s.shared_grams,
           round(s.shared_grams * 1.0
                 / (za.n_grams + zb.n_grams - s.shared_grams), 6)
               AS jaccard
    FROM shared s
    JOIN sizes za ON za.source = s.src_a
    JOIN sizes zb ON zb.source = s.src_b
    ORDER BY s.src_a, s.src_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: distinct 5-gram overlap
    between every source pair (32 pairs bind at sf0.01) with gram-set
    Jaccard — the leakage audit run before mixing corpora.  Scale
    shape: grams dedup per source FIRST, so the gram-keyed self-join
    emits at most #sources²/2 pairs per gram — bounded by the source
    count, never by corpus size."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        _word_ngrams_of,
    )
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    sg = (
        d.select(
            "source", tokens(F.col("text")).alias("_words")
        )
        .filter(F.size("_words") >= 5)
        .select(
            "source",
            F.explode(
                F.array_distinct(_word_ngrams_of(F.col("_words"), 5))
            ).alias("_g"),
        )
        .select("source", md5_64(F.col("_g")).alias("_gh"))
        .distinct()
    )
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.select(F.col("source").alias("src_a"), "_gh")
    b = sg.select(F.col("source").alias("src_b"), "_gh")
    shared = (
        a.join(b, on="_gh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    za = sizes.select(
        F.col("source").alias("src_a"), F.col("n_grams").alias("_na")
    )
    zb = sizes.select(
        F.col("source").alias("src_b"), F.col("n_grams").alias("_nb")
    )
    return (
        shared.join(F.broadcast(za), on="src_a")
        .join(F.broadcast(zb), on="src_b")
        .select(
            "src_a",
            "src_b",
            "shared_grams",
            F.round(
                F.col("shared_grams")
                / (F.col("_na") + F.col("_nb") - F.col("shared_grams")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "corpus_packed_sequences",
    oracle="""
    WITH t AS (
        SELECT source, doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'))
                    END AS n_tokens
        FROM documents
    ), bucketed AS (
        SELECT source, doc_id, n_tokens,
               CAST(floor(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 256.0) AS BIGINT) AS bucket
        FROM t
    ), packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY source ORDER BY bucket
               ) - 1 AS BIGINT) AS pack_id
        FROM bucketed
    ), starts AS (
        SELECT source, doc_id, n_tokens, pack_id,
               coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source, pack_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS start
        FROM packed
    )
    SELECT source, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_len,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           string_agg(CAST(start AS VARCHAR), ',' ORDER BY doc_id)
               AS boundaries
    FROM starts
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
)
def corpus_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence loader view (operators/corpus.py:pack_sequences):
    256-token packs per source materialized one-row-per-pack with the
    document-start token offsets — the attention-mask reset points that
    stop cross-document attention inside a packed context window.  The
    boundaries array is checked ORDER-SENSITIVELY as a csv string
    (boundaries[0]=0, diffs = member lengths)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        pack_sequences,
    )

    d = _t(spark, sf_dir, "documents")
    p = pack_sequences(d, budget=256)
    return p.select(
        "source",
        "pack_id",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "seq_len",
        F.aggregate(
            "doc_ids", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("id_sum"),
        F.concat_ws(
            ",",
            F.transform(F.col("boundaries"), lambda b: b.cast("string")),
        ).alias("boundaries"),
    ).orderBy("source", "pack_id")


@query(
    "corpus_token_packing",
    oracle="""
    WITH t AS (
        SELECT source, doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'))
                    END AS n_tokens
        FROM documents
    ), bucketed AS (
        SELECT source, doc_id, n_tokens,
               CAST(floor(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 60.0) AS BIGINT) AS bucket
        FROM t
    ), packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY source ORDER BY bucket
               ) - 1 AS BIGINT) AS pack_id
        FROM bucketed
    )
    SELECT source, pack_id,
           COUNT(*) AS docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
)
def corpus_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: ~60-token packs per source via
    exclusive-prefix-sum bucketing + dense_rank re-densify (window
    partitioned per source — no global sort; packs may overflow by at
    most one doc).  Budget 60 is deliberately below the corpus's max doc
    length (99 tokens at sf0.01) so oversize docs occur in real data and
    the gap-free pack-id contract is oracle-visible, not just
    property-test-visible."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        pack_token_budget,
    )

    d = _t(spark, sf_dir, "documents")
    packed = pack_token_budget(d, budget=60, part_col="source")
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("_tokens").cast("bigint").alias("pack_tokens"),
        )
        .orderBy("source", "pack_id")
    )


@query(
    "corpus_vocab_topk",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents
        WHERE len(trim(text)) > 0
    ), grams AS (
        SELECT doc_id,
               words[i] || ' ' || words[i+1] AS gram
        FROM t, LATERAL (SELECT unnest(range(1, len(words))) AS i)
        WHERE len(words) >= 2
    )
    SELECT gram,
           COUNT(*) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM grams
    GROUP BY gram
    ORDER BY tf DESC, gram
    LIMIT 50
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary building: top-50 word bigrams by total
    frequency, with document frequency — the counting pass under
    BPE-style vocab induction.  Explode → ONE grouped aggregate (partial
    counts collapse map-side) → TakeOrdered top-k; no per-doc state, no
    driver-side vocabulary."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        tokens,
        word_bigrams,
    )

    d = _t(spark, sf_dir, "documents")
    grams = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(F.col("doc_id"), tokens(F.col("text")).alias("_words"))
        .select(
            "doc_id", F.explode(word_bigrams(F.col("_words"))).alias("gram")
        )
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .orderBy(F.desc("tf"), "gram")
        .limit(50)
    )


@query(
    "dedup_keep_best",
    oracle="""
    WITH fp AS (
        SELECT doc_id, n_chars,
               md5(array_to_string(
                   (string_split_regex(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' '))[1:8], ' ')) AS fingerprint
        FROM documents
    ), ranked AS (
        SELECT fingerprint, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY fingerprint
                   ORDER BY n_chars DESC, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY fingerprint) AS dup_count
        FROM fp
    )
    SELECT fingerprint,
           CAST(dup_count AS BIGINT) AS dup_count,
           doc_id AS keep_id,
           CAST(dup_count - 1 AS BIGINT) AS dropped
    FROM ranked
    WHERE rn = 1 AND dup_count > 1
    ORDER BY fingerprint
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection over a truncation-tolerant key: docs
    sharing the same first-8-words prefix fingerprint form a group (the
    crawl-dump case — copies differ by truncation or trailing
    boilerplate, so a whole-text hash misses them), and the group keeps
    its BEST copy (longest, ties by lowest id) instead of blindly the
    minimum id.  One window per fingerprint group; the 16-byte
    fingerprint is the shuffle key regardless of document size."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    fp = d.select(
        "doc_id",
        "n_chars",
        F.md5(F.concat_ws(" ", F.slice(words, 1, 8))).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    wc = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(wc).cast("bigint"))
        .filter((F.col("rn") == 1) & (F.col("dup_count") > 1))
        .select(
            "fingerprint",
            "dup_count",
            F.col("doc_id").alias("keep_id"),
            (F.col("dup_count") - 1).cast("bigint").alias("dropped"),
        )
        .orderBy("fingerprint")
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 25.0), 19) AS INT) AS bucket,
           COUNT(*) AS n,
           round(MIN(value), 2) AS lo,
           round(MAX(value), 2) AS hi
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of 25, clamped top bucket): the
    numeric-profiling primitive that stays ONE grouped pass at any scale
    — bucket is a map-side expression, so partial aggregation collapses
    each partition to ≤ |types|×20 rows before the shuffle (contrast a
    sort-based quantile cut, which shuffles the raw rows)."""
    e = _t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "user_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (event_type = 'view')     AS t_view,
               MIN(ts) FILTER (event_type = 'click')    AS t_click,
               MIN(ts) FILTER (event_type = 'purchase') AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT
        COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS viewed,
        CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
        CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                 THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
    FROM firsts
    """,
)
def user_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): first-touch timestamps
    per user via ONE conditional-min aggregate (no self-joins, no
    per-stage scans — the naive funnel is 3 scans + 2 joins), then the
    strictly-ordered conversion counts in a single global rollup.
    NULL-safe by construction: a missing stage yields NULL and fails the
    ``>`` comparison on both engines."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("int")).cast("bigint").alias("viewed"),
        F.sum(clicked.cast("int")).cast("bigint").alias("clicked_after_view"),
        F.sum(purchased.cast("int"))
        .cast("bigint")
        .alias("purchased_after_click"),
    )


@query(
    "corpus_doc_chunks",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM documents
        WHERE len(trim(text)) > 0
    ), n AS (
        SELECT doc_id, words, len(words) AS n_tok,
               CAST(1 + ceil(greatest(len(words) - 40, 0) / 30.0) AS INT)
                   AS n_chunks
        FROM t
    ), chunks AS (
        SELECT doc_id, CAST(k AS INT) AS chunk_id,
               words[k*30+1 : least(k*30+40, n_tok)] AS chunk
        FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS k)
    )
    SELECT doc_id, chunk_id,
           md5(array_to_string(chunk, ' ')) AS chunk_md5,
           CAST(len(chunk) AS INT) AS n_tokens
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def corpus_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (chunk 40, stride 30 — below
    the corpus max doc length so multi-chunk docs occur): the
    context-length prep step for training.  Map-side tokenize → explode
    chunk starts → slice; no shuffle.  Chunk text is value-checked via
    md5 so result rows stay narrow."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        chunk_documents,
    )

    d = _t(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk_tokens=40, stride=30)
    return ch.select(
        "doc_id",
        "chunk_id",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "events_hopping_windows",
    oracle="""
    WITH w AS (
        SELECT date_trunc('hour', ts) - to_hours(k) AS w_start,
               event_type, value
        FROM events, LATERAL (SELECT unnest(range(0, 2)) AS k)
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 2) AS total_value
    FROM w
    GROUP BY w_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time windows: 2-hour windows every 1 hour via
    the built-in ``window(ts, duration, slide)`` — each event lands in
    exactly duration/slide windows, expanded map-side before ONE grouped
    aggregation (never N scans for N offsets).  The batch twin of the
    streaming windowed aggregate; the oracle expands the same two
    offsets per event explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "embedding_quantization",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), s AS (
        SELECT vec_id, ev,
               greatest(list_max(list_transform(ev, x -> abs(x))), 1e-12)
                   / 127.0 AS scale
        FROM v
    ), c AS (
        SELECT vec_id, scale, ev,
               list_transform(ev, x -> CAST(round(x / scale) AS INT)) AS codes
        FROM s
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           round(list_max(list_transform(
               generate_series(1, len(ev)),
               i -> abs(ev[i] - codes[i] * scale))), 6) AS max_abs_err
    FROM c
    ORDER BY vec_id
    """,
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization + achieved dequant error;
    codes collapsed to a checksum so the oracle hash stays compact."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e)
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(
            "codes", F.lit(0).cast("bigint"), lambda a, c: a + c.cast("bigint")
        ).alias("code_sum"),
        "max_abs_err",
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Coverage batch 2: P6/P13/P17, A8, U1, O2, W1, and an oracle-checkable
# md5-based MinHash (the fast xxhash64 variant stays for bench; this one
# proves LSH correctness value-for-value against DuckDB)
# ---------------------------------------------------------------------------


@query(
    "s3_path_parse",
    oracle="""
    WITH uris AS (
        SELECT 's3://bucket-' || (o_orderkey % 4) || '/input/'
               || strftime(o_orderdate, '%Y-%m-%d') || '/order-' || o_orderkey
               || '.ndjson' AS uri
        FROM orders
    ), parsed AS (
        SELECT split_part(replace(uri, 's3://', ''), '/', 1) AS bucket,
               regexp_replace(replace(uri, 's3://', ''), '^[^/]+/', '') AS key,
               split_part(uri, '/', -1) AS file_name
        FROM uris
    )
    SELECT bucket, COUNT(*) AS n,
           MIN(file_name) AS first_file,
           MIN(key) AS first_key
    FROM parsed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def s3_path_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — s3://bucket/key parse + filename extraction
    (glue_batch_job.py:211-215, builder.py:996-1004)."""
    from high_throughput_etl_pipeline_spark.functions.scalar import (
        file_name_of,
        parse_s3_path,
    )

    o = _t(spark, sf_dir, "orders")
    uris = o.select(
        F.concat(
            F.lit("s3://bucket-"),
            (F.col("o_orderkey") % 4).cast("string"),
            F.lit("/input/"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.lit("/order-"),
            F.col("o_orderkey").cast("string"),
            F.lit(".ndjson"),
        ).alias("uri")
    )
    bucket, key = parse_s3_path(F.col("uri"))
    parsed = uris.select(
        bucket.alias("bucket"),
        key.alias("key"),
        file_name_of(F.col("uri")).alias("file_name"),
    )
    return (
        parsed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("file_name").alias("first_file"),
            F.min("key").alias("first_key"),
        )
        .orderBy("bucket")
    )


@query(
    "events_props_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           round(AVG(CAST(props->>'k' AS INT)), 4) AS avg_k,
           MIN(CAST(props->>'k' AS INT)) AS min_k,
           MAX(CAST(props->>'k' AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 analog — JSON field access on a string column (the engine's
    NDJSON heritage: get_json_object stays JVM-side)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "derive_run_status",
    oracle="""
    WITH runs AS (
        SELECT strftime(ts, '%Y-%m-%d') AS date,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                   AS errors_count,
               CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT)
                   AS processed_count
        FROM events
        GROUP BY strftime(ts, '%Y-%m-%d')
    )
    SELECT date, errors_count, processed_count,
           CASE WHEN errors_count = 0 THEN 'success'
                WHEN processed_count > 0 THEN 'partial_success'
                ELSE 'failed' END AS status
    FROM runs
    ORDER BY date
    """,
)
def derive_run_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 — success/partial_success/failed derivation (builder.py:316)."""
    from high_throughput_etl_pipeline_spark.functions.scalar import derive_status

    ev = _t(spark, sf_dir, "events")
    runs = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date")).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errors_count"),
        F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0))
        .cast("bigint")
        .alias("processed_count"),
    )
    return runs.select(
        "date",
        "errors_count",
        "processed_count",
        derive_status(F.col("errors_count"), F.col("processed_count")).alias(
            "status"
        ),
    ).orderBy("date")


@query(
    "ingest_velocity",
    oracle="""
    WITH agg AS (
        SELECT COUNT(*) AS files, SUM(value) / 1024.0 AS total_gb
        FROM events
    )
    SELECT files,
           round(files / 720.0, 2) AS files_per_hour,
           round(files / 720.0 / 3600.0, 4) AS files_per_sec,
           round(total_gb / 720.0, 4) AS gb_per_hour,
           round(total_gb / 720.0 * 24 / 1024.0, 4) AS tb_per_day
    FROM agg
    """,
)
def ingest_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — files/hour, GB/hour, TB/day projections
    (analyze_metrics.py:104-106); events span 30 days = 720 h."""
    from high_throughput_etl_pipeline_spark.plans.metrics import velocity

    ev = _t(spark, sf_dir, "events").withColumn(
        "size_gb", F.col("value") / 1024.0
    )
    return velocity(ev, hours_observed=720.0)


@query(
    "union_report_sources",
    oracle="""
    SELECT src, CAST(n AS BIGINT) AS n FROM (
        SELECT 'orders' AS src, COUNT(*) AS n FROM orders
        UNION ALL
        SELECT 'lineitem' AS src, COUNT(*) AS n FROM lineitem
        UNION ALL
        SELECT 'events' AS src, COUNT(*) AS n FROM events
    )
    ORDER BY src
    """,
)
def union_report_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — multi-source union (the implicit union of a multi-file read,
    glue_batch_job.py:147-151) as an explicit unionByName."""
    parts = [
        _t(spark, sf_dir, "orders").agg(F.count("*").alias("n")).select(
            F.lit("orders").alias("src"), "n"
        ),
        _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n")).select(
            F.lit("lineitem").alias("src"), "n"
        ),
        _t(spark, sf_dir, "events").agg(F.count("*").alias("n")).select(
            F.lit("events").alias("src"), "n"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("src")


@query(
    "sorted_distinct_users",
    oracle="""
    SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 25
    """,
)
def sorted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3 — sorted distinct key list with limit (builder.py:915)."""
    return (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(25)
    )


@query(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name AS nation, c_custkey, c_acctbal, rnk FROM (
        SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS c_acctbal,
               CAST(row_number() OVER (
                   PARTITION BY n.n_name
                   ORDER BY c.c_acctbal DESC, c.c_custkey
               ) AS INT) AS rnk
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    WHERE rnk <= 3
    ORDER BY nation, rnk
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — top-k per group via ranking window (the peak-hour pattern
    generalized; analyze_metrics.py:110)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey).select(
        F.col("n_name").alias("nation"),
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    w = Window.partitionBy("nation").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("nation", "rnk")
    )


_MINHASH_MD5_ORACLE = """
WITH docs AS (
    SELECT doc_id,
           string_split_regex(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct([
               array_to_string(words[i:i+2], ' ')
               for i in range(1, len(words) - 1)
           ]) AS shingles
    FROM docs
    WHERE len(words) >= 3
), sig AS (
    SELECT doc_id,
           [list_min([
               ('0x' || substr(md5(h || ':' || s), 18, 15))::BIGINT
               for s in shingles
           ]) for h in range(0, 8)] AS sig
    FROM sh
), bands AS (
    SELECT doc_id, b,
           md5(array_to_string(
               [CAST(x AS VARCHAR) for x in sig[b*2+1:b*2+2]], ',')) AS band_hash
    FROM sig, (SELECT unnest(range(0, 4)) AS b)
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
), scored AS (
    SELECT p.id_a, p.id_b,
           round(len([i for i in range(1, 9) if sa.sig[i] = sb.sig[i]]) / 8.0,
                 4) AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, est_jaccard
FROM scored
WHERE est_jaccard >= 0.25
ORDER BY id_a, id_b
"""


_JACCARD_MINHASH_ORACLE = f"""
WITH {_JACCARD_MINHASH_PAIRS_CTE}
SELECT id_a, id_b, jaccard
FROM pairs
ORDER BY id_a, id_b
"""


@query("dedup_jaccard_minhash", oracle=_JACCARD_MINHASH_ORACLE)
def dedup_jaccard_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard verify over md5-MinHash LSH candidates — the scale
    path for pair verification (candidate volume tracks near-dup density,
    not block-size skew; see dedup_jaccard_pairs for the blocked form)."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        jaccard_pairs_via_minhash,
    )

    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    ).orderBy("id_a", "id_b")


@query("dedup_minhash_md5", oracle=_MINHASH_MD5_ORACLE)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the portable md5 hash family — value-for-value
    oracle-checkable (8 hashes, 4 bands, 3-gram shingles, threshold 0.25).

    The engine's production variant (dedup_minhash_lsh) uses xxhash64 for
    ~5x cheaper signatures; this query pins the LSH algebra itself —
    banding, candidate generation, signature-agreement estimate — against
    an independent engine.
    """
    d = _t(spark, sf_dir, "documents")
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
        word_shingles,
    )

    num_hashes, bands, rows_per_band = 8, 4, 2
    # word-count filter BEFORE shingling (== shingles non-empty, mirrors
    # the oracle's len(words) >= 3) — filtering on size(_shingles) would
    # re-evaluate the shingle expression in the Filter node
    sh = (
        d.select(
            F.col("doc_id").alias("_id"),
            norm_words(F.col("text")).alias("_words"),
        )
        .filter(F.size("_words") >= 3)
        .select("_id", word_shingles(F.col("_words"), 3).alias("_shingles"))
    )

    # signatures via explode + groupBy-min, NOT per-lane array_min
    # lambdas: HOF transforms run interpreted per element, while the
    # exploded form is whole-stage-codegen with map-side partial mins —
    # value-identical lanes (same md5(i:shingle) low-60-bits), ~3x
    # faster measured
    exploded = sh.select("_id", F.explode("_shingles").alias("_s"))
    sigs = (
        exploded.groupBy("_id")
        .agg(
            *[
                F.min(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(F.lit(str(i)), F.lit(":"), F.col("_s"))
                            ),
                            18,
                            15,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                ).alias(f"_h{i}")
                for i in range(num_hashes)
            ]
        )
        .select(
            "_id",
            F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("_sig"),
        )
        .persist()
    )

    banded = sigs.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("_sig"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_hash")

    pairs = (
        banded.select("band_id", "band_hash", F.col("_id").alias("id_a"))
        .join(
            banded.select("band_id", "band_hash", F.col("_id").alias("id_b")),
            on=["band_id", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .join(
            sigs.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a")),
            on="id_a",
        )
        .join(
            sigs.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b")),
            on="id_b",
        )
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
    )
    return (
        pairs.withColumn(
            "est_jaccard", F.round((agree / F.lit(8.0)).cast("double"), 4)
        )
        .filter(F.col("est_jaccard") >= 0.25)
        .select("id_a", "id_b", "est_jaccard")
        .orderBy("id_a", "id_b")
    )


def _simhash_md5_oracle(n_bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB replica of the portable simhash vote algebra: per-token
    md5-low-60-bit hash, ±1 vote per bit, sign → bit, then pairwise
    hamming within a language.  The 32 per-bit vote sums are generated
    here so the oracle can never drift from ``n_bits``."""
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(n_bits)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) "
        f"ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ')) AS t
        FROM documents WHERE doc_id < 300
    ), hashed AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(t), 18, 15))::BIGINT AS h
        FROM toks
    ), votes AS (
        SELECT doc_id, lang,
               {votes}
        FROM hashed GROUP BY doc_id, lang
    ), sh AS (
        SELECT doc_id, lang, {bits} AS simhash FROM votes
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY id_a, id_b
    """


@query("dedup_simhash_md5", oracle=_simhash_md5_oracle())
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with the portable md5 hash family — value-for-value
    oracle check of the vote algebra (the production ``dedup_simhash``
    uses xxhash64 and prefix blocking for speed; this pins the math).

    Scope is a bounded id slice with a same-language pair join: the
    algebra check needs coverage, not scale — the scale path (prefix
    blocking + rotation tables) is exercised by ``dedup_simhash`` and
    its superset property test."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            "lang",
            simhash64("text", n_bits=32, portable=True).alias("simhash"),
        )
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        F.col("simhash").alias("sh_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        "lang",
        F.col("simhash").alias("sh_b"),
    )
    return (
        a.join(b, on="lang")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@query(
    "user_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ), ids AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM ids
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity), batch mode — the
    oracle for the stateful streaming operator in streaming/sessionize.py.
    One shuffle on user_id; both window passes share the partitioning."""
    from high_throughput_etl_pipeline_spark.streaming.sessionize import (
        sessionize_batch,
    )

    ev = _t(spark, sf_dir, "events")
    s = sessionize_batch(ev, gap_minutes=30.0)
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


@query(
    "scd2_customer_merge",
    oracle="""
    WITH dim AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               round(c_acctbal, 2) AS bal,
               DATE '1992-01-01' AS eff_from,
               DATE '9999-12-31' AS eff_to,
               TRUE AS is_current
        FROM customer
    ), cnts AS (
        SELECT o_custkey AS k, COUNT(*) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-07-01'
        GROUP BY o_custkey
    ), upd AS (
        SELECT d.k,
               CASE WHEN c.cnt >= 3 THEN 'VIP' ELSE d.seg END AS seg,
               d.bal
        FROM cnts c JOIN dim d ON c.k = d.k
    ), merged AS (
        SELECT d.k, d.seg, d.bal, d.eff_from, d.eff_to, d.is_current
        FROM dim d LEFT JOIN upd u ON d.k = u.k
        WHERE u.k IS NULL OR (u.seg = d.seg AND u.bal = d.bal)
        UNION ALL
        SELECT d.k, d.seg, d.bal, d.eff_from,
               DATE '1995-07-01' AS eff_to, FALSE AS is_current
        FROM dim d JOIN upd u ON d.k = u.k
        WHERE u.seg <> d.seg OR u.bal <> d.bal
        UNION ALL
        SELECT u.k, u.seg, u.bal, DATE '1995-07-01' AS eff_from,
               DATE '9999-12-31' AS eff_to, TRUE AS is_current
        FROM dim d JOIN upd u ON d.k = u.k
        WHERE u.seg <> d.seg OR u.bal <> d.bal
    )
    SELECT is_current, seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(MIN(eff_from) AS VARCHAR) AS min_from,
           CAST(MAX(eff_from) AS VARCHAR) AS max_from,
           CAST(MIN(eff_to) AS VARCHAR) AS min_to,
           round(SUM(bal), 2) AS bal_sum
    FROM merged
    GROUP BY is_current, seg
    ORDER BY is_current, seg
    """,
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge (operators/merge.py:scd2_merge): customers
    are the day-0 dimension snapshot; customers with ≥3 orders in
    1995H1 get a 'VIP' segment update applied as of 1995-07-01 — the
    changed keys close + re-open, identical updates no-op, the rest
    carry.  At sf0.01: 60 changed / 717 no-op / 723 carried, so every
    merge branch binds.  The oracle mirrors the semantics as a
    three-branch UNION; the engine emits closed+open pairs from ONE
    full-outer join via a conditional array + inline (single pass)."""
    from high_throughput_etl_pipeline_spark.operators.merge import scd2_merge

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("1992-01-01").cast("date").alias("effective_from"),
        F.lit("9999-12-31").cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    cnts = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("uk"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    updates = cnts.join(dim, cnts["uk"] == dim["k"]).select(
        "k",
        F.when(F.col("cnt") >= 3, F.lit("VIP")).otherwise(F.col("seg")).alias(
            "seg"
        ),
        "bal",
    )
    merged = scd2_merge(
        dim, updates, "k", ["seg", "bal"], as_of="1995-07-01"
    )
    return (
        merged.groupBy("is_current", "seg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_sum"),
            F.date_format(F.min("effective_from"), "yyyy-MM-dd").alias(
                "min_from"
            ),
            F.date_format(F.max("effective_from"), "yyyy-MM-dd").alias(
                "max_from"
            ),
            F.date_format(F.min("effective_to"), "yyyy-MM-dd").alias(
                "min_to"
            ),
            F.round(F.sum("bal"), 2).alias("bal_sum"),
        )
        .orderBy("is_current", "seg")
    )


_DATAPREP_ORACLE = """
WITH feats AS (
    SELECT doc_id, text,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           round(len(regexp_extract_all(text, '[^\\w\\s]'))
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(len(regexp_extract_all(text, '[0-9]'))
                 / greatest(length(text), 1), 4) AS digit_ratio,
           round(len(regexp_extract_all(lower(text),
                 '\\b(the|and|of|to|a|in|is|that)\\b'))
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                 4) AS stopword_ratio
    FROM documents
), scored AS (
    SELECT doc_id, text,
           round(0.25 * least(n_tokens / 100.0, 1.0)
               + 0.25 * (1.0 - least(punct_ratio * 5, 1.0))
               + 0.25 * (1.0 - least(digit_ratio * 5, 1.0))
               + 0.25 * least(stopword_ratio * 4, 1.0), 4) AS quality_score
    FROM feats
), kept AS (
    SELECT doc_id, text, quality_score FROM scored WHERE quality_score >= 0.3
), keepers AS (
    SELECT MIN(doc_id) AS doc_id
    FROM kept
    GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
), docs AS (
    SELECT doc_id,
           string_split_regex(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct([
               array_to_string(words[i:i+2], ' ')
               for i in range(1, len(words) - 1)
           ]) AS shingles
    FROM docs
    WHERE len(words) >= 3
), sig AS (
    SELECT doc_id,
           [list_min([
               ('0x' || substr(md5(h || ':' || s), 18, 15))::BIGINT
               for s in shingles
           ]) for h in range(0, 8)] AS sig
    FROM sh
), bands AS (
    SELECT doc_id, b,
           md5(array_to_string(
               [CAST(x AS VARCHAR) for x in sig[b*2+1:b*2+2]], ',')) AS band_hash
    FROM sig, (SELECT unnest(range(0, 4)) AS b)
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
), near_dup AS (
    SELECT p.id_a, p.id_b
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    WHERE round(len([i for i in range(1, 9) if sa.sig[i] = sb.sig[i]]) / 8.0,
                4) >= 0.25
), losers AS (
    SELECT DISTINCT id_b AS doc_id FROM near_dup
)
SELECT k.doc_id, s.quality_score
FROM keepers k
JOIN kept s ON s.doc_id = k.doc_id
WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY k.doc_id
"""


@query("dataprep_corpus", oracle=_DATAPREP_ORACLE)
def dataprep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep flagship: quality filter → exact
    dedup (keep-first) → MinHash-LSH near-dup removal (portable md5
    family, pairs computed over the full table), one declarative plan."""
    from high_throughput_etl_pipeline_spark.plans.dataprep import prepare_corpus

    d = _t(spark, sf_dir, "documents")
    pairs = dedup_minhash_md5(spark, sf_dir).select("id_a", "id_b")
    survivors = prepare_corpus(d, min_quality=0.3, near_dup_pairs=pairs)
    return survivors.select("doc_id", "quality_score").orderBy("doc_id")


@query(
    "dataprep_training_batches",
    oracle="""
    WITH feats AS (
        SELECT doc_id, source, n_chars, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(len(regexp_extract_all(text, '[^\\w\\s]'))
                     / greatest(length(text), 1), 4) AS punct_ratio,
               round(len(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1), 4) AS digit_ratio,
               round(len(regexp_extract_all(lower(text),
                     '\\b(the|and|of|to|a|in|is|that)\\b'))
                     / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                     4) AS stopword_ratio
        FROM documents
    ), scored AS (
        SELECT doc_id, source, n_chars, text,
               round(0.25 * least(n_tokens / 100.0, 1.0)
                   + 0.25 * (1.0 - least(punct_ratio * 5, 1.0))
                   + 0.25 * (1.0 - least(digit_ratio * 5, 1.0))
                   + 0.25 * least(stopword_ratio * 4, 1.0), 4) AS quality_score
        FROM feats
    ), filtered AS (
        SELECT * FROM scored WHERE quality_score >= 0.3
    ), ranked AS (
        SELECT doc_id, source, text,
               row_number() OVER (
                   PARTITION BY md5(array_to_string(
                       (string_split_regex(
                           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                           ' '))[1:8], ' '))
                   ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM filtered
    ), kept AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+') AS words
        FROM ranked WHERE rn = 1 AND len(trim(text)) > 0
    ), sized AS (
        SELECT doc_id, source, words, len(words) AS n_tok,
               CAST(1 + ceil(greatest(len(words) - 40, 0) / 30.0) AS INT)
                   AS n_chunks
        FROM kept
    ), chunks AS (
        SELECT doc_id, source, k,
               len(words[k*30+1 : least(k*30+40, n_tok)]) AS chunk_tokens
        FROM sized, LATERAL (SELECT unnest(range(0, n_chunks)) AS k)
    ), bucketed AS (
        SELECT source, chunk_tokens,
               CAST(floor(coalesce(SUM(chunk_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 256.0) AS BIGINT) AS bucket
        FROM chunks
    ), packs AS (
        SELECT source, chunk_tokens,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY source ORDER BY bucket
               ) - 1 AS BIGINT) AS pack_id
        FROM bucketed
    )
    SELECT source, pack_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(chunk_tokens) AS BIGINT) AS pack_tokens
    FROM packs
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
)
def dataprep_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-batch pipeline, one declarative plan:
    quality filter → canonical keep-best (truncation-tolerant prefix
    fingerprint) → overlapping token-window chunking (40/30) →
    256-token context packing per source.  Every stage is an existing
    operator; Catalyst plans the whole DAG with no materialization
    barrier.  The oracle replays all four stages as one CTE chain —
    value-for-value across ~4 windows and 2 aggregations."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        chunk_documents,
        pack_token_budget,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        quality_features,
    )

    d = _t(spark, sf_dir, "documents")
    scored = quality_features(d).filter(F.col("quality_score") >= 0.3)
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    ranked = scored.withColumn(
        "_fp", F.md5(F.concat_ws(" ", F.slice(words, 1, 8)))
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("_fp").orderBy(
                F.desc("n_chars"), F.col("doc_id")
            )
        ),
    )
    kept = ranked.filter(F.col("rn") == 1).select("doc_id", "source", "text")
    chunks = chunk_documents(kept, chunk_tokens=40, stride=30).join(
        kept.select("doc_id", "source"), on="doc_id"
    )
    packed = pack_token_budget(
        # composite struct key: a scalar doc_id*K + chunk_id encoding
        # collides once a document yields >= K chunks, silently corrupting
        # pack order for exactly the long documents 100 TB corpora contain;
        # struct ordering is field-wise (doc_id, then chunk_id), collision-free
        chunks.withColumn(
            "chunk_key", F.struct(F.col("doc_id"), F.col("chunk_id"))
        ),
        budget=256,
        part_col="source",
        id_col="chunk_key",
        text_col="chunk_text",
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("_tokens").cast("bigint").alias("pack_tokens"),
        )
        .orderBy("source", "pack_id")
    )


@query(
    "purchase_attribution_asof",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS viewed_ts,
           CASE WHEN v.ts IS NULL THEN NULL
                ELSE CAST(floor(epoch(p.ts)) AS BIGINT)
                     - CAST(floor(epoch(v.ts)) AS BIGINT) END AS gap_seconds
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY event_id
    """,
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark lacks, composed union+window): each
    purchase attributed to the user's most recent prior view.  Checked
    against DuckDB's NATIVE ASOF JOIN — independent implementations,
    identical semantics."""
    from high_throughput_etl_pipeline_spark.operators.asof import (
        asof_join_backward,
    )

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_backward(p, v, on=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("viewed_ts"),
        F.when(
            F.col("asof_ts").isNull(), F.lit(None).cast("bigint")
        ).otherwise(
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
        ).alias("gap_seconds"),
    ).orderBy("event_id")


@query(
    "next_view_after_purchase",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ), v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS next_view_ts,
           CASE WHEN v.ts IS NULL THEN NULL
                ELSE CAST(floor(epoch(v.ts)) AS BIGINT)
                     - CAST(floor(epoch(p.ts)) AS BIGINT) END AS gap_seconds
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    ORDER BY event_id
    """,
)
def next_view_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's EARLIEST
    view at-or-after it (post-purchase browse).  Same union-window
    technique as the backward form with the frame reversed; checked
    against DuckDB's native forward ASOF (``p.ts <= v.ts``)."""
    from high_throughput_etl_pipeline_spark.operators.asof import (
        asof_join_forward,
    )

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_forward(p, v, on=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("next_view_ts"),
        F.when(
            F.col("asof_ts").isNull(), F.lit(None).cast("bigint")
        ).otherwise(
            F.unix_timestamp("asof_ts") - F.unix_timestamp("ts")
        ).alias("gap_seconds"),
    ).orderBy("event_id")


@query(
    "error_context_rangejoin",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), a AS (
        SELECT user_id, ts FROM events WHERE event_type <> 'error'
    )
    SELECT e.event_id, e.user_id,
           COUNT(a.ts) AS nearby_events
    FROM e
    JOIN a ON a.user_id = e.user_id
          AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
                  - CAST(floor(epoch(a.ts)) AS BIGINT)) <= 300
    GROUP BY e.event_id, e.user_id
    ORDER BY e.event_id
    """,
)
def error_context_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: for each error event, count the same user's
    other events within ±5 minutes.  The bin trick turns a nested-loop
    time-window join into an equi-join on (user, bin) — the oracle is the
    plain inequality join DuckDB can afford at this scale."""
    from high_throughput_etl_pipeline_spark.operators.rangejoin import (
        events_within_window,
    )

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    activity = ev.filter(F.col("event_type") != "error").select("user_id", "ts")
    pairs = events_within_window(
        errors, activity, on=["user_id"], window_seconds=300
    )
    return (
        pairs.groupBy("event_id", "user_id")
        .agg(F.count("*").alias("nearby_events"))
        .orderBy("event_id")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive predicates that must ALL reach the
    parquet scan (range on date, band on discount, bound on quantity) —
    the pushdown stress test."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@query(
    "q17_small_quantity_parts",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT round(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: join against a per-key aggregate of the same
    table (the scalar-subquery pattern rewritten as an explicit
    aggregate+join — Catalyst's own decorrelation strategy)."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(part_avg, on="l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Data layout (Z-order / Morton clustering for file-skipping at 100 TB)
# ---------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits/dim × 2 dims = 16-bit z-value; bucket = top 4 bits


def _zorder_oracle_sql(bits: int = _Z_BITS) -> str:
    """Generate the DuckDB twin of the Morton interleave: bit b of dim i
    lands at position b*2+i.  Built programmatically so the bit terms
    are identical to the Spark expression by construction."""
    top = 1 << bits
    terms = " + ".join(
        f"((({dim} >> {b}) & 1) << {b * 2 + i})"
        for b in range(bits)
        for i, dim in enumerate(("nu", "nv"))
    )
    return f"""
    WITH r AS (
        SELECT min(user_id) AS umin, max(user_id) AS umax,
               min(value)   AS vmin, max(value)   AS vmax
        FROM events
    ), norm AS (
        SELECT user_id, value,
               least(CAST(floor(
                   CASE WHEN umax > umin
                        THEN (CAST(user_id AS DOUBLE) - umin)
                             / CAST(umax - umin AS DOUBLE)
                        ELSE 0.0 END * {top}.0) AS BIGINT), {top - 1}) AS nu,
               least(CAST(floor(
                   CASE WHEN vmax > vmin
                        THEN (value - vmin) / CAST(vmax - vmin AS DOUBLE)
                        ELSE 0.0 END * {top}.0) AS BIGINT), {top - 1}) AS nv
        FROM events, r
    ), z AS (
        SELECT user_id, value, {terms} AS zval
        FROM norm
    )
    SELECT (zval >> {2 * bits - 4}) AS zbucket,
           COUNT(*)                          AS n_events,
           CAST(MIN(user_id) AS BIGINT)      AS min_user,
           CAST(MAX(user_id) AS BIGINT)      AS max_user,
           round(MIN(value), 6)              AS min_value,
           round(MAX(value), 6)              AS max_value
    FROM z
    GROUP BY zbucket
    ORDER BY zbucket
    """


@query("events_zorder_buckets", oracle=_zorder_oracle_sql())
def events_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout algebra, value-checked: normalize (user_id, value)
    to 8-bit grids, Morton-interleave, bucket by the top 4 z-bits, and
    profile each bucket's dim ranges.  Each z-bucket covers a compact
    hyper-rectangle of the (user, value) space — the per-bucket min/max
    spans ARE the parquet footer stats a z-ordered write produces, i.e.
    the file-skipping this layout buys (``operators/layout.py:
    zorder_write`` is the writing twin; its locality is asserted in
    tests/test_layout.py).  One metadata agg (4 scalars) + one grouped
    agg — no sort, no window."""
    from high_throughput_etl_pipeline_spark.operators.layout import zvalue

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    z = zvalue(ev, ["user_id", "value"], bits=_Z_BITS, out_col="_z")
    return (
        z.groupBy(
            F.shiftrightunsigned(F.col("_z"), 2 * _Z_BITS - 4).alias("zbucket")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# Mergeable sketches (approximate distinct / quantiles at 100 TB)
# ---------------------------------------------------------------------------


@query(
    "events_distinct_sketch",
    oracle="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS date,
               COUNT(DISTINCT user_id)  AS exact_keys,
               COUNT(*)                 AS n_rows
        FROM events GROUP BY 1
    ), total AS (
        SELECT 'ALL' AS date,
               COUNT(DISTINCT user_id) AS exact_keys,
               COUNT(*)                AS n_rows
        FROM events
    )
    SELECT date, exact_keys, n_rows, TRUE AS within_tol
    FROM (SELECT * FROM daily UNION ALL SELECT * FROM total)
    ORDER BY date
    """,
)
def events_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per day + an ALL row merged FROM
    the daily sketches (never re-reading rows) — the pre-aggregated-
    sketch rollup that replaces exact COUNT(DISTINCT) at 100 TB.

    Value-checked at the driver gate via tolerance binding: the output
    carries only engine-portable values (exact counts) plus
    ``within_tol`` = |estimate − exact| <= 5% · exact, so the oracle
    computes the exact side and expects TRUE — a drifting estimate
    flips the boolean and fails the hash (same pattern as
    ``events_freq_sketch``).  tests/test_sketches.py additionally pins
    the merge identity (union-of-days == whole-table sketch)."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        distinct_rollup_verified,
    )

    ev = _t(spark, sf_dir, "events")
    return distinct_rollup_verified(ev, "user_id", "ts").orderBy("date")


@query(
    "events_quantile_sketch",
    oracle="""
    WITH per_grp AS (
        SELECT event_type AS grp, FALSE AS is_merged, COUNT(*) AS n_rows
        FROM events GROUP BY 1
    ), total AS (
        SELECT 'ALL' AS grp, TRUE AS is_merged, COUNT(*) AS n_rows
        FROM events
    )
    SELECT grp, is_merged, n_rows,
           TRUE AS r50_ok, TRUE AS r90_ok, TRUE AS r99_ok
    FROM (SELECT * FROM per_grp UNION ALL SELECT * FROM total)
    ORDER BY grp
    """,
)
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches of event value per type + merged ALL row —
    bounded-size percentile summaries that merge across partitions/days
    (an exact percentile is a sort; this is a KB summary with provable
    rank error).

    Value-checked via rank binding: each returned quantile value v
    collapses to ``rQ_ok`` = v sits within 5% of normalized rank Q in
    the real data (two-sided count(< v)/count(<= v) form, exact under
    ties).  The oracle computes group sizes and expects every boolean
    TRUE, so a sketch regression fails the hash even though the
    estimates themselves are engine-specific."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        quantile_ranks_verified,
    )

    ev = _t(spark, sf_dir, "events")
    return quantile_ranks_verified(ev, "value", "event_type").orderBy("grp")


@query(
    "events_segment_overlap",
    oracle="""
    WITH d AS (
        SELECT DISTINCT event_type AS seg, user_id FROM events
    ), seg AS (
        SELECT seg, COUNT(*) AS exact FROM d GROUP BY seg
    ), pair AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b, COUNT(*) AS exact_intersect
        FROM d a JOIN d b ON a.user_id = b.user_id AND a.seg < b.seg
        GROUP BY 1, 2
    )
    SELECT sa.seg AS seg_a, sb.seg AS seg_b,
           sa.exact AS exact_a, sb.exact AS exact_b,
           COALESCE(p.exact_intersect, 0) AS exact_intersect,
           sa.exact + sb.exact - COALESCE(p.exact_intersect, 0)
               AS exact_union,
           TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
    FROM seg sa JOIN seg sb ON sa.seg < sb.seg
    LEFT JOIN pair p ON p.seg_a = sa.seg AND p.seg_b = sb.seg
    ORDER BY seg_a, seg_b
    """,
)
def events_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch audience overlap: distinct-user intersection/union/
    difference between every event-type pair, from ONE sketch per
    segment — the set algebra HLL cannot do (union-only), replacing a
    distinct self-join per pair at 100 TB.

    Value-checked via tolerance binding: exact pair overlaps (portable
    SQL over distinct (user, segment) rows) ride along and every
    estimate collapses to ``|est − exact| <= 5% · exact_union`` — the
    union-normalized bound the theta-sketch error contract actually
    guarantees.  The oracle recomputes the exact side and expects every
    boolean TRUE."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        segment_overlap_verified,
    )

    ev = _t(spark, sf_dir, "events")
    return segment_overlap_verified(ev, "user_id", "event_type").orderBy(
        "seg_a", "seg_b"
    )


# ---------------------------------------------------------------------------
# Retrieval (BM25 / hybrid RRF), entity resolution, privacy audits
# ---------------------------------------------------------------------------

# BM25 parameterization shared between the Spark plan and the oracle:
# term order fixes the float summation order, so scores are
# bit-reproducible engine-to-engine before the 6 dp round.
_BM25_TERMS = ["vector", "hash", "merge"]


def _bm25_oracle() -> str:
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_sql,
    )

    return f"""
    WITH {bm25_sql(_BM25_TERMS)}
    SELECT doc_id, dl, score, rank FROM (
        SELECT doc_id, dl, score,
               CAST(row_number() OVER (
                   ORDER BY score DESC, doc_id
               ) AS INT) AS rank
        FROM bm25
    ) WHERE rank <= 10
    ORDER BY rank
    """


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed query-term set.  Map-side
    tf (no inverted index, no explode), ONE single-row corpus-stats
    aggregate broadcast back over the scan, TakeOrdered top-k — the
    lexical half of a hybrid retrieval stack at warehouse scale."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_scores,
    )

    d = _t(spark, sf_dir, "documents")
    scored = bm25_scores(d, _BM25_TERMS)
    return (
        take_top_k(scored, [F.desc("score"), F.col("doc_id")], 10)
        .select("doc_id", "dl", "score", "rank")
        .orderBy("rank")
    )


def _hybrid_rrf_oracle() -> str:
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_sql,
    )

    return f"""
    WITH {bm25_sql(_BM25_TERMS)},
    lex AS (
        SELECT doc_id, row_number() OVER (
            ORDER BY score DESC, doc_id
        ) AS rank
        FROM bm25 QUALIFY rank <= 20
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT vec_id AS doc_id, row_number() OVER (
            ORDER BY round(list_dot_product(ev, qv)
                / (sqrt(list_dot_product(ev, ev))
                   * sqrt(list_dot_product(qv, qv))), 6) DESC, vec_id
        ) AS rank
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
              WHERE vec_id <> 0) CROSS JOIN q
        QUALIFY rank <= 20
    ),
    contrib AS (
        SELECT doc_id, 1.0 / (60 + rank) AS c FROM lex
        UNION ALL
        SELECT doc_id, 1.0 / (60 + rank) FROM dense
    )
    SELECT doc_id, rrf_score, n_lists FROM (
        SELECT doc_id, round(sum(c), 6) AS rrf_score,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM contrib GROUP BY doc_id
    )
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """


@query("hybrid_rrf_topk", oracle=_hybrid_rrf_oracle())
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 + exact-cosine dense top-20
    (query = vector 0), fused by reciprocal-rank fusion (k=60).  The
    fusion is ONE union + groupBy over narrow (id, rank) rows — rank
    lists fuse without an outer-join ladder however many retrievers
    contribute."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_scores,
        rrf_fuse,
    )

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    lex = take_top_k(
        bm25_scores(d, _BM25_TERMS),
        [F.desc("score"), F.col("doc_id")],
        20,
    ).select("doc_id", "rank")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (
            F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(_dot(F.col("qv"), F.col("qv")))
        ),
        6,
    )
    dense = take_top_k(
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine")),
        [F.desc("cosine"), F.col("doc_id")],
        20,
    ).select("doc_id", "rank")
    return (
        rrf_fuse([lex, dense], k=60, id_col="doc_id")
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


@query(
    "customer_fuzzy_match",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def customer_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on the customer dimension: nation-blocked
    Levenshtein matching (edit distance ≤ 1) served by
    deletion-neighborhood candidates (SymSpell identity: distance-≤1
    pairs always share a single-deletion variant, so the candidate join
    is an equi-join on variant hashes — near-linear, never block²; one
    codegen levenshtein per candidate removes the distance-2 false
    positives).  Engine-portable distance function, so the whole match
    is hash-checkable against the oracle's plain quadratic spec."""
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fuzzy_matches_neighborhood,
    )

    c = _t(spark, sf_dir, "customer")
    return (
        fuzzy_matches_neighborhood(
            c,
            block_cols=["c_nationkey"],
            id_col="c_custkey",
            name_col="c_name",
        )
        .withColumn("edit_distance", F.col("edit_distance").cast("int"))
        .orderBy("id_a", "id_b")
    )


@query(
    "events_k_anonymity",
    oracle="""
    SELECT event_type, hr, value_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           count(*) < 5 AS at_risk,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive
    FROM (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(floor(value / 100) AS INT) AS value_bucket,
               user_id
        FROM events
    )
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    ORDER BY event_type, hr, value_bucket
    """,
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the events release under quasi-identifiers
    (event_type, hour, value-bucket): every group below k=5 rows, with
    the l-diversity statistic (distinct users) alongside.  One grouped
    aggregation — the audit costs what a rollup costs at any scale, and
    the at-risk filter keeps the report small."""
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        k_anonymity_audit,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.floor(F.col("value") / 100).cast("int").alias("value_bucket"),
        "user_id",
    )
    return (
        k_anonymity_audit(
            ev,
            ["event_type", "hr", "value_bucket"],
            k=5,
            sensitive_col="user_id",
        )
        .filter(F.col("at_risk"))
        .orderBy("event_type", "hr", "value_bucket")
    )


@query(
    "events_anonymity_report",
    oracle="""
    WITH g AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(floor(value / 100) AS INT) AS value_bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               count(*) < 5 AS at_risk,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive
        FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(min(n_rows) AS BIGINT) AS k_min,
           CAST(sum(CASE WHEN at_risk THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
           CAST(sum(CASE WHEN at_risk THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_below_k,
           CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_l
    FROM g
    """,
)
def events_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate summary: the k-anonymity of the WHOLE events release
    (k_min = smallest QI group), how many groups/rows fall below k=5,
    and how many groups fail l-diversity (< 2 distinct users) — the
    one-row verdict a pipeline checks before publishing a table."""
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        anonymity_report,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.floor(F.col("value") / 100).cast("int").alias("value_bucket"),
        "user_id",
    )
    return anonymity_report(
        ev,
        ["event_type", "hr", "value_bucket"],
        k=5,
        sensitive_col="user_id",
        l=2,
    )


@query(
    "embedding_hard_negatives",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), a AS (
        SELECT vec_id AS anchor_id, label AS anchor_label, e AS qv
        FROM v WHERE vec_id < 8
    ), scored AS (
        SELECT anchor_id, anchor_label,
               v.vec_id AS negative_id, v.label AS negative_label,
               round(list_dot_product(v.e, qv)
                     / (sqrt(list_dot_product(v.e, v.e))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cosine
        FROM v JOIN a ON v.label <> a.anchor_label
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label, cosine,
           rank
    FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY cosine DESC, negative_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 3
    ORDER BY anchor_id, rank
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the 3
    most-similar DIFFERENT-label vectors (the highest-loss negatives a
    triplet/InfoNCE batch can use).  Broadcast anchors, one scan,
    label-mismatch filter before the ranking window."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        hard_negatives,
    )

    e = _t(spark, sf_dir, "embeddings")
    return hard_negatives(
        e, e.filter(F.col("vec_id") < 8), k=3
    ).orderBy("anchor_id", "rank")


@query(
    "embedding_knn_label_eval",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, label AS true_label, e AS qv
        FROM v WHERE vec_id < 100
    ), nn AS (
        SELECT query_id, true_label, v.label AS n_label
        FROM v JOIN q ON v.vec_id <> q.query_id
        QUALIFY row_number() OVER (
            PARTITION BY query_id
            ORDER BY round(list_dot_product(v.e, qv)
                     / (sqrt(list_dot_product(v.e, v.e))
                        * sqrt(list_dot_product(qv, qv))), 6) DESC,
                     v.vec_id
        ) <= 5
    ), votes AS (
        SELECT query_id, true_label, n_label,
               CAST(count(*) AS BIGINT) AS votes
        FROM nn GROUP BY 1, 2, 3
    ), pred AS (
        SELECT query_id, true_label, n_label AS predicted_label
        FROM votes
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY votes DESC, n_label
        ) = 1
    )
    SELECT true_label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN predicted_label = true_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN predicted_label = true_label
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS accuracy
    FROM pred GROUP BY 1 ORDER BY 1
    """,
)
def embedding_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: does geometric neighborhood recover the
    label?  5-NN majority vote (self excluded, ties toward the smaller
    label) for the first 100 vectors, accuracy per true label.  The
    eval every embedding pipeline should run before ANN-serving a new
    encoder."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        knn_label_vote,
    )

    e = _t(spark, sf_dir, "embeddings")
    pred = knn_label_vote(e, e.filter(F.col("vec_id") < 100), k=5)
    correct = F.when(
        F.col("predicted_label") == F.col("true_label"), 1
    ).otherwise(0)
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(correct).cast("bigint").alias("n_correct"),
            F.round(
                F.sum(correct).cast("double") / F.count(F.lit(1)), 4
            ).alias("accuracy"),
        )
        .orderBy("true_label")
    )


@query(
    "corpus_weighted_sample",
    oracle="""
    SELECT source, doc_id, n_chars, sample_rank FROM (
        SELECT source, doc_id, n_chars,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY -ln(
                       (('0x' || substr(md5(doc_id::VARCHAR), 18, 15))::BIGINT
                        + 1) / 1152921504606846976.0
                   ) / CAST(n_chars AS DOUBLE) ASC, doc_id
               ) AS INT) AS sample_rank
        FROM documents WHERE n_chars > 0
    ) WHERE sample_rank <= 5
    ORDER BY source, sample_rank
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: 5 docs per source, probability
    proportional to length (Efraimidis-Spirakis exponential keys over
    portable hash-derived uniforms) — reproducible weight-proportional
    sampling with no RNG state; any engine replays the identical
    draw."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        weighted_sample,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        weighted_sample(d, ["source"], "doc_id", "n_chars", n=5)
        .select("source", "doc_id", "n_chars", "sample_rank")
        .orderBy("source", "sample_rank")
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT * FROM (
        SELECT 'unique(o_orderkey)' AS "check",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                    AS BIGINT) AS n_violations,
               count(o_orderkey) - count(DISTINCT o_orderkey) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'not_null(o_custkey)', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'positive(o_totalprice)', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'accepted_values(o_orderstatus)', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                         THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                   THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'in_range(l_quantity,1,50)', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                   THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'in_range(l_discount,0,0.06)', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.06
                         THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN l_discount < 0 OR l_discount > 0.06
                   THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'ref_integrity(l_orderkey->o_orderkey)',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     WHERE l.l_orderkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               (SELECT count(*) FROM lineitem l
                WHERE l.l_orderkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) = 0
    ) ORDER BY "check"
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate check suite (Deequ-style): key uniqueness, null
    rates, value domains, enumerations and referential integrity as ONE
    verdict table.  All single-table checks share one aggregation pass
    per table (each contributes an aggregate expression); only the FK
    check pays a join (left-anti, broadcast-sized parent keys).  The
    two deliberately tight rules (status in {O,F}, discount <= 0.06)
    exercise the failing path — a gate that can never fail verifies
    nothing."""
    from high_throughput_etl_pipeline_spark.operators.quality import (
        accepted_values,
        check_ref_integrity,
        in_range,
        not_null,
        positive,
        run_checks,
        unique,
    )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    report = (
        run_checks(
            o,
            [
                unique("o_orderkey"),
                not_null("o_custkey"),
                positive("o_totalprice"),
                accepted_values("o_orderstatus", ["O", "F"]),
            ],
        )
        .unionByName(
            run_checks(
                li,
                [
                    in_range("l_quantity", 1, 50),
                    in_range("l_discount", 0, 0.06),
                ],
            )
        )
        .unionByName(
            check_ref_integrity(li, o, "l_orderkey", "o_orderkey")
        )
    )
    return report.orderBy("check")


@query(
    "customer_snapshot_diff",
    oracle="""
    WITH nw AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 13 = 0 THEN 'DRIFTED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 97 <> 0
        UNION ALL
        SELECT c_custkey + 10000000, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 211 = 0
    ), d AS (
        SELECT o.c_custkey AS ko, nw.c_custkey AS kn,
               (o.c_custkey IS NOT NULL AND nw.c_custkey IS NOT NULL
                AND NOT (o.c_acctbal IS NOT DISTINCT FROM nw.c_acctbal))
                   AS chg_bal,
               (o.c_custkey IS NOT NULL AND nw.c_custkey IS NOT NULL
                AND NOT (o.c_mktsegment IS NOT DISTINCT FROM
                         nw.c_mktsegment)) AS chg_seg,
               (o.c_custkey IS NOT NULL AND nw.c_custkey IS NOT NULL
                AND NOT (o.c_nationkey IS NOT DISTINCT FROM
                         nw.c_nationkey)) AS chg_nat
        FROM customer o FULL OUTER JOIN nw ON o.c_custkey = nw.c_custkey
    )
    SELECT metric, n_rows FROM (
        SELECT 'added' AS metric,
               CAST(sum(CASE WHEN ko IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rows FROM d
        UNION ALL
        SELECT 'removed',
               CAST(sum(CASE WHEN kn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM d
        UNION ALL
        SELECT 'changed',
               CAST(sum(CASE WHEN chg_bal OR chg_seg OR chg_nat
                         THEN 1 ELSE 0 END) AS BIGINT) FROM d
        UNION ALL
        SELECT 'unchanged',
               CAST(sum(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                             AND NOT (chg_bal OR chg_seg OR chg_nat)
                         THEN 1 ELSE 0 END) AS BIGINT) FROM d
        UNION ALL
        SELECT 'changed:c_acctbal',
               CAST(sum(CASE WHEN chg_bal THEN 1 ELSE 0 END) AS BIGINT)
        FROM d
        UNION ALL
        SELECT 'changed:c_mktsegment',
               CAST(sum(CASE WHEN chg_seg THEN 1 ELSE 0 END) AS BIGINT)
        FROM d
        UNION ALL
        SELECT 'changed:c_nationkey',
               CAST(sum(CASE WHEN chg_nat THEN 1 ELSE 0 END) AS BIGINT)
        FROM d
    ) ORDER BY metric
    """,
)
def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot regression audit: diff today's customer dimension
    against yesterday's (simulated deterministically: ~1% of keys
    removed, balances bumped on keys % 7, segments drifted on keys
    % 13, ~0.5% new keys) — per-status counts plus per-column change
    counts from ONE full-outer join and ONE aggregation pass.  The
    publish gate a pipeline runs before overwriting a dimension."""
    from high_throughput_etl_pipeline_spark.operators.merge import (
        diff_summary,
        snapshot_diff,
    )

    old = _t(spark, sf_dir, "customer")
    base = old.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit("DRIFTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    added = old.filter(F.col("c_custkey") % 211 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    new = base.unionByName(added)
    cmp_cols = ["c_acctbal", "c_mktsegment", "c_nationkey"]
    d = snapshot_diff(old, new, ["c_custkey"], cmp_cols)
    return diff_summary(d, cmp_cols).orderBy("metric")


@query(
    "audio_window_grid",
    oracle="""
    WITH a AS (
        SELECT doc_id AS media_id,
               CAST(n_chars AS INT) AS dur,
               16000 AS rate,
               CASE WHEN n_chars < 40 THEN 1
                    ELSE least(CAST(floor((n_chars - 40) / 20.0) AS INT)
                               + 1, 8)
               END AS n_windows
        FROM documents
    )
    SELECT media_id,
           CAST(w AS INT) AS window_index,
           CAST(w * 20 AS INT) AS start_ms,
           CAST(least(w * 20 + 40, dur) AS INT) AS end_ms,
           CAST(w * 20 * rate / 1000 AS BIGINT) AS start_sample,
           CAST(least(w * 20 + 40, dur) * rate / 1000 AS BIGINT)
               AS end_sample,
           n_windows
    FROM a, unnest(range(n_windows)) AS t(w)
    ORDER BY media_id, window_index
    """,
)
def audio_window_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing grid (40 ms windows, 20 ms hop, 16 kHz): the
    offsets every speech-feature stage consumes, computed entirely from
    typed metadata with JVM-side explode — binary never leaves the
    payload column, decode stays behind the Arrow stub boundary."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        audio_windows,
        make_audio_table,
    )

    d = _t(spark, sf_dir, "documents")
    return audio_windows(
        make_audio_table(d), win_ms=40, hop_ms=20, max_windows=8
    ).orderBy("media_id", "window_index")


def _maxsim_oracle(n_sub: int = 4, sub_dim: int = 16) -> str:
    def sl(col: str, i: int) -> str:
        return f"list_slice({col}, {i * sub_dim + 1}, {(i + 1) * sub_dim})"

    def cos(i: int, j: int) -> str:
        qs, ds = sl("qe", i), sl("e", j)
        return (
            f"list_dot_product({qs}, {ds})"
            f" / (sqrt(list_dot_product({qs}, {qs}))"
            f" * sqrt(list_dot_product({ds}, {ds})))"
        )

    score = " + ".join(
        "greatest(" + ", ".join(cos(i, j) for j in range(n_sub)) + ")"
        for i in range(n_sub)
    )
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 3
    ), scored AS (
        SELECT q.query_id, v.vec_id,
               round({score}, 6) AS maxsim
        FROM v CROSS JOIN q
    )
    SELECT query_id, vec_id, maxsim, rank FROM (
        SELECT query_id, vec_id, maxsim,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY maxsim DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("maxsim_multivector_topk", oracle=_maxsim_oracle())
def maxsim_multivector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim): each side's
    embedding viewed as 4 x 16-d token vectors, score = per-query-token
    best document-token cosine, summed.  Broadcast queries, map-side
    subvector split + norms, constant-size nested-HOF interaction,
    per-query top-5."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        maxsim_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return maxsim_topk(e, q, k=5, n_sub=4, dim=64).select(
        "query_id", "vec_id", "maxsim", "rank"
    ).orderBy("query_id", "rank")


def _maxsim_ann_oracle(n_sub: int = 4, sub_dim: int = 16) -> str:
    def sl(col: str, i: int) -> str:
        return f"list_slice({col}, {i * sub_dim + 1}, {(i + 1) * sub_dim})"

    def cos(i: int, j: int) -> str:
        qs, ds = sl("qv", i), sl("ev", j)
        return (
            f"list_dot_product({qs}, {ds})"
            f" / (sqrt(list_dot_product({qs}, {qs}))"
            f" * sqrt(list_dot_product({ds}, {ds})))"
        )

    score = " + ".join(
        "greatest(" + ", ".join(cos(i, j) for j in range(n_sub)) + ")"
        for i in range(n_sub)
    )
    assign = """row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn"""
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), c AS (
        SELECT CAST(vec_id AS INT) AS list_id, ev AS center
        FROM v WHERE vec_id < 8
    ), vd AS (
        SELECT v.vec_id, v.ev, c.list_id, {assign}
        FROM v CROSS JOIN c
    ), va AS (
        SELECT vec_id, ev, list_id FROM vd WHERE rn = 1
    ), qd AS (
        SELECT v.vec_id AS query_id, v.ev AS qv, c.list_id, {assign}
        FROM v CROSS JOIN c WHERE v.vec_id < 3
    ), qp AS (
        SELECT query_id, qv, list_id FROM qd WHERE rn <= 4
    ), scored AS (
        SELECT qp.query_id, va.vec_id,
               round({score}, 6) AS maxsim
        FROM va JOIN qp ON va.list_id = qp.list_id
    )
    SELECT query_id, vec_id, maxsim, rank FROM (
        SELECT query_id, vec_id, maxsim,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY maxsim DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("maxsim_ann_rerank", oracle=_maxsim_ann_oracle())
def maxsim_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage late-interaction serving (ColBERTv2/PLAID shape): an
    IVF coarse quantizer (FROZEN first-8-vectors centers, nprobe=4 —
    same frozen-quantizer trick as ann_ivf_topk) prunes the corpus to
    the queries' probe lists, then the exact 4×16 MaxSim interaction
    re-ranks only the survivors.  maxsim_multivector_topk stays the
    full-scan eval oracle; THIS is the serving path — at 100 TB it
    scores ~nprobe/nlist of the corpus, and maxsim_ann_indexed turns
    the probe filter into partition pruning at the scan.  Every stage
    (assignment argmin, probe selection, interaction, ranking) is
    engine-portable and value-checked."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        maxsim_ann_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    centers = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").cast("array<double>").alias("center"),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        maxsim_ann_topk(e, q, centers, k=5, n_sub=4, dim=64, nprobe=4)
        .select("query_id", "vec_id", "maxsim", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY 1
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_date,
               CAST(e.ts AS DATE) AS activity_date
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
           CAST(date_diff('day', cohort_date, activity_date) AS INT)
               AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY cohort_date, date_diff('day', cohort_date, activity_date)
    ORDER BY cohort_date, day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen date, distinct
    actives per (cohort, day offset) — the classic product-analytics
    rollup.  Two grouped passes (first-seen, then cohort×offset distinct
    count) and one broadcast-sized join on the per-user firsts; no
    windows, no self-join of the event log against itself."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("activity_date")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min("activity_date").alias("cohort_date")
    )
    return (
        ev.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff("activity_date", "cohort_date").alias("day_offset"),
        )
        .distinct()
        .groupBy(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            F.col("day_offset").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


# ---------------------------------------------------------------------------
# Registry ordering.  The round driver's correctness gate records the FIRST
# 50 entries of ``queries()``; HEADLINE curates that window so every operator
# family (SURVEY.md §2 + the LLM-data-pipeline extensions) gets a
# driver-verified row each round.  Redundant TPC-H shapes and fast-path /
# rows-only variants live in the extended tail — still registered, still
# oracle-checked by ``tools/check_correctness.py``, just after row 50.
# ---------------------------------------------------------------------------

@query(
    "weekly_revenue_growth",
    oracle="""
    WITH w AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS VARCHAR) AS week,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT week, revenue, n_orders,
           round(lag(revenue) OVER (ORDER BY week), 2) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (ORDER BY week) IS NULL THEN NULL
                ELSE round((revenue - lag(revenue) OVER (ORDER BY week))
                           / lag(revenue) OVER (ORDER BY week) * 100, 4)
           END AS growth_pct
    FROM w ORDER BY week
    """,
)
def weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: aggregate first (weeks are
    metadata-scale — tens of rows per year), THEN lag over the tiny
    aggregate.  The unpartitioned window is safe exactly because it
    runs after the reduction; the repo's ranking machinery exists for
    the cases where it would not be."""
    o = _t(spark, sf_dir, "orders")
    w = (
        o.groupBy(
            F.date_trunc("week", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("week")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    win = Window.orderBy("week")
    prev = F.lag("revenue").over(win)
    return (
        w.withColumn("prev_revenue", F.round(prev, 2))
        .withColumn(
            "growth_pct",
            F.when(prev.isNull(), F.lit(None)).otherwise(
                F.round((F.col("revenue") - prev) / prev * 100, 4)
            ),
        )
        .orderBy("week")
    )


@query(
    "events_outlier_audit",
    oracle="""
    WITH f AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           round(f.q1, 4) AS q1,
           round(f.q3, 4) AS q3,
           round(f.q1 - 1.5 * (f.q3 - f.q1), 4) AS lo_fence,
           round(f.q3 + 1.5 * (f.q3 - f.q1), 4) AS hi_fence,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                          OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN f USING (event_type)
    GROUP BY e.event_type, f.q1, f.q3
    ORDER BY e.event_type
    """,
)
def events_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection (Tukey fences): per event type, exact
    quartiles -> IQR fences -> count of values outside them.  One tiny
    per-group percentile aggregate broadcast back over the scan (the
    same shape as the winsorization operator); swap approx_percentile
    in when groups carry billions of rows."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("_q1"),
        F.expr("percentile(value, 0.75)").alias("_q3"),
    )
    lo = F.col("_q1") - 1.5 * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + 1.5 * (F.col("_q3") - F.col("_q1"))
    return (
        ev.join(F.broadcast(f), on="event_type")
        .groupBy(
            "event_type",
            F.round("_q1", 4).alias("q1"),
            F.round("_q3", 4).alias("q3"),
            F.round(lo, 4).alias("lo_fence"),
            F.round(hi, 4).alias("hi_fence"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                ((F.col("value") < lo) | (F.col("value") > hi)).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_cdc_apply",
    oracle="""
    WITH base AS (
        SELECT * FROM orders WHERE o_orderkey % 10 < 8
    ), ins AS (
        SELECT *, 1 AS seq, 'I' AS op FROM orders WHERE o_orderkey % 10 >= 8
    ), upd AS (
        SELECT * REPLACE (o_totalprice * 1.1 AS o_totalprice),
               2 AS seq, 'U' AS op
        FROM orders WHERE o_orderkey % 3 = 0
    ), del AS (
        SELECT *, 3 AS seq, 'D' AS op FROM orders WHERE o_orderkey % 7 = 0
    ), cdc_log AS (
        SELECT * FROM ins UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM del
    ), latest AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_orderkey ORDER BY seq DESC, op DESC
            ) AS rn FROM cdc_log
        ) WHERE rn = 1
    ), applied AS (
        SELECT b.* FROM base b
        LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
        WHERE l.o_orderkey IS NULL
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM latest WHERE op <> 'D'
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 / 100.0, 2) AS total_price
    FROM applied GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC application (operators/cdc.py): fold a deterministic
    Debezium-style I/U/D change log (synthesized from orders itself —
    late inserts, 10% price updates, deletes, with overlapping keys so
    real I→U→D chains exercise latest-op-wins) into a base snapshot.
    One window collapses the log per key, one anti-join + union applies
    it — both shuffles on the merge key only.  Summary rollup keeps the
    checked output compact; the oracle replays the identical MERGE
    semantics as plain SQL."""
    from high_throughput_etl_pipeline_spark.operators.cdc import apply_cdc

    o = _t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = o.filter(key % 10 < 8)
    ins = o.filter(key % 10 >= 8).withColumns(
        {"seq": F.lit(1), "op": F.lit("I")}
    )
    upd = (
        o.filter(key % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumns({"seq": F.lit(2), "op": F.lit("U")})
    )
    dels = o.filter(key % 7 == 0).withColumns(
        {"seq": F.lit(3), "op": F.lit("D")}
    )
    log = ins.unionByName(upd).unionByName(dels)
    snap = apply_cdc(base, log, ["o_orderkey"], "seq", "op")
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
            # sum exact integer cents, not doubles: float summation is
            # order-dependent and engines reduce in different orders —
            # the per-row cent rounding is deterministic on both sides
            F.round(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "events_dp_release",
    oracle="""
    SELECT event_type, hr, round(
        COUNT(*) + (
            (-1.0 * sign(u)) * ln(1.0 - 2.0 * abs(u))
        ), 6) AS noisy_count
    FROM (
        SELECT event_type, hr,
               (('0x' || substr(md5(concat_ws('|', 'dp-v1', 'release-0',
                    event_type,
                    CAST(hr AS VARCHAR))), 18, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0 - 0.5 AS u
        FROM (
            SELECT event_type, CAST(hour(ts) AS INT) AS hr FROM events
        )
    )
    GROUP BY event_type, hr, u
    ORDER BY event_type, hr
    """,
)
def events_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release (ε=1 Laplace
    mechanism) of event counts per (type, hour) — the privacy family's
    publication side: k-anonymity AUDITS a release, this one PRODUCES
    one.  Noise comes from a keyed PRF (portable md5 arithmetic →
    inverse-CDF Laplace), the reproducible-release pattern — no driver
    RNG, identical draws on every engine, so the whole release is
    value-checked even though it is noise."""
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hr")
    )
    return dp_noisy_counts(
        ev, ["event_type", "hr"], epsilon=1.0
    ).orderBy("event_type", "hr")


@query(
    "corpus_length_match_sample",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               least(9, CAST(floor(length(text) / 200) AS INT)) AS b
        FROM documents WHERE source = 'src0'
    ), r AS (
        SELECT least(9, CAST(floor(length(text) / 200) AS INT)) AS b
        FROM documents WHERE source = 'src1'
    ), sn AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS sn FROM s GROUP BY b
    ), rn AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS rn FROM r GROUP BY b
    ), st AS (SELECT CAST(SUM(sn) AS BIGINT) AS st FROM sn),
    rt AS (SELECT CAST(SUM(rn) AS BIGINT) AS rt FROM rn),
    j AS (
        SELECT sn.b, sn.sn, rn.rn, st.st, rt.rt
        FROM sn JOIN rn USING (b) CROSS JOIN st CROSS JOIN rt
    ), c AS (
        SELECT MIN(CAST(sn * rt AS DOUBLE) / CAST(rn * st AS DOUBLE)) AS c
        FROM j
    ), rates AS (
        SELECT b, least(10000, CAST(floor(
            10000.0 * c.c
            * CAST(rn * st AS DOUBLE) / CAST(sn * rt AS DOUBLE)
        ) AS BIGINT)) AS cutoff
        FROM j CROSS JOIN c
    ), kept AS (
        SELECT s.doc_id, s.b FROM s JOIN rates USING (b)
        WHERE ('0x' || substr(md5('match-v1:' ||
                   CAST(s.doc_id AS VARCHAR)), 18, 15))::BIGINT % 10000
              < rates.cutoff
    )
    SELECT b AS length_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY b ORDER BY length_bucket
    """,
)
def corpus_length_match_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling (operators/corpus.py:
    distribution_matched_sample): reshape src0's length-bucket
    distribution to match src1's — the curation move that fits a crawl
    source to a vetted corpus' profile.  Keep rate per bucket =
    c·ref_frac/src_frac with c the largest uniform scale keeping every
    rate ≤ 1; exact-integer frequency ratios, one floating division per
    rate (same term order as the oracle), deterministic keyed-hash
    filter — two tiny grouped aggregates, one broadcast, map-side
    filter."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        distribution_matched_sample,
    )

    d = _t(spark, sf_dir, "documents")
    bucket = F.least(
        F.lit(9), F.floor(F.length("text") / 200).cast("int")
    )
    src = d.filter(F.col("source") == "src0")
    ref = d.filter(F.col("source") == "src1")
    kept = distribution_matched_sample(src, ref, bucket, id_col="doc_id")
    return (
        kept.groupBy(bucket.alias("length_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("length_bucket")
    )


@query(
    "events_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n_rows * n_rows) AS BIGINT) AS sq
        FROM counts
    ), top AS (
        SELECT CAST(row_number() OVER (
                   ORDER BY n_rows DESC, user_id
               ) AS INT) AS rank,
               user_id AS key, n_rows
        FROM counts
    )
    SELECT rank, key, n_rows,
           round(n_rows / t, 6) AS share,
           n_keys,
           round(sq / (t * t), 9) AS herfindahl
    FROM top CROSS JOIN tot
    WHERE rank <= 10 ORDER BY rank
    """,
)
def events_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostics (plans/metrics.py:key_skew_profile) for
    events.user_id as a prospective join/groupBy key: top-10 heavy
    hitters with load share plus the Herfindahl concentration index
    (Σ share² from EXACT integer sums — the expected fraction of
    pair-work landing on one key, the number that decides whether a
    self-join needs salting).  One grouped count, one metadata-scale
    aggregate, TakeOrdered top-n."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        key_skew_profile,
    )

    ev = _t(spark, sf_dir, "events")
    return key_skew_profile(ev, "user_id", top_n=10).orderBy("rank")


@query(
    "join_size_audit",
    oracle="""
    WITH ca AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS na
        FROM orders GROUP BY 1
    ), cb AS (
        SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS nb
        FROM customer GROUP BY 1
    ), ta AS (SELECT CAST(SUM(na) AS BIGINT) AS a_rows FROM ca),
    tb AS (SELECT CAST(SUM(nb) AS BIGINT) AS b_rows FROM cb),
    pairs AS (
        SELECT ca.na * cb.nb AS p FROM ca JOIN cb USING (k)
    ), agg AS (
        SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS join_rows,
               CAST(COUNT(*) AS BIGINT) AS matched_keys,
               CAST(COALESCE(MAX(p), 0) AS BIGINT) AS max_key_pairs
        FROM pairs
    )
    SELECT join_rows, matched_keys, max_key_pairs, a_rows, b_rows,
           round(join_rows / a_rows, 6) AS fanout_a
    FROM agg CROSS JOIN ta CROSS JOIN tb
    """,
)
def join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight (plans/metrics.py:join_size_estimate):
    the EXACT output size of orders ⋈ customer on custkey — Σ n_a·n_b
    over the per-key count tables — computed without materializing a
    single join row.  With key_skew_profile this is the measurement
    pair that decides broadcast/salt/pre-aggregate BEFORE a 100 TB
    join is scheduled: total output, worst single key (the straggler
    bound), and amplification."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        join_size_estimate,
    )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return join_size_estimate(
        o.select(F.col("o_custkey").alias("k")),
        c.select(F.col("c_custkey").alias("k")),
        ["k"],
    ).select(
        "join_rows",
        "matched_keys",
        "max_key_pairs",
        "a_rows",
        "b_rows",
        "fanout_a",
    )


@query(
    "doc_token_weighted_length",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, length(text) AS len,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text),
                             '[ \\t\\n\\r\\f\\x0b]+'))
                    END AS nt
        FROM documents
    ), c AS (
        SELECT source, len, nt,
               SUM(nt) OVER (
                   PARTITION BY source ORDER BY len, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               SUM(nt) OVER (PARTITION BY source) AS tot
        FROM t
    )
    SELECT source,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN cum >= 0.5 * tot THEN len END) AS INT)
               AS wq50,
           CAST(MIN(CASE WHEN cum >= 0.9 * tot THEN len END) AS INT)
               AS wq90
    FROM c GROUP BY source ORDER BY source
    """,
)
def doc_token_weighted_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted length quantiles per source (plans/metrics.py:
    weighted_quantiles): the char-length at which half (90%) of the
    TOKEN MASS sits in shorter docs — the corpus-composition statistic
    plain quantiles get wrong (a 10k-token doc weighs 100× a 100-token
    doc in a training mixture).  One ordered window per group +
    one grouped crossing read-off; integer weights keep every
    comparison exact and engine-portable."""
    from high_throughput_etl_pipeline_spark.operators.text import token_count
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        weighted_quantiles,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").cast("int").alias("len"),
        token_count(F.col("text")).cast("bigint").alias("nt"),
    )
    return (
        weighted_quantiles(
            d, "len", "nt", ["source"], quantiles=(0.5, 0.9), id_col="doc_id"
        )
        .select(
            "source",
            "total_weight",
            F.col("wq50").cast("int").alias("wq50"),
            F.col("wq90").cast("int").alias("wq90"),
        )
        .orderBy("source")
    )


@query(
    "customer_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE r AS (
        SELECT c_custkey AS id, c_custkey AS root, 0 AS depth
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, r.root, r.depth + 1
        FROM customer c
        JOIN r ON CAST(floor(c.c_custkey / 10) AS BIGINT) = r.id
        WHERE c.c_custkey >= 10
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
           round(SUM(CAST(round(c.c_acctbal * 100, 0) AS BIGINT))
                 / 100.0, 2) AS total_acctbal
    FROM r JOIN customer c ON c.c_custkey = r.id
    GROUP BY depth ORDER BY depth
    """,
)
def customer_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy closure (operators/graph.py:
    ancestor_closure): a synthetic referral forest over customers
    (parent = custkey/10, keys < 10 are roots) resolved to
    (id, root, depth) by POINTER DOUBLING — O(log depth) keyed
    self-joins where a recursive CTE walks O(depth), the org-chart /
    BOM / thread-chain workload Spark SQL cannot express natively.
    The oracle IS DuckDB's recursive CTE, so the whole closure is
    value-checked against the real recursion; rollup sums exact
    integer cents."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        ancestor_closure,
    )

    c = _t(spark, sf_dir, "customer")
    nodes = c.select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") < 10, F.lit(None).cast("bigint"))
        .otherwise(F.floor(F.col("c_custkey") / 10).cast("bigint"))
        .alias("parent"),
    )
    closure = ancestor_closure(nodes, "id", "parent")
    return (
        closure.join(
            c.select(F.col("c_custkey").alias("id"), "c_acctbal"), on="id"
        )
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.count_distinct("root").cast("bigint").alias("n_roots"),
            F.round(
                F.sum(
                    F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("total_acctbal"),
        )
        .orderBy("depth")
    )


@query(
    "text_tfidf_knn",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS t
        FROM documents
    ), tf AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 18, 15))::BIGINT % 256 AS b,
               CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok WHERE t <> '' GROUP BY doc_id, b
    ), dfreq AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY b
    ), nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), vals AS (
        SELECT tf.doc_id, tf.b,
               tf.tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS v
        FROM tf JOIN dfreq USING (b) CROSS JOIN nd
    ), norms AS (
        SELECT doc_id, sqrt(list_sum(list(v * v ORDER BY b))) AS nrm
        FROM vals GROUP BY doc_id
    ), qv AS (
        SELECT b, v AS qv FROM vals WHERE doc_id = 0
    ), qn AS (
        SELECT nrm AS qnrm FROM norms WHERE doc_id = 0
    ), scored AS (
        SELECT a.doc_id,
               round(list_sum(list(a.v * qv.qv ORDER BY a.b))
                     / (n.nrm * qn.qnrm), 6) AS cosine
        FROM vals a
        JOIN qv ON a.b = qv.b
        JOIN norms n ON n.doc_id = a.doc_id
        CROSS JOIN qn
        WHERE a.doc_id <> 0
        GROUP BY a.doc_id, n.nrm, qn.qnrm
    )
    SELECT doc_id, cosine, rank FROM (
        SELECT doc_id, cosine,
               CAST(row_number() OVER (
                   ORDER BY cosine DESC, doc_id
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY rank
    """,
)
def text_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical k-NN over hashed TF-IDF vectors (operators/text.py:
    hashed_tfidf — the HashingTF/IDF trick): doc 0's 10 nearest
    documents by cosine, no embedding model, no vocabulary broadcast —
    token→md5-bucket arithmetic an independent engine reproduces
    exactly.  Engine parity rides on exact-zero addition: the Spark
    side's dense ascending-index sums equal the oracle's sparse
    bucket-ordered sums bit-for-bit because the missing buckets
    contribute exact 0.0 terms; norms ride as plain columns (the
    IVF/MaxSim scoring shape) so nothing re-normalizes per element.
    Zero-overlap docs (cosine 0, i.e. no shared bucket — tf-idf
    components are strictly positive) are excluded on both sides."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_tfidf,
    )

    d = _t(spark, sf_dir, "documents")
    v = hashed_tfidf(d, dim=256)
    q = v.filter(F.col("doc_id") == 0).select(
        F.col("tfidf").alias("_qv"), F.col("l2_norm").alias("_qn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("tfidf"), F.col("_qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        v.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            dot.alias("_dot"),
            (F.col("l2_norm") * F.col("_qn")).alias("_nn"),
        )
        .filter(F.col("_dot") > 0)
        .select(
            "doc_id", F.round(F.col("_dot") / F.col("_nn"), 6).alias("cosine")
        )
    )
    return take_top_k(
        scored, [F.desc("cosine"), F.col("doc_id")], 10
    ).orderBy("rank")


_SPLIT_BUCKET = (
    "('0x' || substr(md5('split-v1:' || CAST({col} AS VARCHAR)), 18, 15))"
    "::BIGINT % 10000"
)


@query(
    "corpus_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {{pairs_cte}},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node),
    assigned AS (
        SELECT doc.doc_id,
               COALESCE(cc.cluster_id, doc.doc_id) AS cluster_id
        FROM documents doc LEFT JOIN cc ON cc.node = doc.doc_id
    ),
    labeled AS (
        SELECT doc_id, cluster_id,
               CASE WHEN {_SPLIT_BUCKET.format(col='cluster_id')} < 8000
                        THEN 'train'
                    WHEN {_SPLIT_BUCKET.format(col='cluster_id')} < 9000
                        THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN {_SPLIT_BUCKET.format(col='doc_id')} < 8000
                        THEN 'train'
                    WHEN {_SPLIT_BUCKET.format(col='doc_id')} < 9000
                        THEN 'val'
                    ELSE 'test' END AS naive_split
        FROM assigned
    ),
    straddle AS (
        SELECT CAST(SUM(CASE WHEN ss > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS leaked_clusters,
               CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS naive_leaked_clusters
        FROM (
            SELECT cluster_id,
                   COUNT(DISTINCT split) AS ss,
                   COUNT(DISTINCT naive_split) AS ns
            FROM labeled GROUP BY cluster_id
        )
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           leaked_clusters, naive_leaked_clusters
    FROM labeled CROSS JOIN straddle
    GROUP BY split, leaked_clusters, naive_leaked_clusters
    ORDER BY split
    """.replace("{pairs_cte}", _JACCARD_MINHASH_PAIRS_CTE),
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (operators/corpus.py:
    leakage_safe_split): near-dup clusters (MinHash-banded pairs →
    connected components, singletons their own cluster) inherit ONE
    split atomically — a naive per-document hash split leaks
    near-duplicates across train and eval, and the output PROVES the
    difference: ``leaked_clusters`` (clusters straddling splits) is 0
    under cluster assignment while ``naive_leaked_clusters`` counts how
    many the per-doc split would have torn apart, from the SAME hash
    family.  The oracle replays banding, a recursive-CTE closure, and
    both assignments value-for-value."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        leakage_safe_split,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    )
    assigned = leakage_safe_split(
        d, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    naive_bucket = F.pmod(
        md5_64(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))),
        F.lit(10_000),
    )
    naive = F.when(naive_bucket < 8000, "train").when(
        naive_bucket < 9000, "val"
    ).otherwise("test")
    j = assigned.withColumn("naive_split", naive)
    per_cluster = j.groupBy("cluster_id").agg(
        F.count_distinct("split").alias("_ss"),
        F.count_distinct("naive_split").alias("_ns"),
    )
    straddle = per_cluster.agg(
        F.sum((F.col("_ss") > 1).cast("int"))
        .cast("bigint")
        .alias("leaked_clusters"),
        F.sum((F.col("_ns") > 1).cast("int"))
        .cast("bigint")
        .alias("naive_leaked_clusters"),
    )
    return (
        j.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
        .orderBy("split")
    )


@query(
    "events_forward_fill",
    oracle="""
    WITH filled AS (
        SELECT user_id,
               last_value(
                   CASE WHEN event_type = 'purchase' THEN value END
                   IGNORE NULLS
               ) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS lpv
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN lpv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_filled,
           CAST(SUM(CASE WHEN lpv IS NULL THEN 0
                    ELSE CAST(round(lpv * 100, 0) AS BIGINT) END) AS BIGINT)
               AS filled_cents
    FROM filled GROUP BY user_id ORDER BY user_id
    """,
)
def events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF — last observation carried forward): every
    event carries the user's most recent purchase value, the standard
    gap-filling move for sparse observations over a dense timeline
    (sensor readings, prices, feature snapshots).  One ordered window
    per user with ``last(..., ignorenulls=True)`` — the IGNORE NULLS
    frame semantics — deterministic ties by (ts, event_id); the rollup
    sums exact integer cents so the check is order-independent across
    engines."""
    ev = _t(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("_lpv"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("_lpv").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_filled"),
            F.sum(
                F.when(
                    F.col("_lpv").isNull(), F.lit(0).cast("bigint")
                ).otherwise(
                    F.round(F.col("_lpv") * 100, 0).cast("bigint")
                )
            )
            .cast("bigint")
            .alias("filled_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "events_session_window_native",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(prev_ts)) AS BIGINT) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ), ids AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM ids
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN ``session_window``
    aggregation — the engine-native form of user_sessions' manual
    lag/cumsum plan (one grouped pass, merge-able session state; the
    same operator drives streaming session aggregation with
    watermarks).  Boundary semantics differ from the manual variant and
    are pinned here: the built-in closes a session when the gap is
    REACHED (an event exactly 30 min after the last starts a NEW
    session; its window end = last event + gap), so the oracle flags
    ``>= 1800`` where user_sessions' uses ``> 1800``.  Exact-cents sum
    keeps the rollup order-independent across engines."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("_w"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            "user_id",
            F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("_w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "value_cents",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "user_funnel_chained",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s0 AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND e.ts > s0.t0
        GROUP BY e.user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        GROUP BY e.user_id
    )
    SELECT u.user_id,
           strftime(s0.t0, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(CASE WHEN s2.t2 IS NOT NULL THEN 3
                     WHEN s1.t1 IS NOT NULL THEN 2
                     WHEN s0.t0 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS steps_completed,
           (s2.t2 IS NOT NULL
            AND CAST(floor(epoch(s2.t2)) AS BIGINT)
                - CAST(floor(epoch(s0.t0)) AS BIGINT) <= 86400)
               AS converted,
           CASE WHEN s2.t2 IS NOT NULL
                 AND CAST(floor(epoch(s2.t2)) AS BIGINT)
                     - CAST(floor(epoch(s0.t0)) AS BIGINT) <= 86400
                THEN CAST(floor(epoch(s2.t2)) AS BIGINT)
                     - CAST(floor(epoch(s0.t0)) AS BIGINT)
           END AS seconds_to_convert
    FROM u LEFT JOIN s0 ON u.user_id = s0.user_id
           LEFT JOIN s1 ON u.user_id = s1.user_id
           LEFT JOIN s2 ON u.user_id = s2.user_id
    ORDER BY u.user_id
    """,
)
def user_funnel_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-first-occurrence funnel (view → click → purchase, 24 h
    conversion window): each stage binds to the EARLIEST event of its
    type strictly after the previously bound stage — strictly stronger
    than the first-touch funnel (user_funnel_conversion), and computed
    in ONE grouped pass (sorted-array fold, operators/sequence.py)
    where the naive form is a scan + join per stage.  The oracle
    replays the walk as nested chained-MIN subqueries."""
    from high_throughput_etl_pipeline_spark.operators.sequence import (
        funnel_walk,
    )

    e = _t(spark, sf_dir, "events")
    w = funnel_walk(
        e, ["view", "click", "purchase"], within_seconds=86400
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return w.select(
        "user_id",
        F.date_format("t_0", fmt).alias("view_ts"),
        F.date_format("t_1", fmt).alias("click_ts"),
        F.date_format("t_2", fmt).alias("purchase_ts"),
        "steps_completed",
        "converted",
        "seconds_to_convert",
    ).orderBy("user_id")


@query(
    "user_event_patterns",
    oracle="""
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    WHEN 'error' THEN 'e' END AS ch
        FROM events
    ), seqs AS (
        SELECT user_id,
               string_agg(ch, '' ORDER BY ts, event_id) AS seq
        FROM coded WHERE ch IS NOT NULL GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vp')) AS INT)
               AS n_direct_convert,
           CAST(len(regexp_extract_all(seq, 'ee+')) AS INT)
               AS n_error_bursts,
           CAST(len(regexp_extract_all(seq, 'v+c')) AS INT)
               AS n_view_runs_clicked
    FROM seqs ORDER BY user_id
    """,
)
def user_event_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex CEP over per-user event-type strings: each user's history
    collapses to one chronologically ordered character string (tie
    broken by event_id — REQUIRED for engine-stable sequences), then
    any regular expression is a pattern query.  Counted here:
    immediate view→purchase adjacency, error bursts (runs ≥ 2), and
    view-runs ending in a click — the product-analytics questions a
    fixed funnel cannot ask.  One shuffle; patterns evaluate map-side
    (operators/sequence.py:event_type_patterns)."""
    from high_throughput_etl_pipeline_spark.operators.sequence import (
        event_type_patterns,
    )

    e = _t(spark, sf_dir, "events")
    return event_type_patterns(
        e,
        alphabet={
            "view": "v",
            "click": "c",
            "purchase": "p",
            "signup": "s",
            "error": "e",
        },
        patterns={
            "direct_convert": "vp",
            "error_bursts": "ee+",
            "view_runs_clicked": "v+c",
        },
        tie_col="event_id",
    ).orderBy("user_id")


def _pagerank_oracle(iters: int = 8) -> str:
    """Unrolled integer-PageRank replay: recursive CTEs cannot
    aggregate over the recursive relation, so the fixed iteration
    count unrolls as chained CTEs — each round is the same integer
    update the Spark loop applies (bigint sums are order-independent,
    so the replay is bit-exact)."""
    parts = [
        """
    WITH pairs AS (
        SELECT DISTINCT l_suppkey * 2 AS s, l_partkey * 2 + 1 AS p
        FROM lineitem
    ), edges AS (
        SELECT s AS src, p AS dst FROM pairs
        UNION ALL
        SELECT p AS src, s AS dst FROM pairs
    ), nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT id, 1000000000000 // n AS rank FROM nodes CROSS JOIN cnt
    )"""
    ]
    for k in range(iters):
        parts.append(
            f""",
    c{k} AS (
        SELECT e.dst AS id, SUM(r.rank // d.outdeg) AS c
        FROM r{k} r JOIN deg d ON r.id = d.id
        JOIN edges e ON e.src = r.id
        GROUP BY e.dst
    ), r{k + 1} AS (
        SELECT nodes.id,
               (15 * (1000000000000 // cnt.n)) // 100
                   + (85 * COALESCE(c.c, 0)) // 100 AS rank
        FROM nodes LEFT JOIN c{k} c ON nodes.id = c.id CROSS JOIN cnt
    )"""
        )
    parts.append(
        f"""
    SELECT CASE WHEN id % 2 = 0 THEN 'supplier' ELSE 'part' END
               AS node_kind,
           CAST(id // 2 AS BIGINT) AS entity_id,
           CAST(rank AS BIGINT) AS rank_units,
           CAST(row_number() OVER (ORDER BY rank DESC, id) AS INT)
               AS pos
    FROM r{iters} QUALIFY pos <= 20 ORDER BY pos
    """
    )
    return "".join(parts)


@query("supplier_part_pagerank", oracle=_pagerank_oracle())
def supplier_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected supplier↔part co-supply graph
    (distinct lineitem pairs, both directions), 8 power-method rounds
    in EXACT bigint arithmetic (operators/graph.py:pagerank_int) — an
    iterative graph metric that is still hash-checkable because every
    update is integer and therefore order-independent.  Top-20 nodes
    by rank via distributed TakeOrdered."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        pagerank_int,
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("s"),
        (F.col("l_partkey") * 2 + 1).alias("p"),
    ).distinct()
    edges = pairs.select(
        F.col("s").alias("src"), F.col("p").alias("dst")
    ).unionAll(
        pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    ranks = pagerank_int(edges, iterations=8)
    top = take_top_k(
        ranks, [F.desc("rank"), F.col("id")], 20, rank_col="pos"
    )
    return top.select(
        F.when(F.col("id") % 2 == 0, F.lit("supplier"))
        .otherwise(F.lit("part"))
        .alias("node_kind"),
        F.expr("id div 2").alias("entity_id"),
        F.col("rank").alias("rank_units"),
        "pos",
    ).orderBy("pos")


@query(
    "ann_hamming_topk",
    oracle="""
    WITH sig AS (
        SELECT vec_id,
               list_sum(list_transform(range(1, 33), i ->
                   CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 1))
                        ELSE 0::BIGINT END)) AS w0,
               list_sum(list_transform(range(33, 65), i ->
                   CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 33))
                        ELSE 0::BIGINT END)) AS w1
        FROM embeddings
    ), q AS (SELECT w0 AS q0, w1 AS q1 FROM sig WHERE vec_id = 0),
    scored AS (
        SELECT s.vec_id,
               CAST(bit_count(xor(s.w0, q.q0))
                    + bit_count(xor(s.w1, q.q1)) AS INT) AS hamming
        FROM sig s CROSS JOIN q WHERE s.vec_id <> 0
    )
    SELECT vec_id, hamming, rank FROM (
        SELECT vec_id, hamming,
               CAST(row_number() OVER (ORDER BY hamming, vec_id) AS INT)
                   AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY rank
    """,
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding retrieval: sign-quantize 64-dim floats into two
    32-bit-packed bigint words (32× memory cut), rank by Hamming
    distance — integer XOR+popcount end to end, hence bit-reproducible
    across engines with no float-summation caveats
    (operators/similarity.py:binary_signatures/hamming_topk).  Vector 0
    is the query; the coarse stage of a binary-then-float-rerank
    serving stack."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        hamming_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    # query_id is the REAL vec_id column, not a literal: a folded
    # constant would erase the window's partition spec and funnel every
    # scored vector through one rank task (the r7 top-k anti-pattern)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = hamming_topk(
        e.filter(F.col("vec_id") != 0), q, k=10, dim=64
    )
    return got.select("vec_id", "hamming", "rank").orderBy("rank")


@query(
    "events_value_trend",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM q GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * 86400.0 / 100.0, 6) END AS slope_per_xunit,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6)
           END AS intercept,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS corr_r
    FROM s ORDER BY event_type
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares value trend (slope per DAY in currency
    units, intercept, Pearson r) fitted from exact integer sufficient
    statistics — epoch seconds × cents accumulate as decimal(38,0), so
    an engine-portable hash binds a REGRESSION, which float summation
    could never do (plans/metrics.py:grouped_trend).  One grouped
    pass; fitting a million per-key trend lines costs one rollup."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        grouped_trend,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("long").alias("x"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    return grouped_trend(
        e, "x", "y", ["event_type"], x_per_unit=86_400, y_per_unit=100
    ).orderBy("event_type")


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ), dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(MAX(d.med), 4) AS median,
           round(MAX(a.mad), 4) AS mad,
           CAST(SUM(CASE WHEN d.adev * 0.6745 > 3.5 * a.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(SUM(CASE WHEN d.adev * 0.6745 > 3.5 * a.mad
                    THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS BIGINT) * 100, 6) AS outlier_pct
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust anomaly audit per event type (modified
    z-score, Iglewicz-Hoaglin) — the 50%-breakdown-point sibling of
    the IQR fences in events_outlier_audit: contamination cannot drag
    its own detection threshold.  Two rollup-cost percentile passes
    broadcast back; the flag comparison is arranged as two products so
    zero-MAD groups behave and engines replay it exactly
    (plans/metrics.py:robust_outlier_profile)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        robust_outlier_profile,
    )

    ev = _t(spark, sf_dir, "events")
    return robust_outlier_profile(ev, "value", "event_type").orderBy(
        "event_type"
    )


@query(
    "corpus_reservoir_sample",
    oracle="""
    SELECT source, pos, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substr(md5('res-v1|'
                       || CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT,
                       doc_id
               ) AS INT) AS pos
        FROM documents
    ) WHERE pos <= 5
    ORDER BY source, pos
    """,
)
def corpus_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source document sample (keyed-hash ranking —
    the reproducible reservoir): stable under reruns and partitioning,
    replayable by any engine.  The pos <= k filter rides Spark's
    WindowGroupLimit pushdown, so tasks keep k-row heaps per group
    instead of sorting whole groups
    (operators/corpus.py:reservoir_per_group)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        reservoir_per_group,
    )

    d = _t(spark, sf_dir, "documents")
    return (
        reservoir_per_group(d, ["source"], k=5)
        .select("source", "pos", "doc_id", "n_chars")
        .orderBy("source", "pos")
    )


@query(
    "events_twap",
    oracle="""
    WITH q AS (
        SELECT event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS t,
               CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ), d AS (
        SELECT event_type, v,
               COALESCE(lead(t) OVER (
                   PARTITION BY event_type ORDER BY t, event_id
               ) - t, 0) AS dt
        FROM q
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_readings,
           CAST(SUM(dt) AS BIGINT) AS covered_seconds,
           CASE WHEN SUM(dt) > 0 THEN
               round(CAST(SUM(CAST(v AS HUGEINT) * dt) AS DOUBLE)
                     / CAST(SUM(dt) AS DOUBLE) / 100.0, 6)
           END AS time_weighted
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP / metering
    semantics): each reading holds until the next (LOCF step
    function), so a value that held an hour outweighs one that held a
    second — what the plain AVG silently gets wrong on irregular
    series.  Cents × integer seconds accumulate exactly
    (operators/timeseries.py:time_weighted_avg); event_id pins
    equal-second order on both engines."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("ts").cast("long").alias("t"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    return time_weighted_avg(
        e, "t", "v", ["event_type"], tie_cols=["event_id"]
    ).orderBy("event_type")


@query(
    "events_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT CAST(ts AS DATE) AS date,
               CAST(floor(epoch(ts)) AS BIGINT) AS t_open,
               least(CAST(floor(epoch(ts)) AS BIGINT) + 300,
                     CAST(floor(epoch(CAST(CAST(ts AS DATE) AS TIMESTAMP)
                         + INTERVAL 1 DAY)) AS BIGINT)) AS t_close
        FROM events
    ), pts AS (
        SELECT date, t_open AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT date, t_close AS t, -1 AS delta FROM iv
    ), swept AS (
        SELECT date, t,
               SUM(delta) OVER (
                   PARTITION BY date ORDER BY t, delta
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM pts
    )
    SELECT date,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(MAX(cum) AS INT) AS peak_concurrency,
           strftime(CAST(to_timestamp(
                        max_by(t, cum * 1000000000000 - t))
                        AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS peak_at
    FROM swept GROUP BY date ORDER BY date
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous activity per day: every event opens a 5-minute
    half-open interval, a per-day sweep line (endpoint deltas + ordered
    prefix sum) finds the maximum overlap and the earliest instant it
    is reached — the capacity-planning number a row count cannot give.
    Close-before-open ordering at equal timestamps means back-to-back
    intervals never double-count; day-clipping keeps the window
    per-day-parallel (operators/timeseries.py:daily_peak_concurrency)."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        daily_peak_concurrency,
    )

    ev = _t(spark, sf_dir, "events")
    out = daily_peak_concurrency(ev, "ts", duration_seconds=300)
    return out.select(
        F.col("date").cast("string").alias("date"),
        "n_intervals",
        "peak_concurrency",
        F.date_format("peak_at", "yyyy-MM-dd HH:mm:ss").alias("peak_at"),
    ).orderBy("date")


def _neardup_triangles_oracle() -> str:
    return f"""
    WITH {_embedding_neardup_cte()},
    e AS (SELECT id_a AS a, id_b AS b FROM pairs),
    deg AS (
        SELECT v, COUNT(*) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b FROM e
        ) GROUP BY v
    ), counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
               CAST(SUM(CAST(d AS HUGEINT) * (d - 1) / 2) AS HUGEINT)
                   AS wedges
        FROM deg
    ), tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n_nodes, n_edges,
           CAST(wedges AS BIGINT) AS n_wedges, n_triangles,
           CASE WHEN wedges > 0 THEN
               round(3.0 * CAST(n_triangles AS DOUBLE)
                     / CAST(wedges AS DOUBLE), 6)
           END AS global_clustering
    FROM counts CROSS JOIN tri
    """


@query("embedding_neardup_triangles", oracle=_neardup_triangles_oracle())
def embedding_neardup_triangles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triangle census of the embedding near-dup similarity graph —
    triangle density is the cohesion signal that separates tight
    duplicate cliques from chains of borderline matches (a high
    clustering coefficient says near-dup clusters are real duplicate
    groups, not LSH accidents).  Exact count via degree-ordered
    orientation (operators/graph.py:triangle_stats — each triangle
    enumerated once from its minimum-(degree,id) vertex, wedge work
    bounded by Σ out-deg² = O(m^1.5)); the similarity graph is sparse
    by construction (bounded LSH buckets), the graph family's standing
    requirement.  Oracle replays the shared plane-literal pair spec
    plus the naive one-orientation triangle join (same count)."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    e = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_duplicates(
        e,
        threshold=_ND_THRESHOLD,
        n_tables=_ND_TABLES,
        bits_per_table=None,
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return triangle_stats(pairs)


@query(
    "events_value_drift",
    oracle="""
    WITH ref AS (SELECT value FROM events WHERE day(ts) <= 15),
    cur AS (SELECT value FROM events WHERE day(ts) > 15),
    edges AS (
        SELECT quantile_cont(value,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
        FROM ref
    ),
    rb AS (
        SELECT CAST(list_sum(list_transform(e.e, x ->
                   CASE WHEN value > x THEN 1 ELSE 0 END)) AS INT)
                   AS bucket,
               COUNT(*) AS nr
        FROM ref CROSS JOIN edges e GROUP BY 1
    ),
    cb AS (
        SELECT CAST(list_sum(list_transform(e.e, x ->
                   CASE WHEN value > x THEN 1 ELSE 0 END)) AS INT)
                   AS bucket,
               COUNT(*) AS nc
        FROM cur CROSS JOIN edges e GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT SUM(nr) FROM rb) AS tr,
               (SELECT SUM(nc) FROM cb) AS tc
    ),
    terms AS (
        SELECT COALESCE(rb.bucket, cb.bucket) AS bucket,
               greatest(COALESCE(nr, 0) / tr, 1e-6) AS p,
               greatest(COALESCE(nc, 0) / tc, 1e-6) AS q
        FROM rb FULL JOIN cb ON rb.bucket = cb.bucket CROSS JOIN tot
    ),
    t2 AS (SELECT bucket, (p - q) * ln(p / q) AS term,
                  abs(p - q) > 0.02 AS shifted
           FROM terms)
    SELECT (SELECT CAST(tr AS BIGINT) FROM tot) AS n_ref,
           (SELECT CAST(tc AS BIGINT) FROM tot) AS n_cur,
           round(list_sum(list(term ORDER BY bucket)), 6) AS psi,
           (SELECT CAST(bucket AS INT) FROM t2
            ORDER BY term DESC, bucket LIMIT 1) AS worst_bucket,
           round(MAX(term), 6) AS worst_contrib,
           CAST(SUM(CASE WHEN shifted THEN 1 ELSE 0 END) AS INT)
               AS n_shifted_buckets
    FROM t2
    """,
)
def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event value distribution,
    first half of the month (reference) vs second half (current):
    reference equi-depth deciles, both sides bucketed by a broadcast
    edge-list fold, PSI terms summed IN BUCKET ORDER from a sorted
    array (float addition is not associative — an unordered SUM
    breaks engine parity in the last ulp).  The drift gate every
    production feature pipeline runs before retraining
    (plans/metrics.py:population_stability)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        population_stability,
    )

    ev = _t(spark, sf_dir, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15).select("value")
    cur = ev.filter(F.dayofmonth("ts") > 15).select("value")
    return population_stability(ref, cur, "value")


@query(
    "events_ab_conversion",
    oracle="""
    WITH units AS (
        SELECT user_id, user_id % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ), g AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM units GROUP BY variant
    )
    SELECT variant, n_units, n_converted,
           round(p, 6) AS rate,
           round((p + (1.96 * 1.96) / (2 * n)) / (1.0 + (1.96 * 1.96) / n)
                 - 1.96 * sqrt(p * (1.0 - p) / n
                               + (1.96 * 1.96) / (4 * n * n))
                   / (1.0 + (1.96 * 1.96) / n), 6) AS wilson_lo,
           round((p + (1.96 * 1.96) / (2 * n)) / (1.0 + (1.96 * 1.96) / n)
                 + 1.96 * sqrt(p * (1.0 - p) / n
                               + (1.96 * 1.96) / (4 * n * n))
                   / (1.0 + (1.96 * 1.96) / n), 6) AS wilson_hi
    FROM (SELECT variant, n_units, n_converted,
                 CAST(n_units AS DOUBLE) AS n,
                 CAST(n_converted AS DOUBLE) / CAST(n_units AS DOUBLE)
                     AS p
          FROM g)
    ORDER BY variant
    """,
)
def events_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per-variant (user_id parity) purchase
    conversion with Wilson 95% intervals.  Units are USERS, not events
    (one grouped pass collapses each user to a converted flag first —
    per-event rates double-count active users, the classic A/B bug);
    the interval is closed-form arithmetic on exact integer counts, so
    even the confidence bounds hash-match across engines
    (plans/metrics.py:conversion_rates_wilson)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        conversion_rates_wilson,
    )

    e = _t(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("_c")
    ).select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"),
        (F.col("_c") == 1).alias("converted"),
    )
    return conversion_rates_wilson(units, "variant", "converted").orderBy(
        "variant"
    )


# Fellegi-Sunter field spec shared by the Spark query and its oracle:
# (field, m = P(agree|match), u = P(agree|random)).  Weights derive
# driver-side (log2 odds, 6 dp) so both engines consume identical
# double literals.
_FS_FIELDS = [("name", 0.9, 0.01), ("segment", 0.95, 0.2), ("acctbal", 0.8, 0.05)]


def _fs_weights() -> dict[str, tuple[float, float]]:
    import math

    return {
        n: (
            round(math.log2(m / u), 6),
            round(math.log2((1 - m) / (1 - u)), 6),
        )
        for n, m, u in _FS_FIELDS
    }


def _fs_linkage_oracle() -> str:
    w = _fs_weights()
    score = " + ".join(
        f"CASE WHEN agree_{n} THEN {w[n][0]!r} ELSE {w[n][1]!r} END"
        for n, _, _ in _FS_FIELDS
    )
    return f"""
    WITH pairs AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               levenshtein(a.c_name, b.c_name) <= 1 AS agree_name,
               a.c_mktsegment = b.c_mktsegment AS agree_segment,
               abs(a.c_acctbal - b.c_acctbal) < 100 AS agree_acctbal
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    ), scored AS (
        SELECT *, round({score}, 6) AS fs_score FROM pairs
    )
    SELECT id_a, id_b, agree_name, agree_segment, agree_acctbal,
           fs_score,
           CASE WHEN fs_score >= 4.0 THEN 'match'
                WHEN fs_score <= 0.0 THEN 'nonmatch'
                ELSE 'review' END AS decision
    FROM scored
    WHERE fs_score > 0.0
    ORDER BY id_a, id_b
    """


@query("customer_fs_linkage", oracle=_fs_linkage_oracle())
def customer_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over customer pairs:
    three comparison fields (name edit distance <= 1, segment equality,
    balance proximity) contribute log-odds weights and the summed
    likelihood ratio three-way classifies each pair (1969 decision
    rule).  The oracle is the plain quadratic spec; the Spark plan is
    the SCALE shape — under these weights score > 0 iff name-agree OR
    (segment AND balance agree), so candidates come from two
    near-linear channels instead of the nation-block cross product:
    (a) SymSpell deletion-variant sharing for the name field
    (entity.fuzzy_matches_neighborhood's identity), (b) an equi-join
    on (nation, segment, balance-bin) with adjacent-bin probing for
    the numeric band (the binned-range-join trick).  Scoring is
    map-side constants over the union (operators/entity.py:
    fs_link_scores); weights are driver-computed 6-dp literals, so
    even the probabilistic scores hash-match."""
    from high_throughput_etl_pipeline_spark.operators.entity import (
        deletion_variants,
        fs_link_scores,
    )

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    # channel A: distance-<=1 name candidates via deletion variants
    variants = c.select(
        "nat",
        "id",
        F.explode(deletion_variants(F.col("name"))).alias("_var"),
    ).select("nat", "id", F.xxhash64("_var").alias("_vh"))
    ch_a = (
        variants.select("nat", "_vh", F.col("id").alias("id_a"))
        .join(
            variants.select("nat", "_vh", F.col("id").alias("id_b")),
            on=["nat", "_vh"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # channel B: (nation, segment, balance-bin) equi-join; |diff| < 100
    # implies bins differ by at most 1, so side a probes bin-1..bin+1
    binned = c.select(
        "id", "nat", "seg", "bal", F.floor(F.col("bal") / 100).alias("_b")
    )
    probe = binned.select(
        "nat",
        "seg",
        F.col("id").alias("id_a"),
        F.col("bal").alias("_ba"),
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("_b"),
    )
    ch_b = (
        probe.join(
            binned.select(
                "nat", "seg", "_b",
                F.col("id").alias("id_b"), F.col("bal").alias("_bb"),
            ),
            on=["nat", "seg", "_b"],
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_ba") - F.col("_bb")) < 100)
        )
        .select("id_a", "id_b")
    )
    cand = ch_a.unionAll(ch_b).distinct()
    attach = lambda side: c.select(
        F.col("id").alias(f"id_{side}"),
        F.col("name").alias(f"_n{side}"),
        F.col("seg").alias(f"_s{side}"),
        F.col("bal").alias(f"_b{side}"),
    )
    pairs = cand.join(attach("a"), on="id_a").join(attach("b"), on="id_b")
    fields = [
        (n, agree, m, u)
        for (n, m, u), agree in zip(
            _FS_FIELDS,
            [
                F.levenshtein(F.col("_na"), F.col("_nb")) <= 1,
                F.col("_sa") == F.col("_sb"),
                F.abs(F.col("_ba") - F.col("_bb")) < 100,
            ],
        )
    ]
    scored = fs_link_scores(pairs, fields, upper=4.0, lower=0.0)
    return (
        scored.filter(F.col("fs_score") > 0.0)
        .select(
            "id_a",
            "id_b",
            "agree_name",
            "agree_segment",
            "agree_acctbal",
            "fs_score",
            "decision",
        )
        .orderBy("id_a", "id_b")
    )



@query(
    "events_equidepth_histogram",
    oracle="""
    WITH ranked AS (
        SELECT value,
               row_number() OVER (ORDER BY value, event_id) AS rk,
               COUNT(*) OVER () AS n
        FROM events
    )
    SELECT CAST((rk - 1) * 10 // n AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(MIN(value), 6) AS lo,
           round(MAX(value), 6) AS hi
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)
def events_equidepth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth (equal-count) histogram of event values in 10
    buckets — the selectivity-estimation summary an optimizer keeps,
    where equal-WIDTH histograms collapse under skew.  Bucket ids come
    from exact global ranks via range-partition + per-partition
    row_number + prefix offsets (operators/ranking.py:global_rank —
    all-parallel, never a single-task global window); the bucket
    arithmetic ((rank−1)·k div n) is integer on both engines."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    ranked, n = global_rank(ev, [F.col("value"), F.col("event_id")])
    return (
        ranked.select(
            F.expr(f"((rank - 1) * 10) div {n}").cast("int").alias(
                "bucket"
            ),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT from_type, SUM(n) AS t FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n_transitions,
           round(CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS prob
    FROM pairs p JOIN tot t ON p.from_type = t.from_type
    ORDER BY p.from_type, p.to_type
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix between event types: per
    user, consecutive event pairs (event_id pins equal-timestamp order)
    roll into transition counts and row-normalized probabilities —
    behavioral modeling, next-event prediction baselines, and the
    anomaly question "which transitions never happen".  One partitioned
    lead window + one grouped count; probabilities are exact integer
    ratios divided once."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    wt = Window.partitionBy("from_type")
    return (
        pairs.withColumn("_t", F.sum("_n").over(wt))
        .select(
            "from_type",
            "to_type",
            F.col("_n").cast("bigint").alias("n_transitions"),
            F.round(
                F.col("_n").cast("double") / F.col("_t").cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_value_gini",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY round(value * 100, 0), event_id
               ) AS rk
        FROM events
    ), s AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(cents AS HUGEINT)) AS sx,
               SUM(CAST(rk AS HUGEINT) * cents) AS srx
        FROM v GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
               AS mean_value,
           CASE WHEN sx > 0 THEN
               round(CAST(2 * srx - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE), 6)
           END AS gini
    FROM s ORDER BY event_type
    """,
)
def events_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Gini coefficient of event value — the inequality
    statistic behind "is spend concentrated in a few whales":
    G = (2Σ i·xᵢ − (n+1)Σx) / (nΣx) over rank-ordered values.  Cents ×
    ranks accumulate as exact integers (decimal(38,0) / HUGEINT), so
    even a rank-weighted distributional statistic hash-matches; the
    rank window partitions by type (parallel across groups), with
    event_id pinning equal-value order on both engines."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(cents, "event_id")
    dec = "decimal(38,0)"
    v = e.select(
        "event_type",
        cents.alias("_c"),
        F.row_number().over(w).alias("_rk"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(F.col("_c").cast(dec)).alias("_sx"),
        F.sum(F.col("_rk").cast(dec) * F.col("_c")).alias("_srx"),
    )
    return s.select(
        "event_type",
        F.col("_n").cast("bigint").alias("n"),
        F.round(
            F.col("_sx").cast("double") / F.col("_n").cast("double") / 100.0,
            6,
        ).alias("mean_value"),
        F.when(
            F.col("_sx") > 0,
            F.round(
                (
                    F.lit(2) * F.col("_srx")
                    - (F.col("_n") + 1) * F.col("_sx")
                ).cast("double")
                / (F.col("_n") * F.col("_sx")).cast("double"),
                6,
            ),
        ).alias("gini"),
    ).orderBy("event_type")


def _label_propagation_oracle(rounds: int = 3) -> str:
    parts = [
        f"""
    WITH {_embedding_neardup_cte()},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    l0 AS (
        SELECT vec_id AS id,
               CASE WHEN vec_id % 5 = 0 THEN label END AS lbl,
               label AS true_lbl
        FROM embeddings
    )"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
    v{r} AS (
        SELECT e.d AS id, l.lbl AS vl, COUNT(*) AS c
        FROM l{r} l JOIN edges e ON e.s = l.id
        WHERE l.lbl IS NOT NULL GROUP BY 1, 2
    ), b{r} AS (
        SELECT id, max_by(vl, c * 1024 - vl) AS bl FROM v{r} GROUP BY id
    ), l{r + 1} AS (
        SELECT l.id, COALESCE(l.lbl, b.bl) AS lbl, l.true_lbl
        FROM l{r} l LEFT JOIN b{r} b ON b.id = l.id
    )"""
        )
    parts.append(
        f"""
    SELECT id AS vec_id, CAST(lbl AS INT) AS label,
           (id % 5 = 0) AS is_seed,
           CASE WHEN lbl IS NOT NULL THEN lbl = true_lbl END
               AS matches_true
    FROM l{rounds} ORDER BY vec_id
    """
    )
    return "".join(parts)


@query("embedding_label_propagation", oracle=_label_propagation_oracle())
def embedding_label_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weak supervision by sticky label propagation: a 20% labeled seed
    set (vec_id % 5) spreads through the LSH near-dup similarity graph
    for 3 rounds — each still-unlabeled vector takes the mode of its
    labeled neighbors (first reach wins, smallest-label ties), and
    ``matches_true`` scores the propagation against the held-out truth.
    Iterative, yet hash-checkable: sticky integer voting is execution-
    order-independent, so the oracle replays the rounds as unrolled
    CTEs over the same plane-literal pair spec
    (operators/graph.py:label_propagation)."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    e = _t(spark, sf_dir, "embeddings")
    seeds = e.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") % 5 == 0, F.col("label")).alias("lbl"),
    )
    pairs = embedding_near_duplicates(
        e,
        threshold=_ND_THRESHOLD,
        n_tables=_ND_TABLES,
        bits_per_table=None,
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    out = label_propagation(
        seeds, edges, rounds=3, label_col="lbl", max_label=1023
    )
    return (
        out.join(
            e.select(F.col("vec_id"), F.col("label").alias("_true")),
            on=F.col("id") == F.col("vec_id"),
        )
        .select(
            "vec_id",
            F.col("lbl").cast("int").alias("label"),
            (F.col("vec_id") % 5 == 0).alias("is_seed"),
            F.when(
                F.col("lbl").isNotNull(), F.col("lbl") == F.col("_true")
            ).alias("matches_true"),
        )
        .orderBy("vec_id")
    )


@query(
    "user_burstiness",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                     ) AS d
        FROM events
    ), s AS (
        SELECT user_id,
               CAST(COUNT(d) AS HUGEINT) AS n,
               SUM(CAST(d AS HUGEINT)) AS sd,
               SUM(CAST(d AS HUGEINT) * d) AS sdd
        FROM gaps WHERE d IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS mean_gap_s,
           CASE WHEN n > 1 THEN
               round(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE)), 6)
           END AS std_gap_s,
           CASE WHEN n > 1 AND sd > 0 THEN
               round((sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                           / CAST(n * (n - 1) AS DOUBLE))
                      - CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                     / (sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                             / CAST(n * (n - 1) AS DOUBLE))
                        + CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)), 6)
           END AS burstiness
    FROM s ORDER BY user_id
    """,
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user with the Goh-Barabási
    burstiness index B = (σ−μ)/(σ+μ): −1 = metronome, 0 = Poisson,
    →1 = bursty — the behavioral fingerprint that separates bots from
    humans and batchy sources from steady ones.  Gap sums and squares
    accumulate as exact integers (decimal(38,0)/HUGEINT), doubles only
    in the final closed form — a second-moment statistic that still
    hash-matches.  One partitioned lag window + one grouped pass."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("long")
    gaps = e.select(
        "user_id", (t - F.lag(t).over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    dec = "decimal(38,0)"
    s = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(F.col("d").cast(dec)).alias("_sd"),
        F.sum(F.col("d").cast(dec) * F.col("d")).alias("_sdd"),
    )
    n, sd, sdd = F.col("_n"), F.col("_sd"), F.col("_sdd")
    mean = sd.cast("double") / n.cast("double")
    std = F.sqrt(
        (n * sdd - sd * sd).cast("double")
        / (n * (n - 1)).cast("double")
    )
    return s.select(
        "user_id",
        n.cast("bigint").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.when(n > 1, F.round(std, 6)).alias("std_gap_s"),
        F.when(
            (n > 1) & (sd > 0),
            F.round((std - mean) / (std + mean), 6),
        ).alias("burstiness"),
    ).orderBy("user_id")


@query(
    "purchase_attribution_models",
    oracle="""
    WITH conv AS (
        SELECT event_id AS conv_id, user_id AS usr, ts AS conv_ts
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id AS usr, event_type AS channel,
               event_id AS touch_id, ts AS touch_ts
        FROM events WHERE event_type <> 'purchase'
    ), j AS (
        SELECT c.conv_id, t.channel, t.touch_id, t.touch_ts
        FROM conv c JOIN touch t ON c.usr = t.usr
         AND t.touch_ts < c.conv_ts
         AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    ), p AS (
        SELECT conv_id, channel,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts, touch_id) AS touch_pos,
               count(*) OVER (PARTITION BY conv_id) AS n_touches
        FROM j
    ), credit AS (
        SELECT channel, conv_id,
               CASE WHEN touch_pos = 1 THEN 1 ELSE 0 END AS first_touch,
               CASE WHEN touch_pos = n_touches THEN 1 ELSE 0 END AS last_touch,
               1000000 // n_touches AS linear_micros,
               CASE WHEN n_touches = 1 THEN 1000000
                    WHEN n_touches = 2 THEN 500000
                    WHEN touch_pos = 1 OR touch_pos = n_touches
                         THEN (2 * 1000000) // 5
                    ELSE (1000000 // 5) // (n_touches - 2) END
                   AS position_micros
        FROM p
    )
    SELECT channel,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS conversions_touched,
           CAST(sum(first_touch) AS BIGINT)        AS first_touch_wins,
           CAST(sum(last_touch) AS BIGINT)         AS last_touch_wins,
           CAST(sum(linear_micros) AS BIGINT)      AS linear_micros,
           CAST(sum(position_micros) AS BIGINT)    AS position_micros
    FROM credit GROUP BY channel ORDER BY channel
    """,
)
def purchase_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-model multi-touch attribution (first/last/linear/U-shaped
    40-20-40) rolled up by channel.  Credit is integer micro-credit with
    integer division (operators/attribution.py) so every rollup is exact
    bigint — the oracle replays the identical `div` arithmetic.  The
    conversion-to-touch pairing is one user-keyed equi-join with a
    7-day range predicate; per-conversion windows partition by conv_id
    (bounded by one user's week of history), never a global window."""
    from high_throughput_etl_pipeline_spark.operators.attribution import (
        channel_credit_report,
        multi_touch_attribution,
    )

    e = _t(spark, sf_dir, "events")
    touches = multi_touch_attribution(
        e,
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        id_col="event_id",
        conversion_type="purchase",
        lookback_days=7,
    )
    return channel_credit_report(touches)


@query(
    "customer_rfm_segments",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              DATE '2002-01-01') AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT *,
            CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                 AS INT) AS r_score,
            CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                 AS INT) AS f_score,
            CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey)
                 AS INT) AS m_score
        FROM cust
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_code,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                     THEN 'champion'
                WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                WHEN r_score >= 3 THEN 'recent'
                WHEN f_score >= 3 OR m_score >= 3 THEN 'at_risk'
                ELSE 'hibernating' END AS segment
    FROM scored ORDER BY o_custkey
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic CRM scoring.  Recency anchors on a fixed literal date (no
    extra global agg), monetary sums exact cents, and each quintile
    score comes from the closed-form ntile over global_rank
    (operators/ranking.py) — three range-partitioned distributed sorts
    of a customer-grain frame, no empty-partition-spec Window anywhere.
    Segment labels are a deterministic CASE chain the oracle mirrors."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "monetary_cents"
        ),
    )

    def _ntile5(df: DataFrame, order_cols, out: str) -> DataFrame:
        ranked, n = global_rank(df, order_cols, rank_col="_rank")
        tiles = 5
        q, m = divmod(n, tiles)
        r = F.col("_rank")
        if q == 0:
            tile = r.cast("int")
        else:
            big = (q + 1) * m
            tile = (
                F.when(r <= big, F.ceil(r / (q + 1)))
                .otherwise(m + F.ceil((r - big) / q))
                .cast("int")
            )
        return ranked.withColumn(out, tile).drop("_rank")

    scored = _ntile5(
        cust,
        [F.col("recency_days").desc(), F.col("o_custkey")],
        "r_score",
    )
    scored = _ntile5(
        scored, [F.col("frequency"), F.col("o_custkey")], "f_score"
    )
    scored = _ntile5(
        scored, [F.col("monetary_cents"), F.col("o_custkey")], "m_score"
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3),
            F.lit("loyal"),
        )
        .when(F.col("r_score") >= 3, F.lit("recent"))
        .when(
            (F.col("f_score") >= 3) | (F.col("m_score") >= 3),
            F.lit("at_risk"),
        )
        .otherwise(F.lit("hibernating"))
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm_code"),
        seg.alias("segment"),
    ).orderBy("o_custkey")


@query(
    "orders_benford_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
    ), obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM d GROUP BY digit
    ), tot AS (
        SELECT CAST(SUM(n_orders) AS BIGINT) AS _total FROM obs
    )
    SELECT digit, n_orders,
           round(n_orders / _total, 6) AS observed_p,
           round(log10(1 + 1.0 / digit), 6) AS benford_p,
           round(((n_orders - _total * log10(1 + 1.0 / digit))
                  * (n_orders - _total * log10(1 + 1.0 / digit)))
                 / (_total * log10(1 + 1.0 / digit)), 6) AS chi2_term
    FROM obs, tot ORDER BY digit
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit fraud audit over order totals: observed
    leading-digit frequencies vs the Benford expectation log10(1+1/d),
    with per-digit chi-square contributions.  The leading digit comes
    from the exact cents bigint rendered as a string (no log/floor
    boundary sensitivity on the digit itself); floats appear only in
    the per-row log10/ratio terms, built in the same term order as the
    oracle.  One grouped agg + a one-row broadcast total — audit cost
    is a rollup at any scale."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    obs = (
        o.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    tot = obs.agg(F.sum("n_orders").cast("bigint").alias("_total"))
    p = F.log10(1 + 1.0 / F.col("digit"))
    dev = F.col("n_orders") - F.col("_total") * p
    return (
        obs.join(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("_total"), 6).alias(
                "observed_p"
            ),
            F.round(p, 6).alias("benford_p"),
            F.round(dev * dev / (F.col("_total") * p), 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "user_type_entropy",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
               CAST(COUNT(*) FILTER (event_type = 'error')    AS BIGINT) AS n_error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup')   AS BIGINT) AS n_signup,
               CAST(COUNT(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    ), ent AS (
        SELECT *,
               ln(n_events)
               - CAST(
                   (CASE WHEN n_click    > 0 THEN CAST(round(n_click    * ln(n_click)    * 1e9, 0) AS BIGINT) ELSE 0 END)
                 + (CASE WHEN n_error    > 0 THEN CAST(round(n_error    * ln(n_error)    * 1e9, 0) AS BIGINT) ELSE 0 END)
                 + (CASE WHEN n_purchase > 0 THEN CAST(round(n_purchase * ln(n_purchase) * 1e9, 0) AS BIGINT) ELSE 0 END)
                 + (CASE WHEN n_signup   > 0 THEN CAST(round(n_signup   * ln(n_signup)   * 1e9, 0) AS BIGINT) ELSE 0 END)
                 + (CASE WHEN n_view     > 0 THEN CAST(round(n_view     * ln(n_view)     * 1e9, 0) AS BIGINT) ELSE 0 END)
                 AS DOUBLE) / 1e9
                 / n_events AS h
        FROM pu
    )
    SELECT user_id, n_events,
           CAST((CASE WHEN n_click    > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN n_error    > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN n_purchase > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN n_signup   > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN n_view     > 0 THEN 1 ELSE 0 END) AS INT) AS n_types,
           round(h, 6) AS entropy_nats,
           round(h / ln(5), 6) AS norm_entropy
    FROM ent ORDER BY user_id
    """,
)
def user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — the behavioral-
    diversity feature (uniform mixers vs single-action users).  Float
    parity discipline: entropy comes from integer per-type counts via
    ``ln(T) - (Σ nᵢ·ln nᵢ)/T``; each of the five nᵢ·ln nᵢ terms is
    rounded to the 1e-9 integer lattice BEFORE the sum (ln is libm-
    build-dependent — summing raw transcendental terms was the
    customer_survival_curve r8 driver failure), so only single
    un-summed ln calls remain on the float path.  One grouped agg with
    conditional counts; entirely map-side partials + one shuffle."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{t}")
        for t in types
    ]
    pu = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"), *aggs
    )

    def term(c: str):
        return F.when(
            F.col(c) > 0,
            F.round(F.col(c) * F.log(F.col(c)) * F.lit(1e9), 0).cast(
                "bigint"
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    s = (
        term("n_click")
        + term("n_error")
        + term("n_purchase")
        + term("n_signup")
        + term("n_view")
    )
    h = (
        F.log(F.col("n_events"))
        - s.cast("double") / F.lit(1e9) / F.col("n_events")
    )
    n_types = sum(
        F.when(F.col(f"n_{t}") > 0, 1).otherwise(0) for t in types
    ).cast("int")
    return pu.select(
        "user_id",
        "n_events",
        n_types.alias("n_types"),
        F.round(h, 6).alias("entropy_nats"),
        F.round(h / F.log(F.lit(5.0)), 6).alias("norm_entropy"),
    ).orderBy("user_id")


@query(
    "text_nb_confusion",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, text FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 1024 AS fid
        FROM (
            SELECT doc_id, lang,
                   unnest(string_split_regex(trim(text),
                                             '[ \\t\\n\\r\\f\\x0b]+')) AS tok
            FROM base
        ) WHERE tok <> ''
    ), tfc AS (
        SELECT doc_id, lang, fid, CAST(COUNT(*) AS BIGINT) AS tf
        FROM feat GROUP BY doc_id, lang, fid
    ), cc AS (
        SELECT lang, fid, CAST(COUNT(*) AS BIGINT) AS n
        FROM feat GROUP BY lang, fid
    ), ct AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
        FROM feat GROUP BY lang
    ), fids AS (
        SELECT DISTINCT fid FROM feat
    ), grid AS (
        SELECT ct.lang, fids.fid,
               CAST(round(ln((COALESCE(cc.n, 0) + 1.0)
                             / (ct.total + 1024.0)) * 1000000, 0)
                    AS BIGINT) AS lp
        FROM ct CROSS JOIN fids
        LEFT JOIN cc ON cc.lang = ct.lang AND cc.fid = fids.fid
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
    ), pri AS (
        SELECT lang AS hyp,
               CAST(round(ln(CAST(COUNT(*) AS BIGINT) / (SELECT n FROM nn))
                          * 1000000, 0) AS BIGINT) AS prior
        FROM base GROUP BY lang
    ), sc AS (
        SELECT t.doc_id, t.lang AS true_label, g.lang AS hyp,
               CAST(SUM(t.tf * g.lp) AS BIGINT) AS tok_lp
        FROM tfc t JOIN grid g ON t.fid = g.fid
        GROUP BY t.doc_id, t.lang, g.lang
    ), pred AS (
        SELECT sc.doc_id, sc.true_label, sc.hyp AS pred_label,
               row_number() OVER (PARTITION BY sc.doc_id
                                  ORDER BY sc.tok_lp + pri.prior DESC,
                                           sc.hyp) AS rn
        FROM sc JOIN pri ON sc.hyp = pri.hyp
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY true_label, pred_label ORDER BY true_label, pred_label
    """,
)
def text_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained on the
    corpus's own lang labels over md5-hashed bag-of-words and evaluated
    in-sample as a confusion matrix (operators/text.py:nb_confusion).
    Every log-probability is quantized to micro-nat bigints before any
    accumulation, so scores are exact integer dot products and the
    oracle replays training AND inference bit-for-bit.  The model
    (5×1024 grid + priors) broadcasts; the corpus side is one explode
    and three grouped aggs."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        nb_confusion,
    )

    d = _t(spark, sf_dir, "documents")
    return nb_confusion(
        d, label_col="lang", id_col="doc_id", text_col="text", dim=1024
    )


def _acf_oracle(max_lag: int = 7) -> str:
    lag_cols = ",\n               ".join(
        f"lag(dev, {k}) OVER w AS l{k}" for k in range(1, max_lag + 1)
    )
    num_cols = ",\n               ".join(
        f"SUM(dev * l{k}) AS num{k}" for k in range(1, max_lag + 1)
    )
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT event_type, n_periods, CAST({k} AS INT) AS lag,
               CASE WHEN den > 0 THEN
                    round(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE), 6)
               END AS acf FROM agg"""
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type, CAST(SUM(x) AS BIGINT) AS S,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM daily GROUP BY 1
    ), dv AS (
        SELECT d.event_type, d.d, st.n,
               CAST(st.n * d.x - st.S AS HUGEINT) AS dev
        FROM daily d JOIN st USING (event_type)
    ), lagd AS (
        SELECT event_type, n, dev,
               {lag_cols}
        FROM dv WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ), agg AS (
        SELECT event_type, MAX(n) AS n_periods,
               SUM(dev * dev) AS den,
               {num_cols}
        FROM lagd GROUP BY 1
    )
    SELECT event_type, lag, n_periods, acf FROM (
{arms}
    ) ORDER BY event_type, lag
    """


@query("events_autocorrelation", oracle=_acf_oracle())
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the per-type daily event-count series at lags
    1..7 (operators/timeseries.py:autocorrelation) — the seasonality
    probe.  The n-scaled deviation trick (dev = n·x − S, exact bigint)
    keeps both ACF sums 128-bit-integer-exact (decimal here, HUGEINT in
    the oracle); the only float op is the final num/den division, so
    the hash gate is exact.  Series grain is calendar days — window
    state is bounded regardless of data volume."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        autocorrelation,
    )

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return autocorrelation(
        daily, group_col="event_type", order_col="d", x_col="x", max_lag=7
    )


@query(
    "events_cusum_alarms",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d)
                      AS i
        FROM daily
    ), par AS (
        SELECT event_type,
               CAST(CAST(SUM(x) AS BIGINT) // COUNT(*) AS BIGINT)
                   AS target,
               CAST(GREATEST((CAST(SUM(x) AS BIGINT) // COUNT(*)) // 20,
                             1) AS BIGINT) AS allow,
               CAST(GREATEST((CAST(SUM(x) AS BIGINT) // COUNT(*)) // 20,
                             1) * 4 AS BIGINT) AS h
        FROM daily GROUP BY 1
    ), r AS (
        SELECT i.event_type, i.i, i.d, i.x,
               GREATEST(0, (i.x - p.target) - p.allow) AS pos,
               GREATEST(0, (p.target - i.x) - p.allow) AS neg
        FROM idx i JOIN par p USING (event_type) WHERE i.i = 1
        UNION ALL
        SELECT i.event_type, i.i, i.d, i.x,
               GREATEST(0, (CASE WHEN r.pos > p.h THEN 0 ELSE r.pos END)
                           + (i.x - p.target) - p.allow),
               GREATEST(0, (CASE WHEN r.neg > p.h THEN 0 ELSE r.neg END)
                           + (p.target - i.x) - p.allow)
        FROM r
        JOIN idx i ON i.event_type = r.event_type AND i.i = r.i + 1
        JOIN par p ON p.event_type = i.event_type
    )
    SELECT r.event_type, r.d, r.x,
           CAST(r.pos AS BIGINT) AS cusum_pos,
           CAST(r.neg AS BIGINT) AS cusum_neg,
           r.pos > p.h AS alarm_up,
           r.neg > p.h AS alarm_dn
    FROM r JOIN par p USING (event_type)
    ORDER BY event_type, d
    """,
)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift/change alarms over per-type daily counts
    (operators/timeseries.py:cusum_alarms).  The CUSUM recursion is
    all-bigint (floor-mean target, integer allowance/threshold), so the
    sequential fold is bit-reproducible — the oracle replays it as a
    recursive CTE.  Sequential state folds per group over the sorted
    day array (calendar-bounded), groups stay parallel."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        cusum_alarms,
    )

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return cusum_alarms(
        daily, group_col="event_type", order_col="d", x_col="x",
        slack_div=20, h_mult=4,
    )


@query(
    "events_seasonal_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), lagd AS (
        SELECT event_type, x,
               lag(x, 7) OVER w AS fs,
               lag(x, 1) OVER w AS fn
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ), ev AS (
        SELECT * FROM lagd WHERE fs IS NOT NULL
    ), agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(abs(x - fs)) AS BIGINT) AS ae_s,
               CAST(SUM(abs(x - fn)) AS BIGINT) AS ae_n,
               CAST(SUM(x - fs) AS BIGINT) AS e_s,
               CAST(SUM(x) AS BIGINT) AS ax
        FROM ev GROUP BY 1
    )
    SELECT event_type, n_eval,
           round(ae_s / n_eval, 6) AS mae_seasonal,
           round(ae_n / n_eval, 6) AS mae_naive,
           CASE WHEN ax > 0 THEN round(ae_s / ax, 6) END AS wape_seasonal,
           round(e_s / n_eval, 6) AS bias_seasonal,
           CASE WHEN ae_n > 0 THEN round(ae_s / ae_n, 6) END AS skill_ratio
    FROM agg ORDER BY event_type
    """,
)
def events_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) vs naive (lag-1) forecast backtest on the
    per-type daily count series (operators/timeseries.py:
    seasonal_backtest): shared eval window, exact bigint error sums,
    one double division per reported metric (MAE / WAPE / bias / skill
    ratio).  Skill < 1 means the weekly lag genuinely predicts."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        seasonal_backtest,
    )

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return seasonal_backtest(
        daily, group_col="event_type", order_col="d", x_col="x", period=7
    )


def _hits_oracle(iters: int = 8, scale: int = 10**6, k: int = 10) -> str:
    parts = [
        f"""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), h0 AS MATERIALIZED (
        SELECT DISTINCT s AS id, CAST({scale} AS HUGEINT) AS h FROM pairs
    )"""
    ]
    for i in range(iters):
        parts.append(
            f""",
    araw{i} AS MATERIALIZED (
        SELECT e.p AS id, SUM(h.h) AS raw
        FROM pairs e JOIN h{i} h ON e.s = h.id GROUP BY e.p
    ), a{i} AS MATERIALIZED (
        SELECT id, (raw * {scale}) // (SELECT MAX(raw) FROM araw{i}) AS a
        FROM araw{i}
    ), hraw{i} AS MATERIALIZED (
        SELECT e.s AS id, SUM(a.a) AS raw
        FROM pairs e JOIN a{i} a ON e.p = a.id GROUP BY e.s
    ), h{i + 1} AS MATERIALIZED (
        SELECT id, (raw * {scale}) // (SELECT MAX(raw) FROM hraw{i}) AS h
        FROM hraw{i}
    )"""
        )
    parts.append(
        f""",
    hub_top AS (
        SELECT 'supplier' AS node_kind, CAST(id AS BIGINT) AS entity_id,
               CAST(h AS BIGINT) AS score_units,
               CAST(row_number() OVER (ORDER BY h DESC, id) AS INT) AS pos
        FROM h{iters} QUALIFY pos <= {k}
    ), auth_top AS (
        SELECT 'part' AS node_kind, CAST(id AS BIGINT) AS entity_id,
               CAST(a AS BIGINT) AS score_units,
               CAST(row_number() OVER (ORDER BY a DESC, id) AS INT) AS pos
        FROM a{iters - 1} QUALIFY pos <= {k}
    )
    SELECT * FROM (
        SELECT * FROM hub_top UNION ALL SELECT * FROM auth_top
    ) ORDER BY node_kind, pos
    """
    )
    return "".join(parts)


@query("supplier_part_hits", oracle=_hits_oracle())
def supplier_part_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the directed supplier→part supply
    graph (operators/graph.py:hits_int): suppliers are hubs, parts are
    authorities, 8 rounds of exact bigint mutual reinforcement with a
    decimal-safe max-renormalization per half-step — iterative and
    still hash-checkable because no float ever accumulates.  Top-10
    per role via distributed TakeOrdered."""
    from high_throughput_etl_pipeline_spark.operators.graph import hits_int
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).distinct()
    scores = hits_int(edges, iterations=8, scale=10**6)
    hubs = take_top_k(
        scores.filter(F.col("kind") == "hub"),
        [F.desc("score"), F.col("id")],
        10,
        rank_col="pos",
    ).select(
        F.lit("supplier").alias("node_kind"),
        F.col("id").cast("bigint").alias("entity_id"),
        F.col("score").alias("score_units"),
        "pos",
    )
    auths = take_top_k(
        scores.filter(F.col("kind") == "authority"),
        [F.desc("score"), F.col("id")],
        10,
        rank_col="pos",
    ).select(
        F.lit("part").alias("node_kind"),
        F.col("id").cast("bigint").alias("entity_id"),
        F.col("score").alias("score_units"),
        "pos",
    )
    return hubs.unionAll(auths).orderBy("node_kind", "pos")


@query(
    "graph_degree_assortativity",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_suppkey * 2 AS s, l_partkey * 2 + 1 AS p
        FROM lineitem
    ), edges AS (
        SELECT s AS src, p AS dst FROM pairs
        UNION ALL
        SELECT p AS src, s AS dst FROM pairs
    ), deg AS (
        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
        FROM edges GROUP BY src
    ), ann AS (
        SELECT dj.deg AS j, dk.deg AS k
        FROM edges e
        JOIN deg dj ON e.src = dj.id
        JOIN deg dk ON e.dst = dk.id
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS m,
               SUM(CAST(j AS HUGEINT) * k) AS sjk,
               SUM(CAST(j AS HUGEINT)) AS sj,
               SUM(CAST(k AS HUGEINT)) AS sk,
               SUM(CAST(j AS HUGEINT) * j) AS sjj,
               SUM(CAST(k AS HUGEINT) * k) AS skk
        FROM ann
    )
    SELECT CAST(m AS BIGINT) AS m_edges,
           CAST(sjk AS DOUBLE) AS sum_jk,
           CASE WHEN CAST(m * sjj - sj * sj AS DOUBLE) > 0
                 AND CAST(m * skk - sk * sk AS DOUBLE) > 0
                THEN round(CAST(m * sjk - sj * sk AS DOUBLE)
                           / (sqrt(CAST(m * sjj - sj * sj AS DOUBLE))
                              * sqrt(CAST(m * skk - sk * sk AS DOUBLE))),
                           6)
           END AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the undirected supplier↔part
    graph (operators/graph.py:degree_assortativity): do high-degree
    nodes attach to high-degree nodes?  All five correlation sums are
    exact 128-bit integers (decimal / HUGEINT); doubles only in the
    final sqrt ratio, same term order both engines.  Node ids are
    parity-encoded (supplier 2k, part 2k+1) so the two key spaces
    cannot collide in the shared degree table."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("s"),
        (F.col("l_partkey") * 2 + 1).alias("p"),
    ).distinct()
    edges = pairs.select(
        F.col("s").alias("src"), F.col("p").alias("dst")
    ).unionAll(
        pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    return degree_assortativity(edges)


def _k_core_oracle(k: int = 2, rounds: int = 16) -> str:
    parts = [
        """
    WITH e0 AS MATERIALIZED (
        SELECT a.c_custkey AS a, b.c_custkey AS b
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), s0 AS MATERIALIZED (
        SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
    )"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
    k{i} AS MATERIALIZED (
        SELECT a AS id FROM s{i} GROUP BY a HAVING COUNT(*) >= {k}
    ), s{i + 1} AS MATERIALIZED (
        SELECT s.a, s.b FROM s{i} s
        JOIN k{i} x ON s.a = x.id JOIN k{i} y ON s.b = y.id
    )"""
        )
    parts.append(
        f"""
    SELECT a AS custkey, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM s{rounds} GROUP BY a ORDER BY custkey
    """
    )
    return "".join(parts)


@query("customer_match_k_core", oracle=_k_core_oracle())
def customer_match_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the fuzzy-match candidate graph (the
    customer_fuzzy_match edge spec: nation-blocked edit-distance ≤ 1):
    iterative peeling (operators/graph.py:k_core) strips chain/leaf
    matches until only cyclically-reinforced duplicate blobs remain —
    the cohesion filter that separates real duplicate groups from
    accidental single-link chains before anyone merges records.
    Peeling is confluent and all-integer, so the data-dependent
    iteration is still hash-exact; the oracle unrolls 16 peel rounds
    (fixpoint at sf0.01 is 9; extra rounds no-op)."""
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fuzzy_matches_neighborhood,
    )
    from high_throughput_etl_pipeline_spark.operators.graph import k_core

    c = _t(spark, sf_dir, "customer")
    pairs = fuzzy_matches_neighborhood(
        c,
        block_cols=["c_nationkey"],
        id_col="c_custkey",
        name_col="c_name",
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return (
        k_core(pairs, k=2)
        .select(F.col("id").alias("custkey"), "core_degree")
        .orderBy("custkey")
    )


@query(
    "orders_basket_rules",
    oracle="""
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, p_brand AS i
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ), nb AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM items
    ), ic AS MATERIALIZED (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM items GROUP BY i
    ), pc AS MATERIALIZED (
        SELECT a.i AS ia, b.i AS ib, CAST(COUNT(*) AS BIGINT) AS nab
        FROM items a JOIN items b ON a.o = b.o AND a.i < b.i
        GROUP BY a.i, b.i HAVING COUNT(*) >= 2
    ), rules AS (
        SELECT ia AS antecedent, ib AS consequent, nab AS n_both FROM pc
        UNION ALL
        SELECT ib, ia, nab FROM pc
    ), m AS (
        SELECT r.antecedent, r.consequent, r.n_both,
               x.ni AS n_ant, y.ni AS n_cons, nb.n AS n_baskets,
               round(r.n_both / nb.n, 6) AS support,
               round(r.n_both / x.ni, 6) AS confidence,
               round(CAST(CAST(r.n_both AS HUGEINT) * nb.n AS DOUBLE)
                     / CAST(CAST(x.ni AS HUGEINT) * y.ni AS DOUBLE), 6)
                   AS lift
        FROM rules r
        JOIN ic x ON r.antecedent = x.i
        JOIN ic y ON r.consequent = y.i
        CROSS JOIN nb
    )
    SELECT antecedent, consequent, n_both, n_ant, n_cons, n_baskets,
           support, confidence, lift,
           CAST(row_number() OVER (ORDER BY lift DESC, antecedent,
                                   consequent) AS INT) AS pos
    FROM m QUALIFY pos <= 50 ORDER BY pos
    """,
)
def orders_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brand-level order baskets
    (operators/basket.py:association_rules): support / confidence /
    lift per directed brand pair, top-50 by lift via distributed
    TakeOrdered.  Pair expansion is bounded by basket width; lift's
    cross products run in decimal/HUGEINT before one double division,
    so the ranking is engine-exact."""
    from high_throughput_etl_pipeline_spark.operators.basket import (
        association_rules,
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = li.join(p, on=F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("l_orderkey").alias("o"), F.col("p_brand").alias("i")
    )
    rules = association_rules(
        baskets, basket_col="o", item_col="i", min_support_count=2
    )
    top = take_top_k(
        rules,
        [F.desc("lift"), F.col("antecedent"), F.col("consequent")],
        50,
        rank_col="pos",
    )
    return top.select(
        "antecedent", "consequent", "n_both", "n_ant", "n_cons",
        "n_baskets", "support", "confidence", "lift", "pos",
    ).orderBy("pos")


@query(
    "doc_pmi_collocations",
    oracle="""
    WITH w AS MATERIALIZED (
        SELECT string_split_regex(trim(lower(text)),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS t
        FROM documents
    ), g AS MATERIALIZED (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t FROM w WHERE len(t) >= 2),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM g GROUP BY w1, w2 HAVING COUNT(*) >= 5
    ), ug AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM (
            SELECT w1 AS w FROM g UNION ALL SELECT w2 FROM g
        ) GROUP BY w
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM g
    ), m AS (
        SELECT pc.w1, pc.w2, pc.c_xy, x.c_w AS c_x, y.c_w AS c_y,
               round(ln(CAST(CAST(pc.c_xy AS HUGEINT) * n.nn AS DOUBLE)
                        / CAST(CAST(x.c_w AS HUGEINT) * y.c_w AS DOUBLE)),
                     6) AS pmi
        FROM pc JOIN ug x ON pc.w1 = x.w JOIN ug y ON pc.w2 = y.w
        CROSS JOIN n
    )
    SELECT w1, w2, c_xy, c_x, c_y, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT)
               AS pos
    FROM m QUALIFY pos <= 30 ORDER BY pos
    """,
)
def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 collocations by pointwise mutual information over
    adjacent word pairs (operators/text.py:pmi_collocations) — the
    phrase detector.  Exact bigint counts, decimal/HUGEINT cross
    products, one ln per surviving pair in a fixed term order; top-k
    via distributed TakeOrdered on (pmi, w1, w2)."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    d = _t(spark, sf_dir, "documents")
    pmi = pmi_collocations(d, text_col="text", min_pair_count=5)
    top = take_top_k(
        pmi, [F.desc("pmi"), F.col("w1"), F.col("w2")], 30, rank_col="pos"
    )
    return top.select(
        "w1", "w2", "c_xy", "c_x", "c_y", "pmi", "pos"
    ).orderBy("pos")


@query(
    "corpus_zipf_slope",
    oracle="""
    WITH tok AS MATERIALIZED (
        SELECT t FROM (
            SELECT unnest(string_split_regex(trim(lower(text)),
                                             '[ \\t\\n\\r\\f\\x0b]+')) AS t
            FROM documents
        ) WHERE t <> ''
    ), freq AS MATERIALIZED (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY t
    ), ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r FROM freq
    ), q AS (
        SELECT f,
               CAST(round(ln(r) * 1000000, 0) AS BIGINT) AS x,
               CAST(round(ln(f) * 1000000, 0) AS BIGINT) AS y
        FROM ranked
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(f) AS BIGINT) AS total_tokens,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM q
    )
    SELECT CAST(n AS BIGINT) AS vocab_size, total_tokens,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 6)
           END AS zipf_slope,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN round((CAST(n * sxy - sx * sy AS DOUBLE)
                            * CAST(n * sxy - sx * sy AS DOUBLE))
                           / (CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS r2
    FROM s
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus frequency distribution
    (operators/text.py:zipf_fit): OLS slope of ln(freq) on ln(rank)
    with rank from the distributed global_rank path and both
    logarithms quantized to micro-nat bigints BEFORE summation — the
    five OLS sums are exact 128-bit integers, so an iterative-free
    statistical fit stays hash-exact.  Natural corpora sit near −1;
    drift flags templated/synthetic text."""
    from high_throughput_etl_pipeline_spark.operators.text import zipf_fit

    d = _t(spark, sf_dir, "documents")
    return zipf_fit(d, text_col="text")


@query(
    "doc_ngram_novelty",
    oracle="""
    WITH w AS MATERIALIZED (
        SELECT doc_id, string_split_regex(trim(lower(text)),
                                          '[ \\t\\n\\r\\f\\x0b]+') AS t
        FROM documents
    ), g AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')),
                               18, 15))::BIGINT AS h
        FROM (SELECT doc_id, t FROM w WHERE len(t) >= 5),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i)
    ), gc AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS docs FROM g GROUP BY h
    ), per AS (
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN gc.docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared
        FROM g JOIN gc ON g.h = gc.h GROUP BY g.doc_id
    )
    SELECT doc_id, n_shingles, n_shared,
           round(1.0 - n_shared / n_shingles, 6) AS novelty
    FROM per ORDER BY doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram duplication exposure
    (operators/text.py:ngram_novelty): the fraction of a document's
    distinct word 5-grams that appear in at least one other document —
    the memorization-risk audit that catches shared passages exact
    dedup misses.  Shingles shuffle as md5-64 longs, one grouped count
    + one join back; the ratio is one double division of exact
    bigints."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        ngram_novelty,
    )

    d = _t(spark, sf_dir, "documents")
    return ngram_novelty(d, n=5).orderBy("doc_id")


@query(
    "user_cohort_ltv",
    oracle="""
    WITH first_w AS (
        SELECT user_id,
               CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), purch AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, p.w) // 7 AS INT)
                   AS age_weeks,
               p.user_id, p.cents
        FROM purch p JOIN first_w f ON p.user_id = f.user_id
    ), cell AS (
        SELECT cohort_week, age_weeks,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM j GROUP BY cohort_week, age_weeks
    )
    SELECT cohort_week, age_weeks, n_buyers, revenue_cents,
           CAST(SUM(revenue_cents) OVER (
               PARTITION BY cohort_week ORDER BY age_weeks
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
    FROM cell ORDER BY cohort_week, age_weeks
    """,
)
def user_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users bucketed by first-activity
    week, purchase revenue rolled up by (cohort, age-in-weeks) with the
    running cumulative LTV — the retention-revenue readout next to
    user_retention_cohorts.  Revenue is exact cents; the cumulative
    window partitions per cohort (weeks-grain, calendar-bounded).  Two
    grouped aggs + one user-keyed join."""
    e = _t(spark, sf_dir, "events")
    first_w = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts")))
        .cast("date")
        .alias("cohort_week")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("w"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    j = purch.join(first_w, on="user_id").select(
        "cohort_week",
        (F.datediff(F.col("w"), F.col("cohort_week")) / F.lit(7))
        .cast("int")
        .alias("age_weeks"),
        "user_id",
        "cents",
    )
    cell = j.groupBy("cohort_week", "age_weeks").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cell.select(
        "cohort_week",
        "age_weeks",
        "n_buyers",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias(
            "cum_revenue_cents"
        ),
    ).orderBy("cohort_week", "age_weeks")


@query(
    "events_theilsen_trend",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type AS g,
               CAST(b.x - a.x AS BIGINT) AS dx,
               CAST(date_diff('day', a.d, b.d) AS BIGINT) AS dd
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ), slopes AS (
        SELECT g, dx, dd, dx / dd AS s FROM pairs
    ), ranked AS (
        SELECT g, s,
               row_number() OVER (PARTITION BY g ORDER BY s, dx, dd)
                   AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM slopes
    )
    SELECT g AS event_type,
           CAST(MAX(n) AS BIGINT) AS n_pairs,
           round(AVG(s), 6) AS theil_sen_slope
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    GROUP BY g ORDER BY g
    """,
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of per-type daily counts
    (operators/timeseries.py:theil_sen) — median of all pairwise
    slopes, the outlier-proof complement to the OLS trend in
    events_value_trend.  Each slope is one double division of exact
    integer deltas; the median ordering tie-breaks on those integers,
    and the even-count median averages exactly two doubles
    (commutative) — hash-exact despite being a rank statistic over
    floats.  Pair mass is C(days,2) per type: calendar-bounded."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        theil_sen,
    )

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return theil_sen(daily, group_col="event_type", date_col="d", x_col="x")


@query(
    "user_conversion_lag",
    oracle="""
    WITH f AS (
        SELECT user_id, MIN(ts) AS fs
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS fp
        FROM events e JOIN f ON e.user_id = f.user_id AND e.ts > f.fs
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ), lagd AS (
        SELECT f.user_id,
               CAST(date_trunc('week', f.fs) AS DATE) AS cohort_week,
               epoch_us(p.fp) - epoch_us(f.fs) AS delta_us
        FROM f JOIN p ON f.user_id = p.user_id
    ), ranked AS (
        SELECT cohort_week, user_id, delta_us,
               row_number() OVER (PARTITION BY cohort_week
                                  ORDER BY delta_us, user_id) AS rn,
               COUNT(*) OVER (PARTITION BY cohort_week) AS n,
               SUM(delta_us) OVER (PARTITION BY cohort_week) AS tot
        FROM lagd
    )
    SELECT cohort_week,
           CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delta_us END)
               AS BIGINT) AS p50_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_us END)
               AS BIGINT) AS p90_us,
           round(MAX(tot) / MAX(n), 2) AS mean_us
    FROM ranked GROUP BY cohort_week ORDER BY cohort_week
    """,
)
def user_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion lag by signup-week cohort:
    exact microsecond deltas, with p50/p90 picked by integer rank
    selection inside a per-cohort window (percentile_disc semantics —
    no interpolation, no float quantile estimator) and the mean as one
    double division of exact sums.  The funnel-latency readout next to
    user_funnel_conversion.  Per-cohort windows carry one week's
    converters per task (the weighted_quantiles convention,
    plans/metrics.py:288) — for hot cohorts swap the rank selection
    for the KLL sketch family, same trade documented there."""
    e = _t(spark, sf_dir, "events")
    f = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fs"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(f, on="user_id")
        .filter(F.col("ts") > F.col("fs"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    lagd = f.join(p, on="user_id").select(
        "user_id",
        F.date_trunc("week", F.col("fs")).cast("date").alias("cohort_week"),
        (F.unix_micros("fp") - F.unix_micros("fs")).alias("delta_us"),
    )
    wo = Window.partitionBy("cohort_week").orderBy("delta_us", "user_id")
    wp = Window.partitionBy("cohort_week")
    ranked = lagd.select(
        "cohort_week",
        "delta_us",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("delta_us").over(wp).alias("tot"),
    )
    return (
        ranked.groupBy("cohort_week")
        .agg(
            F.max("n").cast("bigint").alias("n_converted"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"),
                    F.col("delta_us"),
                )
            ).cast("bigint").alias("p50_us"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) div 10"),
                    F.col("delta_us"),
                )
            ).cast("bigint").alias("p90_us"),
            F.round(F.max("tot") / F.max("n"), 2).alias("mean_us"),
        )
        .orderBy("cohort_week")
    )


@query(
    "customer_golden_record",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ), cc AS (
        SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node
    ), mem AS (
        SELECT cc.cluster_id, c.c_custkey, c.c_name,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM cc JOIN customer c ON cc.node = c.c_custkey
    ), keyed AS (
        SELECT *, cents * 1000000000 - c_custkey AS k FROM mem
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(c_custkey) AS BIGINT) AS member_id_sum,
           CAST(SUM(cents) AS BIGINT) AS total_acctbal_cents,
           CAST(MAX(cents) AS BIGINT) AS max_acctbal_cents,
           CAST(max_by(c_custkey, k) AS BIGINT) AS golden_custkey,
           max_by(c_name, k) AS golden_name
    FROM keyed GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def customer_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution completion: fuzzy-match pairs → connected
    components → one GOLDEN RECORD per duplicate cluster with
    deterministic survivorship (the richest-account member wins, ties
    to the lowest key — encoded as one composite integer argmax, the
    engine-portable max_by discipline).  This is the merge step that
    turns customer_fuzzy_match's pair list into a deduplicated master
    table.  Components via min-label propagation
    (operators/graph.py) — O(diameter) keyed joins; survivorship is
    one grouped agg.  The oracle replays matching, the component walk
    (recursive CTE), and the same composite-key argmax."""
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fuzzy_matches_neighborhood,
    )
    from high_throughput_etl_pipeline_spark.operators.graph import (
        dedup_clusters,
    )

    c = _t(spark, sf_dir, "customer")
    pairs = fuzzy_matches_neighborhood(
        c,
        block_cols=["c_nationkey"],
        id_col="c_custkey",
        name_col="c_name",
    ).select("id_a", "id_b")
    # sequential names chain in edit space — a known HIGH-DIAMETER
    # graph, so go straight to large-star/small-star (O(log² n)
    # rounds) instead of burning 25 min-label hops first (measured
    # 43.6 s -> 8.0 s on the sf1 CC phase)
    cc = dedup_clusters(pairs, algorithm="star")
    mem = cc.join(
        c, on=F.col("node") == F.col("c_custkey")
    ).select(
        "cluster_id",
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    keyed = mem.withColumn(
        "_k", F.col("cents") * F.lit(1_000_000_000) - F.col("c_custkey")
    )
    return (
        keyed.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("c_custkey").cast("bigint").alias("member_id_sum"),
            F.sum("cents").cast("bigint").alias("total_acctbal_cents"),
            F.max("cents").cast("bigint").alias("max_acctbal_cents"),
            F.expr("max_by(c_custkey, _k)")
            .cast("bigint")
            .alias("golden_custkey"),
            F.expr("max_by(c_name, _k)").alias("golden_name"),
        )
        .orderBy("cluster_id")
    )


@query(
    "source_quantile_calibration",
    oracle="""
    WITH g AS (
        SELECT doc_id AS gid, n_chars AS gv,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                    AS BIGINT) AS grank
        FROM documents
    ), nt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), src AS (
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars, doc_id)
                    AS BIGINT) AS src_rank,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_g
        FROM documents
    ), t AS (
        SELECT s.*,
               CAST(CASE WHEN n_g > 1
                    THEN ((src_rank - 1) * ((SELECT n FROM nt) - 1))
                         // (n_g - 1) + 1
                    ELSE ((SELECT n FROM nt) + 1) // 2
               END AS BIGINT) AS target_rank
        FROM src s
    )
    SELECT t.doc_id, t.source, t.n_chars, t.src_rank, t.target_rank,
           g.gv AS calibrated_value
    FROM t JOIN g ON g.grank = t.target_rank
    ORDER BY t.doc_id
    """,
)
def source_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources
    (operators/corpus.py:quantile_calibrate): each doc's within-source
    rank maps onto the global length distribution, so one threshold
    applies to every source after calibration — the cross-source
    score-alignment step of corpus mixing.  Pure integer rank
    arithmetic over two total orderings (global side on the
    distributed global_rank path), readback as one equi-join."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        quantile_calibrate,
    )

    d = _t(spark, sf_dir, "documents")
    return quantile_calibrate(
        d, value_col="n_chars", group_col="source", id_col="doc_id"
    ).orderBy("doc_id")


@query(
    "brand_pareto_analysis",
    oracle="""
    WITH rev AS (
        SELECT p_brand AS brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS revenue_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    ), tot AS (
        SELECT CAST(SUM(revenue_cents) AS HUGEINT) AS t FROM rev
    ), c AS (
        SELECT brand, revenue_cents,
               CAST(SUM(revenue_cents) OVER (
                   ORDER BY revenue_cents DESC, brand
                   ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum
        FROM rev
    )
    SELECT brand, revenue_cents, CAST(cum AS BIGINT) AS cum_cents,
           round(revenue_cents / CAST((SELECT t FROM tot) AS DOUBLE), 6)
               AS share,
           round(CAST(cum AS DOUBLE)
                 / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS cum_share,
           5 * cum <= 4 * (SELECT t FROM tot) AS in_top80
    FROM c ORDER BY revenue_cents DESC, brand
    """,
)
def brand_pareto_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) contribution analysis of revenue by brand: exact
    running revenue under the global (revenue DESC, brand) ordering via
    the DISTRIBUTED prefix sum (operators/ranking.py:global_cumsum —
    range partitions + broadcast offsets, never an
    empty-partition-spec running window), cumulative share, and an
    exact-integer top-80% membership test (5·cum ≤ 4·total — no float
    threshold).  Revenue sums in decimal, cents out."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(p, on=F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    cumd, total = global_cumsum(
        rev,
        [F.col("revenue_cents").desc(), F.col("brand")],
        "revenue_cents",
        cum_col="cum",
    )
    return cumd.select(
        "brand",
        "revenue_cents",
        F.col("cum").cast("bigint").alias("cum_cents"),
        F.round(
            F.col("revenue_cents") / F.lit(total).cast("double"), 6
        ).alias("share"),
        F.round(
            F.col("cum").cast("double") / F.lit(total).cast("double"), 6
        ).alias("cum_share"),
        (F.col("cum") * 5 <= F.lit(total * 4)).alias("in_top80"),
    ).orderBy(F.desc("revenue_cents"), "brand")


@query(
    "customer_mutual_best_match",
    oracle="""
    WITH pairs AS MATERIALIZED (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               a.c_name AS name_a, b.c_name AS name_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT)
                   AS edit_distance
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), directed AS (
        SELECT id_a AS node, id_b AS partner, edit_distance AS s
        FROM pairs
        UNION ALL
        SELECT id_b, id_a, edit_distance FROM pairs
    ), best AS (
        SELECT node,
               min_by(partner, s * 1000000000 + partner) AS best
        FROM directed GROUP BY node
    )
    SELECT p.id_a, p.id_b, p.name_a, p.name_b, p.edit_distance
    FROM pairs p
    JOIN best x ON p.id_a = x.node AND p.id_b = x.best
    JOIN best y ON p.id_b = y.node AND p.id_a = y.best
    ORDER BY p.id_a, p.id_b
    """,
)
def customer_mutual_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal best match over the fuzzy-match candidates
    (operators/entity.py:mutual_best_matches): a pair survives only if
    each side is the other's single best candidate — the 1:1 precision
    filter in front of merging, which cuts chain links a plain
    threshold keeps.  Per-node argmin rides one composite integer key
    (engine-portable min_by); mutuality is two semi-joins."""
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fuzzy_matches_neighborhood,
        mutual_best_matches,
    )

    c = _t(spark, sf_dir, "customer")
    pairs = fuzzy_matches_neighborhood(
        c,
        block_cols=["c_nationkey"],
        id_col="c_custkey",
        name_col="c_name",
    )
    return (
        mutual_best_matches(pairs, score_col="edit_distance")
        .select(
            "id_a", "id_b", "name_a", "name_b",
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "doc_rake_keywords",
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id AS doc, i, t[i] AS tok
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)),
                                        '[ \\t\\n\\r\\f\\x0b]+') AS t
              FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
        WHERE t[i] <> ''
    ), flagged AS (
        SELECT doc, i, tok,
               tok IN ('the','and','of','to','a','in','is','that')
                   AS stop
        FROM toks
    ), marked AS (
        SELECT doc, i, tok, stop,
               SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc ORDER BY i
                   ROWS UNBOUNDED PRECEDING) AS pid
        FROM flagged
    ), words AS MATERIALIZED (
        SELECT doc, pid, i, tok FROM marked WHERE NOT stop
    ), occ AS MATERIALIZED (
        SELECT doc, pid, string_agg(tok, ' ' ORDER BY i) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS phrase_len
        FROM words GROUP BY doc, pid
    ), wstats AS MATERIALIZED (
        SELECT w.tok, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(o.phrase_len) AS BIGINT) AS deg
        FROM words w JOIN occ o ON w.doc = o.doc AND w.pid = o.pid
        GROUP BY w.tok
    ), per_occ AS (
        SELECT w.doc, w.pid, o.phrase, o.phrase_len,
               list_sum(list(s.deg / s.freq ORDER BY w.i)) AS score
        FROM words w
        JOIN occ o ON w.doc = o.doc AND w.pid = o.pid
        JOIN wstats s ON w.tok = s.tok
        GROUP BY w.doc, w.pid, o.phrase, o.phrase_len
    ), ph AS (
        SELECT phrase, phrase_len,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               round(MAX(score), 6) AS rake_score
        FROM per_occ GROUP BY phrase, phrase_len
    )
    SELECT phrase, phrase_len, n_occurrences, rake_score,
           CAST(row_number() OVER (ORDER BY rake_score DESC, phrase)
                AS INT) AS pos
    FROM ph QUALIFY pos <= 25 ORDER BY pos
    """,
)
def doc_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (operators/text.py:rake_keywords):
    stopword-bounded candidate phrases scored by Σ deg/freq of their
    words, top-25 via distributed TakeOrdered.  Word stats are exact
    bigints; each phrase score folds its word ratios IN PHRASE ORDER
    (the ordered-float-fold parity trick), so an iterative-free
    keyword ranker stays hash-exact end to end."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        rake_keywords,
    )

    d = _t(spark, sf_dir, "documents")
    ph = rake_keywords(d, text_col="text")
    top = take_top_k(
        ph, [F.desc("rake_score"), F.col("phrase")], 25, rank_col="pos"
    )
    return top.select(
        "phrase", "phrase_len", "n_occurrences", "rake_score", "pos"
    ).orderBy("pos")


@query(
    "events_hourweek_profile",
    oracle="""
    WITH cell AS (
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS t FROM cell
    )
    SELECT dow, hr, n,
           round(n / (SELECT t FROM tot), 6) AS share,
           n = MAX(n) OVER (PARTITION BY dow) AS is_peak_hour
    FROM cell ORDER BY dow, hr
    """,
)
def events_hourweek_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity heatmap (dow × hour counts, global share,
    per-day peak-hour flag) — the load-shaping profile capacity
    planning reads before scheduling compaction or batch windows.  One
    grouped agg + a one-row broadcast total + a 24-row-per-day
    partitioned max.  Spark dayofweek is 1=Sunday; DuckDB's is
    0=Sunday, so the oracle shifts by one."""
    e = _t(spark, sf_dir, "events")
    cell = e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cell.agg(F.sum("n").cast("bigint").alias("_t"))
    wd = Window.partitionBy("dow")
    return (
        cell.join(F.broadcast(tot))
        .select(
            "dow",
            "hr",
            "n",
            F.round(F.col("n") / F.col("_t"), 6).alias("share"),
            (F.col("n") == F.max("n").over(wd)).alias("is_peak_hour"),
        )
        .orderBy("dow", "hr")
    )


@query(
    "orders_reorder_intervals",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d
        FROM orders
    ), gaps AS (
        SELECT o.o_custkey,
               CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS gap
        FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
    ), g AS (
        SELECT c.c_mktsegment AS segment, gaps.gap
        FROM gaps JOIN customer c ON gaps.o_custkey = c.c_custkey
        WHERE gaps.gap IS NOT NULL
    ), ranked AS (
        SELECT segment, gap,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY gap) AS rn,
               COUNT(*) OVER (PARTITION BY segment) AS n,
               SUM(gap) OVER (PARTITION BY segment) AS tot
        FROM g
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MIN(gap) AS BIGINT) AS min_days,
           CAST(MAX(gap) AS BIGINT) AS max_days,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END)
               AS BIGINT) AS p50_days,
           round(MAX(tot) / MAX(n), 4) AS mean_days
    FROM ranked GROUP BY segment ORDER BY segment
    """,
)
def orders_reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution by market segment: exact
    day gaps between each customer's consecutive orders, with median
    by integer rank selection per segment (percentile_disc shape, the
    weighted_quantiles convention for bounded groups) and the mean as
    one double division of exact sums — the repurchase-cadence readout
    behind churn and inventory models."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    wcust = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .withColumn("gap", F.datediff(F.col("d"), F.lag("d").over(wcust)).cast("bigint"))
        .filter(F.col("gap").isNotNull())
    )
    g = gaps.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("segment"),
        ),
        on="o_custkey",
    )
    wo = Window.partitionBy("segment").orderBy("gap")
    wp = Window.partitionBy("segment")
    # tie order under (gap) alone is engine-nondeterministic, but rank
    # SELECTION only reads the VALUE at a rank — equal values make
    # every tie order select the same gap, so this is value-exact
    ranked = g.select(
        "segment",
        "gap",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("gap").over(wp).alias("tot"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_gaps"),
            F.min("gap").cast("bigint").alias("min_days"),
            F.max("gap").cast("bigint").alias("max_days"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap")
                )
            ).cast("bigint").alias("p50_days"),
            F.round(F.max("tot") / F.max("n"), 4).alias("mean_days"),
        )
        .orderBy("segment")
    )


@query(
    "orders_target_encoding",
    oracle="""
    WITH o AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), s AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DECIMAL(38,0)) AS sx
        FROM o GROUP BY segment
    )
    SELECT o.o_orderkey, o.segment,
           round(CAST(s.sx - o.cents AS DOUBLE)
                 / CAST(s.n - 1 AS DOUBLE) / 100.0, 6) AS loo_mean,
           round(CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE) / 100.0, 6)
               AS segment_mean
    FROM o JOIN s ON o.segment = s.segment
    WHERE o.o_orderkey <= 200
    ORDER BY o.o_orderkey
    """,
)
def orders_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order value by market segment —
    the leakage-safe categorical encoder for training tables: each
    row's code is ``(Σ_segment − own) / (n − 1)``, so a row never sees
    its own target.  ONE grouped agg produces a segment-cardinality
    frame that broadcasts back over the scan (map-side encode, no
    second shuffle); sums are exact cents in decimal(38,0).  The
    audited sample (o_orderkey ≤ 200) keeps the driver row bounded —
    the encode itself is computed for every row at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    oc = o.join(
        F.broadcast(
            c.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            )
        ),
        on="o_custkey",
    ).select(
        "o_orderkey",
        "segment",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    s = oc.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
    )
    return (
        oc.filter(F.col("o_orderkey") <= 200)
        .join(F.broadcast(s), on="segment")
        .select(
            "o_orderkey",
            "segment",
            F.round(
                (F.col("sx") - F.col("cents")).cast("double")
                / (F.col("n") - 1).cast("double")
                / 100.0,
                6,
            ).alias("loo_mean"),
            F.round(
                F.col("sx").cast("double") / F.col("n").cast("double") / 100.0,
                6,
            ).alias("segment_mean"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "events_chisq_independence",
    oracle="""
    WITH cell AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS HUGEINT) AS o
        FROM events GROUP BY 1, 2
    ), rt AS (
        SELECT event_type, SUM(o) AS r FROM cell GROUP BY event_type
    ), ct AS (
        SELECT hr, SUM(o) AS c FROM cell GROUP BY hr
    ), tot AS (
        SELECT SUM(o) AS n, COUNT(DISTINCT event_type) AS nr,
               COUNT(DISTINCT hr) AS nc
        FROM cell
    ), contrib AS (
        SELECT CAST(round(
                   CAST((cell.o * tot.n - rt.r * ct.c)
                        * (cell.o * tot.n - rt.r * ct.c) AS DOUBLE)
                   / CAST(tot.n * rt.r * ct.c AS DOUBLE) * 1e6, 0)
               AS HUGEINT) AS chi_scaled
        FROM cell
        JOIN rt ON cell.event_type = rt.event_type
        JOIN ct ON cell.hr = ct.hr
        CROSS JOIN tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST((tot.nr - 1) * (tot.nc - 1) AS BIGINT) AS dof,
           CAST(SUM(c.chi_scaled) AS BIGINT) AS chi2_micros,
           round(sqrt(CAST(SUM(c.chi_scaled) AS DOUBLE) / 1e6
                      / CAST(tot.n AS DOUBLE)
                      / CAST(LEAST(tot.nr, tot.nc) - 1 AS DOUBLE)), 6)
               AS cramers_v
    FROM contrib c CROSS JOIN tot
    GROUP BY tot.n, tot.nr, tot.nc
    """,
)
def events_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for event_type × hour-of-day
    (plus Cramér's V effect size) — "does activity mix shift by hour"
    as one statistic.  ONE grouped count builds the contingency cells
    (type×24 rows — tiny at any corpus size); margins and the total are
    re-aggregations of that frame broadcast back, so the raw table is
    scanned once.  Per-cell contributions (O·n − r·c)²/(n·r·c) are
    computed from exact decimal counts, scaled ×1e6, and rounded to
    integers BEFORE summing — the float work is one deterministic
    divide per cell, and the cross-cell sum is exact, so the statistic
    hash-matches.  At ~1e12 rows the decimal38 intermediates still fit
    ((O·n)² needs n·O < 1e19 per cell — switch the contribution to pure
    double beyond that)."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cell = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).cast(dec).alias("o"))
    rt = cell.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cell.groupBy("hr").agg(F.sum("o").alias("c"))
    tot = cell.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").cast(dec).alias("nr"),
        F.countDistinct("hr").cast(dec).alias("nc"),
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    contrib = (
        cell.join(F.broadcast(rt), on="event_type")
        .join(F.broadcast(ct), on="hr")
        .join(F.broadcast(tot))
        .select(
            F.round(
                (num * num).cast("double")
                / (F.col("n") * F.col("r") * F.col("c")).cast("double")
                * 1e6,
                0,
            )
            .cast(dec)
            .alias("chi_scaled"),
            "n",
            "nr",
            "nc",
        )
    )
    return contrib.groupBy("n", "nr", "nc").agg(
        F.sum("chi_scaled").alias("_cs")
    ).select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        # the statistic already lives on the integer micros lattice —
        # hash it directly; round(_cs/1e6, 4) was a decimal-tie surface
        F.col("_cs").cast("bigint").alias("chi2_micros"),
        F.round(
            F.sqrt(
                F.col("_cs").cast("double")
                / 1e6
                / F.col("n").cast("double")
                / (F.least("nr", "nc") - 1).cast("double")
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "lineitem_spearman_corr",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_quantity, 0) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p
        FROM lineitem
    ), r AS (
        SELECT flag,
               CAST(2 * rank() OVER (PARTITION BY flag ORDER BY q)
                    + COUNT(*) OVER (PARTITION BY flag, q) - 1
                    AS HUGEINT) AS rx,
               CAST(2 * rank() OVER (PARTITION BY flag ORDER BY p)
                    + COUNT(*) OVER (PARTITION BY flag, p) - 1
                    AS HUGEINT) AS ry
        FROM v
    ), s AS (
        SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx,
               SUM(ry * ry) AS syy
        FROM r GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS spearman_rho
    FROM s ORDER BY flag
    """,
)
def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per
    return flag — the monotone-association statistic (robust to
    outliers and nonlinearity, unlike Pearson).  Midranks handle ties
    exactly on the integer lattice: 2·midrank = 2·rank + tiecount − 1,
    so every rank moment accumulates as an exact decimal(38,0) and the
    only float ops are the final two sqrts and one divide.  Rank
    windows partition by flag (parallel across groups); at 1e12 rows a
    per-flag rank needs the global_rank two-pass shape instead —
    midranks via (rank from cumulative counts of the value histogram),
    which this formulation reduces to since ranks depend only on the
    per-(flag,value) counts."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity", 0).cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p"),
    )
    wq = Window.partitionBy("flag").orderBy("q")
    wqt = Window.partitionBy("flag", "q")
    wp = Window.partitionBy("flag").orderBy("p")
    wpt = Window.partitionBy("flag", "p")
    r = v.select(
        "flag",
        (
            F.lit(2) * F.rank().over(wq) + F.count(F.lit(1)).over(wqt) - 1
        ).cast(dec).alias("rx"),
        (
            F.lit(2) * F.rank().over(wp) + F.count(F.lit(1)).over(wpt) - 1
        ).cast(dec).alias("ry"),
    )
    s = r.groupBy("flag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    return s.select(
        "flag",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.sqrt(
                    (
                        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                * F.sqrt(
                    (
                        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                    ).cast("double")
                )
            ),
            6,
        ).alias("spearman_rho"),
    ).orderBy("flag")


@query(
    "source_lang_divergence",
    oracle="""
    WITH cnt AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ), langs AS (
        SELECT DISTINCT lang FROM cnt
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.n AS n_a, b.n AS n_b
        FROM tot a JOIN tot b ON a.source < b.source
    ), grid AS (
        SELECT p.source_a, p.source_b, p.n_a, p.n_b, l.lang,
               COALESCE(ca.c, 0) / CAST(p.n_a AS DOUBLE) AS pa,
               COALESCE(cb.c, 0) / CAST(p.n_b AS DOUBLE) AS pb
        FROM pairs p CROSS JOIN langs l
        LEFT JOIN cnt ca ON ca.source = p.source_a AND ca.lang = l.lang
        LEFT JOIN cnt cb ON cb.source = p.source_b AND cb.lang = l.lang
    )
    SELECT source_a, source_b, n_a, n_b,
           CAST(SUM(CAST(round((
               CASE WHEN pa > 0
                    THEN 0.5 * pa * ln(2 * pa / (pa + pb)) ELSE 0 END
               + CASE WHEN pb > 0
                      THEN 0.5 * pb * ln(2 * pb / (pa + pb)) ELSE 0 END
           ) * 1e9, 0) AS BIGINT)) AS BIGINT) AS js_nanos
    FROM grid
    GROUP BY source_a, source_b, n_a, n_b
    ORDER BY source_a, source_b
    """,
)
def source_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the language
    distributions of every document-source pair — the drift /
    mixture-shift readout a corpus curator checks before blending
    sources into a training mix.  ONE grouped count over the corpus;
    everything after operates on the (sources × langs) frame — tiny at
    any scale — so the pairwise "self-join" is a broadcast over
    kilobytes, never a corpus shuffle.  0·ln0 terms drop exactly; each
    per-lang JS term is rounded to the 1e-9 integer lattice BEFORE the
    cross-lang sum (libm-portable — raw ln-sums are the class that
    flipped customer_survival_curve on the r8 driver), and the exact
    integer sum rounds once to 6 dp."""
    d = _t(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    langs = cnt.select("lang").distinct()
    pairs = tot.alias("a").join(
        F.broadcast(tot.alias("b")),
        F.col("a.source") < F.col("b.source"),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    grid = (
        pairs.join(F.broadcast(langs))
        .join(
            F.broadcast(
                cnt.select(
                    F.col("source").alias("source_a"),
                    "lang",
                    F.col("c").alias("_ca"),
                )
            ),
            on=["source_a", "lang"],
            how="left",
        )
        .join(
            F.broadcast(
                cnt.select(
                    F.col("source").alias("source_b"),
                    "lang",
                    F.col("c").alias("_cb"),
                )
            ),
            on=["source_b", "lang"],
            how="left",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            (F.coalesce("_ca", F.lit(0)) / F.col("n_a").cast("double")).alias(
                "pa"
            ),
            (F.coalesce("_cb", F.lit(0)) / F.col("n_b").cast("double")).alias(
                "pb"
            ),
        )
    )
    half = F.lit(0.5)
    term_a = F.when(
        F.col("pa") > 0,
        half * F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("pb") > 0,
        half * F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    # each per-lang JS term rounds to the 1e-9 integer lattice BEFORE
    # the cross-lang sum (transcendentals are libm-build-dependent; raw
    # ln-sums flipped a rounding boundary on the r8 driver for the KM
    # fold — integer sums cannot)
    term9 = F.round((term_a + term_b) * F.lit(1e9), 0).cast("bigint")
    return (
        grid.groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            # hash the lattice sum directly — round(sum/1e9, 6) was a
            # decimal-tie surface (exact tie at sum % 1000 == 500, the
            # hazard defect class)
            F.sum(term9).cast("bigint").alias("js_nanos")
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "part_skyline",
    oracle="""
    WITH p AS (
        SELECT p_partkey,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents,
               p_size
        FROM part
    ), ann AS (
        SELECT p_partkey, cents, p_size,
               MAX(p_size) OVER (
                   ORDER BY cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pm,
               MAX(p_size) OVER (PARTITION BY cents) AS lm
        FROM p
    )
    SELECT p_partkey, round(cents / 100.0, 2) AS price,
           CAST(p_size AS INT) AS p_size
    FROM ann
    WHERE (pm IS NULL OR pm < p_size) AND p_size = lm
    ORDER BY cents, p_partkey
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on (cheaper
    price, larger size) — the "best tradeoff" query behind product /
    candidate shortlisting.  The sequential textbook algorithm is a
    global sort + running max (single task); this runs the distributed
    level-frame decomposition in ``operators/skyline.py`` — one grouped
    agg to |distinct prices| rows, an exact two-pass prefix-max over
    range partitions, and a broadcast map-side filter back over the
    scan.  The oracle recomputes dominance with an explicit RANGE
    window over the full sort, pinning the decomposition's
    equivalence."""
    from high_throughput_etl_pipeline_spark.operators.skyline import (
        skyline_2d,
    )

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    sky = skyline_2d(p, "cents", "p_size")
    return sky.select(
        "p_partkey",
        F.round(F.col("cents") / 100.0, 2).alias("price"),
        "p_size",
        "cents",
    ).orderBy("cents", "p_partkey").drop("cents")


@query(
    "part_cooccurrence_similarity",
    oracle="""
    WITH lp AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord
        FROM lp GROUP BY l_partkey
    ), co AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(COUNT(*) AS BIGINT) AS co_orders
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), sym AS (
        SELECT pa AS part_a, pb AS part_b, co_orders FROM co
        UNION ALL
        SELECT pb, pa, co_orders FROM co
    ), scored AS (
        SELECT s.part_a, s.part_b, s.co_orders,
               round(s.co_orders
                     / sqrt(CAST(na.n_ord * nb.n_ord AS DOUBLE)), 6)
                   AS cosine
        FROM sym s
        JOIN n na ON s.part_a = na.l_partkey
        JOIN n nb ON s.part_b = nb.l_partkey
        WHERE s.part_a <= 100
    )
    SELECT part_a, part_b, co_orders, cosine, rank FROM (
        SELECT part_a, part_b, co_orders, cosine,
               CAST(row_number() OVER (
                   PARTITION BY part_a ORDER BY cosine DESC, part_b
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    ORDER BY part_a, rank
    """,
)
def part_cooccurrence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity over order
    co-occurrence (co / √(n_a·n_b)), top-5 neighbours per part — the
    "customers also bought" primitive.  The pair join is keyed on
    l_orderkey and baskets are bounded (≤7 lines in TPC-H), so pair
    mass is O(rows·basket), never quadratic in the catalog; ranking
    windows partition by part (parallel).  The audited slice
    (part_a ≤ 100) bounds the driver row — similarity is computed for
    the whole catalog."""
    li = _t(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    n = lp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ord")
    )
    a = lp.alias("a")
    b = lp.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_orders"))
    )
    sym = co.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        "co_orders",
    ).unionByName(
        co.select(
            F.col("pb").alias("part_a"),
            F.col("pa").alias("part_b"),
            "co_orders",
        )
    )
    scored = (
        sym.filter(F.col("part_a") <= 100)
        .join(
            n.select(
                F.col("l_partkey").alias("part_a"),
                F.col("n_ord").alias("_na"),
            ),
            on="part_a",
        )
        .join(
            n.select(
                F.col("l_partkey").alias("part_b"),
                F.col("n_ord").alias("_nb"),
            ),
            on="part_b",
        )
        .select(
            "part_a",
            "part_b",
            "co_orders",
            F.round(
                F.col("co_orders")
                / F.sqrt((F.col("_na") * F.col("_nb")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("part_a").orderBy(
        F.desc("cosine"), F.col("part_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= 5)
        .orderBy("part_a", "rank")
    )


@query(
    "customer_survival_curve",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ), hz AS (
        SELECT MAX(d) AS h FROM o
    ), gaps AS (
        SELECT CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS dur,
               1 AS ev
        FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
    ), cens AS (
        SELECT CAST(date_diff('day', MAX(d), (SELECT h FROM hz))
                    AS BIGINT) AS dur,
               0 AS ev
        FROM o GROUP BY o_custkey
    ), durs AS (
        SELECT dur, ev FROM gaps WHERE dur IS NOT NULL
        UNION ALL SELECT dur, ev FROM cens
    ), tbl AS (
        SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM durs GROUP BY dur
    ), tot AS (
        SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM tbl
    ), risk AS (
        SELECT dur, d, c,
               (SELECT n FROM tot)
                   - COALESCE(SUM(d + c) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
        FROM tbl
    ), curve AS (
        SELECT r.dur, r.d, r.c, r.n_risk,
               list_reduce(
                   list_prepend(CAST(1.0 AS DOUBLE),
                       list(CAST(f.n_risk - f.d AS DOUBLE)
                                / CAST(f.n_risk AS DOUBLE)
                            ORDER BY f.dur)),
                   (acc, x) -> acc * x) AS surv_raw
        FROM risk r JOIN risk f ON f.dur <= r.dur
        GROUP BY r.dur, r.d, r.c, r.n_risk
    )
    SELECT dur AS duration_days, n_risk, d AS d_events, c AS c_censored,
           CAST(floor(surv_raw * 1e6 + 0.5) AS BIGINT) AS survival_micros
    FROM curve ORDER BY dur
    """,
)
def customer_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over customer reorder intervals —
    "probability a customer has NOT reordered by day t", with each
    customer's last order right-censored at the corpus horizon.  Gap
    extraction is a per-customer window (keyed, parallel); the KM
    product Π(1 − dᵢ/nᵢ) = Π((nᵢ−dᵢ)/nᵢ) is an exact rational, so it is
    folded as an ORDERED FLOAT PRODUCT with NO transcendental anywhere:
    per output row, acc × (n−d)/n over all life-table rows of smaller
    duration, in duration order.  IEEE ÷ and × are correctly rounded on
    every engine, so the fold is bit-identical between Spark and DuckDB
    (two prior rounds proved ln/exp variants are NOT: a raw ln-sum and
    then a 1e-12-lattice ln-sum each hash-matched locally yet flipped on
    the driver's libm).  The life table is |distinct day gaps| rows —
    ~1k at any corpus size — so the triangular self-join feeding each
    row's fold is a few hundred thousand pairs, post-aggregation.  A
    risk set hitting zero gives a factor of exactly 0.0, which the
    product propagates exactly — no special case needed.  The HASHED
    output is integer-only (r11): ``survival_micros =
    floor(surv_raw * 1e6 + 0.5)`` — floor is exact and ×/+ are
    correctly-rounded IEEE, so even a driver-side DuckDB whose
    ``round()`` tie-breaks differently from ours hashes identically;
    the r8-r10 driver reds all sat in the round()/repr surface that
    this removes.  The four ``customer_survival_debug_*`` stage
    queries decompose this pipeline into integer-only checkpoints so
    one driver run localizes any remaining divergence."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    hz = o.agg(F.max("d").alias("_h"))
    wcust = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.withColumn(
            "dur", F.datediff("d", F.lag("d").over(wcust)).cast("bigint")
        )
        .filter(F.col("dur").isNotNull())
        .select("dur", F.lit(1).alias("ev"))
    )
    cens = (
        o.groupBy("o_custkey")
        .agg(F.max("d").alias("_last"))
        .join(F.broadcast(hz))
        .select(
            F.datediff("_h", "_last").cast("bigint").alias("dur"),
            F.lit(0).alias("ev"),
        )
    )
    tbl = (
        gaps.unionByName(cens)
        .groupBy("dur")
        .agg(
            F.sum("ev").cast("bigint").alias("d"),
            F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
        )
    )
    tot = tbl.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("_n"))
    wprev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = tbl.join(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("_n")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)),
    )
    factors = risk.select(
        F.col("dur").alias("fdur"),
        (
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ).alias("factor"),
    )
    curve = (
        risk.join(F.broadcast(factors), F.col("fdur") <= F.col("dur"))
        .groupBy("dur", "d", "c", "n_risk")
        .agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("fdur", "factor"))
                ),
                F.lit(1.0).cast("double"),
                lambda acc, x: acc * x["factor"],
            ).alias("surv_raw")
        )
    )
    return curve.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"),
        F.floor(F.col("surv_raw") * F.lit(1e6) + F.lit(0.5)).alias(
            "survival_micros"
        ),
    ).orderBy("duration_days")


@query(
    "orders_fd_audit",
    oracle="""
    WITH j AS (
        SELECT o.o_custkey, o.o_orderpriority, o.o_orderstatus,
               c.c_nationkey, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), pairs AS (
        SELECT 'custkey->mktsegment' AS fd, CAST(o_custkey AS VARCHAR) AS det,
               c_mktsegment AS dep FROM j
        UNION ALL
        SELECT 'custkey->nationkey', CAST(o_custkey AS VARCHAR),
               CAST(c_nationkey AS VARCHAR) FROM j
        UNION ALL
        SELECT 'mktsegment->orderpriority', c_mktsegment,
               o_orderpriority FROM j
        UNION ALL
        SELECT 'nationkey->mktsegment', CAST(c_nationkey AS VARCHAR),
               c_mktsegment FROM j
    ), per_key AS (
        SELECT fd, det, COUNT(DISTINCT dep) AS n_dep
        FROM pairs GROUP BY fd, det
    )
    SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_keys,
           SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds,
           round(1.0 - SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS strength
    FROM per_key GROUP BY fd ORDER BY fd
    """,
)
def orders_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — data profiling's schema-discovery
    primitive: for each candidate A→B, how many A-keys map to more than
    one B value.  All four candidates ride ONE explode + ONE grouped
    count-distinct (map-side partials), not a shuffle per candidate;
    the per-key frame then collapses to 4 audit rows.  custkey-rooted
    FDs hold by construction (join key); the cross-attribute candidates
    quantify how far mktsegment/nationkey are from determining order
    attributes — the "is this column derivable" question before
    denormalizing a 100 TB table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            "c_nationkey",
            "c_mktsegment",
        ),
        on="o_custkey",
    )
    pairs = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("custkey->mktsegment").alias("fd"),
                    F.col("o_custkey").cast("string").alias("det"),
                    F.col("c_mktsegment").cast("string").alias("dep"),
                ),
                F.struct(
                    F.lit("custkey->nationkey").alias("fd"),
                    F.col("o_custkey").cast("string").alias("det"),
                    F.col("c_nationkey").cast("string").alias("dep"),
                ),
                F.struct(
                    F.lit("mktsegment->orderpriority").alias("fd"),
                    F.col("c_mktsegment").cast("string").alias("det"),
                    F.col("o_orderpriority").cast("string").alias("dep"),
                ),
                F.struct(
                    F.lit("nationkey->mktsegment").alias("fd"),
                    F.col("c_nationkey").cast("string").alias("det"),
                    F.col("c_mktsegment").cast("string").alias("dep"),
                ),
            )
        ).alias("p")
    ).select("p.fd", "p.det", "p.dep")
    per_key = pairs.groupBy("fd", "det").agg(
        F.countDistinct("dep").alias("n_dep")
    )
    viol = F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
    return (
        per_key.groupBy("fd")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            viol.cast("bigint").alias("violating_keys"),
        )
        .select(
            "fd",
            "n_keys",
            "violating_keys",
            (F.col("violating_keys") == 0).alias("fd_holds"),
            F.round(
                1.0
                - F.col("violating_keys") / F.col("n_keys").cast("double"),
                6,
            ).alias("strength"),
        )
        .orderBy("fd")
    )


@query(
    "classifier_auc_eval",
    oracle="""
    WITH w AS (
        SELECT i AS fid,
               (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 18, 15))
                   ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM generate_series(0, 4095) t(i)
    ), tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), s AS (
        SELECT doc_id, MAX(lang) AS lang,
               CAST(round(SUM(wt) / COUNT(*) * 1e6, 0) AS BIGINT) AS sv
        FROM feat JOIN w ON feat.fid = w.fid
        GROUP BY doc_id
    ), r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(2 * rank() OVER (ORDER BY sv)
                    + COUNT(*) OVER (PARTITION BY sv) - 1 AS HUGEINT) AS mr2
        FROM s
    ), agg AS (
        SELECT CAST(SUM(pos) AS HUGEINT) AS np,
               CAST(COUNT(*) - SUM(pos) AS HUGEINT) AS nn,
               SUM(CASE WHEN pos = 1 THEN mr2 ELSE 0 END) AS mr2p
        FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round(CAST(mr2p - np * (np + 1) AS DOUBLE)
                 / CAST(2 * np * nn AS DOUBLE), 6) AS auc,
           round(CAST(mr2p - np * (np + 1) AS DOUBLE)
                 / CAST(np * nn AS DOUBLE) - 1.0, 6) AS gini
    FROM agg
    """,
)
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the hashed linear classifier at separating English
    documents — the Mann-Whitney formulation: AUC = (Σ midranks of
    positives − n₊(n₊+1)/2) / (n₊·n₋), with exact tie midranks on the
    2× integer lattice.  No global rank over the corpus: ranks depend
    only on the score-value histogram, so the plan is ONE grouped count
    per distinct (rounded) score plus an exact distributed prefix sum
    over the histogram (:func:`ranking.global_cumsum` two-pass shape) —
    every moment stays decimal-exact, the statistic is two integer
    divisions."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    dec = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    w = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, w, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    hist = scored.groupBy("sv").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("pos").cast(dec).alias("pos_c"),
    )
    cum, _total = global_cumsum(hist, [F.col("sv")], "cnt")
    # 2·midrank for every row at score sv = 2·(cum_before) + cnt + 1
    # = 2·cum − cnt + 1 (cum is the inclusive prefix count)
    mr2 = F.lit(2) * F.col("cum") - F.col("cnt").cast(dec) + 1
    agg = cum.agg(
        F.sum("pos_c").alias("np"),
        F.sum(F.col("cnt").cast(dec) - F.col("pos_c")).alias("nn"),
        F.sum(F.col("pos_c") * mr2).alias("mr2p"),
    )
    num = F.col("mr2p") - F.col("np") * (F.col("np") + 1)
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.round(
            num.cast("double")
            / (F.lit(2) * F.col("np") * F.col("nn")).cast("double"),
            6,
        ).alias("auc"),
        F.round(
            num.cast("double") / (F.col("np") * F.col("nn")).cast("double")
            - 1.0,
            6,
        ).alias("gini"),
    )


@query(
    "events_conformal_intervals",
    oracle="""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               ('0x' || substr(md5('conf-v1:' || CAST(event_id AS VARCHAR)),
                               18, 15))::BIGINT % 10 AS b
        FROM events
    ), med AS (
        SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                   AS med_cents,
               MAX(n) AS n_train
        FROM (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM e WHERE b < 6
        ) GROUP BY event_type
    ), cal AS (
        SELECT event_type,
               MAX(CASE WHEN rn = q_rank THEN resid END) AS q_cents,
               MAX(n) AS n_cal
        FROM (
            SELECT e.event_type, abs(e.cents - m.med_cents) AS resid,
                   row_number() OVER (PARTITION BY e.event_type
                                      ORDER BY abs(e.cents - m.med_cents),
                                               e.event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY e.event_type) AS n,
                   LEAST(CAST(ceil(0.9 * (COUNT(*) OVER (
                       PARTITION BY e.event_type) + 1)) AS BIGINT),
                       COUNT(*) OVER (PARTITION BY e.event_type)) AS q_rank
            FROM e JOIN med m ON e.event_type = m.event_type
            WHERE e.b IN (6, 7)
        ) GROUP BY event_type
    ), test AS (
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN abs(e.cents - m.med_cents) <= c.q_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM e
        JOIN med m ON e.event_type = m.event_type
        JOIN cal c ON e.event_type = c.event_type
        WHERE e.b >= 8
        GROUP BY e.event_type
    )
    SELECT m.event_type,
           CAST(m.n_train AS BIGINT) AS n_train,
           CAST(c.n_cal AS BIGINT) AS n_cal,
           t.n_test,
           round(m.med_cents / 100.0, 2) AS median_value,
           round(c.q_cents / 100.0, 2) AS q_alpha,
           round(t.covered / CAST(t.n_test AS DOUBLE), 6) AS coverage
    FROM med m
    JOIN cal c ON m.event_type = c.event_type
    JOIN test t ON m.event_type = t.event_type
    ORDER BY m.event_type
    """,
)
def events_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type: train/cal/
    test by keyed hash (60/20/20), point predictor = train median (exact
    rank selection), radius = the ⌈0.9·(n+1)⌉-th smallest calibration
    residual, and the empirical test coverage of median ± radius — the
    distribution-free uncertainty wrapper around ANY predictor, whose
    coverage guarantee (~90 %) is checked on data the quantile never
    saw.  Every quantile is integer rank selection over partitioned
    windows (keyed by type, parallel); the calibration join is a
    broadcast of |types| medians."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.pmod(
            md5_64(
                F.concat(
                    F.lit("conf-v1:"), F.col("event_id").cast("string")
                )
            ),
            F.lit(10),
        ).alias("b"),
    )
    wtr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wt = Window.partitionBy("event_type")
    med = (
        e.filter(F.col("b") < 6)
        .select(
            "event_type",
            "cents",
            F.row_number().over(wtr).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents")
                )
            ).alias("med_cents"),
            F.max("n").alias("n_train"),
        )
    )
    calr = (
        e.filter(F.col("b").isin(6, 7))
        .join(F.broadcast(med), on="event_type")
        .withColumn("resid", F.abs(F.col("cents") - F.col("med_cents")))
    )
    wcr = Window.partitionBy("event_type").orderBy("resid", "event_id")
    cal = (
        calr.select(
            "event_type",
            "resid",
            F.row_number().over(wcr).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("n"),
            F.least(
                F.ceil(0.9 * (F.count(F.lit(1)).over(wt) + 1)).cast(
                    "bigint"
                ),
                F.count(F.lit(1)).over(wt).cast("bigint"),
            ).alias("q_rank"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("rn") == F.col("q_rank"), F.col("resid"))
            ).alias("q_cents"),
            F.max("n").alias("n_cal"),
        )
    )
    test = (
        e.filter(F.col("b") >= 8)
        .join(F.broadcast(med.select("event_type", "med_cents")), "event_type")
        .join(F.broadcast(cal.select("event_type", "q_cents")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cents"))
                    <= F.col("q_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        med.join(cal, on="event_type")
        .join(test, on="event_type")
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
            "n_test",
            F.round(F.col("med_cents") / 100.0, 2).alias("median_value"),
            F.round(F.col("q_cents") / 100.0, 2).alias("q_alpha"),
            F.round(
                F.col("covered") / F.col("n_test").cast("double"), 6
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


def _ndcg_disc_lattice() -> list[int]:
    """Rank discounts 1/log2(r+1) for r=1..10 on the 1e9 integer
    lattice — computed ONCE in Python and embedded in both engines
    (shared-literal idiom), so neither engine's libm log2 enters the
    cross-rank DCG sum."""
    import math

    return [round(1e9 / math.log2(r + 1)) for r in range(1, 11)]


def _ann_recall_oracle() -> str:
    import math

    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, 11))
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), c AS (
        SELECT CAST(vec_id AS INT) AS list_id, ev AS center
        FROM v WHERE vec_id < 8
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 3
    ), ex0 AS (
        SELECT q.query_id, v.vec_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round(list_dot_product(v.ev, q.qv)
                       / (sqrt(list_dot_product(v.ev, v.ev))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                       v.vec_id
               ) AS r0
        FROM v CROSS JOIN q
        QUALIFY r0 <= 11
    ), ex AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY r0)
                   AS ex_rank
        FROM ex0 WHERE vec_id <> query_id
        QUALIFY ex_rank <= 10
    ), vd AS (
        SELECT v.vec_id, v.ev, c.list_id,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(v.ev)),
                       i -> (v.ev[i] - c.center[i]) * (v.ev[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM v CROSS JOIN c
    ), va AS (
        SELECT vec_id, ev, list_id FROM vd WHERE rn = 1
    ), qd AS (
        SELECT q.query_id, q.qv, c.list_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_sum(list_transform(
                       generate_series(1, len(q.qv)),
                       i -> (q.qv[i] - c.center[i]) * (q.qv[i] - c.center[i])
                   )), c.list_id
               ) AS rn
        FROM q CROSS JOIN c
    ), qp AS (
        SELECT query_id, qv, list_id FROM qd WHERE rn <= 4
    ), ap0 AS (
        SELECT qp.query_id, va.vec_id,
               row_number() OVER (
                   PARTITION BY qp.query_id
                   ORDER BY round(list_dot_product(va.ev, qp.qv)
                       / (sqrt(list_dot_product(va.ev, va.ev))
                          * sqrt(list_dot_product(qp.qv, qp.qv))), 6) DESC,
                       va.vec_id
               ) AS r0
        FROM va JOIN qp ON va.list_id = qp.list_id
        QUALIFY r0 <= 11
    ), ap AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY r0)
                   AS ap_rank
        FROM ap0 WHERE vec_id <> query_id
        QUALIFY ap_rank <= 10
    ), joined AS (
        SELECT ap.query_id, ap.ap_rank, ex.ex_rank
        FROM ap LEFT JOIN ex
          ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN ex_rank IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap,
           round(SUM(CASE WHEN ex_rank IS NOT NULL THEN 1 ELSE 0 END)
                 / 10.0, 6) AS recall_at_10,
           round(COALESCE(MAX(CASE WHEN ex_rank = 1
                                   THEN 1.0 / ap_rank END), 0.0), 6)
               AS mrr,
           round(CAST(SUM(CASE WHEN ex_rank IS NOT NULL
                          THEN [{', '.join(str(d) for d in
                                           _ndcg_disc_lattice())}][ap_rank]
                          ELSE 0 END) AS DOUBLE) / 1e9
                 / {idcg!r}, 6) AS ndcg_at_10
    FROM joined GROUP BY query_id ORDER BY query_id
    """


@query("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the IVF index against exact
    ground truth — recall@10, MRR, and binary NDCG@10 per query, with
    the self-hit excluded from both lists (retrieve 11, drop self,
    renumber).  This is the accuracy side of the ANN speed/recall
    tradeoff: the frozen-quantizer IVF (same machinery as ann_ivf_topk)
    probes 4 of 8 cells, and every metric is value-checked because the
    oracle replays BOTH retrievals.  The eval joins two k-row-per-query
    frames — metadata-scale regardless of corpus size."""
    import math

    from high_throughput_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, 11))
    e = _t(spark, sf_dir, "embeddings")
    centers = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").cast("array<double>").alias("center"),
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def _drop_self(df: DataFrame, new_rank: str) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy("rank")
        return (
            df.filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(new_rank, F.row_number().over(w))
            .filter(F.col(new_rank) <= 10)
            .select("query_id", "vec_id", new_rank)
        )

    ex = _drop_self(cosine_topk(e, q, k=11), "ex_rank")
    ap = _drop_self(
        ivf_topk(e, q, k=11, nprobe=4, centers=centers), "ap_rank"
    )
    joined = ap.join(F.broadcast(ex), on=["query_id", "vec_id"], how="left")
    hit = F.col("ex_rank").isNotNull()
    return (
        joined.groupBy("query_id")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(
                "n_overlap"
            ),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)) / 10.0, 6
            ).alias("recall_at_10"),
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("ex_rank") == 1, 1.0 / F.col("ap_rank")
                        )
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.sum(
                    F.when(
                        hit,
                        F.element_at(
                            F.array(
                                [F.lit(d) for d in _ndcg_disc_lattice()]
                            ),
                            F.col("ap_rank"),
                        ),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.lit(1e9)
                / F.lit(idcg),
                6,
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


@query(
    "events_cuped_adjusted",
    oracle="""
    WITH hz AS (
        SELECT MAX(ts) - INTERVAL 14 DAY AS cutoff FROM events
    ), u AS (
        SELECT user_id,
               ('0x' || substr(md5('cuped-v1:' || CAST(user_id AS VARCHAR)),
                               18, 15))::BIGINT % 2 AS arm,
               SUM(CASE WHEN ts < (SELECT cutoff FROM hz)
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN ts >= (SELECT cutoff FROM hz)
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ), a AS (
        SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM u GROUP BY arm
    ), p AS (
        SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
               SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy,
               MAX(CASE WHEN arm = 0 THEN n END) AS na,
               MAX(CASE WHEN arm = 1 THEN n END) AS nb,
               MAX(CASE WHEN arm = 0 THEN sx END) AS sxa,
               MAX(CASE WHEN arm = 1 THEN sx END) AS sxb,
               MAX(CASE WHEN arm = 0 THEN sy END) AS sya,
               MAX(CASE WHEN arm = 1 THEN sy END) AS syb
        FROM a
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round((CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100.0, 6)
               AS raw_diff,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
           round((CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100.0
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                   * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
                      - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100.0,
                 6) AS adjusted_diff,
           round(1.0 - (CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * sy / CAST(n AS DOUBLE)
                        - 2.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
                                 / CAST(n * sxx - sx * sx AS DOUBLE))
                              * (CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * sy
                                   / CAST(n AS DOUBLE))
                        + (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                          * (CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE))
                          * (CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx / CAST(n AS DOUBLE)))
                       / (CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * sy / CAST(n AS DOUBLE)),
                 6) AS var_reduction
    FROM p
    """,
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: users hash into two arms,
    the experiment metric is per-user value in the last 14 days, the
    covariate is the user's pre-period value, θ = cov(pre,post)/var(pre)
    pooled, and the adjusted lift is Δpost − θ·Δpre.  Everything
    reduces to per-arm raw moments (n, Σx, Σy, Σx², Σxy, Σy²) in exact
    decimal(38,0) — ONE grouped agg per user, ONE 2-row arm agg — so the
    estimator, θ, and the variance-reduction ratio are each a handful of
    deterministic float ops over exact integers.  The algebraic form
    (never materializing per-user adjusted values) is what makes the
    statistic hash-stable AND one-pass at any scale."""
    e = _t(spark, sf_dir, "events")
    hz = e.agg(
        (F.max("ts") - F.expr("INTERVAL 14 DAYS")).alias("cutoff")
    )
    dec = "decimal(38,0)"
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    u = (
        e.join(F.broadcast(hz))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < F.col("cutoff"), cents).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts") >= F.col("cutoff"), cents).otherwise(0)
            ).alias("y"),
        )
        .select(
            F.pmod(
                md5_64(
                    F.concat(
                        F.lit("cuped-v1:"), F.col("user_id").cast("string")
                    )
                ),
                F.lit(2),
            ).alias("arm"),
            F.col("x").cast(dec).alias("x"),
            F.col("y").cast(dec).alias("y"),
        )
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    p = a.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
        F.sum("syy").alias("syy"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sxa"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sxb"),
        F.max(F.when(F.col("arm") == 0, F.col("sy"))).alias("sya"),
        F.max(F.when(F.col("arm") == 1, F.col("sy"))).alias("syb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    raw_diff = (d("sya") / d("na") - d("syb") / d("nb")) / 100.0
    pre_diff = (d("sxa") / d("na") - d("sxb") / d("nb")) / 100.0
    cyy = d("syy") - d("sy") * F.col("sy").cast("double") / d("n")
    cxy = d("sxy") - d("sx") * F.col("sy").cast("double") / d("n")
    cxx = d("sxx") - d("sx") * F.col("sx").cast("double") / d("n")
    return p.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(raw_diff, 6).alias("raw_diff"),
        F.round(theta, 6).alias("theta"),
        F.round(raw_diff - theta * pre_diff, 6).alias("adjusted_diff"),
        F.round(
            1.0 - (cyy - 2.0 * theta * cxy + theta * theta * cxx) / cyy, 6
        ).alias("var_reduction"),
    )


def _hrw_oracle() -> str:
    def entries(n: int) -> str:
        return ", ".join(
            "{'h': ('0x' || substr(md5('hrw:' || CAST(user_id AS VARCHAR)"
            f" || ':{s}'), 18, 15))::BIGINT, 's': {s}}}"
            for s in range(n)
        )

    return f"""
    WITH u AS (
        SELECT DISTINCT user_id FROM events
    ), a AS (
        SELECT user_id,
               list_max([{entries(8)}])['s'] AS shard8,
               list_max([{entries(9)}])['s'] AS shard9
        FROM u
    )
    SELECT CAST(shard8 AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved,
           COALESCE(bool_and(CASE WHEN shard9 <> shard8
                                  THEN shard9 = 8 END), TRUE)
               AS moved_only_to_new
    FROM a GROUP BY shard8 ORDER BY shard
    """


@query("events_rendezvous_shards", oracle=_hrw_oracle())
def events_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-routing primitive: each user goes to argmax over shards
    of hash(user, shard), so growing 8 → 9 shards moves ONLY the ~1/9
    of keys that now win on the new shard, never between old shards
    (``moved_only_to_new`` pins exactly that invariant per shard).
    Pure map-side projection — the argmax is array_max over an inline
    struct array, no explode, no extra shuffle beyond the distinct —
    this is how a 1000-executor pipeline routes state without a global
    rebalance on every resize."""
    from high_throughput_etl_pipeline_spark.operators.layout import (
        rendezvous_shard,
    )

    e = _t(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    a = u.select(
        rendezvous_shard(F.col("user_id"), 8).alias("shard8"),
        rendezvous_shard(F.col("user_id"), 9).alias("shard9"),
    )
    moved = F.col("shard9") != F.col("shard8")
    return (
        a.groupBy(F.col("shard8").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.when(moved, 1).otherwise(0))
            .cast("bigint")
            .alias("n_moved"),
            F.coalesce(
                F.bool_and(F.when(moved, F.col("shard9") == 8)),
                F.lit(True),
            ).alias("moved_only_to_new"),
        )
        .orderBy("shard")
    )


@query(
    "events_ewma_daily",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type,
               list(n ORDER BY day) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS total,
               max_by(n, day) AS last_count
        FROM d GROUP BY event_type
    )
    SELECT event_type, n_days, last_count,
           round(total / CAST(n_days AS DOUBLE), 6) AS mean_daily,
           round(list_reduce(
               list_transform(xs, x -> CAST(x AS DOUBLE)),
               (acc, x) -> 0.5 * x + 0.5 * acc
           ), 6) AS ewma
    FROM s ORDER BY event_type
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 0.5) of daily event
    counts per type — the smoothed "current level" statistic behind
    alert thresholds and trend dashboards.  The recurrence
    s_d = α·x_d + (1−α)·s_{d−1} is inherently ordered, so it folds over
    the per-type day series with an ordered higher-order aggregate
    (sort_array(collect_list) → F.aggregate) — the same engine-portable
    ordered-fold discipline as doc_rake_keywords.  The folded frame is
    |types × days| rows; the fold itself touches |days| values per
    type — both trivial at any event volume, and both engines execute
    the identical float sequence, so the EWMA hash-matches."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = d.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("day"), F.col("n")))
        ).alias("series"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("total"),
        F.max_by("n", "day").alias("last_count"),
    )
    xs = F.transform(F.col("series"), lambda r: r["n"].cast("double"))
    return s.select(
        "event_type",
        "n_days",
        "last_count",
        F.round(F.col("total") / F.col("n_days").cast("double"), 6).alias(
            "mean_daily"
        ),
        F.round(
            F.aggregate(
                F.slice(xs, 2, 100000),
                F.element_at(xs, 1),
                lambda acc, x: 0.5 * x + 0.5 * acc,
            ),
            6,
        ).alias("ewma"),
    ).orderBy("event_type")


def _community_modularity_oracle(rounds: int = 3) -> str:
    lp = _label_propagation_oracle(rounds)
    head, _, _tail = lp.rpartition("SELECT id AS vec_id")
    return (
        head
        + f""",
    comm AS (
        SELECT id, COALESCE(lbl, -1) AS c FROM l{rounds}
    ),
    pe AS (
        SELECT ca.c AS c_a, cb.c AS c_b
        FROM pairs p
        JOIN comm ca ON p.id_a = ca.id
        JOIN comm cb ON p.id_b = cb.id
    ),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM pe),
    deg AS (
        SELECT c, CAST(COUNT(*) AS HUGEINT) AS d FROM (
            SELECT c_a AS c FROM pe UNION ALL SELECT c_b FROM pe
        ) GROUP BY c
    ),
    intra AS (
        SELECT c_a AS c, CAST(COUNT(*) AS HUGEINT) AS e
        FROM pe WHERE c_a = c_b GROUP BY c_a
    )
    SELECT CAST(deg.c AS BIGINT) AS community,
           CAST(COALESCE(intra.e, 0) AS BIGINT) AS intra_edges,
           CAST(deg.d AS BIGINT) AS degree_sum,
           round(CAST(4 * m.m * COALESCE(intra.e, 0) - deg.d * deg.d
                      AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE), 6) AS contribution
    FROM deg CROSS JOIN m
    LEFT JOIN intra ON deg.c = intra.c
    ORDER BY community
    """
    )


@query(
    "embedding_community_modularity",
    oracle=_community_modularity_oracle(),
)
def embedding_community_modularity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman modularity of the label-propagation communities over the
    embedding near-dup graph — "did propagation find real structure":
    per community, Q_c = e_c/m − (d_c/2m)², exactly as
    (4m·e_c − d_c²)/4m² from integer edge/degree counts (only the final
    division is float).  Unlabeled nodes pool into community −1, so
    cross-community edges exist and the statistic is non-degenerate
    (unlike modularity of connected components, which is 1 − Σ(d/2m)²
    by construction).  Pair generation rides the banded LSH channel;
    everything downstream operates on the pair list and a
    |communities|-row frame."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    e = _t(spark, sf_dir, "embeddings")
    seeds = e.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") % 5 == 0, F.col("label")).alias("lbl"),
    )
    pairs = embedding_near_duplicates(
        e,
        threshold=_ND_THRESHOLD,
        n_tables=_ND_TABLES,
        bits_per_table=None,
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    comm = label_propagation(
        seeds, edges, rounds=3, label_col="lbl", max_label=1023
    ).select("id", F.coalesce(F.col("lbl"), F.lit(-1)).alias("c"))
    pe = (
        pairs.join(
            comm.select(F.col("id").alias("id_a"), F.col("c").alias("c_a")),
            on="id_a",
        )
        .join(
            comm.select(F.col("id").alias("id_b"), F.col("c").alias("c_b")),
            on="id_b",
        )
        .select("c_a", "c_b")
    )
    dec = "decimal(38,0)"
    m = pe.agg(F.count(F.lit(1)).cast(dec).alias("m"))
    deg = (
        pe.select(F.col("c_a").alias("c"))
        .unionAll(pe.select(F.col("c_b").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast(dec).alias("d"))
    )
    intra = (
        pe.filter(F.col("c_a") == F.col("c_b"))
        .groupBy(F.col("c_a").alias("c"))
        .agg(F.count(F.lit(1)).cast(dec).alias("e"))
    )
    return (
        deg.join(intra, on="c", how="left")
        .join(F.broadcast(m))
        .select(
            F.col("c").cast("bigint").alias("community"),
            F.coalesce(F.col("e"), F.lit(0).cast(dec))
            .cast("bigint")
            .alias("intra_edges"),
            F.col("d").cast("bigint").alias("degree_sum"),
            F.round(
                (
                    F.lit(4) * F.col("m")
                    * F.coalesce(F.col("e"), F.lit(0).cast(dec))
                    - F.col("d") * F.col("d")
                ).cast("double")
                / (F.lit(4) * F.col("m") * F.col("m")).cast("double"),
                6,
            ).alias("contribution"),
        )
        .orderBy("community")
    )


@query(
    "classifier_calibration_curve",
    oracle="""
    WITH w AS (
        SELECT i AS fid,
               (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 18, 15))
                   ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM generate_series(0, 4095) t(i)
    ), tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), s AS (
        SELECT doc_id, MAX(lang) AS lang,
               CAST(round(SUM(wt) / COUNT(*) * 1e6, 0) AS BIGINT) AS sv
        FROM feat JOIN w ON feat.fid = w.fid
        GROUP BY doc_id
    ), r AS (
        SELECT sv, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               row_number() OVER (ORDER BY sv, doc_id) AS rk,
               COUNT(*) OVER () AS n
        FROM s
    )
    SELECT CAST((rk - 1) * 10 // n AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN SUM(sv) >= 0
                     THEN (2 * SUM(sv) + COUNT(*)) // (2 * COUNT(*))
                     ELSE -((2 * -SUM(sv) + COUNT(*)) // (2 * COUNT(*)))
                END AS BIGINT) AS mean_score_micros,
           round(SUM(pos) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
    FROM r GROUP BY bucket ORDER BY bucket
    """,
)
def classifier_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the hashed classifier: score deciles
    (equi-depth, exact global ranks via the two-pass
    :func:`ranking.global_rank` shape — no single-task sort) vs the
    observed positive rate per decile.  A well-calibrated scorer shows
    pos_rate monotone in mean_score; the bucket rows are what an ML
    engineer plots before trusting thresholds.  Scores round to the
    1e-6 lattice first, so bucket membership and all sums are exact
    integers on both engines."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    w = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, w, n_features=4096).select(
        "doc_id",
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    ranked, total = global_rank(
        scored, [F.col("sv"), F.col("doc_id")], rank_col="rk"
    )
    return (
        ranked.groupBy(
            ((F.col("rk") - 1) * 10 / F.lit(total))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # integer half-away-from-zero mean in micros — the prior
            # round(sum/n/1e6, 6) is a mean-of-lattice decimal-tie
            # surface; sv is signed, and Spark's `div` truncates while
            # DuckDB's `//` floors, so route through ABS on both sides
            F.expr(
                "CAST(CASE WHEN SUM(sv) >= 0"
                " THEN (2 * SUM(sv) + COUNT(*)) div (2 * COUNT(*))"
                " ELSE -((2 * -SUM(sv) + COUNT(*)) div (2 * COUNT(*)))"
                " END AS BIGINT)"
            ).alias("mean_score_micros"),
            F.round(
                F.sum("pos") / F.count(F.lit(1)).cast("double"), 6
            ).alias("pos_rate"),
        )
        .orderBy("bucket")
    )


@query(
    "events_mutual_information",
    oracle="""
    WITH cell AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS HUGEINT) AS o
        FROM events GROUP BY 1, 2
    ), rt AS (
        SELECT event_type, SUM(o) AS r FROM cell GROUP BY event_type
    ), ct AS (
        SELECT hr, SUM(o) AS c FROM cell GROUP BY hr
    ), tot AS (
        SELECT SUM(o) AS n FROM cell
    ), mi AS (
        SELECT SUM(CAST(round(CAST(cell.o AS DOUBLE)
                   * ln(CAST(cell.o AS DOUBLE) * CAST(tot.n AS DOUBLE)
                        / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)))
                   * 1e6, 0) AS HUGEINT)) AS s
        FROM cell
        JOIN rt ON cell.event_type = rt.event_type
        JOIN ct ON cell.hr = ct.hr
        CROSS JOIN tot
    ), hx AS (
        SELECT SUM(CAST(round(-CAST(r AS DOUBLE)
                   * ln(CAST(r AS DOUBLE) / CAST(tot.n AS DOUBLE))
                   * 1e6, 0) AS HUGEINT)) AS s
        FROM rt CROSS JOIN tot
    ), hy AS (
        SELECT SUM(CAST(round(-CAST(c AS DOUBLE)
                   * ln(CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                   * 1e6, 0) AS HUGEINT)) AS s
        FROM ct CROSS JOIN tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(CASE WHEN mi.s >= 0
                     THEN (2 * mi.s + tot.n) // (2 * tot.n)
                     ELSE -((2 * -mi.s + tot.n) // (2 * tot.n))
                END AS BIGINT) AS mi_micros,
           CAST((2 * hx.s + tot.n) // (2 * tot.n) AS BIGINT)
               AS h_type_micros,
           CAST((2 * hy.s + tot.n) // (2 * tot.n) AS BIGINT)
               AS h_hour_micros,
           round(CAST(mi.s AS DOUBLE)
                 / sqrt(CAST(hx.s AS DOUBLE) * CAST(hy.s AS DOUBLE)), 6)
               AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot
    """,
)
def events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and √-normalized NMI) between event_type and
    hour-of-day — the feature-selection companion to
    events_chisq_independence: MI says how many nats of type
    information the hour carries.  Same one-scan contingency-cell plan;
    each cell/margin contributes O·ln(O·n/(r·c)) computed from exact
    counts, scaled ×1e6 and integer-rounded BEFORE the cross-cell sum,
    so the statistic is deterministic to the last bit on both engines.
    Entropies fall out of the margin frames for free."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cell = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).cast(dec).alias("o"))
    rt = cell.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cell.groupBy("hr").agg(F.sum("o").alias("c"))
    tot = cell.agg(F.sum("o").alias("n"))
    mi = (
        cell.join(F.broadcast(rt), on="event_type")
        .join(F.broadcast(ct), on="hr")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    F.col("o").cast("double")
                    * F.log(
                        F.col("o").cast("double")
                        * F.col("n").cast("double")
                        / (
                            F.col("r").cast("double")
                            * F.col("c").cast("double")
                        )
                    )
                    * 1e6,
                    0,
                ).cast(dec)
            ).alias("mi_s")
        )
    )
    hx = rt.join(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                -F.col("r").cast("double")
                * F.log(F.col("r").cast("double") / F.col("n").cast("double"))
                * 1e6,
                0,
            ).cast(dec)
        ).alias("hx_s")
    )
    hy = ct.join(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                -F.col("c").cast("double")
                * F.log(F.col("c").cast("double") / F.col("n").cast("double"))
                * 1e6,
                0,
            ).cast(dec)
        ).alias("hy_s")
    )
    return (
        mi.join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .join(F.broadcast(tot))
        .select(
            F.col("n").cast("bigint").alias("n"),
            # integer half-away-from-zero micros-per-event — the prior
            # round(s/1e6/n, 6) forms are mean-of-lattice decimal-tie
            # surfaces (hazard defect class); MI terms are signed, the
            # entropies nonnegative
            F.expr(
                "CAST(CASE WHEN mi_s >= 0"
                " THEN (2 * mi_s + n) div (2 * n)"
                " ELSE -((2 * -mi_s + n) div (2 * n))"
                " END AS BIGINT)"
            ).alias("mi_micros"),
            F.expr(
                "CAST((2 * hx_s + n) div (2 * n) AS BIGINT)"
            ).alias("h_type_micros"),
            F.expr(
                "CAST((2 * hy_s + n) div (2 * n) AS BIGINT)"
            ).alias("h_hour_micros"),
            F.round(
                F.col("mi_s").cast("double")
                / F.sqrt(
                    F.col("hx_s").cast("double") * F.col("hy_s").cast("double")
                ),
                6,
            ).alias("nmi"),
        )
    )


def _lsh_scurve_oracle() -> str:
    sample_cte = _JACCARD_MINHASH_PAIRS_CTE.replace(
        "FROM documents", "FROM documents WHERE doc_id < 200"
    )
    return f"""
    WITH {sample_cte},
    ex AS (
        SELECT doc_id, unnest(shingles) AS s, len(shingles) AS sz FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS i, MAX(a.sz) AS sa, MAX(b.sz) AS sb
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b,
               round(i / greatest(sa + sb - i, 1), 4) AS jaccard
        FROM inter
        WHERE round(i / greatest(sa + sb - i, 1), 4) >= 0.05
    ),
    bucketed AS (
        SELECT CASE WHEN t.jaccard < 0.1 THEN '0.05-0.10'
                    WHEN t.jaccard < 0.2 THEN '0.10-0.20'
                    WHEN t.jaccard < 0.5 THEN '0.20-0.50'
                    ELSE '0.50-1.00' END AS jaccard_band,
               CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
        FROM truth t
        LEFT JOIN pairs p ON t.id_a = p.id_a AND t.id_b = p.id_b
    )
    SELECT jaccard_band,
           CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(SUM(found) AS BIGINT) AS n_found,
           round(SUM(found) / CAST(COUNT(*) AS DOUBLE), 4) AS recall
    FROM bucketed GROUP BY jaccard_band ORDER BY jaccard_band
    """


@query("dedup_lsh_scurve", oracle=_lsh_scurve_oracle())
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical LSH S-curve: banded-MinHash candidate recall against
    EXHAUSTIVE ground truth, by true-Jaccard band — the measurement
    that justifies (or indicts) the band/row parameters every dedup
    run relies on.  Ground truth comes from the shared-shingle join on
    a fixed 200-doc eval slice (every pair with jaccard > 0 shares a
    shingle, so the join IS exhaustive — and bounded, which is why the
    eval pins a sample: the production path never does this).  Recall
    should climb steeply with similarity — the (8 hashes, 4 bands)
    collision probability 1−(1−j²)⁴ — and the banded path itself is
    the same operator the full-corpus queries run."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
        word_shingles,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = (
        d.select(
            F.col("doc_id"), norm_words(F.col("text")).alias("_words")
        )
        .filter(F.size("_words") >= 2)
        .select(
            "doc_id", word_shingles(F.col("_words"), 2).alias("_shingles")
        )
    )
    ex = sh.select(
        "doc_id",
        F.explode("_shingles").alias("s"),
        F.size("_shingles").alias("sz"),
    )
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.max("a.sz").alias("sa"),
            F.max("b.sz").alias("sb"),
        )
    )
    jac = F.round(
        F.col("i")
        / F.greatest(F.col("sa") + F.col("sb") - F.col("i"), F.lit(1)),
        4,
    )
    truth = inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.05
    )
    found = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    ).select("id_a", "id_b", F.lit(1).alias("found"))
    band = (
        F.when(F.col("jaccard") < 0.1, "0.05-0.10")
        .when(F.col("jaccard") < 0.2, "0.10-0.20")
        .when(F.col("jaccard") < 0.5, "0.20-0.50")
        .otherwise("0.50-1.00")
    )
    return (
        truth.join(found, on=["id_a", "id_b"], how="left")
        .select(
            band.alias("jaccard_band"),
            F.coalesce("found", F.lit(0)).alias("found"),
        )
        .groupBy("jaccard_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.sum("found").cast("bigint").alias("n_found"),
            F.round(
                F.sum("found") / F.count(F.lit(1)).cast("double"), 4
            ).alias("recall"),
        )
        .orderBy("jaccard_band")
    )


@query(
    "lineitem_correlation_matrix",
    oracle="""
    WITH v AS (
        SELECT CAST(round(l_quantity, 0) AS HUGEINT) AS q,
               CAST(round(l_extendedprice * 100, 0) AS HUGEINT) AS p,
               CAST(round(l_discount * 100, 0) AS HUGEINT) AS d,
               CAST(round(l_tax * 100, 0) AS HUGEINT) AS t
        FROM lineitem
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, SUM(t) AS st,
               SUM(q*q) AS sqq, SUM(p*p) AS spp, SUM(d*d) AS sdd,
               SUM(t*t) AS stt,
               SUM(q*p) AS sqp, SUM(q*d) AS sqd, SUM(q*t) AS sqt,
               SUM(p*d) AS spd, SUM(p*t) AS spt, SUM(d*t) AS sdt
        FROM v
    ), pairs AS (
        SELECT 'discount~tax' AS pair, sdt AS sxy, sd AS sx, st AS sy,
               sdd AS sxx, stt AS syy, n FROM s
        UNION ALL SELECT 'quantity~discount', sqd, sq, sd, sqq, sdd, n FROM s
        UNION ALL SELECT 'quantity~price', sqp, sq, sp, sqq, spp, n FROM s
        UNION ALL SELECT 'quantity~tax', sqt, sq, st, sqq, stt, n FROM s
        UNION ALL SELECT 'price~discount', spd, sp, sd, spp, sdd, n FROM s
        UNION ALL SELECT 'price~tax', spt, sp, st, spp, stt, n FROM s
    )
    SELECT pair,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS pearson_r
    FROM pairs ORDER BY pair
    """,
)
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over four lineitem measures
    in ONE scan — all 14 raw moments (4 sums, 4 squares, 6 cross
    products) accumulate as exact decimal(38,0) in a single aggregate,
    then each of the 6 pair correlations is two sqrts and a divide.
    This is the textbook one-pass moment trick that replaces 6 separate
    corr() scans at 100 TB; Welford-style streaming variants trade this
    exactness for incremental updates — unnecessary here since the
    integer lattice (cents / whole units) cannot overflow decimal38
    below ~1e12 rows."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    v = li.select(
        F.round("l_quantity", 0).cast(dec).alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0).cast(dec).alias("p"),
        F.round(F.col("l_discount") * 100, 0).cast(dec).alias("d"),
        F.round(F.col("l_tax") * 100, 0).cast(dec).alias("t"),
    )
    s = v.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        *[
            F.sum(F.col(a) * F.col(b)).alias(f"s{a}{b}")
            for a, b in [
                ("q", "q"), ("p", "p"), ("d", "d"), ("t", "t"),
                ("q", "p"), ("q", "d"), ("q", "t"),
                ("p", "d"), ("p", "t"), ("d", "t"),
            ]
        ],
        *[F.sum(F.col(a)).alias(f"s{a}") for a in ["q", "p", "d", "t"]],
    )
    names = {
        "q": "quantity", "p": "price", "d": "discount", "t": "tax",
    }
    rows = []
    for a, b in [
        ("d", "t"), ("q", "d"), ("q", "p"), ("q", "t"),
        ("p", "d"), ("p", "t"),
    ]:
        num = F.col("n") * F.col(f"s{a}{b}") - F.col(f"s{a}") * F.col(f"s{b}")
        da = F.col("n") * F.col(f"s{a}{a}") - F.col(f"s{a}") * F.col(f"s{a}")
        db = F.col("n") * F.col(f"s{b}{b}") - F.col(f"s{b}") * F.col(f"s{b}")
        rows.append(
            F.struct(
                F.lit(f"{names[a]}~{names[b]}").alias("pair"),
                F.round(
                    num.cast("double")
                    / (F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))),
                    6,
                ).alias("pearson_r"),
            )
        )
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.pair", "r.pearson_r")
        .orderBy("pair")
    )


@query(
    "events_seasonal_decomposition",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), tr AS (
        SELECT day, n,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN round(AVG(CAST(n AS DOUBLE)) OVER w, 6) END
                   AS trend
        FROM d
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), sea AS (
        SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,
               round(AVG(n - trend), 6) AS seasonal
        FROM tr WHERE trend IS NOT NULL GROUP BY 1
    )
    SELECT tr.day, tr.n, tr.trend, s.seasonal,
           round(tr.n - tr.trend - s.seasonal, 6) AS remainder
    FROM tr JOIN sea s ON CAST(dayofweek(tr.day) + 1 AS INT) = s.dow
    WHERE tr.trend IS NOT NULL
    ORDER BY tr.day
    """,
)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event series —
    trend (centered 7-day moving average, only where the full window
    exists), day-of-week seasonal (mean detrended value per weekday),
    and remainder: the classical-decomposition readout behind anomaly
    baselines and capacity forecasts.  The raw scan collapses to one
    row per DAY first, so every window/join after runs on a
    |days|-row frame — the decomposition costs the same at 100 TB as
    at 100 MB.  Spark dayofweek is 1=Sunday, DuckDB's 0=Sunday; the
    oracle shifts by one (the events_hourweek_profile convention)."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "day",
        "n",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.round(F.avg(F.col("n").cast("double")).over(w), 6),
        ).alias("trend"),
    )
    sea = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(F.dayofweek("day").cast("int").alias("dow"))
        .agg(F.round(F.avg(F.col("n") - F.col("trend")), 6).alias("seasonal"))
    )
    return (
        tr.filter(F.col("trend").isNotNull())
        .join(
            F.broadcast(sea),
            F.dayofweek(tr["day"]).cast("int") == sea["dow"],
        )
        .select(
            "day",
            "n",
            "trend",
            "seasonal",
            F.round(
                F.col("n") - F.col("trend") - F.col("seasonal"), 6
            ).alias("remainder"),
        )
        .orderBy("day")
    )


@query(
    "events_max_drawdown",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), cc AS (
        SELECT user_id, ts, event_id,
               SUM(cents) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM v
    ), c AS (
        SELECT user_id, cum,
               MAX(cum) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS runmax
        FROM cc
    ), p AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(runmax) AS BIGINT) AS peak_cents,
               CAST(MAX(runmax - cum) AS BIGINT) AS max_drawdown_cents
        FROM c GROUP BY user_id
    ), f AS (
        SELECT user_id, n_events, peak_cents, max_drawdown_cents
        FROM p
        ORDER BY max_drawdown_cents DESC, user_id LIMIT 25
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY max_drawdown_cents DESC, user_id) AS INT) AS rank,
           user_id, n_events, peak_cents, max_drawdown_cents
    FROM f ORDER BY rank
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative-value "equity curve"
    — the risk statistic behind spend-anomaly and account-balance
    monitoring: peak-to-trough drop of the running total.  Running sum
    and running max are BOTH windows partitioned by user (keyed —
    every user's series is one partition's work, no global ordering
    anywhere), values ride the exact integer-cents lattice so the
    prefix sums are order-independent across engines, and the final
    leaderboard is the ``take_top_k`` TakeOrderedAndProject path with
    a (drawdown, user) total order.  At 100 TB this is one keyed
    shuffle + per-key linear scans; nothing grows with user count."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    c = e.select("user_id", "ts", "event_id", cents.alias("cents"))
    c = c.withColumn("cum", F.sum("cents").over(w)).withColumn(
        "runmax", F.max("cum").over(w)
    )
    p = c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("runmax").cast("bigint").alias("peak_cents"),
        F.max(F.col("runmax") - F.col("cum"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
    )
    top = take_top_k(
        p, [F.desc("max_drawdown_cents"), F.asc("user_id")], 25
    )
    return top.select(
        "rank", "user_id", "n_events", "peak_cents", "max_drawdown_cents"
    ).orderBy("rank")


@query(
    "user_longest_streak",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), g AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS grp
        FROM d
    ), s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak
        FROM g GROUP BY user_id, grp
    ), u AS (
        SELECT user_id, MAX(streak) AS longest,
               CAST(SUM(streak) AS BIGINT) AS active_days
        FROM s GROUP BY user_id
    )
    SELECT CAST(longest AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(active_days) AS BIGINT) AS sum_active_days,
           round(AVG(CAST(active_days AS DOUBLE)), 6) AS avg_active_days
    FROM u GROUP BY longest ORDER BY streak_days
    """,
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, rolled into a
    streak-length distribution — the classic gaps-and-islands pattern
    (day minus per-user row_number is constant within a consecutive
    run).  Every window is partitioned by user, the island key is
    integer date arithmetic (exact in both engines), and the output is
    one row per distinct streak length — bounded by the calendar span
    regardless of user count, so the final agg is metadata-sized at
    any scale."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak")
    )
    u = s.groupBy("user_id").agg(
        F.max("streak").alias("longest"),
        F.sum("streak").cast("bigint").alias("active_days"),
    )
    return (
        u.groupBy(F.col("longest").cast("bigint").alias("streak_days"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("active_days").cast("bigint").alias("sum_active_days"),
            F.round(
                F.avg(F.col("active_days").cast("double")), 6
            ).alias("avg_active_days"),
        )
        .orderBy("streak_days")
    )


@query(
    "user_activity_bitmask",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id,
               strftime(CAST(ts AS DATE), '%Y-%m') AS month,
               CAST(day(CAST(ts AS DATE)) AS INT) AS dom
        FROM events
    ), m AS (
        SELECT user_id, month,
               bit_or(1::BIGINT << (dom - 1)) AS mask
        FROM d GROUP BY user_id, month
    ), b AS (
        SELECT user_id, month, mask,
               CAST(bit_count(mask) AS BIGINT) AS active_days
        FROM m
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(active_days) AS BIGINT) AS sum_active_days,
           CAST(MAX(active_days) AS BIGINT) AS max_active_days,
           CAST(SUM(CASE WHEN active_days >= 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS power_users,
           CAST(SUM(CASE WHEN (mask & 1) <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS first_day_users
    FROM b GROUP BY month ORDER BY month
    """,
)
def user_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, month) activity encoded as a 31-bit day bitmask —
    the roaring-bitmap-style retention primitive: one BIGINT per
    user-month instead of one row per user-day, then popcount and
    bitwise predicates answer engagement questions without re-touching
    the event log.  ``bit_or(1 << day-1)`` and ``bit_count`` are both
    JVM-side integer ops (and exact in any engine); the per-month
    rollup output is bounded by the calendar.  At 100 TB the win is
    exactly this compression: downstream retention queries scan
    |users × months| masks, not |events| rows."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM").alias("month"),
        F.dayofmonth(F.col("ts").cast("date")).cast("int").alias("dom"),
    ).distinct()
    m = d.groupBy("user_id", "month").agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), dom - 1))").alias(
            "mask"
        )
    )
    b = m.withColumn(
        "active_days", F.bit_count("mask").cast("bigint")
    )
    return (
        b.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("active_days").cast("bigint").alias("sum_active_days"),
            F.max("active_days").cast("bigint").alias("max_active_days"),
            F.sum(F.when(F.col("active_days") >= 10, 1).otherwise(0))
            .cast("bigint")
            .alias("power_users"),
            F.sum(
                F.when(F.col("mask").bitwiseAND(F.lit(1)) != 0, 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("first_day_users"),
        )
        .orderBy("month")
    )


@query(
    "supplier_adamic_adar",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
        FROM lineitem
    ), deg AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY part
    ), capped AS (
        SELECT e.part, e.supp FROM (
            SELECT part, supp,
                   ROW_NUMBER() OVER (PARTITION BY part ORDER BY supp)
                       AS rn
            FROM e
        ) e WHERE rn <= 8
    ), w AS (
        SELECT c.part, c.supp,
               CAST(round(1000000.0 / ln(CAST(LEAST(deg.d, 8) AS DOUBLE)))
                    AS BIGINT) AS wgt
        FROM capped c JOIN deg ON c.part = deg.part
        WHERE deg.d >= 2
    ), pairs AS (
        SELECT a.supp AS s_a, b.supp AS s_b, a.wgt
        FROM w a JOIN w b ON a.part = b.part AND a.supp < b.supp
    ), score AS (
        SELECT s_a, s_b,
               CAST(COUNT(*) AS BIGINT) AS n_common_parts,
               CAST(SUM(wgt) AS BIGINT) AS aa_micro
        FROM pairs GROUP BY s_a, s_b
    ), top AS (
        SELECT * FROM score
        ORDER BY aa_micro DESC, s_a, s_b LIMIT 25
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY aa_micro DESC, s_a, s_b) AS INT) AS rank,
           s_a, s_b, n_common_parts,
           round(aa_micro / 1000000.0, 6) AS aa_score
    FROM top ORDER BY rank
    """,
)
def supplier_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the supplier co-sourcing graph:
    two suppliers are "likely partners" when they ship many of the
    same parts, with rare parts (few suppliers) weighted 1/ln(degree).
    The self-join is BOUNDED the way every pairwise op in this repo
    is: suppliers-per-part capped at 8 (row_number by suppkey —
    deterministic; documented recall bound, parts above the cap
    contribute their 8 lexicographically-first suppliers), so fanout
    per part is ≤ C(8,2) = 28 pairs — linear in parts at any scale,
    never quadratic in suppliers.  Weights ride the integer lattice
    (round(1e6/ln(deg)) per part, summed exactly), and the leaderboard
    orders by the exact integer score via TakeOrderedAndProject."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    deg = e.groupBy("part").agg(F.count(F.lit(1)).alias("d"))
    rn = F.row_number().over(Window.partitionBy("part").orderBy("supp"))
    capped = e.withColumn("rn", rn).filter(F.col("rn") <= 8).drop("rn")
    w = (
        capped.join(deg, "part")
        .filter(F.col("d") >= 2)
        .select(
            "part",
            "supp",
            F.round(
                F.lit(1000000.0)
                / F.log(F.least(F.col("d"), F.lit(8)).cast("double"))
            )
            .cast("bigint")
            .alias("wgt"),
        )
    )
    a = w.select("part", F.col("supp").alias("s_a"), "wgt")
    b = w.select("part", F.col("supp").alias("s_b"))
    pairs = a.join(b, "part").filter(F.col("s_a") < F.col("s_b"))
    score = pairs.groupBy("s_a", "s_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_parts"),
        F.sum("wgt").cast("bigint").alias("aa_micro"),
    )
    top = take_top_k(
        score, [F.desc("aa_micro"), F.asc("s_a"), F.asc("s_b")], 25
    )
    return top.select(
        "rank",
        "s_a",
        "s_b",
        "n_common_parts",
        F.round(F.col("aa_micro") / 1000000.0, 6).alias("aa_score"),
    ).orderBy("rank")


@query(
    "classifier_pr_auc",
    oracle="""
    WITH w AS (
        SELECT i AS fid,
               (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 18, 15))
                   ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM generate_series(0, 4095) t(i)
    ), tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), s AS (
        SELECT doc_id, MAX(lang) AS lang,
               CAST(round(SUM(wt) / COUNT(*) * 1e6, 0) AS BIGINT) AS sv
        FROM feat JOIN w ON feat.fid = w.fid
        GROUP BY doc_id
    ), r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(row_number() OVER (ORDER BY sv DESC, doc_id) AS BIGINT)
                   AS k,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    OVER (ORDER BY sv DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos
        FROM s
    ), terms AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN pos = 1 THEN CAST(round(
                   CAST(cum_pos AS DOUBLE) * 1000000.0 / CAST(k AS DOUBLE)
               ) AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_micro,
               CAST(MAX(CASE WHEN k = 50 THEN cum_pos END) AS BIGINT)
                   AS pos_at_50
        FROM r
    )
    SELECT n_docs, n_pos,
           round(ap_micro / (1000000.0 * n_pos), 6) AS avg_precision,
           round(pos_at_50 / 50.0, 6) AS precision_at_50,
           round(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS prevalence
    FROM terms
    """,
)
def classifier_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve) of
    the hashed linear classifier at retrieving English documents — the
    metric that matters when positives are rare and ROC-AUC flatters.
    AP = (1/n₊)·Σ_{positives at rank k} P@k needs a TOTAL ordering of
    the scored corpus; both the rank k and the running positive count
    come from the distributed two-pass range-partition shape
    (:func:`ranking.global_cumsum` then :func:`ranking.global_rank` —
    two range exchanges, never a single-task window).  Each P@k term
    is quantized to micro units before the exact integer sum, so the
    fold is order-independent and the oracle's one-task window replay
    hash-matches."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
        global_rank,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    w = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, w, n_features=4096).select(
        "doc_id",
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    order = [F.desc("sv"), F.asc("doc_id")]
    with_cum, _tot = global_cumsum(scored, order, "pos", "cum_pos")
    ranked, n_docs = global_rank(with_cum, order, "k")
    term = F.round(
        F.col("cum_pos").cast("double")
        * F.lit(1000000.0)
        / F.col("k").cast("double")
    ).cast("bigint")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("pos") == 1, term).otherwise(0))
        .cast("bigint")
        .alias("ap_micro"),
        F.max(F.when(F.col("k") == 50, F.col("cum_pos")))
        .cast("bigint")
        .alias("pos_at_50"),
    )
    return agg.select(
        "n_docs",
        "n_pos",
        F.round(
            F.col("ap_micro") / (F.lit(1000000.0) * F.col("n_pos")), 6
        ).alias("avg_precision"),
        F.round(F.col("pos_at_50") / F.lit(50.0), 6).alias(
            "precision_at_50"
        ),
        F.round(
            F.col("n_pos").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("prevalence"),
    )


def _nb_pred_cte(dim: int = 1024) -> str:
    """The Naive-Bayes train+predict CTE chain shared by the class-report
    and kappa oracles (same pipeline text_nb_confusion replays — exact
    micro-nat integer log-probs, deterministic argmax tie-break)."""
    return f"""
    WITH base AS (
        SELECT doc_id, lang, text FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % {dim} AS fid
        FROM (
            SELECT doc_id, lang,
                   unnest(string_split_regex(trim(text),
                                             '[ \\t\\n\\r\\f\\x0b]+')) AS tok
            FROM base
        ) WHERE tok <> ''
    ), tfc AS (
        SELECT doc_id, lang, fid, CAST(COUNT(*) AS BIGINT) AS tf
        FROM feat GROUP BY doc_id, lang, fid
    ), cc AS (
        SELECT lang, fid, CAST(COUNT(*) AS BIGINT) AS n
        FROM feat GROUP BY lang, fid
    ), ct AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
        FROM feat GROUP BY lang
    ), fids AS (
        SELECT DISTINCT fid FROM feat
    ), grid AS (
        SELECT ct.lang, fids.fid,
               CAST(round(ln((COALESCE(cc.n, 0) + 1.0)
                             / (ct.total + {dim}.0)) * 1000000, 0)
                    AS BIGINT) AS lp
        FROM ct CROSS JOIN fids
        LEFT JOIN cc ON cc.lang = ct.lang AND cc.fid = fids.fid
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
    ), pri AS (
        SELECT lang AS hyp,
               CAST(round(ln(CAST(COUNT(*) AS BIGINT) / (SELECT n FROM nn))
                          * 1000000, 0) AS BIGINT) AS prior
        FROM base GROUP BY lang
    ), sc AS (
        SELECT t.doc_id, t.lang AS true_label, g.lang AS hyp,
               CAST(SUM(t.tf * g.lp) AS BIGINT) AS tok_lp
        FROM tfc t JOIN grid g ON t.fid = g.fid
        GROUP BY t.doc_id, t.lang, g.lang
    ), pred AS (
        SELECT sc.doc_id, sc.true_label, sc.hyp AS pred_label,
               row_number() OVER (PARTITION BY sc.doc_id
                                  ORDER BY sc.tok_lp + pri.prior DESC,
                                           sc.hyp) AS rn
        FROM sc JOIN pri ON sc.hyp = pri.hyp
    ), conf AS (
        SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY true_label, pred_label
    )"""


@query(
    "classifier_class_report",
    oracle=_nb_pred_cte()
    + """
    , sup AS (
        SELECT true_label AS lang, CAST(SUM(n_docs) AS BIGINT) AS support
        FROM conf GROUP BY true_label
    ), prd AS (
        SELECT pred_label AS lang, CAST(SUM(n_docs) AS BIGINT) AS predicted
        FROM conf GROUP BY pred_label
    ), tp AS (
        SELECT true_label AS lang, CAST(SUM(n_docs) AS BIGINT) AS tp
        FROM conf WHERE true_label = pred_label GROUP BY true_label
    )
    SELECT sup.lang,
           sup.support,
           COALESCE(prd.predicted, 0) AS predicted,
           COALESCE(tp.tp, 0) AS tp,
           round(COALESCE(CAST(tp.tp AS DOUBLE)
                          / CAST(prd.predicted AS DOUBLE), 0.0), 6)
               AS precision,
           round(COALESCE(tp.tp, 0) / CAST(sup.support AS DOUBLE), 6)
               AS recall,
           round(2.0 * COALESCE(tp.tp, 0)
                 / CAST(sup.support + COALESCE(prd.predicted, 0) AS DOUBLE),
                 6) AS f1
    FROM sup
    LEFT JOIN prd ON sup.lang = prd.lang
    LEFT JOIN tp ON sup.lang = tp.lang
    ORDER BY sup.lang
    """,
)
def classifier_class_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the in-sample Naive Bayes
    language classifier — the standard classification report, derived
    entirely from the exact confusion-matrix counts (F1 uses the
    integer identity 2·tp/(support+predicted), so every metric is one
    float division over exact bigints).  The confusion matrix itself
    is the operators/text.py:nb_confusion plan: broadcast model grid,
    one corpus explode, argmax with a deterministic tie-break — the
    report adds only |classes|-sized aggregation on top."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        nb_confusion,
    )

    d = _t(spark, sf_dir, "documents")
    conf = nb_confusion(
        d, label_col="lang", id_col="doc_id", text_col="text", dim=1024
    )
    sup = conf.groupBy(F.col("true_label").alias("lang")).agg(
        F.sum("n_docs").cast("bigint").alias("support")
    )
    prd = conf.groupBy(F.col("pred_label").alias("lang")).agg(
        F.sum("n_docs").cast("bigint").alias("predicted")
    )
    tp = (
        conf.filter(F.col("true_label") == F.col("pred_label"))
        .groupBy(F.col("true_label").alias("lang"))
        .agg(F.sum("n_docs").cast("bigint").alias("tp"))
    )
    out = (
        sup.join(prd, "lang", "left")
        .join(tp, "lang", "left")
        .select(
            "lang",
            "support",
            F.coalesce(F.col("predicted"), F.lit(0))
            .cast("bigint")
            .alias("predicted"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.round(
                F.coalesce(
                    F.col("tp").cast("double")
                    / F.col("predicted").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("precision"),
            F.round(
                F.coalesce(F.col("tp"), F.lit(0))
                / F.col("support").cast("double"),
                6,
            ).alias("recall"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("tp"), F.lit(0))
                / (
                    F.col("support")
                    + F.coalesce(F.col("predicted"), F.lit(0))
                ).cast("double"),
                6,
            ).alias("f1"),
        )
    )
    return out.orderBy("lang")


@query(
    "classifier_kappa",
    oracle=_nb_pred_cte()
    + """
    , tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN true_label = pred_label
                             THEN n_docs ELSE 0 END) AS BIGINT) AS agree
        FROM conf
    ), marg AS (
        SELECT CAST(SUM(s.support * p.predicted) AS BIGINT) AS pe_num
        FROM (SELECT true_label AS lang, SUM(n_docs) AS support
              FROM conf GROUP BY 1) s
        JOIN (SELECT pred_label AS lang, SUM(n_docs) AS predicted
              FROM conf GROUP BY 1) p
        ON s.lang = p.lang
    )
    SELECT tot.n AS n_docs, tot.agree AS n_agree,
           round(CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
               AS accuracy,
           round(CAST(marg.pe_num AS DOUBLE)
                 / CAST(tot.n * tot.n AS DOUBLE), 6) AS expected_accuracy,
           round(CAST(tot.n * tot.agree - marg.pe_num AS DOUBLE)
                 / CAST(tot.n * tot.n - marg.pe_num AS DOUBLE), 6)
               AS kappa
    FROM tot, marg
    """,
)
def classifier_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the Naive Bayes language classifier —
    chance-corrected agreement between predicted and true labels.
    κ = (n·Σtpᵢ − Σ supᵢ·predᵢ) / (n² − Σ supᵢ·predᵢ) is computed
    entirely on exact integer marginals of the |classes|² confusion
    matrix (metadata-sized at any corpus scale), so the only float op
    is the final division."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        nb_confusion,
    )

    d = _t(spark, sf_dir, "documents")
    conf = nb_confusion(
        d, label_col="lang", id_col="doc_id", text_col="text", dim=1024
    ).localCheckpoint(eager=False)
    tot = conf.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("true_label") == F.col("pred_label"), F.col("n_docs")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("agree"),
    )
    s = conf.groupBy(F.col("true_label").alias("lang")).agg(
        F.sum("n_docs").alias("support")
    )
    p = conf.groupBy(F.col("pred_label").alias("lang")).agg(
        F.sum("n_docs").alias("predicted")
    )
    marg = (
        s.join(p, "lang")
        .agg(
            F.sum(F.col("support") * F.col("predicted"))
            .cast("bigint")
            .alias("pe_num")
        )
    )
    out = tot.crossJoin(F.broadcast(marg))
    return out.select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.round(
            F.col("agree").cast("double") / F.col("n").cast("double"), 6
        ).alias("accuracy"),
        F.round(
            F.col("pe_num").cast("double")
            / (F.col("n") * F.col("n")).cast("double"),
            6,
        ).alias("expected_accuracy"),
        F.round(
            (F.col("n") * F.col("agree") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double"),
            6,
        ).alias("kappa"),
    )


@query(
    "events_incremental_rollup",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), mx AS (SELECT MAX(day) AS d FROM e),
    base AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(MIN(cents) AS BIGINT) AS mn,
               CAST(MAX(cents) AS BIGINT) AS mxv
        FROM e WHERE day < (SELECT d FROM mx) GROUP BY event_type
    ), delta AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(MIN(cents) AS BIGINT) AS mn,
               CAST(MAX(cents) AS BIGINT) AS mxv
        FROM e WHERE day = (SELECT d FROM mx) GROUP BY event_type
    ), merged AS (
        SELECT COALESCE(b.event_type, d.event_type) AS event_type,
               COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
               COALESCE(b.s, 0) + COALESCE(d.s, 0) AS s,
               LEAST(COALESCE(b.mn, 9223372036854775807),
                     COALESCE(d.mn, 9223372036854775807)) AS mn,
               GREATEST(COALESCE(b.mxv, -9223372036854775808),
                        COALESCE(d.mxv, -9223372036854775808)) AS mxv
        FROM base b FULL OUTER JOIN delta d USING (event_type)
    ), direct AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(MIN(cents) AS BIGINT) AS mn,
               CAST(MAX(cents) AS BIGINT) AS mxv
        FROM e GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n_events,
           CAST(m.s AS BIGINT) AS sum_cents,
           CAST(m.mn AS BIGINT) AS min_cents,
           CAST(m.mxv AS BIGINT) AS max_cents,
           (m.n = t.n AND m.s = t.s AND m.mn = t.mn AND m.mxv = t.mxv)
               AS matches_direct
    FROM merged m JOIN direct t USING (event_type)
    ORDER BY m.event_type
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance by partial-aggregate
    MERGE: yesterday's rollup state (count/sum/min/max per type over
    all days but the newest) absorbs the newest day's delta through
    the aggregate-state algebra (+, +, least, greatest) — and the
    query PROVES the merge by recomputing directly and binding
    ``matches_direct``.  This is the 100 TB pattern that matters most
    in practice: a daily pipeline touches ONE day-partition and merges
    KB-scale agg state, never re-scanning the historical table; every
    moment here is an exact integer so merged ≡ direct is a strict
    equality, not a tolerance."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    max_day = e.agg(F.max("day").alias("d"))

    def rollup(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s"),
            F.min("cents").cast("bigint").alias("mn"),
            F.max("cents").cast("bigint").alias("mxv"),
        )

    with_d = e.crossJoin(F.broadcast(max_day))
    base = rollup(with_d.filter(F.col("day") < F.col("d")))
    delta = rollup(with_d.filter(F.col("day") == F.col("d")))
    b = base.select(
        "event_type",
        F.col("n").alias("bn"),
        F.col("s").alias("bs"),
        F.col("mn").alias("bmn"),
        F.col("mxv").alias("bmx"),
    )
    dd = delta.select(
        "event_type",
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
        F.col("mn").alias("dmn"),
        F.col("mxv").alias("dmx"),
    )
    imax = F.lit(9223372036854775807).cast("bigint")
    imin = F.lit(-9223372036854775808).cast("bigint")
    merged = b.join(dd, "event_type", "full_outer").select(
        "event_type",
        (
            F.coalesce(F.col("bn"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
        (
            F.coalesce(F.col("bs"), F.lit(0))
            + F.coalesce(F.col("ds"), F.lit(0))
        )
        .cast("bigint")
        .alias("s"),
        F.least(
            F.coalesce(F.col("bmn"), imax), F.coalesce(F.col("dmn"), imax)
        )
        .cast("bigint")
        .alias("mn"),
        F.greatest(
            F.coalesce(F.col("bmx"), imin), F.coalesce(F.col("dmx"), imin)
        )
        .cast("bigint")
        .alias("mxv"),
    )
    direct = rollup(e).select(
        "event_type",
        F.col("n").alias("tn"),
        F.col("s").alias("ts2"),
        F.col("mn").alias("tmn"),
        F.col("mxv").alias("tmx"),
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("s").alias("sum_cents"),
            F.col("mn").alias("min_cents"),
            F.col("mxv").alias("max_cents"),
            (
                (F.col("n") == F.col("tn"))
                & (F.col("s") == F.col("ts2"))
                & (F.col("mn") == F.col("tmn"))
                & (F.col("mxv") == F.col("tmx"))
            ).alias("matches_direct"),
        )
        .orderBy("event_type")
    )


@query(
    "events_compaction_plan",
    oracle="""
    WITH p AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(length(props) + 64) AS BIGINT) AS bytes
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(bytes) AS BIGINT) AS total,
               GREATEST(CAST(SUM(bytes) AS BIGINT) // 8, 1) AS target
        FROM p
    ), c AS (
        SELECT day, n_rows, bytes,
               CAST(SUM(bytes) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - bytes AS BIGINT) AS cum_before,
               (SELECT target FROM tot) AS target
        FROM p
    ), binned AS (
        SELECT day, n_rows, bytes, target,
               CAST(cum_before // target AS BIGINT) AS bin
        FROM c
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           CAST(MIN(day) AS VARCHAR) AS day_min,
           CAST(MAX(day) AS VARCHAR) AS day_max,
           round(CAST(SUM(bytes) AS DOUBLE) / CAST(MAX(target) AS DOUBLE),
                 6) AS fill_ratio
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: estimate each day-partition's
    byte weight, then assign consecutive partitions to merge bins by
    prefix-sum division (bin = cum_bytes_before ÷ target) — the
    deterministic, SQL-expressible cousin of first-fit bin packing
    that a table-maintenance job uses to rewrite thousands of small
    files into ~target-sized ones while preserving day locality.  The
    per-day inventory is one grouped agg; the running sum is a window
    over the |days|-sized frame (the accepted post-agg exception), so
    the plan costs one scan regardless of table size."""
    e = _t(spark, sf_dir, "events")
    p = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.length("props") + 64).cast("bigint").alias("bytes"),
    )
    tot = p.agg(
        F.greatest(
            (F.sum("bytes") / 8).cast("bigint"), F.lit(1).cast("bigint")
        ).alias("target")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        p.withColumn(
            "cum_before", (F.sum("bytes").over(w) - F.col("bytes"))
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "bin",
            F.floor(
                F.col("cum_before") / F.col("target")
            ).cast("bigint"),
        )
    )
    return (
        c.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
            F.min("day").cast("string").alias("day_min"),
            F.max("day").cast("string").alias("day_max"),
            F.round(
                F.sum("bytes").cast("double")
                / F.max("target").cast("double"),
                6,
            ).alias("fill_ratio"),
        )
        .orderBy("bin")
    )


@query(
    "events_holt_forecast",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type,
               list_transform(list(n ORDER BY day),
                              x -> CAST(x AS DOUBLE)) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY event_type HAVING COUNT(*) >= 2
    ), fold AS (
        -- accumulator is a DOUBLE[2] [level, trend]: a STRUCT acc gets
        -- re-cast to the list element type between fold steps in this
        -- DuckDB version (silently perturbing the chain), arrays don't
        SELECT event_type, n_days,
               list_reduce(
                   list_prepend(
                       [xs[1], xs[2] - xs[1]],
                       list_transform(xs[2:],
                                      x -> [x, CAST(0.0 AS DOUBLE)])
                   ),
                   (acc, x) -> [
                       0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
                       0.1 * (0.3 * x[1] + 0.7 * (acc[1] + acc[2])
                              - acc[1]) + 0.9 * acc[2]
                   ]
               ) AS st
        FROM s
    )
    SELECT event_type, n_days,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[1] + 1 * st[2], 6) AS forecast_1d,
           round(st[1] + 3 * st[2], 6) AS forecast_3d,
           round(st[1] + 7 * st[2], 6) AS forecast_7d
    FROM fold ORDER BY event_type
    """,
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) forecast of daily event
    volume per type — level + trend state folded over the day series
    (α = 0.3, β = 0.1), projecting 1/3/7 days ahead.  The recurrence
    is inherently ordered, so it rides the ordered-fold discipline:
    one grouped agg to the |types × days| frame, then
    ``F.aggregate`` over the sorted series with a struct accumulator
    initialized to (x₁, x₂−x₁) — both engines execute the identical
    float sequence, so level/trend/forecasts hash-match.  The fold
    touches |days| values per type: trivial at any event volume."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = (
        d.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("day"), F.col("n")))
            ).alias("series"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .filter(F.col("n_days") >= 2)
    )
    xs = F.transform(F.col("series"), lambda r: r["n"].cast("double"))
    x1 = F.element_at(xs, 1)
    x2 = F.element_at(xs, 2)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("b"))

    def step(acc, x):
        l_new = 0.3 * x["l"] + 0.7 * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (0.1 * (l_new - acc["l"]) + 0.9 * acc["b"]).alias("b"),
        )

    fold = s.select(
        "event_type",
        "n_days",
        F.aggregate(
            F.transform(
                F.slice(xs, 2, 1000000),
                lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b")),
            ),
            init,
            step,
        ).alias("st"),
    )
    return fold.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.b"), 6).alias("trend"),
        F.round(F.col("st.l") + 1 * F.col("st.b"), 6).alias("forecast_1d"),
        F.round(F.col("st.l") + 3 * F.col("st.b"), 6).alias("forecast_3d"),
        F.round(F.col("st.l") + 7 * F.col("st.b"), 6).alias("forecast_7d"),
    ).orderBy("event_type")


# Rank-biased-overlap depth weights, shared verbatim by the Spark plan
# and the DuckDB oracle (the shared-literals discipline): RBO_min at
# p = 0.9, depth 50 — w_k = (1−p)·p^(k−1)/k on a 1e9 integer lattice.
_RBO_P = 0.9
_RBO_DEPTH = 50
_RBO_WEIGHTS = [
    (k, round((1.0 - _RBO_P) * _RBO_P ** (k - 1) / k * 1e9))
    for k in range(1, _RBO_DEPTH + 1)
]


def _rbo_oracle() -> str:
    vals = ", ".join(f"({k}, {w})" for k, w in _RBO_WEIGHTS)
    return f"""
    WITH docs AS (
        SELECT doc_id, n_chars,
               len(string_split_regex(trim(text),
                                      '[ \\t\\n\\r\\f\\x0b]+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), ra AS (
        SELECT doc_id, row_number() OVER (
            ORDER BY n_chars DESC, doc_id) AS r
        FROM docs QUALIFY r <= {_RBO_DEPTH}
    ), rb AS (
        SELECT doc_id, row_number() OVER (
            ORDER BY n_tokens DESC, doc_id) AS r
        FROM docs QUALIFY r <= {_RBO_DEPTH}
    ), joined AS (
        SELECT ra.doc_id, GREATEST(ra.r, rb.r) AS m
        FROM ra JOIN rb ON ra.doc_id = rb.doc_id
    ), wt(k, w) AS (VALUES {vals}),
    xk AS (
        SELECT wt.k, wt.w,
               CAST((SELECT COUNT(*) FROM joined WHERE m <= wt.k)
                    AS BIGINT) AS x
        FROM wt
    )
    SELECT CAST({_RBO_DEPTH} AS BIGINT) AS depth,
           CAST((SELECT COUNT(*) FROM joined WHERE m <= 10) AS BIGINT)
               AS overlap_10,
           CAST((SELECT COUNT(*) FROM joined) AS BIGINT) AS overlap_50,
           round(CAST(SUM(x * w) AS BIGINT) / 1000000000.0, 6) AS rbo
    FROM xk
    """


@query("ranker_rbo_eval", oracle=_rbo_oracle())
def ranker_rbo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (RBO, p = 0.9) between two document
    rankings — by character count vs by token count — the standard
    top-weighted agreement metric for comparing rankers without a
    relevance oracle.  Both top-50 lists come off the
    TakeOrderedAndProject path (:func:`ranking.take_top_k`, bounded
    heaps, no global sort), the depth weights (1−p)·p^(k−1)/k are
    Python-computed integer literals shared verbatim with the oracle,
    and each depth's overlap count is an exact integer — so the final
    RBO is one division over an exact Σ X_k·w_k."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            "n_chars",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
        )
    )
    ra = take_top_k(
        d, [F.desc("n_chars"), F.asc("doc_id")], _RBO_DEPTH, "ra"
    ).select("doc_id", "ra")
    rb = take_top_k(
        d, [F.desc("n_tokens"), F.asc("doc_id")], _RBO_DEPTH, "rb"
    ).select("doc_id", "rb")
    joined = ra.join(rb, "doc_id").select(
        "doc_id", F.greatest("ra", "rb").alias("m")
    )
    wt = spark.createDataFrame(_RBO_WEIGHTS, "k INT, w BIGINT")
    xk = (
        F.broadcast(wt)
        .join(joined, F.col("m") <= F.col("k"), "left")
        .groupBy("k", "w")
        .agg(F.count("doc_id").cast("bigint").alias("x"))
    )
    ov = joined.agg(
        F.sum(F.when(F.col("m") <= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("overlap_10"),
        F.count(F.lit(1)).cast("bigint").alias("overlap_50"),
    )
    rbo = xk.agg(
        F.round(
            F.sum(F.col("x") * F.col("w")).cast("bigint")
            / F.lit(1000000000.0),
            6,
        ).alias("rbo")
    )
    return (
        ov.crossJoin(F.broadcast(rbo))
        .select(
            F.lit(_RBO_DEPTH).cast("bigint").alias("depth"),
            "overlap_10",
            "overlap_50",
            "rbo",
        )
    )


@query(
    "doc_readability",
    oracle="""
    WITH d AS (
        SELECT lang, source,
               len(string_split_regex(trim(text),
                                      '[ \\t\\n\\r\\f\\x0b]+')) AS w,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
               len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS syl
        FROM documents WHERE trim(text) <> ''
    ), f AS (
        SELECT lang, source, w, s,
               CAST(round((206.835
                    - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                    - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
                    * 10000) AS BIGINT) AS flesch_e4
        FROM d
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS total_words,
           round(CAST(SUM(w) AS DOUBLE) / CAST(SUM(s) AS DOUBLE), 6)
               AS avg_words_per_sentence,
           round(CAST(SUM(flesch_e4) AS BIGINT)
                 / (10000.0 * COUNT(*)), 6) AS avg_flesch
    FROM f GROUP BY lang, source ORDER BY lang, source
    """,
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per (lang, source) — the classic
    readability quality signal for corpus curation: 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with sentences
    counted as terminal-punctuation runs and syllables approximated by
    vowel-group runs (the standard regex heuristic).  Everything is
    JVM-side regexp counting; each doc's score is quantized to a 1e4
    lattice BEFORE the group average so the cross-doc sum is exact
    integer arithmetic — one scan, one grouped agg, no shuffle beyond
    the |langs × sources| rollup."""
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    doc = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    d = doc.select(
        "lang",
        "source",
        F.size(tokens(F.col("text"))).alias("w"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).alias("s"),
        F.regexp_count(F.col("text"), F.lit("[aeiouyAEIOUY]+")).alias(
            "syl"
        ),
    )
    f = d.select(
        "lang",
        "source",
        "w",
        "s",
        F.round(
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("w").cast("double") / F.col("s").cast("double"))
                - F.lit(84.6)
                * (F.col("syl").cast("double") / F.col("w").cast("double"))
            )
            * 10000
        )
        .cast("bigint")
        .alias("flesch_e4"),
    )
    return (
        f.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("total_words"),
            F.round(
                F.sum("w").cast("double") / F.sum("s").cast("double"), 6
            ).alias("avg_words_per_sentence"),
            F.round(
                F.sum("flesch_e4").cast("bigint")
                / (F.lit(10000.0) * F.count(F.lit(1))),
                6,
            ).alias("avg_flesch"),
        )
        .orderBy("lang", "source")
    )


@query(
    "events_interval_overlap",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev
        FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev IS NULL
                         OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM o
    ), ids AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM flagged
    ), sess AS (
        SELECT user_id, sid,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM ids GROUP BY user_id, sid
    ), days AS (
        SELECT user_id, sid, s_start, s_end,
               unnest(generate_series(CAST(s_start AS DATE),
                                      CAST(s_end AS DATE),
                                      INTERVAL 1 DAY)) AS day
        FROM sess
    ), wins AS (
        SELECT * FROM (VALUES
            ('lunch', 12, 14), ('evening', 18, 21)) w(label, h0, h1)
    ), ov AS (
        SELECT w.label,
               GREATEST(0,
                   LEAST(epoch_us(d.s_end),
                         epoch_us(CAST(d.day AS TIMESTAMP)
                               + to_hours(CAST(w.h1 AS BIGINT))))
                   - GREATEST(epoch_us(d.s_start),
                         epoch_us(CAST(d.day AS TIMESTAMP)
                               + to_hours(CAST(w.h0 AS BIGINT))))
               ) AS us
        FROM days d CROSS JOIN wins w
    )
    SELECT label,
           CAST(SUM(CASE WHEN us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overlaps,
           CAST(SUM(CASE WHEN us > 0 THEN us ELSE 0 END) AS BIGINT)
               AS total_overlap_us,
           round(CAST(SUM(CASE WHEN us > 0 THEN us ELSE 0 END)
                      AS DOUBLE)
                 / (1000000.0 * NULLIF(SUM(CASE WHEN us > 0
                                           THEN 1 ELSE 0 END), 0)),
                 6) AS avg_overlap_sec
    FROM ov GROUP BY label ORDER BY label
    """,
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join between user sessions and recurring time
    windows (lunch 12-14h, evening 18-21h): how much session time
    lands inside each window — the ad-slot / maintenance-window
    overlap shape.  Scale-safe interval join: each session explodes
    into only the days it touches (bounded by session span, almost
    always 1), the window table is a broadcast literal, and the
    overlap measure is exact epoch-second integer arithmetic —
    never a range cross-join.  Sessionization itself is the
    lag/flag/cumsum plan shared with user_sessions (all windows
    partitioned by user)."""
    e = _t(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w_u).isNull()
            | (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w_u))
                >= 1800000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ids = flagged.withColumn("sid", F.sum("new_s").over(w_cum))
    sess = ids.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    days = sess.select(
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.col("s_start").cast("date"), F.col("s_end").cast("date")
            )
        ).alias("day"),
    )
    wins = spark.createDataFrame(
        [("lunch", 12, 14), ("evening", 18, 21)],
        "label STRING, h0 INT, h1 INT",
    )
    ov = days.crossJoin(F.broadcast(wins)).select(
        "label",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.unix_micros("s_end"),
                F.unix_micros(F.col("day").cast("timestamp"))
                + F.col("h1").cast("bigint") * 3600000000,
            )
            - F.greatest(
                F.unix_micros("s_start"),
                F.unix_micros(F.col("day").cast("timestamp"))
                + F.col("h0").cast("bigint") * 3600000000,
            ),
        ).alias("us"),
    )
    hit = F.when(F.col("us") > 0, 1).otherwise(0)
    hit_us = F.when(F.col("us") > 0, F.col("us")).otherwise(0)
    return (
        ov.groupBy("label")
        .agg(
            F.sum(hit).cast("bigint").alias("n_overlaps"),
            F.sum(hit_us).cast("bigint").alias("total_overlap_us"),
            F.round(
                F.sum(hit_us).cast("double")
                / (F.lit(1000000.0) * F.nullif(F.sum(hit), F.lit(0))),
                6,
            ).alias("avg_overlap_sec"),
        )
        .orderBy("label")
    )


def _pca_cte(dim: int = 64, iters: int = 12, scale: int = 1000) -> str:
    """The exact-lattice PCA CTE chain shared by the pca_power and
    pca_scores oracles: quantize → integer means → deviations →
    scatter cells → mirrored matrix → recursive power iteration →
    sign-fixed eigenvector ``v(i, xv)``.  Replays
    operators/linalg.py:scatter_cells + power_top_eigvec bit-for-bit
    (every step is integer arithmetic with round-half-away division)."""
    return f"""
    WITH RECURSIVE x AS (
        SELECT e.vec_id, t.i - 1 AS i,
               CAST(round(CAST(e.embedding[t.i] AS DOUBLE) * {scale}, 0)
                    AS BIGINT) AS xi
        FROM embeddings e CROSS JOIN generate_series(1, {dim}) t(i)
    ), st AS (
        SELECT i, CAST(SUM(xi) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x GROUP BY i
    ), mu AS (
        SELECT i,
               CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                    ELSE -((-2 * s + n) // (2 * n)) END AS m,
               n
        FROM st
    ), d AS (
        SELECT x.vec_id, x.i, x.xi - mu.m AS dv
        FROM x JOIN mu ON x.i = mu.i
    ), cells AS (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(CAST(a.dv AS HUGEINT) * b.dv) AS HUGEINT) AS p
        FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    ), m AS (
        SELECT i, j, p FROM cells
        UNION ALL
        SELECT j, i, p FROM cells WHERE i <> j
    ), it(k, i, xv) AS (
        SELECT 0, t.i, CAST(1000000 AS HUGEINT)
        FROM generate_series(0, {dim - 1}) t(i)
        UNION ALL
        SELECT k + 1, i,
               CASE WHEN wx >= 0
                    THEN (2 * wx * 1000000 + maxw) // (2 * maxw)
                    ELSE -((-2 * wx * 1000000 + maxw) // (2 * maxw)) END
        FROM (
            SELECT k, i, wx, MAX(abs(wx)) OVER () AS maxw
            FROM (
                SELECT it.k, m.i, SUM(m.p * it.xv) AS wx
                FROM it JOIN m ON m.j = it.i
                GROUP BY it.k, m.i
            ) w
        ) ww
        WHERE k < {iters}
    ), v0 AS (
        SELECT i, xv FROM it WHERE k = {iters}
    ), sgn AS (
        SELECT CASE WHEN (
            SELECT xv FROM v0
            WHERE abs(xv) = (SELECT MAX(abs(xv)) FROM v0)
            ORDER BY i LIMIT 1) < 0 THEN -1 ELSE 1 END AS s
    ), v AS (
        SELECT i, xv * (SELECT s FROM sgn) AS xv FROM v0
    )"""


@query(
    "embedding_pca_power",
    oracle=_pca_cte()
    + """
    , ray AS (
        SELECT
            (SELECT SUM(m.p * a.xv * b.xv)
             FROM m JOIN v a ON m.i = a.i JOIN v b ON m.j = b.i) AS vmv,
            (SELECT SUM(xv * xv) FROM v) AS vv,
            (SELECT SUM(p) FROM cells WHERE i = j) AS tr,
            (SELECT MAX(n) FROM st) AS n
    )
    SELECT v.i AS dim,
           CAST(v.xv AS BIGINT) AS loading_micro,
           CAST(v.xv AS DOUBLE) / 1000000.0 AS loading,
           CAST((2 * ray.vmv + ray.vv * ray.n)
                // (2 * ray.vv * ray.n) AS BIGINT) AS lam_micro,
           CAST((2 * ray.vmv * 1000000 + ray.vv * ray.tr)
                // (2 * ray.vv * ray.tr) AS BIGINT) AS share_ppm,
           CAST(ray.n AS BIGINT) AS n_vectors
    FROM v, ray ORDER BY dim
    """,
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration on the EXACT integer lattice — the drift/anisotropy
    diagnostic for embedding pipelines (a dominant direction with a
    high explained-variance share signals uncentered or collapsed
    vectors).  The d×d scatter matrix is one map-side pass emitting
    d(d+1)/2 integer products per row (operators/linalg.py:
    scatter_cells — partial aggregation collapses them; the shuffle
    carries 2080 cells per partition regardless of row count); the
    2080-cell matrix is a bounded metadata collect (ANN-codebook
    pattern), and the 12-round iteration runs on exact Python
    integers with round-half-away renormalization — no float enters
    the recurrence, so the oracle's recursive CTE replays it
    bit-for-bit.  Rayleigh quotient and explained share are integer
    round-divisions (lam_micro / share_ppm); positives only."""
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        power_top_eigvec,
        round_div,
        scatter_cells,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cells, n, _means = scatter_cells(emb, "embedding", dim=64, scale=1000)
    v, vmv, vv, trace = power_top_eigvec(cells, dim=64, iters=12)
    lam_micro = round_div(vmv, vv * n)
    share_ppm = round_div(vmv * 1_000_000, vv * trace)
    rows = [
        (
            i,
            int(v[i]),
            float(v[i]) / 1000000.0,
            int(lam_micro),
            int(share_ppm),
            int(n),
        )
        for i in range(64)
    ]
    return spark.createDataFrame(
        rows,
        "dim BIGINT, loading_micro BIGINT, loading DOUBLE, "
        "lam_micro BIGINT, share_ppm BIGINT, n_vectors BIGINT",
    ).orderBy("dim")


@query(
    "embedding_pca_scores",
    oracle=_pca_cte()
    + """
    , sc AS (
        SELECT d.vec_id, CAST(SUM(d.dv * v.xv) AS BIGINT) AS score
        FROM d JOIN v ON d.i = v.i GROUP BY d.vec_id
    ), lab AS (
        SELECT e.label, sc.score
        FROM sc JOIN embeddings e ON sc.vec_id = e.vec_id
    ), agg AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(score) AS BIGINT) AS sum_score,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM lab GROUP BY label
    )
    SELECT label, n_vecs, sum_score, min_score, max_score, n_pos,
           CAST(CASE WHEN sum_score >= 0
                     THEN (2 * sum_score + n_vecs) // (2 * n_vecs)
                     ELSE -((-2 * sum_score + n_vecs) // (2 * n_vecs))
                END AS BIGINT) AS mean_score
    FROM agg ORDER BY label
    """,
)
def embedding_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label distribution of PC1 projection scores — the "does the
    dominant direction separate my labels?" diagnostic that follows
    embedding_pca_power: each vector's deviation (exact milli-lattice)
    dots the micro-lattice eigenvector, so every score is an exact
    integer and the per-label rollup (count/sum/min/max/positives/
    round-half-away mean) is pure integer arithmetic.  The eigenvector
    re-enters the plan as a 64-literal array (driver-side iteration on
    the collected 2080-cell matrix — linalg.py bounded-collect
    pattern); scoring is ONE map-side zip_with pass over the corpus,
    no join, no extra shuffle beyond the |labels| rollup."""
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        power_top_eigvec,
        scatter_cells,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cells, n, means = scatter_cells(emb, "embedding", dim=64, scale=1000)
    v, _vmv, _vv, _trace = power_top_eigvec(cells, dim=64, iters=12)
    mean_lit = F.array(*[F.lit(m) for m in means])
    v_lit = F.array(*[F.lit(x) for x in v])
    xs = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000, 0).cast("bigint"),
    )
    t = emb.select("label", xs.alias("_xs"))
    t = t.withColumn(
        "_d",
        F.transform(
            F.col("_xs"), lambda x, i: x - F.element_at(mean_lit, i + 1)
        ),
    )
    scored = t.select(
        "label",
        F.aggregate(
            F.zip_with(F.col("_d"), v_lit, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, y: acc + y,
        ).alias("score"),
    )
    agg = scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("score").cast("bigint").alias("sum_score"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "sum_score",
        "min_score",
        "max_score",
        "n_pos",
        F.expr(
            "CAST(CASE WHEN sum_score >= 0 "
            "THEN (2 * sum_score + n_vecs) DIV (2 * n_vecs) "
            "ELSE -((-2 * sum_score + n_vecs) DIV (2 * n_vecs)) "
            "END AS BIGINT)"
        ).alias("mean_score"),
    ).orderBy("label")


@query(
    "supplier_part_bfs_layers",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), deg AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY s
    ), src AS (
        SELECT s FROM deg ORDER BY c DESC, s LIMIT 1
    ), walk(kind, id, dist) AS (
        SELECT 's', s, 0 FROM src
        UNION
        SELECT CASE WHEN w.kind = 's' THEN 'p' ELSE 's' END,
               CASE WHEN w.kind = 's' THEN e.p ELSE e.s END,
               w.dist + 1
        FROM walk w JOIN e
          ON (w.kind = 's' AND e.s = w.id)
          OR (w.kind = 'p' AND e.p = w.id)
        WHERE w.dist < 4
    ), mind AS (
        SELECT kind, id, MIN(dist) AS dist FROM walk GROUP BY kind, id
    )
    SELECT CAST(dist AS INT) AS layer,
           CASE kind WHEN 's' THEN 'supplier' ELSE 'part' END
               AS node_type,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM mind GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def supplier_part_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first expansion layers from the highest-degree supplier
    through the bipartite supplier-part co-sourcing graph — the "blast
    radius" traversal (how much of the supply network is within k hops
    of a hub).  Four rounds of frontier-join-prune: each round joins
    the current frontier against the edge list on ITS key side and
    anti-joins the visited set, so every round is one keyed shuffle
    bounded by the true frontier — the distributed BFS shape that
    holds at any graph size (contrast with the pointer-doubling
    closure in graph.py, which trades rounds for join width).  The
    oracle replays it as a depth-bounded recursive CTE taking min
    dist per node."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    e = e.localCheckpoint(eager=False)
    src_row = (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("s"))
        .limit(1)
        .collect()
    )
    src = int(src_row[0]["s"])
    layers = []  # (layer, node_type, count)
    vis_s = spark.createDataFrame([(src,)], "s BIGINT")
    vis_p = spark.createDataFrame([], "p BIGINT")
    frontier, side = vis_s, "s"
    layers.append((0, "supplier", 1))
    for dist in range(1, 5):
        if side == "s":
            nxt = (
                e.join(frontier, "s")
                .select("p")
                .distinct()
                .join(vis_p, "p", "left_anti")
            )
            nxt = nxt.localCheckpoint(eager=True)
            cnt = nxt.count()
            if cnt:
                layers.append((dist, "part", cnt))
            vis_p = vis_p.unionByName(nxt).localCheckpoint(eager=True)
            frontier, side = nxt, "p"
        else:
            nxt = (
                e.join(frontier, "p")
                .select("s")
                .distinct()
                .join(vis_s, "s", "left_anti")
            )
            nxt = nxt.localCheckpoint(eager=True)
            cnt = nxt.count()
            if cnt:
                layers.append((dist, "supplier", cnt))
            vis_s = vis_s.unionByName(nxt).localCheckpoint(eager=True)
            frontier, side = nxt, "s"
    return (
        spark.createDataFrame(
            layers, "layer INT, node_type STRING, n_nodes BIGINT"
        )
        .orderBy("layer", "node_type")
    )


@query(
    "lineitem_price_model",
    oracle="""
    WITH base AS (
        SELECT YEAR(l_shipdate) AS ship_year,
               CAST(round(l_quantity, 0) AS BIGINT) AS qty,
               CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   AS price_cents
        FROM lineitem
    ), s AS (
        SELECT ship_year,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(qty AS HUGEINT)) AS s1,
               SUM(CAST(disc_pct AS HUGEINT)) AS s2,
               SUM(CAST(qty AS HUGEINT) * qty) AS s11,
               SUM(CAST(disc_pct AS HUGEINT) * disc_pct) AS s22,
               SUM(CAST(qty AS HUGEINT) * disc_pct) AS s12,
               SUM(CAST(price_cents AS HUGEINT)) AS sy,
               SUM(CAST(qty AS HUGEINT) * price_cents) AS s1y,
               SUM(CAST(disc_pct AS HUGEINT) * price_cents) AS s2y,
               SUM(CAST(price_cents AS HUGEINT) * price_cents) AS syy
        FROM base GROUP BY ship_year
    ), d AS (
        SELECT ship_year, CAST(n AS BIGINT) AS n,
               CAST(n * (s11*s22 - s12*s12) - s1 * (s1*s22 - s12*s2)
                    + s2 * (s1*s12 - s11*s2) AS DOUBLE) AS det,
               CAST(sy * (s11*s22 - s12*s12) - s1 * (s1y*s22 - s12*s2y)
                    + s2 * (s1y*s12 - s11*s2y) AS DOUBLE) AS det0,
               CAST(n * (s1y*s22 - s12*s2y) - sy * (s1*s22 - s12*s2)
                    + s2 * (s1*s2y - s1y*s2) AS DOUBLE) AS det1,
               CAST(n * (s11*s2y - s1y*s12) - s1 * (s1*s2y - s1y*s2)
                    + sy * (s1*s12 - s11*s2) AS DOUBLE) AS det2,
               CAST(sy AS DOUBLE) AS syd, CAST(s1y AS DOUBLE) AS s1yd,
               CAST(s2y AS DOUBLE) AS s2yd, CAST(syy AS DOUBLE) AS syyd,
               CAST(n AS DOUBLE) AS nd
        FROM s
    )
    SELECT ship_year, n,
           CASE WHEN det <> 0
                THEN round(det0 / det / 100.0, 6) END AS b0,
           CASE WHEN det <> 0
                THEN round(det1 / det / 100.0, 6) END AS b1,
           CASE WHEN det <> 0
                THEN round(det2 / det / 100.0, 6) END AS b2,
           CASE WHEN det <> 0 AND (syyd - syd*syd/nd) > 0 THEN
               round(1.0 - (syyd - (det0/det*syd + det1/det*s1yd
                                    + det2/det*s2yd))
                         / (syyd - syd*syd/nd), 6)
           END AS r2
    FROM d ORDER BY ship_year
    """,
)
def lineitem_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ship-year TWO-feature least squares — extended price (cents)
    regressed on quantity and discount-percent by EXACT normal
    equations (``linalg.normal_equation_fit``).  One grouped pass
    accumulates the nine sufficient statistics as decimal(38,0); the
    3×3 Cramer determinants are integer cofactor expansions an engine
    replaying the same expression agrees with bit-for-bit, so the only
    float ops are the three final divisions and the R² identity
    SSE = y'y − b'X'y.  Fitting a regression per key costs exactly one
    rollup at any scale — no driver solve, no collect, no per-row
    matrix.  The 100 TB caveat is explicit: decimal(38,0) overflow
    surfaces as NULL (non-ANSI), never a silent wrap."""
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        normal_equation_fit,
    )

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.year("l_shipdate").alias("ship_year"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("qty"),
        F.round(F.col("l_discount") * 100, 0)
        .cast("bigint")
        .alias("disc_pct"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
    )
    return normal_equation_fit(
        base,
        "qty",
        "disc_pct",
        "price_cents",
        ["ship_year"],
        y_per_unit=100,
    ).orderBy("ship_year")


def _pboot_w_sql(u_expr: str) -> str:
    """The shared-literal Poisson(1) inverse-CDF as a SQL case-sum —
    embeds ``plans.metrics.POISSON1_CDF_1E9`` verbatim so the oracle
    inverts the identical thresholds the Spark plan filters against."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        POISSON1_CDF_1E9,
    )

    return " + ".join(
        f"CASE WHEN {u_expr} >= {t} THEN 1 ELSE 0 END"
        for t in POISSON1_CDF_1E9
    )


@query(
    "events_bootstrap_ci",
    oracle=f"""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), point AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
               round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS point_mean
        FROM base GROUP BY event_type
    ), rep AS (
        SELECT base.event_type, base.cents, r.b,
               ('0x' || substr(md5(CAST(base.event_id AS VARCHAR)
                   || ':' || CAST(r.b AS VARCHAR) || ':pboot-v1'),
                   18, 15))::BIGINT % 1000000000 AS u
        FROM base CROSS JOIN (SELECT UNNEST(range(0, 40)) AS b) r
    ), w AS (
        SELECT event_type, b, cents,
               ({_pboot_w_sql('u')}) AS w
        FROM rep
    ), per_rep AS (
        SELECT event_type, b,
               CAST(SUM(w) AS BIGINT) AS sw,
               SUM(CAST(w AS HUGEINT) * cents) AS swy
        FROM w GROUP BY event_type, b
    ), m AS (
        SELECT event_type,
               CASE WHEN sw > 0 THEN CAST(round(
                   CAST(swy AS DOUBLE) / sw / 100.0 * 1e6, 0) AS BIGINT)
               END AS m
        FROM per_rep
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(m) AS HUGEINT) AS nb,
               SUM(CAST(m AS HUGEINT)) AS sm,
               SUM(CAST(m AS HUGEINT) * m) AS smm,
               list(m ORDER BY m) AS arr
        FROM m GROUP BY event_type
    )
    SELECT p.event_type, p.n_rows, p.point_mean,
           round(CAST(arr[2] AS DOUBLE) / 1e6, 6) AS boot_lo,
           round(CAST(arr[39] AS DOUBLE) / 1e6, 6) AS boot_hi,
           CASE WHEN nb > 1 THEN round(sqrt(
               CAST(nb*smm - sm*sm AS DOUBLE)
               / CAST(nb*(nb-1) AS DOUBLE)) / 1e6, 6)
           END AS boot_se
    FROM point p JOIN stats s ON p.event_type = s.event_type
    ORDER BY p.event_type
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type bootstrap confidence interval for mean value by
    POISSON RESAMPLING (``plans.metrics.poisson_bootstrap_ci``) — the
    bootstrap that distributes: each row draws its own 40 replicate
    weights from a keyed PRF through the shared-literal Poisson(1)
    inverse CDF, so no row ever coordinates with another and the whole
    resample is one map-side explode + one (group, replicate) grouped
    shuffle.  Replicate means ride the 1e-6 lattice; the interval is
    rank selection (2nd/39th of 40 sorted means) and the bootstrap SE
    is the exact integer variance of the lattice means.  Error bars on
    any metric at 100 TB for the cost of a 40× fatter rollup."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        poisson_bootstrap_ci,
    )

    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return poisson_bootstrap_ci(
        base,
        "cents",
        "event_id",
        ["event_type"],
        n_boot=40,
        lo_rank=2,
        hi_rank=39,
        y_per_unit=100,
        salt="pboot-v1",
    ).orderBy("event_type")


def _sprt_literals(
    p0: float, p1: float, alpha: float, beta: float
) -> tuple[int, int, int, int]:
    """The SPRT lattice literals (inc1, inc0, upper, lower) — computed
    ONCE here and shared verbatim by the Spark plan (via
    ``sprt_decisions`` recomputing the identical expressions) and the
    DuckDB oracle f-string, so engine parity never touches either
    engine's ln()."""
    import math

    return (
        round(math.log(p1 / p0) * 1e9),
        round(math.log((1.0 - p1) / (1.0 - p0)) * 1e9),
        round(math.log((1.0 - beta) / alpha) * 1e9),
        round(math.log(beta / (1.0 - alpha)) * 1e9),
    )


_SPRT_INC1, _SPRT_INC0, _SPRT_A9, _SPRT_B9 = _sprt_literals(
    0.2, 0.35, 0.1, 0.1
)


@query(
    "user_sprt_monitor",
    oracle=f"""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN {_SPRT_INC1}
                    ELSE {_SPRT_INC0} END AS inc
        FROM events
    ), c AS (
        SELECT user_id,
               SUM(inc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM x
    ), per AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
               MIN(CASE WHEN cum >= {_SPRT_A9} THEN rn END) AS hi,
               MIN(CASE WHEN cum <= {_SPRT_B9} THEN rn END) AS lo
        FROM c GROUP BY user_id
    ), d AS (
        SELECT CASE
                 WHEN hi IS NOT NULL AND (lo IS NULL OR hi < lo)
                     THEN 'accept_h1'
                 WHEN lo IS NOT NULL AND (hi IS NULL OR lo < hi)
                     THEN 'accept_h0'
                 ELSE 'continue' END AS decision,
               CASE
                 WHEN hi IS NOT NULL AND (lo IS NULL OR hi < lo) THEN hi
                 WHEN lo IS NOT NULL AND (hi IS NULL OR lo < hi) THEN lo
                 ELSE n_obs END AS stop_n
        FROM per
    )
    SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_users,
           round(AVG(CAST(stop_n AS DOUBLE)), 6) AS avg_stop_n,
           CAST(MIN(stop_n) AS BIGINT) AS min_stop_n,
           CAST(MAX(stop_n) AS BIGINT) AS max_stop_n
    FROM d GROUP BY decision ORDER BY decision
    """,
)
def user_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Wald SPRT over each user's event stream — "is this
    user's error rate elevated to 35% against the 20% baseline?" —
    rolled into a decision × stopping-time summary
    (``plans.metrics.sprt_decisions``).  The LLR increments and Wald
    boundaries are shared 1e-9-lattice literals, the running sum is an
    exact integer window PARTITIONED BY USER, and the stopping rule is
    a grouped conditional-min — first boundary crossed wins.  At
    100 TB: one keyed shuffle, per-user linear scans, |decisions|-row
    output."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        sprt_decisions,
    )

    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "error").cast("int").alias("is_err"),
    )
    per = sprt_decisions(
        base,
        "is_err",
        ["user_id"],
        ["ts", "event_id"],
        p0=0.2,
        p1=0.35,
        alpha=0.1,
        beta=0.1,
    )
    return (
        per.groupBy("decision")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg(F.col("stop_n").cast("double")), 6).alias(
                "avg_stop_n"
            ),
            F.min("stop_n").cast("bigint").alias("min_stop_n"),
            F.max("stop_n").cast("bigint").alias("max_stop_n"),
        )
        .orderBy("decision")
    )


def _sssp_oracle(rounds: int) -> str:
    """Chained-CTE replay of ``graph.sssp_bounded``: one CTE per
    Bellman-Ford round (NOT a recursive CTE — path enumeration would
    be exponential; the round replay is |nodes|-bounded like the Spark
    plan it mirrors)."""
    parts = [
        """
    WITH e AS (
        SELECT l_suppkey AS s, l_partkey AS p,
               CAST(MIN(round(l_quantity, 0)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
    ), d0 AS (
        SELECT 's' AS kind, CAST(MIN(l_suppkey) AS BIGINT) AS id,
               CAST(0 AS BIGINT) AS dist
        FROM lineitem
    )"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""", d{k} AS (
        SELECT kind, id, MIN(dist) AS dist FROM (
            SELECT * FROM d{k - 1}
            UNION ALL
            SELECT 'p', e.p, d.dist + e.w
            FROM d{k - 1} d JOIN e ON d.kind = 's' AND d.id = e.s
            UNION ALL
            SELECT 's', e.s, d.dist + e.w
            FROM d{k - 1} d JOIN e ON d.kind = 'p' AND d.id = e.p
        ) GROUP BY kind, id
    )"""
        )
    parts.append(
        f"""
    SELECT CASE kind WHEN 's' THEN 'supplier' ELSE 'part' END
               AS node_type,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(MIN(dist) AS BIGINT) AS min_dist,
           CAST(MAX(dist) AS BIGINT) AS max_dist,
           round(AVG(CAST(dist AS DOUBLE)), 6) AS avg_dist
    FROM d{rounds} GROUP BY 1 ORDER BY 1
    """
    )
    return "".join(parts)


@query("supplier_part_sssp", oracle=_sssp_oracle(6))
def supplier_part_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths through the bipartite
    supplier-part graph (edge weight = the cheapest observed order
    quantity for that sourcing link) by six rounds of synchronous
    Bellman-Ford (``graph.sssp_bounded``) from the lowest-keyed
    supplier.  Distances ride the exact integer lattice; each round is
    two keyed equi-joins + one grouped min with lineage cut per round
    — the bounded-horizon SSSP shape that holds at any graph size.
    The per-node-type (count, min, max, avg) rollup value-binds every
    reached distance.  Oracle: chained-CTE round replay."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        sssp_bounded,
    )

    li = _t(spark, sf_dir, "lineitem")
    e = li.groupBy(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).agg(
        F.min(F.round(F.col("l_quantity"), 0))
        .cast("bigint")
        .alias("w")
    )
    src = li.select(
        F.lit("s").alias("kind"),
        F.min("l_suppkey").cast("bigint").alias("id"),
        F.lit(0).cast("bigint").alias("dist"),
    )
    d = sssp_bounded(e, src, rounds=6)
    return (
        d.groupBy(
            F.when(F.col("kind") == "s", F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("node_type")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.max("dist").cast("bigint").alias("max_dist"),
            F.round(F.avg(F.col("dist").cast("double")), 6).alias(
                "avg_dist"
            ),
        )
        .orderBy("node_type")
    )


@query(
    "user_seqpattern_support",
    oracle="""
    WITH f AS (
        SELECT user_id, event_type, ts, event_id FROM (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    ), tot AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events
    ), p AS (
        SELECT a.event_type AS first_type, b.event_type AS then_type,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM f a JOIN f b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
         AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
        GROUP BY 1, 2
    )
    SELECT first_type, then_type, support,
           round(support / (SELECT n FROM tot), 6) AS support_pct
    FROM p ORDER BY first_type, then_type
    """,
)
def user_seqpattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-2 sequential-pattern support over user event streams —
    for every ordered type pair (A then B): how many users saw their
    FIRST A strictly before their FIRST B (the GSP/PrefixSpan unit
    step, and the funnel-mining primitive).  First occurrences are one
    grouped struct-min per (user, type) — |users|×|types| rows — and
    the pair join is keyed on user with fanout bounded by the TYPE
    alphabet (≤ T² per user, never by event volume), which is the
    100 TB shape: sequence mining reduced to a bounded self-join over
    a per-key summary.  Tie-breaks ride (ts, event_id) so the order is
    total on both engines."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("fo")
    )
    tot = e.select(
        F.countDistinct("user_id").cast("bigint").alias("n")
    )
    a, b = f.alias("a"), f.alias("b")
    p = (
        a.join(b, "user_id")
        .filter(
            (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.fo") < F.col("b.fo"))
        )
        .groupBy(
            F.col("a.event_type").alias("first_type"),
            F.col("b.event_type").alias("then_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "first_type",
            "then_type",
            "support",
            F.round(F.col("support") / F.col("n"), 6).alias(
                "support_pct"
            ),
        )
        .orderBy("first_type", "then_type")
    )


@query(
    "orders_t_closeness",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority AS priority,
               YEAR(o_orderdate) AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY 1, 2
    ), gdist AS (
        SELECT o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS cnt_s
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
    ), cells AS (
        SELECT o_orderpriority AS priority,
               YEAR(o_orderdate) AS order_year,
               o_orderstatus AS s,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2, 3
    ), d AS (
        SELECT g.priority, g.order_year, g.n_rows,
               CAST(round((CAST(COALESCE(c.cnt, 0) AS DOUBLE) / g.n_rows
                    - CAST(gl.cnt_s AS DOUBLE) / t.n) * 1e9, 0)
                    AS BIGINT) AS dd
        FROM g CROSS JOIN gdist gl CROSS JOIN tot t
        LEFT JOIN cells c ON c.priority = g.priority
              AND c.order_year = g.order_year AND c.s = gl.s
    ), v AS (
        SELECT priority, order_year, n_rows,
               round(CAST(SUM(ABS(dd)) AS DOUBLE) / 2e9, 6) AS t_value
        FROM d GROUP BY 1, 2, 3
    )
    SELECT priority, order_year, n_rows, t_value,
           t_value > 0.2 AS violates
    FROM v ORDER BY priority, order_year
    """,
)
def orders_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over (priority, order-year) quasi-identifier
    groups with order status as the sensitive attribute
    (``privacy.t_closeness_audit``) — variational distance between
    each group's status distribution and the global one, flagged at
    t = 0.2.  Completes the anonymity ladder next to the k-anonymity
    and l-diversity audits: per-cell 1e-9-lattice rounding before the
    cross-cell sum, the global distribution broadcast over the group
    grid, rollups only — nothing here outgrows a 100 TB scan."""
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        t_closeness_audit,
    )

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("order_year"),
        "o_orderstatus",
    )
    return t_closeness_audit(
        base, ["priority", "order_year"], "o_orderstatus", t=0.2
    ).orderBy("priority", "order_year")


@query(
    "embedding_jl_distortion",
    oracle="""
    WITH vint AS (
        SELECT vec_id, list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 1000, 0) AS BIGINT)) AS v
        FROM embeddings WHERE vec_id < 48
    ), ex AS (
        SELECT vec_id, UNNEST(range(len(v))) AS pos, UNNEST(v) AS x
        FROM vint
    ), signs AS (
        SELECT r, pos,
               CASE WHEN ('0x' || substr(md5('jl-v1:' || r || ':'
                        || pos), 18, 15))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT UNNEST(range(0, 16)) AS r)
        CROSS JOIN (SELECT UNNEST(range(0, 64)) AS pos)
    ), proj AS (
        SELECT e.vec_id, sg.r, CAST(SUM(sg.s * e.x) AS BIGINT) AS p
        FROM ex e JOIN signs sg ON sg.pos = e.pos
        GROUP BY 1, 2
    ), osq AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS o
        FROM ex a JOIN ex b
          ON a.pos = b.pos AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ), psq AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS p2
        FROM proj a JOIN proj b
          ON a.r = b.r AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ), ratio AS (
        SELECT CAST(round(CAST(p.p2 AS DOUBLE) / 16
                          / CAST(o.o AS DOUBLE) * 1e9, 0) AS BIGINT)
                   AS d9
        FROM osq o JOIN psq p ON p.ia = o.ia AND p.ib = o.ib
        WHERE o.o > 0
    )
    SELECT CAST(FLOOR(CAST(d9 AS DOUBLE) / 1e8) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((2 * SUM(d9) + 1000 * COUNT(*)) // (2000 * COUNT(*))
                AS BIGINT) AS avg_micros,
           (MIN(d9) + 500) // 1000 AS min_micros,
           (MAX(d9) + 500) // 1000 AS max_micros
    FROM ratio GROUP BY 1 ORDER BY 1
    """,
)
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit: project the embedding
    corpus through 16 md5-derived ±1 hyperplanes
    (``linalg.jl_projections_int``) and measure, on a fixed 48-vector
    eval slice, the ratio of JL-estimated to exact squared pairwise
    distance — the empirical check of the JL lemma's (1±ε) guarantee
    that gates any "sketch first, measure later" pipeline.  Both
    distances are exact integers on the quantized lattice; each pair's
    ratio lands on the 1e-9 lattice BEFORE the per-bucket aggregation
    (per-cell scaled rounding).  The sign table broadcasts at any
    scale; the pairwise joins touch only the bounded eval slice."""
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        jl_projections_int,
        quantized_coords,
    )

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 48)
    ex = quantized_coords(e, "vec_id", "embedding", scale=1000)
    ex = ex.localCheckpoint(eager=False)
    proj = jl_projections_int(
        ex, "vec_id", k=16, dim=64, salt="jl-v1"
    )
    ea, eb = ex.alias("a"), ex.alias("b")
    osq = (
        ea.join(
            eb,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
        )
        .agg(
            F.sum(
                (F.col("a.x") - F.col("b.x"))
                * (F.col("a.x") - F.col("b.x"))
            )
            .cast("bigint")
            .alias("o")
        )
    )
    pa, pb = proj.alias("a"), proj.alias("b")
    psq = (
        pa.join(
            pb,
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
        )
        .agg(
            F.sum(
                (F.col("a.p") - F.col("b.p"))
                * (F.col("a.p") - F.col("b.p"))
            )
            .cast("bigint")
            .alias("p2")
        )
    )
    d9 = F.round(
        F.col("p2").cast("double") / 16 / F.col("o").cast("double")
        * F.lit(1e9),
        0,
    ).cast("bigint")
    ratio = (
        osq.join(psq, ["ia", "ib"])
        .filter(F.col("o") > 0)
        .select(d9.alias("d9"))
    )
    return (
        ratio.groupBy(
            F.floor(F.col("d9").cast("double") / F.lit(1e8))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            # integer half-up micros — the prior round(·/1e9, 6) forms
            # are decimal-tie surfaces (exact tie at d9 % 1000 == 500,
            # the hazard defect class); d9 >= 0 so div == floor-div
            F.expr(
                "CAST((2 * SUM(d9) + 1000 * COUNT(*))"
                " div (2000 * COUNT(*)) AS BIGINT)"
            ).alias("avg_micros"),
            F.expr("(MIN(d9) + 500) div 1000").alias("min_micros"),
            F.expr("(MAX(d9) + 500) div 1000").alias("max_micros"),
        )
        .orderBy("bucket")
    )


def _kcenter_oracle(k: int = 8) -> str:
    """Chained-CTE replay of ``similarity.kcenter_greedy``: d{j} is the
    exact min-squared-distance table after j centers, r{j+1} the
    argmax pick (dist DESC, id ASC) — one CTE pair per greedy round."""
    parts = [
        """
    WITH ex AS (
        SELECT vec_id, UNNEST(range(len(v))) AS pos, UNNEST(v) AS x
        FROM (SELECT vec_id, list_transform(embedding::DOUBLE[],
                  x -> CAST(round(x * 1000, 0) AS BIGINT)) AS v
              FROM embeddings)
    ), d1 AS (
        SELECT a.vec_id, CAST(SUM((a.x - b.x) * (a.x - b.x))
                   AS BIGINT) AS md
        FROM ex a JOIN ex b
          ON b.vec_id = (SELECT MIN(vec_id) FROM embeddings)
         AND a.pos = b.pos
        GROUP BY 1
    )"""
    ]
    for j in range(2, k + 1):
        parts.append(
            f""", r{j} AS (
        SELECT vec_id FROM d{j - 1} ORDER BY md DESC, vec_id LIMIT 1
    ), d{j} AS (
        SELECT d.vec_id, LEAST(d.md, nd.nd) AS md
        FROM d{j - 1} d JOIN (
            SELECT a.vec_id, CAST(SUM((a.x - b.x) * (a.x - b.x))
                       AS BIGINT) AS nd
            FROM ex a JOIN ex b
              ON b.vec_id = (SELECT vec_id FROM r{j})
             AND a.pos = b.pos
            GROUP BY 1
        ) nd ON nd.vec_id = d.vec_id
    )"""
        )
    rows = [
        """
      SELECT 1 AS rank,
             CAST((SELECT MIN(vec_id) FROM embeddings) AS BIGINT)
                 AS center_id,
             (SELECT MAX(md) FROM d1) AS radius2"""
    ]
    for j in range(2, k + 1):
        rows.append(
            f"""
      UNION ALL SELECT {j},
             CAST((SELECT vec_id FROM r{j}) AS BIGINT),
             (SELECT MAX(md) FROM d{j})"""
        )
    parts.append(
        "\n    SELECT * FROM ("
        + "".join(rows)
        + "\n    ) ORDER BY rank\n    "
    )
    return "".join(parts)


@query("embedding_kcenter_coreset", oracle=_kcenter_oracle(8))
def embedding_kcenter_coreset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Greedy k-center coreset (farthest-point traversal) over the
    embedding corpus (``similarity.kcenter_greedy``, k=8): the chosen
    diversity anchors plus the exact coverage radius² after each pick
    — the curve that tells you how many centers a diversity sample
    needs.  Each round is one map-side scan updating min-dist against
    only the newest center (broadcast literal), argmax by distributed
    TakeOrdered(1); distances are exact lattice integers, so the
    DuckDB chained-CTE replay agrees bit-for-bit."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        kcenter_greedy,
    )

    e = _t(spark, sf_dir, "embeddings")
    centers = kcenter_greedy(e, "vec_id", "embedding", k=8, scale=1000)
    return spark.createDataFrame(
        centers, "rank INT, center_id BIGINT, radius2 BIGINT"
    ).orderBy("rank")


_ZONEMAP_PREDS: list[tuple[str, str, str]] = [
    ("h1_1996", "1996-01-01", "1996-07-01"),
    ("h2_1997", "1997-07-01", "1998-01-01"),
    ("y_1999", "1999-01-01", "2000-01-01"),
    ("m01_2001", "2001-01-01", "2001-02-01"),
]


def _zonemap_oracle() -> str:
    m_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{lo}' "
        f"AND l_shipdate < TIMESTAMP '{hi}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS m{i}"
        for i, (_, lo, hi) in enumerate(_ZONEMAP_PREDS)
    )
    values = ",\n        ".join(
        f"({i}, '{lab}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
        for i, (lab, lo, hi) in enumerate(_ZONEMAP_PREDS)
    )
    m_case = " ".join(
        f"WHEN {i} THEN m{i}" for i in range(len(_ZONEMAP_PREDS))
    )
    return f"""
    WITH z AS (
        SELECT l_orderkey // 4096 AS g,
               MIN(l_shipdate) AS zmin, MAX(l_shipdate) AS zmax,
               CAST(COUNT(*) AS BIGINT) AS n,
               {m_cols}
        FROM lineitem GROUP BY 1
    ), preds(pred_id, pred_label, lo, hi) AS (
        VALUES {values}
    ), grid AS (
        SELECT p.pred_label, p.pred_id, z.*,
               NOT (z.zmax < p.lo OR z.zmin >= p.hi) AS survives
        FROM z CROSS JOIN preds p
    )
    SELECT pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN NOT survives THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pruned,
           CAST(SUM(CASE WHEN survives THEN n ELSE 0 END)
               AS BIGINT) AS rows_scanned,
           CAST(SUM(CASE pred_id {m_case} ELSE 0 END)
               AS BIGINT) AS rows_matching,
           round(CAST(SUM(CASE WHEN survives THEN n ELSE 0 END)
               AS DOUBLE) / SUM(n), 6) AS scan_fraction,
           round(CAST(SUM(CASE pred_id {m_case} ELSE 0 END)
               AS DOUBLE) / SUM(n), 6) AS match_fraction
    FROM grid GROUP BY pred_label, pred_id ORDER BY pred_label
    """


@query("lineitem_zonemap_audit", oracle=_zonemap_oracle())
def lineitem_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit over lineitem with 4096-order "row
    groups" (``plans.metrics.zonemap_pruning``): for four ship-date
    range predicates, how many storage units the parquet-footer
    min/max stats would skip, how many rows the surviving units scan,
    and how many actually match.  scan_fraction ≈ match_fraction means
    the layout clusters on ship date; scan ≫ match quantifies exactly
    how much I/O a re-sort would reclaim — the measurement that
    decides Z-ordering/compaction at 100 TB.  One grouped pass builds
    the zone map AND the matching counts (the predicate set is a
    plan-time literal); the predicate grid is a broadcast."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        zonemap_pruning,
    )

    li = _t(spark, sf_dir, "lineitem")
    return zonemap_pruning(
        li,
        F.expr("l_orderkey DIV 4096"),
        "l_shipdate",
        _ZONEMAP_PREDS,
    )


@query(
    "events_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(CAST(SUM(CAST(round(value * 100, 0)
                   AS BIGINT)) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS m
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(m) AS BIGINT) AS s
        FROM daily
    ), seq AS (
        SELECT day, m, t.n, t.s,
               ROW_NUMBER() OVER (ORDER BY day) AS rt,
               CAST(SUM(m) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS sl
        FROM daily CROSS JOIN tot t
    ), sc AS (
        SELECT day, rt,
               CAST(rt AS BIGINT) AS n_left,
               CAST(n - rt AS BIGINT) AS n_right,
               round(CAST(sl AS DOUBLE) / CAST(rt AS DOUBLE)
                   / 100.0, 6) AS mean_left,
               round(CAST(s - sl AS DOUBLE) / CAST(n - rt AS DOUBLE)
                   / 100.0, 6) AS mean_right,
               CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                   / CAST(rt AS DOUBLE)
                 + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                   / CAST(n - rt AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS gain
        FROM seq WHERE rt < n
    ), root AS (
        SELECT * FROM sc ORDER BY gain DESC, day LIMIT 1
    ), lab AS (
        SELECT CASE WHEN seq.rt <= (SELECT rt FROM root)
                    THEN 'left' ELSE 'right' END AS seg, day, m
        FROM seq
    ), segtot AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n2,
               CAST(SUM(m) AS BIGINT) AS s2
        FROM lab GROUP BY 1
    ), seq2 AS (
        SELECT l.seg, l.day, l.m, st.n2, st.s2,
               ROW_NUMBER() OVER (PARTITION BY l.seg ORDER BY l.day)
                   AS rt,
               CAST(SUM(l.m) OVER (PARTITION BY l.seg ORDER BY l.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sl
        FROM lab l JOIN segtot st ON st.seg = l.seg
    ), sc2 AS (
        SELECT seg, day,
               CAST(rt AS BIGINT) AS n_left,
               CAST(n2 - rt AS BIGINT) AS n_right,
               round(CAST(sl AS DOUBLE) / CAST(rt AS DOUBLE)
                   / 100.0, 6) AS mean_left,
               round(CAST(s2 - sl AS DOUBLE) / CAST(n2 - rt AS DOUBLE)
                   / 100.0, 6) AS mean_right,
               CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                   / CAST(rt AS DOUBLE)
                 + CAST(s2 - sl AS DOUBLE) * CAST(s2 - sl AS DOUBLE)
                   / CAST(n2 - rt AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   / CAST(n2 AS DOUBLE) AS gain
        FROM seq2 WHERE rt < n2
    ), best2 AS (
        SELECT * FROM (
            SELECT sc2.*, ROW_NUMBER() OVER (
                PARTITION BY seg ORDER BY gain DESC, day) AS rk
            FROM sc2
        ) WHERE rk = 1
    )
    SELECT segment, split_day, n_left, n_right, mean_left,
           mean_right, gain FROM (
        SELECT 'root' AS segment, day AS split_day, n_left, n_right,
               mean_left, mean_right, round(gain, 2) AS gain
        FROM root
        UNION ALL
        SELECT seg, day, n_left, n_right, mean_left, mean_right,
               round(gain, 2)
        FROM best2
    ) ORDER BY segment
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 binary-segmentation changepoint detection over the
    daily mean event value (``plans.metrics.binseg_mean_shift``): the
    split maximizing between-segments sum of squares — via the exact
    prefix-sum identity gain = S_L²/n_L + S_R²/n_R − S²/n, so the
    whole detector is one ordered prefix pass over the |days|-sized
    post-aggregation frame (the documented global-window exception) —
    then one recursion into each side.  The raw 100 TB pass is the
    daily rollup; everything after runs on a frame the size of the
    calendar."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        binseg_mean_shift,
    )

    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(
            F.sum(cents).cast("double") / F.count(F.lit(1)), 0
        )
        .cast("bigint")
        .alias("m")
    )
    return binseg_mean_shift(daily, "day", "m", y_per_unit=100)


@query(
    "events_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(CAST(SUM(CAST(round(value * 100, 0)
                   AS BIGINT)) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS m
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(SUM(CASE WHEN b.m > a.m THEN 1
                             WHEN b.m < a.m THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON a.day < b.day
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily
    ), ties AS (
        SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5))
                   AS BIGINT), 0) AS tt
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
              FROM daily GROUP BY m HAVING COUNT(*) > 1)
    ), v AS (
        SELECT s.s_stat, n.nd,
               CAST(n.nd * (n.nd - 1) * (2 * n.nd + 5) - ties.tt
                   AS DOUBLE) / 18.0 AS var_d
        FROM s CROSS JOIN n CROSS JOIN ties
    )
    SELECT nd AS n_days, s_stat,
           round(var_d, 6) AS var_s,
           round(CASE WHEN s_stat > 0
                      THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_d)
                      WHEN s_stat < 0
                      THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_d)
                      ELSE 0.0 END, 6) AS z_score,
           CASE WHEN (CASE WHEN s_stat > 0
                      THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_d)
                      WHEN s_stat < 0
                      THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_d)
                      ELSE 0.0 END) > 1.96 THEN 'increasing'
                WHEN (CASE WHEN s_stat > 0
                      THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_d)
                      WHEN s_stat < 0
                      THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_d)
                      ELSE 0.0 END) < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM v
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test over the daily mean event
    value — the distribution-free complement to the Theil-Sen slope
    already in the registry: S = Σ_{i<j} sign(m_j − m_i) with the
    exact tie-corrected variance, continuity-corrected z.  The
    pairwise comparison runs over the |days|-sized POST-AGGREGATION
    frame (the documented exception — the 100 TB pass is the daily
    rollup); S, the tie term, and the variance numerator are exact
    integers, so both engines agree before the single sqrt."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum(cents).cast("double") / F.count(F.lit(1)), 0)
        .cast("bigint")
        .alias("m")
    )
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(
            F.when(F.col("b.m") > F.col("a.m"), 1)
            .when(F.col("b.m") < F.col("a.m"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ties = (
        daily.groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("tt")
        )
    )
    v = (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "nd",
            (
                (
                    F.col("nd")
                    * (F.col("nd") - 1)
                    * (2 * F.col("nd") + 5)
                    - F.col("tt")
                ).cast("double")
                / F.lit(18.0)
            ).alias("var_d"),
        )
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double")
            / F.sqrt(F.col("var_d")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double")
            / F.sqrt(F.col("var_d")),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("nd").alias("n_days"),
        "s_stat",
        F.round(F.col("var_d"), 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
        F.when(z > 1.96, F.lit("increasing"))
        .when(z < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


@query(
    "user_path_trigrams",
    oracle="""
    WITH tri AS (
        SELECT event_type AS t1,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS t2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS t3
        FROM events
    ), c AS (
        SELECT t1 || '>' || t2 || '>' || t3 AS path,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM tri WHERE t3 IS NOT NULL
        GROUP BY 1
    )
    SELECT path, n_paths,
           CAST(row_number() OVER (ORDER BY n_paths DESC, path)
               AS INT) AS pos
    FROM c QUALIFY pos <= 15 ORDER BY pos
    """,
)
def user_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most common length-3 event paths across user streams —
    frequency mining over consecutive type trigrams (the "what do
    users actually do" path report).  Two LEADs over the per-user
    window (keyed — every user's stream is its own partition's work),
    one grouped count over a T³-bounded path alphabet, leaderboard via
    distributed TakeOrdered with (count, path) total order."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    c = tri.groupBy(
        F.concat_ws(">", "t1", "t2", "t3").alias("path")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    top = take_top_k(
        c, [F.desc("n_paths"), F.col("path")], 15, rank_col="pos"
    )
    return top.select("path", "n_paths", "pos").orderBy("pos")


@query(
    "events_ab_bootstrap_uplift",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN ('0x' || substr(md5('ab-v1:'
                   || CAST(user_id AS VARCHAR)), 18, 15))::BIGINT
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), point AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS pm
        FROM base GROUP BY arm
    ), rep AS (
        SELECT base.arm, base.cents, r.b,
               ('0x' || substr(md5(CAST(base.event_id AS VARCHAR)
                   || ':' || CAST(r.b AS VARCHAR) || ':abboot-v1'),
                   18, 15))::BIGINT % 1000000000 AS u
        FROM base CROSS JOIN (SELECT UNNEST(range(0, 40)) AS b) r
    ), w AS (
        SELECT arm, b, cents, ({_pboot_w_sql('u')}) AS w
        FROM rep
    ), per_rep AS (
        SELECT arm, b,
               CAST(SUM(w) AS BIGINT) AS sw,
               SUM(CAST(w AS HUGEINT) * cents) AS swy
        FROM w GROUP BY arm, b
    ), m AS (
        SELECT arm, b,
               CASE WHEN sw > 0 THEN CAST(round(
                   CAST(swy AS DOUBLE) / sw / 100.0 * 1e6, 0)
                   AS BIGINT) END AS m
        FROM per_rep
    ), diffs AS (
        SELECT b,
               MAX(CASE WHEN arm = 'B' THEN m END)
                   - MAX(CASE WHEN arm = 'A' THEN m END) AS d
        FROM m GROUP BY b
    ), st AS (
        SELECT list(d ORDER BY d) AS arr FROM diffs
    ), ci AS (
        SELECT round(CAST(arr[2] AS DOUBLE) / 1e6, 6) AS boot_lo,
               round(CAST(arr[39] AS DOUBLE) / 1e6, 6) AS boot_hi
        FROM st
    )
    SELECT pa.n AS n_a, pb.n AS n_b,
           pa.pm AS mean_a, pb.pm AS mean_b,
           round(pb.pm - pa.pm, 6) AS uplift,
           ci.boot_lo, ci.boot_hi,
           (ci.boot_lo > 0 OR ci.boot_hi < 0) AS significant
    FROM (SELECT n, pm FROM point WHERE arm = 'A') pa
    CROSS JOIN (SELECT n, pm FROM point WHERE arm = 'B') pb
    CROSS JOIN ci
    """,
)
def events_ab_bootstrap_uplift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bootstrap confidence interval for the A/B uplift in mean
    purchase value (``plans.metrics.poisson_bootstrap_uplift``): arms
    assigned by the keyed user hash (the registry's experiment-split
    discipline), 40 Poisson replicates per row, per-replicate uplift
    as the exact integer difference of the two arms' lattice means,
    interval by rank selection with a zero-exclusion significance
    flag.  The error bar every experiment readout needs, at the cost
    of one 40× explode + two grouped shuffles."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        md5_64,
    )
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        poisson_bootstrap_uplift,
    )

    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = e.select(
        F.when(
            F.pmod(
                md5_64(
                    F.concat(
                        F.lit("ab-v1:"),
                        F.col("user_id").cast("string"),
                    )
                ),
                F.lit(2),
            )
            == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return poisson_bootstrap_uplift(
        base,
        "cents",
        "event_id",
        "arm",
        n_boot=40,
        lo_rank=2,
        hi_rank=39,
        y_per_unit=100,
        salt="abboot-v1",
    )


def _textrank_oracle(iters: int = 8, min_pair: int = 5) -> str:
    """Unrolled integer-PageRank replay over the word co-occurrence
    graph — the ``_pagerank_oracle`` round structure with the
    ``word_graph_edges`` build as the edge CTE."""
    parts = [
        f"""
    WITH w AS MATERIALIZED (
        SELECT string_split_regex(trim(lower(text)),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS t
        FROM documents
    ), g AS MATERIALIZED (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t FROM w WHERE len(t) >= 2),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), pc AS (
        SELECT w1, w2 FROM g
        GROUP BY w1, w2
        HAVING COUNT(*) >= {min_pair} AND w1 <> w2
    ), edges AS (
        SELECT w1 AS src, w2 AS dst FROM pc
        UNION
        SELECT w2 AS src, w1 AS dst FROM pc
    ), nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT id, 1000000000000 // n AS rank FROM nodes CROSS JOIN cnt
    )"""
    ]
    for k in range(iters):
        parts.append(
            f""",
    c{k} AS (
        SELECT e.dst AS id, SUM(r.rank // d.outdeg) AS c
        FROM r{k} r JOIN deg d ON r.id = d.id
        JOIN edges e ON e.src = r.id
        GROUP BY e.dst
    ), r{k + 1} AS (
        SELECT nodes.id,
               (15 * (1000000000000 // cnt.n)) // 100
                   + (85 * COALESCE(c.c, 0)) // 100 AS rank
        FROM nodes LEFT JOIN c{k} c ON nodes.id = c.id CROSS JOIN cnt
    )"""
        )
    parts.append(
        f"""
    SELECT id AS word, CAST(rank AS BIGINT) AS rank_units,
           CAST(row_number() OVER (ORDER BY rank DESC, id) AS INT)
               AS pos
    FROM r{iters} QUALIFY pos <= 20 ORDER BY pos
    """
    )
    return "".join(parts)


@query("doc_textrank_keywords", oracle=_textrank_oracle())
def doc_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau '04): integer
    PageRank (``graph.pagerank_int``, 8 rounds) over the undirected
    word co-occurrence graph (``text.word_graph_edges``), top-20 words
    by stationary rank — the unsupervised keyword ranker that
    complements the registry's RAKE and TF-IDF extractors with a
    graph-centrality signal.  Every update is exact bigint (iterative
    yet hash-checkable); per round one keyed join + one rollup over
    the vocabulary-sized graph; leaderboard via distributed
    TakeOrdered."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        pagerank_int,
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        word_graph_edges,
    )

    d = _t(spark, sf_dir, "documents")
    edges = word_graph_edges(d, text_col="text", min_pair_count=5)
    ranks = pagerank_int(edges, iterations=8)
    top = take_top_k(
        ranks, [F.desc("rank"), F.col("id")], 20, rank_col="pos"
    )
    return top.select(
        F.col("id").alias("word"),
        F.col("rank").alias("rank_units"),
        "pos",
    ).orderBy("pos")


def _closeness_oracle(rounds: int = 6) -> str:
    """Chained-CTE replay of the multi-source bounded BFS (unweighted
    ``graph.sssp_bounded`` with a carried source column)."""
    parts = [
        """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), srcs AS (
        SELECT src FROM (
            SELECT DISTINCT l_suppkey AS src FROM lineitem
        ) ORDER BY src LIMIT 4
    ), d0 AS (
        SELECT src, 's' AS kind, CAST(src AS BIGINT) AS id,
               CAST(0 AS BIGINT) AS dist
        FROM srcs
    )"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""", d{k} AS (
        SELECT src, kind, id, MIN(dist) AS dist FROM (
            SELECT * FROM d{k - 1}
            UNION ALL
            SELECT d.src, 'p', e.p, d.dist + 1
            FROM d{k - 1} d JOIN e ON d.kind = 's' AND d.id = e.s
            UNION ALL
            SELECT d.src, 's', e.s, d.dist + 1
            FROM d{k - 1} d JOIN e ON d.kind = 'p' AND d.id = e.p
        ) GROUP BY src, kind, id
    )"""
        )
    parts.append(
        f"""
    SELECT src AS source_id, CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           round(CAST(COUNT(*) - 1 AS DOUBLE)
                 / CAST(SUM(dist) AS DOUBLE), 6) AS closeness
    FROM d{rounds} GROUP BY src ORDER BY source_id
    """
    )
    return "".join(parts)


@query("supplier_closeness_centrality", oracle=_closeness_oracle(6))
def supplier_closeness_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Closeness centrality of the four lowest-keyed suppliers in the
    bipartite supplier-part graph: multi-source bounded BFS
    (``graph.sssp_bounded`` with unit weights and a carried source
    column — ONE shared relaxation loop computes all four frontiers
    simultaneously, state keyed on (source, node)), then closeness =
    (reached−1)/Σdist per source.  Completes the centrality family
    next to PageRank, HITS, assortativity, and k-core.  Each round is
    two keyed joins + one grouped min at any graph size."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        sssp_bounded,
    )

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct().select("s", "p", F.lit(1).cast("bigint").alias("w"))
    srcs = (
        li.select(F.col("l_suppkey").alias("src"))
        .distinct()
        .orderBy("src")
        .limit(4)
    )
    source = srcs.select(
        "src",
        F.lit("s").alias("kind"),
        F.col("src").cast("bigint").alias("id"),
        F.lit(0).cast("bigint").alias("dist"),
    )
    d = sssp_bounded(e, source, rounds=6, carry_cols=("src",))
    return (
        d.groupBy(F.col("src").alias("source_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.sum("dist").cast("bigint").alias("sum_dist"),
            F.round(
                (F.count(F.lit(1)) - 1).cast("double")
                / F.sum("dist").cast("double"),
                6,
            ).alias("closeness"),
        )
        .orderBy("source_id")
    )


def _clf_score_cte() -> str:
    """The hashed-linear-classifier scoring chain as a WITH-fragment —
    the same w/tok/feat/s pipeline the ``classifier_auc_eval`` oracle
    replays (md5-PRF weights over 4096 hashed features, score =
    mean feature weight on the 1e-6 lattice, one row per non-blank
    document: s(doc_id, lang, sv))."""
    return """
    w AS (
        SELECT i AS fid,
               (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 18, 15))
                   ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM generate_series(0, 4095) t(i)
    ), tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text),
                   '[ \\t\\n\\r\\f\\x0b]+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 18, 15))::BIGINT % 4096 AS fid
        FROM tok
    ), s AS (
        SELECT doc_id, MAX(lang) AS lang,
               CAST(round(SUM(wt) / COUNT(*) * 1e6, 0) AS BIGINT) AS sv
        FROM feat JOIN w ON feat.fid = w.fid
        GROUP BY doc_id
    )"""


@query(
    "classifier_isotonic_calibration",
    oracle=f"""
    WITH {_clf_score_cte()}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), b AS (
        SELECT ((sv - mn) * 12) // (mx - mn + 1) AS bin,
               CAST(COUNT(*) AS BIGINT) AS w2,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS y
        FROM s CROSS JOIN mm GROUP BY 1
    ), p AS (
        SELECT bin,
               CAST(SUM(w2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
               CAST(SUM(y) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
        FROM b
    ), pa AS (
        SELECT CAST(-1 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS cw,
               CAST(0 AS BIGINT) AS cy
        UNION ALL SELECT bin, cw, cy FROM p
    ), pairs AS (
        SELECT a.bin AS i0, j.bin AS j,
               CAST(j.cy - a.cy AS DOUBLE)
                   / CAST(j.cw - a.cw AS DOUBLE) AS m
        FROM pa a JOIN p j ON j.bin > a.bin
    ), inner_ AS (
        SELECT k.bin AS k, pr.i0, MIN(pr.m) AS mn
        FROM b k JOIN pairs pr
          ON pr.i0 < k.bin AND pr.j >= k.bin
        GROUP BY 1, 2
    ), fit AS (
        SELECT k, MAX(mn) AS f FROM inner_ GROUP BY k
    )
    SELECT b.bin, b.w2 AS w, b.y,
           round(CAST(b.y AS DOUBLE) / CAST(b.w2 AS DOUBLE), 6)
               AS rate,
           round(f.f, 6) AS isotonic
    FROM b JOIN fit f ON f.k = b.bin ORDER BY b.bin
    """,
)
def classifier_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (PAV) calibration of the hashed linear classifier
    against the English label — 12 equal-width score bins, then the
    EXACT pool-adjacent-violators solution via its closed minimax form
    (``plans.metrics.isotonic_fit_bins``): no iteration, just pair
    enumeration over the bin-sized frame, so the iterative-looking fit
    stays one-shot hash-checkable.  The output is the monotone
    calibrated rate per bin next to the raw rate — the curve a
    quality-score threshold should be read off of.  The 100 TB pass is
    the score rollup; everything after is calendar-scale."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        isotonic_fit_bins,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    # the interpreted-HOF scoring pass is the dominant cost: pin it so
    # the min/max agg, the binning, and every tiny downstream frame
    # read the materialized scores instead of re-scoring the corpus
    scored = scored.localCheckpoint(eager=False)
    mm = scored.agg(
        F.min("sv").alias("mn"), F.max("sv").alias("mx")
    )
    bins = (
        scored.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr("((sv - mn) * 12) div (mx - mn + 1)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("w"),
            F.sum("pos").cast("bigint").alias("y"),
        )
    )
    return isotonic_fit_bins(bins, "bin", "w", "y")


@query(
    "classifier_brier_decomposition",
    oracle=f"""
    WITH {_clf_score_cte()}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), pr AS (
        SELECT ((sv - mn) * 1000000000) // (mx - mn) AS p9,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM s CROSS JOIN mm
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS ysum,
               CAST(SUM(CAST(p9 - y * 1000000000 AS HUGEINT)
                        * (p9 - y * 1000000000)) AS HUGEINT) AS sqsum
        FROM pr
    ), b AS (
        SELECT LEAST(p9 // 100000000, 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS w2,
               CAST(SUM(y) AS BIGINT) AS yb,
               CAST(SUM(p9) AS BIGINT) AS pb
        FROM pr GROUP BY 1
    ), cells AS (
        SELECT b.bin, b.w2,
               CAST(b.pb AS DOUBLE) / b.w2 / 1e9 AS pbar,
               CAST(b.yb AS DOUBLE) / b.w2 AS obar_k,
               CAST(t.ysum AS DOUBLE) / t.n AS obar
        FROM b CROSS JOIN tot t
    ), terms AS (
        SELECT SUM(CAST(round(CAST(w2 AS DOUBLE)
                   * (pbar - obar_k) * (pbar - obar_k) * 1e6, 0)
                   AS BIGINT)) AS relc,
               SUM(CAST(round(CAST(w2 AS DOUBLE)
                   * (obar_k - obar) * (obar_k - obar) * 1e6, 0)
                   AS BIGINT)) AS resc
        FROM cells
    )
    SELECT t.n, t.ysum AS n_pos,
           CAST((2 * t.sqsum + CAST(t.n AS HUGEINT) * 1000000000000)
                // (2 * CAST(t.n AS HUGEINT) * 1000000000000)
                AS BIGINT) AS brier_micros,
           CAST((2 * tm.relc + t.n) // (2 * t.n) AS BIGINT)
               AS reliability_micros,
           CAST((2 * tm.resc + t.n) // (2 * t.n) AS BIGINT)
               AS resolution_micros,
           round((CAST(t.ysum AS DOUBLE) / t.n)
                 * (1.0 - CAST(t.ysum AS DOUBLE) / t.n), 6)
               AS uncertainty
    FROM tot t CROSS JOIN terms tm
    """,
)
def classifier_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy decomposition of the Brier score for the hashed linear
    classifier (min-max-normalized score as the forecast probability,
    English as the outcome): BRIER exactly from per-document squared
    errors on the 1e-9 probability lattice (HUGEINT/decimal sums —
    per-doc error² reaches 1e18, so int64 would wrap), RELIABILITY and
    RESOLUTION from 10 forecast deciles with per-bin scaled rounding
    before the cross-bin sums, UNCERTAINTY = ō(1−ō).  The forecast-
    quality triptych next to the registry's AUC / PR-AUC / calibration
    deciles.  One score rollup + one decile rollup at any scale."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    dec = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    scored = scored.localCheckpoint(eager=False)
    mm = scored.agg(F.min("sv").alias("mn"), F.max("sv").alias("mx"))
    pr = scored.crossJoin(F.broadcast(mm)).select(
        F.expr("((sv - mn) * 1000000000) div (mx - mn)").alias("p9"),
        "y",
    )
    pr = pr.localCheckpoint(eager=False)
    err = F.col("p9") - F.col("y") * F.lit(1_000_000_000)
    tot = pr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("ysum"),
        F.sum(err.cast(dec) * err).alias("sqsum"),
    )
    b = pr.groupBy(
        F.least(F.expr("p9 div 100000000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("w2"),
        F.sum("y").cast("bigint").alias("yb"),
        F.sum("p9").cast("bigint").alias("pb"),
    )
    cells = b.crossJoin(F.broadcast(tot)).select(
        "w2",
        (F.col("pb").cast("double") / F.col("w2") / F.lit(1e9)).alias(
            "pbar"
        ),
        (F.col("yb").cast("double") / F.col("w2")).alias("obar_k"),
        (F.col("ysum").cast("double") / F.col("n")).alias("obar"),
    )
    terms = cells.agg(
        F.sum(
            F.round(
                F.col("w2").cast("double")
                * (F.col("pbar") - F.col("obar_k"))
                * (F.col("pbar") - F.col("obar_k"))
                * F.lit(1e6),
                0,
            ).cast("bigint")
        ).alias("relc"),
        F.sum(
            F.round(
                F.col("w2").cast("double")
                * (F.col("obar_k") - F.col("obar"))
                * (F.col("obar_k") - F.col("obar"))
                * F.lit(1e6),
                0,
            ).cast("bigint")
        ).alias("resc"),
    )
    obar = F.col("ysum").cast("double") / F.col("n")
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            "n",
            F.col("ysum").alias("n_pos"),
            # integer half-up micros — the prior round(·/n/1e18, 6) /
            # round(·/1e6/n, 6) forms are mean-of-lattice decimal-tie
            # surfaces; all numerators >= 0 so div == floor-div
            F.expr(
                "CAST((2 * sqsum"
                " + CAST(n AS decimal(38,0)) * 1000000000000)"
                " div (2 * CAST(n AS decimal(38,0)) * 1000000000000)"
                " AS BIGINT)"
            ).alias("brier_micros"),
            F.expr("(2 * relc + n) div (2 * n)").alias(
                "reliability_micros"
            ),
            F.expr("(2 * resc + n) div (2 * n)").alias(
                "resolution_micros"
            ),
            F.round(obar * (F.lit(1.0) - obar), 6).alias(
                "uncertainty"
            ),
        )
    )


@query(
    "embedding_silhouette",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 1000, 0) AS BIGINT)) AS vv
        FROM embeddings
    ), ex AS (
        SELECT vec_id, label, UNNEST(range(len(vv))) AS pos,
               UNNEST(vv) AS x
        FROM v
    ), cent AS (
        SELECT label AS clabel, pos,
               CAST(round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 0)
                   AS BIGINT) AS c
        FROM ex GROUP BY 1, 2
    ), d2 AS (
        SELECT e.vec_id, e.label, c.clabel,
               CAST(SUM((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS dd
        FROM ex e JOIN cent c ON c.pos = e.pos
        GROUP BY 1, 2, 3
    ), per AS (
        SELECT vec_id, label,
               MIN(CASE WHEN clabel = label THEN dd END) AS a2,
               MIN(CASE WHEN clabel <> label THEN dd END) AS b2
        FROM d2 GROUP BY 1, 2
    ), sil AS (
        SELECT label,
               CAST(round((sqrt(CAST(b2 AS DOUBLE))
                           - sqrt(CAST(a2 AS DOUBLE)))
                   / GREATEST(sqrt(CAST(a2 AS DOUBLE)),
                              sqrt(CAST(b2 AS DOUBLE))) * 1e9, 0)
                   AS BIGINT) AS s9
        FROM per
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CASE WHEN SUM(s9) >= 0
                     THEN (2 * SUM(s9) + 1000 * COUNT(*))
                          // (2000 * COUNT(*))
                     ELSE -((2 * -SUM(s9) + 1000 * COUNT(*))
                            // (2000 * COUNT(*)))
                END AS BIGINT) AS mean_sil_micros
    FROM sil GROUP BY label ORDER BY label
    """,
)
def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette score of the embedding corpus
    (Hruschka et al.'s centroid variant — a(i) = distance to own
    centroid, b(i) = nearest other centroid): the cluster-quality
    readout that tells you whether the label structure is real before
    you trust a per-cluster sampling or pruning decision.  Centroids
    are integer-rounded lattice vectors (one rollup); per-vector
    distances come from ONE keyed join against the broadcast-scale
    centroid table (|labels|×dim rows) — the pairwise-free silhouette
    that scales to any corpus; each s(i) lands on the 1e-9 lattice
    before the per-label mean."""
    e = _t(spark, sf_dir, "embeddings")
    vint = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 1000, 0).cast("bigint"),
    )
    ex = e.select(
        "vec_id", "label", F.posexplode(vint).alias("pos", "x")
    )
    ex = ex.localCheckpoint(eager=False)
    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 0)
        .cast("bigint")
        .alias("c")
    )
    d2 = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
            )
            .cast("bigint")
            .alias("dd")
        )
    )
    per = d2.groupBy("vec_id", "label").agg(
        F.min(
            F.when(F.col("clabel") == F.col("label"), F.col("dd"))
        ).alias("a2"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dd"))
        ).alias("b2"),
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    s9 = F.round((sb - sa) / F.greatest(sa, sb) * F.lit(1e9), 0).cast(
        "bigint"
    )
    sil = per.select("label", s9.alias("s9"))
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            # integer half-away-from-zero mean in micros — the prior
            # round(sum/n/1e9, 6) is a mean-of-lattice decimal-tie
            # surface; s9 is signed and Spark `div` truncates while
            # DuckDB `//` floors, so route through ABS on both sides
            F.expr(
                "CAST(CASE WHEN SUM(s9) >= 0"
                " THEN (2 * SUM(s9) + 1000 * COUNT(*))"
                " div (2000 * COUNT(*))"
                " ELSE -((2 * -SUM(s9) + 1000 * COUNT(*))"
                " div (2000 * COUNT(*)))"
                " END AS BIGINT)"
            ).alias("mean_sil_micros"),
        )
        .orderBy("label")
    )


@query(
    "events_rolling_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM du
    ), j AS (
        SELECT d.day, du.user_id, du.day AS uday
        FROM days d JOIN du
          ON du.day BETWEEN d.day - 6 AND d.day
    ), agg AS (
        SELECT day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
               CAST(COUNT(DISTINCT CASE WHEN uday = day
                   THEN user_id END) AS BIGINT) AS dau
        FROM j GROUP BY day
    )
    SELECT day, dau, wau,
           round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)
               AS stickiness
    FROM agg ORDER BY day
    """,
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) next to daily actives
    (DAU) and the DAU/WAU stickiness ratio — the windowed DISTINCT
    that plain sliding windows cannot express (sets don't sum).  The
    shape that scales: dedup to (user, day) FIRST (one grouped pass
    over the raw stream), then each calendar day joins at most 7 of a
    user's activity days — the expansion is bounded by the window
    length, never by event volume, and the calendar side broadcasts."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.col("ts").cast("date").alias("uday")
    ).distinct()
    du = du.localCheckpoint(eager=False)
    days = du.select(F.col("uday").alias("d")).distinct()
    j = du.join(
        F.broadcast(days),
        (F.col("uday") >= F.date_sub(F.col("d"), 6))
        & (F.col("uday") <= F.col("d")),
    )
    agg = j.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau"),
        F.countDistinct(
            F.when(F.col("uday") == F.col("d"), F.col("user_id"))
        )
        .cast("bigint")
        .alias("dau"),
    )
    return agg.select(
        "day",
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"),
            6,
        ).alias("stickiness"),
    ).orderBy("day")


@query(
    "events_ks_test",
    oracle="""
    WITH base AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IN ('purchase', 'view')
    ), hist AS (
        SELECT cents, CAST(SUM(a) AS BIGINT) AS ca,
               CAST(COUNT(*) - SUM(a) AS BIGINT) AS cb
        FROM base GROUP BY 1
    ), cum AS (
        SELECT CAST(SUM(ca) OVER (ORDER BY cents ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cuma,
               CAST(SUM(cb) OVER (ORDER BY cents ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cumb
        FROM hist
    ), tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS na,
               CAST(COUNT(*) - SUM(a) AS BIGINT) AS nb
        FROM base
    ), d AS (
        SELECT CAST(MAX(ABS(cuma * t.nb - cumb * t.na)) AS BIGINT)
                   AS dn
        FROM cum CROSS JOIN tot t
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           round(CAST(d.dn AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)), 6)
               AS ks_d,
           round(1.36 * sqrt(CAST(t.na + t.nb AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))), 6)
               AS ks_crit,
           (CAST(d.dn AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)))
               > (1.36 * sqrt(CAST(t.na + t.nb AS DOUBLE)
                 / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))))
               AS significant
    FROM d CROSS JOIN tot t
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the purchase
    and view value distributions: D = max |ECDF_A − ECDF_B| computed
    on the INTEGER lattice — the max runs over |cumA·n_B − cumB·n_A|
    (cross-multiplied exact counts, no float ECDF anywhere) and only
    the final two divisions are doubles — against the α=0.05 Smirnov
    critical value 1.36·√((n_A+n_B)/(n_A·n_B)).  The two cumulative
    counts ride ONE :func:`ranking.global_cumsum` two-pass (encoded
    as cntA·10¹⁰+cntB in a single prefix sum — decoded by div/mod),
    so nothing single-tasks: one grouped histogram, one
    range-partitioned prefix, one rollup."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    big = 10_000_000_000
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    base = e.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("a"),
    )
    hist = base.groupBy("cents").agg(
        F.sum("a").cast("bigint").alias("ca"),
        (F.count(F.lit(1)) - F.sum("a")).cast("bigint").alias("cb"),
    )
    comb = hist.select(
        "cents", (F.col("ca") * big + F.col("cb")).alias("c")
    )
    cum, total = global_cumsum(comb, [F.col("cents")], "c")
    na, nb = int(total) // big, int(total) % big
    dn_row = cum.select(
        F.expr(f"CAST(cum AS BIGINT) div {big}").alias("cuma"),
        F.expr(f"CAST(cum AS BIGINT) % {big}").alias("cumb"),
    ).agg(
        F.max(
            F.abs(
                F.col("cuma") * F.lit(nb) - F.col("cumb") * F.lit(na)
            )
        )
        .cast("bigint")
        .alias("dn")
    )
    nad, nbd = float(na), float(nb)
    ks_d = F.col("dn").cast("double") / (F.lit(nad) * F.lit(nbd))
    crit = F.lit(1.36) * F.sqrt(
        F.lit(float(na + nb)) / (F.lit(nad) * F.lit(nbd))
    )
    return dn_row.select(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.round(ks_d, 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit"),
        (ks_d > crit).alias("significant"),
    )


@query(
    "dedup_prefix_filter_join",
    oracle="""
    WITH t AS MATERIALIZED (
        SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
                   '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    ), sh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tok
        FROM (SELECT doc_id, w FROM t WHERE len(w) >= 3),
             LATERAL (SELECT unnest(generate_series(1, len(w) - 2))
                      AS i)
    ), freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY tok
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM sh GROUP BY doc_id
    ), ordered AS (
        SELECT s.doc_id, s.tok,
               ROW_NUMBER() OVER (PARTITION BY s.doc_id
                   ORDER BY f.df, s.tok) AS pos
        FROM sh s JOIN freq f ON f.tok = s.tok
    ), pref AS (
        SELECT o.doc_id, o.tok
        FROM ordered o JOIN sz ON sz.doc_id = o.doc_id
        WHERE o.pos <= sz.sz - (3 * sz.sz + 4) // 5 + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pref a JOIN pref b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
    ), inter AS (
        SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh wa ON wa.doc_id = c.da
        JOIN sh wb ON wb.doc_id = c.db AND wb.tok = wa.tok
        GROUP BY c.da, c.db
    )
    SELECT i.da AS id_a, i.db AS id_b, sa.sz AS size_a,
           sb.sz AS size_b, i.i AS intersection,
           round(CAST(i.i AS DOUBLE)
                 / CAST(sa.sz + sb.sz - i.i AS DOUBLE), 6) AS jaccard
    FROM inter i JOIN sz sa ON sa.doc_id = i.da
    JOIN sz sb ON sb.doc_id = i.db
    WHERE 5 * i.i >= 3 * (sa.sz + sb.sz - i.i)
    ORDER BY id_a, id_b
    """,
)
def dedup_prefix_filter_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT near-dup pairs at Jaccard ≥ 0.6 over 3-word-shingle sets
    by prefix filtering (``dedup.prefix_filter_pairs`` — AllPairs,
    Bayardo et al. '07): the deterministic complement to the MinHash
    family — 100% recall at the threshold, no banding probability,
    still never all-pairs (candidates must share a token in the
    rarity-ordered prefix, so candidate volume tracks true near-dup
    density).  The threshold decision is integer cross-multiplication
    — floats never decide membership."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
        prefix_filter_pairs,
        word_shingles,
    )

    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", norm_words(F.col("text")).alias("_w"))
    sh = words.select(
        "doc_id",
        F.explode(word_shingles(F.col("_w"), 3)).alias("tok"),
    )
    return prefix_filter_pairs(
        sh, "doc_id", "tok", t_num=3, t_den=5
    ).orderBy("id_a", "id_b")


@query(
    "classifier_woe_iv",
    oracle=f"""
    WITH {_clf_score_cte()}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), b AS (
        SELECT ((sv - mn) * 10) // (mx - mn + 1) AS bin,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                   AS BIGINT) AS neg
        FROM s CROSS JOIN mm GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS tp,
               CAST(SUM(neg) AS BIGINT) AS tn
        FROM b
    ), woe AS (
        SELECT b.bin, b.pos, b.neg,
               round(ln(CAST((2 * b.pos + 1)
                       * CAST(2 * t.tn + 10 AS HUGEINT) AS DOUBLE)
                     / CAST((2 * b.neg + 1)
                       * CAST(2 * t.tp + 10 AS HUGEINT) AS DOUBLE)),
                     6) AS woe,
               CAST(round((CAST(2 * b.pos + 1 AS DOUBLE)
                           / (2 * t.tp + 10)
                         - CAST(2 * b.neg + 1 AS DOUBLE)
                           / (2 * t.tn + 10))
                   * ln(CAST((2 * b.pos + 1)
                       * CAST(2 * t.tn + 10 AS HUGEINT) AS DOUBLE)
                     / CAST((2 * b.neg + 1)
                       * CAST(2 * t.tp + 10 AS HUGEINT) AS DOUBLE))
                   * 1e6, 0) AS BIGINT) AS iv6
        FROM b CROSS JOIN tot t
    ), ivt AS (
        SELECT CAST(SUM(iv6) AS BIGINT) AS ivs FROM woe
    )
    SELECT w.bin, w.pos, w.neg, w.woe,
           round(CAST(w.iv6 AS DOUBLE) / 1e6, 6) AS iv_term,
           round(CAST(i.ivs AS DOUBLE) / 1e6, 6) AS iv_total
    FROM woe w CROSS JOIN ivt i ORDER BY w.bin
    """,
)
def classifier_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profile of the hashed
    linear classifier score against the English label — the
    credit-scoring feature-strength standard: per score bin,
    WOE = ln(smoothed pos share / smoothed neg share) and the IV
    contribution (share difference × WOE), with IV_total grading the
    score's separating power.  Smoothing is the exact +½ Laplace form
    kept integral by doubling (2·c+1 / 2·T+K), each bin takes ONE ln
    in a fixed term order, and IV contributions land on the 1e-6
    lattice before the cross-bin sum (coarsened from 1e-9 in r10: the
    driver's libm drift exceeds what a fine lattice absorbs — 1e-6 is
    the fleet-proven margin).  One score rollup + one bin rollup at
    any scale."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    scored = scored.localCheckpoint(eager=False)
    mm = scored.agg(F.min("sv").alias("mn"), F.max("sv").alias("mx"))
    b = (
        scored.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr("((sv - mn) * 10) div (mx - mn + 1)").alias("bin")
        )
        .agg(
            F.sum("y").cast("bigint").alias("pos"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
        )
    )
    tot = b.agg(
        F.sum("pos").cast("bigint").alias("tp"),
        F.sum("neg").cast("bigint").alias("tn"),
    )
    dec = "decimal(38,0)"
    g = b.crossJoin(F.broadcast(tot))
    num = (2 * F.col("pos") + 1).cast(dec) * (
        2 * F.col("tn") + 10
    ).cast(dec)
    den = (2 * F.col("neg") + 1).cast(dec) * (
        2 * F.col("tp") + 10
    ).cast(dec)
    woe_raw = F.log(num.cast("double") / den.cast("double"))
    share_diff = (2 * F.col("pos") + 1).cast("double") / (
        2 * F.col("tp") + 10
    ) - (2 * F.col("neg") + 1).cast("double") / (
        2 * F.col("tn") + 10
    )
    iv6 = F.round(share_diff * woe_raw * F.lit(1e6), 0).cast("bigint")
    woe = g.select(
        "bin",
        "pos",
        "neg",
        F.round(woe_raw, 6).alias("woe"),
        iv6.alias("iv6"),
    )
    ivt = woe.agg(F.sum("iv6").cast("bigint").alias("ivs"))
    return (
        woe.crossJoin(F.broadcast(ivt))
        .select(
            "bin",
            "pos",
            "neg",
            "woe",
            F.round(F.col("iv6").cast("double") / 1e6, 6).alias(
                "iv_term"
            ),
            F.round(F.col("ivs").cast("double") / 1e6, 6).alias(
                "iv_total"
            ),
        )
        .orderBy("bin")
    )


@query(
    "classifier_cumulative_gains",
    oracle=f"""
    WITH {_clf_score_cte()}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), b AS (
        SELECT ((sv - mn) * 10) // (mx - mn + 1) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS pos
        FROM s CROSS JOIN mm GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
               CAST(SUM(pos) AS BIGINT) AS tot_p
        FROM b
    ), c AS (
        SELECT bin,
               CAST(SUM(n) OVER (ORDER BY bin DESC ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_n,
               CAST(SUM(pos) OVER (ORDER BY bin DESC ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_pos
        FROM b
    )
    SELECT c.bin, c.cum_n, c.cum_pos,
           round(CAST(c.cum_pos AS DOUBLE) / t.tot_p, 6) AS gains,
           round(CAST(c.cum_pos * t.tot_n AS DOUBLE)
                 / CAST(c.cum_n * t.tot_p AS DOUBLE), 6) AS lift
    FROM c CROSS JOIN tot t ORDER BY c.bin DESC
    """,
)
def classifier_cumulative_gains(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative gains and lift of the hashed linear classifier,
    top-score-bin down — "reading the top k% of the ranking captures
    what share of the positives, at what multiple of random" — the
    targeting curve next to AUC/PR-AUC/calibration/WOE in the
    registry's classifier-eval family.  Cumulation runs over the
    10-row POST-AGGREGATION bin frame (documented exception); gains
    and lift are single divisions of exact integer products."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    scored = scored.localCheckpoint(eager=False)
    mm = scored.agg(F.min("sv").alias("mn"), F.max("sv").alias("mx"))
    b = (
        scored.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr("((sv - mn) * 10) div (mx - mn + 1)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum("pos").cast("bigint").alias("tot_p"),
    )
    wdesc = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = b.select(
        "bin",
        F.sum("n").over(wdesc).cast("bigint").alias("cum_n"),
        F.sum("pos").over(wdesc).cast("bigint").alias("cum_pos"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "cum_n",
            "cum_pos",
            F.round(
                F.col("cum_pos").cast("double") / F.col("tot_p"), 6
            ).alias("gains"),
            F.round(
                (F.col("cum_pos") * F.col("tot_n")).cast("double")
                / (F.col("cum_n") * F.col("tot_p")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("bin"))
    )


def _sortkey_oracle() -> str:
    """Two zone-map scan-fraction profiles (ingest-order buckets vs
    ship-month clustering) joined per predicate — the SQL replay of
    running ``plans.metrics.zonemap_pruning`` under both layouts."""
    m_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{lo}' "
        f"AND l_shipdate < TIMESTAMP '{hi}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS m{i}"
        for i, (_, lo, hi) in enumerate(_ZONEMAP_PREDS)
    )
    values = ",\n        ".join(
        f"({i}, '{lab}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
        for i, (lab, lo, hi) in enumerate(_ZONEMAP_PREDS)
    )
    m_case = " ".join(
        f"WHEN {i} THEN m{i}" for i in range(len(_ZONEMAP_PREDS))
    )

    def layer(tag: str, gexpr: str) -> str:
        return f""", z{tag} AS (
        SELECT {gexpr} AS g,
               MIN(l_shipdate) AS zmin, MAX(l_shipdate) AS zmax,
               CAST(COUNT(*) AS BIGINT) AS n,
               {m_cols}
        FROM lineitem GROUP BY 1
    ), s{tag} AS (
        SELECT p.pred_label,
               round(CAST(SUM(CASE WHEN NOT (z.zmax < p.lo
                       OR z.zmin >= p.hi) THEN z.n ELSE 0 END)
                   AS DOUBLE) / SUM(z.n), 6) AS scan_fraction,
               round(CAST(SUM(CASE p.pred_id {m_case} ELSE 0 END)
                   AS DOUBLE) / SUM(z.n), 6) AS match_fraction
        FROM z{tag} z CROSS JOIN preds p
        GROUP BY p.pred_label, p.pred_id
    )"""

    return (
        f"""
    WITH preds(pred_id, pred_label, lo, hi) AS (
        VALUES {values}
    )"""
        + layer("a", "l_orderkey // 4096")
        + layer("b", "date_trunc('month', l_shipdate)")
        + """
    SELECT a.pred_label,
           a.scan_fraction AS scan_ingest,
           b.scan_fraction AS scan_shipmonth,
           a.match_fraction,
           CASE WHEN b.scan_fraction < a.scan_fraction
                THEN 'cluster_by_shipdate' ELSE 'keep_ingest_order'
           END AS recommended
    FROM sa a JOIN sb b ON b.pred_label = a.pred_label
    ORDER BY a.pred_label
    """
    )


@query("lineitem_sortkey_recommendation", oracle=_sortkey_oracle())
def lineitem_sortkey_recommendation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sort-key recommendation by MEASUREMENT: run the zone-map
    pruning audit (``plans.metrics.zonemap_pruning``) under BOTH
    candidate layouts — the current ingest order (orderkey buckets)
    and ship-month clustering — and recommend per predicate whichever
    scans less.  This is how a lakehouse decides Z-ORDER/cluster keys
    at 100 TB: not by heuristics but by replaying the predicate set
    against simulated footers; two grouped passes + a broadcast grid
    each, and the verdict is a comparison of exact fractions."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        zonemap_pruning,
    )

    li = _t(spark, sf_dir, "lineitem")
    za = zonemap_pruning(
        li, F.expr("l_orderkey DIV 4096"), "l_shipdate", _ZONEMAP_PREDS
    ).select(
        "pred_label",
        F.col("scan_fraction").alias("scan_ingest"),
        "match_fraction",
    )
    zb = zonemap_pruning(
        li,
        F.date_trunc("month", F.col("l_shipdate")),
        "l_shipdate",
        _ZONEMAP_PREDS,
    ).select(
        "pred_label",
        F.col("scan_fraction").alias("scan_shipmonth"),
    )
    return (
        za.join(zb, "pred_label")
        .select(
            "pred_label",
            "scan_ingest",
            "scan_shipmonth",
            "match_fraction",
            F.when(
                F.col("scan_shipmonth") < F.col("scan_ingest"),
                F.lit("cluster_by_shipdate"),
            )
            .otherwise(F.lit("keep_ingest_order"))
            .alias("recommended"),
        )
        .orderBy("pred_label")
    )


@query(
    "events_holt_winters",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type,
               list_transform(list(n ORDER BY day),
                              x -> CAST(x AS DOUBLE)) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY event_type HAVING COUNT(*) >= 14
    ), init AS (
        SELECT event_type, xs, n_days,
               (xs[1] + xs[2] + xs[3] + xs[4] + xs[5] + xs[6] + xs[7])
                   / 7 AS l0,
               ((xs[8] + xs[9] + xs[10] + xs[11] + xs[12] + xs[13]
                 + xs[14]) / 7
                - (xs[1] + xs[2] + xs[3] + xs[4] + xs[5] + xs[6]
                   + xs[7]) / 7) / 7 AS b0
        FROM s
    ), fold AS (
        -- accumulator DOUBLE[10] = [level, trend, pos, s1..s7]; fold
        -- elements wrapped to the same type (obs in slot 1)
        SELECT event_type, n_days,
               list_reduce(
                   list_prepend(
                       [l0, b0, CAST(7 AS DOUBLE),
                        xs[1] - l0, xs[2] - l0, xs[3] - l0,
                        xs[4] - l0, xs[5] - l0, xs[6] - l0,
                        xs[7] - l0],
                       list_transform(xs[8:], x ->
                           [x, CAST(0.0 AS DOUBLE),
                            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])
                   ),
                   (acc, x) -> list_concat(
                       [
                         0.3 * (x[1]
                             - acc[CAST(acc[3] AS INT) % 7 + 4])
                           + 0.7 * (acc[1] + acc[2]),
                         0.1 * ((0.3 * (x[1]
                             - acc[CAST(acc[3] AS INT) % 7 + 4])
                           + 0.7 * (acc[1] + acc[2])) - acc[1])
                           + 0.9 * acc[2],
                         acc[3] + 1
                       ],
                       list_transform(range(1, 8), j ->
                           CASE WHEN j = CAST(acc[3] AS INT) % 7 + 1
                                THEN 0.2 * (x[1]
                                    - (0.3 * (x[1]
                                        - acc[CAST(acc[3] AS INT)
                                              % 7 + 4])
                                      + 0.7 * (acc[1] + acc[2])))
                                  + 0.8 * acc[j + 3]
                                ELSE acc[j + 3] END)
                   )
               ) AS st
        FROM init
    )
    SELECT event_type, n_days,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[(CAST(st[3] AS INT) % 7) + 4], 6) AS season_next,
           round(st[1] + 1 * st[2]
                 + st[(CAST(st[3] AS INT) % 7) + 4], 6)
               AS forecast_1d,
           round(st[1] + 7 * st[2]
                 + st[((CAST(st[3] AS INT) + 6) % 7) + 4], 6)
               AS forecast_7d,
           round(list_max(st[4:]) - list_min(st[4:]), 6)
               AS season_amplitude
    FROM fold ORDER BY event_type
    """,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing of daily
    event volume per type — level + trend + weekly (m=7) season
    (α=0.3, β=0.1, γ=0.2), classic first-two-weeks initialization.
    The state is a 10-slot double array [level, trend, pos, s₁..s₇]
    folded over the ordered day series with IDENTICAL expression
    trees on both engines — the season slot update is a per-step
    7-element array rebuild, the position counter picks the slot, and
    both engines execute the same float sequence, so an inherently
    iterative seasonal model stays hash-checkable.  Forecasts re-add
    the right season slot at each horizon.  The fold touches |days|
    values per type — trivial at any event volume; the 100 TB cost is
    the daily rollup."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = (
        d.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("day"), F.col("n")))
            ).alias("series"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .filter(F.col("n_days") >= 14)
    )
    xs = F.transform(F.col("series"), lambda r: r["n"].cast("double"))
    s = s.select("event_type", "n_days", xs.alias("xs"))

    def el(arr, i):
        return F.element_at(arr, i)

    # keep the textual addition order identical to the oracle:
    # ((((((x1+x2)+x3)+x4)+x5)+x6)+x7)
    week1 = el(F.col("xs"), 1)
    for i in range(2, 8):
        week1 = week1 + el(F.col("xs"), i)
    week2 = el(F.col("xs"), 8)
    for i in range(9, 15):
        week2 = week2 + el(F.col("xs"), i)
    l0 = week1 / 7
    b0 = (week2 / 7 - week1 / 7) / 7
    init_arr = F.concat(
        F.array(l0, b0, F.lit(7.0)),
        F.transform(
            F.sequence(F.lit(1), F.lit(7)),
            lambda j: F.element_at(F.col("xs"), j.cast("int")) - l0,
        ),
    )
    rest = F.slice(F.col("xs"), 8, F.size(F.col("xs")) - 7)

    def hw_step(acc, x):
        pos = el(acc, 3)
        j0 = F.pmod(pos.cast("int"), 7) + F.lit(1)
        s_cur = F.element_at(acc, j0 + F.lit(3))
        lnew = F.lit(0.3) * (x - s_cur) + F.lit(0.7) * (
            el(acc, 1) + el(acc, 2)
        )
        bnew = F.lit(0.1) * (lnew - el(acc, 1)) + F.lit(0.9) * el(
            acc, 2
        )
        head = F.array(lnew, bnew, pos + F.lit(1.0))
        season = F.transform(
            F.sequence(F.lit(1), F.lit(7)),
            lambda j: F.when(
                j == j0,
                F.lit(0.2) * (x - lnew)
                + F.lit(0.8) * F.element_at(acc, j + F.lit(3)),
            ).otherwise(F.element_at(acc, j + F.lit(3))),
        )
        return F.concat(head, season)

    st = F.aggregate(rest, init_arr, hw_step)
    out = s.select("event_type", "n_days", st.alias("st"))
    stc = F.col("st")
    idx1 = F.pmod(el(stc, 3).cast("int"), 7) + F.lit(4)
    idx7 = F.pmod(el(stc, 3).cast("int") + F.lit(6), 7) + F.lit(4)
    return out.select(
        "event_type",
        "n_days",
        F.round(el(stc, 1), 6).alias("level"),
        F.round(el(stc, 2), 6).alias("trend"),
        F.round(F.element_at(stc, idx1), 6).alias("season_next"),
        F.round(
            el(stc, 1) + F.lit(1) * el(stc, 2)
            + F.element_at(stc, idx1),
            6,
        ).alias("forecast_1d"),
        F.round(
            el(stc, 1) + F.lit(7) * el(stc, 2)
            + F.element_at(stc, idx7),
            6,
        ).alias("forecast_7d"),
        F.round(
            F.array_max(F.slice(stc, 4, 7))
            - F.array_min(F.slice(stc, 4, 7)),
            6,
        ).alias("season_amplitude"),
    ).orderBy("event_type")


@query(
    "lineitem_partial_correlation",
    oracle="""
    WITH base AS (
        SELECT CAST(round(l_quantity, 0) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y,
               CAST(round(l_discount * 100, 0) AS BIGINT) AS z
        FROM lineitem
    ), m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(z AS HUGEINT)) AS sz,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(z AS HUGEINT) * z) AS szz,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * z) AS sxz,
               SUM(CAST(y AS HUGEINT) * z) AS syz
        FROM base
    ), r AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS rxy,
               CAST(n * sxz - sx * sz AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * szz - sz * sz AS DOUBLE))
                   AS rxz,
               CAST(n * syz - sy * sz AS DOUBLE)
                   / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                          * CAST(n * szz - sz * sz AS DOUBLE))
                   AS ryz
        FROM m
    )
    SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
               AS r_xy_given_z
    FROM r
    """,
)
def lineitem_partial_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partial correlation of quantity and extended price CONTROLLING
    for discount — r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) —
    the confounder-removal statistic the correlation matrix alone
    can't answer.  All three Pearson terms come from one pass of exact
    integer moments on the lattice (decimal/HUGEINT sums), each r is a
    single division of exact casts in a fixed order, and the partial
    formula is four more shared float ops.  One scan, one rollup, one
    row."""
    dec = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("y"),
        F.round(F.col("l_discount") * 100, 0)
        .cast("bigint")
        .alias("z"),
    )
    x, y, z = F.col("x").cast(dec), F.col("y").cast(dec), F.col(
        "z"
    ).cast(dec)
    m = base.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z).alias("sz"),
        F.sum(x * F.col("x")).alias("sxx"),
        F.sum(y * F.col("y")).alias("syy"),
        F.sum(z * F.col("z")).alias("szz"),
        F.sum(x * F.col("y")).alias("sxy"),
        F.sum(x * F.col("z")).alias("sxz"),
        F.sum(y * F.col("z")).alias("syz"),
    )
    n, sx, sy, sz = (
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sz"),
    )
    sxx, syy, szz = F.col("sxx"), F.col("syy"), F.col("szz")
    sxy, sxz, syz = F.col("sxy"), F.col("sxz"), F.col("syz")
    rxy = (n * sxy - sx * sy).cast("double") / F.sqrt(
        (n * sxx - sx * sx).cast("double")
        * (n * syy - sy * sy).cast("double")
    )
    rxz = (n * sxz - sx * sz).cast("double") / F.sqrt(
        (n * sxx - sx * sx).cast("double")
        * (n * szz - sz * sz).cast("double")
    )
    ryz = (n * syz - sy * sz).cast("double") / F.sqrt(
        (n * syy - sy * sy).cast("double")
        * (n * szz - sz * sz).cast("double")
    )
    r = m.select(
        n.cast("bigint").alias("n"),
        rxy.alias("rxy"),
        rxz.alias("rxz"),
        ryz.alias("ryz"),
    )
    return r.select(
        "n",
        F.round(F.col("rxy"), 6).alias("r_xy"),
        F.round(F.col("rxz"), 6).alias("r_xz"),
        F.round(F.col("ryz"), 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (F.lit(1.0) - F.col("rxz") * F.col("rxz"))
                * (F.lit(1.0) - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("r_xy_given_z"),
    )


@query(
    "events_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                   ELSE 0 END) AS BIGINT) AS clicks,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                   ELSE 0 END) AS BIGINT) AS errors,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                   ELSE 0 END) AS BIGINT) AS purchases,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1
                   ELSE 0 END) AS BIGINT) AS signups,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                   ELSE 0 END) AS BIGINT) AS views
        FROM events GROUP BY 1
    )
    SELECT day, metric, n FROM (
        UNPIVOT wide
        ON clicks, errors, purchases, signups, views
        INTO NAME metric VALUE n
    ) ORDER BY day, metric
    """,
)
def events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → UNPIVOT round trip: the wide daily metrics matrix (one
    conditional-sum column per event type) melted back to long form
    with Spark's ``stack`` (its UNPIVOT) against DuckDB's native
    UNPIVOT — the wide↔long reshaping pair every metrics store needs,
    value-checked cell by cell.  One grouped pass builds the matrix;
    the melt is a map-side expression (no shuffle, no explode join)."""
    e = _t(spark, sf_dir, "events")
    wide = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(c)
            for t, c in [
                ("click", "clicks"),
                ("error", "errors"),
                ("purchase", "purchases"),
                ("signup", "signups"),
                ("view", "views"),
            ]
        ]
    )
    long = wide.selectExpr(
        "day",
        "stack(5, 'clicks', clicks, 'errors', errors, "
        "'purchases', purchases, 'signups', signups, "
        "'views', views) AS (metric, n)",
    )
    return long.orderBy("day", "metric")


def _ql_oracle() -> str:
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        ql_dirichlet_sql,
    )

    return f"""
    WITH {ql_dirichlet_sql(_BM25_TERMS, mu=300.0)}
    SELECT doc_id, dl, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id)
               AS INT) AS rank
    FROM ql QUALIFY rank <= 10 ORDER BY rank
    """


@query("text_ql_dirichlet_topk", oracle=_ql_oracle())
def text_ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Dirichlet-smoothed query likelihood
    (``retrieval.ql_dirichlet_scores``, μ=300) for the registry's
    fixed query terms — the language-model ranker next to BM25 (the
    other classic lexical scorer; they disagree exactly where length
    normalization matters, which is why eval stacks run both).  Same
    scale shape as BM25: map-side tf, one single-row corpus-stats
    broadcast, distributed TakeOrdered top-k."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        ql_dirichlet_scores,
    )

    d = _t(spark, sf_dir, "documents")
    scored = ql_dirichlet_scores(d, _BM25_TERMS, mu=300.0)
    return (
        take_top_k(scored, [F.desc("score"), F.col("doc_id")], 10)
        .select("doc_id", "dl", "score", "rank")
        .orderBy("rank")
    )


@query(
    "part_price_index",
    oracle="""
    WITH cell AS (
        SELECT l_partkey AS part, YEAR(l_shipdate) AS yr,
               CAST(round(CAST(SUM(CAST(round(l_extendedprice * 100, 0)
                       AS BIGINT)) AS DOUBLE)
                   / CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT))
                       AS DOUBLE), 0) AS BIGINT) AS unit_cents,
               CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT))
                   AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), base AS (
        SELECT part, unit_cents AS p0, qty AS q0
        FROM cell WHERE yr = 1995
    ), j AS (
        SELECT c.yr,
               CAST(SUM(CAST(c.unit_cents AS HUGEINT) * b.q0)
                   AS BIGINT) AS lasp_num,
               CAST(SUM(CAST(b.p0 AS HUGEINT) * b.q0)
                   AS BIGINT) AS lasp_den,
               CAST(SUM(CAST(c.unit_cents AS HUGEINT) * c.qty)
                   AS BIGINT) AS paas_num,
               CAST(SUM(CAST(b.p0 AS HUGEINT) * c.qty)
                   AS BIGINT) AS paas_den,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM cell c JOIN base b ON b.part = c.part
        GROUP BY c.yr
    )
    SELECT yr, n_parts,
           round(CAST(lasp_num AS DOUBLE) / CAST(lasp_den AS DOUBLE),
                 6) AS laspeyres,
           round(CAST(paas_num AS DOUBLE) / CAST(paas_den AS DOUBLE),
                 6) AS paasche,
           round(sqrt((CAST(lasp_num AS DOUBLE)
                       / CAST(lasp_den AS DOUBLE))
                    * (CAST(paas_num AS DOUBLE)
                       / CAST(paas_den AS DOUBLE))), 6) AS fisher
    FROM j ORDER BY yr
    """,
)
def part_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indices per ship year
    against the 1995 base basket — the index-number family (the CPI
    construction): base-quantity-weighted vs current-quantity-weighted
    unit-price ratios over the parts traded in both periods.  Per-cell
    unit prices land on the integer-cents lattice BEFORE the basket
    sums (scaled per-cell rounding), the four basket sums are exact
    HUGEINT/decimal products, and each index is one final division.
    Shape: one grouped pass to |parts × years| cells, one keyed join
    against the base-year frame, one rollup."""
    dec = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    cell = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").alias("yr"),
    ).agg(
        F.round(
            F.sum(cents.cast(dec)).cast("double")
            / F.sum(qty.cast(dec)).cast("double"),
            0,
        )
        .cast("bigint")
        .alias("unit_cents"),
        F.sum(qty.cast(dec)).cast("bigint").alias("qty"),
    )
    cell = cell.localCheckpoint(eager=False)
    base = cell.filter(F.col("yr") == 1995).select(
        "part",
        F.col("unit_cents").alias("p0"),
        F.col("qty").alias("q0"),
    )
    j = (
        cell.join(base, "part")
        .groupBy("yr")
        .agg(
            F.sum(F.col("unit_cents").cast(dec) * F.col("q0"))
            .cast("bigint")
            .alias("lasp_num"),
            F.sum(F.col("p0").cast(dec) * F.col("q0"))
            .cast("bigint")
            .alias("lasp_den"),
            F.sum(F.col("unit_cents").cast(dec) * F.col("qty"))
            .cast("bigint")
            .alias("paas_num"),
            F.sum(F.col("p0").cast(dec) * F.col("qty"))
            .cast("bigint")
            .alias("paas_den"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
    )
    lasp = F.col("lasp_num").cast("double") / F.col("lasp_den").cast(
        "double"
    )
    paas = F.col("paas_num").cast("double") / F.col("paas_den").cast(
        "double"
    )
    return j.select(
        "yr",
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("yr")


@query(
    "events_entropy_rate",
    oracle="""
    WITH pairs AS (
        SELECT event_type AS a,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS b
        FROM events
    ), cell AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE b IS NOT NULL GROUP BY a, b
    ), marg AS (
        SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM cell GROUP BY a
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ns
        FROM cell
    ), h AS (
        SELECT CAST(SUM(CAST(round(
                   CAST(c.n AS DOUBLE) / t.nt
                   * ln(CAST(c.n AS DOUBLE) / m.na) * 1e6, 0)
                   AS BIGINT)) AS BIGINT) AS h6
        FROM cell c JOIN marg m ON m.a = c.a CROSS JOIN tot t
    )
    SELECT t.nt AS n_transitions, t.ns AS n_states,
           round(-CAST(h.h6 AS DOUBLE) / 1e6, 6) AS entropy_rate,
           round(ln(CAST(t.ns AS DOUBLE)), 6) AS max_entropy,
           round((-CAST(h.h6 AS DOUBLE) / 1e6)
                 / ln(CAST(t.ns AS DOUBLE)), 6) AS efficiency
    FROM h CROSS JOIN tot t
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user event-type Markov chain — how
    predictable the NEXT action is given the current one:
    H = −Σ_ij (n_ij/N)·ln(n_ij/n_i) over the empirical transition
    counts, with the efficiency ratio against the ln|S| ceiling.  The
    information-theoretic readout on top of the registry's Markov
    transition matrix: one keyed LEAD window, one |S|²-cell rollup,
    per-cell 1e-6 scaled rounding before the exact cross-cell sum
    (coarsened from 1e-9 in r10 — fleet libm-drift margin)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    cell = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cell = cell.localCheckpoint(eager=False)
    marg = cell.groupBy("a").agg(
        F.sum("n").cast("bigint").alias("na")
    )
    tot = cell.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.countDistinct("a").cast("bigint").alias("ns"),
    )
    h6 = F.round(
        F.col("n").cast("double")
        / F.col("nt")
        * F.log(F.col("n").cast("double") / F.col("na"))
        * F.lit(1e6),
        0,
    ).cast("bigint")
    h = (
        cell.join(marg, "a")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(h6).cast("bigint").alias("h6"))
    )
    ent = -F.col("h6").cast("double") / F.lit(1e6)
    maxent = F.log(F.col("ns").cast("double"))
    return h.crossJoin(F.broadcast(tot)).select(
        F.col("nt").alias("n_transitions"),
        F.col("ns").alias("n_states"),
        F.round(ent, 6).alias("entropy_rate"),
        F.round(maxent, 6).alias("max_entropy"),
        F.round(ent / maxent, 6).alias("efficiency"),
    )


@query(
    "user_absence_risk",
    oracle="""
    WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), g AS (
        SELECT user_id, day,
               day - LAG(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS gap
        FROM du
    ), gaps AS (
        SELECT user_id, CAST(gap AS BIGINT) AS gap, day
        FROM g WHERE gap IS NOT NULL
    ), ranked AS (
        SELECT user_id, gap,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY gap, day) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM gaps
    ), med AS (
        SELECT user_id, gap AS med_gap FROM ranked
        WHERE rn = (cnt + 1) // 2
    ), mx AS (
        SELECT user_id, CAST(MAX(gap) AS BIGINT) AS max_gap
        FROM gaps GROUP BY user_id
    ), last AS (
        SELECT user_id, MAX(day) AS last_day FROM du GROUP BY user_id
    ), horizon AS (
        SELECT MAX(day) AS h FROM du
    ), scored AS (
        SELECT l.user_id,
               CAST(hz.h - l.last_day AS BIGINT) AS cur_gap,
               m.med_gap, x.max_gap
        FROM last l
        LEFT JOIN med m ON m.user_id = l.user_id
        LEFT JOIN mx x ON x.user_id = l.user_id
        CROSS JOIN horizon hz
    ), lab AS (
        SELECT CASE WHEN max_gap IS NULL THEN 'new'
                    WHEN cur_gap > max_gap THEN 'dormant'
                    WHEN cur_gap > med_gap THEN 'cooling'
                    ELSE 'active' END AS status,
               cur_gap
        FROM scored
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_users,
           round(AVG(CAST(cur_gap AS DOUBLE)), 6) AS avg_cur_gap,
           CAST(MAX(cur_gap) AS BIGINT) AS max_cur_gap
    FROM lab GROUP BY status ORDER BY status
    """,
)
def user_absence_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk staging from each user's own activity rhythm: the
    current silence (days since last activity at the data horizon)
    compared against that user's historical inter-activity gaps —
    beyond their max gap = dormant, beyond their median = cooling,
    else active (single-day users = new).  The personalized-baseline
    absence detector: every gap statistic is a per-user keyed window
    or rollup on exact day integers; the per-user median is rank
    selection (never interpolation); the horizon broadcasts."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    du = du.localCheckpoint(eager=False)
    wday = Window.partitionBy("user_id").orderBy("day")
    g = du.select(
        "user_id",
        "day",
        F.datediff(F.col("day"), F.lag("day").over(wday)).alias(
            "gap"
        ),
    )
    gaps = g.filter(F.col("gap").isNotNull()).select(
        "user_id", F.col("gap").cast("bigint").alias("gap"), "day"
    )
    wrank = Window.partitionBy("user_id").orderBy("gap", "day")
    wcnt = Window.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "gap",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(cnt + 1) div 2")
    ).select("user_id", F.col("gap").alias("med_gap"))
    mx = gaps.groupBy("user_id").agg(
        F.max("gap").cast("bigint").alias("max_gap")
    )
    last = du.groupBy("user_id").agg(F.max("day").alias("last_day"))
    horizon = du.agg(F.max("day").alias("h"))
    scored = (
        last.join(med, "user_id", "left")
        .join(mx, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.col("h"), F.col("last_day"))
            .cast("bigint")
            .alias("cur_gap"),
            "med_gap",
            "max_gap",
        )
    )
    lab = scored.select(
        F.when(F.col("max_gap").isNull(), F.lit("new"))
        .when(F.col("cur_gap") > F.col("max_gap"), F.lit("dormant"))
        .when(F.col("cur_gap") > F.col("med_gap"), F.lit("cooling"))
        .otherwise(F.lit("active"))
        .alias("status"),
        "cur_gap",
    )
    return (
        lab.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg(F.col("cur_gap").cast("double")), 6).alias(
                "avg_cur_gap"
            ),
            F.max("cur_gap").cast("bigint").alias("max_cur_gap"),
        )
        .orderBy("status")
    )


@query(
    "doc_lexical_diversity",
    oracle="""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)),
                   '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), wc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY source, w
    ), per AS (
        SELECT source,
               CAST(SUM(f) AS BIGINT) AS t_tokens,
               CAST(COUNT(*) AS BIGINT) AS v_types,
               CAST(SUM(CAST(f AS HUGEINT) * (f - 1)) AS BIGINT)
                   AS rep_pairs
        FROM wc GROUP BY source
    ), sh AS (
        SELECT wc.source,
               CAST(SUM(CAST(round(CAST(wc.f AS DOUBLE) / p.t_tokens
                   * ln(CAST(wc.f AS DOUBLE) / p.t_tokens) * 1e6, 0)
                   AS BIGINT)) AS BIGINT) AS h6
        FROM wc JOIN per p ON p.source = wc.source
        GROUP BY wc.source
    )
    SELECT p.source, p.t_tokens, p.v_types,
           round(CAST(p.v_types AS DOUBLE) / p.t_tokens, 6) AS ttr,
           round(CAST(p.rep_pairs AS DOUBLE)
                 / (CAST(p.t_tokens AS DOUBLE) * (p.t_tokens - 1)),
                 6) AS simpson,
           round(-CAST(sh.h6 AS DOUBLE) / 1e6, 6) AS shannon
    FROM per p JOIN sh ON sh.source = p.source
    ORDER BY p.source
    """,
)
def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity profile — type-token ratio,
    Simpson repeat-probability (EXACT: Σf(f−1)/T(T−1) on integer
    counts), and Shannon vocabulary entropy (per-type 1e-6 scaled
    rounding before the sum; coarsened from 1e-9 in r10 — fleet
    libm-drift margin) — the corpus-health triptych that
    separates boilerplate-heavy sources from genuinely diverse text.
    One tokenize/explode + one (source, word) rollup + one per-source
    rollup; nothing holds a vocabulary in memory."""
    e = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        _lower_words,
    )

    tok = e.select(
        "source", F.explode(_lower_words(F.col("text"))).alias("w")
    )
    wc = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    wc = wc.localCheckpoint(eager=False)
    dec = "decimal(38,0)"
    per = wc.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("t_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.col("f").cast(dec) * (F.col("f") - 1))
        .cast("bigint")
        .alias("rep_pairs"),
    )
    h6 = F.round(
        F.col("f").cast("double")
        / F.col("t_tokens")
        * F.log(F.col("f").cast("double") / F.col("t_tokens"))
        * F.lit(1e6),
        0,
    ).cast("bigint")
    sh = (
        wc.join(
            F.broadcast(per.select("source", "t_tokens")), "source"
        )
        .groupBy("source")
        .agg(F.sum(h6).cast("bigint").alias("h6"))
    )
    return (
        per.join(sh, "source")
        .select(
            "source",
            "t_tokens",
            "v_types",
            F.round(
                F.col("v_types").cast("double") / F.col("t_tokens"),
                6,
            ).alias("ttr"),
            F.round(
                F.col("rep_pairs").cast("double")
                / (
                    F.col("t_tokens").cast("double")
                    * (F.col("t_tokens") - 1)
                ),
                6,
            ).alias("simpson"),
            F.round(-F.col("h6").cast("double") / F.lit(1e6), 6).alias(
                "shannon"
            ),
        )
        .orderBy("source")
    )


@query(
    "orders_two_way_anova",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS a, YEAR(o_orderdate) AS b,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
        FROM orders
    ), cell AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS s
        FROM base GROUP BY a, b
    ), ma AS (
        SELECT a, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s
        FROM cell GROUP BY a
    ), mb AS (
        SELECT b, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s
        FROM cell GROUP BY b
    ), g AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS kb
        FROM cell
    ), sst AS (
        SELECT CAST(SUM(CAST(round((CAST(y AS DOUBLE) / 100.0
                   - CAST(g.s AS DOUBLE) / g.n / 100.0)
                   * (CAST(y AS DOUBLE) / 100.0
                   - CAST(g.s AS DOUBLE) / g.n / 100.0) * 100, 0)
                   AS BIGINT)) AS BIGINT) AS t2
        FROM base CROSS JOIN g
    ), ssa AS (
        SELECT CAST(SUM(CAST(round(ma.n * (CAST(ma.s AS DOUBLE)
                   / ma.n / 100.0 - CAST(g.s AS DOUBLE) / g.n / 100.0)
                   * (CAST(ma.s AS DOUBLE) / ma.n / 100.0
                   - CAST(g.s AS DOUBLE) / g.n / 100.0) * 100, 0)
                   AS BIGINT)) AS BIGINT) AS t2
        FROM ma CROSS JOIN g
    ), ssb AS (
        SELECT CAST(SUM(CAST(round(mb.n * (CAST(mb.s AS DOUBLE)
                   / mb.n / 100.0 - CAST(g.s AS DOUBLE) / g.n / 100.0)
                   * (CAST(mb.s AS DOUBLE) / mb.n / 100.0
                   - CAST(g.s AS DOUBLE) / g.n / 100.0) * 100, 0)
                   AS BIGINT)) AS BIGINT) AS t2
        FROM mb CROSS JOIN g
    ), ssab AS (
        SELECT CAST(SUM(CAST(round(c.n
                   * (CAST(c.s AS DOUBLE) / c.n / 100.0
                      - CAST(ma.s AS DOUBLE) / ma.n / 100.0
                      - CAST(mb.s AS DOUBLE) / mb.n / 100.0
                      + CAST(g.s AS DOUBLE) / g.n / 100.0)
                   * (CAST(c.s AS DOUBLE) / c.n / 100.0
                      - CAST(ma.s AS DOUBLE) / ma.n / 100.0
                      - CAST(mb.s AS DOUBLE) / mb.n / 100.0
                      + CAST(g.s AS DOUBLE) / g.n / 100.0) * 100, 0)
                   AS BIGINT)) AS BIGINT) AS t2
        FROM cell c JOIN ma ON ma.a = c.a JOIN mb ON mb.b = c.b
        CROSS JOIN g
    )
    SELECT g.n AS n_rows, g.ka, g.kb,
           round(CAST(ssa.t2 AS DOUBLE) / 100, 2) AS ss_a,
           round(CAST(ssb.t2 AS DOUBLE) / 100, 2) AS ss_b,
           round(CAST(ssab.t2 AS DOUBLE) / 100, 2) AS ss_ab,
           round(CAST(sst.t2 - ssa.t2 - ssb.t2 - ssab.t2 AS DOUBLE)
                 / 100, 2) AS ss_within,
           round((CAST(ssa.t2 AS DOUBLE) / (g.ka - 1))
                 / (CAST(sst.t2 - ssa.t2 - ssb.t2 - ssab.t2 AS DOUBLE)
                    / (g.n - g.n_cells)), 6) AS f_a,
           round((CAST(ssb.t2 AS DOUBLE) / (g.kb - 1))
                 / (CAST(sst.t2 - ssa.t2 - ssb.t2 - ssab.t2 AS DOUBLE)
                    / (g.n - g.n_cells)), 6) AS f_b,
           round((CAST(ssab.t2 AS DOUBLE)
                    / ((g.ka - 1) * (g.kb - 1)))
                 / (CAST(sst.t2 - ssa.t2 - ssb.t2 - ssab.t2 AS DOUBLE)
                    / (g.n - g.n_cells)), 6) AS f_ab
    FROM g CROSS JOIN sst CROSS JOIN ssa CROSS JOIN ssb CROSS JOIN ssab
    """,
)
def orders_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of order value by priority × order-year: the
    SS_A / SS_B / SS_interaction / SS_within decomposition with F
    ratios — the designed-experiment workhorse missing between the
    registry's chi-square (categorical×categorical) and correlation
    (numeric×numeric) tests.  Everything derives from exact per-cell
    integer (n, Σy) moments; every squared deviation is scaled-rounded
    per cell/row BEFORE its cross-cell sum (the hash discipline), and
    SS_within falls out by subtraction from the equally-exact total.
    One scan for SS_T, one |cells| rollup for the rest."""
    e = _t(spark, sf_dir, "orders")
    base = e.select(
        F.col("o_orderpriority").alias("a"),
        F.year("o_orderdate").alias("b"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("y"),
    )
    base = base.localCheckpoint(eager=False)
    dec = "decimal(38,0)"
    cell = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(dec)).cast("bigint").alias("s"),
    )
    cell = cell.localCheckpoint(eager=False)
    ma = cell.groupBy("a").agg(
        F.sum("n").cast("bigint").alias("na"),
        F.sum("s").cast("bigint").alias("sa"),
    )
    mb = cell.groupBy("b").agg(
        F.sum("n").cast("bigint").alias("nb"),
        F.sum("s").cast("bigint").alias("sb"),
    )
    g = cell.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("s").cast("bigint").alias("gs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("a").cast("bigint").alias("ka"),
        F.countDistinct("b").cast("bigint").alias("kb"),
    )

    def mean_d(s_col, n_col):
        return F.col(s_col).cast("double") / F.col(n_col) / F.lit(
            100.0
        )

    gmean = mean_d("gs", "gn")
    dev_t = F.col("y").cast("double") / F.lit(100.0) - gmean
    sst = (
        base.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                F.round(dev_t * dev_t * F.lit(100), 0).cast("bigint")
            )
            .cast("bigint")
            .alias("t2")
        )
        .select(F.col("t2").alias("sst2"))
    )
    dev_a = mean_d("sa", "na") - gmean
    ssa = (
        ma.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                F.round(
                    F.col("na") * dev_a * dev_a * F.lit(100), 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("t2")
        )
        .select(F.col("t2").alias("ssa2"))
    )
    dev_b = mean_d("sb", "nb") - gmean
    ssb = (
        mb.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                F.round(
                    F.col("nb") * dev_b * dev_b * F.lit(100), 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("t2")
        )
        .select(F.col("t2").alias("ssb2"))
    )
    dev_ab = (
        mean_d("s", "n")
        - mean_d("sa", "na")
        - mean_d("sb", "nb")
        + gmean
    )
    ssab = (
        cell.join(ma, "a")
        .join(mb, "b")
        .crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                F.round(
                    F.col("n") * dev_ab * dev_ab * F.lit(100), 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("t2")
        )
        .select(F.col("t2").alias("ssab2"))
    )
    out = (
        g.crossJoin(F.broadcast(sst))
        .crossJoin(F.broadcast(ssa))
        .crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssab))
    )
    ssw2 = (
        F.col("sst2")
        - F.col("ssa2")
        - F.col("ssb2")
        - F.col("ssab2")
    ).cast("double")
    msw = ssw2 / (F.col("gn") - F.col("n_cells"))
    return out.select(
        F.col("gn").alias("n_rows"),
        "ka",
        "kb",
        F.round(F.col("ssa2").cast("double") / 100, 2).alias("ss_a"),
        F.round(F.col("ssb2").cast("double") / 100, 2).alias("ss_b"),
        F.round(F.col("ssab2").cast("double") / 100, 2).alias(
            "ss_ab"
        ),
        F.round(ssw2 / 100, 2).alias("ss_within"),
        F.round(
            (F.col("ssa2").cast("double") / (F.col("ka") - 1)) / msw,
            6,
        ).alias("f_a"),
        F.round(
            (F.col("ssb2").cast("double") / (F.col("kb") - 1)) / msw,
            6,
        ).alias("f_b"),
        F.round(
            (
                F.col("ssab2").cast("double")
                / ((F.col("ka") - 1) * (F.col("kb") - 1))
            )
            / msw,
            6,
        ).alias("f_ab"),
    )


@query(
    "events_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(CAST(SUM(CAST(round(value * 100, 0)
                   AS BIGINT)) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS m
        FROM events GROUP BY 1
    ), med AS (
        SELECT m AS medv FROM (
            SELECT m, ROW_NUMBER() OVER (ORDER BY m, day) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM daily
        ) WHERE rn = (cnt + 1) // 2
    ), signs AS (
        SELECT day, CASE WHEN m > (SELECT medv FROM med)
                         THEN 1 ELSE 0 END AS s
        FROM daily
    ), runs AS (
        SELECT s, LAG(s) OVER (ORDER BY day) AS prev FROM signs
    ), agg AS (
        SELECT CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                   THEN 1 ELSE 0 END) AS BIGINT) AS r,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
        FROM runs
    ), st AS (
        SELECT r, n1, n2,
               1.0 + 2.0 * n1 * n2 / (n1 + n2) AS er,
               (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
                   / (CAST((n1 + n2) AS DOUBLE) * (n1 + n2)
                      * (n1 + n2 - 1)) AS vr
        FROM agg
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           round(er, 6) AS expected_runs,
           round((r - er) / sqrt(vr), 6) AS z_score,
           ABS((r - er) / sqrt(vr)) > 1.96 AS nonrandom
    FROM st
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily mean value
    sequence around its median — do high and low days cluster (trend /
    regime) or alternate (negative autocorrelation)?  The third
    classic nonparametric test beside Mann-Whitney and Mann-Kendall in
    the registry.  The median is rank selection, the run count is one
    LAG over the |days| frame, and E[R]/Var[R] are closed forms of
    exact integer counts — only the final z divides doubles."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum(cents).cast("double") / F.count(F.lit(1)), 0)
        .cast("bigint")
        .alias("m")
    )
    daily = daily.localCheckpoint(eager=False)
    wrank = Window.orderBy("m", "day")
    wall = Window.partitionBy()
    med = (
        daily.select(
            "m",
            F.row_number().over(wrank).alias("rn"),
            F.count(F.lit(1)).over(wall).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(F.col("m").alias("medv"))
    )
    signs = daily.crossJoin(F.broadcast(med)).select(
        "day",
        (F.col("m") > F.col("medv")).cast("int").alias("s"),
    )
    wday = Window.orderBy("day")
    runs = signs.select(
        "s", F.lag("s").over(wday).alias("prev")
    )
    agg = runs.agg(
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = F.lit(1.0) + F.lit(2.0) * n1 * n2 / (n1 + n2)
    vr = (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)) / (
        (n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)
    )
    z = (r - er) / F.sqrt(vr)
    return agg.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.round(er, 6).alias("expected_runs"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("nonrandom"),
    )


@query(
    "corpus_heaps_law",
    oracle="""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)),
                   '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS t_tokens,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS v_types
        FROM tok GROUP BY source
    ), pts AS (
        SELECT CAST(round(ln(CAST(t_tokens AS DOUBLE)) * 1e6, 0)
                   AS BIGINT) AS x,
               CAST(round(ln(CAST(v_types AS DOUBLE)) * 1e6, 0)
                   AS BIGINT) AS y
        FROM per
    ), m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_sources,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1e6, 6) AS ln_k,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    """,
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K·T^β across sources — vocabulary growth
    against corpus size on the ln-ln plane, the companion to the
    registry's Zipf slope (the two laws are duals).  Each source's
    (ln T, ln V) point is micro-nat-quantized (the zipf_fit
    discipline), the OLS moments are exact HUGEINT/decimal sums, and
    β / ln K / R² are single fixed-order float expressions.  β far
    from ~0.5 flags synthetic or boilerplate text.  One tokenize +
    two rollups."""
    dec = "decimal(38,0)"
    from high_throughput_etl_pipeline_spark.operators.text import (
        _lower_words,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = d.select(
        "source", F.explode(_lower_words(F.col("text"))).alias("w")
    )
    per = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("t_tokens"),
        F.countDistinct("w").cast("bigint").alias("v_types"),
    )
    pts = per.select(
        F.round(F.log(F.col("t_tokens").cast("double")) * 1e6, 0)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("v_types").cast("double")) * 1e6, 0)
        .cast("bigint")
        .alias("y"),
    )
    x, y = F.col("x").cast(dec), F.col("y").cast(dec)
    m = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * F.col("x")).alias("sxx"),
        F.sum(x * F.col("y")).alias("sxy"),
        F.sum(y * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy).cast("double") / (
        n * sxx - sx * sx
    ).cast("double")
    return m.select(
        n.cast("bigint").alias("n_sources"),
        F.round(slope, 6).alias("beta"),
        F.round(
            (sy.cast("double") - slope * sx.cast("double"))
            / n.cast("double")
            / F.lit(1e6),
            6,
        ).alias("ln_k"),
        F.round(
            (n * sxy - sx * sy).cast("double")
            * (n * sxy - sx * sy).cast("double")
            / (
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            ),
            6,
        ).alias("r2"),
    )


@query(
    "events_peak_over_threshold",
    oracle="""
    WITH base AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS v FROM events
    ), hist AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY v
    ), cum AS (
        SELECT v, cnt,
               CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        FROM hist
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist
    ), th AS (
        SELECT 'p90' AS q_label,
               (SELECT MIN(v) FROM cum CROSS JOIN tot
                WHERE c >= (9 * n + 9) // 10) AS u
        UNION ALL
        SELECT 'p95',
               (SELECT MIN(v) FROM cum CROSS JOIN tot
                WHERE c >= (19 * n + 19) // 20)
        UNION ALL
        SELECT 'p99',
               (SELECT MIN(v) FROM cum CROSS JOIN tot
                WHERE c >= (99 * n + 99) // 100)
    ), ex AS (
        SELECT th.q_label, th.u,
               CAST(SUM(CASE WHEN h.v > th.u THEN h.cnt
                   ELSE 0 END) AS BIGINT) AS n_exceed,
               CAST(SUM(CASE WHEN h.v > th.u
                   THEN CAST(h.cnt AS HUGEINT) * (h.v - th.u)
                   ELSE 0 END) AS BIGINT) AS sum_excess
        FROM hist h CROSS JOIN th
        GROUP BY th.q_label, th.u
    )
    SELECT q_label, CAST(u AS BIGINT) AS threshold_cents, n_exceed,
           round(CAST(sum_excess AS DOUBLE) / n_exceed / 100.0, 6)
               AS mean_excess
    FROM ex ORDER BY q_label
    """,
)
def events_peak_over_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peaks-over-threshold tail profile of event value — exceedance
    counts and mean excess above the exact p90/p95/p99 thresholds: the
    extreme-value-theory entry point (a mean-excess that grows with
    the threshold diagnoses a heavy GPD tail; flat ≈ exponential).
    Thresholds come by rank selection over the value histogram's
    distributed prefix sum (``global_cumsum`` — never a global-window
    quantile); the excess moments are conditional integer sums against
    the BROADCAST 3-row threshold frame.  One histogram rollup, one
    two-pass prefix, one conditional aggregate."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )
    hist = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    hist = hist.localCheckpoint(eager=True)
    cum, total = global_cumsum(hist, [F.col("v")], "cnt")
    n = int(total)
    cum = cum.select("v", F.col("cum").cast("bigint").alias("c"))
    ths = []
    for lab, num, den in [("p90", 9, 10), ("p95", 19, 20), ("p99", 99, 100)]:
        rank = (num * n + num) // den
        u = (
            cum.filter(F.col("c") >= rank)
            .agg(F.min("v").alias("u"))
            .collect()[0]["u"]
        )
        ths.append((lab, int(u)))
    th = spark.createDataFrame(ths, "q_label STRING, u BIGINT")
    dec = "decimal(38,0)"
    ex = (
        hist.crossJoin(F.broadcast(th))
        .groupBy("q_label", "u")
        .agg(
            F.sum(
                F.when(F.col("v") > F.col("u"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_exceed"),
            F.sum(
                F.when(
                    F.col("v") > F.col("u"),
                    F.col("cnt").cast(dec) * (F.col("v") - F.col("u")),
                ).otherwise(F.lit(0).cast(dec))
            )
            .cast("bigint")
            .alias("sum_excess"),
        )
    )
    return ex.select(
        "q_label",
        F.col("u").alias("threshold_cents"),
        "n_exceed",
        F.round(
            F.col("sum_excess").cast("double")
            / F.col("n_exceed")
            / F.lit(100.0),
            6,
        ).alias("mean_excess"),
    ).orderBy("q_label")


@query(
    "events_simpson_audit",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(HOUR(ts) AS BIGINT) AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM q GROUP BY event_type
    ), p AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM q
    ), r AS (
        SELECT s.event_type, CAST(s.n AS BIGINT) AS n,
               CASE WHEN s.n * s.sxx - s.sx * s.sx > 0 THEN
                   round(CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
                         / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                         * 1.0 / 100.0, 6) END AS slope,
               CASE WHEN p.n * p.sxx - p.sx * p.sx > 0 THEN
                   round(CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                         / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
                         * 1.0 / 100.0, 6) END AS pooled_slope
        FROM s CROSS JOIN p
    )
    SELECT event_type, n, slope, pooled_slope,
           (slope > 0) <> (pooled_slope > 0) AS sign_flip
    FROM r ORDER BY event_type
    """,
)
def events_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the value-vs-hour trend fitted POOLED
    and WITHIN each event type (``plans.metrics.grouped_trend`` both
    times — exact decimal sufficient statistics), flagging strata
    whose slope sign contradicts the pooled slope — the aggregation
    fallacy detector every metrics review needs before acting on a
    pooled trend.  Two rollups over one scan shape; the pooled row
    broadcasts back over the |types| frame."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        grouped_trend,
    )

    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    base = base.localCheckpoint(eager=False)
    per = grouped_trend(
        base, "x", "y", ["event_type"], x_per_unit=1, y_per_unit=100
    ).select("event_type", "n", F.col("slope_per_xunit").alias("slope"))
    pooled = (
        grouped_trend(
            base.withColumn("_all", F.lit("ALL")),
            "x",
            "y",
            ["_all"],
            x_per_unit=1,
            y_per_unit=100,
        )
        .select(F.col("slope_per_xunit").alias("pooled_slope"))
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "event_type",
            "n",
            "slope",
            "pooled_slope",
            (
                (F.col("slope") > 0) != (F.col("pooled_slope") > 0)
            ).alias("sign_flip"),
        )
        .orderBy("event_type")
    )


@query(
    "lineitem_kendall_tau",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_quantity, 0) AS BIGINT) AS q,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS pb
        FROM lineitem
    ), cell AS (
        SELECT flag, q, pb, CAST(COUNT(*) AS HUGEINT) AS n
        FROM v GROUP BY 1, 2, 3
    ), pairs AS (
        SELECT a.flag,
               SUM(CASE WHEN b.pb > a.pb THEN a.n * b.n
                        ELSE CAST(0 AS HUGEINT) END) AS conc,
               SUM(CASE WHEN b.pb < a.pb THEN a.n * b.n
                        ELSE CAST(0 AS HUGEINT) END) AS disc
        FROM cell a JOIN cell b ON a.flag = b.flag AND b.q > a.q
        GROUP BY 1
    ), mq AS (
        SELECT flag, SUM(nq * (nq - 1)) AS tq
        FROM (SELECT flag, q, CAST(SUM(n) AS HUGEINT) AS nq
              FROM cell GROUP BY 1, 2) GROUP BY 1
    ), mp AS (
        SELECT flag, SUM(np * (np - 1)) AS tp
        FROM (SELECT flag, pb, CAST(SUM(n) AS HUGEINT) AS np
              FROM cell GROUP BY 1, 2) GROUP BY 1
    ), tot AS (
        SELECT flag, CAST(SUM(n) AS HUGEINT) AS nn FROM cell GROUP BY 1
    )
    SELECT flag, CAST(nn AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           round(CAST(2 AS DOUBLE) * CAST(conc - disc AS DOUBLE)
                 / (sqrt(CAST(nn * (nn - 1) - tq AS DOUBLE))
                    * sqrt(CAST(nn * (nn - 1) - tp AS DOUBLE))), 6)
               AS tau_b
    FROM tot JOIN pairs USING (flag)
    JOIN mq USING (flag) JOIN mp USING (flag)
    ORDER BY flag
    """,
)
def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b of quantity vs price per return flag, computed
    EXACTLY from the joint contingency grid rather than O(n²) row
    pairs: concordant/discordant pair mass is Σ n_c1·n_c2 over ordered
    CELL pairs, and tie corrections come from the two marginal
    histograms.  The grid is value-domain-bounded (|quantities| ×
    |price buckets| ≈ 5k cells per flag) regardless of row count, so
    the cell self-join costs the same at 100 TB as at sf0.01 — the
    scan collapses to the grid in one grouped count.  All pair masses
    accumulate as exact decimal(38,0)/HUGEINT (τ numerator ×2 to stay
    integral); the only float ops are the two final sqrts (IEEE
    correctly-rounded everywhere) and one divide."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity", 0).cast("bigint").alias("q"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("pb"),
    )
    cell = v.groupBy("flag", "q", "pb").agg(
        F.count(F.lit(1)).cast(dec).alias("n")
    )
    a, b = cell.alias("a"), cell.alias("b")
    zero = F.lit(0).cast(dec)
    prod = F.col("a.n") * F.col("b.n")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.flag") == F.col("b.flag"))
            & (F.col("b.q") > F.col("a.q")),
        )
        .groupBy(F.col("a.flag").alias("flag"))
        .agg(
            F.sum(
                F.when(F.col("b.pb") > F.col("a.pb"), prod).otherwise(zero)
            ).alias("conc"),
            F.sum(
                F.when(F.col("b.pb") < F.col("a.pb"), prod).otherwise(zero)
            ).alias("disc"),
        )
    )
    mq = (
        cell.groupBy("flag", "q")
        .agg(F.sum("n").alias("nq"))
        .groupBy("flag")
        .agg(F.sum(F.col("nq") * (F.col("nq") - 1)).alias("tq"))
    )
    mp = (
        cell.groupBy("flag", "pb")
        .agg(F.sum("n").alias("np"))
        .groupBy("flag")
        .agg(F.sum(F.col("np") * (F.col("np") - 1)).alias("tp"))
    )
    tot = cell.groupBy("flag").agg(F.sum("n").alias("nn"))
    n0x2 = F.col("nn") * (F.col("nn") - 1)
    den = F.sqrt((n0x2 - F.col("tq")).cast("double")) * F.sqrt(
        (n0x2 - F.col("tp")).cast("double")
    )
    return (
        tot.join(pairs, "flag")
        .join(mq, "flag")
        .join(mp, "flag")
        .select(
            "flag",
            F.col("nn").cast("bigint").alias("n"),
            F.col("conc").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            F.round(
                F.lit(2).cast("double")
                * (F.col("conc") - F.col("disc")).cast("double")
                / den,
                6,
            ).alias("tau_b"),
        )
        .orderBy("flag")
    )


@query(
    "events_welch_ttest",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ), m AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(v) AS HUGEINT) AS s,
               CAST(SUM(v * v) AS HUGEINT) AS ss
        FROM c GROUP BY 1
    ), p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
               CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
               CAST(a.n * a.ss - a.s * a.s AS DOUBLE)
                   / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)
                      * CAST(a.n AS DOUBLE)) AS vna,
               CAST(b.n * b.ss - b.s * b.s AS DOUBLE)
                   / (CAST(b.n AS DOUBLE) * CAST(b.n - 1 AS DOUBLE)
                      * CAST(b.n AS DOUBLE)) AS vnb
        FROM m a JOIN m b ON a.event_type < b.event_type
        WHERE a.n > 1 AND b.n > 1
    )
    SELECT type_a, type_b, n_a, n_b,
           round((ma - mb) / CAST(100 AS DOUBLE), 6) AS mean_diff,
           round((ma - mb) / sqrt(vna + vnb), 6) AS t_stat,
           round((vna + vnb) * (vna + vnb)
                 / (vna * vna / CAST(n_a - 1 AS DOUBLE)
                    + vnb * vnb / CAST(n_b - 1 AS DOUBLE)), 4) AS df
    FROM p WHERE vna + vnb > 0 ORDER BY type_a, type_b
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between every pair of event
    types on `value` — the A/B significance primitive that doesn't
    assume equal variances.  One grouped pass collects exact integer
    moments (cents lattice, HUGEINT/decimal38); the 5-row moment frame
    self-joins into 10 ordered pairs, and the t statistic plus
    Welch–Satterthwaite df are closed-form over those moments.  Every
    float op is IEEE-exact (+−×÷, one sqrt) with textually identical
    expression trees on both engines, so the result hash-matches.
    Degenerate groups are excluded identically on both sides (n ≤ 1
    makes the n−1 divisor zero; vna+vnb = 0 makes the t divisor zero
    — Spark and DuckDB Inf/NULL semantics diverge there, so such
    pairs are filtered, not scored).  At any corpus size the pair
    frame stays |types|² rows."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    c = e.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )
    m = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("ss"),
    )
    a, b = m.alias("a"), m.alias("b")

    def _vn(side: str):
        n, s, ss = (F.col(f"{side}.{c}") for c in ("n", "s", "ss"))
        return (n * ss - s * s).cast("double") / (
            n.cast("double") * (n - 1).cast("double") * n.cast("double")
        )

    p = a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    ).filter(
        (F.col("a.n") > 1) & (F.col("b.n") > 1)
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").cast("bigint").alias("n_a"),
        F.col("b.n").cast("bigint").alias("n_b"),
        (F.col("a.s").cast("double") / F.col("a.n").cast("double")).alias("ma"),
        (F.col("b.s").cast("double") / F.col("b.n").cast("double")).alias("mb"),
        _vn("a").alias("vna"),
        _vn("b").alias("vnb"),
    )
    vsum = F.col("vna") + F.col("vnb")
    return p.filter(vsum > 0).select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.round(
            (F.col("ma") - F.col("mb")) / F.lit(100).cast("double"), 6
        ).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(vsum), 6).alias("t_stat"),
        F.round(
            vsum * vsum
            / (
                F.col("vna") * F.col("vna")
                / (F.col("n_a") - 1).cast("double")
                + F.col("vnb") * F.col("vnb")
                / (F.col("n_b") - 1).cast("double")
            ),
            4,
        ).alias("df"),
    ).orderBy("type_a", "type_b")


@query(
    "events_leadlag_xcorr",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS di,
               CAST(COUNT(*) AS HUGEINT) AS x
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT d.event_type, d.di - l.lag AS adi, d.di, d.x, l.lag
        FROM daily d
        JOIN (SELECT unnest(range(0, 8)) AS lag) l ON TRUE
    ), j AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, b.lag,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(a.x) AS sx, SUM(b.x) AS sy, SUM(a.x * b.x) AS sxy,
               SUM(a.x * a.x) AS sxx, SUM(b.x * b.x) AS syy
        FROM daily a
        JOIN lagged b
          ON a.di = b.adi AND a.event_type < b.event_type
        GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                ELSE NULL END AS xcorr
    FROM j WHERE n >= 3
    ORDER BY type_a, type_b, lag
    """,
)
def events_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between event-type pairs: Pearson r
    of type-a's daily count against type-b's count `lag` days LATER,
    for lags 0..7 — "does a spike in views predict purchases three
    days out".  The raw table collapses to the |types × days| daily
    frame in one grouped count; the lag alignment is an integer-day
    equi-join of that tiny frame against its lag-shifted self (the
    8-row lag grid joins broadcast), and all Pearson moments
    accumulate as exact decimal38/HUGEINT.  Only the final
    divide-by-sqrt-product is float, guarded identically on both
    engines against zero-variance series.  At 100 TB the daily frame
    is still |types| × |calendar| rows."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("di"),
    ).agg(F.count(F.lit(1)).cast(dec).alias("x"))
    lags = spark.range(0, 8).select(F.col("id").cast("bigint").alias("lag"))
    lagged = (
        daily.crossJoin(F.broadcast(lags))
        .select(
            F.col("event_type").alias("type_b"),
            (F.col("di") - F.col("lag")).alias("adi"),
            F.col("x").alias("y"),
            "lag",
        )
    )
    j = (
        daily.join(
            lagged,
            (F.col("di") == F.col("adi"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(
            F.col("event_type").alias("type_a"), "type_b", "lag"
        )
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    nsxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    nsyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    return (
        j.filter(F.col("n") >= 3)
        .select(
            "type_a",
            "type_b",
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("bigint").alias("n_days"),
            F.when(
                (nsxx > 0) & (nsyy > 0),
                F.round(
                    num
                    / (
                        F.sqrt(nsxx.cast("double"))
                        * F.sqrt(nsyy.cast("double"))
                    ),
                    6,
                ),
            ).alias("xcorr"),
        )
        .orderBy("type_a", "type_b", "lag")
    )


@query(
    "events_sax_motifs",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(x * x) AS HUGEINT) AS ss
        FROM daily GROUP BY 1
    ), sym AS (
        SELECT d.event_type, d.d,
               CASE WHEN CAST(st.n * d.x - st.s AS DOUBLE)
                         < -(CAST(0.6745 AS DOUBLE)
                             * sqrt(CAST(st.n * st.ss - st.s * st.s
                                         AS DOUBLE))) THEN 'a'
                    WHEN st.n * d.x - st.s < 0 THEN 'b'
                    WHEN CAST(st.n * d.x - st.s AS DOUBLE)
                         < CAST(0.6745 AS DOUBLE)
                           * sqrt(CAST(st.n * st.ss - st.s * st.s
                                       AS DOUBLE)) THEN 'c'
                    ELSE 'd' END AS s
        FROM daily d JOIN st USING (event_type)
    ), tri AS (
        SELECT event_type,
               s || lead(s, 1) OVER w || lead(s, 2) OVER w AS motif
        FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ), cnt AS (
        SELECT event_type, motif, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tri WHERE motif IS NOT NULL GROUP BY 1, 2
    ), rk AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY cnt DESC, motif) AS rnk
        FROM cnt
    )
    SELECT event_type, motif, cnt, CAST(rnk AS INT) AS rnk
    FROM rk WHERE rnk <= 3 ORDER BY event_type, rnk
    """,
)
def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic discretization of each type's daily-count series
    (4-symbol alphabet at the quartile breakpoints of N(0,1)) plus
    top-3 trigram MOTIFS per type — the classic time-series-mining
    shape for "what weekly patterns recur".  The z-score comparison is
    lattice-exact: z = (n·x − S)/√(n·SS − S²), so symbols compare the
    integer deviation n·x − S against ±0.6745·√M where M is an exact
    integer — one IEEE sqrt and multiply per row, bit-identical on
    both engines, and the sign breakpoint is a pure integer compare.
    Motif extraction is a per-type lead window over the |days|-sized
    post-aggregation frame; counts and ranks are integers.  State is
    calendar-bounded at any data volume."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("s"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("ss"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    thr = F.lit(0.6745).cast("double") * F.sqrt(
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    )
    sym = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "d",
        F.when(dev.cast("double") < -thr, F.lit("a"))
        .when(dev < 0, F.lit("b"))
        .when(dev.cast("double") < thr, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    tri = sym.select(
        "event_type",
        F.concat(
            F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)
        ).alias("motif"),
    )
    cnt = (
        tri.filter(F.col("motif").isNotNull())
        .groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("motif")
    )
    return (
        cnt.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("event_type", "rnk")
    )


@query(
    "multimodal_frame_dedup",
    oracle="""
    WITH vid AS (
        SELECT doc_id AS media_id, text,
               LEAST(GREATEST(n_chars // 50, 1), 16) AS nf
        FROM documents
    ), frames AS (
        SELECT media_id,
               CAST(g.fi AS INT) AS frame_index,
               CAST(('0x' || substr(md5(substr(text, CAST(g.fi AS INT) * 37
                                                     + 1, 64)), 18, 15))
                    AS BIGINT) AS sig
        FROM vid JOIN (SELECT unnest(range(0, 16)) AS fi) g
          ON g.fi < vid.nf
    ), sigstat AS (
        SELECT sig, CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media
        FROM frames GROUP BY 1
    )
    SELECT f.media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN s.n_media > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_frames,
           round(CAST(SUM(CASE WHEN s.n_media > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS dup_ratio,
           SUM(CASE WHEN s.n_media > 1 THEN 1 ELSE 0 END) * 5
               >= COUNT(*) * 4 AS is_dup
    FROM frames f JOIN sigstat s USING (sig)
    GROUP BY f.media_id
    HAVING SUM(CASE WHEN s.n_media > 1 THEN 1 ELSE 0 END) > 0
    ORDER BY f.media_id
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate VIDEO detection by frame-fingerprint overlap —
    the multimodal twin of document near-dup: sample a bounded frame
    grid per media item (here the deterministic text-backed stand-in
    table, duration ∝ n_chars, ≤16 frames — the same JVM-side
    explode-over-sequence grid as operators/multimodal.py:sample_frames),
    fingerprint each frame (md5_64 of the frame's content window — the
    stand-in for a real perceptual hash), then flag media whose frames
    mostly appear in OTHER media (≥80 % shared → is_dup, the
    cross-multiplied integer threshold so no float gates membership).
    The whole plan is fingerprint-equi-join bounded: |frames| ≤
    16·|docs| rows shuffle twice (by signature, then by media), never
    pairwise — at 100 TB the candidate mass tracks true duplicate
    density exactly like the text MinHash family."""
    d = _t(spark, sf_dir, "documents")
    vid = d.select(
        F.col("doc_id").alias("media_id"),
        "text",
        F.least(
            F.greatest(
                (F.col("n_chars") / 50).cast("int"), F.lit(1)
            ),
            F.lit(16),
        ).alias("nf"),
    )
    frames = vid.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("nf") - 1)).alias("frame_index"),
        "text",
    ).select(
        "media_id",
        F.col("frame_index").cast("int").alias("frame_index"),
        F.conv(
            F.substring(
                F.md5(
                    F.expr("substring(text, frame_index * 37 + 1, 64)")
                ),
                18,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("sig"),
    )
    sigstat = frames.groupBy("sig").agg(
        F.countDistinct("media_id").cast("bigint").alias("n_media")
    )
    dup = F.sum(
        F.when(F.col("n_media") > 1, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        frames.join(sigstat, "sig")
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            dup.cast("bigint").alias("dup_frames"),
            F.round(
                dup.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_ratio"),
            (dup * 5 >= F.count(F.lit(1)) * 4).alias("is_dup"),
        )
        .filter(F.col("dup_frames") > 0)
        .orderBy("media_id")
    )


@query(
    "doc_shingle_containment",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
        FROM documents
    ), sh0 AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(words[i:i+2], ' ')
                   for i in range(1, len(words) - 1)
               ]) AS shingles
        FROM docs WHERE len(words) >= 3
    ), sh AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh0
    ), sizes AS (
        SELECT doc_id, CAST(len(shingles) AS BIGINT) AS size_a FROM sh0
    ), rare AS (
        SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) <= 20
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
        WHERE a.doc_id <> b.doc_id
    ), shared AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(a.shingles, b.shingles))
                    AS BIGINT) AS shared
        FROM cand c
        JOIN sh0 a ON a.doc_id = c.id_a
        JOIN sh0 b ON b.doc_id = c.id_b
    )
    SELECT s.id_a, s.id_b, z.size_a, s.shared,
           round(CAST(s.shared AS DOUBLE) / CAST(z.size_a AS DOUBLE), 6)
               AS containment
    FROM shared s JOIN sizes z ON z.doc_id = s.id_a
    WHERE 5 * s.shared >= 4 * z.size_a AND z.size_a >= 5
    ORDER BY s.id_a, s.id_b
    """,
)
def doc_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-duplicate detection: shingle CONTAINMENT
    C(A,B) = |S(A)∩S(B)|/|S(A)| ≥ 0.8 — catches a short document
    swallowed whole by a longer one, which resemblance (Jaccard)
    misses because the union is dominated by the big doc (Broder '97
    distinguishes exactly these two measures).  Candidate generation
    is the inverted shingle index restricted to RARE shingles
    (document frequency ≤ 20) — the posting-list join is bounded by
    df², never |docs|²; candidates are then EXACTLY verified by
    re-joining both docs' full shingle sets (candidate-then-verify,
    same discipline as the MinHash family).  The 0.8 gate is the
    integer cross-multiplication 5·shared ≥ 4·|S(A)| so no float
    decides membership; the reported containment is display-only.
    At 100 TB the df cap keeps candidate mass tracking true
    containment density."""
    d = _t(spark, sf_dir, "documents")
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
        word_shingles,
    )

    docs = d.select("doc_id", norm_words(F.col("text")).alias("words"))
    sh0 = docs.filter(F.size("words") >= 3).select(
        "doc_id", word_shingles(F.col("words"), 3).alias("shingles")
    )
    sh = sh0.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh0.select(
        "doc_id", F.size("shingles").cast("bigint").alias("size_a")
    )
    rare = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") <= 20)
        .select("s")
    )
    cand = (
        sh.join(rare, "s")
        .alias("a")
        .join(sh.alias("b"), "s")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # exact verify via JVM array intersection — ONE row per candidate
    # pair with a set-op over its two shingle arrays, instead of
    # exploding |cand| × |S(A)| rows through a shuffle (the explode
    # form measured 210 s at sf1; this is the _JACCARD_PAIRS_CTE
    # idiom, list_intersect ≡ array_intersect on already-distinct
    # shingle arrays)
    shared = (
        cand.join(
            sh0.select(
                F.col("doc_id").alias("id_a"),
                F.col("shingles").alias("_sha"),
            ),
            "id_a",
        )
        .join(
            sh0.select(
                F.col("doc_id").alias("id_b"),
                F.col("shingles").alias("_shb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sha", "_shb"))
            .cast("bigint")
            .alias("shared"),
        )
    )
    return (
        shared.join(sizes, F.col("id_a") == F.col("doc_id"))
        .filter(
            (F.lit(5) * F.col("shared") >= F.lit(4) * F.col("size_a"))
            & (F.col("size_a") >= 5)
        )
        .select(
            "id_a",
            "id_b",
            "size_a",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.col("size_a").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("id_a", "id_b")
    )


def _circular_trig_tables() -> tuple[list[int], list[int]]:
    """Hour-of-day cos/sin on the 1e9 integer lattice — computed ONCE in
    Python and embedded as shared literals in both engines (the repo's
    shared-literal idiom: no engine evaluates a transcendental)."""
    import math

    cos = [round(math.cos(2 * math.pi * h / 24) * 1e9) for h in range(24)]
    sin = [round(math.sin(2 * math.pi * h / 24) * 1e9) for h in range(24)]
    return cos, sin


def _circular_oracle() -> str:
    cos, sin = _circular_trig_tables()
    return f"""
    WITH hr AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS h,
               CAST(COUNT(*) AS HUGEINT) AS cnt
        FROM events GROUP BY 1, 2
    ), comb AS (
        SELECT event_type, SUM(cnt) AS n,
               SUM(cnt * ([{', '.join(str(c) for c in cos)}][h + 1])) AS sc,
               SUM(cnt * ([{', '.join(str(s) for s in sin)}][h + 1])) AS ss,
               MAX(cnt * 24 + (23 - h)) AS modal_enc
        FROM hr GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(sqrt(CAST(sc * sc + ss * ss AS DOUBLE))
                 / (CAST(n AS DOUBLE) * 1e9), 6) AS resultant_r,
           round(1 - sqrt(CAST(sc * sc + ss * ss AS DOUBLE))
                     / (CAST(n AS DOUBLE) * 1e9), 6) AS circ_variance,
           CAST(23 - modal_enc % 24 AS INT) AS modal_hour
    FROM comb ORDER BY event_type
    """


@query("events_hour_circular", oracle=_circular_oracle())
def events_hour_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of activity time-of-day per event type —
    resultant length R (how CONCENTRATED around one time of day),
    circular variance 1−R, and the modal hour.  Hours are angles on
    the 24-hour circle; cos/sin per hour come from a 24-entry integer
    lattice table computed once driver-side and embedded in BOTH
    engines (shared-literal idiom — neither engine evaluates a
    transcendental, so the vector sums are exact integers).  The scan
    collapses to |types|×24 hour counts; R needs one IEEE sqrt.  The
    modal hour rides the composite-integer argmax (cnt·24 + 23−h) —
    ties break to the EARLIEST hour identically everywhere.  At 1e12
    rows sc² needs a double cast before squaring — noted, irrelevant
    below ~1e9 events per type."""
    cos_t, sin_t = _circular_trig_tables()
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    hr = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("h")
    ).agg(F.count(F.lit(1)).cast(dec).alias("cnt"))
    cos_arr = F.array([F.lit(c) for c in cos_t])
    sin_arr = F.array([F.lit(s) for s in sin_t])
    comb = hr.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.sum(
            F.col("cnt") * F.element_at(cos_arr, F.col("h") + 1)
        ).alias("sc"),
        F.sum(
            F.col("cnt") * F.element_at(sin_arr, F.col("h") + 1)
        ).alias("ss"),
        F.max(F.col("cnt") * 24 + (23 - F.col("h"))).alias("modal_enc"),
    )
    r = F.sqrt(
        (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")).cast(
            "double"
        )
    ) / (F.col("n").cast("double") * F.lit(1e9))
    return comb.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(r, 6).alias("resultant_r"),
        F.round(1 - r, 6).alias("circ_variance"),
        (23 - F.col("modal_enc") % 24).cast("int").alias("modal_hour"),
    ).orderBy("event_type")


@query(
    "corpus_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text),
                             '[ \\t\\n\\r\\f\\x0b]+'))
                    END) AS BIGINT) AS total_words,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_PIECE_RE}')))
               AS BIGINT) AS total_pieces,
           round(CAST(SUM(len(regexp_extract_all(text, '{BPE_PIECE_RE}')))
                      AS DOUBLE)
                 / CAST(GREATEST(SUM(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text),
                                   '[ \\t\\n\\r\\f\\x0b]+'))
                          END), 1) AS DOUBLE), 6) AS fertility
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — BPE-ish pieces per whitespace
    word, the standard multilingual-tokenizer cost metric (a lang with
    fertility 3 pays 3× the sequence length per word).  Reuses the
    text operators' JVM-side regexp counters (operators/text.py:
    token_count / bpe_token_estimate — no Python in the loop); one
    grouped pass, |langs| output rows at any corpus size.  The ratio
    divides two exact bigint totals once at the end."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        bpe_token_estimate,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        token_count(F.col("text")).cast("bigint").alias("w"),
        bpe_token_estimate(F.col("text")).cast("bigint").alias("p"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("w").cast("bigint").alias("total_words"),
            F.sum("p").cast("bigint").alias("total_pieces"),
        )
        .select(
            "lang",
            "docs",
            "total_words",
            "total_pieces",
            F.round(
                F.col("total_pieces").cast("double")
                / F.greatest(F.col("total_words"), F.lit(1)).cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_kneser_ney_bigrams",
    oracle="""
    WITH tr AS (
        SELECT doc_id,
               list_prepend('<s>', string_split_regex(trim(lower(text)),
                                                      '[ \\t\\n\\r\\f\\x0b]+')) AS t
        FROM documents WHERE trim(text) <> ''
    ), trb AS (
        SELECT t[i] AS prev, t[i+1] AS w
        FROM tr, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), bc AS (
        SELECT prev, w, CAST(count(*) AS HUGEINT) AS c12
        FROM trb GROUP BY 1, 2
    ), ctx AS (
        SELECT prev, CAST(SUM(c12) AS HUGEINT) AS c1,
               CAST(COUNT(*) AS HUGEINT) AS n1fw
        FROM bc GROUP BY 1
    ), pre AS (
        SELECT w, CAST(COUNT(*) AS HUGEINT) AS n1pw FROM bc GROUP BY 1
    ), btot AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS b FROM bc
    ), top20 AS (
        SELECT prev, c1, n1fw FROM ctx ORDER BY c1 DESC, prev LIMIT 20
    ), cand AS (
        SELECT bc.prev, bc.w, bc.c12, t.c1, t.n1fw, p.n1pw, btot.b
        FROM bc JOIN top20 t USING (prev)
        JOIN pre p ON p.w = bc.w
        CROSS JOIN btot
    ), rk AS (
        SELECT *, row_number() OVER (PARTITION BY prev
                                     ORDER BY c12 DESC, w) AS rnk
        FROM cand
    )
    SELECT prev AS w1, w AS w2,
           CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
           round(CAST(GREATEST(4 * c12 - 3, 0) * b + 3 * n1fw * n1pw
                      AS DOUBLE)
                 / CAST(4 * c1 * b AS DOUBLE), 6) AS kn_prob,
           CAST(rnk AS INT) AS rnk
    FROM rk WHERE rnk <= 3 ORDER BY w1, rnk
    """,
)
def corpus_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM over the corpus — the classic
    n-gram language model (Chen & Goodman '98): P(w₂|w₁) =
    max(c₁₂−d,0)/c₁ + d·N₁₊(w₁·)/c₁ · N₁₊(·w₂)/B with discount
    d = 0.75, where the continuation probability N₁₊(·w₂)/B is what
    distinguishes KN from additive smoothing (types, not tokens).
    With d = 3/4 the whole probability is the RATIONAL
    (max(4c₁₂−3,0)·B + 3·N₁₊(w₁·)·N₁₊(·w₂)) / (4·c₁·B) — exact
    integers until ONE final divide, so the hash gate never touches a
    transcendental.  Output: top-3 continuations for the 20 most
    frequent contexts (TakeOrderedAndProject global top-k, then a
    window over the 20-context slice only).  The model IS three count
    DataFrames — never collected; all joins are keyed on words; at
    1e12 tokens the numerator needs ~4·c₁₂·B < 1e38, inside
    decimal(38,0)/HUGEINT."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        _doc_bigrams,
    )

    d = _t(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    tb = _doc_bigrams(d, "doc_id", "text")
    bc = tb.groupBy(
        F.col("_prev").alias("w1"), F.col("_w").alias("w2")
    ).agg(F.count(F.lit(1)).cast(dec).alias("c12"))
    ctx = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).cast(dec).alias("n1fw"),
    )
    pre = bc.groupBy("w2").agg(
        F.count(F.lit(1)).cast(dec).alias("n1pw")
    )
    btot = bc.agg(F.count(F.lit(1)).cast(dec).alias("b"))
    top20 = take_top_k(
        ctx, [F.desc("c1"), F.asc("w1")], 20
    ).select("w1", "c1", "n1fw")
    cand = (
        bc.join(F.broadcast(top20), "w1")
        .join(pre, "w2")
        .join(F.broadcast(btot))
    )
    num = (
        F.greatest(
            F.lit(4) * F.col("c12") - 3, F.lit(0).cast(dec)
        )
        * F.col("b")
        + F.lit(3) * F.col("n1fw") * F.col("n1pw")
    )
    den = F.lit(4) * F.col("c1") * F.col("b")
    w = Window.partitionBy("w1").orderBy(F.desc("c12"), F.asc("w2"))
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "kn_prob"
            ),
            "rnk",
        )
        .orderBy("w1", "rnk")
    )


@query(
    "events_hbos_outliers",
    oracle="""
    WITH f AS (
        SELECT CAST(hour(ts) AS INT) AS h,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
               CAST(LEAST(GREATEST(floor(value / 50), 0), 19) AS INT)
                   AS vb
        FROM events
    ), combo AS (
        SELECT h, dow, vb, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM f GROUP BY 1, 2, 3
    ), n AS (
        SELECT CAST(SUM(n_events) AS BIGINT) AS nt FROM combo
    ), bh AS (
        SELECT h, CAST(round(-ln(CAST(SUM(n_events) AS DOUBLE)
                                 / (SELECT nt FROM n)) * 1e6, 0)
                       AS BIGINT) AS li
        FROM combo GROUP BY h
    ), bd AS (
        SELECT dow, CAST(round(-ln(CAST(SUM(n_events) AS DOUBLE)
                                   / (SELECT nt FROM n)) * 1e6, 0)
                         AS BIGINT) AS li
        FROM combo GROUP BY dow
    ), bv AS (
        SELECT vb, CAST(round(-ln(CAST(SUM(n_events) AS DOUBLE)
                                  / (SELECT nt FROM n)) * 1e6, 0)
                        AS BIGINT) AS li
        FROM combo GROUP BY vb
    ), scored AS (
        SELECT c.h, c.dow, c.vb, c.n_events,
               bh.li + bd.li + bv.li AS s6
        FROM combo c JOIN bh USING (h) JOIN bd USING (dow)
        JOIN bv USING (vb)
    ), rk AS (
        SELECT *, row_number() OVER (ORDER BY s6 DESC, h, dow, vb)
                      AS rnk
        FROM scored
    )
    SELECT h, dow, vb, n_events,
           round(CAST(s6 AS DOUBLE) / 1e6, 6) AS hbos_score,
           CAST(rnk AS INT) AS rnk
    FROM rk WHERE rnk <= 20 ORDER BY rnk
    """,
)
def events_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS anomaly detection (Goldstein & Dengel '12) over events:
    score = Σ_features −ln(bin frequency) for hour-of-day, day-of-week,
    and value bucket — the histogram-based outlier detector that scales
    where isolation forests can't (no trees, no sampling: three
    1-D histograms).  Scores live on feature COMBOS, not rows — the
    scan collapses to ≤ 24·7·20 combos, each per-bin −ln term is
    rounded to the 1e-6 integer lattice at the BIN level (tiny frames;
    coarsened from 1e-9 in r10 — fleet libm-drift margin) and the
    3-term sum is exact integer, so the top-20 ordering compares
    integers, never floats.  Spark dayofweek is 1=Sunday;
    DuckDB 0=Sunday — the oracle shifts +1 (repo idiom)."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    e = _t(spark, sf_dir, "events")
    f = e.select(
        F.hour("ts").cast("int").alias("h"),
        F.dayofweek(F.to_date("ts")).cast("int").alias("dow"),
        F.least(
            F.greatest(F.floor(F.col("value") / 50), F.lit(0)), F.lit(19)
        )
        .cast("int")
        .alias("vb"),
    )
    combo = f.groupBy("h", "dow", "vb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    nt = combo.agg(F.sum("n_events").cast("bigint").alias("nt"))

    def _bin(col: str) -> DataFrame:
        return (
            combo.groupBy(col)
            .agg(F.sum("n_events").cast("bigint").alias("_bn"))
            .join(F.broadcast(nt))
            .select(
                col,
                F.round(
                    -F.log(
                        F.col("_bn").cast("double")
                        / F.col("nt").cast("double")
                    )
                    * F.lit(1e6),
                    0,
                )
                .cast("bigint")
                .alias(f"_li_{col}"),
            )
        )

    scored = (
        combo.join(F.broadcast(_bin("h")), "h")
        .join(F.broadcast(_bin("dow")), "dow")
        .join(F.broadcast(_bin("vb")), "vb")
        .select(
            "h",
            "dow",
            "vb",
            "n_events",
            (
                F.col("_li_h") + F.col("_li_dow") + F.col("_li_vb")
            ).alias("s6"),
        )
    )
    top = take_top_k(
        scored,
        [F.desc("s6"), F.asc("h"), F.asc("dow"), F.asc("vb")],
        20,
        rank_col="rnk",
    )
    return top.select(
        "h",
        "dow",
        "vb",
        "n_events",
        F.round(F.col("s6").cast("double") / F.lit(1e6), 6).alias(
            "hbos_score"
        ),
        F.col("rnk").cast("int").alias("rnk"),
    ).orderBy("rnk")


@query(
    "corpus_oov_rate",
    oracle="""
    WITH tr AS (
        SELECT unnest(string_split_regex(trim(lower(text)),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> '' AND doc_id % 10 < 8
    ), vocab AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM tr GROUP BY w
    ), held AS (
        SELECT lang,
               unnest(string_split_regex(trim(lower(text)),
                                         '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> '' AND doc_id % 10 >= 8
    ), joined AS (
        SELECT h.lang, COALESCE(v.freq, 0) AS freq
        FROM held h LEFT JOIN vocab v ON v.w = h.w
    ), grid AS (
        SELECT j.lang, c.min_count,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN j.freq < c.min_count THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM joined j
        JOIN (SELECT unnest([2, 10, 100]) AS min_count) c ON TRUE
        GROUP BY 1, 2
    )
    SELECT lang, CAST(min_count AS INT) AS min_count, n_tokens, n_oov,
           round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS oov_rate
    FROM grid ORDER BY lang, min_count
    """,
)
def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate of held-out documents against the train
    split's vocabulary at min-frequency cutoffs {2, 10, 100} — the
    vocab-pruning curve a tokenizer/embedding builder reads before
    fixing min_count (word2vec's knob) per language.  Train vocabulary
    is ONE grouped count (never collected); held-out tokens LEFT-join
    it keyed on the word and compare exact integer frequencies against
    the broadcast 3-row cutoff grid — counts and one final divide, no
    floats in any gate.  Linear in token count at any corpus size;
    frequent-word join skew is ordinary AQE-handled skew."""
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    nonempty = d.filter(F.length(F.trim(F.col("text"))) > 0)
    tr = (
        nonempty.filter(F.col("doc_id") % 10 < 8)
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    )
    vocab = tr.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    held = (
        nonempty.filter(F.col("doc_id") % 10 >= 8)
        .select(
            "lang", F.explode(tokens(F.lower(F.col("text")))).alias("w")
        )
    )
    joined = held.join(vocab, "w", "left").select(
        "lang", F.coalesce("freq", F.lit(0)).alias("freq")
    )
    cuts = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(10), F.lit(100))).alias(
            "min_count"
        )
    )
    grid = (
        joined.crossJoin(F.broadcast(cuts))
        .groupBy("lang", "min_count")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("freq") < F.col("min_count"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return grid.select(
        "lang",
        F.col("min_count").cast("int").alias("min_count"),
        "n_tokens",
        "n_oov",
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("oov_rate"),
    ).orderBy("lang", "min_count")


_SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]


def _shapley_subset_rows() -> list[tuple[str, int, int, int]]:
    """(channel, T_mask, T∪{i}_mask, 24·w(|T|)) for every channel i and
    every coalition T ⊆ N\\{i} over the 4 non-purchase channels —
    enumerated ONCE in Python (32 rows) and embedded in both engines.
    24·w(t) = t!·(3−t)! is integer, so the only floats are the v(T)
    conversion-rate divides."""
    import math

    rows = []
    n = len(_SHAPLEY_CHANNELS)
    for i, ch in enumerate(_SHAPLEY_CHANNELS):
        others = [j for j in range(n) if j != i]
        for k in range(1 << (n - 1)):
            t_mask = sum(1 << others[j] for j in range(n - 1) if k >> j & 1)
            t = bin(k).count("1")
            w24 = math.factorial(t) * math.factorial(n - 1 - t)
            rows.append((ch, t_mask, t_mask | (1 << i), w24))
    return rows


def _shapley_oracle() -> str:
    st = ", ".join(
        f"('{c}', {t}, {ti}, {w})" for c, t, ti, w in _shapley_subset_rows()
    )
    bits = ", ".join(
        f"('{c}', {1 << i})" for i, c in enumerate(_SHAPLEY_CHANNELS)
    )
    return f"""
    WITH u AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    + 2 * MAX(CASE WHEN event_type = 'error' THEN 1
                              ELSE 0 END)
                    + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1
                              ELSE 0 END)
                    + 8 * MAX(CASE WHEN event_type = 'view' THEN 1
                              ELSE 0 END) AS INT) AS mask,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ), m AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS nu,
               CAST(SUM(conv) AS BIGINT) AS nc
        FROM u GROUP BY mask
    ), st(channel, t_mask, ti_mask, w24) AS (VALUES {st}),
    terms AS (
        SELECT st.channel,
               CAST(round(st.w24 * (
                   CASE WHEN COALESCE(a.nu, 0) > 0
                        THEN CAST(a.nc AS DOUBLE) / CAST(a.nu AS DOUBLE)
                        ELSE 0 END
                   - CASE WHEN COALESCE(b.nu, 0) > 0
                          THEN CAST(b.nc AS DOUBLE) / CAST(b.nu AS DOUBLE)
                          ELSE 0 END) * 1e9, 0) AS BIGINT) AS t9
        FROM st
        LEFT JOIN m a ON a.mask = st.ti_mask
        LEFT JOIN m b ON b.mask = st.t_mask
    ), chbit(channel, bit) AS (VALUES {bits}),
    chstat AS (
        SELECT cb.channel,
               CAST(SUM(CASE WHEN m.mask & cb.bit <> 0 THEN m.nu
                        ELSE 0 END) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN m.mask & cb.bit <> 0 THEN m.nc
                        ELSE 0 END) AS BIGINT) AS n_conv
        FROM chbit cb CROSS JOIN m GROUP BY cb.channel
    )
    SELECT t.channel, c.n_users, c.n_conv,
           CAST(CASE WHEN SUM(t.t9) >= 0
                     THEN (2 * SUM(t.t9) + 24000) // 48000
                     ELSE -((2 * -SUM(t.t9) + 24000) // 48000)
                END AS BIGINT) AS credit_micros
    FROM terms t JOIN chstat c ON c.channel = t.channel
    GROUP BY t.channel, c.n_users, c.n_conv
    ORDER BY t.channel
    """


@query("purchase_shapley_attribution", oracle=_shapley_oracle())
def purchase_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value marketing attribution over channel SETS
    (Zhao et al. '18): each user contributes their touched-channel
    coalition (bitmask over the 4 non-purchase event types) and
    whether they purchased; the characteristic function v(T) is the
    conversion rate of users with EXACTLY coalition T; each channel's
    Shapley credit is the factorial-weighted sum of its marginal
    contributions over all 2³ coalitions of the others.  With n = 4,
    24·w(t) = t!(3−t)! is integer, and the full 32-row
    (channel × coalition) enumeration is computed once in Python and
    embedded in both engines (shared-literal idiom).  Each marginal
    term rounds to the 1e-9 lattice before the cross-coalition sum
    (the v(T) divides are IEEE-exact, but SQL SUM order isn't
    guaranteed — integer sums are order-free).  The scan collapses to
    ≤16 coalition rows; everything after is literal-table joins.  At
    1e12 events the per-user mask agg is the only real work — one
    map-side-combining groupBy."""
    e = _t(spark, sf_dir, "events")
    bit = {c: 1 << i for i, c in enumerate(_SHAPLEY_CHANNELS)}
    u = e.groupBy("user_id").agg(
        sum(
            (
                F.max(
                    F.when(F.col("event_type") == c, 1).otherwise(0)
                )
                * F.lit(b)
            )
            for c, b in bit.items()
        )
        .cast("int")
        .alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("conv"),
    )
    m = u.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("nu"),
        F.sum("conv").cast("bigint").alias("nc"),
    )
    st = spark.createDataFrame(
        _shapley_subset_rows(),
        "channel STRING, t_mask INT, ti_mask INT, w24 INT",
    )

    def _rate(side: str):
        return F.when(
            F.coalesce(F.col(f"{side}.nu"), F.lit(0)) > 0,
            F.col(f"{side}.nc").cast("double")
            / F.col(f"{side}.nu").cast("double"),
        ).otherwise(F.lit(0.0))

    terms = (
        st.join(
            F.broadcast(m.alias("a")),
            F.col("a.mask") == F.col("ti_mask"),
            "left",
        )
        .join(
            F.broadcast(m.alias("b")),
            F.col("b.mask") == F.col("t_mask"),
            "left",
        )
        .select(
            "channel",
            F.round(
                F.col("w24") * (_rate("a") - _rate("b")) * F.lit(1e9), 0
            )
            .cast("bigint")
            .alias("t9"),
        )
    )
    chbit = spark.createDataFrame(
        [(c, b) for c, b in bit.items()], "channel STRING, bit INT"
    )
    chstat = (
        chbit.crossJoin(F.broadcast(m))
        .groupBy("channel")
        .agg(
            F.sum(
                F.when(
                    F.col("mask").bitwiseAND(F.col("bit")) != 0,
                    F.col("nu"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_users"),
            F.sum(
                F.when(
                    F.col("mask").bitwiseAND(F.col("bit")) != 0,
                    F.col("nc"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_conv"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(F.sum("t9").alias("s9"))
        .join(F.broadcast(chstat), "channel")
        .select(
            "channel",
            "n_users",
            "n_conv",
            # integer half-away-from-zero micros — round(s9/1e9/24, 6)
            # was a decimal-tie surface (exact tie at s9 % 24000 ==
            # 12000); marginals can be negative, so route through ABS
            F.expr(
                "CAST(CASE WHEN s9 >= 0"
                " THEN (2 * s9 + 24000) div 48000"
                " ELSE -((2 * -s9 + 24000) div 48000)"
                " END AS BIGINT)"
            ).alias("credit_micros"),
        )
        .orderBy("channel")
    )


@query(
    "customer_logrank_test",
    oracle="""
    WITH o AS (
        SELECT o.o_custkey,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                   AS grp,
               CAST(o.o_orderdate AS DATE) AS d
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), hz AS (
        SELECT MAX(d) AS h FROM o
    ), gaps AS (
        SELECT grp,
               CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS dur,
               1 AS ev
        FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
    ), cens AS (
        SELECT grp,
               CAST(date_diff('day', MAX(d), (SELECT h FROM hz))
                    AS BIGINT) AS dur,
               0 AS ev
        FROM o GROUP BY o_custkey, grp
    ), durs AS (
        SELECT grp, dur, ev FROM gaps WHERE dur IS NOT NULL
        UNION ALL SELECT grp, dur, ev FROM cens
    ), tbl AS (
        SELECT dur,
               CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS t1,
               CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)
                   AS d0,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS t0
        FROM durs GROUP BY dur
    ), tot AS (
        SELECT CAST(SUM(t1) AS BIGINT) AS na,
               CAST(SUM(t0) AS BIGINT) AS nb
        FROM tbl
    ), risk AS (
        SELECT dur, d1, d0,
               (SELECT na FROM tot)
                   - COALESCE(SUM(t1) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n1,
               (SELECT nb FROM tot)
                   - COALESCE(SUM(t0) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n0
        FROM tbl
    ), terms AS (
        SELECT d1,
               CAST(round(CAST(n1 AS DOUBLE) * (d1 + d0)
                          / (n1 + n0) * 1e9, 0) AS BIGINT) AS e9,
               CASE WHEN n1 + n0 > 1
                    THEN CAST(round(
                        CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                        * CAST(d1 + d0 AS DOUBLE)
                        * CAST(n1 + n0 - d1 - d0 AS DOUBLE)
                        / (CAST(n1 + n0 AS DOUBLE)
                           * CAST(n1 + n0 AS DOUBLE)
                           * CAST(n1 + n0 - 1 AS DOUBLE)) * 1e9, 0)
                        AS BIGINT)
                    ELSE 0 END AS v9
        FROM risk WHERE d1 + d0 > 0
    )
    SELECT tot.na AS n_building, tot.nb AS n_other,
           CAST(SUM(t.d1) AS BIGINT) AS observed_events,
           CAST((SUM(t.e9) + 500) // 1000 AS BIGINT) AS expected_micros,
           CAST((2 * (CAST(SUM(t.d1) AS HUGEINT) * 1000000000
                      - SUM(t.e9))
                   * (CAST(SUM(t.d1) AS HUGEINT) * 1000000000
                      - SUM(t.e9))
                 + SUM(t.v9) * 1000)
                // (2 * SUM(t.v9) * 1000) AS BIGINT) AS chi2_micros
    FROM terms t CROSS JOIN tot
    GROUP BY tot.na, tot.nb
    HAVING SUM(t.v9) > 0
    """,
)
def customer_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test: do BUILDING-segment customers
    reorder on a different survival curve than everyone else?  The
    companion hypothesis test to customer_survival_curve, on the same
    censored reorder-interval life table but split by segment.  Every
    per-duration term — expected events n1·d/n and hypergeometric
    variance n1·n0·d·(n−d)/(n²(n−1)) — is a RATIONAL of exact risk-set
    integers (no transcendental anywhere), rounded to the 1e-9 lattice
    per duration before the order-free integer sums; the χ² is one
    final divide.  The life table is |distinct day gaps| rows, so the
    ordered risk-set windows cost nothing at any corpus size; the
    customer join is keyed and the gap window partitions by customer."""
    o = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"),
                F.when(F.col("c_mktsegment") == "BUILDING", 1)
                .otherwise(0)
                .alias("grp"),
            ),
            "o_custkey",
        )
        .select("o_custkey", "grp", F.col("o_orderdate").cast("date").alias("d"))
    )
    hz = o.agg(F.max("d").alias("_h"))
    wcust = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.withColumn(
            "dur", F.datediff("d", F.lag("d").over(wcust)).cast("bigint")
        )
        .filter(F.col("dur").isNotNull())
        .select("grp", "dur", F.lit(1).alias("ev"))
    )
    cens = (
        o.groupBy("o_custkey", "grp")
        .agg(F.max("d").alias("_last"))
        .join(F.broadcast(hz))
        .select(
            "grp",
            F.datediff("_h", "_last").cast("bigint").alias("dur"),
            F.lit(0).alias("ev"),
        )
    )
    tbl = (
        gaps.unionByName(cens)
        .groupBy("dur")
        .agg(
            F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0))
            .cast("bigint")
            .alias("d1"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("t1"),
            F.sum(F.when(F.col("grp") == 0, F.col("ev")).otherwise(0))
            .cast("bigint")
            .alias("d0"),
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("t0"),
        )
    )
    tot = tbl.agg(
        F.sum("t1").cast("bigint").alias("na"),
        F.sum("t0").cast("bigint").alias("nb"),
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = tbl.join(F.broadcast(tot)).select(
        "dur",
        "d1",
        "d0",
        (
            F.col("na")
            - F.coalesce(F.sum("t1").over(wprev), F.lit(0))
        ).alias("n1"),
        (
            F.col("nb")
            - F.coalesce(F.sum("t0").over(wprev), F.lit(0))
        ).alias("n0"),
    )
    dtot = F.col("d1") + F.col("d0")
    ntot = F.col("n1") + F.col("n0")
    e9 = F.round(
        F.col("n1").cast("double") * dtot / ntot * F.lit(1e9), 0
    ).cast("bigint")
    v9 = F.when(
        ntot > 1,
        F.round(
            F.col("n1").cast("double")
            * F.col("n0").cast("double")
            * dtot.cast("double")
            * (ntot - dtot).cast("double")
            / (
                ntot.cast("double")
                * ntot.cast("double")
                * (ntot - 1).cast("double")
            )
            * F.lit(1e9),
            0,
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    terms = risk.filter(dtot > 0).select(
        "d1", e9.alias("e9"), v9.alias("v9")
    )
    s = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e9").alias("se9"),
        F.sum("v9").alias("sv9"),
    ).join(F.broadcast(tot))
    # integer half-up micros — the prior round(se9/1e9, 6) form is a
    # decimal-tie surface (exact tie at se9 % 1000 == 500, the hazard
    # defect class); chi2 = (O·1e9 − E9)²/(V9·1e9) stays an exact
    # rational of the lattice sums, half-up in micros via decimal38
    # (diff² reaches ~1e30 at sf1 — int64 would wrap); sv9 > 0 guard
    # excludes the degenerate zero-variance case identically on both
    # engines (r9 degenerate-divisor discipline)
    return s.filter(F.col("sv9") > 0).select(
        F.col("na").alias("n_building"),
        F.col("nb").alias("n_other"),
        F.col("o1").alias("observed_events"),
        F.expr("(se9 + 500) div 1000").alias("expected_micros"),
        F.expr(
            "CAST((2 * (CAST(o1 AS decimal(38,0)) * 1000000000"
            " - CAST(se9 AS decimal(38,0)))"
            " * (CAST(o1 AS decimal(38,0)) * 1000000000"
            " - CAST(se9 AS decimal(38,0)))"
            " + CAST(sv9 AS decimal(38,0)) * 1000)"
            " div (2 * CAST(sv9 AS decimal(38,0)) * 1000)"
            " AS BIGINT)"
        ).alias("chi2_micros"),
    )


@query(
    "customer_cumulative_hazard",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ), hz AS (
        SELECT MAX(d) AS h FROM o
    ), gaps AS (
        SELECT CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS dur,
               1 AS ev
        FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
    ), cens AS (
        SELECT CAST(date_diff('day', MAX(d), (SELECT h FROM hz))
                    AS BIGINT) AS dur,
               0 AS ev
        FROM o GROUP BY o_custkey
    ), durs AS (
        SELECT dur, ev FROM gaps WHERE dur IS NOT NULL
        UNION ALL SELECT dur, ev FROM cens
    ), tbl AS (
        SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS t
        FROM durs GROUP BY dur
    ), tot AS (
        SELECT CAST(SUM(t) AS BIGINT) AS n FROM tbl
    ), risk AS (
        SELECT dur, d,
               (SELECT n FROM tot)
                   - COALESCE(SUM(t) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
        FROM tbl
    ), curve AS (
        SELECT dur, d, n_risk,
               SUM(CASE WHEN d > 0
                        THEN CAST(round(CAST(d AS DOUBLE) / n_risk * 1e9,
                                        0) AS BIGINT)
                        ELSE 0 END) OVER (
                   ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS h9
        FROM risk
    )
    SELECT dur AS duration_days, n_risk, d AS d_events,
           (h9 + 500) // 1000 AS hazard_micros
    FROM curve WHERE d > 0 ORDER BY dur
    """,
)
def customer_cumulative_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over the
    censored reorder-interval life table — the Kaplan-Meier companion
    estimator (hazard accumulates ADDITIVELY, so unlike KM's product it
    needs no ln/exp at all).  Each dᵢ/nᵢ increment is an IEEE-exact
    divide of exact integers, rounded to the 1e-9 lattice per duration
    before the cumulative window sum — the sum is integer, portable by
    construction.  The HASHED output is integer-only: the r10 form
    ``round(h9/1e9, 6)`` landed on exact decimal ties wherever
    ``h9 % 1000 == 500`` (the true value is X.xxxxxx5 but the DOUBLE
    ``h9/1e9`` only approximates it, so tie resolution was
    engine/version-dependent — the identified r10 driver red).  Now
    ``hazard_micros = (h9 + 500) div 1000`` — integer half-up, exact on
    every engine, no doubles anywhere in the hashed value.  Same
    |distinct gaps|-row life table as customer_survival_curve;
    event-free durations are censor-only rows and drop from the output
    (they leave H unchanged)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    hz = o.agg(F.max("d").alias("_h"))
    wcust = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.withColumn(
            "dur", F.datediff("d", F.lag("d").over(wcust)).cast("bigint")
        )
        .filter(F.col("dur").isNotNull())
        .select("dur", F.lit(1).alias("ev"))
    )
    cens = (
        o.groupBy("o_custkey")
        .agg(F.max("d").alias("_last"))
        .join(F.broadcast(hz))
        .select(
            F.datediff("_h", "_last").cast("bigint").alias("dur"),
            F.lit(0).alias("ev"),
        )
    )
    tbl = (
        gaps.unionByName(cens)
        .groupBy("dur")
        .agg(
            F.sum("ev").cast("bigint").alias("d"),
            F.count(F.lit(1)).cast("bigint").alias("t"),
        )
    )
    tot = tbl.agg(F.sum("t").cast("bigint").alias("_n"))
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = tbl.join(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("_n") - F.coalesce(F.sum("t").over(wprev), F.lit(0)),
    )
    curve = risk.withColumn(
        "h9",
        F.sum(
            F.when(
                F.col("d") > 0,
                F.round(
                    F.col("d").cast("double") / F.col("n_risk") * F.lit(1e9),
                    0,
                ).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).over(wcum),
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            F.col("d").alias("d_events"),
            F.expr("(h9 + CAST(500 AS BIGINT)) div CAST(1000 AS BIGINT)")
            .alias("hazard_micros"),
        )
        .orderBy("duration_days")
    )


_SURVIVAL_DEBUG_CTE = """
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ), hz AS (
        SELECT MAX(d) AS h FROM o
    ), gaps AS (
        SELECT CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS dur,
               1 AS ev
        FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
    ), cens AS (
        SELECT CAST(date_diff('day', MAX(d), (SELECT h FROM hz))
                    AS BIGINT) AS dur,
               0 AS ev
        FROM o GROUP BY o_custkey
    ), durs AS (
        SELECT dur, ev FROM gaps WHERE dur IS NOT NULL
        UNION ALL SELECT dur, ev FROM cens
    ), tbl AS (
        SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM durs GROUP BY dur
    ), tot AS (
        SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM tbl
    ), risk AS (
        SELECT dur, d, c,
               (SELECT n FROM tot)
                   - COALESCE(SUM(d + c) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
        FROM tbl
    ), factors AS (
        SELECT dur, d, c, n_risk,
               ((n_risk - d) * 2000000000 + n_risk) // (2 * n_risk)
                   AS factor_nano
        FROM risk
    )
"""


def _survival_debug_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared life-table frame (dur, d, c, n_risk, factor_nano) for the
    customer_survival_debug_* bisect family — identical construction to
    customer_survival_curve up through the risk set, then the KM factor
    (n−d)/n half-up-rounded to the 1e-9 lattice in PURE INTEGER
    arithmetic: ((n−d)·2e9 + n) div (2n).  No doubles anywhere."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    hz = o.agg(F.max("d").alias("_h"))
    wcust = Window.partitionBy("o_custkey").orderBy("d")
    gaps = (
        o.withColumn(
            "dur", F.datediff("d", F.lag("d").over(wcust)).cast("bigint")
        )
        .filter(F.col("dur").isNotNull())
        .select("dur", F.lit(1).alias("ev"))
    )
    cens = (
        o.groupBy("o_custkey")
        .agg(F.max("d").alias("_last"))
        .join(F.broadcast(hz))
        .select(
            F.datediff("_h", "_last").cast("bigint").alias("dur"),
            F.lit(0).alias("ev"),
        )
    )
    tbl = (
        gaps.unionByName(cens)
        .groupBy("dur")
        .agg(
            F.sum("ev").cast("bigint").alias("d"),
            F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
        )
    )
    tot = tbl.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("_n"))
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    return (
        tbl.join(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("_n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)
            ),
        )
        .withColumn(
            "factor_nano",
            F.expr(
                "((n_risk - d) * 2000000000 + n_risk) div (2 * n_risk)"
            ),
        )
    )


@query(
    "customer_survival_debug_gaps",
    oracle=_SURVIVAL_DEBUG_CTE
    + """
    SELECT dur AS duration_days, d AS n_event, c AS n_censor
    FROM tbl ORDER BY dur
    """,
)
def customer_survival_debug_gaps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survival-family bisect stage 1/4: the duration histogram straight
    off the orders table — per-customer reorder gaps (events) and
    horizon censoring, grouped by duration.  Every value is an exact
    integer produced by date subtraction and COUNT/SUM; no float exists
    anywhere in the plan.  If THIS stage diverges on the driver, the
    driver's testdata (or its date arithmetic) differs from local and no
    arithmetic fix downstream can help; if it is green, the divergence
    enters later.  Companion to customer_survival_curve (r8-r10 driver
    reds that were bit-identical to DuckDB locally)."""
    return (
        _survival_debug_risk(spark, sf_dir)
        .select(
            F.col("dur").alias("duration_days"),
            F.col("d").alias("n_event"),
            F.col("c").alias("n_censor"),
        )
        .orderBy("duration_days")
    )


@query(
    "customer_survival_debug_lifetable",
    oracle=_SURVIVAL_DEBUG_CTE
    + """
    SELECT dur AS duration_days, d AS d_events, c AS c_censored, n_risk
    FROM risk ORDER BY dur
    """,
)
def customer_survival_debug_lifetable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survival-family bisect stage 2/4: the full life table — events,
    censors, and the at-risk count n_risk = N − Σ_{t<dur}(d+c) from the
    cumulative window.  Still pure integers.  Green stage 1 + red stage
    2 would localize the divergence to window-frame semantics (all but
    impossible); green here moves the bisect to the factor lattice."""
    return (
        _survival_debug_risk(spark, sf_dir)
        .select(
            F.col("dur").alias("duration_days"),
            F.col("d").alias("d_events"),
            F.col("c").alias("c_censored"),
            "n_risk",
        )
        .orderBy("duration_days")
    )


@query(
    "customer_survival_debug_factors",
    oracle=_SURVIVAL_DEBUG_CTE
    + """
    SELECT dur AS duration_days, n_risk, factor_nano
    FROM factors ORDER BY dur
    """,
)
def customer_survival_debug_factors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survival-family bisect stage 3/4: the per-duration KM factor
    (n−d)/n half-up-rounded to the 1e-9 lattice in PURE INTEGER
    arithmetic — ((n−d)·2e9 + n) div (2n) — so not even an IEEE divide
    exists.  Red here with green stage 2 would mean integer division
    itself differs between engines (it cannot); green moves the bisect
    to the fold."""
    return (
        _survival_debug_risk(spark, sf_dir)
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            "factor_nano",
        )
        .orderBy("duration_days")
    )


@query(
    "customer_survival_debug_fold",
    oracle=_SURVIVAL_DEBUG_CTE
    + """
    SELECT r.dur AS duration_days,
           list_reduce(
               list_prepend(CAST(1000000000 AS BIGINT),
                   list(f.factor_nano ORDER BY f.dur)),
               (acc, x) -> (acc * x + 500000000) // 1000000000)
               AS surv_nano
    FROM factors r JOIN factors f ON f.dur <= r.dur
    GROUP BY r.dur ORDER BY r.dur
    """,
)
def customer_survival_debug_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survival-family bisect stage 4/4: the KM product itself, folded
    ENTIRELY on the 1e-9 integer lattice — acc' = (acc·f + 5e8) div 1e9
    starting from acc = 1e9, over factors in duration order (max
    intermediate 1e18 < 2^63; the lattice product is a deterministic
    integer recurrence with zero float ops).  This is the same ordered
    triangular fold as customer_survival_curve minus every IEEE
    operation: green here + red main query isolates the divergence to
    the driver engines' float ×/÷ (which would falsify the
    correctly-rounded-IEEE assumption); red here + green stage 3
    isolates it to higher-order-function fold semantics."""
    risk = _survival_debug_risk(spark, sf_dir)
    factors = risk.select(
        F.col("dur").alias("fdur"), F.col("factor_nano").alias("fnano")
    )
    return (
        risk.join(F.broadcast(factors), F.col("fdur") <= F.col("dur"))
        .groupBy("dur")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(fdur, fnano))),"
                " CAST(1000000000 AS BIGINT),"
                " (acc, x) -> (acc * x.fnano + CAST(500000000 AS BIGINT))"
                " div CAST(1000000000 AS BIGINT))"
            ).alias("surv_nano")
        )
        .select(F.col("dur").alias("duration_days"), "surv_nano")
        .orderBy("duration_days")
    )


def _periodogram_trig_rows() -> list[tuple[int, int, int, int]]:
    """(period, residue, cos·1e9, sin·1e9) for candidate periods
    2..14 days — 104 rows enumerated once in Python and embedded in
    both engines (shared-literal idiom: no engine's libm enters the
    spectrum sums)."""
    import math

    rows = []
    for p in range(2, 15):
        for r in range(p):
            rows.append(
                (
                    p,
                    r,
                    round(math.cos(2 * math.pi * r / p) * 1e9),
                    round(math.sin(2 * math.pi * r / p) * 1e9),
                )
            )
    return rows


def _periodogram_oracle() -> str:
    vals = ", ".join(
        f"({p}, {r}, {c}, {s})" for p, r, c, s in _periodogram_trig_rows()
    )
    return f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS di,
               CAST(COUNT(*) AS HUGEINT) AS x
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s
        FROM daily GROUP BY 1
    ), dev AS (
        SELECT d.event_type, d.di, st.n * d.x - st.s AS dv
        FROM daily d JOIN st USING (event_type)
    ), trig(p, r, c9, s9) AS (VALUES {vals}),
    grid AS (
        SELECT dv.event_type, t.p,
               SUM(dv.dv * t.c9) AS sc, SUM(dv.dv * t.s9) AS ss
        FROM dev dv
        JOIN trig t ON t.r = dv.di % t.p
        GROUP BY 1, 2
    ), dsq AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS nd,
               SUM(dv * dv) AS sdd
        FROM dev GROUP BY 1
    ), scored AS (
        SELECT g.event_type, g.p,
               g.sc * g.sc + g.ss * g.ss AS pw,
               d.nd, d.sdd
        FROM grid g JOIN dsq d USING (event_type)
    ), rk AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY pw DESC, p) AS rnk
        FROM scored
    )
    SELECT event_type, CAST(p AS INT) AS period,
           round(CAST(pw AS DOUBLE)
                 / (CAST(nd AS DOUBLE) * CAST(sdd AS DOUBLE) * 1e18), 6)
               AS power_ratio,
           CAST(rnk AS INT) AS rnk
    FROM rk WHERE rnk <= 3 ORDER BY event_type, rnk
    """


@query("events_periodogram", oracle=_periodogram_oracle())
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram over each type's daily-count series at
    candidate periods 2..14 days — "is this signal weekly?" as the
    top-3 spectral peaks per type.  The DFT-at-period-p power
    (Σdev·cos)² + (Σdev·sin)² uses mean-removed n-scaled deviations
    (dev = n·x − S, exact integer) and the 104-row shared-literal trig
    lattice, so the spectrum sums are EXACT integers and peak ranking
    compares integers — the only float is the final normalization
    divide (power as a fraction of nd·Σdev², ~variance share at that
    frequency).  The scan collapses to the |types × days| daily frame;
    the 13-period expansion and residue join are broadcast joins of
    that tiny frame.  Calendar-bounded state at any volume."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("di"),
    ).agg(F.count(F.lit(1)).cast(dec).alias("x"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("s"),
    )
    dev = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "di",
        (F.col("n") * F.col("x") - F.col("s")).alias("dv"),
    )
    trig = spark.createDataFrame(
        _periodogram_trig_rows(), "p INT, r INT, c9 BIGINT, s9 BIGINT"
    )
    grid = (
        dev.join(
            F.broadcast(trig),
            F.pmod(F.col("di"), F.col("p")) == F.col("r"),
        )
        .groupBy("event_type", "p")
        .agg(
            F.sum(F.col("dv") * F.col("c9")).alias("sc"),
            F.sum(F.col("dv") * F.col("s9")).alias("ss"),
        )
    )
    dsq = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("nd"),
        F.sum(F.col("dv") * F.col("dv")).alias("sdd"),
    )
    scored = grid.join(F.broadcast(dsq), "event_type").select(
        "event_type",
        "p",
        (
            F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
        ).alias("pw"),
        "nd",
        "sdd",
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("pw"), F.asc("p"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "event_type",
            F.col("p").cast("int").alias("period"),
            F.round(
                F.col("pw").cast("double")
                / (
                    F.col("nd").cast("double")
                    * F.col("sdd").cast("double")
                    * F.lit(1e18)
                ),
                6,
            ).alias("power_ratio"),
            "rnk",
        )
        .orderBy("event_type", "rnk")
    )


@query(
    "events_aqp_sample_estimate",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS v,
               CAST(('0x' || substr(md5('aqp-v1:' || CAST(event_id
                     AS VARCHAR)), 18, 15)) AS BIGINT) % 100 < 10
                   AS in_sample
        FROM events
    ), ex AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(v) AS HUGEINT) AS s
        FROM base GROUP BY 1
    ), sm AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS m,
               CAST(SUM(v) AS HUGEINT) AS ss,
               CAST(SUM(v * v) AS HUGEINT) AS ssq
        FROM base WHERE in_sample GROUP BY 1
    )
    SELECT e.event_type,
           CAST(e.n AS BIGINT) AS n, CAST(s.m AS BIGINT) AS n_sample,
           round(CAST(e.s AS DOUBLE) / CAST(e.n AS DOUBLE) / 100, 6)
               AS exact_mean,
           round(CAST(s.ss AS DOUBLE) / CAST(s.m AS DOUBLE) / 100, 6)
               AS est_mean,
           abs(CAST(e.s AS DOUBLE) / CAST(e.n AS DOUBLE)
               - CAST(s.ss AS DOUBLE) / CAST(s.m AS DOUBLE))
               <= 3 * sqrt(CAST(s.m * s.ssq - s.ss * s.ss AS DOUBLE)
                           / (CAST(s.m AS DOUBLE) * CAST(s.m - 1
                                   AS DOUBLE))
                           / CAST(s.m AS DOUBLE)
                           * (1 - CAST(s.m AS DOUBLE)
                                  / CAST(e.n AS DOUBLE)))
               AS in_bounds
    FROM ex e JOIN sm s USING (event_type)
    WHERE s.m > 1
    ORDER BY e.event_type
    """,
)
def events_aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with an ERROR CONTRACT: a
    deterministic 10 % PRF sample (keyed md5 of event_id — replayable
    on any engine, no RNG) estimates each type's mean value, and the
    output CARRIES the contract check — `in_bounds` asserts the
    estimate sits within 3 standard errors (finite-population
    corrected) of the exact answer computed in the same pass.  This is
    the sketch queries' tolerance-binding discipline applied to
    sampling: a drifting estimator flips the boolean and the hash
    gate catches it.  Both sides are exact integer moments; the only
    floats are the final IEEE divides and one sqrt, with textually
    identical trees on both engines.  Types whose sample holds ≤ 1 row
    are excluded identically on both sides (the m−1 variance divisor
    would be zero, where Spark and DuckDB Inf/NULL semantics diverge).  At 100 TB the sample predicate
    is map-side (no shuffle beyond the grouped moments) — this is how
    you answer dashboard queries at interactive latency against the
    full corpus."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    base = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("aqp-v1:"),
                            F.col("event_id").cast("string"),
                        )
                    ),
                    18,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
            < 10
        ).alias("in_sample"),
    )
    ex = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
    )
    sm = (
        base.filter("in_sample")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("m"),
            F.sum(F.col("v").cast(dec)).alias("ss"),
            F.sum((F.col("v") * F.col("v")).cast(dec)).alias("ssq"),
        )
    )
    exact_mean = F.col("s").cast("double") / F.col("n").cast("double")
    est_mean = F.col("ss").cast("double") / F.col("m").cast("double")
    se = F.sqrt(
        (F.col("m") * F.col("ssq") - F.col("ss") * F.col("ss")).cast(
            "double"
        )
        / (F.col("m").cast("double") * (F.col("m") - 1).cast("double"))
        / F.col("m").cast("double")
        * (1 - F.col("m").cast("double") / F.col("n").cast("double"))
    )
    return (
        ex.join(sm, "event_type")
        .filter(F.col("m") > 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("m").cast("bigint").alias("n_sample"),
            F.round(exact_mean / F.lit(100), 6).alias("exact_mean"),
            F.round(est_mean / F.lit(100), 6).alias("est_mean"),
            (F.abs(exact_mean - est_mean) <= 3 * se).alias("in_bounds"),
        )
        .orderBy("event_type")
    )



# ---------------------------------------------------------------------------
# r10-new wave: paired/trend/extreme-value statistics, concentration and
# inventory analytics, classifier KS — all rational-by-construction or
# shared-literal (the post-survival-curve discipline: no raw libm output
# ever crosses a row boundary).
# ---------------------------------------------------------------------------


@query(
    "events_mcnemar_test",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pu
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(ck * pu) AS BIGINT) AS both_actions,
               CAST(SUM(ck * (1 - pu)) AS BIGINT) AS click_only,
               CAST(SUM((1 - ck) * pu) AS BIGINT) AS purchase_only,
               CAST(SUM((1 - ck) * (1 - pu)) AS BIGINT) AS neither
        FROM u
    )
    SELECT n_users, both_actions, click_only, purchase_only, neither,
           CASE WHEN click_only + purchase_only = 0 THEN 0.0
                ELSE round(CAST((click_only - purchase_only)
                                * (click_only - purchase_only) AS DOUBLE)
                           / (click_only + purchase_only), 6) END AS chi2,
           CASE WHEN click_only + purchase_only = 0 THEN 0.0
                ELSE round(CAST(GREATEST(ABS(click_only - purchase_only)
                                         - 1, 0)
                                * GREATEST(ABS(click_only - purchase_only)
                                           - 1, 0) AS DOUBLE)
                           / (click_only + purchase_only), 6) END AS chi2_cc
    FROM cells
    """,
)
def events_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired user behavior — did-click vs
    did-purchase as two binary outcomes on the SAME units: the
    discordant cells b (clicked, never purchased) and c (purchased,
    never clicked) carry all the signal, chi2 = (b-c)^2/(b+c) with the
    Edwards continuity-corrected twin.  The paired-proportions
    primitive next to the independent-samples Welch/two-proportion
    family.  Exact integers until two final divisions (guarded
    identically on both engines when b+c = 0); one grouped pass per
    user, one global rollup — trivially 100 TB-shaped."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ck"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("pu"),
    )
    cells = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("ck") * F.col("pu")).cast("bigint").alias("both_actions"),
        F.sum(F.col("ck") * (1 - F.col("pu")))
        .cast("bigint")
        .alias("click_only"),
        F.sum((1 - F.col("ck")) * F.col("pu"))
        .cast("bigint")
        .alias("purchase_only"),
        F.sum((1 - F.col("ck")) * (1 - F.col("pu")))
        .cast("bigint")
        .alias("neither"),
    )
    b, c = F.col("click_only"), F.col("purchase_only")
    d = (b - c) * (b - c)
    g = F.greatest(F.abs(b - c) - 1, F.lit(0))
    return cells.select(
        "n_users",
        "both_actions",
        "click_only",
        "purchase_only",
        "neither",
        F.when((b + c) == 0, F.lit(0.0))
        .otherwise(F.round(d.cast("double") / (b + c), 6))
        .alias("chi2"),
        F.when((b + c) == 0, F.lit(0.0))
        .otherwise(F.round((g * g).cast("double") / (b + c), 6))
        .alias("chi2_cc"),
    )


@query(
    "orders_cochran_armitage",
    oracle="""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r
        FROM orders
    ), dose AS (
        SELECT s, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(r) AS HUGEINT) AS cases
        FROM base GROUP BY s
    ), m AS (
        SELECT CAST(SUM(n) AS HUGEINT) AS nt,
               CAST(SUM(cases) AS HUGEINT) AS rt,
               CAST(SUM(s * n) AS HUGEINT) AS sn,
               CAST(SUM(s * cases) AS HUGEINT) AS sr,
               CAST(SUM(s * s * n) AS HUGEINT) AS ssn
        FROM dose
    )
    SELECT CAST(nt AS BIGINT) AS n, CAST(rt AS BIGINT) AS cases,
           round(CAST(nt * sr - rt * sn AS DOUBLE)
                 * sqrt(CAST(nt AS DOUBLE))
                 / sqrt(CAST(rt * (nt - rt)
                             * (nt * ssn - sn * sn) AS DOUBLE)), 6)
               AS z_trend
    FROM m
    """,
)
def orders_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the completed-order ('F') rate
    monotone in order priority (dose score = the priority's leading
    digit 1..5)?  The ordered-categories significance primitive the
    chi-square independence test throws away.  Z = (N*Ssr - R*Ssn) *
    sqrt(N) / sqrt(R(N-R)(N*Sssn - Ssn^2)): every moment is an exact
    HUGEINT/decimal(38,0) integer (the cross-products reach ~3e25 at
    sf1 — past BIGINT, inside 38 digits), and the only float ops are
    two correctly-rounded sqrts, one multiply, one divide, in an
    identical tree on both engines.  One 5-row dose rollup at any
    scale."""
    dec = "decimal(38,0)"
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("s"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("r"),
    )
    dose = base.groupBy("s").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("r").cast(dec).alias("cases"),
    )
    m = dose.agg(
        F.sum("n").cast(dec).alias("nt"),
        F.sum("cases").cast(dec).alias("rt"),
        F.sum(F.col("s") * F.col("n")).cast(dec).alias("sn"),
        F.sum(F.col("s") * F.col("cases")).cast(dec).alias("sr"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast(dec).alias("ssn"),
    )
    nt, rt, sn, sr, ssn = (
        F.col(c) for c in ("nt", "rt", "sn", "sr", "ssn")
    )
    return m.select(
        nt.cast("bigint").alias("n"),
        rt.cast("bigint").alias("cases"),
        F.round(
            (nt * sr - rt * sn).cast("double")
            * F.sqrt(nt.cast("double"))
            / F.sqrt(
                (rt * (nt - rt) * (nt * ssn - sn * sn)).cast("double")
            ),
            6,
        ).alias("z_trend"),
    )



import math as _math

_GUMBEL_C = repr(_math.sqrt(6.0) / _math.pi)
_GUMBEL_GAMMA = repr(0.5772156649015329)
_GUMBEL_K30 = repr(-_math.log(-_math.log(29.0 / 30.0)))


@query(
    "events_gumbel_fit",
    oracle=f"""
    WITH blocks AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               MAX(CAST(round(value * 100, 0) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM blocks GROUP BY event_type
    ), fit AS (
        SELECT event_type, CAST(n AS BIGINT) AS n_blocks,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100 AS mean_max,
               sqrt(CAST(n * ss - s * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 100
                   AS std_max
        FROM m WHERE n > 1
    )
    SELECT event_type, n_blocks,
           round(mean_max, 6) AS mean_max,
           round(std_max, 6) AS std_max,
           round(std_max * {{c}}, 6) AS beta,
           round(mean_max - {{g}} * (std_max * {{c}}), 6) AS mu,
           round((mean_max - {{g}} * (std_max * {{c}}))
                 + {{k30}} * (std_max * {{c}}), 6) AS return_level_30d
    FROM fit ORDER BY event_type
    """.format(c=_GUMBEL_C, g=_GUMBEL_GAMMA, k30=_GUMBEL_K30),
)
def events_gumbel_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit over daily block maxima per event type —
    the EVT block-maxima complement to the registry's peaks-over-
    threshold query: method-of-moments location/scale (beta =
    std*sqrt(6)/pi, mu = mean - gamma*beta) and the 30-day return level
    mu + beta*(-ln(-ln(29/30))) — "the daily maximum you expect to
    exceed once a month".  ALL transcendentals are Python-computed
    SHARED LITERALS embedded identically in both engines (sqrt(6)/pi,
    Euler-Mascheroni, the 30-day Gumbel quantile); the data path is
    exact integer moments + one correctly-rounded sqrt.  One day-grain
    rollup, one per-type rollup."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    blocks = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.max(F.round(F.col("value") * 100, 0).cast("bigint")).alias("x")
    )
    m = blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("ss"),
    )
    n, sm, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = sm.cast("double") / n.cast("double") / 100
    std = (
        F.sqrt(
            (n * ss - sm * sm).cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
        / 100
    )
    c = F.lit(float(_GUMBEL_C))
    g = F.lit(float(_GUMBEL_GAMMA))
    k30 = F.lit(float(_GUMBEL_K30))
    beta = std * c
    mu = mean - g * beta
    return (
        m.filter(n > 1)
        .select(
            "event_type",
            n.cast("bigint").alias("n_blocks"),
            F.round(mean, 6).alias("mean_max"),
            F.round(std, 6).alias("std_max"),
            F.round(beta, 6).alias("beta"),
            F.round(mu, 6).alias("mu"),
            F.round(mu + k30 * beta, 6).alias("return_level_30d"),
        )
        .orderBy("event_type")
    )


@query(
    "customer_concentration_hhi",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nation, o.o_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS r
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), m AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(r) AS BIGINT) AS s,
               CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS q,
               CAST(MAX(r) AS BIGINT) AS top1
        FROM rev GROUP BY nation
    )
    SELECT nation, n_customers, s AS total_rev_cents,
           round(CAST(q AS DOUBLE)
                 / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS hhi,
           CASE WHEN n_customers = 1 THEN 1.0
                ELSE round((CAST(n_customers AS DOUBLE) * CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                              * (n_customers - 1)), 6) END
               AS hhi_normalized,
           round(CAST(top1 AS DOUBLE) / CAST(s AS DOUBLE), 6)
               AS top1_share
    FROM m ORDER BY nation
    """,
)
def customer_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per nation — "is this
    market a monopoly or a long tail": HHI = sum(share_i^2) computed as
    Q/S^2 over exact integer cents (Q = sum r^2 rides HUGEINT/
    decimal38 — a customer's squared cents exceeds BIGINT at scale),
    plus the n-normalized HHI and the top-1 share.  The inputs to every
    float op are exact integers, each CAST correctly rounded, each
    divide/multiply IEEE — identical trees hash-match.  Two keyed
    rollups; the nation frame is 25 rows at any corpus size."""
    dec = "decimal(38,0)"
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"), "o_custkey"
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("r")
        )
    )
    m = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("r").cast("bigint").alias("s"),
        F.sum(F.col("r").cast(dec) * F.col("r")).cast(dec).alias("q"),
        F.max("r").cast("bigint").alias("top1"),
    )
    n, sm, q, top1 = (
        F.col("n_customers"),
        F.col("s"),
        F.col("q"),
        F.col("top1"),
    )
    sd = sm.cast("double")
    return m.select(
        "nation",
        "n_customers",
        sm.alias("total_rev_cents"),
        F.round(q.cast("double") / (sd * sd), 6).alias("hhi"),
        F.when(n == 1, F.lit(1.0))
        .otherwise(
            F.round(
                (n.cast("double") * q.cast("double") - sd * sd)
                / (sd * sd * (n - 1)),
                6,
            )
        )
        .alias("hhi_normalized"),
        F.round(top1.cast("double") / sd, 6).alias("top1_share"),
    ).orderBy("nation")



@query(
    "part_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey AS part,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(r) AS HUGEINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS np
        FROM rev
    ), cum AS (
        SELECT part, r,
               CAST(SUM(r) OVER (ORDER BY r DESC, part
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS HUGEINT) AS c
        FROM rev
    ), cls AS (
        SELECT CASE WHEN c * 5 <= t.t * 4 THEN 'A'
                    WHEN c * 20 <= t.t * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               r
        FROM cum CROSS JOIN tot t
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(r) AS BIGINT) AS rev_cents,
           round(CAST(SUM(CAST(r AS HUGEINT)) AS DOUBLE)
                 / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS rev_share,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST((SELECT np FROM tot) AS DOUBLE), 6) AS part_share
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
)
def part_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC (Pareto) inventory classification of parts by revenue: class
    A = the head parts covering the first 80% of cumulative revenue,
    B = the next 15%, C = the tail — the warehouse-planning rollup
    behind "count the A items weekly, the C items yearly".  Class
    boundaries are INTEGER CROSS-MULTIPLICATION on exact cumulative
    cents (c*5 <= 4*total), so floats never decide membership; the
    global running total rides ``ranking.global_cumsum`` (range-
    partition + per-partition prefix + broadcast offsets) — no
    single-task window over the |parts| frame at any scale."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    dec = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("r")
    )
    cum, total = global_cumsum(
        rev, [F.col("r").desc(), F.col("part").asc()], "r", cum_col="c"
    )
    tot = F.lit(str(total)).cast(dec)
    npart = rev.count()
    cls = cum.select(
        F.when(F.col("c") * 5 <= tot * 4, F.lit("A"))
        .when(F.col("c") * 20 <= tot * 19, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "r",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("bigint").alias("rev_cents"),
            F.round(
                F.sum(F.col("r").cast(dec)).cast("double")
                / F.lit(float(total)),
                6,
            ).alias("rev_share"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.lit(float(npart)),
                6,
            ).alias("part_share"),
        )
        .orderBy("abc_class")
    )


@query(
    "classifier_ks_statistic",
    oracle=f"""
    WITH {{score_cte}}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), b AS (
        SELECT ((sv - mn) * 10) // (mx - mn + 1) AS bin,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                   AS BIGINT) AS neg
        FROM s CROSS JOIN mm GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS tp,
               CAST(SUM(neg) AS BIGINT) AS tn
        FROM b
    ), c AS (
        SELECT bin,
               CAST(SUM(pos) OVER (ORDER BY bin ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_pos,
               CAST(SUM(neg) OVER (ORDER BY bin ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_neg
        FROM b
    ), d AS (
        SELECT c.bin, c.cum_pos, c.cum_neg,
               ABS(CAST(c.cum_pos AS HUGEINT) * t.tn
                   - CAST(c.cum_neg AS HUGEINT) * t.tp) AS dnum
        FROM c CROSS JOIN tot t
    ), best AS (
        SELECT bin, cum_pos, cum_neg, dnum,
               ROW_NUMBER() OVER (ORDER BY dnum DESC, bin) AS rn
        FROM d
    )
    SELECT b.bin AS ks_bin, b.cum_pos, b.cum_neg,
           t.tp, t.tn,
           round(CAST(b.dnum AS DOUBLE)
                 / (CAST(t.tp AS DOUBLE) * CAST(t.tn AS DOUBLE)), 6)
               AS ks_stat
    FROM best b CROSS JOIN tot t WHERE b.rn = 1
    """.format(score_cte=_clf_score_cte()),
)
def classifier_ks_statistic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kolmogorov-Smirnov separation of the hashed linear classifier:
    the max gap between the cumulative positive and negative score
    distributions — credit scoring's single-number discrimination
    metric, completing the classifier-eval family (AUC, PR-AUC,
    calibration, WOE/IV, gains, kappa).  The gap is decided on the
    exact integer cross-product |cum_pos*TN - cum_neg*TP| (floats never
    pick the argmax bin); the cumulation runs over the 10-row POST-
    AGGREGATION bin frame (documented exception); one divide at the
    end."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    scored = scored.localCheckpoint(eager=False)
    mm = scored.agg(F.min("sv").alias("mn"), F.max("sv").alias("mx"))
    b = (
        scored.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr("((sv - mn) * 10) div (mx - mn + 1)").alias("bin")
        )
        .agg(
            F.sum("y").cast("bigint").alias("pos"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
        )
    )
    tot = b.agg(
        F.sum("pos").cast("bigint").alias("tp"),
        F.sum("neg").cast("bigint").alias("tn"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    c = b.select(
        "bin",
        F.sum("pos").over(wcum).cast("bigint").alias("cum_pos"),
        F.sum("neg").over(wcum).cast("bigint").alias("cum_neg"),
    )
    d2 = c.crossJoin(F.broadcast(tot)).withColumn(
        "dnum",
        F.abs(
            F.col("cum_pos").cast(dec) * F.col("tn")
            - F.col("cum_neg").cast(dec) * F.col("tp")
        ),
    )
    wbest = Window.orderBy(F.desc("dnum"), F.asc("bin"))
    return (
        d2.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("bin").alias("ks_bin"),
            "cum_pos",
            "cum_neg",
            "tp",
            "tn",
            F.round(
                F.col("dnum").cast("double")
                / (F.col("tp").cast("double") * F.col("tn").cast("double")),
                6,
            ).alias("ks_stat"),
        )
    )



@query(
    "events_friedman_test",
    oracle="""
    WITH k AS (
        SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS kk
        FROM events
    ), cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), complete AS (
        SELECT day FROM cell GROUP BY day
        HAVING COUNT(*) = (SELECT kk FROM k)
    ), ranked AS (
        SELECT c.day, c.event_type,
               2 * RANK() OVER (PARTITION BY c.day ORDER BY c.cnt)
                   + COUNT(*) OVER (PARTITION BY c.day, c.cnt) - 1
                   AS r2
        FROM cell c JOIN complete USING (day)
    ), rsum AS (
        SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM ranked GROUP BY event_type
    ), stat AS (
        SELECT CAST(SUM(CAST(r2_sum AS HUGEINT) * r2_sum) AS HUGEINT)
                   AS sr2,
               CAST(MAX(n_blocks) AS HUGEINT) AS n,
               (SELECT CAST(kk AS HUGEINT) FROM k) AS kk
        FROM rsum
    )
    SELECT r.event_type, r.r2_sum, r.n_blocks,
           round(CAST(3 * st.sr2
                      - 3 * st.n * st.n * st.kk * (st.kk + 1)
                            * (st.kk + 1) AS DOUBLE)
                 / CAST(st.n * st.kk * (st.kk + 1) AS DOUBLE), 6)
               AS friedman_chi2
    FROM rsum r CROSS JOIN stat st ORDER BY r.event_type
    """,
)
def events_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — do the event types keep the same daily-
    volume ordering day after day, or does the ranking genuinely vary?
    The non-parametric repeated-measures ANOVA: blocks = complete days
    (all k types present), treatments = event types, ranks on daily
    counts with the repo's INTEGER midrank encoding (r2 = 2*rank +
    ties - 1, so tied midranks never touch floats), chi2_F =
    (3*sum(R2_j^2) - 3*n^2*k*(k+1)^2) / (n*k*(k+1)) — exact integers
    until ONE final division.  The day-partitioned rank window is
    keyed (never single-task); the per-type frame is k rows."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    k = e.agg(
        F.countDistinct("event_type").cast("bigint").alias("kk")
    )
    cell = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    cell = cell.localCheckpoint(eager=False)
    complete = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .join(F.broadcast(k), F.col("_nt") == F.col("kk"))
        .select("day")
    )
    wrank = Window.partitionBy("day").orderBy("cnt")
    wties = Window.partitionBy("day", "cnt")
    ranked = cell.join(F.broadcast(complete), "day").select(
        "event_type",
        (
            2 * F.rank().over(wrank)
            + F.count(F.lit(1)).over(wties)
            - 1
        ).alias("r2"),
    )
    rsum = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("r2_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    stat = rsum.crossJoin(F.broadcast(k)).agg(
        F.sum(F.col("r2_sum").cast(dec) * F.col("r2_sum"))
        .cast(dec)
        .alias("sr2"),
        F.max("n_blocks").cast(dec).alias("n"),
        F.max("kk").cast(dec).alias("kk"),
    )
    nn, kk, sr2 = F.col("n"), F.col("kk"), F.col("sr2")
    return (
        rsum.crossJoin(F.broadcast(stat))
        .select(
            "event_type",
            "r2_sum",
            "n_blocks",
            F.round(
                (
                    3 * sr2 - 3 * nn * nn * kk * (kk + 1) * (kk + 1)
                ).cast("double")
                / (nn * kk * (kk + 1)).cast("double"),
                6,
            ).alias("friedman_chi2"),
        )
        .orderBy("event_type")
    )


@query(
    "user_rfm_migration",
    oracle="""
    WITH days AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                    MIN(CAST(ts AS DATE))) AS BIGINT) AS d0,
               CAST(date_diff('day', DATE '1970-01-01',
                    MAX(CAST(ts AS DATE))) AS BIGINT) AS d1
        FROM events
    ), universe AS (
        SELECT DISTINCT user_id FROM events
    ), pc AS (
        SELECT e.user_id,
               CAST(SUM(CASE WHEN CAST(date_diff('day',
                        DATE '1970-01-01', CAST(e.ts AS DATE))
                        AS BIGINT) * 2 <= d.d0 + d.d1
                   THEN 1 ELSE 0 END) AS BIGINT) AS p_a,
               CAST(SUM(CASE WHEN CAST(date_diff('day',
                        DATE '1970-01-01', CAST(e.ts AS DATE))
                        AS BIGINT) * 2 > d.d0 + d.d1
                   THEN 1 ELSE 0 END) AS BIGINT) AS p_b
        FROM events e CROSS JOIN days d
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ), seg AS (
        SELECT u.user_id,
               CASE WHEN COALESCE(p.p_a, 0) = 0 THEN 'none'
                    WHEN p.p_a = 1 THEN 'one' ELSE 'multi' END AS seg_a,
               CASE WHEN COALESCE(p.p_b, 0) = 0 THEN 'none'
                    WHEN p.p_b = 1 THEN 'one' ELSE 'multi' END AS seg_b
        FROM universe u LEFT JOIN pc p USING (user_id)
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM seg
    )
    SELECT seg_a, seg_b, CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST((SELECT nu FROM tot) AS DOUBLE), 6) AS share
    FROM seg GROUP BY seg_a, seg_b ORDER BY seg_a, seg_b
    """,
)
def user_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-frequency segment migration between the first and
    second half of the observation window — the cohort movement matrix
    ("how many one-time buyers became repeat buyers?") that retention
    teams read before any uplift model.  The half boundary is the
    integer midpoint of the epoch-day range decided by CROSS-
    MULTIPLICATION (day*2 <= d0+d1 — no integer-division parity trap);
    segments are exact count buckets over the full user universe
    (non-purchasers land in 'none', not dropped).  One purchase rollup
    + one broadcast boundary; the matrix is at most 9 cells."""
    e = _t(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    days = e.agg(
        F.min(day.cast("bigint")).alias("d0"),
        F.max(day.cast("bigint")).alias("d1"),
    )
    universe = e.select("user_id").distinct()
    pc = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(days))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    day.cast("bigint") * 2 <= F.col("d0") + F.col("d1"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("p_a"),
            F.sum(
                F.when(
                    day.cast("bigint") * 2 > F.col("d0") + F.col("d1"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("p_b"),
        )
    )

    def _seg(c: str) -> F.Column:
        return (
            F.when(F.coalesce(F.col(c), F.lit(0)) == 0, F.lit("none"))
            .when(F.col(c) == 1, F.lit("one"))
            .otherwise(F.lit("multi"))
        )

    seg = universe.join(pc, "user_id", "left").select(
        _seg("p_a").alias("seg_a"), _seg("p_b").alias("seg_b")
    )
    tot = seg.count()
    return (
        seg.groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            "seg_a",
            "seg_b",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.lit(float(tot)), 6
            ).alias("share"),
        )
        .orderBy("seg_a", "seg_b")
    )



@query(
    "multimodal_wav_silence",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               ('0x' || substr(md5('wav-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 65536 AS s,
               CAST(16 + doc_id % 49 AS BIGINT) AS n
        FROM documents
    ), grid AS (
        SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS k
    ), samp AS (
        SELECT b.doc_id, b.n, g.k,
               CASE WHEN ABS(((b.s * (g.k + 1) + 2654435761 * g.k * g.k)
                              % 65536) - 32768) < 8192
                    THEN 1 ELSE 0 END AS silent
        FROM base b JOIN grid g ON g.k < b.n
    ), runs AS (
        SELECT doc_id, k,
               k - ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY k) AS grp
        FROM samp WHERE silent = 1
    ), rl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs GROUP BY doc_id, grp
    ), agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_silent_runs,
               CAST(MAX(run_len) AS BIGINT) AS longest_silent_run,
               CAST(SUM(run_len) AS BIGINT) AS n_silent
        FROM rl GROUP BY doc_id
    )
    SELECT b.doc_id AS media_id, CAST(b.n AS BIGINT) AS n_samples,
           COALESCE(a.n_silent, 0) AS n_silent,
           COALESCE(a.n_silent_runs, 0) AS n_silent_runs,
           COALESCE(a.longest_silent_run, 0) AS longest_silent_run,
           round(CAST(COALESCE(a.n_silent, 0) AS DOUBLE)
                 / CAST(b.n AS DOUBLE), 6) AS silent_frac
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY media_id
    """,
)
def multimodal_wav_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation on REAL decoded audio — the splitter every
    speech pipeline runs before transcription (cut on quiet runs, keep
    utterances): payloads are genuine RIFF/WAVE PCM16 bytes, the stdlib
    ``wave`` decoder recovers the samples behind the Arrow boundary,
    and the run-length statistics (count / longest / total of maximal
    |x| < 8192 runs) are computed from the DECODED waveform in the same
    batch — pure integer DSP, so the oracle (which replays the waveform
    formula and finds runs with the SQL gaps-and-islands idiom) must
    agree exactly or the decode path is wrong.  Decode cost is
    Arrow-amortized; the rollup is one keyed pass."""
    import pandas as _pd

    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        make_wav_table,
    )

    d = _t(spark, sf_dir, "documents")
    media = make_wav_table(d, sample_rate=8000, max_samples=64)

    def batches(it):
        for pdf in it:
            ids, ns, sil, nruns, longest = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, xs = decode_wav(bytes(payload))
                flags = [1 if abs(x) < 8192 else 0 for x in xs]
                total = sum(flags)
                best = cur = runs = 0
                for fl in flags:
                    if fl:
                        cur += 1
                        if cur == 1:
                            runs += 1
                        best = max(best, cur)
                    else:
                        cur = 0
                ids.append(int(mid))
                ns.append(len(xs))
                sil.append(total)
                nruns.append(runs)
                longest.append(best)
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": ns,
                    "n_silent": sil,
                    "n_silent_runs": nruns,
                    "longest_silent_run": longest,
                }
            )

    feats = media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, n_samples BIGINT, n_silent BIGINT, "
            "n_silent_runs BIGINT, longest_silent_run BIGINT"
        ),
    )
    return feats.select(
        "media_id",
        "n_samples",
        "n_silent",
        "n_silent_runs",
        "longest_silent_run",
        F.round(
            F.col("n_silent").cast("double")
            / F.col("n_samples").cast("double"),
            6,
        ).alias("silent_frac"),
    ).orderBy("media_id")



@query(
    "dedup_lsh_recall_eval",
    oracle="""
    WITH t AS MATERIALIZED (
        SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
                   '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    ), sh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tok
        FROM (SELECT doc_id, w FROM t WHERE len(w) >= 3),
             LATERAL (SELECT unnest(generate_series(1, len(w) - 2))
                      AS i)
    ), freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY tok
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM sh GROUP BY doc_id
    ), ordered AS (
        SELECT s.doc_id, s.tok,
               ROW_NUMBER() OVER (PARTITION BY s.doc_id
                   ORDER BY f.df, s.tok) AS pos
        FROM sh s JOIN freq f ON f.tok = s.tok
    ), pref AS (
        SELECT o.doc_id, o.tok
        FROM ordered o JOIN sz ON sz.doc_id = o.doc_id
        WHERE o.pos <= sz.sz - (3 * sz.sz + 4) // 5 + 1
    ), pcand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pref a JOIN pref b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
    ), inter AS (
        SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS i
        FROM pcand c
        JOIN sh wa ON wa.doc_id = c.da
        JOIN sh wb ON wb.doc_id = c.db AND wb.tok = wa.tok
        GROUP BY c.da, c.db
    ), truth AS (
        SELECT i.da AS id_a, i.db AS id_b
        FROM inter i JOIN sz sa ON sa.doc_id = i.da
        JOIN sz sb ON sb.doc_id = i.db
        WHERE 5 * i.i >= 3 * (sa.sz + sb.sz - i.i)
    ), mhp AS (
        SELECT doc_id,
               [('0x' || substr(md5(s2), 18, 15))::BIGINT
                for s2 in shingles] AS h1s,
               [('0x' || substr(md5('kh2:' || s2), 18, 15))::BIGINT
                    % 288230376151711744
                for s2 in shingles] AS h2s
        FROM (SELECT doc_id, list(tok) AS shingles
              FROM sh GROUP BY doc_id)
    ), msig AS (
        SELECT doc_id,
               [list_min(list_transform(range(len(h1s)),
                                        j -> h1s[j + 1] + i * h2s[j + 1]))
                for i in range(0, 16)] AS sig
        FROM mhp
    ), mbands AS (
        SELECT doc_id, b,
               md5(array_to_string(
                   [CAST(x AS VARCHAR) for x in sig[b*4+1:b*4+4]],
                   ',')) AS band_hash
        FROM msig, (SELECT unnest(range(0, 4)) AS b)
    ), mpairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mbands a
        JOIN mbands b ON a.b = b.b AND a.band_hash = b.band_hash
                     AND a.doc_id < b.doc_id
    ), cand AS (
        SELECT p.id_a, p.id_b
        FROM mpairs p
        JOIN msig sa ON sa.doc_id = p.id_a
        JOIN msig sb ON sb.doc_id = p.id_b
        WHERE len([i for i in range(1, 17) if sa.sig[i] = sb.sig[i]])
              >= 4
    ), m AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM truth t2 JOIN cand c2
                  ON t2.id_a = c2.id_a AND t2.id_b = c2.id_b) AS n_hit
    )
    SELECT n_true AS n_true_pairs, n_cand AS n_candidates,
           n_hit AS n_hits,
           round(CAST(n_hit AS DOUBLE) / n_true, 6) AS recall_at_06,
           round(CAST(n_hit AS DOUBLE) / n_cand, 6)
               AS precision_at_06
    FROM m
    """,
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall/precision of the MinHash-LSH candidate generator
    against EXACT ground truth — the eval that justifies running the
    probabilistic dedup at 100 TB instead of the exact one: ground
    truth = the prefix-filter AllPairs join (100% recall at Jaccard >=
    0.6, integer cross-mult decisions), candidates = the production
    16-lane/4-band portable-KM MinHash pairs at est_jaccard >= 0.25
    (integer agreement count >= 4 of 16 — floats never gate), both over
    the IDENTICAL normalized 3-gram shingle base, so the recall number
    measures banding loss and nothing else.  Both halves reuse
    already-driver-proven oracle replays (``dedup_prefix_filter_join``,
    ``dedup_minhash_lsh``); the composition is three COUNTs over their
    joined outputs.  This is ``ann_recall_eval``'s discipline applied
    to the dedup family."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        norm_words,
        prefix_filter_pairs,
        word_shingles,
    )

    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", norm_words(F.col("text")).alias("_w"))
    sh = words.select(
        "doc_id",
        F.explode(word_shingles(F.col("_w"), 3)).alias("tok"),
    )
    truth = prefix_filter_pairs(
        sh, "doc_id", "tok", t_num=3, t_den=5
    ).select("id_a", "id_b")
    cand = minhash_near_duplicates(
        d,
        num_hashes=16,
        bands=4,
        shingle_n=3,
        jaccard_threshold=0.25,
        portable=True,
    ).select("id_a", "id_b")
    truth = truth.localCheckpoint(eager=False)
    cand = cand.localCheckpoint(eager=False)
    n_true = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    n_hit = (
        truth.join(cand, ["id_a", "id_b"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    return (
        n_true.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            F.col("n_true").alias("n_true_pairs"),
            F.col("n_cand").alias("n_candidates"),
            F.col("n_hit").alias("n_hits"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_true"), 6
            ).alias("recall_at_06"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_cand"), 6
            ).alias("precision_at_06"),
        )
    )



def _hurst_literals() -> dict:
    """Shared literals for the R/S log-log regression: ln(w) for the
    three window sizes and the CLOSED-FORM OLS slope coefficients
    c_i = (ln w_i − mean)/Σ(ln w_j − mean)² — so the Hurst slope is a
    pure literal-weighted sum of the three per-size means, with no
    cross-row float accumulation anywhere."""
    import math

    ws = [4, 8, 16]
    lws = [math.log(float(w)) for w in ws]
    mean = sum(lws) / len(lws)
    den = sum((x - mean) ** 2 for x in lws)
    return {
        "ws": ws,
        "lws": [repr(x) for x in lws],
        "coefs": [repr((x - mean) / den) for x in lws],
    }


_HURST = _hurst_literals()


@query(
    "events_hurst_exponent",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                    CAST(ts AS DATE)) AS BIGINT) AS di,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), dz AS (
        SELECT MIN(di) AS dmin FROM daily
    ), sz(w, cw) AS (
        VALUES (CAST(4 AS BIGINT), CAST({_HURST["coefs"][0]} AS DOUBLE)),
               (CAST(8 AS BIGINT), CAST({_HURST["coefs"][1]} AS DOUBLE)),
               (CAST(16 AS BIGINT), CAST({_HURST["coefs"][2]} AS DOUBLE))
    ), win AS (
        SELECT s.w, (d.di - z.dmin) // s.w AS win, d.di, d.x
        FROM daily d CROSS JOIN dz z CROSS JOIN sz s
    ), comp AS (
        SELECT w, win FROM win GROUP BY w, win HAVING COUNT(*) = w
    ), ws AS (
        SELECT v.w, v.win,
               CAST(SUM(v.x) AS BIGINT) AS s1,
               CAST(SUM(CAST(v.x AS HUGEINT) * v.x) AS BIGINT) AS sx2
        FROM win v JOIN comp USING (w, win) GROUP BY v.w, v.win
    ), cum AS (
        SELECT v.w, v.win, v.di, v.x,
               CAST(SUM(v.x) OVER (PARTITION BY v.w, v.win
                   ORDER BY v.di ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS p,
               CAST(ROW_NUMBER() OVER (PARTITION BY v.w, v.win
                   ORDER BY v.di) AS BIGINT) AS k
        FROM win v JOIN comp USING (w, win)
    ), dev AS (
        SELECT c.w, c.win,
               MAX(c.w * c.p - c.k * t.s1)
                   - MIN(c.w * c.p - c.k * t.s1) AS rsc,
               MAX(t.w * t.sx2 - CAST(t.s1 AS HUGEINT) * t.s1) AS b
        FROM cum c JOIN ws t ON t.w = c.w AND t.win = c.win
        GROUP BY c.w, c.win
    ), lnr AS (
        SELECT w, win,
               CAST(round(ln(CAST(rsc AS DOUBLE)
                             / sqrt(CAST(b AS DOUBLE))) * 1e6, 0)
                    AS BIGINT) AS lnrs6
        FROM dev WHERE rsc > 0 AND b > 0
    ), per AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(lnrs6) AS BIGINT) AS sy6
        FROM lnr GROUP BY w
    ), ys AS (
        SELECT p.w, p.n_windows,
               CAST(p.sy6 AS DOUBLE) / p.n_windows / 1e6 AS y
        FROM per p
    ), slope2 AS (
        SELECT (SELECT y * (SELECT cw FROM sz WHERE w = 4)
                FROM ys WHERE w = 4)
             + (SELECT y * (SELECT cw FROM sz WHERE w = 8)
                FROM ys WHERE w = 8)
             + (SELECT y * (SELECT cw FROM sz WHERE w = 16)
                FROM ys WHERE w = 16) AS h
    )
    SELECT y.w AS window_size, y.n_windows,
           round(y.y, 6) AS mean_ln_rs,
           round((SELECT h FROM slope2), 6) AS hurst
    FROM ys y ORDER BY y.w
    """,
)
def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-volume series by rescaled-
    range (R/S) analysis — long-range dependence in one number (H>0.5
    persistent/trending, H<0.5 mean-reverting, 0.5 a random walk), the
    fractal-traffic diagnostic capacity planners fit before trusting
    any Poisson assumption.  Non-overlapping windows of 4/8/16 days
    (the synthetic corpus spans 30 days at every SF; real deployments
    raise the grid):
    within each, the range of cumulative deviations is computed EXACTLY
    as integers by scaling through w (w·P_k − k·S1), the std via exact
    moments + one sqrt, ONE ln per window is rounded to the 1e-6
    lattice before the per-size mean, and the log-log slope is a
    SHARED-LITERAL weighted sum (closed-form 3-point OLS coefficients
    embedded in both engines) — the whole regression happens with zero
    cross-row float accumulation.  Day-grain rollup, keyed per-window
    cumsum; every frame after the first rollup is |days|-sized."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("di")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dz = daily.agg(F.min("di").alias("dmin"))
    rows = [
        (w, float(c))
        for w, c in zip(_HURST["ws"], [float(x) for x in _HURST["coefs"]])
    ]
    sz = spark.createDataFrame(rows, "w BIGINT, cw DOUBLE")
    win = (
        daily.crossJoin(F.broadcast(dz))
        .crossJoin(F.broadcast(sz))
        .select(
            "w",
            "cw",
            F.expr("(di - dmin) div w").alias("win"),
            "di",
            "x",
        )
    )
    win = win.localCheckpoint(eager=False)
    comp = (
        win.groupBy("w", "win")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == F.col("w"))
        .select("w", "win")
    )
    wj = win.join(comp, ["w", "win"])
    ws_stats = wj.groupBy("w", "win").agg(
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x").cast(dec) * F.col("x"))
        .cast("bigint")
        .alias("sx2"),
    )
    wcum = (
        Window.partitionBy("w", "win")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy("w", "win").orderBy("di")
    cum = wj.select(
        "w",
        "win",
        F.sum("x").over(wcum).cast("bigint").alias("p"),
        F.row_number().over(wrn).cast("bigint").alias("k"),
    )
    dev = (
        cum.join(ws_stats, ["w", "win"])
        .groupBy("w", "win")
        .agg(
            (
                F.max(F.col("w") * F.col("p") - F.col("k") * F.col("s1"))
                - F.min(
                    F.col("w") * F.col("p") - F.col("k") * F.col("s1")
                )
            ).alias("rsc"),
            F.max(
                F.col("w") * F.col("sx2")
                - F.col("s1").cast(dec) * F.col("s1")
            ).alias("b"),
        )
    )
    lnr = dev.filter((F.col("rsc") > 0) & (F.col("b") > 0)).select(
        "w",
        F.round(
            F.log(
                F.col("rsc").cast("double")
                / F.sqrt(F.col("b").cast("double"))
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("lnrs6"),
    )
    per = lnr.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("lnrs6").cast("bigint").alias("sy6"),
    )
    ys = per.select(
        "w",
        "n_windows",
        (
            F.col("sy6").cast("double") / F.col("n_windows") / F.lit(1e6)
        ).alias("y"),
    )
    ys = ys.localCheckpoint(eager=False)
    piv = ys.agg(
        *[
            F.max(F.when(F.col("w") == w, F.col("y"))).alias(f"y{w}")
            for w in _HURST["ws"]
        ]
    )
    c4, c8, c16 = (F.lit(float(c)) for c in _HURST["coefs"])
    hurst = piv.select(
        (
            F.col("y4") * c4 + F.col("y8") * c8 + F.col("y16") * c16
        ).alias("h")
    )
    return (
        ys.crossJoin(F.broadcast(hurst))
        .select(
            F.col("w").alias("window_size"),
            "n_windows",
            F.round(F.col("y"), 6).alias("mean_ln_rs"),
            F.round(F.col("h"), 6).alias("hurst"),
        )
        .orderBy("window_size")
    )



@query(
    "embedding_matryoshka_eval",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), dims(d) AS (
        VALUES (CAST(8 AS INT)), (CAST(16 AS INT)), (CAST(64 AS INT))
    ), ranked0 AS (
        SELECT dm.d, q.query_id, v.vec_id,
               row_number() OVER (
                   PARTITION BY dm.d, q.query_id
                   ORDER BY round(list_dot_product(v.ev[1:dm.d],
                                                   q.qv[1:dm.d])
                       / (sqrt(list_dot_product(v.ev[1:dm.d],
                                                v.ev[1:dm.d]))
                          * sqrt(list_dot_product(q.qv[1:dm.d],
                                                  q.qv[1:dm.d]))), 6)
                       DESC, v.vec_id
               ) AS r0
        FROM v CROSS JOIN q CROSS JOIN dims dm
        QUALIFY r0 <= 11
    ), topk AS (
        SELECT d, query_id, vec_id,
               row_number() OVER (PARTITION BY d, query_id
                   ORDER BY r0) AS rnk
        FROM ranked0 WHERE vec_id <> query_id
        QUALIFY rnk <= 10
    ), hits AS (
        SELECT t.d, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM topk t
        JOIN (SELECT query_id, vec_id FROM topk WHERE d = 64) gt
          ON t.query_id = gt.query_id AND t.vec_id = gt.vec_id
        GROUP BY t.d
    ), nq AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q
    )
    SELECT h.d AS dim, n.n_queries, h.n_hits,
           round(CAST(h.n_hits AS DOUBLE) / (n.n_queries * 10), 6)
               AS recall_at_10
    FROM hits h CROSS JOIN nq n ORDER BY dim
    """,
)
def embedding_matryoshka_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-truncation retrieval eval — how much recall@10
    survives serving only the first 8 or 16 of 64 embedding dimensions
    (the MRL deployment question: shorter prefixes = cheaper ANN tiers,
    this measures the quality bill).  Ground truth = the full-dim
    cosine top-10 on a bounded 8-query eval slice (the registry's
    fixed-slice discipline — eval cost never scales with the corpus);
    prefix rankings use the identical round-to-6dp-then-rank ordering
    with vec_id tie-breaks that made the ANN family driver-portable.
    Dot products fold in array order on both engines; the d = 64 row
    is the 1.0 sanity anchor."""
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    q = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    dims = spark.createDataFrame([(8,), (16,), (64,)], "d INT")

    def _dotp(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    ea = F.slice(F.col("ev"), F.lit(1), F.col("d"))
    qa = F.slice(F.col("qv"), F.lit(1), F.col("d"))
    cos = F.round(
        _dotp(ea, qa) / (F.sqrt(_dotp(ea, ea)) * F.sqrt(_dotp(qa, qa))),
        6,
    )
    w0 = Window.partitionBy("d", "query_id").orderBy(
        F.desc("_cos"), F.asc("vec_id")
    )
    ranked0 = (
        v.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(dims))
        .withColumn("_cos", cos)
        .withColumn("r0", F.row_number().over(w0))
        .filter(F.col("r0") <= 11)
    )
    wrnk = Window.partitionBy("d", "query_id").orderBy("r0")
    topk = (
        ranked0.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rnk", F.row_number().over(wrnk))
        .filter(F.col("rnk") <= 10)
        .select("d", "query_id", "vec_id")
    )
    topk = topk.localCheckpoint(eager=False)
    gt = topk.filter(F.col("d") == 64).select("query_id", "vec_id")
    hits = (
        topk.join(F.broadcast(gt), ["query_id", "vec_id"])
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    nq = q.count()
    return hits.select(
        F.col("d").alias("dim"),
        F.lit(nq).cast("bigint").alias("n_queries"),
        "n_hits",
        F.round(
            F.col("n_hits").cast("double") / F.lit(float(nq * 10)), 6
        ).alias("recall_at_10"),
    ).orderBy("dim")


# Published Shewhart control-chart constants for subgroup size n = 24
# (Montgomery, "Introduction to Statistical Quality Control", App. VI):
# A2 = 0.157, D3 = 0.451, D4 = 1.548.  Shared literals on both engines.
_SPC_A2 = "0.157"
_SPC_D3 = "0.451"
_SPC_D4 = "1.548"


@query(
    "events_spc_xbar_r",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), sub AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(MAX(x) - MIN(x) AS BIGINT) AS r
        FROM hourly GROUP BY day HAVING COUNT(*) = 24
    ), lim AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(sx) AS BIGINT) AS tsx,
               CAST(SUM(r) AS BIGINT) AS tr
        FROM sub
    ), cl AS (
        SELECT n_days,
               CAST(tsx AS DOUBLE) / (24 * n_days) AS center,
               CAST(tr AS DOUBLE) / n_days AS rbar
        FROM lim
    )
    SELECT s.day, s.n_obs,
           round(CAST(s.sx AS DOUBLE) / 24, 6) AS xbar,
           s.r,
           round(c.center, 6) AS center,
           round(c.center + {_SPC_A2} * c.rbar, 6) AS ucl_x,
           round(c.center - {_SPC_A2} * c.rbar, 6) AS lcl_x,
           round({_SPC_D4} * c.rbar, 6) AS ucl_r,
           round({_SPC_D3} * c.rbar, 6) AS lcl_r,
           CAST(CAST(s.sx AS DOUBLE) / 24
                    > c.center + {_SPC_A2} * c.rbar
                OR CAST(s.sx AS DOUBLE) / 24
                    < c.center - {_SPC_A2} * c.rbar AS BOOLEAN)
               AS x_out,
           CAST(CAST(s.r AS DOUBLE) > {_SPC_D4} * c.rbar
                OR CAST(s.r AS DOUBLE) < {_SPC_D3} * c.rbar AS BOOLEAN)
               AS r_out
    FROM sub s CROSS JOIN cl c ORDER BY s.day
    """,
)
def events_spc_xbar_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X-bar/R control chart over hourly event volumes —
    manufacturing's operational-monitoring workhorse applied to traffic:
    subgroup = one complete day of 24 hourly counts, center line and
    control limits from the grand mean and mean range with the
    PUBLISHED n=24 chart constants (A2/D3/D4 — shared literals on both
    engines), and per-day out-of-control flags for both the mean and
    the dispersion chart.  Everything is exact integers until the final
    divides; the flags compare identical IEEE trees, so even the
    booleans hash-match.  Two rollups, day-grain frames."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    sub = (
        hourly.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("x").cast("bigint").alias("sx"),
            (F.max("x") - F.min("x")).cast("bigint").alias("r"),
        )
        .filter(F.col("n_obs") == 24)
    )
    sub = sub.localCheckpoint(eager=False)
    lim = sub.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("sx").cast("bigint").alias("tsx"),
        F.sum("r").cast("bigint").alias("tr"),
    )
    a2 = F.lit(float(_SPC_A2))
    d3 = F.lit(float(_SPC_D3))
    d4 = F.lit(float(_SPC_D4))
    cl = lim.select(
        (F.col("tsx").cast("double") / (24 * F.col("n_days"))).alias(
            "center"
        ),
        (F.col("tr").cast("double") / F.col("n_days")).alias("rbar"),
    )
    xbar = F.col("sx").cast("double") / 24
    rr = F.col("r").cast("double")
    return (
        sub.crossJoin(F.broadcast(cl))
        .select(
            "day",
            "n_obs",
            F.round(xbar, 6).alias("xbar"),
            "r",
            F.round(F.col("center"), 6).alias("center"),
            F.round(F.col("center") + a2 * F.col("rbar"), 6).alias(
                "ucl_x"
            ),
            F.round(F.col("center") - a2 * F.col("rbar"), 6).alias(
                "lcl_x"
            ),
            F.round(d4 * F.col("rbar"), 6).alias("ucl_r"),
            F.round(d3 * F.col("rbar"), 6).alias("lcl_r"),
            (
                (xbar > F.col("center") + a2 * F.col("rbar"))
                | (xbar < F.col("center") - a2 * F.col("rbar"))
            ).alias("x_out"),
            (
                (rr > d4 * F.col("rbar")) | (rr < d3 * F.col("rbar"))
            ).alias("r_out"),
        )
        .orderBy("day")
    )



@query(
    "corpus_temperature_mixture",
    oracle="""
    WITH tok AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(trim(text),
                   '[ \\t\\n\\r\\f\\x0b]+'))) AS BIGINT) AS n_tokens
        FROM documents WHERE trim(text) <> ''
        GROUP BY source
    ), wt AS (
        SELECT source, n_tokens,
               CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS sq6
        FROM tok
    ), tot AS (
        SELECT CAST(SUM(sq6) AS HUGEINT) AS w,
               CAST(COUNT(*) AS BIGINT) AS ns
        FROM wt
    ), quota AS (
        SELECT s.source, s.n_tokens, s.sq6,
               CAST(1000000 * CAST(s.sq6 AS HUGEINT) AS HUGEINT) AS qn,
               CAST((1000000 * CAST(s.sq6 AS HUGEINT)) // t.w
                    AS BIGINT) AS base,
               CAST((1000000 * CAST(s.sq6 AS HUGEINT)) % t.w
                    AS HUGEINT) AS rem
        FROM wt s CROSS JOIN tot t
    ), left0 AS (
        SELECT CAST(1000000 - SUM(base) AS BIGINT) AS l FROM quota
    ), ranked AS (
        SELECT q.*, ROW_NUMBER() OVER (ORDER BY q.rem DESC, q.source)
                   AS rr
        FROM quota q
    )
    SELECT r.source, r.n_tokens,
           round(CAST(r.sq6 AS DOUBLE)
                 / CAST((SELECT w FROM tot) AS DOUBLE), 6)
               AS mix_weight,
           CAST(r.base + CASE WHEN r.rr <= (SELECT l FROM left0)
                              THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_tokens,
           round(CAST(r.base + CASE WHEN r.rr <= (SELECT l FROM left0)
                                    THEN 1 ELSE 0 END AS DOUBLE)
                 / CAST(r.n_tokens AS DOUBLE), 6) AS sampling_rate
    FROM ranked r ORDER BY r.source
    """,
)
def corpus_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled corpus mixture with an EXACT integer token
    budget — the mT5/data-mixing recipe: source weights proportional to
    (token count)^alpha with alpha = 0.5 (so sqrt — IEEE correctly
    rounded, then latticed to 1e-6 integers, never a libm pow), and a
    1M-token budget divided by HAMILTON (largest-remainder)
    APPORTIONMENT: floor quotas from integer division, the leftover
    seats assigned by exact remainder rank — the allocations sum to the
    budget EXACTLY, no float drift, the property a downstream sampler
    actually needs.  One token rollup to a |sources| frame; everything
    after is 25-row arithmetic."""
    dec = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = d.groupBy("source").agg(
        F.sum(
            F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f\x0b]+"))
        )
        .cast("bigint")
        .alias("n_tokens")
    )
    wt = tok.select(
        "source",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1e6, 0)
        .cast("bigint")
        .alias("sq6"),
    )
    wt = wt.localCheckpoint(eager=False)
    tot = wt.agg(F.sum(F.col("sq6").cast(dec)).cast(dec).alias("w"))
    quota = wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "sq6",
        (F.lit(1000000).cast(dec) * F.col("sq6").cast(dec))
        .cast(dec)
        .alias("qn"),
        F.expr(
            "CAST((CAST(1000000 AS decimal(38,0)) "
            "* CAST(sq6 AS decimal(38,0))) div w AS BIGINT)"
        ).alias("base"),
        F.expr(
            "(CAST(1000000 AS decimal(38,0)) "
            "* CAST(sq6 AS decimal(38,0))) % w"
        )
        .cast(dec)
        .alias("rem"),
        F.col("w"),
    )
    quota = quota.localCheckpoint(eager=False)
    left0 = quota.agg(
        (F.lit(1000000) - F.sum("base")).cast("bigint").alias("l")
    )
    wrr = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = quota.withColumn("rr", F.row_number().over(wrr))
    alloc = F.col("base") + F.when(
        F.col("rr") <= F.col("l"), 1
    ).otherwise(0)
    return (
        ranked.crossJoin(F.broadcast(left0))
        .select(
            "source",
            "n_tokens",
            F.round(
                F.col("sq6").cast("double") / F.col("w").cast("double"),
                6,
            ).alias("mix_weight"),
            alloc.cast("bigint").alias("alloc_tokens"),
            F.round(
                alloc.cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("sampling_rate"),
        )
        .orderBy("source")
    )



@query(
    "user_power_law_mle",
    oracle="""
    WITH act AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY user_id
    ), terms AS (
        SELECT x,
               CAST(round(ln(CAST(2 * x AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS l6
        FROM act
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(l6) AS BIGINT) AS sl6,
               CAST(MAX(x) AS BIGINT) AS x_max
        FROM terms
    )
    SELECT n AS n_users, x_max,
           round(1 + CAST(n AS DOUBLE)
                     / (CAST(sl6 AS DOUBLE) / 1e6), 6) AS alpha_hat,
           round((CAST(1 + CAST(n AS DOUBLE)
                       / (CAST(sl6 AS DOUBLE) / 1e6) AS DOUBLE) - 1)
                 / sqrt(CAST(n AS DOUBLE)), 6) AS alpha_se
    FROM m
    """,
)
def user_power_law_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law exponent of the user-activity distribution by
    the Clauset-Shalizi-Newman MLE — alpha = 1 + n / sum ln(x_i/(x_min
    - 1/2)) with x_min = 1, so each term is ln(2x) — the maximum-
    likelihood complement to the registry's OLS ``corpus_zipf_slope``
    (MLE is what the power-law literature actually trusts; OLS on
    log-log histograms is biased).  Each per-user ln lands on the 1e-6
    integer lattice BEFORE the cross-user sum (fleet transcendental
    rule); the standard error (alpha-1)/sqrt(n) is one literal tree.
    One grouped pass to |users|, one rollup."""
    e = _t(spark, sf_dir, "events")
    act = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    terms = act.select(
        "x",
        F.round(F.log((2 * F.col("x")).cast("double")) * F.lit(1e6), 0)
        .cast("bigint")
        .alias("l6"),
    )
    m = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l6").cast("bigint").alias("sl6"),
        F.max("x").cast("bigint").alias("x_max"),
    )
    alpha = 1 + F.col("n").cast("double") / (
        F.col("sl6").cast("double") / F.lit(1e6)
    )
    return m.select(
        F.col("n").alias("n_users"),
        "x_max",
        F.round(alpha, 6).alias("alpha_hat"),
        F.round(
            (alpha - 1) / F.sqrt(F.col("n").cast("double")), 6
        ).alias("alpha_se"),
    )


@query(
    "text_burrows_delta",
    oracle="""
    WITH words AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)),
                   '[ \\t\\n\\r\\f\\x0b]+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), wf AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM words GROUP BY source, w
    ), stot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM wf GROUP BY source
    ), topw AS (
        SELECT w FROM (
            SELECT w, CAST(SUM(c) AS BIGINT) AS tc,
                   ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS rnk
            FROM wf GROUP BY w
        ) WHERE rnk <= 50
    ), ns AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k FROM stot
    ), rel AS (
        SELECT st.source, tw.w,
               CAST(COALESCE(f.c, 0) AS DOUBLE) / st.t AS fr
        FROM stot st CROSS JOIN topw tw
        LEFT JOIN wf f ON f.source = st.source AND f.w = tw.w
    ), mu AS (
        SELECT r.w,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(round(r.fr * 1e9, 0) AS BIGINT)) AS sf9,
               SUM(CAST(round(r.fr * 1e9, 0) AS HUGEINT)
                   * CAST(round(r.fr * 1e9, 0) AS HUGEINT)) AS sff
        FROM rel r GROUP BY r.w
    ), z AS (
        SELECT r.source, r.w,
               (CAST(round(r.fr * 1e9, 0) AS DOUBLE) * m.k
                - CAST(m.sf9 AS DOUBLE))
               / sqrt(CAST(m.k AS DOUBLE) * CAST(m.sff AS DOUBLE)
                      - CAST(m.sf9 AS DOUBLE)
                        * CAST(m.sf9 AS DOUBLE)) AS zz
        FROM rel r JOIN mu m ON m.w = r.w
        WHERE m.k * m.sff > CAST(m.sf9 AS HUGEINT) * m.sf9
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(round(ABS(a.zz - b.zz) * 1e6, 0) AS BIGINT) AS d6
        FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST((2 * SUM(d6) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS delta_micros
    FROM pairs GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of sources — computational
    stylometry's standard authorship distance: z-score each of the top
    50 corpus words' relative frequencies across sources, then Delta =
    mean |z_a - z_b|.  Frequencies ride a 1e-9 integer lattice so the
    cross-source mean/variance moments are EXACT integers (scaled
    per-cell rounding); each z is one IEEE tree over those integers
    (sqrt correctly rounded, k*sff > sf9^2 guard drops zero-variance
    words identically); each |z_a - z_b| lands on the 1e-6 lattice
    before the cross-word mean.  Word frame is 50 rows x |sources|;
    the pair frame |sources|^2."""
    e = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    from high_throughput_etl_pipeline_spark.operators.text import (
        _lower_words,
    )

    dec = "decimal(38,0)"
    words = e.select(
        "source", F.explode(_lower_words(F.col("text"))).alias("w")
    )
    wf = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wf = wf.localCheckpoint(eager=False)
    stot = wf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    gw = wf.groupBy("w").agg(F.sum("c").cast("bigint").alias("tc"))
    topw = take_top_k(
        gw, [F.desc("tc"), F.asc("w")], 50, rank_col="rnk"
    ).select("w")
    rel = (
        stot.crossJoin(F.broadcast(topw))
        .join(wf, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("t")
            ).alias("fr"),
        )
    )
    f9 = F.round(F.col("fr") * F.lit(1e9), 0).cast("bigint")
    rel = rel.select("source", "w", "fr", f9.alias("f9"))
    rel = rel.localCheckpoint(eager=False)
    mu = rel.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("f9").cast("bigint").alias("sf9"),
        F.sum(F.col("f9").cast(dec) * F.col("f9")).cast(dec).alias("sff"),
    )
    z = (
        rel.join(F.broadcast(mu), "w")
        .filter(
            F.col("k").cast(dec) * F.col("sff")
            > F.col("sf9").cast(dec) * F.col("sf9")
        )
        .select(
            "source",
            "w",
            (
                (
                    F.col("f9").cast("double") * F.col("k")
                    - F.col("sf9").cast("double")
                )
                / F.sqrt(
                    F.col("k").cast("double")
                    * F.col("sff").cast("double")
                    - F.col("sf9").cast("double")
                      * F.col("sf9").cast("double")
                )
            ).alias("zz"),
        )
    )
    za, zb = z.alias("a"), z.alias("b")
    pairs = za.join(
        zb,
        (F.col("a.w") == F.col("b.w"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.round(
            F.abs(F.col("a.zz") - F.col("b.zz")) * F.lit(1e6), 0
        )
        .cast("bigint")
        .alias("d6"),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("d6").cast("bigint").alias("_sd6"),
        )
        .select(
            "source_a",
            "source_b",
            "n_words",
            # integer half-up mean in micros — the r10 form
            # round(sum/n/1e6, 6) is a mean-of-lattice decimal-tie
            # surface (exact tie whenever n is even and sum/(n/2) is
            # odd); pure integer division cannot diverge
            F.expr("(2 * _sd6 + n_words) div (2 * n_words)").alias(
                "delta_micros"
            ),
        )
        .orderBy("source_a", "source_b")
    )



@query(
    "corpus_dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_MINHASH_PAIRS_CTE},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node),
    sizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM cc GROUP BY cluster_id
    ),
    hist AS (
        SELECT sz AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY sz
        UNION ALL
        SELECT CAST(1 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
               - (SELECT CAST(COUNT(*) AS BIGINT) FROM cc)
    ),
    tot AS (
        SELECT CAST(SUM(cluster_size * n_clusters) AS BIGINT) AS nd
        FROM hist
    )
    SELECT h.cluster_size, CAST(SUM(h.n_clusters) AS BIGINT) AS n_clusters,
           CAST(SUM(h.cluster_size * h.n_clusters) AS BIGINT) AS n_docs,
           round(CAST(SUM(h.cluster_size * h.n_clusters) AS DOUBLE)
                 / CAST((SELECT nd FROM tot) AS DOUBLE), 6)
               AS doc_share
    FROM hist h GROUP BY h.cluster_size ORDER BY h.cluster_size
    """,
)
def corpus_dedup_cluster_sizes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup cluster-size distribution — the power-law histogram a
    data engineer reads before choosing a dedup keep-policy ("is the
    mass in pairs or in one giant template cluster?"): MinHash-banded
    Jaccard pairs → connected components → sizes → histogram, with
    UNCLUSTERED docs folded in as size-1 clusters so doc_share sums to
    exactly 1.  Reuses the driver-proven dedup_cc_clusters chain
    (banded candidates, min-label CC, recursive-CTE oracle replay);
    the histogram is |distinct sizes| rows."""
    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    )
    cc = dedup_clusters(pairs)
    cc = cc.localCheckpoint(eager=False)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    n_docs_total = d.count()
    n_clustered = cc.count()
    singles = spark.createDataFrame(
        [(1, n_docs_total - n_clustered)],
        "cluster_size BIGINT, n_clusters BIGINT",
    )
    hist = hist.unionByName(singles)
    tot = hist.agg(
        F.sum(F.col("cluster_size") * F.col("n_clusters"))
        .cast("bigint")
        .alias("nd")
    )
    return (
        hist.groupBy("cluster_size")
        .agg(
            F.sum("n_clusters").cast("bigint").alias("n_clusters"),
            F.sum(F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double")
                / F.col("nd").cast("double"),
                6,
            ).alias("doc_share"),
        )
        .orderBy("cluster_size")
    )



@query(
    "events_kruskal_wallis",
    oracle="""
    WITH base AS (
        SELECT event_type AS g,
               CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ), vals AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY v
    ), cumv AS (
        SELECT v, cnt,
               CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cb
        FROM vals
    ), r2v AS (
        SELECT v, cnt, 2 * cb + cnt + 1 AS r2
        FROM cumv
    ), per AS (
        SELECT b.g, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(r.r2) AS BIGINT) AS r2_j
        FROM base b JOIN r2v r ON r.v = b.v
        GROUP BY b.g
    ), tot AS (
        SELECT CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM per
    ), ties AS (
        SELECT CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
                    AS HUGEINT) AS t3
        FROM vals
    ), sfold AS (
        SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(CAST(CAST(r2_j AS HUGEINT) * r2_j AS DOUBLE)
                            / n_j ORDER BY g)),
                   (acc, x) -> acc + x) AS s
        FROM per
    )
    SELECT t.n, t.k,
           round(3 * f.s / (CAST(t.n AS DOUBLE) * (t.n + 1))
                 - 3 * (t.n + 1), 6) AS h_stat,
           round(1 - CAST((SELECT t3 FROM ties) AS DOUBLE)
                     / (CAST(t.n AS HUGEINT) * t.n * t.n - t.n), 6)
               AS tie_correction,
           round((3 * f.s / (CAST(t.n AS DOUBLE) * (t.n + 1))
                  - 3 * (t.n + 1))
                 / (1 - CAST((SELECT t3 FROM ties) AS DOUBLE)
                        / (CAST(t.n AS HUGEINT) * t.n * t.n - t.n)), 6)
               AS h_corrected
    FROM tot t CROSS JOIN sfold f
    """,
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test — do the event types draw `value` from
    the same distribution?  The k-sample non-parametric ANOVA that
    completes the registry's test family (Welch = parametric two-
    sample, Friedman = blocked ranks, this = independent k-sample
    ranks).  Midranks are EXACT INTEGERS computed on the distinct-VALUE
    frame (2·cum_before + cnt + 1 — never a row-level rank over the raw
    table: the rank frame is |distinct cents|, cumulated via
    ``ranking.global_cumsum``), per-group rank sums are integer, the
    5-element Σ R2²/n fold is ORDERED (sort_array/list_reduce — the
    proven cross-engine float fold), and the tie correction
    1 − Σ(t³−t)/(N³−N) is an exact rational."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    dec = "decimal(38,0)"
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    base = base.localCheckpoint(eager=False)
    vals = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cumv, _tot = global_cumsum(
        vals, [F.col("v").asc()], "cnt", cum_col="cum"
    )
    r2v = cumv.select(
        "v",
        "cnt",
        (
            2 * (F.col("cum").cast("bigint") - F.col("cnt"))
            + F.col("cnt")
            + 1
        ).alias("r2"),
    )
    per = (
        base.join(r2v.select("v", "r2"), "v")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_j"),
            F.sum("r2").cast("bigint").alias("r2_j"),
        )
    )
    per = per.localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ties = vals.agg(
        F.sum(
            F.col("cnt").cast(dec) * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        )
        .cast(dec)
        .alias("t3")
    )
    sfold = per.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "g",
                        (
                            (
                                F.col("r2_j").cast(dec) * F.col("r2_j")
                            ).cast("double")
                            / F.col("n_j")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["t"],
        ).alias("s")
    )
    nn = F.col("n").cast("double")
    h = 3 * F.col("s") / (nn * (F.col("n") + 1)) - 3 * (F.col("n") + 1)
    tc = 1 - F.col("t3").cast("double") / (
        F.col("n").cast(dec) * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    return (
        tot.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(sfold))
        .select(
            "n",
            "k",
            F.round(h, 6).alias("h_stat"),
            F.round(tc, 6).alias("tie_correction"),
            F.round(h / tc, 6).alias("h_corrected"),
        )
    )


@query(
    "events_negbin_fit",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM daily GROUP BY event_type
    ), fit AS (
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
               CAST(n * ss - s * s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                   AS var_c
        FROM m WHERE n > 1
    )
    SELECT event_type, n_days,
           round(mean_c, 6) AS mean_count,
           round(var_c, 6) AS var_count,
           round(var_c / mean_c, 6) AS dispersion_index,
           CAST(var_c > mean_c AS BOOLEAN) AS overdispersed,
           CASE WHEN var_c > mean_c
                THEN round(mean_c * mean_c / (var_c - mean_c), 6)
                ELSE 0.0 END AS nb_r,
           CASE WHEN var_c > mean_c
                THEN round(mean_c / var_c, 6) ELSE 0.0 END AS nb_p
    FROM fit ORDER BY event_type
    """,
)
def events_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of daily event counts by method of
    moments — the overdispersion test every capacity model needs before
    assuming Poisson (dispersion index var/mean > 1 means a Poisson
    model underestimates tail traffic): r = m²/(v−m), p = m/v, with the
    degenerate cases (underdispersed, single day) pinned to 0.0
    identically on both engines.  Exact integer moments, IEEE-only
    float tail, |types|-row output."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("ss"),
    )
    n, sm, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = sm.cast("double") / n.cast("double")
    var = (n * ss - sm * sm).cast("double") / (
        n.cast("double") * (n - 1).cast("double")
    )
    return (
        m.filter(n > 1)
        .select(
            "event_type",
            n.cast("bigint").alias("n_days"),
            F.round(mean, 6).alias("mean_count"),
            F.round(var, 6).alias("var_count"),
            F.round(var / mean, 6).alias("dispersion_index"),
            (var > mean).alias("overdispersed"),
            F.when(
                var > mean, F.round(mean * mean / (var - mean), 6)
            )
            .otherwise(F.lit(0.0))
            .alias("nb_r"),
            F.when(var > mean, F.round(mean / var, 6))
            .otherwise(F.lit(0.0))
            .alias("nb_p"),
        )
        .orderBy("event_type")
    )


@query(
    "events_hill_tail_index",
    oracle="""
    WITH base AS (
        SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events WHERE value > 0
    ), topk AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, event_id) AS rn
        FROM base QUALIFY rn <= 101
    ), ref AS (
        SELECT v AS v_ref FROM topk WHERE rn = 101
    ), terms AS (
        SELECT CAST(round(ln(CAST(t.v AS DOUBLE) / r.v_ref) * 1e6, 0)
                    AS BIGINT) AS l6
        FROM topk t CROSS JOIN ref r WHERE t.rn <= 100
    ), m AS (
        SELECT CAST(SUM(l6) AS BIGINT) AS sl6,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM terms
    )
    SELECT m.k, r.v_ref,
           (2 * m.sl6 + m.k) // (2 * m.k) AS hill_micros,
           (2 * m.k * 1000000000000 + m.sl6) // (2 * m.sl6)
               AS alpha_micros
    FROM m CROSS JOIN ref r WHERE m.k > 0 AND m.sl6 > 0
    """,
)
def events_hill_tail_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hill estimator of the value distribution's tail index — the EVT
    order-statistics companion to the registry's POT and Gumbel fits
    (alpha ~ 1/H answers "how heavy is the tail" without choosing a
    threshold): H = (1/k) Σ ln(x_(i)/x_(k+1)) over the top k = 100
    order statistics.  The top-(k+1) selection rides
    ``ranking.take_top_k`` (TakeOrdered — never a global sort) with an
    event_id tie-break; tied boundary values make the selected VALUE
    multiset unique even when row choice isn't; each of the 100 ln
    terms lands on the 1e-6 lattice before the sum."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    base = e.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    topk = take_top_k(
        base, [F.desc("v"), F.asc("event_id")], 101, rank_col="rn"
    )
    topk = topk.localCheckpoint(eager=False)
    ref = topk.filter(F.col("rn") == 101).select(
        F.col("v").alias("v_ref")
    )
    terms = (
        topk.filter(F.col("rn") <= 100)
        .crossJoin(F.broadcast(ref))
        .select(
            F.round(
                F.log(F.col("v").cast("double") / F.col("v_ref"))
                * F.lit(1e6),
                0,
            )
            .cast("bigint")
            .alias("l6")
        )
    )
    m = terms.agg(
        F.sum("l6").cast("bigint").alias("sl6"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        m.crossJoin(F.broadcast(ref))
        .filter((F.col("k") > 0) & (F.col("sl6") > 0))
        .select(
            "k",
            "v_ref",
            # integer half-up means/ratios in micros — the prior
            # round(sum/k/1e6, 6) / round(k*1e6/sl6, 6) forms are
            # mean-of-lattice decimal-tie surfaces (hazard defect
            # class); integer division cannot diverge across engines
            F.expr("(2 * sl6 + k) div (2 * k)").alias("hill_micros"),
            F.expr(
                "(2 * k * 1000000000000 + sl6) div (2 * sl6)"
            ).alias("alpha_micros"),
        )
    )



@query(
    "events_odds_ratio",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT CAST(SUM(CASE WHEN variant = 0 AND conv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN variant = 0 AND conv = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN variant = 1 AND conv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN variant = 1 AND conv = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM u
    ), calc AS (
        SELECT a, b, c, d,
               CAST((2 * a + 1) * CAST(2 * d + 1 AS HUGEINT) AS DOUBLE)
                   / CAST((2 * b + 1) * CAST(2 * c + 1 AS HUGEINT)
                          AS DOUBLE) AS odds,
               CAST(round(ln(
                   CAST((2 * a + 1) * CAST(2 * d + 1 AS HUGEINT)
                        AS DOUBLE)
                   / CAST((2 * b + 1) * CAST(2 * c + 1 AS HUGEINT)
                          AS DOUBLE)) * 1e6, 0) AS BIGINT) AS l6,
               sqrt(2.0 / (2 * a + 1) + 2.0 / (2 * b + 1)
                    + 2.0 / (2 * c + 1) + 2.0 / (2 * d + 1)) AS se
        FROM cells
    )
    SELECT a AS conv_a, b AS nonconv_a, c AS conv_b, d AS nonconv_b,
           round(odds, 6) AS odds_ratio,
           round(CAST(l6 AS DOUBLE) / 1e6, 6) AS ln_or,
           round(se, 6) AS se_ln_or,
           round(CAST(l6 AS DOUBLE) / 1e6 - 1.959964 * se, 6)
               AS ci95_lo_ln,
           round(CAST(l6 AS DOUBLE) / 1e6 + 1.959964 * se, 6)
               AS ci95_hi_ln
    FROM calc
    """,
)
def events_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of purchase conversion between the two user-parity
    variants with the Woolf logit 95% interval — epidemiology's 2×2
    primitive next to the Wilson-interval A/B readout: Haldane +1/2
    smoothing kept integral by doubling ((2a+1)(2d+1)/(2b+1)(2c+1) is
    an exact rational), the single ln latticed at 1e-6 BEFORE any
    reuse, the standard error an exact-rational sum under one sqrt,
    and the interval reported in LOG space (no exp chain — the repo's
    transcendental discipline).  z = 1.959964 is a shared literal.
    One per-user rollup, a 4-cell frame after."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    cells = u.agg(
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("conv") == 1), 1)
            .otherwise(0)
        ).cast("bigint").alias("a"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("conv") == 0), 1)
            .otherwise(0)
        ).cast("bigint").alias("b"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("conv") == 1), 1)
            .otherwise(0)
        ).cast("bigint").alias("c"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("conv") == 0), 1)
            .otherwise(0)
        ).cast("bigint").alias("d"),
    )
    num = ((2 * F.col("a") + 1).cast(dec) * (2 * F.col("d") + 1)).cast(
        "double"
    )
    den = ((2 * F.col("b") + 1).cast(dec) * (2 * F.col("c") + 1)).cast(
        "double"
    )
    odds = num / den
    l6 = F.round(F.log(odds) * F.lit(1e6), 0).cast("bigint")
    se = F.sqrt(
        2.0 / (2 * F.col("a") + 1)
        + 2.0 / (2 * F.col("b") + 1)
        + 2.0 / (2 * F.col("c") + 1)
        + 2.0 / (2 * F.col("d") + 1)
    )
    z = F.lit(1.959964)
    lor = l6.cast("double") / F.lit(1e6)
    return cells.select(
        F.col("a").alias("conv_a"),
        F.col("b").alias("nonconv_a"),
        F.col("c").alias("conv_b"),
        F.col("d").alias("nonconv_b"),
        F.round(odds, 6).alias("odds_ratio"),
        F.round(lor, 6).alias("ln_or"),
        F.round(se, 6).alias("se_ln_or"),
        F.round(lor - z * se, 6).alias("ci95_lo_ln"),
        F.round(lor + z * se, 6).alias("ci95_hi_ln"),
    )


@query(
    "classifier_mcc",
    oracle=f"""
    WITH {{score_cte}}, mm AS (
        SELECT MIN(sv) AS mn, MAX(sv) AS mx FROM s
    ), pred AS (
        SELECT CASE WHEN ((sv - mn) * 10) // (mx - mn + 1) >= 5
                    THEN 1 ELSE 0 END AS yhat,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM s CROSS JOIN mm
    ), cm AS (
        SELECT CAST(SUM(yhat * y) AS BIGINT) AS tp,
               CAST(SUM(yhat * (1 - y)) AS BIGINT) AS fp,
               CAST(SUM((1 - yhat) * y) AS BIGINT) AS fn,
               CAST(SUM((1 - yhat) * (1 - y)) AS BIGINT) AS tn
        FROM pred
    )
    SELECT tp, fp, fn, tn,
           round(CAST(CAST(tp AS HUGEINT) * tn
                      - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                 / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
                             * (tn + fp) * (tn + fn) AS DOUBLE)), 6)
               AS mcc,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
               AS accuracy
    FROM cm
    """.format(score_cte=_clf_score_cte()),
)
def classifier_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the hashed linear classifier
    thresholded at the top half of its score range (bin >= 5 of 10 —
    the same deterministic binning the WOE/KS/gains family uses) —
    the single-number confusion summary that stays honest under class
    imbalance where accuracy lies.  Exact integer confusion cells, the
    numerator and the four marginal products in HUGEINT/decimal38
    (they pass 2^63 at scale), one sqrt, one divide."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    dec = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wgt = hashed_feature_weights(spark, n_features=4096, salt="w")
    scored = linear_quality_score(d, wgt, n_features=4096).select(
        F.round(F.col("score") * 1e6, 0).cast("bigint").alias("sv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    mm = scored.agg(F.min("sv").alias("mn"), F.max("sv").alias("mx"))
    pred = scored.crossJoin(F.broadcast(mm)).select(
        F.when(
            F.expr("((sv - mn) * 10) div (mx - mn + 1)") >= 5, 1
        )
        .otherwise(0)
        .alias("yhat"),
        "y",
    )
    cm = pred.agg(
        F.sum(F.col("yhat") * F.col("y")).cast("bigint").alias("tp"),
        F.sum(F.col("yhat") * (1 - F.col("y")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("yhat")) * F.col("y"))
        .cast("bigint")
        .alias("fn"),
        F.sum((1 - F.col("yhat")) * (1 - F.col("y")))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (tp.cast(dec) * tn - fp.cast(dec) * fn).cast("double")
            / F.sqrt(
                (
                    (tp + fp).cast(dec)
                    * (tp + fn)
                    * (tn + fp)
                    * (tn + fn)
                ).cast("double")
            ),
            6,
        ).alias("mcc"),
        F.round(
            (tp + tn).cast("double") / (tp + fp + fn + tn), 6
        ).alias("accuracy"),
    )



@query(
    "multimodal_ppm_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               ('0x' || substr(md5('ppm-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 256 AS s
        FROM documents
    ), gx AS (
        SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS x
    ), gy AS (
        SELECT CAST(unnest(range(0, 6)) AS BIGINT) AS y
    ), px AS (
        SELECT b.doc_id, gx.x, gy.y,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 7)
                + 2654435761 * (gx.x + 17 * gy.y)) % 256 AS r,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 8)
                + 2654435761 * (gx.x + 17 * gy.y + 31)) % 256 AS g,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 9)
                + 2654435761 * (gx.x + 17 * gy.y + 62)) % 256 AS bl
        FROM base b CROSS JOIN gx CROSS JOIN gy
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(r) AS BIGINT) AS sum_r,
               CAST(SUM(g) AS BIGINT) AS sum_g,
               CAST(SUM(bl) AS BIGINT) AS sum_b
        FROM px GROUP BY doc_id
    ), edge AS (
        SELECT p.doc_id,
               CAST(SUM(ABS(n.r - p.r)) AS BIGINT) AS edge_energy
        FROM px p JOIN px n
          ON n.doc_id = p.doc_id AND n.y = p.y AND n.x = p.x + 1
        GROUP BY p.doc_id
    )
    SELECT a.doc_id AS media_id, CAST(8 AS INT) AS width,
           CAST(6 AS INT) AS height,
           a.sum_r, a.sum_g, a.sum_b, e.edge_energy,
           TRUE AS decode_ok,
           round(CAST(a.sum_r + a.sum_g + a.sum_b AS DOUBLE)
                 / (3 * 48 * 255), 6) AS brightness
    FROM agg a JOIN edge e USING (doc_id)
    ORDER BY media_id
    """,
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end and value-checked — the image twin
    of ``multimodal_wav_decode``: a synth stage writes genuine binary
    PPM (P6) payloads into a binary column (real header, real RGB24
    raster, pixels from a closed-form integer formula keyed by doc_id),
    then ``extract_ppm_features`` PARSES those bytes with a pure-stdlib
    decoder behind the Arrow ``mapInPandas`` boundary and computes
    per-channel brightness sums and horizontal-gradient edge energy
    from the DECODED pixels.  The oracle never sees a PPM byte — it
    replays the pixel formula over an (x, y) grid — so a hash match
    proves header parse + raster decode + pixel DSP are exact.  This
    retires the image-decode stub for uncompressed formats; JPEG/PNG
    remain documented library-blocked stubs.  Decode cost is
    Arrow-amortized; the rollup is one keyed pass."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        extract_ppm_features,
        make_ppm_table,
    )

    d = _t(spark, sf_dir, "documents")
    media = make_ppm_table(d, width=8, height=6)
    feats = extract_ppm_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "edge_energy",
        "decode_ok",
        F.round(
            (
                F.col("sum_r") + F.col("sum_g") + F.col("sum_b")
            ).cast("double")
            / F.lit(3 * 48 * 255),
            6,
        ).alias("brightness"),
    ).orderBy("media_id")


@query(
    "multimodal_bmp_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               ('0x' || substr(md5('bmp-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 256 AS s
        FROM documents
    ), gx AS (
        SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS x
    ), gy AS (
        SELECT CAST(unnest(range(0, 7)) AS BIGINT) AS y
    ), px AS (
        SELECT b.doc_id, gx.x, gy.y,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 7)
                + 2654435761 * (gx.x + 17 * gy.y)) % 256 AS r,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 8)
                + 2654435761 * (gx.x + 17 * gy.y + 31)) % 256 AS g,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 9)
                + 2654435761 * (gx.x + 17 * gy.y + 62)) % 256 AS bl
        FROM base b CROSS JOIN gx CROSS JOIN gy
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(r) AS BIGINT) AS sum_r,
               CAST(SUM(g) AS BIGINT) AS sum_g,
               CAST(SUM(bl) AS BIGINT) AS sum_b
        FROM px GROUP BY doc_id
    ), edge AS (
        SELECT p.doc_id,
               CAST(SUM(ABS(n.r - p.r)) AS BIGINT) AS vedge_energy
        FROM px p JOIN px n
          ON n.doc_id = p.doc_id AND n.x = p.x AND n.y = p.y + 1
        GROUP BY p.doc_id
    )
    SELECT a.doc_id AS media_id, CAST(10 AS INT) AS width,
           CAST(7 AS INT) AS height,
           a.sum_r, a.sum_g, a.sum_b, e.vedge_energy,
           TRUE AS decode_ok,
           (2000000 * (a.sum_r + a.sum_g + a.sum_b) + 53550) // 107100
               AS brightness_ppm
    FROM agg a JOIN edge e USING (doc_id)
    ORDER BY media_id
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Windows-BMP decode, end to end and value-checked — the
    third stdlib decoder after WAV (RIFF/PCM16) and PPM (P6): a synth
    stage writes genuine 24-bit BI_RGB BMP payloads into a binary
    column (real little-endian file + BITMAPINFOHEADER via ``struct``,
    BGR raster stored bottom-up with 4-byte row padding — the 10×7
    grid pads every 30-byte row to 32), then ``extract_bmp_features``
    PARSES those bytes behind the Arrow ``mapInPandas`` boundary and
    computes per-channel sums plus VERTICAL-gradient edge energy from
    the decoded top-down RGB pixels.  The oracle never sees a BMP byte
    — it replays the pixel formula over the (x, y) grid — so a hash
    match proves header parse + row flip + BGR swap + padding walk are
    exact.  The vertical gradient is orthogonal to the PPM query's
    horizontal one, so the value surface is this decoder's own.
    brightness_ppm is integer half-up parts-per-million (decimal-tie
    discipline).  Decode cost is Arrow-amortized; the rollup is one
    keyed pass."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        extract_bmp_features,
        make_bmp_table,
    )

    d = _t(spark, sf_dir, "documents")
    media = make_bmp_table(d, width=10, height=7)
    feats = extract_bmp_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "vedge_energy",
        "decode_ok",
        F.expr(
            "(2000000 * (sum_r + sum_g + sum_b) + 53550) div 107100"
        ).alias("brightness_ppm"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# round-10 session-2 additions: labeled-retrieval MAP eval, IPF mixture
# raking, feature-hashing vectorizer audit, Page–Hinkley drift detection,
# Markov stationary distribution.
# ---------------------------------------------------------------------------

# Truncated average precision on the LCM(1..10)=2520 lattice: P@k·2520 =
# hits@k·(2520/k) is an exact integer for every k ≤ 10, so AP@10 is ONE
# exact-integer sum followed by one IEEE division — no float accumulation
# order to disagree on.  Shared verbatim with the oracle.
_AP_LCM = 2520


def _map_eval_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              e -> CAST(round(e * 1000) AS BIGINT)) AS vi
        FROM embeddings
    ), c AS (
        SELECT vec_id, label, vi,
               list_sum(list_transform(vi, x -> x * x)) AS ssq
        FROM v
    ), q AS (
        SELECT vec_id AS query_id, label AS qlabel, vi AS qvi
        FROM v WHERE vec_id < 20
    ), rel_tot AS (
        SELECT q.query_id,
               CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM q JOIN c ON c.label = q.qlabel AND c.vec_id <> q.query_id
        GROUP BY q.query_id
    ), ranked AS (
        SELECT q.query_id, q.qlabel, c.vec_id,
               CASE WHEN c.label = q.qlabel THEN 1 ELSE 0 END AS rel,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY CAST(list_sum(list_transform(
                                generate_series(1, len(c.vi)),
                                i -> c.vi[i] * q.qvi[i])) AS DOUBLE)
                            / sqrt(CAST(c.ssq AS DOUBLE)) DESC,
                            c.vec_id
               ) AS r
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ), hits AS (
        SELECT query_id, qlabel, r, rel,
               SUM(rel) OVER (
                   PARTITION BY query_id ORDER BY r
                   ROWS UNBOUNDED PRECEDING
               ) AS hits_k
        FROM ranked WHERE r <= 10
    ), ap AS (
        SELECT query_id, qlabel,
               CAST(SUM(CASE WHEN rel = 1
                             THEN hits_k * ({_AP_LCM} / r)
                             ELSE 0 END) AS BIGINT) AS ap_scaled,
               CAST(SUM(rel) AS BIGINT) AS rel_at_10
        FROM hits GROUP BY query_id, qlabel
    ), rprec AS (
        SELECT rk.query_id,
               CAST(SUM(rk.rel) AS BIGINT) AS rel_at_r
        FROM ranked rk
        JOIN rel_tot rt ON rk.query_id = rt.query_id
        WHERE rk.r <= rt.n_rel
        GROUP BY rk.query_id
    )
    SELECT a.query_id, a.qlabel AS label, rt.n_rel, a.rel_at_10,
           round(a.rel_at_10 / 10.0, 6) AS p_at_10,
           round(CAST(a.ap_scaled AS DOUBLE)
                 / CAST({_AP_LCM} * LEAST(rt.n_rel, 10) AS DOUBLE), 6)
               AS ap_at_10,
           round(CAST(rp.rel_at_r AS DOUBLE)
                 / CAST(rt.n_rel AS DOUBLE), 6) AS r_precision
    FROM ap a
    JOIN rel_tot rt ON a.query_id = rt.query_id
    JOIN rprec rp ON a.query_id = rp.query_id
    ORDER BY a.query_id
    """


@query("ranker_map_eval", oracle=_map_eval_oracle())
def ranker_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled retrieval evaluation — truncated MAP (AP@10),
    precision@10, and R-precision per query, with relevance = "shares
    the query's class label" (the standard eval when a corpus carries
    labels rather than graded judgments; complements ann_recall_eval,
    whose ground truth is the exact retrieval itself).  The ranking is
    brute-force cosine on the 1e3 integer-embedding lattice: the dot
    product is an exact BIGINT, the candidate norm is one IEEE sqrt of
    an exact integer, and the per-query order is therefore bit-identical
    on both engines (ties broken by vec_id).  AP@10 avoids float
    accumulation order entirely: P@k·2520 is an exact integer for every
    k ≤ 10 (2520 = lcm 1..10), so the AP numerator is an integer sum
    and the metric is one final division.  Cost: |Q| = 20 bounded
    queries × N candidates — the documented brute-force eval slice (the
    serving path is the IVF family); the window partitions by query."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x * 1000).cast("bigint"),
        ).alias("vi"),
    )
    c = v.select(
        "vec_id",
        "label",
        "vi",
        F.aggregate(
            F.transform(F.col("vi"), lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("ssq"),
    )
    q = v.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vi").alias("qvi"),
    )
    pairs = c.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with("vi", "qvi", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        "qlabel",
        "vec_id",
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias(
            "rel"
        ),
        (dot.cast("double") / F.sqrt(F.col("ssq").cast("double"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    ranked = scored.withColumn("r", F.row_number().over(w)).select(
        "query_id", "qlabel", "vec_id", "rel", "r"
    )
    rel_tot = (
        scored.filter(F.col("rel") == 1)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    wr = (
        Window.partitionBy("query_id")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = ranked.filter(F.col("r") <= 10).withColumn(
        "hits_k", F.sum("rel").over(wr)
    )
    ap = hits.groupBy("query_id", "qlabel").agg(
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.col("hits_k") * (_AP_LCM / F.col("r")).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ap_scaled"),
        F.sum("rel").cast("bigint").alias("rel_at_10"),
    )
    rprec = (
        ranked.join(F.broadcast(rel_tot), "query_id")
        .filter(F.col("r") <= F.col("n_rel"))
        .groupBy("query_id")
        .agg(F.sum("rel").cast("bigint").alias("rel_at_r"))
    )
    return (
        ap.join(F.broadcast(rel_tot), "query_id")
        .join(F.broadcast(rprec), "query_id")
        .select(
            "query_id",
            F.col("qlabel").alias("label"),
            "n_rel",
            "rel_at_10",
            F.round(F.col("rel_at_10") / 10.0, 6).alias("p_at_10"),
            F.round(
                F.col("ap_scaled").cast("double")
                / (F.lit(_AP_LCM) * F.least(F.col("n_rel"), F.lit(10)))
                .cast("double"),
                6,
            ).alias("ap_at_10"),
            F.round(
                F.col("rel_at_r").cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ).alias("r_precision"),
        )
        .orderBy("query_id")
    )


def _ipf_oracle() -> str:
    # three row+column raking iterations, unrolled; weights live on the
    # 1e6 integer-micros lattice between steps so every cross-cell sum
    # is exact and the one ×/÷ chain per step is IEEE-identical
    steps = []
    prev = "w0"
    for it in range(3):
        rs, cs = f"r{it}", f"c{it}"
        nxt_r, nxt_c = f"wr{it}", f"w{it + 1}"
        steps.append(f"""
    {rs} AS (
        SELECT lang, SUM(w) AS rs FROM {prev} GROUP BY lang
    ), {nxt_r} AS (
        SELECT p.lang, p.source, p.n,
               CAST(round(CAST(p.w AS DOUBLE) * t.row_target
                          / CAST(r.rs AS DOUBLE) * 1e6, 0) AS BIGINT) AS w
        FROM {prev} p JOIN {rs} r ON p.lang = r.lang CROSS JOIN tgt t
    ), {cs} AS (
        SELECT source, SUM(w) AS cs FROM {nxt_r} GROUP BY source
    ), {nxt_c} AS (
        SELECT p.lang, p.source, p.n,
               CAST(round(CAST(p.w AS DOUBLE) * t.col_target
                          / CAST(c.cs AS DOUBLE) * 1e6, 0) AS BIGINT) AS w
        FROM {nxt_r} p JOIN {cs} c ON p.source = c.source CROSS JOIN tgt t
    )""")
        prev = f"w{it + 1}"
    chain = ",".join(steps)
    return f"""
    WITH cell AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ), tgt AS (
        SELECT CAST(SUM(n) AS DOUBLE) / COUNT(DISTINCT lang) AS row_target,
               CAST(SUM(n) AS DOUBLE) / COUNT(DISTINCT source) AS col_target
        FROM cell
    ), w0 AS (
        SELECT lang, source, n, n * 1000000 AS w FROM cell
    ),{chain}
    SELECT lang, source, n AS n_docs,
           w AS weight_micros,
           (2 * w + n) // (2 * n) AS ratio_micros
    FROM {prev} ORDER BY lang, source
    """


@query("corpus_ipf_mixture", oracle=_ipf_oracle())
def corpus_ipf_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the corpus mixture —
    rebalance the (lang × source) contingency table to uniform language
    AND source margins simultaneously, the standard survey-statistics
    answer to "what per-cell resampling ratios hit both target mixes at
    once" (temperature sampling — corpus_temperature_mixture — balances
    one margin; IPF balances two).  Three row+column Sinkhorn iterations
    over the post-agg cell frame; between steps every weight is rounded
    to the 1e6 integer-micros lattice, so margin sums are EXACT integer
    aggregations (no float accumulation order anywhere) and each scale
    step is one ×, one ÷, one ×1e6 round — IEEE-identical on both
    engines.  The cell frame is |langs|·|sources| rows regardless of
    corpus size; margins are broadcast back, so at 100 TB the cost is
    one grouped count of the documents table."""
    cell = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tgt = cell.agg(
        (
            F.sum("n").cast("double") / F.countDistinct("lang")
        ).alias("row_target"),
        (
            F.sum("n").cast("double") / F.countDistinct("source")
        ).alias("col_target"),
    )
    w = cell.select(
        "lang", "source", "n", (F.col("n") * 1000000).alias("w")
    ).join(F.broadcast(tgt))
    for _ in range(3):
        rs = w.groupBy("lang").agg(F.sum("w").alias("rs"))
        w = (
            w.join(F.broadcast(rs), "lang")
            .withColumn(
                "w",
                F.round(
                    F.col("w").cast("double")
                    * F.col("row_target")
                    / F.col("rs").cast("double")
                    * 1e6,
                    0,
                ).cast("bigint"),
            )
            .drop("rs")
        )
        cs = w.groupBy("source").agg(F.sum("w").alias("cs"))
        w = (
            w.join(F.broadcast(cs), "source")
            .withColumn(
                "w",
                F.round(
                    F.col("w").cast("double")
                    * F.col("col_target")
                    / F.col("cs").cast("double")
                    * 1e6,
                    0,
                ).cast("bigint"),
            )
            .drop("cs")
        )
    return w.select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        # the weight already lives on the integer micros lattice —
        # hash it directly; round(w/1e6, 4) was a decimal-tie surface
        # (exact tie whenever w % 100 == 50, the hazard defect class)
        F.col("w").alias("weight_micros"),
        F.expr("(2 * w + n) div (2 * n)").alias("ratio_micros"),
    ).orderBy("lang", "source")


@query(
    "text_feature_hashing",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ')) AS token
        FROM documents WHERE trim(text) <> ''
    ), tc AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks WHERE token <> '' GROUP BY token
    ), hashed AS (
        SELECT token, cnt,
               ('0x' || substr(md5('fh-v1:' || token), 18, 15))::BIGINT
                   % 64 AS bucket,
               CASE WHEN ('0x' || substr(md5('fhs-v1:' || token), 18, 15))
                             ::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sign
        FROM tc
    ), top AS (
        SELECT bucket, token AS top_token, cnt AS top_cnt
        FROM (
            SELECT bucket, token, cnt,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY cnt DESC, token
                   ) AS rn
            FROM hashed
        ) WHERE rn = 1
    )
    SELECT h.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(h.cnt) AS BIGINT) AS total_cnt,
           CAST(SUM(h.sign * h.cnt) AS BIGINT) AS signed_sum,
           MAX(t.top_token) AS top_token,
           MAX(t.top_cnt) AS top_cnt
    FROM hashed h JOIN top t ON h.bucket = t.bucket
    GROUP BY h.bucket ORDER BY h.bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer audit — the 64-bucket signed feature
    hash (Weinberger et al.'s unbiased variant: a second hash supplies
    the ±1 sign, so collisions cancel in expectation) plus the collision
    report a pipeline checks before committing to a hash width: distinct
    tokens per bucket, total mass, the signed feature value, and the
    dominant token each bucket's value actually represents.  Both hash
    lanes are the repo's portable md5-low-60-bit integer (engine-
    independent by construction); everything downstream is exact-integer
    grouped aggregation.  The token-count frame is vocabulary-sized, so
    at 100 TB the only corpus-scale stage is the one explode + grouped
    count every text query already pays; the bucket report is 64 rows."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        md5_64,
        norm_words,
    )

    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    tc = (
        d.select(F.explode(norm_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    hashed = tc.select(
        "token",
        "cnt",
        F.pmod(
            md5_64(F.concat(F.lit("fh-v1:"), F.col("token"))), F.lit(64)
        ).alias("bucket"),
        F.when(
            F.pmod(
                md5_64(F.concat(F.lit("fhs-v1:"), F.col("token"))),
                F.lit(2),
            )
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sign"),
    )
    wtop = Window.partitionBy("bucket").orderBy(
        F.desc("cnt"), F.asc("token")
    )
    top = (
        hashed.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "bucket",
            F.col("token").alias("top_token"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("total_cnt"),
            F.sum(F.col("sign") * F.col("cnt"))
            .cast("bigint")
            .alias("signed_sum"),
        )
        .join(F.broadcast(top), "bucket")
        .select(
            "bucket",
            "n_tokens",
            "total_cnt",
            "signed_sum",
            "top_token",
            "top_cnt",
        )
        .orderBy("bucket")
    )


# Page–Hinkley shared expression: m' given acc=[sx,t,m,minm,alarms,first]
# and the incoming observation x — repeated VERBATIM wherever the step
# needs it (no lets in SQL lambdas), so both engines compute the same
# IEEE chain.  delta=0.5 drift allowance, lambda=10.0 alarm threshold.
_PH_DELTA = "0.5"
_PH_LAMBDA = "10.0"


def _ph_oracle() -> str:
    m = f"(acc[3] + (x[1] - (acc[1] + x[1]) / (acc[2] + 1.0) - {_PH_DELTA}))"
    return f"""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) * 100 AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type, list(x ORDER BY day) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY event_type
    ), fold AS (
        SELECT event_type, n_days,
               list_reduce(
                   list_prepend(
                       CAST([0, 0, 0, 0, 0, 0] AS DOUBLE[]),
                       list_transform(xs,
                           v -> [v, CAST(0.0 AS DOUBLE),
                                 CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                                 CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
                   (acc, x) -> [
                       acc[1] + x[1],
                       acc[2] + 1.0,
                       {m},
                       LEAST(acc[4], {m}),
                       acc[5] + CASE WHEN {m} - LEAST(acc[4], {m})
                                          > {_PH_LAMBDA}
                                     THEN 1.0 ELSE 0.0 END,
                       CASE WHEN {m} - LEAST(acc[4], {m}) > {_PH_LAMBDA}
                                 AND acc[6] = 0.0
                            THEN acc[2] + 1.0 ELSE acc[6] END
                   ]
               ) AS st
        FROM s
    )
    SELECT event_type, n_days,
           CAST(st[5] AS BIGINT) AS n_alarms,
           CAST(st[6] AS BIGINT) AS first_alarm_day,
           round(st[3], 6) AS m_final,
           round(st[4], 6) AS min_m,
           round(st[3] - st[4], 6) AS ph_final
    FROM fold ORDER BY event_type
    """


@query("events_page_hinkley", oracle=_ph_oracle())
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley drift detector over each event type's daily-mean
    value series — the sequential change-of-mean test a training-data
    pipeline runs on incoming feature distributions (complements
    events_changepoint's retrospective split and events_cusum_alarms'
    known-target CUSUM: PH needs NO reference mean — it tracks the
    running mean itself).  m_t accumulates (x_t − x̄_t − δ); an alarm
    fires when m_t rises more than λ above its running minimum.  The
    recurrence is inherently ordered, so it rides the ordered-fold
    discipline: one grouped agg to the |types × days| frame, then ONE
    F.aggregate over the sorted series with a DOUBLE[6] accumulator
    [Σx, t, m, min_m, alarms, first_alarm] — the m' expression is
    repeated verbatim in every slot on both engines (IEEE +−×÷ and
    LEAST only), so the fold is bit-identical.  The fold touches
    |days| values per type: trivial at any event volume."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * 100).cast("double")
        ).alias("x")
    )
    s = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "x"))),
            lambda r: r["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    delta = float(_PH_DELTA)
    lam = float(_PH_LAMBDA)

    def step(acc, x):
        def at(i):
            return F.element_at(acc, i)

        m = at(3) + (x - (at(1) + x) / (at(2) + 1.0) - delta)
        minm = F.least(at(4), m)
        alarm = (m - minm) > lam
        return F.array(
            at(1) + x,
            at(2) + 1.0,
            m,
            minm,
            at(5) + F.when(alarm, 1.0).otherwise(0.0),
            F.when(alarm & (at(6) == 0.0), at(2) + 1.0).otherwise(at(6)),
        )

    init = F.array(*[F.lit(0.0) for _ in range(6)])
    fold = s.select(
        "event_type",
        "n_days",
        F.aggregate(F.col("xs"), init, step).alias("st"),
    )

    def st(i):
        return F.element_at(F.col("st"), i)

    return fold.select(
        "event_type",
        "n_days",
        st(5).cast("bigint").alias("n_alarms"),
        st(6).cast("bigint").alias("first_alarm_day"),
        F.round(st(3), 6).alias("m_final"),
        F.round(st(4), 6).alias("min_m"),
        F.round(st(3) - st(4), 6).alias("ph_final"),
    ).orderBy("event_type")


def _markov_stationary_oracle() -> str:
    # eight power iterations, unrolled; per-edge terms are rounded to the
    # 1e15 integer lattice BEFORE the cross-row sum (the repo's standing
    # lattice-before-sum idiom), so each iteration's mass vector is exact
    steps = []
    prev = "it0"
    # AS MATERIALIZED: each step references its predecessor twice —
    # default CTE inlining would re-expand the whole chain per
    # reference (2^iterations blowup measured as a >300 s bind)
    for k in range(1, 9):
        steps.append(f"""
    s{k} AS MATERIALIZED (
        SELECT p.dst AS t,
               SUM(CAST(round(pv.pi * p.pij * 1e15, 0) AS BIGINT)) AS s
        FROM p JOIN {prev} pv ON p.src = pv.t GROUP BY p.dst
    ), it{k} AS MATERIALIZED (
        SELECT t, CAST(s AS DOUBLE)
                  / CAST((SELECT SUM(s) FROM s{k}) AS DOUBLE) AS pi
        FROM s{k}
    )""")
        prev = f"it{k}"
    chain = ",".join(steps)
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), c AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), r AS (
        SELECT src, SUM(n) AS rn FROM c GROUP BY src
    ), p AS (
        SELECT c.src, c.dst,
               CAST(c.n AS DOUBLE) / CAST(r.rn AS DOUBLE) AS pij
        FROM c JOIN r ON c.src = r.src
    ), types AS (
        SELECT DISTINCT event_type AS t FROM events
    ), it0 AS (
        SELECT t, 1.0 / CAST((SELECT COUNT(*) FROM types) AS DOUBLE) AS pi
        FROM types
    ),{chain},
    emp AS (
        SELECT dst AS t, SUM(n) AS inc FROM c GROUP BY dst
    )
    SELECT f.t AS event_type,
           round(f.pi, 8) AS stationary_pi,
           round(CAST(e.inc AS DOUBLE)
                 / CAST((SELECT SUM(inc) FROM emp) AS DOUBLE), 8)
               AS empirical_share,
           CAST(e.inc AS BIGINT) AS n_incoming
    FROM {prev} f JOIN emp e ON f.t = e.t
    ORDER BY event_type
    """


@query("user_markov_stationary", oracle=_markov_stationary_oracle())
def user_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    by power iteration — "where does a user's session settle long-run",
    the steady-state complement to events_markov_transitions' one-step
    matrix.  The transition matrix is |types|² rows (post-agg tiny at
    any corpus size); eight power iterations run as broadcast joins over
    it, and every iteration rounds each π_i·P_ij term to the 1e15
    integer lattice BEFORE the cross-row sum (the repo's standing
    lattice-before-sum idiom — grouped float sums have no deterministic
    order, integer sums are exact), then renormalizes by the exact
    integer total.  The only corpus-scale work is the lag window
    partitioned by user and one grouped count."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(wseq).alias("prev_type"),
    )
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    r = c.groupBy("src").agg(F.sum("n").alias("rn"))
    p = c.join(F.broadcast(r), "src").select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.col("rn").cast("double")).alias(
            "pij"
        ),
    )
    types = e.select(F.col("event_type").alias("t")).distinct()
    k = types.agg(F.count(F.lit(1)).alias("k"))
    pi = types.join(F.broadcast(k)).select(
        "t", (F.lit(1.0) / F.col("k").cast("double")).alias("pi")
    )
    # the |types|-row state vector is re-broadcast each round; the
    # localCheckpoint (the graph family's standing idiom) truncates the
    # otherwise exponentially re-analyzed lineage
    for _ in range(8):
        s = (
            p.join(F.broadcast(pi), p["src"] == pi["t"])
            .select(
                F.col("dst").alias("t"),
                F.round(F.col("pi") * F.col("pij") * 1e15, 0)
                .cast("bigint")
                .alias("term"),
            )
            .groupBy("t")
            .agg(F.sum("term").alias("s"))
        )
        tot = s.agg(F.sum("s").alias("tot"))
        pi = (
            s.join(F.broadcast(tot))
            .select(
                "t",
                (
                    F.col("s").cast("double") / F.col("tot").cast("double")
                ).alias("pi"),
            )
            .localCheckpoint(eager=False)
        )
    emp = c.groupBy(F.col("dst").alias("t")).agg(
        F.sum("n").alias("inc")
    )
    emp_tot = emp.agg(F.sum("inc").alias("etot"))
    return (
        pi.join(emp, "t")
        .join(F.broadcast(emp_tot))
        .select(
            F.col("t").alias("event_type"),
            F.round(F.col("pi"), 8).alias("stationary_pi"),
            F.round(
                F.col("inc").cast("double") / F.col("etot").cast("double"),
                8,
            ).alias("empirical_share"),
            F.col("inc").cast("bigint").alias("n_incoming"),
        )
        .orderBy("event_type")
    )


@query(
    "user_recs_hitrate",
    oracle="""
    WITH b AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS cust, o.o_orderkey AS ok,
               o.o_orderdate AS od, l.l_partkey AS part
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), lastord AS MATERIALIZED (
        SELECT cust, ok FROM (
            SELECT cust, ok,
                   row_number() OVER (
                       PARTITION BY cust ORDER BY od DESC, ok DESC
                   ) AS rn
            FROM (SELECT DISTINCT cust, ok, od FROM b)
        ) WHERE rn = 1
    ), holdout AS MATERIALIZED (
        SELECT b.cust, b.part FROM b JOIN lastord lo
          ON b.cust = lo.cust AND b.ok = lo.ok
    ), train AS MATERIALIZED (
        SELECT DISTINCT b.cust, b.part FROM b JOIN lastord lo
          ON b.cust = lo.cust AND b.ok <> lo.ok
    ), cooc AS MATERIALIZED (
        SELECT a.part AS pa, c.part AS pb,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM b a JOIN b c ON a.ok = c.ok AND a.part <> c.part
        JOIN lastord lo ON a.cust = lo.cust AND a.ok <> lo.ok
        GROUP BY 1, 2
    ), scored AS MATERIALIZED (
        SELECT t.cust, co.pb AS part, SUM(co.w) AS score
        FROM train t JOIN cooc co ON t.part = co.pa
        LEFT JOIN train own
          ON own.cust = t.cust AND own.part = co.pb
        WHERE own.part IS NULL
        GROUP BY t.cust, co.pb
    ), topk AS MATERIALIZED (
        SELECT cust, part, rk FROM (
            SELECT cust, part,
                   row_number() OVER (
                       PARTITION BY cust ORDER BY score DESC, part
                   ) AS rk
            FROM scored
        ) WHERE rk <= 10
    ), firsthit AS MATERIALIZED (
        SELECT tk.cust, MIN(tk.rk) AS r1
        FROM topk tk JOIN holdout h
          ON tk.cust = h.cust AND tk.part = h.part
        GROUP BY tk.cust
    ), evaluser AS MATERIALIZED (
        SELECT DISTINCT cust FROM train
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN fh.r1 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit10,
           round(SUM(CASE WHEN fh.r1 IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hit_rate,
           round(CAST(SUM(CASE WHEN fh.r1 IS NOT NULL
                          THEN 2520 / fh.r1 ELSE 0 END) AS DOUBLE)
                 / (2520.0 * COUNT(*)), 6) AS mrr_at_10
    FROM evaluser eu
    JOIN customer c ON c.c_custkey = eu.cust
    LEFT JOIN firsthit fh ON fh.cust = eu.cust
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def user_recs_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence recommender with leave-last-order-out evaluation —
    hit-rate@10 and MRR@10 per market segment, the offline eval loop a
    recommendation pipeline runs before shipping a covisitation model.
    Each customer's LAST order (by date, orderkey tiebreak) is held
    out; the item-item signal is same-order co-purchase counts over
    TRAINING orders only (no test leakage — the co-occurrence join
    itself excludes held-out orders); candidates a user already bought
    are anti-joined away; top-10 by (score, partkey).  All scores are
    exact integers, and MRR rides the lcm-2520 lattice (2520/rank is an
    exact integer for rank ≤ 10), so the one division per segment is
    the only float op.  Scale shape: co-occurrence is bounded by
    order-size² per order (TPC-H ~7 lines), scoring is a keyed join on
    part, and the per-user top-k window partitions by customer — no
    all-pairs stage anywhere."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    b = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").alias("od"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    wlast = Window.partitionBy("cust").orderBy(
        F.desc("od"), F.desc("ok")
    )
    lastord = (
        b.select("cust", "ok", "od")
        .distinct()
        .withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cust").alias("lcust"), F.col("ok").alias("last_ok")
        )
    )
    holdout = b.join(
        lastord,
        (b["cust"] == F.col("lcust")) & (b["ok"] == F.col("last_ok")),
    ).select(F.col("lcust").alias("cust"), "part")
    train = (
        b.join(lastord, b["cust"] == F.col("lcust"))
        .filter(F.col("ok") != F.col("last_ok"))
        .select(F.col("lcust").alias("cust"), "part")
        .distinct()
    )
    tb = (
        b.join(lastord, b["cust"] == F.col("lcust"))
        .filter(F.col("ok") != F.col("last_ok"))
        .select("ok", "part")
    )
    a2, c2 = tb.alias("a"), tb.alias("c")
    cooc = (
        a2.join(
            c2,
            (F.col("a.ok") == F.col("c.ok"))
            & (F.col("a.part") != F.col("c.part")),
        )
        .groupBy(
            F.col("a.part").alias("pa"), F.col("c.part").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    scored = (
        train.alias("t")
        .join(cooc, F.col("t.part") == F.col("pa"))
        .join(
            train.alias("own"),
            (F.col("own.cust") == F.col("t.cust"))
            & (F.col("own.part") == F.col("pb")),
            "left_anti",
        )
        .groupBy(F.col("t.cust").alias("cust"), F.col("pb").alias("part"))
        .agg(F.sum("w").alias("score"))
    )
    wtop = Window.partitionBy("cust").orderBy(
        F.desc("score"), F.asc("part")
    )
    topk = (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 10)
        .select("cust", "part", "rk")
    )
    firsthit = topk.join(holdout, ["cust", "part"]).groupBy("cust").agg(
        F.min("rk").alias("r1")
    )
    evaluser = train.select("cust").distinct()
    hit = F.col("r1").isNotNull()
    return (
        evaluser.join(
            cust, cust["c_custkey"] == evaluser["cust"]
        )
        # no broadcast hint: firsthit is customer-cardinality (one row
        # per training customer with a top-10 hit) — unbounded in the
        # scale dimension, so let AQE pick the join strategy
        .join(firsthit, "cust", "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hit10"),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("hit_rate"),
            F.round(
                F.sum(
                    F.when(hit, (2520 / F.col("r1")).cast("bigint"))
                    .otherwise(0)
                ).cast("double")
                / (F.lit(2520.0) * F.count(F.lit(1))),
                6,
            ).alias("mrr_at_10"),
        )
        .orderBy("segment")
    )


@query(
    "corpus_neyman_allocation",
    oracle="""
    WITH m AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(n_chars) AS HUGEINT) AS s,
               CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                   AS ss
        FROM documents GROUP BY source
    ), sd AS (
        SELECT source, nh,
               CASE WHEN nh > 1 THEN
                   CAST(round(sqrt(CAST(nh * ss - s * s AS DOUBLE)
                                   / CAST(nh AS DOUBLE)
                                   / CAST(nh - 1 AS DOUBLE)) * 1e6, 0)
                        AS BIGINT)
               ELSE 0 END AS sd6
        FROM m
    ), wt AS (
        SELECT source, nh, sd6,
               CAST(nh AS HUGEINT) * sd6 AS w
        FROM sd
    ), tot AS (
        SELECT CAST(SUM(w) AS HUGEINT) AS tw,
               CAST(SUM(nh) AS BIGINT) AS tn
        FROM wt
    ), quota AS (
        SELECT s.source, s.nh, s.sd6, s.w,
               CAST((10000 * s.w) // t.tw AS BIGINT) AS base,
               CAST((10000 * s.w) % t.tw AS HUGEINT) AS rem,
               t.tn
        FROM wt s CROSS JOIN tot t WHERE t.tw > 0
    ), left0 AS (
        SELECT CAST(10000 - SUM(base) AS BIGINT) AS l FROM quota
    ), ranked AS (
        SELECT q.*, ROW_NUMBER() OVER (ORDER BY q.rem DESC, q.source)
                   AS rr
        FROM quota q
    )
    SELECT r.source, r.nh AS n_docs,
           r.sd6 AS stddev_micros,
           CAST(r.base + CASE WHEN r.rr <= (SELECT l FROM left0)
                              THEN 1 ELSE 0 END AS BIGINT)
               AS neyman_alloc,
           CAST((10000 * CAST(r.nh AS HUGEINT)) // r.tn AS BIGINT)
               AS proportional_alloc
    FROM ranked r ORDER BY r.source
    """,
)
def corpus_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation — divide a 10,000-doc
    budget across sources with n_h ∝ N_h·S_h (stratum size × stratum
    std-dev of doc length), the design that minimizes the estimator
    variance for a fixed budget; the floor-quota proportional allocation
    is reported alongside so the variance-driven shift is visible.  The
    per-stratum std-dev comes from exact HUGEINT moments (one IEEE sqrt,
    then the 1e-6 lattice — the temperature-mixture discipline), the
    Neyman weight N_h·S_h is an exact integer product, and the budget is
    apportioned by Hamilton largest remainder, so allocations sum to
    exactly 10,000.  One grouped moment pass at any corpus size; the
    apportionment is a |sources|-row frame."""
    dec = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum(F.col("n_chars").cast(dec)).alias("s"),
        F.sum((F.col("n_chars").cast(dec) * F.col("n_chars")).cast(dec))
        .alias("ss"),
    )
    sd = m.select(
        "source",
        "nh",
        F.when(
            F.col("nh") > 1,
            F.round(
                F.sqrt(
                    (F.col("nh") * F.col("ss") - F.col("s") * F.col("s"))
                    .cast("double")
                    / F.col("nh").cast("double")
                    / (F.col("nh") - 1).cast("double")
                )
                * 1e6,
                0,
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("sd6"),
    )
    wt = sd.select(
        "source",
        "nh",
        "sd6",
        (F.col("nh").cast(dec) * F.col("sd6")).cast(dec).alias("w"),
    ).localCheckpoint(eager=False)
    tot = wt.agg(
        F.sum("w").cast(dec).alias("tw"),
        F.sum("nh").cast("bigint").alias("tn"),
    )
    # degenerate-divisor guard (r9 discipline): if every stratum is
    # single-doc, tw = 0 and the quota division diverges between
    # engines (NULL on Spark, error on DuckDB) — exclude identically
    quota = wt.crossJoin(F.broadcast(tot)).filter(F.col("tw") > 0).select(
        "source",
        "nh",
        "sd6",
        F.expr(
            "CAST((CAST(10000 AS decimal(38,0)) * w) div tw AS BIGINT)"
        ).alias("base"),
        F.expr("(CAST(10000 AS decimal(38,0)) * w) % tw")
        .cast(dec)
        .alias("rem"),
        "tn",
    ).localCheckpoint(eager=False)
    left0 = quota.agg(
        (F.lit(10000) - F.sum("base")).cast("bigint").alias("l")
    )
    wrr = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = quota.withColumn("rr", F.row_number().over(wrr))
    alloc = F.col("base") + F.when(
        F.col("rr") <= F.col("l"), 1
    ).otherwise(0)
    return (
        ranked.crossJoin(F.broadcast(left0))
        .select(
            "source",
            F.col("nh").alias("n_docs"),
            # sd6 already lives on the integer micros lattice — hash
            # it directly; round(sd6/1e6, 4) was a decimal-tie surface
            F.col("sd6").alias("stddev_micros"),
            alloc.cast("bigint").alias("neyman_alloc"),
            F.expr(
                "CAST((CAST(10000 AS decimal(38,0)) "
                "* CAST(nh AS decimal(38,0))) div tn AS BIGINT)"
            ).alias("proportional_alloc"),
        )
        .orderBy("source")
    )


@query(
    "orders_promo_lift_did",
    oracle="""
    WITH cells AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS treated,
               CASE WHEN o_orderdate >= DATE '1998-01-01' THEN 1
                    ELSE 0 END AS post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS HUGEINT))
                    AS HUGEINT) AS s,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS HUGEINT)
                        * CAST(round(o_totalprice * 100, 0) AS HUGEINT))
                    AS HUGEINT) AS ss
        FROM orders GROUP BY 1, 2
    ), mm AS (
        SELECT treated, post, n,
               CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean_price,
               CASE WHEN n > 1 THEN
                   CAST(n * ss - s * s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                      * CAST(n AS DOUBLE)) / 1e4
               ELSE 0 END AS var_mean
        FROM cells
    ), wide AS (
        SELECT
            MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_price END)
                AS t_post,
            MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_price END)
                AS t_pre,
            MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_price END)
                AS c_post,
            MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_price END)
                AS c_pre,
            MAX(CASE WHEN treated = 1 AND post = 1 THEN var_mean END)
              + MAX(CASE WHEN treated = 1 AND post = 0 THEN var_mean END)
              + MAX(CASE WHEN treated = 0 AND post = 1 THEN var_mean END)
              + MAX(CASE WHEN treated = 0 AND post = 0 THEN var_mean END)
                AS var_did,
            CAST(SUM(n) AS BIGINT) AS n_orders
        FROM mm
    )
    SELECT n_orders,
           round(t_pre, 4) AS treated_pre,
           round(t_post, 4) AS treated_post,
           round(c_pre, 4) AS control_pre,
           round(c_post, 4) AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 4) AS did_estimate,
           round(((t_post - t_pre) - (c_post - c_pre))
                 / sqrt(var_did), 6) AS did_z
    FROM wide WHERE var_did > 0
    """,
)
def orders_promo_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences lift estimate — treated = URGENT
    orders, pre/post = the 1998-01-01 cutover (mid-range of the synthetic 1995-2001 order dates), outcome = mean order
    value: DiD = (T_post − T_pre) − (C_post − C_pre), the standard
    causal estimator when treatment assignment isn't randomized
    (complements events_cuped_adjusted's variance reduction and
    events_ab_conversion's randomized test).  The four cell means and
    their variances come from ONE grouped pass of exact HUGEINT cents
    moments; the z-score divides by the sqrt of the summed
    variance-of-means (Welch style, n>1 and positive-variance guarded
    identically on both engines).  A 2×2 frame regardless of scale."""
    o = _t(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cents = F.round(F.col("o_totalprice") * 100, 0).cast(dec)
    cells = o.groupBy(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("treated"),
        F.when(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).alias("s"),
        F.sum((cents * cents).cast(dec)).alias("ss"),
    )
    mm = cells.select(
        "treated",
        "post",
        "n",
        (
            F.col("s").cast("double") / (F.col("n") * 100).cast("double")
        ).alias("mean_price"),
        F.when(
            F.col("n") > 1,
            (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (
                F.col("n").cast("double")
                * (F.col("n") - 1).cast("double")
                * F.col("n").cast("double")
            )
            / 1e4,
        )
        .otherwise(0.0)
        .alias("var_mean"),
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    wide = mm.agg(
        cell(1, 1, "mean_price").alias("t_post"),
        cell(1, 0, "mean_price").alias("t_pre"),
        cell(0, 1, "mean_price").alias("c_post"),
        cell(0, 0, "mean_price").alias("c_pre"),
        (
            cell(1, 1, "var_mean")
            + cell(1, 0, "var_mean")
            + cell(0, 1, "var_mean")
            + cell(0, 0, "var_mean")
        ).alias("var_did"),
        F.sum("n").cast("bigint").alias("n_orders"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (
        F.col("c_post") - F.col("c_pre")
    )
    return wide.filter(F.col("var_did") > 0).select(
        "n_orders",
        F.round(F.col("t_pre"), 4).alias("treated_pre"),
        F.round(F.col("t_post"), 4).alias("treated_post"),
        F.round(F.col("c_pre"), 4).alias("control_pre"),
        F.round(F.col("c_post"), 4).alias("control_post"),
        F.round(did, 4).alias("did_estimate"),
        F.round(did / F.sqrt(F.col("var_did")), 6).alias("did_z"),
    )


@query(
    "events_srm_check",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1
        FROM events GROUP BY event_type
    )
    SELECT event_type, n0, n1,
           round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE), 6) AS chi2,
           CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
               / CAST(n0 + n1 AS DOUBLE) > 3.841458820694124 AS srm_flag
    FROM g WHERE n0 + n1 > 0 ORDER BY event_type
    """,
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch health check for the user_id-parity A/B
    assignment — the guardrail every experimentation pipeline runs
    before trusting a test: under a 50/50 split the goodness-of-fit
    chi-square collapses to (n0−n1)²/n, an exact-integer numerator over
    one division, flagged against the 95% one-df critical value (a
    shared literal).  Unlike events_chisq_independence (type × hour
    association), this is the GOF form against a DESIGNED ratio.  One
    grouped pass; |types| rows out at any event volume."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    diff = F.col("n0") - F.col("n1")
    chi = (diff * diff).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    return (
        g.filter((F.col("n0") + F.col("n1")) > 0)
        .select(
            "event_type",
            "n0",
            "n1",
            F.round(chi, 6).alias("chi2"),
            (chi > 3.841458820694124).alias("srm_flag"),
        )
        .orderBy("event_type")
    )


def _betweenness_oracle(rounds: int = 6) -> str:
    term = (
        "CAST(round(CAST(lv.sigma AS DOUBLE) / CAST(dw.sigma AS DOUBLE)"
        " * (1.0 + CAST(dw.delta_int AS DOUBLE) / 1e9) * 1e9, 0)"
        " AS BIGINT)"
    )
    parts = ["""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT 's:' || CAST(l_suppkey AS VARCHAR) AS u,
                        'p:' || CAST(l_partkey AS VARCHAR) AS v
        FROM lineitem
    ), ed AS MATERIALIZED (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), srcs AS MATERIALIZED (
        SELECT 's:' || CAST(src AS VARCHAR) AS src FROM (
            SELECT DISTINCT l_suppkey AS src FROM lineitem
            ORDER BY src LIMIT 4)
    ), f0 AS MATERIALIZED (
        SELECT src, src AS node, CAST(1 AS BIGINT) AS sigma FROM srcs
    ), v0 AS MATERIALIZED (
        SELECT src, node FROM f0
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f""", f{k} AS MATERIALIZED (
        SELECT c.src, c.node, c.sigma FROM (
            SELECT f.src, ed.v AS node,
                   CAST(SUM(f.sigma) AS BIGINT) AS sigma
            FROM f{k - 1} f JOIN ed ON f.node = ed.u
            GROUP BY f.src, ed.v
        ) c LEFT JOIN v{k - 1} vis
          ON c.src = vis.src AND c.node = vis.node
        WHERE vis.node IS NULL
    ), v{k} AS MATERIALIZED (
        SELECT src, node FROM v{k - 1}
        UNION ALL SELECT src, node FROM f{k}
    )""")
    parts.append(f""", d{rounds} AS MATERIALIZED (
        SELECT src, node, sigma, CAST(0 AS BIGINT) AS delta_int
        FROM f{rounds}
    )""")
    for k in range(rounds - 1, 0, -1):
        parts.append(f""", d{k} AS MATERIALIZED (
        SELECT f.src, f.node, f.sigma,
               CAST(COALESCE(s.dsum, 0) AS BIGINT) AS delta_int
        FROM f{k} f LEFT JOIN (
            SELECT lv.src, lv.node, SUM({term}) AS dsum
            FROM f{k} lv JOIN ed ON lv.node = ed.u
            JOIN d{k + 1} dw ON dw.src = lv.src AND dw.node = ed.v
            GROUP BY lv.src, lv.node
        ) s ON f.src = s.src AND f.node = s.node
    )""")
    unions = " UNION ALL ".join(
        f"SELECT src, node, delta_int FROM d{k}"
        for k in range(1, rounds)
    )
    parts.append(f""", bc AS (
        SELECT node, CAST(SUM(delta_int) AS BIGINT) AS bc_int
        FROM ({unions}) GROUP BY node
    )
    SELECT CAST(row_number() OVER (ORDER BY bc_int DESC, node) AS INT)
               AS pos,
           node, bc_int
    FROM bc QUALIFY pos <= 20 ORDER BY pos
    """)
    return "".join(parts)


@query("supplier_betweenness", oracle=_betweenness_oracle(6))
def supplier_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon Brandes betweenness centrality over the
    supplier–part bipartite graph — "which nodes do shortest paths
    route through", the brokerage measure that completes the
    centrality family next to PageRank, HITS, closeness, and k-core.
    Sources are the same four lowest-keyed suppliers as
    supplier_closeness_centrality; horizon 6 hops (the bounded-BFS
    precedent — exact for every shortest path of length ≤ 6 from a
    source).  Forward pass: level-synchronous BFS with exact-integer
    path counts σ carried per (source, node).  Backward pass: Brandes'
    dependency accumulation with every σv/σw·(1+δw) term rounded to
    the 1e9 lattice BEFORE the grouped sum (``graph.betweenness_
    bounded``), so the iterative float recurrence is hash-checkable
    against the fully unrolled SQL replay.  Each round is one keyed
    join + one grouped sum; the leaderboard rides TakeOrdered."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        betweenness_bounded,
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
            "u"
        ),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias(
            "v"
        ),
    ).distinct()
    srcs = (
        li.select(F.col("l_suppkey").alias("sk"))
        .distinct()
        .orderBy("sk")
        .limit(4)
        .select(
            F.concat(F.lit("s:"), F.col("sk").cast("string")).alias("src")
        )
    )
    bc = betweenness_bounded(edges, srcs, rounds=6)
    top = take_top_k(
        bc, [F.desc("bc_int"), F.asc("node")], 20, rank_col="pos"
    )
    return top.select(
        F.col("pos").cast("int").alias("pos"),
        "node",
        # bc_int already lives on the 1e9 integer lattice — hash it
        # directly; round(bc_int/1e9, 4) was a decimal-tie surface
        # (exact tie whenever bc_int % 100000 == 50000)
        "bc_int",
    ).orderBy("pos")


@query(
    "embedding_triplet_mining",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              e -> CAST(round(e * 1000) AS BIGINT)) AS vi
        FROM embeddings
    ), c AS (
        SELECT vec_id, label, vi,
               sqrt(CAST(list_sum(list_transform(vi, x -> x * x))
                         AS DOUBLE)) AS nrm
        FROM v
    ), a AS (
        SELECT vec_id AS anchor_id, label AS albl, vi AS avi, nrm AS anrm
        FROM c WHERE vec_id < 10
    ), pairs AS (
        SELECT a.anchor_id, a.albl, c.vec_id, c.label,
               CAST(list_sum(list_transform(
                        generate_series(1, len(c.vi)),
                        i -> c.vi[i] * a.avi[i])) AS DOUBLE)
                   / (c.nrm * a.anrm) AS sim
        FROM c CROSS JOIN a
        WHERE c.vec_id <> a.anchor_id
    ), pos AS (
        SELECT anchor_id, vec_id AS pos_id, sim AS pos_sim FROM (
            SELECT anchor_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY anchor_id
                       ORDER BY sim DESC, vec_id
                   ) AS rn
            FROM pairs WHERE label = albl
        ) WHERE rn = 1
    ), neg AS (
        SELECT p.anchor_id,
               CAST(SUM(CASE WHEN p.sim > ps.pos_sim
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hard,
               CAST(SUM(CASE WHEN p.sim <= ps.pos_sim
                              AND p.sim > ps.pos_sim - 0.05
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_semihard,
               CAST(SUM(CASE WHEN p.sim <= ps.pos_sim - 0.05
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_easy
        FROM pairs p JOIN pos ps ON p.anchor_id = ps.anchor_id
        WHERE p.label <> p.albl
        GROUP BY p.anchor_id
    )
    SELECT a.anchor_id, a.albl AS label, ps.pos_id,
           round(ps.pos_sim, 6) AS pos_sim,
           n.n_hard, n.n_semihard, n.n_easy
    FROM a JOIN pos ps ON a.anchor_id = ps.anchor_id
    JOIN neg n ON a.anchor_id = n.anchor_id
    ORDER BY a.anchor_id
    """,
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-mining difficulty profile for contrastive training —
    per anchor: the hardest positive (nearest same-label neighbor) and
    the negative pool split into hard (closer than the positive),
    semi-hard (within the 0.05 cosine margin below it — the FaceNet
    band that actually trains), and easy.  This is the mining report a
    pipeline checks before picking a margin.  Cosines ride the 1e3
    integer-embedding lattice (exact BIGINT dots, one sqrt per norm,
    one divide), so similarity comparisons — including the margin
    boundary — are bit-identical on both engines.  Anchors are a
    bounded 10-row slice; the pair frame is |anchors|×N with grouped
    counts, the brute-force eval path (serving rides the IVF family)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"), lambda x: F.round(x * 1000).cast("bigint")
        ).alias("vi"),
    )
    c = v.select(
        "vec_id",
        "label",
        "vi",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("vi"), lambda x: x * x),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
        ).alias("nrm"),
    )
    a = c.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("albl"),
        F.col("vi").alias("avi"),
        F.col("nrm").alias("anrm"),
    )
    dot = F.aggregate(
        F.zip_with("vi", "avi", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pairs = (
        c.join(F.broadcast(a), F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "albl",
            "vec_id",
            "label",
            (dot.cast("double") / (F.col("nrm") * F.col("anrm"))).alias(
                "sim"
            ),
        )
    )
    wpos = Window.partitionBy("anchor_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    pos = (
        pairs.filter(F.col("label") == F.col("albl"))
        .withColumn("rn", F.row_number().over(wpos))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("pos_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    neg = (
        pairs.filter(F.col("label") != F.col("albl"))
        .join(F.broadcast(pos), "anchor_id")
        .groupBy("anchor_id")
        .agg(
            F.sum(F.when(F.col("sim") > F.col("pos_sim"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hard"),
            F.sum(
                F.when(
                    (F.col("sim") <= F.col("pos_sim"))
                    & (F.col("sim") > F.col("pos_sim") - 0.05),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_semihard"),
            F.sum(
                F.when(F.col("sim") <= F.col("pos_sim") - 0.05, 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_easy"),
        )
    )
    return (
        a.select("anchor_id", F.col("albl").alias("label"))
        .join(F.broadcast(pos), "anchor_id")
        .join(F.broadcast(neg), "anchor_id")
        .select(
            "anchor_id",
            "label",
            "pos_id",
            F.round(F.col("pos_sim"), 6).alias("pos_sim"),
            "n_hard",
            "n_semihard",
            "n_easy",
        )
        .orderBy("anchor_id")
    )


@query(
    "multimodal_ahash_dedup",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               ('0x' || substr(md5('ppm-v1:' || CAST(doc_id AS VARCHAR)),
                               18, 15))::BIGINT % 256 AS s
        FROM documents
    ), gx AS (
        SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS x
    ), gy AS (
        SELECT CAST(unnest(range(0, 6)) AS BIGINT) AS y
    ), px AS (
        SELECT b.doc_id, gx.x, gy.y,
               (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 7)
                + 2654435761 * (gx.x + 17 * gy.y)) % 256
               + (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 8)
                  + 2654435761 * (gx.x + 17 * gy.y + 31)) % 256
               + (b.s * (3 * gx.x * gy.y + gx.x + 2 * gy.y + 9)
                  + 2654435761 * (gx.x + 17 * gy.y + 62)) % 256 AS gray
        FROM base b CROSS JOIN gx CROSS JOIN gy
    ), tot AS (
        SELECT doc_id, SUM(gray) AS tg FROM px GROUP BY doc_id
    ), hb AS MATERIALIZED (
        SELECT px.doc_id,
               CAST(SUM(CASE WHEN 48 * px.gray > t.tg
                             THEN (1::BIGINT << CAST(px.y * 8 + px.x
                                                     AS INT))
                             ELSE 0 END) AS BIGINT) AS ahash
        FROM px JOIN tot t ON px.doc_id = t.doc_id
        GROUP BY px.doc_id
    ), grp AS MATERIALIZED (
        SELECT ahash, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM hb GROUP BY ahash
    ), hist AS (
        SELECT cnt AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
        FROM grp GROUP BY cnt
    ), top10 AS MATERIALIZED (
        SELECT ahash FROM grp ORDER BY cnt DESC, ahash LIMIT 10
    ), mh AS (
        SELECT CAST(MIN(bit_count(xor(a.ahash, b.ahash))) AS BIGINT)
                   AS min_cross_hamming
        FROM top10 a JOIN top10 b ON a.ahash < b.ahash
    ), summary AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(COUNT(DISTINCT ahash) AS BIGINT) AS n_distinct
        FROM hb
    )
    SELECT h.group_size, h.n_groups, s.n_images, s.n_distinct,
           m.min_cross_hamming
    FROM hist h CROSS JOIN summary s CROSS JOIN mh m
    ORDER BY h.group_size
    """,
)
def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) image dedup over the REAL PPM decode
    path — decode every image (header + raster parse, ``operators/
    multimodal.py:extract_ppm_ahash``), threshold each pixel's gray
    level against the image mean (cross-multiplied, no division), pack
    the 48 bits into one BIGINT fingerprint, and report the duplicate-
    group size histogram plus the minimum Hamming separation among the
    ten most frequent fingerprints (bit_count over xor — the
    near-dup distance the banding path would block on).  The synthetic
    corpus drives 500 images through 256 seeds, so exact collisions
    are guaranteed and the histogram is value-bearing.  Scale shape:
    hashing is one Arrow-batched decode pass; everything after
    operates on DISTINCT fingerprints (≤ 2^48, in practice the seed
    space), never on image pairs."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        extract_ppm_ahash,
        make_ppm_table,
    )
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    d = _t(spark, sf_dir, "documents")
    media = make_ppm_table(d, width=8, height=6)
    h = extract_ppm_ahash(media).filter(F.col("decode_ok"))
    grp = h.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    hist = grp.groupBy(F.col("cnt").alias("group_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups")
    )
    top10 = take_top_k(
        grp, [F.desc("cnt"), F.asc("ahash")], 10, rank_col="rk"
    ).select("ahash")
    a2, b2 = top10.alias("a"), top10.alias("b")
    mh = (
        a2.join(F.broadcast(b2), F.col("a.ahash") < F.col("b.ahash"))
        .agg(
            F.min(
                F.bit_count(
                    F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
                )
            )
            .cast("bigint")
            .alias("min_cross_hamming")
        )
    )
    summary = h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.countDistinct("ahash").cast("bigint").alias("n_distinct"),
    )
    return (
        hist.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(mh))
        .select(
            "group_size",
            "n_groups",
            "n_images",
            "n_distinct",
            "min_cross_hamming",
        )
        .orderBy("group_size")
    )


@query(
    "events_cramer_von_mises",
    oracle="""
    WITH vc AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
        FROM vc GROUP BY 1
    ), pr AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               a.n AS n_a, b.n AS n_b
        FROM tot a JOIN tot b ON a.event_type < b.event_type
    ), u AS (
        SELECT DISTINCT p.ta, p.tb, p.n_a, p.n_b, vc.v
        FROM pr p JOIN vc ON vc.event_type IN (p.ta, p.tb)
    ), pv AS (
        SELECT u.ta, u.tb, u.n_a, u.n_b, u.v,
               COALESCE(va.cnt, 0) AS ca, COALESCE(vb.cnt, 0) AS cb
        FROM u
        LEFT JOIN vc va ON va.event_type = u.ta AND va.v = u.v
        LEFT JOIN vc vb ON vb.event_type = u.tb AND vb.v = u.v
    ), cum AS (
        SELECT ta, tb, n_a, n_b, v, ca + cb AS w,
               SUM(ca) OVER (PARTITION BY ta, tb ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS cfa,
               SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS cfb
        FROM pv
    ), st AS (
        SELECT ta, tb, n_a, n_b,
               CAST(SUM(CAST(w AS HUGEINT)
                        * (cfa * n_b - cfb * n_a)
                        * (cfa * n_b - cfb * n_a)) AS HUGEINT) AS num
        FROM cum GROUP BY ta, tb, n_a, n_b
    )
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round(CAST(num AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * CAST(n_a + n_b AS DOUBLE)
                    * CAST(n_a + n_b AS DOUBLE)), 6) AS cvm_t
    FROM st ORDER BY type_a, type_b
    """,
)
def events_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between every pair of
    event types' value distributions — the whole-distribution
    complement to events_ks_test's max-gap (CvM integrates the SQUARED
    ECDF gap over the combined sample, so it sees spread-out
    differences KS misses).  Tie-safe ECDF form on the cents lattice:
    per distinct value the gap F−G cross-multiplies to the exact
    integer (cfa·n_b − cfb·n_a), the weighted square-sum stays
    HUGEINT, and T = Σw·gap²/(n_a·n_b·N²) is ONE final division —
    fully rational, no lattice tuning anywhere.  One grouped count per
    type, cumulative sums over the post-agg distinct-value frame
    (windows partition by pair), |types|² output rows at any volume."""
    e = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    vc = e.groupBy(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = vc.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    a2, b2 = tot.alias("a"), tot.alias("b")
    pr = a2.join(
        F.broadcast(b2), F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    # per-pair distinct-value axis: each pair pulls the values observed
    # in EITHER of its two types
    u = (
        F.broadcast(pr)
        .join(
            vc.select(F.col("event_type").alias("vt"), "v"),
            (F.col("vt") == F.col("ta")) | (F.col("vt") == F.col("tb")),
        )
        .select("ta", "tb", "n_a", "n_b", "v")
        .distinct()
    )
    va = vc.select(
        F.col("event_type").alias("ta"),
        F.col("v").alias("v"),
        F.col("cnt").alias("ca"),
    )
    vb = vc.select(
        F.col("event_type").alias("tb"),
        F.col("v").alias("v"),
        F.col("cnt").alias("cb"),
    )
    pv = (
        u.join(va, ["ta", "v"], "left")
        .join(vb, ["tb", "v"], "left")
        .select(
            "ta",
            "tb",
            "n_a",
            "n_b",
            "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    wc = (
        Window.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.select(
        "ta",
        "tb",
        "n_a",
        "n_b",
        (F.col("ca") + F.col("cb")).alias("w"),
        F.sum("ca").over(wc).alias("cfa"),
        F.sum("cb").over(wc).alias("cfb"),
    )
    gap = F.col("cfa") * F.col("n_b") - F.col("cfb") * F.col("n_a")
    st = cum.groupBy("ta", "tb", "n_a", "n_b").agg(
        F.sum((F.col("w").cast(dec) * gap * gap).cast(dec)).alias("num")
    )
    return st.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(
            F.col("num").cast("double")
            / (
                F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
                * (F.col("n_a") + F.col("n_b")).cast("double")
                * (F.col("n_a") + F.col("n_b")).cast("double")
            ),
            6,
        ).alias("cvm_t"),
    ).orderBy("type_a", "type_b")


@query(
    "user_uplift_qini",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS treated,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ), r AS (
        SELECT u.*, row_number() OVER (
                   ORDER BY score DESC, user_id) AS rk,
               (SELECT COUNT(*) FROM u) AS n
        FROM u
    ), d AS (
        SELECT ((rk - 1) * 10) // n AS decile,
               CAST(SUM(treated) AS BIGINT) AS n_t,
               CAST(SUM(1 - treated) AS BIGINT) AS n_c,
               CAST(SUM(treated * converted) AS BIGINT) AS y_t,
               CAST(SUM((1 - treated) * converted) AS BIGINT) AS y_c
        FROM r GROUP BY 1
    ), c AS (
        SELECT decile,
               SUM(n_t) OVER w AS n_t_cum,
               SUM(n_c) OVER w AS n_c_cum,
               SUM(y_t) OVER w AS y_t_cum,
               SUM(y_c) OVER w AS y_c_cum
        FROM d
        WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_t_cum AS BIGINT) AS n_t_cum,
           CAST(n_c_cum AS BIGINT) AS n_c_cum,
           CAST(y_t_cum AS BIGINT) AS y_t_cum,
           CAST(y_c_cum AS BIGINT) AS y_c_cum,
           round(CAST(y_t_cum AS DOUBLE)
                 - CAST(y_c_cum AS DOUBLE) * CAST(n_t_cum AS DOUBLE)
                   / CAST(n_c_cum AS DOUBLE), 6) AS qini,
           round(CAST(y_t_cum AS DOUBLE) / CAST(n_t_cum AS DOUBLE)
                 - CAST(y_c_cum AS DOUBLE) / CAST(n_c_cum AS DOUBLE), 6)
               AS uplift_rate
    FROM c WHERE n_c_cum > 0 AND n_t_cum > 0
    ORDER BY decile
    """,
)
def user_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift-model evaluation — rank users by a
    deterministic targeting score (view count), walk down the ranking
    in deciles, and at each cut report the incremental conversions
    qini(k) = Y_t(k) − Y_c(k)·N_t(k)/N_c(k) against the user-parity
    treatment split (the standard offline eval for "whom should the
    campaign target"; complements events_ab_conversion's single-split
    test and classifier_cumulative_gains' response-only curve).  The
    global decile cut rides ``ranking.global_rank`` (range-partitioned
    two-pass — no single-task window); every cumulative count is an
    exact integer; qini and uplift are IEEE chains over exact inputs.
    One grouped pass over events, a 10-row curve out at any volume."""
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("converted"),
    ).select(
        "user_id",
        (F.col("user_id") % 2).cast("bigint").alias("treated"),
        "score",
        "converted",
    )
    ranked, n = global_rank(
        u, [F.desc("score"), F.asc("user_id")], rank_col="rk"
    )
    d = ranked.groupBy(
        F.expr(f"((rk - 1) * 10) div {n}").alias("decile")
    ).agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum(F.col("treated") * F.col("converted"))
        .cast("bigint")
        .alias("y_t"),
        F.sum((1 - F.col("treated")) * F.col("converted"))
        .cast("bigint")
        .alias("y_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = d.select(
        "decile",
        F.sum("n_t").over(wc).alias("n_t_cum"),
        F.sum("n_c").over(wc).alias("n_c_cum"),
        F.sum("y_t").over(wc).alias("y_t_cum"),
        F.sum("y_c").over(wc).alias("y_c_cum"),
    )
    return (
        c.filter((F.col("n_c_cum") > 0) & (F.col("n_t_cum") > 0))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_t_cum").cast("bigint").alias("n_t_cum"),
            F.col("n_c_cum").cast("bigint").alias("n_c_cum"),
            F.col("y_t_cum").cast("bigint").alias("y_t_cum"),
            F.col("y_c_cum").cast("bigint").alias("y_c_cum"),
            F.round(
                F.col("y_t_cum").cast("double")
                - F.col("y_c_cum").cast("double")
                * F.col("n_t_cum").cast("double")
                / F.col("n_c_cum").cast("double"),
                6,
            ).alias("qini"),
            F.round(
                F.col("y_t_cum").cast("double")
                / F.col("n_t_cum").cast("double")
                - F.col("y_c_cum").cast("double")
                / F.col("n_c_cum").cast("double"),
                6,
            ).alias("uplift_rate"),
        )
        .orderBy("decile")
    )


@query(
    "lineitem_theil_decomposition",
    oracle="""
    WITH x AS (
        SELECT n.n_name AS nation,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS xi
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
    ), g AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(xi) AS HUGEINT) AS sg
        FROM x GROUP BY nation
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(SUM(sg) AS HUGEINT) AS s
        FROM g
    ), terms AS (
        SELECT x.nation,
               CAST(x.xi AS HUGEINT)
               * CAST(round(ln(CAST(x.xi AS DOUBLE) * CAST(g.ng AS DOUBLE)
                               / CAST(g.sg AS DOUBLE)) * 1e6, 0)
                      AS HUGEINT) AS t6
        FROM x JOIN g ON x.nation = g.nation
    ), w AS (
        SELECT nation, CAST(SUM(t6) AS HUGEINT) AS wsum
        FROM terms GROUP BY nation
    )
    SELECT g.nation, g.ng AS n_items,
           round(CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE), 6)
               AS revenue_share,
           round(CAST(w.wsum AS DOUBLE)
                 / (CAST(g.sg AS DOUBLE) * 1e6), 6) AS theil_within,
           round(CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE)
                 * (CAST(round(ln(CAST(g.sg AS DOUBLE)
                                  * CAST(t.n AS DOUBLE)
                                  / (CAST(t.s AS DOUBLE)
                                     * CAST(g.ng AS DOUBLE))) * 1e6, 0)
                         AS DOUBLE) / 1e6), 6) AS between_term
    FROM g JOIN w ON g.nation = w.nation CROSS JOIN tot t
    ORDER BY g.nation
    """,
)
def lineitem_theil_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-T inequality index of line-item revenue, DECOMPOSED by
    supplier nation into within-nation inequality and each nation's
    between-group term — the additive decomposition property that makes
    Theil (unlike events_value_gini's Gini) the index used to attribute
    inequality to grouping structure: T = Σ_g share_g·T_g + Σ_g
    share_g·ln(share_g·N/N_g).  Per-row terms x_i·ln(x_i·N_g/S_g) round
    the ln to the PROVEN 1e-6 lattice before the cross-row HUGEINT sum
    (the repo's libm-portability margin; the ×x_i product and both sums
    stay exact integers), and the 25 group-level between-lns ride the
    same lattice.  One fact-to-dim broadcast join chain, two grouped
    passes; |nations| rows out at any volume.  At ~1e12 rows per group
    the x·N_g double product approaches 2^53 — switch xi to a coarser
    cents lattice there (docstring contract, same as the chi-square
    family)."""
    dec = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    x = (
        li.join(
            F.broadcast(su), li["l_suppkey"] == su["s_suppkey"]
        )
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("xi"),
        )
    )
    g = x.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("xi").cast(dec)).alias("sg"),
    )
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast(dec).alias("s"),
    )
    terms = x.join(F.broadcast(g), "nation").select(
        "nation",
        (
            F.col("xi").cast(dec)
            * F.round(
                F.ln(
                    F.col("xi").cast("double")
                    * F.col("ng").cast("double")
                    / F.col("sg").cast("double")
                )
                * 1e6,
                0,
            ).cast(dec)
        ).cast(dec).alias("t6"),
    )
    w = terms.groupBy("nation").agg(F.sum("t6").cast(dec).alias("wsum"))
    between_ln = F.round(
        F.ln(
            F.col("sg").cast("double")
            * F.col("n").cast("double")
            / (F.col("s").cast("double") * F.col("ng").cast("double"))
        )
        * 1e6,
        0,
    )
    return (
        g.join(F.broadcast(w), "nation")
        .join(F.broadcast(tot))
        .select(
            "nation",
            F.col("ng").alias("n_items"),
            F.round(
                F.col("sg").cast("double") / F.col("s").cast("double"), 6
            ).alias("revenue_share"),
            F.round(
                F.col("wsum").cast("double")
                / (F.col("sg").cast("double") * 1e6),
                6,
            ).alias("theil_within"),
            F.round(
                F.col("sg").cast("double")
                / F.col("s").cast("double")
                * (between_ln.cast("double") / 1e6),
                6,
            ).alias("between_term"),
        )
        .orderBy("nation")
    )


@query(
    "events_mann_whitney",
    oracle="""
    WITH base AS (
        SELECT event_type AS g,
           CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ca,
           CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ), vals AS (
        SELECT g, v,
               CAST(SUM(ca) AS BIGINT) AS c_a,
               CAST(SUM(1 - ca) AS BIGINT) AS c_b
        FROM base GROUP BY g, v
    ), cum AS (
        SELECT g, v, c_a, c_b,
               CAST(COALESCE(SUM(c_b) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cb_b
        FROM vals
    ), agg AS (
        SELECT g,
               CAST(SUM(c_a) AS BIGINT) AS n_a,
               CAST(SUM(c_b) AS BIGINT) AS n_b,
               CAST(SUM(2 * c_a * cb_b + c_a * c_b) AS BIGINT) AS u2_a,
               CAST(SUM(CAST(c_a + c_b AS HUGEINT) * (c_a + c_b)
                        * (c_a + c_b) - (c_a + c_b)) AS HUGEINT) AS t3
        FROM cum GROUP BY g
    ), st AS (
        SELECT g, n_a, n_b, u2_a,
               CAST(n_a + n_b AS HUGEINT) AS n,
               CAST(u2_a AS HUGEINT)
                   - CAST(n_a AS HUGEINT) * n_b AS d,
               CAST(n_a AS HUGEINT) * n_b
                   * ((CAST(n_a + n_b AS HUGEINT) * (n_a + n_b)
                       * (n_a + n_b) - (n_a + n_b)) - t3) AS den
        FROM agg
    )
    SELECT g AS event_type, n_a, n_b, u2_a,
           CAST((2000000 * (3 * n * (n - 1) * d * d) + den)
                // (2 * den) AS BIGINT) AS z2_micros
    FROM st
    WHERE n_a > 0 AND n_b > 0 AND den > 0
    ORDER BY event_type
    """,
)
def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test per event type — do the
    two user-parity cohorts (the registry's standing A/B split, cf.
    events_odds_ratio / events_srm_check) draw `value` from the same
    distribution?  The two-sample member of the rank-test family
    (Kruskal-Wallis = k-sample, Friedman = blocked, Cramér-von Mises =
    whole-ECDF).  Entirely integer: U rides the distinct-VALUE frame
    (u2 = 2U_A = Σ_v 2·c_A·cumB_below + c_A·c_B — the doubled-rank
    idiom, never a row-level rank), the tie cube Σ(t³−t) is HUGEINT,
    and the normal-approximation statistic is emitted as z² — the
    exact rational 3n(n−1)(2U−n_An_B)² / (n_An_B[(n³−n)−Σ(t³−t)]) —
    half-up in micros (decimal-tie discipline; no sqrt anywhere).
    Degenerate all-tied / one-cohort types are excluded identically on
    both engines (den > 0).  HUGEINT/decimal38 headroom: 2e6·num
    reaches ~1e27 at sf1, overflow-safe to ~1e6 rows per type; beyond
    that switch z² to doubles.  One grouped pass + a keyed per-type
    window on the distinct-value frame: trivial at any event volume."""
    dec = "decimal(38,0)"
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("g"),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ca"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    vals = base.groupBy("g", "v").agg(
        F.sum("ca").cast("bigint").alias("c_a"),
        F.sum(1 - F.col("ca")).cast("bigint").alias("c_b"),
    )
    wprev = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.withColumn(
        "cb_b",
        F.coalesce(F.sum("c_b").over(wprev), F.lit(0)).cast("bigint"),
    )
    agg = cum.groupBy("g").agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
        F.sum(
            2 * F.col("c_a") * F.col("cb_b") + F.col("c_a") * F.col("c_b")
        )
        .cast("bigint")
        .alias("u2_a"),
        F.sum(
            (F.col("c_a") + F.col("c_b")).cast(dec)
            * (F.col("c_a") + F.col("c_b"))
            * (F.col("c_a") + F.col("c_b"))
            - (F.col("c_a") + F.col("c_b"))
        )
        .cast(dec)
        .alias("t3"),
    )
    st = agg.select(
        "g",
        "n_a",
        "n_b",
        "u2_a",
        (F.col("n_a") + F.col("n_b")).cast(dec).alias("n"),
        (
            F.col("u2_a").cast(dec) - F.col("n_a").cast(dec) * F.col("n_b")
        ).alias("d"),
        (
            F.col("n_a").cast(dec)
            * F.col("n_b")
            * (
                (
                    (F.col("n_a") + F.col("n_b")).cast(dec)
                    * (F.col("n_a") + F.col("n_b"))
                    * (F.col("n_a") + F.col("n_b"))
                    - (F.col("n_a") + F.col("n_b"))
                )
                - F.col("t3")
            )
        ).alias("den"),
    )
    return (
        st.filter(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("den") > 0)
        )
        .select(
            F.col("g").alias("event_type"),
            "n_a",
            "n_b",
            "u2_a",
            F.expr(
                "CAST((2000000 * (3 * n * (n - 1) * d * d) + den)"
                " div (2 * den) AS BIGINT)"
            ).alias("z2_micros"),
        )
        .orderBy("event_type")
    )


@query(
    "corpus_good_turing",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(lower(text)),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS ws
        FROM documents WHERE trim(text) <> ''
    ), tg AS (
        SELECT ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS w
        FROM t, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i)
    ), wc AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tg GROUP BY w
    ), cc AS (
        SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM wc GROUP BY c
    ), tot AS (
        SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens FROM cc
    )
    SELECT a.r, a.n_r,
           COALESCE(b.n_r, 0) AS n_next,
           (2000000 * (a.r + 1) * COALESCE(b.n_r, 0) + a.n_r)
               // (2 * a.n_r) AS rstar_micros,
           (2000000 * a.r * a.n_r + t.n_tokens) // (2 * t.n_tokens)
               AS mass_ppm
    FROM cc a LEFT JOIN cc b ON b.r = a.r + 1
    CROSS JOIN tot t
    WHERE a.r <= 10
    ORDER BY a.r
    """,
)
def corpus_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus's word TRIGRAMS
    — the counts-of-counts view (N_r = how many trigram types occur
    exactly r times) and the smoothed count r* = (r+1)·N_{r+1}/N_r for
    the head r ≤ 10, plus each frequency class's share of total
    trigram mass.  The classic unseen-mass estimator (the r=1 row IS
    the Good-Turing estimate of unseen-event probability via N_1/N)
    that LM builders read before choosing a smoothing scheme — and a
    corpus-health readout: a heavy N_1 tail means OCR noise /
    boilerplate IDs.  Trigrams, not unigrams, because the synthetic
    corpus has only ~31 distinct words all with counts in the hundreds
    (an empty r ≤ 10 head), while its ~16k trigram types populate
    every N_1..N_8 class — the spectrum the estimator exists for.
    Entirely integer by construction: counts-of-counts are exact, r*
    and mass are emitted as half-up integer micros/ppm (decimal-tie
    discipline).  One explode + two rollups; the counts-of-counts
    frame is a few dozen rows at any corpus size."""
    from high_throughput_etl_pipeline_spark.operators.text import (
        _lower_words,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    ws = d.select(_lower_words(F.col("text")).alias("ws")).filter(
        F.size("ws") >= 3
    )
    toks = ws.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 3),"
                " i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2]))"
            )
        ).alias("w")
    )
    wc = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cc = wc.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    cc = cc.localCheckpoint(eager=False)
    tot = cc.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens")
    )
    nxt = cc.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next")
    )
    return (
        cc.filter(F.col("r") <= 10)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_next"), F.lit(0))
            .cast("bigint")
            .alias("n_next"),
            F.expr(
                "(2000000 * (r + 1) * COALESCE(n_next, 0) + n_r)"
                " div (2 * n_r)"
            ).alias("rstar_micros"),
            F.expr(
                "(2000000 * r * n_r + n_tokens) div (2 * n_tokens)"
            ).alias("mass_ppm"),
        )
        .orderBy("r")
    )


@query(
    "events_jarque_bera",
    oracle="""
    WITH base AS (
        SELECT event_type AS g,
               CAST(round(value * 100, 0) AS HUGEINT) AS v
        FROM events
    ), m AS (
        SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(v) AS s1, SUM(v * v) AS s2,
               SUM(v * v * v) AS s3, SUM(v * v * v * v) AS s4
        FROM base GROUP BY g
    ), cm AS (
        -- central moments scaled by n^k (exact integers):
        -- M2 = n*s2 - s1^2                        (= n^2 * m2)
        -- M3 = n^2*s3 - 3n*s1*s2 + 2*s1^3         (= n^3 * m3)
        -- M4 = n^3*s4 - 4n^2*s1*s3 + 6n*s1^2*s2 - 3*s1^4  (= n^4 * m4)
        SELECT g, n,
               n * s2 - s1 * s1 AS bm2,
               n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS bm3,
               n * n * n * s4 - 4 * n * n * s1 * s3
                   + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS bm4
        FROM m
    ), r AS (
        -- skewness^2 = m3^2/m2^3 = bm3^2 / bm2^3 (the n powers cancel:
        -- (n^3 m3)^2 / (n^2 m2)^3 = m3^2/m2^3); kurtosis = m4/m2^2 =
        -- n * bm4 / bm2^2.  Both pure rationals of the exact integer
        -- moments; floats enter only here, as two IEEE divides.
        SELECT g, CAST(n AS BIGINT) AS n,
               CAST(bm3 AS DOUBLE) * CAST(bm3 AS DOUBLE)
                   / (CAST(bm2 AS DOUBLE) * CAST(bm2 AS DOUBLE)
                      * CAST(bm2 AS DOUBLE)) AS skew2,
               CAST(n AS DOUBLE) * CAST(bm4 AS DOUBLE)
                   / (CAST(bm2 AS DOUBLE) * CAST(bm2 AS DOUBLE)) AS kurt
        FROM cm WHERE bm2 > 0
    )
    SELECT g AS event_type, n,
           CAST(round(skew2 * 1e6, 0) AS BIGINT) AS skew2_micros,
           CAST(round(kurt * 1e6, 0) AS BIGINT) AS kurt_micros,
           CAST(round(CAST(n AS DOUBLE) * (skew2 / 6.0
                      + (kurt - 3.0) * (kurt - 3.0) / 24.0) * 1e6, 0)
                AS BIGINT) AS jb_micros
    FROM r ORDER BY event_type
    """,
)
def events_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of `value` per event type — the
    moment-based omnibus check (JB = n·[S²/6 + (K−3)²/24]) that a
    monitoring pipeline runs before trusting any gaussian assumption
    (control limits, z-scores, Welch intervals all assume it).  S² and
    K are PURE RATIONALS of exact HUGEINT/decimal38 raw moments on the
    cents lattice — skew² = M3²/M2³ and kurt = n·M4/M2² where M_k are
    the n^k-scaled central moments (the n powers cancel exactly, see
    the oracle comment) — so the only float work is two IEEE divides
    per type and the final ×1e6 roundings; no sqrt, no fractional
    power (skewness is emitted SQUARED precisely to avoid the odd
    root).  Zero-variance types are excluded identically on both
    engines (M2 > 0).  decimal38 headroom: s1⁴ ≤ (n·v)⁴ needs n·v ≲
    3e9 — at cents v ≈ 1e5 that is ~30k rows/type per shard of 1e38,
    and the sf1 moments stay ≤ ~1e33; beyond that, shift the lattice
    to decicents.  One grouped pass; the moment frame is |types|
    rows."""
    dec = "decimal(38,0)"
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast(dec).alias("v"),
    )
    v = F.col("v")
    m = base.groupBy("g").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(v).cast(dec).alias("s1"),
        F.sum((v * v).cast(dec)).cast(dec).alias("s2"),
        F.sum((v * v * v).cast(dec)).cast(dec).alias("s3"),
        F.sum((v * v * v * v).cast(dec)).cast(dec).alias("s4"),
    )
    n, s1, s2, s3, s4 = (
        F.col("n"),
        F.col("s1"),
        F.col("s2"),
        F.col("s3"),
        F.col("s4"),
    )
    cm = m.select(
        "g",
        "n",
        (n * s2 - s1 * s1).cast(dec).alias("bm2"),
        (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1)
        .cast(dec)
        .alias("bm3"),
        (
            n * n * n * s4
            - 4 * n * n * s1 * s3
            + 6 * n * s1 * s1 * s2
            - 3 * s1 * s1 * s1 * s1
        )
        .cast(dec)
        .alias("bm4"),
    )
    skew2 = (
        F.col("bm3").cast("double")
        * F.col("bm3").cast("double")
        / (
            F.col("bm2").cast("double")
            * F.col("bm2").cast("double")
            * F.col("bm2").cast("double")
        )
    )
    kurt = (
        F.col("n").cast("double")
        * F.col("bm4").cast("double")
        / (F.col("bm2").cast("double") * F.col("bm2").cast("double"))
    )
    return (
        cm.filter(F.col("bm2") > 0)
        .select(
            F.col("g").alias("event_type"),
            F.col("n").cast("bigint").alias("n"),
            F.round(skew2 * F.lit(1e6), 0).cast("bigint").alias(
                "skew2_micros"
            ),
            F.round(kurt * F.lit(1e6), 0).cast("bigint").alias(
                "kurt_micros"
            ),
            F.round(
                F.col("n").cast("double")
                * (
                    skew2 / F.lit(6.0)
                    + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(24.0)
                )
                * F.lit(1e6),
                0,
            )
            .cast("bigint")
            .alias("jb_micros"),
        )
        .orderBy("event_type")
    )


# r9 rotation (HISTORICAL — superseded by the r10 window in HEADLINE
# below; kept because the transcendental audit lines remain the standing
# per-query safety notes).  Window composition (50):
#   1  customer_survival_curve — the ONE red r8 row (driver libm flipped a
#      6-dp boundary in the cumulative KM ln-fold; now per-term 1e-12
#      lattice-rounded before the sum on both engines) — re-verify green.
#   3  dedup_minhash_lsh, dedup_simhash, ann_ivf_kmeans_topk — the three
#      legacy rows-only ledger entries, now carrying REAL value oracles
#      (portable KM double-hash lanes / blocked md5 simhash replay /
#      unrolled lattice-Lloyd training replay) — their stale no_oracle
#      latest rows retire with a green hash row each.
#   46 never-driver-checked backlog (of 73 after r8; the 27 left over are
#      the r10 queue below).
#
# Transcendental audit (VERDICT r9 ask #2) — each queued query that takes
# ln/log/sqrt/exp on the value path, one line each:
#   user_type_entropy        HARDENED r9: five n*ln(n) terms now 1e-9
#                            lattice ints before the per-row sum
#   text_nb_confusion        safe: log-probs micro-nat bigints pre-sum
#   graph_degree_assortativity safe: integer moments; final sqrt only
#                            (IEEE sqrt is correctly rounded everywhere)
#   doc_pmi_collocations     safe: ONE ln per pair, rounded; never summed
#   corpus_zipf_slope        safe: ln(r)/ln(f) micro-nat ints pre-sum
#   supplier_adamic_adar     safe: round(1e6/ln(deg)) per part pre-sum;
#                            deg in 2..8, all 7 constants >= 0.02 from a
#                            rounding boundary (1-ulp drift moves ~1e-4)
#   classifier_pr_auc        safe: P@k terms micro ints pre-sum
#   events_bootstrap_ci      safe: lattice replicate means; final sqrt
#   events_mann_kendall      safe: integer S/ties; final sqrt
#   embedding_silhouette     safe: sqrt of exact ints, then 1e-9 lattice
#                            before the per-label mean
#   events_ks_test           safe: integer cross-mult D; final sqrt
#   classifier_woe_iv        safe: one ln per bin; IV terms 1e-6 lattice
#                            before the cross-bin sum (coarsened r10)
#   lineitem_partial_correlation safe: integer moments; final sqrts
#   part_price_index         safe: lattice unit prices, exact basket
#                            sums; final sqrt (fisher)
#   events_entropy_rate      safe: per-cell 1e-6 lattice pre-sum (r10)
#   doc_lexical_diversity    safe: per-type 1e-6 lattice pre-sum (r10)
#   events_runs_test         safe: integer counts, closed forms; final
#                            sqrt
#   corpus_heaps_law         safe: micro-nat points, exact OLS moments
HEADLINE: list[str] = [
    # r11 rotation. Window composition (50):
    #   2  the survival pair, both now hashing INTEGER-ONLY outputs
    #      (the r10 asks, executed): customer_cumulative_hazard emits
    #      hazard_micros = (h9+500) div 1000 (the r10 red was an exact
    #      decimal tie at h9 % 1000 == 500 — engine-dependent round()
    #      tie-breaking); customer_survival_curve emits
    #      survival_micros = floor(surv_raw*1e6 + 0.5) (floor exact,
    #      x/+ correctly-rounded IEEE — immune to round()/repr
    #      differences in the driver's DuckDB build).
    #   4  customer_survival_debug_{gaps,lifetable,factors,fold} — the
    #      asked-for bisect family: four integer-only stage queries
    #      (duration histogram -> life table -> 1e-9 factor lattice ->
    #      integer-lattice KM fold) so ONE driver run localizes where
    #      any remaining survival divergence enters (data vs window vs
    #      division vs fold vs IEEE float ops).
    #   39 the COMPLETE r10 backlog (recounted against
    #      CORRECTNESS_r01..r10 this session: exactly 39 registered
    #      queries have no driver row; all 39 local-sweep green).
    #      Five of them were converted to integer hashed outputs
    #      BEFORE this first driver row by the r10 tie-class sweep:
    #      text_burrows_delta (delta_micros), events_hill_tail_index
    #      (hill/alpha_micros + divisor guards), corpus_ipf_mixture
    #      (weight/ratio_micros), corpus_neyman_allocation
    #      (stddev_micros + the ADVICE tw>0 guard),
    #      supplier_betweenness (raw bc_int).
    #   5  re-checks, prioritized by tie-class conversion (their old
    #      green rows predate the integer-output forms):
    #      source_lang_divergence (js_nanos — pure lattice sum,
    #      was round(sum/1e9, 6), tie at sum % 1000 == 500),
    #      customer_logrank_test (expected/chi2_micros — hazard class),
    #      doc_unigram_logprob (RAW ln-average hardened to 1e-9
    #      lattice + integer nanos mean — the exact libm-sum class
    #      that flipped the KM fold on the r8 driver),
    #      doc_bigram_perplexity (avg_lp_nanos integer mean),
    #      events_chisq_independence (chi2_micros — was
    #      round(sum/1e6, 4), tie at sum % 100 == 50).
    # r12 queue (compose next window from these, in order):
    #   1. the remaining six tie-class conversions, local-green but
    #      with pre-conversion driver rows: classifier_calibration_curve
    #      (mean_score_micros), embedding_jl_distortion
    #      (avg/min/max_micros), classifier_brier_decomposition
    #      (brier/reliability/resolution_micros), embedding_silhouette
    #      (mean_sil_micros), events_mutual_information
    #      (mi/h_type/h_hour_micros), purchase_shapley_attribution
    #      (credit_micros).
    #   2. the four r11-new queries (all local hash-green, integer
    #      outputs from birth): multimodal_bmp_decode (third REAL
    #      stdlib decoder — 24-bit BI_RGB Windows BMP with row
    #      flip/BGR/padding, golden-bytes pytest + formula-replaying
    #      oracle), events_mann_whitney (doubled-midrank U + rational
    #      z² in micros), corpus_good_turing (trigram counts-of-counts
    #      smoothing), events_jarque_bera (rational-moment normality
    #      omnibus, skewness emitted squared — no odd root).
    #   3. any r11 reds.
    #   4. oldest remaining single-green transcendental-bearing rows:
    #      tfidf_top_terms (r5), events_dp_release (r7),
    #      orders_cdc_apply (r7), maxsim_multivector_topk (r7),
    #      ann_recall_eval (r8), events_ab_conversion (r8).
    #   The only non-green latest-status row should remain
    #   bpe_vocab_merges (documented no_oracle exemption).
    # --- survival pair (integer-only hashed outputs)
    "customer_survival_curve",
    "customer_cumulative_hazard",
    "customer_survival_debug_gaps",
    "customer_survival_debug_lifetable",
    "customer_survival_debug_factors",
    "customer_survival_debug_fold",
    # --- the 39-name r10 backlog (exactly the no-driver-row set)
    "multimodal_wav_decode",
    "events_mcnemar_test",
    "orders_cochran_armitage",
    "events_gumbel_fit",
    "customer_concentration_hhi",
    "part_abc_classification",
    "classifier_ks_statistic",
    "events_friedman_test",
    "user_rfm_migration",
    "multimodal_wav_silence",
    "dedup_lsh_recall_eval",
    "events_hurst_exponent",
    "embedding_matryoshka_eval",
    "events_spc_xbar_r",
    "corpus_temperature_mixture",
    "user_power_law_mle",
    "text_burrows_delta",
    "corpus_dedup_cluster_sizes",
    "events_kruskal_wallis",
    "events_negbin_fit",
    "events_hill_tail_index",
    "events_odds_ratio",
    "classifier_mcc",
    "multimodal_ppm_decode",
    "ranker_map_eval",
    "corpus_ipf_mixture",
    "text_feature_hashing",
    "events_page_hinkley",
    "user_markov_stationary",
    "user_recs_hitrate",
    "corpus_neyman_allocation",
    "orders_promo_lift_did",
    "events_srm_check",
    "supplier_betweenness",
    "embedding_triplet_mining",
    "multimodal_ahash_dedup",
    "events_cramer_von_mises",
    "user_uplift_qini",
    "lineitem_theil_decomposition",
    # --- tie-class conversion re-checks
    "source_lang_divergence",
    "customer_logrank_test",
    "doc_unigram_logprob",
    "doc_bigram_perplexity",
    "events_chisq_independence",
]



def _apply_headline_order() -> None:
    global QUERIES, ORACLES
    assert len(HEADLINE) == 50, f"HEADLINE has {len(HEADLINE)} entries, want 50"
    assert len(set(HEADLINE)) == 50, "HEADLINE has duplicates"
    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in HEADLINE}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES = ordered
    ORACLES = {n: ORACLES[n] for n in QUERIES if n in ORACLES}


_apply_headline_order()
