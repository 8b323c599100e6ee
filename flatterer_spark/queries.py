"""Core relational query surface (SURVEY.md §2.5 / §2.6): Q01-Q33.

Each query is a (spark, sf_dir) -> DataFrame callable built with the
DataFrame API (declarative -> Catalyst optimizes: filter/column pushdown to
the parquet scan, broadcast of dimension tables, AQE for skew/partition
coalescing).  ``ORACLE`` holds the equivalent ANSI SQL that DuckDB runs on the
same parquet tables; column aliases match exactly so the driver's
sorted-by-name value hash lines up.

Cross-engine float discipline: we never rely on engine ROUND() semantics
(Spark rounds HALF_UP on the shortest decimal repr, DuckDB on scaled doubles
-- they disagree on x.xx5 edges).  Instead both sides compute
``floor(x * 10^s + 0.5) / 10^s`` in IEEE double arithmetic, which is
bit-identical across engines for identical inputs.

Scale notes (100 TB posture):
 - dimension tables (region, nation, supplier, part @ <1% of fact size) are
   explicitly ``broadcast()`` so fact tables never shuffle for those joins;
 - semi/anti joins pre-``distinct`` the probe side to shrink the build;
 - all aggregations are expressed as single groupBy/agg passes => Spark plans
   partial (map-side) + final aggregation automatically;
 - the events self-join (q17) equi-joins on (user_id, hour bucket) with
   adjacent-bucket probes -- interval banding, not a per-user cross join.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast
from pyspark.sql.types import LongType


#: Per-(session, sf_dir, file-fingerprint) memo of the base-table
#: DataFrames.  This caches the PLAN (resolved relation + schema), never
#: data: every consumer still scans the parquet at execution time.  A
#: ``spark.read.parquet`` costs a py4j round trip plus a JVM footer/schema
#: read per call, and multi-table queries (TPC-H 6-way joins) paid it per
#: table per invocation -- measured 0.4-0.9 s of pure query-BUILD time per
#: call at sf0.1, comparable to the queries' whole execution (r11
#: optimization round).  Keyed on the file fingerprint (mtime+size, the
#: same invalidation rule as every staged-view cache), so regenerated
#: testdata re-resolves instead of serving a stale schema.
_T_cache: dict[tuple, tuple] = {}


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from flatterer_spark.functions.fingerprint import table_fingerprint

    # one entry per (session, sf_dir, table); a changed file fingerprint
    # replaces that table's entry only (fresh_cache_key's whole-dataset
    # eviction would thrash a multi-table cache).  Keyed on applicationId,
    # not id(spark): a stopped session's Python object id can be reused by
    # a fresh SparkSession, which would serve a DataFrame bound to a dead
    # JVM session (VERDICT r11 #4); the applicationId is unique per
    # SparkContext lifetime.
    ident = (spark.sparkContext.applicationId, sf_dir, name)
    fp = table_fingerprint(sf_dir, name)
    hit = _T_cache.get(ident)
    if hit is not None and hit[0] == fp:
        return hit[1]
    df = _read_table(spark, sf_dir, name)
    _T_cache[ident] = (fp, df)
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Testdata generations have stored events.ts as either parquet
        # TIMESTAMP(MICROS) (reads natively as timestamp) or TIMESTAMP(NANOS)
        # (rejected by the vectorized reader; with nanosAsLong it arrives as
        # BIGINT nanos and must be truncated to micros in-plan -- integer
        # division, since double division loses precision at ~1e18 ns).
        # Branch on the dtype actually read so a testdata schema change can
        # never again break every events consumer at analysis time.  Both
        # engines compare at microsecond TIMESTAMP precision.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: Per-(session, sf_dir, query) memo of fully-BUILT query DataFrames for the
#: pure-plan builders (core q01-q46 and TPC-H q47-q60).  Same contract as
#: the ``T()`` memo one level up: this caches a resolved PLAN, never data --
#: every execution of the memoized DataFrame still scans the parquet (the
#: noop-sink bench and tests/test_r11_optimizations.py's
#: test_no_data_caching_in_plan see the scan in the executed plan).  What it
#: removes is the eager per-operation DataFrame-API analysis cost: building
#: a wide join chain issues one py4j round trip + one analysis pass per
#: operation, measured 0.3-0.9 s per invocation for the 6-way TPC-H joins
#: at sf0.1 -- comparable to their whole execution (VERDICT r11 #5).  Keyed
#: on applicationId (liveness-aware, same rule as ``T()``) and invalidated
#: by the mtime+size fingerprint of EVERY dataset table, so regenerated
#: testdata rebuilds the plan.  Only pure plan builders are wrapped:
#: operators with staging/drain side effects (ext/streaming) must re-run
#: their builders every call and are deliberately not memoized.
_PLAN_CACHE: dict[tuple, tuple] = {}

#: Tables whose fingerprints gate plan-memo freshness (the whole dataset:
#: coarser than per-query table sets, but always correct and ~10 os.stat
#: calls per lookup).
_DATASET_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def plan_memo(name: str, fn: Callable) -> Callable:
    """Wrap a pure (spark, sf_dir) -> DataFrame builder with the plan memo."""
    from flatterer_spark.functions.fingerprint import table_fingerprint

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ident = (spark.sparkContext.applicationId, sf_dir, name)
        fp = tuple(table_fingerprint(sf_dir, t) for t in _DATASET_TABLES)
        hit = _PLAN_CACHE.get(ident)
        if hit is not None and hit[0] == fp:
            return hit[1]
        df = fn(spark, sf_dir)
        _PLAN_CACHE[ident] = (fp, df)
        return df

    run.__name__ = getattr(fn, "__name__", name)
    run.__doc__ = fn.__doc__
    run.__wrapped__ = fn
    return run


def round_half_up(col, scale: int = 2):
    """Cross-engine deterministic 2-decimal rounding (see module docstring)."""
    m = 10 ** scale
    return F.floor(col * m + F.lit(0.5)) / m


def _sql_round(expr: str, scale: int = 2) -> str:
    m = 10 ** scale
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


# ---------------------------------------------------------------------------
# Q01 scan + project + filter
# ---------------------------------------------------------------------------

def q01_filter_project(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# Q02 equi inner join over the dimension chain (broadcast both dims)

def q02_join_dims(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    return (
        customer
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    )


# Q03 left join + COUNT over possibly-null side (zero preserved)

def q03_left_join_count(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy("c_custkey")
    )


# Q04 semi join (EXISTS)

def q04_semi_join(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    open_orders = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# Q05 anti join (NOT EXISTS); distinct the probe keys so the broadcast/build
# side is minimal at scale.

def q05_anti_join(spark, sf_dir):
    part = T(spark, sf_dir, "part")
    ordered_parts = (
        T(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select("l_partkey")
        .distinct()
    )
    return (
        part.join(ordered_parts, part.p_partkey == ordered_parts.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# Q06 hash aggregate (TPC-H Q1 core) — partial+final agg, 2-col group key

def q06_groupby_agg(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity")).alias("sum_qty"),
            round_half_up(F.avg("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Q07 multi countDistinct (expands to expand+two-phase agg in Spark)

def q07_count_distinct(spark, sf_dir):
    return T(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
    )


# Q08 rollup (nation, customer) revenue

def q08_rollup(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    nation = T(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.rollup("n_name", "c_name")
        .agg(round_half_up(F.sum("o_totalprice")).alias("revenue"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("c_name"))
    )


# Q09 window ranking: top-3 orders per customer

def q09_window_rank(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        T(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# Q10 window frame: running sum per user over event time

def q10_window_frame(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        T(spark, sf_dir, "events")
        .withColumn("running_value", round_half_up(F.sum("value").over(w)))
        .select("user_id", "ts", "event_id", "running_value")
        .orderBy("user_id", "ts", "event_id")
    )


# Q11 global top-k (sort + limit => Spark TakeOrderedAndProject, no full sort)

def q11_topk(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# Q12 set ops: INTERSECT then EXCEPT (distinct set semantics on both engines)

def q12_set_ops(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    with_orders = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    positive = customer.where(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return with_orders.intersect(positive).subtract(building).orderBy("custkey")


# Q13 string functions

def q13_string_fns(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 10).alias("name_prefix"),
            F.length("p_type").cast("long").alias("type_len"),
        )
        .orderBy("p_partkey")
    )


# Q14 date functions: orders per year + first/last order timestamp

def q14_date_fns(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("order_year")
    )


# Q14b shipdate min/max per year from lineitem

def q14b_ship_years(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("ship_year")
    )


# Q15 math / CASE bucketing

def q15_case_math(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            bucket.alias("discount_bucket"),
            round_half_up(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


# Q16 JSON scalar extraction (events.props is a JSON string column)

def q16_json_extract(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .orderBy("event_id")
    )


# Q17 range self-join: event pairs within 1h per user.  Equi on user_id with
# the time-band predicate in the join condition; pure timestamp comparison so
# no session-timezone dependence.

def q17_range_join(spark, sf_dir):
    """Banded range self-join: pairs of same-user events within 1 hour.

    The classic interval-banding rewrite -- bucket each event into its hour,
    probe (own, -1h, +1h) buckets, and hash-join on (user_id, bucket) before
    the exact band filter.  Any |ts1-ts2| < 1h pair differs by at most one
    bucket, so the banding is lossless; each (e1, e2) pair matches exactly
    one probe (e2 carries a single bucket), so no dedup is needed.  Candidate
    volume drops from all same-user pairs (quadratic in per-user event
    count) to same-user pairs in adjacent hours -- the property that keeps
    this linear-ish as the per-user history grows 100x."""
    e = T(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    b1 = F.date_trunc("hour", F.col("ts1"))
    e1 = e.select(
        F.col("user_id").alias("u1"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("ts1"),
    ).withColumn("pb", F.explode(F.array(b1 - hour, b1, b1 + hour)))
    e2 = e.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"),
    ).withColumn("b2", F.date_trunc("hour", F.col("ts2")))
    pairs = e1.join(
        e2,
        (F.col("u1") == F.col("u2"))
        & (F.col("pb") == F.col("b2"))
        & (F.col("id1") < F.col("id2"))
        & (F.col("ts2") > F.col("ts1") - hour)
        & (F.col("ts2") < F.col("ts1") + hour),
    )
    return (
        pairs.groupBy(F.col("u1").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy("user_id")
    )


# Q18 correlated subquery via decorrelation: per-nation average then join.

def q18_correlated(spark, sf_dir):
    customer = T(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        customer.join(broadcast(nation_avg.withColumnRenamed("c_nationkey", "nk")),
                      F.col("c_nationkey") == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", round_half_up(F.col("c_acctbal")).alias("acctbal"))
        .orderBy("c_custkey")
    )


# Q21 as-of join: for each click, the most recent purchase by the same user.
# Spark-first plan: tag-union + running last() window -- one shuffle on
# user_id, no range join, no skew (the classic scalable as-of pattern).
# The oracle uses DuckDB's native ASOF JOIN; to keep the result deterministic
# under ties we output the matched purchase *timestamp* (max ts <= click ts),
# not an arbitrary matched row id.

def q21_asof_join(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    tagged = clicks.withColumn("tag", F.lit(1)).unionByName(
        purchases.withColumn("event_id", F.lit(None).cast("long")).withColumn(
            "tag", F.lit(0)
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_purchase_ts",
            F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .where(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "last_purchase_ts")
        .orderBy("event_id")
    )


# Q22 cube: revenue by (nation, order status) over all grouping combinations

def q22_cube(spark, sf_dir):
    orders = T(spark, sf_dir, "orders")
    customer = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return (
        joined.cube("n_name", "o_orderstatus")
        .agg(
            round_half_up(F.sum("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_orderstatus"))
    )


# Q23 pivot: event counts per user across fixed event types

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q23_pivot(spark, sf_dir):
    pivoted = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES],
    ).orderBy("user_id")


# Q24 analytic window functions: lag/lead/ntile per user over event time

def q24_window_analytics(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            round_half_up(F.lag("value", 1).over(w)).alias("prev_value"),
            round_half_up(F.lead("value", 1).over(w)).alias("next_value"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("event_id")
    )


# Q25 unpivot/melt: wide orders metrics -> long (id, metric, val) form

def q25_unpivot(spark, sf_dir):
    orders = T(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return (
        wide.unpivot(
            ids=["o_orderkey"],
            values=["totalprice", "custkey"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .select("o_orderkey", "metric", round_half_up(F.col("val")).alias("val"))
        .orderBy("o_orderkey", "metric")
    )


def q26_salted_join(spark, sf_dir):
    """Skew-proof join in the correctness gate: the Spark side runs the
    salted rewrite (operators/skew.py); the oracle is the PLAIN equi-join --
    hash-equality proves salting changes nothing but the shuffle layout."""
    from flatterer_spark.operators.skew import salted_join

    events = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = T(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS user_id", "c_mktsegment"
    )
    return (
        salted_join(events, dim, "user_id", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "c_mktsegment",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


# Q27 batch sessionization (gaps-and-islands): the batch counterpart of the
# streaming sessionize operator.  Per user, a >30-minute gap starts a new
# session; running sum of the break flags numbers sessions.  INTERVAL
# arithmetic keeps the gap comparison exact and timezone-free in both
# engines; durations compare at microsecond precision (timestampdiff vs
# date_diff both count exact micros on micros-aligned values).  Scale shape:
# two window passes + one groupBy, all partitioned by user_id -- one shuffle.

def q27_sessionize(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    brk = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("brk", brk)
        .withColumn("session_seq", F.sum("brk").over(wrun).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .withColumn(
            "duration_us",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            ).cast("long"),
        )
        .orderBy("user_id", "session_seq")
    )


# Q28 exact grouped percentiles: Spark percentile() and DuckDB quantile_cont
# share the linear-interpolation definition, so grouped quartiles compare
# bit-for-bit after the deterministic rounding.  Partial+final aggregation
# applies (percentile partials are per-group sorted buffers); at real scale
# swap approx_percentile for the t-digest sketch path.

def q28_percentiles(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            round_half_up(F.expr("percentile(o_totalprice, 0.25D)")).alias("p25"),
            round_half_up(F.expr("percentile(o_totalprice, 0.5D)")).alias("p50"),
            round_half_up(F.expr("percentile(o_totalprice, 0.75D)")).alias("p75"),
            round_half_up(F.expr("percentile(o_totalprice, 0.9D)")).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


# Q29 keep-latest (CDC-style dedup): newest event per (user_id, event_type).
# The standard upsert-compaction shape -- one window over the key partition,
# rank 1 survives.  At scale this is the merge-on-read compaction pass; the
# shuffle keys on the dedup key, and AQE handles the residual skew.

def q29_keep_latest(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id", "user_id", "event_type", "ts",
            round_half_up(F.col("value")).alias("value"),
        )
        .orderBy("event_id")
    )


# Q30 ordered funnel: users reaching view -> click-after-view ->
# purchase-after-click, greedy earliest-completion semantics (each stage
# anchors on the MIN qualifying timestamp after the previous stage).  Three
# filtered aggregates chained by equi-joins on user_id -- each stage's output
# shrinks, so at scale the later joins broadcast.

def q30_funnel(spark, sf_dir):
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prev, etype, tcol, prev_tcol):
        s = e.where(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").where(F.col("ts") > F.col(prev_tcol))
        return s.groupBy("user_id").agg(F.min("ts").alias(tcol))

    v = stage(None, "view", "t1", None)
    c = stage(v, "click", "t2", "t1")
    p = stage(c, "purchase", "t3", "t2")

    def count_of(df, name):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")) \
                 .select(F.lit(name).alias("stage"), "n_users")

    return (
        count_of(v, "1_view")
        .unionAll(count_of(c, "2_click"))
        .unionAll(count_of(p, "3_purchase"))
        .orderBy("stage")
    )


# Q31 grouped standardization: per-event-type z-scores.  One tiny grouped
# moment aggregate broadcast back onto the fact table -- the feature-scaling
# pass of a numeric pipeline; fact rows never shuffle.

def q31_zscore(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
    )
    return (
        e.join(broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            # NULLIF(sd, 0): a degenerate all-identical group gives sd=0,
            # where Spark/DuckDB divide-by-zero semantics differ (NULL vs
            # inf); both engines yield NULL here so the oracle hash holds
            # under data drift.
            round_half_up((F.col("value") - F.col("mu"))
                          / F.nullif(F.col("sd"), F.lit(0.0)))
            .alias("z"),
        )
        .orderBy("event_id")
    )


# Q32 daily new + cumulative users: first-seen date per user (one groupBy),
# daily counts, then a running sum over the tiny per-day table -- the
# cumulative window touches ~days rows, never the fact table, so the
# single-partition window is over a broadcast-sized frame.

def q32_daily_actives(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).cast("timestamp_ntz").alias("d")
    )
    per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    return (
        per_day.withColumn("cum_users", F.sum("new_users").over(w).cast("long"))
        .orderBy("d")
    )


# Q33 retention cohorts: users bucketed by first-seen week, activity counted
# per weeks-since-cohort offset.  Two grouped aggregates joined on user_id;
# the cohort dim is derived, not shuffled separately.

def q33_retention(spark, sf_dir):
    e = T(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    cohort = e.groupBy("user_id").agg(F.min("d").alias("c0"))
    return (
        e.join(cohort, "user_id")
        .withColumn("week_offset",
                    (F.datediff(F.col("d"), F.col("c0")) / 7).cast("long"))
        .groupBy(
            F.date_trunc("week", F.col("c0")).cast("timestamp_ntz")
            .alias("cohort_week"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# Q34 fixed-width histogram over events.value: the bucket index is plain
# arithmetic (DuckDB has no width_bucket), computed identically on both
# engines; one partial+final agg over at most n_buckets+2 groups.

def q34_histogram(spark, sf_dir, lo=0.0, hi=400.0, nb=16):
    step = (hi - lo) / nb
    e = T(spark, sf_dir, "events")
    bucket = F.least(
        F.lit(nb + 1),
        F.greatest(F.lit(0), (F.floor((F.col("value") - lo) / step) + 1)),
    ).cast("long")
    return (
        e.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            round_half_up(F.min("value")).alias("min_val"),
            round_half_up(F.max("value")).alias("max_val"),
        )
        .orderBy("bucket")
    )


# Q35 TPC-H Q3-style shipping priority: two shuffle joins feeding a grouped
# revenue agg, top-10 by rounded revenue (TakeOrderedAndProject; ties broken
# on the unique order key so the cut is deterministic).

def q35_shipping_priority(spark, sf_dir):
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    l = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# Q36 TPC-H Q4-style order priority check: orders in a 1-year window with at
# least one lineitem shipped >30 days after the order date.  Left-semi join
# with a non-equi residual -- Spark plans the equi part (orderkey) as the
# shuffle key and evaluates the interval predicate as a join residual, so the
# fact tables shuffle exactly once each.

def q36_order_priority(spark, sf_dir):
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# Q37 TPC-H Q13-style customer order distribution: LEFT join so zero-order
# customers land in the n_orders=0 bucket, then a histogram of the counts.
# Two aggs: the first shuffles on the uniform c_custkey, the second is tiny.

def q37_cust_distribution(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).cast("long").alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("n_orders"))
    )


# Q38 TPC-H Q14-style promo revenue share: conditional aggregate ratio over
# one broadcast join (part is a dimension); a single partial+final agg pass,
# one output row.

def q38_promo_revenue(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(broadcast(p), l.l_partkey == p.p_partkey).agg(
        round_half_up(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            3,
        ).alias("promo_pct")
    )


# Q39 TPC-H Q15-style top supplier: per-supplier quarterly revenue, keep the
# supplier(s) hitting the global max (scalar-subquery pattern; the max is a
# 1-row broadcast, never a second shuffle of the fact).  Revenue is rounded
# BEFORE the max comparison so tie semantics are identical cross-engine.

def q39_top_supplier(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = l.groupBy("l_suppkey").agg(
        round_half_up(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(broadcast(mx), rev.total_rev == mx.mx)
        .join(broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# Q40 TPC-H Q10-style returned items: three joins (two shuffle facts + one
# broadcast dim) into a grouped revenue agg, top-20 via TakeOrderedAndProject
# with the unique c_custkey as tiebreaker.

def q40_returned_items(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# Q41 explicit GROUPING SETS (distinct from rollup/cube: an arbitrary set
# list) with grouping_id disambiguating the all-NULL group from a NULL key.
# Spark expands the sets once (Expand node) and aggregates partial+final --
# one shuffle regardless of how many sets are requested.

def q41_grouping_sets(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            round_half_up(F.sum("o_totalprice")).alias("sum_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# Q42 RANGE window frame (value-based, vs q10's ROWS frame): trailing 1-hour
# per-user running stats.  The frame key is integer epoch seconds so both
# engines bound the frame identically; one hash partition on user_id, frames
# evaluated within the partition sort -- a single shuffle.

def q42_range_frame(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    # ntz -> ltz -> epoch seconds; any session-tz offset is a CONSTANT shift,
    # and RANGE frame membership depends only on differences, so the frame is
    # tz-invariant.
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            round_half_up(F.sum("value").over(w)).alias("trail_1h_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("trail_1h_n"),
        )
        .orderBy("event_id")
    )


# Q43 TPC-H Q2-style correlated min: for each part, the supplier(s) whose
# account balance hits that part's per-part maximum among its suppliers
# (synthetic part-supplier affinity: s_suppkey % 50 == p_partkey % 50 keeps
# the join selective without a partsupp table).  Catalyst decorrelates the
# "= (SELECT MAX ...)" into a grouped max joined back on the correlation key
# -- one extra agg shuffle, not a per-row subquery loop.

def q43_min_cost_supplier(spark, sf_dir):
    p = T(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    pairs = p.join(
        s, (F.col("p_partkey") % 50) == (F.col("s_suppkey") % 50)
    )
    best = pairs.groupBy("p_partkey").agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        pairs.join(broadcast(best), "p_partkey")
        .where(F.col("s_acctbal") == F.col("best_bal"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            round_half_up(F.col("s_acctbal")).alias("s_acctbal"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


# Q44 robust outliers via MAD (median absolute deviation): per-event-type
# exact median, then the exact median of |value - median|, then every event
# further than 3 MADs flagged.  Two grouped exact-quantile aggs (sorted agg
# buffers) + broadcast moments back onto the fact -- the robust-statistics
# cousin of q31's z-score, immune to the outliers it hunts.

def q44_mad_outliers(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        e.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    return (
        e.join(broadcast(dev), "event_type")
        .where(F.col("value") > F.col("med") + 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            round_half_up(F.col("value")).alias("value"),
            round_half_up(F.col("med")).alias("med"),
            round_half_up(F.col("mad")).alias("mad"),
        )
        .orderBy("event_id")
    )


# Q45 TPC-H Q22-style: high-balance customers (above the positive-balance
# average -- a scalar subquery, broadcast as a 1-row literal join) with no
# RECENT orders (NOT EXISTS -> left-anti join).  Q22's literal "no orders
# ever" predicate is empty on this testdata (every customer below sf0.1 has
# at least one order), so dormancy is "no order since 1999-01-01" -- the
# same anti-join shape, nonempty and selective at every scale (2/14/148
# customers at sf0.001/0.01/0.1).  The anti join probe side filters to
# recent orders then pre-distincts o_custkey so the build shrinks to
# unique keys before shuffling.

def q45_dormant_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            round_half_up(F.sum("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# Q46 rank-statistics windows: decile bucket (ntile), percent_rank and
# cume_dist per order-priority partition.  The window order includes the
# unique o_orderkey tiebreaker so every rank function is total-order
# deterministic on both engines; one hash partition + sort, no extra
# shuffle.

def q46_rank_stats(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            round_half_up(F.col("o_totalprice")).alias("o_totalprice"),
            F.ntile(10).over(w).cast("long").alias("decile"),
            round_half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
            round_half_up(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


# Q61 FULL OUTER JOIN reconciliation -- the one join type the registry
# lacked.  Monthly booked revenue (orders) vs monthly shipped revenue
# (lineitem): a month present on one side only surfaces with NULLs on the
# other.  Scale shape: both inputs are partial+final aggregates down to
# ~tens of month rows BEFORE the join -- the full-outer join never touches
# a fact table, so its (unavoidably) shuffle-based full-outer exchange
# moves metadata-sized input.

def q61_full_outer_reconcile(spark, sf_dir):
    o = (
        T(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(round_half_up(F.sum("o_totalprice")).alias("booked"))
    )
    l = (
        T(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("shipped")
        )
    )
    gap = F.coalesce(F.col("booked"), F.lit(0.0)) - F.coalesce(
        F.col("shipped"), F.lit(0.0)
    )
    return (
        o.join(l, "month", "full_outer")
        .select("month", "booked", "shipped", round_half_up(gap).alias("gap"))
        .orderBy("month")
    )


CORE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_filter_project": q01_filter_project,
    "q02_join_dims": q02_join_dims,
    "q03_left_join_count": q03_left_join_count,
    "q04_semi_join": q04_semi_join,
    "q05_anti_join": q05_anti_join,
    "q06_groupby_agg": q06_groupby_agg,
    "q07_count_distinct": q07_count_distinct,
    "q08_rollup": q08_rollup,
    "q09_window_rank": q09_window_rank,
    "q10_window_frame": q10_window_frame,
    "q11_topk": q11_topk,
    "q12_set_ops": q12_set_ops,
    "q13_string_fns": q13_string_fns,
    "q14_date_fns": q14_date_fns,
    "q14b_ship_years": q14b_ship_years,
    "q15_case_math": q15_case_math,
    "q16_json_extract": q16_json_extract,
    "q17_range_join": q17_range_join,
    "q18_correlated": q18_correlated,
    "q21_asof_join": q21_asof_join,
    "q22_cube": q22_cube,
    "q23_pivot": q23_pivot,
    "q24_window_analytics": q24_window_analytics,
    "q25_unpivot": q25_unpivot,
    "q26_salted_join": q26_salted_join,
    "q27_sessionize": q27_sessionize,
    "q28_percentiles": q28_percentiles,
    "q29_keep_latest": q29_keep_latest,
    "q30_funnel": q30_funnel,
    "q31_zscore": q31_zscore,
    "q32_daily_actives": q32_daily_actives,
    "q33_retention": q33_retention,
    "q34_histogram": q34_histogram,
    "q35_shipping_priority": q35_shipping_priority,
    "q36_order_priority": q36_order_priority,
    "q37_cust_distribution": q37_cust_distribution,
    "q38_promo_revenue": q38_promo_revenue,
    "q39_top_supplier": q39_top_supplier,
    "q40_returned_items": q40_returned_items,
    "q41_grouping_sets": q41_grouping_sets,
    "q42_range_frame": q42_range_frame,
    "q43_min_cost_supplier": q43_min_cost_supplier,
    "q44_mad_outliers": q44_mad_outliers,
    "q45_dormant_customers": q45_dormant_customers,
    "q46_rank_stats": q46_rank_stats,
    "q61_full_outer_reconcile": q61_full_outer_reconcile,
}

# every core builder is a pure plan builder (no temp views, no staging, no
# nondeterminism) -- wrap them all in the build-once plan memo
CORE_QUERIES = {k: plan_memo(k, fn) for k, fn in CORE_QUERIES.items()}


CORE_ORACLE: dict[str, str] = {
    "q01_filter_project": """
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_orderkey
    """,
    "q02_join_dims": """
        SELECT c_custkey, c_name, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        ORDER BY c_custkey
    """,
    "q03_left_join_count": """
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "q04_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey
    """,
    "q05_anti_join": """
        SELECT p_partkey, p_name FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity > 45)
        ORDER BY p_partkey
    """,
    "q06_groupby_agg": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_round('SUM(l_quantity)')} AS sum_qty,
               {_sql_round('AVG(l_extendedprice)')} AS avg_price,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q07_count_distinct": """
        SELECT COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
               COUNT(DISTINCT l_partkey) AS distinct_parts
        FROM lineitem
    """,
    "q08_rollup": f"""
        SELECT n_name, c_name, {_sql_round('SUM(o_totalprice)')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_name)
        ORDER BY n_name NULLS FIRST, c_name NULLS FIRST
    """,
    "q09_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    "q10_window_frame": f"""
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
                   FROM events)
        SELECT user_id, ts, event_id,
               {_sql_round('''SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
                   AS running_value
        FROM e
        ORDER BY user_id, ts, event_id
    """,
    "q11_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "q12_set_ops": """
        SELECT custkey FROM (
            (SELECT DISTINCT o_custkey AS custkey FROM orders)
            INTERSECT
            (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
            EXCEPT
            (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        ) ORDER BY custkey
    """,
    "q13_string_fns": """
        SELECT p_partkey, UPPER(p_brand) AS brand_upper,
               SUBSTR(p_name, 1, 10) AS name_prefix,
               LENGTH(p_type) AS type_len
        FROM part ORDER BY p_partkey
    """,
    "q14_date_fns": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
               COUNT(*) AS order_count,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders GROUP BY order_year ORDER BY order_year
    """,
    "q14b_ship_years": """
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
               MIN(l_shipdate) AS min_ship,
               MAX(l_shipdate) AS max_ship,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY ship_year ORDER BY ship_year
    """,
    "q15_case_math": f"""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount < 0.03 THEN 'low'
                    WHEN l_discount < 0.07 THEN 'mid'
                    ELSE 'high' END AS discount_bucket,
               {_sql_round('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 100
    """,
    "q16_json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events ORDER BY event_id
    """,
    "q17_range_join": """
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT e1.user_id AS user_id, COUNT(*) AS pair_count
        FROM e e1
        JOIN e e2
          ON e1.user_id = e2.user_id
         AND e1.event_id < e2.event_id
         AND e2.ts > e1.ts - INTERVAL 1 HOUR
         AND e2.ts < e1.ts + INTERVAL 1 HOUR
        GROUP BY e1.user_id
        ORDER BY user_id
    """,
    "q18_correlated": f"""
        SELECT c_custkey, c_name, {_sql_round('c_acctbal')} AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
    """,
    "q21_asof_join": """
        WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
        clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts FROM e WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, c.ts, p.ts AS last_purchase_ts
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.ts <= c.ts
        ORDER BY c.event_id
    """,
    "q22_cube": f"""
        SELECT n_name, o_orderstatus,
               {_sql_round('SUM(o_totalprice)')} AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY CUBE (n_name, o_orderstatus)
        ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    "q23_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click')    AS click,
               COUNT(*) FILTER (event_type = 'error')    AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup')   AS signup,
               COUNT(*) FILTER (event_type = 'view')     AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q24_window_analytics": f"""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                   FROM events)
        SELECT event_id, user_id,
               {_sql_round('LAG(value, 1) OVER w')} AS prev_value,
               {_sql_round('LEAD(value, 1) OVER w')} AS next_value,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "q25_unpivot": f"""
        SELECT o_orderkey, 'totalprice' AS metric,
               {_sql_round('CAST(o_totalprice AS DOUBLE)')} AS val
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey' AS metric,
               {_sql_round('CAST(o_custkey AS DOUBLE)')} AS val
        FROM orders
        ORDER BY o_orderkey, metric
    """,
    # oracle for the SALTED Spark join is the plain join: salting must be
    # invisible in the result
    "q26_salted_join": """
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "q27_sessionize": """
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
        g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, event_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS session_seq
            FROM g
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
                   AS duration_us
        FROM s GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    "q28_percentiles": f"""
        SELECT o_orderpriority,
               {_sql_round('quantile_cont(o_totalprice, 0.25)')} AS p25,
               {_sql_round('quantile_cont(o_totalprice, 0.5)')} AS p50,
               {_sql_round('quantile_cont(o_totalprice, 0.75)')} AS p75,
               {_sql_round('quantile_cont(o_totalprice, 0.9)')} AS p90
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q29_keep_latest": f"""
        WITH e AS (SELECT event_id, user_id, event_type,
                          CAST(ts AS TIMESTAMP) AS ts, value
                   FROM events),
        r AS (
            SELECT event_id, user_id, event_type, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT event_id, user_id, event_type, ts,
               {_sql_round('value')} AS value
        FROM r WHERE rn = 1
        ORDER BY event_id
    """,
    "q30_funnel": """
        WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
        v AS (SELECT user_id, MIN(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t2
              FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS t3
              FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
        ORDER BY stage
    """,
    "q31_zscore": f"""
        WITH s AS (SELECT event_type, AVG(value) AS mu,
                          STDDEV_SAMP(value) AS sd
                   FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type,
               {_sql_round('(e.value - s.mu) / NULLIF(s.sd, 0)')} AS z
        FROM events e JOIN s ON e.event_type = s.event_type
        ORDER BY e.event_id
    """,
    "q32_daily_actives": """
        WITH f AS (SELECT user_id, CAST(MIN(CAST(ts AS DATE)) AS TIMESTAMP)
                       AS d
                   FROM events GROUP BY user_id),
        p AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY d)
        SELECT d, new_users,
               CAST(SUM(new_users) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_users
        FROM p ORDER BY d
    """,
    "q33_retention": """
        WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        c AS (SELECT user_id, MIN(d) AS c0 FROM e GROUP BY user_id)
        SELECT CAST(date_trunc('week', c.c0) AS TIMESTAMP) AS cohort_week,
               CAST(date_diff('day', c.c0, e.d) // 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM e JOIN c ON e.user_id = c.user_id
        GROUP BY date_trunc('week', c.c0),
                 date_diff('day', c.c0, e.d) // 7
        ORDER BY cohort_week, week_offset
    """,
    "q34_histogram": f"""
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {_sql_round('MIN(value)')} AS min_val,
               {_sql_round('MAX(value)')} AS max_val
        FROM (
            SELECT CAST(LEAST(17, GREATEST(0,
                       FLOOR((value - 0.0) / 25.0) + 1)) AS BIGINT) AS bucket,
                   value
            FROM events
        ) t
        GROUP BY bucket ORDER BY bucket
    """,
    "q35_shipping_priority": f"""
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               {_sql_round('SUM(l.l_extendedprice * (1 - l.l_discount))')}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND l.l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    "q36_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q37_cust_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_custs
        FROM per_cust
        GROUP BY n_orders
        ORDER BY n_custs DESC, n_orders DESC
    """,
    "q38_promo_revenue": f"""
        SELECT {_sql_round(
            "100.0 * SUM(CASE WHEN p.p_type = 'PROMO' "
            "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) "
            "/ SUM(l.l_extendedprice * (1 - l.l_discount))", 3)} AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
    """,
    "q39_top_supplier": f"""
        WITH r AS (
            SELECT l_suppkey,
                   {_sql_round('SUM(l_extendedprice * (1 - l_discount))')}
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM r)
        ORDER BY s.s_suppkey
    """,
    "q40_returned_items": f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_sql_round('SUM(l.l_extendedprice * (1 - l.l_discount))')}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    "q41_grouping_sets": f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {_sql_round('SUM(o_totalprice)')} AS sum_price,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "q42_range_frame": f"""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                          value,
                          CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                              AS sec
                   FROM events)
        SELECT event_id, user_id, ts,
               {_sql_round('SUM(value) OVER w')} AS trail_1h_sum,
               CAST(COUNT(*) OVER w AS BIGINT) AS trail_1h_n
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "q43_min_cost_supplier": f"""
        WITH pairs AS (
            SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal
            FROM part p JOIN supplier s
              ON p.p_partkey % 50 = s.s_suppkey % 50
        )
        SELECT p_partkey, p_name, s_suppkey, s_name,
               {_sql_round('s_acctbal')} AS s_acctbal
        FROM pairs x
        WHERE s_acctbal = (SELECT MAX(y.s_acctbal) FROM pairs y
                           WHERE y.p_partkey = x.p_partkey)
        ORDER BY p_partkey, s_suppkey
    """,
    "q44_mad_outliers": f"""
        WITH m AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ),
        d AS (
            SELECT e.event_type, MIN(m.med) AS med,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN m ON e.event_type = m.event_type
            GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type,
               {_sql_round('e.value')} AS value,
               {_sql_round('d.med')} AS med,
               {_sql_round('d.mad')} AS mad
        FROM events e JOIN d ON e.event_type = d.event_type
        WHERE e.value > d.med + 3 * d.mad
        ORDER BY e.event_id
    """,
    "q45_dormant_customers": f"""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_custs,
               {_sql_round('SUM(c.c_acctbal)')} AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "q46_rank_stats": f"""
        SELECT o_orderkey, o_orderpriority,
               {_sql_round('o_totalprice')} AS o_totalprice,
               CAST(NTILE(10) OVER w AS BIGINT) AS decile,
               {_sql_round('PERCENT_RANK() OVER w', 6)} AS pct_rank,
               {_sql_round('CUME_DIST() OVER w', 6)} AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey
    """,
    "q61_full_outer_reconcile": f"""
        WITH b AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   {_sql_round('SUM(o_totalprice)')} AS booked
            FROM orders GROUP BY 1
        ),
        s AS (
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   {_sql_round('SUM(l_extendedprice * (1 - l_discount))')}
                       AS shipped
            FROM lineitem GROUP BY 1
        )
        SELECT COALESCE(b.month, s.month) AS month, booked, shipped,
               {_sql_round('COALESCE(booked, 0) - COALESCE(shipped, 0)')}
                   AS gap
        FROM b FULL OUTER JOIN s ON b.month = s.month
        ORDER BY month
    """,
}
