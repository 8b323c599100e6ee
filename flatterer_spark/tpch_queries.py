"""TPC-H completion set: q47-q59 (the 13 TPC-H queries not yet covered).

Together with queries.py (Q2=q43, Q3=q35, Q4=q36, Q10=q40, Q13=q37,
Q14=q38, Q15=q39, Q22=q45) this makes all 22 TPC-H queries expressible on
the driver testdata.  Columns missing from the testdata (notably the whole
``partsupp`` table) are adapted, never faked silently -- every adaptation
is named in the query docstring; Q20's availability predicate (q60) is the
deepest such surrogate and says so.

Reference parity: kindly/flatterer's query surface is the flatten +
relational pipeline (SURVEY.md §2.5/§2.6); these queries extend the same
relational families (multi-way joins, correlated/decorrelated subqueries,
conditional aggregation) to the full TPC-H shape list.

Scale posture (same conventions as queries.py, module docstring there):
 - region/nation/supplier/part are broadcast (sub-percent of fact size);
 - customer/orders/lineitem join by shuffle on their natural keys --
   uniform keys, partial+final aggregation everywhere;
 - correlated subqueries are written pre-decorrelated (grouped agg joined
   back / 1-row broadcast scalar), so no per-row subquery loop exists at
   any scale;
 - threshold comparisons against float aggregates are made on ROUNDED
   values on both engines (see q53) so last-ulp accumulation-order noise
   cannot flip a row in or out of the result.

Cross-engine float discipline: identical to queries.py -- deterministic
``floor(x * 10^s + 0.5) / 10^s`` rounding, never engine ROUND().
Quantity sums/averages are exact (integer-valued doubles below 2^53), so
q56/q57 thresholds are bit-identical across engines by construction.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from flatterer_spark.queries import T, _sql_round, plan_memo, round_half_up

_TS = "timestamp_ntz"


def _ts(s: str):
    return F.lit(s).cast(_TS)


# ---------------------------------------------------------------------------
# q47 TPC-H Q1: pricing summary report.  The canonical full-scan partial+final
# aggregation: one filter pushed to the parquet scan, one shuffle of 6 tiny
# group rows.  Faithful in shape (all Q1 columns exist in the testdata);
# adaptation: the spec's cutoff DATE '1998-12-01' - interval [60..120] days
# falls outside this testdata's shipdate domain, so the filter constant is
# '2001-09-01' (same selectivity role: keeps ~all but the trailing months).
# ---------------------------------------------------------------------------

def q47_pricing_summary(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= _ts("2001-09-01"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity")).alias("sum_qty"),
            round_half_up(F.sum("l_extendedprice")).alias("sum_base_price"),
            round_half_up(F.sum(disc_price)).alias("sum_disc_price"),
            round_half_up(F.sum(charge)).alias("sum_charge"),
            round_half_up(F.avg("l_quantity"), 4).alias("avg_qty"),
            round_half_up(F.avg("l_extendedprice"), 4).alias("avg_price"),
            round_half_up(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# q48 TPC-H Q5: local supplier volume.  Six-way join where customer and
# supplier must share a nation: suppliers are pre-restricted to the ASIA
# region through the broadcast nation/region dims (so the fact join builds
# against an already-small supplier set), lineitem shuffles once on
# l_orderkey, and the c_nationkey = s_nationkey condition rides as an
# equi-key of the broadcast supplier join.  Faithful.

def q48_local_supplier_volume(spark, sf_dir):
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation").join(
        broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = T(spark, sf_dir, "supplier").join(
        broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# q49 TPC-H Q6: forecasting revenue change.  Pure scan-side query: every
# predicate (date window, discount band, quantity cap) is pushed to the
# parquet reader, then a single global sum -- the plan is one scan + one
# 1-row aggregate exchange.  Faithful.

def q49_forecast_revenue(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        round_half_up(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue"
        )
    )


# q50 TPC-H Q7: volume shipping between two nations.  Both nation lookups are
# the same 25-row broadcast; the (supp_nation, cust_nation) pair filter is a
# residual on broadcast-joined columns, so the facts shuffle only on their
# natural join keys.  Adaptation: l_year from l_shipdate (faithful -- Q7
# defines l_year exactly this way); nations NATION_12/NATION_10 stand in for
# FRANCE/GERMANY (a pair populated at every testdata scale).

def q50_volume_shipping(spark, sf_dir):
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# q51 TPC-H Q8: national market share.  The all_nations subquery becomes one
# joined fact stream; the share is a conditional-aggregate ratio per year
# (same pattern as q38, but grouped).  Adaptations: customer region ASIA,
# part type PROMO, share nation NATION_3; o_year from o_orderdate (faithful).

def q51_market_share(spark, sf_dir):
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = T(spark, sf_dir, "nation").join(
        broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = T(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n2), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round_half_up(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# q52 TPC-H Q9: product type profit.  Adaptation (no partsupp): supply cost
# is modeled as 10% of the part's retail price per unit
# (``p_retailprice * l_quantity * 0.1``), keeping Q9's exact shape -- a
# part-name LIKE filter, a 4-way fact/dim join, profit grouped by supplier
# nation and order year.  '%red%' stands in for '%green%' (testdata p_name
# vocabulary).

def q52_product_profit(spark, sf_dir):
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = T(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(round_half_up(F.sum(amount)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# q53 TPC-H Q11: important stock identification.  Adaptation (no partsupp):
# a part's "stock value" from NATION_18's suppliers is its lineitem revenue
# through those suppliers; parts above 3x the average part value are
# reported.  (TPC-H's own Q11 fraction scales as 0.0001/SF -- a fixed
# fraction empties as the part count grows; a multiple of the average is
# the scale-free equivalent, nonempty and selective at every testdata SF.)
# The scalar threshold is a 1-row broadcast.  Both engines compare ROUNDED
# value to ROUNDED threshold so float accumulation order cannot flip a
# boundary part (module docstring).

def q53_important_stock(spark, sf_dir):
    n = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_18")
    s = T(spark, sf_dir, "supplier").join(
        broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    l = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    filtered = l.join(broadcast(s), l.l_suppkey == s.s_suppkey, "left_semi")
    per_part = filtered.groupBy("l_partkey").agg(
        round_half_up(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("value")
    )
    thr = per_part.agg(
        round_half_up(F.avg("value") * F.lit(3.0)).alias("thr")
    )
    return (
        per_part.join(broadcast(thr))
        .where(F.col("value") > F.col("thr"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


# q54 TPC-H Q12: shipping modes and order priority.  Adaptation (no
# l_shipmode / commit / receipt dates): the mode is a deterministic
# surrogate of the line number (l_linenumber % 3 -> AIR/SHIP/TRUCK) and
# "late" means shipped >60 days after the order date.  The shape is Q12
# exactly: one fact-fact equi join + a conditional (priority-bucketed)
# aggregation.

def q54_shipping_modes(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "AIR")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


# q55 TPC-H Q16: parts/supplier relationship.  Adaptation (no partsupp):
# the part-supplier pairs are the distinct (l_partkey, l_suppkey) pairs
# observed in lineitem; "suppliers with complaints" becomes suppliers with
# negative account balance (same NOT-IN anti-join shape).  The distinct is
# one shuffle on the pair key; the supplier exclusion is a broadcast anti
# join; count(distinct suppkey) per (brand, type, size) is the final agg.

def q55_parts_supplier(spark, sf_dir):
    pairs = (
        T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 23, 45))
    )
    bad = T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# q56 TPC-H Q17: small-quantity-order revenue.  The correlated
# "0.2 * avg(l_quantity) for this part" is pre-decorrelated: a per-part avg
# over the full lineitem (one agg shuffle on l_partkey) broadcast back onto
# the brand-filtered lines.  Quantity averages are exact across engines
# (integer-valued doubles), so the threshold is bit-identical.  Faithful
# minus the container filter (no p_container column).

def q56_small_qty_revenue(spark, sf_dir):
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select("p_partkey")
    l = T(spark, sf_dir, "lineitem")
    brand_lines = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    avg_qty = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr"))
    )
    return (
        brand_lines.join(broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(round_half_up(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# q57 TPC-H Q18: large-volume customers.  Orders whose total quantity
# exceeds 300: one agg shuffle on the uniform l_orderkey, the survivors
# (a tiny set) broadcast back against orders/customer.  Quantity sums are
# exact integers-in-doubles, so the HAVING cut is deterministic.  Faithful.

def q57_large_volume_customer(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            round_half_up(F.col("o_totalprice")).alias("o_totalprice"),
            round_half_up(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# q58 TPC-H Q19: discounted revenue.  The classic OR-of-ANDs join: Catalyst
# keeps p_partkey as the (broadcast) equi key and evaluates the three
# brand/size/quantity conjuncts as a join residual -- no cross product, one
# pass.  Faithful minus container/shipmode conjuncts (columns absent).

def q58_discount_revenue(spark, sf_dir):
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = T(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# q59 TPC-H Q21: suppliers who kept orders waiting.  Adaptation (no
# commit/receipt dates): a line is "late" when shipped >60 days after the
# order date.  The two correlated EXISTS are pre-decorrelated into ONE
# per-order aggregate pass: n_supp = distinct suppliers in the order,
# n_late_supp = distinct late suppliers; a supplier "kept the order
# waiting" iff it is the unique late supplier in a multi-supplier finished
# order.  One fact-fact shuffle join + one agg on the uniform o_orderkey --
# no per-row subquery, no second scan of lineitem.

def q59_waiting_suppliers(spark, sf_dir):
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = j.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("late_supp")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# q60 TPC-H Q20: potential part promotion.  Q20's semantics are defined on
# ``partsupp.ps_availqty`` (absent from the testdata); the surrogate keeps
# Q20's exact SHAPE -- part-name filter, per-(part, supplier) grouped sums,
# a correlated 0.5x threshold, and two nested semi-joins back to supplier --
# with "excess availability" re-read as recency concentration: suppliers
# who shipped more than half of a small-part's lifetime volume in 1997.
# Quantity sums are exact integers-in-doubles, so the threshold cut is
# bit-identical across engines.  One fact shuffle on (partkey, suppkey);
# the part filter and the final supplier lookup are broadcasts.

def q60_part_promotion(spark, sf_dir):
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    l = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_97 = (F.col("l_shipdate") >= _ts("1997-01-01")) & (
        F.col("l_shipdate") < _ts("1998-01-01")
    )
    ps = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qty_total"),
            F.sum(F.when(in_97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_1997"
            ),
        )
        .where(F.col("qty_1997") > 0.5 * F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    return (
        s.join(ps, s.s_suppkey == ps.l_suppkey, "left_semi")
        .select(
            "s_suppkey",
            "s_name",
            round_half_up(F.col("s_acctbal")).alias("s_acctbal"),
        )
        .orderBy("s_suppkey")
    )


TPCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q47_pricing_summary": q47_pricing_summary,
    "q48_local_supplier_volume": q48_local_supplier_volume,
    "q49_forecast_revenue": q49_forecast_revenue,
    "q50_volume_shipping": q50_volume_shipping,
    "q51_market_share": q51_market_share,
    "q52_product_profit": q52_product_profit,
    "q53_important_stock": q53_important_stock,
    "q54_shipping_modes": q54_shipping_modes,
    "q55_parts_supplier": q55_parts_supplier,
    "q56_small_qty_revenue": q56_small_qty_revenue,
    "q57_large_volume_customer": q57_large_volume_customer,
    "q58_discount_revenue": q58_discount_revenue,
    "q59_waiting_suppliers": q59_waiting_suppliers,
    "q60_part_promotion": q60_part_promotion,
}

# pure plan builders (no temp views, no staging, no nondeterminism): wrap in
# the build-once plan memo -- these 6-way join chains paid 0.3-0.9 s of
# eager DataFrame-API analysis per invocation (see queries.plan_memo)
TPCH_QUERIES = {k: plan_memo(k, fn) for k, fn in TPCH_QUERIES.items()}


TPCH_ORACLE: dict[str, str] = {
    "q47_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_round('SUM(l_quantity)')} AS sum_qty,
               {_sql_round('SUM(l_extendedprice)')} AS sum_base_price,
               {_sql_round('SUM(l_extendedprice * (1 - l_discount))')}
                   AS sum_disc_price,
               {_sql_round('SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))')}
                   AS sum_charge,
               {_sql_round('AVG(l_quantity)', 4)} AS avg_qty,
               {_sql_round('AVG(l_extendedprice)', 4)} AS avg_price,
               {_sql_round('AVG(l_discount)', 4)} AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q48_local_supplier_volume": f"""
        SELECT n.n_name,
               {_sql_round('SUM(l.l_extendedprice * (1 - l.l_discount))')}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    "q49_forecast_revenue": f"""
        SELECT {_sql_round('SUM(l_extendedprice * l_discount)')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q50_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               {_sql_round('SUM(l.l_extendedprice * (1 - l.l_discount))')}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
            OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q51_market_share": f"""
        WITH all_nations AS (
            SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            JOIN region r ON n2.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               {_sql_round(
                   "SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume "
                   "ELSE 0.0 END) / SUM(volume)", 4)} AS mkt_share
        FROM all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q52_product_profit": f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               {_sql_round(
                   'SUM(l.l_extendedprice * (1 - l.l_discount) '
                   '- p.p_retailprice * l.l_quantity * 0.1)')} AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "q53_important_stock": f"""
        WITH filtered AS (
            SELECT l.l_partkey, l.l_extendedprice, l.l_discount
            FROM lineitem l
            WHERE EXISTS (
                SELECT 1 FROM supplier s
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                WHERE s.s_suppkey = l.l_suppkey AND n.n_name = 'NATION_18'
            )
        ),
        per_part AS (
            SELECT l_partkey,
                   {_sql_round('SUM(l_extendedprice * (1 - l_discount))')}
                       AS value
            FROM filtered GROUP BY l_partkey
        )
        SELECT l_partkey, value
        FROM per_part
        WHERE value > (SELECT {_sql_round('AVG(value) * 3.0')} FROM per_part)
        ORDER BY value DESC, l_partkey
    """,
    "q54_shipping_modes": """
        SELECT CASE CAST(l.l_linenumber % 3 AS INTEGER)
                 WHEN 0 THEN 'AIR' WHEN 1 THEN 'SHIP' ELSE 'TRUCK'
               END AS ship_mode,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY 1
        ORDER BY ship_mode
    """,
    "q55_parts_supplier": """
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM pairs pr
        JOIN part p ON pr.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 7, 10, 14, 23, 45)
          AND pr.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    "q56_small_qty_revenue": f"""
        SELECT {_sql_round('SUM(l.l_extendedprice) / 7.0')} AS avg_yearly
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
    """,
    "q57_large_volume_customer": f"""
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               {_sql_round('o.o_totalprice')} AS o_totalprice,
               {_sql_round('b.total_qty')} AS total_qty
        FROM orders o
        JOIN big b ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    "q58_discount_revenue": f"""
        SELECT {_sql_round('SUM(l.l_extendedprice * (1 - l.l_discount))')}
                   AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
               AND p.p_size BETWEEN 1 AND 5)
           OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
               AND p.p_size BETWEEN 1 AND 15)
    """,
    "q59_waiting_suppliers": """
        WITH per_order AS (
            SELECT o.o_orderkey,
                   COUNT(DISTINCT l.l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE
                       WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                       THEN l.l_suppkey END) AS n_late_supp,
                   MAX(CASE
                       WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                       THEN l.l_suppkey END) AS late_supp
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY o.o_orderkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order w
        JOIN supplier s ON w.late_supp = s.s_suppkey
        WHERE w.n_supp >= 2 AND w.n_late_supp = 1
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    "q60_part_promotion": f"""
        SELECT s.s_suppkey, s.s_name,
               {_sql_round('s.s_acctbal')} AS s_acctbal
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT ps.l_suppkey FROM (
                SELECT l.l_partkey, l.l_suppkey,
                       SUM(l.l_quantity) AS qty_total,
                       SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                                 AND l.l_shipdate < TIMESTAMP '1998-01-01'
                            THEN l.l_quantity ELSE 0.0 END) AS qty_1997
                FROM lineitem l
                WHERE l.l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
                )
                GROUP BY l.l_partkey, l.l_suppkey
            ) ps
            WHERE ps.qty_1997 > 0.5 * ps.qty_total
        )
        ORDER BY s.s_suppkey
    """,
}
