"""Relational query operators over the test star schema.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; each
has a DuckDB oracle in :mod:`inf2106_map_reduce_spark.queries`. The
reference implements none of these (SURVEY.md §2.5) — a reference user
writes map/reduce UDFs for each; here they are declarative plans that
Catalyst optimizes (pushdown, pruning, join selection).

Determinism rules (oracle hash-matches exact values):
- every floating aggregate is ``round(x, 2)`` (or 6 for unit-scale
  math) in BOTH engines;
- every LIMIT / ranking query orders by a TOTAL order (unique key
  tiebreak);
- column names are aliased identically in Spark and SQL.

Scale notes are per-function docstrings; the common ones:
- dimension tables (region/nation/supplier/part) are broadcast — at
  TPC-H shape they stay < 10s of MB far beyond sf1k;
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew/coalescing;
- aggregates are partial+final hash aggregation (map-side combine
  automatic — the reference's opt-in combiner M5).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + groupBy + multi-aggregate on lineitem.

    Scale: single scan, filter pushed to parquet, partial+final hash
    agg on a 6-value grouping key — no skew risk, shuffle is 6 rows per
    map partition.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) + SUM DISTINCT per group (expand-based
    distinct aggregation; at scale prefer approx_count_distinct — kept
    exact here for oracle parity)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum_distinct(F.col("o_totalprice")), 2).alias("sum_distinct_price"),
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) — subtotals + grand total."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status),(priority),()) via SQL."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: qty by linestatus × returnflag (reshape; oracle uses
    conditional aggregation — same plan shape Spark generates)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"A": "qty_a", "N": "qty_n", "R": "qty_r"})
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    Scale: customer filter is pushed down then broadcast into orders;
    orders⋈lineitem shuffles on orderkey (co-partitioned fact join —
    bucketing both facts by orderkey removes this shuffle entirely on a
    real deployment).
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1996-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through region→nation→{customer,
    supplier}, revenue per nation.

    Scale: region/nation/supplier/customer are broadcast dims; the
    only shuffles are orders⋈lineitem on orderkey and the final 25-row
    agg. The c_nationkey = s_nationkey condition makes the supplier
    join selective — expressed as an equi-join predicate so Catalyst
    keeps it a hash join.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers that have at least one 'F' order.

    Scale: semi-join never widens rows (no dup explosion); Catalyst
    picks broadcast or shuffled hash on the filtered orders side.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders at all (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + agg: order count & revenue per customer, zeros kept.

    Scale: aggregate orders BEFORE the join (smaller build side, no
    row explosion), then left-join customers to the per-key aggregate.
    """
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_totalprice").alias("rev"),
        )
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("rev", F.lit(0.0)), 2).alias("revenue"),
    )


def full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier balances."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "cust_bal",
        "supp_bal",
    )


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: parts bucketed into literal price bands.

    Scale: the band table is tiny → broadcast nested-loop is the right
    physical plan; for large-range joins prefer binning both sides to
    an equi-join on the bin id (see asof.py for that pattern).
    """
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


def self_join_same_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: supplier pairs in the same nation (s1 < s2)."""
    s1 = _t(spark, sf_dir, "supplier").alias("s1")
    s2 = _t(spark, sf_dir, "supplier").alias("s2")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s1.s_suppkey") < F.col("s2.s_suppkey")),
        )
        .select(
            F.col("s1.s_suppkey").alias("suppkey_a"),
            F.col("s2.s_suppkey").alias("suppkey_b"),
            F.col("s1.s_nationkey").alias("nationkey"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single-value aggregate.

    Scale: the whole predicate (date range, discount band, quantity
    cap) is pushed to the parquet scan — zero shuffle, one final row.
    The agg sum is rounded once (2 dec) for oracle determinism.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report for customers that returned
    items — 4-way join, per-customer agg, deterministic top-20.

    Scale: the returnflag filter prunes lineitem before the orderkey
    shuffle; customer and nation are broadcast; the final top-k is a
    TakeOrdered (no global sort materialization).
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — join + conditional agg
    producing one ratio row.

    Scale: part is broadcast into the lineitem scan (partkey is a
    uniform key, no skew); the ratio is derived from the two coarsely
    rounded sums so the division can't land on a rounding half-grid.
    """
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.round(F.sum(revenue), 2).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            F.round(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
            ).alias("promo_pct"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (GROUP BY + HAVING), joined back to customer, deterministic top-20.

    Scale: the HAVING aggregate runs on lineitem alone (partial agg
    combines map-side, shuffle carries one row per orderkey); only the
    few surviving orderkeys join to orders/customer — the selective agg
    comes FIRST, which is the order a 100 TB plan needs.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity bands — an
    OR-of-ANDs predicate spanning both join sides.

    Scale: Catalyst extracts the common partkey equi-join and keeps the
    disjunction as a post-join filter on the broadcast hash join; the
    per-branch part-side conjuncts (brand, size) are ALSO pushed to the
    part scan as an OR filter, shrinking the broadcast build side.
    """
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    branch1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch1 | branch2 | branch3)
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER ranking: top-3 orders by price per customer.

    Scale: one shuffle on the partition key; at 100 TB use the same
    plan — Spark's window sorts within partitions with managed spill.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag / lead / ntile over a total order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.ntile(4).over(w).alias("quartile"),
    )


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative revenue per customer (frame: unbounded
    preceding → current row, deterministic total order)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    )


def window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded frames: 3-row moving average, ±1-row min/max, and a
    30-day RANGE frame sum (range frame keyed on epoch days so the
    bound is a true value range, not a row count)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "odays", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    )
    total = ["o_orderdate", "o_orderkey"]
    mov = (
        Window.partitionBy("o_custkey").orderBy(*total).rowsBetween(-2, 0)
    )
    around = Window.partitionBy("o_custkey").orderBy(*total).rowsBetween(-1, 1)
    rng30 = (
        Window.partitionBy("o_custkey").orderBy("odays").rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(mov), 4).alias("mov_avg_3"),
        F.round(F.min("o_totalprice").over(around), 2).alias("min_around"),
        F.round(F.max("o_totalprice").over(around), 2).alias("max_around"),
        F.round(F.sum("o_totalprice").over(rng30), 2).alias("sum_30d"),
    )


def agg_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance,
    correlation, sample covariance, exact interpolated median, and an
    exact p90 — the moments/percentile coverage of the function
    library."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            # +0.0 normalizes IEEE -0.0 after rounding a tiny negative
            (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias(
                "cov_disc_tax"
            ),
            # one sort pass for both percentiles (array form), not two
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "sd_qty",
            "var_qty",
            "corr_qty_price",
            "cov_disc_tax",
            F.round(F.element_at("_pcts", 1), 4).alias("median_price"),
            F.round(F.element_at("_pcts", 2), 4).alias("p90_price"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# --------------------------------------------------------------------------

def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by price (deterministic tiebreak).

    Scale: ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; never a full
    sort of 100 TB.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dropDuplicates ≡ groupBy on all cols)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer segments' keys."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of the same two sets."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING customers not above the balance cut."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.exceptAll(b).distinct()


def setop_union_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + aggregate: nation keys seen across
    customer and supplier rows, with multiplicity preserved."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def setop_intersect_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-duplicate intersection of the
    two segment key multisets (order-line partkeys ∩ part keys ×
    multiplicity)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        F.col("l_partkey").alias("k")
    )
    hi = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08).select(
        F.col("l_partkey").alias("k")
    )
    return li.intersectAll(hi)


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): part's numeric measures to long (key, metric,
    value) form — the inverse of the pivot query."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.round("p_retailprice", 2).alias("retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# Subquery patterns
# --------------------------------------------------------------------------

def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: orders above their customer's
    average order value — decorrelated as join-with-aggregate (the
    plan Catalyst produces for the subquery form, written explicitly).
    """
    o = _t(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    oa = o.alias("o")
    return (
        oa.join(avg_per_cust.alias("a"), F.col("o.o_custkey") == F.col("a.o_custkey"))
        .filter(F.col("o.o_totalprice") > F.col("a.avg_price"))
        .select(
            F.col("o.o_orderkey").alias("o_orderkey"),
            F.col("o.o_custkey").alias("o_custkey"),
            F.round("o.o_totalprice", 2).alias("price"),
        )
    )


def scalar_subquery_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: parts priced above the global average price."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, ROUND(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        """
    )


# --------------------------------------------------------------------------
# Scalar function batteries
# --------------------------------------------------------------------------

def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: case, substring, trim/pad, replace,
    split, concat, length, reverse, position."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.reverse("p_brand").alias("rev"),
        F.instr("p_name", "a").alias("pos_a"),
        F.col("p_name").like("%steel%").alias("has_steel"),
    )


def scalar_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage on order dates."""
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").alias("wd_mon0"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_eoy"),
    )


def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage (rounded to 6 for cross-engine libm
    stability)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics coverage: COUNT(col) vs COUNT(*), null-safe
    equality (`<=>` / IS NOT DISTINCT FROM), COALESCE, NULLIF, and
    DISTINCT-excludes-null — per order status, over a deterministic
    nullable column (o_orderkey % 7 == 0 → NULL). The reference has no
    null concept (absent key → literal "none", SURVEY §1.4); this pins
    the three-valued-logic superset behavior against the oracle.

    Scale: single partial+final hash aggregate on o_orderstatus; money
    summed exactly as bigint cents (see BASELINE determinism notes).
    """
    o = _t(spark, sf_dir, "orders")
    live = F.col("o_orderkey") % 7 != 0
    d = o.select(
        "o_orderstatus",
        F.when(live, F.col("o_totalprice")).alias("v"),
        F.when(live, F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "cents"
        ),
        "o_orderpriority",
    )
    return d.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.count_if(F.col("v").isNull()).alias("n_nulls"),
        F.count_if(F.col("v").eqNullSafe(F.lit(None))).alias("nullsafe_nulls"),
        F.countDistinct("v").alias("distinct_v"),
        (F.sum(F.coalesce("cents", F.lit(0))) / 100.0).alias("sum_v"),
        F.count_if(F.nullif("o_orderpriority", F.lit("1-URGENT")).isNull()).alias(
            "urgent_n"
        ),
    )


def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN buckets + conditional aggregation."""
    c = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        c.select(bucket.alias("bal_bucket"), "c_acctbal", "c_mktsegment")
        .groupBy("bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
        )
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def explode_doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode: top-20 words across documents (the word-count
    pattern as a relational query with an oracle)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage over the embedding column: size,
    element access, slice aggregation (JVM-side, no UDF)."""
    e = _t(spark, sf_dir, "embeddings")
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(head_sum, 6).alias("head8_sum"),
        "label",
    )


# --------------------------------------------------------------------------
# TPC-H remainder — Q2/Q4/Q7/Q8/Q9/Q12/Q13/Q15/Q16/Q17/Q21/Q22 shapes
# adapted to the reduced schema (no partsupp table, no commit/receipt
# dates, no shipmode/phone columns; see docstrings for the mapping).
# Together with Q1/Q3/Q5/Q6/Q10/Q14/Q18/Q19 above, all 22 TPC-H query
# *shapes* are covered. The reference has none of these (SURVEY.md §2.5).
# --------------------------------------------------------------------------

def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group via correlated min subquery —
    parts whose retail price is the minimum for their type (partsupp's
    min supplycost adapted to part.p_retailprice).

    Scale: expressed as agg + join-back rather than a correlated
    subquery per row: the per-type min is a tiny aggregate (one row per
    type) broadcast back into the part scan — no O(n^2) re-evaluation,
    one scan + one broadcast join.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 30)
    mins = p.groupBy(F.col("p_type").alias("pt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.pt) & (p.p_retailprice == mins.min_price),
        )
        .select(
            "p_type",
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("price"),
        )
        .orderBy("p_type", "p_partkey")
        .limit(100)
    )


def q4_priority_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — orders with at least
    one lineitem shipped > 30 days after the order date (EXISTS with a
    correlated date comparison; commitdate/receiptdate adapted to
    shipdate vs orderdate + 30).

    Scale: the EXISTS compiles to a LEFT SEMI join on orderkey with the
    date predicate as a join condition — one shuffle, no row explosion
    (semi join short-circuits on first match).
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year (supplier nation x customer nation flows).

    Scale: nation/supplier/customer are broadcast dims; the only
    shuffle is orders⋈lineitem on orderkey. The nation-pair filter
    pushes into both dim scans before broadcast.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    n2 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "cust_nation")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .filter(pair | rev)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue into a
    region's customers, by year (ratio of conditional sums).

    Scale: conditional aggregation over one joined stream — the share
    is computed from two partial sums in a single grouped pass, no
    second scan. Sums are rounded before the ratio so the division is
    over already-deterministic values (oracle hash parity).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    n2 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grouped = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)),
                2,
            ).alias("nation_volume"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )
    return grouped.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over a part
    name pattern (ps_supplycost adapted to p_retailprice as unit cost).

    Scale: the LIKE filter prunes part before broadcast; profit is a
    pure arithmetic projection inside the grouped aggregate — one
    shuffle on the 2-column grouping key.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    # Per-row profit has exactly 4 decimal digits (2-dec price x 2-dec
    # discount), so sum in integer 1e-4 units: the bigint sum is exact and
    # the final division is the same IEEE op in both engines — no
    # rounding-grid ambiguity (oracle-parity rule, see MEMORY).
    profit_units = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000,
        0,
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg((F.sum(profit_units) / 10000.0).alias("sum_profit"))
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts split by order priority
    class (shipmode adapted to l_linestatus; late = shipped > 60 days
    after order date).

    Scale: join on orderkey then a conditional-sum aggregate on a
    2-value key — the CASE predicates fold into the partial agg, so the
    shuffle carries two rows per map partition.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    LEFT OUTER join with a join-side filter, then a two-level aggregate
    (count per customer, then histogram of counts).

    Scale: both aggregations are partial+final; the second groups on
    the tiny c_count domain. Customers with zero orders survive the
    outer join (c_count = 0 bucket) — the semantics the reference
    could only get by a custom reducer over a full outer merge.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum revenue in a quarter —
    an aggregate view consumed twice (once for the max, once for the
    equality filter).

    Scale: the revenue aggregate is computed once and reused (no
    re-scan of lineitem for the max — the scalar max is over the tiny
    per-supplier aggregate and broadcast back). Revenue is rounded
    before the max/equality so both engines compare identical values.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute
    combo with negated filters (partsupp adapted to the lineitem
    part-supplier link; NOT LIKE / <> / IN predicates).

    Scale: the part-side negated filters push to the part scan before
    broadcast; COUNT(DISTINCT) over (brand,type,size) groups is an
    expand-based two-phase distinct aggregate — fine here because the
    group domain is small; at 100 TB switch to approx_count_distinct.
    """
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 20% of their
    part's average quantity (correlated AVG subquery as agg +
    join-back).

    Scale: per-part averages aggregate lineitem down to one row per
    part (partial agg map-side), then join back on partkey — the
    broadcast side is the filtered brand's parts only. No correlated
    re-evaluation. Quantity sums are integer-exact in double, so the
    0.2*avg threshold is bit-identical across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avgq, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order (EXISTS other-supplier AND NOT EXISTS
    other-late-supplier, adapted: late = shipped > 30 days after order
    date on 'F'-status orders).

    Scale: the double correlated EXISTS is re-expressed as one grouped
    pass per order (distinct-supplier and distinct-late-supplier
    counts) joined back to the late lineitems — two shuffles total on
    orderkey, versus the naive per-row re-scan of lineitem. This is
    the Spark-first formulation of the hardest TPC-H correlation.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    late_items = (
        joined.filter(late).select("l_orderkey", "l_suppkey").distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        late_items.join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: acctbal of above-average customers with no
    recent orders, by nation (phone country-code adapted to nation;
    'no orders' adapted to 'no orders since 2000' — the unfiltered
    anti join is empty at every SF of this generator).

    Scale: the global average is a one-row broadcast; the anti join
    shuffles on custkey against the date-filtered orders; the final
    aggregate groups on the 25-nation domain.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def setop_except_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-duplicate difference of the two
    partkey multisets — each occurrence in the right side cancels ONE
    occurrence on the left (vs EXCEPT's set semantics in
    :func:`setop_except`)."""
    hi_qty = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        F.col("l_partkey").alias("k")
    )
    hi_disc = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08).select(
        F.col("l_partkey").alias("k")
    )
    return hi_qty.exceptAll(hi_disc)


def map_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function battery: parse the event props JSON into a
    map<string,int> and exercise map_keys / size / element_at /
    transform_values / map_filter / map_concat — all JVM-side
    higher-order map functions, no Python UDF.

    Scale: narrow single pass (no shuffle); from_json with an explicit
    schema avoids any inference scan. The map column stays columnar
    until the scalar projections extract from it.
    """
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    tagged = F.map_concat(
        F.create_map(F.lit("t"), F.length("event_type").cast("int")), m
    )
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(
            F.transform_values(m, lambda _, v: v * 2), "k"
        ).alias("k_doubled"),
        F.size(F.map_filter(m, lambda _, v: v > 50)).alias("n_big"),
        F.element_at(tagged, "t").alias("type_len"),
    )


def cross_join_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (cartesian product) of the two smallest
    dims, with a membership flag computed post-product.

    Scale: only ever do this dim x dim (5 x 25 here); Spark picks
    BroadcastNestedLoopJoin for the broadcast side. A fact-side
    cartesian is a plan bug, not a query.
    """
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select(
        "r_name",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_member"),
    )


def lateral_posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral battery: posexplode (position + value) of the
    part-name word array — the UDTF-shaped 1-to-N expansion with
    ordinality that plain explode loses.

    Scale: narrow per-row expansion, no shuffle; output is
    |words|x input rows — bounded here (2-word names), and at 100 TB
    the expansion factor is the thing to budget, not the operator.
    """
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
    )


def join_hint_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: force a shuffle sort-merge join
    (``hint("merge")``) where the optimizer would pick broadcast at
    this SF.

    Scale: SMJ is the right call when BOTH sides are large (broadcast
    would OOM the build side) or the output feeds another operation on
    the same key — the sort is paid once and reused. The hint is the
    escape hatch when statistics mislead the optimizer; the plan-shape
    test pins that it actually takes effect.
    """
    c = _t(spark, sf_dir, "customer").hint("merge")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): nation names
    per region, comma-joined in name order.

    Spark has no listagg aggregate; the deterministic composition is
    ``collect_list`` → ``array_sort`` → ``array_join`` — the explicit
    sort is what makes the result reproducible (collect_list order is
    partition-arrival order, never stable).

    Scale: per-group state is the concatenated string — fine for
    bounded groups (dimension rollups); for unbounded groups cap with
    ``slice`` after the sort or this becomes a per-key memory hazard.
    """
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


def percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile coverage: interpolated (percentile_cont
    semantics), discrete (percentile_disc), and median per order
    priority.

    Scale: exact percentiles materialize each group's values in the
    aggregation buffer — correct but memory-bound per group. At 100 TB
    swap to ``approx_percentile`` (Greenwald-Khanna, mergeable
    constant-size sketch; see functions/sketches.py) — the exact form
    here doubles as the oracle for the sketch's error bound.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50_disc"),
        F.expr("median(o_totalprice)").alias("med"),
    )


def histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: 50k-wide buckets via
    exact integer-cents arithmetic (``round(x*100) DIV 5_000_000``) so
    bucket edges can't drift between engines on float division.

    Scale: a histogram is one map-side-combinable groupBy — the
    classic single-shuffle profile query; bucket count is fixed, so
    the reduce side is O(buckets) regardless of input size.
    """
    o = _t(spark, sf_dir, "orders")
    bucket = F.expr(
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DIV 5000000"
    ).alias("bucket")
    return (
        o.select(bucket, "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def grouping_id_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING/GROUPING_ID coverage: a two-dimension cube where each
    output row carries its grouping level explicitly — the disambiguator
    BI layers need to tell a rolled-up NULL from a data NULL.

    Scale: cube is one expand + one shuffle (4x row expansion here);
    the grouping id is computed, not stored — free.
    """
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(cents) / 100.0).alias("sum_qty"),
        )
    )


def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT coverage: ``parse_json`` shreds
    events.props into Spark 4's open-schema VARIANT type once, then
    typed ``variant_get`` extractions feed a per-bucket aggregate —
    the ingest-then-query pattern for payloads whose schema drifts
    (vs get_json_object, which re-parses the string per extraction).

    Scale: VARIANT stores a parsed binary encoding, so N extractions
    cost one parse; with shredding enabled the engine can even prune/
    push down on extracted paths. The aggregate itself is one shuffle.
    """
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .select("event_type", "k", (F.col("k") % 10).alias("k_mod"))
        .groupBy("event_type", "k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


def lateral_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: for each sampled order, its top-2
    line items by price — the per-row dependent subplan (top-N per
    entity without first materializing ALL rows ranked) that plain
    joins can't express and the window form computes for every group.

    Scale: Catalyst decorrelates the lateral into a ranked join under
    the hood; the sampled outer side keeps this oracle-bounded, and at
    100 TB the same shape runs as one shuffle on the join key instead
    of a per-row executed subquery.
    """
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.price
        FROM v_orders o,
        LATERAL (SELECT l_linenumber, ROUND(l_extendedprice, 2) AS price
                 FROM v_lineitem l
                 WHERE l.l_orderkey = o.o_orderkey
                 ORDER BY l_extendedprice DESC, l_linenumber
                 LIMIT 2) l
        WHERE o.o_orderkey % 97 = 0
        """
    )


def recursive_weekly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0 WITH RECURSIVE): a 1995 weekly calendar
    spine generated by recursion, equi-joined (broadcast — 51 rows) to
    per-week order aggregates with zero fill. Spark's recursive step
    requires UNION ALL, so the recursion here is the terminating
    acyclic kind (series generation, hierarchy expansion); cyclic
    closure still belongs to the iterative DataFrame loop in
    functions/dedup.connected_components.

    Scale: recursion depth = 51 driver-side plan steps over one-row
    frames — negligible; the corpus-sized work is one date_trunc
    groupBy. The spine-to-agg join is equi on week_start (broadcast),
    NOT a non-equi interval probe.
    """
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE weeks(week_start) AS (
          SELECT TIMESTAMP '1995-01-02'
          UNION ALL
          SELECT week_start + INTERVAL 7 DAY FROM weeks
          WHERE week_start < TIMESTAMP '1995-12-18'
        ),
        by_week AS (
          SELECT date_trunc('week', o_orderdate) AS week_start,
                 COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS tp
          FROM v_orders_rec
          GROUP BY 1
        )
        SELECT w.week_start,
               CAST(COALESCE(b.n, 0) AS BIGINT) AS n_orders,
               COALESCE(b.tp, 0.0) AS total_price
        FROM weeks w LEFT JOIN by_week b ON w.week_start = b.week_start
        """
    )


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supply value (from one nation's
    suppliers) exceeds a fixed fraction of the total supply value
    (partsupp adapted to the lineitem part-supplier link; value =
    SUM(l_extendedprice * l_quantity); reference has no partsupp
    table either — SURVEY.md §2.5 marks Q11/Q20 as the two shapes
    adapted to the generator's schema).

    Scale: the per-part aggregate runs ONCE (partial+final hash agg on
    partkey); the global threshold is a one-row broadcast joined with a
    non-equi predicate — Catalyst never re-evaluates the scalar
    subquery per group. Supplier/nation dims are broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nation_items = li.join(
        F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
        li.l_suppkey == s.s_suppkey,
    )
    per_part = nation_items.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.join(
            F.broadcast(total), F.col("value") > 0.001 * F.col("total_value")
        )
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


def q20_excess_shipped_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped more than
    a threshold quantity of 'red %' parts during 1996 (nested
    IN-subquery chain: part keys -> qualifying supplier keys ->
    supplier), adapted to the lineitem supply link (no partsupp/
    availqty in the generator; threshold replaces 0.5*availqty).

    Scale: the nested INs become semi-join pipeline stages — the part
    filter pushes to the part scan and broadcasts into lineitem; the
    per-(supp,part) HAVING aggregate reduces lineitem before the final
    semi join; supplier/nation dims broadcast. No correlated re-scan.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    red_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    qualifying = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: one row per orders column with null count,
    distinct count, and min/max rendered as strings — the data-quality
    summary every ingestion pipeline runs before training-data export
    (Deequ/TFDV-style profiling re-expressed declaratively).

    Scale: one independent two-phase aggregation PER COLUMN (group on
    the typed value with map-side partial agg, then fold the distinct
    values), unioned. Each subtree scans exactly one pruned column and
    the stages run in parallel. This beats the single wide
    multi-countDistinct aggregate 4× here (0.6 s vs 2.6 s at sf0.1):
    that plan Expands every row ×(n_cols+1) before the partial agg,
    paying the blowup in CPU and shuffle. At 100 TB the per-column
    distinct fold still shuffles one row per distinct value — swap in
    approx_count_distinct (functions/sketches.py) past ~10⁹ distincts.
    """
    o = _t(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]

    def per_col(c: str) -> DataFrame:
        # typed grouping keeps min/max semantics (numeric/date order,
        # not lexicographic); the string render happens at the end,
        # identical to the old wide-agg's cast
        return (
            o.groupBy(F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(
                F.lit(c).alias("column_name"),
                F.coalesce(
                    F.sum(F.when(F.col("v").isNull(), F.col("cnt"))),
                    F.lit(0),
                ).alias("n_nulls"),
                F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_distinct"),
                F.min("v").cast("string").alias("min_value"),
                F.max("v").cast("string").alias("max_value"),
            )
        )

    return reduce(lambda a, b: a.unionAll(b), [per_col(c) for c in cols])


def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (CDC upsert) as a full-outer combine: the
    'target' is customer balances, the 'source' is a change feed
    derived from 1997+ orders (per-customer order spend). Matched rows
    update (balance + spend), unmatched-source rows insert, unmatched-
    target rows persist — the Delta/Iceberg MERGE expressed as one
    full outer join + coalesce projection (kernel of
    WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT).

    Scale: one shuffle on the merge key each side; at 100 TB the same
    plan benefits from bucketed/partitioned targets (see
    operators/bucketing.py) so only changed partitions rewrite.
    """
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    merged = c.join(changes, c.c_custkey == changes.custkey, "full_outer")
    return merged.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        F.coalesce("c_name", F.lit("<new>")).alias("name"),
        F.round(
            F.coalesce("c_acctbal", F.lit(0.0)) + F.coalesce("spend", F.lit(0.0)),
            2,
        ).alias("new_balance"),
        (F.col("custkey").isNotNull() & F.col("c_custkey").isNotNull()).alias(
            "was_updated"
        ),
        F.col("c_custkey").isNull().alias("was_inserted"),
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (total spend), each quintile-scored 1-5 against the customer
    population — the classic CRM segmentation, done scale-safely.

    Scale: NO global ntile window (that funnels every customer through
    one partition). The four quintile cut values per dimension come
    from ONE exact-percentile aggregation (a 12-value scalar row,
    broadcast); scores are then plain comparisons in a narrow pass.
    Ties sit on the same side of a cut in both engines because cuts
    and metrics are rounded before comparison.
    """
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    per = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_custkey",
            F.datediff("maxd", "lastd").alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=True)
    )
    qs = (0.2, 0.4, 0.6, 0.8)
    cuts = per.agg(
        *[
            F.round(F.expr(f"percentile({m}, {q})"), 6).alias(f"{m[0]}{i}")
            for m in ("recency_days", "frequency", "monetary")
            for i, q in enumerate(qs, 1)
        ]
    )

    def score(metric: str, prefix: str, reversed_: bool) -> F.Column:
        op = (lambda c: F.col(metric) < F.col(c)) if reversed_ else (
            lambda c: F.col(metric) > F.col(c)
        )
        s = F.lit(1)
        for i in range(1, 5):
            s = s + op(f"{prefix}{i}").cast("int")
        return s

    scored = per.crossJoin(F.broadcast(cuts)).select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        score("recency_days", "r", True).alias("r_score"),
        score("frequency", "f", False).alias("f_score"),
        score("monetary", "m", False).alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: a dbt/Great-Expectations-style data-quality
    suite over ``orders`` as ONE relation — one row per expectation
    with checked/violation counts and a pass verdict. The contract
    check a pipeline runs before promoting a freshly-landed partition;
    here it certifies the synthetic corpus's own invariants.

    Expectations: primary-key uniqueness and not-null, referential
    integrity to ``customer``, value range on ``o_totalprice``, date
    range on ``o_orderdate``, and domain membership on
    ``o_orderstatus``.

    Scale: every check is a single aggregate over one scan shape —
    uniqueness is a two-level agg on the key (pre-group then count
    dups — no Expand), the FK check is a broadcast anti-join against
    the dimension's distinct keys, the rest are conditional sums that
    share ONE scan via a unioned aggregate. Each emits a constant-size
    row; the union is 6 rows total regardless of corpus size.
    """
    o = load_table(spark, sf_dir, "orders")
    cust_keys = (
        load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    )
    n_rows = o.select(F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )

    def row(name: str, checked, failed) -> DataFrame:
        return checked.select(
            F.lit(name).alias("expectation"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            failed.cast("bigint").alias("n_violations"),
            (failed == 0).alias("passed"),
        )

    # key checks: one pre-grouped pass covers uniqueness (groups seen
    # more than once) without COUNT(DISTINCT)'s Expand
    key_groups = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c"))
    uniq = key_groups.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((F.col("c") > 1).cast("long")).alias("dups"),
    )
    nulls_and_ranges = o.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("k_null"),
        F.sum(
            (
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 1e7)
            ).cast("long")
        ).alias("price_bad"),
        F.sum(
            (
                F.col("o_orderdate").isNull()
                | (F.to_date("o_orderdate") < F.lit("1995-01-01"))
                | (F.to_date("o_orderdate") > F.lit("2001-12-31"))
            ).cast("long")
        ).alias("date_bad"),
        # 3VL: a NULL status must COUNT as a domain violation — bare
        # ~isin(...) is NULL (not true) for NULL input and would let a
        # null status silently pass, unlike the price/date checks
        # above which OR in isNull explicitly
        F.sum(
            (
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P")
            ).cast("long")
        ).alias("status_bad"),
    ).localCheckpoint(eager=True)
    fk_orphans = (
        o.join(F.broadcast(cust_keys), o["o_custkey"] == cust_keys["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
        .crossJoin(n_rows.select(F.col("n").alias("n_checked")))
    )
    checks = [
        row("orderkey_unique", uniq, F.col("dups")),
        row(
            "orderkey_not_null",
            nulls_and_ranges.select(F.col("n_checked"), F.col("k_null")),
            F.col("k_null"),
        ),
        row("custkey_fk_customer", fk_orphans, F.col("orphans")),
        row(
            "totalprice_in_range",
            nulls_and_ranges.select(F.col("n_checked"), F.col("price_bad")),
            F.col("price_bad"),
        ),
        row(
            "orderdate_in_range",
            nulls_and_ranges.select(F.col("n_checked"), F.col("date_bad")),
            F.col("date_bad"),
        ),
        row(
            "orderstatus_in_domain",
            nulls_and_ranges.select(F.col("n_checked"), F.col("status_bad")),
            F.col("status_bad"),
        ),
    ]
    return reduce(DataFrame.unionByName, checks)


def scalar_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY_* arithmetic coverage: ``try_divide`` (zero
    divisor), ``try_add``/``try_multiply`` (bigint overflow),
    ``try_cast`` (unparseable and parseable prefixes), and
    ``try_element_at`` (out-of-bounds index) — the NULL-instead-of-
    raise surface that makes pipelines total under ANSI mode (the
    driver's vanilla sessions run ANSI ON, so these are the exact
    forms a production job must use instead of bare operators).

    Scale: pure narrow projection, whole-stage codegen, no shuffle.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    den = (F.col("o_custkey") % 3).cast("double")
    idx = (F.col("o_orderkey") % 5 + 1).cast("int")  # 1..5 vs len-3 array
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), den), 6).alias(
            "try_div"
        ),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"), F.col("o_orderkey")
        ).alias("try_add_overflow"),
        F.try_multiply(
            F.lit(2**62).cast("bigint"),
            (F.col("o_orderkey") % 4).cast("bigint"),
        ).alias("try_mul"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("try_cast_full"),
        F.expr(
            "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
        ).alias("try_cast_prefix"),
        F.try_element_at(
            F.array(F.lit(10), F.lit(20), F.lit(30)), idx
        ).alias("try_elem"),
    )


def window_distribution_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (exact
    integer-ratio doubles, rounded 9 for cross-engine safety) plus
    first/last/nth_value over the full partition frame — completes the
    rank-family coverage next to window_rank_battery's
    rank/dense_rank/lag/lead/ntile."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_order"),
        F.last("o_orderkey").over(wf).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
    )


def part_cooccurrence(
    lineitems: DataFrame,
    top_k: int = 50,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Market-basket co-occurrence (the A-Priori candidate-pair step):
    which item pairs appear together in the most orders. The classic
    MapReduce analytics workload — pairs generated per basket, counted
    globally — re-expressed as one self-equi-join on the basket key.

    Scale: the self-join shuffles on the BASKET key, so pair fan-out
    is Σ_baskets |basket|² — bounded by basket size (TPC-H orders hold
    ≤ 7 line items), never corpus². DISTINCT first (an item repeated
    in a basket counts once — support semantics), map-side partial agg
    on the pair count, k-bounded TakeOrdered for the result. A skewed
    mega-basket would salt exactly like the skew join; with
    size-bounded baskets AQE needs no help.
    """
    items = lineitems.select(
        F.col(order_col).alias("o"), F.col(item_col).alias("i")
    ).distinct()
    a = items.select("o", F.col("i").alias("item_a"))
    b = items.select("o", F.col("i").alias("item_b"))
    pairs = a.join(b, "o").filter(F.col("item_a") < F.col("item_b"))
    counts = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy(F.desc("n_orders"), F.asc("item_a"), F.asc("item_b"))
    return (
        counts.orderBy(F.desc("n_orders"), F.asc("item_a"), F.asc("item_b"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )


def orders_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: top-50 part pairs co-ordered in the same order."""
    return part_cooccurrence(_t(spark, sf_dir, "lineitem"))


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Winsorized (outlier-clipped) statistics per group: exact
    per-group p01/p99 cut points, values clipped INTO the band, and
    the robust mean/sum next to the raw out-of-band counts — the
    data-cleaning primitive between raw aggregates and the anomaly
    detectors (a handful of fat-finger rows shouldn't move a segment
    mean).

    Plan: one percentile aggregate per group (both cut points from a
    single sort pass, array form), broadcast back onto the fact rows,
    clip with GREATEST/LEAST in codegen, re-aggregate — two shuffles
    on the group key, the cut table is |groups| rows and always
    broadcastable. At 100 TB swap the exact percentile for the sketch
    form (functions/sketches.py) like the other percentile consumers.
    """
    v = F.col(value_col)
    cuts = (
        df.groupBy(group_col)
        .agg(
            F.expr(
                f"percentile({value_col}, array({lo}, {hi}))"
            ).alias("_c")
        )
        .select(
            group_col,
            F.element_at("_c", 1).alias("_plo"),
            F.element_at("_c", 2).alias("_phi"),
        )
    )
    clipped = F.greatest(F.col("_plo"), F.least(F.col("_phi"), v))
    return (
        df.join(F.broadcast(cuts), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((v < F.col("_plo")).cast("long")).alias("n_below"),
            F.sum((v > F.col("_phi")).cast("long")).alias("n_above"),
            F.round(F.min("_plo"), 4).alias("p_lo"),
            F.round(F.max("_phi"), 4).alias("p_hi"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.sum(clipped), 2).alias("winsorized_sum"),
        )
    )


def orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: p01/p99-winsorized order totals per priority."""
    return winsorized_stats(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority"
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history build: turn a keyed
    update stream into versioned rows with ``[valid_from, valid_to)``
    intervals and a current flag — the warehouse-maintenance shape
    behind every dimension table that must answer "what was this
    key's attribute AS OF t?" (the batch complement of
    :func:`merge_upsert_customer_balance`'s type-1 overwrite).

    Semantics: updates are totally ordered per key by
    ``(ts, tiebreak)``; consecutive updates carrying the SAME
    attribute value collapse into one version (the SCD2 no-change
    rule — re-stating a value never opens a new version); each
    surviving version runs from its first assertion to the next
    version's start, the latest version is open-ended
    (``valid_to`` NULL, ``is_current`` true), and ``version`` numbers
    the key's history from 1.

    Plan: two windows over the SAME (key × order) partitioning — a
    lag to drop no-change updates, then a lead/row_number over the
    survivors — so the whole build is ONE shuffle on the key followed
    by narrow window passes (Spark reuses the partitioning; no second
    exchange). At 100 TB this is the standard one-shuffle history
    rebuild; incremental maintenance would feed only changed keys
    through the identical transform.

    Determinism: the (ts, tiebreak) total order and the change filter
    are pure column predicates; both engines replay them exactly
    (oracle uses the identical windows)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    return changes.select(
        F.col(key_col),
        F.row_number().over(w).alias("version"),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def orders_scd2_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-customer type-2 history of the order
    priority asserted by each successive order — consecutive orders
    re-stating the same priority collapse into one validity
    interval."""
    return scd2_history(
        _t(spark, sf_dir, "orders"),
        key_col="o_custkey",
        attr_col="o_orderpriority",
        ts_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )
