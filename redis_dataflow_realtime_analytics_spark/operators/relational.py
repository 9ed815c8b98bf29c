"""General relational surface over the TPC-H-ish star schema.

The reference's query surface is narrow (point lookups + one self-join); a
user switching to this engine gets the full declarative relational algebra
the reference's operators embed into (SURVEY §2.5): multi-way joins,
multi-grain aggregation (incl. cube/rollup — the reference's W2/W3/W5 legs
ARE a hand-built cube over (experiment, variant)), analytic windows, sorts/
top-k, set operations, semi/anti joins, pivot, and the scalar
date/string/null functions the reference uses (S1–S4, R2's null→0).

Scale notes (100 TB):
* Filters are applied before joins and reference only scanned columns, so
  Catalyst pushes predicates into the parquet scan and prunes columns.
* Dimension tables (region, nation, supplier at TPC-H ratios) are
  explicitly ``broadcast()``; fact-fact joins (orders⋈lineitem) shuffle on
  the join key and AQE handles skew/coalescing.
* Aggregates use partial (map-side) aggregation automatically; measures go
  through the exact decimal accumulator (functions.numeric) so results are
  independent of partitioning and merge order.
* Top-k (``orderBy().limit(k)``) executes as TakeOrderedAndProject — per
  partition heaps + driver merge of k rows, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum
from ..tables import load


def _rev(df: DataFrame) -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --- TPC-H Q1: pricing summary (multi-measure grouped agg) -------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(_rev(li), "sum_disc_price"),
            dsum(_rev(li) * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- TPC-H Q3: shipping priority (3-way join + top-k) ------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(li), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5: local supplier volume (6-way join, broadcast dims) ------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(li), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- TPC-H Q6: forecast revenue (pure filter + scalar agg, pushdown test) ----
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --- Top-k: highest-value orders (TakeOrderedAndProject) ---------------------
def top_orders_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# --- Cube / rollup (the reference's W2/W3/W5 manual cube, SURVEY §2.5) -------
def cube_quantity_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
    )


def rollup_orders_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "sum_price"), F.count("*").alias("n_orders"))
    )


# --- Analytic windows --------------------------------------------------------
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value — ranking window (deterministic
    tie-break on o_orderkey)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
    )


def running_revenue_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal-exact revenue per supplier ordered by ship date —
    frame-based aggregation window. Tie-break on (l_orderkey, l_linenumber)
    makes the running sum fully deterministic."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum(_rev(li).cast("decimal(38,6)")).over(w).cast("double").alias("running_revenue"),
    )


# --- Semi / anti joins -------------------------------------------------------
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- Set operations ----------------------------------------------------------
def active_entity_keys_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer keys and ordering-customer keys."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return cust.union(orders).distinct()


def customer_keys_minus_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys that never appear in orders."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return cust.subtract(orders)


def customer_keys_intersect_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customer keys that do appear in orders."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return cust.intersect(orders)


# --- Pivot -------------------------------------------------------------------
MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def customers_by_nation_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts per nation pivoted by market segment. Explicit pivot
    values keep the plan single-pass (no distinct-value pre-query)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", MKT_SEGMENTS)
        .count()
        .na.fill(0, MKT_SEGMENTS)
    )


# --- Scalar function showcase (S1–S4 analogues over orders) ------------------
def order_scalar_projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/string/null scalar surface: date_trunc/format (S4), concat
    (S1/S2), coalesce/null handling (R2 null→0), numeric floor/abs."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month_str"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.floor("o_totalprice").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("price_abs_delta"),
        F.length("o_orderpriority").alias("priority_len"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
    )


# --- Max-per-group (correlated-subquery pattern as a window) -----------------
def priciest_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All parts at their brand's maximum retail price — the
    max-per-group / correlated-subquery pattern, expressed as one window
    (single shuffle on the group key; ties all kept)."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_max", F.max("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("brand_max"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --- Conditional aggregation + HAVING + IN/LIKE/BETWEEN ----------------------
def returnflag_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface (IN-list, BETWEEN, LIKE) feeding conditional
    aggregates with a HAVING clause."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_returnflag").isin("A", "R", "N")
            & F.col("l_quantity").between(1, 40)
            & F.col("l_linestatus").like("%F%")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_discount"),
        )
        .where(F.col("n_rows") > 100)
    )


# --- Monthly revenue rollup (date_trunc grouping) ----------------------------
def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(dsum("o_totalprice", "revenue"), F.count("*").alias("n_orders"))
    )
