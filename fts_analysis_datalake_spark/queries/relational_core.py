"""Relational-core declared queries (SURVEY.md §7 step 2).

Covers: P1-P9 (project/filter/predicates), A1-A3/A7 (group & global
aggs), O1-O3 (sort/limit/top-k), J1/J2/J5/J6 (joins), U1 (union).

This is the reference toolkit's daily-report surface re-expressed on
the fixture star schema: per-key aggregate reports, time-window
filters, conditional success-rates, top-k listings.

Determinism: every aggregate over noisy doubles uses the scaled forms
from ``functions.deterministic`` (see that module's docstring); every
LIMIT is under a total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import broadcast_dim, load_table
from fts_analysis_datalake_spark.functions.deterministic import (
    dsum,
    sql_dsum,
)
from fts_analysis_datalake_spark.operators.relational import top_k_per_group
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# q1: flagship pricing summary (TPC-H Q1 adapted to fixture columns)
# --------------------------------------------------------------------------

Q1_CUTOFF = "2000-12-01"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                        AS sum_qty,
           {sql_dsum('l_extendedprice')}                          AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)}    AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
           SUM(l_quantity) / COUNT(*)                             AS avg_qty,
           {sql_dsum('l_extendedprice')} / COUNT(*)               AS avg_price,
           SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A2", "P2", "P4", "O1", "F6"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> hash-agg -> sort in one pass; the partial/final
    two-phase agg (A15) and parquet predicate pushdown are automatic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact sum
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 4
            ).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.floor(F.col("l_discount") * 100 + F.lit(0.5))) / 100.0 / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q2: predicate stack — BETWEEN + IN + CASE WHEN recode (P2-P5, P8)
# --------------------------------------------------------------------------


@query(
    "q2_order_window_slice",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      AND o_orderstatus IN ('F', 'O')
      AND NOT (o_totalprice < 1000.0)
    """,
    tags=("P2", "P3", "P4", "P5", "P8", "P1"),
)
def q2_order_window_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window + IN-list + boolean-combo filter with a CASE recode
    (the FTS 'last-period, state in {...}' slice)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
        & F.col("o_orderstatus").isin("F", "O")
        & ~(F.col("o_totalprice") < 1000.0)
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_class"),
    )


# --------------------------------------------------------------------------
# q3: shipping-priority join (TPC-H Q3 adapted) — J1 multi-join + top-k
# --------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "J5", "A1", "O1", "O2"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact ⋈ fact ⋈ dim with the dim side broadcast; LIMIT under a
    total order (revenue is deterministic, orderkey breaks ties)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_dim(c, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5: revenue by nation — the full dim-chain broadcast join (J1/J5/J6)
# --------------------------------------------------------------------------


@query(
    "q5_revenue_by_nation",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("J1", "J5", "J6", "A1", "O1"),
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join: every dimension broadcast, so the only shuffle is the
    final groupBy(n_name) — the shape that survives 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_dim(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


# --------------------------------------------------------------------------
# outer / semi / anti joins (J2-J4)
# --------------------------------------------------------------------------


@query(
    "q_orders_per_customer_left",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0, 0.0) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("J2", "A1", "P7"),
)
def q_orders_per_customer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeps order-less customers; COUNT(col) skips the
    null-extended rows, COALESCE zero-fills the null sum (P7)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "q_orders_with_bulk_items",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    """,
    tags=("J3",),
)
def q_orders_with_bulk_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join == EXISTS; emits each matching order once."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "q_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate < TIMESTAMP '1996-01-01')
    """,
    tags=("J4",),
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join == NOT EXISTS (customers inactive before 1996 —
    the date filter keeps the result non-trivially non-empty)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# top-k per group (O3/W1) and global stats (A2/A3/A7)
# --------------------------------------------------------------------------


@query(
    "q_top_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    tags=("O3", "W1"),
)
def q_top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class — windowed top-k, never
    a global sort (one shuffle on the partition key)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


@query(
    "q_lineitem_global_stats",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS return_rate
    FROM lineitem
    """,
    tags=("A2", "A3", "A7"),
)
def q_lineitem_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregate incl. exact distinct counts and a
    conditional success-rate-style ratio — the FTS health-report row."""
    li = load_table(spark, sf_dir, "lineitem")
    n_returned = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        n_returned.alias("n_returned"),
        (n_returned.cast("double") / F.count(F.lit(1))).alias("return_rate"),
    )


# --------------------------------------------------------------------------
# union (U1) — append two period slices then re-aggregate
# --------------------------------------------------------------------------


@query(
    "q_union_period_slices",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
      UNION ALL
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1999-01-01' AND TIMESTAMP '1999-12-31'
    )
    GROUP BY o_orderstatus
    """,
    tags=("U1", "A1", "P4"),
)
def q_union_period_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (by name, not position) of two daily-partition-style
    slices, then one aggregation over the union."""
    o = load_table(spark, sf_dir, "orders")

    def slice_(lo: str, hi: str) -> DataFrame:
        return o.filter(
            F.col("o_orderdate").between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
        ).select("o_orderstatus", "o_totalprice")

    return (
        slice_("1995-01-01", "1995-12-31")
        .unionByName(slice_("1999-01-01", "1999-12-31"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


# --------------------------------------------------------------------------
# multi-key join (J6) on the composite lineitem key
# --------------------------------------------------------------------------


@query(
    "q_lineitem_self_multikey",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_name
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_orderkey % 1000 = 0 AND l.l_linenumber <= 2
    """,
    tags=("J1", "J5", "J6", "P2", "F6"),
)
def q_lineitem_self_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim with modulo predicate (pmod, F6)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        ((F.col("l_orderkey") % 1000) == 0) & (F.col("l_linenumber") <= 2)
    )
    p = load_table(spark, sf_dir, "part")
    return li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "p_name"
    )
