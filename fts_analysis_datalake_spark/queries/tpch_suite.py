"""Adapted TPC-H decision-support suite (SURVEY.md §2.12 extension).

The fixture star schema is "TPC-H-ish" (FIXTURES.md:16-17): doubles
not decimals, timestamps not dates, and several official columns are
absent (no partsupp table, no l_shipmode / l_commitdate /
l_receiptdate / c_phone / o_comment). Queries below are the classic
TPC-H shapes re-targeted at the available columns — q12/q16/q20 are
unrepresentable (their predicates live entirely on missing columns)
and q9's supply cost is replaced by a labeled retail-price proxy.

Why this suite matters for the engine: each query is a canonical
physical-plan pattern a warehouse must get right at 100 TB —

- q4/q21: correlated EXISTS / NOT EXISTS -> semi/anti joins with a
  non-equi residual on an equi key (never a nested loop);
- q6: pure scan-agg — predicate pushdown + codegen, zero shuffle;
- q7/q8/q9: multi-dim star joins — every dimension broadcast, the
  only shuffles are fact⋈fact and the final groupBy;
- q10/q18: fact⋈fact⋈dim with top-k under a total order
  (TakeOrderedAndProject, not a global sort);
- q13: outer-join fan-in histogram (two inherent shuffles);
- q14: conditional-numerator ratio aggregate;
- q15: agg -> equi-join against its own broadcast MAX (no
  single-partition window);
- q17: per-group mean threshold via a broadcast self-aggregation;
- q19: disjunctive predicate stack sharing one equi join key;
- q22: anti join + scalar threshold from a 1-row broadcast.

Determinism: money sums use the scaled-integer forms from
``functions.deterministic``; every LIMIT sits under a total ORDER BY
(unique key tiebreak), per FIXTURES.md determinism notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import broadcast_dim, load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum, sql_dsum
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# q4: order-priority checking — EXISTS as a left-semi join (J3)
# --------------------------------------------------------------------------


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J3", "A1", "P4", "O1"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 with the commit/receipt lateness test replaced by
    "some line shipped after the order date" (no l_commitdate in the
    fixture). The correlated EXISTS compiles to a left-semi join on
    the order key with the non-equi residual evaluated inside the
    join — one shuffle, no nested loop."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q6: forecasting revenue change — the pushdown/codegen benchmark (P2/P4/A2)
# --------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("P2", "P4", "A2", "F6"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 verbatim (columns all exist): scan -> pushed filter ->
    keyless agg. The whole query is one codegen stage with zero
    shuffle — at 100 TB its cost is exactly the parquet scan of the
    four referenced columns, with row groups skipped via the
    l_shipdate min/max statistics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q7: volume shipping between two nations (J1/J5 star, A7 conditional pair)
# --------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_3", "NATION_15"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
        OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("J1", "J5", "J6", "A1", "F4", "O1"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year. Both nation arms are
    broadcast; the disjunctive nation-pair predicate runs after the
    joins (it references both sides). Fact⋈fact on the order key is
    the only large shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(broadcast_dim(s, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_dim(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q8: national market share — conditional-numerator ratio (A7)
# --------------------------------------------------------------------------

_Q8_NATION = "NATION_5"


@query(
    "q8_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           ({sql_dsum(f"CASE WHEN n1.n_name = '{_Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)})
             / ({sql_dsum('l_extendedprice * (1 - l_discount)', 4)}) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n2.n_regionkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'STANDARD'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J1", "J5", "A1", "A7", "F4", "O1"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: the target nation's share of STANDARD-part revenue
    sold into AMERICA, by year. Five broadcast dimensions around the
    lineitem⋈orders shuffle; the share is a ratio of two
    deterministic scaled sums computed in one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_regionkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey)
        .join(broadcast_dim(s, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_dim(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_regionkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(0.0), 4)
                / dsum(vol, 4)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q9: product-type profit (proxy) by supplier nation and year
# --------------------------------------------------------------------------


@query(
    "q9_product_profit_proxy",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity', 2)}
             AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
    tags=("J1", "J5", "A1", "F1", "F4", "O1"),
)
def q9_product_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 with ``ps_supplycost`` (no partsupp table in the
    fixture) replaced by the labeled proxy ``0.6 * p_retailprice`` —
    the plan shape (LIKE-filtered part dim, broadcast dims, fact⋈fact
    shuffle, two-level group key) is the point, not the cost model."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey)
        .join(broadcast_dim(s, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# q10: returned-item revenue — top-20 customers under a total order
# --------------------------------------------------------------------------


@query(
    "q10_returned_item_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "J5", "A1", "O1", "O2"),
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost revenue from returns in a quarter. The LIMIT 20
    under (revenue DESC, c_custkey) compiles to TakeOrderedAndProject
    — per-partition heaps, no global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_dim(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q13: customer order-count distribution — outer-join fan-in histogram
# --------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J2", "A1", "A2", "O1"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (comment filter dropped — no o_comment column):
    orders-per-customer, then a histogram of those counts. Two
    inherent shuffles (custkey, then c_count); the second input is
    already customer-cardinality so it is cheap at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# q14: promotion revenue share — conditional numerator over one scan
# --------------------------------------------------------------------------


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT 100.0 * ({sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)})
             / ({sql_dsum('l_extendedprice * (1 - l_discount)', 4)}) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("J1", "J5", "A2", "A7"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue. One
    broadcast join, one keyless aggregate; numerator and denominator
    are computed in the same pass (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey).agg(
        (
            100.0
            * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0), 4)
            / dsum(vol, 4)
        ).alias("promo_revenue_pct")
    )


# --------------------------------------------------------------------------
# q15: top supplier — self-aggregation max without a 1-partition window
# --------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("J1", "J5", "A1", "A2", "O1"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue. The MAX
    is re-joined as a broadcast equi key (supplier-cardinality input,
    1-row broadcast) — never a window over a single partition, which
    would serialize the whole table through one task at scale.
    Equality on total_revenue is safe: both sides are the same
    scaled-integer sum, exact in either engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(broadcast_dim(s, "supplier"), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q17: small-quantity-order revenue — per-part mean threshold join
# --------------------------------------------------------------------------


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * SUM(l_quantity) / COUNT(*) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("J1", "J5", "A1", "A2"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would be lost by refusing sub-20%%-of-
    average quantity orders for one brand. The correlated scalar
    subquery becomes a broadcast join against the per-part mean
    (part-cardinality — always broadcastable). l_quantity is an
    integral double, so SUM/COUNT and the 0.2 multiple are
    bit-identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.2 * F.sum("l_quantity") / F.count(F.lit(1))).alias("qty_threshold")
    )
    return (
        li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18: large-volume customers — group-HAVING then fact re-join
# --------------------------------------------------------------------------

_Q18_QTY = 300


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("J1", "J3", "J5", "A1", "O1", "O2"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds the threshold,
    with their customers. The HAVING subquery is a semi join against
    the aggregated order keys; sum(l_quantity) is exact (integral
    doubles) so the threshold is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "big_key"), o.o_orderkey == F.col("big_key"), "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(broadcast_dim(c, "customer"), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19: discounted revenue — disjunctive predicates over one equi key
# --------------------------------------------------------------------------


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("J1", "J5", "P3", "P4", "A2"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (shipmode/container clauses dropped — columns absent):
    three brand/size/quantity disjuncts that all share the partkey
    equi join, so Catalyst keeps a hash join and evaluates the OR as
    a post-join residual — never a nested loop."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def arm(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(broadcast_dim(p, "part"), li.l_partkey == p.p_partkey)
        .filter(arm("Brand#1", 15, 1, 21) | arm("Brand#12", 30, 10, 30) | arm("Brand#23", 50, 20, 40))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q21: suppliers who shipped last — EXISTS + NOT EXISTS stack
# --------------------------------------------------------------------------


@query(
    "q21_last_shipper_per_order",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >= l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    tags=("J3", "J4", "J5", "A1", "O1", "O2"),
)
def q21_last_shipper_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 with receipt/commit lateness replaced by shipdate
    order (columns absent): for finished multi-supplier orders, the
    supplier whose line shipped strictly after every other supplier's
    lines. EXISTS -> left-semi, NOT EXISTS -> left-anti, both equi on
    the order key with non-equi residuals — two shuffles on the same
    key, no quadratic blowup beyond the per-order line group."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") >= F.col("l1.l_shipdate")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(broadcast_dim(s, "supplier"), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q22: global sales opportunity — anti join + broadcast scalar threshold
# --------------------------------------------------------------------------


@query(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 2)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_dsum('c_acctbal', 2)} / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("J4", "J5", "A1", "A2", "P2", "O1"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 keyed by nation (no c_phone country codes in the
    fixture): rich-but-inactive customers. The positive-balance mean
    is a 1-row broadcast (nested-loop join against one row is exact
    and O(n)); the no-orders test is a left-anti join. The threshold
    uses the same scaled sum on both engines, so the > comparison is
    deterministic."""
    c = load_table(spark, sf_dir, "customer")
    # "Inactive" = no orders since 2000 (every fixture customer has
    # SOME order, so the classic no-orders-ever test is vacuous —
    # the recency cutoff keeps the anti-join non-trivial).
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("bal_threshold"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("bal_threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
