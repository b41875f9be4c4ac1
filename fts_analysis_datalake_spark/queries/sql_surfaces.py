"""SQL-language surface queries (SURVEY.md §2.12 E248-E250): SQL
UDFs (CREATE FUNCTION ... RETURN), SQL scripting (BEGIN/DECLARE/
WHILE/FOR), and parameterized SQL with named markers.

These exercise the engine's SQL-language features rather than new
analytics: a reference user migrating stored procedures, macro-style
helper functions, or parameter-driven report templates needs all
three. Each declared query routes its whole computation through the
feature under test and hash-checks against a plain-SQL oracle, so
the feature's SEMANTICS (not just its parser) are verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from fts_analysis_datalake_spark.catalog import load_table, register_views
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# E248: SQL UDFs — CREATE FUNCTION ... RETURN <expr>
# --------------------------------------------------------------------------


@query(
    "q_sql_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0e0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(SUM(CASE WHEN l_discount >= 0.05e0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_discounted
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("E248", "F6", "A1", "S6"),
)
def q_sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``): the
    engine-native way to share expression vocabulary across queries
    without Python — the revenue computation and the
    discounted-line predicate are declared ONCE as named functions
    and the query text uses only those names. Catalyst inlines the
    bodies at analysis time, so the physical plan is identical to
    writing the expressions out (whole-stage codegen, no function
    call at runtime) — which is exactly what the hash check against
    the inlined-SQL oracle proves. The quantized-revenue helper is
    the SQL-UDF form of functions/deterministic.py's dsum recipe."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION revenue_cents(price DOUBLE,"
        " disc DOUBLE) RETURNS BIGINT"
        " RETURN CAST(FLOOR(price * (1.0D - disc) * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_discounted(disc DOUBLE)"
        " RETURNS BOOLEAN RETURN disc >= 0.05D"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(revenue_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS revenue_cents,
               CAST(SUM(CASE WHEN is_discounted(l_discount) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_discounted
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# E249: SQL scripting — BEGIN / DECLARE / FOR / control flow
# --------------------------------------------------------------------------


@query(
    "q_sql_scripting_rollup",
    oracle="""
    WITH yearly AS (
      SELECT date_trunc('year', o_orderdate) AS y,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY y)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_years,
           CAST(SUM(CASE WHEN rev > 20000000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big_years,
           CAST(SUM(CASE WHEN rev > 20000000000 THEN rev ELSE 0 END) AS BIGINT)
             AS big_year_revenue_cents
    FROM yearly
    """,
    tags=("E249", "F4", "A1", "S6"),
)
def q_sql_scripting_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN ... END`` with DECLARE and a
    FOR-over-result loop): the stored-procedure surface a migrating
    warehouse user reaches for first. The script iterates the
    yearly-revenue result set in SQL control flow, accumulating
    year counts and the revenue of years above a threshold into
    declared variables, and returns the final SELECT — semantics the
    hash check pins against the set-based oracle. Control flow runs
    on the DRIVER — the scripting interpreter costs ~200 ms per
    statement execution, so loop cardinality belongs in the
    aggregate, not the cursor: the per-year threshold test is a
    conditional AGGREGATE over the yearly rollup (one statement
    regardless of year count), and the FOR cursor visits exactly one
    pre-aggregated row to exercise DECLARE/FOR/SET/IF. Round 4 ran
    the IF per year (~30 statement executions, 6.1 s for a 3-scalar
    answer); this shape is ~8 executions and identical semantics —
    the right division of labor for scripting at any scale."""
    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE n_years BIGINT DEFAULT 0;
          DECLARE n_big BIGINT DEFAULT 0;
          DECLARE big_rev BIGINT DEFAULT 0;
          FOR row AS
            WITH yearly AS (
              SELECT date_trunc('year', o_orderdate) AS y,
                     CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS rev
              FROM orders GROUP BY y)
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt_years,
                   CAST(SUM(CASE WHEN rev > 20000000000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cnt_big,
                   CAST(SUM(CASE WHEN rev > 20000000000 THEN rev ELSE 0 END)
                        AS BIGINT) AS sum_big
            FROM yearly
          DO
            -- cursor columns deliberately NOT named like the declared
            -- variables: SET x = row.x silently no-ops when the cursor
            -- row exposes a column x shadowing the variable (measured
            -- on Spark 4.1 scripting; the assignment resolves against
            -- the row scope and is lost at END FOR).
            IF row.cnt_years > 0 THEN
              SET n_years = row.cnt_years;
              SET n_big = row.cnt_big;
              SET big_rev = row.sum_big;
            END IF;
          END FOR;
          SELECT n_years, n_big AS n_big_years,
                 big_rev AS big_year_revenue_cents;
        END
        """
    )


# --------------------------------------------------------------------------
# E250: parameterized SQL — named parameter markers
# --------------------------------------------------------------------------


@query(
    "q_parameterized_sql_report",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("E250", "P2", "F4", "A1", "S6"),
)
def q_parameterized_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers (``spark.sql(query,
    args=...)``): the report-template surface — one SQL text, values
    bound at run time as TYPED literals by the engine (no string
    interpolation, no injection surface, and Catalyst still constant-
    folds and pushes the bound predicates into the scan exactly like
    hand-written literals). The oracle is the same report with the
    parameters inlined; the hash check proves binding semantics,
    including the timestamp cast path."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderdate >= CAST(:start AS TIMESTAMP)
          AND o_orderdate < CAST(:end AS TIMESTAMP)
          AND o_totalprice >= :min_price
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={
            "start": "1996-01-01",
            "end": "1997-01-01",
            "min_price": 1000.0,
        },
    )


# --------------------------------------------------------------------------
# E280: WITH RECURSIVE — hierarchy walk in pure SQL (Spark 4 recursion)
# --------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE walk(s_suppkey, anc, depth) AS (
  SELECT s_suppkey, s_suppkey AS anc, 0 AS depth FROM supplier
  UNION ALL
  SELECT w.s_suppkey,
         CAST(FLOOR(w.anc / 2) AS BIGINT) AS anc,
         w.depth + 1 AS depth
  FROM walk w WHERE w.anc > 1
)
SELECT depth AS root_distance,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
       CAST(MAX(s_suppkey) AS BIGINT) AS max_key
FROM walk
WHERE anc <= 1
GROUP BY depth
ORDER BY root_distance
"""


@query(
    "q_recursive_hierarchy_walk",
    oracle=_RECURSIVE_SQL,
    tags=("E280", "A1", "F6"),
)
def q_recursive_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk every supplier
    up a deterministic binary hierarchy (parent = key DIV 2 — the
    org-chart / thread-ancestry shape) to the root and histogram the
    root distances. The SAME SQL text runs on both engines — the walk
    is linear per node (each row has one parent), depth is
    log2(max key), and the working set SHRINKS as rows reach the
    root, so the recursion is blow-up-free by construction (the
    anti-pattern to avoid is UNION ALL path enumeration on a dense
    graph — that is what the operator-form BFS in operators/graphs.py
    is for). Engine-side this is the declarative twin of the repo's
    iterative-DataFrame loops; Catalyst 4.1 executes it with a
    per-step loop over materialized steps, the same execution shape
    as localCheckpoint rounds but driven by the engine."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# --------------------------------------------------------------------------
# E281: IDENTIFIER() — SQL-injection-safe dynamic table/column binding
# --------------------------------------------------------------------------


@query(
    "q_identifier_dynamic_report",
    oracle="""
    SELECT o_orderpriority AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY grp ORDER BY grp
    """,
    tags=("E281", "S6", "A1"),
)
def q_identifier_dynamic_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IDENTIFIER(:param)`` dynamic binding (Spark 4): the
    template-report surface where the TABLE and GROUPING COLUMN are
    runtime parameters bound as identifiers, not string-spliced —
    the engine parses them as names (injection-safe) and Catalyst
    plans exactly as if they were literal, which the hash check
    against the inlined oracle proves. The same report text serves
    any (table, column) pair a dashboard wants to pivot on."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        ORDER BY grp
        """,
        args={"tbl": "orders", "grp_col": "o_orderpriority"},
    )


# --------------------------------------------------------------------------
# E282: GROUP BY ALL / ORDER BY ALL — analyst-shorthand resolution
# --------------------------------------------------------------------------


@query(
    "q_group_by_all_report",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS balance_cents
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY nation, segment
    ORDER BY nation, segment
    """,
    tags=("E282", "S6", "J1", "A1"),
)
def q_group_by_all_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` (Spark 4 analyst
    shorthand): the engine infers the grouping set as every
    non-aggregate select item and the sort key as the full select
    list — resolution semantics the hash check pins against an
    explicitly-written oracle (wrong inference would change rows or
    order-sensitive hashing of ties)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS balance_cents
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# --------------------------------------------------------------------------
# E312: SQL pipe syntax — |> operator chains (Spark 4)
# --------------------------------------------------------------------------


@query(
    "q_pipe_syntax_report",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS max_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("E312", "S6", "A1", "P1"),
)
def q_pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operator chains, the
    GoogleSQL-lineage linear form): the same filter -> derive ->
    aggregate -> order report written as a top-to-bottom pipeline
    instead of inside-out nested SQL. Catalyst plans each pipe stage
    exactly as the equivalent clause — the hash check against the
    classic-SQL oracle proves syntax-only equivalence (same exact
    integer cents, same grouping) — so the surface costs nothing at
    100 TB while making staged dashboards readable/diffable."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(cents) AS BIGINT) AS total_cents,
                     CAST(MAX(cents) AS BIGINT) AS max_cents
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        |> SELECT o_orderpriority, n, total_cents, max_cents
        """
    )


# --------------------------------------------------------------------------
# E318: Observation API — in-flight metrics without a second pass
# --------------------------------------------------------------------------


@query(
    "q_observed_write_metrics",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderpriority)
    SELECT 'observed' AS metric_source,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM q
    """,
    tags=("E318", "S6", "A1", "U1"),
)
def q_observed_write_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe()`` (the Observation API): named aggregate
    metrics accumulate INSIDE the job that produces a result — the
    write-audit pattern (row counts, checksums, null tallies
    collected during the ETL write itself, no second scan). Here
    the observed frame is a grouped report written to the noop sink;
    the observation collects total rows / exact-cents checksum /
    group count from the SAME pass, and the query returns the
    observed values — so the oracle's independent recomputation
    hash-checks that in-flight metrics equal the ground truth. At
    100 TB this is the difference between auditing a petabyte write
    for free and paying a second full scan; the documented
    one-collect exception to the no-driver-data rule is the metric
    ROW itself (a handful of scalars, same class as a COUNT)."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    report = (
        o.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("bigint")
            .alias("cents"),
        )
    )
    obs = Observation("write_audit")
    observed = report.observe(
        obs,
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [("observed", m["n_rows"], m["total_cents"], m["n_groups"])],
        "metric_source string, n_rows bigint, total_cents bigint,"
        " n_groups bigint",
    )
