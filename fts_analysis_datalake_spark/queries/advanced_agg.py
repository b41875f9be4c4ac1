"""Advanced aggregation tranche (SURVEY.md §7 step 6; §2.4 A4-A6,
A8-A9, A11-A14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.caching import tracked_persist
from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.functions.deterministic import (
    dstddev_samp,
    dsum,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
)
from fts_analysis_datalake_spark.operators.text import sql_tokens
from fts_analysis_datalake_spark.registry import query

_SQL_TOKENS = sql_tokens("text")

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# --------------------------------------------------------------------------
# A11: rollup / cube / grouping sets with grouping_id
# --------------------------------------------------------------------------


@query(
    "q_rollup_lang_source",
    oracle="""
    SELECT COALESCE(lang, 'ALL') AS lang_g, COALESCE(source, 'ALL') AS source_g,
           CAST(GROUPING(lang, source) AS BIGINT) AS gid,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY ROLLUP(lang, source)
    """,
    tags=("A11", "P7"),
)
def q_rollup_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang,source) + per-lang + grand-total in ONE pass — the
    FTS per-link/per-site/total report without re-scanning (Spark
    expands grouping sets map-side; still a single shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang_g"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_g"),
            "gid",
            "n_docs",
            "total_chars",
        )
    )


@query(
    "q_cube_flag_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '*') AS flag_g, COALESCE(l_linestatus, '*') AS status_g,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("A11",),
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (flag, status): all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("*")).alias("flag_g"),
            F.coalesce(F.col("l_linestatus"), F.lit("*")).alias("status_g"),
            "gid",
            "n",
            "total_price",
        )
    )


@query(
    "q_grouping_sets_events",
    oracle="""
    SELECT COALESCE(event_type, '*') AS type_g,
           COALESCE(CAST(user_id AS VARCHAR), '*') AS user_g,
           COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
    tags=("A11",),
)
def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: by type, by user, and grand total —
    disjoint rollup axes in one scan."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupingSets([["event_type"], ["user_id"], []], "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("*")).alias("type_g"),
            F.coalesce(F.col("user_id").cast("string"), F.lit("*")).alias("user_g"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# A12/A13: pivot matrix + unpivot back to long form
# --------------------------------------------------------------------------


@query(
    "q_pivot_user_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("A12", "A7"),
)
def q_pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user x event_type count matrix (the FTS source x dest heatmap
    input). Explicit pivot value list => stable output schema and a
    single-pass plan; zero-filled to match the CASE-based oracle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "q_unpivot_money_columns",
    oracle="""
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(FLOOR(amount * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM (
      SELECT 'extendedprice' AS metric, l_extendedprice AS amount FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    )
    GROUP BY metric
    """,
    tags=("A13", "U1"),
)
def q_unpivot_money_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt/unpivot three money columns to long form then aggregate
    per metric (matrix back to tidy rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        [
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        ],
        "metric",
        "amount",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("amount")).alias("total"),
    )


# --------------------------------------------------------------------------
# A14: histogram / bucketed counts
# --------------------------------------------------------------------------


@query(
    "q_order_price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_lo,
           COUNT(*) AS n,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    """,
    tags=("A14", "F6"),
)
def q_order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (duration-histogram analog)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        (F.floor(F.col("o_totalprice") / 50000) * 50000).cast("bigint").alias("bucket_lo")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# A5: exact percentiles (integral domain -> interpolation bit-equal)
# --------------------------------------------------------------------------


@query(
    "q_quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           median(l_quantity) AS med
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A5",),
)
def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles on the integral quantity
    domain (p50/p95-style transfer-duration metrics). Interpolation
    at quarter fractions of integers is exact in double, so Spark's
    percentile and DuckDB's quantile_cont agree bitwise (verified)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.median("l_quantity").alias("med"),
    )


# --------------------------------------------------------------------------
# A6: stddev / variance (deterministic scaled-moment form)
# --------------------------------------------------------------------------


@query(
    "q_value_dispersion",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dstddev_samp('value', 2)} AS sd_value,
           {sql_davg('value', 2)} AS mean_value
    FROM events
    GROUP BY event_type
    """,
    tags=("A6", "A1"),
)
def q_value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev + mean of event value per type (throughput
    variability), via order-independent scaled integer moments."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dstddev_samp(F.col("value"), 2).alias("sd_value"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0 / F.count(F.lit(1))).alias(
            "mean_value"
        ),
    )


# --------------------------------------------------------------------------
# A8: deterministic representative row via min_by / max_by
# --------------------------------------------------------------------------


@query(
    "q_first_last_event_argminmax",
    oracle="""
    SELECT user_id,
           arg_min(event_type, event_id) AS first_type,
           arg_max(event_type, event_id) AS last_type,
           arg_max(value, event_id) AS last_value
    FROM events
    GROUP BY user_id
    """,
    tags=("A8",),
)
def q_first_last_event_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last per group the deterministic way: min_by/max_by on a
    unique ordering column (event_id), not F.first/F.last which depend
    on partition arrival order."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


# --------------------------------------------------------------------------
# A9: collect_set / collect_list with sorted determinism
# --------------------------------------------------------------------------


@query(
    "q_event_types_per_user",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_seen,
           CAST(len(list_distinct(list(event_type))) AS INTEGER) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("A9", "F7"),
)
def q_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set of event types per user, sort_array'd for
    deterministic order then array_join'd — declared outputs avoid
    array-typed columns so the driver's value hash can't diverge on
    list representation (engine-side the operator is the array)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_seen"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


# --------------------------------------------------------------------------
# A4: approx_count_distinct (no oracle — engine-specific sketch)
# --------------------------------------------------------------------------


@query(
    "q_approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_ok,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A4",),
)
def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct at 2% rsd — the 100 TB cardinality path
    (exact distinct shuffles every key; HLL merges fixed sketches).
    Declared in the driver-verifiable ENVELOPE form (r6, replacing the
    rows-only form that left a permanent no_oracle record): the HLL
    value itself is engine-specific, so the query emits the exact
    distinct count plus a boolean asserting the sketch landed within
    5x its declared rsd — the same contract tests/test_approx.py
    asserts — and the oracle recomputes the exact count expecting
    every flag TRUE. A broken or drifting HLL flips the value hash."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * 0.1
        ).alias("approx_ok"),
        "n",
    )


@query(
    "q_approx_distinct_envelope",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A4", "A2"),
)
def q_approx_distinct_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 in driver-verifiable form: the HLL sketch value itself is
    engine-specific (q_approx_distinct_parts stays rows-only for it),
    but its accuracy CONTRACT is checkable — emit the exact distinct
    count alongside a boolean asserting the sketch landed within 5x
    its declared 2% rsd (the same envelope tests/test_approx.py
    asserts). The oracle recomputes the exact count and expects every
    envelope flag TRUE, so a broken or drifting HLL flips the value
    hash. At 100 TB the approx path is the one that survives — fixed
    sketch merge instead of shuffling every distinct key."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("n_approx"),
    )
    return agg.select(
        "o_orderpriority",
        "n_exact",
        (F.abs(F.col("n_approx") - F.col("n_exact")) <= F.col("n_exact") * 0.1).alias(
            "approx_ok"
        ),
    )

# --------------------------------------------------------------------------
# E51: equi-depth histogram — ntile buckets with per-bucket envelopes
# --------------------------------------------------------------------------


@query(
    "q_equidepth_price_histogram",
    oracle="""
    WITH b AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM b GROUP BY bucket
    """,
    tags=("E51", "A14", "W2"),
)
def q_equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row count per bucket, data-driven
    bounds) — the optimizer-statistics / drift-monitoring complement
    of the fixed-width A14 histogram. ntile's floor distribution is
    identical in both engines given the total order (price with
    orderkey tiebreak). Single window sort, then a tiny bucket
    aggregate; at scale the same result comes from percentile
    boundaries instead of a global sort — documented tradeoff, this
    form is the exact one."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# E73: top-k + OTHER rollup — bounded-cardinality reporting
# --------------------------------------------------------------------------


@query(
    "q_top_terms_with_other",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKENS}) AS term FROM documents),
    counts AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    top AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 10)
    SELECT term, CAST(n AS BIGINT) AS n FROM top
    UNION ALL
    SELECT 'OTHER', CAST(SUM(n) AS BIGINT) FROM counts
    WHERE term NOT IN (SELECT term FROM top)
    """,
    tags=("E73", "O3", "U1", "A1"),
)
def q_top_terms_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-cardinality reporting: the top-10 terms keep their
    identity, everything else collapses into one OTHER row whose
    count preserves the total — the pattern every dashboard needs so
    high-cardinality dimensions can't blow up the result. Spark
    shape: one term aggregate, TakeOrderedAndProject for the top-k,
    then an anti-join (broadcast, 10 keys) + single-row aggregate
    for the remainder — the term table is aggregated ONCE and
    reused."""
    from fts_analysis_datalake_spark.operators.text import normalize_text, tokens

    d = load_table(spark, sf_dir, "documents")
    counts = tracked_persist(
        d.select(F.explode(tokens(normalize_text(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "term").limit(10)
    other = (
        counts.join(F.broadcast(top.select("term")), "term", "left_anti")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.lit("OTHER").alias("term"), "n")
    )
    return top.select("term", F.col("n").cast("long").alias("n")).unionByName(other)


# --------------------------------------------------------------------------
# E74: geometric mean — exact log-space aggregation
# --------------------------------------------------------------------------


@query(
    "q_geometric_mean_value",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(
             exp(SUM(CAST(FLOOR(ln(value) * 1000000000 + 0.5) AS BIGINT))
                 / 1000000000.0 / COUNT(*)) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS geo_mean,
           COUNT(*) AS n
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
    tags=("E74", "A6", "F6"),
)
def q_geometric_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean per type — the right average for multiplicative
    quantities (rates, ratios), computed in log space: per-row ln is
    quantized to 1e-9 integers (libm guard, house pattern) so the
    sum is order-independent — and the final exp is ALSO 1e-6
    output-quantized (r6): exp itself is libm-implementation-defined
    in the last ulp (JVM vs DuckDB diverged on one sf0.001 group),
    so identical inputs do not guarantee identical raw doubles.
    Map-side partials only."""
    e = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    qln = F.floor(F.log(F.col("value")) * 1000000000 + F.lit(0.5)).cast("long")
    geo = F.exp(F.sum(qln) / 1000000000.0 / F.count(F.lit(1)))
    return e.groupBy("event_type").agg(
        (F.floor(geo * 1e6 + F.lit(0.5)).cast("bigint") / 1e6).alias("geo_mean"),
        F.count(F.lit(1)).alias("n"),
    )
