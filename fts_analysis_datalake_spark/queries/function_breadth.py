"""Function-breadth declared queries (SURVEY.md §2.12 E27-E29):
distribution window functions, bitwise/boolean aggregates, and
deterministic Pearson correlation.

Closes the remaining built-in-function families a reference user
would reach for: cume_dist/nth_value (W2's distribution siblings),
bit_and/bit_or/bit_xor + bool_and/bool_or (flag-mask rollups), and
corr — the last via scaled-int moments (functions/deterministic.py
``dcorr``) because the built-in's double partials are
accumulation-order-dependent and can't hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.functions.deterministic import (
    davg,
    dcorr,
    dstddev_samp,
    sql_davg,
    sql_dcorr,
    sql_dstddev_samp,
)
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# E27: distribution window functions — cume_dist + nth_value
# --------------------------------------------------------------------------


@query(
    "q_window_distribution_funcs",
    oracle="""
    SELECT event_id, user_id,
           cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cd,
           nth_value(event_type, 3) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_event_type
    FROM events
    """,
    tags=("E27", "W2", "W7"),
)
def q_window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist (fraction of the user's events at-or-before each row
    in (ts, event_id) order) and nth_value over the full-partition
    frame (the user's third-ever event type). One window shuffle on
    user_id serves both functions."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("event_type", 3).over(w_full).alias("third_event_type"),
    )


# --------------------------------------------------------------------------
# E28: bitwise and boolean aggregates — flag-mask rollups
# --------------------------------------------------------------------------


@query(
    "q_bitwise_bool_aggs",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS all_bits, bit_or(user_id) AS any_bits,
           bit_xor(user_id) AS parity_bits,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 100) AS any_large
    FROM events
    GROUP BY event_type
    """,
    tags=("E28", "A1", "F6"),
)
def q_bitwise_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR and boolean ALL/ANY aggregates per event
    type — the permission-mask / feature-flag rollup family. All are
    commutative-associative integer/boolean ops, so they two-phase
    (map-side partials) for free and are exactly order-independent."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("all_bits"),
        F.bit_or("user_id").alias("any_bits"),
        F.bit_xor("user_id").alias("parity_bits"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 100).alias("any_large"),
    )


# --------------------------------------------------------------------------
# E29: deterministic Pearson correlation — scaled-int moments
# --------------------------------------------------------------------------


@query(
    "q_price_qty_correlation",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dcorr('l_extendedprice', 'l_quantity', 2, 0)} AS price_qty_corr,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("E29", "A6", "A1"),
)
def q_price_qty_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of extended price vs quantity per return
    flag, computed from exact DECIMAL moment sums so both engines see
    identical values (scale factors cancel in the ratio; see
    functions/deterministic.py dcorr). The five moments ride ONE
    two-phase hash aggregate — no second pass, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dcorr(F.col("l_extendedprice"), F.col("l_quantity"), 2, 0).alias(
            "price_qty_corr"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# E32: z-score feature normalization — per-key mean/std broadcast back
# --------------------------------------------------------------------------


@query(
    "q_zscore_normalized",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, {sql_davg('value')} AS mu,
             {sql_dstddev_samp('value')} AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           (e.value - s.mu) / s.sigma AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    """,
    tags=("E32", "A6", "J5"),
)
def q_zscore_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature standardization: per-type mean/stddev (deterministic
    scaled-int forms, functions/deterministic.py) broadcast back onto
    the scan; z computed map-side from identical doubles on both
    engines. The stats pass shuffles only (type, value) partials —
    the normalize pass never shuffles."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        davg(F.col("value")).alias("mu"),
        dstddev_samp(F.col("value")).alias("sigma"),
    )
    return e.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        ((F.col("value") - F.col("mu")) / F.col("sigma")).alias("z"),
    )


# --------------------------------------------------------------------------
# E33: Spearman rank correlation — Pearson (dcorr) over integer ranks
# --------------------------------------------------------------------------


@query(
    "q_spearman_price_qty",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               AS rp,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rq
      FROM lineitem)
    SELECT l_returnflag,
           {sql_dcorr('rp', 'rq', 0, 0)} AS spearman,
           COUNT(*) AS n
    FROM ranked
    GROUP BY l_returnflag
    """,
    tags=("E33", "A6", "W1"),
)
def q_spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman correlation = Pearson over rank columns: ranks are
    integers (rank() gives tied values identical ranks in both
    engines, no averaging ambiguity), so the dcorr moment sums are
    exact at scale 0 and the result hash-matches. Two window ranks
    share one partition shuffle; the moments ride one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    ranked = li.select(
        "l_returnflag",
        F.rank().over(wp).alias("rp"),
        F.rank().over(wq).alias("rq"),
    )
    return ranked.groupBy("l_returnflag").agg(
        dcorr(F.col("rp").cast("double"), F.col("rq").cast("double"), 0, 0).alias(
            "spearman"
        ),
        F.count(F.lit(1)).alias("n"),
    )

# --------------------------------------------------------------------------
# E38: winsorized mean — per-group percentile clamp then deterministic mean
# --------------------------------------------------------------------------


@query(
    "q_winsorized_quantity_mean",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.05) AS lo,
             quantile_cont(l_quantity, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           {sql_davg('LEAST(GREATEST(l.l_quantity, b.lo), b.hi)', 2)} AS wmean,
           {sql_davg('l.l_quantity', 2)} AS raw_mean,
           COUNT(*) AS n
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    tags=("E38", "A5", "A6", "J5"),
)
def q_winsorized_quantity_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust mean: clamp each value into its group's
    [p05, p95] band, then average. Two aggregate passes over one
    scan lineage — the tiny per-group bound table broadcasts back
    onto the fact, so the clamp+mean pass shuffles only (flag,
    partial-sum) pairs. Percentiles interpolate on the integral
    quantity domain (bit-equal across engines, like A5); the clamped
    sum uses the scaled-integer deterministic form since clamp
    bounds can be fractional."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.05)).alias("lo"),
        F.percentile("l_quantity", F.lit(0.95)).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("l_quantity"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(b), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            davg(clamped, 2).alias("wmean"),
            davg(F.col("l_quantity"), 2).alias("raw_mean"),
            F.count(F.lit(1)).alias("n"),
        )
    )

# --------------------------------------------------------------------------
# E43: chi-square test of independence — lang x source contingency
# --------------------------------------------------------------------------


@query(
    "q_chisq_lang_source",
    oracle="""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
    r AS (SELECT lang, SUM(o) AS r FROM cells GROUP BY lang),
    c AS (SELECT source, SUM(o) AS c FROM cells GROUP BY source),
    t AS (SELECT SUM(o) AS t FROM cells),
    terms AS (
      SELECT CAST(FLOOR(
               (CAST(cells.o * t.t - r.r * c.c AS DOUBLE)
                * CAST(cells.o * t.t - r.r * c.c AS DOUBLE))
               / (CAST(t.t AS DOUBLE) * r.r * c.c) * 1000000 + 0.5)
             AS BIGINT) AS q
      FROM cells JOIN r USING (lang) JOIN c USING (source), t)
    SELECT SUM(q) / 1000000.0 AS chi2,
           (SELECT (COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
            FROM documents) AS dof,
           (SELECT COUNT(*) FROM documents) AS n
    FROM terms
    """,
    tags=("E43", "A1", "F6", "J5"),
)
def q_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang x source
    contingency table — the drift/association check a corpus monitor
    runs between ingest batches. Cell terms use the all-integer
    identity (o*t - r*c)^2 / (t*r*c): numerators stay exact BIGINTs
    until one double cast, and per-cell terms are quantized to 1e-6
    integers before the final sum so the statistic is
    order-independent. One scan builds the cells; marginals are
    re-aggregated from the (tiny) cell table and broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    r = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    c = cells.groupBy("source").agg(F.sum("o").alias("c"))
    t = cells.agg(F.sum("o").alias("t"))
    num = (F.col("o") * F.col("t") - F.col("r") * F.col("c")).cast("double")
    term = (num * num) / (F.col("t").cast("double") * F.col("r") * F.col("c"))
    q = F.floor(term * 1000000 + F.lit(0.5)).cast("long")
    dof = (
        (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
    ).alias("dof")
    dims = d.agg(dof, F.count(F.lit(1)).alias("n"))
    return (
        cells.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .agg((F.sum(q) / 1000000.0).alias("chi2"))
        .crossJoin(F.broadcast(dims))
    )

# --------------------------------------------------------------------------
# E58: weighted median — cumulative-weight window selection
# --------------------------------------------------------------------------


@query(
    "q_weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber) AS cum_w,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM lineitem)
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median,
           CAST(COUNT(*) AS BIGINT) AS n_at_or_after
    FROM w
    WHERE cum_w >= 0.5 * tot_w
    GROUP BY l_returnflag
    """,
    tags=("E58", "A5", "W4", "W6"),
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per flag — the weighted
    percentile neither engine ships as a built-in, constructed the
    same way in both: cumulative weight along the (price, key) total
    order, then the first value whose cumulative share reaches 1/2.
    Integral weights keep the running sums exact, so the crossing
    row is identical in both engines. One window shuffle; the
    selection is a filter + MIN, no second sort."""
    li = load_table(spark, sf_dir, "lineitem")
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wa = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(wo).alias("cum_w"),
        F.sum("l_quantity").over(wa).alias("tot_w"),
    )
    return (
        w.where(F.col("cum_w") >= 0.5 * F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.count(F.lit(1)).cast("bigint").alias("n_at_or_after"),
        )
    )

# --------------------------------------------------------------------------
# E59: Gini concentration index — revenue-inequality diagnostic
# --------------------------------------------------------------------------


@query(
    "q_supplier_revenue_gini",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_suppkey),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, l_suppkey) AS i,
             COUNT(*) OVER () AS n
      FROM rev)
    SELECT CAST(MAX(n) AS BIGINT) AS n_suppliers,
           CAST(2 * SUM(i * cents) - (MAX(n) + 1) * SUM(cents) AS DOUBLE)
             / (MAX(n) * SUM(cents)) AS gini
    FROM ranked
    """,
    tags=("E59", "A1", "W1", "F6"),
)
def q_supplier_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue — the concentration/skew
    diagnostic that tells an operator whether a handful of keys own
    the workload (the same signal that decides when salting/AQE skew
    handling is worth it). Revenues are quantized to integer cents at
    aggregation, ranks are integers, so every sum in the closed-form
    Gini ((2*Σi·x − (n+1)·Σx) / (n·Σx)) is exact integer arithmetic
    until the single final division. One agg shuffle + one
    global-sort window over the (small) per-supplier table."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
            ).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("cents", "l_suppkey")
    ranked = rev.select(
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_suppliers"),
        (
            (2 * F.sum(F.col("i") * F.col("cents")) - (F.max("n") + 1) * F.sum("cents"))
            .cast("double")
            / (F.max("n") * F.sum("cents"))
        ).alias("gini"),
    )

# --------------------------------------------------------------------------
# E66: quantile normalization — map per-source ranks onto the global
# distribution
# --------------------------------------------------------------------------


@query(
    "q_quantile_normalized_chars",
    oracle="""
    WITH anchors AS (
      SELECT n_chars AS gval,
             percent_rank() OVER (ORDER BY n_chars, doc_id) AS gpr
      FROM documents),
    src AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM documents)
    SELECT src.doc_id, src.source, src.n_chars,
           CAST(anchors.gval AS BIGINT) AS norm_chars
    FROM src ASOF JOIN anchors ON src.pr >= anchors.gpr
    """,
    tags=("E66", "W2", "J9", "F6"),
)
def q_quantile_normalized_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: each document's length is replaced by
    the GLOBAL length at the same quantile its length occupies WITHIN
    its source — the feature-engineering move that makes per-source
    distributions comparable. Spark has no as-of join on a bare
    inequality, so the greatest-gpr<=pr lookup is the union+LOCF
    merge: global anchor rows and source rows sort together on rank
    (anchors first at ties), and last(ignoreNulls) carries the
    anchor value forward — ONE sort over 2N rank rows, no pair
    join. The oracle is DuckDB's native ASOF JOIN (semantics equal:
    greatest gpr <= pr; anchor ranks are unique by construction).
    At 100 TB the anchor table would be an approx-percentile sketch
    grid instead of every row — same merge, tiny anchor side."""
    d = load_table(spark, sf_dir, "documents")
    glob = d.select(
        F.col("n_chars").alias("gval"),
        F.percent_rank()
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("r"),
    ).select("gval", "r", F.lit(0).alias("is_src"),
             F.lit(None).cast("long").alias("doc_id"),
             F.lit(None).cast("string").alias("source"),
             F.lit(None).cast("long").alias("n_chars"))
    src = d.select(
        "doc_id", "source", "n_chars",
        F.percent_rank()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
    ).select(F.lit(None).cast("long").alias("gval"), "r",
             F.lit(1).alias("is_src"), "doc_id", "source", "n_chars")
    u = glob.unionByName(src)
    w = (
        Window.orderBy("r", "is_src", "gval", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.select(
            "doc_id", "source", "n_chars", "is_src",
            F.last("gval", ignorenulls=True).over(w).alias("norm_chars"),
        )
        .where(F.col("is_src") == 1)
        .select("doc_id", "source", "n_chars", "norm_chars")
    )

# --------------------------------------------------------------------------
# E77: rolling correlation — windowed exact moment sums
# --------------------------------------------------------------------------


@query(
    "q_rolling_corr_purchase_error",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'error'
                      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS y
      FROM events GROUP BY 1),
    m AS (
      SELECT h,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * y) OVER w AS sxy,
             SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
      FROM hourly
      WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT CAST(FLOOR(epoch(h)) AS BIGINT) AS hour_s, CAST(n AS BIGINT) AS n,
           CASE WHEN n >= 2
                  AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
           END AS corr_24h
    FROM m
    """,
    tags=("E77", "W5", "E29", "F6"),
)
def q_rolling_corr_purchase_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling Pearson correlation between purchase and error
    hourly values — the co-movement monitor for incident analysis.
    All five moment sums ride ONE 24-row window over exact integer
    cents (E29's determinism argument, windowed), so both engines
    divide identical integers; degenerate windows (zero variance)
    yield NULL on both sides. One hourly aggregate, one window sort
    over the tiny hour spine."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", cents).otherwise(0)).alias("y"),
    )
    w = Window.orderBy("h").rowsBetween(-23, 0)
    m = hourly.select(
        "h",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    vx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    vy = m["n"] * m["syy"] - m["sy"] * m["sy"]
    corr = F.when(
        (m["n"] >= 2) & (vx > 0) & (vy > 0),
        (m["n"] * m["sxy"] - m["sx"] * m["sy"])
        / F.sqrt(vx.cast("double"))
        / F.sqrt(vy.cast("double")),
    )
    return m.select(
        F.unix_timestamp("h").alias("hour_s"),
        F.col("n").cast("long").alias("n"),
        corr.alias("corr_24h"),
    )

# --------------------------------------------------------------------------
# E82: ordered LISTAGG — deterministic string aggregation
# --------------------------------------------------------------------------


@query(
    "q_nation_supplier_roster",
    oracle="""
    SELECT s_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS roster,
           COUNT(*) AS n_suppliers
    FROM supplier GROUP BY s_nationkey
    """,
    tags=("E82", "A9", "F1"),
)
def q_nation_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG: the per-group concatenated roster every
    report/export needs. collect_list order is nondeterministic
    under parallel aggregation, so the list is SORTED before joining
    — matching the oracle's ORDER BY inside string_agg; without the
    sort this query would flap between runs (the classic listagg
    trap)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("roster"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# E83: median absolute deviation — pure Catalyst (UDAF-free) form
# --------------------------------------------------------------------------


@query(
    "q_quantity_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_quantity) AS m
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           median(abs(l.l_quantity - med.m)) AS mad,
           MAX(med.m) AS med,
           COUNT(*) AS n
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    tags=("E83", "A5", "J5", "X3"),
)
def q_quantity_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group in pure Catalyst — the
    robust dispersion twin of the X3 pandas-UDAF MAD
    (q_value_mad_udaf), here as two exact-median passes with the
    group medians broadcast back between them. Integral quantities
    keep both interpolations bit-equal (A5). The UDAF form shows the
    API; this form is what you deploy at 100 TB — JVM-side, two
    shuffles, no Python."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("m"))
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.median(F.abs(F.col("l_quantity") - F.col("m"))).alias("mad"),
            F.max("m").alias("med"),
            F.count(F.lit(1)).alias("n"),
        )
    )

# --------------------------------------------------------------------------
# E90: top-k per parent with share-of-parent — rank + ratio in one pass
# --------------------------------------------------------------------------


@query(
    "q_top_parts_per_nation_share",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_partkey,
             SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
               AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT s_nationkey, l_partkey, cents,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY cents DESC, l_partkey) AS rk,
             SUM(cents) OVER (PARTITION BY s_nationkey) AS nation_cents
      FROM rev)
    SELECT s_nationkey, l_partkey, rk,
           cents / 100.0 AS part_revenue,
           CAST(cents AS DOUBLE) / nation_cents AS share_of_nation
    FROM ranked WHERE rk <= 3
    """,
    tags=("E90", "O3", "W1", "W4"),
)
def q_top_parts_per_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per supplier nation WITH each part's share
    of its nation's total — rank and percent-of-parent off ONE
    window shuffle (both windows partition on the same key, so
    Catalyst reuses the exchange+sort). Revenue stays integer cents
    through the rank, the total, and the tiebreak; WindowGroupLimit
    pushes the rk<=3 filter into the sort."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .groupBy("s_nationkey", "l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    wr = Window.partitionBy("s_nationkey").orderBy(F.desc("cents"), "l_partkey")
    wt = Window.partitionBy("s_nationkey")
    return (
        rev.select(
            "s_nationkey",
            "l_partkey",
            "cents",
            F.row_number().over(wr).alias("rk"),
            F.sum("cents").over(wt).alias("nation_cents"),
        )
        .where(F.col("rk") <= 3)
        .select(
            "s_nationkey",
            "l_partkey",
            "rk",
            (F.col("cents") / 100.0).alias("part_revenue"),
            (F.col("cents").cast("double") / F.col("nation_cents")).alias(
                "share_of_nation"
            ),
        )
    )


# --------------------------------------------------------------------------
# E91: index of dispersion — Poisson-ness of arrival counts
# --------------------------------------------------------------------------


@query(
    "q_arrival_dispersion_index",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS k_hours,
           CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_rate,
           (COUNT(*) * SUM(n * n) - SUM(n) * SUM(n))
             / CAST(COUNT(*) * (COUNT(*) - 1) AS DOUBLE)
             / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS dispersion
    FROM hourly GROUP BY event_type
    """,
    tags=("E91", "A6", "F4"),
)
def q_arrival_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of hourly arrival
    counts per type: ~1 means Poisson arrivals, >1 bursty, <1
    regular — the workload-characterization number behind capacity
    models. Counts are integers, so the moment sums and the variance
    numerator are exact; only the final two divisions touch doubles,
    identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    k = F.count(F.lit(1))
    s1 = F.sum("n")
    s2 = F.sum(F.col("n") * F.col("n"))
    return hourly.groupBy("event_type").agg(
        k.cast("long").alias("k_hours"),
        (s1.cast("double") / k).alias("mean_rate"),
        (
            (k * s2 - s1 * s1) / (k * (k - 1)).cast("double") / (s1.cast("double") / k)
        ).alias("dispersion"),
    )

# --------------------------------------------------------------------------
# E96: Mann-Kendall trend test — monotone-trend statistic
# --------------------------------------------------------------------------


@query(
    "q_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2)
    SELECT a.event_type,
           CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                         WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT)
             AS s_statistic,
           CAST(COUNT(DISTINCT a.d) + 1 AS BIGINT) AS n_days
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND b.d > a.d
    GROUP BY a.event_type
    """,
    tags=("E96", "J7", "A1"),
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S statistic per type: the nonparametric monotone
    trend test (sum of pairwise later-vs-earlier signs) — robust to
    outliers and distribution-free, the standard 'is this series
    drifting?' answer. The pair join is per-series over the DAILY
    aggregate (n~30 days -> ~400 pairs each), integer throughout; at
    longer horizons the O(n^2) pairs bound stays harmless because n
    is DAYS, not events. Band self-join with equi type prefix — no
    cartesian."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    a = daily.withColumnsRenamed({"d": "d_a", "cents": "c_a"})
    b = daily.withColumnsRenamed({"d": "d_b", "cents": "c_b"})
    pairs = a.join(b, "event_type").where(F.col("d_b") > F.col("d_a"))
    sign = (
        F.when(F.col("c_b") > F.col("c_a"), 1)
        .when(F.col("c_b") < F.col("c_a"), -1)
        .otherwise(0)
    )
    return pairs.groupBy("event_type").agg(
        F.sum(sign).cast("long").alias("s_statistic"),
        (F.countDistinct("d_a") + 1).cast("long").alias("n_days"),
    )


# --------------------------------------------------------------------------
# E97: seasonality strength — variance explained by the hour profile
# --------------------------------------------------------------------------


@query(
    "q_seasonality_strength",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, hour(ts) AS hod,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3),
    profile AS (
      SELECT event_type, hod, SUM(n) AS pn, COUNT(*) AS pk
      FROM hourly GROUP BY 1, 2),
    tot AS (
      SELECT event_type, SUM(n) AS tn, COUNT(*) AS tk
      FROM hourly GROUP BY 1),
    terms AS (
      SELECT hourly.event_type,
             CAST(FLOOR(
               (n - CAST(pn AS DOUBLE) / pk)
               * (n - CAST(pn AS DOUBLE) / pk) * 1000000 + 0.5) AS BIGINT)
               AS q_res,
             CAST(FLOOR(
               (n - CAST(tn AS DOUBLE) / tk)
               * (n - CAST(tn AS DOUBLE) / tk) * 1000000 + 0.5) AS BIGINT)
               AS q_tot
      FROM hourly
      JOIN profile ON hourly.event_type = profile.event_type
                  AND hourly.hod = profile.hod
      JOIN tot ON hourly.event_type = tot.event_type)
    SELECT event_type,
           1.0 - CAST(SUM(q_res) AS DOUBLE) / SUM(q_tot)
             AS variance_explained
    FROM terms GROUP BY event_type
    """,
    tags=("E97", "E63", "A6"),
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How seasonal is each series? 1 - SS_residual/SS_total where
    the model is the hour-of-day profile mean — the R^2 of
    seasonality, deciding whether the 7x24 grid (E63) is signal or
    noise. Squared deviations are 1e-6-quantized before summing
    (order-free); the profile and grand means divide exact integers
    identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    profile = hourly.groupBy("event_type", "hod").agg(
        F.sum("n").alias("pn"), F.count(F.lit(1)).alias("pk")
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.count(F.lit(1)).alias("tk")
    )
    dres = F.col("n") - F.col("pn").cast("double") / F.col("pk")
    dtot = F.col("n") - F.col("tn").cast("double") / F.col("tk")
    q_res = F.floor(dres * dres * 1000000 + F.lit(0.5)).cast("long")
    q_tot = F.floor(dtot * dtot * 1000000 + F.lit(0.5)).cast("long")
    return (
        hourly.join(F.broadcast(profile), ["event_type", "hod"])
        .join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            (F.lit(1.0) - F.sum(q_res).cast("double") / F.sum(q_tot)).alias(
                "variance_explained"
            )
        )
    )


# --------------------------------------------------------------------------
# E98: two-proportion z-test — the A/B experiment readout
# --------------------------------------------------------------------------


@query(
    "q_ab_conversion_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 250
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    arms AS (
      SELECT arm, COUNT(*) AS n, SUM(converted) AS x
      FROM assign GROUP BY arm)
    SELECT MAX(CASE WHEN arm = 0 THEN CAST(x AS DOUBLE) / n END) AS rate_a,
           MAX(CASE WHEN arm = 1 THEN CAST(x AS DOUBLE) / n END) AS rate_b,
           (MAX(CASE WHEN arm = 0 THEN CAST(x AS DOUBLE) / n END)
            - MAX(CASE WHEN arm = 1 THEN CAST(x AS DOUBLE) / n END))
           / NULLIF(sqrt(CAST(SUM(x) AS DOUBLE) / SUM(n)
                  * (1 - CAST(SUM(x) AS DOUBLE) / SUM(n))
                  * (1.0 / MAX(CASE WHEN arm = 0 THEN n END)
                     + 1.0 / MAX(CASE WHEN arm = 1 THEN n END))), 0) AS z_score
    FROM arms
    """,
    tags=("E98", "A7", "F6"),
)
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment readout: per-arm conversion rates (user_id
    parity stands in for assignment; conversion = a high-value
    purchase so the fixture rate sits strictly inside (0,1)) and the
    pooled two-proportion z-score — the number every A/B dashboard
    prints. All inputs are exact integer counts; the z expression is
    one double formula written identically on both sides. The pooled
    variance is NULLIF-guarded: an experiment with zero (or 100%)
    conversions has an undefined z, and under ANSI the bare division
    is a hard DIVIDE_BY_ZERO — the 8x scale probe hit exactly that on
    a fixture where no purchase cleared the value threshold, which is
    precisely what a sliced 100 TB readout does on its quiet
    segments. NULL is the correct undefined-z answer on BOTH engines,
    and on any fixture with conversions the guard is inert."""
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 250), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x")
    )
    ra = F.max(F.when(F.col("arm") == 0, F.col("x").cast("double") / F.col("n")))
    rb = F.max(F.when(F.col("arm") == 1, F.col("x").cast("double") / F.col("n")))
    pooled = F.sum("x").cast("double") / F.sum("n")
    z = (ra - rb) / F.nullif(
        F.sqrt(
            pooled
            * (1 - pooled)
            * (
                1.0 / F.max(F.when(F.col("arm") == 0, F.col("n")))
                + 1.0 / F.max(F.when(F.col("arm") == 1, F.col("n")))
            )
        ),
        F.lit(0.0),
    )
    return arms.agg(ra.alias("rate_a"), rb.alias("rate_b"), z.alias("z_score"))


# --------------------------------------------------------------------------
# E239: observable metrics — df.observe() side-channel aggregates
# --------------------------------------------------------------------------


@query(
    "q_observed_metrics_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem
    """,
    tags=("E239", "S5", "A1", "A8"),
)
def q_observed_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observable metrics (``df.observe`` + ``Observation``): attach
    side-channel aggregates to a scan so ONE pass yields both the
    pipeline's real output and its data-quality counters — the API a
    production job uses to emit row counts / checksums per batch
    without a second scan (in streaming, the same node surfaces per
    micro-batch via the listener). The observed values (row count,
    exact cents total, quantity bounds) are collected through the
    Observation handle after the consuming action and re-emitted as a
    1-row frame (the S5 createDataFrame surface), hash-checked
    against the direct-aggregation oracle — proving the observe node
    sees every row exactly once."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_metrics")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("total_cents"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["total_cents"]),
                int(m["min_qty"]),
                int(m["max_qty"]),
            )
        ],
        "n_rows bigint, total_cents bigint, min_qty bigint, max_qty bigint",
    )
