"""Scalar-function layer queries (SURVEY.md §7 step 3; §2.8 F1-F11).

The FTS-analysis trio re-expressed on the fixtures:
- time-bucketed throughput (date_trunc hour — THE FTS grouping key),
- JSON metadata-blob extraction (events.props ~ FTS job metadata),
- regex parsing (error categories / SURL hosts ~ document tokens/URLs).

Cross-engine determinism notes applied here (SURVEY §5.3):
- dayofweek: Spark is 1=Sunday..7, DuckDB 0=Sunday..6 → Spark side
  subtracts 1.
- epoch seconds: Spark unix_timestamp floors; DuckDB epoch() is
  fractional → FLOOR() on the oracle side.
- cast double->int: Spark truncates, DuckDB rounds → always FLOOR
  explicitly before casting.
- regex: common Java/RE2 subset only (char classes, anchors, groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum, sql_dsum
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# F4: hourly time-bucketed event report (the FTS per-hour link report)
# --------------------------------------------------------------------------


@query(
    "q_events_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum('value')} AS total_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-08'
    GROUP BY 1, 2
    """,
    tags=("F4", "A1", "A3", "P4"),
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event rollup over a 3-day window. At 100 TB the
    time predicate prunes parquet row groups / partitions before the
    single groupBy shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.col("value")).alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# --------------------------------------------------------------------------
# F10: JSON metadata extraction (events.props ~ FTS job-metadata blob)
# --------------------------------------------------------------------------


@query(
    "q_events_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) / COUNT(*) AS avg_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type
    """,
    tags=("F10", "A1", "P2"),
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured props column on demand; the JSON path
    evaluation stays JVM-side (no UDF)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


# --------------------------------------------------------------------------
# F2/P6: regex extraction + LIKE/rlike filtering (error-category analog)
# --------------------------------------------------------------------------


@query(
    "q_doc_leading_token_regex",
    oracle="""
    SELECT regexp_extract(text, '^([a-z]+)', 1) AS lead_token, lang,
           COUNT(*) AS n_docs
    FROM documents
    WHERE text LIKE '%query%' OR regexp_matches(text, 'join [a-z]+ scan')
    GROUP BY 1, 2
    """,
    tags=("F2", "P6", "A1"),
)
def q_doc_leading_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex category extraction + LIKE/regex predicates (the FTS
    error-message classifier pattern), common Java/RE2 dialect subset."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").like("%query%") | F.col("text").rlike("join [a-z]+ scan"))
        .groupBy(
            F.regexp_extract(F.col("text"), "^([a-z]+)", 1).alias("lead_token"),
            F.col("lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# F3: URL host parsing (SURL/storage-element analog) — regex version
# --------------------------------------------------------------------------


@query(
    "q_url_host_parse",
    oracle="""
    SELECT regexp_extract('gsiftp://' || source || '.example.org/store/' || CAST(doc_id AS VARCHAR),
                          '://([^/]+)/', 1) AS host,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    tags=("F3", "F1", "A1"),
)
def q_url_host_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build transfer-URL-shaped strings and parse the host back out —
    the portable (regex) version of parse_url, identical in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("gsiftp://"), F.col("source"), F.lit(".example.org/store/"), F.col("doc_id").cast("string")
    )
    return (
        d.select(F.regexp_extract(url, "://([^/]+)/", 1).alias("host"), "n_chars")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
    )


# --------------------------------------------------------------------------
# F1: string-function stack on customer names
# --------------------------------------------------------------------------


@query(
    "q_customer_name_funcs",
    oracle="""
    SELECT c_custkey,
           CAST(str_split(c_name, '#')[2] AS BIGINT) AS name_id,
           upper(str_split(c_name, '#')[1]) AS kind_upper,
           length(c_name) AS name_len,
           substring(c_name, 1, 4) AS prefix,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           instr(c_name, '#') AS hash_pos,
           c_name LIKE 'Customer%' AS is_customer
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
    tags=("F1", "P1", "P9"),
)
def q_customer_name_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/upper/length/substring/lpad/concat_ws/replace/instr/
    startswith — all JVM-side codegen'd expressions."""
    c = load_table(spark, sf_dir, "customer").filter((F.col("c_custkey") % 10) == 0)
    parts = F.split(F.col("c_name"), "#")
    return c.select(
        "c_custkey",
        parts.getItem(1).cast("bigint").alias("name_id"),
        F.upper(parts.getItem(0)).alias("kind_upper"),
        F.length("c_name").alias("name_len"),
        F.substring(F.col("c_name"), 1, 4).alias("prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_replace(F.col("c_name"), "Customer", "Cust").alias("short_name"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.col("c_name").startswith("Customer").alias("is_customer"),
    )


# --------------------------------------------------------------------------
# F4/F5: date parts + interval arithmetic on orders
# --------------------------------------------------------------------------


@query(
    "q_order_date_parts",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           COUNT(*) AS n_orders,
           MIN(dayofweek(o_orderdate)) AS min_dow,
           MAX(datediff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS max_days_since,
           MIN(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)) AS min_epoch
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("F4", "F5", "A1"),
)
def q_order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/quarter bucketing + dow + day-diff + epoch seconds, with
    the Spark↔DuckDB convention fixes (dow -1; floor epoch)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.dayofweek("o_orderdate") - 1).cast("bigint").alias("min_dow"),
            F.max(
                F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            ).cast("bigint").alias("max_days_since"),
            F.min(F.unix_timestamp("o_orderdate")).alias("min_epoch"),
        )
    )


# --------------------------------------------------------------------------
# F6: math-function stack (per-quantity profile)
# --------------------------------------------------------------------------


@query(
    "q_quantity_math",
    oracle="""
    SELECT l_quantity,
           COUNT(*) AS n,
           sqrt(l_quantity) AS sqrt_qty,
           FLOOR(ln(l_quantity) * 1000000000 + 0.5) / 1000000000.0 AS ln_qty,
           abs(l_quantity - 25.0) AS dist_from_25,
           CAST(FLOOR(sqrt(l_quantity)) AS BIGINT) AS floor_sqrt,
           CAST(CEIL(sqrt(l_quantity)) AS BIGINT) AS ceil_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    GROUP BY l_quantity
    """,
    tags=("F6", "A1"),
)
def q_quantity_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt (IEEE-exact), ln (libm-agreement verified by parity test),
    abs/floor/ceil/pmod — all on the integral quantity domain."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy("l_quantity").agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(q).alias("sqrt_qty"),
        # JVM Math.log and DuckDB libm disagree in the last ulp for some
        # inputs -> quantize to 1e-9 on both sides (diff ~2e-16, safe).
        (F.floor(F.log(q) * 1e9 + F.lit(0.5)) / 1e9).alias("ln_qty"),
        F.abs(q - 25.0).alias("dist_from_25"),
        F.floor(F.sqrt(q)).alias("floor_sqrt"),
        F.ceil(F.sqrt(q)).alias("ceil_sqrt"),
        (q * q).alias("qty_sq"),
        (q.cast("bigint") % 7).alias("qty_mod7"),
    )


# --------------------------------------------------------------------------
# P7/P9: null handling + casts (missing JSON key -> coalesce default)
# --------------------------------------------------------------------------


@query(
    "q_null_handling_casts",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.missing') AS INTEGER), -1)) AS BIGINT)
               AS sum_missing_defaulted,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
    FROM events
    GROUP BY event_type
    """,
    tags=("P7", "P9", "F10", "A7"),
)
def q_null_handling_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull / coalesce / explicit floor-then-cast (the portable
    double->int conversion; raw CAST truncates in Spark but rounds in
    DuckDB, so the engine never relies on bare casts of noisy doubles).

    The JSON column is parsed ONCE per row (projected from_json)
    instead of one get_json_object walk per referencing aggregate —
    round 1 parsed it twice and ran the whole scan on one core
    (single-row-group file), making this 5-row query one of the
    slowest in the bench."""
    from fts_analysis_datalake_spark.catalog import ensure_parallelism

    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    parsed = e.select(
        "event_type",
        "value",
        F.from_json("props", "missing int").getField("missing").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("missing"), F.lit(-1))).cast("bigint").alias(
            "sum_missing_defaulted"
        ),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.sum(F.floor(F.col("value"))).cast("bigint").alias("sum_floor_value"),
    )


# --------------------------------------------------------------------------
# F9: map functions — from_json->map, map_keys, element_at,
# map_from_entries, map_contains_key
# --------------------------------------------------------------------------


@query(
    "q_props_map_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    tags=("F9", "F10", "A1"),
)
def q_props_map_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props into a real MapType and use the map-function surface
    (map_keys, map_contains_key, element_at) instead of JSON-path
    strings. The map parse + lookups are Catalyst expressions, so at
    100 TB this stays inside whole-stage codegen with no UDF barrier;
    the oracle expresses the same lookups via DuckDB json_extract."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("m", F.from_json("props", "map<string,int>"))
        .filter(F.array_contains(F.map_keys("m"), F.lit("k")))
        .withColumn("k", F.element_at("m", F.lit("k")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_user_type_count_map",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(MAX(cnt) AS BIGINT) AS max_type_count
    FROM (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ) GROUP BY user_id
    """,
    tags=("F9", "A1", "A9"),
)
def q_user_type_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user map event_type -> count via
    map_from_entries(collect_list(struct(...))) and read it back with
    size() and map_values(). Demonstrates map construction/consumption
    round-trip; the oracle checks the same facts relationally. The
    collect_list is bounded by the event-type cardinality (small), so
    per-group state stays tiny even at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "cnt"))
            ).alias("m")
        )
        .select(
            "user_id",
            F.size(F.map_keys("m")).cast("bigint").alias("n_types"),
            F.array_max(F.map_values("m")).cast("bigint").alias("max_type_count"),
        )
    )

# --------------------------------------------------------------------------
# E61: VARIANT semi-structured type — parse once, typed extraction
# --------------------------------------------------------------------------


@query(
    "q_variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("E61", "F10", "P9", "A1"),
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: parse_json
    once into the binary variant encoding, then typed variant_get
    extraction — the open-schema path that (unlike from_json with a
    fixed StructType) survives heterogeneous or evolving payloads
    and (unlike get_json_object) avoids re-parsing the JSON text per
    extraction. At 100 TB, parse-once-extract-many is the difference
    between one and k string parses per row; the aggregate proves
    the extraction end-to-end against a plain-JSON oracle."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get(F.col("v"), "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# E133: business-day rollforward — weekend orders land on next Monday
# --------------------------------------------------------------------------


@query(
    "q_business_day_rollforward",
    oracle="""
    WITH adj AS (
      SELECT CASE isodow(CAST(o_orderdate AS DATE))
               WHEN 6 THEN CAST(o_orderdate AS DATE) + 2
               WHEN 7 THEN CAST(o_orderdate AS DATE) + 1
               ELSE CAST(o_orderdate AS DATE) END AS biz_d,
             CASE WHEN isodow(CAST(o_orderdate AS DATE)) >= 6 THEN 1 ELSE 0 END AS rolled,
             o_totalprice
      FROM orders)
    SELECT CAST(biz_d AS TIMESTAMP) AS biz_date,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(rolled) AS BIGINT) AS n_rolled,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
    FROM adj GROUP BY biz_d
    """,
    tags=("E133", "F4", "F5", "A1", "A7"),
)
def q_business_day_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-calendar normalization: weekend order dates roll
    forward to the next Monday (settlement-date convention), then
    volume/revenue aggregate on the adjusted date with a count of how
    many rows each Monday absorbed. The cross-engine day-of-week trap
    is handled explicitly: Spark's dayofweek is 1=Sunday while the
    oracle's isodow is 1=Monday, so both sides are mapped onto the
    ISO numbering before comparison. Pure projection + one hash agg;
    the calendar CASE costs nothing at scale (codegen'd, no join
    against a calendar table needed for a weekly-cycle rule)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    isodow = ((F.dayofweek(d) + 5) % 7) + 1
    adj = o.select(
        F.when(isodow == 6, F.date_add(d, 2))
        .when(isodow == 7, F.date_add(d, 1))
        .otherwise(d)
        .cast("timestamp")
        .alias("biz_date"),
        F.when(isodow >= 6, 1).otherwise(0).alias("rolled"),
        "o_totalprice",
    )
    return adj.groupBy("biz_date").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("rolled").cast("bigint").alias("n_rolled"),
        (F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))) / 100.0).alias("revenue"),
    )


# --------------------------------------------------------------------------
# E134: per-group categorical mode — most frequent value + share
# --------------------------------------------------------------------------


@query(
    "q_mode_k_per_event_type",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_k
      FROM counts GROUP BY 1),
    best AS (
      SELECT event_type, k AS mode_k, n AS mode_n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, k) AS rn
      FROM counts)
    SELECT b.event_type, mode_k, mode_n, n_distinct_k,
           CAST(mode_n AS DOUBLE) / CAST(total AS DOUBLE) AS mode_share
    FROM best b JOIN totals t ON b.event_type = t.event_type
    WHERE rn = 1
    """,
    tags=("E134", "A1", "O3", "F10", "W1"),
)
def q_mode_k_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tiebreak
    (smallest value wins) plus distribution context: distinct-value
    count and the mode's share of the group. Spark has a ``mode``
    aggregate but its tie survivor is arbitrary — the checked form is
    the two-level count + rank-1 window, which is both deterministic
    and the shape that scales (the rank runs over the (group, value)
    aggregate, never the raw rows; WindowGroupLimit prunes rank>1
    map-side)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = e.groupBy(
        "event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    totals = counts.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_k"),
    )
    rk = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "k")
    best = (
        counts.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("mode_k"), F.col("n").alias("mode_n"))
    )
    return best.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "mode_k",
        "mode_n",
        "n_distinct_k",
        (F.col("mode_n").cast("double") / F.col("total").cast("double")).alias("mode_share"),
    )
