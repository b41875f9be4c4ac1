"""Warehouse-lifecycle declared queries (SURVEY.md §2.12 E12-E14):
CDC merge/upsert, SCD2 history, and an approximate-percentile sketch.

The change batch for the CDC query is constructed deterministically
from the fixture itself (orders in the 1999+ period), so the oracle
can rebuild the identical batch in SQL: customers with >=2 period
orders get their balance replaced (upsert), customers with exactly 1
get tombstoned (delete), and heavy customers (>=4) additionally
produce brand-new re-keyed rows (insert).

Timestamps in SCD2 output follow the repo convention for the
ns-precision events table: epoch seconds as BIGINT on both engines
(Spark truncates parquet ns to µs, so raw ts columns never cross the
oracle boundary — see windows_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import broadcast_dim, load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum, sql_dsum
from fts_analysis_datalake_spark.operators.cdc import merge_upsert, scd2_history
from fts_analysis_datalake_spark.registry import query

_CDC_CUTOFF = "1999-01-01"


@query(
    "q_cdc_merge_customers",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_CDC_CUTOFF}'
      GROUP BY o_custkey),
    changes AS (
      SELECT c.c_custkey, c.c_name, c.c_nationkey, p.total AS c_acctbal,
             c.c_mktsegment, 'U' AS op
      FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey WHERE p.n >= 2
      UNION ALL
      SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment, 'D'
      FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey WHERE p.n = 1
      UNION ALL
      SELECT p.o_custkey + 1000000, 'Customer#new_' || CAST(p.o_custkey AS VARCHAR),
             CAST(p.o_custkey % 25 AS INTEGER), p.total, 'NEW', 'U'
      FROM per_cust p WHERE p.n >= 4)
    SELECT COALESCE(ch.c_custkey, b.c_custkey)       AS c_custkey,
           COALESCE(ch.c_name, b.c_name)             AS c_name,
           COALESCE(ch.c_nationkey, b.c_nationkey)   AS c_nationkey,
           COALESCE(ch.c_acctbal, b.c_acctbal)       AS c_acctbal,
           COALESCE(ch.c_mktsegment, b.c_mktsegment) AS c_mktsegment
    FROM customer b FULL OUTER JOIN changes ch ON b.c_custkey = ch.c_custkey
    WHERE COALESCE(ch.op, 'U') <> 'D'
    """,
    tags=("E12", "J2", "U1", "W1", "A1"),
)
def q_cdc_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics without a table format: apply a compacted CDC
    batch (upserts, deletes, inserts) to the customer snapshot via
    union + per-key priority window — one shuffle, no join (the
    oracle uses the equivalent FULL OUTER JOIN formulation, legal
    because the batch has at most one change per key)."""
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_CDC_CUTOFF).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )
    upd = (
        per_cust.filter(F.col("n") >= 2)
        .join(broadcast_dim(c, "customer"), per_cust.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.col("total").alias("c_acctbal"),
            "c_mktsegment",
            F.lit("U").alias("_op"),
        )
    )
    dele = (
        per_cust.filter(F.col("n") == 1)
        .join(broadcast_dim(c, "customer"), per_cust.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
            F.lit("D").alias("_op"),
        )
    )
    ins = per_cust.filter(F.col("n") >= 4).select(
        (F.col("o_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("Customer#new_"), F.col("o_custkey").cast("string")).alias("c_name"),
        (F.col("o_custkey") % 25).cast("int").alias("c_nationkey"),
        F.col("total").alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("U").alias("_op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    return merge_upsert(c, changes, ["c_custkey"])


@query(
    "q_scd2_user_event_history",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from_s,
           CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                AS BIGINT) AS valid_to_s,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM marked
    WHERE prev IS NULL OR prev <> event_type
    """,
    tags=("E13", "W3", "W1"),
)
def q_scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over each user's event-type stream:
    consecutive same-type events collapse into one interval; the open
    interval per user is current. One window shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    hist = scd2_history(e, ["user_id"], "ts", "event_type", "event_id")
    return hist.select(
        "user_id",
        "event_type",
        F.unix_timestamp("valid_from").alias("valid_from_s"),
        F.unix_timestamp("valid_to").alias("valid_to_s"),
        "is_current",
    )


@query(
    "q_approx_quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(FLOOR(quantile_cont(l_quantity, 0.25) * 100 + 0.5) AS BIGINT)
             / 100.0 AS p25,
           CAST(FLOOR(quantile_cont(l_quantity, 0.50) * 100 + 0.5) AS BIGINT)
             / 100.0 AS p50,
           CAST(FLOOR(quantile_cont(l_quantity, 0.75) * 100 + 0.5) AS BIGINT)
             / 100.0 AS p75,
           TRUE AS approx_ok,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("E14", "A4", "A5"),
)
def q_approx_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p25/p50/p75 of l_quantity per returnflag via
    percentile_approx (Greenwald-Khanna sketch, accuracy 10^4) — the
    mergeable-sketch path for percentiles at 100 TB, where the exact
    sort-based form needs a full shuffle of the column. Envelope-
    oracle form since r6 (DuckDB's approx_quantile is a different
    sketch, so the GK values themselves stay uncheckable): the query
    emits the EXACT continuous percentiles (Spark `percentile` and
    DuckDB `quantile_cont` share the (n-1)p interpolation definition;
    on 1..50-integer quantities with p in {.25,.5,.75} every
    interpolation step is exact binary arithmetic, cent-quantized as
    belt) plus a flag asserting each GK estimate landed within 1
    quantity unit of it — the bound tests/test_approx.py enforces.
    The oracle recomputes the exact percentiles and expects every
    flag TRUE."""
    li = load_table(spark, sf_dir, "lineitem")

    def q100(c: F.Column) -> F.Column:
        return F.floor(c * 100 + F.lit(0.5)).cast("bigint") / 100.0

    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("e25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("e50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("e75"),
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    ok = (
        (F.abs(F.col("a")[0] - F.col("e25")) <= 1.0)
        & (F.abs(F.col("a")[1] - F.col("e50")) <= 1.0)
        & (F.abs(F.col("a")[2] - F.col("e75")) <= 1.0)
    )
    return agg.select(
        "l_returnflag",
        q100(F.col("e25")).alias("p25"),
        q100(F.col("e50")).alias("p50"),
        q100(F.col("e75")).alias("p75"),
        ok.alias("approx_ok"),
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# E128: golden-record consolidation — latest attribute per source
# --------------------------------------------------------------------------


@query(
    "q_golden_record_users",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    gold AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN k END) AS k_view,
             MAX(CASE WHEN event_type = 'click' THEN k END) AS k_click,
             MAX(CASE WHEN event_type = 'purchase' THEN k END) AS k_purchase,
             MAX(CASE WHEN event_type = 'signup' THEN k END) AS k_signup,
             MAX(ts_s) AS last_seen_s
      FROM latest WHERE rn = 1 GROUP BY user_id),
    tot AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY user_id)
    SELECT g.user_id, k_view, k_click, k_purchase, k_signup, last_seen_s, n_events
    FROM gold g JOIN tot USING (user_id)
    """,
    tags=("E128", "W1", "A12", "F10", "A7"),
)
def q_golden_record_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-data "golden record" consolidation: one row per user
    holding the most recent attribute value from EACH source stream
    (here: latest props.k per event type, latest-wins with
    (ts, event_id) tiebreak), plus survivorship metadata (last seen,
    total events). The MDM merge shape: per-source latest-value
    dedup, then pivot the per-source survivors into one wide record.

    Plan: one window shuffle on (user_id, event_type) picks each
    source's survivor (WindowGroupLimit prunes rank>1 map-side), one
    conditional-agg pivot to wide, one count agg joined back — three
    shuffles total, all on the user key. JSON extraction runs only on
    the survivor rows' projection in the same stage (no separate
    pass)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
        )
    )
    gold = latest.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", F.col("k"))).alias("k_view"),
        F.max(F.when(F.col("event_type") == "click", F.col("k"))).alias("k_click"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("k"))).alias("k_purchase"),
        F.max(F.when(F.col("event_type") == "signup", F.col("k"))).alias("k_signup"),
        F.max("ts_s").alias("last_seen_s"),
    )
    tot = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return gold.join(tot, "user_id").select(
        "user_id", "k_view", "k_click", "k_purchase", "k_signup", "last_seen_s", "n_events"
    )


# --------------------------------------------------------------------------
# E129: point-in-time dimension lookup — facts joined to SCD2 validity
# --------------------------------------------------------------------------


@query(
    "q_point_in_time_k_at_purchase",
    oracle="""
    WITH changes AS (
      SELECT user_id, k, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM (
        SELECT user_id, event_id, ts,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               LAG(CAST(json_extract(props, '$.k') AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_k
        FROM events)
      WHERE prev_k IS NULL OR prev_k <> k),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
    SELECT purchase_id, p.user_id,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
           c.k AS k_at_purchase
    FROM purchases p JOIN changes c
      ON p.user_id = c.user_id
     AND c.valid_from <= p.ts
     AND (c.valid_to IS NULL OR p.ts < c.valid_to)
    """,
    tags=("E129", "E13", "J8", "W3", "F10"),
)
def q_point_in_time_k_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (bitemporal) dimension lookup: every purchase
    joined to the SCD2 validity interval of the user's props.k that
    was in force AT purchase time — the "dimension as the fact saw
    it" read that backs reproducible feature generation (no leakage
    from future attribute values).

    Plan: SCD2 history via operators/cdc.scd2_history (one window
    shuffle on user_id, consecutive duplicates collapsed), then an
    interval join carrying the user_id equi key with the range as a
    join residual — sort-merge on the user key, never a nested loop.
    The purchase always lands in exactly one interval (valid_from <=
    ts < valid_to), so the join neither drops nor duplicates facts.
    At 100 TB the union-scan rewrite (E119's IGNORE-NULLS frame
    carry) computes the same lookup in ONE window pass when the
    history derives from the same stream as the facts."""
    e = load_table(spark, sf_dir, "events")
    withk = e.select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    hist = scd2_history(withk, ["user_id"], "ts", "k", "event_id").select(
        F.col("user_id").alias("h_user_id"), "k", "valid_from", "valid_to"
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return (
        p.join(
            hist,
            (F.col("user_id") == F.col("h_user_id"))
            & (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("ts").cast("bigint").alias("purchase_ts_s"),
            F.col("k").alias("k_at_purchase"),
        )
    )
