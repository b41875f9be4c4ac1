"""Coverage-gap declared queries (round-2 additions): the SURVEY.md §2
rows that had no declared driver-visible form after round 1 —
O4 sample, an explicit O2 offset page, an explicit P9 try_cast,
S6 registry-SQL, and the T5/T6 streaming batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table, register_views
from fts_analysis_datalake_spark.operators.scale import salted_aggregate
from fts_analysis_datalake_spark.registry import query
from fts_analysis_datalake_spark.streaming.transforms import dedup_within_watermark

# --------------------------------------------------------------------------
# O4: seeded sample — rows-only (Spark's Bernoulli RNG differs from DuckDB's)
# --------------------------------------------------------------------------


@query(
    "q_sample_lineitem",
    oracle=None,  # sampling RNG is engine-specific; determinism within
    # Spark (fixed seed + scan partitioning) is covered by tests/test_approx.py
    tags=("O4",),
)
def q_sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 10% Bernoulli sample of lineitem — the dev-time
    downsampling path. sample() is a map-side filter with a
    partition-seeded RNG: no shuffle, pushdown-compatible, and the
    fraction bounds work independently of input scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


# --------------------------------------------------------------------------
# O2: limit + offset page under a total order
# --------------------------------------------------------------------------


@query(
    "q_orders_offset_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100 OFFSET 200
    """,
    tags=("O1", "O2"),
)
def q_orders_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of the order book: ORDER BY (total order on the unique
    key, so ties can't make the page nondeterministic) + OFFSET +
    LIMIT. Spark pushes the combination into one global-sort-limit of
    offset+limit rows — it never materializes the full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(200)
        .limit(100)
    )


# --------------------------------------------------------------------------
# P9: try_cast on genuinely mixed numeric / non-numeric strings
# --------------------------------------------------------------------------


@query(
    "q_try_cast_mixed",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(s AS INTEGER)) AS BIGINT) AS sum_numeric,
           CAST(SUM(CASE WHEN TRY_CAST(s AS INTEGER) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unparseable
    FROM (SELECT event_type,
                 CASE WHEN event_id % 3 = 0
                      THEN json_extract_string(props, '$.k')
                      ELSE event_type END AS s
          FROM events)
    GROUP BY event_type
    """,
    tags=("P9", "P8", "F10", "A7"),
)
def q_try_cast_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast over a column that is numeric for every third event and
    a bare word otherwise — the ingest-time 'dirty string column'
    pattern: parse failures become NULLs (counted), never errors."""
    e = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 3 == 0, F.get_json_object(F.col("props"), "$.k")
    ).otherwise(F.col("event_type"))
    parsed = s.try_cast("int")
    return (
        e.select("event_type", parsed.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_numeric"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_unparseable"),
        )
    )


# --------------------------------------------------------------------------
# S6: table registry — the same ANSI SQL text runs on spark.sql and DuckDB
# --------------------------------------------------------------------------

_REGISTRY_SQL = """
    SELECT n_name,
           COUNT(*) AS n_cust,
           CAST(CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
               / 100 AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@query(
    "q_registry_sql_summary",
    oracle=_REGISTRY_SQL,
    tags=("S6", "S1", "J1", "A1"),
)
def q_registry_sql_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 in its purest form: register every fixture table as a temp
    view, then run the IDENTICAL ANSI SQL text through spark.sql that
    the DuckDB oracle runs — name resolution via the registry, not
    DataFrame references."""
    register_views(spark, sf_dir)
    return spark.sql(_REGISTRY_SQL)


# --------------------------------------------------------------------------
# Skew mitigation: salted two-phase aggregation on a 5-value hot key
# --------------------------------------------------------------------------


@query(
    "q_salted_hot_key_counts",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("A1", "A15", "F11"),
)
def q_salted_hot_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a 5-distinct-value key — the skew shape where
    every partial row of a hot key funnels to one reducer at 100 TB.
    Runs the explicit salted two-phase form (partial on
    (key, xxhash64-salt), final on key); results are bit-identical to
    the plain groupBy, which is what the oracle computes."""
    e = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        e,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "total_scaled": F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))),
        },
        salts=16,
        salt_src=F.col("event_id"),
    )
    return out.select(
        "event_type", "n", (F.col("total_scaled") / 100.0).alias("total_value")
    )


# --------------------------------------------------------------------------
# S5: driver-literal (createDataFrame) source joined to a fact table
# --------------------------------------------------------------------------

_S5_WEIGHTS = [
    ("click", 1.0),
    ("view", 0.5),
    ("purchase", 10.0),
    ("signup", 5.0),
    ("error", -2.0),
]


@query(
    "q_inline_values_dim_join",
    oracle="""
    SELECT event_type, w.weight, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) * w.weight / 100.0
               AS weighted_value
    FROM events
    JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                 ('signup', 5.0), ('error', -2.0)) w(event_type, weight)
      USING (event_type)
    GROUP BY event_type, w.weight
    """,
    tags=("S5", "J1", "J5", "A1"),
)
def q_inline_values_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 declared explicitly: an in-memory dimension built with
    ``spark.createDataFrame`` (the driver-literal source every
    notebook/config join uses) broadcast-joined to events — the
    VALUES-clause twin on the oracle side. The weighted sum multiplies
    an exact integer-scaled sum by the weight ONCE per group, so both
    engines do the identical double ops. q_stream_static_weighted
    deliberately builds its dim JVM-side instead (faster first use);
    this query keeps the createDataFrame path itself declared and
    verified."""
    dim = spark.createDataFrame(_S5_WEIGHTS, "event_type string, weight double")
    e = load_table(spark, sf_dir, "events")
    return (
        e.join(F.broadcast(dim), "event_type")
        .groupBy("event_type", "weight")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("bigint")
                * F.col("weight")
                / 100.0
            ).alias("weighted_value"),
        )
        .select("event_type", "weight", "n", "weighted_value")
    )


# --------------------------------------------------------------------------
# T5 batch twin: duplicate-delivery collapse via the streaming transform
# --------------------------------------------------------------------------


@query(
    "q_dedup_within_watermark_batch",
    oracle="""
    SELECT event_id, user_id, ts, event_type FROM events
    """,
    tags=("T5", "D1", "U1"),
)
def q_dedup_within_watermark_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 declared in batch form: simulate at-least-once re-delivery by
    doubling the stream (union with itself), then collapse with the
    SAME dedup_within_watermark transform the streaming path uses
    (streaming: state-backed dropDuplicatesWithinWatermark; batch:
    dropDuplicates). Duplicate rows are byte-identical, so the
    survivor is deterministic and the oracle is simply the original
    stream."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    redelivered = e.unionByName(e)
    return dedup_within_watermark(redelivered, ["event_id"])


# --------------------------------------------------------------------------
# T6 batch twin: per-key running count (the W4 row-level form)
# --------------------------------------------------------------------------


@query(
    "q_running_count_batch",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    WHERE user_id % 20 = 0
    """,
    tags=("T6", "W4"),
)
def q_running_count_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 declared in batch form: the stateful per-key running count as
    its row-level batch twin — a cumulative count window ordered by
    (ts, event_id) so ties can't reorder. Streaming runs the same
    per-key counter as an update-mode stateful aggregation
    (streaming/transforms.py running_counts)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", "ts", F.count(F.lit(1)).over(w).alias("running_n")
    )
