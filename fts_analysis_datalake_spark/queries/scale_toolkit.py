"""Scale-technique declared queries (SURVEY.md §2.12 E16-E18):
salted skew join, mergeable HLL sketch rollup, stratified sampling.

These are the remaining 100 TB techniques that existed only as
library code (operators/scale.py) or not at all: the salted JOIN
(q_salted_hot_key_counts covers salted aggregation), the explicit
sketch-merge rollup (approx_count_distinct covers the one-shot
estimate but not merging pre-built sketches), and keyed downsampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum, sql_dsum
from fts_analysis_datalake_spark.operators.scale import salted_equi_join
from fts_analysis_datalake_spark.registry import query

# --------------------------------------------------------------------------
# E16: salted equi-join — oracle = the plain join (row-identical result)
# --------------------------------------------------------------------------


@query(
    "q_salted_supplier_revenue",
    oracle=f"""
    SELECT s.s_nationkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    tags=("E16", "J1", "A1"),
)
def q_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-dim join: the (large, potentially hot-keyed)
    lineitem side is salted into 8 deterministic sub-keys and supplier
    is replicated 8x, so no single reducer ever owns a hot supplier's
    whole row set. Result is row-identical to the plain join — the
    oracle IS the plain join. (At real scale the dim side would merit
    salting only when too big to broadcast; the rewrite is the point.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_equi_join(li, s, "suppkey", salts=8)
    return joined.groupBy("s_nationkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# E17: mergeable HLL sketch rollup — rows-only (engine-specific sketch);
# bounded error vs exact asserted in tests/test_approx.py
# --------------------------------------------------------------------------


@query(
    "q_hll_user_rollup",
    oracle=None,  # Datasketches HLL binary; bounded-error tested
    tags=("E17", "A4", "U1"),
)
def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event_type AND overall from ONE
    scan: per-group HLL sketches (hll_sketch_agg) are estimated for
    the group rows and MERGED (hll_union_agg) for the 'ALL' row —
    the 100 TB pattern where per-partition/per-day sketches roll up
    without rescanning history. approx_count_distinct gives one-shot
    estimates; this query demonstrates the mergeable-sketch form."""
    e = load_table(spark, sf_dir, "events")
    sketches = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    per_group = sketches.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"), F.hll_sketch_estimate("sk").alias("approx_users")
    )
    return per_group.unionByName(merged).orderBy("event_type")


# --------------------------------------------------------------------------
# E18: stratified sampling — rows-only (Bernoulli RNG is engine-specific);
# per-stratum rate bounds asserted in tests/test_approx.py
# --------------------------------------------------------------------------

_STRATA = {"A": 0.05, "N": 0.01, "R": 0.05}


@query(
    "q_stratified_sample_rates",
    oracle=None,  # seeded Bernoulli sampling; rate-bound tested
    tags=("E18", "O4", "A1"),
)
def q_stratified_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed downsampling with per-stratum rates (sampleBy): rare
    strata keep a higher fraction than dominant ones — the standard
    move for building eval/dev sets from a skewed 100 TB corpus
    without a shuffle (Bernoulli filter per row, no sort, no
    repartition). Output is per-stratum sampled counts + the rate
    actually achieved; seed pinned for reproducibility."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.sampleBy("l_returnflag", _STRATA, seed=42)
    totals = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sampled.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .join(F.broadcast(totals), "l_returnflag")
        .select(
            "l_returnflag",
            "n_sampled",
            "n_total",
            (F.col("n_sampled") / F.col("n_total")).alias("achieved_rate"),
        )
        .orderBy("l_returnflag")
    )
