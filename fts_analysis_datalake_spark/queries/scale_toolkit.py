"""Scale-technique declared queries (SURVEY.md §2.12 E16-E18):
salted skew join, mergeable HLL sketch rollup, stratified sampling.

These are the remaining 100 TB techniques that existed only as
library code (operators/scale.py) or not at all: the salted JOIN
(q_salted_hot_key_counts covers salted aggregation), the explicit
sketch-merge rollup (approx_count_distinct covers the one-shot
estimate but not merging pre-built sketches), and keyed downsampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.caching import tracked_persist
from fts_analysis_datalake_spark.catalog import broadcast_dim, ensure_parallelism, load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum, sql_dsum
from fts_analysis_datalake_spark.operators.scale import (
    bloom_build,
    bloom_prefilter,
    salted_equi_join,
    son_candidates,
)
from fts_analysis_datalake_spark.operators.text import (
    normalize_text,
    sql_tokens,
    tokens,
)
from fts_analysis_datalake_spark.queries.sketches_search import _h52, _sql_h52
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
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
    ORDER BY event_type
    """,
    tags=("E17", "A4", "U1"),
)
def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event_type AND overall from ONE
    scan: per-group HLL sketches (hll_sketch_agg) are estimated for
    the group rows and MERGED (hll_union_agg) for the 'ALL' row —
    the 100 TB pattern where per-partition/per-day sketches roll up
    without rescanning history. Envelope-oracle form since r6 (the
    Datasketches binary itself is engine-specific): each row carries
    the exact distinct count plus a flag asserting the sketch landed
    within 5% (lgK=14 => rsd ~0.8%, so the bound is ~6 sigma); the
    oracle recomputes the exact counts and expects every flag TRUE —
    a broken sketch or merge flips the hash. The MERGED 'ALL'
    estimate being checked matters: union-merge bugs wouldn't show
    in per-group rows."""
    e = load_table(spark, sf_dir, "events")
    sketches = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_group = sketches.select(
        "event_type",
        "exact_users",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    merged = (
        e.agg(
            F.hll_sketch_agg("user_id", 14).alias("sk"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        # build the ALL sketch by UNION-MERGING the per-group sketches
        # (the mergeable-rollup demonstration), not by re-aggregating
        .drop("sk")
        .crossJoin(
            F.broadcast(
                sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
                    F.hll_sketch_estimate("sk").alias("approx_users")
                )
            )
        )
        .select(
            F.lit("ALL").alias("event_type"), "exact_users", "approx_users"
        )
    )
    return (
        per_group.unionByName(merged)
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.col("exact_users") * 0.05
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


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

# --------------------------------------------------------------------------
# E36: Bloom-prefiltered semi-join — runtime-filter pattern, explicit
# --------------------------------------------------------------------------


@query(
    "q_bloom_semijoin_orders",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 2)} AS total_price
    FROM orders o
    WHERE o.o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5)
    GROUP BY o.o_orderpriority
    """,
    tags=("E36", "J3", "A1"),
)
def q_bloom_semijoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit Bloom runtime filter: the filtered
    customer keyset aggregates into a 256-byte bit array (one scan,
    bit_or partials, no collect), rides a broadcast onto the orders
    scan, and discards non-members BEFORE the join — at 100 TB the
    filter kills ~all non-qualifying fact rows at scan time, so the
    exact semi-join (which removes Bloom false positives and makes
    the result provably identical to the plain semi-join oracle)
    touches only survivors. This is Spark's own
    runtime-bloom-filter optimization made explicit and testable."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5))
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    o = load_table(spark, sf_dir, "orders")
    pref = bloom_prefilter(o, "o_custkey", bloom_build(c, "o_custkey"))
    exact = pref.join(broadcast_dim(c, "customer"), "o_custkey", "left_semi")
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total_price"),
    )


# --------------------------------------------------------------------------
# E37: SON two-phase EXACT frequent items — per-partition candidates
# --------------------------------------------------------------------------

_SON_SUPPORT = 0.004


@query(
    "q_son_frequent_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({sql_tokens('text')}) AS token FROM documents),
    tot AS (SELECT COUNT(*) AS total FROM tok)
    SELECT token, COUNT(*) AS n
    FROM tok, tot
    GROUP BY token, tot.total
    HAVING COUNT(*) >= {_SON_SUPPORT} * tot.total
    """,
    tags=("E37", "X2", "A1", "D9"),
)
def q_son_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-frequent tokens (support >= 0.4%) via the SON
    two-phase algorithm: phase 1 counts per PARTITION in a pandas
    iterator (mapInPandas) and emits local frequents — by pigeonhole
    over fractions, a superset of the global frequents — and phase 2
    recounts only that small candidate set. The raw token stream is
    never shuffled; the only exchanges carry candidates and partial
    counts. This is the 100 TB shape for heavy-hitter mining where a
    full groupBy over all tokens would shuffle the entire corpus.
    r11: the token stream feeds phase 1, the total count AND the
    phase-2 recount — persisted so tokenization runs once, not three
    times (same fix the CMS sibling already carries; guide §5
    cache-on-reuse). The candidate superset guarantee holds under any
    partitioning, so caching cannot change the final recounted set."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = tracked_persist(
        d.select(F.explode(tokens(normalize_text(F.col("text")))).alias("token"))
    )
    cands = son_candidates(tok, "token", _SON_SUPPORT)
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    return (
        tok.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") >= F.lit(_SON_SUPPORT) * F.col("total"))
        .select("token", "n")
    )


# --------------------------------------------------------------------------
# E48: count-min sketch — mergeable frequency estimates
# --------------------------------------------------------------------------

_CMS_PROBES = ("spark", "data", "table", "vector", "nosuchtoken")


def _cms_probe_report(tok, probe_cells, probes):
    """One conditional aggregate computing, for each probe, its
    depth-row sketch cells (cell count = tokens hashing there) and its
    exact count; report rows explode from the single wide row."""
    aggs = []
    for p_i, cells in enumerate(probe_cells):
        for d_i, cell in enumerate(cells):
            aggs.append(
                F.sum(F.when(cell[0] == cell[1], 1).otherwise(0))
                .cast("bigint")
                .alias(f"c{p_i}_{d_i}")
            )
        aggs.append(
            F.sum(F.when(F.col("token") == probes[p_i], 1).otherwise(0))
            .cast("bigint")
            .alias(f"e{p_i}")
        )
    wide = tok.agg(*aggs)
    structs = [
        F.struct(
            F.lit(p).alias("token"),
            F.col(f"e{p_i}").alias("exact_count"),
            F.least(
                *[F.col(f"c{p_i}_{d_i}") for d_i in range(len(probe_cells[p_i]))]
            ).alias("cms_count"),
        )
        for p_i, p in enumerate(probes)
    ]
    return (
        wide.select(F.explode(F.array(*structs)).alias("r"))
        .select(
            F.col("r.token").alias("token"),
            F.col("r.exact_count").alias("exact_count"),
            F.col("r.cms_count").alias("cms_count"),
            (F.col("r.cms_count") - F.col("r.exact_count")).alias("overcount"),
        )
        .orderBy("token")
    )



@query(
    "q_cms_token_counts",
    oracle=None,  # engine-hash sketch; overestimate bound tested (test_approx)
    tags=("E48", "E17", "A4"),
)
def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for a probe token set,
    next to the exact counts: the sketch is ~4k cells regardless of
    corpus size and merges cell-wise across batches — the 100 TB
    path to 'how often does token X appear' without re-scanning or
    holding a full vocabulary aggregate. CMS can only OVERcount;
    the delta column makes the bias visible (bounded in
    tests/test_approx.py)."""
    # r12 (guide §2.4 "don't compute things you throw away"): the probe
    # report reads exactly |probes| x depth cells of the sketch, and a
    # cell's count is just the number of stream tokens hashing to it —
    # so ONE conditional aggregate over one un-persisted token pass
    # computes those cells (identical counts to the full cms_build
    # table) plus the exact probe counts, and the report explodes from
    # the single wide row. Probe bucket ids are literal-arg xxhash64,
    # constant-folded by Catalyst. Replaces {corpus-string persist,
    # sketch groupBy shuffle, probe fan joins, semi-join + recount}.
    # cms_build/cms_estimate stay the operator-library surface (the
    # mergeable-sketch path a many-probe consumer uses). A/B x0.56,
    # outputs row-identical.
    from fts_analysis_datalake_spark.operators.scale import _CMS_DEPTH, _CMS_WIDTH

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        F.explode(tokens(normalize_text(F.col("text")))).alias("token")
    )
    probe_cells = [
        [
            (
                F.pmod(F.xxhash64(F.col("token"), F.lit(dd)), F.lit(_CMS_WIDTH)),
                F.pmod(F.xxhash64(F.lit(p), F.lit(dd)), F.lit(_CMS_WIDTH)),
            )
            for dd in range(_CMS_DEPTH)
        ]
        for p in _CMS_PROBES
    ]
    return _cms_probe_report(tok, probe_cells, list(_CMS_PROBES))


_CMS_MD5_W = 256  # buckets per depth row of the md5 twin


@query(
    "q_cms_token_counts_md5",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT unnest({sql_tokens('text')}) AS token FROM documents),
    sketch AS MATERIALIZED (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT 0 AS j, {_sql_h52('tc0', 'token')} % {_CMS_MD5_W} AS bucket
        FROM tok
        UNION ALL
        SELECT 1 AS j, {_sql_h52('tc1', 'token')} % {_CMS_MD5_W} AS bucket
        FROM tok)
      GROUP BY j, bucket),
    probes(token) AS (
      VALUES ('spark'), ('data'), ('table'), ('vector'), ('nosuchtoken')),
    est AS (
      SELECT p.token,
             LEAST(COALESCE(s0.n, 0), COALESCE(s1.n, 0)) AS cms_count
      FROM probes p
      LEFT JOIN sketch s0 ON s0.j = 0
        AND s0.bucket = {_sql_h52('tc0', 'p.token')} % {_CMS_MD5_W}
      LEFT JOIN sketch s1 ON s1.j = 1
        AND s1.bucket = {_sql_h52('tc1', 'p.token')} % {_CMS_MD5_W}),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM tok GROUP BY token)
    SELECT p.token,
           COALESCE(e.exact_count, 0) AS exact_count,
           p.cms_count,
           p.cms_count - COALESCE(e.exact_count, 0) AS overcount
    FROM est p LEFT JOIN exact e ON e.token = p.token
    ORDER BY p.token
    """,
    tags=("E48", "E175", "A4", "A1"),
)
def q_cms_token_counts_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable E48 twin (r6): the same probe-token
    count-min report as q_cms_token_counts, but the d=2 x w=256
    sketch uses the repo's md5-derived 52-bit hash (E175 discipline)
    instead of seeded xxhash64, so the DuckDB oracle rebuilds the
    IDENTICAL sketch and the estimates — not just the exact counts —
    are value-verified. The xxhash64 form stays the production path
    (JVM hashing, arbitrary depth). Scale shape (r12): one token scan,
    one conditional aggregate computing exactly the probe cells of the
    sketch (identical counts) plus the exact recounts, report exploded
    from the single wide row."""
    # r12: same probe-cell conditional-aggregate fuse as
    # q_cms_token_counts (see there); md5-derived 52-bit hashes, two
    # depth rows. A/B x0.58, outputs row-identical; oracle text
    # unchanged (it spells the full-sketch build, values identical).
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        F.explode(tokens(normalize_text(F.col("text")))).alias("token")
    )
    probe_cells = [
        [
            (
                _h52(f"tc{j}", F.col("token")) % _CMS_MD5_W,
                _h52(f"tc{j}", F.lit(p)) % _CMS_MD5_W,
            )
            for j in range(2)
        ]
        for p in _CMS_PROBES
    ]
    return _cms_probe_report(tok, probe_cells, list(_CMS_PROBES))


# --------------------------------------------------------------------------
# E52: consistent hash sampling — deterministic per-group top-k by digest
# --------------------------------------------------------------------------


@query(
    "q_consistent_hash_sample",
    oracle="""
    WITH h AS (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)) AS hkey
      FROM lineitem)
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY hkey, l_orderkey, l_linenumber)
               AS rn
      FROM h)
    WHERE rn <= 5
    """,
    tags=("E52", "O4", "W1", "F11"),
)
def q_consistent_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' sampling: per group, the 5 rows with
    the smallest md5 of their natural key. Unlike seeded Bernoulli
    (engine-RNG-specific, rows-only E18), the digest order is
    ENGINE-INDEPENDENT — the same rows are chosen by Spark, DuckDB,
    or any other system, which is what makes samples reproducible
    across reruns, engines, and growing data (a row keeps or loses
    membership only on k-threshold moves, never on scan order).
    Rank-pushdown (WindowGroupLimit) keeps the per-group top-k from
    materializing the full ranked set."""
    li = load_table(spark, sf_dir, "lineitem")
    hkey = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "hkey", "l_orderkey", "l_linenumber"
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", hkey.alias("hkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# E78: bitmap-index set intersection — popcount joins, not row joins
# --------------------------------------------------------------------------


@query(
    "q_bitmap_audience_overlap",
    oracle="""
    WITH m AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM m a JOIN m b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    tags=("E78", "U3", "F11", "A3"),
)
def q_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via BITMAP INDEXES: each event type's
    user set becomes 64-bit words keyed by user_id>>6 (bit_or
    aggregate), and every pairwise intersection is a word-aligned
    popcount join — 64 membership tests per row operation, the
    roaring-bitmap idea in pure Catalyst. The oracle computes the
    same matrix with a row-level self-join; results match exactly,
    which proves the bitmap encoding. At 100 TB the bitmap table is
    |types| x |users|/64 words regardless of event volume, and
    overlap queries never touch the fact table again — the
    segment-overlap workhorse of audience/ads systems."""
    e = load_table(spark, sf_dir, "events")
    m = e.select("event_type", "user_id").distinct()
    bits = m.select(
        "event_type",
        (F.col("user_id") / 64).cast("long").alias("slot"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("user_id") % 64).cast("int")
        ).alias("bit"),
    )
    slots = bits.groupBy("event_type", "slot").agg(F.bit_or("bit").alias("bm"))
    a = slots.withColumnsRenamed({"event_type": "type_a", "bm": "bm_a"})
    b = slots.withColumnsRenamed({"event_type": "type_b", "bm": "bm_b"})
    return (
        a.join(b, "slot")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b")))).alias(
                "n_both"
            )
        )
    )


# --------------------------------------------------------------------------
# E81: sketch-based join-size estimation — CMS inner product
# --------------------------------------------------------------------------


_JSE_W = 1024  # buckets per hash row
_JSE_D = 2  # hash rows


@query(
    "q_join_size_estimate",
    oracle=f"""
    WITH a AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS n1 FROM (
        SELECT 0 AS d, {_sql_h52('jse0', 'o_custkey')} % {_JSE_W} AS bucket
        FROM orders
        UNION ALL
        SELECT 1 AS d, {_sql_h52('jse1', 'o_custkey')} % {_JSE_W} AS bucket
        FROM orders)
      GROUP BY d, bucket),
    b AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS n2 FROM (
        SELECT 0 AS d, {_sql_h52('jse0', 'c_custkey')} % {_JSE_W} AS bucket
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT 1 AS d, {_sql_h52('jse1', 'c_custkey')} % {_JSE_W} AS bucket
        FROM customer WHERE c_mktsegment = 'BUILDING')
      GROUP BY d, bucket),
    dots AS (
      SELECT a.d, CAST(SUM(a.n1 * b.n2) AS BIGINT) AS dot
      FROM a JOIN b ON a.d = b.d AND a.bucket = b.bucket
      GROUP BY a.d),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS cms_estimate FROM dots),
    truth AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS true_join_rows
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING')
    SELECT t.true_join_rows, e.cms_estimate,
           CAST(e.cms_estimate AS DOUBLE)
             / CAST(GREATEST(t.true_join_rows, 1) AS DOUBLE) AS inflation
    FROM truth t, est e
    """,
    tags=("E81", "E48", "J1"),
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality estimation WITHOUT running the join: the
    inner product of two count-min sketches (per depth row, min over
    depths) upper-bounds |A JOIN B on key| — the sketch-side version
    of what a cost-based optimizer wants before picking join
    strategy/order at 100 TB. Both sketches are ~2k cells built in
    one scan each; the estimate is a 2k-row join + sum, and the true
    size (computed here for the report) is provably <= the estimate
    (collisions only inflate; bound asserted in tests/test_approx.py).
    Rows-only until round 5: bucket ids now come from the repo's
    md5-derived 52-bit hash (E175 discipline), bit-identical in both
    engines, so the ESTIMATE itself is driver hash-checked — the
    operator-library sibling (operators/scale.cms_build) keeps the
    cheaper JVM xxhash64 for production use."""

    def h(prefix: str, col) -> F.Column:
        return _h52(prefix, col) % _JSE_W

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k")
    )
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").cast("string").alias("k"))

    def sketch(df: DataFrame, out: str) -> DataFrame:
        cells = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            h(f"jse{d}", F.col("k")).alias("bucket"),
                        )
                        for d in range(_JSE_D)
                    ]
                )
            ).alias("c")
        ).select("c.d", "c.bucket")
        return cells.groupBy("d", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias(out)
        )

    per_depth = (
        sketch(o, "n1")
        .join(sketch(c, "n2"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("n1") * F.col("n2")).cast("bigint").alias("dot"))
    )
    est = per_depth.agg(F.min("dot").cast("bigint").alias("cms_estimate"))
    true_n = o.join(c, "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_join_rows")
    )
    return true_n.crossJoin(F.broadcast(est)).select(
        "true_join_rows",
        "cms_estimate",
        (
            F.col("cms_estimate").cast("double")
            / F.greatest("true_join_rows", F.lit(1)).cast("double")
        ).alias("inflation"),
    )


# --------------------------------------------------------------------------
# E89: bucketed co-located join — the shuffle paid once, at write time
# --------------------------------------------------------------------------


@query(
    "q_bucketed_join_revenue",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice', 2)} AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("E89", "S4", "J1", "A1"),
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketing payoff as a declared query: both join sides were
    written ONCE bucketed by the join key (8 buckets, sorted), so
    this join reads co-located buckets and plans with no Exchange on
    either side — at 100 TB that is the entire shuffle of the two
    biggest tables paid once at ingest instead of on every join
    (tests/test_scale.py asserts the exchange-free plan; this query
    proves the ANSWER matches the plain-join oracle). Writes are
    per-process cached via the session catalog."""
    import os

    from fts_analysis_datalake_spark.operators.scale import (
        bucketed_join,
        write_bucketed,
    )
    from fts_analysis_datalake_spark.queries.streaming_sources import CACHE_DIR

    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    t_li, t_o = f"q_bkt_li_{sf_tag}", f"q_bkt_o_{sf_tag}"
    write_bucketed(li, t_li, "l_orderkey", 8, f"{CACHE_DIR}/bkt_li_{sf_tag}")
    write_bucketed(o, t_o, "l_orderkey", 8, f"{CACHE_DIR}/bkt_o_{sf_tag}")
    joined = bucketed_join(spark, t_li, t_o, "l_orderkey")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice"), 2).alias("total_price"),
    )


# --------------------------------------------------------------------------
# E99: key-skew report — the numbers that justify salting
# --------------------------------------------------------------------------


@query(
    "q_key_skew_report",
    oracle="""
    WITH k AS (
      SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           CAST(MAX(n) AS DOUBLE) / SUM(n) AS top1_share,
           quantile_cont(n, 0.50) AS p50_rows,
           quantile_cont(n, 0.99) AS p99_rows,
           quantile_cont(n, 0.99) / quantile_cont(n, 0.50) AS p99_p50_ratio
    FROM k
    """,
    tags=("E99", "E16", "A5"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew diagnostic that decides whether a join/agg key needs
    salting (E16), AQE skew handling, or nothing: per-key row counts
    summarized as top-1 share and the p99/p50 ratio. A ratio near 1
    means uniform keys (salting would only add overhead); a top-1
    share near a task's worth of data predicts a straggler. One
    count aggregate + one tiny percentile pass over per-key counts
    (integral -> bit-equal interpolation)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    return k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        (F.max("n").cast("double") / F.sum("n")).alias("top1_share"),
        F.percentile("n", F.lit(0.50)).alias("p50_rows"),
        F.percentile("n", F.lit(0.99)).alias("p99_rows"),
        (F.percentile("n", F.lit(0.99)) / F.percentile("n", F.lit(0.50))).alias(
            "p99_p50_ratio"
        ),
    )


# --------------------------------------------------------------------------
# E145: weighted sampling without replacement — Efraimidis-Spirakis
# --------------------------------------------------------------------------

_WS_K = 50


@query(
    "q_weighted_doc_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                      AS UBIGINT) + 0.5) / 4503599627370496.0) / n_chars AS es_key
      FROM documents)
    SELECT doc_id, n_chars,
           CAST(FLOOR(es_key * 1000000000000 + 0.5) AS BIGINT) / 1000000000000.0
             AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 50
    """,
    tags=("E145", "O4", "O3", "F11", "F6"),
)
def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis):
    each doc draws u from a DETERMINISTIC md5-derived uniform (first
    13 hex chars = 52 bits, exact in a double) and the top-50 by
    key = ln(u)^(1/w) order — here the log form ln(u)/w with
    w = n_chars, so longer documents are proportionally likelier, and
    the whole draw is reproducible across engines, runs, and cluster
    sizes (no RNG state — the seed IS the key column).

    This is the missing sibling of the uniform seeded sample (O4,
    engine RNG, rows-only) and the per-stratum rates (sampleBy): a
    distributed weighted reservoir that needs only a map-side key +
    TakeOrderedAndProject top-k — no shuffle of the corpus, mergeable
    across partitions by construction (top-k of top-ks). The emitted
    key is quantized to 1e-12 so the hash compare never sees ulp
    noise; selection order breaks ties by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(4503599627370496.0)
    key = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "n_chars",
            (F.floor(key * 1e12 + F.lit(0.5)).cast("bigint") / F.lit(1e12)).alias(
                "es_key"
            ),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_WS_K)
    )


# --------------------------------------------------------------------------
# E156: deterministic negative sampling — contrastive pairs at join scale
# --------------------------------------------------------------------------

_NEG_K = 2
_NEG_CUST_MOD = 100
# Fixed-size customer panel (same discipline as ml_eval._PANEL_CAP):
# the cap freezes the panel at its sf0.1 size (c_custkey ends at
# 14999 there, so it is bit-inert at every driver SF). Without it the
# panel grows ~n/100 while the part catalog also grows ~n, making the
# panel x catalog candidate fan-out quadratic (r8 probe slope 36.5);
# with it, candidates scale linearly with the catalog alone.
_NEG_CUST_CAP = 15_000


@query(
    "q_negative_item_samples",
    oracle=f"""
    WITH panel AS (
      SELECT c_custkey FROM customer
      WHERE c_custkey % 100 = 0 AND c_custkey < 15000),
    seen AS (
      SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 100 = 0
        AND o.o_custkey < 15000),
    cand AS (
      SELECT panel.c_custkey, p.p_partkey,
             md5(CAST(panel.c_custkey AS VARCHAR) || ':'
                 || CAST(p.p_partkey AS VARCHAR)) AS draw
      FROM panel, part p),
    unseen AS (
      SELECT cand.c_custkey, cand.p_partkey, draw
      FROM cand LEFT JOIN seen
        ON seen.c_custkey = cand.c_custkey AND seen.p_partkey = cand.p_partkey
      WHERE seen.c_custkey IS NULL),
    ranked AS (
      SELECT c_custkey, p_partkey, draw,
             row_number() OVER (PARTITION BY c_custkey ORDER BY draw, p_partkey)
               AS rn
      FROM unseen)
    SELECT c_custkey AS custkey, p_partkey AS neg_partkey,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 2
    """,
    tags=("E156", "J4", "O3", "F11", "W1"),
)
def q_negative_item_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender/contrastive
    training: for each customer in the panel, 2 parts they
    have NEVER ordered, drawn by md5 rank — reproducible across
    engines/runs (the draw IS the hash), and the anti-join against
    interaction history is what makes a negative a true negative
    instead of an unlabeled positive.

    Plan: the panel fans out against the part dimension (broadcast —
    parts is a dim table), the interaction set arrives via left-anti
    join on (customer, part), and the per-customer top-k is a window
    rank over the hash draw. At real scale the fan-out is panel x
    catalog, bounded by sampling the panel — the same shape negative
    sampling has inside every two-tower training pipeline."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # The panel arrives as ONE scan partition (it's a filtered dim), so
    # without an explicit spread the panel x catalog fan-out — and every
    # downstream md5 — runs in a single task. Repartitioning the tiny
    # panel by key costs a ~150-row shuffle and buys full parallelism on
    # the 3M-row candidate stage (measured 4.5 s -> ~1.5 s at sf0.1).
    panel = (
        c.filter(
            (F.col("c_custkey") % _NEG_CUST_MOD == 0)
            & (F.col("c_custkey") < _NEG_CUST_CAP)
        )
        .select("c_custkey")
        .repartition(32, "c_custkey")
    )
    seen = (
        o.filter(
            (F.col("o_custkey") % _NEG_CUST_MOD == 0)
            & (F.col("o_custkey") < _NEG_CUST_CAP)
        )
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    cand = panel.crossJoin(F.broadcast(p.select("p_partkey"))).select(
        "c_custkey",
        "p_partkey",
        F.md5(
            F.concat(
                F.col("c_custkey").cast("string"),
                F.lit(":"),
                F.col("p_partkey").cast("string"),
            )
        ).alias("draw"),
    )
    unseen = cand.join(seen, ["c_custkey", "p_partkey"], "left_anti")
    w = Window.partitionBy("c_custkey").orderBy("draw", "p_partkey")
    return (
        unseen.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _NEG_K)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("p_partkey").alias("neg_partkey"),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# E169: Neyman allocation — variance-optimal stratified sampling budget
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 5000


@query(
    "q_neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT l_returnflag AS stratum,
             CAST(COUNT(*) AS DOUBLE) AS nh,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0)))
                  AS DOUBLE) AS s1,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))
                      * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0)))
                  AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag),
    scored AS (
      SELECT stratum, nh,
             CAST(FLOOR(nh * SQRT((nh * s2 - s1 * s1) / (nh * (nh - 1)))
                        / 100.0 * 1000000 + 0.5) AS BIGINT) AS nh_sh
      FROM strata),
    tot AS (SELECT CAST(SUM(nh_sh) AS BIGINT) AS t FROM scored)
    SELECT stratum,
           CAST(nh AS BIGINT) AS stratum_n,
           CAST(nh_sh AS DOUBLE) / t AS weight,
           CAST(FLOOR(CAST(nh_sh AS DOUBLE) * 5000 / t) AS BIGINT)
             AS alloc_floor,
           LEAST(CAST(nh_sh AS DOUBLE) * 5000 / t / nh, 1.0)
             AS sample_rate
    FROM scored, tot
    """,
    tags=("E169", "E111", "A6", "A1", "O4"),
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation: distribute a 5000-row sampling
    budget across strata proportional to N_h x S_h (stratum size
    times stratum stddev) — the variance-OPTIMAL stratified design,
    vs. proportional allocation which over-samples homogeneous
    strata. Emits each stratum's weight, floor allocation (the
    largest-remainder top-up is E111's apportionment op), and the
    per-row sampling rate that realizes it.

    The stddev comes from the same-scale DECIMAL integer moments
    (the dstddev recipe), and each stratum's N_h x S_h score is
    1e-6-quantized to a BIGINT BEFORE the total (r6): the 3-term
    double total was summation-order-dependent and diverged by one
    ulp at sf0.001; an integer total is order-free, and every derived
    ratio divides the same integers on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    xi = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("decimal(19,0)")
    strata = li.groupBy(F.col("l_returnflag").alias("stratum")).agg(
        F.count(F.lit(1)).cast("double").alias("nh"),
        F.sum(xi).cast("double").alias("s1"),
        F.sum(xi * xi).cast("double").alias("s2"),
    )
    nh, s1, s2 = F.col("nh"), F.col("s1"), F.col("s2")
    scored = strata.select(
        "stratum",
        nh,
        F.floor(
            nh * F.sqrt((nh * s2 - s1 * s1) / (nh * (nh - 1))) / 100.0 * 1e6
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("nh_sh"),
    )
    tot = scored.agg(F.sum("nh_sh").cast("bigint").alias("t"))
    s = scored.crossJoin(F.broadcast(tot))
    share = F.col("nh_sh").cast("double") / F.col("t")
    return s.select(
        "stratum",
        F.col("nh").cast("bigint").alias("stratum_n"),
        share.alias("weight"),
        # multiply in DOUBLE: the integer product budget x nh_sh
        # overflows int64 at sf0.1 (Spark ANSI errors; DuckDB would
        # silently widen to HUGEINT and round at a different point)
        F.floor(
            F.col("nh_sh").cast("double") * _NEYMAN_BUDGET / F.col("t")
        )
        .cast("bigint")
        .alias("alloc_floor"),
        F.least(
            F.col("nh_sh").cast("double")
            * _NEYMAN_BUDGET
            / F.col("t")
            / F.col("nh"),
            F.lit(1.0),
        ).alias("sample_rate"),
    )


# --------------------------------------------------------------------------
# E194: range-partition boundary planner + balance audit
# --------------------------------------------------------------------------

_RP_BUCKETS = 16


@query(
    "q_range_partition_planner",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v, o_orderkey
      FROM orders),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM vals),
    bounds AS (
      SELECT b.range AS b_idx, r.v AS bound
      FROM range(1, {_RP_BUCKETS}) b
      JOIN ranked r ON r.rn = CAST(CEIL(b.range * r.n / {_RP_BUCKETS}.0) AS BIGINT)),
    assigned AS (
      SELECT vals.v,
             COALESCE((SELECT COUNT(*) FROM bounds WHERE bounds.bound < vals.v), 0)
               AS bucket
      FROM vals)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) / 100.0 AS min_v, MAX(v) / 100.0 AS max_v,
           CAST(FLOOR(COUNT(*) * {_RP_BUCKETS}.0 / ANY_VALUE(n2.n)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS balance_ratio
    FROM assigned, (SELECT COUNT(*) AS n FROM vals) n2
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("E194", "A5", "W1", "O1", "E7"),
)
def q_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary planning, surfaced as a query: the
    15 boundary values are exact order statistics at k/16 of the
    sort key (what repartitionByRange samples approximately), every
    row is assigned by counting boundaries below it, and the audit
    reports per-bucket counts and the balance ratio
    (bucket_n * buckets / total — 1.0 is perfect). Duplicate key
    runs straddling a boundary show up as ratio spikes, which is
    exactly the skew a range-shuffle planner needs to know about
    before a 100 TB global sort. The boundary table is 15 rows and
    rides a broadcast; assignment is one map-side pass."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
        "o_orderkey",
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = vals.select(
        "v",
        F.row_number().over(Window.orderBy("v", "o_orderkey")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    bounds = (
        spark.range(1, _RP_BUCKETS)
        .select(F.col("id").alias("b_idx"))
        .join(
            ranked,
            F.col("rn")
            == F.ceil(F.col("b_idx") * F.col("n") / float(_RP_BUCKETS)).cast(
                "bigint"
            ),
        )
        .select(F.col("v").alias("bound"))
    )
    assigned = (
        vals.crossJoin(F.broadcast(bounds))
        .groupBy("v", "o_orderkey")
        .agg(F.sum((F.col("bound") < F.col("v")).cast("long")).alias("bucket"))
    )
    total = vals.agg(F.count(F.lit(1)).alias("n"))
    return (
        assigned.crossJoin(F.broadcast(total))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.min("v") / 100.0).alias("min_v"),
            (F.max("v") / 100.0).alias("max_v"),
            (
                F.floor(
                    F.count(F.lit(1)) * float(_RP_BUCKETS) / F.max("n") * 1e6
                    + F.lit(0.5)
                ).cast("bigint")
                / 1e6
            ).alias("balance_ratio"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_rows",
            "min_v",
            "max_v",
            "balance_ratio",
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# E286: one-scan column-profile report — the data-profiling utility
# --------------------------------------------------------------------------


@query(
    "q_table_profile_report",
    oracle="""
    WITH profs AS (
      SELECT 'o_custkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_val
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(o_orderstatus) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
             CAST(MIN(o_orderstatus) AS VARCHAR),
             CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(o_totalprice) AS BIGINT),
             CAST(COUNT(DISTINCT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
             CAST(CAST(FLOOR(MIN(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR),
             CAST(CAST(FLOOR(MAX(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(o_orderdate) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
             strftime(MIN(o_orderdate), '%Y-%m-%d'),
             strftime(MAX(o_orderdate), '%Y-%m-%d')
      FROM orders)
    SELECT col, n_rows, n_nonnull, n_distinct, min_val, max_val,
           CAST(FLOOR(CAST(n_distinct AS DOUBLE) / n_rows * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS distinct_ratio
    FROM profs ORDER BY col
    """,
    tags=("E286", "A2", "A3", "F1", "U1"),
)
def q_table_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column-profile report (row count, null count,
    exact distinct, min/max, distinct ratio per column) — the
    data-profiling pass every onboarding/lake-hygiene workflow runs
    before trusting a table. All per-column aggregates compute in a
    SINGLE aggregation over one scan (Catalyst plans the mixed
    COUNT/MIN/MAX battery as one partial+final hash agg; the four
    count-distincts expand to one grouping-sets pass), then unpivot
    to the per-column report — the oracle spells the same numbers as
    four scans because DuckDB lacks the expand trick, values
    identical. Doubles are profiled in cents (quantized), timestamps
    as dates, everything surfaced as strings so one report schema
    fits every column type."""
    o = load_table(spark, sf_dir, "orders")
    price_c = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    wide = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # o_custkey
        F.count("o_custkey").cast("bigint").alias("ck_nn"),
        F.countDistinct("o_custkey").cast("bigint").alias("ck_nd"),
        F.min("o_custkey").cast("string").alias("ck_min"),
        F.max("o_custkey").cast("string").alias("ck_max"),
        # o_orderstatus
        F.count("o_orderstatus").cast("bigint").alias("st_nn"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("st_nd"),
        F.min("o_orderstatus").cast("string").alias("st_min"),
        F.max("o_orderstatus").cast("string").alias("st_max"),
        # o_totalprice (cents-quantized)
        F.count("o_totalprice").cast("bigint").alias("tp_nn"),
        F.countDistinct(price_c).cast("bigint").alias("tp_nd"),
        F.min(F.col("o_totalprice")).alias("tp_min_raw"),
        F.max(F.col("o_totalprice")).alias("tp_max_raw"),
        # o_orderdate
        F.count("o_orderdate").cast("bigint").alias("od_nn"),
        F.countDistinct("o_orderdate").cast("bigint").alias("od_nd"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("od_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("od_max"),
    ).select(
        "*",
        F.floor(F.col("tp_min_raw") * 100 + F.lit(0.5)).cast("bigint").cast("string").alias("tp_min"),
        F.floor(F.col("tp_max_raw") * 100 + F.lit(0.5)).cast("bigint").cast("string").alias("tp_max"),
    )
    rows = F.explode(
        F.array(
            F.struct(
                F.lit("o_custkey").alias("col"),
                F.col("ck_nn").alias("n_nonnull"),
                F.col("ck_nd").alias("n_distinct"),
                F.col("ck_min").alias("min_val"),
                F.col("ck_max").alias("max_val"),
            ),
            F.struct(
                F.lit("o_orderstatus").alias("col"),
                F.col("st_nn").alias("n_nonnull"),
                F.col("st_nd").alias("n_distinct"),
                F.col("st_min").alias("min_val"),
                F.col("st_max").alias("max_val"),
            ),
            F.struct(
                F.lit("o_totalprice").alias("col"),
                F.col("tp_nn").alias("n_nonnull"),
                F.col("tp_nd").alias("n_distinct"),
                F.col("tp_min").alias("min_val"),
                F.col("tp_max").alias("max_val"),
            ),
            F.struct(
                F.lit("o_orderdate").alias("col"),
                F.col("od_nn").alias("n_nonnull"),
                F.col("od_nd").alias("n_distinct"),
                F.col("od_min").alias("min_val"),
                F.col("od_max").alias("max_val"),
            ),
        )
    ).alias("p")
    return (
        wide.select(F.col("n_rows"), rows)
        .select(
            F.col("p.col").alias("col"),
            "n_rows",
            F.col("p.n_nonnull").alias("n_nonnull"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_val").alias("min_val"),
            F.col("p.max_val").alias("max_val"),
            (
                F.floor(
                    F.col("p.n_distinct").cast("double") / F.col("n_rows") * 1000000
                    + F.lit(0.5)
                ).cast("bigint")
                / 1000000.0
            ).alias("distinct_ratio"),
        )
        .orderBy("col")
    )
