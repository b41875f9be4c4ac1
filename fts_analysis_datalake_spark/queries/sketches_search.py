"""Sketches & search tranche (SURVEY.md §2.12 E175-E181).

Mergeable summary sketches (count-min, KMV), runtime-filter join
pruning (Bloom), order-sensitive analytics (exact rolling median,
CEP-style pattern spans), text retrieval (positional inverted-index
phrase search), and multi-objective dominance (2-D skyline).

Every sketch here is built from md5-derived hashes, so both engines
compute bit-identical summaries — the estimates themselves are
hash-checked against the DuckDB twin, not just the final exact
answers. That is the same determinism discipline as the weighted
sampler (scale_toolkit.py) and the bootstrap CI (ml_eval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import ensure_parallelism, load_table
from fts_analysis_datalake_spark.functions.deterministic import dsum
from fts_analysis_datalake_spark.operators.text import (
    ngrams,
    normalize_text,
    sql_ngrams,
    sql_tokens,
    tokens,
)
from fts_analysis_datalake_spark.registry import query


def _h52(prefix: str, col) -> F.Column:
    """52-bit integer hash of ``prefix:col`` — md5 first 13 hex chars,
    exact in BIGINT/double, identical in Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{prefix}:"), col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")


def _sql_h52(prefix: str, expr: str) -> str:
    return (
        f"CAST(('0x' || substring(md5('{prefix}:' || CAST({expr} AS VARCHAR)), 1, 13))"
        f" AS BIGINT)"
    )


# --------------------------------------------------------------------------
# E175: count-min sketch — heavy-hitter estimates vs exact truth
# --------------------------------------------------------------------------

_CMS_W = 128  # buckets per hash row
_CMS_D = 2  # hash rows
_CMS_TOPN = 10


@query(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH sketch AS (
      SELECT j, bucket, COUNT(*) AS bucket_n
      FROM (
        SELECT 0 AS j, {_sql_h52('cms0', 'user_id')} % {_CMS_W} AS bucket FROM events
        UNION ALL
        SELECT 1 AS j, {_sql_h52('cms1', 'user_id')} % {_CMS_W} AS bucket FROM events)
      GROUP BY j, bucket),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT {_CMS_TOPN}),
    probed AS (
      SELECT e.user_id, e.exact_n,
             LEAST(s0.bucket_n, s1.bucket_n) AS cms_est
      FROM exact e
      JOIN sketch s0 ON s0.j = 0
        AND s0.bucket = {_sql_h52('cms0', 'e.user_id')} % {_CMS_W}
      JOIN sketch s1 ON s1.j = 1
        AND s1.bucket = {_sql_h52('cms1', 'e.user_id')} % {_CMS_W})
    SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overestimate
    FROM probed ORDER BY exact_n DESC, user_id
    """,
    tags=("E175", "A14", "F11", "J5", "O3"),
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d=2 hash rows x w=128 counters built in ONE
    map-side explode + hash aggregate, then the top-10 exact keys
    probed against it. ``cms_est >= exact_n`` always (one-sided
    error); the sketch is the 100 TB shape — 256 counters summarize
    any cardinality, mergeable across partitions by construction
    (bucket sums are associative), and the probe is a broadcast join
    against 256 rows. The md5-derived bucket ids make the sketch
    bit-identical in both engines, so the ESTIMATES are hash-checked,
    not just the exact counts."""
    e = load_table(spark, sf_dir, "events")
    hashed = e.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("j"),
                    (_h52("cms0", F.col("user_id")) % _CMS_W).alias("bucket"),
                ),
                F.struct(
                    F.lit(1).alias("j"),
                    (_h52("cms1", F.col("user_id")) % _CMS_W).alias("bucket"),
                ),
            )
        ).alias("hb"),
    ).select("user_id", "hb.j", "hb.bucket")
    sketch = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(_CMS_TOPN)
    )
    probe = exact.select(
        "user_id",
        "exact_n",
        (_h52("cms0", F.col("user_id")) % _CMS_W).alias("b0"),
        (_h52("cms1", F.col("user_id")) % _CMS_W).alias("b1"),
    )
    s0 = sketch.filter(F.col("j") == 0).select(
        F.col("bucket").alias("b0"), F.col("bucket_n").alias("n0")
    )
    s1 = sketch.filter(F.col("j") == 1).select(
        F.col("bucket").alias("b1"), F.col("bucket_n").alias("n1")
    )
    return (
        probe.join(F.broadcast(s0), "b0")
        .join(F.broadcast(s1), "b1")
        .select(
            "user_id",
            "exact_n",
            F.least("n0", "n1").alias("cms_est"),
            (F.least("n0", "n1") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
    )


# --------------------------------------------------------------------------
# E176: KMV (k-minimum-values) distinct sketch — mergeable NDV estimate
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_POW52 = 4503599627370496.0  # 2^52


@query(
    "q_kmv_distinct_custkeys",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority,
             ({_sql_h52('kmv', 'o_custkey')} + 0.5) / {_KMV_POW52} AS h
      FROM orders),
    ranked AS (
      SELECT o_orderpriority, h,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS r
      FROM hashed),
    est AS (
      SELECT o_orderpriority,
             CAST(FLOOR(({_KMV_K} - 1) / h * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS kmv_est
      FROM ranked WHERE r = {_KMV_K}),
    exact AS (
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_ndv
      FROM orders GROUP BY o_orderpriority)
    SELECT e.o_orderpriority, e.exact_ndv, s.kmv_est,
           CAST(FLOOR(ABS(s.kmv_est - e.exact_ndv) / e.exact_ndv * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS rel_err
    FROM exact e JOIN est s USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
    tags=("E176", "A4", "A10", "W1", "F11"),
)
def q_kmv_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch: per order priority, keep the k=64
    smallest md5-uniform hashes of o_custkey; NDV-hat = (k-1)/h_(k).
    Unlike HLL (whose Spark and DuckDB register layouts differ), KMV
    from a shared hash is BIT-IDENTICAL across engines, so the
    estimate itself is oracle-checked — this is the deterministic
    sibling of A4's envelope-checked approx_count_distinct. The
    sketch is mergeable (k smallest of a union = k smallest of the
    per-partition k-smallest), i.e. a 64-row summary per group at
    any scale; Spark computes it as a distinct + per-group top-k,
    which compiles to WindowGroupLimit pushed below the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    hashed = o.select(
        "o_orderpriority",
        ((_h52("kmv", F.col("o_custkey")) + 0.5) / F.lit(_KMV_POW52)).alias("h"),
    ).distinct()
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    est = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == _KMV_K)
        .select(
            "o_orderpriority",
            (
                F.floor((_KMV_K - 1) / F.col("h") * 1e6 + F.lit(0.5)).cast("bigint")
                / 1e6
            ).alias("kmv_est"),
        )
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_ndv")
    )
    return (
        exact.join(est, "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_ndv",
            "kmv_est",
            (
                F.floor(
                    F.abs(F.col("kmv_est") - F.col("exact_ndv"))
                    / F.col("exact_ndv")
                    * 1e6
                    + F.lit(0.5)
                ).cast("bigint")
                / 1e6
            ).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# E177: exact rolling median over an event window
# --------------------------------------------------------------------------

_MED_FRAME = 7  # current row + 6 preceding


@query(
    "q_rolling_median_user_value",
    oracle="""
    SELECT event_id, user_id,
           median(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 AS med7
    FROM events
    """,
    tags=("E177", "W5", "W6", "A5", "F7"),
)
def q_rolling_median_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median of the last 7 events per user — the
    robust-center sibling of the moving average (W5). Spark has no
    exact median window function, so the frame is materialized with
    collect_list over a ROWS frame, sorted, and middle-picked (even
    frames average the two middles, matching DuckDB's interpolating
    median). Values are integer-quantized BEFORE the median so the
    even-frame average is exact in both engines. The frame is a
    bounded 7 elements regardless of data scale — memory per row is
    constant, and the sort is over 7 ints, not the partition."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_FRAME - 1), 0)
    )
    vals = F.sort_array(
        F.collect_list(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).over(
            w
        )
    )
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        (((lo + hi) / 2.0) / 100.0).alias("med7"),
    )


# --------------------------------------------------------------------------
# E178: CEP-style pattern spans — view+ immediately followed by purchase
# --------------------------------------------------------------------------


@query(
    "q_view_purchase_pattern_spans",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN event_type IS DISTINCT FROM
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS boundary
      FROM events),
    runs AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered),
    run_summary AS (
      SELECT user_id, run_id, MIN(event_type) AS run_type,
             COUNT(*) AS run_len
      FROM runs GROUP BY user_id, run_id),
    with_next AS (
      SELECT user_id, run_type, run_len,
             LEAD(run_type) OVER (PARTITION BY user_id ORDER BY run_id)
               AS next_type
      FROM run_summary)
    SELECT user_id,
           COUNT(*) AS n_matches,
           CAST(MAX(run_len) AS BIGINT) AS max_view_run,
           CAST(SUM(run_len) AS BIGINT) AS total_views_in_matches
    FROM with_next
    WHERE run_type = 'view' AND next_type = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("E178", "W3", "W4", "W8", "A1"),
)
def q_view_purchase_pattern_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern ``view+ purchase`` per
    user stream, via gaps-and-islands: lag marks run boundaries, a
    running sum assigns run ids, runs collapse to one row each, and
    lead exposes the following run's type — a 'view' run whose next
    run is 'purchase' is a match. This is the Flink-CEP / ANSI
    MATCH_RECOGNIZE shape expressed entirely in windows + one
    aggregate: no per-row state machine, no Python, and every stage
    partitions by user_id so the pattern work never shuffles twice."""
    e = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = F.when(
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w_seq)), 1
    ).otherwise(0)
    runs = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(boundary).over(w_seq.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "run_id"
        ),
    )
    run_summary = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("run_type"), F.count(F.lit(1)).alias("run_len")
    )
    w_run = Window.partitionBy("user_id").orderBy("run_id")
    with_next = run_summary.select(
        "user_id",
        "run_type",
        "run_len",
        F.lead("run_type").over(w_run).alias("next_type"),
    )
    return (
        with_next.filter(
            (F.col("run_type") == "view") & (F.col("next_type") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max("run_len").cast("bigint").alias("max_view_run"),
            F.sum("run_len").cast("bigint").alias("total_views_in_matches"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E179: Bloom-filter semi-join pruning — the runtime-filter pattern
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_NATION_CAP = 5  # build side: suppliers with s_nationkey < 5


@query(
    "q_bloom_semi_join_prune",
    oracle=f"""
    WITH build AS (
      SELECT s_suppkey FROM supplier WHERE s_nationkey < {_BLOOM_NATION_CAP}),
    bits AS (
      SELECT DISTINCT b FROM (
        SELECT {_sql_h52('bf0', 's_suppkey')} % {_BLOOM_M} AS b FROM build
        UNION ALL SELECT {_sql_h52('bf1', 's_suppkey')} % {_BLOOM_M} FROM build
        UNION ALL SELECT {_sql_h52('bf2', 's_suppkey')} % {_BLOOM_M} FROM build)),
    probe AS (
      SELECT l_suppkey, l_extendedprice,
             ({_sql_h52('bf0', 'l_suppkey')} % {_BLOOM_M}) IN (SELECT b FROM bits)
             AND ({_sql_h52('bf1', 'l_suppkey')} % {_BLOOM_M}) IN (SELECT b FROM bits)
             AND ({_sql_h52('bf2', 'l_suppkey')} % {_BLOOM_M}) IN (SELECT b FROM bits)
               AS bloom_pass,
             l_suppkey IN (SELECT s_suppkey FROM build) AS exact_pass
      FROM lineitem)
    SELECT (SELECT COUNT(*) FROM build) AS n_build_keys,
           CAST(COUNT(*) FILTER (WHERE bloom_pass) AS BIGINT) AS n_candidates,
           CAST(COUNT(*) FILTER (WHERE exact_pass) AS BIGINT) AS n_exact,
           CAST(COUNT(*) FILTER (WHERE bloom_pass AND NOT exact_pass) AS BIGINT)
             AS n_false_pos,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
             FILTER (WHERE exact_pass) / 100.0 AS exact_revenue
    FROM probe
    """,
    tags=("E179", "J3", "J5", "F11", "A2"),
)
def q_bloom_semi_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning: a 4096-bit Bloom filter (k=3
    md5-derived positions) built from the small build side (suppliers
    in 5 nations) prunes the lineitem probe BEFORE the exact semi
    join — the manual form of Spark's InjectRuntimeFilter /
    dynamic partition pruning, made engine-portable. The bit set is
    a broadcast of <=4096 ints no matter how large the build side
    grows (vs broadcasting the key set itself), and the report
    quantifies the price: candidates vs exact vs false positives,
    all hash-checked because both engines build the identical
    filter."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    build = s.filter(F.col("s_nationkey") < _BLOOM_NATION_CAP).select("s_suppkey")
    bits = (
        build.select(
            F.explode(
                F.array(
                    *[
                        (_h52(f"bf{i}", F.col("s_suppkey")) % _BLOOM_M).alias("b")
                        for i in range(3)
                    ]
                )
            ).alias("b")
        )
        .distinct()
    )
    # r11 (guide §2.4): the filter is an ACTUAL bit array now — one
    # 1-row aggregate builds a {_BLOOM_M}-bool mask, broadcast once,
    # and the three membership probes are O(1) element_at lookups
    # map-side. Before, each of the 3 hash positions was checked with
    # its own broadcast hash join — three extra join operators per
    # probe row for what a Bloom filter does with an array index.
    # Same bits, same passes (A/B --verify identical; x0.73).
    mask = bits.agg(F.collect_set("b").alias("bs")).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_M - 1)),
            lambda i: F.array_contains(F.col("bs"), i),
        ).alias("mask")
    )
    probe = li.select(
        "l_suppkey",
        "l_extendedprice",
        *[(_h52(f"bf{i}", F.col("l_suppkey")) % _BLOOM_M).alias(f"p{i}") for i in range(3)],
    ).crossJoin(F.broadcast(mask))
    probe = probe.join(
        F.broadcast(
            build.select(F.col("s_suppkey").alias("l_suppkey"), F.lit(1).alias("mx"))
        ),
        "l_suppkey",
        "left",
    )
    bloom_pass = (
        F.element_at(F.col("mask"), F.col("p0").cast("int") + 1)
        & F.element_at(F.col("mask"), F.col("p1").cast("int") + 1)
        & F.element_at(F.col("mask"), F.col("p2").cast("int") + 1)
    )
    exact_pass = F.col("mx").isNotNull()
    n_build = build.count()
    return probe.agg(
        F.sum(bloom_pass.cast("long")).alias("n_candidates"),
        F.sum(exact_pass.cast("long")).alias("n_exact"),
        F.sum((bloom_pass & ~exact_pass).cast("long")).alias("n_false_pos"),
        dsum(F.when(exact_pass, F.col("l_extendedprice"))).alias("exact_revenue"),
    ).select(
        F.lit(n_build).cast("bigint").alias("n_build_keys"),
        "n_candidates",
        "n_exact",
        "n_false_pos",
        "exact_revenue",
    )


# --------------------------------------------------------------------------
# E180: positional inverted index + phrase search
# --------------------------------------------------------------------------

_SQL_TOKS = sql_tokens("text")


@query(
    "q_phrase_match_inverted_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    top_bigram AS (
      SELECT g AS phrase FROM toks, unnest({sql_ngrams('toks', 2)}) AS u(g)
      GROUP BY g ORDER BY COUNT(*) DESC, g LIMIT 1),
    posting AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS term
      FROM toks),
    occurrences AS (
      SELECT p1.doc_id
      FROM posting p1
      JOIN posting p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      JOIN top_bigram b
        ON p1.term = str_split(b.phrase, ' ')[1]
       AND p2.term = str_split(b.phrase, ' ')[2])
    SELECT (SELECT phrase FROM top_bigram) AS phrase,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM occurrences
    """,
    tags=("E180", "D9", "D11", "F7", "J6", "O3"),
)
def q_phrase_match_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index + phrase query: posexplode the
    token stream into (term, doc, pos) postings, pick the corpus's
    most frequent bigram as the phrase (deterministic tie-break),
    and count its occurrences by position-adjacency self-join —
    exactly how a search engine verifies phrases from positional
    postings. At scale the posting join partitions by (doc_id)
    after a term-selective filter (the phrase terms prune the
    postings FIRST, broadcast from the 1-row phrase frame), so the
    self-join never sees the full index."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", tokens(normalize_text(F.col("text"))).alias("toks"))
    top_bigram = (
        toks.select(F.explode(ngrams(F.col("toks"), 2)).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "phrase")
        .limit(1)
        .select(
            "phrase",
            F.split(F.col("phrase"), " ")[0].alias("t1"),
            F.split(F.col("phrase"), " ")[1].alias("t2"),
        )
    )
    posting = toks.select(
        "doc_id", F.posexplode(F.col("toks")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    p1 = posting.join(
        F.broadcast(top_bigram.select("phrase", F.col("t1").alias("term"))), "term"
    ).select("phrase", "doc_id", "pos")
    p2 = posting.join(
        F.broadcast(top_bigram.select(F.col("t2").alias("term"))), "term"
    ).select(F.col("doc_id").alias("doc_id2"), (F.col("pos") - 1).alias("pos2"))
    occ = p1.join(
        p2,
        (F.col("doc_id") == F.col("doc_id2")) & (F.col("pos") == F.col("pos2")),
    )
    return occ.agg(
        F.first("phrase").alias("phrase"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
    )


# --------------------------------------------------------------------------
# E181: 2-D skyline (Pareto frontier) via sort + running max
# --------------------------------------------------------------------------


@query(
    "q_part_price_size_skyline",
    oracle="""
    SELECT p_partkey,
           CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
           p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
         OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
    ORDER BY price_c, p_size, p_partkey
    """,
    tags=("E181", "W1", "W4", "W6", "P2"),
)
def q_part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts where no other part is
    both cheaper-or-equal and larger-or-equal with one strict — the
    multi-objective 'best tradeoffs' query. The oracle is the
    textbook O(n^2) NOT EXISTS; Spark computes the same set in
    O(n log n) with two window running-maxes over the price order
    (max size over strictly-cheaper rows, and over cheaper-or-equal
    rows), which is the sort-filter skyline algorithm — the only
    shuffle is the sort, no self-join, so it survives any n."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint").alias(
            "price_c"
        ),
        "p_size",
    )
    w_rank = Window.orderBy("price_c")
    ranked = p.withColumn("pr", F.dense_rank().over(w_rank))
    w_lt = Window.orderBy("pr").rangeBetween(Window.unboundedPreceding, -1)
    w_le = Window.orderBy("pr").rangeBetween(Window.unboundedPreceding, 0)
    flagged = ranked.select(
        "p_partkey",
        "price_c",
        "p_size",
        F.max("p_size").over(w_lt).alias("max_size_cheaper"),
        F.max("p_size").over(w_le).alias("max_size_cheaper_eq"),
    )
    dominated = F.coalesce(
        F.col("max_size_cheaper") >= F.col("p_size"), F.lit(False)
    ) | (F.col("max_size_cheaper_eq") > F.col("p_size"))
    return (
        flagged.filter(~dominated)
        .select("p_partkey", "price_c", "p_size")
        .orderBy("price_c", "p_size", "p_partkey")
    )


# --------------------------------------------------------------------------
# E198: PMI co-occurrence mining — skip-gram association scores
# --------------------------------------------------------------------------

_PMI_WINDOW = 2  # tokens to the right
_PMI_MIN_PAIR = 5  # min co-occurrence count
_PMI_TOPK = 20
_PMI_Q = 1000000000


@query(
    "q_pmi_cooccurrence",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    posting AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS term
      FROM toks),
    pairs AS (
      SELECT p1.term AS t1, p2.term AS t2, COUNT(*) AS nxy
      FROM posting p1
      JOIN posting p2
        ON p2.doc_id = p1.doc_id
       AND p2.pos > p1.pos AND p2.pos <= p1.pos + {_PMI_WINDOW}
      GROUP BY t1, t2
      HAVING COUNT(*) >= {_PMI_MIN_PAIR}),
    uni AS (SELECT term, COUNT(*) AS n FROM posting GROUP BY term),
    tot AS (
      SELECT CAST(SUM(nxy) AS DOUBLE) AS n_pairs FROM (
        SELECT COUNT(*) AS nxy
        FROM posting p1
        JOIN posting p2
          ON p2.doc_id = p1.doc_id
         AND p2.pos > p1.pos AND p2.pos <= p1.pos + {_PMI_WINDOW}))
    SELECT t1, t2, CAST(nxy AS BIGINT) AS nxy,
           FLOOR(ln(nxy * tot.n_pairs / (CAST(u1.n AS DOUBLE) * u2.n))
                 * {_PMI_Q} + 0.5) / {_PMI_Q}.0 AS pmi
    FROM pairs JOIN uni u1 ON u1.term = pairs.t1
               JOIN uni u2 ON u2.term = pairs.t2, tot
    ORDER BY pmi DESC, t1, t2
    LIMIT {_PMI_TOPK}
    """,
    tags=("E198", "D11", "J6", "A1", "F6", "O3"),
)
def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over skip-gram co-occurrence (a
    2-token right window) — the classic collocation/phrase-discovery
    statistic (and the matrix word2vec implicitly factorizes). The
    positional-posting self-join generates ordered pairs, unigram
    marginals come from the same postings, and PMI =
    ln(n_xy * N / (n_x * n_y)) is 1e-9-quantized for cross-engine ln
    agreement. The min-count floor kills the noisy hapax tail before
    ranking — at corpus scale the pair aggregate is the only big
    shuffle and it is pre-pruned by HAVING inside the aggregate."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    posting = (
        d.select(
            "doc_id",
            F.posexplode(tokens(normalize_text(F.col("text")))).alias("pos0", "term"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    )
    p1 = posting.select("doc_id", F.col("pos").alias("pos1"), F.col("term").alias("t1"))
    p2 = posting.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("pos").alias("pos2"),
        F.col("term").alias("t2"),
    )
    joined = p1.join(
        p2,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("pos2") > F.col("pos1"))
        & (F.col("pos2") <= F.col("pos1") + _PMI_WINDOW),
    )
    pairs = (
        joined.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("nxy"))
        .filter(F.col("nxy") >= _PMI_MIN_PAIR)
    )
    uni = posting.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = joined.agg(F.count(F.lit(1)).cast("double").alias("n_pairs"))
    return (
        pairs.join(F.broadcast(uni.select(F.col("term").alias("t1"), F.col("n").alias("n1"))), "t1")
        .join(F.broadcast(uni.select(F.col("term").alias("t2"), F.col("n").alias("n2"))), "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            F.col("nxy").cast("bigint").alias("nxy"),
            (
                F.floor(
                    F.log(
                        F.col("nxy")
                        * F.col("n_pairs")
                        / (F.col("n1").cast("double") * F.col("n2"))
                    )
                    * _PMI_Q
                    + F.lit(0.5)
                )
                / float(_PMI_Q)
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "t1", "t2")
        .limit(_PMI_TOPK)
    )


# --------------------------------------------------------------------------
# E199: proximity (slop) search — terms within a window, any order
# --------------------------------------------------------------------------

_PROX_T1 = "spark"
_PROX_T2 = "stream"
_PROX_SLOP = 5


@query(
    "q_proximity_slop_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    posting AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS term
      FROM toks),
    hits AS (
      SELECT a.doc_id, ABS(b.pos - a.pos) AS gap
      FROM posting a
      JOIN posting b ON b.doc_id = a.doc_id
      WHERE a.term = 'spark' AND b.term = 'stream'
        AND ABS(b.pos - a.pos) <= 5)
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(gap) AS BIGINT) AS min_gap,
           CAST(FLOOR(AVG(CAST(gap AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS avg_gap
    FROM hits
    """,
    tags=("E199", "E180", "D9", "J6", "A1"),
)
def q_proximity_slop_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search: 'spark' NEAR/5 'stream'
    in either order — the slop operator between exact-phrase and
    bag-of-words retrieval. Term-selective filters prune the
    postings BEFORE the position join (two tiny filtered lists per
    doc), so the proximity check costs per-doc occurrence products,
    not posting-list squares; the report aggregates doc hits and
    gap statistics."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    posting = (
        d.select(
            "doc_id",
            F.posexplode(tokens(normalize_text(F.col("text")))).alias("pos0", "term"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    )
    a = posting.filter(F.col("term") == _PROX_T1).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = posting.filter(F.col("term") == _PROX_T2).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pos_b")
    )
    hits = a.join(
        b,
        (F.col("doc_id") == F.col("doc_id_b"))
        & (F.abs(F.col("pos_b") - F.col("pos_a")) <= _PROX_SLOP),
    ).select("doc_id", F.abs(F.col("pos_b") - F.col("pos_a")).alias("gap"))
    return hits.agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.min("gap").cast("bigint").alias("min_gap"),
        (
            F.floor(F.avg(F.col("gap").cast("double")) * 1e6 + F.lit(0.5)).cast(
                "bigint"
            )
            / 1e6
        ).alias("avg_gap"),
    )


# --------------------------------------------------------------------------
# E332: AMS F2 sketch — second frequency moment with md5-derived signs
# --------------------------------------------------------------------------

_AMS_K = 16  # independent estimators (mean-of-k variance = 2*F2^2/k)


def _ams_sign_sql(i: int, tok: str) -> str:
    """+1/-1 from the first hex digit of md5('<i>:' || token) — md5 is
    byte-identical across engines, so the SKETCH VALUES themselves are
    hash-verifiable, not just the envelope (unlike xxhash64 sketches,
    which are Spark-internal and rows-only by contract)."""
    return (
        f"CASE WHEN substr(md5('{i}:' || {tok}), 1, 1) "
        f"IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END"
    )


def _ams_oracle() -> str:
    xs = ", ".join(
        f"CAST(SUM({_ams_sign_sql(i, 't')} * f) AS BIGINT) AS x{i}"
        for i in range(_AMS_K)
    )
    sq = " + ".join(f"x{i} * x{i}" for i in range(_AMS_K))
    return f"""
    WITH tok AS (
      SELECT unnest({sql_tokens('text')}) AS t FROM documents),
    cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY t),
    sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
                  CAST(SUM(f) AS BIGINT) AS n_tokens,
                  CAST(SUM(f * f) AS BIGINT) AS exact_f2,
                  {xs}
           FROM cnt)
    SELECT n_tokens, n_distinct, exact_f2,
           ({sq}) // {_AMS_K} AS est_f2,
           abs(({sq}) // {_AMS_K} - exact_f2) * 1000 <= 1415 * exact_f2
             AS within_4sigma
    FROM sk
    """


@query(
    "q_ams_f2_sketch",
    oracle=_ams_oracle(),
    tags=("E332", "A4", "F11", "D9", "A2"),
)
def q_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch over
    the corpus token distribution — the classic tug-of-war estimator
    behind join-size estimation, self-join sizing and skew detection:
    F2 = sum of squared token frequencies, estimated as the mean of
    16 X_i^2 where X_i = sum_j sign_i(token_j) * f_j with 4-wise-ish
    signs. Signs come from md5 (byte-identical in both engines), so
    the 16 sketch counters — not just an envelope — are value-checked
    by the oracle; the 4-sigma bound rides along as a cross-multiplied
    integer boolean (Var(mean) <= 2*F2^2/k). All-integer end to end.
    Scale shape: the sketch is ONE aggregate over the token-count
    table (itself one map-side-combinable groupBy), and each X_i is
    trivially MERGEABLE across partitions/sources (a sum) — the
    property that lets 1000 executors sketch 100 TB with no second
    pass, unlike the exact F2's full frequency table. Beside KMV
    (E-distinct), CMS (point frequency) and HLL this completes the
    frequency-moment corner of the sketch family (F0/F1/F2)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(tokens(normalize_text(F.col("text")))).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("f"))

    def sign(i: int):
        return (
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("t"))), 1, 1
                ).isin(*"01234567"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("bigint")
        )

    sk = cnt.agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("exact_f2"),
        *[
            F.sum(sign(i) * F.col("f")).cast("bigint").alias(f"x{i}")
            for i in range(_AMS_K)
        ],
    )
    est = F.expr(
        "("
        + " + ".join(f"x{i} * x{i}" for i in range(_AMS_K))
        + f") DIV {_AMS_K}"
    )
    return sk.select(
        "n_tokens",
        "n_distinct",
        "exact_f2",
        est.alias("est_f2"),
        (
            F.abs(est - F.col("exact_f2")) * 1000
            <= F.lit(1415) * F.col("exact_f2")
        ).alias("within_4sigma"),
    )
