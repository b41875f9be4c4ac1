"""Streaming-twin + source/sink + UDF-surface declared queries
(SURVEY.md §7 steps 8-9; §2.9 T1-T7, §2.1 S2-S4, §2.11 X2-X4).

Streaming operators are declared in batch mode (the oracle is batch
SQL); tests/test_streaming.py drives the SAME transforms through
readStream/writeStream micro-batches and asserts equality with the
batch run — that is the streaming correctness story.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table, register_views
from fts_analysis_datalake_spark.operators.udfs import mad_udaf, per_user_value_trend, token_positions_udtf
from fts_analysis_datalake_spark.registry import query
from fts_analysis_datalake_spark.sources.ingest import (
    read_binary_files,
    read_csv,
    read_jsonl,
    read_orc,
    write_partitioned_parquet,
)
from fts_analysis_datalake_spark.streaming.transforms import (
    drop_late_events,
    session_window_agg,
    sliding_counts,
    stream_static_join,
    tumbling_counts,
    user_accumulator,
    view_click_attribution,
    view_click_attribution_outer,
)

# Per-process cache root: two concurrent sessions (driver verify +
# bench) at the same sf must not overwrite each other's files mid-read.
CACHE_DIR = f"/tmp/fts_spark_cache_{os.getpid()}"


def _write_once(path: str, write) -> None:
    """Run ``write(path)`` unless this process already wrote ``path``
    (Spark's _SUCCESS marker). The ingest queries re-run under verify
    + bench in one process; re-writing identical data every run only
    adds IO (and round 1 re-wrote on every invocation)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write(path)

# --------------------------------------------------------------------------
# T1: tumbling window (epoch-aligned => date_trunc twin)
# --------------------------------------------------------------------------


@query(
    "q_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("T1", "F4"),
)
def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window tumbling agg — the identical transform runs under
    Structured Streaming with a watermark (see streaming tests)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# T2: sliding window (grid-join twin)
# --------------------------------------------------------------------------


@query(
    "q_sliding_2h_30m",
    oracle="""
    WITH grid AS (
      SELECT w AS win_start
      FROM unnest(generate_series(TIMESTAMP '2023-12-31 22:30:00',
                                  TIMESTAMP '2024-01-31 00:00:00',
                                  INTERVAL 30 MINUTE)) t(w)
    )
    SELECT win_start, event_type, COUNT(*) AS n
    FROM events JOIN grid
      ON ts >= win_start AND ts < win_start + INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
    tags=("T2", "J8"),
)
def q_sliding_2h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h width / 30m slide): every event expands to
    4 windows map-side; the oracle reproduces the epoch-aligned grid
    (starting before the first event so partial windows match)."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# T3: native session window (gap-and-island twin)
# --------------------------------------------------------------------------


@query(
    "q_session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                          - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("T3", "W8"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window (gap-close: end = last event + gap) checked
    against the W8 gap-and-island SQL — the two formulations must
    agree exactly."""
    return session_window_agg(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# T4: watermark late-data drop (batch analog)
# --------------------------------------------------------------------------


@query(
    "q_recent_events_watermark",
    oracle="""
    SELECT event_id, user_id, ts, event_type
    FROM events
    WHERE CAST(FLOOR(epoch(ts)) AS BIGINT) >=
          (SELECT CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) - 86400 FROM events)
    """,
    tags=("T4", "P4"),
)
def q_recent_events_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep events within 24h of the observed max ts — the batch
    analog of watermark-based late-data dropping."""
    return drop_late_events(load_table(spark, sf_dir, "events"), delay_s=86400).select(
        "event_id", "user_id", "ts", "event_type"
    )


# --------------------------------------------------------------------------
# T7: stream-static join
# --------------------------------------------------------------------------

TYPE_WEIGHTS = [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", -2.0)]


@query(
    "q_stream_static_weighted",
    oracle="""
    SELECT event_type, w.weight,
           COUNT(*) AS n,
           COUNT(*) * w.weight AS weighted_events
    FROM events
    JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                 ('signup', 5.0), ('error', -2.0)) w(event_type, weight)
      USING (event_type)
    GROUP BY event_type, w.weight
    """,
    tags=("T7", "J1", "J5"),
)
def q_stream_static_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ static weights dim (broadcast) — under streaming the
    static side is re-broadcast per micro-batch, same transform."""
    e = load_table(spark, sf_dir, "events")
    # JVM-literal dim (explode of literal structs) instead of
    # createDataFrame: no Python->JVM data serialization on the first
    # use, which dominated this query's round-1 bench time.
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("event_type"), F.lit(w).alias("weight"))
                        for t, w in TYPE_WEIGHTS
                    ]
                )
            ).alias("s")
        )
        .select("s.event_type", "s.weight")
    )
    return (
        stream_static_join(e, F.broadcast(dim), "event_type")
        .groupBy("event_type", "weight")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "weight",
            "n",
            (F.col("n") * F.col("weight")).alias("weighted_events"),
        )
    )


# --------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState) — batch twin
# --------------------------------------------------------------------------


@query(
    "q_user_accumulator_batch",
    oracle="""
    SELECT user_id, COUNT(*) AS n, MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
    tags=("T6", "X2"),
)
def q_user_accumulator_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState per-user accumulator
    (streaming/transforms.py user_accumulator; cross-batch state
    equality is asserted in tests/test_streaming.py). The declared
    projection keeps the deterministic columns — the float value
    total is checked with tolerance in the streaming test instead of
    the exact-hash oracle."""
    acc = user_accumulator(load_table(spark, sf_dir, "events"))
    return acc.select("user_id", "n", "last_ts")


# --------------------------------------------------------------------------
# S2/S3: CSV and JSON-lines ingest (lossless-roundtrip columns)
# --------------------------------------------------------------------------


@query(
    "q_csv_ingest",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key, CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("S2",),
)
def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest with pinned schema: parquet -> CSV roundtrip on
    lossless columns (ints + strings), then aggregate — proves the
    S2 reader against the parquet-backed oracle."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{CACHE_DIR}/orders_csv_{sf_tag}"
    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderpriority")
    _write_once(path, lambda p: src.write.mode("overwrite").option("header", True).csv(p))
    df = read_csv(spark, path, "o_orderkey long, o_orderstatus string, o_orderpriority string")
    return df.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "q_jsonl_ingest",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM events
    GROUP BY 1
    """,
    tags=("S3", "F10"),
)
def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingest with pinned schema (the FTS/MONIT record
    format): parquet -> JSONL roundtrip on lossless columns."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{CACHE_DIR}/events_jsonl_{sf_tag}"
    src = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    _write_once(path, lambda p: src.write.mode("overwrite").json(p))
    df = read_jsonl(spark, path, "event_id long, user_id long, event_type string")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").cast("bigint").alias("sum_users")
    )


@query(
    "q_orc_ingest",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key
    FROM lineitem
    GROUP BY 1
    """,
    tags=("S2", "S4"),
)
def q_orc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC roundtrip on lossless columns — the second columnar format
    (same vectorized scan + pushdown machinery as parquet), proving
    the reader against the parquet-backed oracle."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{CACHE_DIR}/lineitem_orc_{sf_tag}"
    src = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
    _write_once(path, lambda p: src.write.mode("overwrite").orc(p))
    df = read_orc(spark, path, "l_orderkey long, l_linenumber int, l_returnflag string")
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


# --------------------------------------------------------------------------
# S4: partitioned write sink + partition-pruned re-read
# --------------------------------------------------------------------------


@query(
    "q_partitioned_sink_reread",
    oracle="""
    SELECT date_trunc('day', ts) AS dt, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-10'
      AND date_trunc('day', ts) <  TIMESTAMP '2024-01-15'
    GROUP BY 1
    """,
    tags=("S4", "F4"),
)
def q_partitioned_sink_reread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by day, re-read with a partition
    filter — the filter prunes to 5 of ~30 directory partitions (the
    100 TB layout contract), then aggregates."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{CACHE_DIR}/events_by_day_{sf_tag}"
    src = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date(F.date_trunc("day", F.col("ts")))
    )
    _write_once(path, lambda p: write_partitioned_parquet(src, p, ["dt"]))
    re = spark.read.parquet(path).filter(
        (F.col("dt") >= F.lit("2024-01-10")) & (F.col("dt") < F.lit("2024-01-15"))
    )
    return re.groupBy(F.col("dt").cast("timestamp").alias("dt")).agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users")
    )


# --------------------------------------------------------------------------
# X2/X3/X4: UDF surface (rows-only; unit-tested in tests/test_udfs.py)
# --------------------------------------------------------------------------


@query(
    "q_user_value_trend_udf",
    oracle=None,  # numpy polyfit; sanity-checked in tests/test_udfs.py
    tags=("X2",),
)
def q_user_value_trend_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time via applyInPandas
    (grouped-map) — the per-link model-fit surface."""
    return per_user_value_trend(load_table(spark, sf_dir, "events"))


@query(
    "q_value_mad_udaf",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS DOUBLE) AS vq
      FROM events),
    m AS (SELECT event_type, median(vq) AS med FROM q GROUP BY event_type)
    SELECT q.event_type,
           median(ABS(q.vq - m.med)) / 100.0 AS mad_value
    FROM q JOIN m USING (event_type)
    GROUP BY q.event_type
    """,
    tags=("X3",),
)
def q_value_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of value per event_type via a
    grouped-agg pandas UDAF (X3).

    Rows-only until round 5; hash-checked now by feeding the UDAF
    CENT-QUANTIZED values: over integral doubles below 2^52 every
    median interpolation step ((a+b)/2 in pandas, a+(b-a)*0.5 in
    DuckDB) is EXACT binary arithmetic, so the two formulations
    cannot disagree — float medians of raw doubles could differ in
    the last ulp between the interpolation forms, quantized ones
    cannot. The /100 rescale is one exact-input division on both
    sides."""
    e = load_table(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double")
    return (
        e.groupBy("event_type")
        .agg((mad_udaf()(vq) / 100.0).alias("mad_value"))
    )


@query(
    "q_token_positions_udtf",
    oracle="""
    WITH d AS (SELECT text FROM documents WHERE doc_id % 17 = 0),
    tok AS (
      SELECT token, pos FROM (
        SELECT unnest(lst) AS token,
               unnest(generate_series(1, len(lst))) - 1 AS pos
        FROM (SELECT str_split(text, ' ') AS lst FROM d))
      WHERE token <> '')
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(AVG(pos) * 1000000 + 0.5) AS BIGINT) / 1000000.0
             AS mean_pos
    FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    tags=("X4",),
)
def q_token_positions_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF expanding each doc into (token, pos) rows, then a
    positional aggregate (mean position per token, top tokens).

    Hash-checked since r6: the generator is deterministic
    (enumerate over str.split()), and the fixture text is strictly
    single-space separated (no tabs/newlines/runs — verified), so
    DuckDB's zipped unnest over str_split reproduces the exact
    (token, pos) stream; positions sum as integers and the mean is
    1e-6-quantized on both engines. If the fixture ever grew
    irregular whitespace, Python's split() and the oracle's
    single-space split would diverge — the parity test would catch
    it, not silently pass."""
    TokenPositions = token_positions_udtf(spark)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")  # lateral-join the UDTF per row
    spark.udtf.register("token_positions", TokenPositions)
    return spark.sql(
        """
        SELECT tp.token, COUNT(*) AS n,
               FLOOR(AVG(tp.pos) * 1e6 + 0.5) / 1e6 AS mean_pos
        FROM _udtf_docs d, LATERAL token_positions(d.text) tp
        WHERE d.doc_id % 17 = 0
        GROUP BY tp.token
        ORDER BY n DESC, token
        LIMIT 20
        """
    )


# --------------------------------------------------------------------------
# T8: foreachBatch sink — run a real availableNow stream, audit the sink
# --------------------------------------------------------------------------


@query(
    "q_foreachbatch_sink_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events
    """,
    tags=("T8", "S4", "T1"),
)
def q_foreachbatch_sink_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 declared and ORACLE-CHECKED: a real Structured Streaming run
    (file source, availableNow trigger, maxFilesPerTrigger forcing
    multiple micro-batches) through the foreachBatch parquet sink
    (streaming/transforms.write_stream_foreach_batch — idempotent,
    append output mode), then the sink directory is read back and
    audited against the batch truth: every source row must appear in
    the sink exactly once, across batches. The stream runs once per
    process (_SUCCESS-marker contract like the other ingest
    fixtures); the returned DataFrame is a plain batch aggregate over
    the sink files, so the driver's collect sees a stable result."""
    from fts_analysis_datalake_spark.streaming.transforms import (
        write_stream_foreach_batch,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    src_dir = f"{CACHE_DIR}/fes_src_{sf_tag}"
    sink_dir = f"{CACHE_DIR}/fes_sink_{sf_tag}"
    ckpt = f"{CACHE_DIR}/fes_ckpt_{sf_tag}"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    _write_once(src_dir, lambda p: ev.repartition(4).write.parquet(p))
    done = os.path.join(sink_dir, "_fes_done")
    if not os.path.exists(done):
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
        )
        q = (
            write_stream_foreach_batch(src, sink_dir, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        open(done, "w").close()
    back = spark.read.parquet(sink_dir)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


# --------------------------------------------------------------------------
# T9: stream-stream watermarked interval join — batch twin
# --------------------------------------------------------------------------


@query(
    "q_view_click_attribution",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           CAST(FLOOR(epoch(c.ts)) - FLOOR(epoch(v.ts)) AS BIGINT) AS delay_s
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    tags=("T9", "J8", "T4"),
)
def q_view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream watermarked join
    (streaming/transforms.py view_click_attribution): clicks
    attributed to same-user views in the preceding 2 hours. The
    streaming run of the identical transform (two file-source streams,
    append mode) is asserted row-equal in tests/test_streaming.py —
    the time-bounded condition is what lets streaming evict join
    state once the watermark passes."""
    e = load_table(spark, sf_dir, "events")
    return view_click_attribution(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
        attribution_window="2 hours",
    )


# --------------------------------------------------------------------------
# S7: whole-file binary ingest (binaryFile source) — multimodal corpus entry
# --------------------------------------------------------------------------


@query(
    "q_binary_file_ingest",
    oracle="""
    SELECT COUNT(*) AS n_files,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents WHERE doc_id < 200
    """,
    tags=("S7", "D14", "F2"),
)
def q_binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile-source ingest: the first 200 document texts are laid
    out once per process as loose .bin blobs (fixture setup, same
    _SUCCESS-guarded write-once contract as the CSV/JSONL caches),
    then re-read as whole files — one row per blob with (path,
    length, content) — and audited against the parquet truth: file
    count, total bytes (ASCII fixture => bytes == n_chars), and the
    doc-id range recovered from the file names. The content column
    is exactly what the multimodal mapInPandas stages consume; at
    scale the source bin-packs millions of small blobs into tasks by
    maxPartitionBytes without a manifest."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(CACHE_DIR, f"bin_{sf_tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .select("doc_id", "text")
            .collect()  # 200 rows: driver-side fixture setup, not a query path
        )
        for r in rows:
            with open(os.path.join(path, f"{r.doc_id}.bin"), "wb") as fh:
                fh.write(r.text.encode())
        open(marker, "w").close()
    b = read_binary_files(spark, path, glob="*.bin")
    doc_id = F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("bigint")
    return b.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.min(doc_id).alias("min_doc"),
        F.max(doc_id).alias("max_doc"),
    )


@query(
    "q_user_topk_state_batch",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           array_to_string(
             list_transform(list_slice(list_sort(list(value), 'DESC'), 1, 3),
                            v -> CAST(CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS VARCHAR)),
             ',') AS top_values_csv
    FROM events
    GROUP BY user_id
    """,
    tags=("T10", "X2", "A9"),
)
def q_user_topk_state_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the per-user top-k state tracker
    (streaming/transforms.py user_topk_state — the
    transformWithStateInPandas surface, with an
    applyInPandasWithState fallback where protobuf is absent;
    cross-batch stream-equals-batch is asserted in
    tests/test_streaming.py). The bounded max-set is
    order-independent, so the oracle's sort-then-slice reproduces the
    streaming fixpoint exactly. The top-k list is emitted as a CSV of
    1e-6-quantized values (the FLOOR(x*m+0.5) convention from
    functions/deterministic.py): the correctness harness canonicalizes
    with a pandas sort that cannot hash array columns, so an
    array<double> column would error out of the check entirely — the
    E82 listagg pattern makes the same values hashable on both sides."""
    from fts_analysis_datalake_spark.streaming.transforms import user_topk_state

    out = user_topk_state(load_table(spark, sf_dir, "events"))
    quantized = F.transform(
        "top_values",
        lambda v: F.floor(v * 1000000.0 + F.lit(0.5)).cast("bigint").cast("string"),
    )
    return out.select(
        "user_id", "n", F.array_join(quantized, ",").alias("top_values_csv")
    )


@query(
    "q_python_datasource_agg",
    oracle="""
    WITH synth AS (
      SELECT i AS id, i % 10 AS grp,
             (i * 1103515245 + 12345) % 2147483648 AS val
      FROM generate_series(0, 19999) t(i))
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS BIGINT) AS total_val,
           CAST(MIN(val) AS BIGINT) AS min_val,
           CAST(MAX(val) AS BIGINT) AS max_val
    FROM synth
    GROUP BY grp
    """,
    tags=("S8", "A1"),
)
def q_python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: custom Python Data Source plugin (Spark 4 DataSource API):
    read 20k rows from the registered 'synthlog' generator source
    (4 declared InputPartitions -> 4 parallel tasks, nothing on the
    driver) and aggregate per group. Every value is deterministic
    integer arithmetic, so the oracle regenerates the identical
    table with generate_series and the hash check verifies the
    partition-planning + per-partition iteration plumbing
    end-to-end (sources/pydatasource.py)."""
    from fts_analysis_datalake_spark.sources.pydatasource import register_synthlog

    register_synthlog(spark)
    # parts=4 (5k rows each): enough to verify parallel split planning
    # while spinning up 4 read workers, not 8, on first use — Python
    # data-source tasks each cost a worker process until the pool warms.
    synth = spark.read.format("synthlog").option("n", 20000).option("parts", 4).load()
    return synth.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("total_val"),
        F.min("val").cast("bigint").alias("min_val"),
        F.max("val").cast("bigint").alias("max_val"),
    )


@query(
    "q_python_datasource_writer",
    oracle="""
    WITH agg AS (
      SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS total_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name)
    SELECT nation, n_orders, total_cents FROM agg ORDER BY nation
    """,
    tags=("S8", "E238", "S4", "A1", "J1"),
)
def q_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 writer half: push per-nation order totals through the
    custom Python DataSource SINK (Spark-4 DataSourceWriter API —
    executor tasks write JSONL part files and return commit
    messages; the driver commit publishes a manifest, the minimal
    two-phase-commit contract), then read the part files back and
    verify against the direct aggregation oracle. This closes the
    round-trip the reader-side q_python_datasource_agg started: the
    hash check proves schema handling, per-partition write, commit
    protocol, and read-back all preserve the data exactly. The
    aggregate is 25 rows — the sink surface under test, not volume;
    at scale the same writer shape streams arbitrary partitions as
    task files with a metastore commit."""
    from fts_analysis_datalake_spark.sources.pydatasource import register_tallysink

    register_tallysink(spark)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(CACHE_DIR, f"tally_{sf_tag}")
    # The aggregate is ~25 rows spread over the shuffle partitioning;
    # coalesce before the sink so only a few Python writer tasks spin
    # up. mode('overwrite') is the sink's only supported mode — its
    # writer() clears stale part files itself, so re-runs are safe
    # without any caller-side rmtree.
    agg.coalesce(4).write.format("tallysink").option("path", path).mode(
        "overwrite"
    ).save()
    back = spark.read.json(os.path.join(path, "part-*.jsonl"))
    return back.select(
        "nation",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
    ).orderBy("nation")


@query(
    "q_view_click_attribution_outer",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           CAST(FLOOR(epoch(c.ts)) - FLOOR(epoch(v.ts)) AS BIGINT) AS delay_s
    FROM events v LEFT JOIN events c
      ON v.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
    WHERE v.event_type = 'view'
    """,
    tags=("T9", "J2", "T4", "E253"),
)
def q_view_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER watermarked stream-stream join
    (streaming/transforms.py view_click_attribution_outer): every
    view appears — matched views once per attributing click,
    unmatched views once with null click columns. The outer form is
    the state-management hard case of T9: in streaming, a null row is
    only decidable once the click watermark passes the view's
    attribution horizon, so unmatched rows surface with watermark
    latency (the stream-equals-batch test drives a sentinel batch to
    flush them; this batch twin is what that run must equal). The
    unmatched share is the 'attribution coverage' number funnel
    dashboards track."""
    e = load_table(spark, sf_dir, "events")
    return view_click_attribution_outer(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
        attribution_window="2 hours",
    )


# --------------------------------------------------------------------------
# E283: native XML ingest + from_xml parsing (Spark 4 built-in XML)
# --------------------------------------------------------------------------


@query(
    "q_xml_ingest",
    oracle="""
    SELECT n_regionkey AS region_key,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY region_key
    """,
    tags=("E283", "S2", "A1"),
)
def q_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML ingest (Spark 4 built-in ``format('xml')`` — no
    external package): parquet -> XML roundtrip on the nation table
    with a pinned schema and explicit rowTag, then aggregate — the
    S2-pattern proof that the XML reader preserves values against
    the parquet-backed oracle. XML is the interchange format half of
    scientific/metadata feeds still arrive in; at scale the reader
    splits files exactly like the other text sources."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{CACHE_DIR}/nation_xml_{sf_tag}"
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    _write_once(
        path,
        lambda p: src.write.mode("overwrite").option("rowTag", "nation").format("xml").save(p),
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey long, n_name string, n_regionkey long")
        .load(path)
    )
    return (
        df.groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("region_key")
    )


# --------------------------------------------------------------------------
# E284: collation-aware comparison (Spark 4 COLLATE)
# --------------------------------------------------------------------------


@query(
    "q_collated_segment_rollup",
    oracle="""
    SELECT lower(CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                      WHEN c_custkey % 3 = 1 THEN c_mktsegment
                      ELSE concat(upper(substring(c_mktsegment, 1, 1)),
                                  lower(substring(c_mktsegment, 2)))
                 END) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS balance_cents
    FROM customer GROUP BY segment ORDER BY segment
    """,
    tags=("E284", "F1", "A1"),
)
def q_collated_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 ``COLLATE UTF8_LCASE``): a
    deliberately case-mangled segment column groups back into the
    canonical 5 segments under the case-insensitive collation — the
    engine-native form of the lower()-everywhere workaround, which is
    exactly what the oracle does (grouping sets must coincide; the
    output key is lowercased on both sides since a collated group can
    surface any member as its label)."""
    c = load_table(spark, sf_dir, "customer")
    mangled = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower(F.col("c_mktsegment")))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(
            F.concat(
                F.upper(F.substring(F.col("c_mktsegment"), 1, 1)),
                F.lower(F.expr("substring(c_mktsegment, 2)")),
            )
        )
    )
    collated = c.select(
        F.expr(
            "CAST(" +
            """CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN c_mktsegment
                    ELSE concat(upper(substring(c_mktsegment, 1, 1)),
                                lower(substring(c_mktsegment, 2))) END"""
            + " AS STRING COLLATE UTF8_LCASE) AS seg_ci"
        ),
        "c_acctbal",
    )
    return (
        collated.groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("balance_cents"),
        )
        .select(
            F.lower(F.col("seg_ci").cast("string")).alias("segment"),
            "n",
            "balance_cents",
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# E285: EXECUTE IMMEDIATE — dynamic SQL with bound parameters
# --------------------------------------------------------------------------


@query(
    "q_execute_immediate_report",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("E285", "S6", "A1", "P2"),
)
def q_execute_immediate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE ... USING`` (Spark 4): a statement held in
    a session variable executes with a named parameter bound at run
    time — the dynamic-SQL surface warehouse procedures use for
    statement templates (distinct from E250's spark.sql(args=...):
    here the TEXT itself is data, and binding still goes through the
    parser as a typed parameter, not string splicing)."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
    spark.sql(
        """SET VAR stmt =
           'SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem WHERE l_quantity >= :minq
            GROUP BY l_returnflag ORDER BY l_returnflag'
        """
    )
    return spark.sql("EXECUTE IMMEDIATE stmt USING 30 AS minq")


# --------------------------------------------------------------------------
# E311: Python STREAMING data source — offset-tracked micro-batch ingest
# --------------------------------------------------------------------------

_TICK_N = 5000
_TICK_MULT = 2654435761  # Knuth multiplicative-hash constant
_TICK_MOD = 9973


@query(
    "q_python_stream_source_agg",
    oracle=f"""
    WITH ticks AS (
      SELECT i, (i * {_TICK_MULT}) % {_TICK_MOD} AS val
      FROM generate_series(0, {_TICK_N - 1}) t(i))
    SELECT CAST(i % 8 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS BIGINT) AS total_val,
           CAST(MIN(val) AS BIGINT) AS min_val,
           CAST(MAX(val) AS BIGINT) AS max_val
    FROM ticks GROUP BY grp ORDER BY grp
    """,
    tags=("E311", "S8", "T1", "A1"),
)
def q_python_stream_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python STREAMING data source (Spark 4
    ``SimpleDataSourceStreamReader``) — the micro-batch ingest half
    of the S8 plugin surface (batch reader: q_python_datasource_agg;
    writer: q_python_datasource_writer): a custom source with
    replayable integer offsets is streamed through
    ``readStream -> memory sink`` micro-batches until the bounded
    generator drains, then the landed table is aggregated. The
    offset contract (``readBetweenOffsets`` regenerates any
    committed range bit-identically) is what makes the stream
    exactly-once recoverable — and is exactly why the oracle can
    regenerate the whole ingest with ``generate_series`` and the
    hash check verifies the streaming plumbing end-to-end: every
    value that crossed a micro-batch boundary must land exactly
    once. The poll loop watches the sink row count (bounded source,
    so the fixpoint is exact), the standard pattern for driving a
    finite stream to completion without availableNow (which
    snapshots only the first offset window for simple readers)."""
    import time

    from fts_analysis_datalake_spark.sources.pydatasource import (
        register_tickstream,
    )

    register_tickstream(spark)
    view = "tick_ingest"
    try:
        spark.catalog.dropTempView(view)
    except Exception:
        pass
    stream = (
        spark.readStream.format("tickstream")
        .option("n", _TICK_N)
        .option("chunk", 1000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(view)
        .trigger(processingTime="10 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.table(view).count() >= _TICK_N:
                break
            time.sleep(0.05)
    finally:
        q.stop()
        q.awaitTermination(30)
    landed = spark.table(view).localCheckpoint(eager=True)
    val = (F.col("i") * _TICK_MULT) % _TICK_MOD
    return (
        landed.select("i", val.alias("val"))
        .groupBy((F.col("i") % 8).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("val").cast("bigint").alias("total_val"),
            F.min("val").cast("bigint").alias("min_val"),
            F.max("val").cast("bigint").alias("max_val"),
        )
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# E313: polymorphic Python UDTF — analyze()-time dynamic output schema
# --------------------------------------------------------------------------

_PUDTF_K = 3  # leading tokens widened into typed columns


@query(
    "q_polymorphic_udtf",
    oracle=f"""
    WITH cols AS (
      SELECT COALESCE(string_split(text, ' ')[1], '') AS t1,
             COALESCE(string_split(text, ' ')[2], '') AS t2,
             COALESCE(string_split(text, ' ')[3], '') AS t3
      FROM documents)
    SELECT t1, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT t2) AS BIGINT) AS n_t2,
           CAST(COUNT(DISTINCT t3) AS BIGINT) AS n_t3
    FROM cols GROUP BY t1 ORDER BY t1
    """,
    tags=("E313", "X4", "A1", "D8"),
)
def q_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze()``): the output
    SCHEMA is computed at query-analysis time from the literal
    argument — ``lead_tokens(text, 3)`` materializes columns
    t1..t3, ``lead_tokens(text, 5)`` would materialize five —
    the dynamic-arity surface static UDTFs (X4,
    q_token_positions_udtf) can't express; a real engine uses it
    for CSV-widening / pivot-like table functions whose shape
    depends on arguments. eval is vectorized-enough for the
    declared Python surface (one row out per doc in). The oracle
    reproduces the widening with static list indexing, so the
    hash check pins both the analyze-time schema and the
    per-row values."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    k = _PUDTF_K

    @udtf
    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(int(n.value)):
                st = st.add(f"t{i + 1}", "string")
            return AnalyzeResult(st)

        def eval(self, text: str, n: int):
            # raw split, EMPTY TOKENS KEPT — mirrors the oracle's
            # string_split indexing exactly (a doubled/leading space
            # yields an empty element on both sides)
            toks = (text or "").split(" ")
            yield tuple(
                (toks[i] if i < len(toks) else "") for i in range(int(n))
            )

    spark.udtf.register("lead_tokens", LeadTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_pudtf_docs"
    )
    return spark.sql(
        f"""
        SELECT lt.t1, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT lt.t2) AS BIGINT) AS n_t2,
               CAST(COUNT(DISTINCT lt.t3) AS BIGINT) AS n_t3
        FROM _pudtf_docs d, LATERAL lead_tokens(d.text, {k}) lt
        GROUP BY lt.t1 ORDER BY lt.t1
        """
    )
