"""Structured Streaming verification (SURVEY.md §5.4): the SAME pure
transforms declared to the driver in batch mode are driven through
readStream -> writeStream micro-batches (file source, 1 file per
trigger) and must produce the batch answer on the union of inputs.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.streaming.transforms import (
    dedup_within_watermark,
    running_counts,
    tumbling_counts,
    user_accumulator,
    write_stream_foreach_batch,
)

SF_SMALL = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


@pytest.fixture(scope="module")
def stream_dir(spark):
    """Events re-written as 4 parquet files so maxFilesPerTrigger=1
    yields 4 real micro-batches."""
    d = tempfile.mkdtemp(prefix="fts_stream_src_")
    load_table(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, transform, stream_dir, mode):
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    name = f"mem_{abs(hash((id(transform), mode))) % 10**8}"
    q = (
        transform(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert not q.isActive
    return spark.table(name)


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, stream_dir):
    batch = tumbling_counts(spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir))
    streamed = _run_stream(spark, tumbling_counts, stream_dir, "complete")
    cols = ["win_start", "win_end", "event_type", "n", "total_value"]
    assert _canon(streamed, cols) == _canon(batch, cols)


def test_running_counts_stream_equals_batch(spark, stream_dir):
    batch = running_counts(spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir))
    streamed = _run_stream(spark, running_counts, stream_dir, "complete")
    cols = ["event_type", "n"]
    assert _canon(streamed, cols) == _canon(batch, cols)


def test_streaming_dedup_drops_cross_batch_duplicates(spark, stream_dir, tmp_path):
    # Duplicate every event across two files: the stream sees each
    # event_id twice in different micro-batches; state-backed dedup
    # must emit each exactly once.
    dup_dir = str(tmp_path / "dup_src")
    base = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    base.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    base.coalesce(1).write.mode("append").parquet(dup_dir)
    streamed = _run_stream(
        spark,
        lambda df: dedup_within_watermark(df, ["event_id"], watermark="10 days"),
        dup_dir,
        "append",
    )
    n_distinct = base.select("event_id").distinct().count()
    assert streamed.count() == n_distinct


def test_stateful_accumulator_stream_equals_batch(spark, stream_dir):
    """applyInPandasWithState: the per-user accumulator's LAST update-
    mode emission per user must equal the batch twin's aggregate over
    the full input (state carried correctly across micro-batches)."""
    batch = user_accumulator(spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)).toPandas()
    streamed = _run_stream(spark, user_accumulator, stream_dir, "update").toPandas()
    # update mode re-emits per batch; the final state is the row with
    # the highest running n per user.
    final = streamed.sort_values("n").groupby("user_id").tail(1).set_index("user_id")
    expect = batch.set_index("user_id")
    assert len(final) == len(expect)
    joined = final.join(expect, lsuffix="_s", rsuffix="_b")
    assert (joined["n_s"] == joined["n_b"]).all()
    assert (joined["last_ts_s"] == joined["last_ts_b"]).all()
    assert ((joined["total_s"] - joined["total_b"]).abs() < 1e-6).all()


def test_foreach_batch_sink_writes_all_rows(spark, stream_dir, tmp_path):
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "ckpt")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = write_stream_foreach_batch(src, out, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(600)
    written = spark.read.parquet(out)
    n_src = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir).count()
    assert written.count() == n_src
    assert written.select("_batch_id").distinct().count() >= 2, "expected multiple micro-batches"


def test_stream_stream_join_equals_batch(spark, stream_dir):
    """T9: the watermarked stream-stream interval join over two real
    file-source streams must emit exactly the batch twin's rows
    (inner joins emit eagerly; the watermark only evicts state)."""
    from fts_analysis_datalake_spark.streaming.transforms import view_click_attribution

    def views(src):
        return src.filter(F.col("event_type") == "view")

    def clicks(src):
        return src.filter(F.col("event_type") == "click")

    batch_src = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    # Watermark wider than the fixture's 30-day span: micro-batch files
    # are not event-time-ordered, so a realistic watermark would
    # legitimately drop late state and the run couldn't equal batch.
    batch = view_click_attribution(views(batch_src), clicks(batch_src), "2 hours", "40 days")

    def stream_src():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )

    q = (
        view_click_attribution(views(stream_src()), clicks(stream_src()), "2 hours", "40 days")
        .writeStream.format("memory")
        .queryName("mem_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert not q.isActive
    cols = ["user_id", "view_id", "click_id", "delay_s"]
    got = _canon(spark.table("mem_ss_join"), cols)
    want = _canon(batch, cols)
    assert got == want and len(want) > 0


def test_transform_with_state_topk_stream_equals_batch(spark, stream_dir):
    """transformWithStateInPandas (T10): the per-user top-k tracker's
    LAST update per user must equal the batch twin exactly — the
    bounded max-set union is order-independent, so micro-batch
    interleaving cannot change the fixpoint."""
    from fts_analysis_datalake_spark.streaming.transforms import user_topk_state

    batch = user_topk_state(
        spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    ).toPandas()
    streamed = _run_stream(spark, user_topk_state, stream_dir, "update").toPandas()
    last = streamed.groupby("user_id").tail(1)
    b = {r.user_id: (r.n, tuple(r.top_values)) for r in batch.itertuples()}
    s = {r.user_id: (r.n, tuple(r.top_values)) for r in last.itertuples()}
    assert b == s


def test_stream_stream_outer_join_equals_batch(spark, stream_dir, tmp_path):
    """T9 outer: the LEFT OUTER watermarked join must emit the batch
    twin's rows INCLUDING null rows for unmatched views. Unmatched
    state only flushes when the watermark passes, so the stream gets
    one sentinel file (far-future event, user_id -1) as its final
    micro-batch; sentinel rows are excluded from the comparison."""
    import time as _time

    from fts_analysis_datalake_spark.streaming.transforms import (
        view_click_attribution_outer,
    )

    # Copy the source files, then append a strictly-newer sentinel file
    # (FileStreamSource orders batches by modification time).
    src_dir = str(tmp_path / "outer_src")
    shutil.copytree(stream_dir, src_dir)
    # TWO sentinel batches, each with a view AND a click row: the
    # global watermark is the MIN across both watermarked inputs, so
    # both sides must advance; the first sentinel moves the watermark,
    # the second triggers the state scan that actually flushes
    # unmatched rows (eviction happens in the batch AFTER the
    # watermark moves).
    for i, ts in enumerate(("2030-01-01 00:00:00", "2030-01-02 00:00:00")):
        _time.sleep(1.1)
        spark.createDataFrame(
            [
                (999980 + i, ts, -1, "view", 1.0, "{}"),
                (999990 + i, ts, -1, "click", 1.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    def views(src):
        return src.filter(F.col("event_type") == "view")

    def clicks(src):
        return src.filter(F.col("event_type") == "click")

    batch_src = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    batch = view_click_attribution_outer(
        views(batch_src), clicks(batch_src), "2 hours", "40 days"
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        view_click_attribution_outer(
            views(stream), clicks(stream), "2 hours", "40 days"
        )
        .writeStream.format("memory")
        .queryName("mem_ss_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert not q.isActive
    cols = ["user_id", "view_id", "click_id", "delay_s"]
    got = _canon(spark.table("mem_ss_outer").filter(F.col("user_id") >= 0), cols)
    want = _canon(batch, cols)
    assert got == want and len(want) > 0
    # the outer form must actually contain unmatched views
    assert any(r[2] is None for r in want)


def test_tallysink_failed_overwrite_keeps_previous_commit(spark, tmp_path):
    """r5-advice regression: a FAILED overwrite must leave the
    previously committed part files AND the manifest intact (tasks
    write under _tmp/, commit() swaps, abort() removes only temps).
    The old writer deleted the committed output on the driver before
    the job ran, so a failing job destroyed it."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from fts_analysis_datalake_spark.sources.pydatasource import (
        register_tallysink,
    )

    register_tallysink(spark)
    path = str(tmp_path / "tally")
    ok = spark.range(10).select(F.col("id").alias("k"))
    ok.coalesce(2).write.format("tallysink").option("path", path).mode(
        "overwrite"
    ).save()
    parts = sorted(os.listdir(path))
    assert "_MANIFEST.json" in parts and len([p for p in parts if p.startswith("part-")]) == 2
    manifest0 = json.load(open(f"{path}/_MANIFEST.json"))
    assert manifest0["rows"] == 10

    # A write whose evaluation raises on the executors: the job fails
    # after writer() was created, exercising the abort path.
    bad = spark.range(4).select(
        F.when(F.col("id") < 99, F.col("id"))
        .otherwise(F.col("id"))
        .alias("k"),
        F.assert_true(F.col("id") < 2).alias("boom"),
    )
    with pytest.raises(Exception):
        bad.coalesce(1).write.format("tallysink").option("path", path).mode(
            "overwrite"
        ).save()

    # Previously committed output untouched; no temp residue is
    # visible to a manifest-keyed reader.
    parts_after = sorted(
        p for p in os.listdir(path) if p.startswith("part-") or p == "_MANIFEST.json"
    )
    assert parts_after == parts
    assert json.load(open(f"{path}/_MANIFEST.json")) == manifest0
    total = 0
    for p in parts_after:
        if p.startswith("part-"):
            with open(f"{path}/{p}") as fh:
                total += sum(1 for _ in fh)
    assert total == 10


def test_tickstream_offsets_replay_exactly(spark):
    """E311's recovery contract: readBetweenOffsets must regenerate
    any committed range bit-identically to the live read() path, and
    chunking must not change the landed set."""
    from fts_analysis_datalake_spark.sources.pydatasource import (
        _make_tickstream,
    )

    src = _make_tickstream()({"n": "50", "chunk": "20"})
    reader = src.simpleStreamReader("i bigint")
    start = reader.initialOffset()
    live, offsets = [], [start]
    while True:
        rows, end = reader.read(offsets[-1])
        rows = list(rows)
        if not rows:
            break
        live.extend(rows)
        offsets.append(end)
    assert [r[0] for r in live] == list(range(50))
    # replay every committed micro-batch range
    for a, b in zip(offsets, offsets[1:]):
        replay = list(reader.readBetweenOffsets(a, b))
        assert replay == live[a["i"] : b["i"]]
