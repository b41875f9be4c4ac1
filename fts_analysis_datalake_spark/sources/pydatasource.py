"""Custom Python Data Source (SURVEY.md §2.1 S8) — the Spark-4 plugin
API for sources Spark has no built-in reader for (internal services,
bespoke wire formats, synthetic generators).

The demo source is a deterministic synthetic event-log generator:
row i -> (id=i, grp=i%10, val=LCG(i)) with the classic glibc LCG
constants, so every cell is pure integer arithmetic an oracle can
reproduce exactly — the point is to verify the PLUMBING (schema
declaration, options, partition planning, per-partition iteration)
with a value-hash check, not to fake data.

Scale notes: ``partitions()`` is the source's split planning — each
InputPartition becomes one Spark task reading [lo, hi), so
parallelism is declared by the source exactly like file splits are
for parquet; nothing is generated on the driver. A real connector
would put its shard/offset descriptors in the partition values.

Packaging note: the classes are defined INSIDE the factory below on
purpose. Spark ships a registered Python data source to executors
with cloudpickle, which serializes module-level classes by REFERENCE
(workers would need this package importable — true on a deployed
cluster, false for a bare driver-contract harness); locally-defined
classes serialize by VALUE and run anywhere the driver runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def _make_source():
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SynthLogReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 1000))
            self.parts = int(options.get("parts", 8))

        def partitions(self) -> list:
            step = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((i * step, min((i + 1) * step, self.n)))
                for i in range(self.parts)
            ]

        def read(self, partition):
            # Yield pyarrow RecordBatches, not per-row tuples: the
            # DataSource API accepts either, and the tuple path pays
            # row-at-a-time Python + pickle per cell (~9 s for 20k
            # rows), while Arrow batches are built vectorized in
            # numpy and cross to the JVM zero-copy (<1 s). A real
            # connector would decode its wire format straight into
            # batches the same way.
            import numpy as np
            import pyarrow as pa

            lo, hi = partition.value
            batch_rows = 65536
            for b0 in range(lo, hi, batch_rows):
                ids = np.arange(b0, min(b0 + batch_rows, hi), dtype=np.int64)
                yield pa.record_batch(
                    [
                        pa.array(ids),
                        pa.array(ids % 10),
                        pa.array((ids * 1103515245 + 12345) % 2147483648),
                    ],
                    names=["id", "grp", "val"],
                )

    class SynthLogSource(DataSource):
        """spark.read.format("synthlog").option("n", N).option("parts", P)."""

        @classmethod
        def name(cls) -> str:
            return "synthlog"

        def schema(self) -> str:
            return "id long, grp long, val long"

        def reader(self, schema) -> SynthLogReader:
            return SynthLogReader(self.options)

    return SynthLogSource


_REGISTERED: set[str] = set()


def register_synthlog(spark: SparkSession) -> None:
    """Register the source once per SparkSession (idempotent)."""
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(_make_source())
        _REGISTERED.add(app)


def _make_sink():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class TallyCommit(WriterCommitMessage):
        def __init__(self, path: str, final_path: str, rows: int) -> None:
            self.path = path          # temp file the task wrote
            self.final_path = final_path  # name it gets at commit()
            self.rows = rows

    class TallyWriter(DataSourceWriter):
        """Per-partition JSONL writer with a commit manifest — the
        minimal two-phase-commit shape of the DataSourceWriter API:
        executors write TEMP files under ``_tmp/`` and return commit
        messages; the driver's commit() swaps them into place,
        removes stale parts from the previous commit, and publishes
        the manifest LAST — so a failed overwrite never destroys the
        previously committed output, and the old manifest stays
        valid until the new job commits (abort() deletes only the
        temp files)."""

        def __init__(self, options: dict, overwrite: bool) -> None:
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            tmpdir = f"{self.path}/_tmp"
            os.makedirs(tmpdir, exist_ok=True)
            final = f"{self.path}/part-{pid:05d}.jsonl"
            fp = f"{tmpdir}/part-{pid:05d}.jsonl"
            n = 0
            with open(fp, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            return TallyCommit(fp, final, n)

        def commit(self, messages):
            import glob as _glob
            import json
            import os

            # 1) swap new parts into place (os.replace is atomic per
            #    file and overwrites same-named old parts)
            new_finals = set()
            for m in messages:
                os.replace(m.path, m.final_path)
                new_finals.add(m.final_path)
            # 2) drop stale parts from a previous commit with more
            #    partitions than this one
            for old in _glob.glob(f"{self.path}/part-*.jsonl"):
                if old not in new_finals:
                    os.remove(old)
            # 3) publish the manifest last — the commit point
            with open(f"{self.path}/_MANIFEST.json", "w") as fh:
                fh.write(
                    json.dumps(
                        {
                            "files": len(messages),
                            "rows": sum(m.rows for m in messages),
                        }
                    )
                )
            try:
                os.rmdir(f"{self.path}/_tmp")
            except OSError:
                pass  # another attempt's temp files may remain

        def abort(self, messages):
            # Failed job: remove only the TEMP files this attempt
            # wrote — the previously committed part files and
            # manifest remain intact and consistent (the manifest is
            # the authoritative commit marker).
            import os

            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            try:
                os.rmdir(f"{self.path}/_tmp")
            except OSError:
                pass

    class TallySink(DataSource):
        """df.write.format("tallysink").option("path", p).save()."""

        @classmethod
        def name(cls) -> str:
            return "tallysink"

        def writer(self, schema, overwrite):
            if not overwrite:
                # Append would silently interleave with prior part
                # files under the glob readers use; only overwrite
                # has well-defined semantics for this sink.
                raise ValueError("tallysink supports mode('overwrite') only")
            # No eager deletion here: the previous commit's output
            # stays readable until commit() swaps in the new files.
            return TallyWriter(self.options, overwrite)

    return TallySink


def register_tallysink(spark: SparkSession) -> None:
    """Register the sink once per SparkSession (idempotent)."""
    app = "sink:" + spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(_make_sink())
        _REGISTERED.add(app)


def _make_tickstream():
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class TickStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked bounded tick generator: offsets are row
        indices, each micro-batch advances by ``chunk`` until ``n``
        — the replayable-offset contract (readBetweenOffsets
        regenerates any committed range exactly) that makes the
        stream recoverable, demonstrated with pure integer rows an
        oracle can regenerate."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 5000))
            self.chunk = int(options.get("chunk", 1000))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            s = int(start["i"])
            if s >= self.n:
                return (iter(()), {"i": s})
            e = min(s + self.chunk, self.n)
            return (iter([(i,) for i in range(s, e)]), {"i": e})

        def readBetweenOffsets(self, start, end):
            return iter(
                [(i,) for i in range(int(start["i"]), int(end["i"]))]
            )

    class TickStream(DataSource):
        @classmethod
        def name(cls) -> str:
            return "tickstream"

        def schema(self) -> str:
            return "i bigint"

        def simpleStreamReader(self, schema):
            return TickStreamReader(self.options)

    return TickStream


def register_tickstream(spark: SparkSession) -> None:
    """Register the streaming source once per SparkSession."""
    app = "tick:" + spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(_make_tickstream())
        _REGISTERED.add(app)
