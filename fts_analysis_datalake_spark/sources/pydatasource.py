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
        def __init__(self, path: str, rows: int) -> None:
            self.path = path
            self.rows = rows

    class TallyWriter(DataSourceWriter):
        """Per-partition JSONL writer with a commit manifest — the
        minimal two-phase-commit shape of the DataSourceWriter API:
        executors write task files and return commit messages; the
        driver's commit() publishes the manifest only after every
        task succeeded, so readers keying on the manifest never see a
        partial write (abort() leaves no manifest)."""

        def __init__(self, options: dict, overwrite: bool) -> None:
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            fp = f"{self.path}/part-{pid:05d}.jsonl"
            n = 0
            with open(fp, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            return TallyCommit(fp, n)

        def commit(self, messages):
            import json

            with open(f"{self.path}/_MANIFEST.json", "w") as fh:
                fh.write(
                    json.dumps(
                        {
                            "files": len(messages),
                            "rows": sum(m.rows for m in messages),
                        }
                    )
                )

        def abort(self, messages):
            # Failed job: remove task files already written so a
            # glob-based reader can never pick up partial output
            # (the manifest is the authoritative commit marker, but
            # leaving stale part-*.jsonl around is a trap for anyone
            # reading the directory directly).
            import os

            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

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
            import glob as _glob
            import os

            path = self.options["path"]
            for stale in _glob.glob(f"{path}/part-*.jsonl") + _glob.glob(
                f"{path}/_MANIFEST.json"
            ):
                os.remove(stale)
            return TallyWriter(self.options, overwrite)

    return TallySink


def register_tallysink(spark: SparkSession) -> None:
    """Register the sink once per SparkSession (idempotent)."""
    app = "sink:" + spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(_make_sink())
        _REGISTERED.add(app)
