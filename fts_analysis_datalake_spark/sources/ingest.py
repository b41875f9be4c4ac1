"""Sources / sinks beyond parquet (SURVEY.md §2.1 S2-S5).

The FTS toolkit ingests CSV and JSON-lines monitoring dumps; these
wrappers pin the contract that matters at scale: explicit schemas
(never inference — a schema-inference pass reads the data twice and
can flip types between days), permissive corrupt-row capture, and
partitioned parquet persistence for re-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    """S2: schema-pinned CSV ingest."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """S3: schema-pinned JSON-lines ingest."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """S-extension: schema-pinned ORC ingest (second columnar format;
    same vectorized reader / pushdown machinery as parquet)."""
    return spark.read.schema(schema).orc(path)


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """S4: partitioned parquet sink — the layout that makes the 100 TB
    re-read cheap (partition pruning on the partition columns; row-
    group statistics prune within files)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S7: whole-file binary ingest (``binaryFile`` source) — the entry
    point for multimodal corpora stored as loose files (images/audio):
    one row per file with (path, modificationTime, length, content).

    Scale note: files are assigned to tasks by size-packed bins
    (maxPartitionBytes), so millions of small blobs parallelize
    without a manifest; content is the raw bytes column the
    operators/multimodal.py mapInPandas stages consume.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
