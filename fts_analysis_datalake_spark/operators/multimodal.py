"""Multimodal-column operators (SURVEY.md §2.10 D14 + driver brief):
treat image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic FAKE (it derives pseudo-dimensions and a
checksum from the bytes). Everything around it — schema contract,
batch iteration, partition-preserving plumbing, column pruning — is
the real 100 TB shape: payloads never leave the executor, Python sees
Arrow batches, output schema is declared up front so Catalyst can
plan downstream ops.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, checksum string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column from text (stand-in
    for real image/audio bytes) + typed metadata columns."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).alias("orig_size"),
        ).alias("media_meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """'Decode' binary payloads via mapInPandas.

    FAKE DECODE: real decoders (PIL/ffmpeg/soundfile) are not in this
    container. Dimensions are derived deterministically from the byte
    length and the checksum is md5 — replace ``_fake_decode_batch``
    with a real codec call to productionize; the Spark-side contract
    (schema, Arrow batching, per-partition execution) is unchanged.
    """

    def _fake_decode_batch(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int32"),
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "checksum": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_fake_decode_batch, DECODE_SCHEMA)


def bundle_multimodal(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """D14: one row per document bundling text, embedding and typed
    metadata in a struct column (documents ⋈ embeddings on id)."""
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            F.struct(
                F.col("text"),
                F.col("lang"),
                F.col("source"),
                F.col("embedding"),
                F.col("label"),
            ).alias("m"),
        )
    )
