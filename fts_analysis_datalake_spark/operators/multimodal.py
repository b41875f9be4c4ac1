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


RESIZE_SCHEMA = "doc_id long, width int, height int, rs_width int, rs_height int"


def resize_media(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """'Resize' decoded media via mapInPandas: cap the longer side at
    ``max_side`` preserving aspect ratio (integer floor), pass-through
    when already small.

    FAKE KERNEL: the arithmetic is what a thumbnailer computes; the
    pixel work (PIL ``Image.resize``) is absent from this container —
    swap the body, keep the schema/batching contract. The numbers
    being pure arithmetic is deliberate: the DuckDB oracle reproduces
    them, so the mapInPandas round-trip itself is value-verified.
    """

    def _resize_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            long_side = w.where(w >= h, h)
            scale_num = pd.Series([max_side] * len(pdf), dtype="int64")
            needs = long_side > max_side
            rs_w = w.where(~needs, (w * scale_num) // long_side)
            rs_h = h.where(~needs, (h * scale_num) // long_side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "rs_width": rs_w.astype("int32"),
                    "rs_height": rs_h.astype("int32"),
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(_resize_batch, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum string"


def frame_sample(df: DataFrame, every_n: int = 3) -> DataFrame:
    """'Sample frames' from video-like payloads via mapInPandas with
    row fan-out (each input row yields 1..k frame rows) — the
    one-to-many shape real frame extraction has.

    FAKE KERNEL: frame count is derived from the byte length
    (n_bytes % 7 + 1 'frames', every ``every_n``-th sampled) and the
    frame 'checksum' hashes payload bytes + index; a real
    implementation replaces the body with ffmpeg frame decode.
    Deterministic arithmetic keeps it oracle-reproducible.
    """

    def _sample_batch(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out_id, out_idx, out_ck = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) % 7 + 1
                for i in range(0, n_frames, every_n):
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_ck.append(hashlib.md5(b + str(i).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_checksum": pd.Series(out_ck, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_sample_batch, FRAME_SCHEMA)


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
