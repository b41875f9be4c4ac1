"""Similarity-search operators over embedding columns (SURVEY.md
§2.10 D5-D7 + ANN extension).

- brute-force cosine top-k: the 100 TB-honest baseline — a single
  scan + per-row built-in vector math + TakeOrderedAndProject (no
  global sort materializes);
- label-blocked all-pairs: bounded self-join for near-dup mining;
- IVF (inverted-file) bucketed ANN: the scale path — assign every
  vector to its nearest coarse centroid once (broadcast centroids,
  argmin over an array fold), then probe only the nprobe nearest
  buckets per query. At 1000 executors the probe touches
  nprobe/ncentroids of the data instead of all of it.

All distance math uses functions/vector.py built-ins (no UDFs in the
hot path); a pandas-UDF cosine twin exists as the X1 surface demo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.functions.vector import cosine, dot, norm


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("float") for x in vec])


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force top-k by cosine to a literal query vector.

    orderBy+limit compiles to TakeOrderedAndProject: per-partition
    heap of k, then a k*partitions merge on the driver side of the
    exchange — no full sort, no full shuffle."""
    cos = cosine(F.col(vec_col), _vec_lit(query_vec))
    return (
        emb.select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def allpairs_above_threshold(
    emb: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, blocked by ``block_col`` so
    the self-join is an equi hash join per block, not a cartesian."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col(block_col).alias("blk")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col(block_col).alias("blk")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("blk", "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF bucketed ANN
# --------------------------------------------------------------------------


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast join +
    per-row argmax via row_number over the tiny centroid fan-out)."""
    from pyspark.sql import Window

    joined = emb.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cent_id),
        cosine(F.col(vec_col), F.col(cent_vec)).alias("cent_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cent_cos").desc(), F.col(cent_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, cent_id)
    )


def deterministic_centroids(
    emb: DataFrame, every: int = 53, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Seed centroids deterministically (every Nth vector) — a stand-in
    for a k-means fit; the IVF plumbing is identical either way."""
    return emb.filter((F.col(id_col) % every) == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    nprobe: int = 3,
    every: int = 53,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe only the ``nprobe`` centroids nearest the
    query, scan only their buckets. Recall vs brute force is checked
    by tests/test_similarity.py."""
    cents = deterministic_centroids(emb, every, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    probe = (
        cents.select("cent_id", cosine(F.col("cent_vec"), _vec_lit(query_vec)).alias("qc"))
        .orderBy(F.col("qc").desc(), F.col("cent_id"))
        .limit(nprobe)
        .select("cent_id")
    )
    return (
        assigned.join(F.broadcast(probe), "cent_id")
        .select(F.col(id_col), cosine(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# SRP-LSH bucketed ANN (random-hyperplane signatures, multiprobe)
# --------------------------------------------------------------------------


def _srp_planes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed — index build and
    query probe MUST agree on the planes at any scale)."""
    return np.random.RandomState(seed).standard_normal((bits, dim))


def srp_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Pack sign(v·h_i) bits into an int bucket id — pure Catalyst
    folds (one zip_with/aggregate per plane), no UDF."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = dot(vec_col, _vec_lit([float(x) for x in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _probe_buckets(query_vec: list[float], planes: np.ndarray, radius: int) -> list[int]:
    """Query bucket + every bucket within Hamming ``radius`` —
    computed driver-side with numpy (no Spark job: the planes and the
    query vector are both local)."""
    from itertools import combinations

    q = np.asarray(query_vec, dtype=np.float64)
    base = sum(1 << i for i, plane in enumerate(planes) if float(plane @ q) > 0)
    out = [base]
    for r in range(1, radius + 1):
        for flips in combinations(range(len(planes)), r):
            b = base
            for i in flips:
                b ^= 1 << i
            out.append(b)
    return out


def srp_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    bits: int = 8,
    radius: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via sign-random-projection LSH: every vector gets an
    ``bits``-bit bucket once (a map-side projection — at 100 TB this
    is the precomputed index column you'd persist); the query scans
    only buckets within Hamming ``radius`` of its own bucket.

    With bits=8, radius=3 the probe covers ~36% of bucket space —
    comparable data touched to IVF nprobe=3/10 but with NO training
    pass (no centroids); recall vs brute force is property-tested in
    tests/test_similarity.py. The bucket filter is an IN-list on a
    computed column, so Catalyst evaluates it map-side with no
    shuffle before the final top-k."""
    planes = _srp_planes(64, bits)
    probes = _probe_buckets(query_vec, planes, radius)
    return (
        emb.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
        .filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (banded SRP-LSH, global —
# the embedding-space analogue of dedup.near_dup_pairs' MinHash banding)
# --------------------------------------------------------------------------


def embedding_near_dups(
    emb: DataFrame,
    threshold: float,
    bands: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs with cosine >= ``threshold``, found via banded
    sign-random-projection LSH — no label blocking, no all-pairs.

    Index build (map-side, once per vector): ``bands * band_bits``
    hyperplane sign bits, packed into one small int bucket per band.
    Candidate generation: posexplode the band buckets and self-join on
    ``(band_idx, bucket)`` — vectors agreeing on ANY band meet; the
    join is a bucketed equi hash join exactly like the MinHash LSH
    path (operators/dedup.py), so at 100 TB the cost is per-bucket
    group sizes, never n². Verification: exact Catalyst cosine on the
    deduplicated candidates only.

    Recall is probabilistic: a pair at cosine c collides per band with
    p = (1 - arccos(c)/pi)^band_bits, overall 1-(1-p)^bands (~0.96
    for c=0.45 at the defaults). Precision is exact (=1) because every
    emitted pair passed the exact cosine filter — property-tested
    against numpy brute force in tests/test_similarity.py. Declared
    rows-only for the same reason as MinHash-LSH (D3): the banding is
    not SQL-expressible in the oracle dialect.
    """
    planes = _srp_planes(64, bands * band_bits)
    band_cols = []
    for j in range(bands):
        bucket = F.lit(0)
        for i in range(band_bits):
            d = dot(F.col(vec_col), _vec_lit([float(x) for x in planes[j * band_bits + i]]))
            bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
        band_cols.append(bucket)
    banded = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_bucket"),
    ).persist()  # reused by both join sides; see dedup.near_dup_pairs lifecycle note
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "band_idx", "band_bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "band_idx", "band_bucket"
    )
    candidates = (
        a.join(b, ["band_idx", "band_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])  # same pair may meet in several bands
    )
    return candidates.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


# --------------------------------------------------------------------------
# X1: pandas-UDF cosine twin (UDF surface demo; built-in is the hot path)
# --------------------------------------------------------------------------


def cosine_pandas_udf(query_vec: list[float]):
    """Arrow-batched scalar pandas UDF computing cosine to a fixed
    query — numpy dot over the batch. ~10-100x faster than row-at-a-
    time Python UDFs; still slower than the built-in fold, which is
    why the engine defaults to functions/vector.py."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def cos_udf(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # float32 accumulation loses ~1e-7
        return pd.Series((m @ q) / (np.linalg.norm(m, axis=1) * qn))

    return cos_udf
