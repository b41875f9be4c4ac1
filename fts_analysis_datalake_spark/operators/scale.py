"""Scale-technique operators (SURVEY.md §4 shuffle/partitioning rows):
bucketed co-located joins and salting for skewed keys.

These are the two techniques the 100 TB story needs that are *layout
decisions*, not query rewrites:

- **Bucketing** pre-shuffles a table ONCE at write time
  (``bucketBy(n, key)`` + ``saveAsTable``). Every later equi-join or
  aggregation on the bucket key reads co-located partitions and
  skips its shuffle entirely — the plan shows SortMergeJoin with no
  Exchange on the bucketed sides (asserted in tests/test_scale.py).
- **Salting** splits a hot key across ``salts`` sub-keys so one
  reducer doesn't own the whole key. AQE's skew-join splitting
  handles most join skew post-hoc; explicit salting remains the tool
  for skewed *aggregations* and for engines/stages AQE can't touch.
  The salt is derived deterministically (xxhash64), never a RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int,
    path: str,
    sort_key: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed external table (idempotent: no-op
    if the table already exists in this session's catalog).

    Bucket metadata lives in the session catalog; readers get the
    shuffle-free join only via ``spark.table(table)`` (a raw parquet
    read of the same files has no bucket info).
    """
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        return
    w = df.write.bucketBy(num_buckets, bucket_key)
    if sort_key is not None:
        w = w.sortBy(sort_key)
    w.option("path", path).mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — both sides
    read pre-shuffled, so the join plans with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, Column],
    salts: int = 16,
    salt_src: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate
    on (keys + salt), final aggregate on keys.

    ``agg_cols`` maps output name -> a SUM-decomposable partial
    aggregate expression (count via ``F.count`` works too: the final
    phase sums partial counts). NOT for count-distinct/percentiles —
    those aren't sum-decomposable across salt buckets (a value can
    land in several buckets). With a handful of hot keys — e.g.
    five event types across 100 TB of events — the plain groupBy
    sends each key's every partial row to one reducer; salting fans
    the partials across ``salts`` reducers first.

    Spark's own map-side partial aggregation already does this
    two-phase split for SUM/COUNT — the explicit form exists for
    partial-aggregable computations composed of several steps and as
    the documented skew pattern; it returns bit-identical results to
    the plain groupBy for integer/count aggregates (asserted in
    tests/test_scale.py).
    """
    salt = F.pmod(
        F.xxhash64(F.struct(*df.columns)) if salt_src is None else salt_src, F.lit(salts)
    ).alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in agg_cols.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in agg_cols]
    )


_BLOOM_BITS = 2048  # 32 longs; sized for dim keysets up to ~300 at 1% fp
_BLOOM_SLOTS = _BLOOM_BITS // 64
_BLOOM_HASHES = 3


def _bloom_positions(key: Column) -> list[Column]:
    """k independent bit positions for ``key`` via seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_HASHES)
    ]


def bloom_build(dim_keys: DataFrame, key: str) -> DataFrame:
    """Aggregate a dim-side key column into ONE row holding a Bloom
    filter as ``array<long>`` (column ``bloom``).

    Each key contributes k=3 bits; per-slot ``bit_or`` partials merge
    map-side, so the whole build is one scan + a 32-long single-row
    reduce — no collect(), no driver round-trip. The row is meant to
    be broadcast (crossJoin) onto the fact side by
    :func:`bloom_prefilter`.
    """
    pos = (
        dim_keys.select(
            F.explode(F.array(*_bloom_positions(F.col(key)))).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("int").alias("slot"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("bit"),
        )
    )
    return pos.groupBy().agg(
        F.array(
            *[
                F.coalesce(
                    F.bit_or(F.when(F.col("slot") == s, F.col("bit"))), F.lit(0).cast("long")
                )
                for s in range(_BLOOM_SLOTS)
            ]
        ).alias("bloom")
    )


def bloom_prefilter(fact: DataFrame, key: str, bloom_row: DataFrame) -> DataFrame:
    """Keep only fact rows whose ``key`` MIGHT be in the Bloom filter
    (false positives possible, false negatives impossible) — the
    100 TB semi-join pattern: the 256-byte filter rides broadcast to
    every scan task and kills non-matching rows *before* any shuffle
    or join; an exact semi-join afterwards only sees survivors.
    """
    membership = None
    for p in _bloom_positions(F.col(key)):
        slot = (p / 64).cast("int")
        test = (
            F.element_at(F.col("_bloom"), slot + 1).bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
            )
            != 0
        )
        membership = test if membership is None else (membership & test)
    return (
        fact.crossJoin(F.broadcast(bloom_row.withColumnRenamed("bloom", "_bloom")))
        .where(membership)
        .drop("_bloom")
    )


def son_candidates(items: DataFrame, item_col: str, support_frac: float) -> DataFrame:
    """Phase 1 of SON (Savasere-Omiecinski-Navathe) exact frequent
    items: per-PARTITION counting with the support fraction applied
    locally, emitting the distinct candidate set.

    Guarantee (pigeonhole over fractions): any item with global
    frequency >= support_frac * total must reach that fraction in at
    least one partition, so the union of local frequents is a strict
    superset of the global frequents — phase 2 only recounts this
    (small) candidate set. No shuffle touches the raw item stream;
    the only exchange carries candidates.
    """
    import pandas as pd

    def _local_frequents(batches):
        counts: dict = {}
        total = 0
        for pdf in batches:
            total += len(pdf)
            for item, n in pdf[item_col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(n)
        cut = support_frac * total
        yield pd.DataFrame({item_col: [i for i, n in counts.items() if n >= cut]})

    schema = items.select(item_col).schema
    return items.select(item_col).mapInPandas(_local_frequents, schema).distinct()


def salted_equi_join(
    left: DataFrame, right: DataFrame, on: str, salts: int = 8, salt_src: Column | None = None
) -> DataFrame:
    """Equi-join with the left (skewed, large) side salted and the
    right side replicated ``salts``× via an exploded salt sequence —
    each (key, salt) pair becomes its own join bucket. Result is
    row-identical to the plain join.

    Use when a hot key would pin one task: the replicated right side
    costs salts× its size, so keep ``right`` the smaller input (but
    too big / too dynamic to broadcast, else just broadcast)."""
    salt = F.pmod(
        F.xxhash64(F.struct(*left.columns)) if salt_src is None else salt_src, F.lit(salts)
    ).cast("int")
    l_ = left.withColumn("_salt", salt)
    r_ = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return l_.join(r_, [on, "_salt"]).drop("_salt")


def _morton_spread16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` to even bit positions (Morton
    encoding half): 0b1111 -> 0b01010101. Pure bitwise Catalyst
    expressions — codegen'd, no UDF."""
    x = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def normalize16(c: Column, cmax: Column) -> Column:
    """Scale a non-negative int column onto the full 16-bit domain.
    Z-order REQUIRES same-width dimensions: un-normalized, the wider
    dimension's high bits own the top of every Morton key and the
    narrow dimension never influences file boundaries."""
    return F.floor(c.cast("double") * 65535 / cmax).cast("long")


def zorder_key(a: Column, b: Column) -> Column:
    """Z-order (Morton) interleave of two 16-bit-truncated int columns
    into one 32-bit sort key. Sorting/range-partitioning a table by
    this key clusters rows so that BOTH dimensions are locally dense
    in every file — per-file min/max footers then prune 2-D box
    predicates, where a linear sort clusters only its leading column.
    This is the layout move (Delta/Iceberg OPTIMIZE ZORDER BY) that
    costs one shuffle at write time and pays back on every selective
    read of a 100 TB table."""
    return _morton_spread16(a).bitwiseOR(F.shiftleft(_morton_spread16(b), 1))


def file_minmax_stats(df_with_file: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max envelope for ``cols`` from an already-written
    dataset read back with ``input_file_name()`` attached — the
    queryable stand-in for parquet footer stats, used to audit how
    many files a box predicate could skip."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df_with_file.groupBy("_file").agg(*aggs)


_CMS_WIDTH = 1024
_CMS_DEPTH = 4


def cms_build(items: DataFrame, item_col: str) -> DataFrame:
    """Count-min sketch of an item stream as a (depth x width) counts
    table — ~4k rows regardless of stream size. One scan: each item
    lands in one bucket per hash row (seeded xxhash64), partial
    counts combine map-side. The sketch is MERGEABLE (sum counts
    cell-wise across batches/days) — the frequency-sketch sibling of
    the HLL cardinality rollup (E17)."""
    # ONE scan: each item explodes into its depth (d, bucket) cells —
    # a 4-way union of selects would re-read the input per depth row.
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col(item_col), F.lit(d)), F.lit(_CMS_WIDTH)
                        ).alias("bucket"),
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.bucket")
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str) -> DataFrame:
    """Point-frequency estimates for ``probes`` from a built sketch:
    min over the depth rows of each probe's bucket count. Guaranteed
    an OVERestimate (never under — asserted in tests/test_approx.py);
    error shrinks with width. The probe fan-out (|probes| x depth) is
    tiny and the sketch side broadcasts."""
    fan = probes.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])).alias("d"),
    ).select(
        item_col,
        "d",
        F.pmod(F.xxhash64(F.col(item_col), F.col("d")), F.lit(_CMS_WIDTH)).alias(
            "bucket"
        ),
    )
    return (
        fan.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_count"))
    )
