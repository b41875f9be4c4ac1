"""Warehouse lifecycle operators: CDC merge/upsert and SCD2 history
(SURVEY.md §2.12 E12/E13).

The reference-style toolkit maintains mutable entity tables fed by
change batches; on Spark that is MERGE semantics without a table
format: resolve (base ∪ changes) by key with change-wins priority.

Scale notes:

- ``merge_upsert`` is ONE shuffle (window over the key), no join —
  at 100 TB the union streams both inputs through the same hash
  partitioning; a full-outer-join formulation would shuffle both
  sides AND build a hash table per partition.
- ``scd2_history`` is one window shuffle on the entity key; interval
  construction (lead + change-collapse) is computed inside the same
  sorted partition pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Change-batch op column convention: 'U' = insert-or-update (upsert),
# 'D' = delete. Base rows carry no op column.
OP_COL = "_op"


def merge_upsert(base: DataFrame, changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Apply a CDC change batch to a base snapshot: change rows win
    over base rows per key; op='D' tombstones drop the key entirely.

    ``changes`` must have the base columns plus ``_op`` and at most
    one row per key (the usual compacted-change-batch contract; with
    multiple change rows per key the survivor would be arbitrary).
    Implemented as union + per-key priority window — one shuffle,
    no join, no driver-side state.
    """
    tagged_base = base.withColumn(OP_COL, F.lit("U")).withColumn("_src", F.lit(0))
    tagged_changes = changes.withColumn("_src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(F.col("_src").desc())
    return (
        tagged_base.unionByName(tagged_changes)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(OP_COL) != "D"))
        .drop(OP_COL, "_src", "_rn")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event stream:
    one validity interval per (key, attribute-run) — a new interval
    opens when the attribute CHANGES (consecutive duplicates collapse
    into the open interval), closes when the next change arrives;
    the latest interval per key has valid_to NULL / is_current true.

    ``tiebreak_col`` must make (key, ts, tiebreak) unique so the
    change sequence is total-ordered (FIXTURES.md determinism notes).
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return changes.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
