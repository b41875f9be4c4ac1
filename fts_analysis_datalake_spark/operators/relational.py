"""Core relational operators (SURVEY.md §2.2-§2.7).

Reusable DF->DF building blocks. Each stays fully declarative so
Catalyst keeps predicate pushdown / column pruning / join planning;
none of these force a materialization or touch the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number (SURVEY §2.6 O3).

    Never a global sort: the window sorts within each hash-partitioned
    group, so at 100 TB this is one shuffle on ``partition_by`` and a
    per-partition sort — the scalable top-k pattern. ``order_by`` must
    be a total order (include a unique key suffix) for deterministic
    results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def time_bucket(df: DataFrame, ts_col: str, granularity: str, alias: str = "bucket") -> DataFrame:
    """Truncate a timestamp column to hour/day/week/month buckets
    (SURVEY §2.8 F4 — the FTS per-hour/per-day grouping key)."""
    return df.withColumn(alias, F.date_trunc(granularity, F.col(ts_col)))


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """SELECT DISTINCT (SURVEY §2.4 A10). For keyed dedup with a
    deterministic survivor use :func:`dedup_keyed`."""
    return df.distinct() if subset is None else df.select(*subset).distinct()


def dedup_keyed(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Keep exactly one row per key, deterministic survivor chosen by
    ``order_by`` (SURVEY §2.10 D2). ``dropDuplicates`` picks an
    arbitrary survivor — never use it where results are checked."""
    return top_k_per_group(df, keys, order_by, k=1)
