"""Window-function operators (SURVEY.md §2.5 W1-W8).

All are single-shuffle patterns: one hash partition on the window key,
per-partition sort, no global sort — the shape that scales to 100 TB
(skewed window keys are the one hazard; AQE skew handling applies to
the exchange, and extremely hot keys would get a two-level rollup).

Determinism rules baked in:
- every window order includes a unique tiebreaker column;
- windowed sums over noisy doubles use integer-scaled values, because
  engines may combine frames in different orders (segment trees vs
  sequential accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(partition_by: list[str], order_by: list[Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_prev_gap_seconds(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_col: str = "gap_s",
) -> DataFrame:
    """lag-based inter-event gap in whole seconds (W3) — the FTS
    retry-gap / inter-transfer-delta computation. Integer epoch math
    keeps it exact."""
    w = ordered_window([user_col], [F.col(ts_col), F.col(tiebreak_col)])
    prev_ts = F.lag(ts_col).over(w)
    return df.withColumn(
        gap_col, (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)).cast("bigint")
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-and-island sessionization (W8): a new session starts when
    the gap to the previous event exceeds ``gap_seconds``; the session
    id is the running count of session starts per user.

    Batch form of the streaming session window (§2.9 T3) — the same
    logic under Structured Streaming is ``F.session_window``; this
    batch twin is the oracle-checkable one.
    """
    w = ordered_window([user_col], [F.col(ts_col), F.col(tiebreak_col)])
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def running_scaled_sum(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    order_by: list[Column],
    scale: int = 2,
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum (W4) of a noisy-double column, deterministic via
    integer scaling (frame-combine order then cannot matter)."""
    m = 10**scale
    w = ordered_window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    scaled = F.floor(F.col(value_col) * m + F.lit(0.5))
    return df.withColumn(alias, F.sum(scaled).over(w) / float(m))
