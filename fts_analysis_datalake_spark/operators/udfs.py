"""UDF / UDAF / UDTF surface (SURVEY.md §2.11 X1-X4).

Policy: built-in Catalyst expressions everywhere a built-in can
express the semantics (UDFs are optimizer barriers and 10-100x slower
than codegen); this module holds the vectorized-Python surface for
the cases that genuinely need imperative per-group logic — model
fits, robust statistics — plus the UDTF generator form.

X1 (scalar pandas UDF) lives in operators/similarity.py (cosine) and
operators/dedup.py (SimHash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SLOPE_SCHEMA = "user_id long, n long, slope double, intercept double"


# Fixed epoch base subtracted from x before moment sums so x^2 stays
# small enough that the closed-form normal equations don't cancel
# (raw epoch-seconds squared ~3e18 eats the double mantissa).
_TREND_EPOCH_BASE = 1_704_067_200  # 2024-01-01T00:00:00Z


def per_user_value_trend(df: DataFrame, min_points: int = 2) -> DataFrame:
    """X2 grouped-map (applyInPandas): per-user OLS fit of value over
    time — the per-link model-fit pattern.

    Two-stage shape (the E54/E109 recipe): the per-event moment sums
    (n, Sx, Sy, Sxx, Sxy, min x) are aggregated JVM-side in ONE
    codegen'd hash aggregate — map-side partials combine, so the
    shuffle and the Arrow transfer carry six numbers per user instead
    of every event row — and the pandas stage fits each user from its
    moments. The fit itself stays in applyInPandas (the declared X2
    surface; per-entity fits that need the raw series — robust
    regression, changepoints — drop into the same spot). Wall-clock
    is bounded by users, not events: at 100x the events volume the
    Python boundary cost is unchanged.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is shift-invariant, and
    the intercept is reported in the per-user x-min frame (x' =
    x - min(x)): intercept = ybar - slope*(xbar - min_x) — same
    contract as the raw-series polyfit implementation this replaced.

    The grouped-map runs over coarse user BUCKETS (user_id % 64),
    not raw user_ids: applyInPandas invokes the Python fn once per
    group, and one-row-per-user groups made the call overhead the
    whole runtime (~7500 calls ~ 8 s at sf0.1). 64 buckets x a
    vectorized numpy fit over every user in the bucket keeps the
    declared X2 surface and makes the Python cost O(buckets).
    """
    x = F.col("ts").cast("double") - F.lit(float(_TREND_EPOCH_BASE))
    y = F.col("value")
    moments = (
        df.select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.min("x").alias("minx"),
        )
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n"].to_numpy(dtype=np.float64)
        sx = pdf["sx"].to_numpy(dtype=np.float64)
        sy = pdf["sy"].to_numpy(dtype=np.float64)
        sxx = pdf["sxx"].to_numpy(dtype=np.float64)
        sxy = pdf["sxy"].to_numpy(dtype=np.float64)
        minx = pdf["minx"].to_numpy(dtype=np.float64)
        denom = n * sxx - sx * sx
        small = (pdf["n"].to_numpy() < min_points) | (denom == 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(small, 0.0, (n * sxy - sx * sy) / denom)
            intercept = np.where(
                small, sy / n, sy / n - slope * (sx / n - minx)
            )
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].astype("int64"),
                "n": pdf["n"].astype("int64"),
                "slope": slope,
                "intercept": intercept,
            }
        )

    return (
        moments.withColumn("_bkt", F.col("user_id") % 64)
        .groupBy("_bkt")
        .applyInPandas(_fit, SLOPE_SCHEMA)
    )


def mad_udaf():
    """X3 grouped-agg pandas UDAF: median absolute deviation — a
    robust dispersion measure with no built-in Catalyst equivalent.

    Factory (not a module-level decorator): @pandas_udf parses its
    DDL return type eagerly and needs an active SparkSession."""

    @pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        med = v.median()
        return float((v - med).abs().median())

    return _mad


def token_positions_udtf(spark):
    """X4 Python UDTF: one row -> many (token, position) rows.

    The explode-based twin (q_normalize_tokenize etc.) is the fast
    path; the UDTF form exists for generators that need imperative
    state per input row.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class TokenPositions:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split()):
                    if tok:
                        yield tok, i

    return TokenPositions
