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


def per_user_value_trend(df: DataFrame, min_points: int = 2) -> DataFrame:
    """X2 grouped-map (applyInPandas): per-user OLS fit of value over
    time — the per-link model-fit pattern (each group becomes one
    pandas frame on one executor; groups must fit in memory, which is
    exactly the right contract for per-entity model fitting)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = int(pdf["user_id"].iloc[0])
        n = len(pdf)
        if n < min_points:
            return pd.DataFrame(
                {"user_id": [uid], "n": [n], "slope": [0.0], "intercept": [float(pdf["value"].mean())]}
            )
        x = pdf["ts"].astype("int64").to_numpy(dtype=np.float64) / 1e9
        x = x - x.min()
        y = pdf["value"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        return pd.DataFrame(
            {"user_id": [uid], "n": [n], "slope": [float(slope)], "intercept": [float(intercept)]}
        )

    return df.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(_fit, SLOPE_SCHEMA)


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
