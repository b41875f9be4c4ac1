"""Sanity tests for the UDF surface (SURVEY.md §2.11): grouped-map
trend fit, grouped-agg MAD, UDTF generator.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fts_analysis_datalake_spark.operators.udfs import mad_udaf, per_user_value_trend


def test_trend_udf_recovers_known_slope(spark):
    # y = 2*t + 5 exactly -> slope 2, intercept 5.
    rows = [(1, f"2024-01-01 00:00:{s:02d}", 2.0 * s + 5.0) for s in range(10)]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = per_user_value_trend(df).collect()
    assert len(out) == 1
    assert math.isclose(out[0].slope, 2.0, abs_tol=1e-9)
    assert math.isclose(out[0].intercept, 5.0, abs_tol=1e-9)


def test_mad_udaf_known_value(spark):
    # values 1..7 => median 4, |x-4| = 3,2,1,0,1,2,3 => MAD 2.
    df = spark.createDataFrame([(1, float(v)) for v in range(1, 8)], "k long, v double")
    out = df.groupBy("k").agg(mad_udaf()(F.col("v")).alias("mad")).collect()
    assert out[0].mad == 2.0


def test_udtf_token_positions(spark):
    from fts_analysis_datalake_spark.operators.udfs import token_positions_udtf

    TokenPositions = token_positions_udtf(spark)
    spark.udtf.register("tp_test", TokenPositions)
    rows = spark.sql("SELECT * FROM tp_test('a b c')").collect()
    assert [(r.token, r.pos) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]


def test_holt_forecast_deterministic_and_sane(spark):
    """The Holt recursion must be reproducible run-to-run (no RNG,
    stable group order inside the pandas stage) and produce finite
    forecasts consistent with the fitted level/trend."""
    import math

    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR_SMALL

    _load_all()
    fn = REGISTRY["q_holt_forecast_hourly"].fn
    a = {r.event_type: r for r in fn(spark, SF_DIR_SMALL).collect()}
    b = {r.event_type: r for r in fn(spark, SF_DIR_SMALL).collect()}
    assert a.keys() == b.keys() and len(a) >= 3
    for t in a:
        ra, rb = a[t], b[t]
        assert ra == rb, (ra, rb)
        for v in (ra.level, ra.trend, ra.f1, ra.f2, ra.f3, ra.mae):
            assert math.isfinite(v)
        assert abs(ra.f1 - (ra.level + ra.trend)) < 1e-9
        assert ra.mae >= 0


def test_arrow_norms_match_catalyst_norm(spark):
    """The Arrow batch kernel and the Catalyst higher-order fold must
    agree on every vector's L2 norm (to float-reassociation noise)."""
    from pyspark.sql import functions as F

    from fts_analysis_datalake_spark.catalog import load_table
    from fts_analysis_datalake_spark.functions.vector import norm
    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR_SMALL

    _load_all()
    arrow = REGISTRY["q_embedding_norms_arrow"].fn(spark, SF_DIR_SMALL)
    cat = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", norm(F.col("embedding")).alias("cat_norm")
    )
    joined = arrow.join(cat, "vec_id")
    bad = joined.where(
        F.abs(F.col("l2_norm") - F.col("cat_norm")) > 1e-4
    ).count()
    assert bad == 0
    assert joined.count() > 0


def test_feature_hashed_vectors_properties(spark):
    """Hashing-trick vectors: fixed dimension, deterministic across
    runs, unit-normalized when non-empty, nnz bounded by dim."""
    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR_SMALL

    _load_all()
    fn = REGISTRY["q_feature_hashed_vectors"].fn
    a = {r.doc_id: r for r in fn(spark, SF_DIR_SMALL).collect()}
    b = {r.doc_id: r for r in fn(spark, SF_DIR_SMALL).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k].unit_vec == b[k].unit_vec
        assert len(a[k].unit_vec) == 64
        assert 0 <= a[k].nnz <= 64
        if a[k].l2_norm > 0:
            s = sum(x * x for x in a[k].unit_vec)
            assert abs(s - 1.0) < 1e-9


def test_isotonic_calibration_properties(spark):
    """E155 PAVA: monotone fitted rates, conserved mass, rates in
    [0,1], and a hand-computed pooling case through the same kernel
    shape (defined locally so cloudpickle ships it by value)."""
    from fts_analysis_datalake_spark.queries.ml_eval import (
        ISO_SCHEMA,
        q_isotonic_calibration,
    )

    out = q_isotonic_calibration(spark, "/root/testdata/sf0.01").toPandas()
    assert len(out) > 0
    for et, g in out.groupby("event_type"):
        g = g.sort_values("x_lo")
        rates = list(g["fitted_rate"])
        assert rates == sorted(rates), f"{et}: fitted rates not monotone"
        assert all(0.0 <= r <= 1.0 for r in rates)
        assert (g["x_lo"] <= g["x_hi"]).all()
    # mass conservation: block ns sum to the event count
    n_events = spark.read.parquet("/root/testdata/sf0.01/events.parquet").count()
    assert int(out["n"].sum()) == n_events

    # hand case: rates (1.0, 0.0) violate monotonicity -> one pooled
    # block at the weighted mean; (0.0, 1.0) stays two blocks.
    def ref_pava(pdf):
        import pandas as pd

        pdf = pdf.sort_values("x").reset_index(drop=True)
        et = pdf["event_type"].iloc[0]
        blocks = []
        for x, n, pos in zip(pdf["x"], pdf["n"], pdf["pos"]):
            blocks.append([float(pos), float(n), float(x), float(x)])
            while (
                len(blocks) > 1
                and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
            ):
                b = blocks.pop()
                blocks[-1][0] += b[0]
                blocks[-1][1] += b[1]
                blocks[-1][3] = b[3]
        return pd.DataFrame(
            {
                "event_type": et,
                "x_lo": [b[2] for b in blocks],
                "x_hi": [b[3] for b in blocks],
                "n": [int(b[1]) for b in blocks],
                "fitted_rate": [b[0] / b[1] for b in blocks],
            }
        )

    df = spark.createDataFrame(
        [("a", 1.0, 2, 2), ("a", 2.0, 2, 0), ("b", 1.0, 2, 0), ("b", 2.0, 2, 2)],
        "event_type string, x double, n long, pos long",
    )
    fitted = (
        df.groupBy("event_type")
        .applyInPandas(ref_pava, ISO_SCHEMA)
        .toPandas()
        .sort_values(["event_type", "x_lo"])
        .reset_index(drop=True)
    )
    a = fitted[fitted.event_type == "a"]
    assert len(a) == 1 and a.iloc[0].fitted_rate == 0.5
    b = fitted[fitted.event_type == "b"]
    assert len(b) == 2 and list(b.fitted_rate) == [0.0, 1.0]
