"""Sanity bound for the oracle-less approximate-distinct query (A4):
the HLL estimate must sit within 5x the configured rsd of the exact
count (a generous bound; rsd=0.02)."""

from __future__ import annotations

from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()


def test_approx_distinct_within_bound(spark, duck):
    df = REGISTRY["q_approx_distinct_parts"].fn(spark, SF_DIR).toPandas()
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert len(df) == len(exact)
    for _, row in df.iterrows():
        e = exact[row["l_returnflag"]]
        assert abs(row["approx_parts"] - e) / e <= 0.10, (row["l_returnflag"], row["approx_parts"], e)
