"""Sanity bound for the oracle-less approximate-distinct query (A4):
the HLL estimate must sit within 5x the configured rsd of the exact
count (a generous bound; rsd=0.02)."""

from __future__ import annotations

from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()


def test_sample_seeded_deterministic_and_bounded(spark, duck):
    """O4: same seed + same scan partitioning -> identical sample;
    observed fraction within a loose Bernoulli bound of the target."""
    fn = REGISTRY["q_sample_lineitem"].fn
    a = fn(spark, SF_DIR).toPandas()
    b = fn(spark, SF_DIR).toPandas()
    assert len(a) == len(b)
    assert a.sort_values(list(a.columns)).reset_index(drop=True).equals(
        b.sort_values(list(b.columns)).reset_index(drop=True)
    )
    total = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    frac = len(a) / total
    assert 0.07 <= frac <= 0.13, frac


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
