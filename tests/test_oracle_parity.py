"""Differential test of every declared query against its DuckDB oracle
— the local mirror of the driver's t2 correctness gate, run at the
same scale factor (sf0.01) with stricter (bit-exact) comparison.
"""

from __future__ import annotations

import pytest

from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR, assert_parity

_load_all()

ORACLE_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    assert_parity(q.fn(spark, SF_DIR), duck, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0

    qs, os = e.queries(), e.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) == len(REGISTRY)
