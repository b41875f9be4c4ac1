"""Ad-hoc parity check for a set of named queries at sf0.01 — the same
strict cell-exact compare the pytest suite runs, callable standalone:

    python scripts/check_new.py q_average_precision q_anova_value_by_type
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import duckdb
from pyspark.sql import SparkSession

from conftest import assert_parity  # noqa: E402  (tests/conftest.py)
from fts_analysis_datalake_spark.catalog import TABLES
from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from fts_analysis_datalake_spark.session import tune

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def main(names: list[str]) -> int:
    _load_all()
    spark = tune(
        SparkSession.builder.appName("check-new").master("local[8]")
    ).getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failed = []
    for name in names:
        q = REGISTRY[name]
        try:
            if q.oracle is None:
                n = q.fn(spark, SF_DIR).count()
                print(f"ROWS-ONLY {name}: {n} rows")
            else:
                assert_parity(q.fn(spark, SF_DIR), con, q.oracle, name)
                print(f"PASS {name}")
        except Exception as ex:  # noqa: BLE001 — report-and-continue harness
            failed.append(name)
            print(f"FAIL {name}: {ex}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
