"""Capture .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

    python scripts/capture_plan.py --tag r11 --suffix before q_bm25_scoring ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fts_analysis_datalake_spark.caching import release_tracked
from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from fts_analysis_datalake_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    _load_all()
    spark = get_spark("fts-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        # A persist() registered while BUILDING one query's frame stays in
        # the CacheManager and substitutes InMemoryRelation into every later
        # explain that contains a matching subtree — clear between names so
        # each captured plan is what a standalone run of that query executes.
        release_tracked()
        spark.catalog.clearCache()
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
