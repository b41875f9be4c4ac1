"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with the noop sink (full pipeline runs, nothing
materializes on the driver) after a warm-up action to amortize
one-time JVM/codegen costs out of the first query's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from fts_analysis_datalake_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _load_all()
    spark = get_spark("fts-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up: JVM, parquet footer reads, codegen paths.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    per_query: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
