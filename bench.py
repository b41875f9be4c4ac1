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

from fts_analysis_datalake_spark.caching import release_tracked
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
        # Drop persisted intermediates (e.g. MinHash signatures) so cached
        # blocks never accumulate across the suite. release_tracked() is
        # the library's own lifecycle hook; clearCache stays as a belt.
        release_tracked()
        spark.catalog.clearCache()
    total = round(time.perf_counter() - t_all, 4)

    # Per-query detail: to a file (survives any stdout truncation) and
    # to an early stdout line (may be head-truncated by log capture) ...
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump({"sf": sf, "queries": per_query}, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": per_query}))
    # ... compact machine-parseable line LAST so a tail-truncating log
    # capture always keeps the headline total (BENCH_r01 lost it).
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "n_queries": len(per_query),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
