"""Isolated per-query timing: best-of-N noop-sink runs with clean caches
between, bracketed by q1 anchor points (machine-speed probes).

    python scripts/isolate.py q_bm25_scoring q_granger_lead_lag
    python scripts/isolate.py --top 40           # top-40 by BENCH_DETAIL.json
    python scripts/isolate.py --reps 3 --out /tmp/iso.json q_foo

Prints one JSON line {name: {best, runs, anchor}} and writes --out if given.
Same methodology as bench.py's isolated_reruns block (guide §1.4: noop sink
times the computation, not the sink; §1.5: jobs labelled).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fts_analysis_datalake_spark.caching import release_tracked
from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
from fts_analysis_datalake_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0, help="top-N from BENCH_DETAIL.json")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    names = list(args.names)
    if args.top:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "BENCH_DETAIL.json")) as f:
            q = json.load(f)["queries"]
        names += [
            n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]
            if n not in names
        ]
    spark = get_spark("fts-isolate")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM + parquet footers + codegen (mirrors bench.py).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from fts_analysis_datalake_spark.queries.relational_core import q1_pricing_summary

    def clean() -> None:
        release_tracked()
        spark.catalog.clearCache()
        gc.collect()

    def anchor() -> float:
        t0 = time.perf_counter()
        q1_pricing_summary(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    anchor()  # first-plan warmup
    clean()
    out: dict[str, dict] = {}
    for name in names:
        a0 = anchor()
        clean()
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"isolate: {name}")
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
            clean()
        out[name] = {"best": min(runs), "runs": runs, "anchor": a0}
        print(f"{min(runs):8.3f}  (anchor {a0:.2f}, runs {runs})  {name}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
