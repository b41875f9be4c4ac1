"""Self-generated scale probe (SURVEY §6 annex; VERDICT r7 task #3).

/root/testdata is read-only and capped at sf0.1, so the 100 TB design
claims otherwise rest on plan-shape assertions alone. This script
turns them into a measured scaling slope:

  gen  — synthesize a MULT x sf0.1 fixture with the same schemas,
         categorical domains and density regime as the driver data
         (domains are READ from the sf0.1 files, not hardcoded), a
         DIFFERENT seed (20260815, not the driver's 42), written
         under the repo (never /root/testdata).
  run  — time a panel (the r7 slowest-20 + one query per count-gated
         family + anchors) at sf0.1 and at the probe size, record
         wall-time slopes and the branch every count gate actually
         took (fts_analysis_datalake_spark.probe hooks), then re-time
         the gated families with probe.FORCE_DISTRIBUTED so the
         distributed else-branch — the only branch that exists at
         100 TB — gets its own measured slope.

Usage:
  python scripts/scale_probe.py gen --mult 8 --out .scale_probe/x8
  python scripts/scale_probe.py run --probe-dir .scale_probe/x8 \
      --mult 8 --json SCALE_PROBE_r08.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SEED = 20260815
US_PER_DAY = 86_400_000_000

# sf0.1 actual row counts (FIXTURES.md; re-checked 2026-08-15) — the
# probe scales these linearly, preserving key-domain density (orders
# per customer, lines per order, events per user) so join/graph
# regimes match the driver fixture's.
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def _domains():
    """Read every categorical domain from the sf0.1 fixture itself so
    literal-filter queries (event_type='purchase', lang='en', ...)
    hit the same values at probe scale."""
    import duckdb

    con = duckdb.connect()
    d = {}
    for tbl, col in [
        ("customer", "c_mktsegment"),
        ("part", "p_brand"),
        ("part", "p_type"),
        ("orders", "o_orderstatus"),
        ("orders", "o_orderpriority"),
        ("lineitem", "l_returnflag"),
        ("lineitem", "l_linestatus"),
        ("events", "event_type"),
        ("documents", "lang"),
        ("documents", "source"),
    ]:
        rows = con.execute(
            f"SELECT DISTINCT {col} FROM read_parquet('{SF01}/{tbl}.parquet') ORDER BY 1"
        ).fetchall()
        d[col] = [r[0] for r in rows]
    d["vocab"] = [
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                FROM read_parquet('{SF01}/documents.parquet') ORDER BY 1"""
        ).fetchall()
        if r[0]
    ]
    d["p_words"] = [
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w
                FROM read_parquet('{SF01}/part.parquet') ORDER BY 1"""
        ).fetchall()
    ]
    d["date_lo"], d["date_hi"] = con.execute(
        f"SELECT MIN(o_orderdate), MAX(o_orderdate) FROM read_parquet('{SF01}/orders.parquet')"
    ).fetchone()
    con.close()
    return d


def _write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def _ts_us(day_int64):
    return pa.array(day_int64 * US_PER_DAY, type=pa.timestamp("us"))


def gen(outdir: str, mult: int, seed: int = SEED, regime: str = "v1") -> None:
    """regime v1: copy the driver fixture's laws verbatim (31-word
    uniform doc vocabulary, dense sequential name keys) — the r8
    probes' fixture, kept reproducible. regime v2 (VERDICT r8 task
    #5): the laws real corpora follow where v1's are degenerate —
    (a) the document vocabulary GROWS with corpus size (Heaps-style,
    V = 31 * mult^0.7, the driver's 31 words as the head) and word
    draws are ZIPFIAN (p ∝ 1/rank), so rare-shingle blocking keys
    (PPJoin prefixes) keep their cardinality growth instead of
    saturating on a closed 30-word vocabulary; (b) customer name
    digits come from a SPARSE 9-digit space (Knuth-hash of the key)
    instead of dense sequential integers, so edit-distance-2
    neighborhoods have realistic occupancy instead of the dense-key
    regime where every increment is someone's name. Everything else
    is identical to v1."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    dom = _domains()

    # fixed dims: copy verbatim (FK semantics: 25 nations -> 5 regions)
    for t in ("region", "nation"):
        _write(outdir, t, pq.read_table(f"{SF01}/{t}.parquet"))

    n_cust = BASE["customer"] * mult
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": (
            [f"Customer#{i:09d}" for i in range(n_cust)]
            if regime == "v1"
            else [
                f"Customer#{(i * 2654435761) % 1_000_000_000:09d}"
                for i in range(n_cust)
            ]
        ),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(dom["c_mktsegment"])[rng.integers(0, len(dom["c_mktsegment"]), n_cust)]
        ),
    }))

    n_supp = BASE["supplier"] * mult
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    n_part = BASE["part"] * mult
    pw = np.array(dom["p_words"])
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
        "p_name": [
            f"{a} {b}"
            for a, b in zip(
                pw[rng.integers(0, len(pw), n_part)],
                pw[rng.integers(0, len(pw), n_part)],
            )
        ],
        "p_brand": pa.array(np.array(dom["p_brand"])[rng.integers(0, len(dom["p_brand"]), n_part)]),
        "p_type": pa.array(np.array(dom["p_type"])[rng.integers(0, len(dom["p_type"]), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2_000, n_part), 2),
    }))

    n_ord = BASE["orders"] * mult
    lo_day = np.datetime64(dom["date_lo"], "D").astype("int64")
    hi_day = np.datetime64(dom["date_hi"], "D").astype("int64")
    odays = rng.integers(lo_day, hi_day + 1, n_ord)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(
            np.array(dom["o_orderstatus"])[rng.integers(0, len(dom["o_orderstatus"]), n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(850, 560_000, n_ord), 2),
        "o_orderdate": _ts_us(odays),
        "o_orderpriority": pa.array(
            np.array(dom["o_orderpriority"])[rng.integers(0, len(dom["o_orderpriority"]), n_ord)]
        ),
    }))

    # lineitem: 1..7 lines/order (mean ~4, matching the fixture's 4.08)
    counts = rng.integers(1, 8, n_ord)
    total = int(counts.sum())
    okeys = np.repeat(np.arange(n_ord), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    linenums = (np.arange(total) - np.repeat(starts, counts) + 1).astype(np.int32)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, total), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, total), type=pa.int64()),
        "l_linenumber": pa.array(linenums, type=pa.int32()),
        "l_quantity": rng.integers(1, 51, total).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, total), 2),
        "l_discount": np.round(rng.integers(0, 11, total) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, total) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(dom["l_returnflag"])[rng.integers(0, len(dom["l_returnflag"]), total)]
        ),
        "l_linestatus": pa.array(
            np.array(dom["l_linestatus"])[rng.integers(0, len(dom["l_linestatus"]), total)]
        ),
        "l_shipdate": _ts_us(np.repeat(odays, counts) + rng.integers(1, 96, total)),
    }))

    n_ev = BASE["events"] * mult
    ev_lo = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    ev_hi = np.datetime64("2024-01-30T23:59:59", "us").astype("int64")
    ts = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 1_500 * mult, n_ev), type=pa.int64()),
        "event_type": pa.array(
            np.array(dom["event_type"])[rng.integers(0, len(dom["event_type"]), n_ev)]
        ),
        # exponential, matching the driver fixture's shape (mean ~50,
        # p99 ~228): value-threshold filters (e.g. purchase > 250)
        # must stay non-empty at probe scale
        "value": np.round(rng.exponential(49.87, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: word soup over the SAME vocabulary, with the same
    # dup regime by construction — 70% base docs, 15% exact dups,
    # 15% near-dups (2-word mutations of an earlier base doc)
    n_doc = BASE["documents"] * mult
    base_vocab = list(dom["vocab"])
    if regime == "v2":
        n_vocab = max(len(base_vocab), int(round(len(base_vocab) * mult**0.7)))
        vocab = np.array(
            base_vocab
            + [f"w{k:05d}" for k in range(n_vocab - len(base_vocab))]
        )
        zipf_p = 1.0 / np.arange(1, len(vocab) + 1)
        zipf_p /= zipf_p.sum()

        def draw(k):
            return rng.choice(len(vocab), size=k, p=zipf_p)

    else:
        vocab = np.array(base_vocab)

        def draw(k):
            return rng.integers(0, len(vocab), k)

    texts: list[str] = []
    n_base = int(n_doc * 0.7)
    for _ in range(n_base):
        ln = rng.integers(10, 61)
        texts.append(" ".join(vocab[draw(ln)]))
    for _ in range(n_doc - n_base):
        src_txt = texts[rng.integers(0, n_base)]
        if rng.random() < 0.5:
            texts.append(src_txt)  # exact duplicate
        else:
            ws = src_txt.split(" ")
            for _ in range(2):
                ws[rng.integers(0, len(ws))] = vocab[draw(1)[0]]
            texts.append(" ".join(ws))
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(dom["lang"])[rng.integers(0, len(dom["lang"]), n_doc)]),
        "source": pa.array(np.array(dom["source"])[rng.integers(0, len(dom["source"]), n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), type=pa.int64()),
    }))

    # embeddings: unit-norm ISOTROPIC vectors with label-independent
    # geometry, dim 64 float32 — matching the measured driver fixture
    # (norms exactly 1.0, within-label mean cosine 0.000, max natural
    # pair ~0.5). The first cut used tight label-aligned gaussian
    # clusters (within-label mean cos 0.79): a different similarity
    # regime entirely, which inflated LSH bucket collisions ~700x and
    # made every banded-candidate slope meaningless.
    n_emb = BASE["embeddings"] * mult
    labels = rng.integers(0, 10, n_emb)
    vecs = rng.normal(0.0, 1.0, (n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))


# ---------------------------------------------------------------------------
# run
# ---------------------------------------------------------------------------

# r7 slowest-20 (BENCH_DETAIL_r07.json) + anchors
PANEL = [
    "q1_pricing_summary",        # machine anchor
    "q5_revenue_by_nation",      # plain shuffle-join reference slope
    "q_prefix_filtered_pairs",
    "q_reorder_chains_recursive",
    "q_lpa_communities",
    "q_resource_allocation_links",
    "q_dedup_pipeline_report",
    "q_dedup_clusters",
    "q_source_minhash_affinity",
    "q_simhash_candidates",
    "q_dbscan_grid_clusters",
    "q_dedup_pipeline_md5_report",
    "q_lof_hourly_anomalies",
    "q_bellman_ford_nearest",
    "q_kmeans_quantized_exact",
    "q_harmonic_centrality",
    "q_personalized_pagerank",
    "q_bootstrap_mean_ci",
    "q_permutation_test_value",
    "q_benchmark_contamination",
    "q_semantic_dedup_report",
    "q_minhash_near_dups",
    "q_fellegi_sunter_linkage",
]

# one representative per count-gated family (probe.gate names)
GATED = [
    "q_harmonic_centrality",
    "q_ktruss_parts",
    "q_kcore_suppliers",
    "q_greedy_segmentation",
    "q_greedy_cover_selection",
    "q_kmeans_embeddings",
    "q_pagerank_parts_suppliers",
    "q_bfs_hops_from_supplier",
    "q_dedup_clusters",
]


def _time_query(fn, spark, sf_dir, reps=2):
    # noop sink, same as bench.py: executes the full plan without
    # materializing the result on the driver. collect() here killed
    # the 32x probe on output-bound pair queries (54M/87M rows
    # through collectToPython is a DRIVER limit, not a plan limit —
    # both ran fine with a distributed sink).
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def run(
    probe_dir: str,
    mult: int,
    json_out: str | None,
    all_queries: bool = False,
    reps: int = 2,
    names_filter: list[str] | None = None,
) -> None:
    from fts_analysis_datalake_spark import probe
    from fts_analysis_datalake_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    if all_queries:
        # full-registry screening sweep: every declared query, one
        # timed rep per size, no forced-distributed leg — flags any
        # query that errors or goes superlinear at 8x; re-measure
        # flagged queries with the panel mode afterwards
        names = list(qs)
    else:
        names = PANEL + [n for n in GATED if n not in PANEL]
    if names_filter:
        names = [n for n in names_filter if n in qs]
    result: dict = {"mult": mult, "probe_dir": probe_dir, "queries": {}}

    import gc

    for name in names:
        # Drop py4j refs from the previous query so the JVM's
        # ContextCleaner can unpersist its localCheckpoint blocks —
        # 30 heavy queries in one session otherwise accumulate enough
        # block-manager memory to fail later runtime broadcasts
        # (observed: q_pagerank_parts_suppliers at 8x died with "Not
        # enough memory to build and broadcast" in-session but runs
        # fine fresh). release_tracked + clearCache first: gc alone
        # leaves tracked_persist blocks (MinHash/SimHash signature
        # tables) pinned — at 32x three queries died in-session from
        # the accumulation and all three ran fine in fresh sessions.
        from fts_analysis_datalake_spark.caching import release_tracked

        release_tracked()
        spark.catalog.clearCache()
        gc.collect()
        fn = qs[name]
        rec: dict = {}
        failed = False
        for key, d in (("sf01", SF01), ("probe", probe_dir)):
            probe.enable()
            try:
                rec[f"{key}_sec"] = round(_time_query(fn, spark, d, reps), 4)
            except Exception as exc:  # noqa: BLE001 — record, keep probing
                rec[f"{key}_err"] = f"{type(exc).__name__}: {exc}"[:300]
                failed = True
            rec[f"{key}_branches"] = probe.branches()
            probe.disable()
        if failed:
            result["queries"][name] = rec
            print(f"{name:34s} ERR {rec.get('sf01_err') or rec.get('probe_err')}",
                  flush=True)
            continue
        rec["slope"] = round(rec["probe_sec"] / rec["sf01_sec"], 3)
        if name in GATED and not all_queries:
            probe.FORCE_DISTRIBUTED = True
            try:
                f: dict = {}
                for key, d in (("sf01", SF01), ("probe", probe_dir)):
                    probe.enable()
                    try:
                        f[f"{key}_sec"] = round(_time_query(fn, spark, d), 4)
                    except Exception as exc:  # noqa: BLE001
                        f[f"{key}_err"] = f"{type(exc).__name__}: {exc}"[:300]
                    probe.disable()
                if "sf01_sec" in f and "probe_sec" in f:
                    f["slope"] = round(f["probe_sec"] / f["sf01_sec"], 3)
                rec["forced_distributed"] = f
            finally:
                probe.FORCE_DISTRIBUTED = False
        result["queries"][name] = rec
        extra = ""
        fd = rec.get("forced_distributed")
        if fd and "slope" in fd:
            extra = (
                f"  | forced-dist {fd['sf01_sec']:.2f}->{fd['probe_sec']:.2f}s"
                f" slope {fd['slope']:.2f}"
            )
        elif fd:
            extra = f"  | forced-dist ERR {fd.get('sf01_err') or fd.get('probe_err')}"
        print(
            f"{name:34s} {rec['sf01_sec']:7.2f} -> {rec['probe_sec']:7.2f}s"
            f"  slope {rec['slope']:5.2f}  {rec['probe_branches'] or ''}{extra}",
            flush=True,
        )

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--mult", type=int, default=8)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=SEED)
    g.add_argument("--regime", choices=["v1", "v2"], default="v1")
    r = sub.add_parser("run")
    r.add_argument("--probe-dir", required=True)
    r.add_argument("--mult", type=int, default=8)
    r.add_argument("--json", default=None)
    r.add_argument("--all", action="store_true")
    r.add_argument("--reps", type=int, default=2)
    r.add_argument("--names", default=None, help="comma-separated query names: re-probe just these")
    a = ap.parse_args()
    if a.cmd == "gen":
        gen(a.out, a.mult, a.seed, a.regime)
    else:
        run(a.probe_dir, a.mult, a.json, all_queries=a.all, reps=a.reps,
            names_filter=a.names.split(",") if a.names else None)


if __name__ == "__main__":
    main()
