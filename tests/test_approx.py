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
    """The query now carries the envelope form itself (exact count +
    approx_ok flag, oracle-backed); this test independently recomputes
    the exact counts and checks both the flag and the exact column."""
    df = REGISTRY["q_approx_distinct_parts"].fn(spark, SF_DIR).toPandas()
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert len(df) == len(exact)
    for _, row in df.iterrows():
        assert row["exact_parts"] == exact[row["l_returnflag"]]
        assert bool(row["approx_ok"]), row["l_returnflag"]


def test_approx_percentiles_within_bound(spark, duck):
    """E14: percentile_approx vs exact percentiles — the GK sketch at
    accuracy 10^4 must land within 1% rank error; on l_quantity
    (integers 1..50) that means within ~1 quantity unit."""
    df = REGISTRY["q_approx_quantity_percentiles"].fn(spark, SF_DIR).toPandas()
    exact = {
        flag: pcts
        for flag, pcts in duck.execute(
            "SELECT l_returnflag, quantile_cont(l_quantity, [0.25, 0.5, 0.75]) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert len(df) == len(exact)
    # The query now carries the envelope form itself (exact p25/p50/p75
    # + approx_ok); independently recompute the exact percentiles and
    # check both the flag and the exact columns.
    for _, row in df.iterrows():
        want = exact[row["l_returnflag"]]
        for got, w in zip((row["p25"], row["p50"], row["p75"]), want):
            assert abs(got - w) <= 0.005, (row["l_returnflag"], got, w)
        assert bool(row["approx_ok"]), row["l_returnflag"]


def test_merge_upsert_semantics(spark):
    """E12 unit semantics: change rows win per key, tombstones drop
    the key, unmatched base rows survive, new keys insert."""
    from fts_analysis_datalake_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (4, "d", "U")], "k BIGINT, v STRING, _op STRING"
    )
    got = {(r.k, r.v) for r in merge_upsert(base, changes, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}


def test_hll_rollup_within_bound(spark, duck):
    """E17: per-group and merged HLL estimates vs exact distinct
    counts — lgConfigK=14 gives ~0.8% relative standard error; assert
    a generous 5% envelope."""
    df = REGISTRY["q_hll_user_rollup"].fn(spark, SF_DIR).toPandas()
    exact = dict(duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1 "
        "UNION ALL SELECT 'ALL', COUNT(DISTINCT user_id) FROM events"
    ).fetchall())
    assert set(df["event_type"]) == set(exact)
    # Envelope form since r6: the query carries the exact counts and
    # the 5% flag itself; verify both independently.
    for _, row in df.iterrows():
        assert row["exact_users"] == exact[row["event_type"]]
        assert bool(row["approx_ok"]), row["event_type"]


def test_stratified_sample_rates_within_bound(spark):
    """E18: achieved per-stratum rates must sit inside a 4-sigma
    binomial envelope of the requested fractions."""
    import math

    from fts_analysis_datalake_spark.queries.scale_toolkit import _STRATA

    df = REGISTRY["q_stratified_sample_rates"].fn(spark, SF_DIR).toPandas()
    assert set(df["l_returnflag"]) == set(_STRATA)
    for _, row in df.iterrows():
        p = _STRATA[row["l_returnflag"]]
        sigma = math.sqrt(p * (1 - p) / row["n_total"])
        assert abs(row["achieved_rate"] - p) <= 4 * sigma, (
            row["l_returnflag"], row["achieved_rate"], p)


def test_cms_never_undercounts_and_bounds_error(spark):
    """Count-min guarantees estimate >= exact for every probe; the
    expected overcount is ~depth-min of Binomial(N, 1/width) noise —
    assert the deterministic lower bound and a loose 3*N/width upper
    envelope."""
    from pyspark.sql import functions as F

    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["q_cms_token_counts"].fn(spark, SF_DIR).collect()
    assert rows, "probe set must be non-empty"
    from fts_analysis_datalake_spark.catalog import load_table
    from fts_analysis_datalake_spark.operators.text import normalize_text, tokens

    n_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens(normalize_text(F.col("text")))).alias("t"))
        .count()
    )
    for r in rows:
        assert r.cms_count >= r.exact_count, r
        assert r.overcount <= 3 * n_tokens / 1024 + 1, (r, n_tokens)


def test_cms_join_estimate_upper_bounds_truth(spark):
    """The CMS inner-product estimate can only overcount the true
    join size (hash collisions add, never subtract)."""
    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all

    _load_all()
    r = REGISTRY["q_join_size_estimate"].fn(spark, SF_DIR).first()
    assert r.true_join_rows > 0
    assert r.cms_estimate >= r.true_join_rows
    assert r.inflation < 3.0, r  # width 1024 keeps collisions modest here
