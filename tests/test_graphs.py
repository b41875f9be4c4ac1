"""Connected-components operator (E15) — fixpoint semantics that the
oracle-parity test can't isolate: multi-hop chains, multiple
components, the max_iter guard, and cluster/survivor labeling."""

import pytest

from fts_analysis_datalake_spark.operators.graphs import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")


def test_chain_converges_to_min_label(spark):
    # Path graph 1-2-3-4-5-6: diameter 5 forces several propagation
    # rounds; every node must end with comp = 1.
    e = _edges(spark, [(i, i + 1) for i in range(1, 6)])
    got = {(r.node, r.comp) for r in connected_components(e).collect()}
    assert got == {(i, 1) for i in range(1, 7)}


def test_multiple_components_and_edge_direction(spark):
    # Direction of the input pair must not matter (graph is undirected).
    e = _edges(spark, [(2, 1), (3, 2), (10, 11), (20, 20)])
    comps = {r.node: r.comp for r in connected_components(e).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_max_iter_guard_raises(spark):
    e = _edges(spark, [(i, i + 1) for i in range(1, 8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=2)


def test_dedup_clusters_sizes_and_canonicals(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a BIGINT, id_b BIGINT")
    rows = {(r.member, r.cluster_id, r.cluster_size, r.is_canonical)
            for r in dedup_clusters(e).collect()}
    assert rows == {
        (1, 1, 3, True), (2, 1, 3, False), (3, 1, 3, False),
        (7, 7, 2, True), (8, 7, 2, False),
    }
