"""Scale-technique verification (operators/scale.py): bucketed joins
really skip their shuffle, and salting returns bit-identical results
to the plain forms it replaces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.operators.scale import (
    bucketed_join,
    salted_aggregate,
    salted_equi_join,
    write_bucketed,
)
from fts_analysis_datalake_spark.plans import explain_text
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF_DIR_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF_DIR_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", 8, str(root / "li"))
    write_bucketed(o, "t_o_bucketed", "l_orderkey", 8, str(root / "o"))
    yield "t_li_bucketed", "t_o_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the join strategy decision (tiny test tables would
        # broadcast, hiding the property being tested).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = explain_text(bucketed_join(spark, left, right, "l_orderkey"), "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    n_bucketed = bucketed_join(spark, left, right, "l_orderkey").count()
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    o = load_table(spark, SF_DIR_SMALL, "orders")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain > 0


def test_salted_aggregate_matches_plain_groupby(spark):
    e = load_table(spark, SF_DIR_SMALL, "events")
    salted = salted_aggregate(
        e,
        ["event_type"],
        {"n": F.count(F.lit(1)), "qty": F.sum(F.floor("value"))},
        salts=16,
        salt_src=F.col("event_id"),
    ).toPandas()
    plain = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.floor("value")).alias("qty"))
        .toPandas()
    )
    s = salted.sort_values("event_type").reset_index(drop=True)
    p = plain.sort_values("event_type").reset_index(drop=True)
    assert (s["event_type"] == p["event_type"]).all()
    assert (s["n"] == p["n"]).all()
    assert (s["qty"] == p["qty"]).all()


def test_salted_join_matches_plain_join(spark):
    e = load_table(spark, SF_DIR_SMALL, "events").select("event_id", "user_id", "event_type")
    dim = (
        load_table(spark, SF_DIR_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    salted = salted_equi_join(e, dim, "user_id", salts=8, salt_src=F.col("event_id"))
    plain = e.join(dim, "user_id")
    assert salted.count() == plain.count()
    a = sorted(tuple(r) for r in salted.select("event_id", "user_n").collect())
    b = sorted(tuple(r) for r in plain.select("event_id", "user_n").collect())
    assert a == b
