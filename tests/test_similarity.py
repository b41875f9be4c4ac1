"""Property tests for similarity search (SURVEY.md §2.10 D6 + ANN):
IVF recall vs brute force, and the pandas-UDF cosine twin vs the
built-in expression.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.functions.vector import cosine
from fts_analysis_datalake_spark.operators.similarity import (
    cosine_pandas_udf,
    cosine_topk,
    ivf_topk,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


def _qvec(emb, vid):
    row = emb.filter(F.col("vec_id") == vid).select("embedding").head()
    return [float(x) for x in row[0]]


def test_ivf_recall_vs_bruteforce(spark, emb):
    recalls = []
    for vid in [0, 17, 101, 256, 499]:
        q = _qvec(emb, vid)
        exact = {r.vec_id for r in cosine_topk(emb, q, 10).collect()}
        approx = {r.vec_id for r in ivf_topk(emb, q, 10, nprobe=3).collect()}
        recalls.append(len(exact & approx) / 10)
    avg = sum(recalls) / len(recalls)
    # probing 3/10 buckets of near-random vectors: recall well above
    # the ~0.3 random-scan floor demonstrates the index works.
    assert avg >= 0.5, recalls


def test_pandas_udf_cosine_matches_builtin(spark, emb):
    q = _qvec(emb, 42)
    udf = cosine_pandas_udf(q)
    both = emb.select(
        "vec_id",
        cosine(F.col("embedding"), F.array(*[F.lit(float(x)).cast("float") for x in q])).alias(
            "cos_builtin"
        ),
        udf(F.col("embedding")).alias("cos_udf"),
    )
    bad = both.filter(F.abs(F.col("cos_builtin") - F.col("cos_udf")) > 1e-9).count()
    assert bad == 0
