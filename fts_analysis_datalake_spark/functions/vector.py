"""Vector math on ``array<float>`` columns, built from higher-order
Catalyst expressions (SURVEY.md §2.8 F8, §2.10 D5) — no UDFs, fully
codegen-able, and deterministic across engines: element order is
fixed, so the sequential fold gives bit-identical doubles in Spark
and DuckDB (every term is float->double exact, IEEE ops identical).

At 100 TB these run inside the scan/project stage — no shuffle, no
Python. The pandas-UDF twin (X1) lives in operators/similarity.py for
the UDF-surface demonstration only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` — same sequential fold, same casts."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"{sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)})"
