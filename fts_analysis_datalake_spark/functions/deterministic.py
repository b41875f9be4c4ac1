"""Deterministic aggregate forms for oracle-checked queries.

Problem (SURVEY.md §5.3, FIXTURES.md determinism notes): the fixtures'
money-like columns are doubles with float noise (e.g. 2171.9700000000003),
so a plain ``SUM(double)`` depends on addition order — Spark's partial
aggregation over N partitions and DuckDB's row-group-parallel sum will
differ in the last ulps, and the driver's value-hash comparison has no
tolerance we can rely on.

Fix: scale each row to an integer deterministically, sum integers
(associative, order-independent, exact below 2**63), then unscale.
``FLOOR(x * 10^s + 0.5)`` is identical IEEE arithmetic in Spark and
DuckDB — no rounding-mode ties (unlike ROUND, which is HALF_UP in
Spark vs HALF_EVEN in DuckDB), no order dependence.

Each helper exists in a Spark form and a SQL-text form so query
modules can declare both sides from one vocabulary. Columns whose
values are integral doubles (``l_quantity``) sum exactly in either
engine and need no scaling.

At 100 TB this costs one extra projection inside the partial
aggregate — still whole-stage-codegen'd, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side


def dsum(c: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a noisy-double column, as double."""
    m = 10**scale
    return F.sum(F.floor(c * m + F.lit(0.5))) / float(m)


def davg(c: Column, scale: int = 2) -> Column:
    """Order-independent AVG of a noisy-double column, as double."""
    m = 10**scale
    return F.sum(F.floor(c * m + F.lit(0.5))) / float(m) / F.count(c)


def dstddev_samp(c: Column, scale: int = 4) -> Column:
    """Order-independent sample stddev via scaled integer moments.

    stddev = sqrt((n*sum(x^2) - sum(x)^2) / (n*(n-1))) computed from
    integer-scaled x so both engines see identical exact sums.

    The moment sums run in DECIMAL, not BIGINT: with money-magnitude
    inputs at scale=4, xi ~ 1e9 makes sum(xi*xi) ~ n*1e18 — a BIGINT
    sum silently wraps in Spark (non-ANSI) while DuckDB promotes to
    HUGEINT, silently diverging. DECIMAL(19,0) terms widen to
    DECIMAL(38,0) products/sums in BOTH engines — exact (and
    identical) up to 1e38, i.e. safe for |x|*10^scale < 1e14 at a
    billion rows.

    The result is 1e-6 OUTPUT-quantized (r6, the dcorr lesson): a
    DECIMAL(38) moment past 2^53 casts to DOUBLE correctly rounded on
    the JVM but DOUBLE-ROUNDED by DuckDB (int128 -> upper*2^64 +
    lower) — so the final expression can differ in the last ulp even
    though every operand is the same exact integer. Money-magnitude
    stddevs keep 9+ significant digits at 1e-6.
    """
    m = float(10**scale)
    xi = F.floor(c * m + F.lit(0.5)).cast("decimal(19,0)")
    n = F.count(c).cast("double")
    s1 = F.sum(xi).cast("double")
    s2 = F.sum(xi * xi).cast("double")
    raw = F.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) / m
    return F.floor(raw * 1e6 + F.lit(0.5)).cast("bigint") / 1e6


# ----------------------------------------------------------------- SQL side


def sql_dsum(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) / {m}.0"


def sql_davg(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) / {m}.0 / COUNT({expr})"


def sql_dstddev_samp(expr: str, scale: int = 4) -> str:
    # DECIMAL(19,0) moments for the same overflow-safety reasons as
    # the Spark form; 1e-6 output quantization for the same
    # int128->double double-rounding reason (see dstddev_samp).
    m = 10**scale
    xi = f"CAST(FLOOR(({expr}) * {m} + 0.5) AS DECIMAL(19,0))"
    raw = (
        f"SQRT((COUNT({expr}) * CAST(SUM({xi} * {xi}) AS DOUBLE)"
        f" - CAST(SUM({xi}) AS DOUBLE) * CAST(SUM({xi}) AS DOUBLE))"
        f" / (COUNT({expr}) * (COUNT({expr}) - 1.0))) / {m}.0"
    )
    return f"(CAST(FLOOR({raw} * 1000000 + 0.5) AS BIGINT) / 1000000.0)"


def dcorr(x: Column, y: Column, scale_x: int = 2, scale_y: int = 2) -> Column:
    """Order-independent Pearson correlation via scaled integer
    moments (the ``dstddev_samp`` recipe extended to two columns):

        corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    The scale factors cancel, so only the rounding granularity
    matters. All five moment sums run in DECIMAL (exact, identical
    in both engines); doubles appear only in the final fixed
    expression, evaluated in the same operation order on both sides.
    Built-in ``F.corr`` is order-dependent in its double partials and
    can't hash-match a DuckDB twin.

    The result is 1e-9 OUTPUT-quantized (r6): once a DECIMAL(38)
    moment exceeds 2^53 (sf0.1-sized second moments), its cast to
    DOUBLE is correctly rounded by the JVM (BigDecimal.doubleValue)
    but DOUBLE-ROUNDED by DuckDB (int128 -> upper*2^64 + lower, two
    roundings) — a last-ulp divergence no operand discipline can
    remove. Correlations live in [-1, 1], so 1e-9 keeps 9
    significant digits.
    """
    mx, my = float(10**scale_x), float(10**scale_y)
    xi = F.floor(x * mx + F.lit(0.5)).cast("decimal(19,0)")
    yi = F.floor(y * my + F.lit(0.5)).cast("decimal(19,0)")
    n = F.count(x).cast("double")
    sx = F.sum(xi).cast("double")
    sy = F.sum(yi).cast("double")
    sxx = F.sum(xi * xi).cast("double")
    syy = F.sum(yi * yi).cast("double")
    sxy = F.sum(xi * yi).cast("double")
    raw = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return F.floor(raw * 1e9 + F.lit(0.5)).cast("bigint") / 1e9


def sql_dcorr(x: str, y: str, scale_x: int = 2, scale_y: int = 2) -> str:
    mx, my = 10**scale_x, 10**scale_y
    xi = f"CAST(FLOOR(({x}) * {mx} + 0.5) AS DECIMAL(19,0))"
    yi = f"CAST(FLOOR(({y}) * {my} + 0.5) AS DECIMAL(19,0))"
    n = f"CAST(COUNT({x}) AS DOUBLE)"
    raw = (
        f"(({n} * CAST(SUM({xi} * {yi}) AS DOUBLE)"
        f" - CAST(SUM({xi}) AS DOUBLE) * CAST(SUM({yi}) AS DOUBLE))"
        f" / (SQRT({n} * CAST(SUM({xi} * {xi}) AS DOUBLE)"
        f" - CAST(SUM({xi}) AS DOUBLE) * CAST(SUM({xi}) AS DOUBLE))"
        f" * SQRT({n} * CAST(SUM({yi} * {yi}) AS DOUBLE)"
        f" - CAST(SUM({yi}) AS DOUBLE) * CAST(SUM({yi}) AS DOUBLE))))"
    )
    # 1e-9 output quantization — see dcorr's docstring (DuckDB's
    # int128->double cast is double-rounded past 2^53).
    return f"(CAST(FLOOR({raw} * 1000000000 + 0.5) AS BIGINT) / 1000000000.0)"
