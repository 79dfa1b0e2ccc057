"""Shared expression helpers, including oracle-exact numeric aggregates.

Spark and DuckDB both sum doubles in nondeterministic partition order,
so SUM(double) can differ in final ULPs between engines.  The engine's
convention for every money-typed aggregate: cast to DECIMAL before
summing (exact, order-independent) and cast the result back to DOUBLE
(deterministic) -- on both the Spark side and the SQL-oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer digits for 100 TB-scale money sums at group level
MONEY = "decimal(30,4)"

#: factor types for money PRODUCTS.  A decimal multiply's result width
#: is the SUM of the operand widths (+1 in Spark): DECIMAL(30,4)
#: factors overflow width 38, at which point Spark silently reduces
#: scale while DuckDB falls back to DOUBLE -- divergent rounding, the
#: one thing the oracle convention exists to prevent.  The fixture's
#: money columns are exact 2-decimal values, so DECIMAL(15,2) prices
#: (13 integer digits -- fine for any per-ROW money value; group SUMS
#: still accumulate in the engines' widened 38-digit sum type) and
#: DECIMAL(8,2) rate factors keep every 2- and 3-factor product inside
#: width 38 in BOTH engines: exact, order-independent, identical.
PRICE = "decimal(15,2)"
FRAC = "decimal(8,2)"


def dec_sum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM over a double money column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def dec_sum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) AS {alias}"


def dec_avg(col: str | Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(MONEY)).cast("double") / F.count(c)
    ).alias(alias)


def dec_avg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic.

    DECIMAL(15,2) x DECIMAL(8,2) -> scale-4 product within width 38 in
    both engines: no double fallback, no scale reduction.
    """
    return F.col("l_extendedprice").cast(PRICE) * (
        F.lit(1).cast(FRAC) - F.col("l_discount").cast(FRAC)
    )


DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"
)


def charge() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax), exact decimal.

    The 3-factor product stays within width 38 (scale 6) both engines.
    """
    return disc_price() * (
        F.lit(1).cast(FRAC) + F.col("l_tax").cast(FRAC)
    )


CHARGE_SQL = (
    f"{DISC_PRICE_SQL} * (CAST(1 AS DECIMAL(8,2))"
    " + CAST(l_tax AS DECIMAL(8,2)))"
)
