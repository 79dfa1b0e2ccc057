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
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    return F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1).cast(MONEY) - F.col("l_discount").cast(MONEY)
    )


DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(30,4))"
    " * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4)))"
)


def charge() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax), exact decimal."""
    return disc_price() * (
        F.lit(1).cast(MONEY) + F.col("l_tax").cast(MONEY)
    )


CHARGE_SQL = (
    f"{DISC_PRICE_SQL} * (CAST(1 AS DECIMAL(30,4))"
    " + CAST(l_tax AS DECIMAL(30,4)))"
)
