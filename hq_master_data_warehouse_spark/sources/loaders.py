"""Parquet table loaders for the driver test fixtures.

Scans are declarative (``spark.read.parquet``) so Catalyst gets free
predicate pushdown, column pruning, and partition pruning -- the Spark
equivalent of the reference pushing filters into PostgREST querystrings
(SURVEY.md par.4.1).  Maps to SURVEY ops S1-S4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TEST_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S1: full scan + project-all).

    Column pruning / filter pushdown happen automatically once callers
    ``.select``/``.filter`` -- never pre-collect or pre-materialize here.
    """
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All ten fixture tables as lazily-planned DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TEST_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture as a SQL temp view so each operator is also
    reachable from ``spark.sql`` (SQL parity, SURVEY.md par.1.4)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
