"""Parquet table loaders for the driver test fixtures.

Scans are declarative (``spark.read.parquet``) so Catalyst gets free
predicate pushdown, column pruning, and partition pruning -- the Spark
equivalent of the reference pushing filters into PostgREST querystrings
(SURVEY.md par.4.1).  Maps to SURVEY ops S1-S4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TEST_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S1: full scan + project-all).

    Column pruning / filter pushdown happen automatically once callers
    ``.select``/``.filter`` -- never pre-collect or pre-materialize here.

    ``events.ts`` is Parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL).  It is read as
    nanos-since-epoch via the nanosAsLong fallback and rebuilt as a
    microsecond TimestampType with integer division -- the same
    truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP,
    so both engines observe identical event times.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All ten fixture tables as lazily-planned DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TEST_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture as a SQL temp view so each operator is also
    reachable from ``spark.sql`` (SQL parity, SURVEY.md par.1.4)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
