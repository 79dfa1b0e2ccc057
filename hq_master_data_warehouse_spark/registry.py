"""Query catalog: every implemented operator registers itself here.

Each query is a pure function ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string that DuckDB runs on the same parquet
tables.  Ops whose semantics SQL cannot express (streaming state, LSH)
register without an oracle and get the driver's weaker rows-only check.

Column-name contract: every computed/aggregate column is aliased to the
SAME name in both formulations -- the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_catalog() -> None:
    """Import every module that registers queries (idempotent)."""
    from .plans import curation, flagship  # noqa: F401
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        dedup,
        distribution,
        filters,
        joins,
        layout,
        ledger,
        ml,
        multimodal,
        privacy,
        profile,
        relational_ext,
        sampling,
        setops,
        similarity,
        skew,
        text,
        windows,
    )
    from .sources import formats, ingest  # noqa: F401
    from .streaming import jobs  # noqa: F401
    from .plans import tpch  # noqa: F401
    from .plans import tpch_ext  # noqa: F401
