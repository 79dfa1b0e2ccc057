"""Table profiling: per-column quality stats in one scan (engine
surface; the data-quality step every ingestion pipeline runs before
trusting a 100 TB feed).

One wide aggregate computes every column's stats in a single pass
(count / count-distinct / min / max are all partial-mergeable, so the
scan parallelizes and only one tiny row ever reaches the driver plan);
an explode then unpivots that row into one result row per column.
The alternative -- one aggregation query per column, which is what the
reference does for its 11 bucketed counts (SURVEY.md par.2.4 A1) --
would scan the table N times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loaders import load_table

PROFILE_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def profile_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: rows, non-null, distinct, min, max (min/max
    computed on the native type, then rendered as strings so every
    column shares one schema)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select("n_rows", F.explode(entries).alias("e")).select(
        F.col("e.col_name").alias("col_name"),
        "n_rows",
        F.col("e.n_nonnull").alias("n_nonnull"),
        F.col("e.n_distinct").alias("n_distinct"),
        F.col("e.min_val").alias("min_val"),
        F.col("e.max_val").alias("max_val"),
    )


def _col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM documents
    """


@query(
    "profile_table_stats",
    oracle=" UNION ALL ".join(_col_sql(c) for c in PROFILE_COLUMNS),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return profile_stats(docs, PROFILE_COLUMNS)


# -- Benford first-digit profile: the classic data-forensics check for
#    fabricated or truncated numeric columns, over o_totalprice.  The
#    first significant digit comes from string arithmetic on the
#    integer part (no log/pow on doubles, whose last-ULP behavior
#    could differ per engine); expected shares are the Benford
#    distribution log10(1 + 1/d) as literals.  One grouped count over
#    a map stage -- scales like any profile.
@query(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    t AS (SELECT COUNT(*) AS total FROM d)
    SELECT digit,
           COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / t.total, 6) AS share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share
    FROM d CROSS JOIN t
    GROUP BY digit, t.total
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        digit.alias("digit")
    )
    tot = d.agg(F.count("*").alias("total"))
    benford = F.array(
        *[F.lit(round(math.log10(1.0 + 1.0 / i), 6)) for i in range(1, 10)]
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "total")
        .agg(F.count("*").alias("n"))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.element_at(benford, F.col("digit")).alias("benford_share"),
        )
    )
