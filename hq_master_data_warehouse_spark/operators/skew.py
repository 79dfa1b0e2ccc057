"""Skew-mitigation operators (engine surface for the 100 TB design
goal; no reference citation -- SURVEY.md §4.2's "hazards to design
around" and SCALE.md's skew notes made executable).

AQE's skew-join split handles most hot keys automatically, but two
patterns still need explicit salting at 100 TB:

* a grouped aggregate where one key holds a double-digit percentage of
  all rows (a single reducer becomes the straggler even after AQE
  coalescing) -- fixed by two-phase aggregation over a salted key;
* a shuffle join where the build side cannot be broadcast and one join
  key is hot -- fixed by salting the probe side and replicating the
  build side across the salt domain.

Both operators are semantically transparent: their oracles are the
plain unsalted SQL, so the differential check proves the rewrite
changes the physical distribution only.

Salts are deterministic (derived from stable row attributes, not
``rand()``) so plans stay reproducible and re-executable -- a retry of
a failed stage must re-derive the same salt or the two phases
disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import MONEY, dec_sum, dec_sum_sql
from ..registry import query
from ..sources.loaders import load_table

#: salt fan-out: one hot key is split across this many partial groups.
N_SALTS = 16


# -- two-phase salted aggregation: groupBy(key, salt) partial, then
#    groupBy(key) merge.  Decimal partials make the merge exact, so
#    the result is bit-identical to the single-phase plan.
@query(
    "skew_salted_aggregate",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {dec_sum_sql('l_extendedprice', 'total_price')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1 spreads each l_returnflag group (3 values over the whole
    fact table -- maximal key skew) over N_SALTS partial groups keyed
    by a hash-derived salt; phase 2 merges the partials.  At 100 TB
    the merge input is |keys| * N_SALTS tiny rows instead of the raw
    table, so no reducer sees a whole hot key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    salt = F.pmod(
        F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)
    )
    partial = (
        lineitem.withColumn("salt", salt)
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("l_extendedprice").cast(MONEY)).alias("ps"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("ps").cast("double").alias("total_price"),
    )


# -- salted shuffle join: probe side (lineitem) gets a deterministic
#    salt in [0, N_SALTS); build side (orders) is replicated across
#    the full salt domain via explode, then the join runs on
#    (key, salt) -- a hot orderkey's rows land on N_SALTS reducers
#    instead of one.
@query(
    "skew_salted_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {dec_sum_sql('l.l_extendedprice', 'revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-domain replication is the demo shape; a production pipeline
    first detects hot keys (approx count per key) and replicates only
    those, joining the cold remainder unsalted."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    probe = lineitem.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)),
    )
    build = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("salt"),
    )
    return (
        probe.join(
            build,
            (probe.l_orderkey == build.o_orderkey)
            & (probe.salt == build.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dec_sum("l_extendedprice", "revenue"),
        )
    )


# -- hot-key detection: the operational complement of the two salted
#    rewrites above -- production salts ONLY detected hot keys, so the
#    detector is the first stage of the skew playbook.  One grouped
#    count (partial+final), a broadcast 1-row mean, and a distributed
#    top-k (TakeOrderedAndProject) -- nothing here is ever table-sized
#    on a single task.  skew_ratio = key count / mean key count; keys
#    above ~an order of magnitude are salting candidates.
@query(
    "skew_detect_hot_keys",
    oracle="""
    WITH per_key AS (
        SELECT l_suppkey AS key, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_suppkey
    ),
    m AS (SELECT AVG(CAST(cnt AS DOUBLE)) AS mean_cnt FROM per_key)
    SELECT key, cnt,
           ROUND(cnt / m.mean_cnt, 6) AS skew_ratio
    FROM per_key, m
    ORDER BY cnt DESC, key
    LIMIT 10
    """,
)
def skew_detect_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_key = lineitem.groupBy(
        F.col("l_suppkey").alias("key")
    ).agg(F.count("*").alias("cnt"))
    mean = per_key.agg(
        F.avg(F.col("cnt").cast("double")).alias("mean_cnt")
    )
    return (
        per_key.crossJoin(F.broadcast(mean))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("mean_cnt"), 6).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )
