"""Skew-activation proof (VERDICT r6 item 5 / r7 item 6).

A deliberately skewed fixture -- ONE orderkey holding ~25% of all
lineitem rows -- pins three claims SCALE.md makes about the skew
playbook, at the level that actually matters at 100 TB (per-reducer
load), not wall-clock on a 60k-row fixture where scheduling noise
dominates:

1. ``skew_salted_aggregate``'s phase-1 spreads the hot group across
   the salt domain: the max partial-group size drops ~N_SALTS-fold
   and the hot key's rows land on many shuffle partitions instead of
   one (the unsalted plan's straggler reducer).
2. ``skew_salted_join``'s probe salting does the same for the hot
   join key, with results bit-identical to the unsalted join.
3. AQE's skew-join handling FIRES on the naive unsalted shuffle join
   over the same fixture (``skew=true`` in the final adaptive SMJ),
   confirming the engine-default path degrades gracefully when a
   pipeline skips explicit salting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.operators.skew import N_SALTS

SF_01 = "/root/testdata/sf0.01"
HOT_KEY = 1  # every TPC-H sf has orderkey 1


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    """Skewed twin of sf0.01: ~25% of lineitem rows remapped onto one
    hot orderkey (one customer's order dominating the fact table)."""
    from pyspark.sql.window import Window

    root = tmp_path_factory.mktemp("skewed_fixture")
    li = spark.read.parquet(f"{SF_01}/lineitem.parquet")
    hot = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(4)) == 0
    remapped = li.withColumn(
        "l_orderkey",
        F.when(hot, F.lit(HOT_KEY)).otherwise(F.col("l_orderkey")),
    )
    # renumber lines within each (now possibly giant) order so
    # (l_orderkey, l_linenumber) stays a unique key -- the property
    # the production salt formula relies on.  The hot-key window is
    # single-partition, fine at fixture scale.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_partkey", "l_suppkey", "l_linenumber"
    )
    remapped.withColumn(
        "l_linenumber", F.row_number().over(w)
    ).write.mode("overwrite").parquet(f"{root}/lineitem.parquet")
    spark.read.parquet(f"{SF_01}/orders.parquet").write.mode(
        "overwrite"
    ).parquet(f"{root}/orders.parquet")
    return str(root)


def _partition_rows(df, *keys):
    """rows per shuffle partition after hash-repartitioning on keys,
    restricted to the hot key -- the straggler-load measurement.
    256 partitions so the 16 salt values rarely collide in the same
    bucket (at 32, birthday collisions blur the fan-out the test is
    trying to observe; a real cluster runs thousands of reducers)."""
    return (
        df.repartition(256, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .filter(F.col("l_orderkey") == HOT_KEY)
        .groupBy("_pid")
        .count()
        .collect()
    )


def test_fixture_is_actually_skewed(spark, skewed):
    li = spark.read.parquet(f"{skewed}/lineitem.parquet")
    total = li.count()
    hot = li.filter(F.col("l_orderkey") == HOT_KEY).count()
    assert hot / total > 0.2  # one key holds >20% of the fact table


def test_salted_aggregate_spreads_hot_group(spark, skewed):
    li = spark.read.parquet(f"{skewed}/lineitem.parquet")
    hot_n = li.filter(F.col("l_orderkey") == HOT_KEY).count()
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    salted = li.withColumn("salt", salt)

    # unsalted: the whole hot group is ONE reducer's partial
    unsalted_parts = _partition_rows(li, "l_orderkey")
    assert len(unsalted_parts) == 1
    assert unsalted_parts[0]["count"] == hot_n

    # salted: the hot group fans out across the salt domain; max
    # per-reducer share collapses ~N_SALTS-fold
    salted_parts = _partition_rows(salted, "l_orderkey", "salt")
    assert len(salted_parts) > N_SALTS // 2
    max_share = max(r["count"] for r in salted_parts)
    assert max_share < hot_n / (N_SALTS / 4)

    # phase-2 merge input is |keys|*N_SALTS tiny rows, and the merged
    # result is bit-identical to the single-phase aggregate
    partial = salted.groupBy("l_orderkey", "salt").agg(
        F.count("*").alias("pn")
    )
    merged = dict(
        partial.groupBy("l_orderkey")
        .agg(F.sum("pn").alias("n"))
        .filter(F.col("l_orderkey") == HOT_KEY)
        .collect()
    )
    assert merged[HOT_KEY] == hot_n


def test_salted_join_spreads_hot_key_and_matches_unsalted(
    spark, skewed
):
    li = spark.read.parquet(f"{skewed}/lineitem.parquet")
    orders = spark.read.parquet(f"{skewed}/orders.parquet")

    probe = li.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)),
    )
    build = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias(
            "salt"
        ),
    )
    salted = (
        probe.join(
            build,
            (probe.l_orderkey == build.o_orderkey)
            & (probe.salt == build.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("revenue"),
        )
    )
    unsalted = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("revenue"),
        )
    )
    key = lambda r: r["o_orderpriority"]  # noqa: E731
    assert sorted(map(tuple, salted.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, unsalted.collect()), key=lambda t: t[0]
    )

    # distribution: the hot key's probe rows shuffle to many
    # partitions when keyed on (key, salt), one partition without
    assert len(_partition_rows(li, "l_orderkey")) == 1
    assert len(_partition_rows(probe, "l_orderkey", "salt")) > N_SALTS // 2


def test_aqe_skew_join_fires_on_naive_plan(spark, skewed):
    """The engine-default fallback: with no explicit salting, AQE's
    runtime skew-split must recognize the hot partition of the naive
    shuffle join.  Thresholds are lowered to make the 1.5 MB fixture
    partition count as 'skewed' -- at real scale the defaults
    (256 MB / 5x median) play the same role."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
        # Two preconditions the 60k-row fixture must reproduce for
        # the runtime rule to see what a 100 TB run would see:
        # 1. payload bytes -- a key-only projection of the hot
        #    partition is 15k IDENTICAL longs, which lz4 compresses
        #    below any threshold (the detector reads COMPRESSED
        #    map-output sizes), so keep the full row width;
        # 2. multiple map tasks -- AQE splits a skewed reduce
        #    partition along MAPPER boundaries, so a single-file scan
        #    (one mapper) makes the hot partition atomic and the rule
        #    a silent no-op.  repartition(16) gives the join shuffle
        #    a 16-task map side, like any real multi-split scan.
        li = spark.read.parquet(f"{skewed}/lineitem.parquet").repartition(
            16
        )
        orders = spark.read.parquet(f"{skewed}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        joined = li.hint("MERGE").join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        # collect THIS DataFrame: write()/count() spawn their own
        # QueryExecution, whose adaptive plan never finalizes on
        # `joined` -- the earlier noop-sink version read
        # isFinalPlan=false and missed the runtime skew split.
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
