"""Invariant tests for the statistics family (operators/stats.py and
the binned range join in operators/joins.py): closed-form results are
checked against independent Python/numpy recomputations, and the
range-join plan is pinned to a hash join (never a nested loop).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.operators import joins, stats
from hq_master_data_warehouse_spark.sources.loaders import load_table

from tests.conftest import SF_DIR_001


def test_ols_matches_numpy(spark):
    import numpy as np

    rows = stats.ml_ols_daily_trend(spark, SF_DIR_001).collect()
    orders = load_table(spark, SF_DIR_001, "orders").select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    ).collect()
    by_prio: dict[str, list] = {}
    for r in orders:
        by_prio.setdefault(r.o_orderpriority, []).append((r.x, r.y))
    assert len(rows) == len(by_prio)
    for r in rows:
        pts = by_prio[r.o_orderpriority]
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert r.n == len(pts)
        assert r.slope_cents_per_day == pytest.approx(slope, rel=1e-6)
        assert r.intercept_cents == pytest.approx(intercept, rel=1e-6)
        rr = np.corrcoef(x, y)[0, 1] ** 2
        assert r.r_squared == pytest.approx(rr, abs=1e-6)


def test_ab_test_counts_and_z(spark):
    row = stats.ml_ab_test_ztest(spark, SF_DIR_001).collect()[0]
    users = (
        load_table(spark, SF_DIR_001, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_a + row.n_b == users
    assert 0 <= row.x_a <= row.n_a and 0 <= row.x_b <= row.n_b
    # recompute the pooled z independently
    p1, p2 = row.x_a / row.n_a, row.x_b / row.n_b
    p = (row.x_a + row.x_b) / (row.n_a + row.n_b)
    z = (p1 - p2) / math.sqrt(
        p * (1 - p) * (1 / row.n_a + 1 / row.n_b)
    )
    assert row.z_score == pytest.approx(z, abs=1e-6)


def test_crossval_folds_partition_orders(spark):
    rows = stats.ml_crossval_folds(spark, SF_DIR_001).collect()
    total = load_table(spark, SF_DIR_001, "orders").count()
    assert sorted(r.fold for r in rows) == list(range(5))
    assert sum(r.n_orders for r in rows) == total
    # md5 is uniform: no fold should hold more than half the data
    assert max(r.n_orders for r in rows) < total / 2


def test_autocorrelation_bounds_and_pairs(spark):
    rows = stats.events_autocorrelation(spark, SF_DIR_001).collect()
    days = (
        load_table(spark, SF_DIR_001, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    assert sorted(r.lag for r in rows) == list(range(1, 8))
    for r in rows:
        assert abs(r.autocorr) <= 1.0 + 1e-9
        # the fixture's January stream has no gap days, so pair count
        # is exactly days - lag
        assert r.n_pairs == days - r.lag


def test_seasonality_index_weighted_mean_is_one(spark):
    rows = stats.orders_dow_seasonality(spark, SF_DIR_001).collect()
    assert sorted(r.dow for r in rows) == list(range(7))
    # sum over dows of (index * n_days) / total_days == 1 exactly by
    # construction (both numerator chains share the same total)
    total_days = sum(r.n_days for r in rows)
    weighted = sum(r.seasonality_index * r.n_days for r in rows)
    assert weighted / total_days == pytest.approx(1.0, abs=1e-4)


def test_equidepth_decile_populations(spark):
    rows = sorted(
        stats.agg_histogram_equidepth(spark, SF_DIR_001).collect(),
        key=lambda r: r.decile,
    )
    total = load_table(spark, SF_DIR_001, "orders").count()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_orders for r in rows) == total
    # NTILE semantics: sizes differ by at most 1, big buckets first
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)
    # price bands are non-overlapping and increasing
    for lo, hi in zip(rows, rows[1:]):
        assert lo.hi_price <= hi.lo_price
        assert lo.lo_price <= lo.hi_price


def test_range_binned_equals_naive_and_plan(spark):
    binned = joins.join_range_binned(spark, SF_DIR_001)
    # plan: the bin trick must turn the interval predicate into a
    # hash equi-join -- no nested loop, no cartesian product
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # semantics: identical to the naive inequality formulation, which
    # Spark CAN still execute at fixture scale (as a BNLJ)
    events = load_table(spark, SF_DIR_001, "events")
    w = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("w_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    probe = events.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_type").alias("e_type"),
        F.col("value").alias("e_value"),
    )
    naive = (
        w.join(
            probe,
            (F.col("w_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("w_start"))
            & (F.col("e_ts") < F.col("w_end")),
            "left",
        )
        .groupBy("window_id")
        .agg(
            F.count("e_id").alias("n_follow"),
            F.sum(
                F.when(F.col("e_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchase"),
            F.coalesce(
                F.sum(F.round(F.col("e_value") * 100).cast("long")),
                F.lit(0),
            ).alias("follow_value_cents"),
        )
    )
    got = {r.window_id: r.asDict() for r in binned.collect()}
    want = {r.window_id: r.asDict() for r in naive.collect()}
    assert got == want
    # at least one window actually observed follow-up traffic,
    # otherwise the equivalence is vacuous
    assert any(r["n_follow"] > 0 for r in got.values())
