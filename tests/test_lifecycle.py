"""Invariant tests for the round-4 lifecycle/graph/integrity wave
(oracle equality is covered by tests/test_catalog.py; these pin the
semantic and plan-shape properties SQL equality alone cannot)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hq_master_data_warehouse_spark import registry
from hq_master_data_warehouse_spark.operators.joins import (
    _BLOOM_K,
    _BLOOM_M,
    _bloom_words,
)

registry.load_catalog()

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry.QUERIES[name](spark, SF)


def test_cdc_apply_no_deleted_keys_and_unique(spark):
    out = _run(spark, "ingest_cdc_apply").collect()
    keys = [r["user_id"] for r in out]
    assert len(keys) == len(set(keys)), "snapshot must be one row/key"
    assert all(r["last_op"] in ("I", "U") for r in out)


def test_streaks_bounds(spark):
    out = _run(spark, "events_activity_streaks").collect()
    for r in out:
        assert 1 <= r["max_streak"] <= r["active_days"]
        assert r["n_streaks"] >= 1
        # streaks partition the active days
        assert r["active_days"] >= r["n_streaks"]


def test_km_survival_monotone_nonincreasing(spark):
    rows = sorted(
        _run(spark, "orders_survival_km").collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows, "estimator must emit at least one event time"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9
        assert r["n_events"] <= r["n_risk"]
        prev = r["survival"]
    # n_risk is non-increasing in t
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_vshape_rows_are_strict_troughs(spark):
    for r in _run(spark, "window_pattern_vshape").collect():
        assert r["decline"] > 0 and r["recovery"] > 0


def test_association_rules_ppm_ranges(spark):
    rows = _run(spark, "basket_association_rules").collect()
    assert len(rows) <= 20
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert 0 < r["conf_ppm"] <= 1_000_000
        assert r["n_ab"] >= 3


def test_referential_integrity_edges_and_zero_orphans(spark):
    rows = _run(spark, "dq_referential_integrity").collect()
    assert len(rows) == 7
    # driver fixtures are FK-consistent: the audit must report clean
    assert all(r["orphan_rows"] == 0 for r in rows)
    assert all(r["child_rows"] > 0 for r in rows)


def test_weighted_median_is_exact_half_point(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    data = li.collect()
    out = {
        r["flag"]: r["weighted_median"]
        for r in _run(spark, "agg_weighted_median").collect()
    }
    flags = {r["flag"] for r in data}
    assert set(out) == flags
    for flag in flags:
        pairs = sorted(
            (r["cents"], r["q"]) for r in data if r["flag"] == flag
        )
        tot = sum(q for _, q in pairs)
        acc = 0
        for cents, q in pairs:
            acc += q
            if 2 * acc >= tot:
                assert out[flag] == cents / 100.0
                break


def test_triangle_count_toy_graph_model(spark):
    # triangle {1,2,3} plus pendant edge 3-4: 1 triangle, 2 wedges
    # open at node 3 (pairs {1,4},{2,4}) -> wedges = C(2,2)x2 nodes
    # deg: 1:2, 2:2, 3:3, 4:1 -> sum C(d,2) = 1+1+3+0 = 5
    from hq_master_data_warehouse_spark.operators.graph import (  # noqa: F401
        graph_triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .count()
    )
    degs = {r["node"]: r["count"] for r in deg.collect()}
    assert degs == {1: 2, 2: 2, 3: 3, 4: 1}
    # the registered query on the fixture: clustering in (0, 1e6]
    row = _run(spark, "graph_triangle_count").collect()[0]
    assert row["n_triangles"] >= 0
    assert 0 <= row["clustering_ppm"] <= 1_000_000
    # sanity: triangles cannot exceed wedges / 3... (3T <= wedges)
    # via the ppm definition: clustering_ppm = 3T/wedges <= 1e6


def test_l_diversity_flags_consistent(spark):
    for r in _run(spark, "privacy_l_diversity").collect():
        assert r["l_distinct"] <= r["k_size"]
        assert r["is_safe"] == (
            r["k_size"] >= 5 and r["l_distinct"] >= 3
        )


def test_bloom_contains_all_build_keys_and_prunes(spark):
    dim = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = _bloom_words(dim, "c_custkey")
    assert len(words) == _BLOOM_M // 64
    bitmap = F.lit(words)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey"
    )
    cond = None
    for i in range(_BLOOM_K):
        pos = F.pmod(
            F.xxhash64(F.col("o_custkey"), F.lit(i)), F.lit(_BLOOM_M)
        )
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        hit = F.bit_get(word, (pos % 64).cast("int")) == 1
        cond = hit if cond is None else (cond & hit)
    n_facts = orders.count()
    n_candidates = orders.filter(cond).count()
    n_true = orders.join(
        dim, orders["o_custkey"] == dim["c_custkey"], "left_semi"
    ).count()
    # no false negatives, and the prefilter must actually prune
    assert n_true <= n_candidates < n_facts


def test_bloom_plan_has_no_extra_shuffle(spark):
    df = registry.QUERIES["join_bloom_prefilter"](spark, SF)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    # one exchange for the final groupBy only -- the probe filter
    # must not introduce its own shuffle or a Python eval
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ppm_division_is_half_away_exact():
    from hq_master_data_warehouse_spark.operators.lifecycle import (
        _ppm_sql,
    )

    import duckdb

    con = duckdb.connect()
    # 1/640 = 0.0015625 exactly: the ROUND-on-double hazard case the
    # integer formulation exists to dodge (ties round AWAY -> 1563)
    (v,) = con.execute(
        "SELECT " + _ppm_sql("1", "640")
    ).fetchone()
    assert v == 1563
    (v,) = con.execute(
        "SELECT " + _ppm_sql("1", "3")
    ).fetchone()
    assert v == 333333  # 333333.33 floors
    (v,) = con.execute(
        "SELECT " + _ppm_sql("2", "3")
    ).fetchone()
    assert v == 666667  # 666666.67 rounds up


def test_gini_matches_bruteforce(spark):
    import pyspark.sql.functions as FF

    out = _run(spark, "agg_gini_revenue").collect()[0]
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            FF.col("o_custkey").alias("ck"),
            FF.round(FF.col("o_totalprice") * 100)
            .cast("long")
            .alias("c"),
        )
        .groupBy("ck")
        .agg(FF.sum("c").alias("cents"))
        .collect()
    )
    xs = sorted((r["cents"], r["ck"]) for r in rows)
    n = len(xs)
    t = sum(c for c, _ in xs)
    s = sum((i + 1) * c for i, (c, _) in enumerate(xs))
    gini = (2.0 * s - (n + 1.0) * t) / (n * 1.0 * t)
    assert out["n_customers"] == n
    assert abs(out["gini"] - round(gini, 6)) < 1e-9
    assert 0.0 <= out["gini"] < 1.0


def test_abc_classes_partition_and_order(spark):
    rows = {r["abc_class"]: r for r in _run(
        spark, "orders_abc_classification").collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r["class_revenue"] for r in rows.values())
    # A holds at most 80% (boundary-exclusive beyond) and more
    # revenue per part than C
    assert rows["A"]["class_revenue"] <= 0.8 * total + 0.01
    a_rpp = rows["A"]["class_revenue"] / rows["A"]["n_parts"]
    c_rpp = rows["C"]["class_revenue"] / rows["C"]["n_parts"]
    assert a_rpp > c_rpp


def test_average_precision_matches_bruteforce(spark):
    out = _run(spark, "ml_average_precision").collect()[0]
    from hq_master_data_warehouse_spark.operators.ml import (
        BIAS,
        WEIGHTS,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    scored = sorted(
        (
            -(sum(float(x) * w for x, w in zip(r["embedding"], WEIGHTS))
              + BIAS),
            r["vec_id"],
            r["label"] % 2 == 1,
        )
        for r in rows
    )
    ap, cum = 0.0, 0
    for k, (_, _, pos) in enumerate(scored, start=1):
        if pos:
            cum += 1
            ap += cum / k
    ap /= cum
    assert out["n_pos"] == cum
    assert abs(out["avg_precision"] - round(ap, 5)) < 1e-9


def test_txn_compact_single_file_preserves_history(spark):
    from hq_master_data_warehouse_spark.sources.txn_log import (
        build_txn_table,
        compact_table,
        live_files,
        read_snapshot,
    )

    td = build_txn_table(spark, SF, variant="compact")
    v = compact_table(spark, td)  # idempotent on re-run
    assert v == compact_table(spark, td)
    assert len(live_files(td)) == 1
    # compaction is content-neutral AND history stays time-travelable
    head = read_snapshot(spark, td).count()
    pre = read_snapshot(spark, td, version=2).count()
    v1 = read_snapshot(spark, td, version=1).count()
    assert head == pre
    assert v1 < pre


def test_t_closeness_bounds_and_consistency(spark):
    rows = _run(spark, "privacy_t_closeness").collect()
    assert rows
    for r in rows:
        assert 0 <= r["t_ppm"] <= 1_000_000
        assert r["is_close"] == (r["t_ppm"] <= 200_000)
    # the whole-table "group" would have t = 0: every group's t is a
    # divergence FROM the global distribution, so at least one group
    # must be nonzero on real data
    assert any(r["t_ppm"] > 0 for r in rows)


def test_interarrival_stats_ordering(spark):
    r = _run(spark, "events_interarrival_stats").collect()[0]
    assert 0 <= r["min_gap_s"] <= r["median_gap_s"] <= r["max_gap_s"]
    assert r["n_gaps"] > 0


def test_duplicate_key_audit_finds_real_fixture_issue(spark):
    rows = {r["pk"]: r for r in _run(
        spark, "dq_duplicate_key_audit").collect()}
    assert len(rows) == 5
    # single-column keys are clean in the fixtures...
    for pk in (
        "customer.c_custkey",
        "orders.o_orderkey",
        "part.p_partkey",
        "supplier.s_suppkey",
    ):
        assert rows[pk]["duplicate_keys"] == 0
        assert rows[pk]["extra_rows"] == 0
        assert rows[pk]["n_keys"] > 0
    # ...but the synthetic generator does NOT enforce lineitem's
    # composite (l_orderkey, l_linenumber) key -- a REAL data-quality
    # issue in the fixture that this audit exists to surface
    li = rows["lineitem.(l_orderkey,l_linenumber)"]
    assert li["duplicate_keys"] > 0
    assert li["extra_rows"] >= li["duplicate_keys"]


def test_shap_linear_matches_bruteforce(spark):
    from hq_master_data_warehouse_spark.operators.ml import WEIGHTS

    out = _run(spark, "ml_shap_linear_attribution").collect()
    assert len(out) == 10
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    n = len(rows)
    xq = [
        [round(float(x) * 1_000_000) for x in r["embedding"]]
        for r in rows
    ]
    phis = []
    for i, w in enumerate(WEIGHTS):
        s = sum(col[i] for col in xq)
        disp = sum(abs(n * col[i] - s) for col in xq)
        phis.append((round(abs(w) * disp / (n * n * 1e6), 6), i, w))
    phis.sort(key=lambda t: (-t[0], t[1]))
    for got, (phi, i, w) in zip(out, phis[:10]):
        assert got["feature"] == i
        assert got["weight"] == w
        assert abs(got["mean_abs_phi"] - phi) < 1e-9
