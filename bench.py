#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once as a warm-up (forces plan compilation and
page-cache priming), then REPS timed runs measured to full
materialization (noop sink -- no driver collect of big results).
Reps are INTERLEAVED round-robin across queries (pass 1 of every
query, then pass 2, ...) so one busy window on a shared box cannot
capture all of a single query's reps.

Two estimators are reported side by side (ADVICE r5: min-of-reps is
optimistically biased, and a mid-series estimator switch made
round-over-round ratios ambiguous):

- "queries"/"value": MINIMUM of the reps.  Host noise is strictly
  one-sided -- contention only ever ADDS time -- so min over
  interleaved passes is the consistent estimator of engine cost
  (same reasoning as timeit's min-of-repeats).
- "queries_median"/"value_median": MEDIAN of the reps, the robust
  central estimator; use THIS for round-over-round comparisons.

The full per-rep spread is still emitted to stderr as one JSON line
({"reps": ...}).  The headline stdout line is compact-separated and
must stay under ~2 kB: the driver tails only ~2 kB and parses the
LAST line (VERDICT r4 item 2 -- inlining "reps" truncated the r4
record to parsed:null).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hq_master_data_warehouse_spark import registry
from hq_master_data_warehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# 4 reps = 5 total passes (warm-up + timed): enough samples for a
# robust min while staying near the 4-pass runtime envelope every
# prior driver round completed inside (worst observed noisy pass is
# ~2.5x a clean one; an unknown driver timeout must not be risked).
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4")))

# Headline set: flagship + the heaviest representative per family.
HEADLINE = [
    "flagship_range_counts",
    "anti_join_exclude_sent",
    "capacity_distribution",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_orders",
    "bucketed_colocated_join",
    "asof_join_latest_order",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_quality_scores",
    "pipeline_corpus_curation",
    "events_tumbling_window",
    "text_contamination_check",
    "embedding_quantize_int8",
    "events_cohort_retention",
    # round 2 additions
    "dedup_exact_substring",
    "dedup_embedding_cosine",
    "text_unigram_surprisal",
    "orders_rfm_scores",
    "egress_retry_audit",
    # round 4 additions
    "graph_pagerank_copurchase",
    "ml_ks_statistic",
    "ml_bootstrap_mean_ci",
    "sketch_cms_heavy_hitters",
    "join_range_binned",
    # round 6 additions (new cells have no r1 baseline; cross-round
    # ratios stay on the common subset)
    "graph_connected_components",
    "orders_pareto_skyline",
    "events_peak_concurrency",
    "sketch_bloom_membership",
    # round-6 continuation additions (same no-r1-baseline caveat)
    "graph_kcore_decomposition",
    "ml_permutation_test",
    "dedup_tfidf_cosine_pairs",
    "ml_adaboost_stumps",
    # round 9 additions (VERDICT r8 item 3): regression-track the slow
    # tail -- modularity is the slowest known cell -- plus the r8
    # curated wave and the rewritten simhash (same no-r1-baseline
    # caveat; cross-round ratios stay on the common subset)
    "graph_modularity_score",
    "dq_tukey_fence_outliers",
    "window_ewma_customer_revenue",
    "ml_precision_recall_at_k",
    "dedup_simhash",
    # round 10 additions (VERDICT r9 item 2): the r9 curated wave --
    # the two slowest known cells plus the rewritten file-level CDF.
    # split_leakage_safe and the graph/dedup CC consumers now read
    # the shared matcache materialization (built on the warm-up
    # pass), so their cells measure the consumer plan, not the
    # once-per-snapshot component build.
    "split_leakage_safe",
    "dedup_incremental_lsh",
    "source_txn_log_changes",
    # round 11 addition (VERDICT r10 item 6): the slowest known
    # operation -- full txn-table staging + compaction + Delta export
    # + read-back (had a real listing-scale bug in r10; min-of-REPS
    # regression tracking is exactly for this).  The warm-up pass
    # pays the one-time staging; timed reps measure
    # compact/export/read-back on the staged table.
    "layout_delta_export_roundtrip",
]


def _materialize(df) -> None:
    """Force full execution without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


# Calibration cell (VERDICT r11 item 3): a fixed, DATA-INDEPENDENT,
# CPU-bound workload timed alongside the query cells so cross-round
# totals can be drift-normalized mechanically instead of argued from
# same-day brackets (host wall-clock varies up to ~2.3x across
# sessions on this box; r9-r11 each burned verdict space bisecting
# it).  768M generated longs through codegen'd multiply/mod/xxhash64
# into one bounded sum: no input data, no shuffle beyond the scalar
# gather, ~0.9 s on a quiet host.  Normalization: ratio of two
# rounds' "calib" fields estimates their host-speed ratio; divide a
# round's total by its calib to compare engine cost across rounds.
CALIB_N = 768_000_000
CALIB_CHECKSUM = 383929118346397362


def _calibration(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    s = (
        spark.range(0, CALIB_N, 1, int(CPUS))
        .select(
            F.sum(
                F.pmod(
                    F.xxhash64((F.col("id") * 2654435761) % 1000003),
                    F.lit(1_000_000_007),
                )
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    dt = time.perf_counter() - t0
    # RuntimeError, not assert: under `python -O` asserts are stripped
    # and the drift-normalization gauge would silently report timings
    # from a wrong computation (ADVICE r12).
    if s != CALIB_CHECKSUM:
        raise RuntimeError(f"calibration checksum drift: {s}")
    return dt


def headline_json(
    all_reps: dict[str, list[float]],
    sf_dir: str,
    calib: list[float] | None = None,
) -> str:
    """Build the single compact stdout headline line (min AND median
    estimators per query, plus the calibration cell).  Kept as a pure
    function so the tail-size and no-reps contracts are testable
    without a SparkSession."""
    timings = {n: round(min(r), 3) for n, r in all_reps.items()}
    medians = [
        round(statistics.median(all_reps[n]), 2) for n in timings
    ]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Byte budget: the driver tail is exactly 2,000 chars and the
    # headline must survive intact as the last line, so keys/strings
    # are kept terse -- "med" is an ARRAY of per-query median-of-reps
    # values aligned with the "queries" key order (repeating the 33
    # query names would blow the tail budget).
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "value_median": round(sum(medians), 3),
        "unit": "sec",
        "estimator": f"min-of-{REPS};med=median-of-{REPS}",
        "queries": timings,
        "med": medians,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if calib:
        # host-speed gauge, NOT part of the totals: divide a round's
        # value/value_median by its calib to drift-normalize
        # cross-round comparisons
        out["calib"] = round(min(calib), 3)
        out["calib_med"] = round(statistics.median(calib), 2)
    return json.dumps(out, separators=(",", ":"))


def main() -> None:
    registry.load_catalog()
    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    all_reps: dict[str, list[float]] = {n: [] for n in names}
    calib: list[float] = []
    _calibration(spark)  # warm-up (codegen compile)
    for name in names:  # warm-up pass (plan compile + cache)
        _materialize(registry.QUERIES[name](spark, SF_DIR))
    for _ in range(REPS):  # interleaved timed passes
        calib.append(round(_calibration(spark), 4))
        for name in names:
            t0 = time.perf_counter()
            _materialize(registry.QUERIES[name](spark, SF_DIR))
            all_reps[name].append(round(time.perf_counter() - t0, 4))
    # per-rep spread goes to stderr so it stays auditable without
    # bloating stdout: the driver tails only ~2 kB of stdout, and the
    # compact headline JSON must be the LAST line (VERDICT r4 item 2 --
    # inlining "reps" truncated the r4 record to parsed:null).
    print(json.dumps({"reps": all_reps, "calib": calib}), file=sys.stderr)
    print(headline_json(all_reps, SF_DIR, calib))
    spark.stop()


if __name__ == "__main__":
    main()
