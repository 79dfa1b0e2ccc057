"""Full-registry plan lint: EVERY registered query's physical plan is
checked for (1) the one shape that is never acceptable in this engine
-- an unbounded CartesianProduct -- and (2) unpartitioned WindowExec
specs, which put their whole input through ONE task and are allowed
only over provably bounded inputs.  (Broadcast nested-loop joins of
1-row scalar aggregates are the sanctioned scalar-join shape and are
NOT flagged; targeted per-family expectations -- broadcast pins,
TakeOrdered, partial aggregation -- live in tests/test_plans.py.)

This is the registry-wide safety net: a Spark upgrade or a refactor
that silently degrades any of the 370+ plans to a cartesian -- or
adds a global sort-window over row-scale data -- fails CI here even
if the query has no dedicated plan pin.

Window policy (r11, after the _global_cumsum sweep converted the
row-scale offenders -- mann-whitney/wilcoxon/wasserstein/winsorized/
conformal/interarrival cumulative ranks, the zipf vocabulary rank,
q15's global max, the flag-partitioned weighted median):

- specs whose leading ORDER column is ``_b`` or ``bucket`` are the
  sanctioned two-pass-helper shape (_global_rank/_global_cumsum/
  nextfit prefix windows over per-bucket COUNT tables, bounded by
  the bucket domain, never the input) -- always allowed;
- every other unpartitioned spec must be registered in
  ALLOWED_GLOBAL_WINDOWS with its boundedness argument.
"""

from __future__ import annotations

import re

import pytest

from hq_master_data_warehouse_spark import registry

registry.load_catalog()

SF = "/root/testdata/sf0.001"

#: audited global-window users and WHY their window input is bounded
#: (never grows with corpus row count).  A query appearing here may
#: still fail test_plans pins; this list only sanctions the
#: unpartitioned window itself.
_CAL = "calendar-grain series (one row per day/month/event time)"
_HEAD = "limit-K head (<= a few hundred rows by construction)"
_BINS = "fixed bin/band/decile grid (bounded value domain)"
ALLOWED_GLOBAL_WINDOWS = {
    # reference W1 pagination semantics: the window runs on an
    # already-LIMITed page head, see joins.py/windows.py comments
    "anti_join_exclude_sent": _HEAD,
    "pagination_offset_limit": _HEAD,
    # retrieval-eval rankings over top-K cuts (TakeOrdered pinned in
    # test_plans)
    "ml_ndcg_at_k": _HEAD,
    "similarity_rerank_rrf": _HEAD,
    "text_corpus_top_ngrams": _HEAD,
    # calendar-grain series ops: the window input is the per-day /
    # per-month aggregate, bounded by the observed time span
    "events_cusum_changepoint": _CAL,
    "events_granger_causality": _CAL,
    "events_rank_corr_spearman": _CAL + " (ranks of daily counts)",
    "ml_durbin_watson": _CAL,
    "orders_backlog_clamped": _CAL,
    "orders_concurrent_backlog": _CAL,
    "orders_daily_drawdown": _CAL,
    "orders_forecast_backtest": _CAL,
    "orders_forecast_holt": _CAL,
    "orders_forecast_ses": _CAL,
    "orders_runs_test_daily": _CAL,
    "orders_seasonal_decomposition": _CAL,
    "orders_segmented_trend": _CAL,
    "window_bollinger_bands": _CAL,
    "window_month_over_month": _CAL,
    "window_pattern_vshape": _CAL,
    "window_rolling_7day_revenue": _CAL,
    "window_rolling_ols_slope": _CAL,
    "window_rsi_momentum": _CAL,
    "window_running_distinct_users": _CAL,
    # survival-analysis time axes: one row per distinct event time
    # (day grain in this schema)
    "orders_hazard_nelson_aalen": _CAL,
    "orders_logrank_test": _CAL,
    "orders_survival_km": _CAL,
    # fixed grids / small enumerable domains
    "ml_decision_stump": _BINS + " (stump threshold grid)",
    "ml_isotonic_calibration": _BINS,
    "ml_lift_gains_table": _BINS,
    "orders_lorenz_curve": _BINS,
    "orders_pareto_skyline": _BINS,
    "part_skyline_pareto": _BINS,
    "privacy_t_closeness": _BINS,
    "orders_repeat_purchase_curve": "per-customer order-count domain",
    "ml_multiple_testing_bh": "priority-pair hypothesis grid",
    "events_markov_next_event_eval": "event-type transition domain",
}

_SPEC_RE = re.compile(
    r"windowspecdefinition\((.*?)specifiedwindowframe"
)


def _offending_global_windows(plan: str) -> list[str]:
    """Unpartitioned window specs in a physical plan string, minus
    the sanctioned ``_b``/``bucket`` prefix-table shape.  A spec is
    unpartitioned when its body is empty (global aggregate window)
    or its first argument is an order spec (no partition columns
    before the first ASC/DESC).  Expression-valued partition columns
    containing commas read as partitioned -- a false NEGATIVE, which
    only ever under-flags."""
    hits = []
    for m in _SPEC_RE.finditer(plan):
        body = m.group(1)
        cut = re.split(r" (?:ASC|DESC)\b", body, maxsplit=1)[0]
        empty = body.strip().rstrip(",").strip() == ""
        if not (empty or "," not in cut):
            continue
        lead = body.strip().split("#")[0].strip()
        if lead in ("_b", "bucket"):
            continue
        hits.append(body.strip()[:60] or "<global>")
    return hits


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_cartesian_and_no_unbounded_global_window(spark, name):
    df = registry.QUERIES[name](spark, SF)
    # pre-execution physical plan: cheap (no job runs for most
    # queries; iterative operators run their construction-time jobs
    # at sf0.001, which the catalog test pays anyway)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name} compiles to a CartesianProduct"
    )
    bad = _offending_global_windows(plan)
    if bad and name not in ALLOWED_GLOBAL_WINDOWS:
        raise AssertionError(
            f"{name} has unpartitioned window(s) over unaudited "
            f"input: {bad} -- either switch to the two-pass "
            f"_global_rank/_global_cumsum helpers or add an audited "
            f"boundedness entry to ALLOWED_GLOBAL_WINDOWS"
        )
