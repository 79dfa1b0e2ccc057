"""Invariant/property tests for the round-6 capability wave -- each
new query gets a check that is INDEPENDENT of the DuckDB oracle
(brute-force recomputation in Python, or a structural invariant),
per the SURVEY §5 test strategy."""

from __future__ import annotations

import math

import duckdb
import pytest

from hq_master_data_warehouse_spark import registry
from tests.conftest import SF_DIR_001

registry.load_catalog()


def _rows(spark, name, sf=SF_DIR_001):
    return registry.QUERIES[name](spark, sf).collect()


def test_mutual_information_bounds(spark):
    """0 <= I(X;Y) <= min(H(X), H(Y)); recompute from raw counts."""
    row = _rows(spark, "ml_mutual_information")[0]
    assert 0.0 <= row.mi_nats <= min(row.h_x, row.h_y) + 1e-9

    con = duckdb.connect()
    cells = con.execute(
        "SELECT o_orderpriority, o_orderstatus, COUNT(*) FROM "
        f"'{SF_DIR_001}/orders.parquet' GROUP BY 1, 2"
    ).fetchall()
    t = sum(n for _, _, n in cells)
    px: dict[str, float] = {}
    py: dict[str, float] = {}
    for x, y, n in cells:
        px[x] = px.get(x, 0) + n / t
        py[y] = py.get(y, 0) + n / t
    mi = sum(
        (n / t) * math.log((n / t) / (px[x] * py[y]))
        for x, y, n in cells
    )
    assert abs(mi - row.mi_nats) < 1e-5
    assert row.n_cells == len(cells)


def test_bloom_no_false_negatives(spark):
    """Every probed key that IS a build member must pass the filter:
    n_true == |probe ∩ build| exactly (Bloom's one-sided guarantee)."""
    row = _rows(spark, "sketch_bloom_membership")[0]
    con = duckdb.connect()
    n_members_probed = con.execute(
        f"""
        SELECT COUNT(DISTINCT o_custkey)
        FROM '{SF_DIR_001}/orders.parquet'
        WHERE o_custkey IN (
            SELECT c_custkey FROM '{SF_DIR_001}/customer.parquet'
            WHERE c_mktsegment = 'BUILDING')
        """
    ).fetchone()[0]
    assert row.n_true == n_members_probed
    assert row.n_pass >= row.n_true  # FPs only ever ADD passes
    assert row.n_false_pos == row.n_pass - row.n_true
    assert 0 < row.n_bits_set <= 4096


def test_zorder_envelopes_partition_the_table(spark):
    """zfile row counts sum to the table; every envelope is within
    the 8-bit dimension domain and area >= the row count can't hold
    (area >= 1, spans consistent)."""
    rows = _rows(spark, "layout_zorder_clustering")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF_DIR_001}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        assert 0 <= r.min_x <= r.max_x <= 255
        assert 0 <= r.min_y <= r.max_y <= 255
        assert r.envelope_area == (r.max_x - r.min_x + 1) * (
            r.max_y - r.min_y + 1
        )
        assert 0 <= r.zfile <= 15


def test_fuzzy_join_distances_brute_force(spark):
    """Recompute Levenshtein in pure Python for every reported pair,
    and confirm no qualifying same-block pair was missed."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    rows = _rows(spark, "text_fuzzy_join_levenshtein")
    con = duckdb.connect()
    freqs = dict(
        con.execute(
            f"SELECT p_name, COUNT(*) FROM '{SF_DIR_001}/part.parquet'"
            " GROUP BY p_name"
        ).fetchall()
    )
    got = {(r.name_a, r.name_b): (r.edit_dist, r.n_part_pairs) for r in rows}
    names = sorted(freqs)
    expect = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if a.split(" ")[0] != b.split(" ")[0]:
                continue
            d = lev(a, b)
            if 1 <= d <= 3:
                expect[(a, b)] = (d, freqs[a] * freqs[b])
    assert got == expect


def test_peak_concurrency_brute_force(spark):
    """Replay the sweep in pure Python from raw events."""
    row = _rows(spark, "events_peak_concurrency")[0]
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, ts FROM '{SF_DIR_001}/events.parquet'"
        " ORDER BY user_id, ts"
    ).fetchall()
    sessions = []
    cur_user, start, last = None, None, None
    for uid, ts in evs:
        if uid != cur_user or (ts - last).total_seconds() > 1800:
            if cur_user is not None:
                sessions.append((start, last))
            cur_user, start = uid, ts
        last = ts
    sessions.append((start, last))
    assert len(sessions) == row.n_sessions
    from datetime import timedelta

    eps = [(s, 1) for s, _ in sessions] + [
        (e + timedelta(seconds=60), -1) for _, e in sessions
    ]
    eps.sort(key=lambda p: (p[0], p[1]))
    peak = run = 0
    for _, d in eps:
        run += d
        peak = max(peak, run)
    assert peak == row.peak_concurrency


def test_connected_components_invariants(spark):
    """Edges never cross components; component_id is the min member;
    sizes match the membership lists."""
    rows = _rows(spark, "graph_connected_components")
    comp = {r.part_id: r.component_id for r in rows}
    # every component id is the minimum of its member set
    members: dict[int, list[int]] = {}
    for r in rows:
        members.setdefault(r.component_id, []).append(r.part_id)
    for cid, ms in members.items():
        assert cid == min(ms)
    sizes = {r.component_id: r.component_size for r in rows}
    for cid, ms in members.items():
        assert sizes[cid] == len(ms)
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT a.l_partkey, b.l_partkey
        FROM (SELECT DISTINCT l_orderkey, l_partkey
              FROM '{SF_DIR_001}/lineitem.parquet') a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey
              FROM '{SF_DIR_001}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """
    ).fetchall()
    assert edges, "threshold graph unexpectedly empty at sf0.001"
    for u, w in edges:
        assert comp[u] == comp[w], f"edge ({u},{w}) crosses components"


def test_skyline_is_exactly_the_undominated_set(spark):
    """Brute-force dominance over all orders at sf0.001."""
    rows = _rows(spark, "orders_pareto_skyline")
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT o_orderkey, o_totalprice, o_orderdate"
        f" FROM '{SF_DIR_001}/orders.parquet'"
    ).fetchall()
    sky = {
        k
        for k, p, d in pts
        if not any(p2 > p and d2 > d for _, p2, d2 in pts)
    }
    assert {r.o_orderkey for r in rows} == sky


def test_knn_classifier_brute_force(spark):
    """Recompute the 5-NN majority vote with pure-Python cosine."""
    rows = _rows(spark, "ml_knn_classifier")
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT vec_id, label, embedding"
        f" FROM '{SF_DIR_001}/embeddings.parquet'"
    ).fetchall()
    ref = [(v, lb, e) for v, lb, e in vecs if v >= 10]

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return round(dot / (na * nb), 6)

    by_q = {r.query_id: r for r in rows}
    for qv, qlb, qe in vecs:
        if qv >= 10:
            continue
        scored = sorted(
            ((cos(e, qe), v, lb) for v, lb, e in ref),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        votes: dict[int, int] = {}
        for _, _, lb in scored:
            votes[lb] = votes.get(lb, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = by_q[qv]
        assert r.predicted_label == pred[0]
        assert r.n_votes == pred[1]
        assert r.true_label == qlb
        assert r.is_correct == int(pred[0] == qlb)


@pytest.mark.parametrize(
    "name",
    [
        "ml_mutual_information",
        "sketch_bloom_membership",
        "layout_zorder_clustering",
        "text_fuzzy_join_levenshtein",
        "events_peak_concurrency",
        "orders_pareto_skyline",
        "ml_knn_classifier",
        "text_keyword_rake",
    ],
)
def test_round6_no_cartesian(spark, name):
    """No unbounded cartesian product in any round-6 plan (broadcast
    nested-loop of 1-row/tiny aggregates is the sanctioned scalar
    join shape; CartesianProduct is not)."""
    df = registry.QUERIES[name](spark, SF_DIR_001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rake_brute_force(spark):
    """Replay RAKE in pure Python: stopword segmentation, 4-token
    phrase cap, degree/freq word scores, decimal-exact phrase sums."""
    from decimal import Decimal

    rows = _rows(spark, "text_keyword_rake")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    stop = {"a", "the"}
    phrases = []  # list of token tuples
    for _, text in docs:
        run: list[str] = []
        for tok in text.split(" ") + ["a"]:  # sentinel flush
            if tok in stop:
                if 1 <= len(run) <= 4:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    wscore = {
        w: Decimal(str(round(deg[w] / freq[w], 6))) for w in freq
    }
    scored: dict[str, list] = {}
    for p in phrases:
        s = sum(wscore[w] for w in p)
        key = " ".join(p)
        if key not in scored:
            scored[key] = [0, s]
        scored[key][0] += 1
    top = sorted(
        scored.items(), key=lambda kv: (-kv[1][1], -kv[1][0], kv[0])
    )[:15]
    assert [(r.phrase, r.n_occ) for r in rows] == [
        (k, n) for k, (n, _) in top
    ]
    for r, (_, (_, s)) in zip(rows, top):
        assert abs(r.rake_score - float(s)) < 1e-9


def test_containment_brute_force(spark):
    """Recompute shingle sets in Python (canonicalize, 3-gram,
    stop-shingle guard) and check every >=0.8-containment pair is
    reported with exact values -- including subset dups Jaccard
    misses."""
    import re as _re

    rows = _rows(spark, "dedup_shingle_containment")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    sets: dict[int, set] = {}
    counts: dict[str, int] = {}
    for did, text in docs:
        toks = _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        sh = {
            " ".join(toks[i : i + 3])
            for i in range(max(0, len(toks) - 2))
        }
        sets[did] = sh
        for s in sh:
            counts[s] = counts.get(s, 0) + 1
    hot = {s for s, c in counts.items() if c > 50}
    sets = {d: sh - hot for d, sh in sets.items()}
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sets[a] & sets[b])
            if not c or not sets[a] or not sets[b]:
                continue
            cab = round(c / len(sets[a]), 6)
            cba = round(c / len(sets[b]), 6)
            if max(cab, cba) >= 0.8:
                expect[(a, b)] = (
                    cab,
                    cba,
                    round(c / (len(sets[a]) + len(sets[b]) - c), 6),
                )
    got = {
        (r.doc_a, r.doc_b): (
            r.contain_a_in_b,
            r.contain_b_in_a,
            r.jaccard,
        )
        for r in rows
    }
    assert got == expect
    # containment dominates jaccard (the reason the metric catches
    # subset dups jaccard misses): C = c/|A| >= c/|A u B| always
    assert all(
        max(cab, cba) >= j - 1e-9 for cab, cba, j in got.values()
    )


def test_theil_decomposition_and_bounds(spark):
    """Theil is >= 0 per segment, and the additive decomposition
    total == sum(share_g * T_g) + T_between holds against a raw
    recomputation."""
    rows = _rows(spark, "agg_theil_inequality")
    con = duckdb.connect()
    raw = con.execute(
        f"""
        SELECT c.c_mktsegment,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, cents in raw:
        by_seg.setdefault(seg, []).append(cents)
    # per-segment Theil from raw data
    for r in rows:
        xs = by_seg[r.segment]
        mu = sum(xs) / len(xs)
        t = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
        assert r.theil_t >= 0
        assert abs(r.theil_t - t) < 1e-5
        assert r.n_customers == len(xs)
        assert r.seg_cents == sum(xs)
    # decomposition: T_total = sum_g s_g T_g + T_between, with
    # s_g = segment revenue share
    all_x = [x for xs in by_seg.values() for x in xs]
    n, tot = len(all_x), sum(all_x)
    mu = tot / n
    t_total = sum((x / mu) * math.log(x / mu) for x in all_x) / n
    t_within = 0.0
    t_between = 0.0
    for xs in by_seg.values():
        sg = sum(xs) / tot
        mug = sum(xs) / len(xs)
        tg = sum((x / mug) * math.log(x / mug) for x in xs) / len(xs)
        t_within += sg * tg
        t_between += sg * math.log(mug / mu)
    assert abs(t_total - (t_within + t_between)) < 1e-9


def test_drawdown_identities(spark):
    """Drawdown is peak - cum, peak is the running max, cum telescopes
    to the sum of day revenues; replay in Python."""
    rows = sorted(_rows(spark, "orders_daily_drawdown"),
                  key=lambda r: r.day)
    cum = peak = 0
    for r in rows:
        cum += r.day_cents
        peak = max(peak, cum)
        assert r.cum_cents == cum
        assert r.peak_cents == peak
        assert r.drawdown_cents == peak - cum
        assert r.drawdown_cents >= 0


def test_zipf_fit_matches_numpy(spark):
    """Slope/intercept/R^2 agree with a float64 polyfit on the same
    (ln rank, ln freq) points."""
    import numpy as np

    row = _rows(spark, "text_zipf_fit")[0]
    con = duckdb.connect()
    freqs = con.execute(
        f"""
        SELECT tok, COUNT(*) FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM '{SF_DIR_001}/documents.parquet'
        ) GROUP BY tok ORDER BY 2 DESC, 1 ASC
        """
    ).fetchall()
    x = np.log(np.arange(1, len(freqs) + 1, dtype=float))
    y = np.log(np.array([n for _, n in freqs], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n_vocab == len(freqs)
    assert abs(row.zipf_slope - slope) < 1e-4
    assert abs(row.intercept - intercept) < 1e-4
    assert abs(row.r2 - r * r) < 1e-4
    assert row.zipf_slope < 0  # frequency decreases with rank


def test_bitmap_week_overlap_brute_force(spark):
    """Replay the bit algebra from raw event days per user."""
    rows = {r.user_id: r for r in _rows(spark, "events_bitmap_week_overlap")}
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, day(CAST(ts AS TIMESTAMP))"
        f" FROM '{SF_DIR_001}/events.parquet'"
    ).fetchall()
    days: dict[int, set] = {}
    for uid, d in evs:
        days.setdefault(uid, set()).add(d)
    assert set(rows) == set(days)
    for uid, ds in days.items():
        r = rows[uid]
        assert r.active_days == len(ds)
        assert r.consec_day_pairs == sum(
            1 for d in ds if d + 1 in ds
        )
        weeks = [
            any(7 * w + 1 <= d <= 7 * w + 7 for d in ds)
            for w in range(4)
        ]
        assert r.weeks_active == sum(weeks)
        assert r.w1_w2_retained == int(weeks[0] and weeks[1])


def test_roc_auc_matches_sklearn_style(spark):
    """Exact AUC equals the O(n^2) pair-counting definition under the
    engine's deterministic (margin, vec_id) tie order."""
    row = _rows(spark, "ml_roc_auc_exact")[0]
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT vec_id, label, embedding"
        f" FROM '{SF_DIR_001}/embeddings.parquet'"
    ).fetchall()
    from hq_master_data_warehouse_spark.operators.ml import (
        BIAS,
        WEIGHTS,
    )

    scored = sorted(
        (
            (
                sum(float(x) * w for x, w in zip(e, WEIGHTS)) + BIAS,
                v,
                lb % 2,
            )
            for v, lb, e in vecs
        ),
    )
    # pair counting on the totally-ordered sequence
    pos_seen = 0
    pairs = 0
    for _, _, p in reversed(scored):  # descending margin
        if p == 1:
            pos_seen += 1
        else:
            pairs += pos_seen  # negatives ranked below these positives
    n_pos = sum(p for _, _, p in scored)
    n_neg = len(scored) - n_pos
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - pairs / (n_pos * n_neg)) < 1e-6


def test_backlog_clamped_recurrence(spark):
    """The closed form equals the direct max(0, prev + d - cap)
    recurrence replayed in Python."""
    rows = sorted(_rows(spark, "orders_backlog_clamped"),
                  key=lambda r: r.day)
    cap = rows[0].capacity
    backlog = 0
    for r in rows:
        backlog = max(0, backlog + r.demand - cap)
        assert r.backlog == backlog
        assert r.capacity == cap
        assert r.backlog >= 0


def test_hll_set_algebra_consistency(spark):
    """Union estimate from merged registers is >= each side's
    estimate (registers only grow under MAX-merge), inc-exc holds by
    construction, and the estimates land within the documented HLL
    error envelope of the exact truths."""
    row = _rows(spark, "sketch_hll_set_algebra")[0]
    assert row.est_union >= max(row.est_a, row.est_b) - 1e-9
    assert abs(
        row.est_intersection
        - (row.est_a + row.est_b - row.est_union)
    ) < 0.011  # round-2 arithmetic
    # m=64 -> ~13% relative standard error; 4 sigma envelope
    for est, true in ((row.est_a, row.true_a),
                      (row.est_b, row.true_b),
                      (row.est_union, row.true_union)):
        assert abs(est - true) <= 0.52 * true + 5


def test_phash_neardup_properties(spark):
    """pHash is deterministic; identical payloads (duplicate texts)
    produce hamming-0 pairs; every reported pair shares >= 1 of the
    four 16-bit bands; and hamming is symmetric-exact vs a Python
    recomputation of the two hashes."""
    from hq_master_data_warehouse_spark.operators.multimodal import (
        phash64,
    )

    rows = _rows(spark, "multimodal_phash_neardup")
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{SF_DIR_001}/documents.parquet'"
        ).fetchall()
    )

    def ph(doc):
        buf = (texts[doc].encode() + b"x" * 192)[:192]
        return phash64(buf, 8, 8)

    assert rows, "no near-dup pairs at sf0.001 (dup texts exist)"
    for r in rows:
        ha, hb = ph(r.doc_a), ph(r.doc_b)
        assert bin(ha ^ hb).count("1") == r.hamming <= 10
        assert any(
            (ha >> (16 * b)) & 0xFFFF == (hb >> (16 * b)) & 0xFFFF
            for b in range(4)
        )
    # determinism: exact text duplicates must appear at hamming 0
    by_text: dict[str, list] = {}
    for d, t in texts.items():
        by_text.setdefault(t, []).append(d)
    dup_pair = next(
        (sorted(ds)[:2] for ds in by_text.values() if len(ds) > 1),
        None,
    )
    if dup_pair:
        got = {(r.doc_a, r.doc_b) for r in rows}
        assert tuple(dup_pair) in got


def test_regex_funnel_brute_force(spark):
    """Replay the v[^p]*p scan in pure Python per user."""
    import re as _re

    rows = {r.user_id: r for r in _rows(spark, "events_pattern_regex_funnel")}
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, event_type FROM"
        f" '{SF_DIR_001}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs: dict[int, str] = {}
    for uid, et in evs:
        seqs[uid] = seqs.get(uid, "") + et[0]
    assert set(rows) == set(seqs)
    for uid, s in seqs.items():
        n = len(_re.findall("v[^p]*p", s))
        assert rows[uid].n_conversions == n
        assert rows[uid].converted == int(n > 0)
        assert rows[uid].n_events == len(s)


def test_lorenz_curve_properties(spark):
    """Lorenz curve is monotone, convex-ish (below the diagonal for
    unequal data), ends at (1, 1), and shares recompute from raw."""
    rows = sorted(_rows(spark, "orders_lorenz_curve"),
                  key=lambda r: r.decile)
    con = duckdb.connect()
    n, tot = con.execute(
        f"""SELECT COUNT(*), SUM(cents) FROM (
            SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS cents
            FROM '{SF_DIR_001}/orders.parquet' GROUP BY o_custkey)"""
    ).fetchone()
    assert sum(r.n_customers for r in rows) == n
    assert sum(r.dec_cents for r in rows) == tot
    prev_pop = prev_rev = 0.0
    for r in rows:
        assert r.cum_pop_share >= prev_pop
        assert r.cum_rev_share >= prev_rev
        # revenue share lags population share (sorted ascending)
        assert r.cum_rev_share <= r.cum_pop_share + 1e-9
        prev_pop, prev_rev = r.cum_pop_share, r.cum_rev_share
    assert abs(rows[-1].cum_pop_share - 1.0) < 1e-9
    assert abs(rows[-1].cum_rev_share - 1.0) < 1e-9


def test_entropy_rate_bounds(spark):
    """0 <= H(next|cur) <= H(next); info gain = difference >= 0."""
    row = _rows(spark, "events_entropy_rate")[0]
    assert 0 <= row.h_cond <= row.h_next + 1e-9
    assert abs(row.info_gain - (row.h_next - row.h_cond)) < 2e-6
    assert row.h_next <= math.log(5) + 1e-9  # 5 event types


def test_isotonic_pav_replay(spark):
    """The minimax closed form equals the sequential weighted
    pool-adjacent-violators algorithm, and the fit is monotone."""
    rows = sorted(_rows(spark, "ml_isotonic_calibration"),
                  key=lambda r: r.bin)
    con = duckdb.connect()
    from hq_master_data_warehouse_spark.operators.ml import (
        BIAS,
        WEIGHTS,
    )

    vecs = con.execute(
        f"SELECT label, embedding FROM"
        f" '{SF_DIR_001}/embeddings.parquet'"
    ).fetchall()
    bins: dict[int, list] = {}
    for lb, e in vecs:
        mg = sum(float(x) * w for x, w in zip(e, WEIGHTS)) + BIAS
        bn = min(max(int(math.floor(mg + 5)), 0), 9)
        nb = bins.setdefault(bn, [0, 0])
        nb[0] += 1
        nb[1] += lb % 2
    # sequential weighted PAV
    blocks = [
        [n, p] for _, (n, p) in sorted(bins.items())
    ]  # each block: [weight, pos]
    stack: list[list] = []
    for blk in blocks:
        stack.append(list(blk))
        while len(stack) > 1 and (
            stack[-2][1] / stack[-2][0]
            > stack[-1][1] / stack[-1][0]
        ):
            b2 = stack.pop()
            stack[-1][0] += b2[0]
            stack[-1][1] += b2[1]
    fitted = []
    it = iter(stack)
    blk = next(it)
    remaining = blk[0]
    for n, _ in blocks:
        while remaining == 0:
            blk = next(it)
            remaining = blk[0]
        fitted.append(blk[1] / blk[0])
        remaining -= n
    got = [r.iso_rate for r in rows]
    assert len(got) == len(fitted)
    for g, f in zip(got, fitted):
        assert abs(g - f) < 1e-6
    assert all(a <= b + 1e-9 for a, b in zip(got, got[1:]))


def test_welch_ttest_matches_scipy_formula(spark):
    """Recompute Welch t and Satterthwaite df from raw cents."""
    row = _rows(spark, "ml_ttest_welch")[0]
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT o_orderpriority IN ('1-URGENT','2-HIGH'),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    hi = [c for t, c in vals if t]
    lo = [c for t, c in vals if not t]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    n1, m1, v1 = mv(hi)
    n2, m2, v2 = mv(lo)
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    df = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.t_stat - t) < 1e-4
    assert abs(row.df_welch - df) < 0.05
    assert abs(row.mean_hi - m1 / 100) < 1e-4


def test_brier_decomposition_identity(spark):
    """All terms non-negative, uncertainty <= 0.25 (binary), and the
    Murphy identity holds on the rounded parts."""
    row = _rows(spark, "ml_brier_decomposition")[0]
    assert row.reliability >= 0
    assert row.resolution >= 0
    assert 0 <= row.uncertainty <= 0.25 + 1e-9
    assert abs(
        row.brier_score
        - (row.reliability - row.resolution + row.uncertainty)
    ) < 3e-6
    # resolution can never exceed uncertainty
    assert row.resolution <= row.uncertainty + 1e-9


def test_xcorr_symmetry_and_bounds(spark):
    """|r| <= 1 for every lag; lag 0 equals the plain Pearson corr of
    the two zero-filled daily series recomputed in Python."""
    rows = {r.lag: r for r in _rows(spark, "events_xcorr_click_purchase")}
    assert set(rows) == set(range(-7, 8))
    for r in rows.values():
        assert abs(r.xcorr) <= 1 + 1e-9
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT CAST(ts AS DATE),
               SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
        FROM '{SF_DIR_001}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    from datetime import timedelta

    d0, d1 = daily[0][0], daily[-1][0]
    by_day = {d: (x, y) for d, x, y in daily}
    xs, ys = [], []
    d = d0
    while d <= d1:
        x, y = by_day.get(d, (0, 0))
        xs.append(x)
        ys.append(y)
        d += timedelta(days=1)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    r0 = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(rows[0].xcorr - r0) < 1e-6
    assert rows[0].n_days == n


def test_did_estimator_identity(spark):
    """DiD equals the four-cell expression; cells recompute from raw."""
    row = _rows(spark, "orders_diff_in_diff")[0]
    assert abs(
        row.did_estimate
        - (
            (row.post_treated - row.pre_treated)
            - (row.post_control - row.pre_control)
        )
    ) < 5e-6
    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT c.c_mktsegment = 'BUILDING',
               o.o_orderdate >= TIMESTAMP '1998-01-01',
               AVG(ROUND(o.o_totalprice * 100)) / 100
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2"""
    ).fetchall()
    m = {(t, p): v for t, p, v in cells}
    assert abs(row.pre_treated - m[(True, False)]) < 1e-4
    assert abs(row.post_control - m[(False, True)]) < 1e-4


def test_mann_whitney_brute_force(spark):
    """Replay U and z from raw rows with Python midranks (the
    textbook algorithm, independent of the window/cumsum path)."""
    row = _rows(spark, "ml_mann_whitney_u")[0]
    con = duckdb.connect()
    raw = con.execute(
        "SELECT o_orderpriority IN ('1-URGENT','2-HIGH'), "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) FROM "
        f"'{SF_DIR_001}/orders.parquet'"
    ).fetchall()
    vals = sorted(v for _, v in raw)
    # midrank per value
    rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2.0
        i = j
    hi = [v for h, v in raw if h]
    lo = [v for h, v in raw if not h]
    n1, n2, n = len(hi), len(lo), len(raw)
    r1 = sum(rank[v] for v in hi)
    u = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter

    cnt = Counter(vals)
    ties = sum(t**3 - t for t in cnt.values())
    var = (n1 * n2 / 12.0) * ((n + 1) - ties / (n * (n - 1.0)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    assert row.n_hi == n1 and row.n_lo == n2
    assert row.tie_values == sum(1 for t in cnt.values() if t > 1)
    assert abs(row.u_hi - u) < 1e-6
    assert abs(row.z_stat - z) < 1e-5


def _daily_series_py():
    con = duckdb.connect()
    return con.execute(
        f"""
        WITH bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
            FROM '{SF_DIR_001}/events.parquet'
        ),
        days AS (
            SELECT UNNEST(generate_series(0, datediff('day', d0, d1))) AS d
            FROM bounds
        ),
        counts AS (
            SELECT datediff('day', bounds.d0, CAST(ts AS DATE)) AS d,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
            FROM '{SF_DIR_001}/events.parquet' CROSS JOIN bounds GROUP BY 1
        )
        SELECT days.d, COALESCE(x, 0), COALESCE(y, 0)
        FROM days LEFT JOIN counts USING (d) ORDER BY days.d
        """
    ).fetchall()


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        for k in range(i, j):
            r[order[k]] = (i + 1 + j) / 2.0
        i = j
    return r


def test_spearman_matches_rank_pearson(spark):
    """rho equals Pearson on Python midranks of the dense series."""
    row = _rows(spark, "events_rank_corr_spearman")[0]
    series = _daily_series_py()
    xs = [x for _, x, _ in series]
    ys = [y for _, _, y in series]
    rx, ry = _midranks(xs), _midranks(ys)
    n = len(series)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row.n_days == n
    assert -1.0 <= row.rho_spearman <= 1.0
    assert abs(row.rho_spearman - rho) < 1e-5


def test_kendall_brute_force_pairs(spark):
    """tau-b from the O(n^2) Python pair loop, plus the pair-count
    partition identity conc + disc + tied = n(n-1)/2."""
    row = _rows(spark, "events_rank_corr_kendall")[0]
    series = _daily_series_py()
    conc = disc = tx = ty = 0
    n = len(series)
    for i in range(n):
        for j in range(i + 1, n):
            cx = series[i][1] - series[j][1]
            cy = series[i][2] - series[j][2]
            if cx * cy > 0:
                conc += 1
            elif cx * cy < 0:
                disc += 1
            if cx == 0:
                tx += 1
            if cy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    assert row.n_pairs == n0
    assert row.concordant == conc and row.discordant == disc
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(row.tau_b - tau) < 1e-6
    assert -1.0 <= row.tau_b <= 1.0


def test_anova_brute_force(spark):
    """Recompute the one-way ANOVA F from raw cents in Python."""
    row = _rows(spark, "ml_anova_oneway")[0]
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, c in vals:
        groups.setdefault(g, []).append(c)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(
        len(v) * (sum(v) / len(v) - grand) ** 2
        for v in groups.values()
    )
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_total == n
    assert row.df_between == k - 1 and row.df_within == n - k
    assert abs(row.f_stat - f) / f < 1e-6
    assert abs(row.eta_squared - ssb / (ssb + ssw)) < 1e-6
    # identity: SST = SSB + SSW against a direct total-SS recompute
    sst = sum(
        (x - grand) ** 2 for v in groups.values() for x in v
    )
    assert abs((row.ss_between_usd2 + row.ss_within_usd2) * 10000
               - sst) / sst < 1e-9


def test_theilsen_brute_force(spark):
    """Median-of-pairwise-slopes recomputed with the textbook O(n^2)
    loop over the zero-filled daily order counts."""
    import statistics

    row = _rows(spark, "orders_theilsen_trend")[0]
    con = duckdb.connect()
    days = con.execute(
        f"""WITH b AS (SELECT MIN(o_orderdate) AS d0 FROM
                '{SF_DIR_001}/orders.parquet')
        SELECT datediff('day', b.d0, o_orderdate), COUNT(*)
        FROM '{SF_DIR_001}/orders.parquet' CROSS JOIN b GROUP BY 1"""
    ).fetchall()
    counts = dict(days)
    n_days = max(counts) + 1
    y = [counts.get(d, 0) for d in range(n_days)]
    slopes = [
        (y[j] - y[i]) / (j - i)
        for i in range(n_days)
        for j in range(i + 1, n_days)
    ]
    assert row.n_days == n_days
    assert row.n_pairs == len(slopes)
    assert abs(row.sen_slope - statistics.median(slopes)) < 1e-7
    med_y = statistics.median(y)
    med_d = statistics.median(range(n_days))
    assert abs(
        row.intercept - (med_y - statistics.median(slopes) * med_d)
    ) < 1e-5
    # robustness sanity: the estimator is bounded by the extreme slopes
    assert min(slopes) <= row.sen_slope <= max(slopes)


def test_js_divergence_brute_force(spark):
    """Per-type JS terms sum to the scalar JS recomputed in Python;
    JS is symmetric, non-negative, and bounded by ln 2."""
    rows = _rows(spark, "drift_js_event_types")
    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT event_type,
               COUNT(CASE WHEN day(CAST(ts AS DATE)) % 2 = 1
                          THEN 1 END),
               COUNT(CASE WHEN day(CAST(ts AS DATE)) % 2 = 0
                          THEN 1 END)
        FROM '{SF_DIR_001}/events.parquet' GROUP BY 1"""
    ).fetchall()
    tb = sum(b for _, b, _ in cells)
    tc = sum(c for _, _, c in cells)

    def js_term(b, c):
        p, q = b / tb, c / tc
        m = (p + q) / 2
        t = 0.0
        if p:
            t += 0.5 * p * math.log(p / m)
        if q:
            t += 0.5 * q * math.log(q / m)
        return t

    expect = {t: js_term(b, c) for t, b, c in cells}
    total = 0.0
    for r in rows:
        # floor-quantized at 1e-6, matching psi_term's contract
        assert abs(r.js_term - expect[r.event_type]) <= 1e-6 + 1e-12
        assert r.js_term >= -1e-12
        total += r.js_term
    assert set(expect) == {r.event_type for r in rows}
    assert 0 <= total <= math.log(2) + 1e-9


def test_levene_brute_force(spark):
    """Brown-Forsythe W recomputed with the textbook float pipeline
    (median-centered absolute deviations, plain ANOVA on z)."""
    import statistics

    row = _rows(spark, "ml_levene_brown_forsythe")[0]
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, c in vals:
        groups.setdefault(g, []).append(c)
    z = {
        g: [abs(x - statistics.median(v)) for x in v]
        for g, v in groups.items()
    }
    k = len(z)
    n = sum(len(v) for v in z.values())
    grand = sum(sum(v) for v in z.values()) / n
    ssb = sum(
        len(v) * (sum(v) / len(v) - grand) ** 2 for v in z.values()
    )
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in z.values()
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_total == n
    assert row.df_between == k - 1 and row.df_within == n - k
    assert abs(row.w_stat - w) / w < 1e-6


def test_cohens_kappa_brute_force(spark):
    """Kappa recomputed from the langid confusion counts; kappa <=
    accuracy, and kappa == 1 iff perfect agreement."""
    row = _rows(spark, "ml_cohens_kappa")[0]
    cells = {
        (r.actual_lang, r.predicted_lang): r.n
        for r in _rows(spark, "text_langid_confusion")
    }
    n = sum(cells.values())
    po = sum(v for (a, p), v in cells.items() if a == p) / n
    cats = {a for a, _ in cells} | {p for _, p in cells}
    pe = sum(
        (sum(v for (a, _), v in cells.items() if a == c) / n)
        * (sum(v for (_, p), v in cells.items() if p == c) / n)
        for c in cats
    )
    kappa = (po - pe) / (1 - pe)
    assert row.n_docs == n
    assert abs(row.accuracy - po) < 1e-6
    assert abs(row.expected_agreement - pe) < 1e-6
    assert abs(row.kappa - kappa) < 1e-6
    assert row.kappa <= row.accuracy + 1e-9


def test_nelson_aalen_vs_km(spark):
    """H(t) is non-decreasing; exp(-H) lower-bounds KM survival
    pointwise (standard Breslow-vs-KM inequality); and the hazard
    increments recompute from the KM rows' (d, n) pairs."""
    na = _rows(spark, "orders_hazard_nelson_aalen")
    km = {r.duration_days: r for r in _rows(spark, "orders_survival_km")}
    prev_h = 0.0
    run_h = 0.0
    run_v = 0.0
    for r in na:
        assert r.cum_hazard >= prev_h - 1e-12
        prev_h = r.cum_hazard
        assert r.duration_days in km
        k = km[r.duration_days]
        assert k.n_risk == r.n_risk and k.n_events == r.n_events
        run_h += r.n_events / r.n_risk
        run_v += r.n_events / r.n_risk**2
        assert abs(r.cum_hazard - run_h) < 1e-5
        assert abs(r.hazard_var - run_v) < 1e-7
        # Breslow survival >= KM survival (1-x <= exp(-x) per factor)
        assert r.breslow_survival >= k.survival - 1e-4
    assert len(na) == len(km)


def test_flesch_brute_force(spark):
    """Recompute words/sentences/syllables with Python re on every
    doc of one source; exact integer totals must match."""
    import re

    rows = {r.source: r for r in _rows(spark, "text_readability_flesch")}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for src, text in docs:
        lt = text.lower()
        words = re.findall(r"[a-z]+", lt)
        sentences = max(len(re.findall(r"[.!?]+", text)), 1)
        syll = sum(
            max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words
        )
        a = agg.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(words)
        a[2] += sentences
        a[3] += syll
    assert set(agg) == set(rows)
    for src, (nd, w, s, y) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (
            nd, w, s, y,
        )
        f = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r.flesch_reading_ease - f) < 1e-3


def _py_nb_confusion(sf=SF_DIR_001):
    """Pure-Python replay of the micro-nat-quantized multinomial NB
    (same md5 split, Laplace smoothing, floor quantization)."""
    import hashlib

    import re

    from hq_master_data_warehouse_spark.operators.sampling import (
        SPLIT_CUT,
    )

    def canonical_text_py(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    train, hold = [], []
    for doc_id, lang, text in docs:
        toks = canonical_text_py(text).split(" ")
        split = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        (train if split < SPLIT_CUT else hold).append(
            (doc_id, lang, toks)
        )
    cnt: dict[tuple[str, str], int] = {}
    ct: dict[str, int] = {}
    docs_c: dict[str, int] = {}
    voc = set()
    for _, lang, toks in train:
        docs_c[lang] = docs_c.get(lang, 0) + 1
        for t in toks:
            cnt[(lang, t)] = cnt.get((lang, t), 0) + 1
            ct[lang] = ct.get(lang, 0) + 1
            voc.add(t)
    v = len(voc)
    ntr = len(train)
    q = lambda x: math.floor(1e6 * math.log(x))  # noqa: E731
    lp = {
        (lang, t): q((cnt.get((lang, t), 0) + 1) / (ct[lang] + v))
        for lang in ct
        for t in voc
    }
    lp0 = {lang: q(1.0 / (ct[lang] + v)) for lang in ct}
    prior = {lang: q(docs_c[lang] / ntr) for lang in ct}
    conf: dict[tuple[str, str], int] = {}
    correct: dict[int, bool] = {}
    for doc_id, lang, toks in hold:
        scores = {
            c: prior[c]
            + sum(lp.get((c, t), lp0[c]) for t in toks)
            for c in ct
        }
        top = max(scores.values())
        # tie-break ascending on class name, like the ROW_NUMBER order
        best = min(c for c in scores if scores[c] == top)
        conf[(lang, best)] = conf.get((lang, best), 0) + 1
        correct[doc_id] = best == lang
    return conf, correct


def test_naive_bayes_brute_force(spark):
    """The Spark NB confusion equals the pure-Python replay of the
    identical quantized model, cell for cell."""
    rows = _rows(spark, "ml_naive_bayes_langid")
    got = {(r.actual_lang, r.predicted_lang): r.n_docs for r in rows}
    conf, _ = _py_nb_confusion()
    assert got == conf


def test_mcnemar_identities(spark):
    """Discordant counts recompute from the replayed NB correctness
    and the heuristic query; the statistic matches the formula."""
    row = _rows(spark, "ml_mcnemar_nb_vs_heuristic")[0]
    _, nb_ok = _py_nb_confusion()
    heur_ok = {
        r.doc_id: r.predicted_lang == r.actual_lang
        for r in _rows(spark, "text_langid_heuristic")
        if r.doc_id in nb_ok
    }
    b = sum(1 for d in nb_ok if nb_ok[d] and not heur_ok[d])
    c = sum(1 for d in nb_ok if not nb_ok[d] and heur_ok[d])
    assert row.n_holdout == len(nb_ok)
    assert row.b_discordant == b and row.c_discordant == c
    assert row.nb_correct == sum(nb_ok.values())
    assert row.heur_correct == sum(heur_ok.values())
    expect = 0.0 if b + c == 0 else (abs(b - c) - 1) ** 2 / (b + c)
    assert abs(row.mcnemar_chi2 - expect) < 1e-6


def test_hhi_brute_force(spark):
    """HHI recomputed from per-customer float shares; equal-share
    floor <= HHI <= 1."""
    rows = {r.region: r for r in _rows(spark, "agg_hhi_concentration")}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT rg.r_name, c.c_custkey,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        JOIN '{SF_DIR_001}/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        JOIN '{SF_DIR_001}/region.parquet' rg
          ON n.n_regionkey = rg.r_regionkey
        GROUP BY 1, 2"""
    ).fetchall()
    per: dict[str, list[int]] = {}
    for region, _, r in data:
        per.setdefault(region, []).append(r)
    assert set(per) == set(rows)
    for region, revs in per.items():
        row = rows[region]
        tot = sum(revs)
        hhi = sum((x / tot) ** 2 for x in revs)
        assert row.n_customers == len(revs)
        assert abs(row.hhi - hhi) < 1e-6
        assert row.hhi_equal_floor - 1e-9 <= row.hhi <= 1.0


def test_durbin_watson_brute_force(spark):
    """DW recomputed from explicit per-day residuals; 0 <= DW <= 4
    and rho_approx = 1 - DW/2."""
    row = _rows(spark, "ml_durbin_watson")[0]
    con = duckdb.connect()
    days = dict(
        con.execute(
            f"""WITH b AS (SELECT MIN(o_orderdate) AS d0 FROM
                    '{SF_DIR_001}/orders.parquet')
            SELECT datediff('day', b.d0, o_orderdate), COUNT(*)
            FROM '{SF_DIR_001}/orders.parquet' CROSS JOIN b
            GROUP BY 1"""
        ).fetchall()
    )
    n = max(days) + 1
    y = [days.get(d, 0) for d in range(n)]
    sx, sy = sum(range(n)), sum(y)
    sxx = sum(d * d for d in range(n))
    sxy = sum(d * v for d, v in enumerate(y))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [v - a - b * d for d, v in enumerate(y)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(
        x * x for x in e
    )
    assert row.n_days == n
    assert abs(row.slope_per_day - b) < 1e-8
    assert abs(row.dw_stat - dw) < 1e-5
    assert 0 <= row.dw_stat <= 4
    assert abs(row.rho_approx - (1 - dw / 2)) < 1e-5


def test_runs_test_brute_force(spark):
    """Runs, counts and z recomputed with the textbook sequential
    scan over the zero-filled daily series."""
    row = _rows(spark, "orders_runs_test_daily")[0]
    con = duckdb.connect()
    days = dict(
        con.execute(
            f"""WITH b AS (SELECT MIN(o_orderdate) AS d0 FROM
                    '{SF_DIR_001}/orders.parquet')
            SELECT datediff('day', b.d0, o_orderdate), COUNT(*)
            FROM '{SF_DIR_001}/orders.parquet' CROSS JOIN b
            GROUP BY 1"""
        ).fetchall()
    )
    n = max(days) + 1
    y = [days.get(d, 0) for d in range(n)]
    import statistics

    med = statistics.median(y)
    s = [1 if v > med else 0 for v in y if v != med]
    n1, n2 = sum(s), len(s) - sum(s)
    runs = 1 + sum(1 for i in range(1, len(s)) if s[i] != s[i - 1])
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    assert abs(row.expected_runs - mu) < 1e-4
    if n1 == 0 or n2 == 0:
        assert row.z_stat is None
    else:
        var = (
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        assert abs(row.z_stat - (runs - mu) / math.sqrt(var)) < 1e-5


def _py_kcore(sf, kmax):
    """Textbook peel: exact core numbers (capped at kmax) of the
    >=2-shared-orders co-purchase graph."""
    import collections

    con = duckdb.connect()
    e = con.execute(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM '{sf}/lineitem.parquet')
        SELECT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    adj = collections.defaultdict(set)
    for u, w in e:
        adj[u].add(w)
        adj[w].add(u)
    core = {v: 1 for v in adj}
    for k in range(2, kmax + 1):
        while True:
            drop = [v for v in adj if len(adj[v]) < k]
            if not drop:
                break
            for v in drop:
                for w in adj[v]:
                    adj[w].discard(v)
                del adj[v]
        for v in adj:
            core[v] = k
    return {v: c for v, c in core.items() if c >= 2}


def test_kcore_oracle_cte_termination_cases():
    """DuckDB-only pins for the r8 recursive-peel oracle's two stop
    modes (the subtle part of `_kcore_peel_cte`):

    - EMPTY-CORE stop: triangle + pendant chain -- at k=3 the first
      peel kills everything, so the recursion emits nothing past
      iter 0 and the final non-recursive peel must yield the empty
      set (NOT the last non-empty level, the bug the extra peel
      exists to prevent).
    - NONEMPTY-FIXPOINT stop: 4-clique + pendant -- the k=3 peel
      strips the pendant in one step and then reproduces the clique,
      so the recursion stops on m2 == prev_m and the final peel
      returns the clique unchanged.
    """
    from hq_master_data_warehouse_spark.operators.graph import (
        _kcore_peel_cte,
    )

    con = duckdb.connect()

    def cores(edges, k):
        vals = ", ".join(f"({u},{w})" for u, w in edges)
        sql = f"""
        WITH RECURSIVE pairs(u, w) AS (VALUES {vals}),
        e AS (SELECT u AS src, w AS dst FROM pairs
              UNION ALL SELECT w, u FROM pairs),
        {_kcore_peel_cte(k)}
        SELECT DISTINCT src FROM core{k} ORDER BY src
        """
        return [r[0] for r in con.execute(sql).fetchall()]

    tri_pendant = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    assert cores(tri_pendant, 2) == [1, 2, 3]
    assert cores(tri_pendant, 3) == []  # empty-core stop

    clique4_pendant = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
    ]
    assert cores(clique4_pendant, 3) == [1, 2, 3, 4]  # fixpoint stop
    assert cores(clique4_pendant, 4) == []


def test_kcore_brute_force(spark):
    """Every (part, core_number) row equals the exact textbook peel;
    nested-core property holds by construction of the replay."""
    from hq_master_data_warehouse_spark.operators.graph import KCORE_MAX

    got = {
        r.part_id: r.core_number
        for r in _rows(spark, "graph_kcore_decomposition")
    }
    assert got == _py_kcore(SF_DIR_001, KCORE_MAX)


def test_tfidf_cosine_brute_force(spark):
    """Every reported pair's cosine recomputed from a float TF-IDF
    pipeline in Python (no quantization) within the quantization
    error bound; subset-of-candidates and threshold respected."""
    rows = _rows(spark, "dedup_tfidf_cosine_pairs")
    from hq_master_data_warehouse_spark.operators.dedup import (
        TFIDF_COSINE_THRESHOLD,
    )
    import re

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    tf: dict[int, dict[str, int]] = {}
    for doc_id, text in docs:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        d = tf.setdefault(doc_id, {})
        for t in toks:
            d[t] = d.get(t, 0) + 1
    n = len(docs)
    dfc: dict[str, int] = {}
    for d in tf.values():
        for t in d:
            dfc[t] = dfc.get(t, 0) + 1
    w = {
        doc: {
            t: c * math.log(n / dfc[t])
            for t, c in d.items()
            if dfc[t] < n
        }
        for doc, d in tf.items()
    }

    def cos(a, b):
        dot = sum(w[a][t] * w[b][t] for t in w[a] if t in w[b])
        na = math.sqrt(sum(x * x for x in w[a].values()))
        nb = math.sqrt(sum(x * x for x in w[b].values()))
        return dot / (na * nb)

    assert rows, "threshold should keep some near-dup pairs"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.cosine >= TFIDF_COSINE_THRESHOLD
        # micro-unit quantization error is far below 1e-3 here
        assert abs(r.cosine - cos(r.doc_a, r.doc_b)) < 1e-3


def test_atkinson_identities(spark):
    """0 <= A(1) < 1; geomean <= mean (AM-GM); float recompute."""
    rows = _rows(spark, "agg_atkinson_index")
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT rg.r_name,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        JOIN '{SF_DIR_001}/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        JOIN '{SF_DIR_001}/region.parquet' rg
          ON n.n_regionkey = rg.r_regionkey
        GROUP BY rg.r_name, c.c_custkey"""
    ).fetchall()
    per: dict[str, list[int]] = {}
    for region, r in data:
        per.setdefault(region, []).append(r)
    assert {r.region for r in rows} == set(per)
    for row in rows:
        revs = per[row.region]
        geo = math.exp(sum(math.log(x) for x in revs) / len(revs))
        mean = sum(revs) / len(revs)
        assert geo <= mean + 1e-9
        assert 0 <= row.atkinson_1 < 1
        assert abs(row.atkinson_1 - (1 - geo / mean)) < 1e-5
        assert abs(row.mean_revenue - mean / 100) < 0.01


def test_bollinger_brute_force(spark):
    """Bands recomputed with a sliding Python window; the outside
    flag is consistent with the bands on every row."""
    import statistics

    rows = sorted(
        _rows(spark, "window_bollinger_bands"), key=lambda r: r.day
    )
    series = [r.revenue for r in rows]
    for i, r in enumerate(rows):
        wnd = series[max(0, i - 6): i + 1]
        assert r.n_window == len(wnd)
        mid = sum(wnd) / len(wnd)
        sd = statistics.stdev(wnd) if len(wnd) > 1 else 0.0
        assert abs(r.mid_band - mid) < 5e-3
        assert abs(r.upper_band - (mid + 2 * sd)) < 2e-2
        assert abs(r.lower_band - (mid - 2 * sd)) < 2e-2
        assert r.outside_band == (
            1
            if (r.revenue > r.upper_band or r.revenue < r.lower_band)
            else 0
        ) or abs(r.revenue - r.upper_band) < 1e-3 or abs(
            r.revenue - r.lower_band
        ) < 1e-3


def test_ewma_brute_force(spark):
    """Full truncated-EWMA replay in pure Python: per customer,
    ordered by (order_date, o_orderkey), 16 dyadic weights.  The op
    is designed bit-exact cross-engine (dyadic weights x integer
    cents -> exact double sums), so the replay asserts EXACT equality
    of the rounded output, not a tolerance."""
    from hq_master_data_warehouse_spark.operators.analytics import (
        EWMA_TERMS,
        _ewma_weights,
    )

    rows = _rows(spark, "window_ewma_customer_revenue")
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'
        ORDER BY o_custkey, 3, o_orderkey"""
    ).fetchall()
    weights = _ewma_weights()
    assert len(weights) == EWMA_TERMS
    expected = {}
    series: list[int] = []
    prev_cust = None
    for cust, okey, _d, cents in data:
        if cust != prev_cust:
            series = []
            prev_cust = cust
        series.append(cents)
        tail = series[-EWMA_TERMS:][::-1]  # newest first
        num = sum(float(c) * weights[k] for k, c in enumerate(tail))
        den = sum(weights[k] for k in range(len(tail)))
        # same rounding discipline as the engines (half away from 0)
        import math

        v = num / den / 100.0
        expected[(cust, okey)] = (
            math.copysign(
                math.floor(abs(v) * 1e6 + 0.5), v
            )
            / 1e6
        )
    assert len(rows) == len(expected)
    for r in rows:
        assert r.ewma_revenue == expected[(r.o_custkey, r.o_orderkey)], (
            r.o_custkey,
            r.o_orderkey,
        )


def test_tukey_fence_brute_force(spark):
    """Quartiles, fences, and outlier counts replayed in pure Python
    with the same integer rank and doubled-cents fence arithmetic;
    all columns are integers, so equality is exact."""
    rows = {
        r.o_orderpriority: r
        for r in _rows(spark, "dq_tukey_fence_outliers")
    }
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, c in data:
        groups.setdefault(g, []).append(c)
    assert set(rows) == set(groups)
    for g, cents in groups.items():
        cents.sort()
        n = len(cents)
        q1 = cents[(n + 3) // 4 - 1]
        q3 = cents[(3 * n + 3) // 4 - 1]
        lo2, hi2 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
        n_low = sum(1 for c in cents if 2 * c < lo2)
        n_high = sum(1 for c in cents if 2 * c > hi2)
        r = rows[g]
        assert (r.n, r.q1_cents, r.q3_cents, r.iqr_cents) == (
            n,
            q1,
            q3,
            q3 - q1,
        )
        assert (r.n_low, r.n_high) == (n_low, n_high)
        assert r.outlier_ppm == (n_low + n_high) * 1000000 // n


def test_mrr_brute_force(spark):
    """Per-query reciprocal ranks replayed in pure Python with the
    same margin model and tie-break; rr_micro is exact integer
    division, so equality is exact."""
    from hq_master_data_warehouse_spark.operators.ml import (
        BIAS,
        MRR_QUERIES,
        WEIGHTS,
    )

    rows = {r.query_id: r for r in _rows(spark, "ml_mrr_reciprocal_ranks")}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT vec_id, label, embedding
        FROM '{SF_DIR_001}/embeddings.parquet'"""
    ).fetchall()
    groups: dict[int, list] = {}
    for vec_id, label, emb in data:
        # same sequential left-fold the engines use
        margin = 0.0
        for x, w in zip(emb, WEIGHTS):
            margin += float(x) * w
        margin += BIAS
        groups.setdefault(vec_id % MRR_QUERIES, []).append(
            (margin, vec_id, label % 4 == 3)
        )
    assert set(rows) == set(groups)
    for q, docs in groups.items():
        docs.sort(key=lambda t: (-t[0], t[1]))
        first = next(
            (i + 1 for i, t in enumerate(docs) if t[2]), None
        )
        r = rows[q]
        assert r.n_docs == len(docs)
        assert r.n_relevant == sum(1 for t in docs if t[2])
        assert r.first_rel_pos == first
        assert r.rr_micro == (1000000 // first if first else 0)


def test_ridge_closed_form_brute_force(spark):
    """Ridge and OLS coefficients recomputed with numpy from the raw
    integer columns; the closed-form solve must agree, and ridge must
    shrink the coefficient vector relative to OLS."""
    import numpy as np

    from hq_master_data_warehouse_spark.operators.ml import (
        RIDGE_LAMBDA,
    )

    (row,) = _rows(spark, "ml_ridge_regression_closed_form")
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT),
               CAST(l_quantity AS BIGINT),
               CAST(ROUND(l_discount * 100) AS BIGINT)
        FROM '{SF_DIR_001}/lineitem.parquet'"""
    ).fetchall()
    y = np.array([d[0] for d in data], dtype=float)
    X = np.array([[d[1], d[2]] for d in data], dtype=float)
    n = len(y)
    assert row.n == n
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    C = Xc.T @ Xc
    cxy = Xc.T @ yc
    b_ols = np.linalg.solve(C, cxy)
    b_ridge = np.linalg.solve(C + RIDGE_LAMBDA * n * np.eye(2), cxy)
    assert abs(row.ols_b1 - b_ols[0]) < 1e-6
    assert abs(row.ols_b2 - b_ols[1]) < 1e-6
    assert abs(row.ridge_b1 - b_ridge[0]) < 1e-6
    assert abs(row.ridge_b2 - b_ridge[1]) < 1e-6
    intercept = (
        y.mean() - (b_ridge @ X.mean(axis=0))
    ) / 100
    assert abs(row.ridge_intercept - intercept) < 1e-4
    # the penalty actually shrinks
    assert np.linalg.norm(b_ridge) < np.linalg.norm(b_ols)


def test_precision_recall_at_k_brute_force(spark):
    """P@k / R@k replayed in pure Python; all integer outputs, exact
    equality.  Cross-checked against the MRR rows on the same fixture
    (first_rel_pos <= k  <=>  rel_in_topk >= 1)."""
    from hq_master_data_warehouse_spark.operators.ml import (
        BIAS,
        MRR_QUERIES,
        PRK_K,
        WEIGHTS,
    )

    rows = {
        r.query_id: r
        for r in _rows(spark, "ml_precision_recall_at_k")
    }
    mrr = {r.query_id: r for r in _rows(spark, "ml_mrr_reciprocal_ranks")}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT vec_id, label, embedding
        FROM '{SF_DIR_001}/embeddings.parquet'"""
    ).fetchall()
    groups: dict[int, list] = {}
    for vec_id, label, emb in data:
        margin = 0.0
        for x, w in zip(emb, WEIGHTS):
            margin += float(x) * w
        margin += BIAS
        groups.setdefault(vec_id % MRR_QUERIES, []).append(
            (margin, vec_id, label % 4 == 3)
        )
    assert set(rows) == set(groups)
    for q, docs in groups.items():
        docs.sort(key=lambda t: (-t[0], t[1]))
        n_rel = sum(1 for t in docs if t[2])
        hits = sum(1 for t in docs[:PRK_K] if t[2])
        r = rows[q]
        assert (r.n_relevant, r.rel_in_topk) == (n_rel, hits)
        assert r.precision_ppm == hits * 1000000 // PRK_K
        assert r.recall_ppm == (
            hits * 1000000 // n_rel if n_rel else 0
        )
        # consistency with the MRR view of the same ranking
        m = mrr[q]
        assert (hits >= 1) == (
            m.first_rel_pos is not None and m.first_rel_pos <= PRK_K
        )


def test_adaboost_brute_force(spark):
    """Full 2-round AdaBoost replay in pure Python with the same
    integer weight scaling; every output cell must match."""
    from hq_master_data_warehouse_spark.operators.ml import (
        ADA_STUMPS,
        ADA_TARGET,
    )

    rows = sorted(
        _rows(spark, "ml_adaboost_stumps"), key=lambda r: r.round
    )
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT),
               o_orderpriority, year(o_orderdate)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    feats = []
    ys = []
    for cents, prio, yr in data:
        ys.append(1 if cents > ADA_TARGET else -1)
        feats.append(
            (
                1 if cents > 15000000 else -1,
                1 if cents > 35000000 else -1,
                1 if prio in ("1-URGENT", "2-HIGH") else -1,
                1 if yr <= 1996 else -1,
            )
        )
    n = len(ys)
    w = [1] * n
    picks = []
    for _ in range(2):
        tot = sum(w)
        errs = [
            sum(wi for wi, f, y in zip(w, feats, ys) if f[j] != y)
            for j in range(len(ADA_STUMPS))
        ]
        e = min(errs)
        j = errs.index(e)
        a = 0.5 * math.log((tot - e) / e)
        picks.append((j, e, tot, a))
        w = [
            wi * ((tot - e) if feats[i][j] != ys[i] else e)
            for i, wi in enumerate(w)
        ]
    correct = sum(
        1
        for i in range(n)
        if (
            1
            if picks[0][3] * feats[i][picks[0][0]]
            + picks[1][3] * feats[i][picks[1][0]]
            >= 0
            else -1
        )
        == ys[i]
    )
    for row, (j, e, tot, a) in zip(rows, picks):
        assert row.stump == ADA_STUMPS[j][0]
        assert abs(row.weighted_eps - e / tot) < 1e-6
        assert abs(row.alpha - a) < 1e-6
        assert row.n_rows == n
        assert abs(row.train_accuracy - correct / n) < 1e-6
    # boosting must pick the two signal stumps, not the noise ones
    assert {rows[0].stump, rows[1].stump} == {
        "price_gt_150k",
        "price_gt_350k",
    }
    # and the reweighted round-1 winner sits at exactly eps = 1/2,
    # so round 2 never re-picks it
    assert rows[0].stump != rows[1].stump


def test_gap_islands_brute_force(spark):
    """Islands recomputed with a sequential scan over each user's
    sorted active days; maximality and min-length respected."""
    from hq_master_data_warehouse_spark.operators.lifecycle import (
        ISLAND_MIN_DAYS,
    )

    rows = _rows(spark, "dq_gap_and_islands")
    con = duckdb.connect()
    act = con.execute(
        f"""SELECT DISTINCT user_id, CAST(ts AS DATE)
        FROM '{SF_DIR_001}/events.parquet' ORDER BY 1, 2"""
    ).fetchall()
    per: dict[int, list] = {}
    for u, d in act:
        per.setdefault(u, []).append(d)
    expect = set()
    for u, ds in per.items():
        start = prev = ds[0]
        for d in ds[1:] + [None]:
            if d is not None and (d - prev).days == 1:
                prev = d
                continue
            n = (prev - start).days + 1
            if n >= ISLAND_MIN_DAYS:
                expect.add((u, start, prev, n))
            if d is not None:
                start = prev = d
    got = {
        (r.user_id, r.start_day, r.end_day, r.n_days) for r in rows
    }
    assert got == expect


def test_permutation_test_brute_force(spark):
    """Replay the md5 coin flips and per-replicate diffs in Python;
    n_extreme and the p-value formula must match exactly."""
    import hashlib

    from hq_master_data_warehouse_spark.operators.stats import (
        _PERM_REPLICAS,
    )

    row = _rows(spark, "ml_permutation_test")[0]
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT),
               o_orderpriority IN ('1-URGENT', '2-HIGH')
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    n = len(data)
    s_total = sum(c for _, c, _ in data)
    n_hi = sum(1 for *_, hi in data if hi)
    th = 65536 * n_hi // n
    obs = sum(c for _, c, hi in data if hi) / n_hi - sum(
        c for _, c, hi in data if not hi
    ) / (n - n_hi)
    assert row.n_hi == n_hi and row.n_lo == n - n_hi
    assert abs(row.obs_diff - obs / 100) < 1e-6
    extreme = 0
    for r in range(_PERM_REPLICAS):
        j, m, half = r // 8, (r % 8) // 2, r % 2
        s = c = 0
        for key, cents, _ in data:
            h = hashlib.md5(f"p{key}:{j}".encode()).hexdigest()
            v = int(h[8 * m: 8 * m + 8], 16)
            u = (v >> 16) if half == 0 else (v & 65535)
            if u < th:
                s += cents
                c += 1
        if 0 < c < n:
            diff = s / c - (s_total - s) / (n - c)
            if abs(diff) >= abs(obs):
                extreme += 1
    assert row.n_extreme == extreme
    assert abs(
        row.p_value - (1 + extreme) / (_PERM_REPLICAS + 1)
    ) < 1e-6


def test_approx_quantiles_bounds(spark):
    """GK guarantee, now value-level (VERDICT r7 item 4): the band
    columns are EXACT order statistics at ranks ceil(q*n) -/+
    (ceil(eps*n)+1) -- recomputed here brute-force from the raw cents
    -- and the sketch estimate must land inside its own band."""
    from hq_master_data_warehouse_spark.operators.aggregates import (
        APPROXQ_ACCURACY,
        _APPROXQ_PCTS,
    )

    rows = _rows(spark, "sketch_approx_quantiles")
    assert {r.q_pct for r in rows} == set(_APPROXQ_PCTS)
    con = duckdb.connect()
    cents = [
        c
        for (c,) in con.execute(
            f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM '{SF_DIR_001}/orders.parquet' ORDER BY 1"""
        ).fetchall()
    ]
    n = len(cents)
    band = (n + APPROXQ_ACCURACY - 1) // APPROXQ_ACCURACY + 1
    for r in rows:
        assert r.n == n
        target = (r.q_pct * n + 99) // 100
        lo_rank = max(1, target - band)
        hi_rank = min(n, target + band)
        assert r.lo_rank == lo_rank and r.hi_rank == hi_rank
        # band values are the exact order statistics (1-indexed)
        assert r.lo_cents == cents[lo_rank - 1]
        assert r.hi_cents == cents[hi_rank - 1]
        # the sketch honored its eps guarantee
        assert r.approx_in_band is True


def test_tukey_hsd_brute_force(spark):
    """q statistics recomputed from raw cents; consistent with the
    ANOVA MSW; 10 pairs for 5 groups."""
    rows = _rows(spark, "ml_tukey_hsd")
    assert len(rows) == 10
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, c in vals:
        groups.setdefault(g, []).append(c)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in groups.values()
    )
    msw = ssw / (n - k)
    for r in rows:
        va, vb = groups[r.group_a], groups[r.group_b]
        ma, mb = sum(va) / len(va), sum(vb) / len(vb)
        se = math.sqrt(msw / 2 * (1 / len(va) + 1 / len(vb)))
        assert abs(r.mean_diff - (ma - mb) / 100) < 1e-4
        assert abs(r.std_err - se / 100) < 1e-4
        assert abs(r.q_stat - abs(ma - mb) / se) < 1e-4
        assert r.group_a < r.group_b


def test_modularity_identities(spark):
    """For the CC partition there are no inter-community edges, so
    sum(internal_edges) == m and Q == 1 - sum (d_c/2m)^2; recompute
    both from the raw edge list."""
    rows = _rows(spark, "graph_modularity_score")
    con = duckdb.connect()
    e = con.execute(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM '{SF_DIR_001}/lineitem.parquet')
        SELECT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    m = len(e)
    assert sum(r.internal_edges for r in rows) == m
    assert sum(r.degree_sum for r in rows) == 2 * m
    q = sum(r.q_contrib for r in rows)
    expect_q = 1 - sum(
        (r.degree_sum / (2 * m)) ** 2 for r in rows
    )
    # per-row floor quantization at 1e-6
    assert abs(q - expect_q) <= len(rows) * 1e-6 + 1e-9
    assert -0.5 <= q <= 1.0
    for r in rows:
        # CC partition: internal edge count is maximal, d_c >= 2*e_c
        # fails only for multi-edges which the builder dedups
        assert r.degree_sum >= r.internal_edges


def test_sentiment_brute_force(spark):
    """Replay the lexicon scoring in pure Python per source."""
    import re

    from hq_master_data_warehouse_spark.operators.text import (
        SENTIMENT_NEG,
        SENTIMENT_POS,
    )

    rows = {r.source: r for r in _rows(spark, "text_sentiment_lexicon")}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for src, text in docs:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        pos = sum(1 for t in toks if t in SENTIMENT_POS)
        neg = sum(1 for t in toks if t in SENTIMENT_NEG)
        a = agg.setdefault(src, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += pos > neg
        a[2] += neg > pos
        a[3] += pos == neg
        a[4] += pos
        a[5] += neg
    assert set(agg) == set(rows)
    for src, (nd, np_, nn, nz, ph, nh) in agg.items():
        r = rows[src]
        assert (
            r.n_docs, r.n_positive, r.n_negative, r.n_neutral,
            r.pos_hits, r.neg_hits,
        ) == (nd, np_, nn, nz, ph, nh)
        assert abs(r.polarity - (ph - nh) / (ph + nh)) < 1e-6


def test_asof_tolerance_brute_force(spark):
    """Replay the tolerance as-of in Python: latest same-user click
    at or before each error, kept only within 1 hour."""
    from hq_master_data_warehouse_spark.operators.relational_ext import (
        ASOF_TOLERANCE_US,
    )

    rows = {r.event_id: r for r in _rows(spark, "asof_join_tolerance")}
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
        FROM '{SF_DIR_001}/events.parquet'
        WHERE event_type IN ('click', 'error')"""
    ).fetchall()
    clicks: dict[int, list] = {}
    for eid, uid, typ, us in ev:
        if typ == "click":
            clicks.setdefault(uid, []).append((us, eid))
    for c in clicks.values():
        c.sort()
    n_err = 0
    for eid, uid, typ, us in ev:
        if typ != "error":
            continue
        n_err += 1
        cand = [
            (cus, ceid)
            for cus, ceid in clicks.get(uid, [])
            if cus <= us
        ]
        r = rows[eid]
        if not cand:
            assert r.asof_click_id is None
            continue
        cus = max(c[0] for c in cand)
        ceid = max(c[1] for c in cand if c[0] == cus)
        if us - cus <= ASOF_TOLERANCE_US:
            assert r.asof_click_id == ceid
            assert r.us_since_click == us - cus
        else:
            assert r.asof_click_id is None
            assert r.us_since_click is None
    assert len(rows) == n_err


def test_segmented_trend_brute_force(spark):
    """Breakpoint = argmax |CUSUM| recomputed sequentially; each
    segment's OLS matches a float refit."""
    rows = {r.segment: r for r in _rows(spark, "orders_segmented_trend")}
    con = duckdb.connect()
    days = dict(
        con.execute(
            f"""WITH b AS (SELECT MIN(o_orderdate) AS d0 FROM
                    '{SF_DIR_001}/orders.parquet')
            SELECT datediff('day', b.d0, o_orderdate), COUNT(*)
            FROM '{SF_DIR_001}/orders.parquet' CROSS JOIN b
            GROUP BY 1"""
        ).fetchall()
    )
    nd = max(days) + 1
    y = [days.get(d, 0) for d in range(nd)]
    s = sum(y)
    best, t_star, run = -1, None, 0
    for d in range(nd):
        run += y[d]
        key = abs(nd * run - (d + 1) * s)
        if key > best:
            best, t_star = key, d
    assert rows[0].breakpoint_day == t_star == rows[1].breakpoint_day

    def ols(pts):
        n = len(pts)
        sx = sum(d for d, _ in pts)
        sy = sum(v for _, v in pts)
        sxx = sum(d * d for d, _ in pts)
        sxy = sum(d * v for d, v in pts)
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return b, (sy - b * sx) / n

    lo = [(d, y[d]) for d in range(t_star + 1)]
    hi = [(d, y[d]) for d in range(t_star + 1, nd)]
    for seg, pts in ((0, lo), (1, hi)):
        b, a = ols(pts)
        assert rows[seg].n_days == len(pts)
        assert abs(rows[seg].slope_per_day - b) < 1e-7
        assert abs(rows[seg].intercept - a) < 1e-5


def test_audio_features_brute_force(spark):
    """RMS/ZCR per frame replayed in numpy from the same framed WAV
    bytes; determinism across two runs."""
    from hq_master_data_warehouse_spark.operators.multimodal import (
        AUDIO_FRAME,
        AUDIO_HOP,
    )

    rows = _rows(spark, "multimodal_audio_features")
    again = _rows(spark, "multimodal_audio_features")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc frames the same 64-sample stream: 7 frames
    for doc, rs in by_doc.items():
        assert len(rs) == 7
        for r in rs:
            assert r.start_sample == r.frame * AUDIO_HOP
            assert 0 <= r.zcr <= 1
            assert r.rms >= 0
            assert abs(
                r.zcr - r.zero_crossings / (AUDIO_FRAME - 1)
            ) < 1e-12


def test_join_ivm_quadrants(spark):
    """The bilinear delta rule: the four quadrants partition the
    full join exactly (recomputed from scratch in DuckDB), and no
    quadrant is empty on this fixture."""
    from hq_master_data_warehouse_spark.operators.aggregates import (
        IVM_SPLIT_DATE,
    )

    rows = {r.nation: r for r in _rows(spark, "join_incremental_maintenance")}
    con = duckdb.connect()
    full = con.execute(
        f"""SELECT n.n_name, COUNT(*),
               SUM(CAST(o.o_totalprice AS DECIMAL(30,4)))
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        JOIN '{SF_DIR_001}/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY 1"""
    ).fetchall()
    assert {n for n, *_ in full} == set(rows)
    for n, cnt, tot in full:
        assert rows[n].n_rows == cnt
        assert abs(rows[n].total_price - float(tot)) < 1e-6
    quads = con.execute(
        f"""SELECT o.o_orderdate >= DATE '{IVM_SPLIT_DATE}',
               c.c_custkey % 2, COUNT(*)
        FROM '{SF_DIR_001}/orders.parquet' o
        JOIN '{SF_DIR_001}/customer.parquet' c
          ON o.o_custkey = c.c_custkey GROUP BY 1, 2"""
    ).fetchall()
    assert len(quads) == 4 and all(n > 0 for *_, n in quads)


def test_forecast_backtest_brute_force(spark):
    """All three baselines replayed sequentially in Python."""
    rows = {r.method: r for r in _rows(spark, "orders_forecast_backtest")}
    con = duckdb.connect()
    months = con.execute(
        f"""SELECT date_trunc('month', o_orderdate),
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    y = [v for _, v in months]
    scores = {"naive": [], "snaive": [], "drift": []}
    for t in range(13, len(y)):  # 0-based: months 14..end
        scores["naive"].append((y[t], y[t - 1]))
        scores["snaive"].append((y[t], y[t - 12]))
        scores["drift"].append(
            (y[t], y[t - 1] + (y[t - 1] - y[0]) / (t - 1))
        )
    assert set(rows) == set(scores)
    for m, pairs in scores.items():
        r = rows[m]
        assert r.n_forecasts == len(pairs)
        mae = sum(abs(a - f) for a, f in pairs) / len(pairs) / 100
        rmse = math.sqrt(
            sum((a - f) ** 2 for a, f in pairs) / len(pairs)
        ) / 100
        mape = sum(abs(a - f) / a for a, f in pairs) / len(pairs) * 100
        assert abs(r.mae - mae) < 1e-3
        assert abs(r.rmse - rmse) < 1e-3
        assert abs(r.mape_pct - mape) < 1e-3
    # the seasonal series should make snaive beat nothing here
    # (uniform generator) -- just sanity: all scores positive
    assert all(r.mae > 0 for r in rows.values())


def test_rsi_brute_force(spark):
    """Cutler RSI replayed with a sliding window; 0 <= RSI <= 100."""
    from hq_master_data_warehouse_spark.operators.stats import (
        RSI_WINDOW,
    )

    rows = sorted(_rows(spark, "window_rsi_momentum"), key=lambda r: r.day)
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT o_orderdate,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    cents = [v for _, v in daily]
    moves = [
        (max(cents[i] - cents[i - 1], 0), max(cents[i - 1] - cents[i], 0))
        for i in range(1, len(cents))
    ]
    expect = []
    for i in range(len(moves)):
        w = moves[max(0, i - RSI_WINDOW + 1): i + 1]
        if len(w) >= RSI_WINDOW:
            sg = sum(g for g, _ in w)
            sl = sum(l for _, l in w)
            expect.append(50.0 if sg + sl == 0 else 100 * sg / (sg + sl))
    assert len(rows) == len(expect)
    for r, e in zip(rows, expect):
        assert abs(r.rsi - e) < 1e-3
        assert 0 <= r.rsi <= 100


def test_price_elasticity_brute_force(spark):
    """Float log-log OLS replay (no quantization) within the
    micro-nat error bound; R^2 in [0, 1]."""
    row = _rows(spark, "orders_price_elasticity")[0]
    con = duckdb.connect()
    pts = con.execute(
        f"""SELECT CAST(l_quantity AS DOUBLE),
               CAST(ROUND(100 * l_extendedprice / l_quantity)
                    AS BIGINT)
        FROM '{SF_DIR_001}/lineitem.parquet' WHERE l_quantity > 0"""
    ).fetchall()
    xs = [math.log(p) for _, p in pts]
    ys = [math.log(q) for q, _ in pts]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row.n_lineitems == n
    assert abs(row.elasticity - slope) < 1e-3
    assert abs(row.r_squared - r2) < 1e-3
    assert 0 <= row.r_squared <= 1


def test_xyz_analysis_brute_force(spark):
    """Per-part CVs replayed on the zero-filled month grid; class
    boundaries and totals must match."""
    import statistics

    rows = {r.xyz_class: r for r in _rows(spark, "orders_xyz_analysis")}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT l_partkey, date_trunc('month', l_shipdate),
               SUM(CAST(l_quantity AS BIGINT))
        FROM '{SF_DIR_001}/lineitem.parquet' GROUP BY 1, 2"""
    ).fetchall()
    months = sorted({m for _, m, _ in data})
    per: dict[int, dict] = {}
    for p, m, q in data:
        per.setdefault(p, {})[m] = q
    got: dict[str, list] = {"X": [], "Y": [], "Z": []}
    for p, dm in per.items():
        series = [dm.get(m, 0) for m in months]
        s = sum(series)
        if s == 0:
            continue
        cvv = statistics.stdev(series) / statistics.mean(series)
        cls = "X" if cvv < 0.5 else ("Y" if cvv < 1.0 else "Z")
        got[cls].append((s, cvv))
    for cls, items in got.items():
        if not items:
            assert cls not in rows
            continue
        r = rows[cls]
        assert r.n_parts == len(items)
        assert r.total_demand == sum(s for s, _ in items)
        assert abs(r.min_cv - min(c for _, c in items)) < 1e-5
        assert abs(r.max_cv - max(c for _, c in items)) < 1e-5


def test_wilcoxon_signed_rank_brute_force(spark):
    """Textbook midrank replay over the per-customer first/second
    order differences."""
    row = _rows(spark, "ml_wilcoxon_signed_rank")[0]
    con = duckdb.connect()
    d = [
        x[0]
        for x in con.execute(
            f"""WITH seq AS (
                SELECT o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
                FROM '{SF_DIR_001}/orders.parquet')
            SELECT b.c - a.c
            FROM (SELECT * FROM seq WHERE rn=1) a
            JOIN (SELECT * FROM seq WHERE rn=2) b USING (o_custkey)
            WHERE a.c <> b.c"""
        ).fetchall()
    ]
    n = len(d)
    order = sorted(range(n), key=lambda i: abs(d[i]))
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and abs(d[order[j]]) == abs(d[order[i]]):
            j += 1
        mid = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[order[k]] = mid
        i = j
    w_plus = sum(r for r, x in zip(ranks, d) if x > 0)
    ties = {}
    for x in d:
        ties[abs(x)] = ties.get(abs(x), 0) + 1
    tsum = sum(t**3 - t for t in ties.values())
    mu = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tsum / 48
    z = (w_plus - mu) / math.sqrt(var)
    assert row.n_pairs == n
    assert row.n_pos == sum(1 for x in d if x > 0)
    assert abs(row.w_plus - w_plus) < 1e-6
    assert abs(row.z_stat - z) < 1e-5


def test_gopher_rules_brute_force(spark):
    """Replay every rule in Python; all_rules == intersection."""
    import re

    from hq_master_data_warehouse_spark.operators.text import (
        GOPHER_STOPWORDS,
    )

    rows = {r.rule: r for r in _rows(spark, "text_gopher_quality_rules")}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    counts = dict.fromkeys(
        ["word_count", "mean_word_length", "alpha_ratio",
         "stopword_presence", "unique_word_ratio", "all_rules"], 0)
    for (text,) in docs:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        words = len(toks)
        chars = sum(len(t) for t in toks)
        alpha = sum(1 for t in toks if re.search("[a-z]", t))
        uniq = len(set(toks))
        stops = len({t for t in toks if t in GOPHER_STOPWORDS})
        f = {
            "word_count": 50 <= words <= 100000,
            "mean_word_length": 3 * words <= chars <= 10 * words,
            "alpha_ratio": 10 * alpha >= 8 * words,
            "stopword_presence": stops >= 2,
            "unique_word_ratio": 10 * uniq >= 3 * words,
        }
        for k, v in f.items():
            counts[k] += v
        counts["all_rules"] += all(f.values())
    for rule, n_pass in counts.items():
        assert rows[rule].n_pass == n_pass, rule
        assert rows[rule].n_docs == len(docs)


def test_compression_ratio_brute_force(spark):
    """zlib replay byte-for-byte on every doc; flags consistent."""
    import zlib

    from hq_master_data_warehouse_spark.operators.text import (
        COMPRESS_REPETITIVE_BELOW,
    )

    rows = {r.doc_id: r for r in _rows(spark, "text_compression_ratio")}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR_001}/documents.parquet'"
    ).fetchall()
    assert len(rows) == len(docs)
    for doc_id, text in docs:
        raw = text.encode("utf-8", "surrogatepass")
        comp = len(zlib.compress(raw, 6))
        r = rows[doc_id]
        assert (r.raw_bytes, r.compressed_bytes) == (len(raw), comp)
        ratio = comp / len(raw)
        assert abs(r.compression_ratio - ratio) < 1e-6
        assert r.too_repetitive == (
            1 if ratio < COMPRESS_REPETITIVE_BELOW else 0
        )


def test_bh_adjustment_brute_force(spark):
    """p-values via scipy-free normal CDF replay (same A&S
    polynomial), BH step-up replayed sequentially; monotone and
    bounded by 1."""
    rows = _rows(spark, "ml_multiple_testing_bh")
    assert len(rows) == 10

    def phi(z):
        x = z / math.sqrt(2)
        t = 1 / (1 + 0.3275911 * x)
        erf = 1 - (
            0.254829592 * t - 0.284496736 * t**2 + 1.421413741 * t**3
            - 1.453152027 * t**4 + 1.061405429 * t**5
        ) * math.exp(-x * x)
        return 0.5 * (1 + erf)

    for r in rows:
        assert abs(r.p_raw - 2 * (1 - phi(r.z_stat))) < 1e-5
    ordered = sorted(rows, key=lambda r: (r.p_raw, r.group_a, r.group_b))
    m = len(ordered)
    run = None
    expect = [0.0] * m
    for i in range(m - 1, -1, -1):
        v = ordered[i].p_raw * m / (i + 1)
        run = v if run is None else min(run, v)
        expect[i] = min(run, 1.0)
    for r, e in zip(ordered, expect):
        assert abs(r.p_bh - e) < 1e-4
        assert r.p_bh >= r.p_raw - 1e-4 or r.p_bh == 1.0
        assert r.significant_05 == (1 if r.p_bh < 0.05 else 0)
    # BH-adjusted p-values are monotone in raw-p order
    for a, b in zip(expect, expect[1:]):
        assert a <= b + 1e-12


def test_geo_ops_brute_force(spark):
    """Coordinates replayed from md5; cell aggregation and the
    blocked closest-pair list recomputed exactly."""
    import hashlib

    from hq_master_data_warehouse_spark.operators.analytics import (
        GEO_CELL_DEG,
        GEO_EARTH_KM,
        GEO_TOPK_PAIRS,
    )

    con = duckdb.connect()
    acts = dict(
        con.execute(
            f"""SELECT user_id, COUNT(*) FROM
                '{SF_DIR_001}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )

    def u(salt, uid):
        h = hashlib.md5(f"{salt}{uid}".encode()).hexdigest()
        return int(h[:8], 16) >> 16

    coords = {
        uid: (
            u("lat", uid) / 65535 * 180 - 90,
            u("lon", uid) / 65535 * 360 - 180,
        )
        for uid in acts
    }
    cells_rows = _rows(spark, "geo_grid_cells")
    agg: dict[tuple, list] = {}
    for uid, (la, lo) in coords.items():
        key = (math.floor(la / GEO_CELL_DEG), math.floor(lo / GEO_CELL_DEG))
        a = agg.setdefault(key, [0, 0, 0.0, 0.0])
        a[0] += 1
        a[1] += acts[uid]
        a[2] += la
        a[3] += lo
    assert {(r.cell_lat, r.cell_lon) for r in cells_rows} == set(agg)
    for r in cells_rows:
        n, ne, sla, slo = agg[(r.cell_lat, r.cell_lon)]
        assert (r.n_users, r.n_events) == (n, ne)
        assert abs(r.centroid_lat - sla / n) < 1e-5
        assert abs(r.centroid_lon - slo / n) < 1e-5

    def hav(a, b):
        (la1, lo1), (la2, lo2) = coords[a], coords[b]
        p1, p2 = math.radians(la1), math.radians(la2)
        dp = math.radians(la2 - la1)
        dl = math.radians(lo2 - lo1)
        x = (
            math.sin(dp / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * GEO_EARTH_KM * math.asin(math.sqrt(x))

    by_cell: dict[tuple, list] = {}
    for uid, (la, lo) in coords.items():
        by_cell.setdefault(
            (math.floor(la / GEO_CELL_DEG), math.floor(lo / GEO_CELL_DEG)),
            [],
        ).append(uid)
    cand = []
    for us in by_cell.values():
        us.sort()
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                cand.append((hav(us[i], us[j]), us[i], us[j]))
    cand.sort()
    expect = cand[:GEO_TOPK_PAIRS]
    got = _rows(spark, "geo_haversine_pairs")
    assert len(got) == len(expect)
    for r, (d, a, b) in zip(got, expect):
        assert (r.user_a, r.user_b) == (a, b)
        assert abs(r.dist_km - d) < 1e-3


def test_pq_adc_replay(spark):
    """Full pure-Python replay of the INTEGER PQ pipeline (r10:
    hash-seeded init, PQ_Q quantization, 2 Lloyd iterations with
    ROUND(SUM/COUNT) centroid updates, ADC shortlist, exact integer
    rerank).  Since every pipeline number is exact, the comparison is
    EXACT EQUALITY -- the pre-r10 float model needed a +-0.1 recall
    tolerance for last-ULP argmin flips."""
    import hashlib

    from hq_master_data_warehouse_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_Q,
        PQ_QUERIES,
        PQ_SHORTLIST,
        PQ_TOPK,
    )

    rows = {r.query_id: r for r in _rows(spark, "similarity_pq_adc")}
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR_001}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = [v for v, _ in emb]

    def r_half_away(x: float) -> int:
        import math

        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    X = [
        [r_half_away(float(x) * PQ_Q) for x in e] for _, e in emb
    ]
    n, dim = len(X), len(X[0])
    sd = dim // PQ_M
    idx = {v: i for i, v in enumerate(ids)}
    seed_ids = sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:PQ_K]
    order = sorted(
        range(PQ_K),
        key=lambda i: hashlib.md5(
            str(seed_ids[i]).encode()
        ).hexdigest(),
    )
    cents = [
        [
            list(X[idx[seed_ids[o]]][m * sd: (m + 1) * sd])
            for o in order
        ]
        for m in range(PQ_M)
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(cents):
        codes, qerr = [], []
        for i in range(n):
            cr, qr = [], []
            for m in range(PQ_M):
                sub = X[i][m * sd: (m + 1) * sd]
                best = min(
                    range(PQ_K), key=lambda c: (d2(sub, cents[m][c]), c)
                )
                cr.append(best)
                qr.append(d2(sub, cents[m][best]))
            codes.append(cr)
            qerr.append(qr)
        return codes, qerr

    for _ in range(PQ_ITERS):
        codes, _ = assign(cents)
        for m in range(PQ_M):
            for c in range(PQ_K):
                members = [
                    X[i][m * sd: (m + 1) * sd]
                    for i in range(n)
                    if codes[i][m] == c
                ]
                if members:
                    cnt = len(members)
                    cents[m][c] = [
                        r_half_away(
                            sum(v[j] for v in members) / cnt
                        )
                        for j in range(sd)
                    ]
    codes, qerr = assign(cents)
    mse = sum(sum(q) for q in qerr) / (n * PQ_M) / (PQ_Q * PQ_Q)
    assert rows[ids[0]].mean_quantization_mse == round(mse, 8)

    for qi in range(PQ_QUERIES):
        q = X[qi]
        lut = [
            [d2(q[m * sd: (m + 1) * sd], cents[m][c])
             for c in range(PQ_K)]
            for m in range(PQ_M)
        ]
        adc = [
            sum(lut[m][codes[i][m]] for m in range(PQ_M))
            for i in range(n)
        ]
        short = sorted(range(n), key=lambda i: (adc[i], ids[i]))[
            :PQ_SHORTLIST
        ]
        exact_d = [d2(X[i], q) for i in range(n)]
        rer = sorted(short, key=lambda i: (exact_d[i], ids[i]))[
            :PQ_TOPK
        ]
        true = sorted(range(n), key=lambda i: (exact_d[i], ids[i]))[
            :PQ_TOPK
        ]
        recall = len(set(rer) & set(true)) / PQ_TOPK
        assert rows[ids[qi]].recall_at_10 == recall  # EXACT
    # determinism across runs
    again = {r.query_id: r for r in _rows(spark, "similarity_pq_adc")}
    assert {k: v.recall_at_10 for k, v in rows.items()} == {
        k: v.recall_at_10 for k, v in again.items()
    }


def test_sql_interface_invariants(spark):
    """Top-3 per region, shares consistent, rank order correct."""
    rows = _rows(spark, "sql_interface_topk_share")
    per: dict[str, list] = {}
    for r in rows:
        per.setdefault(r.region, []).append(r)
    assert len(per) == 5
    for region, rs in per.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        assert rs[0].revenue >= rs[1].revenue >= rs[2].revenue
        assert all(0 < r.region_share < 1 for r in rs)


def test_frequent_triples_brute_force(spark):
    """Exhaustive triple support count over the distinct basket
    sets; a-priori completeness (every frequent triple found)."""
    from hq_master_data_warehouse_spark.operators.lifecycle import (
        TRIPLE_MIN_SUPPORT,
    )
    import itertools

    rows = {
        (r.part_a, r.part_b, r.part_c): r
        for r in _rows(spark, "basket_frequent_triples")
    }
    con = duckdb.connect()
    op = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_partkey
        FROM '{SF_DIR_001}/lineitem.parquet'"""
    ).fetchall()
    baskets: dict[int, set] = {}
    for o, p in op:
        baskets.setdefault(o, set()).add(p)
    support: dict[tuple, int] = {}
    for items in baskets.values():
        for tri in itertools.combinations(sorted(items), 3):
            support[tri] = support.get(tri, 0) + 1
    expect = {
        t: c for t, c in support.items() if c >= TRIPLE_MIN_SUPPORT
    }
    assert set(rows) == set(expect)
    n = len(baskets)
    for t, c in expect.items():
        assert rows[t].n_orders == c
        assert rows[t].support_ppm == 1000000 * c // n


def test_cuped_brute_force(spark):
    """theta, adjusted diff, and variance reduction replayed from
    per-customer floats; CUPED preserves the diff when groups have
    equal pre-period means in expectation (identity check on the
    formula, not the data)."""
    row = _rows(spark, "ml_cuped_adjustment")[0]
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT
               SUM(CASE WHEN o_orderdate < DATE '1997-01-01'
                   THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   ELSE 0 END),
               SUM(CASE WHEN o_orderdate >= DATE '1997-01-01'
                   THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   ELSE 0 END),
               CASE WHEN SUM(CASE WHEN o_orderpriority IN
                    ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) * 2
                    > COUNT(*) THEN 1 ELSE 0 END
        FROM '{SF_DIR_001}/orders.parquet' GROUP BY o_custkey"""
    ).fetchall()
    import statistics

    pre = [x for x, _, _ in data]
    post = [y for _, y, _ in data]
    grp = [g for *_, g in data]
    n = len(data)
    mx = statistics.mean(pre)
    cov = sum(
        (x - mx) * (y - statistics.mean(post))
        for x, y in zip(pre, post)
    )
    var = sum((x - mx) ** 2 for x in pre)
    theta = cov / var
    hi = [i for i in range(n) if grp[i] == 1]
    lo = [i for i in range(n) if grp[i] == 0]
    my1 = statistics.mean(post[i] for i in hi)
    my0 = statistics.mean(post[i] for i in lo)
    adj1 = statistics.mean(
        post[i] - theta * (pre[i] - mx) for i in hi
    )
    adj0 = statistics.mean(
        post[i] - theta * (pre[i] - mx) for i in lo
    )
    assert row.n_customers == n
    assert row.n_hi == len(hi) and row.n_lo == len(lo)
    assert abs(row.theta - theta) < 1e-5
    assert abs(row.raw_diff - (my1 - my0) / 100) < 1e-2
    assert abs(row.cuped_diff - (adj1 - adj0) / 100) < 1e-2
    # variance reduction == squared pre/post correlation
    vy = sum((y - statistics.mean(post)) ** 2 for y in post)
    assert abs(row.variance_reduction - cov * cov / (var * vy)) < 1e-5
    assert 0 <= row.variance_reduction < 1


def test_winsorized_brute_force(spark):
    """Order-statistic bounds and all three means replayed; the
    robust means sit between min and raw mean orderings sanely."""
    row = _rows(spark, "agg_winsorized_stats")[0]
    con = duckdb.connect()
    cents = sorted(
        x[0]
        for x in con.execute(
            f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM '{SF_DIR_001}/orders.parquet'"""
        ).fetchall()
    )
    n = len(cents)
    lo = cents[math.ceil(0.05 * n) - 1]
    hi = cents[math.ceil(0.95 * n) - 1]
    wins = [min(max(c, lo), hi) for c in cents]
    trim = [c for c in cents if lo <= c <= hi]
    assert row.n_orders == n and row.n_trim == len(trim)
    assert abs(row.mean_raw - sum(cents) / n / 100) < 1e-3
    assert abs(row.mean_winsorized - sum(wins) / n / 100) < 1e-3
    assert abs(row.mean_trimmed - sum(trim) / len(trim) / 100) < 1e-3


def test_markov_eval_brute_force(spark):
    """Train/predict/score replayed sequentially in Python."""
    import hashlib

    row = _rows(spark, "events_markov_next_event_eval")[0]
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT user_id, event_type FROM
            '{SF_DIR_001}/events.parquet' ORDER BY user_id, ts,
            event_id"""
    ).fetchall()
    seqs: dict[int, list] = {}
    for u, t in ev:
        seqs.setdefault(u, []).append(t)
    tr_counts: dict[tuple, int] = {}
    test_pairs = []
    for u, s in seqs.items():
        split = hashlib.md5(str(u).encode()).hexdigest()[0] < "c"
        for cur, nxt in zip(s, s[1:]):
            if split:
                tr_counts[(cur, nxt)] = tr_counts.get((cur, nxt), 0) + 1
            else:
                test_pairs.append((cur, nxt))
    pred = {}
    curs = {c for c, _ in tr_counts}
    for c in curs:
        cands = {n: v for (cc, n), v in tr_counts.items() if cc == c}
        mx = max(cands.values())
        pred[c] = min(n for n, v in cands.items() if v == mx)
    totals: dict[str, int] = {}
    for (_, n), v in tr_counts.items():
        totals[n] = totals.get(n, 0) + v
    mx = max(totals.values())
    majority = min(n for n, v in totals.items() if v == mx)
    n_m = sum(1 for c, n in test_pairs if pred.get(c) == n)
    n_b = sum(1 for _, n in test_pairs if n == majority)
    assert row.n_test_transitions == len(test_pairs)
    assert row.n_correct_markov == n_m
    assert row.n_correct_majority == n_b
    assert abs(row.acc_markov - n_m / len(test_pairs)) < 1e-6
    assert abs(row.acc_majority - n_b / len(test_pairs)) < 1e-6


def test_delta_method_brute_force(spark):
    """Delta-method SE replayed from per-customer floats; the z of
    hi-vs-lo is consistent and lo's own z is 0."""
    import statistics

    rows = {r.grp: r for r in _rows(spark, "ml_ratio_metric_delta_method")}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CASE WHEN SUM(CASE WHEN o_orderpriority IN
                ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) * 2
                > COUNT(*) THEN 'hi' ELSE 'lo' END,
               COUNT(*),
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' GROUP BY o_custkey"""
    ).fetchall()
    per: dict[str, list] = {}
    for g, x, y in data:
        per.setdefault(g, []).append((x, y))
    stats = {}
    for g, xy in per.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        r = sy / sx
        mx = sx / n
        vx = statistics.variance([x for x, _ in xy])
        vy = statistics.variance([y for _, y in xy])
        mxm = sx / n
        mym = sy / n
        cxy = sum(
            (x - mxm) * (y - mym) for x, y in xy
        ) / (n - 1)
        se = math.sqrt((vy - 2 * r * cxy + r * r * vx) / (mx * mx) / n)
        stats[g] = (n, r, se)
        assert rows[g].n_customers == n
        assert abs(rows[g].revenue_per_order - r / 100) < 1e-2
        assert abs(rows[g].se_delta - se / 100) < 1e-2
    (nh, rh, seh), (nl, rl, sel) = stats["hi"], stats["lo"]
    z = (rh - rl) / math.sqrt(seh**2 + sel**2)
    assert abs(rows["hi"].z_vs_lo - z) < 1e-4
    assert rows["lo"].z_vs_lo == 0.0


def test_wasserstein_brute_force(spark):
    """W1 recomputed two independent ways: the CDF-gap integral and
    scipy-style sorted-sample transport on equalized quantiles
    (cross-check only the CDF form exactly; the two agree for the
    integral definition)."""
    row = _rows(spark, "ml_wasserstein_distance")[0]
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT o_orderpriority IN ('1-URGENT','2-HIGH'),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    hi = sorted(c for t, c in data if t)
    lo = sorted(c for t, c in data if not t)
    n1, n2 = len(hi), len(lo)
    values = sorted(set(hi) | set(lo))
    import bisect

    w1 = 0.0
    for v, nv in zip(values, values[1:]):
        f1 = bisect.bisect_right(hi, v) / n1
        f2 = bisect.bisect_right(lo, v) / n2
        w1 += (nv - v) * abs(f1 - f2)
    assert (row.n_hi, row.n_lo) == (n1, n2)
    assert abs(row.w1_dollars - w1 / 100) < 1e-4
    assert row.w1_dollars >= 0


def test_segment_migration_brute_force(spark):
    """Per-year terciles and year-over-year transitions replayed."""
    rows = {
        (r.seg_from, r.seg_to): r.n_customers
        for r in _rows(spark, "orders_segment_migration")
    }
    con = duckdb.connect()
    cy = con.execute(
        f"""SELECT o_custkey, year(o_orderdate),
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM '{SF_DIR_001}/orders.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per_year: dict[int, list] = {}
    for c, y, r in cy:
        per_year.setdefault(y, []).append(r)
    bounds = {}
    for y, revs in per_year.items():
        revs.sort()
        n = len(revs)
        b1 = revs[math.ceil(n / 3) - 1]
        b2 = revs[math.ceil(2 * n / 3) - 1]
        bounds[y] = (b1, b2)

    def seg(y, r):
        b1, b2 = bounds[y]
        return "low" if r <= b1 else ("mid" if r <= b2 else "high")

    per_cust: dict[int, dict] = {}
    for c, y, r in cy:
        per_cust.setdefault(c, {})[y] = seg(y, r)
    expect: dict[tuple, int] = {}
    for segs in per_cust.values():
        for y in sorted(segs):
            if y + 1 in segs:
                k = (segs[y], segs[y + 1])
                expect[k] = expect.get(k, 0) + 1
    assert rows == expect


def test_conformal_brute_force(spark):
    """Full split-conformal replay (md5 splits, quantized means,
    order-statistic q_hat, exact coverage); realized coverage sits
    near the 90% target within binomial slack."""
    import hashlib

    row = _rows(spark, "ml_conformal_interval")[0]
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF_DIR_001}/orders.parquet'"""
    ).fetchall()
    split = {}
    for k, _, _ in data:
        h = hashlib.md5(str(k).encode()).hexdigest()[0]
        split[k] = "train" if h < "8" else ("cal" if h < "c" else "test")
    tr: dict[str, list] = {}
    for k, p, c in data:
        if split[k] == "train":
            tr.setdefault(p, []).append(c)
    pred = {
        p: math.floor(1e6 * sum(v) / len(v)) for p, v in tr.items()
    }
    cal = sorted(
        abs(1000000 * c - pred[p])
        for k, p, c in data
        if split[k] == "cal"
    )
    n_cal = len(cal)
    kq = min(math.ceil((n_cal + 1) * 0.9), n_cal)
    q = cal[kq - 1]
    test = [
        abs(1000000 * c - pred[p])
        for k, p, c in data
        if split[k] == "test"
    ]
    cov = sum(1 for r in test if r <= q) / len(test)
    assert row.n_cal == n_cal and row.n_test == len(test)
    assert abs(row.interval_halfwidth - q / 1e6 / 100) < 1e-4
    assert abs(row.test_coverage - cov) < 1e-6
    # marginal validity: realized coverage near 1 - alpha
    assert 0.85 <= row.test_coverage <= 0.96


def test_item_cf_brute_force(spark):
    """Cosines replayed from exhaustive customer-set intersections;
    the reported 20 are the global top by (cosine, a, b)."""
    from hq_master_data_warehouse_spark.operators.lifecycle import (
        CF_MIN_COMMON,
        CF_TOPK,
    )

    rows = _rows(spark, "ml_item_cf_similarity")
    con = duckdb.connect()
    cp = con.execute(
        f"""SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM '{SF_DIR_001}/lineitem.parquet' l
        JOIN '{SF_DIR_001}/orders.parquet' o
          ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    custs: dict[int, set] = {}
    for c, p in cp:
        custs.setdefault(p, set()).add(c)
    pairs = []
    parts = sorted(custs)
    inv: dict[int, set] = {}
    for p, cs in custs.items():
        for c in cs:
            inv.setdefault(c, set()).add(p)
    common: dict[tuple, int] = {}
    for items in inv.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                common[(s[i], s[j])] = common.get((s[i], s[j]), 0) + 1
    for (a, b), n_ab in common.items():
        if n_ab >= CF_MIN_COMMON:
            cos = n_ab / math.sqrt(len(custs[a]) * len(custs[b]))
            pairs.append((round(cos, 6), a, b, n_ab))
    pairs.sort(key=lambda x: (-x[0], x[1], x[2]))
    expect = pairs[:CF_TOPK]
    assert len(rows) == len(expect)
    for r, (cos, a, b, n_ab) in zip(rows, expect):
        assert (r.part_a, r.part_b, r.n_common_customers) == (a, b, n_ab)
        assert abs(r.cosine - cos) < 1e-6


def test_repeat_curve_brute_force(spark):
    """Counts, shares and continuation rates replayed; the curve is
    non-increasing in k."""
    rows = sorted(_rows(spark, "orders_repeat_purchase_curve"),
                  key=lambda r: r.k)
    con = duckdb.connect()
    counts = [
        x[0]
        for x in con.execute(
            f"""SELECT COUNT(*) FROM '{SF_DIR_001}/orders.parquet'
            GROUP BY o_custkey"""
        ).fetchall()
    ]
    base = len(counts)
    prev = None
    for r in rows:
        n_ge = sum(1 for c in counts if c >= r.k)
        assert r.n_ge_k == n_ge
        assert abs(r.share - n_ge / base) < 1e-6
        if prev is not None:
            assert prev.n_ge_k >= r.n_ge_k
            assert abs(
                prev.continuation_rate - r.n_ge_k / prev.n_ge_k
            ) < 1e-6
        prev = r
    assert rows[-1].continuation_rate is None


def test_logrank_brute_force(spark):
    """Log-rank O/E/V replayed with the textbook per-event-time
    loop over the duration table."""
    row = _rows(spark, "orders_logrank_test")[0]
    con = duckdb.connect()
    subj = con.execute(
        f"""WITH seq AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                   o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
            FROM '{SF_DIR_001}/orders.parquet'),
        fin AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS f
                FROM '{SF_DIR_001}/orders.parquet')
        SELECT f1.o_orderpriority IN ('1-URGENT','2-HIGH'),
               CASE WHEN s.d IS NULL
                    THEN date_diff('day', f1.d, fin.f)
                    ELSE date_diff('day', f1.d, s.d) END,
               s.d IS NOT NULL
        FROM (SELECT * FROM seq WHERE rn=1) f1 CROSS JOIN fin
        LEFT JOIN (SELECT * FROM seq WHERE rn=2) s
               ON s.o_custkey = f1.o_custkey"""
    ).fetchall()
    times = sorted({t for _, t, ev in subj if ev})
    o = e = v = 0.0
    for t in times:
        at_risk = [(hi, ev) for hi, tt, ev in subj if tt >= t]
        d_all = sum(1 for hi, tt, ev in subj if tt == t and ev)
        d_hi = sum(
            1 for hi, tt, ev in subj if tt == t and ev and hi
        )
        n_all = len(at_risk)
        n_hi = sum(1 for hi, _ in at_risk if hi)
        o += d_hi
        e += d_all * n_hi / n_all
        if n_all > 1:
            v += (
                d_all * n_hi * (n_all - n_hi) * (n_all - d_all)
                / (n_all**2 * (n_all - 1))
            )
    assert row.observed_hi == o
    assert abs(row.expected_hi - e) < 1e-2
    assert abs(row.z_logrank - (o - e) / math.sqrt(v)) < 1e-4


def test_cochran_armitage_brute_force(spark):
    """z recomputed from the 2x5 table with textbook score form."""
    row = _rows(spark, "ml_cochran_armitage_trend")[0]
    con = duckdb.connect()
    cells = dict(
        (p, (n, f))
        for p, n, f in con.execute(
            f"""SELECT o_orderpriority, COUNT(*),
                   SUM(CASE WHEN o_orderstatus = 'F'
                       THEN 1 ELSE 0 END)
            FROM '{SF_DIR_001}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    groups = sorted(cells)  # '1-URGENT' .. '5-LOW'
    scores = range(1, 6)
    n = sum(v[0] for v in cells.values())
    nf = sum(v[1] for v in cells.values())
    sf_ = sum(s * cells[g][1] for g, s in zip(groups, scores))
    sn = sum(s * cells[g][0] for g, s in zip(groups, scores))
    snn = sum(s * s * cells[g][0] for g, s in zip(groups, scores))
    p = nf / n
    z = (sf_ - nf * sn / n) / math.sqrt(
        p * (1 - p) * (snn - sn * sn / n)
    )
    assert (row.n_orders, row.n_finished) == (n, nf)
    assert abs(row.z_trend - z) < 1e-5


def test_granger_brute_force(spark):
    """Both SSEs replayed with explicit least-squares fits (numpy
    lstsq) over the zero-filled daily series; F >= 0."""
    import numpy as np

    row = _rows(spark, "events_granger_causality")[0]
    con = duckdb.connect()
    days = con.execute(
        f"""WITH b AS (SELECT CAST(MIN(ts) AS DATE) AS d0,
                       CAST(MAX(ts) AS DATE) AS d1
                FROM '{SF_DIR_001}/events.parquet')
        SELECT datediff('day', b.d0, CAST(ts AS DATE)),
               SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
        FROM '{SF_DIR_001}/events.parquet' CROSS JOIN b
        GROUP BY 1"""
    ).fetchall()
    span = con.execute(
        f"""SELECT datediff('day', CAST(MIN(ts) AS DATE),
                   CAST(MAX(ts) AS DATE))
        FROM '{SF_DIR_001}/events.parquet'"""
    ).fetchone()[0]
    xs = [0] * (span + 1)
    ys = [0] * (span + 1)
    for d, x, y in days:
        xs[d], ys[d] = x, y
    yt = np.array(ys[1:], dtype=float)
    yl = np.array(ys[:-1], dtype=float)
    xl = np.array(xs[:-1], dtype=float)
    one = np.ones_like(yt)

    def sse(X):
        beta, *_ = np.linalg.lstsq(X, yt, rcond=None)
        r = yt - X @ beta
        return float(r @ r)

    sse_r = sse(np.column_stack([one, yl]))
    sse_u = sse(np.column_stack([one, yl, xl]))
    n = len(yt)
    assert row.n_days == n
    assert abs(row.sse_restricted - sse_r) < 1e-2
    assert abs(row.sse_unrestricted - sse_u) < 1e-2
    assert abs(
        row.f_granger - (sse_r - sse_u) / (sse_u / (n - 3))
    ) < 1e-3
    assert row.f_granger >= 0
    assert row.sse_unrestricted <= row.sse_restricted + 1e-9


def test_jarque_bera_brute_force(spark):
    """Skewness/kurtosis/JB replayed with explicit central moments
    in Python floats."""
    row = _rows(spark, "ml_jarque_bera")[0]
    con = duckdb.connect()
    cents = [
        x[0]
        for x in con.execute(
            f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM '{SF_DIR_001}/orders.parquet'"""
        ).fetchall()
    ]
    n = len(cents)
    mu = sum(cents) / n
    m2 = sum((c - mu) ** 2 for c in cents) / n
    m3 = sum((c - mu) ** 3 for c in cents) / n
    m4 = sum((c - mu) ** 4 for c in cents) / n
    s = m3 / m2**1.5
    k = m4 / m2**2 - 3
    jb = n / 6 * (s**2 + k**2 / 4)
    assert row.n_orders == n
    assert abs(row.skewness - s) < 1e-4
    assert abs(row.excess_kurtosis - k) < 1e-4
    assert abs(row.jarque_bera - jb) < max(0.01 * jb, 0.01)
    # uniform-ish distribution: negative excess kurtosis expected
    assert row.excess_kurtosis < 0


def test_variance_trend_brute_force(spark):
    """Residuals materialized explicitly in Python; the auxiliary
    slope and hetero index must match the momentized forms."""
    row = _rows(spark, "ml_hetero_variance_trend")[0]
    con = duckdb.connect()
    days = dict(
        con.execute(
            f"""WITH b AS (SELECT MIN(o_orderdate) AS d0 FROM
                    '{SF_DIR_001}/orders.parquet')
            SELECT datediff('day', b.d0, o_orderdate), COUNT(*)
            FROM '{SF_DIR_001}/orders.parquet' CROSS JOIN b
            GROUP BY 1"""
        ).fetchall()
    )
    n = max(days) + 1
    y = [days.get(t, 0) for t in range(n)]
    st, sy = sum(range(n)), sum(y)
    st2 = sum(t * t for t in range(n))
    sty = sum(t * v for t, v in enumerate(y))
    b = (n * sty - st * sy) / (n * st2 - st * st)
    a = (sy - b * st) / n
    u = [(v - a - b * t) ** 2 for t, v in enumerate(y)]
    su, stu = sum(u), sum(t * x for t, x in enumerate(u))
    cov = stu - st * su / n
    vart = st2 - st * st / n
    assert row.n_days == n
    assert abs(row.trend_slope - b) < 1e-8
    assert abs(row.var_trend_slope - cov / vart) < 1e-6
    hetero = cov**2 / vart / (su / n) ** 2 / n
    assert abs(row.hetero_index - hetero) < 1e-4
    assert row.hetero_index >= 0
