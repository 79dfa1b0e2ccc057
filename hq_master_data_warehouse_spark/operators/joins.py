"""Join family (SURVEY ops J1-J4).

The reference's two interesting joins are workarounds for PostgREST
limits -- a NOT-IN string built from a collected ID list (anti-join,
src/app/api/companies/route.ts:28-37) and a 100-id-chunked IN fetch
(semi-join, src/app/api/send/route.ts:33-54).  Both become single
distributed joins here: no driver-side ID materialization, no chunking,
and AQE is free to choose broadcast-hash when the ledger side is small.
At 100 TB the anti/semi joins shuffle on the customer key only after
predicate pushdown has cut the fact scan; the config-dimension joins
are explicitly broadcast (dims are KBs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.ledger_fixture import SENT_LEDGER_SQL, sent_ledger
from ..sources.loaders import load_table


# -- J1: anti-join "exclude already sent" + F1 + O1 + W1 pagination --
#    the reference's exclude_sent=true path (companies/route.ts:28-41).
#    Fixture D2: BUILDING-segment customers with no ledger entry,
#    ordered by name, page 2 of size 20.
@query(
    "anti_join_exclude_sent",
    oracle=f"""
    WITH ledger AS ({SENT_LEDGER_SQL})
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE c.c_mktsegment = 'BUILDING'
      AND NOT EXISTS (SELECT 1 FROM ledger l
                      WHERE l.company_id = c.c_custkey)
    ORDER BY c_name
    LIMIT 20 OFFSET 20
    """,
)
def anti_join_exclude_sent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    customer = load_table(spark, sf_dir, "customer")
    ledger = sent_ledger(spark, sf_dir).withColumnRenamed(
        "company_id", "c_custkey"
    )
    unsent = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(ledger, on="c_custkey", how="left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    # Offset pagination via row_number (W1).  Global orderBy window is
    # single-partition -- deliberate: it runs on an already
    # segment-filtered, anti-joined page source (dashboard scale), per
    # SURVEY.md par.4.2.
    w = Window.orderBy("c_name")
    return (
        unsent.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 40))
        .drop("rn")
    )


# -- J2: semi-join "fetch selected IDs" (send/route.ts:33-54).  The
#    selected-ID set is itself a DataFrame; the 100-id URL chunking
#    disappears.
@query(
    "semi_join_fetch_selected",
    oracle=f"""
    WITH ledger AS ({SENT_LEDGER_SQL})
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM ledger l WHERE l.company_id = c.c_custkey)
      AND c.c_mktsegment = 'MACHINERY'
    """,
)
def semi_join_fetch_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    picked = sent_ledger(spark, sf_dir).withColumnRenamed(
        "company_id", "c_custkey"
    )
    return (
        customer.filter(F.col("c_mktsegment") == "MACHINERY")
        .join(picked, on="c_custkey", how="left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# -- J3: FK equi-join to config dimensions (supabase-schema.sql:18:
#    company_sends.webhook_id REFERENCES clay_webhooks).  Dims are tiny
#    -- broadcast explicitly so no shuffle of the fact side's join key
#    is ever needed at scale.
@query(
    "broadcast_fk_join",
    oracle="""
    SELECT r.r_name AS region_name, COUNT(*) AS order_cnt
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def broadcast_fk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("order_cnt"))
    )


# -- J4: multi-way full-outer count join (dashboard card merge,
#    src/app/page.tsx:361-388): availability counts x sent counts x
#    webhook counts per bucket, missing sides coalesced to 0.
@query(
    "multiway_outer_counts",
    oracle=f"""
    WITH ledger AS ({SENT_LEDGER_SQL}),
    avail AS (
        SELECT c_mktsegment AS segment, COUNT(*) AS available
        FROM customer GROUP BY c_mktsegment
    ),
    sent AS (
        SELECT c.c_mktsegment AS segment, COUNT(*) AS sent
        FROM ledger l JOIN customer c ON c.c_custkey = l.company_id
        GROUP BY c.c_mktsegment
    ),
    hooks AS (
        SELECT r.r_name AS segment, COUNT(*) AS webhook_cnt
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    )
    SELECT
        COALESCE(a.segment, s.segment, h.segment) AS segment,
        COALESCE(a.available, 0) AS available,
        COALESCE(s.sent, 0) AS sent,
        COALESCE(h.webhook_cnt, 0) AS webhook_cnt
    FROM avail a
    FULL OUTER JOIN sent s ON a.segment = s.segment
    FULL OUTER JOIN hooks h ON COALESCE(a.segment, s.segment) = h.segment
    """,
)
def multiway_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    ledger = sent_ledger(spark, sf_dir)

    avail = customer.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(F.count("*").alias("available"))
    sent = (
        ledger.join(customer, ledger.company_id == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("sent"))
    )
    hooks = (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy(F.col("r_name").alias("segment"))
        .agg(F.count("*").alias("webhook_cnt"))
    )
    return (
        avail.join(sent, on="segment", how="full_outer")
        .join(hooks, on="segment", how="full_outer")
        .select(
            "segment",
            F.coalesce("available", F.lit(0)).alias("available"),
            F.coalesce("sent", F.lit(0)).alias("sent"),
            F.coalesce("webhook_cnt", F.lit(0)).alias("webhook_cnt"),
        )
    )


# -- null-safe equi-join (engine surface): NULL keys match each other
#    under <=> (IS NOT DISTINCT FROM), where a plain equi-join drops
#    them.  The fixture has no NULL keys, so both sides derive one
#    deterministically (NULLIF on the 'BUILDING' segment) -- exactly
#    the shape of joining two feeds that both use NULL for "unknown".
#    Scale note: <=> is still hash-joinable (NULL hashes like any
#    value), so the plan is the same shuffled/broadcast hash join as
#    F1 -- no nested-loop penalty.
@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg_key,
               c_custkey
        FROM customer
    ),
    d AS (
        SELECT NULLIF(s, 'BUILDING') AS seg_key, tier FROM (
            SELECT DISTINCT c_mktsegment AS s,
                   CASE WHEN c_mktsegment < 'F' THEN 'early'
                        ELSE 'late' END AS tier
            FROM customer
        ) t
    )
    SELECT COALESCE(c.seg_key, 'unknown') AS segment, d.tier,
           COUNT(*) AS n_customers
    FROM c JOIN d ON c.seg_key IS NOT DISTINCT FROM d.seg_key
    GROUP BY COALESCE(c.seg_key, 'unknown'), d.tier
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    c = customer.select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "seg_key"
        ),
        "c_custkey",
    )
    d = (
        customer.select(
            F.col("c_mktsegment").alias("s"),
            F.when(F.col("c_mktsegment") < "F", "early")
            .otherwise("late")
            .alias("tier"),
        )
        .distinct()
        .select(
            F.nullif(F.col("s"), F.lit("BUILDING")).alias("seg_key"),
            "tier",
        )
    )
    return (
        c.join(F.broadcast(d), c["seg_key"].eqNullSafe(d["seg_key"]))
        .select(
            F.coalesce(c["seg_key"], F.lit("unknown")).alias("segment"),
            "tier",
        )
        .groupBy("segment", "tier")
        .agg(F.count("*").alias("n_customers"))
    )


#: bloom-prefilter geometry: m = 2^17 bits (16 KiB as 2048 longs --
#: driver/broadcast-trivial), k = 4 probes.  At ~4k build keys the
#: false-positive rate is ~(1 - e^(-4*4096/131072))^4 ~ 2e-4.
_BLOOM_M = 1 << 17
_BLOOM_K = 4


def _bloom_words(dim_keys, key: str) -> list[int]:
    """Build the bloom bitmap from the (small) build side: explode k
    seeded xxhash64 probes per key, OR per 64-bit word, collect the
    <= m/64 populated words.  The collect is bounded by the BITMAP
    size (2048 rows), never the key count -- the same bounded-probe
    pattern as the cosine chunk grid."""
    from pyspark.sql import functions as FF

    seeds = FF.explode(
        FF.array(*[FF.lit(i) for i in range(_BLOOM_K)])
    ).alias("seed")
    pos = FF.pmod(
        FF.xxhash64(FF.col(key), FF.col("seed")), FF.lit(_BLOOM_M)
    )
    words = (
        dim_keys.select(FF.col(key), seeds)
        .select(
            (pos / 64).cast("long").alias("word"),
            FF.expr(
                f"shiftleft(1L, cast(pmod(xxhash64({key}, seed),"
                f" {_BLOOM_M}) % 64 as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(FF.bit_or("mask").alias("mask"))
        .collect()
    )
    full = [0] * (_BLOOM_M // 64)
    for r in words:
        full[int(r["word"])] = int(r["mask"])
    return full


# -- J6 (engine surface): bloom-runtime-filter semi-join.  The exact
#    semi-join result is UNCHANGED (false positives are removed by
#    the final equi-join; the oracle is the plain semi-join) -- the
#    bloom stage exists to drop ~all non-matching fact rows BEFORE
#    the shuffle, the same trade Spark's AQE InjectRuntimeFilter
#    makes internally.  Expressed explicitly: the 16 KiB bitmap rides
#    the plan as an array literal, the probe is 4 JVM-side
#    xxhash64+bit_get expressions inside whole-stage codegen, zero
#    extra shuffles and zero Python in the row path.
@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY 1
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join orders to BUILDING-segment customers with an
    explicit bloom pre-filter on the fact side before the exact
    (broadcast) semi-join.  Result is bit-identical to the plain
    semi-join by construction."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bitmap = F.lit(_bloom_words(dim, "c_custkey"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cond = None
    for i in range(_BLOOM_K):
        pos = F.pmod(
            F.xxhash64(F.col("o_custkey"), F.lit(i)), F.lit(_BLOOM_M)
        )
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        hit = F.bit_get(word, (pos % 64).cast("int")) == 1
        cond = hit if cond is None else (cond & hit)
    candidates = orders.filter(cond)
    exact = candidates.join(F.broadcast(dim),
                            candidates["o_custkey"] == dim["c_custkey"],
                            "left_semi")
    return (
        exact.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("revenue"),
        )
    )


# -- binned interval (range) join: for every 'error' event, count the
#    same user's follow-up activity inside a 10-minute incident
#    window [ts, ts+10min).  A naive formulation is an inequality
#    join (ts BETWEEN ...) that Spark can only run as a nested loop;
#    this plan EXPLODES each window into the 10-minute epoch bins it
#    covers (<= 2 rows) and joins on (user_id, bin) -- a pure hash
#    equi-join -- keeping the range predicate as a post-key filter.
#    A window's exploded bins are distinct, and an event's own bin
#    matches exactly one of them, so no pair-dedup is needed.  Scales:
#    shuffle keys are (user, time-bin), naturally unskewed; the bin
#    width is chosen == the window width so the blow-up factor is
#    bounded by 2.  (The oracle states the plain inequality join.)
@query(
    "join_range_binned",
    oracle="""
    WITH w AS (
        SELECT event_id AS window_id, user_id,
               ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT w.window_id,
           COUNT(e.event_id) AS n_follow,
           CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1
                         ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(COALESCE(SUM(CAST(ROUND(e.value * 100) AS BIGINT)), 0)
                AS BIGINT) AS follow_value_cents
    FROM w LEFT JOIN events e
      ON e.user_id = w.user_id
     AND e.event_type IN ('click', 'view', 'purchase')
     AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    width = 600  # seconds; == window length, bounds explode factor at 2
    sec = lambda c: c.cast("double")  # noqa: E731  epoch seconds
    w = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("w_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    w = w.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(sec(F.col("w_start")) / width),
                F.floor(sec(F.col("w_end")) / width),
            )
        ),
    )
    probe = events.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_type").alias("e_type"),
        F.col("value").alias("e_value"),
        F.floor(sec(F.col("ts")) / width).alias("e_bin"),
    )
    joined = w.join(
        probe,
        (F.col("w_user") == F.col("e_user"))
        & (F.col("bin") == F.col("e_bin"))
        & (F.col("e_ts") >= F.col("w_start"))
        & (F.col("e_ts") < F.col("w_end")),
        "left",
    )
    return joined.groupBy("window_id").agg(
        F.count("e_id").alias("n_follow"),
        F.sum(
            F.when(F.col("e_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchase"),
        F.coalesce(
            F.sum(F.round(F.col("e_value") * 100).cast("long")),
            F.lit(0),
        ).alias("follow_value_cents"),
    )


# ---------------------------------------------------------------------------
# Incremental maintenance of a JOIN view (bilinear delta rule)
# ---------------------------------------------------------------------------
# The join-view counterpart of agg_incremental_maintenance: the view
# V = orders JOIN customer (aggregated per nation) is maintained
# from base + delta partitions of BOTH sides via the bilinear
# identity  dV = dO><C0 + O0><dC + dO><dC  -- the standard IVM rule
# every streaming materialized-view engine implements.  Orders split
# on the IVM date, customers on key parity, so all four quadrants
# are non-empty.  The oracle recomputes the view from scratch; the
# differential check therefore proves the delta rule itself.  All
# sums are exact decimals.
from .aggregates import IVM_SPLIT_DATE as _IVM_DATE  # noqa: E402


@query(
    "join_incremental_maintenance",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4)))
                AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_incremental_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    o_base = orders.filter(F.col("o_orderdate") < _IVM_DATE)
    o_delta = orders.filter(F.col("o_orderdate") >= _IVM_DATE)
    c_base = customer.filter(F.col("c_custkey") % 2 == 0)
    c_delta = customer.filter(F.col("c_custkey") % 2 == 1)

    def quadrant(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(
            c, o["o_custkey"] == c["c_custkey"]
        ).select(
            "c_nationkey",
            F.col("o_totalprice").cast("decimal(30,4)").alias("p"),
        )

    # dV = dO><C0 + O0><dC + dO><dC, unioned onto the base view
    v = (
        quadrant(o_base, c_base)
        .unionByName(quadrant(o_delta, c_base))
        .unionByName(quadrant(o_base, c_delta))
        .unionByName(quadrant(o_delta, c_delta))
    )
    return (
        v.join(
            F.broadcast(nation),
            v["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("p").cast("double").alias("total_price"),
        )
    )
