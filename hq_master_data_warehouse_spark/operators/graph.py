"""Link-analysis over warehouse-derived graphs (engine surface).

The co-purchase graph (parts sharing an order, same derivation as
`basket_copurchase_topk`) feeds a fixed-iteration PageRank: repeated
sparse mat-vec as join + grouped sum, the canonical distributed shape
(each iteration is ONE shuffle on the edge destination; no adjacency
ever materializes on the driver).  Iterations are unrolled a constant
K deep -- exactly how the oracle expresses them as chained CTEs -- so
the whole computation is one declarative DAG Catalyst can pipeline;
edges and degrees are computed once and cached across iterations.

At 100 TB: edges shuffle-partition on dst; the per-iteration state is
one (node, rank) row per node -- orders of magnitude smaller than the
edge set -- so iterations are cheap relative to the one-time edge
derivation, and localCheckpoint truncates lineage if K grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loaders import load_table

PR_DAMPING = 0.85
PR_ITERS = 5


def _edges_sql() -> str:
    return """
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey <> b.l_partkey
    """


def _step_sql(prev: str, out: str) -> str:
    """One unrolled PageRank step as a CTE: rank mass flows along
    edges scaled by 1/out-degree, damped, with the teleport term."""
    return f"""
    {out} AS (
        SELECT p.p_partkey AS v,
               {1 - PR_DAMPING} / MAX(nn.n)
               + {PR_DAMPING} * COALESCE(
                     SUM(prev.r / deg.d), 0.0) AS r
        FROM part p
        CROSS JOIN nn
        LEFT JOIN e ON e.dst = p.p_partkey
        LEFT JOIN {prev} prev ON prev.v = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY p.p_partkey
    )
    """


def _pagerank_oracle() -> str:
    steps = ",".join(
        _step_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS)
    )
    return f"""
    WITH e AS ({_edges_sql()}),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d
            FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM part),
    r0 AS (SELECT p_partkey AS v, 1.0 / nn.n AS r
           FROM part CROSS JOIN nn),
    {steps}
    SELECT v AS part_id, ROUND(r * 1e6, 4) AS rank_ppm
    FROM r{PR_ITERS}
    """


@query("graph_pagerank_copurchase", oracle=_pagerank_oracle())
def graph_pagerank_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-{PR_ITERS}-iteration PageRank over the part co-purchase
    graph.  Ranks reported in parts-per-million (r * 1e6) rounded to 4
    so the order-dependent last-ULP of the per-node double sums (hash
    aggregation order differs between engines) sits ~1e9 below the
    rounding quantum."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst")
    )
    edges = (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .cache()
    )
    deg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("d")
    )
    # pre-partition the (big) edge side on the per-iteration join key
    # and cache it: every iteration's rank join then reuses this
    # layout and only the per-node rank table (orders of magnitude
    # smaller than the edges) moves through a shuffle per iteration.
    out_mass = (
        edges.join(deg, "src").repartition("src").cache()
    )  # src, dst, d
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("v")
    )
    n = parts.count()  # node count: a metadata-cheap scalar, as in
    # the chunk-grid sizing (table statistics at 100 TB)
    teleport = (1 - PR_DAMPING) / n
    r = parts.select("v", F.lit(1.0 / n).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            out_mass.join(r, out_mass["src"] == r["v"])
            .select("dst", (F.col("r") / F.col("d")).alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("inflow"))
        )
        r = parts.join(
            contrib, parts["v"] == contrib["dst"], "left"
        ).select(
            "v",
            (
                F.lit(teleport)
                + PR_DAMPING * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("r"),
        )
    return r.select(
        F.col("v").alias("part_id"),
        F.round(F.col("r") * 1e6, 4).alias("rank_ppm"),
    )
