"""Interleaved sf1 A/B (VERDICT r13 item 4): current doubled-edge
out_mass PageRank vs an adjacency-list substrate (join probes V rows,
explode back to 2E inside the agg stage)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.operators.graph import (
    _copurchase_und, PR_DAMPING, PR_ITERS, graph_pagerank_copurchase)
from hq_master_data_warehouse_spark.sources.loaders import load_table

spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

def adj_pagerank(spark, sf_dir):
    und = _copurchase_und(spark, sf_dir).cache()
    edges = und.select(F.col("u").alias("src"), F.col("w").alias("dst")).unionAll(
        und.select(F.col("w").alias("src"), F.col("u").alias("dst")))
    adj = edges.groupBy("src").agg(
        F.collect_list("dst").alias("dsts"),
        F.count("*").cast("double").alias("d")).cache()
    parts = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("v"))
    n = parts.count()
    teleport = (1 - PR_DAMPING) / n
    def rank_of(inflow):
        return F.lit(teleport) + PR_DAMPING * F.coalesce(inflow, F.lit(0.0))
    contrib = None
    for it in range(PR_ITERS):
        if contrib is None:
            m = F.lit(1.0 / n) / F.col("d")
            joined = adj
        else:
            m = rank_of(F.col("inflow")) / F.col("d")
            joined = adj.join(contrib, adj["src"] == contrib["nd"], "left")
        contrib = (joined.select(F.explode("dsts").alias("dst"), m.alias("m"))
                   .groupBy("dst").agg(F.sum("m").alias("inflow"))
                   .select(F.col("dst").alias("nd"), "inflow"))
    final = parts.join(contrib, parts["v"] == contrib["nd"], "left")
    return final.select(F.col("v").alias("part_id"),
                        F.round(rank_of(F.col("inflow")) * 1e6, 4).alias("rank_ppm"))

def mat(df): df.write.format("noop").mode("overwrite").save()
import bench
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
print("==", SF)
mat(graph_pagerank_copurchase(spark, SF)); mat(adj_pagerank(spark, SF))
olds, news, calibs = [], [], []
for _ in range(7):
    calibs.append(round(bench._calibration(spark), 3))
    t0 = time.perf_counter(); mat(graph_pagerank_copurchase(spark, SF)); olds.append(round(time.perf_counter()-t0,3))
    t0 = time.perf_counter(); mat(adj_pagerank(spark, SF)); news.append(round(time.perf_counter()-t0,3))
print("calib", calibs)
print("cur ", olds, "min", min(olds))
print("adj ", news, "min", min(news))
# value identity after rounding
a = {r.part_id: r.rank_ppm for r in graph_pagerank_copurchase(spark, SF).collect()}
b = {r.part_id: r.rank_ppm for r in adj_pagerank(spark, SF).collect()}
print("values equal:", a == b)
spark.stop()
