"""Interleaved A/B: per-double-peel probes (r13) vs batched probes
(r14) for graph_kcore_decomposition, at sf0.1 and sf1.  Also counts
Spark jobs per construction+run via the status tracker."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.operators.graph import (
    _copurchase_pairs, KCORE_MAX, graph_kcore_decomposition)

spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

def old_kcore(spark, sf_dir):
    pairs = _copurchase_pairs(spark, sf_dir)
    edges = (pairs.select(F.col("u").alias("src"), F.col("w").alias("dst"))
             .unionByName(pairs.select(F.col("w").alias("src"), F.col("u").alias("dst")))
             .repartition("src").localCheckpoint(eager=False))
    def _peel(e, k):
        keep = (e.groupBy("src").agg(F.count("*").alias("deg"))
                .filter(F.col("deg") >= k).select("src"))
        return e.join(keep, "src").join(
            keep.withColumnRenamed("src", "dst"), "dst").select("src", "dst")
    core = edges.select(F.col("src").alias("v")).distinct().select(
        "v", F.lit(1).alias("core_number"))
    cur = edges
    n_edges = cur.count()
    for k in range(2, KCORE_MAX + 1):
        backstop = n_edges + 1
        for step in range(backstop + 1):
            assert step < backstop
            cur = _peel(_peel(cur, k), k).localCheckpoint(eager=False)
            n_new = cur.count()
            if n_new == n_edges:
                break
            n_edges = n_new
            if n_edges == 0:
                break
        if n_edges == 0:
            break
        survivors = cur.select(F.col("src").alias("kv")).distinct()
        core = (core.join(survivors, core["v"] == F.col("kv"), "left")
                .select("v", F.when(F.col("kv").isNotNull(), F.lit(k))
                        .otherwise(F.col("core_number")).alias("core_number"))
                .localCheckpoint(eager=False))
    return core.filter(F.col("core_number") >= 2).select(
        F.col("v").alias("part_id"), "core_number")

def mat(df): df.write.format("noop").mode("overwrite").save()
import bench
tracker = spark.sparkContext.statusTracker()

def run(tag, fn, sf):
    t0 = time.perf_counter()
    j0 = tracker.getJobIdsForGroup(None)
    mat(fn(spark, sf))
    dt = time.perf_counter() - t0
    return round(dt, 3)

for sf in ["/root/testdata/sf0.1", "/root/repo/.data/sf1"]:
    print("==", sf)
    mat(old_kcore(spark, sf)); mat(graph_kcore_decomposition(spark, sf))  # warm
    olds, news, calibs = [], [], []
    for _ in range(4):
        calibs.append(round(bench._calibration(spark), 3))
        olds.append(run("old", old_kcore, sf))
        news.append(run("new", graph_kcore_decomposition, sf))
    print("calib", calibs)
    print("old  ", olds, "min", min(olds))
    print("new  ", news, "min", min(news))
spark.stop()
