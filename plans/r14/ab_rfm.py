"""Interleaved A/B: r13 three-branch orders_rfm vs r14 melted single-pass."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.sources.loaders import load_table
from hq_master_data_warehouse_spark.operators.analytics import (
    _global_rank, _grouped_global_rank, _ntile_from_rank, orders_rfm_scores)
from hq_master_data_warehouse_spark.functions.scalars import dec_sum

SF = "/root/testdata/sf0.1"
spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

def old_rfm(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "spend")).cache())
    n_rows = F.col("_n")
    total = per_cust.agg(F.count("*").alias("_n"))
    r_rank = _global_rank(per_cust, F.date_trunc("month", F.col("last_order")),
                          [F.col("last_order").desc(), F.col("o_custkey")], "_r_rn",
                          bucket_desc=True).select("o_custkey", "_r_rn")
    f_rank = _global_rank(per_cust, F.col("n_orders"),
                          [F.col("n_orders").desc(), F.col("o_custkey")], "_f_rn",
                          bucket_desc=True).select("o_custkey", "_f_rn")
    m_rank = _global_rank(per_cust, F.floor(F.col("spend") / 50000.0),
                          [F.col("spend").desc(), F.col("o_custkey")], "_m_rn",
                          bucket_desc=True).select("o_custkey", "_m_rn")
    ranked = (per_cust.join(r_rank, "o_custkey").join(f_rank, "o_custkey")
              .join(m_rank, "o_custkey"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "o_custkey", "last_order", "n_orders", "spend",
        _ntile_from_rank(F.col("_r_rn"), n_rows, 4).alias("r_quartile"),
        _ntile_from_rank(F.col("_f_rn"), n_rows, 4).alias("f_quartile"),
        _ntile_from_rank(F.col("_m_rn"), n_rows, 4).alias("m_quartile"))

def mat(df): df.write.format("noop").mode("overwrite").save()
import bench
bench._calibration(spark)
mat(old_rfm(spark, SF)); mat(orders_rfm_scores(spark, SF))  # warm
olds, news, calibs = [], [], []
for _ in range(5):
    calibs.append(round(bench._calibration(spark), 3))
    t0 = time.perf_counter(); mat(old_rfm(spark, SF)); olds.append(round(time.perf_counter()-t0, 3))
    t0 = time.perf_counter(); mat(orders_rfm_scores(spark, SF)); news.append(round(time.perf_counter()-t0, 3))
print("calib", calibs)
print("old  ", olds, "min", min(olds))
print("new  ", news, "min", min(news))
spark.stop()
