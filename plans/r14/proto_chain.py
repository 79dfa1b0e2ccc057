"""Prototype A/B: interpreted HOF cosine fold vs codegen'd explicit
chain, on a synthetic pair volume shaped like the ann_lsh verify.
Also validates bit-identical results between the two forms."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.sources.loaders import load_table
from hq_master_data_warehouse_spark.operators.similarity import cosine_expr, EMB_DIM

SF = "/root/testdata/sf0.1"
spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
n = emb.count()
print("vectors:", n)

# pair volume ~1.3M like the tfidf verify: block on vec_id % 3
a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
               (F.col("vec_id") % 3).alias("blk"))
b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
               (F.col("vec_id") % 3).alias("blk"))
pairs = a.join(b, "blk").filter(F.col("va") < F.col("vb")).cache()
print("pairs:", pairs.count())

def mat(df):
    df.write.format("noop").mode("overwrite").save()

def timeit(tag, df, reps=3):
    mat(df)  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); mat(df); ts.append(time.perf_counter() - t0)
    print(tag, [round(t, 3) for t in ts], "min", round(min(ts), 3))

# 1) current fold
fold = pairs.select("va", "vb", F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("c"))

# 2) explicit chain
def dot_chain(x, y=None):
    terms = "0.0D"
    for i in range(1, EMB_DIM + 1):
        xa = f"CAST(try_element_at({x}, {i}) AS DOUBLE)"
        ya = xa if y is None else f"CAST(try_element_at({y}, {i}) AS DOUBLE)"
        terms += f" + {xa} * {ya}"
    return f"({terms})"

chain_cos = F.expr(f"({dot_chain('ea','eb')} / (sqrt({dot_chain('ea')}) * sqrt({dot_chain('eb')})))")
chain = pairs.select("va", "vb", F.round(chain_cos, 6).alias("c"))

# 3) chain with precomputed norms
a2 = a.withColumn("na", F.expr(f"sqrt({dot_chain('ea')})"))
b2 = b.withColumn("nb", F.expr(f"sqrt({dot_chain('eb')})"))
pairs2 = a2.join(b2, "blk").filter(F.col("va") < F.col("vb"))
pre = pairs2.select("va", "vb",
    F.round(F.expr(f"({dot_chain('ea','eb')} / (na * nb))"), 6).alias("c"))

timeit("fold ", fold)
timeit("chain", chain)
timeit("pre  ", pre)

# exactness: fold vs chain vs pre must agree bit-for-bit
import hashlib
def sig(df):
    rows = df.orderBy("va", "vb").collect()
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r.va}|{r.vb}|{r.c!r};".encode())
    return len(rows), h.hexdigest()
print("fold :", sig(fold))
print("chain:", sig(chain))
print("pre  :", sig(pre))
spark.stop()
