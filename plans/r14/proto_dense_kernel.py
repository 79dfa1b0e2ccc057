"""Prototype: dense-pair cosine via mapInArrow NumPy kernel vs the
interpreted HOF fold.  Must be bit-identical (left-assoc IEEE chain)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.sources.loaders import load_table
from hq_master_data_warehouse_spark.operators.similarity import cosine_expr, EMB_DIM

SF = "/root/testdata/sf0.1"
spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
               (F.col("vec_id") % 3).alias("blk"))
b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
               (F.col("vec_id") % 3).alias("blk"))
pairs = a.join(b, "blk").filter(F.col("va") < F.col("vb")) \
    .select("va", "vb", "ea", "eb").repartition(32).cache()
print("pairs:", pairs.count())

def mat(df): df.write.format("noop").mode("overwrite").save()
def timeit(tag, df, reps=3):
    mat(df)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); mat(df); ts.append(time.perf_counter() - t0)
    print(tag, [round(t,3) for t in ts], "min", round(min(ts),3))

fold = pairs.select("va", "vb", F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("c"))

DIM = EMB_DIM
def kern(it):
    import numpy as np
    import pyarrow as pa
    for batch in it:
        n = batch.num_rows
        va = batch.column("va")
        vb = batch.column("vb")
        if n == 0:
            yield pa.RecordBatch.from_arrays(
                [va, vb, pa.array([], type=pa.float64())],
                names=["va", "vb", "c"])
            continue
        ea = batch.column("ea")
        eb = batch.column("eb")
        A = np.asarray(ea.flatten(), dtype=np.float64).reshape(n, DIM)
        B = np.asarray(eb.flatten(), dtype=np.float64).reshape(n, DIM)
        # bit-identical left-associative chains (no pairwise summation)
        dot = np.zeros(n); na = np.zeros(n); nb = np.zeros(n)
        for i in range(DIM):
            x = A[:, i]; y = B[:, i]
            dot += x * y
            na += x * x
            nb += y * y
        c = dot / (np.sqrt(na) * np.sqrt(nb))
        yield pa.RecordBatch.from_arrays([va, vb, pa.array(c)],
                                         names=["va", "vb", "c"])

kdf = pairs.mapInArrow(kern, "va long, vb long, c double").select(
    "va", "vb", F.round(F.col("c"), 6).alias("c"))

timeit("fold  ", fold)
timeit("kernel", kdf)

import hashlib
def sig(df):
    rows = df.orderBy("va", "vb").collect()
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r.va}|{r.vb}|{r.c!r};".encode())
    return len(rows), h.hexdigest()
print("fold  :", sig(fold))
print("kernel:", sig(kdf))
spark.stop()
