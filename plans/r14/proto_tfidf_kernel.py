"""Prototype: tfidf pairwise verify -- current map_zip_with HOF vs an
Arrow mapInArrow sparse-intersection kernel (dictionary-encode +
searchsorted).  Integer dot must be exact; compare full outputs."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hq_master_data_warehouse_spark.session import get_spark
from hq_master_data_warehouse_spark.sources.loaders import load_table
from hq_master_data_warehouse_spark.operators import dedup as D

SF = "/root/testdata/sf0.1"
spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

# --- replicate the query up to `paired`, but with entry ARRAYS too
docs = load_table(spark, SF, "documents").repartition(32, "doc_id")
rows = D._shingle_rows(spark, SF).cache()
cand = (
    rows.select(F.col("doc_id").alias("doc_a"), "sh")
    .join(rows.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
    .filter(F.col("doc_a") < F.col("doc_b"))
    .select("doc_a", "doc_b")
)
toks = docs.select("doc_id", F.explode(F.split(D.canonical_text(F.col("text")), " ")).alias("tok"))
tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("long").alias("tf"))
dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").cast("long").alias("dfc"))
nn = docs.agg(F.count("*").cast("long").alias("n_docs"))
wq_all = (
    tf.join(dfreq, "tok").crossJoin(F.broadcast(nn))
    .filter(F.col("dfc") < F.col("n_docs"))
    .select("doc_id", "tok",
            F.floor(1000000 * F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfc"))).cast("long").alias("w"))
)
keep = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("tok").asc())
wq = wq_all.withColumn("rnk", F.row_number().over(keep)).filter(F.col("rnk") <= D.TFIDF_TOP_TERMS).drop("rnk")
vecs = wq.groupBy("doc_id").agg(
    F.map_from_entries(F.collect_list(F.struct("tok", "w"))).alias("vec"),
    F.collect_list("tok").alias("ks"),
    F.collect_list("w").alias("ws"),
    F.sum(F.col("w").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)")).cast("decimal(38,0)").alias("nrm2"),
    F.max("w").alias("wmax"),
).cache()
va = vecs.select(F.col("doc_id").alias("doc_a"), F.col("vec").alias("vec_a"), F.col("ks").alias("ka"),
                 F.col("ws").alias("wa"), F.col("nrm2").alias("na2"), F.col("wmax").alias("wmax_a"))
vb = vecs.select(F.col("doc_id").alias("doc_b"), F.col("vec").alias("vec_b"), F.col("ks").alias("kb"),
                 F.col("ws").alias("wb"), F.col("nrm2").alias("nb2"), F.col("wmax").alias("wmax_b"))
paired = cand.join(va, "doc_a").join(vb, "doc_b")

safe = (F.col("wmax_a").cast("double") * F.col("wmax_b").cast("double") * float(D.TFIDF_TOP_TERMS)) < 4.0e18

# --- current expression path (fold over map_zip_with)
zipped = paired.withColumn("zc", F.expr(
    "map_values(map_zip_with(vec_a, vec_b, (k, x, y) -> IF(x IS NOT NULL AND y IS NOT NULL, 1L, CAST(NULL AS BIGINT))))"))
dot_long = F.expr(
    "aggregate(map_values(map_zip_with(vec_a, vec_b, (k, x, y) -> IF(x IS NOT NULL AND y IS NOT NULL, x * y, CAST(NULL AS BIGINT)))), 0L, (acc, v) -> acc + coalesce(v, 0L))")
dot_dec = F.expr(
    "aggregate(map_values(map_zip_with(vec_a, vec_b, (k, x, y) -> IF(x IS NOT NULL AND y IS NOT NULL, CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)), CAST(NULL AS DECIMAL(38,0))))), CAST(0 AS DECIMAL(38,0)), (acc, v) -> CAST(acc + coalesce(v, CAST(0 AS DECIMAL(38,0))) AS DECIMAL(38,0)))")
dot = F.when(safe, dot_long.cast("decimal(38,0)")).otherwise(dot_dec)
shared = F.expr("aggregate(zc, 0L, (acc, v) -> acc + IF(v IS NULL, 0L, 1L))")
cos = F.col("dot").cast("double") / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double"))
cur = (zipped.select("doc_a", "doc_b", dot.alias("dot"), shared.alias("n_shared_terms"), "na2", "nb2")
       .filter(cos >= D.TFIDF_COSINE_THRESHOLD)
       .select("doc_a", "doc_b", "n_shared_terms", F.round(cos, 6).alias("cosine"))
       .distinct())

# --- kernel path
kin = paired.select("doc_a", "doc_b", "ka", "wa", "kb", "wb",
                    F.col("na2").cast("double").alias("na2d"),
                    F.col("nb2").cast("double").alias("nb2d"),
                    safe.alias("safe"))

def kern(it):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    out_t = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                       ("n_shared_terms", pa.int64()), ("dot_str", pa.string()),
                       ("na2d", pa.float64()), ("nb2d", pa.float64())])
    for batch in it:
        n = batch.num_rows
        if n == 0:
            yield pa.RecordBatch.from_pylist([], schema=out_t)
            continue
        ka = batch.column("ka"); kb = batch.column("kb")
        wa = batch.column("wa"); wb = batch.column("wb")
        la = np.diff(ka.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        lb = np.diff(kb.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        ra = np.repeat(np.arange(n, dtype=np.int64), la)
        rb = np.repeat(np.arange(n, dtype=np.int64), lb)
        fa = ka.flatten(); fb = kb.flatten()
        both = pa.chunked_array([fa, fb]).dictionary_encode()
        codes = both.combine_chunks().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ca = codes[:len(fa)]; cb = codes[len(fa):]
        V = np.int64(len(both.chunk(0).dictionary) if both.num_chunks else 0) + 1
        key_a = ra * V + ca
        key_b = rb * V + cb
        order = np.argsort(key_a)
        ks = key_a[order]
        pos = np.searchsorted(ks, key_b)
        pos_c = np.minimum(pos, len(ks) - 1) if len(ks) else pos
        hit = np.zeros(len(key_b), dtype=bool) if not len(ks) else (ks[pos_c] == key_b)
        wa_f = wa.flatten().to_numpy(zero_copy_only=False).astype(np.int64)[order]
        wb_f = wb.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        rows_m = rb[hit]
        pa_w = wa_f[pos_c[hit]]
        pb_w = wb_f[hit]
        n_shared = np.bincount(rows_m, minlength=n).astype(np.int64)
        safe_arr = batch.column("safe").to_numpy(zero_copy_only=False)
        prod = pa_w * pb_w
        dot_acc = np.zeros(n, dtype=np.int64)
        np.add.at(dot_acc, rows_m, prod)
        dots = dot_acc.astype(object)
        unsafe_rows = np.nonzero(~safe_arr)[0]
        if len(unsafe_rows):
            u = set(unsafe_rows.tolist())
            acc = {r: 0 for r in u}
            for r, x, y in zip(rows_m.tolist(), pa_w.tolist(), pb_w.tolist()):
                if r in u:
                    acc[r] += int(x) * int(y)
            for r in u:
                dots[r] = acc[r]
        dot_str = pa.array([str(int(v)) for v in dots], type=pa.string())
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_a"), batch.column("doc_b"),
             pa.array(n_shared), dot_str,
             batch.column("na2d"), batch.column("nb2d")], schema=out_t)

kout = kin.mapInArrow(kern, "doc_a long, doc_b long, n_shared_terms long, dot_str string, na2d double, nb2d double")
kdot = F.col("dot_str").cast("decimal(38,0)")
kcos = kdot.cast("double") / F.sqrt(F.col("na2d") * F.col("nb2d"))
knew = (kout.filter(kcos >= D.TFIDF_COSINE_THRESHOLD)
        .select("doc_a", "doc_b", "n_shared_terms", F.round(kcos, 6).alias("cosine"))
        .distinct())

def mat(df): df.write.format("noop").mode("overwrite").save()
def timeit(tag, df, reps=3):
    mat(df)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); mat(df); ts.append(time.perf_counter() - t0)
    print(tag, [round(t,3) for t in ts], "min", round(min(ts),3))

timeit("current", cur)
timeit("kernel ", knew)

import hashlib
def sig(df):
    rows = df.orderBy("doc_a", "doc_b").collect()
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r.doc_a}|{r.doc_b}|{r.n_shared_terms}|{r.cosine!r};".encode())
    return len(rows), h.hexdigest()
print("current:", sig(cur))
print("kernel :", sig(knew))
spark.stop()
