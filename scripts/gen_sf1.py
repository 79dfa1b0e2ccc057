#!/usr/bin/env python
"""Derive an sf1-equivalent dataset (10x sf0.1) for the scale bench.

The driver ships sf{0.001,0.01,0.1}; scale-degradation evidence
(VERDICT r5 item 3) needs one decade more.  This replicates the
DRIVER'S sf0.1 parquet 10x with referential-integrity-preserving key
shifts -- every foreign key is offset by the same replica stride as
its primary key, so join fanouts, group cardinalities per key, and
value distributions match a true sf1 (TPC-H scales all non-dimension
tables linearly).  Dimension tables (region, nation) keep their fixed
cardinality, as in TPC-H.

Caveat recorded in BENCH_SF1.md: text/embedding REPLICAS are exact
duplicates of each other, so cross-document similarity ops
(minhash/contamination) would see an artificial quadratic pair
blowup -- those are excluded from the sf1 list, not because the
engine can't run them but because replicated data measures the
artifact, not the operator.

Output: $SPARK_GRAFT_SF1_DIR (default /root/repo/.data/sf1), one
parquet dir per table.  Idempotent: skips tables already generated.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")
REPLICAS = 10

#: Fixture LAYOUT version, persisted as a marker file in OUT.  The
#: idempotent per-table skip used to gate layout fixes too: an sf1
#: generated before the r11 multi-file fix silently kept its
#: one-file/one-row-group tables -- the exact straggler artifact the
#: fix targets -- because every table "exists" (ADVICE r11).  Bump
#: this whenever the WRITTEN LAYOUT changes (not the data): a stale
#: or missing marker wipes OUT and regenerates everything.
#: v2 = 32-file keyed parquet per table (r11).
LAYOUT_VERSION = 2
_MARKER = ".layout_version"


def _ensure_layout(out_dir: str) -> None:
    marker = os.path.join(out_dir, _MARKER)
    have = None
    try:
        with open(marker) as f:
            have = int(f.read().strip())
    except (OSError, ValueError):
        pass
    if have != LAYOUT_VERSION and os.path.isdir(out_dir):
        import shutil

        print(
            f"sf1 fixture layout v{have} != v{LAYOUT_VERSION}: "
            f"wiping {out_dir} and regenerating"
        )
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # ADVICE r12: do NOT stamp the marker here.  Stamping before
    # generation meant a crash mid-run left a CURRENT marker over a
    # partial fixture; the next run skipped the wipe and the per-table
    # os.path.exists skip silently kept partial/corrupt table dirs --
    # the same silent-staleness class the marker exists to close.  The
    # marker is written by _stamp_layout() at the END of main, only
    # after every table generated; an interrupted run leaves a missing/
    # stale marker and forces a clean wipe on rerun.
    try:
        os.remove(marker)
    except OSError:
        pass


def _stamp_layout(out_dir: str) -> None:
    """Write the layout marker -- call ONLY after all tables exist."""
    with open(os.path.join(out_dir, _MARKER), "w") as f:
        f.write(str(LAYOUT_VERSION))

#: per-table key columns and the stride source table for each.
#: stride = 10^ceil(log10(max_key+1)) of the SOURCE table's own key
#: domain, so shifted keys never collide across replicas and foreign
#: keys stay aligned with the primary keys they reference.
KEY_COLS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_TABLES = ["region", "nation"]


def _strides(spark: SparkSession) -> dict[str, int]:
    out = {}
    for t in ("customer", "supplier", "part", "orders", "events",
              "documents", "embeddings"):
        key = {
            "customer": "c_custkey",
            "supplier": "s_suppkey",
            "part": "p_partkey",
            "orders": "o_orderkey",
            "events": "event_id",
            "documents": "doc_id",
            "embeddings": "vec_id",
        }[t]
        mx = (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .agg(F.max(key))
            .collect()[0][0]
        )
        stride = 10 ** len(str(int(mx)))
        out[t] = stride
    return out


def _replicate(
    df: DataFrame, keys: dict[str, str], strides: dict[str, int]
) -> DataFrame:
    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(REPLICAS).select(
                F.col("id").cast("int").alias("__r")
            )
        )
    )
    for col, src_table in keys.items():
        rep = rep.withColumn(
            col,
            (
                F.col(col).cast("long")
                + F.col("__r").cast("long") * strides[src_table]
            ),
        )
    return rep.drop("__r")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("gen-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_layout(OUT)
    strides = _strides(spark)
    print("strides:", strides)

    for t in COPY_TABLES:
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(dst)
        print(t, "copied")

    for t, keys in KEY_COLS.items():
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            print(t, "exists, skipping")
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        # Write a MULTI-FILE layout (hash on the table's own key):
        # the replicate is narrow, so without this the whole table
        # lands in ONE file with ONE row group -- and parquet only
        # parallelizes at row-group boundaries, so every sf1 scan
        # ran 20 empty splits plus one straggler reading everything
        # (caught r11: each 21-split lineitem stage sat at (20+1)/21).
        # A real sf1 export is many files; 32 matches local[32].
        first_key = next(iter(keys))
        _replicate(df, keys, strides).repartition(
            32, first_key
        ).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(t, "replicated ->", n, "rows")
    _stamp_layout(OUT)
    spark.stop()


if __name__ == "__main__":
    main()
