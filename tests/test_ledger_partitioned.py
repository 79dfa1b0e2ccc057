"""Partition-pruned physical mutations (S7/S8 scale path).

The raw-parquet update/delete helpers must rewrite ONLY the partitions
containing the touched keys -- at 100 TB a single-key config mutation
(webhooks/route.ts:58-85) touches one partition directory, not the
snapshot.  The tests pin that guarantee at the byte level: every file
in an untouched partition is name- and content-identical after the
mutation.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from hq_master_data_warehouse_spark.operators.ledger import (
    partitioned_delete_by_key,
    partitioned_update_by_key,
)
from hq_master_data_warehouse_spark.sources.loaders import load_table

from tests.conftest import SF_DIR_001


def _snapshot(root: str) -> dict[str, str]:
    """relative path -> md5 for every data file under root."""
    out = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if name.startswith((".", "_")):
                continue
            full = os.path.join(dirpath, name)
            with open(full, "rb") as f:
                digest = hashlib.md5(f.read()).hexdigest()
            out[os.path.relpath(full, root)] = digest
    return out


@pytest.fixture()
def nation_table(spark, tmp_path):
    """nation partitioned by n_regionkey -- 5 partition directories."""
    path = str(tmp_path / "nation_part")
    load_table(spark, SF_DIR_001, "nation").write.partitionBy(
        "n_regionkey"
    ).parquet(path)
    return path


def _region_of(spark, path: str, nationkey: int) -> int:
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .filter(F.col("n_nationkey") == nationkey)
        .select("n_regionkey")
        .head()[0]
    )


def test_update_rewrites_only_touched_partition(spark, nation_table):
    before = _snapshot(nation_table)
    region = _region_of(spark, nation_table, 7)
    touched = partitioned_update_by_key(
        spark,
        nation_table,
        part_col="n_regionkey",
        key_col="n_nationkey",
        key_value=7,
        updates={"n_name": "RENAMED_NATION"},
    )
    assert touched == [region]
    after = _snapshot(nation_table)
    prefix = f"n_regionkey={region}"
    untouched_before = {
        p: h for p, h in before.items() if not p.startswith(prefix)
    }
    untouched_after = {
        p: h for p, h in after.items() if not p.startswith(prefix)
    }
    # untouched partitions: identical file names AND identical bytes
    assert untouched_after == untouched_before
    # the mutation itself landed
    df = spark.read.parquet(nation_table)
    renamed = df.filter(df.n_nationkey == 7).select("n_name").head()[0]
    assert renamed == "RENAMED_NATION"
    assert df.count() == 25


def test_delete_rewrites_only_touched_partition(spark, nation_table):
    before = _snapshot(nation_table)
    region = _region_of(spark, nation_table, 7)
    touched = partitioned_delete_by_key(
        spark,
        nation_table,
        part_col="n_regionkey",
        key_col="n_nationkey",
        key_value=7,
    )
    assert touched == [region]
    after = _snapshot(nation_table)
    prefix = f"n_regionkey={region}"
    assert {
        p: h for p, h in after.items() if not p.startswith(prefix)
    } == {p: h for p, h in before.items() if not p.startswith(prefix)}
    df = spark.read.parquet(nation_table)
    assert df.count() == 24
    assert df.filter(df.n_nationkey == 7).count() == 0


def test_update_missing_key_touches_nothing(spark, nation_table):
    before = _snapshot(nation_table)
    touched = partitioned_update_by_key(
        spark,
        nation_table,
        part_col="n_regionkey",
        key_col="n_nationkey",
        key_value=9999,
        updates={"n_name": "NOPE"},
    )
    assert touched == []
    assert _snapshot(nation_table) == before


def test_update_rejects_partition_column_mutation(spark, nation_table):
    """Updating the partition column would strand the rewritten row in
    a tmp leaf the swap never moves -- the helper must refuse instead
    of silently dropping the row."""
    before = _snapshot(nation_table)
    with pytest.raises(ValueError, match="partition column"):
        partitioned_update_by_key(
            spark,
            nation_table,
            part_col="n_regionkey",
            key_col="n_nationkey",
            key_value=7,
            updates={"n_regionkey": 4},
        )
    # table untouched after the refusal
    assert _snapshot(nation_table) == before


def test_swap_rejects_stray_partition_leaves(spark, nation_table):
    """Defense-in-depth below the public API: a transform that moves
    rows across partitions produces tmp leaves outside the touched set,
    and _swap_partitions must reject the rewrite (and clean up tmp)
    rather than discard or clobber rows."""
    from pyspark.sql import functions as F

    from hq_master_data_warehouse_spark.operators.ledger import (
        _rewrite_touched_partitions,
    )

    before = _snapshot(nation_table)
    with pytest.raises(ValueError, match="untouched partitions"):
        _rewrite_touched_partitions(
            spark,
            nation_table,
            part_col="n_regionkey",
            transform=lambda sub: sub.withColumn(
                "n_regionkey", F.lit(99)
            ),
            touched_pred=F.col("n_nationkey") == 7,
        )
    assert _snapshot(nation_table) == before
    assert not os.path.isdir(nation_table.rstrip("/") + ".tmp")


def test_delete_can_empty_a_partition(spark, tmp_path):
    """Deleting the only key in a partition removes the directory."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "single")
    load_table(spark, SF_DIR_001, "nation").filter(
        F.col("n_regionkey").isin(0, 1)
    ).filter(
        (F.col("n_regionkey") == 1) | (F.col("n_nationkey") % 5 == 0)
    ).write.partitionBy("n_regionkey").parquet(path)
    lone = (
        spark.read.parquet(path)
        .filter(F.col("n_regionkey") == 0)
        .select("n_nationkey")
        .collect()
    )
    # delete every key in partition 0, one by one
    for row in lone:
        partitioned_delete_by_key(
            spark,
            path,
            part_col="n_regionkey",
            key_col="n_nationkey",
            key_value=row[0],
        )
    df = spark.read.parquet(path)
    assert df.filter(F.col("n_regionkey") == 0).count() == 0
    assert not os.path.isdir(os.path.join(path, "n_regionkey=0"))
