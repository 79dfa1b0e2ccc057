"""Shared-intermediate materialization (matcache): atomicity under
concurrent builders, key sensitivity, and build-once semantics."""

from __future__ import annotations

import glob
import os
import tempfile
import threading

from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.matcache import (
    input_sig,
    materialized,
)


def _final_dirs(tag: str) -> list[str]:
    return glob.glob(
        os.path.join(tempfile.gettempdir(), f"hqmdw_mat_{tag}_*")
    )


def _clear(tag: str) -> None:
    import shutil

    for d in glob.glob(
        os.path.join(tempfile.gettempdir(), f"hqmdw_mat_{tag}_*")
    ) + glob.glob(
        os.path.join(tempfile.gettempdir(), f"hqmdw_mat_{tag}_*.tmp*")
    ):
        shutil.rmtree(d, ignore_errors=True)


def test_concurrent_builders_one_table_no_tmp_leftovers(spark):
    """N threads materializing the same key must yield exactly ONE
    complete table, identical content for every reader, and no .tmp
    siblings left behind -- the atomic-rename contract."""
    tag = "pytestcc"
    _clear(tag)
    builds = []

    def build():
        builds.append(1)
        return spark.range(100).select(
            F.col("id").alias("node"),
            (F.col("id") % 7).alias("comp"),
        )

    results = []
    errs = []

    def run():
        try:
            df = materialized(spark, tag, ["k1"], build)
            results.append(
                sorted((r.node, r.comp) for r in df.collect())
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    want = sorted((i, i % 7) for i in range(100))
    assert all(r == want for r in results)
    finals = _final_dirs(tag)
    assert len(finals) == 1
    assert not glob.glob(finals[0] + ".tmp*")
    _clear(tag)


def test_cache_hit_skips_build_and_key_change_rebuilds(spark):
    tag = "pytesthit"
    _clear(tag)
    n_builds = []

    def build():
        n_builds.append(1)
        return spark.range(10).select(F.col("id").alias("v"))

    materialized(spark, tag, ["a", 1], build)
    materialized(spark, tag, ["a", 1], build)
    assert len(n_builds) == 1  # second call read the parquet
    materialized(spark, tag, ["a", 2], build)
    assert len(n_builds) == 2  # any key part change = new table
    _clear(tag)


def test_input_sig_tracks_mtime(tmp_path):
    p = tmp_path / "t.parquet"
    p.write_bytes(b"x")
    s1 = input_sig(str(p))
    os.utime(p, ns=(1, 1))
    assert input_sig(str(p)) != s1  # regenerated fixture = new key


def test_code_sig_differs_between_builders_and_is_stable():
    """ADVICE r10: the cache key folds in the builder's SOURCE, so a
    logic edit invalidates the table without a tag bump.  Pin the
    primitive: two builders with different bodies hash differently;
    the same builder hashes identically across calls."""
    from hq_master_data_warehouse_spark.matcache import _code_sig

    def build_a():
        return 1

    def build_b():
        return 2

    assert _code_sig(build_a) != _code_sig(build_b)
    assert _code_sig(build_a) == _code_sig(build_a)


def test_failed_rename_reraises_when_no_winner(spark, monkeypatch):
    """ADVICE r10: an os.rename failure is only swallowed when a
    concurrent builder demonstrably won (the final dir exists); a
    genuine failure (EXDEV, permissions) must surface at the rename,
    not as a confusing read error on a missing path."""
    import pytest

    from hq_master_data_warehouse_spark import matcache

    tag = "pytestrename"
    _clear(tag)

    def bad_rename(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(matcache.os, "rename", bad_rename)
    with pytest.raises(OSError, match="cross-device"):
        matcache.materialized(
            spark,
            tag,
            ["x"],
            lambda: spark.range(3).select(F.col("id").alias("v")),
        )
    _clear(tag)
