"""Vanilla-session correctness probe (VERDICT r5 item 2).

The driver builds its OWN SparkSession -- no AQE/UTC/shuffle/codegen
overrides from ``session.py`` -- so engine correctness must not depend
on those settings.  Round 6 ran the full 250-oracle sweep once under a
driver-shaped vanilla session (logged in ROUNDLOG.md); this test keeps
that property continuously checked by running a ROTATING subset of
oracles in a subprocess whose SparkSession sets nothing but master and
shuffle partitions.

Rotation: the subset is the N names with the smallest
sha256(HEAD_sha + name), so it is deterministic at any given commit
but covers different queries every commit -- over the life of a round
the whole registry cycles through.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROBE = 8

_PROBE_SCRIPT = r"""
import sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
from hq_master_data_warehouse_spark import registry
from tests.oracle import compare, duckdb_conn

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
registry.load_catalog()
con = duckdb_conn({sf!r})
failed = []
for name in {names!r}:
    try:
        compare(registry.QUERIES[name](spark, {sf!r}), con, registry.ORACLES[name])
    except Exception as e:  # noqa: BLE001
        failed.append((name, repr(e)[:500]))
print("VANILLA_FAILED:", failed)
"""


def _head_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or "no-head"
    except Exception:  # noqa: BLE001
        return "no-head"


def rotating_subset(n: int = N_PROBE) -> list[str]:
    from hq_master_data_warehouse_spark import registry

    registry.load_catalog()
    head = _head_sha()
    return sorted(
        registry.ORACLES,
        key=lambda name: hashlib.sha256(
            (head + name).encode()
        ).hexdigest(),
    )[:n]


def test_rotating_oracle_subset_passes_in_vanilla_session():
    names = rotating_subset()
    assert len(names) == N_PROBE
    script = _PROBE_SCRIPT.format(
        root=ROOT, sf="/root/testdata/sf0.001", names=names
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    marker = [
        ln
        for ln in proc.stdout.splitlines()
        if ln.startswith("VANILLA_FAILED:")
    ]
    assert marker, proc.stdout[-2000:]
    assert marker[-1] == "VANILLA_FAILED: []", marker[-1]
