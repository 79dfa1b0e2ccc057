"""Emulate the DRIVER's correctness gate more strictly than
tests/oracle.py: canonicalize both results to pandas, sort columns by
name and rows by value, then compare cell-by-cell via str() -- so an
int64 21838 vs float64 21838.0 mismatch (the DuckDB HUGEINT artifact)
is caught locally before the round gate runs.

Usage:  python -m tests.driver_check [query ...]
        (no args = every query that has an oracle)

Cross-engine hazard notes (r2 list lives in the memory workflow doc;
r3 additions):
- rounding: Spark F.round and DuckDB ROUND are half-away-from-zero,
  numpy np.round is half-to-even -- Python-side code (pandas UDFs)
  must round with sign*floor(abs*10^k + 0.5)/10^k, not np.round.
- calendar labels: Spark dayofweek is Sunday=1..7, DuckDB dayofweek()
  is Sunday=0..6 (offset Spark by -1 when the label is exposed).
- grouping keys never exposed in the output may use DIFFERENT hash
  functions per engine (xxhash64 Spark-side vs md5 in the oracle) --
  both only need injectivity on the observed values.
"""

from __future__ import annotations

import sys

import pandas as pd

from hq_master_data_warehouse_spark.registry import (
    ORACLES,
    QUERIES,
    load_catalog,
)
from tests.oracle import duckdb_conn


def _cell(v) -> str:
    if v is None or v != v:
        return "NULL"
    s = str(v)
    # date vs midnight-timestamp is a representation difference the
    # real gate tolerates (r1 evidence: events_cohort_retention green)
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_cell)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def check(spark, con, name: str, sf_dir: str) -> str:
    try:
        sdf = QUERIES[name](spark, sf_dir)
        spark_pd = sdf.toPandas()
        oracle_pd = con.execute(ORACLES[name]).fetch_df()
    except Exception as e:  # noqa: BLE001
        return f"ERROR {type(e).__name__}: {e}"
    if len(spark_pd) != len(oracle_pd):
        return f"ROWS {len(spark_pd)} vs {len(oracle_pd)}"
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        return (
            f"SCHEMA {sorted(spark_pd.columns)} vs "
            f"{sorted(oracle_pd.columns)}"
        )
    try:
        s, o = _canon(spark_pd), _canon(oracle_pd)
    except Exception as e:  # noqa: BLE001
        return f"CANON-CRASH {type(e).__name__}: {e}"
    if not s.equals(o):
        diff = (s != o).any(axis=1)
        i = diff.idxmax()
        return (
            f"HASH row {i}:\n  spark : {s.loc[i].to_dict()}\n"
            f"  oracle: {o.loc[i].to_dict()}"
        )
    return "OK"


def main() -> None:
    load_catalog()
    names = sys.argv[1:] or [n for n in QUERIES if n in ORACLES]
    sf_dir = "/root/testdata/sf0.01"

    from hq_master_data_warehouse_spark.session import get_test_spark

    spark = get_test_spark()
    con = duckdb_conn(sf_dir)
    bad = 0
    for n in names:
        if n not in ORACLES:
            # emulate the gate's ROWS-ONLY path: it still canonicalizes
            # the Spark result (r4 evidence: array-typed cells crashed
            # pandas factorize there), so run _canon and report rows
            try:
                spark_pd = QUERIES[n](spark, sf_dir).toPandas()
                _canon(spark_pd)
                print(f"{n}: ROWS-ONLY n={len(spark_pd)}")
            except Exception as e:  # noqa: BLE001
                bad += 1
                print(f"{n}: CANON-CRASH {type(e).__name__}: {e}")
            continue
        r = check(spark, con, n, sf_dir)
        if r != "OK":
            bad += 1
        print(f"{n}: {r}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
