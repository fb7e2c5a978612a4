#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's check.

Usage: python3 tools/check_oracles.py <verifyOutDir> <sfDir>

Reads each <verifyOutDir>/<query>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares: column names (sorted), row counts, and values
(rows sorted by all columns). Exact comparison; floats also get a
max-abs-diff report so near-misses are diagnosable.

Driver-side tooling only (duckdb/pandas are not engine dependencies).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def dtype_family(dtype) -> str:
    """Normalized dtype family — the driver's hash is type-sensitive, so a
    value-identical result with an int column where the oracle yields a
    float (e.g. DuckDB SUM(BIGINT) → HUGEINT → float64) must FAIL here the
    way it fails at the driver."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "other"


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir, name)
        if not res_dir.is_dir():
            print(f"FAIL {name}: no Spark result dir (query threw?)")
            failures += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        dtype_mismatch = [
            (c, got[c].dtype, want[c].dtype) for c in got.columns
            if dtype_family(got[c].dtype) != dtype_family(want[c].dtype)]
        if dtype_mismatch:
            for c, g, w in dtype_mismatch:
                print(f"FAIL {name}: dtype family of {c}: spark {g} vs oracle {w}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name}: {len(got)} rows")
        except AssertionError as e:
            failures += 1
            msg = str(e).splitlines()[0]
            print(f"FAIL {name}: {msg}")
            for c in got.columns:
                if pd.api.types.is_float_dtype(got[c]):
                    d = (got[c] - want[c]).abs().max()
                    if d and d > 0:
                        print(f"     float col {c}: max abs diff {d}")
                elif not got[c].equals(want[c]):
                    neq = got[c] != want[c]
                    i = neq[neq].index[0] if neq.any() else None
                    if i is not None:
                        print(f"     col {c} first diff @{i}: "
                              f"{got[c][i]!r} != {want[c][i]!r}")
    extra = [d.name for d in Path(out_dir).iterdir()
             if d.is_dir() and d.name not in oracle]
    if extra:
        print(f"note: results without oracle (rows-only check): {sorted(extra)}")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
