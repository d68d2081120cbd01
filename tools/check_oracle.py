#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
named after the tables in <sfDir>, and compares rows/schema/values
(column-name-sorted, rounded-insensitive exact compare).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver's t2 gate: sort columns by name, sort rows by all
    # columns, and compare values WITH dtype (the driver hashes per-column
    # including dtype — a HUGEINT->float64 vs int64 difference must fail
    # here exactly like it fails there).
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # local iteration: check a comma-separated subset only
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(duckdb.connect().execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"[FAIL-read ] {name}: {e}")
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[FAIL-sql  ] {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL-cols ] {name}: got {list(got.columns)} want {list(want.columns)}")
            continue
        if len(got) != len(want):
            print(f"[FAIL-rows ] {name}: got {len(got)} want {len(want)}")
            continue
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            print(f"[FAIL-dtype] {name}: {dt_bad}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
        except AssertionError as e:
            print(f"[FAIL-vals ] {name}: {str(e).splitlines()[-1] if str(e) else e}")
            # show first diff
            for c in got.columns:
                neq = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"    col={c} row={i}: got={got[c][i]!r} want={want[c][i]!r}")
                    break
            continue
        n_ok += 1
        print(f"[OK        ] {name} ({len(got)} rows)")
    print(f"== {n_ok}/{len(oracle)} oracle-matched ==")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else ""))
