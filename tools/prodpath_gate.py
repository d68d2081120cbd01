#!/usr/bin/env python3
"""Production-fold-path gate artifact (VERDICT r9 item 3): compare a
`SPARK_GRAFT_FOLDS=prod` Verify dump against the SAME DuckDB oracles
(check_oracle.py's canon/compare rules) and write the per-round
PRODPATH_CORRECTNESS_r<N>.json the repo commits as evidence.

Usage: python3 tools/prodpath_gate.py <sfDir> <outDir> <artifact.json>
where <outDir> was produced by
  SPARK_GRAFT_FOLDS=prod sbt "runMain graft.Verify <sfDir> <outDir>"
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, artifact: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    keys = {}
    for name, sql in sorted(oracle.items()):
        res = {"mode": "production (spark.graft.bitwiseFolds=false)",
               "rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "err": None}
        try:
            got = canon(duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
            res["spark_rows"] = int(len(got))
            want = canon(con.execute(sql).fetchdf())
            res["rows_match"] = len(got) == len(want)
            res["schema_match"] = (list(got.columns) == list(want.columns) and
                all(str(got[c].dtype) == str(want[c].dtype) for c in got.columns))
            if res["rows_match"] and res["schema_match"]:
                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                                  check_exact=True)
                    res["hash_match"] = True
                except AssertionError:
                    pass
        except Exception as e:  # noqa: BLE001 — the artifact records the error
            res["err"] = (str(e).splitlines() or [""])[0][:200]
        keys[name] = res
        ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
        print(f"[{'OK  ' if ok else 'FAIL'}] {name} ({res['spark_rows']} rows)")
    n_pass = sum(1 for r in keys.values()
                 if r["rows_match"] and r["schema_match"] and r["hash_match"])
    out = {"keys": keys, "n_keys": len(keys), "n_pass": n_pass,
           "note": "production fold path (rangeRank/plain sums) vs the SAME DuckDB oracles",
           "sf": sf_dir}
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"== {n_pass}/{len(keys)} prod twins oracle-matched -> {artifact} ==")
    return 0 if n_pass == len(keys) else 1


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(f"usage: {sys.argv[0]} <sfDir> <outDir> <artifact.json>")
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
