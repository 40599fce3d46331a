#!/usr/bin/env python3
"""Local pre-verification: replay SparkEntry.oracleSql through DuckDB and
compare against graft.Verify parquet dumps, mimicking the driver's
sort-columns-by-name / sort-rows / hash-values compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable strings
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if np.isinf(v):
                return "inf" if v > 0 else "-inf"
            return f"{v:.6f}"
        if isinstance(v, (np.floating,)):
            return f"{float(v):.6f}"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main():
    vdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(vdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(vdir)):
        d = os.path.join(vdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERR: {str(e)[:120]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA: spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWS: spark={len(a)} duck={len(b)}"
        elif not a.equals(b):
            diff = (a != b)
            ncell = int(diff.values.sum())
            # show first differing row
            ridx = diff.any(axis=1).idxmax()
            results[name] = (f"VALUES: {ncell} cells differ; row {ridx}: "
                             f"spark={a.loc[ridx].to_dict()} duck={b.loc[ridx].to_dict()}")
        else:
            results[name] = "OK"
    bad = {k: v for k, v in results.items() if v != "OK" and not v.startswith("ROWS_ONLY")}
    for k in sorted(results):
        print(f"{results[k][:400]:<40} {k}" if len(results[k]) <= 40
              else f"{k}\n    {results[k][:400]}")
    print(f"\n== {sum(1 for v in results.values() if v=='OK')} OK, "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only, "
          f"{len(bad)} BAD of {len(results)}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
