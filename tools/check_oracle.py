#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's t2 gate): compare Verify output
parquet against DuckDB running the oracle SQL on the same testdata.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
        return norm_cell(v)
    return v

def norm_df(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm_cell(x) for x in t))
    return list(df.columns), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output: {e}")
            n_bad += 1
            continue
        ecols, erows = norm_df(expected)
        acols, arows = norm_df(actual)
        if ecols != acols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={acols}")
            n_bad += 1
            continue
        if erows != arows:
            n_bad += 1
            print(f"FAIL {name}: rows differ (oracle {len(erows)} vs spark {len(arows)})")
            for i, (e, a) in enumerate(zip(erows, arows)):
                if e != a:
                    print(f"  first diff at row {i}:\n    oracle: {e}\n    spark : {a}")
                    break
            else:
                if len(erows) != len(arows):
                    print(f"  length mismatch only; oracle head: {erows[:2]} spark head: {arows[:2]}")
            continue
        n_ok += 1
        print(f"OK   {name} ({len(arows)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
