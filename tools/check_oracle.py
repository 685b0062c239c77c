#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's t2 gate): compare Verify output
parquet against DuckDB running the oracle SQL on the same testdata.

Strict on dtype KINDS (int/float/bool/datetime/obj) per column, because the
driver's hash is: an oracle column that comes back HUGEINT->float64 while
Spark writes BIGINT hashes differently even when every value is equal
(q134/q139 round 5, q278 round 8). A kind mismatch is a FAIL here too.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--emit-kinds FILE]
  --emit-kinds FILE  also write {query: {col: kind}} from the ORACLE result
                     frames; committed as tools/oracle_kinds.json, which
                     OracleDtypeParitySpec replays against the Spark schemas
                     inside `sbt test` (no DuckDB needed JVM-side).
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind class the driver's hash is
    sensitive to. int32 vs int64 hashes the same; int vs float does not."""
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "Mm":
        return "datetime"
    return "obj"

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

def main(sf_dir, out_dir, emit_kinds=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    kinds_out = {}
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
        # Record nulls alongside the kind: pandas promotes a nullable int64
        # to float64 (and bool to object) on BOTH the oracle and the spark
        # frame whenever the values match, so the JVM parity spec must be
        # able to tell null-promotion 'float' apart from HUGEINT 'float'.
        kinds_out[name] = {
            c: {"kind": dtype_kind(expected.dtypes[c]),
                "nulls": bool(expected[c].isna().any())}
            for c in sorted(expected.columns)
        }
        ecols, erows = norm_df(expected)
        acols, arows = norm_df(actual)
        if ecols != acols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={acols}")
            n_bad += 1
            continue
        ekinds = [dtype_kind(expected.dtypes[c]) for c in ecols]
        akinds = [dtype_kind(actual.dtypes[c]) for c in acols]
        if ekinds != akinds:
            bad = [(c, e, a) for c, e, a in zip(ecols, ekinds, akinds) if e != a]
            print(f"FAIL {name}: dtype kinds differ (oracle vs spark): {bad}")
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
    if emit_kinds:
        with open(emit_kinds, "w") as f:
            json.dump(kinds_out, f, indent=1, sort_keys=True)
        print(f"wrote oracle dtype kinds for {len(kinds_out)} queries -> {emit_kinds}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    emit = None
    if "--emit-kinds" in argv:
        i = argv.index("--emit-kinds")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> [--emit-kinds FILE]")
        emit = argv[i + 1]
        del argv[i:i + 2]  # consume the flag AND its value positionally
    if len(argv) != 2:
        sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> [--emit-kinds FILE]")
    sys.exit(main(argv[0], argv[1], emit))
