#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against DuckDB running oracle_sql.json on the
same tables. Columns sorted by name; rows sorted by all columns; exact
match reported plus near-miss diagnostics for floats.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cellkey(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_fail += 1
            continue
        exp, got = canon(exp), canon(got)
        # The driver's gate hashes TYPED values: a DuckDB HUGEINT (from
        # SUM(BIGINT)) degrades to float64 in pandas and hash-mismatches
        # an int64 Spark column even when every value is equal. Catch
        # that class locally by requiring the dtype KIND to agree.
        kind_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                    for c in exp.columns if exp[c].dtype.kind != got[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch (oracle vs spark): {kind_bad}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                ax, bx = cellkey(a), cellkey(b)
                if ax != bx and not (isinstance(a, float) and isinstance(b, float)
                                     and math.isnan(a) and math.isnan(b)):
                    if not (a is None and b is None) and str(a) != str(b):
                        bad.append((c, i, a, b))
                        if len(bad) > 3:
                            break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
