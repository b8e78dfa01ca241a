#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Registers each parquet table from sfDir as a DuckDB view, runs every entry
of oracle_sql.json, and compares against the Spark result parquet:
row count, column names+types (sorted by name), and exact value equality.
"""
import sys, json, math
import duckdb

def canon(df):
    cols = sorted(df.columns)
    return df[cols]

def values_equal(a, b):
    if a is b: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1; continue
        try:
            sdf = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1; continue
        probs = []
        if list(odf.columns) != list(sdf.columns):
            probs.append(f"cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        elif len(odf) != len(sdf):
            probs.append(f"rows oracle={len(odf)} spark={len(sdf)}")
        else:
            if [str(t) for t in odf.dtypes] != [str(t) for t in sdf.dtypes]:
                probs.append(f"dtypes oracle={list(map(str,odf.dtypes))} spark={list(map(str,sdf.dtypes))}")
            ov, sv = odf.values.tolist(), sdf.values.tolist()
            bad = [(i, o, s) for i, (o, s) in enumerate(zip(ov, sv))
                   if not all(values_equal(a, b) for a, b in zip(o, s))]
            if bad:
                i, o, s_ = bad[0]
                probs.append(f"{len(bad)} value rows differ; first row {i}: oracle={o} spark={s_}")
        if probs:
            print(f"FAIL {name}: " + " | ".join(probs)); n_fail += 1
        else:
            print(f"pass {name}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
