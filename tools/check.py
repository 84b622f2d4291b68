#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB over the sfDir
parquet tables, loads the Spark result parquet from outDir/<name>/, sorts
columns by name, and compares row count, schema shape, and a value hash
(stringified, floats pre-rounded by the queries themselves).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    # distinct tokens: a Spark NaN (e.g. 0/0) must NOT compare equal to an
    # oracle NULL — that would hide a real semantic divergence (ADVICE r01)
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float):
        # queries round to 4dp already; normalize -0.0 and int-valued floats
        if v == 0:
            v = 0.0
        return f"{v:.4f}"
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        try:
            return "[" + ",".join(norm_cell(x) for x in (v.tolist() if hasattr(v, "tolist") else v)) + "]"
        except Exception:
            return str(v)
    return str(v)

def frame_sig(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append("|".join(norm_cell(v) for v in t))
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    dirs = set(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    # union(oracle keys, output dirs): a query that crashed before Spark
    # created its output dir must FAIL, not silently vanish (ADVICE r01)
    names = sorted(dirs | set(oracle))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_sig, d_sig = frame_sig(spark_df), frame_sig(duck_df)
        sd = {c: str(spark_df[c].dtype) for c in spark_df.columns}
        dd = {c: str(duck_df[c].dtype) for c in duck_df.columns}
        dt = [f"{c}: spark={sd[c]} duck={dd[c]}" for c in sd if c in dd and sd[c] != dd[c]]
        if dt:
            print(f"WARN {name}: dtype mismatch {dt}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_fail += 1
        elif len(s_sig) != len(d_sig):
            print(f"FAIL {name}: rows spark={len(s_sig)} duck={len(d_sig)}")
            n_fail += 1
        elif s_sig != d_sig:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_sig, d_sig)) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_sig)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
