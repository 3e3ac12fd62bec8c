#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: replicates the driver's
DuckDB compare (sort columns by name, compare values) against a
Verify.scala output dir. Usage: check_oracle.py <sfdir> <verify_out>"""
import sys, json, glob
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    duck_df = con.execute(oracle[name]).fetchdf()
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype.kind in "iu": df[c] = df[c].astype("int64")
            if df[c].dtype.kind == "f": df[c] = df[c].astype("float64")
            if df[c].dtype.kind == "O":
                import numbers
                vals = df[c].dropna()
                if len(vals) and all(isinstance(v, numbers.Number) for v in vals):
                    df[c] = df[c].astype("float64" if any(isinstance(v, float) for v in vals) else "int64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"); fail += 1; continue
    if not s.equals(d):
        neq = (s != d) & ~(s.isna() & d.isna())
        bad = neq.any(axis=1)
        print(f"{name}: VALUE MISMATCH in {int(bad.sum())}/{len(s)} rows")
        print(pd.concat([s[bad].head(3).add_suffix("_spark"),
                         d[bad].head(3).add_suffix("_duck")], axis=1).to_string())
        fail += 1; continue
    print(f"{name}: OK ({len(s)} rows)")
nq = len(glob.glob(f"{outdir}/q*"))
print(f"---\n{len(oracle)} oracles checked, {fail} failed; {nq} query dirs total")
sys.exit(1 if fail else 0)
