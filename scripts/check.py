#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (Spark output) + <outDir>/oracle_sql.json,
runs each oracle against DuckDB views over <sfDir>/*.parquet, sorts columns
by name + rows, and compares values.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return sorted(cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_fail += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]; orows = o.fetchall()
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]; srows = s.fetchall()
        oc, orws = canon(orows, ocols)
        sc, srws = canon(srows, scols)
        if oc != sc:
            print(f"SCHEMA   {name}: oracle={oc} spark={sc}"); n_fail += 1
        elif orws != srws:
            diff = [(a, b) for a, b in zip(orws, srws) if a != b][:3]
            print(f"ROWS     {name}: oracle={len(orws)} spark={len(srws)} first_diffs={diff}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(srws)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
