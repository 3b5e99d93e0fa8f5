#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [--strict] <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (Spark output) + <outDir>/oracle_sql.json,
runs each oracle against DuckDB views over <sfDir>/*.parquet, sorts columns
by name + rows, and compares values.

--strict: no rounding and type-faithful reprs — a float and a Decimal of
equal value, or two floats differing in the last ULP, COMPARE UNEQUAL
(mirrors the driver's hash canonicalization, which the lenient 9-digit
round masks; the r10 DECIMAL(18,4) hash failures were invisible here).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols, strict=False):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if strict:
                # full-precision, type-tagged: Decimal('6.5500') never
                # equals float 6.55, and 1-ULP float drift is visible
                vals.append(f"{type(v).__name__}:{v!r}")
                continue
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return sorted(cols), out

def norm_type(t):
    # Spark parquet timestamps are UTC-adjusted int64; DuckDB reads them as
    # TIMESTAMP WITH TIME ZONE while the oracle SQL yields plain TIMESTAMP.
    # The driver's hash canonicalization is tolerant of that one difference
    # (all 161 green queries have timestamp columns on both sides), so
    # collapse it — but keep integer width (HUGEINT vs BIGINT) and
    # DECIMAL-vs-DOUBLE distinctions, which ARE hash-visible (r10, r11).
    return t.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")

def type_mismatch(con, sql, files):
    """DESCRIBE-level type compare: oracle SQL vs Spark parquet. Returns a
    list of (col, oracle_type, spark_type) diffs. The Python client erases
    integer-width differences (HUGEINT and BIGINT both arrive as int), which
    is exactly how the m21/m29 class escaped the value compare twice."""
    od = {r[0]: norm_type(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    sd = {r[0]: norm_type(r[1])
          for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    diffs = []
    for c in sorted(set(od) | set(sd)):
        if od.get(c) != sd.get(c):
            diffs.append((c, od.get(c, "<absent>"), sd.get(c, "<absent>")))
    return diffs

def main(sf_dir, out_dir, strict=False):
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
        oc, orws = canon(orows, ocols, strict)
        sc, srws = canon(srows, scols, strict)
        tdiffs = type_mismatch(con, sql, files) if strict else []
        if oc != sc:
            print(f"SCHEMA   {name}: oracle={oc} spark={sc}"); n_fail += 1
        elif tdiffs:
            print(f"TYPES    {name}: {tdiffs}"); n_fail += 1
        elif orws != srws:
            diff = [(a, b) for a, b in zip(orws, srws) if a != b][:3]
            print(f"ROWS     {name}: oracle={len(orws)} spark={len(srws)} first_diffs={diff}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(srws)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    sys.exit(main(args[0], args[1], strict="--strict" in sys.argv))
