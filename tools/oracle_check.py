#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Registers each parquet fixture as a DuckDB view named after the table, runs
every oracle_sql.json query, and compares against the Spark-written parquet
in <verifyOutDir>/<name>/ — schema (column names), row count, and values
(columns sorted by name, rows sorted, floats compared exactly after the
engine-side rounding). NOT part of the shipped library; dev tooling only.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name, then rows lexicographically (None-safe)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # normalize -0.0 and nan representation
                if v == 0.0: v = 0.0
                vals.append(("f", repr(v)))
            else:
                vals.append((type(v).__name__, repr(v)))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        s_cols = spark_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in spark_tbl.to_pylist()]
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc, sr = canon(s_rows, s_cols)
        oc, orr = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}"); n_fail += 1; continue
        # type parity: a driver-side hasher may round-trip results through
        # pandas, where e.g. DuckDB HUGEINT (sum/window-sum over integers)
        # becomes float64 while Spark's BIGINT stays int64 — values equal,
        # hash differs. Caught round 1 on user_sessions; gate it here.
        try:
            o_dtypes = {r[0]: str(r[1])
                        for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
            s_dtypes = {f.name: str(f.type) for f in spark_tbl.schema}
            equiv = {("BIGINT", "int64"), ("DOUBLE", "double"),
                     ("VARCHAR", "string"), ("VARCHAR", "large_string"),
                     ("INTEGER", "int32"), ("BOOLEAN", "bool"),
                     ("DATE", "date32[day]")}
            tdiffs = [f"{c}: duckdb={o_dtypes[c]} spark={s_dtypes.get(c)}"
                      for c in o_dtypes
                      if (o_dtypes[c], s_dtypes.get(c)) not in equiv]
            if tdiffs:
                print(f"FAIL {name}: type mismatch: {'; '.join(tdiffs)}")
                n_fail += 1; continue
        except Exception as e:
            print(f"WARN {name}: type check skipped: {e}")
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}"); n_fail += 1; continue
        if sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); n_fail += 1; continue
        print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
