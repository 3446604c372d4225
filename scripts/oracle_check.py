#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: for each query dir
written by `graft.Verify <sfDir> <outDir>`, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same testdata parquet, sort columns by
name and rows by value, and diff.

Usage: scripts/oracle_check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not glob.glob(f"{qdir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); failed.append(name); continue
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        grows, gcols = norm(got.fetchall(), got.columns)
        try:
            want = con.sql(oracle[name])
            wrows, wcols = norm(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failed.append(name); continue
        # Driver's hash is type-sensitive: DuckDB widens e.g. windowed
        # SUM(BIGINT) to HUGEINT, which value-matches under repr() but
        # hash-mismatches at the driver (round-10 q72). Compare result
        # types too, normalized by sorted column order.
        gorder = sorted(range(len(got.columns)), key=lambda i: got.columns[i])
        worder = sorted(range(len(want.columns)), key=lambda i: want.columns[i])
        gtypes = [str(got.types[i]) for i in gorder]
        wtypes = [str(want.types[i]) for i in worder]
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); failed.append(name)
        elif gtypes != wtypes:
            print(f"FAIL {name}: types {list(zip(gcols, gtypes))} vs {list(zip(wcols, wtypes))}")
            failed.append(name)
        elif grows != wrows:
            diffs = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows; first diffs: {diffs}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(grows)} rows")
    extra = set(oracle) - {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    print(f"== {len(oracle)-len(failed)}/{len(oracle)} match; missing outputs: {sorted(extra)}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
