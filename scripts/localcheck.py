#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: run Verify's parquet dumps
against the same oracle SQL in DuckDB and diff values exactly.

Usage: python3 scripts/localcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # probe dirs (target/sf1, target/zipf*) ship only documents/embeddings;
    # a missing table only matters if an oracle actually references it
    import os
    if os.path.exists(f"{sfdir}/{t}.parquet"):
        if os.path.isdir(f"{sfdir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet/*.parquet'")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    else:
        print(f"WARN: table {t} missing at {sfdir} - skipped (only matters "
              "if an oracle references it)")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}"); fails += 1; continue
    got, want = got[gc], want[wc]
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    bad = []
    for c in gc:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None: continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y): continue
                if x != y:  # exact — driver hash-compares
                    bad.append((c, i, x, y)); break
            elif str(x) != str(y):
                bad.append((c, i, x, y)); break
    if bad:
        print(f"FAIL {name}: first diffs {bad[:3]}"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
