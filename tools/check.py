#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the matching Spark parquet output,
sort columns by name + rows, and diff values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    # schema check: column type classes must agree (driver schema_match)
    otypes = {d[0]: d[1] for d in o.description}
    stypes = {d[0]: d[1] for d in s.description}
    tmismatch = {c: (stypes.get(c), otypes.get(c)) for c in otypes
                 if c in stypes and stypes[c] != otypes[c]}
    if tmismatch:
        print(f"WARN {name}: column type mismatch {tmismatch}")
    oc, orw = canon(orows, ocols)
    sc, srw = canon(srows, scols)
    if oc != sc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}")
        fails += 1
        continue
    if len(orw) != len(srw):
        print(f"FAIL {name}: rows spark={len(srw)} oracle={len(orw)}")
        fails += 1
        continue
    bad = [(a, b) for a, b in zip(srw, orw) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(srw)} mismatched rows; first 3:")
        for a, b in bad[:3]:
            print(f"   spark={a}\n  oracle={b}")
        fails += 1
    else:
        print(f"ok   {name} ({len(srw)} rows)")

no_oracle = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
for name in sorted(no_oracle):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    print(f"rows-only {name}: {n} rows")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
