#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the matching Spark parquet output,
sort columns by name + rows, and diff values BYTE-STRICTLY.

Strictness matches the driver's typed hash, which round 3 proved is
stronger than plain Python == :
  - result dtypes must agree exactly (DuckDB HUGEINT vs Spark BIGINT is
    a FAIL even though Python int == int) and HUGEINT/DECIMAL anywhere
    in an oracle output is rejected outright — Spark never emits them;
  - doubles compare by IEEE bit pattern (struct.pack), so -0.0 != 0.0
    and NaN payloads must match.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os, struct
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def cell_key(x):
    """Byte-strict canonical form: floats by IEEE-754 bits (catches
    -0.0 vs +0.0), containers recursively, everything else typed."""
    if isinstance(x, float):
        return ("f8", struct.pack(">d", x))
    if isinstance(x, (list, tuple)):
        return ("seq", tuple(cell_key(v) for v in x))
    if isinstance(x, dict):
        return ("map", tuple(sorted((k, cell_key(v)) for k, v in x.items())))
    return (type(x).__name__, x)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(
        out, key=lambda t: tuple((x is None, str(x)) for x in t))


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
        orel = con.sql(sql)
        ocols, otypes = list(orel.columns), [str(t) for t in orel.types]
        orows = orel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    srel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    scols, stypes = list(srel.columns), [str(t) for t in srel.types]
    srows = srel.fetchall()

    # dtype gate: HUGEINT/DECIMAL can never match a Spark output type
    banned = [(c, t) for c, t in zip(ocols, otypes)
              if "HUGEINT" in t or "DECIMAL" in t]
    if banned:
        print(f"FAIL {name}: oracle emits banned dtype(s) {banned} "
              f"(cast to BIGINT/DOUBLE in the oracle SQL)")
        fails += 1
        continue
    # dtype gate: per-column types must agree exactly (driver schema hash)
    omap = dict(zip(ocols, otypes))
    smap = dict(zip(scols, stypes))
    tmismatch = {c: (smap.get(c), omap.get(c)) for c in omap
                 if c in smap and smap[c] != omap[c]}
    if tmismatch:
        print(f"FAIL {name}: column dtype mismatch (spark, oracle): {tmismatch}")
        fails += 1
        continue

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
    bad = [(a, b) for a, b in zip(srw, orw)
           if tuple(map(cell_key, a)) != tuple(map(cell_key, b))]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(srw)} byte-mismatched rows; first 3:")
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
