#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, compare to the Verify parquet dump
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, math, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def fresh_con():
    # fresh connection per query: one fatal DuckDB error must not
    # cascade into every subsequent check
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    con = fresh_con()
    try:
        # the driver canonicalizes DuckDB HUGEINT/DECIMAL output columns
        # differently than Python ints (round-1 lesson: 5 queries failed
        # remotely on uncast integer SUMs while passing here) — reject any
        # oracle whose result schema isn't plain BIGINT/INT/DOUBLE/etc.
        d = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [f"{r[0]}:{r[1]}" for r in d
               if "HUGEINT" in str(r[1]) or "DECIMAL" in str(r[1])]
        if bad:
            print(f"FAIL {name}: oracle col type needs explicit CAST: {bad}")
            n_fail += 1; continue
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {str(e)[:200]}"); n_fail += 1; continue
    s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
        n_fail += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        n_fail += 1; continue
    hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
    if hs != ho:
        print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
        # show first diff
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        cs = sorted(tuple(canon(r[i]) for i in order_s) for r in srows)
        co = sorted(tuple(canon(r[i]) for i in order_o) for r in orows)
        for a, b in zip(cs, co):
            if a != b:
                print(f"  spark : {a}\n  oracle: {b}"); break
        n_fail += 1
    else:
        print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
