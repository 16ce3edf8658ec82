#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
over the parquet tables in <sf_dir>, load the Spark result parquet from
<verify_out_dir>/<name>, sort columns by name / rows by all columns, and
compare md5 of the value matrix (mirrors the driver's hash compare).
"""
import duckdb, json, glob, os, sys, hashlib

outdir, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(str(r[i]) for i in order) for r in rows]
    mat.sort()
    h = hashlib.md5()
    for r in mat:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return len(mat), h.hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    exp = con.execute(sql)
    ecols = [d[0] for d in exp.description]
    erows = exp.fetchall()
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: NO SPARK OUTPUT (query crashed or was not written)")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})")
    gcols = [d[0] for d in got.description]
    grows = got.fetchall()
    en, eh = canon(erows, ecols)
    gn, gh = canon(grows, gcols)
    ok = (sorted(ecols) == sorted(gcols)) and en == gn and eh == gh
    print(f"{'OK  ' if ok else 'FAIL'} {name}: rows={gn}/{en} "
          f"cols={'match' if sorted(ecols)==sorted(gcols) else (gcols, ecols)} "
          f"hash={'match' if eh==gh else (gh[:8], eh[:8])}")
    if not ok:
        fails += 1
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} "
      f"({len(oracle)} oracle-checked)")
sys.exit(1 if fails else 0)
