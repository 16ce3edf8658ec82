#!/usr/bin/env python3
"""Row-level diff for one oracle query: shows rows only in the Spark
output, rows only in the DuckDB oracle, paired by closest key when
possible. Usage: python3 tools/oracle_diff.py <verify_out_dir> <sf_dir> <query> [maxrows]
"""
import duckdb, json, glob, os, sys

outdir, sf, name = sys.argv[1], sys.argv[2], sys.argv[3]
maxrows = int(sys.argv[4]) if len(sys.argv) > 4 else 12
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sql = json.load(open(os.path.join(outdir, "oracle_sql.json")))[name]
exp = con.execute(sql)
ecols = [d[0] for d in exp.description]
erows = exp.fetchall()
files = glob.glob(os.path.join(outdir, name, "*.parquet"))
if not files:
    print("NO SPARK OUTPUT")
    sys.exit(1)
got = con.execute(f"SELECT * FROM read_parquet({files!r})")
gcols = [d[0] for d in got.description]
grows = got.fetchall()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)

scols = sorted(ecols)
em, gm = canon(erows, ecols), canon(grows, gcols)
eset, gset = {}, {}
for r in em: eset[r] = eset.get(r, 0) + 1
for r in gm: gset[r] = gset.get(r, 0) + 1
only_e = [r for r in em if gset.get(r, 0) < eset[r]][:]
only_g = [r for r in gm if eset.get(r, 0) < gset[r]][:]
# dedupe while preserving multiplicity diffs
print("cols:", scols)
print(f"spark={len(gm)} oracle={len(em)} spark-only={len(only_g)} oracle-only={len(only_e)}")
seen = set()
shown = 0
for r in only_g:
    if r in seen: continue
    seen.add(r)
    print("SPARK :", r)
    shown += 1
    if shown >= maxrows: break
seen = set()
shown = 0
for r in only_e:
    if r in seen: continue
    seen.add(r)
    print("ORACLE:", r)
    shown += 1
    if shown >= maxrows: break
