#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate — TYPE-AWARE (round 7).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
over the parquet tables in <sf_dir>, load the Spark result parquet from
<verify_out_dir>/<name>, sort columns by name / rows by all columns, and
compare md5 of the value matrix (mirrors the driver's hash compare).

Round-7 addition (VERDICT r6 #2/#3): the round-5/6 driver-red rows were
HUGEINT oracle columns that str()-render identically to BIGINT, so the
value-hash compare was blind to them for four "ALL GREEN" local gates.
The gate now ALSO compares column TYPES between the DuckDB oracle result
and the Spark parquet schema:
  - any oracle column typed HUGEINT or DECIMAL is a hard FAIL (the exact
    class that diverged on the driver; DuckDB promotes uncast sum()/
    list_sum() to HUGEINT — always CAST ... AS BIGINT in oracles);
  - a cross-family mismatch (int vs float vs string vs bool vs binary)
    on a same-named column is a FAIL;
  - every float column must appear in FLOAT_ALLOW below — floats in
    oracles are allowed ONLY where float-exactness holds by construction
    (documented per entry); an unlisted float column is a FAIL so new
    queries default to int/string outputs per CLAUDE.md.
Int WIDTH differences (INTEGER vs BIGINT) are reported as warnings only:
the driver's divergence class is HUGEINT/DECIMAL, and widths within the
int family render identically on every known hash path.
"""
import duckdb, json, glob, os, sys, hashlib

# query -> set of column names deliberately float. Every entry must say WHY
# float-exactness holds by construction (CLAUDE.md: planted corpora use
# power-of-two scalings / Pythagorean-triple cosines so IEEE754 replays
# bit-identically in DuckDB and the JVM).
FLOAT_ALLOW = {
    # cosine of planted pairs is float-exact: vectors are identical or
    # 2^k-scaled (cos==1.0) or Pythagorean-triple constructions (cos==b/c
    # with b,c small ints — exact in binary64 division both sides)
    "q_ann_self": {"cosine"},
    "q_ann_topk": {"cosine"},
    # same replay as q_ann_topk: the HNSW beam covers the shard at gate
    # scale, so the output IS the brute-force cosine ranking (round-4)
    "q_ann_hnsw": {"cosine"},
    # rational BM25: one double division of exact <2^53 BIGINTs (no ln
    # anywhere) — exactly rounded IEEE on both engines, bit-identical
    "q_bm25": {"score"},
    # multi-term sum folds the same per-term exact ratios in SORTED
    # term order on both engines (0.0 + x == x for positive scores)
    "q_bm25_multi": {"score"},
    "q_ann_i8": {"cosine"},
    # identical replay as q_ann_i8: exhaustive i8 beam == i8 brute force,
    # and float-cast quantized cosine == cosineI8 (integer sums exact)
    "q_ann_hnsw_i8": {"cosine"},
    "q_ann_lsh": {"cosine"},
    "q_ann_graded": {"cosine"},
    "q_ann_ivf": {"cosine"},
    "q_ann_ivf_hnsw": {"cosine"},
    # ADC distance equals exact cosine bit-for-bit because corpus
    # subvectors ARE codewords (all-integer floats; round-5 construction)
    "q_ann_pq": {"cosine"},
    "q_ann_pqr": {"cosine"},
    # permutation preserves norms/dots, so the OPQ ADC score IS the
    # q_ann_pq lossless-plant cosine (all-integer floats, exact)
    "q_ann_opq": {"cosine"},
    # planted duplicate vectors: identical or power-of-two scaled -> the
    # norm ratio / cosine is exact; jaccard on md5-token texts is a ratio
    # of small ints, exact in binary64
    "q_embed_neardup": {"cosine"},
    "q_embed_graded": {"cosine"},
    "q_embed_norm": {"norm2"},
    # small-int ratios p/q with q <= 2^53: exact in binary64 on both sides
    "q_minhash_dedup": {"jaccard"},
    "q_cjk_dedup": {"jaccard"},
    "q_simhash_dedup": {},
    "q_ngram_jaccard": {"jaccard"},
    "q_decontam": {"frac"},
}

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE", "REAL"}

def family(t):
    t = str(t).upper()
    base = t.split("(")[0].strip()
    if base in INT_TYPES: return "int"
    if base in FLOAT_TYPES: return "float"
    if base == "HUGEINT": return "HUGEINT"
    if base.startswith("DECIMAL"): return "DECIMAL"
    if base in ("VARCHAR", "STRING", "TEXT"): return "str"
    if base == "BOOLEAN": return "bool"
    if base in ("BLOB", "BINARY", "BYTEA"): return "bin"
    if base.startswith("STRUCT") or base.endswith("[]") or base.startswith("LIST") \
       or base.startswith("MAP"): return "nested"
    if base in ("DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIME"): return "time"
    return base  # unknown: compare verbatim

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
warns = []
for name, sql in sorted(oracle.items()):
    rel = con.sql(sql)
    ecols = list(rel.columns)
    etypes = [str(t) for t in rel.types]
    erows = rel.fetchall()
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: NO SPARK OUTPUT (query crashed or was not written)")
        fails += 1
        continue
    grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    gcols = list(grel.columns)
    gtypes = [str(t) for t in grel.types]
    grows = grel.fetchall()

    # ---- type gate ----
    terrs = []
    emap = dict(zip(ecols, etypes))
    gmap = dict(zip(gcols, gtypes))
    allow = FLOAT_ALLOW.get(name, set())
    for c in sorted(set(ecols) & set(gcols)):
        ef, gf = family(emap[c]), family(gmap[c])
        if ef in ("HUGEINT", "DECIMAL"):
            terrs.append(f"{c}: oracle emits {emap[c]} (driver-divergent; CAST AS BIGINT)")
            continue
        if ef != gf:
            terrs.append(f"{c}: family mismatch oracle={emap[c]} spark={gmap[c]}")
            continue
        if ef == "float" and c not in allow:
            terrs.append(f"{c}: float column not in FLOAT_ALLOW "
                         f"(prefer int/string; or document exactness)")
        if ef == "int" and emap[c].upper() != gmap[c].upper():
            warns.append(f"{name}.{c}: int width oracle={emap[c]} spark={gmap[c]}")

    en, eh = canon(erows, ecols)
    gn, gh = canon(grows, gcols)
    ok = (sorted(ecols) == sorted(gcols)) and en == gn and eh == gh and not terrs
    print(f"{'OK  ' if ok else 'FAIL'} {name}: rows={gn}/{en} "
          f"cols={'match' if sorted(ecols)==sorted(gcols) else (gcols, ecols)} "
          f"hash={'match' if eh==gh else (gh[:8], eh[:8])}"
          + ("" if not terrs else f" types={terrs}"))
    if not ok:
        fails += 1
for w in warns:
    print(f"WARN {w}")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} "
      f"({len(oracle)} oracle-checked, type-aware)")
sys.exit(1 if fails else 0)
