#!/usr/bin/env python3
"""Generate the adversarial oracle corpus (VERDICT r5 next-#2).

Copies /root/testdata/sf{SF}/*.parquet to testdata_adv/sf{SF}/ and mutates
a deterministic set of `documents` rows with the dirt classes the round-5
judge used to break 18 queries: NULL text/source/lang, empty and
whitespace-only strings, vertical tab (Java \\s vs RE2 \\s), NBSP and
Unicode spaces (neither engine's \\s), Greek uppercase (final-sigma
lowercase divergence), Turkish dotted I, 4-byte supplementary codepoints
(UTF-16 vs codepoint arithmetic), combining marks, control bytes, CR/LF/FF
mixes. n_chars is recomputed as DuckDB length() codepoints (0 for NULL
text) so length-derived constructions stay deterministic.

The reference's bar: "is not afraid of binary files and other trash"
(/root/reference/Changes:33) — the SQL operator layer must honor it too.

Usage: python3 tools/make_adversarial.py [out_root]
"""
import duckdb, os, shutil, sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_adv"

# doc_id -> (text, source, lang); None field = leave unchanged, 'NULL' via sentinel
KEEP = object()
NULL = object()
MUT = {
    7:  (NULL, KEEP, KEEP),                                  # NULL text
    11: (KEEP, NULL, KEEP),                                  # NULL source
    13: ("", KEEP, KEEP),                                    # empty text
    17: ("   ", KEEP, KEEP),                                 # spaces only
    19: ("alpha\x0bbeta gamma\x0b", KEEP, KEEP),             # vertical tab
    23: ("alpha beta  gamma nbsp ", KEEP, KEEP),   # NBSP
    29: ("ΣΟΦΟΣ ΟΔΥΣΣΕΥΣ ΑΣ alpha beta", KEEP, KEEP),  # Greek final sigma
    31: ("İstanbul I ı İ i IJ", KEEP, KEEP),  # Turkish dotted I
    37: ("emoji \U0001d54f test \U0001f680\U0001f680 done \U0001d11ex", KEEP, KEEP),  # 4-byte chars
    41: ("中文　测试 line sep end", KEEP, KEEP),  # CJK + U+3000/2028/2029
    43: ("a\r\nb\tc  d\fe\r", KEEP, KEEP),                   # CR/LF/tab/FF mix
    47: (KEEP, KEEP, NULL),                                  # NULL lang
    53: ("café café naïve", KEEP, KEEP),     # combining marks
    59: ("a\x00b\x01c\x1fd", KEEP, KEEP),                    # control bytes
    61: ("\t\n mixed content \f\r ", KEEP, KEEP),            # ws-wrapped
    67: ("MIXED Case TEXT", "SRCΣ\x0b", KEEP),          # dirty source
    71: ("quote \" back \\ slash ' end", KEEP, KEEP),        # quoting stress
    79: ("one", KEEP, KEEP),                                 # single token
    83: ("\x0b", KEEP, KEEP),                                # VT-only text
    89: ("  　", KEEP, KEEP),                  # unicode-ws-only
    97: (KEEP, "multi\nline src", KEEP),                    # newline in source
    101: (KEEP, KEEP, "EN"),                                 # uppercase lang value
    109: ("a � b", KEEP, KEEP),                         # U+FFFD in text
    113: ("...!!! ??? .", KEEP, KEEP),                       # terminators only
    127: ("__COPY_OF_1__", KEEP, KEEP),                      # exact dup of doc 1
    131: ("x &amp; y &lt;z&#33; &bogus; &", KEEP, KEEP),     # entity-looking text
    137: ("a <b>bold</b> c <div x", KEEP, KEEP),             # markup in text
    139: ("end </script> alive --> ok", KEEP, KEEP),         # rawtext/comment breakers
    149: (KEEP, "sr\"c<&13", KEEP),                          # quote/lt/amp in source
    # round-7 targets: the trained quality model must see strongly
    # negative AND strongly positive learned bigrams on the gate (not
    # just unknown-bucket zeros), and the node-table/attr path must see
    # seed-vocab words adjacent to markup-ish source content
    151: ("click here to subscribe now buy now free spins casino bonus",
          KEEP, KEEP),                                       # bad-seed phrase
    157: ("the city council approved the new transit plan after a long public debate",
          KEEP, KEEP),                                       # good-seed phrase
    163: ("click here the city council approved buy now", KEEP, KEEP),  # mixed signals
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def cps(s):
    return sum(1 for _ in s)  # python len == codepoints

for sf in ["0.001", "0.01"]:
    src = f"/root/testdata/sf{sf}"
    dst = os.path.join(OUT, f"sf{sf}")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if t != "documents":
            if os.path.exists(p):
                shutil.copyfile(p, os.path.join(dst, f"{t}.parquet"))
            continue
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{p}') ORDER BY doc_id"
        ).fetchall()
        text1 = next(r[1] for r in rows if r[0] == 1)
        out = []
        for (doc_id, text, lang, source, n_chars) in rows:
            if doc_id in MUT:
                mt, ms, ml = MUT[doc_id]
                if mt == "__COPY_OF_1__":
                    mt = text1  # exact cross-doc duplicate (dedup stress)
                if mt is not KEEP:
                    text = None if mt is NULL else mt
                if ms is not KEEP:
                    source = None if ms is NULL else ms
                if ml is not KEEP:
                    lang = None if ml is NULL else ml
                n_chars = 0 if text is None else cps(text)
            out.append((doc_id, text, lang, source, n_chars))
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
        con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", out)
        con.execute(f"COPY (SELECT * FROM d ORDER BY doc_id) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
        con.close()
    print(f"wrote {dst} ({len(MUT)} mutated document rows)")
