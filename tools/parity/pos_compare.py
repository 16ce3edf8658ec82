import sys, re
# Convention-aware offsets comparison:
#  - text nodes: offsets must be EQUAL, unless ref reports 0 (the
#    reference resets raw_begin to 0 on some merged/replaced tokens)
#  - elements: ref points at the tag NAME, ours at '<' → ref == ours+1,
#    unless either side reports 0 (implied elements)
#  - comments/doctype: skipped (reference offsets vary by comment origin)
ref_lines = open(sys.argv[1]).read().splitlines()
my_lines = open(sys.argv[2]).read().splitlines()
assert len(ref_lines) == len(my_lines), f"line counts differ {len(ref_lines)} vs {len(my_lines)}"
pat = re.compile(r'^(\s*)(\S+) @(\d+)$')
bad = 0
checked_t = checked_e = 0
for i, (r, m) in enumerate(zip(ref_lines, my_lines)):
    if r.startswith('### '):
        assert r == m, (r, m)
        continue
    mr, mm = pat.match(r), pat.match(m)
    assert mr and mm and mr.group(2) == mm.group(2), (r, m)
    tag, ro, mo = mr.group(2), int(mr.group(3)), int(mm.group(3))
    if tag == '-text':
        checked_t += 1
        if ro != 0 and ro != mo:
            bad += 1
            if bad < 6: print(f"TEXT MISMATCH line {i}: ref {ro} vs mine {mo}")
    elif tag not in ('_comment', '!doctype'):
        checked_e += 1
        if ro != 0 and mo != 0 and ro != mo + 1:
            bad += 1
            if bad < 6: print(f"ELEM MISMATCH line {i}: {tag} ref {ro} vs mine {mo}")
print(f"checked: {checked_t} text + {checked_e} element offsets, mismatches={bad}")
sys.exit(1 if bad else 0)
