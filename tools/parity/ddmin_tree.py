import subprocess, sys
CP = "/opt/spark/jars/scala-library-2.13.17.jar:/opt/spark/jars/scala-reflect-2.13.17.jar:/root/repo/target/scala-2.13/classes:/tmp/parity/out"
def differs(s):
    open('/tmp/parity/min/d/cur.html','wb').write(s.encode())
    r = subprocess.run(['perl','ref_tree_all.pl','/tmp/parity/min/d'],capture_output=True).stdout
    m = subprocess.run(['java','-cp',CP,'MyTree','/tmp/parity/min/d'],capture_output=True).stdout
    return r != m
src = open(sys.argv[1], encoding='utf-8').read()
assert differs(src), "no divergence on full doc"
n = len(src)
chunk = max(n // 4, 1)
while chunk >= 1:
    i = 0
    while i < len(src):
        cand = src[:i] + src[i+chunk:]
        if cand and differs(cand):
            src = cand
        else:
            i += chunk
    chunk //= 2
print(repr(src))
open('/tmp/parity/min/last.min','w',encoding='utf-8').write(src)
