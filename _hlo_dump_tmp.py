import sys, re
sys.argv = ["x"]
from tools.roofline import build_infer
program, (imgs, thr) = build_infer(512, 64)
hlo = program.lower(imgs, thr).compile().as_text()
for m in re.finditer(r"^\s*(?:ROOT )?%?(sort[\w.\-]*) = .*$", hlo, re.M):
    print(m.group(0)[:400], "\n---")
