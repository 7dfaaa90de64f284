#!/usr/bin/env python3
"""check.py with per-query wall timing and unbuffered progressive
output — for watching long sf0.1 oracle replays. Delegates the gate
itself to tools/check.py (rendered-string compare + dtype gate +
optional --ulp), so this variant can never pass what check.py fails.
Usage:
  python3 tools/check_progress.py [--ulp] [sfdir] [verify_out] [only...]
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import connect, gate  # noqa: E402

argv = [a for a in sys.argv[1:] if a != "--ulp"]
ulp_tol = "--ulp" in sys.argv[1:]
sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
only = argv[2:]

con = connect(sf)
oracle = json.load(open(f"{out}/oracle_sql.json"))

fails = 0
t_start = time.time()
for name in sorted(os.listdir(out)):
    if not os.path.isdir(f"{out}/{name}"):
        continue
    if only and not any(name.startswith(p) for p in only):
        continue
    t0 = time.time()
    status, n = gate(con, out, oracle, name, ulp_tol)
    dt = time.time() - t0
    if status == "FAIL":
        fails += 1
    print(f"{name}: {status} rows={n} ({dt:.1f}s)", flush=True)
print(f"FAILS: {fails} (total {time.time() - t_start:.0f}s)", flush=True)
sys.exit(1 if fails else 0)
