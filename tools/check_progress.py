#!/usr/bin/env python3
"""check.py with per-query wall timing and unbuffered progressive
output — for watching long sf0.1 oracle replays. Same gate logic."""
import duckdb, json, sys, os, time

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))

fails = 0
for name in sorted(os.listdir(out)):
    if not os.path.isdir(f"{out}/{name}"):
        continue
    if only and not any(name.startswith(p) for p in only):
        continue
    t0 = time.time()
    try:
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"{name}: no_oracle rows={len(s)}", flush=True)
            continue
        o = con.execute(oracle[name]).fetchdf()
        st = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{out}/{name}/*.parquet'").fetchall()}
        ot = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({oracle[name]})").fetchall()}
        ok_types = all(st.get(c) == ot.get(c)
                       for c in set(st) | set(ot))
        s = s[sorted(s.columns)].reset_index(drop=True)
        o = o[sorted(o.columns)].reset_index(drop=True)
        ok = (len(s) == len(o) and list(s.columns) == list(o.columns)
              and ok_types)
        if ok:
            # same value compare as tools/check.py
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = (a.astype(float).fillna(-1e308) ==
                          b.astype(float).fillna(-1e308)).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
                if not eq:
                    ok = False
                    break
        dt = time.time() - t0
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(s)} "
              f"({dt:.1f}s)", flush=True)
        if not ok:
            fails += 1
    except Exception as e:
        print(f"{name}: ERROR {e}", flush=True)
        fails += 1
print(f"FAILS: {fails}", flush=True)
sys.exit(1 if fails else 0)
