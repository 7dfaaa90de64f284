#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output
against DuckDB oracles. Usage:
  python3 tools/check.py [sfdir] [verify_out] [only_prefix...]
"""
import duckdb, json, sys, os

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
    try:
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"{name}: SPARK-READ-FAIL {e}")
        fails += 1
        continue
    if name not in oracle:
        print(f"{name}: no_oracle rows={len(s)}")
        continue
    try:
        o = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE-FAIL {e}")
        fails += 1
        continue
    # Strict dtype gate (r8 verdict item 2): the driver hashes DuckDB's
    # *rendered* values, so a HUGEINT/DECIMAL/DOUBLE oracle column vs a
    # BIGINT Spark column fails its hash even when values are equal.
    # Compare DuckDB-side types of both results and fail on mismatch.
    try:
        st = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{out}/{name}/*.parquet'").fetchall()}
        ot = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({oracle[name]})").fetchall()}
        ok_types = True
        for c in sorted(set(st) | set(ot)):
            a, b = st.get(c), ot.get(c)
            if a != b:
                ok_types = False
                print(f"  {name}.{c} DTYPE mismatch: spark={a} oracle={b}")
    except Exception as e:
        ok_types = False
        print(f"  {name} dtype-describe error: {e}")
    s = s[sorted(s.columns)].reset_index(drop=True)
    o = o[sorted(o.columns)].reset_index(drop=True)
    ok_rows = len(s) == len(o)
    ok_cols = list(s.columns) == list(o.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            import pandas as pd
            ok_vals = True
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = (a.astype(float).fillna(-1e308) == b.astype(float).fillna(-1e308)).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
                if not eq:
                    ok_vals = False
                    bad = (a.astype(str) != b.astype(str))
                    idx = bad[bad].index[:3].tolist()
                    print(f"  {name}.{c} first diffs at rows {idx}: "
                          f"spark={a.iloc[idx].tolist()} oracle={b.iloc[idx].tolist()}")
        except Exception as e:
            print(f"  {name} compare error: {e}")
    status = "OK" if (ok_rows and ok_cols and ok_vals and ok_types) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name}: {status} rows {len(s)}/{len(o)} cols_match={ok_cols} "
              f"types_match={ok_types} "
              f"spark_cols={list(s.columns)} oracle_cols={list(o.columns)}")
    else:
        print(f"{name}: OK ({len(s)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
